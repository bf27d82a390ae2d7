"""Sequence packing: fill fixed-capacity training sequences with documents.

The step between a cleaned corpus and an LLM training run: batch documents
into sequences of at most ``CAPACITY`` tokens so padding waste is small.
Globally-optimal bin packing is NP-hard and ANY exact first-fit order is a
sequential chain (each bin's fill depends on every prior doc), so the
scale-correct formulation — and this implementation — is PARTITIONED
next-fit: each block packs its own docs greedily in doc_id order into
fresh bins, and bin ids are namespaced by the block's minimum doc_id, so
the result is deterministic, parallelism-friendly, and resumable per
block.  Waste is bounded by one partial bin per block (measured in
tests); oversized docs get a bin of their own (truncation is the
consumer's policy decision, flagged in ``overflow``).

Token counts are the exact whitespace token counts (the `vocabulary` /
`text_features` contract).  Rows-only query `sequence_pack`; packing
invariants (capacity, completeness, determinism, waste) are asserted in
tests/test_packing.py.
"""

from __future__ import annotations

import numpy as np
import pyarrow as pa
import pyarrow.compute as pc
import ray.data

CAPACITY = 2048
_BIN_SHIFT = 20  # bin_id = (min doc_id in block) << 20 | local bin index


def pack_block(doc_ids: np.ndarray, n_tokens: np.ndarray,
               capacity: int) -> tuple[np.ndarray, np.ndarray, np.ndarray]:
    """Greedy next-fit in doc_id order (bins never revisited):
    (bin_local, offset, overflow)."""
    order = np.argsort(doc_ids, kind="stable")
    bins = np.empty(doc_ids.shape[0], np.int64)
    offs = np.empty(doc_ids.shape[0], np.int64)
    over = np.zeros(doc_ids.shape[0], np.int64)
    b, fill = 0, 0
    for i in order:
        n = int(n_tokens[i])
        if fill > 0 and fill + n > capacity:
            b, fill = b + 1, 0
        if n > capacity:
            over[i] = 1
        bins[i] = b
        offs[i] = fill
        fill += n
        if fill >= capacity:
            b, fill = b + 1, 0
    return bins, offs, over


def sequence_pack(sf_dir: str, capacity: int = CAPACITY) -> ray.data.Dataset:
    """(doc_id, n_tokens, bin_id, offset, overflow) for every document."""
    from ..pipelines.relational import _read

    docs = _read(sf_dir, "documents", ["doc_id", "text"])

    def pack(b: pa.Table) -> pa.Table:
        from ..core.texthash import split_tokens_arrow

        toks = split_tokens_arrow(b["text"])
        flat = pc.list_flatten(toks)
        parent = pc.list_parent_indices(toks).to_numpy(zero_copy_only=False)
        nonempty = pc.not_equal(flat, "").to_numpy(zero_copy_only=False)
        n_tok = np.bincount(parent[nonempty],
                            minlength=b.num_rows).astype(np.int64)
        ids = b["doc_id"].to_numpy(zero_copy_only=False)
        bins, offs, over = pack_block(ids, n_tok, capacity)
        base = np.int64(int(ids.min()) << _BIN_SHIFT) if ids.size else np.int64(0)
        return pa.table({
            "doc_id": pa.array(ids),
            "n_tokens": pa.array(n_tok),
            "bin_id": pa.array(base + bins),
            "offset": pa.array(offs),
            "overflow": pa.array(over),
        })

    return docs.map_batches(pack, batch_format="pyarrow", batch_size=None)


# --- deterministic training shuffle --------------------------------------------

SHUFFLE_SHARDS = 8
_SHUF_MULT = 2654435761
_SHUF_MOD = 4294967296


def training_shuffle(sf_dir: str,
                     shards: int = SHUFFLE_SHARDS) -> ray.data.Dataset:
    """Deterministic corpus shuffle for training epochs: every document
    gets a pseudo-random GLOBAL position (multiplicative-hash key, doc_id
    tie-break) and a round-robin shard — the "shuffle once, shard for N
    trainers" step of a training-data pipeline, reproducible across runs
    and cluster sizes because the order is a pure function of doc_id.

    Distribution: the order is realized by stages/windows.global_rank
    (sampled range boundaries -> bounded per-bucket counts -> local sort +
    offset), so no node ever holds the full corpus order."""
    from ..pipelines.relational import _read
    from ..stages.windows import global_rank

    docs = _read(sf_dir, "documents", ["doc_id"])

    def key(b: pa.Table) -> pa.Table:
        ids = b["doc_id"].to_numpy(zero_copy_only=False)
        h = (ids * _SHUF_MULT) % _SHUF_MOD
        return pa.table({"doc_id": b["doc_id"],
                         "h": pa.array(h.astype(np.int64))})

    ranked = global_rank(
        docs.map_batches(key, batch_format="pyarrow"),
        "h", "doc_id", ["doc_id", "h"], descending=False, rank_name="pos")

    def shard_of(b: pa.Table) -> pa.Table:
        pos = b["pos"].to_numpy(zero_copy_only=False)
        return pa.table({
            "doc_id": b["doc_id"],
            "pos": b["pos"],
            "shard": pa.array(((pos - 1) % shards).astype(np.int64)),
        })

    return ranked.map_batches(shard_of, batch_format="pyarrow")


def sql_training_shuffle(shards: int = SHUFFLE_SHARDS) -> str:
    return f"""
SELECT doc_id, pos, CAST((pos - 1) % {shards} AS BIGINT) AS shard FROM (
  SELECT doc_id,
         ROW_NUMBER() OVER (
           ORDER BY (doc_id * {_SHUF_MULT}) % {_SHUF_MOD}, doc_id) AS pos
  FROM documents
)
""".strip()
