"""Incremental dedup against a SHARED, SHARDED corpus index (actor state).

The one dedup shape the Dataset API genuinely cannot express (SURVEY §2's
"shared mutable index" escape hatch; the brief's sanctioned raw-actor
case): an always-on index of every text hash ever admitted to the corpus,
consulted — and optionally grown — by later ingest batches.  A groupby
can dedup WITHIN a dataset; it cannot dedup a stream AGAINST yesterday's
corpus without re-shuffling the whole corpus per increment.  The index
actors hold that state once.

* ``DedupShard`` — one Ray actor per hash range; holds a dict of 16-byte
  md5 digests -> admitting-owner token.  At 10^12 docs: ~hundreds of
  shards x tens of GB; each shard is single-writer (actor serialization IS
  the concurrency control), and both ``add`` and ``probe_add`` are
  idempotent under task retries (the owner token makes a re-executed
  ingest-and-dedup batch reproduce its own labels).
* routing — md5's first 8 bytes mod n_shards, computed vectorized per
  batch; each batch makes ONE ``contains``/``add`` call per shard it
  touches (not per row).
* exactness — membership is by 128-bit md5 (the repo-wide exact-dedup
  convention, ``stages/dedup.add_text_md5``); the DuckDB oracle joins on
  the text itself, so the driver's value-hash proves the md5 shortcut
  right on this corpus.

``incremental_dedup`` is the oracle-checked demo: the corpus index is
built from the ``documents`` table, then the page stream — with every
``doc_id % 7 == 0`` text deterministically mutated so the stream contains
genuinely new texts — is labeled ``is_dup`` per page row.
"""

from __future__ import annotations

import numpy as np
import pandas as pd
import pyarrow as pa
import pyarrow.compute as pc
import ray
import ray.data

N_SHARDS = 8
_MUT_MOD = 7
_MUT_SUFFIX = " v2"


@ray.remote(num_cpus=0)
class DedupShard:
    """One hash-range shard of the corpus text-hash set.

    Reserves NO CPU slot: its work (set probes/adds) happens inside the
    caller-paid map tasks' round trips, so a CPU reservation would only
    starve the map stages — on a 4-CPU test cluster, two leaked index
    generations (8 x 0.25) deadlocked an actor-pool stage outright.  A
    production deployment pins shards to dedicated nodes via custom
    resources instead of CPU shares."""

    def __init__(self) -> None:
        # digest -> owner token (None for corpus builds).  The owner makes
        # probe_add IDEMPOTENT under Ray's at-least-once task retries: a
        # re-executed batch sees its OWN earlier admissions as "mine, not a
        # duplicate" instead of self-poisoning its labels (r3 review).
        self._seen: dict[bytes, bytes | None] = {}

    def add(self, digests: list[bytes]) -> int:
        before = len(self._seen)
        for d in digests:
            self._seen.setdefault(d, None)
        return len(self._seen) - before

    def contains(self, digests: list[bytes]) -> list[bool]:
        s = self._seen
        return [d in s for d in digests]

    def probe_add(self, digests: list[bytes], owner: bytes) -> list[bool]:
        """One atomic probe-and-admit round trip: True = duplicate (first
        admitted by the corpus build or ANOTHER batch), False = first
        occurrence (admitted now, or re-seen by the same owner on retry)."""
        s = self._seen
        out = []
        for d in digests:
            if d not in s:
                s[d] = owner
                out.append(False)
            else:
                out.append(s[d] != owner)
        return out

    def size(self) -> int:
        return len(self._seen)


def _digests(texts: pa.ChunkedArray | pa.Array) -> list[bytes]:
    """md5 per row via dictionary encoding: hashlib runs once per DISTINCT
    text (the add_text_md5 convention the module docstring cites — crawl
    batches are duplicate-heavy, a per-row loop re-hashed every copy)."""
    import hashlib

    if isinstance(texts, pa.ChunkedArray):
        texts = texts.combine_chunks()
    enc = texts.cast(pa.binary()).dictionary_encode()
    uniq = [hashlib.md5(t).digest() for t in enc.dictionary.to_pylist()]
    idx = enc.indices.to_numpy(zero_copy_only=False)
    return [uniq[i] for i in idx]


def _shard_of(digests: list[bytes], n_shards: int) -> np.ndarray:
    h = np.frombuffer(b"".join(d[:8] for d in digests),
                      dtype=">u8") if digests else np.array([], np.uint64)
    return (h % np.uint64(n_shards)).astype(np.int64)


class DedupIndex:
    """Handle bundle for the shard actors (plain object, cheap to close
    over in map_batches tasks)."""

    def __init__(self, shards: list) -> None:
        self.shards = shards

    @classmethod
    def create(cls, n_shards: int = N_SHARDS) -> "DedupIndex":
        return cls([DedupShard.remote() for _ in range(n_shards)])

    def sizes(self) -> list[int]:
        return ray.get([s.size.remote() for s in self.shards])

    def close(self) -> None:
        """Kill the shard actors.  Call once every Dataset derived from
        this index has been consumed (query_index results are lazy and
        hold shard handles in their task closures)."""
        for s in self.shards:
            ray.kill(s)
        self.shards = []


def build_index(ds: ray.data.Dataset, index: DedupIndex,
                col: str = "text") -> int:
    """Stream ``ds[col]`` into the shard actors; returns rows indexed.
    Each ingest task waits for its shards' acks, and the terminal count
    barrier means every add landed before this function returns."""
    shards = index.shards
    n = len(shards)

    def ingest(b: pa.Table) -> pa.Table:
        d = _digests(b[col])
        sid = _shard_of(d, n)
        acks = [shards[s].add.remote([d[i] for i in np.nonzero(sid == s)[0]])
                for s in np.unique(sid)]
        ray.get(acks)
        return pa.table({"n": pa.array([b.num_rows], pa.int64())})

    parts = ds.map_batches(ingest, batch_format="pyarrow",
                           batch_size=16384).take_all()
    return int(sum(r["n"] for r in parts))


def query_index(ds: ray.data.Dataset, index: DedupIndex, col: str = "text",
                out_col: str = "is_dup", keep: list[str] | None = None,
                add_missing: bool = False) -> ray.data.Dataset:
    """Label each row with ``out_col`` = 1 iff its text is already in the
    index.  ``add_missing=True`` additionally admits unseen texts in the
    SAME shard round trip (``probe_add``): first-writer semantics across
    racing batches are per-shard-call atomic, and the operation is
    IDEMPOTENT under Ray's at-least-once task retries — each shard records
    the admitting batch's owner token (a digest of the batch's own
    digests, stable across re-execution), so a retried batch sees its own
    earlier admissions as first occurrences again instead of flipping its
    labels to is_dup=1 (r3 review)."""
    shards = index.shards
    n = len(shards)

    def probe(b: pa.Table) -> pa.Table:
        import hashlib

        d = _digests(b[col])
        sid = _shard_of(d, n)
        hit = np.zeros(len(d), dtype=bool)
        uniq = np.unique(sid)
        if add_missing:
            # the owner token must identify THIS batch, stable across task
            # retries: text digests alone collide for two different batches
            # with identical text sequences (duplicate-heavy streams), which
            # would mislabel genuine cross-batch duplicates as firsts (r3
            # review) — so fold the batch's other columns (its row
            # identities, e.g. doc_id) into the token too
            h = hashlib.md5(b"".join(d))
            for c in b.column_names:
                if c == col:
                    continue
                arr = b[c].combine_chunks() if isinstance(
                    b[c], pa.ChunkedArray) else b[c]
                v = arr.to_numpy(zero_copy_only=False)
                if v.dtype.kind in "biufmM":
                    h.update(v.tobytes())
                else:  # object/string columns: canonical utf-8 join
                    h.update(b"\x00".join(
                        str(x).encode("utf-8") for x in v))
            owner = h.digest()
            replies = ray.get([
                shards[s].probe_add.remote(
                    [d[i] for i in np.nonzero(sid == s)[0]], owner)
                for s in uniq])
        else:
            replies = ray.get([
                shards[s].contains.remote(
                    [d[i] for i in np.nonzero(sid == s)[0]])
                for s in uniq])
        for s, rep in zip(uniq, replies):
            hit[np.nonzero(sid == s)[0]] = rep
        cols = {c: b[c] for c in (keep or b.column_names) if c != out_col}
        cols[out_col] = pa.array(hit.astype(np.int64))
        return pa.table(cols)

    return ds.map_batches(probe, batch_format="pyarrow", batch_size=16384)


def incremental_dedup(sf_dir: str) -> ray.data.Dataset:
    """Oracle query: build the corpus index from ``documents``, then label
    every page row (with the %7 mutation applied) against it."""
    from ..sources.pages import read_pages

    from ..pipelines.relational import _read

    # session-cached fan-out read: a bare single-file read_parquet is ONE
    # serial block, serializing the whole ingest (r3 review)
    docs = _read(sf_dir, "documents", ["text"])
    index = DedupIndex.create()
    build_index(docs, index)

    def mutate(b: pa.Table) -> pa.Table:
        doc = b["doc_id"].to_numpy(zero_copy_only=False)
        mut = pc.binary_join_element_wise(b["text"], _MUT_SUFFIX, "")
        text = pc.if_else(pa.array(doc % _MUT_MOD == 0), mut, b["text"])
        return pa.table({"doc_id": b["doc_id"], "text": text})

    stream = read_pages(sf_dir, columns=["doc_id", "text"]).map_batches(
        mutate, batch_format="pyarrow",
                                            batch_size=16384)
    return query_index(stream, index, keep=["doc_id"])


def sql_incremental_dedup() -> str:
    return f"""
, stream AS (
  SELECT doc_id,
         CASE WHEN doc_id % {_MUT_MOD} = 0 THEN text || '{_MUT_SUFFIX}'
              ELSE text END AS text
  FROM pages)
SELECT s.doc_id,
       CAST(CASE WHEN d.text IS NOT NULL THEN 1 ELSE 0 END AS BIGINT) AS is_dup
FROM stream s
LEFT JOIN (SELECT DISTINCT text FROM documents) d ON s.text = d.text
""".strip()
