"""Exact character-n-gram Jaccard near-duplicate pairs.

The n-gram Jaccard dedup family member with an EXACT oracle: unlike
MinHash/SimHash (probabilistic candidate generation, rows-only checks),
this computes the true trigram-set Jaccard for every representative pair
and keeps pairs at-or-above a rational threshold, so DuckDB can verify it
bit-for-bit (``__ray_entry__.oracle_sql()['ngram_jaccard']``).

Design (mirrors ``stages/ann.embedding_neardup_blockpair``): representatives
(min doc_id per distinct text) are split into B blocks; each of the
B(B+1)/2 block PAIRS is one raw Ray task holding exactly two blocks — the
Dataset API cannot express a blockwise self-cross-product, so this is the
brief's documented last resort.  Per task, every doc's DISTINCT packed
trigrams land in a shared vocabulary and the pairwise intersection counts
are ONE uint8 matmul (BLAS), not a per-pair loop.  Per-worker memory is
O(block x vocab); compute is the inherent O(R^2) of any exact all-pairs
scan — the probabilistic stages (MinHash bands, SimHash buckets, LSH) are
the documented scale path when R is crawl-sized.

Exactness: a trigram of Unicode codepoints (each < 2^21) is packed
bijectively into one int64 (no hash collisions), so distinct-trigram sets
match DuckDB's ``DISTINCT substr(text, i, 3)`` exactly; the threshold test
``inter * DEN >= union * NUM`` is integer cross-multiplication — no float
anywhere.
"""

from __future__ import annotations

import numpy as np
import pandas as pd
import pyarrow as pa
import ray
import ray.data

from ..core.config import table_path

THRESH_NUM, THRESH_DEN = 7, 10  # Jaccard >= 0.7
N_BLOCKS = 8


def trigram_sets(texts: list[str]) -> tuple[np.ndarray, np.ndarray]:
    """(doc_index, packed_trigram) DISTINCT pairs for a batch of texts,
    vectorized across the whole batch: one UTF-32 decode, shifted-view
    packing, a boundary mask (no trigram crosses two docs), one lexsort
    dedup."""
    n_docs = len(texts)
    if n_docs == 0:
        return (np.array([], np.int64), np.array([], np.int64))
    joined = "".join(texts)
    cp = np.frombuffer(joined.encode("utf-32-le"), dtype=np.uint32).astype(np.uint64)
    lens = np.fromiter((len(t) for t in texts), dtype=np.int64, count=n_docs)
    docidx = np.repeat(np.arange(n_docs, dtype=np.int64), lens)
    if cp.size < 3:
        return (np.array([], np.int64), np.array([], np.int64))
    packed = (cp[:-2] << np.uint64(42)) | (cp[1:-1] << np.uint64(21)) | cp[2:]
    same_doc = docidx[:-2] == docidx[2:]
    d = docidx[:-2][same_doc]
    t = packed[same_doc].astype(np.int64)  # < 2^63: three 21-bit codepoints
    order = np.lexsort((t, d))
    d, t = d[order], t[order]
    keep = np.ones(d.size, dtype=bool)
    keep[1:] = (d[1:] != d[:-1]) | (t[1:] != t[:-1])
    return d[keep], t[keep]


def _block_sets(tb: pa.Table) -> tuple[np.ndarray, np.ndarray, np.ndarray]:
    ids = tb["doc_id"].to_numpy(zero_copy_only=False).astype(np.int64)
    d, t = trigram_sets(tb["text"].to_pylist())
    return ids, d, t


@ray.remote
def _prep_block(tb: pa.Table) -> tuple[np.ndarray, np.ndarray, np.ndarray]:
    """One task per BLOCK: the UTF-32 decode + lexsort trigram dedup runs
    exactly once per block; the B(B+1)/2 pair tasks then share the packed
    arrays via the object store (r3 review: each pair task used to redo
    both blocks' extraction, ~B+1 redundant decodes per block)."""
    return _block_sets(tb)


@ray.remote
def _pair_task(prep_a: tuple, prep_b: tuple, diagonal: bool,
               num: int, den: int) -> pa.Table:
    empty = pa.table({"doc_a": pa.array([], pa.int64()),
                      "doc_b": pa.array([], pa.int64()),
                      "n_inter": pa.array([], pa.int64()),
                      "n_union": pa.array([], pa.int64())})
    ids_a, da, ga = prep_a
    ids_b, db, gb = prep_b
    if ids_a.size == 0 or ids_b.size == 0:
        return empty
    vocab = np.unique(np.concatenate([ga, gb]))
    if vocab.size == 0:
        return empty
    # set-membership matrices; float32 matmul is exact for counts < 2^24
    A = np.zeros((ids_a.size, vocab.size), dtype=np.float32)
    A[da, np.searchsorted(vocab, ga)] = 1.0
    B = np.zeros((ids_b.size, vocab.size), dtype=np.float32)
    B[db, np.searchsorted(vocab, gb)] = 1.0
    inter = (A @ B.T).astype(np.int64)
    sz_a = A.sum(axis=1).astype(np.int64)
    sz_b = B.sum(axis=1).astype(np.int64)
    union = sz_a[:, None] + sz_b[None, :] - inter
    mask = (union > 0) & (inter * den >= union * num)
    ai, bj = np.nonzero(mask)
    a, b = ids_a[ai], ids_b[bj]
    if diagonal:
        keep = a < b
        lo, hi = a[keep], b[keep]
    else:
        # every unordered pair appears in exactly ONE off-diagonal block
        # product; orient by value (blocks are not globally id-sorted)
        keep = a != b
        lo = np.minimum(a[keep], b[keep])
        hi = np.maximum(a[keep], b[keep])
    return pa.table({"doc_a": pa.array(lo), "doc_b": pa.array(hi),
                     "n_inter": pa.array(inter[ai[keep], bj[keep]]),
                     "n_union": pa.array(union[ai[keep], bj[keep]])})


def ngram_jaccard_pairs(sf_dir: str, num: int = THRESH_NUM,
                        den: int = THRESH_DEN) -> ray.data.Dataset:
    """All representative pairs (min doc_id per distinct text) of the
    documents table with trigram Jaccard >= num/den, with exact
    intersection/union sizes."""
    from .grouping import bucketed_group_apply

    docs = ray.data.read_parquet(table_path(sf_dir, "documents"),
                                 columns=["doc_id", "text"],
                                 override_num_blocks=N_BLOCKS)

    def local_first(b: pa.Table) -> pa.Table:
        df = b.to_pandas().sort_values("doc_id", kind="mergesort")
        return pa.Table.from_pandas(df.drop_duplicates("text", keep="first"),
                                    preserve_index=False)

    def bucket_first(g: pd.DataFrame) -> pd.DataFrame:
        g = g.sort_values(["text", "doc_id"], kind="mergesort")
        return g.drop_duplicates("text", keep="first")

    pre = docs.map_batches(local_first, batch_format="pyarrow", batch_size=65536)
    reps = bucketed_group_apply(pre, ["text"], bucket_first,
                                n_buckets=N_BLOCKS).repartition(N_BLOCKS)
    refs = reps.to_arrow_refs()
    prepped = [_prep_block.remote(r) for r in refs]
    out = [
        _pair_task.remote(prepped[i], prepped[j], i == j, num, den)
        for i in range(len(prepped))
        for j in range(i, len(prepped))
    ]
    return ray.data.from_arrow_refs(out)


def sql_ngram_jaccard(num: int = THRESH_NUM, den: int = THRESH_DEN) -> str:
    return f"""
WITH reps AS (SELECT MIN(doc_id) AS doc_id, text FROM documents GROUP BY text),
grams AS (
  SELECT DISTINCT r.doc_id, substr(r.text, CAST(g.i AS INT), 3) AS tg
  FROM reps r, LATERAL (SELECT unnest(generate_series(1, length(r.text) - 2)) AS i) g
),
sizes AS (SELECT doc_id, COUNT(*) AS sz FROM grams GROUP BY doc_id),
inter AS (
  SELECT a.doc_id AS doc_a, b.doc_id AS doc_b, COUNT(*) AS n_inter
  FROM grams a JOIN grams b ON a.tg = b.tg AND a.doc_id < b.doc_id
  GROUP BY 1, 2
)
SELECT i.doc_a, i.doc_b, CAST(i.n_inter AS BIGINT) AS n_inter,
       CAST(sa.sz + sb.sz - i.n_inter AS BIGINT) AS n_union
FROM inter i
JOIN sizes sa ON i.doc_a = sa.doc_id
JOIN sizes sb ON i.doc_b = sb.doc_id
WHERE i.n_inter * {den} >= (sa.sz + sb.sz - i.n_inter) * {num}
""".strip()
