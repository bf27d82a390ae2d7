"""Checksum-pruned table diff (dataset reconciliation).

Compare two keyed snapshots of a corpus (yesterday's crawl vs today's)
and emit the added / removed / changed keys WITHOUT shuffling the parts
that didn't change — the anti-entropy pattern of replicated stores
(Merkle-style summaries, public design), flattened to one level:

1. summary pass: each side computes, per hash bucket, the XOR of its
   rows' 128-bit (key, payload) md5 digests plus a row count — both
   mergeable across blocks with no order sensitivity, so the bucket
   summary table (B rows per side, regardless of data volume) folds on
   the driver;
2. prune: buckets whose (xor, count) match on both sides are PROVEN equal
   up to md5 collision (the repo-wide exact-dedup convention) and never
   leave their scan tasks;
3. diff pass: only rows hashing into differing buckets are tagged,
   unioned and co-located by ONE bucketed exchange; the per-bucket pandas
   outer merge classifies added / removed / changed by key + digest.

With a typical day-over-day change rate of <1%, the exchange moves ~1%
of the corpus while the result is verified row-exact by the DuckDB full
outer join oracle (``table_diff``).
"""

from __future__ import annotations

import hashlib

import numpy as np
import pandas as pd
import pyarrow as pa
import ray
import ray.data

from ..core.config import table_path

N_BUCKETS = 256


def _digests(keys: np.ndarray, payloads: list[str]) -> np.ndarray:
    """(n, 2) uint64 view of md5(key || payload) per row."""
    out = np.empty((len(payloads), 2), dtype=np.uint64)
    for i, (k, p) in enumerate(zip(keys, payloads)):
        d = hashlib.md5(f"{int(k)}\x00{p}".encode("utf-8")).digest()
        out[i] = np.frombuffer(d, dtype=np.uint64)
    return out


def _bucket(keys: np.ndarray, n_buckets: int) -> np.ndarray:
    from ..core.hashing import knuth32

    return knuth32(keys) % n_buckets


def _summaries(ds: ray.data.Dataset, key: str, payload: str,
               n_buckets: int) -> np.ndarray:
    """(n_buckets, 3) [xor_lo, xor_hi, count] folded on the driver."""

    def partial(b: pa.Table) -> pa.Table:
        k = b[key].to_numpy(zero_copy_only=False)
        dig = _digests(k, b[payload].to_pylist())
        bk = _bucket(k, n_buckets)
        acc = np.zeros((n_buckets, 3), dtype=np.uint64)
        np.bitwise_xor.at(acc[:, 0], bk, dig[:, 0])
        np.bitwise_xor.at(acc[:, 1], bk, dig[:, 1])
        np.add.at(acc[:, 2], bk, np.uint64(1))
        return pa.table({"acc": pa.array([acc.tobytes()], pa.large_binary())})

    rows = ds.map_batches(partial, batch_format="pyarrow",
                          batch_size=65536).take_all()
    total = np.zeros((n_buckets, 3), dtype=np.uint64)
    for r in rows:
        a = np.frombuffer(r["acc"], dtype=np.uint64).reshape(n_buckets, 3)
        total[:, :2] ^= a[:, :2]
        total[:, 2] += a[:, 2]
    return total


def table_diff_ds(left: ray.data.Dataset, right: ray.data.Dataset,
                  key: str, payload: str,
                  n_buckets: int = N_BUCKETS) -> ray.data.Dataset:
    """(key, status) for every added/removed/changed row; keys must be
    unique per side.  Only differing buckets are exchanged."""
    ls = _summaries(left, key, payload, n_buckets)
    rs = _summaries(right, key, payload, n_buckets)
    differing = np.nonzero((ls != rs).any(axis=1))[0]
    diff_ref = ray.put(np.sort(differing))

    from ..sources.pages import cached_get

    def tagger(side: int):
        def tag(b: pa.Table) -> pa.Table:
            dbuckets = cached_get(diff_ref)
            k = b[key].to_numpy(zero_copy_only=False)
            bk = _bucket(k, n_buckets)
            keep = np.isin(bk, dbuckets)
            t = b.filter(pa.array(keep))
            k = k[keep]
            dig = _digests(k, t[payload].to_pylist())
            return pa.table({
                "key": pa.array(k.astype(np.int64)),
                "dig_lo": pa.array(dig[:, 0].view(np.int64)),
                "dig_hi": pa.array(dig[:, 1].view(np.int64)),
                "side": pa.array(np.full(k.shape[0], side, np.int64)),
            })

        return tag

    both = left.map_batches(tagger(0), batch_format="pyarrow",
                            batch_size=65536).union(
        right.map_batches(tagger(1), batch_format="pyarrow",
                          batch_size=65536))

    from ..stages.grouping import bucketed_group_apply

    def classify(g: pd.DataFrame) -> pd.DataFrame:
        l = g[g["side"] == 0]
        r = g[g["side"] == 1]
        m = l.merge(r, on="key", how="outer", suffixes=("_l", "_r"),
                    indicator=True)
        status = np.where(
            m["_merge"] == "right_only", "added",
            np.where(m["_merge"] == "left_only", "removed", "changed"))
        unchanged_mask = (m["_merge"] == "both") & \
            (m["dig_lo_l"] == m["dig_lo_r"]) & (m["dig_hi_l"] == m["dig_hi_r"])
        out = pd.DataFrame({"doc_id": m["key"].astype(np.int64),
                            "status": status})
        return out[~unchanged_mask.to_numpy()]

    return bucketed_group_apply(both, ["key"], classify)


MUT_MOD, DEL_MOD, ADD_MOD, ADD_OFFSET = 7, 31, 41, 10000


def table_diff(sf_dir: str) -> ray.data.Dataset:
    """Oracle query: documents vs a deterministically mutated snapshot
    (every %7 text edited, every %31 dropped, a new doc per %41)."""
    left = ray.data.read_parquet(table_path(sf_dir, "documents"),
                                 columns=["doc_id", "text"])

    def mutate(b: pa.Table) -> pa.Table:
        import pyarrow.compute as pc

        doc = b["doc_id"].to_numpy(zero_copy_only=False)
        keep = doc % DEL_MOD != 0
        t = b.filter(pa.array(keep))
        doc = doc[keep]
        mut = pc.binary_join_element_wise(t["text"], " v2", "")
        text = pc.if_else(pa.array(doc % MUT_MOD == 0), mut, t["text"])
        add_src = b["doc_id"].to_numpy(zero_copy_only=False)
        add_ids = add_src[add_src % ADD_MOD == 0]
        return pa.table({
            "doc_id": pa.array(np.concatenate([doc, add_ids + ADD_OFFSET])),
            "text": pa.concat_arrays([
                text.combine_chunks() if isinstance(text, pa.ChunkedArray) else text,
                pa.array([f"new doc {int(i)}" for i in add_ids], pa.string())]),
        })

    right = left.map_batches(mutate, batch_format="pyarrow", batch_size=65536)
    return table_diff_ds(left, right, "doc_id", "text")


def sql_table_diff() -> str:
    return f"""
WITH r AS (
  SELECT doc_id,
         CASE WHEN doc_id % {MUT_MOD} = 0 THEN text || ' v2' ELSE text END AS text
  FROM documents WHERE doc_id % {DEL_MOD} <> 0
  UNION ALL
  SELECT doc_id + {ADD_OFFSET} AS doc_id,
         'new doc ' || CAST(doc_id AS VARCHAR) AS text
  FROM documents WHERE doc_id % {ADD_MOD} = 0
)
SELECT COALESCE(l.doc_id, r.doc_id) AS doc_id,
       CASE WHEN l.doc_id IS NULL THEN 'added'
            WHEN r.doc_id IS NULL THEN 'removed'
            ELSE 'changed' END AS status
FROM documents l FULL OUTER JOIN r ON l.doc_id = r.doc_id
WHERE l.doc_id IS NULL OR r.doc_id IS NULL OR l.text <> r.text
""".strip()
