"""Bucketed group-apply — the scale-safe replacement for per-group
``groupby(keys).map_groups(fn)`` when the GROUP COUNT grows with the data.

Ray's ``map_groups`` invokes the Python callback once per group; with
data-proportional group counts (distinct texts, LSH buckets, candidate
pairs) that is millions of pandas-DataFrame constructions per block —
measured 3.3 s for 4 000 groups vs 0.05 s vectorized.  The fix mirrors
``relational.bucketed_sum``: hash the group key into ``n_buckets`` buckets,
shuffle once on the bucket id (group count of the wide step becomes a
CONSTANT), and hand each bucket — containing only WHOLE groups — to a
callback that processes all its groups with vectorized pandas/numpy.

The bucket id never reaches the callback's output, and bucket assignment
cannot change results (outputs are unioned), so any process-stable hash
works; ``pd.util.hash_array`` (SipHash-1-3, fixed key, no per-process salt)
covers every dtype including strings.
"""

from __future__ import annotations

from typing import Callable

import numpy as np
import pandas as pd
import pyarrow as pa
import ray.data


def _bucket_ids(df: pd.DataFrame, keys: list[str], n_buckets: int) -> np.ndarray:
    h = np.zeros(len(df), dtype=np.uint64)
    with np.errstate(over="ignore"):
        for k in keys:
            h = h * np.uint64(0x9E3779B97F4A7C15) + pd.util.hash_array(
                np.asarray(df[k].to_numpy())
            )
    return (h % np.uint64(n_buckets)).astype(np.int64)


def bucketed_group_apply(
    ds: ray.data.Dataset,
    keys: list[str],
    fn: Callable[[pd.DataFrame], pd.DataFrame],
    n_buckets: int = 64,
    batch_size: int | None = 65536,
) -> ray.data.Dataset:
    """``fn`` receives one pandas DataFrame per bucket holding ALL rows of
    every group hashed to it (no split groups) and must itself iterate /
    vectorize over the groups; outputs are unioned across buckets.

    ``n_buckets`` bounds the wide step's group count — size it to a few ×
    cluster cores so buckets stay parallel and per-group reduce overhead
    stays constant.  ``batch_size`` bundles the tag stage so the sort
    shuffle sees few, large partials (see combined_groupby_sum's note).

    SCALE CONTRACT: each bucket materializes as ONE pandas DataFrame, so
    per-reducer memory is O(input / n_buckets).  The default 64 fits the
    pre-aggregated/dimension-sized inputs most callers feed it; a caller
    streaming a DATA-PROPORTIONAL table through here must size
    ``n_buckets`` from the input (rows / target_bucket_rows — the sampled
    protocol in hashjoin.plan_hash_join / stages/salting.py), not the
    default."""

    def tag(b: pa.Table) -> pa.Table:
        df = b.select(keys).to_pandas()  # hash only the key columns
        return b.append_column(
            "__bucket", pa.array(_bucket_ids(df, keys, n_buckets))
        )

    def apply(g: pd.DataFrame) -> pd.DataFrame:
        return fn(g.drop(columns="__bucket"))

    return (
        ds.map_batches(tag, batch_format="pyarrow", batch_size=batch_size)
        .groupby("__bucket")
        .map_groups(apply, batch_format="pandas")
    )


_TRIU_CACHE: dict[int, tuple[np.ndarray, np.ndarray]] = {}
# cache only small sizes: one 50k-id group would pin two n(n-1)/2 int64
# arrays (~20 GB) in the worker forever; big groups are rare, recompute
_TRIU_CACHE_MAX_N = 1024


def _triu(n: int) -> tuple[np.ndarray, np.ndarray]:
    t = _TRIU_CACHE.get(n)
    if t is None:
        t = np.triu_indices(n, k=1)
        if n <= _TRIU_CACHE_MAX_N and len(_TRIU_CACHE) < 4096:
            _TRIU_CACHE[n] = t
    return t


def grouped_pairs(df: pd.DataFrame, keys: list[str], id_col: str,
                  out_a: str, out_b: str) -> pd.DataFrame:
    """All unordered (a < b) DISTINCT-id pairs within each group of ``df``
    — the LSH-bucket pair expansion, vectorized across groups: one sort +
    one duplicate-drop for the whole bucket, then per-group numpy slicing
    with size-cached ``triu_indices`` (no per-group DataFrames)."""
    if not len(df):
        return pd.DataFrame({out_a: np.array([], np.int64),
                             out_b: np.array([], np.int64)})
    d = df[keys + [id_col]].sort_values(keys + [id_col], kind="mergesort")
    d = d.drop_duplicates()  # distinct ids within each group
    ids = d[id_col].to_numpy()
    # group boundaries by DIRECT adjacent comparison on the sorted keys —
    # no hash combine, so no (however unlikely) collision can ever merge
    # two adjacent groups into cross-group pairs (r3 review)
    change = np.zeros(len(d), dtype=bool)
    for k in keys:
        kv = d[k].to_numpy()
        change[1:] |= kv[1:] != kv[:-1]
    boundary = np.flatnonzero(change)
    starts = np.concatenate([[0], boundary])
    ends = np.concatenate([boundary, [len(d)]])
    parts_a: list[np.ndarray] = []
    parts_b: list[np.ndarray] = []
    for s, e in zip(starts, ends):
        c = e - s
        if c < 2:
            continue
        ia, ib = _triu(int(c))
        g = ids[s:e]
        parts_a.append(g[ia])
        parts_b.append(g[ib])
    if not parts_a:
        return pd.DataFrame({out_a: np.array([], np.int64),
                             out_b: np.array([], np.int64)})
    return pd.DataFrame({out_a: np.concatenate(parts_a),
                         out_b: np.concatenate(parts_b)})


def distinct_rows(ds: ray.data.Dataset, keys: list[str],
                  n_buckets: int = 64) -> ray.data.Dataset:
    """DISTINCT over ``keys`` via one bucket shuffle + vectorized
    ``drop_duplicates`` per bucket.  The surviving row is deterministic:
    the sort covers ALL columns (keys first), so the representative does
    not depend on shuffle arrival order even when non-key columns are not
    functionally dependent on the keys (r3 review)."""

    def fn(g: pd.DataFrame) -> pd.DataFrame:
        order = keys + [c for c in g.columns if c not in keys]
        return g.sort_values(order, kind="mergesort").drop_duplicates(keys)

    return bucketed_group_apply(ds, keys, fn, n_buckets=n_buckets)


def bucketed_agg(
    ds: ray.data.Dataset,
    keys: list[str],
    agg_map: dict[str, str],
    n_buckets: int = 64,
    batch_size: int | None = 65536,
) -> ray.data.Dataset:
    """``groupby(keys).agg(agg_map)`` through the bucket-hash exchange —
    the high-cardinality-safe replacement for Ray's
    ``Dataset.groupby().aggregate(...)``: Ray's sort-based reduce degrades
    with KEY CARDINALITY (r5 measurement: 2.5M distinct int64 keys over
    5.8M rows = 42 s vs 1.5 s through a 64-value bucket hash), so any
    fold whose key is ROW-SCALE (per-text, per-node, per-doc) should come
    through here.  ``agg_map``: output column -> pandas agg name
    ('sum' | 'min' | 'max' | 'size' etc., applied to the column of the
    same name); column order = keys + agg_map order, dtypes preserved by
    the vectorized in-bucket pandas agg.  Callers whose fold key is
    dimension-sized should keep Ray's native aggregate (one less map
    stage and the reduce is cheap there)."""

    def merge(g: pd.DataFrame) -> pa.Table:
        out = g.groupby(keys, as_index=False, sort=False).agg(
            **{c: (c, f) for c, f in agg_map.items()})
        # emit ARROW blocks so callers can union the result with
        # arrow-block datasets (mixed block types fail Ray's batcher)
        return pa.Table.from_pandas(out, preserve_index=False)

    return bucketed_group_apply(ds, keys, merge, n_buckets=n_buckets,
                                batch_size=batch_size)
