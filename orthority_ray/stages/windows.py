"""Per-key ordered window operators: lag/delta, running (cumulative) sum,
top-N-per-group row_number — the SQL window functions re-expressed on Ray
Data.

Distributed shape (shared with the sessionizer, `relational.q_event_sessions`):
one hash-bucket shuffle on the partition key (`grouping.bucketed_group_apply`
— wide-step group count is a CONSTANT, not the key cardinality), then each
bucket holds only WHOLE groups and every window is evaluated with ONE
vectorized sort + segment arithmetic across all groups in the bucket — no
per-group Python, no per-group DataFrames.

Semantics (matching ``OVER (PARTITION BY key ORDER BY order_cols)`` with a
fully deterministic order — callers must include a unique tiebreaker in
``order_cols``):

- :func:`grouped_lag_delta` — LAG(value) delta per key; first row of each
  partition gets ``fill`` (no NULLs: int64 stays int64 through Arrow).
- :func:`grouped_running_sum` — SUM(value) OVER (... ROWS UNBOUNDED
  PRECEDING), exact for int64 values (order-insensitive driver hashing is
  satisfied because each output ROW is deterministic, not because the sum
  commutes).
- :func:`grouped_topn` — ROW_NUMBER() <= n per key, ordering by
  ``order_cols`` with per-column ascending flags.

The reference engine has no window surface (its per-tile loops are the
closest analog, `orthority/ortho.py:430-480`); these are graft-breadth
operators for the event/orders tables.
"""

from __future__ import annotations

import numpy as np
import pandas as pd
import ray.data

from .grouping import bucketed_group_apply


def _segment_starts(keys: np.ndarray) -> np.ndarray:
    """Boolean mask: True where a new key segment starts (input sorted by key)."""
    new = np.empty(keys.shape[0], dtype=bool)
    if keys.shape[0]:
        new[0] = True
        new[1:] = keys[1:] != keys[:-1]
    return new


def _sorted_by(df: pd.DataFrame, key: str, order_cols: list[str],
               ascending: list[bool] | None = None) -> pd.DataFrame:
    cols = [key, *order_cols]
    asc = [True] + (ascending if ascending is not None else [True] * len(order_cols))
    return df.sort_values(cols, ascending=asc, kind="mergesort")


def grouped_lag_delta(
    ds: ray.data.Dataset,
    key: str,
    order_cols: list[str],
    value: str,
    out_cols: list[str],
    delta_name: str = "delta",
    fill: int = -1,
    n_buckets: int = 64,
) -> ray.data.Dataset:
    """Per-key delta of ``value`` vs the previous row in ``order_cols`` order
    (``value - LAG(value)``); first row of each partition gets ``fill``.
    Output columns: ``out_cols`` + ``delta_name`` (int64)."""

    def fn(g: pd.DataFrame) -> pd.DataFrame:
        d = _sorted_by(g, key, order_cols)
        k = d[key].to_numpy()
        v = d[value].to_numpy().astype(np.int64)
        delta = np.empty(v.shape[0], dtype=np.int64)
        if v.shape[0]:
            delta[1:] = v[1:] - v[:-1]
        delta[_segment_starts(k)] = fill
        out = d[out_cols].copy()
        out[delta_name] = delta
        return out

    return bucketed_group_apply(ds, [key], fn, n_buckets=n_buckets)


def grouped_running_sum(
    ds: ray.data.Dataset,
    key: str,
    order_cols: list[str],
    value: str,
    out_cols: list[str],
    cum_name: str = "cum",
    n_buckets: int = 64,
) -> ray.data.Dataset:
    """Per-key cumulative SUM of int64 ``value`` in ``order_cols`` order
    (``ROWS UNBOUNDED PRECEDING``).  Exact: the whole-bucket cumsum minus the
    cumsum at each segment start (one subtraction, no per-group loop)."""

    def fn(g: pd.DataFrame) -> pd.DataFrame:
        d = _sorted_by(g, key, order_cols)
        k = d[key].to_numpy()
        v = d[value].to_numpy().astype(np.int64)
        cum = np.cumsum(v)
        starts = np.flatnonzero(_segment_starts(k))
        if starts.shape[0]:
            # value of the running total just BEFORE each segment start
            base = cum[starts] - v[starts]
            seg_id = np.cumsum(_segment_starts(k)) - 1
            cum = cum - base[seg_id]
        out = d[out_cols].copy()
        out[cum_name] = cum
        return out

    return bucketed_group_apply(ds, [key], fn, n_buckets=n_buckets)


def grouped_rolling_sum(
    ds: ray.data.Dataset,
    key: str,
    order_cols: list[str],
    value: str,
    out_cols: list[str],
    win: int,
    roll_name: str = "roll",
    n_buckets: int = 64,
) -> ray.data.Dataset:
    """Per-key rolling SUM of int64 ``value`` over the last ``win`` rows
    (``ROWS BETWEEN win-1 PRECEDING AND CURRENT ROW``) in ``order_cols``
    order.  Exact and loop-free: roll[i] = cum[i] - cum[first_in_window-1],
    where the window start is clamped to each key segment's start."""
    if win < 1:
        raise ValueError("window must span at least the current row")

    def fn(g: pd.DataFrame) -> pd.DataFrame:
        d = _sorted_by(g, key, order_cols)
        k = d[key].to_numpy()
        v = d[value].to_numpy().astype(np.int64)
        cum = np.cumsum(v)
        new = _segment_starts(k)
        starts = np.flatnonzero(new)
        seg_id = np.cumsum(new) - 1
        i = np.arange(k.shape[0], dtype=np.int64)
        first = np.maximum(i - (win - 1),
                           starts[seg_id] if starts.shape[0] else i)
        base = np.where(first > 0, cum[np.maximum(first - 1, 0)], 0)
        out = d[out_cols].copy()
        out[roll_name] = cum - base
        return out

    return bucketed_group_apply(ds, [key], fn, n_buckets=n_buckets)


def grouped_topn(
    ds: ray.data.Dataset,
    key: str,
    order_cols: list[str],
    ascending: list[bool],
    n: int,
    out_cols: list[str],
    rank_name: str = "rn",
    n_buckets: int = 64,
) -> ray.data.Dataset:
    """ROW_NUMBER() OVER (PARTITION BY key ORDER BY order_cols) <= n.
    ``order_cols``/``ascending`` must define a total order within each key
    (include a unique tiebreaker).  Ranks computed for all groups at once:
    position-in-segment = arange - repeat(segment start)."""

    def fn(g: pd.DataFrame) -> pd.DataFrame:
        d = _sorted_by(g, key, order_cols, ascending)
        k = d[key].to_numpy()
        new = _segment_starts(k)
        starts = np.flatnonzero(new)
        seg_id = np.cumsum(new) - 1
        pos = np.arange(k.shape[0], dtype=np.int64) - starts[seg_id]
        keep = pos < n
        out = d.loc[keep, out_cols].copy()
        out[rank_name] = pos[keep] + 1
        return out

    return bucketed_group_apply(ds, [key], fn, n_buckets=n_buckets)


def grouped_lead(
    ds: ray.data.Dataset,
    key: str,
    order_cols: list[str],
    value: str,
    out_cols: list[str],
    lead_name: str = "lead",
    fill: int = -1,
    n_buckets: int = 64,
) -> ray.data.Dataset:
    """Per-key NEXT row's ``value`` in ``order_cols`` order (``LEAD(value)``);
    the last row of each partition gets ``fill``.  The SCD-2 interval
    builder: with ``value`` = the order timestamp itself, each row's lead is
    its validity end.  Output columns: ``out_cols`` + ``lead_name`` (int64).
    Same one-sort segment arithmetic as :func:`grouped_lag_delta` — a
    backward shift with segment ENDS (not starts) taking the fill."""

    def fn(g: pd.DataFrame) -> pd.DataFrame:
        d = _sorted_by(g, key, order_cols)
        k = d[key].to_numpy()
        v = d[value].to_numpy().astype(np.int64)
        nxt = np.empty(v.shape[0], dtype=np.int64)
        if v.shape[0]:
            nxt[:-1] = v[1:]
            nxt[-1] = fill
            # rows just before a new segment start are segment ENDS
            ends = np.flatnonzero(_segment_starts(k)[1:])
            nxt[ends] = fill
        out = d[out_cols].copy()
        out[lead_name] = nxt
        return out

    return bucketed_group_apply(ds, [key], fn, n_buckets=n_buckets)


def global_rank(ds: ray.data.Dataset, val_col: str, id_col: str,
                out_cols: list[str], *, descending: bool = True,
                rank_name: str = "rnk", ntile: int | None = None,
                ntile_name: str = "quartile",
                n_buckets: int = 64) -> ray.data.Dataset:
    """GLOBAL ROW_NUMBER over (val_col, id_col) without materializing a full
    sort on one node — the distributed global-rank primitive:

    1. sample ``val_col`` and cut ``n_buckets`` RANGE boundaries (equal-value
       rows always land in one bucket, so ties resolve locally);
    2. one tiny pruned pass counts rows per range bucket -> driver-side
       offsets (n_buckets rows, bounded);
    3. each bucket sorts locally by (val, id) and emits offset + local rank.

    ``ntile=k`` additionally emits the SQL NTILE(k) bucket (first n%k
    buckets take ceil(n/k) rows), computable from the global rank alone.
    Oracle twin: ROW_NUMBER()/NTILE() OVER (ORDER BY val [DESC], id).

    The input pipeline executes ONCE (materialized); the sample and count
    passes are column-pruned re-reads of the materialized blocks, never
    re-executions of the upstream stages (r3 review: the old shape ran the
    upstream three times and sampled a fixed FRACTION of the dataset to the
    driver — O(N) at scale.  The sampler now takes <=256 evenly-spaced
    values per batch, O(blocks) on the driver; bounds only steer bucketing,
    ranks are exact for any bounds, so representative beats random).
    """
    import pyarrow as pa

    import ray

    from ..sources.pages import cached_get

    sign = -1.0 if descending else 1.0

    mat = ds.materialize()

    def boundary_sample(b: pa.Table) -> pa.Table:
        v = b[val_col].to_numpy(zero_copy_only=False)
        k = min(256, len(v))
        idx = (np.linspace(0, len(v) - 1, num=k).astype(np.int64)
               if k else np.empty(0, dtype=np.int64))
        return pa.table({val_col: pa.array(v[idx])})

    sampled = (mat.select_columns([val_col])
               .map_batches(boundary_sample, batch_format="pyarrow",
                            batch_size=65536).take_all())
    vals = np.sort(np.array([r[val_col] for r in sampled]) * sign)
    qs = np.linspace(0, 1, n_buckets + 1)[1:-1]
    bounds = np.unique(np.quantile(vals, qs)) if vals.size else np.array([])
    bounds_ref = ray.put(bounds)

    def tag(b: pa.Table) -> pa.Table:
        bd = cached_get(bounds_ref)
        v = b[val_col].to_numpy(zero_copy_only=False) * sign
        return b.append_column("__rbucket", pa.array(
            np.searchsorted(bd, v, side="left").astype(np.int64)))

    tagged = mat.map_batches(tag, batch_format="pyarrow", batch_size=65536)

    def bcount(b: pa.Table) -> pa.Table:
        u, c = np.unique(b["__rbucket"].to_numpy(zero_copy_only=False),
                         return_counts=True)
        return pa.table({"__rbucket": pa.array(u),
                         "n": pa.array(c.astype(np.int64))})

    counts = (
        mat.select_columns([val_col])
        .map_batches(tag, batch_format="pyarrow", batch_size=65536)
        .map_batches(bcount, batch_format="pyarrow", batch_size=65536)
        .groupby("__rbucket")
        .aggregate(ray.data.aggregate.Sum("n", alias_name="n"))
        .to_pandas()
        .sort_values("__rbucket")
    )
    total = int(counts["n"].sum())
    sizes = np.zeros(len(bounds) + 1, dtype=np.int64)
    sizes[counts["__rbucket"].to_numpy()] = counts["n"].to_numpy()
    offsets = np.concatenate([[0], np.cumsum(sizes)[:-1]])
    off_ref = ray.put(offsets)
    if ntile:
        q, r = divmod(total, ntile)

    def rank_bucket(g: pd.DataFrame) -> pd.DataFrame:
        off = cached_get(off_ref)
        bucket = int(g["__rbucket"].iloc[0])
        g = g.sort_values([val_col, id_col],
                          ascending=[not descending, True], kind="mergesort")
        rnk = off[bucket] + np.arange(1, len(g) + 1, dtype=np.int64)
        out = g[out_cols].copy()
        out[rank_name] = rnk
        if ntile:
            head = r * (q + 1)
            out[ntile_name] = np.where(
                rnk <= head,
                (rnk - 1) // max(q + 1, 1) + 1,
                r + (rnk - 1 - head) // max(q, 1) + 1,
            ).astype(np.int64)
        return out

    return tagged.groupby("__rbucket").map_groups(rank_bucket, batch_format="pandas")


def grouped_rolling_quantile(
    ds: ray.data.Dataset,
    key: str,
    order_cols: list[str],
    value: str,
    out_cols: list[str],
    window: int,
    q: float = 0.5,
    roll_name: str = "roll_med",
    n_buckets: int = 64,
) -> ray.data.Dataset:
    """Per-key rolling DISCRETE quantile of ``value`` over the trailing
    ``window`` rows (``quantile_disc(...) OVER (... ROWS window-1
    PRECEDING)`` semantics, partial windows at each partition's head
    included) — the windowed-quantile primitive behind rolling medians /
    robust smoothing, which Ray Data has no native analog for.

    Fully vectorized across every key in the bucket: one sort, then the
    whole bucket's windows are materialized at once via a sentinel-padded
    ``sliding_window_view`` — (window-1) int64-max sentinels precede each
    key segment, so a head window's missing slots sort AFTER its real
    values and the property-tested ``disc_index_vec(m, q)`` (m = valid
    count) picks exactly DuckDB's element.  Memory is O(bucket_rows x
    window); keep ``window`` small (it is a ROWS frame, not RANGE)."""
    from .quantiles import disc_index_vec

    def fn(g: pd.DataFrame) -> pd.DataFrame:
        from numpy.lib.stride_tricks import sliding_window_view

        d = _sorted_by(g, key, order_cols)
        k = d[key].to_numpy()
        v = d[value].to_numpy().astype(np.int64)
        n = v.shape[0]
        if n == 0:
            out = d[out_cols].copy()
            out[roll_name] = np.array([], np.int64)
            return out
        new = _segment_starts(k)
        starts = np.flatnonzero(new)
        seg_id = np.cumsum(new) - 1
        pos = np.arange(n, dtype=np.int64) - starts[seg_id]
        W = window
        BIG = np.iinfo(np.int64).max
        padded = np.full(n + starts.shape[0] * (W - 1), BIG, np.int64)
        ppos = np.arange(n, dtype=np.int64) + (seg_id + 1) * (W - 1)
        padded[ppos] = v
        rows = sliding_window_view(padded, W)[ppos - W + 1]
        rows_sorted = np.sort(rows, axis=1)
        m = np.minimum(pos + 1, W)
        med = rows_sorted[np.arange(n), disc_index_vec(m, q)]
        out = d[out_cols].copy()
        out[roll_name] = med.astype(np.int64)
        return out

    return bucketed_group_apply(ds, [key], fn, n_buckets=n_buckets)
