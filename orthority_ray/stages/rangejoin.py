"""Range (interval) join — inequality-predicate joins Ray Data lacks
(brief: "as-of join, range join, windowed aggregate").

First shipped shape: the SELF temporal-neighborhood join — for every left
row, the count of same-key rows with time in ``(t, t + window]``.  The
classic "events followed by events" / burst-detection query; DuckDB oracle
is a plain inequality LEFT JOIN + GROUP BY.

Ray shape: one bucket shuffle on ``hash(key) % B`` (whole keys co-locate),
then per bucket: one sort by (key, time) and TWO vectorized
``searchsorted`` calls per key segment — work is O(rows log rows) per
bucket, output one row per input row.  The per-segment loop is Python but
each iteration is a numpy call over the segment (same trade as
grouping.grouped_pairs; segments = keys per bucket).

Partitioning assumption: a single key's rows fit the bucket's worker —
salt hot keys by coarse time range if one key's history outgrows a worker
(the window only needs ``window`` of overlap replicated across salts).
"""

from __future__ import annotations

import numpy as np
import pandas as pd
import pyarrow as pa
import ray.data

from .grouping import bucketed_group_apply


def self_window_count(
    ds: ray.data.Dataset,
    key: str,
    time_col: str,
    id_col: str,
    window_us: int,
    out_count: str = "n_follow",
    n_buckets: int = 64,
) -> ray.data.Dataset:
    """-> (id_col, out_count): per row, how many same-``key`` rows have
    ``time in (t, t + window_us]``.  Times must be int64-castable."""

    def epoch(b: pa.Table) -> pa.Table:
        # Cast the time column to int64 at the ARROW layer so the epoch
        # integers are always in the column's storage unit (microseconds
        # for timestamp[us]) regardless of how pandas later materializes
        # timestamps — a ns coercion in to_pandas would silently turn a
        # 5-minute window_us into 0.3 ms (r3 review).
        i = b.schema.get_field_index(time_col)
        return b.set_column(i, time_col, b[time_col].cast(pa.int64()))

    def per_bucket(g: pd.DataFrame) -> pd.DataFrame:
        d = g.sort_values([key, time_col], kind="mergesort")
        ids = d[id_col].to_numpy()
        t = d[time_col].to_numpy().astype(np.int64)
        k = d[key].to_numpy()
        seg = np.concatenate([[0], np.flatnonzero(k[1:] != k[:-1]) + 1, [len(d)]])
        n = np.empty(len(d), dtype=np.int64)
        for s, e in zip(seg[:-1], seg[1:]):
            ts = t[s:e]
            # strictly-after through at-most-window: (t, t + W]
            n[s:e] = np.searchsorted(ts, ts + window_us, "right") - np.searchsorted(
                ts, ts, "right"
            )
        return pd.DataFrame({id_col: ids, out_count: n})

    return bucketed_group_apply(
        ds.select_columns([key, time_col, id_col])
        .map_batches(epoch, batch_format="pyarrow", batch_size=65536),
        [key], per_bucket, n_buckets=n_buckets,
    )
