"""As-of join: each left row matched to the LATEST right row with
``right_time <= left_time`` for the same key — the classic event-to-state
temporal join (brief: "operator Ray Data lacks: as-of join"; engine analog
of the reference's nearest-preceding-parameter lookup when interior params
are keyed per capture time, `orthority/param_io.py` ext-param tables).

Ray shape (hashjoin.py pattern): both sides are tagged with
``hash(key) % B`` and unioned so ONE ``groupby(bucket)`` shuffle co-locates
every key's full left and right history; inside each bucket a single
``pd.merge_asof(by=key)`` (compiled, vectorized over all keys at once)
performs the backward match.

Partitioning assumption: one KEY's right-side history must fit its
bucket's worker; hot keys can be salted by time range (coarse time bucket
in the key, right side replicated into the next range) if a single history
outgrows a worker.

Determinism on time ties: the right side is sorted by (time, tiebreak
columns) and ``merge_asof`` takes the LAST tied row, so ties resolve to the
max tiebreak — mirror the same rule in any oracle (``QUALIFY row_number()
OVER (PARTITION BY key, time ORDER BY tiebreak DESC) = 1``).
"""

from __future__ import annotations

import numpy as np
import pandas as pd
import pyarrow as pa
import ray.data

DEFAULT_BUCKETS = 64


def asof_join(
    left: ray.data.Dataset,
    right: ray.data.Dataset,
    key: str,
    time_col: str,
    left_cols: list[str],
    right_cols: list[str],
    fill: int = -1,
    n_buckets: int = DEFAULT_BUCKETS,
) -> ray.data.Dataset:
    """Backward as-of join on int64 ``key`` and int64 ``time_col`` (both
    sides must share the two names; non-key/time output columns must not
    overlap and must be int64 — unmatched left rows get ``fill`` so the
    output never NaN-upcasts).  ``left_cols`` / ``right_cols`` list each
    side's OUTPUT columns (key/time included as desired); right rows are
    tie-broken to the last (time, *value*) sort order.
    """
    overlap = (set(left_cols) & set(right_cols)) - {key, time_col}
    if overlap:
        raise ValueError(f"non-key column overlap not supported: {sorted(overlap)}")
    l_only = [c for c in left_cols if c not in (key, time_col)]
    r_only = [c for c in right_cols if c not in (key, time_col)]

    # NOTE: deliberately NOT shared with hashjoin._with_bucket despite the
    # similar shape — this tag casts every carried column to int64 (the
    # operator's contract: int64-only payloads so null-padding can never
    # lossy-upcast), while hashjoin's tag preserves arbitrary dtypes.  A
    # shared helper would need both behaviors behind a flag; keep the two
    # invariants separately owned and separately tested instead.
    def tag(side: int, cols: list[str], pad: list[str]):
        def f(batch: pa.Table) -> pa.Table:
            k = batch[key].to_numpy(zero_copy_only=False).astype(np.int64)
            from ..core.hashing import knuth32

            bucket = knuth32(k) % n_buckets
            out = {key: pa.array(k),
                   time_col: batch[time_col].cast(pa.int64())}
            for c in cols:
                out[c] = batch[c].cast(pa.int64())
            for c in pad:
                out[c] = pa.nulls(batch.num_rows, pa.int64())
            out["__bucket"] = pa.array(bucket)
            out["__side"] = pa.array(np.full(batch.num_rows, side, dtype=np.int8))
            order = sorted(c for c in out if not c.startswith("__"))
            return pa.table({c: out[c] for c in [*order, "__bucket", "__side"]})

        return f

    lt = left.map_batches(tag(0, l_only, r_only), batch_format="pyarrow",
                          batch_size=65536)
    rt = right.map_batches(tag(1, r_only, l_only), batch_format="pyarrow",
                           batch_size=65536)
    both = lt.union(rt)
    out_cols = [*left_cols, *r_only]

    def probe(g: pa.Table) -> pd.DataFrame:
        # split in Arrow (int64 + nulls stays int64) and convert only the
        # null-free sides to pandas — a pandas group would upcast each
        # side's null-padded columns to float64, lossy past 2^53
        lmask = pa.array(g["__side"].to_numpy(zero_copy_only=False) == 0)
        l = g.filter(lmask).select([key, time_col, *l_only]).to_pandas()
        r = g.filter(pa.compute.invert(lmask)).select(
            [key, time_col, *r_only]
        ).to_pandas()
        l = l.sort_values(time_col, kind="mergesort")
        r = r.sort_values([time_col, *r_only], kind="mergesort")
        if not len(l):
            return pd.DataFrame({c: np.array([], np.int64) for c in out_cols})
        if not len(r):
            m = l.copy()
            for c in r_only:
                m[c] = np.int64(fill)
            return m[out_cols].reset_index(drop=True)
        # match on a positional index and gather values with an int take:
        # letting merge_asof carry the value columns would round-trip them
        # through float64 (NaN-fill upcast), unsafe for int64 ids >= 2^53
        r = r.reset_index(drop=True)
        ridx = r[[key, time_col]].copy()
        ridx["__ri"] = np.arange(len(r), dtype=np.int64)
        m = pd.merge_asof(l, ridx, on=time_col, by=key, direction="backward")
        ri = m["__ri"].to_numpy(dtype=np.float64, na_value=np.nan)
        hit = ~np.isnan(ri)
        take = ri[hit].astype(np.int64)
        for c in r_only:
            col = np.full(len(m), fill, dtype=np.int64)
            col[hit] = r[c].to_numpy()[take]
            m[c] = col
        return m[out_cols].reset_index(drop=True)

    return both.groupby("__bucket").map_groups(probe, batch_format="pyarrow")
