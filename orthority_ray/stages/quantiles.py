"""Distributed median / quantile operators (SURVEY §2.6 A2 gap).

The reference derives its GSD from a median (``nanmedian`` over per-pixel
scales, /root/reference/orthority/ortho.py:223); round 1 shipped only
min/max.  Three Ray-Data-first strategies, by data shape:

- :func:`grouped_median` — EXACT per-group discrete median via
  ``groupby(key).map_groups`` (a group fits a worker: the grouped-quantile
  case).  DuckDB-oracle-exact: picks ``sorted[ceil(n*q) - 1]``, the same
  element as ``quantile_disc(col, q)``.
- :func:`exact_quantiles_int` — EXACT global quantiles of an integer column
  via the two-pass count-then-select: per-batch ``np.bincount`` partials ->
  ``groupby(value).sum`` (shuffle is value-cardinality-sized, not
  row-sized) -> cumulative-count selection.  Right whenever the value
  universe is bounded (milli-degree coords, token counts, ...).
- :class:`KllSketch` / :func:`sketch_quantiles` — mergeable bounded-memory
  rank sketch for unbounded/float columns: per-batch partial sketches
  merged associatively (map_batches partials -> tree of merges).
  Compaction keeps every second element of a sorted full level
  (deterministic, so results are parallelism-invariant given the same
  block partition; error ~ 1/capacity of rank).  Rows-only query with a
  tolerance test vs numpy.
"""

from __future__ import annotations

import numpy as np
import pandas as pd
import pyarrow as pa
import ray.data


def _disc_index(n: int, q: float) -> int:
    """Index of the discrete q-quantile in a sorted array — the smallest
    element whose CDF >= q, i.e. ``ceil(n*q) - 1`` (clamped at 0 for q=0),
    the element DuckDB's quantile_disc picks.  r3 review: the previous
    ``floor((n-1)*q)`` diverges whenever frac(n*q) is in (0, q) — e.g.
    n=12, q=0.9 picks index 9 instead of DuckDB's 10 — and only matched
    the oracle because the test table's row count is a multiple of 100."""
    return max(int(np.ceil(n * q)) - 1, 0)


def disc_index_vec(n: np.ndarray, q: float) -> np.ndarray:
    """Vectorized :func:`_disc_index` over an array of group sizes — same
    ``max(ceil(n*q) - 1, 0)`` formula, one element per group."""
    return np.maximum(np.ceil(n * q).astype(np.int64) - 1, 0)


def grouped_median(ds: ray.data.Dataset, key: str, col: str,
                   q: float = 0.5) -> ray.data.Dataset:
    """(key, n, median) per group — exact discrete quantile inside each
    group (hash-partitioned; per-group data fits a worker)."""

    def med(g: pd.DataFrame) -> pd.DataFrame:
        # all groups in the bucket at once: one sort, then the per-group
        # discrete-quantile element picked by segment offset arithmetic
        g = g.sort_values([key, col], kind="mergesort")
        k = g[key].to_numpy()
        v = g[col].to_numpy()
        starts = np.concatenate([[0], np.flatnonzero(k[1:] != k[:-1]) + 1])
        ends = np.concatenate([starts[1:], [len(g)]])
        n = ends - starts
        # DuckDB quantile_disc picks the smallest element with CDF >= q:
        # index ceil(n*q) - 1 (verified against all fractional cases;
        # identical to floor((n-1)*q) at q=0.5, so median oracles stand)
        idx = starts + np.ceil(n * q).astype(np.int64) - 1
        return pd.DataFrame(
            {key: k[starts], "n": n.astype(np.int64),
             "median": v[idx].astype(np.int64)}
        )

    from .grouping import bucketed_group_apply

    return bucketed_group_apply(ds, [key], med)


def grouped_median_cont2x(ds: ray.data.Dataset, key: str,
                          col: str) -> ray.data.Dataset:
    """(key, n, med2x) per group — the INTERPOLATED median
    (percentile_cont semantics) kept exact by doubling: med2x is the sum
    of the two middle order statistics (== 2 * the continuous median), so
    no float midpoint crosses the wire.  Same one-sort segment-offset
    pick as grouped_median with a second index."""

    def med(g: pd.DataFrame) -> pd.DataFrame:
        g = g.sort_values([key, col], kind="mergesort")
        k = g[key].to_numpy()
        v = g[col].to_numpy().astype(np.int64)
        starts = np.concatenate([[0], np.flatnonzero(k[1:] != k[:-1]) + 1])
        ends = np.concatenate([starts[1:], [len(g)]])
        n = ends - starts
        lo = starts + (n - 1) // 2
        hi = starts + n // 2
        return pd.DataFrame(
            {key: k[starts], "n": n.astype(np.int64),
             "med2x": (v[lo] + v[hi]).astype(np.int64)})

    from .grouping import bucketed_group_apply

    return bucketed_group_apply(ds, [key], med)


def sql_grouped_median_cont2x(key: str, col: str, table: str) -> str:
    # (a+b)/2 is exactly representable for int inputs < 2^52, so *2
    # round-trips to the integer sum of the two middle order statistics
    return (
        f"SELECT {key}, COUNT(*) AS n, "
        f"CAST(quantile_cont({col}, 0.5) * 2 AS BIGINT) AS med2x "
        f"FROM {table} GROUP BY {key}"
    )


def sql_grouped_median(key: str, col: str, table: str, q: float = 0.5) -> str:
    return (
        f"SELECT {key}, COUNT(*) AS n, "
        f"CAST(quantile_disc({col}, {q!r}) AS BIGINT) AS median "
        f"FROM {table} GROUP BY {key}"
    )


# --- exact global quantiles over a bounded integer universe -----------------


def exact_quantiles_int(ds: ray.data.Dataset, col: str, qs: tuple[float, ...],
                        batch_size: int = 65536) -> pd.DataFrame:
    """(q_pm, value) exact discrete quantiles of an int column.

    Pass 1 is a distributed histogram: per-batch value counts (already a
    combiner: batch -> <=distinct rows) -> bucketed sum (64 hash buckets;
    Ray's native aggregate pays per-group cost at 100k+ distinct values).
    The final cumulative select runs on the value-cardinality-sized
    histogram — dimension-sized, never row-sized.
    """
    from ..pipelines.relational import bucketed_sum

    def counts(b: pa.Table) -> pa.Table:
        v = b[col].to_numpy(zero_copy_only=False)
        u, c = np.unique(v, return_counts=True)
        return pa.table({"value": pa.array(u.astype(np.int64)),
                         "n": pa.array(c.astype(np.int64))})

    partials = ds.select_columns([col]).map_batches(
        counts, batch_format="pyarrow", batch_size=batch_size
    )
    hist = (
        bucketed_sum(partials, "value", "n")
        .to_pandas()  # bounded by the value universe, not the row count
        .sort_values("value")
        .reset_index(drop=True)
    )
    cum = hist["n"].cumsum().to_numpy()
    total = int(cum[-1]) if len(cum) else 0
    if total == 0:  # empty input: no quantiles, not an IndexError
        return pd.DataFrame({"q_pm": np.array([], np.int64),
                             "value": np.array([], np.int64)})
    rows = []
    for q in qs:
        idx = _disc_index(total, q)
        pos = int(np.searchsorted(cum, idx + 1, "left"))
        rows.append((int(round(q * 1_000_000)), int(hist["value"].iloc[pos])))
    return pd.DataFrame(rows, columns=["q_pm", "value"]).astype(np.int64)


def bucketize_exact(ds: ray.data.Dataset, col: str,
                    qs: tuple[float, ...] = (0.1, 0.2, 0.3, 0.4, 0.5,
                                             0.6, 0.7, 0.8, 0.9),
                    batch_size: int = 65536) -> pd.DataFrame:
    """Exact quantile binning: (bucket, n_rows, min_v, max_v) per bucket,
    where ``bucket`` = how many of the ``qs`` quantile boundaries are
    strictly below the value — the feature-binning step a training
    pipeline runs after profiling.

    Two passes, both distributed: (1) :func:`exact_quantiles_int`'s
    histogram pass yields the boundary values (len(qs) ints on the
    driver); (2) boundaries broadcast via ``ray.put``, each block assigns
    buckets with one ``searchsorted`` and emits a <=len(qs)+1-row
    partial; the driver folds a bucket-dimension-sized frame.  Bucket
    semantics mirror the SQL twin exactly: ``searchsorted(bounds, v,
    'left')`` == COUNT(bounds < v), duplicate boundaries collapse the
    same way on both sides."""
    import ray

    from ..sources.pages import cached_get

    # two consumers (boundary pass + assign pass): materialize once so the
    # caller's upstream map and the read don't re-execute per pass
    ds = ds.materialize()
    bounds = np.sort(
        exact_quantiles_int(ds, col, qs, batch_size=batch_size)["value"]
        .to_numpy().astype(np.int64))
    ref = ray.put(bounds)

    def partial(b: pa.Table) -> pa.Table:
        v = b[col].to_numpy(zero_copy_only=False).astype(np.int64)
        bkt = np.searchsorted(cached_get(ref), v, side="left")
        df = pd.DataFrame({"bucket": bkt, "v": v})
        g = df.groupby("bucket", as_index=False).agg(
            n_rows=("v", "size"), min_v=("v", "min"), max_v=("v", "max"))
        return pa.Table.from_pandas(g, preserve_index=False)

    parts = ds.map_batches(partial, batch_format="pyarrow",
                           batch_size=batch_size).to_pandas()
    if parts.empty:  # empty input: no buckets, not a KeyError
        return pd.DataFrame({c: pd.Series([], dtype=np.int64)
                             for c in ("bucket", "n_rows", "min_v",
                                       "max_v")})
    out = parts.groupby("bucket", as_index=False).agg(
        n_rows=("n_rows", "sum"), min_v=("min_v", "min"),
        max_v=("max_v", "max"))
    for c in out.columns:
        out[c] = out[c].astype(np.int64)
    return out


def sql_bucketize_exact(col: str, source: str,
                        qs: tuple[float, ...] = (0.1, 0.2, 0.3, 0.4, 0.5,
                                                 0.6, 0.7, 0.8, 0.9)) -> str:
    """DuckDB twin of :func:`bucketize_exact` over ``source`` (a derived
    table expression providing ``col``)."""
    bounds = " UNION ALL ".join(
        f"SELECT CAST(quantile_disc({col}, {q!r}) AS BIGINT) AS b "
        f"FROM src" for q in qs)
    return f"""
WITH src AS (SELECT {col} FROM {source}),
bounds AS ({bounds}),
assigned AS (
  SELECT {col} AS v,
         (SELECT CAST(COUNT(*) AS BIGINT) FROM bounds WHERE b < {col}) AS bucket
  FROM src
)
SELECT bucket, CAST(COUNT(*) AS BIGINT) AS n_rows,
       CAST(MIN(v) AS BIGINT) AS min_v, CAST(MAX(v) AS BIGINT) AS max_v
FROM assigned GROUP BY bucket
""".strip()


def sql_exact_quantiles(col: str, table: str, qs: tuple[float, ...]) -> str:
    parts = " UNION ALL ".join(
        f"SELECT CAST({int(round(q * 1_000_000))} AS BIGINT) AS q_pm, "
        f"CAST(quantile_disc({col}, {q!r}) AS BIGINT) AS value FROM {table}"
        for q in qs
    )
    return parts


# --- mergeable rank sketch for unbounded columns ----------------------------


class KllSketch:
    """Deterministic KLL-style rank sketch: levels of capacity ``cap``;
    a full level is sorted and every second element (even indices) is
    promoted to the next level with doubled weight.  Deterministic
    compaction trades the randomized KLL's unbiasedness for run-to-run
    reproducibility; rank error stays O(levels / cap)."""

    def __init__(self, cap: int = 256):
        self.cap = cap
        self.levels: list[np.ndarray] = [np.empty(0, dtype=np.float64)]

    def add(self, values: np.ndarray) -> "KllSketch":
        self.levels[0] = np.concatenate([self.levels[0], values.astype(np.float64)])
        self._compact()
        return self

    def merge(self, other: "KllSketch") -> "KllSketch":
        for i, lv in enumerate(other.levels):
            while len(self.levels) <= i:
                self.levels.append(np.empty(0, dtype=np.float64))
            self.levels[i] = np.concatenate([self.levels[i], lv])
        self._compact()
        return self

    def _compact(self) -> None:
        i = 0
        while i < len(self.levels):
            if self.levels[i].shape[0] > self.cap:
                s = np.sort(self.levels[i], kind="mergesort")
                promoted = s[::2]
                self.levels[i] = np.empty(0, dtype=np.float64)
                if i + 1 == len(self.levels):
                    self.levels.append(np.empty(0, dtype=np.float64))
                self.levels[i + 1] = np.concatenate([self.levels[i + 1], promoted])
            i += 1

    def quantiles(self, qs: tuple[float, ...]) -> np.ndarray:
        if not self.levels or not any(lv.shape[0] for lv in self.levels):
            return np.full(len(qs), np.nan)  # empty sketch: no quantiles
        vals = np.concatenate(self.levels)
        weights = np.concatenate(
            [np.full(lv.shape[0], 1 << i, dtype=np.int64)
             for i, lv in enumerate(self.levels)]
        )
        order = np.argsort(vals, kind="mergesort")
        vals, weights = vals[order], weights[order]
        cum = np.cumsum(weights)
        total = cum[-1] if cum.shape[0] else 0
        out = np.empty(len(qs), dtype=np.float64)
        for j, q in enumerate(qs):
            target = _disc_index(int(total), q) + 1
            out[j] = vals[int(np.searchsorted(cum, target, "left"))]
        return out

    def to_rows(self) -> pa.Table:
        """Serialize to (level, value) rows — the shuffle-friendly form."""
        lvls = np.concatenate(
            [np.full(lv.shape[0], i, dtype=np.int64)
             for i, lv in enumerate(self.levels)]
        ) if self.levels else np.empty(0, dtype=np.int64)
        vals = np.concatenate(self.levels) if self.levels else np.empty(0)
        return pa.table({"level": pa.array(lvls), "value": pa.array(vals)})

    @staticmethod
    def from_rows(level: np.ndarray, value: np.ndarray, cap: int = 256) -> "KllSketch":
        sk = KllSketch(cap)
        n_levels = int(level.max()) + 1 if level.shape[0] else 1
        sk.levels = [value[level == i].astype(np.float64) for i in range(n_levels)]
        sk._compact()
        return sk


def sketch_quantiles(ds: ray.data.Dataset, col: str, qs: tuple[float, ...],
                     cap: int = 256, batch_size: int = 65536) -> pd.DataFrame:
    """(q_pm, value) approximate global quantiles via per-batch KLL partial
    sketches reduced through ONE dimension-sized collect: each batch ships
    <= cap*levels (level, value) rows, the driver merges sketches — total
    driver traffic is O(blocks * cap), independent of row count."""

    def partial(b: pa.Table) -> pa.Table:
        sk = KllSketch(cap).add(b[col].to_numpy(zero_copy_only=False))
        return sk.to_rows()

    rows = (
        ds.select_columns([col])
        .map_batches(partial, batch_format="pyarrow", batch_size=batch_size)
        .to_pandas()
    )
    sk = KllSketch.from_rows(rows["level"].to_numpy(), rows["value"].to_numpy(), cap)
    vals = sk.quantiles(qs)
    return pd.DataFrame(
        {"q_pm": np.array([int(round(q * 1_000_000)) for q in qs], dtype=np.int64),
         "value": vals}
    )


def grouped_mad4x(ds: ray.data.Dataset, key: str, col: str):
    """(key, n, med2x, mad4x) per group — exact interpolated median AND
    median absolute deviation (the robust outlier scale), kept integral by
    doubling twice: med2x = 2*median(v) (sum of the two middle order
    statistics), and since |2v - med2x| is then an integer,
    mad4x = 2*median(|2v - med2x|) = 4*MAD, exact end to end.

    Shape: two bucketed median passes over the data; between them only the
    DIMENSION-sized (key, med2x) table moves — broadcast once via ray.put
    and probed per batch with a vectorized map (never a row-level join).
    Returns a pandas DataFrame (dimension-sized)."""
    import ray

    med = grouped_median_cont2x(ds, key, col)
    mp = med.to_pandas()
    med_ref = ray.put(dict(zip(mp[key], mp["med2x"].astype(np.int64))))

    def dev(b: pa.Table) -> pa.Table:
        from ..sources.pages import cached_get

        m = cached_get(med_ref)
        k = b[key].to_pandas()
        v = b[col].to_numpy(zero_copy_only=False).astype(np.int64)
        med2 = k.map(m).to_numpy().astype(np.int64)
        return pa.table({key: pa.array(k, pa.string()),
                         "__dev": pa.array(np.abs(2 * v - med2))})

    mad = grouped_median_cont2x(
        ds.map_batches(dev, batch_format="pyarrow", batch_size=65536),
        key, "__dev").to_pandas()
    out = mp.merge(mad.rename(columns={"med2x": "mad4x"})[[key, "mad4x"]],
                   on=key)
    out["n"] = out["n"].astype(np.int64)
    return out


def sql_grouped_mad4x(key: str, col: str, table: str) -> str:
    return (
        f"WITH v AS (SELECT {key}, {col} FROM {table}), "
        f"m AS (SELECT {key}, COUNT(*) AS n, "
        f"CAST(quantile_cont({col}, 0.5) * 2 AS BIGINT) AS med2x "
        f"FROM v GROUP BY 1) "
        f"SELECT m.{key}, m.n, m.med2x, "
        f"CAST(quantile_cont(abs(2 * v.{col} - m.med2x), 0.5) * 2 AS BIGINT) AS mad4x "
        f"FROM v JOIN m USING ({key}) GROUP BY 1, 2, 3"
    )


def grouped_weighted_median(ds: ray.data.Dataset, key: str, val: str,
                            weight: str) -> ray.data.Dataset:
    """(key, tot_w, wmed) per group — the exact LOWER weighted median:
    the smallest v whose cumulative weight (values sorted ascending)
    reaches half the total, i.e. min v with 2*cum(v) >= tot.  All-integer
    compare, no interpolation, deterministic for any weight distribution.

    Shape: per-block (key, v, w-sum) combiners shrink the exchange to
    distinct (key, value) pairs; one bucketed pass per key then runs the
    vectorized sort + cumsum + first-crossing pick per group."""

    def combine(b: pa.Table) -> pa.Table:
        df = pd.DataFrame({
            key: b[key].to_pandas(),
            val: b[val].to_numpy(zero_copy_only=False).astype(np.int64),
            "w": b[weight].to_numpy(zero_copy_only=False).astype(np.int64),
        })
        g = df.groupby([key, val], as_index=False, sort=False)["w"].sum()
        g["w"] = g["w"].astype(np.int64)
        return pa.Table.from_pandas(g, preserve_index=False)

    def pick(g: pd.DataFrame) -> pd.DataFrame:
        g = g.sort_values([key, val], kind="mergesort")
        k = g[key].to_numpy()
        v = g[val].to_numpy().astype(np.int64)
        w = g["w"].to_numpy().astype(np.int64)
        starts = np.concatenate([[0], np.flatnonzero(k[1:] != k[:-1]) + 1])
        ends = np.concatenate([starts[1:], [len(g)]])
        cum = np.cumsum(w)
        base = np.repeat(np.concatenate([[0], cum[ends[:-1] - 1]]),
                         ends - starts)
        cum_in = cum - base
        tot = cum[ends - 1] - np.concatenate([[0], cum[ends[:-1] - 1]])
        tot_per_row = np.repeat(tot, ends - starts)
        crossed = 2 * cum_in >= tot_per_row
        # first crossing per group: crossed is monotone within a group
        first = np.zeros(len(g), dtype=bool)
        first[starts] = crossed[starts]
        first[1:] |= crossed[1:] & ~crossed[:-1] & (k[1:] == k[:-1])
        return pd.DataFrame({key: k[first],
                             "tot_w": tot_per_row[first].astype(np.int64),
                             "wmed": v[first].astype(np.int64)})

    from .grouping import bucketed_group_apply

    pre = ds.map_batches(combine, batch_format="pyarrow", batch_size=65536)
    return bucketed_group_apply(pre, [key], pick)


def sql_grouped_weighted_median(key: str, val: str, weight: str,
                                table: str) -> str:
    return (
        f"WITH c AS (SELECT {key} AS k, {val} AS v, CAST(SUM({weight}) AS BIGINT) AS wv "
        f"FROM {table} GROUP BY 1, 2), "
        f"s AS (SELECT k, v, SUM(wv) OVER (PARTITION BY k ORDER BY v) AS cum, "
        f"SUM(wv) OVER (PARTITION BY k) AS tot FROM c) "
        f"SELECT k AS {key}, CAST(ANY_VALUE(tot) AS BIGINT) AS tot_w, "
        f"CAST(MIN(v) AS BIGINT) AS wmed "
        f"FROM s WHERE 2 * cum >= tot GROUP BY 1"
    )
