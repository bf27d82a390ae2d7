"""Mergeable sketches for crawl-scale profiling: exact two-phase heavy
hitters and HyperLogLog distinct counting.

Heavy hitters (frequency > n * phi) is EXACT despite sketching, via the
local-threshold union bound: an item above the global threshold must be
above the same threshold in at least one block (if count_b <= n_b*phi in
every block, summing gives count <= n*phi).  So phase 1 filters each
block's value_counts at the block-local threshold (never more than 1/phi
survivors per block), phase 2 recounts the candidate union exactly with a
broadcast membership filter + combiner groupby and applies the global
threshold.  Two streaming passes, no full-cardinality shuffle — the
standard exact-HH shape at scale.  All comparisons are integer
(``count * inv_phi > n``), so the DuckDB oracle matches bit-for-bit.

HyperLogLog: one pass, 2^p registers; per block a (register, rho) partial
max (dimension-sized shuffle), global elementwise max, standard bias/
linear-counting corrected estimate.  rho comes from the hash's top 32 bits
through exact uint32->float64 frexp (capped at 33 — a register would need
> 2^32 distinct inputs to saturate the cap, far past 100 TB row counts).
Deterministic splitmix64 hash -> identical estimate at any parallelism.
"""

from __future__ import annotations

import numpy as np
import pandas as pd
import pyarrow as pa
import ray
import ray.data


def _splitmix64(x: np.ndarray) -> np.ndarray:
    with np.errstate(over="ignore"):
        z = x.astype(np.uint64) + np.uint64(0x9E3779B97F4A7C15)
        z = (z ^ (z >> np.uint64(30))) * np.uint64(0xBF58476D1CE4E5B9)
        z = (z ^ (z >> np.uint64(27))) * np.uint64(0x94D049BB133111EB)
        return z ^ (z >> np.uint64(31))


# --- exact two-phase heavy hitters ------------------------------------------


def heavy_hitters(
    ds: ray.data.Dataset,
    col: str,
    inv_phi: int,
    count_alias: str = "n_items",
    batch_size: int | None = 65536,
) -> ray.data.Dataset:
    """-> (col, count_alias) for every value with ``count * inv_phi > n``
    (strict), n = total rows.  EXACT output (see module docstring)."""
    from ..pipelines.relational import combined_groupby_sum

    import pyarrow.compute as pc

    def local_candidates(b: pa.Table) -> pa.Table:
        """Block-local survivors PLUS one sentinel row carrying the block's
        row count — total n rides along with the candidate pass instead of
        costing a separate full pass (3 scans -> 2).  Pure Arrow kernels."""
        vc = pc.value_counts(b[col].combine_chunks())
        keep = vc.field("values").filter(
            pc.greater(pc.multiply(vc.field("counts"), inv_phi), b.num_rows)
        )
        vals = pa.concat_arrays([keep, pa.nulls(1, b[col].type)])
        rows = np.zeros(len(keep) + 1, dtype=np.int64)
        rows[-1] = b.num_rows
        return pa.table({col: vals, "__block_rows": pa.array(rows)})

    cand_tbl = pa.concat_tables(
        ray.get(
            ds.map_batches(local_candidates, batch_format="pyarrow",
                           batch_size=batch_size).to_arrow_refs()
        )
    )
    n_total = int(pc.sum(cand_tbl["__block_rows"]).as_py() or 0)
    # candidate union is <= blocks / phi values — bounded, broadcastable
    cand_arr = pc.unique(cand_tbl[col].drop_null().combine_chunks())
    if len(cand_arr) == 0:
        s = ds.schema()
        typ = dict(zip(s.names, s.types))[col]
        return ray.data.from_arrow(
            pa.table({col: pa.array([], typ),
                      count_alias: pa.array([], pa.int64())})
        )
    cand_ref = ray.put(cand_arr)

    def member(b: pa.Table) -> pa.Table:
        from ..sources.pages import cached_get

        vals = cached_get(cand_ref)
        c = b[col].combine_chunks()
        return b.select([col]).filter(pc.is_in(c, value_set=vals))

    counted = combined_groupby_sum(
        ds.map_batches(member, batch_format="pyarrow", batch_size=batch_size),
        [col], [], count_alias=count_alias,
    )

    def threshold(b: pa.Table) -> pa.Table:
        n = b[count_alias].to_numpy(zero_copy_only=False)
        return b.filter(pa.array(n * inv_phi > n_total))

    return counted.map_batches(threshold, batch_format="pyarrow")


def heavy_hitters_weighted(
    ds: ray.data.Dataset,
    col: str,
    weight: str,
    inv_phi: int,
    count_alias: str = "n_items",
    batch_size: int | None = 65536,
) -> ray.data.Dataset:
    """Exact heavy hitters over PRE-AGGREGATED (col, weight) partials:
    every value whose total weight w satisfies ``w * inv_phi > W`` (W = total
    weight).  The union bound holds for ANY partition of the weighted
    multiset — if w_b * inv_phi <= W_b in every batch, summing gives
    w * inv_phi <= W — so expensive upstream extraction (tokenize, decode)
    runs ONCE: its per-block counts feed both the candidate pass and the
    recount, and the recount shuffle moves counts, not raw items.

    ``ds`` is materialized (it is consumed twice); callers whose partials
    are cheap to recompute can pass a lazy ds at the cost of recompute."""
    import pyarrow.compute as pc

    from ..pipelines.relational import combined_groupby_sum

    parts = ds.materialize()

    def local_candidates(b: pa.Table) -> pa.Table:
        w = b[weight].to_numpy(zero_copy_only=False).astype(np.int64)
        df = pd.DataFrame({col: b[col].to_pandas(), "w": w})
        g = df.groupby(col, as_index=False, sort=False)["w"].sum()
        tot = int(w.sum())
        keep = g[g["w"].to_numpy() * inv_phi > tot]
        vals = pa.concat_arrays(
            [pa.array(keep[col], b[col].type), pa.nulls(1, b[col].type)]
        )
        rows = np.zeros(len(keep) + 1, dtype=np.int64)
        rows[-1] = tot
        return pa.table({col: vals, "__block_w": pa.array(rows)})

    cand_tbl = pa.concat_tables(
        ray.get(
            parts.map_batches(local_candidates, batch_format="pyarrow",
                              batch_size=batch_size).to_arrow_refs()
        )
    )
    w_total = int(pc.sum(cand_tbl["__block_w"]).as_py() or 0)
    cand_arr = pc.unique(cand_tbl[col].drop_null().combine_chunks())
    if len(cand_arr) == 0:
        s = parts.schema()
        typ = dict(zip(s.names, s.types))[col]
        return ray.data.from_arrow(
            pa.table({col: pa.array([], typ),
                      count_alias: pa.array([], pa.int64())})
        )
    cand_ref = ray.put(cand_arr)

    def member(b: pa.Table) -> pa.Table:
        from ..sources.pages import cached_get

        vals = cached_get(cand_ref)
        t = b.select([col, weight]).filter(
            pc.is_in(b[col].combine_chunks(), value_set=vals)
        )
        return pa.table({col: t[col], count_alias: t[weight]})

    counted = combined_groupby_sum(
        parts.map_batches(member, batch_format="pyarrow", batch_size=batch_size),
        [col], [count_alias],
    )

    def threshold(b: pa.Table) -> pa.Table:
        n = b[count_alias].to_numpy(zero_copy_only=False)
        return b.filter(pa.array(n * inv_phi > w_total))

    return counted.map_batches(threshold, batch_format="pyarrow")


# --- HyperLogLog -------------------------------------------------------------

HLL_P = 12  # 4096 registers, ~1.6% standard error
_HLL_M = 1 << HLL_P


def _hll_partial(values: np.ndarray) -> pa.Table:
    """(register, rho) partial maxima for one block's int64 values."""
    h = _splitmix64(values.astype(np.int64).view(np.uint64))
    reg = (h & np.uint64(_HLL_M - 1)).astype(np.int64)
    top = (h >> np.uint64(32)).astype(np.uint32)
    # exact leading-zero count of the top 32 bits: uint32 -> float64 is
    # exact, frexp's exponent is exact -> clz = 32 - exponent; zero -> 33
    f = top.astype(np.float64)
    _, exp = np.frexp(f)
    rho = np.where(top == 0, 33, 33 - exp).astype(np.int64)
    df = pd.DataFrame({"register": reg, "rho": rho})
    part = df.groupby("register", as_index=False, sort=False)["rho"].max()
    return pa.Table.from_pandas(part, preserve_index=False)


def hll_registers(ds: ray.data.Dataset, col: str,
                  batch_size: int | None = 65536) -> ray.data.Dataset:
    """-> (register, rho): global register maxima (<= 2^p rows)."""
    from ray.data.aggregate import Max

    partials = ds.map_batches(
        lambda b: _hll_partial(b[col].to_numpy(zero_copy_only=False)),
        batch_format="pyarrow", batch_size=batch_size,
    )
    return partials.groupby("register").aggregate(Max("rho", alias_name="rho"))


def hll_estimate_from_registers(reg_df: pd.DataFrame) -> int:
    """Standard HLL estimate (Flajolet et al. 2007) with the small-range
    linear-counting correction; registers absent from reg_df are zero."""
    m = _HLL_M
    rho = np.zeros(m, dtype=np.int64)
    rho[reg_df["register"].to_numpy()] = reg_df["rho"].to_numpy()
    alpha = 0.7213 / (1.0 + 1.079 / m)
    est = alpha * m * m / np.sum(np.exp2(-rho.astype(np.float64)))
    zeros = int((rho == 0).sum())
    if est <= 2.5 * m and zeros:
        est = m * np.log(m / zeros)
    return int(round(est))


def hll_distinct(ds: ray.data.Dataset, col: str) -> pa.Table:
    """One-row table {approx_distinct: int64} — the driver-facing form."""
    regs = hll_registers(ds, col).to_pandas()
    return pa.table({"approx_distinct": pa.array([hll_estimate_from_registers(regs)],
                                                 pa.int64())})


def hll_grouped(ds: ray.data.Dataset, group_col: str, col: str,
                batch_size: int | None = 65536) -> pa.Table:
    """Per-group approximate distinct: (group, approx_distinct).  Same
    mergeable register maxima as :func:`hll_registers`, keyed by
    (group, register) — the per-group sketch is 2^p ints regardless of
    group size, the wide step is groups x registers rows, and the final
    estimate runs over the dimension-sized register table."""

    def partial(b: pa.Table) -> pa.Table:
        df = pd.DataFrame({
            "g": b[group_col].to_pylist(),
            "v": b[col].to_numpy(zero_copy_only=False),
        })
        if not len(df):
            # empty upstream block: pd.concat([]) raises, so emit a typed
            # empty partial instead of killing the map task (r3 review)
            return pa.table({"register": pa.array([], pa.int64()),
                             "rho": pa.array([], pa.int64()),
                             group_col: pa.array([], pa.string())})
        outs = []
        for g, sub in df.groupby("g", sort=False):
            part = _hll_partial(sub["v"].to_numpy()).to_pandas()
            part[group_col] = g
            outs.append(part)
        return pa.Table.from_pandas(pd.concat(outs, ignore_index=True),
                                    preserve_index=False)

    from ..stages.grouping import bucketed_group_apply

    def merge(g: pd.DataFrame) -> pd.DataFrame:
        return g.groupby([group_col, "register"], as_index=False)["rho"].max()

    regs = bucketed_group_apply(
        ds.map_batches(partial, batch_format="pyarrow", batch_size=batch_size),
        [group_col], merge).to_pandas()
    rows = [(g, hll_estimate_from_registers(sub))
            for g, sub in regs.groupby(group_col, sort=True)]
    return pa.table({group_col: pa.array([r[0] for r in rows], pa.string()),
                     "approx_distinct": pa.array([r[1] for r in rows],
                                                 pa.int64())})


# --- count-min sketch ---------------------------------------------------------

CMS_DEPTH = 4      # independent hash rows
CMS_WIDTH = 2048   # counters per row: eps ~ e/width, delta ~ e^-depth


def _cms_hash(h64: np.ndarray, row: int, width: int) -> np.ndarray:
    """Row-seeded counter index per value hash (splitmix of h64 xor seed)."""
    seed = np.uint64((0x9E3779B97F4A7C15 * (row + 1)) % (1 << 64))
    seeded = _splitmix64(h64 ^ seed)
    return (seeded % np.uint64(width)).astype(np.int64)


def cms_sketch(ds: ray.data.Dataset, col: str, depth: int = CMS_DEPTH,
               width: int = CMS_WIDTH) -> np.ndarray:
    """(depth, width) count-min sketch of an int64 column — counters are
    ADDITIVE, so per-block partial sketches merge by elementwise sum: one
    map_batches pass emits (row, idx, cnt) partials and a bounded
    ``groupby`` sums them (the sketch is depth*width rows, never data-
    sized).  Point estimate = min over rows; always an OVERcount."""
    from ray.data.aggregate import Sum

    def partial(b: pa.Table) -> pa.Table:
        v = b[col].to_numpy(zero_copy_only=False).astype(np.int64)
        h = _splitmix64(v.view(np.uint64))
        rows_, idxs_, cnts_ = [], [], []
        for r in range(depth):
            idx = _cms_hash(h, r, width)
            u, c = np.unique(idx, return_counts=True)
            rows_.append(np.full(u.shape[0], r, dtype=np.int64))
            idxs_.append(u)
            cnts_.append(c.astype(np.int64))
        return pa.table({"row": pa.array(np.concatenate(rows_)),
                         "idx": pa.array(np.concatenate(idxs_)),
                         "cnt": pa.array(np.concatenate(cnts_))})

    cells = (
        ds.map_batches(partial, batch_format="pyarrow", batch_size=65536)
        .groupby(["row", "idx"])
        .aggregate(Sum("cnt", alias_name="cnt"))
        .to_pandas()
    )
    sk = np.zeros((depth, width), dtype=np.int64)
    sk[cells["row"].to_numpy(), cells["idx"].to_numpy()] = cells["cnt"].to_numpy()
    return sk


def cms_estimate(sk: np.ndarray, values: np.ndarray) -> np.ndarray:
    """Point-estimated counts for int64 ``values`` (min over depth rows)."""
    depth, width = sk.shape
    h = _splitmix64(values.astype(np.int64).view(np.uint64))
    est = np.full(values.shape[0], np.iinfo(np.int64).max)
    for r in range(depth):
        est = np.minimum(est, sk[r, _cms_hash(h, r, width)])
    return est


# --- exact DuckDB twins (core.sqlmirror HUGEINT mod-2^64 arithmetic) ---------


def _sql_hll_regs(src_rows: str, group_sel: str = "") -> str:
    """register/rho CTE fragment: splitmix64 of the value, register = low
    HLL_P bits, rho = 33 - frexp-exponent of the top 32 bits (exactly
    ``33 - length(bin(top))`` for top > 0, 33 for top == 0)."""
    from ..core import sqlmirror as SM

    g = f"{group_sel}, " if group_sel else ""
    return f"""
hh AS (
  SELECT {g}{SM.splitmix64('v')} AS h FROM ({src_rows})
), regs AS (
  SELECT {g}CAST(h % {_HLL_M} AS BIGINT) AS register,
         MAX(CASE WHEN h // 4294967296 = 0 THEN 33
                  ELSE 33 - length(bin(CAST(h // 4294967296 AS BIGINT)))
             END) AS rho
  FROM hh GROUP BY {"ALL" if group_sel else "register"}
)""".strip()


_SQL_HLL_EST = f"""(CASE
  WHEN ((0.7213 / (1.0 + 1.079 / {_HLL_M})) * {_HLL_M} * {_HLL_M} / s)
         <= 2.5 * {_HLL_M} AND nz < {_HLL_M}
  THEN {_HLL_M} * ln(CAST({_HLL_M} AS DOUBLE) / ({_HLL_M} - nz))
  ELSE ((0.7213 / (1.0 + 1.079 / {_HLL_M})) * {_HLL_M} * {_HLL_M} / s)
END)"""


def sql_hll_distinct(src_rows: str = "SELECT doc_id AS v FROM pages") -> str:
    """Exact twin of ``hll_distinct``: the register harmonic sum is a sum
    of dyadic rationals (k / 2^33, total < 2^13), exactly representable in
    float64 at EVERY partial sum — so numpy's pairwise np.sum and DuckDB's
    sequential SUM produce the identical double regardless of order, and
    the estimate matches bit-for-bit.  The linear-counting branch's ln()
    is libm on both sides (verified equal on the fixed driver corpora)."""
    return f"""
, {_sql_hll_regs(src_rows)}, agg AS (
  SELECT ({_HLL_M} - COUNT(*)) * 1.0
         + SUM(1.0 / CAST(CAST(1 AS BIGINT) << rho AS DOUBLE)) AS s,
         COUNT(CASE WHEN rho > 0 THEN 1 END) AS nz
  FROM regs
)
SELECT CAST(ROUND({_SQL_HLL_EST}) AS BIGINT) AS approx_distinct FROM agg
""".strip()


def sql_hll_grouped(group_col: str,
                    src_rows: str) -> str:
    """Exact twin of ``hll_grouped``: per-group register maxima + the same
    dyadic-exact estimate (see sql_hll_distinct)."""
    return f"""
, {_sql_hll_regs(src_rows, group_sel=group_col)}, agg AS (
  SELECT {group_col},
         ({_HLL_M} - COUNT(*)) * 1.0
         + SUM(1.0 / CAST(CAST(1 AS BIGINT) << rho AS DOUBLE)) AS s,
         COUNT(CASE WHEN rho > 0 THEN 1 END) AS nz
  FROM regs GROUP BY {group_col}
)
SELECT {group_col}, CAST(ROUND({_SQL_HLL_EST}) AS BIGINT) AS approx_distinct
FROM agg
""".strip()


def sql_cms_user_counts(events: str = "events") -> str:
    """Exact twin of q_cms_user_counts: CMS counters are plain exact
    GROUP-BY counts once the (row, idx) hash is mirrored — splitmix64 of
    the value, xor a row seed, splitmix64 again, mod width."""
    from ..core import sqlmirror as SM

    seeds = ", ".join(
        f"({r}, CAST({(0x9E3779B97F4A7C15 * (r + 1)) % (1 << 64)} AS HUGEINT))"
        for r in range(CMS_DEPTH))

    def idx(h: str, seed: str) -> str:
        return (f"CAST(({SM.splitmix64(SM.xor64(h, seed))}) % {CMS_WIDTH} "
                f"AS BIGINT)")

    return f"""
, hv AS (
  SELECT user_id, {SM.splitmix64('user_id')} AS h FROM {events}
), sd(r, seed) AS (FROM (VALUES {seeds})), cells AS (
  SELECT r, {idx('h', 'seed')} AS idx, COUNT(*) AS cnt
  FROM hv CROSS JOIN sd GROUP BY 1, 2
), probe AS (
  SELECT DISTINCT user_id, h FROM hv WHERE user_id % 10 = 0
), est AS (
  SELECT p.user_id, MIN(c.cnt) AS e
  FROM probe p CROSS JOIN sd
  JOIN cells c ON c.r = sd.r AND c.idx = {idx('p.h', 'sd.seed')}
  GROUP BY p.user_id
)
SELECT CAST(user_id AS BIGINT) AS user_id, CAST(e AS BIGINT) AS est_events
FROM est
""".strip()
