"""Additional TPC-H-style relational analogs (round-2 breadth extension).

The reference has no relational surface (its "tables" are tiny parameter
dicts, ``/root/reference/orthority/param_io.py:56-64``); these queries are
graft breadth over the driver's TPC-H-ish tables, exercising the engine's
join/aggregate/top-k primitives in the canonical TPC-H shapes:

- Q3  shipping priority   : semi join + large-large join + grouped sum + top-k
- Q5  local volume        : 3 chained large joins + dims broadcast + co-nation filter
- Q8  market share        : broadcast part/supplier dims + join + semi join +
                            exact integer (numerator, denominator) share
- Q6  revenue forecast    : pruned-scan filter + global sum (no shuffle at all)
- Q7  nation volume       : two chained large-large hash joins + 3-key rollup
- Q10 returned customers  : filtered join + per-customer rollup + dim join + top-k
- Q14 promo revenue       : broadcast dim attribute + conditional global sum
- Q15 top supplier        : grouped sum + global max + equality filter
- Q17 small-quantity rev  : self-join against a per-key aggregate (avg filter)
- Q19 brand volume        : broadcast dim attribute + disjunctive predicate
- Q22 sales opportunity   : global scalar aggregate + anti join + rollup

Exactness follows the repo contract (see relational.py): every monetary
value is rounded to integer cents PER ROW with ``floor(x*100+0.5)`` on both
sides and summed as int64; fractional comparisons (Q17's ``qty < 0.2*avg``,
Q22's ``bal > avg``) are cross-multiplied into integer comparisons so no
float division exists on either side.
"""

from __future__ import annotations

import numpy as np
import pandas as pd
import pyarrow as pa
import pyarrow.compute as pc
import ray
import ray.data

from ..core.config import table_path

# dense_int_dim / global_topk live in relational.py (shared with its own
# queries); re-exported here because the analogs and tests import them from
# this module
from .relational import (_read, bucketed_sum, cents, combined_groupby_sum,
                         dense_int_dim, dense_str_decode, global_topk,
                         region_nations)


def _us(date: str) -> int:
    """Date string -> epoch microseconds (matches DuckDB epoch_us(ts))."""
    return int(np.datetime64(date, "us").astype(np.int64))




def year_of_us(us: np.ndarray) -> np.ndarray:
    """Calendar year of epoch-microsecond timestamps (int64 in, int64
    out) — the one shared implementation (was copy-pasted five times
    across the TPC-H modules; r3 review)."""
    return (us.astype("datetime64[us]").astype("datetime64[Y]")
            .astype(np.int64) + 1970)


def _driver_sum(ds: ray.data.Dataset, cols: list[str]) -> dict[str, int]:
    """Sum int64 columns of a per-block-partial Dataset on the driver.  The
    input is one row per block (dimension-sized regardless of data volume),
    so the driver materialization is bounded by block count, not row count."""
    parts = ds.to_pandas()
    return {c: int(parts[c].sum()) for c in cols}


# --- Q6: revenue forecast (pure filter + global sum, zero shuffle) -----------

Q6_LO, Q6_HI = "1996-01-01", "1997-01-01"


def q_revenue_forecast(sf_dir: str) -> pd.DataFrame:
    """TPC-H Q6 analog: revenue from discounted small-quantity lineitems in
    one shipdate year.  Shape at scale: pruned 4-column read -> stateless
    per-batch filter + cents sum -> one row per block -> driver add.  The
    discount band compares integer cent codes, not floats."""
    li = _read(sf_dir, "lineitem",
               ["l_shipdate", "l_discount", "l_quantity", "l_extendedprice"])
    lo, hi = _us(Q6_LO), _us(Q6_HI)

    def partial(b: pa.Table) -> pa.Table:
        ship = b["l_shipdate"].cast(pa.int64()).to_numpy(zero_copy_only=False)
        disc = b["l_discount"].to_numpy(zero_copy_only=False)
        qty = b["l_quantity"].to_numpy(zero_copy_only=False)
        price = b["l_extendedprice"].to_numpy(zero_copy_only=False)
        disc_code = cents(disc)  # 0.03 -> 3
        m = ((ship >= lo) & (ship < hi) & (disc_code >= 2) & (disc_code <= 4)
             & (np.floor(qty) < 24))
        rev = cents(price[m] * disc[m])
        return pa.table({"n_rows": pa.array([int(m.sum())], pa.int64()),
                         "rev_cents": pa.array([int(rev.sum())], pa.int64())})

    sums = _driver_sum(li.map_batches(partial, batch_format="pyarrow",
                                      batch_size=65536),
                       ["n_rows", "rev_cents"])
    return pd.DataFrame({"n_rows": [sums["n_rows"]],
                         "rev_cents": [sums["rev_cents"]]})


SQL_REVENUE_FORECAST = f"""
SELECT COUNT(*) AS n_rows,
       CAST(COALESCE(SUM(CAST(floor(l_extendedprice * l_discount * 100.0 + 0.5) AS BIGINT)), 0) AS BIGINT) AS rev_cents
FROM lineitem
WHERE epoch_us(l_shipdate) >= {_us(Q6_LO)} AND epoch_us(l_shipdate) < {_us(Q6_HI)}
  AND CAST(floor(l_discount * 100.0 + 0.5) AS BIGINT) BETWEEN 2 AND 4
  AND floor(l_quantity) < 24
""".strip()


# --- Q3: shipping priority ---------------------------------------------------

Q3_DATE = "1998-07-01"
Q3_SEGMENT = "BUILDING"
Q3_K = 10


def q_shipping_priority(sf_dir: str) -> ray.data.Dataset:
    """TPC-H Q3 analog: top-10 not-yet-shipped orders of one market segment
    by outstanding revenue.  Shape: filtered customer keys -> bucketed SEMI
    join against date-filtered orders -> bucketed inner join with
    date-filtered lineitem -> per-block orderkey combiner -> bucketed
    grouped sum (carrying the functionally-dependent orderdate) -> sort-free
    global top-k."""
    from ..stages.grouping import bucketed_group_apply
    from ..stages.hashjoin import hash_join

    cutoff = _us(Q3_DATE)

    cust = _read(sf_dir, "customer", ["c_custkey", "c_mktsegment"])

    def building(b: pa.Table) -> pa.Table:
        keep = pc.equal(b["c_mktsegment"], Q3_SEGMENT)
        return pa.table({"o_custkey": b["c_custkey"].filter(keep)})

    seg_keys = cust.map_batches(building, batch_format="pyarrow")

    orders = _read(sf_dir, "orders", ["o_orderkey", "o_custkey", "o_orderdate"])

    def ord_prep(b: pa.Table) -> pa.Table:
        odate = b["o_orderdate"].cast(pa.int64())
        keep = pc.less(odate, cutoff)
        t = b.filter(keep)
        return pa.table({"o_custkey": t["o_custkey"],
                         "o_orderkey": t["o_orderkey"],
                         "odate_us": odate.filter(keep)})

    open_orders = hash_join(
        orders.map_batches(ord_prep, batch_format="pyarrow"),
        seg_keys, "o_custkey",
        ["o_custkey", "o_orderkey", "odate_us"], ["o_custkey"], how="semi",
    )

    li = _read(sf_dir, "lineitem", ["l_orderkey", "l_shipdate",
                                    "l_extendedprice", "l_discount"])

    def li_prep(b: pa.Table) -> pa.Table:
        keep = pc.greater(b["l_shipdate"].cast(pa.int64()), cutoff)
        t = b.filter(keep)
        price = t["l_extendedprice"].to_numpy(zero_copy_only=False)
        disc = t["l_discount"].to_numpy(zero_copy_only=False)
        return pa.table({"o_orderkey": t["l_orderkey"],
                         "rev_cents": pa.array(cents(price * (1.0 - disc)))})

    joined = hash_join(
        open_orders.select_columns(["o_orderkey", "odate_us"]),
        li.map_batches(li_prep, batch_format="pyarrow"),
        "o_orderkey",
        ["o_orderkey", "odate_us"], ["o_orderkey", "rev_cents"],
        # left is the semi join's shuffle output: explicit types skip the
        # schema() probe that would execute it twice
        types={"odate_us": pa.int64(), "rev_cents": pa.int64()},
    )

    def partial(b: pa.Table) -> pa.Table:
        key = b["o_orderkey"].to_numpy(zero_copy_only=False)
        odate = b["odate_us"].to_numpy(zero_copy_only=False)
        rev = b["rev_cents"].to_numpy(zero_copy_only=False)
        u, first, inv = np.unique(key, return_index=True, return_inverse=True)
        sums = np.zeros(u.shape[0], dtype=np.int64)
        np.add.at(sums, inv, rev)
        return pa.table({"o_orderkey": pa.array(u),
                         "odate_us": pa.array(odate[first]),
                         "rev_cents": pa.array(sums)})

    def agg(g: pd.DataFrame) -> pd.DataFrame:
        return g.groupby("o_orderkey", as_index=False).agg(
            odate_us=("odate_us", "first"), rev_cents=("rev_cents", "sum"))

    per_order = bucketed_group_apply(
        joined.map_batches(partial, batch_format="pyarrow", batch_size=65536),
        ["o_orderkey"], agg)
    return global_topk(per_order, ["rev_cents", "o_orderkey"],
                       [False, True], Q3_K)


SQL_SHIPPING_PRIORITY = f"""
SELECT l.l_orderkey AS o_orderkey,
       CAST(ANY_VALUE(epoch_us(o.o_orderdate)) AS BIGINT) AS odate_us,
       CAST(SUM(CAST(floor(l.l_extendedprice * (1.0 - l.l_discount) * 100.0 + 0.5) AS BIGINT)) AS BIGINT) AS rev_cents,
       CAST(row_number() OVER (
         ORDER BY SUM(CAST(floor(l.l_extendedprice * (1.0 - l.l_discount) * 100.0 + 0.5) AS BIGINT)) DESC,
                  l.l_orderkey ASC) AS BIGINT) AS rank
FROM customer c
JOIN orders o ON c.c_custkey = o.o_custkey
JOIN lineitem l ON l.l_orderkey = o.o_orderkey
WHERE c.c_mktsegment = '{Q3_SEGMENT}'
  AND epoch_us(o.o_orderdate) < {_us(Q3_DATE)}
  AND epoch_us(l.l_shipdate) > {_us(Q3_DATE)}
GROUP BY l.l_orderkey
ORDER BY 3 DESC, 1 ASC LIMIT {Q3_K}
""".strip()


# --- Q10: returned-item customers -------------------------------------------

Q10_LO, Q10_HI = "1998-01-01", "1998-07-01"
Q10_K = 20


def q_returned_customers(sf_dir: str) -> ray.data.Dataset:
    """TPC-H Q10 analog: top-20 customers by revenue lost to returned items
    in a half-year order window.  Shape: two pruned filtered scans -> bucketed
    inner join on orderkey -> per-block custkey combiner -> bucketed grouped
    sum -> bucketed join with customer (nationkey) -> broadcast nation-name
    decode -> sort-free global top-k."""
    from ..stages.hashjoin import hash_join

    lo, hi = _us(Q10_LO), _us(Q10_HI)

    orders = _read(sf_dir, "orders", ["o_orderkey", "o_custkey", "o_orderdate"])

    def ord_prep(b: pa.Table) -> pa.Table:
        od = b["o_orderdate"].cast(pa.int64())
        t = b.filter(pc.and_(pc.greater_equal(od, lo), pc.less(od, hi)))
        return pa.table({"o_orderkey": t["o_orderkey"],
                         "o_custkey": t["o_custkey"]})

    li = _read(sf_dir, "lineitem", ["l_orderkey", "l_returnflag",
                                    "l_extendedprice", "l_discount"])

    def li_prep(b: pa.Table) -> pa.Table:
        t = b.filter(pc.equal(b["l_returnflag"], "R"))
        price = t["l_extendedprice"].to_numpy(zero_copy_only=False)
        disc = t["l_discount"].to_numpy(zero_copy_only=False)
        return pa.table({"o_orderkey": t["l_orderkey"],
                         "rev_cents": pa.array(cents(price * (1.0 - disc)))})

    joined = hash_join(
        orders.map_batches(ord_prep, batch_format="pyarrow"),
        li.map_batches(li_prep, batch_format="pyarrow"),
        "o_orderkey",
        ["o_orderkey", "o_custkey"], ["o_orderkey", "rev_cents"],
    )

    def partial(b: pa.Table) -> pa.Table:
        key = b["o_custkey"].to_numpy(zero_copy_only=False)
        rev = b["rev_cents"].to_numpy(zero_copy_only=False)
        u, inv = np.unique(key, return_inverse=True)
        sums = np.zeros(u.shape[0], dtype=np.int64)
        np.add.at(sums, inv, rev)
        return pa.table({"c_custkey": pa.array(u), "rev_cents": pa.array(sums)})

    per_cust = bucketed_sum(
        joined.map_batches(partial, batch_format="pyarrow", batch_size=65536),
        "c_custkey", "rev_cents")

    cust = _read(sf_dir, "customer", ["c_custkey", "c_nationkey"])
    with_nation = hash_join(per_cust, cust, "c_custkey",
                            ["c_custkey", "rev_cents"],
                            ["c_custkey", "c_nationkey"],
                            types={"rev_cents": pa.int64()})

    names = dense_str_decode(sf_dir, "nation", "n_nationkey", "n_name")

    def decode(b: pa.Table) -> pa.Table:
        nk = b["c_nationkey"].to_numpy(zero_copy_only=False)
        safe = np.where((nk >= 0) & (nk < names.shape[0]), nk,
                        names.shape[0] - 1)
        nm = names[safe]
        # inner-join semantics: drop customers whose nationkey misses the dim
        keep = nm != None  # noqa: E711 (elementwise on object array)
        t = b.filter(pa.array(keep))
        return pa.table({"c_custkey": t["c_custkey"],
                         "n_name": pa.array(nm[keep], pa.string()),
                         "rev_cents": t["rev_cents"]})

    return global_topk(with_nation.map_batches(decode, batch_format="pyarrow"),
                       ["rev_cents", "c_custkey"], [False, True], Q10_K)


SQL_RETURNED_CUSTOMERS = f"""
SELECT c.c_custkey,
       CAST(ANY_VALUE(n.n_name) AS VARCHAR) AS n_name,
       CAST(SUM(CAST(floor(l.l_extendedprice * (1.0 - l.l_discount) * 100.0 + 0.5) AS BIGINT)) AS BIGINT) AS rev_cents,
       CAST(row_number() OVER (
         ORDER BY SUM(CAST(floor(l.l_extendedprice * (1.0 - l.l_discount) * 100.0 + 0.5) AS BIGINT)) DESC,
                  c.c_custkey ASC) AS BIGINT) AS rank
FROM customer c
JOIN orders o ON c.c_custkey = o.o_custkey
JOIN lineitem l ON l.l_orderkey = o.o_orderkey
JOIN nation n ON c.c_nationkey = n.n_nationkey
WHERE l.l_returnflag = 'R'
  AND epoch_us(o.o_orderdate) >= {_us(Q10_LO)}
  AND epoch_us(o.o_orderdate) < {_us(Q10_HI)}
GROUP BY c.c_custkey
ORDER BY 3 DESC, 1 ASC LIMIT {Q10_K}
""".strip()


# --- Q14: promo revenue ------------------------------------------------------

Q14_LO, Q14_HI = "1997-09-01", "1997-12-01"


def _brand_codes(sf_dir: str, col: str) -> tuple[np.ndarray, list[str], int]:
    """Dense partkey -> attribute-code array for broadcast (part is the
    small dim side here; the codes array ships once via ray.put).  Returns
    (codes, vals, miss): the miss sentinel is ``len(vals)`` — one PAST the
    real value codes, so a genuine attribute value spelled "NONE" can never
    collide with it (r3 review: the old appended-"NONE" sentinel silently
    dropped real-'NONE' parts from Q14's numerator/denominator)."""
    import pyarrow.parquet as pq

    part = pq.read_table(table_path(sf_dir, "part"), columns=["p_partkey", col])
    pl = part[col].to_pylist()
    vals = sorted(set(pl))
    miss = len(vals)
    code_of = {v: i for i, v in enumerate(vals)}
    keys = part["p_partkey"].to_numpy()
    codes = np.full((int(keys.max()) + 2) if len(keys) else 2, miss,
                    dtype=np.int64)
    codes[keys] = [code_of[v] for v in pl]
    return codes, vals, miss


def q_promo_revenue(sf_dir: str) -> pd.DataFrame:
    """TPC-H Q14 analog: promo-part revenue share in one quarter, returned
    as exact integer numerator/denominator (no float division anywhere).
    Shape: broadcast partkey->type codes -> stateless filtered map ->
    per-block partial -> driver add."""
    from ..core.config import cached_stage

    codes, vals, none_code = _brand_codes(sf_dir, "p_type")
    # a type absent at this scale factor matches nothing (-1 never appears
    # in codes) instead of crashing query build with ValueError (r3 review)
    promo_code = vals.index("PROMO") if "PROMO" in vals else -1
    ref = ray.put(codes)
    lo, hi = _us(Q14_LO), _us(Q14_HI)

    class Partial:
        def __init__(self):
            self.codes = ray.get(ref)

        def __call__(self, b: pa.Table) -> pa.Table:
            ship = b["l_shipdate"].cast(pa.int64()).to_numpy(zero_copy_only=False)
            m = (ship >= lo) & (ship < hi)
            pk = b["l_partkey"].to_numpy(zero_copy_only=False)[m]
            price = b["l_extendedprice"].to_numpy(zero_copy_only=False)[m]
            disc = b["l_discount"].to_numpy(zero_copy_only=False)[m]
            rev = cents(price * (1.0 - disc))
            safe = np.where((pk >= 0) & (pk < self.codes.shape[0]), pk,
                            self.codes.shape[0] - 1)
            code = self.codes[safe]
            # inner-join semantics: a partkey absent from the dim (code ==
            # NONE sentinel, the last vals slot) drops out of numerator AND
            # denominator, matching the SQL oracle regardless of FK
            # integrity (r2 ADVICE item 4)
            in_dim = code != none_code
            rev, code = rev[in_dim], code[in_dim]
            promo = code == promo_code
            return pa.table({
                "promo_cents": pa.array([int(rev[promo].sum())], pa.int64()),
                "total_cents": pa.array([int(rev.sum())], pa.int64()),
                "n_rows": pa.array([int(in_dim.sum())], pa.int64()),
            })

    li = _read(sf_dir, "lineitem", ["l_partkey", "l_shipdate",
                                    "l_extendedprice", "l_discount"])
    parts = li.map_batches(cached_stage(Partial, f"q14:{ref.hex()}"),
                           batch_format="pyarrow", batch_size=65536)
    s = _driver_sum(parts, ["promo_cents", "total_cents", "n_rows"])
    return pd.DataFrame({"promo_cents": [s["promo_cents"]],
                         "total_cents": [s["total_cents"]],
                         "n_rows": [s["n_rows"]]})


SQL_PROMO_REVENUE = f"""
SELECT
  CAST(COALESCE(SUM(CASE WHEN p.p_type = 'PROMO'
    THEN CAST(floor(l.l_extendedprice * (1.0 - l.l_discount) * 100.0 + 0.5) AS BIGINT)
    ELSE 0 END), 0) AS BIGINT) AS promo_cents,
  CAST(COALESCE(SUM(CAST(floor(l.l_extendedprice * (1.0 - l.l_discount) * 100.0 + 0.5) AS BIGINT)), 0) AS BIGINT) AS total_cents,
  COUNT(*) AS n_rows
FROM lineitem l JOIN part p ON l.l_partkey = p.p_partkey
WHERE epoch_us(l.l_shipdate) >= {_us(Q14_LO)} AND epoch_us(l.l_shipdate) < {_us(Q14_HI)}
""".strip()


# --- Q15: top supplier -------------------------------------------------------

Q15_LO, Q15_HI = "1996-01-01", "1996-04-01"


def q_top_supplier(sf_dir: str) -> ray.data.Dataset:
    """TPC-H Q15 analog: supplier(s) with the maximum revenue in one
    quarter.  Shape: filtered scan -> per-block suppkey combiner -> bucketed
    grouped sum -> distributed MAX -> equality filter -> broadcast name
    decode.  (The per-supplier aggregate is materialized once and scanned
    twice: once for the max, once for the filter.)"""
    lo, hi = _us(Q15_LO), _us(Q15_HI)
    li = _read(sf_dir, "lineitem", ["l_suppkey", "l_shipdate",
                                    "l_extendedprice", "l_discount"])

    def partial(b: pa.Table) -> pa.Table:
        ship = b["l_shipdate"].cast(pa.int64()).to_numpy(zero_copy_only=False)
        m = (ship >= lo) & (ship < hi)
        key = b["l_suppkey"].to_numpy(zero_copy_only=False)[m]
        price = b["l_extendedprice"].to_numpy(zero_copy_only=False)[m]
        disc = b["l_discount"].to_numpy(zero_copy_only=False)[m]
        rev = cents(price * (1.0 - disc))
        u, inv = np.unique(key, return_inverse=True)
        sums = np.zeros(u.shape[0], dtype=np.int64)
        np.add.at(sums, inv, rev)
        return pa.table({"s_suppkey": pa.array(u.astype(np.int64)),
                         "rev_cents": pa.array(sums)})

    per_supp = bucketed_sum(
        li.map_batches(partial, batch_format="pyarrow", batch_size=65536),
        "s_suppkey", "rev_cents").materialize()
    best_raw = per_supp.max("rev_cents") if per_supp.count() else None
    if best_raw is None:
        # no lineitem in the window at this scale factor: the SQL oracle's
        # CTE is empty, so the join yields 0 rows (r3 review: int(None)
        # crashed here instead)
        return ray.data.from_arrow(pa.table({
            "s_suppkey": pa.array([], pa.int64()),
            "s_name": pa.array([], pa.string()),
            "rev_cents": pa.array([], pa.int64())}))
    best = int(best_raw)

    # supplier-dimension-sized decode array: ship once via ray.put (the r2
    # pattern), not per-task closure capture
    names_ref = ray.put(dense_str_decode(sf_dir, "supplier", "s_suppkey",
                                         "s_name"))

    def winners(b: pa.Table) -> pa.Table:
        from ..sources.pages import cached_get

        names = cached_get(names_ref)
        t = b.filter(pc.equal(b["rev_cents"], best))
        sk = t["s_suppkey"].to_numpy(zero_copy_only=False)
        safe = np.where((sk >= 0) & (sk < names.shape[0]), sk,
                        names.shape[0] - 1)
        nm = names[safe]
        # inner-join semantics: drop winners whose suppkey misses the dim
        keep = nm != None  # noqa: E711 (elementwise on object array)
        t = t.filter(pa.array(keep))
        return pa.table({"s_suppkey": t["s_suppkey"],
                         "s_name": pa.array(nm[keep], pa.string()),
                         "rev_cents": t["rev_cents"]})

    return per_supp.map_batches(winners, batch_format="pyarrow")


SQL_TOP_SUPPLIER = f"""
WITH r AS (
  SELECT l_suppkey AS s_suppkey,
         CAST(SUM(CAST(floor(l_extendedprice * (1.0 - l_discount) * 100.0 + 0.5) AS BIGINT)) AS BIGINT) AS rev_cents
  FROM lineitem
  WHERE epoch_us(l_shipdate) >= {_us(Q15_LO)} AND epoch_us(l_shipdate) < {_us(Q15_HI)}
  GROUP BY l_suppkey
)
SELECT r.s_suppkey, s.s_name, r.rev_cents
FROM r JOIN supplier s ON r.s_suppkey = s.s_suppkey
WHERE r.rev_cents = (SELECT MAX(rev_cents) FROM r)
""".strip()


# --- Q17: small-quantity revenue --------------------------------------------

Q17_BRAND = "Brand#23"


def q_small_qty_revenue(sf_dir: str) -> pd.DataFrame:
    """TPC-H Q17 analog: revenue from lineitems of one brand whose quantity
    is below 20% of that part's average quantity.  The fractional comparison
    ``qty < 0.2 * avg`` is cross-multiplied to the integer test
    ``5 * qty * n < sum_qty`` (quantities are integral), so both sides are
    float-free.  Shape: broadcast brand partkey set -> filtered scan ->
    bucketed per-part aggregate -> bucketed join back to the same filtered
    rows -> vectorized filter -> driver add."""
    from ..core.config import cached_stage
    from ..stages.hashjoin import hash_join

    codes, vals, _miss = _brand_codes(sf_dir, "p_brand")
    # a brand absent at this scale factor matches nothing (-1 never appears
    # in codes), mirroring the SQL join's 0 rows (r3 review)
    brand_code = vals.index(Q17_BRAND) if Q17_BRAND in vals else -1
    if brand_code < 0:
        return pd.DataFrame({"n_rows": [0], "sum_price_cents": [0]})
    ref = ray.put(codes)

    class BrandRows:
        def __init__(self):
            self.codes = ray.get(ref)

        def __call__(self, b: pa.Table) -> pa.Table:
            pk = b["l_partkey"].to_numpy(zero_copy_only=False)
            safe = np.where((pk >= 0) & (pk < self.codes.shape[0]), pk,
                            self.codes.shape[0] - 1)
            m = self.codes[safe] == brand_code
            qty = np.floor(b["l_quantity"].to_numpy(zero_copy_only=False)[m]).astype(np.int64)
            price = b["l_extendedprice"].to_numpy(zero_copy_only=False)[m]
            return pa.table({"l_partkey": pa.array(pk[m].astype(np.int64)),
                             "qty": pa.array(qty),
                             "price_cents": pa.array(cents(price))})

    li = _read(sf_dir, "lineitem", ["l_partkey", "l_quantity", "l_extendedprice"])
    rows = li.map_batches(cached_stage(BrandRows, f"q17:{ref.hex()}"),
                          batch_format="pyarrow", batch_size=65536).materialize()

    def partial(b: pa.Table) -> pa.Table:
        key = b["l_partkey"].to_numpy(zero_copy_only=False)
        qty = b["qty"].to_numpy(zero_copy_only=False)
        u, inv = np.unique(key, return_inverse=True)
        sums = np.zeros(u.shape[0], dtype=np.int64)
        np.add.at(sums, inv, qty)
        cnt = np.bincount(inv).astype(np.int64)
        return pa.table({"l_partkey": pa.array(u), "sum_qty": pa.array(sums),
                         "n_li": pa.array(cnt)})

    from ..stages.grouping import bucketed_group_apply

    def agg(g: pd.DataFrame) -> pd.DataFrame:
        return g.groupby("l_partkey", as_index=False).agg(
            sum_qty=("sum_qty", "sum"), n_li=("n_li", "sum"))

    per_part = bucketed_group_apply(
        rows.map_batches(partial, batch_format="pyarrow", batch_size=65536),
        ["l_partkey"], agg)

    joined = hash_join(rows, per_part, "l_partkey",
                       ["l_partkey", "qty", "price_cents"],
                       ["l_partkey", "sum_qty", "n_li"],
                       types={"sum_qty": pa.int64(), "n_li": pa.int64()})

    def small(b: pa.Table) -> pa.Table:
        qty = b["qty"].to_numpy(zero_copy_only=False)
        n = b["n_li"].to_numpy(zero_copy_only=False)
        sq = b["sum_qty"].to_numpy(zero_copy_only=False)
        m = 5 * qty * n < sq
        price = b["price_cents"].to_numpy(zero_copy_only=False)[m]
        return pa.table({"n_rows": pa.array([int(m.sum())], pa.int64()),
                         "sum_price_cents": pa.array([int(price.sum())], pa.int64())})

    s = _driver_sum(joined.map_batches(small, batch_format="pyarrow",
                                       batch_size=65536),
                    ["n_rows", "sum_price_cents"])
    return pd.DataFrame({"n_rows": [s["n_rows"]],
                         "sum_price_cents": [s["sum_price_cents"]]})


SQL_SMALL_QTY_REVENUE = f"""
WITH pp AS (
  SELECT l.l_partkey,
         CAST(SUM(CAST(floor(l.l_quantity) AS BIGINT)) AS BIGINT) AS sum_qty,
         COUNT(*) AS n_li
  FROM lineitem l JOIN part p ON l.l_partkey = p.p_partkey
  WHERE p.p_brand = '{Q17_BRAND}'
  GROUP BY l.l_partkey
)
SELECT COUNT(*) AS n_rows,
       CAST(COALESCE(SUM(CAST(floor(l.l_extendedprice * 100.0 + 0.5) AS BIGINT)), 0) AS BIGINT) AS sum_price_cents
FROM lineitem l JOIN pp ON l.l_partkey = pp.l_partkey
WHERE CAST(floor(l.l_quantity) AS BIGINT) * 5 * pp.n_li < pp.sum_qty
""".strip()


# --- Q19: disjunctive brand/quantity revenue ---------------------------------

Q19_TERMS = [("Brand#12", 1, 11), ("Brand#23", 10, 20), ("Brand#34", 20, 30)]


def q_brand_volume(sf_dir: str) -> pd.DataFrame:
    """TPC-H Q19 analog: revenue under a 3-way disjunctive (brand, quantity
    band) predicate.  Shape: broadcast partkey->brand codes -> stateless
    disjunctive filter -> per-block partial -> driver add."""
    from ..core.config import cached_stage

    codes, vals, _miss = _brand_codes(sf_dir, "p_brand")
    # a brand absent at this scale factor matches nothing (code -1 never
    # appears in the codes array), mirroring the SQL predicate's 0 rows
    terms = [(vals.index(b) if b in vals else -1, lo, hi)
             for b, lo, hi in Q19_TERMS]
    ref = ray.put(codes)

    class Partial:
        def __init__(self):
            self.codes = ray.get(ref)

        def __call__(self, b: pa.Table) -> pa.Table:
            pk = b["l_partkey"].to_numpy(zero_copy_only=False)
            qty = np.floor(b["l_quantity"].to_numpy(zero_copy_only=False)).astype(np.int64)
            safe = np.where((pk >= 0) & (pk < self.codes.shape[0]), pk,
                            self.codes.shape[0] - 1)
            code = self.codes[safe]
            m = np.zeros(len(pk), dtype=bool)
            for bc, lo, hi in terms:
                m |= (code == bc) & (qty >= lo) & (qty <= hi)
            price = b["l_extendedprice"].to_numpy(zero_copy_only=False)[m]
            disc = b["l_discount"].to_numpy(zero_copy_only=False)[m]
            rev = cents(price * (1.0 - disc))
            return pa.table({"n_rows": pa.array([int(m.sum())], pa.int64()),
                             "rev_cents": pa.array([int(rev.sum())], pa.int64())})

    li = _read(sf_dir, "lineitem",
               ["l_partkey", "l_quantity", "l_extendedprice", "l_discount"])
    parts = li.map_batches(cached_stage(Partial, f"q19:{ref.hex()}"),
                           batch_format="pyarrow", batch_size=65536)
    s = _driver_sum(parts, ["n_rows", "rev_cents"])
    return pd.DataFrame({"n_rows": [s["n_rows"]], "rev_cents": [s["rev_cents"]]})


def _sql_q19_terms() -> str:
    return " OR ".join(
        f"(p.p_brand = '{b}' AND floor(l.l_quantity) BETWEEN {lo} AND {hi})"
        for b, lo, hi in Q19_TERMS)


SQL_BRAND_VOLUME = f"""
SELECT COUNT(*) AS n_rows,
       CAST(COALESCE(SUM(CAST(floor(l.l_extendedprice * (1.0 - l.l_discount) * 100.0 + 0.5) AS BIGINT)), 0) AS BIGINT) AS rev_cents
FROM lineitem l JOIN part p ON l.l_partkey = p.p_partkey
WHERE {_sql_q19_terms()}
""".strip()


# --- Q22: global sales opportunity -------------------------------------------


def q_sales_opportunity(sf_dir: str) -> pd.DataFrame:
    """TPC-H Q22 analog: per-nation count + balance of customers with an
    above-average positive balance and NO orders.  The average comparison is
    cross-multiplied (``bal * n_pos > sum_pos``), the "no orders" test is
    the distributed anti join, and the rollup is dimension-sized.  Shape:
    per-block scalar partials -> driver 2-int combine -> anti hash join ->
    integer filter -> grouped sum."""
    from ..stages.hashjoin import hash_join

    cust = _read(sf_dir, "customer", ["c_custkey", "c_nationkey", "c_acctbal"])

    def pos_partial(b: pa.Table) -> pa.Table:
        bal = cents(b["c_acctbal"].to_numpy(zero_copy_only=False))
        pos = bal > 0
        return pa.table({"n_pos": pa.array([int(pos.sum())], pa.int64()),
                         "sum_pos": pa.array([int(bal[pos].sum())], pa.int64())})

    s = _driver_sum(cust.map_batches(pos_partial, batch_format="pyarrow",
                                     batch_size=65536), ["n_pos", "sum_pos"])
    n_pos, sum_pos = s["n_pos"], s["sum_pos"]

    def prep(b: pa.Table) -> pa.Table:
        bal = cents(b["c_acctbal"].to_numpy(zero_copy_only=False))
        # int64 up front: the final pandas rollup upcasts int32 anyway,
        # but only on NON-EMPTY frames — a scale-dependent dtype (0 rows at
        # sf0.01 stayed int32; 1 row at sf0.1 became int64).  Cast both
        # sides unconditionally (SQL casts to BIGINT).
        return pa.table({"c_custkey": b["c_custkey"],
                         "c_nationkey": b["c_nationkey"].cast(pa.int64()),
                         "bal_cents": pa.array(bal)})

    orders = _read(sf_dir, "orders", ["o_custkey"])

    def okeys(b: pa.Table) -> pa.Table:
        return pa.table({"c_custkey": b["o_custkey"]})

    no_orders = hash_join(
        cust.map_batches(prep, batch_format="pyarrow"),
        orders.map_batches(okeys, batch_format="pyarrow"),
        "c_custkey",
        ["c_custkey", "c_nationkey", "bal_cents"], ["c_custkey"], how="anti",
    )

    def rich(b: pa.Table) -> pa.Table:
        bal = b["bal_cents"].to_numpy(zero_copy_only=False)
        return b.filter(pa.array(bal * n_pos > sum_pos))

    kept = no_orders.map_batches(rich, batch_format="pyarrow")
    out = combined_groupby_sum(
        kept.select_columns(["c_nationkey", "bal_cents"]),
        ["c_nationkey"], ["bal_cents"], count_alias="n_cust").to_pandas()
    if out.empty:
        # an empty Dataset drops its schema through the aggregate; the
        # result is nation-dimension-sized either way, so return it typed
        out = pd.DataFrame({"c_nationkey": pd.array([], dtype="int64"),
                            "n_cust": pd.array([], dtype="int64"),
                            "bal_cents": pd.array([], dtype="int64")})
    return out


SQL_SALES_OPPORTUNITY = """
SELECT CAST(c_nationkey AS BIGINT) AS c_nationkey, COUNT(*) AS n_cust,
       CAST(SUM(bal_cents) AS BIGINT) AS bal_cents
FROM (
  SELECT c.c_nationkey,
         CAST(floor(c.c_acctbal * 100.0 + 0.5) AS BIGINT) AS bal_cents
  FROM customer c
  WHERE NOT EXISTS (SELECT 1 FROM orders o WHERE o.o_custkey = c.c_custkey)
    AND CAST(floor(c.c_acctbal * 100.0 + 0.5) AS BIGINT)
        * (SELECT COUNT(*) FROM customer
           WHERE CAST(floor(c_acctbal * 100.0 + 0.5) AS BIGINT) > 0)
        > (SELECT CAST(SUM(CAST(floor(c_acctbal * 100.0 + 0.5) AS BIGINT)) AS BIGINT)
           FROM customer
           WHERE CAST(floor(c_acctbal * 100.0 + 0.5) AS BIGINT) > 0)
)
GROUP BY c_nationkey
""".strip()


# --- Q7: nation trade volume -------------------------------------------------

Q7_LO, Q7_HI = "1996-01-01", "1998-01-01"


def q_nation_volume(sf_dir: str) -> ray.data.Dataset:
    """TPC-H Q7 analog: revenue by (supplier nation, customer nation, ship
    year).  Shape: TWO chained large-large bucketed hash joins
    (orders ⋈ customer on custkey, then lineitem ⋈ that on orderkey) with
    the supplier dim broadcast as a dense nationkey array, then a
    dimension-sized 3-key rollup via per-block combiners."""
    from ..core.config import cached_stage
    from ..stages.hashjoin import hash_join

    lo, hi = _us(Q7_LO), _us(Q7_HI)

    orders = _read(sf_dir, "orders", ["o_orderkey", "o_custkey"])

    def ord_prep(b: pa.Table) -> pa.Table:
        return pa.table({"c_custkey": b["o_custkey"],
                         "o_orderkey": b["o_orderkey"]})

    cust = _read(sf_dir, "customer", ["c_custkey", "c_nationkey"])

    def cust_prep(b: pa.Table) -> pa.Table:
        return pa.table({
            "c_custkey": b["c_custkey"],
            "cust_nation": b["c_nationkey"].cast(pa.int64()),
        })

    ord_cust = hash_join(
        orders.map_batches(ord_prep, batch_format="pyarrow"),
        cust.map_batches(cust_prep, batch_format="pyarrow"),
        "c_custkey",
        ["c_custkey", "o_orderkey"], ["c_custkey", "cust_nation"],
    )

    snation = dense_int_dim(sf_dir, "supplier", "s_suppkey", "s_nationkey")
    ref = ray.put(snation)

    class LiPrep:
        def __init__(self):
            self.snation = ray.get(ref)

        def __call__(self, b: pa.Table) -> pa.Table:
            ship = b["l_shipdate"].cast(pa.int64()).to_numpy(zero_copy_only=False)
            m = (ship >= lo) & (ship < hi)
            t = b.filter(pa.array(m))
            ship = ship[m]
            yr = year_of_us(ship)
            skey = t["l_suppkey"].to_numpy(zero_copy_only=False)
            safe = np.where((skey >= 0) & (skey < self.snation.shape[0]), skey,
                            self.snation.shape[0] - 1)
            nat = self.snation[safe]
            # inner-join semantics: drop rows whose suppkey misses the
            # supplier dim (nation -1) instead of emitting a -1 group
            # (r2 ADVICE item 4)
            keep = nat >= 0
            t, nat, yr = t.filter(pa.array(keep)), nat[keep], yr[keep]
            price = t["l_extendedprice"].to_numpy(zero_copy_only=False)
            disc = t["l_discount"].to_numpy(zero_copy_only=False)
            return pa.table({
                "o_orderkey": t["l_orderkey"],
                "supp_nation": pa.array(nat),
                "yr": pa.array(yr),
                "rev_cents": pa.array(cents(price * (1.0 - disc))),
            })

    li = _read(sf_dir, "lineitem", ["l_orderkey", "l_suppkey", "l_shipdate",
                                    "l_extendedprice", "l_discount"])
    li_prep = li.map_batches(cached_stage(LiPrep, f"q7:{ref.hex()}"),
                             batch_format="pyarrow", batch_size=65536)

    joined = hash_join(
        li_prep, ord_cust.select_columns(["o_orderkey", "cust_nation"]),
        "o_orderkey",
        ["o_orderkey", "supp_nation", "yr", "rev_cents"],
        ["o_orderkey", "cust_nation"],
        types={"cust_nation": pa.int64()},
    )
    return combined_groupby_sum(
        joined.select_columns(["supp_nation", "cust_nation", "yr", "rev_cents"]),
        ["supp_nation", "cust_nation", "yr"], ["rev_cents"],
        count_alias="n_rows")


SQL_NATION_VOLUME = f"""
SELECT CAST(s.s_nationkey AS BIGINT) AS supp_nation,
       CAST(c.c_nationkey AS BIGINT) AS cust_nation,
       CAST(year(l.l_shipdate) AS BIGINT) AS yr,
       COUNT(*) AS n_rows,
       CAST(SUM(CAST(floor(l.l_extendedprice * (1.0 - l.l_discount) * 100.0 + 0.5) AS BIGINT)) AS BIGINT) AS rev_cents
FROM lineitem l
JOIN supplier s ON l.l_suppkey = s.s_suppkey
JOIN orders o ON l.l_orderkey = o.o_orderkey
JOIN customer c ON o.o_custkey = c.c_custkey
WHERE epoch_us(l.l_shipdate) >= {_us(Q7_LO)} AND epoch_us(l.l_shipdate) < {_us(Q7_HI)}
GROUP BY 1, 2, 3
""".strip()


# --- Q5 local supplier volume ------------------------------------------------

Q5_REGION = "ASIA"
Q5_LO, Q5_HI = "1996-01-01", "1997-01-01"


def q_local_volume(sf_dir: str) -> ray.data.Dataset:
    """TPC-H Q5 analog: revenue per nation where the supplier and the
    customer share that nation, customers restricted to one region, orders
    to one year.  Shape: region/nation dims resolved driver-side (tiny),
    customer PRE-FILTERED to the region's nations before the custkey join
    (prune before the exchange), two chained large-large bucketed joins,
    supplier broadcast as a dense suppkey -> nationkey array, the
    local-supplier predicate applied post-join, dimension-sized rollup."""
    from ..core.config import cached_stage
    from ..stages.hashjoin import hash_join

    lo, hi = _us(Q5_LO), _us(Q5_HI)

    # shared driver-side region->nations resolution (r3 review: the Q5/Q8
    # copies crashed with IndexError on an absent region; the helper yields
    # an empty member set -> 0 rows, matching the SQL inner join)
    member_nations, names = region_nations(sf_dir, Q5_REGION)
    # broadcast the numpy array directly (Q8's pattern): no per-batch
    # set-iteration/np.fromiter rebuild on the customer hot path (r3 review)
    nations_ref = ray.put(member_nations)

    orders = _read(sf_dir, "orders", ["o_orderkey", "o_custkey", "o_orderdate"])

    def ord_prep(b: pa.Table) -> pa.Table:
        d = b["o_orderdate"].cast(pa.int64()).to_numpy(zero_copy_only=False)
        t = b.filter(pa.array((d >= lo) & (d < hi)))
        return pa.table({"c_custkey": t["o_custkey"],
                         "o_orderkey": t["o_orderkey"]})

    cust = _read(sf_dir, "customer", ["c_custkey", "c_nationkey"])

    class CustPrep:
        def __init__(self):
            self.nations = ray.get(nations_ref)

        def __call__(self, b: pa.Table) -> pa.Table:
            nk = b["c_nationkey"].to_numpy(zero_copy_only=False).astype(np.int64)
            keep = np.isin(nk, self.nations)
            t = b.filter(pa.array(keep))
            return pa.table({
                "c_custkey": t["c_custkey"],
                "cust_nation": t["c_nationkey"].cast(pa.int64()),
            })

    ord_cust = hash_join(
        orders.map_batches(ord_prep, batch_format="pyarrow", batch_size=65536),
        cust.map_batches(cached_stage(CustPrep, f"q5cust:{nations_ref.hex()}"),
                         batch_format="pyarrow", batch_size=65536),
        "c_custkey",
        ["c_custkey", "o_orderkey"], ["c_custkey", "cust_nation"],
        types={"o_orderkey": pa.int64(), "cust_nation": pa.int64()},
    )

    snation = dense_int_dim(sf_dir, "supplier", "s_suppkey", "s_nationkey")
    sref = ray.put(snation)

    class LiPrep:
        def __init__(self):
            self.snation = ray.get(sref)

        def __call__(self, b: pa.Table) -> pa.Table:
            skey = b["l_suppkey"].to_numpy(zero_copy_only=False)
            safe = np.where((skey >= 0) & (skey < self.snation.shape[0]),
                            skey, self.snation.shape[0] - 1)
            nat = self.snation[safe]
            keep = nat >= 0  # inner-join semantics: dim misses drop out
            b, nat = b.filter(pa.array(keep)), nat[keep]
            price = b["l_extendedprice"].to_numpy(zero_copy_only=False)
            disc = b["l_discount"].to_numpy(zero_copy_only=False)
            return pa.table({
                "o_orderkey": b["l_orderkey"],
                "supp_nation": pa.array(nat),
                "rev_cents": pa.array(cents(price * (1.0 - disc))),
            })

    li = _read(sf_dir, "lineitem",
               ["l_orderkey", "l_suppkey", "l_extendedprice", "l_discount"])
    li_prep = li.map_batches(cached_stage(LiPrep, f"q5li:{sref.hex()}"),
                             batch_format="pyarrow", batch_size=65536)

    joined = hash_join(
        li_prep, ord_cust.select_columns(["o_orderkey", "cust_nation"]),
        "o_orderkey",
        ["o_orderkey", "supp_nation", "rev_cents"],
        ["o_orderkey", "cust_nation"],
        types={"supp_nation": pa.int64(), "rev_cents": pa.int64(),
               "cust_nation": pa.int64()},
    )

    names_ref = ray.put(names)

    class Local:
        def __init__(self):
            self.names = ray.get(names_ref)

        def __call__(self, b: pa.Table) -> pa.Table:
            sn = b["supp_nation"].to_numpy(zero_copy_only=False)
            cn = b["cust_nation"].to_numpy(zero_copy_only=False)
            local = sn == cn
            t = b.filter(pa.array(local))
            name = pd.Series(sn[local]).map(self.names)
            df = pd.DataFrame({"n_name": name,
                               "rev_cents": t["rev_cents"].to_numpy(
                                   zero_copy_only=False)})
            # NaN n_name (nationkey absent from the dim) drops in the groupby
            # = inner-join semantics
            g = df.groupby("n_name", as_index=False).agg(
                n_rows=("rev_cents", "size"), rev_cents=("rev_cents", "sum"))
            # explicit types: an all-empty block must emit n_name: string,
            # not pandas-inferred null, so block schemas agree without
            # relying on Ray's internal null->string promotion (r3 review)
            return pa.table({
                "n_name": pa.array(g["n_name"].to_numpy(), pa.string()),
                "n_rows": pa.array(g["n_rows"].to_numpy().astype(np.int64)),
                "rev_cents": pa.array(
                    g["rev_cents"].to_numpy().astype(np.int64)),
            })

    def final(g: pd.DataFrame) -> pd.DataFrame:
        return g.groupby("n_name", as_index=False).agg(
            n_rows=("n_rows", "sum"), rev_cents=("rev_cents", "sum"))

    return (
        joined.map_batches(cached_stage(Local, f"q5loc:{names_ref.hex()}"),
                           batch_format="pyarrow", batch_size=65536)
        .groupby("n_name").map_groups(final, batch_format="pandas")
    )


SQL_LOCAL_VOLUME = f"""
SELECT n.n_name,
       COUNT(*) AS n_rows,
       CAST(SUM(CAST(floor(l.l_extendedprice * (1.0 - l.l_discount) * 100.0 + 0.5) AS BIGINT)) AS BIGINT) AS rev_cents
FROM customer c
JOIN orders o ON c.c_custkey = o.o_custkey
JOIN lineitem l ON l.l_orderkey = o.o_orderkey
JOIN supplier s ON l.l_suppkey = s.s_suppkey AND c.c_nationkey = s.s_nationkey
JOIN nation n ON s.s_nationkey = n.n_nationkey
JOIN region r ON n.n_regionkey = r.r_regionkey
WHERE r.r_name = '{Q5_REGION}'
  AND epoch_us(o.o_orderdate) >= {{lo}} AND epoch_us(o.o_orderdate) < {{hi}}
GROUP BY 1
""".strip().format(lo=_us(Q5_LO), hi=_us(Q5_HI))


# --- Q8 market share ---------------------------------------------------------

Q8_REGION = "ASIA"
Q8_NATION = "NATION_7"
Q8_TYPE = "PROMO"
Q8_LO, Q8_HI = "1995-01-01", "1997-01-01"


def q_market_share(sf_dir: str) -> ray.data.Dataset:
    """TPC-H Q8 analog: per order year, the target nation's share of revenue
    for one part type sold to customers of one region — kept EXACT as the
    integer (numerator, denominator) cent pair instead of a float division.
    Shape: part + supplier + nation/region dims broadcast (dense arrays /
    key sets), lineitem pre-filtered on the broadcast part set at the scan,
    one large-large join to date-filtered orders, customer region semi join,
    per-block combiner to a year-sized rollup."""
    import pyarrow.parquet as pq

    from ..core.config import cached_stage
    from ..stages.hashjoin import hash_join

    lo, hi = _us(Q8_LO), _us(Q8_HI)

    # shared region resolution; -1 target sentinel when the nation is
    # absent -> numerator 0, matching the oracle's conditional sum
    # (r3 review: the inline lookups crashed with IndexError instead)
    member_nations, names = region_nations(sf_dir, Q8_REGION)
    target = next((k for k, v in names.items() if v == Q8_NATION), -1)

    part = pq.read_table(table_path(sf_dir, "part"), columns=["p_partkey", "p_type"])
    pk = part["p_partkey"].to_numpy()
    # empty-part guard, same shape as dense_int_dim's (r3 review)
    promo = np.zeros((int(pk.max()) + 2) if len(pk) else 2, dtype=bool)
    if len(pk):
        promo[pk[np.array(part["p_type"].to_pylist(), dtype=object)
                 == Q8_TYPE]] = True
    snation = dense_int_dim(sf_dir, "supplier", "s_suppkey", "s_nationkey")
    dims_ref = ray.put({"promo": promo, "snation": snation})

    li = _read(sf_dir, "lineitem", ["l_orderkey", "l_partkey", "l_suppkey",
                                    "l_extendedprice", "l_discount"])

    class LiPrep:
        def __init__(self):
            d = ray.get(dims_ref)
            self.promo, self.snation = d["promo"], d["snation"]

        def __call__(self, b: pa.Table) -> pa.Table:
            pkey = b["l_partkey"].to_numpy(zero_copy_only=False)
            safe_p = np.where((pkey >= 0) & (pkey < self.promo.shape[0]),
                              pkey, self.promo.shape[0] - 1)
            t = b.filter(pa.array(self.promo[safe_p]))
            skey = t["l_suppkey"].to_numpy(zero_copy_only=False)
            safe_s = np.where((skey >= 0) & (skey < self.snation.shape[0]),
                              skey, self.snation.shape[0] - 1)
            nat = self.snation[safe_s]
            keep = nat >= 0  # inner-join semantics: dim misses drop out
            t, nat = t.filter(pa.array(keep)), nat[keep]
            price = t["l_extendedprice"].to_numpy(zero_copy_only=False)
            disc = t["l_discount"].to_numpy(zero_copy_only=False)
            return pa.table({
                "o_orderkey": t["l_orderkey"],
                "supp_nation": pa.array(nat),
                "rev_cents": pa.array(cents(price * (1.0 - disc))),
            })

    li_prep = li.map_batches(cached_stage(LiPrep, f"q8li:{dims_ref.hex()}"),
                             batch_format="pyarrow", batch_size=65536)

    orders = _read(sf_dir, "orders", ["o_orderkey", "o_custkey", "o_orderdate"])

    def ord_prep(b: pa.Table) -> pa.Table:
        d = b["o_orderdate"].cast(pa.int64()).to_numpy(zero_copy_only=False)
        m = (d >= lo) & (d < hi)
        t = b.filter(pa.array(m))
        yr = year_of_us(d[m])
        return pa.table({"o_orderkey": t["o_orderkey"],
                         "c_custkey": t["o_custkey"],
                         "yr": pa.array(yr)})

    li_ord = hash_join(
        li_prep, orders.map_batches(ord_prep, batch_format="pyarrow",
                                    batch_size=65536),
        "o_orderkey",
        ["o_orderkey", "supp_nation", "rev_cents"],
        ["o_orderkey", "c_custkey", "yr"],
        types={"supp_nation": pa.int64(), "rev_cents": pa.int64(),
               "c_custkey": pa.int64(), "yr": pa.int64()},
    )

    nations_ref = ray.put(member_nations)
    cust = _read(sf_dir, "customer", ["c_custkey", "c_nationkey"])

    class CustPrep:
        def __init__(self):
            self.nations = ray.get(nations_ref)

        def __call__(self, b: pa.Table) -> pa.Table:
            nk = b["c_nationkey"].to_numpy(zero_copy_only=False).astype(np.int64)
            t = b.filter(pa.array(np.isin(nk, self.nations)))
            return pa.table({"c_custkey": t["c_custkey"]})

    in_region = hash_join(
        li_ord.select_columns(["c_custkey", "supp_nation", "yr", "rev_cents"]),
        cust.map_batches(cached_stage(CustPrep, f"q8cust:{nations_ref.hex()}"),
                         batch_format="pyarrow", batch_size=65536),
        "c_custkey",
        ["c_custkey", "supp_nation", "yr", "rev_cents"], ["c_custkey"],
        how="semi",
        types={"supp_nation": pa.int64(), "yr": pa.int64(),
               "rev_cents": pa.int64()},
    )

    def combiner(b: pa.Table) -> pa.Table:
        yr = b["yr"].to_numpy(zero_copy_only=False)
        sn = b["supp_nation"].to_numpy(zero_copy_only=False)
        rev = b["rev_cents"].to_numpy(zero_copy_only=False)
        df = pd.DataFrame({"yr": yr,
                           "num_cents": np.where(sn == target, rev, 0),
                           "den_cents": rev})
        g = df.groupby("yr", as_index=False).agg(
            num_cents=("num_cents", "sum"), den_cents=("den_cents", "sum"))
        return pa.Table.from_pandas(g, preserve_index=False)

    def final(g: pd.DataFrame) -> pd.DataFrame:
        return g.groupby("yr", as_index=False).agg(
            num_cents=("num_cents", "sum"), den_cents=("den_cents", "sum"))

    return (
        in_region.map_batches(combiner, batch_format="pyarrow",
                              batch_size=65536)
        .groupby("yr").map_groups(final, batch_format="pandas")
    )


SQL_MARKET_SHARE = f"""
SELECT CAST(year(o.o_orderdate) AS BIGINT) AS yr,
       CAST(SUM(CASE WHEN s.s_nationkey = n2.n_nationkey
                     THEN CAST(floor(l.l_extendedprice * (1.0 - l.l_discount) * 100.0 + 0.5) AS BIGINT)
                     ELSE 0 END) AS BIGINT) AS num_cents,
       CAST(SUM(CAST(floor(l.l_extendedprice * (1.0 - l.l_discount) * 100.0 + 0.5) AS BIGINT)) AS BIGINT) AS den_cents
FROM lineitem l
JOIN part p ON l.l_partkey = p.p_partkey AND p.p_type = '{Q8_TYPE}'
JOIN supplier s ON l.l_suppkey = s.s_suppkey
JOIN orders o ON l.l_orderkey = o.o_orderkey
JOIN customer c ON o.o_custkey = c.c_custkey
JOIN nation n ON c.c_nationkey = n.n_nationkey
JOIN region r ON n.n_regionkey = r.r_regionkey AND r.r_name = '{Q8_REGION}'
CROSS JOIN (SELECT n_nationkey FROM nation WHERE n_name = '{Q8_NATION}') n2
WHERE epoch_us(o.o_orderdate) >= {{lo}} AND epoch_us(o.o_orderdate) < {{hi}}
GROUP BY 1
""".strip().format(lo=_us(Q8_LO), hi=_us(Q8_HI))


# --- predicate-pushdown scan -------------------------------------------------

PUSHDOWN_QTY = 45.0


def q_pushdown_revenue(sf_dir: str) -> pd.DataFrame:
    """Scan-level predicate pushdown: the quantity filter is handed to
    ``read_parquet(filter=...)`` as a pyarrow dataset expression, so row
    groups that cannot match are never decoded and non-matching rows never
    enter the object store — on a real lake (many files / row groups with
    statistics) this prunes at the STORAGE layer, before any Ray task sees
    a byte.  Downstream is the Q6 shape: per-block cents partials, driver
    add.  (The sibling `revenue_forecast` filters post-read in the map —
    the two queries document both placements.)"""
    import pyarrow.dataset as pds

    from ..core.config import read_blocks

    ds = ray.data.read_parquet(
        table_path(sf_dir, "lineitem"),
        columns=["l_quantity", "l_extendedprice", "l_discount"],
        filter=(pds.field("l_quantity") >= PUSHDOWN_QTY),
        override_num_blocks=read_blocks(),
    )

    def partial(b: pa.Table) -> pa.Table:
        price = b["l_extendedprice"].to_numpy(zero_copy_only=False)
        disc = b["l_discount"].to_numpy(zero_copy_only=False)
        rev = cents(price * (1.0 - disc))
        return pa.table({"n_items": pa.array([b.num_rows], pa.int64()),
                         "rev_cents": pa.array([int(rev.sum())], pa.int64())})

    sums = _driver_sum(ds.map_batches(partial, batch_format="pyarrow",
                                      batch_size=65536),
                       ["n_items", "rev_cents"])
    return pd.DataFrame({"n_items": [sums["n_items"]],
                         "rev_cents": [sums["rev_cents"]]})


SQL_PUSHDOWN_REVENUE = f"""
SELECT COUNT(*) AS n_items,
       CAST(SUM(CAST(floor(l_extendedprice * (1.0 - l_discount) * 100.0 + 0.5) AS BIGINT)) AS BIGINT) AS rev_cents
FROM lineitem WHERE l_quantity >= {PUSHDOWN_QTY}
""".strip()
