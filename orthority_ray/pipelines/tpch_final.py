"""The last three classic TPC-H shapes: Q2 / Q11 / Q20 analogs.

All three originally run over ``partsupp``, which this data model lacks;
the part-supplier relation is recovered from the fact table itself — the
DISTINCT (l_partkey, l_suppkey) pairs of ``lineitem`` — so each query
keeps its defining plan shape:

- Q11 ``important_parts``   : aggregate vs a CORRELATED GLOBAL SCALAR
                              (per-part value share of a region's total)
- Q20 ``excess_suppliers``  : HAVING against an aggregate-of-aggregates
                              (suppliers above 1.2x the mean shipped qty)
- Q2  ``min_bal_supplier``  : per-group argmin over a derived distinct
                              relation with deterministic tie-breaking

The original TPC-H thresholds are absolute and scale with 1/SF (Q11's
``0.0001 / SF``); here both thresholds are expressed RELATIVE to the
group count (``value * n * 10 > K * total``) so one constant stays
non-trivial at every test scale — the comparison is kept exact by integer
cross-multiplication with an explicit big-int fallback (no float shares).

Exactness contract as everywhere in this repo (relational.py): money is
integer cents per row via ``floor(x * 100 + 0.5)`` on both sides,
quantities integer millis, every aggregate int64.

Reference parity note: the reference has no relational engine (its tables
are parameter dicts, /root/reference/orthority/param_io.py:56-64); these
queries are graft breadth over the driver's TPC-H-ish tables.
"""

from __future__ import annotations

import numpy as np
import pandas as pd
import pyarrow as pa
import pyarrow.parquet as pq
import ray
import ray.data

from ..core.config import cached_stage, table_path
from ..stages.grouping import bucketed_group_apply
from .relational import _read, bucketed_sum, cents, dense_str_decode
from .tpch_extra import _us

# --- shared helpers -----------------------------------------------------------


def _exact_mul_gt(v: np.ndarray, mult: int, rhs: int) -> np.ndarray:
    """Elementwise ``v * mult > rhs`` EXACT at any magnitude: int64 fast
    path inside a checked envelope, Python big-int fallback outside it
    (v is dimension-sized everywhere this is used, so the fallback is
    cheap).  A silent int64 overflow here would flip the comparison."""
    v = v.astype(np.int64, copy=False)
    if mult <= 0:
        raise ValueError("multiplier must be positive")
    lim = (2 ** 62) // mult
    # two-sided bound (not np.abs): np.abs(INT64_MIN) wraps back negative
    # and would sneak the wraparound value past the envelope check
    if abs(rhs) < 2 ** 62 and (v < lim).all() and (v > -lim).all():
        return v * np.int64(mult) > np.int64(rhs)
    return np.fromiter((int(x) * mult > rhs for x in v), dtype=bool,
                       count=v.shape[0])


def _dense_lookup(keys: np.ndarray, vals: np.ndarray, fill) -> np.ndarray:
    """Dense key->value array for ray.put broadcast (dims are small)."""
    out = np.full(int(keys.max()) + 2, fill, dtype=vals.dtype)
    out[keys] = vals
    return out


def _supplier_region_mask(sf_dir: str, regionkey: int) -> np.ndarray:
    """bool[suppkey]: supplier belongs to ``regionkey`` (via nation dim)."""
    sup = pq.read_table(table_path(sf_dir, "supplier"),
                        columns=["s_suppkey", "s_nationkey"])
    nat = pq.read_table(table_path(sf_dir, "nation"),
                        columns=["n_nationkey", "n_regionkey"])
    region_of = _dense_lookup(nat["n_nationkey"].to_numpy().astype(np.int64),
                              nat["n_regionkey"].to_numpy().astype(np.int64),
                              -1)
    sk = sup["s_suppkey"].to_numpy().astype(np.int64)
    snat = sup["s_nationkey"].to_numpy().astype(np.int64)
    mask = np.zeros(int(sk.max()) + 2, dtype=bool)
    safe = np.where((snat >= 0) & (snat < region_of.shape[0]), snat,
                    region_of.shape[0] - 1)
    mask[sk] = region_of[safe] == regionkey
    return mask


def _typed_empty(cols: dict[str, object]) -> pd.DataFrame:
    return pd.DataFrame({c: pd.Series([], dtype=t) for c, t in cols.items()})


# --- Q11: important parts ------------------------------------------------------
#
# Original Q11 ("important stock"): per-part partsupp value for suppliers of
# one nation, HAVING value > fraction * total.  Analog: per-part lineitem
# value (extendedprice x quantity, cents) for suppliers of one REGION
# (a nation is too sparse at sf0.001), HAVING value > 2x the mean part value
# (value * n * 10 > 20 * total, integer-exact).

Q11_REGION = 2
Q11_NUM = 20  # threshold = (Q11_NUM / 10) x mean per-part value


def q_important_parts(sf_dir: str) -> ray.data.Dataset:
    """Distributed shape: broadcast supplier->in-region mask (dense bool via
    ray.put, fetched once per worker) -> stateless filtered per-block
    combiner (np.unique + add.at) -> bucketed per-part sum -> the CORRELATED
    SCALAR (total + part count) read off the dimension-sized aggregate ->
    exact cross-multiplied HAVING filter, streamed.  Nothing bigger than the
    per-part table ever leaves the bucketed exchange."""
    in_region = _supplier_region_mask(sf_dir, Q11_REGION)
    ref = ray.put(in_region)

    class Partial:
        def __init__(self):
            self.mask = ray.get(ref)

        def __call__(self, b: pa.Table) -> pa.Table:
            sk = b["l_suppkey"].to_numpy(zero_copy_only=False)
            hi = self.mask.shape[0]
            safe = np.where((sk >= 0) & (sk < hi), sk, hi - 1)
            m = self.mask[safe]
            pk = b["l_partkey"].to_numpy(zero_copy_only=False)[m]
            price = b["l_extendedprice"].to_numpy(zero_copy_only=False)[m]
            qty = b["l_quantity"].to_numpy(zero_copy_only=False)[m]
            val = cents(price * qty)
            u, inv = np.unique(pk, return_inverse=True)
            sums = np.zeros(u.shape[0], dtype=np.int64)
            np.add.at(sums, inv, val)
            return pa.table({"p_partkey": pa.array(u.astype(np.int64)),
                             "value_cents": pa.array(sums)})

    li = _read(sf_dir, "lineitem",
               ["l_partkey", "l_suppkey", "l_extendedprice", "l_quantity"])
    per_part = bucketed_sum(
        li.map_batches(cached_stage(Partial, f"q11:{ref.hex()}"),
                       batch_format="pyarrow", batch_size=65536),
        "p_partkey", "value_cents").materialize()  # dimension-sized
    n = per_part.count()
    if not n:
        return ray.data.from_pandas(_typed_empty(
            {"p_partkey": np.int64, "value_cents": np.int64}))
    tot = int(per_part.sum("value_cents"))

    def having(b: pa.Table) -> pa.Table:
        v = b["value_cents"].to_numpy(zero_copy_only=False)
        keep = _exact_mul_gt(v, 10 * n, Q11_NUM * tot)
        return b.filter(pa.array(keep))

    return per_part.map_batches(having, batch_format="pyarrow")


SQL_IMPORTANT_PARTS = f"""
WITH v AS (
  SELECT l.l_partkey AS p_partkey,
         CAST(SUM(CAST(floor(l.l_extendedprice * l.l_quantity * 100.0 + 0.5)
                       AS BIGINT)) AS BIGINT) AS value_cents
  FROM lineitem l
  JOIN supplier s ON l.l_suppkey = s.s_suppkey
  JOIN nation n ON s.s_nationkey = n.n_nationkey
  WHERE n.n_regionkey = {Q11_REGION}
  GROUP BY 1
)
SELECT v.p_partkey, v.value_cents
FROM v, (SELECT SUM(value_cents) AS tot, COUNT(*) AS n FROM v) t
WHERE v.value_cents * t.n * 10 > {Q11_NUM} * t.tot
""".strip()


# --- Q20: excess suppliers -----------------------------------------------------
#
# Original Q20 ("potential part promotion"): suppliers whose stock of
# name-prefixed parts exceeds half of a year's shipped quantity.  Analog:
# suppliers whose shipped quantity of 'small *' parts over two years
# exceeds 1.2x the mean across shipping suppliers
# (q * n * 10 > 12 * total, integer-exact on milli-quantities).

Q20_PREFIX = "small "
Q20_LO, Q20_HI = "1996-01-01", "1998-01-01"
Q20_NUM = 12  # threshold = (Q20_NUM / 10) x mean per-supplier quantity


def q_excess_suppliers(sf_dir: str) -> ray.data.Dataset:
    """Distributed shape: broadcast partkey->name-prefix mask -> stateless
    date+prefix filtered per-block combiner -> bucketed per-supplier sum
    (supplier-dimension-sized) -> aggregate-of-aggregates scalar (mean via
    total+count) -> exact HAVING -> broadcast name decode."""
    part = pq.read_table(table_path(sf_dir, "part"),
                         columns=["p_partkey", "p_name"])
    pk = part["p_partkey"].to_numpy().astype(np.int64)
    import pyarrow.compute as pc

    is_pref = pc.starts_with(part["p_name"], Q20_PREFIX).to_numpy(
        zero_copy_only=False)
    mask = np.zeros(int(pk.max()) + 2, dtype=bool)
    mask[pk] = is_pref
    ref = ray.put(mask)
    lo, hi = _us(Q20_LO), _us(Q20_HI)

    class Partial:
        def __init__(self):
            self.mask = ray.get(ref)

        def __call__(self, b: pa.Table) -> pa.Table:
            ship = b["l_shipdate"].cast(pa.int64()).to_numpy(
                zero_copy_only=False)
            m = (ship >= lo) & (ship < hi)
            pkk = b["l_partkey"].to_numpy(zero_copy_only=False)
            nmask = self.mask.shape[0]
            safe = np.where((pkk >= 0) & (pkk < nmask), pkk, nmask - 1)
            m &= self.mask[safe]
            sk = b["l_suppkey"].to_numpy(zero_copy_only=False)[m]
            qty = b["l_quantity"].to_numpy(zero_copy_only=False)[m]
            qmilli = np.floor(qty * 1000.0 + 0.5).astype(np.int64)
            u, inv = np.unique(sk, return_inverse=True)
            sums = np.zeros(u.shape[0], dtype=np.int64)
            np.add.at(sums, inv, qmilli)
            return pa.table({"s_suppkey": pa.array(u.astype(np.int64)),
                             "qmilli": pa.array(sums)})

    li = _read(sf_dir, "lineitem",
               ["l_partkey", "l_suppkey", "l_quantity", "l_shipdate"])
    per_supp = bucketed_sum(
        li.map_batches(cached_stage(Partial, f"q20:{ref.hex()}"),
                       batch_format="pyarrow", batch_size=65536),
        "s_suppkey", "qmilli").materialize()  # supplier-dimension-sized
    n = per_supp.count()
    if not n:
        return ray.data.from_pandas(_typed_empty(
            {"s_suppkey": np.int64, "s_name": object, "qmilli": np.int64}))
    tot = int(per_supp.sum("qmilli"))

    # shared dense key->name decode (None-sentinel last slot; out-of-dim
    # suppkeys clamp to it and are DROPPED, matching the oracle's inner
    # join); broadcast once (ray.put), not per task via closure capture
    names = dense_str_decode(sf_dir, "supplier", "s_suppkey", "s_name")
    names_ref = ray.put(names)

    class Having:
        def __init__(self):
            self.names = ray.get(names_ref)

        def __call__(self, b: pa.Table) -> pa.Table:
            q = b["qmilli"].to_numpy(zero_copy_only=False)
            keep = _exact_mul_gt(q, 10 * n, Q20_NUM * tot)
            t = b.filter(pa.array(keep))
            sk = t["s_suppkey"].to_numpy(zero_copy_only=False)
            hi = self.names.shape[0]
            safe = np.where((sk >= 0) & (sk < hi), sk, hi - 1)
            name = self.names[safe]
            in_dim = pa.array([x is not None for x in name])
            return pa.table({
                "s_suppkey": t["s_suppkey"].filter(in_dim),
                "s_name": pa.array(
                    [x for x in name if x is not None], pa.string()),
                "qmilli": t["qmilli"].filter(in_dim),
            })

    return per_supp.map_batches(
        cached_stage(Having, f"q20h:{names_ref.hex()}:{n}:{tot}"),
        batch_format="pyarrow")


SQL_EXCESS_SUPPLIERS = f"""
WITH q AS (
  SELECT l.l_suppkey AS s_suppkey,
         CAST(SUM(CAST(floor(l.l_quantity * 1000.0 + 0.5) AS BIGINT))
              AS BIGINT) AS qmilli
  FROM lineitem l JOIN part p ON l.l_partkey = p.p_partkey
  WHERE p.p_name LIKE '{Q20_PREFIX}%'
    AND epoch_us(l.l_shipdate) >= {_us(Q20_LO)}
    AND epoch_us(l.l_shipdate) < {_us(Q20_HI)}
  GROUP BY 1
)
SELECT q.s_suppkey, s.s_name, q.qmilli
FROM q JOIN supplier s ON q.s_suppkey = s.s_suppkey,
     (SELECT SUM(qmilli) AS tot, COUNT(*) AS n FROM q) t
WHERE q.qmilli * t.n * 10 > {Q20_NUM} * t.tot
""".strip()


# --- Q2: minimum-balance supplier ----------------------------------------------
#
# Original Q2 ("minimum cost supplier"): per qualifying part, the region's
# supplier with MIN ps_supplycost.  Analog: per part of one size band and
# type, among the region's suppliers that ever shipped it (distinct
# lineitem pairs), the one with MIN account balance; ties break to the
# smaller suppkey — deterministic on both sides.

Q2_REGION = 3
Q2_MIN_SIZE = 25
Q2_TYPE = "ECONOMY"


def q_min_bal_supplier(sf_dir: str) -> ray.data.Dataset:
    """Distributed shape: broadcast part-predicate + supplier (region mask,
    balance cents) dense arrays -> per-block DISTINCT-pair + per-part
    argmin combiner (sort_values + drop_duplicates, both vectorized) ->
    bucketed per-part argmin merge (min-of-mins composes) -> broadcast
    name decode.  The shuffle moves <= one row per (block, part)."""
    part = pq.read_table(
        table_path(sf_dir, "part"), columns=["p_partkey", "p_size", "p_type"])
    import pyarrow.compute as pc

    pk = part["p_partkey"].to_numpy().astype(np.int64)
    pmask_vals = (pc.and_(
        pc.greater_equal(part["p_size"], Q2_MIN_SIZE),
        pc.equal(part["p_type"], Q2_TYPE)).to_numpy(zero_copy_only=False))
    pmask = np.zeros(int(pk.max()) + 2, dtype=bool)
    pmask[pk] = pmask_vals

    smask = _supplier_region_mask(sf_dir, Q2_REGION)
    sup = pq.read_table(table_path(sf_dir, "supplier"),
                        columns=["s_suppkey", "s_acctbal", "s_name"])
    sk = sup["s_suppkey"].to_numpy().astype(np.int64)
    bal = _dense_lookup(sk, cents(sup["s_acctbal"].to_numpy()), np.int64(0))
    names = np.empty(int(sk.max()) + 2, dtype=object)
    names[sk] = sup["s_name"].to_pylist()
    ref = ray.put((pmask, smask, bal))

    def argmin_per_part(df: pd.DataFrame) -> pd.DataFrame:
        d = df.sort_values(["p_partkey", "bal_cents", "s_suppkey"],
                           kind="mergesort")
        return d.drop_duplicates("p_partkey", keep="first")

    class Partial:
        def __init__(self):
            self.pmask, self.smask, self.bal = ray.get(ref)

        def __call__(self, b: pa.Table) -> pa.Table:
            pkk = b["l_partkey"].to_numpy(zero_copy_only=False)
            skk = b["l_suppkey"].to_numpy(zero_copy_only=False)
            hp, hs = self.pmask.shape[0], self.smask.shape[0]
            m = ((pkk >= 0) & (pkk < hp) & (skk >= 0) & (skk < hs))
            m[m] = self.pmask[pkk[m]] & self.smask[skk[m]]
            df = pd.DataFrame({"p_partkey": pkk[m], "s_suppkey": skk[m]})
            df = df.drop_duplicates()
            df["bal_cents"] = self.bal[df["s_suppkey"].to_numpy()]
            out = argmin_per_part(df)
            return pa.Table.from_pandas(out, preserve_index=False)

    li = _read(sf_dir, "lineitem", ["l_partkey", "l_suppkey"])
    partials = li.map_batches(cached_stage(Partial, f"q2:{ref.hex()}"),
                              batch_format="pyarrow", batch_size=65536)
    winners = bucketed_group_apply(partials, ["p_partkey"], argmin_per_part)

    names_ref = ray.put(names)  # broadcast once, not per task

    class Decode:
        def __init__(self):
            self.names = ray.get(names_ref)

        def __call__(self, b: pa.Table) -> pa.Table:
            skk = b["s_suppkey"].to_numpy(zero_copy_only=False)
            return b.append_column(
                "s_name", pa.array(list(self.names[skk]), pa.string()))

    return winners.map_batches(
        cached_stage(Decode, f"q2d:{names_ref.hex()}"),
        batch_format="pyarrow")


SQL_MIN_BAL_SUPPLIER = f"""
WITH pairs AS (SELECT DISTINCT l_partkey, l_suppkey FROM lineitem),
cand AS (
  SELECT pr.l_partkey AS p_partkey, pr.l_suppkey AS s_suppkey,
         CAST(floor(s.s_acctbal * 100.0 + 0.5) AS BIGINT) AS bal_cents,
         s.s_name
  FROM pairs pr
  JOIN supplier s ON pr.l_suppkey = s.s_suppkey
  JOIN nation n ON s.s_nationkey = n.n_nationkey
  JOIN part p ON pr.l_partkey = p.p_partkey
  WHERE n.n_regionkey = {Q2_REGION} AND p.p_size >= {Q2_MIN_SIZE}
    AND p.p_type = '{Q2_TYPE}'
)
SELECT p_partkey, s_suppkey, bal_cents, s_name FROM (
  SELECT *, ROW_NUMBER() OVER (PARTITION BY p_partkey
                               ORDER BY bal_cents, s_suppkey) AS rn
  FROM cand
) WHERE rn = 1
""".strip()


# --- set-operation + window-ratio breadth --------------------------------------

RB_Y1_LO, RB_Y1_HI = "1996-01-01", "1997-01-01"
RB_Y2_LO, RB_Y2_HI = "1997-01-01", "1998-01-01"


def q_repeat_buyers(sf_dir: str) -> ray.data.Dataset:
    """INTERSECT re-expressed as one conditional aggregate: customers with
    orders in BOTH years, with each year's order count.  A literal
    INTERSECT would scan twice and exchange twice; the conditional-count
    combiner does it in one pass and one customer-dimension shuffle —
    per-block (custkey, n_y1, n_y2) partials -> bucketed sum -> both-positive
    filter."""
    lo1, hi1 = _us(RB_Y1_LO), _us(RB_Y1_HI)
    lo2, hi2 = _us(RB_Y2_LO), _us(RB_Y2_HI)
    orders = _read(sf_dir, "orders", ["o_custkey", "o_orderdate"])

    def partial(b: pa.Table) -> pa.Table:
        od = b["o_orderdate"].cast(pa.int64()).to_numpy(zero_copy_only=False)
        ck = b["o_custkey"].to_numpy(zero_copy_only=False)
        in1 = (od >= lo1) & (od < hi1)
        in2 = (od >= lo2) & (od < hi2)
        m = in1 | in2
        u, inv = np.unique(ck[m], return_inverse=True)
        n1 = np.zeros(u.shape[0], np.int64)
        n2 = np.zeros(u.shape[0], np.int64)
        np.add.at(n1, inv, in1[m].astype(np.int64))
        np.add.at(n2, inv, in2[m].astype(np.int64))
        return pa.table({"c_custkey": pa.array(u.astype(np.int64)),
                         "n_y1": pa.array(n1), "n_y2": pa.array(n2)})

    def sum_then_having(g: pd.DataFrame) -> pd.DataFrame:
        # one bucketed exchange: finish the sums and apply the HAVING
        # in-bucket (the native groupby().aggregate paid per-group cost at
        # customer cardinality — measured 2.9 s vs 0.6 s at sf0.1)
        c = g.groupby("c_custkey", as_index=False)[["n_y1", "n_y2"]].sum()
        return c[(c["n_y1"] > 0) & (c["n_y2"] > 0)]

    partials = orders.map_batches(partial, batch_format="pyarrow",
                                  batch_size=65536)
    return bucketed_group_apply(partials, ["c_custkey"], sum_then_having)


SQL_REPEAT_BUYERS = f"""
SELECT o_custkey AS c_custkey,
       CAST(SUM(CASE WHEN epoch_us(o_orderdate) >= {_us(RB_Y1_LO)}
                      AND epoch_us(o_orderdate) < {_us(RB_Y1_HI)}
                     THEN 1 ELSE 0 END) AS BIGINT) AS n_y1,
       CAST(SUM(CASE WHEN epoch_us(o_orderdate) >= {_us(RB_Y2_LO)}
                      AND epoch_us(o_orderdate) < {_us(RB_Y2_HI)}
                     THEN 1 ELSE 0 END) AS BIGINT) AS n_y2
FROM orders
WHERE (epoch_us(o_orderdate) >= {_us(RB_Y1_LO)}
       AND epoch_us(o_orderdate) < {_us(RB_Y1_HI)})
   OR (epoch_us(o_orderdate) >= {_us(RB_Y2_LO)}
       AND epoch_us(o_orderdate) < {_us(RB_Y2_HI)})
GROUP BY 1
HAVING SUM(CASE WHEN epoch_us(o_orderdate) >= {_us(RB_Y1_LO)}
                 AND epoch_us(o_orderdate) < {_us(RB_Y1_HI)}
                THEN 1 ELSE 0 END) > 0
   AND SUM(CASE WHEN epoch_us(o_orderdate) >= {_us(RB_Y2_LO)}
                 AND epoch_us(o_orderdate) < {_us(RB_Y2_HI)}
                THEN 1 ELSE 0 END) > 0
""".strip()


def q_order_share(sf_dir: str) -> ray.data.Dataset:
    """Each order's share of its customer's lifetime spend — the
    ``SUM() OVER (PARTITION BY ...)`` window without ORDER BY — emitted as
    the exact integer pair (price_cents, cust_total_cents): no float
    division anywhere, and the pair is sufficient for any downstream
    ratio.  One bucketed exchange co-locates a customer's orders; the
    whole-bucket work is a vectorized groupby-sum broadcast back onto the
    rows by segment id."""
    orders = _read(sf_dir, "orders",
                   ["o_orderkey", "o_custkey", "o_totalprice"])

    def prep(b: pa.Table) -> pa.Table:
        return pa.table({
            "o_orderkey": b["o_orderkey"],
            "o_custkey": b["o_custkey"],
            "price_cents": pa.array(
                cents(b["o_totalprice"].to_numpy(zero_copy_only=False))),
        })

    def fn(g: pd.DataFrame) -> pd.DataFrame:
        from ..stages.windows import _segment_starts

        d = g.sort_values("o_custkey", kind="mergesort")
        k = d["o_custkey"].to_numpy()
        v = d["price_cents"].to_numpy()
        new = _segment_starts(k)
        seg_id = np.cumsum(new) - 1
        totals = np.zeros(int(seg_id[-1]) + 1 if k.shape[0] else 0, np.int64)
        np.add.at(totals, seg_id, v)
        out = d[["o_orderkey", "price_cents"]].copy()
        out["cust_total_cents"] = totals[seg_id]
        return out

    return bucketed_group_apply(
        orders.map_batches(prep, batch_format="pyarrow"),
        ["o_custkey"], fn)


SQL_ORDER_SHARE = """
SELECT o_orderkey,
       CAST(floor(o_totalprice * 100.0 + 0.5) AS BIGINT) AS price_cents,
       CAST(SUM(CAST(floor(o_totalprice * 100.0 + 0.5) AS BIGINT))
            OVER (PARTITION BY o_custkey) AS BIGINT) AS cust_total_cents
FROM orders
""".strip()


# --- market-basket co-occurrence: supplier pairs sharing orders --------------

COOCCUR_TOPK = 20


def q_supplier_cooccurrence(sf_dir: str) -> ray.data.Dataset:
    """Top-``COOCCUR_TOPK`` supplier pairs by co-occurrence support (the
    number of orders both supplied) — association mining over the fact
    table, the relational twin of the text family's token_cooccurrence.

    Ray shape: per-block DISTINCT (order, supplier) combiner -> ONE
    co-partitioning exchange on l_orderkey (``bucketed_group_apply``)
    generating per-order pairs with the LSH machinery's vectorized
    ``grouped_pairs`` (expansion bounded by order size: <= C(7,2) rows
    per order) -> pair-dimension ``combined_groupby_sum`` -> global
    top-k without a global sort (per-block partial top-k + one k-row
    merge).  Ties break on (s_a, s_b) on both sides."""
    from ..stages.grouping import grouped_pairs
    from .relational import combined_groupby_sum, global_topk

    li = _read(sf_dir, "lineitem", ["l_orderkey", "l_suppkey"])

    def prep(b: pa.Table) -> pa.Table:
        df = pd.DataFrame({
            "ok": b["l_orderkey"].to_numpy(zero_copy_only=False),
            "s": b["l_suppkey"].to_numpy(zero_copy_only=False),
        }).drop_duplicates()
        return pa.Table.from_pandas(df, preserve_index=False)

    def pairs_fn(g: pd.DataFrame) -> pd.DataFrame:
        return grouped_pairs(g, ["ok"], "s", "s_a", "s_b")

    prepped = li.map_batches(prep, batch_format="pyarrow",
                             batch_size=65536)
    pairs = bucketed_group_apply(prepped, ["ok"], pairs_fn)
    counts = combined_groupby_sum(pairs, ["s_a", "s_b"], [],
                                  count_alias="support")
    return global_topk(counts, ["support", "s_a", "s_b"],
                       [False, True, True], COOCCUR_TOPK)


SQL_SUPPLIER_COOCCURRENCE = f"""
WITH ds AS (SELECT DISTINCT l_orderkey AS ok, l_suppkey AS s FROM lineitem),
pairs AS (SELECT a.s AS s_a, b.s AS s_b, CAST(COUNT(*) AS BIGINT) AS support
          FROM ds a JOIN ds b ON a.ok = b.ok AND a.s < b.s
          GROUP BY 1, 2)
SELECT s_a, s_b, support,
       row_number() OVER (ORDER BY support DESC, s_a, s_b) AS rank
FROM pairs ORDER BY support DESC, s_a, s_b LIMIT {COOCCUR_TOPK}
""".strip()


# --- Pareto frontier (2-D skyline): cheapest-earliest distinct points --------


def _skyline_2d(df: pd.DataFrame) -> pd.DataFrame:
    """Exact 2-D skyline (minimize price_cents AND day) over DISTINCT
    points: sort by (price, day), keep rows whose day is strictly below
    the running min of all preceding days — the O(n log n) sweep that the
    window-SQL oracle mirrors clause for clause."""
    d = df.sort_values(["price_cents", "day"], kind="mergesort")
    day = d["day"].to_numpy()
    best = np.empty(day.shape[0], np.int64)
    if day.shape[0]:
        best[0] = np.iinfo(np.int64).max  # no predecessor
        np.minimum.accumulate(day[:-1], out=best[1:])
    return d[day < best]


def q_pareto_orders(sf_dir: str) -> ray.data.Dataset:
    """The (price, date) Pareto frontier of all orders — skyline /
    dominance analysis: every DISTINCT (price_cents, day) point no other
    point beats on both axes, with its order multiplicity.  The classic
    distributed-skyline shape:

    1. per-block DISTINCT-point combiner (count per (price, day));
    2. per-block LOCAL skyline — dominated points never leave the block,
       so the consolidation input is sum-of-local-skylines-sized
       (expected O(log block) points per block on independent axes;
       worst case anti-correlated data degrades to the distinct-point
       count — the documented contract);
    3. one driver fold: skyline-of-skylines + a multiplicity re-sum
       (local counts of a surviving point sum exactly; points pruned
       locally are dominated globally too, so no count is lost from
       frontier points).

    The survivors-only exchange makes this the cheapest wide step in the
    registry: only candidate frontier points ever move."""
    ev = _read(sf_dir, "orders", ["o_totalprice", "o_orderdate"])
    from .relational import DAY_US

    def local(b: pa.Table) -> pa.Table:
        price = cents(b["o_totalprice"].to_numpy(zero_copy_only=False))
        day = (b["o_orderdate"].cast(pa.int64())
               .to_numpy(zero_copy_only=False) // DAY_US)
        pts = pd.DataFrame({"price_cents": price, "day": day}) \
            .groupby(["price_cents", "day"], as_index=False).size() \
            .rename(columns={"size": "n_orders"})
        pts["n_orders"] = pts["n_orders"].astype(np.int64)
        return pa.Table.from_pandas(_skyline_2d(pts), preserve_index=False)

    locals_ = ev.map_batches(local, batch_format="pyarrow",
                             batch_size=65536).to_pandas()
    # driver fold over survivors only: re-sum multiplicities of points
    # that appear in several blocks, then the final sweep
    merged = locals_.groupby(["price_cents", "day"], as_index=False) \
        ["n_orders"].sum()
    merged["n_orders"] = merged["n_orders"].astype(np.int64)
    out = _skyline_2d(merged).reset_index(drop=True)
    return ray.data.from_arrow(pa.Table.from_pandas(out,
                                                    preserve_index=False))


SQL_PARETO_ORDERS = f"""
WITH c AS (SELECT CAST(floor(o_totalprice * 100.0 + 0.5) AS BIGINT)
                    AS price_cents,
                  epoch_us(o_orderdate) // 86400000000 AS day
           FROM orders),
pts AS (SELECT price_cents, day, CAST(COUNT(*) AS BIGINT) AS n_orders
        FROM c GROUP BY 1, 2),
s AS (SELECT *, MIN(day) OVER (ORDER BY price_cents, day
                               ROWS BETWEEN UNBOUNDED PRECEDING
                               AND 1 PRECEDING) AS best
      FROM pts)
SELECT price_cents, day, n_orders FROM s
WHERE best IS NULL OR day < best
""".strip()


# --- association-rule lift over supplier co-occurrence -----------------------

LIFT_TOPK = 20
LIFT_SCALE = 1_000_000
LIFT_MIN_SUPPORT = 3  # pairs below this are noise (and keep output stable)


def q_cooccurrence_lift(sf_dir: str) -> ray.data.Dataset:
    """Top-``LIFT_TOPK`` supplier pairs by association LIFT, exact in
    integer ppm: ``lift = P(ab) / (P(a)P(b)) = support_ab * n_orders /
    (support_a * support_b)``, floored to ppm so both sides rank on the
    identical integer — the rule-mining metric layer over
    supplier_cooccurrence's raw support (pairs above
    ``LIFT_MIN_SUPPORT`` only).

    Ray shape: the pair counts reuse the bucketed ``grouped_pairs``
    exchange; per-supplier supports are supplier-dimension-sized and
    broadcast once via ``ray.put`` into the vectorized lift stamping;
    the final selection is the shared global top-k.  Products stay
    inside int64: support_ab <= n_orders ~ 1.5e6 at sf1, n_orders *
    support_ab * SCALE needs the py-int driver guard only past ~1e12
    orders (documented in value_trend's pattern)."""
    import ray as _ray

    from ..sources.pages import cached_get
    from ..stages.grouping import bucketed_group_apply, grouped_pairs
    from .relational import combined_groupby_sum, global_topk

    li = _read(sf_dir, "lineitem", ["l_orderkey", "l_suppkey"])

    def prep(b: pa.Table) -> pa.Table:
        df = pd.DataFrame({
            "ok": b["l_orderkey"].to_numpy(zero_copy_only=False),
            "s": b["l_suppkey"].to_numpy(zero_copy_only=False),
        }).drop_duplicates()
        return pa.Table.from_pandas(df, preserve_index=False)

    prepped = li.map_batches(prep, batch_format="pyarrow",
                             batch_size=65536).materialize()

    # supplier-dimension support + the order count (both tiny)
    def s_partial(b: pa.Table) -> pa.Table:
        df = pd.DataFrame({"s": b["s"].to_numpy(zero_copy_only=False)})
        g = df.groupby("s", as_index=False).size() \
            .rename(columns={"size": "n"})
        g["n"] = g["n"].astype(np.int64)
        return pa.Table.from_pandas(g, preserve_index=False)

    # prepped is block-distinct only; (ok, s) may repeat across blocks.
    # count distinct orders per supplier exactly: one (s, ok)-bucketed
    # distinct, then a supplier fold (both bounded)
    pair_distinct = combined_groupby_sum(prepped, ["s", "ok"], [],
                                         count_alias="__c",
                                         bucketed=True) \
        .select_columns(["s", "ok"])
    supports = combined_groupby_sum(
        pair_distinct.map_batches(s_partial, batch_format="pyarrow",
                                  batch_size=65536),
        ["s"], ["n"]).to_pandas()
    n_orders = int(combined_groupby_sum(
        prepped.select_columns(["ok"]), ["ok"], [], count_alias="__c",
        bucketed=True).count())
    sup_ref = _ray.put(dict(zip(supports["s"], supports["n"])))

    def pairs_fn(g: pd.DataFrame) -> pd.DataFrame:
        return grouped_pairs(g, ["ok"], "s", "s_a", "s_b")

    pairs = bucketed_group_apply(prepped, ["ok"], pairs_fn)
    counts = combined_groupby_sum(pairs, ["s_a", "s_b"], [],
                                  count_alias="support")

    def stamp(b: pa.Table) -> pa.Table:
        import pyarrow.compute as pc
        t = b.filter(pc.greater_equal(b["support"],
                                      LIFT_MIN_SUPPORT))
        sup = cached_get(sup_ref)
        a = t["s_a"].to_numpy(zero_copy_only=False)
        bb = t["s_b"].to_numpy(zero_copy_only=False)
        ab = t["support"].to_numpy(zero_copy_only=False)
        ca, cats_a = pd.factorize(pd.Series(a))
        na = np.array([sup[x] for x in cats_a], np.int64)[ca]
        cb, cats_b = pd.factorize(pd.Series(bb))
        nb = np.array([sup[x] for x in cats_b], np.int64)[cb]
        lift_ppm = ab * np.int64(n_orders) * np.int64(LIFT_SCALE) \
            // (na * nb)
        return pa.table({"s_a": t["s_a"], "s_b": t["s_b"],
                         "support": t["support"],
                         "lift_ppm": pa.array(lift_ppm.astype(np.int64))})

    stamped = counts.map_batches(stamp, batch_format="pyarrow",
                                 batch_size=65536)
    return global_topk(stamped, ["lift_ppm", "s_a", "s_b"],
                       [False, True, True], LIFT_TOPK)


SQL_COOCCURRENCE_LIFT = f"""
WITH ds AS (SELECT DISTINCT l_orderkey AS ok, l_suppkey AS s FROM lineitem),
no AS (SELECT CAST(COUNT(DISTINCT ok) AS BIGINT) AS n FROM ds),
sup AS (SELECT s, CAST(COUNT(*) AS BIGINT) AS n FROM ds GROUP BY s),
pairs AS (SELECT a.s AS s_a, b.s AS s_b,
                 CAST(COUNT(*) AS BIGINT) AS support
          FROM ds a JOIN ds b ON a.ok = b.ok AND a.s < b.s
          GROUP BY 1, 2
          HAVING COUNT(*) >= {LIFT_MIN_SUPPORT}),
l AS (SELECT p.s_a, p.s_b, p.support,
             CAST(p.support * no.n * {LIFT_SCALE}
                  // (sa.n * sb.n) AS BIGINT) AS lift_ppm
      FROM pairs p, no
      JOIN sup sa ON sa.s = p.s_a
      JOIN sup sb ON sb.s = p.s_b)
SELECT s_a, s_b, support, lift_ppm,
       row_number() OVER (ORDER BY lift_ppm DESC, s_a, s_b) AS rank
FROM l ORDER BY lift_ppm DESC, s_a, s_b LIMIT {LIFT_TOPK}
""".strip()
