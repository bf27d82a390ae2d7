"""Round-3 relational breadth: the remaining classic TPC-H shapes that fit
this data model (no partsupp / shipmode columns exist, so Q9/Q12/Q21 are
re-expressed over the columns we have) plus event-table pivot / attribution
/ cube shapes.

The reference has no relational surface (its "tables" are tiny parameter
dicts, ``/root/reference/orthority/param_io.py:56-64``); these are graft
breadth over the driver's TPC-H-ish tables:

- Q21 waiting suppliers : double-EXISTS re-expressed as one per-order
                          distinct/distinct-late supplier analysis
- Q12 late shipments    : large-large join + conditional 2-way counts
- Q9  nation profit     : two dims broadcast, zero-shuffle profit rollup
- event_pivot           : long->wide conditional aggregation (5 columns)
- first_touch           : per-user argmin attribution (mergeable first)
- events_cube           : CUBE(event_type, year) from a dimension-sized base

Exactness follows the repo contract (relational.py): money is integer cents
per row via ``floor(x*100+0.5)`` on both sides, dates compare as epoch
microseconds, every aggregate is int64.
"""

from __future__ import annotations

import numpy as np
import pandas as pd
import pyarrow as pa
import pyarrow.compute as pc
import pyarrow.parquet as pq
import ray
import ray.data

from ..core.config import cached_stage, table_path
from ..stages.grouping import bucketed_group_apply
from ..stages.hashjoin import hash_join
from .relational import _read, cents, combined_groupby_sum
from .relational import DAY_US
from .tpch_extra import year_of_us



# --- Q21: waiting suppliers ---------------------------------------------------
#
# Original Q21 ("suppliers who kept orders waiting"): for finished orders
# with >= 2 distinct suppliers where EXACTLY ONE supplier shipped late,
# count such orders per (late) supplier of one nation.  The classic
# EXISTS / NOT EXISTS pair over the same order collapses into one
# per-order analysis: nsupp > 1 AND nlate == 1.  "Late" here is
# l_shipdate > o_orderdate + 60 days (this schema has no
# receipt/commit dates).

Q21_NATION = 7
Q21_LATE_DAYS = 60


def q_waiting_suppliers(sf_dir: str) -> pd.DataFrame:
    """Distributed shape: status-filtered orders ⋈ lineitem (bucketed hash
    join on orderkey) -> per-order distinct/late-supplier analysis with ALL
    rows of an order co-located in one bucket (bucketed_group_apply, the
    whole-bucket work is three vectorized pandas groupbys) -> per-bucket
    partial counts per supplier -> dimension-sized final sum -> broadcast
    name decode + nation filter.  No step materializes more than
    (buckets x suppliers) rows outside the bucketed exchange."""
    orders = _read(sf_dir, "orders", ["o_orderkey", "o_orderdate",
                                      "o_orderstatus"])

    def ord_prep(b: pa.Table) -> pa.Table:
        m = pc.equal(b["o_orderstatus"], "F")
        t = b.filter(m)
        return pa.table({
            "l_orderkey": t["o_orderkey"],
            "odate_us": t["o_orderdate"].cast(pa.int64()),
        })

    li = _read(sf_dir, "lineitem", ["l_orderkey", "l_suppkey", "l_shipdate"])

    def li_prep(b: pa.Table) -> pa.Table:
        return pa.table({
            "l_orderkey": b["l_orderkey"],
            "l_suppkey": b["l_suppkey"],
            "ship_us": b["l_shipdate"].cast(pa.int64()),
        })

    joined = hash_join(
        li.map_batches(li_prep, batch_format="pyarrow"),
        orders.map_batches(ord_prep, batch_format="pyarrow"),
        "l_orderkey",
        ["l_orderkey", "l_suppkey", "ship_us"], ["l_orderkey", "odate_us"],
        types={"odate_us": pa.int64()},
    )

    late_us = Q21_LATE_DAYS * DAY_US

    def per_order(g: pd.DataFrame) -> pd.DataFrame:
        # one bucket = whole orders; vectorized across all of them
        late = g["ship_us"].to_numpy() > g["odate_us"].to_numpy() + late_us
        pairs = g[["l_orderkey", "l_suppkey"]].drop_duplicates()
        nsupp = pairs.groupby("l_orderkey").size()
        lpairs = g.loc[late, ["l_orderkey", "l_suppkey"]].drop_duplicates()
        nlate = lpairs.groupby("l_orderkey").size()
        sole = lpairs.groupby("l_orderkey", as_index=True)["l_suppkey"].max()
        ok = nlate.index[(nlate == 1)
                         & (nsupp.reindex(nlate.index, fill_value=0) > 1)]
        win = sole.loc[ok]
        out = win.value_counts().rename_axis("s_suppkey").reset_index(
            name="numwait")
        out["numwait"] = out["numwait"].astype(np.int64)
        return out

    partials = bucketed_group_apply(joined, ["l_orderkey"], per_order)
    per_supp = combined_groupby_sum(partials, ["s_suppkey"], ["numwait"])

    sup = pq.read_table(table_path(sf_dir, "supplier"),
                        columns=["s_suppkey", "s_name", "s_nationkey"])
    keys = sup["s_suppkey"].to_numpy()
    names = sup["s_name"].to_pylist()
    nat = sup["s_nationkey"].to_numpy().astype(np.int64)
    name_of = np.empty(int(keys.max()) + 2, dtype=object)
    name_of[keys] = names
    nat_of = np.full(int(keys.max()) + 2, -1, dtype=np.int64)
    nat_of[keys] = nat
    ref = ray.put((name_of, nat_of))

    class Decode:
        def __init__(self):
            self.name_of, self.nat_of = ray.get(ref)

        def __call__(self, b: pa.Table) -> pa.Table:
            sk = b["s_suppkey"].to_numpy(zero_copy_only=False)
            hi = self.nat_of.shape[0]
            safe = np.where((sk >= 0) & (sk < hi), sk, hi - 1)
            keep = self.nat_of[safe] == Q21_NATION
            sk = safe[keep]
            return pa.table({
                "s_name": pa.array(list(self.name_of[sk]), pa.string()),
                "numwait": b["numwait"].filter(pa.array(keep)),
            })

    out = per_supp.map_batches(cached_stage(Decode, f"q21:{ref.hex()}"),
                               batch_format="pyarrow").to_pandas()
    if not len(out.columns):
        # an all-empty aggregate loses its schema; the result is
        # dimension-sized (<= suppliers of one nation) so a typed empty
        # frame keeps the driver contract at any scale
        out = pd.DataFrame({"s_name": pd.Series([], dtype=object),
                            "numwait": pd.Series([], dtype=np.int64)})
    return out


SQL_WAITING_SUPPLIERS = f"""
WITH li AS (
  SELECT l.l_orderkey, l.l_suppkey,
         (epoch_us(l.l_shipdate) > epoch_us(o.o_orderdate)
          + {Q21_LATE_DAYS * DAY_US}) AS late
  FROM lineitem l JOIN orders o ON l.l_orderkey = o.o_orderkey
  WHERE o.o_orderstatus = 'F'
), per_ord AS (
  SELECT l_orderkey,
         COUNT(DISTINCT l_suppkey) AS nsupp,
         COUNT(DISTINCT CASE WHEN late THEN l_suppkey END) AS nlate,
         MAX(CASE WHEN late THEN l_suppkey END) AS late_supp
  FROM li GROUP BY 1
)
SELECT s.s_name AS s_name, CAST(COUNT(*) AS BIGINT) AS numwait
FROM per_ord p JOIN supplier s ON p.late_supp = s.s_suppkey
WHERE p.nsupp > 1 AND p.nlate = 1 AND s.s_nationkey = {Q21_NATION}
GROUP BY 1
""".strip()


# --- Q12: late shipments by priority ------------------------------------------

Q12_LATE_DAYS = 90
_HIGH = ("1-URGENT", "2-HIGH")


def q_late_shipments(sf_dir: str) -> ray.data.Dataset:
    """TPC-H Q12 analog (no l_shipmode column exists; the "mode" axis is
    the ship YEAR): among lineitems shipped more than 90 days after their
    order date, count high-priority (URGENT/HIGH) vs other orders per ship
    year.  Shape: one bucketed hash join (lineitem ⋈ orders on orderkey,
    the priority collapsed to one int64 on the build side) -> vectorized
    lateness filter -> per-block combiner -> dimension-sized rollup."""
    orders = _read(sf_dir, "orders", ["o_orderkey", "o_orderdate",
                                      "o_orderpriority"])

    def ord_prep(b: pa.Table) -> pa.Table:
        pr = b["o_orderpriority"]
        high = pc.or_(pc.equal(pr, _HIGH[0]),
                              pc.equal(pr, _HIGH[1]))
        return pa.table({
            "l_orderkey": b["o_orderkey"],
            "odate_us": b["o_orderdate"].cast(pa.int64()),
            "high": high.cast(pa.int64()),
        })

    li = _read(sf_dir, "lineitem", ["l_orderkey", "l_shipdate"])

    def li_prep(b: pa.Table) -> pa.Table:
        return pa.table({
            "l_orderkey": b["l_orderkey"],
            "ship_us": b["l_shipdate"].cast(pa.int64()),
        })

    joined = hash_join(
        li.map_batches(li_prep, batch_format="pyarrow"),
        orders.map_batches(ord_prep, batch_format="pyarrow"),
        "l_orderkey",
        ["l_orderkey", "ship_us"], ["l_orderkey", "odate_us", "high"],
        types={"odate_us": pa.int64(), "high": pa.int64()},
    )

    late_us = Q12_LATE_DAYS * DAY_US

    def prep(b: pa.Table) -> pa.Table:
        ship = b["ship_us"].to_numpy(zero_copy_only=False)
        m = ship > b["odate_us"].to_numpy(zero_copy_only=False) + late_us
        ship = ship[m]
        high = b["high"].to_numpy(zero_copy_only=False)[m]
        yr = year_of_us(ship)
        return pa.table({
            "yr": pa.array(yr),
            "high_line_count": pa.array(high),
            "low_line_count": pa.array(1 - high),
        })

    return combined_groupby_sum(
        joined.map_batches(prep, batch_format="pyarrow"),
        ["yr"], ["high_line_count", "low_line_count"])


SQL_LATE_SHIPMENTS = f"""
SELECT CAST(year(l.l_shipdate) AS BIGINT) AS yr,
       CAST(SUM(CASE WHEN o.o_orderpriority IN ('1-URGENT', '2-HIGH')
                THEN 1 ELSE 0 END) AS BIGINT) AS high_line_count,
       CAST(SUM(CASE WHEN o.o_orderpriority IN ('1-URGENT', '2-HIGH')
                THEN 0 ELSE 1 END) AS BIGINT) AS low_line_count
FROM lineitem l JOIN orders o ON l.l_orderkey = o.o_orderkey
WHERE epoch_us(l.l_shipdate) > epoch_us(o.o_orderdate) + {Q12_LATE_DAYS * DAY_US}
GROUP BY 1
""".strip()


# --- Q9: nation profit ---------------------------------------------------------

Q9_TYPE = "STANDARD"


def q_nation_profit(sf_dir: str) -> ray.data.Dataset:
    """TPC-H Q9 analog (no partsupp table exists; the part's retail price
    stands in for supply cost): per (supplier nation, ship year), profit =
    revenue cents - retail cents x quantity over parts of one type.  Shape:
    BOTH dims broadcast as dense arrays (part -> in-set + retail cents,
    supplier -> nationkey), so the big table is one zero-shuffle scan with
    a per-block combiner into a (25 nations x years) rollup."""
    part = pq.read_table(table_path(sf_dir, "part"),
                         columns=["p_partkey", "p_type", "p_retailprice"])
    pk = part["p_partkey"].to_numpy()
    in_type = pc.equal(part["p_type"], Q9_TYPE).combine_chunks().to_numpy(zero_copy_only=False)
    retail = cents(part["p_retailprice"].to_numpy())
    sel = np.zeros(int(pk.max()) + 2, dtype=bool)
    sel[pk] = in_type
    rc = np.zeros(int(pk.max()) + 2, dtype=np.int64)
    rc[pk] = retail

    sup = pq.read_table(table_path(sf_dir, "supplier"),
                        columns=["s_suppkey", "s_nationkey"])
    sk = sup["s_suppkey"].to_numpy()
    snation = np.full(int(sk.max()) + 2, -1, dtype=np.int64)
    snation[sk] = sup["s_nationkey"].to_numpy().astype(np.int64)
    ref = ray.put((sel, rc, snation))

    class Prep:
        def __init__(self):
            self.sel, self.rc, self.snation = ray.get(ref)

        def __call__(self, b: pa.Table) -> pa.Table:
            pkey = b["l_partkey"].to_numpy(zero_copy_only=False)
            hi = self.sel.shape[0]
            safe = np.where((pkey >= 0) & (pkey < hi), pkey, hi - 1)
            m = self.sel[safe]
            skey = b["l_suppkey"].to_numpy(zero_copy_only=False)[m]
            shi = self.snation.shape[0]
            ssafe = np.where((skey >= 0) & (skey < shi), skey, shi - 1)
            nat = self.snation[ssafe]
            keep = nat >= 0  # inner-join semantics on the supplier dim
            nat = nat[keep]
            pkey = safe[m][keep]
            price = b["l_extendedprice"].to_numpy(zero_copy_only=False)[m][keep]
            disc = b["l_discount"].to_numpy(zero_copy_only=False)[m][keep]
            # floor() on BOTH sides (r3 review): a bare astype truncates
            # while SQL CAST rounds-to-nearest; floor is the repo-wide
            # quantity convention and the two agree for any input
            qty = np.floor(
                b["l_quantity"].to_numpy(zero_copy_only=False)[m][keep]
            ).astype(np.int64)
            ship = (b["l_shipdate"].cast(pa.int64())
                    .to_numpy(zero_copy_only=False)[m][keep])
            yr = year_of_us(ship)
            profit = cents(price * (1.0 - disc)) - self.rc[pkey] * qty
            return pa.table({
                "nation": pa.array(nat),
                "yr": pa.array(yr),
                "profit_cents": pa.array(profit),
            })

    li = _read(sf_dir, "lineitem",
               ["l_partkey", "l_suppkey", "l_quantity", "l_extendedprice",
                "l_discount", "l_shipdate"])
    prepped = li.map_batches(cached_stage(Prep, f"q9:{ref.hex()}"),
                             batch_format="pyarrow", batch_size=65536)
    return combined_groupby_sum(prepped, ["nation", "yr"], ["profit_cents"],
                                count_alias="n_rows")


SQL_NATION_PROFIT = f"""
SELECT CAST(s.s_nationkey AS BIGINT) AS nation,
       CAST(year(l.l_shipdate) AS BIGINT) AS yr,
       COUNT(*) AS n_rows,
       CAST(SUM(CAST(floor(l.l_extendedprice * (1.0 - l.l_discount) * 100.0 + 0.5) AS BIGINT)
                - CAST(floor(p.p_retailprice * 100.0 + 0.5) AS BIGINT)
                  * CAST(floor(l.l_quantity) AS BIGINT)) AS BIGINT) AS profit_cents
FROM lineitem l
JOIN part p ON l.l_partkey = p.p_partkey
JOIN supplier s ON l.l_suppkey = s.s_suppkey
WHERE p.p_type = '{Q9_TYPE}'
GROUP BY 1, 2
""".strip()


# --- event pivot (long -> wide conditional aggregation) ------------------------

_EVENT_TYPES = ("click", "view", "purchase", "signup", "error")


def q_event_pivot(sf_dir: str) -> ray.data.Dataset:
    """Long->wide pivot: one row per user with one count column per event
    type plus the total value in cents.  Shape: per-block combiner turns
    each batch into <= distinct(user) rows with the type axis already
    widened (a 5-column one-hot matmul-free count), then a BUCKETED sum of
    the pre-widened partials — user_id cardinality grows with the data, so
    the wide step's group count must stay a constant, not per-user (the
    measured penalty of the native sort-based aggregate at data-
    proportional group counts; r3 review, same reason as repeat_buyers)."""
    ev = _read(sf_dir, "events", ["user_id", "event_type", "value"])
    sum_cols = [f"n_{t}" for t in _EVENT_TYPES] + ["value_cents"]

    def widen(b: pa.Table) -> pa.Table:
        et = b["event_type"]
        cols = {"user_id": b["user_id"]}
        for t in _EVENT_TYPES:
            cols[f"n_{t}"] = pc.equal(et, t).cast(pa.int64())
        cols["value_cents"] = pa.array(
            cents(b["value"].to_numpy(zero_copy_only=False)))
        df = pa.table(cols).to_pandas()
        return pa.Table.from_pandas(
            df.groupby("user_id", as_index=False, sort=False)[sum_cols].sum(),
            preserve_index=False)

    def finish(g: pd.DataFrame) -> pd.DataFrame:
        return g.groupby("user_id", as_index=False, sort=False)[sum_cols].sum()

    return bucketed_group_apply(
        ev.map_batches(widen, batch_format="pyarrow", batch_size=65536),
        ["user_id"], finish)


SQL_EVENT_PIVOT = """
SELECT user_id,
       CAST(SUM(CASE WHEN event_type = 'click' THEN 1 ELSE 0 END) AS BIGINT) AS n_click,
       CAST(SUM(CASE WHEN event_type = 'view' THEN 1 ELSE 0 END) AS BIGINT) AS n_view,
       CAST(SUM(CASE WHEN event_type = 'purchase' THEN 1 ELSE 0 END) AS BIGINT) AS n_purchase,
       CAST(SUM(CASE WHEN event_type = 'signup' THEN 1 ELSE 0 END) AS BIGINT) AS n_signup,
       CAST(SUM(CASE WHEN event_type = 'error' THEN 1 ELSE 0 END) AS BIGINT) AS n_error,
       CAST(SUM(CAST(floor(value * 100.0 + 0.5) AS BIGINT)) AS BIGINT) AS value_cents
FROM events
GROUP BY 1
""".strip()


# --- first-touch attribution (per-user argmin) ----------------------------------


def q_first_touch(sf_dir: str) -> ray.data.Dataset:
    """Each user's FIRST event (min (ts, event_id)) and the count of users
    per first event type.  The per-user argmin is mergeable: per-block
    first-per-user partials (<= one row per (block, user)) shuffle into a
    per-user bucketed merge, then a tiny count per type."""
    ev = _read(sf_dir, "events", ["user_id", "ts", "event_id", "event_type"])

    def partial(b: pa.Table) -> pa.Table:
        df = pa.table({
            "user_id": b["user_id"],
            "ts_us": b["ts"].cast(pa.int64()),
            "event_id": b["event_id"],
            "event_type": b["event_type"],
        }).to_pandas()
        df = df.sort_values(["user_id", "ts_us", "event_id"], kind="mergesort")
        return pa.Table.from_pandas(df.groupby("user_id").head(1),
                                    preserve_index=False)

    def merge(g: pd.DataFrame) -> pd.DataFrame:
        g = g.sort_values(["user_id", "ts_us", "event_id"], kind="mergesort")
        first = g.groupby("user_id", as_index=False).head(1)
        out = first["event_type"].value_counts().rename_axis(
            "event_type").reset_index(name="n_users")
        out["n_users"] = out["n_users"].astype(np.int64)
        return out

    partials = ev.map_batches(partial, batch_format="pyarrow",
                              batch_size=65536)
    counted = bucketed_group_apply(partials, ["user_id"], merge, n_buckets=32)
    return combined_groupby_sum(counted, ["event_type"], ["n_users"])


SQL_FIRST_TOUCH = """
WITH fe AS (
  SELECT user_id, event_type,
         row_number() OVER (PARTITION BY user_id
                            ORDER BY ts, event_id) AS rn
  FROM events)
SELECT event_type, CAST(COUNT(*) AS BIGINT) AS n_users
FROM fe WHERE rn = 1 GROUP BY 1
""".strip()


# --- CUBE(event_type, year) -----------------------------------------------------


def q_events_cube(sf_dir: str) -> pd.DataFrame:
    """CUBE over (event_type, ship year): all four grouping sets, margins
    labeled 'ALL' / -1 so every column keeps a non-null dtype.  The base
    rollup is dimension-sized (types x years), so the three margin levels
    are exact driver-side folds of the base — no second pass over the
    data."""
    ev = _read(sf_dir, "events", ["event_type", "ts"])

    def prep(b: pa.Table) -> pa.Table:
        ts = b["ts"].cast(pa.int64()).to_numpy(zero_copy_only=False)
        yr = year_of_us(ts)
        return pa.table({"event_type": b["event_type"], "yr": pa.array(yr)})

    base = combined_groupby_sum(
        ev.map_batches(prep, batch_format="pyarrow", batch_size=65536),
        ["event_type", "yr"], [], count_alias="n_events").to_pandas()

    by_type = base.groupby("event_type", as_index=False)["n_events"].sum()
    by_type["yr"] = np.int64(-1)
    by_yr = base.groupby("yr", as_index=False)["n_events"].sum()
    by_yr["event_type"] = "ALL"
    total = pd.DataFrame({"event_type": ["ALL"], "yr": [np.int64(-1)],
                          "n_events": [base["n_events"].sum()]})
    out = pd.concat([base, by_type, by_yr, total], ignore_index=True)
    out["n_events"] = out["n_events"].astype(np.int64)
    return out[["event_type", "yr", "n_events"]]


SQL_EVENTS_CUBE = """
SELECT COALESCE(event_type, 'ALL') AS event_type,
       CAST(COALESCE(year(ts), -1) AS BIGINT) AS yr,
       CAST(COUNT(*) AS BIGINT) AS n_events
FROM events
GROUP BY CUBE(event_type, year(ts))
""".strip()
