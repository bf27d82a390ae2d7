"""Event-stream window/aggregate breadth: rolling-window sum, ordered
string aggregation (user paths), and per-group MODE.

Three more classic warehouse shapes over the events table, each built on
the repo's bucketed per-key primitives (stages/windows.py,
stages/grouping.py) so the wide step is one co-partitioning exchange and
all per-key work is vectorized inside the bucket:

- ``events_moving_sum`` : SUM OVER (... ROWS 2 PRECEDING) — the bounded
                          sliding frame (running_total covers UNBOUNDED)
- ``user_event_path``   : string_agg of each user's first-5 event types in
                          time order — the ordered string aggregate
- ``user_top_event``    : per-user modal event type with count — argmax
                          over a distributed count, deterministic ties

Exactness: money in integer cents per row (relational.py contract), paths
compare as strings, ties break lexicographically on both sides.
"""

from __future__ import annotations

import numpy as np
import pandas as pd
import pyarrow as pa
import ray
import ray.data

from ..stages.grouping import bucketed_group_apply
from ..stages.windows import grouped_rolling_sum
from .relational import DAY_US, _read, cents, combined_groupby_sum

MOVING_WIN = 3
PATH_N = 5


def _events_cents(sf_dir: str) -> ray.data.Dataset:
    ev = _read(sf_dir, "events", ["event_id", "user_id", "ts", "value"])

    def prep(b: pa.Table) -> pa.Table:
        return pa.table({
            "event_id": b["event_id"],
            "user_id": b["user_id"],
            "ts_us": b["ts"].cast(pa.int64()),
            "v_cents": pa.array(
                cents(b["value"].to_numpy(zero_copy_only=False))),
        })

    return ev.map_batches(prep, batch_format="pyarrow")


def q_events_moving_sum(sf_dir: str) -> ray.data.Dataset:
    """Per event: sum of the user's last ``MOVING_WIN`` event values
    (bounded sliding frame), exact int64 via clamped prefix sums."""
    return grouped_rolling_sum(
        _events_cents(sf_dir), "user_id", ["ts_us", "event_id"], "v_cents",
        ["event_id"], MOVING_WIN, roll_name="roll_cents")


SQL_EVENTS_MOVING_SUM = f"""
SELECT event_id,
       CAST(SUM(CAST(floor(value * 100.0 + 0.5) AS BIGINT))
         OVER (PARTITION BY user_id ORDER BY ts, event_id
               ROWS BETWEEN {MOVING_WIN - 1} PRECEDING AND CURRENT ROW)
         AS BIGINT) AS roll_cents
FROM events
""".strip()


def q_user_event_path(sf_dir: str) -> ray.data.Dataset:
    """Per user: '>'-joined sequence of the first ``PATH_N`` event types in
    (ts, event_id) order — the ordered string aggregate.  One bucketed
    exchange; within each bucket the head-``PATH_N`` slice is computed
    vectorized for all users at once, then joined per user (string concat
    is inherently per-group; the groups are user-sized and the buckets are
    the parallel unit)."""
    ev = _read(sf_dir, "events", ["event_id", "user_id", "ts", "event_type"])

    def prep(b: pa.Table) -> pa.Table:
        return pa.table({
            "user_id": b["user_id"],
            "ts_us": b["ts"].cast(pa.int64()),
            "event_id": b["event_id"],
            "event_type": b["event_type"],
        })

    def fn(g: pd.DataFrame) -> pd.DataFrame:
        from ..stages.windows import _segment_starts

        d = g.sort_values(["user_id", "ts_us", "event_id"], kind="mergesort")
        k = d["user_id"].to_numpy()
        new = _segment_starts(k)
        starts = np.flatnonzero(new)
        seg_id = np.cumsum(new) - 1
        pos = np.arange(k.shape[0], dtype=np.int64) - starts[seg_id]
        head = d.loc[pos < PATH_N, ["user_id", "event_type"]]
        out = head.groupby("user_id", sort=False)["event_type"].agg(
            ">".join).reset_index(name="path")
        return out

    return bucketed_group_apply(
        ev.map_batches(prep, batch_format="pyarrow"), ["user_id"], fn)


SQL_USER_EVENT_PATH = f"""
SELECT user_id, string_agg(event_type, '>' ORDER BY ts, event_id) AS path
FROM (
  SELECT *, ROW_NUMBER() OVER (PARTITION BY user_id
                               ORDER BY ts, event_id) AS rn
  FROM events
) WHERE rn <= {PATH_N}
GROUP BY user_id
""".strip()


def q_user_top_event(sf_dir: str) -> ray.data.Dataset:
    """Per user: the MODE of event_type with its count (ties -> smaller
    type string).  Distributed argmax-over-count: per-block (user, type)
    count combiner -> bucketed sum -> per-user argmax inside the bucket
    (one vectorized sort + drop_duplicates across all its users)."""
    ev = _read(sf_dir, "events", ["user_id", "event_type"])

    def partial(b: pa.Table) -> pa.Table:
        df = b.to_pandas()
        out = df.groupby(["user_id", "event_type"], as_index=False,
                         sort=False).size().rename(columns={"size": "n"})
        out["n"] = out["n"].astype(np.int64)
        return pa.Table.from_pandas(out, preserve_index=False)

    def sum_then_argmax(g: pd.DataFrame) -> pd.DataFrame:
        # all partials of a user land in this bucket: finish the count
        # and take the winner in one vectorized pass
        c = g.groupby(["user_id", "event_type"], as_index=False,
                      sort=False)["n"].sum()
        d = c.sort_values(["user_id", "n", "event_type"],
                          ascending=[True, False, True], kind="mergesort")
        return d.drop_duplicates("user_id", keep="first")

    partials = ev.map_batches(partial, batch_format="pyarrow",
                              batch_size=65536)
    return bucketed_group_apply(partials, ["user_id"], sum_then_argmax)


SQL_USER_TOP_EVENT = """
SELECT user_id, event_type, n FROM (
  SELECT user_id, event_type, CAST(COUNT(*) AS BIGINT) AS n,
         ROW_NUMBER() OVER (PARTITION BY user_id
                            ORDER BY COUNT(*) DESC, event_type) AS rn
  FROM events GROUP BY user_id, event_type
) WHERE rn = 1
""".strip()


def q_latest_events(sf_dir: str) -> ray.data.Dataset:
    """SCD-type-1 / CDC upsert compaction: the LATEST event per
    (user_id, event_type), ties broken by max event_id — the "apply the
    change stream, last write wins" primitive.  Per-block argmax combiner
    (one vectorized sort + drop_duplicates) -> bucketed argmax merge:
    max-of-maxes composes, so the shuffle moves <= one row per
    (block, key)."""
    ev = _read(sf_dir, "events",
               ["event_id", "user_id", "ts", "value", "event_type"])

    def argmax(g: pd.DataFrame) -> pd.DataFrame:
        d = g.sort_values(["user_id", "event_type", "ts_us", "event_id"],
                          ascending=[True, True, False, False],
                          kind="mergesort")
        return d.drop_duplicates(["user_id", "event_type"], keep="first")

    def block_argmax(b: pa.Table) -> pa.Table:
        t = pa.table({
            "event_id": b["event_id"],
            "user_id": b["user_id"],
            "ts_us": b["ts"].cast(pa.int64()),
            "v_cents": pa.array(
                cents(b["value"].to_numpy(zero_copy_only=False))),
            "event_type": b["event_type"],
        })
        return pa.Table.from_pandas(argmax(t.to_pandas()),
                                    preserve_index=False)

    partials = ev.map_batches(block_argmax, batch_format="pyarrow",
                              batch_size=65536)
    return bucketed_group_apply(partials, ["user_id", "event_type"], argmax)


SQL_LATEST_EVENTS = """
SELECT event_id, user_id, ts_us, v_cents, event_type FROM (
  SELECT event_id, user_id,
         epoch_us(ts) AS ts_us,
         CAST(floor(value * 100.0 + 0.5) AS BIGINT) AS v_cents,
         event_type,
         ROW_NUMBER() OVER (PARTITION BY user_id, event_type
                            ORDER BY ts DESC, event_id DESC) AS rn
  FROM events
) WHERE rn = 1
""".strip()


# 1970-01-01 was a Thursday; +3 days aligns integer week indices to Monday
WEEK_SHIFT_DAYS = 3


def q_events_weekly(sf_dir: str) -> ray.data.Dataset:
    """Per calendar week (Monday-start, matching SQL date_trunc('week')):
    event count + integer cents sum.  The week boundary is pure integer
    epoch math — days = us // DAY_US, monday_idx = (days + 3) // 7,
    week_start_us = (monday_idx * 7 - 3) * DAY_US — so both sides bucket
    identically with no calendar library.  Weeks are dimension-sized, so
    the per-block combiner collapses each batch before the tiny shuffle."""
    from .relational import combined_groupby_sum

    ev = _read(sf_dir, "events", ["ts", "value"])

    def partial(b: pa.Table) -> pa.Table:
        us = b["ts"].cast(pa.int64()).to_numpy(zero_copy_only=False)
        days = us // DAY_US
        monday = (days + WEEK_SHIFT_DAYS) // 7
        week_us = (monday * 7 - WEEK_SHIFT_DAYS) * DAY_US
        v = cents(b["value"].to_numpy(zero_copy_only=False))
        df = pd.DataFrame({"week_us": week_us,
                           "n": np.ones(v.shape[0], np.int64),
                           "sum_cents": v})
        return pa.Table.from_pandas(
            df.groupby("week_us", as_index=False).sum(),
            preserve_index=False)

    parts = ev.map_batches(partial, batch_format="pyarrow",
                           batch_size=65536)
    return combined_groupby_sum(parts, ["week_us"], ["n", "sum_cents"])


SQL_EVENTS_WEEKLY = """
SELECT epoch_us(date_trunc('week', ts)) AS week_us,
       CAST(COUNT(*) AS BIGINT) AS n,
       CAST(SUM(CAST(floor(value * 100.0 + 0.5) AS BIGINT)) AS BIGINT)
         AS sum_cents
FROM events GROUP BY 1
""".strip()


def q_value_gini(sf_dir: str) -> ray.data.Dataset:
    """Per event type: the EXACT Gini dispersion numerator
    D = sum_i sum_j |x_i - x_j| (integer cents) plus n and sum — enough
    for any downstream Gini/mean-absolute-difference ratio with no float
    on the wire.  Uses the sorted identity D = 2 * sum_i (2i - n - 1) *
    x_(i); duplicates are collapsed first, so the exchange moves
    (type, distinct-value, count) histogram rows and the per-type finish
    is one vectorized prefix-sum pass (same fits-a-worker contract as
    grouped_median's per-group histograms)."""
    ev = _read(sf_dir, "events", ["event_type", "value"])

    def partial(b: pa.Table) -> pa.Table:
        v = cents(b["value"].to_numpy(zero_copy_only=False))
        df = pd.DataFrame({"event_type": b["event_type"].to_pandas(),
                           "v_cents": v,
                           "c": np.ones(v.shape[0], np.int64)})
        g = df.groupby(["event_type", "v_cents"], as_index=False)["c"].sum()
        return pa.Table.from_pandas(g, preserve_index=False)

    def finish(g: pd.DataFrame) -> pd.DataFrame:
        from ..stages.windows import _segment_starts

        d = (g.groupby(["event_type", "v_cents"], as_index=False)["c"].sum()
             .sort_values(["event_type", "v_cents"], kind="mergesort"))
        t = d["event_type"].to_numpy()
        v = d["v_cents"].to_numpy().astype(np.int64)
        c = d["c"].to_numpy().astype(np.int64)
        new = _segment_starts(t)
        seg_id = np.cumsum(new) - 1
        # per-segment cumulative count/sum BEFORE each histogram row
        cum_c = np.cumsum(c)
        cum_s = np.cumsum(c * v)
        starts = np.flatnonzero(new)
        base_c = cum_c[starts] - c[starts]
        base_s = cum_s[starts] - (c * v)[starts]
        prev_c = np.concatenate([[0], cum_c[:-1]]) - base_c[seg_id]
        prev_s = np.concatenate([[0], cum_s[:-1]]) - base_s[seg_id]
        # int64 envelope (r3 review): gini_num grows ~ n^2 * mean|dv|, so
        # at scale it can wrap int64 while the SQL oracle promotes to
        # HUGEINT.  The guard is a pure FLOAT64 mirror of the int
        # arithmetic (it must not read the int64 intermediates — they may
        # already be wrapped): re-derive cum_s/prev_s in float, then bound
        # every int64 quantity below — each cum_s prefix, v*prev_c,
        # prev_s, and the per-segment |term| sums (dominated by
        # sum(c*(|v|*prev_c + |prev_s|)) since c >= 1) — against 2^62
        # (2x margin; float cumsum error ~n*eps is negligible vs it).
        cf = c.astype(np.float64)
        vf = v.astype(np.float64)
        cum_sf = np.cumsum(cf * vf)
        base_sf = cum_sf[starts] - (cf * vf)[starts]
        prev_sf = np.concatenate([[0.0], cum_sf[:-1]]) - base_sf[seg_id]
        prev_cf = prev_c.astype(np.float64)
        bound = 2.0 * float(
            np.sum(cf * (np.abs(vf) * prev_cf + np.abs(prev_sf))))
        cum_s_peak = float(np.max(np.abs(cum_sf), initial=0.0))
        if max(bound, cum_s_peak) >= float(2 ** 62):
            raise ValueError(
                "value_gini int64 envelope exceeded: pair-distance sum "
                "too large for exact int64 gini_num (needs a big-int or "
                "two-limb accumulator at this scale)")
        # ordered-pair distance sum: 2 * sum_k c_k*(v_k*C_{k-1} - S_{k-1})
        term = c * (v * prev_c - prev_s)
        types = t[starts]
        n_seg = starts.shape[0]
        gini = np.zeros(n_seg, np.int64)
        np.add.at(gini, seg_id, term)
        n = np.zeros(n_seg, np.int64)
        np.add.at(n, seg_id, c)
        s = np.zeros(n_seg, np.int64)
        np.add.at(s, seg_id, c * v)
        return pd.DataFrame({"event_type": types, "n": n,
                             "sum_cents": s, "gini_num": 2 * gini})

    parts = ev.map_batches(partial, batch_format="pyarrow",
                           batch_size=65536)
    return bucketed_group_apply(parts, ["event_type"], finish)


SQL_VALUE_GINI = """
SELECT event_type, CAST(COUNT(*) AS BIGINT) AS n,
       CAST(SUM(v) AS BIGINT) AS sum_cents,
       CAST(2 * SUM((2 * rn - n - 1) * v) AS BIGINT) AS gini_num
FROM (
  SELECT event_type,
         CAST(floor(value * 100.0 + 0.5) AS BIGINT) AS v,
         ROW_NUMBER() OVER (PARTITION BY event_type
                            ORDER BY floor(value * 100.0 + 0.5)) AS rn,
         COUNT(*) OVER (PARTITION BY event_type) AS n
  FROM events
) GROUP BY event_type
""".strip()


# --- trimmed mean: per-type aggregate over the p10..p90 value band -----------

TRIM_LO = 0.1
TRIM_HI = 0.9


def q_trimmed_mean(sf_dir: str) -> ray.data.Dataset:
    """Per event_type TRIMMED aggregate: count + integer-cents sum of the
    values inside the [p10, p90] discrete-quantile band — the
    outlier-resistant mean every quality-score pipeline wants before
    thresholding (exact: boundaries are quantile_disc order statistics,
    money stays in int cents, no float mean crosses the wire; the caller
    divides).

    Ray shape: ONE bucketed per-group pass picks both boundary order
    statistics (group count is event_type-dimension-sized, so the
    boundary table is tiny); boundaries broadcast via ``ray.put``; one
    filtered combiner + small groupby does the trimmed sum.  Per-group
    sort assumes a group fits its bucket's worker (grouped_median
    contract) — at 100-TB scale swap stage 1 for a per-group
    distributed histogram (quantiles.exact_quantiles_int per key)."""
    from ..stages.grouping import bucketed_group_apply
    from ..sources.pages import cached_get

    ev = _read(sf_dir, "events", ["event_type", "value"])

    def prep(b: pa.Table) -> pa.Table:
        return pa.table({
            "event_type": b["event_type"],
            "v_cents": pa.array(
                cents(b["value"].to_numpy(zero_copy_only=False))),
        })

    prepped = ev.map_batches(prep, batch_format="pyarrow",
                             batch_size=65536).materialize()

    def bounds_fn(g: pd.DataFrame) -> pd.DataFrame:
        d = g.sort_values(["event_type", "v_cents"], kind="mergesort")
        k = d["event_type"].to_numpy()
        v = d["v_cents"].to_numpy()
        starts = np.concatenate([[0], np.flatnonzero(k[1:] != k[:-1]) + 1])
        ends = np.concatenate([starts[1:], [len(d)]])
        n = ends - starts
        # DuckDB quantile_disc: smallest element with CDF >= q — the
        # property-tested index formula, vectorized across groups
        from ..stages.quantiles import disc_index_vec
        lo = v[starts + disc_index_vec(n, TRIM_LO)]
        hi = v[starts + disc_index_vec(n, TRIM_HI)]
        return pd.DataFrame({"event_type": k[starts],
                             "lo": lo.astype(np.int64),
                             "hi": hi.astype(np.int64)})

    bounds = bucketed_group_apply(
        prepped, ["event_type"], bounds_fn).to_pandas()
    import ray as _ray

    bounds_ref = _ray.put({t: (int(l), int(h)) for t, l, h in
                           zip(bounds["event_type"], bounds["lo"],
                               bounds["hi"])})

    def keep(b: pa.Table) -> pa.Table:
        bd = cached_get(bounds_ref)
        # factorize once, then two vectorized np gathers — no per-row Python
        codes, cats = pd.factorize(b["event_type"].to_pandas())
        lo_arr = np.array([bd[x][0] for x in cats], np.int64)
        hi_arr = np.array([bd[x][1] for x in cats], np.int64)
        v = b["v_cents"].to_numpy(zero_copy_only=False)
        m = (v >= lo_arr[codes]) & (v <= hi_arr[codes])
        return pa.table({"event_type": b["event_type"].filter(pa.array(m)),
                         "sum_kept_cents": pa.array(v[m])})

    kept = prepped.map_batches(keep, batch_format="pyarrow",
                               batch_size=65536)
    return combined_groupby_sum(kept, ["event_type"], ["sum_kept_cents"],
                                count_alias="n_kept")


SQL_TRIMMED_MEAN = f"""
WITH c AS (SELECT event_type,
                  CAST(floor(value * 100.0 + 0.5) AS BIGINT) AS v
           FROM events),
     b AS (SELECT event_type,
                  quantile_disc(v, {TRIM_LO}) AS lo,
                  quantile_disc(v, {TRIM_HI}) AS hi
           FROM c GROUP BY 1)
SELECT c.event_type,
       CAST(COUNT(*) AS BIGINT) AS n_kept,
       CAST(SUM(c.v) AS BIGINT) AS sum_kept_cents
FROM c JOIN b USING (event_type)
WHERE c.v BETWEEN b.lo AND b.hi
GROUP BY c.event_type
""".strip()


# --- rolling distinct: trailing-3-day active users per day --------------------

ROLL_DAYS = 3


def q_rolling_active_users(sf_dir: str) -> ray.data.Dataset:
    """Per observed day: DISTINCT users active in the trailing
    ``ROLL_DAYS``-day window ending that day — the windowed COUNT(DISTINCT)
    Ray Data lacks, built as bounded-expansion distinct so no window ever
    re-scans history:

    1. map-side: each event fans out to the ROLL_DAYS window-end days it
       covers, carrying ``real = 1`` on the i=0 copy (the event's own day),
       then collapses per block to distinct (day, user, sum real);
    2. one exchange makes (day, user) globally distinct (summing real);
    3. a day-dimension count; a day is OBSERVED (kept) iff its summed
       real > 0 — so the observed-day set rides the same exchanges instead
       of a separate full pass + broadcast (r5: was 4 exchanges + a
       second read of events; now 2 exchanges, one read, 6.0 s -> ~1.5 s
       at sf0.1).

    The expansion join IS the scale trick: work is O(pairs x window), never
    O(days x history re-scan), and every exchange carries distinct rows."""
    ev = _read(sf_dir, "events", ["ts", "user_id"])

    def prep_expand(b: pa.Table) -> pa.Table:
        t = b["ts"].cast(pa.int64()).to_numpy(zero_copy_only=False)
        d = t // DAY_US
        u = b["user_id"].to_numpy(zero_copy_only=False).astype(np.int64)
        n = d.shape[0]
        wd = np.concatenate([d + i for i in range(ROLL_DAYS)])
        wu = np.tile(u, ROLL_DAYS)
        real = np.zeros(n * ROLL_DAYS, np.int64)
        real[:n] = 1
        df = pd.DataFrame({"day": wd, "user_id": wu, "real": real})
        out = df.groupby(["day", "user_id"], as_index=False,
                         sort=False)["real"].sum()
        return pa.Table.from_pandas(out, preserve_index=False)

    expanded = ev.map_batches(prep_expand, batch_format="pyarrow",
                              batch_size=65536)
    pairs = combined_groupby_sum(expanded, ["day", "user_id"], ["real"])
    per_day = combined_groupby_sum(pairs, ["day"], ["real"],
                                   count_alias="n_active")

    def finish(b: pa.Table) -> pa.Table:
        import pyarrow.compute as pc
        keep = b.filter(pc.greater(b["real"], 0))
        return keep.select(["day", "n_active"])

    return per_day.map_batches(finish, batch_format="pyarrow",
                               batch_size=65536)


SQL_ROLLING_ACTIVE_USERS = f"""
WITH du AS (SELECT DISTINCT epoch_us(ts) // {DAY_US} AS day, user_id
            FROM events),
     days AS (SELECT DISTINCT day FROM du),
     ex AS (SELECT du.day + t.u AS day, du.user_id
            FROM du CROSS JOIN UNNEST([{", ".join(str(i) for i in range(ROLL_DAYS))}]) AS t(u))
SELECT ex.day, CAST(COUNT(DISTINCT ex.user_id) AS BIGINT) AS n_active
FROM ex JOIN days ON ex.day = days.day
GROUP BY ex.day
""".strip()


# --- SCD-2 validity intervals: each event's effective time range -------------


def q_event_intervals(sf_dir: str) -> ray.data.Dataset:
    """Per event: the half-open validity interval [ts, next same-user ts) —
    the slowly-changing-dimension (SCD-2) snapshot builder: an event
    stream becomes a state-history table whose rows can answer "what was
    this user's latest event at time T" with a plain range predicate.
    Last event per user stays open (valid_to_us = -1).  Built on the
    :func:`stages.windows.grouped_lead` primitive (one co-partitioning
    exchange, vectorized backward shift per bucket)."""
    from ..stages.windows import grouped_lead

    ev = _read(sf_dir, "events", ["event_id", "user_id", "ts"])

    def prep(b: pa.Table) -> pa.Table:
        return pa.table({"event_id": b["event_id"],
                         "user_id": b["user_id"],
                         "valid_from_us": b["ts"].cast(pa.int64())})

    prepped = ev.map_batches(prep, batch_format="pyarrow",
                             batch_size=65536)
    return grouped_lead(prepped, "user_id",
                        ["valid_from_us", "event_id"], "valid_from_us",
                        ["event_id", "user_id", "valid_from_us"],
                        lead_name="valid_to_us", fill=-1)


SQL_EVENT_INTERVALS = """
SELECT event_id, user_id, epoch_us(ts) AS valid_from_us,
       COALESCE(LEAD(epoch_us(ts)) OVER
                  (PARTITION BY user_id ORDER BY epoch_us(ts), event_id),
                -1) AS valid_to_us
FROM events
""".strip()


# --- interval union: per-user covered time across overlapping intervals ------

# each event opens a fixed 30-minute activity interval; overlaps merge
COVER_DUR_US = 30 * 60 * 1_000_000


def q_interval_coverage(sf_dir: str) -> ray.data.Dataset:
    """Per user: the UNION of its (possibly overlapping) activity
    intervals — each event opens [ts, ts + COVER_DUR_US); overlapping /
    touching intervals merge into islands.  Returns (user_id, n_islands,
    covered_us): how many disjoint activity stretches the user had and
    their total length — the interval-union primitive behind session
    coverage, ad-viewability and SLA-uptime rollups, and the windowed
    complement of gap-based ``event_sessions``.

    Ray shape: ONE co-partitioning exchange on user_id
    (``bucketed_group_apply``); inside each bucket the island sweep is
    vectorized across ALL its users — sort by (user, start), running
    ``cummax`` of interval ends per user (pandas C groupby), an island
    break wherever start > previous running max, then one
    (user, island) fold and one per-user fold.  No per-user Python; per
    bucket memory is O(events / n_buckets) (grouping.py contract)."""
    ev = _read(sf_dir, "events", ["user_id", "ts"])

    def prep(b: pa.Table) -> pa.Table:
        s = b["ts"].cast(pa.int64())
        return pa.table({"user_id": b["user_id"], "s": s})

    def coverage(g: pd.DataFrame) -> pd.DataFrame:
        d = g.sort_values(["user_id", "s"], kind="mergesort")
        d["e"] = d["s"] + COVER_DUR_US
        gb = d.groupby("user_id", sort=False)
        prev_max = gb["e"].cummax().groupby(d["user_id"], sort=False) \
            .shift(1)
        new_island = prev_max.isna() | (d["s"] > prev_max)
        d["island"] = new_island.cumsum()  # globally unique per (user, run)
        isl = d.groupby(["user_id", "island"], sort=False).agg(
            st=("s", "min"), en=("e", "max"))
        out = isl.groupby("user_id", sort=False).agg(
            n_islands=("st", "size"), covered_us=("en", "sum"))
        st_sum = isl.groupby("user_id", sort=False)["st"].sum()
        out["covered_us"] = (out["covered_us"] - st_sum).astype(np.int64)
        out["n_islands"] = out["n_islands"].astype(np.int64)
        return out.reset_index()

    prepped = ev.map_batches(prep, batch_format="pyarrow",
                             batch_size=65536)
    return bucketed_group_apply(prepped, ["user_id"], coverage)


SQL_INTERVAL_COVERAGE = f"""
WITH iv AS (SELECT user_id, epoch_us(ts) AS s,
                   epoch_us(ts) + {COVER_DUR_US} AS e FROM events),
w AS (SELECT user_id, s, e,
             MAX(e) OVER (PARTITION BY user_id ORDER BY s, e
                          ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING)
               AS prev_max
      FROM iv),
g AS (SELECT user_id, s, e,
             SUM(CASE WHEN prev_max IS NULL OR s > prev_max
                      THEN 1 ELSE 0 END)
               OVER (PARTITION BY user_id ORDER BY s, e) AS island
      FROM w),
isl AS (SELECT user_id, island, MIN(s) AS st, MAX(e) AS en
        FROM g GROUP BY 1, 2)
SELECT user_id, CAST(COUNT(*) AS BIGINT) AS n_islands,
       CAST(SUM(en - st) AS BIGINT) AS covered_us
FROM isl GROUP BY user_id
""".strip()


# --- exact per-type CDF table: the distribution-function primitive -----------

CDF_PPM = 1_000_000


def q_value_cdf(sf_dir: str) -> ray.data.Dataset:
    """Per (event_type, distinct v_cents): count, running count, and the
    exact cumulative-distribution point in integer parts-per-million —
    the CDF table behind percent_rank / cume_dist / calibration curves,
    keyed by DISTINCT value so the output is value-domain-sized, never
    row-scale (the scale-safe way to expose a distribution function:
    value_deciles answers "which bin", this answers "what fraction is
    <= v" for every observed v).

    Ray shape: per-block (type, v_cents) count combiner -> multi-key
    bucketed exchange -> ONE type-bucketed prefix pass (sort + pandas
    C cumsum/transform across the whole bucket).  cum * 10^6 // total is
    non-negative integer division — numpy matches DuckDB ``//``."""
    ev = _read(sf_dir, "events", ["event_type", "value"])

    def prep(b: pa.Table) -> pa.Table:
        return pa.table({
            "event_type": b["event_type"],
            "v_cents": pa.array(
                cents(b["value"].to_numpy(zero_copy_only=False))),
        })

    prepped = ev.map_batches(prep, batch_format="pyarrow",
                             batch_size=65536)
    counts = combined_groupby_sum(prepped, ["event_type", "v_cents"], [],
                                  count_alias="n")

    def cdf(g: pd.DataFrame) -> pd.DataFrame:
        d = g.sort_values(["event_type", "v_cents"], kind="mergesort")
        gb = d.groupby("event_type", sort=False)["n"]
        cum = gb.cumsum().astype(np.int64)
        tot = gb.transform("sum").astype(np.int64)
        d["cum_n"] = cum
        d["cume_ppm"] = (cum * CDF_PPM // tot).astype(np.int64)
        return d

    return bucketed_group_apply(counts, ["event_type"], cdf)


SQL_VALUE_CDF = f"""
SELECT event_type, v_cents, n, cum_n,
       CAST(cum_n * {CDF_PPM} // total_n AS BIGINT) AS cume_ppm
FROM (
  SELECT event_type, v_cents, CAST(COUNT(*) AS BIGINT) AS n,
         CAST(SUM(COUNT(*)) OVER (PARTITION BY event_type
                                  ORDER BY v_cents) AS BIGINT) AS cum_n,
         CAST(SUM(COUNT(*)) OVER (PARTITION BY event_type) AS BIGINT)
           AS total_n
  FROM (SELECT event_type,
               CAST(floor(value * 100.0 + 0.5) AS BIGINT) AS v_cents
        FROM events)
  GROUP BY event_type, v_cents)
""".strip()


# --- time-weighted aggregation: the metering/billing primitive ---------------


def q_time_weighted_value(sf_dir: str) -> ray.data.Dataset:
    """Per user: the exact time-weighted value integral — each event's
    value holds until the user's NEXT event (the SCD-2 interval
    semantics), so ``vt_sum = sum(v_cents x interval_us)`` over the
    closed intervals plus ``span_us`` (first to last event) lets any
    consumer form the time-weighted average ``vt_sum / span_us`` without
    a float ever crossing the wire — metering, billing, position-
    weighted exposure.  Everything int64: v_cents <= 10^4, intervals
    <= 30 days of us ~ 2.6e12, per-user sums ~ 1e17 < 2^63.

    Ray shape: ONE user-bucketed exchange; inside the bucket the lead,
    the products and both per-user folds are vectorized across all its
    users (sort + segment shift + pandas C groupby)."""
    ev = _read(sf_dir, "events", ["event_id", "user_id", "ts", "value"])

    def prep(b: pa.Table) -> pa.Table:
        return pa.table({
            "event_id": b["event_id"],
            "user_id": b["user_id"],
            "ts_us": b["ts"].cast(pa.int64()),
            "v_cents": pa.array(
                cents(b["value"].to_numpy(zero_copy_only=False))),
        })

    def integrate(g: pd.DataFrame) -> pa.Table:
        d = g.sort_values(["user_id", "ts_us", "event_id"],
                          kind="mergesort")
        u = d["user_id"].to_numpy()
        ts = d["ts_us"].to_numpy()
        v = d["v_cents"].to_numpy()
        nxt = np.empty_like(ts)
        nxt[:-1] = ts[1:]
        nxt[-1] = 0
        # last row of each user segment has no successor -> 0 duration
        seg_end = np.ones(len(d), bool)
        seg_end[:-1] = u[1:] != u[:-1]
        dur = np.where(seg_end, 0, nxt - ts)
        d["vt"] = (v * dur).astype(np.int64)
        out = d.groupby("user_id", sort=False).agg(
            vt_sum=("vt", "sum"), t_min=("ts_us", "min"),
            t_max=("ts_us", "max"))
        out["vt_sum"] = out["vt_sum"].astype(np.int64)
        out["span_us"] = (out["t_max"] - out["t_min"]).astype(np.int64)
        return pa.Table.from_pandas(
            out.reset_index()[["user_id", "vt_sum", "span_us"]],
            preserve_index=False)

    prepped = ev.map_batches(prep, batch_format="pyarrow",
                             batch_size=65536)
    return bucketed_group_apply(prepped, ["user_id"], integrate)


SQL_TIME_WEIGHTED_VALUE = """
WITH c AS (SELECT event_id, user_id, epoch_us(ts) AS ts,
                  CAST(floor(value * 100.0 + 0.5) AS BIGINT) AS v
           FROM events),
w AS (SELECT user_id, ts, v,
             LEAD(ts) OVER (PARTITION BY user_id
                            ORDER BY ts, event_id) AS nxt
      FROM c)
SELECT user_id,
       CAST(SUM(CASE WHEN nxt IS NULL THEN 0
                     ELSE v * (nxt - ts) END) AS BIGINT) AS vt_sum,
       CAST(MAX(ts) - MIN(ts) AS BIGINT) AS span_us
FROM w GROUP BY user_id
""".strip()


# --- path analysis: most common event-type journeys --------------------------

TOP_PATHS_K = 15


def q_top_paths(sf_dir: str) -> ray.data.Dataset:
    """The ``TOP_PATHS_K`` most common first-``PATH_N`` event-type
    journeys with their user counts — product-analytics path mining,
    composed from the registry's own primitives: the ordered string
    aggregate (``q_user_event_path``'s one bucketed exchange) -> a
    path-dimension count -> global top-k without a global sort.  Ties
    break lexicographically on the path string on both sides."""
    from .relational import combined_groupby_sum, global_topk

    paths = q_user_event_path(sf_dir)
    counts = combined_groupby_sum(paths, ["path"], [],
                                  count_alias="n_users")
    return global_topk(counts, ["n_users", "path"], [False, True],
                       TOP_PATHS_K)


SQL_TOP_PATHS = f"""
WITH p AS (
  SELECT user_id, string_agg(event_type, '>' ORDER BY ts, event_id)
           AS path
  FROM (
    SELECT *, ROW_NUMBER() OVER (PARTITION BY user_id
                                 ORDER BY ts, event_id) AS rn
    FROM events
  ) WHERE rn <= {PATH_N}
  GROUP BY user_id
),
c AS (SELECT path, CAST(COUNT(*) AS BIGINT) AS n_users
      FROM p GROUP BY path)
SELECT path, n_users,
       row_number() OVER (ORDER BY n_users DESC, path) AS rank
FROM c ORDER BY n_users DESC, path LIMIT {TOP_PATHS_K}
""".strip()


# --- funnel timing: view -> purchase conversion latency ----------------------

CONV_FROM = "view"
CONV_TO = "purchase"
CONV_QS = (0.5, 0.9)


def q_conversion_latency(sf_dir: str) -> ray.data.Dataset:
    """Exact funnel-timing distribution: for every user whose first
    ``CONV_TO`` event is at or after their first ``CONV_FROM`` event, the
    delta in microseconds — reported as (q_pm, value) exact discrete
    quantiles (median, p90) of those deltas.  The "how long does
    conversion take" query, with no float on the wire.

    Ray shape: one user-bucketed pass computes each user's two first-ts
    argmins and the delta vectorized across the bucket; the delta column
    (user-dimension-sized, but the pipeline is row-scale-safe) feeds the
    distributed-histogram exact-quantile pass
    (quantiles.exact_quantiles_int)."""
    from ..stages.quantiles import exact_quantiles_int

    ev = _read(sf_dir, "events", ["user_id", "ts", "event_type"])

    def prep(b: pa.Table) -> pa.Table:
        import pyarrow.compute as pc
        keep = pc.is_in(b["event_type"],
                        value_set=pa.array([CONV_FROM, CONV_TO]))
        t = b.filter(keep)
        return pa.table({"user_id": t["user_id"],
                         "ts_us": t["ts"].cast(pa.int64()),
                         "event_type": t["event_type"]})

    def deltas(g: pd.DataFrame) -> pa.Table:
        firsts = g.groupby(["user_id", "event_type"], sort=False,
                           as_index=False)["ts_us"].min()
        w = firsts.pivot(index="user_id", columns="event_type",
                         values="ts_us")
        if CONV_FROM not in w.columns or CONV_TO not in w.columns:
            return pa.table({"delta_us": pa.array([], pa.int64())})
        m = w[CONV_TO].notna() & w[CONV_FROM].notna() \
            & (w[CONV_TO] >= w[CONV_FROM])
        d = (w.loc[m, CONV_TO] - w.loc[m, CONV_FROM]).astype(np.int64)
        return pa.table({"delta_us": pa.array(d.to_numpy())})

    prepped = ev.map_batches(prep, batch_format="pyarrow",
                             batch_size=65536)
    dl = bucketed_group_apply(prepped, ["user_id"], deltas)
    out = exact_quantiles_int(dl, "delta_us", CONV_QS)
    return ray.data.from_arrow(pa.Table.from_pandas(out,
                                                    preserve_index=False))


SQL_CONVERSION_LATENCY = f"""
WITH f AS (
  SELECT user_id,
         MIN(CASE WHEN event_type = '{CONV_FROM}'
                  THEN epoch_us(ts) END) AS t_from,
         MIN(CASE WHEN event_type = '{CONV_TO}'
                  THEN epoch_us(ts) END) AS t_to
  FROM events GROUP BY user_id),
d AS (SELECT t_to - t_from AS delta_us FROM f
      WHERE t_from IS NOT NULL AND t_to IS NOT NULL AND t_to >= t_from)
{{Q}}
""".strip()


def sql_conversion_latency() -> str:
    from ..stages.quantiles import sql_exact_quantiles

    return SQL_CONVERSION_LATENCY.replace(
        "{Q}", sql_exact_quantiles("delta_us", "d", CONV_QS))


# --- grouped OLS sufficient statistics (exact integers) ----------------------


def q_value_trend(sf_dir: str) -> ray.data.Dataset:
    """Per event_type: the EXACT integer sufficient statistics of the
    OLS value-vs-time trend — ``slope = num / den`` with
    ``num = n*Sxy - Sx*Sy`` and ``den = n*Sxx - Sx^2`` over
    x = whole MINUTES since the TYPE's first event, y = value cents —
    the drift/trend detector, shipped as exact ints so no float ever
    crosses the wire (consumers divide).  Minutes keep n*Sxy inside
    int64 at test scales (whole seconds overflowed at sf0.1: n ~ 2e4,
    Sxy ~ 5e14 -> n*Sxy ~ 1e19 > 2^63); the driver-fold products run in
    Python ints (arbitrary precision) and RAISE if a final statistic
    exceeds int64 rather than wrap — at that point the caller shards the
    regression by time window.

    Ray shape: the per-type min-ts pass and the moment pass both fold
    block-combined partials (type-dimension-sized exchanges); the final
    num/den arithmetic runs on the 5-row type table, in Python ints."""
    ev = _read(sf_dir, "events", ["event_type", "ts", "value"])

    def prep(b: pa.Table) -> pa.Table:
        return pa.table({
            "event_type": b["event_type"],
            "ts_us": b["ts"].cast(pa.int64()),
            "v_cents": pa.array(
                cents(b["value"].to_numpy(zero_copy_only=False))),
        })

    prepped = ev.map_batches(prep, batch_format="pyarrow",
                             batch_size=65536).materialize()

    def min_partial(b: pa.Table) -> pa.Table:
        df = pd.DataFrame({"event_type": b["event_type"].to_pandas(),
                           "t0": b["ts_us"].to_numpy(zero_copy_only=False)})
        return pa.Table.from_pandas(
            df.groupby("event_type", as_index=False)["t0"].min(),
            preserve_index=False)

    from ..stages.grouping import bucketed_agg

    t0s = bucketed_agg(prepped.map_batches(min_partial,
                                           batch_format="pyarrow",
                                           batch_size=65536),
                       ["event_type"], {"t0": "min"}).to_pandas()
    t0_map = dict(zip(t0s["event_type"], t0s["t0"]))
    import ray as _ray

    from ..sources.pages import cached_get
    t0_ref = _ray.put(t0_map)

    def moments(b: pa.Table) -> pa.Table:
        m = cached_get(t0_ref)
        codes, cats = pd.factorize(b["event_type"].to_pandas())
        t0 = np.array([m[c] for c in cats], np.int64)
        x = (b["ts_us"].to_numpy(zero_copy_only=False)
             - t0[codes]) // 60_000_000
        y = b["v_cents"].to_numpy(zero_copy_only=False)
        df = pd.DataFrame({"event_type": pd.Categorical.from_codes(
            codes, cats).astype(str),
            "n": np.int64(1), "sx": x, "sy": y,
            "sxx": x * x, "sxy": x * y})
        return pa.Table.from_pandas(
            df.groupby("event_type", as_index=False).sum(),
            preserve_index=False)

    parts = prepped.map_batches(moments, batch_format="pyarrow",
                                batch_size=65536)
    agg = combined_groupby_sum(parts, ["event_type"],
                               ["n", "sx", "sy", "sxx", "sxy"]) \
        .to_pandas()  # type-dimension-sized
    num = [int(r.n) * int(r.sxy) - int(r.sx) * int(r.sy)
           for r in agg.itertuples()]
    den = [int(r.n) * int(r.sxx) - int(r.sx) ** 2
           for r in agg.itertuples()]
    lim = 2 ** 63 - 1
    bad = [v for v in num + den if abs(v) > lim]
    if bad:
        raise OverflowError(
            f"value_trend statistic exceeds int64 ({bad[:2]}...); shard "
            "the regression by time window before folding")
    out = pd.DataFrame({"event_type": agg["event_type"],
                        "n": agg["n"].astype(np.int64),
                        "trend_num": np.array(num, np.int64),
                        "trend_den": np.array(den, np.int64)})
    return ray.data.from_arrow(pa.Table.from_pandas(out,
                                                    preserve_index=False))


SQL_VALUE_TREND = """
WITH c AS (
  SELECT event_type,
         (epoch_us(ts) - MIN(epoch_us(ts)) OVER (PARTITION BY event_type))
           // 60000000 AS x,
         CAST(floor(value * 100.0 + 0.5) AS BIGINT) AS y
  FROM events),
m AS (SELECT event_type, CAST(COUNT(*) AS BIGINT) AS n,
             CAST(SUM(x) AS BIGINT) AS sx, CAST(SUM(y) AS BIGINT) AS sy,
             CAST(SUM(x * x) AS BIGINT) AS sxx,
             CAST(SUM(x * y) AS BIGINT) AS sxy
      FROM c GROUP BY event_type)
SELECT event_type, n,
       CAST(n * sxy - sx * sy AS BIGINT) AS trend_num,
       CAST(n * sxx - sx * sx AS BIGINT) AS trend_den
FROM m
""".strip()


# --- rolling median: the windowed-quantile member of the windows family ------

ROLL_MED_W = 5


def q_events_rolling_median(sf_dir: str) -> ray.data.Dataset:
    """Per event: the exact rolling MEDIAN of the user's last
    ``ROLL_MED_W`` event values (robust smoothing; the windowed-quantile
    complement of events_moving_sum's windowed sum).  Built on
    :func:`stages.windows.grouped_rolling_quantile` — one co-partitioning
    exchange, whole-bucket sentinel-padded sliding windows."""
    from ..stages.windows import grouped_rolling_quantile

    return grouped_rolling_quantile(
        _events_cents(sf_dir), "user_id", ["ts_us", "event_id"],
        "v_cents", ["event_id"], ROLL_MED_W, q=0.5,
        roll_name="roll_med")


SQL_EVENTS_ROLLING_MEDIAN = f"""
SELECT event_id,
       quantile_disc(CAST(floor(value * 100.0 + 0.5) AS BIGINT), 0.5)
         OVER (PARTITION BY user_id ORDER BY ts, event_id
               ROWS BETWEEN {ROLL_MED_W - 1} PRECEDING AND CURRENT ROW)
         AS roll_med
FROM events
""".strip()


# --- activity streaks: longest consecutive-day run per user ------------------


def q_user_streaks(sf_dir: str) -> ray.data.Dataset:
    """Per user: (longest_streak, n_active_days) — the longest run of
    CONSECUTIVE active days and the total distinct active days, the
    engagement-streak metric (daily-quest / retention dashboards): the
    islands side of gaps-and-islands over the integer day line
    (id_gaps is the gaps side over the id line).

    Ray shape: per-block distinct (user, day) combiner -> ONE
    user-bucketed exchange; inside the bucket runs are found vectorized
    for ALL users at once (sort, then a run breaks where the user
    changes or day steps by more than 1; run lengths via boundary
    differencing; per-user max/count via pandas C groupby)."""
    ev = _read(sf_dir, "events", ["user_id", "ts"])

    def prep(b: pa.Table) -> pa.Table:
        t = b["ts"].cast(pa.int64()).to_numpy(zero_copy_only=False)
        df = pd.DataFrame({
            "user_id": b["user_id"].to_numpy(zero_copy_only=False),
            "day": t // DAY_US}).drop_duplicates()
        return pa.Table.from_pandas(df, preserve_index=False)

    def streaks(g: pd.DataFrame) -> pd.DataFrame:
        d = g.drop_duplicates().sort_values(["user_id", "day"],
                                            kind="mergesort")
        u = d["user_id"].to_numpy()
        day = d["day"].to_numpy()
        n = len(d)
        brk = np.empty(n, bool)
        brk[0] = True
        brk[1:] = (u[1:] != u[:-1]) | (day[1:] != day[:-1] + 1)
        run_id = np.cumsum(brk) - 1
        run_len = np.bincount(run_id)
        run_user = u[np.flatnonzero(brk)]
        rd = pd.DataFrame({"user_id": run_user, "len": run_len})
        out = rd.groupby("user_id", as_index=False, sort=False).agg(
            longest_streak=("len", "max"), n_active_days=("len", "sum"))
        out["longest_streak"] = out["longest_streak"].astype(np.int64)
        out["n_active_days"] = out["n_active_days"].astype(np.int64)
        return out

    prepped = ev.map_batches(prep, batch_format="pyarrow",
                             batch_size=65536)
    return bucketed_group_apply(prepped, ["user_id"], streaks)


SQL_USER_STREAKS = f"""
WITH du AS (SELECT DISTINCT user_id, epoch_us(ts) // {DAY_US} AS day
            FROM events),
g AS (SELECT user_id, day,
             day - CAST(row_number() OVER (PARTITION BY user_id
                                           ORDER BY day) AS BIGINT) AS grp
      FROM du),
s AS (SELECT user_id, grp, CAST(COUNT(*) AS BIGINT) AS len
      FROM g GROUP BY 1, 2)
SELECT user_id, CAST(MAX(len) AS BIGINT) AS longest_streak,
       CAST(SUM(len) AS BIGINT) AS n_active_days
FROM s GROUP BY user_id
""".strip()


# --- inter-arrival gap distribution ------------------------------------------

IA_QS = (0.5, 0.9, 0.99)


def q_interarrival_quantiles(sf_dir: str) -> ray.data.Dataset:
    """Exact (q_pm, value) quantiles — median, p90, p99 — of the
    same-user inter-event gap in microseconds: the burstiness /
    traffic-shape distribution (capacity planning, bot detection).
    Composes the lag primitive (one user-bucketed exchange,
    grouped_lag_delta over ts with each partition's first row dropped)
    with the distributed-histogram exact-quantile pass."""
    from ..stages.quantiles import exact_quantiles_int
    from ..stages.windows import grouped_lag_delta

    ev = _read(sf_dir, "events", ["event_id", "user_id", "ts"])

    def prep(b: pa.Table) -> pa.Table:
        return pa.table({"event_id": b["event_id"],
                         "user_id": b["user_id"],
                         "ts_us": b["ts"].cast(pa.int64())})

    prepped = ev.map_batches(prep, batch_format="pyarrow",
                             batch_size=65536)
    lagged = grouped_lag_delta(prepped, "user_id",
                               ["ts_us", "event_id"], "ts_us",
                               ["event_id"], delta_name="gap_us",
                               fill=-1)

    def keep(b: pa.Table) -> pa.Table:
        import pyarrow.compute as pc
        return b.filter(pc.greater_equal(b["gap_us"], 0)) \
            .select(["gap_us"])

    gaps = lagged.map_batches(keep, batch_format="pyarrow",
                              batch_size=65536)
    out = exact_quantiles_int(gaps, "gap_us", IA_QS)
    return ray.data.from_arrow(pa.Table.from_pandas(out,
                                                    preserve_index=False))


def sql_interarrival_quantiles() -> str:
    from ..stages.quantiles import sql_exact_quantiles

    return f"""
WITH c AS (SELECT user_id, epoch_us(ts) AS ts, event_id FROM events),
d AS (SELECT ts - LAG(ts) OVER (PARTITION BY user_id
                                ORDER BY ts, event_id) AS gap_us
      FROM c),
g AS (SELECT gap_us FROM d WHERE gap_us IS NOT NULL)
{sql_exact_quantiles("gap_us", "g", IA_QS)}
""".strip()


# --- distinct-of-distinct: engagement-breadth histogram ----------------------


def q_power_users(sf_dir: str) -> ray.data.Dataset:
    """(n_types, n_user_weeks): across every (user, calendar week) cell,
    how many cells touch exactly 1, 2, ... distinct event types — the
    engagement-breadth histogram (a COUNT of a grouped COUNT(DISTINCT),
    the distinct-of-distinct shape; weekly so the distribution is
    non-degenerate).  Per-block distinct (user, week, type) combiner ->
    one user-bucketed exchange -> per-(user, week) type counts inside
    the bucket -> a tiny histogram fold.  Week bucketing shares
    events_weekly's integer Monday-epoch math."""
    ev = _read(sf_dir, "events", ["user_id", "ts", "event_type"])

    def prep(b: pa.Table) -> pa.Table:
        us = b["ts"].cast(pa.int64()).to_numpy(zero_copy_only=False)
        days = us // DAY_US
        week = (days + WEEK_SHIFT_DAYS) // 7
        df = pd.DataFrame({
            "user_id": b["user_id"].to_numpy(zero_copy_only=False),
            "week": week,
            "event_type": b["event_type"].to_pandas(),
        }).drop_duplicates()
        return pa.Table.from_pandas(df, preserve_index=False)

    def per_user(g: pd.DataFrame) -> pd.DataFrame:
        d = g.drop_duplicates()
        c = d.groupby(["user_id", "week"], sort=False).size()
        h = c.value_counts()
        out = pd.DataFrame({"n_types": h.index.astype(np.int64),
                            "n_user_weeks": h.to_numpy().astype(np.int64)})
        return out

    prepped = ev.map_batches(prep, batch_format="pyarrow",
                             batch_size=65536)
    partials = bucketed_group_apply(prepped, ["user_id"], per_user)
    return combined_groupby_sum(partials, ["n_types"], ["n_user_weeks"])


SQL_POWER_USERS = f"""
WITH c AS (SELECT user_id,
                  (epoch_us(ts) // {DAY_US} + {WEEK_SHIFT_DAYS}) // 7
                    AS week,
                  CAST(COUNT(DISTINCT event_type) AS BIGINT) AS n_types
           FROM events GROUP BY user_id, week)
SELECT n_types, CAST(COUNT(*) AS BIGINT) AS n_user_weeks
FROM c GROUP BY n_types
""".strip()
