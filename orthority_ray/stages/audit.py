"""Data-quality audit operators: FK-orphan counts and column profiling.

The checks a 100-TB ingest runs before anything downstream trusts the
data (reference analog: none — graft breadth for the relational payload;
oracle twins are exact DuckDB SQL):

- ``fk_orphan_counts``: for every declared FK relation, how many fact rows
  reference a missing dimension key (LEFT JOIN ... IS NULL semantics).
- ``table_profile``: per integer column, row count / null count / min /
  max in ONE pass.

Ray shape:
- dimension key sets (customer, supplier, part, nation, region) broadcast
  ONCE as sorted key arrays via ``ray.put`` and probed per block with a
  vectorized ``np.searchsorted`` membership test — no shuffle;
- the one large-side relation (lineitem -> orders) goes through the
  bucketed ``hash_join(how="anti")`` and a per-block count, so neither
  side is ever collected;
- every audit emits one per-block partial row; the final reduce is a
  relation-/column-sized driver fold.
"""

from __future__ import annotations

import numpy as np
import pandas as pd
import pyarrow as pa
import ray
import ray.data

from ..core.config import table_path

# (fact table, fact key, dim table, dim key); lineitem->orders is handled
# separately through the anti join because orders is fact-sized
DIM_RELATIONS = [
    ("lineitem", "l_partkey", "part", "p_partkey"),
    ("lineitem", "l_suppkey", "supplier", "s_suppkey"),
    ("orders", "o_custkey", "customer", "c_custkey"),
    ("customer", "c_nationkey", "nation", "n_nationkey"),
    ("supplier", "s_nationkey", "nation", "n_nationkey"),
    ("nation", "n_regionkey", "region", "r_regionkey"),
]


def _sorted_keys(sf_dir: str, table: str, col: str) -> np.ndarray:
    import pyarrow.parquet as pq

    t = pq.read_table(table_path(sf_dir, table), columns=[col])
    return np.sort(t[col].to_numpy().astype(np.int64))


def _member(keys: np.ndarray, sorted_set: np.ndarray) -> np.ndarray:
    if sorted_set.size == 0:
        return np.zeros(keys.shape[0], dtype=bool)
    idx = np.clip(np.searchsorted(sorted_set, keys), 0, sorted_set.size - 1)
    return sorted_set[idx] == keys


def fk_orphan_counts(sf_dir: str) -> pd.DataFrame:
    """(relation, n_rows, n_orphans) for every FK relation — the broadcast
    dims via one membership probe per block; lineitem->orders via the
    bucketed anti join."""
    from ..pipelines.relational import _read
    from ..sources.pages import cached_get
    from .hashjoin import hash_join

    # ONE probe pass per fact table: all of a fact's FK columns read and
    # checked together (lineitem's part+supp probes share a single scan),
    # each block emitting one partial row per relation
    by_fact: dict[str, list[tuple[str, str, str]]] = {}
    for fact, fkey, dim, dkey in DIM_RELATIONS:
        by_fact.setdefault(fact, []).append((fkey, dim, dkey))

    # one lazy probe Dataset per fact table, UNIONed so the streaming
    # executor overlaps every table's scan instead of blocking on each
    # .to_pandas() in turn (r3 review: the loop serialized 5 passes)
    probe_parts = []
    for fact, rels in by_fact.items():
        refs = [(fkey, dim, ray.put(_sorted_keys(sf_dir, dim, dkey)))
                for fkey, dim, dkey in rels]

        def probe(b: pa.Table, _fact=fact, _refs=refs) -> pa.Table:
            names, n, orph = [], [], []
            for fkey, dim, ref in _refs:
                ks = cached_get(ref)
                k = b[fkey].to_numpy(zero_copy_only=False).astype(np.int64)
                names.append(f"{_fact}->{dim}")
                n.append(len(k))
                orph.append(int((~_member(k, ks)).sum()))
            return pa.table({
                "relation": pa.array(names, pa.string()),
                "n_rows": pa.array(np.array(n, np.int64)),
                "n_orphans": pa.array(np.array(orph, np.int64))})

        probe_parts.append(
            _read(sf_dir, fact, [fkey for fkey, _, _ in rels])
            .map_batches(probe, batch_format="pyarrow", batch_size=65536))

    part = probe_parts[0].union(*probe_parts[1:]).to_pandas()
    counts: dict[str, tuple[int, int]] = {}
    fold = part.groupby("relation")[["n_rows", "n_orphans"]].sum()
    for rel, r in fold.iterrows():
        counts[rel] = (int(r["n_rows"]), int(r["n_orphans"]))

    # lineitem -> orders: both sides fact-sized, so membership goes through
    # the bucketed anti join (no dense/broadcast structure fits at scale);
    # the denominator reuses the probe pass's lineitem row count
    li = _read(sf_dir, "lineitem", ["l_orderkey"])
    n_li = counts["lineitem->part"][0] if "lineitem->part" in counts else \
        int(li.count())
    ords = _read(sf_dir, "orders", ["o_orderkey"])

    def okey(b: pa.Table) -> pa.Table:
        return pa.table({"l_orderkey": b["o_orderkey"]})

    orphans = hash_join(
        li, ords.map_batches(okey, batch_format="pyarrow"),
        "l_orderkey", ["l_orderkey"], ["l_orderkey"], how="anti",
    )
    counts["lineitem->orders"] = (n_li, int(orphans.count()))

    order = [f"{fact}->{dim}" for fact, _, dim, _ in DIM_RELATIONS]
    order.append("lineitem->orders")
    # an empty fact table yields no partial rows -> (0, 0), matching SQL
    rows = [(rel, *counts.get(rel, (0, 0))) for rel in order]
    out = pd.DataFrame(rows, columns=["relation", "n_rows", "n_orphans"])
    out["n_rows"] = out["n_rows"].astype(np.int64)
    out["n_orphans"] = out["n_orphans"].astype(np.int64)
    return out


SQL_FK_ORPHANS = """
SELECT 'orders->customer' AS relation,
       CAST((SELECT COUNT(*) FROM orders) AS BIGINT) AS n_rows,
       CAST((SELECT COUNT(*) FROM orders o LEFT JOIN customer c
             ON o.o_custkey = c.c_custkey WHERE c.c_custkey IS NULL) AS BIGINT) AS n_orphans
UNION ALL
SELECT 'customer->nation',
       CAST((SELECT COUNT(*) FROM customer) AS BIGINT),
       CAST((SELECT COUNT(*) FROM customer c LEFT JOIN nation n
             ON c.c_nationkey = n.n_nationkey WHERE n.n_nationkey IS NULL) AS BIGINT)
UNION ALL
SELECT 'supplier->nation',
       CAST((SELECT COUNT(*) FROM supplier) AS BIGINT),
       CAST((SELECT COUNT(*) FROM supplier s LEFT JOIN nation n
             ON s.s_nationkey = n.n_nationkey WHERE n.n_nationkey IS NULL) AS BIGINT)
UNION ALL
SELECT 'nation->region',
       CAST((SELECT COUNT(*) FROM nation) AS BIGINT),
       CAST((SELECT COUNT(*) FROM nation n LEFT JOIN region r
             ON n.n_regionkey = r.r_regionkey WHERE r.r_regionkey IS NULL) AS BIGINT)
UNION ALL
SELECT 'lineitem->part',
       CAST((SELECT COUNT(*) FROM lineitem) AS BIGINT),
       CAST((SELECT COUNT(*) FROM lineitem l LEFT JOIN part p
             ON l.l_partkey = p.p_partkey WHERE p.p_partkey IS NULL) AS BIGINT)
UNION ALL
SELECT 'lineitem->supplier',
       CAST((SELECT COUNT(*) FROM lineitem) AS BIGINT),
       CAST((SELECT COUNT(*) FROM lineitem l LEFT JOIN supplier s
             ON l.l_suppkey = s.s_suppkey WHERE s.s_suppkey IS NULL) AS BIGINT)
UNION ALL
SELECT 'lineitem->orders',
       CAST((SELECT COUNT(*) FROM lineitem) AS BIGINT),
       CAST((SELECT COUNT(*) FROM lineitem l LEFT JOIN orders o
             ON l.l_orderkey = o.o_orderkey WHERE o.o_orderkey IS NULL) AS BIGINT)
""".strip()


PROFILE_COLUMNS = ("l_orderkey", "l_partkey", "l_suppkey", "l_linenumber")


def table_profile(sf_dir: str, table: str = "lineitem",
                  cols: tuple[str, ...] = PROFILE_COLUMNS) -> pd.DataFrame:
    """(col_name, n_rows, n_null, min_v, max_v) per integer column, ONE pass:
    each block emits one partial row per column; the driver folds a
    column-count-sized frame."""
    from ..pipelines.relational import _read

    def partial(b: pa.Table) -> pa.Table:
        names, n, nn, mn, mx = [], [], [], [], []
        for c in cols:
            col = b[c]
            nulls = col.null_count
            k = col.drop_null().to_numpy(zero_copy_only=False).astype(np.int64)
            names.append(c)
            n.append(len(col))
            nn.append(nulls)
            mn.append(int(k.min()) if k.size else np.iinfo(np.int64).max)
            mx.append(int(k.max()) if k.size else np.iinfo(np.int64).min)
        return pa.table({
            "col_name": pa.array(names, pa.string()),
            "n_rows": pa.array(np.array(n, dtype=np.int64)),
            "n_null": pa.array(np.array(nn, dtype=np.int64)),
            "min_v": pa.array(np.array(mn, dtype=np.int64)),
            "max_v": pa.array(np.array(mx, dtype=np.int64)),
        })

    parts = (_read(sf_dir, table, list(cols))
             .map_batches(partial, batch_format="pyarrow", batch_size=65536)
             .to_pandas())
    if parts.empty:
        # SQL emits one row per column even for an empty table: counts 0,
        # MIN/MAX NULL
        return pd.DataFrame({
            "col_name": list(cols),
            "n_rows": np.zeros(len(cols), np.int64),
            "n_null": np.zeros(len(cols), np.int64),
            "min_v": pd.array([pd.NA] * len(cols), dtype="Int64"),
            "max_v": pd.array([pd.NA] * len(cols), dtype="Int64")})
    out = parts.groupby("col_name", as_index=False).agg(
        n_rows=("n_rows", "sum"), n_null=("n_null", "sum"),
        min_v=("min_v", "min"), max_v=("max_v", "max"))
    for c in ("n_rows", "n_null"):
        out[c] = out[c].astype(np.int64)
    # an all-null column folds to the int64 sentinels; SQL MIN/MAX is NULL
    all_null = (out["n_rows"] == out["n_null"]).to_numpy()
    if all_null.any():
        for c in ("min_v", "max_v"):
            out[c] = out[c].astype("Int64")
            out.loc[all_null, c] = pd.NA
    else:
        for c in ("min_v", "max_v"):
            out[c] = out[c].astype(np.int64)
    return out


def sql_table_profile(table: str = "lineitem",
                      cols: tuple[str, ...] = PROFILE_COLUMNS) -> str:
    parts = [
        (f"SELECT '{c}' AS col_name, CAST(COUNT(*) AS BIGINT) AS n_rows, "
         f"CAST(COUNT(*) - COUNT({c}) AS BIGINT) AS n_null, "
         f"CAST(MIN({c}) AS BIGINT) AS min_v, "
         f"CAST(MAX({c}) AS BIGINT) AS max_v FROM {table}")
        for c in cols
    ]
    return "\nUNION ALL\n".join(parts)


# --- id-gap detection: the data-completeness audit ---------------------------

GAP_BUCKET_W = 4096  # id-range width co-located per group


def id_gaps(sf_dir: str) -> ray.data.Dataset:
    """(gap_start, gap_end, gap_len): every maximal contiguous range of
    MISSING doc ids between the corpus' min and max id — the completeness
    audit that catches dropped partitions / half-written shards in a
    resumable ingest.

    Distributed islands-and-gaps with RANGE bucketing (contrast the hash
    bucketing everywhere else: adjacency is a RANGE property, so the
    co-location key is ``id // GAP_BUCKET_W``, which puts every in-bucket
    neighbor pair in one group):

    1. per-block distinct + range-bucket tag;
    2. one bucketed exchange; inside each bucket a vectorized sorted-diff
       emits the IN-BUCKET gaps (duplicates collapse here for free —
       an id determines its bucket);
    3. per-bucket (min_id, max_id) summaries — bucket-dimension-sized —
       fold on the driver, which stitches the CROSS-bucket gaps between
       consecutive non-empty buckets (covers any run of wholly-empty
       buckets in one range).

    Oracle twin: LEAD over the distinct ids."""
    import ray.data

    from ..pipelines.relational import combined_groupby_sum
    from ..sources.pages import read_page_keys
    from .grouping import bucketed_agg, bucketed_group_apply

    keys = read_page_keys(sf_dir)

    def tag(b: pa.Table) -> pa.Table:
        ids = np.unique(b["doc_id"].to_numpy(zero_copy_only=False))
        return pa.table({"id": pa.array(ids),
                         "rb": pa.array(ids // GAP_BUCKET_W)})

    tagged = keys.map_batches(tag, batch_format="pyarrow",
                              batch_size=65536)

    def in_bucket(g: pd.DataFrame) -> pd.DataFrame:
        out = []
        for _, grp in g.groupby("rb", sort=False):
            ids = np.unique(grp["id"].to_numpy())
            nxt = ids[1:]
            cur = ids[:-1]
            m = nxt > cur + 1
            out.append(pd.DataFrame({
                "gap_start": (cur[m] + 1).astype(np.int64),
                "gap_end": (nxt[m] - 1).astype(np.int64)}))
        df = (pd.concat(out, ignore_index=True) if out else pd.DataFrame(
            {"gap_start": np.array([], np.int64),
             "gap_end": np.array([], np.int64)}))
        # arrow blocks so the union with the boundary table is uniform
        return pa.Table.from_pandas(df, preserve_index=False)

    inner = bucketed_group_apply(tagged, ["rb"], in_bucket)

    def summary(b: pa.Table) -> pa.Table:
        df = pd.DataFrame({
            "rb": b["rb"].to_numpy(zero_copy_only=False),
            "min_id": b["id"].to_numpy(zero_copy_only=False),
            "max_id": b["id"].to_numpy(zero_copy_only=False),
        })
        g = df.groupby("rb", as_index=False).agg(
            min_id=("min_id", "min"), max_id=("max_id", "max"))
        return pa.Table.from_pandas(g, preserve_index=False)

    sums = bucketed_agg(tagged.map_batches(summary, batch_format="pyarrow",
                                           batch_size=65536),
                        ["rb"], {"min_id": "min", "max_id": "max"}) \
        .to_pandas().sort_values("rb")  # bucket-dimension-sized
    prev_max = sums["max_id"].to_numpy()[:-1]
    next_min = sums["min_id"].to_numpy()[1:]
    m = next_min > prev_max + 1
    boundary = pa.table({
        "gap_start": pa.array((prev_max[m] + 1).astype(np.int64)),
        "gap_end": pa.array((next_min[m] - 1).astype(np.int64))})

    both = inner.union(ray.data.from_arrow(boundary))

    def with_len(b: pa.Table) -> pa.Table:
        s = b["gap_start"].to_numpy(zero_copy_only=False).astype(np.int64)
        e = b["gap_end"].to_numpy(zero_copy_only=False).astype(np.int64)
        return pa.table({"gap_start": pa.array(s), "gap_end": pa.array(e),
                         "gap_len": pa.array(e - s + 1)})

    return both.map_batches(with_len, batch_format="pyarrow")


SQL_ID_GAPS = """
, ids AS (SELECT DISTINCT doc_id AS id FROM pages),
g AS (SELECT id, LEAD(id) OVER (ORDER BY id) AS nxt FROM ids)
SELECT id + 1 AS gap_start, nxt - 1 AS gap_end,
       nxt - id - 1 AS gap_len
FROM g WHERE nxt > id + 1
""".strip()


# --- join-key skew report: the shuffle-planning diagnostic -------------------

SKEW_KEYS = [
    ("lineitem", "l_orderkey"),
    ("lineitem", "l_suppkey"),
    ("lineitem", "l_partkey"),
    ("orders", "o_custkey"),
    ("events", "user_id"),
]


def skew_report(sf_dir: str) -> ray.data.Dataset:
    """(relation, key_name, hot_key, n_rows, total_rows, share_ppm): for
    every declared join key, its HOTTEST value and that value's share of
    the relation in integer parts-per-million — the skew diagnostic a
    shuffle planner (stages/hashjoin.plan_hash_join) consults, exposed
    as a first-class audit so a misdistributed key is visible before it
    melts a reducer.

    Ray shape: the per-key count streams (per-block combiners, tagged
    with a relation index) UNION into one dataset so all keys share ONE
    bucketed exchange (r5: five sequential exchanges cost 1.85 s; the
    fused single exchange ~0.6 s); per-block argmax+total partials then
    fold on the driver (one row per block per relation — tiny)."""
    import ray.data

    from ..pipelines.relational import combined_groupby_sum

    streams = []
    for idx, (rel, key) in enumerate(SKEW_KEYS):
        path = table_path(sf_dir, rel)
        ds = ray.data.read_parquet(path, columns=[key])

        def count_partial(b: pa.Table, _k=key, _i=idx) -> pa.Table:
            v = b[_k].to_numpy(zero_copy_only=False).astype(np.int64)
            u, c = np.unique(v, return_counts=True)
            return pa.table({"rel": pa.array(np.full(u.shape[0], _i,
                                                     np.int64)),
                             "k": pa.array(u),
                             "n": pa.array(c.astype(np.int64))})

        streams.append(ds.map_batches(count_partial,
                                      batch_format="pyarrow",
                                      batch_size=65536))
    union = streams[0]
    for s in streams[1:]:
        union = union.union(s)
    counts = combined_groupby_sum(union, ["rel", "k"], ["n"],
                                  bucketed=True)

    def block_partials(b: pa.Table) -> pa.Table:
        df = pd.DataFrame({
            "rel": b["rel"].to_numpy(zero_copy_only=False),
            "k": b["k"].to_numpy(zero_copy_only=False),
            "n": b["n"].to_numpy(zero_copy_only=False)})
        # per relation: this block's argmax row + its total
        d = df.sort_values(["rel", "n", "k"],
                           ascending=[True, False, True],
                           kind="mergesort")
        top = d.drop_duplicates("rel", keep="first")
        tot = df.groupby("rel", as_index=False)["n"].sum()             .rename(columns={"n": "tot"})
        out = top.merge(tot, on="rel")
        return pa.Table.from_pandas(out, preserve_index=False)

    parts = counts.map_batches(block_partials, batch_format="pyarrow",
                               batch_size=None).to_pandas()
    outs = []
    for idx, (rel, key) in enumerate(SKEW_KEYS):
        sub = parts[parts["rel"] == idx]
        tot = int(sub["tot"].sum())
        i = sub.sort_values(["n", "k"], ascending=[False, True]).index[0]
        outs.append({
            "relation": rel, "key_name": key,
            "hot_key": int(sub.loc[i, "k"]),
            "n_rows": int(sub.loc[i, "n"]),
            "total_rows": tot,
            "share_ppm": int(sub.loc[i, "n"]) * 1_000_000 // tot,
        })
    df = pd.DataFrame(outs)
    for c in ["hot_key", "n_rows", "total_rows", "share_ppm"]:
        df[c] = df[c].astype(np.int64)
    return ray.data.from_arrow(pa.Table.from_pandas(df,
                                                    preserve_index=False))


def sql_skew_report() -> str:
    parts = []
    for rel, key in SKEW_KEYS:
        parts.append(f"""
SELECT '{rel}' AS relation, '{key}' AS key_name,
       CAST(k AS BIGINT) AS hot_key, n AS n_rows, tot AS total_rows,
       CAST(n * 1000000 // tot AS BIGINT) AS share_ppm
FROM (
  SELECT {key} AS k, CAST(COUNT(*) AS BIGINT) AS n,
         CAST(SUM(COUNT(*)) OVER () AS BIGINT) AS tot,
         row_number() OVER (ORDER BY COUNT(*) DESC, {key}) AS rn
  FROM {rel} GROUP BY {key}
) WHERE rn = 1""".strip())
    return "\nUNION ALL\n".join(parts)
