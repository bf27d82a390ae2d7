"""Syndication link graph + distributed fixed-point host ranking.

The Common-Crawl-style analog of a hyperlink graph that the synthetic
corpus actually carries: when a page's text duplicates a page FIRST seen
on a different host, that is a syndication edge (duplicating host ->
origin host).  Two operators (reference analog: none — graft breadth for
the webtext payload; oracle twins are exact DuckDB SQL):

- ``syndication_graph``: the weighted host->host edge list
  (src_host, dst_host, n_pages).
- ``host_rank``: PageRank over that graph in EXACT int64 fixed-point
  arithmetic (micro-units, damping 85/100, ``n_iters`` unrolled power
  iterations) so the oracle twin hash-matches bit-for-bit — origins of
  widely-syndicated content accumulate rank.

Ray shape (the iterative-graph pattern, complementing dup_clusters'
label propagation and kmeans' centroid folds):
- the edge list shares ``dedup.attach_rep_doc`` with
  paradedup.cross_host_dup (one bucketed ``hash_join`` of the skinny
  (doc_id, text_md5) page projection against the distinct-text rep
  table), then per-block (src, dst) partials feed a
  host-pair-dimension-sized ``combined_groupby_sum`` — page volume is
  touched exactly once;
- the graph (edges + static out-degree, attached via one node-dimension
  join) is materialized ONCE and re-streamed per iteration — the standard
  Pregel tradeoff: the graph lives in the object store, page data does
  not;
- each power iteration is one bucketed edges-join-ranks pass + one
  node-dimension inflow groupby + one node-dimension left join — no
  broadcast of the rank vector, so host universes far beyond
  driver/worker memory stream through the same topology (the scale path
  dup_clusters already exercises).

Fixed-point contract (mirrored expression-for-expression in the SQL):
``r0 = 1_000_000`` per node; per edge ``contrib = (r_src * w) // ow_src``;
``r' = 150_000 + (85 * inflow) // 100``.  All quantities non-negative
int64, so numpy floor division == DuckDB ``//`` truncation.  Dangling
mass (hosts with no outgoing edges) is dropped by both sides alike.
"""

from __future__ import annotations

import numpy as np
import pyarrow as pa
import pyarrow.compute as pc
import ray.data

from ..sources.pages import N_HOSTS
from .dedup import attach_rep_doc
from .hashjoin import hash_join

R0 = 1_000_000
BASE = 150_000  # (100 - DAMP) * R0 // 100
DAMP = 85
DEFAULT_ITERS = 3


def _edge_rows(pages: ray.data.Dataset,
               reps: ray.data.Dataset | None = None) -> ray.data.Dataset:
    """(host_idx=src, dst_idx) one row per syndicated page — the shared
    page/rep attribution join (dedup.attach_rep_doc, same input
    cross_host_dup folds), filtered to cross-host pairs.  ``reps``: the
    memoized dedup.rep_groups artifact when the corpus is an sf_dir."""
    joined = attach_rep_doc(pages, reps=reps)

    def to_edges(b: pa.Table) -> pa.Table:
        doc = b["doc_id"].to_numpy(zero_copy_only=False)
        rep = b["rep_doc_id"].to_numpy(zero_copy_only=False)
        src = doc % N_HOSTS
        dst = rep % N_HOSTS
        cross = src != dst  # implies doc != rep (same doc -> same host)
        return pa.table({"host_idx": pa.array(src[cross].astype(np.int64)),
                         "dst_idx": pa.array(dst[cross].astype(np.int64))})

    return joined.map_batches(to_edges, batch_format="pyarrow",
                              batch_size=65536)


def syndication_edges(pages: ray.data.Dataset,
                      reps: ray.data.Dataset | None = None
                      ) -> ray.data.Dataset:
    """Weighted edge list (host_idx=src, dst_idx, w) — each page row that
    duplicates a different-host origin contributes 1 to its host pair."""
    from ..pipelines.relational import combined_groupby_sum

    return combined_groupby_sum(_edge_rows(pages, reps=reps),
                                ["host_idx", "dst_idx"], [],
                                count_alias="w")


def syndication_graph(sf_dir: str) -> ray.data.Dataset:
    """-> (src_host, dst_host, n_pages): the syndication edge list with
    the url-contract host strings."""
    from ..sources.pages import read_pages

    from ..stages.dedup import rep_groups

    edges = syndication_edges(read_pages(sf_dir, columns=["doc_id", "text"]),
                              reps=rep_groups(sf_dir))

    def named(b: pa.Table) -> pa.Table:
        from ..sources.pages import host_str_from_idx

        return pa.table({"src_host": host_str_from_idx(b["host_idx"]),
                         "dst_host": host_str_from_idx(b["dst_idx"]),
                         "n_pages": b["w"]})

    return edges.map_batches(named, batch_format="pyarrow")


def host_rank(sf_dir: str, n_iters: int = DEFAULT_ITERS) -> ray.data.Dataset:
    """-> (host, rank_score): ``n_iters`` fixed-point PageRank iterations
    over the syndication graph, one row per host that has any page."""
    from ..sources.pages import read_pages

    # the node-universe pass needs ONLY doc_id — a separate projection so
    # PageSynth never synthesizes the text column for it (r3 review: unused
    # payload synthesis roughly doubles the hot input stage)
    from ..stages.dedup import rep_groups

    return host_rank_pages(read_pages(sf_dir, columns=["doc_id", "text"]),
                           n_iters=n_iters,
                           id_pages=read_pages(sf_dir, columns=["doc_id"]),
                           reps=rep_groups(sf_dir))


SMALL_NODE_LIMIT = 2_000_000  # broadcast fast path: rank vector <= ~16 MB


def _node_universe(id_pages: ray.data.Dataset) -> ray.data.Dataset:
    """Materialized (host_idx) Dataset of every host with >= 1 page —
    node-dimension-sized (per-block unique + one bucketed distinct)."""
    from ..pipelines.relational import combined_groupby_sum

    def host_partial(b: pa.Table) -> pa.Table:
        h = np.unique(b["doc_id"].to_numpy(zero_copy_only=False) % N_HOSTS)
        return pa.table({"host_idx": pa.array(h.astype(np.int64))})

    return combined_groupby_sum(
        id_pages.map_batches(host_partial, batch_format="pyarrow",
                             batch_size=65536),
        ["host_idx"], [], count_alias="n_blocks",
    ).select_columns(["host_idx"]).materialize()


def host_rank_pages(pages: ray.data.Dataset,
                    n_iters: int = DEFAULT_ITERS,
                    id_pages: ray.data.Dataset | None = None,
                    reps: ray.data.Dataset | None = None
                    ) -> ray.data.Dataset:
    """PageRank over any (doc_id, text) Dataset — see :func:`host_rank`.

    Two iteration engines behind one contract (the dup_clusters pattern:
    a bounded fast path + the fully-distributed general path):
    - node count <= SMALL_NODE_LIMIT: the rank/out-degree vectors are
      node-dimension-sized, so each iteration is ONE map pass over the
      materialized graph with the vectors broadcast via ``ray.put`` (the
      kmeans centroid-fold shape) — per-block contrib partials, driver
      folds a node-sized frame;
    - beyond it: per-iteration bucketed edges-join-ranks + inflow groupby
      + node-dimension left join, nothing node-sized on the driver.
    Both paths run the identical integer arithmetic, so results are
    bit-equal (pinned by tests/test_linkrank.py)."""
    from ..pipelines.relational import combined_groupby_sum

    # the graph is materialized once and re-streamed per iteration (the
    # Pregel tradeoff — see module doc)
    edges = syndication_edges(pages, reps=reps).materialize()

    # node universe = every host with >= 1 page (node-dimension-sized);
    # id_pages lets callers pass a doc_id-only projection for this pass
    nodes = _node_universe(id_pages if id_pages is not None else pages)

    if nodes.count() <= SMALL_NODE_LIMIT:
        return _rank_broadcast(edges, nodes, n_iters)
    return _rank_joins(edges, nodes, n_iters)


def _rank_broadcast(edges: ray.data.Dataset, nodes: ray.data.Dataset,
                    n_iters: int) -> ray.data.Dataset:
    """Broadcast-vector iterations: one map pass over the graph per round."""
    import ray

    from ..pipelines.relational import combined_groupby_sum
    from ..sources.pages import cached_get

    hosts = np.sort(nodes.to_pandas()["host_idx"].to_numpy())
    # global out-degree, distributed fold to a node-sized frame
    ow_df = combined_groupby_sum(
        edges.select_columns(["host_idx", "w"]), ["host_idx"], ["w"],
    ).to_pandas()
    ow = np.zeros(hosts.size, np.int64)
    if len(ow_df):  # an edgeless graph folds to a column-less empty frame
        ow[np.searchsorted(hosts, ow_df["host_idx"].to_numpy())] = \
            ow_df["w"].to_numpy()
    r = np.full(hosts.size, R0, np.int64)

    for _ in range(n_iters):
        ref = ray.put((hosts, r.copy(), ow))

        def contrib(b: pa.Table, _ref=ref) -> pa.Table:
            hs, rv, owv = cached_get(_ref)
            src = b["host_idx"].to_numpy(zero_copy_only=False)
            w = b["w"].to_numpy(zero_copy_only=False)
            pos = np.searchsorted(hs, src)
            if rv.size and w.size and \
                    int(rv.max()) * int(w.max()) >= 2**62:
                raise ValueError("host_rank fixed-point overflow: r*w "
                                 "exceeds int64 headroom")
            c = (rv[pos] * w) // owv[pos]  # every src has ow >= w > 0
            dst = b["dst_idx"].to_numpy(zero_copy_only=False)
            u, inv = np.unique(dst, return_inverse=True)
            # int64 scatter-add (bincount's float weights would round
            # past 2^53)
            acc = np.zeros(u.size, np.int64)
            np.add.at(acc, inv, c)
            return pa.table({"host_idx": pa.array(u.astype(np.int64)),
                             "c": pa.array(acc)})

        parts = edges.map_batches(contrib, batch_format="pyarrow",
                                  batch_size=65536).to_pandas()
        inflow = np.zeros(hosts.size, np.int64)
        if len(parts):
            inflow_df = parts.groupby("host_idx", as_index=False)["c"].sum()
            inflow[np.searchsorted(hosts,
                                   inflow_df["host_idx"].to_numpy())] = \
                inflow_df["c"].to_numpy().astype(np.int64)
        r = BASE + (DAMP * inflow) // 100

    out = pa.table({"host_idx": pa.array(hosts), "r": pa.array(r)})
    from ..sources.pages import host_str_from_idx

    named = pa.table({"host": host_str_from_idx(out["host_idx"]),
                      "rank_score": out["r"]})
    return ray.data.from_arrow(named)


def _rank_joins(edges: ray.data.Dataset, nodes: ray.data.Dataset,
                n_iters: int) -> ray.data.Dataset:
    """Fully-distributed iterations for node universes past the broadcast
    budget — nothing node-sized ever lands on the driver."""
    from ..pipelines.relational import combined_groupby_sum

    outw = combined_groupby_sum(
        edges.select_columns(["host_idx", "w"]), ["host_idx"], ["w"],
    ).map_batches(lambda b: b.rename_columns(["host_idx", "ow"]),
                  batch_format="pyarrow")
    graph = hash_join(
        edges, outw, "host_idx",
        ["host_idx", "dst_idx", "w"], ["host_idx", "ow"],
        types={"dst_idx": pa.int64(), "w": pa.int64(), "ow": pa.int64()},
    ).materialize()

    def seed(b: pa.Table) -> pa.Table:
        return b.append_column("r", pa.array(
            np.full(b.num_rows, R0, np.int64)))

    ranks = nodes.map_batches(seed, batch_format="pyarrow").materialize()

    for _ in range(n_iters):
        j = hash_join(
            graph, ranks, "host_idx",
            ["host_idx", "dst_idx", "w", "ow"], ["host_idx", "r"],
            types={"dst_idx": pa.int64(), "w": pa.int64(),
                   "ow": pa.int64(), "r": pa.int64()})

        def contrib(b: pa.Table) -> pa.Table:
            r = b["r"].to_numpy(zero_copy_only=False)
            w = b["w"].to_numpy(zero_copy_only=False)
            ow = b["ow"].to_numpy(zero_copy_only=False)
            if r.size and int(r.max()) * int(w.max()) >= 2**62:
                raise ValueError("host_rank fixed-point overflow: r*w "
                                 "exceeds int64 headroom")
            c = (r * w) // ow
            return pa.table({"host_idx": b["dst_idx"],
                             "c": pa.array(c.astype(np.int64))})

        inflow = combined_groupby_sum(
            j.map_batches(contrib, batch_format="pyarrow",
                          batch_size=65536),
            ["host_idx"], ["c"])
        merged = hash_join(
            nodes, inflow, "host_idx",
            ["host_idx"], ["host_idx", "c"], how="left",
            types={"c": pa.int64()})

        def damp(b: pa.Table) -> pa.Table:
            c = pc.fill_null(b["c"], 0).to_numpy(zero_copy_only=False)
            r = BASE + (DAMP * c) // 100
            return pa.table({"host_idx": b["host_idx"],
                             "r": pa.array(r.astype(np.int64))})

        # node-dimension-sized materialization per iteration (the kmeans
        # centroid pattern) — the alternative re-executes every prior
        # iteration's joins on each pass
        ranks = merged.map_batches(damp, batch_format="pyarrow").materialize()

    def named(b: pa.Table) -> pa.Table:
        from ..sources.pages import host_str_from_idx

        return pa.table({"host": host_str_from_idx(b["host_idx"]),
                         "rank_score": b["r"]})

    return ranks.map_batches(named, batch_format="pyarrow")


def host_components(sf_dir: str) -> ray.data.Dataset:
    """-> (host, community): syndication communities — connected components
    of the UNDIRECTED syndication graph, labelled by the component's min
    host index; hosts with pages but no syndication edges are their own
    singleton community.

    Reuses dedup.connected_components (distributed min-label propagation,
    bounded union-find fast path) on the host-pair edge list, then one
    node-dimension left join attaches singleton hosts.  Oracle twin: a
    WITH RECURSIVE transitive-closure min over the same undirected edges —
    the registry's first recursive-SQL oracle."""
    from ..sources.pages import read_pages
    from .dedup import connected_components

    from .dedup import rep_groups

    pages = read_pages(sf_dir, columns=["doc_id", "text"])
    edges = syndication_edges(pages, reps=rep_groups(sf_dir))

    def as_pairs(b: pa.Table) -> pa.Table:
        return pa.table({"doc_a": b["host_idx"], "doc_b": b["dst_idx"]})

    comp = connected_components(
        edges.map_batches(as_pairs, batch_format="pyarrow"))

    def renamed(b: pa.Table) -> pa.Table:
        return b.rename_columns(["host_idx", "community"])

    comp = comp.map_batches(renamed, batch_format="pyarrow")
    nodes = _node_universe(read_pages(sf_dir, columns=["doc_id"]))

    if nodes.count() <= SMALL_NODE_LIMIT:
        # both sides are node-dimension-sized: the singleton attach is a
        # driver merge (the split_assign pattern) — the bucketed join
        # below costs ~2 s of pure shuffle overhead for <=1000-row inputs
        import pandas as pd

        from ..sources.pages import host_str_from_idx

        out = nodes.to_pandas().merge(comp.to_pandas(), on="host_idx",
                                      how="left")
        host_idx = out["host_idx"].to_numpy().astype(np.int64)
        community = np.where(out["community"].isna(), host_idx,
                             out["community"].fillna(0).to_numpy()
                             ).astype(np.int64)
        t = pa.table({"host_idx": pa.array(host_idx),
                      "community": pa.array(community)})
        return ray.data.from_arrow(pa.table({
            "host": host_str_from_idx(t["host_idx"]),
            "community": t["community"]}))

    merged = hash_join(
        nodes, comp,
        "host_idx", ["host_idx"], ["host_idx", "community"], how="left",
        types={"community": pa.int64()})

    def named(b: pa.Table) -> pa.Table:
        from ..sources.pages import host_str_from_idx

        community = pc.coalesce(b["community"], b["host_idx"])
        return pa.table({"host": host_str_from_idx(b["host_idx"]),
                         "community": community.cast(pa.int64())})

    return merged.map_batches(named, batch_format="pyarrow")


SQL_HOST_COMPONENTS = f"""
, reps AS (
  SELECT md5(text) AS m, MIN(doc_id) AS rep FROM pages GROUP BY md5(text)
), edges AS (
  SELECT DISTINCT doc_id % {N_HOSTS} AS src, rep % {N_HOSTS} AS dst
  FROM pages JOIN reps ON md5(text) = m
  WHERE doc_id % {N_HOSTS} <> rep % {N_HOSTS}
), und AS (
  SELECT src, dst FROM edges UNION SELECT dst, src FROM edges
), reach AS (
  WITH RECURSIVE r(node, lbl) AS (
    SELECT src, src FROM und
    UNION
    SELECT u.dst, r.lbl FROM r JOIN und u ON u.src = r.node
  )
  SELECT node, MIN(lbl) AS comp FROM r GROUP BY node
), nodes AS (
  SELECT DISTINCT doc_id % {N_HOSTS} AS h FROM pages
)
SELECT 'site' || lpad(CAST(n.h AS VARCHAR), 4, '0') || '.example' AS host,
       CAST(COALESCE(reach.comp, n.h) AS BIGINT) AS community
FROM nodes n LEFT JOIN reach ON reach.node = n.h
""".strip()


SQL_SYNDICATION_GRAPH = f"""
, reps AS (
  SELECT md5(text) AS m, MIN(doc_id) AS rep FROM pages GROUP BY md5(text)
)
SELECT 'site' || lpad(CAST(doc_id % {N_HOSTS} AS VARCHAR), 4, '0') || '.example' AS src_host,
       'site' || lpad(CAST(rep % {N_HOSTS} AS VARCHAR), 4, '0') || '.example' AS dst_host,
       CAST(COUNT(*) AS BIGINT) AS n_pages
FROM pages JOIN reps ON md5(text) = m
WHERE doc_id % {N_HOSTS} <> rep % {N_HOSTS}
GROUP BY 1, 2
""".strip()


def sql_host_rank(n_iters: int = DEFAULT_ITERS) -> str:
    """The fixed-point twin, ``n_iters`` unrolled power iterations."""
    parts = [f"""
, reps AS (
  SELECT md5(text) AS m, MIN(doc_id) AS rep FROM pages GROUP BY md5(text)
), edges AS (
  SELECT doc_id % {N_HOSTS} AS src, rep % {N_HOSTS} AS dst,
         CAST(COUNT(*) AS BIGINT) AS w
  FROM pages JOIN reps ON md5(text) = m
  WHERE doc_id % {N_HOSTS} <> rep % {N_HOSTS}
  GROUP BY 1, 2
), outw AS (
  SELECT src, CAST(SUM(w) AS BIGINT) AS ow FROM edges GROUP BY src
), nodes AS (
  SELECT DISTINCT doc_id % {N_HOSTS} AS h FROM pages
), r0 AS (
  SELECT h, CAST({R0} AS BIGINT) AS r FROM nodes
)""".strip()]
    for i in range(1, n_iters + 1):
        parts.append(f"""
, c{i} AS (
  SELECT e.dst AS h, CAST(SUM((p.r * e.w) // o.ow) AS BIGINT) AS c
  FROM edges e
  JOIN r{i - 1} p ON p.h = e.src
  JOIN outw o ON o.src = e.src
  GROUP BY e.dst
), r{i} AS (
  SELECT n.h,
         CAST({BASE} + ({DAMP} * COALESCE(c{i}.c, 0)) // 100 AS BIGINT) AS r
  FROM nodes n LEFT JOIN c{i} ON c{i}.h = n.h
)""".strip())
    parts.append(f"""
SELECT 'site' || lpad(CAST(h AS VARCHAR), 4, '0') || '.example' AS host,
       r AS rank_score
FROM r{n_iters}
""".strip())
    return "\n".join(parts)


# --- single-source BFS distance: the graph family's SSSP member --------------

MAX_BFS_HOPS = 32


def host_distance(sf_dir: str, force_distributed: bool = False
                  ) -> ray.data.Dataset:
    """-> (host, dist): BFS hop count from the deterministic ROOT host
    (the minimum host index carrying any syndication edge) over the
    UNDIRECTED syndication graph — single-source shortest paths, rounding
    out the graph family (host_components = reachability, host_rank =
    centrality, this = distance).  Hosts unreachable from the root are
    absent (inner semantics); the root itself has dist 0.

    Two bit-equal paths (the host_rank pattern, equality pinned in
    tests/test_linkrank.py):
    - edge lists under ``dedup.SMALL_EDGE_LIMIT``: one driver BFS over
      dense numpy frontier masks (per hop: one gather + one unvisited
      filter, no Python per node);
    - above it (or ``force_distributed``): distributed Bellman-Ford —
      per hop ONE bucketed ``hash_join`` of the current dist table
      against the materialized undirected edge list (graph streamed from
      the object store, never the driver), a union with the previous
      dists, and one single-key grouped MIN fold; converges when the
      (count, sum) signature of the node-dimension dist table stops
      changing.  Hop count is diameter-bounded (cap ``MAX_BFS_HOPS``,
      matching the oracle's recursion cap)."""
    from ..pipelines.relational import combined_groupby_sum
    from ..sources.pages import host_str_from_idx, read_pages
    from .dedup import SMALL_EDGE_LIMIT, rep_groups

    pages = read_pages(sf_dir, columns=["doc_id", "text"])
    edges = syndication_edges(pages, reps=rep_groups(sf_dir))

    def both_dirs(b: pa.Table) -> pa.Table:
        s = b["host_idx"].to_numpy(zero_copy_only=False)
        d = b["dst_idx"].to_numpy(zero_copy_only=False)
        return pa.table({"src": pa.array(np.concatenate([s, d])),
                         "dst": pa.array(np.concatenate([d, s]))})

    und = combined_groupby_sum(
        edges.map_batches(both_dirs, batch_format="pyarrow"),
        ["src", "dst"], [], count_alias="__n") \
        .select_columns(["src", "dst"]).materialize()

    empty = pa.table({"host": pa.array([], pa.string()),
                      "dist": pa.array([], pa.int64())})
    if und.count() == 0:
        return ray.data.from_arrow(empty)

    dist = bfs_hops(und, force_distributed=force_distributed)

    def named(b: pa.Table) -> pa.Table:
        return pa.table({"host": host_str_from_idx(b["node"]),
                         "dist": b["d"].cast(pa.int64())})

    return dist.map_batches(named, batch_format="pyarrow")


def bfs_hops(und: ray.data.Dataset, force_distributed: bool = False
             ) -> ray.data.Dataset:
    """(node, d) BFS hop counts from ``min(src)`` over a MATERIALIZED
    undirected (src, dst) edge Dataset — both host_distance paths; see
    its docstring for the shape contract."""
    from ..sources.pages import host_str_from_idx  # noqa: F401 (doc link)
    from .dedup import SMALL_EDGE_LIMIT

    n_edges = und.count()
    if n_edges <= SMALL_EDGE_LIMIT and not force_distributed:
        df = und.to_pandas()  # host-pair-dimension-sized (bounded)
        src = df["src"].to_numpy().astype(np.int64)
        dst = df["dst"].to_numpy().astype(np.int64)
        root = int(src.min())
        n_dense = int(max(src.max(), dst.max())) + 1
        dist = np.full(n_dense, -1, np.int64)
        dist[root] = 0
        frontier = np.array([root], np.int64)
        for d in range(1, MAX_BFS_HOPS + 1):
            fmask = np.zeros(n_dense, bool)
            fmask[frontier] = True
            nxt = np.unique(dst[fmask[src]])
            nxt = nxt[dist[nxt] < 0]
            if nxt.size == 0:
                break
            dist[nxt] = d
            frontier = nxt
        reach = np.flatnonzero(dist >= 0)
        return ray.data.from_arrow(pa.table({
            "node": pa.array(reach),
            "d": pa.array(dist[reach])}))

    # distributed Bellman-Ford (node-dim dist table, edge list streamed)
    root = int(und.min("src"))
    dist = ray.data.from_arrow(pa.table({
        "node": pa.array([root], pa.int64()),
        "d": pa.array([0], pa.int64())}))
    renamed = und.map_batches(
        lambda b: b.rename_columns(["node", "dst"]),
        batch_format="pyarrow").materialize()
    prev_sig = (1, 0)
    for _ in range(MAX_BFS_HOPS):
        stepped = hash_join(dist, renamed, "node", ["node", "d"],
                            ["node", "dst"],
                            types={"d": pa.int64(), "dst": pa.int64()})

        def bump(b: pa.Table) -> pa.Table:
            return pa.table({"node": b["dst"],
                             "d": pc.add(b["d"], 1).cast(pa.int64())})

        cand = stepped.map_batches(bump, batch_format="pyarrow").union(dist)
        # node is row-scale on a general graph: bucket-hash fold (r5,
        # grouping.bucketed_agg) instead of the cardinality-cliffed
        # native aggregate
        from .grouping import bucketed_agg
        dist = bucketed_agg(cand, ["node"], {"d": "min"}).materialize()
        sig = (dist.count(), int(dist.sum("d")))
        if sig == prev_sig:
            break
        prev_sig = sig
    return dist


SQL_HOST_DISTANCE = f"""
, reps AS (
  SELECT md5(text) AS m, MIN(doc_id) AS rep FROM pages GROUP BY md5(text)
), edges AS (
  SELECT DISTINCT doc_id % {N_HOSTS} AS src, rep % {N_HOSTS} AS dst
  FROM pages JOIN reps ON md5(text) = m
  WHERE doc_id % {N_HOSTS} <> rep % {N_HOSTS}
), und AS (
  SELECT src, dst FROM edges UNION SELECT dst, src FROM edges
), bfs AS (
  WITH RECURSIVE b(node, d) AS (
    SELECT MIN(src), 0 FROM und
    UNION
    SELECT u.dst, b.d + 1 FROM b JOIN und u ON u.src = b.node
    WHERE b.d < {MAX_BFS_HOPS}
  )
  SELECT node, MIN(d) AS dist FROM b GROUP BY node
)
SELECT 'site' || lpad(CAST(node AS VARCHAR), 4, '0') || '.example' AS host,
       CAST(dist AS BIGINT) AS dist
FROM bfs
""".strip()
