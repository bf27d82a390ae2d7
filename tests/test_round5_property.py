"""Property tests for the round-5 primitives against brute-force
references: Hamming-1 neighbor counts, interval-union coverage, BFS hop
distances.  All three distributed implementations are compared to
O(n^2)/O(V*E) pure-Python references on small random inputs."""

from __future__ import annotations

import numpy as np
import pandas as pd
import pyarrow as pa
import ray.data
from hypothesis import given, settings
from hypothesis import strategies as st


# --- hamming_neighbors vs brute force ----------------------------------------


def _brute_hamming(ids):
    ids = sorted(set(ids))
    ks = [str(i).zfill(10) for i in ids]
    n = {}
    for i in range(len(ids)):
        for j in range(i + 1, len(ids)):
            diff = sum(a != b for a, b in zip(ks[i], ks[j]))
            if diff == 1:
                n[ids[i]] = n.get(ids[i], 0) + 1
                n[ids[j]] = n.get(ids[j], 0) + 1
    return n


@settings(max_examples=10, deadline=None)
@given(st.lists(st.integers(min_value=0, max_value=5000), min_size=1,
                max_size=120))
def test_hamming_neighbors_matches_brute_force(ids):
    from orthority_ray.stages.editdist import hamming_neighbors

    pages = ray.data.from_arrow(pa.table({
        "doc_id": pa.array(ids, pa.int64())}))
    out = hamming_neighbors(pages).to_pandas()
    if len(out) == 0:
        # empty Ray results drop their schema through map_groups; the
        # brute force must agree nothing qualifies
        assert _brute_hamming(ids) == {}
        return
    got = dict(zip(out["doc_id"], out["n_nbrs"]))
    assert got == _brute_hamming(ids)


# --- interval union vs brute force -------------------------------------------


def _brute_cover(ts_list, dur):
    ivs = sorted((t, t + dur) for t in ts_list)
    islands = []
    for s, e in ivs:
        if islands and s <= islands[-1][1]:
            islands[-1][1] = max(islands[-1][1], e)
        else:
            islands.append([s, e])
    return len(islands), sum(e - s for s, e in islands)


@settings(max_examples=10, deadline=None)
@given(rows=st.lists(
    st.tuples(st.integers(min_value=0, max_value=4),
              st.integers(min_value=0, max_value=10**10)),
    min_size=1, max_size=200))
def test_interval_coverage_matches_brute_force(tmp_path_factory, rows):
    from orthority_ray.pipelines.events_extra import (COVER_DUR_US,
                                                      q_interval_coverage)

    d = tmp_path_factory.mktemp("iv")
    import pyarrow.parquet as pq

    # match the driver tables' microsecond timestamp unit (a pandas
    # default write stores ns and would silently rescale the gaps)
    tbl = pa.table({
        "event_id": pa.array(np.arange(len(rows), dtype=np.int64)),
        "user_id": pa.array([u for u, _ in rows], pa.int64()),
        "ts": pa.array([t for _, t in rows], pa.timestamp("us")),
        "value": pa.array(np.zeros(len(rows))),
        "event_type": pa.array(["x"] * len(rows)),
    })
    pq.write_table(tbl, d / "events.parquet")
    out = q_interval_coverage(str(d)).to_pandas()
    got = {r.user_id: (r.n_islands, r.covered_us)
           for r in out.itertuples()}
    want = {}
    by_user = {}
    for u, t in rows:
        by_user.setdefault(u, []).append(t)
    for u, tss in by_user.items():
        want[u] = _brute_cover(tss, COVER_DUR_US)
    assert got == want


# --- bfs_hops vs brute force -------------------------------------------------


def _brute_bfs(pairs):
    adj = {}
    nodes = set()
    for a, b in pairs:
        adj.setdefault(a, set()).add(b)
        adj.setdefault(b, set()).add(a)
        nodes |= {a, b}
    root = min(nodes)
    dist = {root: 0}
    frontier = [root]
    d = 0
    while frontier:
        d += 1
        nxt = []
        for v in frontier:
            for w in adj[v]:
                if w not in dist:
                    dist[w] = d
                    nxt.append(w)
        frontier = nxt
    return dist


@settings(max_examples=8, deadline=None)
@given(st.lists(
    st.tuples(st.integers(min_value=0, max_value=30),
              st.integers(min_value=0, max_value=30)),
    min_size=1, max_size=60))
def test_bfs_hops_matches_brute_force(pairs):
    from orthority_ray.stages.linkrank import bfs_hops

    from hypothesis import assume

    pairs = [(a, b) for a, b in pairs if a != b]
    assume(pairs)
    s = [a for a, b in pairs] + [b for a, b in pairs]
    t = [b for a, b in pairs] + [a for a, b in pairs]
    und = ray.data.from_arrow(pa.table({
        "src": pa.array(s, pa.int64()),
        "dst": pa.array(t, pa.int64())})).materialize()
    out = bfs_hops(und).to_pandas()
    assert dict(zip(out["node"], out["d"])) == _brute_bfs(pairs)


# --- 2-D skyline sweep vs brute-force dominance ------------------------------


def _brute_skyline(pts):
    out = []
    for p in pts:
        dominated = any(
            q != p and q[0] <= p[0] and q[1] <= p[1] for q in pts)
        if not dominated:
            out.append(p)
    return sorted(out)


@settings(max_examples=15, deadline=None)
@given(st.lists(
    st.tuples(st.integers(min_value=0, max_value=12),
              st.integers(min_value=0, max_value=12)),
    min_size=1, max_size=60))
def test_skyline_2d_matches_brute_force(pts):
    from orthority_ray.pipelines.tpch_final import _skyline_2d

    distinct = sorted(set(pts))
    df = pd.DataFrame(distinct, columns=["price_cents", "day"])
    got = sorted(map(tuple, _skyline_2d(df).to_numpy()))
    assert got == _brute_skyline(distinct)


# --- id_gaps vs brute force (incl. cross-bucket stitching) -------------------


def _brute_gaps(ids):
    ids = sorted(set(ids))
    out = []
    for a, b in zip(ids, ids[1:]):
        if b > a + 1:
            out.append((a + 1, b - 1, b - a - 1))
    return out


@settings(max_examples=8, deadline=None)
@given(rows=st.lists(st.integers(min_value=0, max_value=3 * 4096 + 100),
                     min_size=2, max_size=150))
def test_id_gaps_matches_brute_force(tmp_path_factory, rows):
    """Ids drawn across >3 range buckets so the driver boundary stitch
    (including wholly-empty middle buckets) is exercised."""
    import pyarrow.parquet as pq

    from orthority_ray.stages.audit import id_gaps

    d = tmp_path_factory.mktemp("gaps")
    ids = np.array(sorted(set(rows)), np.int64)
    # write a minimal lineitem whose (orderkey, linenumber) decode back
    # to exactly these doc ids (doc_id = ok*8 + ln, ln in 1..7)
    keep = ids[ids % 8 != 0]
    if keep.size < 2:
        from hypothesis import assume
        assume(False)
    tbl = pa.table({
        "l_orderkey": pa.array(keep // 8, pa.int64()),
        "l_linenumber": pa.array(keep % 8, pa.int64()),
    })
    pq.write_table(tbl, d / "lineitem.parquet")
    out = id_gaps(str(d)).to_pandas()
    got = sorted(map(tuple, out.to_numpy()))
    assert got == _brute_gaps(keep.tolist())


# --- grouped_rolling_quantile vs brute force ---------------------------------


@settings(max_examples=10, deadline=None)
@given(rows=st.lists(
    st.tuples(st.integers(min_value=0, max_value=3),
              st.integers(min_value=-100, max_value=100)),
    min_size=1, max_size=80),
    w=st.integers(min_value=1, max_value=6),
    q=st.sampled_from([0.25, 0.5, 0.9]))
def test_grouped_rolling_quantile_matches_brute_force(rows, w, q):
    import math

    from orthority_ray.stages.windows import grouped_rolling_quantile

    df = pd.DataFrame({
        "k": np.array([k for k, _ in rows], np.int64),
        "o": np.arange(len(rows), dtype=np.int64),
        "v": np.array([v for _, v in rows], np.int64),
    })
    ds = ray.data.from_arrow(pa.Table.from_pandas(df, preserve_index=False)) \
        .repartition(3)
    out = grouped_rolling_quantile(ds, "k", ["o"], "v", ["o"], w, q=q,
                                   roll_name="r").to_pandas()
    got = dict(zip(out["o"], out["r"]))
    want = {}
    for kk in set(df["k"]):
        sub = df[df["k"] == kk].sort_values("o")
        vals = sub["v"].tolist()
        for i, o in enumerate(sub["o"]):
            win = sorted(vals[max(0, i - w + 1):i + 1])
            want[o] = win[max(math.ceil(len(win) * q) - 1, 0)]
    assert got == want
