"""Syndication graph + fixed-point host rank: hand-computed semantics.

The oracle sweep (test_oracle_sweep.py) pins both operators against
DuckDB at sf0.001; these tests pin the SEMANTICS on a graph small enough
to verify by hand, plus the no-edge degenerate case.
"""

from __future__ import annotations

import numpy as np
import pyarrow as pa
import pytest
import ray.data

from orthority_ray.stages.linkrank import (BASE, DAMP, N_HOSTS, R0,
                                           host_rank_pages,
                                           syndication_edges)


def _pages(rows):
    return ray.data.from_arrow(pa.table({
        "doc_id": pa.array([r[0] for r in rows], pa.int64()),
        "text": pa.array([r[1] for r in rows], pa.string()),
    }))


@pytest.fixture()
def tiny(ray_session):
    # host = doc_id % 1000.  Text "A" originates on host 1 (doc 1) and is
    # syndicated twice by host 2 (docs 2, 1002) and once by host 3 (doc 3).
    # Text "B" originates on host 2 (doc 1001... doc 1001 % 1000 = 1)!  So
    # pick doc 2002 (host 2) as B's origin, copied by host 1 (doc 2001 is
    # host 1? 2001 % 1000 = 1, but 2001 > 2002 would make 2001 NOT the
    # rep).  Use doc 3001 (host 1) copying B.  "C" is unique on host 4.
    return _pages([
        (1, "A"), (2, "A"), (1002, "A"), (3, "A"),
        (2002, "B"), (3001, "B"),
        (4, "C"),
    ])


def test_syndication_edges_hand_checked(tiny):
    e = syndication_edges(tiny).to_pandas().sort_values(
        ["host_idx", "dst_idx"]).reset_index(drop=True)
    # A: rep doc 1 (host 1); dups docs 2, 1002 (host 2, w=2), 3 (host 3)
    # B: rep doc 2002 (host 2); dup doc 3001 (host 1)
    # C: no dup
    assert list(map(tuple, e.itertuples(index=False))) == [
        (1, 2, 1),   # host 1 copies B from host 2
        (2, 1, 2),   # host 2 copies A from host 1, twice
        (3, 1, 1),   # host 3 copies A from host 1
    ]


def test_host_rank_one_iter_hand_checked(tiny):
    r = host_rank_pages(tiny, n_iters=1).to_pandas()
    got = {h: int(v) for h, v in zip(r["host"], r["rank_score"])}
    # out-weights: host1 ow=1 (the B copy), host2 ow=2, host3 ow=1
    # contribs with r0=1_000_000:
    #   1->2 w1: (1e6*1)//1 = 1_000_000
    #   2->1 w2: (1e6*2)//2 = 1_000_000
    #   3->1 w1: (1e6*1)//1 = 1_000_000
    # inflow: host1 = 2_000_000, host2 = 1_000_000, host3 = 0, host4 = 0
    exp = {
        "site0001.example": BASE + (DAMP * 2_000_000) // 100,
        "site0002.example": BASE + (DAMP * 1_000_000) // 100,
        "site0003.example": BASE,
        "site0004.example": BASE,
    }
    assert got == exp


def test_host_rank_no_edges_all_base(ray_session):
    pages = _pages([(1, "x"), (2, "y"), (1001, "z")])  # all texts unique
    r = host_rank_pages(pages, n_iters=2).to_pandas()
    # hosts 1 and 2 (doc 1001 is host 1 again); no edges -> every host
    # settles at BASE after the first iteration
    assert sorted(r["host"]) == ["site0001.example", "site0002.example"]
    assert set(r["rank_score"]) == {BASE}


def test_broadcast_and_join_paths_bit_equal(tiny):
    """The SMALL_NODE_LIMIT fast path and the fully-distributed join path
    must produce identical fixed-point ranks."""
    from orthority_ray.pipelines.relational import combined_groupby_sum
    from orthority_ray.stages.linkrank import _rank_joins, syndication_edges

    fast = host_rank_pages(tiny, n_iters=3).to_pandas().sort_values(
        "host").reset_index(drop=True)

    edges = syndication_edges(tiny).materialize()

    def host_partial(b):
        h = np.unique(b["doc_id"].to_numpy(zero_copy_only=False) % N_HOSTS)
        return pa.table({"host_idx": pa.array(h.astype(np.int64)),
                         "one": pa.array(np.ones(h.size, np.int64))})

    nodes = combined_groupby_sum(
        tiny.map_batches(host_partial, batch_format="pyarrow"),
        ["host_idx"], ["one"]).select_columns(["host_idx"]).materialize()
    slow = _rank_joins(edges, nodes, 3).to_pandas().sort_values(
        "host").reset_index(drop=True)
    assert fast.equals(slow)


def test_host_components_hand_checked(ray_session, tmp_path):
    """Components over the tiny fixture: {1,2,3} are one community (min
    label 1, all pages share one text); host 4 has a UNIQUE text and no
    edges, so it exercises the singleton left-join/coalesce path."""
    import pyarrow.parquet as pq

    docs = pa.table({
        "doc_id": pa.array([0, 1, 2, 3, 4], pa.int64()),
        "text": pa.array(["A", "A", "A", "A", "C"], pa.string()),
        "lang": pa.array(["en"] * 5, pa.string()),
        "source": pa.array(["t"] * 5, pa.string()),
        "n_chars": pa.array([1] * 5, pa.int64()),
    })
    # lineitem rows produce doc_ids via ok*8+ln:
    # 1, 2, 3, 1002, 3001, 4 -> hosts 1, 2, 3, 2, 1, 4; text index is
    # doc_id % 500 against THIS 5-row docs table where PageSynth's take
    # uses doc_id % 500 positions 1,2,3,2,1,4 -> texts A A A A A C
    li = pa.table({
        "l_orderkey": pa.array([0, 0, 0, 125, 375, 0], pa.int64()),
        "l_linenumber": pa.array([1, 2, 3, 2, 1, 4], pa.int64()),
    })
    pq.write_table(docs, tmp_path / "documents.parquet")
    pq.write_table(li, tmp_path / "lineitem.parquet")
    from orthority_ray.stages.linkrank import host_components

    out = host_components(str(tmp_path)).to_pandas().sort_values(
        "host").reset_index(drop=True)
    # pages on hosts 1/2/3 share text A -> rep doc 1 (host 1): hosts 2
    # and 3 edge to host 1 -> one community labelled 1; host 4's text C
    # is unique -> NO edges -> singleton community labelled 4
    assert out["host"].tolist() == [
        "site0001.example", "site0002.example", "site0003.example",
        "site0004.example"]
    assert out["community"].tolist() == [1, 1, 1, 4]


def test_host_rank_mass_conservation_bound(tiny):
    # total rank never exceeds n_hosts * R0 (damping only shrinks mass)
    r = host_rank_pages(tiny, n_iters=3).to_pandas()
    assert int(r["rank_score"].sum()) <= len(r) * R0
    assert (r["rank_score"] >= BASE).all()


# --- host_distance / bfs_hops (r5) -------------------------------------------


def _und_ds(pairs):
    import pyarrow as pa
    import ray.data

    s = [a for a, b in pairs] + [b for a, b in pairs]
    d = [b for a, b in pairs] + [a for a, b in pairs]
    return ray.data.from_arrow(pa.table({
        "src": pa.array(s, pa.int64()),
        "dst": pa.array(d, pa.int64())})).materialize()


def _hops(pairs, force):
    from orthority_ray.stages.linkrank import bfs_hops

    out = bfs_hops(_und_ds(pairs), force_distributed=force).to_pandas()
    return dict(zip(out["node"], out["d"]))


def test_bfs_hops_chain_and_branch_both_paths():
    # 0-1-2-3-4 chain, branch 2-7, isolated component 8-9 (unreachable)
    pairs = [(0, 1), (1, 2), (2, 3), (3, 4), (2, 7), (8, 9)]
    want = {0: 0, 1: 1, 2: 2, 3: 3, 4: 4, 7: 3}
    assert _hops(pairs, force=False) == want
    assert _hops(pairs, force=True) == want


def test_bfs_hops_cycle_shortcut_both_paths():
    # cycle 0-1-2-3-0: node 3 is 1 hop via the back edge, not 3
    pairs = [(0, 1), (1, 2), (2, 3), (3, 0)]
    want = {0: 0, 1: 1, 2: 2, 3: 1}
    assert _hops(pairs, force=False) == want
    assert _hops(pairs, force=True) == want


def test_host_distance_matches_oracle_shape(sf_unit):
    import __ray_entry__ as E

    out = E.queries()["host_distance"](sf_unit).to_pandas()
    assert list(out.columns) == ["host", "dist"]
    assert (out["dist"] >= 0).all()
    # exactly one root at dist 0
    assert int((out["dist"] == 0).sum()) == 1
