"""stages/sketches.py — exact heavy hitters + HyperLogLog tolerance."""

from __future__ import annotations

import numpy as np
import pandas as pd
import ray.data

from orthority_ray.stages.sketches import (
    heavy_hitters,
    hll_distinct,
    hll_estimate_from_registers,
    hll_registers,
)


def test_heavy_hitters_exact_on_skewed_data(ray_session):
    # zipf-ish skew: value v repeated (50 - v)^2 times
    vals = np.concatenate([np.full((50 - v) ** 2, v) for v in range(50)])
    rng = np.random.RandomState(0)
    rng.shuffle(vals)
    df = pd.DataFrame({"x": vals.astype(np.int64)})
    ds = ray.data.from_pandas(df).repartition(6)
    inv_phi = 40  # threshold: count * 40 > n
    got = heavy_hitters(ds, "x", inv_phi, count_alias="c").to_pandas()
    got = got.sort_values("x").reset_index(drop=True)
    vc = df["x"].value_counts()
    want = (
        vc[vc * inv_phi > len(df)]
        .rename_axis("x")
        .reset_index(name="c")
        .sort_values("x")
        .reset_index(drop=True)
    )
    assert len(want) > 0 and len(want) < 50  # nontrivial subset
    pd.testing.assert_frame_equal(got[["x", "c"]], want.astype(np.int64))


def test_heavy_hitters_weighted_matches_unweighted(ray_session):
    from orthority_ray.stages.sketches import heavy_hitters_weighted

    vals = np.concatenate([np.full((30 - v) ** 2, v) for v in range(30)])
    rng = np.random.RandomState(1)
    rng.shuffle(vals)
    df = pd.DataFrame({"x": vals.astype(np.int64)})
    ds = ray.data.from_pandas(df).repartition(5)
    inv_phi = 25
    plain = (
        heavy_hitters(ds, "x", inv_phi, count_alias="c")
        .to_pandas().sort_values("x").reset_index(drop=True)
    )

    # pre-aggregated partials: per-block value counts (arbitrary partition
    # of the weighted multiset — the union bound must hold for any split)
    def counts(b):
        u, c = np.unique(b["x"].to_numpy(), return_counts=True)
        return pd.DataFrame({"x": u.astype(np.int64), "w": c.astype(np.int64)})

    parts = ds.map_batches(counts, batch_format="pandas", batch_size=512)
    weighted = (
        heavy_hitters_weighted(parts, "x", "w", inv_phi, count_alias="c")
        .to_pandas().sort_values("x").reset_index(drop=True)
    )
    assert len(plain) > 0
    pd.testing.assert_frame_equal(plain, weighted)


def test_heavy_hitters_weighted_empty(ray_session):
    from orthority_ray.stages.sketches import heavy_hitters_weighted

    df = pd.DataFrame({"x": np.arange(500, dtype=np.int64),
                       "w": np.ones(500, dtype=np.int64)})
    ds = ray.data.from_pandas(df).repartition(3)
    got = heavy_hitters_weighted(ds, "x", "w", inv_phi=2, count_alias="c").to_pandas()
    assert len(got) == 0


def test_heavy_hitters_empty_result(ray_session):
    # uniform data, threshold unreachable -> empty, schema intact
    df = pd.DataFrame({"x": np.arange(1000, dtype=np.int64)})
    ds = ray.data.from_pandas(df).repartition(4)
    got = heavy_hitters(ds, "x", inv_phi=2, count_alias="c").to_pandas()
    assert len(got) == 0


def test_hll_within_tolerance_and_parallelism_invariant(ray_session):
    n = 20_000
    df = pd.DataFrame({"x": np.arange(n, dtype=np.int64) * 7919})
    est1 = hll_distinct(ray.data.from_pandas(df).repartition(2), "x")
    est8 = hll_distinct(ray.data.from_pandas(df).repartition(16), "x")
    e1 = est1["approx_distinct"][0].as_py()
    e8 = est8["approx_distinct"][0].as_py()
    assert e1 == e8  # deterministic hash -> partition-invariant registers
    assert abs(e1 - n) / n < 0.05


def test_hll_registers_merge_is_max(ray_session):
    # duplicating the input must not change the registers (max-merge)
    df = pd.DataFrame({"x": np.arange(5000, dtype=np.int64)})
    once = hll_registers(ray.data.from_pandas(df), "x").to_pandas()
    twice = hll_registers(
        ray.data.from_pandas(pd.concat([df, df])).repartition(8), "x"
    ).to_pandas()
    once = once.sort_values("register").reset_index(drop=True)
    twice = twice.sort_values("register").reset_index(drop=True)
    pd.testing.assert_frame_equal(once, twice)
    assert hll_estimate_from_registers(once) == hll_estimate_from_registers(twice)


def test_hll_grouped_close_to_exact(ray_session, sf_unit):
    import duckdb

    from orthority_ray.sources.pages import read_pages
    from orthority_ray.sources.sql import with_pages
    from orthority_ray.stages.sketches import hll_grouped

    out = hll_grouped(
        read_pages(sf_unit).select_columns(["lang", "doc_id"]),
        "lang", "doc_id").to_pandas()
    con = duckdb.connect()
    for t in ("lineitem", "documents"):
        con.sql(f"CREATE VIEW {t} AS SELECT * FROM '{sf_unit}/{t}.parquet'")
    truth = con.sql(with_pages(
        "SELECT lang, COUNT(DISTINCT doc_id) AS n FROM pages GROUP BY lang"
    )).df()
    m = out.merge(truth, on="lang")
    assert len(m) == len(truth)
    rel = (m["approx_distinct"] - m["n"]).abs() / m["n"]
    assert (rel < 0.05).all(), rel.max()


def test_cms_never_undercounts_and_is_tight(ray_session):
    """Count-min: estimates are >= true counts (structural), within the
    eps*N bound with high probability, exact on heavy values at this
    width, and partition-invariant (additive counters)."""
    import pyarrow as pa

    from orthority_ray.stages.sketches import CMS_WIDTH, cms_estimate, cms_sketch

    rng = np.random.RandomState(9)
    vals = np.concatenate([
        np.full(5000, 7), np.full(3000, 42), np.full(1000, 99),
        rng.randint(1000, 50_000, 20_000),
    ]).astype(np.int64)
    rng.shuffle(vals)
    ds = ray.data.from_arrow(pa.table({"x": vals})).repartition(7)
    sk = cms_sketch(ds, "x")
    probe = np.array([7, 42, 99], dtype=np.int64)
    true = np.array([(vals == v).sum() for v in probe])
    est = cms_estimate(sk, probe)
    assert (est >= true).all()
    n = len(vals)
    assert (est - true <= np.e / CMS_WIDTH * n * 4).all()  # generous eps bound
    # partition-invariance: different block structure, identical sketch
    sk2 = cms_sketch(ray.data.from_arrow(pa.table({"x": vals})).repartition(3), "x")
    assert (sk == sk2).all()
    # total mass per row == N (additivity sanity)
    assert (sk.sum(axis=1) == n).all()
