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
