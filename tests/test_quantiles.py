"""Distributed median/quantile operators (SURVEY §2.6 A2; reference derives
GSD from a median, /root/reference/orthority/ortho.py:223)."""

import numpy as np
import pandas as pd
import pytest
import ray.data

from orthority_ray.stages.quantiles import (
    KllSketch,
    exact_quantiles_int,
    grouped_median,
    sketch_quantiles,
)

QS = (0.1, 0.25, 0.5, 0.75, 0.9, 0.99)


@pytest.fixture()
def values():
    rng = np.random.default_rng(11)
    # lognormal-ish skewed ints + heavy ties
    return np.concatenate(
        [rng.integers(0, 50, 20_000), (rng.lognormal(3, 1, 30_000)).astype(np.int64)]
    )


def _disc(v, q):
    # DuckDB quantile_disc semantics: smallest element with CDF >= q, i.e.
    # sorted[ceil(n*q) - 1] — NOT floor((n-1)*q), which diverges whenever
    # frac(n*q) lands in (0, q) (r3 review; the old reference here mirrored
    # the engine's bug instead of the oracle)
    s = np.sort(v)
    return s[max(int(np.ceil(len(s) * q)) - 1, 0)]


def test_disc_index_matches_duckdb_quantile_disc():
    import duckdb

    rng = np.random.default_rng(5)
    for n in (1, 2, 7, 12, 100, 101, 6002):
        vals = np.sort(rng.integers(0, 40, n))
        for q in QS:
            duck = duckdb.sql(
                "SELECT quantile_disc(v, ?) FROM (SELECT unnest($2) v)",
                params=[q, vals.tolist()]).fetchone()[0]
            assert vals[max(int(np.ceil(n * q)) - 1, 0)] == duck, (n, q)


def test_exact_quantiles_int_matches_numpy(values):
    ds = ray.data.from_pandas(pd.DataFrame({"x": values})).repartition(13)
    out = exact_quantiles_int(ds, "x", QS)
    for q, v in zip(QS, out["value"]):
        assert v == _disc(values, q), q


def test_grouped_median_matches_pergroup_sort(values):
    keys = values % 7
    ds = ray.data.from_pandas(pd.DataFrame({"k": keys, "x": values})).repartition(9)
    out = grouped_median(ds, "k", "x").to_pandas().sort_values("k").reset_index(drop=True)
    for k in range(7):
        grp = values[keys == k]
        row = out[out["k"] == k].iloc[0]
        assert row["n"] == grp.shape[0]
        assert row["median"] == _disc(grp, 0.5), k


def test_kll_sketch_rank_error_bounded(values):
    sk = KllSketch(cap=256)
    for chunk in np.array_split(values.astype(np.float64), 37):
        sk.add(chunk)
    est = sk.quantiles(QS)
    s = np.sort(values)
    for q, e in zip(QS, est):
        # rank of the estimate must be within ~3% of the target rank
        rank = np.searchsorted(s, e, "right") / len(s)
        assert abs(rank - q) < 0.03, (q, rank)


def test_kll_merge_associative_and_deterministic(values):
    a, b, c = np.array_split(values.astype(np.float64), 3)
    s1 = KllSketch(128).add(a).merge(KllSketch(128).add(b)).merge(KllSketch(128).add(c))
    s2 = KllSketch(128).add(a).merge(KllSketch(128).add(b)).merge(KllSketch(128).add(c))
    assert (s1.quantiles(QS) == s2.quantiles(QS)).all()


def test_sketch_quantiles_dataset(values):
    ds = ray.data.from_pandas(pd.DataFrame({"x": values.astype(np.float64)})).repartition(8)
    out = sketch_quantiles(ds, "x", QS)
    s = np.sort(values)
    for q, e in zip(QS, out["value"]):
        rank = np.searchsorted(s, e, "right") / len(s)
        assert abs(rank - q) < 0.05, (q, rank)


def test_grouped_median_cont2x_even_and_odd_groups(values):
    from orthority_ray.stages.quantiles import grouped_median_cont2x

    # groups of mixed parity from the fixture values
    v = values.astype(np.int64)
    df = pd.DataFrame({"k": (np.arange(len(v)) % 7).astype(np.int64), "v": v})
    ds = ray.data.from_pandas(df).repartition(4)
    out = (grouped_median_cont2x(ds, "k", "v").to_pandas()
           .sort_values("k").reset_index(drop=True))
    for _, row in out.iterrows():
        grp = np.sort(v[df["k"].to_numpy() == row["k"]])
        n = grp.shape[0]
        expect = int(grp[(n - 1) // 2]) + int(grp[n // 2])
        assert row["med2x"] == expect and row["n"] == n


def test_grouped_weighted_median_crossings(ray_session):
    # lower weighted median: smallest v with 2*cum >= tot; exercise a
    # heavy-tail group, a single-row group, and an exact half-split tie
    import numpy as np
    import pandas as pd
    import pyarrow as pa
    import ray.data

    from orthority_ray.stages.quantiles import grouped_weighted_median

    rows = []
    # group a: weights 1,1,8 over v=1,2,3 -> cum 1,2,10; tot 10; first
    # 2*cum>=10 at v=3
    rows += [("a", 1, 1), ("a", 2, 1), ("a", 3, 8)]
    # group b: single row
    rows += [("b", 42, 7)]
    # group c: exact tie 2*cum == tot at the FIRST value -> lower median 5
    rows += [("c", 5, 3), ("c", 9, 3)]
    df = pd.DataFrame(rows, columns=["k", "v", "w"])
    ds = ray.data.from_arrow(pa.Table.from_pandas(df, preserve_index=False))
    out = (grouped_weighted_median(ds, "k", "v", "w")
           .to_pandas().sort_values("k").reset_index(drop=True))
    assert out["wmed"].tolist() == [3, 42, 5]
    assert out["tot_w"].tolist() == [10, 7, 6]

    # brute-force cross-check on a random skewed instance
    rng = np.random.default_rng(3)
    k = rng.integers(0, 5, 400)
    v = rng.integers(-50, 50, 400)
    w = rng.zipf(1.5, 400).clip(max=10_000).astype(np.int64)
    big = pd.DataFrame({"k": k.astype(str), "v": v, "w": w})
    got = (grouped_weighted_median(
        ray.data.from_arrow(pa.Table.from_pandas(big, preserve_index=False)),
        "k", "v", "w").to_pandas().set_index("k")["wmed"])
    for kk, g in big.groupby("k"):
        g = g.groupby("v", as_index=False)["w"].sum().sort_values("v")
        cum = g["w"].cumsum()
        want = int(g.loc[2 * cum >= g["w"].sum(), "v"].iloc[0])
        assert got[kk] == want, kk
