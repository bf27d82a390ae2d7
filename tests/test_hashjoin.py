"""Hash join: explicit bucketed implementation vs Ray's native Dataset.join
vs pandas ground truth."""

import numpy as np
import pandas as pd
import pytest
import ray.data

from orthority_ray.stages.hashjoin import hash_join, native_join


@pytest.fixture()
def sides():
    rng = np.random.default_rng(42)
    left = pd.DataFrame(
        {"k": rng.integers(0, 500, 2000), "lv": rng.integers(0, 100, 2000)}
    )
    right = pd.DataFrame(
        {"k": rng.integers(0, 500, 1500), "rv": rng.integers(0, 100, 1500)}
    )
    return left, right


def _canon(df):
    return df.sort_values(list(sorted(df.columns))).reset_index(drop=True)[sorted(df.columns)]


def test_bucketed_join_matches_pandas(sides):
    left, right = sides
    out = hash_join(
        ray.data.from_pandas(left), ray.data.from_pandas(right), "k", ["k", "lv"], ["k", "rv"]
    ).to_pandas()
    truth = left.merge(right, on="k", how="inner")
    assert len(out) == len(truth)
    assert (_canon(out).values == _canon(truth).values).all()


def test_native_join_matches_bucketed(sides):
    left, right = sides
    a = hash_join(
        ray.data.from_pandas(left), ray.data.from_pandas(right), "k", ["k", "lv"], ["k", "rv"]
    ).to_pandas()
    b = native_join(
        ray.data.from_pandas(left), ray.data.from_pandas(right), "k", num_partitions=8
    ).to_pandas()
    assert len(a) == len(b)
    assert (_canon(a).values == _canon(b).values).all()


def test_left_join_keeps_unmatched(sides):
    left, right = sides
    only_left = pd.DataFrame({"k": [99999], "lv": [1]})
    left2 = pd.concat([left, only_left], ignore_index=True)
    out = hash_join(
        ray.data.from_pandas(left2), ray.data.from_pandas(right), "k",
        ["k", "lv"], ["k", "rv"], how="left",
    ).to_pandas()
    truth = left2.merge(right, on="k", how="left")
    assert len(out) == len(truth)
    assert out[out["k"] == 99999]["rv"].isna().all()

def test_semi_and_anti_join(sides):
    left, right = sides
    only_left = pd.DataFrame({"k": [99999, 88888], "lv": [1, 2]})
    left2 = pd.concat([left, only_left], ignore_index=True)
    semi = hash_join(
        ray.data.from_pandas(left2), ray.data.from_pandas(right), "k",
        ["k", "lv"], ["k"], how="semi",
    ).to_pandas()
    anti = hash_join(
        ray.data.from_pandas(left2), ray.data.from_pandas(right), "k",
        ["k", "lv"], ["k"], how="anti",
    ).to_pandas()
    rk = set(right["k"])
    want_semi = left2[left2["k"].isin(rk)]
    want_anti = left2[~left2["k"].isin(rk)]
    assert len(semi) == len(want_semi) and len(anti) == len(want_anti)
    assert set(semi.columns) == {"k", "lv"} == set(anti.columns)
    assert (_canon(semi).values == _canon(want_semi).values).all()
    assert (_canon(anti).values == _canon(want_anti).values).all()
    # semi + anti partition the left side exactly
    assert len(semi) + len(anti) == len(left2)


def test_string_key_join_matches_pandas():
    """String join keys bucket via FNV and probe on actual values — the
    tfidf expansion join's path (md5 hex keys)."""
    rng = np.random.default_rng(7)
    keys = [f"k{int(v):03d}" for v in rng.integers(0, 60, size=400)]
    left = pd.DataFrame({"k": keys, "lv": np.arange(400, dtype=np.int64)})
    right = pd.DataFrame({"k": [f"k{i:03d}" for i in range(0, 60, 2)],
                          "rv": np.arange(30, dtype=np.int64) * 10})
    out = hash_join(
        ray.data.from_pandas(left), ray.data.from_pandas(right), "k",
        ["k", "lv"], ["k", "rv"], n_buckets=8,
    ).to_pandas()
    truth = left.merge(right, on="k")
    assert len(out) == len(truth)
    assert out["rv"].dtype == np.int64  # no NaN upcast on the string path
    assert (_canon(out).values == _canon(truth).values).all()


def test_explicit_types_skip_schema_probe():
    left = pd.DataFrame({"k": np.arange(50, dtype=np.int64),
                         "lv": np.arange(50, dtype=np.int64)})
    right = pd.DataFrame({"k": np.arange(0, 50, 5, dtype=np.int64),
                          "rv": np.arange(10, dtype=np.int64)})
    import pyarrow as pa
    out = hash_join(
        ray.data.from_pandas(left), ray.data.from_pandas(right), "k",
        ["k", "lv"], ["k", "rv"],
        types={"lv": pa.int64(), "rv": pa.int64()},
    ).to_pandas()
    truth = left.merge(right, on="k")
    assert len(out) == len(truth)
    assert (_canon(out).values == _canon(truth).values).all()


def test_full_outer_join_matches_duckdb(ray_session):
    import duckdb
    import numpy as np
    import pyarrow as pa
    import ray.data

    from orthority_ray.stages.hashjoin import hash_join

    # both sides have keys the other lacks + multi-match keys
    lk = np.array([1, 2, 2, 3, 5, 7, 7], dtype=np.int64)
    rk = np.array([2, 3, 3, 4, 6, 7], dtype=np.int64)
    left = ray.data.from_arrow(pa.table({"k": lk, "lv": lk * 10}))
    right = ray.data.from_arrow(pa.table({"k": rk, "rv": rk * 100}))
    out = (
        hash_join(left, right, "k", ["k", "lv"], ["k", "rv"], how="full")
        .to_pandas()
        .sort_values(["k", "lv", "rv"])
        .reset_index(drop=True)
    )
    con = duckdb.connect()
    want = con.sql(
        """
        SELECT COALESCE(l.k, r.k) AS k, l.lv AS lv, r.rv AS rv
        FROM (SELECT * FROM (VALUES (1,10),(2,20),(2,20),(3,30),(5,50),(7,70),(7,70)) t(k, lv)) l
        FULL JOIN (SELECT * FROM (VALUES (2,200),(3,300),(3,300),(4,400),(6,600),(7,700)) t(k, rv)) r
        ON l.k = r.k
        ORDER BY k, lv, rv
        """
    ).df()
    assert len(out) == len(want)
    for c in ("k", "lv", "rv"):
        a, b = out[c].to_numpy(dtype=float), want[c].to_numpy(dtype=float)
        assert ((a == b) | (np.isnan(a) & np.isnan(b))).all(), c


def test_full_join_rejects_hot_keys(ray_session):
    import numpy as np
    import pyarrow as pa
    import pytest as _pytest
    import ray.data

    from orthority_ray.stages.hashjoin import hash_join

    ds = ray.data.from_arrow(pa.table({"k": np.array([1, 2], dtype=np.int64)}))
    with _pytest.raises(ValueError, match="full"):
        hash_join(ds, ds, "k", ["k"], ["k"], how="full",
                  hot_keys=np.array([1], dtype=np.int64))
    with _pytest.raises(ValueError, match="unsupported"):
        hash_join(ds, ds, "k", ["k"], ["k"], how="outer")
