"""Window operator semantics: lag delta, running sum, top-N per group —
vs a brute-force pandas reference, plus partition-count invariance."""

from __future__ import annotations

import numpy as np
import pandas as pd
import pytest
import ray.data

from orthority_ray.stages.windows import (
    grouped_lag_delta,
    grouped_rolling_sum,
    grouped_running_sum,
    grouped_topn,
)


def _frame(n=500, seed=7):
    rng = np.random.RandomState(seed)
    return pd.DataFrame(
        {
            "rid": np.arange(n, dtype=np.int64),
            "k": rng.randint(0, 17, n).astype(np.int64),
            "t": rng.randint(0, 50, n).astype(np.int64),  # heavy ties
            "v": rng.randint(-100, 100, n).astype(np.int64),
        }
    )


def _ref_sorted(df):
    return df.sort_values(["k", "t", "rid"], kind="mergesort")


@pytest.fixture(scope="module")
def df(ray_session):
    return _frame()


@pytest.mark.parametrize("nblocks", [1, 7])
def test_lag_delta_matches_pandas(df, nblocks):
    ds = ray.data.from_pandas(df).repartition(nblocks)
    out = (
        grouped_lag_delta(ds, "k", ["t", "rid"], "t", ["rid"], "d")
        .to_pandas()
        .sort_values("rid")
        .reset_index(drop=True)
    )
    ref = _ref_sorted(df).copy()
    ref["d"] = ref.groupby("k")["t"].diff().fillna(-1).astype(np.int64)
    ref = ref[["rid", "d"]].sort_values("rid").reset_index(drop=True)
    pd.testing.assert_frame_equal(out, ref)


@pytest.mark.parametrize("nblocks", [1, 7])
def test_running_sum_matches_pandas(df, nblocks):
    ds = ray.data.from_pandas(df).repartition(nblocks)
    out = (
        grouped_running_sum(ds, "k", ["t", "rid"], "v", ["rid"], "c")
        .to_pandas()
        .sort_values("rid")
        .reset_index(drop=True)
    )
    ref = _ref_sorted(df).copy()
    ref["c"] = ref.groupby("k")["v"].cumsum().astype(np.int64)
    ref = ref[["rid", "c"]].sort_values("rid").reset_index(drop=True)
    pd.testing.assert_frame_equal(out, ref)


def test_topn_matches_pandas(df):
    ds = ray.data.from_pandas(df)
    out = (
        grouped_topn(ds, "k", ["v", "rid"], [False, True], 3, ["k", "rid"], "rn")
        .to_pandas()
        .sort_values(["k", "rn"])
        .reset_index(drop=True)
    )
    ref = df.sort_values(["k", "v", "rid"], ascending=[True, False, True],
                         kind="mergesort").copy()
    ref["rn"] = ref.groupby("k").cumcount() + 1
    ref = ref[ref["rn"] <= 3][["k", "rid", "rn"]]
    ref["rn"] = ref["rn"].astype(np.int64)
    ref = ref.sort_values(["k", "rn"]).reset_index(drop=True)
    pd.testing.assert_frame_equal(out, ref)


def test_single_row_groups_and_string_keys(ray_session):
    df = pd.DataFrame(
        {
            "rid": np.arange(4, dtype=np.int64),
            "k": ["a", "b", "b", "c"],
            "t": np.array([5, 2, 9, 1], dtype=np.int64),
        }
    )
    ds = ray.data.from_pandas(df)
    out = (
        grouped_lag_delta(ds, "k", ["t", "rid"], "t", ["rid"], "d")
        .to_pandas()
        .sort_values("rid")
        .reset_index(drop=True)
    )
    assert out["d"].tolist() == [-1, -1, 7, -1]


def test_rolling_sum_matches_pandas_rolling(ray_session):
    df = _frame()
    ds = ray.data.from_pandas(df)
    out = (
        grouped_rolling_sum(ds, "k", ["t", "rid"], "v", ["rid"], 3, "roll")
        .to_pandas()
        .sort_values("rid")
        .reset_index(drop=True)
    )
    ref = df.sort_values(["k", "t", "rid"], kind="mergesort").copy()
    ref["roll"] = (
        ref.groupby("k")["v"].rolling(3, min_periods=1).sum()
        .reset_index(level=0, drop=True).astype(np.int64)
    )
    ref = ref.sort_values("rid")[["rid", "roll"]].reset_index(drop=True)
    pd.testing.assert_frame_equal(out, ref)


def test_rolling_sum_window_clamps_at_segment_start(ray_session):
    # two keys interleaved; win larger than one group's size
    df = pd.DataFrame({
        "rid": np.arange(5, dtype=np.int64),
        "k": np.array([1, 2, 1, 2, 1], dtype=np.int64),
        "t": np.array([0, 0, 1, 1, 2], dtype=np.int64),
        "v": np.array([10, 100, 20, 200, 30], dtype=np.int64),
    })
    ds = ray.data.from_pandas(df)
    out = (
        grouped_rolling_sum(ds, "k", ["t", "rid"], "v", ["rid"], 4, "roll")
        .to_pandas().sort_values("rid").reset_index(drop=True)
    )
    assert out["roll"].tolist() == [10, 100, 30, 300, 60]


def test_rolling_sum_rejects_empty_window(ray_session):
    df = _frame(10)
    with pytest.raises(ValueError):
        grouped_rolling_sum(ray.data.from_pandas(df), "k", ["t", "rid"],
                            "v", ["rid"], 0)
