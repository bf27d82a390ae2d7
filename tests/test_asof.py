"""stages/asof.py — as-of join vs a brute-force reference."""

from __future__ import annotations

import numpy as np
import pandas as pd
import ray.data

from orthority_ray.stages.asof import asof_join


def _brute(l: pd.DataFrame, r: pd.DataFrame, fill: int = -1) -> pd.DataFrame:
    rows = []
    for _, lv in l.iterrows():
        cand = r[(r["k"] == lv["k"]) & (r["t"] <= lv["t"])]
        if len(cand):
            # latest time; ties -> max value tuple
            best = cand.sort_values(["t", "v"]).iloc[-1]
            rows.append((lv["lid"], lv["k"], best["v"]))
        else:
            rows.append((lv["lid"], lv["k"], fill))
    return pd.DataFrame(rows, columns=["lid", "k", "v"]).astype(np.int64)


def _run(l: pd.DataFrame, r: pd.DataFrame, blocks: int = 3) -> pd.DataFrame:
    out = asof_join(
        ray.data.from_pandas(l).repartition(blocks),
        ray.data.from_pandas(r).repartition(blocks),
        key="k", time_col="t",
        left_cols=["lid", "k"], right_cols=["k", "v"],
    ).to_pandas()
    return out.sort_values("lid").reset_index(drop=True)


def test_asof_matches_bruteforce(ray_session):
    rng = np.random.RandomState(3)
    l = pd.DataFrame(
        {"lid": np.arange(200), "k": rng.randint(0, 12, 200),
         "t": rng.randint(0, 1000, 200)}
    )
    r = pd.DataFrame(
        {"k": rng.randint(0, 15, 80), "t": rng.randint(0, 1000, 80),
         "v": np.arange(80)}
    )
    got = _run(l, r)
    want = _brute(l, r).sort_values("lid").reset_index(drop=True)
    got = got[["lid", "k", "v"]]
    pd.testing.assert_frame_equal(got, want)
    assert got["v"].dtype == np.int64  # no NaN upcast despite misses


def test_asof_tie_breaks_to_max_value(ray_session):
    l = pd.DataFrame({"lid": [0], "k": [7], "t": [100]})
    r = pd.DataFrame({"k": [7, 7, 7], "t": [100, 100, 50], "v": [5, 9, 1]})
    got = _run(l, r, blocks=1)
    assert got["v"].tolist() == [9]  # equal times -> max v wins


def test_asof_partition_invariant(ray_session):
    rng = np.random.RandomState(5)
    l = pd.DataFrame(
        {"lid": np.arange(150), "k": rng.randint(0, 9, 150),
         "t": rng.randint(0, 500, 150)}
    )
    r = pd.DataFrame(
        {"k": rng.randint(0, 9, 60), "t": rng.randint(0, 500, 60),
         "v": np.arange(60)}
    )
    a = _run(l, r, blocks=1)
    b = _run(l, r, blocks=7)
    pd.testing.assert_frame_equal(a, b)
