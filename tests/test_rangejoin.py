"""stages/rangejoin.py — self window count vs brute force."""

from __future__ import annotations

import numpy as np
import pandas as pd
import ray.data

from orthority_ray.stages.rangejoin import self_window_count

W = 50


def _brute(df: pd.DataFrame) -> pd.DataFrame:
    out = []
    for _, r in df.iterrows():
        n = (
            (df["k"] == r["k"]) & (df["t"] > r["t"]) & (df["t"] <= r["t"] + W)
        ).sum()
        out.append((r["id"], n))
    return pd.DataFrame(out, columns=["id", "n_follow"]).astype(np.int64)


def _run(df: pd.DataFrame, blocks: int) -> pd.DataFrame:
    out = self_window_count(
        ray.data.from_pandas(df).repartition(blocks), "k", "t", "id", W
    ).to_pandas()
    return out.sort_values("id").reset_index(drop=True)


def test_window_count_matches_bruteforce(ray_session):
    rng = np.random.RandomState(2)
    df = pd.DataFrame(
        {"id": np.arange(300), "k": rng.randint(0, 10, 300),
         "t": rng.randint(0, 400, 300)}
    )
    got = _run(df, blocks=5)
    want = _brute(df).sort_values("id").reset_index(drop=True)
    pd.testing.assert_frame_equal(got, want)


def test_window_count_partition_invariant_and_ties(ray_session):
    # equal timestamps: strictly-after excludes the tied row itself
    df = pd.DataFrame(
        {"id": np.arange(6), "k": [1, 1, 1, 1, 2, 2],
         "t": [100, 100, 120, 300, 100, 149]}
    )
    got1 = _run(df, blocks=1)
    got3 = _run(df, blocks=3)
    pd.testing.assert_frame_equal(got1, got3)
    by_id = dict(zip(got1["id"], got1["n_follow"]))
    assert by_id[0] == 1  # only t=120 (t=100 tie excluded)
    assert by_id[1] == 1
    assert by_id[2] == 0  # 300 is past 120+50
    assert by_id[4] == 1  # 149 within (100, 150]
    assert by_id[5] == 0
