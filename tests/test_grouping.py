"""stages/grouping.py — bucketed group-apply vs naive per-group reference."""

from __future__ import annotations

import itertools

import numpy as np
import pandas as pd
import pyarrow as pa
import ray.data

from orthority_ray.stages.grouping import (
    bucketed_group_apply,
    distinct_rows,
    grouped_pairs,
)


def _ds(df: pd.DataFrame, blocks: int = 5) -> ray.data.Dataset:
    return ray.data.from_pandas(df).repartition(blocks)


def test_bucketed_group_apply_sees_whole_groups(ray_session):
    # every group's rows land in exactly one fn invocation
    rng = np.random.RandomState(7)
    df = pd.DataFrame({"k": rng.randint(0, 50, 500), "v": np.arange(500)})

    def fn(g: pd.DataFrame) -> pd.DataFrame:
        # per distinct key: count + sum, vectorized
        return g.groupby("k", as_index=False)["v"].agg(["count", "sum"])

    got = (
        bucketed_group_apply(_ds(df), ["k"], fn, n_buckets=8)
        .to_pandas()
        .sort_values("k")
        .reset_index(drop=True)
    )
    want = (
        df.groupby("k", as_index=False)["v"]
        .agg(["count", "sum"])
        .sort_values("k")
        .reset_index(drop=True)
    )
    pd.testing.assert_frame_equal(got, want)


def test_bucketed_group_apply_string_keys(ray_session):
    df = pd.DataFrame(
        {"s": [f"key{i % 13}" for i in range(200)], "v": np.arange(200)}
    )

    def fn(g: pd.DataFrame) -> pd.DataFrame:
        return g.groupby("s", as_index=False)["v"].sum()

    got = bucketed_group_apply(_ds(df), ["s"], fn, n_buckets=4).to_pandas()
    want = df.groupby("s", as_index=False)["v"].sum()
    got = got.sort_values("s").reset_index(drop=True)
    want = want.sort_values("s").reset_index(drop=True)
    pd.testing.assert_frame_equal(got, want)


def test_distinct_rows_deterministic_representative(ray_session):
    df = pd.DataFrame(
        {
            "k": [3, 1, 3, 2, 1, 3],
            "extra": ["f", "b", "e", "c", "a", "d"],
        }
    )
    got = distinct_rows(_ds(df, blocks=3), ["k"]).to_pandas()
    got = got.sort_values("k").reset_index(drop=True)
    # representative = first row under a sort on the KEY columns only; with
    # duplicate keys the kept 'extra' is the one from the stable key sort,
    # so assert the keys and that each extra belongs to its key's rows
    assert sorted(got["k"]) == [1, 2, 3]
    for _, row in got.iterrows():
        assert row["extra"] in set(df[df["k"] == row["k"]]["extra"])
    # and the choice is deterministic across runs / partitionings
    again = distinct_rows(_ds(df, blocks=1), ["k"]).to_pandas()
    again = again.sort_values("k").reset_index(drop=True)
    pd.testing.assert_frame_equal(got, again)


def test_grouped_pairs_matches_bruteforce():
    rng = np.random.RandomState(11)
    df = pd.DataFrame(
        {
            "band": rng.randint(0, 3, 120),
            "bh": rng.randint(0, 5, 120),
            "id": rng.randint(0, 40, 120),
        }
    )
    got = grouped_pairs(df, ["band", "bh"], "id", "a", "b")
    got_set = set(zip(got["a"], got["b"]))
    want = set()
    for (_, _), g in df.groupby(["band", "bh"]):
        for x, y in itertools.combinations(sorted(set(g["id"])), 2):
            want.add((x, y))
    assert got_set == want
    # a < b everywhere, no duplicates within a group's expansion set
    assert (got["a"] < got["b"]).all()


def test_grouped_pairs_empty_and_singletons():
    empty = grouped_pairs(
        pd.DataFrame({"k": [], "id": []}), ["k"], "id", "a", "b"
    )
    assert len(empty) == 0 and empty["a"].dtype == np.int64
    single = grouped_pairs(
        pd.DataFrame({"k": [1, 2, 3], "id": [10, 20, 30]}), ["k"], "id", "a", "b"
    )
    assert len(single) == 0
