"""Round-5 regression pins for the r4 ADVICE findings.

The r4 round shipped an oracle_sql() that raised NameError (an f-string
referenced _N_HOSTS which was only imported inside the query function),
which blanked the driver's ENTIRE correctness run.  These tests make that
class of failure loud in CI:
- oracle_sql() must build, return non-empty SQL strings, and every key
  must exist in queries();
- the host_cap oracle and q_host_cap share one HOST_CAP_K constant;
- host_cap is in _DRIVER_UNCHECKED_FIRST (prefix-sampled by the driver);
- disc_index_vec (the vectorized quantile-boundary index used by
  trimmed_mean) agrees with the property-tested scalar _disc_index.
"""

from __future__ import annotations

import numpy as np
import pytest


def test_oracle_sql_builds_and_is_consistent():
    import __ray_entry__ as E

    oracles = E.oracle_sql()          # must not raise (r4: NameError here)
    queries = E.queries()
    assert len(oracles) >= 147
    for name, sql in oracles.items():
        assert isinstance(sql, str) and sql.strip(), name
        assert name in queries, f"oracle {name!r} has no queries() entry"


def test_host_cap_oracle_uses_shared_k():
    import __ray_entry__ as E

    sql = E.oracle_sql()["host_cap"]
    assert f"rn <= {E.HOST_CAP_K}" in sql
    import inspect
    sig = inspect.signature(E.q_host_cap)
    assert sig.parameters["k"].default == E.HOST_CAP_K


def test_host_cap_in_driver_priority_list():
    import __ray_entry__ as E

    assert "host_cap" in E._DRIVER_UNCHECKED_FIRST
    # the priority list must stay a subset of the registry (checked loudly
    # inside queries(), but pin it here too)
    assert set(E._DRIVER_UNCHECKED_FIRST) <= set(E.queries())


def test_disc_index_vec_matches_scalar():
    from orthority_ray.stages.quantiles import _disc_index, disc_index_vec

    ns = np.arange(1, 200)
    for q in (0.0, 0.1, 0.25, 0.5, 0.9, 0.99, 1.0):
        want = np.array([_disc_index(int(n), q) for n in ns])
        got = disc_index_vec(ns, q)
        assert (want == got).all(), q


# --- combined_groupby_sum multi-key bucket exchange (r5) ---------------------


def _cgs(df, keys, sum_cols, count_alias=None):
    import pandas as pd
    import pyarrow as pa
    import ray.data
    from orthority_ray.pipelines.relational import combined_groupby_sum

    ds = ray.data.from_arrow(pa.Table.from_pandas(df, preserve_index=False)) \
        .repartition(4)
    out = combined_groupby_sum(ds, keys, sum_cols,
                               count_alias=count_alias).to_pandas()
    return out.sort_values(keys).reset_index(drop=True)


def test_combined_groupby_sum_multikey_matches_pandas():
    import numpy as np
    import pandas as pd

    rng = np.random.default_rng(7)
    df = pd.DataFrame({
        "a": rng.integers(0, 50, 5000),
        "b": rng.integers(-3, 3, 5000),
        "x": rng.integers(-1000, 1000, 5000),
        "y": rng.integers(0, 10, 5000),
    })
    got = _cgs(df, ["a", "b"], ["x", "y"], count_alias="n")
    want = df.groupby(["a", "b"], as_index=False).agg(
        n=("x", "size"), x=("x", "sum"), y=("y", "sum"))
    want["n"] = want["n"].astype("int64")
    want = want[["a", "b", "n", "x", "y"]].sort_values(["a", "b"]) \
        .reset_index(drop=True)
    assert list(got.columns) == list(want.columns)
    pd.testing.assert_frame_equal(got, want)


def test_combined_groupby_sum_multikey_string_key():
    import numpy as np
    import pandas as pd

    df = pd.DataFrame({
        "k": ["x", "y", "x", "x", "y", "z"],
        "d": [1, 1, 2, 1, 1, 3],
        "v": [10, 20, 30, 40, 50, 60],
    })
    got = _cgs(df, ["k", "d"], ["v"])
    want = df.groupby(["k", "d"], as_index=False)["v"].sum() \
        .sort_values(["k", "d"]).reset_index(drop=True)
    pd.testing.assert_frame_equal(got, want)


def test_combined_groupby_sum_multikey_single_group():
    import pandas as pd

    df = pd.DataFrame({"a": [1, 1, 1], "b": [2, 2, 2], "v": [5, 6, 7]})
    got = _cgs(df, ["a", "b"], ["v"], count_alias="n")
    assert got.to_dict("records") == [{"a": 1, "b": 2, "n": 3, "v": 18}]


def test_round5_new_queries_registered():
    """Every round-5 operator must stay in BOTH maps and in the driver
    priority sample (the r4 failure mode was a registry/oracle drift)."""
    import __ray_entry__ as E

    new = ["interval_coverage", "hamming_neighbors", "host_distance",
           "supplier_cooccurrence", "value_cdf", "pareto_orders",
           "id_gaps", "time_weighted_value", "top_paths",
           "trending_tokens", "skew_report", "conversion_latency",
           "value_trend", "events_rolling_median", "user_streaks",
           "interarrival_quantiles", "cooccurrence_lift",
           "power_users", "label_embedding_sums", "ncm_confusion",
           "rising_tokens"]
    q, o = E.queries(), E.oracle_sql()
    for name in new:
        assert name in q, name
        assert name in o, name
        assert name in E._DRIVER_UNCHECKED_FIRST, name
