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
