"""The driver contract as a test: EVERY oracle query vs DuckDB at sf0.001.

Mirrors the driver's comparison exactly — row count, column names, dtypes
and order-insensitive values — so a regression in any oracle query fails
here before the driver's CORRECTNESS gate sees it.  Rows-only queries are
smoke-run for schema stability.
"""

from __future__ import annotations

import duckdb
import pandas as pd
import pyarrow as pa
import pytest
import ray.data

TABLES = "region nation customer supplier part orders lineitem events documents embeddings".split()


def _to_pdf(r):
    return r.to_pandas() if isinstance(r, (ray.data.Dataset, pa.Table)) else r


from conftest import canon_pdf as _canon  # shared canonicalizer


@pytest.fixture(scope="module")
def entry(ray_session):
    import __ray_entry__ as E

    return E


@pytest.fixture(scope="module")
def con(sf_unit):
    c = duckdb.connect()
    for t in TABLES:
        c.sql(f"CREATE VIEW {t} AS SELECT * FROM '{sf_unit}/{t}.parquet'")
    return c


def _oracle_names():
    # static: parse the registry without importing ray at collection time
    import ast

    tree = ast.parse(open("__ray_entry__.py").read())
    for node in ast.walk(tree):
        if isinstance(node, ast.FunctionDef) and node.name == "oracle_sql":
            for sub in ast.walk(node):
                if isinstance(sub, ast.Dict):
                    return [k.value for k in sub.keys if isinstance(k, ast.Constant)]
    return []


@pytest.mark.parametrize("name", _oracle_names())
def test_oracle_exact(entry, con, sf_unit, name):
    ours = _canon(_to_pdf(entry.queries()[name](sf_unit)))
    oracle = _canon(con.sql(entry.oracle_sql()[name]).df())
    assert list(ours.columns) == list(oracle.columns)
    assert len(ours) == len(oracle)
    for c in ours.columns:
        assert ours[c].dtype == oracle[c].dtype, (c, ours[c].dtype, oracle[c].dtype)
        assert (ours[c].values == oracle[c].values).all(), c


def test_rows_only_queries_run(entry, sf_unit):
    rows_only = [k for k in entry.queries() if k not in entry.oracle_sql()]
    assert rows_only  # the registry advertises rows-only pipelines
    for name in rows_only:
        r = _to_pdf(entry.queries()[name](sf_unit))
        assert len(r) >= 0 and len(r.columns) > 0, name
