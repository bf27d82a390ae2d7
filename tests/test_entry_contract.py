"""Driver-contract simulation: run EVERY queries() entry and compare against
its oracle_sql() exactly the way the driver does (row count + schema + order-
insensitive values), at sf0.001 for speed (driver uses sf0.01)."""

import duckdb
import numpy as np
import pandas as pd
import pytest

import __ray_entry__ as E

TABLES = (
    "region nation customer supplier part orders lineitem events documents embeddings"
).split()


def _con(sf_dir):
    con = duckdb.connect()
    for t in TABLES:
        con.sql(f"CREATE VIEW {t} AS SELECT * FROM '{sf_dir}/{t}.parquet'")
    return con


def _to_pdf(res) -> pd.DataFrame:
    import pyarrow as pa
    import ray.data

    if isinstance(res, ray.data.Dataset):
        return res.to_pandas()
    if isinstance(res, pa.Table):
        return res.to_pandas()
    return res


from conftest import canon_pdf as _canon  # shared canonicalizer


ORACLE_NAMES = sorted(E.oracle_sql().keys())
ALL_NAMES = sorted(E.queries().keys())


@pytest.mark.parametrize("name", ORACLE_NAMES)
def test_query_matches_oracle(name, sf_unit):
    ours = _canon(_to_pdf(E.queries()[name](sf_unit)))
    con = _con(sf_unit)
    oracle = _canon(con.sql(E.oracle_sql()[name]).df())
    assert list(ours.columns) == list(oracle.columns), (
        f"{name}: columns {list(ours.columns)} vs {list(oracle.columns)}"
    )
    assert len(ours) == len(oracle), f"{name}: rows {len(ours)} vs {len(oracle)}"
    for c in ours.columns:
        # dtype must match exactly or the driver's value-hash comparison fails
        # (round 1: DuckDB SUM(BIGINT) -> HUGEINT -> float64 vs engine int64)
        assert ours[c].dtype == oracle[c].dtype, (
            f"{name}.{c}: dtype {ours[c].dtype} vs oracle {oracle[c].dtype}"
        )
        a, b = ours[c].values, oracle[c].values
        if np.issubdtype(ours[c].dtype, np.floating):
            assert np.allclose(a, b, atol=0, rtol=0), f"{name}.{c}"
        else:
            assert (a == b).all(), f"{name}.{c}"


@pytest.mark.parametrize("name", [n for n in ALL_NAMES if n not in ORACLE_NAMES])
def test_rows_only_query_runs(name, sf_unit):
    out = _to_pdf(E.queries()[name](sf_unit))
    assert len(out) >= 0
    assert len(out.columns) > 0


def test_entry_smoke():
    res = E.entry()
    pdf = _to_pdf(res)
    assert len(pdf) > 0
    assert set(pdf.columns) == {"doc_id", "tile_id", "cell"}
