"""Audit-operator edge contracts: NULL/empty profile semantics and the
fused multi-FK probe pass (review-hardening round 3)."""

from __future__ import annotations

import duckdb
import numpy as np
import pandas as pd
import pyarrow as pa
import pyarrow.parquet as pq
import pytest


@pytest.fixture()
def nulltab(tmp_path):
    t = pa.table({
        "a": pa.array([1, 2, None, 4], pa.int64()),
        "b": pa.array([None, None, None, None], pa.int64()),
    })
    pq.write_table(t, tmp_path / "mytab.parquet")
    return str(tmp_path)


def _oracle(path: str, table: str, cols) -> pd.DataFrame:
    from orthority_ray.stages.audit import sql_table_profile

    con = duckdb.connect()
    con.sql(f"CREATE VIEW {table} AS SELECT * FROM '{path}/{table}.parquet'")
    return con.sql(sql_table_profile(table, cols)).df()


def _canon(df: pd.DataFrame) -> list[tuple]:
    df = df.sort_values("col_name").reset_index(drop=True)
    out = []
    for _, r in df.iterrows():
        out.append(tuple(
            None if pd.isna(v) else int(v) if not isinstance(v, str) else v
            for v in (r["col_name"], r["n_rows"], r["n_null"],
                      r["min_v"], r["max_v"])))
    return out


def test_table_profile_all_null_column_matches_sql(ray_session, nulltab):
    from orthority_ray.stages.audit import table_profile

    got = table_profile(nulltab, "mytab", ("a", "b"))
    want = _oracle(nulltab, "mytab", ("a", "b"))
    assert _canon(got) == _canon(want)
    # the all-null column reports NULL min/max, not int64 sentinels
    row_b = got[got["col_name"] == "b"].iloc[0]
    assert pd.isna(row_b["min_v"]) and pd.isna(row_b["max_v"])
    assert int(row_b["n_null"]) == 4


def test_table_profile_empty_table_one_row_per_column(ray_session, tmp_path):
    from orthority_ray.stages.audit import table_profile

    t = pa.table({"a": pa.array([], pa.int64()),
                  "b": pa.array([], pa.int64())})
    pq.write_table(t, tmp_path / "mytab.parquet")
    got = table_profile(str(tmp_path), "mytab", ("a", "b"))
    want = _oracle(str(tmp_path), "mytab", ("a", "b"))
    assert _canon(got) == _canon(want)
    assert len(got) == 2
    assert got["n_rows"].tolist() == [0, 0]
    assert got["min_v"].isna().all() and got["max_v"].isna().all()


def test_fk_orphan_counts_fused_pass(ray_session, sf_unit):
    """The fused per-fact probe must equal the SQL LEFT JOIN oracle and
    cover every declared relation exactly once, in declaration order."""
    from orthority_ray.stages.audit import (DIM_RELATIONS, SQL_FK_ORPHANS,
                                            fk_orphan_counts)

    got = fk_orphan_counts(sf_unit)
    con = duckdb.connect()
    for tab in ("lineitem", "orders", "customer", "supplier", "nation",
                "region", "part"):
        con.sql(f"CREATE VIEW {tab} AS SELECT * FROM '{sf_unit}/{tab}.parquet'")
    want = con.sql(SQL_FK_ORPHANS).df()
    g = got.sort_values("relation").reset_index(drop=True)
    w = want.sort_values("relation").reset_index(drop=True)
    pd.testing.assert_frame_equal(g, w, check_dtype=False)
    expect_order = [f"{f}->{d}" for f, _, d, _ in DIM_RELATIONS] + [
        "lineitem->orders"]
    assert got["relation"].tolist() == expect_order


def test_vocab_growth_drops_tokenless_hours(ray_session):
    """An hour whose pages all tokenize empty must emit NO row (the SQL
    occ CTE has nothing to unnest)."""
    import ray.data

    from orthority_ray.stages.lexstats import vocab_growth

    pages = ray.data.from_arrow(pa.table({
        "doc_id": pa.array([0, 1, 3600, 3601, 7200], pa.int64()),
        "text": pa.array(["alpha beta", "alpha", "  \t ", "", "beta gamma"],
                         pa.string()),
    }))
    got = vocab_growth(pages).to_pandas().sort_values("hour").reset_index(
        drop=True)
    # hour 1 (docs 3600/3601) has zero tokens -> omitted entirely
    assert got["hour"].tolist() == [0, 2]
    assert got["n_tokens"].tolist() == [3, 2]
    assert got["n_new_tokens"].tolist() == [2, 1]  # gamma first at hour 2
