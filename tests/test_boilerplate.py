"""Template detection semantics on hand-built pages (the oracle sweep
pins the DuckDB twin at sf0.001; these pin edge cases)."""

from __future__ import annotations

import pyarrow as pa
import pytest
import ray.data

from orthority_ray.stages.boilerplate import (PREFIX_TOKENS,
                                              _prefix_partial)


def _tbl(rows):
    return pa.table({"doc_id": pa.array([r[0] for r in rows], pa.int64()),
                     "text": pa.array([r[1] for r in rows], pa.string())})


def test_prefix_partial_short_and_empty_docs(ray_session):
    out = _prefix_partial(_tbl([
        (1, "a b c"),                       # shorter than PREFIX_TOKENS
        (2, " \t "),                        # tokenless -> '' prefix
        (1001, "a b c d e f g h nine ten")  # truncated at 8
    ]))
    got = {(h, p): c for h, p, c in zip(out["host_idx"].to_pylist(),
                                        out["prefix"].to_pylist(),
                                        out["c"].to_pylist())}
    assert got == {(1, "a b c"): 1, (2, ""): 1, (1, "a b c d e f g h"): 1}


def test_prefix_partial_counts_duplicates(ray_session):
    out = _prefix_partial(_tbl([(1, "x y"), (1001, "x y"), (2, "x y")]))
    got = {(h, p): c for h, p, c in zip(out["host_idx"].to_pylist(),
                                        out["prefix"].to_pylist(),
                                        out["c"].to_pylist())}
    assert got == {(1, "x y"): 2, (2, "x y"): 1}


def test_template_winner_tie_breaks_on_prefix():
    """Equal counts -> lexicographically smallest prefix wins (the SQL
    ROW_NUMBER ORDER BY c DESC, prefix ASC contract) — driven through the
    REAL bucket fold."""
    import pandas as pd

    from orthority_ray.stages.boilerplate import _per_host_fold

    g = pd.DataFrame({"host_idx": [7, 7, 7, 7, 9],
                      "prefix": ["zz", "aa", "zz", "aa", "mm"],
                      "c": [1, 1, 1, 1, 3]})
    out = _per_host_fold(g).sort_values("host_idx").reset_index(drop=True)
    assert out.iloc[0].tolist() == [7, 4, 2, "aa"]  # tie -> smaller prefix
    assert out.iloc[1].tolist() == [9, 3, 3, "mm"]
    assert PREFIX_TOKENS == 8  # SQL literal contract
