"""Unit tests for stages/ngram.py and pipelines/tpch_extra.py helpers.

The DuckDB oracle sweep (test_oracle_sweep.py) pins end-to-end exactness on
the ASCII testdata; these tests pin the pieces the oracle cannot reach:
non-ASCII codepoint packing, short/empty-text edges, block-split invariance
of the pair set, and global_topk determinism under different block layouts.
"""

from __future__ import annotations

import numpy as np
import pandas as pd
import pyarrow as pa
import pytest
import ray
import ray.data

from orthority_ray.stages.ngram import (
    THRESH_DEN,
    THRESH_NUM,
    _pair_task,
    ngram_jaccard_pairs,
    trigram_sets,
)


def _ref_trigrams(text: str) -> set[str]:
    return {text[i:i + 3] for i in range(len(text) - 2)}


def _unpack(packed: int) -> str:
    return "".join(chr((packed >> s) & 0x1FFFFF) for s in (42, 21, 0))


@pytest.mark.parametrize("texts", [
    ["hello world", "hello world", "abc", "ab", "a", ""],
    ["aaaa", "abababab", "xyzxyzxyz"],
    # non-ASCII: multi-byte UTF-8, BMP and astral (codepoint > 2^16) chars
    ["héllo wörld", "日本語のテキスト", "emoji 🚀🚀 pair", "🚀🚀🚀🚀"],
    [],
    ["", ""],
])
def test_trigram_sets_matches_python_reference(texts):
    d, t = trigram_sets(texts)
    got: dict[int, set[str]] = {}
    for di, ti in zip(d, t):
        got.setdefault(int(di), set()).add(_unpack(int(ti)))
    for i, text in enumerate(texts):
        expect = _ref_trigrams(text)
        assert got.get(i, set()) == expect, (i, text)
    # distinctness: no (doc, trigram) pair emitted twice
    assert len(set(zip(d.tolist(), t.tolist()))) == d.size


def test_trigram_packing_is_bijective_for_astral_codepoints():
    # two different astral trigrams must pack to different ints
    a = trigram_sets(["🚀🛰️x"])[1]
    b = trigram_sets(["🚀🛰️y"])[1]
    assert set(a.tolist()) != set(b.tolist())


def test_pair_task_diagonal_equals_split_blocks(ray_session):
    # the pair set must not depend on how reps are split into blocks
    texts = [f"the quick brown fox {i} jumps over the lazy dog" for i in range(6)]
    texts += ["totally unrelated text about ray data engines"] * 2
    ids = np.arange(len(texts), dtype=np.int64)
    tbl = pa.table({"doc_id": pa.array(ids), "text": pa.array(texts)})

    from orthority_ray.stages.ngram import _block_sets

    pre = _block_sets(tbl)
    one = ray.get(_pair_task.remote(pre, pre, True, 1, 2)).to_pandas()

    half = len(texts) // 2
    pre_a, pre_b = (_block_sets(tbl.slice(0, half)),
                    _block_sets(tbl.slice(half)))
    split = pa.concat_tables([
        ray.get(_pair_task.remote(pre_a, pre_a, True, 1, 2)),
        ray.get(_pair_task.remote(pre_a, pre_b, False, 1, 2)),
        ray.get(_pair_task.remote(pre_b, pre_b, True, 1, 2)),
    ]).to_pandas()

    key = ["doc_a", "doc_b", "n_inter", "n_union"]
    a = one.sort_values(key).reset_index(drop=True)
    b = split.sort_values(key).reset_index(drop=True)
    pd.testing.assert_frame_equal(a, b)
    assert len(a) > 0  # the template texts are jaccard >= 0.5 pairs


def test_ngram_jaccard_pairs_runs_and_is_deterministic(ray_session, sf_unit):
    a = ngram_jaccard_pairs(sf_unit).to_pandas().sort_values(
        ["doc_a", "doc_b"]).reset_index(drop=True)
    b = ngram_jaccard_pairs(sf_unit).to_pandas().sort_values(
        ["doc_a", "doc_b"]).reset_index(drop=True)
    pd.testing.assert_frame_equal(a, b)
    # threshold respected
    assert (a["n_inter"] * THRESH_DEN >= a["n_union"] * THRESH_NUM).all()
    assert (a["doc_a"] < a["doc_b"]).all()


def test_global_topk_is_block_layout_invariant(ray_session):
    from orthority_ray.pipelines.tpch_extra import global_topk

    rng = np.random.default_rng(7)
    vals = rng.integers(0, 50, size=1000)          # heavy ties
    keys = np.arange(1000, dtype=np.int64)
    rng.shuffle(keys)
    tbl = pa.table({"k": pa.array(keys), "v": pa.array(vals.astype(np.int64))})

    def run(nblocks: int) -> pd.DataFrame:
        ds = ray.data.from_arrow(tbl).repartition(nblocks)
        return global_topk(ds, ["v", "k"], [False, True], 25).to_pandas()

    a, b = run(1), run(13)
    pd.testing.assert_frame_equal(a, b)
    # rank is 1..k and ordering is (v desc, k asc)
    assert list(a["rank"]) == list(range(1, 26))
    assert (a["v"].diff().dropna() <= 0).all()
    ties = a[a["v"].duplicated(keep=False)]
    for _, g in ties.groupby("v"):
        assert g["k"].is_monotonic_increasing
