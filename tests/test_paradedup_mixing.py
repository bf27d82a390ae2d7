"""Paragraph-level dedup (stages/paradedup) + token-budget mixing
(stages/mixing): kernel edge cases the sf-data oracle sweep can't reach —
internal duplicate paragraphs, empty/whitespace texts, budget boundaries
that split a quality tie, and the IDX_LIMIT loud-failure guard."""

from __future__ import annotations

import numpy as np
import pandas as pd
import pyarrow as pa
import pytest
import ray.data

from orthority_ray.stages.mixing import token_budget_mix_pages
from orthority_ray.stages.paradedup import (
    IDX_LIMIT,
    W_TOKENS,
    _chunk_reps,
    nonempty_token_counts,
    paragraph_dedup_pages,
)


def _toks(n: int, word: str = "w") -> str:
    return " ".join(f"{word}{i}" for i in range(n))


def test_nonempty_token_counts_whitespace_and_empty():
    text = pa.array(["a  b\tc", "", "   ", "x"])
    flat, ntok, starts = nonempty_token_counts(text)
    assert ntok.tolist() == [3, 0, 0, 1]
    assert starts.tolist() == [0, 3, 3, 3]
    assert flat.to_pylist() == ["a", "b", "c", "x"]


def test_chunk_reps_boundaries_and_partial_tail():
    # 2*W + 3 tokens -> chunks of W, W, 3
    t = pa.table({"doc_id": pa.array([7], pa.int64()),
                  "text": pa.array([_toks(2 * W_TOKENS + 3)])})
    out = _chunk_reps(t)
    assert out["cidx"].to_pylist() == [0, 1, 2]
    assert out["n_chunks"].to_pylist() == [3, 3, 3]
    chunks = out["chunk"].to_pylist()
    assert chunks[0].split() == [f"w{i}" for i in range(W_TOKENS)]
    assert chunks[2].split() == [f"w{i}" for i in range(2 * W_TOKENS,
                                                        2 * W_TOKENS + 3)]


def test_chunk_reps_empty_text_contributes_nothing():
    t = pa.table({"doc_id": pa.array([1, 2, 3], pa.int64()),
                  "text": pa.array(["", _toks(2), "  "])})
    out = _chunk_reps(t)
    assert out["doc_id"].to_pylist() == [2]
    assert out["chunk"].to_pylist() == ["w0 w1"]


def test_chunk_reps_idx_limit_guard():
    t = pa.table({"doc_id": pa.array([1], pa.int64()),
                  "text": pa.array([_toks(W_TOKENS * IDX_LIMIT + 1)])})
    with pytest.raises(ValueError, match="IDX_LIMIT"):
        _chunk_reps(t)


def test_paragraph_dedup_internal_repeat_and_cross_doc(ray_session):
    # doc 10: paragraph A twice (cidx 0 and 1) -> keeps only cidx 0.
    # doc 20: paragraph A then B -> keeps only B (A first seen in doc 10).
    # doc 30: exact duplicate text of doc 10 -> keeps nothing.
    A = " ".join(["a"] * W_TOKENS)
    B = " ".join([f"b{i}" for i in range(W_TOKENS)])
    pages = ray.data.from_arrow(pa.table({
        "doc_id": pa.array([10, 20, 30], pa.int64()),
        "text": pa.array([f"{A} {A}", f"{A} {B}", f"{A} {A}"])}))
    out = paragraph_dedup_pages(pages).to_pandas().sort_values(
        "doc_id").reset_index(drop=True)
    assert out["doc_id"].tolist() == [10, 20]
    assert out["n_chunks"].tolist() == [2, 2]
    assert out["n_kept"].tolist() == [1, 1]
    assert out["kept_text"].tolist() == [A, B]


def test_token_budget_mix_splits_quality_ties_by_doc_id(ray_session):
    # All docs identical quality; budget admits exactly 2.5 docs' tokens ->
    # the 2 lowest doc_ids are selected per lang (doc_id breaks the tie).
    text = _toks(25)  # quality: len-band fails (<20? no: 25 tokens -> ok)
    pages = ray.data.from_arrow(pa.table({
        "doc_id": pa.array([5, 3, 9, 104, 102], pa.int64()),
        "lang": pa.array(["en", "en", "en", "fr", "fr"]),
        "text": pa.array([text] * 5)}))
    out = token_budget_mix_pages(pages, budget=60).to_pandas()
    out = out.sort_values("lang").reset_index(drop=True)
    assert out["lang"].tolist() == ["en", "fr"]
    assert out["n_selected"].tolist() == [2, 2]
    assert out["tok_selected"].tolist() == [50, 50]
    assert out["id_sum"].tolist() == [3 + 5, 102 + 104]


def test_token_budget_mix_pandas_reference(ray_session):
    # randomized-but-deterministic corpus vs a plain pandas window reference
    rng = np.random.RandomState(7)
    n = 400
    langs = np.array(["en", "fr", "de"])[rng.randint(0, 3, n)]
    ntok = rng.randint(1, 40, n)
    texts = [" ".join(["tok"] * k) for k in ntok]
    doc_id = np.arange(n, dtype=np.int64)
    pages = ray.data.from_arrow(pa.table({
        "doc_id": pa.array(doc_id), "lang": pa.array(langs),
        "text": pa.array(texts)}))
    budget = 900
    got = token_budget_mix_pages(pages, budget=budget).to_pandas()
    got = got.sort_values("lang").reset_index(drop=True)

    from orthority_ray.stages.textstats import QualityScorer

    q = QualityScorer()(pa.table({"text": pa.array(texts)}))["quality"]
    ref = pd.DataFrame({"doc_id": doc_id, "lang": langs, "ntok": ntok,
                        "quality": q.to_numpy()})
    ref = ref.sort_values(["lang", "quality", "doc_id"],
                          ascending=[True, False, True])
    ref["cum"] = ref.groupby("lang")["ntok"].cumsum()
    sel = ref[ref["cum"] <= budget]
    exp = sel.groupby("lang", as_index=False).agg(
        n_selected=("doc_id", "size"), tok_selected=("ntok", "sum"),
        id_sum=("doc_id", "sum")).sort_values("lang").reset_index(drop=True)
    assert got["lang"].tolist() == exp["lang"].tolist()
    assert got["n_selected"].tolist() == exp["n_selected"].tolist()
    assert got["tok_selected"].tolist() == exp["tok_selected"].tolist()
    assert got["id_sum"].tolist() == exp["id_sum"].tolist()
