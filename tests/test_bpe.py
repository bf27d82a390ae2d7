"""Distributed BPE training vs a single-process reference implementation."""

from __future__ import annotations

import duckdb

from orthority_ray.stages.bpe import bpe_train, reference_bpe, train_bpe


def test_matches_reference_on_corpus(ray_session, sf_unit):
    """The distributed trainer must learn the EXACT merge table the plain
    single-process algorithm learns on the same corpus (same tie-breaks)."""
    from orthority_ray.sources.sql import with_pages

    con = duckdb.connect()
    for t in ("lineitem", "documents"):
        con.sql(f"CREATE VIEW {t} AS SELECT * FROM '{sf_unit}/{t}.parquet'")
    texts = con.sql(with_pages("SELECT text FROM pages")).df()["text"].tolist()

    got = bpe_train(sf_unit, n_merges=12)
    want = reference_bpe(texts, n_merges=12)
    assert got.equals(want)
    assert len(got) == 12  # this corpus has at least 12 productive merges
    # counts are non-increasing is NOT guaranteed in BPE, but every count
    # must be >= 2 (the merge-productivity floor)
    assert (got["n_pairs"] >= 2).all()


def test_deterministic_rerun(ray_session, sf_unit):
    a = bpe_train(sf_unit, n_merges=6)
    b = bpe_train(sf_unit, n_merges=6)
    assert a.equals(b)


def test_reference_learns_frequent_pairs(ray_session):
    import ray.data
    import pyarrow as pa

    texts = ["aa ab aa", "aa aa ab"] * 50
    ds = ray.data.from_arrow(pa.table({"text": pa.array(texts)})).repartition(4)
    got = train_bpe(ds, n_merges=2)
    want = reference_bpe(texts, n_merges=2)
    assert got.equals(want)
    # (a,a) and (a,</w>) tie at the top; '<' sorts before 'a', so the
    # deterministic tie-break picks (a, </w>) first
    assert got.iloc[0]["left"] == "a" and got.iloc[0]["right"] == "</w>"
    assert got.iloc[1]["left"] == "a" and got.iloc[1]["right"] == "a</w>"


def test_bpe_encode_matches_brute_force(ray_session):
    import numpy as np
    import pyarrow as pa
    import ray.data

    from orthority_ray.stages.bpe import (
        BpeEncoder,
        encode_word,
        train_bpe,
    )

    texts = [
        "the cat sat on the mat",
        "the bat  and the cat",   # double space -> empty token dropped
        "",                        # empty doc
        "mat mat mat bat",
    ]
    docs = ray.data.from_arrow(pa.table({
        "doc_id": np.arange(len(texts), dtype=np.int64),
        "text": pa.array(texts),
    }))
    merges_df = train_bpe(docs, n_merges=8)
    merges = list(zip(merges_df["left"], merges_df["right"]))

    import ray as _ray

    enc = BpeEncoder(_ray.put(merges))
    out = enc(pa.table({"doc_id": pa.array(np.arange(len(texts))),
                        "text": pa.array(texts)}))
    got = out.to_pandas().set_index("doc_id")
    for i, t in enumerate(texts):
        words = [w for w in t.split() if w]
        assert got.loc[i, "n_words"] == len(words)
        assert got.loc[i, "n_bpe_tokens"] == sum(
            len(encode_word(w, merges)) for w in words)
    # merged tokens genuinely compress: 'the' appears 4x, must merge
    assert got["n_bpe_tokens"].sum() < sum(
        len(w) + 1 for t in texts for w in t.split() if w)


def test_bpe_encode_query_deterministic(ray_session, sf_unit):
    from orthority_ray.stages.bpe import bpe_encode

    a = bpe_encode(sf_unit).to_pandas().sort_values("doc_id").reset_index(drop=True)
    b = bpe_encode(sf_unit).to_pandas().sort_values("doc_id").reset_index(drop=True)
    assert len(a) == 6000
    assert a.equals(b)
    assert (a["n_bpe_tokens"] >= a["n_words"]).all()  # >= 1 subtoken per word


def test_distributed_rounds_match_driver_fast_path(ray_session, sf_unit,
                                                   monkeypatch):
    """The distributed merge rounds (vocab above SMALL_VOCAB_LIMIT) learn
    the exact same table as the driver fast path — the limit is a pure
    perf switch, never a semantics switch.  SMALL_VOCAB_LIMIT is read on
    the DRIVER inside train_bpe, so monkeypatching reaches it."""
    import pandas as pd

    from orthority_ray.sources.pages import read_pages
    from orthority_ray.stages import bpe as B

    pages = read_pages(sf_unit, columns=["doc_id", "text"])
    fast = train_bpe(pages, n_merges=6)
    monkeypatch.setattr(B, "SMALL_VOCAB_LIMIT", 0)
    dist = train_bpe(pages, n_merges=6)
    pd.testing.assert_frame_equal(fast, dist)
