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
