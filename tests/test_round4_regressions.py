"""Round-4 regression pins for the r3 ADVICE/VERDICT findings.

Each test reproduces the exact failure mode the advice described and
asserts the loud/shared behavior that replaced it:
- null text in factorize-based token counting (splits/lexstats) raises
  instead of aliasing another text's count;
- the token_budget_mix doc_id checksum raises OverflowError before the
  int64 sum can wrap (float64 shadow-sum envelope);
- a malformed parquet whose footer parse surfaces OSError (thrift
  garbage -> ArrowIOError) is QUARANTINED, not retried-then-raised;
- null join keys raise loudly through the Dataset hash_join path;
- the near-dup chain (reps -> LSH -> verified pairs) is memoized and
  shared between dup_clusters and split_leakage_neardup;
- host_stats stays oracle-aligned on multi-segment paths (r2 advice #1).
"""

from __future__ import annotations

import numpy as np
import pandas as pd
import pyarrow as pa
import pyarrow.parquet as pq
import pytest
import ray.data


def test_dedup_token_counts_matches_whitespace_split():
    from orthority_ray.core.texthash import dedup_token_counts

    texts = pd.Series(["a b  c", "", "a b  c", "  ", "one"])
    got = dedup_token_counts(texts)
    assert got.tolist() == [3, 0, 3, 0, 1]


def test_dedup_token_counts_rejects_null_text():
    from orthority_ray.core.texthash import dedup_token_counts

    with pytest.raises(ValueError, match="null text"):
        dedup_token_counts(pd.Series(["a b", None, "c"]))
    with pytest.raises(ValueError, match="null text"):
        dedup_token_counts(pa.array(["x", None], pa.string()))


def test_token_budget_mix_id_sum_envelope_raises(ray_session):
    """doc_ids large enough that sum(|doc_id|) crosses 2^62 must raise
    OverflowError loudly instead of wrapping int64 while the DuckDB twin
    promotes to HUGEINT (r3 advice #2)."""
    from orthority_ray.stages.mixing import token_budget_mix_pages

    big = np.int64(2**61)
    pages = ray.data.from_arrow(pa.table({
        "doc_id": pa.array([big, big + 1, big + 2], pa.int64()),
        "text": pa.array(["alpha beta", "gamma", "delta eps"], pa.string()),
        "lang": pa.array(["en", "en", "en"], pa.string())}))
    with pytest.raises(OverflowError, match="id_sum envelope"):
        token_budget_mix_pages(pages)


def test_token_budget_mix_small_ids_unaffected(ray_session):
    from orthority_ray.stages.mixing import token_budget_mix_pages

    pages = ray.data.from_arrow(pa.table({
        "doc_id": pa.array([1, 2, 3], pa.int64()),
        "text": pa.array(["alpha beta", "gamma", "delta eps"], pa.string()),
        "lang": pa.array(["en", "en", "en"], pa.string())}))
    out = token_budget_mix_pages(pages).to_pandas()
    assert out["n_selected"].tolist() == [3]
    assert out["tok_selected"].tolist() == [5]
    assert out["id_sum"].tolist() == [6]


def test_quarantine_thrift_garbage_oserror(ray_session, tmp_path):
    """A file whose footer parse raises OSError (ArrowIOError: thrift
    garbage behind a valid length + magic) must be QUARANTINED like an
    ArrowInvalid footer — previously it was classified transient and
    raised after 3 retries, blocking the whole drop (r3 advice #3)."""
    import struct

    from orthority_ray.sources.ingest import (incremental_ingest,
                                              quarantined_files)

    d = tmp_path / "drops"
    d.mkdir()
    pq.write_table(pa.table({"doc_id": pa.array([1, 2], pa.int64())}),
                   d / "part-0000.parquet")
    # valid PAR1 magic and footer length, garbage thrift metadata -> the
    # footer parse itself raises OSError, not ArrowInvalid
    (d / "part-9999.parquet").write_bytes(
        b"PAR1" + b"\xde\xad\xbe\xef" * 4 + struct.pack("<I", 8) + b"PAR1")
    state = tmp_path / "state"
    new, ds, commit, bad = incremental_ingest(str(d), str(state))
    assert [p.split("/")[-1] for p in bad] == ["part-9999.parquet"]
    assert len(new) == 1 and ds.count() == 2
    commit()
    assert len(quarantined_files(str(state))) == 1


def test_hash_join_null_key_raises(ray_session):
    """Null join keys must raise loudly (a null int key would hash
    nondeterministically across nodes and silently drop rows)."""
    from orthority_ray.stages.hashjoin import hash_join

    left = ray.data.from_arrow(pa.table({
        "k": pa.array([1, None, 3], pa.int64()),
        "v": pa.array([10, 20, 30], pa.int64())}))
    right = ray.data.from_arrow(pa.table({
        "k": pa.array([1, 3], pa.int64()),
        "w": pa.array([7, 9], pa.int64())}))
    with pytest.raises(Exception, match="null join keys"):
        hash_join(left, right, "k", ["k", "v"], ["k", "w"],
                  types={"v": pa.int64(), "w": pa.int64()}).to_pandas()


def test_neardup_family_memoizes_per_corpus(ray_session):
    from orthority_ray.stages import dedup as D

    sf = "/root/testdata/sf0.001"
    D._NEARDUP_MEMO.clear()
    reps1, ver1 = D.neardup_family(sf, threshold=0.8)
    reps2, ver2 = D.neardup_family(sf, threshold=0.8)
    assert reps1 is reps2 and ver1 is ver2  # cache hit, no recompute
    assert len(D._NEARDUP_MEMO) == 1
    # a different threshold is a different key; the memo keeps only the
    # newest entry so at most one corpus stays pinned
    D.neardup_family(sf, threshold=0.9)
    assert len(D._NEARDUP_MEMO) == 1
    D._NEARDUP_MEMO.clear()


def test_split_leakage_neardup_runs_on_unit_corpus(ray_session):
    from orthority_ray.stages import dedup as D
    from orthority_ray.stages.splits import split_leakage_neardup

    D._NEARDUP_MEMO.clear()
    out = split_leakage_neardup("/root/testdata/sf0.001")
    assert out["pair_kind"].tolist() == ["train-val", "train-test",
                                         "val-test"]
    assert (out["n_pairs"] >= 0).all()
    # deterministic under the memo (second run hits the cache)
    out2 = split_leakage_neardup("/root/testdata/sf0.001")
    assert out2["n_pairs"].tolist() == out["n_pairs"].tolist()
    D._NEARDUP_MEMO.clear()


def test_host_stats_multisegment_paths_match_duckdb(ray_session):
    """Multi-segment paths (the r2 advice case): path = EVERYTHING after
    the first '/', on BOTH the engine and the SQL twin."""
    import duckdb

    from orthority_ray.stages.urlstats import SQL_HOST_STATS, host_stats

    urls = ["https://a.example/x/y/z", "https://a.example/x/y",
            "https://a.example/x/y/z", "https://b.example/",
            "https://b.example/p", "https://b.example/p/"]
    df = pd.DataFrame({"url": urls,
                       "doc_id": np.arange(6, dtype=np.int64)})
    got = (host_stats(ray.data.from_pandas(df).repartition(3)).to_pandas()
           .sort_values("host").reset_index(drop=True))
    con = duckdb.connect()
    con.register("pages", df)
    want = con.execute(SQL_HOST_STATS + " ORDER BY 1").df()
    con.close()
    for c in ("n_pages", "n_distinct_paths", "min_doc", "max_doc"):
        assert got[c].astype("int64").tolist() == \
            want[c].astype("int64").tolist(), c
    assert got["host"].tolist() == want["host"].tolist()


def _sorted_pdf(ds):
    from conftest import canon_pdf

    return canon_pdf(ds.to_pandas())


def test_token_family_matches_fresh_paths(ray_session):
    """The session-memoized token_family prefix must be invisible to
    results: every family-backed query equals its fresh (pages-derived)
    computation, and a second call serves the same materialized objects.
    Memo clears run in finally so a failure can't leak sf0.001 entries
    into later tests (r4 review)."""
    from orthority_ray.sources.pages import read_pages
    from orthority_ray.stages import tfidf as TF

    sf = "/root/testdata/sf0.001"
    TF._FAMILY_MEMO.clear()
    try:
        rows, reps, rep_tf = TF.token_family(sf)
        assert TF.token_family(sf)[2] is rep_tf  # memo hit, same objects

        pages = read_pages(sf, columns=["doc_id", "text"])
        cases = [
            (TF.tfidf_topk(None, rows=rows, rep_tf=rep_tf),
             TF.tfidf_topk(pages)),
            (TF.posting_stats(None, rep_tf=rep_tf),
             TF.posting_stats(pages)),
            (TF.token_cooccurrence(None, reps=reps),
             TF.token_cooccurrence(pages)),
            (TF.boolean_search(None, rows=rows, rep_tf=rep_tf),
             TF.boolean_search(pages)),
            (TF.phrase_search(None, rows=rows, reps=reps),
             TF.phrase_search(pages)),
        ]
        for fam, fresh in cases:
            a, b = _sorted_pdf(fam), _sorted_pdf(fresh)
            pd.testing.assert_frame_equal(a, b)
    finally:
        TF._FAMILY_MEMO.clear()


def test_token_stage_requires_pages_or_artifact(ray_session):
    """pages=None without the memoized artifact raises the loud TypeError,
    not an AttributeError deep inside map_batches (r4 review)."""
    from orthority_ray.stages import tfidf as TF

    for call in (lambda: TF.tfidf_topk(None),
                 lambda: TF.posting_stats(None),
                 lambda: TF.token_cooccurrence(None),
                 lambda: TF.boolean_search(None),
                 lambda: TF.phrase_search(None)):
        with pytest.raises(TypeError, match="pages is required"):
            call()


def test_neardup_candidates_matches_direct_chain(ray_session):
    """minhash_pairs served from the memoized neardup_candidates prefix
    equals the original direct minhash_candidate_pairs(read_pages(...))
    construction, and neardup_family reuses the same reps object."""
    from orthority_ray.sources.pages import read_pages
    from orthority_ray.stages import dedup as D

    sf = "/root/testdata/sf0.001"
    D._CANDIDATE_MEMO.clear()
    D._NEARDUP_MEMO.clear()
    try:
        reps, pairs = D.neardup_candidates(sf)
        direct = D.minhash_candidate_pairs(read_pages(sf))
        pd.testing.assert_frame_equal(_sorted_pdf(pairs),
                                      _sorted_pdf(direct))
        reps2, _ = D.neardup_family(sf)
        assert reps2 is reps  # family builds on the memoized prefix
    finally:
        D._CANDIDATE_MEMO.clear()
        D._NEARDUP_MEMO.clear()
