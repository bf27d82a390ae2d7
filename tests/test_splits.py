"""Leakage-safe split semantics (the oracle sweep pins the DuckDB twin;
these pin the group-disjointness invariant and the hash contract)."""

from __future__ import annotations

import numpy as np

from orthority_ray.core.hashing import H1_MULT, M32
from orthority_ray.stages.splits import (N_HOSTS, TRAIN_PCT, VAL_PCT,
                                         split_of_host)


def test_split_of_host_matches_scalar_contract():
    hosts = np.arange(N_HOSTS, dtype=np.int64)
    got = split_of_host(hosts)
    for h in (0, 1, 7, 999, 123):
        bucket = (h * H1_MULT) % M32 % 100
        want = 0 if bucket < TRAIN_PCT else (1 if bucket < VAL_PCT else 2)
        assert got[h] == want


def test_split_proportions_and_coverage():
    got = split_of_host(np.arange(N_HOSTS, dtype=np.int64))
    counts = np.bincount(got, minlength=3)
    # multiplicative-hash buckets land near 80/10/10 over 1000 hosts
    assert 700 <= counts[0] <= 900
    assert 50 <= counts[1] <= 160
    assert 50 <= counts[2] <= 160
    assert counts.sum() == N_HOSTS


def test_split_leakage_counts_eval_pages_with_train_texts(ray_session,
                                                          tmp_path):
    """Hand-built corpus: texts shared across split boundaries count as
    leaked; eval-only texts do not."""
    import pyarrow as pa
    import pyarrow.parquet as pq

    from orthority_ray.stages.splits import split_leakage, split_of_host

    # pick one host per split deterministically
    hosts = np.arange(1000, dtype=np.int64)
    s = split_of_host(hosts)
    h_train = int(hosts[s == 0][0])
    h_val = int(hosts[s == 1][0])
    # pick a test host whose text slot (h % 500) collides with neither,
    # so the test doc's text stays unique
    used = {h_train % 500, h_val % 500}
    h_test = int(next(h for h in hosts[s == 2] if int(h) % 500 not in used))

    # docs: text index = doc_id % 500; give each chosen host one doc.
    # doc_id = h (h < 1000 -> host h, text h % 500)
    def li_row(doc_id):
        return (doc_id // 8, doc_id % 8)

    # train doc shares text with the val doc (doc ids differing by 500),
    # test doc gets a unique text
    d_train = h_train
    d_val = h_val
    d_test = h_test
    texts = ["t%d" % i for i in range(500)]
    texts[d_val % 500] = "shared"
    texts[d_train % 500] = "shared"  # may be the same slot; force-share:
    docs = pa.table({
        "doc_id": pa.array(list(range(500)), pa.int64()),
        "text": pa.array(texts, pa.string()),
        "lang": pa.array(["en"] * 500, pa.string()),
        "source": pa.array(["t"] * 500, pa.string()),
        "n_chars": pa.array([1] * 500, pa.int64()),
    })
    oks, lns = zip(*(li_row(d) for d in (d_train, d_val, d_test)))
    li = pa.table({"l_orderkey": pa.array(list(oks), pa.int64()),
                   "l_linenumber": pa.array(list(lns), pa.int64())})
    pq.write_table(docs, tmp_path / "documents.parquet")
    pq.write_table(li, tmp_path / "lineitem.parquet")

    out = split_leakage(str(tmp_path)).set_index("split")
    assert int(out.loc["val", "n_pages"]) == 1
    assert int(out.loc["val", "n_leaked"]) == 1  # shares text with train
    assert int(out.loc["test", "n_pages"]) == 1
    assert int(out.loc["test", "n_leaked"]) == 0  # unique text


def test_split_is_host_deterministic_no_leakage():
    # every doc_id of one host maps to the SAME split — the leakage guard
    doc_ids = np.arange(50_000, dtype=np.int64)
    splits = split_of_host(doc_ids % N_HOSTS)
    by_host = {}
    for d, s in zip(doc_ids % N_HOSTS, splits):
        assert by_host.setdefault(int(d), int(s)) == int(s)


def test_neardup_leakage_broadcast_equals_distributed(ray_session, sf_unit,
                                                      monkeypatch):
    """The endpoint-broadcast fast path (one streaming page pass, r4 perf
    rework) and the pair-dense distributed fallback (bucketed joins) must
    produce IDENTICAL pair-kind counts; the sf0.001 corpus exercises real
    near-dup pairs."""
    from orthority_ray.stages import splits as SPL

    fast = SPL.split_leakage_neardup(sf_unit)
    monkeypatch.setattr(SPL, "_ENDPOINT_BROADCAST_LIMIT", 0)
    slow = SPL.split_leakage_neardup(sf_unit)
    assert list(fast["pair_kind"]) == list(slow["pair_kind"])
    assert (fast["n_pairs"].to_numpy() == slow["n_pairs"].to_numpy()).all()
    assert int(fast["n_pairs"].sum()) > 0  # the corpus must exercise pairs
