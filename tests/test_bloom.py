"""Bloom filter kernel + bloom_semijoin pruning behavior."""

from __future__ import annotations

import numpy as np
import pyarrow as pa
import ray.data

from orthority_ray.stages.bloom import (
    _params,
    _probe_words_bits,
    bloom_contains,
    build_bloom,
)


def _local_bloom(keys: np.ndarray, n: int, fpp: float = 0.01) -> dict:
    m, k = _params(n, fpp)
    words = np.zeros(m // 64, dtype=np.uint64)
    wi, bits = _probe_words_bits(keys.astype(np.int64), m, k)
    np.bitwise_or.at(words, wi.ravel(), bits.ravel())
    return {"words": words, "m": m, "k": k}


def test_no_false_negatives_and_bounded_fpp():
    rng = np.random.default_rng(3)
    members = rng.choice(10_000_000, size=20_000, replace=False).astype(np.int64)
    bloom = _local_bloom(members, members.size, fpp=0.01)
    assert bloom_contains(bloom, members).all()  # zero false negatives
    probe = rng.integers(10_000_000, 20_000_000, size=100_000).astype(np.int64)
    fpp = bloom_contains(bloom, probe).mean()
    assert fpp < 0.03  # ~1% nominal, generous margin


def test_distributed_build_matches_local(ray_session):
    keys = np.arange(0, 50_000, 7, dtype=np.int64)
    ds = ray.data.from_arrow(pa.table({"k": keys})).repartition(8)
    ref = build_bloom(ds, "k", keys.size)
    got = ray.get(ref)
    want = _local_bloom(keys, keys.size)
    assert got["m"] == want["m"] and got["k"] == want["k"]
    assert (got["words"] == want["words"]).all()  # OR-merge == one-shot build


def test_semijoin_prefilter_is_superset(ray_session, sf_unit):
    """The Bloom stage may only ADD rows (false positives), never drop one —
    the exact semi join after it is what the oracle checks end-to-end."""
    import duckdb

    from orthority_ray.pipelines.relational import _read
    from orthority_ray.stages.bloom import bloom_semijoin

    out = bloom_semijoin(sf_unit).to_pandas()
    con = duckdb.connect()
    for t in ("lineitem", "orders"):
        con.sql(f"CREATE VIEW {t} AS SELECT * FROM '{sf_unit}/{t}.parquet'")
    truth = con.sql(
        """SELECT l_returnflag, COUNT(*) AS n_items
           FROM lineitem WHERE l_orderkey IN
             (SELECT o_orderkey FROM orders WHERE o_orderpriority = '1-URGENT')
           GROUP BY l_returnflag"""
    ).df()
    merged = out.merge(truth, on="l_returnflag", suffixes=("", "_t"))
    assert len(merged) == len(truth)
    assert (merged["n_items"] == merged["n_items_t"]).all()

    # and the prefilter really prunes: survivors << lineitem rows
    urgent = con.sql(
        "SELECT COUNT(*) c FROM lineitem WHERE l_orderkey IN "
        "(SELECT o_orderkey FROM orders WHERE o_orderpriority='1-URGENT')"
    ).df()["c"][0]
    total = _read(sf_unit, "lineitem", ["l_orderkey"]).count()
    assert urgent < total * 0.5  # the pattern only pays off when selective
