"""Sharded dedup-index actors: build, probe, ingest-and-dedup semantics."""

from __future__ import annotations

import numpy as np
import pyarrow as pa
import ray.data

from orthority_ray.stages.dedup_index import (
    DedupIndex,
    build_index,
    query_index,
)


def _texts_ds(texts: list[str]) -> ray.data.Dataset:
    return ray.data.from_arrow(
        pa.table({"doc_id": pa.array(range(len(texts)), pa.int64()),
                  "text": pa.array(texts, pa.string())})).repartition(4)


def test_build_then_probe_exact_membership(ray_session):
    corpus = [f"doc number {i}" for i in range(200)]
    index = DedupIndex.create(4)
    n = build_index(_texts_ds(corpus), index)
    assert n == 200
    assert sum(index.sizes()) == 200  # all distinct, spread over shards

    stream = [f"doc number {i}" for i in range(100, 300)]  # half known
    out = query_index(_texts_ds(stream), index).to_pandas()
    got = out.sort_values("doc_id")["is_dup"].to_numpy()
    want = (np.arange(100, 300) < 200).astype(np.int64)
    assert (got == want).all()


def test_add_missing_admits_new_texts(ray_session):
    index = DedupIndex.create(4)
    build_index(_texts_ds(["a", "b"]), index)
    first = query_index(_texts_ds(["a", "x", "y"]), index,
                        add_missing=True).to_pandas()
    assert first.sort_values("doc_id")["is_dup"].tolist() == [1, 0, 0]
    # x and y were admitted by the first pass
    second = query_index(_texts_ds(["x", "y", "z"]), index).to_pandas()
    assert second.sort_values("doc_id")["is_dup"].tolist() == [1, 1, 0]


def test_duplicate_heavy_corpus_counts_distinct(ray_session):
    corpus = ["same text"] * 500 + ["other"] * 10
    index = DedupIndex.create(4)
    build_index(_texts_ds(corpus), index)
    assert sum(index.sizes()) == 2  # the index holds DISTINCT texts


def test_index_close_kills_actors(ray_session):
    import time

    import pytest as _pytest
    import ray as _ray

    from orthority_ray.stages.dedup_index import DedupIndex

    idx = DedupIndex.create(n_shards=2)
    assert idx.sizes() == [0, 0]
    shard = None if not idx.shards else idx.shards[0]
    idx.close()
    assert idx.shards == []
    time.sleep(0.2)
    with _pytest.raises(_ray.exceptions.RayActorError):
        _ray.get(shard.size.remote())


def test_probe_add_idempotent_under_retry(ray_session):
    """A re-executed ingest-and-dedup batch must label its rows identically
    (r3 review: the old contains-then-add flipped first occurrences to
    is_dup=1 on Ray task retry)."""
    import hashlib

    import ray as _ray

    from orthority_ray.stages.dedup_index import DedupIndex, _digests
    import pyarrow as pa

    idx = DedupIndex.create(n_shards=2)
    try:
        texts = pa.array(["aa", "bb", "aa", "cc"])
        d = _digests(texts)
        owner = hashlib.md5(b"".join(d)).digest()
        shard = idx.shards[0]
        first = _ray.get(shard.probe_add.remote(d, owner))
        # same batch re-executes (same owner): identical labels, not all-dup
        retry = _ray.get(shard.probe_add.remote(d, owner))
        assert retry == first
        # a DIFFERENT batch sees them as duplicates
        other = hashlib.md5(b"other").digest()
        assert _ray.get(shard.probe_add.remote(d, other)) == [True] * 4
    finally:
        idx.close()
