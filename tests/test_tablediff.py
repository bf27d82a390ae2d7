"""Checksum-pruned table diff: pruning really prunes, edge cases hold."""

from __future__ import annotations

import numpy as np
import pyarrow as pa
import ray.data

from orthority_ray.stages.tablediff import (
    N_BUCKETS,
    _summaries,
    table_diff_ds,
)


def _ds(keys, texts):
    return ray.data.from_arrow(pa.table({
        "doc_id": pa.array(np.asarray(keys, np.int64)),
        "text": pa.array(list(texts), pa.string())})).repartition(4)


def test_identical_sides_diff_empty_and_all_buckets_pruned(ray_session):
    keys = np.arange(500)
    texts = [f"text {i}" for i in keys]
    a, b = _ds(keys, texts), _ds(keys, texts)
    sa = _summaries(a, "doc_id", "text", N_BUCKETS)
    sb = _summaries(b, "doc_id", "text", N_BUCKETS)
    assert (sa == sb).all()  # every bucket proven equal -> zero exchange
    assert table_diff_ds(a, b, "doc_id", "text").count() == 0


def test_small_change_touches_few_buckets(ray_session):
    keys = np.arange(2000)
    texts = [f"text {i}" for i in keys]
    texts2 = list(texts)
    texts2[7] = "edited"          # changed
    keys2 = np.concatenate([keys, [99999]])  # added
    texts2.append("brand new")
    a = _ds(keys, texts)
    b = _ds(keys2, texts2)
    sa = _summaries(a, "doc_id", "text", N_BUCKETS)
    sb = _summaries(b, "doc_id", "text", N_BUCKETS)
    differing = int(((sa != sb).any(axis=1)).sum())
    assert differing <= 2  # 2 touched rows -> at most 2 of 256 buckets move
    out = table_diff_ds(a, b, "doc_id", "text").to_pandas()
    got = set(zip(out["doc_id"], out["status"]))
    assert got == {(7, "changed"), (99999, "added")}


def test_summary_is_partition_invariant(ray_session):
    keys = np.arange(1000)
    texts = [f"payload {i}" for i in keys]
    s1 = _summaries(_ds(keys, texts), "doc_id", "text", N_BUCKETS)
    s2 = _summaries(_ds(keys, texts).repartition(13), "doc_id", "text", N_BUCKETS)
    assert (s1 == s2).all()  # xor/count fold is order- and block-free
