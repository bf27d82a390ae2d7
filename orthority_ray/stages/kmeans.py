"""Distributed spherical k-means (Lloyd's) over an embedding column.

The full-data counterpart of ``ann.train_centroids`` (which trains on a
driver-side sample and documents "at 10^12 scale the sample itself would
be a Dataset aggregate" — this module is that aggregate).  Each Lloyd
round is ONE streaming pass:

* centroids (K x d, the only broadcast state) go out via ``ray.put``;
* every batch computes assignments with one matmul and emits a per-batch
  partial ``(cluster, n, packed float64 sum-vector)`` — K small rows, so
  the per-round exchange is blocks x K rows regardless of data size;
* the driver folds partials **in content-sorted order** (cluster, n,
  FNV of the packed bytes), so the float association — and therefore the
  new centroid table — is identical no matter which task finished first;
* ``batch_size=None`` pins batches to blocks and the input is materialized
  with a fixed block count, so partial boundaries don't depend on the
  worker count either: assignments are parallelism-invariant, asserted in
  tests/test_kmeans.py.

Init is deterministic data-derived seeding (the K vec_ids with the
smallest multiplicative hash, merged from per-block winners — the
stratified-sample pattern), not RNG draw order.  Empty clusters keep
their previous centroid.  Rounds stop early at a bit-identical fixed
point, else after ``iters``.

Lloyd's is inherently iterative (one pass per round); for crawl-scale
one-pass training use ``ann.train_centroids``'s sample mode, then THIS
module's single assignment pass (`assign_clusters`) to label the corpus.
"""

from __future__ import annotations

import numpy as np
import pandas as pd
import pyarrow as pa
import ray
import ray.data

from ..core.config import table_path

K_CLUSTERS = 10
ITERS = 12


def _normalize(m: np.ndarray) -> np.ndarray:
    n = np.sqrt((m * m).sum(axis=1, keepdims=True))
    return m / np.where(n == 0.0, 1.0, n)


def read_embeddings_blocks(sf_dir: str) -> ray.data.Dataset:
    """Embeddings materialized with a fixed block count (the single-file
    testdata parquet is otherwise ONE serial block; see sources/pages.py)."""
    from ..core.config import parquet_num_rows, read_blocks

    from ..core.config import count_materialized_read, should_materialize

    path = table_path(sf_dir, "embeddings")
    if not should_materialize(path):
        # many fragments: stream the native read — block boundaries follow
        # the files/row groups, which are DATA-derived and therefore stable
        # across worker counts (the fold-invariance requirement), and the
        # 12 Lloyd rounds re-execute a parallel read instead of pinning the
        # table in the object store
        return ray.data.read_parquet(path, columns=["vec_id", "embedding"])
    # block count is DATA-derived (rows / 1024, capped), never CPU-derived —
    # partial boundaries must not depend on the worker count (invariance),
    # and 12 Lloyd rounds over hundreds of near-empty blocks would be pure
    # dispatch overhead at test scale
    n_rows = parquet_num_rows(path)
    blocks = max(1, min(read_blocks(), (n_rows + 1023) // 1024))
    count_materialized_read()
    return ray.data.read_parquet(
        path, columns=["vec_id", "embedding"],
        override_num_blocks=blocks,
    ).materialize()


def _matrix(batch: pa.Table) -> tuple[np.ndarray, np.ndarray]:
    from .ann import _emb_matrix

    ids, m = _emb_matrix(batch)
    return ids, _normalize(m)


def init_centroids(ds: ray.data.Dataset, k: int = K_CLUSTERS) -> np.ndarray:
    """K deterministic seed vectors: smallest (vec_id * 2654435761 mod 2^32,
    vec_id) — per-block winners are a superset of the global winners."""

    def winners(b: pa.Table) -> pa.Table:
        from ..core.hashing import knuth32

        ids, m = _matrix(b)
        h = knuth32(ids)
        order = np.lexsort((ids, h))[:k]
        return pa.table({
            "vec_id": pa.array(ids[order]),
            "h": pa.array(h[order]),
            "vec": pa.array([m[i].tobytes() for i in order], pa.large_binary()),
        })

    rows = ds.map_batches(winners, batch_format="pyarrow",
                          batch_size=None).take_all()
    rows.sort(key=lambda r: (r["h"], r["vec_id"]))
    return np.stack([np.frombuffer(r["vec"], np.float64) for r in rows[:k]])


def _round_partials(ds: ray.data.Dataset, cent_ref) -> list[dict]:
    from ..sources.pages import cached_get

    def partial(b: pa.Table) -> pa.Table:
        cent = cached_get(cent_ref)
        _, m = _matrix(b)
        assign = np.argmax(m @ cent.T, axis=1)
        out = []
        for c in np.unique(assign):
            sel = m[assign == c]
            out.append((int(c), sel.shape[0], sel.sum(axis=0).tobytes()))
        return pa.table({
            "cluster": pa.array([o[0] for o in out], pa.int64()),
            "n": pa.array([o[1] for o in out], pa.int64()),
            "vecsum": pa.array([o[2] for o in out], pa.large_binary()),
        })

    return ds.map_batches(partial, batch_format="pyarrow",
                          batch_size=None).take_all()


def fold_partials(rows: list[dict], prev: np.ndarray) -> np.ndarray:
    """Content-sorted deterministic fold of per-batch (cluster, n, sum)
    partials into the next centroid table (empty clusters keep ``prev``)."""
    from ..core.texthash import fnv1a_bulk

    k, d = prev.shape
    hashes = fnv1a_bulk([r["vecsum"] for r in rows])
    order = sorted(range(len(rows)),
                   key=lambda i: (rows[i]["cluster"], rows[i]["n"], hashes[i]))
    sums = np.zeros((k, d), np.float64)
    counts = np.zeros(k, np.int64)
    for i in order:
        c = rows[i]["cluster"]
        sums[c] += np.frombuffer(rows[i]["vecsum"], np.float64)
        counts[c] += rows[i]["n"]
    out = prev.copy()
    nz = counts > 0
    out[nz] = _normalize(sums[nz] / counts[nz, None])
    return out


def train_kmeans(ds: ray.data.Dataset, k: int = K_CLUSTERS,
                 iters: int = ITERS) -> np.ndarray:
    cent = _normalize(init_centroids(ds, k))
    for _ in range(iters):
        nxt = fold_partials(_round_partials(ds, ray.put(cent)), cent)
        if np.array_equal(nxt, cent):
            break
        cent = nxt
    return cent


def assign_clusters(ds: ray.data.Dataset, cent: np.ndarray) -> ray.data.Dataset:
    """Final labeling pass: (vec_id, cluster) — per-row argmax against the
    broadcast centroid table, ties to the lowest cluster id."""
    from ..sources.pages import cached_get

    cent_ref = ray.put(cent)

    def label(b: pa.Table) -> pa.Table:
        c = cached_get(cent_ref)
        ids, m = _matrix(b)
        return pa.table({"vec_id": pa.array(ids),
                         "cluster": pa.array(np.argmax(m @ c.T, axis=1)
                                             .astype(np.int64))})

    return ds.map_batches(label, batch_format="pyarrow", batch_size=None)


def embedding_kmeans(sf_dir: str, k: int = K_CLUSTERS) -> ray.data.Dataset:
    """Rows-only query: distributed Lloyd's, then the assignment pass."""
    ds = read_embeddings_blocks(sf_dir)
    return assign_clusters(ds, train_kmeans(ds, k))
