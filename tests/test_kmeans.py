"""Distributed spherical k-means: determinism, fold invariance, objective."""

from __future__ import annotations

import numpy as np

from orthority_ray.stages.kmeans import (
    K_CLUSTERS,
    _normalize,
    assign_clusters,
    fold_partials,
    init_centroids,
    read_embeddings_blocks,
    train_kmeans,
)


def test_fold_partials_order_invariant():
    rng = np.random.default_rng(11)
    prev = _normalize(rng.normal(size=(4, 8)))
    rows = []
    for _ in range(40):
        c = int(rng.integers(0, 4))
        n = int(rng.integers(1, 50))
        rows.append({"cluster": c, "n": n,
                     "vecsum": rng.normal(size=8).tobytes()})
    a = fold_partials(list(rows), prev)
    rng.shuffle(rows)  # simulate arbitrary task completion order
    b = fold_partials(rows, prev)
    assert (a == b).all()  # bit-identical, not just close


def test_empty_cluster_keeps_previous_centroid():
    prev = _normalize(np.arange(12, dtype=np.float64).reshape(3, 4) + 1)
    rows = [{"cluster": 0, "n": 2,
             "vecsum": np.ones(4, np.float64).tobytes()}]
    out = fold_partials(rows, prev)
    assert (out[1] == prev[1]).all() and (out[2] == prev[2]).all()
    assert np.allclose(out[0], _normalize(np.ones((1, 4)) / 2)[0])


def test_training_improves_objective_and_is_deterministic(ray_session, sf_unit):
    ds = read_embeddings_blocks(sf_unit)
    init = _normalize(init_centroids(ds, K_CLUSTERS))
    cent = train_kmeans(ds, K_CLUSTERS)
    cent2 = train_kmeans(ds, K_CLUSTERS)
    assert (cent == cent2).all()  # rerun bit-identical

    import pyarrow.parquet as pq

    from orthority_ray.stages.ann import _emb_matrix

    ids, m = _emb_matrix(pq.read_table(f"{sf_unit}/embeddings.parquet",
                                       columns=["vec_id", "embedding"]))
    mn = _normalize(m)
    obj_init = (mn @ init.T).max(axis=1).mean()
    obj_final = (mn @ cent.T).max(axis=1).mean()
    assert obj_final > obj_init  # Lloyd rounds improved the objective

    out = assign_clusters(ds, cent).to_pandas()
    assert len(out) == len(ids)
    assert out["cluster"].nunique() == K_CLUSTERS
    # assignment pass agrees with the driver-side argmax on the same table
    want = np.argmax(mn @ cent.T, axis=1)
    got = out.set_index("vec_id").loc[ids, "cluster"].to_numpy()
    assert (got == want).all()
