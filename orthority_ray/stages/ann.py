"""Similarity search over the ``embeddings`` table (``list<float>`` column).

- :func:`ann_bruteforce` — exact cosine top-k: the query matrix (small) is
  broadcast via ``ray.put``; each batch computes a float64 similarity matrix
  (vectorized matmul) and emits per-batch partial top-k per query; a final
  ``groupby(query_id)`` merge — the same partial-top-k skeleton as
  stages/knn.py, so no all-to-all over the vectors.
- :func:`ann_lsh` — the scale path: random-hyperplane LSH (deterministic
  seeded planes) buckets vectors; queries only score vectors in their bucket
  (and its 1-bit-flip neighbors) — approximate, recall measured in tests.
- :func:`embedding_neardup` — near-duplicate pairs with cosine >= threshold
  via the same bucketing.

Similarities are computed in float64 and keyed as ``round(sim * 1e9)`` ints
(`sim_key`) so the DuckDB oracle (list_cosine_similarity on DOUBLE lists)
compares stably; ties broken by vec_id.
"""

from __future__ import annotations

import numpy as np
import pandas as pd
import pyarrow as pa
import ray
import ray.data

from ..core.config import table_path


K = 10
QUERY_MOD = 50  # vec_id % 50 == 0 -> 1/50 of vectors are queries
SIM_SCALE = 1_000_000_000
N_PLANES = 4  # LSH hyperplanes -> 16 buckets + 1-bit probes; tune up as the
# vector count grows (bucket size ~ N / 2^planes) — recall on weakly-
# clustered synthetic vectors drops fast with more planes


def read_embeddings(sf_dir: str) -> ray.data.Dataset:
    # session-cached fan-out read (single-file testdata parquet is ONE
    # serial task bare; _read materializes-or-streams by fragment count)
    from ..pipelines.relational import _read

    return _read(sf_dir, "embeddings", ["vec_id", "embedding"])


def _emb_matrix(batch: pa.Table) -> tuple[np.ndarray, np.ndarray]:
    ids = batch["vec_id"].to_numpy(zero_copy_only=False)
    col = batch["embedding"].combine_chunks()
    flat = col.values.to_numpy(zero_copy_only=False).astype(np.float64)
    dim = len(flat) // max(1, len(ids))
    return ids, flat.reshape(len(ids), dim)


def load_queries(sf_dir: str) -> tuple[np.ndarray, np.ndarray]:
    """(qids, Q x d ~unit matrix) — the broadcast side (vec_id % QUERY_MOD
    == 0).  Selected with a DISTRIBUTED per-batch filter; only the ~N/50
    query rows ever reach the driver (a full-table driver read here was a
    10^12-scale landmine the zero-materialization gate could not see).
    SCALE CONTRACT: the query side must stay broadcast-sized — QUERY_MOD=50
    (2% of the corpus) is a test-scale density; a 10^12-row corpus needs a
    fixed query set or a much larger modulus, not 2% of the table.  Rows
    are only ~unit (float32 storage error ~1e-7): scorers whose key is
    round(cosine * SCALE) must renormalize, and all of them do."""

    def sel(b: pa.Table) -> pa.Table:
        ids = b["vec_id"].to_numpy(zero_copy_only=False)
        return b.filter(pa.array(ids % QUERY_MOD == 0))

    parts = (
        read_embeddings(sf_dir)
        .map_batches(sel, batch_format="pyarrow", batch_size=None)
        .to_arrow_refs()
    )
    t = pa.concat_tables([x for x in ray.get(parts) if x.num_rows],
                         promote_options="default")
    ids, m = _emb_matrix(t)
    order = np.argsort(ids, kind="stable")  # file order, deterministic
    return ids[order], m[order]


def _cosine(m: np.ndarray, q: np.ndarray) -> np.ndarray:
    """(B, Q) cosine similarity, float64, explicit normalisation."""
    mn = m / np.sqrt((m * m).sum(axis=1, keepdims=True))
    qn = q / np.sqrt((q * q).sum(axis=1, keepdims=True))
    return mn @ qn.T


class _PartialTopSim:
    # queries per similarity slab: bounds per-batch resident memory at
    # B x Q_CHUNK x 8 (~32 MB at B=4096) instead of B x Q — the kNN
    # 100x-query probe (BASELINE.md) showed the full (B, Q) matrix is the
    # query-side scale hazard (1.2 GB/batch at 39k queries).  Chunk-local
    # top-k per query column is independent per column, so semantics are
    # unchanged; sim_key's integer quantization absorbs the <= 1-ulp BLAS
    # blocking differences exactly as it does for the DuckDB oracle's own
    # summation order.
    Q_CHUNK = 2048

    def __init__(self, queries_ref, k: int = K):
        self.qids, self.q = ray.get(queries_ref)
        self.k = k
        # normalized once per actor, not per batch (hot-path; r4 review)
        self.qn = (self.q / np.sqrt((self.q * self.q)
                                    .sum(axis=1, keepdims=True))
                   if len(self.qids) else self.q)

    def __call__(self, batch: pa.Table) -> pa.Table:
        ids, m = _emb_matrix(batch)
        if len(ids) == 0 or len(self.qids) == 0:
            return pa.table({"query_id": pa.array([], pa.int64()),
                             "neighbor_id": pa.array([], pa.int64()),
                             "sim_key": pa.array([], pa.int64())})
        mn = m / np.sqrt((m * m).sum(axis=1, keepdims=True))
        qn = self.qn
        parts = []
        for c0 in range(0, len(self.qids), self.Q_CHUNK):
            sims = mn @ qn[c0:c0 + self.Q_CHUNK].T  # (B, Qc)
            sim_key = np.floor(sims * SIM_SCALE + 0.5).astype(np.int64)
            B, Q = sim_key.shape
            k = min(self.k, B)
            # fully vectorized: emit EVERY candidate >= the per-query kth
            # best (boundary ties included, a few extra rows) and let the
            # final merge truncate under the (sim desc, vec_id) total order
            # — exact, no per-query Python loop (knn._PartialTopK pattern)
            part = np.argpartition(-sim_key, k - 1, axis=0)[:k]  # (k, Qc)
            kth = sim_key[part, np.arange(Q)[None, :]].min(axis=0)  # (Qc,)
            rows, cols = np.nonzero(sim_key >= kth[None, :])
            parts.append(pa.table(
                {
                    "query_id": pa.array(self.qids[c0 + cols]),
                    "neighbor_id": pa.array(ids[rows]),
                    "sim_key": pa.array(sim_key[rows, cols]),
                }
            ))
        return pa.concat_tables(parts)

    def _topk_from_candidates(self, ids, cand_q, cand_r, cand_k) -> pa.Table:
        """Shared tail of the pruned scorers (IVF / LSH): one global sort
        of the (query, key, id) candidate triples + segment rank picks each
        query's per-batch top-k — no per-query Python."""
        q_arr = np.concatenate(cand_q)
        r_arr = np.concatenate(cand_r)
        k_arr = np.concatenate(cand_k)
        n_arr = ids[r_arr]
        order = np.lexsort((n_arr, -k_arr, q_arr))  # (query, -key, id)
        q_s, k_s, n_s = q_arr[order], k_arr[order], n_arr[order]
        starts = np.concatenate([[0], np.flatnonzero(q_s[1:] != q_s[:-1]) + 1])
        sizes = np.diff(np.concatenate([starts, [len(q_s)]]))
        rank = np.arange(len(q_s)) - np.repeat(starts, sizes)
        keep = rank < self.k
        return pa.table(
            {
                "query_id": pa.array(self.qids[q_s[keep]]),
                "neighbor_id": pa.array(n_s[keep]),
                "sim_key": pa.array(k_s[keep]),
            }
        )


def _merge(g: pd.DataFrame, k: int = K) -> pd.DataFrame:
    """All queries in the bucket merged at once (see knn._merge_topk)."""
    g = g.sort_values(["query_id", "sim_key", "neighbor_id"],
                      ascending=[True, False, True], kind="mergesort")
    qid = g["query_id"].to_numpy()
    starts = np.concatenate([[0], np.flatnonzero(qid[1:] != qid[:-1]) + 1])
    sizes = np.diff(np.concatenate([starts, [len(g)]]))
    rank = np.arange(len(g)) - np.repeat(starts, sizes)
    keep = rank < k
    out = g.loc[keep, ["query_id", "neighbor_id"]].reset_index(drop=True)
    out["rank"] = rank[keep] + 1
    out["sim_key"] = g["sim_key"].to_numpy()[keep]
    return out[["query_id", "neighbor_id", "rank", "sim_key"]]


def ann_bruteforce(sf_dir: str, k: int = K, *, concurrency: int | None = None) -> ray.data.Dataset:
    queries_ref = ray.put(load_queries(sf_dir))
    ds = read_embeddings(sf_dir)
    from ..core.config import cached_stage

    partials = ds.map_batches(
        cached_stage(_PartialTopSim, f"ann:brute:{queries_ref.hex()}:{k}", queries_ref, k),
        batch_format="pyarrow", batch_size=4096, concurrency=concurrency,
    )
    from .grouping import bucketed_group_apply

    return bucketed_group_apply(partials, ["query_id"], lambda g: _merge(g, k))


SQL_ANN = f"""
SELECT query_id, neighbor_id, rank, sim_key FROM (
  SELECT q.vec_id AS query_id, e.vec_id AS neighbor_id,
         CAST(floor(list_cosine_similarity(CAST(e.embedding AS DOUBLE[]),
              CAST(q.embedding AS DOUBLE[])) * {SIM_SCALE} + 0.5) AS BIGINT) AS sim_key,
         row_number() OVER (
           PARTITION BY q.vec_id
           ORDER BY CAST(floor(list_cosine_similarity(CAST(e.embedding AS DOUBLE[]),
                    CAST(q.embedding AS DOUBLE[])) * {SIM_SCALE} + 0.5) AS BIGINT) DESC,
                    e.vec_id ASC) AS rank
  FROM embeddings e
  CROSS JOIN (SELECT vec_id, embedding FROM embeddings WHERE vec_id % {QUERY_MOD} = 0) q
) WHERE rank <= {K}
""".strip()


# --- IVF (inverted-file) ANN -------------------------------------------------

N_LIST = 32  # coarse centroids; bucket size ~ N / nlist
N_PROBE = 6  # centroid lists each query scans


def train_centroids(sf_dir: str, nlist: int = N_LIST, iters: int = 5,
                    sample_mod: int = 7) -> np.ndarray:
    """Deterministic coarse quantizer: k-means on the ``vec_id % sample_mod
    == 0`` sample (data-derived, no RNG draw order dependence), seeded
    Philox init, fixed Lloyd iterations.  The sample is small (N/mod) and
    trains driver-side; at 10^12 scale the sample itself would be a Dataset
    aggregate, but the centroid table stays nlist x dim either way."""
    import pyarrow.parquet as pq

    t = pq.read_table(table_path(sf_dir, "embeddings"), columns=["vec_id", "embedding"])
    ids, m = _emb_matrix(t)
    s = m[ids % sample_mod == 0]
    sn = s / np.sqrt((s * s).sum(axis=1, keepdims=True))
    rng = np.random.Generator(np.random.Philox(key=7))
    cent = sn[rng.choice(sn.shape[0], size=min(nlist, sn.shape[0]), replace=False)]
    for _ in range(iters):
        sims = sn @ cent.T
        assign = np.argmax(sims, axis=1)
        for c in range(cent.shape[0]):
            mask = assign == c
            if mask.any():
                v = sn[mask].mean(axis=0)
                cent[c] = v / np.sqrt((v * v).sum())
    return cent


class _IvfPartial(_PartialTopSim):
    """Partial top-k scoring only vectors whose nearest centroid is among
    the query's ``nprobe`` closest lists — the IVF probe, per batch."""

    def __init__(self, queries_ref, cent_ref, k: int = K, nprobe: int = N_PROBE):
        super().__init__(queries_ref, k)
        self.cent = ray.get(cent_ref)  # (nlist, d), unit rows
        qn = self.q / np.sqrt((self.q * self.q).sum(axis=1, keepdims=True))
        order = np.argsort(-(qn @ self.cent.T), axis=1)
        self.q_lists = order[:, :nprobe]  # (Q, nprobe)

    def __call__(self, batch: pa.Table) -> pa.Table:
        """Loop over the nlist CENTROIDS (bounded, 32), not the queries
        (~N/50): each centroid's rows are scored once against exactly the
        queries probing that list (same pruned compute and candidate sets
        as the per-query formulation), then one global sort + segment rank
        picks each query's per-batch top-k."""
        ids, m = _emb_matrix(batch)
        empty = pa.table({"query_id": pa.array([], pa.int64()),
                          "neighbor_id": pa.array([], pa.int64()),
                          "sim_key": pa.array([], pa.int64())})
        if len(ids) == 0 or len(self.qids) == 0:
            return empty
        mn = m / np.sqrt((m * m).sum(axis=1, keepdims=True))
        vlist = np.argmax(mn @ self.cent.T, axis=1)  # (B,)
        Q, nprobe = self.q_lists.shape
        probe_q = np.repeat(np.arange(Q), nprobe)  # query idx per (q, probe)
        probe_c = self.q_lists.ravel()
        cand_q, cand_r, cand_k = [], [], []
        for c in range(self.cent.shape[0]):
            rows = np.flatnonzero(vlist == c)
            qs = probe_q[probe_c == c]
            if rows.size == 0 or qs.size == 0:
                continue
            sims = _cosine(m[rows], self.q[qs])  # (rows, qs)
            key = np.floor(sims * SIM_SCALE + 0.5).astype(np.int64)
            cand_q.append(np.tile(qs, rows.size))
            cand_r.append(np.repeat(rows, qs.size))
            cand_k.append(key.ravel())
        if not cand_q:
            return empty
        return self._topk_from_candidates(ids, cand_q, cand_r, cand_k)


def ann_ivf(sf_dir: str, k: int = K, nlist: int = N_LIST, nprobe: int = N_PROBE,
            *, concurrency: int | None = None) -> ray.data.Dataset:
    """IVF ANN: train coarse centroids once, broadcast them, probe the
    ``nprobe`` nearest inverted lists per query inside each batch — the
    second scale path next to LSH (brief: "an IVF or LSH-bucketed variant");
    recall measured vs the exact brute force in tests."""
    from ..core.config import cached_stage

    queries_ref = ray.put(load_queries(sf_dir))
    cent_ref = ray.put(train_centroids(sf_dir, nlist))
    ds = read_embeddings(sf_dir)
    partials = ds.map_batches(
        cached_stage(_IvfPartial, f"ann:ivf:{queries_ref.hex()}:{k}:{nprobe}",
                     queries_ref, cent_ref, k, nprobe),
        batch_format="pyarrow", batch_size=4096, concurrency=concurrency,
    )
    from .grouping import bucketed_group_apply

    return bucketed_group_apply(partials, ["query_id"], lambda g: _merge(g, k))


# --- LSH bucketing (the 10^12-scale path) -----------------------------------


def _planes(dim: int) -> np.ndarray:
    """Deterministic pseudo-random hyperplanes (seeded Philox)."""
    rng = np.random.Generator(np.random.Philox(key=42))
    return rng.standard_normal((N_PLANES, dim))


def _bucket_of(m: np.ndarray, planes: np.ndarray) -> np.ndarray:
    bits = (m @ planes.T) > 0
    return (bits * (1 << np.arange(N_PLANES))).sum(axis=1).astype(np.int64)


class _LshPartial(_PartialTopSim):
    """Partial top-k scoring only same-bucket (+1-bit-flip) vectors.

    Loops over the <= 2^N_PLANES BUCKETS (bounded, 16), not the queries
    (~N/QUERY_MOD, which grows with the corpus): each bucket's rows are
    scored once against exactly the queries probing it — the same pruned
    candidate set as the per-query formulation (r3 review: the old
    per-query loop paid O(Q) interpreter iterations x an np.isin over the
    batch per query), then the shared global-sort tail picks each query's
    per-batch top-k."""

    def __init__(self, queries_ref, k: int = K):
        super().__init__(queries_ref, k)
        self.planes = _planes(self.q.shape[1])
        qb = _bucket_of(self.q, self.planes)
        probes = np.concatenate([qb[:, None],
                                 qb[:, None] ^ (1 << np.arange(N_PLANES))[None, :]],
                                axis=1)  # (Q, N_PLANES + 1)
        Q = qb.shape[0]
        # bucket -> sorted array of probing query indices
        self.bucket_probes: dict[int, np.ndarray] = {}
        flat_b = probes.ravel()
        flat_q = np.repeat(np.arange(Q), N_PLANES + 1)
        order = np.argsort(flat_b, kind="stable")
        fb, fq = flat_b[order], flat_q[order]
        starts = np.flatnonzero(np.concatenate([[True], fb[1:] != fb[:-1]]))
        ends = np.concatenate([starts[1:], [fb.shape[0]]])
        for s, e in zip(starts, ends):
            self.bucket_probes[int(fb[s])] = np.unique(fq[s:e])

    def __call__(self, batch: pa.Table) -> pa.Table:
        ids, m = _emb_matrix(batch)
        empty = pa.table({"query_id": pa.array([], pa.int64()),
                          "neighbor_id": pa.array([], pa.int64()),
                          "sim_key": pa.array([], pa.int64())})
        if len(ids) == 0 or len(self.qids) == 0:
            return empty
        vb = _bucket_of(m, self.planes)
        order = np.argsort(vb, kind="stable")
        vb_s = vb[order]
        starts = np.flatnonzero(np.concatenate([[True], vb_s[1:] != vb_s[:-1]]))
        ends = np.concatenate([starts[1:], [vb_s.shape[0]]])
        cand_q, cand_r, cand_k = [], [], []
        for s, e in zip(starts, ends):
            qs = self.bucket_probes.get(int(vb_s[s]))
            if qs is None:
                continue
            rows = order[s:e]
            sims = _cosine(m[rows], self.q[qs])  # (rows, qs)
            key = np.floor(sims * SIM_SCALE + 0.5).astype(np.int64)
            cand_q.append(np.tile(qs, rows.size))
            cand_r.append(np.repeat(rows, qs.size))
            cand_k.append(key.ravel())
        if not cand_q:
            return empty
        return self._topk_from_candidates(ids, cand_q, cand_r, cand_k)


def ann_lsh(sf_dir: str, k: int = K, *, concurrency: int | None = None) -> ray.data.Dataset:
    queries_ref = ray.put(load_queries(sf_dir))
    ds = read_embeddings(sf_dir)
    from ..core.config import cached_stage

    partials = ds.map_batches(
        cached_stage(_LshPartial, f"ann:lsh:{queries_ref.hex()}:{k}", queries_ref, k),
        batch_format="pyarrow", batch_size=4096, concurrency=concurrency,
    )
    from .grouping import bucketed_group_apply

    return bucketed_group_apply(partials, ["query_id"], lambda g: _merge(g, k))


def embedding_neardup(sf_dir: str, threshold: float = 0.95) -> ray.data.Dataset:
    """(vec_a, vec_b, sim_key) pairs with cosine >= threshold, a < b.

    Exact at test scale via the broadcast of the full (small) matrix; the
    LSH-bucketed variant takes over when the vector table outgrows the
    object store (documented scale path).
    """
    import pyarrow.parquet as pq

    t = pq.read_table(table_path(sf_dir, "embeddings"), columns=["vec_id", "embedding"])
    all_ref = ray.put(_emb_matrix(t))
    thresh_key = int(np.floor(threshold * SIM_SCALE + 0.5))

    class Pairs:
        def __init__(self):
            self.ids, self.m = ray.get(all_ref)

        def __call__(self, batch: pa.Table) -> pa.Table:
            ids, m = _emb_matrix(batch)
            sims = _cosine(m, self.m)
            key = np.floor(sims * SIM_SCALE + 0.5).astype(np.int64)
            bi, oj = np.nonzero(key >= thresh_key)
            a, b = ids[bi], self.ids[oj]
            keep = a < b
            return pa.table(
                {
                    "vec_a": pa.array(a[keep]),
                    "vec_b": pa.array(b[keep]),
                    "sim_key": pa.array(key[bi[keep], oj[keep]]),
                }
            )

    from ..core.config import cached_stage

    return read_embeddings(sf_dir).map_batches(
        cached_stage(Pairs, f"ann:neardup:{all_ref.hex()}:{thresh_key}"),
        batch_format="pyarrow", batch_size=4096,
    )


def embedding_neardup_blockpair(sf_dir: str, threshold: float = 0.95) -> ray.data.Dataset:
    """Exact all-pairs cosine >= threshold with NO full-matrix broadcast:
    the block-cartesian pattern.  The Dataset API cannot express a blockwise
    self-cross-product, so this drops to raw Ray tasks (the brief's
    documented last resort): the vector table is read once into object-store
    blocks and each of the B*(B+1)/2 block PAIRS is one task holding exactly
    two blocks in memory — per-worker memory is O(block), not O(N), while
    compute stays the same inherent O(N^2) as any exact all-pairs scan.
    Output identical to :func:`embedding_neardup` (same oracle).  Pair
    dedup: every unordered pair appears in exactly ONE block product, so
    off-diagonal tasks emit (min, max) regardless of which side holds the
    smaller id (``a < b`` there would silently drop pairs whenever blocks
    are not globally id-sorted); the diagonal task filters ``a < b`` since
    its square matrix contains both orientations.
    """
    thresh_key = int(np.floor(threshold * SIM_SCALE + 0.5))
    # split the single-file read: B blocks -> B(B+1)/2 tasks; one unsplit
    # block would serialize the whole N^2 scan into a single task
    refs = ray.data.read_parquet(
        table_path(sf_dir, "embeddings"), columns=["vec_id", "embedding"],
        override_num_blocks=16,
    ).to_arrow_refs()

    @ray.remote
    def pair_task(ta: pa.Table, tb: pa.Table, diagonal: bool) -> pa.Table:
        ids_a, ma = _emb_matrix(ta)
        ids_b, mb = _emb_matrix(tb)
        if len(ids_a) == 0 or len(ids_b) == 0:
            return pa.table({"vec_a": pa.array([], pa.int64()),
                             "vec_b": pa.array([], pa.int64()),
                             "sim_key": pa.array([], pa.int64())})
        key = np.floor(_cosine(ma, mb) * SIM_SCALE + 0.5).astype(np.int64)
        ai, bj = np.nonzero(key >= thresh_key)
        a, b = ids_a[ai], ids_b[bj]
        if diagonal:
            keep = a < b
            lo, hi = a[keep], b[keep]
        else:
            keep = a != b
            lo = np.minimum(a[keep], b[keep])
            hi = np.maximum(a[keep], b[keep])
        return pa.table(
            {
                "vec_a": pa.array(lo),
                "vec_b": pa.array(hi),
                "sim_key": pa.array(key[ai[keep], bj[keep]]),
            }
        )

    out = [
        pair_task.remote(refs[i], refs[j], i == j)
        for i in range(len(refs))
        for j in range(i, len(refs))
    ]
    return ray.data.from_arrow_refs(out)


def embedding_neardup_lsh(sf_dir: str, threshold: float = 0.95,
                          n_buckets_cap: int = 4096) -> ray.data.Dataset:
    """(vec_a, vec_b, sim_key) near-dup pairs via LSH bucketing — the
    10^12-vector scale path promised by :func:`embedding_neardup`:

    1. every vector is EMITTED into its hyperplane-signature bucket plus the
       ``N_PLANES`` 1-bit-flip buckets (multi-probe on the emit side covers
       any pair within Hamming distance 2 of each other);
    2. one ``groupby(bucket)`` shuffle co-locates candidates (payload
       travels (1 + N_PLANES)x — the standard LSH space/recall trade);
    3. exact pairwise cosine WITHIN each bucket (vectorized matmul), so
       precision is 1.0 and only recall is approximate;
    4. cross-bucket duplicate pairs collapse with a final pair groupby.

    No full-matrix broadcast anywhere; per-bucket memory is bounded by
    bucket occupancy (raise N_PLANES as the table grows).
    """
    thresh_key = int(np.floor(threshold * SIM_SCALE + 0.5))

    def explode(batch: pa.Table) -> pa.Table:
        ids, m = _emb_matrix(batch)
        if len(ids) == 0:
            return pa.table({"bucket": pa.array([], pa.int64()),
                             "vec_id": pa.array([], pa.int64()),
                             "embedding": batch["embedding"].slice(0, 0)})
        planes = _planes(m.shape[1])
        b = _bucket_of(m, planes)
        flips = b[:, None] ^ (1 << np.arange(N_PLANES))[None, :]
        buckets = np.concatenate([b[:, None], flips], axis=1).ravel()  # (n*(P+1),)
        reps = np.repeat(np.arange(len(ids)), N_PLANES + 1)
        emb = batch["embedding"].combine_chunks().take(pa.array(reps))
        return pa.table(
            {
                "bucket": pa.array(buckets % n_buckets_cap),
                "vec_id": pa.array(ids[reps]),
                "embedding": emb,
            }
        )

    def pairs_in_bucket(g: pd.DataFrame) -> pd.DataFrame:
        ids = g["vec_id"].to_numpy()
        # a vector can reach the same bucket through several probes
        ids, first = np.unique(ids, return_index=True)
        if ids.shape[0] < 2:
            return pd.DataFrame({"vec_a": [], "vec_b": [], "sim_key": []}).astype(np.int64)
        m = np.stack(g["embedding"].to_numpy()[first]).astype(np.float64)
        sims = _cosine(m, m)
        key = np.floor(sims * SIM_SCALE + 0.5).astype(np.int64)
        ai, bi = np.nonzero(key >= thresh_key)
        keep = ids[ai] < ids[bi]
        return pd.DataFrame(
            {"vec_a": ids[ai[keep]], "vec_b": ids[bi[keep]], "sim_key": key[ai[keep], bi[keep]]}
        )

    cand = (
        read_embeddings(sf_dir)
        .map_batches(explode, batch_format="pyarrow", batch_size=4096)
        .groupby("bucket")
        .map_groups(pairs_in_bucket, batch_format="pandas")
    )
    # the same pair can surface from several buckets -> keep one (sim_key is
    # identical wherever the pair surfaces, so any representative works)
    from .grouping import distinct_rows

    return distinct_rows(cand, ["vec_a", "vec_b"])


def sql_embedding_neardup(threshold: float = 0.95) -> str:
    thresh_key = int(np.floor(threshold * SIM_SCALE + 0.5))
    return f"""
SELECT a.vec_id AS vec_a, b.vec_id AS vec_b,
       CAST(floor(list_cosine_similarity(CAST(a.embedding AS DOUBLE[]),
            CAST(b.embedding AS DOUBLE[])) * {SIM_SCALE} + 0.5) AS BIGINT) AS sim_key
FROM embeddings a JOIN embeddings b ON a.vec_id < b.vec_id
WHERE CAST(floor(list_cosine_similarity(CAST(a.embedding AS DOUBLE[]),
      CAST(b.embedding AS DOUBLE[])) * {SIM_SCALE} + 0.5) AS BIGINT) >= {thresh_key}
""".strip()


# --- int8-quantized ANN (the memory-reduction scale path) --------------------


def _dim_scales(ds: ray.data.Dataset) -> np.ndarray:
    """Max-|x| of the NORMALIZED corpus per dimension — the distributed
    calibration aggregate.  Per-block partial max vectors fold on the
    driver; max is exact and order-free, so the result is
    parallelism-invariant by construction.  NOTE: consumers quantizing
    BOTH sides must collapse this to its scalar max — a per-dim scale is
    a diagonal transform that would turn the dot product into a weighted
    inner product and corrupt the cosine ranking."""

    def partial(b: pa.Table) -> pa.Table:
        _, m = _emb_matrix(b)
        if not m.shape[0]:
            # an empty block's dim degenerates to 0 (_emb_matrix derives it
            # from the data), and a (0,) row would break the driver-side
            # np.stack — emit no partial row at all (r3 review)
            return pa.table({"mx": pa.array([], pa.large_binary())})
        mn = m / np.sqrt((m * m).sum(axis=1, keepdims=True))
        mx = np.abs(mn).max(axis=0)
        return pa.table({"mx": pa.array([mx.tobytes()], pa.large_binary())})

    rows = ds.map_batches(partial, batch_format="pyarrow",
                          batch_size=4096).take_all()
    if not rows:
        raise ValueError("ann_int8 calibration over an empty corpus")
    mats = np.stack([np.frombuffer(r["mx"], np.float64) for r in rows])
    out = mats.max(axis=0)
    return np.where(out == 0.0, 1.0, out)


def _quantize(m: np.ndarray, scales: np.ndarray, bits: int = 8) -> np.ndarray:
    """Symmetric per-dim quantization of the normalized vectors.  8 bits
    (int8, 8x smaller than float64) is the standard memory path; 16 bits
    trades half the saving for ~256x finer resolution when the corpus has
    dense similarity ties (random vectors are the worst case)."""
    lim = 127.0 if bits == 8 else 32767.0
    mn = m / np.sqrt((m * m).sum(axis=1, keepdims=True))
    # SCALAR scale (see _dim_scales note): preserves directions exactly
    q = np.clip(np.round(mn / float(np.max(scales)) * lim), -lim, lim)
    return q.astype(np.int8 if bits == 8 else np.int16)


class _PartialTopSimInt8(_PartialTopSim):
    """Partial top-k over int8-quantized vectors: the dot product is an
    exact small-integer sum (|q|,|v| <= 127, 64 dims -> < 2^21, safely
    exact in the float32 matmul), so sim_key is a deterministic integer
    and the whole ANN is bit-stable — while vectors cost 8x less memory
    and bandwidth than float64.  Recall vs the exact float path is
    measured in tests/test_dedup_text_ann.py."""

    def __init__(self, queries_ref, scales_ref, k: int = K, bits: int = 8):
        self.qids, q = ray.get(queries_ref)
        self.scales = ray.get(scales_ref)
        self.bits = bits
        self.q8 = _quantize(q, self.scales, bits) if len(self.qids) else q
        # pre-cast once per actor (the per-chunk .astype in __call__ was
        # O(Q*d) redundant work per batch; r4 review)
        acc = np.float32 if bits == 8 else np.float64
        self.q8a = self.q8.astype(acc) if len(self.qids) else self.q8
        self.k = k

    def __call__(self, batch: pa.Table) -> pa.Table:
        ids, m = _emb_matrix(batch)
        if len(ids) == 0 or len(self.qids) == 0:
            return pa.table({"query_id": pa.array([], pa.int64()),
                             "neighbor_id": pa.array([], pa.int64()),
                             "sim_key": pa.array([], pa.int64())})
        m8 = _quantize(m, self.scales, self.bits)
        # integer-valued matmul: float32 partial sums stay exact below 2^24
        # (int8: 127^2 * 64 dims), float64 below 2^53 (int16) — any summation
        # order yields the same integers, so sim_key is bit-stable (and the
        # query-axis chunking below is trivially exact)
        m8a = m8.astype(self.q8a.dtype)
        parts = []
        for c0 in range(0, len(self.qids), self.Q_CHUNK):
            sim_key = (m8a @ self.q8a[c0:c0 + self.Q_CHUNK].T
                       ).astype(np.int64)
            B, Q = sim_key.shape
            k = min(self.k, B)
            part = np.argpartition(-sim_key, k - 1, axis=0)[:k]
            kth = sim_key[part, np.arange(Q)[None, :]].min(axis=0)
            rows, cols = np.nonzero(sim_key >= kth[None, :])
            parts.append(pa.table({
                "query_id": pa.array(self.qids[c0 + cols]),
                "neighbor_id": pa.array(ids[rows]),
                "sim_key": pa.array(sim_key[rows, cols]),
            }))
        return pa.concat_tables(parts)


def ann_int8(sf_dir: str, k: int = K, bits: int = 8,
             *, concurrency: int | None = None) -> ray.data.Dataset:
    """Rows-only query: brute-force top-k over quantized embeddings
    (per-dim distributed calibration, integer similarity keys)."""
    from ..core.config import cached_stage
    from .grouping import bucketed_group_apply

    ds = read_embeddings(sf_dir)
    scales_ref = ray.put(_dim_scales(ds))
    queries_ref = ray.put(load_queries(sf_dir))
    partials = ds.map_batches(
        cached_stage(_PartialTopSimInt8,
                     f"ann:q{bits}:{queries_ref.hex()}:{k}",
                     queries_ref, scales_ref, k, bits),
        batch_format="pyarrow", batch_size=4096, concurrency=concurrency,
    )
    return bucketed_group_apply(partials, ["query_id"], lambda g: _merge(g, k))


# --- product quantization (PQ): the memory-scale ANN path --------------------

PQ_M = 16    # subspaces: 64-dim embeddings -> 16 x 4-dim sub-vectors
# (16 bytes/vector = 16x smaller than float32; with the exact re-rank the
# measured recall@10 vs brute force is 1.0 at sf0.01, 0.93 at m=8)
PQ_K = 256   # centroids per subspace -> one uint8 code per sub-vector
# ADC shortlist size — ONE constant shared by the per-batch emit threshold
# (_PqScan) and the global merge cut (merge_pq): the partition-invariance
# proof requires the two to be EQUAL (each batch emits a superset of the
# global ADC top-PQ_RERANK), so never tune one without the other
PQ_RERANK = 64


_PQ_BOOKS_CACHE: dict[tuple, np.ndarray] = {}


def train_pq_codebooks(sf_dir: str, m: int = PQ_M, k: int = PQ_K,
                       sample_mod: int = 3, iters: int = 8) -> np.ndarray:
    """(m, k_eff, d/m) per-subspace codebooks: deterministic sample
    (vec_id % sample_mod == 0, no RNG draw-order dependence), Philox-seeded
    init, fixed Lloyd iterations per subspace — the same driver-side
    training pattern as IVF's train_centroids (at 10^12 scale the sample
    itself becomes a Dataset aggregate; the codebooks stay m x k x d/m
    either way).  The result is a deterministic artifact of its arguments,
    so it is cached per session — retraining on every query call was ~40%
    of ann_pq's wall time."""
    from ..core.config import session_token

    ck = (sf_dir, m, k, sample_mod, iters, session_token())
    hit = _PQ_BOOKS_CACHE.get(ck)
    if hit is not None:
        return hit

    def sel(b: pa.Table) -> pa.Table:
        ids = b["vec_id"].to_numpy(zero_copy_only=False)
        return b.filter(pa.array(ids % sample_mod == 0))

    parts = [t for t in ray.get(
        read_embeddings(sf_dir)
        .map_batches(sel, batch_format="pyarrow", batch_size=None)
        .to_arrow_refs()) if t.num_rows]
    t = pa.concat_tables(parts, promote_options="default")
    ids, s = _emb_matrix(t)
    order = np.argsort(ids, kind="stable")
    s = s[order]
    sn = s / np.sqrt((s * s).sum(axis=1, keepdims=True))
    d = sn.shape[1]
    if d % m:
        raise ValueError(f"embedding dim {d} not divisible by m={m}")
    sub_d = d // m
    k_eff = min(k, sn.shape[0])
    rng = np.random.Generator(np.random.Philox(key=11))
    books = np.empty((m, k_eff, sub_d), dtype=np.float64)
    for s_i in range(m):
        x = sn[:, s_i * sub_d : (s_i + 1) * sub_d]
        cent = x[rng.choice(x.shape[0], size=k_eff, replace=False)]
        x2 = (x * x).sum(axis=1)[:, None]
        for _ in range(iters):
            # nearest centroid by euclidean distance (matmul form: the
            # broadcast-subtract cube was ~10x slower at 16k x 256 x 4),
            # ties -> lowest index
            d2 = x2 + (cent * cent).sum(axis=1)[None, :] - 2.0 * (x @ cent.T)
            assign = np.argmin(d2, axis=1)
            # segment means via one sort (k_eff Python iterations of
            # boolean masks were the other half of the training cost)
            order = np.argsort(assign, kind="stable")
            a_s = assign[order]
            starts = np.flatnonzero(np.concatenate([[True], a_s[1:] != a_s[:-1]]))
            sums = np.add.reduceat(x[order], starts, axis=0)
            cnts = np.diff(np.concatenate([starts, [a_s.size]]))
            cent[a_s[starts]] = sums / cnts[:, None]
        books[s_i] = cent
    _PQ_BOOKS_CACHE.clear()  # one corpus at a time is plenty
    _PQ_BOOKS_CACHE[ck] = books
    return books


class _PqScan:
    """ADC scan: per-worker state = the broadcast query LUTs (Q, m, k) of
    partial dot products; each batch encodes its vectors to (B, m) codes
    and accumulates m table gathers — no float matmul over the corpus, and
    at scale the codes (m bytes/vector vs 4d) are what lives in memory."""

    def __init__(self, queries_ref, books_ref, k: int = K,
                 rerank: int = PQ_RERANK):
        self.qids, q = ray.get(queries_ref)
        # normalize explicitly (r3 review: the stored embeddings are only
        # ~unit, off by ~1e-7 — every other scorer renormalizes, and the
        # sim_key contract is round(cosine * SCALE), not round(dot))
        self.qn = q / np.sqrt((q * q).sum(axis=1, keepdims=True))
        self.books = ray.get(books_ref)  # (m, k_eff, sub_d)
        m, k_eff, sub_d = self.books.shape
        # LUT[q, s, c] = <q_sub[s], centroid[s, c]>
        qs = self.qn.reshape(self.qn.shape[0], m, sub_d)
        self.lut = np.einsum("qsd,scd->qsc", qs, self.books)
        self.k = k
        self.rerank = rerank  # ADC shortlist size per query per batch

    def _encode(self, mtx: np.ndarray) -> np.ndarray:
        m, k_eff, sub_d = self.books.shape
        codes = np.empty((mtx.shape[0], m), dtype=np.int64)
        for s_i in range(m):
            x = mtx[:, s_i * sub_d : (s_i + 1) * sub_d]
            c = self.books[s_i]
            d2 = ((x * x).sum(axis=1)[:, None]
                  + (c * c).sum(axis=1)[None, :] - 2.0 * (x @ c.T))
            codes[:, s_i] = np.argmin(d2, axis=1)
        return codes

    def __call__(self, batch: pa.Table) -> pa.Table:
        ids, mtx = _emb_matrix(batch)
        if len(ids) == 0 or len(self.qids) == 0:
            # schema must match the non-empty branch (incl. adc_key), or a
            # single empty block poisons the shuffle's schema unification
            return pa.table({"query_id": pa.array([], pa.int64()),
                             "neighbor_id": pa.array([], pa.int64()),
                             "adc_key": pa.array([], pa.int64()),
                             "sim_key": pa.array([], pa.int64())})
        mtx = mtx / np.sqrt((mtx * mtx).sum(axis=1, keepdims=True))
        codes = self._encode(mtx)
        m = codes.shape[1]
        Q = self.lut.shape[0]
        B = codes.shape[0]
        sims = np.zeros((Q, B))
        for s_i in range(m):  # m table gathers, vectorized over (Q, B)
            sims += self.lut[:, s_i, :][:, codes[:, s_i]]
        # ADC shortlist -> EXACT re-rank (the standard PQ serving shape).
        # PARTITION-INVARIANCE (r3 review): a per-batch top-``rerank`` cut
        # alone makes the output depend on block boundaries.  Instead each
        # batch emits every candidate whose ADC score ties-or-beats its
        # batch's rerank-th best (a superset of any global top-``rerank``
        # member: a global winner has < rerank better candidates overall,
        # hence < rerank in its own batch), carrying BOTH the integer ADC
        # key and the exact cosine key; the merge then takes the GLOBAL
        # ADC top-``rerank`` under a total order and re-ranks exactly —
        # the result is a pure function of the data, not the partitioning.
        adc_key = np.floor(sims * SIM_SCALE + 0.5).astype(np.int64)
        r = min(self.rerank, B)
        part = np.argpartition(-adc_key, r - 1, axis=1)[:, :r]
        rth = adc_key[np.arange(Q)[:, None], part].min(axis=1)
        qq, cc = np.nonzero(adc_key >= rth[:, None])
        exact = (mtx[cc] * self.qn[qq]).sum(axis=1)
        key = np.floor(exact * SIM_SCALE + 0.5).astype(np.int64)
        return pa.table({
            "query_id": pa.array(self.qids[qq]),
            "neighbor_id": pa.array(ids[cc]),
            "adc_key": pa.array(adc_key[qq, cc]),
            "sim_key": pa.array(key),
        })


def ann_pq(sf_dir: str, k: int = K, m: int = PQ_M, *,
           batch_size: int = 4096,
           concurrency: int | None = None) -> ray.data.Dataset:
    """Product-quantization ANN (rows-only; recall vs the exact brute force
    asserted in tests): the third scale path next to IVF and LSH — memory,
    not pruning.  Codes are m bytes/vector (32x smaller than float32 at
    d=64), queries scan via asymmetric-distance lookup tables."""
    from ..core.config import cached_stage
    from .grouping import bucketed_group_apply

    queries_ref = ray.put(load_queries(sf_dir))
    books_ref = ray.put(train_pq_codebooks(sf_dir, m))
    ds = read_embeddings(sf_dir)
    partials = ds.map_batches(
        cached_stage(_PqScan, f"ann:pq:{queries_ref.hex()}:{m}:{k}",
                     queries_ref, books_ref, k),
        batch_format="pyarrow", batch_size=batch_size,
        concurrency=concurrency,
    )

    def merge_pq(g: pd.DataFrame, rerank: int = PQ_RERANK) -> pd.DataFrame:
        # global ADC top-``rerank`` under the (adc desc, id asc) total
        # order, then the exact-cosine top-k — both deterministic, so the
        # result no longer depends on batch boundaries
        g = g.sort_values(["query_id", "adc_key", "neighbor_id"],
                          ascending=[True, False, True], kind="mergesort")
        qid = g["query_id"].to_numpy()
        starts = np.concatenate([[0], np.flatnonzero(qid[1:] != qid[:-1]) + 1])
        sizes = np.diff(np.concatenate([starts, [len(g)]]))
        pos = np.arange(len(g)) - np.repeat(starts, sizes)
        return _merge(g.loc[pos < rerank,
                            ["query_id", "neighbor_id", "sim_key"]], k)

    return bucketed_group_apply(partials, ["query_id"], merge_pq)


# --- metadata-filtered ANN ----------------------------------------------------

FILTER_LANG = "en"


def ann_filtered(sf_dir: str, k: int = K,
                 lang: str = FILTER_LANG) -> ray.data.Dataset:
    """Metadata-FILTERED vector search — the vector-DB staple: top-k
    cosine neighbors restricted to documents of one language.  The allowed
    id set comes from the documents dim, broadcast once as a dense bool
    mask; candidate batches are filtered BEFORE the partial top-k so the
    matmul only touches qualifying vectors (pre-filter, not post-filter:
    a post-filtered top-k can return < k rows even when k qualifying
    neighbors exist).  Everything downstream reuses the brute-force
    partial-top-k + bucketed merge machinery."""
    import pyarrow.compute as pc
    import pyarrow.parquet as pq

    from ..core.config import cached_stage

    docs = pq.read_table(table_path(sf_dir, "documents"),
                         columns=["doc_id", "lang"])
    ids = docs["doc_id"].to_numpy().astype(np.int64)
    ok = pc.equal(docs["lang"], lang).to_numpy(zero_copy_only=False)
    allowed = np.zeros(int(ids.max()) + 2, dtype=bool)
    allowed[ids] = ok
    allowed_ref = ray.put(allowed)
    queries_ref = ray.put(load_queries(sf_dir))

    class Filtered(_PartialTopSim):
        def __init__(self):
            super().__init__(queries_ref, k)
            self.allowed = ray.get(allowed_ref)

        def __call__(self, b: pa.Table) -> pa.Table:
            vids = b["vec_id"].to_numpy(zero_copy_only=False)
            hi = self.allowed.shape[0]
            safe = np.where((vids >= 0) & (vids < hi), vids, hi - 1)
            return super().__call__(b.filter(pa.array(self.allowed[safe])))

    from .grouping import bucketed_group_apply

    partials = read_embeddings(sf_dir).map_batches(
        cached_stage(Filtered,
                     f"ann:filt:{queries_ref.hex()}:{allowed_ref.hex()}:{k}"),
        batch_format="pyarrow", batch_size=4096)
    return bucketed_group_apply(partials, ["query_id"],
                                lambda g: _merge(g, k))


SQL_ANN_FILTERED = f"""
SELECT query_id, neighbor_id, rank, sim_key FROM (
  SELECT q.vec_id AS query_id, e.vec_id AS neighbor_id,
         CAST(floor(list_cosine_similarity(CAST(e.embedding AS DOUBLE[]),
              CAST(q.embedding AS DOUBLE[])) * {SIM_SCALE} + 0.5) AS BIGINT) AS sim_key,
         row_number() OVER (
           PARTITION BY q.vec_id
           ORDER BY CAST(floor(list_cosine_similarity(CAST(e.embedding AS DOUBLE[]),
                    CAST(q.embedding AS DOUBLE[])) * {SIM_SCALE} + 0.5) AS BIGINT) DESC,
                    e.vec_id ASC) AS rank
  FROM embeddings e
  JOIN documents d ON e.vec_id = d.doc_id AND d.lang = '{FILTER_LANG}'
  CROSS JOIN (SELECT vec_id, embedding FROM embeddings
              WHERE vec_id % {QUERY_MOD} = 0) q
) WHERE rank <= {K}
""".strip()


def sql_ann_int8(k: int = K, dim: int = 64) -> str:
    """Exact DuckDB twin of :func:`ann_int8` (graduated from rows-only,
    r4).  The only float steps are the per-row norm and the quantizer, and
    both are mirrored to the BIT:

    - numpy's 64-element row sum is its unrolled-by-8 pairwise kernel —
      8 stride-8 sequential partial sums combined in a fixed binary tree;
      the twin spells out that exact association (verified bit-equal to
      ``(m*m).sum(axis=1)`` in tests/test_sqlmirror.py) for ``dim``
      elements, guarded by a LOUD in-SQL dim check (a narrower table
      would index past the list -> NULL norms -> silently empty oracle;
      r4 review);
    - ``np.round`` is half-to-even -> DuckDB ``round_even(x, 0)``;
    - the calibration scale mirrors the engine's _dim_scales EXACTLY,
      including the all-zero-dimension clamp to 1.0 (per-dim max of
      |normalized| is <= 1, so 'any dim max = 0 -> scale 1.0' equals the
      engine's np.where(out == 0, 1, out) folded through np.max; r4
      review) — not just the raw global max;
    - the int8 dot product is a small-integer sum (< 2^21), exact in any
      order, so ranking and ``sim_key`` are deterministic integers.
    """
    if dim % 8:
        raise ValueError("the unroll-8 mirror needs dim % 8 == 0")

    # numpy pairwise unroll-8: r_j = ((x_j + x_{j+8}) + x_{j+16}) + ...,
    # result = ((r0+r1)+(r2+r3)) + ((r4+r5)+(r6+r7))
    def sq(i: int) -> str:  # 1-based list index
        return f"(e[{i + 1}] * e[{i + 1}])"

    stride = dim // 8
    r = []
    for j in range(8):
        acc = sq(j)
        for t in range(1, stride):
            acc = f"({acc} + {sq(j + 8 * t)})"
        r.append(acc)
    norm_sq = (f"((({r[0]} + {r[1]}) + ({r[2]} + {r[3]})) + "
               f"(({r[4]} + {r[5]}) + ({r[6]} + {r[7]})))")

    quant = ("CAST(LEAST(GREATEST(round_even(((x / sqrt(s2)) / sc) * 127.0,"
             " 0), -127.0), 127.0) AS BIGINT)")
    return f"""
WITH emb AS (
  SELECT vec_id, [CAST(x AS DOUBLE) for x in embedding] AS e
  FROM embeddings
), chk AS (
  -- load-bearing guard: ok is ADDED into s2 below (+0.0, exact) so the
  -- optimizer cannot prune the unused-column cross join and skip the
  -- error() evaluation
  SELECT CASE WHEN MIN(len(e)) <> {dim} OR MAX(len(e)) <> {dim}
              THEN error('sql_ann_int8 mirrors a fixed dim={dim} unroll; '
                         || 'regenerate with sql_ann_int8(dim=...)')
         ELSE 0.0 END AS ok FROM emb
), nrm AS (
  SELECT vec_id, e, {norm_sq} + chk.ok AS s2 FROM emb CROSS JOIN chk
), cal AS (
  SELECT CASE WHEN MIN(mx) = 0.0 THEN 1.0 ELSE MAX(mx) END AS sc
  FROM (
    SELECT j, MAX(v) AS mx FROM (
      SELECT unnest([abs(x / sqrt(s2)) for x in e]) AS v,
             unnest(range(len(e))) AS j
      FROM nrm) GROUP BY j)
), q8 AS (
  SELECT vec_id, [{quant} for x in e] AS v
  FROM nrm CROSS JOIN cal
), qs AS (
  SELECT vec_id AS qid, v FROM q8 WHERE vec_id % {QUERY_MOD} = 0
), sim AS (
  SELECT q.qid AS query_id, d.vec_id AS neighbor_id,
         CAST(list_dot_product(
           [CAST(a AS DOUBLE) for a in q.v],
           [CAST(b AS DOUBLE) for b in d.v]) AS BIGINT) AS sim_key
  FROM qs q CROSS JOIN q8 d
)
SELECT query_id, neighbor_id, CAST(rank AS BIGINT) AS rank, sim_key FROM (
  SELECT query_id, neighbor_id, sim_key,
         row_number() OVER (PARTITION BY query_id
                            ORDER BY sim_key DESC, neighbor_id ASC) AS rank
  FROM sim
) WHERE rank <= {k}
""".strip()


# --- per-label embedding centroid sums (exact int; r5) -----------------------

EMB_Q_SCALE = 1_000_000


def label_embedding_sums(embs: ray.data.Dataset) -> ray.data.Dataset:
    """(label, dim, sum_q): per class label and vector dimension, the
    exact integer sum of micro-quantized embedding components — the
    centroid numerator every per-class prototype / nearest-class-mean
    classifier needs, as a LIST-column aggregate (the engine's vector
    columns flow through the same combined-fold machinery as scalars;
    consumers divide by the label count for the mean).

    Quantization is ``floor(float64(x) * 1e6 + 0.5)`` — the float32
    component is widened to float64 BEFORE scaling on both sides, so
    numpy and DuckDB floor the identical double.  Per-block partial:
    one zero-copy reshape of the fixed-width list buffer + one
    (label)-segmented matrix sum -> (labels x dims)-sized rows; the
    exchange is dimension-sized."""
    import pandas as pd

    from ..pipelines.relational import combined_groupby_sum

    def partial(b: pa.Table) -> pa.Table:
        col = b["embedding"]
        if isinstance(col, pa.ChunkedArray):
            col = col.combine_chunks()
        flat = col.flatten().to_numpy(zero_copy_only=False) \
            .astype(np.float64)
        n = len(col)
        if n == 0:
            return pa.table({"label": pa.array([], pa.int64()),
                             "dim": pa.array([], pa.int64()),
                             "sum_q": pa.array([], pa.int64())})
        dim = flat.shape[0] // n
        q = np.floor(flat * EMB_Q_SCALE + 0.5).astype(np.int64) \
            .reshape(n, dim)
        lab = b["label"].to_numpy(zero_copy_only=False).astype(np.int64)
        order = np.argsort(lab, kind="stable")
        ls = lab[order]
        qs = q[order]
        starts = np.concatenate([[0], np.flatnonzero(ls[1:] != ls[:-1]) + 1])
        sums = np.add.reduceat(qs, starts, axis=0)
        labels = np.repeat(ls[starts], dim)
        dims = np.tile(np.arange(1, dim + 1, dtype=np.int64),
                       starts.shape[0])
        return pa.table({"label": pa.array(labels),
                         "dim": pa.array(dims),
                         "sum_q": pa.array(sums.ravel())})

    parts = embs.map_batches(partial, batch_format="pyarrow",
                             batch_size=4096)
    return combined_groupby_sum(parts, ["label", "dim"], ["sum_q"])


SQL_LABEL_EMBEDDING_SUMS = f"""
WITH e AS (SELECT label, generate_subscripts(embedding, 1) AS dim,
                  CAST(floor(CAST(unnest(embedding) AS DOUBLE)
                             * {EMB_Q_SCALE}.0 + 0.5) AS BIGINT) AS q
           FROM embeddings)
SELECT CAST(label AS BIGINT) AS label, CAST(dim AS BIGINT) AS dim,
       CAST(SUM(q) AS BIGINT) AS sum_q
FROM e GROUP BY 1, 2
""".strip()


# --- nearest-class-mean classification + exact confusion matrix --------------


def ncm_confusion(embs: ray.data.Dataset) -> ray.data.Dataset:
    """(true_label, pred_label, n): the confusion matrix of a
    nearest-class-MEAN classifier over the embedding table, exact in
    integers end to end — the ML-eval primitive (prototype classifiers,
    sanity-checking an embedding space) with no float on the wire:
    vectors and centroid sums share label_embedding_sums' micro-
    quantization, each class score is ``dot(q_vec, centroid_sum) //
    n_label`` (identical floor on both sides), argmax ties break to the
    smaller label.

    Ray shape: centroid sums + label counts are (labels x dims)-sized —
    folded once, broadcast via ``ray.put``; each block classifies with
    ONE int64 matmul against the 10x64 centroid matrix and emits
    (true, pred) count partials; the confusion exchange is
    label^2-sized."""
    import pandas as pd
    import ray as _ray

    from ..pipelines.relational import combined_groupby_sum
    from ..sources.pages import cached_get

    sums = label_embedding_sums(embs).to_pandas()
    labels = np.sort(sums["label"].unique())
    dims = np.sort(sums["dim"].unique())
    C = sums.pivot(index="label", columns="dim", values="sum_q") \
        .loc[labels, dims].to_numpy().astype(np.int64)

    def cnt_partial(b: pa.Table) -> pa.Table:
        lab = b["label"].to_numpy(zero_copy_only=False).astype(np.int64)
        u, c = np.unique(lab, return_counts=True)
        return pa.table({"label": pa.array(u),
                         "n": pa.array(c.astype(np.int64))})

    counts = combined_groupby_sum(
        embs.map_batches(cnt_partial, batch_format="pyarrow",
                         batch_size=65536),
        ["label"], ["n"]).to_pandas()
    n_vec = counts.set_index("label").loc[labels, "n"] \
        .to_numpy().astype(np.int64)
    ref = _ray.put((labels.astype(np.int64), C, n_vec))

    def classify(b: pa.Table) -> pa.Table:
        labs, Cm, nl = cached_get(ref)
        col = b["embedding"]
        if isinstance(col, pa.ChunkedArray):
            col = col.combine_chunks()
        n = len(col)
        if n == 0:
            return pa.table({"true_label": pa.array([], pa.int64()),
                             "pred_label": pa.array([], pa.int64()),
                             "n": pa.array([], pa.int64())})
        flat = col.flatten().to_numpy(zero_copy_only=False) \
            .astype(np.float64)
        dim = flat.shape[0] // n
        Q = np.floor(flat * EMB_Q_SCALE + 0.5).astype(np.int64) \
            .reshape(n, dim)
        dots = Q @ Cm.T                      # (n, labels) int64
        score = dots // nl[None, :]
        pred = labs[np.argmax(score, axis=1)]  # first max = smallest label
        true = b["label"].to_numpy(zero_copy_only=False).astype(np.int64)
        df = pd.DataFrame({"true_label": true, "pred_label": pred})
        g = df.groupby(["true_label", "pred_label"], as_index=False) \
            .size().rename(columns={"size": "n"})
        g["n"] = g["n"].astype(np.int64)
        return pa.Table.from_pandas(g, preserve_index=False)

    parts = embs.map_batches(classify, batch_format="pyarrow",
                             batch_size=4096)
    return combined_groupby_sum(parts, ["true_label", "pred_label"],
                                ["n"])


SQL_NCM_CONFUSION = f"""
WITH e AS (SELECT vec_id, label, generate_subscripts(embedding, 1) AS dim,
                  CAST(floor(CAST(unnest(embedding) AS DOUBLE)
                             * {EMB_Q_SCALE}.0 + 0.5) AS BIGINT) AS q
           FROM embeddings),
cent AS (SELECT label AS clabel, dim, CAST(SUM(q) AS BIGINT) AS s
         FROM e GROUP BY 1, 2),
cnt AS (SELECT label AS clabel, CAST(COUNT(*) AS BIGINT) AS n
        FROM embeddings GROUP BY 1),
dots AS (SELECT e.vec_id, e.label AS true_label, c.clabel,
                CAST(SUM(e.q * c.s) AS BIGINT) AS dot
         FROM e JOIN cent c ON c.dim = e.dim
         GROUP BY 1, 2, 3),
scored AS (SELECT vec_id, true_label, clabel,
                  CAST(dot // n AS BIGINT) AS score
           FROM dots JOIN cnt USING (clabel)),
pred AS (SELECT vec_id, true_label, clabel AS pred_label,
                row_number() OVER (PARTITION BY vec_id
                                   ORDER BY score DESC, clabel) AS rn
         FROM scored)
SELECT CAST(true_label AS BIGINT) AS true_label,
       CAST(pred_label AS BIGINT) AS pred_label,
       CAST(COUNT(*) AS BIGINT) AS n
FROM pred WHERE rn = 1
GROUP BY 1, 2
""".strip()
