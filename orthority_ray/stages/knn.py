"""kNN of a query set against the full page point cloud.

Engine analog of the reference's nearest-surface search (ray ∩ DEM first
intersection, `orthority/camera.py:138-164`; SURVEY.md §2.5 J6 + the
north_rule's "cell-ring kNN").  Two exact implementations with identical
output:

- :func:`knn_broadcast` — the scale path: the (small) query set is broadcast
  via ``ray.put``; every page batch computes a vectorized distance matrix and
  emits a per-batch partial top-k per query (k rows/query/batch); a final
  ``groupby(query_id).map_groups`` merges partials.  No all-to-all over the
  pages; shuffled bytes are O(#queries * k * #batches).
- :func:`knn_cellring` — same partial/merge skeleton, but inside each batch
  candidates are pruned by expanding Chebyshev cell rings around the query
  cell until the ring lower bound exceeds the current k-th best distance
  (H3 grid_disk analog, exactness preserved per batch).

Metric: flat euclidean in degrees, ``(lon-qlon)^2 + (lat-qlat)^2`` with the
exact association order the DuckDB oracle uses; ties broken by doc_id.
Queries: DISTINCT doc_ids with ``doc_id % QUERY_MOD == 0`` (deterministic,
derived from the data itself).
"""

from __future__ import annotations

import numpy as np
import pandas as pd
import pyarrow as pa
import ray
import ray.data

from ..core import cells as C
from ..core import hashing as H

QUERY_MOD = 997
K = 10
DIST_SCALE = 1_000_000_000  # dist_key = floor(dist * 1e9), exact on both sides

_EMPTY_PARTIAL = pa.table(
    {
        "query_id": pa.array([], pa.int64()),
        "neighbor_id": pa.array([], pa.int64()),
        "dist": pa.array([], pa.float64()),
    }
)


def make_queries(geo_ds: ray.data.Dataset) -> np.ndarray:
    """(Q, 3) [qid, lon, lat] — distinct query docs, ascending qid.

    Selected with a vectorized filter + distinct over a tiny result; the
    take is bounded by #queries (page_count / QUERY_MOD), safe to
    materialize.
    """
    def sel(batch: pa.Table) -> pa.Table:
        d = batch["doc_id"].to_numpy(zero_copy_only=False)
        m = d % QUERY_MOD == 0
        return pa.table({"qid": pa.array(np.unique(d[m]))})

    parts = geo_ds.map_batches(sel, batch_format="pyarrow").take_all()
    qids = np.unique(np.array([r["qid"] for r in parts], dtype=np.int64))
    lon_m, lat_m = H.geocode_milli(qids)
    qlon, qlat = H.milli_to_deg(lon_m, lat_m)
    return np.stack([qids.astype(np.float64), qlon, qlat], axis=1)


class _PartialTopK:
    """Per-batch partial top-k against the broadcast query matrix."""

    def __init__(self, queries_ref, k: int = K):
        q = ray.get(queries_ref)
        self.qid = q[:, 0].astype(np.int64)
        self.qlon = q[:, 1]
        self.qlat = q[:, 2]
        self.k = k

    def _emit(self, doc_id, dist_cols, q_index) -> pa.Table:
        """dist_cols: (B, Qsub) distances; emit top-k rows per query column.

        Exact-tie handling: duplicate pages and jitter collisions produce
        exact distance ties, and a batch-local top-k that broke ties
        arbitrarily would make the merged result depend on batch boundaries
        (= parallelism level).  So the batch-local order is the same total
        order the oracle uses: (dist, doc_id).
        """
        B, Q = dist_cols.shape
        k = min(self.k, B)
        if Q == 0 or B == 0:
            return _EMPTY_PARTIAL
        # fully vectorized: emit EVERY candidate <= the per-query kth distance
        # (boundary ties included, a few extra rows per query) and let the
        # final merge truncate under the (dist, doc_id) total order — exact,
        # and no per-query Python loop in the hot path.
        part = np.argpartition(dist_cols, k - 1, axis=0)[:k]  # (k, Q) by dist only
        kth = dist_cols[part, np.arange(Q)[None, :]].max(axis=0)  # (Q,)
        rows, cols = np.nonzero(dist_cols <= kth[None, :])
        return pa.table(
            {
                "query_id": pa.array(self.qid[q_index[cols]]),
                "neighbor_id": pa.array(doc_id[rows]),
                "dist": pa.array(dist_cols[rows, cols]),
            }
        )

    Q_CHUNK = 128  # queries per distance-matrix slab: keeps B x Qc resident
    # in cache instead of allocating one huge B x Q matrix per batch

    def __call__(self, batch: pa.Table) -> pa.Table:
        doc_id = batch["doc_id"].to_numpy(zero_copy_only=False)
        lon = batch["lon"].to_numpy(zero_copy_only=False)
        lat = batch["lat"].to_numpy(zero_copy_only=False)
        Q = self.qid.shape[0]
        B = lon.shape[0]
        # reused scratch slabs: two fresh ~16 MB allocations per chunk pay
        # kernel page-zeroing on every slab; the scorer lives per worker so
        # the buffers amortize across batches
        scr = getattr(self, "_scratch", None)
        if scr is None or scr[0].shape[0] < B:
            scr = (np.empty((B, self.Q_CHUNK)), np.empty((B, self.Q_CHUNK)))
            self._scratch = scr
        parts = []
        for qs in range(0, Q, self.Q_CHUNK):
            qe = min(qs + self.Q_CHUNK, Q)
            # exact oracle expression order:
            # (lon-qlon)*(lon-qlon)+(lat-qlat)*(lat-qlat), computed in-place
            # (identical IEEE result per element)
            dl = scr[0][:B, : qe - qs]
            dt = scr[1][:B, : qe - qs]
            np.subtract(lon[:, None], self.qlon[None, qs:qe], out=dl)
            np.multiply(dl, dl, out=dl)
            np.subtract(lat[:, None], self.qlat[None, qs:qe], out=dt)
            np.multiply(dt, dt, out=dt)
            dl += dt
            parts.append(self._emit(doc_id, dl, np.arange(qs, qe)))
        return pa.concat_tables(parts) if parts else _EMPTY_PARTIAL


class _PartialTopKCellRing(_PartialTopK):
    """Partial top-k with cell-ring pruning inside the batch.

    For each query, expand rings r = 0, 1, ... around the query's kNN cell;
    at each ring, test only the batch points whose knn_cell falls in the
    ring; stop when >= k candidates found AND ring_min_dist(r+1) ** 2 exceeds
    the current k-th best — so the batch-local result equals the unpruned
    one and the merge stays exact.
    """

    def __init__(self, queries_ref, k: int = K, cs: int = C.KNN_CELL_SIZE):
        super().__init__(queries_ref, k)
        self.cs = cs
        qlon_m = ((self.qlon + 180.0) * 1000.0).astype(np.int64)
        qlat_m = ((self.qlat + 85.0) * 1000.0).astype(np.int64)
        self.qcell = C.encode(qlon_m, qlat_m, cs)
        self.max_ring = max(C.ncols(cs), C.nrows(cs))

    FALLBACK_RINGS = 16  # past this, ring bookkeeping costs more than a
    # vectorized scan of the whole batch (a batch with no points near the
    # query would otherwise expand rings to the world edge — O(max_ring^2))

    def __call__(self, batch: pa.Table) -> pa.Table:
        if self.qid.shape[0] == 0 or batch.num_rows == 0:
            return _EMPTY_PARTIAL
        doc_id = batch["doc_id"].to_numpy(zero_copy_only=False)
        lon = batch["lon"].to_numpy(zero_copy_only=False)
        lat = batch["lat"].to_numpy(zero_copy_only=False)
        kcell = batch["knn_cell"].to_numpy(zero_copy_only=False)
        order = np.argsort(kcell, kind="stable")
        kcell_s = kcell[order]
        out_q, out_n, out_d = [], [], []
        for qi in range(self.qid.shape[0]):
            best_d = np.empty(0)
            best_i = np.empty(0, dtype=np.int64)
            tested = np.zeros(0, dtype=np.int64)
            done = False
            r = 0
            while r <= self.FALLBACK_RINGS:
                ring_cells = C.ring(int(self.qcell[qi]), r, self.cs)
                lo = np.searchsorted(kcell_s, ring_cells, side="left")
                hi = np.searchsorted(kcell_s, ring_cells, side="right")
                picks = [order[a:b] for a, b in zip(lo, hi) if b > a]
                if picks:
                    sel = np.concatenate(picks)
                    tested = np.concatenate([tested, sel])
                    dl = lon[sel] - self.qlon[qi]
                    dt = lat[sel] - self.qlat[qi]
                    d = dl * dl + dt * dt
                    best_d = np.concatenate([best_d, d])
                    best_i = np.concatenate([best_i, sel])
                    if best_d.shape[0] > self.k:
                        # shrink but PRESERVE boundary ties (tie-exactness; see _emit)
                        part = np.argpartition(best_d, self.k - 1)[: self.k]
                        kth = best_d[part].max()
                        keep = best_d <= kth
                        best_d, best_i = best_d[keep], best_i[keep]
                bound = C.ring_min_dist_deg(r + 1, self.cs)
                if best_d.shape[0] >= self.k and bound * bound > best_d.max():
                    done = True
                    break
                r += 1
            if not done:
                # exact fallback: scan every point not yet tested
                mask = np.ones(lon.shape[0], dtype=bool)
                mask[tested] = False
                rest = np.nonzero(mask)[0]
                if rest.size:
                    dl = lon[rest] - self.qlon[qi]
                    dt = lat[rest] - self.qlat[qi]
                    d = dl * dl + dt * dt
                    best_d = np.concatenate([best_d, d])
                    best_i = np.concatenate([best_i, rest])
                    if best_d.shape[0] > self.k:
                        part = np.argpartition(best_d, self.k - 1)[: self.k]
                        kth = best_d[part].max()
                        keep = best_d <= kth
                        best_d, best_i = best_d[keep], best_i[keep]
            out_q.append(np.full(best_i.shape[0], self.qid[qi]))
            out_n.append(doc_id[best_i])
            out_d.append(best_d)
        return pa.table(
            {
                "query_id": pa.array(np.concatenate(out_q).astype(np.int64)),
                "neighbor_id": pa.array(np.concatenate(out_n)),
                "dist": pa.array(np.concatenate(out_d)),
            }
        )


def _merge_topk(g: pd.DataFrame, k: int = K) -> pd.DataFrame:
    """All queries in the bucket merged at once: one sort by (query, dist,
    neighbor), per-query rank by segment offset, keep rank < k — identical
    output to the old per-query head(k) (one Python call per query)."""
    g = g.sort_values(["query_id", "dist", "neighbor_id"], kind="mergesort")
    qid = g["query_id"].to_numpy()
    starts = np.concatenate([[0], np.flatnonzero(qid[1:] != qid[:-1]) + 1])
    sizes = np.diff(np.concatenate([starts, [len(g)]]))
    rank = np.arange(len(g)) - np.repeat(starts, sizes)
    keep = rank < k
    out = g.loc[keep, ["query_id", "neighbor_id"]].reset_index(drop=True)
    out["rank"] = rank[keep] + 1
    out["dist_key"] = np.floor(
        g["dist"].to_numpy()[keep] * DIST_SCALE
    ).astype(np.int64)
    return out


def _run(geo_ds: ray.data.Dataset, cls, k: int, concurrency: int | None) -> ray.data.Dataset:
    """Stateless tasks + per-worker cached scorer via ``cached_stage`` (no
    actor pool: the scorer state is one broadcast matrix, and pool spin-up
    dominated the stage wall time at this scale; cached_stage also bounds
    the per-worker instance cache, where a hand-rolled dict accumulated one
    scorer + scratch slabs per past run — see BASELINE.md perf lessons)."""
    from ..core.config import cached_stage
    from .grouping import bucketed_group_apply

    queries_ref = ray.put(make_queries(geo_ds))
    cache_key = f"knn:{cls.__name__}:{k}:{queries_ref.hex()}"

    partials = geo_ds.map_batches(
        cached_stage(cls, cache_key, queries_ref, k),
        batch_format="pyarrow", batch_size=16384, concurrency=concurrency,
    )
    return bucketed_group_apply(partials, ["query_id"],
                                lambda g: _merge_topk(g, k))


def knn_broadcast(geo_ds: ray.data.Dataset, k: int = K, *, concurrency: int | None = None) -> ray.data.Dataset:
    return _run(geo_ds, _PartialTopK, k, concurrency)


def knn_cellring(geo_ds: ray.data.Dataset, k: int = K, *, concurrency: int | None = None) -> ray.data.Dataset:
    return _run(geo_ds, _PartialTopKCellRing, k, concurrency)


SQL_KNN = f"""
SELECT query_id, neighbor_id, rank, dist_key FROM (
  SELECT q.qid AS query_id, g.doc_id AS neighbor_id,
         row_number() OVER (
           PARTITION BY q.qid
           ORDER BY (g.lon - q.lon) * (g.lon - q.lon) + (g.lat - q.lat) * (g.lat - q.lat) ASC,
                    g.doc_id ASC) AS rank,
         CAST(floor(((g.lon - q.lon) * (g.lon - q.lon) + (g.lat - q.lat) * (g.lat - q.lat))
                    * {DIST_SCALE}) AS BIGINT) AS dist_key
  FROM geod g
  CROSS JOIN (SELECT DISTINCT doc_id AS qid, lon, lat FROM geod
              WHERE doc_id % {QUERY_MOD} = 0) q
) WHERE rank <= {K}
""".strip()
