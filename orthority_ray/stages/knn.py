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
    """(Q, 5) [qid, lon, lat, lon_milli, lat_milli] — distinct query docs,
    ascending qid.

    Selected with a vectorized filter + distinct over a tiny result; the
    take is bounded by #queries (page_count / QUERY_MOD), safe to
    materialize.  The EXACT integer millidegrees travel with the degrees
    (r3 review): the cell-ring scorer previously reconstructed them from
    float degrees, a lossy roundtrip that could misplace a query sitting
    exactly on a cell boundary and void the ring-close proof's slack.
    """
    def sel(batch: pa.Table) -> pa.Table:
        d = batch["doc_id"].to_numpy(zero_copy_only=False)
        m = d % QUERY_MOD == 0
        return pa.table({"qid": pa.array(np.unique(d[m]))})

    parts = geo_ds.map_batches(sel, batch_format="pyarrow").take_all()
    qids = np.unique(np.array([r["qid"] for r in parts], dtype=np.int64))
    lon_m, lat_m = H.geocode_milli(qids)
    qlon, qlat = H.milli_to_deg(lon_m, lat_m)
    return np.stack([qids.astype(np.float64), qlon, qlat,
                     lon_m.astype(np.float64), lat_m.astype(np.float64)],
                    axis=1)


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

    def _full_scan(self, doc_id, lon, lat, q_sel: np.ndarray) -> list[pa.Table]:
        """Exact distances for the query subset ``q_sel`` (global indices),
        chunked so each B x Q_CHUNK slab stays cache-resident.  Reused
        scratch slabs: two fresh ~16 MB allocations per chunk pay kernel
        page-zeroing on every slab; the scorer lives per worker so the
        buffers amortize across batches."""
        B = lon.shape[0]
        scr = getattr(self, "_scratch", None)
        if scr is None or scr[0].shape[0] < B:
            scr = (np.empty((B, self.Q_CHUNK)), np.empty((B, self.Q_CHUNK)))
            self._scratch = scr
        parts = []
        for qs in range(0, q_sel.shape[0], self.Q_CHUNK):
            sub = q_sel[qs : qs + self.Q_CHUNK]
            # exact oracle expression order:
            # (lon-qlon)*(lon-qlon)+(lat-qlat)*(lat-qlat), computed in-place
            # (identical IEEE result per element)
            dl = scr[0][:B, : sub.shape[0]]
            dt = scr[1][:B, : sub.shape[0]]
            np.subtract(lon[:, None], self.qlon[None, sub], out=dl)
            np.multiply(dl, dl, out=dl)
            np.subtract(lat[:, None], self.qlat[None, sub], out=dt)
            np.multiply(dt, dt, out=dt)
            dl += dt
            parts.append(self._emit(doc_id, dl, sub))
        return parts

    def __call__(self, batch: pa.Table) -> pa.Table:
        doc_id = batch["doc_id"].to_numpy(zero_copy_only=False)
        lon = batch["lon"].to_numpy(zero_copy_only=False)
        lat = batch["lat"].to_numpy(zero_copy_only=False)
        parts = self._full_scan(doc_id, lon, lat, np.arange(self.qid.shape[0]))
        return pa.concat_tables(parts) if parts else _EMPTY_PARTIAL


_RING_OFFSETS: dict[int, tuple[np.ndarray, np.ndarray]] = {}


def _ring_offsets(r: int) -> tuple[np.ndarray, np.ndarray]:
    """(dc, dr) offset vectors of the cells at exactly Chebyshev distance
    ``r`` — shared by every query, so ring r for all open queries is one
    broadcast add (the vectorized analog of :func:`core.cells.ring`)."""
    got = _RING_OFFSETS.get(r)
    if got is None:
        if r == 0:
            got = (np.zeros(1, dtype=np.int64), np.zeros(1, dtype=np.int64))
        else:
            rng = np.arange(-r, r + 1, dtype=np.int64)
            dc = np.concatenate([rng, rng, np.full(2 * r - 1, -r), np.full(2 * r - 1, r)])
            dr = np.concatenate(
                [np.full(2 * r + 1, -r), np.full(2 * r + 1, r), rng[1:-1], rng[1:-1]]
            )
            got = (dc, dr)
        _RING_OFFSETS[r] = got
    return got


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
        q = ray.get(queries_ref)
        if q.shape[1] >= 5:
            # exact integer millis from the broadcast matrix — no float
            # roundtrip (milli values < 2^53 are float64-exact); a lossy
            # re-derivation could misplace a query sitting exactly on a
            # cell boundary and void the ring-close proof's slack
            qlon_m = q[:, 3].astype(np.int64)
            qlat_m = q[:, 4].astype(np.int64)
        else:
            # (Q, 3) matrices (off-grid/test queries): floor assignment is
            # the correct containing cell for any interior float position
            qlon_m = ((self.qlon + 180.0) * 1000.0).astype(np.int64)
            qlat_m = ((self.qlat + 85.0) * 1000.0).astype(np.int64)
        self.qcell = C.encode(qlon_m, qlat_m, cs)
        self.ncols = C.ncols(cs)
        self.nrows = C.nrows(cs)
        self.qcol = self.qcell % self.ncols
        self.qrow = self.qcell // self.ncols

    FALLBACK_RINGS = 16  # past this, ring bookkeeping costs more than a
    # vectorized scan of the whole batch (a batch with no points near the
    # query would otherwise expand rings to the world edge — O(max_ring^2))

    def __call__(self, batch: pa.Table) -> pa.Table:
        """Ring expansion vectorized ACROSS queries: ring level r is one
        searchsorted + segment-rank pass over every still-open query, so the
        per-batch cost is O(rings * sort(candidates)) with no per-query
        Python loop (the r2 verdict's weak-for-scale #4).  Exactness
        argument: candidates are pruned to d <= kth(k) per query (boundary
        ties kept, as in :meth:`_emit`); a query closes once it holds >= k
        candidates and the next ring's distance lower bound exceeds its
        current kth — identical semantics to the per-query loop, and entries
        dropped by an intermediate prune can never re-enter any later top-k
        (kth is non-increasing), so the emitted set is bit-identical."""
        if self.qid.shape[0] == 0 or batch.num_rows == 0:
            return _EMPTY_PARTIAL
        doc_id = batch["doc_id"].to_numpy(zero_copy_only=False)
        lon = batch["lon"].to_numpy(zero_copy_only=False)
        lat = batch["lat"].to_numpy(zero_copy_only=False)
        kcell = batch["knn_cell"].to_numpy(zero_copy_only=False)
        order = np.argsort(kcell, kind="stable")
        kcell_s = kcell[order]
        n, m = self.ncols, self.nrows

        open_idx = np.arange(self.qid.shape[0])  # queries still expanding
        acc_q = np.empty(0, dtype=np.int64)  # accumulated candidate: query idx
        acc_i = np.empty(0, dtype=np.int64)  # candidate: batch row idx
        acc_d = np.empty(0, dtype=np.float64)
        parts: list[pa.Table] = []

        for r in range(self.FALLBACK_RINGS + 1):
            dc, dr = _ring_offsets(r)
            cols = self.qcol[open_idx][:, None] + dc[None, :]
            rows = self.qrow[open_idx][:, None] + dr[None, :]
            valid = (cols >= 0) & (cols < n) & (rows >= 0) & (rows < m)
            eq, eo = np.nonzero(valid)  # eq indexes open_idx
            if eq.size:
                cells = rows[eq, eo] * n + cols[eq, eo]
                lo = np.searchsorted(kcell_s, cells, side="left")
                lens = np.searchsorted(kcell_s, cells, side="right") - lo
                nz = lens > 0
                if nz.any():
                    lo, lens, eq = lo[nz], lens[nz], eq[nz]
                    tot = int(lens.sum())
                    rep = np.repeat(np.arange(lens.shape[0]), lens)
                    within = np.arange(tot) - np.repeat(np.cumsum(lens) - lens, lens)
                    sel = order[lo[rep] + within]
                    qg = open_idx[eq[rep]]  # global query index per candidate
                    # same elementwise IEEE expression as the oracle
                    dl = lon[sel] - self.qlon[qg]
                    dt = lat[sel] - self.qlat[qg]
                    acc_q = np.concatenate([acc_q, qg])
                    acc_i = np.concatenate([acc_i, sel])
                    acc_d = np.concatenate([acc_d, dl * dl + dt * dt])
            if acc_q.size:
                # one segmented top-k prune + close check for ALL open queries
                so = np.lexsort((acc_d, acc_q))
                acc_q, acc_i, acc_d = acc_q[so], acc_i[so], acc_d[so]
                starts = np.concatenate(
                    [[0], np.flatnonzero(acc_q[1:] != acc_q[:-1]) + 1]
                )
                sizes = np.diff(np.concatenate([starts, [acc_q.size]]))
                kth = np.full(starts.shape[0], np.inf)
                big = sizes >= self.k
                kth[big] = acc_d[starts[big] + self.k - 1]
                keep = acc_d <= np.repeat(kth, sizes)  # boundary ties kept
                acc_q, acc_i, acc_d = acc_q[keep], acc_i[keep], acc_d[keep]
                starts = np.concatenate(
                    [[0], np.flatnonzero(acc_q[1:] != acc_q[:-1]) + 1]
                )
                sizes = np.diff(np.concatenate([starts, [acc_q.size]]))
                seg_max = np.maximum.reduceat(acc_d, starts)
                bound = C.ring_min_dist_deg(r + 1, self.cs)
                closed = (sizes >= self.k) & (bound * bound > seg_max)
                if closed.any():
                    emit = np.repeat(closed, sizes)
                    parts.append(
                        pa.table(
                            {
                                "query_id": pa.array(self.qid[acc_q[emit]]),
                                "neighbor_id": pa.array(doc_id[acc_i[emit]]),
                                "dist": pa.array(acc_d[emit]),
                            }
                        )
                    )
                    closed_q = acc_q[starts[closed]]
                    acc_q, acc_i, acc_d = acc_q[~emit], acc_i[~emit], acc_d[~emit]
                    open_mask = np.ones(self.qid.shape[0], dtype=bool)
                    open_mask[closed_q] = False
                    open_idx = open_idx[open_mask[open_idx]]
            if open_idx.size == 0:
                break

        if open_idx.size:
            # exact fallback for queries the rings never closed: a chunked
            # full scan (superset of every ring candidate; intermediate
            # prunes only dropped entries above the final kth, so the
            # result equals the unpruned top-k)
            parts.extend(self._full_scan(doc_id, lon, lat, open_idx))
        return pa.concat_tables(parts) if parts else _EMPTY_PARTIAL


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


def _run(geo_ds: ray.data.Dataset, cls, k: int, concurrency: int | None,
         batch_size: int = 16384) -> ray.data.Dataset:
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
        batch_format="pyarrow", batch_size=batch_size, concurrency=concurrency,
    )
    return bucketed_group_apply(partials, ["query_id"],
                                lambda g: _merge_topk(g, k))


def knn_broadcast(geo_ds: ray.data.Dataset, k: int = K, *, concurrency: int | None = None) -> ray.data.Dataset:
    # 16 Ki rows/batch: the O(B*Q) distance slabs stay cache-resident and
    # block count (not batch cost) sets the parallelism
    return _run(geo_ds, _PartialTopK, k, concurrency)


def knn_cellring(geo_ds: ray.data.Dataset, k: int = K, *, concurrency: int | None = None) -> ray.data.Dataset:
    # ring pruning makes the scorer output-bound, not compute-bound: larger
    # batches emit ~4x fewer per-batch partials (k rows/query/batch), which
    # shrinks the merge shuffle proportionally
    return _run(geo_ds, _PartialTopKCellRing, k, concurrency, batch_size=65536)


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
