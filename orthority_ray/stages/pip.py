"""Partitioned point-in-polygon join: pages ⋈ tile polygons.

Engine analog of the reference's `_mask_dem` rasterized PIP mask
(`orthority/ortho.py:292-343`, fillPoly at 304-317; SURVEY.md §2.5 J4) —
re-expressed for a huge point side and a small polygon side:

- the tile-ring table (64 convex 8-gons, ``core/geometry.py``) is broadcast
  once via ``ray.put`` and cached per WORKER PROCESS (stateless tasks via
  ``cached_stage`` — an actor pool's process spawns would dominate this
  light stage; the STRtree analog is a bbox prefilter + half-plane tests,
  shapely not available);
- pages stream through ``map_batches``; NO shuffle — with a small polygon
  side a broadcast join beats hash-partitioning every page by cell
  (SURVEY.md §4 "broadcast small sides").  ``pip_join_cell_indexed`` is
  the large-tile-table scale path (cell->tiles candidate index).

Output: one row per (page, containing tile) pair — pages in several
overlapping tiles emit several rows; pages in none emit none (inner join).
Membership is IEEE-exact against the DuckDB oracle (see
``core/geometry.sql_pip_predicate``).
"""

from __future__ import annotations

import numpy as np
import pyarrow as pa
import ray
import ray.data

from ..core.geometry import make_tile_rings, points_in_rings, ring_bboxes


def build_cell_index(rings: np.ndarray) -> dict[int, np.ndarray]:
    """cell id -> candidate tile ids (tiles whose bbox intersects the cell) —
    the STRtree/H3-covering analog (FIXTURES.md §4 ``cells``).  Lookup is
    O(candidates-per-cell) instead of O(T), which is what makes the join
    viable when the tile table grows to thousands of polygons."""
    from ..core.cells import CELL_SIZE, covering_cells_bbox

    bboxes = ring_bboxes(rings)
    index: dict[int, list[int]] = {}
    for t in range(rings.shape[0]):
        for c in covering_cells_bbox(*bboxes[t], CELL_SIZE):
            index.setdefault(int(c), []).append(t)
    return {c: np.array(ts, dtype=np.int64) for c, ts in index.items()}


class PipJoin:
    def __init__(self, rings_ref, use_cell_index: bool = False):
        self.rings: np.ndarray = ray.get(rings_ref)
        self.bboxes = ring_bboxes(self.rings)
        self.cell_index = build_cell_index(self.rings) if use_cell_index else None

    def _join_cell_indexed(self, batch: pa.Table) -> pa.Table:
        """Per-cell-shard PIP: group the batch's points by cell, test each
        shard only against that cell's candidate tiles."""
        px = batch["lon"].to_numpy(zero_copy_only=False)
        py = batch["lat"].to_numpy(zero_copy_only=False)
        cell = batch["cell"].to_numpy(zero_copy_only=False)
        doc_id = batch["doc_id"].to_numpy(zero_copy_only=False)
        order = np.argsort(cell, kind="stable")
        cs, starts = np.unique(cell[order], return_index=True)
        ends = np.append(starts[1:], cell.shape[0])
        out_doc, out_tile, out_cell = [], [], []
        for c, s, e in zip(cs, starts, ends):
            cand = self.cell_index.get(int(c))
            if cand is None:
                continue
            sel = order[s:e]
            mat = points_in_rings(px[sel], py[sel], self.rings[cand],
                                  self.bboxes[cand])
            pt_i, t_i = np.nonzero(mat)
            out_doc.append(doc_id[sel][pt_i])
            out_tile.append(cand[t_i])
            out_cell.append(np.full(pt_i.shape[0], c, dtype=np.int64))
        if not out_doc:
            return pa.table({"doc_id": pa.array([], pa.int64()),
                             "tile_id": pa.array([], pa.int64()),
                             "cell": pa.array([], pa.int64())})
        return pa.table(
            {
                "doc_id": pa.array(np.concatenate(out_doc)),
                "tile_id": pa.array(np.concatenate(out_tile)),
                "cell": pa.array(np.concatenate(out_cell)),
            }
        )

    def __call__(self, batch: pa.Table) -> pa.Table:
        if self.cell_index is not None:
            return self._join_cell_indexed(batch)
        px = batch["lon"].to_numpy(zero_copy_only=False)
        py = batch["lat"].to_numpy(zero_copy_only=False)
        mat = points_in_rings(px, py, self.rings, self.bboxes)
        pt_idx, tile_idx = np.nonzero(mat)
        doc_id = batch["doc_id"].to_numpy(zero_copy_only=False)[pt_idx]
        cell = batch["cell"].to_numpy(zero_copy_only=False)[pt_idx]
        return pa.table(
            {
                "doc_id": pa.array(doc_id),
                "tile_id": pa.array(tile_idx.astype(np.int64)),
                "cell": pa.array(cell),
            }
        )


def pip_join(geo_ds: ray.data.Dataset, rings: np.ndarray | None = None,
             *, concurrency: int | None = None) -> ray.data.Dataset:
    """geo_ds must carry lon/lat/doc_id/cell columns (see stages/geocode).

    Runs as STATELESS tasks with the (tiny) ring table cached per worker —
    an actor pool's process spawns would dominate the stage (see
    sources/pages.cached_get); the actor-pool pattern is reserved for the
    genuinely heavy state (DemGeocoder's grid, text models)."""
    from ..core.config import cached_stage

    if rings is None:
        rings = make_tile_rings()
    rings_ref = ray.put(rings)

    return geo_ds.map_batches(
        cached_stage(PipJoin, "pipjoin:" + rings_ref.hex(), rings_ref),
        batch_format="pyarrow", batch_size=32768, concurrency=concurrency,
    )


def pip_join_cell_indexed(geo_ds: ray.data.Dataset, rings: np.ndarray | None = None,
                          *, concurrency: int | None = None) -> ray.data.Dataset:
    """Cell-sharded PIP join (the large-tile-table scale path): candidate
    tiles per point come from the broadcast cell->tiles index instead of a
    scan over every tile.  Identical output to :func:`pip_join`."""
    from ..core.config import cached_stage

    if rings is None:
        rings = make_tile_rings()
    rings_ref = ray.put(rings)

    return geo_ds.map_batches(
        cached_stage(PipJoin, "pipjoinc:" + rings_ref.hex(), rings_ref,
                     use_cell_index=True),
        batch_format="pyarrow", batch_size=32768, concurrency=concurrency,
    )
