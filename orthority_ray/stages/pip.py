"""Partitioned point-in-polygon join: pages ⋈ tile polygons.

Engine analog of the reference's `_mask_dem` rasterized PIP mask
(`orthority/ortho.py:292-343`, fillPoly at 304-317; SURVEY.md §2.5 J4) —
re-expressed for a huge point side and a small polygon side:

- the tile-ring table (64 convex 8-gons, ``core/geometry.py``) is broadcast
  once via ``ray.put`` and loaded per actor in ``__init__`` (the STRtree
  analog: a bbox prefilter + half-plane tests, shapely not available);
- pages stream through a ``map_batches`` actor pool; NO shuffle — with a
  small polygon side a broadcast join beats hash-partitioning every page by
  cell (SURVEY.md §4 "broadcast small sides").  A cell-partitioned variant
  would only win if the polygon table itself were too big to broadcast.

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

from ..core.config import pool
from ..core.geometry import make_tile_rings, points_in_rings, ring_bboxes


class PipJoin:
    def __init__(self, rings_ref):
        self.rings: np.ndarray = ray.get(rings_ref)
        self.bboxes = ring_bboxes(self.rings)

    def __call__(self, batch: pa.Table) -> pa.Table:
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
    from ..sources.pages import _BROADCAST_CACHE

    if rings is None:
        rings = make_tile_rings()
    rings_ref = ray.put(rings)

    def join(batch: pa.Table) -> pa.Table:
        key = "pipjoin:" + rings_ref.hex()
        fn = _BROADCAST_CACHE.get(key)
        if fn is None:
            fn = PipJoin(rings_ref)
            _BROADCAST_CACHE[key] = fn
        return fn(batch)

    return geo_ds.map_batches(join, batch_format="pyarrow", batch_size=32768)
