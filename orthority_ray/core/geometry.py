"""Vectorized planar geometry kernels.

Re-derives the reference's boundary-polygon / rasterized point-in-polygon
semantics (`orthority/camera.py:200-285` pixel/world_boundary,
`orthority/ortho.py:292-343` _mask_dem's cv2.fillPoly PIP mask) as pure
IEEE-754 double arithmetic that a DuckDB oracle can replicate bit-for-bit:

- tiles are convex CCW 8-gons ("boundary rings" in the reference's sense);
- membership is the half-plane test  cross = (x2-x1)*(py-y1)-(y2-y1)*(px-x1)
  >= 0 for every edge (points exactly on an edge are INSIDE);
- the identical expression tree is emitted as SQL by ``sql_pip_predicate``.

Tile polygons are generated deterministically (no RNG) from the tile id; the
same Python-computed float64 vertices feed both the engine (broadcast numpy
array) and the oracle (repr() literals, which round-trip doubles exactly).
"""

from __future__ import annotations

import math

import numpy as np

from . import hashing as H
from .hashing import LAT_RANGE, LON_RANGE, SITE_LAT_MULT, SITE_LON_MULT

N_TILES = 64
N_VERTS = 8


def shoelace_area(xy: np.ndarray) -> float:
    """Signed area of a ring, (N,2) -> float.  Mirrors the reference's GSD
    area computation (`orthority/ortho.py:207-232`)."""
    x, y = xy[:, 0], xy[:, 1]
    return 0.5 * float(np.sum(x * np.roll(y, -1) - np.roll(x, -1) * y))


def make_tile_rings(n_tiles: int = N_TILES) -> np.ndarray:
    """(n_tiles, 8, 2) float64 CCW rings.  Tiles 0..9 are centered on the hot
    geocode sites (so the PIP join has realistic selectivity + skew); the rest
    are spread deterministically.  Radii 1.5-3 degrees, per-tile rotation."""
    rings = np.empty((n_tiles, N_VERTS, 2), dtype=np.float64)
    # hot-site centers come from the ONE site-center definition — an
    # inline copy here would silently stop covering the hot sites if the
    # geocoder's formula ever changed (r3 review)
    site_lon_m, site_lat_m = H.site_center_milli(np.arange(min(10, n_tiles)))
    for t in range(n_tiles):
        if t < 10:
            cx = float(site_lon_m[t]) / 1000.0 - 180.0
            cy = float(site_lat_m[t]) / 1000.0 - 85.0
        else:
            cx = ((t * 48271) % 340000 + 10000) / 1000.0 - 180.0
            cy = ((t * 69621) % 150000 + 10000) / 1000.0 - 85.0
        rad = (1500 + (t * 997) % 1500) / 1000.0
        rot = 2.0 * math.pi * ((t * 31) % 7) / (7.0 * N_VERTS)
        for j in range(N_VERTS):
            th = 2.0 * math.pi * j / N_VERTS + rot
            rings[t, j, 0] = cx + rad * math.cos(th)
            rings[t, j, 1] = cy + rad * math.sin(th)
    return rings


def ring_bboxes(rings: np.ndarray) -> np.ndarray:
    """(T, 4) [xmin, ymin, xmax, ymax] per ring."""
    return np.stack([rings[:, :, 0].min(1), rings[:, :, 1].min(1),
                     rings[:, :, 0].max(1), rings[:, :, 1].max(1)], axis=1)


def points_in_ring(px: np.ndarray, py: np.ndarray, ring: np.ndarray) -> np.ndarray:
    """Vectorized convex-CCW-ring containment for N points against ONE ring.

    Uses exactly ``(x2-x1)*(py-y1) - (y2-y1)*(px-x1) >= 0`` per edge — the
    same expression (same association order) as the generated oracle SQL, so
    float results match bit-for-bit.
    """
    inside = np.ones(px.shape[0], dtype=bool)
    n = ring.shape[0]
    for j in range(n):
        x1, y1 = ring[j, 0], ring[j, 1]
        x2, y2 = ring[(j + 1) % n, 0], ring[(j + 1) % n, 1]
        cross = (x2 - x1) * (py - y1) - (y2 - y1) * (px - x1)
        inside &= cross >= 0.0
    return inside


def points_in_rings(px: np.ndarray, py: np.ndarray, rings: np.ndarray,
                    bboxes: np.ndarray | None = None) -> np.ndarray:
    """(N, T) bool membership matrix, bbox-prefiltered.

    For each tile, only points inside the tile bbox are half-plane tested —
    the bbox filter can only exclude strictly-outside points so it never
    changes the result.
    """
    npt, nt = px.shape[0], rings.shape[0]
    if bboxes is None:
        bboxes = ring_bboxes(rings)
    out = np.zeros((npt, nt), dtype=bool)
    for t in range(nt):
        xmin, ymin, xmax, ymax = bboxes[t]
        cand = (px >= xmin) & (px <= xmax) & (py >= ymin) & (py <= ymax)
        idx = np.nonzero(cand)[0]
        if idx.size:
            out[idx, t] = points_in_ring(px[idx], py[idx], rings[t])
    return out


def sql_pip_predicate(ring: np.ndarray, px: str = "lon", py: str = "lat") -> str:
    """DuckDB predicate replicating ``points_in_ring`` for one ring, with the
    vertex doubles embedded as exact repr() literals."""
    terms = []
    n = ring.shape[0]
    for j in range(n):
        # float() first: repr(np.float64) under numpy >= 2.0 renders
        # 'np.float64(...)', which is not SQL (r3 review; pyproject allows
        # any numpy >= 1.24).  python-float repr stays exact (shortest
        # roundtrip representation).
        x1, y1 = float(ring[j][0]), float(ring[j][1])
        x2, y2 = float(ring[(j + 1) % n][0]), float(ring[(j + 1) % n][1])
        terms.append(
            f"(({x2!r} - {x1!r}) * ({py} - {y1!r}) - ({y2!r} - {y1!r}) * ({px} - {x1!r})) >= 0.0"
        )
    return "(" + " AND ".join(terms) + ")"
