"""Hierarchical flat-grid cell index (H3/S2 stand-in; no wheels available).

Cells are axis-aligned millidegree grid squares.  ``cell = row * ncols + col``
with ``col = lon_milli // cs`` and ``row = lat_milli // cs`` for a cell size
``cs`` (millidegrees) that must divide 360_000 so columns tile the longitude
range exactly.  The grid is treated as FLAT (no antimeridian wraparound) so
euclidean distance, ring expansion and the SQL oracle all agree.

This replaces the reference's raster tiling / windowing machinery
(`orthority/common.py:568-582` block_windows, `orthority/ortho.py:292-343`
DEM crop-to-grid) as the universal shuffle/partition key — SURVEY.md §7.4.

Resolutions are powers-of-two multiples of the finest size so ``parent`` is a
shift-like integer division, mirroring H3's res hierarchy.
"""

from __future__ import annotations

import numpy as np

# cell sizes in millidegrees, coarse -> fine.  1 deg cells for PIP/tile
# assignment, 0.5 deg for kNN ring expansion.
RES_MILLI = (8000, 2000, 1000, 500)
CELL_SIZE = 1000  # default partition key resolution (1 degree)
KNN_CELL_SIZE = 500

from .hashing import LON_RANGE, LAT_RANGE


def ncols(cs: int = CELL_SIZE) -> int:
    assert LON_RANGE % cs == 0, f"cell size {cs} must divide {LON_RANGE}"
    return LON_RANGE // cs


def nrows(cs: int = CELL_SIZE) -> int:
    return -(-LAT_RANGE // cs)  # ceil; last row may be partial


def encode(lon_milli: np.ndarray, lat_milli: np.ndarray, cs: int = CELL_SIZE) -> np.ndarray:
    """(lon_milli, lat_milli) -> int64 cell id at resolution ``cs``."""
    return (lat_milli // cs) * ncols(cs) + lon_milli // cs


def decode(cell: np.ndarray, cs: int = CELL_SIZE) -> tuple[np.ndarray, np.ndarray]:
    """cell id -> (col, row) grid coordinates."""
    n = ncols(cs)
    return cell % n, cell // n


def parent(cell: np.ndarray, cs_from: int, cs_to: int) -> np.ndarray:
    """Re-encode a cell id at a coarser resolution (cs_to > cs_from)."""
    assert cs_to % cs_from == 0
    col, row = decode(cell, cs_from)
    f = cs_to // cs_from
    return (row // f) * ncols(cs_to) + col // f

def cell_bounds_milli(cell: int, cs: int = CELL_SIZE) -> tuple[int, int, int, int]:
    """(lon_lo, lat_lo, lon_hi, lat_hi) in millidegrees of one cell."""
    n = ncols(cs)
    col, row = cell % n, cell // n
    return col * cs, row * cs, (col + 1) * cs, (row + 1) * cs


def ring(cell: int, r: int, cs: int = CELL_SIZE) -> np.ndarray:
    """Cell ids at exactly Chebyshev distance ``r`` (flat grid, clipped at the
    world edge, NO longitude wraparound — matches the flat euclidean metric)."""
    n, m = ncols(cs), nrows(cs)
    col, row = cell % n, cell // n
    if r == 0:
        return np.array([cell], dtype=np.int64)
    out = []
    for dc in range(-r, r + 1):
        for dr in (-r, r):
            c, rw = col + dc, row + dr
            if 0 <= c < n and 0 <= rw < m:
                out.append(rw * n + c)
    for dr in range(-r + 1, r):
        for dc in (-r, r):
            c, rw = col + dc, row + dr
            if 0 <= c < n and 0 <= rw < m:
                out.append(rw * n + c)
    return np.array(sorted(out), dtype=np.int64)


def disk(cell: int, r: int, cs: int = CELL_SIZE) -> np.ndarray:
    """All cell ids within Chebyshev distance ``r`` (the H3 grid_disk analog)."""
    parts = [ring(cell, i, cs) for i in range(r + 1)]
    return np.unique(np.concatenate(parts))


def ring_min_dist_deg(r: int, cs: int) -> float:
    """Lower bound on euclidean distance (degrees) from any point inside the
    center cell to any point in a cell at Chebyshev ring ``r``.  A point can
    sit on its cell edge, so ring r >= 1 is at least (r-1) cells away."""
    return max(0, r - 1) * (cs / 1000.0)


def covering_cells_bbox(lon_lo: float, lat_lo: float, lon_hi: float, lat_hi: float,
                        cs: int = CELL_SIZE) -> np.ndarray:
    """Cell ids whose squares intersect an axis-aligned bbox in degrees
    (used to pre-index tile polygons for the PIP join)."""
    n, m = ncols(cs), nrows(cs)
    c0 = int(np.clip((lon_lo + 180.0) * 1000 // cs, 0, n - 1))
    c1 = int(np.clip((lon_hi + 180.0) * 1000 // cs, 0, n - 1))
    r0 = int(np.clip((lat_lo + 85.0) * 1000 // cs, 0, m - 1))
    r1 = int(np.clip((lat_hi + 85.0) * 1000 // cs, 0, m - 1))
    cols = np.arange(c0, c1 + 1, dtype=np.int64)
    rows = np.arange(r0, r1 + 1, dtype=np.int64)
    return (rows[:, None] * n + cols[None, :]).ravel()


def sql_cell_expr(cs: int = CELL_SIZE,
                  lon_col: str = "lon_milli", lat_col: str = "lat_milli") -> str:
    """DuckDB SQL computing the identical cell id from millidegree columns."""
    return f"(({lat_col} // {cs}) * {ncols(cs)} + {lon_col} // {cs})"
