"""Scalar / small-array utility functions (SURVEY.md §2.2 M21-M26).

Vectorized re-derivations of the reference's helpers in
`orthority/common.py` and `orthority/exif.py`, usable both driver-side and
inside ``map_batches``.
"""

from __future__ import annotations

import numpy as np

# nodata sentinel per dtype (`orthority/common.py:58-63`)
NODATA_BY_DTYPE = {
    "uint8": 0,
    "uint16": 0,
    "int16": np.iinfo("int16").min,
    "float32": float("nan"),
    "float64": float("nan"),
}


def nan_equals(a, b) -> np.ndarray:
    """NaN-aware elementwise equality (`orthority/common.py:92-94`)."""
    a = np.asarray(a)
    b = np.asarray(b)
    return (a == b) | (np.isnan(a) & np.isnan(b))


def convert_array_dtype(arr: np.ndarray, dtype: str) -> np.ndarray:
    """Round + clip + cast with overflow-safe promotion
    (`orthority/common.py:501-529` semantics): float -> int rounds to
    nearest; values outside the target range clip; NaN maps to the dtype's
    nodata sentinel for integer targets."""
    src = np.asarray(arr)
    dt = np.dtype(dtype)
    if np.issubdtype(dt, np.integer):
        info = np.iinfo(dt)
        if np.issubdtype(src.dtype, np.floating):
            # sentinel only consulted for float sources; targets outside the
            # table default to 0 (unsigned) / min (signed), matching the
            # listed entries (r3 review: every int target not in the table
            # raised KeyError, even for NaN-free input)
            sentinel = NODATA_BY_DTYPE.get(
                dt.name, 0 if info.min == 0 else info.min)
            out = np.where(np.isnan(src), float(sentinel), src)
            out = np.clip(np.rint(out), info.min, info.max)
            return out.astype(dt)
        return np.clip(src, info.min, info.max).astype(dt)
    return src.astype(dt)


def expand_window_to_grid(off: float, size: float, grid: int = 1) -> tuple[int, int]:
    """Snap a fractional (offset, size) window outward to integer grid
    multiples (`orthority/common.py:82-89` semantics)."""
    lo = int(np.floor(off / grid)) * grid
    hi = int(np.ceil((off + size) / grid)) * grid
    return lo, hi - lo


def lonlat_to_world_xy(lon: float, lat: float) -> tuple[float, float]:
    """The engine's deterministic equirect placement for lat/lon parameter
    sources: metres east of lon=-180 / north of lat=-85.  Shared by the CSV
    and OpenSfM readers (the formula was inlined four times — r3 review)."""
    return (lon + 180.0) * 111_320.0, (lat + 85.0) * 111_320.0


def utm_crs_from_latlon(lat: float, lon: float) -> str:
    """lat/lon -> UTM EPSG code string (`orthority/common.py:156-161`)."""
    zone = int(np.floor((lon + 180) / 6) % 60) + 1
    epsg = (32600 if lat >= 0 else 32700) + zone
    return f"EPSG:{epsg}"


def dms_to_decimal(dms, ref: str | None = None) -> float:
    """(deg, min, sec) + hemisphere ref -> signed decimal degrees
    (`orthority/exif.py:301-330` semantics)."""
    d, m, s = (float(v) for v in dms)
    val = d + m / 60.0 + s / 3600.0
    if ref and ref.upper() in ("S", "W"):
        val = -val
    return val


def gsd_estimate(pixel_ring: np.ndarray, world_ring: np.ndarray) -> float:
    """Ground-sample-distance estimate: sqrt(world area / pixel area) over
    matching boundary rings (`orthority/ortho.py:207-232` shoelace method)."""
    from ..core.geometry import shoelace_area

    pa_ = abs(shoelace_area(pixel_ring))
    wa = abs(shoelace_area(world_ring))
    return float(np.sqrt(wa / pa_)) if pa_ > 0 else float("nan")
