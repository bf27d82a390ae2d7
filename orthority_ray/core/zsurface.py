"""Z-surface (DEM analog): synthetic sinusoid grid, bilinear sampling,
vertical-datum handling, and vectorized ray-march intersection.

Engine re-derivation of the reference's DEM machinery with no rasterio/GDAL:

- grid: sinusoid with offset 825 m / gain 25 m / 30 m resolution, the same
  constants as the reference fixtures (`tests/conftest.py:45-49, 67-77`);
- sampling: bilinear with NaN outside / at nodata, re-deriving the
  cv2.remap-on-z semantics of `orthority/camera.py:154-156`;
- vertical datums: deterministic geoid stand-ins bounded by the EGM range
  [-106.71, 82.28] m (`orthority/ortho.py:78-83`), plus an MSL-feet unit
  datum; ``z_scale`` between datums is probed at z=0/1 exactly like
  `_reproject_dem` does through the CRS (`orthority/ortho.py:257-265`);
- ray-march: all rays of a batch marched in lockstep down a shared z-ladder
  from max_z to min_z; first surface crossing wins, with linear refinement —
  re-vectorizing the reference's per-call loop (`camera.py:103-165`, M14)
  without changing first-crossing semantics (SURVEY.md §7.5 hard part 2).
"""

from __future__ import annotations

from dataclasses import dataclass

import numpy as np

Z_OFFSET = 825.0  # m — reference fixture `_dem_offset`
Z_GAIN = 25.0  # m — `_dem_gain`
Z_RES = 30.0  # m — `_dem_resolution`
EGM_MIN, EGM_MAX = -106.71, 82.28  # m — `orthority/ortho.py:80`
FT_PER_M = 3.28084


def sinusoid_grid(shape: tuple[int, int] = (160, 220)) -> np.ndarray:
    """Deterministic smooth test surface in [0, 1] -> scaled to metres."""
    h, w = shape
    i, j = np.meshgrid(np.arange(h), np.arange(w), indexing="ij")
    s = 0.5 + 0.25 * np.sin(2 * np.pi * 1.5 * j / w) + 0.25 * np.cos(2 * np.pi * 1.5 * i / h)
    return (Z_OFFSET + Z_GAIN * (2.0 * s - 1.0)).astype(np.float32)


def geoid_offset(x: np.ndarray, y: np.ndarray, flavor: str = "egm96") -> np.ndarray:
    """Deterministic geoid-undulation stand-in, bounded by the EGM range.
    egm2008 differs from egm96 by a small smooth delta (<1 m)."""
    gx = np.sin(np.asarray(x, dtype=np.float64) / 50_000.0)
    gy = np.cos(np.asarray(y, dtype=np.float64) / 50_000.0)
    base = 0.5 * (EGM_MAX + EGM_MIN) + 0.5 * (EGM_MAX - EGM_MIN) * 0.9 * (0.5 * gx + 0.5 * gy)
    if flavor == "egm2008":
        base = base + 0.4 * np.sin(np.asarray(x, dtype=np.float64) / 9_000.0)
    return base


# --- pyproj plug-point (r3 verdict #3) ---------------------------------------
#
# Where a pyproj wheel + PROJ geoid grids exist, datum_shift can route
# through the REAL EGM96/EGM2008 transforms (reference `ortho.py:143-151`,
# `camera.py:460,510`).  This sandbox has neither (BASELINE §3d), so the
# probe fails closed onto the deterministic stand-ins — same API, and the
# tolerance tests in tests/test_zsurface.py are parametrized over BOTH
# paths (the pyproj leg auto-skips when the probe reports unavailable).

_DATUM_EPSG = {"egm96": "EPSG:4326+5773", "egm2008": "EPSG:4326+3855"}
_PYPROJ_PROBE: tuple[str, str] | None = None  # (status, detail), cached


def pyproj_status() -> tuple[str, str]:
    """('ok'|'unavailable'|'no-grids', detail).  'ok' requires both the
    pyproj wheel AND the EGM geoid grids to actually resolve a point —
    pyproj without proj-data silently yields inf, which must fail the
    probe, not corrupt heights downstream."""
    global _PYPROJ_PROBE
    if _PYPROJ_PROBE is not None:
        return _PYPROJ_PROBE
    try:
        import pyproj  # noqa: F401
    except ImportError as e:
        _PYPROJ_PROBE = ("unavailable", str(e))
        return _PYPROJ_PROBE
    try:
        from pyproj import Transformer

        for epsg in _DATUM_EPSG.values():
            # allow_ballpark=False: without the geoid grids PROJ builds a
            # "ballpark vertical transformation" that passes z through
            # UNCHANGED (finite!) — a finiteness check alone would accept
            # it and silently zero every geoid offset (r4 review)
            t = Transformer.from_crs("EPSG:4979", epsg, always_xy=True,
                                     allow_ballpark=False)
            _, _, zz = t.transform(16.0, 48.0, 100.0)
            undulation = 100.0 - zz
            # EGM undulation near 16E/48N is ~44-47 m; accept the broad
            # physical envelope, reject inf/NaN and pass-through (~0)
            if not np.isfinite(zz) or not (1.0 < abs(undulation) < 120.0):
                _PYPROJ_PROBE = ("no-grids",
                                 f"{epsg} probe undulation {undulation!r}")
                return _PYPROJ_PROBE
        _PYPROJ_PROBE = ("ok", pyproj.__version__)
    except Exception as e:  # grid download disabled, CRS db missing, ...
        _PYPROJ_PROBE = ("no-grids", f"{type(e).__name__}: {e}")
    return _PYPROJ_PROBE


def _resolve_datum_mode(mode: str | None) -> str:
    """None -> $ORTHORITY_RAY_DATUM -> 'auto'; 'auto' -> 'pyproj' iff the
    probe is ok; explicit 'pyproj' without grids raises LOUDLY."""
    import os

    mode = mode or os.environ.get("ORTHORITY_RAY_DATUM", "auto")
    if mode == "auto":
        return "pyproj" if pyproj_status()[0] == "ok" else "standin"
    if mode == "pyproj" and pyproj_status()[0] != "ok":
        raise RuntimeError(
            f"ORTHORITY_RAY_DATUM=pyproj but probe says {pyproj_status()}")
    if mode not in ("standin", "pyproj"):
        raise ValueError(f"unknown datum mode {mode!r}")
    return mode


def _pyproj_geoid_offset(x, y, flavor: str) -> np.ndarray:
    """Real geoid undulation N(x, y) via pyproj: ellipsoidal z=0 expressed
    in the orthometric CRS gives -N, so N = -transform_z.  x/y here are the
    engine's planar metres — interpreted as lon/lat degrees modulo a fixed
    deterministic wrap (the engine's synthetic world has no true CRS; real
    deployments pass genuine lon/lat)."""
    from pyproj import Transformer

    lon = np.mod(np.asarray(x, dtype=np.float64) / 1_000.0 + 180.0, 360.0) - 180.0
    lat = np.mod(np.asarray(y, dtype=np.float64) / 1_000.0 + 90.0, 180.0) - 90.0
    # allow_ballpark=False here too, not just in the probe: if the geoid
    # grid becomes unreadable AFTER pyproj_status cached 'ok', PROJ would
    # otherwise silently fall back to the ballpark pass-through (offset
    # ~0 everywhere) — raise instead (r4 review)
    t = Transformer.from_crs("EPSG:4979", _DATUM_EPSG[flavor],
                             always_xy=True, allow_ballpark=False)
    _, _, zz = t.transform(lon, lat, np.zeros_like(lon))
    return -np.asarray(zz, dtype=np.float64)


def datum_shift(x, y, z, src: str, dst: str, mode: str | None = None):
    """Convert heights between vertical datums.

    Datums: 'ellipsoid' (WGS84-like heights), 'egm96', 'egm2008' (geoid
    stand-ins or real EGM grids when pyproj+proj-data are present — see
    pyproj_status), 'msl_ft' (egm96 surface in feet).  Orthometric =
    ellipsoidal - geoid offset.
    """
    z = np.asarray(z, dtype=np.float64)
    offset = (_pyproj_geoid_offset
              if _resolve_datum_mode(mode) == "pyproj" else geoid_offset)

    def to_ellipsoid(zv, datum):
        if datum == "ellipsoid":
            return zv
        if datum in ("egm96", "egm2008"):
            return zv + offset(x, y, datum)
        if datum == "msl_ft":
            return zv / FT_PER_M + offset(x, y, "egm96")
        raise ValueError(f"unknown vertical datum {datum!r}")

    def from_ellipsoid(zv, datum):
        if datum == "ellipsoid":
            return zv
        if datum in ("egm96", "egm2008"):
            return zv - offset(x, y, datum)
        if datum == "msl_ft":
            return (zv - offset(x, y, "egm96")) * FT_PER_M
        raise ValueError(f"unknown vertical datum {datum!r}")

    return from_ellipsoid(to_ellipsoid(z, src), dst)


def z_unit_scale(src: str, dst: str) -> float:
    """Linear unit scale between two datums, probed at z=0 and z=1 at a fixed
    location — the engine analog of the reference's CRS probe
    (`orthority/ortho.py:143-151`)."""
    x0 = np.array([0.0])
    z0 = datum_shift(x0, x0, np.array([0.0]), src, dst)[0]
    z1 = datum_shift(x0, x0, np.array([1.0]), src, dst)[0]
    return float(z1 - z0)


@dataclass
class ZSurface:
    """A z grid + affine transform (pixel-center convention) + datum label."""

    z: np.ndarray  # (H, W) float32, NaN = nodata
    x0: float  # world x of the grid origin (UL corner)
    y0: float  # world y of the grid origin (UL corner)
    res: float = Z_RES
    datum: str = "ellipsoid"

    @classmethod
    def synthetic(cls, shape=(160, 220), x0: float = 16_500.0, y0: float = 33_500.0,
                  res: float = Z_RES, datum: str = "ellipsoid", partial: bool = False):
        z = sinusoid_grid(shape)
        if partial:  # invalid above the anti-diagonal (ref `conftest.py:635-655` analog)
            h, w = shape
            ii, jj = np.meshgrid(np.arange(h), np.arange(w), indexing="ij")
            z = np.where(jj / w + ii / h < 1.0, z, np.nan).astype(np.float32)
        return cls(z=z, x0=x0, y0=y0, res=res, datum=datum)

    def with_datum(self, datum: str, mode: str | None = None) -> "ZSurface":
        """Re-express the surface's heights in another vertical datum
        (mode: None -> $ORTHORITY_RAY_DATUM/auto, 'standin', 'pyproj')."""
        h, w = self.z.shape
        ii, jj = np.meshgrid(np.arange(h), np.arange(w), indexing="ij")
        x = self.x0 + (jj + 0.5) * self.res
        y = self.y0 - (ii + 0.5) * self.res
        z = datum_shift(x, y, self.z.astype(np.float64), self.datum, datum,
                        mode=mode)
        return ZSurface(z=z.astype(np.float32), x0=self.x0, y0=self.y0, res=self.res, datum=datum)

    # --- sampling ----------------------------------------------------------

    def sample(self, x, y) -> np.ndarray:
        """Bilinear sample at world (x, y); NaN outside the grid or touching
        nodata (matches cv2.remap border semantics used on the reference's
        z-surface, `camera.py:154-156`)."""
        x = np.asarray(x, dtype=np.float64)
        y = np.asarray(y, dtype=np.float64)
        cj = (x - self.x0) / self.res - 0.5  # fractional col (pixel centers)
        ci = (self.y0 - y) / self.res - 0.5
        h, w = self.z.shape
        j0 = np.floor(cj).astype(np.int64)
        i0 = np.floor(ci).astype(np.int64)
        fj = cj - j0
        fi = ci - i0
        valid = (j0 >= 0) & (j0 < w - 1) & (i0 >= 0) & (i0 < h - 1)
        j0c = np.clip(j0, 0, w - 2)
        i0c = np.clip(i0, 0, h - 2)
        z = self.z.astype(np.float64)
        z00 = z[i0c, j0c]
        z01 = z[i0c, j0c + 1]
        z10 = z[i0c + 1, j0c]
        z11 = z[i0c + 1, j0c + 1]
        out = (
            z00 * (1 - fi) * (1 - fj)
            + z01 * (1 - fi) * fj
            + z10 * fi * (1 - fj)
            + z11 * fi * fj
        )
        return np.where(valid, out, np.nan)

    def min_max(self) -> tuple[float, float]:
        return float(np.nanmin(self.z)), float(np.nanmax(self.z))

    # --- ray-march intersection (M14) --------------------------------------

    def raymarch(self, camera, j, i, n_steps: int = 16, refine: int = 8):
        """First intersection of the pixel rays with the surface.

        Two phases (round-2 speedup — same first-crossing semantics, ~3x
        fewer surface evaluations than the round-1 64-step linear ladder):

        1. COARSE lockstep ladder (``n_steps`` levels zmax -> zmin): every
           ray's first bracket [z_hi, z_lo] with a sign change is recorded;
        2. BISECTION (``refine`` rounds) of the brackets, all crossed rays
           in lockstep, finishing with one linear interpolation — accuracy
           (zmax - zmin) / n_steps / 2^refine, far below the old ladder's.

        Rays that never cross resolve to the min-z point (the reference's
        fallback, `camera.py:157-163`).  A crossing strictly inside a coarse
        interval that re-emerges before its lower edge can be missed — the
        same trade every stepped DEM intersector makes; n_steps bounds it.
        """
        zmin, zmax = self.min_max()
        ladder = np.linspace(zmax, zmin, max(2, n_steps))
        j = np.asarray(j, dtype=np.float64)
        i = np.asarray(i, dtype=np.float64)
        n = j.shape[0]
        z_hi = np.empty(n)
        z_lo = np.empty(n)
        d_hi = np.empty(n)
        d_lo = np.empty(n)
        done = np.zeros(n, dtype=bool)
        prev_diff = None
        prev_z = None
        for zk in ladder:
            x, y, _ = camera.pixel_to_world_z(j, i, zk)
            diff = zk - self.sample(x, y)  # >0: ray point above surface
            finite = np.isfinite(diff)
            if prev_diff is not None:
                crossing = (~done) & (prev_diff > 0) & finite & (diff <= 0)
                if crossing.any():
                    z_hi[crossing] = prev_z[crossing]
                    z_lo[crossing] = zk
                    d_hi[crossing] = prev_diff[crossing]
                    d_lo[crossing] = diff[crossing]
                    done |= crossing
                # keep the last FINITE sample per ray: a nodata/off-grid rung
                # must not overwrite prev_diff with NaN, or a ray whose ladder
                # jumps the nodata margin loses its bracket and silently falls
                # back to the min-z point (same hardening the refine phase has)
                upd = (~done) & finite
                prev_diff = np.where(upd, diff, prev_diff)
                prev_z = np.where(upd, zk, prev_z)
            else:
                prev_diff = diff
                prev_z = np.full(n, zk)
            if done.all():
                break
        hit_z = np.full(n, zmin)  # min-z fallback for non-crossing rays
        idx = np.nonzero(done)[0]
        if idx.size:
            jc, ic = j[idx], i[idx]
            zh, zl = z_hi[idx], z_lo[idx]
            dh, dl = d_hi[idx], d_lo[idx]
            for _ in range(refine):
                zm = 0.5 * (zh + zl)
                x, y, _ = camera.pixel_to_world_z(jc, ic, zm)
                dm = zm - self.sample(x, y)
                below = np.isfinite(dm) & (dm <= 0)
                zl = np.where(below, zm, zl)
                dl = np.where(below, dm, dl)
                # NaN midpoint (nodata / off-grid at this z): narrow the
                # high side but KEEP the last finite dh — storing the NaN
                # poisoned the final interpolation for rays whose coarse
                # bracket was valid
                zh = np.where(below, zh, zm)
                dh = np.where(below | ~np.isfinite(dm), dh, dm)
            denom = dh - dl
            frac = np.where(denom != 0, dh / denom, 0.0)
            hit_z[idx] = zh + (zl - zh) * frac
        x, y, zz = camera.pixel_to_world_z(j, i, hit_z)
        return x, y, zz
