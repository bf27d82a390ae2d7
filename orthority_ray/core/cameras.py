"""Vectorized camera models: pinhole / Brown / OpenCV / fisheye frames + RPC.

Batch-column re-derivations of the reference's projection semantics
(`orthority/camera.py`; SURVEY.md §2.2 M1-M10, M3-M4) from the public model
definitions (OpenCV calib3d docs, OpenSfM bundle formulas, the GeoTIFF RPC
spec) — no cv2 / GDAL:

- forward:  world (x, y, z) -> pixel (j, i)        [``world_to_pixel``]
- inverse:  pixel (j, i) + z -> world (x, y, z)    [``pixel_to_world_z``]

All methods take/return 1-D float64 numpy arrays (the columns of an Arrow
batch) instead of the reference's 2xN/3xN stacked arrays — that is the whole
point of the graft: these run unchanged inside ``map_batches``.

Conventions match the reference so its parameter files keep their meaning:
  K from focal/sensor/im_size + normalised principal-point offsets
  (`camera.py:660-694`), exterior R = opk_to_rotation(opk) @ diag(1,-1,-1)
  (PATB -> CV, `camera.py:696-716`), pixel-center coordinates.

Iterative inverses replace cv2.undistortPoints / GDAL RPCTransformer:
fixed-point (Brown/OpenCV), Newton on the theta-polynomial (fisheye), and
2-D Newton on the rational polynomial (RPC).  Round-trip accuracy is held to
the reference's own test tolerance (0.1 px, `tests/test_camera.py:199-200`)
and asserted much tighter in tests/test_cameras.py.
"""

from __future__ import annotations

from dataclasses import dataclass, field

import numpy as np

from .rotations import CV_FLIP, opk_to_rotation

_CAMERA_REGISTRY: dict[str, type] = {}


def register_camera(cam_type: str):
    """`create_camera`-style registry (`orthority/camera.py:1491-1511` analog)."""

    def deco(cls):
        _CAMERA_REGISTRY[cam_type] = cls
        cls.cam_type = cam_type
        return cls

    return deco


def create_camera(cam_type: str, **kwargs):
    try:
        cls = _CAMERA_REGISTRY[cam_type]
    except KeyError:
        raise ValueError(f"unknown cam_type {cam_type!r}; known: {sorted(_CAMERA_REGISTRY)}")
    return cls(**kwargs)


def intrinsic_matrix(im_size, focal_len, sensor_size=None, cx=0.0, cy=0.0) -> np.ndarray:
    """K for the given interior parameters (reference conventions,
    `camera.py:660-694`): focal in sensor units (or normalised if sensor_size
    is None), principal point at image centre + normalised offsets scaled by
    max image dimension."""
    w, h = im_size
    if sensor_size is None:
        # reference semantics (`camera.py:675-681`): focal normalised by
        # sensor WIDTH, square pixels — `(focal_len * im_size[0]) * ones(2)`.
        # An (fx, fy) tuple broadcasts elementwise (both scaled by w), it is
        # not collapsed to its first element.
        f = np.broadcast_to(np.ravel(np.asarray(focal_len, dtype=np.float64)), (2,))
        fx, fy = f[0] * w, f[1] * w
    else:
        f = np.broadcast_to(np.ravel(np.asarray(focal_len, dtype=np.float64)), (2,))
        fx = f[0] * w / sensor_size[0]
        fy = f[1] * h / sensor_size[1]
    c_x = (w - 1) / 2.0 + max(w, h) * cx
    c_y = (h - 1) / 2.0 + max(w, h) * cy
    return np.array([[fx, 0.0, c_x], [0.0, fy, c_y], [0.0, 0.0, 1.0]])


@dataclass
class FrameCamera:
    """Pinhole frame camera (no distortion); base for distorted models."""

    im_size: tuple[int, int]
    focal_len: float | tuple[float, float]
    sensor_size: tuple[float, float] | None = None
    cx: float = 0.0
    cy: float = 0.0
    xyz: tuple[float, float, float] | None = None
    opk: tuple[float, float, float] | None = None
    distort: bool = True
    K: np.ndarray = field(init=False)
    R: np.ndarray = field(init=False, default=None)
    T: np.ndarray = field(init=False, default=None)

    def __post_init__(self):
        self.K = intrinsic_matrix(self.im_size, self.focal_len, self.sensor_size, self.cx, self.cy)
        if self.xyz is not None and self.opk is not None:
            self.update(self.xyz, self.opk)

    def update(self, xyz, opk) -> None:
        """Set/replace exterior parameters (the per-image update of the
        reference's camera bank, `orthority/factory.py:227-232`)."""
        self.T = np.asarray(xyz, dtype=np.float64).reshape(3)
        self.R = opk_to_rotation(opk) @ CV_FLIP

    # --- distortion hooks (identity for pinhole) ---------------------------

    def _distort_norm(self, xn, yn):
        return xn, yn

    def _undistort_norm(self, xd, yd):
        return xd, yd

    # --- projections -------------------------------------------------------

    def world_to_pixel(self, x, y, z, distort: bool | None = None):
        """(x, y, z) world -> (j, i) pixel.  NaN passes through."""
        distort = self.distort if distort is None else distort
        Rt = self.R.T
        dx, dy, dz = x - self.T[0], y - self.T[1], z - self.T[2]
        xc = Rt[0, 0] * dx + Rt[0, 1] * dy + Rt[0, 2] * dz
        yc = Rt[1, 0] * dx + Rt[1, 1] * dy + Rt[1, 2] * dz
        zc = Rt[2, 0] * dx + Rt[2, 1] * dy + Rt[2, 2] * dz
        with np.errstate(invalid="ignore", divide="ignore"):
            xn, yn = xc / zc, yc / zc
        if distort:
            xn, yn = self._distort_norm(xn, yn)
        j = self.K[0, 0] * xn + self.K[0, 2]
        i = self.K[1, 1] * yn + self.K[1, 2]
        return j, i

    def pixel_to_world_z(self, j, i, z, distort: bool | None = None):
        """(j, i) pixel + z -> (x, y, z) world (the geocode primitive,
        `camera.py:843-880` semantics).  Broadcasts scalar z over pixels."""
        distort = self.distort if distort is None else distort
        xn = (np.asarray(j, dtype=np.float64) - self.K[0, 2]) / self.K[0, 0]
        yn = (np.asarray(i, dtype=np.float64) - self.K[1, 2]) / self.K[1, 1]
        if distort:
            xn, yn = self._undistort_norm(xn, yn)
        R = self.R
        rx = R[0, 0] * xn + R[0, 1] * yn + R[0, 2]
        ry = R[1, 0] * xn + R[1, 1] * yn + R[1, 2]
        rz = R[2, 0] * xn + R[2, 1] * yn + R[2, 2]
        with np.errstate(invalid="ignore", divide="ignore"):
            lam = (np.asarray(z, dtype=np.float64) - self.T[2]) / rz
        x = self.T[0] + lam * rx
        y = self.T[1] + lam * ry
        zz = np.broadcast_to(np.asarray(z, dtype=np.float64), x.shape).copy()
        return x, y, zz

    def distort_pixel(self, j, i, clip: bool = False):
        """Undistorted -> distorted pixel coords (`camera.py:882-894`)."""
        xn = (np.asarray(j, dtype=np.float64) - self.K[0, 2]) / self.K[0, 0]
        yn = (np.asarray(i, dtype=np.float64) - self.K[1, 2]) / self.K[1, 1]
        xd, yd = self._distort_norm(xn, yn)
        jd = self.K[0, 0] * xd + self.K[0, 2]
        id_ = self.K[1, 1] * yd + self.K[1, 2]
        if clip:
            jd = np.clip(jd, 0, self.im_size[0] - 1)
            id_ = np.clip(id_, 0, self.im_size[1] - 1)
        return jd, id_

    def undistort_pixel(self, j, i, clip: bool = False):
        xn = (np.asarray(j, dtype=np.float64) - self.K[0, 2]) / self.K[0, 0]
        yn = (np.asarray(i, dtype=np.float64) - self.K[1, 2]) / self.K[1, 1]
        xu, yu = self._undistort_norm(xn, yn)
        ju = self.K[0, 0] * xu + self.K[0, 2]
        iu = self.K[1, 1] * yu + self.K[1, 2]
        if clip:
            ju = np.clip(ju, 0, self.im_size[0] - 1)
            iu = np.clip(iu, 0, self.im_size[1] - 1)
        return ju, iu

    def pixel_boundary(self, num_pts: int = 8):
        """(j, i) ring on the image edge (`camera.py:200-243` semantics):
        corners + mid-edges for the default num_pts=8; other counts space
        points evenly along the perimeter starting at (0, 0) — previously
        the parameter was silently ignored and 8 points always returned."""
        w, h = self.im_size[0] - 1, self.im_size[1] - 1
        if num_pts == 8:
            j = np.array([0, w / 2, w, w, w, w / 2, 0, 0], dtype=np.float64)
            i = np.array([0, 0, 0, h / 2, h, h, h, h / 2], dtype=np.float64)
            return j, i
        per = 2.0 * (w + h)
        t = np.arange(num_pts, dtype=np.float64) * per / num_pts
        j = np.empty(num_pts)
        i = np.empty(num_pts)
        for n, d in enumerate(t):
            if d < w:  # top edge, left -> right
                j[n], i[n] = d, 0.0
            elif d < w + h:  # right edge, top -> bottom
                j[n], i[n] = w, d - w
            elif d < 2 * w + h:  # bottom edge, right -> left
                j[n], i[n] = w - (d - w - h), h
            else:  # left edge, bottom -> top
                j[n], i[n] = 0.0, h - (d - 2 * w - h)
        return j, i

    def world_boundary(self, z: float, num_pts: int = 8):
        """Boundary ring projected to the z plane (`camera.py:245-285`)."""
        j, i = self.pixel_boundary(num_pts)
        return self.pixel_to_world_z(j, i, z)

    def horizon_fov(self) -> bool:
        """True if the FOV touches/exceeds the horizon (`camera.py:722-734`).

        Boundary ray directions are the UNDISTORTED normalized coordinates
        (the same rays ``pixel_to_world_z`` casts) — using raw (j-c)/f under
        a distorted model mis-estimated corner ray angles (fisheye
        compresses corners) and let horizon-crossing cameras through."""
        j, i = self.pixel_boundary()
        xn = (j - self.K[0, 2]) / self.K[0, 0]
        yn = (i - self.K[1, 2]) / self.K[1, 1]
        xu, yu = self._undistort_norm(xn, yn)
        rz = self.R[2, 0] * xu + self.R[2, 1] * yu + self.R[2, 2]
        return bool(np.any(rz >= 0))


@register_camera("pinhole")
class PinholeCamera(FrameCamera):
    pass


class _RadialTangential:
    """Shared Brown/OpenCV distortion loops; subclasses supply ``_radial``.
    One body for the fixed-point inversion so a future convergence fix
    cannot silently miss one of the two models."""

    def _distort_norm(self, xn, yn):
        x2, y2 = xn * xn, yn * yn
        xy = xn * yn
        r2 = x2 + y2
        radial = self._radial(r2)
        xt = 2.0 * self.p1 * xy + self.p2 * (r2 + 2.0 * x2)
        yt = self.p1 * (r2 + 2.0 * y2) + 2.0 * self.p2 * xy
        return xn * radial + xt, yn * radial + yt

    def _undistort_norm(self, xd, yd, iters: int = 25, tol: float = 1e-12):
        # fixed-point inversion (the public undistortPoints iteration) with a
        # convergence early-exit: typical batches converge in <10 rounds, so
        # the fixed 25 wasted ~3x the work in the hot geocode path.  NaN
        # inputs keep the step finite-checked out of the exit test.
        x = np.asarray(xd, dtype=np.float64).copy()
        y = np.asarray(yd, dtype=np.float64).copy()
        for _ in range(iters):
            x2, y2 = x * x, y * y
            xy = x * y
            r2 = x2 + y2
            radial = self._radial(r2)
            xt = 2.0 * self.p1 * xy + self.p2 * (r2 + 2.0 * x2)
            yt = self.p1 * (r2 + 2.0 * y2) + 2.0 * self.p2 * xy
            xn = (xd - xt) / radial
            yn = (yd - yt) / radial
            step = np.maximum(np.abs(xn - x), np.abs(yn - y))
            x, y = xn, yn
            finite = step[np.isfinite(step)]
            if finite.size == 0 or finite.max() < tol:
                break
        return x, y


@dataclass
@register_camera("brown")
class BrownCamera(_RadialTangential, FrameCamera):
    """Brown-Conrady radial + tangential distortion (OpenSfM formulation)."""

    k1: float = 0.0
    k2: float = 0.0
    p1: float = 0.0
    p2: float = 0.0
    k3: float = 0.0

    def _radial(self, r2):
        return 1.0 + r2 * (self.k1 + r2 * (self.k2 + r2 * self.k3))


@dataclass
@register_camera("opencv")
class OpenCVCamera(_RadialTangential, FrameCamera):
    """Full OpenCV rational model (k1..k6, p1, p2) — the 8-coefficient subset
    of the reference's 14 (`camera.py:1143-1230`); s/tau terms are zero in
    every reference fixture.  Distortion loops shared with BrownCamera via
    ``_RadialTangential``."""

    k1: float = 0.0
    k2: float = 0.0
    p1: float = 0.0
    p2: float = 0.0
    k3: float = 0.0
    k4: float = 0.0
    k5: float = 0.0
    k6: float = 0.0

    def _radial(self, r2):
        num = 1.0 + r2 * (self.k1 + r2 * (self.k2 + r2 * self.k3))
        den = 1.0 + r2 * (self.k4 + r2 * (self.k5 + r2 * self.k6))
        return num / den


@dataclass
@register_camera("fisheye")
class FisheyeCamera(FrameCamera):
    """theta-polynomial fisheye (OpenCV/OpenSfM convention, 2- or 4-param)."""

    k1: float = 0.0
    k2: float = 0.0
    k3: float = 0.0
    k4: float = 0.0

    def _theta_d(self, theta):
        t2 = theta * theta
        if self.k3 == 0.0 and self.k4 == 0.0:
            return theta * (1.0 + t2 * (self.k1 + t2 * self.k2))
        return theta * (
            1.0 + t2 * (self.k1 + t2 * (self.k2 + t2 * (self.k3 + t2 * self.k4)))
        )

    def _distort_norm(self, xn, yn):
        r = np.sqrt(xn * xn + yn * yn)
        theta = np.arctan(r)
        with np.errstate(invalid="ignore", divide="ignore"):
            scale = np.where(r > 0, self._theta_d(theta) / np.where(r > 0, r, 1.0), 1.0)
        return xn * scale, yn * scale

    def _undistort_norm(self, xd, yd, iters: int = 25, tol: float = 1e-12):
        rd = np.sqrt(xd * xd + yd * yd)
        theta = rd.copy()
        for _ in range(iters):  # Newton on f(theta) = theta_d(theta) - rd
            t2 = theta * theta
            if self.k3 == 0.0 and self.k4 == 0.0:
                f = theta * (1.0 + t2 * (self.k1 + t2 * self.k2)) - rd
                fp = 1.0 + t2 * (3.0 * self.k1 + t2 * 5.0 * self.k2)
            else:
                f = self._theta_d(theta) - rd
                fp = 1.0 + t2 * (
                    3.0 * self.k1 + t2 * (5.0 * self.k2 + t2 * (7.0 * self.k3 + t2 * 9.0 * self.k4))
                )
            theta = theta - f / fp
            res = np.abs(f[np.isfinite(f)])
            if res.size == 0 or res.max() < tol:  # converged early-exit
                break
        with np.errstate(invalid="ignore", divide="ignore"):
            scale = np.where(rd > 0, np.tan(theta) / np.where(rd > 0, rd, 1.0), 1.0)
        return xd * scale, yd * scale


# --- RPC -------------------------------------------------------------------


@dataclass
class RpcCamera:
    """Rational polynomial camera (GeoTIFF RPC spec ordering).

    Forward: Horner evaluation of the 20-coefficient cubic rationals over
    normalised (long, lat, height) (`camera.py:450-489` semantics).
    Inverse: full-step 2-D Newton on (long, lat) at fixed height with a
    pixel-residual early-exit, replacing the GDAL RPCTransformer iteration
    (`camera.py:491-511`).
    """

    cam_type = "rpc"

    im_size: tuple[int, int]
    rpc: dict

    def __post_init__(self):
        r = self.rpc
        self.off = np.array([r["long_off"], r["lat_off"], r["height_off"]])
        self.scale = np.array([r["long_scale"], r["lat_scale"], r["height_scale"]])
        self.ji_off = np.array([r["samp_off"], r["line_off"]])
        self.ji_scale = np.array([r["samp_scale"], r["line_scale"]])
        self.c_ln = np.asarray(r["line_num_coeff"], dtype=np.float64)
        self.c_ld = np.asarray(r["line_den_coeff"], dtype=np.float64)
        self.c_sn = np.asarray(r["samp_num_coeff"], dtype=np.float64)
        self.c_sd = np.asarray(r["samp_den_coeff"], dtype=np.float64)

    @staticmethod
    def _poly(x, y, z, c):
        """GeoTIFF RPC cubic polynomial, Horner-grouped.

        Term order (geotiff.maptools.org/rpc_prop.html):
        1, x, y, z, xy, xz, yz, x2, y2, z2, xyz, x3, xy2, xz2, x2y, y3,
        yz2, x2z, y2z, z3   with (x, y, z) = (long, lat, height) normalised.
        """
        return (
            c[0]
            + x * (c[1] + y * (c[4] + z * c[10]) + z * c[5] + x * (c[7] + x * c[11] + y * c[14] + z * c[17]))
            + y * (c[2] + z * c[6] + y * (c[8] + x * c[12] + y * c[15] + z * c[18]))
            + z * (c[3] + z * (c[9] + x * c[13] + y * c[16] + z * c[19]))
        )

    def world_to_pixel(self, lon, lat, z):
        xn = (np.asarray(lon, dtype=np.float64) - self.off[0]) / self.scale[0]
        yn = (np.asarray(lat, dtype=np.float64) - self.off[1]) / self.scale[1]
        zn = (np.asarray(z, dtype=np.float64) - self.off[2]) / self.scale[2]
        with np.errstate(invalid="ignore", divide="ignore"):
            i_n = self._poly(xn, yn, zn, self.c_ln) / self._poly(xn, yn, zn, self.c_ld)
            j_n = self._poly(xn, yn, zn, self.c_sn) / self._poly(xn, yn, zn, self.c_sd)
        j = j_n * self.ji_scale[0] + self.ji_off[0]
        i = i_n * self.ji_scale[1] + self.ji_off[1]
        return j, i

    def pixel_to_world_z(self, j, i, z, iters: int = 20, tol: float = 1e-9):
        """Iterative inverse: Newton on normalised (long, lat) with the exact
        forward model, finite-difference Jacobian per iteration.  Exits as
        soon as every finite pixel residual is below ``tol`` px — each saved
        round skips three 20-coefficient polynomial evaluations."""
        j = np.asarray(j, dtype=np.float64)
        i = np.asarray(i, dtype=np.float64)
        z = np.broadcast_to(np.asarray(z, dtype=np.float64), j.shape).astype(np.float64)
        lon = np.full_like(j, self.off[0])
        lat = np.full_like(j, self.off[1])
        eps_lon = self.scale[0] * 1e-6
        eps_lat = self.scale[1] * 1e-6
        for _ in range(iters):
            j0, i0 = self.world_to_pixel(lon, lat, z)
            rj, ri = j - j0, i - i0
            res = np.maximum(np.abs(rj), np.abs(ri))
            res = res[np.isfinite(res)]
            if res.size == 0 or res.max() < tol:  # converged early-exit
                break
            j1, i1 = self.world_to_pixel(lon + eps_lon, lat, z)
            j2, i2 = self.world_to_pixel(lon, lat + eps_lat, z)
            a, b = (j1 - j0) / eps_lon, (j2 - j0) / eps_lat
            c, d = (i1 - i0) / eps_lon, (i2 - i0) / eps_lat
            with np.errstate(invalid="ignore", divide="ignore"):
                det = a * d - b * c
                dlon = (d * rj - b * ri) / det
                dlat = (a * ri - c * rj) / det
            lon = lon + dlon
            lat = lat + dlat
        return lon, lat, z.copy()


_CAMERA_REGISTRY["rpc"] = RpcCamera


@dataclass
class GcpCamera:
    """GCP-interpolated camera (SURVEY.md §2.2 M5, `orthority/camera.py:
    514-556` — untested in the reference; this engine version is tested).

    A DLT pinhole base model is fitted to the GCPs (stages/fit.pnp_dlt) and
    the residual pixel error at each GCP is interpolated by inverse-distance
    weighting — so the transform reproduces the GCPs exactly and degrades
    smoothly between them.  Inverse: base-model inverse plus a fixed-point
    residual correction.
    """

    cam_type = "gcp"

    im_size: tuple[int, int]
    gcps: dict  # {"ji": (N,2), "xyz": (N,3)}

    def __post_init__(self):
        from ..stages.fit import pnp_dlt

        ji = np.asarray(self.gcps["ji"], dtype=np.float64)
        xyz = np.asarray(self.gcps["xyz"], dtype=np.float64)
        fit = pnp_dlt(ji[:, 0], ji[:, 1], xyz[:, 0], xyz[:, 1], xyz[:, 2])
        self.base = FrameCamera.__new__(FrameCamera)
        self.base.K, self.base.R, self.base.T = fit["K"], fit["R_world"], fit["T"]
        self.base.distort = False
        self._gcp_xyz = xyz
        self._gcp_ji = ji
        bj, bi = FrameCamera.world_to_pixel(self.base, xyz[:, 0], xyz[:, 1], xyz[:, 2])
        self._res_j = ji[:, 0] - bj
        self._res_i = ji[:, 1] - bi

    def _idw_residual(self, x, y, z, power: float = 2.0, eps: float = 1e-12):
        d2 = (
            (x[:, None] - self._gcp_xyz[None, :, 0]) ** 2
            + (y[:, None] - self._gcp_xyz[None, :, 1]) ** 2
            + (z[:, None] - self._gcp_xyz[None, :, 2]) ** 2
        )
        w = 1.0 / (d2 ** (power / 2.0) + eps)
        w = w / w.sum(axis=1, keepdims=True)
        return w @ self._res_j, w @ self._res_i

    def world_to_pixel(self, x, y, z):
        x = np.asarray(x, dtype=np.float64)
        y = np.asarray(y, dtype=np.float64)
        z = np.broadcast_to(np.asarray(z, dtype=np.float64), x.shape)
        j, i = FrameCamera.world_to_pixel(self.base, x, y, z)
        dj, di = self._idw_residual(x, y, z)
        return j + dj, i + di

    def pixel_to_world_z(self, j, i, z, iters: int = 8):
        """Fixed-point inverse: start from the base-model inverse, then
        correct the pixel target by the local interpolated residual."""
        j = np.asarray(j, dtype=np.float64)
        i = np.asarray(i, dtype=np.float64)
        x, y, zz = FrameCamera.pixel_to_world_z(self.base, j, i, z)
        prev_dj = prev_di = None
        for _ in range(iters):
            dj, di = self._idw_residual(x, y, zz)
            if prev_dj is not None:
                step = np.maximum(np.abs(dj - prev_dj), np.abs(di - prev_di))
                step = step[np.isfinite(step)]
                if step.size == 0 or step.max() < 1e-9:  # converged early-exit
                    break
            prev_dj, prev_di = dj, di
            x, y, zz = FrameCamera.pixel_to_world_z(self.base, j - dj, i - di, z)
        return x, y, zz


_CAMERA_REGISTRY["gcp"] = GcpCamera
