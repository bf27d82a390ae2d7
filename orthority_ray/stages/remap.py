"""Remap: world coordinates -> source-image pixels -> sampled values.

Engine re-expression of the reference's remap core (`orthority/camera.py:
319-399` Camera.remap = world_to_pixel projection + per-band cv2.remap
interpolation with nodata masking; SURVEY.md §2.2 M11-M13, §2.4 St2):

- the "source image" is a deterministic checkerboard grid (reference fixture
  semantics, `tests/conftest.py:58-64`) held ONCE per actor;
- every doc's world point is projected through its camera (M1) and the
  image is sampled at the resulting (j, i) — nearest or bilinear;
- out-of-frame samples are nodata (null mask), and a 1-step mask dilation
  marks samples adjacent to nodata (the remap-blur guard, M12,
  `camera.py:1059-1116` semantics);
- undistortion lookup grids are built lazily and cached per actor (St2,
  `camera.py:1232-1255` analog).

The nearest-neighbor pinhole path is DuckDB-replicable:
``checker = (jn // 8 + in // 8) % 2`` with ``jn = floor(j + 0.5)`` (nearest =
ROUND, the cv2.remap INTER_NEAREST semantics) over the literal-matrix pinhole
projection — see :func:`sql_remap_checker`.
"""

from __future__ import annotations

import numpy as np
import pyarrow as pa
import ray.data

from ..core import hashing as H
from ..core.hashing import sql_flit as FL
from ..sources import param_io as P
from .camera_geocode import FLAT_Z, doc_pixels, sql_pinhole_chain

CHECKER_PERIOD = 8


def _cubic_kernel(t: np.ndarray, a: float = -0.75) -> np.ndarray:
    """Cubic convolution kernel (Keys), a=-0.75 = OpenCV INTER_CUBIC.
    Exactly interpolates at integer nodes and reproduces linear ramps."""
    x = np.abs(t)
    near = ((a + 2.0) * x - (a + 3.0)) * x * x + 1.0
    far = ((a * x - 5.0 * a) * x + 8.0 * a) * x - 4.0 * a
    return np.where(x <= 1.0, near, np.where(x < 2.0, far, 0.0))


def _lanczos4_kernel(t: np.ndarray) -> np.ndarray:
    """Lanczos window, support 4 (8 taps); weights normalized at use."""
    x = np.abs(t)
    with np.errstate(invalid="ignore", divide="ignore"):
        out = np.sinc(t) * np.sinc(t / 4.0)
    return np.where(x < 4.0, out, 0.0)


def checkerboard(shape: tuple[int, int] = (P.IM_SIZE[1], P.IM_SIZE[0])) -> np.ndarray:
    """uint8 checkerboard image, period 8 px (reference fixture semantics)."""
    h, w = shape
    ii, jj = np.meshgrid(np.arange(h), np.arange(w), indexing="ij")
    return ((ii // CHECKER_PERIOD + jj // CHECKER_PERIOD) % 2).astype(np.uint8)


class Remapper:
    """Actor: holds the source image + camera bank + lazy undistort grids.

    ``via_undistorted=True`` is the reference's ``distort=False`` remap
    (`camera.py:1232-1255` + `ortho.py` remap of an undistorted source): the
    source image is first resampled through the cached St2 undistort grids
    (``undistort_image`` = ``Camera.undistort_im``), then every world point
    is projected with the PINHOLE-ONLY model and sampled from that
    undistorted image.  For a distortion-free camera the two paths are
    identical; for distorted models they agree to interpolation error."""

    def __init__(self, interp: str = "nearest", out_dtype: str | None = None,
                 via_undistorted: bool = False):
        self.image = checkerboard().astype(np.float64)
        self.bank = P.build_camera_bank()
        self.interp = interp
        self.out_dtype = out_dtype  # dtype matrix parity (`test_ortho.py:663-1160`)
        self.via_undistorted = via_undistorted
        self._undistort_grids: dict[str, tuple[np.ndarray, np.ndarray]] = {}
        self._undistorted_images: dict[str, np.ndarray] = {}

    def undistort_grid(self, cam_id: str) -> tuple[np.ndarray, np.ndarray]:
        """Lazily-built full-image distortion lookup maps (St2): for every
        undistorted pixel, the distorted source position to sample."""
        grids = self._undistort_grids.get(cam_id)
        if grids is None:
            cam = self.bank[cam_id]
            w, h = P.IM_SIZE
            jj, ii = np.meshgrid(np.arange(w, dtype=np.float64), np.arange(h, dtype=np.float64))
            jd, id_ = cam.distort_pixel(jj.ravel(), ii.ravel())
            grids = (jd.reshape(h, w).astype(np.float32), id_.reshape(h, w).astype(np.float32))
            self._undistort_grids[cam_id] = grids
        return grids

    def undistort_image(self, cam_id: str) -> np.ndarray:
        """The source image resampled through the camera's undistort grid
        (``Camera.undistort_im`` analog): pixel (j, i) of the result holds
        the source value at the distorted position the grid points to.
        Cached per actor next to the grids; NaN where the grid leaves the
        source frame."""
        img = self._undistorted_images.get(cam_id)
        if img is None:
            jd, id_ = self.undistort_grid(cam_id)
            vals, valid = self._sample_image(
                self.image, jd.ravel().astype(np.float64), id_.ravel().astype(np.float64),
                "bilinear",
            )
            img = np.where(valid, vals, np.nan).reshape(jd.shape)
            self._undistorted_images[cam_id] = img
        return img

    def _sample(self, j: np.ndarray, i: np.ndarray) -> tuple[np.ndarray, np.ndarray]:
        return self._sample_image(self.image, j, i, self.interp)

    def _sample_image(self, image: np.ndarray, j: np.ndarray, i: np.ndarray,
                      interp: str) -> tuple[np.ndarray, np.ndarray]:
        """(values, valid) at fractional pixel coords; nodata outside.

        Interp set mirrors the reference's enum (``orthority/enums.py:82-109``
        nearest/bilinear/cubic/lanczos; 'average' is the overview-build
        downsampler, stages/overviews.py): cubic is the 4-tap convolution
        kernel with a=-0.75 (OpenCV INTER_CUBIC semantics, the reference's
        remap backend), lanczos the normalized 8-tap Lanczos4 window.
        """
        h, w = image.shape
        if interp == "nearest":
            # ROUND to the nearest pixel (floor(x + 0.5), half-up ties) — the
            # cv2.remap INTER_NEAREST semantics the module re-derives; a bare
            # floor was a systematic half-pixel shift vs the reference
            jn = np.floor(j + 0.5).astype(np.int64)
            iN = np.floor(i + 0.5).astype(np.int64)
            valid = (jn >= 0) & (jn < w) & (iN >= 0) & (iN < h)
            out = np.where(valid, image[np.clip(iN, 0, h - 1), np.clip(jn, 0, w - 1)], np.nan)
            return out, valid
        if interp == "bilinear":
            j0 = np.floor(j).astype(np.int64)
            i0 = np.floor(i).astype(np.int64)
            fj, fi = j - j0, i - i0
            valid = (j0 >= 0) & (j0 < w - 1) & (i0 >= 0) & (i0 < h - 1)
            j0c = np.clip(j0, 0, w - 2)
            i0c = np.clip(i0, 0, h - 2)
            img = image
            out = (
                img[i0c, j0c] * (1 - fi) * (1 - fj)
                + img[i0c, j0c + 1] * (1 - fi) * fj
                + img[i0c + 1, j0c] * fi * (1 - fj)
                + img[i0c + 1, j0c + 1] * fi * fj
            )
            return np.where(valid, out, np.nan), valid
        if interp == "average":
            # unweighted 2x2 box mean — the reference Interp enum's
            # ``average`` applied at remap time (orthority/enums.py:82-109);
            # sampling a 2x2 block's center reproduces the overview
            # downsampler exactly (parity pinned in test_remap)
            j0 = np.floor(j).astype(np.int64)
            i0 = np.floor(i).astype(np.int64)
            valid = (j0 >= 0) & (j0 < w - 1) & (i0 >= 0) & (i0 < h - 1)
            j0c = np.clip(j0, 0, w - 2)
            i0c = np.clip(i0, 0, h - 2)
            img = image
            out = 0.25 * (
                img[i0c, j0c] + img[i0c, j0c + 1]
                + img[i0c + 1, j0c] + img[i0c + 1, j0c + 1]
            )
            return np.where(valid, out, np.nan), valid
        if interp == "cubic":
            return self._sample_separable(image, j, i, np.arange(-1, 3), _cubic_kernel, False)
        if interp == "lanczos":
            return self._sample_separable(image, j, i, np.arange(-3, 5), _lanczos4_kernel, True)
        raise ValueError(f"unknown interp {interp!r}")

    def _sample_separable(self, image: np.ndarray, j: np.ndarray, i: np.ndarray,
                          offs: np.ndarray, kernel, normalize: bool) -> tuple[np.ndarray, np.ndarray]:
        """Separable T-tap convolution sampling, vectorized over the batch:
        one (N, T, T) gather + weighted sum.  Valid only where the full
        support fits in-frame (matches the reference's border-nodata rule)."""
        h, w = image.shape
        j0 = np.floor(j).astype(np.int64)
        i0 = np.floor(i).astype(np.int64)
        fj, fi = j - j0, i - i0
        lo, hi = int(offs.min()), int(offs.max())
        valid = (j0 + lo >= 0) & (j0 + hi < w) & (i0 + lo >= 0) & (i0 + hi < h)
        wj = kernel(fj[:, None] - offs[None, :])  # (N, T)
        wi = kernel(fi[:, None] - offs[None, :])
        if normalize:
            wj = wj / wj.sum(axis=1, keepdims=True)
            wi = wi / wi.sum(axis=1, keepdims=True)
        jc = np.clip(j0[:, None] + offs[None, :], 0, w - 1)
        ic = np.clip(i0[:, None] + offs[None, :], 0, h - 1)
        patch = image[ic[:, :, None], jc[:, None, :]]  # (N, Ti, Tj)
        out = (wi[:, :, None] * wj[:, None, :] * patch).sum(axis=(1, 2))
        return np.where(valid, out, np.nan), valid

    def __call__(self, batch: pa.Table) -> pa.Table:
        doc_id = batch["doc_id"].to_numpy(zero_copy_only=False)
        _, _, cam_idx = doc_pixels(doc_id)
        wx = batch["wx"].to_numpy(zero_copy_only=False)
        wy = batch["wy"].to_numpy(zero_copy_only=False)
        wz = batch["wz"].to_numpy(zero_copy_only=False)
        j = np.empty_like(wx)
        i = np.empty_like(wx)
        if self.via_undistorted:
            # reference distort=False remap: pinhole-only projection into the
            # camera's UNDISTORTED image (built once per actor from the St2
            # grids); NaN margins of that image mark the samples invalid
            vals = np.empty_like(wx)
            valid = np.zeros(wx.shape, dtype=bool)
            for ci, cam_id in enumerate(P.CAM_IDS):
                m = cam_idx == ci
                if m.any():
                    cam = self.bank[cam_id]
                    j[m], i[m] = cam.world_to_pixel(wx[m], wy[m], wz[m], distort=False)
                    v, ok = self._sample_image(self.undistort_image(cam_id), j[m], i[m], self.interp)
                    ok &= np.isfinite(v)
                    vals[m] = v
                    valid[m] = ok
        else:
            for ci, cam_id in enumerate(P.CAM_IDS):
                m = cam_idx == ci
                if m.any():
                    j[m], i[m] = self.bank[cam_id].world_to_pixel(wx[m], wy[m], wz[m])
            vals, valid = self._sample(j, i)
        if self.out_dtype:
            from ..functions.scalars import convert_array_dtype

            vals = convert_array_dtype(vals, self.out_dtype).astype(np.float64)
        # 1-step mask "dilation": a sample whose 4-neighborhood in pixel
        # space leaves the frame is flagged (remap-blur guard, M12)
        h, w = self.image.shape
        edge = (j < 1) | (j > w - 2) | (i < 1) | (i > h - 2)
        return (
            batch.append_column("src_j", pa.array(j))
            .append_column("src_i", pa.array(i))
            .append_column("value", pa.array(vals))
            .append_column("valid", pa.array(valid))
            .append_column("edge_dilated", pa.array(edge & valid))
        )


def remap(geo_ds: ray.data.Dataset, interp: str = "nearest",
          out_dtype: str | None = None, via_undistorted: bool = False,
          *, concurrency: int | None = None) -> ray.data.Dataset:
    """geo_ds must carry (doc_id, wx, wy, wz) — see stages/camera_geocode.

    Stateless tasks + per-worker Remapper cache: the base state (checker
    image + camera bank) is cheap, and the heavy undistort grids build
    LAZILY per worker only for the cameras a batch actually touches —
    actor-pool spin-up dominated this stage's wall otherwise."""
    from ..core.config import cached_stage

    return geo_ds.map_batches(
        cached_stage(Remapper, f"remap:{interp}:{out_dtype}:{via_undistorted}",
                     interp=interp, out_dtype=out_dtype, via_undistorted=via_undistorted),
        batch_format="pyarrow", batch_size=32768, concurrency=concurrency,
    )


def remap_checker_table(ds_keys: ray.data.Dataset) -> ray.data.Dataset:
    """Oracle-checkable remap: pinhole docs, flat-z geocode, nearest-neighbor
    checker value.  -> (doc_id, jn, in_, checker) int columns.

    Docs whose sub-pixel coordinate sits EXACTLY on the .5 millipixel
    lattice (1/1000 of samples) are excluded on BOTH sides: there the
    rounding decision rides on the last ulp of the pixel->world->pixel round
    trip, and numpy vs DuckDB can disagree in that ulp.  The half-up tie
    rule itself is pinned by the deterministic kernel tests in
    tests/test_remap.py."""
    from .camera_geocode import camera_geocode

    geo = camera_geocode(ds_keys)
    rem = remap(geo, interp="nearest")

    def fmt(batch: pa.Table) -> pa.Table:
        # px_j/px_i are exact k/1000 millipixel values from doc_pixels
        pj = batch["px_j"].to_numpy(zero_copy_only=False)
        pi = batch["px_i"].to_numpy(zero_copy_only=False)
        kj = np.floor(pj * 1000.0 + 0.5).astype(np.int64)
        ki = np.floor(pi * 1000.0 + 0.5).astype(np.int64)
        tie = (kj % 1000 == 500) | (ki % 1000 == 500)
        m = (
            (batch["cam_idx"].to_numpy(zero_copy_only=False) == 0)
            & batch["valid"].to_numpy(zero_copy_only=False)
            & ~tie
        )
        j = batch["src_j"].to_numpy(zero_copy_only=False)[m]
        i = batch["src_i"].to_numpy(zero_copy_only=False)[m]
        v = batch["value"].to_numpy(zero_copy_only=False)[m]
        return pa.table(
            {
                "doc_id": pa.array(batch["doc_id"].to_numpy(zero_copy_only=False)[m]),
                # the ROUNDED sample indices (nearest = floor(x + 0.5)) —
                # exactly the pixel _sample read, so checker == image[in_, jn]
                "jn": pa.array(np.floor(j + 0.5).astype(np.int64)),
                "in_": pa.array(np.floor(i + 0.5).astype(np.int64)),
                "checker": pa.array(v.astype(np.int64)),
            }
        )

    return rem.map_batches(fmt, batch_format="pyarrow")


def sql_remap_checker() -> str:
    """DuckDB replication of :func:`remap_checker_table` for pinhole docs.

    The pinhole forward projection of the flat-z geocode is the IDENTITY on
    the doc's own (j, i) sample up to float round-trip (pixel -> world ->
    pixel), so jn/in_ are the ROUNDED round-tripped values (nearest =
    floor(x + 0.5)); with the literal-matrix expressions (the inverse chain
    shared verbatim with sql_pinhole_geocode via
    :func:`~..stages.camera_geocode.sql_pinhole_chain`) the round trip
    agrees on every rounding decision EXCEPT on the .5 millipixel lattice,
    which both sides exclude (see :func:`remap_checker_table`).
    """
    bank = P.build_camera_bank()
    cam = bank["pinhole"]
    K, R, T = cam.K, cam.R, cam.T
    Rt = R.T
    n_cams = len(P.CAM_IDS)
    e = sql_pinhole_chain()
    x, y = e["x"], e["y"]
    z = FL(FLAT_Z)
    dx, dy, dz = f"({x} - {FL(T[0])})", f"({y} - {FL(T[1])})", f"({z} - {FL(T[2])})"
    xc = f"({FL(Rt[0, 0])} * {dx} + {FL(Rt[0, 1])} * {dy} + {FL(Rt[0, 2])} * {dz})"
    yc = f"({FL(Rt[1, 0])} * {dx} + {FL(Rt[1, 1])} * {dy} + {FL(Rt[1, 2])} * {dz})"
    zc = f"({FL(Rt[2, 0])} * {dx} + {FL(Rt[2, 1])} * {dy} + {FL(Rt[2, 2])} * {dz})"
    jj = f"({FL(K[0, 0])} * ({xc} / {zc}) + {FL(K[0, 2])})"
    ii = f"({FL(K[1, 1])} * ({yc} / {zc}) + {FL(K[1, 2])})"
    w, h = P.IM_SIZE
    jw, ih = w * 1000, h * 1000
    return f"""
SELECT doc_id, jn, in_, CAST((jn // {CHECKER_PERIOD} + in_ // {CHECKER_PERIOD}) % 2 AS BIGINT) AS checker
FROM (
  SELECT doc_id,
         CAST(floor({jj} + 0.5) AS BIGINT) AS jn,
         CAST(floor({ii} + 0.5) AS BIGINT) AS in_
  FROM pages
  WHERE {H.SQL_H1} % {n_cams} = 0
    AND ({H.SQL_H1} % {jw}) % 1000 <> 500
    AND ({H.SQL_H2} % {ih}) % 1000 <> 500
)
WHERE jn >= 0 AND jn < {w} AND in_ >= 0 AND in_ < {h}
""".strip()
