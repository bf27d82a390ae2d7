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
``checker = (floor(j/8) + floor(i/8)) % 2`` over the literal-matrix pinhole
projection — see :func:`sql_remap_checker`.
"""

from __future__ import annotations

import numpy as np
import pyarrow as pa
import ray.data

from ..core import hashing as H
from ..core.hashing import sql_flit as FL
from ..core.config import pool
from ..sources import param_io as P
from .camera_geocode import FLAT_Z, doc_pixels

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
    """Actor: holds the source image + camera bank + lazy undistort grids."""

    def __init__(self, interp: str = "nearest", out_dtype: str | None = None):
        self.image = checkerboard().astype(np.float64)
        self.bank = P.build_camera_bank()
        self.interp = interp
        self.out_dtype = out_dtype  # dtype matrix parity (`test_ortho.py:663-1160`)
        self._undistort_grids: dict[str, tuple[np.ndarray, np.ndarray]] = {}

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

    def _sample(self, j: np.ndarray, i: np.ndarray) -> tuple[np.ndarray, np.ndarray]:
        """(values, valid) at fractional pixel coords; nodata outside.

        Interp set mirrors the reference's enum (``orthority/enums.py:82-109``
        nearest/bilinear/cubic/lanczos; 'average' is the overview-build
        downsampler, stages/overviews.py): cubic is the 4-tap convolution
        kernel with a=-0.75 (OpenCV INTER_CUBIC semantics, the reference's
        remap backend), lanczos the normalized 8-tap Lanczos4 window.
        """
        h, w = self.image.shape
        if self.interp == "nearest":
            jn = np.floor(j).astype(np.int64)
            iN = np.floor(i).astype(np.int64)
            valid = (jn >= 0) & (jn < w) & (iN >= 0) & (iN < h)
            out = np.where(valid, self.image[np.clip(iN, 0, h - 1), np.clip(jn, 0, w - 1)], np.nan)
            return out, valid
        if self.interp == "bilinear":
            j0 = np.floor(j).astype(np.int64)
            i0 = np.floor(i).astype(np.int64)
            fj, fi = j - j0, i - i0
            valid = (j0 >= 0) & (j0 < w - 1) & (i0 >= 0) & (i0 < h - 1)
            j0c = np.clip(j0, 0, w - 2)
            i0c = np.clip(i0, 0, h - 2)
            img = self.image
            out = (
                img[i0c, j0c] * (1 - fi) * (1 - fj)
                + img[i0c, j0c + 1] * (1 - fi) * fj
                + img[i0c + 1, j0c] * fi * (1 - fj)
                + img[i0c + 1, j0c + 1] * fi * fj
            )
            return np.where(valid, out, np.nan), valid
        if self.interp == "average":
            # unweighted 2x2 box mean — the reference Interp enum's
            # ``average`` applied at remap time (orthority/enums.py:82-109);
            # sampling a 2x2 block's center reproduces the overview
            # downsampler exactly (parity pinned in test_remap)
            j0 = np.floor(j).astype(np.int64)
            i0 = np.floor(i).astype(np.int64)
            valid = (j0 >= 0) & (j0 < w - 1) & (i0 >= 0) & (i0 < h - 1)
            j0c = np.clip(j0, 0, w - 2)
            i0c = np.clip(i0, 0, h - 2)
            img = self.image
            out = 0.25 * (
                img[i0c, j0c] + img[i0c, j0c + 1]
                + img[i0c + 1, j0c] + img[i0c + 1, j0c + 1]
            )
            return np.where(valid, out, np.nan), valid
        if self.interp == "cubic":
            return self._sample_separable(j, i, np.arange(-1, 3), _cubic_kernel, False)
        if self.interp == "lanczos":
            return self._sample_separable(j, i, np.arange(-3, 5), _lanczos4_kernel, True)
        raise ValueError(f"unknown interp {self.interp!r}")

    def _sample_separable(self, j: np.ndarray, i: np.ndarray, offs: np.ndarray,
                          kernel, normalize: bool) -> tuple[np.ndarray, np.ndarray]:
        """Separable T-tap convolution sampling, vectorized over the batch:
        one (N, T, T) gather + weighted sum.  Valid only where the full
        support fits in-frame (matches the reference's border-nodata rule)."""
        h, w = self.image.shape
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
        patch = self.image[ic[:, :, None], jc[:, None, :]]  # (N, Ti, Tj)
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
          out_dtype: str | None = None,
          *, concurrency: int | None = None) -> ray.data.Dataset:
    """geo_ds must carry (doc_id, wx, wy, wz) — see stages/camera_geocode.

    Stateless tasks + per-worker Remapper cache: the base state (checker
    image + camera bank) is cheap, and the heavy undistort grids build
    LAZILY per worker only for the cameras a batch actually touches —
    actor-pool spin-up dominated this stage's wall otherwise."""
    from ..core.config import cached_stage

    return geo_ds.map_batches(
        cached_stage(Remapper, f"remap:{interp}:{out_dtype}",
                     interp=interp, out_dtype=out_dtype),
        batch_format="pyarrow", batch_size=32768, concurrency=concurrency,
    )


def remap_checker_table(ds_keys: ray.data.Dataset) -> ray.data.Dataset:
    """Oracle-checkable remap: pinhole docs, flat-z geocode, nearest-neighbor
    checker value.  -> (doc_id, jn, in_, checker) int columns."""
    from .camera_geocode import camera_geocode

    geo = camera_geocode(ds_keys)
    rem = remap(geo, interp="nearest")

    def fmt(batch: pa.Table) -> pa.Table:
        m = (batch["cam_idx"].to_numpy(zero_copy_only=False) == 0) & batch[
            "valid"
        ].to_numpy(zero_copy_only=False)
        j = batch["src_j"].to_numpy(zero_copy_only=False)[m]
        i = batch["src_i"].to_numpy(zero_copy_only=False)[m]
        v = batch["value"].to_numpy(zero_copy_only=False)[m]
        return pa.table(
            {
                "doc_id": pa.array(batch["doc_id"].to_numpy(zero_copy_only=False)[m]),
                "jn": pa.array(np.floor(j).astype(np.int64)),
                "in_": pa.array(np.floor(i).astype(np.int64)),
                "checker": pa.array(v.astype(np.int64)),
            }
        )

    return rem.map_batches(fmt, batch_format="pyarrow")


def sql_remap_checker() -> str:
    """DuckDB replication of :func:`remap_checker_table` for pinhole docs.

    The pinhole forward projection of the flat-z geocode is the IDENTITY on
    the doc's own (j, i) sample up to float round-trip (pixel -> world ->
    pixel), so jn/in_ are the floors of the round-tripped values; with the
    literal-matrix expressions the round trip is bit-exact on both sides.
    """
    bank = P.build_camera_bank()
    cam = bank["pinhole"]
    K, R, T = cam.K, cam.R, cam.T
    Rt = R.T
    n_cams = len(P.CAM_IDS)
    jw, ih = P.IM_SIZE[0] * 1000, P.IM_SIZE[1] * 1000
    j = f"(CAST({H.SQL_H1} % {jw} AS DOUBLE) / 1000.0)"
    i = f"(CAST({H.SQL_H2} % {ih} AS DOUBLE) / 1000.0)"
    xn = f"(({j} - {FL(K[0, 2])}) / {FL(K[0, 0])})"
    yn = f"(({i} - {FL(K[1, 2])}) / {FL(K[1, 1])})"
    rx = f"({FL(R[0, 0])} * {xn} + {FL(R[0, 1])} * {yn} + {FL(R[0, 2])})"
    ry = f"({FL(R[1, 0])} * {xn} + {FL(R[1, 1])} * {yn} + {FL(R[1, 2])})"
    rz = f"({FL(R[2, 0])} * {xn} + {FL(R[2, 1])} * {yn} + {FL(R[2, 2])})"
    lam = f"(({FL(FLAT_Z)} - {FL(T[2])}) / {rz})"
    x = f"({FL(T[0])} + {lam} * {rx})"
    y = f"({FL(T[1])} + {lam} * {ry})"
    z = FL(FLAT_Z)
    dx, dy, dz = f"({x} - {FL(T[0])})", f"({y} - {FL(T[1])})", f"({z} - {FL(T[2])})"
    xc = f"({FL(Rt[0, 0])} * {dx} + {FL(Rt[0, 1])} * {dy} + {FL(Rt[0, 2])} * {dz})"
    yc = f"({FL(Rt[1, 0])} * {dx} + {FL(Rt[1, 1])} * {dy} + {FL(Rt[1, 2])} * {dz})"
    zc = f"({FL(Rt[2, 0])} * {dx} + {FL(Rt[2, 1])} * {dy} + {FL(Rt[2, 2])} * {dz})"
    jj = f"({FL(K[0, 0])} * ({xc} / {zc}) + {FL(K[0, 2])})"
    ii = f"({FL(K[1, 1])} * ({yc} / {zc}) + {FL(K[1, 2])})"
    w, h = P.IM_SIZE
    return f"""
SELECT doc_id, jn, in_, CAST((jn // {CHECKER_PERIOD} + in_ // {CHECKER_PERIOD}) % 2 AS BIGINT) AS checker
FROM (
  SELECT doc_id,
         CAST(floor({jj}) AS BIGINT) AS jn,
         CAST(floor({ii}) AS BIGINT) AS in_
  FROM pages WHERE {H.SQL_H1} % {n_cams} = 0
)
WHERE jn >= 0 AND jn < {w} AND in_ >= 0 AND in_ < {h}
""".strip()
