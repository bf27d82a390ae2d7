"""Model refinement as a grouped aggregate: the RPC bias-compensation analog.

Re-derivation of the reference's GCP refinement (`orthority/fit.py:49-130`;
SURVEY.md §2.6 A6, §3.2) from the published shift / shift-and-drift bias
compensation method (Fraser & Hanley 2005, doi:10.1016/j.isprsjprs.2005.11.001):

1. GCP residuals are computed per (image-) group in normalised pixel space:
   project each GCP's world coords through the current RPC, compare with its
   measured pixel coords;
2. 'shift' = mean offset; 'shift_drift' = per-axis 1-D least squares
   (scale m, offset c) — tiny per-group solves;
3. the affine is folded back into the RPC numerator coefficients
   (num' = num * m + den * c, exact because den is shared);
4. the refined model table is BROADCAST back to the geocode actor pool
   (a grouped aggregate -> model-update -> broadcast loop).

Ray shape: ``gcps.groupby("image").map_groups(fit)`` — each group is one
image's control points (small), the output is a model-parameter table.
"""

from __future__ import annotations

from copy import deepcopy

import numpy as np
import pandas as pd
import ray.data

from ..core.cameras import RpcCamera


def refine_tform(rpc: dict, ji: np.ndarray, xyz: np.ndarray,
                 method: str = "shift") -> np.ndarray:
    """The (2, 3) normalised-pixel affine a GCP set implies for ONE RPC
    model: identity scale + mean offset for 'shift', per-axis 1-D LSQ
    (scale, offset) for 'shift_drift'."""
    if method not in ("shift", "shift_drift"):
        raise ValueError(f"unknown refine method {method!r}")
    min_gcps = 1 if method == "shift" else 2
    if ji.shape[0] < min_gcps:
        raise ValueError(f"at least {min_gcps} GCPs required for {method!r}")
    cam = RpcCamera(im_size=None, rpc=rpc)

    def norm(j, i):
        return (
            (j - rpc["samp_off"]) / rpc["samp_scale"],
            (i - rpc["line_off"]) / rpc["line_scale"],
        )

    gj, gi = norm(ji[:, 0], ji[:, 1])
    pj, pi = cam.world_to_pixel(xyz[:, 0], xyz[:, 1], xyz[:, 2])
    pj, pi = norm(pj, pi)

    tform = np.eye(2, 3)
    if method == "shift":
        tform[0, 2] = (gj - pj).mean()
        tform[1, 2] = (gi - pi).mean()
    else:
        for axis, (p, g) in enumerate([(pj, gj), (pi, gi)]):
            A = np.stack([p, np.ones_like(p)], axis=1)
            (m, c), *_ = np.linalg.lstsq(A, g, rcond=None)
            tform[axis, axis] = m
            tform[axis, 2] = c
    return tform


def refine_rpc(rpc: dict, ji: np.ndarray, xyz: np.ndarray, method: str = "shift") -> dict:
    """Refine ONE RPC model from GCP arrays.

    ji: (N, 2) measured pixel coords; xyz: (N, 3) world (lon, lat, z).
    """
    tform = refine_tform(rpc, ji, xyz, method)

    out = deepcopy(rpc)
    for axis, num_key, den_key in zip(
        range(2), ["samp_num_coeff", "line_num_coeff"], ["samp_den_coeff", "line_den_coeff"]
    ):
        num = np.asarray(out[num_key]) * tform[axis, axis]
        num = num + np.asarray(out[den_key]) * tform[axis, 2]
        out[num_key] = num.tolist()
    return out


def make_gcp_table(rpc: dict, n: int = 40, dj: float = 2.5, di: float = -1.5,
                   images: tuple[str, ...] = ("im_a", "im_b"), seed: int = 42) -> pd.DataFrame:
    """Synthetic GCP side table with a KNOWN planted pixel shift per image —
    the refine stage must recover it (mirrors `tests/test_fit.py:46-91`)."""
    cam = RpcCamera(im_size=None, rpc=rpc)
    rng = np.random.default_rng(seed)
    rows = []
    for img_i, img in enumerate(images):
        j = rng.uniform(10, 190, n)
        i = rng.uniform(10, 140, n)
        z = rng.uniform(700, 950, n)
        lon, lat, zz = cam.pixel_to_world_z(j, i, z)
        rows.append(
            pd.DataFrame(
                {
                    "image": img,
                    "j": j + dj * (img_i + 1),
                    "i": i + di * (img_i + 1),
                    "x": lon,
                    "y": lat,
                    "z": zz,
                }
            )
        )
    return pd.concat(rows, ignore_index=True)


def refine_rpc_grouped(gcps: ray.data.Dataset, rpc: dict,
                       method: str = "shift") -> ray.data.Dataset:
    """Per-image refinement: groupby(image) -> LSQ -> refined shift params.

    Output: one row per image with the recovered pixel shift (dj_px, di_px)
    AND the drift scales (mj, mi; 1.0 under 'shift') — together these are
    the full affine, so the driver can rebuild the refined dicts for either
    method, then broadcast.  (r3 review: the old coefficient-difference
    de-normalisation was only valid for 'shift' — under 'shift_drift' it
    reported num0*(m-1) + c instead of c and dropped m entirely.)"""

    def fit(g: pd.DataFrame) -> pd.DataFrame:
        ji = np.stack([g["j"].to_numpy(), g["i"].to_numpy()], axis=1)
        xyz = np.stack([g["x"].to_numpy(), g["y"].to_numpy(), g["z"].to_numpy()], axis=1)
        tform = refine_tform(rpc, ji, xyz, method)
        return pd.DataFrame(
            {
                "image": [g["image"].iloc[0]],
                "n_gcps": [len(g)],
                "dj_px": [tform[0, 2] * rpc["samp_scale"]],
                "di_px": [tform[1, 2] * rpc["line_scale"]],
                "mj": [tform[0, 0]],
                "mi": [tform[1, 1]],
            }
        )

    return gcps.groupby("image").map_groups(fit, batch_format="pandas")
