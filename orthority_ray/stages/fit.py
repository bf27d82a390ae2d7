"""Camera fitting: DLT-based PnP / calibration as a per-group solver.

Engine analog of the reference's cv2.solvePnP / calibrateCamera fits
(`orthority/fit.py:158-360`; SURVEY.md §2.6 A7), re-derived from the public
Direct Linear Transform: with >= 6 world<->pixel correspondences per image,
estimate the 3x4 projection matrix by SVD, decompose into K (intrinsics,
RQ), R and camera center, and report reprojection RMS.

Ray shape: ``gcps.groupby("image").map_groups(fit_fn)`` — each image's
control points are one small group; the fitted parameter table is the
output (and would be broadcast back to the geocode stage, like the RPC
refine loop in stages/refine.py).
"""

from __future__ import annotations

import numpy as np
import pandas as pd
import ray.data

from ..core.cameras import FrameCamera
from ..core.rotations import CV_FLIP, rotation_to_opk


def _rq3(M: np.ndarray) -> tuple[np.ndarray, np.ndarray]:
    """RQ decomposition of a 3x3 via flipped QR (standard construction)."""
    P = np.fliplr(np.eye(3))
    Q, R = np.linalg.qr((P @ M).T)
    Rq = P @ R.T @ P
    Qq = P @ Q.T
    # make diag(Rq) positive
    S = np.diag(np.sign(np.diag(Rq)))
    return Rq @ S, S @ Qq


def pnp_dlt(j: np.ndarray, i: np.ndarray, x: np.ndarray, y: np.ndarray, z: np.ndarray) -> dict:
    """DLT PnP: -> dict(K, R_world, T, rms_px).  Needs >= 6 points.

    Conventions match ``core.cameras.FrameCamera``: projection is
    ``ji ~ K · R_world.T · (xyz - T)``.
    """
    n = j.shape[0]
    if n < 6:
        raise ValueError("DLT needs at least 6 correspondences")
    # normalise for conditioning
    jm, im = j.mean(), i.mean()
    js = np.abs(j - jm).mean() or 1.0
    is_ = np.abs(i - im).mean() or 1.0
    xm, ym, zm = x.mean(), y.mean(), z.mean()
    s = np.abs(np.stack([x - xm, y - ym, z - zm])).mean() or 1.0
    jn, iN = (j - jm) / js, (i - im) / is_
    xn, yn, zn = (x - xm) / s, (y - ym) / s, (z - zm) / s

    A = np.zeros((2 * n, 12))
    X = np.stack([xn, yn, zn, np.ones(n)], axis=1)
    A[0::2, 0:4] = X
    A[0::2, 8:12] = -jn[:, None] * X
    A[1::2, 4:8] = X
    A[1::2, 8:12] = -iN[:, None] * X
    _, _, vt = np.linalg.svd(A)
    P = vt[-1].reshape(3, 4)

    # de-normalise
    Tj = np.array([[js, 0, jm], [0, is_, im], [0, 0, 1.0]])
    Tw = np.eye(4)
    Tw[:3, :3] /= s
    Tw[:3, 3] = -np.array([xm, ym, zm]) / s
    P = Tj @ P @ Tw

    M = P[:, :3]
    if np.linalg.det(M) < 0:
        P = -P
        M = P[:, :3]
    K, Rw = _rq3(M)
    K = K / K[2, 2]
    C = -np.linalg.solve(M, P[:, 3])

    cam = object.__new__(FrameCamera)
    cam.K, cam.R, cam.T = K, Rw.T, C
    cam.distort = False
    jj, ii = FrameCamera.world_to_pixel(cam, x, y, z)
    rms = float(np.sqrt(np.mean((jj - j) ** 2 + (ii - i) ** 2)))
    return dict(K=K, R_world=Rw.T, T=C, rms_px=rms)


def calibrate_grouped(gcps: ray.data.Dataset) -> ray.data.Dataset:
    """groupby(image) -> DLT fit -> per-image parameter rows."""

    def fit(g: pd.DataFrame) -> pd.DataFrame:
        r = pnp_dlt(
            g["j"].to_numpy(), g["i"].to_numpy(),
            g["x"].to_numpy(), g["y"].to_numpy(), g["z"].to_numpy(),
        )
        # R_world = opk_to_rotation(opk) @ CV_FLIP (camera convention);
        # CV_FLIP is involutive, so un-flip before extracting angles
        o, p, k = rotation_to_opk(r["R_world"] @ CV_FLIP)
        return pd.DataFrame(
            {
                "image": [g["image"].iloc[0]],
                "n_points": [len(g)],
                "fx": [r["K"][0, 0]], "fy": [r["K"][1, 1]],
                "cx": [r["K"][0, 2]], "cy": [r["K"][1, 2]],
                "pos_x": [r["T"][0]], "pos_y": [r["T"][1]], "pos_z": [r["T"][2]],
                "omega": [o], "phi": [p], "kappa": [k],
                "rms_px": [r["rms_px"]],
            }
        )

    return gcps.groupby("image").map_groups(fit, batch_format="pandas")


def calibration_frames(n: int = 60,
                       images: tuple[str, ...] = ("im_a", "im_b")) -> pd.DataFrame:
    """The synthetic calibration GCP fixture: one pinhole camera, ``n``
    ray-traced points per image (seeds 1, 2, ...).  One shared builder for
    the CLI demo and the oracle-checked query (r3 review: the block was
    duplicated in cli.cmd_calibrate and __ray_entry__.q_calibrate)."""
    from ..core.cameras import create_camera
    from ..sources import param_io as P

    cam = create_camera(
        "pinhole", im_size=P.IM_SIZE, focal_len=P.FOCAL, sensor_size=P.SENSOR,
        cx=P.CXY[0], cy=P.CXY[1], xyz=P.XYZ, opk=P.OPK,
    )
    frames = []
    for seed, img in enumerate(images, start=1):
        r = np.random.default_rng(seed)
        j = r.uniform(5, 195, n)
        i = r.uniform(5, 145, n)
        z = r.uniform(700, 950, n)
        x, y, zz = cam.pixel_to_world_z(j, i, z)
        frames.append(pd.DataFrame(
            {"image": img, "j": j, "i": i, "x": x, "y": y, "z": zz}))
    return pd.concat(frames, ignore_index=True)
