"""Angle / rotation conversions (SURVEY.md §2.3 F1-F6).

Re-derivations of the standard photogrammetry conversions the reference uses
(`orthority/param_io.py:703-856`), from the public Pix4D OPK/RPY conventions
document and the Rodrigues formula — implemented without cv2.

Conventions (same as the reference so parameter files mean the same thing):
- OPK (omega, phi, kappa) rotates camera (PATB: x->right, y->up, z->back)
  to world; R = Rx(omega) @ Ry(phi) @ Rz(kappa).
- RPY (roll, pitch, yaw) rotates body to navigation; R = Rz @ Ry @ Rx.
- CV convention (x->right, y->down, z->forward) = PATB @ diag(1, -1, -1).
"""

from __future__ import annotations

import numpy as np

CV_FLIP = np.diag([1.0, -1.0, -1.0])


def _rx(a: float) -> np.ndarray:
    c, s = np.cos(a), np.sin(a)
    return np.array([[1, 0, 0], [0, c, -s], [0, s, c]])


def _ry(a: float) -> np.ndarray:
    c, s = np.cos(a), np.sin(a)
    return np.array([[c, 0, s], [0, 1, 0], [-s, 0, c]])


def _rz(a: float) -> np.ndarray:
    c, s = np.cos(a), np.sin(a)
    return np.array([[c, -s, 0], [s, c, 0], [0, 0, 1]])


def rpy_to_rotation(rpy) -> np.ndarray:
    """(roll, pitch, yaw) radians -> body-to-navigation rotation (Rz·Ry·Rx)."""
    roll, pitch, yaw = rpy
    return _rz(yaw) @ _ry(pitch) @ _rx(roll)


def opk_to_rotation(opk) -> np.ndarray:
    """(omega, phi, kappa) radians -> camera(PATB)-to-world rotation (Rx·Ry·Rz)."""
    o, p, k = opk
    return _rx(o) @ _ry(p) @ _rz(k)


def rotation_to_opk(R: np.ndarray) -> tuple[float, float, float]:
    """Inverse of :func:`opk_to_rotation` (atan2/arcsin extraction)."""
    omega = float(np.arctan2(-R[1, 2], R[2, 2]))
    phi = float(np.arcsin(R[0, 2]))
    kappa = float(np.arctan2(-R[0, 1], R[0, 0]))
    return omega, phi, kappa


def rodrigues(aa: np.ndarray) -> np.ndarray:
    """Angle-axis vector -> rotation matrix (Rodrigues formula, no cv2)."""
    aa = np.asarray(aa, dtype=np.float64)
    theta = float(np.linalg.norm(aa))
    if theta < 1e-15:
        return np.eye(3)
    k = aa / theta
    K = np.array([[0, -k[2], k[1]], [k[2], 0, -k[0]], [-k[1], k[0], 0]])
    return np.eye(3) + np.sin(theta) * K + (1 - np.cos(theta)) * (K @ K)


def aa_to_opk(aa) -> tuple[float, float, float]:
    """OpenSfM/OpenCV angle-axis -> OPK (transpose + PATB flip)."""
    R = rodrigues(np.asarray(aa)).T @ CV_FLIP
    return rotation_to_opk(R)


def cv_ext_to_oty_ext(t, r, ref_xyz=None) -> tuple[tuple, tuple]:
    """OpenCV (r, t) vectors -> camera world position + OPK angles."""
    R = rodrigues(np.asarray(r)).T
    xyz = (-R @ np.asarray(t, dtype=np.float64).reshape(3)).reshape(3)
    if ref_xyz is not None:
        xyz = xyz + np.asarray(ref_xyz, dtype=np.float64)
    opk = rotation_to_opk(R @ CV_FLIP)
    return tuple(xyz.tolist()), opk


def rpy_to_opk(rpy, lla, lla_to_world, C_bB=None) -> tuple[float, float, float]:
    """RPY -> OPK for a world frame defined by ``lla_to_world(lon, lat, z)``.

    ``lla_to_world`` is any callable mapping geographic to world coordinates
    (the engine's CRS-probe stand-in for rasterio.warp.transform); the north
    direction is estimated by a +/-1e-7 deg finite difference in latitude,
    like the reference (`orthority/param_io.py:813-820`).
    """
    lat, lon, alt = lla
    delta = 1e-7
    p1 = np.asarray(lla_to_world(lon, lat + delta, alt), dtype=np.float64)
    p2 = np.asarray(lla_to_world(lon, lat - delta, alt), dtype=np.float64)
    x_np = p1 - p2
    x_np = x_np / np.linalg.norm(x_np)
    z_np = np.array([0.0, 0.0, -1.0])
    y_np = np.cross(z_np, x_np)
    C_En = np.stack([x_np, y_np, z_np], axis=1)
    C_nb = rpy_to_rotation(rpy)
    C_bB = np.asarray(C_bB) if C_bB is not None else np.array(
        [[0.0, 1.0, 0.0], [1.0, 0.0, 0.0], [0.0, 0.0, -1.0]]
    )
    return rotation_to_opk(C_En @ C_nb @ C_bB)
