"""DLT PnP / calibration: recover known camera parameters from synthetic
correspondences (mirrors `tests/test_fit.py:302-396` round-trip strategy)."""

import numpy as np
import pandas as pd
import pytest
import ray.data

from orthority_ray.core.cameras import create_camera
from orthority_ray.sources import param_io as P
from orthority_ray.stages.fit import calibrate_grouped, pnp_dlt


def _cam():
    return create_camera(
        "pinhole", im_size=P.IM_SIZE, focal_len=P.FOCAL, sensor_size=P.SENSOR,
        cx=P.CXY[0], cy=P.CXY[1], xyz=P.XYZ, opk=P.OPK,
    )


def _correspondences(n=60, seed=42, noise=0.0):
    cam = _cam()
    rng = np.random.default_rng(seed)
    j = rng.uniform(5, 195, n)
    i = rng.uniform(5, 145, n)
    z = rng.uniform(700, 950, n)
    x, y, zz = cam.pixel_to_world_z(j, i, z)
    if noise:
        j = j + rng.normal(0, noise, n)
        i = i + rng.normal(0, noise, n)
    return j, i, x, y, zz


def test_pnp_dlt_recovers_camera():
    j, i, x, y, z = _correspondences()
    r = pnp_dlt(j, i, x, y, z)
    cam = _cam()
    assert r["rms_px"] < 1e-6
    assert np.allclose(r["T"], P.XYZ, atol=1e-3)
    assert np.allclose(r["K"] / r["K"][2, 2], cam.K, rtol=1e-5)
    assert np.allclose(r["R_world"], cam.R, atol=1e-6)


def test_pnp_dlt_noise_tolerant():
    j, i, x, y, z = _correspondences(n=200, noise=0.2)
    r = pnp_dlt(j, i, x, y, z)
    assert r["rms_px"] < 0.5
    assert np.allclose(r["T"], P.XYZ, atol=50.0)  # 0.2px noise @1km altitude


def test_pnp_dlt_too_few_points():
    j, i, x, y, z = _correspondences(n=5)
    with pytest.raises(ValueError, match="at least 6"):
        pnp_dlt(j, i, x, y, z)


def test_calibrate_grouped():
    frames = []
    for img, seed in (("im_a", 1), ("im_b", 2)):
        j, i, x, y, z = _correspondences(seed=seed)
        frames.append(pd.DataFrame({"image": img, "j": j, "i": i, "x": x, "y": y, "z": z}))
    out = (
        calibrate_grouped(ray.data.from_pandas(pd.concat(frames)))
        .to_pandas()
        .sort_values("image")
        .reset_index(drop=True)
    )
    assert list(out["image"]) == ["im_a", "im_b"]
    assert (out["rms_px"] < 1e-6).all()
    assert np.allclose(out[["pos_x", "pos_y", "pos_z"]].values, [P.XYZ, P.XYZ], atol=1e-3)
    assert np.allclose(out[["omega", "phi", "kappa"]].iloc[0], P.OPK, atol=1e-6)