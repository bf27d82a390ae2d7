"""Camera model tests, mirroring the reference suite's strategy
(`tests/test_camera.py:190-205` round trips, `259-271` distort=False ≡
pinhole, `341` Brown ≡ OpenCV, NaN passthrough `275-321`) — seeded."""

import numpy as np
import pytest

from orthority_ray.core.cameras import create_camera
from orthority_ray.core.rotations import (
    aa_to_opk,
    cv_ext_to_oty_ext,
    opk_to_rotation,
    rodrigues,
    rotation_to_opk,
    rpy_to_opk,
)
from orthority_ray.sources import param_io as P

CAMS = {
    "pinhole": {},
    "brown": P.BROWN,
    "opencv": P.OPENCV,
    "fisheye": P.FISHEYE,
}


def _cam(cam_type, **kw):
    return create_camera(
        cam_type, im_size=P.IM_SIZE, focal_len=P.FOCAL, sensor_size=P.SENSOR,
        cx=P.CXY[0], cy=P.CXY[1], xyz=P.XYZ, opk=P.OPK, **CAMS[cam_type], **kw
    )


@pytest.fixture(scope="module")
def pix():
    rng = np.random.default_rng(42)
    j = rng.uniform(0, P.IM_SIZE[0] - 1, 1000)
    i = rng.uniform(0, P.IM_SIZE[1] - 1, 1000)
    z = rng.uniform(700, 950, 1000)
    return j, i, z


@pytest.mark.parametrize("cam_type", list(CAMS))
def test_roundtrip_pixel_world_pixel(cam_type, pix):
    """ref tolerance 0.1 px / 1e-6 z (`test_camera.py:199-200`); we hold 1e-6 px."""
    j, i, z = pix
    cam = _cam(cam_type)
    x, y, zz = cam.pixel_to_world_z(j, i, z)
    assert np.allclose(zz, z, atol=1e-9)
    j2, i2 = cam.world_to_pixel(x, y, zz)
    assert np.abs(j2 - j).max() < 1e-6
    assert np.abs(i2 - i).max() < 1e-6


def test_rpc_roundtrip(pix):
    j, i, z = pix
    cam = create_camera("rpc", im_size=P.IM_SIZE, rpc=P.RPC)
    lon, lat, zz = cam.pixel_to_world_z(j, i, z)
    j2, i2 = cam.world_to_pixel(lon, lat, zz)
    assert np.abs(j2 - j).max() < 1e-6
    assert np.abs(i2 - i).max() < 1e-6


@pytest.mark.parametrize("cam_type", ["brown", "opencv", "fisheye"])
def test_distort_false_equals_pinhole(cam_type, pix):
    """`test_camera.py:259-271` semantics (tolerance 1e-3; ours exact)."""
    j, i, z = pix
    cam = _cam(cam_type, distort=False)
    pin = _cam("pinhole")
    x1, y1, _ = cam.pixel_to_world_z(j, i, z)
    x2, y2, _ = pin.pixel_to_world_z(j, i, z)
    assert np.allclose(x1, x2, atol=1e-9) and np.allclose(y1, y2, atol=1e-9)


def test_brown_equals_opencv_with_matching_coeffs(pix):
    """`test_camera.py:341` semantics: k4..k6=0 OpenCV == Brown."""
    j, i, z = pix
    brown = _cam("brown")
    cv = create_camera(
        "opencv", im_size=P.IM_SIZE, focal_len=P.FOCAL, sensor_size=P.SENSOR,
        cx=P.CXY[0], cy=P.CXY[1], xyz=P.XYZ, opk=P.OPK, **P.BROWN
    )
    x1, y1, _ = brown.pixel_to_world_z(j, i, z)
    x2, y2, _ = cv.pixel_to_world_z(j, i, z)
    assert np.allclose(x1, x2, atol=1e-9) and np.allclose(y1, y2, atol=1e-9)


@pytest.mark.parametrize("cam_type", list(CAMS))
def test_nan_passthrough(cam_type):
    """`test_camera.py:275-321` semantics: NaN in -> NaN out, others clean."""
    cam = _cam(cam_type)
    j = np.array([50.0, np.nan, 120.0])
    i = np.array([40.0, 60.0, np.nan])
    x, y, z = cam.pixel_to_world_z(j, i, 825.0)
    assert np.isnan(x[1]) and np.isnan(y[2])
    assert np.isfinite(x[0]) and np.isfinite(y[0])
    j2, i2 = cam.world_to_pixel(x, y, z)
    assert np.isnan(j2[1]) and np.isnan(i2[2]) and np.isfinite(j2[0])


def test_distort_undistort_roundtrip(pix):
    j, i, _ = pix
    for cam_type in ("brown", "opencv", "fisheye"):
        cam = _cam(cam_type)
        jd, id_ = cam.distort_pixel(j, i)
        ju, iu = cam.undistort_pixel(jd, id_)
        assert np.abs(ju - j).max() < 1e-6


def test_broadcasting_shapes():
    """`test_camera.py:222-257` semantics: N pixels x scalar z, 1 pixel x N z."""
    cam = _cam("pinhole")
    x, y, z = cam.pixel_to_world_z(np.array([10.0, 20.0]), np.array([5.0, 6.0]), 825.0)
    assert x.shape == (2,)
    x, y, z = cam.pixel_to_world_z(np.array([10.0]), np.array([5.0]), np.array([800.0, 825.0, 850.0]))
    assert x.shape == (3,)


def test_horizon_fov():
    cam = _cam("pinhole")
    assert not cam.horizon_fov()
    up = create_camera(
        "pinhole", im_size=P.IM_SIZE, focal_len=P.FOCAL, sensor_size=P.SENSOR,
        xyz=P.XYZ, opk=(np.pi / 2, 0.0, 0.0),
    )
    assert up.horizon_fov()


def test_world_boundary_encloses_projected_points(pix):
    from orthority_ray.core.geometry import shoelace_area

    cam = _cam("pinhole")
    bx, by, _ = cam.world_boundary(825.0)
    assert abs(shoelace_area(np.stack([bx, by], axis=1))) > 0


def test_rotation_conversions_roundtrip():
    opk = tuple(np.radians((-3.0, 2.0, 10.0)))
    R = opk_to_rotation(opk)
    assert np.allclose(R @ R.T, np.eye(3), atol=1e-12)
    assert np.allclose(rotation_to_opk(R), opk, atol=1e-12)


def test_rodrigues_matches_closed_form():
    aa = np.array([0.1, -0.2, 0.3])
    R = rodrigues(aa)
    assert np.allclose(R @ R.T, np.eye(3), atol=1e-12)
    assert np.isclose(np.trace(R), 1 + 2 * np.cos(np.linalg.norm(aa)), atol=1e-12)
    o, p, k = aa_to_opk(aa)
    assert all(np.isfinite((o, p, k)))


def test_cv_ext_roundtrip():
    xyz, opk = cv_ext_to_oty_ext(t=[1.0, 2.0, 3.0], r=[0.05, -0.02, 0.1])
    R = opk_to_rotation(opk)
    assert np.allclose(R @ R.T, np.eye(3), atol=1e-12)


def test_rpy_to_opk_nadir_identity():
    """Nadir RPY (0,0,0) in an ENU-aligned world frame gives a near-identity
    camera-to-world rotation (up to the PATB convention)."""

    def lla_to_world(lon, lat, z):
        return (lon * 111_320.0, lat * 111_320.0, z)

    opk = rpy_to_opk((0.0, 0.0, 0.0), (30.0, 20.0, 100.0), lla_to_world)
    R = opk_to_rotation(opk)
    assert np.allclose(R @ R.T, np.eye(3), atol=1e-9)


def test_gcp_camera_reproduces_gcps_and_roundtrips():
    """GcpCamera (M5): exact at the GCPs (IDW weights collapse there) and
    round-trip-consistent between them."""
    from orthority_ray.core.cameras import GcpCamera

    base = _cam("brown")  # generate GCPs through a DISTORTED camera so the
    # GCP model has a real residual field to interpolate
    rng = np.random.default_rng(42)
    jg = rng.uniform(10, 190, 40)
    ig = rng.uniform(10, 140, 40)
    zg = rng.uniform(750, 900, 40)
    xg, yg, zzg = base.pixel_to_world_z(jg, ig, zg)
    cam = GcpCamera(im_size=P.IM_SIZE,
                    gcps={"ji": np.stack([jg, ig], 1), "xyz": np.stack([xg, yg, zzg], 1)})
    # exact at the control points
    j2, i2 = cam.world_to_pixel(xg, yg, zzg)
    assert np.abs(j2 - jg).max() < 1e-6 and np.abs(i2 - ig).max() < 1e-6
    # round trip between GCPs stays sub-pixel
    jt = rng.uniform(30, 170, 50)
    it = rng.uniform(30, 120, 50)
    zt = rng.uniform(780, 880, 50)
    x, y, z = cam.pixel_to_world_z(jt, it, zt)
    j3, i3 = cam.world_to_pixel(x, y, z)
    assert np.abs(j3 - jt).max() < 0.1 and np.abs(i3 - it).max() < 0.1
