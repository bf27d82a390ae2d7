"""Z-surface tests: bilinear sampling, vertical datums (EGM semantics,
mirroring `tests/test_ortho.py:373-470`), ray-march first-crossing."""

import numpy as np
import pytest

from orthority_ray.core.cameras import create_camera
from orthority_ray.core.zsurface import (
    EGM_MAX,
    EGM_MIN,
    FT_PER_M,
    Z_GAIN,
    Z_OFFSET,
    ZSurface,
    datum_shift,
    geoid_offset,
    pyproj_status,
    z_unit_scale,
)
from orthority_ray.sources import param_io as P

DATUMS = ("ellipsoid", "egm96", "egm2008", "msl_ft")


@pytest.fixture(scope="module")
def zsurf():
    return ZSurface.synthetic()


def test_surface_range(zsurf):
    zmin, zmax = zsurf.min_max()
    assert Z_OFFSET - Z_GAIN - 1 <= zmin <= zmax <= Z_OFFSET + Z_GAIN + 1


def test_bilinear_exact_at_centers(zsurf):
    """sampling at pixel centers returns the grid values exactly."""
    h, w = zsurf.z.shape
    jj = np.array([3, 10, 57, w - 2])
    ii = np.array([2, 8, 40, h - 2])
    x = zsurf.x0 + (jj + 0.5) * zsurf.res
    y = zsurf.y0 - (ii + 0.5) * zsurf.res
    got = zsurf.sample(x, y)
    assert np.allclose(got, zsurf.z[ii, jj], atol=1e-6)


def test_sample_outside_is_nan(zsurf):
    assert np.isnan(zsurf.sample(np.array([zsurf.x0 - 100.0]), np.array([zsurf.y0 + 100.0])))[0]


def test_partial_surface_has_nodata():
    zs = ZSurface.synthetic(partial=True)
    assert np.isnan(zs.z).any() and not np.isnan(zs.z).all()


def test_geoid_offset_within_egm_range():
    rng = np.random.default_rng(42)
    x = rng.uniform(0, 4e4, 10_000)
    y = rng.uniform(0, 6e4, 10_000)
    for flavor in ("egm96", "egm2008"):
        g = geoid_offset(x, y, flavor)
        assert g.min() >= EGM_MIN and g.max() <= EGM_MAX


# tolerance tests run over BOTH datum paths (r3 verdict #3): the pyproj leg
# lights up where a pyproj wheel + PROJ geoid grids exist (reference
# `ortho.py:143-151`) and auto-skips in this sandbox (probe fails closed).
MODES = [
    "standin",
    pytest.param(
        "pyproj",
        marks=pytest.mark.skipif(
            pyproj_status()[0] != "ok",
            reason=f"pyproj probe: {pyproj_status()}")),
]


@pytest.mark.parametrize("mode", MODES)
@pytest.mark.parametrize("datum", DATUMS)
def test_datum_roundtrip(datum, mode):
    rng = np.random.default_rng(7)
    x = rng.uniform(0, 4e4, 100)
    y = rng.uniform(0, 6e4, 100)
    z = rng.uniform(700, 950, 100)
    back = datum_shift(x, y, datum_shift(x, y, z, "ellipsoid", datum, mode=mode),
                       datum, "ellipsoid", mode=mode)
    # real grids interpolate (float32 grids, bilinear); stand-ins are exact
    assert np.allclose(back, z, atol=1e-9 if mode == "standin" else 1e-4)


@pytest.mark.parametrize("mode", MODES)
def test_cross_datum_consistency_within_egm_tolerance(mode):
    """`tests/test_ortho.py:373-470` semantics: the same surface expressed in
    any two datums agrees within the EGM range bound (abs tolerance 106.71)
    — holds for the stand-ins by construction and for the REAL EGM grids by
    the published undulation range."""
    base = ZSurface.synthetic()
    for datum in ("egm96", "egm2008"):
        other = base.with_datum(datum, mode=mode)
        diff = np.abs(base.z.astype(float) - other.z.astype(float))
        assert np.nanmax(diff) <= abs(EGM_MIN) + 1e-6
        # and the shift is invertible
        back = other.with_datum("ellipsoid", mode=mode)
        assert np.allclose(back.z, base.z, atol=1e-3)


@pytest.mark.parametrize("mode", MODES)
def test_msl_ft_unit_scale(mode, monkeypatch):
    monkeypatch.setenv("ORTHORITY_RAY_DATUM", mode)
    assert np.isclose(z_unit_scale("msl_ft", "ellipsoid"), 1 / FT_PER_M, atol=1e-9)
    assert np.isclose(z_unit_scale("ellipsoid", "msl_ft"), FT_PER_M, atol=1e-9)
    assert np.isclose(z_unit_scale("egm96", "ellipsoid"), 1.0, atol=1e-12)


def test_pyproj_plug_point_fails_closed():
    """Explicit mode='pyproj' without grids raises LOUDLY (never silently
    corrupts heights); 'auto' falls back to the stand-ins; unknown mode
    rejected."""
    status = pyproj_status()
    assert status[0] in ("ok", "unavailable", "no-grids")
    x = np.array([1.0])
    if status[0] != "ok":
        with pytest.raises(RuntimeError, match="pyproj"):
            datum_shift(x, x, x, "ellipsoid", "egm96", mode="pyproj")
        got = datum_shift(x, x, x, "ellipsoid", "egm96", mode=None)
        want = datum_shift(x, x, x, "ellipsoid", "egm96", mode="standin")
        assert np.allclose(got, want)
    with pytest.raises(ValueError, match="unknown datum mode"):
        datum_shift(x, x, x, "ellipsoid", "egm96", mode="nope")


def test_raymarch_hits_surface(zsurf):
    """marched points must lie on the surface (sample(x, y) == z) and on the
    pixel ray (world_to_pixel round trip)."""
    cam = create_camera(
        "pinhole", im_size=P.IM_SIZE, focal_len=P.FOCAL, sensor_size=P.SENSOR,
        cx=P.CXY[0], cy=P.CXY[1], xyz=P.XYZ, opk=P.OPK,
    )
    rng = np.random.default_rng(42)
    j = rng.uniform(20, 180, 200)
    i = rng.uniform(20, 130, 200)
    x, y, z = zsurf.raymarch(cam, j, i, n_steps=256)
    zs = zsurf.sample(x, y)
    hit = ~np.isnan(zs)
    assert hit.mean() > 0.9
    assert np.abs(z[hit] - zs[hit]).max() < 1.0  # within one refinement step
    j2, i2 = cam.world_to_pixel(x, y, z)
    assert np.abs(j2 - j).max() < 1e-6 and np.abs(i2 - i).max() < 1e-6


def test_raymarch_monotone_first_crossing(zsurf):
    """the hit is the FIRST crossing: no surface point on the ray strictly
    above the hit z (sampled on a fine ladder)."""
    cam = create_camera(
        "pinhole", im_size=P.IM_SIZE, focal_len=P.FOCAL, sensor_size=P.SENSOR,
        xyz=P.XYZ, opk=P.OPK,
    )
    j = np.array([100.0])
    i = np.array([75.0])
    x, y, z = zsurf.raymarch(cam, j, i, n_steps=512)
    zmax = zsurf.min_max()[1]
    ladder = np.linspace(zmax, z[0] + 0.5, 200)
    xs, ys, _ = cam.pixel_to_world_z(np.full(200, j[0]), np.full(200, i[0]), ladder)
    zs = zsurf.sample(xs, ys)
    above = ladder - zs
    assert np.all(above[~np.isnan(above)] > -0.5)


def test_raymarch_finite_despite_nan_midpoints():
    """Review fix: a ray whose coarse bracket is valid must never return
    NaN because a bisection midpoint sampled the nodata region — the last
    finite high-side diff is kept instead."""
    import numpy as np

    from orthority_ray.core.cameras import create_camera
    from orthority_ray.core.zsurface import ZSurface
    from orthority_ray.sources import param_io as P

    zs = ZSurface.synthetic(partial=True)
    cam = create_camera(
        "pinhole", im_size=P.IM_SIZE, focal_len=P.FOCAL, sensor_size=P.SENSOR,
        xyz=P.XYZ, opk=(0.6, 0.4, 0.1),  # oblique: rays sweep across the grid
    )
    w, h = P.IM_SIZE
    jj, ii = np.meshgrid(np.linspace(0, w - 1, 25), np.linspace(0, h - 1, 25))
    x, y, z = zs.raymarch(cam, jj.ravel(), ii.ravel())
    assert np.isfinite(z).all()  # fallback or crossing, never NaN
    assert np.isfinite(x).all() and np.isfinite(y).all()
