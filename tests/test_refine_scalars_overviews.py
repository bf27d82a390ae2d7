"""RPC refine analog, scalar utilities, overview pyramid."""

import numpy as np
import pandas as pd
import pytest
import ray.data

from orthority_ray.functions.scalars import (
    convert_array_dtype,
    dms_to_decimal,
    expand_window_to_grid,
    gsd_estimate,
    nan_equals,
    utm_crs_from_latlon,
)
from orthority_ray.sources import param_io as P
from orthority_ray.stages.refine import make_gcp_table, refine_rpc, refine_rpc_grouped


def test_refine_rpc_recovers_planted_shift():
    """mirrors `tests/test_fit.py:46-91`: a planted pixel shift must be
    recovered by the 'shift' LSQ and folded into the coefficients."""
    from orthority_ray.core.cameras import RpcCamera

    cam = RpcCamera(im_size=None, rpc=P.RPC)
    rng = np.random.default_rng(42)
    j = rng.uniform(10, 190, 50)
    i = rng.uniform(10, 140, 50)
    z = rng.uniform(700, 950, 50)
    lon, lat, zz = cam.pixel_to_world_z(j, i, z)
    dj, di = 3.0, -2.0
    ji = np.stack([j + dj, i + di], axis=1)
    xyz = np.stack([lon, lat, zz], axis=1)
    refined = refine_rpc(P.RPC, ji, xyz, "shift")
    cam2 = RpcCamera(im_size=None, rpc=refined)
    j2, i2 = cam2.world_to_pixel(lon, lat, zz)
    assert np.abs(j2 - (j + dj)).max() < 1e-6
    assert np.abs(i2 - (i + di)).max() < 1e-6


def test_refine_rpc_shift_drift():
    from orthority_ray.core.cameras import RpcCamera

    cam = RpcCamera(im_size=None, rpc=P.RPC)
    rng = np.random.default_rng(7)
    j = rng.uniform(10, 190, 80)
    i = rng.uniform(10, 140, 80)
    z = rng.uniform(700, 950, 80)
    lon, lat, zz = cam.pixel_to_world_z(j, i, z)
    # planted drift: measured = true * m + c in normalised space is
    # equivalent to an affine in pixel space
    jm = j * 1.01 + 2.0
    im = i * 0.99 - 1.0
    refined = refine_rpc(P.RPC, np.stack([jm, im], 1), np.stack([lon, lat, zz], 1), "shift_drift")
    cam2 = RpcCamera(im_size=None, rpc=refined)
    j2, i2 = cam2.world_to_pixel(lon, lat, zz)
    assert np.abs(j2 - jm).max() < 0.35  # drift fit is approximate in pixel space
    assert np.abs(i2 - im).max() < 0.35


def test_refine_grouped_per_image():
    gcps = make_gcp_table(P.RPC, n=40, dj=2.5, di=-1.5)
    out = (
        refine_rpc_grouped(ray.data.from_pandas(gcps), P.RPC, "shift")
        .to_pandas()
        .sort_values("image")
        .reset_index(drop=True)
    )
    assert list(out["image"]) == ["im_a", "im_b"]
    assert np.allclose(out["dj_px"], [2.5, 5.0], atol=1e-6)
    assert np.allclose(out["di_px"], [-1.5, -3.0], atol=1e-6)


def test_nan_equals():
    a = np.array([1.0, np.nan, 2.0])
    b = np.array([1.0, np.nan, 3.0])
    assert nan_equals(a, b).tolist() == [True, True, False]


def test_convert_array_dtype():
    a = np.array([-1.6, 0.4, 255.7, np.nan])
    out = convert_array_dtype(a, "uint8")
    assert out.dtype == np.uint8
    assert out.tolist() == [0, 0, 255, 0]
    out16 = convert_array_dtype(np.array([np.nan, 1.2]), "int16")
    assert out16[0] == np.iinfo("int16").min


def test_expand_window_to_grid():
    assert expand_window_to_grid(3.2, 10.1, 1) == (3, 11)
    assert expand_window_to_grid(3.2, 10.1, 4) == (0, 16)


def test_utm_crs():
    assert utm_crs_from_latlon(-33.9, 18.4) == "EPSG:32734"  # Cape Town
    assert utm_crs_from_latlon(52.5, 13.4) == "EPSG:32633"  # Berlin


def test_dms_to_decimal():
    assert dms_to_decimal((52, 30, 0), "N") == pytest.approx(52.5)
    assert dms_to_decimal((33, 54, 0), "S") == pytest.approx(-33.9)


def test_gsd_estimate():
    px = np.array([[0, 0], [10, 0], [10, 10], [0, 10]], dtype=float)
    world = px * 2.5
    assert gsd_estimate(px, world) == pytest.approx(2.5)


def test_overview_pyramid(sf_unit):
    from orthority_ray.sources.pages import read_page_keys
    from orthority_ray.stages.geocode import geocode
    from orthority_ray.stages.overviews import overview_pyramid

    pyr = overview_pyramid(geocode(read_page_keys(sf_unit)))
    sizes = sorted(pyr.keys())
    assert sizes == [500, 1000, 2000, 8000]
    totals = {cs: pyr[cs]["n_docs"].sum() for cs in sizes}
    assert len(set(totals.values())) == 1  # every level preserves the count
    assert len(pyr[500]) >= len(pyr[1000]) >= len(pyr[2000]) >= len(pyr[8000])

def test_convert_array_dtype_general_targets():
    # r3 review: any int target outside the sentinel table raised KeyError
    out = convert_array_dtype(np.array([1.4, 2.6]), "int32")
    assert out.dtype == np.int32 and out.tolist() == [1, 3]
    assert convert_array_dtype(np.array([np.nan, 5.0]), "int64")[0] == np.iinfo("int64").min
    assert convert_array_dtype(np.array([np.nan]), "uint32")[0] == 0
    # integer source passes through with a clip, no float round-trip
    big = np.array([2**62, -7], dtype=np.int64)
    assert convert_array_dtype(big, "int64").tolist() == [2**62, -7]


def test_refine_grouped_shift_drift_reports_true_shift():
    # r3 review: under shift_drift the old de-normalisation reported
    # num0*(m-1)+c instead of c and dropped the drift scale entirely

    gcps = make_gcp_table(P.RPC, n=60, dj=2.5, di=-1.5, images=("im_a",))
    out = (
        refine_rpc_grouped(ray.data.from_pandas(gcps), P.RPC, "shift_drift")
        .to_pandas()
    )
    # a pure planted shift must come back as (shift ~= planted, scale ~= 1)
    assert np.allclose(out["dj_px"], [2.5], atol=0.05)
    assert np.allclose(out["di_px"], [-1.5], atol=0.05)
    assert np.allclose(out["mj"], [1.0], atol=1e-3)
    assert np.allclose(out["mi"], [1.0], atol=1e-3)
