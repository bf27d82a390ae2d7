"""Remap stage: projection + sampling accuracy, mask semantics, undistort
grids, and SQL oracle parity (mirrors `tests/test_camera.py:1024-1255`
remap accuracy strategy)."""

import duckdb
import numpy as np
import pytest

from orthority_ray.sources import sql as Q
from orthority_ray.sources.pages import read_page_keys
from orthority_ray.stages.camera_geocode import camera_geocode
from orthority_ray.stages.remap import Remapper, checkerboard, remap, remap_checker_table, sql_remap_checker


def test_checkerboard_pattern():
    img = checkerboard((16, 16))
    assert img[0, 0] == 0 and img[0, 8] == 1 and img[8, 8] == 0


def test_remap_roundtrip_recovers_own_pixel(sf_unit):
    """flat-z geocode -> remap projects each doc back to its OWN (j, i):
    the sampled checker equals the checker at the doc's source pixel."""
    from orthority_ray.stages.camera_geocode import doc_pixels

    geo = camera_geocode(read_page_keys(sf_unit).limit(3000))
    out = remap(geo, interp="nearest").to_pandas()
    doc_id = out["doc_id"].to_numpy()
    j, i, _ = doc_pixels(doc_id)
    ok = out["valid"].to_numpy()
    assert ok.mean() > 0.95
    assert np.abs(out["src_j"].to_numpy()[ok] - j[ok]).max() < 1e-6
    img = checkerboard()
    # nearest = ROUND (floor(x+0.5), cv2 INTER_NEAREST semantics); skip
    # samples within round-trip noise of a .5 tie boundary, where the
    # original and round-tripped coordinate may legitimately round apart
    tie = (np.abs((j % 1.0) - 0.5) < 1e-6) | (np.abs((i % 1.0) - 0.5) < 1e-6)
    m = ok & ~tie
    expect = img[np.floor(i[m] + 0.5).astype(int), np.floor(j[m] + 0.5).astype(int)]
    assert (out["value"].to_numpy()[m] == expect).all()


def test_remap_bilinear_smooth(sf_unit):
    geo = camera_geocode(read_page_keys(sf_unit).limit(2000))
    out = remap(geo, interp="bilinear").to_pandas()
    v = out["value"].to_numpy()
    ok = ~np.isnan(v)
    assert ((v[ok] >= 0) & (v[ok] <= 1)).all()
    assert ((v[ok] > 0) & (v[ok] < 1)).any()  # interpolated values exist


def _ref_cubic_1d(p, f, a=-0.75):
    """Direct 4-tap cubic convolution at fractional offset f over points p."""
    def W(t):
        x = abs(t)
        if x <= 1:
            return ((a + 2) * x - (a + 3)) * x * x + 1
        if x < 2:
            return ((a * x - 5 * a) * x + 8 * a) * x - 4 * a
        return 0.0

    return sum(p[k + 1] * W(f - k) for k in range(-1, 3))


@pytest.mark.parametrize("interp", ["cubic", "lanczos"])
def test_kernel_interp_exact_at_nodes_and_linear(interp):
    """Cubic/Lanczos sampling: exact at integer nodes; cubic reproduces a
    linear ramp exactly (Keys kernel linear precision); both stay finite and
    flag out-of-support samples invalid."""
    r = Remapper(interp=interp)
    # linear ramp image
    h, w = 40, 50
    ii, jj = np.meshgrid(np.arange(h), np.arange(w), indexing="ij")
    r.image = (2.0 * jj + 3.0 * ii).astype(np.float64)
    # integer nodes (away from border)
    js = np.array([5.0, 10.0, 20.0, 30.0])
    is_ = np.array([6.0, 12.0, 18.0, 30.0])
    vals, valid = r._sample(js, is_)
    assert valid.all()
    np.testing.assert_allclose(vals, 2.0 * js + 3.0 * is_, atol=1e-9)
    # fractional positions: near-linear (a=-0.75 trades a little linear
    # precision for sharpness — only a=-0.5 Catmull-Rom is linear-exact)
    jf = js + 0.37
    if_ = is_ + 0.61
    vals, valid = r._sample(jf, if_)
    assert valid.all()
    np.testing.assert_allclose(vals, 2.0 * jf + 3.0 * if_, rtol=2e-3)
    # full support must fit: near-border samples are invalid
    edge = 0.5 if interp == "cubic" else 2.5
    _, v_edge = r._sample(np.array([edge]), np.array([10.0]))
    assert not v_edge.any()


def test_cubic_matches_direct_convolution():
    rng = np.random.default_rng(3)
    r = Remapper(interp="cubic")
    r.image = rng.uniform(0, 255, (20, 20))
    j, i = 7.3, 11.8
    j0, i0 = int(np.floor(j)), int(np.floor(i))
    fj, fi = j - j0, i - i0
    rows = [_ref_cubic_1d(r.image[i0 + k, j0 - 1 : j0 + 3], fj) for k in range(-1, 3)]
    want = _ref_cubic_1d(np.array(rows), fi)
    got, valid = r._sample(np.array([j]), np.array([i]))
    assert valid.all()
    np.testing.assert_allclose(got[0], want, rtol=1e-12)


def test_remap_cubic_on_checker(sf_unit):
    """End-to-end cubic remap over the pipeline fixture: finite where the
    4x4 support fits, overshoot bounded by the kernel's Lebesgue constant."""
    geo = camera_geocode(read_page_keys(sf_unit).limit(2000))
    out = remap(geo, interp="cubic").to_pandas()
    v = out["value"].to_numpy()
    ok = out["valid"].to_numpy()
    assert ok.mean() > 0.9
    assert np.isfinite(v[ok]).all()
    assert (v[ok] > -0.25).all() and (v[ok] < 1.25).all()  # bounded overshoot


def test_undistort_grid_cached():
    r = Remapper()
    g1 = r.undistort_grid("brown")
    g2 = r.undistort_grid("brown")
    assert g1 is g2
    assert g1[0].shape == (150, 200) and g1[0].dtype == np.float32
    # distorted positions differ from identity away from the center
    jj = np.arange(200, dtype=np.float32)
    assert np.abs(g1[0][10] - jj).max() > 0.5


def test_remap_via_undistorted_matches_direct(sf_unit):
    """St2 production path (reference distort=False remap: undistort the
    source once through the cached grids, then pinhole-only projection):
    identical to the direct distorted remap for the pinhole camera, and a
    sane bounded resampling elsewhere."""
    from orthority_ray.stages.camera_geocode import doc_pixels

    geo = camera_geocode(read_page_keys(sf_unit).limit(3000))
    direct = remap(geo, interp="bilinear").to_pandas().sort_values("doc_id").reset_index(drop=True)
    via = (
        remap(geo, interp="bilinear", via_undistorted=True)
        .to_pandas()
        .sort_values("doc_id")
        .reset_index(drop=True)
    )
    assert (direct["doc_id"].values == via["doc_id"].values).all()
    cam_idx = doc_pixels(direct["doc_id"].to_numpy())[2]
    both = direct["valid"].to_numpy() & via["valid"].to_numpy()
    # pinhole: undistort grid is the identity and distort=False == distort=True,
    # so the two paths agree exactly wherever both sampled in-frame
    pin = both & (cam_idx == 0)
    assert pin.sum() > 200
    np.testing.assert_array_equal(
        direct["value"].to_numpy()[pin], via["value"].to_numpy()[pin]
    )
    # distorted models: double interpolation, values stay in the checker range
    v = via["value"].to_numpy()[both]
    assert np.isfinite(v).all() and (v >= 0).all() and (v <= 1).all()
    assert both.mean() > 0.8  # distorted cameras lose a NaN margin in the undistorted frame
    # the undistorted image is built once per camera and cached
    r = Remapper(interp="bilinear", via_undistorted=True)
    u1 = r.undistort_image("brown")
    assert r.undistort_image("brown") is u1
    # pinhole undistorted image == source away from the bilinear border
    up = r.undistort_image("pinhole")
    np.testing.assert_array_equal(up[:-1, :-1], r.image[:-1, :-1])


def test_remap_checker_matches_oracle(sf_unit):
    ours = (
        remap_checker_table(read_page_keys(sf_unit))
        .to_pandas()
        .sort_values(["doc_id", "jn", "in_"])
        .reset_index(drop=True)
    )
    con = duckdb.connect()
    for t in ("lineitem", "documents"):
        con.sql(f"CREATE VIEW {t} AS SELECT * FROM '/root/testdata/sf0.001/{t}.parquet'")
    oracle = (
        con.sql(Q.with_pages(sql_remap_checker()) + " ORDER BY doc_id, jn, in_")
        .df()
        .reset_index(drop=True)
    )
    assert len(ours) == len(oracle) > 0
    for c in ("doc_id", "jn", "in_", "checker"):
        assert (ours[c].values == oracle[c].values).all(), c

def test_remap_dtype_option(sf_unit):
    """process-options dtype matrix parity (`test_ortho.py:663-1160`): the
    sampled value converts round+clip+cast with NaN -> nodata sentinel."""
    geo = camera_geocode(read_page_keys(sf_unit).limit(1000))
    out = remap(geo, interp="bilinear", out_dtype="uint8").to_pandas()
    v = out["value"].to_numpy()
    assert np.isin(v, [0.0, 1.0]).all()  # bilinear rounds to {0,1}; NaN -> 0


def test_average_interp_matches_block_downsample():
    """`average` interp (reference Interp enum's remap-time average,
    enums.py:82-109): sampling each 2x2 block's center must reproduce the
    2x2 box-mean downsample exactly, and invalidity follows the bilinear
    border rule."""
    rng = np.random.default_rng(11)
    r = Remapper(interp="average")
    h, w = 40, 48
    r.image = rng.uniform(0.0, 255.0, (h, w))
    # centers of 2x2 blocks: (2c+0.5, 2r+0.5) -> floor = block corner
    cols = np.arange(0, w // 2 - 1)
    rows = np.arange(0, h // 2 - 1)
    jj, ii = np.meshgrid(2 * cols + 0.5, 2 * rows + 0.5)
    vals, valid = r._sample(jj.ravel(), ii.ravel())
    assert valid.all()
    block = r.image[: h - h % 2, : w - w % 2].reshape(h // 2, 2, w // 2, 2).mean(axis=(1, 3))
    np.testing.assert_allclose(
        vals.reshape(len(rows), len(cols)),
        block[: len(rows), : len(cols)],
        rtol=1e-12,  # summation-order float noise only
    )
    # border rule identical to bilinear: last row/col of pixels invalid
    _, v_edge = r._sample(np.array([w - 1.0 + 0.25]), np.array([5.0]))
    assert not v_edge.any()
