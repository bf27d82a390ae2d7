"""Streaming covariance vs closed form (`test_pan_sharp.py:285` analog),
GS orthogonality (`:366`), pan normalisation (`:406`)."""

import numpy as np
import pytest

from orthority_ray.sources.pages import read_page_keys
from orthority_ray.stages.geocode import geocode
from orthority_ray.stages.sharpen import (
    BAND_COLS,
    derive_params,
    global_moments,
    gs_forward,
    pan_sharpen,
    synth_bands,
)
from orthority_ray.stages.stats import grouped_covariance, merge_moments, partial_moments


def test_partial_merge_equals_closed_form():
    rng = np.random.default_rng(42)
    x = rng.normal(size=(10_000, 3)) @ np.array([[2, 0.5, 0], [0, 1, 0.3], [0, 0, 0.7]])
    # merge 7 uneven chunks
    splits = np.sort(rng.choice(np.arange(1, 9_999), 6, replace=False))
    acc = (0, np.zeros(3), np.zeros((3, 3)))
    for chunk in np.split(x, splits):
        acc = merge_moments(acc, partial_moments(chunk))
    n, mean, c = acc
    assert n == 10_000
    assert np.allclose(mean, x.mean(axis=0), atol=1e-12)
    assert np.allclose(c / (n - 1), np.cov(x.T), atol=1e-10)


def test_grouped_covariance_matches_duckdb(sf_unit):
    import duckdb

    geo = geocode(read_page_keys(sf_unit))
    out = grouped_covariance(geo, "cell", ["lon", "lat"]).to_pandas()
    out = out.sort_values("cell").reset_index(drop=True)
    pdf = geo.select_columns(["cell", "lon", "lat"]).to_pandas()
    con = duckdb.connect()
    con.register("g", pdf)
    oracle = con.sql(
        """SELECT cell, COUNT(*) n, avg(lon) m_lon, covar_samp(lon, lat) c_xy,
                  var_samp(lon) c_xx FROM g GROUP BY cell ORDER BY cell"""
    ).df()
    assert (out["cell"].values == oracle["cell"].values).all()
    assert (out["n"].values == oracle["n"].values).all()
    assert np.allclose(out["mean_lon"], oracle["m_lon"], atol=1e-9)
    m = oracle["n"].values > 1
    assert np.allclose(out["cov_lon_lat"].values[m], oracle["c_xy"].values[m], atol=1e-9)
    assert np.allclose(out["cov_lon_lon"].values[m], oracle["c_xx"].values[m], atol=1e-9)


@pytest.fixture(scope="module")
def banded_stats(sf_unit):
    import ray

    geo = geocode(read_page_keys(sf_unit))
    import pyarrow as pa

    banded = geo.map_batches(synth_bands, batch_format="pyarrow")
    n, means, c = global_moments(banded)
    pdf = banded.select_columns(BAND_COLS).to_pandas()
    return n, means, c, pdf


def test_global_moments_match_numpy(banded_stats):
    n, means, c, pdf = banded_stats
    x = pdf[BAND_COLS].to_numpy()
    assert n == len(x)
    assert np.allclose(means, x.mean(axis=0), atol=1e-10)
    assert np.allclose(c / (n - 1), np.cov(x.T), atol=1e-8)


def test_gs_components_orthogonal(banded_stats):
    """`test_pan_sharp.py:366` analog: GS components are mutually orthogonal
    in COVARIANCE (the last component may have ~zero variance — k prior
    components already span the k-band space — so correlation is noise)."""
    n, means, c, pdf = banded_stats
    p = derive_params(n, means, c)
    ms = pdf[BAND_COLS[1:]].to_numpy().T
    gs = gs_forward(ms, p.means[1:], p.coeffs, p.weights)
    cc = np.cov(gs)
    off = cc - np.diag(np.diag(cc))
    scale = np.diag(cc).max()
    assert np.abs(off).max() < 1e-9 * scale


def test_pan_norm_gain_bias(banded_stats):
    """`test_pan_sharp.py:406` analog: normalised pan matches simulated pan
    mean/std."""
    n, means, c, pdf = banded_stats
    p = derive_params(n, means, c)
    pan = pdf["pan"].to_numpy()
    norm = p.gain * pan + p.bias
    sim = p.weights @ pdf[BAND_COLS[1:]].to_numpy().T
    assert np.isclose(norm.mean(), sim.mean(), rtol=1e-6)
    assert np.isclose(norm.std(), sim.std(), rtol=1e-6)


def test_pan_sharpen_end_to_end(sf_unit):
    geo = geocode(read_page_keys(sf_unit).limit(3000))
    out = pan_sharpen(geo).to_pandas()
    assert {"sharp_ms0", "sharp_ms1", "sharp_ms2"} <= set(out.columns)
    # sharpened bands stay correlated with the originals
    for b in ("ms0", "ms1", "ms2"):
        cc = np.corrcoef(out[b], out[f"sharp_{b}"])[0, 1]
        assert cc > 0.85
