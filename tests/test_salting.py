"""Skew salting: hot-cell detection + salted two-level aggregate equivalence."""

import numpy as np
import pytest

from orthority_ray.sources.pages import read_page_keys
from orthority_ray.stages.geocode import geocode
from orthority_ray.stages.salting import sample_hot_cells, salted_cell_moments
from orthority_ray.stages.stats import grouped_covariance


def test_hot_cells_detected(sf_small):
    """Each hot site's ±1° jitter spreads over ~4 cells of 1°, so the hottest
    cells hold ~1.5% of docs (~30x the cold-cell median) — the sampler must
    flag a small hot set and only genuinely-hot cells."""
    geo = geocode(read_page_keys(sf_small))
    hot = sample_hot_cells(geo, fraction=0.2, hot_threshold_rows=600)
    assert 1 <= len(hot) <= 40  # a handful of hot-site cells, not ~2k cold ones
    counts = geo.to_pandas().groupby("cell").size()
    top = set(counts.sort_values(ascending=False).head(40).index)
    assert set(hot.tolist()) <= top  # no cold cell was flagged
    top5 = set(counts.sort_values(ascending=False).head(5).index)
    assert len(top5 & set(hot.tolist())) >= 3  # the hottest cells were found


def test_salted_moments_equal_unsalted(sf_unit):
    geo = geocode(read_page_keys(sf_unit))
    hot = sample_hot_cells(geo, fraction=0.3, hot_threshold_rows=50)
    assert len(hot) > 0
    salted = (
        salted_cell_moments(geo, ["lon", "lat"], hot_cells=hot)
        .to_pandas()
        .sort_values("cell")
        .reset_index(drop=True)
    )
    plain = (
        grouped_covariance(geo, "cell", ["lon", "lat"])
        .to_pandas()
        .sort_values("cell")
        .reset_index(drop=True)
    )
    assert (salted["cell"].values == plain["cell"].values).all()
    assert (salted["n"].values == plain["n"].values).all()
    for c in ("mean_lon", "mean_lat", "cov_lon_lat", "cov_lon_lon", "cov_lat_lat"):
        assert np.allclose(salted[c].values, plain[c].values, atol=1e-9), c