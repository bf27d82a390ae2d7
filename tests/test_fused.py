"""Fused flagship == modular flagship (tile routing and join counts)."""

import numpy as np

from orthority_ray.pipelines.fused import fused_headline
from orthority_ray.sources.pages import read_page_keys
from orthority_ray.stages.geocode import geocode
from orthority_ray.stages.pip import pip_join
from orthority_ray.stages.tiles import assign_tiles


def test_fused_matches_modular(sf_unit):
    tiles_f, join_rows_f = fused_headline(sf_unit)
    geo = geocode(read_page_keys(sf_unit))
    tiles_m = assign_tiles(geo).sort_values("cell").reset_index(drop=True)
    tf = tiles_f.sort_values("cell").reset_index(drop=True)
    assert (tf["cell"].values == tiles_m["cell"].values).all()
    assert (tf["n_docs"].values == tiles_m["n_docs"].values).all()
    assert (tf["tile_id"].values == tiles_m["tile_id"].values).all()
    join_rows_m = pip_join(geocode(read_page_keys(sf_unit))).count()
    assert join_rows_f == join_rows_m


def test_fused_replicate_scales_counts(sf_unit):
    t1, j1 = fused_headline(sf_unit, replicate=1)
    t2, j2 = fused_headline(sf_unit, replicate=2)
    assert t2["n_docs"].sum() == 2 * t1["n_docs"].sum()
    assert j2 >= j1  # replicated copies geocode to fresh locations