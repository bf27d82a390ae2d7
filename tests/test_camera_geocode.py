"""Camera-geocode stages: stateless bank path + DEM actor path + SQL parity."""

import duckdb
import numpy as np
import pytest

from orthority_ray.sources import sql as Q
from orthority_ray.sources.pages import read_page_keys
from orthority_ray.stages.camera_geocode import (
    camera_geocode,
    dem_geocode,
    pinhole_geocode_table,
    sql_pinhole_geocode,
)


def _con(sf_dir):
    con = duckdb.connect()
    for t in ("lineitem", "documents"):
        con.sql(f"CREATE VIEW {t} AS SELECT * FROM '{sf_dir}/{t}.parquet'")
    return con


def test_pinhole_geocode_matches_oracle(sf_unit):
    ours = (
        pinhole_geocode_table(read_page_keys(sf_unit))
        .to_pandas()
        .sort_values(["doc_id", "x_mm"])
        .reset_index(drop=True)
    )
    con = _con(sf_unit)
    oracle = (
        con.sql(Q.with_pages(sql_pinhole_geocode()))
        .df()
        .sort_values(["doc_id", "x_mm"])
        .reset_index(drop=True)
    )
    assert len(ours) == len(oracle) > 0
    for c in ("doc_id", "x_mm", "y_mm"):
        assert (ours[c].values == oracle[c].values).all(), c


def test_camera_geocode_all_types(sf_unit):
    out = camera_geocode(read_page_keys(sf_unit).limit(2000)).to_pandas()
    assert set(out["cam_idx"].unique()) == {0, 1, 2, 3}
    assert np.isfinite(out["wx"]).all() and np.isfinite(out["wz"]).all()
    assert np.allclose(out["wz"], 825.0)


def test_dem_geocode_on_surface(sf_unit):
    from orthority_ray.core.zsurface import ZSurface

    out = dem_geocode(read_page_keys(sf_unit).limit(1000)).to_pandas()
    zs = ZSurface.synthetic()
    z_at = zs.sample(out["wx"].to_numpy(), out["wy"].to_numpy())
    hit = ~np.isnan(z_at)
    assert hit.mean() > 0.5  # most rays land on the synthetic surface
    assert np.abs(out["wz"].to_numpy()[hit] - z_at[hit]).max() < 2.0
    zmin, zmax = zs.min_max()
    assert (out["wz"] >= zmin - 1e-6).all() and (out["wz"] <= zmax + 1e-6).all()


def test_dem_geocode_datum_consistency(sf_unit):
    """Stage-level EGM test (mirrors `tests/test_ortho.py:373-470`): the
    ray-marched surface heights across vertical datums stay within the EGM
    range tolerance, and re-expressing back to ellipsoid agrees closely."""
    from orthority_ray.core.zsurface import EGM_MIN

    base = dem_geocode(read_page_keys(sf_unit).limit(800), datum="ellipsoid").to_pandas()
    egm = dem_geocode(read_page_keys(sf_unit).limit(800), datum="egm96").to_pandas()
    a = base.sort_values("doc_id").reset_index(drop=True)
    b = egm.sort_values("doc_id").reset_index(drop=True)
    assert (a["doc_id"].values == b["doc_id"].values).all()
    dz = np.abs(a["wz"].values - b["wz"].values)
    assert dz.max() <= abs(EGM_MIN) + 1e-6  # cross-datum bound (`ortho.py:80`)
    assert dz.mean() > 1.0  # the datum shift is real, not a no-op
