"""Cell grid index: encode/decode/parent/ring/disk invariants."""

import numpy as np
import pytest

from orthority_ray.core import cells as C
from orthority_ray.core import hashing as H


def test_encode_decode_roundtrip():
    rng = np.random.default_rng(42)
    lon_m = rng.integers(0, H.LON_RANGE, 1000)
    lat_m = rng.integers(0, H.LAT_RANGE, 1000)
    for cs in C.RES_MILLI:
        cell = C.encode(lon_m, lat_m, cs)
        col, row = C.decode(cell, cs)
        assert (col == lon_m // cs).all()
        assert (row == lat_m // cs).all()


def test_parent_consistency():
    rng = np.random.default_rng(7)
    lon_m = rng.integers(0, H.LON_RANGE, 500)
    lat_m = rng.integers(0, H.LAT_RANGE, 500)
    fine = C.encode(lon_m, lat_m, 500)
    coarse = C.encode(lon_m, lat_m, 1000)
    assert (C.parent(fine, 500, 1000) == coarse).all()


def test_ring_sizes_interior():
    # an interior cell: ring r has 8r cells, disk r has (2r+1)^2
    cell = int(C.encode(np.array([180000]), np.array([85000]), 1000)[0])
    assert C.ring(cell, 0).tolist() == [cell]
    for r in (1, 2, 3):
        assert len(C.ring(cell, r)) == 8 * r
        assert len(C.disk(cell, r)) == (2 * r + 1) ** 2


def test_ring_clips_at_world_edge():
    # corner cell (0,0): ring 1 has only 3 neighbors
    assert len(C.ring(0, 1)) == 3


def test_ring_min_dist_bound():
    # every point of every ring-r cell is at least ring_min_dist away
    cs = 500
    cell = int(C.encode(np.array([180000]), np.array([85000]), cs)[0])
    for r in (1, 2, 4):
        bound = C.ring_min_dist_deg(r, cs)
        for rc in C.ring(cell, r, cs):
            lo_lon, lo_lat, hi_lon, hi_lat = C.cell_bounds_milli(int(rc), cs)
            # closest possible approach between the two cell squares
            c_lo, c_la, c_hi, c_ha = C.cell_bounds_milli(cell, cs)
            dx = max(lo_lon - c_hi, c_lo - hi_lon, 0) / 1000.0
            dy = max(lo_lat - c_ha, c_la - hi_lat, 0) / 1000.0
            assert (dx**2 + dy**2) ** 0.5 >= bound - 1e-12


def test_geocode_skew_is_zipfish():
    doc_id = np.arange(200_000, dtype=np.int64)
    h1, _ = H.doc_hashes(doc_id)
    site = H.site_of(h1)
    top10 = np.isin(site, np.arange(10)).mean()
    assert 0.45 < top10 < 0.60  # ~50% of docs on 10 hot sites


def test_sql_parity_geocode_and_cell():
    """numpy geocode == DuckDB SQL geocode, bit for bit."""
    import duckdb

    doc_id = np.arange(0, 50_000, 7, dtype=np.int64)
    lon_m, lat_m = H.geocode_milli(doc_id)
    lon, lat = H.milli_to_deg(lon_m, lat_m)
    cell = C.encode(lon_m, lat_m, C.CELL_SIZE)
    con = duckdb.connect()
    con.register("ids", __import__("pandas").DataFrame({"doc_id": doc_id}))
    q = f"""
      SELECT doc_id, lon_milli, lat_milli, {H.SQL_LON} AS lon, {H.SQL_LAT} AS lat,
             {C.sql_cell_expr()} AS cell
      FROM (SELECT doc_id, {H.SQL_LON_MILLI} AS lon_milli, {H.SQL_LAT_MILLI} AS lat_milli FROM ids)
      ORDER BY doc_id
    """
    out = con.sql(q).fetchnumpy()
    assert (out["lon_milli"] == lon_m).all()
    assert (out["lat_milli"] == lat_m).all()
    assert (out["cell"] == cell).all()
    # bitwise float equality
    assert (out["lon"].view(np.int64) == lon.view(np.int64)).all()
    assert (out["lat"].view(np.int64) == lat.view(np.int64)).all()


def test_pip_sql_parity():
    import duckdb
    import pandas as pd

    from orthority_ray.core.geometry import make_tile_rings, points_in_rings, sql_pip_predicate

    rings = make_tile_rings()
    doc_id = np.arange(0, 30_000, 3, dtype=np.int64)
    lon_m, lat_m = H.geocode_milli(doc_id)
    lon, lat = H.milli_to_deg(lon_m, lat_m)
    mat = points_in_rings(lon, lat, rings)
    con = duckdb.connect()
    con.register("pts", pd.DataFrame({"doc_id": doc_id, "lon": lon, "lat": lat}))
    for t in (0, 1, 5, 17, 63):
        sql_in = con.sql(
            f"SELECT doc_id FROM pts WHERE {sql_pip_predicate(rings[t])} ORDER BY doc_id"
        ).fetchnumpy()["doc_id"]
        np_in = doc_id[mat[:, t]]
        assert (sql_in == np_in).all(), f"tile {t}: {len(sql_in)} vs {len(np_in)}"
    assert mat.sum() > 100  # the join is non-trivial
