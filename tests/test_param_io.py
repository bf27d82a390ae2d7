"""Parameter IO: YAML/GeoJSON round trips, schema validation, CSV dialects
(mirrors the reference's `tests/test_param_io.py` strategy)."""

import numpy as np
import pytest

from orthority_ray.sources import param_io as P
from orthority_ray.sources.csv_reader import CsvReader


def test_int_param_yaml_roundtrip(tmp_path):
    params = P.int_param_dict()
    f = tmp_path / "int.yaml"
    P.write_int_param(f, params)
    assert P.read_int_param(f) == params
    with pytest.raises(FileExistsError):
        P.write_int_param(f, params)
    P.write_int_param(f, params, overwrite=True)


def test_ext_param_geojson_roundtrip(tmp_path):
    params = P.ext_param_dict()
    f = tmp_path / "ext.geojson"
    P.write_ext_param_geojson(f, params)
    back = P.read_ext_param_geojson(f)
    assert back.keys() == params.keys()
    for k in params:
        assert np.allclose(back[k]["xyz"], params[k]["xyz"])
        assert np.allclose(back[k]["opk"], params[k]["opk"])


def test_validate_collection_errors():
    with pytest.raises(ValueError, match="missing key"):
        P.validate_collection({...: dict(cam_type=str)}, {"a": {}})
    with pytest.raises(ValueError, match="expected int"):
        P.validate_collection({...: dict(n=int)}, {"a": {"n": "x"}})
    assert P.validate_collection(P.INT_SCHEMA, P.int_param_dict())
    assert P.validate_collection(P.EXT_SCHEMA, P.ext_param_dict())


def test_camera_bank_builds_all_types():
    bank = P.build_camera_bank()
    assert set(bank) == {"pinhole", "brown", "opencv", "fisheye", "rpc"}
    j, i = bank["pinhole"].world_to_pixel(
        np.array([2e4]), np.array([3e4]), np.array([825.0])
    )
    assert np.isfinite(j).all()


def test_csv_reader_projected_xyz_opk(tmp_path):
    f = tmp_path / "ext.csv"
    f.write_text(
        "filename,x,y,z,omega,phi,kappa\n"
        "img1.tif,20000,30000,1000,-3,2,10\n"
        "img2.tif,20100,30100,1010,-3,2,10\n"
    )
    f.with_suffix(".prj").write_text("EPSG:32634")
    rdr = CsvReader(f)
    assert rdr.has_header
    params, crs = rdr.read_ext_param()
    assert crs == "EPSG:32634"
    assert params["img1.tif"]["xyz"] == [20000.0, 30000.0, 1000.0]
    assert np.allclose(params["img1.tif"]["opk"], np.radians([-3, 2, 10]))


def test_csv_reader_headerless_space_delimited(tmp_path):
    f = tmp_path / "ext.txt"
    f.write_text("img1.tif 20000 30000 1000 -3 2 10\nimg2.tif 20100 30100 1010 0 0 0\n")
    params, crs = CsvReader(f, crs="EPSG:32634").read_ext_param()
    assert len(params) == 2 and crs == "EPSG:32634"


def test_csv_reader_latlon_auto_utm(tmp_path):
    """A4: auto-UTM from mean lat/lon (`param_io.py:1061-1076` semantics)."""
    f = tmp_path / "lla.csv"
    f.write_text(
        "filename;lat;lon;z;omega;phi;kappa\n"
        "a.tif;-33.9;18.4;100;0;0;0\n"
        "b.tif;-33.8;18.5;110;0;0;0\n"
    )
    params, crs = CsvReader(f).read_ext_param()
    assert crs == "EPSG:32734"
    assert len(params) == 2


def test_csv_reader_rpy_dialect(tmp_path):
    f = tmp_path / "rpy.csv"
    f.write_text(
        "filename,lat,lon,z,roll,pitch,yaw\n"
        "a.tif,52.5,13.4,120,0,0,90\n"
    )
    params, crs = CsvReader(f).read_ext_param()
    assert crs == "EPSG:32633"
    from orthority_ray.core.rotations import opk_to_rotation

    R = opk_to_rotation(params["a.tif"]["opk"])
    assert np.allclose(R @ R.T, np.eye(3), atol=1e-9)

def test_read_param_files_parallel(tmp_path):
    """S7: many param files parsed in parallel Ray tasks; every (file,
    camera) row surfaces with validated content."""
    import json

    from orthority_ray.sources.param_io import (
        int_param_dict,
        read_param_files,
        write_int_param,
    )

    params = int_param_dict()
    paths = []
    for k in range(12):
        p = tmp_path / f"int_{k}.yaml"
        write_int_param(p, params)
        paths.append(p)
    out = read_param_files(paths).to_pandas()
    assert len(out) == 12 * len(params)
    assert set(out["camera"]) == set(params)
    row = out.iloc[0]
    assert json.loads(row["params_json"])["cam_type"] == params[row["camera"]]["cam_type"]


def test_read_param_files_malformed_raises(tmp_path):
    import pytest as _pytest

    from orthority_ray.sources.param_io import read_param_files

    bad = tmp_path / "bad.yaml"
    bad.write_text("not: [a, param, file]")
    with _pytest.raises(Exception):
        read_param_files([bad]).to_pandas()
