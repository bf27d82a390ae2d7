"""OpenSfM reader dialect + page metadata extractor."""

import json

import duckdb
import numpy as np
import pytest

from orthority_ray.core.rotations import opk_to_rotation
from orthority_ray.sources import sql as Q
from orthority_ray.sources.osfm import OsfmReader
from orthority_ray.sources.pages import read_pages
from orthority_ray.stages.metadata import SQL_METADATA, extract_metadata


@pytest.fixture()
def reconstruction(tmp_path):
    doc = [
        {
            "reference_lla": {"latitude": 30.0, "longitude": 20.0, "altitude": 0.0},
            "cameras": {
                "cam0": {
                    "projection_type": "perspective",
                    "width": 200, "height": 150,
                    "focal": 0.8333, "k1": -0.25, "k2": 0.2,
                },
                "sphere": {"projection_type": "spherical", "width": 100, "height": 50},
            },
            "shots": {
                "img1.jpg": {
                    "camera": "cam0",
                    "rotation": [0.05, -0.02, 0.1],
                    "translation": [1.0, 2.0, 3.0],
                },
                "img2.jpg": {
                    "camera": "cam0",
                    "rotation": [0.0, 0.0, 0.0],
                    "translation": [0.0, 0.0, 10.0],
                },
            },
        }
    ]
    f = tmp_path / "reconstruction.json"
    f.write_text(json.dumps(doc))
    return f


def test_osfm_interior(reconstruction):
    rdr = OsfmReader(reconstruction)
    ints = rdr.read_int_param()
    assert set(ints) == {"cam0"}  # spherical skipped
    assert ints["cam0"]["cam_type"] == "brown"
    assert ints["cam0"]["im_size"] == [200, 150]
    assert ints["cam0"]["k1"] == -0.25


def test_osfm_exterior(reconstruction):
    rdr = OsfmReader(reconstruction)
    exts = rdr.read_ext_param()
    assert set(exts) == {"img1.jpg", "img2.jpg"}
    for v in exts.values():
        R = opk_to_rotation(v["opk"])
        assert np.allclose(R @ R.T, np.eye(3), atol=1e-12)
    # identity rotation, translation (0,0,10): camera sits 10 below ref along z
    xyz2 = np.array(exts["img2.jpg"]["xyz"]) - rdr.ref_xyz
    assert np.allclose(xyz2, [0, 0, -10], atol=1e-9)


def test_metadata_matches_oracle(sf_unit):
    ours = (
        extract_metadata(read_pages(sf_unit))
        .to_pandas()
        .sort_values(["doc_id", "seq_id"])
        .reset_index(drop=True)
    )
    con = duckdb.connect()
    for t in ("lineitem", "documents"):
        con.sql(f"CREATE VIEW {t} AS SELECT * FROM '{sf_unit}/{t}.parquet'")
    oracle = (
        con.sql(Q.with_pages(SQL_METADATA) + " ORDER BY doc_id, seq_id").df().reset_index(drop=True)
    )
    assert len(ours) == len(oracle)
    for c in ("doc_id", "site_id", "seq_id", "html_bytes", "ts_hour"):
        assert (ours[c].values == oracle[c].values).all(), c
    # semantic checks
    assert (ours["seq_id"].values == ours["doc_id"].values).all()
    assert (ours["site_id"].values == ours["doc_id"].values % 1000).all()

def test_osfm_fisheye_k4_and_anisotropic_focal(tmp_path):
    """Review fixes: k4 must survive the copy (fisheye_opencv theta term)
    and focal_x != focal_y must reach the camera as a 2-element focal."""
    import json

    from orthority_ray.sources.osfm import OsfmReader

    doc = {
        "cameras": {
            "fe": {
                "projection_type": "fisheye_opencv",
                "width": 100, "height": 80,
                "focal": 0.7, "k1": 0.02, "k2": -0.01, "k3": 0.002,
                "k4": -0.004,
            },
            "br": {
                "projection_type": "brown",
                "width": 120, "height": 90,
                "focal_x": 0.8, "focal_y": 0.85,
                "k1": 0.01, "p1": 0.001,
            },
        },
        "shots": {},
    }
    p = tmp_path / "reconstruction.json"
    p.write_text(json.dumps([doc]))
    params = OsfmReader(p).read_int_param()
    assert params["fe"]["k4"] == -0.004
    assert params["br"]["focal_len"] == [0.8, 0.85]
    # the anisotropic focal must produce distinct fx/fy in K
    from orthority_ray.core.cameras import create_camera

    cam = create_camera(**params["br"], xyz=(0, 0, 100), opk=(0, 0, 0))
    assert cam.K[0, 0] != cam.K[1, 1]


def test_validate_collection_accepts_int_for_float():
    from orthority_ray.sources.param_io import validate_collection

    # integer JSON literals are valid floats (third-party GeoJSON)
    validate_collection([float], [20000, 30000.5, 1000], "xyz")
    try:
        validate_collection([float], [True], "xyz")
        assert False, "bool must not pass as float"
    except ValueError:
        pass
