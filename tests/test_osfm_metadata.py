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


class TestTiffDialect:
    """Real-bytes TIFF IFD dialect (stages/metadata.py; reference
    orthority/exif.py:101-363 tag walk)."""

    def test_roundtrip_both_byte_orders(self):
        from orthority_ray.stages.metadata import parse_tiff_ifd, write_tiff_ifd

        tags = {
            0x0100: (4, 4096),           # LONG inline
            0x0101: (4, 3072),
            0x010D: (2, "hello-tiff"),   # ASCII, offset (11 bytes > 4)
            0x0129: (3, [2, 9]),         # SHORT x2, inline (4 bytes)
            0x0006: (5, (123456, 100)),  # RATIONAL, offset
            0x9999: (10, (-5, 2)),       # SRATIONAL, offset
        }
        for bo in ("<", ">"):
            blob = write_tiff_ifd(tags, byte_order=bo)
            assert blob[:2] == (b"II" if bo == "<" else b"MM")
            got = parse_tiff_ifd(blob)
            assert got[0x0100] == 4096
            assert got[0x0101] == 3072
            assert got[0x010D] == "hello-tiff"
            assert got[0x0129] == [2, 9]
            assert got[0x0006] == (123456, 100)
            assert got[0x9999] == (-5, 2)

    def test_single_byte_and_long_ascii(self):
        from orthority_ray.stages.metadata import parse_tiff_ifd, write_tiff_ifd

        blob = write_tiff_ifd({0x0001: (1, 7), 0x0002: (2, "x" * 99)})
        got = parse_tiff_ifd(blob)
        assert got[0x0001] == 7
        assert got[0x0002] == "x" * 99

    def test_rejects_non_tiff(self):
        import pytest as _pytest

        from orthority_ray.stages.metadata import parse_tiff_ifd

        with _pytest.raises(ValueError):
            parse_tiff_ifd(b"PK\x03\x04 not a tiff")
        with _pytest.raises(ValueError):
            parse_tiff_ifd(b"II\x00\x00\x08\x00\x00\x00")  # bad magic

    def test_unknown_type_skipped(self):
        import struct as _struct

        from orthority_ray.stages.metadata import parse_tiff_ifd, write_tiff_ifd

        blob = bytearray(write_tiff_ifd({0x0100: (4, 10)}))
        # splice in a second entry with an unknown type id (13)
        # simpler: build a 2-entry IFD by hand
        bo = "<"
        e1 = _struct.pack(bo + "HHI", 0x0100, 4, 1) + _struct.pack(bo + "I", 10)
        e2 = _struct.pack(bo + "HHI", 0x0200, 13, 1) + b"\x00\x00\x00\x00"
        raw = (b"II" + _struct.pack(bo + "HI", 42, 8)
               + _struct.pack(bo + "H", 2) + e1 + e2 + _struct.pack(bo + "I", 0))
        got = parse_tiff_ifd(raw)
        assert got == {0x0100: 10}

    def test_stage_over_pages(self, ray_session):
        from orthority_ray.sources.pages import read_pages
        from orthority_ray.stages.metadata import (
            parse_tiff_ifd,
            tiff_metadata,
        )

        out = tiff_metadata(
            read_pages("/root/testdata/sf0.001").limit(512)
        ).to_pandas()
        assert len(out) == 512
        assert out["document_name"].str.startswith("doc-").all()
        # blobs are genuine TIFF: re-parse a few driver-side
        for _, row in out.head(8).iterrows():
            tags = parse_tiff_ifd(row["tiff"])
            assert tags[0x010D] == f"doc-{row['doc_id']}"
            assert tags[0x0100] == row["image_width"]


    def test_multi_count_rational(self):
        # r3 review: RATIONAL/SRATIONAL with count>1 (the GPS DMS triplet
        # shape) decoded only the first pair
        from orthority_ray.stages.metadata import parse_tiff_ifd, write_tiff_ifd

        import struct

        for bo in ("<", ">"):
            raw = struct.pack(bo + "II" * 3, 52, 1, 30, 1, 1234, 100)
            blob = write_tiff_ifd({}, byte_order=bo)
            # hand-build an IFD with one count=3 RATIONAL entry at offset
            header = blob[:8]
            data_base = 8 + 2 + 12 + 4
            entry = struct.pack(bo + "HHI", 2, 5, 3) + struct.pack(bo + "I", data_base)
            ifd = struct.pack(bo + "H", 1) + entry + struct.pack(bo + "I", 0)
            got = parse_tiff_ifd(header + ifd + raw)
            assert got[2] == [(52, 1), (30, 1), (1234, 100)]
