"""Camera parameter IO: the fixture camera bank + YAML/GeoJSON-style
readers/writers (SURVEY.md §2.1 S4-S14 analogs).

The camera bank mirrors the reference's session fixtures
(`tests/conftest.py:176-295`) so round-trip tolerances carry over:
im_size 200x150, focal 5 mm normalised by sensor width 6 mm, principal point
offset (-0.01, 0.02), position (2e4, 3e4, 1e3), OPK = radians(-3, 2, 10).

Formats: interior/exterior parameter dicts round-trip through YAML; exterior
params also round-trip through a GeoJSON-like FeatureCollection (S12/S14).
All reads validate against a small recursive schema, the engine analog of
``validate_collection`` (`orthority/common.py:164-220`).
"""

from __future__ import annotations

import json
from pathlib import Path

import numpy as np

from ..core.cameras import create_camera

IM_SIZE = (200, 150)
FOCAL = 5.0 / 6.0
SENSOR = (1.0, 0.75)
CXY = (-0.01, 0.02)
XYZ = (2.0e4, 3.0e4, 1.0e3)
OPK = tuple(np.radians((-3.0, 2.0, 10.0)).tolist())

BROWN = dict(k1=-0.25, k2=0.2, p1=0.01, p2=0.01, k3=-0.1)
OPENCV = dict(**BROWN, k4=0.001, k5=0.001, k6=-0.001)
FISHEYE = dict(k1=-0.25, k2=0.1, k3=0.01, k4=-0.01)

RPC = dict(
    height_off=825.0,
    height_scale=825.0,
    lat_off=30.0,
    lat_scale=0.0025,
    long_off=20.0,
    long_scale=0.0025 * 200 / 150,
    line_off=(IM_SIZE[1] - 1) / 2,
    line_scale=IM_SIZE[1] / 2,
    samp_off=(IM_SIZE[0] - 1) / 2,
    samp_scale=IM_SIZE[0] / 2,
    line_num_coeff=[-0.005, -0.033, -1.042, 0.008, -0.001] + [0.0] * 15,
    line_den_coeff=[1.0, -0.001, -0.002] + [0.0] * 17,
    samp_num_coeff=[0.008, 1.016, 0.002, 0.013, 0.001] + [0.0] * 15,
    samp_den_coeff=[1.0, -0.002, -0.001] + [0.0] * 17,
)

CAM_IDS = ("pinhole", "brown", "opencv", "fisheye")  # frame bank (rpc separate)


def int_param_dict() -> dict:
    """Interior parameter dict, keyed by cam_id (S4 shape)."""
    out = {}
    for cam_id in CAM_IDS:
        extra = {"brown": BROWN, "opencv": OPENCV, "fisheye": FISHEYE}.get(cam_id, {})
        out[cam_id] = dict(
            cam_type=cam_id, im_size=list(IM_SIZE), focal_len=FOCAL,
            sensor_size=list(SENSOR), cx=CXY[0], cy=CXY[1], **extra,
        )
    return out


def ext_param_dict() -> dict:
    """Exterior parameter dict keyed by 'filename' (S10/S12 shape)."""
    return {
        f"image_{cam_id}": dict(xyz=list(XYZ), opk=list(OPK), camera=cam_id)
        for cam_id in CAM_IDS
    }


def build_camera_bank() -> dict:
    """cam_id -> constructed camera object (the reference's ``FrameCameras``
    cache, `orthority/factory.py:205-234`)."""
    bank = {}
    ints, exts = int_param_dict(), ext_param_dict()
    for name, ext in exts.items():
        ip = dict(ints[ext["camera"]])
        cam_type = ip.pop("cam_type")
        ip["im_size"] = tuple(ip["im_size"])
        ip["sensor_size"] = tuple(ip["sensor_size"])
        bank[ext["camera"]] = create_camera(
            cam_type, **ip, xyz=tuple(ext["xyz"]), opk=tuple(ext["opk"])
        )
    bank["rpc"] = create_camera("rpc", im_size=IM_SIZE, rpc=RPC)
    return bank


# --- schema validation (common.py:164-220 analog) ---------------------------


def validate_collection(template, coll, path="$"):
    """Recursively check ``coll`` against ``template`` (types / nested
    dict-list shapes); raises ValueError with a JSON-path-ish location."""
    if isinstance(template, dict):
        if not isinstance(coll, dict):
            raise ValueError(f"{path}: expected dict, got {type(coll).__name__}")
        for k, sub in template.items():
            if k is ...:  # any-key template
                for ck, cv in coll.items():
                    validate_collection(sub, cv, f"{path}.{ck}")
            else:
                if k not in coll:
                    raise ValueError(f"{path}: missing key {k!r}")
                validate_collection(sub, coll[k], f"{path}.{k}")
    elif isinstance(template, list):
        if not isinstance(coll, list):
            raise ValueError(f"{path}: expected list, got {type(coll).__name__}")
        for n, item in enumerate(coll):
            validate_collection(template[0], item, f"{path}[{n}]")
    elif isinstance(template, type):
        # JSON has one number type: integer literals are valid where the
        # schema says float (a third-party GeoJSON with xyz [20000, 30000,
        # 1000] must load; only our own writer always emits floats)
        ok = isinstance(coll, template) or (
            template is float and isinstance(coll, int) and not isinstance(coll, bool)
        )
        if not ok or (template is not bool and isinstance(coll, bool)):
            raise ValueError(
                f"{path}: expected {template.__name__}, got {type(coll).__name__}"
            )
    return True


INT_SCHEMA = {...: dict(cam_type=str, im_size=[int], focal_len=float)}
EXT_SCHEMA = {...: dict(xyz=[float], opk=[float], camera=str)}


# --- YAML / GeoJSON round trip (S4/S13/S12/S14 analogs) ---------------------


def write_int_param(path: str | Path, params: dict, overwrite: bool = False) -> None:
    import yaml

    p = Path(path)
    if p.exists() and not overwrite:
        raise FileExistsError(p)
    p.write_text(yaml.safe_dump(params, sort_keys=True))


def read_int_param(path: str | Path) -> dict:
    import yaml

    params = yaml.safe_load(Path(path).read_text())
    validate_collection(INT_SCHEMA, params)
    return params


def write_ext_param_geojson(path: str | Path, params: dict, overwrite: bool = False) -> None:
    """Exterior params -> GeoJSON-like FeatureCollection (S14 shape)."""
    p = Path(path)
    if p.exists() and not overwrite:
        raise FileExistsError(p)
    feats = [
        dict(
            type="Feature",
            properties=dict(filename=name, camera=v["camera"], xyz=v["xyz"], opk=v["opk"]),
            geometry=dict(type="Point", coordinates=list(v["xyz"])),
        )
        for name, v in params.items()
    ]
    p.write_text(json.dumps(dict(type="FeatureCollection", features=feats)))


def read_ext_param_geojson(path: str | Path) -> dict:
    fc = json.loads(Path(path).read_text())
    # structural checks BEFORE extraction: malformed GeoJSON must fail with
    # a located ValueError, not a bare KeyError mid-walk (r3 review)
    if not isinstance(fc, dict) or not isinstance(fc.get("features"), list):
        raise ValueError(f"{path}: not a FeatureCollection with a 'features' list")
    out = {}
    for idx, f in enumerate(fc["features"]):
        pr = f.get("properties") if isinstance(f, dict) else None
        if not isinstance(pr, dict) or "filename" not in pr:
            raise ValueError(
                f"{path}: features[{idx}] missing 'properties.filename'")
        missing = [k for k in ("xyz", "opk", "camera") if k not in pr]
        if missing:
            raise ValueError(
                f"{path}: features[{idx}].properties missing {missing}")
        out[pr["filename"]] = dict(xyz=pr["xyz"], opk=pr["opk"], camera=pr["camera"])
    validate_collection(EXT_SCHEMA, out)
    return out


# --- many-files parallel param read (S7) ------------------------------------


def read_param_files(paths: list[str | Path]) -> "ray.data.Dataset":
    """Parse many interior-param YAML files in PARALLEL Ray tasks — the
    Ray-Data-native analog of the reference's thread-pooled tag reads over
    file batches (`orthority/param_io.py:371-394`, SURVEY §2.1 S7): I/O and
    parsing fan out across the cluster instead of a driver-side thread pool.

    -> Dataset(path: string, camera: string, cam_type: string,
    params_json: string), one row per camera entry per file; malformed files
    raise (schema validation per file, same strictness as read_int_param).
    """
    import json as _json

    import pyarrow as pa
    import ray.data

    items = [{"path": str(p)} for p in paths]

    def parse(batch: "pa.Table") -> "pa.Table":
        out_path, out_cam, out_type, out_js = [], [], [], []
        for p in batch["path"].to_pylist():
            params = read_int_param(p)
            for cam, v in params.items():
                out_path.append(p)
                out_cam.append(str(cam))
                out_type.append(str(v.get("cam_type", "")))
                out_js.append(_json.dumps(v, sort_keys=True))
        return pa.table(
            {
                "path": pa.array(out_path, pa.string()),
                "camera": pa.array(out_cam, pa.string()),
                "cam_type": pa.array(out_type, pa.string()),
                "params_json": pa.array(out_js, pa.string()),
            }
        )

    return ray.data.from_items(items).map_batches(
        parse, batch_format="pyarrow", batch_size=8
    )
