"""OpenSfM / ODM ``reconstruction.json`` reader (SURVEY.md §2.1 S11,
`orthority/param_io.py:1160-1263` analog).

Parses the public OpenSfM reconstruction schema: ``cameras`` (projection
type + normalised focal/distortion) -> interior params; ``shots``
(angle-axis rotation + translation) -> exterior position/OPK via the
Rodrigues conversion (`core/rotations.cv_ext_to_oty_ext`), offset by the
topocentric ``reference_lla`` origin.
"""

from __future__ import annotations

import json
from pathlib import Path

import numpy as np

from ..core.rotations import cv_ext_to_oty_ext
from ..functions.scalars import lonlat_to_world_xy

_PROJECTION_TO_CAM_TYPE = {
    "perspective": "brown",
    "brown": "brown",
    "fisheye": "fisheye",
    "fisheye_opencv": "fisheye",
    "spherical": None,  # unsupported, skipped with a note
}


class OsfmReader:
    def __init__(self, path: str | Path, ref_xyz=None):
        self.doc = json.loads(Path(path).read_text())
        if isinstance(self.doc, list):  # OpenSfM writes a list of reconstructions
            self.doc = self.doc[0]
        ref = self.doc.get("reference_lla")
        if ref_xyz is not None:
            self.ref_xyz = np.asarray(ref_xyz, dtype=np.float64)
        elif ref:
            # engine's deterministic lla->world placement (see camera_geocode)
            self.ref_xyz = np.array(
                [*lonlat_to_world_xy(ref["longitude"], ref["latitude"]),
                 ref.get("altitude", 0.0)]
            )
        else:
            self.ref_xyz = np.zeros(3)

    def read_int_param(self) -> dict:
        out = {}
        self.skipped_cameras: list[str] = []
        for cam_id, c in self.doc.get("cameras", {}).items():
            cam_type = _PROJECTION_TO_CAM_TYPE.get(c.get("projection_type", "perspective"))
            if cam_type is None:
                # record the drop so read_ext_param can exclude (and note)
                # shots referencing it — silently keeping those shots made a
                # downstream camera-bank lookup KeyError far from the cause
                # (r3 review)
                import warnings

                self.skipped_cameras.append(cam_id)
                warnings.warn(
                    f"skipping unsupported projection_type "
                    f"{c.get('projection_type')!r} (camera {cam_id!r})")
                continue
            w, h = int(c["width"]), int(c["height"])
            if "focal" in c:
                focal_len: float | list[float] = float(c["focal"])
            else:
                # brown cameras carry anisotropic focal_x/focal_y — keep
                # both (FrameCamera accepts a 2-tuple; collapsing to
                # focal_x scaled fy wrong for focal_y != focal_x)
                fx = float(c.get("focal_x", 1.0))
                fy = float(c.get("focal_y", fx))
                focal_len = fx if fx == fy else [fx, fy]
            params = dict(
                cam_type=cam_type,
                im_size=[w, h],
                focal_len=focal_len,
                sensor_size=[1.0, h / w],
                cx=float(c.get("c_x", 0.0)),
                cy=float(c.get("c_y", 0.0)),
            )
            # k4: OpenCV-model rational term AND the 4th fisheye theta
            # coefficient — dropping it silently zeroed fisheye_opencv's k4
            for k in ("k1", "k2", "k3", "k4", "k5", "k6", "p1", "p2"):
                if k in c:
                    params[k] = float(c[k])
            out[cam_id] = params
        return out

    def read_ext_param(self) -> dict:
        skipped = set(getattr(self, "skipped_cameras", ()) or ())
        if not skipped:  # derive even if read_int_param was never called
            skipped = {cid for cid, c in self.doc.get("cameras", {}).items()
                       if _PROJECTION_TO_CAM_TYPE.get(
                           c.get("projection_type", "perspective")) is None}
        out = {}
        for name, shot in self.doc.get("shots", {}).items():
            if shot["camera"] in skipped:
                import warnings

                warnings.warn(
                    f"skipping shot {name!r}: its camera {shot['camera']!r} "
                    f"has an unsupported projection type")
                continue
            xyz, opk = cv_ext_to_oty_ext(
                t=shot["translation"], r=shot["rotation"], ref_xyz=self.ref_xyz
            )
            out[name] = dict(xyz=list(xyz), opk=list(opk), camera=shot["camera"])
        return out
