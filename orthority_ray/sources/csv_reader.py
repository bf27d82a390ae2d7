"""CSV exterior-parameter reader (SURVEY.md §2.1 S10, `param_io.py:906-1157`
analog): sniff dialect + header, normalize per-row exterior params, resolve
the world CRS — auto-UTM from the mean lat/lon when geographic (A4).

The auto-UTM mean is the engine's ``ds.mean``-then-broadcast aggregate: at
scale the CSV becomes a Dataset and the mean is a distributed aggregate; the
driver-side path here shares the same numpy code.
"""

from __future__ import annotations

import csv
import io
from pathlib import Path

import numpy as np

from ..core.rotations import rpy_to_opk
from ..functions.scalars import lonlat_to_world_xy, utm_crs_from_latlon

# accepted header spellings -> canonical field (subset of the reference's
# dialect table)
_FIELD_ALIASES = {
    "filename": "filename", "file": "filename", "image": "filename",
    "x": "x", "easting": "x", "lon": "lon", "longitude": "lon",
    "y": "y", "northing": "y", "lat": "lat", "latitude": "lat",
    "z": "z", "altitude": "z", "alt": "z", "height": "z",
    "omega": "omega", "phi": "phi", "kappa": "kappa",
    "roll": "roll", "pitch": "pitch", "yaw": "yaw",
    "camera": "camera", "cam": "camera",
}

DEFAULT_COLUMNS = ("filename", "x", "y", "z", "omega", "phi", "kappa")


class CsvReader:
    """Sniff dialect/header, parse rows -> exterior param dict."""

    def __init__(self, path: str | Path, crs: str | None = None):
        self.path = Path(path)
        text = self.path.read_text()
        sample = text[:4096]
        try:
            self.dialect = csv.Sniffer().sniff(sample, delimiters=",;\t| ")
        except csv.Error:
            self.dialect = csv.get_dialect("excel")
        self.has_header = self._sniff_header(sample)
        self._text = text
        self.crs = crs
        # sidecar CRS file (.prj), as in the reference (`param_io.py:1030-1047`)
        prj = self.path.with_suffix(".prj")
        if self.crs is None and prj.exists():
            self.crs = prj.read_text().strip()

    def _sniff_header(self, sample: str) -> bool:
        first = sample.splitlines()[0] if sample else ""
        toks = (
            [t.strip().lower() for t in next(csv.reader([first], self.dialect))]
            if first
            else []
        )
        return any(t in _FIELD_ALIASES for t in toks)

    def _columns(self, first_row: list[str]) -> list[str]:
        if self.has_header:
            return [
                _FIELD_ALIASES.get(t.strip().lower(), t.strip().lower()) for t in first_row
            ]
        return list(DEFAULT_COLUMNS[: len(first_row)])

    def read_ext_param(self) -> tuple[dict, str]:
        """-> (ext_param_dict, crs).  Angles in the file are DEGREES (the
        reference's CSV convention); output OPK is radians.  lat/lon dialects
        resolve the CRS by auto-UTM from the mean position and convert RPY
        angles per row (`param_io.py:1061-1127` semantics)."""
        rows = list(csv.reader(io.StringIO(self._text), self.dialect))
        if not rows:
            return {}, self.crs or ""
        cols = self._columns(rows[0])
        data = rows[1:] if self.has_header else rows
        recs = [dict(zip(cols, r)) for r in data if r]

        if not recs:
            # header-only file: the auto-UTM branch would take the mean of
            # an empty array (NaN -> int() ValueError); empty dict instead,
            # like the projected branch (r3 review)
            return {}, self.crs or ""

        is_lla = "lat" in cols and "lon" in cols
        crs = self.crs
        if is_lla:
            lat = np.array([float(r["lat"]) for r in recs])
            lon = np.array([float(r["lon"]) for r in recs])
            if crs is None:
                crs = utm_crs_from_latlon(float(lat.mean()), float(lon.mean()))
        elif crs is None:
            raise ValueError("projected CSV needs a crs argument or .prj sidecar")

        out = {}
        for r in recs:
            if is_lla:
                lat_i, lon_i = float(r["lat"]), float(r["lon"])
                x, y = lonlat_to_world_xy(lon_i, lat_i)
                z = float(r.get("z", 0.0))
                if "roll" in r:
                    rpy = tuple(np.radians([float(r["roll"]), float(r["pitch"]), float(r["yaw"])]))
                    opk = rpy_to_opk(
                        rpy, (lat_i, lon_i, z),
                        lambda lo, la, zz: (*lonlat_to_world_xy(lo, la), zz),
                    )
                else:
                    opk = tuple(np.radians([float(r["omega"]), float(r["phi"]), float(r["kappa"])]))
            else:
                x, y, z = (float(r[k]) for k in ("x", "y", "z"))
                opk = tuple(np.radians([float(r["omega"]), float(r["phi"]), float(r["kappa"])]))
            out[r["filename"]] = dict(
                xyz=[x, y, float(r.get("z", 0.0)) if is_lla else z],
                opk=list(opk),
                camera=r.get("camera", "pinhole"),
            )
        return out, crs
