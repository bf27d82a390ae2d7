"""Geocode stage: page -> world coordinates + cell id.

This is the engine's re-expression of the reference's projection core
(`orthority/camera.py:843-880` pixel_to_world_z; SURVEY.md §2.2 M2): every
page derives a deterministic pixel-like sample from its ``doc_id``, which is
mapped to a world location.  Two paths:

- :func:`geocode_batch` — the integer "url-hash -> location" map
  (core/hashing.py) whose arithmetic the DuckDB oracle replicates exactly;
  all flagship queries (cell counts, PIP, kNN, tile assignment) run on it.
- :class:`CameraGeocoder` (stages/camera_geocode.py) — the full frame-camera
  model path exercised by the parity test-suite and its own oracle query.

Stateless ``map_batches`` over zero-copy Arrow: one int64 column in, numpy
integer math, columns appended.  No shuffle.
"""

from __future__ import annotations

import pyarrow as pa
import ray.data

from ..core import cells as C
from ..core import hashing as H


def geocode_batch(batch: pa.Table) -> pa.Table:
    doc_id = batch["doc_id"].to_numpy(zero_copy_only=False)
    lon_milli, lat_milli = H.geocode_milli(doc_id)
    lon, lat = H.milli_to_deg(lon_milli, lat_milli)
    cell = C.encode(lon_milli, lat_milli, C.CELL_SIZE)
    knn_cell = C.encode(lon_milli, lat_milli, C.KNN_CELL_SIZE)
    return (
        batch.append_column("lon_milli", pa.array(lon_milli))
        .append_column("lat_milli", pa.array(lat_milli))
        .append_column("lon", pa.array(lon))
        .append_column("lat", pa.array(lat))
        .append_column("cell", pa.array(cell))
        .append_column("knn_cell", pa.array(knn_cell))
    )


def geocode(ds: ray.data.Dataset) -> ray.data.Dataset:
    return ds.map_batches(geocode_batch, batch_format="pyarrow", batch_size=65536)
