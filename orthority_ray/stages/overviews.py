"""Overview pyramid: per-cell aggregates at coarsening resolutions.

Engine analog of the reference's raster overview build (decimate-by-2
averages, `orthority/common.py:532-556`; SURVEY.md §2.6 A8): instead of
halving pixels, each level re-aggregates the cell statistics at the next
coarser cell resolution (`core/cells.RES_MILLI` ladder).  Level 0 is the
full-res per-cell count table; each next level is a groupby over the
PARENT cell of the previous level — so each level's shuffle input is the
previous (already small) level, not the raw pages.
"""

from __future__ import annotations

import numpy as np
import pandas as pd
import pyarrow as pa
import ray.data
from ray.data.aggregate import Sum

from ..core import cells as C
from .tiles import partial_cell_counts


def overview_pyramid(geo_ds: ray.data.Dataset,
                     levels: tuple[int, ...] = C.RES_MILLI) -> dict[int, pd.DataFrame]:
    """-> {cell_size_milli: DataFrame(cell, n_docs)} from fine to coarse."""
    fine_cs = min(levels)
    partials = geo_ds.map_batches(
        lambda b: partial_cell_counts(
            b.set_column(
                b.schema.get_field_index("cell"),
                "cell",
                pa.array(
                    C.encode(
                        b["lon_milli"].to_numpy(zero_copy_only=False),
                        b["lat_milli"].to_numpy(zero_copy_only=False),
                        fine_cs,
                    )
                ),
            )
        ),
        batch_format="pyarrow",
        batch_size=65536,
    )
    level = (
        partials.groupby("cell").aggregate(Sum("n", alias_name="n_docs")).to_pandas()
    )
    out = {fine_cs: level.sort_values("cell").reset_index(drop=True)}
    prev_cs = fine_cs
    for cs in sorted(levels):
        if cs == fine_cs:
            continue
        prev = out[prev_cs]
        parent = C.parent(prev["cell"].to_numpy().astype(np.int64), prev_cs, cs)
        lvl = (
            pd.DataFrame({"cell": parent, "n_docs": prev["n_docs"].to_numpy()})
            .groupby("cell", as_index=False)["n_docs"]
            .sum()
            .sort_values("cell")
            .reset_index(drop=True)
        )
        out[cs] = lvl
        prev_cs = cs
    return out
