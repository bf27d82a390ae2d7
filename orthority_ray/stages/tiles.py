"""Tile assignment: groupby-cell aggregate -> sort -> deterministic tile ids.

The north_rule's "groupby-cell aggregate/sort shuffle that assigns tiles".
Pattern (SURVEY.md §2.6 A-new, §4 skew):

1. **Partial counts inside map_batches** — each batch emits one ``(cell, n)``
   row per distinct cell it saw (``np.unique``).  This is the combiner that
   makes the subsequent shuffle tiny: the shuffled data is bounded by
   #distinct-cells x #batches, not by the page count, so hot (Zipf) cells
   cost the same as cold ones — the pre-aggregation IS the skew salting for
   a count (each batch is an implicit salt bucket; the final Sum un-salts).
2. ``groupby("cell").aggregate(Sum)`` over the partials (small all-to-all).
3. The aggregate result is dimension-sized (<= #grid cells, ~61k at 1-degree
   resolution even at 10^12 pages) -> finish on the driver: stable sort by
   (n_docs DESC, cell ASC) and round-robin tile ids.  Deterministic and
   parallelism-invariant: depends only on data, never on completion order
   (SURVEY.md §7.5 hard part 1; the reference gets this via disjoint windows
   + a write lock, `orthority/ortho.py:394-399`).
"""

from __future__ import annotations

import numpy as np
import pandas as pd
import pyarrow as pa
import ray.data
from ray.data.aggregate import Sum

N_ASSIGN_TILES = 32


def partial_cell_counts(batch: pa.Table) -> pa.Table:
    cells, counts = np.unique(batch["cell"].to_numpy(zero_copy_only=False), return_counts=True)
    return pa.table({"cell": pa.array(cells), "n": pa.array(counts.astype(np.int64))})


def cell_counts(geo_ds: ray.data.Dataset) -> ray.data.Dataset:
    partials = geo_ds.map_batches(partial_cell_counts, batch_format="pyarrow", batch_size=65536)
    return partials.groupby("cell").aggregate(Sum("n", alias_name="n_docs"))


def assign_tiles(geo_ds: ray.data.Dataset, n_tiles: int = N_ASSIGN_TILES) -> pd.DataFrame:
    """-> DataFrame(cell, n_docs, tile_id), the cell->tile routing table."""
    pdf = cell_counts(geo_ds).to_pandas()  # dimension-sized result
    pdf = pdf.sort_values(["n_docs", "cell"], ascending=[False, True], kind="mergesort")
    pdf = pdf.reset_index(drop=True)
    pdf["tile_id"] = (pdf.index % n_tiles).astype(np.int64)
    pdf["n_docs"] = pdf["n_docs"].astype(np.int64)
    return pdf[["cell", "n_docs", "tile_id"]]


SQL_ASSIGN = """
SELECT cell, n_docs,
       CAST((row_number() OVER (ORDER BY n_docs DESC, cell ASC) - 1) % {n_tiles} AS BIGINT) AS tile_id
FROM (SELECT cell, COUNT(*) AS n_docs FROM geod GROUP BY cell)
""".strip()
