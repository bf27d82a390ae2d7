"""Fused flagship: the production single-pass formulation.

The modular stages (sources/pages -> extract -> geocode -> pip -> tiles) are
the readable, composable surface; this module is the same pipeline fused
into ONE ``map_batches`` over the pruned parquet read, because measurement
showed Ray Data does NOT fuse a chain of separate ``map_batches`` calls —
each stage boundary re-materializes blocks through the object store and the
chain ran 3x slower than the fused stage (1.6M vs 4.4M docs/s at 8 CPUs).

The fused task, per input block:
  synthesize pages (broadcast documents table, per-worker cached) ->
  byte-exact extract + verify -> drop payload -> geocode -> PIP join ->
  per-cell partial aggregate (n_docs, n_join_pairs).

Output is ONE ROW PER (cell, block): the combiner that makes the final
``groupby(cell)`` shuffle dimension-sized.  Tile assignment and the join
row count both come from that one aggregate — a single pass over the input,
a single tiny shuffle, deterministic output.
"""

from __future__ import annotations

import numpy as np
import pandas as pd
import pyarrow as pa
import pyarrow.compute as pc
import ray
import ray.data
from ray.data.aggregate import Sum

from ..core.config import read_blocks
from ..core.geometry import make_tile_rings, points_in_rings, ring_bboxes
from ..sources.pages import _BROADCAST_CACHE, PageSynth, load_documents
from ..stages.extract import extract_batch
from ..stages.geocode import geocode_batch
from ..stages.tiles import N_ASSIGN_TILES


def fused_cell_aggregate(sf_dir: str, replicate: int = 1,
                         rings: np.ndarray | None = None,
                         chunk: int = 16384) -> ray.data.Dataset:
    """-> Dataset(cell, n_docs, n_join_pairs): per-cell partials, pre-reduced
    per block, ready for a tiny ``groupby(cell)`` final aggregate."""
    if rings is None:
        rings = make_tile_rings()
    docs_ref = ray.put(load_documents(sf_dir))
    bboxes = ring_bboxes(rings)

    def fused(batch: pa.Table) -> pa.Table:
        ok = batch["l_orderkey"].to_numpy(zero_copy_only=False).astype(np.int64)
        ln = batch["l_linenumber"].to_numpy(zero_copy_only=False).astype(np.int64)
        base = ok * 8 + ln
        if replicate > 1:
            doc_id = np.concatenate([base + r * (1 << 24) for r in range(replicate)])
        else:
            doc_id = base
        key = "pagesynth:" + docs_ref.hex()
        ps = _BROADCAST_CACHE.get(key)
        if ps is None:
            ps = PageSynth(docs_ref)
            _BROADCAST_CACHE[key] = ps
        agg: dict[int, list[int]] = {}
        cells_acc, docs_acc, pairs_acc = [], [], []
        for s in range(0, doc_id.shape[0], chunk):
            b = ps._synth(doc_id[s : s + chunk])
            b = extract_batch(b)
            n_bad = b.num_rows - pc.sum(pc.equal(b["extracted_text"], b["text"])).as_py()
            if n_bad:
                raise ValueError(f"{n_bad} rows failed byte-identical extraction")
            g = geocode_batch(b.select(["doc_id"]))
            cell = g["cell"].to_numpy(zero_copy_only=False)
            lon = g["lon"].to_numpy(zero_copy_only=False)
            lat = g["lat"].to_numpy(zero_copy_only=False)
            mat = points_in_rings(lon, lat, rings, bboxes)
            pairs_per_pt = mat.sum(axis=1).astype(np.int64)
            order = np.argsort(cell, kind="stable")
            cs, idx = np.unique(cell[order], return_index=True)
            docs_n = np.diff(np.append(idx, cell.shape[0]))
            pairs_n = np.add.reduceat(pairs_per_pt[order], idx)
            cells_acc.append(cs)
            docs_acc.append(docs_n.astype(np.int64))
            pairs_acc.append(pairs_n.astype(np.int64))
        cell_all = np.concatenate(cells_acc)
        # second-level combine across chunks of this block
        order = np.argsort(cell_all, kind="stable")
        cs, idx = np.unique(cell_all[order], return_index=True)
        docs_all = np.concatenate(docs_acc)[order]
        pairs_all = np.concatenate(pairs_acc)[order]
        return pa.table(
            {
                "cell": pa.array(cs),
                "n_docs": pa.array(np.add.reduceat(docs_all, idx)),
                "n_join_pairs": pa.array(np.add.reduceat(pairs_all, idx)),
            }
        )

    ds = ray.data.read_parquet(
        f"{sf_dir}/lineitem.parquet", columns=["l_orderkey", "l_linenumber"],
        override_num_blocks=read_blocks(),
    )
    return ds.map_batches(fused, batch_format="pyarrow", batch_size=4096)


def fused_headline(sf_dir: str, replicate: int = 1,
                   n_tiles: int = N_ASSIGN_TILES) -> tuple[pd.DataFrame, int]:
    """One-pass flagship: -> (cell/tile routing table, total PIP join rows).

    The tile routing is identical to stages/tiles.assign_tiles (same sort
    keys over the same exact counts) — asserted in tests."""
    agg = (
        fused_cell_aggregate(sf_dir, replicate)
        .groupby("cell")
        .aggregate(Sum("n_docs", alias_name="n_docs"),
                   Sum("n_join_pairs", alias_name="n_join_pairs"))
        .to_pandas()
    )
    join_rows = int(agg["n_join_pairs"].sum())
    pdf = agg.sort_values(["n_docs", "cell"], ascending=[False, True], kind="mergesort")
    pdf = pdf.reset_index(drop=True)
    pdf["tile_id"] = (pdf.index % n_tiles).astype(np.int64)
    pdf["n_docs"] = pdf["n_docs"].astype(np.int64)
    return pdf[["cell", "n_docs", "tile_id"]], join_rows
