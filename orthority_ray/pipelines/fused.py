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

from ..core.geometry import make_tile_rings, points_in_rings, ring_bboxes
from ..sources.pages import PageSynth, cached_instance, load_documents
from ..stages.extract import extract_batch
from ..stages.geocode import geocode_batch
from ..stages.tiles import N_ASSIGN_TILES


def fused_cell_aggregate(sf_dir: str, replicate: int = 1,
                         rings: np.ndarray | None = None,
                         chunk: int = 16384) -> ray.data.Dataset:
    """-> Dataset(cell, n_docs, n_join_pairs): per-cell partials, pre-reduced
    per block, ready for a tiny ``groupby(cell)`` final aggregate."""
    if not 1 <= replicate <= 207:
        raise ValueError(f"replicate must be in [1, 207], got {replicate}")
    if rings is None:
        rings = make_tile_rings()
    docs_ref = ray.put(load_documents(sf_dir))
    bboxes = ring_bboxes(rings)

    def fused(batch: pa.Table) -> pa.Table:
        base = batch["doc_id"].to_numpy(zero_copy_only=False)
        if replicate > 1:
            # same aliasing/overflow guards as read_page_keys_replicated —
            # the fused path previously dropped them (r3 review)
            if base.size and int(base.max()) >= (1 << 24):
                raise ValueError(
                    "base doc_id >= 2^24 would alias the next replica")
            doc_id = np.concatenate([base + r * (1 << 24) for r in range(replicate)])
        else:
            doc_id = base
        if doc_id.shape[0] == 0:
            return pa.table({"cell": pa.array([], pa.int64()),
                             "n_docs": pa.array([], pa.int64()),
                             "n_join_pairs": pa.array([], pa.int64())})
        # per-worker instance via the ONE broadcast-cache write path (a
        # direct _BROADCAST_CACHE[key] write bypassed its eviction bound)
        ps = cached_instance("pagesynth:" + docs_ref.hex(),
                             lambda: PageSynth(docs_ref))
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

    # the cached MATERIALIZED key table (sources/pages._KEYS_CACHE): the raw
    # single-row-group parquet read is ONE serial task, and every map task
    # chained behind its streaming output trickles serially no matter how
    # many CPUs are free (measured: 8 -> 32 CPUs moved throughput only
    # 1.91 -> 2.2 M docs/s until the read was materialized first)
    from ..sources.pages import read_page_keys

    ds = read_page_keys(sf_dir)
    return ds.map_batches(fused, batch_format="pyarrow", batch_size=4096)


def fused_headline(sf_dir: str, replicate: int = 1,
                   n_tiles: int = N_ASSIGN_TILES) -> tuple[pd.DataFrame, int]:
    """One-pass flagship: -> (cell/tile routing table, total PIP join rows).

    The tile routing is identical to stages/tiles.assign_tiles (same sort
    keys over the same exact counts) — asserted in tests."""
    # final combine: the per-block partials are DIMENSION-sized (cells x
    # blocks), so stream them to the driver and reduce with numpy instead of
    # paying Ray's all-to-all Aggregate fixed cost (~1.5 s at any CPU count,
    # the largest serial term in the 8->32 scaling gap).  At cluster scale
    # (blocks x cells outgrowing one node) insert one bucketed pre-reduce
    # (relational.bucketed_sum) before this and the driver table stays tiny.
    cells_acc: list[np.ndarray] = []
    docs_acc: list[np.ndarray] = []
    pairs_acc: list[np.ndarray] = []
    for b in fused_cell_aggregate(sf_dir, replicate).iter_batches(
        batch_size=65536, batch_format="pyarrow"
    ):
        cells_acc.append(b["cell"].to_numpy(zero_copy_only=False))
        docs_acc.append(b["n_docs"].to_numpy(zero_copy_only=False))
        pairs_acc.append(b["n_join_pairs"].to_numpy(zero_copy_only=False))
    if not cells_acc:  # empty input: typed empty routing table, not a crash
        empty = pd.DataFrame({"cell": pd.Series([], dtype=np.int64),
                              "n_docs": pd.Series([], dtype=np.int64),
                              "tile_id": pd.Series([], dtype=np.int64)})
        return empty, 0
    cell_all = np.concatenate(cells_acc)
    order = np.argsort(cell_all, kind="stable")
    cs, idx = np.unique(cell_all[order], return_index=True)
    n_docs = np.add.reduceat(np.concatenate(docs_acc)[order], idx)
    n_pairs = np.add.reduceat(np.concatenate(pairs_acc)[order], idx)
    agg = pd.DataFrame({"cell": cs, "n_docs": n_docs, "n_join_pairs": n_pairs})
    join_rows = int(agg["n_join_pairs"].sum())
    pdf = agg.sort_values(["n_docs", "cell"], ascending=[False, True], kind="mergesort")
    pdf = pdf.reset_index(drop=True)
    pdf["tile_id"] = (pdf.index % n_tiles).astype(np.int64)
    pdf["n_docs"] = pdf["n_docs"].astype(np.int64)
    return pdf[["cell", "n_docs", "tile_id"]], join_rows
