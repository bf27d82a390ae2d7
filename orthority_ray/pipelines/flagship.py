"""The flagship pipeline (north_star end-to-end):

  read pages (pruned) -> extract (byte-identical check) -> geocode ->
  cell-index -> PIP join vs tile polygons -> groupby-cell tile assignment ->
  partitioned parquet output with per-partition lineage manifests + resume.

Execution shape (SURVEY.md §7):
- everything up to the write is streaming ``map_batches`` over Arrow;
- the tile-assignment side table is computed by the partial-counts +
  groupby-sum combiner and broadcast back (dimension-sized);
- the ONLY payload shuffle is the final ``groupby(part)`` that co-locates
  each output partition; ``part = hash(doc_id) % n_parts`` (multiplicative
  hash — doc_id % n would alias the l_linenumber structure) so a resume run
  drops finished partitions with a cheap filter at the source;
- each partition writes its own directory + manifest atomically
  (state/lineage.py) -> failed runs resume by anti-join, retried tasks
  overwrite instead of append (idempotent).
"""

from __future__ import annotations

from pathlib import Path

import numpy as np
import pandas as pd
import pyarrow as pa
import ray
import ray.data

from ..sources.pages import read_pages, read_page_keys
from ..stages.extract import extract_batch
from ..stages.geocode import geocode, geocode_batch
from ..stages.pip import pip_join
from ..stages.tiles import assign_tiles
from ..state import lineage

N_PARTS = 16


def part_of(doc_id: np.ndarray, n_parts: int) -> np.ndarray:
    """Partition key: multiplicative hash of doc_id (doc_id % n would alias
    the l_linenumber structure and leave partitions empty)."""
    return ((doc_id.astype(np.int64) * 2654435761) % 4294967296) % n_parts


def input_fingerprint(sf_dir: str, replicate: int = 1,
                      n_parts: int | None = None) -> str:
    """Identity of a partition's INPUT: source + size + replication + the
    partitioning width.  ``n_parts`` matters because part p's CONTENT is a
    function of it — without it, a rerun with a different n_parts trusted
    old same-numbered manifests and silently kept wrong partition contents
    (caught by test_rerun_with_fewer_parts_prunes_stale_partitions)."""
    from ..core.config import parquet_bytes, table_path

    rep = f":x{replicate}" if replicate > 1 else ""
    parts = f":p{n_parts}" if n_parts is not None else ""
    return f"{sf_dir}:{parquet_bytes(table_path(sf_dir, 'lineitem'))}{rep}{parts}"


def run_flagship(sf_dir: str, out_dir: str, n_parts: int = N_PARTS,
                 resume: bool = True, replicate: int = 1) -> pd.DataFrame:
    """Run (or resume) the flagship pipeline; returns the manifest table.

    ``replicate`` > 1 synthesizes an id-offset ``replicate``-times-larger
    crawl from the same input files (sources/pages.read_page_keys_replicated)
    — the payload-scale path used by the spill/resume demonstration in
    BASELINE.md §3."""
    fp = input_fingerprint(sf_dir, replicate, n_parts)
    planned = list(range(n_parts))
    missing = lineage.plan_missing(out_dir, planned, fp) if resume else planned
    out_path = Path(out_dir)
    out_path.mkdir(parents=True, exist_ok=True)
    # prune manifests/data of partitions OUTSIDE the current plan: a rerun
    # with a smaller n_parts otherwise leaves stale part dirs that the
    # tile-layout glob would read as duplicate rows (r3 review)
    planned_set = set(planned)
    for p, man in lineage.completed_partitions(out_dir).items():
        if p not in planned_set:
            lineage.manifest_path(out_dir, p).unlink(missing_ok=True)
            stale = out_path / f"part={p:05d}"
            if stale.exists():
                import shutil

                shutil.rmtree(stale)

    if not missing:
        # fully-resumed run: nothing to compute, so don't pay the full
        # input scan for the (deterministic, already-written) routing table
        return lineage.load_manifest_table(out_dir)

    # tile routing table: deterministic on the FULL input (independent of
    # which partitions remain), cheap int-only scan + combiner aggregate.
    if replicate > 1:
        from ..sources.pages import pages_from_keys, read_page_keys_replicated

        keys_ds = read_page_keys_replicated(sf_dir, replicate)
    else:
        keys_ds = read_page_keys(sf_dir)
    tiles_pdf = assign_tiles(geocode(keys_ds))
    tiles_pdf.to_parquet(out_path / "_tiles.parquet", index=False)
    # broadcast the routing table as SORTED parallel arrays: the per-batch
    # lookup is one vectorized np.searchsorted, not a per-row dict probe
    order = np.argsort(tiles_pdf["cell"].to_numpy())
    route_cells = tiles_pdf["cell"].to_numpy().astype(np.int64)[order]
    route_tiles = tiles_pdf["tile_id"].to_numpy().astype(np.int64)[order]
    cell_ref = ray.put((route_cells, route_tiles))

    missing_arr = np.asarray(sorted(missing), dtype=np.int64)

    if replicate > 1:
        ds = pages_from_keys(read_page_keys_replicated(sf_dir, replicate), sf_dir)
    else:
        ds = read_pages(sf_dir)

    def transform(batch: pa.Table) -> pa.Table:
        doc_id = batch["doc_id"].to_numpy(zero_copy_only=False)
        part = part_of(doc_id, n_parts)
        keep = np.isin(part, missing_arr)
        batch = batch.filter(pa.array(keep))
        # no zero-row early return: extract/geocode handle empty tables,
        # and an early return would emit a block MISSING their columns —
        # schema-divergent blocks crash the downstream shuffle (r3 review)
        batch = extract_batch(batch)
        batch = geocode_batch(batch)
        return batch.append_column("part", pa.array(part[keep]))

    staged = ds.map_batches(transform, batch_format="pyarrow", batch_size=16384)

    def finish(batch: pa.Table) -> pa.Table:
        """Per-batch: verify extraction (Arrow pc.equal, zero-copy) + attach
        tile_id via vectorized searchsorted over the broadcast routing
        arrays (cached per worker — stateless tasks, no actor pool)."""
        import pyarrow.compute as pc

        from ..sources.pages import cached_get

        if batch.num_rows == 0:
            return batch.append_column("tile_id", pa.array([], pa.int64()))
        eq = pc.equal(batch["extracted_text"], batch["text"])
        if not pc.all(eq).as_py():
            bad = batch["url"].filter(pc.invert(eq)).to_pylist()
            raise ValueError(f"extraction not byte-identical for urls: {bad[:3]}")
        cells = batch["cell"].to_numpy(zero_copy_only=False)
        rc, rt = cached_get(cell_ref)
        idx = np.searchsorted(rc, cells)
        idx = np.clip(idx, 0, rc.shape[0] - 1)
        if not (rc[idx] == cells).all():
            missing = np.unique(cells[rc[idx] != cells])
            raise ValueError(f"cells missing from routing table: {missing[:5]}")
        return batch.append_column("tile_id", pa.array(rt[idx]))

    finished = staged.map_batches(finish, batch_format="pyarrow", batch_size=16384)

    out_cols = ["url", "warc_ts", "text", "lang", "doc_id", "lon", "lat", "cell", "tile_id", "part"]
    finished = finished.select_columns(out_cols)

    def write_part(g: pa.Table) -> pa.Table:
        """Arrow end-to-end (pandas round-trip measured ~2x the write cost):
        sort + write the partition zero-copy, return its manifest row."""
        import pyarrow.compute as pc

        part = int(g["part"][0].as_py())
        tbl = g.take(pc.sort_indices(
            g, sort_keys=[("doc_id", "ascending"), ("url", "ascending")]
        ))
        man = lineage.write_partition(
            out_dir, part, tbl, checksum_cols=["doc_id", "cell", "tile_id"], input_fingerprint=fp
        )
        return pa.Table.from_pylist([man], schema=pa.schema(
            [("partition", pa.int64()), ("rows", pa.int64()),
             ("input_fingerprint", pa.string()), ("checksum", pa.uint64()),
             ("engine_version", pa.string()), ("path", pa.string()),
             ("bytes", pa.int64()), ("write_s", pa.float64())]
        ))

    manifests = finished.groupby("part").map_groups(write_part, batch_format="pyarrow")
    manifests.materialize()  # drive the pipeline to completion

    # planned partitions that received no rows still need a (rows=0)
    # manifest, or resume would re-plan them forever; empty partitions carry
    # the FULL output schema so write_tile_layout's read never sees mixed
    # schemas across part directories (ADVICE r1)
    still_missing = lineage.plan_missing(out_dir, planned, fp)
    empty_schema = pa.schema(
        [
            ("url", pa.string()),
            ("warc_ts", pa.timestamp("us")),
            ("text", pa.string()),
            ("lang", pa.string()),
            ("doc_id", pa.int64()),
            ("lon", pa.float64()),
            ("lat", pa.float64()),
            ("cell", pa.int64()),
            ("tile_id", pa.int64()),
            ("part", pa.int64()),
        ]
    )
    for p in still_missing:
        lineage.write_partition(
            out_dir, p, empty_schema.empty_table(),
            checksum_cols=["doc_id", "cell", "tile_id"], input_fingerprint=fp,
        )
    return lineage.load_manifest_table(out_dir)


def write_tile_layout(out_dir: str, flagship_out_dir: str) -> list[str]:
    """Final output layout keyed by tile (SURVEY.md §7.4): re-lay the
    flagship's resume-oriented (hash-part) output as hive-partitioned parquet
    ``tile_id=<t>/`` directories — the engine's analog of the reference's
    per-tile GTiff layout (S15).  Reads the already-committed partitions, so
    it composes with resume."""
    ds = ray.data.read_parquet(
        [str(p) for p in sorted(Path(flagship_out_dir).glob("part=*/data.parquet"))]
    )
    ds.write_parquet(out_dir, partition_cols=["tile_id"])
    return sorted(p.name for p in Path(out_dir).glob("tile_id=*"))


def flagship_result(sf_dir: str) -> ray.data.Dataset:
    """The flagship transform WITHOUT the write (for `entry()` smoke checks):
    extracted + geocoded + PIP-joined pages."""
    geo = geocode(read_page_keys(sf_dir))
    return pip_join(geo)
