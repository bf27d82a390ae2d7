"""Fault tolerance: Ray task retries + idempotent partition writes.

The reference aborts on the first tile exception (`orthority/ortho.py:
473-480`); the engine relies on (a) Ray's task retries for transient
failures and (b) idempotent overwrite-not-append partition writes so a
retried task can't duplicate output (SURVEY.md §4 "Retries")."""

import numpy as np
import pyarrow as pa
import pytest
import ray
import ray.data

from orthority_ray.state import lineage


def test_transient_task_failure_is_retried(sf_unit, tmp_path):
    """A map task that fails on its first invocation per worker process still
    completes the dataset (Ray retries tasks with retry_exceptions opted in),
    with no lost or duplicated rows."""
    marker_dir = str(tmp_path)

    def flaky_once(batch: pa.Table) -> pa.Table:
        import os
        from pathlib import Path

        marker = Path(marker_dir) / f"seen-{os.getpid()}"
        if not marker.exists():
            marker.touch()
            raise RuntimeError("transient failure (injected)")
        return batch

    ds = ray.data.range(10_000, override_num_blocks=4).map_batches(
        flaky_once,
        batch_format="pyarrow",
        batch_size=2048,
        retry_exceptions=[RuntimeError],  # opt in to user-error retries
    )
    total = sum(
        b.num_rows for b in ds.iter_batches(batch_size=4096, batch_format="pyarrow")
    )
    assert total == 10_000


def test_partition_write_idempotent(tmp_path):
    """Simulated task retry: writing the same partition twice (same inputs)
    leaves exactly one copy of the data and a consistent manifest."""
    tbl = pa.table({"doc_id": pa.array(np.arange(100, dtype=np.int64)),
                    "cell": pa.array(np.arange(100, dtype=np.int64) % 7),
                    "tile_id": pa.array(np.zeros(100, dtype=np.int64))})
    m1 = lineage.write_partition(tmp_path, 3, tbl, ["doc_id", "cell", "tile_id"], "fp")
    m2 = lineage.write_partition(tmp_path, 3, tbl, ["doc_id", "cell", "tile_id"], "fp")
    assert m1["checksum"] == m2["checksum"]
    import pyarrow.parquet as pq

    files = list((tmp_path / "part=00003").glob("*.parquet"))
    assert len(files) == 1  # overwrite, not append
    assert pq.read_table(files[0]).num_rows == 100
    assert lineage.completed_partitions(tmp_path)[3]["rows"] == 100

def test_dedup_layout_resume_recomputes_only_missing(ray_session, sf_unit, tmp_path):
    """Second lineage consumer: the dedup layout commits per-partition
    manifests, survives losing partitions, and resume recomputes ONLY the
    missing ones with identical content and ONE consistent schema."""
    import pyarrow.parquet as pq
    import shutil

    from orthority_ray.stages.dedup import write_dedup_layout

    out = str(tmp_path / "dedup_out")
    m1 = write_dedup_layout(sf_unit, out)
    assert len(m1) == 16 and m1["rows"].sum() == 500
    schemas = {tuple(pq.read_schema(p).names)
               for p in (tmp_path / "dedup_out").glob("part=*/data.parquet")}
    assert len(schemas) == 1  # every partition, empty or not, one schema

    victims = [p for p in m1.sort_values("rows", ascending=False)
               ["partition"].tolist()[:2]]
    before = {int(r["partition"]): int(r["checksum"])
              for _, r in m1.iterrows()}
    for v in victims:
        shutil.rmtree(tmp_path / "dedup_out" / f"part={v:05d}")
        (tmp_path / "dedup_out" / "_manifests" / f"part-{v:05d}.json").unlink()
    untouched_mtime = {
        p.parent.name: p.stat().st_mtime_ns
        for p in (tmp_path / "dedup_out").glob("part=*/data.parquet")}

    m2 = write_dedup_layout(sf_unit, out)  # resume
    after = {int(r["partition"]): int(r["checksum"]) for _, r in m2.iterrows()}
    assert after == before  # identical content restored
    for p in (tmp_path / "dedup_out").glob("part=*/data.parquet"):
        if p.parent.name in untouched_mtime:
            assert p.stat().st_mtime_ns == untouched_mtime[p.parent.name]
