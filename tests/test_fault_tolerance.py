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


def test_flagship_multifile_resume(sf_multifile, sf_unit, tmp_path):
    """Flagship over the PARTITIONED (16-file) input layout — the real
    deployment shape where reads stream instead of materializing — must
    write the same partition checksums as the single-file layout, and a
    crash-resume on it must recompute only the clobbered partitions."""
    import shutil

    from orthority_ray.pipelines.flagship import run_flagship
    from orthority_ray.state import lineage

    out_multi = str(tmp_path / "multi")
    man_multi = run_flagship(sf_multifile, out_multi, n_parts=8)
    man_single = run_flagship(sf_unit, str(tmp_path / "single"), n_parts=8)
    # identical content regardless of input file layout
    a = man_multi.sort_values("partition").reset_index(drop=True)
    b = man_single.sort_values("partition").reset_index(drop=True)
    assert (a["checksum"].values == b["checksum"].values).all()
    assert (a["rows"].values == b["rows"].values).all()

    # clobber two partitions and resume on the multi-file layout
    before = dict(zip(a["partition"], a["checksum"]))
    from pathlib import Path

    for p in (1, 6):
        shutil.rmtree(Path(out_multi) / f"part={p:05d}")
        lineage.manifest_path(out_multi, p).unlink()
    untouched = [p for p in range(8) if p not in (1, 6)]
    mt = {p: lineage.manifest_path(out_multi, p).stat().st_mtime_ns for p in untouched}
    man2 = run_flagship(sf_multifile, out_multi, n_parts=8)
    after = dict(zip(man2["partition"], man2["checksum"]))
    assert after == before
    for p, t in mt.items():
        assert lineage.manifest_path(out_multi, p).stat().st_mtime_ns == t


def test_flagship_replicated_scale_resume(sf_unit, tmp_path):
    """replicate=3 synthesizes a 3x crawl (id-offset copies at fresh
    locations): partition rows triple, fingerprints are replicate-aware,
    and resume recomputes only missing partitions at the larger scale."""
    import shutil

    from orthority_ray.pipelines.flagship import run_flagship
    from orthority_ray.state import lineage

    out = str(tmp_path / "rep")
    man = run_flagship(sf_unit, out, n_parts=8, replicate=3)
    assert man["rows"].sum() == 18_000
    before = dict(zip(man["partition"], man["checksum"]))
    from pathlib import Path

    shutil.rmtree(Path(out) / "part=00004")
    lineage.manifest_path(out, 4).unlink()
    man2 = run_flagship(sf_unit, out, n_parts=8, replicate=3)
    assert dict(zip(man2["partition"], man2["checksum"])) == before
    # a replicate=1 run against the same out_dir must NOT reuse x3 output
    from orthority_ray.pipelines.flagship import input_fingerprint

    missing = lineage.plan_missing(out, list(range(8)),
                                   input_fingerprint(sf_unit, n_parts=8))
    assert missing == list(range(8))
