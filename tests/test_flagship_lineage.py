"""Flagship pipeline end-to-end: lineage manifests, resume, determinism."""

import json
import shutil
from pathlib import Path

import numpy as np
import pytest

from orthority_ray.pipelines.flagship import input_fingerprint, run_flagship
from orthority_ray.state import lineage


@pytest.fixture()
def out_dir(tmp_path):
    return str(tmp_path / "flagship_out")


def test_flagship_writes_all_partitions(sf_unit, out_dir):
    man = run_flagship(sf_unit, out_dir, n_parts=8)
    assert len(man) == 8
    assert man["rows"].sum() == 6000
    for _, m in man.iterrows():
        assert Path(m["path"], "data.parquet").exists()
    tiles = Path(out_dir, "_tiles.parquet")
    assert tiles.exists()


def test_flagship_resume_recomputes_only_missing(sf_unit, out_dir):
    man1 = run_flagship(sf_unit, out_dir, n_parts=8)
    before = {m["partition"]: m["checksum"] for _, m in man1.iterrows()}
    # clobber two partitions
    for p in (2, 5):
        shutil.rmtree(Path(out_dir) / f"part={p:05d}")
        lineage.manifest_path(out_dir, p).unlink()
    # record mtimes of untouched manifests
    mt = {p: lineage.manifest_path(out_dir, p).stat().st_mtime_ns for p in (0, 1, 3, 4, 6, 7)}
    man2 = run_flagship(sf_unit, out_dir, n_parts=8)
    after = {m["partition"]: m["checksum"] for _, m in man2.iterrows()}
    assert after == before  # identical content restored
    for p, t in mt.items():
        assert lineage.manifest_path(out_dir, p).stat().st_mtime_ns == t  # untouched


def test_flagship_stale_fingerprint_forces_recompute(sf_unit, out_dir):
    run_flagship(sf_unit, out_dir, n_parts=4)
    mp = lineage.manifest_path(out_dir, 1)
    man = json.loads(mp.read_text())
    man["input_fingerprint"] = "stale"
    mp.write_text(json.dumps(man))
    missing = lineage.plan_missing(out_dir, list(range(4)),
                                   input_fingerprint(sf_unit, n_parts=4))
    assert missing == [1]


def test_flagship_checksums_parallelism_invariant(sf_unit, tmp_path):
    a = run_flagship(sf_unit, str(tmp_path / "a"), n_parts=4)
    b = run_flagship(sf_unit, str(tmp_path / "b"), n_parts=4)
    assert (a["checksum"].values == b["checksum"].values).all()
    assert (a["rows"].values == b["rows"].values).all()


def test_tile_layout_write(sf_unit, tmp_path):
    import pyarrow.parquet as pq

    from orthority_ray.pipelines.flagship import write_tile_layout

    flag = str(tmp_path / "flag")
    run_flagship(sf_unit, flag, n_parts=4)
    tiles_dir = str(tmp_path / "tiles")
    parts = write_tile_layout(tiles_dir, flag)
    assert len(parts) > 1 and all(p.startswith("tile_id=") for p in parts)
    # total rows preserved across the re-layout
    import pyarrow.dataset as pds

    n = pds.dataset(tiles_dir, partitioning="hive").count_rows()
    assert n == 6000


def test_row_checksum_order_insensitive():
    import pyarrow as pa

    t1 = pa.table({"a": pa.array([1, 2, 3], pa.int64()), "b": pa.array([9, 8, 7], pa.int64())})
    t2 = pa.table({"a": pa.array([3, 1, 2], pa.int64()), "b": pa.array([7, 9, 8], pa.int64())})
    t3 = pa.table({"a": pa.array([3, 1, 2], pa.int64()), "b": pa.array([7, 8, 9], pa.int64())})
    cs = lambda t: lineage.row_checksum(t, ["a", "b"])
    assert cs(t1) == cs(t2) != cs(t3)


def test_rerun_with_fewer_parts_prunes_stale_partitions(sf_unit, tmp_path):
    """Re-partitioning the same out_dir must not leave stale part dirs that
    the tile-layout glob would read as duplicate rows (r3 review)."""
    import glob

    from orthority_ray.pipelines.flagship import write_tile_layout
    from orthority_ray.state.lineage import completed_partitions

    out = str(tmp_path / "repart")
    run_flagship(sf_unit, out, n_parts=8)
    rows8 = sum(
        __import__("pyarrow.parquet", fromlist=["read_table"])
        .read_table(p).num_rows
        for p in glob.glob(f"{out}/part=*/data.parquet"))
    man = run_flagship(sf_unit, out, n_parts=4)
    assert sorted(completed_partitions(out)) == [0, 1, 2, 3]
    assert len(man) == 4
    rows4 = sum(
        __import__("pyarrow.parquet", fromlist=["read_table"])
        .read_table(p).num_rows
        for p in glob.glob(f"{out}/part=*/data.parquet"))
    assert rows4 == rows8  # same corpus, no duplicated stale rows
