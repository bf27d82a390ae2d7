"""fsspec multi-file / URL ingestion + incremental manifest semantics."""

from __future__ import annotations

import pandas as pd
import pyarrow as pa
import pyarrow.parquet as pq
import pytest

from orthority_ray.sources.ingest import (
    incremental_ingest,
    ingested_files,
    read_parquet_any,
    resolve_inputs,
)


@pytest.fixture()
def shards(tmp_path):
    d = tmp_path / "drops"
    d.mkdir()
    for i in range(3):
        pq.write_table(
            pa.table({"doc_id": pa.array([i * 10, i * 10 + 1], pa.int64()),
                      "v": pa.array([1, 2], pa.int64())}),
            d / f"part-{i:04d}.parquet")
    return d


def test_resolve_glob_dir_and_url(shards):
    fs, via_dir = resolve_inputs(str(shards))
    _, via_glob = resolve_inputs(str(shards / "*.parquet"))
    _, via_url = resolve_inputs(f"file://{shards}/*.parquet")
    assert len(via_dir) == 3
    assert [p.split("/")[-1] for p in via_dir] == \
        [p.split("/")[-1] for p in via_glob] == \
        [p.split("/")[-1] for p in via_url]
    with pytest.raises(FileNotFoundError):
        resolve_inputs(str(shards / "nope-*.parquet"))


def test_read_parquet_any_streams_all_fragments(ray_session, shards):
    ds = read_parquet_any(f"file://{shards}", columns=["doc_id"])
    got = sorted(ds.to_pandas()["doc_id"].tolist())
    assert got == [0, 1, 10, 11, 20, 21]


def test_memory_filesystem_resolves(ray_session):
    # per-process backend: resolve + driver-side open work through the
    # SAME fsspec transparency as any cloud URL
    import fsspec

    mfs = fsspec.filesystem("memory")
    with mfs.open("/bucket/a.parquet", "wb") as f:
        pq.write_table(pa.table({"x": pa.array([7], pa.int64())}), f)
    fs, paths = resolve_inputs("memory://bucket/*.parquet")
    assert len(paths) == 1
    with fs.open(paths[0], "rb") as f:
        assert pq.read_table(f)["x"].to_pylist() == [7]


def test_incremental_ingest_commits_and_resumes(ray_session, shards,
                                                tmp_path):
    state = tmp_path / "state"
    new, ds, commit, bad = incremental_ingest(str(shards), str(state))
    assert len(new) == 3 and ds.count() == 6
    # crash before commit: nothing recorded, same files come back
    new2, _, commit2, _ = incremental_ingest(str(shards), str(state))
    assert new2 == new
    commit2()
    assert len(ingested_files(str(state))) == 3
    # nothing new -> no dataset
    new3, ds3, _, _ = incremental_ingest(str(shards), str(state))
    assert new3 == [] and ds3 is None
    # a fresh drop lands: only it is ingested
    pq.write_table(pa.table({"doc_id": pa.array([99], pa.int64()),
                             "v": pa.array([9], pa.int64())}),
                   shards / "part-0003.parquet")
    new4, ds4, commit4, _ = incremental_ingest(str(shards), str(state))
    assert [p.split("/")[-1] for p in new4] == ["part-0003.parquet"]
    assert ds4.to_pandas()["doc_id"].tolist() == [99]
    commit4()
    assert len(ingested_files(str(state))) == 4


def test_incremental_ingest_quarantines_corrupt_files(ray_session, shards,
                                                      tmp_path):
    from orthority_ray.sources.ingest import quarantined_files

    state = tmp_path / "state"
    (shards / "part-9999.parquet").write_bytes(b"not a parquet file")
    new, ds, commit, bad = incremental_ingest(str(shards), str(state))
    assert [p.split("/")[-1] for p in bad] == ["part-9999.parquet"]
    assert len(new) == 3 and ds.count() == 6  # readable shards unaffected
    commit()
    assert len(quarantined_files(str(state))) == 1
    # quarantined paths are not retried on the next run
    new2, _, _, bad2 = incremental_ingest(str(shards), str(state))
    assert new2 == [] and bad2 == []


def test_transient_oserror_with_parquet_path_retries_then_raises(
        ray_session, shards, tmp_path, monkeypatch):
    """A transient OSError whose MESSAGE embeds the file path (which always
    ends in '.parquet') must be retried and raised, never quarantined —
    the signature match strips the path first (r4 review)."""
    import pyarrow.parquet as pq_mod

    state = tmp_path / "state"
    calls = {"n": 0}

    def flaky(f, *a, **kw):
        calls["n"] += 1
        raise OSError(
            f"[Errno 5] Input/output error: '{shards}/part-0000.parquet'")

    # ingest imports pyarrow.parquet lazily inside the function, so the
    # patch must land on the module itself
    monkeypatch.setattr(pq_mod, "read_schema", flaky)
    with pytest.raises(RuntimeError, match="NOT quarantined"):
        incremental_ingest(str(shards), str(state))
    assert calls["n"] >= 3  # retried, not first-strike quarantined


def test_thrift_footer_oserror_still_quarantines(ray_session, shards,
                                                 tmp_path, monkeypatch):
    """The measured data-shaped OSError signature (thrift footer
    deserializer) still quarantines after the path-stripping fix."""
    import pyarrow.parquet as pq_mod

    state = tmp_path / "state"

    def thrifty(f, *a, **kw):
        raise OSError("Couldn't deserialize thrift: TProtocolException: "
                      "Invalid data")

    monkeypatch.setattr(pq_mod, "read_schema", thrifty)
    new, ds, commit, bad = incremental_ingest(str(shards), str(state))
    assert new == [] and len(bad) == 3  # all checked files quarantined
