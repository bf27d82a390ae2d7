"""fsspec-backed multi-file / remote ingestion + incremental manifests.

Closes the reference-parity gap VERDICT r2 ranked #2: Orthority opens
local AND remote rasters transparently through fsspec OpenFile
(`/root/reference/orthority/common.py:249-347`); this module gives the
engine the same transparency for its parquet inputs.  Any local path,
glob, directory, or fsspec URL (``file://``, ``memory://``, cloud
schemes when their backend is installed) resolves to a concrete file
list plus a filesystem that ``ray.data.read_parquet`` streams natively —
many files in parallel, no materialization.

Incremental ingestion: a crawl pipeline re-runs as new drops land.
``incremental_ingest`` diffs the resolved file list against a
processed-file manifest (one path per line, committed atomically via
write-to-temp + rename) and returns only the NEW files as a streaming
Dataset plus a commit callback — the input-side counterpart of the
output-side lineage manifests (state/lineage.py): a crashed run that
never committed re-processes the same files; a committed run skips them.

Scale note: per-process fsspec backends (``memory://``) are visible only
on the driver — Ray workers run in other processes and see an empty
store.  ``resolve_inputs``/manifests work with any backend; distributed
*reads* need a worker-visible filesystem (local, NFS, or cloud), which is
also true of any real deployment.
"""

from __future__ import annotations

import posixpath
from pathlib import Path

import fsspec
import pyarrow.fs as pafs
import ray.data


def resolve_inputs(spec: str) -> tuple[fsspec.AbstractFileSystem, list[str]]:
    """Expand ``spec`` (path / glob / directory / fsspec URL) to
    (filesystem, sorted concrete parquet-file paths)."""
    fs, _, paths = fsspec.get_fs_token_paths(spec)
    if len(paths) == 1 and fs.isdir(paths[0]):
        # recursive, like core/config._parquet_files' rglob — partitioned
        # layouts (key=1/part-0.parquet) are first-class inputs (r3 review:
        # a top-level-only glob silently found zero files in them)
        paths = sorted(set(fs.glob(posixpath.join(paths[0], "*.parquet")))
                       | set(fs.glob(posixpath.join(paths[0],
                                                    "**/*.parquet"))))
    paths = [p for p in paths if not fs.isdir(p)]
    if not paths:
        raise FileNotFoundError(f"no parquet inputs match {spec!r}")
    return fs, sorted(paths)


def _ray_filesystem(fs: fsspec.AbstractFileSystem):
    """pyarrow filesystem for ray.data: native local FS stays native
    (zero wrapper overhead, worker-safe); anything else goes through the
    FSSpecHandler bridge."""
    if isinstance(fs, fsspec.implementations.local.LocalFileSystem):
        return None  # ray.data resolves local paths natively
    return pafs.PyFileSystem(pafs.FSSpecHandler(fs))


def read_parquet_any(spec: str, columns: list[str] | None = None,
                     **kwargs) -> ray.data.Dataset:
    """Streaming parquet read of any local/remote/glob/directory spec —
    one read task per fragment, no materialization."""
    fs, paths = resolve_inputs(spec)
    return ray.data.read_parquet(paths, filesystem=_ray_filesystem(fs),
                                 columns=columns, **kwargs)


MANIFEST_NAME = "ingested_files.txt"


def _manifest_path(state_dir: str) -> Path:
    return Path(state_dir) / MANIFEST_NAME


def ingested_files(state_dir: str) -> set[str]:
    p = _manifest_path(state_dir)
    if not p.exists():
        return set()
    return {line.strip() for line in p.read_text().splitlines()
            if line.strip()}


def quarantined_files(state_dir: str) -> set[str]:
    p = Path(state_dir) / QUARANTINE_NAME
    if not p.exists():
        return set()
    return {line.strip() for line in p.read_text().splitlines()
            if line.strip()}


QUARANTINE_NAME = "quarantined_files.txt"


def incremental_ingest(
    spec: str, state_dir: str, columns: list[str] | None = None,
    quarantine: bool = True,
):
    """-> (new_files, dataset_over_new_files_or_None, commit_fn,
    quarantined_files_this_run).

    ``commit_fn()`` appends the new files to the manifest ATOMICALLY
    (temp file + os.replace), so a crash mid-run re-processes the same
    files next time (at-least-once, the lineage contract) and a committed
    run skips them.

    ``quarantine=True`` (default): files whose parquet footer is CORRUPT
    (Arrow parse error) are split out instead of killing the whole drop —
    they go to a separate quarantine manifest on commit (so a later fixed
    copy with the same path is NOT retried automatically; operators triage
    the list), and the returned dataset covers only the readable files.
    Real crawl drops contain truncated files; one bad shard must not block
    the other 9999.  TRANSIENT failures (OSError/timeout on a healthy
    file) are retried and then RAISED, never quarantined — quarantine is
    permanent, so admitting a flaky read would silently drop the file from
    the corpus forever (r3 review).  Footers are validated concurrently
    (thread pool: the checks are IO-bound metadata round trips), not in a
    serial driver loop."""
    import os
    from concurrent.futures import ThreadPoolExecutor

    import pyarrow as pa
    import pyarrow.parquet as pq

    fs, paths = resolve_inputs(spec)
    done = ingested_files(state_dir) | quarantined_files(state_dir)
    new = [p for p in paths if p not in done]
    bad: list[str] = []
    if quarantine and new:
        def check(p: str) -> tuple[str, bool]:
            # Classification contract (r3 advice + r4 review): an error is
            # quarantined only when it is DATA-shaped — pa.ArrowInvalid, or
            # an OSError whose message carries a parquet-parse signature
            # (bad magic / footer / short read: on object stores the real
            # range reads happen inside pq.read_schema, so a transient
            # TimeoutError/ConnectionResetError surfaces THERE, not at
            # fs.open, and must be retried-then-RAISED, never silently
            # written to the no-retry quarantine manifest).  Anything else
            # (filesystem layer, network) retries 3x then raises.
            last: Exception | None = None
            for _ in range(3):
                try:
                    with fs.open(p, "rb") as f:
                        pq.read_schema(f)
                    return p, True
                except pa.ArrowInvalid:
                    return p, False  # corrupt footer/encoding: quarantine
                except OSError as e:
                    # Strip the file path from the message BEFORE signature
                    # matching: every checked path ends in '.parquet', so a
                    # transient OSError that embeds the path (fsspec
                    # FileNotFoundError, EIO with filename) would otherwise
                    # match a data-shaped signature and be quarantined
                    # without retry (r4 review).
                    msg = str(e).lower().replace(p.lower(), "")
                    # measured signatures (tests/test_ingest): garbage /
                    # truncated / empty files raise ArrowInvalid (caught
                    # above); the one data-shaped OSError is the thrift
                    # footer deserializer ("Couldn't deserialize thrift")
                    if any(sig in msg for sig in
                           ("deserialize thrift", "footer")):
                        return p, False  # data-shaped short read/garbage
                    last = e  # transient storage failure: retry
                except pa.ArrowException as e:
                    last = e  # non-Invalid Arrow error: retry, then raise
                except Exception as e:  # fsspec timeout types etc.
                    last = e
            raise RuntimeError(
                f"transient read failure on {p!r} after 3 attempts "
                f"(NOT quarantined — fix the storage issue and re-run)"
            ) from last

        with ThreadPoolExecutor(min(32, len(new))) as ex:
            results = list(ex.map(check, new))
        new = [p for p, ok in results if ok]
        bad = [p for p, ok in results if not ok]
    ds = None
    if new:
        ds = ray.data.read_parquet(new, filesystem=_ray_filesystem(fs),
                                   columns=columns)

    def _write_atomic(name: str, entries: set[str]) -> None:
        target = Path(state_dir) / name
        target.parent.mkdir(parents=True, exist_ok=True)
        tmp = target.with_suffix(".tmp")
        tmp.write_text("\n".join(sorted(entries)) + "\n")
        os.replace(tmp, target)

    def commit() -> None:
        if new:
            _write_atomic(MANIFEST_NAME, ingested_files(state_dir) | set(new))
        if bad:
            _write_atomic(QUARANTINE_NAME,
                          quarantined_files(state_dir) | set(bad))

    return new, ds, commit, bad
