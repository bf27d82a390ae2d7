"""Per-partition lineage manifests + checkpointed resume (north_rule).

The reference has no checkpointing (first tile exception aborts the run,
`orthority/ortho.py:473-480`); at 10^12 docs a resumable layout is mandatory
(SURVEY.md §4 "Checkpoint / resume").  Design:

- output is partitioned by a deterministic ``part`` key (a hash/range of the
  shuffle key), one directory per partition: ``<out>/part=<p>/``;
- each completed partition writes ``<out>/_manifests/part-<p>.json`` with
  {partition, rows, input_fingerprint, checksum, engine_version} — written
  AFTER the data (write-then-manifest ordering makes the manifest the commit
  record; a crash leaves at worst an orphaned data dir that the resume pass
  overwrites);
- resume = anti-join of the plan's partition list against the manifest dir:
  only missing partitions are recomputed (``plan_missing``).

Checksum: order-insensitive uint64 sum of row hashes — stable across block
orders and parallelism levels.
"""

from __future__ import annotations

import json
import shutil
from pathlib import Path

import numpy as np
import pandas as pd
import pyarrow as pa
import pyarrow.parquet as pq

ENGINE_VERSION = "0.1.0"


def row_checksum(tbl: pa.Table, cols: list[str]) -> int:
    """Order-insensitive uint64 checksum over selected int64 columns."""
    with np.errstate(over="ignore"):
        mix = np.zeros(tbl.num_rows, dtype=np.uint64)
        for ci, c in enumerate(cols):
            v = tbl[c].to_numpy(zero_copy_only=False).astype(np.uint64)
            mix = mix * np.uint64(1099511628211) + v * np.uint64(2654435761 + ci)
        # splitmix64-style finalizer: without it the sum is linear in the
        # column sums and row permutations across columns collide
        mix ^= mix >> np.uint64(30)
        mix *= np.uint64(0xBF58476D1CE4E5B9)
        mix ^= mix >> np.uint64(27)
        mix *= np.uint64(0x94D049BB133111EB)
        mix ^= mix >> np.uint64(31)
        acc = np.uint64(mix.sum(dtype=np.uint64))
    return int(acc)


def manifest_path(out_dir: str | Path, part: int) -> Path:
    return Path(out_dir) / "_manifests" / f"part-{part:05d}.json"


def write_partition(out_dir: str | Path, part: int, tbl: pa.Table,
                    checksum_cols: list[str], input_fingerprint: str) -> dict:
    """Write one partition's parquet + manifest (idempotent: overwrites)."""
    out_dir = Path(out_dir)
    pdir = out_dir / f"part={part:05d}"
    # invalidate-then-rewrite: drop any existing manifest BEFORE touching
    # the data dir — a crash between rmtree and the new commit must leave
    # "orphaned data at worst", never a manifest claiming data that is
    # gone (an at-least-once retry of an already-committed partition hit
    # exactly that window; r3 review)
    old_mp = manifest_path(out_dir, part)
    if old_mp.exists():
        old_mp.unlink()
    if pdir.exists():
        shutil.rmtree(pdir)
    pdir.mkdir(parents=True, exist_ok=True)
    import time

    t0 = time.perf_counter()
    pq.write_table(tbl, pdir / "data.parquet")
    man = dict(
        partition=part,
        rows=tbl.num_rows,
        input_fingerprint=input_fingerprint,
        checksum=row_checksum(tbl, checksum_cols),
        engine_version=ENGINE_VERSION,
        path=str(pdir),
        # per-partition metrics (north_rule "lineage + metrics"): size and
        # write wall time let an operator spot skewed/slow partitions from
        # the manifest table alone
        bytes=int(tbl.nbytes),
        write_s=round(time.perf_counter() - t0, 4),
    )
    mp = manifest_path(out_dir, part)
    mp.parent.mkdir(parents=True, exist_ok=True)
    tmp = mp.with_suffix(".tmp")
    tmp.write_text(json.dumps(man))
    tmp.rename(mp)  # atomic commit
    return man


def completed_partitions(out_dir: str | Path) -> dict[int, dict]:
    mdir = Path(out_dir) / "_manifests"
    if not mdir.exists():
        return {}
    out = {}
    for f in sorted(mdir.glob("part-*.json")):
        man = json.loads(f.read_text())
        out[man["partition"]] = man
    return out


def plan_missing(out_dir: str | Path, planned: list[int], input_fingerprint: str) -> list[int]:
    """Partitions still to compute: anti-join plan vs manifests; a manifest
    with a stale input fingerprint does NOT count as done."""
    done = completed_partitions(out_dir)
    return [
        p for p in planned
        if p not in done or done[p]["input_fingerprint"] != input_fingerprint
    ]


def load_manifest_table(out_dir: str | Path) -> pd.DataFrame:
    mans = completed_partitions(out_dir)
    return pd.DataFrame(sorted(mans.values(), key=lambda m: m["partition"]))
