"""Engine-wide execution knobs.

Actor pools use AUTOSCALING ``(1, n)`` concurrency everywhere: a fixed pool
of n actors deadlocks when several pools in one pipeline together exceed the
cluster's CPUs (each fixed pool insists on all n actors before making
progress).  With (1, n) the streaming executor starts each pool at 1 and
grows it only while CPUs are free, so stages share the node and backpressure
— not resource reservation — balances the pipeline (ray_guide.md "size
concurrency x num_cpus so no stage starves the others").
"""

from __future__ import annotations

import ray


def pool(n: int | None = None) -> tuple[int, int]:
    """Autoscaling actor-pool bounds: (1, min(n, cluster_cpus))."""
    try:
        total = int(ray.cluster_resources().get("CPU", 4))
    except Exception:
        total = 4
    n = n or total
    return (1, max(1, min(n, total)))


_STAGE_CACHE: dict[str, object] = {}


def cached_stage(cls, key: str, *args, **kwargs):
    """Wrap a callable-class batch fn as a STATELESS task fn with a
    per-worker-process instance cache: the instance builds once per worker
    (like an actor's __init__) but the stage runs as elastic tasks — no
    actor-pool spawn in the measured path (pool spin-up dominated several
    stage wall times; see BASELINE.md perf lessons).  ``key`` must encode
    everything the constructor args depend on (ObjectRef hexes included —
    refs die with their session and a fresh ray.put yields a fresh hex).
    """

    def fn(batch):
        inst = _STAGE_CACHE.get(key)
        if inst is None:
            inst = cls(*args, **kwargs)
            if len(_STAGE_CACHE) > 64:
                _STAGE_CACHE.pop(next(iter(_STAGE_CACHE)))
            _STAGE_CACHE[key] = inst
        return inst(batch)

    return fn


def session_token() -> str:
    """Identifier of the current Ray session/job — caches of materialized
    Datasets or ObjectRefs must be invalidated when it changes (objects die
    with their session; tests restart Ray mid-process).  When Ray is NOT
    initialized yet, every call returns a UNIQUE token so nothing caches
    under it: a constant fallback aliased two different sessions onto one
    cache key whenever the token was computed before the session's lazy
    auto-init, serving dead object refs after a restart."""
    try:
        if not ray.is_initialized():
            raise RuntimeError("uninitialized")
        # node id is fresh per local session (job ids restart at 01000000
        # in every new cluster, so they collide across restarts)
        return ray.get_runtime_context().get_node_id()
    except Exception:
        import uuid

        return f"uninit-{uuid.uuid4().hex}"


def table_path(sf_dir: str, table: str) -> str:
    """Resolve a table inside an sf dir in EITHER layout: the driver's
    single-file ``{table}.parquet`` or a partitioned directory ``{table}/``
    of part files (the shape a real deployment reads; every reader in the
    engine goes through this so the multi-file layout is first-class)."""
    from pathlib import Path

    p = Path(sf_dir) / f"{table}.parquet"
    if p.exists():
        return str(p)
    d = Path(sf_dir) / table
    if d.is_dir():
        return str(d)
    return str(p)  # let the reader raise its usual FileNotFoundError


def _parquet_files(path: str) -> list:
    from pathlib import Path

    p = Path(path)
    if p.is_dir():
        return sorted(f for f in p.rglob("*.parquet"))
    return [p]


def parquet_fragments(path: str, limit: int = 1 << 30) -> int:
    """Parallelizable fragments (files x row groups) of a parquet input.
    Stops counting at ``limit`` — deciding "enough to feed the cluster"
    must not touch a million footers on a real deployment."""
    import pyarrow.parquet as pq

    files = _parquet_files(path)
    total = 0
    for f in files:
        if total >= limit:
            break
        total += pq.ParquetFile(f).metadata.num_row_groups
    return total


def parquet_num_rows(path: str) -> int:
    import pyarrow.parquet as pq

    return sum(pq.ParquetFile(f).metadata.num_rows for f in _parquet_files(path))


def parquet_bytes(path: str) -> int:
    return sum(f.stat().st_size for f in _parquet_files(path))


# Introspection hook: how many reads this process materialized (tests assert
# the multi-file layout streams with ZERO materializations).
MATERIALIZED_READS = 0


def count_materialized_read() -> None:
    global MATERIALIZED_READS
    MATERIALIZED_READS += 1


_MATERIALIZE_DECISIONS: dict[tuple[str, int], bool] = {}


def should_materialize(path: str) -> bool:
    """True when the input has too few parquet fragments to feed the cluster
    natively (a one-file one-row-group read is a single serial task that
    throttles everything streamed behind it — the sandbox testdata shape).
    A real many-file input parallelizes at the read, so it must STREAM:
    materializing it would put the whole dataset in the object store, the
    classic scale-killer (VERDICT r2 "What's wrong" #1).

    The (path, cluster-width) decision is memoized: it is consulted on
    every read call and would otherwise re-open parquet footers each time.
    Keying on the width keeps the decision stable within one session while
    still re-evaluating if the cluster size genuinely changes.  Before
    ray.init the fallback is the machine width (os.cpu_count), not a magic
    constant — the decision should not flip with call order around init."""
    try:
        total = int(ray.cluster_resources().get("CPU", 4))
    except Exception:
        import os

        total = os.cpu_count() or 4
    key = (path, total)
    got = _MATERIALIZE_DECISIONS.get(key)
    if got is None:
        got = parquet_fragments(path, limit=total) < total
        if len(_MATERIALIZE_DECISIONS) > 4096:
            _MATERIALIZE_DECISIONS.clear()
        _MATERIALIZE_DECISIONS[key] = got
    return got


def read_blocks() -> int:
    """override_num_blocks for single-file reads: a one-file parquet read
    yields ONE read task and too few blocks to feed the cluster — scaling
    tests showed the pipeline block-starved at 32 CPUs (8 CPUs was faster).
    4 blocks per CPU keeps every worker busy with headroom for stragglers."""
    try:
        total = int(ray.cluster_resources().get("CPU", 4))
    except Exception:
        total = 4
    return max(64, 4 * total)
