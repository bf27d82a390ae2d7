"""Benchmark harness: headline flagship throughput + per-query timings.

Prints ONE JSON line:
  {"metric": "...", "value": <headline sec>, "unit": "sec",
   "queries": {...}, "sf": ..., "num_cpus": N, "docs_per_sec": ...}

``--scaling`` runs the headline pipeline twice in FRESH processes
(num_cpus=8 then 32, same input) and reports both throughputs + scaling
efficiency (the sandbox evidence for the north_rule's N -> 4N criterion).

Env: GRAFT_SF_DIR (default /root/testdata/sf0.1), RAY_GRAFT_CPUS (default 32).
"""

from __future__ import annotations

import json
import os
import subprocess
import sys
import time
import warnings

warnings.filterwarnings("ignore")

SF_DIR = os.environ.get("GRAFT_SF_DIR", "/root/testdata/sf0.1")
NUM_CPUS = int(os.environ.get("RAY_GRAFT_CPUS", "32"))


def _consume(res) -> int:
    """Drive a result to completion; return row count."""
    import pandas as pd
    import pyarrow as pa

    import ray.data

    if isinstance(res, ray.data.Dataset):
        n = 0
        for b in res.iter_batches(batch_size=65536, batch_format="pyarrow"):
            n += b.num_rows
        return n
    if isinstance(res, pa.Table):
        return res.num_rows
    return len(res)


def run_headline() -> dict:
    """The north-star pipeline: pages -> extract -> geocode -> PIP join +
    groupby-cell tile assignment.  Returns timing + docs/sec."""
    import ray

    from orthority_ray.sources.pages import read_pages, read_page_keys
    from orthority_ray.stages.extract import extract_batch
    from orthority_ray.stages.geocode import geocode, geocode_batch
    from orthority_ray.stages.pip import pip_join
    from orthority_ray.stages.tiles import assign_tiles

    n_docs = read_page_keys(SF_DIR).count()

    t0 = time.perf_counter()
    # one fused pass: synthesize pages, byte-exact extract, geocode, PIP join
    pages = read_pages(SF_DIR)
    staged = pages.map_batches(
        lambda b: geocode_batch(extract_batch(b)), batch_format="pyarrow", batch_size=16384
    )
    join_rows = _consume(pip_join(staged))
    tiles = assign_tiles(geocode(read_page_keys(SF_DIR)))
    sec = time.perf_counter() - t0
    return dict(sec=sec, n_docs=n_docs, join_rows=join_rows,
                n_cells=len(tiles), docs_per_sec=n_docs / sec)


def run_queries() -> dict[str, float]:
    import __ray_entry__ as E

    qs = E.queries()
    out = {}
    for name in sorted(qs):
        t0 = time.perf_counter()
        _consume(qs[name](SF_DIR))
        out[name] = round(time.perf_counter() - t0, 3)
    return out


def run_flagship_write() -> float:
    import shutil

    from orthority_ray.pipelines.flagship import run_flagship

    out = "/tmp/orthority_ray_bench/flagship"
    shutil.rmtree(out, ignore_errors=True)
    t0 = time.perf_counter()
    run_flagship(SF_DIR, out, n_parts=32)
    return round(time.perf_counter() - t0, 3)


def main() -> None:
    import ray
    from ray.data import DataContext

    ray.init(address="local", num_cpus=NUM_CPUS, include_dashboard=False,
             ignore_reinit_error=True, logging_level="ERROR")
    ctx = DataContext.get_current()
    ctx.enable_progress_bars = False

    # warm the page cache so we measure compute + shuffle, not first disk read
    import pyarrow.parquet as pq

    for t in ("lineitem", "documents", "embeddings", "events"):
        pq.read_table(f"{SF_DIR}/{t}.parquet")

    head = run_headline()
    queries = {} if os.environ.get("GRAFT_BENCH_HEADLINE_ONLY") else run_queries()
    if not os.environ.get("GRAFT_BENCH_HEADLINE_ONLY"):
        queries["flagship_write"] = run_flagship_write()
    ray.shutdown()

    print(json.dumps({
        "metric": "flagship spatial-join + tile-assignment wall time (sf docs)",
        "value": round(head["sec"], 3),
        "unit": "sec",
        "queries": queries,
        "sf": SF_DIR,
        "num_cpus": NUM_CPUS,
        "n_docs": head["n_docs"],
        "docs_per_sec": round(head["docs_per_sec"], 1),
        "pip_join_rows": head["join_rows"],
    }))


def scaling() -> None:
    def run(ncpu: int) -> dict:
        env = dict(os.environ, RAY_GRAFT_CPUS=str(ncpu), GRAFT_BENCH_HEADLINE_ONLY="1")
        out = subprocess.run([sys.executable, __file__], env=env,
                             capture_output=True, text=True, check=True).stdout
        return json.loads(out.strip().splitlines()[-1])

    lo, hi = 8, 32
    r_lo, r_hi = run(lo), run(hi)
    eff = (r_lo["value"] / r_hi["value"]) / (hi / lo)
    print(json.dumps({
        "metric": "scaling efficiency, fresh ray.init at 8 vs 32 CPUs, same input",
        "sec_8": r_lo["value"], "sec_32": r_hi["value"],
        "docs_per_sec_8": r_lo["docs_per_sec"], "docs_per_sec_32": r_hi["docs_per_sec"],
        "scaling_efficiency": round(eff, 3),
        "sf": SF_DIR,
    }))


if __name__ == "__main__":
    if "--scaling" in sys.argv:
        scaling()
    else:
        main()
