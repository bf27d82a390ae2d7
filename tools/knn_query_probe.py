"""kNN query-side scale probe (r3 verdict #7): knn_cellring broadcasts the
query matrix to every scorer task — document what happens when the query
set grows 100x (QUERY_MOD 997 -> 10 at sf0.1: ~600 -> ~60k queries).

What scales with Q:
- broadcast query matrix: Q x 5 float64 (~2.4 MB at 60k) — one ray.put,
  fetched once per worker process via the cached_get pattern;
- per-batch partial output: <= k rows PER OPEN QUERY per batch (queries
  whose ring closed early emit fewer), so the merge shuffle is
  O(k * Q * n_batches) rows worst case — the number this probe measures;
- the final groupby(query_id).map_groups merge: Q groups, k * n_batches
  rows each.

Run: python tools/knn_query_probe.py [sf_dir]
Prints one JSON line; the result is recorded as a BASELINE.md §3 row.
"""

from __future__ import annotations

import json
import os
import sys
import time

import ray

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def probe(sf_dir: str) -> dict:
    from orthority_ray.stages import knn as KNN

    from __ray_entry__ import _geo

    out: dict = {"sf": sf_dir, "k": KNN.K}
    saved_mod = KNN.QUERY_MOD
    try:
        for label, mod in (("base", 997), ("x100", 10)):
            KNN.QUERY_MOD = mod
            geo = _geo(sf_dir)
            n_q = int(KNN.make_queries(geo).shape[0])
            t0 = time.perf_counter()
            ds = KNN.knn_cellring(geo)
            rows = ds.count()
            dt = time.perf_counter() - t0
            out[label] = {
                "query_mod": mod, "n_queries": n_q,
                "broadcast_bytes": n_q * 5 * 8,
                "result_rows": rows, "sec": round(dt, 2),
                "sec_per_query_ms": round(1000.0 * dt / max(1, n_q), 3),
            }
    finally:
        # an OOM mid-probe (the hazard being probed) must not leave the
        # module's query density at 100x for the rest of the process
        KNN.QUERY_MOD = saved_mod
    out["scale_factor_queries"] = round(
        out["x100"]["n_queries"] / out["base"]["n_queries"], 1)
    out["slowdown"] = round(out["x100"]["sec"] / out["base"]["sec"], 2)
    return out


if __name__ == "__main__":
    sf = sys.argv[1] if len(sys.argv) > 1 else "/root/testdata/sf0.1"
    if not ray.is_initialized():
        ray.init(address="local", num_cpus=32, include_dashboard=False,
                 logging_level="ERROR")
    print(json.dumps(probe(sf)))
    ray.shutdown()
