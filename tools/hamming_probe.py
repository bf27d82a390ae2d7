"""Similarity-join scale probe: hamming_neighbors at a replicated crawl.

What scales with page volume N:
- the map-side expansion is exactly KEY_WIDTH (=10) skinny rows per
  distinct doc — O(N), no quadratic pass anywhere;
- the (p, bk) exchange carries those O(N * 10) rows once; group sizes
  are collision-cluster-sized (the number of keys one substitution
  apart), never corpus-sized;
- the per-doc fold is a single-key combined_groupby_sum over O(N) rows.

So wall time should grow ~linearly in N.  Run:
    python tools/hamming_probe.py [sf_dir] [replicate]
Prints one JSON line; recorded as a BASELINE.md §3-style row.
"""

from __future__ import annotations

import json
import os
import sys
import time

import ray

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def main() -> None:
    sf = sys.argv[1] if len(sys.argv) > 1 else "/root/testdata/sf0.1"
    replicate = int(sys.argv[2]) if len(sys.argv) > 2 else 40
    if not ray.is_initialized():
        ray.init(address="local",
                 num_cpus=int(os.environ.get("RAY_GRAFT_CPUS", "32")),
                 include_dashboard=False, logging_level="ERROR")

    from orthority_ray.sources.pages import (pages_from_keys,
                                             read_page_keys_replicated)
    from orthority_ray.stages.editdist import hamming_neighbors

    out = {"sf": sf, "replicate": replicate}
    for tag, rep in (("base", 1), (f"x{replicate}", replicate)):
        keys = read_page_keys_replicated(sf, rep)
        pages = pages_from_keys(keys, sf, columns=["doc_id"])
        t0 = time.time()
        res = hamming_neighbors(pages)
        n_out = res.count()
        n_docs = keys.count()
        el = time.time() - t0
        out[f"{tag}_docs"] = n_docs
        out[f"{tag}_out_rows"] = n_out
        out[f"{tag}_sec"] = round(el, 2)
        out[f"{tag}_docs_per_sec"] = round(n_docs / el, 1)
    out["slowdown_vs_linear"] = round(
        (out[f"x{replicate}_sec"] / out["base_sec"]) / replicate, 3)
    print(json.dumps(out))
    ray.shutdown()


if __name__ == "__main__":
    main()
