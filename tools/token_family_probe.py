"""Token-index family scale probe: the shared hash->dedup->tokenize
prefix (stages/tfidf.token_family) plus the tfidf_topk tail, run at a
replicated page volume (default 40x sf0.1 = 24M docs).

What scales with page volume N:
- rows (_doc_text_rows): one streaming pass, block-distinct (md5,
  doc_id) rows + one text row per distinct text per block — output is
  O(N) skinny rows, texts ship once per (block, distinct text);
- reps/rep_tf: distinct-corpus-sized (constant for a duplicate-heavy
  crawl) — the tokenize cost does NOT grow with N;
- the tfidf_topk expansion join: K rows per doc through one bucketed
  md5 hash join — the only O(N) exchange, the number this probe
  measures.

Run: python tools/token_family_probe.py [sf_dir] [replicate]
Prints one JSON line; the result is recorded as a BASELINE.md §3 row.
"""

from __future__ import annotations

import json
import os
import sys
import time

import ray

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def _drain(ds) -> int:
    import pyarrow as pa

    n = 0
    counted = ds.map_batches(
        lambda b: pa.table({"n": pa.array([b.num_rows], pa.int64())}),
        batch_format="pyarrow")
    for b in counted.iter_batches(batch_size=4096, batch_format="pyarrow"):
        n += int(b["n"].to_numpy().sum())
    return n


def probe(sf_dir: str, replicate: int) -> dict:
    from orthority_ray.sources.pages import (
        pages_from_keys,
        read_page_keys_replicated,
    )
    from orthority_ray.stages import tfidf as TF

    keys = read_page_keys_replicated(sf_dir, replicate)
    # keys-only count: counting the synthesized pages would execute the
    # full text-synthesis pipeline once just to learn N (r4 review)
    n_docs = keys.count()
    pages = pages_from_keys(keys, sf_dir, columns=["doc_id", "text"])

    out: dict = {"sf": sf_dir, "replicate": replicate, "n_docs": n_docs}
    t0 = time.perf_counter()
    rows = TF._doc_text_rows(pages)
    t1 = time.perf_counter()
    reps = TF._reps(rows).materialize()
    rep_tf = TF._rep_tf(reps).materialize()
    t2 = time.perf_counter()
    n_out = _drain(TF.tfidf_topk(None, rows=rows, rep_tf=rep_tf))
    t3 = time.perf_counter()
    out.update({
        "n_reps": reps.count(),
        "n_rep_tf_rows": rep_tf.count(),
        "rows_pass_sec": round(t1 - t0, 2),
        # _reps' md5-bucketed exchange over the skinny doc rows + the
        # rep-level tokenize (the latter is distinct-corpus-sized)
        "rep_exchange_tokenize_sec": round(t2 - t1, 2),
        "topk_tail_sec": round(t3 - t2, 2),
        "total_sec": round(t3 - t0, 2),
        "out_rows": n_out,
        "docs_per_sec": round(n_docs / (t3 - t0), 1),
    })
    return out


if __name__ == "__main__":
    sf = sys.argv[1] if len(sys.argv) > 1 else "/root/testdata/sf0.1"
    rep = int(sys.argv[2]) if len(sys.argv) > 2 else 40
    if not ray.is_initialized():
        ray.init(address="local",
                 num_cpus=int(os.environ.get("RAY_GRAFT_CPUS", "32")),
                 include_dashboard=False, logging_level="ERROR")
    print(json.dumps(probe(sf, rep)))
    ray.shutdown()
