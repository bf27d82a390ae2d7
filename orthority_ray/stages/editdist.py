"""Exact Levenshtein edit distance, batch-vectorized across pairs.

LLM-pipeline near-dup verification often needs an exact character-level
distance on candidate pairs (n-gram Jaccard is set-based and misses
re-orderings).  The classic DP has a sequential dependency along each row
(curr[j] depends on curr[j-1] through insertions); the row is made fully
vectorizable with the min-plus prefix-scan identity

    curr[j] = min_{k <= j} (c0[k] + (j - k))
            = j + running_min(c0[k] - k)

where c0 = [row-leader, min(prev[1:]+1, prev[:-1]+subst_cost)] covers the
deletion/substitution candidates and the scan replays any chain of
insertions.  One batch of P pairs padded to (L1, L2) costs L1 vectorized
kernels over (P, L2) arrays — no Python per cell, no per-pair loop.

Reference analog: none (graft breadth for the webtext payload); oracle twin
is DuckDB's ``levenshtein()``.
"""

from __future__ import annotations

import numpy as np
import pyarrow as pa
import ray.data


def _pad_units(texts: list[str]) -> tuple[np.ndarray, np.ndarray]:
    """(P, Lmax) uint8 UTF-8-byte matrix (0-padded) + (P,) byte lengths.

    Distances are over UTF-8 BYTES, matching DuckDB's ``levenshtein()``
    exactly on every input (a codepoint-based variant diverges on any
    multi-byte character: levenshtein('é','a') is 2 in bytes, 1 in
    codepoints — the oracle gate would go red on non-ASCII corpora)."""
    if any(s is None for s in texts):
        raise ValueError("null text values are not supported by the "
                         "edit-distance kernel; filter them first")
    enc = [s.encode("utf-8") for s in texts]
    lens = np.array([len(b) for b in enc], dtype=np.int64)
    lmax = int(lens.max()) if lens.size else 0
    out = np.zeros((len(texts), lmax), dtype=np.uint8)
    for i, b in enumerate(enc):
        if b:
            out[i, : len(b)] = np.frombuffer(b, dtype=np.uint8)
    return out, lens


def _pad_units_arrow(col: pa.ChunkedArray | pa.Array) -> tuple[np.ndarray, np.ndarray]:
    """Like :func:`_pad_units` but filled STRAIGHT OFF the Arrow
    offsets/values buffers — Arrow strings are already UTF-8, so the
    decode-to-str + re-encode round-trip the list path pays is pure waste
    on the hot path (r3 review).  Bit-identical output, pinned by test."""
    if isinstance(col, pa.ChunkedArray):
        col = col.combine_chunks()
    if col.null_count:
        raise ValueError("null text values are not supported by the "
                         "edit-distance kernel; filter them first")
    if pa.types.is_string(col.type):
        odt = np.dtype(np.int32)
    elif pa.types.is_large_string(col.type):
        odt = np.dtype(np.int64)
    else:
        raise TypeError(f"expected a string column, got {col.type}")
    P = len(col)
    bufs = col.buffers()
    offs = np.frombuffer(bufs[1], dtype=odt)[
        col.offset : col.offset + P + 1].astype(np.int64)
    data = np.frombuffer(bufs[2], dtype=np.uint8)
    lens = offs[1:] - offs[:-1]
    lmax = int(lens.max()) if P else 0
    out = np.zeros((P, lmax), dtype=np.uint8)
    total = int(lens.sum())
    if total:
        row = np.repeat(np.arange(P, dtype=np.int64), lens)
        pos = (np.arange(total, dtype=np.int64)
               - np.repeat(np.cumsum(lens) - lens, lens))
        out[row, pos] = data[np.repeat(offs[:-1], lens) + pos]
    return out, lens


def _lev_padded(A: np.ndarray, la: np.ndarray,
                B: np.ndarray, lb: np.ndarray) -> np.ndarray:
    """The min-plus-scan DP over already-padded byte matrices."""
    P = A.shape[0]
    if P == 0:
        return np.zeros(0, dtype=np.int64)
    L1, L2 = A.shape[1], B.shape[1]
    j_idx = np.arange(L2 + 1, dtype=np.int32)
    prev = np.broadcast_to(j_idx, (P, L2 + 1)).copy()
    # preallocated scratch: the DP inner loop runs L1 times over (P, L2+1)
    # int32 slabs — fresh allocations per row paid ~2x in page faults
    c0 = np.empty((P, L2 + 1), dtype=np.int32)
    t = np.empty((P, L2), dtype=np.int32)
    t2 = np.empty((P, L2), dtype=np.int32)
    neq = np.empty((P, L2), dtype=bool)
    for i in range(1, L1 + 1):
        ai = A[:, i - 1][:, None]
        np.not_equal(B, ai, out=neq)                # subst cost, preallocated
        np.add(prev[:, :-1], neq, out=t)
        np.add(prev[:, 1:], 1, out=t2)              # deletion
        np.minimum(t, t2, out=t)
        c0[:, 0] = i
        c0[:, 1:] = t
        np.subtract(c0, j_idx, out=c0)
        np.minimum.accumulate(c0, axis=1, out=c0)   # insertion chains (min-plus scan)
        np.add(c0, j_idx, out=c0)
        # rows whose string a is shorter than i are already final: freeze
        # (padding columns beyond len(b) are computed but never read back)
        alive = la >= i
        prev[alive] = c0[alive]
    return prev[np.arange(P), lb].astype(np.int64)


def levenshtein_batch(a: list[str], b: list[str]) -> np.ndarray:
    """Exact UTF-8-byte edit distances for P string pairs, vectorized
    across the batch (DuckDB ``levenshtein()`` semantics)."""
    if len(a) != len(b):
        raise ValueError("pair lists must have equal length")
    if len(a) == 0:
        return np.zeros(0, dtype=np.int64)
    A, la = _pad_units(list(a))
    B, lb = _pad_units(list(b))
    return _lev_padded(A, la, B, lb)


def adjacent_doc_distances(docs: ray.data.Dataset) -> ray.data.Dataset:
    """(doc_a, doc_b=doc_a+1, edit_dist) for consecutive document ids — the
    oracle-checkable driver for the batch kernel: a self hash-join on
    ``doc_id + 1`` co-locates each pair, then one vectorized DP per batch."""
    from .hashjoin import hash_join

    def left(b: pa.Table) -> pa.Table:
        d = b["doc_id"].to_numpy(zero_copy_only=False)
        return pa.table({"k": pa.array(d + 1), "text_a": b["text"]})

    def right(b: pa.Table) -> pa.Table:
        return pa.table({"k": b["doc_id"], "text_b": b["text"]})

    lt = docs.map_batches(left, batch_format="pyarrow", batch_size=None)
    rt = docs.map_batches(right, batch_format="pyarrow", batch_size=None)
    j = hash_join(lt, rt, "k", ["k", "text_a"], ["k", "text_b"],
                  types={"text_a": pa.string(), "text_b": pa.string()})

    CHUNK = 512

    def dist(b: pa.Table) -> pa.Table:
        import pyarrow.compute as pc

        k = b["k"].to_numpy(zero_copy_only=False)
        ta, tb = b["text_a"], b["text_b"]
        la = pc.binary_length(ta).to_numpy(zero_copy_only=False)
        lb = pc.binary_length(tb).to_numpy(zero_copy_only=False)
        # length-bucket before chunking: pairs sorted by the padded-cost
        # driver max(la, lb), so one long outlier inflates only its own
        # ~CHUNK-pair slab, not every pair in the batch (r3 review: padded
        # cost is P * L1max * L2max; unsorted, one 100 KB doc in a 1 KB
        # batch wasted ~100x compute and risked a per-task OOM)
        order = np.argsort(np.maximum(la, lb), kind="stable")
        d = np.empty(len(k), dtype=np.int64)
        for s in range(0, len(order), CHUNK):
            sel = order[s : s + CHUNK]
            idx = pa.array(sel)
            A, laa = _pad_units_arrow(ta.take(idx))
            B, lbb = _pad_units_arrow(tb.take(idx))
            d[sel] = _lev_padded(A, laa, B, lbb)
        return pa.table({
            "doc_a": pa.array(k - 1),
            "doc_b": pa.array(k),
            "edit_dist": pa.array(d),
        })

    # explicit repartition before the DP: the join's reduce fan-out follows
    # its INPUT block count, and Ray's bundler packs a small text table into
    # one task however the upstream is batched — which left the O(P*L1*L2)
    # DP 2-way parallel (measured 6 s for 5k pairs vs ~1 s at full width).
    # The pair rows are tiny (two short strings); the extra exchange is
    # noise next to one DP batch.
    from ..core.config import read_blocks

    n_out = max(16, read_blocks() // 8)
    # batch_size=None = one batch PER BLOCK: a byte budget (8192) let the
    # bundler re-pack all n_out blocks into ~one task, serializing the DP
    # again (measured 5.9 s vs 1.5 s for 5k pairs at sf0.1); the in-task
    # length bucketing (CHUNK above) handles outliers within each block
    return j.repartition(n_out).map_batches(
        dist, batch_format="pyarrow", batch_size=None
    )


SQL_EDIT_DISTANCE = """
SELECT d1.doc_id AS doc_a, d2.doc_id AS doc_b,
       CAST(levenshtein(d1.text, d2.text) AS BIGINT) AS edit_dist
FROM documents d1 JOIN documents d2 ON d2.doc_id = d1.doc_id + 1
""".strip()


# --- Hamming-1 similarity JOIN via per-position deletion blocking ------------

KEY_WIDTH = 10  # zero-padded doc-key width (the url path digits)


def hamming_neighbors(pages: ray.data.Dataset) -> ray.data.Dataset:
    """(doc_id, n_nbrs): for every document, how many OTHER documents have
    a doc key (the zero-padded ``KEY_WIDTH``-digit url path segment)
    within Hamming distance EXACTLY 1 — the near-identical-URL join
    behind session-id/tracking-param collision detection.  Documents with
    no neighbor are absent (inner-join semantics, mirroring the oracle).

    This is the similarity-JOIN primitive (``edit_distance`` is pairwise
    compute on given pairs; this FINDS the pairs): each key emits
    ``KEY_WIDTH`` blocking keys — digit position p ZEROED, encoded as one
    int64 ``(key - digit_p * 10^p) * 10 + p`` — and two keys collide on a
    blocking key iff they differ at exactly digit p.  So every Hamming-1
    pair meets in EXACTLY one group (no dedup pass) and no non-pair ever
    meets.  Work is O(N * KEY_WIDTH) 16-byte rows through one
    co-partitioning exchange; group sizes are collision-cluster-sized,
    never corpus-sized.  All keys are integer arithmetic end to end — the
    first cut used pandas str slicing + a string-keyed exchange and spent
    21 s of a 24 s wall inside the shuffle at sf0.1; the int64 encoding
    runs the same join in ~3 s.

    Ray shape: map-side 10x skinny expansion (pure numpy) ->
    ``bucketed_group_apply`` on the int64 blocking key computing
    (group size - 1) per member via one transform('size') across the
    whole bucket -> single-key ``combined_groupby_sum`` fold per doc."""
    import pandas as pd

    from ..pipelines.relational import combined_groupby_sum
    from .grouping import bucketed_group_apply

    pows = np.array([10 ** p for p in range(KEY_WIDTH)], np.int64)

    def expand(b: pa.Table) -> pa.Table:
        # block-level dedup; the global dedup is free (identical doc_ids
        # produce identical blocking keys, so every duplicate pair
        # co-locates and group_counts drops it without an extra exchange)
        doc = np.unique(b["doc_id"].to_numpy(zero_copy_only=False))
        n = doc.shape[0]
        bks = np.empty(n * KEY_WIDTH, np.int64)
        for p in range(KEY_WIDTH):
            zeroed = doc - ((doc // pows[p]) % 10) * pows[p]
            bks[p * n:(p + 1) * n] = zeroed * KEY_WIDTH + p
        return pa.table({"doc_id": pa.array(np.tile(doc, KEY_WIDTH)),
                         "bk": pa.array(bks)})

    def group_counts(g: pd.DataFrame) -> pd.DataFrame:
        g = g.drop_duplicates()  # whole-corpus distinct (see expand note)
        n = g.groupby("bk", sort=False)["doc_id"].transform("size")
        out = pd.DataFrame({"doc_id": g["doc_id"],
                            "n_nbrs": (n - 1).astype(np.int64)})
        return out[out["n_nbrs"] > 0]

    expanded = pages.map_batches(expand, batch_format="pyarrow",
                                 batch_size=65536)
    member = bucketed_group_apply(expanded, ["bk"], group_counts)
    # the fold key is ROW-SCALE (one per doc): force the bucket exchange
    # — Ray's plain single-key aggregate measured 20 s at 456k keys (r5)
    return combined_groupby_sum(member, ["doc_id"], ["n_nbrs"],
                                bucketed=True)


SQL_HAMMING_NEIGHBORS = f"""
, pows AS (SELECT p, CAST(power(10, p) AS BIGINT) AS pw
           FROM generate_series(0, {KEY_WIDTH - 1}) AS g(p)),
keys AS (SELECT DISTINCT doc_id FROM pages),
bl AS (SELECT doc_id,
              (doc_id - ((doc_id // pw) % 10) * pw) * {KEY_WIDTH} + p AS bk
       FROM keys, pows),
cand AS (SELECT a.doc_id AS id_a, b.doc_id AS id_b
         FROM bl a JOIN bl b ON a.bk = b.bk AND a.doc_id < b.doc_id),
both_sides AS (SELECT id_a AS doc_id FROM cand
               UNION ALL SELECT id_b FROM cand)
SELECT doc_id, CAST(COUNT(*) AS BIGINT) AS n_nbrs
FROM both_sides GROUP BY doc_id
""".strip()
