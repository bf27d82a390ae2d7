"""Distributed BPE tokenizer training (iterative pair-merge learning).

The tokenizer-training operator of an LLM data pipeline, done the way BPE
actually scales (Sennrich et al. 2016, public): train on the corpus'
DISTINCT-WORD HISTOGRAM, not the raw token stream — one exact distributed
word count up front, then every merge round touches only vocab-sized
state:

1. word histogram: the corpus tokenizes ONCE (vectorized Arrow kernels,
   per-block pre-counts) into an exact (word, n) Dataset via a bucketed
   sum — identical machinery to the `vocabulary` oracle;
2. each round, a pass over the HISTOGRAM (not the corpus) counts adjacent
   symbol pairs weighted by word frequency; the global argmax (count desc,
   then pair lexicographic asc) comes from a driver fold of the bounded
   per-block partials when the histogram is a few blocks, else a bucketed
   exact sum with one nominee per bucket (see ``_best_pair``);
3. the winning pair is broadcast and applied to every word's symbol
   sequence in one map; repeat until ``n_merges`` or no pair repeats.

Determinism: integer counts everywhere and a total tie-break order make
the learned merge table independent of partitioning and worker count —
asserted against a plain single-process reference implementation in
tests/test_bpe.py.  The per-word merge application is a Python loop over
DISTINCT words (vocab-sized, the standard BPE trainer cost), never over
the corpus.
"""

from __future__ import annotations

import numpy as np
import pandas as pd
import pyarrow as pa
import pyarrow.compute as pc
import ray
import ray.data

N_MERGES = 24
END_MARK = "</w>"


def word_histogram(pages: ray.data.Dataset) -> ray.data.Dataset:
    """Exact (word, n) over the whitespace-tokenized corpus."""
    from ..stages.grouping import bucketed_group_apply

    def tok_counts(b: pa.Table) -> pa.Table:
        from ..core.texthash import split_tokens_arrow

        t = pc.list_flatten(split_tokens_arrow(b["text"]))
        t = t.filter(pc.not_equal(t, ""))
        vc = pc.value_counts(t)
        return pa.table({"word": vc.field("values"),
                         "n": vc.field("counts").cast(pa.int64())})

    parts = pages.map_batches(tok_counts, batch_format="pyarrow",
                              batch_size=16384)

    def merge(g: pd.DataFrame) -> pd.DataFrame:
        return g.groupby("word", as_index=False)["n"].sum()

    return bucketed_group_apply(parts, ["word"], merge)


def _initial_sym(hist: ray.data.Dataset) -> ray.data.Dataset:
    """word -> its character symbol sequence (end-of-word marker last)."""

    def split(b: pa.Table) -> pa.Table:
        syms = [list(w) + [END_MARK] for w in b["word"].to_pylist()]
        return pa.table({"n": b["n"],
                         "syms": pa.array(syms, pa.list_(pa.string()))})

    return hist.map_batches(split, batch_format="pyarrow", batch_size=None)


def _pair_counts(sym_ds: ray.data.Dataset) -> ray.data.Dataset:
    """(left, right, cnt) weighted adjacent-pair counts, block-combined."""

    def partial(b: pa.Table) -> pa.Table:
        n = b["n"].to_numpy(zero_copy_only=False)
        agg: dict[tuple[str, str], int] = {}
        for cnt, syms in zip(n, b["syms"].to_pylist()):
            for a, bb in zip(syms, syms[1:]):
                agg[(a, bb)] = agg.get((a, bb), 0) + int(cnt)
        if not agg:
            return pa.table({"left": pa.array([], pa.string()),
                             "right": pa.array([], pa.string()),
                             "cnt": pa.array([], pa.int64())})
        ks = list(agg.keys())
        return pa.table({"left": pa.array([k[0] for k in ks], pa.string()),
                         "right": pa.array([k[1] for k in ks], pa.string()),
                         "cnt": pa.array([agg[k] for k in ks], pa.int64())})

    return sym_ds.map_batches(partial, batch_format="pyarrow", batch_size=None)


def _best_pair(sym_ds: ray.data.Dataset,
               small_blocks: int = 8) -> tuple[str, str, int] | None:
    """Global argmax pair (count desc, then pair lexicographic asc).

    Two exact paths with identical results: when the histogram spans only
    a few blocks, the per-block pair partials are bounded and fold on the
    driver (no shuffle — the per-round cost that dominates small-corpus
    training); at scale, a bucketed exact sum nominates one pair per
    bucket and the driver picks among ~n_buckets rows."""
    parts = _pair_counts(sym_ds)
    if sym_ds.num_blocks() <= small_blocks:
        agg: dict[tuple[str, str], int] = {}
        for r in parts.take_all():
            k = (r["left"], r["right"])
            agg[k] = agg.get(k, 0) + int(r["cnt"])
        cand = [(c, p) for p, c in agg.items() if c >= 2]
        if not cand:
            return None
        cand.sort(key=lambda x: (-x[0], x[1]))
        return cand[0][1][0], cand[0][1][1], cand[0][0]

    from ..stages.grouping import bucketed_group_apply

    def bucket_best(g: pd.DataFrame) -> pd.DataFrame:
        s = g.groupby(["left", "right"], as_index=False)["cnt"].sum()
        s = s.sort_values(["cnt", "left", "right"],
                          ascending=[False, True, True], kind="mergesort")
        return s.head(1)

    rows = bucketed_group_apply(parts, ["left", "right"],
                                bucket_best, n_buckets=16).take_all()
    rows = [r for r in rows if r["cnt"] >= 2]
    if not rows:
        return None
    rows.sort(key=lambda r: (-r["cnt"], r["left"], r["right"]))
    return rows[0]["left"], rows[0]["right"], int(rows[0]["cnt"])


def _apply_merge(sym_ds: ray.data.Dataset, left: str, right: str) -> ray.data.Dataset:
    joined = left + right

    def apply(b: pa.Table) -> pa.Table:
        out = []
        for syms in b["syms"].to_pylist():
            res, i = [], 0
            while i < len(syms):
                if i + 1 < len(syms) and syms[i] == left and syms[i + 1] == right:
                    res.append(joined)
                    i += 2
                else:
                    res.append(syms[i])
                    i += 1
            out.append(res)
        return pa.table({"n": b["n"],
                         "syms": pa.array(out, pa.list_(pa.string()))})

    return sym_ds.map_batches(apply, batch_format="pyarrow", batch_size=None)


# Below this DISTINCT-WORD count the merge loop runs on the driver from
# the collected histogram: the rounds are inherently sequential, and at
# small vocab each distributed round is pure Ray dispatch latency (2
# round-trips x ~80 ms x n_merges).  The bound is vocab-sized state
# (<= 64k (word, n) rows, a few MB) — the same driver-fallback contract
# as dedup.connected_components' SMALL_EDGE_LIMIT.  Crawl-scale vocabs
# exceed it and take the distributed rounds.
SMALL_VOCAB_LIMIT = 65536


def _merge_loop(words: dict[str, int], n_merges: int) -> pd.DataFrame:
    """The sequential merge loop over an in-memory (word -> count)
    histogram — the SINGLE definition of the tie-break and stop rules,
    shared by the driver fast path and the test reference so they cannot
    drift from each other (the distributed path mirrors it and is pinned
    bit-identical in tests/test_bpe.py)."""
    sym = {w: tuple(list(w) + [END_MARK]) for w in words}
    merges = []
    for rank in range(n_merges):
        pairs: dict[tuple[str, str], int] = {}
        for w, cnt in words.items():
            s = sym[w]
            for a, b in zip(s, s[1:]):
                pairs[(a, b)] = pairs.get((a, b), 0) + cnt
        cand = [(c, p) for p, c in pairs.items() if c >= 2]
        if not cand:
            break
        cand.sort(key=lambda x: (-x[0], x[1]))
        cnt, (left, right) = cand[0]
        merges.append((rank, left, right, cnt))
        for w in sym:
            s, res, i = sym[w], [], 0
            while i < len(s):
                if i + 1 < len(s) and s[i] == left and s[i + 1] == right:
                    res.append(left + right)
                    i += 2
                else:
                    res.append(s[i])
                    i += 1
            sym[w] = tuple(res)
    return pd.DataFrame(merges, columns=["rank", "left", "right", "n_pairs"]) \
        .astype({"rank": np.int64, "n_pairs": np.int64})


def train_bpe(pages: ray.data.Dataset, n_merges: int = N_MERGES) -> pd.DataFrame:
    """Learn the merge table; returns (rank, left, right, n_pairs)."""
    hist = word_histogram(pages).materialize()
    n_words = hist.count()
    if n_words <= SMALL_VOCAB_LIMIT:
        df = hist.to_pandas()
        return _merge_loop(dict(zip(df["word"], df["n"].astype(int))),
                           n_merges)
    # the bucketed histogram arrives as ~n_buckets near-empty blocks; the
    # per-round passes would each dispatch that many tiny tasks — reblock
    # to a DATA-sized count (rows/64k, capped) before iterating
    blocks = max(1, min(256, n_words // 65536 + 1))
    sym = _initial_sym(hist).repartition(blocks).materialize()
    merges = []
    for rank in range(n_merges):
        best = _best_pair(sym)
        if best is None:
            break
        left, right, cnt = best
        merges.append((rank, left, right, cnt))
        sym = _apply_merge(sym, left, right).materialize()
    return pd.DataFrame(merges, columns=["rank", "left", "right", "n_pairs"]) \
        .astype({"rank": np.int64, "n_pairs": np.int64})


def bpe_train(sf_dir: str, n_merges: int = 12) -> pd.DataFrame:
    """Rows-only query: the learned merge table over the page corpus.
    12 merges keeps the (inherently sequential) round count benchmarkable;
    below SMALL_VOCAB_LIMIT distinct words the rounds fold on the driver,
    so the query's cost is the one corpus tokenize pass (text column
    only — synthesizing the unused page columns was ~2/3 of the old
    wall time)."""
    from ..sources.pages import read_pages

    return train_bpe(read_pages(sf_dir, columns=["text"]), n_merges)


def reference_bpe(texts: list[str], n_merges: int = N_MERGES) -> pd.DataFrame:
    """Single-process reference (same algorithm, no Ray) for tests:
    tokenize with the engine's TOKEN_RE, then run the shared
    :func:`_merge_loop`."""
    from collections import Counter

    from ..core.texthash import TOKEN_RE

    words: Counter = Counter()
    for t in texts:
        words.update(TOKEN_RE.findall(t))
    return _merge_loop(dict(words), n_merges)


# --- applying a trained merge table to the corpus ----------------------------


def encode_word(word: str, merges: list[tuple[str, str]]) -> list[str]:
    """Standard BPE encode of one word: apply the learned merges in rank
    order (identical output to lowest-rank-pair-first iteration, since
    later merges can only consume symbols earlier merges produced)."""
    syms = list(word) + [END_MARK]
    for left, right in merges:
        if len(syms) < 2:
            break
        res, i, joined = [], 0, left + right
        while i < len(syms):
            if i + 1 < len(syms) and syms[i] == left and syms[i + 1] == right:
                res.append(joined)
                i += 2
            else:
                res.append(syms[i])
                i += 1
        syms = res
    return syms


class BpeEncoder:
    """Per-worker encoder state: the broadcast merge table plus a
    DISTINCT-WORD subtoken-length cache — the corpus is encoded at
    vocab cost, not token-stream cost (dedup-then-process)."""

    def __init__(self, merges_ref):
        self.merges: list[tuple[str, str]] = ray.get(merges_ref)
        self.cache: dict[str, int] = {}

    def _len(self, w: str) -> int:
        n = self.cache.get(w)
        if n is None:
            n = len(encode_word(w, self.merges))
            if len(self.cache) > 2_000_000:  # bound worker memory
                self.cache.clear()
            self.cache[w] = n
        return n

    def __call__(self, b: pa.Table) -> pa.Table:
        from ..core.texthash import split_tokens_arrow

        toks = split_tokens_arrow(b["text"])
        flat = pc.list_flatten(toks)
        keep = pc.not_equal(flat, "")
        flat = flat.filter(keep)
        lens = pc.list_value_length(toks).to_numpy(zero_copy_only=False)
        # doc index per kept token: repeat doc positions by list length,
        # then drop the positions of the removed empty tokens
        doc_idx = np.repeat(np.arange(b.num_rows), lens)[
            keep.to_numpy(zero_copy_only=False)
        ]
        # dictionary-encode so only the batch's UNIQUE words touch Python;
        # the per-token fan-out back is one vectorized take
        de = flat.dictionary_encode()
        lens_u = np.fromiter((self._len(w) for w in de.dictionary.to_pylist()),
                             dtype=np.int64, count=len(de.dictionary))
        sub = lens_u[de.indices.to_numpy(zero_copy_only=False)]
        n_words = np.zeros(b.num_rows, dtype=np.int64)
        n_bpe = np.zeros(b.num_rows, dtype=np.int64)
        if doc_idx.size:
            starts = np.flatnonzero(
                np.concatenate([[True], doc_idx[1:] != doc_idx[:-1]])
            )
            present = doc_idx[starts]
            counts = np.diff(np.concatenate([starts, [doc_idx.size]]))
            n_words[present] = counts
            n_bpe[present] = np.add.reduceat(sub, starts)
        return pa.table({
            "doc_id": b["doc_id"],
            "n_words": pa.array(n_words),
            "n_bpe_tokens": pa.array(n_bpe),
        })


_MERGES_CACHE: dict[tuple, list] = {}


def bpe_encode(sf_dir: str, n_merges: int = 12) -> ray.data.Dataset:
    """Rows-only query: train the merge table (bounded, driver-held), then
    encode EVERY page — (doc_id, n_words, n_bpe_tokens).  Deterministic:
    the merge table is partition-invariant (see train_bpe) and the counts
    are exact integers.  The trained table is a deterministic artifact of
    (sf_dir, n_merges), so it is cached per session — training's 12
    sequential rounds dominate the query otherwise."""
    from ..sources.pages import read_pages

    pages = read_pages(sf_dir, columns=["doc_id", "text"])
    ck = (sf_dir, n_merges)
    merges = _MERGES_CACHE.get(ck)
    if merges is None:
        merges_df = train_bpe(pages, n_merges)
        merges = list(zip(merges_df["left"], merges_df["right"]))
        _MERGES_CACHE.clear()  # one corpus at a time is plenty
        _MERGES_CACHE[ck] = merges
    merges_ref = ray.put(merges)

    from ..core.config import cached_stage

    return pages.map_batches(
        cached_stage(BpeEncoder, f"bpe_enc:{merges_ref.hex()}", merges_ref),
        batch_format="pyarrow", batch_size=16384,
    )
