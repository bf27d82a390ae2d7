"""Document chunking + bigram language-model mining — two more LLM
training-data preparation stages over the documents table.

- ``doc_chunks``: split every document into fixed-size character windows
  with overlap (size 200, stride 150 — the standard RAG/packing chunker),
  emitting (doc_id, chunk_idx, chunk_chars, chunk_md5).  Vectorized by
  CHUNK ORDINAL, not by row: for ordinal k, one zero-copy
  ``utf8_slice_codeunits(start=k*stride)`` slices every document with >= k
  chunks at once, so the per-batch loop is bounded by max-chunks-per-doc
  (4 here), never by row count.  md5 goes through the dictionary-encoded
  per-distinct-value memo (stages/dedup.add_text_md5) — crawl corpora are
  duplicate-heavy and overlapping chunks repeat verbatim.

- ``bigram_top``: per first-token, the most frequent NEXT token with its
  count — the conditional-bigram table an n-gram LM / suggestion model
  trains on.  Adjacency is computed on the RAW regex-split positions
  (both neighbors must be non-empty), matching the SQL oracle's
  position-join semantics even if a text produced empty split slots.
  Shape: per-block flatten of the split list (offset arithmetic, no
  Python per token) -> per-block (tok_a, tok_b) count combiner ->
  bucketed sum -> relative prevalence filter (n * 1000 >= total bigrams,
  exact) -> per-tok_a argmax with deterministic ties.

Scale note: distinct bigrams are the shuffle's group count; the per-block
combiner collapses each block to its distinct pairs first, and the final
argmax is one bucketed exchange over the aggregated (not raw) pairs.
"""

from __future__ import annotations

import numpy as np
import pandas as pd
import pyarrow as pa
import pyarrow.compute as pc
import ray
import ray.data

from ..pipelines.relational import _read, combined_groupby_sum
from .dedup import add_text_md5
from .grouping import bucketed_group_apply

CHUNK_SIZE = 200
CHUNK_STRIDE = 150
# bigram prevalence floor: keep pairs with n * 1000 >= total bigram count
# (0.1% of bigram mass) — also bounds the bigram_coverage broadcast model
# to <= 1000 entries by pigeonhole


def _chunk_batch(b: pa.Table) -> pa.Table:
    text = b["text"].combine_chunks() if isinstance(
        b["text"], pa.ChunkedArray) else b["text"]
    lens = pc.utf8_length(text).to_numpy(zero_copy_only=False)
    nch = (lens + CHUNK_STRIDE - 1) // CHUNK_STRIDE  # 0 chunks for len 0
    max_nch = int(nch.max()) if nch.shape[0] else 0
    doc_ids = b["doc_id"].to_numpy(zero_copy_only=False)
    parts = []
    for k in range(max_nch):
        sel = nch > k
        sliced = pc.utf8_slice_codeunits(
            text.filter(pa.array(sel)),
            start=k * CHUNK_STRIDE, stop=k * CHUNK_STRIDE + CHUNK_SIZE)
        parts.append(pa.table({
            "doc_id": pa.array(doc_ids[sel]),
            "chunk_idx": pa.array(np.full(int(sel.sum()), k, np.int64)),
            "chunk_chars": pc.utf8_length(sliced).cast(pa.int64()),
            "chunk": sliced,
        }))
    if not parts:
        return pa.table({"doc_id": pa.array([], pa.int64()),
                         "chunk_idx": pa.array([], pa.int64()),
                         "chunk_chars": pa.array([], pa.int64()),
                         "chunk_md5": pa.array([], pa.string())})
    out = pa.concat_tables(parts)
    out = add_text_md5(out, col="chunk")
    out = out.rename_columns(
        ["doc_id", "chunk_idx", "chunk_chars", "chunk", "chunk_md5"])
    return out.drop_columns(["chunk"])


def doc_chunks(sf_dir: str) -> ray.data.Dataset:
    """Every document's overlapping character chunks with length + md5."""
    docs = _read(sf_dir, "documents", ["doc_id", "text"])
    return docs.map_batches(_chunk_batch, batch_format="pyarrow")


SQL_DOC_CHUNKS = f"""
SELECT doc_id, CAST(i AS BIGINT) AS chunk_idx,
       CAST(length(substr(text, CAST(i AS BIGINT) * {CHUNK_STRIDE} + 1,
                          {CHUNK_SIZE})) AS BIGINT) AS chunk_chars,
       md5(substr(text, CAST(i AS BIGINT) * {CHUNK_STRIDE} + 1,
                  {CHUNK_SIZE})) AS chunk_md5
FROM (SELECT doc_id, text,
             unnest(range(CAST(floor((length(text) + {CHUNK_STRIDE - 1})
                                     / {CHUNK_STRIDE}) AS BIGINT))) AS i
      FROM documents)
""".strip()


def _adjacent_pairs(text_col) -> tuple[pa.Array, np.ndarray, np.ndarray]:
    """Shared bigram-adjacency kernel (r3 review: was inlined twice, in
    ``_bigram_partial`` and ``bigram_coverage``'s Scorer): RE2-split the
    text column and return ``(flat_tokens, pair_idx, offsets)`` where
    ``pair_idx`` holds every flat index i such that (flat[i], flat[i+1])
    is a valid within-document bigram — i+1 is not a document start and
    both tokens are non-empty — and ``offsets`` are the normalized list
    offsets (for pair -> owning-document lookup)."""
    from ..core.texthash import split_tokens_arrow

    toks = split_tokens_arrow(text_col)
    flat = toks.flatten()
    offsets = toks.offsets.to_numpy(zero_copy_only=False)
    offsets = offsets - offsets[0]  # normalize a possibly-sliced ListArray
    n = len(flat)
    if n < 2:
        return flat, np.empty(0, dtype=np.int64), offsets
    starts = np.zeros(n + 1, dtype=bool)
    starts[offsets[1:-1]] = True  # first token index of docs 1..D-1
    nonempty = pc.not_equal(pc.utf8_length(flat), 0).to_numpy(
        zero_copy_only=False)
    pair_ok = (~starts[1:n]) & nonempty[:-1] & nonempty[1:]
    return flat, np.flatnonzero(pair_ok), offsets


def _bigram_partial(b: pa.Table) -> pa.Table:
    """Per-block distinct (tok_a, tok_b) counts from raw split positions."""
    flat, idx, _ = _adjacent_pairs(b["text"])
    if not idx.size:
        return pa.table({"tok_a": pa.array([], pa.string()),
                         "tok_b": pa.array([], pa.string()),
                         "n": pa.array([], pa.int64())})
    a = flat.take(pa.array(idx))
    c = flat.take(pa.array(idx + 1))
    df = pd.DataFrame({"tok_a": a.to_pandas(), "tok_b": c.to_pandas()})
    out = df.groupby(["tok_a", "tok_b"], as_index=False, sort=False).size()
    out = out.rename(columns={"size": "n"})
    out["n"] = out["n"].astype(np.int64)
    return pa.Table.from_pandas(out, preserve_index=False)


def bigram_top(sf_dir: str) -> ray.data.Dataset:
    """Per first-token modal next-token over the whole corpus, restricted
    to bigrams holding >= 0.1% of all bigram mass (exact integer
    cross-multiplied threshold)."""
    docs = _read(sf_dir, "documents", ["doc_id", "text"])
    partials = docs.map_batches(_bigram_partial, batch_format="pyarrow",
                                batch_size=65536)
    counts = combined_groupby_sum(partials, ["tok_a", "tok_b"], ["n"])
    counts = counts.materialize()  # distinct-bigram-sized; scanned twice
    total = counts.sum("n")
    if total is None:
        return ray.data.from_pandas(pd.DataFrame({
            "tok_a": pd.Series([], dtype=object),
            "tok_b": pd.Series([], dtype=object),
            "n": pd.Series([], dtype=np.int64)}))
    total = int(total)

    def prevalent(b: pa.Table) -> pa.Table:
        # winner-per-tok_a is unaffected by pre-filtering: if any bigram of
        # a tok_a passes the threshold, its max-count row does too
        nn = b["n"].to_numpy(zero_copy_only=False)
        return b.filter(pa.array(nn * 1000 >= total))

    def argmax(g: pd.DataFrame) -> pd.DataFrame:
        d = g.sort_values(["tok_a", "n", "tok_b"],
                          ascending=[True, False, True], kind="mergesort")
        return d.drop_duplicates("tok_a", keep="first")

    return bucketed_group_apply(
        counts.map_batches(prevalent, batch_format="pyarrow"),
        ["tok_a"], argmax)


SQL_BIGRAM_TOP = f"""
WITH toks AS (
  SELECT doc_id, token, pos FROM (
    SELECT doc_id, unnest(l) AS token, unnest(range(len(l))) AS pos
    FROM (SELECT doc_id, string_split_regex(text, '\\s+') AS l
          FROM documents)
  )
), big AS (
  SELECT a.token AS tok_a, b.token AS tok_b, CAST(COUNT(*) AS BIGINT) AS n
  FROM toks a JOIN toks b ON a.doc_id = b.doc_id AND b.pos = a.pos + 1
  WHERE a.token <> '' AND b.token <> ''
  GROUP BY 1, 2
), tot AS (SELECT CAST(SUM(n) AS BIGINT) AS t FROM big)
SELECT tok_a, tok_b, n FROM (
  SELECT *, ROW_NUMBER() OVER (PARTITION BY tok_a
                               ORDER BY n DESC, tok_b) AS rn
  FROM big
), tot WHERE rn = 1 AND n * 1000 >= t
""".strip()


def bigram_coverage(sf_dir: str) -> ray.data.Dataset:
    """Train-then-score at the BIGRAM level (the n-gram-LM analog of
    doc_typicality's unigram pass): phase 1 aggregates corpus bigram
    counts and keeps the PREVALENT set (n * 1000 >= total — at most 1000
    entries by construction, so the broadcast model is bounded no matter
    the corpus size); phase 2 re-streams the corpus and scores every document
    by how many of its bigrams are corpus-prevalent.  Output one row per
    document that has at least one bigram: (doc_id, n_bigrams, n_common),
    all exact int64."""
    docs = _read(sf_dir, "documents", ["doc_id", "text"])
    partials = docs.map_batches(_bigram_partial, batch_format="pyarrow",
                                batch_size=65536)
    counts = combined_groupby_sum(partials, ["tok_a", "tok_b"], ["n"])
    counts = counts.materialize()
    total = counts.sum("n")
    if total is None:
        return ray.data.from_pandas(pd.DataFrame({
            "doc_id": pd.Series([], dtype=np.int64),
            "n_bigrams": pd.Series([], dtype=np.int64),
            "n_common": pd.Series([], dtype=np.int64)}))
    total = int(total)

    def prevalent(b: pa.Table) -> pa.Table:
        nn = b["n"].to_numpy(zero_copy_only=False)
        return b.filter(pa.array(nn * 1000 >= total))

    model = counts.map_batches(prevalent, batch_format="pyarrow").to_pandas()
    # <= 1000 rows by the threshold's pigeonhole bound: broadcast-safe
    common = set(zip(model["tok_a"], model["tok_b"]))
    model_ref = ray.put(common)
    from ..core.config import cached_stage

    class Scorer:
        def __init__(self):
            self.common = ray.get(model_ref)

        def __call__(self, b: pa.Table) -> pa.Table:
            flat, idx, offsets = _adjacent_pairs(b["text"])
            doc_ids = b["doc_id"].to_numpy(zero_copy_only=False)
            if not idx.size:
                return pa.table({"doc_id": pa.array([], pa.int64()),
                                 "n_bigrams": pa.array([], pa.int64()),
                                 "n_common": pa.array([], pa.int64())})
            # pair -> owning document: searchsorted over the list offsets
            owner = np.searchsorted(offsets, idx, side="right") - 1
            a = flat.take(pa.array(idx)).to_pandas()
            c = flat.take(pa.array(idx + 1)).to_pandas()
            is_common = pd.MultiIndex.from_arrays([a, c]).isin(self.common)
            n_docs = doc_ids.shape[0]
            n_big = np.zeros(n_docs, dtype=np.int64)
            np.add.at(n_big, owner, 1)
            n_com = np.zeros(n_docs, dtype=np.int64)
            np.add.at(n_com, owner, is_common.astype(np.int64))
            has = n_big > 0
            return pa.table({"doc_id": pa.array(doc_ids[has]),
                             "n_bigrams": pa.array(n_big[has]),
                             "n_common": pa.array(n_com[has])})

    return docs.map_batches(
        cached_stage(Scorer, f"bigramcov:{model_ref.hex()}"),
        batch_format="pyarrow", batch_size=65536)


SQL_BIGRAM_COVERAGE = r"""
WITH toks AS (
  SELECT doc_id, token, pos FROM (
    SELECT doc_id, unnest(l) AS token, unnest(range(len(l))) AS pos
    FROM (SELECT doc_id, string_split_regex(text, '\s+') AS l
          FROM documents)
  )
), pairs AS (
  SELECT a.doc_id, a.token AS tok_a, b.token AS tok_b
  FROM toks a JOIN toks b ON a.doc_id = b.doc_id AND b.pos = a.pos + 1
  WHERE a.token <> '' AND b.token <> ''
), big AS (
  SELECT tok_a, tok_b, CAST(COUNT(*) AS BIGINT) AS n FROM pairs GROUP BY 1, 2
), tot AS (SELECT CAST(SUM(n) AS BIGINT) AS t FROM big),
common AS (SELECT tok_a, tok_b FROM big, tot WHERE n * 1000 >= t)
SELECT p.doc_id, CAST(COUNT(*) AS BIGINT) AS n_bigrams,
       CAST(SUM(CASE WHEN c.tok_a IS NOT NULL THEN 1 ELSE 0 END)
            AS BIGINT) AS n_common
FROM pairs p LEFT JOIN common c
  ON p.tok_a = c.tok_a AND p.tok_b = c.tok_b
GROUP BY p.doc_id
""".strip()


def token_fertility(sf_dir: str) -> ray.data.Dataset:
    """Tokenizer fertility by language: per lang, document / whitespace
    token / character totals (the chars-per-token diagnostic an LLM data
    pipeline tracks per language), exact int64 via per-block combiners
    over the language dimension."""
    docs = _read(sf_dir, "documents", ["lang", "text"])

    def partial(b: pa.Table) -> pa.Table:
        from ..core.texthash import nonempty_token_counts

        text = b["text"].combine_chunks() if isinstance(
            b["text"], pa.ChunkedArray) else b["text"]
        # empty split slots don't count as tokens (matches list_filter);
        # shared kernel owns the reduceat empty-list handling
        _, ntok, _ = nonempty_token_counts(text)
        nchar = pc.utf8_length(text).to_numpy(zero_copy_only=False)
        df = pd.DataFrame({"lang": b["lang"].to_pandas(),
                           "n_docs": np.ones(len(ntok), np.int64),
                           "n_tokens": ntok,
                           "n_chars": nchar.astype(np.int64)})
        return pa.Table.from_pandas(
            df.groupby("lang", as_index=False).sum(), preserve_index=False)

    parts = docs.map_batches(partial, batch_format="pyarrow",
                             batch_size=65536)
    return combined_groupby_sum(parts, ["lang"],
                                ["n_docs", "n_tokens", "n_chars"])


SQL_TOKEN_FERTILITY = r"""
SELECT lang, CAST(COUNT(*) AS BIGINT) AS n_docs,
       CAST(SUM(len(list_filter(string_split_regex(text, '\s+'),
                                x -> x <> ''))) AS BIGINT) AS n_tokens,
       CAST(SUM(length(text)) AS BIGINT) AS n_chars
FROM documents GROUP BY lang
""".strip()
