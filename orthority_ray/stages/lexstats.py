"""Corpus lexical statistics: type-token diversity and OOV rate per language.

Two standard training-corpus health metrics the reference-scale pipeline
needs before filtering decisions (reference analog: none — graft breadth
for the webtext payload; oracle twins are exact DuckDB SQL):

- ``lexical_diversity``: per language, total token count and DISTINCT token
  count (the type/token ratio's exact numerator and denominator).
- ``oov_rate``: per language, how many token occurrences fall outside the
  corpus-wide top-K vocabulary (count desc, token asc — a deterministic
  total order, so the cut is exact).

Ray shape (scales to the 100-TB corpus):
1. one tokenization pass (``core.texthash.split_tokens_arrow``, RE2
   whitespace semantics shared with every other tokenizer + the oracles),
   pre-counted PER BLOCK with a vectorized pandas groupby — the shuffle
   moves (lang, token, count) partials, never raw tokens;
2. one bucketed exchange keyed on token (groups never split across
   buckets) producing the globally-aggregated (lang, token, n) table —
   DIMENSION-sized (distinct tokens x langs), everything after it is tiny;
3. diversity: per-block partial (lang, n_distinct, n_tokens) -> final
   lang-sized groupby.  OOV: token totals -> ``global_topk`` (per-block
   partial top-k, one bounded merge — no global sort) -> broadcast top-K
   membership probe with ``pc.is_in`` -> lang-sized rollup.
"""

from __future__ import annotations

import numpy as np
import pandas as pd
import pyarrow as pa
import pyarrow.compute as pc
import ray.data

VOCAB_K = 100


def _lang_token_partials(b: pa.Table) -> pa.Table:
    """Per-block (lang, token, c) pre-counts, dedup-then-process: the crawl
    is duplicate-heavy, so the block's distinct (lang, text) reps are
    tokenized ONCE (one RE2-semantics split) and each rep's token counts
    are weighted by its page multiplicity — identical totals to per-page
    tokenization at a fraction of the split work (the repo's tfidf /
    vocabulary pattern)."""
    from ..core.texthash import split_tokens_arrow

    df = pd.DataFrame({"lang": b["lang"].to_pandas(),
                       "text": b["text"].to_pandas()})
    reps = df.groupby(["lang", "text"], as_index=False, sort=False).size()
    toks = split_tokens_arrow(pa.array(reps["text"], pa.string()))
    parent = pc.list_parent_indices(toks).to_numpy(zero_copy_only=False)
    flat = pc.list_flatten(toks)
    keep = pc.not_equal(flat, "")
    td = pd.DataFrame({
        "rep": parent[keep.to_numpy(zero_copy_only=False)],
        "token": flat.filter(keep).to_pandas(),
    })
    tc = td.groupby(["rep", "token"], as_index=False, sort=False).size()
    rep_idx = tc["rep"].to_numpy()
    w = reps["size"].to_numpy().astype(np.int64)
    g = pd.DataFrame({
        "lang": reps["lang"].to_numpy(dtype=object)[rep_idx],
        "token": tc["token"],
        "c": tc["size"].to_numpy().astype(np.int64) * w[rep_idx],
    }).groupby(["lang", "token"], as_index=False, sort=False)["c"].sum()
    return pa.table({
        "lang": pa.array(g["lang"], pa.string()),
        "token": pa.array(g["token"], pa.string()),
        "c": pa.array(g["c"].to_numpy().astype(np.int64)),
    })


def lang_token_counts(pages: ray.data.Dataset) -> ray.data.Dataset:
    """Globally-aggregated (lang, token, n) — each pair appears ONCE."""
    from .grouping import bucketed_group_apply

    parts = pages.map_batches(_lang_token_partials, batch_format="pyarrow",
                              batch_size=16384)

    def bucket_sum(g: pd.DataFrame) -> pd.DataFrame:
        out = g.groupby(["lang", "token"], as_index=False, sort=False)["c"].sum()
        out["c"] = out["c"].astype(np.int64)
        return out

    # bucket on token only: all langs of one token co-locate, so the OOV
    # path can also derive exact per-token totals from the same exchange
    return bucketed_group_apply(parts, ["token"], bucket_sum)


def lexical_diversity(pages: ray.data.Dataset) -> ray.data.Dataset:
    """Per lang: n_tokens (occurrences) and n_distinct (type count)."""
    agg = lang_token_counts(pages)

    def partial(b: pa.Table) -> pa.Table:
        df = b.to_pandas()
        g = df.groupby("lang", as_index=False).agg(
            n_distinct=("token", "size"), n_tokens=("c", "sum"))
        return pa.table({
            "lang": pa.array(g["lang"], pa.string()),
            "n_distinct": pa.array(g["n_distinct"].to_numpy().astype(np.int64)),
            "n_tokens": pa.array(g["n_tokens"].to_numpy().astype(np.int64)),
        })

    def final(g: pd.DataFrame) -> pd.DataFrame:
        return g.groupby("lang", as_index=False).agg(
            n_distinct=("n_distinct", "sum"), n_tokens=("n_tokens", "sum"))

    return (agg.map_batches(partial, batch_format="pyarrow", batch_size=65536)
            .groupby("lang").map_groups(final, batch_format="pandas"))


def oov_rate(pages: ray.data.Dataset, k: int = VOCAB_K) -> ray.data.Dataset:
    """Per lang: total token occurrences and occurrences OUTSIDE the
    corpus-wide top-``k`` vocabulary (count desc, token asc)."""
    import ray

    from ..pipelines.relational import global_topk

    # the aggregated table is dimension-sized (distinct tokens x langs);
    # it feeds both the vocab cut and the rollup, so materialize ONCE
    agg = lang_token_counts(pages).materialize()

    def tok_totals(b: pa.Table) -> pa.Table:
        df = b.to_pandas().groupby("token", as_index=False)["c"].sum()
        return pa.table({"token": pa.array(df["token"], pa.string()),
                         "c": pa.array(df["c"].to_numpy().astype(np.int64))})

    # bucket exchange guarantees each token is wholly inside one block of
    # `agg`, so per-block totals are already global — no second shuffle
    totals = agg.map_batches(tok_totals, batch_format="pyarrow",
                             batch_size=None)
    top = global_topk(totals, ["c", "token"], [False, True], k,
                      rank_name=None).to_pandas()
    vocab_ref = ray.put(pa.array(sorted(top["token"]), pa.string()))

    def partial(b: pa.Table) -> pa.Table:
        from ..sources.pages import cached_get

        vocab = cached_get(vocab_ref)
        oov = pc.invert(pc.is_in(b["token"], value_set=vocab))
        c = b["c"].to_numpy(zero_copy_only=False)
        df = pd.DataFrame({
            "lang": b["lang"].to_pandas(),
            "n_tokens": c,
            "n_oov": np.where(oov.to_numpy(zero_copy_only=False), c, 0),
        })
        g = df.groupby("lang", as_index=False).agg(
            n_tokens=("n_tokens", "sum"), n_oov=("n_oov", "sum"))
        return pa.table({
            "lang": pa.array(g["lang"], pa.string()),
            "n_tokens": pa.array(g["n_tokens"].to_numpy().astype(np.int64)),
            "n_oov": pa.array(g["n_oov"].to_numpy().astype(np.int64)),
        })

    def final(g: pd.DataFrame) -> pd.DataFrame:
        return g.groupby("lang", as_index=False).agg(
            n_tokens=("n_tokens", "sum"), n_oov=("n_oov", "sum"))

    return (agg.map_batches(partial, batch_format="pyarrow", batch_size=65536)
            .groupby("lang").map_groups(final, batch_format="pandas"))


def vocab_growth(pages: ray.data.Dataset) -> ray.data.Dataset:
    """-> (hour, n_tokens, n_new_tokens): per crawl hour, the token volume
    crawled and how many distinct tokens were seen for the FIRST time that
    hour — the vocabulary-growth curve a corpus dashboard tracks as a crawl
    progresses (page timestamp contract: sources/pages synthesizes
    warc_ts = epoch + doc_id seconds, so hour = doc_id // 3600).

    Shape: (a) per-block (token, min doc_id) partials over the block's
    distinct texts (mins compose) -> one bucketed min exchange keyed on
    token (distinct-vocabulary-sized) -> hour attribution; (b) per-block
    per-hour token-volume partials (each distinct text tokenized once, its
    count fanned to its pages' hours); both rollups are hour-dimension
    unioned + summed (first-occurrence hours are a subset of occurrence
    hours, so the zero-padded union IS the SQL left join)."""
    from ..core.texthash import dedup_token_counts, split_tokens_arrow
    from ..pipelines.relational import combined_groupby_sum
    from .grouping import bucketed_group_apply

    def first_partial(b: pa.Table) -> pa.Table:
        df = pd.DataFrame({
            "doc_id": b["doc_id"].to_numpy(zero_copy_only=False),
            "text": b["text"].to_pandas()})
        reps = df.groupby("text", as_index=False, sort=False)["doc_id"].min()
        toks = split_tokens_arrow(pa.array(reps["text"], pa.string()))
        parent = pc.list_parent_indices(toks).to_numpy(zero_copy_only=False)
        flat = pc.list_flatten(toks)
        keep = pc.not_equal(flat, "")
        td = pd.DataFrame({
            "token": flat.filter(keep).to_pandas(),
            "first_doc": reps["doc_id"].to_numpy()[
                parent[keep.to_numpy(zero_copy_only=False)]],
        })
        g = td.groupby("token", as_index=False, sort=False)["first_doc"].min()
        return pa.table({"token": pa.array(g["token"], pa.string()),
                         "first_doc": pa.array(
                             g["first_doc"].to_numpy().astype(np.int64))})

    parts = pages.map_batches(first_partial, batch_format="pyarrow",
                              batch_size=16384)

    def bucket_min(g: pd.DataFrame) -> pd.DataFrame:
        out = g.groupby("token", as_index=False, sort=False)["first_doc"].min()
        out["first_doc"] = out["first_doc"].astype(np.int64)
        return out

    firsts = bucketed_group_apply(parts, ["token"], bucket_min)

    def new_partial(b: pa.Table) -> pa.Table:
        hour = b["first_doc"].to_numpy(zero_copy_only=False) // 3600
        u, c = np.unique(hour, return_counts=True)
        return pa.table({"hour": pa.array(u.astype(np.int64)),
                         "n_tokens": pa.array(np.zeros(u.size, np.int64)),
                         "n_new_tokens": pa.array(c.astype(np.int64))})

    def volume_partial(b: pa.Table) -> pa.Table:
        # dedup-then-process: tokenize each distinct text once, fan its
        # count back via the null-rejecting factorize helper
        doc = b["doc_id"].to_numpy(zero_copy_only=False)
        df = pd.DataFrame({"hour": doc // 3600,
                           "n_tokens": dedup_token_counts(b["text"])})
        g = df.groupby("hour", as_index=False, sort=False)["n_tokens"].sum()
        return pa.table({
            "hour": pa.array(g["hour"].to_numpy().astype(np.int64)),
            "n_tokens": pa.array(g["n_tokens"].to_numpy().astype(np.int64)),
            "n_new_tokens": pa.array(np.zeros(len(g), np.int64))})

    new_counts = firsts.map_batches(new_partial, batch_format="pyarrow",
                                    batch_size=65536)
    volumes = pages.map_batches(volume_partial, batch_format="pyarrow",
                                batch_size=16384)
    out = combined_groupby_sum(volumes.union(new_counts), ["hour"],
                               ["n_tokens", "n_new_tokens"])

    def drop_tokenless(b: pa.Table) -> pa.Table:
        # the SQL occ CTE has no row for an hour whose pages all tokenize
        # empty (unnest of [] yields nothing); a first-occurrence hour
        # always has >= 1 token, so this filter loses no n_new_tokens
        return b.filter(pc.greater(b["n_tokens"], 0))

    return out.map_batches(drop_tokenless, batch_format="pyarrow")


SQL_VOCAB_GROWTH = r"""
, tok AS (
  SELECT doc_id, token FROM (
    SELECT doc_id, unnest(string_split_regex(text, '\s+')) AS token
    FROM pages)
  WHERE token <> ''
), firsts AS (
  SELECT token, MIN(doc_id) AS first_doc FROM tok GROUP BY token
), newc AS (
  SELECT first_doc // 3600 AS hour, CAST(COUNT(*) AS BIGINT) AS n_new
  FROM firsts GROUP BY 1
), occ AS (
  SELECT doc_id // 3600 AS hour, CAST(COUNT(*) AS BIGINT) AS n_tok
  FROM tok GROUP BY 1
)
SELECT occ.hour, occ.n_tok AS n_tokens,
       CAST(COALESCE(newc.n_new, 0) AS BIGINT) AS n_new_tokens
FROM occ LEFT JOIN newc ON occ.hour = newc.hour
""".strip()


_SQL_TOK = r"""
tok AS (
  SELECT lang, token FROM (
    SELECT lang, unnest(string_split_regex(text, '\s+')) AS token FROM pages)
  WHERE token <> ''
)
""".strip()


SQL_LEXICAL_DIVERSITY = f""", {_SQL_TOK}
SELECT lang,
       CAST(COUNT(DISTINCT token) AS BIGINT) AS n_distinct,
       CAST(COUNT(*) AS BIGINT) AS n_tokens
FROM tok GROUP BY lang
""".strip()


def sql_oov_rate(k: int = VOCAB_K) -> str:
    return f""", {_SQL_TOK},
vocab AS (
  SELECT token FROM (
    SELECT token, COUNT(*) AS c FROM tok GROUP BY token
    ORDER BY c DESC, token ASC LIMIT {k})
)
SELECT lang,
       CAST(COUNT(*) AS BIGINT) AS n_tokens,
       CAST(SUM(CASE WHEN token IN (SELECT token FROM vocab)
                     THEN 0 ELSE 1 END) AS BIGINT) AS n_oov
FROM tok GROUP BY lang
""".strip()
