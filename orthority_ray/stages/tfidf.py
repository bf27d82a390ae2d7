"""Per-document TF-IDF top-k distinctive terms + inverted-index statistics.

Two training-data-pipeline operators over the pages corpus, both with
EXACT DuckDB oracles (integer arithmetic end-to-end):

* ``tfidf_topk`` — for every document, the K whitespace tokens with the
  highest rational tf-idf score ``(tf * SCALE) // df`` (tf = occurrences
  in the doc, df = number of documents containing the token).  The score
  is an int64 on both sides — no float log, no epsilon — and the ranking
  tie-break (score desc, token asc) is total, so DuckDB's
  ``row_number()`` reproduces it bit-for-bit.
* ``posting_stats`` — the inverted-index summary: per token its document
  frequency, total term frequency and first posting (min doc_id).

Topology — dedup-then-process, the crawl-scale shape (process each
DISTINCT text once, weight by its multiplicity).  Data-model contract:
doc_id DETERMINES text (rows may repeat, but one doc_id never carries
two different texts — the corpus synthesizer guarantees it, and both
this topology and the oracles' dpages CTE assume it; pinned by the
token_cooccurrence property test):

1. representatives: ONE pass over pages emits block-distinct (md5,
   doc_id) rows plus per-block (md5, text) rows (materialized, shared by
   steps 1 and 4); an md5-bucketed merge produces (md5, text,
   n_distinct_docs, min_doc) — doc-level stats are over DISTINCT docs
   (the oracle's ``dpages`` CTE; the pages table may repeat doc_ids), and
   texts ship once per (block, distinct text), never per doc;
2. rep-level token counts: ONE vectorized tokenize pass over the
   representatives (RE2 ``split_pattern_regex`` + ``list_parent_indices``,
   zero Python per token), matching the `vocabulary` oracle's
   ``string_split_regex(text, '\\s+')`` / ``token <> ''`` contract exactly
   (incl. non-ASCII whitespace — see texthash.py's token-boundary note);
3. df attach: one bucketed groupby on token — every (rep, token) row of a
   token lands in one bucket, so ``sum(n_docs)`` is the exact global df;
4. per-rep top-k (a rep's ranking is identical for every doc sharing its
   text), then ONE bucketed ``hash_join`` on text_md5 expands rep winners
   to per-doc rows; the join's in-bucket ``left_dedup`` finishes the
   global doc dedup inside that same exchange (doc_id determines md5, so
   duplicates always co-bucket).  The expansion is the only stage touching
   all docs and it moves K small rows per doc; with an all-distinct crawl
   the rep table degrades gracefully to one rep per doc — same plan, no
   broadcast anywhere.

The reference has no text-ranking operator (this extends the graft's
training-data surface next to dedup/ANN; see SURVEY.md training-data ops).
"""

from __future__ import annotations

import numpy as np
import pandas as pd
import pyarrow as pa
import pyarrow.compute as pc
import ray.data

K_TOP = 3
SCALE = 1_000_000


def _doc_text_rows(pages: ray.data.Dataset) -> ray.data.Dataset:
    """ONE pass over pages producing, per block, block-distinct doc rows
    (text_md5, doc_id, text=null) plus one text-carrying row per distinct
    text (doc_id = -1) — the shared input of the rep merge AND the final
    expansion join, materialized so pages is synthesized exactly once.
    The pages table can repeat doc_ids; doc-level statistics are over
    DISTINCT docs, so consumers dedup doc rows in their own bucketed pass
    (global dups always share an md5 and therefore a bucket)."""
    from ..stages.dedup import add_text_md5

    def rows(b: pa.Table) -> pa.Table:
        t = add_text_md5(b)
        df = t.select(["text_md5", "doc_id"]).to_pandas().drop_duplicates()
        texts = t.select(["text_md5", "text"]).to_pandas() \
            .drop_duplicates("text_md5")
        return pa.table({
            "text_md5": pa.array(
                pd.concat([df["text_md5"], texts["text_md5"]]), pa.string()),
            "doc_id": pa.array(np.concatenate([
                df["doc_id"].to_numpy(),
                np.full(len(texts), -1, np.int64)])),
            "text": pa.concat_arrays([
                pa.nulls(len(df), pa.string()),
                pa.array(texts["text"], pa.string())]),
        })

    return pages.map_batches(rows, batch_format="pyarrow",
                             batch_size=65536).materialize()


def _reps(rows: ray.data.Dataset) -> ray.data.Dataset:
    """(text_md5, text, n_docs, min_doc) — one row per distinct text, with
    the DISTINCT-doc count, from one md5-bucketed pass over
    :func:`_doc_text_rows` output (texts ship once per (block, distinct
    text), never per doc)."""
    from ..stages.grouping import bucketed_group_apply

    def merge(g: pd.DataFrame) -> pd.DataFrame:
        docs = g[g["doc_id"] >= 0]
        texts = g[g["doc_id"] < 0].drop_duplicates("text_md5")
        agg = docs.groupby("text_md5", as_index=False).agg(
            n_docs=("doc_id", "nunique"), min_doc=("doc_id", "min"))
        agg["n_docs"] = agg["n_docs"].astype(np.int64)
        out = agg.merge(texts[["text_md5", "text"]], on="text_md5")
        return out[["text_md5", "text", "n_docs", "min_doc"]]

    return bucketed_group_apply(rows, ["text_md5"], merge)


def _rep_tf(reps: ray.data.Dataset) -> ray.data.Dataset:
    """(text_md5, token, tf, n_docs, min_doc) — distinct tokens per rep."""

    def tf(b: pa.Table) -> pa.Table:
        from ..core.texthash import split_tokens_arrow

        toks = split_tokens_arrow(b["text"])
        flat = pc.list_flatten(toks)
        parent = pc.list_parent_indices(toks).to_numpy(zero_copy_only=False)
        keep = pc.not_equal(flat, "").to_numpy(zero_copy_only=False)
        df = pd.DataFrame({"rep": parent[keep],
                           "token": flat.to_numpy(zero_copy_only=False)[keep]})
        g = df.groupby(["rep", "token"], as_index=False, sort=False).size()
        g = g.rename(columns={"size": "tf"})
        g["tf"] = g["tf"].astype(np.int64)
        rep = g["rep"].to_numpy()
        md5 = b["text_md5"].to_numpy(zero_copy_only=False)
        nd = b["n_docs"].to_numpy(zero_copy_only=False)
        md = b["min_doc"].to_numpy(zero_copy_only=False)
        return pa.table({
            "text_md5": pa.array(md5[rep]),
            "token": pa.array(g["token"], pa.string()),
            "tf": pa.array(g["tf"].to_numpy()),
            "n_docs": pa.array(nd[rep]),
            "min_doc": pa.array(md[rep]),
        })

    return reps.map_batches(tf, batch_format="pyarrow", batch_size=4096)


def _with_df(rep_tf: ray.data.Dataset) -> ray.data.Dataset:
    """Attach the exact global document frequency to every (rep, token) row."""
    from ..stages.grouping import bucketed_group_apply

    def attach(g: pd.DataFrame) -> pd.DataFrame:
        codes, _ = pd.factorize(g["token"], sort=False)
        df_tok = np.bincount(codes, weights=g["n_docs"].to_numpy()).astype(np.int64)
        out = g.copy()
        out["df"] = df_tok[codes]
        return out

    return bucketed_group_apply(rep_tf, ["token"], attach)


def _expand_to_docs(rows: ray.data.Dataset, rep_rows: ray.data.Dataset,
                    right_cols: list[str],
                    types: dict) -> ray.data.Dataset:
    """The shared md5 expansion join: rep-level result rows fan out to
    per-doc rows through ONE bucketed ``hash_join`` on text_md5.  Left rows
    (from :func:`_doc_text_rows`) are only block-distinct; doc_id determines
    text_md5, so the join's in-bucket ``left_dedup`` finishes the global doc
    dedup inside the exchange the join already makes — no separate dedup
    shuffle.  ``right_cols`` must start with "text_md5"; output columns are
    doc_id + the rest of ``right_cols``."""
    from ..stages.hashjoin import hash_join

    def doc_rows(b: pa.Table) -> pa.Table:
        t = b.filter(pc.greater_equal(b["doc_id"], 0))
        return t.select(["doc_id", "text_md5"])

    left = rows.map_batches(doc_rows, batch_format="pyarrow",
                            batch_size=65536)
    joined = hash_join(left, rep_rows, "text_md5",
                       ["doc_id", "text_md5"], right_cols,
                       left_dedup="doc_id",
                       types={"doc_id": pa.int64(), **types})
    return joined.select_columns(
        ["doc_id"] + [c for c in right_cols if c != "text_md5"])


def _need_pages(pages: ray.data.Dataset | None) -> ray.data.Dataset:
    """Loud contract check for the dual-entry signatures below: deriving a
    prefix artifact requires ``pages``; calling with pages=None and no
    memoized artifact would otherwise die deep inside map_batches with an
    opaque AttributeError (r4 review)."""
    if pages is None:
        raise TypeError(
            "pages is required to derive this artifact — pass a pages "
            "Dataset, or the matching token_family(sf_dir) output via "
            "the keyword-only parameters")
    return pages


_FAMILY_MEMO: dict[tuple[str, str], tuple] = {}


def token_family(sf_dir: str) -> tuple:
    """-> (rows, reps, rep_tf), materialized — the shared prefix of the
    token-index family (tfidf_topk, posting_stats, token_cooccurrence,
    boolean_search, phrase_search), session-memoized so one bench/driver
    session hashes + dedups + tokenizes the corpus ONCE; each query then
    pays only its own tail (df attach / pair explosion / term filter /
    expansion join).  Deterministic for a fixed ``sf_dir``; session-keyed
    because materialized Datasets die with their Ray session (the
    core/config.session_token contract).

    Memory honesty at scale: ``reps``/``rep_tf`` are distinct-corpus-sized,
    but ``rows`` is page-volume-sized (one skinny (md5, doc_id) row per
    page) — a materialized O(N) artifact pinned for the session.  Its
    blocks live in the object store and SPILL under pressure (never the
    driver heap), and only ONE corpus stays pinned at a time (the clear-
    then-pin below), so the cost is bounded disk, not memory."""
    from ..core.config import session_token
    from ..sources.pages import read_pages

    key = (sf_dir, session_token())
    hit = _FAMILY_MEMO.get(key)
    if hit is None:
        rows = _doc_text_rows(read_pages(sf_dir, columns=["doc_id", "text"]))
        reps = _reps(rows).materialize()
        rep_tf = _rep_tf(reps).materialize()
        _FAMILY_MEMO.clear()
        _FAMILY_MEMO[key] = hit = (rows, reps, rep_tf)
    return hit


def tfidf_topk(pages: ray.data.Dataset | None, k: int = K_TOP, *,
               rows: ray.data.Dataset | None = None,
               rep_tf: ray.data.Dataset | None = None) -> ray.data.Dataset:
    """Per doc: top-``k`` tokens by ``(tf * SCALE) // df`` (ties: token asc).

    ``rows``/``rep_tf``: pass :func:`token_family`'s memoized artifacts
    when the corpus is an sf_dir (``pages`` is then unused); None derives
    them from ``pages``."""
    from ..stages.grouping import bucketed_group_apply

    rows = _doc_text_rows(_need_pages(pages)) if rows is None else rows
    if rep_tf is None:
        rep_tf = _rep_tf(_reps(rows))
    scored = _with_df(rep_tf)

    def topk(g: pd.DataFrame) -> pd.DataFrame:
        g = g.copy()
        g["score"] = (g["tf"].to_numpy() * SCALE) // g["df"].to_numpy()
        g = g.sort_values(["text_md5", "score", "token"],
                          ascending=[True, False, True], kind="mergesort")
        g["rnk"] = g.groupby("text_md5").cumcount() + 1
        g = g[g["rnk"] <= k]
        return g[["text_md5", "token", "tf", "df", "score", "rnk"]]

    rep_topk = bucketed_group_apply(scored, ["text_md5"], topk)
    return _expand_to_docs(
        rows, rep_topk,
        ["text_md5", "token", "tf", "df", "score", "rnk"],
        types={"token": pa.string(), "tf": pa.int64(), "df": pa.int64(),
               "score": pa.int64(), "rnk": pa.int64()})


def posting_stats(pages: ray.data.Dataset | None, *,
                  rep_tf: ray.data.Dataset | None = None) -> ray.data.Dataset:
    """Inverted-index summary: per token (df, total_tf, first_doc).

    ``rep_tf``: pass :func:`token_family`'s memoized artifact when the
    corpus is an sf_dir; None derives it from ``pages``."""
    from ..stages.grouping import bucketed_group_apply

    if rep_tf is None:
        rep_tf = _rep_tf(_reps(_doc_text_rows(_need_pages(pages))))

    def agg(g: pd.DataFrame) -> pd.DataFrame:
        w = g["tf"].to_numpy() * g["n_docs"].to_numpy()
        out = g.assign(w=w).groupby("token", as_index=False).agg(
            df=("n_docs", "sum"), total_tf=("w", "sum"),
            first_doc=("min_doc", "min"))
        return out

    return bucketed_group_apply(rep_tf, ["token"], agg)


_TOK_CTE = r"""
dpages AS (SELECT DISTINCT doc_id, text FROM pages),
tok AS (
  SELECT doc_id, token, CAST(COUNT(*) AS BIGINT) AS tf
  FROM (SELECT doc_id, unnest(string_split_regex(text, '\s+')) AS token
        FROM dpages)
  WHERE token <> '' GROUP BY doc_id, token
)
""".strip()


def sql_tfidf_topk(k: int = K_TOP) -> str:
    return f"""
, {_TOK_CTE},
dfreq AS (SELECT token, CAST(COUNT(*) AS BIGINT) AS df FROM tok GROUP BY token)
SELECT doc_id, token, tf, df, score, rnk FROM (
  SELECT t.doc_id, t.token, t.tf, d.df,
         (t.tf * {SCALE}) // d.df AS score,
         CAST(row_number() OVER (
           PARTITION BY t.doc_id
           ORDER BY (t.tf * {SCALE}) // d.df DESC, t.token) AS BIGINT) AS rnk
  FROM tok t JOIN dfreq d USING (token))
WHERE rnk <= {k}
""".strip()


def sql_posting_stats() -> str:
    return f"""
, {_TOK_CTE}
SELECT token, CAST(COUNT(*) AS BIGINT) AS df,
       CAST(SUM(tf) AS BIGINT) AS total_tf,
       CAST(MIN(doc_id) AS BIGINT) AS first_doc
FROM tok GROUP BY token
""".strip()


# --- token co-occurrence mining ----------------------------------------------

COOC_PCT = 50  # keep pairs present in >= total_docs/COOC_PCT distinct docs


def token_cooccurrence(pages: ray.data.Dataset | None, *,
                       reps: ray.data.Dataset | None = None
                       ) -> ray.data.Dataset | pa.Table:
    """Distinct-token pairs co-occurring in >= 2% of distinct documents
    (integer threshold ``n_docs * COOC_PCT >= total_docs``).  The pair
    explosion — the classic co-occurrence cost — runs per REPRESENTATIVE
    (each distinct text once, weighted by its doc count), and the pair
    rows shuffle once into a bucketed sum; the total-docs scalar is a
    dimension-sized aggregate of the rep table.

    ``reps``: pass :func:`token_family`'s memoized artifact when the
    corpus is an sf_dir; None derives it from ``pages``.  The pair
    expansion tokenizes INSIDE its own batch fn over the rep ROWS (a
    row cannot straddle a block) rather than consuming rep_tf token
    rows — Ray's dynamic block splitting may slice a large map_batches
    output mid-rep, which would silently drop that rep's cross-slice
    pairs (r4 review); re-tokenizing is distinct-corpus-sized, i.e.
    free relative to the page volume."""
    from ..core.texthash import split_tokens_arrow
    from ..stages.grouping import _triu, bucketed_group_apply

    if reps is None:
        reps = _reps(_doc_text_rows(_need_pages(pages))).materialize()
    # total distinct docs = sum of per-rep distinct-doc counts over the REP
    # table (every doc has exactly one rep).  Summing over rep_tf instead
    # would drop token-less (empty/whitespace) texts' docs and shift the
    # prevalence threshold vs the oracle's COUNT(*) FROM dpages (r3 review).
    total_docs = int(reps.sum("n_docs") or 0)

    def pairs(b: pa.Table) -> pa.Table:
        # within-rep unordered pair expansion, vectorized over whole reps
        # (cached triu indices per group size — grouping.grouped_pairs'
        # shape); tokens are deduped per rep, and sorting by (rep, token)
        # makes tok_a < tok_b by construction
        toks = split_tokens_arrow(b["text"])
        flat = pc.list_flatten(toks)
        parent = pc.list_parent_indices(toks).to_numpy(zero_copy_only=False)
        keep = pc.not_equal(flat, "").to_numpy(zero_copy_only=False)
        df = pd.DataFrame({
            "rep": parent[keep],
            "token": flat.to_numpy(zero_copy_only=False)[keep],
        }).drop_duplicates().sort_values(["rep", "token"], kind="mergesort")
        rep = df["rep"].to_numpy()
        tok = df["token"].to_numpy()
        nd_all = b["n_docs"].to_numpy(zero_copy_only=False)
        change = np.zeros(len(df), dtype=bool)
        if len(df):
            change[1:] = rep[1:] != rep[:-1]
        boundary = np.flatnonzero(change)
        starts = np.concatenate([[0], boundary]) if len(df) else boundary
        ends = np.concatenate([boundary, [len(df)]]) if len(df) else boundary
        parts_a, parts_b, parts_n = [], [], []
        for s, e in zip(starts, ends):
            c = e - s
            if c < 2:
                continue
            ia, ib = _triu(int(c))
            parts_a.append(tok[s + ia])
            parts_b.append(tok[s + ib])
            parts_n.append(np.full(ia.shape[0], nd_all[rep[s]], np.int64))
        if not parts_a:
            return pa.table({"tok_a": pa.array([], pa.string()),
                             "tok_b": pa.array([], pa.string()),
                             "n": pa.array([], pa.int64())})
        return pa.table({
            "tok_a": pa.array(np.concatenate(parts_a), pa.string()),
            "tok_b": pa.array(np.concatenate(parts_b), pa.string()),
            "n": pa.array(np.concatenate(parts_n))})

    pair_rows = reps.map_batches(pairs, batch_format="pyarrow",
                                 batch_size=4096)

    # Degenerate corpora (no rep with >= 2 distinct tokens) emit ZERO pair
    # rows; map_groups then never runs and the result would be SCHEMA-LESS
    # (r4 property test) — short-circuit to the typed empty the oracle
    # returns.  Returned as a pa.Table (a valid driver-contract result):
    # Dataset.to_pandas() DROPS the schema of any zero-row dataset, so a
    # Dataset wrapper would still compare as column-less.  The probe
    # re-executes at most one rep-table pass (reps is materialized,
    # distinct-corpus-sized).
    if pair_rows.limit(1).count() == 0:
        return pa.table({
            "tok_a": pa.array([], pa.string()),
            "tok_b": pa.array([], pa.string()),
            "n_docs": pa.array([], pa.int64())})

    def agg(g: pd.DataFrame) -> pd.DataFrame:
        out = g.groupby(["tok_a", "tok_b"], as_index=False)["n"].sum()
        out = out[out["n"] * COOC_PCT >= total_docs]
        return out.rename(columns={"n": "n_docs"})

    return bucketed_group_apply(pair_rows, ["tok_a", "tok_b"], agg)


def sql_token_cooccurrence() -> str:
    return f"""
, {_TOK_CTE},
tot AS (SELECT COUNT(*) AS n FROM dpages)
SELECT a.token AS tok_a, b.token AS tok_b,
       CAST(COUNT(*) AS BIGINT) AS n_docs
FROM tok a JOIN tok b ON a.doc_id = b.doc_id AND a.token < b.token
GROUP BY 1, 2
HAVING CAST(COUNT(*) AS BIGINT) * {COOC_PCT} >= (SELECT n FROM tot)
""".strip()


# --- boolean AND search ------------------------------------------------------

SEARCH_TERMS = ("data", "batch", "filter")


def boolean_search(pages: ray.data.Dataset | None,
                   terms: tuple[str, ...] = SEARCH_TERMS, *,
                   rows: ray.data.Dataset | None = None,
                   rep_tf: ray.data.Dataset | None = None) -> ray.data.Dataset:
    """Posting-list intersection: documents containing ALL ``terms``
    (conjunctive keyword search).  Rep-level: a text matches iff its
    distinct-token rows cover every term — the match test touches only the
    term-filtered slice of the rep-token table, then the usual md5
    expansion join emits (doc_id, tf_total).

    ``rows``/``rep_tf``: pass :func:`token_family`'s memoized artifacts
    when the corpus is an sf_dir; None derives them from ``pages``."""
    from ..stages.grouping import bucketed_group_apply

    rows = _doc_text_rows(_need_pages(pages)) if rows is None else rows
    if rep_tf is None:
        rep_tf = _rep_tf(_reps(rows))
    term_set = set(terms)

    def only_terms(b: pa.Table) -> pa.Table:
        keep = pc.is_in(b["token"], value_set=pa.array(sorted(term_set)))
        return b.filter(keep).select(["text_md5", "token", "tf"])

    def match(g: pd.DataFrame) -> pd.DataFrame:
        agg = g.groupby("text_md5", as_index=False).agg(
            n_terms=("token", "nunique"), tf_total=("tf", "sum"))
        agg = agg[agg["n_terms"] == len(term_set)]
        return agg[["text_md5", "tf_total"]]

    rep_hits = bucketed_group_apply(
        rep_tf.map_batches(only_terms, batch_format="pyarrow",
                           batch_size=None),
        ["text_md5"], match)
    return _expand_to_docs(rows, rep_hits, ["text_md5", "tf_total"],
                           types={"tf_total": pa.int64()})


def sql_boolean_search(terms: tuple[str, ...] = SEARCH_TERMS) -> str:
    in_list = ", ".join(f"'{t}'" for t in terms)
    return f"""
, {_TOK_CTE}
SELECT doc_id, CAST(SUM(tf) AS BIGINT) AS tf_total
FROM tok WHERE token IN ({in_list})
GROUP BY doc_id HAVING COUNT(*) = {len(terms)}
""".strip()


# --- exact phrase search -----------------------------------------------------

PHRASE = "data batch"


def phrase_search(pages: ray.data.Dataset | None,
                  phrase: str = PHRASE, *,
                  rows: ray.data.Dataset | None = None,
                  reps: ray.data.Dataset | None = None) -> ray.data.Dataset:
    """Exact phrase search: (doc_id, n_hits) for documents whose text
    contains the phrase, with the non-overlapping occurrence count
    (Arrow ``count_substring`` == DuckDB's replace-length arithmetic for a
    non-self-overlapping phrase).  Counting runs once per DISTINCT text
    (rep level), then the md5 expansion join labels the docs.

    ``rows``/``reps``: pass :func:`token_family`'s memoized artifacts when
    the corpus is an sf_dir; None derives them from ``pages``."""
    rows = _doc_text_rows(_need_pages(pages)) if rows is None else rows
    reps = _reps(rows) if reps is None else reps

    def hits(b: pa.Table) -> pa.Table:
        n = pc.count_substring(b["text"], phrase)
        t = pa.table({"text_md5": b["text_md5"],
                      "n_hits": n.cast(pa.int64())})
        return t.filter(pc.greater(t["n_hits"], 0))

    rep_hits = reps.map_batches(hits, batch_format="pyarrow",
                                batch_size=None)
    return _expand_to_docs(rows, rep_hits, ["text_md5", "n_hits"],
                           types={"n_hits": pa.int64()})


def sql_phrase_search(phrase: str = PHRASE) -> str:
    return f"""
, dpages AS (SELECT DISTINCT doc_id, text FROM pages)
SELECT doc_id,
       CAST((length(text) - length(replace(text, '{phrase}', '')))
            // {len(phrase)} AS BIGINT) AS n_hits
FROM dpages
WHERE contains(text, '{phrase}')
""".strip()
