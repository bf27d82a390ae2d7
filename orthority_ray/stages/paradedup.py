"""Paragraph-granularity dedup + duplicate-origin attribution.

Two more crawl-pipeline operators (brief § "Beyond the reference's
operators"):

- ``paragraph_dedup``: the RefinedWeb/CCNet-style *sub-document* dedup —
  split every page into fixed ``W_TOKENS``-token paragraphs, keep each
  distinct paragraph only at its FIRST corpus occurrence (lexicographic
  ``(doc_id, paragraph_idx)``), and reassemble the surviving text per
  document.  Unlike whole-document dedup (stages/dedup.py) this removes
  boilerplate shared across otherwise-distinct pages.

- ``cross_host_dup``: per-host duplicate attribution — for every page,
  whether its text's first corpus occurrence lives on the SAME host
  (intra-site duplication) or a DIFFERENT one (cross-site syndication),
  the split a crawl-quality dashboard tracks per domain.

Scale design (dedup-then-process, the engine's standard):
- the paragraph pass runs at the BLOCK-DISTINCT-TEXT level: each block
  keeps one min-doc_id row per distinct text before chunking, so the
  paragraph shuffle moves block-distinct-corpus volume, never page
  volume, and no separate global text-dedup exchange is needed (see
  ``_local_first_chunks`` for the exactness argument).  Non-rep pages
  keep nothing: a whole-document duplicate has the same paragraphs at
  the same indices as its lower-doc_id rep — that's document dedup's
  job, not paragraph dedup's.
- paragraph identity shuffles as (md5, packed first-occurrence key); the
  winning rows keep their paragraph string through ONE bucketed exchange
  (the kept-payload volume is the distinct-paragraph corpus — the
  irreducible dedup cost).
- reassembly joins each doc's kept paragraphs in one bucketed pass; the
  per-group string join is bounded by kept-paragraph volume.
- ``cross_host_dup`` attributes via one large-large ``hash_join`` of the
  skinny (doc_id, text_md5) page projection against the distinct-text rep
  table, then collapses to per-host counters with block combiners — the
  final groupby is host-dimension-sized.
"""

from __future__ import annotations

import numpy as np
import pandas as pd
import pyarrow as pa
import pyarrow.compute as pc
import ray.data

from ..core import texthash as TH
from ..sources.pages import N_HOSTS
from .dedup import add_text_md5
from .grouping import bucketed_group_apply

W_TOKENS = 16
# first-occurrence key = doc_id * IDX_LIMIT + paragraph_idx; the pack is a
# CONTRACT with the SQL oracle (same multiplier), so paragraph counts past
# it must fail loudly rather than alias a later doc's range
IDX_LIMIT = 4096


# shared tokenization kernel (moved to core.texthash; re-exported because
# tests and sibling stages imported it from here first)
nonempty_token_counts = TH.nonempty_token_counts


def _chunk_reps(b: pa.Table) -> pa.Table:
    """Distinct-text rows -> one row per W_TOKENS-token paragraph:
    (doc_id, cidx, n_chunks, chunk, chunk_md5).  Vectorized end-to-end:
    paragraph boundaries are pure offset arithmetic over the flattened
    non-empty token array and the join-back-to-string is Arrow's
    ``binary_join`` — no Python loop over rows, tokens or paragraphs."""
    flat, ntok, tok_starts = nonempty_token_counts(b["text"])
    doc_ids = b["doc_id"].to_numpy(zero_copy_only=False).astype(np.int64)
    nch = (ntok + W_TOKENS - 1) // W_TOKENS
    if nch.size and int(nch.max()) >= IDX_LIMIT:
        raise ValueError(
            f"doc with {int(nch.max())} paragraphs >= IDX_LIMIT={IDX_LIMIT}; "
            "raise the first-occurrence key multiplier (and the SQL twin)")
    tot = int(nch.sum())
    empty = pa.table({"doc_id": pa.array([], pa.int64()),
                      "cidx": pa.array([], pa.int64()),
                      "n_chunks": pa.array([], pa.int64()),
                      "chunk": pa.array([], pa.string())})
    if not tot:
        return add_text_md5(empty, col="chunk").rename_columns(
            ["doc_id", "cidx", "n_chunks", "chunk", "chunk_md5"])
    chunk_doc = np.repeat(np.arange(doc_ids.shape[0]), nch)
    doc_first = np.concatenate([[0], np.cumsum(nch)[:-1]]).astype(np.int64)
    cidx = np.arange(tot, dtype=np.int64) - np.repeat(doc_first, nch)
    starts = np.repeat(tok_starts, nch) + cidx * W_TOKENS
    # paragraphs are contiguous within a doc and docs contiguous in the
    # flattened array, so starts + [total] is a valid offsets vector (docs
    # with zero tokens contribute no paragraphs and no gap)
    offsets = np.concatenate([starts, [int(np.sum(ntok))]])
    # int64 offsets (large_list): a batch of long docs can exceed 2^31
    # flattened tokens, which int32 list offsets would silently wrap
    lst = pa.LargeListArray.from_arrays(pa.array(offsets, pa.int64()), flat)
    chunk = pc.binary_join(lst, " ")
    out = pa.table({"doc_id": pa.array(doc_ids[chunk_doc]),
                    "cidx": pa.array(cidx),
                    "n_chunks": pa.array(nch[chunk_doc].astype(np.int64)),
                    "chunk": chunk})
    out = add_text_md5(out, col="chunk")
    return out.rename_columns(
        ["doc_id", "cidx", "n_chunks", "chunk", "chunk_md5"])


def paragraph_dedup(sf_dir: str) -> ray.data.Dataset:
    """-> (doc_id, n_chunks, n_kept, kept_text): every document that keeps
    at least one paragraph after corpus-wide paragraph dedup, with its
    surviving text reassembled in paragraph order."""
    from ..sources.pages import read_pages

    return paragraph_dedup_pages(
        read_pages(sf_dir, columns=["doc_id", "text"]))


def _local_first_chunks(b: pa.Table) -> pa.Table:
    """Block-local text dedup (min doc_id per distinct text) fused with
    chunking — replaces a full global text-dedup exchange: every chunk's
    global winner doc is necessarily its text's GLOBAL min-doc rep (any
    other doc containing the chunk has a smaller same-text doc that also
    contains it), and that rep always survives its block's local first, so
    the chunk exchange's per-group min over block survivors equals the
    distinct-page winner exactly.  Duplicate texts surviving in other
    blocks only add losing rows."""
    df = pd.DataFrame({
        "doc_id": b["doc_id"].to_numpy(zero_copy_only=False),
        "text": b["text"].to_pandas()})
    g = df.groupby("text", as_index=False, sort=False)["doc_id"].min()
    return _chunk_reps(pa.table({
        "doc_id": pa.array(g["doc_id"].to_numpy().astype(np.int64)),
        "text": pa.array(g["text"], pa.string())}))


def paragraph_dedup_pages(pages: ray.data.Dataset,
                          n_buckets: int = 64) -> ray.data.Dataset:
    """Paragraph dedup over any (doc_id, text) Dataset — see module doc.

    ``n_buckets`` follows grouping.bucketed_group_apply's SCALE CONTRACT:
    the paragraph exchange shuffles the block-distinct paragraph payload,
    so size it from the distinct-corpus volume at crawl scale (the
    write_dedup_layout pattern: input bytes / target bucket bytes)."""
    chunks = pages.map_batches(_local_first_chunks, batch_format="pyarrow",
                               batch_size=8192)

    def first_occurrence(g: pd.DataFrame) -> pd.DataFrame:
        # winner per paragraph = min (doc_id, cidx), vectorized over all
        # groups in the bucket via one sort + drop_duplicates
        g = g.sort_values(["chunk_md5", "doc_id", "cidx"], kind="mergesort")
        return g.drop_duplicates("chunk_md5", keep="first")

    kept = bucketed_group_apply(chunks, ["chunk_md5"], first_occurrence,
                                n_buckets=n_buckets)

    def reassemble(g: pd.DataFrame) -> pd.DataFrame:
        g = g.sort_values(["doc_id", "cidx"], kind="mergesort")
        out = g.groupby("doc_id", as_index=False, sort=False).agg(
            n_chunks=("n_chunks", "first"),
            n_kept=("cidx", "size"),
            kept_text=("chunk", " ".join))
        out["n_kept"] = out["n_kept"].astype(np.int64)
        return out

    return bucketed_group_apply(
        kept.drop_columns(["chunk_md5"]), ["doc_id"], reassemble,
        n_buckets=n_buckets)


SQL_PARAGRAPH_DEDUP = rf"""
, tok AS (
  -- DISTINCT: the synthetic lineitem carries duplicate (orderkey,
  -- linenumber) pairs, so pages holds full-duplicate rows per doc_id;
  -- grouping tokens by doc_id without it would concatenate the copies
  -- into doubled-token chunks (the engine's exact_dedup collapses them)
  SELECT doc_id, unnest(l) AS tok, unnest(range(len(l))) AS pos
  FROM (SELECT doc_id,
               list_filter(string_split_regex(text, '\s+'), x -> x <> '') AS l
        FROM (SELECT DISTINCT doc_id, text FROM pages))
), chunks AS (
  SELECT doc_id, pos // {W_TOKENS} AS cidx,
         string_agg(tok, ' ' ORDER BY pos) AS chunk
  FROM tok GROUP BY doc_id, pos // {W_TOKENS}
), winners AS (
  SELECT chunk, MIN(doc_id * {IDX_LIMIT} + cidx) AS wkey
  FROM chunks GROUP BY chunk
), kept AS (
  SELECT c.doc_id, c.cidx, c.chunk
  FROM chunks c JOIN winners w
    ON c.chunk = w.chunk AND c.doc_id * {IDX_LIMIT} + c.cidx = w.wkey
), totals AS (
  SELECT doc_id, CAST(COUNT(*) AS BIGINT) AS n_chunks FROM chunks GROUP BY doc_id
)
SELECT k.doc_id, t.n_chunks, CAST(COUNT(*) AS BIGINT) AS n_kept,
       string_agg(k.chunk, ' ' ORDER BY k.cidx) AS kept_text
FROM kept k JOIN totals t ON k.doc_id = t.doc_id
GROUP BY k.doc_id, t.n_chunks
""".strip()


def cross_host_dup(sf_dir: str) -> ray.data.Dataset:
    """-> (host, n_pages, n_dup, n_cross_host_dup): per host, how many of
    its pages duplicate an earlier page at all, and how many duplicate a
    page first published on a DIFFERENT host."""
    from ..sources.pages import read_pages
    from .dedup import attach_rep_doc, rep_groups

    pages = read_pages(sf_dir, columns=["doc_id", "text"])
    joined = attach_rep_doc(pages, reps=rep_groups(sf_dir))

    def per_host_partial(b: pa.Table) -> pa.Table:
        doc = b["doc_id"].to_numpy(zero_copy_only=False)
        rep = b["rep_doc_id"].to_numpy(zero_copy_only=False)
        host = doc % N_HOSTS
        is_dup = (doc != rep).astype(np.int64)
        cross = is_dup * (rep % N_HOSTS != host).astype(np.int64)
        df = pd.DataFrame({"host_idx": host,
                           "n_pages": np.ones(doc.shape[0], np.int64),
                           "n_dup": is_dup, "n_cross_host_dup": cross})
        return pa.Table.from_pandas(
            df.groupby("host_idx", as_index=False, sort=False).sum(),
            preserve_index=False)

    from ..pipelines.relational import combined_groupby_sum

    agg = combined_groupby_sum(
        joined.map_batches(per_host_partial, batch_format="pyarrow",
                           batch_size=65536),
        ["host_idx"], ["n_pages", "n_dup", "n_cross_host_dup"])

    def host_str(b: pa.Table) -> pa.Table:
        from ..sources.pages import host_str_from_idx

        return pa.table({"host": host_str_from_idx(b["host_idx"]),
                         "n_pages": b["n_pages"],
                         "n_dup": b["n_dup"],
                         "n_cross_host_dup": b["n_cross_host_dup"]})

    return agg.map_batches(host_str, batch_format="pyarrow")


SQL_CROSS_HOST_DUP = f"""
, reps AS (
  SELECT md5(text) AS m, MIN(doc_id) AS rep FROM pages GROUP BY md5(text)
)
SELECT split_part(split_part(url, '//', 2), '/', 1) AS host,
       CAST(COUNT(*) AS BIGINT) AS n_pages,
       CAST(SUM(CASE WHEN doc_id <> rep THEN 1 ELSE 0 END) AS BIGINT) AS n_dup,
       CAST(SUM(CASE WHEN doc_id <> rep AND rep % {N_HOSTS} <> doc_id % {N_HOSTS}
                THEN 1 ELSE 0 END) AS BIGINT) AS n_cross_host_dup
FROM pages JOIN reps ON md5(text) = m
GROUP BY 1
""".strip()
