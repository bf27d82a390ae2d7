"""Boilerplate / template detection per host.

The RefinedWeb-style crawl-quality signal: a host whose pages mostly
open with the SAME leading-``PREFIX_TOKENS``-token prefix is serving a
template (navigation chrome, legal banner, scraped shell), and its
dominant-prefix share is the metric a filtering dashboard thresholds
on.  (Reference analog: none — graft breadth for the webtext payload;
oracle twin is exact DuckDB SQL.)

-> one row per host: (host, n_pages, n_template, template) where
``template`` is the host's most common prefix (count desc, prefix asc —
a deterministic total order) and ``n_template`` how many of its pages
open with it.

Ray shape (scales to the 100-TB crawl):
- ONE tokenization pass; the prefix string is built fully vectorized —
  a ``take`` gather of each doc's first ``min(ntok, PREFIX_TOKENS)``
  tokens out of the flat non-empty token array, joined by Arrow
  ``binary_join`` (no Python loop over rows or tokens);
- per-block (host, prefix, c) pre-counts, then ONE bucketed exchange
  keyed on host (every prefix of a host co-locates), inside which the
  per-host fold is a vectorized pandas groupby + idxmax — the result is
  host-dimension-sized.
"""

from __future__ import annotations

import numpy as np
import pandas as pd
import pyarrow as pa
import ray.data

from ..core.texthash import nonempty_token_counts
from ..sources.pages import N_HOSTS, host_str_from_idx

PREFIX_TOKENS = 8


def _prefix_partial(b: pa.Table) -> pa.Table:
    """(host_idx, prefix, c) pre-counts for one block."""
    flat, ntok, starts = nonempty_token_counts(b["text"])
    doc = b["doc_id"].to_numpy(zero_copy_only=False).astype(np.int64)
    k = np.minimum(ntok, PREFIX_TOKENS)
    # gather each doc's first k tokens: repeat(starts) + intra-doc arange
    tot = int(k.sum())
    if tot:
        first = np.concatenate([[0], np.cumsum(k)[:-1]]).astype(np.int64)
        intra = np.arange(tot, dtype=np.int64) - np.repeat(first, k)
        idx = np.repeat(starts, k) + intra
        toks = flat.take(pa.array(idx))
        offsets = np.concatenate([first, [tot]])
    else:
        toks = flat.slice(0, 0)
        offsets = np.zeros(doc.shape[0] + 1, np.int64)
    import pyarrow.compute as pc

    lst = pa.LargeListArray.from_arrays(pa.array(offsets, pa.int64()), toks)
    prefix = pc.binary_join(lst, " ")
    df = pd.DataFrame({"host_idx": doc % N_HOSTS,
                       "prefix": prefix.to_pandas(),
                       "c": np.ones(doc.shape[0], np.int64)})
    g = df.groupby(["host_idx", "prefix"], as_index=False, sort=False)[
        "c"].sum()
    return pa.table({"host_idx": pa.array(
        g["host_idx"].to_numpy().astype(np.int64)),
        "prefix": pa.array(g["prefix"], pa.string()),
        "c": pa.array(g["c"].to_numpy().astype(np.int64))})


def _per_host_fold(g: pd.DataFrame) -> pd.DataFrame:
    """Bucket fold: global (host, prefix) counts -> one winner row per
    host.  Winner = count desc, prefix asc (the SQL ROW_NUMBER contract),
    via one mergesort + first-per-host."""
    agg = g.groupby(["host_idx", "prefix"], as_index=False)["c"].sum()
    agg = agg.sort_values(["host_idx", "c", "prefix"],
                          ascending=[True, False, True],
                          kind="mergesort")
    tot = agg.groupby("host_idx", as_index=False)["c"].sum().rename(
        columns={"c": "n_pages"})
    best = agg.drop_duplicates("host_idx", keep="first").rename(
        columns={"c": "n_template", "prefix": "template"})
    out = best.merge(tot, on="host_idx")
    for col in ("n_pages", "n_template"):
        out[col] = out[col].astype(np.int64)
    return out[["host_idx", "n_pages", "n_template", "template"]]


def template_detect(sf_dir: str, n_buckets: int = 64) -> ray.data.Dataset:
    """Dominant leading-prefix share per host — see module doc.

    ``n_buckets`` follows grouping.bucketed_group_apply's SCALE CONTRACT:
    the exchange moves the block-distinct (host, prefix) pre-counts — a
    DATA-PROPORTIONAL table on a diverse crawl — so size it from the
    distinct-prefix volume at crawl scale (input bytes / target bucket
    bytes, the write_dedup_layout pattern)."""
    from ..sources.pages import read_pages
    from .grouping import bucketed_group_apply

    pages = read_pages(sf_dir, columns=["doc_id", "text"])
    parts = pages.map_batches(_prefix_partial, batch_format="pyarrow",
                              batch_size=16384)

    folded = bucketed_group_apply(parts, ["host_idx"], _per_host_fold,
                                  n_buckets=n_buckets)

    def named(b: pa.Table) -> pa.Table:
        return pa.table({"host": host_str_from_idx(b["host_idx"]),
                         "n_pages": b["n_pages"],
                         "n_template": b["n_template"],
                         "template": b["template"]})

    return folded.map_batches(named, batch_format="pyarrow")


SQL_TEMPLATE_DETECT = rf"""
, pref AS (
  SELECT doc_id % {N_HOSTS} AS h,
         array_to_string(
           list_slice(list_filter(string_split_regex(text, '\s+'),
                                  x -> x <> ''),
                      1, {PREFIX_TOKENS}), ' ') AS prefix
  FROM pages
), by_host AS (
  SELECT h, prefix, CAST(COUNT(*) AS BIGINT) AS c
  FROM pref GROUP BY h, prefix
), best AS (
  SELECT h, prefix, c,
         ROW_NUMBER() OVER (PARTITION BY h
                            ORDER BY c DESC, prefix ASC) AS rn
  FROM by_host
), tot AS (
  SELECT h, CAST(SUM(c) AS BIGINT) AS n FROM by_host GROUP BY h
)
SELECT 'site' || lpad(CAST(b.h AS VARCHAR), 4, '0') || '.example' AS host,
       t.n AS n_pages, b.c AS n_template, b.prefix AS template
FROM best b JOIN tot t ON t.h = b.h
WHERE b.rn = 1
""".strip()
