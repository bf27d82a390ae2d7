"""URL parsing + per-host rollups over the Common-Crawl-style pages table.

``parse_urls`` splits ``url`` into (host, path) with Arrow string kernels —
zero Python per row; ``host_stats`` computes per-host page counts, EXACT
distinct-path counts and doc-id extrema with the scale shape:

1. per-block combiner: pandas groupby (host, path) -> (n, min_doc, max_doc)
   — the shuffle then carries at most distinct-(host, path)-per-block rows,
   so duplicate-heavy crawls collapse before the wide step;
2. one hash-bucket shuffle on host (`grouping.bucketed_group_apply`, bucket
   count constant); each bucket holds whole hosts and re-aggregates
   vectorized: (host, path) partials -> per-host n_pages / distinct paths /
   min / max.

Exact distinct counting requires each host's paths co-located once — that is
inherent; the per-block pre-dedup bounds what moves.  Hot hosts (a crawl's
``youtube.com``) would need the salting pattern from `stages/salting.py`
composed in front; at the pages source's 1000-host fanout this is not
needed.

Reference analog: none (the reference has no string surface); this is graft
breadth for the webtext payload (SURVEY.md §1.2 pages-on-parquet model).
"""

from __future__ import annotations

import pandas as pd
import pyarrow as pa
import pyarrow.compute as pc
import ray.data

from .grouping import bucketed_group_apply


def split_host_path(url: pa.ChunkedArray | pa.Array) -> tuple[pa.Array, pa.Array]:
    """(host, path) from scheme://host/path URLs (Arrow kernels).  Assumes
    the pages-source URL shape: a scheme separator and at least one '/'
    after the authority (guaranteed by sources/pages.PageSynth)."""
    tail = pc.list_element(pc.split_pattern(url, "//", max_splits=1), 1)
    parts = pc.split_pattern(tail, "/", max_splits=1)
    return pc.list_element(parts, 0), pc.list_element(parts, 1)


def parse_urls(ds: ray.data.Dataset) -> ray.data.Dataset:
    """Append host/path columns (keeps doc_id + url)."""

    def fn(b: pa.Table) -> pa.Table:
        host, path = split_host_path(b["url"])
        return b.append_column("host", host).append_column("path", path)

    return ds.map_batches(fn, batch_format="pyarrow", batch_size=None)


def host_stats(ds: ray.data.Dataset, n_buckets: int = 64) -> ray.data.Dataset:
    """Per host: n_pages, n_distinct_paths (exact), min_doc, max_doc.
    Input needs (url, doc_id)."""

    def partial(b: pa.Table) -> pa.Table:
        host, path = split_host_path(b["url"])
        df = pd.DataFrame(
            {
                "host": host.to_pandas(),
                "path": path.to_pandas(),
                "doc_id": b["doc_id"].to_numpy(zero_copy_only=False),
            }
        )
        g = df.groupby(["host", "path"], as_index=False, sort=False).agg(
            n=("doc_id", "size"), mn=("doc_id", "min"), mx=("doc_id", "max")
        )
        return pa.Table.from_pandas(g, preserve_index=False)

    partials = ds.map_batches(partial, batch_format="pyarrow", batch_size=65536)

    def per_host(g: pd.DataFrame) -> pd.DataFrame:
        # partials for the same (host, path) may arrive from many blocks:
        # collapse them first, then roll up to the host
        pp = g.groupby(["host", "path"], as_index=False, sort=False).agg(
            n=("n", "sum"), mn=("mn", "min"), mx=("mx", "max")
        )
        return pp.groupby("host", as_index=False, sort=False).agg(
            n_pages=("n", "sum"),
            n_distinct_paths=("path", "size"),
            min_doc=("mn", "min"),
            max_doc=("mx", "max"),
        )

    return bucketed_group_apply(partials, ["host"], per_host, n_buckets=n_buckets)


def redact_urls(ds: ray.data.Dataset) -> ray.data.Dataset:
    """PII-style regex redaction demo over the url column: digit runs are
    masked and counted (Arrow RE2 kernels; the DuckDB oracle runs the
    identical RE2 pattern through regexp_replace/regexp_extract_all, so the
    redacted STRINGS are compared byte-exactly by the driver)."""

    def fn(b: pa.Table) -> pa.Table:
        url = b["url"].combine_chunks()
        return pa.table(
            {
                "doc_id": b["doc_id"],
                "url_redacted": pc.replace_substring_regex(url, "[0-9]+", "#"),
                "n_digit_runs": pc.cast(
                    pc.count_substring_regex(url, "[0-9]+"), pa.int64()
                ),
            }
        )

    return ds.map_batches(fn, batch_format="pyarrow", batch_size=None)


SQL_URL_REDACT = """
SELECT doc_id,
       regexp_replace(url, '[0-9]+', '#', 'g') AS url_redacted,
       CAST(length(regexp_extract_all(url, '[0-9]+')) AS BIGINT) AS n_digit_runs
FROM pages
""".strip()


# path = EVERYTHING after the first '/' (engine: split max_splits=1), not
# just the first segment — substr/strpos keeps the oracle aligned with the
# engine on multi-segment paths (r2 ADVICE item 1)
SQL_HOST_STATS = """
SELECT split_part(split_part(url, '//', 2), '/', 1) AS host,
       COUNT(*) AS n_pages,
       CAST(COUNT(DISTINCT substr(split_part(url, '//', 2),
                                  strpos(split_part(url, '//', 2), '/') + 1)) AS BIGINT)
         AS n_distinct_paths,
       CAST(MIN(doc_id) AS BIGINT) AS min_doc,
       CAST(MAX(doc_id) AS BIGINT) AS max_doc
FROM pages GROUP BY 1
""".strip()
