"""End-to-end training-data preparation — the composition showcase.

One oracle-checked pipeline chaining the operators an LLM data-prep run
strings together over the crawl (each step is the repo's existing engine
primitive; the DuckDB oracle replicates the WHOLE chain expression-for-
expression, so the composition is value+dtype exact, not just per-stage):

    pages
      -> quality score (stages/textstats.QualityScorer), keep only docs
         passing ALL THREE bands (score == 1e6)
      -> exact dedup: min-doc_id representative per distinct text
         (block-local first + bucketed min, the stages/dedup pattern)
      -> decontamination: drop reps sharing any 32-char window with the
         benchmark set (stages/spandedup.contamination_filter)
      -> manifest: (doc_id, n_tokens, n_chars) per surviving doc

Scale shape: the quality filter and dedup combiner shrink the stream
before any exchange; the only payload shuffle is the bucketed dedup of
(md5, text) reps; decontamination is a broadcast-set filter.
"""

from __future__ import annotations

import numpy as np
import pandas as pd
import pyarrow as pa
import pyarrow.compute as pc
import ray.data

QUALITY_PASS = 1_000_000


def training_prep(sf_dir: str) -> ray.data.Dataset:
    from ..sources.pages import read_pages
    from ..stages.dedup import add_text_md5
    from ..stages.grouping import bucketed_group_apply
    from ..stages.spandedup import contamination_filter
    from ..stages.textstats import quality

    pages = read_pages(sf_dir, columns=["doc_id", "text"])
    scored = quality(pages)

    def keep_and_hash(b: pa.Table) -> pa.Table:
        b = b.filter(pc.equal(b["quality"], QUALITY_PASS))
        if b.num_rows == 0:
            return pa.table({"doc_id": pa.array([], pa.int64()),
                             "text": pa.array([], pa.string()),
                             "text_md5": pa.array([], pa.string())})
        t = add_text_md5(b.select(["doc_id", "text"]))
        # block-local dedup: keep the min-doc_id row per md5 so the shuffle
        # moves <= distinct-per-block rows (min of block minima = global min)
        df = t.to_pandas().sort_values("doc_id", kind="mergesort")
        df = df.drop_duplicates("text_md5", keep="first")
        return pa.Table.from_pandas(df, preserve_index=False)

    partials = scored.map_batches(keep_and_hash, batch_format="pyarrow",
                                  batch_size=16384)

    def bucket_first(g: pd.DataFrame) -> pd.DataFrame:
        g = g.sort_values(["text_md5", "doc_id"], kind="mergesort")
        return g.drop_duplicates("text_md5", keep="first")[["doc_id", "text"]]

    reps = bucketed_group_apply(partials, ["text_md5"], bucket_first)
    clean = contamination_filter(reps, sf_dir)

    def manifest(b: pa.Table) -> pa.Table:
        text = b["text"].combine_chunks()
        return pa.table({
            "doc_id": b["doc_id"],
            "n_tokens": pc.cast(pc.count_substring_regex(text, r"\S+"), pa.int64()),
            "n_chars": pc.cast(pc.utf8_length(text), pa.int64()),
        })

    return clean.map_batches(manifest, batch_format="pyarrow", batch_size=None)


def sql_training_prep(width: int = 32, bench_mod: int = 13) -> str:
    # shared single source of truth with the quality oracle (r3 review:
    # an embedded copy would silently drift if the heuristic is tuned)
    from ..stages.textstats import SQL_QUALITY_EXPR as quality_expr
    return f"""
, kept AS (
  SELECT doc_id, text FROM pages WHERE {quality_expr} = {QUALITY_PASS}
),
reps AS (
  SELECT MIN(doc_id) AS doc_id, text FROM kept GROUP BY text
),
bw AS (
  SELECT DISTINCT substr(d.text, CAST(g.i AS INT), {width}) AS w
  FROM documents d,
       LATERAL (SELECT unnest(generate_series(1, length(d.text) - {width - 1})) AS i) g
  WHERE d.doc_id % {bench_mod} = 0 AND length(d.text) >= {width}
),
cw AS (
  SELECT DISTINCT r.doc_id, substr(r.text, CAST(g.i AS INT), {width}) AS w
  FROM reps r,
       LATERAL (SELECT unnest(generate_series(1, length(r.text) - {width - 1})) AS i) g
),
hits AS (SELECT DISTINCT cw.doc_id FROM cw JOIN bw USING (w))
SELECT r.doc_id,
       CAST(length(regexp_extract_all(r.text, '\\S+')) AS BIGINT) AS n_tokens,
       CAST(length(r.text) AS BIGINT) AS n_chars
FROM reps r LEFT JOIN hits h USING (doc_id)
WHERE h.doc_id IS NULL
""".strip()
