"""DuckDB SQL fragments that replicate the engine's derivations exactly.

Single source of truth for the correctness oracle (``__ray_entry__.oracle_sql``):
every CTE here mirrors, expression-for-expression, the numpy code in
``sources/pages.py`` / ``core/hashing.py`` / ``core/cells.py`` so value hashes
match bit-for-bit.  Tables ``lineitem`` and ``documents`` are pre-registered
views over the same parquet the engine reads.
"""

from __future__ import annotations

from ..core import hashing as H
from ..core import cells as C

# pages: one row per lineitem row; text/lang joined from documents.
# NB the lpad widths (4, 10) are a CONTRACT with sources/pages.py's url
# synthesis: DuckDB lpad truncates beyond the width while Arrow utf8_lpad
# does not, so pages._synth raises loudly if doc_id ever reaches 1e10.
from .pages import N_HOSTS

PAGES_CTE = f"""
pages AS (
  SELECT l.l_orderkey * 8 + l.l_linenumber AS doc_id,
         'https://site' || lpad(CAST((l.l_orderkey * 8 + l.l_linenumber) % {N_HOSTS} AS VARCHAR), 4, '0')
           || '.example/' || lpad(CAST(l.l_orderkey * 8 + l.l_linenumber AS VARCHAR), 10, '0') AS url,
         TIMESTAMP '2025-01-01 00:00:00' + to_microseconds((l.l_orderkey * 8 + l.l_linenumber) * 1000000) AS warc_ts,
         d.text AS text,
         d.lang AS lang
  FROM lineitem l
  JOIN documents d ON d.doc_id = (l.l_orderkey * 8 + l.l_linenumber) % 500
)
""".strip()

# geocoded pages: integer millidegree coords -> degrees -> cell id.
GEO_CTE = f"""
geo AS (
  SELECT doc_id, url, text, lang,
         {H.SQL_LON_MILLI} AS lon_milli,
         {H.SQL_LAT_MILLI} AS lat_milli
  FROM pages
),
geod AS (
  SELECT doc_id, url, text, lang, lon_milli, lat_milli,
         {H.SQL_LON} AS lon,
         {H.SQL_LAT} AS lat,
         {C.sql_cell_expr(C.CELL_SIZE)} AS cell,
         {C.sql_cell_expr(C.KNN_CELL_SIZE)} AS knn_cell
  FROM geo
)
""".strip()


def with_pages(body: str) -> str:
    return f"WITH {PAGES_CTE} {body}"


def with_geo(body: str) -> str:
    return f"WITH {PAGES_CTE}, {GEO_CTE} {body}"
