"""Page metadata extractor — the EXIF/XMP analog (SURVEY.md §2.1 S16,
`orthority/exif.py:101-363`): parse each page's envelope into typed fields
inside ``map_batches``.

Fields (all DuckDB-replicable for the oracle):
- ``site_id``     int from the url host segment
- ``seq_id``      int from the url path segment (== doc_id by construction)
- ``html_bytes``  payload length
- ``ts_hour``     hour bucket of warc_ts

(The reference pulls lat/lon/alt/attitude out of EXIF tags; the engine's
geocode derives them from the doc hash — the typed-field parsing pattern is
what this stage demonstrates.)
"""

from __future__ import annotations

import pyarrow as pa
import pyarrow.compute as pc
import ray.data


def metadata_batch(batch: pa.Table) -> pa.Table:
    url = batch["url"]
    # url = https://site{SSSS}.example/{DDDDDDDDDD}
    site = pc.cast(pc.utf8_slice_codeunits(url, 12, 16), pa.int64())
    seq = pc.cast(pc.utf8_slice_codeunits(url, 25, 35), pa.int64())
    html_bytes = pc.binary_length(batch["html"])
    ts_us = batch["warc_ts"].cast(pa.int64())
    hour = pc.divide(ts_us, 3_600_000_000)
    return pa.table(
        {
            "doc_id": batch["doc_id"],
            "site_id": site,
            "seq_id": seq,
            "html_bytes": pc.cast(html_bytes, pa.int64()),
            "ts_hour": hour,
        }
    )


def extract_metadata(ds: ray.data.Dataset) -> ray.data.Dataset:
    return ds.map_batches(metadata_batch, batch_format="pyarrow", batch_size=16384)


SQL_METADATA = """
SELECT doc_id,
       CAST(substring(url, 13, 4) AS BIGINT) AS site_id,
       CAST(substring(url, 26, 10) AS BIGINT) AS seq_id,
       CAST(12 + octet_length(encode(text)) + 14 AS BIGINT) AS html_bytes,
       epoch_us(warc_ts) // 3600000000 AS ts_hour
FROM pages
""".strip()
