"""Extract stage: ``html: binary`` -> ``extracted_text: string``, byte-exact.

The per-row invariant (BASELINE.json input_hint) is byte-identical extracted
text per url.  The envelope is fixed (see ``sources/pages.py``), so extraction
is a zero-copy-ish Arrow kernel: ``binary_slice(html, 12, -14)`` + cast — no
Python-level row loop, no lossy normalization (SURVEY.md §7.5 hard part 6).

Analog of the reference's source-image band read + decode step
(`orthority/camera.py:287-317` Camera.read).
"""

from __future__ import annotations

import pyarrow as pa
import pyarrow.compute as pc
import ray.data

from ..sources.pages import HTML_PREFIX, HTML_SUFFIX


def extract_batch(batch: pa.Table) -> pa.Table:
    txt = pc.cast(
        pc.binary_slice(batch["html"], start=len(HTML_PREFIX), stop=-len(HTML_SUFFIX)),
        pa.string(),
    )
    return batch.append_column("extracted_text", txt)


def extract(ds: ray.data.Dataset) -> ray.data.Dataset:
    """Stateless ``map_batches`` (pure Arrow kernel -> cheap elastic tasks)."""
    return ds.map_batches(extract_batch, batch_format="pyarrow", batch_size=16384)


def verify_extraction(ds: ray.data.Dataset) -> ray.data.Dataset:
    """rows where extraction is NOT byte-identical (must be empty)."""
    def bad(batch: pa.Table) -> pa.Table:
        ok = pc.equal(batch["extracted_text"], batch["text"])
        return batch.filter(pc.invert(ok))
    return extract(ds).map_batches(bad, batch_format="pyarrow")
