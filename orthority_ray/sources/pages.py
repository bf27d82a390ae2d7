"""The ``pages`` source — Common-Crawl-style web-page table (BASELINE.json
``input_hint``): ``(url: string, warc_ts: timestamp[us], html: binary,
text: string, lang: string)`` plus an engine-internal ``doc_id: int64``.

Pages are synthesized DETERMINISTICALLY from the driver's parquet tables (no
external data, no RNG):

- one page per ``lineitem`` row, ``doc_id = l_orderkey * 8 + l_linenumber``
  (l_linenumber in 1..7 so ids never collide across orders; duplicate
  (orderkey, linenumber) pairs in the synthetic data yield duplicate pages —
  realistic for a web crawl and exactly what the dedup stages exist for);
- payload ``text``/``lang`` looked up from the 500-row ``documents`` table by
  ``doc_id % 500`` (small side -> broadcast via ``ray.put``, never shuffled);
- ``html`` is the exact reversible envelope
  ``b"<html><body>" + text + b"</body></html>"`` so extraction can be
  byte-identical per url (the per-row invariant);
- ``warc_ts`` = 2025-01-01T00:00:00 + doc_id seconds (no wall clock).

The identical derivation is expressed in DuckDB SQL by
:data:`orthority_ray.sources.sql.PAGES_CTE` for the correctness oracle.

Scale note: the only input actually read is two int columns of lineitem
(pruned at the read); everything else is generated per batch, so this source
streams at ~memory bandwidth and scales to arbitrary row counts.
"""

from __future__ import annotations

import numpy as np
import pyarrow as pa
import pyarrow.compute as pc
import pyarrow.parquet as pq
import ray
import ray.data

from ..core.config import read_blocks

HTML_PREFIX = b"<html><body>"
HTML_SUFFIX = b"</body></html>"
# 2025-01-01T00:00:00 UTC in microseconds since epoch
WARC_EPOCH_US = 1_735_689_600_000_000
# The url-synthesis host modulus: host index = doc_id % N_HOSTS, rendered
# "siteNNNN.example".  SINGLE SOURCE OF TRUTH (r3 advice) — linkrank,
# paradedup, splits, boilerplate and every SQL twin interpolate THIS
# constant; changing it here changes host attribution everywhere at once.
N_HOSTS = 1000

PAGES_SCHEMA = pa.schema(
    [
        ("url", pa.string()),
        ("warc_ts", pa.timestamp("us")),
        ("html", pa.binary()),
        ("text", pa.string()),
        ("lang", pa.string()),
        ("doc_id", pa.int64()),
    ]
)


def load_documents(sf_dir: str) -> pa.Table:
    """The 500-row documents side table (driver-side read, broadcast later)."""
    from ..core.config import table_path

    return pq.read_table(table_path(sf_dir, "documents"),
                         columns=["doc_id", "text", "lang"])


# Per-worker-process cache for broadcast objects: lets STATELESS map_batches
# tasks reuse a ray.put side table without paying an actor pool's process
# spawn cost (observed: spawning 2 pools x 32 actors inside the measured
# region inverted the 8->32 CPU scaling).  ray.get on a local object is
# zero-copy, but caching also skips deserialization bookkeeping per batch.
_BROADCAST_CACHE: dict[str, object] = {}


def cached_instance(key: str, factory):
    """Bounded per-worker get-or-build — the ONE place the broadcast cache
    is written, so every entry obeys the same eviction bound."""
    v = _BROADCAST_CACHE.get(key)
    if v is None:
        v = factory()
        _BROADCAST_CACHE[key] = v
        if len(_BROADCAST_CACHE) > 64:
            _BROADCAST_CACHE.pop(next(iter(_BROADCAST_CACHE)))
    return v


def host_str_from_idx(idx) -> pa.Array:
    """Host index (``doc_id % 1000``, Arrow int array/chunked) -> the
    url-contract host string ``siteNNNN.example`` (lpad 4, same as the
    url synthesis below and the SQL oracles).  Single owner: paradedup,
    linkrank and boilerplate all render hosts through here.  ``pa.scalar``
    literals so an empty block can't hit a null-type kernel miss."""
    return pc.binary_join_element_wise(
        pa.scalar("site"), pc.utf8_lpad(idx.cast(pa.string()), 4, "0"),
        pa.scalar(".example"), "")


def cached_get(ref):
    return cached_instance(ref.hex(), lambda: ray.get(ref))


class PageSynth:
    """Actor-pool batch fn: lineitem key columns -> full page rows.

    The documents lookup table is fetched from the object store ONCE per actor
    in ``__init__`` (broadcast join; SURVEY.md §2.5 J1/J2 analog of the
    reference's camera-bank lookup, `orthority/factory.py:205-234`).
    """

    def __init__(self, documents_ref: ray.ObjectRef):
        docs: pa.Table = ray.get(documents_ref)
        order = pc.sort_indices(docs["doc_id"])
        docs = docs.take(order)  # position == doc_id (0..499)
        self.text = docs["text"].combine_chunks()
        self.lang = docs["lang"].combine_chunks()

    def __call__(self, batch: pa.Table) -> pa.Table:
        ok = batch["l_orderkey"].to_numpy(zero_copy_only=False).astype(np.int64)
        ln = batch["l_linenumber"].to_numpy(zero_copy_only=False).astype(np.int64)
        return self._synth(ok * 8 + ln)

    ALL_COLUMNS = ("url", "warc_ts", "html", "text", "lang", "doc_id")

    def _synth(self, doc_id: np.ndarray,
               columns: tuple[str, ...] | list[str] | None = None) -> pa.Table:
        """Build ONLY the requested columns — synth-side column pruning
        (r3 review: text-only pipelines paid for the url lpads and the
        html binary concat, roughly doubling the hot input stage)."""
        cols = tuple(columns) if columns else self.ALL_COLUMNS
        idx = pa.array(doc_id % 500)
        text = (pc.take(self.text, idx)
                if ("text" in cols or "html" in cols) else None)
        out: dict = {}
        for c in cols:
            if c == "url":
                # width-10 contract with the oracle: DuckDB's lpad(x, 10)
                # TRUNCATES an 11-digit doc_id while Arrow's utf8_lpad does
                # not — urls would silently diverge AND collide (r3 review)
                if len(doc_id) and int(doc_id.max()) >= 10**10:
                    raise ValueError(
                        "doc_id >= 1e10 breaks the width-10 url contract "
                        "with the SQL oracle (DuckDB lpad truncates); widen "
                        "both sides together")
                site = pc.utf8_lpad(
                    pc.cast(pa.array(doc_id % N_HOSTS), pa.string()), 4, "0")
                did = pc.utf8_lpad(pc.cast(pa.array(doc_id), pa.string()),
                                   10, "0")
                out[c] = pc.binary_join_element_wise(
                    pa.scalar("https://site"), site, pa.scalar(".example/"),
                    did, pa.scalar(""))
            elif c == "warc_ts":
                out[c] = pa.array(
                    WARC_EPOCH_US + doc_id * 1_000_000).cast(pa.timestamp("us"))
            elif c == "html":
                out[c] = pc.binary_join_element_wise(
                    pa.scalar(HTML_PREFIX, pa.binary()),
                    text.cast(pa.binary()),
                    pa.scalar(HTML_SUFFIX, pa.binary()),
                    pa.scalar(b"", pa.binary()))
            elif c == "text":
                out[c] = text
            elif c == "lang":
                out[c] = pc.take(self.lang, idx)
            elif c == "doc_id":
                out[c] = pa.array(doc_id)
            else:
                raise KeyError(f"unknown page column {c!r}")
        return pa.table(out)


def read_pages(sf_dir: str, *, columns: list[str] | None = None,
               concurrency: int | None = None) -> ray.data.Dataset:
    """pages Dataset for a testdata directory.  Reads ONLY the two lineitem
    key columns (column pruning at the read), then synthesizes page rows in
    stateless tasks with the broadcast documents table cached per worker.
    ``columns`` prunes at the SYNTH too — callers that would immediately
    select_columns should pass it so unused payloads are never built."""
    return pages_from_keys(read_page_keys(sf_dir), sf_dir, columns=columns)


def read_page_keys_replicated(sf_dir: str, replicate: int) -> ray.data.Dataset:
    """doc_id keys for a `replicate`-times-larger synthetic crawl: copy r
    offsets ids by r * 2^24 so every copy geocodes to fresh locations.
    Used by the scaling benchmark to build a compute-dominated workload from
    the same input files."""
    from ..core.config import table_path

    ds = ray.data.read_parquet(
        table_path(sf_dir, "lineitem"), columns=["l_orderkey", "l_linenumber"],
        override_num_blocks=read_blocks(),
    )

    if not 1 <= replicate <= 207:
        # doc_id * H1 (2654435761) in core/hashing must stay under 2^63 —
        # the invariant numpy and the DuckDB BIGINT oracle share.  Max safe
        # doc_id is 2^63 / 2654435761 = 3,474,701,543, i.e. replicate 207
        # at the 2^24 stride (the previous bound of 300 admitted values
        # whose oracle-side multiply would overflow BIGINT; r3 review)
        raise ValueError(f"replicate must be in [1, 207], got {replicate}")

    def keys(batch: pa.Table) -> pa.Table:
        ok = batch["l_orderkey"].to_numpy(zero_copy_only=False).astype(np.int64)
        ln = batch["l_linenumber"].to_numpy(zero_copy_only=False).astype(np.int64)
        base = ok * 8 + ln
        if base.size and int(base.max()) >= (1 << 24):
            # replicas are offset by 2^24; a base id past that would alias
            # the next replica's range (silent duplicate doc_ids at sf >= 2)
            raise ValueError(
                f"base doc_id {int(base.max())} >= 2^24; raise the replica "
                "offset for this scale factor"
            )
        return pa.table(
            {
                "doc_id": pa.array(
                    np.concatenate([base + r * (1 << 24) for r in range(replicate)])
                )
            }
        )

    # single read, replication inside the map (no union tree); batch size
    # divided so output blocks stay ~64k rows
    return ds.map_batches(
        keys, batch_format="pyarrow", batch_size=max(4096, 65536 // replicate)
    )


def pages_from_keys(keys_ds: ray.data.Dataset, sf_dir: str,
                    columns: list[str] | None = None) -> ray.data.Dataset:
    """Synthesize page rows from a doc_id Dataset (same payload rules as
    read_pages, keyed by doc_id % 500 into the broadcast documents table);
    ``columns`` restricts which page columns are built at all.

    STATELESS tasks + per-worker broadcast cache — the side table is tiny,
    so elastic tasks beat an actor pool (no process spawn in the hot path)."""
    documents_ref = ray.put(load_documents(sf_dir))
    cols = tuple(columns) if columns else None

    def synth(batch: pa.Table) -> pa.Table:
        fn = cached_instance("pagesynth:" + documents_ref.hex(),
                             lambda: PageSynth(documents_ref))
        return fn._synth(batch["doc_id"].to_numpy(zero_copy_only=False), cols)

    return keys_ds.map_batches(synth, batch_format="pyarrow", batch_size=16384)


# The testdata parquet is ONE file with ONE row group, so read_parquet is a
# single serial task; SplitBlocks only splits its OUTPUT, and every stage
# fused/streamed behind it inherits the serial trickle (measured: a 0.1 s/
# batch map over sf0.1 ran 5.3 s streamed vs 1.0 s from materialized blocks
# on 32 CPUs).  A real deployment reads thousands of files/row groups and
# parallelizes natively; here we materialize the tiny key table ONCE per
# sf_dir into the object store and fan out from the 128 cached blocks.
_KEYS_CACHE: dict[tuple, ray.data.Dataset] = {}


def read_page_keys(sf_dir: str) -> ray.data.Dataset:
    """Just ``doc_id`` (for geo-only pipelines that don't touch the payload —
    keeps the hot path to a single pruned int column).  Materialized once
    per sf_dir per Ray session (see _KEYS_CACHE note)."""
    from ..core.config import (count_materialized_read, session_token,
                               should_materialize, table_path)

    # cache probe FIRST: a hit must not pay parquet-footer I/O
    cache_key = (sf_dir, session_token())
    cached = _KEYS_CACHE.get(cache_key)
    if cached is not None:
        return cached
    path = table_path(sf_dir, "lineitem")

    def keys(batch: pa.Table) -> pa.Table:
        ok = batch["l_orderkey"].to_numpy(zero_copy_only=False).astype(np.int64)
        ln = batch["l_linenumber"].to_numpy(zero_copy_only=False).astype(np.int64)
        return pa.table({"doc_id": pa.array(ok * 8 + ln)})

    if not should_materialize(path):
        # many fragments: the native parallel read feeds the cluster; STREAM
        # (materializing here would copy the whole key table into the object
        # store — VERDICT r2 "What's wrong" #1)
        return ray.data.read_parquet(
            path, columns=["l_orderkey", "l_linenumber"]
        ).map_batches(keys, batch_format="pyarrow", batch_size=None)

    # materialize the (serial single-task) read FIRST so the key map fans
    # out over cached blocks instead of queueing behind the streaming read
    count_materialized_read()
    ds = ray.data.read_parquet(
        path, columns=["l_orderkey", "l_linenumber"],
        override_num_blocks=read_blocks(),
    ).materialize()

    # batch_size=None = one batch per input block -> 128 materialized blocks,
    # so downstream task pools see full fan-out
    out = ds.map_batches(keys, batch_format="pyarrow", batch_size=None).materialize()
    while len(_KEYS_CACHE) >= 2:  # bound the cache: keys are ~16 B/row
        _KEYS_CACHE.pop(next(iter(_KEYS_CACHE)))
    _KEYS_CACHE[cache_key] = out
    return out
