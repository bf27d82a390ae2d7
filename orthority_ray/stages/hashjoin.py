"""Partitioned hash join for two LARGE sides (SURVEY.md §2.5; ray_guide.md
"Both sides large").

Neither side fits a broadcast, so both are bucketed by ``hash(key) % B`` and
matching buckets are joined pairwise inside ``map_groups`` — an explicit
hash-partitioned join.  The bucket count B bounds per-reducer memory
(bucket ≈ rows/B); skewed keys can be salted into sub-buckets by raising B
or pre-splitting hot keys (stages/salting.py pattern).

Implementation detail: the two sides are tagged and unioned so ONE
``groupby(bucket)`` shuffle co-locates both sides of each bucket (Ray Data
has no native co-partitioned zip); the per-bucket pandas merge is the probe.
"""

from __future__ import annotations

import numpy as np
import pyarrow as pa
import ray.data

DEFAULT_BUCKETS = 64


def _bucket_of(col: pa.ChunkedArray | pa.Array, n_buckets: int) -> np.ndarray:
    """Deterministic bucket id per key.  Integers use the multiplicative
    hash every bucketed stage shares; string/binary keys use the vectorized
    FNV-1a fold (core/texthash) — bucketing only co-locates rows, the
    per-bucket probe compares the actual key values, so a hash collision
    can never produce a wrong join row."""
    typ = col.type if isinstance(col, (pa.Array, pa.ChunkedArray)) else None
    if typ is not None and (pa.types.is_string(typ) or pa.types.is_large_string(typ)
                            or pa.types.is_binary(typ)):
        from ..core.texthash import hash_arrow_strings

        h = hash_arrow_strings(col)  # zero-copy off the Arrow buffers
        return (h % np.uint64(n_buckets)).astype(np.int64)
    k = col.to_numpy(zero_copy_only=False).astype(np.int64)
    return ((k * 2654435761) % 4294967296) % n_buckets


def _with_bucket(ds: ray.data.Dataset, key: str, side: int, n_buckets: int,
                 columns: list[str], other_cols: list[tuple[str, pa.DataType]]) -> ray.data.Dataset:
    """Tag rows with (bucket, side) AND pad with the other side's columns as
    typed nulls, so the union of the two sides has ONE schema — a group that
    happens to hold rows from only one side still exposes every column
    (schema-divergent groups crashed the probe when a bucket had no left
    rows)."""

    def tag(batch: pa.Table) -> pa.Table:
        bucket = _bucket_of(batch[key], n_buckets)
        out = {c: batch[c] for c in columns}
        for c, typ in other_cols:
            out[c] = pa.nulls(batch.num_rows, typ)
        out["__bucket"] = pa.array(bucket)
        out["__side"] = pa.array(np.full(batch.num_rows, side, dtype=np.int8))
        # canonical column order so both sides share ONE schema exactly
        order = sorted(c for c in out if not c.startswith("__"))
        return pa.table({c: out[c] for c in [*order, "__bucket", "__side"]})

    return ds.map_batches(tag, batch_format="pyarrow", batch_size=65536)


def hash_join(left: ray.data.Dataset, right: ray.data.Dataset, key: str,
              left_cols: list[str], right_cols: list[str],
              n_buckets: int = DEFAULT_BUCKETS, how: str = "inner",
              types: dict[str, pa.DataType] | None = None,
              left_dedup: str | None = None) -> ray.data.Dataset:
    """Inner/left/semi/anti join of two large Datasets on an int64 or
    string ``key`` column (``how="semi"``/``"anti"`` return LEFT columns
    only: rows with at least one / no match).

    ``left_cols`` / ``right_cols`` are the OUTPUT columns of each side (must
    include ``key``); non-key column names must not overlap.  The per-bucket
    probe is a vectorized numpy sort/searchsorted join over zero-copy Arrow —
    it preserves column dtypes exactly (a pandas merge on the unioned group
    would NaN-fill the other side's columns and upcast int64 -> float64,
    which round 1 shipped and the driver's value-hash caught).

    ``left_dedup`` names an int64 left column whose duplicate rows should be
    dropped inside each bucket before probing — a free global dedup when
    that column FUNCTIONALLY DETERMINES the join key (all copies then hash
    to the same bucket), saving the separate dedup exchange a caller would
    otherwise need (tfidf's doc_id -> text_md5 expansion uses this).

    ``types`` (column -> Arrow type for every non-key output column) skips
    the ``ds.schema()`` probes: on a lazy input whose last op is a shuffle,
    ``schema()`` EXECUTES the whole upstream chain once just to learn the
    dtypes, and the join then executes it again (measured 2x on the tfidf
    expansion join).  Pass it whenever the caller knows its output schema.
    """
    overlap = (set(left_cols) & set(right_cols)) - {key}
    if overlap:
        raise ValueError(f"non-key column overlap not supported: {sorted(overlap)}")
    r_only = [c for c in right_cols if c != key]
    l_only = [c for c in left_cols if c != key]
    # resolve dtypes once so both sides can pad the other's columns with
    # typed nulls (one unified union schema); on a lazy pipeline schema()
    # may execute a single upstream block
    def _types(ds: ray.data.Dataset, cols: list[str]) -> list[tuple[str, pa.DataType]]:
        s = ds.schema()
        m = dict(zip(s.names, s.types))
        def _pa_type(t) -> pa.DataType:
            if isinstance(t, pa.DataType):
                return t
            if np.dtype(t).kind == "O":
                # pandas-block datasets report strings as numpy object dtype
                return pa.string()
            return pa.from_numpy_dtype(t)

        return [(c, _pa_type(m[c])) for c in cols]

    # per-side: use caller types when they cover the side, else probe its
    # schema — so a caller can pass ONLY the expensive (shuffle-output)
    # side's columns and let the cheap map/read side resolve itself
    if types is not None and all(c in types for c in l_only):
        l_types = [(c, types[c]) for c in l_only]
    else:
        l_types = _types(left, l_only)
    if types is not None and all(c in types for c in r_only):
        r_types = [(c, types[c]) for c in r_only]
    else:
        r_types = _types(right, r_only)
    lt = _with_bucket(left.select_columns(left_cols), key, 0, n_buckets, left_cols, r_types)
    rt = _with_bucket(right.select_columns(right_cols), key, 1, n_buckets, right_cols, l_types)
    both = lt.union(rt)

    def probe(g: pa.Table) -> pa.Table:
        side = g["__side"].to_numpy(zero_copy_only=False)
        lmask = side == 0
        l_tbl = g.filter(pa.array(lmask)).select(left_cols)
        r_tbl = g.filter(pa.array(~lmask)).select(right_cols)
        if left_dedup is not None and l_tbl.num_rows:
            dd = l_tbl[left_dedup].to_numpy(zero_copy_only=False)
            _, first = np.unique(dd, return_index=True)
            l_tbl = l_tbl.take(pa.array(np.sort(first)))
        lk = l_tbl[key].to_numpy(zero_copy_only=False)
        rk = r_tbl[key].to_numpy(zero_copy_only=False)
        order = np.argsort(rk, kind="stable")
        rks = rk[order]
        lo = np.searchsorted(rks, lk, "left")
        hi = np.searchsorted(rks, lk, "right")
        cnt = hi - lo
        if how in ("semi", "anti"):
            mask = cnt > 0 if how == "semi" else cnt == 0
            return l_tbl.take(pa.array(np.nonzero(mask)[0]))
        total = int(cnt.sum())
        li = np.repeat(np.arange(lk.shape[0]), cnt)
        # within-match offsets: ragged ranges [lo_i, hi_i) flattened
        offs = np.arange(total) - np.repeat(np.cumsum(cnt) - cnt, cnt)
        ri = order[np.repeat(lo, cnt) + offs]
        out_l = l_tbl.take(pa.array(li))
        cols = {c: out_l[c] for c in left_cols}
        if r_only:
            out_r = r_tbl.select(r_only).take(pa.array(ri))
            for c in r_only:
                cols[c] = out_r[c]
        matched = pa.table(cols)
        if how == "left":
            miss = np.nonzero(cnt == 0)[0]
            if miss.size:
                lm = l_tbl.take(pa.array(miss))
                un = {c: lm[c] for c in left_cols}
                for c in r_only:
                    un[c] = pa.nulls(lm.num_rows, r_tbl.schema.field(c).type)
                matched = pa.concat_tables([matched, pa.table(un)])
        return matched

    return both.groupby("__bucket").map_groups(probe, batch_format="pyarrow")


def native_join(left: ray.data.Dataset, right: ray.data.Dataset, key: str,
                num_partitions: int = DEFAULT_BUCKETS, how: str = "inner") -> ray.data.Dataset:
    """Ray Data's built-in hash-partitioned ``Dataset.join`` (available in
    this Ray release) — same semantics as :func:`hash_join`; kept alongside
    the explicit bucketed implementation so the portable pattern and the
    native operator can be compared (equality asserted in tests)."""
    return left.join(right, join_type=how, num_partitions=num_partitions, on=(key,))
