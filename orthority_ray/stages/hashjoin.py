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
N_SALTS = 8  # sub-buckets per hot key (probe side salted, build side replicated)


def _key_hash(col: pa.ChunkedArray | pa.Array) -> np.ndarray:
    """Deterministic uint64 hash per key — the shared space for bucketing
    AND hot-key membership.  Integers use the multiplicative hash every
    bucketed stage shares; string/binary keys use the vectorized FNV-1a
    fold (core/texthash), zero-copy off the Arrow buffers.  Collisions are
    harmless everywhere this is used: bucketing only co-locates rows (the
    per-bucket probe compares actual key values), and a cold key colliding
    with a hot hash is simply salted/replicated consistently on both sides."""
    typ = col.type if isinstance(col, (pa.Array, pa.ChunkedArray)) else None
    if getattr(col, "null_count", 0):
        # a null int key would round-trip through float64 NaN -> int64,
        # an UNDEFINED C cast that differs across architectures — the same
        # null row could hash to different buckets on different nodes and
        # silently drop join rows.  Reject loudly (strings already did).
        raise ValueError("null join keys are not supported; filter them first")
    if typ is not None and (pa.types.is_string(typ) or pa.types.is_large_string(typ)
                            or pa.types.is_binary(typ)):
        from ..core.texthash import hash_arrow_strings

        return hash_arrow_strings(col).astype(np.uint64)
    from ..core.hashing import knuth32

    k = col.to_numpy(zero_copy_only=False)
    return knuth32(k).astype(np.uint64)


def _bucket_of(col: pa.ChunkedArray | pa.Array, n_buckets: int) -> np.ndarray:
    return (_key_hash(col) % np.uint64(n_buckets)).astype(np.int64)


def _hot_lookup(h: np.ndarray, hot_sorted: np.ndarray) -> tuple[np.ndarray, np.ndarray]:
    """(is_hot mask, hot-set index) for each key hash against the sorted
    hot-hash array."""
    idx = np.searchsorted(hot_sorted, h)
    idx_c = np.minimum(idx, hot_sorted.shape[0] - 1)
    is_hot = hot_sorted[idx_c] == h
    return is_hot, idx_c


def _with_bucket(ds: ray.data.Dataset, key: str, side: int, n_buckets: int,
                 columns: list[str], other_cols: list[tuple[str, pa.DataType]],
                 hot_hashes: np.ndarray | None = None, n_salts: int = N_SALTS,
                 replicate_hot: bool = False, salt_col: str | None = None) -> ray.data.Dataset:
    """Tag rows with (bucket, side) AND pad with the other side's columns as
    typed nulls, so the union of the two sides has ONE schema — a group that
    happens to hold rows from only one side still exposes every column
    (schema-divergent groups crashed the probe when a bucket had no left
    rows).

    Hot-key handling (``hot_hashes`` = sorted uint64 key hashes): hot key i
    owns the dedicated bucket range ``n_buckets + i*n_salts .. +n_salts-1``.
    The probe side scatters its hot rows across the range (salt from
    ``salt_col``'s hash when given — required so ``left_dedup`` copies
    co-locate — else round-robin); the build side (``replicate_hot``)
    duplicates each hot row into ALL ``n_salts`` sub-buckets, so every
    probe sub-bucket still sees every matching build row exactly once."""

    def tag(batch: pa.Table) -> pa.Table:
        h = _key_hash(batch[key])
        bucket = (h % np.uint64(n_buckets)).astype(np.int64)
        out = {c: batch[c] for c in columns}
        for c, typ in other_cols:
            out[c] = pa.nulls(batch.num_rows, typ)
        order = sorted(c for c in out if not c.startswith("__"))
        if hot_hashes is not None and hot_hashes.shape[0] and batch.num_rows:
            is_hot, idx = _hot_lookup(h, hot_hashes)
            base = n_buckets + idx.astype(np.int64) * n_salts
            if replicate_hot:
                tbl = pa.table({c: out[c] for c in order})
                hot_rows = np.nonzero(is_hot)[0]
                parts = [tbl.filter(pa.array(~is_hot))]
                buckets = [bucket[~is_hot]]
                if hot_rows.size:
                    rep = np.repeat(hot_rows, n_salts)
                    parts.append(tbl.take(pa.array(rep)))
                    buckets.append(
                        np.repeat(base[hot_rows], n_salts)
                        + np.tile(np.arange(n_salts, dtype=np.int64), hot_rows.size)
                    )
                tbl = pa.concat_tables(parts)
                bucket = np.concatenate(buckets)
                out = {c: tbl[c] for c in order}
                nrows = tbl.num_rows
            else:
                if salt_col is not None:
                    salt = (_key_hash(batch[salt_col]) % np.uint64(n_salts)).astype(np.int64)
                else:
                    salt = np.arange(batch.num_rows, dtype=np.int64) % n_salts
                bucket = np.where(is_hot, base + salt, bucket)
                nrows = batch.num_rows
        else:
            nrows = batch.num_rows
        out["__bucket"] = pa.array(bucket)
        out["__side"] = pa.array(np.full(nrows, side, dtype=np.int8))
        return pa.table({c: out[c] for c in [*order, "__bucket", "__side"]})

    return ds.map_batches(tag, batch_format="pyarrow", batch_size=65536)


def hash_join(left: ray.data.Dataset, right: ray.data.Dataset, key: str,
              left_cols: list[str], right_cols: list[str],
              n_buckets: int = DEFAULT_BUCKETS, how: str = "inner",
              types: dict[str, pa.DataType] | None = None,
              left_dedup: str | None = None,
              hot_keys: np.ndarray | list | None = None,
              n_salts: int = N_SALTS) -> ray.data.Dataset:
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

    ``hot_keys`` (raw key values, e.g. from :func:`plan_hash_join`) are
    skew-salted: left rows of a hot key scatter across ``n_salts``
    sub-buckets and the matching right rows are replicated into all of
    them, so no reducer ever holds more than ~1/n_salts of a hot key's
    probe rows.  Correct for every ``how`` (each left row still meets every
    matching right row exactly once); with ``left_dedup`` the salt is the
    dedup column's hash so duplicate copies co-locate.
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
    if how not in ("inner", "left", "semi", "anti", "full"):
        raise ValueError(f"unsupported how={how!r}")
    hot_hashes = None
    if hot_keys is not None and len(hot_keys):
        if how == "full":
            # a replicated build row that stays unmatched would be emitted
            # once per sub-bucket — full outer + hot-key salting is unsound
            raise ValueError("hot_keys salting is not supported for how='full'")
        hot_hashes = np.unique(_key_hash(pa.array(hot_keys)))
    lt = _with_bucket(left.select_columns(left_cols), key, 0, n_buckets, left_cols, r_types,
                      hot_hashes, n_salts, replicate_hot=False, salt_col=left_dedup)
    rt = _with_bucket(right.select_columns(right_cols), key, 1, n_buckets, right_cols, l_types,
                      hot_hashes, n_salts, replicate_hot=True)
    both = lt.union(rt)

    def probe(g: pa.Table) -> pa.Table:
        side = g["__side"].to_numpy(zero_copy_only=False)
        lmask = side == 0
        l_tbl = g.filter(pa.array(lmask)).select(left_cols)
        r_tbl = g.filter(pa.array(~lmask)).select(right_cols)
        return _join_tables(l_tbl, r_tbl, key, left_cols, right_cols,
                            r_only, how, left_dedup)

    return both.groupby("__bucket").map_groups(probe, batch_format="pyarrow")


def _join_tables(l_tbl: pa.Table, r_tbl: pa.Table, key: str,
                 left_cols: list[str], right_cols: list[str],
                 r_only: list[str], how: str,
                 left_dedup: str | None = None) -> pa.Table:
    """The vectorized sort/searchsorted join of two co-located Arrow tables
    — shared by the per-bucket probe (shuffle path) and the per-batch map
    (broadcast path).  Dtype-preserving: a pandas merge here NaN-fills and
    upcasts int64 -> float64 (round-1 regression the value-hash caught)."""
    if left_dedup is not None and l_tbl.num_rows:
        dd = l_tbl[left_dedup].to_numpy(zero_copy_only=False)
        _, first = np.unique(dd, return_index=True)
        l_tbl = l_tbl.take(pa.array(np.sort(first)))
    lk = l_tbl[key].to_numpy(zero_copy_only=False)
    rk = r_tbl[key].to_numpy(zero_copy_only=False)
    if rk.shape[0] < 2 or bool(np.all(rk[:-1] <= rk[1:])):
        # pre-sorted right side (broadcast_join sorts once driver-side):
        # an O(R) check instead of re-running argsort per probe batch
        order = np.arange(rk.shape[0], dtype=np.int64)
        rks = rk
    else:
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
    if how in ("left", "full"):
        miss = np.nonzero(cnt == 0)[0]
        if miss.size:
            lm = l_tbl.take(pa.array(miss))
            un = {c: lm[c] for c in left_cols}
            for c in r_only:
                un[c] = pa.nulls(lm.num_rows, r_tbl.schema.field(c).type)
            matched = pa.concat_tables([matched, pa.table(un)])
    if how == "full":
        matched_r = np.zeros(rk.shape[0], dtype=bool)
        matched_r[ri] = True
        rmiss = np.nonzero(~matched_r)[0]
        if rmiss.size:
            rm = r_tbl.take(pa.array(rmiss))
            un = {}
            for c in left_cols:
                # the key column carries the right side's key value;
                # left-only columns are typed nulls
                un[c] = rm[key] if c == key else pa.nulls(
                    rm.num_rows, l_tbl.schema.field(c).type)
            for c in r_only:
                un[c] = rm[c]
            matched = pa.concat_tables([matched, pa.table(un)])
    return matched


def broadcast_join(left: ray.data.Dataset, right: ray.data.Dataset, key: str,
                   left_cols: list[str], right_cols: list[str],
                   how: str = "inner") -> ray.data.Dataset:
    """Map-side join for a SMALL right side: the right table is collected
    once, ``ray.put`` once, and every left batch probes it in place — zero
    shuffle, the big side never moves.  Same semantics and dtypes as
    :func:`hash_join` (shared :func:`_join_tables` core; equality pinned in
    tests) for inner/left/semi/anti.  Not offered: ``full`` (right-side
    misses need a cross-batch view) and ``left_dedup`` (global dedup needs
    co-location).  The right side must genuinely be dimension-sized — this
    is the scale path for dim lookups, not a general join."""
    if how not in ("inner", "left", "semi", "anti"):
        raise ValueError(f"broadcast_join does not support how={how!r}")
    r_only = [c for c in right_cols if c != key]
    import ray

    from ..sources.pages import cached_get

    r_parts = [t for t in ray.get(
        right.select_columns(right_cols).to_arrow_refs()) if t.num_rows]
    r_tbl = (pa.concat_tables(r_parts, promote_options="default")
             if r_parts else None)
    if r_tbl is None:
        raise ValueError("broadcast_join: right side is empty")
    _key_hash(r_tbl[key])  # null-key check once, driver-side
    # sort by key ONCE here: _join_tables detects the sorted side and
    # skips its per-probe-batch argsort (was O(R log R) per 65k-row batch)
    import pyarrow.compute as pc

    r_tbl = r_tbl.combine_chunks()
    r_tbl = r_tbl.take(pc.sort_indices(r_tbl[key]))
    r_ref = ray.put(r_tbl)

    def probe(b: pa.Table) -> pa.Table:
        if getattr(b[key], "null_count", 0):
            # match hash_join's loud failure — a silent float64/NaN
            # round-trip would just drop the rows (inner) or null-fill
            # (left), diverging from the shuffle path on the same data
            raise ValueError(
                "null join keys are not supported; filter them first")
        rt = cached_get(r_ref)
        return _join_tables(b.select(left_cols), rt, key,
                            left_cols, right_cols, r_only, how)

    return left.map_batches(probe, batch_format="pyarrow", batch_size=65536)


def plan_hash_join(left: ray.data.Dataset, right: ray.data.Dataset, key: str,
                   *, target_bucket_rows: int = 500_000, fraction: float = 0.02,
                   seed: int = 42, max_hot: int = 256, per_batch_top: int = 64,
                   right_total: float | None = None) -> tuple[int, np.ndarray]:
    """Data-aware join plan: ``(n_buckets, hot_keys)`` from a sampled key
    histogram (the stages/salting.py protocol applied to joins).

    - ``n_buckets`` = next power of two of ``est_total_rows /
      target_bucket_rows`` clamped to [16, 4096], so per-reducer memory is
      bounded by the byte budget instead of the fixed DEFAULT_BUCKETS=64.
    - ``hot_keys`` = left-side keys whose estimated row count exceeds half a
      bucket — the keys that would pin a single reducer however large B is;
      :func:`hash_join` salts them across ``n_salts`` sub-buckets.

    Cost: one pass over each side's key column at ``fraction`` sampling
    (the sample is materialized, so size the fraction to the cluster — at
    10^12 rows use ~1e-5).  The per-batch partial keeps only the top
    ``per_batch_top`` keys, so the histogram shuffle is bounded by
    batches x per_batch_top rows, never by the key domain."""
    import pyarrow.compute as pc

    def sampled(ds):
        return ds.select_columns([key]).random_sample(fraction, seed=seed).materialize()

    sm = sampled(left)
    left_total = sm.count() / fraction

    def part(batch: pa.Table) -> pa.Table:
        if batch.num_rows == 0:
            return pa.table({"k": pa.array([], batch[key].type),
                             "n": pa.array([], pa.int64())})
        vc = pc.value_counts(
            batch[key].combine_chunks() if isinstance(batch[key], pa.ChunkedArray)
            else batch[key]
        )
        vals, cnts = vc.field("values"), vc.field("counts").to_numpy()
        if cnts.shape[0] > per_batch_top:
            top = np.argpartition(cnts, -per_batch_top)[-per_batch_top:]
            vals, cnts = vals.take(pa.array(np.sort(top))), cnts[np.sort(top)]
        return pa.table({"k": vals, "n": pa.array(cnts.astype(np.int64))})

    top_keys = (
        sm.map_batches(part, batch_format="pyarrow", batch_size=65536)
        .groupby("k")
        .aggregate(ray.data.aggregate.Sum("n", alias_name="n"))
        .sort("n", descending=True)
        .limit(max_hot)
        .to_pandas()
    )
    if right_total is None:
        # executes the right pipeline once; pass right_total when the caller
        # knows its size class (e.g. a dimension-sized aggregate) to skip it
        right_total = (
            right.select_columns([key]).random_sample(fraction, seed=seed).count() / fraction
        )
    est_rows = max(1.0, left_total + right_total)
    n_buckets = int(min(4096, max(16, 2 ** np.ceil(np.log2(max(1.0, est_rows / target_bucket_rows))))))
    est = top_keys["n"].to_numpy() / fraction
    hot = top_keys["k"].to_numpy()[est >= target_bucket_rows * 0.5]
    return n_buckets, hot


# Driver-side telemetry of adaptive-join decisions (r3 verdict #8): each
# adaptive_hash_join records the strategy it picked so `query --stats` can
# surface a misplan at scale (e.g. a 10^9-row side mis-sampled into a
# broadcast).  Planning happens on the driver, so a plain module list is
# safe; bounded FIFO so a long-lived session can't grow it unboundedly.
_PLAN_LOG: list[dict] = []
_PLAN_LOG_MAX = 64


def _log_plan(**plan) -> None:
    _PLAN_LOG.append(plan)
    if len(_PLAN_LOG) > _PLAN_LOG_MAX:
        del _PLAN_LOG[: len(_PLAN_LOG) - _PLAN_LOG_MAX]


def last_plans(clear: bool = False) -> list[dict]:
    """Adaptive-join decisions since start/clear, oldest first: dicts of
    ``{key, how, strategy, right_total_est, n_buckets, n_hot}``."""
    out = list(_PLAN_LOG)
    if clear:
        _PLAN_LOG.clear()
    return out


def adaptive_hash_join(left: ray.data.Dataset, right: ray.data.Dataset, key: str,
                       left_cols: list[str], right_cols: list[str],
                       how: str = "inner",
                       types: dict[str, pa.DataType] | None = None,
                       left_dedup: str | None = None,
                       n_salts: int = N_SALTS,
                       target_bucket_rows: int = 500_000,
                       fraction: float = 0.02, seed: int = 42,
                       right_total: float | None = None,
                       broadcast_threshold_rows: int = 100_000) -> ray.data.Dataset:
    """:func:`hash_join` with the strategy chosen from sampled statistics:

    1. a dimension-sized right side (estimated or hinted ``right_total``
       under ``broadcast_threshold_rows``) short-circuits to
       :func:`broadcast_join` — the big side never shuffles at all;
    2. otherwise :func:`plan_hash_join` sizes the bucket count to a row
       budget and salts the sampled hot keys.

    Use for joins whose key distribution or side sizes are unknown or
    skewed; fixed-dimension TPC-H-style joins keep the explicit
    ``n_buckets`` fast path."""
    if right_total is None:
        right_total = (
            right.select_columns([key]).random_sample(fraction, seed=seed).count()
            / fraction
        )
    if (right_total <= broadcast_threshold_rows
            and how in ("inner", "left", "semi", "anti")
            and left_dedup is None):
        _log_plan(key=key, how=how, strategy="broadcast",
                  right_total_est=int(right_total), n_buckets=0, n_hot=0)
        return broadcast_join(left, right, key, left_cols, right_cols, how=how)
    n_buckets, hot = plan_hash_join(
        left, right, key, target_bucket_rows=target_bucket_rows,
        fraction=fraction, seed=seed, right_total=right_total,
    )
    if how == "full":
        # full outer + salting is unsound (see hash_join's guard); keep the
        # data-aware bucket count but plan without hot keys instead of
        # crashing after the sampling pass
        hot = hot[:0]
    _log_plan(key=key, how=how,
              strategy="salted-shuffle" if len(hot) else "bucketed-shuffle",
              right_total_est=int(right_total), n_buckets=n_buckets,
              n_hot=int(len(hot)))
    return hash_join(left, right, key, left_cols, right_cols,
                     n_buckets=n_buckets, how=how, types=types,
                     left_dedup=left_dedup, hot_keys=hot, n_salts=n_salts)


def native_join(left: ray.data.Dataset, right: ray.data.Dataset, key: str,
                num_partitions: int = DEFAULT_BUCKETS, how: str = "inner") -> ray.data.Dataset:
    """Ray Data's built-in hash-partitioned ``Dataset.join`` (available in
    this Ray release) — same semantics as :func:`hash_join`; kept alongside
    the explicit bucketed implementation so the portable pattern and the
    native operator can be compared (equality asserted in tests)."""
    return left.join(right, join_type=how, num_partitions=num_partitions, on=(key,))
