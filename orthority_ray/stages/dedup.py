"""Deduplication suite over the pages/documents text payload.

Exact + near-dup operators a 100 TB training-data pipeline needs (brief §
"Beyond the reference's operators").  All are deterministic (fixed hash
constants, no RNG) and parallelism-invariant.

Scale notes:
- exact dedup: content hash per batch (memoised md5) -> hash-partitioned
  ``groupby(text_md5)`` -> per-group representative.  ``exact_dedup_groups``
  shuffles only (hash, id) rows; ``exact_dedup`` (keep-representative-rows)
  must shuffle the payload — the standard dedup cost at crawl scale.
- MinHash: shingle -> 64-bit minhash signature per row inside ``map_batches``
  (numpy, vectorized over shingles), explode to (band, band_hash) rows,
  ``groupby`` the bands; candidate pairs verified with exact n-gram Jaccard.
- SimHash: 64-bit token-weighted fingerprint; near-dup candidates via 4x16-bit
  band buckets (Hamming <= 3 guaranteed found with 4 bands).
"""

from __future__ import annotations

import hashlib

import numpy as np
import pandas as pd
import pyarrow as pa
import ray.data
from ray.data.aggregate import Count, Min

from ..core.config import pool

# --- exact dedup -----------------------------------------------------------


_MD5_CACHE: dict[bytes, str] = {}


def add_text_md5(batch: pa.Table, col: str = "text") -> pa.Table:
    """Vectorized-ish md5 with a per-worker memo (dup-heavy crawl payloads)."""
    md5 = []
    for t in batch[col].cast(pa.binary()).to_pylist():
        h = _MD5_CACHE.get(t)
        if h is None:
            h = hashlib.md5(t).hexdigest()
            if len(_MD5_CACHE) < 200_000:
                _MD5_CACHE[t] = h
        md5.append(h)
    return batch.append_column("text_md5", pa.array(md5, pa.string()))


def exact_dedup_groups(ds: ray.data.Dataset, col: str = "text") -> ray.data.Dataset:
    """-> (text_md5, n_dups, rep_doc_id): one row per distinct text with its
    duplicate count and min-doc_id representative.  DuckDB oracle: md5()."""
    hashed = ds.map_batches(
        lambda b: add_text_md5(b, col).select(["text_md5", "doc_id"]),
        batch_format="pyarrow",
        batch_size=8192,
    )
    return hashed.groupby("text_md5").aggregate(
        Count(alias_name="n_dups"), Min("doc_id", alias_name="rep_doc_id")
    )


def exact_dedup(ds: ray.data.Dataset, col: str = "text") -> ray.data.Dataset:
    """Keep one row (min doc_id, then first by url for full determinism) per
    distinct text — the classic hash-partition + per-group-first."""
    hashed = ds.map_batches(lambda b: add_text_md5(b, col), batch_format="pyarrow",
                            batch_size=8192)

    def first(g: pd.DataFrame) -> pd.DataFrame:
        g = g.sort_values(["doc_id", "url"], kind="mergesort")
        return g.head(1)

    return hashed.groupby("text_md5").map_groups(first, batch_format="pandas")


SQL_EXACT_DEDUP_GROUPS = """
SELECT md5(text) AS text_md5, COUNT(*) AS n_dups, MIN(doc_id) AS rep_doc_id
FROM pages GROUP BY md5(text)
""".strip()


# --- shingles + MinHash ----------------------------------------------------

_MERSENNE = (1 << 61) - 1
N_PERM = 64
N_BANDS = 8  # 8 bands x 8 rows
ROWS_PER_BAND = N_PERM // N_BANDS
# deterministic permutation parameters (odd multipliers, fixed offsets)
_PERM_A = (np.arange(N_PERM, dtype=np.uint64) * 2 + 1) * np.uint64(0x9E3779B97F4A7C15)
_PERM_B = np.arange(N_PERM, dtype=np.uint64) * np.uint64(0xC2B2AE3D27D4EB4F)


def _shingle_hashes(text: str, n: int = 3) -> np.ndarray:
    """uint64 hashes of word n-gram shingles (FNV-1a over the joined bytes)."""
    words = text.split()
    if len(words) < n:
        grams = [" ".join(words)] if words else [""]
    else:
        grams = [" ".join(words[i : i + n]) for i in range(len(words) - n + 1)]
    out = np.empty(len(grams), dtype=np.uint64)
    for i, g in enumerate(grams):
        h = np.uint64(0xCBF29CE484222325)
        for byt in g.encode("utf-8"):
            h = np.uint64((int(h) ^ byt) * 0x100000001B3 % (1 << 64))
        out[i] = h
    return out


def _fnv1a_bulk(grams: list[bytes]) -> np.ndarray:
    out = np.empty(len(grams), dtype=np.uint64)
    for i, g in enumerate(grams):
        h = 0xCBF29CE484222325
        for byt in g:
            h = ((h ^ byt) * 0x100000001B3) & 0xFFFFFFFFFFFFFFFF
        out[i] = h
    return out


def minhash_signature(text: str, n: int = 3) -> np.ndarray:
    """(N_PERM,) uint64 minhash signature; vectorized over shingles."""
    sh = _shingle_hashes(text, n)
    if sh.size == 0:
        return np.zeros(N_PERM, dtype=np.uint64)
    # permuted[i, p] = sh[i] * A[p] + B[p]  (mod 2^64 wraparound is fine)
    with np.errstate(over="ignore"):
        perm = sh[:, None] * _PERM_A[None, :] + _PERM_B[None, :]
    return perm.min(axis=0)


class MinHasher:
    """Actor-pool stage: text -> (doc_id, band, band_hash) rows (exploded).
    Signatures are memoised per distinct text per actor (dup-heavy crawls)."""

    def __init__(self, n: int = 3):
        self.n = n
        self.cache: dict[str, np.ndarray] = {}

    def _sig(self, t: str) -> np.ndarray:
        sig = self.cache.get(t)
        if sig is None:
            sig = minhash_signature(t, self.n)
            if len(self.cache) < 100_000:
                self.cache[t] = sig
        return sig

    def __call__(self, batch: pa.Table) -> pa.Table:
        doc_id = batch["doc_id"].to_numpy(zero_copy_only=False)
        texts = batch["text"].to_pylist()
        sigs = np.stack([self._sig(t) for t in texts])  # (B, 64)
        bands = sigs.reshape(len(texts), N_BANDS, ROWS_PER_BAND)
        # fold each band to one uint64 via a polynomial mix
        with np.errstate(over="ignore"):
            bh = np.zeros((len(texts), N_BANDS), dtype=np.uint64)
            for r in range(ROWS_PER_BAND):
                bh = bh * np.uint64(1099511628211) + bands[:, :, r]
        return pa.table(
            {
                "doc_id": pa.array(np.repeat(doc_id, N_BANDS)),
                "band": pa.array(np.tile(np.arange(N_BANDS, dtype=np.int64), len(texts))),
                "band_hash": pa.array(bh.ravel().astype(np.int64)),  # reinterpret ok
            }
        )


def ngram_jaccard(a: str, b: str, n: int = 3) -> float:
    sa, sb = set(_shingle_hashes(a, n).tolist()), set(_shingle_hashes(b, n).tolist())
    if not sa and not sb:
        return 1.0
    return len(sa & sb) / len(sa | sb)


def minhash_candidate_pairs(ds: ray.data.Dataset, *, concurrency: int | None = None,
                            pre_dedup: bool = True) -> ray.data.Dataset:
    """LSH bucket groupby -> candidate (a, b) pairs, a < b, deduped.

    ``pre_dedup=True`` (default, and REQUIRED at crawl scale): run exact
    dedup first and MinHash only the distinct-text representatives.  A
    web crawl's duplicate groups are huge; without this, every LSH bucket
    holds the whole duplicate group and the pair expansion is quadratic in
    group size (observed: 600k pages / 500 distinct texts -> billions of
    pairs).  Pairs are between representative doc_ids; exact-dup membership
    expands them via the exact_dedup_groups table.
    """
    if pre_dedup:
        ds = exact_dedup(ds)
    bands = ds.map_batches(
        MinHasher, batch_format="pyarrow", batch_size=4096, concurrency=pool(concurrency)
    )

    def pairs(g: pd.DataFrame) -> pd.DataFrame:
        ids = np.unique(g["doc_id"].to_numpy())
        if ids.size < 2:
            return pd.DataFrame({"doc_a": [], "doc_b": []}).astype(np.int64)
        ia, ib = np.triu_indices(ids.size, k=1)
        return pd.DataFrame({"doc_a": ids[ia], "doc_b": ids[ib]})

    cand = bands.groupby(["band", "band_hash"]).map_groups(pairs, batch_format="pandas")
    # dedup pairs found in several bands
    return cand.groupby(["doc_a", "doc_b"]).map_groups(
        lambda g: g.head(1), batch_format="pandas"
    )


class JaccardVerifier:
    """Verify candidate pairs with exact n-gram Jaccard.

    The text payload for both pair members is fetched from a broadcast
    doc_id -> text lookup (small at test scale; at 100 TB this becomes a
    co-partitioned join on doc_id — documented trade-off).
    """

    def __init__(self, lookup_ref, n: int = 3, threshold: float = 0.7):
        import ray as _ray

        self.lookup: dict[int, str] = _ray.get(lookup_ref)
        self.n = n
        self.threshold = threshold

    def __call__(self, batch: pa.Table) -> pa.Table:
        a = batch["doc_a"].to_numpy(zero_copy_only=False)
        b = batch["doc_b"].to_numpy(zero_copy_only=False)
        jac = np.array(
            [ngram_jaccard(self.lookup[int(x)], self.lookup[int(y)], self.n) for x, y in zip(a, b)]
        )
        keep = jac >= self.threshold
        return pa.table(
            {
                "doc_a": pa.array(a[keep]),
                "doc_b": pa.array(b[keep]),
                "jaccard_pm": pa.array(np.floor(jac[keep] * 1_000_000).astype(np.int64)),
            }
        )


# --- connected components over candidate pairs ------------------------------


def connected_components(pairs: ray.data.Dataset, max_rounds: int = 20) -> ray.data.Dataset:
    """Duplicate clusters from (doc_a, doc_b) pairs via distributed
    min-label propagation (ray_guide.md dedup recipe): every node starts
    labelled with itself; each round, every edge pushes min(label) to both
    endpoints (groupby(node).min); stop at fixed point.

    Rounds are bounded by the cluster diameter; crawl duplicate clusters are
    shallow (near-cliques from LSH bands), so convergence is fast.  Output:
    (doc_id, component) with component = min doc_id of the cluster.
    """
    import pyarrow.compute as pc
    from ray.data.aggregate import Min

    edges = pairs.map_batches(
        lambda b: pa.table(
            {
                "a": pa.concat_arrays(
                    [b["doc_a"].combine_chunks(), b["doc_b"].combine_chunks()]
                ),
                "b": pa.concat_arrays(
                    [b["doc_b"].combine_chunks(), b["doc_a"].combine_chunks()]
                ),
            }
        ),
        batch_format="pyarrow",
    ).materialize()  # small (candidate pairs), reused every round

    # labels: node -> current component label (starts as the node itself)
    labels = edges.map_batches(
        lambda b: pa.table({"node": b["a"], "label": b["a"]}), batch_format="pyarrow"
    ).groupby("node").aggregate(Min("label", alias_name="label"))

    for _ in range(max_rounds):
        lab_pdf = labels.to_pandas()  # bounded by #nodes in the pair graph
        lab_ref = ray.put(dict(zip(lab_pdf["node"], lab_pdf["label"])))

        def push(batch: pa.Table) -> pa.Table:
            lk = ray.get(lab_ref)
            a = batch["a"].to_numpy(zero_copy_only=False)
            b = batch["b"].to_numpy(zero_copy_only=False)
            la = np.array([lk[int(x)] for x in a], dtype=np.int64)
            lb = np.array([lk[int(x)] for x in b], dtype=np.int64)
            return pa.table({"node": pa.array(a), "label": pa.array(np.minimum(la, lb))})

        new_labels = (
            edges.map_batches(push, batch_format="pyarrow")
            .groupby("node")
            .aggregate(Min("label", alias_name="label"))
        )
        new_pdf = new_labels.to_pandas().sort_values("node").reset_index(drop=True)
        old_pdf = lab_pdf.sort_values("node").reset_index(drop=True)
        labels = new_labels
        if (new_pdf["label"].values == old_pdf["label"].values).all():
            break

    return labels.map_batches(
        lambda b: pa.table({"doc_id": b["node"], "component": b["label"]}),
        batch_format="pyarrow",
    )


# --- SimHash ---------------------------------------------------------------


def simhash64(text: str) -> int:
    """Token-weighted 64-bit SimHash (deterministic FNV token hashes)."""
    toks = text.split()
    if not toks:
        return 0
    hashes = _fnv1a_bulk([t.encode("utf-8") for t in toks])
    bits = ((hashes[:, None] >> np.arange(64, dtype=np.uint64)[None, :]) & np.uint64(1)).astype(
        np.int64
    )
    counts = bits.sum(axis=0)
    maj = counts * 2 > len(toks)
    return int(np.sum(np.where(maj, 1, 0).astype(np.uint64) << np.arange(64, dtype=np.uint64)))


class SimHasher:
    """Actor-pool simhash stage with a per-actor memo cache."""

    def __init__(self):
        self.cache: dict[str, int] = {}

    def __call__(self, batch: pa.Table) -> pa.Table:
        def sh_of(t: str) -> int:
            v = self.cache.get(t)
            if v is None:
                v = simhash64(t)
                if len(self.cache) < 100_000:
                    self.cache[t] = v
            return v

        sh = np.array([sh_of(t) for t in batch["text"].to_pylist()], dtype=np.uint64)
        return _simhash_columns(batch, sh)


def _simhash_columns(batch: pa.Table, sh: np.ndarray) -> pa.Table:
    t = batch.append_column("simhash", pa.array(sh.astype(np.int64)))
    # 4 x 16-bit bands: any pair with Hamming distance <= 3 shares >= 1 band
    for b in range(4):
        t = t.append_column(
            f"sim_band{b}", pa.array(((sh >> np.uint64(16 * b)) & np.uint64(0xFFFF)).astype(np.int64))
        )
    return t


def add_simhash(batch: pa.Table) -> pa.Table:
    sh = np.array([simhash64(t) for t in batch["text"].to_pylist()], dtype=np.uint64)
    return _simhash_columns(batch, sh)


def simhash_buckets(ds: ray.data.Dataset) -> ray.data.Dataset:
    """(band, value, n_docs) bucket sizes — the SimHash LSH histogram."""
    hashed = ds.map_batches(SimHasher, batch_format="pyarrow", batch_size=4096,
                            concurrency=pool(None))

    def explode(batch: pa.Table) -> pa.Table:
        n = batch.num_rows
        parts = []
        for b in range(4):
            parts.append(
                pa.table(
                    {
                        "band": pa.array(np.full(n, b, dtype=np.int64)),
                        "value": batch[f"sim_band{b}"],
                        "doc_id": batch["doc_id"],
                    }
                )
            )
        return pa.concat_tables(parts)

    return (
        hashed.map_batches(explode, batch_format="pyarrow")
        .groupby(["band", "value"])
        .aggregate(Count(alias_name="n_docs"))
    )
