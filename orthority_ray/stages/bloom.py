"""Bloom-filter semi-join — prune the big side's shuffle at the scan.

The canonical 100-TB join optimization: when a big fact table is
semi-joined against a selective dimension predicate, ship a Bloom filter
of the dimension keys to every scan task instead of shuffling the fact
table.  Rows failing the filter are discarded block-locally (zero
exchange); only the surviving ~selectivity fraction enters the exact
bucketed ``hash_join`` that removes the filter's false positives — so the
result is exact by construction while the all-to-all moves 10-100x fewer
bytes.  (Same role as runtime filters / sideways information passing in
Spark, Presto, DuckDB — all public designs.)

Everything is vectorized numpy over zero-copy Arrow columns:

* hashing — splitmix64 double hashing, ``idx_i = (h1 + i*h2) mod m`` for
  the k probes (Kirsch-Mitzenmacher, public), one (keys x k) index matrix;
* the per-block partial is a packed uint64 bit array; partials are
  bitwise-OR-mergeable, so the build is one ``map_batches`` over the
  dimension side plus a driver OR of block-count tiny blobs (the filter
  itself — m/8 bytes — is the only thing broadcast, via ``ray.put``).

``bloom_semijoin`` is the oracle-checked demo query: lineitems of URGENT
orders, aggregated per ship mode (DuckDB verifies against a plain IN
subquery — the Bloom stage must therefore be invisible in the result).
"""

from __future__ import annotations

import math

import numpy as np
import pandas as pd
import pyarrow as pa
import pyarrow.compute as pc
import ray
import ray.data

_PHI1 = np.uint64(0x9E3779B97F4A7C15)
_M1 = np.uint64(0xBF58476D1CE4E5B9)
_M2 = np.uint64(0x94D049BB133111EB)


def _splitmix64(x: np.ndarray, seed: np.uint64) -> np.ndarray:
    z = x.astype(np.uint64) + seed + _PHI1
    z ^= z >> np.uint64(30)
    z *= _M1
    z ^= z >> np.uint64(27)
    z *= _M2
    z ^= z >> np.uint64(31)
    return z


def _params(n_items: int, fpp: float) -> tuple[int, int]:
    n = max(1, n_items)
    m = int(math.ceil(-n * math.log(fpp) / (math.log(2) ** 2)))
    m = ((m + 63) // 64) * 64  # whole uint64 words
    k = max(1, round(m / n * math.log(2)))
    return m, k


def _probe_words_bits(keys: np.ndarray, m: int, k: int) -> tuple[np.ndarray, np.ndarray]:
    """(keys x k) word indices + bit masks for the k probe positions."""
    h1 = _splitmix64(keys, np.uint64(0x1234ABCD))
    h2 = _splitmix64(keys, np.uint64(0x9E3779B9)) | np.uint64(1)
    i = np.arange(k, dtype=np.uint64)[None, :]
    idx = (h1[:, None] + i * h2[:, None]) % np.uint64(m)
    return (idx >> np.uint64(6)).astype(np.int64), np.uint64(1) << (idx & np.uint64(63))


def build_bloom(ds: ray.data.Dataset, col: str, n_items: int,
                fpp: float = 0.01) -> ray.ObjectRef:
    """Build a Bloom filter over ``ds[col]`` (int64 keys).  ``n_items`` is
    the (upper-bound) key count used to size the filter; per-block bit
    arrays are OR-merged on the driver (block-count x m/8-byte blobs — the
    dimension side's count, not the fact side's)."""
    m, k = _params(n_items, fpp)

    def partial(b: pa.Table) -> pa.Table:
        keys = b[col].to_numpy(zero_copy_only=False).astype(np.int64)
        words = np.zeros(m // 64, dtype=np.uint64)
        wi, bits = _probe_words_bits(keys, m, k)
        np.bitwise_or.at(words, wi.ravel(), bits.ravel())
        return pa.table({"words": pa.array([words.tobytes()], pa.large_binary())})

    blobs = ds.map_batches(partial, batch_format="pyarrow",
                           batch_size=65536).take_all()
    words = np.zeros(m // 64, dtype=np.uint64)
    for row in blobs:
        words |= np.frombuffer(row["words"], dtype=np.uint64)
    return ray.put({"words": words, "m": m, "k": k})


def bloom_contains(bloom: dict, keys: np.ndarray) -> np.ndarray:
    """Vectorized membership mask (no false negatives)."""
    wi, bits = _probe_words_bits(keys.astype(np.int64), bloom["m"], bloom["k"])
    return ((bloom["words"][wi] & bits) == bits).all(axis=1)


def bloom_semijoin(sf_dir: str) -> ray.data.Dataset:
    """Lineitems of URGENT orders per ship mode (count + integer quantity
    sum).  Bloom prefilter on the scan, exact bucketed semi join on the
    survivors, per-block combiner so the final groupby is dimension-sized."""
    from ..pipelines.relational import _read
    from ..sources.pages import cached_get
    from ..stages.hashjoin import hash_join

    orders = _read(sf_dir, "orders", ["o_orderkey", "o_orderpriority"])

    def urgent(b: pa.Table) -> pa.Table:
        t = b.filter(pc.equal(b["o_orderpriority"], "1-URGENT"))
        # renamed to the fact side's key so the semi join sees ONE key name
        return pa.table({"l_orderkey": t["o_orderkey"]})

    urgent_keys = orders.map_batches(urgent, batch_format="pyarrow",
                                     batch_size=65536).materialize()
    bloom_ref = build_bloom(urgent_keys, "l_orderkey", urgent_keys.count())

    li = _read(sf_dir, "lineitem", ["l_orderkey", "l_quantity", "l_returnflag"])

    def prefilter(b: pa.Table) -> pa.Table:
        bloom = cached_get(bloom_ref)
        keys = b["l_orderkey"].to_numpy(zero_copy_only=False)
        keep = bloom_contains(bloom, keys)
        t = b.filter(pa.array(keep))
        qty = np.floor(
            t["l_quantity"].to_numpy(zero_copy_only=False) + 0.5
        ).astype(np.int64)
        return pa.table({"l_orderkey": t["l_orderkey"],
                         "l_returnflag": t["l_returnflag"],
                         "qty": pa.array(qty)})

    survivors = li.map_batches(prefilter, batch_format="pyarrow",
                               batch_size=65536)
    exact = hash_join(survivors, urgent_keys, "l_orderkey",
                      ["l_orderkey", "l_returnflag", "qty"], ["l_orderkey"],
                      how="semi",
                      types={"l_returnflag": pa.string(), "qty": pa.int64()})

    def combiner(b: pa.Table) -> pa.Table:
        df = pd.DataFrame({"l_returnflag": b["l_returnflag"].to_pylist(),
                           "qty": b["qty"].to_numpy(zero_copy_only=False)})
        g = df.groupby("l_returnflag", as_index=False).agg(
            n_items=("qty", "size"), sum_qty=("qty", "sum"))
        g["n_items"] = g["n_items"].astype(np.int64)
        return pa.Table.from_pandas(g, preserve_index=False)

    def final(g: pd.DataFrame) -> pd.DataFrame:
        return g.groupby("l_returnflag", as_index=False).agg(
            n_items=("n_items", "sum"), sum_qty=("sum_qty", "sum"))

    return (
        exact.map_batches(combiner, batch_format="pyarrow", batch_size=65536)
        .groupby("l_returnflag")
        .map_groups(final, batch_format="pandas")
    )


def sql_bloom_semijoin() -> str:
    return """
SELECT l_returnflag, CAST(COUNT(*) AS BIGINT) AS n_items,
       CAST(SUM(CAST(floor(l_quantity + 0.5) AS BIGINT)) AS BIGINT) AS sum_qty
FROM lineitem
WHERE l_orderkey IN (SELECT o_orderkey FROM orders
                     WHERE o_orderpriority = '1-URGENT')
GROUP BY l_returnflag
""".strip()
