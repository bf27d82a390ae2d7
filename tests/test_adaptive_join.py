"""Adaptive (data-aware) hash join: sampled bucket count + hot-key salting.

The r2 verdict's weak-for-scale #3: DEFAULT_BUCKETS=64 bounds nothing when
the key domain is skewed — one Zipf hot key pins a single reducer however
large B is.  plan_hash_join samples a key histogram, sizes B to a row
budget, and names the hot keys; hash_join scatters each hot key's probe
rows across n_salts sub-buckets and replicates the matching build rows.
"""

import numpy as np
import pyarrow as pa
import pytest
import ray
import ray.data

from orthority_ray.stages.hashjoin import (
    N_SALTS,
    _key_hash,
    _with_bucket,
    adaptive_hash_join,
    hash_join,
    plan_hash_join,
)

ZIPF_A = 1.2
N_KEYS = 1000

# inverse-CDF table for Zipf(1.2) over 1..N_KEYS — row-deterministic keys
# regardless of how Ray batches the id column
_W = np.arange(1, N_KEYS + 1, dtype=np.float64) ** -ZIPF_A
_CDF = np.cumsum(_W) / _W.sum()


def _key_fn():
    """Worker-safe Zipf key derivation: a nested closure (cloudpickle
    serializes it by value — a module-level function would pickle by
    reference to this test module, which Ray workers cannot import)."""
    cdf = _CDF

    def keys(ids: np.ndarray) -> np.ndarray:
        x = ids.astype(np.uint64) + np.uint64(0x9E3779B97F4A7C15)
        x = (x ^ (x >> np.uint64(30))) * np.uint64(0xBF58476D1CE4E5B9)
        x = (x ^ (x >> np.uint64(27))) * np.uint64(0x94D049BB133111EB)
        u = (x ^ (x >> np.uint64(31))).astype(np.float64) / 2**64
        return np.searchsorted(cdf, u).astype(np.int64) + 1

    return keys


_zipf_keys = _key_fn()  # driver-side alias for ground truth


def _left(n_rows: int, n_blocks: int = 32) -> ray.data.Dataset:
    zipf = _key_fn()

    def add_key(batch: pa.Table) -> pa.Table:
        ids = batch["id"].to_numpy(zero_copy_only=False)
        return pa.table({"k": pa.array(zipf(ids)), "value": pa.array(ids)})

    return ray.data.range(n_rows, override_num_blocks=n_blocks).map_batches(
        add_key, batch_format="pyarrow"
    )


def _right() -> ray.data.Dataset:
    ks = np.arange(1, N_KEYS + 1, dtype=np.int64)
    return ray.data.from_arrow(pa.table({"k": ks, "attr": ks * 10}))


def test_plan_finds_hot_keys_and_sizes_buckets(ray_session):
    n = 10_000_000
    n_buckets, hot = plan_hash_join(
        _left(n), _right(), "k", target_bucket_rows=250_000, fraction=0.01
    )
    # est_total ~1e7 -> B = 2^ceil(log2(40)) = 64
    assert n_buckets >= 64
    # Zipf(1.2): P(1) ~ 0.18, P(2) ~ 0.078, P(3) ~ 0.048 ... keys with
    # >=125k estimated rows must include at least the top 3
    assert {1, 2, 3} <= set(hot.tolist())
    assert len(hot) < 64  # and not the whole domain

    # per-bucket peak through the REAL probe-side tag stage: without
    # salting key 1 alone is ~1.8M rows in one bucket; with salting no
    # bucket may exceed ~2x the target budget
    tagged = _with_bucket(
        _left(n), "k", 0, n_buckets, ["k", "value"], [("attr", pa.int64())],
        np.unique(_key_hash(pa.array(hot))), N_SALTS,
    )

    def bucket_counts(batch: pa.Table) -> pa.Table:
        b, c = np.unique(batch["__bucket"].to_numpy(zero_copy_only=False), return_counts=True)
        return pa.table({"b": pa.array(b), "n": pa.array(c.astype(np.int64))})

    hist = (
        tagged.map_batches(bucket_counts, batch_format="pyarrow", batch_size=65536)
        .groupby("b")
        .aggregate(ray.data.aggregate.Sum("n", alias_name="n"))
        .to_pandas()
    )
    peak = int(hist["n"].max())
    assert peak <= 2 * 250_000, peak
    # sanity: unsalted peak really was the hot-key mass (prove the fix matters)
    keys_all = _zipf_keys(np.arange(n, dtype=np.uint64))
    assert (keys_all == 1).sum() > 1_500_000


def test_adaptive_join_checksum_at_10m(ray_session):
    n = 10_000_000

    def partial(batch: pa.Table) -> pa.Table:
        v = batch["value"].to_numpy(zero_copy_only=False)
        a = batch["attr"].to_numpy(zero_copy_only=False)
        return pa.table(
            {
                "rows": pa.array([batch.num_rows], pa.int64()),
                "ck": pa.array([int((v * a).sum())], pa.int64()),
            }
        )

    ids = np.arange(n, dtype=np.uint64)
    keys = _zipf_keys(ids)
    want_ck = int((ids.astype(np.int64) * keys * 10).sum())

    # strategy 1: forced salted-shuffle path (broadcast disabled)
    out = adaptive_hash_join(
        _left(n), _right(), "k", ["k", "value"], ["k", "attr"],
        target_bucket_rows=250_000, fraction=0.01, broadcast_threshold_rows=0,
        types={"value": pa.int64(), "attr": pa.int64()},
    )
    got = out.map_batches(partial, batch_format="pyarrow").sum(["rows", "ck"])
    assert got["sum(rows)"] == n  # every key 1..N_KEYS matches exactly once
    assert got["sum(ck)"] == want_ck

    # strategy 2: the planner sees the 1000-row dim side and short-circuits
    # to the broadcast map-side join — identical result, zero shuffle
    out2 = adaptive_hash_join(
        _left(n), _right(), "k", ["k", "value"], ["k", "attr"],
        fraction=0.01, types={"value": pa.int64(), "attr": pa.int64()},
    )
    got2 = out2.map_batches(partial, batch_format="pyarrow").sum(["rows", "ck"])
    assert got2["sum(rows)"] == n and got2["sum(ck)"] == want_ck


@pytest.mark.parametrize("how", ["inner", "left", "semi", "anti"])
def test_salted_equals_plain_all_modes(ray_session, how):
    n = 200_000
    # right side covers only half the key domain so left/semi/anti differ
    ks = np.arange(1, N_KEYS + 1, 2, dtype=np.int64)
    right = ray.data.from_arrow(pa.table({"k": ks, "attr": ks * 10}))
    cols = (["k", "value"], ["k", "attr"])
    plain = hash_join(_left(n), right, "k", *cols, how=how)
    salted = hash_join(
        _left(n), right, "k", *cols, how=how,
        hot_keys=np.array([1, 2, 3, 5], dtype=np.int64), n_salts=4,
    )
    a = plain.to_pandas().sort_values(list(plain.columns())).reset_index(drop=True)
    b = salted.to_pandas().sort_values(list(plain.columns())).reset_index(drop=True)
    assert len(a) == len(b) > 0
    assert a.equals(b)


def test_salted_left_dedup_colocates_copies(ray_session):
    # duplicate (dedup_id, key) copies spread across blocks must still dedup
    # globally when the key is hot-salted — the salt is the dedup column's
    # hash, so all copies land in the same sub-bucket
    zipf = _key_fn()

    def dup_left(batch: pa.Table) -> pa.Table:
        ids = batch["id"].to_numpy(zero_copy_only=False)
        dedup = ids % 5_000  # 20x duplication
        return pa.table(
            {
                "k": pa.array(zipf(dedup.astype(np.uint64))),
                "doc": pa.array(dedup.astype(np.int64)),
            }
        )

    left = ray.data.range(100_000, override_num_blocks=16).map_batches(
        dup_left, batch_format="pyarrow"
    )
    cols = (["k", "doc"], ["k", "attr"])
    plain = hash_join(left, _right(), "k", *cols, left_dedup="doc")
    salted = hash_join(
        left, _right(), "k", *cols, left_dedup="doc",
        hot_keys=np.array([1, 2], dtype=np.int64),
    )
    a = plain.to_pandas().sort_values(["k", "doc"]).reset_index(drop=True)
    b = salted.to_pandas().sort_values(["k", "doc"]).reset_index(drop=True)
    assert len(a) == len(b) == 5_000
    assert a.equals(b)


def test_string_key_salting(ray_session):
    # string keys share the FNV hash space for bucketing AND hot membership
    zipf = _key_fn()

    def str_left(batch: pa.Table) -> pa.Table:
        ids = batch["id"].to_numpy(zero_copy_only=False)
        k = zipf(ids)
        return pa.table(
            {
                "k": pa.array([f"host-{v}" for v in k]),
                "value": pa.array(ids.astype(np.int64)),
            }
        )

    left = ray.data.range(100_000, override_num_blocks=8).map_batches(
        str_left, batch_format="pyarrow"
    )
    ks = [f"host-{v}" for v in range(1, N_KEYS + 1)]
    right = ray.data.from_arrow(
        pa.table({"k": pa.array(ks), "attr": np.arange(1, N_KEYS + 1) * 10})
    )
    cols = (["k", "value"], ["k", "attr"])
    plain = hash_join(left, right, "k", *cols)
    salted = hash_join(left, right, "k", *cols,
                       hot_keys=np.array(["host-1", "host-2"], dtype=object))
    a = plain.to_pandas().sort_values(["k", "value"]).reset_index(drop=True)
    b = salted.to_pandas().sort_values(["k", "value"]).reset_index(drop=True)
    assert len(a) == len(b) == 100_000
    assert a.equals(b)


@pytest.mark.parametrize("how", ["inner", "left", "semi", "anti"])
def test_broadcast_equals_shuffle_join(ray_session, how):
    from orthority_ray.stages.hashjoin import broadcast_join

    n = 100_000
    ks = np.arange(1, N_KEYS + 1, 2, dtype=np.int64)  # half-domain dim
    right = ray.data.from_arrow(pa.table({"k": ks, "attr": ks * 10}))
    cols = (["k", "value"], ["k", "attr"])
    a = hash_join(_left(n), right, "k", *cols, how=how).to_pandas()
    b = broadcast_join(_left(n), right, "k", *cols, how=how).to_pandas()
    a = a.sort_values(list(a.columns)).reset_index(drop=True)
    b = b.sort_values(list(a.columns)).reset_index(drop=True)
    assert len(a) == len(b) > 0
    assert a.equals(b)


def test_plan_telemetry_records_strategy(ray_session):
    """adaptive_hash_join logs its decision to last_plans(): the skewed
    left x big right pair plans a salted shuffle; a dimension-sized right
    plans a broadcast (r3 verdict #8)."""
    import ray.data

    from orthority_ray.stages.hashjoin import adaptive_hash_join, last_plans

    last_plans(clear=True)
    left = _left(2_000_000)
    # big UNIQUE-key right side (row count above the broadcast threshold,
    # no many-to-many blowup): forces the planned-shuffle path
    right_big = ray.data.range(2_000_000, override_num_blocks=16).map_batches(
        lambda b: pa.table({"k": pa.array(b["id"].to_numpy() + 1),
                            "attr": b["id"]}),
        batch_format="pyarrow")
    adaptive_hash_join(left, right_big, "k", ["k", "value"], ["k", "attr"],
                       fraction=0.05, target_bucket_rows=250_000).count()
    adaptive_hash_join(left, _right(), "k", ["k", "value"], ["k", "attr"],
                       fraction=0.05).count()
    plans = last_plans()
    assert [p["strategy"] for p in plans[-2:]] == \
        ["salted-shuffle", "broadcast"]
    shuffled = plans[-2]
    assert shuffled["n_hot"] >= 1 and shuffled["n_buckets"] >= 16
    assert plans[-1]["right_total_est"] <= 100_000
