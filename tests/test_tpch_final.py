"""tpch_final helpers: the exact cross-multiplied comparison must hold
outside the int64 envelope (a silent overflow would flip HAVING filters)."""

from __future__ import annotations

import numpy as np

from orthority_ray.pipelines.tpch_final import _exact_mul_gt


def test_exact_mul_gt_int64_fast_path():
    v = np.array([1, 5, 10, -3], dtype=np.int64)
    out = _exact_mul_gt(v, 10, 49)
    assert out.tolist() == [False, True, True, False]


def test_exact_mul_gt_bigint_fallback_beyond_envelope():
    # v * mult overflows int64; a wrapped product would compare wrong
    big = 2 ** 62
    v = np.array([big - 1, 10], dtype=np.int64)
    out = _exact_mul_gt(v, 4, 4 * (big - 2))
    assert out.tolist() == [True, False]
    # rhs beyond the envelope forces the fallback too
    out2 = _exact_mul_gt(np.array([3], dtype=np.int64), 2, 2 ** 63)
    assert out2.tolist() == [False]
    # INT64_MIN: np.abs wraps negative — the two-sided bound must route it
    # to the big-int fallback (true product -2^64 is NOT > -1)
    out3 = _exact_mul_gt(np.array([-2 ** 63], dtype=np.int64), 2, -1)
    assert out3.tolist() == [False]


def test_exact_mul_gt_rejects_nonpositive_multiplier():
    import pytest

    with pytest.raises(ValueError):
        _exact_mul_gt(np.array([1], dtype=np.int64), 0, 1)


def test_region_nations_absent_region_is_empty_not_crash():
    # r3 review: the Q5/Q8 inline region lookups raised IndexError when the
    # configured region name was absent; the shared helper must yield an
    # empty member set (-> 0-row query, matching the SQL inner join)
    from orthority_ray.pipelines.relational import region_nations

    member, names = region_nations("/root/testdata/sf0.001", "NO_SUCH_REGION")
    assert member.shape == (0,)
    assert len(names) > 0  # full nation decode still available

    member2, _ = region_nations("/root/testdata/sf0.001", "ASIA")
    assert member2.shape[0] > 0
