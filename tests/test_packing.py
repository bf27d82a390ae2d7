"""Sequence packing invariants: capacity, completeness, determinism, waste."""

from __future__ import annotations

import numpy as np

from orthority_ray.stages.packing import CAPACITY, pack_block, sequence_pack


def test_pack_block_respects_capacity_and_order():
    rng = np.random.default_rng(5)
    ids = np.arange(200, dtype=np.int64)
    toks = rng.integers(1, 600, size=200).astype(np.int64)
    bins, offs, over = pack_block(ids, toks, 2048)
    assert over.sum() == 0
    df_fill = {}
    for b, o, n in zip(bins, offs, toks):
        df_fill[b] = max(df_fill.get(b, 0), o + n)
    assert all(f <= 2048 for f in df_fill.values())
    # offsets within a bin are consecutive in doc order
    assert (offs[bins == bins[0]][0] == 0)


def test_pack_block_oversized_doc_is_flagged_alone():
    ids = np.array([1, 2, 3], np.int64)
    toks = np.array([100, 5000, 100], np.int64)
    bins, offs, over = pack_block(ids, toks, 2048)
    assert over.tolist() == [0, 1, 0]
    assert offs[1] == 0  # oversized doc starts its own bin
    assert bins[0] != bins[1] and bins[1] != bins[2]


def test_sequence_pack_complete_deterministic_efficient(ray_session, sf_unit):
    out = sequence_pack(sf_unit).to_pandas()
    out2 = sequence_pack(sf_unit).to_pandas()
    a = out.sort_values("doc_id").reset_index(drop=True)
    assert a.equals(out2.sort_values("doc_id").reset_index(drop=True))
    assert a["doc_id"].is_unique and len(a) == 500  # every doc packed once
    fills = out.groupby("bin_id").apply(
        lambda g: (g["offset"] + g["n_tokens"]).max(), include_groups=False)
    ok = out.groupby("bin_id")["overflow"].max() == 0
    assert (fills[ok] <= CAPACITY).all()
    # packing efficiency: utilization over all bins stays reasonable even
    # with per-block partial last bins
    util = out["n_tokens"].sum() / (out["bin_id"].nunique() * CAPACITY)
    assert util >= 0.5, util
