"""Grouped streaming covariance — the engine's partial+final aggregate kernel.

Re-derivation of the reference's parallel streaming covariance
(`orthority/pan_sharp.py:228-309`; SURVEY.md §2.6 A1): per-batch partials
``(n, mean, C)`` with C the sum of deviation products, merged with the
numerically-stable pairwise update (Schubert & Gertz 2018, the published
formula the reference also cites):

    n   = na + nb
    d   = mean_b - mean_a
    mean= mean_a + d * nb / n
    C   = Ca + Cb + outer(d, d) * na * nb / n

Used for per-cell coordinate statistics and for the pan-sharpen analog's
band covariance.  Pattern: ``map_batches(partials)`` (combiner — shuffles
one small row per (key, batch), so Zipf-hot keys cost the same as cold
ones) -> ``groupby(key).map_groups(merge)``.
"""

from __future__ import annotations

import numpy as np
import pandas as pd
import pyarrow as pa
import ray.data


def partial_moments(x: np.ndarray) -> tuple[int, np.ndarray, np.ndarray]:
    """(n, mean, C) of an (n, d) sample block."""
    n = x.shape[0]
    mean = x.mean(axis=0)
    dev = x - mean
    return n, mean, dev.T @ dev


def merge_moments(a, b):
    """Pairwise stable merge of two (n, mean, C) partials."""
    na, ma, ca = a
    nb, mb, cb = b
    n = na + nb
    if n == 0:
        return a
    d = mb - ma
    mean = ma + d * (nb / n)
    c = ca + cb + np.outer(d, d) * (na * nb / n)
    return n, mean, c


def _partials_batch(batch: pa.Table, key: str, cols: list[str]) -> pa.Table:
    keys = batch[key].to_numpy(zero_copy_only=False)
    x = np.stack([batch[c].to_numpy(zero_copy_only=False) for c in cols], axis=1)
    order = np.argsort(keys, kind="stable")
    keys_s, x_s = keys[order], x[order]
    uniq, starts = np.unique(keys_s, return_index=True)
    ends = np.append(starts[1:], keys_s.shape[0])
    d = len(cols)
    out_key = np.empty(uniq.shape[0], dtype=np.int64)
    out_n = np.empty(uniq.shape[0], dtype=np.int64)
    out_mean = np.empty((uniq.shape[0], d))
    out_c = np.empty((uniq.shape[0], d * d))
    for g, (k, s, e) in enumerate(zip(uniq, starts, ends)):
        n, mean, c = partial_moments(x_s[s:e])
        out_key[g], out_n[g] = k, n
        out_mean[g] = mean
        out_c[g] = c.ravel()
    tbl = {key: pa.array(out_key), "n": pa.array(out_n)}
    for j in range(d):
        tbl[f"mean_{j}"] = pa.array(out_mean[:, j])
    for j in range(d * d):
        tbl[f"c_{j}"] = pa.array(out_c[:, j])
    return pa.table(tbl)


def grouped_covariance(ds: ray.data.Dataset, key: str, cols: list[str]) -> ray.data.Dataset:
    """-> one row per key: n, mean_<col>..., cov_<i>_<j>... (sample cov)."""
    d = len(cols)
    partials = ds.map_batches(
        lambda b: _partials_batch(b, key, cols), batch_format="pyarrow", batch_size=65536
    )

    def merge_bucket(g: pd.DataFrame) -> pd.DataFrame:
        gs, starts, acc_n, acc_mean, acc_c = fold_moment_partials(g, [key], d)
        out = {key: gs[key].to_numpy()[starts], "n": acc_n}
        for j, col in enumerate(cols):
            out[f"mean_{col}"] = acc_mean[:, j]
        for a in range(d):
            for b in range(d):
                out[f"cov_{cols[a]}_{cols[b]}"] = acc_c[:, a, b] / np.maximum(
                    1, acc_n - 1
                )
        return pd.DataFrame(out)

    from .grouping import bucketed_group_apply

    return bucketed_group_apply(partials, [key], merge_bucket)


def fold_moment_partials(
    g: pd.DataFrame, group_cols: list[str], d: int
) -> tuple[pd.DataFrame, np.ndarray, np.ndarray, np.ndarray, np.ndarray]:
    """All groups of moment partials folded at once: rows sorted by
    (group_cols, n, content) — the same content-tie-broken order the old
    per-group merge used — then merged in LOCKSTEP rank rounds, every round
    one vectorized Schubert-Gertz update across all groups (the per-group
    iterrows fold paid ~0.8 ms per group; identical float sequence per
    group, so results are bit-equal).  Returns (sorted_frame, group_start
    indices, n, mean (G, d), C (G, d, d))."""
    tie = [c for c in g.columns if c.startswith(("mean_", "c_"))]
    g = g.sort_values(group_cols + ["n"] + tie, kind="mergesort")
    R = len(g)
    change = np.zeros(R, dtype=bool)
    if R:
        change[0] = True
    for k in group_cols:
        kv = g[k].to_numpy()
        change[1:] |= kv[1:] != kv[:-1]
    starts = np.flatnonzero(change)
    ends = np.concatenate([starts[1:], [R]])
    sizes = ends - starts
    rank = np.arange(R) - np.repeat(starts, sizes)
    gidx = np.repeat(np.arange(starts.shape[0]), sizes)
    n = g["n"].to_numpy().astype(np.int64)
    means = np.stack([g[f"mean_{j}"].to_numpy() for j in range(d)], axis=1)
    cs = np.stack(
        [g[f"c_{j}"].to_numpy() for j in range(d * d)], axis=1
    ).reshape(R, d, d)
    acc_n = n[starts].copy()
    acc_mean = means[starts].copy()
    acc_c = cs[starts].copy()
    for r in range(1, int(sizes.max()) if R else 0):
        sel = np.flatnonzero(rank == r)
        if sel.size == 0:
            break
        gi = gidx[sel]
        n1, n2 = acc_n[gi], n[sel]
        ntot = n1 + n2
        delta = means[sel] - acc_mean[gi]
        acc_mean[gi] = acc_mean[gi] + delta * (n2 / ntot)[:, None]
        # n1*n2 in float64, not int64: two ~3e9-row partials would wrap the
        # int64 product (r3 review).  For counts < 2^53 (exact in float64)
        # the single rounding of the product matches the old int64-then-
        # divide path bit-for-bit, so results are unchanged everywhere the
        # old code wasn't already overflowing
        acc_c[gi] = acc_c[gi] + cs[sel] + (
            delta[:, :, None] * delta[:, None, :]
        ) * (n1.astype(np.float64) * n2 / ntot)[:, None, None]
        acc_n[gi] = ntot
    return g, starts, acc_n, acc_mean, acc_c
