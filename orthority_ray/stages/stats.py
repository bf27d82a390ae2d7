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

    def merge(g: pd.DataFrame) -> pd.DataFrame:
        acc = (0, np.zeros(d), np.zeros((d, d)))
        g = g.sort_values(["n"] + [c for c in g.columns if c.startswith(("mean_", "c_"))], kind="mergesort")  # content tie-break: equal-n partials (fixed batch sizes) must merge in a run-independent order
        for _, row in g.iterrows():
            mean = np.array([row[f"mean_{j}"] for j in range(d)])
            c = np.array([row[f"c_{j}"] for j in range(d * d)]).reshape(d, d)
            acc = merge_moments(acc, (int(row["n"]), mean, c))
        n, mean, c = acc
        out = {key: [g[key].iloc[0]], "n": [n]}
        for j, col in enumerate(cols):
            out[f"mean_{col}"] = [mean[j]]
        for a in range(d):
            for b in range(d):
                out[f"cov_{cols[a]}_{cols[b]}"] = [c[a, b] / max(1, n - 1)]
        return pd.DataFrame(out)

    return partials.groupby(key).map_groups(merge, batch_format="pandas")
