"""Explicit skew salting for hot-cell aggregates (north_rule component).

The geocode concentrates ~50% of docs on 10 sites (SURVEY.md §4 "Skew"), so
a handful of cells are ~10^3x hotter than background.  Plain per-batch
pre-aggregation already neutralizes skew for DISTRIBUTIVE aggregates
(counts/sums shrink to one row per cell per batch).  Salting exists for the
aggregates whose per-group state does NOT shrink — e.g. ``map_groups`` over
raw rows (quantiles, covariance merges, per-group model fits) where one hot
cell would pin a single reducer.

Protocol:

1. **Sample a cell histogram** (``ds.random_sample`` + per-batch counts) and
   pick the hot set: cells whose estimated count exceeds
   ``hot_threshold_rows``.
2. **Salt**: hot cells get ``salt = hash(doc_id) % n_salts``; cold cells get
   salt 0.  The shuffle key becomes ``(cell, salt)``, splitting each hot
   reducer into ``n_salts`` bounded ones.
3. **Two-level reduce**: per-(cell, salt) partial states (streaming moments,
   stats.py kernel) -> per-cell final merge (n_salts rows per hot cell — a
   dimension-sized second pass).

``salted_cell_moments`` returns exactly what ``grouped_covariance`` returns;
equality is asserted in tests.
"""

from __future__ import annotations

import numpy as np
import pandas as pd
import pyarrow as pa
import ray
import ray.data

from .stats import partial_moments

N_SALTS = 8


def sample_hot_cells(geo_ds: ray.data.Dataset, *, fraction: float = 0.05,
                     hot_threshold_rows: int = 5_000, seed: int = 42) -> np.ndarray:
    """Estimated-hot cell ids from a seeded sample (cells whose estimated
    total row count exceeds the threshold)."""

    def counts(batch: pa.Table) -> pa.Table:
        cells, n = np.unique(batch["cell"].to_numpy(zero_copy_only=False), return_counts=True)
        return pa.table({"cell": pa.array(cells), "n": pa.array(n.astype(np.int64))})

    sampled = (
        geo_ds.random_sample(fraction, seed=seed)
        .map_batches(counts, batch_format="pyarrow", batch_size=65536)
        .groupby("cell")
        .aggregate(ray.data.aggregate.Sum("n", alias_name="n"))
        .to_pandas()
    )
    est = sampled["n"].to_numpy() / fraction
    return sampled["cell"].to_numpy()[est >= hot_threshold_rows].astype(np.int64)


def salted_cell_moments(geo_ds: ray.data.Dataset, cols: list[str],
                        hot_cells: np.ndarray | None = None,
                        n_salts: int = N_SALTS) -> ray.data.Dataset:
    """Per-cell streaming moments with hot cells salted across reducers.

    -> Dataset(cell, n, mean_<col>..., cov_<a>_<b>...) — identical values to
    ``stats.grouped_covariance`` (asserted in tests), but no reducer ever
    holds more than ~1/n_salts of a hot cell's partial rows.
    """
    if hot_cells is None:
        hot_cells = sample_hot_cells(geo_ds)
    hot_ref = ray.put(np.sort(hot_cells))
    d = len(cols)

    def partials(batch: pa.Table) -> pa.Table:
        hot = ray.get(hot_ref)
        cell = batch["cell"].to_numpy(zero_copy_only=False)
        doc_id = batch["doc_id"].to_numpy(zero_copy_only=False)
        is_hot = np.isin(cell, hot)
        from ..core.hashing import knuth32

        salt = np.where(is_hot, knuth32(doc_id) % n_salts, 0)
        x = np.stack([batch[c].to_numpy(zero_copy_only=False) for c in cols], axis=1)
        key = cell * n_salts + salt
        order = np.argsort(key, kind="stable")
        key_s, x_s = key[order], x[order]
        uniq, starts = np.unique(key_s, return_index=True)
        ends = np.append(starts[1:], key_s.shape[0])
        out = {
            "cell": np.empty(uniq.shape[0], dtype=np.int64),
            "salt": np.empty(uniq.shape[0], dtype=np.int64),
            "n": np.empty(uniq.shape[0], dtype=np.int64),
        }
        means = np.empty((uniq.shape[0], d))
        cs = np.empty((uniq.shape[0], d * d))
        for g, (k, s, e) in enumerate(zip(uniq, starts, ends)):
            n, mean, c = partial_moments(x_s[s:e])
            out["cell"][g] = k // n_salts
            out["salt"][g] = k % n_salts
            out["n"][g] = n
            means[g] = mean
            cs[g] = c.ravel()
        tbl = {k: pa.array(v) for k, v in out.items()}
        for j in range(d):
            tbl[f"mean_{j}"] = pa.array(means[:, j])
        for j in range(d * d):
            tbl[f"c_{j}"] = pa.array(cs[:, j])
        return pa.table(tbl)

    staged = geo_ds.map_batches(partials, batch_format="pyarrow", batch_size=65536)

    from .grouping import bucketed_group_apply
    from .stats import fold_moment_partials

    def merge_level(g: pd.DataFrame) -> pd.DataFrame:
        # content-ordered lockstep fold across all (cell, salt) groups in
        # the bucket — same float sequence per group as the old per-group
        # iterrows fold (stats.fold_moment_partials)
        gs, starts, acc_n, acc_mean, acc_c = fold_moment_partials(
            g, ["cell", "salt"], d
        )
        out = {"cell": gs["cell"].to_numpy()[starts],
               "salt": gs["salt"].to_numpy()[starts], "n": acc_n}
        for j in range(d):
            out[f"mean_{j}"] = acc_mean[:, j]
        flat = acc_c.reshape(len(starts), d * d)
        for j in range(d * d):
            out[f"c_{j}"] = flat[:, j]
        return pd.DataFrame(out)

    # level 1: reduce per (cell, salt) — hot cells split across n_salts reducers
    level1 = bucketed_group_apply(staged, ["cell", "salt"], merge_level)

    def merge_final(g: pd.DataFrame) -> pd.DataFrame:
        gs, starts, acc_n, acc_mean, acc_c = fold_moment_partials(g, ["cell"], d)
        out = {"cell": gs["cell"].to_numpy()[starts], "n": acc_n}
        for j, col in enumerate(cols):
            out[f"mean_{col}"] = acc_mean[:, j]
        for a in range(d):
            for b in range(d):
                out[f"cov_{cols[a]}_{cols[b]}"] = acc_c[:, a, b] / np.maximum(
                    1, acc_n - 1
                )
        return pd.DataFrame(out)

    # level 2: un-salt — at most n_salts rows per cell
    return bucketed_group_apply(level1, ["cell"], merge_final)
