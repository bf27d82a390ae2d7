"""Gram-Schmidt pan-sharpen analog — the engine's canonical two-phase
(aggregate -> broadcast -> map) pipeline.

Tabular re-expression of the reference's `oty sharpen` lifecycle
(SURVEY.md §3.3; `orthority/pan_sharp.py`): the "bands" are float columns of
the pages Dataset (a pan column + 3 MS columns synthesized deterministically
from each doc's geocode so they are spatially correlated):

  phase 1  ``map_batches(partial_moments)`` -> merge (stats.py kernel) ->
           global (means, cov)
  params   MS->pan weights by least squares on the covariance (A5), GS
           coefficients (eq 3-4 of the ISPRS GS recipe,
           doi:10.5194/isprsarchives-XL-1-W1-239-2013), pan gain/bias
           (US6011875A eq 2-3) — all on the tiny aggregated matrices,
           driver-side
  phase 2  ``map_batches(SharpenFn(params))`` — forward GS, substitute the
           normalised pan as component 0, reverse GS (patent eq 10-14).

The barrier between the phases is REQUIRED (phase 2 needs the global stats)
— this is the one place the engine materializes an aggregate mid-pipeline,
and it is dimension-sized.
"""

from __future__ import annotations

from dataclasses import dataclass

import numpy as np
import pyarrow as pa
import ray
import ray.data

from .stats import merge_moments, partial_moments

N_MS = 3  # MS band count; band 0 is pan
BAND_COLS = ["pan", "ms0", "ms1", "ms2"]


def synth_bands(batch: pa.Table) -> pa.Table:
    """Deterministic, spatially-correlated band columns from the geocode:
    smooth functions of (lon, lat) + per-doc hash detail, so the covariance
    structure is non-trivial (analogous to real pan/MS correlation)."""
    lon = batch["lon"].to_numpy(zero_copy_only=False)
    lat = batch["lat"].to_numpy(zero_copy_only=False)
    doc_id = batch["doc_id"].to_numpy(zero_copy_only=False)
    detail = ((doc_id * 2654435761) % 1000).astype(np.float64) / 1000.0
    base = np.sin(lon / 7.0) + np.cos(lat / 5.0)
    ms0 = 100.0 + 20.0 * base + 5.0 * detail
    ms1 = 80.0 + 15.0 * base + 8.0 * np.sin(lon / 3.0)
    ms2 = 60.0 + 10.0 * base + 6.0 * np.cos(lat / 4.0)
    pan = 0.5 * ms0 + 0.3 * ms1 + 0.2 * ms2 + 10.0 * detail  # high-res detail
    return (
        batch.append_column("pan", pa.array(pan))
        .append_column("ms0", pa.array(ms0))
        .append_column("ms1", pa.array(ms1))
        .append_column("ms2", pa.array(ms2))
    )


@dataclass
class GsParams:
    means: np.ndarray  # (1 + N_MS,)
    cov: np.ndarray  # (1 + N_MS, 1 + N_MS)
    weights: np.ndarray  # (N_MS,)
    coeffs: list  # list of (k+1,) arrays
    gain: float
    bias: float


def global_moments(ds: ray.data.Dataset, cols=BAND_COLS) -> tuple[int, np.ndarray, np.ndarray]:
    """Phase 1: per-batch partials merged with the stable pairwise update.
    The reduce is a tiny driver-side fold over one partial row per batch
    (deterministic order by batch content, not completion: rows sorted)."""
    d = len(cols)

    def partials(batch: pa.Table) -> pa.Table:
        x = np.stack([batch[c].to_numpy(zero_copy_only=False) for c in cols], axis=1)
        n, mean, c = partial_moments(x)
        out = {"n": pa.array([n], pa.int64())}
        for j in range(d):
            out[f"mean_{j}"] = pa.array([mean[j]])
        for j in range(d * d):
            out[f"c_{j}"] = pa.array([c.ravel()[j]])
        return pa.table(out)

    rows = ds.map_batches(partials, batch_format="pyarrow", batch_size=65536).to_pandas()
    # n=0 partials carry NaN means that would poison the merge; and the tie
    # key must include the c_* columns like stats.fold_moment_partials, or
    # equal-(n, means) partials fold in completion order (r3 review)
    rows = rows[rows["n"] > 0]
    rows = rows.sort_values(
        ["n"] + [f"mean_{j}" for j in range(d)]
        + [f"c_{j}" for j in range(d * d)], kind="mergesort")
    acc = (0, np.zeros(d), np.zeros((d, d)))
    for _, r in rows.iterrows():
        mean = np.array([r[f"mean_{j}"] for j in range(d)])
        c = np.array([r[f"c_{j}"] for j in range(d * d)]).reshape(d, d)
        acc = merge_moments(acc, (int(r["n"]), mean, c))
    return acc


def derive_params(n: int, means: np.ndarray, c: np.ndarray,
                  weights: np.ndarray | None = None) -> GsParams:
    """Weights (LSQ on covariance, non-negative re-fit), GS coefficients and
    pan gain/bias from the aggregated moments (ISPRS recipe + US6011875A)."""
    cov = c / max(1, n - 1)
    if weights is None:
        w = np.linalg.lstsq(cov[1:, 1:], cov[0, 1:], rcond=None)[0]
        if np.any(w < 0):
            pos = np.where(w > 0)[0]
            sub = np.linalg.lstsq(cov[1 + pos][:, 1 + pos], cov[0, 1 + pos], rcond=None)[0]
            if np.all(sub >= 0):
                w = np.clip(w, 0, None)
                w[pos] = sub
        w = np.clip(w, 0, None)
    else:
        w = np.asarray(weights, dtype=np.float64)
    s = w.sum()
    if not np.isfinite(s) or s <= 0:
        # all weights clipped to zero (pan anti-correlated with every band):
        # uniform fallback instead of 0/0 -> all-NaN parameters (r3 review)
        w = np.full(w.shape, 1.0 / w.shape[0])
    else:
        w = w / s

    ms_cov = cov[1:, 1:]
    nb = N_MS
    a = np.zeros((nb, nb))
    coeffs = [np.zeros(k + 1) for k in range(nb)]
    e = np.eye(nb)
    for k in range(nb):
        a[k] = w if k == 0 else e[k - 1] - coeffs[k - 1] @ a[:k]
        for l in range(k + 1):
            num = a[l] @ ms_cov[k]
            den = (np.outer(a[l], a[l]) * ms_cov).sum()
            coeffs[k][l] = (num / den
                            if den != 0 and np.any(a[l] != 0) else 0.0)

    pan_mean, pan_std = means[0], np.sqrt(cov[0, 0])
    sim_mean = w @ means[1:]
    sim_std = np.sqrt((np.outer(w, w) * ms_cov).sum())
    gain = sim_std / pan_std
    bias = sim_mean - gain * pan_mean
    return GsParams(means=means, cov=cov, weights=w, coeffs=coeffs, gain=gain, bias=bias)


def gs_forward(ms: np.ndarray, means: np.ndarray, coeffs, weights) -> np.ndarray:
    """(N_MS, n) MS rows -> (1 + N_MS, n) GS components (patent eq 10-12)."""
    gs = np.zeros((ms.shape[0] + 1, ms.shape[1]))
    gs[0] = weights @ ms
    for bi in range(ms.shape[0]):
        gs[bi + 1] = ms[bi] - means[bi] - coeffs[bi] @ gs[: bi + 1]
    return gs


def gs_reverse(gs: np.ndarray, means: np.ndarray, coeffs) -> np.ndarray:
    out = np.zeros((gs.shape[0] - 1, gs.shape[1]))
    for bi in range(out.shape[0]):
        out[bi] = gs[bi + 1] + means[bi] + coeffs[bi] @ gs[: bi + 1]
    return out


class SharpenFn:
    """Phase-2 actor: params fetched from the object store once per actor."""

    def __init__(self, params_ref):
        self.p: GsParams = ray.get(params_ref)

    def __call__(self, batch: pa.Table) -> pa.Table:
        ms = np.stack(
            [batch[c].to_numpy(zero_copy_only=False) for c in BAND_COLS[1:]], axis=0
        )
        pan = batch["pan"].to_numpy(zero_copy_only=False)
        gs = gs_forward(ms, self.p.means[1:], self.p.coeffs, self.p.weights)
        gs[0] = self.p.gain * pan + self.p.bias  # substitute normalised pan
        sharp = gs_reverse(gs, self.p.means[1:], self.p.coeffs)
        out = batch
        for bi, c in enumerate(BAND_COLS[1:]):
            out = out.append_column(f"sharp_{c}", pa.array(sharp[bi]))
        return out


def pan_sharpen(geo_ds: ray.data.Dataset, *, concurrency: int | None = None) -> ray.data.Dataset:
    """Full two-phase pipeline over a geocoded pages Dataset.

    Phase 2 runs as STATELESS tasks with the params cached per worker
    (`cached_stage`): the per-actor state is one small tuple, and spawning
    a fresh actor pool inside the measured region dominated the stage wall
    time (same lesson as the other trivial-state stages)."""
    from ..core.config import cached_stage

    banded = geo_ds.map_batches(synth_bands, batch_format="pyarrow", batch_size=65536)
    n, means, c = global_moments(banded)
    params = derive_params(n, means, c)
    params_ref = ray.put(params)
    return banded.map_batches(
        cached_stage(SharpenFn, f"sharpen:{params_ref.hex()}", params_ref),
        batch_format="pyarrow",
        batch_size=65536,
        concurrency=concurrency,
    )
