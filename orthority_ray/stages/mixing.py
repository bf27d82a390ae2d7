"""Quality-ranked token-budget selection — the data-MIXING stage of an LLM
training pipeline: per language, take documents in (quality DESC, doc_id)
order until a per-language token budget is exhausted, and report what each
language's mix contributes (doc count, token count, and a doc_id checksum
so the oracle pins exactly WHICH documents were selected, not just how
many).

This is a distributed ORDERED-PREFIX problem (SUM(ntok) OVER (PARTITION BY
lang ORDER BY quality DESC, doc_id) <= budget) solved without a global
sort, with the same sampled-range-partition protocol as
stages/windows.global_rank:

1. one pass scores every page (quality int + non-empty token count);
2. a bounded boundary sample (<= 256 evenly-spaced values per block) cuts
   ``n_buckets`` RANGE buckets over quality — equal values always land in
   one bucket, so the only cross-bucket order is strict;
3. one combiner pass reduces to per-(lang, bucket) partials
   (rows, token sum, doc_id sum) — langs x buckets rows on the driver;
4. the driver's prefix scan over that tiny table decides, per lang, which
   buckets are wholly inside the budget and which single bucket straddles
   the cutoff;
5. only the straddling buckets' rows (O(N / n_buckets) each) are re-read,
   locally sorted, and prefix-summed from the driver's offset.

So the full corpus is never sorted or shuffled — the wide data moves once
through a combiner, and the exact per-row work happens on ~1/n_buckets of
one language's rows.
"""

from __future__ import annotations

import numpy as np
import pandas as pd
import pyarrow as pa
import ray
import ray.data

from .grouping import bucketed_group_apply
from .textstats import SQL_QUALITY_EXPR, QualityScorer

TOKEN_BUDGET = 100_000  # per-language token budget (contract with the SQL)
N_QBUCKETS = 64


def _score_batch(scorer: QualityScorer, b: pa.Table) -> pa.Table:
    from ..core.texthash import nonempty_token_counts

    q = scorer(b)["quality"]
    _, ntok, _ = nonempty_token_counts(b["text"])
    return pa.table({"doc_id": b["doc_id"], "lang": b["lang"],
                     "ntok": pa.array(ntok), "quality": q})


def token_budget_mix(sf_dir: str,
                     budget: int = TOKEN_BUDGET) -> ray.data.Dataset:
    """-> (lang, n_selected, tok_selected, id_sum): the per-language
    contribution of selecting docs by quality until ``budget`` tokens."""
    from ..sources.pages import read_pages

    return token_budget_mix_pages(
        read_pages(sf_dir, columns=["doc_id", "text", "lang"]), budget)


def token_budget_mix_pages(pages: ray.data.Dataset,
                           budget: int = TOKEN_BUDGET) -> ray.data.Dataset:
    """Budget selection over any (doc_id, text, lang) Dataset."""
    from ..core.config import cached_stage
    from ..sources.pages import cached_get

    class Scorer:
        def __init__(self):
            self.q = QualityScorer()

        def __call__(self, b: pa.Table) -> pa.Table:
            return _score_batch(self.q, b)

    # skinny scored projection (doc_id, lang, ntok, quality) executes once;
    # the boundary/partial/cutoff passes below re-read its blocks, never
    # the page synthesis (global_rank's single-pass contract)
    scored = pages.map_batches(cached_stage(Scorer, "mixing:scorer"),
                               batch_format="pyarrow",
                               batch_size=8192).materialize()

    def boundary_sample(b: pa.Table) -> pa.Table:
        v = b["quality"].to_numpy(zero_copy_only=False)
        k = min(256, len(v))
        idx = (np.linspace(0, len(v) - 1, num=k).astype(np.int64)
               if k else np.empty(0, dtype=np.int64))
        return pa.table({"quality": pa.array(v[idx])})

    sampled = (scored.select_columns(["quality"])
               .map_batches(boundary_sample, batch_format="pyarrow",
                            batch_size=65536).take_all())
    vals = np.sort(np.array([r["quality"] for r in sampled],
                            dtype=np.int64) * -1)
    qs = np.linspace(0, 1, N_QBUCKETS + 1)[1:-1]
    bounds = np.unique(np.quantile(vals, qs)) if vals.size else np.array([])
    bounds_ref = ray.put(bounds)

    def tag(b: pa.Table) -> pa.Table:
        bd = cached_get(bounds_ref)
        v = -b["quality"].to_numpy(zero_copy_only=False)
        return b.append_column("__qbucket", pa.array(
            np.searchsorted(bd, v, side="left").astype(np.int64)))

    def partial(b: pa.Table) -> pa.Table:
        doc = b["doc_id"].to_numpy(zero_copy_only=False)
        df = pd.DataFrame({
            "lang": b["lang"].to_pandas(),
            "__qbucket": b["__qbucket"].to_numpy(zero_copy_only=False),
            "n": np.ones(b.num_rows, np.int64),
            "tok": b["ntok"].to_numpy(zero_copy_only=False),
            "ids": doc,
            # float64 shadow of sum(|doc_id|): floats don't wrap, so the
            # driver can detect an int64 id_sum overflow LOUDLY instead of
            # silently diverging from the oracle's HUGEINT sum (r3 advice;
            # same envelope-guard family as value_gini / host_rank)
            "idsf": np.abs(doc).astype(np.float64)})
        return pa.Table.from_pandas(
            df.groupby(["lang", "__qbucket"], as_index=False,
                       sort=False).sum(), preserve_index=False)

    from ..pipelines.relational import combined_groupby_sum

    tagged = scored.map_batches(tag, batch_format="pyarrow",
                                batch_size=65536)
    per_lb = combined_groupby_sum(
        tagged.map_batches(partial, batch_format="pyarrow",
                           batch_size=65536),
        ["lang", "__qbucket"], ["n", "tok", "ids", "idsf"]).to_pandas()
    # every downstream id_sum is a subset-sum of nonneg |doc_id|, so the
    # global float shadow bounds them all; 2^62 leaves float rounding slack
    if float(per_lb["idsf"].sum()) >= float(2**62):
        raise OverflowError(
            "sum(|doc_id|) exceeds the int64 id_sum envelope (2^62); the "
            "doc_id checksum would wrap while the SQL oracle's HUGEINT sum "
            "does not — reduce doc_id magnitude or checksum doc_id % 2^32 "
            "on both sides")
    per_lb = per_lb.drop(columns=["idsf"])
    # driver-side prefix scan: langs x n_buckets rows, bounded
    per_lb = per_lb.sort_values(["lang", "__qbucket"])
    results: dict[str, dict[str, int]] = {}
    cutoff: dict[str, tuple[int, int]] = {}  # lang -> (bucket, tok_offset)
    for lang, g in per_lb.groupby("lang", sort=False):
        cum = g["tok"].cumsum().to_numpy()
        inside = cum <= budget
        full = g[inside]
        results[lang] = {"n": int(full["n"].sum()),
                         "tok": int(full["tok"].sum()),
                         "ids": int(full["ids"].sum())}
        if not bool(inside.all()):
            straddle = g[~inside].iloc[0]
            cutoff[str(lang)] = (int(straddle["__qbucket"]),
                                 results[lang]["tok"])
    if cutoff:
        cut_ref = ray.put(cutoff)

        def in_cutoff(b: pa.Table) -> pa.Table:
            cm = cached_get(cut_ref)
            # vectorized lang -> cutoff-bucket lookup (hash map in C)
            want_bucket = b["lang"].to_pandas().map(
                {k: v[0] for k, v in cm.items()}).fillna(-1).to_numpy()
            bucket = b["__qbucket"].to_numpy(zero_copy_only=False)
            return b.filter(pa.array(want_bucket == bucket))

        def finish(g: pd.DataFrame) -> pd.DataFrame:
            cm = cutoff
            out = []
            for lang, d in g.groupby("lang", sort=False):
                d = d.sort_values(["quality", "doc_id"],
                                  ascending=[False, True], kind="mergesort")
                cum = cm[str(lang)][1] + d["ntok"].cumsum().to_numpy()
                sel = d[cum <= budget]
                out.append({"lang": lang, "n": np.int64(len(sel)),
                            "tok": np.int64(sel["ntok"].sum()),
                            "ids": np.int64(sel["doc_id"].sum())})
            return pd.DataFrame(out, columns=["lang", "n", "tok", "ids"])

        straddled = tagged.map_batches(in_cutoff, batch_format="pyarrow",
                                       batch_size=65536)
        extra = bucketed_group_apply(straddled, ["lang"], finish,
                                     n_buckets=16).to_pandas()
        for _, row in extra.iterrows():
            r = results[row["lang"]]
            r["n"] += int(row["n"])
            r["tok"] += int(row["tok"])
            r["ids"] += int(row["ids"])
    out = pd.DataFrame(
        [{"lang": la, "n_selected": np.int64(v["n"]),
          "tok_selected": np.int64(v["tok"]), "id_sum": np.int64(v["ids"])}
         for la, v in sorted(results.items())],
        columns=["lang", "n_selected", "tok_selected", "id_sum"])
    out = out[out["n_selected"] > 0]
    schema = pa.schema([("lang", pa.string()), ("n_selected", pa.int64()),
                        ("tok_selected", pa.int64()), ("id_sum", pa.int64())])
    return ray.data.from_arrow(
        pa.Table.from_pandas(out, schema=schema, preserve_index=False))


SQL_TOKEN_BUDGET_MIX = rf"""
, scored AS (
  SELECT doc_id, lang,
         CAST(len(list_filter(string_split_regex(text, '\s+'),
                              x -> x <> '')) AS BIGINT) AS ntok,
         {SQL_QUALITY_EXPR} AS quality
  FROM pages
), ranked AS (
  SELECT *, SUM(ntok) OVER (PARTITION BY lang
                            ORDER BY quality DESC, doc_id
                            ROWS UNBOUNDED PRECEDING) AS cum
  FROM scored
)
SELECT lang, CAST(COUNT(*) AS BIGINT) AS n_selected,
       CAST(SUM(ntok) AS BIGINT) AS tok_selected,
       CAST(SUM(doc_id) AS BIGINT) AS id_sum
FROM ranked WHERE cum <= {TOKEN_BUDGET} GROUP BY lang
""".strip()
