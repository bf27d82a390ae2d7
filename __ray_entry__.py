"""Driver contract for the orthority_ray engine.

``queries()`` maps operator names (SURVEY.md §2 inventory + the training-data
operators) to callables ``sf_dir -> Dataset | DataFrame | Table``;
``oracle_sql()`` provides DuckDB-exact SQL for every SQL-expressible one.
Column names and value encodings (integer keys / floor-scaled cents) are
shared between both sides — see orthority_ray/sources/sql.py.

Ray is initialised by the driver BEFORE importing this module; nothing here
calls ray.init/ray.shutdown.
"""

from __future__ import annotations

from collections.abc import Callable
from typing import Any

import pyarrow as pa

from orthority_ray.core.geometry import make_tile_rings, sql_pip_predicate
from orthority_ray.core.hashing import SQL_SITE as _SQL_SITE
from orthority_ray.pipelines import relational as R
from orthority_ray.pipelines.flagship import flagship_result
from orthority_ray.pipelines.training_prep import sql_training_prep
from orthority_ray.sources import sql as S
from orthority_ray.sources.pages import N_HOSTS as _N_HOSTS
from orthority_ray.sources.pages import read_pages, read_page_keys
from orthority_ray.stages import ann as ANN
from orthority_ray.stages import dedup as D
from orthority_ray.stages.editdist import SQL_EDIT_DISTANCE
from orthority_ray.stages.editdist import SQL_HAMMING_NEIGHBORS as _SQL_HAMMING
from orthority_ray.stages.editdist import hamming_neighbors as _hamming_neighbors
from orthority_ray.stages import knn as KNN
from orthority_ray.pipelines import tpch_extra as TX
from orthority_ray.pipelines import tpch_more as TM
from orthority_ray.pipelines import tpch_final as TL
from orthority_ray.pipelines import events_extra as EV
from orthority_ray.stages import chunking as CH
from orthority_ray.stages import ngram as NG
from orthority_ray.stages import spandedup as SD
from orthority_ray.stages import tfidf as TF
from orthority_ray.stages import bloom as BL
from orthority_ray.stages import kmeans as KM
from orthority_ray.stages import dedup_index as DI
from orthority_ray.stages import bpe as BP
from orthority_ray.stages import tablediff as TD
from orthority_ray.stages import packing as PK
from orthority_ray.stages import textstats as T
from orthority_ray.stages import lexstats as LX
from orthority_ray.stages import audit as AUD
from orthority_ray.stages import boilerplate as BO
from orthority_ray.stages import splits as SPL
from orthority_ray.stages import linkrank as LR
from orthority_ray.stages import paradedup as PD
from orthority_ray.stages import mixing as MX
from orthority_ray.stages import sketches as _SK
from orthority_ray.stages.camera_geocode import (
    dem_geocode,
    pinhole_geocode_table,
    sql_pinhole_geocode,
)
from orthority_ray.stages.metadata import SQL_METADATA as _SQL_METADATA
from orthority_ray.stages.urlstats import SQL_HOST_STATS as _SQL_HOST_STATS
from orthority_ray.stages.urlstats import SQL_URL_REDACT as _SQL_URL_REDACT
from orthority_ray.stages.quantiles import (sql_bucketize_exact,
                                             sql_exact_quantiles,
                                             sql_grouped_mad4x,
                                             sql_grouped_weighted_median,
                                             sql_grouped_median,
                                             sql_grouped_median_cont2x)
from orthority_ray.stages.remap import sql_remap_checker as _sql_remap_checker
from orthority_ray.stages.geocode import geocode
from orthority_ray.stages.pip import pip_join
from orthority_ray.stages.sharpen import pan_sharpen
from orthority_ray.stages.stats import grouped_covariance
from orthority_ray.stages.tiles import N_ASSIGN_TILES, SQL_ASSIGN, assign_tiles, cell_counts

# Per-host page cap shared by q_host_cap and its oracle (r4 review: a
# hardcoded literal in the SQL could silently diverge from the default k).
HOST_CAP_K = 3


def entry() -> Any:
    """Flagship pipeline (pages -> extract -> geocode -> PIP join) on sf0.001."""
    return flagship_result("/root/testdata/sf0.001")


def _geo(sf_dir: str):
    return geocode(read_page_keys(sf_dir))


# ---------------------------------------------------------------------------


def q_cell_counts(sf_dir: str):
    return cell_counts(_geo(sf_dir))


def q_hot_cells_ranked(sf_dir: str):
    """Hot-cell detection (SURVEY §2.7 verbatim): per-cell counts ->
    GLOBAL ``Dataset.sort`` (n_docs desc, cell asc) over the dimension-
    sized aggregate -> limit(20) -> rank stamped on the bounded result.
    The rank column makes sort order value-visible to the oracle."""
    import pandas as pd

    top = (
        cell_counts(_geo(sf_dir))
        .sort(["n_docs", "cell"], descending=[True, False])
        .limit(20)
        .to_pandas()
    )
    top["rank"] = pd.RangeIndex(1, len(top) + 1).astype("int64")
    return top


SQL_HOT_CELLS_RANKED = """
SELECT cell, n_docs, rank FROM (
  SELECT cell, n_docs,
         row_number() OVER (ORDER BY n_docs DESC, cell ASC) AS rank
  FROM (SELECT cell, COUNT(*) AS n_docs FROM geod GROUP BY cell)
) WHERE rank <= 20
""".strip()


def q_tile_assign(sf_dir: str):
    return assign_tiles(_geo(sf_dir))


def q_pip_join(sf_dir: str):
    return pip_join(_geo(sf_dir))


def q_knn(sf_dir: str):
    return KNN.knn_broadcast(_geo(sf_dir))


def q_knn_cellring(sf_dir: str):
    return KNN.knn_cellring(_geo(sf_dir))


def q_geocode_pinhole(sf_dir: str):
    return pinhole_geocode_table(read_page_keys(sf_dir))


def q_exact_dedup(sf_dir: str):
    return D.exact_dedup_groups(read_pages(sf_dir))


def q_bpe_tokens(sf_dir: str):
    """BPE-style pre-tokenizer counts over url + text (letter / digit /
    punct runs; regex compiled once per worker)."""
    return T.bpe_token_counts(read_pages(sf_dir))


def q_heavy_hitters(sf_dir: str):
    """Exact two-phase heavy hitters over the duplicate-text hotspots:
    every text with count * 600 > total rows (local-threshold candidate
    union + broadcast recount; stages/sketches.py)."""
    from orthority_ray.stages.sketches import heavy_hitters

    ds = (
        read_pages(sf_dir, columns=["text"])
        .map_batches(D.add_text_md5, batch_format="pyarrow",
                     batch_size=8192)
        .select_columns(["text_md5"])
    )
    return heavy_hitters(ds, "text_md5", inv_phi=600, count_alias="n_items")


SAMPLE_K = 20
_SAMPLE_H = "(doc_id * 2654435761) % 4294967296"


def q_stratified_sample(sf_dir: str):
    """Deterministic stratified sample: per lang, the SAMPLE_K distinct
    doc_ids with the smallest multiplicative hash (tie: doc_id) — sampling
    as a mergeable per-block top-k (block-local winners are a superset of
    the global winners), no RNG, parallelism-invariant."""
    import pandas as pd

    def partial(b):
        df = b.select(["lang", "doc_id"]).to_pandas().drop_duplicates()
        df["h"] = (df["doc_id"].to_numpy() * 2654435761) % 4294967296
        df = df.sort_values(["lang", "h", "doc_id"], kind="mergesort")
        return pa.Table.from_pandas(df.groupby("lang").head(SAMPLE_K),
                                    preserve_index=False)

    def merge(g: pd.DataFrame) -> pd.DataFrame:
        g = g.drop_duplicates().sort_values(["h", "doc_id"], kind="mergesort")
        return g.head(SAMPLE_K)

    parts = read_pages(sf_dir, columns=["lang", "doc_id"]).map_batches(
        partial, batch_format="pyarrow", batch_size=65536)
    return parts.groupby("lang").map_groups(merge, batch_format="pandas")


SQL_STRATIFIED_SAMPLE = f"""
SELECT lang, doc_id, h FROM (
  SELECT lang, doc_id, h,
         row_number() OVER (PARTITION BY lang ORDER BY h, doc_id) AS rn
  FROM (SELECT DISTINCT lang, doc_id, {_SAMPLE_H} AS h FROM pages)
) WHERE rn <= {SAMPLE_K}
""".strip()


def q_vocabulary(sf_dir: str):
    """Corpus vocabulary above a frequency floor — the canonical word-count:
    pages flat-mapped to whitespace tokens (Arrow list kernels, zero Python
    per token) pre-counted PER BLOCK, then the exact weighted heavy-hitters
    pass (count * 30 > total tokens, integer compare on both sides).
    Tokenization runs ONCE — both phases consume the per-block counts, and
    the recount shuffle moves (token, count) partials, not raw tokens."""
    import pyarrow as pa
    import pyarrow.compute as pc

    from orthority_ray.stages.sketches import heavy_hitters_weighted

    def tok_counts(b):
        from orthority_ray.core.texthash import split_tokens_arrow

        t = pc.list_flatten(split_tokens_arrow(b["text"]))
        t = t.filter(pc.not_equal(t, ""))
        vc = pc.value_counts(t)
        return pa.table({"token": vc.field("values"),
                         "c": vc.field("counts").cast(pa.int64())})

    parts = read_pages(sf_dir, columns=["text"]).map_batches(
        tok_counts, batch_format="pyarrow", batch_size=16384)
    return heavy_hitters_weighted(parts, "token", "c", inv_phi=30,
                                  count_alias="n_tok")


def q_compression_ratio(sf_dir: str):
    """Rows-only: zlib compressibility per document (the boilerplate/
    repetition corpus filter; stages/textstats.CompressionScorer with the
    distinct-text memo).  No SQL twin — DuckDB has no compression fn."""
    from orthority_ray.pipelines.relational import _read
    from orthority_ray.stages.textstats import compression_ratio

    return compression_ratio(_read(sf_dir, "documents", ["doc_id", "text"]))


def q_fk_orphans(sf_dir: str):
    """Referential-integrity audit: per FK relation, how many fact rows
    reference a missing dimension key (stages/audit.py — broadcast sorted
    key sets + searchsorted membership for the dims, bucketed anti join
    for the fact-to-fact lineitem->orders relation)."""
    from orthority_ray.stages.audit import fk_orphan_counts

    return fk_orphan_counts(sf_dir)


def q_table_profile(sf_dir: str):
    """One-pass integer column profile of lineitem: rows / nulls / min /
    max per column (stages/audit.table_profile — per-block partial rows,
    column-sized driver fold)."""
    from orthority_ray.stages.audit import table_profile

    return table_profile(sf_dir)


def q_paragraph_dedup(sf_dir: str):
    """Sub-document (16-token paragraph) dedup with reassembly
    (stages/paradedup.paragraph_dedup): keep each distinct paragraph at its
    first corpus occurrence; one row per doc that keeps >= 1 paragraph."""
    from orthority_ray.stages.paradedup import paragraph_dedup

    return paragraph_dedup(sf_dir)


def q_cross_host_dup(sf_dir: str):
    """Per-host duplicate-origin attribution (stages/paradedup
    .cross_host_dup): intra-site vs cross-site duplicate page counts."""
    from orthority_ray.stages.paradedup import cross_host_dup

    return cross_host_dup(sf_dir)


def q_syndication_graph(sf_dir: str):
    """Weighted host->host syndication edge list (stages/linkrank
    .syndication_graph): cross-host duplicate pages as link-graph edges."""
    from orthority_ray.stages.linkrank import syndication_graph

    return syndication_graph(sf_dir)


def q_host_rank(sf_dir: str):
    """Fixed-point PageRank over the syndication graph (stages/linkrank
    .host_rank): 3 distributed power iterations, exact int64 arithmetic."""
    from orthority_ray.stages.linkrank import host_rank

    return host_rank(sf_dir)


def q_skew_report(sf_dir: str):
    """Join-key skew diagnostic (stages/audit.skew_report): hottest value
    + integer-ppm share per declared join key."""
    from orthority_ray.stages.audit import skew_report

    return skew_report(sf_dir)


def q_id_gaps(sf_dir: str):
    """Missing-doc-id range audit (stages/audit.id_gaps): range-bucketed
    islands-and-gaps with driver boundary stitching."""
    from orthority_ray.stages.audit import id_gaps

    return id_gaps(sf_dir)


def q_ncm_confusion(sf_dir: str):
    """Nearest-class-mean confusion matrix over embeddings
    (stages/ann.ncm_confusion) — exact integer scores, one int64 matmul
    per block against the broadcast centroid matrix."""
    from orthority_ray.core.config import table_path
    import ray.data

    from orthority_ray.stages.ann import ncm_confusion

    embs = ray.data.read_parquet(
        table_path(sf_dir, "embeddings"),
        columns=["vec_id", "embedding", "label"])
    return ncm_confusion(embs)


def q_label_embedding_sums(sf_dir: str):
    """Per-label exact integer embedding centroid sums (stages/ann.py:
    label_embedding_sums) — the LIST-column aggregate."""
    from orthority_ray.core.config import table_path
    import ray.data

    from orthority_ray.stages.ann import label_embedding_sums

    embs = ray.data.read_parquet(table_path(sf_dir, "embeddings"),
                                 columns=["embedding", "label"])
    return label_embedding_sums(embs)


def q_host_distance(sf_dir: str):
    """BFS hop distance from the min-index syndication host
    (stages/linkrank.host_distance): the graph family's SSSP member —
    driver frontier masks under SMALL_EDGE_LIMIT, distributed
    Bellman-Ford (join + grouped-min per hop) above it."""
    from orthority_ray.stages.linkrank import host_distance

    return host_distance(sf_dir)


def q_host_components(sf_dir: str):
    """Syndication communities (stages/linkrank.host_components):
    connected components of the undirected host graph via distributed
    min-label propagation; oracle = a WITH RECURSIVE transitive-closure
    min (the registry's first recursive-SQL oracle)."""
    from orthority_ray.stages.linkrank import host_components

    return host_components(sf_dir)


def q_split_assign(sf_dir: str):
    """Leakage-safe train/val/test split manifest (stages/splits
    .split_assign): host-hash 80/10/10 so a host's pages never straddle
    splits; per-(lang, split) host/page/token counts, dimension-sized
    folds."""
    from orthority_ray.stages.splits import split_assign

    return split_assign(sf_dir)


def q_split_leakage_neardup(sf_dir: str):
    """NEAR-duplicate cross-split contamination (stages/splits
    .split_leakage_neardup): the memoized dup_clusters chain (reps -> LSH
    candidates -> exact Jaccard verify) with a split bitmask per endpoint.
    Oracle-EXACT since r4 (sqlmirror MinHash twin)."""
    from orthority_ray.stages.splits import split_leakage_neardup

    return split_leakage_neardup(sf_dir)


def q_value_deciles(sf_dir: str):
    """Exact quantile feature binning (stages/quantiles.bucketize_exact):
    event value cents -> decile buckets via the distributed-histogram
    boundary pass + one broadcast searchsorted assign pass; per-bucket
    count/min/max folds are bucket-dimension-sized."""
    from orthority_ray.pipelines.relational import _read, cents
    from orthority_ray.stages.quantiles import bucketize_exact

    ev = _read(sf_dir, "events", ["value"])

    def prep(b):
        return pa.table({"v_cents": pa.array(
            cents(b["value"].to_numpy(zero_copy_only=False)))})

    return bucketize_exact(
        ev.map_batches(prep, batch_format="pyarrow", batch_size=65536),
        "v_cents")


def q_split_leakage(sf_dir: str):
    """Exact duplicate contamination across the host split (stages/splits
    .split_leakage): val/test pages whose text also appears in train,
    via a bucketed semi join against the distinct train-md5 table."""
    from orthority_ray.stages.splits import split_leakage

    return split_leakage(sf_dir)


def q_template_detect(sf_dir: str):
    """Per-host boilerplate detection (stages/boilerplate.template_detect):
    dominant leading-8-token prefix share, one bucketed host exchange."""
    from orthority_ray.stages.boilerplate import template_detect

    return template_detect(sf_dir)


def q_token_budget_mix(sf_dir: str):
    """Per-language quality-ranked token-budget selection (stages/mixing
    .token_budget_mix): distributed ordered-prefix without a global sort."""
    from orthority_ray.stages.mixing import token_budget_mix

    return token_budget_mix(sf_dir)


def q_weighted_median(sf_dir: str):
    """Quantity-weighted LOWER median of lineitem price cents per return
    flag (stages/quantiles.grouped_weighted_median: per-block (key, value,
    weight-sum) combiners, one bucketed sort+cumsum crossing pick)."""
    from orthority_ray.pipelines.relational import _read, cents
    from orthority_ray.stages.quantiles import grouped_weighted_median

    li = _read(sf_dir, "lineitem",
               ["l_returnflag", "l_extendedprice", "l_quantity"])

    def prep(b):
        import numpy as np

        p = cents(b["l_extendedprice"].to_numpy(zero_copy_only=False))
        q = b["l_quantity"].to_numpy(zero_copy_only=False).astype(np.int64)
        return pa.table({"l_returnflag": b["l_returnflag"],
                         "price_cents": pa.array(p), "qty": pa.array(q)})

    return grouped_weighted_median(
        li.map_batches(prep, batch_format="pyarrow", batch_size=65536),
        "l_returnflag", "price_cents", "qty")


def q_event_mad(sf_dir: str):
    """Per event type: exact interpolated median and median absolute
    deviation of value cents, doubled-integer encoded (med2x = 2*median,
    mad4x = 4*MAD; stages/quantiles.grouped_mad4x — two bucketed median
    passes, dimension-sized broadcast between them)."""
    from orthority_ray.pipelines.relational import _read, cents
    from orthority_ray.stages.quantiles import grouped_mad4x

    ev = _read(sf_dir, "events", ["event_type", "value"])

    def prep(b):
        import numpy as np

        v = cents(b["value"].to_numpy(zero_copy_only=False))
        return pa.table({"event_type": b["event_type"], "v_cents": pa.array(v)})

    return grouped_mad4x(
        ev.map_batches(prep, batch_format="pyarrow", batch_size=65536),
        "event_type", "v_cents")


def q_lexical_diversity(sf_dir: str):
    """Per-language type/token counts: total token occurrences + DISTINCT
    tokens (stages/lexstats.py: per-block pre-counts, one bucketed token
    exchange, lang-sized rollup)."""
    from orthority_ray.stages.lexstats import lexical_diversity

    return lexical_diversity(read_pages(sf_dir, columns=["text", "lang"]))


def q_oov_rate(sf_dir: str):
    """Per-language out-of-vocabulary occurrence counts against the exact
    corpus top-100 vocabulary (count desc, token asc; stages/lexstats.py:
    shared bucketed token exchange, global_topk cut, broadcast is_in)."""
    from orthority_ray.stages.lexstats import oov_rate

    return oov_rate(read_pages(sf_dir, columns=["text", "lang"]))


def q_vocab_growth(sf_dir: str):
    """Vocabulary-growth curve: distinct tokens first seen per crawl hour
    (stages/lexstats.vocab_growth — per-block token min-doc partials, one
    bucketed min exchange, hour-dimension rollup)."""
    from orthority_ray.stages.lexstats import vocab_growth

    return vocab_growth(read_pages(sf_dir, columns=["doc_id", "text"]))


def q_tfidf_topk(sf_dir: str):
    """Per-doc top-3 distinctive tokens by integer tf-idf (stages/tfidf.py:
    dedup-then-process over distinct texts, bucketed df attach, rep-level
    top-k expanded to docs via one bucketed hash join on text_md5).  The
    hash+dedup+tokenize prefix comes from the session-memoized
    tfidf.token_family, shared across the token-index queries."""
    rows, _, rep_tf = TF.token_family(sf_dir)
    return TF.tfidf_topk(None, rows=rows, rep_tf=rep_tf)


def q_posting_stats(sf_dir: str):
    """Inverted-index summary per token: document frequency, total term
    frequency, first posting (min doc_id) — exact, rep-weighted; shares
    the memoized token_family prefix."""
    _, _, rep_tf = TF.token_family(sf_dir)
    return TF.posting_stats(None, rep_tf=rep_tf)


def q_image_phash_dup(sf_dir: str):
    """Rows-only: perceptual-hash near-dup groups over REAL decoded synth
    images (byte-distinct re-renders collapse to one phash;
    stages/multimodal.image_phash_groups)."""
    from orthority_ray.stages.multimodal import image_phash_groups

    def sel(b):
        d = b["doc_id"].to_numpy(zero_copy_only=False)
        return b.filter(pa.array(d % 97 == 0))

    keys = read_page_keys(sf_dir).map_batches(sel, batch_format="pyarrow")
    return image_phash_groups(keys)


def q_token_cooccurrence(sf_dir: str):
    """Token pairs co-occurring in >= 2% of distinct docs (stages/tfidf.py:
    rep-level pair explosion weighted by doc count, one bucketed sum);
    shares the memoized token_family prefix."""
    _, reps, _ = TF.token_family(sf_dir)
    return TF.token_cooccurrence(None, reps=reps)


# weighted sampling shares the stratified sampler's hash spec — one
# constant so the two can never drift apart (r3 review)
_WS_HASH = _SAMPLE_H


def q_boolean_search(sf_dir: str):
    """Conjunctive keyword search: docs containing ALL of three terms
    (posting-list intersection at rep level + md5 expansion join);
    shares the memoized token_family prefix."""
    rows, _, rep_tf = TF.token_family(sf_dir)
    return TF.boolean_search(None, rows=rows, rep_tf=rep_tf)


def q_phrase_search(sf_dir: str):
    """Exact phrase occurrence counts per doc (rep-level count_substring +
    md5 expansion join); shares the memoized token_family prefix."""
    rows, reps, _ = TF.token_family(sf_dir)
    return TF.phrase_search(None, rows=rows, reps=reps)


def q_event_p95(sf_dir: str):
    """Exact p95 of event value cents per event type (grouped discrete
    quantile, stages/quantiles.grouped_median at q=0.95)."""
    from orthority_ray.pipelines.relational import _read, cents
    from orthority_ray.stages.quantiles import grouped_median

    ev = _read(sf_dir, "events", ["event_type", "value"])

    def prep(b):
        import numpy as np

        v = cents(b["value"].to_numpy(zero_copy_only=False))
        return pa.table({"event_type": b["event_type"], "v_cents": pa.array(v)})

    return grouped_median(
        ev.map_batches(prep, batch_format="pyarrow", batch_size=65536),
        "event_type", "v_cents", q=0.95)


def q_weighted_sample(sf_dir: str):
    """Deterministic quality-weighted Bernoulli sample (importance sampling
    for data mixing): keep a page iff hash(doc_id) * 1e6 < quality * 2^32 —
    inclusion probability = quality/1e6, no RNG, exact integer compare on
    both sides, mergeable across any partitioning."""
    import numpy as np

    def keep(b):
        d = b["doc_id"].to_numpy(zero_copy_only=False)
        q = b["quality"].to_numpy(zero_copy_only=False)
        h = (d * 2654435761) % 4294967296
        return b.filter(pa.array(h * 1_000_000 < q * 4294967296))

    return (
        T.quality(read_pages(sf_dir))
        .select_columns(["doc_id", "quality"])
        .map_batches(keep, batch_format="pyarrow", batch_size=65536)
    )


def q_media_features(sf_dir: str):
    """Rows-only: real multimodal decode + features (ORI1/ORA1/ORV1 raw
    codecs, stages/multimodal.py) over a deterministic 1/97 page sample."""
    from orthority_ray.stages.multimodal import media_features

    def sel(b):
        d = b["doc_id"].to_numpy(zero_copy_only=False)
        return b.filter(pa.array(d % 97 == 0))

    keys = read_page_keys(sf_dir).map_batches(sel, batch_format="pyarrow")
    return media_features(keys)


def q_hll_by_lang(sf_dir: str):
    """Per-lang approximate distinct doc_ids (grouped HLL — mergeable
    (group, register) maxima).  Oracle-EXACT since r4: the splitmix64
    registers and the dyadic-exact harmonic sum are mirrored in DuckDB
    (stages/sketches.sql_hll_grouped, core/sqlmirror)."""
    from orthority_ray.stages.sketches import hll_grouped

    return hll_grouped(
        read_pages(sf_dir, columns=["lang", "doc_id"]), "lang", "doc_id")


def q_hll_distinct(sf_dir: str):
    """HyperLogLog distinct doc_ids (~1.6% sketch, deterministic hash so
    the estimate is parallelism-invariant).  Oracle-EXACT since r4 via the
    sqlmirror splitmix64/register twin (sketches.sql_hll_distinct)."""
    from orthority_ray.stages.sketches import hll_distinct

    return hll_distinct(read_page_keys(sf_dir), "doc_id")


def q_text_features(sf_dir: str):
    return (
        T.text_features(read_pages(sf_dir, columns=["doc_id", "text"]))
        .select_columns(["doc_id", "n_tokens", "n_chars_x"])
    )


def q_quality(sf_dir: str):
    return T.quality(read_pages(sf_dir, columns=["doc_id", "text"])) \
        .select_columns(["doc_id", "quality"])


def q_rising_tokens(sf_dir: str):
    """Week-over-week fastest-growing tokens (stages/textstats.
    rising_tokens): exact integer growth ppm, token-bucketed lag pass,
    distributed grouped top-n per week.  Returns a typed DataFrame (the
    result is week-dimension x top-k bounded) so a corpus spanning < 2
    weeks yields an EMPTY frame with the oracle's schema instead of a
    schemaless empty Dataset."""
    import numpy as np
    import pandas as pd

    from orthority_ray.stages.textstats import rising_tokens

    out = rising_tokens(
        read_pages(sf_dir, columns=["doc_id", "text"])).to_pandas()
    cols = ["week", "token", "n", "prev_n", "growth_ppm", "rank"]
    if out.empty:
        return pd.DataFrame({
            "week": pd.Series(dtype=np.int64),
            "token": pd.Series(dtype=object),
            "n": pd.Series(dtype=np.int64),
            "prev_n": pd.Series(dtype=np.int64),
            "growth_ppm": pd.Series(dtype=np.int64),
            "rank": pd.Series(dtype=np.int64),
        })
    return out[cols]


def q_trending_tokens(sf_dir: str):
    """Per-crawl-day top tokens (stages/textstats.trending_tokens):
    block-combined (day, token) counts -> bucketed sum -> distributed
    grouped top-n."""
    from orthority_ray.stages.textstats import trending_tokens

    return trending_tokens(read_pages(sf_dir, columns=["doc_id", "text"]))


def q_host_cap(sf_dir: str, k: int = HOST_CAP_K):
    """Per-host document cap — the per-domain page limit every web-corpus
    curation pipeline applies before training: keep each host's top ``k``
    pages by (quality DESC, doc_id), emitting the in-host rank.  Composes
    the SQL-mirrored integer quality scorer with the distributed
    ``grouped_topn`` primitive (one co-partitioning exchange on host;
    selection is vectorized segment arithmetic inside each bucket)."""
    import pyarrow as pa

    from orthority_ray.sources.pages import N_HOSTS
    from orthority_ray.stages.windows import grouped_topn

    scored = T.quality(read_pages(sf_dir, columns=["doc_id", "text"]))

    def prep(b: pa.Table) -> pa.Table:
        doc = b["doc_id"].to_numpy(zero_copy_only=False)
        return pa.table({"doc_id": b["doc_id"],
                         "host": pa.array(doc % N_HOSTS),
                         "quality": b["quality"]})

    prepped = scored.map_batches(prep, batch_format="pyarrow",
                                 batch_size=65536)
    return grouped_topn(prepped, "host", ["quality", "doc_id"],
                        [False, True], k, ["doc_id", "host", "quality"],
                        rank_name="rn")


def q_hamming_neighbors(sf_dir: str):
    """Similarity JOIN: per-document count of Hamming-distance-1 doc-key
    neighbors via per-position deletion blocking (stages/editdist.py) —
    finds near-identical URLs without any quadratic pass."""
    return _hamming_neighbors(read_pages(sf_dir, columns=["doc_id"]))


def q_extract_verify(sf_dir: str):
    """(n_pages, n_bad): the byte-identical-extraction invariant as a query
    — one pass, per-batch partial counts summed."""
    import pandas as pd
    import pyarrow as pa
    import pyarrow.compute as pc

    from orthority_ray.stages.extract import extract_batch

    def counts(batch: pa.Table) -> pa.Table:
        b = extract_batch(batch)
        ok = pc.sum(pc.equal(b["extracted_text"], b["text"])).as_py() or 0
        return pa.table(
            {
                "n_pages": pa.array([b.num_rows], pa.int64()),
                "n_bad": pa.array([b.num_rows - ok], pa.int64()),
            }
        )

    parts = read_pages(sf_dir, columns=["html", "text"]).map_batches(
        counts, batch_format="pyarrow").to_pandas()
    return pd.DataFrame(
        {"n_pages": [int(parts["n_pages"].sum())], "n_bad": [int(parts["n_bad"].sum())]}
    )


def q_ann(sf_dir: str):
    return ANN.ann_bruteforce(sf_dir)


def q_embedding_neardup(sf_dir: str):
    return ANN.embedding_neardup(sf_dir, threshold=0.45)


def q_embedding_neardup_blockpair(sf_dir: str):
    """Same exact output via the block-cartesian raw-task pattern (no
    full-matrix broadcast; per-worker memory O(block), see ann.py)."""
    return ANN.embedding_neardup_blockpair(sf_dir, threshold=0.45)


def q_cell_stats(sf_dir: str):
    """Per-cell count + coordinate sums.  Sums are over the INTEGER milli
    coordinates, so they are order-insensitive and bit-exact on both sides
    (floor-scaled float means/variances sit within float error of grid
    boundaries because lat/lon are exact milli multiples — observed flaky;
    the float moments kernel is exposed in the rows-only ``cell_covariance``
    query and verified with tolerances in tests/test_stats_sharpen.py)."""
    import pyarrow as pa

    from orthority_ray.pipelines.relational import combined_groupby_sum

    renamed = _geo(sf_dir).map_batches(
        lambda b: pa.table({"cell": b["cell"], "sum_lon_milli": b["lon_milli"],
                            "sum_lat_milli": b["lat_milli"]}),
        batch_format="pyarrow", batch_size=None,
    )
    return combined_groupby_sum(renamed, ["cell"],
                                ["sum_lon_milli", "sum_lat_milli"], count_alias="n")


def q_cell_covariance(sf_dir: str):
    return grouped_covariance(_geo(sf_dir), "cell", ["lon", "lat"])


def q_cell_cov_exact(sf_dir: str):
    """Per-cell covariance/variance NUMERATORS as exact integers — the
    oracle-exact twin of the float ``cell_covariance`` moments:
    cov_num = n*Sxy - Sx*Sy and var_lon_num = n*Sxx - Sx^2 over the milli
    coordinates (both equal n^2 * the population (co)variance).  Per-block
    combiner sums (n, sx, sy, sxy, sxx) — all order-insensitive int64 —
    then one dimension-sized groupby; the final cross-multiplication runs
    under an explicit int64 envelope with a Python big-int fallback (the
    per-cell table is dimension-sized, so the fallback costs nothing)."""
    import numpy as np
    import pandas as pd
    import pyarrow as pa

    from orthority_ray.pipelines.relational import combined_groupby_sum

    def partial(b: pa.Table) -> pa.Table:
        x = b["lon_milli"].to_numpy(zero_copy_only=False).astype(np.int64)
        y = b["lat_milli"].to_numpy(zero_copy_only=False).astype(np.int64)
        df = pd.DataFrame({"cell": b["cell"].to_numpy(zero_copy_only=False),
                           "n": np.ones(x.shape[0], np.int64),
                           "sx": x, "sy": y, "sxy": x * y, "sxx": x * x})
        return pa.Table.from_pandas(
            df.groupby("cell", as_index=False).sum(), preserve_index=False)

    sums = _geo(sf_dir).map_batches(partial, batch_format="pyarrow",
                                    batch_size=65536)
    per_cell = combined_groupby_sum(sums, ["cell"],
                                    ["n", "sx", "sy", "sxy", "sxx"])

    def finish(b: pa.Table) -> pa.Table:
        n = b["n"].to_numpy(zero_copy_only=False)
        sx = b["sx"].to_numpy(zero_copy_only=False)
        sy = b["sy"].to_numpy(zero_copy_only=False)
        sxy = b["sxy"].to_numpy(zero_copy_only=False)
        sxx = b["sxx"].to_numpy(zero_copy_only=False)
        lim = 2 ** 62
        ok = ((np.abs(n) < lim // np.maximum(np.abs(sxy), 1)).all()
              and (np.abs(sx) < lim // np.maximum(np.abs(sy), 1)).all()
              and (np.abs(n) < lim // np.maximum(np.abs(sxx), 1)).all()
              and (np.abs(sx) < lim // np.maximum(np.abs(sx), 1)).all())
        if ok:
            cov = n * sxy - sx * sy
            var = n * sxx - sx * sx
        else:  # exact big-int fallback, dimension-sized
            cov = np.fromiter((int(a) * int(bb) - int(c) * int(d)
                               for a, bb, c, d in zip(n, sxy, sx, sy)),
                              dtype=np.int64, count=n.shape[0])
            var = np.fromiter((int(a) * int(bb) - int(c) * int(c)
                               for a, bb, c in zip(n, sxx, sx)),
                              dtype=np.int64, count=n.shape[0])
        return pa.table({"cell": b["cell"], "n": b["n"],
                         "cov_num": pa.array(cov),
                         "var_lon_num": pa.array(var)})

    return per_cell.map_batches(finish, batch_format="pyarrow")


QUANTS = (0.25, 0.5, 0.75, 0.9, 0.99)


def q_cell_median(sf_dir: str):
    """A2: exact per-cell discrete median (grouped-quantile operator)."""
    from orthority_ray.stages.quantiles import grouped_median

    return grouped_median(_geo(sf_dir).select_columns(["cell", "lat_milli"]),
                          "cell", "lat_milli")


def q_quantiles_exact(sf_dir: str):
    """A2: exact global quantiles of an int column via the distributed
    histogram (count-then-select)."""
    from orthority_ray.stages.quantiles import exact_quantiles_int

    return exact_quantiles_int(_geo(sf_dir), "lon_milli", QUANTS)


def q_quantiles_sketch(sf_dir: str):
    """A2: mergeable KLL-style sketch for unbounded columns (rows-only;
    tolerance-tested vs numpy in tests/test_quantiles.py)."""
    from orthority_ray.stages.quantiles import sketch_quantiles

    return sketch_quantiles(_geo(sf_dir), "lon", QUANTS)


# --- non-SQL-expressible (rows-only checks) ---------------------------------


def q_remap_checker(sf_dir: str):
    from orthority_ray.stages.remap import remap_checker_table

    return remap_checker_table(read_page_keys(sf_dir))


def q_auto_utm(sf_dir: str):
    """A4 analog: mean position -> UTM zone, via exact integer milli sums
    (the distributed ds.mean-then-broadcast aggregate, integer-safe)."""
    import pandas as pd
    from ray.data.aggregate import Count, Sum

    agg = (
        _geo(sf_dir)
        .select_columns(["lon_milli", "lat_milli"])
        .groupby(None)
        .aggregate(
            Count(alias_name="n"),
            Sum("lon_milli", alias_name="s_lon"),
            Sum("lat_milli", alias_name="s_lat"),
        )
        .to_pandas()
    )
    n = int(agg["n"].iloc[0])
    mean_lon_milli = int(agg["s_lon"].iloc[0]) // n
    mean_lat_milli = int(agg["s_lat"].iloc[0]) // n
    zone = (mean_lon_milli // 6000) % 60 + 1
    epsg = (32600 if mean_lat_milli >= 85_000 else 32700) + zone
    return pd.DataFrame({"n": [n], "mean_lon_milli": [mean_lon_milli],
                         "mean_lat_milli": [mean_lat_milli], "epsg": [epsg]})


def q_overview_coarse(sf_dir: str):
    """Overview pyramid top level as a query: per-cell counts re-aggregated
    at the 8-degree resolution (stages/overviews.py ladder)."""
    from orthority_ray.stages.overviews import overview_pyramid

    pyr = overview_pyramid(_geo(sf_dir))
    return pyr[8000]


def q_site_skew(sf_dir: str):
    """The Zipf concentration as a query: doc counts per site band
    (hot 0-9 / mid 10-99 / tail), integer-exact via the shared hash spec."""
    import numpy as np
    import pyarrow as pa
    from ray.data.aggregate import Sum

    from orthority_ray.core import hashing as H

    def bands(batch: pa.Table) -> pa.Table:
        doc_id = batch["doc_id"].to_numpy(zero_copy_only=False)
        h1, _ = H.doc_hashes(doc_id)
        site = H.site_of(h1)
        band = np.where(site < 10, 0, np.where(site < 100, 1, 2))
        b, n = np.unique(band, return_counts=True)
        return pa.table({"band": pa.array(b.astype(np.int64)),
                         "n_docs": pa.array(n.astype(np.int64))})

    return (
        read_page_keys(sf_dir)
        .map_batches(bands, batch_format="pyarrow", batch_size=65536)
        .groupby("band")
        .aggregate(Sum("n_docs", alias_name="n_docs"))
    )


def q_metadata(sf_dir: str):
    from orthority_ray.stages.metadata import extract_metadata

    return extract_metadata(read_pages(sf_dir))


def q_gcp_refine(sf_dir: str):
    import ray.data as rd

    from orthority_ray.sources.param_io import RPC
    from orthority_ray.stages.refine import make_gcp_table, refine_rpc_grouped

    return refine_rpc_grouped(rd.from_pandas(make_gcp_table(RPC)), RPC, "shift")


def q_calibrate(sf_dir: str):
    import ray.data as rd

    from orthority_ray.stages.fit import calibrate_grouped, calibration_frames

    return calibrate_grouped(rd.from_pandas(calibration_frames()))


def q_dem_geocode(sf_dir: str):
    return dem_geocode(read_page_keys(sf_dir)).select_columns(
        ["doc_id", "wx", "wy", "wz"]
    )


def q_minhash_pairs(sf_dir: str):
    """LSH candidate pairs over the exact-dedup representatives — served
    from the session-memoized chain prefix (dedup.neardup_candidates),
    shared with dup_clusters / split_leakage_neardup so exact-dedup +
    MinHash run once per bench/driver session."""
    _, pairs = D.neardup_candidates(sf_dir)
    return pairs


def q_dup_clusters(sf_dir: str):
    """Full near-dup pipeline, end-to-end as Datasets (no driver collects,
    no whole-corpus broadcast — VERDICT r1 #4): exact-dedup reps -> MinHash-
    LSH candidates -> Jaccard verify via co-partitioned hash joins ->
    distributed connected components (min-label propagation).  The
    reps/verified prefix comes from the session-memoized
    dedup.neardup_family, shared with split_leakage_neardup (r3 verdict #1)."""
    _, verified = D.neardup_family(sf_dir, threshold=0.8)
    if verified is None:
        import pandas as pd

        return pd.DataFrame({"doc_id": [], "component": []}).astype("int64")
    return D.connected_components(verified.select_columns(["doc_a", "doc_b"]))


def q_simhash_buckets(sf_dir: str):
    return D.simhash_buckets(read_pages(sf_dir))


def q_training_prep(sf_dir: str):
    """End-to-end training-data prep (pipelines/training_prep.py): quality
    filter -> exact dedup (min-doc rep per text) -> decontamination (drop
    reps sharing any 32-char window with the benchmark set) -> per-doc
    token/char manifest.  ONE oracle covers the whole composition."""
    from orthority_ray.pipelines.training_prep import training_prep

    return training_prep(sf_dir)


def q_cms_user_counts(sf_dir: str):
    """Count-min sketch over the events user_id stream (oracle-EXACT
    since r4: counters are plain GROUP-BY counts under the sqlmirror
    splitmix64 index twin — sketches.sql_cms_user_counts)
    (stages/sketches.cms_sketch — additive (depth x width) counters merged
    by elementwise sum, never data-sized), point-estimating every 10th
    user's event count.  Estimates are deterministic overcounts; the
    eps*N bound is pinned in tests/test_sketches.py."""
    import numpy as _np
    import pandas as _pd
    import pyarrow as _pa

    from orthority_ray.stages.sketches import cms_estimate, cms_sketch

    ev = R._read(sf_dir, "events", ["user_id"])
    sk = cms_sketch(ev, "user_id")

    def probe_users(b):
        u = _np.unique(b["user_id"].to_numpy(zero_copy_only=False))
        return _pa.table({"u": _pa.array(u[u % 10 == 0])})

    parts = ev.map_batches(probe_users, batch_format="pyarrow",
                           batch_size=65536).take_all()
    users = _np.unique(_np.array([r["u"] for r in parts], dtype=_np.int64))
    return _pd.DataFrame({"user_id": users,
                          "est_events": cms_estimate(sk, users)})


def q_host_stats(sf_dir: str):
    """Per-host rollup with exact distinct-path counts (stages/urlstats.py:
    Arrow URL parse -> per-block (host, path) combiner -> one host-bucket
    shuffle)."""
    from orthority_ray.stages.urlstats import host_stats

    return host_stats(read_pages(sf_dir, columns=["url", "doc_id"]))


def q_host_page_join(sf_dir: str):
    """Every page joined to its host's page count through the ADAPTIVE hash
    join (stages/hashjoin.plan_hash_join): bucket count sized from a sampled
    key histogram and hot keys salted across sub-buckets — the skew-safe
    join path (r2 verdict weak-for-scale #3).  The host key is a string, so
    this also drives the FNV buffer-hash bucketing through the driver."""
    import pyarrow as _pa

    from orthority_ray.stages.hashjoin import adaptive_hash_join
    from orthority_ray.stages.urlstats import parse_urls

    pages = parse_urls(
        read_pages(sf_dir, columns=["url", "doc_id"])
    ).select_columns(["doc_id", "host"])
    per_host = R.combined_groupby_sum(pages, ["host"], [],
                                      count_alias="host_pages")
    return adaptive_hash_join(
        pages, per_host, "host", ["host", "doc_id"], ["host", "host_pages"],
        types={"doc_id": _pa.int64(), "host_pages": _pa.int64()},
        target_bucket_rows=500_000, fraction=0.05,
        # the right side is a per-host aggregate: dimension-sized by
        # construction (PageSynth's 1000-host URL space), so skip the
        # planner's right-side sampling pass (it would execute the whole
        # aggregate pipeline once just to learn ~1000)
        right_total=1000,
        # FORCE the salted-shuffle path: with the default threshold the
        # dimension-sized right side short-circuits to broadcast_join and
        # the skew plan this query exists to pin would have NO oracle
        # coverage; the broadcast strategy gets its own oracle row below
        broadcast_threshold_rows=0,
    )


def q_host_page_join_broadcast(sf_dir: str):
    """Same join, same oracle — through the BROADCAST strategy (the
    adaptive join's small-side short circuit), so both execution paths
    are pinned by the value-hash gate."""
    from orthority_ray.stages.hashjoin import broadcast_join
    from orthority_ray.stages.urlstats import parse_urls

    pages = parse_urls(
        read_pages(sf_dir, columns=["url", "doc_id"])
    ).select_columns(["doc_id", "host"])
    per_host = R.combined_groupby_sum(pages, ["host"], [],
                                      count_alias="host_pages")
    return broadcast_join(pages, per_host, "host",
                          ["host", "doc_id"], ["host", "host_pages"])


SQL_HOST_PAGE_JOIN = """
, hp AS (
  SELECT split_part(split_part(url, '//', 2), '/', 1) AS host,
         CAST(COUNT(*) AS BIGINT) AS host_pages
  FROM pages GROUP BY 1
)
SELECT p.doc_id, split_part(split_part(p.url, '//', 2), '/', 1) AS host, h.host_pages
FROM pages p JOIN hp h ON split_part(split_part(p.url, '//', 2), '/', 1) = h.host
""".strip()


def q_repetition_stats(sf_dir: str):
    """Gopher-style repetition filter inputs per page (max token
    multiplicity, duplicate-bigram counts) — stages/textstats.py
    RepetitionStats, vectorized over the flat token buffer."""
    return T.repetition_stats(read_pages(sf_dir))


def q_url_redact(sf_dir: str):
    """Regex redaction over urls (RE2 on both sides; byte-exact string
    compare) — stages/urlstats.redact_urls."""
    from orthority_ray.stages.urlstats import redact_urls

    return redact_urls(read_pages(sf_dir, columns=["url", "doc_id"]))


def q_text_normalize(sf_dir: str):
    """Text normalization for LLM-pipeline preprocessing: lowercase +
    whitespace-run collapse + trim, all Arrow RE2/utf8 kernels (zero Python
    per row); DuckDB runs the identical RE2 pattern so the normalized
    STRINGS are compared byte-exactly by the driver."""
    import pyarrow as _pa
    import pyarrow.compute as _pc

    def fn(b):
        t = b["text"].combine_chunks()
        # trim with an ASCII-space regex, NOT utf8_trim_whitespace: the
        # oracle's trim() strips only ' ', while Arrow's kernel strips all
        # Unicode whitespace — e.g. \x0b or NBSP survive RE2's \s collapse
        # and would diverge byte-wise on non-ASCII edge whitespace
        norm = _pc.replace_substring_regex(
            _pc.replace_substring_regex(_pc.utf8_lower(t), r"\s+", " "),
            r"^ +| +$", "",
        )
        return _pa.table(
            {
                "doc_id": b["doc_id"],
                "norm_text": norm,
                "norm_chars": _pc.cast(_pc.utf8_length(norm), _pa.int64()),
            }
        )

    return read_pages(sf_dir, columns=["text", "doc_id"]).map_batches(
        fn, batch_format="pyarrow", batch_size=None
    )


SQL_TEXT_NORMALIZE = r"""
SELECT doc_id,
       trim(regexp_replace(lower(text), '\s+', ' ', 'g')) AS norm_text,
       CAST(length(trim(regexp_replace(lower(text), '\s+', ' ', 'g'))) AS BIGINT) AS norm_chars
FROM pages
""".strip()


def q_edit_distance(sf_dir: str):
    """Exact Levenshtein distance between consecutive documents — the
    batch-vectorized min-plus-scan DP (stages/editdist.py): a self
    hash-join on doc_id+1 co-locates pairs, then L1 vectorized kernels per
    batch, no Python per cell; oracle is DuckDB's levenshtein()."""
    from orthority_ray.pipelines.relational import _read
    from orthority_ray.stages.editdist import adjacent_doc_distances

    return adjacent_doc_distances(_read(sf_dir, "documents", ["doc_id", "text"]))


def q_bpe_encode(sf_dir: str):
    """Rows-only: TRAIN the BPE merge table, then ENCODE every page with it
    (stages/bpe.bpe_encode) — per-doc word and BPE-token counts via a
    per-worker distinct-word cache (vocab-cost encode, not stream-cost).
    Completes the tokenizer story: bpe_train learns, this applies."""
    from orthority_ray.stages.bpe import bpe_encode

    return bpe_encode(sf_dir)


def q_doc_typicality(sf_dir: str):
    """Train-then-score: exact corpus token frequencies fitted in one pass,
    broadcast, then every page scored (sum + min of its tokens' corpus
    counts) — stages/textstats.doc_typicality."""
    return T.doc_typicality(read_pages(sf_dir, columns=["text", "doc_id"]))


def q_lang_id(sf_dir: str):
    return T.lang_id(read_pages(sf_dir, columns=["doc_id", "lang", "text"])) \
        .select_columns(["doc_id", "lang", "lang_pred"])


def q_ann_lsh(sf_dir: str):
    return ANN.ann_lsh(sf_dir)


def q_embedding_neardup_lsh(sf_dir: str):
    return ANN.embedding_neardup_lsh(sf_dir, threshold=0.45)


def q_ann_ivf(sf_dir: str):
    return ANN.ann_ivf(sf_dir)


def q_pan_sharpen(sf_dir: str):
    return pan_sharpen(_geo(sf_dir)).select_columns(
        ["doc_id", "sharp_ms0", "sharp_ms1", "sharp_ms2"]
    )


# ---------------------------------------------------------------------------


# Oracle-checked queries WITHOUT a CORRECTNESS_r02 row yet (judge-verified
# in-repo only) — listed first so a prefix-sampling driver covers them in
# round 3 (VERDICT r2 "Next round" #6).  Names/SQL are unchanged.
_DRIVER_UNCHECKED_FIRST = [
    "minhash_pairs", "simhash_buckets", "dup_clusters",
    "split_leakage_neardup", "hll_distinct", "hll_by_lang",
    "cms_user_counts",
    "host_page_join", "parts_by_brand", "priority_revenue", "revenue_forecast",
    "shipping_priority", "returned_customers", "promo_revenue", "top_supplier",
    "small_qty_revenue", "brand_volume", "sales_opportunity", "nation_volume",
    "local_volume", "market_share", "pushdown_revenue", "ngram_jaccard",
    "span_dedup", "contamination", "tfidf_topk", "posting_stats",
    "token_cooccurrence", "boolean_search", "phrase_search", "event_p95",
    "weighted_sample", "bloom_semijoin", "incremental_dedup", "remap_checker",
    "metadata", "site_skew", "supplier_balance", "docs_by_lang",
    "overview_coarse", "auto_utm", "daily_activity", "text_normalize",
    "customer_ntile", "edit_distance", "training_prep",
    "waiting_suppliers", "late_shipments", "nation_profit", "event_pivot",
    "first_touch", "events_cube",
    "important_parts", "excess_suppliers", "min_bal_supplier",
    "events_moving_sum", "user_event_path", "user_top_event",
    "doc_chunks", "bigram_top",
    "bigram_coverage", "token_fertility", "latest_events",
    "dedup_keep_best", "repeat_buyers", "order_share", "cell_cov_exact",
    "events_weekly", "lang_chars_median_cont", "ann_filtered",
    "dup_rate_hourly", "training_shuffle", "host_page_join_broadcast",
    "value_gini", "lexical_diversity", "oov_rate", "event_mad", "weighted_median", "fk_orphans", "table_profile",
    "paragraph_dedup", "cross_host_dup", "token_budget_mix", "vocab_growth",
    "syndication_graph", "host_rank", "template_detect", "host_components",
    "split_assign", "split_leakage", "value_deciles",
    "trimmed_mean", "rolling_active_users", "event_intervals", "host_cap",
    "interval_coverage", "hamming_neighbors", "host_distance",
    "supplier_cooccurrence", "value_cdf", "pareto_orders", "id_gaps",
    "time_weighted_value", "top_paths", "trending_tokens", "skew_report",
    "conversion_latency", "value_trend", "events_rolling_median",
    "user_streaks", "interarrival_quantiles", "cooccurrence_lift",
    "power_users", "label_embedding_sums", "ncm_confusion", "rising_tokens",
]


def queries() -> dict[str, Callable[[str], Any]]:
    q = _queries_registry()
    # a typo'd prefix name must fail loudly, not silently drop out of the
    # driver's priority sample (r3 review)
    missing = [k for k in _DRIVER_UNCHECKED_FIRST if k not in q]
    if missing:
        raise KeyError(f"_DRIVER_UNCHECKED_FIRST names not in registry: {missing}")
    return {**{k: q[k] for k in _DRIVER_UNCHECKED_FIRST}, **q}


def _queries_registry() -> dict[str, Callable[[str], Any]]:
    return {
        "cell_counts": q_cell_counts,
        "hot_cells_ranked": q_hot_cells_ranked,
        "tile_assign": q_tile_assign,
        "pip_join": q_pip_join,
        "knn": q_knn,
        "knn_cellring": q_knn_cellring,
        "geocode_pinhole": q_geocode_pinhole,
        "exact_dedup": q_exact_dedup,
        "heavy_hitters": q_heavy_hitters,
        "vocabulary": q_vocabulary,
        "bpe_tokens": q_bpe_tokens,
        "stratified_sample": q_stratified_sample,
        "text_features": q_text_features,
        "lexical_diversity": q_lexical_diversity,
        "oov_rate": q_oov_rate,
        "event_mad": q_event_mad,
        "weighted_median": q_weighted_median,
        "fk_orphans": q_fk_orphans,
        "table_profile": q_table_profile,
        "paragraph_dedup": q_paragraph_dedup,
        "cross_host_dup": q_cross_host_dup,
        "syndication_graph": q_syndication_graph,
        "host_rank": q_host_rank,
        "host_components": q_host_components,
        "host_distance": q_host_distance,
        "template_detect": q_template_detect,
        "split_assign": q_split_assign,
        "split_leakage": q_split_leakage,
        "value_deciles": q_value_deciles,
        "split_leakage_neardup": q_split_leakage_neardup,
        "token_budget_mix": q_token_budget_mix,
        "vocab_growth": q_vocab_growth,
        "compression_ratio": q_compression_ratio,
        "quality": q_quality,
        "host_cap": q_host_cap,
        "host_stats": q_host_stats,
        "host_page_join": q_host_page_join,
        "host_page_join_broadcast": q_host_page_join_broadcast,
        "training_prep": q_training_prep,
        "cms_user_counts": q_cms_user_counts,
        "repetition_stats": q_repetition_stats,
        "url_redact": q_url_redact,
        "text_normalize": q_text_normalize,
        "edit_distance": q_edit_distance,
        "bpe_encode": q_bpe_encode,
        "doc_typicality": q_doc_typicality,
        "extract_verify": q_extract_verify,
        "ann": q_ann,
        "embedding_neardup": q_embedding_neardup,
        "embedding_neardup_blockpair": q_embedding_neardup_blockpair,
        "cell_stats": q_cell_stats,
        "cell_median": q_cell_median,
        "quantiles_exact": q_quantiles_exact,
        "pricing_summary": R.q_pricing_summary,
        "rollup_revenue": R.q_rollup_revenue,
        "value_histogram": R.q_value_histogram,
        "funnel": R.q_funnel,
        "props_stats": R.q_props_stats,
        "retention": R.q_retention,
        "event_outliers": R.q_event_outliers,
        "top_supplier_by_nation": R.q_top_supplier_by_nation,
        "table_diff": TD.table_diff,
        "customers_per_region": R.q_customers_per_region,
        "top_orders": R.q_top_orders,
        "events_hourly": R.q_events_hourly,
        "daily_activity": R.q_daily_activity,
        "customer_ntile": R.q_customer_ntile,
        "events_sliding": R.q_events_sliding,
        "event_sessions": R.q_event_sessions,
        "events_asof": R.q_events_asof,
        "events_window_join": R.q_events_window_join,
        "events_lag_delta": R.q_events_lag_delta,
        "events_running_total": R.q_events_running_total,
        "orders_rank": R.q_orders_rank,
        "big_orders": R.q_big_orders,
        "customers_no_urgent": R.q_customers_no_urgent,
        "priority_check": R.q_priority_check,
        "custdist": R.q_custdist,
        "brand_suppliers": R.q_brand_suppliers,
        "lang_chars_median": R.q_lang_chars_median,
        "lang_chars_median_cont": R.q_lang_chars_median_cont,
        "parts_by_brand": R.q_parts_by_brand,
        "priority_revenue": R.q_priority_revenue,
        "revenue_forecast": TX.q_revenue_forecast,
        "shipping_priority": TX.q_shipping_priority,
        "returned_customers": TX.q_returned_customers,
        "promo_revenue": TX.q_promo_revenue,
        "top_supplier": TX.q_top_supplier,
        "small_qty_revenue": TX.q_small_qty_revenue,
        "brand_volume": TX.q_brand_volume,
        "sales_opportunity": TX.q_sales_opportunity,
        "nation_volume": TX.q_nation_volume,
        "local_volume": TX.q_local_volume,
        "market_share": TX.q_market_share,
        "pushdown_revenue": TX.q_pushdown_revenue,
        "waiting_suppliers": TM.q_waiting_suppliers,
        "late_shipments": TM.q_late_shipments,
        "nation_profit": TM.q_nation_profit,
        "event_pivot": TM.q_event_pivot,
        "important_parts": TL.q_important_parts,
        "excess_suppliers": TL.q_excess_suppliers,
        "min_bal_supplier": TL.q_min_bal_supplier,
        "supplier_cooccurrence": TL.q_supplier_cooccurrence,
        "cooccurrence_lift": TL.q_cooccurrence_lift,
        "pareto_orders": TL.q_pareto_orders,
        "id_gaps": q_id_gaps,
        "skew_report": q_skew_report,
        "events_moving_sum": EV.q_events_moving_sum,
        "user_event_path": EV.q_user_event_path,
        "user_top_event": EV.q_user_top_event,
        "trimmed_mean": EV.q_trimmed_mean,
        "rolling_active_users": EV.q_rolling_active_users,
        "event_intervals": EV.q_event_intervals,
        "interval_coverage": EV.q_interval_coverage,
        "value_cdf": EV.q_value_cdf,
        "time_weighted_value": EV.q_time_weighted_value,
        "top_paths": EV.q_top_paths,
        "trending_tokens": q_trending_tokens,
        "rising_tokens": q_rising_tokens,
        "conversion_latency": EV.q_conversion_latency,
        "value_trend": EV.q_value_trend,
        "events_rolling_median": EV.q_events_rolling_median,
        "user_streaks": EV.q_user_streaks,
        "interarrival_quantiles": EV.q_interarrival_quantiles,
        "power_users": EV.q_power_users,
        "label_embedding_sums": q_label_embedding_sums,
        "ncm_confusion": q_ncm_confusion,
        "hamming_neighbors": q_hamming_neighbors,
        "doc_chunks": CH.doc_chunks,
        "bigram_top": CH.bigram_top,
        "bigram_coverage": CH.bigram_coverage,
        "token_fertility": CH.token_fertility,
        "latest_events": EV.q_latest_events,
        "dedup_keep_best": lambda sf: D.dedup_keep_best(read_pages(sf)),
        "dup_rate_hourly": lambda sf: D.dup_rate_hourly(read_pages(sf)),
        "repeat_buyers": TL.q_repeat_buyers,
        "cell_cov_exact": q_cell_cov_exact,
        "events_weekly": EV.q_events_weekly,
        "value_gini": EV.q_value_gini,
        "order_share": TL.q_order_share,
        "first_touch": TM.q_first_touch,
        "events_cube": TM.q_events_cube,
        "ngram_jaccard": NG.ngram_jaccard_pairs,
        "span_dedup": SD.span_dedup,
        "contamination": SD.contamination,
        "tfidf_topk": q_tfidf_topk,
        "posting_stats": q_posting_stats,
        "token_cooccurrence": q_token_cooccurrence,
        "boolean_search": q_boolean_search,
        "phrase_search": q_phrase_search,
        "weighted_sample": q_weighted_sample,
        "event_p95": q_event_p95,
        "bloom_semijoin": BL.bloom_semijoin,
        "embedding_kmeans": KM.embedding_kmeans,
        "incremental_dedup": DI.incremental_dedup,
        "bpe_train": BP.bpe_train,
        "sequence_pack": PK.sequence_pack,
        "training_shuffle": PK.training_shuffle,
        "image_phash_dup": q_image_phash_dup,
        "ann_int8": ANN.ann_int8,
        "ann_pq": ANN.ann_pq,
        "ann_filtered": ANN.ann_filtered,
        "remap_checker": q_remap_checker,
        "auto_utm": q_auto_utm,
        "metadata": q_metadata,
        "site_skew": q_site_skew,
        "supplier_balance": R.q_supplier_balance,
        "docs_by_lang": R.q_docs_by_lang,
        "overview_coarse": q_overview_coarse,
        # non-SQL-expressible (driver records rows-only checks):
        "gcp_refine": q_gcp_refine,
        "calibrate": q_calibrate,
        "cell_covariance": q_cell_covariance,
        "dem_geocode": q_dem_geocode,
        "quantiles_sketch": q_quantiles_sketch,
        "minhash_pairs": q_minhash_pairs,
        "dup_clusters": q_dup_clusters,
        "simhash_buckets": q_simhash_buckets,
        "lang_id": q_lang_id,
        "ann_lsh": q_ann_lsh,
        "ann_ivf": q_ann_ivf,
        "embedding_neardup_lsh": q_embedding_neardup_lsh,
        "hll_distinct": q_hll_distinct,
        "hll_by_lang": q_hll_by_lang,
        "media_features": q_media_features,
        "pan_sharpen": q_pan_sharpen,
    }


def oracle_sql() -> dict[str, str]:
    rings = make_tile_rings()
    pip_union = " UNION ALL ".join(
        f"SELECT doc_id, CAST({t} AS BIGINT) AS tile_id, cell FROM geod "
        f"WHERE {sql_pip_predicate(rings[t])}"
        for t in range(rings.shape[0])
    )
    return {
        "cell_counts": S.with_geo(
            "SELECT cell, COUNT(*) AS n_docs FROM geod GROUP BY cell"
        ),
        "hot_cells_ranked": S.with_geo(SQL_HOT_CELLS_RANKED),
        "tile_assign": S.with_geo(SQL_ASSIGN.format(n_tiles=N_ASSIGN_TILES)),
        "pip_join": S.with_geo(f"SELECT * FROM ({pip_union})"),
        "knn": S.with_geo(KNN.SQL_KNN),
        "knn_cellring": S.with_geo(KNN.SQL_KNN),
        "geocode_pinhole": S.with_pages(sql_pinhole_geocode()),
        "exact_dedup": S.with_pages(D.SQL_EXACT_DEDUP_GROUPS),
        "heavy_hitters": S.with_pages(
            """SELECT c.text_md5, c.n_items
               FROM (SELECT md5(text) AS text_md5, COUNT(*) AS n_items
                     FROM pages GROUP BY 1) c,
                    (SELECT COUNT(*) AS n FROM pages) t
               WHERE c.n_items * 600 > t.n"""
        ),
        "vocabulary": S.with_pages(
            r"""SELECT c.token, c.n_tok
               FROM (SELECT token, COUNT(*) AS n_tok
                     FROM (SELECT unnest(string_split_regex(text, '\s+')) AS token
                           FROM pages)
                     WHERE token <> '' GROUP BY 1) c,
                    (SELECT COUNT(*) AS n
                     FROM (SELECT unnest(string_split_regex(text, '\s+')) AS token
                           FROM pages)
                     WHERE token <> '') t
               WHERE c.n_tok * 30 > t.n"""
        ),
        "stratified_sample": S.with_pages(SQL_STRATIFIED_SAMPLE),
        "bpe_tokens": S.with_pages(T.SQL_BPE_TOKENS),
        "text_features": S.with_pages(T.SQL_TEXT_FEATURES),
        "lexical_diversity": S.with_pages(LX.SQL_LEXICAL_DIVERSITY),
        "oov_rate": S.with_pages(LX.sql_oov_rate()),
        "quality": S.with_pages(T.SQL_QUALITY),
        "host_cap": S.with_pages(f"""
SELECT doc_id, host, quality, rn FROM (
  SELECT doc_id, doc_id % {_N_HOSTS} AS host,
         {T.SQL_QUALITY_EXPR} AS quality,
         CAST(row_number() OVER (PARTITION BY doc_id % {_N_HOSTS}
                ORDER BY {T.SQL_QUALITY_EXPR} DESC, doc_id) AS BIGINT) AS rn
  FROM pages)
WHERE rn <= {HOST_CAP_K}"""),
        # r4: integer trigram-vote classifier mirrored exactly (profile
        # grams interpolated as a VALUES table; textstats.sql_lang_id)
        "lang_id": S.with_pages(T.sql_lang_id()),
        "host_stats": S.with_pages(_SQL_HOST_STATS),
        "host_page_join": S.with_pages(SQL_HOST_PAGE_JOIN),
        "host_page_join_broadcast": S.with_pages(SQL_HOST_PAGE_JOIN),
        "training_prep": S.with_pages(sql_training_prep()),
        "repetition_stats": S.with_pages(T.SQL_REPETITION),
        "url_redact": S.with_pages(_SQL_URL_REDACT),
        "text_normalize": S.with_pages(SQL_TEXT_NORMALIZE),
        "edit_distance": SQL_EDIT_DISTANCE,
        "doc_typicality": S.with_pages(T.SQL_TYPICALITY),
        "extract_verify": S.with_pages(
            "SELECT COUNT(*) AS n_pages, CAST(0 AS BIGINT) AS n_bad FROM pages"
        ),
        "ann": ANN.SQL_ANN,
        # r4: int8 quantized ANN mirrored to the bit (numpy unroll-8 norm
        # association + round_even + integer dot; ann.sql_ann_int8)
        "ann_int8": ANN.sql_ann_int8(),
        "embedding_neardup": ANN.sql_embedding_neardup(0.45),
        "ann_filtered": ANN.SQL_ANN_FILTERED,
        "dup_rate_hourly": S.with_pages(D.SQL_DUP_RATE_HOURLY),
        "training_shuffle": PK.sql_training_shuffle(),
        "embedding_neardup_blockpair": ANN.sql_embedding_neardup(0.45),
        "cell_stats": S.with_geo(
            """SELECT cell, COUNT(*) AS n,
                 CAST(SUM(lon_milli) AS BIGINT) AS sum_lon_milli,
                 CAST(SUM(lat_milli) AS BIGINT) AS sum_lat_milli
               FROM geod GROUP BY cell"""
        ),
        "cell_median": S.with_geo(sql_grouped_median("cell", "lat_milli", "geod")),
        "quantiles_exact": S.with_geo(sql_exact_quantiles("lon_milli", "geod", QUANTS)),
        "pricing_summary": R.SQL_PRICING,
        "rollup_revenue": R.SQL_ROLLUP_REVENUE,
        "value_histogram": R.SQL_VALUE_HISTOGRAM,
        "funnel": R.SQL_FUNNEL,
        "props_stats": R.SQL_PROPS_STATS,
        "retention": R.SQL_RETENTION,
        "event_outliers": R.SQL_EVENT_OUTLIERS,
        "top_supplier_by_nation": R.SQL_TOP_SUPPLIER_BY_NATION,
        "table_diff": TD.sql_table_diff(),
        "customers_per_region": R.SQL_CUSTOMERS_PER_REGION,
        "top_orders": R.SQL_TOP_ORDERS,
        "events_hourly": R.SQL_EVENTS_HOURLY,
        "daily_activity": R.SQL_DAILY_ACTIVITY,
        "customer_ntile": R.SQL_CUSTOMER_NTILE,
        "events_sliding": R.SQL_EVENTS_SLIDING,
        "event_sessions": R.SQL_EVENT_SESSIONS,
        "events_asof": R.SQL_EVENTS_ASOF,
        "events_window_join": R.SQL_EVENTS_WINDOW_JOIN,
        "events_lag_delta": R.SQL_EVENTS_LAG_DELTA,
        "events_running_total": R.SQL_EVENTS_RUNNING_TOTAL,
        "orders_rank": R.SQL_ORDERS_RANK,
        "big_orders": R.SQL_BIG_ORDERS,
        "customers_no_urgent": R.SQL_CUSTOMERS_NO_URGENT,
        "priority_check": R.SQL_PRIORITY_CHECK,
        "custdist": R.SQL_CUSTDIST,
        "brand_suppliers": R.SQL_BRAND_SUPPLIERS,
        "lang_chars_median": sql_grouped_median("lang", "n_chars", "documents"),
        "lang_chars_median_cont": sql_grouped_median_cont2x(
            "lang", "n_chars", "documents"),
        "parts_by_brand": R.SQL_PARTS_BY_BRAND,
        "priority_revenue": R.SQL_PRIORITY_REVENUE,
        "revenue_forecast": TX.SQL_REVENUE_FORECAST,
        "shipping_priority": TX.SQL_SHIPPING_PRIORITY,
        "returned_customers": TX.SQL_RETURNED_CUSTOMERS,
        "promo_revenue": TX.SQL_PROMO_REVENUE,
        "top_supplier": TX.SQL_TOP_SUPPLIER,
        "small_qty_revenue": TX.SQL_SMALL_QTY_REVENUE,
        "brand_volume": TX.SQL_BRAND_VOLUME,
        "sales_opportunity": TX.SQL_SALES_OPPORTUNITY,
        "nation_volume": TX.SQL_NATION_VOLUME,
        "local_volume": TX.SQL_LOCAL_VOLUME,
        "market_share": TX.SQL_MARKET_SHARE,
        "pushdown_revenue": TX.SQL_PUSHDOWN_REVENUE,
        "waiting_suppliers": TM.SQL_WAITING_SUPPLIERS,
        "late_shipments": TM.SQL_LATE_SHIPMENTS,
        "nation_profit": TM.SQL_NATION_PROFIT,
        "event_pivot": TM.SQL_EVENT_PIVOT,
        "first_touch": TM.SQL_FIRST_TOUCH,
        "events_cube": TM.SQL_EVENTS_CUBE,
        "important_parts": TL.SQL_IMPORTANT_PARTS,
        "excess_suppliers": TL.SQL_EXCESS_SUPPLIERS,
        "min_bal_supplier": TL.SQL_MIN_BAL_SUPPLIER,
        "supplier_cooccurrence": TL.SQL_SUPPLIER_COOCCURRENCE,
        "cooccurrence_lift": TL.SQL_COOCCURRENCE_LIFT,
        "pareto_orders": TL.SQL_PARETO_ORDERS,
        "id_gaps": S.with_pages(AUD.SQL_ID_GAPS),
        "skew_report": AUD.sql_skew_report(),
        "events_moving_sum": EV.SQL_EVENTS_MOVING_SUM,
        "user_event_path": EV.SQL_USER_EVENT_PATH,
        "user_top_event": EV.SQL_USER_TOP_EVENT,
        "trimmed_mean": EV.SQL_TRIMMED_MEAN,
        "rolling_active_users": EV.SQL_ROLLING_ACTIVE_USERS,
        "event_intervals": EV.SQL_EVENT_INTERVALS,
        "interval_coverage": EV.SQL_INTERVAL_COVERAGE,
        "value_cdf": EV.SQL_VALUE_CDF,
        "time_weighted_value": EV.SQL_TIME_WEIGHTED_VALUE,
        "top_paths": EV.SQL_TOP_PATHS,
        "trending_tokens": S.with_pages(T.SQL_TRENDING_TOKENS),
        "rising_tokens": S.with_pages(T.SQL_RISING_TOKENS),
        "conversion_latency": EV.sql_conversion_latency(),
        "value_trend": EV.SQL_VALUE_TREND,
        "events_rolling_median": EV.SQL_EVENTS_ROLLING_MEDIAN,
        "user_streaks": EV.SQL_USER_STREAKS,
        "interarrival_quantiles": EV.sql_interarrival_quantiles(),
        "power_users": EV.SQL_POWER_USERS,
        "label_embedding_sums": ANN.SQL_LABEL_EMBEDDING_SUMS,
        "ncm_confusion": ANN.SQL_NCM_CONFUSION,
        "hamming_neighbors": S.with_pages(_SQL_HAMMING),
        "doc_chunks": CH.SQL_DOC_CHUNKS,
        "bigram_top": CH.SQL_BIGRAM_TOP,
        "bigram_coverage": CH.SQL_BIGRAM_COVERAGE,
        "token_fertility": CH.SQL_TOKEN_FERTILITY,
        "latest_events": EV.SQL_LATEST_EVENTS,
        "dedup_keep_best": S.with_pages(
            f", q AS ({T.SQL_QUALITY}), {D.SQL_DEDUP_KEEP_BEST_BODY}"),
        "repeat_buyers": TL.SQL_REPEAT_BUYERS,
        "events_weekly": EV.SQL_EVENTS_WEEKLY,
        "value_gini": EV.SQL_VALUE_GINI,
        "cell_cov_exact": S.with_geo(
            """SELECT cell, CAST(COUNT(*) AS BIGINT) AS n,
                 CAST(COUNT(*) * SUM(lon_milli * lat_milli)
                      - SUM(lon_milli) * SUM(lat_milli) AS BIGINT) AS cov_num,
                 CAST(COUNT(*) * SUM(lon_milli * lon_milli)
                      - SUM(lon_milli) * SUM(lon_milli) AS BIGINT) AS var_lon_num
               FROM geod GROUP BY cell"""),
        "order_share": TL.SQL_ORDER_SHARE,
        "ngram_jaccard": NG.sql_ngram_jaccard(),
        "span_dedup": SD.sql_span_dedup(),
        "contamination": SD.sql_contamination(),
        "tfidf_topk": S.with_pages(TF.sql_tfidf_topk()),
        "posting_stats": S.with_pages(TF.sql_posting_stats()),
        "token_cooccurrence": S.with_pages(TF.sql_token_cooccurrence()),
        "boolean_search": S.with_pages(TF.sql_boolean_search()),
        "phrase_search": S.with_pages(TF.sql_phrase_search()),
        "fk_orphans": AUD.SQL_FK_ORPHANS,
        "table_profile": AUD.sql_table_profile(),
        "paragraph_dedup": S.with_pages(PD.SQL_PARAGRAPH_DEDUP),
        "cross_host_dup": S.with_pages(PD.SQL_CROSS_HOST_DUP),
        "syndication_graph": S.with_pages(LR.SQL_SYNDICATION_GRAPH),
        "host_rank": S.with_pages(LR.sql_host_rank()),
        "host_components": S.with_pages(LR.SQL_HOST_COMPONENTS),
        "host_distance": S.with_pages(LR.SQL_HOST_DISTANCE),
        "template_detect": S.with_pages(BO.SQL_TEMPLATE_DETECT),
        "split_assign": S.with_pages(SPL.SQL_SPLIT_ASSIGN),
        "split_leakage": S.with_pages(SPL.SQL_SPLIT_LEAKAGE),
        # r4: rows-only sketch/LSH queries graduated to exact oracles via
        # core/sqlmirror's HUGEINT mod-2^64 twins of the engine's uint64
        # hash kernels (r3 verdict #4)
        "minhash_pairs": S.with_pages(D.sql_minhash_pairs()),
        "simhash_buckets": S.with_pages(D.sql_simhash_buckets()),
        "dup_clusters": S.with_pages(D.sql_dup_clusters()),
        "split_leakage_neardup": S.with_pages(
            SPL.sql_split_leakage_neardup()),
        "hll_distinct": S.with_pages(_SK.sql_hll_distinct()),
        "hll_by_lang": S.with_pages(_SK.sql_hll_grouped(
            "lang", "SELECT lang, doc_id AS v FROM pages")),
        "cms_user_counts": S.with_pages(_SK.sql_cms_user_counts()),
        "value_deciles": sql_bucketize_exact(
            "v_cents",
            "(SELECT CAST(floor(value * 100.0 + 0.5) AS BIGINT)"
            " AS v_cents FROM events)"),
        "token_budget_mix": S.with_pages(MX.SQL_TOKEN_BUDGET_MIX),
        "vocab_growth": S.with_pages(LX.SQL_VOCAB_GROWTH),
        "weighted_median": sql_grouped_weighted_median(
            "l_returnflag", "price_cents", "qty",
            "(SELECT l_returnflag, CAST(floor(l_extendedprice * 100.0 + 0.5) AS BIGINT) AS price_cents, CAST(l_quantity AS BIGINT) AS qty FROM lineitem)"),
        "event_mad": sql_grouped_mad4x(
            "event_type", "v_cents",
            "(SELECT event_type, CAST(floor(value * 100.0 + 0.5) AS BIGINT) AS v_cents FROM events)"),
        "event_p95": sql_grouped_median(
            "event_type", "v_cents",
            "(SELECT event_type, CAST(floor(value * 100.0 + 0.5) AS BIGINT) AS v_cents FROM events)",
            0.95),
        "weighted_sample": S.with_pages(
            f"""SELECT doc_id, quality FROM ({T.SQL_QUALITY})
                WHERE {_WS_HASH} * 1000000 < quality * 4294967296"""
        ),
        "bloom_semijoin": BL.sql_bloom_semijoin(),
        "incremental_dedup": S.with_pages(DI.sql_incremental_dedup()),
        "remap_checker": S.with_pages(_sql_remap_checker()),
        "metadata": S.with_pages(_SQL_METADATA),
        "site_skew": S.with_pages(
            f"""SELECT CAST(CASE WHEN {_SQL_SITE} < 10 THEN 0
                     WHEN {_SQL_SITE} < 100 THEN 1
                     ELSE 2 END AS BIGINT) AS band, COUNT(*) AS n_docs
               FROM pages GROUP BY 1"""
        ),
        "supplier_balance": R.SQL_SUPPLIER_BALANCE,
        "docs_by_lang": R.SQL_DOCS_BY_LANG,
        "overview_coarse": S.with_geo(
            "SELECT (lat_milli // 8000) * 45 + lon_milli // 8000 AS cell, "
            "COUNT(*) AS n_docs FROM geod GROUP BY 1"
        ),
        "auto_utm": S.with_geo(
            """SELECT n, s_lon // n AS mean_lon_milli, s_lat // n AS mean_lat_milli,
                 CAST(CASE WHEN s_lat // n >= 85000 THEN 32600 ELSE 32700 END
                   + ((s_lon // n) // 6000) % 60 + 1 AS BIGINT) AS epsg
               FROM (SELECT COUNT(*) AS n,
                            CAST(SUM(lon_milli) AS BIGINT) AS s_lon,
                            CAST(SUM(lat_milli) AS BIGINT) AS s_lat
                     FROM geod)"""
        ),
    }
