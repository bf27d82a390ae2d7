"""Text analysis stages: token counting, quality scoring, language ID,
document fingerprinting.

Engine analogs of the reference's per-image metadata extraction (EXIF/XMP ->
typed fields, `orthority/exif.py:101-363`; SURVEY.md §2.1 S16): each page's
payload is parsed into typed feature columns inside a ``map_batches`` actor
pool (regexes compiled once per actor in ``__init__``).

Outputs that feed the DuckDB oracle are integers (counts, floor-scaled
ratios) so value hashes can't wobble on float formatting.
"""

from __future__ import annotations

import re

import numpy as np
import pandas as pd
import pyarrow as pa
import ray.data

from ..core.config import pool

# characters DuckDB's \s matches too; token = runs of non-space
_WS_SQL = r"\s+"

STOPWORDS = ("the", "a", "of", "and", "to", "in", "is", "on", "for", "with")

# deterministic 5-language n-gram profile for the synthetic corpus: the
# testdata vocabulary is shared, so "language" is identified by a hash vote —
# a stand-in demonstrating the actor-pool plumbing; accuracy is asserted
# against the provided lang label only for the planted fixture in tests.
LANGS = ("en", "de", "fr", "es", "pt", "zh")


class TextFeatures:
    """text -> n_tokens, n_chars, stop_ratio_pm, alpha_ratio_pm, fingerprint."""

    def __init__(self):
        self.tok = re.compile(r"\S+")
        self.alpha = re.compile(r"[A-Za-z]")
        self.stops = frozenset(STOPWORDS)
        # per-actor memo cache: web crawls are duplicate-heavy, so identical
        # texts recur constantly; compute once per distinct text per actor
        self.cache: dict[str, tuple] = {}

    def _features(self, t: str) -> tuple:
        hit = self.cache.get(t)
        if hit is not None:
            return hit
        toks = self.tok.findall(t)
        ns = sum(1 for w in toks if w in self.stops)
        h = 0
        for w in toks:
            hw = 0
            for b in w.encode("utf-8"):
                hw = (hw * 131 + b) & 0xFFFFFFFFFFFFFFFF
            h = (h * 1099511628211 + hw) & 0x7FFFFFFFFFFFFFFF
        out = (len(toks), len(t), (ns * 1_000_000) // max(1, len(toks)), h)
        if len(self.cache) < 200_000:
            self.cache[t] = out
        return out

    def __call__(self, batch: pa.Table) -> pa.Table:
        texts = batch["text"].to_pylist()
        n = len(texts)
        n_tokens = np.empty(n, dtype=np.int64)
        n_chars = np.empty(n, dtype=np.int64)
        stop_pm = np.empty(n, dtype=np.int64)
        fingerprint = np.empty(n, dtype=np.int64)
        for i, t in enumerate(texts):
            n_tokens[i], n_chars[i], stop_pm[i], fingerprint[i] = self._features(t)
        return (
            batch.append_column("n_tokens", pa.array(n_tokens))
            .append_column("n_chars_x", pa.array(n_chars))
            .append_column("stop_pm", pa.array(stop_pm))
            .append_column("fingerprint", pa.array(fingerprint))
        )


def text_features(ds: ray.data.Dataset, *, concurrency: int | None = None) -> ray.data.Dataset:
    return ds.map_batches(
        TextFeatures, batch_format="pyarrow", batch_size=4096, concurrency=pool(concurrency)
    )


# token count via whitespace split — SQL parity with DuckDB:
#   length(text) / regexp-split based count.  Python len(t.split()) equals
#   counting \S+ runs, which equals len(regexp_extract_all(text, '\S+')).
SQL_TEXT_FEATURES = r"""
SELECT doc_id,
       CAST(length(regexp_extract_all(text, '\S+')) AS BIGINT) AS n_tokens,
       CAST(length(text) AS BIGINT) AS n_chars_x
FROM pages
""".strip()


class QualityScorer:
    """Heuristic quality score in [0, 1e6] (floor-scaled int):
    blends token-length band, mean word length band and stopword presence.
    Integer arithmetic only -> SQL-replicable."""

    def __init__(self):
        self.tok = re.compile(r"\S+")
        self.stops = frozenset(STOPWORDS)
        self.cache: dict[str, int] = {}  # memo per distinct text (see TextFeatures)

    def _score(self, t: str) -> int:
        hit = self.cache.get(t)
        if hit is not None:
            return hit
        toks = self.tok.findall(t)
        nt = len(toks)
        len_ok = 1 if 20 <= nt <= 200 else 0
        nchars = sum(len(w) for w in toks)
        mwl10 = (nchars * 10) // max(1, nt)  # mean word length x10
        wl_ok = 1 if 25 <= mwl10 <= 90 else 0
        ns = sum(1 for w in toks if w in self.stops)
        stop_ok = 1 if ns * 10 >= nt else 0  # >= 10% stopwords
        out = (len_ok * 500_000) + (wl_ok * 300_000) + (stop_ok * 200_000)
        if len(self.cache) < 200_000:
            self.cache[t] = out
        return out

    def __call__(self, batch: pa.Table) -> pa.Table:
        score = np.fromiter(
            (self._score(t) for t in batch["text"].to_pylist()), dtype=np.int64,
            count=batch.num_rows,
        )
        return batch.append_column("quality", pa.array(score))


def quality(ds: ray.data.Dataset, *, concurrency: int | None = None) -> ray.data.Dataset:
    return ds.map_batches(
        QualityScorer, batch_format="pyarrow", batch_size=4096, concurrency=pool(concurrency)
    )


SQL_QUALITY = r"""
SELECT doc_id,
  CAST(CASE WHEN length(regexp_extract_all(text, '\S+')) BETWEEN 20 AND 200 THEN 500000 ELSE 0 END
 + CASE WHEN (length(replace(text, ' ', '')) * 10) // greatest(1, length(regexp_extract_all(text, '\S+'))) BETWEEN 25 AND 90 THEN 300000 ELSE 0 END
 + CASE WHEN 10 * length(list_filter(regexp_extract_all(lower(text), '\S+'),
        x -> list_contains(['the','a','of','and','to','in','is','on','for','with'], x)))
        >= length(regexp_extract_all(text, '\S+')) THEN 200000 ELSE 0 END AS BIGINT) AS quality
FROM pages
""".strip()


class LangId:
    """n-gram-vote language ID.  On the synthetic shared-vocabulary corpus a
    real char-n-gram model is meaningless, so the classifier is a
    deterministic trigram-hash vote; the class demonstrates the per-actor
    model-load pattern (profiles built once in ``__init__``)."""

    def __init__(self):
        self.profiles = {
            lang: {(hash((lang, i)) & 0xFFFF) for i in range(64)} for lang in LANGS
        }
        self.cache: dict[str, str] = {}  # memo per distinct text

    def __call__(self, batch: pd.DataFrame) -> pd.DataFrame:
        def vote_uncached(t: str) -> str:
            grams = {((ord(a) * 131 + ord(b)) * 131 + ord(c)) & 0xFFFF
                     for a, b, c in zip(t, t[1:], t[2:])}
            best, best_n = LANGS[0], -1
            for lang in LANGS:
                nx = len(grams & self.profiles[lang])
                if nx > best_n:
                    best, best_n = lang, nx
            return best

        def vote(t: str) -> str:
            hit = self.cache.get(t)
            if hit is None:
                hit = vote_uncached(t)
                if len(self.cache) < 200_000:
                    self.cache[t] = hit
            return hit

        batch["lang_pred"] = [vote(t) for t in batch["text"]]
        return batch


def lang_id(ds: ray.data.Dataset, *, concurrency: int | None = None) -> ray.data.Dataset:
    return ds.map_batches(LangId, batch_format="pandas", batch_size=4096,
                          concurrency=pool(concurrency))
