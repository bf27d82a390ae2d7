"""DuckDB SQL mirrors of the engine's 64-bit hash kernels.

The engine's sketch/dedup family (MinHash, SimHash, HLL, CMS) runs on
uint64 arithmetic that wraps mod 2^64.  DuckDB has no wrapping integers,
but HUGEINT (int128) holds every intermediate these kernels produce, so
each wrap point becomes an explicit ``% 2^64`` — producing BIT-IDENTICAL
values and letting the rows-only sketch queries graduate to exact DuckDB
oracles (r3 verdict #4).  Fragment generators, composed into twins by the
owning stages (dedup/sketches):

- ``mul64(a, c)`` / ``mul64_cols`` — (a*c) mod 2^64 via 32-bit splitting
  (c as a python constant or as hi/lo SQL columns);
- ``xor64`` — via UBIGINT (DuckDB xor doesn't take HUGEINT);
- ``splitmix64(x)`` — the HLL/CMS value hash;
- ``fnv1a(s)`` — FNV-1a over the utf-8 bytes of a VARCHAR via
  ``list_reduce`` (the byte xor only touches the low 8 bits, so it runs
  in BIGINT: h - h%256 + xor(h%256, byte));
- tokenizer/shingle fragments matching ``core.texthash.tokenize`` /
  ``_gram_spans`` exactly (split on ``[ \\t\\n\\f\\r]``, <n tokens -> one
  whole-doc gram, empty doc -> one empty gram).

ASCII contract: ``fnv1a`` folds ``ascii(char)`` per character, which is
the utf-8 byte only for ASCII text.  The driver corpora are ASCII
(asserted in tests/test_sqlmirror.py); non-ASCII text would need byte-
level folding that DuckDB SQL cannot express — the twins raise no flag
themselves, the engine is the source of truth either way.

Engine twins: core/texthash.py (_fold_spans, tokenize, _gram_spans),
stages/dedup.py (_PERM_A/_PERM_B/MinHasher), stages/sketches.py
(_splitmix64, _cms_hash, _hll_partial).
"""

from __future__ import annotations

M64 = 1 << 64
M32_ = 1 << 32
FNV_OFFSET = 0xCBF29CE484222325
FNV_PRIME = 0x100000001B3  # 2^40ish: h*PRIME < 2^104 fits HUGEINT directly
GOLD = 0x9E3779B97F4A7C15
SM_C2 = 0xBF58476D1CE4E5B9
SM_C3 = 0x94D049BB133111EB
DOC_MULT = 1099511628211

# the engine's tokenizer splits on exactly these bytes (core/texthash.py
# _TOKEN_RE_BYTES) — NOT regex \s, which also matches \v
TOKEN_SPLIT_RE = r"[ \t\n\f\r]+"


def shr(a: str, k: int) -> str:
    """(a >> k) for a nonneg HUGEINT-held u64."""
    return f"(({a}) // {1 << k})"


def xor64(a: str, b: str) -> str:
    """xor of two u64 values held in HUGEINT (via UBIGINT round-trip)."""
    return (f"CAST(xor(CAST(({a}) AS UBIGINT), CAST(({b}) AS UBIGINT)) "
            f"AS HUGEINT)")


def mul64(a: str, c: int) -> str:
    """(a * c) % 2^64 for u64 ``a`` (HUGEINT expr) and constant ``c``.
    Splits c into 32-bit halves so every product fits int128."""
    chi, clo = c >> 32, c & 0xFFFFFFFF
    if chi == 0:
        return f"((({a}) * {clo}) % {M64})"
    return (f"((({a}) * {clo}) % {M64} + "
            f"(((({a}) * {chi}) % {M32_}) * {M32_})) % {M64}")


def mul64_cols(a: str, chi: str, clo: str) -> str:
    """(a * c) % 2^64 where c arrives as hi/lo 32-bit SQL columns."""
    return (f"((({a}) * ({clo})) % {M64} + "
            f"(((({a}) * ({chi})) % {M32_}) * {M32_})) % {M64}")


def splitmix64(x: str) -> str:
    """splitmix64 of a nonneg u64 SQL expr — mirrors sketches._splitmix64."""
    z = f"((({x}) + {GOLD}) % {M64})"
    z = f"({mul64(xor64(z, shr(z, 30)), SM_C2)})"
    z = f"({mul64(xor64(z, shr(z, 27)), SM_C3)})"
    return xor64(z, shr(z, 31))


def fnv1a(s: str) -> str:
    """FNV-1a over the bytes of VARCHAR expr ``s`` (ASCII contract above).
    Empty string -> FNV_OFFSET, matching the engine's empty-gram hash."""
    fold = (f"((h - (h % 256) + xor(CAST(h % 256 AS BIGINT), b)) "
            f"* {FNV_PRIME}) % {M64}")
    return (f"(CASE WHEN ({s}) = '' THEN CAST({FNV_OFFSET} AS HUGEINT) "
            f"ELSE list_reduce(list_prepend(CAST({FNV_OFFSET} AS HUGEINT), "
            f"[ascii(c) for c in string_split(({s}), '')]), "
            f"(h, b) -> {fold}) END)")


def signed64(u: str) -> str:
    """Reinterpret a u64 HUGEINT expr as int64 (numpy .astype(int64))."""
    return (f"CAST(CASE WHEN ({u}) >= {1 << 63} THEN ({u}) - {M64} "
            f"ELSE ({u}) END AS BIGINT)")


def tokens(text: str) -> str:
    """Non-empty whitespace tokens of ``text`` (engine tokenize order)."""
    return (f"list_filter(string_split_regex(({text}), '{TOKEN_SPLIT_RE}'),"
            f" x -> x <> '')")


def grams(toks: str, n: int = 3) -> str:
    """Word n-gram shingle STRINGS from a token-list expr — engine rules
    (texthash._gram_spans): < n tokens -> ONE gram of the whole space-
    joined doc; empty doc -> one empty gram."""
    return (
        f"(CASE WHEN len({toks}) = 0 THEN [''] "
        f"WHEN len({toks}) < {n} THEN [array_to_string({toks}, ' ')] "
        f"ELSE [array_to_string(list_slice({toks}, i, i + {n - 1}), ' ') "
        f"for i in generate_series(1, len({toks}) - {n - 1})] END)"
    )


def perm_values_cte(name: str = "perms") -> str:
    """N_PERM-row CTE (j, ahi, alo, b) of the MinHash permutation
    constants, read DIRECTLY from stages/dedup._PERM_A/_PERM_B at SQL
    build time (lazy import; dedup is always loaded by then) — a re-
    derivation here would silently diverge if the engine's constants were
    ever retuned (r4 review).  ahi/alo = hi/lo 32-bit split of A (the
    mul64 trick); B travels whole (only ever ADDED, < 2^64)."""
    from ..stages.dedup import _PERM_A, _PERM_B

    rows = []
    for j, (a, b) in enumerate(zip(_PERM_A.tolist(), _PERM_B.tolist())):
        rows.append(f"({j}, {a >> 32}, {a & 0xFFFFFFFF}, "
                    f"CAST({b} AS HUGEINT))")
    return f"{name}(j, ahi, alo, b) AS (FROM (VALUES {', '.join(rows)}))"


def bit_values_cte(name: str = "bits") -> str:
    """64-row CTE (b, pw) with pw = 2^b as HUGEINT — exact power-of-two
    literals for SimHash bit assembly (no float pow)."""
    rows = [f"({b}, CAST({1 << b} AS HUGEINT))" for b in range(64)]
    return f"{name}(b, pw) AS (FROM (VALUES {', '.join(rows)}))"


def minhash_band_rows(pages: str = "pages", n: int = 3,
                      n_bands: int | None = None) -> str:
    """CTE chain ending in ``brows(doc_id, band, band_hash)`` — the LSH
    band rows of the exact-dedup representatives of ``pages``; the SQL
    twin of dedup.exact_dedup -> MinHasher.  band_hash is the signed-64
    reinterpretation the engine emits.  Band geometry defaults to the
    engine's own N_PERM/N_BANDS (lazy import, same reason as
    perm_values_cte)."""
    from ..stages.dedup import N_BANDS, N_PERM

    if n_bands is None:
        n_bands = N_BANDS
    rows_per_band = N_PERM // n_bands
    perm = mul64_cols("gh.h", "p.ahi", "p.alo")
    fold = f"((x * {DOC_MULT}) % {M64} + y) % {M64}"
    return f"""
reps AS (
  SELECT MIN(doc_id) AS doc_id, text FROM {pages} GROUP BY text
), gram AS (
  SELECT doc_id, unnest({grams(tokens('text'), n)}) AS g FROM reps
), gh AS (
  SELECT doc_id, {fnv1a('g')} AS h FROM gram
), {perm_values_cte()}, sig AS (
  SELECT gh.doc_id, p.j,
         MIN((({perm}) + p.b) % {M64}) AS s
  FROM gh CROSS JOIN perms p GROUP BY gh.doc_id, p.j
), bh AS (
  SELECT doc_id, j // {rows_per_band} AS band,
         list_reduce(list_prepend(CAST(0 AS HUGEINT),
                                  list(s ORDER BY j)),
                     (x, y) -> {fold}) AS h
  FROM sig GROUP BY doc_id, j // {rows_per_band}
), brows AS (
  SELECT doc_id, CAST(band AS BIGINT) AS band, {signed64('h')} AS band_hash
  FROM bh
)""".strip()
