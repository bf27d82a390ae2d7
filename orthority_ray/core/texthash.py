"""Vectorized text-hashing kernels shared by dedup / textstats / lang-id.

Round 1 hashed shingles and tokens with per-byte Python loops
(``for byt in g: h = (h ^ byt) * FNV_PRIME``).  The naive vectorization
(pad every gram into a matrix) does not help, because *constructing* the
hundreds of thousands of per-gram byte strings is as expensive as hashing
them.  These kernels therefore never materialize gram strings at all: each
text is whitespace-normalized and encoded ONCE into a shared flat byte
buffer, token/shingle boundaries are recovered vectorized (a shingle is a
contiguous slice of the normalized buffer), and the per-byte recurrence runs
position-parallel across all grams with one numpy gather per byte position.

All constants and byte-level semantics are IDENTICAL to round 1 (every
signature, bucket and fingerprint in the repo's outputs is unchanged —
pinned by tests/test_texthash.py), and everything is deterministic and
process-invariant (no builtin ``hash``, no RNG).
"""

from __future__ import annotations

import re

import numpy as np

# --- the engine-wide token boundary ------------------------------------------
#
# Tokens are maximal runs of non-whitespace where whitespace is RE2's ``\s``
# = [\t\n\f\r ] — exactly what every DuckDB oracle's ``\s+`` split means (RE2
# has NO \x0b and NO Unicode whitespace in \s).  Python's ``str.split()`` and
# Arrow's ``utf8_split_whitespace`` split on *Unicode* whitespace (NBSP,
#  , \x1c-\x1f, ...), which silently diverges from the oracles on
# non-ASCII input (r3 review) — so every tokenizer in the repo goes through
# these definitions instead.
TOKEN_SPLIT_REGEX = r"\s+"  # for Arrow split_pattern_regex (RE2-backed)
_TOKEN_RE_BYTES = re.compile(rb"[^ \t\n\f\r]+")  # UTF-8 bytes >= 0x80 never match
TOKEN_RE = re.compile(r"[^ \t\n\f\r]+")


def split_tokens_arrow(col):
    """RE2 whitespace split of an Arrow string column/array -> list<string>
    (empty slots kept, exactly like the SQL ``string_split_regex(text,
    '\\s+')`` the oracles use — callers filter ``''``).

    Fast path: Arrow's non-regex ``ascii_split_whitespace`` emits the
    byte-identical slot structure for every input WITHOUT a vertical tab
    (its ASCII whitespace set is RE2's \\s plus \\x0b; empirically pinned
    against ``split_pattern_regex`` in tests/test_texthash.py), and is ~9x
    faster than the RE2 kernel.  A cheap memchr-style \\x0b probe routes
    the rare batch containing one through the exact regex split."""
    import pyarrow as pa
    import pyarrow.compute as pc

    if isinstance(col, pa.ChunkedArray):
        col = col.combine_chunks()
    if int(pc.sum(pc.count_substring(col, "\x0b")).as_py() or 0):
        toks = pc.split_pattern_regex(col, TOKEN_SPLIT_REGEX)
    else:
        toks = pc.ascii_split_whitespace(col)
    if isinstance(toks, pa.ChunkedArray):
        toks = toks.combine_chunks()
    return toks


def nonempty_token_counts(text):
    """RE2-split ``text`` (Arrow string array/chunked) and return
    ``(flat_nonempty_tokens, ntok, doc_token_starts)`` where ``ntok[d]``
    counts the doc's non-empty tokens and ``doc_token_starts`` are the
    exclusive-cumsum offsets of each doc's span inside the flattened
    non-empty token array.  The shared empty-slot/reduceat handling for
    every tokenizing stage (paradedup, lexstats, mixing, chunking)."""
    import pyarrow as pa
    import pyarrow.compute as pc

    if isinstance(text, pa.ChunkedArray):
        text = text.combine_chunks()
    toks = split_tokens_arrow(text)
    flat = toks.flatten()
    if isinstance(flat, pa.ChunkedArray):
        flat = flat.combine_chunks()
    offs = toks.offsets.to_numpy(zero_copy_only=False)
    offs = offs - offs[0]
    nonempty = pc.not_equal(pc.utf8_length(flat), 0).to_numpy(
        zero_copy_only=False)
    n_docs = len(toks)
    if len(flat):
        n_empty = np.add.reduceat((~nonempty).astype(np.int64), offs[:-1])
        n_empty[offs[:-1] == offs[1:]] = 0  # reduceat quirk on empty lists
    else:
        n_empty = np.zeros(n_docs, np.int64)
    ntok = (offs[1:] - offs[:-1]).astype(np.int64) - n_empty
    flat_ne = flat.filter(pa.array(nonempty))
    starts = (np.concatenate([[0], np.cumsum(ntok)[:-1]]).astype(np.int64)
              if ntok.size else np.zeros(0, np.int64))
    return flat_ne, ntok, starts


def dedup_token_counts(texts) -> "np.ndarray":
    """Dedup-then-process token counting for a block: factorize the text
    column (pandas Series / Arrow array), tokenize each DISTINCT text once
    via :func:`nonempty_token_counts`, and fan the counts back to every row
    through the factorize index.  Null texts raise loudly — pd.factorize
    assigns them code -1, which would otherwise silently alias the LAST
    distinct text's count (r3 advice); callers that accept arbitrary
    (doc_id, text, ...) datasets must reject nulls, matching editdist."""
    import pandas as pd
    import pyarrow as pa

    if isinstance(texts, (pa.Array, pa.ChunkedArray)):
        texts = texts.to_pandas()
    codes, uniq = pd.factorize(texts)
    if (codes == -1).any():
        raise ValueError(
            "null text in token-count input; drop or fill nulls upstream "
            "(factorize codes them -1, which would alias another text's "
            "count)")
    _, ntok, _ = nonempty_token_counts(pa.array(uniq, pa.string()))
    return ntok[codes]


FNV_OFFSET = np.uint64(0xCBF29CE484222325)
FNV_PRIME = np.uint64(0x100000001B3)
WORD_MULT = np.uint64(131)
# python-int twins for the rare long-span scalar fallback (np.uint64 mixed
# with python int silently upcasts to float64 — wrong hashes)
FNV_OFFSET_INT = 0xCBF29CE484222325
FNV_PRIME_INT = 0x100000001B3
WORD_MULT_INT = 131
_LONG_SPAN = 4096  # bytes; spans above this hash via the scalar fallback
DOC_MULT = np.uint64(1099511628211)


# --- flat token buffer ------------------------------------------------------


class TokenBuf:
    """Whitespace-normalized texts in one flat uint8 buffer.

    ``flat`` holds the space-joined RE2 tokens (see TOKEN_RE) of every
    text, utf-8 encoded and concatenated; ``tok_starts``/``tok_lens`` are
    the global byte spans of every token; ``counts`` is tokens per text.
    Single spaces separate tokens, and 0x20 can only be a separator (UTF-8
    continuation bytes are >= 0x80), so token boundaries are exactly the
    space positions.
    """

    __slots__ = ("flat", "tok_starts", "tok_lens", "counts")

    def __init__(self, flat: np.ndarray, tok_starts: np.ndarray,
                 tok_lens: np.ndarray, counts: np.ndarray):
        self.flat = flat
        self.tok_starts = tok_starts
        self.tok_lens = tok_lens
        self.counts = counts


def tokenize(texts: list[str]) -> TokenBuf:
    parts = [b" ".join(_TOKEN_RE_BYTES.findall(t.encode("utf-8")))
             for t in texts]
    doc_lens = np.fromiter((len(p) for p in parts), dtype=np.int64, count=len(parts))
    doc_starts = np.cumsum(doc_lens) - doc_lens
    flat = np.frombuffer(b"".join(parts), dtype=np.uint8)
    if flat.size:
        space = np.flatnonzero(flat == 0x20)
        # token starts: each doc start (if non-empty) + every position after a space
        starts = np.concatenate([doc_starts[doc_lens > 0], space + 1])
        starts.sort(kind="stable")
        ends = np.concatenate([space, doc_starts[doc_lens > 0] + doc_lens[doc_lens > 0]])
        ends.sort(kind="stable")
        tok_lens = ends - starts
        # tokens per doc: non-empty doc with L bytes and S spaces has S+1 tokens
        doc_ends = doc_starts + doc_lens
        spaces_per_doc = np.searchsorted(space, doc_ends) - np.searchsorted(space, doc_starts)
        counts = np.where(doc_lens > 0, spaces_per_doc + 1, 0)
    else:
        starts = np.empty(0, dtype=np.int64)
        tok_lens = np.empty(0, dtype=np.int64)
        counts = np.zeros(len(texts), dtype=np.int64)
    return TokenBuf(flat, starts, tok_lens, counts)


def _fold_spans(flat: np.ndarray, starts: np.ndarray, lens: np.ndarray,
                *, fnv: bool) -> np.ndarray:
    """Run the byte recurrence over each [start, start+len) span of ``flat``,
    position-parallel: one masked gather + one vector update per byte
    position.  fnv=True: h=(h^b)*FNV_PRIME from FNV_OFFSET; else h=h*131+b
    from 0."""
    g = starts.shape[0]
    h = np.full(g, FNV_OFFSET, dtype=np.uint64) if fnv else np.zeros(g, dtype=np.uint64)
    if g == 0:
        return h
    lmax = int(lens.max()) if g else 0
    # the position-parallel loop costs O(num_spans) per BYTE POSITION of
    # the longest span — one pathological 1 MB token would gate the whole
    # batch behind 10^6 full-width passes.  Spans beyond the threshold are
    # rare; hash them individually (same recurrence, identical values) and
    # keep the vector loop bounded by the 99.9%-case length (r3 review).
    long = lens > _LONG_SPAN
    if bool(long.any()):
        for i in np.flatnonzero(long):
            acc = FNV_OFFSET_INT if fnv else 0
            s = int(starts[i])
            for b in flat[s: s + int(lens[i])]:
                acc = ((acc ^ int(b)) * FNV_PRIME_INT if fnv
                       else acc * WORD_MULT_INT + int(b)) & 0xFFFFFFFFFFFFFFFF
            h[i] = np.uint64(acc)
        lens = np.where(long, 0, lens)
        lmax = int(lens.max())
    cap = flat.size - 1 if flat.size else 0
    with np.errstate(over="ignore"):
        for k in range(lmax):
            active = lens > k
            b = flat[np.minimum(starts + k, cap)].astype(np.uint64)
            nh = (h ^ b) * FNV_PRIME if fnv else h * WORD_MULT + b
            h = np.where(active, nh, h)
    return h


# --- bytes-list kernels (profiles, tests, small inputs) ---------------------


def _flat_spans(grams: list[bytes]) -> tuple[np.ndarray, np.ndarray, np.ndarray]:
    n = len(grams)
    lens = np.fromiter((len(g) for g in grams), dtype=np.int64, count=n)
    flat = np.frombuffer(b"".join(grams), dtype=np.uint8)
    starts = np.cumsum(lens) - lens
    return flat, starts, lens


def fnv1a_bulk(grams: list[bytes]) -> np.ndarray:
    """FNV-1a over each byte string, bit-identical to round 1's loop."""
    flat, starts, lens = _flat_spans(grams)
    return _fold_spans(flat, starts, lens, fnv=True)


def word131_bulk(grams: list[bytes]) -> np.ndarray:
    """Base-131 polynomial hash per byte string (h = h*131 + b, init 0)."""
    flat, starts, lens = _flat_spans(grams)
    return _fold_spans(flat, starts, lens, fnv=False)


def hash_arrow_strings(col) -> np.ndarray:
    """FNV-1a per value of an Arrow string/large_string/binary column,
    hashed STRAIGHT OFF the Arrow offsets+data buffers — no ``to_pylist()``
    round-trip, no per-value ``.encode()`` (Arrow strings are already
    utf-8, so the buffer bytes equal the round-1 encode bytes and the
    output is bit-identical to ``fnv1a_bulk([v.encode() for v in ...])``,
    pinned by tests/test_texthash.py).

    Null values are rejected with a descriptive error: every caller is a
    join/bucket key path where a null key has no defined bucket (and the
    legacy path raised an opaque AttributeError deep inside the tag stage).
    """
    import pyarrow as pa

    chunks = col.chunks if isinstance(col, pa.ChunkedArray) else [col]
    outs = []
    for arr in chunks:
        if not (pa.types.is_string(arr.type) or pa.types.is_large_string(arr.type)
                or pa.types.is_binary(arr.type)
                or pa.types.is_large_binary(arr.type)):
            # a dictionary/string_view column's buffers are NOT offsets+data;
            # reinterpreting them would silently hash garbage (r3 review)
            raise TypeError(
                f"hash_arrow_strings needs an offset-based string/binary "
                f"column, got {arr.type}; decode dictionary columns first")
        if arr.null_count:
            raise ValueError(
                "null join/bucket keys are not supported; filter nulls "
                "before hash-partitioning (column type %s)" % arr.type)
        if len(arr) == 0:
            continue
        wide = (pa.types.is_large_string(arr.type)
                or pa.types.is_large_binary(arr.type))
        bufs = arr.buffers()
        offs = np.frombuffer(bufs[1], dtype=np.int64 if wide else np.int32)
        offs = offs[arr.offset: arr.offset + len(arr) + 1].astype(np.int64)
        flat = (np.frombuffer(bufs[2], dtype=np.uint8)
                if bufs[2] is not None else np.empty(0, dtype=np.uint8))
        outs.append(_fold_spans(flat, offs[:-1], offs[1:] - offs[:-1], fnv=True))
    if not outs:
        return np.empty(0, dtype=np.uint64)
    return outs[0] if len(outs) == 1 else np.concatenate(outs)


# --- token/shingle kernels over the normalized buffer -----------------------


def token_hashes(buf: TokenBuf, *, fnv: bool = True) -> np.ndarray:
    """Hash of every token (FNV-1a, or base-131 for the fingerprint path)."""
    return _fold_spans(buf.flat, buf.tok_starts, buf.tok_lens, fnv=fnv)


def span_hashes(flat: np.ndarray, starts: np.ndarray, lens: np.ndarray) -> np.ndarray:
    """FNV-1a over arbitrary [start, start+len) spans of a flat byte buffer
    (public entry for callers that build their own spans, e.g. word bigrams)."""
    return _fold_spans(flat, starts, lens, fnv=True)


def _gram_spans(buf: TokenBuf, n: int) -> tuple[np.ndarray, np.ndarray, np.ndarray]:
    """Byte spans of the word n-gram shingles of every doc (round-1 rules:
    < n words -> ONE gram of the whole normalized doc; empty doc -> one
    empty gram), all vectorized."""
    cnt = buf.counts
    n_docs = cnt.shape[0]
    tok_base = np.cumsum(cnt) - cnt
    kd = np.maximum(1, np.where(cnt == 0, 1, cnt - n + 1))
    total = int(kd.sum())
    goff = np.cumsum(kd) - kd
    first = np.repeat(tok_base, kd) + (np.arange(total) - np.repeat(goff, kd))
    span = np.repeat(np.minimum(cnt, n), kd)  # tokens per gram; 0 for empty docs
    if buf.tok_starts.shape[0] == 0:
        # every doc in the batch is empty/whitespace: one empty gram each
        # (indexing the empty tok_starts below would IndexError; r3 review)
        z = np.zeros(int(kd.sum()), dtype=np.int64)
        return z, z.copy(), kd
    nz = span > 0
    cap = max(buf.tok_starts.shape[0] - 1, 0)
    fi = np.minimum(first, cap)
    li = np.minimum(first + span - 1, cap)
    g_start = np.where(nz, buf.tok_starts[fi], 0)
    g_len = np.where(nz, buf.tok_starts[li] + buf.tok_lens[li] - g_start, 0)
    return g_start, g_len, kd


def shingle_hashes_batch(texts: list[str], n: int = 3) -> tuple[np.ndarray, np.ndarray]:
    """uint64 FNV-1a shingle hashes for a whole batch: (flat_hashes,
    grams_per_doc).  Every doc contributes >= 1 gram (reduceat-safe)."""
    buf = tokenize(texts)
    g_start, g_len, counts = _gram_spans(buf, n)
    return _fold_spans(buf.flat, g_start, g_len, fnv=True), counts


def fingerprint_docs(word_hashes: np.ndarray, counts: np.ndarray) -> np.ndarray:
    """Per-doc rolling fingerprint over word hashes, vectorized across docs.

    Semantics (identical to round 1's loop):
        h = 0; for hw in words: h = (h * 1099511628211 + hw) & 0x7FFF...F
    Masking to 63 bits each step equals one final mask of the mod-2^64 fold
    (reduction mod 2^63 is a ring hom of mod 2^64), and the fold itself is
    the polynomial sum(hw_i * M^(k-1-i)) — one multiply + segmented sum.
    """
    n_docs = counts.shape[0]
    out = np.zeros(n_docs, dtype=np.uint64)
    if word_hashes.size == 0:
        return out.astype(np.int64)
    max_k = int(counts.max())
    powers = np.ones(max_k, dtype=np.uint64)
    with np.errstate(over="ignore"):
        for i in range(1, max_k):
            powers[i] = powers[i - 1] * DOC_MULT
        ends = np.cumsum(counts)
        starts = ends - counts
        pos = np.arange(word_hashes.shape[0], dtype=np.int64)
        expo = np.repeat(ends, counts) - 1 - pos
        terms = word_hashes * powers[expo]
        nz = counts > 0
        sums = np.add.reduceat(terms, starts[nz])
    out[nz] = sums
    return (out & np.uint64(0x7FFFFFFFFFFFFFFF)).astype(np.int64)


def split_words(texts: list[str]) -> tuple[list[bytes], np.ndarray]:
    """All texts' whitespace tokens as one flat utf-8 list + per-doc counts
    (compat helper for callers that need the token bytes themselves)."""
    flat: list[bytes] = []
    counts = np.empty(len(texts), dtype=np.int64)
    for i, t in enumerate(texts):
        w = TOKEN_RE.findall(t)
        counts[i] = len(w)
        for x in w:
            flat.append(x.encode("utf-8"))
    return flat, counts


_SIMHASH_TOKEN_CHUNK = 131_072  # bounds the (tokens, 64) bit matrix to ~64 MB


def simhash_batch(texts: list[str]) -> np.ndarray:
    """Token-weighted 64-bit SimHash per text, batched.

    Identical bit semantics to round 1's per-text ``simhash64``: majority
    vote of each hash bit across tokens, strict > half (empty text -> 0).
    Docs are processed in token-bounded chunks so the transient bit matrix
    stays small regardless of batch size.
    """
    buf = tokenize(texts)
    counts = buf.counts
    n_docs = counts.shape[0]
    out = np.zeros(n_docs, dtype=np.uint64)
    if buf.tok_starts.size == 0:
        return out
    hashes = token_hashes(buf, fnv=True)
    shifts = np.arange(64, dtype=np.uint64)
    ends = np.cumsum(counts)
    starts = ends - counts
    # stream the TOKEN axis in fixed chunks with a carry bitsum for the
    # doc spanning a chunk boundary: the transient bit matrix is bounded
    # by the chunk even for a single multi-million-token document (the
    # old per-DOC chunking still allocated (doc_tokens, 64) for one huge
    # doc; r3 review)
    nzd = np.flatnonzero(counts > 0)
    ns = starts[nzd]
    ne = ends[nzd]
    k = 0  # first unfinished nz doc
    carry = np.zeros(64, dtype=np.int64)
    t0 = 0
    total = int(ne[-1])
    while t0 < total:
        t1 = min(t0 + _SIMHASH_TOKEN_CHUNK, total)
        h = hashes[t0:t1]
        bits = ((h[:, None] >> shifts[None, :]) & np.uint64(1)).astype(np.int64)
        kend = k + int(np.searchsorted(ns[k:], t1, "left"))
        seg = np.maximum(ns[k:kend], t0) - t0
        bitsum = np.add.reduceat(bits, seg, axis=0)
        if ns[k] < t0:
            bitsum[0] += carry
        done = int(np.searchsorted(ne[k:kend], t1, "right"))
        if done:
            di = nzd[k : k + done]
            maj = (bitsum[:done] * 2 > counts[di][:, None]).astype(np.uint64)
            out[di] = (maj << shifts[None, :]).sum(axis=1, dtype=np.uint64)
        if done < kend - k:  # last doc continues past this chunk
            carry = bitsum[-1]
        k += done
        t0 = t1
    return out


def stopword_counts(buf: TokenBuf, stopwords: tuple[str, ...]) -> np.ndarray:
    """Exact per-doc CASE-INSENSITIVE stopword counts, vectorized: tokens no
    longer than 7 bytes are packed into a uint64 key (top byte = length, so
    "a" != "a\\0") with ASCII letters lower-folded, and membership-tested
    against the packed stopword keys with np.isin.  Exact string comparison
    — not a hash — because keys encode the full content.

    The ASCII-only fold equals SQL ``lower()`` for this membership test on
    ANY input: stopwords are pure ASCII, and the only Unicode codepoints
    whose lower() maps into ASCII are U+212A (-> 'k'; no stopword contains
    'k') and U+0130 (-> 'i' + combining dot, a 2-codepoint string no
    stopword equals), so non-ASCII tokens can never fold into a stopword
    on either side (r3 review: the engine was case-SENSITIVE while the
    quality oracle lowercased)."""
    sw = [w.encode("utf-8") for w in stopwords]
    assert all(len(w) <= 7 for w in sw), "stopwords longer than 7 bytes"

    def pack(flat: np.ndarray, starts: np.ndarray, lens: np.ndarray) -> np.ndarray:
        key = lens.astype(np.uint64) << np.uint64(56)
        cap = flat.size - 1 if flat.size else 0
        for k in range(7):
            b = np.where(lens > k, flat[np.minimum(starts + k, cap)], 0)
            b = np.where((b >= 0x41) & (b <= 0x5A), b + 0x20, b).astype(np.uint64)
            key |= b << np.uint64(48 - 8 * k)
        return key

    sflat, sstarts, slens = _flat_spans(sw)
    sw_keys = np.unique(pack(sflat, sstarts, slens))
    short = buf.tok_lens <= 7
    tok_keys = pack(buf.flat, buf.tok_starts, buf.tok_lens)
    is_stop = short & np.isin(tok_keys, sw_keys)
    n_docs = buf.counts.shape[0]
    ends = np.cumsum(buf.counts)
    starts = ends - buf.counts
    nz = buf.counts > 0
    out = np.zeros(n_docs, dtype=np.int64)
    if nz.any():
        out[nz] = np.add.reduceat(is_stop.astype(np.int64), starts[nz])
    return out


def trigram16_sets(texts: list[str]) -> tuple[np.ndarray, np.ndarray]:
    """Distinct 16-bit codepoint-trigram hashes per text: (flat, counts).

    gram = ((cp0 * 131 + cp1) * 131 + cp2) & 0xFFFF over unicode codepoints —
    the LangId feature, vectorized via utf-32 views; texts shorter than 3
    chars contribute 0 grams.
    """
    flat_parts: list[np.ndarray] = []
    counts = np.empty(len(texts), dtype=np.int64)
    for i, t in enumerate(texts):
        if len(t) < 3:
            counts[i] = 0
            continue
        cp = np.frombuffer(t.encode("utf-32-le"), dtype=np.uint32).astype(np.uint64)
        g = ((cp[:-2] * WORD_MULT + cp[1:-1]) * WORD_MULT + cp[2:]) & np.uint64(0xFFFF)
        u = np.unique(g)
        flat_parts.append(u)
        counts[i] = u.shape[0]
    if flat_parts:
        return np.concatenate(flat_parts), counts
    return np.empty(0, dtype=np.uint64), counts
