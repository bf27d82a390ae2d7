"""Vectorized text-hash kernels vs the round-1 per-byte reference loops.

The kernels in core/texthash.py must be BIT-IDENTICAL to the per-byte Python
implementations they replaced (stages/dedup.py / stages/textstats.py round 1)
— every minhash signature, simhash, band bucket and fingerprint in the repo's
outputs depends on it.  The reference loops are inlined here as ground truth.
"""

import re

import numpy as np
import pytest

from orthority_ray.core import texthash as TH

# the engine token boundary: RE2 \s == [\t\n\f\r ] (NO \x0b, NO Unicode
# whitespace) — spelled out independently of texthash.TOKEN_RE so the test
# stays a spec, not a mirror
_REF_TOKEN_RE = re.compile(r"[^ \t\n\f\r]+")


def _ref_tokens(text: str) -> list[str]:
    return _REF_TOKEN_RE.findall(text)


def _ref_fnv1a(g: bytes) -> int:
    h = 0xCBF29CE484222325
    for byt in g:
        h = ((h ^ byt) * 0x100000001B3) & 0xFFFFFFFFFFFFFFFF
    return h


def _ref_shingle_hashes(text: str, n: int = 3) -> np.ndarray:
    words = _ref_tokens(text)
    if len(words) < n:
        grams = [" ".join(words)] if words else [""]
    else:
        grams = [" ".join(words[i : i + n]) for i in range(len(words) - n + 1)]
    return np.array([_ref_fnv1a(g.encode("utf-8")) for g in grams], dtype=np.uint64)


def _ref_simhash64(text: str) -> int:
    toks = _ref_tokens(text)
    if not toks:
        return 0
    hashes = np.array([_ref_fnv1a(t.encode("utf-8")) for t in toks], dtype=np.uint64)
    bits = ((hashes[:, None] >> np.arange(64, dtype=np.uint64)[None, :]) & np.uint64(1)).astype(
        np.int64
    )
    counts = bits.sum(axis=0)
    maj = counts * 2 > len(toks)
    return int(np.sum(np.where(maj, 1, 0).astype(np.uint64) << np.arange(64, dtype=np.uint64)))


def _ref_fingerprint(text: str) -> int:
    h = 0
    for w in _ref_tokens(text):
        hw = 0
        for b in w.encode("utf-8"):
            hw = (hw * 131 + b) & 0xFFFFFFFFFFFFFFFF
        h = (h * 1099511628211 + hw) & 0x7FFFFFFFFFFFFFFF
    return h


def _corpus():
    rng = np.random.default_rng(7)
    words = ["the", "quick", "brown", "fox", "jumps", "über", "naïve", "数据", "x"]
    texts = ["", "a", "ab", "one two", "one two three four five"]
    for _ in range(40):
        k = int(rng.integers(0, 60))
        texts.append(" ".join(rng.choice(words, k)))
    texts.append("  leading and   multiple   spaces  ")
    # non-ASCII whitespace & \x0b are TOKEN characters (RE2 \s semantics;
    # Python str.split() would treat them as separators)
    texts.append("nbsp\xa0joined and line seps")
    texts.append("vt\x0bjoined \x1c ctl x\x85y")
    texts.append("\tmixed\nwhitespace and unicode 漢字 teste")
    return texts


def test_fnv1a_bulk_matches_reference():
    grams = [t.encode("utf-8") for t in _corpus() if t] + [b"", b"\x00\xff", b"x" * 300]
    got = TH.fnv1a_bulk(grams)
    want = np.array([_ref_fnv1a(g) for g in grams], dtype=np.uint64)
    assert (got == want).all()


def test_shingle_hashes_batch_matches_reference():
    texts = _corpus()
    flat, counts = TH.shingle_hashes_batch(texts, 3)
    assert counts.sum() == flat.shape[0]
    pos = 0
    for t, c in zip(texts, counts):
        ref = _ref_shingle_hashes(t, 3)
        assert c == ref.shape[0]
        assert (flat[pos : pos + c] == ref).all(), t
        pos += c


def test_simhash_batch_matches_reference():
    texts = _corpus()
    got = TH.simhash_batch(texts)
    want = np.array([_ref_simhash64(t) for t in texts], dtype=np.uint64)
    assert (got == want).all()


def test_simhash_batch_chunking_invariant():
    texts = _corpus() * 3
    import orthority_ray.core.texthash as th

    old = th._SIMHASH_TOKEN_CHUNK
    try:
        th._SIMHASH_TOKEN_CHUNK = 7  # force many tiny chunks
        small = TH.simhash_batch(texts)
    finally:
        th._SIMHASH_TOKEN_CHUNK = old
    assert (small == TH.simhash_batch(texts)).all()


def test_fingerprint_docs_matches_reference():
    texts = _corpus()
    flat, counts = TH.split_words(texts)
    got = TH.fingerprint_docs(TH.word131_bulk(flat), counts)
    want = np.array([_ref_fingerprint(t) for t in texts], dtype=np.int64)
    assert (got == want).all()


def test_trigram16_sets_matches_python_sets():
    texts = _corpus()
    flat, counts = TH.trigram16_sets(texts)
    pos = 0
    for t, c in zip(texts, counts):
        want = {((ord(a) * 131 + ord(b)) * 131 + ord(c)) & 0xFFFF
                for a, b, c in zip(t, t[1:], t[2:])}
        got = set(flat[pos : pos + c].tolist())
        assert got == want, t
        assert c == len(want)
        pos += c


def test_hash_arrow_strings_matches_fnv1a_bulk():
    import pyarrow as pa

    vals = ["", "a", "héllo wörld", "x" * 300, "tab\tsep", "byte\x00s"]
    want = TH.fnv1a_bulk([v.encode("utf-8") for v in vals])
    for typ in (pa.string(), pa.large_string()):
        got = TH.hash_arrow_strings(pa.array(vals, type=typ))
        assert (got == want).all(), typ
    # binary column with raw bytes
    bvals = [v.encode("utf-8") for v in vals]
    got = TH.hash_arrow_strings(pa.array(bvals, type=pa.binary()))
    assert (got == want).all()
    # sliced array (non-zero Arrow offset) and chunked column
    arr = pa.array(vals)
    assert (TH.hash_arrow_strings(arr.slice(2, 3)) == want[2:5]).all()
    chunked = pa.chunked_array([vals[:2], vals[2:]])
    assert (TH.hash_arrow_strings(chunked) == want).all()
    # empty + all-empty-strings (no data buffer edge case)
    assert TH.hash_arrow_strings(pa.array([], type=pa.string())).shape == (0,)
    got = TH.hash_arrow_strings(pa.array(["", ""]))
    assert (got == TH.fnv1a_bulk([b"", b""])).all()


def test_hash_arrow_strings_rejects_nulls():
    import pyarrow as pa
    import pytest

    with pytest.raises(ValueError, match="null join/bucket keys"):
        TH.hash_arrow_strings(pa.array(["a", None, "b"]))


def test_all_empty_batch_does_not_crash():
    # r3 review: a batch whose every text is empty/whitespace used to
    # IndexError inside _gram_spans and kill the MinHash stage
    h, c = TH.shingle_hashes_batch(["", "   ", "\t"])
    assert c.tolist() == [1, 1, 1]
    assert h.shape == (3,)


def test_long_span_fallback_bit_identical():
    # one pathological multi-KB token routes through the scalar fallback;
    # values must equal the vectorized recurrence exactly
    import hashlib  # noqa: F401  (reference below is hand-rolled FNV)

    long_tok = bytes(range(256)) * 64  # 16 KiB, > _LONG_SPAN
    grams = [b"abc", long_tok, b""]

    def fnv(b):
        h = 0xCBF29CE484222325
        for x in b:
            h = ((h ^ x) * 0x100000001B3) & 0xFFFFFFFFFFFFFFFF
        return h

    got = TH.fnv1a_bulk(grams)
    assert got.tolist() == [fnv(g) for g in grams]


def test_simhash_streams_giant_doc():
    # a single doc far beyond the token chunk must produce the same bits
    # as the naive per-text majority vote (bounded transient memory)
    rng = np.random.RandomState(11)
    vocab = ["aa", "bb", "cc", "dd"]
    giant = " ".join(rng.choice(vocab, 3 * TH._SIMHASH_TOKEN_CHUNK + 17))
    texts = ["aa bb", giant, ""]
    got = TH.simhash_batch(texts)

    def naive(text):
        toks = _ref_tokens(text)
        if not toks:
            return 0
        hs = [int(h) for h in TH.fnv1a_bulk([t.encode() for t in toks])]
        v = 0
        for b in range(64):
            if sum((h >> b) & 1 for h in hs) * 2 > len(hs):
                v |= 1 << b
        return v

    assert got.tolist() == [naive(t) for t in texts]


def test_tokenize_matches_duckdb_re2_split():
    # the engine-wide token boundary must equal the oracles' RE2 \s+ split
    # for ANY input — including NBSP, line/para separators, \x0b, \x85 and
    # control chars, where Python str.split() / Arrow utf8_split_whitespace
    # diverge (r3 review)
    import duckdb

    texts = _corpus()
    buf = TH.tokenize(texts)
    pos = 0
    for t, c in zip(texts, buf.counts):
        duck = duckdb.sql(
            "SELECT list_filter(regexp_extract_all(?, '\\S+'), x -> x <> '')",
            params=[t]).fetchone()[0]
        got = []
        for k in range(int(c)):
            s = int(buf.tok_starts[pos + k])
            e = s + int(buf.tok_lens[pos + k])
            got.append(buf.flat[s:e].tobytes().decode("utf-8"))
        assert got == duck, repr(t)
        pos += int(c)


def test_split_tokens_arrow_matches_tokenize():
    import pyarrow as pa
    import pyarrow.compute as pc

    texts = _corpus()
    toks = TH.split_tokens_arrow(pa.array(texts))
    flat = pc.list_flatten(toks)
    nonempty = flat.filter(pc.not_equal(flat, ""))
    buf = TH.tokenize(texts)
    want = []
    for s, ln in zip(buf.tok_starts, buf.tok_lens):
        want.append(buf.flat[int(s):int(s) + int(ln)].tobytes().decode())
    assert nonempty.to_pylist() == want


def test_split_tokens_arrow_fast_path_equals_regex():
    # the ascii_split_whitespace fast path must emit the BYTE-IDENTICAL
    # slot structure as RE2 split_pattern_regex('\s+'), and the \x0b probe
    # must route vertical-tab batches through the exact regex kernel
    import random

    import pyarrow as pa
    import pyarrow.compute as pc

    random.seed(3)
    alphabet = [chr(c) for c in range(1, 128)] + ["é", "漢", "\xa0", " ", " "]
    texts = ["".join(random.choice(alphabet)
                     for _ in range(random.randrange(0, 60)))
             for _ in range(2000)]
    texts += ["a\x0bb c", "", " ", "plain text"]
    arr = pa.array(texts)
    got = TH.split_tokens_arrow(arr)  # \x0b present -> regex path
    want = pc.split_pattern_regex(arr, r"\s+")
    assert got.to_pylist() == want.to_pylist()
    no_vt = pa.array([t for t in texts if "\x0b" not in t])
    got2 = TH.split_tokens_arrow(no_vt)  # fast path
    want2 = pc.split_pattern_regex(no_vt, r"\s+")
    assert got2.to_pylist() == want2.to_pylist()


def test_stopword_counts_case_insensitive():
    # engine side of the quality oracle's lower(): 'The'/'OF'/'aNd' count
    sw = ("the", "a", "of", "and")
    texts = ["The cat OF the house", "aNd A ox", "no stops here", ""]
    got = TH.stopword_counts(TH.tokenize(texts), sw)
    assert got.tolist() == [3, 2, 0, 0]
    # '@' (0x40) and '`'-adjacent bytes must NOT fold into letters
    got2 = TH.stopword_counts(TH.tokenize(["@ a `"]), sw)
    assert got2.tolist() == [1]


def test_hash_arrow_strings_rejects_dictionary():
    import pyarrow as pa
    import pytest

    with pytest.raises(TypeError):
        TH.hash_arrow_strings(pa.array(["a", "b"]).dictionary_encode())
