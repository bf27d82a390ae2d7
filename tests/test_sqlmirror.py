"""Pin core/sqlmirror's DuckDB fragments bit-for-bit against the engine's
numpy hash kernels (texthash / dedup.MinHasher / sketches) — the foundation
of the r4 rows-only -> oracle-exact graduation (r3 verdict #4).

Everything here is driver-shaped: if one of these drifts, the graduated
oracles (minhash_pairs, simhash_buckets, dup_clusters,
split_leakage_neardup, hll_*, cms_user_counts) silently stop being twins.
No Ray needed — pure DuckDB vs numpy.
"""

from __future__ import annotations

import duckdb
import numpy as np
import pyarrow as pa
import pyarrow.parquet as pq
import pytest

from orthority_ray.core import sqlmirror as SM
from orthority_ray.core import texthash as TH
from orthority_ray.stages import dedup as D
from orthority_ray.stages import sketches as SK

RNG = np.random.default_rng(0xD00D)
U64 = RNG.integers(0, 1 << 64, size=64, dtype=np.uint64)


def _duck_u64(expr_of_v: str, values: np.ndarray) -> np.ndarray:
    """Evaluate a sqlmirror fragment per value of a HUGEINT column v."""
    con = duckdb.connect()
    vals = ", ".join(f"(CAST({int(v)} AS HUGEINT))" for v in values)
    out = con.sql(
        f"SELECT CAST(({expr_of_v}) AS VARCHAR) AS r "
        f"FROM (VALUES {vals}) t(v) "
    ).df()["r"]
    return np.array([np.uint64(int(x)) for x in out], dtype=np.uint64)


def test_mul64_matches_numpy_wrap():
    with np.errstate(over="ignore"):
        for c in (3, 131, SM.FNV_PRIME, SM.GOLD, SM.SM_C2, (1 << 64) - 1):
            got = _duck_u64(SM.mul64("v", c), U64)
            want = U64 * np.uint64(c)
            assert (got == want).all(), hex(c)


def test_xor_shr_signed64():
    got = _duck_u64(SM.xor64("v", SM.shr("v", 17)), U64)
    assert (got == (U64 ^ (U64 >> np.uint64(17)))).all()
    con = duckdb.connect()
    for v in U64[:8]:
        s = con.sql(
            f"SELECT {SM.signed64(f'CAST({int(v)} AS HUGEINT)')} AS r"
        ).fetchone()[0]
        assert s == int(np.uint64(v).astype(np.int64))


def test_splitmix64_matches_sketches():
    got = _duck_u64(SM.splitmix64("v"), U64)
    assert (got == SK._splitmix64(U64)).all()


ASCII_SAMPLES = ["", "a", "the quick brown fox", "x" * 300,
                 "punct!@#$%^&*()[]{};:'\",.<>/?\\|`~-_=+",
                 "0123456789 mixed CASE and   runs"]


def test_fnv1a_matches_texthash():
    con = duckdb.connect()
    for s in ASCII_SAMPLES:
        lit = "'" + s.replace("'", "''") + "'"
        got = con.sql(
            f"SELECT CAST({SM.fnv1a(lit)} AS VARCHAR) AS r").fetchone()[0]
        want = TH.fnv1a_bulk([s.encode("utf-8")])[0]
        assert np.uint64(int(got)) == want, repr(s)


TOKEN_EDGE_TEXTS = [
    "", " ", "a", "a b", "a  b\tc", "a b c d e",
    "lead \t\n trail ", "\f\rone\ftwo\rthree", "x" * 50,
    "w1 w2 w3", "only-two tokens",
]


def test_tokens_and_grams_match_texthash():
    """tokens()/grams() reproduce tokenize/_gram_spans rules exactly:
    split on [ \\t\\n\\f\\r], <n tokens -> one whole-doc gram, empty ->
    one empty gram."""
    con = duckdb.connect()
    for s in TOKEN_EDGE_TEXTS:
        lit = "'" + s.replace("'", "''") + "'"
        toks = con.sql(f"SELECT {SM.tokens(lit)} AS r").fetchone()[0]
        want_toks = [t.decode() for t in
                     TH._TOKEN_RE_BYTES.findall(s.encode("utf-8"))]
        assert toks == want_toks, repr(s)
        g = con.sql(
            f"SELECT {SM.grams(SM.tokens(lit), 3)} AS r").fetchone()[0]
        buf = TH.tokenize([s])
        g_start, g_len, _ = TH._gram_spans(buf, 3)
        want_g = [buf.flat[a:a + L].tobytes().decode()
                  for a, L in zip(g_start, g_len)]
        assert g == want_g, repr(s)


def test_gram_hashes_match_shingle_kernel():
    """fnv1a(gram strings) == shingle_hashes_batch for multi-doc input."""
    con = duckdb.connect()
    texts = ["a b c d e", "one two", "", "a b c"]
    flat, counts = TH.shingle_hashes_batch(texts, 3)
    ends = np.cumsum(counts)
    for i, s in enumerate(texts):
        lit = "'" + s.replace("'", "''") + "'"
        hs = con.sql(
            "SELECT CAST(h AS VARCHAR) AS h FROM ("
            f"SELECT {SM.fnv1a('g')} AS h FROM ("
            f"SELECT unnest({SM.grams(SM.tokens(lit), 3)}) AS g))"
        ).df()["h"]
        got = np.array([np.uint64(int(x)) for x in hs], dtype=np.uint64)
        want = flat[ends[i] - counts[i]: ends[i]]
        assert (got == want).all(), repr(s)


def test_minhash_band_rows_matches_minhasher():
    """End-to-end: the brows CTE == MinHasher band rows of the exact-dedup
    reps of a small pages table (dup texts, empty text, short text)."""
    texts = ["alpha beta gamma delta", "alpha beta gamma delta",
             "one two", "", "the quick brown fox jumps over",
             "alpha beta gamma delta epsilon"]
    tbl = pa.table({"doc_id": pa.array(range(10, 10 + len(texts)),
                                       pa.int64()),
                    "text": pa.array(texts)})
    con = duckdb.connect()
    con.register("pages", tbl)
    got = con.sql(
        f"WITH {SM.minhash_band_rows('pages')} "
        "SELECT CAST(doc_id AS BIGINT) AS doc_id, band, band_hash "
        "FROM brows ORDER BY doc_id, band").df()
    # engine side: exact-dedup reps -> MinHasher
    reps: dict[str, int] = {}
    for i, t in zip(tbl["doc_id"].to_pylist(), texts):
        reps.setdefault(t, i)
    rep_tbl = pa.table({"doc_id": pa.array(sorted(reps.values()), pa.int64()),
                        "text": pa.array([t for t, _ in
                                          sorted(reps.items(),
                                                 key=lambda kv: kv[1])])})
    eng = D.MinHasher()(rep_tbl).to_pandas().sort_values(
        ["doc_id", "band"]).reset_index(drop=True)
    assert (got["doc_id"].values == eng["doc_id"].values).all()
    assert (got["band"].values == eng["band"].values).all()
    assert (got["band_hash"].values == eng["band_hash"].values).all()


def test_hll_registers_match_partial():
    vals = RNG.integers(0, 1 << 62, size=5000, dtype=np.int64)
    con = duckdb.connect()
    con.register("vt", pa.table({"v": pa.array(vals, pa.int64())}))
    got = con.sql(
        f"WITH {SK._sql_hll_regs('SELECT v FROM vt')} "
        "SELECT register, CAST(rho AS BIGINT) AS rho FROM regs "
        "ORDER BY register").df()
    part = SK._hll_partial(vals).to_pandas()
    want = part.groupby("register", as_index=False)["rho"].max() \
               .sort_values("register").reset_index(drop=True)
    assert (got["register"].values == want["register"].values).all()
    assert (got["rho"].values == want["rho"].values).all()


def test_hll_estimate_matches_both_branches():
    """The dyadic-exact harmonic sum claim: DuckDB's estimate equals
    hll_estimate_from_registers exactly, in both the linear-counting
    regime (few distinct) and the raw regime (many distinct)."""
    con = duckdb.connect()
    for n in (50, 200_000):
        vals = np.arange(n, dtype=np.int64) * 7 + 3
        con.register("vt", pa.table({"v": pa.array(vals, pa.int64())}))
        got = con.sql(
            "WITH x AS (SELECT 1)" +
            SK.sql_hll_distinct("SELECT v FROM vt")).fetchone()[0]
        regs = SK._hll_partial(vals).to_pandas() \
            .groupby("register", as_index=False)["rho"].max()
        want = SK.hll_estimate_from_registers(regs)
        assert got == want, n
        con.unregister("vt")


def test_cms_index_matches_cms_hash():
    h = SK._splitmix64(RNG.integers(0, 1 << 63, size=256, dtype=np.uint64))
    con = duckdb.connect()
    for r in range(SK.CMS_DEPTH):
        seed = (0x9E3779B97F4A7C15 * (r + 1)) % (1 << 64)
        expr = (f"CAST(({SM.splitmix64(SM.xor64('v', str(seed)))})"
                f" % {SK.CMS_WIDTH} AS BIGINT)")
        got = _duck_u64(expr, h).astype(np.int64)
        want = SK._cms_hash(h, r, SK.CMS_WIDTH).astype(np.int64)
        assert (got == want).all(), r


@pytest.mark.parametrize("sf", ["sf0.001", "sf0.01", "sf0.1"])
def test_driver_corpus_is_ascii(sf):
    """fnv1a's ascii(char) folding equals utf-8 byte folding only for
    ASCII text — assert the contract holds on the driver corpora."""
    t = pq.read_table(f"/root/testdata/{sf}/documents.parquet",
                      columns=["text"])
    joined = "".join(t["text"].to_pylist())
    assert joined.isascii()


def test_numpy_rowsum_is_unroll8_tree():
    """sql_ann_int8's norm mirror assumes numpy's 64-element row sum is
    the unrolled-by-8 pairwise kernel (8 stride-8 sequential partials,
    fixed binary tree combine).  Pin that association bit-for-bit — if a
    numpy upgrade changes the kernel, this fails before the oracle does."""
    m = np.random.default_rng(3).standard_normal((512, 64))
    x = m * m
    r = [x[:, j].copy() for j in range(8)]
    for t in range(1, 8):
        for j in range(8):
            r[j] = r[j] + x[:, 8 * t + j]
    tree = ((r[0] + r[1]) + (r[2] + r[3])) + ((r[4] + r[5]) + (r[6] + r[7]))
    assert (tree == x.sum(axis=1)).all()


def test_round_even_matches_numpy():
    vals = np.array([2.5, 3.5, -2.5, -3.5, 0.5, -0.5, 1.2345, -7.5])
    con = duckdb.connect()
    got = np.array([
        con.sql(f"SELECT round_even(CAST({v!r} AS DOUBLE), 0)").fetchone()[0]
        for v in vals])
    assert (got == np.round(vals)).all()


def test_ann_int8_oracle_matches_on_degenerate_dim_corpus(ray_session,
                                                          tmp_path):
    """The calibration mirror must reproduce _dim_scales' all-zero-dim
    clamp: with one dimension zero in every vector (and true max < 1.0)
    the engine quantizes with scale 1.0 — the raw-global-max oracle used
    to diverge here (r4 review)."""
    import duckdb
    import numpy as np
    import pyarrow as pa
    import pyarrow.parquet as pq

    from orthority_ray.stages import ann as A

    rng = np.random.default_rng(7)
    m = rng.standard_normal((200, 64))
    m[:, 5] = 0.0
    pq.write_table(
        pa.table({"vec_id": pa.array(np.arange(200, dtype=np.int64)),
                  "embedding": pa.array(list(m.astype(np.float64)),
                                        pa.list_(pa.float64()))}),
        str(tmp_path / "embeddings.parquet"))
    con = duckdb.connect()
    con.sql(f"CREATE VIEW embeddings AS SELECT * FROM "
            f"'{tmp_path}/embeddings.parquet'")
    ours = A.ann_int8(str(tmp_path)).to_pandas()
    want = con.sql(A.sql_ann_int8()).df()

    def canon(df):
        df = df[sorted(df.columns)]
        return df.sort_values(list(df.columns),
                              kind="mergesort").reset_index(drop=True)

    a, b = canon(ours), canon(want)
    assert a.shape == b.shape
    for c in a.columns:
        assert (a[c].values == b[c].values).all(), c


def test_ann_int8_oracle_dim_guard_errors_loudly():
    """A corpus of the wrong width must ERROR in SQL, not silently emit
    NULL norms (r4 review)."""
    import duckdb
    import numpy as np
    import pyarrow as pa
    import pytest as _pytest

    from orthority_ray.stages import ann as A

    con = duckdb.connect()
    con.register("embeddings", pa.table({
        "vec_id": pa.array(np.arange(4, dtype=np.int64)),
        "embedding": pa.array([list(np.ones(32))] * 4,
                              pa.list_(pa.float64()))}))
    with _pytest.raises(Exception, match="dim=64"):
        con.sql(A.sql_ann_int8()).df()
