"""Property-based tests (hypothesis) — the reference's test suite uses
unseeded randomness (`test_camera.py:194`); we use seeded + property-based."""

import numpy as np
from hypothesis import given, settings
from hypothesis import strategies as st

from orthority_ray.core import cells as C
from orthority_ray.core import hashing as H
from orthority_ray.core.cameras import create_camera
from orthority_ray.core.rotations import opk_to_rotation, rotation_to_opk
from orthority_ray.functions.scalars import convert_array_dtype, nan_equals
from orthority_ray.sources import param_io as P

coords = st.tuples(
    st.integers(min_value=0, max_value=H.LON_RANGE - 1),
    st.integers(min_value=0, max_value=H.LAT_RANGE - 1),
)


@settings(max_examples=50, deadline=None)
@given(coords, st.sampled_from(C.RES_MILLI))
def test_cell_encode_decode_property(c, cs):
    lon_m = np.array([c[0]], dtype=np.int64)
    lat_m = np.array([c[1]], dtype=np.int64)
    cell = C.encode(lon_m, lat_m, cs)
    col, row = C.decode(cell, cs)
    assert col[0] == c[0] // cs and row[0] == c[1] // cs


@settings(max_examples=30, deadline=None)
@given(st.integers(min_value=0, max_value=10**8))
def test_geocode_in_range_property(doc_id):
    lon_m, lat_m = H.geocode_milli(np.array([doc_id], dtype=np.int64))
    assert 0 <= lon_m[0] < H.LON_RANGE
    assert 0 <= lat_m[0] < H.LAT_RANGE


@settings(max_examples=25, deadline=None)
@given(
    st.floats(-0.5, 0.5), st.floats(-0.5, 0.5), st.floats(-3.1, 3.1)
)
def test_opk_roundtrip_property(o, p, k):
    R = opk_to_rotation((o, p, k))
    o2, p2, k2 = rotation_to_opk(R)
    R2 = opk_to_rotation((o2, p2, k2))
    assert np.allclose(R, R2, atol=1e-12)


@settings(max_examples=20, deadline=None)
@given(
    st.floats(1, 199), st.floats(1, 149), st.floats(400, 990),
    st.sampled_from(["pinhole", "brown", "opencv", "fisheye"]),
)
def test_camera_roundtrip_property(j, i, z, cam_type):
    extra = {"pinhole": {}, "brown": P.BROWN, "opencv": P.OPENCV, "fisheye": P.FISHEYE}[cam_type]
    cam = create_camera(
        cam_type, im_size=P.IM_SIZE, focal_len=P.FOCAL, sensor_size=P.SENSOR,
        cx=P.CXY[0], cy=P.CXY[1], xyz=P.XYZ, opk=P.OPK, **extra,
    )
    x, y, zz = cam.pixel_to_world_z(np.array([j]), np.array([i]), z)
    j2, i2 = cam.world_to_pixel(x, y, zz)
    assert abs(j2[0] - j) < 1e-5 and abs(i2[0] - i) < 1e-5


@settings(max_examples=30, deadline=None)
@given(st.lists(st.floats(allow_nan=True, allow_infinity=False, width=32), min_size=1, max_size=20))
def test_nan_equals_reflexive_property(xs):
    a = np.array(xs, dtype=np.float64)
    assert nan_equals(a, a).all()


@settings(max_examples=30, deadline=None)
@given(st.lists(st.floats(-1e6, 1e6), min_size=1, max_size=10))
def test_convert_dtype_within_bounds_property(xs):
    out = convert_array_dtype(np.array(xs), "int16")
    info = np.iinfo("int16")
    assert (out >= info.min).all() and (out <= info.max).all()


@settings(max_examples=20, deadline=None)
@given(st.text(min_size=0, max_size=200))
def test_md5_matches_duckdb_property(text):
    import hashlib

    import duckdb

    ours = hashlib.md5(text.encode("utf-8")).hexdigest()
    con = duckdb.connect()
    con.execute("SELECT md5(?)", [text])
    theirs = con.fetchone()[0]
    assert ours == theirs

# --- round-2 operators: pure-kernel properties -------------------------------


@settings(max_examples=40, deadline=None)
@given(st.lists(st.tuples(st.integers(0, 5), st.integers(0, 30)), max_size=80))
def test_grouped_pairs_property(rows):
    import itertools

    import pandas as pd

    from orthority_ray.stages.grouping import grouped_pairs

    df = pd.DataFrame(rows, columns=["k", "id"]).astype(np.int64)
    got = grouped_pairs(df, ["k"], "id", "a", "b")
    want = set()
    for _, g in df.groupby("k"):
        want |= {
            p for p in itertools.combinations(sorted(set(g["id"])), 2)
        }
    assert set(zip(got["a"], got["b"])) == want


@settings(max_examples=30, deadline=None)
@given(
    st.lists(st.integers(-(2**62), 2**62), min_size=1, max_size=300),
    st.integers(1, 5),
)
def test_hll_register_merge_property(vals, split):
    """Registers of the whole == elementwise max of per-part registers."""
    import pandas as pd

    from orthority_ray.stages.sketches import _HLL_M, _hll_partial

    arr = np.array(vals, dtype=np.int64)

    def regs(a):
        out = np.zeros(_HLL_M, dtype=np.int64)
        if len(a):
            t = _hll_partial(a).to_pandas()
            out[t["register"].to_numpy()] = t["rho"].to_numpy()
        return out

    whole = regs(arr)
    merged = np.zeros(_HLL_M, dtype=np.int64)
    for part in np.array_split(arr, split):
        merged = np.maximum(merged, regs(part))
    assert (whole == merged).all()


@settings(max_examples=40, deadline=None)
@given(
    st.lists(st.integers(0, 20), min_size=1, max_size=400),
    st.integers(2, 50),
    st.integers(1, 6),
)
def test_heavy_hitter_local_threshold_bound_property(vals, inv_phi, blocks):
    """The exactness lemma behind sketches.heavy_hitters: every value with
    global count * inv_phi > n survives the block-local filter in at least
    one block, for ANY split of the data."""
    import collections

    arr = np.array(vals)
    n = len(arr)
    global_hh = {
        v for v, c in collections.Counter(arr.tolist()).items()
        if c * inv_phi > n
    }
    union = set()
    for part in np.array_split(arr, blocks):
        cnt = collections.Counter(part.tolist())
        union |= {v for v, c in cnt.items() if c * inv_phi > len(part)}
    assert global_hh <= union


@given(
    st.lists(
        st.tuples(st.text(max_size=24), st.text(max_size=24)),
        min_size=1, max_size=32,
    )
)
@settings(max_examples=60, deadline=None)
def test_levenshtein_batch_property(pairs):
    """Batch-vectorized min-plus-scan DP == classic per-cell DP on
    arbitrary unicode strings (stages/editdist.py).  Distances are over
    UTF-8 BYTES — DuckDB levenshtein() semantics, so the oracle gate stays
    exact on multi-byte text."""
    import numpy as np

    from orthority_ray.stages.editdist import levenshtein_batch

    def ref(a_s, b_s):
        a, b = a_s.encode("utf-8"), b_s.encode("utf-8")
        dp = list(range(len(b) + 1))
        for i in range(1, len(a) + 1):
            prev = dp[:]
            dp[0] = i
            for j in range(1, len(b) + 1):
                dp[j] = min(prev[j] + 1, dp[j - 1] + 1,
                            prev[j - 1] + (a[i - 1] != b[j - 1]))
        return dp[len(b)]

    got = levenshtein_batch([p[0] for p in pairs], [p[1] for p in pairs])
    want = np.array([ref(a, b) for a, b in pairs], dtype=np.int64)
    assert (got == want).all()


def test_pad_units_arrow_matches_list_path():
    # r3 review: the Arrow-buffer pad fill must be bit-identical to the
    # encode-per-string list path, including slices (nonzero Arrow offset),
    # empties and multi-byte UTF-8
    import numpy as np
    import pyarrow as pa

    from orthority_ray.stages.editdist import _pad_units, _pad_units_arrow

    texts = ["", "a", "héllo", "naïve café", "x" * 300, "日本語のテキスト", "b"]
    arr = pa.chunked_array([texts[:3], texts[3:]])
    A1, l1 = _pad_units(texts)
    A2, l2 = _pad_units_arrow(arr)
    assert (l1 == l2).all() and A1.shape == A2.shape and (A1 == A2).all()

    sl = pa.array(texts).slice(2, 4)  # nonzero offset path
    A3, l3 = _pad_units_arrow(sl)
    B3, m3 = _pad_units(texts[2:6])
    assert (l3 == m3).all() and (A3 == B3).all()

    import pytest

    with pytest.raises(ValueError):
        _pad_units_arrow(pa.array(["a", None]))
    with pytest.raises(ValueError):
        _pad_units(["a", None])


_words = st.lists(
    st.sampled_from(["aa", "bb", "cc", "dd", "ee", "ff"]),
    min_size=0, max_size=8)


@st.composite
def _corpus(draw):
    """Corpora honoring the pages data-model contract that doc_id
    DETERMINES text (the synthesizer guarantees it; the dedup-then-
    process topology and the oracle's dpages CTE agree only under it) —
    duplicate (doc_id, text) rows, empty texts, and shared texts across
    doc_ids are all still generated."""
    n = draw(st.integers(1, 10))
    texts = {i: " ".join(draw(_words)) for i in range(n)}
    ids = draw(st.lists(st.integers(0, n - 1), min_size=1, max_size=25))
    return [(i, texts[i]) for i in ids]


@settings(max_examples=8, deadline=None)
@given(rows=_corpus(), n_blocks=st.integers(1, 4))
def test_token_cooccurrence_matches_duckdb_property(ray_session, rows,
                                                    n_blocks):
    """The rep-row pair explosion (r4 rewrite: tokenize inside the batch
    fn over rep ROWS, immune to block splitting) equals the oracle's
    doc-level self-join on arbitrary small corpora at arbitrary block
    counts — duplicate rows, empty texts, shared texts included."""
    import duckdb
    import pandas as pd
    import ray.data

    from orthority_ray.stages.tfidf import (
        sql_token_cooccurrence,
        token_cooccurrence,
    )

    df = pd.DataFrame({
        "doc_id": pd.array([r[0] for r in rows], dtype="int64"),
        "text": [r[1] for r in rows],
    })
    ds = ray.data.from_pandas(df).repartition(n_blocks)
    got = token_cooccurrence(ds).to_pandas()
    con = duckdb.connect()
    con.register("pages", df)
    want = con.sql("WITH pages2 AS (SELECT * FROM pages)"
                   + sql_token_cooccurrence().replace(
                       "FROM pages", "FROM pages2", 1)).df()
    con.close()

    def canon(d):
        d = d[sorted(d.columns)].copy()
        return d.sort_values(list(d.columns),
                             kind="mergesort").reset_index(drop=True)

    a, b = canon(got), canon(want)
    assert a.shape == b.shape
    for c in a.columns:
        assert (a[c].values == b[c].values).all(), c


@settings(max_examples=5, deadline=None)
@given(rows=_corpus(), n_blocks=st.integers(1, 3))
def test_token_family_matches_duckdb_property(ray_session, rows, n_blocks):
    """tfidf_topk / posting_stats / boolean_search / phrase_search equal
    their oracles on arbitrary contract-honoring corpora at arbitrary
    block counts (dedup-then-process + md5 expansion join invariance)."""
    import duckdb
    import pandas as pd
    import pyarrow as pa
    import ray.data

    from orthority_ray.stages import tfidf as TF

    df = pd.DataFrame({
        "doc_id": pd.array([r[0] for r in rows], dtype="int64"),
        "text": [r[1] for r in rows],
    })
    ds = ray.data.from_pandas(df).repartition(n_blocks)
    con = duckdb.connect()
    con.register("pages", df)

    def canon(d):
        d = d[sorted(d.columns)].copy()
        for c in d.columns:
            if d[c].dtype == object:
                d[c] = d[c].astype(str)
        return d.sort_values(list(d.columns),
                             kind="mergesort").reset_index(drop=True)

    cases = [
        (TF.tfidf_topk(ds), TF.sql_tfidf_topk()),
        (TF.posting_stats(ds), TF.sql_posting_stats()),
        (TF.boolean_search(ds, terms=("aa", "bb")),
         TF.sql_boolean_search(("aa", "bb"))),
        (TF.phrase_search(ds, phrase="aa bb"),
         TF.sql_phrase_search("aa bb")),
    ]
    for got, frag in cases:
        a = canon(got.to_pandas()
                  if isinstance(got, (ray.data.Dataset, pa.Table)) else got)
        b = canon(con.sql("WITH pages2 AS (SELECT * FROM pages)"
                          + frag.replace("FROM pages", "FROM pages2", 1)).df())
        if len(b) == 0:
            # engine zero-row Datasets lose their schema in to_pandas (the
            # known Ray wart) — rows-empty equality is the assertable part
            assert len(a) == 0, frag[:40]
            continue
        assert a.shape == b.shape, frag[:40]
        for c in a.columns:
            assert (a[c].values == b[c].values).all(), (frag[:40], c)
    con.close()


_join_side = st.lists(
    st.tuples(st.integers(0, 12), st.integers(-5, 5)),
    min_size=0, max_size=30)


@settings(max_examples=8, deadline=None)
@given(left=_join_side, right=_join_side,
       how=st.sampled_from(["inner", "left", "semi", "anti"]),
       n_buckets=st.integers(1, 5))
def test_hash_join_matches_duckdb_property(ray_session, left, right, how,
                                           n_buckets):
    n_blocks = 2
    """hash_join equals the DuckDB join of the same shape on arbitrary
    small int tables at arbitrary bucket counts — duplicate keys (pair
    explosion), keys on one side only, and empty sides included."""
    import duckdb
    import pandas as pd
    import pyarrow as pa
    import ray.data

    from orthority_ray.stages.hashjoin import hash_join

    ldf = pd.DataFrame({"k": pd.array([r[0] for r in left], dtype="int64"),
                        "lv": pd.array([r[1] for r in left], dtype="int64")})
    rdf = pd.DataFrame({"k": pd.array([r[0] for r in right], dtype="int64"),
                        "rv": pd.array([r[1] for r in right], dtype="int64")})
    lds = ray.data.from_pandas(ldf).repartition(n_blocks)
    rds = ray.data.from_pandas(rdf).repartition(n_blocks)
    if how in ("semi", "anti"):
        got = hash_join(lds, rds, "k", ["k", "lv"], ["k"],
                        how=how, n_buckets=n_buckets,
                        types={"lv": pa.int64()})
        op = "IN" if how == "semi" else "NOT IN"
        sql = (f"SELECT k, lv FROM ldf "
               f"WHERE k {op} (SELECT k FROM rdf)")
    else:
        got = hash_join(lds, rds, "k", ["k", "lv"], ["k", "rv"],
                        how=how, n_buckets=n_buckets,
                        types={"lv": pa.int64(), "rv": pa.int64()})
        join_kw = "JOIN" if how == "inner" else "LEFT JOIN"
        sql = (f"SELECT l.k, l.lv, r.rv FROM ldf l "
               f"{join_kw} rdf r ON l.k = r.k")
    con = duckdb.connect()
    con.register("ldf", ldf)
    con.register("rdf", rdf)
    want = con.sql(sql).df()
    con.close()
    gp = got.to_pandas()
    if len(want) == 0:
        assert len(gp) == 0  # schema of zero-row Datasets is a known wart
        return
    def canon(d):
        d = d[sorted(d.columns)].copy()
        return d.sort_values(list(d.columns),
                             kind="mergesort").reset_index(drop=True)
    a, b = canon(gp), canon(want)
    assert a.shape == b.shape, (how, a.shape, b.shape)
    for c in a.columns:
        av, bv = a[c].to_numpy(), b[c].to_numpy()
        if how == "left" and c == "rv":
            # DuckDB NULL-fills -> float; compare with NaN-aware equality
            av = pd.array(a[c]).astype("Float64")
            bv = pd.array(b[c]).astype("Float64")
            assert (pd.isna(av) == pd.isna(bv)).all()
            assert (av[~pd.isna(av)] == bv[~pd.isna(bv)]).all()
        else:
            assert (av == bv).all(), (how, c)


_grp_rows = st.lists(
    st.tuples(st.integers(0, 4), st.integers(-100, 100)),
    min_size=1, max_size=60)


@settings(max_examples=8, deadline=None)
@given(rows=_grp_rows, q=st.sampled_from([0.25, 0.5, 0.75, 0.95]),
       n_blocks=st.integers(1, 4))
def test_grouped_median_matches_duckdb_property(ray_session, rows, q,
                                                n_blocks):
    """grouped_median (discrete quantile) equals DuckDB's
    quantile_disc on arbitrary int groups — even group sizes, duplicate
    values, negative values, single-row groups."""
    import duckdb
    import pandas as pd
    import ray.data

    from orthority_ray.stages.quantiles import grouped_median, \
        sql_grouped_median

    df = pd.DataFrame({"k": pd.array([r[0] for r in rows], dtype="int64"),
                       "v": pd.array([r[1] for r in rows], dtype="int64")})
    ds = ray.data.from_pandas(df).repartition(n_blocks)
    got = grouped_median(ds, "k", "v", q=q).to_pandas() \
        .sort_values("k").reset_index(drop=True)
    con = duckdb.connect()
    con.register("t", df)
    want = con.sql(sql_grouped_median("k", "v", "t", q=q)
                   + " ORDER BY 1").df()
    con.close()
    assert list(got.columns) == list(want.columns), (got.columns,
                                                     want.columns)
    for c in got.columns:
        assert (got[c].to_numpy() == want[c].to_numpy()).all(), c


_evt_rows = st.lists(
    st.tuples(st.integers(0, 4),          # key
              st.integers(0, 40),         # time
              st.integers(-50, 50)),      # value
    min_size=1, max_size=50)


@settings(max_examples=8, deadline=None)
@given(rows=_evt_rows, n_blocks=st.integers(1, 4),
       n_buckets=st.integers(1, 5))
def test_windows_family_matches_duckdb_property(ray_session, rows, n_blocks,
                                                n_buckets):
    """grouped_lag_delta / grouped_running_sum / grouped_rolling_sum /
    grouped_topn equal their DuckDB window-function twins on arbitrary
    (key, time, value) tables — duplicate times inside a key (broken by the
    unique id tiebreaker), single-row keys, negative values, any block and
    bucket count."""
    import duckdb
    import pandas as pd
    import ray.data

    from orthority_ray.stages.windows import (grouped_lag_delta,
                                              grouped_lead,
                                              grouped_rolling_sum,
                                              grouped_running_sum,
                                              grouped_topn)

    df = pd.DataFrame({
        "k": pd.array([r[0] for r in rows], dtype="int64"),
        "t": pd.array([r[1] for r in rows], dtype="int64"),
        "v": pd.array([r[2] for r in rows], dtype="int64"),
        "id": pd.array(range(len(rows)), dtype="int64"),
    })
    ds = ray.data.from_pandas(df).repartition(n_blocks)
    con = duckdb.connect()
    con.register("t", df)

    cases = [
        (grouped_lag_delta(ds, "k", ["t", "id"], "v", ["id"],
                           delta_name="delta", fill=-1,
                           n_buckets=n_buckets),
         """SELECT id, COALESCE(v - LAG(v) OVER
              (PARTITION BY k ORDER BY t, id), -1) AS delta FROM t"""),
        (grouped_running_sum(ds, "k", ["t", "id"], "v", ["id"],
                             cum_name="cum", n_buckets=n_buckets),
         """SELECT id, SUM(v) OVER (PARTITION BY k ORDER BY t, id
              ROWS UNBOUNDED PRECEDING) AS cum FROM t"""),
        (grouped_rolling_sum(ds, "k", ["t", "id"], "v", ["id"], win=3,
                             roll_name="roll", n_buckets=n_buckets),
         """SELECT id, SUM(v) OVER (PARTITION BY k ORDER BY t, id
              ROWS BETWEEN 2 PRECEDING AND CURRENT ROW) AS roll FROM t"""),
        (grouped_topn(ds, "k", ["v", "id"], [False, True], 2, ["id"],
                      rank_name="rn", n_buckets=n_buckets),
         """SELECT id, row_number() OVER
              (PARTITION BY k ORDER BY v DESC, id) AS rn
            FROM t QUALIFY rn <= 2"""),
        (grouped_lead(ds, "k", ["t", "id"], "v", ["id"],
                      lead_name="nxt", fill=-1, n_buckets=n_buckets),
         """SELECT id, COALESCE(LEAD(v) OVER
              (PARTITION BY k ORDER BY t, id), -1) AS nxt FROM t"""),
    ]
    for got, sql in cases:
        a = got.to_pandas().sort_values("id").reset_index(drop=True)
        b = con.sql(sql + " ORDER BY id").df()
        assert a.shape == b.shape, sql[:60]
        for c in ("id", a.columns[-1]):
            assert (a[c].to_numpy().astype(np.int64)
                    == b[c].to_numpy().astype(np.int64)).all(), (sql[:60], c)
    con.close()


@settings(max_examples=8, deadline=None)
@given(left=_evt_rows, right=_evt_rows, n_blocks=st.integers(1, 3),
       n_buckets=st.integers(1, 5))
def test_asof_join_matches_duckdb_property(ray_session, left, right,
                                           n_blocks, n_buckets):
    """asof_join equals DuckDB's native ASOF LEFT JOIN on arbitrary event
    tables.  The engine tie-breaks duplicate right (key, time) rows to the
    MAX value (right side sorted by (time, value), merge_asof takes the
    last), so the oracle pre-collapses the right side with max(v) per
    (key, time) — after which DuckDB's asof semantics are unambiguous.
    Unmatched left rows carry fill=-1 vs the oracle's COALESCE."""
    import duckdb
    import pandas as pd
    import ray.data

    from orthority_ray.stages.asof import asof_join

    ldf = pd.DataFrame({
        "k": pd.array([r[0] for r in left], dtype="int64"),
        "t": pd.array([r[1] for r in left], dtype="int64"),
        "lv": pd.array([r[2] for r in left], dtype="int64"),
    })
    rdf = pd.DataFrame({
        "k": pd.array([r[0] for r in right], dtype="int64"),
        "t": pd.array([r[1] for r in right], dtype="int64"),
        "rv": pd.array([r[2] for r in right], dtype="int64"),
    })
    lds = ray.data.from_pandas(ldf).repartition(n_blocks)
    rds = ray.data.from_pandas(rdf).repartition(n_blocks)
    got = asof_join(lds, rds, "k", "t",
                    left_cols=["k", "t", "lv"], right_cols=["rv"],
                    fill=-1, n_buckets=n_buckets).to_pandas()
    con = duckdb.connect()
    con.register("ldf", ldf)
    con.register("rdf", rdf)
    want = con.sql("""
        WITH r AS (SELECT k, t, max(rv) AS rv FROM rdf GROUP BY k, t)
        SELECT l.k, l.t, l.lv, COALESCE(r.rv, -1) AS rv
        FROM ldf l ASOF LEFT JOIN r ON l.k = r.k AND l.t >= r.t
    """).df()
    con.close()

    def canon(d):
        d = d[["k", "t", "lv", "rv"]].astype("int64")
        return d.sort_values(["k", "t", "lv", "rv"],
                             kind="mergesort").reset_index(drop=True)

    a, b = canon(got), canon(want)
    assert a.shape == b.shape
    for c in a.columns:
        assert (a[c].to_numpy() == b[c].to_numpy()).all(), c


@settings(max_examples=8, deadline=None)
@given(rows=_evt_rows, window=st.integers(0, 15), n_blocks=st.integers(1, 3),
       n_buckets=st.integers(1, 5))
def test_self_window_count_matches_duckdb_property(ray_session, rows, window,
                                                   n_blocks, n_buckets):
    """self_window_count (range join: same-key rows in (t, t+W]) equals the
    DuckDB inequality LEFT JOIN + GROUP BY on arbitrary event tables —
    duplicate timestamps inside a key, zero windows, any bucketing."""
    import duckdb
    import pandas as pd
    import ray.data

    from orthority_ray.stages.rangejoin import self_window_count

    df = pd.DataFrame({
        "k": pd.array([r[0] for r in rows], dtype="int64"),
        "t": pd.array([r[1] for r in rows], dtype="int64"),
        "id": pd.array(range(len(rows)), dtype="int64"),
    })
    ds = ray.data.from_pandas(df).repartition(n_blocks)
    got = self_window_count(ds, "k", "t", "id", window,
                            n_buckets=n_buckets).to_pandas() \
        .sort_values("id").reset_index(drop=True)
    con = duckdb.connect()
    con.register("t", df)
    want = con.sql(f"""
        SELECT l.id, COUNT(r.id) AS n_follow
        FROM t l LEFT JOIN t r
          ON l.k = r.k AND r.t > l.t AND r.t <= l.t + {window}
        GROUP BY l.id ORDER BY l.id
    """).df()
    con.close()
    assert got.shape == want.shape
    assert (got["id"].to_numpy() == want["id"].to_numpy()).all()
    assert (got["n_follow"].to_numpy().astype(np.int64)
            == want["n_follow"].to_numpy().astype(np.int64)).all()


_dedup_texts = st.lists(
    st.text(alphabet="ab c", min_size=0, max_size=8),
    min_size=1, max_size=40)


@settings(max_examples=8, deadline=None)
@given(texts=_dedup_texts, n_blocks=st.integers(1, 4))
def test_exact_dedup_groups_matches_duckdb_property(ray_session, texts,
                                                    n_blocks):
    """exact_dedup_groups (block-local combiner + md5 groupby) equals the
    DuckDB md5 GROUP BY on arbitrary text corpora — heavy duplication,
    empty strings, whitespace-only texts, any block count."""
    import duckdb
    import pandas as pd
    import ray.data

    from orthority_ray.stages.dedup import exact_dedup_groups

    df = pd.DataFrame({
        "doc_id": pd.array(range(len(texts)), dtype="int64"),
        "text": texts,
    })
    ds = ray.data.from_pandas(df).repartition(n_blocks)
    got = exact_dedup_groups(ds).to_pandas() \
        .sort_values("text_md5").reset_index(drop=True)
    con = duckdb.connect()
    con.register("pages", df)
    want = con.sql("""
        SELECT md5(text) AS text_md5,
               COUNT(*) AS n_dups,
               MIN(doc_id) AS rep_doc_id
        FROM pages GROUP BY 1 ORDER BY 1
    """).df()
    con.close()
    assert got.shape == want.shape
    assert (got["text_md5"].to_numpy() == want["text_md5"].to_numpy()).all()
    for c in ("n_dups", "rep_doc_id"):
        assert (got[c].to_numpy().astype(np.int64)
                == want[c].to_numpy().astype(np.int64)).all(), c


@settings(max_examples=8, deadline=None)
@given(vals=st.lists(st.integers(-20, 20), min_size=1, max_size=60),
       descending=st.booleans(), ntile=st.sampled_from([None, 3, 4]),
       n_buckets=st.integers(1, 6), n_blocks=st.integers(1, 4))
def test_global_rank_matches_duckdb_property(ray_session, vals, descending,
                                             ntile, n_buckets, n_blocks):
    """global_rank (sampled range boundaries -> per-bucket offset + local
    sort) equals ROW_NUMBER()/NTILE() OVER (ORDER BY val, id) on arbitrary
    int columns — heavy ties (values must never straddle a range bucket),
    ascending and descending, NTILE remainder distribution, any bucket and
    block count."""
    import duckdb
    import pandas as pd
    import ray.data

    from orthority_ray.stages.windows import global_rank

    df = pd.DataFrame({
        "v": pd.array(vals, dtype="int64"),
        "id": pd.array(range(len(vals)), dtype="int64"),
    })
    ds = ray.data.from_pandas(df).repartition(n_blocks)
    got = global_rank(ds, "v", "id", ["id", "v"], descending=descending,
                      rank_name="rnk", ntile=ntile, ntile_name="nt",
                      n_buckets=n_buckets).to_pandas() \
        .sort_values("id").reset_index(drop=True)
    order = "DESC" if descending else "ASC"
    nt_sel = (f", CAST(ntile({ntile}) OVER (ORDER BY v {order}, id) AS BIGINT) AS nt"
              if ntile else "")
    con = duckdb.connect()
    con.register("t", df)
    want = con.sql(f"""
        SELECT id, v,
               CAST(row_number() OVER (ORDER BY v {order}, id) AS BIGINT) AS rnk
               {nt_sel}
        FROM t ORDER BY id
    """).df()
    con.close()
    assert got.shape == want.shape
    cols = ["id", "v", "rnk"] + (["nt"] if ntile else [])
    assert sorted(got.columns) == sorted(cols)
    for c in cols:
        assert (got[c].to_numpy().astype(np.int64)
                == want[c].to_numpy().astype(np.int64)).all(), c
