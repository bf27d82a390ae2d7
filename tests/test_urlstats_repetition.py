"""urlstats host rollup + repetition kernel vs brute-force references."""

from __future__ import annotations

import numpy as np
import pandas as pd
import pytest
import ray.data

from orthority_ray.stages.textstats import _repetition_of
from orthority_ray.stages.urlstats import host_stats


def _rep_ref(t: str) -> tuple[int, int, int, int]:
    w = t.split()
    bi = [f"{a} {b}" for a, b in zip(w, w[1:])]
    top = max((w.count(x) for x in set(w)), default=0)
    return len(w), top, len(bi), len(set(bi))


@pytest.mark.parametrize(
    "texts",
    [
        ["a b a b a", "x", "", "  ", "q r s q r s q r"],
        ["same same same same"],
        ["one two three", "three two one", "\tlead  and   gaps "],
    ],
)
def test_repetition_kernel_matches_bruteforce(texts):
    got = _repetition_of(texts)
    want = np.array([_rep_ref(t) for t in texts], dtype=np.int64)
    np.testing.assert_array_equal(got, want)


def test_doc_typicality_train_then_score(ray_session):
    df = pd.DataFrame(
        {
            "doc_id": np.arange(4, dtype=np.int64),
            "text": ["a b a", "b c", "", "c c c"],
        }
    )
    ds = ray.data.from_pandas(df).repartition(2)
    from orthority_ray.stages.textstats import doc_typicality

    out = doc_typicality(ds).to_pandas().sort_values("doc_id").reset_index(drop=True)
    # corpus counts: a=2, b=2, c=4
    assert out["sum_tok_freq"].tolist() == [2 + 2 + 2, 2 + 4, 0, 12]
    assert out["min_tok_freq"].tolist() == [2, 2, 0, 4]


def test_redact_urls(ray_session):
    from orthority_ray.stages.urlstats import redact_urls

    df = pd.DataFrame(
        {"doc_id": np.arange(2, dtype=np.int64),
         "url": ["https://h1.example/p123x9", "https://h.example/"]}
    )
    out = (
        redact_urls(ray.data.from_pandas(df))
        .to_pandas().sort_values("doc_id").reset_index(drop=True)
    )
    assert out["url_redacted"].tolist() == ["https://h#.example/p#x#", "https://h.example/"]
    assert out["n_digit_runs"].tolist() == [3, 0]


@pytest.mark.parametrize("nblocks", [1, 5])
def test_host_stats_matches_pandas(ray_session, nblocks):
    rng = np.random.RandomState(3)
    doc = np.arange(400, dtype=np.int64)
    hostn = rng.randint(0, 23, 400)
    pathn = rng.randint(0, 37, 400)  # collisions -> duplicate paths per host
    urls = [f"https://h{h}.example/p{p}" for h, p in zip(hostn, pathn)]
    df = pd.DataFrame({"url": urls, "doc_id": doc})
    ds = ray.data.from_pandas(df).repartition(nblocks)
    out = host_stats(ds).to_pandas().sort_values("host").reset_index(drop=True)

    ref = df.copy()
    ref["host"] = [u.split("//")[1].split("/")[0] for u in urls]
    ref["path"] = [u.split("//")[1].split("/", 1)[1] for u in urls]
    want = (
        ref.groupby("host")
        .agg(
            n_pages=("doc_id", "size"),
            n_distinct_paths=("path", "nunique"),
            min_doc=("doc_id", "min"),
            max_doc=("doc_id", "max"),
        )
        .reset_index()
        .sort_values("host")
        .reset_index(drop=True)
    )
    pd.testing.assert_frame_equal(out, want)


def test_compression_ratio_deterministic_and_sane(ray_session, sf_unit):
    import pandas as pd
    import ray.data

    from orthority_ray.pipelines.relational import _read
    from orthority_ray.stages.textstats import compression_ratio

    docs = _read(sf_unit, "documents", ["doc_id", "text"])
    a = compression_ratio(docs).to_pandas().sort_values("doc_id").reset_index(drop=True)
    b = compression_ratio(docs).to_pandas().sort_values("doc_id").reset_index(drop=True)
    pd.testing.assert_frame_equal(a, b)
    assert (a["comp_bytes"] > 0).all()
    assert (a["ratio_milli"] == a["comp_bytes"] * 1000 // a["raw_bytes"].clip(lower=1)).all()
    # natural-ish text compresses; tiny texts may EXPAND (zlib header
    # overhead), so the upper sanity bound sits above 1000
    assert a["ratio_milli"].between(50, 1300).all()
