"""Cross-document duplicate-span stats (stages/dupspans.py): exactness vs a
brute-force substring oracle, unicode char semantics, skew shapes."""

import numpy as np
import pandas as pd
import ray.data as rd

from fastq_dupaway_ray.stages.dupspans import dup_span_stats


def _brute(df, k):
    wins = {}
    per_doc = []
    for row in df.itertuples():
        t = row.text
        ws = [t[i : i + k] for i in range(max(len(t) - k + 1, 0))]
        per_doc.append((row.doc_id, ws))
        for w in set(ws):
            wins.setdefault(w, set()).add(row.doc_id)
    rows = []
    for d, ws in per_doc:
        if not ws:
            continue
        nd = sum(1 for w in ws if len(wins[w]) >= 2)
        rows.append((d, len(ws), nd, round(nd / len(ws), 6)))
    return pd.DataFrame(
        rows, columns=["doc_id", "n_windows", "n_dup_windows", "dup_fraction"]
    )


def _check(df, k=8):
    got = (
        dup_span_stats(rd.from_pandas(df).repartition(5), k=k)
        .to_pandas()
        .sort_values("doc_id")
        .reset_index(drop=True)
    )
    exp = _brute(df, k).sort_values("doc_id").reset_index(drop=True)
    pd.testing.assert_frame_equal(got, exp, check_dtype=False)
    return got


def test_dup_span_stats_matches_bruteforce(ray_session):
    rng = np.random.default_rng(41)
    words = ["alpha", "beta", "gamma", "delta", "eps"]
    shared = " ".join(rng.choice(words, size=12))  # planted cross-doc span
    texts = []
    for i in range(200):
        base = " ".join(rng.choice(words, size=rng.integers(0, 20)))
        if i % 4 == 0:
            base = base + " " + shared
        texts.append(base)
    df = pd.DataFrame({"doc_id": np.arange(200, dtype=np.int64), "text": texts})
    got = _check(df)
    assert (got["n_dup_windows"] > 0).any()


def test_dup_span_stats_within_doc_repeat_not_dup(ray_session):
    """A span repeating only WITHIN one doc is not cross-doc duplicated
    (count(DISTINCT doc_id) >= 2 semantics)."""
    df = pd.DataFrame(
        {
            "doc_id": np.array([0, 1], dtype=np.int64),
            "text": ["xyzzyspanxyzzyspan", "totally different content here"],
        }
    )
    got = _check(df, k=6)
    assert (got["n_dup_windows"] == 0).all()


def test_dup_span_stats_unicode_char_windows(ray_session):
    """Windows count CHARACTERS (UTF-32 code points), matching SQL substr —
    multibyte text must not shift window boundaries."""
    span = "héllo wörld 𝄞𝄞𝄞 café"
    df = pd.DataFrame(
        {
            "doc_id": np.array([0, 1, 2], dtype=np.int64),
            "text": [f"aaa {span} bbb", f"ccc {span} ddd", "unrelated ascii text"],
        }
    )
    _check(df, k=7)


def test_dup_span_stats_short_docs_absent(ray_session):
    df = pd.DataFrame(
        {
            "doc_id": np.array([0, 1], dtype=np.int64),
            "text": ["tiny", "this one is long enough to have windows"],
        }
    )
    got = _check(df, k=10)
    assert got["doc_id"].tolist() == [1]


def test_dup_span_stats_rounds_equivalent(ray_session):
    """rounds=R (bounded-memory sequential hash-range passes) returns
    exactly the rounds=1 answer."""
    rng = np.random.default_rng(51)
    words = ["alpha", "beta", "gamma", "delta"]
    shared = " ".join(rng.choice(words, size=10))
    texts = [
        (" ".join(rng.choice(words, size=rng.integers(3, 15)))
         + (" " + shared if i % 3 == 0 else ""))
        for i in range(150)
    ]
    df = pd.DataFrame({"doc_id": np.arange(150, dtype=np.int64), "text": texts})
    one = (
        dup_span_stats(rd.from_pandas(df).repartition(4), k=8, rounds=1)
        .to_pandas().sort_values("doc_id").reset_index(drop=True)
    )
    four = (
        dup_span_stats(rd.from_pandas(df).repartition(4), k=8, rounds=4)
        .to_pandas().sort_values("doc_id").reset_index(drop=True)
    )
    pd.testing.assert_frame_equal(one, four)
