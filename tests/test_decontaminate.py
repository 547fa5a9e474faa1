"""Decontamination stage: broadcast eval needles, shuffle-free vectorized
substring scan — exactness vs brute-force and the budget guard."""

import numpy as np
import pandas as pd
import pytest
import ray.data as rd

from fastq_dupaway_ray.stages.decontaminate import contamination_pairs


def test_contamination_pairs_matches_bruteforce(ray_session):
    rng = np.random.default_rng(31)
    vocab = ["alpha", "beta", "gamma", "delta", "epsilon", "zeta"]
    train = pd.DataFrame(
        {
            "doc_id": np.arange(400, dtype=np.int64),
            "text": [
                " ".join(rng.choice(vocab, size=rng.integers(3, 12)))
                for _ in range(400)
            ],
        }
    )
    ev = pd.DataFrame(
        {"doc_id": np.array([1000, 1001, 1002], dtype=np.int64),
         "text": ["alpha beta", "gamma delta epsilon", train.loc[7, "text"]]}
    )
    got = (
        contamination_pairs(rd.from_pandas(train).repartition(5), rd.from_pandas(ev))
        .to_pandas()
        .sort_values(["doc_id", "eval_id"])
        .reset_index(drop=True)
    )
    exp_rows = [
        (int(d), int(e))
        for e, et in zip(ev["doc_id"], ev["text"])
        for d, t in zip(train["doc_id"], train["text"])
        if et in t and d != e
    ]
    exp = pd.DataFrame(exp_rows, columns=["doc_id", "eval_id"]).sort_values(
        ["doc_id", "eval_id"]
    ).reset_index(drop=True)
    assert len(exp) > 0  # the planted needle (doc 7's text) guarantees hits
    pd.testing.assert_frame_equal(got, exp, check_dtype=False)


def test_contamination_pairs_eval_budget(ray_session):
    df = pd.DataFrame({"doc_id": np.arange(10, dtype=np.int64), "text": "x"})
    with pytest.raises(ValueError, match="eval set"):
        contamination_pairs(rd.from_pandas(df), rd.from_pandas(df), eval_budget=3)


def test_contamination_pairs_empty_eval(ray_session):
    train = pd.DataFrame({"doc_id": np.arange(5, dtype=np.int64), "text": "abc"})
    ev = pd.DataFrame({"doc_id": pd.Series([], dtype=np.int64), "text": pd.Series([], dtype=object)})
    out = contamination_pairs(rd.from_pandas(train), rd.from_pandas(ev)).to_pandas()
    assert len(out) == 0


def _canon_pairs(ds):
    return (
        ds.to_pandas()
        .astype({"doc_id": "int64", "eval_id": "int64"})
        .sort_values(["doc_id", "eval_id"])
        .reset_index(drop=True)
    )


def test_ngram_limb_matches_scan_limb(ray_session):
    """The Rabin-Karp hashed-prefix limb and the match_substring limb agree
    on a random corpus with planted hits (incl. multi-occurrence needles)."""
    rng = np.random.default_rng(47)
    vocab = ["alpha", "beta", "gamma", "delta", "epsilon", "zeta", "eta"]
    train = pd.DataFrame(
        {
            "doc_id": np.arange(600, dtype=np.int64),
            "text": [
                " ".join(rng.choice(vocab, size=rng.integers(3, 14)))
                for _ in range(600)
            ],
        }
    )
    ev = pd.DataFrame(
        {
            "doc_id": np.arange(1000, 1040, dtype=np.int64),
            "text": [
                " ".join(rng.choice(vocab, size=rng.integers(1, 4)))
                for _ in range(40)
            ],
        }
    )
    a = _canon_pairs(
        contamination_pairs(
            rd.from_pandas(train).repartition(4), rd.from_pandas(ev), method="scan"
        )
    )
    b = _canon_pairs(
        contamination_pairs(
            rd.from_pandas(train).repartition(4), rd.from_pandas(ev), method="ngram"
        )
    )
    assert len(a) > 0
    pd.testing.assert_frame_equal(a, b)


def test_ngram_limb_edge_needles(ray_session):
    """Unicode, short (<4-byte), empty needles and self-pair exclusion all
    behave identically on both limbs."""
    train = rd.from_items(
        [
            {"doc_id": 1, "text": "hello wörld çafé"},
            {"doc_id": 2, "text": "abc"},
            {"doc_id": 3, "text": ""},
            {"doc_id": 4, "text": "xyzhello wörld çafé moretext"},
        ]
    )
    ev = rd.from_items(
        [
            {"doc_id": 10, "text": "wörld ç"},  # unicode, >= 4 bytes
            {"doc_id": 11, "text": "ab"},  # short fallback needle
            {"doc_id": 12, "text": ""},  # empty matches everything
            {"doc_id": 2, "text": "abc"},  # self-pair for doc 2
        ]
    )
    x = _canon_pairs(contamination_pairs(train, ev, method="scan"))
    y = _canon_pairs(contamination_pairs(train, ev, method="ngram"))
    assert sorted(map(tuple, x.values.tolist())) == [
        (1, 10), (1, 12), (2, 11), (2, 12), (3, 12), (4, 10), (4, 12)
    ]
    pd.testing.assert_frame_equal(x, y)


def test_auto_switches_to_ngram(ray_session):
    """auto picks the ngram limb past the threshold and stays exact: a
    needle set larger than the threshold, every needle planted verbatim."""
    n = 300
    train = pd.DataFrame(
        {
            "doc_id": np.arange(n, dtype=np.int64),
            "text": [f"document body {i} with trailing words" for i in range(n)],
        }
    )
    ev = pd.DataFrame(
        {
            "doc_id": np.arange(5000, 5000 + n, dtype=np.int64),
            "text": [f"document body {i} with" for i in range(n)],
        }
    )
    out = _canon_pairs(
        contamination_pairs(rd.from_pandas(train), rd.from_pandas(ev), method="auto")
    )
    # needle i hits exactly doc i (ids 0..299 are unique prefixes)
    assert len(out) == n
    assert (out["eval_id"].to_numpy() - 5000 == out["doc_id"].to_numpy()).all()
