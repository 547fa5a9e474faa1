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
