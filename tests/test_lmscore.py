"""Unigram LM scoring stage (stages/lmscore.py): exactness vs a serial
reference, OOV pooling, edge shapes."""

import math

import numpy as np
import pandas as pd
import pytest
import ray.data as rd

from fastq_dupaway_ray.stages.lmscore import unigram_logprob_scores


def _brute(df, top_vocab=None):
    toks = {i: t.split() for i, t in zip(df["doc_id"], df["text"])}
    counts: dict = {}
    for ts in toks.values():
        for t in ts:
            counts[t] = counts.get(t, 0) + 1
    total = sum(counts.values())
    if top_vocab is not None and len(counts) > top_vocab:
        ranked = sorted(counts.items(), key=lambda kv: (-kv[1], kv[0]))
        head = dict(ranked[:top_vocab])
        oov_mass = total - sum(head.values())
        oov = math.log(max(oov_mass, 1) / total)
        lp = {t: math.log(c / total) for t, c in head.items()}
    else:
        oov = None
        lp = {t: math.log(c / total) for t, c in counts.items()}
    rows = []
    for i, ts in toks.items():
        if not ts:
            continue
        vals = [lp.get(t, oov) for t in ts]
        rows.append((i, round(sum(vals) / len(vals), 6)))
    return pd.DataFrame(rows, columns=["doc_id", "logprob"])


def _corpus(n=400, seed=5):
    rng = np.random.default_rng(seed)
    words = [f"w{i}" for i in range(80)]
    return pd.DataFrame(
        {
            "doc_id": np.arange(n, dtype=np.int64),
            "text": [
                " ".join(rng.choice(words, size=rng.integers(0, 30)))
                for _ in range(n)
            ],
        }
    )


def test_unigram_logprob_matches_bruteforce(ray_session):
    df = _corpus()
    got = (
        unigram_logprob_scores(rd.from_pandas(df).repartition(6))
        .to_pandas()
        .sort_values("doc_id")
        .reset_index(drop=True)
    )
    exp = _brute(df).sort_values("doc_id").reset_index(drop=True)
    pd.testing.assert_frame_equal(got, exp, check_dtype=False)
    # zero-token docs are absent
    n_empty = (df["text"].str.split().str.len() == 0).sum()
    assert len(got) == len(df) - n_empty and n_empty > 0


def test_unigram_logprob_top_vocab_oov_pool(ray_session):
    df = _corpus(300, seed=9)
    got = (
        unigram_logprob_scores(rd.from_pandas(df).repartition(4), top_vocab=20)
        .to_pandas()
        .sort_values("doc_id")
        .reset_index(drop=True)
    )
    exp = _brute(df, top_vocab=20).sort_values("doc_id").reset_index(drop=True)
    pd.testing.assert_frame_equal(got, exp, check_dtype=False)


def test_unigram_logprob_vocab_budget_raises(ray_session):
    df = _corpus(200, seed=2)
    with pytest.raises(ValueError, match="vocab_budget"):
        unigram_logprob_scores(rd.from_pandas(df), vocab_budget=5).to_pandas()
