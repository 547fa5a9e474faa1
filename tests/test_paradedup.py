"""Paragraph-level dedup (stages/paradedup.py) and the duplicate-line stats
kernel — exactness vs brute-force pandas oracles, all three limbs."""

import numpy as np
import pandas as pd
import pytest
import ray.data as rd

from fastq_dupaway_ray.functions.textstats import dup_line_stats
from fastq_dupaway_ray.stages.paradedup import paragraph_dedup

SEP = "\n\n"


def _corpus(n_docs: int, pool_size: int, seed: int) -> pd.DataFrame:
    """Docs assembled from a shared paragraph pool (boilerplate-style reuse);
    includes docs with within-doc repeats and empty-text docs."""
    rng = np.random.default_rng(seed)
    pool = [f"para {i} " + "y" * int(rng.integers(0, 9)) for i in range(pool_size)]
    rows = []
    for d in range(n_docs):
        k = 1 + d % 5
        idx = rng.integers(0, pool_size, k)
        text = SEP.join(pool[i] for i in idx) if d % 17 else ""
        rows.append({"doc_id": d, "text": text, "lang": "en", "n_chars": len(text)})
    return pd.DataFrame(rows)


def _expected(df: pd.DataFrame) -> pd.DataFrame:
    """Brute-force keep-first-per-paragraph in (doc_id, pos) order."""
    recs = []
    for r in df.itertuples():
        for pos, p in enumerate(r.text.split(SEP)):
            recs.append((r.doc_id, pos, p, r.lang))
    pdf = pd.DataFrame(recs, columns=["doc_id", "pos", "para", "lang"])
    pdf = pdf.sort_values(["doc_id", "pos"], kind="mergesort")
    kept = pdf[~pdf.duplicated(subset=["para"], keep="first")]
    out = (
        kept.groupby("doc_id")
        .agg(text=("para", lambda s: SEP.join(s)), lang=("lang", "first"))
        .reset_index()
    )
    out["n_chars"] = out["text"].str.len()
    return out[["doc_id", "text", "lang", "n_chars"]].sort_values("doc_id").reset_index(drop=True)


@pytest.mark.parametrize(
    "kwargs",
    [{}, {"exact": True}, {"drop_broadcast_budget": 0}],
    ids=["broadcast", "exact", "forced-shuffle"],
)
def test_paragraph_dedup_matches_bruteforce(ray_session, kwargs):
    df = _corpus(400, 60, seed=11)
    ds = rd.from_pandas(df).repartition(9)
    got = (
        paragraph_dedup(ds, id_cols=("doc_id",), sep=SEP, **kwargs)
        .to_pandas()
        .sort_values("doc_id")
        .reset_index(drop=True)
    )
    exp = _expected(df)
    assert list(got.columns) == ["doc_id", "text", "lang", "n_chars"]
    pd.testing.assert_frame_equal(
        got.astype({"n_chars": "int64"}), exp.astype({"n_chars": "int64"})
    )


def test_paragraph_dedup_random_corpora_three_limbs_agree(ray_session):
    """Property pin: on random corpora the broadcast, forced-shuffle and
    exact limbs all equal the brute-force oracle (and hence each other)."""
    for seed in (1, 2, 3):
        df = _corpus(250, 25, seed=seed)  # small pool -> heavy duplication
        exp = _expected(df)
        for kwargs in ({}, {"exact": True}):
            ds = rd.from_pandas(df).repartition(1 + seed * 3)
            got = (
                paragraph_dedup(ds, id_cols=("doc_id",), sep=SEP, **kwargs)
                .to_pandas()
                .sort_values("doc_id")
                .reset_index(drop=True)
            )
            pd.testing.assert_frame_equal(
                got.astype({"n_chars": "int64"}), exp.astype({"n_chars": "int64"})
            )


def test_paragraph_dedup_unique_corpus_is_identity(ray_session):
    """All-unique paragraphs -> zero drops -> every doc rides through
    unchanged (the stage must not rewrite text it didn't touch)."""
    df = pd.DataFrame(
        {
            "doc_id": range(50),
            "text": [f"alpha {i}{SEP}beta {i}" for i in range(50)],
            "n_chars": [len(f"alpha {i}{SEP}beta {i}") for i in range(50)],
        }
    )
    ds = rd.from_pandas(df).repartition(4)
    got = paragraph_dedup(ds, id_cols=("doc_id",)).to_pandas().sort_values("doc_id")
    assert list(got.text) == list(df.text)
    assert len(got) == 50


def test_paragraph_dedup_unicode_multibyte(ray_session):
    """Multibyte text: identity lengths are CHARACTER counts (utf8_length)
    and rebuild must round-trip the exact bytes; emoji/CJK paragraphs with
    shared boilerplate must dedup identically to the brute-force oracle."""
    pool = ["héllo wörld 🌍", "日本語の段落です", "καλημέρα κόσμε", "🎉🎊" * 3, "ascii one"]
    rows = []
    for d in range(120):
        k = 1 + d % 4
        text = SEP.join(pool[(d * 3 + j) % len(pool)] for j in range(k))
        rows.append({"doc_id": d, "text": text, "lang": "xx", "n_chars": len(text)})
    df = pd.DataFrame(rows)
    got = (
        paragraph_dedup(rd.from_pandas(df).repartition(5), id_cols=("doc_id",), sep=SEP)
        .to_pandas()
        .sort_values("doc_id")
        .reset_index(drop=True)
    )
    exp = _expected(df.assign(lang="xx"))
    pd.testing.assert_frame_equal(
        got.astype({"n_chars": "int64"}), exp.astype({"n_chars": "int64"})
    )
    # n_chars is a CHARACTER count, not bytes (matches SQL length())
    assert (got.n_chars == got.text.str.len()).all()


def test_dedup_lines_within_matches_bruteforce(ray_session):
    from fastq_dupaway_ray.stages.paradedup import dedup_lines_within

    df = _corpus(300, 12, seed=23)  # tiny pool -> many within-doc repeats
    ds = rd.from_pandas(df).repartition(7)
    got = (
        dedup_lines_within(ds, sep=SEP)
        .to_pandas()
        .sort_values("doc_id")
        .reset_index(drop=True)
    )
    assert len(got) == len(df)  # no docs dropped
    for r, orig in zip(got.itertuples(), df.sort_values("doc_id").itertuples()):
        seen, keep = set(), []
        for p in orig.text.split(SEP):
            if p not in seen:
                seen.add(p)
                keep.append(p)
        assert r.text == SEP.join(keep)
        assert r.n_chars == len(r.text)


def test_dup_line_stats_matches_bruteforce():
    rng = np.random.default_rng(5)
    pool = [f"line {i}" for i in range(8)]
    texts = []
    for d in range(300):
        k = 1 + d % 6
        texts.append("\n".join(pool[i] for i in rng.integers(0, 8, k)))
    texts.append("")  # split("") -> [""] — one zero-char line
    n, f, cf = dup_line_stats(np.array(texts, dtype=object), sep="\n")
    for i, t in enumerate(texts):
        lines = t.split("\n")
        seen, dup_cnt, dup_chars, tot = set(), 0, 0, 0
        for ln in lines:
            tot += len(ln)
            if ln in seen:
                dup_cnt += 1
                dup_chars += len(ln)
            else:
                seen.add(ln)
        assert n[i] == len(lines)
        assert f[i] == dup_cnt / len(lines)
        assert cf[i] == (dup_chars / tot if tot else 0.0)
