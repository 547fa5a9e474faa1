"""Substring-containment stage: exact-mode completeness on a planted corpus,
approximate bottom-k recall, and separator/ordering edge cases.

Models the reference's loose prefix predicate generalized to substring
containment (/root/reference/src/comparator.cpp:60-74)."""

import numpy as np
import pandas as pd
import pytest

import ray.data as rd

from fastq_dupaway_ray.stages.containment import containment_edges

BASE = (
    "the quick brown fox jumps over the lazy dog while seventeen "
    "crawlers index syndicated boilerplate paragraphs "
)


def _corpus():
    """Planted chains: doc i's text contained in i's super-docs; plus unrelated
    fillers and an exact-duplicate pair (equal length -> NOT containment)."""
    rng = np.random.default_rng(7)
    rows = []
    # chain: c0 ⊂ c1 ⊂ c2 (every prefix pair is a containment edge)
    chain = [BASE, BASE + "extra tail alpha ", BASE + "extra tail alpha and beta gamma "]
    for i, t in enumerate(chain):
        rows.append({"doc_id": f"chain/{i}", "text": t})
    # mid-string containment: needle embedded in an unrelated wrapper
    needle = "unique rare needle phrase zq"
    rows.append({"doc_id": "needle", "text": needle})
    rows.append({"doc_id": "wrapper", "text": "prefix junk " + needle + " suffix junk padding"})
    # two containers for one contained doc -> both edges required
    rows.append({"doc_id": "wrapper2", "text": "other head " + needle + " other tail material xx"})
    # equal-length exact duplicates: not a containment pair (strict >)
    rows.append({"doc_id": "eq/a", "text": "identical twin text body"})
    rows.append({"doc_id": "eq/b", "text": "identical twin text body"})
    # unrelated fillers
    for i in range(40):
        words = rng.choice(list("abcdefghijklmnop"), size=12)
        rows.append({"doc_id": f"filler/{i}", "text": "flr " + " ".join(f"w{w}{i}" for w in words)})
    return pd.DataFrame(rows)


EXPECTED = {
    ("chain/1", "chain/0"),
    ("chain/2", "chain/0"),
    ("chain/2", "chain/1"),
    ("wrapper", "needle"),
    ("wrapper2", "needle"),
}


@pytest.fixture(scope="module")
def corpus_ds(ray_session):
    return rd.from_pandas(_corpus())


def _edge_set(edges):
    df = edges.to_pandas()
    return set(zip(df["a"], df["b"]))


def test_exact_mode_finds_all_pairs(corpus_ds):
    got = _edge_set(containment_edges(corpus_ds, anchors=None, id_col="doc_id"))
    assert got == EXPECTED


def test_approximate_mode_recall(corpus_ds):
    """Bottom-k anchors: subset of the exact edge set, high recall at k=8."""
    got = _edge_set(containment_edges(corpus_ds, anchors=8, id_col="doc_id"))
    assert got <= EXPECTED
    assert len(got) / len(EXPECTED) >= 0.8


def test_no_self_or_equal_length_edges(corpus_ds):
    df = containment_edges(corpus_ds, anchors=None, id_col="doc_id").to_pandas()
    texts = _corpus().set_index("doc_id")["text"]
    assert (df["a"] != df["b"]).all()
    assert all(len(texts[a]) > len(texts[b]) for a, b in zip(df["a"], df["b"]))
