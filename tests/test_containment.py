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


# ---- suffix-array verify mode (the north rule's suffix-array substring pass)


def test_suffix_array_construction_matches_naive():
    """Prefix-doubling SA == naive sorted-suffixes on random byte strings,
    including runs/repeats (the doubling-terminaton edge cases)."""
    from fastq_dupaway_ray.stages.containment import _suffix_array

    rng = np.random.default_rng(11)
    cases = [b"", b"a", b"aaaaaaa", b"banana", b"abcabcabcabc"]
    for n in (2, 5, 17, 64, 200):
        cases.append(bytes(rng.integers(97, 101, size=n, dtype=np.uint8)))
    for s in cases:
        buf = np.frombuffer(s, dtype=np.uint8)
        got = _suffix_array(buf).tolist()
        want = sorted(range(len(s)), key=lambda i: s[i:])
        assert got == want, s


def test_sa_range_matches_str_count():
    """Binary-search occurrence range size == overlapping substring count."""
    from fastq_dupaway_ray.stages.containment import _sa_range, _suffix_array

    rng = np.random.default_rng(13)
    hay = bytes(rng.integers(97, 100, size=400, dtype=np.uint8))
    sa = _suffix_array(np.frombuffer(hay, dtype=np.uint8))
    for m in (1, 2, 3, 5, 9):
        for _ in range(20):
            i = int(rng.integers(0, len(hay) - m))
            needle = hay[i : i + m]
            s, e = _sa_range(hay, sa, needle)
            want = sum(1 for j in range(len(hay) - m + 1) if hay[j : j + m] == needle)
            assert e - s == want
    s, e = _sa_range(hay, sa, b"zzz-not-present")
    assert e == s


def test_suffix_array_mode_matches_find(corpus_ds):
    """verify="suffix_array" emits the identical exact-mode edge set."""
    got = _edge_set(
        containment_edges(corpus_ds, anchors=None, id_col="doc_id", verify="suffix_array")
    )
    assert got == EXPECTED


def test_suffix_array_mode_hot_anchor_skew():
    """Hot-anchor stress: one short needle embedded in 30 wrappers — every
    wrapper shares the needle's min shingle, so exact mode co-locates all 31
    docs under one anchor key. Both verifiers must emit exactly the 30
    (wrapper, needle) edges plus any planted wrapper-wrapper containments."""
    rng = np.random.default_rng(23)
    needle = "zq rare anchor needle phrase xv"
    rows = [{"doc_id": "needle", "text": needle}]
    for i in range(30):
        pad = " ".join(f"p{rng.integers(0, 10 ** 6)}" for _ in range(3 + i % 4))
        rows.append({"doc_id": f"wrap/{i}", "text": f"h{i} {pad} {needle} t{i} {pad}"})
    # nested wrapper: wrap/0's full text inside a bigger shell
    rows.append({"doc_id": "shell", "text": "S " + rows[1]["text"] + " outer tail S"})
    ds = rd.from_pandas(pd.DataFrame(rows))
    expected = {(f"wrap/{i}", "needle") for i in range(30)}
    expected |= {("shell", "needle"), ("shell", "wrap/0")}
    got_sa = _edge_set(containment_edges(ds, anchors=None, id_col="doc_id", verify="suffix_array"))
    got_find = _edge_set(containment_edges(ds, anchors=None, id_col="doc_id"))
    assert got_sa == expected
    assert got_find == expected


def test_containment_exact_mode_never_truncates_hot_groups(ray_session):
    """Exact mode (anchors=None) must not cap a hot min-shingle group at
    max_bucket — the sf0.1 sweep caught 5 missing pairs when a group
    outgrew 512 members. All docs here share one min-shingle."""
    import pandas as pd
    import ray.data as rd

    from fastq_dupaway_ray.stages.containment import containment_edges

    # every doc starts with the same 8-char shingle that hashes minimal
    # within each doc (prefix "aaaaaaaa" has a very low rolling hash for
    # typical bases; regardless, sharing the full prefix guarantees a
    # shared shingle and dense anchor groups)
    n = 40
    docs = []
    for i in range(n):
        docs.append(("aaaaaaaa" + f" doc {i:04d} " + "body " * (i + 1)).strip())
    # plant containments: doc i contains doc's text of i-1? Build nested
    nested = ["aaaaaaaa nested core"]
    for i in range(1, 6):
        nested.append(nested[-1] + f" layer{i}")
    texts = docs + nested
    df = pd.DataFrame({"doc_id": range(len(texts)), "text": texts})
    edges = containment_edges(
        rd.from_pandas(df).repartition(4), anchors=None, id_col="doc_id",
        max_bucket=4,  # force "hot" groups far below the member count
    ).to_pandas()
    got = set(map(tuple, edges[["a", "b"]].itertuples(index=False)))
    want = {
        (len(docs) + i, len(docs) + j)
        for i in range(1, 6)
        for j in range(i)
    }
    assert want <= got, want - got
