"""MinHash-LSH and SimHash near-dup pipelines: recall/precision on planted classes."""

import numpy as np
import pandas as pd
import pytest

import ray.data as rd

from fastq_dupaway_ray import refmodel
from fastq_dupaway_ray.functions.hashing import char_ngram_hashes, jaccard
from fastq_dupaway_ray.functions.sketches import MinHashParams
from fastq_dupaway_ray.stages.components import connected_components
from fastq_dupaway_ray.stages.minhash import dedup_edges_minhash
from fastq_dupaway_ray.stages.representative import apply_cluster_labels
from fastq_dupaway_ray.stages.simhash import simhash_candidate_edges


@pytest.fixture(scope="module")
def ds(ray_session, pages_corpus):
    path, _ = pages_corpus
    return rd.read_parquet(path)


@pytest.fixture(scope="module")
def minhash_edges(ds):
    return dedup_edges_minhash(ds, verify=True, threshold=0.7, signer_concurrency=2).materialize()


def _base_url_of(dup_url: str) -> int:
    # .../dup/<class>/<base_idx>/<copy>
    return int(dup_url.split("/")[-2])


def test_minhash_recall_on_high_jaccard_classes(minhash_edges, pages_rows):
    """North-rule recall: every planted exact/near-exact dup must be caught."""
    edf = minhash_edges.to_pandas()
    covered = set(edf["a"]) | set(edf["b"])
    planted = [r["url"] for r in pages_rows if "/dup/exact/" in r["url"] or "/dup/jac095/" in r["url"]]
    assert planted, "corpus must plant duplicates"
    hit = sum(1 for u in planted if u in covered)
    assert hit / len(planted) >= 0.99


def test_minhash_verify_precision(minhash_edges, pages_rows):
    """Every verified edge's true shingle Jaccard >= threshold (no false dup)."""
    texts = {r["url"]: r["text"] for r in pages_rows}
    edf = minhash_edges.to_pandas()
    assert len(edf) > 0
    for _, e in edf.iterrows():
        sa = char_ngram_hashes(texts[e["a"]], 8)
        sb = char_ngram_hashes(texts[e["b"]], 8)
        assert jaccard(sa, sb) >= 0.7
        assert abs(e["jaccard"] - jaccard(sa, sb)) < 1e-9


def test_low_jaccard_pairs_not_linked(minhash_edges, pages_rows):
    """jac05 rows (Jaccard ~0.5 vs base) must NOT be merged at threshold 0.7."""
    edf = minhash_edges.to_pandas()
    pair_set = {frozenset((a, b)) for a, b in zip(edf["a"], edf["b"])}
    for r in pages_rows:
        if "/dup/jac05/" in r["url"]:
            base_idx = _base_url_of(r["url"])
            base_urls = [q["url"] for q in pages_rows if q["url"].endswith(f"/p/{base_idx}")]
            for bu in base_urls:
                assert frozenset((bu, r["url"])) not in pair_set


def test_minhash_end_to_end_cluster_counts(ds, minhash_edges, pages_rows):
    labels = connected_components(minhash_edges).materialize()
    kept, clusters = apply_cluster_labels(ds, labels)
    n_total = len(pages_rows)
    n_kept = kept.count()
    cdf = clusters.to_pandas()
    n_reps = int(cdf["is_representative"].sum())
    # every row is either kept (singleton or rep) or a non-rep cluster member
    assert n_kept == n_total - (len(cdf) - n_reps)
    # representative = earliest (warc_ts, url) in its cluster
    order = {r["url"]: (r["warc_ts"], r["url"]) for r in pages_rows}
    for cid, grp in cdf.groupby("cluster_id"):
        rep = grp[grp["is_representative"]]["member"].iloc[0]
        assert order[rep] == min(order[m] for m in grp["member"])


def test_simhash_catches_exact_dups(ds, pages_rows):
    edges = simhash_candidate_edges(ds, distance=3, signer_concurrency=2).materialize()
    edf = edges.to_pandas()
    covered = set(edf["a"]) | set(edf["b"])
    exact_planted = [r["url"] for r in pages_rows if "/dup/exact/" in r["url"]]
    hit = sum(1 for u in exact_planted if u in covered)
    assert hit == len(exact_planted)
    # all reported edges respect the distance bound
    assert (edf["hamming"] <= 3).all()


def test_components_match_union_find(minhash_edges):
    edf = minhash_edges.to_pandas()
    labels = connected_components(minhash_edges).to_pandas()
    ref = refmodel.union_find_components(list(zip(edf["a"], edf["b"])))
    assert dict(zip(labels["node"], labels["label"])) == ref


def test_components_distributed_label_propagation(ray_session):
    """Force the distributed path on a graph with known components."""
    from fastq_dupaway_ray.stages.components import _connected_components_distributed

    edges = [("a", "b"), ("b", "c"), ("x", "y"), ("p", "q"), ("q", "r"), ("r", "s")]
    eds = rd.from_pandas(pd.DataFrame(edges, columns=["a", "b"]))
    labels = _connected_components_distributed(eds, max_rounds=10).to_pandas()
    got = dict(zip(labels["node"], labels["label"]))
    assert got == refmodel.union_find_components(edges)
