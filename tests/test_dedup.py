"""Distributed dedup stages vs the serial reference-semantics mirror.

This is the engine's version of the reference's golden-file strategy
(/root/reference/test/test_seq.py, test_fast.py): identical planted corpora,
outputs compared exactly against fastq_dupaway_ray.refmodel.
"""

import pandas as pd
import pytest

import ray.data as rd

from fastq_dupaway_ray import refmodel
from fastq_dupaway_ray.stages.adjacency import dedup_adjacency
from fastq_dupaway_ray.stages.dedup_exact import dedup_exact, dedup_exact_clusters


@pytest.fixture(scope="module")
def ds(ray_session, pages_corpus):
    path, _ = pages_corpus
    return rd.read_parquet(path)


def _urls(rows):
    return sorted(r["url"] for r in rows)


def test_exact_matches_refmodel(ds, pages_rows):
    kept = dedup_exact(ds, key_cols=("text",)).to_pandas()
    ref = refmodel.dedup_hash(pages_rows, keys=("text",))
    assert sorted(kept["url"]) == _urls(ref.kept)
    # keep-first: every kept row is its group's earliest (warc_ts, url)
    assert len(kept) == len(ref.kept)


def test_exact_composite_key(ds, pages_rows):
    # paired AND-semantics: (text, lang) both must match
    kept = dedup_exact(ds, key_cols=("text", "lang")).to_pandas()
    ref = refmodel.dedup_hash(pages_rows, keys=("text", "lang"))
    assert sorted(kept["url"]) == _urls(ref.kept)
    # composite key can only keep MORE rows than single key
    kept1 = dedup_exact(ds, key_cols=("text",)).to_pandas()
    assert len(kept) >= len(kept1)


def test_exact_clusters_match_refmodel(ds, pages_rows):
    cl = dedup_exact_clusters(ds).to_pandas()
    ref = refmodel.dedup_hash(pages_rows, keys=("text",))
    ref_members = {(h, m) for h, ms in ref.clusters.items() for m in ms}
    assert set(zip(cl["cluster_id"], cl["member"])) == ref_members
    reps = cl[cl["is_representative"]]
    assert sorted(reps["member"]) == _urls(ref.kept)


@pytest.mark.parametrize("mode,distance", [("tight", 0), ("loose", 0), ("hamming", 2)])
def test_adjacency_matches_refmodel(ds, pages_rows, mode, distance):
    res = dedup_adjacency(ds, mode=mode, distance=distance)
    kept = res.kept.to_pandas()
    ref = refmodel.dedup_sorted(pages_rows, mode=mode, distance=distance)
    assert sorted(kept["url"]) == _urls(ref.kept)
    assert res.total == ref.total
    assert res.duplicates == ref.duplicates
    cl = res.clusters.to_pandas()
    ref_members = {(h, m) for h, ms in ref.clusters.items() for m in ms}
    assert set(zip(cl["cluster_id"], cl["member"])) == ref_members


def test_adjacency_seams_with_many_blocks(ray_session, pages_rows):
    # force many tiny blocks so cross-block chains exercise the seam fixup
    ds_small = rd.from_pandas(pd.DataFrame(pages_rows)).repartition(16)
    res = dedup_adjacency(ds_small, mode="loose")
    ref = refmodel.dedup_sorted(pages_rows, mode="loose")
    assert sorted(res.kept.to_pandas()["url"]) == _urls(ref.kept)


def test_tight_adjacency_equals_exact_on_keepset(ds):
    # A3 == A1 on the kept set (SURVEY.md): sorted tight == hash exact
    adj = dedup_adjacency(ds, mode="tight").kept.to_pandas()
    ex = dedup_exact(ds, key_cols=("text",)).to_pandas()
    assert sorted(adj["url"]) == sorted(ex["url"])
