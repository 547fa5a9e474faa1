"""Streaming sharded dedup index (raw-actor ST1 variant): set semantics,
incremental cross-slice dedup, shard partitioning."""

import numpy as np
import pandas as pd
import pytest

import ray
import ray.data as rd

from fastq_dupaway_ray.stages.streaming import make_index, streaming_dedup_exact


def _slice(texts, start):
    return rd.from_pandas(
        pd.DataFrame(
            {
                "url": [f"u/{start + i}" for i in range(len(texts))],
                "text": texts,
            }
        )
    )


def test_streaming_dedup_within_one_slice(ray_session):
    texts = [f"doc {i % 40}" for i in range(400)]  # each distinct text 10x
    kept, index = streaming_dedup_exact(_slice(texts, 0), n_shards=4, concurrency=2)
    out = kept.to_pandas()
    assert len(out) == 40
    assert sorted(out["text"].unique()) == sorted(set(texts))
    assert sum(ray.get([s.size.remote() for s in index])) == 40


def test_streaming_dedup_incremental_across_slices(ray_session):
    """Second slice dedups against the index built by the first slice."""
    index = make_index(n_shards=4)
    first = [f"base {i}" for i in range(50)]
    kept1, index = streaming_dedup_exact(_slice(first, 0), index=index, concurrency=2)
    assert kept1.count() == 50
    # second slice: 30 repeats of slice-1 texts + 20 new
    second = [f"base {i}" for i in range(30)] + [f"new {i}" for i in range(20)]
    kept2, index = streaming_dedup_exact(_slice(second, 1000), index=index, concurrency=2)
    out2 = kept2.to_pandas()
    assert len(out2) == 20
    assert all(t.startswith("new ") for t in out2["text"])
    assert sum(ray.get([s.size.remote() for s in index])) == 70


def test_streaming_shards_partition_identity_space(ray_session):
    index = make_index(n_shards=4)
    texts = [f"t{i}" for i in range(97)]
    kept, index = streaming_dedup_exact(_slice(texts, 0), index=index, concurrency=2)
    assert kept.count() == 97
    sizes = ray.get([s.size.remote() for s in index])
    assert sum(sizes) == 97
    assert all(s > 0 for s in sizes)  # uniform hash spreads across shards


def test_shard_k1_collision_and_batch_order(ray_session):
    """The LSM shard's rare duplicate-k1 run fallback and within-batch
    arrival-order first-occurrence semantics."""
    import numpy as np

    import ray

    from fastq_dupaway_ray.stages.streaming import DedupIndexShard

    s = DedupIndexShard.remote()
    packed = np.array([[5, 1], [5, 2], [5, 1], [7, 9]], dtype=np.uint64)
    mask = ray.get(s.check_and_add.remote(packed))
    assert list(mask) == [True, True, False, True]
    # same k1, one seen k2 + one new k2 — exercises the multi-run scan
    mask2 = ray.get(s.check_and_add.remote(np.array([[5, 2], [5, 3]], dtype=np.uint64)))
    assert list(mask2) == [False, True]
    assert ray.get(s.size.remote()) == 4


def test_shard_pending_promotion_and_compaction(ray_session):
    """Crossing _PENDING_MAX promotes chunks; membership stays exact."""
    import numpy as np

    import ray

    from fastq_dupaway_ray.stages.streaming import DedupIndexShard

    s = DedupIndexShard.remote()
    rng = np.random.RandomState(0)
    keys = rng.randint(0, 1 << 62, size=(90_000, 2)).astype(np.uint64)
    keys = np.unique(keys, axis=0)
    half = len(keys) // 2
    m1 = ray.get(s.check_and_add.remote(keys[:half]))
    m2 = ray.get(s.check_and_add.remote(keys[half:]))
    assert m1.all() and m2.all()
    # everything must now be a repeat
    m3 = ray.get(s.check_and_add.remote(keys))
    assert not m3.any()
    assert ray.get(s.size.remote()) == len(keys)


def test_streaming_neardup_incremental(ray_session):
    """Band-index streaming near-dedup: exact + near copies of already-kept
    docs are dropped across slices; unrelated docs survive."""
    import pandas as pd

    import ray
    import ray.data as rd

    from fastq_dupaway_ray.stages.streaming import streaming_dedup_neardup

    base = "the quick brown fox jumps over the lazy dog again and again " * 4
    other = "completely different content with nothing shared at all here " * 4
    s1 = [
        {"url": "a", "text": base},
        {"url": "b", "text": other},
    ]
    kept1, index = streaming_dedup_neardup(
        rd.from_pandas(pd.DataFrame(s1)), concurrency=1
    )
    assert sorted(kept1.to_pandas()["url"]) == ["a", "b"]
    # slice 2: exact copy of a, near copy of b (one appended token), one new
    s2 = [
        {"url": "c", "text": base},
        {"url": "d", "text": other + " tailtoken"},
        {"url": "e", "text": "brand new unrelated text tokens everywhere " * 4},
    ]
    kept2, index = streaming_dedup_neardup(
        rd.from_pandas(pd.DataFrame(s2)), index=index, concurrency=1
    )
    assert sorted(kept2.to_pandas()["url"]) == ["e"]
    sizes = ray.get([s.size.remote() for s in index])
    assert sum(sizes) > 0


def test_streaming_neardup_within_batch(ray_session):
    """Duplicates arriving in the SAME batch are caught too (within-batch
    candidate tracking)."""
    import pandas as pd

    import ray.data as rd

    from fastq_dupaway_ray.stages.streaming import streaming_dedup_neardup

    t = "some repeated web page boilerplate content tokens " * 5
    rows = [{"url": f"u{i}", "text": t} for i in range(10)]
    kept, _ = streaming_dedup_neardup(rd.from_pandas(pd.DataFrame(rows)), concurrency=1)
    assert kept.count() == 1


def test_band_shard_force_add_when_buckets_full(ray_session):
    """Advice r2: a kept doc whose every band bucket is full must still be
    indexed somewhere (evict-oldest force insert), or later near-dups of it
    would never find it."""
    import numpy as np

    import ray

    from fastq_dupaway_ray.stages.streaming import BandIndexShard

    s = BandIndexShard.remote(max_bucket=1)
    sig_a = np.arange(8, dtype=np.uint64)
    sig_b = np.arange(8, dtype=np.uint64) + 100
    keys = np.array([5], dtype=np.uint64)
    ins1 = ray.get(s.add.remote(keys, ["a"], sig_a[None, :]))
    assert ins1.tolist() == [True]
    ins2 = ray.get(s.add.remote(keys, ["b"], sig_b[None, :]))
    assert ins2.tolist() == [False]  # bucket full -> caller must force_add
    ray.get(s.force_add.remote(5, "b", sig_b))
    lengths, ids, sigs = ray.get(s.query.remote(keys))
    assert lengths.tolist() == [1]
    assert ids == ["b"]  # oldest evicted, newest resident
    assert (sigs[0] == sig_b).all()


def test_band_shard_query_stacked_layout(ray_session):
    """query returns per-key lengths + concatenated ids/sigs in key order."""
    import numpy as np

    import ray

    from fastq_dupaway_ray.stages.streaming import BandIndexShard

    s = BandIndexShard.remote(max_bucket=4)
    K = 8
    ray.get(
        s.add.remote(
            np.array([1, 1, 2], dtype=np.uint64),
            ["x", "y", "z"],
            np.arange(3 * K, dtype=np.uint64).reshape(3, K),
        )
    )
    lengths, ids, sigs = ray.get(s.query.remote(np.array([2, 3, 1], dtype=np.uint64)))
    assert lengths.tolist() == [1, 0, 2]
    assert ids == ["z", "x", "y"]
    assert sigs.shape == (3, K)
    assert sigs[0, 0] == 2 * K  # z's first signature slot


def test_streaming_cap_counts_exact_any_concurrency(ray_session):
    import numpy as np

    from fastq_dupaway_ray.stages.streaming import streaming_cap

    rng = np.random.default_rng(23)
    df = pd.DataFrame(
        {
            "source": [f"s{int(x) % 25}" for x in rng.zipf(1.4, 6000)],
            "doc_id": np.arange(6000),
        }
    )
    exp = df["source"].value_counts().clip(upper=7).sort_index()
    for conc in (1, (1, 4)):
        kept, index = streaming_cap(
            rd.from_pandas(df).repartition(9), n=7, key_col="source", concurrency=conc
        )
        got = kept.to_pandas()["source"].value_counts().sort_index()
        pd.testing.assert_series_equal(got, exp, check_names=False)
        assert got.max() <= 7


def test_streaming_cap_incremental_reuses_index(ray_session):
    from fastq_dupaway_ray.stages.streaming import streaming_cap

    a = pd.DataFrame({"source": ["x"] * 5, "doc_id": range(5)})
    b = pd.DataFrame({"source": ["x"] * 5, "doc_id": range(5, 10)})
    kept_a, index = streaming_cap(rd.from_pandas(a), n=7, key_col="source", concurrency=1)
    assert kept_a.count() == 5
    kept_b, _ = streaming_cap(rd.from_pandas(b), n=7, key_col="source", index=index, concurrency=1)
    assert kept_b.count() == 2  # 5 already admitted; only 2 quota slots left


# ------------------------------------------ snapshot / restore (resume)


def test_exact_index_survives_actor_kill(ray_session, tmp_path):
    """Kill the shard pool mid-ingest, reload from the snapshot, and the
    dedup invariant holds exactly: nothing already ingested is re-admitted."""
    import ray

    from fastq_dupaway_ray.stages.streaming import (
        load_streaming_index,
        save_streaming_index,
        streaming_dedup_exact,
    )

    a = pd.DataFrame({"url": [f"u{i}" for i in range(300)],
                      "text": [f"t{i % 120}" for i in range(300)]})
    kept_a, idx = streaming_dedup_exact(rd.from_pandas(a), n_shards=4)
    assert kept_a.count() == 120
    save_streaming_index(idx, str(tmp_path), "exact_idx")
    for s in idx:
        ray.kill(s)
    idx2 = load_streaming_index(str(tmp_path), "exact_idx")
    # re-ingesting the SAME slice admits nothing
    again, idx2 = streaming_dedup_exact(rd.from_pandas(a), index=idx2)
    assert again.count() == 0
    # a new slice: only genuinely-new texts admitted
    b = pd.DataFrame({"url": [f"v{i}" for i in range(200)],
                      "text": [f"t{i}" for i in range(200)]})  # 120 overlap
    kept_b, _ = streaming_dedup_exact(rd.from_pandas(b), index=idx2)
    assert kept_b.count() == 80


def test_quota_index_survives_actor_kill(ray_session, tmp_path):
    """Per-key admit counts survive snapshot+restore: a key at quota stays
    blocked, a key with room gets exactly the remainder."""
    import ray

    from fastq_dupaway_ray.stages.streaming import (
        load_streaming_index,
        save_streaming_index,
        streaming_cap,
    )

    a = pd.DataFrame({"source": ["full"] * 10 + ["half"] * 3, "x": range(13)})
    kept_a, idx = streaming_cap(rd.from_pandas(a), n=10, key_col="source", n_shards=3)
    assert kept_a.count() == 13  # full: 10 of 10, half: 3 of 10
    save_streaming_index(idx, str(tmp_path), "quota_idx")
    for s in idx:
        ray.kill(s)
    idx2 = load_streaming_index(str(tmp_path), "quota_idx")
    b = pd.DataFrame({"source": ["full"] * 5 + ["half"] * 20 + ["new"] * 2, "x": range(27)})
    kept_b, _ = streaming_cap(rd.from_pandas(b), n=10, key_col="source", index=idx2)
    got = kept_b.to_pandas()["source"].value_counts().to_dict()
    assert got.get("full", 0) == 0    # already at quota before the kill
    assert got["half"] == 7           # 3 admitted pre-kill -> 7 remaining
    assert got["new"] == 2


def test_band_index_survives_actor_kill(ray_session, tmp_path):
    """Near-dup variants of docs kept BEFORE the kill are still recognized
    as duplicates after reload (signatures + bucket order intact)."""
    import ray

    from fastq_dupaway_ray.stages.streaming import (
        load_streaming_index,
        save_streaming_index,
        streaming_dedup_neardup,
    )

    rng = np.random.default_rng(21)
    words = ["alpha", "beta", "gamma", "delta", "epsilon", "zeta", "theta", "iota"]
    base = [" ".join(rng.choice(words, size=80)) for _ in range(40)]
    a = pd.DataFrame({"url": [f"a{i}" for i in range(40)], "text": base})
    kept_a, idx = streaming_dedup_neardup(rd.from_pandas(a), n_shards=3)
    n_kept_a = kept_a.count()
    assert n_kept_a > 0
    save_streaming_index(idx, str(tmp_path), "band_idx")
    for s in idx:
        ray.kill(s)
    idx2 = load_streaming_index(str(tmp_path), "band_idx")
    # near-variants of the first 20 base docs (tiny tail edit) + 5 fresh docs
    variants = [t + " zz" for t in base[:20]]
    fresh = [" ".join(rng.choice(words[::-1], size=9)) + f" unique{i}" for i in range(5)]
    b = pd.DataFrame(
        {"url": [f"b{i}" for i in range(25)], "text": variants + fresh}
    )
    kept_b, _ = streaming_dedup_neardup(rd.from_pandas(b), index=idx2)
    kept_urls = set(kept_b.to_pandas()["url"])
    # every near-variant dropped, every fresh doc kept
    assert all(f"b{20 + i}" in kept_urls for i in range(5))
    assert not any(f"b{i}" in kept_urls for i in range(20))
