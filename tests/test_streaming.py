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
