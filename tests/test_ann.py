"""Similarity search + embedding dedup over the driver embeddings table."""

import numpy as np
import pandas as pd
import pytest

import ray.data as rd

from fastq_dupaway_ray.stages.ann import brute_force_topk, embedding_dedup_exact

SF = "/root/testdata/sf0.001"


@pytest.fixture(scope="module")
def emb(ray_session):
    return rd.read_parquet(f"{SF}/embeddings.parquet")


@pytest.fixture(scope="module")
def emb_np():
    import pyarrow.parquet as pq

    t = pq.read_table(f"{SF}/embeddings.parquet")
    ids = t["vec_id"].to_numpy()
    X = np.stack(t["embedding"].to_pylist()).astype(np.float64)
    return ids, X


def test_brute_force_topk_matches_numpy_oracle(emb, emb_np):
    ids, X = emb_np
    Q, qids = X[:5], ids[:5]
    got = brute_force_topk(emb, Q, qids, k=10, concurrency=2)
    Xn = X / np.linalg.norm(X, axis=1, keepdims=True)
    Qn = Q / np.linalg.norm(Q, axis=1, keepdims=True)
    scores = Xn @ Qn.T
    for j, qid in enumerate(qids):
        order = np.lexsort((ids, -scores[:, j]))[:10]
        expect = set(ids[order])
        mine = set(got[got["query_id"] == qid]["vec_id"])
        assert mine == expect
        # self should be its own nearest neighbor
        top1 = got[(got["query_id"] == qid) & (got["rank"] == 1)]["vec_id"].iloc[0]
        assert top1 == qid


def test_embedding_dedup_exact(ray_session, emb_np):
    ids, X = emb_np
    # plant exact duplicates of the first 3 vectors
    dup = pd.DataFrame(
        {"vec_id": [10_000 + i for i in range(3)], "embedding": [X[i].astype(np.float32) for i in range(3)],
         "label": [0, 0, 0]}
    )
    base = pd.DataFrame({"vec_id": ids, "embedding": [x.astype(np.float32) for x in X], "label": 0})
    ds = rd.from_pandas(pd.concat([base, dup], ignore_index=True))
    kept = embedding_dedup_exact(ds).to_pandas()
    assert len(kept) == len(ids)  # dups removed
    assert set(dup["vec_id"]) & set(kept["vec_id"]) == set()  # originals (min id) kept


def test_ivf_exhaustive_probe_equals_brute_force(emb, emb_np):
    """nprobe == nlist probes every cell -> must reproduce brute force exactly."""
    from fastq_dupaway_ray.stages.ann import ivf_topk

    ids, X = emb_np
    Q, qids = X[:4], ids[:4]
    bf = brute_force_topk(emb, Q, qids, k=8, concurrency=2)
    ivf = ivf_topk(emb, Q, qids, k=8, nlist=12, nprobe=12, concurrency=2)
    pd.testing.assert_frame_equal(
        bf[["query_id", "vec_id", "rank"]].reset_index(drop=True),
        ivf[["query_id", "vec_id", "rank"]].reset_index(drop=True),
    )


def test_ivf_pruned_recall(emb, emb_np):
    """Approximate scale path: recall@10 vs brute force stays high with
    nprobe = nlist/2 on the driver embeddings."""
    from fastq_dupaway_ray.stages.ann import ivf_topk

    ids, X = emb_np
    Q, qids = X[:8], ids[:8]
    bf = brute_force_topk(emb, Q, qids, k=10, concurrency=2)
    ivf = ivf_topk(emb, Q, qids, k=10, nlist=16, nprobe=8, concurrency=2)
    truth = set(zip(bf["query_id"], bf["vec_id"]))
    got = set(zip(ivf["query_id"], ivf["vec_id"]))
    recall = len(truth & got) / len(truth)
    assert recall >= 0.7, recall


def test_embedding_neardup_lsh_recall(ray_session):
    """Hyperplane-LSH near-dup (scale path): finds the planted high-cosine
    pairs that the exact all-pairs path finds."""
    from fastq_dupaway_ray.queries import augmented_embeddings
    from fastq_dupaway_ray.stages.ann import embedding_neardup_exact, embedding_neardup_lsh

    aug = augmented_embeddings(SF).materialize()
    exact = embedding_neardup_exact(aug, threshold=0.95).to_pandas()
    lsh = embedding_neardup_lsh(aug, threshold=0.95, planes=64, bands=16).to_pandas()
    truth = set(zip(exact["a"], exact["b"]))
    got = set(zip(lsh["a"], lsh["b"]))
    assert truth, "corpus must plant near-dup pairs"
    assert got <= truth  # verify step is exact -> no false positives
    recall = len(got & truth) / len(truth)
    assert recall >= 0.99, recall


def test_embedding_neardup_exact_budget_gate(ray_session, monkeypatch):
    """Verdict r2: the exact path's driver materialization is budget-gated —
    a tiny budget must route to the LSH limb instead of to_pandas."""
    from fastq_dupaway_ray.queries import augmented_embeddings
    from fastq_dupaway_ray.stages import ann

    aug = augmented_embeddings(SF).materialize()
    called = {}
    real_lsh = ann.embedding_neardup_lsh

    def sentinel(vectors, threshold, vec_col, id_col):
        called["lsh"] = True
        return real_lsh(vectors, threshold=threshold, vec_col=vec_col, id_col=id_col)

    monkeypatch.setattr(ann, "embedding_neardup_lsh", sentinel)
    out = ann.embedding_neardup_exact(aug, threshold=0.95, broadcast_budget=1).to_pandas()
    assert called.get("lsh"), "gate did not engage the LSH fallback"
    assert len(out) > 0
