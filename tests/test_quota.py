"""Per-key quota cap (stages/quota.py), the duplicate-trigram repetition
kernel, and the deterministic shuffle rank — exactness vs brute-force
pandas/Python oracles under key skew."""

import numpy as np
import pandas as pd
import pytest
import ray.data as rd

from fastq_dupaway_ray.functions.textstats import dup_trigram_stats
from fastq_dupaway_ray.stages.quota import cap_per_key


def _corpus(n_rows: int, n_keys: int, seed: int) -> pd.DataFrame:
    rng = np.random.default_rng(seed)
    return pd.DataFrame(
        {
            "source": [f"s{int(x) % n_keys}" for x in rng.zipf(1.5, n_rows)],
            "doc_id": rng.permutation(n_rows),
            "text": ["x" * int(c) for c in rng.integers(3, 40, n_rows)],
        }
    )


def _expected(df: pd.DataFrame, n: int) -> pd.DataFrame:
    exp = (
        df.sort_values(["source", "doc_id"], kind="mergesort")
        .groupby("source", sort=False)
        .head(n)
    )
    return exp.sort_values(["source", "doc_id"]).reset_index(drop=True)


@pytest.mark.parametrize("n,parts", [(1, 7), (5, 1), (5, 13), (100, 4)])
def test_cap_per_key_matches_pandas(ray_session, n, parts):
    df = _corpus(8000, 30, seed=n * 31 + parts)
    ds = rd.from_pandas(df).repartition(parts)
    got = (
        cap_per_key(ds, "source", "doc_id", n)
        .to_pandas()
        .sort_values(["source", "doc_id"])
        .reset_index(drop=True)
    )
    exp = _expected(df, n)
    assert list(got.columns) == list(df.columns)  # payload rides through
    pd.testing.assert_frame_equal(got, exp)


def test_cap_per_key_under_cap_is_identity(ray_session):
    """No key over the cap -> the stage returns the input unfiltered."""
    df = _corpus(200, 200, seed=3)
    ds = rd.from_pandas(df).repartition(5)
    got = cap_per_key(ds, "source", "doc_id", 10_000).to_pandas()
    assert len(got) == len(df)


def test_cap_per_key_hot_key_single_block(ray_session):
    """One block holding a whole hot key must still cap it: the combiner's
    per-block count rows carry the global count even when the merged
    candidate list is exactly n."""
    df = pd.DataFrame(
        {"source": ["hot"] * 500 + ["cold"], "doc_id": list(range(501)), "text": "t"}
    )
    ds = rd.from_pandas(df).repartition(1)
    got = cap_per_key(ds, "source", "doc_id", 7).to_pandas()
    hot = got[got["source"] == "hot"]
    assert sorted(hot["doc_id"]) == list(range(7))
    assert (got["source"] == "cold").sum() == 1


def _tri_oracle(t):
    toks = (t or "").split()
    tris = [" ".join(toks[i : i + 3]) for i in range(max(len(toks) - 2, 0))]
    total = len(tris)
    return total, (1.0 - len(set(tris)) / total) if total else 0.0


def test_dup_trigram_stats_matches_bruteforce():
    rng = np.random.default_rng(11)
    vocab = np.array(["a", "bb", "ccc", "dd", "e"], dtype=object)
    texts = [" ".join(rng.choice(vocab, size=rng.integers(0, 30))) for _ in range(300)]
    texts += ["", None, "one two", "w w w w w w"]
    arr = np.array(texts, dtype=object)
    total, frac = dup_trigram_stats(arr)
    for t, g_t, g_f in zip(arr, total, frac):
        e_t, e_f = _tri_oracle(t)
        assert (int(g_t), float(g_f)) == (e_t, e_f), (t, g_t, g_f, e_t, e_f)


@pytest.mark.parametrize("parts,seed", [(1, 5), (11, 6)])
def test_exact_quantiles_matches_numpy(ray_session, parts, seed):
    from fastq_dupaway_ray.stages.quantiles import exact_quantiles

    rng = np.random.default_rng(seed)
    vals = rng.integers(0, 300, 9173).astype(np.int64)
    ds = rd.from_pandas(pd.DataFrame({"n_chars": vals, "pad": "x"})).repartition(parts)
    got = exact_quantiles(ds, "n_chars", qs=(0.5, 0.9, 0.99)).to_pandas()
    s = np.sort(vals)
    for q, c in [(0.5, "p50"), (0.9, "p90"), (0.99, "p99")]:
        assert got[c].iloc[0] == s[int(np.floor(q * (len(s) - 1)))]


def test_exact_quantiles_distinct_budget(ray_session):
    from fastq_dupaway_ray.stages.quantiles import exact_quantiles

    ds = rd.from_pandas(pd.DataFrame({"v": np.arange(1000, dtype=np.int64)}))
    with pytest.raises(ValueError, match="distinct_budget"):
        exact_quantiles(ds, "v", distinct_budget=10)


@pytest.mark.parametrize("parts", [1, 9])
def test_pack_sequences_matches_pandas_scan(ray_session, parts):
    from fastq_dupaway_ray.stages.packing import pack_sequences

    rng = np.random.default_rng(17)
    n = 4000
    words = [" ".join(["w"] * int(k)) for k in rng.integers(0, 60, n)]
    df = pd.DataFrame({"doc_id": rng.permutation(n).astype(np.int64), "text": words})
    ds = rd.from_pandas(df).repartition(parts)
    got = pack_sequences(ds, seq_len=512).to_pandas().sort_values("doc_id").reset_index(drop=True)
    exp = df.copy()
    exp["n_tokens"] = exp["text"].str.split().str.len().fillna(0).astype(np.int64)
    exp = exp.sort_values("doc_id").reset_index(drop=True)
    exp["tok_offset"] = exp["n_tokens"].cumsum().shift(fill_value=0)
    exp["seq_id"] = exp["tok_offset"] // 512
    pd.testing.assert_frame_equal(
        got, exp[["doc_id", "n_tokens", "tok_offset", "seq_id"]], check_dtype=False
    )
    # tape invariant: sequences are contiguous and non-decreasing in id order
    assert (got["seq_id"].diff().fillna(0) >= 0).all()


def test_cap_per_key_threshold_budget(ray_session):
    df = pd.DataFrame({"source": ["a"] * 5 + ["b"] * 5, "doc_id": range(10), "text": "t"})
    ds = rd.from_pandas(df)
    with pytest.raises(ValueError, match="threshold_budget"):
        cap_per_key(ds, "source", "doc_id", 2, threshold_budget=1)


def test_deterministic_shuffle_rank_matches_serial_and_is_reshard_stable(ray_session):
    import hashlib

    import ray.data as rdd

    from fastq_dupaway_ray.stages.packing import deterministic_shuffle_rank

    ids = np.arange(2000, dtype=np.int64)
    df = pd.DataFrame({"doc_id": ids, "text": ["x"] * len(ids)})
    exp_order = sorted(ids, key=lambda i: (hashlib.md5(str(i).encode()).hexdigest(), i))
    exp = {i: r for r, i in enumerate(exp_order)}
    got_by_parts = []
    for parts in (1, 7, 23):
        got = (
            deterministic_shuffle_rank(rdd.from_pandas(df).repartition(parts))
            .to_pandas()
            .sort_values("doc_id")
            .reset_index(drop=True)
        )
        assert list(got.columns) == ["doc_id", "shuffle_rank"]
        assert all(exp[i] == r for i, r in zip(got.doc_id, got.shuffle_rank))
        got_by_parts.append(got.shuffle_rank.to_numpy())
    # resharding must not change the order (the whole point vs random_shuffle)
    assert all((g == got_by_parts[0]).all() for g in got_by_parts[1:])


# ------------------------------------------------ token-budget per-key cap


def _budget_brute(df, key, order, weight, budget):
    d = df.sort_values([key, order], kind="mergesort")
    cum = d.groupby(key, sort=False)[weight].cumsum()
    return d[cum.to_numpy() <= budget]


def test_cap_per_key_budget_matches_bruteforce(ray_session):
    from fastq_dupaway_ray.stages.quota import cap_per_key_budget

    rng = np.random.default_rng(33)
    n = 20_000
    df = pd.DataFrame(
        {
            "k": np.array([f"s{int(i)}" for i in rng.zipf(1.6, n) % 40], dtype=object),
            "i": np.arange(n, dtype=np.int64),
            "w": rng.integers(1, 400, size=n).astype(np.int64),
        }
    )
    got = (
        cap_per_key_budget(
            rd.from_pandas(df).repartition(9), key_col="k", order_col="i",
            weight_col="w", budget=2_000,
        )
        .to_pandas()
        .sort_values("i")
        .reset_index(drop=True)
    )
    exp = (
        _budget_brute(df, "k", "i", "w", 2_000)
        .sort_values("i")
        .reset_index(drop=True)
    )
    pd.testing.assert_frame_equal(got[["k", "i", "w"]], exp[["k", "i", "w"]])


def test_cap_per_key_budget_drop_all_key(ray_session):
    """A key whose FIRST row already exceeds the budget loses every row
    (SQL cumulative-sum semantics) — the null-threshold limb."""
    from fastq_dupaway_ray.stages.quota import cap_per_key_budget

    df = pd.DataFrame(
        {
            "k": ["fat", "fat", "ok", "ok"],
            "i": np.array([1, 2, 1, 2], dtype=np.int64),
            "w": np.array([100, 1, 3, 4], dtype=np.int64),
        }
    )
    got = cap_per_key_budget(
        rd.from_pandas(df).repartition(2), key_col="k", order_col="i",
        weight_col="w", budget=8,
    ).to_pandas()
    assert sorted(zip(got["k"], got["i"])) == [("ok", 1), ("ok", 2)]


def test_cap_per_key_budget_cross_block_hot_key(ray_session):
    """The cutoff-marker protocol stays exact when a hot key's rows scatter
    over many blocks and the budget boundary falls mid-corpus."""
    from fastq_dupaway_ray.stages.quota import cap_per_key_budget

    n = 5_000
    df = pd.DataFrame(
        {
            "k": ["hot"] * n,
            "i": np.arange(n, dtype=np.int64),
            "w": np.full(n, 7, dtype=np.int64),
        }
    )
    budget = 7 * 123 + 3  # keeps exactly the first 123 rows
    got = cap_per_key_budget(
        rd.from_pandas(df.sample(frac=1.0, random_state=5)).repartition(16),
        key_col="k", order_col="i", weight_col="w", budget=budget,
    ).to_pandas()
    assert sorted(got["i"]) == list(range(123))


def test_cap_per_key_budget_rejects_bad_inputs(ray_session):
    from fastq_dupaway_ray.stages.quota import cap_per_key_budget

    df = pd.DataFrame({"k": ["a"], "i": [1], "w": [0]})
    with pytest.raises(ValueError, match="budget >= 1"):
        cap_per_key_budget(rd.from_pandas(df), "k", "i", "w", budget=0)
    import ray.exceptions

    with pytest.raises(Exception, match="positive weights"):
        cap_per_key_budget(rd.from_pandas(df), "k", "i", "w", budget=5).to_pandas()
