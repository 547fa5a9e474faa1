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


def test_components_distributed_long_chain_and_random(ray_session):
    """Multi-round convergence: a 40-node chain (diameter 39 but min-label
    doubles reach per round) + a random graph, vs driver union-find."""
    from fastq_dupaway_ray.stages.components import _connected_components_distributed

    rng = np.random.default_rng(3)
    edges = [(i, i + 1) for i in range(39)]  # one long chain 0..39
    edges += [(int(a) + 100, int(b) + 100) for a, b in rng.integers(0, 60, size=(80, 2)) if a != b]
    eds = rd.from_pandas(pd.DataFrame(edges, columns=["a", "b"]))
    labels = _connected_components_distributed(eds, max_rounds=64).to_pandas()
    got = dict(zip(labels["node"], labels["label"]))
    assert got == refmodel.union_find_components(edges)


def test_min_label_loop_chains_and_random_vs_union_find():
    """The driver solve's root-hooking relaxation on adversarial shapes:
    long chains (worst case for node-only scatter — one hop per round),
    stars, and a dense random block, numeric and string limbs both pinned
    to the union-find oracle."""
    from fastq_dupaway_ray.stages.components import (
        _components_min_label_numpy,
        _components_min_label_pairs,
    )

    rng = np.random.default_rng(7)
    edges = [(i, i + 1) for i in range(200)]  # 201-chain, ids ascending
    edges += [(1000, 1000 + k) for k in range(1, 50)]  # star
    edges += [  # chain with ids DESCENDING (min at the far end)
        (2000 + i + 1, 2000 + i) for i in range(100)
    ]
    edges += [
        (int(a) + 5000, int(b) + 5000)
        for a, b in rng.integers(0, 300, size=(500, 2))
        if a != b
    ]
    ref = refmodel.union_find_components(edges)

    a = np.array([e[0] for e in edges], dtype=object)
    b = np.array([e[1] for e in edges], dtype=object)
    nodes, labels = _components_min_label_numpy(a, b)
    assert dict(zip(nodes, labels)) == ref

    a1 = np.array([e[0] for e in edges], dtype=np.uint64)
    b1 = np.array([e[0 + 1] for e in edges], dtype=np.uint64)
    salt = np.uint64(0x9E3779B97F4A7C15)
    nodes_p, roots_p = _components_min_label_pairs(a1, a1 * salt, b1, b1 * salt)
    got = dict(zip(nodes_p["h1"].tolist(), roots_p["h1"].tolist()))
    assert got == ref


def test_word_ngram_jaccard_mode(ray_session):
    """MinHash/LSH over word 3-gram shingles with exact word-Jaccard verify:
    edge jaccard values must equal the direct word-shingle computation."""
    import numpy as np

    from fastq_dupaway_ray.functions.hashing import word_ngram_hashes
    from fastq_dupaway_ray.stages.minhash import dedup_edges_minhash

    base = ("alpha bravo charlie delta echo foxtrot golf hotel india juliet "
            "kilo lima mike november oscar papa quebec romeo sierra tango ")
    rows = []
    for i in range(30):
        rows.append({"url": f"u/{i}", "warc_ts": i, "text": base + f"uniq{i} marker{i} tail{i}"})
    rows.append({"url": "u/dup", "warc_ts": 99, "text": base + "uniq0 marker0 tail0"})  # exact dup of u/0
    rows.append({"url": "u/near", "warc_ts": 100, "text": base + "uniq1 marker1 CHANGED"})  # near dup of u/1
    ds = rd.from_pandas(pd.DataFrame(rows))

    params = MinHashParams(shingle="word", word_n=3)
    edges = dedup_edges_minhash(
        ds, params=params, verify=True, threshold=0.6, order_cols=("warc_ts", "url")
    ).to_pandas()
    texts = {r["url"]: r["text"] for r in rows}
    pairs = set(zip(edges["a"], edges["b"]))
    assert ("u/0", "u/dup") in pairs or ("u/dup", "u/0") in pairs
    for _, e in edges.iterrows():
        sa = word_ngram_hashes(texts[e["a"]], 3)
        sb = word_ngram_hashes(texts[e["b"]], 3)
        inter = len(np.intersect1d(sa, sb, assume_unique=True))
        truth = inter / (len(sa) + len(sb) - inter)
        assert abs(truth - e["jaccard"]) < 1e-12
        assert e["jaccard"] >= 0.6


def test_hot_bucket_salting_preserves_connectivity(ray_session):
    """A band bucket larger than max_bucket must still union into ONE
    component (salt groups chained to the global head), with O(n) edges."""
    from fastq_dupaway_ray.stages.minhash import lsh_candidate_edges

    n = 50
    rows = pd.DataFrame(
        {
            "band_key": np.full(n, 7, dtype=np.uint64),
            "url": [f"u/{i:03d}" for i in range(n)],
            "warc_ts": np.arange(n),
        }
    )
    edges = lsh_candidate_edges(
        rd.from_pandas(rows), max_bucket=8, order_cols=("warc_ts", "url")
    ).to_pandas()
    # O(n) edge count: one per member + one per extra salt-group head
    assert len(edges) == (n - 1)
    comp = refmodel.union_find_components(list(zip(edges["a"], edges["b"])))
    labels = {comp.get(f"u/{i:03d}") for i in range(n)}
    assert len(labels) == 1


def test_north_rule_dup_pair_recall_vs_reference_assignments(minhash_edges, pages_rows):
    """North rule: dup-pair recall >= 0.99 vs the REFERENCE's own cluster
    assignments at the same config. The reference's fuzzy mode is tail-hamming
    sorted adjacency (--distance, /root/reference/src/comparator.cpp:76-91);
    refmodel.dedup_sorted mirrors it serially. Every (head, member) dup pair
    the reference finds must land in one engine cluster."""
    ref = refmodel.dedup_sorted(pages_rows, mode="hamming", distance=3)
    ref_pairs = [
        (head, m) for head, members in ref.clusters.items() for m in members if m != head
    ]
    assert len(ref_pairs) >= 20, "corpus must plant enough reference dup pairs"

    edf = minhash_edges.to_pandas()
    comp = refmodel.union_find_components(list(zip(edf["a"], edf["b"])))
    hit = sum(
        1 for h, m in ref_pairs if comp.get(h) is not None and comp.get(h) == comp.get(m)
    )
    recall = hit / len(ref_pairs)
    assert recall >= 0.99, f"dup-pair recall {recall:.4f} over {len(ref_pairs)} pairs"


def test_oph_scheme_recall_and_precision(ds, pages_rows):
    """One-permutation + densification signer: same planted-class recall as
    the K-permutation default through the full LSH pipeline."""
    from fastq_dupaway_ray.functions.sketches import MinHashParams
    from fastq_dupaway_ray.stages.minhash import dedup_edges_minhash

    edges = dedup_edges_minhash(
        ds, params=MinHashParams(scheme="oph"), verify=True, threshold=0.7
    ).to_pandas()
    covered = set(edges["a"]) | set(edges["b"])
    planted = [r["url"] for r in pages_rows if "/dup/exact/" in r["url"] or "/dup/jac095/" in r["url"]]
    assert planted
    hit = sum(1 for u in planted if u in covered)
    assert hit / len(planted) >= 0.99
    # verify step is exact jaccard -> precision holds regardless of scheme
    assert (edges["jaccard"] >= 0.7).all()


def test_simhash_paired_both_mates(ray_session):
    """Paired tail-hamming at scale (SimHash over two text columns): a pair
    is a candidate edge only if EVERY mate is within distance — matching the
    reference's both-mates hamming predicate (comparator.cpp:84-91)."""
    import pandas as pd

    import ray.data as rd

    from fastq_dupaway_ray.stages.simhash import simhash_candidate_edges

    L = "alpha beta gamma delta epsilon zeta eta theta iota kappa " * 5
    R = "one two three four five six seven eight nine ten " * 5
    R_far = "completely different unrelated content tokens everywhere " * 5
    rows = [
        {"url": "a", "warc_ts": 1, "text_1": L, "text_2": R},
        {"url": "b", "warc_ts": 2, "text_1": L, "text_2": R},       # dup of a (both mates)
        {"url": "c", "warc_ts": 3, "text_1": L, "text_2": R_far},   # left matches, right far
    ]
    edges = simhash_candidate_edges(
        rd.from_pandas(pd.DataFrame(rows)),
        distance=3,
        text_cols=("text_1", "text_2"),
        order_cols=("warc_ts", "url"),
    ).to_pandas()
    got = set(zip(edges["a"], edges["b"]))
    assert ("a", "b") in got or ("b", "a") in got
    assert not any("c" in e for e in got), got


def test_verify_join_fallback_matches_broadcast(ray_session, tmp_path):
    """The >budget join-based verify must agree with the broadcast verify —
    exercised with parquet-backed inputs so map_groups' schema-less empty
    blocks (which Arrow hash joins reject) are present."""
    import pandas as pd
    import pyarrow as pa
    import pyarrow.parquet as pq

    import ray.data as rd

    from fastq_dupaway_ray.functions.sketches import MinHashParams
    from fastq_dupaway_ray.stages.minhash import dedup_edges_minhash, verify_edges_jaccard

    base = "quick brown fox jumps over the lazy dog again and again " * 3
    rows = [
        {"url": f"u{i}", "warc_ts": i, "text": base if i % 2 == 0 else f"{base} tail{i}"}
        for i in range(40)
    ]
    p = str(tmp_path / "pages")
    import os

    os.makedirs(p)
    pq.write_table(pa.Table.from_pandas(pd.DataFrame(rows)), os.path.join(p, "part-0.parquet"))
    pages = rd.read_parquet(p)
    edges = dedup_edges_minhash(pages, verify=False).materialize()
    assert edges.count() > 0
    params = MinHashParams()
    thr = params.threshold()
    via_broadcast = verify_edges_jaccard(edges, pages, thr, params=params).to_pandas()
    via_join = verify_edges_jaccard(
        edges, pages, thr, params=params, broadcast_edge_budget=0
    ).to_pandas()
    key = lambda df: sorted(zip(df["a"], df["b"], df["jaccard"].round(9)))
    assert key(via_broadcast) == key(via_join)


def test_numeric_verify_join_fallback_matches_broadcast(ray_session, tmp_path):
    """The numeric spine's two verify limbs (broadcast index vs hash-pair
    join) must agree — and both must emit the STRING (a, b, jaccard)
    contract even though the candidate edges are 128-bit hash pairs."""
    import os

    import pyarrow as pa
    import pyarrow.parquet as pq

    from fastq_dupaway_ray.stages.minhash import (
        lsh_candidate_edges,
        sign_and_band,
        verify_edges_jaccard,
    )

    base = "pack my box with five dozen liquor jugs every single day " * 3
    rows = [
        {"url": f"u{i}", "warc_ts": i, "text": base if i % 2 == 0 else f"{base} tail{i}"}
        for i in range(40)
    ]
    p = str(tmp_path / "pages")
    os.makedirs(p)
    pq.write_table(pa.Table.from_pandas(pd.DataFrame(rows)), os.path.join(p, "part-0.parquet"))
    pages = rd.read_parquet(p)
    params = MinHashParams()
    band_rows = pages.map_batches(
        sign_and_band,
        fn_kwargs={"params": params, "numeric_ids": True},
        batch_format="pyarrow",
    )
    edges = lsh_candidate_edges(band_rows, numeric_ids=True).materialize()
    assert edges.count() > 0
    assert set(edges.schema().names) >= {"ah1", "ah2", "bh1", "bh2"}
    thr = params.threshold()
    via_broadcast = verify_edges_jaccard(edges, pages, thr, params=params).to_pandas()
    via_join = verify_edges_jaccard(
        edges, pages, thr, params=params, broadcast_edge_budget=0
    ).to_pandas()
    key = lambda df: sorted(zip(df["a"], df["b"], df["jaccard"].round(9)))
    assert len(via_broadcast) > 0
    assert key(via_broadcast) == key(via_join)
    assert set(via_broadcast.columns) == {"a", "b", "jaccard"}


def test_verify_paths_agree_on_null_text(ray_session):
    """Advice r2: the join verify's astype(str) turned None into the literal
    "None" (a real word-shingle token) — both verify paths must treat null
    text as empty."""
    import pandas as pd

    import ray.data as rd

    from fastq_dupaway_ray.functions.sketches import MinHashParams
    from fastq_dupaway_ray.stages.minhash import verify_edges_jaccard

    rows = [
        {"url": "a", "warc_ts": 1, "text": None},
        {"url": "b", "warc_ts": 2, "text": None},
        {"url": "c", "warc_ts": 3, "text": "None None None tokens here repeated"},
    ]
    pages = rd.from_pandas(pd.DataFrame(rows))
    edges = rd.from_pandas(pd.DataFrame({"a": ["a", "a"], "b": ["b", "c"]}))
    params = MinHashParams(shingle="word")
    kw = dict(params=params)
    broad = verify_edges_jaccard(edges, pages, 0.0, **kw).to_pandas()
    join = verify_edges_jaccard(
        edges, pages, 0.0, broadcast_edge_budget=0, **kw
    ).to_pandas()
    key = lambda df: sorted(zip(df["a"], df["b"], df["jaccard"].round(9)))
    assert key(broad) == key(join)


def test_min_label_numpy_matches_union_find_random():
    """The vectorized driver components (factorize + minimum.at relaxation)
    must equal the per-edge union-find oracle on random graphs: chains,
    stars, self-loops, duplicate edges, string + int ids."""
    from fastq_dupaway_ray.stages.components import _components_min_label_numpy

    rng = np.random.default_rng(17)
    for trial in range(8):
        n = int(rng.integers(2, 200))
        m = int(rng.integers(1, 400))
        a = rng.integers(0, n, size=m)
        b = rng.integers(0, n, size=m)
        ids = np.array([f"u/{i:04d}" for i in range(n)], dtype=object)
        ea, eb = ids[a], ids[b]
        nodes, labels = _components_min_label_numpy(ea, eb)
        ref = refmodel.union_find_components(list(zip(ea, eb)))
        assert dict(zip(nodes, labels)) == ref, trial
    # long chain in adversarial order (worst case for naive propagation)
    k = 500
    ea = np.array([f"n{i:05d}" for i in range(k - 1, 0, -1)], dtype=object)
    eb = np.array([f"n{i:05d}" for i in range(k - 2, -1, -1)], dtype=object)
    nodes, labels = _components_min_label_numpy(ea, eb)
    assert set(labels) == {"n00000"}


def test_members_from_index_matches_attach_scan(ds, pages_rows):
    """apply_cluster_labels with the verify stage's sharded endpoint index
    (member_attrs) must produce EXACTLY the kept set and clusters table of
    the full-corpus attach-scan path — the index fast path skips a whole
    Dataset pass, not any semantics."""
    vout: dict = {}
    edges = dedup_edges_minhash(
        ds, verify=True, threshold=0.7, signer_concurrency=2,
        order_cols=("warc_ts", "url"), out=vout,
    ).materialize()
    assert "index_shards" in vout, "numeric broadcast limb must have run"
    labels = connected_components(edges).materialize()

    kept_a, clus_a = apply_cluster_labels(ds, labels)  # attach scan
    kept_b, clus_b = apply_cluster_labels(
        ds, labels, member_attrs=(vout["index_shards"], vout["attr_cols"])
    )
    ka = sorted(kept_a.to_pandas()["url"])
    kb = sorted(kept_b.to_pandas()["url"])
    assert ka == kb
    canon = lambda c: sorted(
        map(tuple, c.to_pandas()[["cluster_id", "member", "is_representative"]].values.tolist())
    )
    assert canon(clus_a) == canon(clus_b)


def test_pair_lookup_pos_scans_equal_h1_runs():
    """A 64-bit h1 collision between two distinct ids must not hide the
    later-sorted one (leftmost-only probes silently lose it)."""
    import numpy as np

    from fastq_dupaway_ray.stages.minhash import _pair_lookup_pos

    h1s = np.array([3, 7, 7, 7, 9], dtype=np.uint64)
    h2s = np.array([0, 10, 20, 30, 5], dtype=np.uint64)
    q1 = np.array([7, 7, 7, 9, 1], dtype=np.uint64)
    q2 = np.array([30, 10, 99, 5, 0], dtype=np.uint64)
    pos, found = _pair_lookup_pos(h1s, h2s, q1, q2)
    assert found.tolist() == [True, True, False, True, False]
    assert pos[0] == 3 and pos[1] == 1 and pos[3] == 4


def test_simhash_char_feature_and_length_bucket_recall(ray_session):
    """The reference-parity SimHash config (char shingles + length_bucket +
    raised dense_limit) must recover >= 0.99 of the serial reference
    mirror's dup pairs on a planted corpus — the north-rule recall bar at
    test scale (the committed full-size run lives in RECALL_r05.json)."""
    import itertools

    import ray.data as rd

    from fastq_dupaway_ray import refmodel
    from fastq_dupaway_ray.corpus import CorpusSpec, generate_pages
    from fastq_dupaway_ray.stages.simhash import simhash_candidate_edges

    table = generate_pages(
        CorpusSpec(n_base=1200, exact_dup_rate=0.15, prefix_chain_rate=0.05,
                   hamming_rate=0.35, jaccard_rate=0.03, seed=5)
    )
    rows = table.select(["url", "warc_ts", "text"]).to_pylist()
    gt = refmodel.dedup_sorted(rows, mode="hamming", distance=2)
    gt_pairs = set()
    for members in gt.clusters.values():
        for a, b in itertools.combinations(sorted(members), 2):
            gt_pairs.add((a, b))
    assert len(gt_pairs) > 100

    edges = simhash_candidate_edges(
        rd.from_arrow(table).repartition(8),
        distance=8, feature="char", shingle_k=6,
        length_bucket=True, dense_limit=256,
    ).to_pandas()
    labels = refmodel.union_find_components(list(zip(edges["a"], edges["b"])))
    by_label: dict = {}
    for m, lab in labels.items():
        by_label.setdefault(lab, []).append(m)
    found = set()
    for members in by_label.values():
        for a, b in itertools.combinations(sorted(members), 2):
            found.add((a, b))
    recall = len(found & gt_pairs) / len(gt_pairs)
    assert recall >= 0.99, recall

    # length_bucket costs no recall vs the same config without it
    edges_nb = simhash_candidate_edges(
        rd.from_arrow(table).repartition(8),
        distance=8, feature="char", shingle_k=6, dense_limit=256,
    ).to_pandas()
    nb_set = set(map(tuple, edges_nb[["a", "b"]].itertuples(index=False)))
    lb_set = set(map(tuple, edges[["a", "b"]].itertuples(index=False)))
    # every same-length edge survives bucketing by length
    texts = {r["url"]: r["text"] for r in rows}
    same_len_nb = {
        (a, b) for a, b in nb_set if len(texts[a]) == len(texts[b])
    }
    assert same_len_nb <= lb_set


def test_dedup_config_simhash_parity_knobs(ray_session):
    """DedupConfig's simhash_* knobs reach the stage: the char-shingle
    parity config at ball 8 links a 1-char-substituted near copy that the
    default word-bigram ball 3 cannot reliably see."""
    import pandas as pd
    import ray.data as rd

    from fastq_dupaway_ray.pipelines.dedup import DedupConfig, run_dedup

    base = "alpha beta gamma delta epsilon zeta eta theta " * 6
    near = base.replace("gamma", "gamma", 1)[:-1] + "x"  # same length, 1 sub
    assert len(near) == len(base)
    df = pd.DataFrame(
        {
            "doc_id": [0, 1, 2],
            "text": [base, near, "another body entirely different words " * 6],
            "warc_ts": [0, 1, 2],
        }
    )
    out = run_dedup(
        rd.from_pandas(df),
        DedupConfig(
            mode="simhash",
            id_col="doc_id",
            order_cols=("doc_id",),
            distance=8,
            simhash_feature="char",
            simhash_shingle_k=6,
            simhash_length_bucket=True,
            simhash_dense_limit=256,
            emit_clusters=False,
        ),
    )
    kept = sorted(out.kept.to_pandas()["doc_id"])
    assert kept == [0, 2]  # the near copy merged with its original
