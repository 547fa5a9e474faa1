"""MinHash signatures + LSH banding candidate generation (north-rule core).

Generalizes the reference's exact set-membership dedup
(/root/reference/src/hash_dup_remover.hpp:105-148) to Jaccard near-duplicates:

    shingle (char k-grams) -> K-permutation MinHash -> b band keys
    -> groupby(band_key) -> candidate edges -> verify -> components

Stage design for scale:
* ``MinHashSigner`` is a **stateful actor pool** class: the permutation
  coefficient matrix is built once per actor in ``__init__`` (ST5 in
  SURVEY.md), batches stream through ``__call__``.
* Band keys are emitted as an exploded slim table (band_key, doc id, order) —
  b rows per doc, no text payload — so the candidate groupby shuffles only
  ~b*16 bytes per document.
* Hot buckets (boilerplate pages) are handled two ways: a hard per-bucket
  cap with **star-edge emission** (each member pairs with the bucket minimum,
  O(n) edges instead of O(n^2)), and optional salting of oversized buckets.
"""

from __future__ import annotations

import numpy as np
import pandas as pd
import pyarrow as pa
import ray.data

from ..functions.hashing import char_ngram_hashes, word_ngram_hashes
from ..functions.sketches import MinHasher, MinHashParams
from ..util import default_join_partitions

SIG_COL = "_minhash_sig"


class MinHashSigner:
    """Actor-pool map_batches callable: text -> MinHash signature column.

    __init__ cost (permutation matrix) is paid once per actor, not per batch.
    """

    def __init__(self, params: MinHashParams = MinHashParams(), text_col: str = "text"):
        self.hasher = MinHasher(params)
        self.text_col = text_col

    def __call__(self, batch: pa.Table) -> pa.Table:
        texts = batch[self.text_col].to_pylist()
        k = self.hasher.params.shingle_k
        sigs = np.stack(
            [self.hasher.signature(char_ngram_hashes(t or "", k)) for t in texts]
        )
        sig_arr = pa.FixedSizeListArray.from_arrays(
            pa.array(sigs.ravel(), pa.uint64()), self.hasher.params.num_perms
        )
        return batch.append_column(SIG_COL, sig_arr)


_HASHER_CACHE: dict = {}


def _cached_hasher(params: MinHashParams) -> MinHasher:
    """Once-per-worker-process MinHasher (permutation matrix) — the setup
    cost lives here so the signer can run as an elastic TASK pool instead of
    a fixed-size actor pool (tasks scale to whatever CPUs are free, with no
    actor-startup latency; the state is cheap to build and pure-functional)."""
    h = _HASHER_CACHE.get(params)
    if h is None:
        h = _HASHER_CACHE.setdefault(params, MinHasher(params))
    return h


def _sign_and_band_table(
    batch: pa.Table, hasher: MinHasher, text_col: str, id_col: str, order_cols
) -> pa.Table:
    p = hasher.params
    texts = batch[text_col].to_pylist()
    sigs = hasher.signatures_batch(texts)
    keys = hasher.band_keys_batch(sigs)
    cols = {
        "band_key": pa.array(keys.ravel(), pa.uint64()),
        id_col: _repeat_col(batch[id_col], p.bands),
    }
    for c in order_cols:
        cols[c] = _repeat_col(batch[c], p.bands)
    return pa.table(cols)


def sign_and_band(
    batch: pa.Table,
    params: MinHashParams = MinHashParams(),
    text_col: str = "text",
    id_col: str = "url",
    order_cols=("warc_ts", "url"),
) -> pa.Table:
    """Stateless task form of the signer — the default hot path."""
    order_cols = [c for c in order_cols if c != id_col]
    return _sign_and_band_table(batch, _cached_hasher(params), text_col, id_col, order_cols)


class SignAndBand:
    """Fused actor-pool stage: text -> MinHash -> exploded band-key rows.

    One pool instead of two (signer + emitter): at small CPU counts two
    stacked pools can pin every core and starve the downstream shuffle; fusing
    also skips materializing the signature column when only bands are needed.
    Prefer the task form (``sign_and_band``) unless you need a bounded pool.
    """

    def __init__(self, params: MinHashParams = MinHashParams(), text_col: str = "text", id_col: str = "url", order_cols=("warc_ts", "url")):
        self.hasher = MinHasher(params)
        self.text_col = text_col
        self.id_col = id_col
        self.order_cols = [c for c in order_cols if c != id_col]

    def __call__(self, batch: pa.Table) -> pa.Table:
        return _sign_and_band_table(batch, self.hasher, self.text_col, self.id_col, self.order_cols)


def _repeat_col(arr, times: int):
    if isinstance(arr, pa.ChunkedArray):
        arr = arr.combine_chunks()
    idx = np.repeat(np.arange(len(arr), dtype=np.int64), times)
    return arr.take(pa.array(idx))


def lsh_candidate_edges(
    band_rows: ray.data.Dataset,
    id_col: str = "url",
    order_cols=("warc_ts", "url"),
    max_bucket: int = 256,
    num_shuffle_buckets: int | None = None,
) -> ray.data.Dataset:
    """band rows -> star candidate edges (a, b) with a = LSH-bucket head.

    Star emission keeps hot buckets linear: a bucket of n rows yields n-1
    edges against a head member, which is exactly what connected components
    needs to union the bucket (pairwise edges add no information for
    clustering). Buckets above ``max_bucket`` are SALTED: the sorted bucket
    is chunked into ``max_bucket``-sized salt groups, each emitting a local
    star, and the salt-group heads chain to the global head — full bucket
    connectivity at O(n) edges with no per-head hot spot and no recall loss
    (the north rule's salted-band-keys requirement).

    Shuffle shape: two-level bucketing. A direct groupby(band_key).map_groups
    would pay one Python call per band bucket (millions); instead rows are
    hash-partitioned into ``num_shuffle_buckets`` coarse buckets (the shuffle
    width) and each bucket runs ONE vectorized pandas groupby over all its
    band keys.
    """
    order_cols = [c for c in order_cols]
    B = num_shuffle_buckets or _default_shuffle_buckets()

    def bucketize(t: pa.Table) -> pa.Table:
        bkt = (t["band_key"].to_numpy() % np.uint64(B)).astype(np.int64)
        return t.append_column("_bkt", pa.array(bkt, pa.int64()))

    def per_bucket(df: pd.DataFrame) -> pd.DataFrame:
        df = df.sort_values(["band_key", *order_cols], kind="mergesort")
        g = df.groupby("band_key", sort=False)
        rank = g.cumcount().to_numpy()
        # salt group = rank // max_bucket; local head = first row of the group
        salt = rank // max_bucket
        local_head_sel = rank % max_bucket == 0
        ids = df[id_col].to_numpy()
        # head id per (band_key, salt) via forward-fill of local heads
        head_pos = np.where(local_head_sel, np.arange(len(df)), -1)
        head_pos = np.maximum.accumulate(head_pos)
        head_ids = ids[head_pos]
        # star edges within each salt group (skip the local head itself)
        member = ~local_head_sel
        a = head_ids[member]
        b = ids[member]
        # chain salt-group heads to the bucket's global head (salt > 0)
        chain_sel = local_head_sel & (salt > 0)
        global_head_pos = np.where(local_head_sel & (salt == 0), np.arange(len(df)), -1)
        global_head_pos = np.maximum.accumulate(global_head_pos)
        ca = ids[global_head_pos[chain_sel]]
        cb = ids[chain_sel]
        return pd.DataFrame(
            {"a": np.concatenate([a, ca]), "b": np.concatenate([b, cb])}
        )

    return (
        band_rows.map_batches(bucketize, batch_format="pyarrow")
        .groupby("_bkt")
        .map_groups(per_bucket, batch_format="pandas")
    )


def _default_shuffle_buckets(mult: int = 4) -> int:
    try:
        import ray

        return max(8, int(ray.cluster_resources().get("CPU", 8)) * mult)
    except Exception:
        return 32


_OBJ_CACHE: dict = {}
_OBJ_CACHE_MAX = 8  # bounded: stale entries pin plasma objects + worker heap


def _fetch_cached(ref, build=None):
    """Once-per-worker-process ray.get (+ optional index build) — avoids
    re-deserializing a broadcast object on every batch of a task-pool stage.

    Broadcast PYTHON containers (dict/set of strings) deserialize slowly and
    do so once per worker — at high parallelism that fixed cost scales WITH
    the worker count and inverts scaling. Broadcast Arrow tables/arrays
    instead (zero-copy from plasma) and pass ``build`` to construct the
    worker-local dict/set exactly once. The cache is insertion-order bounded:
    an unbounded cache pins every past run's broadcast (measured: verify
    trials in one session degrading 13s -> 25s as dead indexes accumulate)."""
    key = ref.hex()
    val = _OBJ_CACHE.get(key)
    if val is None:
        obj = ray.get(ref)
        while len(_OBJ_CACHE) >= _OBJ_CACHE_MAX:
            _OBJ_CACHE.pop(next(iter(_OBJ_CACHE)))
        val = _OBJ_CACHE.setdefault(key, build(obj) if build is not None else obj)
    return val


def _build_text_map(t: pa.Table) -> dict:
    return dict(zip(t.column(0).to_pylist(), t.column(1).to_pylist()))


_IDX_SALT = np.uint64(0xC2B2AE3D27D4EB4F)


def _id_hash_pair(vals: np.ndarray):
    from ..functions.hashing import combine_hash64, hash64

    h1 = hash64(vals)
    h2 = combine_hash64(h1, np.full(len(h1), _IDX_SALT, dtype=np.uint64))
    return h1, h2


def _build_text_index(t: pa.Table):
    """Worker-local broadcast-text index keyed by a 128-bit id hash.

    Materializing every broadcast TEXT into a python dict cost ~6 s per
    worker at ~500k endpoints (measured); even the id strings alone cost
    ~1-2 s to materialize + argsort. Hash ids to (h1, h2) uint64 pairs and
    sort by h1 instead — C-speed, size-independent of text length; the texts
    stay zero-copy in Arrow and each batch extracts just ITS endpoints via
    searchsorted + take. The 128-bit check makes a wrong-text lookup as
    unlikely as the engine's exact-dedup identity collisions (~2^-128)."""
    ids = t.column(0).to_numpy(zero_copy_only=False).astype(object)
    h1, h2 = _id_hash_pair(ids)
    order = np.argsort(h1, kind="stable").astype(np.int64)
    texts = t.column(1)
    if isinstance(texts, pa.ChunkedArray):
        texts = texts.combine_chunks()
    return h1[order], h2[order], texts, order


def _index_lookup_texts(index, want_ids: np.ndarray) -> list:
    """Texts for ``want_ids`` from a _build_text_index (missing -> None)."""
    h1s, h2s, text_arr, order = index
    n = len(h1s)
    if n == 0:
        return [None] * len(want_ids)
    q1, q2 = _id_hash_pair(want_ids)
    pos = np.searchsorted(h1s, q1)
    pos[pos == n] = n - 1
    found = (h1s[pos] == q1) & (h2s[pos] == q2)
    take = order[pos]
    out = text_arr.take(pa.array(take)).to_pylist()
    return [t if ok else None for t, ok in zip(out, found)]


def _shingle_fn(spec):
    """spec = ("char", k) | ("word", n) -> text -> uint64[] unique shingles."""
    mode, size = spec
    if mode == "word":
        return lambda t: word_ngram_hashes(t, size)
    return lambda t: char_ngram_hashes(t, size)


def pairwise_jaccard(
    a_idx: np.ndarray, b_idx: np.ndarray, allv: np.ndarray, starts: np.ndarray, counts: np.ndarray
) -> np.ndarray:
    """Jaccard for P endpoint-index pairs over ragged unique-shingle segments
    (``allv[starts[i]:starts[i]+counts[i]]`` = endpoint i's SORTED unique set).

    |A ∩ B| by per-pair ``np.searchsorted`` membership of the smaller set in
    the larger — two C calls per pair over zero-copy views, no per-element
    Python. (A "fully vectorized" ragged-gather + lexsort formulation was
    measured ~50x slower: it re-sorts data that is already sorted per
    segment.)
    """
    P = len(a_idx)
    if P == 0:
        return np.empty(0, dtype=np.float64)
    out = np.empty(P, dtype=np.float64)
    ca, cb = counts[a_idx], counts[b_idx]
    sa, sb = starts[a_idx], starts[b_idx]
    for p in range(P):
        na, nb = ca[p], cb[p]
        if na == 0 and nb == 0:
            out[p] = 1.0
            continue
        if na == 0 or nb == 0:
            out[p] = 0.0
            continue
        A = allv[sa[p] : sa[p] + na]
        B = allv[sb[p] : sb[p] + nb]
        if na < nb:  # probe the smaller set into the larger
            A, B = B, A
            na, nb = nb, na
        pos = np.searchsorted(A, B)
        pos[pos == na] = na - 1
        inter = int(np.count_nonzero(A[pos] == B))
        out[p] = inter / (na + nb - inter)
    return out


def _verify_score_batch(df: pd.DataFrame, texts_ref, spec, threshold: float) -> pd.DataFrame:
    """Exact-Jaccard scoring of one edge batch: shingle each unique endpoint
    once (numpy polynomial hashing per doc; texts pulled zero-copy from the
    broadcast Arrow index), then the searchsorted pairwise_jaccard kernel."""
    index = _fetch_cached(texts_ref, _build_text_index)
    shingles = _shingle_fn(spec)
    ids = pd.unique(np.concatenate([df["a"].to_numpy(), df["b"].to_numpy()]))
    batch_texts = _index_lookup_texts(index, np.asarray(ids, dtype=object))
    sets = [shingles(t or "") for t in batch_texts]
    counts = np.array([len(s) for s in sets], dtype=np.int64)
    starts = np.cumsum(counts) - counts
    allv = np.concatenate(sets) if sets else np.empty(0, dtype=np.uint64)
    lut = {v: i for i, v in enumerate(ids)}
    a_idx = df["a"].map(lut).to_numpy(dtype=np.int64)
    b_idx = df["b"].map(lut).to_numpy(dtype=np.int64)
    out = df[["a", "b"]].copy()
    out["jaccard"] = pairwise_jaccard(a_idx, b_idx, allv, starts, counts)
    return out[out["jaccard"] >= threshold]


def verify_edges_jaccard(
    edges: ray.data.Dataset,
    pages: ray.data.Dataset,
    threshold: float,
    params: MinHashParams = MinHashParams(),
    id_col: str = "url",
    text_col: str = "text",
    num_partitions: int | None = None,
    broadcast_edge_budget: int = 500_000,
) -> ray.data.Dataset:
    """Exact-Jaccard verification of candidate edges against the real shingles.

    Dispatch on edge-list size (the candidate relation is a few % of the
    corpus by LSH design):

    * small side (default): collect the edge endpoints, stream ONE filter
      pass over the corpus to pull just their texts, broadcast that id->text
      map via ``ray.put``, and score edges in an elastic task pool — zero
      shuffles, no join actors. This is the fast path at every scale where
      the endpoint text map fits the object store (~GBs).
    * fallback: two distributed hash joins (the original formulation) when
      the edge list exceeds ``broadcast_edge_budget``.

    Returns edges with a ``jaccard`` column filtered to >= threshold.
    ``edges`` should be materialized by the caller (it is counted here).
    """
    n_edges = edges.count()
    if n_edges == 0:
        return edges
    if n_edges <= broadcast_edge_budget:
        edf = edges.to_pandas()
        endpoints = pd.unique(np.concatenate([edf["a"].to_numpy(), edf["b"].to_numpy()]))
        ep_ref = ray.put(pa.array(endpoints))

        def pick(t: pa.Table) -> pa.Table:
            eps = _fetch_cached(ep_ref, lambda a: set(a.to_pylist()))
            ids = t[id_col].to_numpy(zero_copy_only=False).astype(object)
            mask = pd.Series(ids).isin(eps).to_numpy()
            return t.select([id_col, text_col]).filter(pa.array(mask))

        # the endpoint texts never touch the driver: picked blocks stay in
        # the object store and a remote task concatenates them into the ONE
        # broadcast table whose ref the scorers fetch
        picked = (
            pages.select_columns([id_col, text_col])
            .map_batches(pick, batch_format="pyarrow")
            .materialize()
        )

        @ray.remote
        def _assemble(*blocks):
            tabs = [
                b if isinstance(b, pa.Table) else pa.Table.from_pandas(b, preserve_index=False)
                for b in blocks
            ]
            # pandas-backed pipelines emit empty blocks whose inferred schema
            # (null types) mismatches the real one — keep non-empty only and
            # unify to the first real schema before concat
            tabs = [t for t in tabs if t.num_rows > 0]
            if not tabs:
                return pa.table({id_col: pa.array([]), text_col: pa.array([], pa.string())})
            schema = tabs[0].select([id_col, text_col]).schema
            return pa.concat_tables([t.select([id_col, text_col]).cast(schema) for t in tabs])

        block_refs = [
            ref for bundle in picked.iter_internal_ref_bundles() for ref, _meta in bundle.blocks
        ]
        texts_ref = _assemble.remote(*block_refs)
        # scoring parallelism = block count; the edge list often lands in a
        # handful of groupby output blocks, so spread it before the pool
        n_blocks = max(8, int(ray.cluster_resources().get("CPU", 8)) * 2)
        return edges.repartition(n_blocks).map_batches(
            _verify_score_batch,
            fn_kwargs={
                "texts_ref": texts_ref,
                "spec": (params.shingle, params.word_n if params.shingle == "word" else params.shingle_k),
                "threshold": threshold,
            },
            batch_format="pandas",
        )
    return _verify_edges_join(
        edges, pages, threshold, params=params, id_col=id_col,
        text_col=text_col, num_partitions=num_partitions,
    )


def _verify_edges_join(
    edges: ray.data.Dataset,
    pages: ray.data.Dataset,
    threshold: float,
    params: MinHashParams = MinHashParams(),
    id_col: str = "url",
    text_col: str = "text",
    num_partitions: int | None = None,
) -> ray.data.Dataset:
    """Join-based verify (the >broadcast-budget path).

    Joins the slim edge list back to text twice (a side, b side) via Ray's
    hash join, then recomputes true shingle Jaccard per pair — the analogue of
    the reference comparing actual bytes after hash routing.

    Callers should pass a *materialized* ``edges`` dataset: chaining the
    upstream actor pools + sort + two hash joins into one lazy plan can
    deadlock on small CPU counts (every operator pins actors/CPUs at once).
    """
    from ..util import coalesce_schema_blocks

    num_partitions = num_partitions or default_join_partitions()
    texts = pages.select_columns([id_col, text_col])
    # map_groups-produced edge lists can contain schema-less empty blocks
    # that the Arrow hash join rejects — normalize first
    edges = coalesce_schema_blocks(edges)
    ea = (
        edges.join(texts, "inner", num_partitions=num_partitions, on=("a",), right_on=(id_col,))
        .rename_columns({text_col: "_text_a"})
        .materialize()  # two join operators in one plan can over-pin aggregator actors
    )
    # empty join partitions skip the rename Project and keep the pre-rename
    # schema; the second hash join then sees mixed schemas and rejects the
    # key ("No match or multiple matches") — drop the empties first
    ea = coalesce_schema_blocks(ea)
    eab = ea.join(
        texts, "inner", num_partitions=num_partitions, on=("b",), right_on=(id_col,)
    ).rename_columns({text_col: "_text_b"})

    spec = (params.shingle, params.word_n if params.shingle == "word" else params.shingle_k)

    def score(df: pd.DataFrame) -> pd.DataFrame:
        shingles = _shingle_fn(spec)
        P = len(df)
        both = np.concatenate(
            [df["_text_a"].to_numpy(dtype=object), df["_text_b"].to_numpy(dtype=object)]
        )
        # normalize nulls to "" (astype(str) would turn None into the literal
        # string "None" — a real one-token document in word-shingle mode,
        # diverging from the broadcast verify path's `t or ""` handling)
        both = np.array([t if isinstance(t, str) else "" for t in both], dtype=object)
        uniq, inv = np.unique(both, return_inverse=True)
        sets = [shingles(t) for t in uniq]
        counts = np.array([len(s) for s in sets], dtype=np.int64)
        starts = np.cumsum(counts) - counts
        allv = np.concatenate(sets) if sets else np.empty(0, dtype=np.uint64)
        out = df[["a", "b"]].copy()
        out["jaccard"] = pairwise_jaccard(inv[:P], inv[P:], allv, starts, counts)
        return out[out["jaccard"] >= threshold]

    return eab.map_batches(score, batch_format="pandas")


def dedup_edges_minhash(
    pages: ray.data.Dataset,
    params: MinHashParams = MinHashParams(),
    id_col: str = "url",
    text_col: str = "text",
    order_cols=("warc_ts", "url"),
    verify: bool = True,
    threshold: float | None = None,
    signer_concurrency=None,
    max_bucket: int = 256,
) -> ray.data.Dataset:
    """pages -> verified near-duplicate candidate edges (a, b)[, jaccard].

    The full candidate half of the MinHash pipeline; feed the result into
    stages.components.connected_components and stages.representative.
    """
    threshold = params.threshold() if threshold is None else threshold
    slim = pages.select_columns(sorted(set([id_col, text_col, *order_cols])))
    sign_kwargs = {
        "params": params,
        "text_col": text_col,
        "id_col": id_col,
        "order_cols": order_cols,
    }
    if signer_concurrency is None:
        # default: elastic task pool — scales to free CPUs, no actor startup
        band_rows = slim.map_batches(
            sign_and_band, fn_kwargs=sign_kwargs, batch_format="pyarrow", batch_size=2048
        )
    else:
        band_rows = slim.map_batches(
            SignAndBand,
            fn_constructor_kwargs=sign_kwargs,
            batch_format="pyarrow",
            batch_size=2048,
            concurrency=signer_concurrency,
        )
    edges = lsh_candidate_edges(band_rows, id_col=id_col, order_cols=order_cols, max_bucket=max_bucket)
    # the same (a, b) pair can surface from several bands — dedup the slim
    # edge list (bucketed vectorized pass) before the expensive verify join.
    # materialize: the edge list is tiny relative to the corpus, and breaking
    # the plan here releases the signer/band actor pools before the join
    # operator pins its aggregators (deadlock-free on small CPU counts).
    from .simhash import dedup_edge_list

    edges = dedup_edge_list(edges).materialize()
    if verify:
        edges = verify_edges_jaccard(
            edges, pages, threshold, params=params, id_col=id_col, text_col=text_col
        )
    return edges
