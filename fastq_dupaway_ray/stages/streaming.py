"""Streaming dedup via a sharded mutable seen-index — raw Ray actors (ST1).

The reference's fast mode holds ONE in-process ``unordered_set`` of record
hashes and streams records through it (/root/reference/src/hash_dup_remover.hpp
:113-148). The batch engine replaces that state with a shuffle
(stages.dedup_exact); this module is the genuinely-streaming variant for
INCREMENTAL ingestion (new crawl slices arriving against an already-deduped
corpus), where a shared mutable index is exactly the semantic and the Dataset
API cannot express it — the documented "drop to raw @ray.remote actors" case.

Design:
* ``DedupIndexShard`` actors partition the 128-bit identity space by
  ``k1 % n_shards`` — each shard owns a disjoint slice, so no coordination,
  and memory scales horizontally (the reference's unbounded single-process
  set was its scale ceiling).
* A ``map_batches`` task computes identities, routes sub-arrays to shards
  (one ``check_and_add`` round-trip per shard per batch, vectorized inside),
  and filters the batch to first-seen rows.
* Ordering: keeps the first occurrence in PROCESSING order, like the
  reference's file-stream order. Across a parallel run, block order is not
  deterministic — use stages.dedup_exact when reproducible keep-first by an
  order key is required (that is the batch default everywhere else).
"""

from __future__ import annotations

import numpy as np
import pyarrow as pa
import ray
import ray.data

from .dedup_exact import _identity128


@ray.remote(num_cpus=0.25)
class DedupIndexShard:
    """Owns the slice {identity : k1 % n_shards == shard_id} of the seen-set.

    Storage is an LSM-style list of (k1, k2) chunk pairs, each sorted by
    (k1, k2): membership is a vectorized ``searchsorted`` per chunk (k1 is a
    64-bit hash, so duplicate-k1 runs are ~birthday-rare and handled by a
    tiny exact fallback); inserts accumulate in a small sorted pending chunk
    that is promoted at ``_PENDING_MAX`` and compacted when chunks pile up.
    No per-row Python in the hot path (round-1 used a tuple-set loop)."""

    _PENDING_MAX = 1 << 16
    _MAX_CHUNKS = 24

    def __init__(self):
        self.chunks: list[tuple[np.ndarray, np.ndarray]] = []
        self.n = 0

    def _contains(self, k1: np.ndarray, k2: np.ndarray) -> np.ndarray:
        hit = np.zeros(len(k1), dtype=bool)
        for ck1, ck2 in self.chunks:
            if len(ck1) == 0:
                continue
            left = np.searchsorted(ck1, k1, side="left")
            right = np.searchsorted(ck1, k1, side="right")
            # common case: run length <= 1 — direct compare at `left`
            pos = np.minimum(left, len(ck1) - 1)
            one = (right - left == 1) & (ck1[pos] == k1) & (ck2[pos] == k2)
            hit |= one
            multi = np.nonzero(right - left > 1)[0]  # rare k1 collisions
            for i in multi:
                if k2[i] in ck2[left[i] : right[i]]:
                    hit[i] = True
        return hit

    def check_and_add(self, packed: np.ndarray) -> np.ndarray:
        """uint64[n,2] identities -> bool[n] mask of first-seen rows (first in
        arrival order within the batch). Mutates the index."""
        k1 = np.ascontiguousarray(packed[:, 0], dtype=np.uint64)
        k2 = np.ascontiguousarray(packed[:, 1], dtype=np.uint64)
        n = len(k1)
        if n == 0:
            return np.zeros(0, dtype=bool)
        seen = self._contains(k1, k2)
        # within-batch first occurrence per key, in arrival order
        order = np.lexsort((k2, k1))
        sk1, sk2 = k1[order], k2[order]
        run_start = np.ones(n, dtype=bool)
        run_start[1:] = (sk1[1:] != sk1[:-1]) | (sk2[1:] != sk2[:-1])
        starts = np.nonzero(run_start)[0]
        first_idx = np.minimum.reduceat(order, starts)  # arrival-first per key
        fresh = first_idx[~seen[first_idx]]
        keep = np.zeros(n, dtype=bool)
        keep[fresh] = True
        if len(fresh):
            self._append(k1[fresh], k2[fresh])
        return keep

    def _append(self, k1: np.ndarray, k2: np.ndarray):
        order = np.lexsort((k2, k1))
        self.n += len(k1)
        # merge into the pending (last, small) chunk while it stays small
        if self.chunks and len(self.chunks[-1][0]) < self._PENDING_MAX:
            pk1, pk2 = self.chunks.pop()
            m1 = np.concatenate([pk1, k1[order]])
            m2 = np.concatenate([pk2, k2[order]])
            mo = np.lexsort((m2, m1))
            self.chunks.append((m1[mo], m2[mo]))
        else:
            self.chunks.append((k1[order], k2[order]))
        if len(self.chunks) > self._MAX_CHUNKS:
            m1 = np.concatenate([c[0] for c in self.chunks])
            m2 = np.concatenate([c[1] for c in self.chunks])
            mo = np.lexsort((m2, m1))
            self.chunks = [(m1[mo], m2[mo]), (np.empty(0, np.uint64), np.empty(0, np.uint64))]

    def size(self) -> int:
        return self.n


class StreamingDedup:
    """Callable for ``map_batches``: filter each batch to first-seen rows.

    Holds the shard actor handles (constructed once on the driver, shipped to
    each worker); every batch makes one round-trip per shard that owns at
    least one of its identities.
    """

    def __init__(self, shard_handles, key_cols=("text",)):
        self.shards = shard_handles
        self.key_cols = list(key_cols)

    def __call__(self, batch: pa.Table) -> pa.Table:
        k1, k2 = _identity128(batch, self.key_cols)
        packed = np.stack([k1, k2], axis=1)
        n_shards = len(self.shards)
        owner = (k1 % np.uint64(n_shards)).astype(np.int64)
        keep = np.zeros(len(k1), dtype=bool)
        futures, rows_per_shard = [], []
        for s in range(n_shards):
            rows = np.nonzero(owner == s)[0]
            if len(rows):
                futures.append(self.shards[s].check_and_add.remote(packed[rows]))
                rows_per_shard.append(rows)
        for rows, mask in zip(rows_per_shard, ray.get(futures)):
            keep[rows] = mask
        return batch.filter(pa.array(keep))


def make_index(n_shards: int = 8):
    """Spin up the shard pool; reuse one index across many incremental runs."""
    return [DedupIndexShard.remote() for _ in range(n_shards)]


@ray.remote(num_cpus=0.25)
class BandIndexShard:
    """Streaming NEAR-dup index shard: owns the LSH band keys with
    ``band_key % n_shards == shard_id``. Each bucket stores the signatures of
    previously KEPT docs that emitted that band key (ST5 as mutable state —
    the near-dup analogue of the exact seen-set shards above).

    Memory: one (id, 128x8B signature) per kept doc per resident band —
    horizontal across shards; at 10^12 docs this is the component you scale
    by adding shards/nodes (the corpus text itself never enters the index).
    """

    def __init__(self, max_bucket: int = 64):
        self.buckets: dict = {}  # band_key -> (list[id], list[np.ndarray sig])
        self.max_bucket = max_bucket

    def query(self, band_keys: np.ndarray):
        """For each band key: the resident (ids, sig matrix) of its bucket."""
        out = []
        for k in band_keys.tolist():
            b = self.buckets.get(k)
            if b is None:
                out.append(None)
            else:
                out.append((list(b[0]), np.stack(b[1])))
        return out

    def add(self, band_keys: np.ndarray, ids, sigs: np.ndarray):
        """Insert kept docs' signatures under their band keys (bounded per
        bucket — hot boilerplate bands keep only the first max_bucket heads,
        the salted-star memory bound)."""
        for k, i, s in zip(band_keys.tolist(), ids, sigs):
            b = self.buckets.setdefault(k, ([], []))
            if len(b[0]) < self.max_bucket:
                b[0].append(i)
                b[1].append(s)

    def size(self) -> int:
        return sum(len(b[0]) for b in self.buckets.values())


class StreamingNearDedup:
    """map_batches callable: drop batch rows whose MinHash signature matches a
    previously-kept doc above ``threshold`` (estimated Jaccard = fraction of
    agreeing signature positions); survivors register their band keys.

    Mirrors the exact streaming index's processing-order semantics. The
    check-then-insert is atomic per batch but not across concurrent batches —
    run ``concurrency=1`` for strict first-wins semantics (the reference is
    serial anyway); parallel ingest may rarely keep both of a near-pair
    (documented, like the reference's own adjacency approximation).
    """

    def __init__(self, shard_handles, params=None, text_col: str = "text", id_col: str = "url",
                 threshold: float | None = None):
        from ..functions.sketches import MinHashParams

        self.shards = shard_handles
        self.params = params or MinHashParams()
        self.text_col = text_col
        self.id_col = id_col
        self.threshold = threshold if threshold is not None else self.params.threshold()

    def __call__(self, batch: pa.Table) -> pa.Table:
        from .minhash import _cached_hasher

        hasher = _cached_hasher(self.params)
        texts = batch[self.text_col].to_pylist()
        ids = batch[self.id_col].to_pylist()
        n = len(texts)
        if n == 0:
            return batch
        sigs = hasher.signatures_batch(texts)  # (n, K)
        keys = hasher.band_keys_batch(sigs)  # (n, bands)
        S = len(self.shards)
        flat_keys = keys.ravel()
        owner = (flat_keys % np.uint64(S)).astype(np.int64)
        futures, slots = [], []
        for s in range(S):
            rows = np.nonzero(owner == s)[0]
            if len(rows):
                futures.append(self.shards[s].query.remote(flat_keys[rows]))
                slots.append(rows)
        responses = [None] * len(flat_keys)
        for rows, res in zip(slots, ray.get(futures)):
            for r, v in zip(rows, res):
                responses[r] = v
        K = self.params.num_perms
        keep = np.ones(n, dtype=bool)
        kept_sigs: dict = {}  # within-batch kept docs also candidate against each other
        kept_keys: dict = {}
        for i in range(n):
            dup = False
            cand_sigs, seen_ids = [], set()
            for b in range(keys.shape[1]):
                resp = responses[i * keys.shape[1] + b]
                if resp is not None:
                    for cid, csig in zip(resp[0], resp[1]):
                        if cid not in seen_ids:
                            seen_ids.add(cid)
                            cand_sigs.append(csig)
                # within-batch candidates from earlier kept rows of this batch
                prior = kept_keys.get(int(keys[i, b]))
                if prior is not None:
                    for cid in prior:
                        if cid not in seen_ids:
                            seen_ids.add(cid)
                            cand_sigs.append(kept_sigs[cid])
            if cand_sigs:
                agree = (np.stack(cand_sigs) == sigs[i][None, :]).mean(axis=1)
                dup = bool((agree >= self.threshold).any())
            keep[i] = not dup
            if not dup:
                kept_sigs[ids[i]] = sigs[i]
                for b in range(keys.shape[1]):
                    kept_keys.setdefault(int(keys[i, b]), []).append(ids[i])
        # register the kept docs' bands
        kept_rows = np.nonzero(keep)[0]
        if len(kept_rows):
            kk = keys[kept_rows].ravel()
            kown = (kk % np.uint64(S)).astype(np.int64)
            ksigs = np.repeat(sigs[kept_rows], keys.shape[1], axis=0)
            kids = np.repeat(np.array(ids, dtype=object)[kept_rows], keys.shape[1])
            adds = []
            for s in range(S):
                rows = np.nonzero(kown == s)[0]
                if len(rows):
                    adds.append(self.shards[s].add.remote(kk[rows], kids[rows].tolist(), ksigs[rows]))
            ray.get(adds)
        return batch.filter(pa.array(keep))


def make_band_index(n_shards: int = 8, max_bucket: int = 64):
    return [BandIndexShard.remote(max_bucket=max_bucket) for _ in range(n_shards)]


def streaming_dedup_neardup(
    ds: ray.data.Dataset,
    index=None,
    params=None,
    text_col: str = "text",
    id_col: str = "url",
    threshold: float | None = None,
    n_shards: int = 8,
    batch_size: int = 2048,
    concurrency=1,
):
    """Incremental MinHash near-dedup against a persistent sharded band index.

    Returns (kept_dataset, index); feed later slices the same ``index``.
    ``concurrency=1`` gives strict first-wins semantics (see
    StreamingNearDedup)."""
    index = index if index is not None else make_band_index(n_shards)
    kept = ds.map_batches(
        StreamingNearDedup,
        fn_constructor_kwargs={
            "shard_handles": index,
            "params": params,
            "text_col": text_col,
            "id_col": id_col,
            "threshold": threshold,
        },
        batch_format="pyarrow",
        batch_size=batch_size,
        concurrency=concurrency,
    )
    return kept, index


def streaming_dedup_exact(
    ds: ray.data.Dataset,
    index=None,
    key_cols=("text",),
    n_shards: int = 8,
    batch_size: int = 2048,
    concurrency=(1, 8),
):
    """Returns (kept_dataset, index). Feed later slices the same ``index`` to
    dedup them against everything already ingested."""
    index = index if index is not None else make_index(n_shards)
    kept = ds.map_batches(
        StreamingDedup,
        fn_constructor_kwargs={"shard_handles": index, "key_cols": key_cols},
        batch_format="pyarrow",
        batch_size=batch_size,
        concurrency=concurrency,
    )
    return kept, index
