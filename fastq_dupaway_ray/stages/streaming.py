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
import pandas as pd
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

    def snapshot(self):
        """Compacted state for persistence: one sorted (k1, k2) pair."""
        if not self.chunks:
            return np.empty(0, np.uint64), np.empty(0, np.uint64)
        m1 = np.concatenate([c[0] for c in self.chunks])
        m2 = np.concatenate([c[1] for c in self.chunks])
        mo = np.lexsort((m2, m1))
        return m1[mo], m2[mo]

    def restore(self, k1: np.ndarray, k2: np.ndarray) -> int:
        self.chunks = [(np.asarray(k1, np.uint64), np.asarray(k2, np.uint64))]
        self.n = len(k1)
        return self.n

    def save_part(self, path: str) -> dict:
        """Write this shard's snapshot parquet ITSELF (shard-local IO —
        state never funnels through the driver; the path must be shared
        storage on multi-node, same assumption as every checkpoint)."""
        import pyarrow.parquet as pq

        k1, k2 = self.snapshot()
        t = pa.table({"k1": pa.array(k1, pa.uint64()), "k2": pa.array(k2, pa.uint64())})
        pq.write_table(t, path)
        return {"rows": t.num_rows}

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
        # band_key -> [ids list, sigs list, cached stacked matrix | None]
        self.buckets: dict = {}
        self.max_bucket = max_bucket

    def query(self, band_keys: np.ndarray):
        """Stacked response for a whole batch of band keys: ``lengths[j]``
        candidates live under ``band_keys[j]``; their ids and signatures come
        back concatenated in key order (one allocation — the per-key
        ``np.stack`` of round 2 is now a cached per-bucket matrix)."""
        lengths = np.zeros(len(band_keys), dtype=np.int64)
        ids: list = []
        mats = []
        for j, k in enumerate(band_keys.tolist()):
            b = self.buckets.get(k)
            if b:
                m = b[2]
                if m is None:
                    m = b[2] = np.stack(b[1])
                lengths[j] = len(b[0])
                ids.extend(b[0])
                mats.append(m)
        sigs = np.concatenate(mats, axis=0) if mats else None
        return lengths, ids, sigs

    def add(self, band_keys: np.ndarray, ids, sigs: np.ndarray) -> np.ndarray:
        """Insert kept docs' signatures under their band keys (bounded per
        bucket — hot boilerplate bands keep only the first max_bucket heads,
        the salted-star memory bound). Returns bool[n] inserted mask so the
        caller can guarantee every kept doc lands in at least one bucket
        (``force_add`` fallback when all of a doc's bands are full)."""
        inserted = np.zeros(len(ids), dtype=bool)
        for j, (k, i) in enumerate(zip(band_keys.tolist(), ids)):
            b = self.buckets.get(k)
            if b is None:
                b = self.buckets[k] = [[], [], None]
            if len(b[0]) < self.max_bucket:
                b[0].append(i)
                b[1].append(sigs[j])
                b[2] = None
                inserted[j] = True
        return inserted

    def force_add(self, band_key: int, doc_id, sig: np.ndarray):
        """Evict-oldest insert: a kept doc whose EVERY band bucket is full
        would otherwise never be indexed anywhere, so later near-duplicates
        of it could not find it (recall loss beyond the documented
        concurrent-ingest caveat). FIFO eviction keeps the memory bound."""
        b = self.buckets.get(band_key)
        if b is None:
            b = self.buckets[band_key] = [[], [], None]
        if len(b[0]) >= self.max_bucket:
            b[0].pop(0)
            b[1].pop(0)
        b[0].append(doc_id)
        b[1].append(sig)
        b[2] = None

    def snapshot(self):
        """Flattened state: (band_keys, positions, ids, sig matrix) — the
        per-bucket position preserves insertion order, which max_bucket
        first-wins and FIFO eviction semantics depend on."""
        keys, poss, ids, sigs = [], [], [], []
        for k, b in self.buckets.items():
            for p, (i, s) in enumerate(zip(b[0], b[1])):
                keys.append(k)
                poss.append(p)
                ids.append(i)
                sigs.append(s)
        sig_mat = np.stack(sigs) if sigs else np.empty((0, 0), np.uint64)
        return (
            np.array(keys, dtype=np.uint64),
            np.array(poss, dtype=np.int32),
            ids,
            sig_mat,
        )

    def restore(self, keys: np.ndarray, poss: np.ndarray, ids, sig_mat: np.ndarray) -> int:
        self.buckets = {}
        order = np.lexsort((poss, keys))
        for j in order.tolist():
            k = int(keys[j])
            b = self.buckets.get(k)
            if b is None:
                b = self.buckets[k] = [[], [], None]
            b[0].append(ids[j])
            b[1].append(sig_mat[j])
        return self.size()

    def save_part(self, path: str) -> dict:
        import pyarrow.parquet as pq

        keys, poss, ids, sig_mat = self.snapshot()
        K = sig_mat.shape[1] if sig_mat.size else 0
        t = pa.table(
            {
                "band_key": pa.array(keys, pa.uint64()),
                "pos": pa.array(poss, pa.int32()),
                "id": pa.array(list(ids)),
                "sig": pa.FixedSizeListArray.from_arrays(
                    pa.array(sig_mat.ravel(), pa.uint64()), K or 1
                )
                if len(keys)
                else pa.array([], pa.list_(pa.uint64(), 1)),
            }
        )
        pq.write_table(t, path)
        return {"rows": t.num_rows, "sig_width": K, "max_bucket": self.max_bucket}

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
        keys = hasher.band_keys_batch(sigs)  # (n, B)
        B = keys.shape[1]
        S = len(self.shards)
        flat_keys = keys.ravel()
        flat_doc = np.repeat(np.arange(n), B)
        owner = (flat_keys % np.uint64(S)).astype(np.int64)
        futures, slots = [], []
        for s in range(S):
            rows = np.nonzero(owner == s)[0]
            if len(rows):
                futures.append(self.shards[s].query.remote(flat_keys[rows]))
                slots.append(rows)
        # assemble ALL shard candidates into one (doc, id, signature) column
        # set — one stacked matrix compare per batch, no per-row Python
        cand_doc_parts, cand_id_parts, cand_sig_parts = [], [], []
        for rows, (lengths, cids, csigs) in zip(slots, ray.get(futures)):
            if csigs is not None and len(cids):
                cand_doc_parts.append(np.repeat(flat_doc[rows], lengths))
                cand_id_parts.append(np.array(cids, dtype=object))
                cand_sig_parts.append(csigs)
        keep = np.ones(n, dtype=bool)
        if cand_doc_parts:
            cdoc = np.concatenate(cand_doc_parts)
            cid = np.concatenate(cand_id_parts)
            csig = np.concatenate(cand_sig_parts, axis=0)
            # same head can sit in several of a doc's band buckets — compare
            # each (doc, candidate) once
            _, code = np.unique(cid, return_inverse=True)
            pairkey = cdoc.astype(np.int64) * (int(code.max()) + 1) + code
            sel = np.unique(pairkey, return_index=True)[1]
            agree = (csig[sel] == sigs[cdoc[sel]]).mean(axis=1)
            keep[np.unique(cdoc[sel][agree >= self.threshold])] = False
        # within-batch chaining (grouped pass): rows sharing a band key form
        # candidate pairs; all pair agreements score in ONE vectorized compare,
        # then a tiny scalar pass applies first-wins chain semantics
        order = np.argsort(flat_keys, kind="stable")
        sk, sd = flat_keys[order], flat_doc[order]
        run_start = np.ones(len(sk), dtype=bool)
        run_start[1:] = sk[1:] != sk[:-1]
        starts = np.nonzero(run_start)[0]
        ends = np.append(starts[1:], len(sk))
        pi_parts, pj_parts = [], []
        for s0, e0 in zip(starts[ends - starts > 1], ends[ends - starts > 1]):
            docs = np.unique(sd[s0:e0])
            if len(docs) > 1:
                ii, jj = np.triu_indices(len(docs), k=1)
                pi_parts.append(docs[ii])
                pj_parts.append(docs[jj])
        if pi_parts:
            pi = np.concatenate(pi_parts)
            pj = np.concatenate(pj_parts)
            sel = np.unique(pi * n + pj, return_index=True)[1]
            pi, pj = pi[sel], pj[sel]
            match = (sigs[pi] == sigs[pj]).mean(axis=1) >= self.threshold
            pi, pj = pi[match], pj[match]
            o2 = np.argsort(pj, kind="stable")
            for i_, j_ in zip(pi[o2].tolist(), pj[o2].tolist()):
                # j is dropped iff an earlier KEPT row matches; keep[i] is
                # final here because every pair has i < j and j's ascend
                if keep[i_] and keep[j_]:
                    keep[j_] = False
        # register the kept docs' bands
        kept_rows = np.nonzero(keep)[0]
        if len(kept_rows):
            kk = keys[kept_rows].ravel()
            kown = (kk % np.uint64(S)).astype(np.int64)
            ksigs = np.repeat(sigs[kept_rows], B, axis=0)
            kids = np.repeat(np.array(ids, dtype=object)[kept_rows], B)
            adds, add_rows = [], []
            for s in range(S):
                rows = np.nonzero(kown == s)[0]
                if len(rows):
                    adds.append(
                        self.shards[s].add.remote(kk[rows], kids[rows].tolist(), ksigs[rows])
                    )
                    add_rows.append(rows)
            inserted = np.zeros(len(kk), dtype=bool)
            for rows, mask in zip(add_rows, ray.get(adds)):
                inserted[rows] = mask
            # docs whose every band bucket was full would vanish from the
            # index — force-insert (evict-oldest) into their first band
            orphans = np.nonzero(~inserted.reshape(len(kept_rows), B).any(axis=1))[0]
            if len(orphans):
                forced = []
                for o in orphans.tolist():
                    r = kept_rows[o]
                    k0 = int(keys[r, 0])
                    forced.append(
                        self.shards[k0 % S].force_add.remote(k0, ids[r], sigs[r])
                    )
                ray.get(forced)
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


@ray.remote(num_cpus=0.25)
class QuotaShard:
    """Streaming per-key quota shard: owns keys with ``hash(key) % S ==
    shard_id`` and their running admit counts (ST1-style mutable state — the
    reference's insert-if-absent seen set generalized to admit-while-below-n,
    `/root/reference/src/hash_dup_remover.hpp:130-138`).

    ``reserve`` is atomic per actor call, so the TOTAL admitted per key never
    exceeds n even under concurrent ingest batches (which rows win under
    concurrency > 1 is arrival-order-dependent, like the other streaming
    stages; the per-key admit count is exact regardless). The loop below is
    per UNIQUE key per batch (scalar int math, distinct keys << rows), not
    per row.
    """

    def __init__(self, n: int):
        self.n = n
        self.counts: dict = {}

    def reserve(self, keys, wanted) -> np.ndarray:
        granted = np.zeros(len(keys), dtype=np.int64)
        for j, k in enumerate(keys):
            c = self.counts.get(k, 0)
            room = self.n - c
            if room > 0:
                g = min(int(wanted[j]), room)
                self.counts[k] = c + g
                granted[j] = g
        return granted

    def snapshot(self):
        keys = list(self.counts.keys())
        return keys, np.array([self.counts[k] for k in keys], dtype=np.int64), self.n

    def restore(self, keys, counts: np.ndarray, n: int) -> int:
        self.n = int(n)
        self.counts = {k: int(c) for k, c in zip(keys, counts)}
        return len(self.counts)

    def save_part(self, path: str) -> dict:
        import pyarrow.parquet as pq

        keys, counts, n_cap = self.snapshot()
        t = pa.table({"key": pa.array(list(keys)), "count": pa.array(counts, pa.int64())})
        pq.write_table(t, path)
        return {"rows": t.num_rows, "n_cap": int(n_cap)}

    def size(self) -> int:
        return len(self.counts)


class StreamingQuota:
    """map_batches callable: admit a row only while its key's running count
    (across everything already ingested) is below ``n`` — the per-domain cap
    as an INGEST filter. Within a batch, earlier rows win (vectorized
    cumcount ranks against the shards' granted budgets)."""

    def __init__(self, shard_handles, n: int, key_col: str = "source"):
        self.shards = shard_handles
        self.n = n
        self.key_col = key_col

    def __call__(self, batch: pa.Table) -> pa.Table:
        nrows = batch.num_rows
        if nrows == 0:
            return batch
        keys = batch[self.key_col].to_numpy(zero_copy_only=False).astype(object)
        codes, uniques = pd.factorize(keys)
        # rank of each row within its key, in batch order (one stable argsort)
        order = np.argsort(codes, kind="stable")
        sc = codes[order]
        starts = np.r_[0, np.flatnonzero(sc[1:] != sc[:-1]) + 1]
        runlens = np.diff(np.r_[starts, len(sc)])
        pos_in_run = np.arange(len(sc)) - np.repeat(starts, runlens)
        ranks = np.empty(nrows, dtype=np.int64)
        ranks[order] = pos_in_run
        wanted = np.bincount(codes, minlength=len(uniques))
        S = len(self.shards)
        owner = (pd.util.hash_array(np.asarray(uniques, dtype=object)) % np.uint64(S)).astype(np.int64)
        granted = np.zeros(len(uniques), dtype=np.int64)
        futures, slots = [], []
        for s in range(S):
            rows = np.nonzero(owner == s)[0]
            if len(rows):
                futures.append(
                    self.shards[s].reserve.remote(
                        [uniques[i] for i in rows], wanted[rows]
                    )
                )
                slots.append(rows)
        for rows, g in zip(slots, ray.get(futures)):
            granted[rows] = g
        return batch.filter(pa.array(ranks < granted[codes]))


def make_quota_index(n: int, n_shards: int = 8):
    """Spin up the quota shard pool; reuse across incremental ingest runs."""
    return [QuotaShard.remote(n) for _ in range(n_shards)]


def streaming_cap(
    ds: ray.data.Dataset,
    n: int,
    key_col: str = "source",
    index=None,
    n_shards: int = 8,
    batch_size: int = 8192,
    concurrency=(1, 8),
):
    """Returns (kept_dataset, index): rows admitted while their key is below
    its quota. Feed later slices the same ``index`` to keep capping against
    everything already ingested (the streaming sibling of
    ``stages.quota.cap_per_key``)."""
    index = index if index is not None else make_quota_index(n, n_shards)
    kept = ds.map_batches(
        StreamingQuota,
        fn_constructor_kwargs={"shard_handles": index, "n": n, "key_col": key_col},
        batch_format="pyarrow",
        batch_size=batch_size,
        concurrency=concurrency,
    )
    return kept, index


# --------------------------------------------- index persistence (resume)

def _index_kind(index) -> str:
    name = index[0]._ray_actor_creation_function_descriptor.class_name
    for kind, cls in (("exact", "DedupIndexShard"), ("band", "BandIndexShard"), ("quota", "QuotaShard")):
        if cls in name:
            return kind
    raise ValueError(f"save_streaming_index: unknown shard class {name!r}")


def save_streaming_index(index, root: str, name: str) -> dict:
    """Persist a streaming index (exact / band / quota shard pool) under
    ``root/name`` as one parquet part per shard plus an atomic manifest —
    the same write-then-rename protocol as ``state.checkpoint`` (a crash
    mid-save leaves the previous snapshot intact). Each SHARD writes its
    own part (``save_part``): state never funnels through the driver, so
    snapshot bandwidth scales with the shard count (the path must be
    shared storage on multi-node — the same assumption every checkpoint
    makes). The actors keep running; the snapshot is the state AS OF the
    calls (quiesce ingest first for an exact cut, like any online
    checkpoint).

    Closes the round-3 gap that shard state died with the driver: a restart
    calls ``load_streaming_index`` and continues ingesting with exact
    admit/dedup invariants preserved.
    """
    import json
    import os
    import shutil

    from ..state.checkpoint import MANIFEST

    kind = _index_kind(index)
    out_dir = os.path.join(root, name)
    tmp_dir = out_dir + ".tmp"
    shutil.rmtree(tmp_dir, ignore_errors=True)
    os.makedirs(tmp_dir, exist_ok=True)
    parts = ray.get(
        [
            s.save_part.remote(os.path.join(tmp_dir, f"shard-{i:05d}.parquet"))
            for i, s in enumerate(index)
        ]
    )
    extra: dict = {}
    for p in parts:
        if "sig_width" in p:
            extra["sig_width"] = max(extra.get("sig_width", 0), p["sig_width"])
        if "max_bucket" in p:
            extra["max_bucket"] = p["max_bucket"]
        if "n_cap" in p:
            extra["n_cap"] = p["n_cap"]
    manifest = {
        "stage": name,
        "kind": kind,
        "n_shards": len(index),
        "rows": int(sum(p["rows"] for p in parts)),
        "complete": True,
        **extra,
    }
    with open(os.path.join(tmp_dir, MANIFEST), "w") as f:
        json.dump(manifest, f, indent=1)
    # crash-safe swap: the previous snapshot moves ASIDE (rename, atomic)
    # before the new one moves in, so no crash window leaves zero snapshots
    # on disk; load falls back to the .old dir if a crash lands between the
    # two renames. rmtree-before-rename would violate the docstring's
    # "previous snapshot intact" promise exactly when it matters.
    old_dir = out_dir + ".old"
    shutil.rmtree(old_dir, ignore_errors=True)
    if os.path.isdir(out_dir):
        os.rename(out_dir, old_dir)
    os.rename(tmp_dir, out_dir)
    shutil.rmtree(old_dir, ignore_errors=True)
    return manifest


def load_streaming_index(root: str, name: str):
    """Rebuild a shard pool from ``save_streaming_index`` output. Returns
    fresh actors with the snapshotted state (same shard count — identities
    were partitioned by ``% n_shards``, so the layout must match)."""
    import json
    import os

    import pyarrow.parquet as pq

    from ..state.checkpoint import MANIFEST

    out_dir = os.path.join(root, name)
    if not os.path.isdir(out_dir) and os.path.isdir(out_dir + ".old"):
        # a crash between save's two renames left only the aside copy
        os.rename(out_dir + ".old", out_dir)
    with open(os.path.join(out_dir, MANIFEST)) as f:
        m = json.load(f)
    if not m.get("complete"):
        raise ValueError(f"streaming index snapshot at {out_dir} is incomplete")
    kind, n_shards = m["kind"], m["n_shards"]
    if kind == "exact":
        index = make_index(n_shards)
    elif kind == "band":
        # restore the configured bucket bound too — defaulting it would
        # silently change admit behavior for post-restore inserts
        index = make_band_index(n_shards, max_bucket=m.get("max_bucket", 64))
    else:
        index = make_quota_index(m["n_cap"], n_shards)
    restores = []
    for i, shard in enumerate(index):
        t = pq.read_table(os.path.join(out_dir, f"shard-{i:05d}.parquet"))
        if kind == "exact":
            restores.append(
                shard.restore.remote(t["k1"].to_numpy(), t["k2"].to_numpy())
            )
        elif kind == "band":
            keys = t["band_key"].to_numpy()
            poss = t["pos"].to_numpy()
            ids = t["id"].to_pylist()
            flat = t["sig"].combine_chunks().flatten().to_numpy()
            K = m.get("sig_width") or 1
            sig_mat = flat.reshape(len(keys), K) if len(keys) else np.empty((0, 0), np.uint64)
            restores.append(shard.restore.remote(keys, poss, ids, sig_mat))
        else:
            restores.append(
                shard.restore.remote(t["key"].to_pylist(), t["count"].to_numpy(), m["n_cap"])
            )
    ray.get(restores)
    return index
