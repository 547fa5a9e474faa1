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
    """Owns the slice {identity : k1 % n_shards == shard_id} of the seen-set."""

    def __init__(self):
        self.seen: set = set()

    def check_and_add(self, packed: np.ndarray) -> np.ndarray:
        """uint64[n,2] identities -> bool[n] mask of first-seen rows.
        Mutates the index (idempotent per identity)."""
        out = np.empty(len(packed), dtype=bool)
        seen = self.seen
        for i, key in enumerate(map(tuple, packed.tolist())):
            if key in seen:
                out[i] = False
            else:
                seen.add(key)
                out[i] = True
        return out

    def size(self) -> int:
        return len(self.seen)


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
