"""Exact keep-first dedup (reference --fast mode, SURVEY.md A1/A2).

Reference semantics (/root/reference/src/hash_dup_remover.hpp:105-148): scan
records in file order, keep the first occurrence of each (length, content)
identity, drop the rest; paired mode ANDs both mates into one composite key
(/root/reference/src/hash_dup_remover.cpp:26-33).

Ray-Data-first redesign of the global in-memory seen-set (ST1): there is no
shared mutable state. Instead:

1. a stateless ``map_batches`` computes a 64-bit composite content hash and a
   shuffle bucket, then **pre-deduplicates inside the batch** (combiner): rows
   that lose locally can never win globally, so their (possibly html-heavy)
   payload never enters the shuffle;
2. ``groupby(bucket)`` hash-partitions rows so equal keys co-locate — the
   number of buckets is the shuffle width, not the number of distinct keys;
3. one vectorized pandas pass per bucket keeps the first row per identity in
   arrival order (order key = (warc_ts, url) — "first in file order").

Hash collisions cannot corrupt results: the hash only routes rows to buckets;
the keep-first decision inside a bucket compares the actual key-column values.
"""

from __future__ import annotations

import numpy as np
import pandas as pd
import pyarrow as pa
import ray.data

from ..functions.hashing import combine_hash64, hash64

DEFAULT_ORDER = ("warc_ts", "url")


def add_identity_columns(
    batch: pa.Table, key_cols=("text",), hash_col: str = "_key64", bucket_col: str = "_bucket", num_buckets: int = 64
) -> pa.Table:
    """Append the composite identity hash + shuffle bucket (vectorized)."""
    hashes = []
    for col in key_cols:
        arr = batch[col]
        if isinstance(arr, pa.ChunkedArray):
            arr = arr.combine_chunks()
        vals = arr.to_numpy(zero_copy_only=False).astype(object)
        h = hash64(vals)
        # fold the length in explicitly, mirroring setRecord's (packed, len)
        # identity (/root/reference/src/hash_dup_remover.hpp:19-41)
        lens = np.fromiter((len(v) if v is not None else 0 for v in vals), dtype=np.uint64, count=len(vals))
        hashes.append(h)
        hashes.append(lens)
    key = combine_hash64(*hashes)
    bucket = (key % np.uint64(num_buckets)).astype(np.int64)
    return batch.append_column(hash_col, pa.array(key, pa.uint64())).append_column(
        bucket_col, pa.array(bucket, pa.int64())
    )


def _local_keep_first(df: pd.DataFrame, key_cols, order_cols) -> pd.DataFrame:
    """Vectorized within-partition keep-first by value equality."""
    df = df.sort_values(list(order_cols), kind="mergesort")
    return df.drop_duplicates(subset=list(key_cols), keep="first")


def dedup_exact(
    ds: ray.data.Dataset,
    key_cols=("text",),
    order_cols=DEFAULT_ORDER,
    num_buckets: int = 64,
) -> ray.data.Dataset:
    """Distributed exact keep-first dedup; returns the kept rows (lazy).

    ``key_cols`` with several entries reproduces paired-mode AND-semantics.
    ``num_buckets`` is the shuffle width — size it ~2-4x total cores; at
    100 TB raise it so each bucket fits a worker's heap (rows per bucket
    ~ N/num_buckets; skew is no concern because bucketing is by uniform hash).
    """
    key_cols = list(key_cols)
    order_cols = list(order_cols)

    def prepare(batch: pa.Table) -> pa.Table:
        return add_identity_columns(batch, key_cols, num_buckets=num_buckets)

    def combine(df: pd.DataFrame) -> pd.DataFrame:
        # local combiner: drop rows that already lose within this batch
        return _local_keep_first(df, key_cols, order_cols)

    def per_bucket(df: pd.DataFrame) -> pd.DataFrame:
        out = _local_keep_first(df, key_cols, order_cols)
        return out.drop(columns=["_key64", "_bucket"])

    prepared = ds.map_batches(prepare, batch_format="pyarrow").map_batches(
        combine, batch_format="pandas"
    )
    return prepared.groupby("_bucket").map_groups(per_bucket, batch_format="pandas")


def dedup_exact_clusters(
    ds: ray.data.Dataset,
    key_cols=("text",),
    id_col: str = "url",
    order_cols=DEFAULT_ORDER,
    num_buckets: int = 64,
) -> ray.data.Dataset:
    """Duplicate-cluster side output for exact dedup (SURVEY.md A6/S9).

    Mirrors the --write-clusters format (/root/reference/src/file_utils.cpp:98-112):
    every kept row heads a cluster; members are the dropped duplicates. Emitted
    as a table (cluster_id = head id, member = row id, is_representative).

    Only the slim (key hash, id, order) projection is shuffled — the payload
    stays behind.
    """
    key_cols = list(key_cols)
    order_cols = list(order_cols)
    slim_cols = sorted(set([id_col, *order_cols]))

    def prepare(batch: pa.Table) -> pa.Table:
        t = add_identity_columns(batch, key_cols, num_buckets=num_buckets)
        return t.select(slim_cols + ["_key64", "_bucket"])

    def per_bucket(df: pd.DataFrame) -> pd.DataFrame:
        df = df.sort_values(order_cols, kind="mergesort")
        heads = df.groupby("_key64", sort=False)[id_col].transform("first")
        return pd.DataFrame(
            {
                "cluster_id": heads.to_numpy(),
                "member": df[id_col].to_numpy(),
                "is_representative": (heads == df[id_col]).to_numpy(),
            }
        )

    prepared = ds.map_batches(prepare, batch_format="pyarrow")
    return prepared.groupby("_bucket").map_groups(per_bucket, batch_format="pandas")
