"""SimHash + Hamming-ball bucketing (the reference's --distance fuzzy mode at scale).

Mirrors tail-hamming dedup (/root/reference/src/comparator.cpp:76-91, default
d=2 /root/reference/src/main.cpp:34): two documents are near-duplicates when
their 64-bit SimHash signatures differ in <= d bits. Candidate generation uses
the pigeonhole principle exactly like the reference's same-length requirement
narrows comparisons: split the signature into d+1 chunks — any pair within
Hamming distance d agrees on at least one chunk — and groupby the chunk key.

Verification is exact (popcount of XOR), so the chunk bucketing only affects
recall of the *candidate* stage, never precision — recall is 100% for pairs
within distance d by the pigeonhole argument.
"""

from __future__ import annotations

import numpy as np
import pandas as pd
import pyarrow as pa
import ray.data

from ..functions.hashing import hamming64
from ..functions.sketches import simhash64, simhash_chunks

SIMHASH_COL = "simhash64"


class SimHashSigner:
    """Actor-pool callable: text -> 64-bit SimHash column."""

    def __init__(self, text_col: str = "text", token_ngram: int = 2):
        self.text_col = text_col
        self.token_ngram = token_ngram

    def __call__(self, batch: pa.Table) -> pa.Table:
        texts = batch[self.text_col].to_pylist()
        sigs = np.fromiter(
            (simhash64(t or "", self.token_ngram) for t in texts), dtype=np.uint64, count=len(texts)
        )
        return batch.append_column(SIMHASH_COL, pa.array(sigs, pa.uint64()))


def emit_chunk_keys(batch: pa.Table, distance: int, id_col: str = "url", order_cols=("warc_ts",)) -> pa.Table:
    """Explode each signed row into d+1 (chunk_key, id, sig) rows."""
    sig = np.asarray(batch[SIMHASH_COL].to_numpy(zero_copy_only=False), dtype=np.uint64)
    keys = simhash_chunks(sig, distance)  # (n, d+1)
    n, c = keys.shape
    idx = np.repeat(np.arange(n, dtype=np.int64), c)
    take = pa.array(idx)
    cols = {
        "chunk_key": pa.array(keys.ravel(), pa.uint64()),
        id_col: _take(batch[id_col], take),
        SIMHASH_COL: pa.array(sig[idx], pa.uint64()),
    }
    for oc in order_cols:
        if oc != id_col:
            cols[oc] = _take(batch[oc], take)
    return pa.table(cols)


def _take(arr, take):
    if isinstance(arr, pa.ChunkedArray):
        arr = arr.combine_chunks()
    return arr.take(take)


def simhash_candidate_edges(
    pages: ray.data.Dataset,
    distance: int = 3,
    id_col: str = "url",
    text_col: str = "text",
    order_cols=("warc_ts", "url"),
    token_ngram: int = 2,
    max_bucket: int = 512,
    signer_concurrency=None,
) -> ray.data.Dataset:
    """pages -> verified edges (a, b, hamming) with hamming <= distance.

    Verification inside the chunk bucket compares every member against the
    bucket head (first by order) — vectorized popcount, O(n) per bucket —
    plus a dense all-pairs pass for small buckets so non-head pairs are kept
    when the head itself is not a near-dup of them.
    """
    order_cols = [c for c in order_cols]
    kwargs = dict(
        batch_format="pyarrow",
        batch_size=4096,
        concurrency=signer_concurrency if signer_concurrency is not None else (1, 8),
    )
    slim = pages.select_columns(sorted(set([id_col, text_col, *order_cols])))
    signed = slim.map_batches(
        SimHashSigner, fn_constructor_kwargs={"text_col": text_col, "token_ngram": token_ngram}, **kwargs
    ).drop_columns([text_col])
    chunk_rows = signed.map_batches(
        lambda t: emit_chunk_keys(t, distance, id_col=id_col, order_cols=order_cols),
        batch_format="pyarrow",
    )

    def per_bucket(df: pd.DataFrame) -> pd.DataFrame:
        if len(df) < 2:
            return pd.DataFrame({"a": [], "b": [], "hamming": pd.Series([], dtype=np.int64)})
        df = df.sort_values(order_cols, kind="mergesort").head(max_bucket)
        # one id may appear once per chunk bucket only; dedup defensively
        df = df.drop_duplicates(subset=[id_col])
        ids = df[id_col].to_numpy()
        sigs = df[SIMHASH_COL].to_numpy().astype(np.uint64)
        n = len(ids)
        if n < 2:
            return pd.DataFrame({"a": [], "b": [], "hamming": pd.Series([], dtype=np.int64)})
        if n <= 64:
            # dense all-pairs verify (vectorized XOR+popcount over the cross)
            ai, bi = np.triu_indices(n, k=1)
            d = hamming64(sigs[ai], sigs[bi])
            keep = d <= distance
            return pd.DataFrame({"a": ids[ai[keep]], "b": ids[bi[keep]], "hamming": d[keep].astype(np.int64)})
        # large bucket: star verify against the head (linear)
        d = hamming64(sigs[1:], np.broadcast_to(sigs[0], (n - 1,)).copy())
        keep = d <= distance
        return pd.DataFrame(
            {"a": np.full(int(keep.sum()), ids[0], dtype=object), "b": ids[1:][keep], "hamming": d[keep].astype(np.int64)}
        )

    edges = chunk_rows.groupby("chunk_key").map_groups(per_bucket, batch_format="pandas")
    return dedup_edge_list(edges)


def dedup_edge_list(edges: ray.data.Dataset, num_buckets: int = 32) -> ray.data.Dataset:
    """Drop duplicate (a, b) edges (the same pair surfaces from several
    chunks/bands) with a bucketed vectorized pass — not per-pair map_groups."""
    import pandas as pd

    def bucketize(df: pd.DataFrame) -> pd.DataFrame:
        df = df.copy()
        df["_ebucket"] = pd.util.hash_array(df["a"].to_numpy(dtype=object)) % num_buckets
        return df

    def drop(df: pd.DataFrame) -> pd.DataFrame:
        return df.drop_duplicates(subset=["a", "b"]).drop(columns=["_ebucket"])

    return edges.map_batches(bucketize, batch_format="pandas").groupby("_ebucket").map_groups(
        drop, batch_format="pandas"
    )
