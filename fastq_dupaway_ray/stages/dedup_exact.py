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

Shuffle shape at 100 TB: the heavy payload NEVER enters the shuffle. A slim
projection (128-bit identity hash + order key) is shuffled to decide which
rows LOSE keep-first; the drop set — the duplicates, the small side by
definition — is broadcast and the full payload streams through one filter
pass (same pattern as stages.representative). When the drop set exceeds the
broadcast budget, the classic payload-shuffle path takes over (its local
combiner still pre-drops within-batch losers first).

Identity: two independent 64-bit hashes + per-column lengths (~2^-128
collision odds per pair — at 10^12 rows the expected collision count is
~1e-14; the reference's packed-sequence equality is exact, this is the
distributed-size tradeoff, documented).
"""

from __future__ import annotations

import numpy as np
import pandas as pd
import pyarrow as pa
import ray
import ray.data

from ..functions.hashing import combine_hash64, hash64

DEFAULT_ORDER = ("warc_ts", "url")
_SALT2 = np.uint64(0xD6E8FEB86659FD93)


def _value_lengths(vals: np.ndarray) -> np.ndarray:
    """Per-value length fold (setRecord's (packed, len) identity,
    /root/reference/src/hash_dup_remover.hpp:19-41); zero for unsized types
    (ints/floats — their hash alone carries the identity)."""
    try:
        return np.fromiter(
            (len(v) if v is not None else 0 for v in vals), dtype=np.uint64, count=len(vals)
        )
    except TypeError:
        return np.zeros(len(vals), dtype=np.uint64)


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
        lens = _value_lengths(vals)
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


def _identity128(batch: pa.Table, key_cols) -> tuple:
    """Two independent 64-bit identity hashes + folded lengths.

    k2 folds a SECOND SipHash of the content (independent key), not an
    arithmetic remix of k1's inputs — a remix collapses collision resistance
    to 64 bits (inputs colliding on the first hash collide on both), which at
    10^12 docs yields thousands of expected false merges."""
    parts, parts2 = [], []
    for col in key_cols:
        arr = batch[col]
        if isinstance(arr, pa.ChunkedArray):
            arr = arr.combine_chunks()
        vals = arr.to_numpy(zero_copy_only=False).astype(object)
        lens = _value_lengths(vals)
        parts.extend((hash64(vals), lens))
        parts2.extend((hash64(vals, alt_key=True), lens))
    k1 = combine_hash64(*parts)
    k2 = combine_hash64(*parts2, np.full(len(k1), _SALT2, dtype=np.uint64))
    return k1, k2


def dedup_exact(
    ds: ray.data.Dataset,
    key_cols=("text",),
    order_cols=DEFAULT_ORDER,
    num_buckets: int = 64,
    drop_broadcast_budget: int = 5_000_000,
    paranoid: bool = False,
    counters: dict | None = None,
    exchange: str = "tasks",
) -> ray.data.Dataset:
    """Distributed exact keep-first dedup; returns the kept rows (lazy).

    ``key_cols`` with several entries reproduces paired-mode AND-semantics.
    ``order_cols`` must uniquely identify a row (the reference's arrival key
    is unique by construction — file position).

    Default path: slim identity shuffle -> drop-set broadcast -> payload
    filter pass (see module docstring). ``num_buckets`` is the shuffle
    width — size it ~2-4x total cores; skew is no concern because bucketing
    is by uniform hash. Falls back to the payload-shuffle path when the
    drop set exceeds ``drop_broadcast_budget`` rows.

    ``paranoid=True`` selects the payload-shuffle path unconditionally: it
    compares ACTUAL key values inside each hash bucket, giving the
    reference's byte-exact equality (/root/reference/src/hash_dup_remover.cpp
    :10-33) with zero hash-collision exposure, at the cost of shuffling the
    payload once.
    """
    key_cols = list(key_cols)
    order_cols = list(order_cols)
    if paranoid:
        return _dedup_exact_shuffle(ds, key_cols, order_cols, num_buckets)

    def slim(batch: pa.Table) -> pa.Table:
        k1, k2 = _identity128(batch, key_cols)
        cols = {c: batch[c] for c in order_cols}
        cols["_k1"] = pa.array(k1, pa.uint64())
        cols["_k2"] = pa.array(k2, pa.uint64())
        if exchange != "tasks":  # the task exchange routes on _k1 directly
            cols["_bucket"] = pa.array(
                (k1 % np.uint64(num_buckets)).astype(np.int64), pa.int64()
            )
        return pa.table(cols)

    # NOTE: no within-batch combiner here. A combiner that removes local
    # losers before the shuffle silently LOSES them — they never enter the
    # drop set and survive dedup (caught by the hypothesis conformance
    # tests on corpora with same-batch duplicates). Every slim identity row
    # (~40 bytes) must reach the shuffle; the payload still never moves.

    def _losers_frame(df: pd.DataFrame) -> pd.DataFrame:
        """Losing rows as (order cols, _k1, _k2, _ambig).

        The drop entries carry the CONTENT key pair so the broadcast filter
        can distinguish a loser from an unrelated row that merely shares its
        order tuple (same (warc_ts, url), different text — possible when
        order_cols are not globally unique). ``_ambig`` marks a loser whose
        FULL (content, order) tuple ties its group winner's — such rows are
        indistinguishable by any slim key, so the caller must take the
        payload-shuffle limb (which compares actual values and keeps exactly
        one)."""
        df = df.sort_values(order_cols, kind="mergesort")
        lose = df.duplicated(subset=["_k1", "_k2"], keep="first")
        keep_cols = [*order_cols, "_k1", "_k2"]
        out = df.loc[lose, keep_cols].copy()
        winners = df.loc[~lose, keep_cols]
        widx = pd.MultiIndex.from_arrays([winners[c] for c in keep_cols])
        lidx = pd.MultiIndex.from_arrays([out[c] for c in keep_cols])
        out["_ambig"] = lidx.isin(widx)
        return out

    def bucket_drops(df: pd.DataFrame) -> pd.DataFrame:
        if len(df) == 0 or "_k1" not in df.columns:
            # map_groups may deliver an empty schema-less frame on tiny inputs
            return pd.DataFrame(
                {
                    **{c: [] for c in order_cols},
                    "_k1": pd.Series([], dtype=np.uint64),
                    "_k2": pd.Series([], dtype=np.uint64),
                    "_ambig": pd.Series([], dtype=bool),
                }
            )
        return _losers_frame(df)

    slim_rows = ds.map_batches(slim, batch_format="pyarrow")
    if exchange == "tasks":
        from .minhash import _hash_exchange_tasks

        def bucket_drops_tab(t: pa.Table | None) -> pa.Table:
            # zero-row reduces still carry the real schema (slice of a block)
            if t is None:
                return pa.table(
                    {
                        **{c: pa.array([], pa.string()) for c in order_cols},
                        "_k1": pa.array([], pa.uint64()),
                        "_k2": pa.array([], pa.uint64()),
                        "_ambig": pa.array([], pa.bool_()),
                    }
                )
            proj_schema = t.select([*order_cols, "_k1", "_k2"]).schema.append(
                pa.field("_ambig", pa.bool_())
            )
            if t.num_rows == 0:
                return proj_schema.empty_table()
            out = _losers_frame(t.select([*order_cols, "_k1", "_k2"]).to_pandas())
            return pa.Table.from_pandas(out, preserve_index=False, schema=proj_schema)

        drops = _hash_exchange_tasks(slim_rows, "_k1", num_buckets, bucket_drops_tab)
    else:
        drops = (
            slim_rows.groupby("_bucket")
            .map_groups(bucket_drops, batch_format="pandas")
            .materialize()
        )
    n_drops = drops.count()
    if n_drops > drop_broadcast_budget:
        return _dedup_exact_shuffle(ds, key_cols, order_cols, num_buckets)

    from .minhash import _fetch_cached

    ddf = drops.to_pandas()
    if len(ddf) == 0:
        if counters is not None:
            counters["drops"] = 0
        return ds  # nothing to drop (an empty Dataset also loses its schema)
    if bool(ddf["_ambig"].any()):
        # a loser fully ties its winner (same content AND same order tuple):
        # no slim key can name the loser alone — compare actual values
        return _dedup_exact_shuffle(ds, key_cols, order_cols, num_buckets)
    if counters is not None:
        # exact duplicate count, known without consuming the filtered payload
        # (callers use it to avoid a pure-count pass over the corpus); exact
        # because each drop entry names exactly one row — order-tuple
        # look-alikes with different content fail the stage-2 key check, and
        # full ties took the shuffle limb above
        counters["drops"] = n_drops
    drop_ref = ray.put(
        pa.table(
            {
                **{c: pa.array(ddf[c]) for c in order_cols},
                "_k1": pa.array(ddf["_k1"].to_numpy(), pa.uint64()),
                "_k2": pa.array(ddf["_k2"].to_numpy(), pa.uint64()),
            }
        )
    )

    def keep_filter(df: pd.DataFrame) -> pd.DataFrame:
        # two-stage membership: a cheap order-tuple hit pass over every row,
        # then the content identity recomputed ONLY for the hits (~n_drops
        # rows corpus-wide) and confirmed against the drop entry's key pair
        tuples, full = _fetch_cached(
            drop_ref,
            lambda t: (
                set(zip(*(t[c].to_pylist() for c in order_cols))),
                set(
                    zip(
                        *(t[c].to_pylist() for c in order_cols),
                        t["_k1"].to_numpy(),
                        t["_k2"].to_numpy(),
                    )
                ),
            ),
        )
        idx = pd.MultiIndex.from_arrays([df[c] for c in order_cols])
        hit = idx.isin(tuples)
        if not hit.any():
            return df
        sub = df.loc[hit]
        k1, k2 = _identity128(
            pa.Table.from_pandas(sub[list(key_cols)], preserve_index=False), key_cols
        )
        confirmed = np.fromiter(
            (
                tup in full
                for tup in zip(*(sub[c] for c in order_cols), k1, k2)
            ),
            dtype=bool,
            count=len(sub),
        )
        mask = np.zeros(len(df), dtype=bool)
        mask[np.nonzero(hit)[0][confirmed]] = True
        return df[~mask]

    return ds.map_batches(keep_filter, batch_format="pandas")


def exact_drop_ids(
    ds: ray.data.Dataset,
    key_cols=("text",),
    order_cols=DEFAULT_ORDER,
    id_col: str = "url",
    num_buckets: int | None = None,
    counters: dict | None = None,
) -> ray.data.Dataset:
    """Slim exact keep-first dedup that returns the DROPPED rows' identity.

    The fused-flagship building block: one pass over the (pruned) input
    computes the 128-bit content identity, a task hash-exchange co-locates
    equal identities, and each bucket emits the rows that LOSE keep-first as
    (id, order cols, _k1, _k2, _ambig). The payload never moves; the caller
    broadcasts the drop set and streams whatever filter passes it needs.
    The content key pair rides along so the filter can confirm a hit — an
    id that repeats in the corpus (same url recrawled) must not have its
    keep-first WINNER row dropped by a bare id-membership test. ``_ambig``
    marks a loser whose full (content, id, order) tuple ties its group
    winner's — no slim key can name that loser alone, and the caller must
    fall back to a value-comparing dedup (``dedup_exact``'s shuffle limb).
    ``counters`` receives ``n_input`` (rows seen — the valid-count for
    free) when provided."""
    import pyarrow.compute as pc

    from .minhash import _default_shuffle_buckets, _hash_exchange_tasks

    key_cols = list(key_cols)
    order_cols = list(order_cols)
    B = num_buckets or _default_shuffle_buckets()
    slim_cols = list(dict.fromkeys([id_col, *order_cols]))

    def slim(batch: pa.Table) -> pa.Table:
        k1, k2 = _identity128(batch, key_cols)
        cols = {c: batch[c] for c in slim_cols}
        cols["_k1"] = pa.array(k1, pa.uint64())
        cols["_k2"] = pa.array(k2, pa.uint64())
        return pa.table(cols)

    slimtab = ds.map_batches(slim, batch_format="pyarrow").materialize()
    if counters is not None:
        counters["n_input"] = slimtab.count()

    def bucket_drops(t: pa.Table | None) -> pa.Table:
        if t is not None and t.num_rows == 0:
            # zero-row slice of a real block: keep ITS column types — a
            # fabricated all-string empty block would give the drops dataset
            # mixed schemas (string vs timestamp order cols)
            return t.select([*slim_cols, "_k1", "_k2"]).append_column(
                "_ambig", pa.array([], pa.bool_())
            )
        if t is None:
            empty_cols = {c: pa.array([], pa.string()) for c in slim_cols}
            empty_cols["_k1"] = pa.array([], pa.uint64())
            empty_cols["_k2"] = pa.array([], pa.uint64())
            empty_cols["_ambig"] = pa.array([], pa.bool_())
            return pa.table(empty_cols)
        sort_keys = [("_k1", "ascending"), ("_k2", "ascending")] + [
            (c, "ascending") for c in order_cols
        ]
        t = t.take(pc.sort_indices(t, sort_keys=sort_keys))
        k1 = t["_k1"].to_numpy()
        k2 = t["_k2"].to_numpy()
        lose = np.empty(len(k1), dtype=bool)
        lose[0] = False
        lose[1:] = (k1[1:] == k1[:-1]) & (k2[1:] == k2[:-1])
        # ambiguous: a loser whose (id, order) tuple ties its run's WINNER —
        # with the run sorted ascending by order cols, the winner holds the
        # smallest tuple, so any such tie sits immediately after the winner.
        # A loser tying another LOSER is fine: the tuple then names only
        # losing rows and membership-dropping all of them is exact.
        same_tuple = np.ones(len(k1), dtype=bool)
        for c in dict.fromkeys([id_col, *order_cols]):
            v = t[c].to_numpy(zero_copy_only=False)
            same_tuple[1:] &= v[1:] == v[:-1]
            same_tuple[0] = False
        prev_lose = np.concatenate([[False], lose[:-1]])
        ambig = lose & same_tuple & ~prev_lose
        out = t.select([*slim_cols, "_k1", "_k2"]).filter(pa.array(lose))
        return out.append_column("_ambig", pa.array(ambig[lose], pa.bool_()))

    return _hash_exchange_tasks(slimtab, "_k1", B, bucket_drops)


def _dedup_exact_shuffle(
    ds: ray.data.Dataset, key_cols, order_cols, num_buckets: int
) -> ray.data.Dataset:
    """Payload-shuffle fallback (drop set too large to broadcast). The local
    combiner pre-drops within-batch losers so their payload never shuffles;
    keep-first compares actual key values (collision-exact)."""

    def prepare(batch: pa.Table) -> pa.Table:
        return add_identity_columns(batch, key_cols, num_buckets=num_buckets)

    def combine(df: pd.DataFrame) -> pd.DataFrame:
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
