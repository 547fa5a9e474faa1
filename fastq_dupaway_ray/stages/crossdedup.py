"""Cross-corpus dedup: drop corpus rows that duplicate a REFERENCE corpus.

The training-data operation between exact dedup and eval decontamination:
when a new crawl (corpus B) is added to an already-curated dataset (reference
A), every B document that duplicates — exactly or nearly — an A document must
be dropped, while B-internal duplicates are left alone (that is
stages.dedup_exact / the flagship's job, run separately). The reference
engine's closest analogue is the unordered-join membership semantics
(/root/reference/src/hash_dup_remover.hpp:257-347): a cross-file pass where
one file's records are admitted or dropped based on the other file's
contents; here the predicate is content identity / near-identity instead of
an id match.

Two modes:

* ``cross_dedup_exact`` — B rows whose 128-bit content identity (same
  construction as stages.dedup_exact) appears in A are dropped. Shape: slim
  identity rows from BOTH sides (side-tagged) through one hash exchange;
  each bucket intersects the two sides and emits the matching identities —
  the drop set, bounded by the CONTAMINATION size, small by definition in
  the realistic regime — which is broadcast READY and applied in one
  streaming filter over B (payload never shuffles). Above the broadcast
  budget the payload-exchange limb co-shuffles B's rows with A's slim
  identities and filters per bucket (payload moves once).

* ``cross_dedup_minhash`` — near-duplicates via the flagship MinHash/LSH
  machinery: A ∪ B are side-tag-prefixed, signed and banded together,
  verified edges feed connected components, and every B member of a cluster
  that contains at least one A member is dropped (cluster-transitive, the
  same judgment the within-corpus pipeline applies when it keeps one
  representative per cluster). B-only clusters are untouched. The label
  pass is one slim exchange on the cluster label; the resulting B drop-id
  set is broadcast (budget-gated with a payload-exchange fallback).
"""

from __future__ import annotations

import numpy as np
import pyarrow as pa
import pyarrow.compute as pc
import ray
import ray.data

from .dedup_exact import _identity128


def _slim_identity(ds: ray.data.Dataset, key_cols, side: int) -> ray.data.Dataset:
    def slim(batch: pa.Table) -> pa.Table:
        k1, k2 = _identity128(batch, key_cols)
        return pa.table(
            {
                "_k1": pa.array(k1, pa.uint64()),
                "_k2": pa.array(k2, pa.uint64()),
                "_side": pa.array(np.full(len(k1), side, dtype=np.int8), pa.int8()),
            }
        )

    return ds.map_batches(slim, batch_format="pyarrow")


def cross_dedup_exact(
    corpus: ray.data.Dataset,
    reference: ray.data.Dataset,
    key_cols=("text",),
    num_buckets: int = 64,
    drop_broadcast_budget: int = 5_000_000,
    counters: dict | None = None,
) -> ray.data.Dataset:
    """Drop every ``corpus`` row whose content identity appears in
    ``reference``; returns the filtered corpus (lazy). ALL matching corpus
    rows drop (membership, not keep-first) — corpus-internal duplicates of
    non-contaminated content ride through untouched.
    """
    key_cols = list(key_cols)
    from .minhash import _fetch_cached, _hash_exchange_tasks

    slim = _slim_identity(reference, key_cols, 0).union(
        _slim_identity(corpus, key_cols, 1)
    )

    def bucket_hits(t: pa.Table | None) -> pa.Table:
        empty = pa.table(
            {"_k1": pa.array([], pa.uint64()), "_k2": pa.array([], pa.uint64())}
        )
        if t is None or t.num_rows == 0:
            return empty
        side = t["_side"].to_numpy()
        k1 = t["_k1"].to_numpy()
        k2 = t["_k2"].to_numpy()
        ref = side == 0
        if not ref.any() or ref.all():
            return empty
        # distinct contaminated identities: corpus pairs ∩ reference pairs
        r1, r2 = k1[ref], k2[ref]
        order = np.lexsort((r2, r1))
        r1, r2 = r1[order], r2[order]
        from .minhash import _pair_lookup_pos

        q1, q2 = k1[~ref], k2[~ref]
        _, found = _pair_lookup_pos(r1, r2, q1, q2)
        if not found.any():
            return empty
        h1, h2 = q1[found], q2[found]
        u = np.unique(np.stack([h1, h2], axis=1), axis=0)
        return pa.table(
            {"_k1": pa.array(u[:, 0], pa.uint64()), "_k2": pa.array(u[:, 1], pa.uint64())}
        )

    drops = _hash_exchange_tasks(slim, "_k1", num_buckets, bucket_hits)
    n_drops = drops.count()
    if counters is not None:
        counters["contaminated_identities"] = n_drops
    if n_drops == 0:
        return corpus
    if n_drops > drop_broadcast_budget:
        return _payload_exchange_filter(
            corpus, drops, lambda b: _identity128(b, key_cols), num_buckets
        )

    ddf = drops.to_pandas()
    order = np.lexsort((ddf["_k2"].to_numpy(), ddf["_k1"].to_numpy()))
    drop_ref = ray.put(
        pa.table(
            {
                "_k1": pa.array(ddf["_k1"].to_numpy()[order], pa.uint64()),
                "_k2": pa.array(ddf["_k2"].to_numpy()[order], pa.uint64()),
            }
        )
    )

    def keep(batch: pa.Table) -> pa.Table:
        from .minhash import _pair_lookup_pos

        k1, k2 = _identity128(batch, key_cols)
        idx = _fetch_cached(
            drop_ref, lambda t: (t["_k1"].to_numpy(), t["_k2"].to_numpy())
        )
        _, found = _pair_lookup_pos(idx[0], idx[1], k1, k2)
        return batch.filter(pa.array(~found))

    return corpus.map_batches(keep, batch_format="pyarrow")


def _payload_exchange_filter(
    corpus: ray.data.Dataset, drops: ray.data.Dataset, key_fn, num_buckets: int
) -> ray.data.Dataset:
    """Above-budget limb shared by both modes: corpus payload co-shuffled
    with the drop keys on _k1; each bucket filters locally (payload moves
    once). ``key_fn(batch) -> (k1, k2)`` derives the 128-bit row key —
    content identity in exact mode, id-hash pair in near mode. ``drops``
    must carry (_k1, _k2)."""
    from .minhash import _hash_exchange_tasks, _pair_lookup_pos

    def tag(batch: pa.Table) -> pa.Table:
        k1, k2 = key_fn(batch)
        return batch.append_column("_k1", pa.array(k1, pa.uint64())).append_column(
            "_k2", pa.array(k2, pa.uint64())
        ).append_column("_side", pa.array(np.ones(len(k1), dtype=np.int8), pa.int8()))

    payload_cols = corpus.schema().names
    # the exchange reduce concatenates blocks, so both union sides must match
    # schemas exactly — drop rows are padded with typed nulls below.
    # Dataset.schema() on the tagged side peeks at ONE block (our own Arrow
    # map fn, so real pyarrow types) without materializing the payload — the
    # exchange downstream is the single full pass over the corpus
    tagged = corpus.map_batches(tag, batch_format="pyarrow")
    ts = tagged.schema()
    full_schema = pa.schema(list(zip(ts.names, ts.types)))

    def tag_drop(t: pa.Table) -> pa.Table:
        cols = {}
        for f in full_schema:
            if f.name == "_k1":
                cols[f.name] = t["_k1"]
            elif f.name == "_k2":
                cols[f.name] = t["_k2"]
            elif f.name == "_side":
                cols[f.name] = pa.array(np.zeros(t.num_rows, dtype=np.int8), pa.int8())
            else:
                cols[f.name] = pa.nulls(t.num_rows, type=f.type)
        return pa.table(cols)

    both = drops.map_batches(tag_drop, batch_format="pyarrow").union(tagged)

    def bucket_filter(t: pa.Table | None) -> pa.Table:
        if t is None:
            return pa.table({})
        if t.num_rows == 0:
            return t.select(payload_cols)
        side = t["_side"].to_numpy()
        rows = t.filter(pa.array(side == 1))
        if rows.num_rows == 0:
            return rows.select(payload_cols)
        d = t.filter(pa.array(side == 0))
        d1, d2 = d["_k1"].to_numpy(), d["_k2"].to_numpy()
        order = np.lexsort((d2, d1))
        _, found = _pair_lookup_pos(
            d1[order], d2[order], rows["_k1"].to_numpy(), rows["_k2"].to_numpy()
        )
        return rows.filter(pa.array(~found)).select(payload_cols)

    return _hash_exchange_tasks(both, "_k1", num_buckets, bucket_filter)


def _tag_side(ds: ray.data.Dataset, prefix: str, id_col: str, text_col: str) -> ray.data.Dataset:
    def fn(batch: pa.Table) -> pa.Table:
        ids = pc.cast(batch[id_col], pa.string())
        tagged = pc.binary_join_element_wise(
            pa.array([prefix] * batch.num_rows), ids.combine_chunks(), ""
        )
        return pa.table({id_col: tagged, text_col: batch[text_col]})

    return ds.select_columns([id_col, text_col]).map_batches(fn, batch_format="pyarrow")


def sign_reference_bands(
    reference: ray.data.Dataset,
    id_col: str = "url",
    text_col: str = "text",
    params=None,
) -> ray.data.Dataset:
    """Sign the curated corpus ONCE for reuse across cross_dedup_minhash
    runs: returns its numeric band rows (band_key, h1, h2 — three uint64
    columns), side-tagged exactly as cross_dedup_minhash tags them
    internally. Persist with ``.write_parquet(dir)`` and reload with
    ``ray.data.read_parquet(dir)``; pass as ``reference_bands=``. At 10^12
    docs this amortizes the dominant cost of cross-corpus near-dedup — the
    A-side signing — across every new crawl deduped against A (the verify
    stage still column-prune-scans A's (id, text) to gather the few
    endpoint texts that candidate edges actually touch).
    """
    from ..functions.sketches import MinHashParams
    from .minhash import sign_and_band

    params = params or MinHashParams()
    return _tag_side(reference, "A:", id_col, text_col).map_batches(
        sign_and_band,
        fn_kwargs={
            "params": params,
            "text_col": text_col,
            "id_col": id_col,
            "order_cols": (id_col,),
            "numeric_ids": True,
        },
        batch_format="pyarrow",
        batch_size=2048,
    )


def cross_dedup_minhash(
    corpus: ray.data.Dataset,
    reference: ray.data.Dataset,
    id_col: str = "url",
    text_col: str = "text",
    params=None,
    threshold: float | None = None,
    num_buckets: int = 64,
    drop_broadcast_budget: int = 5_000_000,
    counters: dict | None = None,
    reference_bands: ray.data.Dataset | None = None,
) -> ray.data.Dataset:
    """Drop every ``corpus`` doc sharing a verified near-dup CLUSTER with a
    ``reference`` doc; returns the filtered corpus (lazy).

    Ids are side-tag-prefixed internally ("A:"/"B:") so the two corpora may
    reuse ids; the string edge contract (emit="ids") carries the tags through
    components, and one slim exchange on the cluster label finds clusters
    containing at least one reference member. Cluster-transitive by design —
    the same connectivity judgment as the within-corpus flagship (a B doc
    near a B doc near an A doc is dropped). B-only clusters (corpus-internal
    near-dups) are untouched.
    """
    from ..functions.sketches import MinHashParams
    from .components import connected_components
    from .minhash import _fetch_cached, _hash_exchange_tasks, dedup_edges_minhash
    from ..functions.hashing import hash64

    params = params or MinHashParams()

    a_tagged = _tag_side(reference, "A:", id_col, text_col)
    b_tagged = _tag_side(corpus, "B:", id_col, text_col)
    union = a_tagged.union(b_tagged)
    edges = dedup_edges_minhash(
        union,
        params=params,
        id_col=id_col,
        text_col=text_col,
        order_cols=(id_col,),
        threshold=threshold,
        emit="ids",
        # incremental mode: A's band rows were persisted by a prior
        # sign_reference_bands run — sign only the new crawl (B); the verify
        # stage still gathers endpoint texts from the full union
        sign_pages=None if reference_bands is None else b_tagged,
        extra_band_rows=reference_bands,
    )
    labels = connected_components(edges)

    def lab_slim(t: pa.Table) -> pa.Table:
        lab = t["label"]
        if isinstance(lab, pa.ChunkedArray):
            lab = lab.combine_chunks()
        lh = hash64(lab.to_numpy(zero_copy_only=False).astype(object))
        return pa.table(
            {"node": t["node"], "label": lab, "_lh": pa.array(lh, pa.uint64())}
        )

    def contaminated_b(t: pa.Table | None) -> pa.Table:
        empty = pa.table({"b_id": pa.array([], pa.string())})
        if t is None or t.num_rows == 0:
            return empty
        import pandas as pd

        df = t.to_pandas()
        is_a = df["node"].str.startswith("A:")
        bad = set(df.loc[is_a, "label"])
        if not bad:
            return empty
        hit = df["label"].isin(bad) & ~is_a
        return pa.table(
            {"b_id": pa.array(df.loc[hit, "node"].str[2:].to_numpy(), pa.string())}
        )

    drops = _hash_exchange_tasks(
        labels.map_batches(lab_slim, batch_format="pyarrow"),
        "_lh",
        num_buckets,
        contaminated_b,
    )
    n_drops = drops.count()
    if counters is not None:
        counters["cross_near_drops"] = n_drops
    if n_drops == 0:
        return corpus

    from .minhash import _id_hash_pair

    if n_drops > drop_broadcast_budget:
        # payload-exchange limb: reuse the exact-mode shuffle filter keyed on
        # the id (membership by id, not content, in near mode)
        def as_keys(t: pa.Table | None) -> pa.Table:
            if t is None or t.num_rows == 0:
                return pa.table(
                    {"_k1": pa.array([], pa.uint64()), "_k2": pa.array([], pa.uint64())}
                )
            h1, h2 = _id_hash_pair(
                t["b_id"].to_numpy(zero_copy_only=False).astype(object)
            )
            return pa.table(
                {"_k1": pa.array(h1, pa.uint64()), "_k2": pa.array(h2, pa.uint64())}
            )

        keys = drops.map_batches(as_keys, batch_format="pyarrow")
        def id_key(batch: pa.Table):
            arr = batch[id_col]
            if isinstance(arr, pa.ChunkedArray):
                arr = arr.combine_chunks()
            return _id_hash_pair(arr.to_numpy(zero_copy_only=False).astype(object))

        return _payload_exchange_filter(corpus, keys, id_key, num_buckets)

    ddf = drops.to_pandas()
    h1, h2 = _id_hash_pair(ddf["b_id"].to_numpy().astype(object))
    order = np.lexsort((h2, h1))
    drop_ref = ray.put(
        pa.table(
            {"_k1": pa.array(h1[order], pa.uint64()), "_k2": pa.array(h2[order], pa.uint64())}
        )
    )

    def keep(batch: pa.Table) -> pa.Table:
        idx = _fetch_cached(
            drop_ref, lambda t: (t["_k1"].to_numpy(), t["_k2"].to_numpy())
        )
        arr = batch[id_col]
        if isinstance(arr, pa.ChunkedArray):
            arr = arr.combine_chunks()
        q1, q2 = _id_hash_pair(arr.to_numpy(zero_copy_only=False).astype(object))
        from .minhash import _pair_lookup_pos

        _, found = _pair_lookup_pos(idx[0], idx[1], q1, q2)
        return batch.filter(pa.array(~found))

    return corpus.map_batches(keep, batch_format="pyarrow")
