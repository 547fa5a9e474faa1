"""Canonical-representative selection + cluster table emission (SURVEY.md A6/S9).

Given cluster labels (node=id, label=cluster id) from stages.components, pick
one representative row per cluster with the reference's keep-first tiebreak —
first in arrival order, i.e. min (warc_ts, url)
(/root/reference/src/hash_dup_remover.hpp:122-139 keeps the first occurrence;
/root/reference/src/seq_dup_remover.hpp:74-90 keeps the first of each sorted run)
— and emit both the deduplicated pages and the clusters side table in the
--write-clusters shape (/root/reference/src/file_utils.cpp:98-112):

    clusters(cluster_id = representative id, member, is_representative)

Shuffle shape (this matters at 100 TB): the heavy page payload NEVER enters a
shuffle. The label table is the set of *clustered members only* (the
duplicates — small relative to the corpus), so it is broadcast via ``ray.put``
and applied inside streaming ``map_batches`` passes:

1. one slim pass over (id, order) columns attaches labels -> bucketed
   vectorized representative pick -> clusters table;
2. the non-representative member ids (the drop set) are broadcast and the full
   payload streams through a single filter pass — no join, no payload shuffle.

Scale note: if the drop set outgrew driver/worker memory (extreme dup rates at
10^12 docs), swap step 2 for a bucket-wise semi-join of ids with the payload
re-read per kept bucket; the broadcast form is the right call whenever the
drop list fits in a few GB, which covers typical web dedup ratios at any
corpus size a single job partition handles.
"""

from __future__ import annotations

import pandas as pd
import ray
import ray.data

DEFAULT_ORDER = ("warc_ts", "url")


def apply_cluster_labels(
    pages: ray.data.Dataset,
    labels: ray.data.Dataset,
    id_col: str = "url",
    order_cols=DEFAULT_ORDER,
    num_partitions: int | None = None,  # kept for API stability; unused (join-free path)
):
    """Returns (kept_pages, clusters) — both lazy Datasets."""
    order_cols = [c for c in order_cols]
    label_df = labels.to_pandas()  # clustered members only — the small side
    if len(label_df) == 0:
        empty = pd.DataFrame(
            {
                "cluster_id": pd.Series([], dtype=object),
                "member": pd.Series([], dtype=object),
                "is_representative": pd.Series([], dtype=bool),
            }
        )
        return pages, ray.data.from_pandas(empty)

    import numpy as np
    import pyarrow as pa

    from .minhash import _fetch_cached, _id_hash_pair

    # the label table is already on the driver — build the READY lookup
    # index here (hash + argsort once) and broadcast it; per-WORKER index
    # builds are a broadcast tax that grows with cluster size. Fetches are
    # zero-copy (numpy + Arrow from plasma); lookups are vectorized
    # searchsorted over 128-bit id hashes, not per-row dict .map
    _nodes = label_df["node"].to_numpy(dtype=object)
    _lh1, _lh2 = _id_hash_pair(_nodes)
    _lorder = np.argsort(_lh1, kind="stable").astype(np.int64)
    label_ref = ray.put(
        (_lh1[_lorder], _lh2[_lorder], pa.array(label_df["label"]), _lorder)
    )
    slim_cols = sorted(set([id_col, *order_cols]))

    def attach(df: pd.DataFrame) -> pd.DataFrame:
        h1s, h2s, labels_arr, order = _fetch_cached(label_ref)
        ids = df[id_col].to_numpy(dtype=object)
        q1, q2 = _id_hash_pair(ids)
        pos = np.searchsorted(h1s, q1)
        pos[pos == len(h1s)] = max(len(h1s) - 1, 0)
        found = (h1s[pos] == q1) & (h2s[pos] == q2)
        out = df.loc[found, slim_cols].copy()
        # Arrow take of only the FOUND labels (clustered members — the small
        # subset); no per-row Python over the full corpus
        out["label"] = labels_arr.take(pa.array(order[pos[found]])).to_pylist()
        return out

    members = pages.select_columns(slim_cols).map_batches(attach, batch_format="pandas")

    def pick_reps(df: pd.DataFrame) -> pd.DataFrame:
        df = df.sort_values(["label", *order_cols], kind="mergesort")
        rep = df.groupby("label", sort=False)[id_col].transform("first")
        return pd.DataFrame(
            {
                "cluster_id": rep.to_numpy(),
                "member": df[id_col].to_numpy(),
                "is_representative": (rep.to_numpy() == df[id_col].to_numpy()),
            }
        )

    # the members table is at most as large as the label table, which ALREADY
    # sits on the driver (to_pandas above) — so when labels fit the driver
    # budget, one vectorized pandas groupby there replaces a distributed
    # hash-shuffle whose aggregator-pool spawn is a multi-second FIXED cost
    # that grows with cluster CPUs (measured 4.6 s for 57k rows at 32 CPUs —
    # pure anti-scaling overhead on the small side). Above the budget, the
    # two-level bucketed shuffle is the scale path.
    if len(label_df) <= 2_000_000:
        import numpy as _np

        cdf = pick_reps(members.to_pandas())
        n_chunks = max(1, min(len(cdf), 8))
        clusters = ray.data.from_pandas(
            [c.reset_index(drop=True) for c in _np.array_split(cdf, n_chunks)]
        )
    else:
        from .minhash import _default_shuffle_buckets

        B = _default_shuffle_buckets()

        def bucketize(df: pd.DataFrame) -> pd.DataFrame:
            df = df.copy()
            df["_bkt"] = pd.util.hash_array(df["label"].to_numpy()) % B
            return df

        clusters = (
            members.map_batches(bucketize, batch_format="pandas")
            .groupby("_bkt")
            .map_groups(
                lambda d: pick_reps(d.drop(columns=["_bkt"])), batch_format="pandas"
            )
            .materialize()
        )
        cdf = clusters.to_pandas()

    from .minhash import _id_member_mask

    # ready (sorted h1, h2) membership index built on the driver (cdf is
    # already local) — workers fetch zero-copy numpy, no per-worker build
    _drops = cdf.loc[~cdf["is_representative"], "member"].to_numpy(dtype=object)
    _dh1, _dh2 = _id_hash_pair(_drops)
    _dorder = np.argsort(_dh1, kind="stable")
    drop_ref = ray.put((_dh1[_dorder], _dh2[_dorder]))

    def keep_filter(t: pa.Table) -> pa.Table:
        # Arrow-native: the heavy html/text payload stays zero-copy — a
        # pandas batch format here converts every binary column per batch,
        # which dominated the stage wall time and killed its scaling
        drops = _fetch_cached(drop_ref)
        ids = t[id_col].to_numpy(zero_copy_only=False).astype(object)
        return t.filter(pa.array(~_id_member_mask(drops, ids)))

    kept = pages.map_batches(keep_filter, batch_format="pyarrow")
    return kept, clusters
