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

    import pyarrow as pa

    from .minhash import _build_text_map, _fetch_cached

    # broadcast as zero-copy Arrow; each worker builds its dict ONCE (a
    # python-dict broadcast re-pays deserialization per worker process,
    # a fixed cost that grows with parallelism)
    label_ref = ray.put(
        pa.table({"node": pa.array(label_df["node"]), "label": pa.array(label_df["label"])})
    )
    slim_cols = sorted(set([id_col, *order_cols]))

    def attach(df: pd.DataFrame) -> pd.DataFrame:
        lab = df[id_col].map(_fetch_cached(label_ref, _build_text_map))
        out = df.loc[lab.notna(), slim_cols].copy()
        out["label"] = lab[lab.notna()]
        return out

    members = pages.select_columns(slim_cols).map_batches(attach, batch_format="pandas")

    # two-level bucketing: hash-partition clusters into coarse buckets, then
    # ONE vectorized pandas groupby per bucket (not one Python call per cluster)
    from .minhash import _default_shuffle_buckets

    B = _default_shuffle_buckets()

    def bucketize(df: pd.DataFrame) -> pd.DataFrame:
        df = df.copy()
        df["_bkt"] = pd.util.hash_array(df["label"].to_numpy()) % B
        return df

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

    clusters = (
        members.map_batches(bucketize, batch_format="pandas")
        .groupby("_bkt")
        .map_groups(pick_reps, batch_format="pandas")
        .materialize()
    )

    cdf = clusters.to_pandas()
    drop_ref = ray.put(pa.array(cdf.loc[~cdf["is_representative"], "member"]))

    def keep_filter(df: pd.DataFrame) -> pd.DataFrame:
        drops = _fetch_cached(drop_ref, lambda a: set(a.to_pylist()))
        return df[~df[id_col].isin(drops)]

    kept = pages.map_batches(keep_filter, batch_format="pandas")
    return kept, clusters
