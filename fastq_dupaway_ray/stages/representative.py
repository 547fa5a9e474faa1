"""Canonical-representative selection + cluster table emission (SURVEY.md A6/S9).

Given cluster labels (node=id, label=cluster id) from stages.components, pick
one representative row per cluster with the reference's keep-first tiebreak —
first in arrival order, i.e. min (warc_ts, url)
(/root/reference/src/hash_dup_remover.hpp:122-139 keeps the first occurrence;
/root/reference/src/seq_dup_remover.hpp:74-90 keeps the first of each sorted run)
— and emit both the deduplicated pages and the clusters side table in the
--write-clusters shape (/root/reference/src/file_utils.cpp:98-112):

    clusters(cluster_id = representative id, member, is_representative)

Rows that never appeared in any candidate edge are singleton clusters (their
own representative) and are kept untouched — they skip the label join entirely.
"""

from __future__ import annotations

import numpy as np
import pandas as pd
import pyarrow as pa
import ray.data

from ..util import default_join_partitions

DEFAULT_ORDER = ("warc_ts", "url")


def apply_cluster_labels(
    pages: ray.data.Dataset,
    labels: ray.data.Dataset,
    id_col: str = "url",
    order_cols=DEFAULT_ORDER,
    num_partitions: int | None = None,
):
    """Returns (kept_pages, clusters) — both lazy Datasets.

    kept_pages: all singleton rows + the min-order member of every labeled
    cluster. clusters: one row per labeled member (+ representatives flagged).

    Shuffle shape: the label table is slim (two id columns); the join is hash
    partitioned on the row id; representative selection shuffles only the slim
    (label, id, order) projection, then a final semi-join pulls the full
    payload rows of winners — the html payload crosses the wire at most once.
    """
    num_partitions = num_partitions or default_join_partitions()
    order_cols = list(order_cols)
    labeled = pages.join(
        labels, "left_outer", num_partitions=num_partitions, on=(id_col,), right_on=("node",)
    )

    slim_cols = sorted(set([id_col, *order_cols, "label"]))

    def slim(df: pd.DataFrame) -> pd.DataFrame:
        return df[df["label"].notna()][slim_cols]

    members = labeled.map_batches(slim, batch_format="pandas")

    def pick_rep(df: pd.DataFrame) -> pd.DataFrame:
        df = df.sort_values(order_cols, kind="mergesort")
        rep = df[id_col].iloc[0]
        return pd.DataFrame(
            {
                "cluster_id": np.full(len(df), rep, dtype=object),
                "member": df[id_col].to_numpy(),
                "is_representative": (df[id_col] == rep).to_numpy(),
            }
        )

    clusters = members.groupby("label").map_groups(pick_rep, batch_format="pandas")

    def keep(df: pd.DataFrame) -> pd.DataFrame:
        # singletons (no label) always kept; labeled rows kept iff representative
        return df

    reps = clusters.map_batches(
        lambda df: df[df["is_representative"]][["member"]].rename(columns={"member": "_rep_id"}),
        batch_format="pandas",
    )
    kept = _semi_join_keep(labeled, reps, id_col=id_col, num_partitions=num_partitions)
    return kept, clusters


def _semi_join_keep(labeled, reps, id_col: str, num_partitions: int):
    """Keep unlabeled rows + rows whose id is in reps (hash semi-join)."""
    singletons = labeled.map_batches(
        lambda df: df[df["label"].isna()].drop(columns=["label"]), batch_format="pandas"
    )
    rep_rows = labeled.join(
        reps, "inner", num_partitions=num_partitions, on=(id_col,), right_on=("_rep_id",)
    ).map_batches(lambda df: df.drop(columns=["label"], errors="ignore"), batch_format="pandas")
    return singletons.union(rep_rows)
