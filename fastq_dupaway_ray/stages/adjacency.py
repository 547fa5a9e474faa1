"""Sorted-adjacency dedup — the reference's sequence-based mode (SURVEY.md A3-A5).

Reference pipeline (/root/reference/src/seq_dup_remover.hpp:54-109): external
sort by sequence, then one serial scan where each record is compared against
the current cluster head; duplicates are dropped, non-duplicates become the new
head. Here the external sort is ``Dataset.sort`` (range partition + per-block
sort) and the scan runs **per block in parallel** with an exact cross-block
seam fixup.

Key observation making tight/loose parallelizable exactly: after processing any
row the comparison state equals that row's own text —
* tight: a duplicate has identical text, so state == current row's text;
* loose: on a duplicate the head state advances to the longer text
  (/root/reference/src/seq_dup_remover.hpp:93-98), and in sorted order the
  current row is always >= the state and a superstring when duplicate —
  so state == current row's text again.
Hence "duplicate" reduces to a pure LAG predicate against the immediately
preceding row in the global sort order, and the only cross-block information
needed is each block's last row — O(#blocks) seam data resolved on the driver.

hamming mode has genuine run-carrying state (the head does NOT advance on a
duplicate), so its exact mirror runs the scan inside a single sorted partition
(``repartition(1)``) — offered for reference-compat golden tests only; the
scalable fuzzy path is stages.simhash (documented in the reference itself as an
order-dependent approximation, /root/reference/doc/algorithm.md:38).
"""

from __future__ import annotations

from dataclasses import dataclass

import numpy as np
import pandas as pd
import ray.data

DEFAULT_ORDER = ("warc_ts", "url")


def _hamming_str(a: str, b: str) -> int:
    return sum(1 for x, y in zip(a, b) if x != y)


def _is_dup(mode: str, prev: str, cur: str, distance: int) -> bool:
    if mode == "tight":
        return prev == cur
    if mode == "loose":
        # sorted order guarantees prev <= cur, so only prev-prefix-of-cur occurs
        return cur.startswith(prev)
    if mode == "hamming":
        return len(prev) == len(cur) and _hamming_str(prev, cur) <= distance
    raise ValueError(mode)


def _scan_block(
    df: pd.DataFrame,
    mode: str,
    distance: int,
    text_col: str,
    id_col: str,
    drop_first: bool,
    incoming_head,
):
    """Serial-semantics scan of one sorted block (vectorized where possible).

    Returns (kept_mask, head_ids): head_ids[i] is the cluster head id of row i
    (None -> the head lives in a previous block, substituted by incoming_head).
    """
    texts = df[text_col].to_numpy()
    ids = df[id_col].to_numpy()
    n = len(df)
    if mode == "tight":
        dup = np.zeros(n, dtype=bool)
        dup[1:] = texts[1:] == texts[:-1]
    elif mode == "loose":
        dup = np.zeros(n, dtype=bool)
        # pairwise adjacent startswith — same O(total chars) as the reference scan
        dup[1:] = [b.startswith(a) for a, b in zip(texts[:-1], texts[1:])]
    elif mode == "hamming":
        dup = np.zeros(n, dtype=bool)
        state = None
        for i in range(n):
            if state is not None and _is_dup("hamming", state, texts[i], distance):
                dup[i] = True
            else:
                state = texts[i]
    else:
        raise ValueError(mode)
    if drop_first:
        dup[0] = True
    kept = ~dup
    # head attribution: nearest preceding kept row; -1 -> incoming head
    kept_idx = np.where(kept, np.arange(n), -1)
    head_idx = np.maximum.accumulate(kept_idx)
    head_ids = np.where(head_idx >= 0, ids[np.maximum(head_idx, 0)], incoming_head)
    return kept, head_ids


@dataclass
class AdjacencyResult:
    kept: ray.data.Dataset
    clusters: ray.data.Dataset
    total: int
    duplicates: int


def dedup_adjacency(
    ds: ray.data.Dataset,
    mode: str = "tight",
    distance: int = 2,
    text_col: str = "text",
    id_col: str = "url",
    order_cols=DEFAULT_ORDER,
    emit_clusters: bool = True,
) -> AdjacencyResult:
    """Distributed sorted-adjacency dedup; exact mirror of the reference scan.

    Two passes over one materialized sorted dataset (the moral equivalent of
    the reference's sorted temp file, /root/reference/src/external_sort.hpp:209-215
    — Ray spills it to the object store instead of CWD):
    pass 1 collects per-block seam summaries (first/last row, local head of the
    last row); the driver chains them serially (O(#blocks), trivially small);
    pass 2 re-scans blocks in parallel with the resolved seam inputs.
    """
    order_cols = [c for c in order_cols if c != text_col]
    sort_keys = [text_col, *order_cols]
    if mode == "hamming":
        ds = ds.repartition(1)
    sorted_ds = ds.sort(sort_keys).materialize()

    def seam_summary(df: pd.DataFrame) -> pd.DataFrame:
        if len(df) == 0:
            return pd.DataFrame(
                {"first_text": [], "first_id": [], "last_text": [], "last_head_local": [], "last_head_is_first": []}
            )
        kept, head_ids = _scan_block(df, mode, distance, text_col, id_col, False, None)
        return pd.DataFrame(
            {
                "first_text": [df[text_col].iloc[0]],
                "first_id": [df[id_col].iloc[0]],
                "last_text": [df[text_col].iloc[-1]],
                "last_head_local": [head_ids[-1]],
                "last_head_is_first": [bool(head_ids[-1] == df[id_col].iloc[0])],
            }
        )

    seams = sorted_ds.map_batches(seam_summary, batch_size=None, batch_format="pandas").to_pandas()
    seams = seams.sort_values(["first_text", "first_id"], kind="mergesort").reset_index(drop=True)

    # serial chain over block seams (hamming never reaches here with >1 block)
    plan = {}  # first_id -> (drop_first: bool, incoming_head: id | None)
    prev_last_text = None
    prev_last_head = None
    for _, row in seams.iterrows():
        if prev_last_text is not None and _is_dup(mode, prev_last_text, row["first_text"], distance):
            drop_first, incoming = True, prev_last_head
        else:
            drop_first, incoming = False, None
        plan[row["first_id"]] = (drop_first, incoming)
        if drop_first and row["last_head_is_first"]:
            prev_last_head = incoming  # whole block chained into the previous run
        else:
            prev_last_head = row["last_head_local"]
        prev_last_text = row["last_text"]

    def final_scan(df: pd.DataFrame) -> pd.DataFrame:
        if len(df) == 0:
            return df.assign(_kept=pd.Series([], dtype=bool), _head=pd.Series([], dtype=object))
        drop_first, incoming = plan.get(df[id_col].iloc[0], (False, None))
        kept, head_ids = _scan_block(df, mode, distance, text_col, id_col, drop_first, incoming)
        out = df.copy()
        out["_kept"] = kept
        out["_head"] = head_ids
        return out

    flagged = sorted_ds.map_batches(final_scan, batch_size=None, batch_format="pandas")
    kept = flagged.map_batches(
        lambda df: df[df["_kept"]].drop(columns=["_kept", "_head"]), batch_format="pandas"
    )
    total = sorted_ds.count()
    n_kept = kept.count()
    clusters = flagged.map_batches(
        lambda df: pd.DataFrame(
            {
                "cluster_id": df["_head"].to_numpy(),
                "member": df[id_col].to_numpy(),
                "is_representative": df["_kept"].to_numpy(),
            }
        ),
        batch_format="pandas",
    )
    return AdjacencyResult(kept=kept, clusters=clusters, total=total, duplicates=total - n_kept)
