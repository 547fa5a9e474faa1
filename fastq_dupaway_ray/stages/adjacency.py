"""Sorted-adjacency dedup — the reference's sequence-based mode (SURVEY.md A3-A5, EP3).

Reference pipeline (/root/reference/src/seq_dup_remover.hpp:54-109 single,
:131-218 paired): external sort by sequence (pair-lexicographic for paired,
/root/reference/src/paired_external_sort.hpp:20-33), then one serial scan where
each record (pair) is compared against the current cluster head; duplicates are
dropped, non-duplicates become the new head. Here the external sort is
``Dataset.sort`` (range partition + per-block sort) and the scan runs
**per block in parallel** with an exact cross-block seam fixup.

Key observation making tight/loose (single AND paired) parallelizable exactly:
after processing any row the comparison state equals that row's own text(s) —
* tight: a duplicate has identical text, so state == current row;
* loose single: on a duplicate the head state advances to the longer text
  (/root/reference/src/seq_dup_remover.hpp:93-98), and in sorted order the
  current row is always >= the state and a superstring when duplicate —
  so state == current row again;
* loose paired: the duplicate predicate requires both overlaps same-sided
  (/root/reference/src/comparator.cpp:73) and the head advances only when both
  mates are longer-or-equal (/root/reference/src/seq_dup_remover.hpp:194-202).
  Under pair-lexicographic sort the state pair is always <= the current pair,
  so prefix-compatibility forces state_1 prefix-of cur_1 (hence len <=); the
  same-sided rule then demands state_2 prefix-of cur_2 as well — i.e. every
  sorted-order duplicate satisfies the both-longer advance condition, and
  state == current pair after every step. Duplicate reduces to the pure LAG
  predicate ``cur_i.startswith(prev_i) for all i``.
Hence "duplicate" reduces to a LAG predicate against the immediately preceding
row in the global sort order, and the only cross-block information needed is
each block's last row — O(#blocks) seam data resolved on the driver.

hamming mode (single and paired) has genuine run-carrying state (the head does
NOT advance on a duplicate, /root/reference/src/comparator.cpp:76-91), so its
exact mirror runs as a **serial chain of per-block Ray tasks**: block i's scan
task receives block i-1's outgoing (head_texts, head_id) state, scans its own
sorted block vectorized, and hands the new state to block i+1. Wall-time is
serial in #blocks (the reference's semantics are inherently order-dependent,
/root/reference/doc/algorithm.md:38) but memory stays bounded per block — no
``repartition(1)`` concentration. The scalable fuzzy path is stages.simhash.
"""

from __future__ import annotations

from dataclasses import dataclass

import numpy as np
import pandas as pd
import pyarrow as pa
import ray
import ray.data

DEFAULT_ORDER = ("warc_ts", "url")


def _hamming_str(a: str, b: str) -> int:
    return sum(1 for x, y in zip(a, b) if x != y)


def _is_dup(mode: str, prev, cur, distance: int) -> bool:
    """LAG/state duplicate predicate over text tuples (prev/cur: tuple[str])."""
    if mode == "tight":
        return prev == cur
    if mode == "loose":
        # sorted order guarantees prev <= cur; same-sidedness (paired) then
        # reduces to prev_i prefix-of cur_i on every side (module docstring)
        return all(c.startswith(p) for p, c in zip(prev, cur))
    if mode == "hamming":
        return all(
            len(p) == len(c) and _hamming_str(p, c) <= distance for p, c in zip(prev, cur)
        )
    raise ValueError(mode)


def _lag_dup_mask(mode: str, cols: list[np.ndarray], distance: int) -> np.ndarray:
    """Vectorized LAG duplicate mask for tight/loose over 1..n text columns."""
    n = len(cols[0])
    dup = np.ones(n, dtype=bool)
    dup[0] = False
    for texts in cols:
        if mode == "tight":
            side = texts[1:] == texts[:-1]
        else:  # loose: adjacent startswith — O(total chars), like the reference scan
            side = np.fromiter(
                (b.startswith(a) for a, b in zip(texts[:-1], texts[1:])),
                dtype=bool,
                count=n - 1,
            )
        dup[1:] &= side
    return dup


def _scan_block(
    df: pd.DataFrame,
    mode: str,
    distance: int,
    text_cols: list[str],
    id_col: str,
    drop_first: bool,
    incoming_head,
    incoming_state=None,
):
    """Serial-semantics scan of one sorted block (vectorized where possible).

    Returns (kept_mask, head_ids, out_state): head_ids[i] is the cluster head
    id of row i (incoming_head substitutes when the head lives in a previous
    block); out_state is the comparator state after the last row (text tuple)
    — only meaningful for hamming, where the head does not advance on dups.
    """
    cols = [df[c].to_numpy() for c in text_cols]
    ids = df[id_col].to_numpy()
    n = len(df)
    if mode in ("tight", "loose"):
        dup = _lag_dup_mask(mode, cols, distance)
        if drop_first:
            dup[0] = True
        out_state = tuple(c[-1] for c in cols)
    elif mode == "hamming":
        dup = np.zeros(n, dtype=bool)
        state = incoming_state  # tuple[str] | None
        for i in range(n):
            cur = tuple(c[i] for c in cols)
            if state is not None and _is_dup("hamming", state, cur, distance):
                dup[i] = True
            else:
                state = cur
        out_state = state
        if drop_first:
            dup[0] = True
    else:
        raise ValueError(mode)
    kept = ~dup
    # head attribution: nearest preceding kept row; -1 -> incoming head
    kept_idx = np.where(kept, np.arange(n), -1)
    head_idx = np.maximum.accumulate(kept_idx)
    head_ids = np.where(head_idx >= 0, ids[np.maximum(head_idx, 0)], incoming_head)
    return kept, head_ids, out_state


@dataclass
class AdjacencyResult:
    kept: ray.data.Dataset
    clusters: ray.data.Dataset
    total: int
    duplicates: int


def _normalize_text_cols(text_col, text_cols) -> list[str]:
    if text_cols is not None:
        return list(text_cols)
    return [text_col]


def dedup_adjacency(
    ds: ray.data.Dataset,
    mode: str = "tight",
    distance: int = 2,
    text_col: str = "text",
    id_col: str = "url",
    order_cols=DEFAULT_ORDER,
    emit_clusters: bool = True,
    text_cols=None,
) -> AdjacencyResult:
    """Distributed sorted-adjacency dedup; exact mirror of the reference scan.

    ``text_cols`` with two entries selects paired-end semantics (reference
    EP3): pair-lexicographic sort, both-mates duplicate predicates
    (/root/reference/src/comparator.cpp:51-58,65-74,84-91). ``text_col`` is
    the single-end shorthand.

    tight/loose: two passes over one materialized sorted dataset (the moral
    equivalent of the reference's sorted temp file,
    /root/reference/src/external_sort.hpp:209-215 — Ray spills it to the
    object store instead of CWD): pass 1 collects per-block seam summaries
    (first/last row); the driver chains them serially (O(#blocks), trivially
    small); pass 2 re-scans blocks in parallel with the resolved seam inputs.

    hamming: serial chain of per-block scan tasks (module docstring).
    """
    tcols = _normalize_text_cols(text_col, text_cols)
    order_cols = [c for c in order_cols if c not in tcols]
    sort_keys = [*tcols, *order_cols]
    sorted_ds = ds.sort(sort_keys).materialize()

    if mode == "hamming":
        flagged = _chain_scan(sorted_ds, mode, distance, tcols, id_col, sort_keys)
    else:
        flagged = _lag_scan(sorted_ds, mode, distance, tcols, id_col, order_cols)

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


def _lag_scan(
    sorted_ds: ray.data.Dataset,
    mode: str,
    distance: int,
    tcols: list[str],
    id_col: str,
    order_cols: list[str],
) -> ray.data.Dataset:
    """tight/loose: parallel per-block scans + driver seam chaining.

    Seam summaries carry the first row's FULL sort key (text cols + order
    cols) — blocks are chained and the plan keyed by that tuple, so equal-text
    runs spanning blocks chain in true global sort order even when the order
    columns disagree with, say, id order (each first row is a distinct row, so
    the tuple is collision-free given order_cols uniquely identify rows).
    """
    key_cols = [*tcols, *order_cols]

    def seam_summary(df: pd.DataFrame) -> pd.DataFrame:
        if len(df) == 0:
            return pd.DataFrame(
                {
                    **{f"first_{c}": [] for c in key_cols},
                    **{f"last_{c}": [] for c in tcols},
                    "first_id": [],
                    "last_head_local": [],
                    "last_head_is_first": [],
                }
            )
        kept, head_ids, _state = _scan_block(df, mode, distance, tcols, id_col, False, None)
        return pd.DataFrame(
            {
                **{f"first_{c}": [df[c].iloc[0]] for c in key_cols},
                **{f"last_{c}": [df[c].iloc[-1]] for c in tcols},
                "first_id": [df[id_col].iloc[0]],
                "last_head_local": [head_ids[-1]],
                "last_head_is_first": [bool(head_ids[-1] == df[id_col].iloc[0])],
            }
        )

    seams = sorted_ds.map_batches(seam_summary, batch_size=None, batch_format="pandas").to_pandas()
    seams = seams.sort_values([f"first_{c}" for c in key_cols], kind="mergesort").reset_index(
        drop=True
    )

    # serial chain over block seams — state == last row's texts for LAG modes
    plan = {}  # first-row full sort key tuple -> (drop_first: bool, incoming_head)
    prev_last_state = None
    prev_last_head = None
    for _, row in seams.iterrows():
        first_texts = tuple(row[f"first_{c}"] for c in tcols)
        if prev_last_state is not None and _is_dup(mode, prev_last_state, first_texts, distance):
            drop_first, incoming = True, prev_last_head
        else:
            drop_first, incoming = False, None
        plan[tuple(row[f"first_{c}"] for c in key_cols)] = (drop_first, incoming)
        if drop_first and row["last_head_is_first"]:
            prev_last_head = incoming  # whole block chained into the previous run
        else:
            prev_last_head = row["last_head_local"]
        prev_last_state = tuple(row[f"last_{c}"] for c in tcols)

    def final_scan(df: pd.DataFrame) -> pd.DataFrame:
        if len(df) == 0:
            return df.assign(_kept=pd.Series([], dtype=bool), _head=pd.Series([], dtype=object))
        block_key = tuple(df[c].iloc[0] for c in key_cols)
        drop_first, incoming = plan.get(block_key, (False, None))
        kept, head_ids, _state = _scan_block(
            df, mode, distance, tcols, id_col, drop_first, incoming
        )
        out = df.copy()
        out["_kept"] = kept
        out["_head"] = head_ids
        return out

    return sorted_ds.map_batches(final_scan, batch_size=None, batch_format="pandas")


def _block_to_df(block) -> pd.DataFrame:
    """Ray blocks are Arrow tables or pandas frames depending on provenance."""
    return block.to_pandas() if isinstance(block, pa.Table) else block


@ray.remote(num_returns=2)
def _chain_scan_block(block, prev_meta, mode: str, distance: int, tcols, id_col: str):
    """One link of the hamming serial chain: scan a sorted block given the
    incoming (state, head) pair; returns (flagged Arrow table, (state, head)).

    ``prev_meta`` arrives as the PREDECESSOR TASK'S OUTPUT REF — Ray resolves
    it just-in-time, so the whole chain is submitted up front and each link
    starts the moment its predecessor's O(1) state lands, with no driver
    round-trip between links (round-2 looped ``ray.get`` per block)."""
    state, head_id = prev_meta if prev_meta is not None else (None, None)
    df = _block_to_df(block)
    if len(df) == 0:
        out = df.assign(_kept=pd.Series([], dtype=bool), _head=pd.Series([], dtype=object))
        return pa.Table.from_pandas(out, preserve_index=False), (state, head_id)
    kept, head_ids, out_state = _scan_block(
        df, mode, distance, list(tcols), id_col, False, head_id, incoming_state=state
    )
    out = df.copy()
    out["_kept"] = kept
    out["_head"] = head_ids
    out_head = head_ids[-1]
    return pa.Table.from_pandas(out, preserve_index=False), (out_state, out_head)


def _chain_scan(
    sorted_ds: ray.data.Dataset,
    mode: str,
    distance: int,
    tcols: list[str],
    id_col: str,
    sort_keys: list[str],
) -> ray.data.Dataset:
    """Run-carrying modes: serial chain of per-block Ray tasks.

    Blocks of the range-partitioned sorted dataset are chained in global sort
    order (ordered by each block's first sort key). Each task ships only the
    O(1) comparator state to its successor; flagged blocks stay in the object
    store and re-assemble into a Dataset — the whole corpus never concentrates
    on one worker or the driver.
    """
    bundles = list(sorted_ds.iter_internal_ref_bundles())
    block_refs = [br for b in bundles for br, _meta in b.blocks]

    @ray.remote
    def first_key(block):
        df = _block_to_df(block)
        if len(df) == 0:
            return None
        return tuple(df[c].iloc[0] for c in sort_keys)

    firsts = ray.get([first_key.remote(r) for r in block_refs])
    order = sorted(
        (i for i in range(len(block_refs)) if firsts[i] is not None), key=lambda i: firsts[i]
    )

    meta = None  # first link starts with empty comparator state
    flagged_refs = []
    for i in order:
        tbl_ref, meta = _chain_scan_block.remote(
            block_refs[i], meta, mode, distance, tuple(tcols), id_col
        )
        flagged_refs.append(tbl_ref)
        # no ray.get: the next link consumes `meta` as a task-arg future, so
        # submission is instant and block prefetch overlaps the state hop
    if not flagged_refs:
        return sorted_ds.map_batches(
            lambda df: df.assign(_kept=pd.Series([], dtype=bool), _head=pd.Series([], dtype=object)),
            batch_format="pandas",
        )
    return ray.data.from_arrow_refs(flagged_refs)
