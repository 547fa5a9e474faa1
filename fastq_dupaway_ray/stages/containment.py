"""Contained-duplicate detection — substring containment pass (north rule).

Generalizes the reference's loose prefix predicate
(/root/reference/src/comparator.cpp:60-74: the shorter record equals a prefix
of the longer) to full substring containment: a page whose text appears verbatim
inside another page is a contained duplicate (quote pages, syndicated excerpts,
template supersets).

Algorithm (two stages, both partition-parallel):

1. **Candidate scoping**: docs are co-partitioned by a cheap locality key so
   containment pairs land in one partition. Default key: the *minimum char
   shingle hash* of the text — if A's text is a substring of B's (and len(A)
   >= shingle k), every shingle of A, including its minimum, is a shingle of
   B; they share min-shingle whenever A's min is also B's global min. To catch
   the rest, each doc emits its bottom-``anchors`` shingles as keys (a bottom-k
   sketch): A ⊆ B guarantees min(A) ∈ shingles(B), so the pair co-occurs under
   A's min key iff min(A) is among B's bottom-k. Larger ``anchors`` -> higher
   recall, linearly more shuffle rows. anchors >= number of shingles is exact
   but quadratic-ish; the default trades recall for cost and is measured in
   tests on planted chains.
2. **Partition verify**: inside each bucket, sort by length descending,
   concatenate the longer texts with an out-of-alphabet separator and run
   C-speed ``str.find`` of each shorter text against the concatenation of
   strictly-longer ones (the sorted-suffix-scan moral equivalent; exact, no
   false positives because the separator never matches).

Emitted edges (big, small) feed the same components/representative stages as
MinHash/SimHash — keep-first semantics then pick the earliest member.
"""

from __future__ import annotations

import bisect

import numpy as np
import pandas as pd
import pyarrow as pa
import ray
import ray.data

from ..functions.hashing import char_ngram_hashes

SEP = "\x00"


class AnchorEmitter:
    """Actor-pool callable: emit (anchor_key, id, text_len) rows per doc —
    one row per bottom-k shingle hash (the containment locality keys)."""

    def __init__(self, shingle_k: int = 8, anchors: int = 4, text_col: str = "text", id_col: str = "url"):
        self.k = shingle_k
        self.anchors = anchors
        self.text_col = text_col
        self.id_col = id_col

    def __call__(self, batch: pa.Table) -> pa.Table:
        texts = batch[self.text_col].to_pylist()
        ids = batch[self.id_col].to_pylist()
        keys, out_ids, out_texts = [], [], []
        for i, t in enumerate(texts):
            t = t or ""
            sh = char_ngram_hashes(t, self.k)
            if len(sh) == 0:
                continue
            bottom = sh[: self.anchors]  # char_ngram_hashes returns sorted-unique
            keys.extend(int(x) for x in bottom)
            out_ids.extend([ids[i]] * len(bottom))
            out_texts.extend([t] * len(bottom))
        return pa.table(
            {
                "anchor_key": pa.array(np.array(keys, dtype=np.uint64), pa.uint64()),
                self.id_col: pa.array(out_ids, batch[self.id_col].type),
                self.text_col: pa.array(out_texts, pa.string()),
            }
        )


class ExactAnchorEmitter:
    """Exact-mode emitter: emit one (anchor_key, id, text) row per shingle of
    the doc that is some doc's *minimum* shingle (membership tested against a
    broadcast sorted uint64 array fetched once per actor from the object
    store).  Guarantee: if A's text is a substring of B's (len(A) >= k) then
    every shingle of A is a shingle of B, so min(A) ∈ shingles(B) ∩ M and the
    pair co-locates under key min(A).  Zero false negatives; verify is exact.

    Scale note: |M| <= n_docs, so the broadcast is 8 bytes/doc — fine up to
    ~10^9 docs per job; beyond that use the bottom-k approximate path
    (AnchorEmitter) whose recall/cost is tunable via ``anchors``.
    """

    def __init__(self, min_set_ref, shingle_k: int = 8, text_col: str = "text", id_col: str = "url"):
        self.M = ray.get(min_set_ref) if isinstance(min_set_ref, ray.ObjectRef) else min_set_ref
        self.k = shingle_k
        self.text_col = text_col
        self.id_col = id_col

    def __call__(self, batch: pa.Table) -> pa.Table:
        texts = batch[self.text_col].to_pylist()
        ids = batch[self.id_col].to_pylist()
        keys, out_ids, out_texts = [], [], []
        for i, t in enumerate(texts):
            t = t or ""
            sh = char_ngram_hashes(t, self.k)
            if len(sh) == 0 or len(self.M) == 0:
                continue
            pos = np.searchsorted(self.M, sh)
            pos[pos >= len(self.M)] = len(self.M) - 1
            hits = sh[self.M[pos] == sh]
            keys.extend(int(x) for x in hits)
            out_ids.extend([ids[i]] * len(hits))
            out_texts.extend([t] * len(hits))
        return pa.table(
            {
                "anchor_key": pa.array(np.array(keys, dtype=np.uint64), pa.uint64()),
                self.id_col: pa.array(out_ids, batch[self.id_col].type),
                self.text_col: pa.array(out_texts, pa.string()),
            }
        )


def _min_shingle_set(pages: ray.data.Dataset, shingle_k: int, text_col: str) -> np.ndarray:
    """Distinct per-doc minimum shingle hashes, sorted uint64 (small result:
    <= one value per doc; partial-uniqued inside each batch before collect)."""

    def mins(t: pa.Table) -> pa.Table:
        out = []
        for txt in t[text_col].to_pylist():
            sh = char_ngram_hashes(txt or "", shingle_k)
            if len(sh):
                out.append(sh[0])  # char_ngram_hashes returns sorted-unique
        arr = np.unique(np.array(out, dtype=np.uint64))
        return pa.table({"m": pa.array(arr, pa.uint64())})

    parts = [
        b["m"].to_numpy()
        for b in pages.select_columns([text_col])
        .map_batches(mins, batch_format="pyarrow")
        .iter_batches(batch_format="pyarrow")
    ]
    if not parts:
        return np.empty(0, dtype=np.uint64)
    return np.unique(np.concatenate(parts))


def containment_edges(
    pages: ray.data.Dataset,
    shingle_k: int = 8,
    anchors: int | None = 4,
    id_col: str = "url",
    text_col: str = "text",
    max_bucket: int = 512,
    num_shuffle_buckets: int | None = None,
    signer_concurrency=(1, 8),
) -> ray.data.Dataset:
    """pages -> containment edges (a=container, b=contained).

    ``anchors=None`` selects the exact mode (broadcast min-shingle semi-join,
    zero false negatives for texts with len >= shingle_k); an integer selects
    the bottom-k approximate scale path.  Note the shuffle carries text
    (needed for verify) — the copies-per-doc cost knob is explicit.
    """
    from .minhash import _default_shuffle_buckets

    B = num_shuffle_buckets or _default_shuffle_buckets()
    slim = pages.select_columns(sorted({id_col, text_col}))
    if anchors is None:
        min_ref = ray.put(_min_shingle_set(slim, shingle_k, text_col))
        anchor_rows = slim.map_batches(
            ExactAnchorEmitter,
            fn_constructor_kwargs={
                "min_set_ref": min_ref,
                "shingle_k": shingle_k,
                "text_col": text_col,
                "id_col": id_col,
            },
            batch_format="pyarrow",
            batch_size=2048,
            concurrency=signer_concurrency,
        )
    else:
        anchor_rows = slim.map_batches(
            AnchorEmitter,
            fn_constructor_kwargs={
                "shingle_k": shingle_k,
                "anchors": anchors,
                "text_col": text_col,
                "id_col": id_col,
            },
            batch_format="pyarrow",
            batch_size=2048,
            concurrency=signer_concurrency,
        )

    def bucketize(t: pa.Table) -> pa.Table:
        bkt = (t["anchor_key"].to_numpy() % np.uint64(B)).astype(np.int64)
        return t.append_column("_bkt", pa.array(bkt, pa.int64()))

    def per_bucket(df: pd.DataFrame) -> pd.DataFrame:
        # Within each anchor key: sort by length desc; search each text against
        # the concatenation of all STRICTLY-longer texts (separator-joined, so
        # no cross-boundary false hits), emitting one edge per (container,
        # contained) pair found — ALL containers, matching the oracle's full
        # containment join. Contained docs stay in the pool (C ⊂ A ⊂ B must
        # yield both (A,C) and (B,C)).
        edges_a, edges_b = [], []
        if len(df) == 0 or "anchor_key" not in df.columns:
            # map_groups may deliver an empty schema-less frame on tiny inputs
            return pd.DataFrame({"a": edges_a, "b": edges_b})
        for _, grp in df.groupby("anchor_key", sort=False):
            grp = grp.drop_duplicates(subset=[id_col])
            if len(grp) < 2:
                continue
            grp = grp.assign(_len=grp[text_col].str.len()).sort_values(
                ["_len", id_col], ascending=[False, True], kind="mergesort"
            ).head(max_bucket)
            texts = grp[text_col].tolist()
            ids = grp[id_col].tolist()
            concat = ""
            end_offsets: list[int] = []  # end offset of each added text
            owners: list[int] = []  # idx of the doc covering that span
            prev_len = None
            pending: list[int] = []
            for i, t in enumerate(texts):
                # flush all strictly-longer pending docs into the haystack
                if prev_len is not None and len(t) < prev_len:
                    for j in pending:
                        concat += texts[j] + SEP
                        end_offsets.append(len(concat))
                        owners.append(j)
                    pending = []
                if concat:
                    pos = concat.find(t)
                    while pos >= 0:
                        k = bisect.bisect_right(end_offsets, pos)
                        edges_a.append(ids[owners[k]])
                        edges_b.append(ids[i])
                        # jump past the covering doc — one edge per container
                        pos = concat.find(t, end_offsets[k])
                pending.append(i)
                prev_len = len(t)
        return pd.DataFrame({"a": edges_a, "b": edges_b})

    from .simhash import dedup_edge_list

    edges = (
        anchor_rows.map_batches(bucketize, batch_format="pyarrow")
        .groupby("_bkt")
        .map_groups(per_bucket, batch_format="pandas")
    )
    return dedup_edge_list(edges)
