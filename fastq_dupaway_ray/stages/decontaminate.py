"""Benchmark decontamination — flag training documents that contain an
evaluation document's text verbatim (the overlap check every LLM training
pipeline runs before a corpus ships; substring semantics = the reference's
loose containment predicate, `/root/reference/src/comparator.cpp:60-74`,
with the contained side fixed to the eval set).

Scale shape: eval benchmarks are TINY relative to the corpus (thousands of
needles vs billions of docs), so the eval texts broadcast once (``ray.put``
+ once-per-worker fetch) and the scan is a per-batch loop over needles with
``pyarrow.compute.match_substring`` — a vectorized C++ kernel across the
batch rows — touching the training corpus exactly once with ZERO shuffle.
The needle loop is per eval doc, not per corpus row; past ~10k needles,
swap the loop for an Aho–Corasick automaton built once per worker (same
broadcast, same single pass).
"""

from __future__ import annotations

import numpy as np
import pyarrow as pa
import pyarrow.compute as pc
import ray
import ray.data


def contamination_pairs(
    train: ray.data.Dataset,
    eval_ds: ray.data.Dataset,
    text_col: str = "text",
    id_col: str = "doc_id",
    eval_budget: int = 100_000,
) -> ray.data.Dataset:
    """(doc_id, eval_id) for every training doc whose text contains an eval
    doc's text (self-pairs by id excluded). ``eval_ds`` must fit the budget —
    it is the benchmark being protected, not a second corpus."""
    from .minhash import _fetch_cached

    slim = eval_ds.select_columns([id_col, text_col]).materialize()
    n_eval = slim.count()
    if n_eval > eval_budget:
        raise ValueError(
            f"contamination_pairs: eval set has {n_eval} rows (> {eval_budget}); "
            "an eval benchmark should be small — split it or raise the budget"
        )
    tabs = [t for t in ray.get(slim.to_arrow_refs()) if t.num_rows > 0]
    if not tabs:
        empty = pa.table(
            {id_col: pa.array([], pa.int64()), "eval_id": pa.array([], pa.int64())}
        )
        return ray.data.from_arrow(empty)
    ev = pa.concat_tables(tabs)
    order = pc.sort_indices(ev[id_col].combine_chunks())
    eval_ids = ev[id_col].take(order).to_numpy(zero_copy_only=False)
    eval_texts = ev[text_col].take(order).to_pylist()
    ref = ray.put((eval_ids, eval_texts))

    def scan(t: pa.Table) -> pa.Table:
        ids_, texts_ = _fetch_cached(ref)
        col = t[text_col].combine_chunks()
        doc_ids = t[id_col].to_numpy(zero_copy_only=False)
        out_doc, out_eval = [], []
        for eid, needle in zip(ids_, texts_):
            hit = pc.fill_null(pc.match_substring(col, needle), False).to_numpy(
                zero_copy_only=False
            )
            hit &= doc_ids != eid
            if hit.any():
                h = doc_ids[hit]
                out_doc.append(h)
                out_eval.append(np.full(len(h), eid, dtype=eval_ids.dtype))
        if not out_doc:
            return pa.table(
                {
                    id_col: pa.array([], t.schema.field(id_col).type),
                    "eval_id": pa.array([], t.schema.field(id_col).type),
                }
            )
        return pa.table(
            {
                id_col: pa.array(np.concatenate(out_doc)),
                "eval_id": pa.array(np.concatenate(out_eval)),
            }
        )

    return train.map_batches(scan, batch_format="pyarrow")
