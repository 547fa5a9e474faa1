"""Sequence packing — the concat-and-chunk assignment an LLM pretraining
pipeline runs after curation: documents in a deterministic order are laid
end-to-end on a token tape and every document is assigned the training
sequence (`seq_id = token_offset // seq_len`) its first token lands in.

This is a distributed PREFIX SUM over the sorted corpus, built on the same
two-pass seam shape as `stages/adjacency._lag_scan`: pass 1 computes one
(first-key, block token total) summary row per block (tiny — collected to
the driver), the driver runs the exclusive scan over block totals in sort
order, and pass 2 re-maps every block adding its base offset to the
intra-block cumulative sum. Two streaming passes, no shuffle, no
materialized token tape; the only driver state is one row per block.

Boundary semantics are the simple industrial ones (document granularity:
a doc belongs to the sequence holding its first token; real loaders split
the straddling doc across both sequences — assignment is identical).
"""

from __future__ import annotations

import numpy as np
import pandas as pd
import pyarrow as pa
import ray
import ray.data


def pack_sequences(
    ds: ray.data.Dataset,
    seq_len: int,
    text_col: str = "text",
    id_col: str = "doc_id",
) -> ray.data.Dataset:
    """(id, n_tokens, tok_offset, seq_id) per doc, in ``id_col`` tape order.

    ``id_col`` must be unique (it keys the per-block plan, like the
    adjacency seam chain) and orderable; whitespace token counts follow the
    repo-wide convention (`functions.textstats.token_count_ws` == the SQL
    oracle's regexp_split arithmetic).
    """
    from ..functions.textstats import token_count_ws

    if seq_len < 1:
        raise ValueError("pack_sequences needs seq_len >= 1")

    def tokens(t: pa.Table) -> pa.Table:
        return pa.table(
            {
                id_col: t[id_col],
                "n_tokens": token_count_ws(t[text_col].combine_chunks()),
            }
        )

    slim = (
        ds.select_columns([id_col, text_col])
        .map_batches(tokens, batch_format="pyarrow")
        .sort(id_col)
        .materialize()
    )

    def block_summary(df: pd.DataFrame) -> pd.DataFrame:
        if len(df) == 0:
            return pd.DataFrame({"first_id": [], "block_total": []})
        return pd.DataFrame(
            {
                "first_id": [df[id_col].iloc[0]],
                "block_total": [int(df["n_tokens"].sum())],
            }
        )

    seams = slim.map_batches(
        block_summary, batch_size=None, batch_format="pandas"
    ).to_pandas()
    seams = seams.sort_values("first_id", kind="mergesort")
    totals = seams["block_total"].to_numpy(dtype=np.int64)
    bases = np.concatenate([[0], np.cumsum(totals)[:-1]])
    plan = dict(zip(seams["first_id"].tolist(), bases.tolist()))

    def assign(df: pd.DataFrame) -> pd.DataFrame:
        if len(df) == 0:
            return pd.DataFrame(
                {
                    id_col: pd.Series([], dtype=object),
                    "n_tokens": pd.Series([], dtype=np.int64),
                    "tok_offset": pd.Series([], dtype=np.int64),
                    "seq_id": pd.Series([], dtype=np.int64),
                }
            )
        base = plan[df[id_col].iloc[0]]
        n = df["n_tokens"].to_numpy(dtype=np.int64)
        off = base + np.concatenate([[0], np.cumsum(n)[:-1]])
        return pd.DataFrame(
            {
                id_col: df[id_col].to_numpy(),
                "n_tokens": n,
                "tok_offset": off,
                "seq_id": off // seq_len,
            }
        )

    return slim.map_batches(assign, batch_size=None, batch_format="pandas")


def deterministic_shuffle_rank(
    ds: ray.data.Dataset, id_col: str = "doc_id"
) -> ray.data.Dataset:
    """(id, shuffle_rank): a REPRODUCIBLE global shuffle order for training.

    ``ray.data.Dataset.random_shuffle`` gives a different order per run (and
    cannot be oracle-checked); training-data pipelines instead want an order
    that is pseudo-random w.r.t. content/insert order but stable under
    re-runs, resharding and retries. Rank = position under
    ``ORDER BY (md5(id), id)`` — md5 of the id is the repo's deterministic
    split convention (byte-identical in Python and DuckDB), the id
    tiebreaks the (practically impossible) digest collision so the order is
    total.

    Same two-pass prefix shape as :func:`pack_sequences`: distributed sort
    on the hash, one summary row per block to the driver, exclusive scan,
    second streaming pass adds each block's base to an intra-block arange.
    No payload moves — callers join ranks back or feed the slim order
    directly to a reader.
    """
    def hashed(t: pa.Table) -> pa.Table:
        from ..functions.hashing import md5_hex

        # C-backed vectorized digest (DuckDB kernel, cached connection per
        # worker) — byte-identical hex to the per-row hashlib loop it
        # replaced, which was the only Python hot loop feeding this sort
        return pa.table({id_col: t[id_col], "_h": md5_hex(t[id_col])})

    slim = (
        ds.select_columns([id_col])
        .map_batches(hashed, batch_format="pyarrow")
        .sort(["_h", id_col])
        .materialize()
    )

    def block_summary(df: pd.DataFrame) -> pd.DataFrame:
        if len(df) == 0:
            return pd.DataFrame({"first_h": [], "first_id": [], "n": []})
        return pd.DataFrame(
            {
                "first_h": [df["_h"].iloc[0]],
                "first_id": [df[id_col].iloc[0]],
                "n": [len(df)],
            }
        )

    seams = slim.map_batches(
        block_summary, batch_size=None, batch_format="pandas"
    ).to_pandas()
    seams = seams.sort_values(["first_h", "first_id"], kind="mergesort")
    counts = seams["n"].to_numpy(dtype=np.int64)
    bases = np.concatenate([[0], np.cumsum(counts)[:-1]])
    plan = dict(
        zip(zip(seams["first_h"].tolist(), seams["first_id"].tolist()), bases.tolist())
    )

    def assign(df: pd.DataFrame) -> pd.DataFrame:
        if len(df) == 0:
            return pd.DataFrame(
                {
                    id_col: pd.Series([], dtype=object),
                    "shuffle_rank": pd.Series([], dtype=np.int64),
                }
            )
        base = plan[(df["_h"].iloc[0], df[id_col].iloc[0])]
        return pd.DataFrame(
            {
                id_col: df[id_col].to_numpy(),
                "shuffle_rank": base + np.arange(len(df), dtype=np.int64),
            }
        )

    return slim.map_batches(assign, batch_size=None, batch_format="pandas")
