"""Deterministic stratified sampling — the data-mixing primitive.

Training mixes specify a different sampling rate per stratum (language,
source, quality band): "keep 50% of en, 20% of de, 10% of the rest".
``ray.data.Dataset.random_shuffle``-style sampling is nondeterministic per
run; training pipelines need a sample that is stable under re-runs,
resharding and retries, and that composes with the repo's split convention.

Rule: keep a row iff the first 8 hex chars of ``md5(str(id))`` are below
the stratum's threshold ``format(int(frac * 2**32), "08x")`` — the same
content-independent id-hash discipline as ``train_split`` /
``deterministic_shuffle_rank`` (byte-identical in Python and DuckDB), so
every rate is honored to ~2^-32 resolution and a row's fate never depends
on partitioning. One streaming ``map_batches`` pass, zero shuffles; the
digest is the C-backed vectorized ``md5_hex`` kernel.

Generalizes the reference's deterministic keep-first discipline
(/root/reference/src/hash_dup_remover.hpp:130-138) from dedup to rate
control.
"""

from __future__ import annotations

import pyarrow as pa
import pyarrow.compute as pc
import ray.data


def fraction_threshold_hex(frac: float) -> str:
    """The 8-hex-char threshold encoding a keep fraction. frac=1 keeps all:
    the sentinel "g" compares LEXICOGRAPHICALLY above every hex digit (a
    longer numeric string like "100000000" would not — '1' < 'f')."""
    if not 0.0 <= frac <= 1.0:
        raise ValueError(f"sampling fraction must be in [0, 1], got {frac}")
    v = int(frac * (1 << 32))
    return "g" if v >= (1 << 32) else format(v, "08x")


def stratified_sample(
    ds: ray.data.Dataset,
    strata_col: str,
    fractions: dict,
    default: float = 0.0,
    id_col: str = "doc_id",
) -> ray.data.Dataset:
    """Keep each stratum's rows at its configured rate, deterministically.

    ``fractions`` maps stratum value -> keep fraction; strata not listed use
    ``default``. The decision is ``md5(str(id))[:8] < threshold(stratum)``,
    so the same row always gets the same verdict — across runs, shard
    layouts, and engines (the SQL form is a CASE over the same constants).
    """
    thresholds = {k: fraction_threshold_hex(v) for k, v in fractions.items()}
    default_thr = fraction_threshold_hex(default)

    def keep(t: pa.Table) -> pa.Table:
        import numpy as np
        import pandas as pd

        from ..functions.hashing import md5_hex

        h8 = pc.utf8_slice_codeunits(md5_hex(t[id_col]), 0, 8)
        # per-UNIQUE-stratum lookup, not per row: factorize the column and
        # gather thresholds through the (few) codes
        strata = t[strata_col].to_numpy(zero_copy_only=False)
        codes, uniques = pd.factorize(strata)
        thr_by_code = np.array(
            [thresholds.get(u, default_thr) for u in uniques], dtype=object
        )
        # factorize codes nulls as -1; null strata take the default rate.
        # Assign (not np.where) so an all-null batch — empty ``uniques``,
        # every code -1 — never indexes the empty thr_by_code array
        thr = np.full(len(codes), default_thr, dtype=object)
        known = codes >= 0
        if known.any():
            thr[known] = thr_by_code[codes[known]]
        return t.filter(pc.less(h8, pa.array(thr, pa.string())))

    return ds.map_batches(keep, batch_format="pyarrow")


def stratified_sample_sql_case(
    strata_col: str, fractions: dict, default: float, id_col: str = "doc_id"
) -> str:
    """The WHERE predicate equivalent to :func:`stratified_sample` — built
    from the SAME threshold constants, for oracle parity."""
    cases = " ".join(
        f"WHEN '{k}' THEN '{fraction_threshold_hex(v)}'" for k, v in fractions.items()
    )
    return (
        f"substr(md5({id_col}::VARCHAR), 1, 8) < "
        f"CASE {strata_col} {cases} ELSE '{fraction_threshold_hex(default)}' END"
    )
