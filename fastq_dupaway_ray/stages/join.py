"""Keyed join between two page datasets (reference --unordered mode, SURVEY.md J1).

Reference semantics (/root/reference/src/hash_dup_remover.hpp:257-347): both
paired inputs are sorted by id tag, then a two-pointer merge keeps ids present
on both sides (inner join) and counts rows without a partner as
``unmatch_reads`` (a counted anti-join residue); matched pairs then flow into
composite-key dedup.

Ray-Data-first: no sort needed — an equality join is a hash partition. Uses
``Dataset.join`` (hash-partitioned) for the inner join; unmatched counts come
from two cheap distinct-key counts instead of materializing the anti-join.
If an id repeats within one side, the first occurrence by order wins (the
reference's streams have unique ids by construction; web crawls do not).
"""

from __future__ import annotations

from dataclasses import dataclass

import pandas as pd
import pyarrow as pa
import ray.data

from ..util import coalesce_schema_blocks, default_join_partitions
from .dedup_exact import DEFAULT_ORDER


@dataclass
class JoinResult:
    pairs: ray.data.Dataset  # one row per matched key: left cols + right cols (suffixed)
    left_total: int
    right_total: int
    matched: int
    unmatched: int  # rows with no partner on the other side, summed over both sides


def _first_per_key(ds: ray.data.Dataset, key: str, order_cols, num_buckets: int = 32) -> ray.data.Dataset:
    """Keep the first row per key by order (vectorized bucketed pass).

    Schema-preserving: ``map_groups`` over pandas batches can hand the UDF an
    empty schema-less frame (observed on ``read_parquet`` inputs), and a
    schema-less empty block downstream breaks the Arrow hash join ("No match
    or multiple matches for key field"). Degenerate frames are replaced by a
    correctly-typed empty table derived from the input schema."""
    schema = ds.schema()
    names = list(schema.names)
    order_cols = [c for c in order_cols if c in names]
    try:
        arrow_schema = pa.schema(
            [pa.field(n, t) for n, t in zip(schema.names, schema.types)]
        )
        empty_df = arrow_schema.empty_table().to_pandas()
    except Exception:
        empty_df = None

    def bucketize(df: pd.DataFrame) -> pd.DataFrame:
        df = df.copy()
        df["_jbucket"] = pd.util.hash_array(df[key].to_numpy(dtype=object)) % num_buckets
        return df

    def first(df: pd.DataFrame) -> pd.DataFrame:
        if len(df) == 0 or key not in df.columns:
            return empty_df if empty_df is not None else df
        if order_cols:
            df = df.sort_values(order_cols, kind="mergesort")
        return df.drop_duplicates(subset=[key], keep="first").drop(columns=["_jbucket"])

    return (
        ds.map_batches(bucketize, batch_format="pandas")
        .groupby("_jbucket")
        .map_groups(first, batch_format="pandas")
    )


def join_unordered(
    left: ray.data.Dataset,
    right: ray.data.Dataset,
    key: str = "url",
    order_cols=DEFAULT_ORDER,
    num_partitions: int | None = None,
) -> JoinResult:
    """Inner join on ``key`` with unmatched accounting (both sides deduped to
    first-occurrence-per-key first, mirroring the reference's unique-id merge)."""
    num_partitions = num_partitions or default_join_partitions()
    # coalesce: map_groups can emit schema-less empty blocks that break the
    # Arrow hash join (reproduced with read_parquet inputs at 32 CPUs)
    l1 = coalesce_schema_blocks(_first_per_key(left, key, order_cols)).materialize()
    r1 = coalesce_schema_blocks(_first_per_key(right, key, order_cols)).materialize()
    lt, rt = l1.count(), r1.count()
    pairs = l1.join(
        r1,
        "inner",
        num_partitions=num_partitions,
        on=(key,),
        left_suffix="_l",
        right_suffix="_r",
    ).materialize()
    matched = pairs.count()
    return JoinResult(
        pairs=pairs,
        left_total=lt,
        right_total=rt,
        matched=matched,
        unmatched=(lt - matched) + (rt - matched),
    )
