"""The task hash exchange (stages/minhash._hash_exchange_tasks): fan-out
sizing under simulated cluster widths and key-exactness at every width."""

import numpy as np
import pandas as pd
import pyarrow as pa
import pytest
import ray.data as rd

from fastq_dupaway_ray.stages.minhash import (
    _EXCHANGE_BYTES_PER_REDUCER,
    _EXCHANGE_ROWS_PER_REDUCER,
    _exchange_fanout,
    _hash_exchange_tasks,
)


def test_fanout_rows_floor():
    # tiny exchange collapses to one reducer regardless of cluster width
    for cap in (8, 32, 128, 1024):
        assert _exchange_fanout(cap, rows=500, size_bytes=8_000) == 1
    # row-bound exchange: 1M slim rows -> rows floor, capped by b_cap
    rows = 1_000_000
    want = rows // _EXCHANGE_ROWS_PER_REDUCER
    assert _exchange_fanout(10_000, rows, rows * 16) == want
    assert _exchange_fanout(64, rows, rows * 16) == 64  # cap binds


def test_fanout_bytes_floor_wide_rows():
    """KB-scale payload rows: bytes must size the exchange where the row
    count alone would under-provision reducers."""
    rows = 100_000
    size = rows * 2_048  # 2 KB/row payload shuffle ~ 200 MB
    by_rows = rows // _EXCHANGE_ROWS_PER_REDUCER
    by_bytes = size // _EXCHANGE_BYTES_PER_REDUCER
    assert by_bytes > by_rows  # the scenario this floor exists for
    assert _exchange_fanout(1_024, rows, size) == by_bytes


def test_fanout_unknown_rows_keeps_cap():
    assert _exchange_fanout(96, rows=0, size_bytes=0, rows_known=False) == 96


@pytest.mark.parametrize("b_cap", [8, 64, 512])  # ~2, 16, 128-node clusters
def test_exchange_key_exact_at_simulated_cluster_widths(ray_session, b_cap):
    """Whatever the configured bucket cap (which scales with cluster CPUs),
    every key lands in EXACTLY one reducer and nothing is lost/duplicated."""
    rng = np.random.default_rng(b_cap)
    df = pd.DataFrame(
        {
            "_k": rng.integers(0, 1_000, size=20_000).astype(np.uint64),
            "val": np.arange(20_000, dtype=np.int64),
        }
    )
    ds = rd.from_pandas(df).repartition(7)

    def bucket_fn(t: pa.Table | None) -> pa.Table:
        if t is None or t.num_rows == 0:
            return pa.table(
                {"_k": pa.array([], pa.uint64()), "n": pa.array([], pa.int64()),
                 "sum_val": pa.array([], pa.int64())}
            )
        agg = pa.TableGroupBy(t, "_k").aggregate([("val", "count"), ("val", "sum")])
        return agg.rename_columns(["_k", "n", "sum_val"])

    out = _hash_exchange_tasks(ds, "_k", b_cap, bucket_fn).to_pandas()
    # exactly one output row per key (a key split across reducers would
    # produce duplicate rows here), with exact counts and sums
    exp = df.groupby("_k", as_index=False).agg(n=("val", "size"), sum_val=("val", "sum"))
    got = out.sort_values("_k").reset_index(drop=True)
    exp = exp.sort_values("_k").reset_index(drop=True)
    pd.testing.assert_frame_equal(
        got.astype({"_k": "uint64", "n": "int64", "sum_val": "int64"}),
        exp.astype({"_k": "uint64", "n": "int64", "sum_val": "int64"}),
    )
