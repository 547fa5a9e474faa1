"""Mirror of the driver's correctness gate: every queries() entry vs its
DuckDB oracle at sf0.001 (fast), value-compared order-insensitively."""

import duckdb
import numpy as np
import pandas as pd
import pytest

SF = "/root/testdata/sf0.001"
TABLES = [
    "region", "nation", "customer", "supplier", "part",
    "orders", "lineitem", "events", "documents", "embeddings",
]


@pytest.fixture(scope="module")
def con():
    c = duckdb.connect()
    for t in TABLES:
        c.execute(f"CREATE VIEW {t} AS SELECT * FROM read_parquet('{SF}/{t}.parquet')")
    return c


def _to_pandas(obj):
    import pyarrow as pa
    import ray.data

    if isinstance(obj, ray.data.Dataset):
        return obj.to_pandas()
    if isinstance(obj, pa.Table):
        return obj.to_pandas()
    return obj


def _canon(df: pd.DataFrame) -> pd.DataFrame:
    df = df[sorted(df.columns)].copy()
    for c in df.columns:
        if pd.api.types.is_float_dtype(df[c]):
            df[c] = df[c].round(9)
        if pd.api.types.is_bool_dtype(df[c]):
            df[c] = df[c].astype(int)
        if pd.api.types.is_integer_dtype(df[c]):
            df[c] = df[c].astype("int64")
        if pd.api.types.is_datetime64_any_dtype(df[c]):
            df[c] = df[c].astype("datetime64[us]")
    return df.sort_values(list(df.columns), kind="mergesort").reset_index(drop=True)


def _oracle_names():
    from fastq_dupaway_ray.queries import REGISTRY

    return [name for name, (_f, sql) in REGISTRY.items() if sql is not None]


def _rows_only_names():
    from fastq_dupaway_ray.queries import REGISTRY

    return [name for name, (_f, sql) in REGISTRY.items() if sql is None]


@pytest.mark.parametrize("name", _oracle_names())
def test_query_matches_oracle(ray_session, con, name):
    from fastq_dupaway_ray.queries import REGISTRY

    fn, sql = REGISTRY[name]
    mine = _canon(_to_pandas(fn(SF)))
    oracle = _canon(con.execute(sql).fetchdf())
    assert list(mine.columns) == list(oracle.columns), (mine.columns, oracle.columns)
    assert len(mine) == len(oracle)
    pd.testing.assert_frame_equal(mine, oracle, check_dtype=False, check_exact=False, rtol=1e-6)


def test_no_rows_only_queries_remain():
    # every REGISTRY query carries a DuckDB oracle; a None SQL would silently
    # downgrade that query to the driver's weaker rows-only check
    assert _rows_only_names() == []


def test_entry_contract(ray_session):
    import __ray_entry__ as e

    res = e.entry()
    df = _to_pandas(res)
    assert len(df) >= 0
    assert set(e.oracle_sql()) <= set(e.queries())
