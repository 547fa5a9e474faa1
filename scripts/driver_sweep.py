"""Driver-style correctness sweep: every ``queries()`` entry vs ``oracle_sql()``.

Mirrors the graft driver's gate: register the sf parquet tables as DuckDB
views, run each Ray query and its SQL oracle, then compare row count, schema
(sorted column names) and a value hash (columns sorted by name, rows sorted by
all columns, floats rounded). Queries with no oracle are reported rows-only.

Run:  PYTHONPATH=/root/repo python /root/repo/scripts/driver_sweep.py [sf_dir]
"""

from __future__ import annotations

import hashlib
import json
import os
import sys

TABLES = (
    "region nation customer supplier part orders lineitem events documents embeddings"
).split()


def _canon(df):
    import pandas as pd

    df = df[sorted(df.columns)].copy()
    for c in df.columns:
        if df[c].dtype.kind == "f":
            df[c] = df[c].round(6)
        elif df[c].dtype == object or str(df[c].dtype).startswith("string"):
            df[c] = df[c].astype(str)
        elif str(df[c].dtype).startswith("datetime"):
            df[c] = df[c].astype("datetime64[us]").astype(str)
        elif df[c].dtype.kind in "iu":
            df[c] = df[c].astype("int64")
        elif isinstance(df[c].dtype, pd.CategoricalDtype):
            df[c] = df[c].astype(str)
    df = df.sort_values(list(df.columns), kind="mergesort").reset_index(drop=True)
    return df


def _hash(df) -> str:
    csv = df.to_csv(index=False).encode()
    return hashlib.sha256(csv).hexdigest()[:16]


def _to_pandas(result):
    import pandas as pd
    import pyarrow as pa

    if isinstance(result, pd.DataFrame):
        return result
    if isinstance(result, pa.Table):
        return result.to_pandas()
    return result.to_pandas()  # ray Dataset


def main() -> int:
    sf_dir = sys.argv[1] if len(sys.argv) > 1 else "/root/testdata/sf0.01"
    import logging

    import duckdb
    import ray

    ray.init(
        address="local",
        num_cpus=int(os.environ.get("RAY_GRAFT_CPUS", "16")),
        include_dashboard=False,
        ignore_reinit_error=True,
        logging_level="ERROR",
    )
    logging.getLogger("ray.data").setLevel(logging.ERROR)
    from ray.data import DataContext

    DataContext.get_current().enable_progress_bars = False

    sys.path.insert(0, "/root/repo")
    import __ray_entry__ as entrymod

    con = duckdb.connect()
    for t in TABLES:
        path = os.path.join(sf_dir, f"{t}.parquet")
        if os.path.exists(path):
            con.execute(f"CREATE VIEW {t} AS SELECT * FROM read_parquet('{path}')")

    queries = entrymod.queries()
    oracles = entrymod.oracle_sql()
    results: dict[str, dict] = {}
    n_match = n_rows_only = n_fail = 0
    for name, fn in queries.items():
        rec: dict = {}
        try:
            ray_df = _canon(_to_pandas(fn(sf_dir)))
            rec["spark_rows"] = len(ray_df)
            sql = oracles.get(name)
            if sql is None:
                rec["err"] = "no_oracle"
                n_rows_only += 1
            else:
                ora_df = _canon(con.execute(sql).df())
                rec["oracle_rows"] = len(ora_df)
                rec["rows_match"] = len(ray_df) == len(ora_df)
                rec["schema_match"] = list(ray_df.columns) == list(ora_df.columns)
                rec["hash_match"] = (
                    rec["rows_match"]
                    and rec["schema_match"]
                    and _hash(ray_df) == _hash(ora_df)
                )
                if rec["hash_match"]:
                    n_match += 1
                else:
                    n_fail += 1
                    if not rec["schema_match"]:
                        rec["ray_cols"] = list(ray_df.columns)
                        rec["ora_cols"] = list(ora_df.columns)
        except Exception as e:  # noqa: BLE001 — sweep must report every query
            rec["err"] = f"{type(e).__name__}: {e}"[:300]
            n_fail += 1
        results[name] = rec
        status = (
            "MATCH"
            if rec.get("hash_match")
            else ("rows-only" if rec.get("err") == "no_oracle" else "FAIL")
        )
        print(f"{status:9s} {name}  rows={rec.get('spark_rows')}", flush=True)

    print(
        json.dumps(
            {"match": n_match, "rows_only": n_rows_only, "fail": n_fail, "total": len(queries)}
        )
    )
    with open("/tmp/sweep_results.json", "w") as f:
        json.dump(results, f, indent=1)
    ray.shutdown()
    return 1 if n_fail else 0


if __name__ == "__main__":
    raise SystemExit(main())
