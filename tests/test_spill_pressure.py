"""Memory-pressure survival: pipelines stay correct when the object store is
far smaller than the payload.

The 100-TB design claim is that payload streams block-by-block with
backpressure (and the store SPILLS rather than OOMing when a stage does
buffer). This drives the exact-dedup payload path (read -> drop-filter ->
parquet sink) and the OPH MinHash flagship in a FRESH Ray whose object store
is capped at 80 MiB against a ~3x-larger corpus, then checks the kept set
against DuckDB in the parent process. A fresh process is required — the
session fixture's Ray cannot be re-inited with a different store size.

Reference analogue: the --mem-limit contract (/root/reference/src/main.cpp:136-144)
— bounded memory, unchanged results.
"""

import json
import os
import subprocess
import sys

import duckdb

CORPUS = "/tmp/fdr_spill_corpus"
SPEC = "CorpusSpec(n_base=30000, words_per_doc=(150, 300), seed=7)"

CHILD = f"""
import json, shutil, sys
import ray
import ray.data as rd
ray.init(address="local", num_cpus=8, include_dashboard=False,
         object_store_memory=80 * 1024 * 1024, logging_level="ERROR")
import logging; logging.getLogger("ray.data").setLevel(logging.ERROR)
from ray.data import DataContext
DataContext.get_current().enable_progress_bars = False
from fastq_dupaway_ray.corpus import CorpusSpec, write_pages
from fastq_dupaway_ray.stages.dedup_exact import dedup_exact
from fastq_dupaway_ray.pipelines.dedup import DedupConfig, run_dedup
from fastq_dupaway_ray.functions.sketches import MinHashParams

path = write_pages({CORPUS!r}, {SPEC}, shards=16)
ds = rd.read_parquet(path)
total = ds.count()
# exact dedup with the FULL payload (html included) streamed to a sink
out_dir = "/tmp/fdr_spill_out"
shutil.rmtree(out_dir, ignore_errors=True)
dedup_exact(ds, key_cols=("text",), order_cols=("warc_ts", "url")).write_parquet(out_dir)
kept_exact = rd.read_parquet(out_dir).count()
# OPH flagship under the same cap
m = run_dedup(
    rd.read_parquet(path),
    DedupConfig(mode="minhash", minhash=MinHashParams(scheme="oph"), emit_clusters=False),
).metrics
try:
    spilled = "Spilled" in ray._private.internal_api.memory_summary(stats_only=True)
except Exception:
    spilled = None
print("RESULT " + json.dumps(
    {{"total": total, "kept_exact": kept_exact, "mh": m, "spilled": spilled}}))
ray.shutdown()
"""


def test_pipelines_survive_tiny_object_store():
    env = dict(os.environ, PYTHONPATH="/root/repo")
    proc = subprocess.run(
        [sys.executable, "-c", CHILD], capture_output=True, text=True, timeout=900, env=env
    )
    assert proc.returncode == 0, proc.stderr[-3000:]
    line = [l for l in proc.stdout.splitlines() if l.startswith("RESULT ")][-1]
    res = json.loads(line[len("RESULT "):])

    con = duckdb.connect()
    want_total, want_kept = con.execute(
        f"SELECT count(*), count(DISTINCT text) FROM read_parquet('{CORPUS}/*.parquet')"
    ).fetchone()
    # payload (text+html) is several times the 80 MiB store; the corpus
    # itself must be big enough that the cap is a real constraint
    (payload_bytes,) = con.execute(
        f"SELECT sum(strlen(text) + octet_length(html)) FROM read_parquet('{CORPUS}/*.parquet')"
    ).fetchone()
    assert payload_bytes > 2 * 80 * 1024 * 1024, payload_bytes

    assert res["total"] == want_total
    assert res["kept_exact"] == want_kept  # keep-first over distinct text
    mh = res["mh"]
    assert mh["total"] == want_total
    assert mh["kept"] + mh["duplicates"] == want_total
    # near-dup removes at least the exact duplicates
    assert mh["kept"] <= res["kept_exact"]
