"""The flagship pipeline: full web-page near-dedup with checkpoints + metrics.

End-to-end composition (the new-engine lifecycle from SURVEY.md §3):

    read_parquet (pruned columns)
    -> validate + quarantine split
    -> extract(html) + verify per-url byte identity     [invariant]
    -> exact keep-first dedup (hash shuffle)            [reference --fast]
    -> MinHash/LSH near-dup edges (actor pools, verify) [north rule]
    -> connected components -> representative selection
    -> kept pages + clusters + metrics manifest

Optionally checkpointed per stage under a root dir (state.checkpoint):
re-running with the same inputs resumes after the last complete stage.
"""

from __future__ import annotations

import json
import os

import ray.data

from ..functions.sketches import MinHashParams
from ..sources.pages import read_pages, split_quarantine
from ..stages import components as _comp
from ..stages import minhash as _mh
from ..stages import representative as _rep
from ..stages.dedup_exact import dedup_exact
from ..state.checkpoint import checkpoint, fingerprint, input_identity


def run_flagship(
    pages_path: str,
    out_dir: str | None = None,
    ckpt_root: str | None = None,
    params: MinHashParams = MinHashParams(),
    threshold: float | None = None,
    signer_concurrency=None,
    verify: bool = True,
):
    """Returns (kept: Dataset, clusters: Dataset, metrics: dict).

    metrics includes ``stage_seconds`` — wall time per materialized stage —
    the --verbose counter surface (A7) extended with the timing breakdown a
    cluster operator reads first."""
    import time as _time

    metrics: dict = {"input": pages_path, "stage_seconds": {}}
    _t = _time.time()

    def _mark(stage: str):
        nonlocal _t
        now = _time.time()
        metrics["stage_seconds"][stage] = round(now - _t, 3)
        _t = now

    ds = read_pages(pages_path)
    # parquet metadata count — no data read
    total = ds.count()
    good, _bad = split_quarantine(ds)
    # ONE pass over the input: materializing `good` makes its count (and the
    # quarantine count, as total - valid) metadata-free. Counting `bad` and
    # `good` separately re-executed the whole read+validate pipeline twice,
    # and the exact-dedup consume re-read it a third time — a fixed cost that
    # grows with input size and caps scaling efficiency.
    good = good.materialize()
    metrics["valid"] = good.count()
    metrics["quarantined"] = total - metrics["valid"]
    _mark("read_validate")

    # fold the input's content identity (file sizes + mtimes), not just its
    # path — re-running after the inputs change in place must NOT reuse the
    # stale 'exact' checkpoint and everything chained from it
    fp0 = fingerprint("exact", pages_path, input_identity(pages_path))
    exact = dedup_exact(good)
    if ckpt_root:
        exact = checkpoint(exact, ckpt_root, "exact", fp0)
    else:
        exact = exact.materialize()
    metrics["after_exact"] = exact.count()
    _mark("exact_dedup")

    # fingerprints chain: editing params/threshold invalidates downstream
    fp1 = fingerprint("edges", fp0, params, threshold, verify)
    edges = _mh.dedup_edges_minhash(
        exact,
        params=params,
        verify=verify,
        threshold=threshold,
        signer_concurrency=signer_concurrency,
    )
    if ckpt_root:
        edges = checkpoint(edges, ckpt_root, "edges", fp1)
    else:
        edges = edges.materialize()
    metrics["candidate_edges"] = edges.count()
    _mark("minhash_edges")

    fp2 = fingerprint("labels", fp1)
    labels = _comp.connected_components(edges)
    if ckpt_root:
        labels = checkpoint(labels, ckpt_root, "labels", fp2)
    else:
        labels = labels.materialize()
    _mark("components")
    kept, clusters = _rep.apply_cluster_labels(exact, labels)
    kept = kept.materialize()
    clusters = clusters.materialize()
    metrics["kept"] = kept.count()
    _mark("representative")
    metrics["near_dup_removed"] = metrics["after_exact"] - metrics["kept"]
    metrics["exact_dup_removed"] = metrics["valid"] - metrics["after_exact"]

    if out_dir:
        # final sinks go through the same manifest machinery as stage
        # checkpoints: per-partition row counts, atomic rename, and
        # skip-if-complete on re-run (resumable output, north rule)
        fp3 = fingerprint("kept", fp2)
        kept = checkpoint(kept, out_dir, "kept", fp3)
        clusters = checkpoint(clusters, out_dir, "clusters", fingerprint("clusters", fp3))
        with open(os.path.join(out_dir, "metrics.json"), "w") as f:
            json.dump(metrics, f, indent=1)
    return kept, clusters, metrics
