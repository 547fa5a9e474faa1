"""The flagship pipeline: full web-page near-dedup with checkpoints + metrics.

End-to-end composition (the new-engine lifecycle from SURVEY.md §3), fused
for web scale — the corpus payload NEVER enters the object store between
stages and the heavy html column is never decoded until the final sink:

    read (url, warc_ts, text only)
    -> validate (quarantine counted, not aborted)          [invariant]
    -> slim 128-bit content identity -> exact drop ids     [reference --fast]
    -> numeric MinHash/LSH near-dup edges + verify         [north rule]
    -> connected components -> representative selection
    -> kept pages (lazy full-column filter chain) + clusters + metrics

Every intermediate artifact is SLIM (drop ids, candidate edges, labels);
kept-row counts are derived arithmetically from the drop-set sizes, so the
pipeline never runs a pure-count pass over the payload. The filtered
full-column dataset materializes exactly once — in the output sink, if the
caller asks for one.

Optionally checkpointed per stage under a root dir (state.checkpoint):
re-running with the same inputs resumes after the last complete slim stage
(drops / edges / labels) and replays only the streaming filter passes, which
read from the durable input anyway.
"""

from __future__ import annotations

import json
import os

import ray
import ray.data

from ..functions.sketches import MinHashParams
from ..sources.pages import read_pages, split_quarantine
from ..stages import components as _comp
from ..stages import minhash as _mh
from ..stages import representative as _rep
from ..stages.dedup_exact import exact_drop_ids
from ..state.checkpoint import (
    checkpoint,
    fingerprint,
    input_identity,
    is_complete,
    read_manifest,
)

SLIM_COLS = ["url", "warc_ts", "text"]


def _drop_filter_fn(drops_ds):
    """Broadcast drop-id filter: sorted 128-bit id-hash membership, applied
    as a streaming Arrow pass (the payload is filtered, never shuffled)."""
    import numpy as np
    import pyarrow as pa

    from ..stages.minhash import (
        _fetch_cached,
        _id_hash_pair,
        _id_hash_pair_arrow,
        _id_member_mask_pre,
    )

    tabs = [t for t in ray.get(drops_ds.to_arrow_refs()) if t.num_rows]
    if not tabs:
        return None
    arr = pa.concat_tables(tabs)["url"]
    dh1, dh2 = _id_hash_pair_arrow(arr)
    order = np.argsort(dh1, kind="stable")
    ref = ray.put((dh1[order], dh2[order]))

    def drop_filter(t: pa.Table) -> pa.Table:
        index = _fetch_cached(ref)
        ids = t["url"].to_numpy(zero_copy_only=False).astype(object)
        q1, q2 = _id_hash_pair(ids)
        mask = _id_member_mask_pre(index, q1, q2)
        return t.filter(pa.array(~mask))

    return drop_filter


def run_flagship(
    pages_path: str,
    out_dir: str | None = None,
    ckpt_root: str | None = None,
    params: MinHashParams = MinHashParams(),
    threshold: float | None = None,
    signer_concurrency=None,
    verify: bool = True,
):
    """Returns (kept: Dataset [lazy], clusters: Dataset, metrics: dict).

    metrics includes ``stage_seconds`` — wall time per executed stage —
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

    # slim read: the identity/signing passes only need (url, warc_ts, text);
    # html stays in storage until the final sink (prune at the read)
    slim = read_pages(pages_path, columns=SLIM_COLS)
    total = slim.count()  # parquet metadata count — no data read
    good_slim, _bad = split_quarantine(slim)

    # ---- exact keep-first dedup (reference --fast), slim drop-id form ----
    # fold the input's content identity (file sizes + mtimes), not just its
    # path — re-running after the inputs change in place must NOT reuse the
    # stale checkpoint and everything chained from it
    fp0 = fingerprint("exact-drops", pages_path, input_identity(pages_path))
    if ckpt_root and is_complete(os.path.join(ckpt_root, "exact"), fp0):
        man = read_manifest(ckpt_root, "exact")
        drops = ray.data.read_parquet(
            os.path.join(ckpt_root, "exact"), file_extensions=["parquet"]
        )
        n_drops = man["rows"]
        metrics["valid"] = man["extra"]["n_valid"]
    else:
        ctr: dict = {}
        drops = exact_drop_ids(good_slim, counters=ctr).materialize()
        n_drops = drops.count()
        metrics["valid"] = ctr["n_input"]
        if ckpt_root:
            drops = checkpoint(
                drops, ckpt_root, "exact", fp0, extra={"n_valid": metrics["valid"]}
            )
    metrics["quarantined"] = total - metrics["valid"]
    metrics["after_exact"] = metrics["valid"] - n_drops
    drop_filter = _drop_filter_fn(drops)
    exact_slim = (
        good_slim.map_batches(drop_filter, batch_format="pyarrow")
        if drop_filter is not None
        else good_slim
    )
    _mark("exact_dedup")

    # ---- near-dup candidate edges (numeric spine) + verify ----
    # fingerprints chain: editing params/threshold invalidates downstream
    fp1 = fingerprint("edges", fp0, params, threshold, verify)
    vout: dict = {}
    if ckpt_root and is_complete(os.path.join(ckpt_root, "edges"), fp1):
        edges = ray.data.read_parquet(
            os.path.join(ckpt_root, "edges"), file_extensions=["parquet"]
        )
    else:
        edges = _mh.dedup_edges_minhash(
            exact_slim,
            params=params,
            verify=verify,
            threshold=threshold,
            signer_concurrency=signer_concurrency,
            out=vout,
            # numeric spine end-to-end: ids stay 128-bit hash pairs through
            # components; strings materialize once in apply_cluster_labels
            emit="numeric" if verify else "ids",
        )
        if ckpt_root:
            edges = checkpoint(edges, ckpt_root, "edges", fp1)
        else:
            edges = edges.materialize()
    if "ah1" in edges.schema().names and "index_shards" not in vout:
        # checkpoint-resumed numeric edges: rebuild the endpoint index (one
        # corpus scan — cheap next to the skipped sign/LSH/verify stages) so
        # the representative stage can materialize member ids
        shard_refs, text_refs, attrs_present = _mh.build_endpoint_index(
            edges.materialize(), exact_slim, attr_cols=("warc_ts", "url")
        )
        if shard_refs:
            vout["index_shards"] = shard_refs
            vout["attr_cols"] = attrs_present
    metrics["candidate_edges"] = edges.count()
    _mark("minhash_edges")

    fp2 = fingerprint("labels", fp1)
    labels = _comp.connected_components(edges)
    if ckpt_root:
        labels = checkpoint(labels, ckpt_root, "labels", fp2)
    else:
        labels = labels.materialize()
    _mark("components")

    # representative pick over the SLIM filtered projection; the keep-filter
    # applies to the lazy FULL-column chain (html decoded only when consumed)
    full_good, _ = split_quarantine(read_pages(pages_path))
    exact_full = (
        full_good.map_batches(drop_filter, batch_format="pyarrow")
        if drop_filter is not None
        else full_good
    )
    rctr: dict = {}
    kept, clusters = _rep.apply_cluster_labels(
        exact_slim,
        labels,
        payload=exact_full,
        counters=rctr,
        # verify's endpoint index carries the member order values — skips the
        # attach corpus pass (absent on checkpoint-resumed edge lists)
        member_attrs=(
            (vout["index_shards"], vout["attr_cols"]) if "index_shards" in vout else None
        ),
    )
    clusters = clusters.materialize()
    metrics["kept"] = metrics["after_exact"] - rctr["near_drops"]
    _mark("representative")
    metrics["near_dup_removed"] = rctr["near_drops"]
    metrics["exact_dup_removed"] = n_drops

    if out_dir:
        # final sinks go through the same manifest machinery as stage
        # checkpoints: per-partition row counts, atomic rename, and
        # skip-if-complete on re-run (resumable output, north rule) — this is
        # the ONE pass that reads the full-column payload
        fp3 = fingerprint("kept", fp2)
        kept = checkpoint(kept, out_dir, "kept", fp3)
        clusters = checkpoint(clusters, out_dir, "clusters", fingerprint("clusters", fp3))
        with open(os.path.join(out_dir, "metrics.json"), "w") as f:
            json.dump(metrics, f, indent=1)
    return kept, clusters, metrics
