"""Composed training-data curation pipeline over a documents table.

The canonical LLM-corpus pass this engine exists for, assembled from the
stage library (each stage individually oracle-checked by the driver):

    read (pruned columns)
    -> quality filter          (functions.textstats: token/digit thresholds)
    -> language filter         (allowlist)
    -> exact dedup             (stages.dedup_exact: slim identity, keep-first)
    -> MinHash near-dedup      (stages.minhash -> components -> representative)
    -> token accounting        (metrics: docs/tokens surviving each stage)

Everything streams; the only driver-side values are the per-stage counters
(the reference's --verbose summary generalized, A7)."""

from __future__ import annotations

import pyarrow as pa
import pyarrow.compute as pc
import ray.data

from ..functions.sketches import MinHashParams
from ..functions.textstats import quality_features
from ..stages import components as _comp
from ..stages import minhash as _mh
from ..stages import representative as _rep
from ..stages.dedup_exact import dedup_exact


def quality_language_filter(
    ds: ray.data.Dataset,
    min_tokens: int = 5,
    max_digit_ratio: float = 0.2,
    langs: tuple = ("en", "de", "fr", "es"),
) -> ray.data.Dataset:
    langs_set = set(langs)

    def f(t: pa.Table) -> pa.Table:
        if "n_chars" in t.column_names:  # quality_features recomputes it
            t = t.drop_columns(["n_chars"])
        q = quality_features(t)
        mask = pc.and_(
            pc.and_(
                pc.greater_equal(q["n_tokens"], min_tokens),
                pc.less(q["digit_ratio"], max_digit_ratio),
            ),
            pc.is_in(q["lang"], value_set=pa.array(sorted(langs_set))),
        )
        return q.filter(mask)

    return ds.map_batches(f, batch_format="pyarrow")


def run_training_data(
    ds: ray.data.Dataset,
    id_col: str = "doc_id",
    text_col: str = "text",
    min_tokens: int = 5,
    max_digit_ratio: float = 0.2,
    langs: tuple = ("en", "de", "fr", "es"),
    params: MinHashParams = MinHashParams(),
    near_dedup: bool = True,
):
    """Returns (kept: Dataset, metrics: dict)."""
    metrics = {"input": ds.count()}
    filtered = quality_language_filter(ds, min_tokens, max_digit_ratio, langs)
    exact = dedup_exact(filtered, key_cols=(text_col,), order_cols=(id_col,)).materialize()
    metrics["after_filter_and_exact"] = exact.count()
    kept = exact
    if near_dedup:
        vout: dict = {}
        edges = _mh.dedup_edges_minhash(
            exact, params=params, id_col=id_col, text_col=text_col,
            order_cols=(id_col,), out=vout, emit="numeric",
        ).materialize()
        labels = _comp.connected_components(edges)
        kept, _clusters = _rep.apply_cluster_labels(
            exact, labels, id_col=id_col, order_cols=(id_col,),
            member_attrs=(
                (vout["index_shards"], vout["attr_cols"])
                if "index_shards" in vout
                else None
            ),
        )
        kept = kept.materialize()
        metrics["near_dup_edges"] = edges.count()
    metrics["kept"] = kept.count()
    metrics["total_tokens_kept"] = int(
        kept.map_batches(
            lambda t: pa.table({"n": t["n_tokens"]}), batch_format="pyarrow"
        ).sum("n")
        or 0
    )
    return kept, metrics
