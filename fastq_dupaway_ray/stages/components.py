"""Connected components over candidate edges -> cluster labels (SURVEY.md A6).

The reference's duplicate clusters are transitive chains discovered by its
serial scan (/root/reference/src/seq_dup_remover.hpp:75-101); at web scale the
near-dup candidate relation is an edge list and clusters are connected
components. Two implementations:

* ``connected_components_local`` — driver-side union-find. Correct and fast
  when the edge list is small (it is the *duplicate* relation, typically a few
  % of the corpus); used as the default below a configurable edge budget and
  as the test oracle.
* ``connected_components`` — distributed iterated min-label propagation
  (each round: every node takes the min label over itself and its neighbors;
  converges in <= diameter rounds, and dup clusters from star edges have
  diameter <= 2·bands). Rounds are hash-partitioned groupby-min over a slim
  (node, label) table — no full-graph materialization on any single worker.
  This is the 10^12-doc path (cf. BTS, ICDE 2024, for the load-balanced
  evolution of the same idea).

Node ids are uint64 content hashes of the row id (url); labels are the
component-min node id. Collision probability at n=10^12 is ~n^2/2^64 — for
the sandbox it is negligible; the production note is to widen to 128-bit.
"""

from __future__ import annotations

import numpy as np
import pandas as pd
import ray.data

from ..functions.hashing import hash64
from ..util import default_join_partitions


def connected_components_local(edge_pairs) -> dict:
    """Union-find over an iterable of (a, b) pairs -> {id: min_id_label}."""
    from ..refmodel import union_find_components

    return union_find_components(edge_pairs)


def _edges_to_pandas(edges: ray.data.Dataset):
    df = edges.to_pandas()
    return list(zip(df["a"], df["b"]))


def connected_components(
    edges: ray.data.Dataset,
    max_rounds: int = 12,
    local_edge_budget: int = 2_000_000,
) -> ray.data.Dataset:
    """Edges (a, b) -> labels dataset (node, label), both the original id type.

    Dispatches: if the edge list fits ``local_edge_budget`` it is collected and
    solved with union-find on the driver (a deliberate small-side shortcut, the
    same judgment call as broadcasting a dimension table); otherwise runs
    distributed min-label propagation.
    """
    n_edges = edges.count()
    if n_edges == 0:
        empty = pd.DataFrame({"node": pd.Series([], dtype=object), "label": pd.Series([], dtype=object)})
        return ray.data.from_pandas(empty)
    if n_edges <= local_edge_budget:
        comp = connected_components_local(_edges_to_pandas(edges))
        items = pd.DataFrame({"node": list(comp.keys()), "label": list(comp.values())})
        return ray.data.from_pandas(items)
    return _connected_components_distributed(edges, max_rounds=max_rounds)


def _connected_components_distributed(edges: ray.data.Dataset, max_rounds: int) -> ray.data.Dataset:
    """Min-label propagation with per-round convergence check.

    labels: (node, label). Round: for each edge (u,v) propose label(v) to u and
    label(u) to v; labels = groupby(node).min(proposals ∪ current).
    Convergence: the global sum of labels is strictly decreasing; stop when it
    stops changing. Every round shuffles only the slim (node,label) pairs.
    """
    from ray.data.aggregate import Min, Sum

    def explode(df: pd.DataFrame) -> pd.DataFrame:
        return pd.DataFrame(
            {
                "node": np.concatenate([df["a"].to_numpy(), df["b"].to_numpy()]),
                "peer": np.concatenate([df["b"].to_numpy(), df["a"].to_numpy()]),
            }
        )

    bi = edges.map_batches(explode, batch_format="pandas").materialize()
    # initial label = min(self, neighbors)
    labels = (
        bi.map_batches(
            lambda df: pd.DataFrame(
                {"node": df["node"], "label": np.minimum(df["node"].to_numpy(), df["peer"].to_numpy())}
            ),
            batch_format="pandas",
        )
        .groupby("node")
        .aggregate(Min("label", alias_name="label"))
        .materialize()
    )

    prev_sum = None
    for _ in range(max_rounds):
        # proposals: each edge endpoint offers its current label to its peer
        prop = bi.join(
            labels,
            "inner",
            num_partitions=default_join_partitions(),
            on=("node",),
            right_on=("node",),
        )
        prop = prop.map_batches(
            lambda df: pd.DataFrame({"node": df["peer"], "label": df["label"]}),
            batch_format="pandas",
        )
        labels = (
            labels.union(prop).groupby("node").aggregate(Min("label", alias_name="label")).materialize()
        )
        s = labels.aggregate(Sum("label"))["sum(label)"]
        if prev_sum is not None and s == prev_sum:
            break
        prev_sum = s
    return labels
