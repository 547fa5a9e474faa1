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

Nodes are the original row ids (any orderable type — url strings, doc ids);
labels are the component-minimum node id, so downstream representative
selection needs no extra mapping.
"""

from __future__ import annotations

import numpy as np
import pandas as pd
import ray.data



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
    """Join-free min-label propagation with exact convergence detection.

    State: labels(node, label). Per round, two bucket shuffles of slim tables
    (the same two-level groupby pattern as every other stage — NO
    ``Dataset.join``, which pins aggregator actors and risks plan deadlock):

    1. adjacency ∪ labels co-partitioned by hash(node) -> per-bucket pandas
       merge emits proposals (peer, label) and passes the label rows through;
    2. proposals ∪ labels co-partitioned by hash(node) -> per-bucket min per
       node, flagging nodes whose label shrank.

    Pointer doubling: the current label links (u <-> label(u)) are fed back
    into the adjacency each round, so a node also learns label(label(u)) —
    reach doubles per round and convergence is O(log diameter) instead of
    O(diameter) (the HashMin-with-shortcutting formulation; cf. the
    large-star/small-star family). Stops when no label changed (exact —
    works for any orderable id type).
    """

    def explode(df: pd.DataFrame) -> pd.DataFrame:
        out = pd.DataFrame(
            {
                "node": np.concatenate([df["a"].to_numpy(), df["b"].to_numpy()]),
                "peer": np.concatenate([df["b"].to_numpy(), df["a"].to_numpy()]),
            }
        )
        out["_bkt"] = pd.util.hash_array(out["node"].to_numpy()) % _B()
        return out

    def _B() -> int:
        from .minhash import _default_shuffle_buckets

        return _default_shuffle_buckets()

    bi = edges.map_batches(explode, batch_format="pandas").materialize()

    def init_labels(df: pd.DataFrame) -> pd.DataFrame:
        g = df.groupby("node")["peer"].min()
        lab = np.minimum(g.index.to_numpy(), g.to_numpy())
        return pd.DataFrame({"node": g.index.to_numpy(), "label": lab})

    labels = bi.groupby("_bkt").map_groups(init_labels, batch_format="pandas").materialize()

    for _ in range(max_rounds):
        # identical schemas (node, peer, label, _bkt, _is_lab) so union is valid
        lab_tagged = labels.map_batches(
            lambda df: pd.DataFrame(
                {
                    "node": df["node"],
                    "peer": df["node"],  # placeholder, ignored for label rows
                    "label": df["label"],
                    "_bkt": pd.util.hash_array(df["node"].to_numpy()) % _B(),
                    "_is_lab": True,
                }
            ),
            batch_format="pandas",
        )
        adj_tagged = bi.map_batches(
            lambda df: pd.DataFrame(
                {
                    "node": df["node"],
                    "peer": df["peer"],
                    "label": df["node"],  # placeholder, ignored for adj rows
                    "_bkt": df["_bkt"],
                    "_is_lab": False,
                }
            ),
            batch_format="pandas",
        )

        def label_links(df: pd.DataFrame) -> pd.DataFrame:
            # shortcut edges u <-> label(u): deliver label(label(u)) next round
            m = df[df["node"] != df["label"]]
            node = np.concatenate([m["node"].to_numpy(), m["label"].to_numpy()])
            peer = np.concatenate([m["label"].to_numpy(), m["node"].to_numpy()])
            return pd.DataFrame(
                {
                    "node": node,
                    "peer": peer,
                    "label": node,  # placeholder
                    "_bkt": pd.util.hash_array(node) % _B(),
                    "_is_lab": np.zeros(len(node), dtype=bool),
                }
            )

        shortcut = labels.map_batches(label_links, batch_format="pandas")

        def propose(df: pd.DataFrame) -> pd.DataFrame:
            labs = df[df["_is_lab"]][["node", "label"]]
            adj = df[~df["_is_lab"]][["node", "peer"]]
            props = adj.merge(labs, on="node", how="inner")
            out = pd.concat(
                [
                    pd.DataFrame(
                        {"node": props["peer"], "label": props["label"], "_is_lab": False}
                    ),
                    labs.assign(_is_lab=True),
                ],
                ignore_index=True,
            )
            out["_bkt2"] = pd.util.hash_array(out["node"].to_numpy()) % _B()
            return out

        def reduce_min(df: pd.DataFrame) -> pd.DataFrame:
            new = df.groupby("node")["label"].min()
            old = df[df["_is_lab"]].set_index("node")["label"]
            changed = new.lt(old.reindex(new.index))
            return pd.DataFrame(
                {
                    "node": new.index.to_numpy(),
                    "label": new.to_numpy(),
                    "_changed": changed.to_numpy(),
                }
            )

        stepped = (
            lab_tagged.union(adj_tagged, shortcut)
            .groupby("_bkt")
            .map_groups(propose, batch_format="pandas")
            .groupby("_bkt2")
            .map_groups(reduce_min, batch_format="pandas")
            .materialize()
        )
        n_changed = stepped.sum("_changed")
        labels = stepped.drop_columns(["_changed"]).materialize()
        if not n_changed:
            break
    return labels
