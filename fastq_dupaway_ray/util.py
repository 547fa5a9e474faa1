"""Small engine utilities shared across stages."""

from __future__ import annotations


def default_join_partitions(cap: int = 64) -> int:
    """Join/shuffle partition count that leaves CPU headroom.

    ``Dataset.join`` pins ``num_partitions`` aggregator actors for the whole
    join; sizing it at or above the cluster CPU count starves the map tasks
    feeding the join and deadlocks the plan. Use ~half the CPUs, capped.
    """
    try:
        import ray

        cpus = int(ray.cluster_resources().get("CPU", 8))
    except Exception:
        cpus = 8
    return max(2, min(cap, cpus // 2))
