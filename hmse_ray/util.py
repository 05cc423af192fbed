"""Small runtime helpers (no ray.init anywhere)."""

from __future__ import annotations


def join_partitions(cap: int = 64) -> int:
    """Hash-join partition count sized to the cluster.

    Ray's hash join spins up aggregator actors per partition; far more
    partitions than CPUs thrashes actor startup (measured 40x slowdown
    at 16 partitions on 8 CPUs vs 4). One partition per 2 CPUs, capped.
    """
    import ray

    try:
        cpus = int(ray.cluster_resources().get("CPU", 8))
    except Exception:
        cpus = 8
    return max(2, min(cap, cpus // 2))
