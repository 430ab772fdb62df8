"""Cluster-aware actor-pool sizing.

Autoscaling pools ``concurrency=(1, N)`` ramp from ONE actor on every
fresh execution (measured: the as-of pool at (1, N) cost ~0.3 of the
8→32-CPU scaling efficiency), so throughput stages want a *pinned* pool
sized to the cluster. But a pinned pool larger than the session's CPUs
deadlocks scheduling (each actor reserves one CPU), so the size must be
derived from the live cluster, not hard-coded — tests run a 4-CPU
session, bench a 32-CPU one, a real cluster thousands.
"""

from __future__ import annotations


def cluster_cpus(default: int = 4) -> int:
    import ray

    if not ray.is_initialized():
        return default
    return int(ray.cluster_resources().get("CPU", default))


def pool_size(fraction: float = 0.5, lo: int = 2, hi: int | None = None) -> int:
    """Pinned actor-pool size: ``fraction`` of cluster CPUs, clamped to
    [lo, hi]. Default fraction 0.5 leaves headroom for the stages up- and
    downstream of the pool in the same streaming pipeline."""
    n = max(lo, int(cluster_cpus() * fraction))
    if hi is not None:
        n = min(n, hi)
    return n
