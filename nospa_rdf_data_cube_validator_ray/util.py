"""Small shared runtime helpers."""

from __future__ import annotations


def auto_concurrency(concurrency=None):
    """Actor-pool size for ``map_batches(Cls, ...)``: Ray 2.49 requires an
    explicit value for callable classes, so derive an autoscaling range
    from the cluster's CPU count instead of hard-coding a pool of 4 (which
    starves a 32-core node and any larger cluster).  Returns the caller's
    value untouched when given."""
    if concurrency is not None:
        return concurrency
    import ray

    try:
        n = int(ray.cluster_resources().get("CPU", 4))
    except Exception:
        n = 4
    return (1, max(2, n))
