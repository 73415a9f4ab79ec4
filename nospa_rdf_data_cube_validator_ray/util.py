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


def heal_schema(ds, num_partitions: int):
    """Work around a Ray 2.49 empty-block quirk at hash-join boundaries.

    A stage whose pandas UDF returns a 0-row frame yields a schema-LESS
    empty block, and ``map_batches`` never invokes its UDF on an empty
    block, so no downstream guard (or rename!) can re-type it; a hash
    join receiving one raises ``ArrowInvalid: No match or multiple
    matches for key field`` — timing-dependently, since it needs the
    empty block to land in a join partition.  ``repartition()`` rebuilds
    blocks as row-slices of typed neighbors, so empties come out typed.

    Call this as the LAST op on each ``Dataset.join`` operand (after any
    rename — renames skip empty blocks too).  A fully-empty dataset
    stays schema-less; callers must short-circuit that case."""
    return ds.repartition(num_partitions)
