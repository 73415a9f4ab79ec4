"""Small shared runtime helpers."""

from __future__ import annotations

# Substrings identifying Ray Data's own pool workers in
# ``ray._private.state.actors()`` ActorClassName — the only classes
# drain_stale_pools() will ever force-kill (never user actors).
_RAY_DATA_ACTOR_MARKS = ("MapWorker", "Aggregator")


def _cpu_totals():
    """(total, available) CPU slots right now; degrades to (4, 4) when
    the cluster state is unreadable (e.g. Ray not yet initialised)."""
    import ray

    try:
        total = float(ray.cluster_resources().get("CPU", 4))
        avail = float(ray.available_resources().get("CPU", total))
    except Exception:
        return 4.0, 4.0
    return total, avail


def drain_stale_pools(timeout: float = 10.0, kill_after: float = 6.0):
    """Release actor pools left over from PRIOR Dataset plans in this
    session.  Call at a query/plan boundary (nothing of ours running).

    Ray 2.49 shuts a fixed-size ``map_batches(Cls, ...)`` pool down
    asynchronously when its plan finishes — and not at all while any
    reference to the executor survives.  Back-to-back query execution in
    ONE session (the driver's shape) therefore accumulates live
    ``MapWorker``/``HashShuffleAggregator`` actors that still hold CPU
    slots, and a later plan's fixed pool can dead-end with every actor
    pending (observed: 238-query sweep hung at query #151 with
    ``Actors: 7 (running=0, pending=7)`` against 6 leaked MapWorkers +
    4 aggregators).  Strategy here: (1) ``gc.collect()`` so dead plans'
    executors actually finalize, (2) poll until available CPU equals the
    cluster total, (3) after ``kill_after`` seconds, force-kill actors
    that are still ALIVE *and* are Ray Data pool workers by class name —
    at a plan boundary those are orphans by definition.  Returns True
    when the cluster is fully quiet."""
    import gc
    import time

    import ray

    if not ray.is_initialized():
        return True
    gc.collect()
    total, avail = _cpu_totals()
    if avail >= total:
        return True
    deadline = time.monotonic() + timeout
    kill_at = time.monotonic() + kill_after
    killed = False
    while time.monotonic() < deadline:
        time.sleep(0.2)
        gc.collect()
        total, avail = _cpu_totals()
        if avail >= total:
            return True
        if not killed and time.monotonic() >= kill_at:
            killed = True
            _kill_ray_data_workers()
    total, avail = _cpu_totals()
    return avail >= total


def _kill_ray_data_workers():
    """Force-kill ALIVE Ray-Data pool workers (MapWorker / shuffle
    aggregator actors) — last-resort path of :func:`drain_stale_pools`,
    reached only when a plan boundary still shows held CPU slots after
    the graceful wait.  Works without the dashboard: actor ids come
    from the GCS-backed ``ray._private.state.actors()`` and are killed
    through the core worker (``ray.kill`` needs handles, which unnamed
    pool actors don't expose)."""
    import ray

    try:
        snapshot = ray._private.state.actors()
        core = ray._private.worker.global_worker.core_worker
    except Exception:
        return
    for aid_hex, info in snapshot.items():
        if info.get("State") != "ALIVE":
            continue
        cls = info.get("ActorClassName") or ""
        if not any(m in cls for m in _RAY_DATA_ACTOR_MARKS):
            continue
        try:
            core.kill_actor(ray.ActorID(bytes.fromhex(aid_hex)), False)
        except Exception:
            pass


def _slot_capped(budget: int, *, wait: float = 8.0, floor: int = 2) -> int:
    """Cap a pool/partition budget by the CPU slots actually free right
    now.  The root cause of the one-session deadlock: budgets derived
    from the cluster's TOTAL CPUs ignore actors still alive/draining
    from prior plans, so a fixed pool can request more slots than can
    ever be placed.  If free slots don't cover ``budget`` + 1 producer
    slot, wait briefly (prior pools normally exit within a second or
    two), then size to what is genuinely free.  On a quiet cluster this
    is one ``available_resources()`` call and no wait."""
    import gc
    import time

    total, avail = _cpu_totals()
    if avail >= budget + 1 or total <= floor:
        return budget
    deadline = time.monotonic() + wait
    while time.monotonic() < deadline:
        gc.collect()
        time.sleep(0.2)
        total, avail = _cpu_totals()
        if avail >= budget + 1:
            return budget
    return max(floor, min(budget, int(avail) - 1))


def auto_concurrency(concurrency=None):
    """Actor-pool size for ``map_batches(Cls, ...)``: Ray 2.49 requires an
    explicit value for callable classes, so derive it from the cluster's
    CPU count instead of hard-coding a pool of 4 (which starves a 32-core
    node and any larger cluster).  FIXED size, not an autoscaling
    ``(1, n)`` range: Ray 2.49's autoscaling pool ramps up lazily enough
    that a compute-bound stage with block-count tasks runs most of them
    on the first actors — measured same-session on the MinHash signature
    stage, (1, 16) = 281 s wall / 1073 core-s vs fixed 16 = 93 s wall /
    382 core-s for identical input.  Idle pre-started actors cost only
    memory.  HEADROOM: a fixed pool equal to the cluster's TOTAL CPUs
    deadlocks against a live upstream task-pool operator (verified:
    read_parquet → map_batches(Cls, concurrency=8) hangs forever at
    num_cpus=8, completes at 7, and completes at 8 on materialized
    input) — leave ~1/8 of the CPUs for neighbouring operators.
    Returns the caller's value untouched when given."""
    if concurrency is not None:
        return concurrency
    import ray

    try:
        n = int(ray.cluster_resources().get("CPU", 4))
    except Exception:
        n = 4
    return _slot_capped(max(2, n - max(1, n // 8)))


def stage_concurrency(n_stages: int, concurrency=None):
    """Per-stage FIXED pool size when ``n_stages`` actor-pool stages run
    inside ONE streaming plan: the auto_concurrency budget split N ways.
    Chained pools each sized auto_concurrency() over-subscribe the
    cluster's CPU slots (pools hold their slots for the life of the
    plan) and the plan deadlocks timing-dependently — observed:
    sample_frames → video_frame_stats, both at auto_concurrency(=7) in
    an 8-cpu session, hung ~half the time while the single-pool
    pipelines always completed.  Returns the caller's value untouched
    when given."""
    if concurrency is not None:
        return concurrency
    return max(1, auto_concurrency(None) // n_stages)


def join_partitions(num_partitions=None) -> int:
    """Hash-partition count for ``Dataset.join`` / wide groupby stages,
    derived from the CLUSTER's total CPUs — the one shared default for
    every join site (no magic divisors).

    Ray 2.49 gives each join partition a HashShuffleAggregator actor that
    holds a CPU slot for the life of the shuffle; requesting more
    aggregator slots than the cluster has cores deadlocks the pool, and
    taking *all* cores starves the producer tasks feeding the shuffle.
    Half the cluster's CPUs keeps both sides scheduled and scales the
    partition count linearly with cluster size (32 cores → 16 partitions;
    a 256-node × 32-core cluster → 4096).  Callers with better knowledge
    (tiny inputs, known skew) pass an explicit value through untouched."""
    if num_partitions is not None:
        return num_partitions
    import ray

    try:
        n = int(ray.cluster_resources().get("CPU", 4))
    except Exception:
        n = 4
    return _slot_capped(max(2, n // 2))


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
    stays schema-less; callers must short-circuit that case.

    Also drains stale actor pools first: a query that EXECUTES a pool
    stage (e.g. knn's _BlockTopK to_pandas) and then builds a join can
    otherwise wedge — the pool's async shutdown lags under host
    contention, the join's aggregators see too few free slots, and the
    plan stalls with idle leaked workers (observed once in four
    one-session sweeps at query #150 even after the query-boundary
    drain; the intra-query boundary is HERE).  No-op (one
    available_resources call) when the cluster is quiet."""
    drain_stale_pools(timeout=8.0, kill_after=4.0)
    return ds.repartition(num_partitions)


def bucket_agg(ds, keys, fn, *, num_buckets: int = 64):
    """Aggregate by HIGH-cardinality keys without Ray's per-group
    Aggregate cost.

    Ray 2.49's sort-based ``groupby().sum()/count()/min()`` pays ~0.4–1
    ms *per distinct key* in its AggregateMap/Reduce suboperators
    (measured: 100 K distinct string keys ≈ 40 s for a 100 K-row
    dataset), so any node- / token- / shingle-scale aggregation must
    not hand Ray the raw key.  This helper adds ``_kb = row-hash(keys)
    mod num_buckets``, runs ONE Ray groupby over the ~``num_buckets``
    coarse ids (cheap: group count is the bucket count), and applies
    ``fn`` — a vectorized pandas aggregation that must itself group by
    ``keys`` — to each bucket.  Every row of a given key lands in one
    bucket, so per-bucket results are globally correct and disjoint.

    ``fn`` receives the bucket frame WITHOUT the ``_kb`` column and must
    return a plain DataFrame (it may change schema freely)."""
    import pandas as pd

    keys = list(keys)

    def add_kb(df: "pd.DataFrame") -> "pd.DataFrame":
        h = pd.util.hash_pandas_object(df[keys], index=False)
        out = df.copy()
        out["_kb"] = (h % num_buckets).astype("int64").to_numpy()
        return out

    def run(df: "pd.DataFrame") -> "pd.DataFrame":
        return fn(df.drop(columns=["_kb"]))

    return (
        ds.map_batches(add_kb, batch_format="pandas")
        .groupby("_kb")
        .map_groups(run, batch_format="pandas")
    )


def bucket_sum(ds, keys, vals, *, num_buckets: int = 64):
    """``SELECT keys, sum(vals) GROUP BY keys`` via :func:`bucket_agg`
    (column names preserved — no ``sum(col)`` renames)."""
    vals = list(vals)

    def f(df):
        # dropna=False: a null key must stay a group (the Ray aggregates
        # these helpers replace kept null keys; silently dropping rows
        # would shift totals with no error)
        return df.groupby(
            list(keys), as_index=False, sort=False, dropna=False
        )[vals].sum()

    return bucket_agg(ds, keys, f, num_buckets=num_buckets)


def bucket_count(ds, keys, *, out_col: str = "n", num_buckets: int = 64):
    """``SELECT keys, count(*) AS out_col GROUP BY keys`` via
    :func:`bucket_agg`."""

    def f(df):
        g = df.groupby(
            list(keys), as_index=False, sort=False, dropna=False
        ).size()
        return g.rename(columns={"size": out_col})

    return bucket_agg(ds, keys, f, num_buckets=num_buckets)


def ds_signature(ds, cols) -> int:
    """Order-insensitive deterministic fingerprint of a Dataset's
    ``cols`` — the fixpoint-convergence check of the iterative
    algorithms (cc_labels, dag_depth).  Vectorized: per block, the
    int64 SUM of ``pd.util.hash_pandas_object`` row hashes (the same
    deterministic hash bucket_agg keys on); block sums add up on the
    driver, so both block order and row order are irrelevant and no
    per-row Python hashing runs."""
    import pandas as pd

    cols = list(cols)

    def h(df: "pd.DataFrame") -> "pd.DataFrame":
        v = pd.util.hash_pandas_object(df[cols], index=False).to_numpy()
        acc = int(v.sum(dtype="uint64")) & ((1 << 63) - 1)
        return pd.DataFrame({"h": pd.array([acc], dtype="int64")})

    return sum(
        r["h"] for r in ds.map_batches(h, batch_format="pandas").take_all()
    ) & ((1 << 63) - 1)
