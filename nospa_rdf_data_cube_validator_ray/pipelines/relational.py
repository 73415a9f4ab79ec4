"""Relational / kernel queries with DuckDB oracles: the stream-scale
graph-kernel join over the cube triple table, a windowed event aggregate,
and a top-k — the groupby/sort/limit surface of the engine."""

from __future__ import annotations

import numpy as np
import pandas as pd

import ray.data
from ray.data.aggregate import Count

from ..functions import kernel as K

TP = "http://example.org/tpch/"
QB = "http://purl.org/linked-data/cube#"


def q_cube_star_supp(sf_dir: str):
    """(dataset, supplier) pairs via the conjunctive star join
    obs —qb:dataSet→ ds ∧ obs —tp:d_supp→ supp (searchByMultipleProperty
    shape, ValidatorBase.java:85-106) as a real distributed hash join."""
    import __ray_entry__ as entry

    triples = entry._cube_state(sf_dir)["validator"].normalize()
    pairs = K.star_pairs(triples, QB + "dataSet", TP + "d_supp")
    df = pairs.to_pandas()[["a", "b"]].rename(columns={"a": "dataset", "b": "supp"})
    return df.drop_duplicates().reset_index(drop=True)


_SQL_STAR_SUPP = f"""
WITH ranked AS (
  SELECT l_orderkey AS k, l_suppkey AS s,
         row_number() OVER (
           PARTITION BY l_orderkey
           ORDER BY l_linenumber, l_suppkey, round(l_quantity * 100)
         ) AS l
  FROM lineitem
)
SELECT DISTINCT dataset, supp FROM (
  SELECT '{TP}ds-' || (k % 64) AS dataset, '{TP}supp/' || s AS supp
  FROM ranked WHERE k % 97 != 0
  UNION ALL
  SELECT '{TP}ds/extra/' || k, '{TP}supp/' || s
  FROM ranked WHERE k % 107 = 0 AND k % 97 != 0 AND l = 1
)
"""


def q_events_hourly(sf_dir: str):
    """Tumbling 1-hour window aggregate over the events stream table:
    count + distinct users per (window, event_type)."""
    ds = ray.data.read_parquet(
        f"{sf_dir}/events.parquet", columns=["ts", "event_type", "user_id"]
    )

    def _hour_id(ts: pd.Series) -> pd.Series:
        # unit-agnostic epoch hours (parquet may carry us or ns precision)
        return ((ts - pd.Timestamp(0)) // pd.Timedelta(hours=1)).astype("int64")

    num_buckets = 32

    def project(df: pd.DataFrame) -> pd.DataFrame:
        hour_id = _hour_id(df["ts"])
        h = pd.util.hash_pandas_object(
            hour_id.astype(str) + "\x00" + df["event_type"].astype(str), index=False
        ).to_numpy()
        return pd.DataFrame(
            {
                "kb": (h % num_buckets).astype("int64"),
                "hour_id": hour_id,
                "event_type": df["event_type"],
                "user_id": df["user_id"],
            }
        )

    def agg(df: pd.DataFrame) -> pd.DataFrame:
        # one vectorized pass per coarse bucket: raw count + distinct users
        g = df.groupby(["hour_id", "event_type"], sort=False)
        out = g.agg(n=("user_id", "size"), n_users=("user_id", "nunique"))
        return out.reset_index()[["hour_id", "event_type", "n", "n_users"]]

    out = (
        ds.map_batches(project, batch_format="pandas")
        .groupby("kb")
        .map_groups(agg, batch_format="pandas")
        .to_pandas()
    )
    for c in ("hour_id", "n", "n_users"):
        out[c] = out[c].astype("int64")
    return out


_SQL_EVENTS_HOURLY = """
SELECT (epoch_us(ts) // 3600000000)::BIGINT AS hour_id, event_type,
       count(*)::BIGINT AS n,
       count(DISTINCT user_id)::BIGINT AS n_users
FROM events GROUP BY 1, 2
"""


def sessionize_ds(sf_dir: str, gap_minutes: int = 30) -> "ray.data.Dataset":
    """Gap-based sessionization of the event stream as a Dataset
    (user_id, session_id, n_events, start_us, end_us): a user's events
    more than ``gap_minutes`` apart start a new session.  Shuffle key =
    user hash bucket; the per-user ordering + gap scan is vectorized
    inside each bucket (sort + diff + cumsum, no Python loop)."""
    ds = ray.data.read_parquet(
        f"{sf_dir}/events.parquet", columns=["ts", "user_id"]
    )
    gap_us = gap_minutes * 60 * 1_000_000
    num_buckets = 32

    def add_bucket(df: pd.DataFrame) -> pd.DataFrame:
        ts_us = ((df["ts"] - pd.Timestamp(0)) // pd.Timedelta(microseconds=1)).astype("int64")
        return pd.DataFrame(
            {
                "kb": (df["user_id"].to_numpy() % num_buckets).astype("int64"),
                "user_id": df["user_id"].astype("int64"),
                "ts_us": ts_us,
            }
        )

    def sessions(df: pd.DataFrame) -> pd.DataFrame:
        d = df.sort_values(["user_id", "ts_us"])
        new_user = d["user_id"].ne(d["user_id"].shift())
        gap = d["ts_us"].diff() > gap_us
        sid = (new_user | gap).cumsum()  # global per bucket; renumber per user
        d = d.assign(_sid=sid)
        g = d.groupby(["user_id", "_sid"], sort=False)
        out = g.agg(
            n_events=("ts_us", "size"),
            start_us=("ts_us", "min"),
            end_us=("ts_us", "max"),
        ).reset_index()
        out["session_id"] = out.groupby("user_id", sort=False).cumcount() + 1
        return out[["user_id", "session_id", "n_events", "start_us", "end_us"]]

    return (
        ds.map_batches(add_bucket, batch_format="pandas")
        .groupby("kb")
        .map_groups(sessions, batch_format="pandas")
    )


def q_sessionize(sf_dir: str, gap_minutes: int = 30):
    out = sessionize_ds(sf_dir, gap_minutes).to_pandas()
    for c in out.columns:
        out[c] = out[c].astype("int64")
    return out


_SQL_SESSIONIZE = """
WITH e AS (
  SELECT user_id, epoch_us(ts) AS ts_us,
         CASE WHEN epoch_us(ts) - lag(epoch_us(ts))
                   OVER (PARTITION BY user_id ORDER BY epoch_us(ts)) > 1800000000
              OR lag(epoch_us(ts)) OVER (PARTITION BY user_id ORDER BY epoch_us(ts)) IS NULL
              THEN 1 ELSE 0 END AS brk
  FROM events
),
s AS (
  SELECT user_id, ts_us,
         sum(brk) OVER (PARTITION BY user_id ORDER BY ts_us
                        ROWS UNBOUNDED PRECEDING) AS session_id
  FROM e
)
SELECT user_id::BIGINT AS user_id, session_id::BIGINT AS session_id,
       count(*)::BIGINT AS n_events,
       min(ts_us)::BIGINT AS start_us, max(ts_us)::BIGINT AS end_us
FROM s GROUP BY 1, 2
"""


def q_events_sliding(sf_dir: str, width_hours: int = 3):
    """SLIDING window aggregate (width 3 h, slide 1 h): each event lands in
    ``width`` windows via a map-side fan-out (the replicate-to-windows
    pattern — no per-window shuffle), then the same coarse-bucket
    vectorized aggregate as the tumbling case."""
    ds = ray.data.read_parquet(
        f"{sf_dir}/events.parquet", columns=["ts", "event_type"]
    )
    num_buckets = 32

    def fan_out(df: pd.DataFrame) -> pd.DataFrame:
        hour_id = ((df["ts"] - pd.Timestamp(0)) // pd.Timedelta(hours=1)).astype(
            "int64"
        )
        parts = []
        for off in range(width_hours):
            w = hour_id - off  # window [w, w+width) contains this event
            parts.append(
                pd.DataFrame({"window_start": w, "event_type": df["event_type"]})
            )
        out = pd.concat(parts, ignore_index=True)
        h = pd.util.hash_pandas_object(
            out["window_start"].astype(str) + "\x00" + out["event_type"], index=False
        ).to_numpy()
        out["kb"] = (h % num_buckets).astype("int64")
        return out

    def agg(df: pd.DataFrame) -> pd.DataFrame:
        g = df.groupby(["window_start", "event_type"], sort=False)
        return g.size().rename("n").reset_index()

    out = (
        ds.map_batches(fan_out, batch_format="pandas")
        .groupby("kb")
        .map_groups(agg, batch_format="pandas")
        .to_pandas()
    )
    for c in ("window_start", "n"):
        out[c] = out[c].astype("int64")
    return out


_SQL_EVENTS_SLIDING = """
SELECT ((epoch_us(ts) // 3600000000) - off)::BIGINT AS window_start,
       event_type, count(*)::BIGINT AS n
FROM events, (SELECT unnest(generate_series(0, 2)) AS off)
GROUP BY 1, 2
"""


def q_events_topk_hourly(sf_dir: str, k: int = 2):
    """Windowed top-k: the 2 busiest event types per hour (distributed
    tumbling aggregate, then per-group rank with deterministic (n desc,
    type asc) tie-break — group cardinality is window-scale, so the rank
    runs on the aggregate, not the stream)."""
    hourly = q_events_hourly(sf_dir)[["hour_id", "event_type", "n"]]
    hourly = hourly.sort_values(
        ["hour_id", "n", "event_type"], ascending=[True, False, True]
    )
    top = hourly.groupby("hour_id", sort=True).head(k).reset_index(drop=True)
    top["rank"] = (top.groupby("hour_id").cumcount() + 1).astype("int64")
    return top


_SQL_EVENTS_TOPK = """
SELECT hour_id, event_type, n, rank FROM (
  SELECT hour_id, event_type, n,
         row_number() OVER (
           PARTITION BY hour_id ORDER BY n DESC, event_type
         )::BIGINT AS rank
  FROM (
    SELECT (epoch_us(ts) // 3600000000)::BIGINT AS hour_id, event_type,
           count(*)::BIGINT AS n
    FROM events GROUP BY 1, 2
  )
) WHERE rank <= 2
"""


def q_top_customers(sf_dir: str):
    """Top-10 customers by order count (groupby-count → sort → limit),
    deterministic tie-break on customer key."""
    ds = ray.data.read_parquet(f"{sf_dir}/orders.parquet", columns=["o_custkey"])
    counts = ds.groupby("o_custkey").aggregate(Count()).to_pandas()
    counts = counts.rename(columns={"count()": "n"})
    counts["n"] = counts["n"].astype("int64")
    top = counts.sort_values(["n", "o_custkey"], ascending=[False, True]).head(10)
    return top.reset_index(drop=True)


_SQL_TOP_CUSTOMERS = """
SELECT o_custkey, count(*)::BIGINT AS n
FROM orders GROUP BY 1
ORDER BY n DESC, o_custkey LIMIT 10
"""


def asof_join(
    left: "ray.data.Dataset",
    right: "ray.data.Dataset",
    *,
    by: str,
    on: str,
    right_vals: list[str],
    num_buckets: int = 32,
    allow_exact_matches: bool = True,
) -> "ray.data.Dataset":
    """Distributed backward as-of join (the operator Ray Data lacks):
    for every left row, attach ``right_vals`` from the right row with
    the greatest ``on`` ≤ the left row's ``on`` within the same ``by``
    key (DuckDB's ``ASOF LEFT JOIN`` semantics).

    Partitioning assumption / shape: both sides are tagged and
    coarse-bucketed by ``hash(by) % num_buckets`` — ONE shuffle
    co-locates each key's full history, then the per-bucket kernel is a
    vectorized ``pandas.merge_asof`` (sort + galloping merge, no Python
    row loop).  Skewed ``by`` keys share a bucket with others but are
    never split; a single key hotter than one worker's memory would
    need on-range sub-splitting with boundary replication (documented
    limit).  Right rows must be unique per (by, on) — pre-aggregate
    ties upstream, or the match is ambiguous (pandas takes the last,
    DuckDB an arbitrary one)."""
    lcols = [c for c in left.schema().names]
    rkeep = [by, on, *right_vals]
    canon = _canon_dtypes(right, right_vals)

    def merge(l: pd.DataFrame, r: pd.DataFrame) -> pd.DataFrame:
        if not len(l) or not len(r):
            # left join with an empty side: keep the bucket's TYPED
            # frames (the tag-time padding typed them) so every bucket
            # emits one schema — an all-object empty here would poison
            # downstream schema unification
            out = l.copy()
            for c in right_vals:
                out[c] = pd.Series(
                    dtype=canon.get(c) or r[c].dtype
                ).reindex(out.index)
            return out
        # nullable value dtypes BEFORE the merge: a missed match would
        # otherwise promote int64 values through float64 and round ids
        # above 2^53; Int64/boolean carry pd.NA exactly
        r = r.astype({c: d for c, d in canon.items() if d})
        out = pd.merge_asof(
            l.sort_values(on),
            r.sort_values(on),
            on=on,
            by=by,
            direction="backward",
            allow_exact_matches=allow_exact_matches,
        )
        for c, d in canon.items():
            if d:
                out[c] = out[c].astype(d)
        return out

    return _two_sided_bucketed(
        left, right, by=by, lcols=lcols, rkeep=rkeep,
        num_buckets=num_buckets, merge=merge,
    )


def _canon_dtypes(right: "ray.data.Dataset", right_vals: list[str]) -> dict:
    """Canonical pandas output dtype per right value column, identical
    across matched/missed/empty buckets: nullable Int64/boolean for
    exact integers and bools, float64 for floats, native datetime64 for
    timestamps, None (leave as produced) otherwise."""
    import pyarrow as pa

    types = dict(zip(right.schema().names, right.schema().types))
    out: dict = {}
    for c in right_vals:
        dt = types[c]
        if not isinstance(dt, pa.DataType):
            try:
                dt = pa.from_numpy_dtype(dt)
            except (pa.ArrowNotImplementedError, TypeError, ValueError):
                out[c] = None
                continue
        if pa.types.is_integer(dt):
            out[c] = "Int64"
        elif pa.types.is_boolean(dt):
            out[c] = "boolean"
        elif pa.types.is_floating(dt):
            out[c] = "float64"
        elif pa.types.is_timestamp(dt):
            out[c] = f"datetime64[{dt.unit}]"
        else:
            out[c] = None
    return out


def _two_sided_bucketed(
    left: "ray.data.Dataset",
    right: "ray.data.Dataset",
    *,
    by: str,
    lcols: list[str],
    rkeep: list[str],
    num_buckets: int,
    merge,
) -> "ray.data.Dataset":
    """Shared shape for custom binary joins (as-of, range): tag each
    side, coarse-bucket by ``hash(by) % num_buckets`` (ONE shuffle
    co-locating each key's rows from both sides), then run the
    vectorized pandas ``merge(left_frame, right_frame)`` kernel per
    bucket.

    Both sides are padded to ONE exact union schema at tag time, with
    typed default values (never read — the side filter excludes them)
    in the other side's columns: Ray 2.49's hash shuffle unifies
    mixed-schema blocks through pandas, which would promote one-sided
    int64 columns to float64 and silently round ids above 2^53."""

    import pyarrow as pa

    def np_default(dt):
        # pandas-backed Datasets report numpy dtypes / Python classes
        # (e.g. ``object``) instead of Arrow DataTypes — normalize
        if not isinstance(dt, pa.DataType):
            try:
                dt = pa.from_numpy_dtype(dt)
            except (pa.ArrowNotImplementedError, TypeError, ValueError):
                return ""
        if pa.types.is_integer(dt):
            return np.int64(0)
        if pa.types.is_floating(dt) or pa.types.is_decimal(dt):
            return np.float64(np.nan)
        if pa.types.is_boolean(dt):
            return False
        if pa.types.is_timestamp(dt):
            return np.datetime64(0, dt.unit)
        if pa.types.is_date(dt):
            return np.datetime64(0, "D")
        if pa.types.is_binary(dt) or pa.types.is_large_binary(dt):
            return b""
        return ""  # string-ish

    l_types = dict(zip(left.schema().names, left.schema().types))
    r_types = dict(zip(right.schema().names, right.schema().types))
    all_cols = list(dict.fromkeys([*lcols, *rkeep]))
    defaults = {
        c: np_default(r_types[c] if c in r_types else l_types[c])
        for c in all_cols
    }

    def _key_kind(dt):
        if not isinstance(dt, pa.DataType):
            try:
                dt = pa.from_numpy_dtype(dt)
            except (pa.ArrowNotImplementedError, TypeError, ValueError):
                return "other"
        if pa.types.is_integer(dt):
            return "int"
        if pa.types.is_floating(dt):
            return "float"
        return "other"

    # ONE canonical key dtype ACROSS the two sides, decided from the
    # Dataset schemas before hashing: pd.util.hash_array hashes the raw
    # representation, so int64 5 and float64 5.0 bucket differently —
    # per-side width unification alone would silently emit NA matches
    # when one side carries a float-promoted copy of an integer key.
    kinds = {_key_kind(l_types[by]), _key_kind(r_types[by])}
    if kinds == {"int"}:
        key_np = "int64"
    elif kinds <= {"int", "float"}:
        key_np = "float64"
    else:
        key_np = None

    def tag(side: int, keep: list[str]):
        def f(df: pd.DataFrame) -> pd.DataFrame:
            out = pd.DataFrame(index=df.index)
            for c in all_cols:
                out[c] = df[c] if c in keep else defaults[c]
            out["_side"] = np.int8(side)
            keys = df[by]
            arr = keys.to_numpy(key_np) if key_np else keys.to_numpy()
            out["_kb"] = (
                pd.util.hash_array(arr) % num_buckets
            ).astype("int32")
            return out

        return f

    tagged = left.map_batches(tag(0, lcols), batch_format="pandas").union(
        right.map_batches(tag(1, rkeep), batch_format="pandas")
    )

    def run(grp: pd.DataFrame) -> pd.DataFrame:
        l = grp.loc[grp["_side"] == 0, lcols]
        r = grp.loc[grp["_side"] == 1, rkeep]
        return merge(l, r)

    return tagged.groupby("_kb").map_groups(run, batch_format="pandas")


def range_join(
    left: "ray.data.Dataset",
    right: "ray.data.Dataset",
    *,
    by: str,
    on: str,
    start: str,
    end: str,
    right_vals: list[str],
    num_buckets: int = 32,
) -> "ray.data.Dataset":
    """Distributed interval-containment join (the second custom join Ray
    Data lacks): inner-join every left row to the right interval of the
    same ``by`` key with ``start ≤ on ≤ end`` (bounds inclusive).

    Partitioning assumption: per-key intervals are NON-OVERLAPPING
    (sessions, validity windows, SCD-2 ranges), so the kernel is a
    backward ``merge_asof`` on ``start`` plus an ``end`` containment
    filter — one galloping merge, no fan-out.  Overlapping intervals
    would need replicate-by-range fan-out instead (not implemented —
    callers with overlap must pre-split).  Same bucket shape and skew
    caveat as :func:`asof_join`."""
    lcols = [c for c in left.schema().names]
    rkeep = [by, start, end, *right_vals]
    canon = _canon_dtypes(right, right_vals)

    def merge(l: pd.DataFrame, r: pd.DataFrame) -> pd.DataFrame:
        if not len(l) or not len(r):
            # typed empty (bucket frames are typed by the tag padding):
            # an all-object empty would poison schema unification
            out = l.iloc[0:0].copy()
            for c in right_vals:
                out[c] = pd.Series(dtype=canon.get(c) or r[c].dtype)
            return out
        r = r.astype({c: d for c, d in canon.items() if d})
        m = pd.merge_asof(
            l.sort_values(on),
            r.sort_values(start),
            left_on=on,
            right_on=start,
            by=by,
            direction="backward",
        )
        m = m[m[end].notna() & (m[on] <= m[end])]
        m = m.drop(columns=[start, end])
        for c, d in canon.items():
            if d:
                m[c] = m[c].astype(d)
        return m

    return _two_sided_bucketed(
        left, right, by=by, lcols=lcols, rkeep=rkeep,
        num_buckets=num_buckets, merge=merge,
    )


def q_events_last_purchase(sf_dir: str):
    """As-of join demo: every event annotated with the user's most
    recent purchase value at that moment (NaN before the first
    purchase).  Purchases are deduped per (user, ts) with max(value) so
    the as-of match is unambiguous on both engines."""
    ds = ray.data.read_parquet(
        f"{sf_dir}/events.parquet",
        columns=["event_id", "ts", "user_id", "event_type", "value"],
    )

    def to_us(df: pd.DataFrame) -> pd.DataFrame:
        df = df.copy()
        df["ts_us"] = (
            (df["ts"] - pd.Timestamp(0)) // pd.Timedelta(microseconds=1)
        ).astype("int64")
        return df.drop(columns=["ts"])

    ev = ds.map_batches(to_us, batch_format="pandas").materialize()
    left = ev.map_batches(
        lambda df: df[["event_id", "user_id", "ts_us"]],
        batch_format="pandas",
    )

    def purchases(df: pd.DataFrame) -> pd.DataFrame:
        p = df.loc[df["event_type"] == "purchase", ["user_id", "ts_us", "value"]]
        return (
            p.groupby(["user_id", "ts_us"], sort=False)["value"]
            .max()
            .reset_index()
            .rename(columns={"value": "last_purchase_value"})
        )

    # per-batch pre-dedup, then a COARSE-bucket exact dedup for ties
    # across batches (never one pandas group per (user, ts) key)
    def add_bucket(df: pd.DataFrame) -> pd.DataFrame:
        df = df.copy()
        df["_b"] = (df["user_id"].to_numpy(np.int64) % 32).astype("int32")
        return df

    def dedup_bucket(g: pd.DataFrame) -> pd.DataFrame:
        # na_position="first": NULL values must lose to any real value,
        # matching the oracle's max(value) which ignores NULLs
        return (
            g.sort_values("last_purchase_value", na_position="first")
            .drop_duplicates(["user_id", "ts_us"], keep="last")
            .drop(columns=["_b"])
        )

    right = (
        ev.map_batches(purchases, batch_format="pandas")
        .map_batches(add_bucket, batch_format="pandas")
        .groupby("_b")
        .map_groups(dedup_bucket, batch_format="pandas")
    )
    out = asof_join(
        left, right, by="user_id", on="ts_us",
        right_vals=["last_purchase_value"],
    ).to_pandas()
    for c in ("event_id", "user_id", "ts_us"):
        out[c] = out[c].astype("int64")
    return out.reset_index(drop=True)


_SQL_LAST_PURCHASE = """
WITH e AS (
  SELECT event_id, user_id, epoch_us(ts) AS ts_us, event_type, value
  FROM events
),
p AS (
  SELECT user_id, ts_us, max(value) AS last_purchase_value
  FROM e WHERE event_type = 'purchase'
  GROUP BY 1, 2
)
SELECT e.event_id::BIGINT AS event_id, e.user_id::BIGINT AS user_id,
       e.ts_us::BIGINT AS ts_us, p.last_purchase_value
FROM e ASOF LEFT JOIN p
  ON e.user_id = p.user_id AND e.ts_us >= p.ts_us
"""


def q_events_session_assign(sf_dir: str):
    """Range-join demo: every event inner-joined to its session interval
    (user equality + start_us ≤ ts_us ≤ end_us).  Sessions partition
    each user's events exactly, so output row count == event count —
    an end-to-end invariant the oracle enforces."""
    ds = ray.data.read_parquet(
        f"{sf_dir}/events.parquet", columns=["event_id", "ts", "user_id"]
    )

    def to_us(df: pd.DataFrame) -> pd.DataFrame:
        return pd.DataFrame(
            {
                "event_id": df["event_id"].astype("int64"),
                "user_id": df["user_id"].astype("int64"),
                "ts_us": (
                    (df["ts"] - pd.Timestamp(0)) // pd.Timedelta(microseconds=1)
                ).astype("int64"),
            }
        )

    ev = ds.map_batches(to_us, batch_format="pandas")
    out = range_join(
        ev,
        sessionize_ds(sf_dir),
        by="user_id",
        on="ts_us",
        start="start_us",
        end="end_us",
        right_vals=["session_id"],
    ).to_pandas()
    for c in out.columns:
        out[c] = out[c].astype("int64")
    return out.reset_index(drop=True)


_SQL_SESSION_ASSIGN = f"""
WITH sess AS ({_SQL_SESSIONIZE}),
ev AS (
  SELECT event_id, user_id, epoch_us(ts) AS ts_us FROM events
)
SELECT ev.event_id::BIGINT AS event_id, ev.user_id::BIGINT AS user_id,
       ev.ts_us::BIGINT AS ts_us, s.session_id::BIGINT AS session_id
FROM ev JOIN sess s
  ON ev.user_id = s.user_id AND ev.ts_us BETWEEN s.start_us AND s.end_us
"""


def q_events_changelog(sf_dir: str):
    """Changelog derivation — the INVERSE of CDC MERGE compaction: per
    user in event order, emit 'I' for the first event and 'U' whenever
    event_type changes; consecutive same-type rows are no-ops and
    drop.  User-bucketed fold (one user's history lands whole in one
    bucket frame, sorted vectorized) — no global sort, no per-user
    pandas groups."""
    from ..util import bucket_agg

    ds = ray.data.read_parquet(
        f"{sf_dir}/events.parquet",
        columns=["event_id", "ts", "user_id", "event_type"],
    )

    def to_us(df: pd.DataFrame) -> pd.DataFrame:
        return pd.DataFrame(
            {
                "event_id": df["event_id"].astype("int64"),
                "user_id": df["user_id"].astype("int64"),
                "ts_us": (
                    (df["ts"] - pd.Timestamp(0)) // pd.Timedelta(microseconds=1)
                ).astype("int64"),
                "event_type": df["event_type"].astype("string"),
            }
        )

    def fold(df: pd.DataFrame) -> pd.DataFrame:
        df = df.sort_values(["user_id", "ts_us", "event_id"])
        first = df["user_id"].shift() != df["user_id"]
        changed = first | (df["event_type"].shift() != df["event_type"])
        out = df.loc[changed, ["user_id", "event_id"]].reset_index(drop=True)
        out["op"] = pd.Series(
            np.where(first[changed].to_numpy(), "I", "U"), index=out.index
        ).astype("string")
        return out.astype({"user_id": "int64", "event_id": "int64"})

    return bucket_agg(
        ds.map_batches(to_us, batch_format="pandas"), ["user_id"], fold
    )


_SQL_CHANGELOG = """
WITH o AS (
  SELECT user_id, event_id, event_type,
         lag(event_type) OVER (
           PARTITION BY user_id ORDER BY epoch_us(ts), event_id
         ) AS pt
  FROM events
)
SELECT user_id::BIGINT AS user_id, event_id::BIGINT AS event_id,
       CASE WHEN pt IS NULL THEN 'I' ELSE 'U' END AS op
FROM o WHERE pt IS NULL OR pt <> event_type
"""

def q_events_rollup(sf_dir: str):
    """OLAP ROLLUP over (event_type, hour): leaf cells plus per-type and
    grand-total margins (sentinels hour_id = -1 / event_type = '*'),
    each with exact COUNT and COUNT(DISTINCT user).  Distinct-user
    margins are NOT derivable from leaf sums, so each level runs its own
    aggregation pass, bucketed so every group key lives wholly in one
    bucket (level 2 buckets by user, so per-bucket distinct counts are
    disjoint and SUM exactly)."""
    ds = ray.data.read_parquet(
        f"{sf_dir}/events.parquet", columns=["ts", "event_type", "user_id"]
    )

    leaf = q_events_hourly(sf_dir)[["event_type", "hour_id", "n", "n_users"]]

    num_buckets = 32

    def proj_type(df: pd.DataFrame) -> pd.DataFrame:
        h = pd.util.hash_pandas_object(
            df["event_type"].astype(str), index=False
        ).to_numpy()
        return pd.DataFrame(
            {
                "kb": (h % num_buckets).astype("int64"),
                "event_type": df["event_type"],
                "user_id": df["user_id"],
            }
        )

    def agg_type(df: pd.DataFrame) -> pd.DataFrame:
        g = df.groupby("event_type", sort=False)
        return g.agg(n=("user_id", "size"), n_users=("user_id", "nunique")).reset_index()

    per_type = (
        ds.map_batches(proj_type, batch_format="pandas")
        .groupby("kb")
        .map_groups(agg_type, batch_format="pandas")
        .to_pandas()
    )
    per_type["hour_id"] = -1

    def proj_user(df: pd.DataFrame) -> pd.DataFrame:
        return pd.DataFrame(
            {
                "kb": (df["user_id"].astype("int64") % num_buckets),
                "user_id": df["user_id"],
            }
        )

    def agg_user(df: pd.DataFrame) -> pd.DataFrame:
        return pd.DataFrame(
            {"n": [len(df)], "n_users": [df["user_id"].nunique()]}
        )

    totals = (
        ds.map_batches(proj_user, batch_format="pandas")
        .groupby("kb")
        .map_groups(agg_user, batch_format="pandas")
        .to_pandas()
    )
    grand = pd.DataFrame(
        {
            "event_type": ["*"],
            "hour_id": [-1],
            "n": [int(totals["n"].sum())],
            "n_users": [int(totals["n_users"].sum())],
        }
    )

    out = pd.concat(
        [leaf, per_type[["event_type", "hour_id", "n", "n_users"]], grand],
        ignore_index=True,
    )
    for c in ("hour_id", "n", "n_users"):
        out[c] = out[c].astype("int64")
    return out.sort_values(
        ["event_type", "hour_id"], ignore_index=True
    )


_SQL_EVENTS_ROLLUP = """
SELECT coalesce(event_type, '*') AS event_type,
       coalesce(hour_id, -1)::BIGINT AS hour_id,
       n, n_users
FROM (
  SELECT event_type, hour_id,
         count(*)::BIGINT AS n,
         count(DISTINCT user_id)::BIGINT AS n_users
  FROM (SELECT event_type, epoch_us(ts) // 3600000000 AS hour_id, user_id
        FROM events)
  GROUP BY ROLLUP(event_type, hour_id)
)
"""


def q_events_user_cumsum(sf_dir: str):
    """Running window over the event stream: for every event, how many
    DISTINCT event types its user has seen up to and including it
    (ordered by ts, event_id).  Cumulative distinct is not a plain
    window sum — it is computed as a running sum of first-occurrence
    flags, fully vectorized per user-aligned bucket (duplicated() +
    groupby cumsum; no per-user pandas groups)."""
    ds = ray.data.read_parquet(
        f"{sf_dir}/events.parquet",
        columns=["event_id", "ts", "user_id", "event_type"],
    )
    num_buckets = 32

    def proj(df: pd.DataFrame) -> pd.DataFrame:
        return pd.DataFrame(
            {
                "kb": (df["user_id"].astype("int64") % num_buckets),
                "event_id": df["event_id"].astype("int64"),
                "user_id": df["user_id"].astype("int64"),
                "ts_us": (
                    (df["ts"] - pd.Timestamp(0)) // pd.Timedelta(microseconds=1)
                ).astype("int64"),
                "event_type": df["event_type"],
            }
        )

    def scan(df: pd.DataFrame) -> pd.DataFrame:
        d = df.sort_values(["user_id", "ts_us", "event_id"])
        first = (~d.duplicated(["user_id", "event_type"])).astype("int64")
        d = d.assign(
            n_types_so_far=first.groupby(d["user_id"]).cumsum().astype("int64")
        )
        return d[["event_id", "user_id", "ts_us", "n_types_so_far"]]

    out = (
        ds.map_batches(proj, batch_format="pandas")
        .groupby("kb")
        .map_groups(scan, batch_format="pandas")
        .to_pandas()
    )
    for c in out.columns:
        out[c] = out[c].astype("int64")
    return out.sort_values("event_id", ignore_index=True)


_SQL_EVENTS_USER_CUMSUM = """
WITH flagged AS (
  SELECT event_id, user_id, epoch_us(ts) AS ts_us,
         CASE WHEN row_number() OVER (
           PARTITION BY user_id, event_type ORDER BY epoch_us(ts), event_id
         ) = 1 THEN 1 ELSE 0 END AS is_first
  FROM events
)
SELECT event_id::BIGINT AS event_id, user_id::BIGINT AS user_id,
       ts_us::BIGINT AS ts_us,
       sum(is_first) OVER (
         PARTITION BY user_id ORDER BY ts_us, event_id
         ROWS UNBOUNDED PRECEDING
       )::BIGINT AS n_types_so_far
FROM flagged
"""


def _vp_proj(df: pd.DataFrame, num_buckets: int) -> pd.DataFrame:
    """Shared view/purchase projection for the funnel and attribution
    pipelines: user bucket, int64 ids, µs timestamps, is_view flag."""
    d = df[df["event_type"].isin(("view", "purchase"))]
    return pd.DataFrame(
        {
            "kb": (d["user_id"].astype("int64") % num_buckets),
            "user_id": d["user_id"].astype("int64"),
            "event_id": d["event_id"].astype("int64"),
            "ts_us": (
                (d["ts"] - pd.Timestamp(0)) // pd.Timedelta(microseconds=1)
            ).astype("int64"),
            "is_view": (d["event_type"] == "view").to_numpy(),
        }
    ).reset_index(drop=True)


def q_events_funnel(sf_dir: str):
    """Two-step conversion funnel: for every user, the FIRST 'view'
    event (ordered by ts, event_id) and the FIRST 'purchase' STRICTLY
    after it in the same order — one row per converting user
    (user_id, view_ts_us, view_event_id, purchase_ts_us,
    purchase_event_id).  User-bucketed shuffle, fully vectorized
    per-bucket scan (sort + groupby-transform first-view position +
    positional purchase filter; no per-user pandas groups)."""
    ds = ray.data.read_parquet(
        f"{sf_dir}/events.parquet",
        columns=["event_id", "ts", "user_id", "event_type"],
    )
    num_buckets = 32

    def proj(df: pd.DataFrame) -> pd.DataFrame:
        return _vp_proj(df, num_buckets)

    def scan(df: pd.DataFrame) -> pd.DataFrame:
        d = df.sort_values(["user_id", "ts_us", "event_id"]).reset_index(
            drop=True
        )
        pos = pd.Series(range(len(d)), dtype="int64")
        # first-view position per user (len(d) when the user never views)
        vpos = pos.where(d["is_view"], len(d))
        first_view = vpos.groupby(d["user_id"]).transform("min")
        conv = (~d["is_view"]) & (pos > first_view)
        # first qualifying purchase per user = first row of the
        # position-ordered qualifying subset
        hits = d[conv].groupby("user_id", as_index=False).first()
        views = d[d["is_view"]].groupby("user_id", as_index=False).first()
        out = hits.merge(views, on="user_id", suffixes=("_p", "_v"))
        return pd.DataFrame(
            {
                "user_id": out["user_id"].astype("int64"),
                "view_ts_us": out["ts_us_v"].astype("int64"),
                "view_event_id": out["event_id_v"].astype("int64"),
                "purchase_ts_us": out["ts_us_p"].astype("int64"),
                "purchase_event_id": out["event_id_p"].astype("int64"),
            }
        )

    return (
        ds.map_batches(proj, batch_format="pandas")
        .groupby("kb")
        .map_groups(scan, batch_format="pandas")
    )


_SQL_EVENTS_FUNNEL = """
WITH e AS (
  SELECT user_id::BIGINT AS user_id, event_id::BIGINT AS event_id,
         epoch_us(ts) AS ts_us, event_type
  FROM events WHERE event_type IN ('view', 'purchase')
),
fv AS (
  SELECT user_id, ts_us, event_id FROM (
    SELECT user_id, ts_us, event_id,
           row_number() OVER (
             PARTITION BY user_id ORDER BY ts_us, event_id
           ) AS rn
    FROM e WHERE event_type = 'view'
  ) WHERE rn = 1
),
fp AS (
  SELECT user_id, ts_us, event_id FROM (
    SELECT p.user_id, p.ts_us, p.event_id,
           row_number() OVER (
             PARTITION BY p.user_id ORDER BY p.ts_us, p.event_id
           ) AS rn
    FROM e p JOIN fv USING (user_id)
    WHERE p.event_type = 'purchase'
      AND (p.ts_us > fv.ts_us
           OR (p.ts_us = fv.ts_us AND p.event_id > fv.event_id))
  ) WHERE rn = 1
)
SELECT fv.user_id,
       fv.ts_us::BIGINT AS view_ts_us,
       fv.event_id::BIGINT AS view_event_id,
       fp.ts_us::BIGINT AS purchase_ts_us,
       fp.event_id::BIGINT AS purchase_event_id
FROM fv JOIN fp USING (user_id)
"""


def q_events_retention(sf_dir: str):
    """Next-day retention cohorts: per first-activity day, how many
    users started that day and how many of them were active again the
    very next day.  User-bucketed shuffle → per-bucket vectorized
    day-set scan (each user's whole history is bucket-local) →
    day-scale groupby-sum of the partials."""
    ds = ray.data.read_parquet(
        f"{sf_dir}/events.parquet", columns=["ts", "user_id"]
    )
    num_buckets = 32
    us_day = 86_400_000_000

    def proj(df: pd.DataFrame) -> pd.DataFrame:
        day = (
            (df["ts"] - pd.Timestamp(0)) // pd.Timedelta(microseconds=1)
        ).astype("int64") // us_day
        return pd.DataFrame(
            {
                "kb": (df["user_id"].astype("int64") % num_buckets),
                "user_id": df["user_id"].astype("int64"),
                "day": day,
            }
        ).drop_duplicates(ignore_index=True)

    def cohort(df: pd.DataFrame) -> pd.DataFrame:
        d = df.drop_duplicates(["user_id", "day"])
        first = d.groupby("user_id", as_index=False)["day"].min().rename(
            columns={"day": "first_day"}
        )
        nxt = first.copy()
        nxt["day"] = nxt["first_day"] + 1
        hit = nxt.merge(d, on=["user_id", "day"], how="left", indicator=True)
        hit["retained"] = (hit["_merge"] == "both").astype("int64")
        g = hit.groupby("first_day", as_index=False).agg(
            n_users=("user_id", "size"), n_retained=("retained", "sum")
        )
        return g.astype(
            {"first_day": "int64", "n_users": "int64", "n_retained": "int64"}
        )

    parts = (
        ds.map_batches(proj, batch_format="pandas")
        .groupby("kb")
        .map_groups(cohort, batch_format="pandas")
        .to_pandas()
    )
    out = parts.groupby("first_day", as_index=False)[
        ["n_users", "n_retained"]
    ].sum()
    return out.astype("int64").sort_values("first_day", ignore_index=True)


_SQL_EVENTS_RETENTION = """
WITH ud AS (
  SELECT DISTINCT user_id, epoch_us(ts) // 86400000000 AS day FROM events
),
first AS (SELECT user_id, min(day) AS first_day FROM ud GROUP BY user_id)
SELECT f.first_day::BIGINT AS first_day,
       count(*)::BIGINT AS n_users,
       count(*) FILTER (
         WHERE EXISTS (
           SELECT 1 FROM ud WHERE ud.user_id = f.user_id
             AND ud.day = f.first_day + 1
         )
       )::BIGINT AS n_retained
FROM first f GROUP BY f.first_day
"""


def q_events_dau_wau(sf_dir: str):
    """Sliding DISTINCT-user windows — DAU and trailing-7-day WAU per
    observed day.  Distinct counts cannot be summed from daily partials,
    so each (user, day) pair fans out to the ≤7 future window ends it
    belongs to, a bucketed exact distinct collapses multiplicity, and a
    user-bucketed count makes each window's distinct-user count exact
    (every (user, window) lives in one bucket)."""
    from ..functions.kernel import distinct
    from ..util import bucket_count

    ds = ray.data.read_parquet(
        f"{sf_dir}/events.parquet", columns=["ts", "user_id"]
    )
    us_day = 86_400_000_000

    def pairs(df: pd.DataFrame) -> pd.DataFrame:
        day = (
            (df["ts"] - pd.Timestamp(0)) // pd.Timedelta(microseconds=1)
        ).astype("int64") // us_day
        return pd.DataFrame(
            {"user_id": df["user_id"].astype("int64"), "day": day}
        ).drop_duplicates(ignore_index=True)

    ud = distinct(
        ds.map_batches(pairs, batch_format="pandas"), ["user_id", "day"]
    ).materialize()

    def fan_out(df: pd.DataFrame) -> pd.DataFrame:
        # window ends beyond the observed range survive here; the final
        # inner merge onto dau's observed days drops them — no
        # driver-side observed-days set needed
        reps = df.loc[df.index.repeat(7)].reset_index(drop=True)
        reps["win"] = reps["day"] + pd.Series(
            list(range(7)) * len(df), dtype="int64"
        )
        return reps[["user_id", "win"]].reset_index(drop=True)

    wau = bucket_count(
        distinct(
            ud.map_batches(fan_out, batch_format="pandas"),
            ["user_id", "win"],
        ).map_batches(lambda df: df[["win"]], batch_format="pandas"),
        ["win"],
        out_col="wau",
    ).to_pandas()
    dau = bucket_count(
        ud.map_batches(lambda df: df[["day"]], batch_format="pandas"),
        ["day"],
        out_col="dau",
    ).to_pandas()
    out = dau.merge(wau.rename(columns={"win": "day"}), on="day")
    return out.astype("int64").sort_values("day", ignore_index=True)


_SQL_EVENTS_DAU_WAU = """
WITH ud AS (
  SELECT DISTINCT user_id, epoch_us(ts) // 86400000000 AS day FROM events
),
days AS (SELECT DISTINCT day FROM ud)
SELECT d.day::BIGINT AS day,
       (SELECT count(DISTINCT user_id) FROM ud WHERE ud.day = d.day
       )::BIGINT AS dau,
       (SELECT count(DISTINCT user_id) FROM ud
        WHERE ud.day BETWEEN d.day - 6 AND d.day)::BIGINT AS wau
FROM days d
"""


def q_events_attributed(sf_dir: str):
    """Attribution-window count join: for every purchase, how many
    'view' events the SAME user emitted in the strictly-preceding hour
    (ts_v ∈ (t−1h, t), exclusive both ends — µs ties with the purchase
    itself don't count).  User-bucketed shuffle; inside a bucket the
    count is two vectorized searchsorteds over composite
    (user << 42 | relative-µs) keys — no per-user loops, no pandas
    merge_asof tie ambiguity."""
    import numpy as np

    ds = ray.data.read_parquet(
        f"{sf_dir}/events.parquet",
        columns=["event_id", "ts", "user_id", "event_type"],
    )
    num_buckets = 32
    hour_us = 3_600_000_000

    def proj(df: pd.DataFrame) -> pd.DataFrame:
        return _vp_proj(df, num_buckets)

    def count_window(df: pd.DataFrame) -> pd.DataFrame:
        base = int(df["ts_us"].min())
        rel = (df["ts_us"] - base).to_numpy("int64")
        # dynamic time-bit width with an hour_us headroom margin, so
        # `pk - hour_us` can never borrow into the previous user's key
        # range (a fixed width silently bleeds windows across users
        # once the time span approaches 2^bits)
        bits = int(rel.max() + hour_us).bit_length() + 1
        users = df["user_id"].to_numpy("int64")
        if int(users.max()).bit_length() + bits > 62:
            raise ValueError(
                "events_attributed: user-id/time-span ranges overflow the "
                "composite int64 key — re-base timestamps or split the "
                "stream into shorter time ranges (bucket count does not "
                "change either range)"
            )
        key = (users << bits) | rel
        v = np.sort(key[df["is_view"].to_numpy()])
        pm = ~df["is_view"].to_numpy()
        pk = key[pm]
        lo = np.searchsorted(v, pk - hour_us, side="right")
        hi = np.searchsorted(v, pk, side="left")
        return pd.DataFrame(
            {
                "event_id": df.loc[pm, "event_id"].to_numpy(),
                "user_id": df.loc[pm, "user_id"].to_numpy(),
                "n_views_1h": (hi - lo).astype("int64"),
            }
        )

    return (
        ds.map_batches(proj, batch_format="pandas")
        .groupby("kb")
        .map_groups(count_window, batch_format="pandas")
    )


_SQL_EVENTS_ATTRIBUTED = """
SELECT p.event_id::BIGINT AS event_id, p.user_id::BIGINT AS user_id,
       count(v.event_id)::BIGINT AS n_views_1h
FROM events p LEFT JOIN events v
  ON v.user_id = p.user_id AND v.event_type = 'view'
 AND epoch_us(v.ts) > epoch_us(p.ts) - 3600000000
 AND epoch_us(v.ts) < epoch_us(p.ts)
WHERE p.event_type = 'purchase'
GROUP BY 1, 2
"""


QUERIES = {
    "cube_star_supp": q_cube_star_supp,
    "events_funnel": q_events_funnel,
    "events_retention": q_events_retention,
    "events_dau_wau": q_events_dau_wau,
    "events_attributed": q_events_attributed,
    "events_last_purchase": q_events_last_purchase,
    "events_session_assign": q_events_session_assign,
    "events_hourly": q_events_hourly,
    "events_sessionize": q_sessionize,
    "events_sliding": q_events_sliding,
    "events_topk_hourly": q_events_topk_hourly,
    "events_rollup": q_events_rollup,
    "events_user_cumsum": q_events_user_cumsum,
    "top_customers": q_top_customers,
}

ORACLES = {
    "cube_star_supp": _SQL_STAR_SUPP,
    "events_funnel": _SQL_EVENTS_FUNNEL,
    "events_retention": _SQL_EVENTS_RETENTION,
    "events_dau_wau": _SQL_EVENTS_DAU_WAU,
    "events_attributed": _SQL_EVENTS_ATTRIBUTED,
    "events_last_purchase": _SQL_LAST_PURCHASE,
    "events_session_assign": _SQL_SESSION_ASSIGN,
    "events_hourly": _SQL_EVENTS_HOURLY,
    "events_sessionize": _SQL_SESSIONIZE,
    "events_sliding": _SQL_EVENTS_SLIDING,
    "events_topk_hourly": _SQL_EVENTS_TOPK,
    "events_rollup": _SQL_EVENTS_ROLLUP,
    "events_user_cumsum": _SQL_EVENTS_USER_CUMSUM,
    "top_customers": _SQL_TOP_CUSTOMERS,
}


def q_events_scd(sf_dir: str):
    """SCD type-2 dimension build from a change stream (the CDC →
    warehouse-dimension pattern): per user, consecutive events with the
    same event_type collapse into one VERSION with a validity interval
    [valid_from_us, valid_to_us) — valid_to is the next change's
    timestamp, −1 for the open current version — plus a 1-based version
    number.

    Shape: user-bucketed ``groupby(bucket).map_groups`` (a user's whole
    stream lands in one pandas frame — the same co-location every
    sessionize/retention query here relies on), then ONE vectorized
    sort + shift-compare per bucket; no per-user pandas groups, no
    global sort.  Ties inside a user share a timestamp deterministically
    via the event_id tiebreak (mirrored in the oracle's window ORDER
    BY)."""
    import numpy as np

    ds = ray.data.read_parquet(
        f"{sf_dir}/events.parquet",
        columns=["event_id", "ts", "user_id", "event_type"],
    )

    def add_bucket(df: pd.DataFrame) -> pd.DataFrame:
        out = pd.DataFrame(
            {
                "user_id": df["user_id"].astype("int64"),
                "event_type": df["event_type"].astype("string"),
                "event_id": df["event_id"].astype("int64"),
                "ts_us": (
                    (df["ts"] - pd.Timestamp(0)) // pd.Timedelta(microseconds=1)
                ).astype("int64"),
            }
        )
        out["_b"] = (out["user_id"].to_numpy(np.int64) % 64).astype("int32")
        return out

    def scd(g: pd.DataFrame) -> pd.DataFrame:
        g = g.sort_values(["user_id", "ts_us", "event_id"], kind="stable")
        change = (g["user_id"] != g["user_id"].shift()) | (
            g["event_type"] != g["event_type"].shift()
        )
        s = g[change].copy()
        same_user = (
            s["user_id"].to_numpy() == s["user_id"].shift(-1).to_numpy()
        )
        nxt = s["ts_us"].shift(-1).to_numpy()
        s["valid_to_us"] = pd.Series(
            np.where(same_user, nxt, -1), index=s.index
        ).astype("int64")
        s["version"] = (s.groupby("user_id", sort=False).cumcount() + 1).astype(
            "int64"
        )
        s = s.rename(columns={"ts_us": "valid_from_us"})
        return s[
            ["user_id", "event_type", "valid_from_us", "valid_to_us", "version"]
        ].reset_index(drop=True)

    out = (
        ds.map_batches(add_bucket, batch_format="pandas")
        .groupby("_b")
        .map_groups(scd, batch_format="pandas")
        .to_pandas()
    )
    return out.reset_index(drop=True)


_SQL_EVENTS_SCD = """
WITH e AS (
  SELECT user_id, event_type, epoch_us(ts) AS ts_us, event_id FROM events
),
o AS (
  SELECT user_id, event_type, ts_us, event_id,
         lag(event_type) OVER w AS prev_type
  FROM e WINDOW w AS (PARTITION BY user_id ORDER BY ts_us, event_id)
),
c AS (
  SELECT user_id, event_type, ts_us AS valid_from_us, event_id
  FROM o WHERE prev_type IS NULL OR prev_type <> event_type
),
v AS (
  SELECT user_id, event_type, valid_from_us,
         coalesce(lead(valid_from_us) OVER w2, -1) AS valid_to_us,
         row_number() OVER w2 AS version
  FROM c WINDOW w2 AS (PARTITION BY user_id ORDER BY valid_from_us, event_id)
)
SELECT user_id::BIGINT AS user_id, event_type,
       valid_from_us::BIGINT AS valid_from_us,
       valid_to_us::BIGINT AS valid_to_us,
       version::BIGINT AS version
FROM v
"""

QUERIES["events_scd"] = q_events_scd
ORACLES["events_scd"] = _SQL_EVENTS_SCD


def q_events_late_data(sf_dir: str):
    """Watermark / out-of-order accounting — the bookkeeping a streaming
    ingest runs to size its allowed-lateness window: with event_id as
    the ARRIVAL order, each event's lateness is how far its event time
    sits behind the per-user high-watermark (running max of ts seen so
    far).  Vectorized per user-aligned bucket (sort by arrival +
    groupby cummax — no per-user pandas groups); all integers, so the
    window-function oracle is exact."""
    ds = ray.data.read_parquet(
        f"{sf_dir}/events.parquet", columns=["event_id", "ts", "user_id"]
    )
    num_buckets = 32

    def proj(df: pd.DataFrame) -> pd.DataFrame:
        return pd.DataFrame(
            {
                "kb": (df["user_id"].astype("int64") % num_buckets),
                "event_id": df["event_id"].astype("int64"),
                "user_id": df["user_id"].astype("int64"),
                "ts_us": (
                    (df["ts"] - pd.Timestamp(0)) // pd.Timedelta(microseconds=1)
                ).astype("int64"),
            }
        )

    def scan(df: pd.DataFrame) -> pd.DataFrame:
        d = df.sort_values(["user_id", "event_id"])
        wm = d.groupby("user_id", sort=False)["ts_us"].cummax()
        d = d.assign(
            lateness_us=(wm - d["ts_us"]).astype("int64"),
            is_late=(wm > d["ts_us"]),
        )
        return d[["event_id", "user_id", "ts_us", "lateness_us", "is_late"]]

    out = (
        ds.map_batches(proj, batch_format="pandas")
        .groupby("kb")
        .map_groups(scan, batch_format="pandas")
        .to_pandas()
    )
    if not len(out):
        return out
    for c in ("event_id", "user_id", "ts_us", "lateness_us"):
        out[c] = out[c].astype("int64")
    return out.reset_index(drop=True)


_SQL_LATE_DATA = """
WITH e AS (
  SELECT event_id, user_id, epoch_us(ts) AS ts_us,
         max(epoch_us(ts)) OVER (
           PARTITION BY user_id ORDER BY event_id
           ROWS UNBOUNDED PRECEDING
         ) AS wm
  FROM events
)
SELECT event_id::BIGINT AS event_id, user_id::BIGINT AS user_id,
       ts_us::BIGINT AS ts_us,
       (wm - ts_us)::BIGINT AS lateness_us,
       wm > ts_us AS is_late
FROM e
"""

QUERIES["events_late_data"] = q_events_late_data
ORACLES["events_late_data"] = _SQL_LATE_DATA


def cdc_merge(
    base: "ray.data.Dataset",
    feed: "ray.data.Dataset",
    *,
    key: str,
    seq_col: str = "seq",
    op_col: str = "op",
    num_buckets: int = 64,
) -> "ray.data.Dataset":
    """Lakehouse MERGE: apply a change feed (op 'U' upsert / 'D' delete,
    totally ordered per key by ``seq_col``) to a base table — the
    compaction step of any CDC ingest.  ``base`` rows are implicit
    inserts at seq 0; the surviving row per key is the one with the
    highest seq, dropped entirely when that op is a delete.

    Same scale shape as stages/dedup.latest_snapshot: map-side per-batch
    pre-resolve (combiner — shuffle traffic is keys-per-block, not
    feed-scale), ONE coarse key-hash bucket shuffle, vectorized
    ``sort_values + drop_duplicates(keep='last')`` per bucket, then the
    delete filter."""
    from ..util import bucket_agg, heal_schema

    def tag_base(df: pd.DataFrame) -> pd.DataFrame:
        out = df.copy()
        out[seq_col] = pd.Series([0] * len(out), dtype="int64", index=out.index)
        out[op_col] = pd.Series(["I"] * len(out), dtype="string", index=out.index)
        return out

    def pre(df: pd.DataFrame) -> pd.DataFrame:
        return df.sort_values([key, seq_col]).drop_duplicates(
            [key], keep="last"
        )

    both = heal_schema(base.map_batches(tag_base, batch_format="pandas"), 8).union(
        heal_schema(feed, 8)
    ).map_batches(pre, batch_format="pandas")

    def resolve(df: pd.DataFrame) -> pd.DataFrame:
        last = df.sort_values([key, seq_col]).drop_duplicates(
            [key], keep="last"
        )
        out = last[last[op_col] != "D"].drop(columns=[seq_col, op_col])
        return out.reset_index(drop=True)

    return bucket_agg(both, [key], resolve, num_buckets=num_buckets)


def q_events_cdc_merge(sf_dir: str):
    """CDC MERGE demo over the event table: a deterministic change feed
    (event_id % 7 == 0 → upsert with value + 1000 at seq 1;
    event_id % 13 == 0 → delete at seq 2, so ids divisible by 91 are
    updated THEN deleted) applied with pipelines/relational.cdc_merge.
    The oracle replays the same feed with a window row_number."""
    ds = ray.data.read_parquet(
        f"{sf_dir}/events.parquet",
        columns=["event_id", "user_id", "event_type", "value"],
    )

    def proj(df: pd.DataFrame) -> pd.DataFrame:
        return pd.DataFrame(
            {
                "event_id": df["event_id"].astype("int64"),
                "user_id": df["user_id"].astype("int64"),
                "event_type": df["event_type"].astype("string"),
                "value": df["value"].astype("float64"),
            }
        )

    base = ds.map_batches(proj, batch_format="pandas")

    def make_feed(df: pd.DataFrame) -> pd.DataFrame:
        d = proj(df)
        ups = d[d["event_id"] % 7 == 0].copy()
        ups["value"] = ups["value"] + 1000.0
        ups["seq"] = pd.Series([1] * len(ups), dtype="int64", index=ups.index)
        ups["op"] = pd.Series(["U"] * len(ups), dtype="string", index=ups.index)
        dels = d[d["event_id"] % 13 == 0].copy()
        dels["seq"] = pd.Series([2] * len(dels), dtype="int64", index=dels.index)
        dels["op"] = pd.Series(["D"] * len(dels), dtype="string", index=dels.index)
        return pd.concat([ups, dels], ignore_index=True)

    feed = ds.map_batches(make_feed, batch_format="pandas")
    out = cdc_merge(base, feed, key="event_id").to_pandas()
    if not len(out):
        return out
    for c in ("event_id", "user_id"):
        out[c] = out[c].astype("int64")
    return out.reset_index(drop=True)


_SQL_CDC_MERGE = """
WITH b AS (
  SELECT event_id, user_id, event_type, value, 0 AS seq, 'I' AS op
  FROM events
),
f AS (
  SELECT event_id, user_id, event_type, value + 1000.0 AS value,
         1 AS seq, 'U' AS op
  FROM events WHERE event_id % 7 = 0
  UNION ALL
  SELECT event_id, user_id, event_type, value, 2 AS seq, 'D' AS op
  FROM events WHERE event_id % 13 = 0
),
a AS (SELECT * FROM b UNION ALL SELECT * FROM f),
r AS (
  SELECT *, row_number() OVER (PARTITION BY event_id ORDER BY seq DESC) AS rn
  FROM a
)
SELECT event_id::BIGINT AS event_id, user_id::BIGINT AS user_id,
       event_type, value
FROM r WHERE rn = 1 AND op <> 'D'
"""

QUERIES["events_cdc_merge"] = q_events_cdc_merge
ORACLES["events_cdc_merge"] = _SQL_CDC_MERGE


# -- Z-order (Morton) storage layout ----------------------------------------


def q_events_zorder(sf_dir: str):
    """Multi-dimensional storage layout: the Z-order (Morton) curve
    over (user_id, event minute), the standard data-clustering key for
    parquet layouts that must serve both user-keyed and time-ranged
    scans.  16 bits per dimension interleave to a 32-bit z-code
    (vectorized magic-number bit spreading, no per-row loop); the top 8
    bits are the coarse range-partition id a writer would direct output
    files by.  Pure map-side — layout assignment shuffles nothing."""
    import numpy as np

    import ray.data

    events = ray.data.read_parquet(
        f"{sf_dir}/events.parquet", columns=["event_id", "ts", "user_id"]
    )

    def z(df: pd.DataFrame) -> pd.DataFrame:
        a = (df["user_id"].to_numpy().astype(np.int64) % 65536).astype(
            np.uint64
        )
        minutes = (
            (df["ts"] - pd.Timestamp(0)) // pd.Timedelta(minutes=1)
        ).to_numpy().astype(np.int64)
        b = (minutes % 65536).astype(np.uint64)

        def spread(x: np.ndarray) -> np.ndarray:
            x = (x | (x << np.uint64(8))) & np.uint64(0x00FF00FF)
            x = (x | (x << np.uint64(4))) & np.uint64(0x0F0F0F0F)
            x = (x | (x << np.uint64(2))) & np.uint64(0x33333333)
            x = (x | (x << np.uint64(1))) & np.uint64(0x55555555)
            return x

        zc = (spread(a) | (spread(b) << np.uint64(1))).astype(np.int64)
        return pd.DataFrame(
            {
                "event_id": df["event_id"].astype("int64"),
                "z": pd.array(zc, dtype="int64"),
                "zbucket": pd.array(zc >> 24, dtype="int64"),
            }
        )

    return events.map_batches(z, batch_format="pandas")


_SQL_ZORDER = r"""
WITH ab AS (
  SELECT event_id,
         (user_id % 65536)::BIGINT AS a,
         ((epoch_us(ts) // 60000000) % 65536)::BIGINT AS b
  FROM events
),
zz AS (
  SELECT event_id,
         list_sum(list_transform(generate_series(0, 15),
           i -> (((a >> i) & 1) << (2 * i))
              + (((b >> i) & 1) << (2 * i + 1))))::BIGINT AS z
  FROM ab
)
SELECT event_id, z, (z >> 24)::BIGINT AS zbucket FROM zz
"""

QUERIES["events_zorder"] = q_events_zorder
ORACLES["events_zorder"] = _SQL_ZORDER


# -- JSONL sink/source round trip -------------------------------------------


def q_events_jsonl_roundtrip(sf_dir: str):
    """Multi-format IO surface: export the event stream to partitioned
    JSONL (one file per block — the resumable-sink layout), read it
    back with the JSON source, and aggregate per event type.  The
    oracle computes the same aggregate straight from parquet, so any
    row lost, duplicated, or value-mangled by the serialize→parse hop
    breaks the hash.  The aggregate is a ~5-key groupby (fine for Ray's
    per-key Aggregate); the result materializes before the scratch
    directory is removed."""
    import shutil
    import tempfile

    import ray.data

    ds = ray.data.read_parquet(
        f"{sf_dir}/events.parquet",
        columns=["event_id", "event_type", "user_id"],
    )
    out_dir = tempfile.mkdtemp(prefix="graft_jsonl_rt_")
    try:
        # fresh mkdtemp per call: Ray file sinks APPEND into existing
        # directories, so reusing a path would double-count on re-runs
        ds.write_json(out_dir)
        back = ray.data.read_json(out_dir)

        def partial(df: pd.DataFrame) -> pd.DataFrame:
            g = df.groupby("event_type", as_index=False).agg(
                n=("event_id", "size"), uid_sum=("user_id", "sum")
            )
            return g.astype(
                {"event_type": "string", "n": "int64", "uid_sum": "int64"}
            )

        res = (
            back.map_batches(partial, batch_format="pandas")
            .groupby("event_type")
            .sum(["n", "uid_sum"])
        )
        out = res.to_pandas()
    finally:
        shutil.rmtree(out_dir, ignore_errors=True)
    out = out.rename(
        columns={"sum(n)": "n", "sum(uid_sum)": "uid_sum"}
    ).astype({"event_type": "string", "n": "int64", "uid_sum": "int64"})
    return out.sort_values("event_type", ignore_index=True)


_SQL_JSONL_RT = """
SELECT event_type,
       count(*)::BIGINT AS n,
       sum(user_id)::BIGINT AS uid_sum
FROM events GROUP BY event_type
"""

QUERIES["events_jsonl_roundtrip"] = q_events_jsonl_roundtrip
ORACLES["events_jsonl_roundtrip"] = _SQL_JSONL_RT


# -- trailing-window spike (anomaly) detection ------------------------------

# tuning defaults shared by the Ray side and the oracle SQL: the oracle is
# generated from the SAME constant, so the two sides cannot drift
_SPIKE_WIN = 8


def q_events_spike(sf_dir: str, win: int = _SPIKE_WIN):
    """Streaming anomaly rule over the event stream: for every
    (event_type, hour) cell — hours taken densely over the corpus'
    global [min, max] hour range, zero-filled — flag a spike when
    ``n * win > 3 * trailing-win-hour sum`` once a full window of
    history exists.  Integer arithmetic only (cross-multiplied rule, no
    ratios) so the oracle hash-matches.  Hourly counts aggregate via a
    coarse-bucketed partial (hour keys scale with the time range —
    never a raw Ray per-key aggregate); the dense per-type series is
    rebuilt inside a per-type map_groups (event-type cardinality is
    small and bounded) with a vectorized cumsum-difference window."""
    import ray.data

    from ..util import bucket_sum

    ds = ray.data.read_parquet(
        f"{sf_dir}/events.parquet", columns=["ts", "event_type"]
    )

    def partial(df: pd.DataFrame) -> pd.DataFrame:
        hour_id = ((df["ts"] - pd.Timestamp(0)) // pd.Timedelta(hours=1)).astype(
            "int64"
        )
        g = (
            pd.DataFrame({"event_type": df["event_type"], "hour_id": hour_id})
            .groupby(["event_type", "hour_id"], as_index=False)
            .size()
            .rename(columns={"size": "n"})
        )
        return g.astype({"event_type": "string", "hour_id": "int64", "n": "int64"})

    counts = bucket_sum(
        ds.map_batches(partial, batch_format="pandas"),
        ["event_type", "hour_id"],
        ["n"],
    ).materialize()

    # global dense hour range: two scalar aggregates, broadcast
    lo = counts.min("hour_id")
    hi = counts.max("hour_id")

    def per_type(df: pd.DataFrame) -> pd.DataFrame:
        et = df["event_type"].iloc[0]
        dense = (
            df.set_index("hour_id")["n"]
            .reindex(range(lo, hi + 1), fill_value=0)
            .astype("int64")
        )
        n = dense.to_numpy()
        c = np.concatenate([[0], np.cumsum(n)])
        # trailing sum over [h-win, h-1]
        idx = np.arange(len(n))
        prev = np.where(idx >= win, c[idx] - c[np.maximum(idx - win, 0)], 0)
        spike = ((idx >= win) & (n * win > 3 * prev)).astype("int64")
        return pd.DataFrame(
            {
                "event_type": pd.Series([et] * len(n), dtype="string"),
                "hour_id": pd.array(dense.index.to_numpy(), dtype="int64"),
                "n": n,
                "prev_sum": pd.array(prev, dtype="int64"),
                "spike": spike,
            }
        )

    return counts.groupby("event_type").map_groups(
        per_type, batch_format="pandas"
    )


_SQL_EVENTS_SPIKE = f"""
WITH c AS (
  SELECT event_type, (epoch_us(ts) // 3600000000)::BIGINT AS hour_id,
         count(*)::BIGINT AS n
  FROM events GROUP BY 1, 2
),
rng AS (SELECT min(hour_id) AS lo, max(hour_id) AS hi FROM c),
hours AS (
  SELECT unnest(generate_series(lo, hi)) AS hour_id FROM rng
),
types AS (SELECT DISTINCT event_type FROM c),
dense AS (
  SELECT t.event_type, h.hour_id, coalesce(c.n, 0)::BIGINT AS n,
         (h.hour_id - (SELECT lo FROM rng))::BIGINT AS idx
  FROM types t CROSS JOIN hours h
  LEFT JOIN c ON c.event_type = t.event_type AND c.hour_id = h.hour_id
),
w AS (
  SELECT event_type, hour_id, n, idx,
         coalesce(sum(n) OVER (
           PARTITION BY event_type ORDER BY hour_id
           ROWS BETWEEN {_SPIKE_WIN} PRECEDING AND 1 PRECEDING), 0)::BIGINT AS prev_sum
  FROM dense
)
SELECT event_type, hour_id, n,
       CASE WHEN idx >= {_SPIKE_WIN} THEN prev_sum ELSE 0 END AS prev_sum,
       CASE WHEN idx >= {_SPIKE_WIN} AND n * {_SPIKE_WIN} > 3 * prev_sum
            THEN 1 ELSE 0 END::BIGINT AS spike
FROM w
"""

QUERIES["events_spike"] = q_events_spike
ORACLES["events_spike"] = _SQL_EVENTS_SPIKE


# -- zone-map (page min/max) metadata build ---------------------------------

_ZONE_PAGE = 256  # shared by the Ray side and the oracle SQL (see _SPIKE_WIN)


def q_events_zonemap(sf_dir: str, page: int = _ZONE_PAGE):
    """Storage-layout metadata: per-page zone maps (min/max/count over
    fixed ``event_id // page`` pages) for the scan planner's predicate
    pruning — the statistics a writer emits next to each page so a
    reader can skip pages whose [min, max] misses the filter.  Pages
    are keyed by the stable event_id (not by physical block, which
    would not be deterministic across runs).  Map-side partials per
    batch, one coarse-bucketed merge — page count scales with data, so
    it never becomes a per-key Ray aggregate."""
    import ray.data

    from ..util import bucket_agg

    ds = ray.data.read_parquet(
        f"{sf_dir}/events.parquet", columns=["event_id", "ts", "user_id"]
    )

    def partial(df: pd.DataFrame) -> pd.DataFrame:
        ts_us = ((df["ts"] - pd.Timestamp(0)) // pd.Timedelta(microseconds=1)).astype(
            "int64"
        )
        g = pd.DataFrame(
            {
                "page": (df["event_id"].astype("int64") // page),
                "ts_us": ts_us,
                "user_id": df["user_id"].astype("int64"),
            }
        ).groupby("page", as_index=False).agg(
            n=("user_id", "size"),
            ts_min=("ts_us", "min"),
            ts_max=("ts_us", "max"),
            uid_min=("user_id", "min"),
            uid_max=("user_id", "max"),
        )
        return g.astype("int64")

    def merge(df: pd.DataFrame) -> pd.DataFrame:
        g = df.groupby("page", as_index=False).agg(
            n=("n", "sum"),
            ts_min=("ts_min", "min"),
            ts_max=("ts_max", "max"),
            uid_min=("uid_min", "min"),
            uid_max=("uid_max", "max"),
        )
        return g.astype("int64")

    return bucket_agg(
        ds.map_batches(partial, batch_format="pandas"), ["page"], merge
    )


_SQL_ZONEMAP = f"""
SELECT (event_id // {_ZONE_PAGE})::BIGINT AS page,
       count(*)::BIGINT AS n,
       min(epoch_us(ts))::BIGINT AS ts_min,
       max(epoch_us(ts))::BIGINT AS ts_max,
       min(user_id)::BIGINT AS uid_min,
       max(user_id)::BIGINT AS uid_max
FROM events GROUP BY 1
"""

QUERIES["events_zonemap"] = q_events_zonemap
ORACLES["events_zonemap"] = _SQL_ZONEMAP

QUERIES["events_changelog"] = q_events_changelog
ORACLES["events_changelog"] = _SQL_CHANGELOG


def q_events_pruned_scan(sf_dir: str, page: int = _ZONE_PAGE):
    """Zone-map predicate pruning, end to end: build the per-page
    [ts_min, ts_max] zones (q_events_zonemap's metadata), select ONLY
    the pages whose zone intersects the time filter, scan just those
    pages with the real predicate, and prove the pruned scan is
    LOSSLESS — the oracle computes row count and uid_sum over the FULL
    table, so a zone map that skipped a qualifying row would
    hash-mismatch.  The zone table is metadata-scale (rows / page
    size), so the planner-side to_pandas is bounded; the qualifying
    page set broadcasts via ray.put."""
    import ray
    import ray.data

    from ..util import bucket_sum

    t1 = (
        pd.Timestamp("2024-01-01 12:00:00") - pd.Timestamp(0)
    ) // pd.Timedelta(microseconds=1)
    t2 = (
        pd.Timestamp("2024-01-02 00:00:00") - pd.Timestamp(0)
    ) // pd.Timedelta(microseconds=1)

    zones = q_events_zonemap(sf_dir, page=page).to_pandas()
    qual = zones[(zones["ts_max"] >= t1) & (zones["ts_min"] < t2)]["page"]
    n_pages_total = len(zones)
    n_pages_scanned = len(qual)
    pages_ref = ray.put(set(int(p) for p in qual))

    ds = ray.data.read_parquet(
        f"{sf_dir}/events.parquet", columns=["event_id", "ts", "user_id"]
    )

    def scan(df: pd.DataFrame) -> pd.DataFrame:
        pages = ray.get(pages_ref)
        keep = (df["event_id"].astype("int64") // page).isin(pages)
        d = df[keep]
        ts_us = (
            (d["ts"] - pd.Timestamp(0)) // pd.Timedelta(microseconds=1)
        ).astype("int64")
        hit = (ts_us >= t1) & (ts_us < t2)
        return pd.DataFrame(
            {
                "k": pd.Series([0], dtype="int64"),
                "n_rows": pd.Series([int(hit.sum())], dtype="int64"),
                "uid_sum": pd.Series(
                    [int(d.loc[hit, "user_id"].astype("int64").sum())],
                    dtype="int64",
                ),
            }
        )

    agg = bucket_sum(
        ds.map_batches(scan, batch_format="pandas"),
        ["k"],
        ["n_rows", "uid_sum"],
        num_buckets=1,
    ).to_pandas()
    return pd.DataFrame(
        {
            "n_pages_scanned": pd.Series([n_pages_scanned], dtype="int64"),
            "n_pages_total": pd.Series([n_pages_total], dtype="int64"),
            "n_rows": agg["n_rows"].astype("int64"),
            "uid_sum": agg["uid_sum"].astype("int64"),
        }
    )


_SQL_PRUNED_SCAN = f"""
WITH z AS (
  SELECT event_id // {_ZONE_PAGE} AS page,
         min(epoch_us(ts)) AS ts_min, max(epoch_us(ts)) AS ts_max
  FROM events GROUP BY 1
),
b AS (
  SELECT epoch_us(TIMESTAMP '2024-01-01 12:00:00') AS t1,
         epoch_us(TIMESTAMP '2024-01-02 00:00:00') AS t2
)
SELECT
  (SELECT count(*) FROM z, b WHERE ts_max >= t1 AND ts_min < t2)::BIGINT
    AS n_pages_scanned,
  (SELECT count(*) FROM z)::BIGINT AS n_pages_total,
  (SELECT count(*) FROM events, b
    WHERE epoch_us(ts) >= t1 AND epoch_us(ts) < t2)::BIGINT AS n_rows,
  (SELECT coalesce(sum(user_id), 0) FROM events, b
    WHERE epoch_us(ts) >= t1 AND epoch_us(ts) < t2)::BIGINT AS uid_sum
"""

QUERIES["events_pruned_scan"] = q_events_pruned_scan
ORACLES["events_pruned_scan"] = _SQL_PRUNED_SCAN


_TOPK_SESSIONS = 20  # shared by the Ray side and the oracle SQL


def q_events_top_sessions(sf_dir: str, k: int = _TOPK_SESSIONS):
    """Top-k engagement sessions: the sessionize output ranked by
    (duration DESC, n_events DESC, user, session) — duration is an
    integer µs span, so the order is total and the oracle reproduces
    the exact k rows.  Sessions are session-scale, but the top-k still
    resolves via per-block candidates (never a global sort)."""
    ds = sessionize_ds(sf_dir)

    def with_dur(df: pd.DataFrame) -> pd.DataFrame:
        out = df.copy()
        out["duration_us"] = (
            out["end_us"].astype("int64") - out["start_us"].astype("int64")
        )
        return out

    def block_topk(df: pd.DataFrame) -> pd.DataFrame:
        return df.sort_values(
            ["duration_us", "n_events", "user_id", "session_id"],
            ascending=[False, False, True, True],
        ).head(k)

    cands = (
        ds.map_batches(with_dur, batch_format="pandas")
        .map_batches(block_topk, batch_format="pandas")
        .to_pandas()
    )
    if not len(cands):
        return pd.DataFrame(
            {
                c: pd.Series(dtype="int64")
                for c in ("user_id", "session_id", "n_events", "duration_us")
            }
        )
    out = (
        cands.sort_values(
            ["duration_us", "n_events", "user_id", "session_id"],
            ascending=[False, False, True, True],
        )
        .head(k)[["user_id", "session_id", "n_events", "duration_us"]]
        .reset_index(drop=True)
    )
    return out.astype("int64")


_SQL_TOP_SESSIONS = f"""
WITH sess AS ({_SQL_SESSIONIZE})
SELECT user_id, session_id, n_events,
       (end_us - start_us)::BIGINT AS duration_us
FROM sess
QUALIFY row_number() OVER (
  ORDER BY end_us - start_us DESC, n_events DESC, user_id, session_id
) <= {_TOPK_SESSIONS}
"""

QUERIES["events_top_sessions"] = q_events_top_sessions
ORACLES["events_top_sessions"] = _SQL_TOP_SESSIONS


# -- OHLC bars (time-series candle aggregation) ------------------------------


def q_events_ohlc(sf_dir: str):
    """Hourly OHLC bars per event type: open = value at the earliest
    (ts, event_id), close = at the latest, high/low = max/min value,
    n = count — the candle aggregation a metrics/market feed compacts
    into.  Open/close are NOT algebraic aggregates, so each map-side
    partial carries its candidate row's (ts_us, event_id) key and the
    bucketed merge re-arg-min/maxes over partials — still one coarse
    shuffle, never a per-key Ray aggregate or a global sort."""
    import ray.data

    from ..util import bucket_agg

    ds = ray.data.read_parquet(
        f"{sf_dir}/events.parquet",
        columns=["ts", "event_id", "event_type", "value"],
    )

    def partial(df: pd.DataFrame) -> pd.DataFrame:
        ts_us = (
            (df["ts"] - pd.Timestamp(0)) // pd.Timedelta(microseconds=1)
        ).astype("int64")
        d = pd.DataFrame(
            {
                "event_type": df["event_type"].astype("string"),
                "hour_id": ts_us // 3_600_000_000,
                "ts_us": ts_us,
                "event_id": df["event_id"].astype("int64"),
                "value": df["value"].astype("float64"),
            }
        ).sort_values(["event_type", "hour_id", "ts_us", "event_id"])
        g = d.groupby(["event_type", "hour_id"], sort=False)
        out = g.agg(
            n=("value", "size"),
            high_value=("value", "max"),
            low_value=("value", "min"),
            open_value=("value", "first"),
            open_ts=("ts_us", "first"),
            open_id=("event_id", "first"),
            close_value=("value", "last"),
            close_ts=("ts_us", "last"),
            close_id=("event_id", "last"),
        ).reset_index()
        return out

    def merge(df: pd.DataFrame) -> pd.DataFrame:
        keys = ["event_type", "hour_id"]
        d = df.sort_values(keys + ["open_ts", "open_id"])
        g = d.groupby(keys, sort=False)
        out = g.agg(
            n=("n", "sum"),
            high_value=("high_value", "max"),
            low_value=("low_value", "min"),
            open_value=("open_value", "first"),
        ).reset_index()
        dc = df.sort_values(keys + ["close_ts", "close_id"])
        cl = (
            dc.groupby(keys, sort=False)
            .agg(close_value=("close_value", "last"))
            .reset_index()
        )
        out = out.merge(cl, on=keys)
        return out.astype({"n": "int64", "hour_id": "int64"})[
            keys + ["n", "open_value", "high_value", "low_value", "close_value"]
        ]

    return bucket_agg(
        ds.map_batches(partial, batch_format="pandas"),
        ["event_type", "hour_id"],
        merge,
    )


_SQL_EVENTS_OHLC = """
WITH e AS (
  SELECT event_type, (epoch_us(ts) // 3600000000)::BIGINT AS hour_id,
         epoch_us(ts)::BIGINT AS ts_us, event_id, value
  FROM events
),
agg AS (
  SELECT event_type, hour_id, count(*)::BIGINT AS n,
         max(value) AS high_value, min(value) AS low_value
  FROM e GROUP BY 1, 2
),
o AS (
  SELECT event_type, hour_id, value AS open_value FROM e
  QUALIFY row_number() OVER (
    PARTITION BY event_type, hour_id ORDER BY ts_us, event_id) = 1
),
c AS (
  SELECT event_type, hour_id, value AS close_value FROM e
  QUALIFY row_number() OVER (
    PARTITION BY event_type, hour_id ORDER BY ts_us DESC, event_id DESC) = 1
)
SELECT a.event_type, a.hour_id, a.n,
       o.open_value, a.high_value, a.low_value, c.close_value
FROM agg a
JOIN o USING (event_type, hour_id)
JOIN c USING (event_type, hour_id)
"""

QUERIES["events_ohlc"] = q_events_ohlc
ORACLES["events_ohlc"] = _SQL_EVENTS_OHLC


# -- CUBE grouping sets -------------------------------------------------------


def q_events_cube(sf_dir: str):
    """GROUP BY CUBE(event_type, dow): all four grouping sets — (type,
    dow), (type), (dow), () — computed in ONE pass: each map-side batch
    emits its partial rows for every set (rolled-up levels use the
    '(all)' / -1 sentinels, exactly the labels the SQL twin emits), and
    one coarse bucketed sum merges them.  A warehouse-style rollup
    without running four separate aggregations or shuffling the fact
    table four times.  Integer aggregates only (count + user_id sum) so
    the hashes match bit-for-bit."""
    import ray.data

    from ..util import bucket_sum

    ds = ray.data.read_parquet(
        f"{sf_dir}/events.parquet", columns=["ts", "event_type", "user_id"]
    )

    def partial(df: pd.DataFrame) -> pd.DataFrame:
        # epoch-day-of-week, 0 = Thursday (1970-01-01); pure integer
        # arithmetic mirrored by the oracle, no calendar dependency
        dow = (
            ((df["ts"] - pd.Timestamp(0)) // pd.Timedelta(days=1)) % 7
        ).astype("int64")
        base = pd.DataFrame(
            {
                "event_type": df["event_type"].astype("string"),
                "dow": dow,
                "n": np.int64(1),
                "uid_sum": df["user_id"].astype("int64"),
            }
        )
        outs = []
        for roll_type, roll_dow in (
            (False, False), (False, True), (True, False), (True, True)
        ):
            g = base.copy()
            if roll_type:
                g["event_type"] = pd.Series(
                    ["(all)"] * len(g), dtype="string", index=g.index
                )
            if roll_dow:
                g["dow"] = np.int64(-1)
            outs.append(
                g.groupby(["event_type", "dow"], as_index=False, sort=False)
                .agg(n=("n", "sum"), uid_sum=("uid_sum", "sum"))
            )
        out = pd.concat(outs, ignore_index=True)
        return out.astype(
            {"event_type": "string", "dow": "int64",
             "n": "int64", "uid_sum": "int64"}
        )

    return bucket_sum(
        ds.map_batches(partial, batch_format="pandas"),
        ["event_type", "dow"],
        ["n", "uid_sum"],
    )


_SQL_EVENTS_CUBE = """
WITH e AS (
  SELECT event_type,
         ((epoch_us(ts) // 86400000000) % 7)::BIGINT AS dow,
         user_id
  FROM events
)
SELECT coalesce(event_type, '(all)') AS event_type,
       coalesce(dow, -1)::BIGINT AS dow,
       count(*)::BIGINT AS n,
       sum(user_id)::BIGINT AS uid_sum
FROM e
GROUP BY CUBE (event_type, dow)
"""

QUERIES["events_cube"] = q_events_cube
ORACLES["events_cube"] = _SQL_EVENTS_CUBE


def q_events_temporal_reach(sf_dir: str):
    """Time-respecting reachability (information flow / contagion) over
    the event stream: per props-channel k, consecutive events form a
    directed contact (prev_user → user at the later event's timestamp);
    a user is reached when a strictly time-increasing contact path from
    the seed arrives (stages/graph.temporal_reachability — synchronous
    Jacobi rounds, size-adaptive driver/distributed regimes).  Plain
    BFS over the static projection would overcount by following
    contacts backwards in time.  Channels are a fixed ~100-value space,
    so the per-channel lag runs as one Ray groupby-map_groups (groupby
    on ≤~100 keys is the documented cheap regime)."""
    from ..stages.graph import temporal_reachability

    ds = ray.data.read_parquet(
        f"{sf_dir}/events.parquet",
        columns=["event_id", "ts", "user_id", "props"],
    )

    def project(df: pd.DataFrame) -> pd.DataFrame:
        return pd.DataFrame(
            {
                "k": df["props"]
                .str.extract(r'"k": (\d+)', expand=False)
                .astype("int64"),
                "t": (
                    (df["ts"] - pd.Timestamp(0))
                    // pd.Timedelta(microseconds=1)
                ).astype("int64"),
                "event_id": df["event_id"].astype("int64"),
                "user": df["user_id"].astype("int64"),
            }
        )

    def channel_edges(df: pd.DataFrame) -> pd.DataFrame:
        df = df.sort_values(["t", "event_id"])
        src = df["user"].shift(1)
        keep = src.notna() & (src != df["user"])
        return pd.DataFrame(
            {
                "src": src[keep].astype("int64").astype(str),
                "dst": df["user"][keep].astype("int64").astype(str),
                "t": df["t"][keep].astype("int64"),
            }
        )

    contacts = (
        ds.map_batches(project, batch_format="pandas")
        .groupby("k")
        .map_groups(channel_edges, batch_format="pandas")
    )
    reached = temporal_reachability(
        contacts, [str(_TEMPORAL_SEED)]
    ).to_pandas()
    if not len(reached):
        return pd.DataFrame(
            {
                "user_id": pd.Series(dtype="int64"),
                "arrival_us": pd.Series(dtype="int64"),
            }
        )
    return pd.DataFrame(
        {
            "user_id": reached["node"].astype("int64"),
            "arrival_us": reached["arrival"].astype("int64"),
        }
    )


_TEMPORAL_SEED = 0

_SQL_TEMPORAL_REACH = rf"""
WITH RECURSIVE ev AS (
  SELECT event_id, user_id, epoch_us(ts) AS t,
         CAST(regexp_extract(props, '"k": (\d+)', 1) AS BIGINT) AS k
  FROM events
),
c AS (
  SELECT lag(user_id) OVER (PARTITION BY k ORDER BY t, event_id) AS src,
         user_id AS dst, t
  FROM ev
),
contacts AS (SELECT src, dst, t FROM c WHERE src IS NOT NULL AND src <> dst),
reach(u, t) AS (
  SELECT {_TEMPORAL_SEED}::BIGINT AS u, 0::BIGINT AS t
  UNION
  SELECT contacts.dst, contacts.t FROM reach JOIN contacts
    ON contacts.src = reach.u AND contacts.t > reach.t
)
SELECT u AS user_id, min(t)::BIGINT AS arrival_us FROM reach GROUP BY u
"""

QUERIES["events_temporal_reach"] = q_events_temporal_reach
ORACLES["events_temporal_reach"] = _SQL_TEMPORAL_REACH


def q_events_csv_roundtrip(sf_dir: str):
    """CSV source/sink surface: export the event stream to partitioned
    CSV (one file per block), read it back with the CSV source, and
    aggregate per event type — the q_events_jsonl_roundtrip twin for
    the remaining columnar-text format.  Any row lost, duplicated, or
    value-mangled by the serialize→parse hop (quoting, type
    re-inference) breaks the hash against the straight-from-parquet
    oracle."""
    import shutil
    import tempfile

    import ray.data

    ds = ray.data.read_parquet(
        f"{sf_dir}/events.parquet",
        columns=["event_id", "event_type", "user_id"],
    )
    out_dir = tempfile.mkdtemp(prefix="graft_csv_rt_")
    try:
        # fresh mkdtemp per call: Ray file sinks APPEND into existing
        # directories, so reusing a path would double-count on re-runs
        ds.write_csv(out_dir)
        back = ray.data.read_csv(out_dir)

        def partial(df: pd.DataFrame) -> pd.DataFrame:
            g = df.groupby("event_type", as_index=False).agg(
                n=("event_id", "size"), uid_sum=("user_id", "sum")
            )
            return g.astype(
                {"event_type": "string", "n": "int64", "uid_sum": "int64"}
            )

        res = (
            back.map_batches(partial, batch_format="pandas")
            .groupby("event_type")
            .sum(["n", "uid_sum"])
        )
        out = res.to_pandas()
    finally:
        shutil.rmtree(out_dir, ignore_errors=True)
    out = out.rename(
        columns={"sum(n)": "n", "sum(uid_sum)": "uid_sum"}
    ).astype({"event_type": "string", "n": "int64", "uid_sum": "int64"})
    return out.sort_values("event_type", ignore_index=True)


_SQL_CSV_ROUNDTRIP = """
SELECT event_type, count(*)::BIGINT AS n, sum(user_id)::BIGINT AS uid_sum
FROM events GROUP BY event_type ORDER BY event_type
"""

QUERIES["events_csv_roundtrip"] = q_events_csv_roundtrip
ORACLES["events_csv_roundtrip"] = _SQL_CSV_ROUNDTRIP


# -- star-schema join (fact-fact hash join + broadcast dims) -----------------


def q_star_revenue(sf_dir: str):
    """Star-schema revenue rollup (region, nation, order year) — the
    classic warehouse join tree, built with the three join strategies a
    100 TB plan needs in the right places:

    * **aggregate pushdown** — lineitem revenue partials combine per
      ``l_orderkey`` inside each batch BEFORE any join, so the fact-fact
      exchange carries ~distinct-orderkeys-per-block rows, not line
      items (partials are safe: downstream re-sums);
    * **partitioned hash join** for the two big-big edges
      (lineitem ⋈ orders on orderkey, then ⋈ customer on custkey —
      both sides scale with the corpus, so neither may broadcast);
      the second join's left side is pre-shrunk to (custkey, year)
      grain by one bucketed sum;
    * **broadcast lookup** for the bounded dims (nation ⋈ region is
      ≤ 25 rows forever): merged map-side into every batch, no shuffle.

    Revenue is exact integer arithmetic — cents × discount-percent
    (price and discount are 2-decimal fixed-point), so the sum is
    order-independent and hash-stable.  int64 headroom: ~1e9 per line
    item leaves ~9e9 items before overflow; beyond that the partial
    must widen to a (hi, lo) pair (documented limit)."""
    from ..util import bucket_sum, heal_schema, join_partitions

    np_ = join_partitions(None)

    li = ray.data.read_parquet(
        f"{sf_dir}/lineitem.parquet",
        columns=["l_orderkey", "l_extendedprice", "l_discount"],
    )

    def li_partial(df: pd.DataFrame) -> pd.DataFrame:
        cents = np.rint(df["l_extendedprice"].to_numpy("float64") * 100.0)
        disc = np.rint(df["l_discount"].to_numpy("float64") * 100.0)
        rev = cents.astype("int64") * (100 - disc.astype("int64"))
        part = pd.DataFrame(
            {"l_orderkey": df["l_orderkey"].astype("int64"), "rev": rev}
        )
        g = part.groupby("l_orderkey", as_index=False, sort=False).agg(
            rev=("rev", "sum"), n_items=("rev", "size")
        )
        return g.astype(
            {"l_orderkey": "int64", "rev": "int64", "n_items": "int64"}
        )

    li_agg = heal_schema(
        li.map_batches(li_partial, batch_format="pandas"), np_
    )

    orders = heal_schema(
        ray.data.read_parquet(
            f"{sf_dir}/orders.parquet",
            columns=["o_orderkey", "o_custkey", "o_orderdate"],
        ).map_batches(
            lambda df: pd.DataFrame(
                {
                    "l_orderkey": df["o_orderkey"].astype("int64"),
                    "o_custkey": df["o_custkey"].astype("int64"),
                    "o_year": df["o_orderdate"].dt.year.astype("int64"),
                }
            ),
            batch_format="pandas",
        ),
        np_,
    )

    j1 = li_agg.join(orders, "inner", np_, on=("l_orderkey",))
    # shrink to (custkey, year) grain before the customer join: the
    # joined fact stream re-aggregates to at most |customer| × |years|
    by_cust = heal_schema(
        bucket_sum(j1, ["o_custkey", "o_year"], ["rev", "n_items"]), np_
    )

    cust = heal_schema(
        ray.data.read_parquet(
            f"{sf_dir}/customer.parquet",
            columns=["c_custkey", "c_nationkey"],
        ).map_batches(
            lambda df: pd.DataFrame(
                {
                    "o_custkey": df["c_custkey"].astype("int64"),
                    "c_nationkey": df["c_nationkey"].astype("int64"),
                }
            ),
            batch_format="pandas",
        ),
        np_,
    )
    j2 = by_cust.join(cust, "inner", np_, on=("o_custkey",))

    # bounded dims: nation ⋈ region resolved once, merged map-side
    nat = ray.data.read_parquet(f"{sf_dir}/nation.parquet").to_pandas()
    reg = ray.data.read_parquet(f"{sf_dir}/region.parquet").to_pandas()
    dim = nat.merge(
        reg, left_on="n_regionkey", right_on="r_regionkey"
    )[["n_nationkey", "n_name", "r_name"]]
    dim["c_nationkey"] = dim["n_nationkey"].astype("int64")

    def attach(df: pd.DataFrame) -> pd.DataFrame:
        m = df.merge(dim[["c_nationkey", "n_name", "r_name"]], on="c_nationkey")
        g = m.groupby(
            ["r_name", "n_name", "o_year"], as_index=False, sort=False
        )[["rev", "n_items"]].sum()
        return g

    out = (
        j2.map_batches(attach, batch_format="pandas")
        .to_pandas()
        .groupby(["r_name", "n_name", "o_year"], as_index=False)[
            ["rev", "n_items"]
        ]
        .sum()
    )
    out = out.rename(columns={"rev": "revenue"})
    out = out.astype(
        {
            "r_name": "string",
            "n_name": "string",
            "o_year": "int64",
            "revenue": "int64",
            "n_items": "int64",
        }
    )
    return out.sort_values(
        ["r_name", "n_name", "o_year"], ignore_index=True
    )


_SQL_STAR_REVENUE = """
SELECT r_name, n_name, year(o_orderdate)::BIGINT AS o_year,
       sum(round(l_extendedprice * 100)::BIGINT
           * (100 - round(l_discount * 100)::BIGINT))::BIGINT AS revenue,
       count(*)::BIGINT AS n_items
FROM lineitem
JOIN orders   ON l_orderkey = o_orderkey
JOIN customer ON o_custkey = c_custkey
JOIN nation   ON c_nationkey = n_nationkey
JOIN region   ON n_regionkey = r_regionkey
GROUP BY 1, 2, 3
ORDER BY 1, 2, 3
"""

QUERIES["star_revenue"] = q_star_revenue
ORACLES["star_revenue"] = _SQL_STAR_REVENUE


# -- distributed anti / semi join --------------------------------------------


def q_orders_anti_semi(sf_dir: str):
    """Anti- and semi-join in one partitioned pass: per order priority,
    how many orders have NO line items (anti) vs at least one (semi),
    plus the anti side's orderkey checksum.

    Shape: the probe side sheds volume map-side first (per-batch
    DISTINCT l_orderkey — occurrence count is irrelevant to existence),
    both sides are tagged and co-located by ONE hash bucketing on the
    join key (util.bucket_agg), and each bucket resolves existence with
    a vectorized ``isin`` — no broadcast of a corpus-scale key set, no
    driver-side membership state, and the post-join aggregate collapses
    to ≤ buckets × |priorities| partial rows before the driver touches
    anything."""
    from ..util import bucket_agg

    li = ray.data.read_parquet(
        f"{sf_dir}/lineitem.parquet", columns=["l_orderkey"]
    )

    def li_keys(df: pd.DataFrame) -> pd.DataFrame:
        k = df["l_orderkey"].drop_duplicates()
        return pd.DataFrame(
            {
                "okey": k.astype("int64"),
                "prio": pd.array([""] * len(k), dtype="string"),
                "side": pd.array([0] * len(k), dtype="int64"),
            }
        )

    orders = ray.data.read_parquet(
        f"{sf_dir}/orders.parquet", columns=["o_orderkey", "o_orderpriority"]
    )

    def o_rows(df: pd.DataFrame) -> pd.DataFrame:
        return pd.DataFrame(
            {
                "okey": df["o_orderkey"].astype("int64"),
                "prio": df["o_orderpriority"].astype("string"),
                "side": pd.array([1] * len(df), dtype="int64"),
            }
        )

    tagged = li.map_batches(li_keys, batch_format="pandas").union(
        orders.map_batches(o_rows, batch_format="pandas")
    )

    def resolve(df: pd.DataFrame) -> pd.DataFrame:
        probe = df.loc[df["side"] == 0, "okey"]
        o = df[df["side"] == 1]
        has = o["okey"].isin(set(probe)).to_numpy()
        part = pd.DataFrame(
            {
                "prio": o["prio"],
                "anti": (~has).astype("int64"),
                "semi": has.astype("int64"),
                "anti_okey": o["okey"].to_numpy("int64") * ~has,
            }
        )
        return part.groupby("prio", as_index=False, sort=False).sum()

    parts = bucket_agg(tagged, ["okey"], resolve).to_pandas()
    out = parts.groupby("prio", as_index=False).sum()
    out = pd.DataFrame(
        {
            "o_orderpriority": out["prio"].astype("string"),
            "n_anti": out["anti"].astype("int64"),
            "n_semi": out["semi"].astype("int64"),
            "anti_okey_sum": out["anti_okey"].astype("int64"),
        }
    )
    return out.sort_values("o_orderpriority", ignore_index=True)


_SQL_ORDERS_ANTI_SEMI = """
WITH o AS (
  SELECT o_orderpriority, o_orderkey,
         EXISTS (SELECT 1 FROM lineitem l
                 WHERE l.l_orderkey = o_orderkey) AS has
  FROM orders
)
SELECT o_orderpriority,
       coalesce(count(*) FILTER (WHERE NOT has), 0)::BIGINT AS n_anti,
       coalesce(count(*) FILTER (WHERE has), 0)::BIGINT AS n_semi,
       coalesce(sum(o_orderkey) FILTER (WHERE NOT has), 0)::BIGINT
         AS anti_okey_sum
FROM o GROUP BY 1 ORDER BY 1
"""

QUERIES["orders_anti_semi"] = q_orders_anti_semi
ORACLES["orders_anti_semi"] = _SQL_ORDERS_ANTI_SEMI


# -- entity resolution: sorted-neighborhood blocking -------------------------

# shared by the Ray side and the oracle SQL (see _SPIKE_WIN)
_ER_WINDOW = 3
_ER_MAX_DIST = 1
_ER_BLOCK = 4096  # rank-range block width (module-level so tests can shrink it)


def q_er_blocking_pairs(
    sf_dir: str, window: int = _ER_WINDOW, max_dist: int = _ER_MAX_DIST
):
    """Sorted-neighborhood entity-resolution blocking: order the corpus
    by the blocking key (name, with custkey tie-break), compare each
    record only to its ``window`` successors, and keep pairs within
    ``max_dist`` edits — the O(n·w) record-linkage candidate generator
    (Hernández & Stolfo's merge/purge) instead of the O(n²) cross join.

    Distribution: ONE total sort (stages.packing.global_rank — the
    ordered prefix-sum rank primitive), then rank-range blocks of
    ``_ER_BLOCK`` rows with the first ``window`` rows of each block
    replicated to its predecessor, so every cross-boundary pair is
    computed exactly once (pairs are emitted only where the LEFT row is
    block-native).  Inside a block, shift-j alignment over the
    contiguous rank sequence generates candidates and
    ``linking.levenshtein_vec`` verifies them — numpy DP across all
    pairs at once, no per-pair Python."""
    from ..stages.linking import levenshtein_vec
    from ..stages.packing import global_rank

    w, md = int(window), int(max_dist)

    ds = ray.data.read_parquet(
        f"{sf_dir}/customer.parquet", columns=["c_custkey", "c_name"]
    )
    ranked = global_rank(
        ds.map_batches(
            lambda df: pd.DataFrame(
                {
                    "c_custkey": df["c_custkey"].astype("int64"),
                    "c_name": df["c_name"].astype("string"),
                }
            ),
            batch_format="pandas",
        ),
        keys=["c_name", "c_custkey"],
    )

    def scatter(df: pd.DataFrame) -> pd.DataFrame:
        rk = df["rank"].to_numpy("int64")
        native = df.assign(blk=rk // _ER_BLOCK)
        edge = df[(rk % _ER_BLOCK) < w]
        ghost = edge.assign(blk=edge["rank"].to_numpy("int64") // _ER_BLOCK - 1)
        out = pd.concat([native, ghost[ghost["blk"] >= 0]], ignore_index=True)
        return out.astype({"blk": "int64"})

    def pairs(df: pd.DataFrame) -> pd.DataFrame:
        d = df.sort_values("rank", ignore_index=True)
        blk = int(d["blk"].iloc[0])
        rk = d["rank"].to_numpy("int64")
        names = d["c_name"].astype(str).to_numpy()
        keys = d["c_custkey"].to_numpy("int64")
        lim = (blk + 1) * _ER_BLOCK  # left row must be block-native
        a_i, b_i = [], []
        for j in range(1, w + 1):
            if len(d) <= j:
                break
            ia = np.arange(len(d) - j)
            keep = (rk[ia] < lim) & (rk[ia + j] - rk[ia] == j)
            a_i.append(ia[keep])
            b_i.append(ia[keep] + j)
        if not a_i:
            return pd.DataFrame(
                {
                    "a_custkey": pd.array([], dtype="int64"),
                    "b_custkey": pd.array([], dtype="int64"),
                    "dist": pd.array([], dtype="int64"),
                }
            )
        ai = np.concatenate(a_i)
        bi = np.concatenate(b_i)
        dist = levenshtein_vec(names[ai], names[bi])
        m = dist <= md
        return pd.DataFrame(
            {
                "a_custkey": pd.array(keys[ai][m], dtype="int64"),
                "b_custkey": pd.array(keys[bi][m], dtype="int64"),
                "dist": pd.array(dist[m], dtype="int64"),
            }
        )

    return (
        ranked.map_batches(scatter, batch_format="pandas")
        .groupby("blk")
        .map_groups(pairs, batch_format="pandas")
    )


_SQL_ER_BLOCKING = f"""
WITH r AS (
  SELECT c_name, c_custkey,
         row_number() OVER (ORDER BY c_name, c_custkey) AS rk
  FROM customer
)
SELECT a.c_custkey AS a_custkey, b.c_custkey AS b_custkey,
       levenshtein(a.c_name, b.c_name)::BIGINT AS dist
FROM r a JOIN r b ON b.rk > a.rk AND b.rk <= a.rk + {_ER_WINDOW}
WHERE levenshtein(a.c_name, b.c_name) <= {_ER_MAX_DIST}
ORDER BY 1, 2
"""

QUERIES["er_blocking_pairs"] = q_er_blocking_pairs
ORACLES["er_blocking_pairs"] = _SQL_ER_BLOCKING


# -- sequence mining: event-type transition matrix ---------------------------


def q_events_transitions(sf_dir: str):
    """Per-user event-sequence mining: the first-order Markov transition
    matrix over event types — for every consecutive pair in a user's
    (ts, event_id)-ordered stream, count (prev_type → next_type), the
    bigram model behind next-action prediction and funnel discovery.

    One user-bucketed co-location (util.bucket_agg — user keys never
    reach a Ray per-key aggregate); inside a bucket the pairing is a
    single sort + shift with a same-user mask (no per-user loops), and
    only |types|² partial rows per bucket leave the shuffle."""
    from ..util import bucket_agg

    ds = ray.data.read_parquet(
        f"{sf_dir}/events.parquet",
        columns=["user_id", "ts", "event_id", "event_type"],
    )

    def pairs(df: pd.DataFrame) -> pd.DataFrame:
        ts_us = (
            (df["ts"] - pd.Timestamp(0)) // pd.Timedelta(microseconds=1)
        ).astype("int64")
        d = pd.DataFrame(
            {
                "user_id": df["user_id"].astype("int64"),
                "ts_us": ts_us,
                "event_id": df["event_id"].astype("int64"),
                "event_type": df["event_type"].astype("string"),
            }
        ).sort_values(["user_id", "ts_us", "event_id"], ignore_index=True)
        same = d["user_id"].to_numpy()[1:] == d["user_id"].to_numpy()[:-1]
        part = pd.DataFrame(
            {
                "prev_type": d["event_type"].to_numpy()[:-1][same],
                "next_type": d["event_type"].to_numpy()[1:][same],
            }
        )
        g = part.groupby(
            ["prev_type", "next_type"], as_index=False, sort=False
        ).size()
        return g.rename(columns={"size": "n"}).astype(
            {"prev_type": "string", "next_type": "string", "n": "int64"}
        )

    parts = bucket_agg(ds, ["user_id"], pairs).to_pandas()
    out = (
        parts.groupby(["prev_type", "next_type"], as_index=False)["n"]
        .sum()
        .astype({"prev_type": "string", "next_type": "string", "n": "int64"})
    )
    return out.sort_values(["prev_type", "next_type"], ignore_index=True)


_SQL_EVENTS_TRANSITIONS = """
WITH s AS (
  SELECT event_type,
         lag(event_type) OVER (
           PARTITION BY user_id ORDER BY epoch_us(ts), event_id
         ) AS prev_type
  FROM events
)
SELECT prev_type, event_type AS next_type, count(*)::BIGINT AS n
FROM s WHERE prev_type IS NOT NULL
GROUP BY 1, 2 ORDER BY 1, 2
"""

QUERIES["events_transitions"] = q_events_transitions
ORACLES["events_transitions"] = _SQL_EVENTS_TRANSITIONS


# -- exact distributed order statistics: IQR outlier gate --------------------


def q_events_value_outliers(sf_dir: str):
    """Exact per-type quartiles over a CONTINUOUS value domain + the
    Tukey IQR outlier gate (value > q3 + 1.5·IQR) — the order-statistic
    shape a counting histogram cannot cover (doc_len_quantiles' trick
    needs bounded integers; event values are arbitrary doubles).

    Distribution: ONE total sort via the ordered-prefix-sum rank
    primitive (stages.packing.global_rank over (type, value, event_id)
    — ranks are contiguous per type in type order), per-type counts
    collapse map-side to |types| driver rows, the two quartile ranks
    per type resolve with a broadcast rank→slot filter (a ~2·|types|
    dict, never the data), and the outlier count is a second streamed
    pass against broadcast thresholds.  Quartile VALUES are exact data
    elements (position (n−1)·p//100 in each type's sorted run — the
    doc_len_quantiles convention), so doubles hash bit-exactly; the
    gate arithmetic is the same IEEE double expression on both sides."""
    from ..stages.packing import global_rank

    ds = ray.data.read_parquet(
        f"{sf_dir}/events.parquet",
        columns=["event_type", "value", "event_id"],
    )

    ranked = global_rank(
        ds.map_batches(
            lambda df: pd.DataFrame(
                {
                    "event_type": df["event_type"].astype("string"),
                    "value": df["value"].astype("float64"),
                    "event_id": df["event_id"].astype("int64"),
                }
            ),
            batch_format="pandas",
        ),
        keys=["event_type", "value", "event_id"],
    ).materialize()

    def type_counts(df: pd.DataFrame) -> pd.DataFrame:
        g = df.groupby("event_type", as_index=False, sort=False).size()
        return g.rename(columns={"size": "n"}).astype(
            {"event_type": "string", "n": "int64"}
        )

    counts = (
        ranked.map_batches(type_counts, batch_format="pandas")
        .to_pandas()
        .groupby("event_type", as_index=False)["n"]
        .sum()
        .sort_values("event_type", ignore_index=True)
    )
    offs = counts["n"].cumsum().shift(fill_value=0).astype("int64")
    # one rank may carry BOTH slots: for n <= 2 the q1 and q3 positions
    # coincide ((n-1)*25//100 == (n-1)*75//100), so the map holds a slot
    # LIST — a dict of single slots silently dropped q1 for such types
    want: dict[int, list[tuple[str, str]]] = {}
    for (ty, n), off in zip(counts.itertuples(index=False), offs):
        q1r = int(off) + (int(n) - 1) * 25 // 100 + 1
        q3r = int(off) + (int(n) - 1) * 75 // 100 + 1
        want.setdefault(q1r, []).append((ty, "q1"))
        want.setdefault(q3r, []).append((ty, "q3"))

    def pick(df: pd.DataFrame) -> pd.DataFrame:
        m = df["rank"].isin(want).to_numpy()
        d = df[m]
        tys, slots, vals = [], [], []
        for r, v in zip(d["rank"], d["value"]):
            for ty, slot in want[int(r)]:
                tys.append(ty)
                slots.append(slot)
                vals.append(float(v))
        return pd.DataFrame(
            {
                "event_type": pd.array(tys, dtype="string"),
                "slot": pd.array(slots, dtype="string"),
                "value": pd.array(vals, dtype="float64"),
            }
        )

    qv = (
        ranked.map_batches(pick, batch_format="pandas")
        .to_pandas()
        .pivot(index="event_type", columns="slot", values="value")
        .reset_index()
    )
    hi = {
        ty: q3 + 1.5 * (q3 - q1)
        for ty, q1, q3 in zip(qv["event_type"], qv["q1"], qv["q3"])
    }

    def outlier_partial(df: pd.DataFrame) -> pd.DataFrame:
        t = df["event_type"].map(hi).to_numpy("float64")
        flag = df["value"].to_numpy("float64") > t
        part = pd.DataFrame(
            {"event_type": df["event_type"].astype("string"),
             "n_outliers": flag.astype("int64")}
        )
        return part.groupby("event_type", as_index=False, sort=False).sum()

    outl = (
        ranked.map_batches(outlier_partial, batch_format="pandas")
        .to_pandas()
        .groupby("event_type", as_index=False)["n_outliers"]
        .sum()
    )
    out = counts.merge(qv, on="event_type").merge(outl, on="event_type")
    return out.astype(
        {
            "event_type": "string",
            "n": "int64",
            "q1": "float64",
            "q3": "float64",
            "n_outliers": "int64",
        }
    )[["event_type", "n", "q1", "q3", "n_outliers"]].sort_values(
        "event_type", ignore_index=True
    )


_SQL_VALUE_OUTLIERS = """
WITH q AS (
  SELECT event_type, count(*)::BIGINT AS n,
         (list_sort(list(value)))[(count(*) - 1) * 25 // 100 + 1] AS q1,
         (list_sort(list(value)))[(count(*) - 1) * 75 // 100 + 1] AS q3
  FROM events GROUP BY 1
)
SELECT q.event_type, q.n, q.q1, q.q3,
       coalesce(sum(CASE WHEN e.value > q.q3 + 1.5 * (q.q3 - q.q1)
                         THEN 1 END), 0)::BIGINT AS n_outliers
FROM q JOIN events e USING (event_type)
GROUP BY 1, 2, 3, 4 ORDER BY 1
"""

QUERIES["events_value_outliers"] = q_events_value_outliers
ORACLES["events_value_outliers"] = _SQL_VALUE_OUTLIERS


# -- grouped trend fit: exact integer OLS sums --------------------------------


def q_events_type_trend(sf_dir: str):
    """Per-type value-over-time trend (OLS slope) carried as EXACT
    integer sufficient statistics — the grouped-regression pattern for
    drift/trend monitors at corpus scale: each batch contributes
    per-type partial sums (n, Σx, Σy, Σxy, Σx²) where x = hour since
    the corpus' first hour and y = integer cents, so the slope's
    closed-form numerator/denominator (n·Σxy − Σx·Σy, n·Σx² − (Σx)²)
    are order-independent int64 arithmetic that hashes bit-exactly
    (the ratio itself is one division away for any consumer).  Two
    streamed passes (global min hour, then partials), no shuffle —
    only |types| rows ever reach the driver.  int64 headroom: with
    H = hour span and C = cents ceiling, n·Σxy < 2^63 needs
    n² · H · C ≲ 9e18 (sf0.1: ~1e10·720·6e4 ≈ 4e17); a wider corpus
    promotes the partials to python ints / HUGEINT."""
    ds = ray.data.read_parquet(
        f"{sf_dir}/events.parquet", columns=["event_type", "ts", "value"]
    )

    def hours(df: pd.DataFrame) -> pd.DataFrame:
        h = (
            (df["ts"] - pd.Timestamp(0)) // pd.Timedelta(hours=1)
        ).astype("int64")
        return pd.DataFrame({"h": pd.array([int(h.min())], dtype="int64")})

    h0 = int(
        ds.map_batches(hours, batch_format="pandas").to_pandas()["h"].min()
    )

    def partial(df: pd.DataFrame) -> pd.DataFrame:
        x = (
            (df["ts"] - pd.Timestamp(0)) // pd.Timedelta(hours=1)
        ).astype("int64") - h0
        y = np.rint(df["value"].to_numpy("float64") * 100.0).astype("int64")
        d = pd.DataFrame(
            {
                "event_type": df["event_type"].astype("string"),
                "n": 1,
                "sx": x,
                "sy": y,
                "sxy": x.to_numpy() * y,
                "sxx": x.to_numpy() * x.to_numpy(),
            }
        )
        return (
            d.groupby("event_type", as_index=False, sort=False)
            .sum()
            .astype(
                {"n": "int64", "sx": "int64", "sy": "int64",
                 "sxy": "int64", "sxx": "int64"}
            )
        )

    agg = (
        ds.map_batches(partial, batch_format="pandas")
        .to_pandas()
        .groupby("event_type", as_index=False)
        .sum()
    )
    agg["slope_num"] = agg["n"] * agg["sxy"] - agg["sx"] * agg["sy"]
    agg["slope_den"] = agg["n"] * agg["sxx"] - agg["sx"] * agg["sx"]
    out = agg.astype(
        {
            "event_type": "string",
            "n": "int64", "sx": "int64", "sy": "int64",
            "sxy": "int64", "sxx": "int64",
            "slope_num": "int64", "slope_den": "int64",
        }
    )
    return out.sort_values("event_type", ignore_index=True)


_SQL_TYPE_TREND = """
WITH e AS (
  SELECT event_type,
         (epoch_us(ts) // 3600000000)::BIGINT AS h,
         round(value * 100)::BIGINT AS cents
  FROM events
),
m AS (SELECT min(h) AS h0 FROM e),
x AS (SELECT event_type, (h - m.h0)::BIGINT AS x, cents AS y
      FROM e CROSS JOIN m)
SELECT event_type, count(*)::BIGINT AS n,
       sum(x)::BIGINT AS sx, sum(y)::BIGINT AS sy,
       sum(x * y)::BIGINT AS sxy, sum(x * x)::BIGINT AS sxx,
       (count(*) * sum(x * y) - sum(x) * sum(y))::BIGINT AS slope_num,
       (count(*) * sum(x * x) - sum(x) * sum(x))::BIGINT AS slope_den
FROM x GROUP BY 1 ORDER BY 1
"""

QUERIES["events_type_trend"] = q_events_type_trend
ORACLES["events_type_trend"] = _SQL_TYPE_TREND


# -- telemetry burst dedup: keep the first event per burst --------------------


_BURST_GAP_S = 5  # shared by the Ray side and the oracle SQL (see _SPIKE_WIN)


def q_events_burst_dedup(sf_dir: str, gap_seconds: int = _BURST_GAP_S):
    """Telemetry burst deduplication: within each (user, event_type)
    stream, collapse bursts — runs of events less than ``gap_seconds``
    apart — to their FIRST event (the at-least-once-delivery /
    double-click cleanup every event pipeline runs before analytics).
    Returns per-type kept/dropped counts plus a checksum of kept event
    ids so the oracle pins WHICH events survive, not just how many.

    Same machinery as sessionization (a burst is a 5-second session):
    one user-bucketed co-location, in-bucket sort + shift with a
    same-(user,type) mask, partials collapse to |types| rows."""
    from ..util import bucket_agg

    gap_us = gap_seconds * 1_000_000

    ds = ray.data.read_parquet(
        f"{sf_dir}/events.parquet",
        columns=["user_id", "ts", "event_id", "event_type"],
    )

    def dedup(df: pd.DataFrame) -> pd.DataFrame:
        ts_us = (
            (df["ts"] - pd.Timestamp(0)) // pd.Timedelta(microseconds=1)
        ).astype("int64")
        d = pd.DataFrame(
            {
                "user_id": df["user_id"].astype("int64"),
                "event_type": df["event_type"].astype("string"),
                "ts_us": ts_us,
                "event_id": df["event_id"].astype("int64"),
            }
        ).sort_values(
            ["user_id", "event_type", "ts_us", "event_id"],
            ignore_index=True,
        )
        same = (
            (d["user_id"].to_numpy()[1:] == d["user_id"].to_numpy()[:-1])
            & (d["event_type"].to_numpy()[1:] == d["event_type"].to_numpy()[:-1])
            & (d["ts_us"].to_numpy()[1:] - d["ts_us"].to_numpy()[:-1] < gap_us)
        )
        keep = np.ones(len(d), dtype=bool)
        keep[1:] = ~same
        part = pd.DataFrame(
            {
                "event_type": d["event_type"],
                "n_kept": keep.astype("int64"),
                "n_dropped": (~keep).astype("int64"),
                "kept_id_sum": d["event_id"].to_numpy() * keep,
            }
        )
        return part.groupby("event_type", as_index=False, sort=False).sum()

    parts = bucket_agg(ds, ["user_id"], dedup).to_pandas()
    out = parts.groupby("event_type", as_index=False).sum().astype(
        {"event_type": "string", "n_kept": "int64",
         "n_dropped": "int64", "kept_id_sum": "int64"}
    )
    return out.sort_values("event_type", ignore_index=True)


_SQL_BURST_DEDUP = f"""
WITH e AS (
  SELECT user_id, event_type, epoch_us(ts) AS ts_us, event_id,
         lag(epoch_us(ts)) OVER (
           PARTITION BY user_id, event_type
           ORDER BY epoch_us(ts), event_id
         ) AS prev_us
  FROM events
),
k AS (
  SELECT event_type, event_id,
         (prev_us IS NULL OR ts_us - prev_us >= {_BURST_GAP_S * 1_000_000}) AS keep
  FROM e
)
SELECT event_type,
       coalesce(sum(CASE WHEN keep THEN 1 END), 0)::BIGINT AS n_kept,
       coalesce(sum(CASE WHEN NOT keep THEN 1 END), 0)::BIGINT AS n_dropped,
       coalesce(sum(CASE WHEN keep THEN event_id END), 0)::BIGINT AS kept_id_sum
FROM k GROUP BY 1 ORDER BY 1
"""

QUERIES["events_burst_dedup"] = q_events_burst_dedup
ORACLES["events_burst_dedup"] = _SQL_BURST_DEDUP


# -- Markov stationary mass over the transition matrix ------------------------

_MARKOV_ITERS = 10
_MARKOV_SCALE = 10**12


def q_events_markov_stationary(sf_dir: str):
    """Stationary mass of the event-type Markov chain: power iteration
    over the q_events_transitions matrix in EXACT integer arithmetic
    (mass·count // row_total per edge, the pagerank_int convention), a
    fixed ``_MARKOV_ITERS`` rounds from a uniform start of
    ``_MARKOV_SCALE`` total — the next-action steady-state a
    recommendation/caching layer derives from the transition counts.

    The transition matrix aggregates distributed (one user-bucketed
    pass); the iteration itself is |types|² driver arithmetic on
    bounded-cardinality state, exactly like pagerank_int's mass loop.
    Types without outgoing transitions shed their mass (dangling, the
    unnormalized convention both sides share); types with no incoming
    mass report 0."""
    tr = q_events_transitions(sf_dir)
    types = sorted(
        ray.data.read_parquet(
            f"{sf_dir}/events.parquet", columns=["event_type"]
        )
        .map_batches(
            lambda df: df.drop_duplicates(ignore_index=True),
            batch_format="pandas",
        )
        .to_pandas()["event_type"]
        .drop_duplicates()
    )
    tot = tr.groupby("prev_type")["n"].sum().to_dict()
    edges = [
        (p, nx, int(c)) for p, nx, c in tr.itertuples(index=False)
    ]
    mass = {t: _MARKOV_SCALE // len(types) for t in types}
    for _ in range(_MARKOV_ITERS):
        nxt = {t: 0 for t in types}
        for p, nx, c in edges:
            nxt[nx] += mass.get(p, 0) * c // int(tot[p])
        mass = nxt
    out = pd.DataFrame(
        {
            "event_type": pd.array(types, dtype="string"),
            "mass": pd.array([mass[t] for t in types], dtype="int64"),
        }
    )
    return out.sort_values("event_type", ignore_index=True)


def _markov_sql() -> str:
    trans = """
WITH s0 AS (
  SELECT event_type,
         lag(event_type) OVER (
           PARTITION BY user_id ORDER BY epoch_us(ts), event_id
         ) AS prev_type
  FROM events
),
tr AS (
  SELECT prev_type, event_type AS next_type, count(*)::BIGINT AS n
  FROM s0 WHERE prev_type IS NOT NULL GROUP BY 1, 2
),
tt AS (SELECT prev_type, sum(n)::BIGINT AS tot FROM tr GROUP BY 1),
t AS (SELECT tr.prev_type, tr.next_type, tr.n, tt.tot
      FROM tr JOIN tt USING (prev_type)),
types AS (SELECT DISTINCT event_type FROM events),
m0 AS (
  SELECT event_type,
         (1000000000000 // (SELECT count(*) FROM types))::BIGINT AS mass
  FROM types
)"""
    steps = []
    for i in range(_MARKOV_ITERS):
        steps.append(
            f""",
m{i + 1} AS (
  SELECT t.next_type AS event_type,
         sum(m{i}.mass * t.n // t.tot)::BIGINT AS mass
  FROM m{i} JOIN t ON t.prev_type = m{i}.event_type
  GROUP BY 1
)"""
        )
    tail = f"""
SELECT types.event_type, coalesce(m{_MARKOV_ITERS}.mass, 0)::BIGINT AS mass
FROM types LEFT JOIN m{_MARKOV_ITERS} USING (event_type)
ORDER BY 1
"""
    return trans + "".join(steps) + tail


QUERIES["events_markov_stationary"] = q_events_markov_stationary
ORACLES["events_markov_stationary"] = _markov_sql()


# -- key-skew diagnostics: count-of-counts profile --------------------------


def q_events_key_skew(sf_dir: str):
    """Planner-grade key-skew profile of the event stream's user_id:
    the count-of-counts table (how many keys occur exactly f times) —
    the full frequency distribution from which every skew statistic
    (distinct count, max multiplicity, self-join size Σc², heavy-hitter
    share) is derivable, at distribution-sized output.

    100-TB shape: per-key counts reduce through ONE coarse-bucketed sum
    (key-scale, never a raw Ray per-key aggregate), then a map-side
    per-batch regroup to (freq, n_keys) partials reduces through a
    second bucketed sum whose key space is the tiny set of distinct
    frequencies.  No driver state beyond the final profile rows."""
    import ray.data

    from ..util import bucket_count, bucket_sum

    ds = ray.data.read_parquet(
        f"{sf_dir}/events.parquet", columns=["user_id"]
    )
    per_key = bucket_count(ds, ["user_id"], out_col="freq")

    def regroup(df: pd.DataFrame) -> pd.DataFrame:
        g = df.groupby("freq", as_index=False).size()
        return pd.DataFrame(
            {
                "freq": g["freq"].astype("int64"),
                "n_keys": g["size"].astype("int64"),
            }
        )

    return bucket_sum(
        per_key.map_batches(regroup, batch_format="pandas"),
        ["freq"],
        ["n_keys"],
    )


_SQL_KEY_SKEW = """
WITH c AS (
  SELECT user_id, count(*)::BIGINT AS freq FROM events GROUP BY 1
)
SELECT freq, count(*)::BIGINT AS n_keys FROM c GROUP BY 1
"""


QUERIES["events_key_skew"] = q_events_key_skew
ORACLES["events_key_skew"] = _SQL_KEY_SKEW


# -- join-size estimation from per-side key histograms ----------------------


def q_orders_join_size(sf_dir: str):
    """Exact equi-join cardinality of orders ⋈ lineitem on orderkey
    computed WITHOUT executing the row-scale join: per-side key counts
    (each via one coarse-bucketed sum), then the product Σ cₒ(k)·cₗ(k)
    over the key-scale count tables — the cost-based-optimizer
    statistic, here exact because the histograms are exact.  Emits one
    row (est_rows, n_keys_matched, n_keys_orders, n_keys_lineitem).

    The key-count tables join on orderkey (key-scale, not row-scale)
    through a pandas merge inside ONE bucketed groupby — both sides'
    counts for a key land in the same bucket, so per-bucket merges are
    globally correct and disjoint (the bucket_agg invariant)."""
    import ray.data

    from ..util import bucket_agg, bucket_count

    o = bucket_count(
        ray.data.read_parquet(
            f"{sf_dir}/orders.parquet", columns=["o_orderkey"]
        ).map_batches(
            lambda df: pd.DataFrame({"k": df["o_orderkey"].astype("int64")}),
            batch_format="pandas",
        ),
        ["k"],
        out_col="co",
    )
    li = bucket_count(
        ray.data.read_parquet(
            f"{sf_dir}/lineitem.parquet", columns=["l_orderkey"]
        ).map_batches(
            lambda df: pd.DataFrame({"k": df["l_orderkey"].astype("int64")}),
            batch_format="pandas",
        ),
        ["k"],
        out_col="cl",
    )

    def tag(col):
        def f(df: pd.DataFrame) -> pd.DataFrame:
            out = pd.DataFrame({"k": df["k"].astype("int64")})
            out["co"] = (
                df["co"].astype("int64") if col == "co" else 0
            )
            out["cl"] = (
                df["cl"].astype("int64") if col == "cl" else 0
            )
            return out

        return f

    both = o.map_batches(tag("co"), batch_format="pandas").union(
        li.map_batches(tag("cl"), batch_format="pandas")
    )

    def combine(df: pd.DataFrame) -> pd.DataFrame:
        g = df.groupby("k", as_index=False)[["co", "cl"]].sum()
        m = g[(g["co"] > 0) & (g["cl"] > 0)]
        return pd.DataFrame(
            {
                "est_rows": pd.array(
                    [int((m["co"] * m["cl"]).sum())], dtype="int64"
                ),
                "n_keys_matched": pd.array([len(m)], dtype="int64"),
                "n_keys_orders": pd.array(
                    [int((g["co"] > 0).sum())], dtype="int64"
                ),
                "n_keys_lineitem": pd.array(
                    [int((g["cl"] > 0).sum())], dtype="int64"
                ),
            }
        )

    parts = bucket_agg(both, ["k"], combine).to_pandas()
    if parts.empty or "est_rows" not in parts.columns:
        parts = pd.DataFrame(
            {
                "est_rows": pd.Series(dtype="int64"),
                "n_keys_matched": pd.Series(dtype="int64"),
                "n_keys_orders": pd.Series(dtype="int64"),
                "n_keys_lineitem": pd.Series(dtype="int64"),
            }
        )
    total = parts.sum()
    return pd.DataFrame(
        {
            "est_rows": pd.array([int(total["est_rows"])], dtype="int64"),
            "n_keys_matched": pd.array(
                [int(total["n_keys_matched"])], dtype="int64"
            ),
            "n_keys_orders": pd.array(
                [int(total["n_keys_orders"])], dtype="int64"
            ),
            "n_keys_lineitem": pd.array(
                [int(total["n_keys_lineitem"])], dtype="int64"
            ),
        }
    )


_SQL_JOIN_SIZE = """
WITH co AS (SELECT o_orderkey AS k, count(*)::BIGINT AS c FROM orders GROUP BY 1),
cl AS (SELECT l_orderkey AS k, count(*)::BIGINT AS c FROM lineitem GROUP BY 1),
m AS (SELECT co.k, co.c AS co, cl.c AS cl FROM co JOIN cl USING (k))
SELECT sum(co * cl)::BIGINT AS est_rows,
       count(*)::BIGINT AS n_keys_matched,
       (SELECT count(*) FROM co)::BIGINT AS n_keys_orders,
       (SELECT count(*) FROM cl)::BIGINT AS n_keys_lineitem
FROM m
"""


QUERIES["orders_join_size"] = q_orders_join_size
ORACLES["orders_join_size"] = _SQL_JOIN_SIZE


# -- TPC-H Q1 pricing summary (exact fixed-point) ----------------------------


def q_lineitem_q1(sf_dir: str):
    """The canonical TPC-H Q1 pricing summary per (returnflag,
    linestatus) — counts, quantity and charge sums, and averages — in
    EXACT fixed-point: price/discount/tax are 2-decimal fixed-point
    shipped as doubles, so cents = rint(x·100) recovers the integers
    and every sum is an order-independent int64 (charge in
    cent·percent² units); each average is ONE IEEE-exact division of
    two integers, so the oracle hashes bit-identically (the
    star_revenue convention).

    Scale shape: per-batch partial groupby (6 groups) → one tiny
    bucketed sum — the pre-aggregated combiner pattern; no row ever
    shuffles."""
    from ..util import bucket_sum

    ds = ray.data.read_parquet(
        f"{sf_dir}/lineitem.parquet",
        columns=[
            "l_returnflag", "l_linestatus", "l_quantity",
            "l_extendedprice", "l_discount", "l_tax",
        ],
    )

    def partial(df: pd.DataFrame) -> pd.DataFrame:
        qty = np.rint(df["l_quantity"].to_numpy("float64")).astype("int64")
        cents = np.rint(
            df["l_extendedprice"].to_numpy("float64") * 100.0
        ).astype("int64")
        disc = np.rint(df["l_discount"].to_numpy("float64") * 100.0).astype(
            "int64"
        )
        tax = np.rint(df["l_tax"].to_numpy("float64") * 100.0).astype("int64")
        part = pd.DataFrame(
            {
                "l_returnflag": df["l_returnflag"].astype("string"),
                "l_linestatus": df["l_linestatus"].astype("string"),
                "n": 1,
                "sum_qty": qty,
                "sum_base": cents,
                "sum_disc": cents * (100 - disc),
                "sum_charge": cents * (100 - disc) * (100 + tax),
            }
        )
        return part.groupby(
            ["l_returnflag", "l_linestatus"], as_index=False, sort=False
        ).sum()

    tot = bucket_sum(
        ds.map_batches(partial, batch_format="pandas"),
        ["l_returnflag", "l_linestatus"],
        ["n", "sum_qty", "sum_base", "sum_disc", "sum_charge"],
        num_buckets=8,
    ).to_pandas()

    return pd.DataFrame(
        {
            "l_returnflag": tot["l_returnflag"].astype("string"),
            "l_linestatus": tot["l_linestatus"].astype("string"),
            "n": tot["n"].astype("int64"),
            "sum_qty": tot["sum_qty"].astype("int64"),
            "sum_base_cents": tot["sum_base"].astype("int64"),
            "sum_disc_cp": tot["sum_disc"].astype("int64"),
            "sum_charge_cp2": tot["sum_charge"].astype("int64"),
            "avg_qty": tot["sum_qty"].astype("float64")
            / tot["n"].astype("float64"),
            "avg_base_cents": tot["sum_base"].astype("float64")
            / tot["n"].astype("float64"),
        }
    ).sort_values(["l_returnflag", "l_linestatus"], ignore_index=True)


_SQL_LINEITEM_Q1 = """
WITH f AS (
  SELECT l_returnflag, l_linestatus,
         round(l_quantity)::BIGINT AS qty,
         round(l_extendedprice * 100)::BIGINT AS cents,
         round(l_discount * 100)::BIGINT AS disc,
         round(l_tax * 100)::BIGINT AS tax
  FROM lineitem
)
SELECT l_returnflag, l_linestatus,
       count(*)::BIGINT AS n,
       sum(qty)::BIGINT AS sum_qty,
       sum(cents)::BIGINT AS sum_base_cents,
       sum(cents * (100 - disc))::BIGINT AS sum_disc_cp,
       sum(cents * (100 - disc) * (100 + tax))::BIGINT AS sum_charge_cp2,
       sum(qty)::DOUBLE / count(*)::DOUBLE AS avg_qty,
       sum(cents)::DOUBLE / count(*)::DOUBLE AS avg_base_cents
FROM f
GROUP BY 1, 2
ORDER BY 1, 2
"""


QUERIES["lineitem_q1"] = q_lineitem_q1
ORACLES["lineitem_q1"] = _SQL_LINEITEM_Q1


# -- cross-table referential-integrity audit ---------------------------------


def q_ri_audit(sf_dir: str):
    """Warehouse-wide referential-integrity audit: one row per FK edge
    of the star schema with total and orphan counts — the cross-TABLE
    data-quality check (docs_expectations is per-table).  Edge list:
    lineitem→orders, lineitem→part, lineitem→supplier, orders→customer,
    customer→nation, supplier→nation, nation→region.

    Scale shape, per edge: the PARENT key set reduces to distinct keys
    via one coarse-bucketed pass; bounded parents (nation/region — ≤ 25
    rows forever) broadcast and probe map-side; unbounded parents
    (orders/part/supplier/customer) meet the child through the tagged
    existence union — child side pre-shrunk to per-key counts first, so
    the shuffle carries key-scale rows on both sides, never child rows.
    All counts integer."""
    import ray.data

    from ..util import bucket_agg, bucket_count

    edges = [
        ("lineitem", "l_orderkey", "orders", "o_orderkey"),
        ("lineitem", "l_partkey", "part", "p_partkey"),
        ("lineitem", "l_suppkey", "supplier", "s_suppkey"),
        ("orders", "o_custkey", "customer", "c_custkey"),
        ("customer", "c_nationkey", "nation", "n_nationkey"),
        ("supplier", "s_nationkey", "nation", "n_nationkey"),
        ("nation", "n_regionkey", "region", "r_regionkey"),
    ]
    rows = []
    for child, ck, parent, pk in edges:
        child_counts = bucket_count(
            ray.data.read_parquet(
                f"{sf_dir}/{child}.parquet", columns=[ck]
            ).map_batches(
                lambda df, c=ck: pd.DataFrame({"k": df[c].astype("int64")}),
                batch_format="pandas",
            ),
            ["k"],
            out_col="nc",
        )
        parent_keys = bucket_count(
            ray.data.read_parquet(
                f"{sf_dir}/{parent}.parquet", columns=[pk]
            ).map_batches(
                lambda df, c=pk: pd.DataFrame({"k": df[c].astype("int64")}),
                batch_format="pandas",
            ),
            ["k"],
            out_col="np_",
        )

        def tag(col):
            def f(df: pd.DataFrame) -> pd.DataFrame:
                return pd.DataFrame(
                    {
                        "k": df["k"].astype("int64"),
                        "nc": df[col].astype("int64") if col == "nc" else 0,
                        "np_": df[col].astype("int64") if col == "np_" else 0,
                    }
                )

            return f

        both = child_counts.map_batches(tag("nc"), batch_format="pandas").union(
            parent_keys.map_batches(tag("np_"), batch_format="pandas")
        )

        def orphan_partial(df: pd.DataFrame) -> pd.DataFrame:
            g = df.groupby("k", as_index=False)[["nc", "np_"]].sum()
            orph = g[(g["np_"] == 0) & (g["nc"] > 0)]
            return pd.DataFrame(
                {
                    "n_rows": pd.array([int(g["nc"].sum())], dtype="int64"),
                    "n_orphan_rows": pd.array(
                        [int(orph["nc"].sum())], dtype="int64"
                    ),
                    "n_orphan_keys": pd.array([len(orph)], dtype="int64"),
                }
            )

        parts = bucket_agg(both, ["k"], orphan_partial).to_pandas()
        rows.append(
            {
                "fk": f"{child}.{ck}->{parent}.{pk}",
                "n_rows": int(parts["n_rows"].sum()),
                "n_orphan_rows": int(parts["n_orphan_rows"].sum()),
                "n_orphan_keys": int(parts["n_orphan_keys"].sum()),
            }
        )
    out = pd.DataFrame(rows).sort_values("fk", ignore_index=True)
    return out.astype(
        {
            "fk": "string",
            "n_rows": "int64",
            "n_orphan_rows": "int64",
            "n_orphan_keys": "int64",
        }
    )


_SQL_RI_AUDIT = """
WITH e AS (
  SELECT 'lineitem.l_orderkey->orders.o_orderkey' AS fk,
         (SELECT count(*) FROM lineitem)::BIGINT AS n_rows,
         (SELECT count(*) FROM lineitem l LEFT JOIN orders o
            ON l.l_orderkey = o.o_orderkey WHERE o.o_orderkey IS NULL)::BIGINT
           AS n_orphan_rows,
         (SELECT count(DISTINCT l.l_orderkey) FROM lineitem l LEFT JOIN orders o
            ON l.l_orderkey = o.o_orderkey WHERE o.o_orderkey IS NULL)::BIGINT
           AS n_orphan_keys
  UNION ALL SELECT 'lineitem.l_partkey->part.p_partkey',
         (SELECT count(*) FROM lineitem),
         (SELECT count(*) FROM lineitem l LEFT JOIN part p
            ON l.l_partkey = p.p_partkey WHERE p.p_partkey IS NULL),
         (SELECT count(DISTINCT l.l_partkey) FROM lineitem l LEFT JOIN part p
            ON l.l_partkey = p.p_partkey WHERE p.p_partkey IS NULL)
  UNION ALL SELECT 'lineitem.l_suppkey->supplier.s_suppkey',
         (SELECT count(*) FROM lineitem),
         (SELECT count(*) FROM lineitem l LEFT JOIN supplier s
            ON l.l_suppkey = s.s_suppkey WHERE s.s_suppkey IS NULL),
         (SELECT count(DISTINCT l.l_suppkey) FROM lineitem l LEFT JOIN supplier s
            ON l.l_suppkey = s.s_suppkey WHERE s.s_suppkey IS NULL)
  UNION ALL SELECT 'orders.o_custkey->customer.c_custkey',
         (SELECT count(*) FROM orders),
         (SELECT count(*) FROM orders o LEFT JOIN customer c
            ON o.o_custkey = c.c_custkey WHERE c.c_custkey IS NULL),
         (SELECT count(DISTINCT o.o_custkey) FROM orders o LEFT JOIN customer c
            ON o.o_custkey = c.c_custkey WHERE c.c_custkey IS NULL)
  UNION ALL SELECT 'customer.c_nationkey->nation.n_nationkey',
         (SELECT count(*) FROM customer),
         (SELECT count(*) FROM customer c LEFT JOIN nation n
            ON c.c_nationkey = n.n_nationkey WHERE n.n_nationkey IS NULL),
         (SELECT count(DISTINCT c.c_nationkey) FROM customer c LEFT JOIN nation n
            ON c.c_nationkey = n.n_nationkey WHERE n.n_nationkey IS NULL)
  UNION ALL SELECT 'supplier.s_nationkey->nation.n_nationkey',
         (SELECT count(*) FROM supplier),
         (SELECT count(*) FROM supplier s LEFT JOIN nation n
            ON s.s_nationkey = n.n_nationkey WHERE n.n_nationkey IS NULL),
         (SELECT count(DISTINCT s.s_nationkey) FROM supplier s LEFT JOIN nation n
            ON s.s_nationkey = n.n_nationkey WHERE n.n_nationkey IS NULL)
  UNION ALL SELECT 'nation.n_regionkey->region.r_regionkey',
         (SELECT count(*) FROM nation),
         (SELECT count(*) FROM nation n LEFT JOIN region r
            ON n.n_regionkey = r.r_regionkey WHERE r.r_regionkey IS NULL),
         (SELECT count(DISTINCT n.n_regionkey) FROM nation n LEFT JOIN region r
            ON n.n_regionkey = r.r_regionkey WHERE r.r_regionkey IS NULL)
)
SELECT fk, n_rows, n_orphan_rows, n_orphan_keys FROM e ORDER BY fk
"""


QUERIES["ri_audit"] = q_ri_audit
ORACLES["ri_audit"] = _SQL_RI_AUDIT


# -- semi-structured property extraction ------------------------------------


def q_events_props_extract(sf_dir: str):
    """Semi-structured payload handling: extract the integer ``k`` field
    from the events' JSON ``props`` column (vectorized regex — the
    schema-on-read path a log pipeline takes before a real JSON codec)
    and roll up per event_type: row count, Σk, and exact distinct-k.

    Scale shape: extraction + per-batch partials map-side; the distinct
    count rides one (event_type, k)-bucketed dedup pass then a tiny
    per-type sum — the COUNT(DISTINCT) two-step that never hands Ray a
    raw per-key aggregate."""
    import ray.data

    from ..util import bucket_agg, bucket_sum

    ds = ray.data.read_parquet(
        f"{sf_dir}/events.parquet", columns=["event_type", "props"]
    )

    def extract(df: pd.DataFrame) -> pd.DataFrame:
        k = (
            df["props"]
            .fillna("")
            .str.extract(r'"k":\s*(-?\d+)', expand=False)
            .astype("float64")
        )
        return pd.DataFrame(
            {
                "event_type": df["event_type"].astype("string"),
                "k": k.fillna(0).astype("int64"),
            }
        )

    ex = ds.map_batches(extract, batch_format="pandas")

    # one bucketed pass holds each (type, k) pair whole → per-pair rows
    pairs = bucket_agg(
        ex,
        ["event_type", "k"],
        lambda df: df.groupby(["event_type", "k"], as_index=False).agg(
            n=("k", "size")
        ),
    )

    def rollup_partial(df: pd.DataFrame) -> pd.DataFrame:
        df = df.copy()
        df["sum_k"] = df["k"] * df["n"]
        g = df.groupby("event_type", as_index=False).agg(
            n=("n", "sum"), sum_k=("sum_k", "sum"), n_distinct_k=("k", "nunique")
        )
        return g

    # each (type, k) pair lives in exactly one bucket above, but a TYPE
    # spans buckets — regroup per-type partials through one tiny sum
    per_bucket = bucket_agg(pairs, ["k"], rollup_partial)
    tot = bucket_sum(
        per_bucket, ["event_type"], ["n", "sum_k", "n_distinct_k"]
    ).to_pandas()
    return (
        tot.astype(
            {
                "event_type": "string",
                "n": "int64",
                "sum_k": "int64",
                "n_distinct_k": "int64",
            }
        )
        .sort_values("event_type", ignore_index=True)
    )


_SQL_PROPS_EXTRACT = r"""
WITH e AS (
  SELECT event_type,
         coalesce(regexp_extract(coalesce(props, ''), '"k":\s*(-?\d+)', 1),
                  '0')::BIGINT AS k
  FROM events
)
SELECT event_type,
       count(*)::BIGINT AS n,
       sum(k)::BIGINT AS sum_k,
       count(DISTINCT k)::BIGINT AS n_distinct_k
FROM e GROUP BY 1 ORDER BY 1
"""


QUERIES["events_props_extract"] = q_events_props_extract
ORACLES["events_props_extract"] = _SQL_PROPS_EXTRACT


# -- TPC-H Q3 shipping-priority top-10 ---------------------------------------

# Q3 parameters shared with the oracle (TPC-H uses segment + date cutoff)
_Q3_SEGMENT = "BUILDING"
_Q3_CUTOFF = "1998-06-01"


def q_lineitem_q3(sf_dir: str):
    """TPC-H Q3 (shipping-priority): unshipped-revenue top-10 orders for
    one market segment — the canonical selective join tree + grouped
    aggregate + deterministic top-k composition.

    Plan, 100-TB-shaped: customer filters to the segment map-side and
    the surviving custkeys BROADCAST (one segment of one dim ≪ facts);
    orders filter on date + broadcast-probe custkey map-side (no
    customer join shuffles); the one genuinely big-big edge
    (lineitem ⋈ orders on orderkey) is a partitioned hash join with
    lineitem pre-shrunk by its shipdate filter AND pre-aggregated to
    (orderkey, revenue-cents) partials inside each batch; the final
    grouped sum is one key-scale bucketed pass and the top-10 is a
    driver-side cut of per-bucket candidates.  Revenue is exact integer
    cents×percent (the star_revenue convention)."""
    import ray

    from ..util import bucket_sum, heal_schema, join_partitions

    np_ = join_partitions(None)

    # customer scales with the corpus (TPC-H: 150 K × sf) — the segment
    # membership reaches orders through a PARTITIONED custkey join, not
    # a driver-collected key set
    seg_cust = ray.data.read_parquet(
        f"{sf_dir}/customer.parquet", columns=["c_custkey", "c_mktsegment"]
    ).map_batches(
        lambda df: pd.DataFrame(
            {
                "o_custkey": df.loc[
                    df["c_mktsegment"] == _Q3_SEGMENT, "c_custkey"
                ].astype("int64")
            }
        ),
        batch_format="pandas",
    )

    cutoff = pd.Timestamp(_Q3_CUTOFF)

    def orders_filter(df: pd.DataFrame) -> pd.DataFrame:
        out = df[df["o_orderdate"] < cutoff]
        return pd.DataFrame(
            {
                "o_custkey": out["o_custkey"].astype("int64"),
                "l_orderkey": out["o_orderkey"].astype("int64"),
                "o_orderdate": out["o_orderdate"].dt.strftime("%Y-%m-%d"),
                "o_orderpriority": out["o_orderpriority"].astype("string"),
            }
        )

    orders = (
        ray.data.read_parquet(
            f"{sf_dir}/orders.parquet",
            columns=[
                "o_orderkey", "o_custkey", "o_orderdate", "o_orderpriority",
            ],
        )
        .map_batches(orders_filter, batch_format="pandas")
    )
    orders = heal_schema(orders, np_).join(
        heal_schema(seg_cust, np_), "inner", np_, on=("o_custkey",)
    ).map_batches(
        lambda df: df[["l_orderkey", "o_orderdate", "o_orderpriority"]],
        batch_format="pandas",
    )

    def li_partial(df: pd.DataFrame) -> pd.DataFrame:
        m = df["l_shipdate"] > cutoff
        out = df[m]
        cents = np.rint(
            out["l_extendedprice"].to_numpy("float64") * 100.0
        ).astype("int64")
        disc = np.rint(out["l_discount"].to_numpy("float64") * 100.0).astype(
            "int64"
        )
        part = pd.DataFrame(
            {
                "l_orderkey": out["l_orderkey"].astype("int64"),
                "rev": cents * (100 - disc),
            }
        )
        return part.groupby("l_orderkey", as_index=False, sort=False).sum()

    li = ray.data.read_parquet(
        f"{sf_dir}/lineitem.parquet",
        columns=["l_orderkey", "l_extendedprice", "l_discount", "l_shipdate"],
    ).map_batches(li_partial, batch_format="pandas")

    j = heal_schema(li, np_).join(
        heal_schema(orders, np_), "inner", np_, on=("l_orderkey",)
    )
    tot = bucket_sum(
        j, ["l_orderkey", "o_orderdate", "o_orderpriority"], ["rev"]
    ).to_pandas()
    if tot.empty or "l_orderkey" not in tot.columns:
        return pd.DataFrame(
            {
                "l_orderkey": pd.Series(dtype="int64"),
                "revenue_cp": pd.Series(dtype="int64"),
                "o_orderdate": pd.Series(dtype="string"),
                "o_orderpriority": pd.Series(dtype="string"),
            }
        )
    top = tot.sort_values(
        ["rev", "l_orderkey"], ascending=[False, True], ignore_index=True
    ).head(10)
    return pd.DataFrame(
        {
            "l_orderkey": top["l_orderkey"].astype("int64"),
            "revenue_cp": top["rev"].astype("int64"),
            "o_orderdate": top["o_orderdate"].astype("string"),
            "o_orderpriority": top["o_orderpriority"].astype("string"),
        }
    )


_SQL_LINEITEM_Q3 = f"""
SELECT l_orderkey,
       sum(round(l_extendedprice * 100)::BIGINT
           * (100 - round(l_discount * 100)::BIGINT))::BIGINT AS revenue_cp,
       strftime(o_orderdate, '%Y-%m-%d') AS o_orderdate,
       o_orderpriority
FROM customer JOIN orders ON c_custkey = o_custkey
JOIN lineitem ON l_orderkey = o_orderkey
WHERE c_mktsegment = '{_Q3_SEGMENT}'
  AND o_orderdate < DATE '{_Q3_CUTOFF}'
  AND l_shipdate > DATE '{_Q3_CUTOFF}'
GROUP BY 1, 3, 4
ORDER BY revenue_cp DESC, l_orderkey
LIMIT 10
"""


QUERIES["lineitem_q3"] = q_lineitem_q3
ORACLES["lineitem_q3"] = _SQL_LINEITEM_Q3


# -- inter-arrival time histogram -------------------------------------------


def q_events_interarrival_hist(sf_dir: str):
    """Per-user inter-arrival gaps rolled into a log2 histogram —
    the arrival-process profile (burstiness / think-time) a streaming
    capacity planner reads: gap seconds between consecutive events of
    one user (ordered by ts, event_id), bucketed by ⌊log2(gap+1)⌋,
    counted corpus-wide.  Integer end to end: epoch-second diffs and a
    bit-length bucket rule the SQL twin reproduces with
    length(bin(gap+1))-1.

    Scale shape: ONE user-bucketed pass computes each user's ordered
    gaps (a user's events co-locate in its bucket; per-bucket vectorized
    sort+diff), emitting per-bucket histogram PARTIALS — |buckets| ×
    ~40 rows — reduced by one tiny sum.  Event rows shuffle once, keyed
    by user."""
    import ray.data

    from ..util import bucket_agg, bucket_sum

    ds = ray.data.read_parquet(
        f"{sf_dir}/events.parquet", columns=["user_id", "ts", "event_id"]
    )

    def gaps(df: pd.DataFrame) -> pd.DataFrame:
        df = df.sort_values(["user_id", "ts", "event_id"])
        # parquet timestamps land as datetime64[us] — normalize to ns
        # before the epoch-seconds division (a raw .astype(int64) would
        # silently be 1000x off)
        sec = (
            df["ts"].astype("datetime64[ns]").astype("int64")
            // 1_000_000_000
        ).to_numpy()
        uid = df["user_id"].astype("int64").to_numpy()
        same = uid[1:] == uid[:-1]
        gap = (sec[1:] - sec[:-1])[same]
        if not len(gap):
            return pd.DataFrame(
                {
                    "gap_bucket": pd.Series(dtype="int64"),
                    "n": pd.Series(dtype="int64"),
                }
            )
        b = np.frexp((gap + 1).astype("float64"))[1] - 1  # ⌊log2⌋, exact
        g = pd.DataFrame({"gap_bucket": b.astype("int64")}).groupby(
            "gap_bucket", as_index=False
        ).size()
        return g.rename(columns={"size": "n"})

    partials = bucket_agg(ds, ["user_id"], gaps)
    return bucket_sum(partials, ["gap_bucket"], ["n"], num_buckets=16)


_SQL_INTERARRIVAL = """
WITH g AS (
  SELECT user_id,
         (epoch_ms(ts) // 1000)
         - lag(epoch_ms(ts) // 1000) OVER (
             PARTITION BY user_id ORDER BY ts, event_id
           ) AS gap
  FROM events
)
SELECT (length(bin(gap + 1)) - 1)::BIGINT AS gap_bucket,
       count(*)::BIGINT AS n
FROM g WHERE gap IS NOT NULL
GROUP BY 1
"""


QUERIES["events_interarrival_hist"] = q_events_interarrival_hist
ORACLES["events_interarrival_hist"] = _SQL_INTERARRIVAL


# -- TPC-H Q6 forecasting-revenue filter ------------------------------------

_Q6_YEAR = 1997
_Q6_DISC_LO, _Q6_DISC_HI = 5, 7   # discount percent window, inclusive
_Q6_QTY_LT = 24


def q_lineitem_q6(sf_dir: str):
    """TPC-H Q6 (forecasting revenue change): one selective scan —
    shipdate year, discount window, quantity cap — and a single exact
    integer sum of cents×percent revenue.  The fully-pushed-down
    filter+aggregate every columnar engine is measured by: only the
    four needed columns leave storage, each batch reduces to one
    partial, the driver adds |blocks| integers."""
    import ray.data

    ds = ray.data.read_parquet(
        f"{sf_dir}/lineitem.parquet",
        columns=["l_shipdate", "l_discount", "l_quantity", "l_extendedprice"],
    )

    def partial(df: pd.DataFrame) -> pd.DataFrame:
        disc = np.rint(df["l_discount"].to_numpy("float64") * 100.0).astype(
            "int64"
        )
        qty = np.rint(df["l_quantity"].to_numpy("float64")).astype("int64")
        yr = df["l_shipdate"].dt.year.to_numpy()
        m = (
            (yr == _Q6_YEAR)
            & (disc >= _Q6_DISC_LO)
            & (disc <= _Q6_DISC_HI)
            & (qty < _Q6_QTY_LT)
        )
        cents = np.rint(
            df.loc[m, "l_extendedprice"].to_numpy("float64") * 100.0
        ).astype("int64")
        rev = int((cents * disc[m]).sum())
        return pd.DataFrame(
            {
                "revenue_cp": pd.array([rev], dtype="int64"),
                "n_items": pd.array([int(m.sum())], dtype="int64"),
            }
        )

    parts = ds.map_batches(partial, batch_format="pandas").to_pandas()
    return pd.DataFrame(
        {
            "revenue_cp": pd.array(
                [int(parts["revenue_cp"].sum())], dtype="int64"
            ),
            "n_items": pd.array([int(parts["n_items"].sum())], dtype="int64"),
        }
    )


_SQL_LINEITEM_Q6 = f"""
SELECT coalesce(sum(round(l_extendedprice * 100)::BIGINT
           * round(l_discount * 100)::BIGINT), 0)::BIGINT AS revenue_cp,
       count(*)::BIGINT AS n_items
FROM lineitem
WHERE year(l_shipdate) = {_Q6_YEAR}
  AND round(l_discount * 100)::BIGINT BETWEEN {_Q6_DISC_LO} AND {_Q6_DISC_HI}
  AND round(l_quantity)::BIGINT < {_Q6_QTY_LT}
"""


QUERIES["lineitem_q6"] = q_lineitem_q6
ORACLES["lineitem_q6"] = _SQL_LINEITEM_Q6


# -- bipartite co-supply projection -----------------------------------------

_COSUPPLY_MIN = 2


def q_kg_cosupply_pairs(sf_dir: str):
    """Bipartite projection of the part–supplier graph: supplier pairs
    that co-supply ≥ 2 distinct parts, with the co-supply count — the
    one-mode projection (collaboration / co-purchase networks) built
    WITHOUT materializing the quadratic full projection: per-part
    supplier lists expand to pairs inside a part-bucketed pass (fan-out
    bounded by per-part supplier degree), pair counts reduce through one
    bucketed sum, and the threshold prunes before anything returns.

    Distinct (part, supplier) edges come from lineitem via one
    digest-level dedup (bucketed), so duplicate line items never
    inflate counts."""
    import ray.data

    from ..util import bucket_agg, bucket_count

    ds = ray.data.read_parquet(
        f"{sf_dir}/lineitem.parquet", columns=["l_partkey", "l_suppkey"]
    )

    def proj(df: pd.DataFrame) -> pd.DataFrame:
        return pd.DataFrame(
            {
                "p": df["l_partkey"].astype("int64"),
                "s": df["l_suppkey"].astype("int64"),
            }
        ).drop_duplicates()

    edges = bucket_agg(
        ds.map_batches(proj, batch_format="pandas"),
        ["p", "s"],
        lambda df: df.drop_duplicates(),
    )

    def pairs(df: pd.DataFrame) -> pd.DataFrame:
        m = df.merge(df, on="p", suffixes=("_a", "_b"))
        m = m[m["s_a"] < m["s_b"]]
        return pd.DataFrame(
            {
                "supp_a": m["s_a"].astype("int64"),
                "supp_b": m["s_b"].astype("int64"),
            }
        )

    cand = bucket_agg(edges, ["p"], pairs)
    counts = bucket_count(cand, ["supp_a", "supp_b"], out_col="n_parts")

    def thresh(df: pd.DataFrame) -> pd.DataFrame:
        return df[df["n_parts"] >= _COSUPPLY_MIN].reset_index(drop=True)

    return counts.map_batches(thresh, batch_format="pandas")


_SQL_COSUPPLY = f"""
WITH e AS (SELECT DISTINCT l_partkey AS p, l_suppkey AS s FROM lineitem)
SELECT a.s AS supp_a, b.s AS supp_b, count(*)::BIGINT AS n_parts
FROM e a JOIN e b ON a.p = b.p AND a.s < b.s
GROUP BY 1, 2
HAVING count(*) >= {_COSUPPLY_MIN}
"""


QUERIES["kg_cosupply_pairs"] = q_kg_cosupply_pairs
ORACLES["kg_cosupply_pairs"] = _SQL_COSUPPLY


# -- per-segment Pareto skyline ---------------------------------------------


def q_orders_skyline(sf_dir: str):
    """Skyline (Pareto-front) query per market segment: orders not
    dominated in (totalprice↑, orderdate↑) by any other order of the
    same segment — dominated = another order with ≥ price AND ≥ date,
    strictly better in one.  The multi-criteria shortlist operator
    relational engines lack natively.

    Scale shape: orders meet their segment through a PARTITIONED
    custkey hash join (customer scales with the corpus — a driver dict
    would be a corpus-sized broadcast), then ONE segment-bucketed pass
    computes each segment's skyline with the sort-scan rule (sort by
    price desc, date desc; keep rows whose date strictly exceeds the
    running max; equal-point duplicates all survive, matching the NOT
    EXISTS semantics).  Prices compare in exact integer cents."""
    import ray

    from ..util import bucket_agg, heal_schema, join_partitions

    np_ = join_partitions(None)
    seg = ray.data.read_parquet(
        f"{sf_dir}/customer.parquet", columns=["c_custkey", "c_mktsegment"]
    ).map_batches(
        lambda df: pd.DataFrame(
            {
                "o_custkey": df["c_custkey"].astype("int64"),
                "segment": df["c_mktsegment"].astype("string"),
            }
        ),
        batch_format="pandas",
    )

    def proj(df: pd.DataFrame) -> pd.DataFrame:
        return pd.DataFrame(
            {
                "o_orderkey": df["o_orderkey"].astype("int64"),
                "o_custkey": df["o_custkey"].astype("int64"),
                "price_cents": np.rint(
                    df["o_totalprice"].to_numpy("float64") * 100.0
                ).astype("int64"),
                "odate": df["o_orderdate"].dt.strftime("%Y-%m-%d"),
            }
        )

    o = ray.data.read_parquet(
        f"{sf_dir}/orders.parquet",
        columns=["o_orderkey", "o_custkey", "o_totalprice", "o_orderdate"],
    ).map_batches(proj, batch_format="pandas")
    orders = heal_schema(o, np_).join(
        heal_schema(seg, np_), "inner", np_, on=("o_custkey",)
    ).map_batches(
        lambda df: df[["o_orderkey", "segment", "price_cents", "odate"]],
        batch_format="pandas",
    )

    def skyline(df: pd.DataFrame) -> pd.DataFrame:
        out = []
        for seg, g in df.groupby("segment", sort=False):
            g = g.sort_values(
                ["price_cents", "odate"], ascending=[False, False]
            )
            p = g["price_cents"].to_numpy()
            d = g["odate"].to_numpy()
            best = ""
            keep = np.zeros(len(g), dtype=bool)
            i = 0
            while i < len(g):
                # rows tied on BOTH criteria survive together
                j = i
                while j < len(g) and p[j] == p[i] and d[j] == d[i]:
                    j += 1
                if d[i] > best:
                    keep[i:j] = True
                    best = d[i]
                i = j
            out.append(g[keep])
        if not out:
            return pd.DataFrame(
                {
                    "o_orderkey": pd.Series(dtype="int64"),
                    "segment": pd.Series(dtype="string"),
                    "price_cents": pd.Series(dtype="int64"),
                    "odate": pd.Series(dtype="string"),
                }
            )
        r = pd.concat(out, ignore_index=True)
        return r[["o_orderkey", "segment", "price_cents", "odate"]]

    return bucket_agg(orders, ["segment"], skyline)


_SQL_SKYLINE = """
WITH o AS (
  SELECT o_orderkey, c_mktsegment AS segment,
         round(o_totalprice * 100)::BIGINT AS price_cents,
         strftime(o_orderdate, '%Y-%m-%d') AS odate
  FROM orders JOIN customer ON o_custkey = c_custkey
)
SELECT o_orderkey, segment, price_cents, odate
FROM o a
WHERE NOT EXISTS (
  SELECT 1 FROM o b
  WHERE b.segment = a.segment
    AND b.price_cents >= a.price_cents AND b.odate >= a.odate
    AND (b.price_cents > a.price_cents OR b.odate > a.odate)
)
"""


QUERIES["orders_skyline"] = q_orders_skyline
ORACLES["orders_skyline"] = _SQL_SKYLINE


# -- TPC-H Q18 large-volume customers ---------------------------------------

_Q18_QTY = 200


def q_lineitem_q18(sf_dir: str):
    """TPC-H Q18 (large-volume customers): orders whose total line-item
    quantity exceeds the threshold, enriched with the customer and
    ranked by order value — the HAVING-subquery + join + top-k
    composition.

    Scale shape: per-order quantity partials combine inside each batch,
    reduce through ONE orderkey-bucketed sum, and the HAVING filter
    prunes there — only qualifying orders (rare by construction) flow
    into the joins; orders metadata joins partitioned, and customer
    names resolve through a pruned, filtered dim read for the ≤ 100
    FINAL rows only (customer scales with the corpus — never a driver
    dict).  Quantities and prices are exact integers."""
    import ray

    from ..util import bucket_sum, heal_schema, join_partitions

    np_ = join_partitions(None)

    li = ray.data.read_parquet(
        f"{sf_dir}/lineitem.parquet", columns=["l_orderkey", "l_quantity"]
    )

    def qty_partial(df: pd.DataFrame) -> pd.DataFrame:
        part = pd.DataFrame(
            {
                "o_orderkey": df["l_orderkey"].astype("int64"),
                "sum_qty": np.rint(
                    df["l_quantity"].to_numpy("float64")
                ).astype("int64"),
            }
        )
        return part.groupby("o_orderkey", as_index=False, sort=False).sum()

    per_order = bucket_sum(
        li.map_batches(qty_partial, batch_format="pandas"),
        ["o_orderkey"],
        ["sum_qty"],
    ).map_batches(
        lambda df: df[df["sum_qty"] > _Q18_QTY].reset_index(drop=True),
        batch_format="pandas",
    )

    def orders_proj(df: pd.DataFrame) -> pd.DataFrame:
        return pd.DataFrame(
            {
                "o_orderkey": df["o_orderkey"].astype("int64"),
                "o_custkey": df["o_custkey"].astype("int64"),
                "price_cents": np.rint(
                    df["o_totalprice"].to_numpy("float64") * 100.0
                ).astype("int64"),
                "odate": df["o_orderdate"].dt.strftime("%Y-%m-%d"),
            }
        )

    orders = ray.data.read_parquet(
        f"{sf_dir}/orders.parquet",
        columns=["o_orderkey", "o_custkey", "o_totalprice", "o_orderdate"],
    ).map_batches(orders_proj, batch_format="pandas")

    j = heal_schema(per_order, np_).join(
        heal_schema(orders, np_), "inner", np_, on=("o_orderkey",)
    )

    res = j.to_pandas()
    if res.empty or "o_orderkey" not in res.columns:
        return pd.DataFrame(
            {
                "c_name": pd.Series(dtype="string"),
                "o_custkey": pd.Series(dtype="int64"),
                "o_orderkey": pd.Series(dtype="int64"),
                "odate": pd.Series(dtype="string"),
                "price_cents": pd.Series(dtype="int64"),
                "sum_qty": pd.Series(dtype="int64"),
            }
        )
    res = res.sort_values(
        ["price_cents", "o_orderkey"], ascending=[False, True],
        ignore_index=True,
    ).head(100)
    # resolve names for the ≤ 100 FINAL rows only: a pruned, filtered
    # dim read (customer scales with the corpus — never a driver dict)
    want = sorted(set(int(k) for k in res["o_custkey"]))
    names = (
        ray.data.read_parquet(
            f"{sf_dir}/customer.parquet", columns=["c_custkey", "c_name"]
        )
        .filter(expr=f"c_custkey in {want}")
        .to_pandas()
    )
    nm = dict(zip(names["c_custkey"].astype("int64"), names["c_name"]))
    res["c_name"] = pd.array(
        [nm.get(int(k), "") for k in res["o_custkey"]], dtype="string"
    )
    return res[
        ["c_name", "o_custkey", "o_orderkey", "odate", "price_cents", "sum_qty"]
    ].astype(
        {
            "c_name": "string",
            "o_custkey": "int64",
            "o_orderkey": "int64",
            "odate": "string",
            "price_cents": "int64",
            "sum_qty": "int64",
        }
    )


_SQL_LINEITEM_Q18 = f"""
WITH big AS (
  SELECT l_orderkey AS o_orderkey,
         sum(round(l_quantity)::BIGINT)::BIGINT AS sum_qty
  FROM lineitem GROUP BY 1
  HAVING sum(round(l_quantity)::BIGINT) > {_Q18_QTY}
)
SELECT c_name, o_custkey, o_orderkey,
       strftime(o_orderdate, '%Y-%m-%d') AS odate,
       round(o_totalprice * 100)::BIGINT AS price_cents,
       sum_qty
FROM big JOIN orders USING (o_orderkey)
JOIN customer ON o_custkey = c_custkey
ORDER BY price_cents DESC, o_orderkey
LIMIT 100
"""


QUERIES["lineitem_q18"] = q_lineitem_q18
ORACLES["lineitem_q18"] = _SQL_LINEITEM_Q18


# -- CEP subsequence-pattern counting ---------------------------------------

_PAT_A, _PAT_B, _PAT_C = "view", "click", "purchase"


def q_events_pattern_count(sf_dir: str):
    """Complex-event-processing pattern counting: per user, the number
    of ordered A→B→C subsequences (view → click → purchase, not
    necessarily adjacent) in the user's timeline — the MATCH_RECOGNIZE
    / funnel-combinatorics operator beyond the 2-step funnel.

    Counted WITHOUT enumerating triples: order each user's events by
    (ts, event_id); for every B event the contribution is
    (#A strictly before) × (#C strictly after), summed — two cumulative
    counts and one dot product per user, all inside ONE user-bucketed
    pass (a user's events co-locate; per-bucket vectorized cumsums).
    Ties in ts disambiguate by event_id on both sides, so the count is
    deterministic and the SQL twin (window counts over the same order)
    hashes exactly."""
    import ray.data

    from ..util import bucket_agg

    ds = ray.data.read_parquet(
        f"{sf_dir}/events.parquet", columns=["user_id", "ts", "event_id", "event_type"]
    )

    def count_patterns(df: pd.DataFrame) -> pd.DataFrame:
        df = df.sort_values(["user_id", "ts", "event_id"])
        uid = df["user_id"].astype("int64").to_numpy()
        et = df["event_type"].to_numpy()
        out_u, out_n = [], []
        start = 0
        n = len(df)
        for i in range(1, n + 1):
            if i == n or uid[i] != uid[start]:
                seg = et[start:i]
                isa = (seg == _PAT_A).astype("int64")
                isb = seg == _PAT_B
                isc = (seg == _PAT_C).astype("int64")
                a_before = np.cumsum(isa) - isa  # strictly before
                c_after = isc[::-1].cumsum()[::-1] - isc  # strictly after
                cnt = int((a_before[isb] * c_after[isb]).sum())
                if cnt:
                    out_u.append(int(uid[start]))
                    out_n.append(cnt)
                start = i
        return pd.DataFrame(
            {
                "user_id": pd.array(out_u, dtype="int64"),
                "n_patterns": pd.array(out_n, dtype="int64"),
            }
        )

    return bucket_agg(ds, ["user_id"], count_patterns)


_SQL_PATTERN_COUNT = f"""
WITH o AS (
  SELECT user_id, event_type,
         count(*) FILTER (event_type = '{_PAT_A}') OVER (
           PARTITION BY user_id ORDER BY ts, event_id
           ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING
         ) AS a_before,
         count(*) FILTER (event_type = '{_PAT_C}') OVER (
           PARTITION BY user_id ORDER BY ts, event_id
           ROWS BETWEEN 1 FOLLOWING AND UNBOUNDED FOLLOWING
         ) AS c_after
  FROM events
)
SELECT user_id, sum(a_before * c_after)::BIGINT AS n_patterns
FROM o WHERE event_type = '{_PAT_B}'
GROUP BY 1
HAVING sum(a_before * c_after) > 0
"""


QUERIES["events_pattern_count"] = q_events_pattern_count
ORACLES["events_pattern_count"] = _SQL_PATTERN_COUNT


# -- TPC-H Q14 promotion-revenue share --------------------------------------

_Q14_YEAR = 1997
_Q14_MONTH = 3


def q_lineitem_q14(sf_dir: str):
    """TPC-H Q14 (promotion effect): for one ship month, promo-part
    revenue vs total revenue — the broadcast-dim conditional aggregate.
    Emits the two exact integer cents×percent sums plus the share as
    ONE IEEE-exact division (the lineitem_q1 convention), so the oracle
    hashes bit-identically.

    Scale shape: part scales with the corpus, so the is-promo flag
    reaches the month's line items through a PARTITIONED partkey hash
    join (lineitem pre-shrunk by the ship-month filter and pre-reduced
    to per-partkey revenue pairs inside each batch — the join moves
    key-scale rows); the joined pairs reduce to two integers per block
    and the driver adds |blocks| scalar pairs."""
    import ray

    from ..util import bucket_sum, heal_schema, join_partitions

    np_ = join_partitions(None)
    flags = ray.data.read_parquet(
        f"{sf_dir}/part.parquet", columns=["p_partkey", "p_type"]
    ).map_batches(
        lambda df: pd.DataFrame(
            {
                "p": df["p_partkey"].astype("int64"),
                "is_promo": (df["p_type"] == "PROMO").astype("int64"),
            }
        ),
        batch_format="pandas",
    )

    li = ray.data.read_parquet(
        f"{sf_dir}/lineitem.parquet",
        columns=["l_partkey", "l_shipdate", "l_extendedprice", "l_discount"],
    )

    def partial(df: pd.DataFrame) -> pd.DataFrame:
        m = (df["l_shipdate"].dt.year == _Q14_YEAR) & (
            df["l_shipdate"].dt.month == _Q14_MONTH
        )
        d = df[m]
        cents = np.rint(
            d["l_extendedprice"].to_numpy("float64") * 100.0
        ).astype("int64")
        disc = np.rint(d["l_discount"].to_numpy("float64") * 100.0).astype(
            "int64"
        )
        part = pd.DataFrame(
            {
                "p": d["l_partkey"].astype("int64").to_numpy(),
                "rev": cents * (100 - disc),
            }
        )
        return part.groupby("p", as_index=False, sort=False).sum()

    per_part = bucket_sum(
        li.map_batches(partial, batch_format="pandas"), ["p"], ["rev"]
    )
    joined = heal_schema(per_part, np_).join(
        heal_schema(flags, np_), "inner", np_, on=("p",)
    )

    def reduce_pair(df: pd.DataFrame) -> pd.DataFrame:
        rev = df["rev"].astype("int64")
        promo = rev[df["is_promo"].astype("int64") == 1]
        return pd.DataFrame(
            {
                "promo_cp": pd.array([int(promo.sum())], dtype="int64"),
                "total_cp": pd.array([int(rev.sum())], dtype="int64"),
            }
        )

    parts = joined.map_batches(reduce_pair, batch_format="pandas").to_pandas()
    if parts.empty or "promo_cp" not in parts.columns:
        parts = pd.DataFrame(
            {
                "promo_cp": pd.Series(dtype="int64"),
                "total_cp": pd.Series(dtype="int64"),
            }
        )
    promo_cp = int(parts["promo_cp"].sum())
    total_cp = int(parts["total_cp"].sum())
    return pd.DataFrame(
        {
            "promo_cp": pd.array([promo_cp], dtype="int64"),
            "total_cp": pd.array([total_cp], dtype="int64"),
            "promo_share": pd.array(
                [promo_cp / total_cp if total_cp else 0.0], dtype="float64"
            ),
        }
    )


_SQL_LINEITEM_Q14 = f"""
WITH f AS (
  SELECT round(l_extendedprice * 100)::BIGINT
         * (100 - round(l_discount * 100)::BIGINT) AS rev,
         (p_type = 'PROMO') AS is_promo
  FROM lineitem JOIN part ON l_partkey = p_partkey
  WHERE year(l_shipdate) = {_Q14_YEAR} AND month(l_shipdate) = {_Q14_MONTH}
)
SELECT coalesce(sum(rev) FILTER (is_promo), 0)::BIGINT AS promo_cp,
       coalesce(sum(rev), 0)::BIGINT AS total_cp,
       CASE WHEN coalesce(sum(rev), 0) = 0 THEN 0.0
            ELSE (coalesce(sum(rev) FILTER (is_promo), 0)::DOUBLE
                  / sum(rev)::DOUBLE) END AS promo_share
FROM f
"""


QUERIES["lineitem_q14"] = q_lineitem_q14
ORACLES["lineitem_q14"] = _SQL_LINEITEM_Q14


# -- gaps-and-islands: longest daily-activity streak ------------------------


def q_events_streaks(sf_dir: str):
    """Gaps-and-islands: each user's LONGEST run of consecutive active
    days (and their total active days) — the retention/engagement
    metric that needs the islands trick, not a plain window.

    One user-bucketed pass: per user, distinct active epoch-days sort
    ascending; island id = day − rank (vectorized), the longest island
    is a groupby-size max.  The SQL twin is the canonical
    date-minus-dense_rank formulation over the same distinct days."""
    import ray.data

    from ..util import bucket_agg

    ds = ray.data.read_parquet(
        f"{sf_dir}/events.parquet", columns=["user_id", "ts"]
    )

    def streaks(df: pd.DataFrame) -> pd.DataFrame:
        d = pd.DataFrame(
            {
                "user_id": df["user_id"].astype("int64"),
                "day": (
                    df["ts"].astype("datetime64[ns]").astype("int64")
                    // 86_400_000_000_000
                ),
            }
        ).drop_duplicates()
        d = d.sort_values(["user_id", "day"])
        uid = d["user_id"].to_numpy()
        day = d["day"].to_numpy()
        new_user = np.r_[True, uid[1:] != uid[:-1]]
        rank = np.arange(len(d)) - np.maximum.accumulate(
            np.where(new_user, np.arange(len(d)), 0)
        )
        island = day - rank
        g = (
            pd.DataFrame({"user_id": uid, "island": island})
            .groupby(["user_id", "island"], as_index=False)
            .size()
        )
        out = g.groupby("user_id", as_index=False).agg(
            longest_streak=("size", "max"), n_active_days=("size", "sum")
        )
        return out.astype(
            {
                "user_id": "int64",
                "longest_streak": "int64",
                "n_active_days": "int64",
            }
        )

    return bucket_agg(ds, ["user_id"], streaks)


_SQL_STREAKS = """
WITH d AS (
  SELECT DISTINCT user_id, epoch_ms(ts) // 86400000 AS day FROM events
),
r AS (
  SELECT user_id, day,
         day - row_number() OVER (
           PARTITION BY user_id ORDER BY day
         ) AS island
  FROM d
),
i AS (
  SELECT user_id, island, count(*)::BIGINT AS len
  FROM r GROUP BY 1, 2
)
SELECT user_id, max(len)::BIGINT AS longest_streak,
       sum(len)::BIGINT AS n_active_days
FROM i GROUP BY 1
"""


QUERIES["events_streaks"] = q_events_streaks
ORACLES["events_streaks"] = _SQL_STREAKS


# -- integer-decay lifetime value -------------------------------------------


def q_events_ltv_decay(sf_dir: str):
    """Decayed lifetime value per user with an INTEGER decay kernel:
    value-cents halve per day of age (bit shift — no exponential, so
    the distributed sum is order-independent and the SQL twin is
    bit-exact): LTV = Σ cents >> min(age_days, 62), age relative to the
    corpus' max event day.

    Two passes: the max-day scalar reduces map-side (one int per
    block), broadcasts implicitly as a Python constant; per-user decayed
    sums combine inside batches then reduce through ONE user-bucketed
    sum."""
    import ray.data

    from ..util import bucket_sum

    ds = ray.data.read_parquet(
        f"{sf_dir}/events.parquet", columns=["user_id", "ts", "value"]
    )

    def day_col(df: pd.DataFrame) -> np.ndarray:
        return (
            df["ts"].astype("datetime64[ns]").astype("int64")
            // 86_400_000_000_000
        ).to_numpy()

    max_day = max(
        int(b["d"].max())
        for b in ds.map_batches(
            lambda df: pd.DataFrame({"d": [int(day_col(df).max())]}),
            batch_format="pandas",
        ).iter_batches(batch_format="pandas", batch_size=None)
    )

    def partial(df: pd.DataFrame) -> pd.DataFrame:
        age = np.minimum(max_day - day_col(df), 62)
        cents = np.rint(df["value"].to_numpy("float64") * 100.0).astype(
            "int64"
        )
        part = pd.DataFrame(
            {
                "user_id": df["user_id"].astype("int64"),
                "ltv_cents": cents >> age,
            }
        )
        return part.groupby("user_id", as_index=False, sort=False).sum()

    return bucket_sum(
        ds.map_batches(partial, batch_format="pandas"),
        ["user_id"],
        ["ltv_cents"],
    )


_SQL_LTV_DECAY = """
WITH mx AS (SELECT max(epoch_ms(ts) // 86400000) AS m FROM events)
SELECT user_id,
       sum(round(value * 100)::BIGINT
           >> least(mx.m - (epoch_ms(ts) // 86400000), 62))::BIGINT
         AS ltv_cents
FROM events, mx
GROUP BY 1
"""


QUERIES["events_ltv_decay"] = q_events_ltv_decay
ORACLES["events_ltv_decay"] = _SQL_LTV_DECAY


# -- brand concentration (HHI sufficient statistics) ------------------------


def q_brand_hhi(sf_dir: str):
    """Market-concentration analytics: per part brand, the Herfindahl–
    Hirschman sufficient statistics of demand concentration across the
    brand's parts — (n_parts, sum_qty, sum_qty_sq = Σ per-part qty²),
    all exact int64 so HHI = sum_qty_sq / sum_qty² is one driver-side
    division and the oracle hashes bit-exactly (the assortativity
    convention).

    Scale shape: lineitem reduces to (partkey, qty) partials inside
    each batch; ONE part-bucketed sum builds per-part totals; the
    part→brand map is a broadcast dim column; brand-level statistics
    reduce through a second tiny bucketed sum."""
    import ray

    from ..util import bucket_sum

    brands = ray.data.read_parquet(
        f"{sf_dir}/part.parquet", columns=["p_partkey", "p_brand"]
    ).map_batches(
        lambda df: pd.DataFrame(
            {
                "p": df["p_partkey"].astype("int64"),
                "brand": df["p_brand"].astype("string"),
            }
        ),
        batch_format="pandas",
    )

    li = ray.data.read_parquet(
        f"{sf_dir}/lineitem.parquet", columns=["l_partkey", "l_quantity"]
    )

    def partial(df: pd.DataFrame) -> pd.DataFrame:
        p = pd.DataFrame(
            {
                "p": df["l_partkey"].astype("int64"),
                "q": np.rint(df["l_quantity"].to_numpy("float64")).astype(
                    "int64"
                ),
            }
        )
        return p.groupby("p", as_index=False, sort=False).sum()

    from ..util import heal_schema, join_partitions

    np_ = join_partitions(None)
    per_part = bucket_sum(
        li.map_batches(partial, batch_format="pandas"), ["p"], ["q"]
    )
    # part scales with the corpus (TPC-H: 200 K × sf) — the brand
    # column reaches the per-part totals through a PARTITIONED join on
    # partkey (key-scale rows both sides), not a driver dict
    joined = heal_schema(per_part, np_).join(
        heal_schema(brands, np_), "inner", np_, on=("p",)
    )

    def brandify(df: pd.DataFrame) -> pd.DataFrame:
        q = df["q"].astype("int64")
        return pd.DataFrame(
            {
                "brand": df["brand"].astype("string"),
                "n_parts": pd.Series(1, index=df.index, dtype="int64"),
                "sum_qty": q,
                "sum_qty_sq": q * q,
            }
        )

    return bucket_sum(
        joined.map_batches(brandify, batch_format="pandas"),
        ["brand"],
        ["n_parts", "sum_qty", "sum_qty_sq"],
        num_buckets=16,
    )


_SQL_BRAND_HHI = """
WITH pp AS (
  SELECT l_partkey AS p, sum(round(l_quantity)::BIGINT)::BIGINT AS q
  FROM lineitem GROUP BY 1
)
SELECT p_brand AS brand,
       count(*)::BIGINT AS n_parts,
       sum(q)::BIGINT AS sum_qty,
       sum(q * q)::BIGINT AS sum_qty_sq
FROM pp JOIN part ON p = p_partkey
GROUP BY 1
"""


QUERIES["brand_hhi"] = q_brand_hhi
ORACLES["brand_hhi"] = _SQL_BRAND_HHI


# -- RFM customer segmentation ----------------------------------------------


def q_customer_rfm(sf_dir: str):
    """RFM segmentation (recency / frequency / monetary): per customer,
    days since last order, order count, and exact total cents — each
    bucketed into global terciles by VALUE with the counting-histogram
    lower-index quantile rule (the docs_quality_buckets convention:
    threshold = value at rank (n−1)·p//100 + 1, integer arithmetic, no
    interpolation), so the SQL twin hashes bit-exactly.

    Scale shape: orders reduce to per-customer (n, cents, max_day)
    partials inside each batch, then ONE customer-bucketed aggregate;
    the three tercile thresholds come from value→count histograms
    (distribution-sized driver state, never the customer table);
    bucket assignment is map-side against six broadcast integers."""
    import ray.data

    from ..util import bucket_agg, bucket_sum

    ds = ray.data.read_parquet(
        f"{sf_dir}/orders.parquet",
        columns=["o_custkey", "o_orderdate", "o_totalprice"],
    )

    def partial(df: pd.DataFrame) -> pd.DataFrame:
        p = pd.DataFrame(
            {
                "c": df["o_custkey"].astype("int64"),
                "n": 1,
                "cents": np.rint(
                    df["o_totalprice"].to_numpy("float64") * 100.0
                ).astype("int64"),
                "day": (
                    df["o_orderdate"].astype("datetime64[ns]").astype("int64")
                    // 86_400_000_000_000
                ),
            }
        )
        return p.groupby("c", as_index=False, sort=False).agg(
            n=("n", "sum"), cents=("cents", "sum"), day=("day", "max")
        )

    agg = bucket_agg(
        ds.map_batches(partial, batch_format="pandas"),
        ["c"],
        lambda df: df.groupby("c", as_index=False).agg(
            n=("n", "sum"), cents=("cents", "sum"), day=("day", "max")
        ),
    ).materialize()

    max_day = max(
        int(b["day"].max())
        for b in agg.iter_batches(batch_format="pandas", batch_size=None)
    )

    def metrics(df: pd.DataFrame) -> pd.DataFrame:
        return pd.DataFrame(
            {
                "c_custkey": df["c"].astype("int64"),
                "r_days": (max_day - df["day"].astype("int64")),
                "f_n": df["n"].astype("int64"),
                "m_cents": df["cents"].astype("int64"),
            }
        )

    met = agg.map_batches(metrics, batch_format="pandas").materialize()

    def thresholds(col: str) -> tuple[int, int]:
        hist = bucket_sum(
            met.map_batches(
                lambda df, c=col: pd.DataFrame(
                    {"v": df[c].astype("int64"),
                     "n": pd.Series(1, index=df.index, dtype="int64")}
                ),
                batch_format="pandas",
            ),
            ["v"],
            ["n"],
            num_buckets=16,
        ).to_pandas().sort_values("v", ignore_index=True)
        cum = hist["n"].to_numpy().cumsum()
        n = int(cum[-1])
        vs = hist["v"].to_numpy()
        t33 = int(vs[np.searchsorted(cum, (n - 1) * 33 // 100 + 1)])
        t66 = int(vs[np.searchsorted(cum, (n - 1) * 66 // 100 + 1)])
        return t33, t66

    th = {c: thresholds(c) for c in ("r_days", "f_n", "m_cents")}

    def assign(df: pd.DataFrame) -> pd.DataFrame:
        out = df.copy()
        for c, short in (("r_days", "r"), ("f_n", "f"), ("m_cents", "m")):
            t33, t66 = th[c]
            v = df[c].astype("int64")
            out[f"{short}_bucket"] = np.where(
                v > t66, 3, np.where(v > t33, 2, 1)
            ).astype("int64")
        return out

    return met.map_batches(assign, batch_format="pandas")


_SQL_CUSTOMER_RFM = """
WITH a AS (
  SELECT o_custkey AS c_custkey,
         count(*)::BIGINT AS f_n,
         sum(round(o_totalprice * 100)::BIGINT)::BIGINT AS m_cents,
         max(epoch_ms(o_orderdate) // 86400000) AS day
  FROM orders GROUP BY 1
),
mx AS (SELECT max(day) AS m FROM a),
met AS (
  SELECT c_custkey, (mx.m - day)::BIGINT AS r_days, f_n, m_cents
  FROM a, mx
),
tr AS (SELECT r_days AS v, row_number() OVER (ORDER BY r_days) rn,
              count(*) OVER () n FROM met),
tf AS (SELECT f_n AS v, row_number() OVER (ORDER BY f_n) rn,
              count(*) OVER () n FROM met),
tm AS (SELECT m_cents AS v, row_number() OVER (ORDER BY m_cents) rn,
              count(*) OVER () n FROM met),
th AS (SELECT
  (SELECT max(CASE WHEN rn = (n-1)*33//100 + 1 THEN v END) FROM tr) AS r33,
  (SELECT max(CASE WHEN rn = (n-1)*66//100 + 1 THEN v END) FROM tr) AS r66,
  (SELECT max(CASE WHEN rn = (n-1)*33//100 + 1 THEN v END) FROM tf) AS f33,
  (SELECT max(CASE WHEN rn = (n-1)*66//100 + 1 THEN v END) FROM tf) AS f66,
  (SELECT max(CASE WHEN rn = (n-1)*33//100 + 1 THEN v END) FROM tm) AS m33,
  (SELECT max(CASE WHEN rn = (n-1)*66//100 + 1 THEN v END) FROM tm) AS m66)
SELECT c_custkey, r_days, f_n, m_cents,
       (CASE WHEN r_days > r66 THEN 3 WHEN r_days > r33 THEN 2 ELSE 1 END)::BIGINT AS r_bucket,
       (CASE WHEN f_n > f66 THEN 3 WHEN f_n > f33 THEN 2 ELSE 1 END)::BIGINT AS f_bucket,
       (CASE WHEN m_cents > m66 THEN 3 WHEN m_cents > m33 THEN 2 ELSE 1 END)::BIGINT AS m_bucket
FROM met, th
"""


QUERIES["customer_rfm"] = q_customer_rfm
ORACLES["customer_rfm"] = _SQL_CUSTOMER_RFM


# -- robust statistics: per-group median absolute deviation -----------------


def q_orders_mad(sf_dir: str):
    """Robust dispersion per order priority: the median absolute
    deviation of order value — median (integer lower-index rule on the
    value→count histogram), then the same rule on |cents − median| —
    two counting-histogram passes, no distributed sort, everything
    int64 (the doc_len_quantiles convention, composed twice).

    Driver state is two distribution-sized histograms per priority
    (distinct cent values), never the order rows."""
    import ray.data

    from ..util import bucket_sum

    ds = ray.data.read_parquet(
        f"{sf_dir}/orders.parquet", columns=["o_orderpriority", "o_totalprice"]
    )

    def hist_partial(df: pd.DataFrame) -> pd.DataFrame:
        p = pd.DataFrame(
            {
                "g": df["o_orderpriority"].astype("string"),
                "v": np.rint(
                    df["o_totalprice"].to_numpy("float64") * 100.0
                ).astype("int64"),
            }
        )
        g = p.groupby(["g", "v"], as_index=False).size()
        return g.rename(columns={"size": "n"})

    hist = bucket_sum(
        ds.map_batches(hist_partial, batch_format="pandas"),
        ["g", "v"],
        ["n"],
    ).to_pandas()

    def lower_median(sub: pd.DataFrame) -> int:
        sub = sub.sort_values("v")
        cum = sub["n"].to_numpy().cumsum()
        n = int(cum[-1])
        idx = (n - 1) * 50 // 100
        return int(sub["v"].to_numpy()[np.searchsorted(cum, idx + 1)])

    rows = []
    for gname, sub in hist.groupby("g"):
        med = lower_median(sub)
        dev = sub.copy()
        dev["v"] = (dev["v"] - med).abs()
        dev = dev.groupby("v", as_index=False)["n"].sum()
        mad = lower_median(dev.assign(g=gname))
        rows.append(
            {
                "o_orderpriority": gname,
                "median_cents": med,
                "mad_cents": mad,
                "n_orders": int(sub["n"].sum()),
            }
        )
    return (
        pd.DataFrame(rows)
        .sort_values("o_orderpriority", ignore_index=True)
        .astype(
            {
                "o_orderpriority": "string",
                "median_cents": "int64",
                "mad_cents": "int64",
                "n_orders": "int64",
            }
        )
    )


_SQL_ORDERS_MAD = """
WITH v AS (
  SELECT o_orderpriority AS g,
         round(o_totalprice * 100)::BIGINT AS cents
  FROM orders
),
r1 AS (
  SELECT g, cents, row_number() OVER (
           PARTITION BY g ORDER BY cents
         ) AS rn, count(*) OVER (PARTITION BY g) AS n
  FROM v
),
med AS (
  SELECT g, max(CASE WHEN rn = (n-1)*50//100 + 1 THEN cents END) AS m,
         max(n) AS n_orders
  FROM r1 GROUP BY g
),
d AS (
  SELECT v.g, abs(v.cents - med.m) AS dev
  FROM v JOIN med USING (g)
),
r2 AS (
  SELECT g, dev, row_number() OVER (
           PARTITION BY g ORDER BY dev
         ) AS rn, count(*) OVER (PARTITION BY g) AS n
  FROM d
)
SELECT med.g AS o_orderpriority,
       med.m::BIGINT AS median_cents,
       (SELECT max(CASE WHEN rn = (r2.n-1)*50//100 + 1 THEN dev END)
        FROM r2 WHERE r2.g = med.g)::BIGINT AS mad_cents,
       med.n_orders::BIGINT AS n_orders
FROM med
ORDER BY 1
"""


QUERIES["orders_mad"] = q_orders_mad
ORACLES["orders_mad"] = _SQL_ORDERS_MAD
