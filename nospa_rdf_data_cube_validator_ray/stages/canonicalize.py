"""Stateful IRI canonicalization + entity linking over the triple stream.

The reference relies on Jena's interned term identity (ResourceFactory,
ValidatorBase.java:301-368); at corpus scale term identity has to be
*manufactured*: syntactically different IRIs for the same entity must
collapse before any groupby/dedup/check treats them as distinct.

``CanonicalizeTerms`` is the actor-pool shape the north star asks for:
per-actor state built once in ``__init__`` — a broadcast alias map
(owl:sameAs / curated entity links) plus a memoized normalization
dictionary (hash-indexed term dictionary; IRIs are Zipfian, so after
warm-up every hot term is one dict hit) — applied per batch with
vectorized pandas ops + cached per-unique-value normalization.

Normalization rules (RFC 3986 syntax-based):
  * scheme and host lowercased
  * default ports dropped (http:80 / https:443)
  * percent-encoding uppercased; unreserved characters decoded
  * dot-segments resolved in the path
Alias linking happens AFTER normalization (alias keys are stored
normalized), so `HTTP://Ex.org/A` and `http://ex.org/a-alias` can both
link to one canonical entity.
"""

from __future__ import annotations

import re
from urllib.parse import urlsplit, urlunsplit

import pandas as pd

import ray
import ray.data

_PCT_RE = re.compile(r"%([0-9a-fA-F]{2})")
_UNRESERVED = set(
    "ABCDEFGHIJKLMNOPQRSTUVWXYZabcdefghijklmnopqrstuvwxyz0123456789-._~"
)


def _fix_pct(m: re.Match) -> str:
    ch = chr(int(m.group(1), 16))
    if ch in _UNRESERVED:
        return ch
    return "%" + m.group(1).upper()


def _remove_dot_segments(path: str) -> str:
    out: list[str] = []
    for seg in path.split("/"):
        if seg == ".":
            continue
        if seg == "..":
            if out and out[-1] != "":
                out.pop()
            continue
        out.append(seg)
    norm = "/".join(out)
    if path.startswith("/") and not norm.startswith("/"):
        norm = "/" + norm
    return norm


def normalize_iri(iri: str) -> str:
    """RFC 3986 syntax-based normalization (pure function)."""
    if "://" not in iri:
        return iri
    try:
        parts = urlsplit(iri)
    except ValueError:
        return iri
    scheme = parts.scheme.lower()
    netloc = parts.netloc.lower()
    if scheme == "http" and netloc.endswith(":80"):
        netloc = netloc[:-3]
    elif scheme == "https" and netloc.endswith(":443"):
        netloc = netloc[:-4]
    path = _PCT_RE.sub(_fix_pct, _remove_dot_segments(parts.path))
    return urlunsplit((scheme, netloc, path, parts.query, parts.fragment))


# already-canonical fast path: lowercase scheme, lowercase port-less
# netloc with no percent-escapes; the two substring guards below exclude
# any percent-escape and any possible dot-segment ("/." is conservative —
# "/.well-known" also takes the slow path, which is merely slower, never
# wrong).  Uppercase in path/query/fragment is canonical (preserved).
_CANON_HEAD_RE = r"[a-z][a-z0-9+.\-]*://[^/?#A-Z:%]*(?:[/?#]|$)"


def normalize_iri_series(s: "pd.Series") -> "pd.Series":
    """Vectorized :func:`normalize_iri` over a Series: each DISTINCT value
    is normalized once per batch, and a regex fast path skips values that
    are provably already canonical (the overwhelmingly common case at
    entity-linking scale) — the pure-Python RFC-3986 parse only runs on
    values that can actually change."""
    if not len(s):
        return s.astype(object)
    u = pd.Series(pd.unique(s.dropna())).astype(str)
    fast = (
        u.str.match(_CANON_HEAD_RE)
        & ~u.str.contains("%", regex=False)
        & ~u.str.contains("/.", regex=False)
    ).to_numpy()
    mapping: dict = {v: v for v in u[fast]}
    for v in u[~fast]:
        mapping[v] = normalize_iri(v)
    return s.map(mapping)


class CanonicalizeTerms:
    """Actor-pool map_batches stage: normalize + entity-link subj/pred/obj.

    ``alias_ref``: ray.put({normalized_alias_iri: canonical_iri}) built from
    owl:sameAs edges or a curated entity table — broadcast once, read in
    ``__init__`` (once per actor), never re-shipped per batch."""

    def __init__(self, alias_ref=None):
        self.aliases: dict[str, str] = (
            ray.get(alias_ref)
            if isinstance(alias_ref, ray.ObjectRef)
            else (alias_ref or {})
        )
        self._memo: dict[str, str] = {}  # raw IRI → canonical (per-actor dict)

    def _canon_many(self, vals) -> dict:
        """Distinct raw terms → canonical terms; actor-memoized across
        batches, with the vectorized fast path for memo misses."""
        memo = self._memo
        mapping: dict = {}
        misses: list = []
        for v in vals:
            hit = memo.get(v)
            if hit is None:
                misses.append(v)
            else:
                mapping[v] = hit
        if misses:
            if len(memo) > 4_000_000:
                memo.clear()
            aliases = self.aliases
            for v, n in zip(
                misses, normalize_iri_series(pd.Series(misses, dtype=object))
            ):
                hit = aliases.get(n, n)
                memo[v] = hit
                mapping[v] = hit
        return mapping

    def __call__(self, df: pd.DataFrame) -> pd.DataFrame:
        out = df.copy()
        # unique-value mapping: each distinct term normalized once per batch,
        # memoized across batches by the actor dict
        for col, mask in (
            ("subj", ~df["subj"].str.startswith("_:")),
            ("pred", pd.Series(True, index=df.index)),
        ):
            vals = df.loc[mask, col]
            out.loc[mask, col] = vals.map(self._canon_many(vals.unique()))
        om = df["obj_kind"] == 0
        vals = df.loc[om, "obj"]
        out.loc[om, "obj"] = vals.map(self._canon_many(vals.unique()))
        return out


def canonicalize(
    triples: "ray.data.Dataset",
    *,
    aliases: dict[str, str] | None = None,
    concurrency=(1, 8),
) -> "ray.data.Dataset":
    """Triple Dataset → canonicalized triple Dataset (actor pool; alias map
    broadcast via ray.put once)."""
    ref = ray.put(aliases or {})
    return triples.map_batches(
        CanonicalizeTerms,
        fn_constructor_kwargs={"alias_ref": ref},
        batch_format="pandas",
        concurrency=concurrency,
    )


OWL_SAMEAS = "http://www.w3.org/2002/07/owl#sameAs"


def _ren(ds, mapping: dict):
    """Column rename via a pandas map_batches — Ray's Project operator
    chokes on the schema-less empty pandas blocks a sparse groupby can
    emit (see graft-env-quirks)."""
    return ds.map_batches(
        lambda df, m=mapping: df.rename(columns=m), batch_format="pandas"
    )


def _sameas_edges(triples: "ray.data.Dataset") -> "ray.data.Dataset":
    """Normalized, undirected (src, dst) edge Dataset from owl:sameAs."""

    def norm(df: pd.DataFrame) -> pd.DataFrame:
        a = normalize_iri_series(df["subj"])
        b = normalize_iri_series(df["obj"])
        return pd.DataFrame(
            {"src": pd.concat([a, b], ignore_index=True),
             "dst": pd.concat([b, a], ignore_index=True)}
        )

    return (
        triples.filter(expr=f"pred == '{OWL_SAMEAS}' and obj_kind == 0")
        .select_columns(["subj", "obj"])
        .map_batches(norm, batch_format="pandas")
    )


def _union_find_dict(edges: "ray.data.Dataset") -> dict:
    """Exact driver-side connected components for a SMALL (bounded by the
    caller) symmetric (src, dst) edge Dataset: path-halving union-find,
    roots re-labeled to the component minimum (numeric for ints,
    lexicographic for strings — matching :func:`cc_labels`).  Returns a
    {node: component-min} dict over the nodes appearing in ``edges``."""
    df = edges.to_pandas()
    if not len(df) or "src" not in df.columns:
        return {}
    parent: dict = {}

    def find(x):
        r = x
        while parent.setdefault(r, r) != r:
            parent[r] = parent[parent[r]]  # path halving
            r = parent[r]
        return r

    for s, d in zip(df["src"], df["dst"]):
        rs, rd = find(s), find(d)
        if rs != rd:
            parent[max(rs, rd)] = min(rs, rd)  # union by min keeps labels stable
    return {n: find(n) for n in parent}


def _union_find_labels(edges: "ray.data.Dataset") -> "ray.data.Dataset":
    """:func:`_union_find_dict` as a typed (node, label) Dataset.  Node
    dtype is inferred from the values: string keys → string column,
    integer keys → int64 (narrower ints widen; uint64 above 2^63 raises
    OverflowError rather than silently wrapping)."""
    import pyarrow as pa

    mapping = _union_find_dict(edges)
    if not mapping:
        # typed empty (Arrow keeps 0-row schemas; object-dtype pandas
        # empties do NOT survive the conversion)
        return ray.data.from_arrow(
            pa.schema([("node", pa.string()), ("label", pa.string())])
            .empty_table()
        )
    nodes = list(mapping)
    dtype = "string" if isinstance(nodes[0], str) else "int64"
    out = pd.DataFrame(
        {"node": pd.Series(nodes, dtype=dtype),
         "label": pd.Series([mapping[n] for n in nodes], dtype=dtype)}
    )
    return ray.data.from_pandas(out)


def cc_labels(
    edges: "ray.data.Dataset",
    *,
    max_iters: int = 15,
    num_partitions: int | None = None,
) -> "ray.data.Dataset":
    """Distributed connected components over an undirected (src, dst)
    edge Dataset: iterative min-label propagation (label(v) ← min(label(v),
    min over neighbors' labels)), each round ONE hash join + ONE
    groupby-min, converging in ≤ diameter rounds with early exit on a
    per-round fixpoint signature.  Returns a Dataset (node, label) over
    every node appearing in ``edges`` — label is the minimum of the
    component (lexicographic for strings, numeric for ints).

    This is the corpus-scale path: no edge list ever reaches the driver.
    Callers must pass BOTH directions of each edge (see
    :func:`_sameas_edges`)."""
    import pyarrow as pa

    from ..util import heal_schema, join_partitions

    # cluster-derived, never a constant: 8 aggregator actors in an
    # 8-cpu session starve the producer tasks (deadlock)
    num_partitions = join_partitions(num_partitions)
    edges = heal_schema(edges, num_partitions).materialize()

    # groupby / join stages can emit schema-LESS empty pandas blocks (see
    # graft-env-quirks); a schema-less block reaching a hash join raises
    # ArrowInvalid ("no match for key field"), timing-dependently.  Pin
    # the (node, label) schema — dtype taken from the edge key — at every
    # groupby/join output so empty blocks stay typed.
    # schema().types yields pyarrow types for Arrow blocks but plain
    # numpy dtypes / `object` for pandas blocks — handle both
    key_t = dict(zip(edges.schema().names, edges.schema().types))["src"]
    try:
        is_int = pa.types.is_integer(key_t)
    except (TypeError, AttributeError):
        is_int = str(getattr(key_t, "name", key_t)).startswith(("int", "uint"))
    # "string" (pandas StringDtype), NOT object: a 0-row object-dtype
    # frame converts to a null-typed Arrow block, i.e. still schema-less
    pd_dtype = "int64" if is_int else "string"

    def guard(df: pd.DataFrame, cols=("node", "label")) -> pd.DataFrame:
        if not len(df) or not set(cols).issubset(df.columns):
            return pd.DataFrame({c: pd.Series(dtype=pd_dtype) for c in cols})
        return df[list(cols)]

    def init_labels(df: pd.DataFrame) -> pd.DataFrame:
        return pd.DataFrame({"node": df["src"], "label": df["src"]})

    from ..util import bucket_agg

    def _min_label(df: pd.DataFrame) -> pd.DataFrame:
        # sort+drop_duplicates, NOT groupby.min: pandas min on object /
        # string dtype falls back to per-group Python; and Ray's own
        # Aggregate pays per distinct node (util.bucket_agg docstring)
        return df.sort_values(["node", "label"]).drop_duplicates("node")[
            ["node", "label"]
        ]

    labels = (
        bucket_agg(
            edges.map_batches(init_labels, batch_format="pandas"),
            ["node"],
            _min_label,
            num_buckets=num_partitions,
        )
        .map_batches(guard, batch_format="pandas")
        .materialize()
    )

    from ..util import ds_signature

    def signature(ds) -> int:
        return ds_signature(ds, ["node", "label"])

    sig = signature(labels)
    converged = False
    for _ in range(max_iters):
        # neighbor labels: edges ⋈ labels on src → candidate label for dst
        cand = (
            edges.join(
                heal_schema(_ren(labels, {"node": "src"}), num_partitions),
                "inner",
                num_partitions, on=("src",),
            )
            .map_batches(
                lambda df: guard(
                    df.rename(columns={"dst": "node"}) if "dst" in df.columns else df
                ),
                batch_format="pandas",
            )
        )
        half = (
            bucket_agg(
                labels.union(cand), ["node"], _min_label,
                num_buckets=num_partitions,
            )
            .map_batches(guard, batch_format="pandas")
            .materialize()
        )
        # pointer jumping: label(v) ← label(label(v)).  One-hop
        # propagation alone needs O(diameter) rounds — a 10^6-long
        # near-dup chain would never converge; composing each round with
        # path compression makes it O(log diameter) (Kiveris et al.,
        # "Connected Components in MapReduce and Beyond", SoCC'14).
        # Every label value is itself a node of the same component, so
        # the inner self-join is total.
        mapping = _ren(half, {"node": "label", "label": "label2"})
        jumped = (
            heal_schema(half, num_partitions)
            .join(
                heal_schema(mapping, num_partitions), "inner",
                num_partitions, on=("label",),
            )
            .map_batches(
                lambda df: guard(
                    df.drop(columns=["label"], errors="ignore").rename(
                        columns={"label2": "label"}
                    )
                ),
                batch_format="pandas",
            )
        )
        labels = (
            bucket_agg(
                half.union(jumped), ["node"], _min_label,
                num_buckets=num_partitions,
            )
            .map_batches(guard, batch_format="pandas")
            .materialize()
        )
        new_sig = signature(labels)
        if new_sig == sig:
            converged = True
            break
        sig = new_sig
    if not converged:
        # min-label propagation advances one hop per round: a component
        # whose diameter exceeds max_iters would silently get WRONG roots —
        # fail loudly instead of linking nodes to intermediate labels
        raise RuntimeError(
            f"cc_labels did not converge within {max_iters} rounds "
            "(a component's diameter exceeds it); re-run with a "
            "larger max_iters"
        )
    return labels


def sameas_alias_table(
    triples: "ray.data.Dataset",
    *,
    max_iters: int = 15,
    num_partitions: int | None = None,
    max_driver_edges: int = 2_000_000,
) -> "ray.data.Dataset":
    """Connected components over owl:sameAs edges.  Returns a Dataset
    (node, root) — root is the lexicographic minimum of the component,
    matching :func:`sameas_aliases` exactly.  Pair it with
    :func:`canonicalize_with_alias_table` (join-based aliasing) when the
    alias table outgrows a broadcast dict.

    Size-adaptive like ``jaccard_clusters``: sameAs subgraphs are
    entity-scale, so up to ``max_driver_edges`` the edge list is
    union-found exactly on the driver (each Ray hash-shuffle op costs
    ~10 s of aggregator spin-up; the join-rounds path pays that ~4× per
    round); above it, :func:`cc_labels` (min-label propagation +
    pointer jumping, no driver edge list).  Both paths are
    parity-tested."""
    import pyarrow as pa

    edges = _sameas_edges(triples).materialize()
    n_edges = edges.count()
    if n_edges == 0:
        # explicitly string-typed empty: a schema-less empty would crash
        # the canonicalize_with_alias_table hash joins (heal_schema can't
        # fix a FULLY empty dataset)
        return ray.data.from_arrow(
            pa.schema([("node", pa.string()), ("root", pa.string())])
            .empty_table()
        )
    if n_edges <= max_driver_edges:
        labels = _union_find_labels(edges)
    else:
        labels = cc_labels(
            edges, max_iters=max_iters, num_partitions=num_partitions
        )
    return _ren(labels.filter(expr="node != label"), {"label": "root"})


def canonicalize_with_alias_table(
    triples: "ray.data.Dataset",
    alias_table: "ray.data.Dataset",
    *,
    num_partitions: int | None = None,
) -> "ray.data.Dataset":
    """Entity-link via hash JOINs against a (node, root) alias Dataset —
    the path for alias tables too large to broadcast: subj then obj are
    left-joined to the table and replaced where a root exists.  (IRI
    normalization still happens map-side via :func:`canonicalize` with an
    empty alias dict before this join.)"""
    from ..util import join_partitions

    num_partitions = join_partitions(num_partitions)
    def app(col: str, kind_guard):
        def f(df: pd.DataFrame) -> pd.DataFrame:
            out = df.copy()
            m = df["root"].notna() & kind_guard(df)
            out.loc[m, col] = df.loc[m, "root"]
            return out.drop(columns=["node", "root"], errors="ignore")

        return f

    from ..util import heal_schema

    if alias_table.count() == 0:
        # empty alias table ⇒ identity; also: _ren is a pandas
        # map_batches, which never runs on empty blocks, so an empty
        # table would reach the join with its columns UNrenamed
        return triples

    t = triples.join(
        heal_schema(_ren(alias_table, {"node": "subj"}), num_partitions),
        "left_outer",
        num_partitions, on=("subj",), right_suffix="_r",
    ).map_batches(
        app("subj", lambda df: ~df["subj"].str.startswith("_:")),
        batch_format="pandas",
    )
    t = heal_schema(t, num_partitions).join(
        heal_schema(_ren(alias_table, {"node": "obj"}), num_partitions),
        "left_outer",
        num_partitions, on=("obj",), right_suffix="_r",
    ).map_batches(
        app("obj", lambda df: df["obj_kind"] == 0), batch_format="pandas"
    )
    return t


def sameas_aliases(triples: "ray.data.Dataset") -> dict[str, str]:
    """Build the alias map from owl:sameAs edges in the stream: each
    connected component maps to its lexicographically-smallest member
    (deterministic canonical representative).  Component-finding runs on
    the collected edge list — sameAs subgraphs are entity-scale, not
    observation-scale; a corpus where they are not would shard this by
    union-find over hash-partitioned edges."""
    OWL_SAMEAS = "http://www.w3.org/2002/07/owl#sameAs"
    edges = (
        triples.filter(expr=f"pred == '{OWL_SAMEAS}' and obj_kind == 0")
        .select_columns(["subj", "obj"])
        .to_pandas()  # not take_all: ~0.5 ms/row (see util.ds_signature)
    )
    parent: dict[str, str] = {}

    def find(x: str) -> str:
        while parent.setdefault(x, x) != x:
            parent[x] = parent[parent[x]]
            x = parent[x]
        return x

    if not len(edges) or "subj" not in edges.columns:
        return {}
    for s, o in zip(edges["subj"], edges["obj"]):
        a, b = normalize_iri(s), normalize_iri(o)
        ra, rb = find(a), find(b)
        if ra != rb:
            parent[max(ra, rb)] = min(ra, rb)
    return {x: find(x) for x in parent if find(x) != x}
