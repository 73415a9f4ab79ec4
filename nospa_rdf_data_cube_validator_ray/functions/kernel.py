"""Distributed graph-search kernels over the triple table.

The reference's entire query engine is six HashMap functions
(ValidatorBase.java:34-293).  The schema-scale versions live in the
broadcast GraphIndex / LocalGraph (stages/schema_index.py,
state/graphstore.py); THESE are the stream-scale equivalents — real Ray
Data joins for when the probed side is too big to broadcast:

* ``edges(triples, pred)``            — σ_pred projection (graph, subj, obj)
* ``star_pairs(triples, p1, p2)``     — (x p1 a), (x p2 b) → (a, b): the
  conjunctive star join of searchByMultipleProperty
  (ValidatorBase.java:85-106) expressed as a hash join on (graph, subj).
* ``path_visit(triples, [p1..pk])``   — k-hop property-path join
  (searchByPathVisit, ValidatorBase.java:34-74): chain of hash joins
  obj_i = subj_{i+1}.
* ``reachable(triples, pred, roots)`` — 1+-hop fixpoint closure
  (connectedByRepeatedProp, ValidatorBase.java:234-293) as iterative
  frontier joins WITH a visited set (the reference loops forever on
  cycles; we terminate).

Object-side parity with the LocalGraph twins: objects/path-ends are
rendered as TERM strings (``<iri>`` / ``_:b`` / ``"lex"^^<dt>``) wherever
the twin returns terms, and literals are kept where Jena keeps them
(objects_of / subjects_with / the FINAL path hop) while intermediate path
hops and reachability traverse resources only (nodeToResource,
ValidatorBase.java:178-188).  One divergence by representation: a subject
whose path dead-ends has an empty end-set in the dict twin and simply no
row here.

All operate per-graph: every join key includes ``graph`` so one logical
shuffle co-locates a graph's edges, and skew is bounded by file size.
"""

from __future__ import annotations

import numpy as np
import pandas as pd
import pyarrow as pa
import pyarrow.compute as pc

import ray.data

_DEDUP_BUCKETS = 64


def distinct(ds: "ray.data.Dataset", cols: list[str] | None = None) -> "ray.data.Dataset":
    """Exact distinct over ``cols`` (default: all columns) — map-side dedup,
    coarse-bucket shuffle, per-bucket ``drop_duplicates`` (the project's
    standard dedup shape; avoids the groupby-count Project path that
    breaks on schema-less empty blocks)."""
    # copy: ``local`` below captures this list LAZILY — a caller mutating
    # its list after the call must not change the executed selection
    cols = list(cols) if cols else ds.schema().names

    def local(df: pd.DataFrame) -> pd.DataFrame:
        out = df[cols].drop_duplicates().reset_index(drop=True)
        key = out[cols[0]].astype(str)
        for c in cols[1:]:
            key = key + "\x00" + out[c].astype(str)
        out["_db"] = (
            pd.util.hash_pandas_object(key, index=False).to_numpy()
            % _DEDUP_BUCKETS
        ).astype("int32")
        return out

    def dedup(grp: pd.DataFrame) -> pd.DataFrame:
        return grp.drop_duplicates(cols)[cols]

    return (
        ds.map_batches(local, batch_format="pandas")
        .groupby("_db")
        .map_groups(dedup, batch_format="pandas")
    )


def _term_vec(df: pd.DataFrame) -> np.ndarray:
    from ..stages.pivot import _obj_term_vec

    return _obj_term_vec(df)


def edges(
    triples: "ray.data.Dataset",
    pred: str,
    *,
    kinds=(0, 1),
    terms: bool = False,
) -> "ray.data.Dataset":
    """σ pred=... → (graph, subj, obj); object restricted to IRI/bnode by
    default (``kinds``; pass None for all kinds), matching nodeToResource
    (ValidatorBase.java:178-188).  ``terms=True`` renders the object as a
    canonical term string (the LocalGraph twins' representation).  The
    predicate is matched with a compute kernel, never interpolated into a
    filter expression (IRIs may contain quotes)."""
    kindlist = None if kinds is None else list(kinds)

    def f(batch: pa.Table) -> pa.Table:
        mask = pc.equal(batch.column("pred"), pred)
        if kindlist is not None:
            mask = pc.and_(
                mask, pc.is_in(batch.column("obj_kind"), value_set=pa.array(
                    kindlist, pa.int8()
                ))
            )
        t = batch.filter(mask)
        if not terms:
            return t.select(["graph", "subj", "obj"])
        df = t.to_pandas()
        return pa.table(
            {
                "graph": pa.array(df["graph"], pa.string()),
                "subj": pa.array(df["subj"], pa.string()),
                "obj": pa.array(
                    _term_vec(df) if len(df) else [], pa.string()
                ),
            }
        )

    return triples.map_batches(f, batch_format="pyarrow")


def star_pairs(
    triples: "ray.data.Dataset", p1: str, p2: str, *, num_partitions: int = 16
) -> "ray.data.Dataset":
    """Distinct (graph, a, b) with (x p1 a) ∧ (x p2 b) — hash join on the
    shared subject."""
    left = edges(triples, p1).rename_columns({"obj": "a"})
    right = edges(triples, p2).rename_columns({"obj": "b"})
    joined = left.join(
        right, "inner", num_partitions, on=("graph", "subj")
    )
    return distinct(joined.select_columns(["graph", "a", "b"]), ["graph", "a", "b"])


def path_visit(
    triples: "ray.data.Dataset", preds: list[str], *, num_partitions: int = 16
) -> "ray.data.Dataset":
    """(graph, start, end) pairs connected by the property path p1/p2/…/pk
    — searchByPathVisit's both-free mode as chained hash joins.  Literals
    are filtered BETWEEN hops only (they cannot be traversed); the final
    hop keeps them, rendered as terms — matching LocalGraph.path_visit."""
    *mid, last = preds
    if not mid:
        cur = edges(triples, last, kinds=None, terms=True).rename_columns(
            {"subj": "start", "obj": "end"}
        )
        return distinct(cur, ["graph", "start", "end"])
    cur = edges(triples, preds[0]).rename_columns({"subj": "start", "obj": "end"})
    for p in mid[1:]:
        nxt = edges(triples, p).rename_columns({"subj": "end", "obj": "end2"})
        cur = (
            cur.join(nxt, "inner", num_partitions, on=("graph", "end"))
            .select_columns(["graph", "start", "end2"])
            .rename_columns({"end2": "end"})
        )
    fin = edges(triples, last, kinds=None, terms=True).rename_columns(
        {"subj": "end", "obj": "end2"}
    )
    cur = (
        cur.join(fin, "inner", num_partitions, on=("graph", "end"))
        .select_columns(["graph", "start", "end2"])
        .rename_columns({"end2": "end"})
    )
    return distinct(cur, ["graph", "start", "end"])


def objects_of(
    triples: "ray.data.Dataset", pred: str, subjects: set[tuple[str, str]]
) -> "ray.data.Dataset":
    """searchObjectsOfProperty (ValidatorBase.java:147-155): ∪ objects(s,p)
    for s in a broadcast (graph, subj) set — semi-join + project.  Objects
    of ALL kinds (Jena's listObjectsOfProperty does not filter literals),
    rendered as term strings; exact distinct across blocks."""
    import ray

    ref = ray.put(frozenset(subjects))

    def f(df: pd.DataFrame) -> pd.DataFrame:
        ss = ray.get(ref)
        keep = [(g, s) in ss for g, s in zip(df["graph"], df["subj"])]
        out = df[pd.Series(keep, index=df.index)]
        return out[["graph", "obj"]].drop_duplicates().reset_index(drop=True)

    hits = edges(triples, pred, kinds=None, terms=True).map_batches(
        f, batch_format="pandas"
    )
    return distinct(hits, ["graph", "obj"])


def subjects_with(
    triples: "ray.data.Dataset", pred: str, objects: set[tuple[str, str]]
) -> "ray.data.Dataset":
    """searchSubjectsWithProperty (ValidatorBase.java:163-171): the reverse
    semi-join — subjects whose (p, o) hits a broadcast (graph, obj_term)
    set.  Objects are compared as TERM strings (so literal-valued
    properties like qb:componentRequired \"true\"^^xsd:boolean work);
    exact distinct across blocks."""
    import ray

    ref = ray.put(frozenset(objects))

    def f(df: pd.DataFrame) -> pd.DataFrame:
        os_ = ray.get(ref)
        keep = [(g, o) in os_ for g, o in zip(df["graph"], df["obj"])]
        out = df[pd.Series(keep, index=df.index)]
        return out[["graph", "subj"]].drop_duplicates().reset_index(drop=True)

    hits = edges(triples, pred, kinds=None, terms=True).map_batches(
        f, batch_format="pandas"
    )
    return distinct(hits, ["graph", "subj"])


def _nodes_table(rows) -> "ray.data.Dataset":
    rows = sorted(rows)
    return ray.data.from_arrow(
        pa.table(
            {
                "graph": pa.array([g for g, _ in rows], pa.string()),
                "node": pa.array([n for _, n in rows], pa.string()),
            }
        )
    )


def reachable(
    triples: "ray.data.Dataset",
    pred: str,
    roots: "ray.data.Dataset",
    *,
    max_hops: int = 64,
    direction: str = "forward",
    max_driver_nodes: int = 2_000_000,
) -> "ray.data.Dataset":
    """1+-hop fixpoint closure: all (graph, node) reachable from ``roots``
    (columns graph, node) via one or more ``pred`` edges — a root appears
    in the result only if some edge REACHES it (connectedByRepeatedProp
    accumulates hop objects and never the start node,
    ValidatorBase.java:234-293; matching graphstore.reachable_from).
    Cycle-safe BFS with a visited set, unlike the reference (no visited
    set there).  Raises if ``max_hops`` is exhausted with a live frontier
    rather than returning a silently truncated closure.

    Size-adaptive (parity-tested): while the closure fits the driver
    (≤ ``max_driver_nodes`` visited/reached nodes) the frontier / visited
    sets are broadcast (``ray.put``) and the edge stream scans distributed
    once per hop — code-list closures are schema-scale (bounded per file),
    the same assumption the broadcast GraphIndex makes.  The moment the
    driver state would exceed the cap — a pathological corpus-wide
    hierarchy — the whole closure RERUNS in the join formulation
    (``_reachable_join``): frontier, visited and reached stay Datasets,
    each hop is one hash join on (graph, node) plus one anti-join, the
    same round machinery as ``stages.graph.multi_bfs_distances``.

    ``direction="inverse"`` follows edges object→subject — the reference's
    inverse overload (ValidatorBase.java:264-268, IC-21's ^p paths)."""
    import ray

    if direction == "forward":
        cols = {"subj": "node", "obj": "nxt"}
    elif direction == "inverse":
        cols = {"obj": "node", "subj": "nxt"}
    else:
        raise ValueError(direction)
    e = edges(triples, pred).rename_columns(cols).materialize()
    if roots.count() > max_driver_nodes:
        return _reachable_join(e, roots, max_hops)
    rdf_ = roots.to_pandas()  # not take_all: ~0.5 ms/row
    root_set: set[tuple[str, str]] = (
        set(zip(rdf_["graph"], rdf_["node"])) if len(rdf_) else set()
    )
    expanded: set[tuple[str, str]] = set()   # nodes whose edges were followed
    reached: set[tuple[str, str]] = set()    # nodes hit via ≥1 edge
    frontier = set(root_set)
    for _ in range(max_hops):
        if not frontier:
            break
        if len(expanded) + len(reached) + len(frontier) > max_driver_nodes:
            return _reachable_join(e, roots, max_hops)
        expanded |= frontier
        fref = ray.put(frontier)

        def step_fn(df: pd.DataFrame, fref=fref) -> pd.DataFrame:
            fset = ray.get(fref)
            keep = [
                (g, n) in fset for g, n in zip(df["graph"], df["node"])
            ]
            out = df[pd.Series(keep, index=df.index)]
            return pd.DataFrame(
                {"graph": out["graph"].to_numpy(), "node": out["nxt"].to_numpy()}
            ).drop_duplicates()

        step = e.map_batches(step_fn, batch_format="pandas").to_pandas()
        hit = (
            set(zip(step["graph"], step["node"])) if len(step) else set()
        )
        reached |= hit
        frontier = hit - expanded
    else:
        if frontier:
            raise RuntimeError(
                f"reachable() exhausted max_hops={max_hops} with a live "
                "frontier — raise max_hops for this hierarchy depth"
            )
    return _nodes_table(reached)


def _reachable_join(
    e: "ray.data.Dataset", roots: "ray.data.Dataset", max_hops: int
) -> "ray.data.Dataset":
    """Join-formulation closure for hierarchies too big for driver sets:
    per hop, ONE inner hash join (frontier ⋈ edges on (graph, node)) plus
    one left-outer anti-join against the visited set — frontier / visited
    / reached never leave the object store.  Output sorted (graph, node)
    like :func:`_nodes_table` so both regimes are interchangeable."""
    from ..util import heal_schema, join_partitions

    np_ = join_partitions(None)
    empty = ray.data.from_arrow(
        pa.table({"graph": pa.array([], pa.string()),
                  "node": pa.array([], pa.string())})
    )
    if e.count() == 0 or roots.count() == 0:
        return empty

    def _proj(ds, src_col: str):
        return ds.map_batches(
            lambda df, c=src_col: pd.DataFrame(
                {
                    "graph": df["graph"].astype("string"),
                    "node": df[c].astype("string"),
                }
            ),
            batch_format="pandas",
        )

    frontier = distinct(_proj(roots, "node"), ["graph", "node"]).materialize()
    expanded = frontier
    reached = None
    for _ in range(max_hops):
        if frontier.count() == 0:
            break
        step = distinct(
            _proj(
                heal_schema(frontier, np_).join(
                    heal_schema(e, np_), "inner", np_, on=("graph", "node")
                ),
                "nxt",
            ),
            ["graph", "node"],
        ).materialize()
        if step.count() == 0:
            frontier = step
            break
        reached = (
            step
            if reached is None
            else distinct(reached.union(step), ["graph", "node"]).materialize()
        )
        mark = expanded.map_batches(
            lambda df: df.assign(_v=np.int64(1)), batch_format="pandas"
        )
        frontier = (
            heal_schema(step, np_)
            .join(heal_schema(mark, np_), "left_outer", np_,
                  on=("graph", "node"))
            .map_batches(
                lambda df: df[df["_v"].isna()][["graph", "node"]]
                if "_v" in df.columns
                else df[["graph", "node"]],
                batch_format="pandas",
            )
            .materialize()
        )
        expanded = distinct(
            expanded.union(frontier), ["graph", "node"]
        ).materialize()
    else:
        if frontier.count():
            raise RuntimeError(
                f"reachable() exhausted max_hops={max_hops} with a live "
                "frontier — raise max_hops for this hierarchy depth"
            )
    if reached is None:
        return empty
    return reached.sort(["graph", "node"])
