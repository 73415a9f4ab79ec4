"""Distributed graph-search kernels over the triple table.

The reference's entire query engine is six HashMap functions
(ValidatorBase.java:34-293).  The schema-scale versions live in the
broadcast GraphIndex (stages/schema_index.py); THESE are the
stream-scale equivalents — real Ray Data joins for when the probed side
is too big to broadcast:

* ``edges(triples, pred)``            — σ_pred projection (graph, subj, obj)
* ``star_pairs(triples, p1, p2)``     — (x p1 a), (x p2 b) → (a, b): the
  conjunctive star join of searchByMultipleProperty
  (ValidatorBase.java:85-106) expressed as a hash join on (graph, subj).
* ``path_visit(triples, [p1..pk])``   — k-hop property-path join
  (searchByPathVisit, ValidatorBase.java:34-74): chain of hash joins
  obj_i = subj_{i+1}.
* ``reachable(triples, pred, roots)`` — s →p* o fixpoint
  (connectedByRepeatedProp, ValidatorBase.java:234-293) as iterative
  frontier joins WITH a visited set (the reference loops forever on
  cycles; we terminate).

All operate per-graph: every join key includes ``graph`` so one logical
shuffle co-locates a graph's edges, and skew is bounded by file size.
"""

from __future__ import annotations

import pandas as pd

import ray.data


def distinct(ds: "ray.data.Dataset", cols: list[str] | None = None) -> "ray.data.Dataset":
    """Exact distinct over ``cols`` (default: all columns) — map-side dedup
    then one groupby shuffle (count discarded)."""
    cols = cols or ds.schema().names

    def local(df: pd.DataFrame) -> pd.DataFrame:
        return df[cols].drop_duplicates().reset_index(drop=True)

    pre = ds.map_batches(local, batch_format="pandas")
    return pre.groupby(cols).count().select_columns(cols)


def edges(triples: "ray.data.Dataset", pred: str, *, kinds=(0, 1)) -> "ray.data.Dataset":
    """σ pred=... → (graph, subj, obj); object restricted to IRI/bnode by
    default (kinds), matching nodeToResource (ValidatorBase.java:178-188)."""
    kindlist = list(kinds)
    return triples.filter(
        expr=f"pred == '{pred}' and obj_kind in {kindlist}"
    ).select_columns(["graph", "subj", "obj"])


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
    — searchByPathVisit's both-free mode as chained hash joins."""
    cur = edges(triples, preds[0]).rename_columns({"subj": "start", "obj": "end"})
    for p in preds[1:]:
        nxt = edges(triples, p).rename_columns({"subj": "end", "obj": "end2"})
        cur = (
            cur.join(nxt, "inner", num_partitions, on=("graph", "end"))
            .select_columns(["graph", "start", "end2"])
            .rename_columns({"end2": "end"})
        )
    return distinct(cur, ["graph", "start", "end"])


def objects_of(
    triples: "ray.data.Dataset", pred: str, subjects: set[tuple[str, str]]
) -> "ray.data.Dataset":
    """searchObjectsOfProperty (ValidatorBase.java:147-155): ∪ objects(s,p)
    for s in a broadcast (graph, subj) set — semi-join + project, the
    broadcast-small-side form."""
    import ray

    ref = ray.put(frozenset(subjects))

    def f(df: pd.DataFrame) -> pd.DataFrame:
        ss = ray.get(ref)
        keep = [(g, s) in ss for g, s in zip(df["graph"], df["subj"])]
        out = df[pd.Series(keep, index=df.index)]
        return out[["graph", "obj"]].drop_duplicates().reset_index(drop=True)

    return edges(triples, pred).map_batches(f, batch_format="pandas")


def subjects_with(
    triples: "ray.data.Dataset", pred: str, objects: set[tuple[str, str]]
) -> "ray.data.Dataset":
    """searchSubjectsWithProperty (ValidatorBase.java:163-171): the reverse
    semi-join — subjects whose (p, o) hits a broadcast (graph, obj) set."""
    import ray

    ref = ray.put(frozenset(objects))

    def f(df: pd.DataFrame) -> pd.DataFrame:
        os_ = ray.get(ref)
        keep = [(g, o) in os_ for g, o in zip(df["graph"], df["obj"])]
        out = df[pd.Series(keep, index=df.index)]
        return out[["graph", "subj"]].drop_duplicates().reset_index(drop=True)

    return edges(triples, pred).map_batches(f, batch_format="pandas")


def reachable(
    triples: "ray.data.Dataset",
    pred: str,
    roots: "ray.data.Dataset",
    *,
    max_hops: int = 64,
    direction: str = "forward",
) -> "ray.data.Dataset":
    """Fixpoint closure: all (graph, node) reachable from ``roots``
    (columns graph, node) via 0+ ``pred`` edges.  Broadcast-frontier BFS
    with a visited set — cycle-safe, unlike the reference
    (ValidatorBase.java:280-293 has no visited set).

    The edge stream scans distributed once per hop; the frontier / visited
    sets are broadcast (``ray.put``) — code-list closures are schema-scale
    (bounded per file), the same assumption the broadcast GraphIndex makes.
    A closure too big to broadcast would switch to the join formulation
    with hash-partitioned visited state.

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
    visited: set[tuple[str, str]] = {
        (r["graph"], r["node"]) for r in roots.take_all()
    }
    frontier = visited
    for _ in range(max_hops):
        if not frontier:
            break
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

        step = e.map_batches(step_fn, batch_format="pandas").take_all()
        new = {(r["graph"], r["node"]) for r in step} - visited
        visited |= new
        frontier = new
    rows = sorted(visited)
    return ray.data.from_pandas(
        pd.DataFrame(rows, columns=["graph", "node"])
    )
