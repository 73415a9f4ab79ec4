"""Ontology-construction operators: transitive ancestor closure and
RDFS domain/range type inference.

These are the schema-side half of KG construction — materializing what
an ontology *implies* (every superclass of a class, every type an edge's
declaration forces on its endpoints) so downstream consumers query flat
tables instead of walking the hierarchy.  Semantics follow the public
RDFS entailment rules (rdfs5/rdfs7 transitivity for the closure, rdfs2 /
rdfs3 for domain/range); the reference engine's hierarchy walk
(connectedByRepeatedProperty, ValidatorIC20/21) covers the *validation*
side of the same machinery — this module is the construction side.

Scale notes
-----------
* ``ancestor_closure`` is size-adaptive like ``graph.dag_depth``: under
  ``max_driver_edges`` the distinct edge list is factorized to int codes
  and the semi-naive closure runs vectorized on the driver; above it
  each round is one hash join (delta ⋈ edges) + one bucketed distinct,
  and rounds = hierarchy DEPTH (ontologies are shallow — tens of levels
  even for million-class taxonomies).  Per-round pair counts are bounded
  by the distinct closure pairs of that path length, so a DAG terminates
  without an anti-join against the accumulator.
* ``infer_types`` is map-side: the declaration table is ontology-scale
  (one row per predicate) and ships as a plain broadcast dict inside the
  batch function; the only shuffle is the per-node bucketed set-compare
  (util.bucket_agg — one coarse exchange, never a per-node Ray group).
"""

from __future__ import annotations

import numpy as np
import pandas as pd
import pyarrow as pa

import ray
import ray.data

from ..util import bucket_agg, bucket_sum, heal_schema
from .dedup import _B61, _md5_u64_cached
from .graph import _nparts, _ren

_CLOSURE_SCHEMA = pa.schema(
    [
        ("node", pa.string()),
        ("n_ancestors", pa.int64()),
        ("anc_min", pa.string()),
        ("anc_xor", pa.int64()),
    ]
)


def _agg_ancestors(df: pd.DataFrame) -> pd.DataFrame:
    """(node, anc) pairs → per-node summary (count / min / md5-xor).

    The xor digest makes the closure VALUE-exact against a SQL twin
    without shipping the full ancestor set per node: md5_u64 matches
    DuckDB ``md5_number_lower`` and the 61-bit fold keeps both sides in
    int64 range.  Callers guarantee all rows of a node are present
    (driver frame or one hash bucket)."""
    df = df.drop_duplicates(["node", "anc"])
    # md5 once per DISTINCT ancestor (class vocabularies repeat heavily)
    uniq, inv = np.unique(df["anc"].to_numpy(dtype=object), return_inverse=True)
    hu = np.fromiter(
        (_md5_u64_cached(a) % int(_B61) for a in uniq),
        dtype=np.uint64,
        count=len(uniq),
    )
    h = hu[inv]
    order = np.argsort(df["node"].to_numpy(dtype=object), kind="stable")
    node_s = df["node"].to_numpy(dtype=object)[order]
    anc_s = df["anc"].to_numpy(dtype=object)[order]
    h_s = h[order]
    if len(node_s):
        starts = np.flatnonzero(np.r_[True, node_s[1:] != node_s[:-1]])
    else:
        starts = np.array([], dtype=np.int64)
    counts = np.diff(np.r_[starts, len(node_s)])
    xor = (
        np.bitwise_xor.reduceat(h_s, starts)
        if len(starts)
        else np.array([], dtype=np.uint64)
    )
    # anc_s is NOT sorted within a node group; take the group min
    mins = [
        min(anc_s[s : s + c]) for s, c in zip(starts, counts)
    ]  # groups are ancestor-set sized (hierarchy depth), not data-sized
    return pd.DataFrame(
        {
            "node": pd.array(node_s[starts], dtype="string"),
            "n_ancestors": counts.astype("int64"),
            "anc_min": pd.array(mins, dtype="string"),
            "anc_xor": xor.astype("int64"),
        }
    )


def ancestor_closure(
    edges: "ray.data.Dataset",
    *,
    max_iters: int = 64,
    max_driver_edges: int = 2_000_000,
    num_partitions: int | None = None,
) -> "ray.data.Dataset":
    """Transitive closure of a subClassOf-style hierarchy (subj → obj =
    child → parent), summarized per node as (node, n_ancestors,
    anc_min, anc_xor).  Input is a parsed edge table with ``subj`` /
    ``obj`` columns (``graph.extract_edges`` output); only distinct
    (subj, obj) pairs matter.

    Cycles RAISE: a node reaching itself is detected directly (the
    closure of a cyclic graph still saturates, so an iteration bound
    alone cannot see it), with ``max_iters`` as the depth backstop.
    rdfs:subClassOf cycles are legal RDF but make every member
    equivalent; this engine treats them as data errors, like
    ``dag_depth``."""
    np_ = _nparts(num_partitions)

    def to_pairs(df: pd.DataFrame) -> pd.DataFrame:
        return pd.DataFrame(
            {"node": df["subj"].astype("string"), "anc": df["obj"].astype("string")}
        ).drop_duplicates(ignore_index=True)

    pairs = edges.map_batches(to_pairs, batch_format="pandas").materialize()
    n_edges = pairs.count()
    if n_edges == 0:
        return ray.data.from_arrow(_CLOSURE_SCHEMA.empty_table())

    if n_edges <= max_driver_edges:
        e = pd.concat(
            list(pairs.iter_batches(batch_format="pandas", batch_size=65536)),
            ignore_index=True,
        ).drop_duplicates(ignore_index=True)
        # factorize both endpoints into one code space → closure pairs
        # become int64 keys (node_code * N + anc_code), set algebra runs
        # as sorted-array unions instead of Python sets
        both = pd.concat([e["node"], e["anc"]], ignore_index=True)
        codes, uniq = pd.factorize(both)
        n = len(uniq)
        if n >= (1 << 31):
            raise RuntimeError(
                "ancestor_closure driver regime: node count exceeds the "
                "int64 pair-key domain; lower max_driver_edges"
            )
        src = codes[: len(e)].astype(np.int64)
        dst = codes[len(e) :].astype(np.int64)
        order = np.argsort(src, kind="stable")
        e_src, e_dst = src[order], dst[order]
        bounds = np.searchsorted(e_src, np.arange(n + 1))

        acc = np.unique(src * n + dst)
        d_node, d_anc = src, dst
        if np.any(d_node == d_anc):
            raise RuntimeError(
                "ancestor_closure did not converge: the hierarchy "
                "contains a cycle (a class is its own ancestor)"
            )
        for _ in range(max_iters):
            # delta ⋈ edges on (delta.anc == edges.src), vectorized via
            # the sorted edge array: each delta row fans out to its
            # ancestor's parents
            lo, hi = bounds[d_anc], bounds[d_anc + 1]
            reps = hi - lo
            if not reps.any():
                break
            nodes2 = np.repeat(d_node, reps)
            # gather e_dst[lo_i .. hi_i) per row
            idx = np.repeat(lo, reps) + (
                np.arange(reps.sum()) - np.repeat(np.cumsum(reps) - reps, reps)
            )
            anc2 = e_dst[idx]
            keys = np.unique(nodes2 * n + anc2)
            pos = np.searchsorted(acc, keys)
            pos = np.clip(pos, 0, len(acc) - 1)
            fresh = keys[acc[pos] != keys]
            if not len(fresh):
                break
            d_node, d_anc = fresh // n, fresh % n
            # a node reaching itself = subClassOf cycle: the closure
            # still saturates (finite), so max_iters alone can't see it
            if np.any(d_node == d_anc):
                raise RuntimeError(
                    "ancestor_closure did not converge: the hierarchy "
                    "contains a cycle (a class is its own ancestor)"
                )
            acc = np.union1d(acc, fresh)
        else:
            raise RuntimeError(
                f"ancestor_closure did not converge in {max_iters} rounds: "
                "the hierarchy contains a cycle or is deeper than the bound"
            )
        names = uniq.to_numpy(dtype=object) if hasattr(uniq, "to_numpy") else np.asarray(uniq, dtype=object)
        out = _agg_ancestors(
            pd.DataFrame({"node": names[acc // n], "anc": names[acc % n]})
        )
        return ray.data.from_pandas(out.sort_values("node", ignore_index=True))

    # distributed regime: per-round hash join + bucketed distinct;
    # rounds = hierarchy depth, accumulator is a union of round deltas
    # (distinct-per-round keeps each round at true pair cardinality)
    pairs = heal_schema(pairs, np_).materialize()

    def dedup_pairs(ds):
        def f(df: pd.DataFrame) -> pd.DataFrame:
            out = df.drop_duplicates(["node", "anc"])
            if (out["node"] == out["anc"]).any():
                raise RuntimeError(
                    "ancestor_closure did not converge: the hierarchy "
                    "contains a cycle (a class is its own ancestor)"
                )
            return out

        return bucket_agg(ds, ["node", "anc"], f, num_buckets=np_)

    delta = pairs
    acc_parts = [pairs]
    for it in range(max_iters + 1):
        if it == max_iters:
            raise RuntimeError(
                f"ancestor_closure did not converge in {max_iters} rounds: "
                "the hierarchy contains a cycle or is deeper than the bound"
            )
        joined = heal_schema(delta, np_).join(
            heal_schema(_ren(pairs, {"node": "anc", "anc": "anc2"}), np_),
            "inner",
            np_,
            on=("anc",),
        )
        nxt = joined.map_batches(
            lambda df: pd.DataFrame(
                {
                    "node": df["node"].astype("string"),
                    "anc": df["anc2"].astype("string"),
                }
            ),
            batch_format="pandas",
        )
        delta = dedup_pairs(nxt).materialize()
        if delta.count() == 0:
            break
        acc_parts.append(delta)

    acc = acc_parts[0]
    for p in acc_parts[1:]:
        acc = acc.union(p)
    return bucket_agg(acc, ["node"], _agg_ancestors, num_buckets=np_)


def infer_types(
    edges: "ray.data.Dataset",
    types: "ray.data.Dataset",
    decls: dict[str, tuple[str | None, str | None]],
) -> "ray.data.Dataset":
    """RDFS domain/range type inference (rdfs2 / rdfs3) reconciled
    against asserted types: for every edge whose predicate carries a
    declaration, infer (subj : domain) and (obj : range), then compare
    with the asserted ``types`` table (subj, cls) per node.

    Returns one row per class: ``(cls, n_inferred, n_new, n_conflict)``
    where n_inferred counts distinct nodes inferred to be cls, n_new
    those with NO asserted type at all (the inference added knowledge),
    and n_conflict those asserted as something that does not include
    cls (declaration/data disagreement — the KG-construction QA signal).

    ``decls`` is ontology-scale (one entry per predicate) and rides
    into the batch function as a plain closure dict — no shuffle; the
    node-level set compare is one coarse bucketed exchange."""
    dom = {p: d for p, (d, _) in decls.items() if d is not None}
    rng = {p: r for p, (_, r) in decls.items() if r is not None}

    def infer(df: pd.DataFrame) -> pd.DataFrame:
        d = df["pred"].map(dom)
        r = df["pred"].map(rng)
        parts = [
            pd.DataFrame({"node": df.loc[d.notna(), "subj"], "cls": d.dropna()}),
            pd.DataFrame({"node": df.loc[r.notna(), "obj"], "cls": r.dropna()}),
        ]
        out = pd.concat(parts, ignore_index=True).drop_duplicates()
        out["asserted"] = np.int8(0)
        return out.astype({"node": "string", "cls": "string"})

    def assertions(df: pd.DataFrame) -> pd.DataFrame:
        out = df[["subj", "cls"]].rename(columns={"subj": "node"}).drop_duplicates()
        out["asserted"] = np.int8(1)
        return out.astype({"node": "string", "cls": "string"})

    tagged = edges.map_batches(infer, batch_format="pandas").union(
        types.map_batches(assertions, batch_format="pandas")
    )

    def reconcile(df: pd.DataFrame) -> pd.DataFrame:
        inf = df.loc[df["asserted"] == 0, ["node", "cls"]].drop_duplicates()
        ast = df.loc[df["asserted"] == 1, ["node", "cls"]].drop_duplicates()
        if not len(inf):
            return pd.DataFrame(
                {
                    "cls": pd.Series(dtype="string"),
                    "n_inferred": pd.Series(dtype="int64"),
                    "n_new": pd.Series(dtype="int64"),
                    "n_conflict": pd.Series(dtype="int64"),
                }
            )
        has_ast = inf["node"].isin(ast["node"]).to_numpy()
        matched = (
            inf.merge(ast, on=["node", "cls"], how="left", indicator=True)["_merge"]
            == "both"
        ).to_numpy()
        flags = pd.DataFrame(
            {
                "cls": inf["cls"].to_numpy(),
                "n_inferred": np.int64(1),
                "n_new": (~has_ast).astype("int64"),
                "n_conflict": (has_ast & ~matched).astype("int64"),
            }
        )
        return flags.groupby("cls", as_index=False, sort=False).sum()

    per_bucket = bucket_agg(tagged, ["node"], reconcile)
    # class vocabulary is small; one more bucketed sum folds the
    # per-bucket partials without a per-key Ray aggregate
    return bucket_sum(
        per_bucket, ["cls"], ["n_inferred", "n_new", "n_conflict"]
    ).sort("cls")


def shape_check(
    edges: "ray.data.Dataset",
    types: "ray.data.Dataset",
    shapes: dict[str, dict[str, tuple[int, int]]],
    *,
    num_buckets: int = 64,
) -> "ray.data.Dataset":
    """SHACL-style cardinality validation: for every node asserted as a
    class with a shape, check that its outgoing edge count per
    constrained predicate lies in ``[min, max]``.  Returns one row per
    violation: (node, cls, pred, n_found, expected_min, expected_max).

    ``shapes`` maps class IRI → {predicate IRI → (min, max)} and is
    ontology-scale — it rides into the batch functions as a closure
    dict.  Out-edge counts are map-side partials (per-batch
    value_counts); counts and type assertions meet in ONE coarse
    node-bucket exchange where the per-bucket reconcile is a vectorized
    merge — nothing groups by a node-scale key in Ray."""
    preds_of_interest = {p for reqs in shapes.values() for p in reqs}

    def count_partial(df: pd.DataFrame) -> pd.DataFrame:
        sub = df[df["pred"].isin(preds_of_interest)]
        g = sub.groupby(["subj", "pred"], sort=False).size()
        out = g.reset_index(name="c")
        return pd.DataFrame(
            {
                "node": out["subj"].astype("string"),
                "pred": out["pred"].astype("string"),
                "cls": pd.array([None] * len(out), dtype="string"),
                "c": out["c"].astype("int64"),
            }
        )

    def type_rows(df: pd.DataFrame) -> pd.DataFrame:
        sub = df[df["cls"].isin(shapes.keys())]
        return pd.DataFrame(
            {
                "node": sub["subj"].astype("string"),
                "pred": pd.array([None] * len(sub), dtype="string"),
                "cls": sub["cls"].astype("string"),
                "c": pd.Series(-1, index=sub.index, dtype="int64"),
            }
        )

    tagged = edges.map_batches(count_partial, batch_format="pandas").union(
        types.map_batches(type_rows, batch_format="pandas")
    )

    req_rows = pd.DataFrame(
        [
            (cls, pred, mn, mx)
            for cls, reqs in shapes.items()
            for pred, (mn, mx) in reqs.items()
        ],
        columns=["cls", "pred", "mn", "mx"],
    )

    def reconcile(df: pd.DataFrame) -> pd.DataFrame:
        empty = pd.DataFrame(
            {
                "node": pd.Series(dtype="string"),
                "cls": pd.Series(dtype="string"),
                "pred": pd.Series(dtype="string"),
                "n_found": pd.Series(dtype="int64"),
                "expected_min": pd.Series(dtype="int64"),
                "expected_max": pd.Series(dtype="int64"),
            }
        )
        typed = df.loc[df["c"] < 0, ["node", "cls"]].drop_duplicates()
        if not len(typed):
            return empty
        # counts may split across input batches: fold partials first
        cnt = (
            df.loc[df["c"] >= 0, ["node", "pred", "c"]]
            .groupby(["node", "pred"], sort=False, as_index=False)["c"]
            .sum()
        )
        req = typed.merge(req_rows, on="cls")
        got = req.merge(cnt, on=["node", "pred"], how="left")
        got["c"] = got["c"].fillna(0).astype("int64")
        bad = got[(got["c"] < got["mn"]) | (got["c"] > got["mx"])]
        if not len(bad):
            return empty
        return pd.DataFrame(
            {
                "node": bad["node"].astype("string"),
                "cls": bad["cls"].astype("string"),
                "pred": bad["pred"].astype("string"),
                "n_found": bad["c"].to_numpy(),
                "expected_min": bad["mn"].astype("int64").to_numpy(),
                "expected_max": bad["mx"].astype("int64").to_numpy(),
            }
        )

    return bucket_agg(tagged, ["node"], reconcile, num_buckets=num_buckets)
