"""Distributed graph analytics over the extracted edge table.

The kg-construction "graph materialize" step and the queries a KG user
runs right after it: typed edge extraction, degree profiles, per-class
summaries, 2-hop path motif censuses, and multi-hop traversal (BFS
min-hop distances).  Reference parity: the traversal semantics lift the
reference's repeated-property searches (ValidatorBase.java
connectedByRepeatedProperties / searchByPathVisit — one in-heap Jena
model, one visited set) to corpus-scale Datasets; degrees/motifs have no
reference twin (Jena answers them via ad-hoc model iteration) and are
implemented shuffle-minimal:

  * ``degree_table`` — map-side partial counts (combiner), ONE
    groupby-sum shuffle, no joins.
  * ``path2_counts`` — one hash join on the mid node + a tiny groupby.
  * ``class_profile`` — one hash join (edges x types) + three
    aggregations whose outputs are #classes-scale.
  * ``bfs_distances`` — size-adaptive: exact driver BFS under
    ``max_driver_edges`` (edge list collected ONCE), else fully
    distributed frontier rounds: (node, dist) and the frontier stay
    Datasets, each round one hash join through the materialized edge
    table plus one anti-join against the known set — the driver holds
    only the round counter and frontier count.  Rounds equal graph
    depth — a graph with diameter ≫ ``max_rounds`` needs the
    pointer-jumping CC shape (canonicalize.cc_labels), not a frontier
    walk.
  * ``random_walks`` — deterministic hash-pick walk corpus; same
    size-adaptive round shape as the BFS.
"""

from __future__ import annotations

import numpy as np
import pandas as pd

import ray
import ray.data

from ..util import heal_schema
from ..vocab import PREFIX_RDF

RDF_TYPE = PREFIX_RDF + "type"


def _nparts(num_partitions: int | None = None) -> int:
    """Hash-partition count for join/groupby stages — the shared
    cluster-derived default (util.join_partitions)."""
    from ..util import join_partitions

    return join_partitions(num_partitions)


def _ren(ds: "ray.data.Dataset", mapping: dict) -> "ray.data.Dataset":
    """Rename via pandas map_batches (Project chokes on the schema-less
    empty blocks sparse groupbys emit — see canonicalize._ren)."""
    return ds.map_batches(
        lambda df, m=mapping: df.rename(columns=m), batch_format="pandas"
    )


def extract_edges(
    triples: "ray.data.Dataset",
    *,
    exclude_preds: tuple[str, ...] = (RDF_TYPE,),
) -> "ray.data.Dataset":
    """Object-property edge table (subj, pred, obj) from parsed triples:
    IRI objects only (obj_kind == 0), minus ``exclude_preds`` (rdf:type
    by default — type assertions are node metadata, not graph edges)."""
    excl = list(exclude_preds)

    def f(df: pd.DataFrame) -> pd.DataFrame:
        m = (df["obj_kind"] == 0) & ~df["pred"].isin(excl)
        out = df.loc[m, ["subj", "pred", "obj"]].reset_index(drop=True)
        return out.astype({"subj": "string", "pred": "string", "obj": "string"})

    return triples.map_batches(f, batch_format="pandas")


def type_table(triples: "ray.data.Dataset") -> "ray.data.Dataset":
    """(subj, cls) rows from rdf:type triples with IRI objects."""

    def f(df: pd.DataFrame) -> pd.DataFrame:
        m = (df["pred"] == RDF_TYPE) & (df["obj_kind"] == 0)
        out = df.loc[m, ["subj", "obj"]].rename(columns={"obj": "cls"})
        return out.reset_index(drop=True).astype({"subj": "string", "cls": "string"})

    return triples.map_batches(f, batch_format="pandas")


def degree_table(edges: "ray.data.Dataset") -> "ray.data.Dataset":
    """(node, out_deg, in_deg) over every node appearing in ``edges``.

    Map-side combine: each block collapses to per-node partial counts,
    then ONE coarse node-hash bucket shuffle with a vectorized
    per-bucket sum (util.bucket_sum) — Ray's own Aggregate pays per
    DISTINCT KEY (~0.4 ms each), which at node-scale keys turns a
    165 K-edge graph into minutes."""
    from ..util import bucket_sum

    def partial(df: pd.DataFrame) -> pd.DataFrame:
        o = df["subj"].value_counts()
        i = df["obj"].value_counts()
        nodes = o.index.union(i.index)
        return pd.DataFrame(
            {
                "node": pd.Series(nodes, dtype="string"),
                "out_deg": o.reindex(nodes, fill_value=0).astype("int64").to_numpy(),
                "in_deg": i.reindex(nodes, fill_value=0).astype("int64").to_numpy(),
            }
        )

    return bucket_sum(
        edges.map_batches(partial, batch_format="pandas"),
        ["node"],
        ["out_deg", "in_deg"],
    )


def path2_counts(
    edges: "ray.data.Dataset", *, num_partitions: int | None = None
) -> "ray.data.Dataset":
    """2-hop path motif census: rows (p1, p2, n) counting the paths
    s -p1-> x -p2-> o.  ONE hash join on the mid node x, then a
    predicate-pair groupby whose output is #predicates²-scale."""
    np_ = _nparts(num_partitions)
    left = heal_schema(
        _ren(
            edges.map_batches(
                lambda df: df[["pred", "obj"]], batch_format="pandas"
            ),
            {"pred": "p1", "obj": "mid"},
        ),
        np_,
    )
    right = heal_schema(
        _ren(
            edges.map_batches(
                lambda df: df[["subj", "pred"]], batch_format="pandas"
            ),
            {"subj": "mid", "pred": "p2"},
        ),
        np_,
    )
    joined = left.join(right, "inner", np_, on=("mid",))
    return _ren(joined.groupby(["p1", "p2"]).count(), {"count()": "n"})


def class_profile(
    triples: "ray.data.Dataset", *, num_partitions: int | None = None
) -> pd.DataFrame:
    """Per-class graph summary — the schema-inference step of KG
    construction.  Returns a #classes-scale pandas frame with columns
    (cls, n_instances, n_out_edges, n_distinct_preds, max_out_degree).

    The corpus-scale work (edges x types hash join, per-subject counts)
    is distributed; only the #classes-row aggregates are merged on the
    driver."""
    np_ = _nparts(num_partitions)
    types = heal_schema(type_table(triples), np_).materialize()
    edges = heal_schema(extract_edges(triples), np_)
    joined = edges.join(types, "inner", np_, on=("subj",)).materialize()

    n_inst = _ren(types.groupby("cls").count(), {"count()": "n_instances"}).to_pandas()

    from ..util import bucket_count

    # (cls, subj) is node-scale — bucket it (see degree_table)
    per_subj = bucket_count(
        joined.map_batches(
            lambda df: df[["cls", "subj"]], batch_format="pandas"
        ),
        ["cls", "subj"],
        out_col="out_n",
    )
    per_cls = per_subj.groupby("cls").sum(["out_n"]).to_pandas()
    per_cls = per_cls.rename(columns={"sum(out_n)": "n_out_edges"})
    max_out = per_subj.groupby("cls").max("out_n").to_pandas()
    max_out = max_out.rename(columns={"max(out_n)": "max_out_degree"})

    from ..functions.kernel import distinct

    pred_pairs = distinct(
        joined.map_batches(lambda df: df[["cls", "pred"]], batch_format="pandas")
    )
    n_preds = _ren(
        pred_pairs.groupby("cls").count(), {"count()": "n_distinct_preds"}
    ).to_pandas()

    out = n_inst
    for extra in (per_cls, n_preds, max_out):
        out = out.merge(extra, on="cls", how="left")
    for c in ("n_out_edges", "n_distinct_preds", "max_out_degree"):
        out[c] = out[c].fillna(0).astype("int64")
    out["n_instances"] = out["n_instances"].astype("int64")
    return out.sort_values("cls", ignore_index=True)


def bfs_distances(
    edges: "ray.data.Dataset",
    seeds: list[str],
    *,
    reverse: bool = False,
    max_rounds: int = 64,
    max_driver_edges: int = 2_000_000,
) -> "ray.data.Dataset":
    """Min-hop distance from a seed set — rows (node, dist) for every
    reachable node, seeds at distance 0.  ``reverse=True`` walks edges
    object→subject (the natural direction for root-to-leaf queries over
    provenance chains, whose triples point leaf-to-root).

    The single frontier engine lives in :func:`multi_bfs_distances`
    (size-adaptive driver walk / distributed rounds, parity-tested);
    this is its (node, dist) projection — for one seed a pure column
    drop, for several a bucketed min over the per-seed distances.
    Multi-seed callers that only need the min should prefer one seed
    set per call anyway: the multi-source state is per (seed, node),
    so K seeds cost K frontiers."""
    pairs = multi_bfs_distances(
        edges,
        seeds,
        reverse=reverse,
        max_rounds=max_rounds,
        max_driver_edges=max_driver_edges,
    )
    proj = pairs.map_batches(
        lambda df: df[["node", "dist"]], batch_format="pandas"
    )
    if len(dict.fromkeys(seeds)) > 1:
        from ..util import bucket_agg

        def min_d(df: pd.DataFrame) -> pd.DataFrame:
            return (
                df.sort_values(["node", "dist"])
                .drop_duplicates("node", keep="first")
                .reset_index(drop=True)
            )

        proj = bucket_agg(proj, ["node"], min_d)
    return proj.sort(["dist", "node"]).map_batches(
        lambda df: df.astype({"node": "string", "dist": "int64"}),
        batch_format="pandas",
    )


def multi_bfs_distances(
    edges: "ray.data.Dataset",
    seeds: list[str],
    *,
    reverse: bool = False,
    max_rounds: int = 64,
    max_driver_edges: int = 2_000_000,
) -> "ray.data.Dataset":
    """Min-hop distances from EVERY seed at once — rows
    (src, node, dist) for each seed × reachable node.  The multi-source
    generalization of :func:`bfs_distances` (the primitive behind
    sampled closeness / harmonic centrality): state is keyed on the
    (src, node) PAIR, so one pass of frontier rounds carries all K
    seeds and the edge table is joined once per round, not once per
    seed.

    Size-adaptive like the single-source version (parity-tested):
    ≤ ``max_driver_edges`` edges run K driver BFS walks over ONE
    collected adjacency; above it, distributed frontier rounds where
    the frontier and dist tables are Datasets of (src, node[, dist])
    and each round is one hash join + one left-outer anti-join — the
    driver holds only the round counter.  Rounds are bounded by the
    DEEPEST seed's eccentricity."""
    src_col, dst_col = ("obj", "subj") if reverse else ("subj", "obj")
    seeds_u = list(dict.fromkeys(seeds))
    n_edges = edges.count()

    if n_edges <= max_driver_edges:
        adj: dict[str, list[str]] = {}
        for df in edges.map_batches(
            lambda d: d[[src_col, dst_col]], batch_format="pandas"
        ).iter_batches(batch_format="pandas", batch_size=65536):
            for s, t in zip(df[src_col], df[dst_col]):
                adj.setdefault(s, []).append(t)
        rows_src: list[str] = []
        rows_node: list[str] = []
        rows_dist: list[int] = []
        for seed in seeds_u:
            dist: dict[str, int] = {seed: 0}
            frontier = [seed]
            d = 0
            while frontier:
                if d >= max_rounds:
                    raise RuntimeError(
                        f"multi_bfs_distances exceeded max_rounds={max_rounds}"
                    )
                d += 1
                nxt: list[str] = []
                for u in frontier:
                    for v in adj.get(u, ()):
                        if v not in dist:
                            dist[v] = d
                            nxt.append(v)
                frontier = nxt
            rows_src.extend([seed] * len(dist))
            rows_node.extend(dist.keys())
            rows_dist.extend(dist.values())
        out = pd.DataFrame(
            {
                "src": pd.Series(rows_src, dtype="string"),
                "node": pd.Series(rows_node, dtype="string"),
                "dist": pd.Series(rows_dist, dtype="int64"),
            }
        )
        return ray.data.from_pandas(
            out.sort_values(["src", "dist", "node"], ignore_index=True)
        )

    from ..util import bucket_agg

    np_ = _nparts(None)
    mat = edges.map_batches(
        lambda d: d[[src_col, dst_col]], batch_format="pandas"
    ).materialize()

    def _typed_pairs(df: pd.DataFrame) -> pd.DataFrame:
        if not len(df) or "node" not in df.columns:
            return pd.DataFrame(
                {
                    "src": pd.Series(dtype="string"),
                    "node": pd.Series(dtype="string"),
                }
            )
        return pd.DataFrame(
            {
                "src": df["src"].astype("string"),
                "node": df["node"].astype("string"),
            }
        )

    dist_ds = ray.data.from_pandas(
        pd.DataFrame(
            {
                "src": pd.Series(seeds_u, dtype="string"),
                "node": pd.Series(seeds_u, dtype="string"),
                "dist": pd.Series([0] * len(seeds_u), dtype="int64"),
            }
        )
    ).materialize()
    frontier_ds = dist_ds
    d = 0
    while frontier_ds.count() > 0:
        if d >= max_rounds:
            raise RuntimeError(
                f"multi_bfs_distances exceeded max_rounds={max_rounds} "
                "(graph deeper than the frontier-round regime supports)"
            )
        d += 1
        # expand: edges ⋈ frontier on the walk column; the seed tag
        # rides along so one join advances every source's frontier
        cand = (
            mat.join(
                heal_schema(
                    _ren(
                        frontier_ds.map_batches(
                            _typed_pairs, batch_format="pandas"
                        ),
                        {"node": src_col},
                    ),
                    np_,
                ),
                "inner",
                np_,
                on=(src_col,),
            )
            .map_batches(
                lambda df: _typed_pairs(
                    df.rename(columns={dst_col: "node"})
                ).drop_duplicates(),
                batch_format="pandas",
            )
            .materialize()
        )
        if cand.count() == 0:
            break
        cand = bucket_agg(
            cand,
            ["src", "node"],
            lambda df: df.drop_duplicates(["src", "node"]),
            num_buckets=np_,
        ).map_batches(_typed_pairs, batch_format="pandas")

        def first_reached(df: pd.DataFrame, d=d) -> pd.DataFrame:
            if len(df) and "_seen" in df.columns:
                df = df[df["_seen"].isna()]
            pairs = _typed_pairs(df)
            pairs["dist"] = pd.Series(
                [d] * len(pairs), dtype="int64", index=pairs.index
            )
            return pairs

        new = (
            heal_schema(cand, np_)
            .join(
                heal_schema(_ren(dist_ds, {"dist": "_seen"}), np_),
                "left_outer",
                np_,
                on=("src", "node"),
            )
            .map_batches(first_reached, batch_format="pandas")
            .materialize()
        )
        dist_ds = dist_ds.union(new).materialize()
        frontier_ds = new

    return dist_ds.sort(["src", "dist", "node"]).map_batches(
        lambda df: df.astype(
            {"src": "string", "node": "string", "dist": "int64"}
        ),
        batch_format="pandas",
    )


def bfs_tree(
    edges: "ray.data.Dataset",
    seed: str,
    *,
    reverse: bool = False,
    max_rounds: int = 64,
    max_driver_edges: int = 2_000_000,
    num_partitions: int | None = None,
) -> "ray.data.Dataset":
    """Parent-pointer BFS tree from ``seed``: rows (node, parent, dist)
    for every reachable node — ``parent`` is the LEXICOGRAPHICALLY
    SMALLEST predecessor one hop closer to the seed (deterministic, so
    a SQL oracle reproduces the tree exactly; the seed's parent is "").
    This is the path-reconstruction companion of :func:`bfs_distances`:
    walking parent pointers from any node yields one shortest path.

    Scale design: distances come from the size-adaptive BFS; parents
    from TWO hash joins (edge ⋈ dist on each endpoint), a vectorized
    dist+1 filter, and one bucketed min — never a per-node loop."""
    from ..util import bucket_agg, join_partitions

    src_col, dst_col = ("obj", "subj") if reverse else ("subj", "obj")
    dist = bfs_distances(
        edges,
        [seed],
        reverse=reverse,
        max_rounds=max_rounds,
        max_driver_edges=max_driver_edges,
    ).materialize()
    jp = join_partitions(num_partitions)

    # edge (walk-src → walk-dst): parent of dst is src when
    # dist(src) + 1 == dist(dst)
    e = edges.map_batches(
        lambda d: d[[src_col, dst_col]]
        .rename(columns={src_col: "parent", dst_col: "node"})
        .astype({"parent": "string", "node": "string"}),
        batch_format="pandas",
    )
    pdist = _ren(dist, {"node": "parent", "dist": "_pd"})
    j = (
        heal_schema(e, jp)
        .join(heal_schema(pdist, jp), "inner", jp, on=("parent",))
        .join(heal_schema(dist, jp), "inner", jp, on=("node",))
        .map_batches(
            lambda df: df[df["_pd"] + 1 == df["dist"]][
                ["node", "parent", "dist"]
            ].reset_index(drop=True),
            batch_format="pandas",
        )
    )

    def min_parent(df: pd.DataFrame) -> pd.DataFrame:
        # sort + drop_duplicates, NOT groupby.min (pure-Python on
        # string dtype)
        out = df.sort_values(["node", "parent"]).drop_duplicates(
            "node", keep="first"
        )
        return out.reset_index(drop=True).astype(
            {"node": "string", "parent": "string", "dist": "int64"}
        )

    tree = bucket_agg(j, ["node"], min_parent)
    root = ray.data.from_pandas(
        pd.DataFrame(
            {
                "node": pd.Series([seed], dtype="string"),
                "parent": pd.Series([""], dtype="string"),
                "dist": pd.Series([0], dtype="int64"),
            }
        )
    )
    return tree.union(root).map_batches(
        lambda df: df.astype(
            {"node": "string", "parent": "string", "dist": "int64"}
        ),
        batch_format="pandas",
    )


def closeness_table(
    edges: "ray.data.Dataset",
    seeds: list[str],
    *,
    reverse: bool = False,
    max_rounds: int = 64,
    max_driver_edges: int = 2_000_000,
) -> "ray.data.Dataset":
    """Sampled closeness-centrality statistics: for each seed, the
    reachable-set size and the integer sum of min-hop distances (the
    two exact ingredients of closeness C(u) = (r-1)²/(n-1)/dist_sum —
    kept as integers so a SQL oracle can hash-compare them; the float
    division is the caller's presentation step).  One multi-source BFS
    over the shared edge table, then a K-row aggregate."""
    pairs = multi_bfs_distances(
        edges,
        seeds,
        reverse=reverse,
        max_rounds=max_rounds,
        max_driver_edges=max_driver_edges,
    )

    def partial(df: pd.DataFrame) -> pd.DataFrame:
        g = df.groupby("src", sort=False)["dist"].agg(["count", "sum"])
        return pd.DataFrame(
            {
                "src": pd.Series(g.index, dtype="string"),
                "n_reached": g["count"].to_numpy().astype("int64"),
                "dist_sum": g["sum"].to_numpy().astype("int64"),
            }
        )

    from ..util import bucket_sum

    out = bucket_sum(
        pairs.map_batches(partial, batch_format="pandas"),
        ["src"],
        ["n_reached", "dist_sum"],
    )
    return out.sort("src").map_batches(
        lambda df: df.astype(
            {"src": "string", "n_reached": "int64", "dist_sum": "int64"}
        ),
        batch_format="pandas",
    )


def _undirected(edges: "ray.data.Dataset") -> "ray.data.Dataset":
    """Distinct undirected edge set (x, y) with x < y, self-loops dropped."""
    from ..functions.kernel import distinct

    def undir(df: pd.DataFrame) -> pd.DataFrame:
        a = df["subj"].astype(str)
        b = df["obj"].astype(str)
        keep = a != b
        a, b = a[keep], b[keep]
        lo = a.where(a < b, b)
        hi = b.where(a < b, a)
        return pd.DataFrame({"x": lo, "y": hi}).drop_duplicates().astype("string")

    return distinct(edges.map_batches(undir, batch_format="pandas"), ["x", "y"])


def triangle_enum(
    edges: "ray.data.Dataset",
    *,
    max_broadcast_nodes: int = 5_000_000,
    num_partitions: int | None = None,
    undirected: "ray.data.Dataset | None" = None,
) -> "ray.data.Dataset":
    """Enumerate all triangles of the undirected version of ``edges`` as
    rows (a, b, c), each triangle exactly once, ordered by the
    degree-orientation rank (ties by node id).

    Algorithm (the MapReduce node-iterator with degree orientation,
    Suri & Vassilvitskii WWW'11): orient every undirected edge from its
    lower-(degree, id) endpoint to the higher one — every node's
    oriented out-degree is then O(√m) on any graph, so the wedge
    self-join cannot explode on hub nodes — generate wedges
    (a→b, a→c) with b ≺ c by ONE self-join on the source, and close
    them against the oriented edge set with ONE more hash join.

    Size-adaptive degree lookup (parity-tested): node degrees broadcast
    as a ``ray.put`` dict under ``max_broadcast_nodes`` (map-side
    orientation, no extra shuffle); above it, two hash joins attach the
    endpoint degrees instead — same output either way.

    ``undirected``: a caller that already holds the distinct (x, y)
    undirected edge set (e.g. clustering_coeff, which also needs it for
    degrees) passes it here to skip a second corpus-scale distinct
    shuffle."""
    np_ = _nparts(num_partitions)
    u = heal_schema(
        undirected if undirected is not None else _undirected(edges), np_
    ).materialize()

    def deg_partial(df: pd.DataFrame) -> pd.DataFrame:
        c = pd.concat([df["x"], df["y"]], ignore_index=True).value_counts()
        return pd.DataFrame(
            {"node": pd.Series(c.index, dtype="string"),
             "d": c.to_numpy().astype("int64")}
        )

    from ..util import bucket_sum

    deg = bucket_sum(
        u.map_batches(deg_partial, batch_format="pandas"), ["node"], ["d"]
    )

    def orient_frame(df: pd.DataFrame) -> pd.DataFrame:
        """(x, y, dx, dy) → oriented (s, t, dt): lower (deg, id) first."""
        fwd = (df["dx"] < df["dy"]) | ((df["dx"] == df["dy"]) & (df["x"] < df["y"]))
        return pd.DataFrame(
            {
                "s": df["x"].where(fwd, df["y"]).astype("string"),
                "t": df["y"].where(fwd, df["x"]).astype("string"),
                "dt": df["dy"].where(fwd, df["dx"]).astype("int64"),
            }
        )

    if deg.count() <= max_broadcast_nodes:
        dmap: dict[str, int] = {}
        for b in deg.iter_batches(batch_format="pandas", batch_size=65536):
            dmap.update(zip(b["node"], b["d"].astype(int)))
        ref = ray.put(dmap)

        def orient_bcast(df: pd.DataFrame, ref=ref) -> pd.DataFrame:
            m = ray.get(ref)
            df = df.copy()
            df["dx"] = df["x"].map(m).astype("int64")
            df["dy"] = df["y"].map(m).astype("int64")
            return orient_frame(df)

        oriented = u.map_batches(orient_bcast, batch_format="pandas")
    else:
        withx = heal_schema(u, np_).join(
            heal_schema(_ren(deg, {"node": "x", "d": "dx"}), np_),
            "inner", np_, on=("x",),
        )
        both = heal_schema(withx, np_).join(
            heal_schema(_ren(deg, {"node": "y", "d": "dy"}), np_),
            "inner", np_, on=("y",),
        )
        oriented = both.map_batches(orient_frame, batch_format="pandas")

    oriented = heal_schema(oriented, np_).materialize()

    wedges = heal_schema(
        _ren(
            oriented.map_batches(lambda df: df[["s", "t", "dt"]], batch_format="pandas"),
            {"t": "b", "dt": "db"},
        ),
        np_,
    ).join(
        heal_schema(
            _ren(oriented, {"t": "c", "dt": "dc"}), np_
        ),
        "inner", np_, on=("s",),
    )

    def keep_ordered(df: pd.DataFrame) -> pd.DataFrame:
        m = (df["db"] < df["dc"]) | ((df["db"] == df["dc"]) & (df["b"] < df["c"]))
        out = df.loc[m, ["s", "b", "c"]].reset_index(drop=True)
        return out.astype({"s": "string", "b": "string", "c": "string"})

    closing = _ren(
        oriented.map_batches(lambda df: df[["s", "t"]], batch_format="pandas"),
        {"s": "b", "t": "c"},
    )
    wkept = heal_schema(
        wedges.map_batches(keep_ordered, batch_format="pandas"), np_
    ).materialize()
    if wkept.count() == 0:
        # a wedge-free graph (e.g. a star) has no triangles; the join
        # below would crash on an all-empty schema-less left side
        import pyarrow as pa

        return ray.data.from_arrow(
            pa.schema(
                [("a", pa.string()), ("b", pa.string()), ("c", pa.string())]
            ).empty_table()
        )
    tri = wkept.join(heal_schema(closing, np_), "inner", np_, on=("b", "c"))

    def canon(df: pd.DataFrame) -> pd.DataFrame:
        import numpy as np

        arr = np.sort(df[["s", "b", "c"]].to_numpy(dtype=object), axis=1)
        return pd.DataFrame(
            {"a": arr[:, 0], "b": arr[:, 1], "c": arr[:, 2]}, dtype="string"
        )

    return tri.map_batches(canon, batch_format="pandas")


def property_cardinality(
    triples: "ray.data.Dataset", *, num_buckets: int = 64
) -> "ray.data.Dataset":
    """Ontology-bootstrap property profiling: per predicate — triple
    count, distinct subject/object cardinalities, max out-degree per
    subject / in-degree per object, and functional / inverse-functional
    flags (max == 1, the cardinality evidence an ontology constructor
    uses to propose owl:FunctionalProperty axioms).

    Scale design: per-block (pred, term) partial counts → ONE bucketed
    sum per side (pairs are globally unique after it) → per-block tiny
    per-pred partials → driver combine over ~|preds| × blocks rows —
    predicates are vocabulary-scale, terms are node-scale, and no
    node-scale key ever reaches a Ray aggregate."""
    from ..util import bucket_sum

    def per_pred(col: str, n_col: str, mx_col: str) -> pd.DataFrame:
        def partial(df: pd.DataFrame, c=col) -> pd.DataFrame:
            g = df.groupby(["pred", c], as_index=False, sort=False).size()
            return g.rename(columns={"size": "c", c: "term"}).astype(
                {"pred": "string", "term": "string", "c": "int64"}
            )

        pairs = bucket_sum(
            triples.map_batches(partial, batch_format="pandas"),
            ["pred", "term"],
            ["c"],
            num_buckets=num_buckets,
        )

        def fold(df: pd.DataFrame) -> pd.DataFrame:
            g = df.groupby("pred", sort=False)["c"].agg(["size", "max", "sum"])
            return pd.DataFrame(
                {
                    "pred": pd.Series(g.index, dtype="string"),
                    "n_terms": g["size"].to_numpy().astype("int64"),
                    "mx": g["max"].to_numpy().astype("int64"),
                    "n": g["sum"].to_numpy().astype("int64"),
                }
            )

        parts = pairs.map_batches(fold, batch_format="pandas").to_pandas()
        if not len(parts):
            return pd.DataFrame(
                {"pred": pd.Series(dtype="string"),
                 n_col: pd.Series(dtype="int64"),
                 mx_col: pd.Series(dtype="int64"),
                 "n_triples": pd.Series(dtype="int64")}
            )
        out = parts.groupby("pred", as_index=False).agg(
            **{n_col: ("n_terms", "sum"), mx_col: ("mx", "max"),
               "n_triples": ("n", "sum")}
        )
        return out

    s = per_pred("subj", "n_subjects", "max_out_per_subj")
    o = per_pred("obj", "n_objects", "max_in_per_obj").drop(
        columns=["n_triples"]
    )
    m = s.merge(o, on="pred", how="outer")
    m["functional"] = (m["max_out_per_subj"] == 1).astype("int64")
    m["inverse_functional"] = (m["max_in_per_obj"] == 1).astype("int64")
    cols = ["pred", "n_triples", "n_subjects", "n_objects",
            "max_out_per_subj", "max_in_per_obj", "functional",
            "inverse_functional"]
    m = m[cols]
    for c in cols[1:]:
        m[c] = m[c].astype("int64")
    m["pred"] = m["pred"].astype("string")
    return ray.data.from_pandas(m.sort_values("pred", ignore_index=True))


def pred_subsumption(
    triples: "ray.data.Dataset", *, num_buckets: int = 64
) -> "ray.data.Dataset":
    """Property-hierarchy induction (rdfs:subPropertyOf candidates):
    for every ORDERED predicate pair (a, b), the subject-set overlap —
    ``contained`` = 1 when every subject carrying ``a`` also carries
    ``b`` (the evidence an ontology constructor uses to propose
    sub-property / domain axioms).

    Scale design: per-block distinct (subj, pred) partials → ONE
    subject-bucketed dedup whose in-bucket fn does the vectorized pair
    expansion (a subject's predicate set is vocabulary-sized) →
    |preds|²-scale driver combine.  Subjects never key a Ray
    aggregate and the pair space is vocabulary², not node²."""
    from ..util import bucket_agg

    def distinct_sp(df: pd.DataFrame) -> pd.DataFrame:
        return (
            df[["subj", "pred"]]
            .drop_duplicates()
            .astype({"subj": "string", "pred": "string"})
        )

    def fold(df: pd.DataFrame) -> pd.DataFrame:
        d = df[["subj", "pred"]].drop_duplicates()
        tot = d.groupby("pred", as_index=False).size()
        t = pd.DataFrame(
            {"pred_a": tot["pred"], "pred_b": "", "n": tot["size"]}
        )
        m = d.merge(d, on="subj")
        m = m[m["pred_x"] != m["pred_y"]]
        g = m.groupby(["pred_x", "pred_y"], as_index=False).size()
        p = pd.DataFrame(
            {"pred_a": g["pred_x"], "pred_b": g["pred_y"], "n": g["size"]}
        )
        out = pd.concat([t, p], ignore_index=True)
        return out.astype(
            {"pred_a": "string", "pred_b": "string", "n": "int64"}
        )

    parts = bucket_agg(
        triples.map_batches(distinct_sp, batch_format="pandas"),
        ["subj"],
        fold,
        num_buckets=num_buckets,
    ).to_pandas()
    cols = {
        "pred_a": pd.Series(dtype="string"),
        "pred_b": pd.Series(dtype="string"),
        "n_a": pd.Series(dtype="int64"),
        "n_ab": pd.Series(dtype="int64"),
        "contained": pd.Series(dtype="int64"),
    }
    if not len(parts):
        return ray.data.from_pandas(pd.DataFrame(cols))
    agg = parts.groupby(["pred_a", "pred_b"], as_index=False)["n"].sum()
    tot = agg[agg["pred_b"] == ""].set_index("pred_a")["n"]
    pair = agg[agg["pred_b"] != ""].set_index(["pred_a", "pred_b"])["n"]
    rows = []
    for a in sorted(tot.index):
        for b in sorted(tot.index):
            if a == b:
                continue
            nab = int(pair.get((a, b), 0))
            rows.append((a, b, int(tot[a]), nab, int(nab == int(tot[a]))))
    out = pd.DataFrame(
        rows, columns=["pred_a", "pred_b", "n_a", "n_ab", "contained"]
    ).astype({c: s.dtype for c, s in cols.items()})
    return ray.data.from_pandas(out)


# ordered pair per triangle corner → bit weight; cyclic = one full
# rotation present (a→b→c→a = 1|4|16, or the reverse = 2|8|32)
_MOTIF_BITS = (
    ("a", "b", 1),
    ("b", "a", 2),
    ("b", "c", 4),
    ("c", "b", 8),
    ("c", "a", 16),
    ("a", "c", 32),
)


def triangle_motifs(
    edges: "ray.data.Dataset",
    *,
    num_partitions: int | None = None,
    undirected: "ray.data.Dataset | None" = None,
) -> "ray.data.Dataset":
    """Directed-motif census of every triangle: rows
    (a, b, c, mask, motif) where ``mask`` encodes which of the 6
    candidate ordered pairs exist in the directed edge set
    (``_MOTIF_BITS`` layout) and ``motif`` is ``cyclic`` when either
    full rotation is present, else ``transitive`` (the feed-forward
    triad — the classic network-motif split, Milo et al. 2002).

    Scale design: triangles come from the degree-oriented
    :func:`triangle_enum` (wedge fan-out O(√m)); each triangle explodes
    map-side into its 6 bit-weighted ordered-pair probes, which meet
    the DISTINCT directed edge set in ONE hash join, and the surviving
    bits re-assemble per triangle with one bucketed sum — no broadcast
    of the edge set, no per-row Python."""
    from ..functions.kernel import distinct
    from ..util import bucket_sum, join_partitions

    tris = triangle_enum(
        edges, num_partitions=num_partitions, undirected=undirected
    ).materialize()

    def dkeys(df: pd.DataFrame) -> pd.DataFrame:
        s = df["subj"].astype(str)
        o = df["obj"].astype(str)
        keep = s != o
        out = pd.DataFrame({"pair": s[keep] + "\x01" + o[keep]})
        return out.drop_duplicates().astype({"pair": "string"})

    de = distinct(edges.map_batches(dkeys, batch_format="pandas"), ["pair"])

    def explode(df: pd.DataFrame) -> pd.DataFrame:
        if not len(df):
            return pd.DataFrame(
                {
                    "a": pd.Series(dtype="string"),
                    "b": pd.Series(dtype="string"),
                    "c": pd.Series(dtype="string"),
                    "pair": pd.Series(dtype="string"),
                    "bit": pd.Series(dtype="int64"),
                }
            )
        parts = []
        for u, v, bit in _MOTIF_BITS:
            p = df[["a", "b", "c"]].astype(str).copy()
            p["pair"] = p[u] + "\x01" + p[v]
            p["bit"] = np.int64(bit)
            parts.append(p)
        return pd.concat(parts, ignore_index=True).astype(
            {"a": "string", "b": "string", "c": "string", "pair": "string"}
        )

    jp = join_partitions(num_partitions)
    hits = (
        heal_schema(tris.map_batches(explode, batch_format="pandas"), jp)
        .join(heal_schema(de, jp), "inner", jp, on=("pair",))
        .map_batches(
            lambda df: df[["a", "b", "c", "bit"]], batch_format="pandas"
        )
    )
    masked = bucket_sum(hits, ["a", "b", "c"], ["bit"])

    def classify(df: pd.DataFrame) -> pd.DataFrame:
        if not len(df):
            return pd.DataFrame(
                {
                    "a": pd.Series(dtype="string"),
                    "b": pd.Series(dtype="string"),
                    "c": pd.Series(dtype="string"),
                    "mask": pd.Series(dtype="int64"),
                    "motif": pd.Series(dtype="string"),
                }
            )
        m = df["bit"].astype("int64").to_numpy()
        cyc = ((m & 21) == 21) | ((m & 42) == 42)
        out = df[["a", "b", "c"]].astype("string").copy()
        out["mask"] = m
        out["motif"] = pd.Series(
            np.where(cyc, "cyclic", "transitive"), index=df.index
        ).astype("string")
        return out

    return masked.map_batches(classify, batch_format="pandas")


def pagerank_int(
    edges: "ray.data.Dataset",
    *,
    iters: int = 3,
    scale: int = 1_000_000,
    damp_num: int = 85,
    damp_den: int = 100,
    max_driver_edges: int = 2_000_000,
    num_partitions: int | None = None,
    restart_nodes: list[str] | None = None,
) -> "ray.data.Dataset":
    """Deterministic INTEGER PageRank — floor arithmetic end to end, so a
    SQL oracle can reproduce it bit-exactly (IEEE-float PageRank cannot
    be hash-compared across engines; summation order differs):

        pr_0(n)   = scale                       (for every node)
        contrib(m)= pr_i(m) // outdeg(m)        (per out-EDGE; multi-edges
                                                 contribute once each)
        pr_{i+1}(n) = base + damp_num * (Σ incoming contrib) // damp_den
        base      = (damp_den - damp_num) * scale // damp_den

    ``restart_nodes`` switches to PERSONALIZED PageRank: the initial
    mass and the per-iteration restart term ``base`` land only on the
    given seed set (pr_0 = scale·[n ∈ S]; base·[n ∈ S] in the update) —
    all other semantics identical, so the same SQL unroll oracles it.
    Seeds absent from the graph are ignored (they hold mass but no node
    row exists to report).  The seed set is query-scale and ships by
    task-closure capture, never per row.

    Dangling-node mass is dropped (not redistributed) — documented
    semantics shared with the oracle.  Size-adaptive (parity-tested):
    under ``max_driver_edges`` the edge list is collected once and the
    loop runs vectorized on the driver; above it each iteration is
    rank ⋈ outdeg ⋈ edges → groupby-sum → left join back onto the node
    set (all hash-partitioned, nothing corpus-scale on the driver).
    Rounds = ``iters`` (fixed), unlike BFS there is no depth hazard."""
    np_ = _nparts(num_partitions)
    base = (damp_den - damp_num) * scale // damp_den
    restart = frozenset(restart_nodes) if restart_nodes is not None else None

    def to_pairs(df: pd.DataFrame) -> pd.DataFrame:
        return pd.DataFrame(
            {"src": df["subj"].astype("string"), "dst": df["obj"].astype("string")}
        )

    pairs = edges.map_batches(to_pairs, batch_format="pandas")
    n_edges = pairs.count()

    if n_edges <= max_driver_edges:
        e = pd.concat(
            list(pairs.iter_batches(batch_format="pandas", batch_size=65536)),
            ignore_index=True,
        )
        nodes = pd.Index(pd.concat([e["src"], e["dst"]]).unique())
        od = e["src"].value_counts()
        if restart is None:
            base_vec = base
            pr = pd.Series(scale, index=nodes, dtype="int64")
        else:
            seed = nodes.isin(restart)
            base_vec = pd.Series(
                np.where(seed, base, 0), index=nodes, dtype="int64"
            )
            pr = pd.Series(
                np.where(seed, scale, 0), index=nodes, dtype="int64"
            )
        for _ in range(iters):
            contrib = (pr[e["src"]].to_numpy() // od[e["src"]].to_numpy()).astype(
                "int64"
            )
            s = (
                pd.DataFrame({"dst": e["dst"], "c": contrib})
                .groupby("dst")["c"]
                .sum()
                .reindex(nodes, fill_value=0)
            )
            pr = (base_vec + damp_num * s // damp_den).astype("int64")
        out = pd.DataFrame(
            {"node": pd.Series(nodes, dtype="string"), "pr": pr.to_numpy()}
        )
        return ray.data.from_pandas(out.sort_values("node", ignore_index=True))

    pairs = heal_schema(pairs, np_).materialize()

    def node_partial(df: pd.DataFrame) -> pd.DataFrame:
        u = pd.concat([df["src"], df["dst"]], ignore_index=True).drop_duplicates()
        return pd.DataFrame({"node": u.astype("string")})

    from ..functions.kernel import distinct

    nodes_ds = heal_schema(
        distinct(pairs.map_batches(node_partial, batch_format="pandas"), ["node"]),
        np_,
    ).materialize()

    def od_partial(df: pd.DataFrame) -> pd.DataFrame:
        c = df["src"].value_counts()
        return pd.DataFrame(
            {"node": pd.Series(c.index, dtype="string"),
             "d": c.to_numpy().astype("int64")}
        )

    from ..util import bucket_sum

    od_ds = heal_schema(
        bucket_sum(
            pairs.map_batches(od_partial, batch_format="pandas"),
            ["node"],
            ["d"],
            num_buckets=np_,
        ),
        np_,
    ).materialize()

    def init_pr(df: pd.DataFrame) -> pd.DataFrame:
        if restart is None:
            pr0 = pd.Series(scale, index=df.index, dtype="int64")
        else:
            pr0 = pd.Series(
                np.where(df["node"].isin(restart), scale, 0),
                index=df.index,
                dtype="int64",
            )
        return pd.DataFrame(
            {"node": df["node"].astype("string"), "pr": pr0}
        )

    ranks = nodes_ds.map_batches(init_pr, batch_format="pandas").materialize()

    for _ in range(iters):
        withod = heal_schema(ranks, np_).join(od_ds, "inner", np_, on=("node",))

        def contrib_frame(df: pd.DataFrame) -> pd.DataFrame:
            return pd.DataFrame(
                {"src": df["node"].astype("string"),
                 "c": (df["pr"] // df["d"]).astype("int64")}
            )

        contrib = heal_schema(
            withod.map_batches(contrib_frame, batch_format="pandas"), np_
        )
        incoming = _ren(
            bucket_sum(
                pairs.join(contrib, "inner", np_, on=("src",)).map_batches(
                    lambda df: df[["dst", "c"]].rename(columns={"dst": "node"}),
                    batch_format="pandas",
                ),
                ["node"],
                ["c"],
                num_buckets=np_,
            ),
            {"c": "s"},
        )
        joined = heal_schema(nodes_ds, np_).join(
            heal_schema(incoming, np_), "left_outer", np_, on=("node",)
        )

        def update(df: pd.DataFrame) -> pd.DataFrame:
            s = (
                df["s"].fillna(0).astype("int64")
                if "s" in df.columns
                else pd.Series(0, index=df.index, dtype="int64")
            )
            if restart is None:
                bv = base
            else:
                bv = pd.Series(
                    np.where(df["node"].isin(restart), base, 0),
                    index=df.index,
                    dtype="int64",
                )
            return pd.DataFrame(
                {"node": df["node"].astype("string"),
                 "pr": (bv + damp_num * s // damp_den).astype("int64")}
            )

        ranks = joined.map_batches(update, batch_format="pandas").materialize()

    return ranks


def components(
    edges: "ray.data.Dataset",
    *,
    max_iters: int = 15,
    num_partitions: int | None = None,
    max_driver_edges: int = 2_000_000,
) -> "ray.data.Dataset":
    """Connected components of the UNDIRECTED closure of a (subj, obj)
    edge Dataset: rows (node, label), label = the component's
    lexicographic minimum.  Self-loops are dropped, so nodes appearing
    ONLY in self-loops are absent (documented; the SQL oracle twin
    filters ``src <> dst`` identically).

    Size-adaptive like ``canonicalize.sameas_alias_table`` (whose CC
    engines this reuses): distinct undirected edges ≤
    ``max_driver_edges`` are union-found exactly on the driver; larger
    graphs run ``cc_labels`` (min-label propagation + pointer jumping,
    no driver edge list).  Both regimes are parity-tested."""
    import pyarrow as pa

    from .canonicalize import _union_find_labels, cc_labels

    und = _undirected(edges).materialize()
    if und.count() == 0:
        return ray.data.from_arrow(
            pa.schema([("node", pa.string()), ("label", pa.string())])
            .empty_table()
        )

    def sym(df: pd.DataFrame) -> pd.DataFrame:
        return pd.DataFrame(
            {
                "src": pd.concat([df["x"], df["y"]], ignore_index=True),
                "dst": pd.concat([df["y"], df["x"]], ignore_index=True),
            }
        ).astype("string")

    sym_edges = und.map_batches(sym, batch_format="pandas")
    if und.count() <= max_driver_edges:
        return _union_find_labels(sym_edges)
    return cc_labels(
        sym_edges, max_iters=max_iters, num_partitions=num_partitions
    )


def dag_depth(
    edges: "ray.data.Dataset",
    *,
    max_iters: int = 64,
    max_driver_edges: int = 2_000_000,
    num_partitions: int | None = None,
) -> "ray.data.Dataset":
    """Longest-path depth over a dependency DAG — the build-order /
    critical-path question: depth(v) = 0 for sinks, else
    1 + max(depth(w)) over v's out-edges (subj → obj).  Returns
    (node, depth) for every node appearing in ``edges``.  Iteration is
    the Bellman-Ford-style monotone fixpoint depth_{i+1}(v) =
    max over out-edges of depth_i(w) + 1, which converges in
    longest-path rounds; a graph that has NOT converged after
    ``max_iters`` rounds contains a cycle (or is deeper than the bound)
    and raises rather than returning wrong depths — this doubles as a
    cycle detector for import graphs.

    Size-adaptive (parity-tested): under ``max_driver_edges`` the
    distinct edge list is collected once and the fixpoint runs
    vectorized on the driver; above it each round is one hash join
    (depth ⋈ edges on obj) + one bucketed max (util.bucket_agg) +
    a fixpoint signature check — rounds scale with graph DEPTH, which
    is logarithmic for balanced dependency DAGs."""
    import numpy as np

    np_ = _nparts(num_partitions)

    def to_pairs(df: pd.DataFrame) -> pd.DataFrame:
        return pd.DataFrame(
            {"src": df["subj"].astype("string"), "dst": df["obj"].astype("string")}
        ).drop_duplicates(ignore_index=True)

    pairs = edges.map_batches(to_pairs, batch_format="pandas").materialize()
    n_edges = pairs.count()

    if n_edges == 0:
        import pyarrow as pa

        return ray.data.from_arrow(
            pa.schema([("node", pa.string()), ("depth", pa.int64())])
            .empty_table()
        )

    if n_edges <= max_driver_edges:
        e = pd.concat(
            list(pairs.iter_batches(batch_format="pandas", batch_size=65536)),
            ignore_index=True,
        ).drop_duplicates(ignore_index=True)
        nodes = pd.Index(pd.concat([e["src"], e["dst"]]).unique())
        depth = pd.Series(0, index=nodes, dtype="int64")
        for _ in range(max_iters):
            cand = (
                pd.DataFrame(
                    {"src": e["src"], "c": depth[e["dst"]].to_numpy() + 1}
                )
                .groupby("src")["c"]
                .max()
            )
            new = pd.Series(0, index=nodes, dtype="int64")
            new.loc[cand.index] = cand.astype("int64")
            if new.equals(depth):
                break
            depth = new
        else:
            raise RuntimeError(
                f"dag_depth did not converge in {max_iters} rounds: the "
                "graph contains a cycle or is deeper than the bound"
            )
        out = pd.DataFrame(
            {"node": pd.Series(nodes, dtype="string"), "depth": depth.to_numpy()}
        )
        return ray.data.from_pandas(out.sort_values("node", ignore_index=True))

    # distributed regime: per-round join + bucketed max
    from ..util import bucket_agg

    pairs = heal_schema(pairs, np_).materialize()

    def node_partial(df: pd.DataFrame) -> pd.DataFrame:
        u = pd.concat([df["src"], df["dst"]], ignore_index=True).drop_duplicates()
        return pd.DataFrame({"node": u.astype("string")})

    from ..functions.kernel import distinct

    nodes_ds = heal_schema(
        distinct(pairs.map_batches(node_partial, batch_format="pandas"), ["node"]),
        np_,
    ).materialize()

    def init_depth(df: pd.DataFrame) -> pd.DataFrame:
        return pd.DataFrame(
            {"node": df["node"].astype("string"),
             "depth": pd.Series(0, index=df.index, dtype="int64")}
        )

    depth_ds = nodes_ds.map_batches(init_depth, batch_format="pandas").materialize()

    from ..util import ds_signature

    def sig(ds) -> int:
        return ds_signature(ds, ["node", "depth"])

    cur = sig(depth_ds)
    for it in range(max_iters + 1):
        if it == max_iters:
            raise RuntimeError(
                f"dag_depth did not converge in {max_iters} rounds: the "
                "graph contains a cycle or is deeper than the bound"
            )
        joined = pairs.join(
            heal_schema(_ren(depth_ds, {"node": "dst"}), np_),
            "inner", np_, on=("dst",),
        )
        cand = joined.map_batches(
            lambda df: pd.DataFrame(
                {"node": df["src"].astype("string"),
                 "depth": (df["depth"] + 1).astype("int64")}
            ),
            batch_format="pandas",
        )

        def max_depth(df: pd.DataFrame) -> pd.DataFrame:
            return (
                df.sort_values(["node", "depth"], ascending=[True, False])
                .drop_duplicates("node")[["node", "depth"]]
            )

        depth_ds = bucket_agg(
            depth_ds.union(cand), ["node"], max_depth, num_buckets=np_
        ).materialize()
        new = sig(depth_ds)
        if new == cur:
            break
        cur = new
    return depth_ds


def two_hop_sizes(
    edges: "ray.data.Dataset", *, num_partitions: int | None = None
) -> "ray.data.Dataset":
    """Per-node 2-hop neighborhood size — the fan-out census a GNN
    sampling plan needs: rows (node, n_2hop) counting DISTINCT nodes
    reachable in 1 or 2 directed hops (self excluded, even via a
    cycle).  ONE mid-node hash join builds the 2-hop pairs, a bucketed
    exact distinct collapses multiplicity, a bucketed count sizes each
    neighborhood — nothing per-node ever reaches Ray's Aggregate or the
    driver."""
    from ..functions.kernel import distinct
    from ..util import bucket_count

    np_ = _nparts(num_partitions)

    def pairs(df: pd.DataFrame) -> pd.DataFrame:
        return pd.DataFrame(
            {"src": df["subj"].astype("string"), "dst": df["obj"].astype("string")}
        ).drop_duplicates(ignore_index=True)

    e = heal_schema(
        distinct(edges.map_batches(pairs, batch_format="pandas"), ["src", "dst"]),
        np_,
    ).materialize()

    # 2-hop pairs: (src → mid) ⋈ (mid → dst) on the mid node
    hop2 = (
        heal_schema(_ren(e, {"dst": "mid"}), np_)
        .join(
            heal_schema(_ren(e, {"src": "mid"}), np_),
            "inner", np_, on=("mid",),
        )
        .map_batches(
            lambda df: pd.DataFrame(
                {
                    "src": df["src"].astype("string"),
                    "dst": df["dst"].astype("string"),
                }
            ),
            batch_format="pandas",
        )
    )

    both = e.union(hop2).map_batches(
        lambda df: df[df["src"] != df["dst"]].reset_index(drop=True),
        batch_format="pandas",
    )
    return bucket_count(
        distinct(both, ["src", "dst"]).map_batches(
            lambda df: df.rename(columns={"src": "node"})[["node"]],
            batch_format="pandas",
        ),
        ["node"],
        out_col="n_2hop",
    )


def random_walks(
    edges: "ray.data.Dataset",
    *,
    length: int = 4,
    starts: list[str] | None = None,
    max_driver_edges: int = 2_000_000,
) -> "ray.data.Dataset":
    """Deterministic hash-pick random walks — the node2vec/DeepWalk-style
    corpus generator of graph-representation pipelines, made exactly
    reproducible (and SQL-replicable) by deriving each step from the
    md5_u64 of ``walk|step|candidate``: at step t the walk at node u
    moves to the out-neighbor v minimizing
    ``(md5_u64(f"{walk}|{t}|{v}"), v)``.  No RNG state, so retries,
    cluster sizes and the DuckDB oracle all agree bit-for-bit, and the
    pick is uniform-ish per step without biasing toward high-degree
    nodes the way degree-weighted sampling would.

    Rows: (walk, step, node) with step 0 at the start node; a walk ends
    early at a sink.  ``starts`` defaults to every node (src ∪ dst).

    Size-adaptive like :func:`bfs_distances` (parity-tested):

    * ≤ ``max_driver_edges``: adjacency collected once, steps run as
      vectorized frames on the driver.
    * larger: each step is ONE hash join (frontier ⋈ edges on the
      current node) plus one bucketed per-walk argmin — the frontier
      and the walk rows stay Datasets; the driver holds only the step
      counter.  Cost is ``length`` × (join + bucketed groupby), the
      same round shape as the distributed BFS.
    """
    def _pick(cand: pd.DataFrame, step: int) -> pd.DataFrame:
        """argmin over (md5_u64(walk|step|dst), dst) per walk.  Hashes are
        computed HERE (never shipped): uint64 survives intact and no
        int64 reinterpretation can flip the ordering.

        Bulk form of the md5 contract (same bits as ``_md5_u64`` row by
        row): the per-row f-string/encode/int.from_bytes overhead is
        replaced by one vectorized concat, one joined digest buffer read
        as ``<u8``, and an integer lexsort over factorized codes — ~1.8×
        the fromiter/sort_values version on a 200 K-candidate step."""
        import hashlib

        import numpy as np

        if not len(cand):
            return pd.DataFrame(
                {
                    "walk": pd.Series(dtype="string"),
                    "node": pd.Series(dtype="string"),
                }
            )
        md5 = hashlib.md5
        joined = (
            cand["walk"].astype("string")
            + f"|{step}|"
            + cand["dst"].astype("string")
        ).to_numpy()
        digs = b"".join([md5(s.encode("utf-8")).digest() for s in joined])
        # digest bytes 8..16 little-endian == _md5_u64 == md5_number_lower
        h = np.frombuffer(digs, "<u8")[1::2]
        wcodes, wuniq = pd.factorize(cand["walk"])
        dcodes, duniq = pd.factorize(cand["dst"], sort=True)  # lexicographic
        order = np.lexsort((dcodes, h, wcodes))
        ws = wcodes[order]
        first = np.ones(len(ws), dtype=bool)
        first[1:] = ws[1:] != ws[:-1]
        pick = order[first]
        return pd.DataFrame(
            {
                "walk": pd.array(
                    np.asarray(wuniq)[wcodes[pick]], dtype="string"
                ),
                "node": pd.array(
                    np.asarray(duniq)[dcodes[pick]], dtype="string"
                ),
            }
        )

    n_edges = edges.count()
    if n_edges <= max_driver_edges:
        e = pd.concat(
            list(
                edges.map_batches(
                    lambda d: d[["subj", "obj"]].rename(
                        columns={"subj": "src", "obj": "dst"}
                    ),
                    batch_format="pandas",
                ).iter_batches(batch_format="pandas", batch_size=None)
            ),
            ignore_index=True,
        ).drop_duplicates()
        if starts is None:
            starts = sorted(set(e["src"]) | set(e["dst"]))
        rows = [
            pd.DataFrame(
                {
                    "walk": pd.Series(starts, dtype="string"),
                    "step": pd.Series([0] * len(starts), dtype="int64"),
                    "node": pd.Series(starts, dtype="string"),
                }
            )
        ]
        frontier = pd.DataFrame({"walk": starts, "cur": starts})
        for t in range(1, length + 1):
            cand = frontier.merge(
                e, left_on="cur", right_on="src", how="inner"
            )[["walk", "dst"]]
            nxt = _pick(cand, t)
            if not len(nxt):
                break
            rows.append(nxt.assign(step=t)[["walk", "step", "node"]])
            frontier = nxt.rename(columns={"node": "cur"})
        out = pd.concat(rows, ignore_index=True)
        out["step"] = out["step"].astype("int64")
        return ray.data.from_pandas(
            out.sort_values(["walk", "step"], ignore_index=True)
        )

    from ..util import bucket_agg

    np_ = _nparts(None)
    mat = (
        edges.map_batches(
            lambda d: d[["subj", "obj"]].rename(
                columns={"subj": "src", "obj": "dst"}
            ),
            batch_format="pandas",
        )
        .materialize()
    )
    if starts is None:
        su = mat.map_batches(
            lambda df: pd.DataFrame(
                {
                    "walk": pd.concat(
                        [df["src"], df["dst"]], ignore_index=True
                    ).astype("string")
                }
            ).drop_duplicates(),
            batch_format="pandas",
        )
        from ..functions.kernel import distinct

        start_ds = distinct(su, ["walk"]).materialize()
    else:
        start_ds = ray.data.from_pandas(
            pd.DataFrame({"walk": pd.Series(starts, dtype="string")})
        ).materialize()

    result = start_ds.map_batches(
        lambda df: pd.DataFrame(
            {
                "walk": df["walk"].astype("string"),
                "step": pd.Series(0, index=df.index, dtype="int64"),
                "node": df["walk"].astype("string"),
            }
        ),
        batch_format="pandas",
    )
    frontier = _ren(start_ds, {"walk": "w"}).map_batches(
        lambda df: pd.DataFrame(
            {
                "walk": df["w"].astype("string"),
                "src": df["w"].astype("string"),
            }
        ),
        batch_format="pandas",
    )
    for t in range(1, length + 1):
        cand = heal_schema(frontier, np_).join(
            heal_schema(mat, np_), "inner", np_, on=("src",)
        )
        nxt = bucket_agg(
            cand.map_batches(
                lambda df: df[["walk", "dst"]], batch_format="pandas"
            ),
            ["walk"],
            lambda df, _t=t: _pick(df, _t),
        ).materialize()
        if nxt.count() == 0:
            break
        result = result.union(
            nxt.map_batches(
                lambda df, _t=t: pd.DataFrame(
                    {
                        "walk": df["walk"].astype("string"),
                        "step": pd.Series(_t, index=df.index, dtype="int64"),
                        "node": df["node"].astype("string"),
                    }
                ),
                batch_format="pandas",
            )
        )
        frontier = _ren(nxt, {"node": "src"})
    return result


def triple_ids(
    edges: "ray.data.Dataset", *, num_partitions: int | None = None
) -> "ray.data.Dataset":
    """KG-embedding input encoding: dictionary-encode the edge list into
    dense integer triples (h, r, t) — the (head, relation, tail) id
    format TransE-style trainers consume.  Entity ids are the 0-based
    dense rank of the node IRI in lexicographic order (deterministic
    across runs and cluster sizes); relation ids likewise over the
    predicate vocabulary.

    Scale: the entity dictionary is built with ONE distributed sort
    (packing.global_rank — per-block offset summaries, no driver
    materialization of the vocabulary) and applied with two hash joins
    (head side, tail side).  The relation vocabulary is predicate-scale
    (tiny) and broadcasts as a driver dict."""
    from ..functions.kernel import distinct
    from ..util import heal_schema
    from .packing import global_rank

    np_ = _nparts(num_partitions)

    def node_partial(df: pd.DataFrame) -> pd.DataFrame:
        u = pd.concat([df["subj"], df["obj"]], ignore_index=True).drop_duplicates()
        return pd.DataFrame({"node": u.astype("string")})

    nodes = distinct(
        edges.map_batches(node_partial, batch_format="pandas"), ["node"]
    )
    nid = global_rank(nodes, keys=["node"], out_col="nid")

    # relation vocabulary: predicate-scale, one small distinct → driver
    preds = sorted(
        distinct(
            edges.map_batches(
                lambda df: pd.DataFrame({"pred": df["pred"].astype("string")})
                .drop_duplicates(),
                batch_format="pandas",
            ),
            ["pred"],
        )
        .to_pandas()["pred"]
        .astype(str)
    )
    rid = {p: i for i, p in enumerate(preds)}

    def with_rid(df: pd.DataFrame) -> pd.DataFrame:
        return pd.DataFrame(
            {
                "subj": df["subj"].astype("string"),
                "r": df["pred"].map(rid).astype("int64"),
                "obj": df["obj"].astype("string"),
            }
        )

    enc = edges.map_batches(with_rid, batch_format="pandas")
    enc = heal_schema(enc, np_).join(
        heal_schema(_ren(nid, {"node": "subj", "nid": "h"}), np_),
        "inner",
        np_,
        on=("subj",),
    )
    enc = heal_schema(enc, np_).join(
        heal_schema(_ren(nid, {"node": "obj", "nid": "t"}), np_),
        "inner",
        np_,
        on=("obj",),
    )

    def finish(df: pd.DataFrame) -> pd.DataFrame:
        # global_rank is 1-based; KGE convention is 0-based dense ids
        return pd.DataFrame(
            {
                "h": (df["h"] - 1).astype("int64"),
                "r": df["r"].astype("int64"),
                "t": (df["t"] - 1).astype("int64"),
            }
        )

    return enc.map_batches(finish, batch_format="pandas")


def link_scores(
    edges: "ray.data.Dataset",
    *,
    max_mid_degree: int = 128,
    topk: int = 5,
    num_partitions: int | None = None,
    mid_weight: str = "one",
    weight_scale: int = 1_000_000,
    jaccard: bool = False,
) -> "ray.data.Dataset":
    """Common-neighbor link-prediction scores: for every non-adjacent
    unordered node pair (u, w) of the UNDIRECTED graph,
    score = Σ over common neighbors m of weight(m), reported
    top-``topk`` per ``node_u`` (ties broken by node_w asc — fully
    deterministic).  ``mid_weight``:

    * ``"one"`` — score = |N(u) ∩ N(w)| (plain common neighbors);
    * ``"inv_deg"`` — score = Σ (weight_scale // deg(m)), the
      resource-allocation index in INTEGER floor arithmetic (the float
      1/deg damping of RA / Adamic-Adar is order-dependent under IEEE
      summation and thus not bit-reproducible; integer-scaled floor
      weights are exact on both engine and SQL sides);
    * ``"inv_log2"`` — score = Σ (weight_scale // max(1, ⌊log2 deg(m)⌋)),
      the Adamic-Adar analogue with exact integer log damping:
      ⌊log2 d⌋ comes from the frexp exponent (exact for integers, the
      kg_degree_hist idiom), mirrored in SQL as
      ``length(format('{:b}', d)) - 1``.

    ``jaccard=True`` (with ``mid_weight="one"``) rescales the common
    count to the neighbor-set Jaccard similarity in integer
    parts-per-million: score = (common × weight_scale) //
    (deg(u) + deg(w) − common), via two degree hash joins after the
    wedge aggregation — floor division keeps both engine and SQL sides
    bit-identical where IEEE division would not round-trip.  Degrees
    are the FULL undirected degrees; only the wedge mids are
    hub-capped, so the similarity is exact for pairs whose common
    neighbors all sit under the cap (the documented hub cut).

    Scale shape: candidate pairs are generated as wedges through each
    common neighbor m — Σ deg(m)² blowup — so mids with degree >
    ``max_mid_degree`` are EXCLUDED up front (the standard hub cut:
    stopword-like hubs carry no link signal, and the cap bounds wedge
    fan-out at cap² per mid).  Everything else is hash joins + bucketed
    counts: adjacency dedup, degree filter join, one self-join on the
    mid, an anti-join against existing edges, and a per-node bucketed
    top-k — no node-scale driver state, no Ray per-key Aggregate."""
    from ..functions.kernel import distinct
    from ..util import bucket_agg, bucket_count, heal_schema

    np_ = _nparts(num_partitions)
    und = _undirected(edges).materialize()  # distinct (x, y), x < y

    def both_dirs(df: pd.DataFrame) -> pd.DataFrame:
        return pd.DataFrame(
            {
                "node": pd.concat([df["x"], df["y"]], ignore_index=True),
                "nbr": pd.concat([df["y"], df["x"]], ignore_index=True),
            }
        ).astype("string")

    adj = und.map_batches(both_dirs, batch_format="pandas").materialize()
    # consumed by up to three joins (mid filter + jaccard u/w degrees) —
    # materialize once so the adjacency count never re-executes
    deg = bucket_count(adj, ["node"], out_col="_d").materialize()

    weighted = mid_weight in ("inv_deg", "inv_log2")
    if mid_weight not in ("one", "inv_deg", "inv_log2"):
        raise ValueError(f"unknown mid_weight {mid_weight!r}")
    if jaccard and weighted:
        raise ValueError("jaccard rescaling requires mid_weight='one'")

    def mid_ok(df: pd.DataFrame, cap=max_mid_degree) -> pd.DataFrame:
        keep = df.loc[df["_d"] <= cap]
        out = keep[["node", "mid"]].reset_index(drop=True).astype(
            {"node": "string", "mid": "string"}
        )
        if weighted:
            d = keep["_d"].to_numpy(dtype=np.int64)
            if mid_weight == "inv_log2":
                # frexp exponent − 1 = ⌊log2 d⌋ exactly for integers
                d = np.maximum(1, np.frexp(d)[1].astype(np.int64) - 1)
            out["_w"] = (weight_scale // d).astype("int64")
        return out

    # adjacency restricted to low-degree mids: adj ⋈ deg on the nbr side
    a2 = (
        heal_schema(_ren(adj, {"nbr": "mid"}), np_)
        .join(
            heal_schema(_ren(deg, {"node": "mid"}), np_),
            "inner", np_, on=("mid",),
        )
        .map_batches(mid_ok, batch_format="pandas")
        .materialize()
    )

    def ordered(df: pd.DataFrame) -> pd.DataFrame:
        keep = df.loc[df["u"] < df["w"]]
        out = keep[["u", "w"]].reset_index(drop=True).astype("string")
        if weighted:
            out["_w"] = keep["_w"].to_numpy(dtype=np.int64)
        return out

    def drop_w(df: pd.DataFrame) -> pd.DataFrame:
        return df.drop(columns=["_w"]) if "_w" in df.columns else df

    wedges = (
        heal_schema(_ren(a2, {"node": "u"}), np_)
        .join(
            heal_schema(
                _ren(a2, {"node": "w"}).map_batches(
                    drop_w, batch_format="pandas"
                ),
                np_,
            ),
            "inner", np_, on=("mid",),
        )
        .map_batches(ordered, batch_format="pandas")
    )
    # materialized: the anti-join consumes it next, and a fully-empty
    # pair set (every mid over the cap, or wedges all self/ordered-out)
    # is SCHEMA-LESS — it must short-circuit before reaching the join
    # (empty-block stickiness); post-aggregation this is output-scale
    if weighted:
        from ..util import bucket_sum

        scored = bucket_sum(wedges, ["u", "w"], ["_w"]).map_batches(
            lambda df: df.rename(columns={"_w": "score"}),
            batch_format="pandas",
        ).materialize()
    else:
        scored = bucket_count(wedges, ["u", "w"], out_col="score").materialize()
    if jaccard and scored.count() > 0:
        # common → jaccard ppm: two degree joins (full degrees, not the
        # capped mid set), materialized between (chained aggregator
        # pools starve each other otherwise), then vectorized floor math
        def jac(df: pd.DataFrame, scale=weight_scale) -> pd.DataFrame:
            c = df["score"].to_numpy(dtype=np.int64)
            du = df["_du"].to_numpy(dtype=np.int64)
            dw = df["_dw"].to_numpy(dtype=np.int64)
            out = df[["u", "w"]].reset_index(drop=True).astype("string")
            out["score"] = (c * scale) // (du + dw - c)
            return out

        scored = (
            heal_schema(scored, np_)
            .join(
                heal_schema(_ren(deg, {"node": "u", "_d": "_du"}), np_),
                "inner", np_, on=("u",),
            )
            .materialize()
        )
        scored = (
            heal_schema(scored, np_)
            .join(
                heal_schema(_ren(deg, {"node": "w", "_d": "_dw"}), np_),
                "inner", np_, on=("w",),
            )
            .map_batches(jac, batch_format="pandas")
            .materialize()
        )
    if scored.count() == 0:
        import pyarrow as pa

        return ray.data.from_arrow(
            pa.schema(
                [("node_u", pa.string()), ("node_w", pa.string()),
                 ("score", pa.int64())]
            ).empty_table()
        )

    def not_edge(df: pd.DataFrame) -> pd.DataFrame:
        if len(df) and "_e" in df.columns:
            df = df[df["_e"].isna()]
        out = df[["u", "w", "score"]].reset_index(drop=True)
        return out.astype({"u": "string", "w": "string", "score": "int64"})

    def mark(df: pd.DataFrame) -> pd.DataFrame:
        out = df.rename(columns={"x": "u", "y": "w"})
        out["_e"] = pd.Series([1] * len(out), dtype="int64", index=out.index)
        return out

    new_pairs = (
        heal_schema(scored, np_)
        .join(
            heal_schema(
                und.map_batches(mark, batch_format="pandas"), np_
            ),
            "left_outer", np_, on=("u", "w"),
        )
        .map_batches(not_edge, batch_format="pandas")
    )

    def top(df: pd.DataFrame, k=topk) -> pd.DataFrame:
        out = (
            df.sort_values(["u", "score", "w"], ascending=[True, False, True])
            .groupby("u", sort=False)
            .head(k)
            .reset_index(drop=True)
        )
        return out.rename(columns={"u": "node_u", "w": "node_w"})

    return bucket_agg(new_pairs, ["u"], top)


def four_cycle_counts(
    edges: "ray.data.Dataset",
    *,
    max_mid_degree: int = 128,
    num_partitions: int | None = None,
) -> "ray.data.Dataset":
    """Per-node 4-cycle (quadrilateral) participation counts over the
    UNDIRECTED graph — the square-motif analogue of triangle counting.

    Combinatorics: an unordered pair (u, w) with c common neighbors is
    the diagonal of C(c, 2) distinct 4-cycles u–mᵢ–w–mⱼ; every 4-cycle
    has exactly two diagonals and each node sits on exactly one of
    them, so n_c4(v) = Σ over pairs containing v of C(c, 2) counts each
    cycle through v exactly once.  Chorded squares count (standard C4
    semantics).  Common neighbors are generated as wedges through mids
    with degree ≤ ``max_mid_degree`` (the same hub cut as link_scores:
    bounds wedge fan-out at cap² per mid; cycles whose BOTH opposite
    corners are hubs are dropped on both engine and SQL sides, so the
    capped count stays bit-exact).  Plan: adjacency dedup → degree
    filter join → one mid self-join → bucketed pair counts → vectorized
    C(c,2) → two-sided node explode → bucketed node sums."""
    from ..util import bucket_count, bucket_sum, heal_schema

    np_ = _nparts(num_partitions)
    und = _undirected(edges).materialize()

    def both_dirs(df: pd.DataFrame) -> pd.DataFrame:
        return pd.DataFrame(
            {
                "node": pd.concat([df["x"], df["y"]], ignore_index=True),
                "nbr": pd.concat([df["y"], df["x"]], ignore_index=True),
            }
        ).astype("string")

    adj = und.map_batches(both_dirs, batch_format="pandas").materialize()
    deg = bucket_count(adj, ["node"], out_col="_d")

    def mid_ok(df: pd.DataFrame, cap=max_mid_degree) -> pd.DataFrame:
        keep = df.loc[df["_d"] <= cap]
        return keep[["node", "mid"]].reset_index(drop=True).astype("string")

    a2 = (
        heal_schema(_ren(adj, {"nbr": "mid"}), np_)
        .join(
            heal_schema(_ren(deg, {"node": "mid"}), np_),
            "inner", np_, on=("mid",),
        )
        .map_batches(mid_ok, batch_format="pandas")
        .materialize()
    )

    def ordered(df: pd.DataFrame) -> pd.DataFrame:
        keep = df.loc[df["u"] < df["w"]]
        return keep[["u", "w"]].reset_index(drop=True).astype("string")

    wedges = (
        heal_schema(_ren(a2, {"node": "u"}), np_)
        .join(
            heal_schema(_ren(a2, {"node": "w"}), np_),
            "inner", np_, on=("mid",),
        )
        .map_batches(ordered, batch_format="pandas")
    )
    pairs = bucket_count(wedges, ["u", "w"], out_col="_c").materialize()

    def explode(df: pd.DataFrame) -> pd.DataFrame:
        keep = df.loc[df["_c"] >= 2]
        c = keep["_c"].to_numpy(dtype=np.int64)
        q = c * (c - 1) // 2
        return pd.DataFrame(
            {
                "node": pd.concat(
                    [keep["u"], keep["w"]], ignore_index=True
                ).astype("string"),
                "n_c4": np.concatenate([q, q]),
            }
        )

    # a square-free graph legally yields 0 rows after the c >= 2 filter,
    # and 0-row pandas outputs are schema-less — short-circuit to a
    # TYPED empty (post-aggregation, so the count is output-scale)
    per_side = pairs.map_batches(explode, batch_format="pandas").materialize()
    if per_side.count() == 0:
        import pyarrow as pa

        return ray.data.from_arrow(
            pa.schema(
                [("node", pa.string()), ("n_c4", pa.int64())]
            ).empty_table()
        )
    return bucket_sum(per_side, ["node"], ["n_c4"])


def bgp_match(
    triples: "ray.data.Dataset",
    patterns: list[tuple[str, str, str]],
    *,
    num_partitions: int | None = None,
) -> "ray.data.Dataset":
    """Conjunctive basic-graph-pattern matcher — the join core of a
    SPARQL engine (SPARQL 1.1 §18.5 BGP evaluation over the default
    union graph; the spec backend in pipelines/sparql_validate.py hand
    compiles its ICs, this is the GENERIC path).  ``patterns`` are
    (s, p, o) strings where a leading ``?`` marks a variable; constants
    must be IRIs (matched against ``subj``/``pred``/IRI-``obj``).

    Plan: each pattern becomes a pred/const-filtered DISTINCT projection
    of the triple stream (set semantics per scan — the corpus is a graph
    MERGE, so identical triples from different files are one logical
    triple); patterns then fold left-deep through hash joins on their
    shared variables.  A pattern sharing NO variable with the prefix is
    a cartesian product and raises (guard against accidental cross
    joins at corpus scale).  Returns one row per solution, columns =
    variable names (without ``?``) in first-appearance order."""
    from ..functions.kernel import distinct
    from ..util import heal_schema

    np_ = _nparts(num_partitions)
    if not patterns:
        raise ValueError("bgp_match needs at least one pattern")

    def scan(pat) -> tuple["ray.data.Dataset", list[str]]:
        s, p, o = pat
        sv = s.startswith("?")
        pv = p.startswith("?")
        ov = o.startswith("?")

        def f(df: pd.DataFrame) -> pd.DataFrame:
            m = pd.Series(True, index=df.index)
            if not sv:
                m &= df["subj"] == s
            if not pv:
                m &= df["pred"] == p
            if not ov:
                m &= (df["obj"] == o) & (df["obj_kind"] == 0)
            sub = df[m]
            cols = {}
            if sv:
                cols[s[1:]] = sub["subj"].astype("string")
            if pv:
                cols[p[1:]] = sub["pred"].astype("string")
            if ov and o[1:] not in cols:
                cols[o[1:]] = sub["obj"].astype("string")
            elif ov:  # repeated variable (?x p ?x): enforce equality
                keep = sub["subj"] == sub["obj"]
                return pd.DataFrame(
                    {s[1:]: sub.loc[keep, "subj"].astype("string")}
                )
            if not cols:  # fully-ground pattern: existence check row
                return pd.DataFrame({"_hit": pd.Series([1] * len(sub), dtype="int64")})
            return pd.DataFrame(cols).reset_index(drop=True)

        out = triples.map_batches(f, batch_format="pandas")
        vs = [v[1:] for v, flag in ((s, sv), (p, pv), (o, ov)) if flag]
        vs = list(dict.fromkeys(vs))
        return (distinct(out, vs) if vs else out.limit(1)), vs

    acc, bound = scan(patterns[0])
    # copy: scan's vs list is captured by distinct's LAZY closure — an
    # in-place `bound += ...` would retroactively change that scan's
    # column selection before it executes
    bound = list(bound)
    for pat in patterns[1:]:
        nxt, vs = scan(pat)
        shared = [v for v in vs if v in bound]
        if not shared:
            raise ValueError(
                f"pattern {pat} shares no variable with the prefix — "
                "cartesian products are rejected at corpus scale"
            )
        acc = heal_schema(acc, np_).join(
            heal_schema(nxt, np_), "inner", np_, on=tuple(shared)
        )
        bound += [v for v in vs if v not in bound]

    def order_cols(df: pd.DataFrame, cols=tuple(bound)) -> pd.DataFrame:
        return df[list(cols)].astype("string")

    return acc.map_batches(order_cols, batch_format="pandas")


def _bgp_vars(patterns: list[tuple[str, str, str]]) -> list[str]:
    out: list[str] = []
    for s, p, o in patterns:
        for t in (s, p, o):
            if t.startswith("?") and t[1:] not in out:
                out.append(t[1:])
    return out


def bgp_match_optional(
    triples: "ray.data.Dataset",
    patterns: list[tuple[str, str, str]],
    optional: list[tuple[str, str, str]],
    *,
    num_partitions: int | None = None,
) -> "ray.data.Dataset":
    """SPARQL OPTIONAL (SPARQL 1.1 §18.5 LeftJoin): the required BGP's
    solutions left-joined with the optional BGP's solutions on their
    shared variables — rows with no optional match keep the required
    bindings and surface the optional-only variables as "" (the
    hash-stable rendering of SPARQL's unbound).  Both sides evaluate
    through :func:`bgp_match` (distinct scans, left-deep hash joins);
    the LeftJoin itself is ONE more hash join."""
    from ..util import heal_schema, join_partitions

    rv = _bgp_vars(patterns)
    ov = _bgp_vars(optional)
    shared = [v for v in ov if v in rv]
    if not shared:
        raise ValueError(
            "optional clause shares no variable with the required BGP "
            "(would be a cartesian product)"
        )
    new = [v for v in ov if v not in rv]
    req = bgp_match(
        triples, patterns, num_partitions=num_partitions
    ).materialize()
    opt = bgp_match(
        triples, optional, num_partitions=num_partitions
    ).materialize()
    cols = rv + new

    def fill(df: pd.DataFrame) -> pd.DataFrame:
        if not len(df):
            return pd.DataFrame(
                {c: pd.Series(dtype="string") for c in cols}
            )
        out = pd.DataFrame(index=df.index)
        for c in cols:
            out[c] = (
                df[c].fillna("") if c in df.columns else ""
            )
        return out.astype({c: "string" for c in cols})

    # a fully-empty side is schema-less in Ray 2.49 (heal_schema cannot
    # conjure a schema — util.py contract), and "optional never
    # matches" is the NORMAL LeftJoin case: short-circuit both empties
    # instead of letting the hash join see a schema-less operand
    if req.count() == 0:
        return ray.data.from_pandas(
            pd.DataFrame({c: pd.Series(dtype="string") for c in cols})
        )
    if opt.count() == 0:
        return req.map_batches(fill, batch_format="pandas")
    jp = join_partitions(num_partitions)
    joined = heal_schema(req, jp).join(
        heal_schema(opt, jp), "left_outer", jp, on=tuple(shared)
    )
    return joined.map_batches(fill, batch_format="pandas")


def bgp_match_union(
    triples: "ray.data.Dataset",
    branches: list[list[tuple[str, str, str]]],
    *,
    num_partitions: int | None = None,
) -> "ray.data.Dataset":
    """SPARQL UNION (SPARQL 1.1 §18.5 Union): each branch BGP evaluates
    independently through :func:`bgp_match`, solutions concatenate, and
    variables absent from a branch surface as "" (the engine's
    hash-stable unbound rendering, as in OPTIONAL).  Output columns are
    the union of the branches' variable lists in first-appearance order;
    the result is DISTINCT across branches — this engine is
    set-semantics throughout (every scan is distinct), so two branches
    producing the same solution yield one row, exactly what a SQL UNION
    twin computes.  The union itself is metadata-only in Ray
    (``Dataset.union`` concatenates block lists — no shuffle); only the
    final distinct exchanges rows."""
    from ..functions.kernel import distinct

    if not branches or any(not b for b in branches):
        raise ValueError("bgp_match_union needs non-empty branches")
    cols: list[str] = []
    for b in branches:
        for v in _bgp_vars(b):
            if v not in cols:
                cols.append(v)

    def pad(df: pd.DataFrame) -> pd.DataFrame:
        out = pd.DataFrame(index=df.index)
        for c in cols:
            out[c] = df[c] if c in df.columns else ""
        return out.astype({c: "string" for c in cols})

    parts = [
        bgp_match(triples, b, num_partitions=num_partitions).map_batches(
            pad, batch_format="pandas"
        )
        for b in branches
    ]
    acc = parts[0]
    for p in parts[1:]:
        acc = acc.union(p)
    return distinct(acc, cols)


# FILTER operators: each is a vectorized pandas kernel (value columns are
# string dtype — comparisons are LEXICAL, matching the engine's term
# rendering; numeric filters belong upstream where values are typed)
_BGP_FILTER_OPS = {
    "==": lambda col, rhs: col == rhs,
    "!=": lambda col, rhs: col != rhs,
    "<": lambda col, rhs: col < rhs,
    "<=": lambda col, rhs: col <= rhs,
    ">": lambda col, rhs: col > rhs,
    ">=": lambda col, rhs: col >= rhs,
    "regex": lambda col, rhs: col.str.contains(rhs, regex=True, na=False),
    "strstarts": lambda col, rhs: col.str.startswith(rhs).fillna(False),
}


def bgp_match_filter(
    triples: "ray.data.Dataset",
    patterns: list[tuple[str, str, str]],
    filters: list[tuple[str, str, str]],
    *,
    num_partitions: int | None = None,
) -> "ray.data.Dataset":
    """SPARQL FILTER over a BGP (SPARQL 1.1 §18.5 Filter): the BGP's
    solution stream restricted by a conjunction of vectorized predicates.
    Each filter is ``(lhs, op, rhs)`` with ``lhs`` a ``?var``; ``op`` one
    of ``== != < <= > >= regex strstarts`` (string/lexical semantics —
    every solution column is a rendered term); ``rhs`` a constant, or a
    second ``?var`` for the comparison ops (``regex``/``strstarts`` take
    constants only).  Filters apply inside ONE ``map_batches`` over the
    already-joined solutions — streaming and allocation-free per batch;
    constant subject/pred/object restrictions should stay in the
    patterns themselves, where the scan prunes before the join."""
    vs = _bgp_vars(patterns)
    for lhs, op, rhs in filters:
        if not lhs.startswith("?") or lhs[1:] not in vs:
            raise ValueError(f"filter lhs {lhs!r} is not a bound variable")
        if op not in _BGP_FILTER_OPS:
            raise ValueError(f"unknown filter op {op!r}")
        if rhs.startswith("?"):
            if op in ("regex", "strstarts"):
                raise ValueError(f"{op} takes a constant pattern, got {rhs!r}")
            if rhs[1:] not in vs:
                raise ValueError(f"filter rhs {rhs!r} is not a bound variable")

    sol = bgp_match(triples, patterns, num_partitions=num_partitions)

    def apply(df: pd.DataFrame) -> pd.DataFrame:
        m = pd.Series(True, index=df.index)
        for lhs, op, rhs in filters:
            col = df[lhs[1:]]
            target = df[rhs[1:]] if rhs.startswith("?") else rhs
            m &= _BGP_FILTER_OPS[op](col, target).fillna(False)
        return df[m]

    return sol.map_batches(apply, batch_format="pandas")


def kcore(
    edges: "ray.data.Dataset",
    *,
    k: int = 3,
    max_rounds: int = 16,
    max_driver_edges: int = 2_000_000,
    num_partitions: int | None = None,
) -> "ray.data.Dataset":
    """The k-core of the UNDIRECTED closure of a (subj, obj) edge
    Dataset — iterative peel: repeatedly drop nodes whose (undirected,
    deduplicated, self-loop-free) degree is below ``k`` until a pass
    removes nothing.  Returns (node, deg) with deg = the node's degree
    INSIDE the core.  The classic density filter a KG-construction
    pipeline runs before community detection / embedding training.

    Rounds are BOUNDED: a graph still peeling after ``max_rounds``
    passes raises (the SQL oracle twin unrolls exactly ``max_rounds``
    peels, so convergence inside the bound is part of the correctness
    contract — a silent early stop would return a superset of the
    core).  Peel rounds needed equal the core-number spread, which is
    tiny for real degree distributions (power-law graphs converge in a
    handful of passes).

    Size-adaptive like :func:`components` (both regimes parity-tested):
    at or under ``max_driver_edges`` distinct undirected edges the peel
    runs vectorized on the driver (np.bincount per pass over int-coded
    endpoints); above it each pass is one degree count
    (util.bucket_count over the symmetric edge list) + two hash
    semi-joins keeping edges whose BOTH endpoints survive, with a
    count-based fixpoint test — per-pass cost is edge-linear, no
    node-scale driver state."""
    import pyarrow as pa

    from ..util import heal_schema, join_partitions

    empty = pa.schema(
        [("node", pa.string()), ("deg", pa.int64())]
    ).empty_table()
    und = _undirected(edges).materialize()
    m = und.count()
    if m == 0:
        return ray.data.from_arrow(empty)

    if m <= max_driver_edges:
        df = und.to_pandas()
        codes, nodes = pd.factorize(
            pd.concat([df["x"], df["y"]], ignore_index=True)
        )
        ex = codes[: len(df)].copy()
        ey = codes[len(df):].copy()
        n = len(nodes)
        for _ in range(max_rounds):
            deg = np.bincount(ex, minlength=n) + np.bincount(ey, minlength=n)
            ok = deg >= k
            keep = ok[ex] & ok[ey]
            if keep.all():
                out = pd.DataFrame(
                    {"node": pd.array(nodes[deg >= k], dtype="string"),
                     "deg": deg[deg >= k].astype("int64")}
                )
                return ray.data.from_pandas(out) if len(out) else (
                    ray.data.from_arrow(empty)
                )
            ex, ey = ex[keep], ey[keep]
            if not len(ex):
                return ray.data.from_arrow(empty)
        raise RuntimeError(
            f"kcore: still peeling after {max_rounds} rounds — raise "
            "max_rounds (and regenerate the oracle) for this graph"
        )

    from ..util import bucket_count

    np_ = join_partitions(num_partitions)

    def sym(df: pd.DataFrame) -> pd.DataFrame:
        return pd.DataFrame(
            {
                "node": pd.concat([df["x"], df["y"]], ignore_index=True),
            }
        ).astype("string")

    cur = und
    prev_m = m
    for _ in range(max_rounds):
        deg = bucket_count(
            cur.map_batches(sym, batch_format="pandas"), ["node"],
            out_col="deg",
        )
        core = deg.filter(expr=f"deg >= {k}").materialize()
        kept = heal_schema(
            cur.join(
                core.map_batches(
                    lambda df: df[["node"]].rename(columns={"node": "x"}),
                    batch_format="pandas",
                ),
                "inner",
                np_,
                on=("x",),
            ),
            np_,
        )
        kept = heal_schema(
            kept.join(
                core.map_batches(
                    lambda df: df[["node"]].rename(columns={"node": "y"}),
                    batch_format="pandas",
                ),
                "inner",
                np_,
                on=("y",),
            ),
            np_,
        ).map_batches(
            lambda df: df[["x", "y"]] if len(df) else df,
            batch_format="pandas",
        ).materialize()
        cur_m = kept.count()
        if cur_m == prev_m:
            return core.map_batches(
                lambda df: df[["node", "deg"]].astype(
                    {"node": "string", "deg": "int64"}
                ),
                batch_format="pandas",
            )
        if cur_m == 0:
            return ray.data.from_arrow(empty)
        cur, prev_m = kept, cur_m
    raise RuntimeError(
        f"kcore: still peeling after {max_rounds} rounds — raise "
        "max_rounds (and regenerate the oracle) for this graph"
    )


def lp_communities(
    edges: "ray.data.Dataset",
    *,
    rounds: int = 3,
    max_driver_edges: int = 2_000_000,
    num_buckets: int = 64,
) -> "ray.data.Dataset":
    """Deterministic synchronous label propagation (community detection)
    over the UNDIRECTED closure: every node starts labelled as itself;
    each round every node adopts the MODE of its neighbours' previous
    labels, ties broken by the lexicographically smallest label — fully
    deterministic, so a fixed ``rounds`` unrolls to an exact SQL twin
    (float-free, unlike modularity methods).  Returns (node, label).

    Size-adaptive (parity-tested): under ``max_driver_edges`` the round
    loop runs vectorized on the driver (factorized codes + one bincount
    per round); above it each round is ONE bucketed count over the
    message table (labels gathered per edge inside the bucket via a
    pandas merge — the same co-partition trick as bucket_agg) + a
    vectorized per-node argmax, i.e. no Ray per-key Aggregate and no
    driver node table."""
    import pyarrow as pa

    from ..util import bucket_agg

    und = _undirected(edges).materialize()
    if und.count() == 0:
        return ray.data.from_arrow(
            pa.schema([("node", pa.string()), ("label", pa.string())])
            .empty_table()
        )

    def mode_pick(df: pd.DataFrame) -> pd.DataFrame:
        # per (node): label with max count, ties -> min label
        g = (
            df.groupby(["node", "label"], sort=False, as_index=False)
            .size()
            .sort_values(
                ["node", "size", "label"], ascending=[True, False, True]
            )
        )
        out = g.drop_duplicates(["node"], keep="first")[["node", "label"]]
        return out.reset_index(drop=True).astype("string")

    if und.count() <= max_driver_edges:
        df = und.to_pandas()
        codes, nodes = pd.factorize(
            pd.concat([df["x"], df["y"]], ignore_index=True)
        )
        ex, ey = codes[: len(df)], codes[len(df):]
        src = np.concatenate([ex, ey])
        dst = np.concatenate([ey, ex])
        n = len(nodes)
        # label rank = lexicographic rank of the node string, so integer
        # min/argmax tie-breaks equal STRING tie-breaks exactly
        order = np.argsort(nodes)
        rank = np.empty(n, dtype=np.int64)
        rank[order] = np.arange(n)
        lab = rank.copy()
        for _ in range(rounds):
            msg_lab = lab[src]
            key = dst.astype(np.int64) * n + msg_lab
            ks, cnts = np.unique(key, return_counts=True)  # message-scale,
            # never the n^2 dense key space a bincount would allocate
            kn, kl = ks // n, ks % n
            # sort by (node, -count, label-rank) and keep first per node
            o = np.lexsort((kl, -cnts, kn))
            first = np.r_[True, kn[o][1:] != kn[o][:-1]]
            new = lab.copy()
            new[kn[o][first]] = kl[o][first]
            lab = new
        inv = np.empty(n, dtype=np.int64)
        inv[rank] = np.arange(n)  # rank -> node code
        return ray.data.from_pandas(
            pd.DataFrame(
                {
                    "node": pd.array(nodes, dtype="string"),
                    "label": pd.array(nodes[inv[lab]], dtype="string"),
                }
            )
        )

    def sym(df: pd.DataFrame) -> pd.DataFrame:
        return pd.DataFrame(
            {
                "src": pd.concat([df["x"], df["y"]], ignore_index=True),
                "dst": pd.concat([df["y"], df["x"]], ignore_index=True),
            }
        ).astype("string")

    sym_edges = und.map_batches(sym, batch_format="pandas").materialize()
    labels = sym_edges.map_batches(
        lambda df: pd.DataFrame(
            {"node": df["src"], "label": df["src"]}
        ).drop_duplicates(),
        batch_format="pandas",
    )
    from ..util import heal_schema, join_partitions

    np_ = join_partitions(None)
    for _ in range(rounds):
        # message table: for edge (src -> dst), dst receives label(src)
        msgs = heal_schema(sym_edges, np_).join(
            heal_schema(labels, np_).map_batches(
                lambda df: df.rename(columns={"node": "src"}),
                batch_format="pandas",
            ),
            "inner", np_, on=("src",),
        ).map_batches(
            lambda df: pd.DataFrame(
                {"node": df["dst"], "label": df["label"]}
            ).astype("string"),
            batch_format="pandas",
        )
        labels = bucket_agg(
            msgs, ["node"], mode_pick, num_buckets=num_buckets
        ).materialize()
    return labels


def hits_int(
    edges: "ray.data.Dataset",
    *,
    iters: int = 2,
    scale: int = 1_000_000,
    max_driver_edges: int = 2_000_000,
    num_partitions: int | None = None,
) -> "ray.data.Dataset":
    """Deterministic INTEGER HITS (hubs & authorities, Kleinberg) —
    floor arithmetic end to end so a SQL oracle reproduces it
    bit-exactly (the classical L2 normalization is IEEE-float and
    summation-order-dependent; max-normalization is order-free):

        hub_0(n) = scale                           (every node)
        a_raw(n) = Σ_{m→n} hub_i(m)                (per-EDGE; multi-edges
                                                    contribute once each)
        auth(n)  = a_raw(n) * scale // max(a_raw)  (max over all nodes)
        h_raw(n) = Σ_{n→m} auth(m)
        hub(n)   = h_raw(n) * scale // max(h_raw)

    so both scores live in [0, scale] after every iteration.  Overflow
    bound (documented, not checked per row): a_raw ≤ in_deg_max·scale,
    and the normalization product a_raw·scale stays in int64 while
    in_deg_max < 2^63 / scale² ≈ 9.2·10^6 at the default scale — at
    larger degree scales pass a smaller ``scale``.

    Size-adaptive like ``pagerank_int`` (parity-tested): under
    ``max_driver_edges`` the edge list is collected once and the loop
    runs vectorized on the driver; above it each half-step is one hash
    join (scores ⋈ edges) + one bucketed sum + a GLOBAL max (a scalar
    aggregate, broadcast into the normalization map_batches — never a
    per-key Ray aggregate)."""
    from ..functions.kernel import distinct
    from ..util import bucket_sum, join_partitions

    np_ = _nparts(num_partitions)

    def to_pairs(df: pd.DataFrame) -> pd.DataFrame:
        return pd.DataFrame(
            {"src": df["subj"].astype("string"), "dst": df["obj"].astype("string")}
        )

    pairs = edges.map_batches(to_pairs, batch_format="pandas")
    n_edges = pairs.count()

    if n_edges == 0:
        # an emptied dataset yields zero batches (pd.concat([]) raises)
        import pyarrow as pa

        return ray.data.from_arrow(
            pa.schema(
                [("node", pa.string()), ("auth", pa.int64()),
                 ("hub", pa.int64())]
            ).empty_table()
        )

    if n_edges <= max_driver_edges:
        e = pd.concat(
            list(pairs.iter_batches(batch_format="pandas", batch_size=65536)),
            ignore_index=True,
        )
        nodes = pd.Index(pd.concat([e["src"], e["dst"]]).unique())
        hub = pd.Series(scale, index=nodes, dtype="int64")
        auth = pd.Series(0, index=nodes, dtype="int64")
        for _ in range(iters):
            a_raw = (
                pd.DataFrame({"dst": e["dst"], "v": hub[e["src"]].to_numpy()})
                .groupby("dst")["v"]
                .sum()
                .reindex(nodes, fill_value=0)
                .astype("int64")
            )
            amax = max(int(a_raw.max()), 1)
            auth = (a_raw * scale // amax).astype("int64")
            h_raw = (
                pd.DataFrame({"src": e["src"], "v": auth[e["dst"]].to_numpy()})
                .groupby("src")["v"]
                .sum()
                .reindex(nodes, fill_value=0)
                .astype("int64")
            )
            hmax = max(int(h_raw.max()), 1)
            hub = (h_raw * scale // hmax).astype("int64")
        out = pd.DataFrame(
            {
                "node": pd.Series(nodes, dtype="string"),
                "auth": auth.to_numpy(),
                "hub": hub.to_numpy(),
            }
        )
        return ray.data.from_pandas(out.sort_values("node", ignore_index=True))

    pairs = heal_schema(pairs, np_).materialize()

    def node_partial(df: pd.DataFrame) -> pd.DataFrame:
        u = pd.concat([df["src"], df["dst"]], ignore_index=True).drop_duplicates()
        return pd.DataFrame({"node": u.astype("string")})

    nodes_ds = heal_schema(
        distinct(pairs.map_batches(node_partial, batch_format="pandas"), ["node"]),
        np_,
    ).materialize()

    def _half_step(
        scores: "ray.data.Dataset", key: str, other: str
    ) -> "ray.data.Dataset":
        """One normalized propagation: sum ``scores`` over edges into
        ``other``-side nodes, then max-normalize to [0, scale]."""
        msgs = (
            pairs.join(
                heal_schema(scores, np_).map_batches(
                    lambda df, key=key: df.rename(columns={"node": key}),
                    batch_format="pandas",
                ),
                "inner",
                np_,
                on=(key,),
            )
            .map_batches(
                lambda df, other=other: pd.DataFrame(
                    {"node": df[other].astype("string"),
                     "v": df["v"].astype("int64")}
                ),
                batch_format="pandas",
            )
        )
        raw = heal_schema(
            bucket_sum(msgs, ["node"], ["v"], num_buckets=np_), np_
        )
        joined = heal_schema(nodes_ds, np_).join(
            raw, "left_outer", np_, on=("node",)
        ).materialize()
        mx = max(int(joined.max("v") or 0), 1)

        def norm(df: pd.DataFrame, mx=mx) -> pd.DataFrame:
            v = (
                df["v"].fillna(0).astype("int64")
                if "v" in df.columns
                else pd.Series(0, index=df.index, dtype="int64")
            )
            return pd.DataFrame(
                {"node": df["node"].astype("string"),
                 "v": (v * scale // mx).astype("int64")}
            )

        return joined.map_batches(norm, batch_format="pandas").materialize()

    def init_scores(df: pd.DataFrame) -> pd.DataFrame:
        return pd.DataFrame(
            {"node": df["node"].astype("string"),
             "v": pd.Series(scale, index=df.index, dtype="int64")}
        )

    hub_ds = nodes_ds.map_batches(init_scores, batch_format="pandas").materialize()
    auth_ds = None
    for _ in range(iters):
        auth_ds = _half_step(hub_ds, "src", "dst")
        hub_ds = _half_step(auth_ds, "dst", "src")

    merged = heal_schema(
        auth_ds.map_batches(
            lambda df: df.rename(columns={"v": "auth"}), batch_format="pandas"
        ),
        np_,
    ).join(
        heal_schema(
            hub_ds.map_batches(
                lambda df: df.rename(columns={"v": "hub"}), batch_format="pandas"
            ),
            np_,
        ),
        "inner",
        np_,
        on=("node",),
    )
    return merged.map_batches(
        lambda df: df[["node", "auth", "hub"]], batch_format="pandas"
    )


def clustering_coeff(
    edges: "ray.data.Dataset",
    *,
    scale: int = 1_000_000,
    num_partitions: int | None = None,
) -> "ray.data.Dataset":
    """Per-node local clustering coefficient over the UNDIRECTED simple
    graph (self-loops dropped, multi-edges collapsed):

        tri(n)   = number of triangles containing n
        deg(n)   = distinct-neighbor degree
        coeff    = 2·tri·scale // (deg·(deg−1))   (0 when deg < 2)

    emitted as integer parts-per-``scale`` so the DuckDB twin is
    hash-exact (float division would diverge).  Rides the
    degree-oriented ``triangle_enum`` (wedge fan-out bounded O(√m));
    per-node triangle counts come from exploding each canonical
    (a, b, c) row into 3 (node, 1) rows and one bucketed sum — never a
    per-key Ray aggregate.  Returns (node, tri, deg, coeff_ppm) for
    every node of the undirected graph."""
    from ..util import bucket_sum

    np_ = _nparts(num_partitions)
    und = _undirected(edges).materialize()

    def tri_explode(df: pd.DataFrame) -> pd.DataFrame:
        nodes = pd.concat([df["a"], df["b"], df["c"]], ignore_index=True)
        return pd.DataFrame(
            {"node": nodes.astype("string"),
             "tri": pd.Series(1, index=nodes.index, dtype="int64")}
        )

    tri_counts = bucket_sum(
        triangle_enum(edges, num_partitions=np_, undirected=und).map_batches(
            tri_explode, batch_format="pandas"
        ),
        ["node"],
        ["tri"],
        num_buckets=np_,
    )

    def deg_partial(df: pd.DataFrame) -> pd.DataFrame:
        nodes = pd.concat([df["x"], df["y"]], ignore_index=True)
        return pd.DataFrame(
            {"node": nodes.astype("string"),
             "deg": pd.Series(1, index=nodes.index, dtype="int64")}
        )

    deg = bucket_sum(
        und.map_batches(deg_partial, batch_format="pandas"),
        ["node"],
        ["deg"],
        num_buckets=np_,
    )

    joined = heal_schema(deg, np_).join(
        heal_schema(tri_counts, np_), "left_outer", np_, on=("node",)
    )

    def finish(df: pd.DataFrame) -> pd.DataFrame:
        tri = (
            df["tri"].fillna(0).astype("int64")
            if "tri" in df.columns
            else pd.Series(0, index=df.index, dtype="int64")
        )
        d = df["deg"].astype("int64")
        denom = (d * (d - 1)).to_numpy()
        coeff = np.where(
            denom > 0, 2 * tri.to_numpy() * scale // np.maximum(denom, 1), 0
        ).astype("int64")
        return pd.DataFrame(
            {
                "node": df["node"].astype("string"),
                "tri": tri,
                "deg": d,
                "coeff_ppm": coeff,
            }
        )

    return joined.map_batches(finish, batch_format="pandas")


def _tarjan_scc_labels(e: pd.DataFrame) -> pd.DataFrame:
    """Driver-regime SCC: iterative Tarjan over an (src, dst) edge
    frame; returns (node, label) with label = the component's
    lexicographically smallest node id."""
    nodes = pd.Index(pd.concat([e["src"], e["dst"]]).unique())
    idx = pd.Series(np.arange(len(nodes)), index=nodes)
    src = idx[e["src"]].to_numpy()
    dst = idx[e["dst"]].to_numpy()
    order = np.argsort(src, kind="stable")
    src_s, dst_s = src[order], dst[order]
    starts = np.searchsorted(src_s, np.arange(len(nodes) + 1))

    n = len(nodes)
    UNVISITED = -1
    index_of = np.full(n, UNVISITED, dtype=np.int64)
    low = np.zeros(n, dtype=np.int64)
    on_stack = np.zeros(n, dtype=bool)
    comp = np.full(n, -1, dtype=np.int64)
    stack: list[int] = []
    next_index = 0
    n_comp = 0

    for root in range(n):
        if index_of[root] != UNVISITED:
            continue
        # work stack of (node, next-edge-cursor)
        work = [(root, starts[root])]
        index_of[root] = low[root] = next_index
        next_index += 1
        stack.append(root)
        on_stack[root] = True
        while work:
            v, cur = work[-1]
            if cur < starts[v + 1]:
                work[-1] = (v, cur + 1)
                w = dst_s[cur]
                if index_of[w] == UNVISITED:
                    index_of[w] = low[w] = next_index
                    next_index += 1
                    stack.append(w)
                    on_stack[w] = True
                    work.append((w, starts[w]))
                elif on_stack[w]:
                    low[v] = min(low[v], index_of[w])
            else:
                work.pop()
                if work:
                    p = work[-1][0]
                    low[p] = min(low[p], low[v])
                if low[v] == index_of[v]:
                    while True:
                        w = stack.pop()
                        on_stack[w] = False
                        comp[w] = n_comp
                        if w == v:
                            break
                    n_comp += 1

    lab = (
        pd.DataFrame({"node": pd.Series(nodes, dtype="string"), "c": comp})
        .groupby("c")["node"]
        .transform("min")
    )
    return pd.DataFrame(
        {"node": pd.Series(nodes, dtype="string"), "label": lab.astype("string")}
    ).sort_values("node", ignore_index=True)


def scc(
    edges: "ray.data.Dataset",
    *,
    max_driver_edges: int = 2_000_000,
    max_outer_rounds: int = 30,
    max_prop_rounds: int = 64,
    num_partitions: int | None = None,
) -> "ray.data.Dataset":
    """Strongly connected components of the directed (subj → obj)
    graph: rows (node, label), label = the SCC's lexicographically
    smallest node id — the cycle-group structure of an import graph
    (every module in a dependency cycle shares a label).

    Size-adaptive (parity-tested): under ``max_driver_edges`` the
    distinct edge list is collected once and labeled by iterative
    Tarjan on the driver.  Above it, the FW-BW-MIN peeling scheme
    (Orzan-style coloring) runs fully distributed: (1) forward-MIN
    coloring to fixpoint — color(v) = min id that reaches v within the
    still-active subgraph (one hash join + bucketed min per round,
    rounds ≤ active diameter); (2) backward membership from each pivot
    p (color(p) = p) along edges that stay inside p's color class —
    exactly SCC(p); (3) assign and peel members, repeat.  Each outer
    round retires every pivot's SCC, and two fast paths finish early:
    when no intra-color edge remains the active remainder is provably
    acyclic (all singletons), and when the active edge set empties the
    surviving nodes are edge-free singletons.  Pathological id-ascending
    SCC chains that exceed ``max_outer_rounds`` (or a propagation that
    exceeds ``max_prop_rounds``) raise rather than return wrong
    labels."""
    from ..functions.kernel import distinct
    from ..util import bucket_agg

    np_ = _nparts(num_partitions)

    def to_pairs(df: pd.DataFrame) -> pd.DataFrame:
        return pd.DataFrame(
            {"src": df["subj"].astype("string"), "dst": df["obj"].astype("string")}
        ).drop_duplicates(ignore_index=True)

    pairs = distinct(
        edges.map_batches(to_pairs, batch_format="pandas"), ["src", "dst"]
    ).materialize()
    n_pairs = pairs.count()

    if n_pairs == 0:
        # guard BEFORE collecting: an emptied dataset yields zero
        # batches and pd.concat([]) raises
        import pyarrow as pa

        return ray.data.from_arrow(
            pa.schema([("node", pa.string()), ("label", pa.string())])
            .empty_table()
        )

    if n_pairs <= max_driver_edges:
        e = pd.concat(
            list(pairs.iter_batches(batch_format="pandas", batch_size=65536)),
            ignore_index=True,
        )
        return ray.data.from_pandas(_tarjan_scc_labels(e))

    # ---- distributed FW-BW-MIN peeling ------------------------------------
    def node_partial(df: pd.DataFrame) -> pd.DataFrame:
        u = pd.concat([df["src"], df["dst"]], ignore_index=True).drop_duplicates()
        return pd.DataFrame({"node": u.astype("string")})

    active_nodes = heal_schema(
        distinct(pairs.map_batches(node_partial, batch_format="pandas"), ["node"]),
        np_,
    ).materialize()
    active_edges = heal_schema(pairs, np_).materialize()
    done: list["ray.data.Dataset"] = []

    def min_by_node(df: pd.DataFrame) -> pd.DataFrame:
        return (
            df.groupby("node", as_index=False)["label"]
            .min()
            .astype({"node": "string", "label": "string"})
        )

    def retire_rest(nodes_ds: "ray.data.Dataset") -> "ray.data.Dataset":
        """Label every remaining active node as its own singleton SCC
        and return the emptied active set (shared by the three
        early-finish paths so their labeling shape cannot drift)."""
        done.append(
            nodes_ds.map_batches(
                lambda df: pd.DataFrame(
                    {"node": df["node"].astype("string"),
                     "label": df["node"].astype("string")}
                ),
                batch_format="pandas",
            )
        )
        return nodes_ds.limit(0).materialize()

    for _ in range(max_outer_rounds):
        if active_nodes.count() == 0:
            break
        # (1) forward-MIN coloring to fixpoint
        colors = active_nodes.map_batches(
            lambda df: pd.DataFrame(
                {"node": df["node"].astype("string"),
                 "label": df["node"].astype("string")}
            ),
            batch_format="pandas",
        ).materialize()
        for _r in range(max_prop_rounds):
            msgs = active_edges.join(
                heal_schema(colors, np_).map_batches(
                    lambda df: df.rename(columns={"node": "src"}),
                    batch_format="pandas",
                ),
                "inner",
                np_,
                on=("src",),
            ).map_batches(
                lambda df: pd.DataFrame(
                    {"node": df["dst"].astype("string"),
                     "label": df["label"].astype("string")}
                ),
                batch_format="pandas",
            )
            new_colors = bucket_agg(
                heal_schema(colors, np_).union(heal_schema(msgs, np_)),
                ["node"],
                min_by_node,
                num_buckets=np_,
            ).materialize()
            # fixpoint check: count of (node,label) rows that changed
            delta = (
                heal_schema(new_colors, np_)
                .join(
                    heal_schema(colors, np_).map_batches(
                        lambda df: df.rename(columns={"label": "old"}),
                        batch_format="pandas",
                    ),
                    "inner",
                    np_,
                    on=("node",),
                )
                .map_batches(
                    lambda df: df[df["label"] != df["old"]][["node"]],
                    batch_format="pandas",
                )
                .count()
            )
            colors = new_colors
            if delta == 0:
                break
        else:
            raise RuntimeError(
                "scc: forward coloring did not converge within "
                f"max_prop_rounds={max_prop_rounds}"
            )
        # (2) backward membership from pivots within color classes.
        # member rows: (node, label).  seed = pivots.
        members = colors.map_batches(
            lambda df: df[df["node"] == df["label"]].reset_index(drop=True),
            batch_format="pandas",
        ).materialize()
        # color-annotated edges (both endpoints' colors).  The two
        # annotation joins MUST NOT share one execution plan: each join
        # partition holds a HashShuffleAggregator CPU slot alive, and two
        # concurrent joins at join_partitions = CPUs/2 each claim every
        # core, starving the producer tasks (observed hang at 4 cpus) —
        # materialize between them so the operators run serially.
        ec_half = heal_schema(
            active_edges.join(
                heal_schema(colors, np_).map_batches(
                    lambda df: df.rename(
                        columns={"node": "src", "label": "csrc"}
                    ),
                    batch_format="pandas",
                ),
                "inner",
                np_,
                on=("src",),
            ),
            np_,
        ).materialize()
        ec = ec_half.join(
            heal_schema(colors, np_).map_batches(
                lambda df: df.rename(columns={"node": "dst", "label": "cdst"}),
                batch_format="pandas",
            ),
            "inner",
            np_,
            on=("dst",),
        ).map_batches(
            lambda df: df[df["csrc"] == df["cdst"]][["src", "dst"]].reset_index(
                drop=True
            ),
            batch_format="pandas",
        )
        ec = heal_schema(ec, np_).materialize()
        prev_n = members.count()
        # no intra-color edge anywhere ⇒ the active remainder is ACYCLIC
        # (any directed cycle is mutually reachable, hence one color
        # class with internal edges) ⇒ every remaining node is its own
        # SCC — finish in one shot.  This also keeps the schema-less
        # fully-empty ec away from the join below.
        if ec.count() == 0:
            active_nodes = retire_rest(active_nodes)
            break
        for _r in range(max_prop_rounds):
            # u joins SCC if edge u→w and w is a member (same color class
            # already enforced in ec; label rides along from w)
            grow = ec.join(
                heal_schema(members, np_).map_batches(
                    lambda df: df.rename(columns={"node": "dst"}),
                    batch_format="pandas",
                ),
                "inner",
                np_,
                on=("dst",),
            ).map_batches(
                lambda df: pd.DataFrame(
                    {"node": df["src"].astype("string"),
                     "label": df["label"].astype("string")}
                ),
                batch_format="pandas",
            )
            new_members = bucket_agg(
                heal_schema(members, np_).union(heal_schema(grow, np_)),
                ["node"],
                min_by_node,
                num_buckets=np_,
            ).materialize()
            n_now = new_members.count()
            members = new_members
            if n_now == prev_n:
                break
            prev_n = n_now
        else:
            raise RuntimeError(
                "scc: backward membership did not converge within "
                f"max_prop_rounds={max_prop_rounds}"
            )
        done.append(members)
        # (3) peel: drop members from active nodes and edges
        anti = members.map_batches(
            lambda df: df[["node"]], batch_format="pandas"
        ).materialize()
        active_nodes = heal_schema(active_nodes, np_).join(
            heal_schema(
                anti.map_batches(
                    lambda df: df.assign(_m=1), batch_format="pandas"
                ),
                np_,
            ),
            "left_outer",
            np_,
            on=("node",),
        ).map_batches(
            lambda df: df[df["_m"].isna()][["node"]].reset_index(drop=True)
            if "_m" in df.columns
            else df[["node"]],
            batch_format="pandas",
        ).materialize()
        if active_nodes.count() == 0:
            break
        active_edges = heal_schema(active_edges, np_).join(
            heal_schema(
                anti.map_batches(
                    lambda df: df.rename(columns={"node": "src"}).assign(_m=1),
                    batch_format="pandas",
                ),
                np_,
            ),
            "left_outer",
            np_,
            on=("src",),
        ).map_batches(
            lambda df: df[df["_m"].isna()][["src", "dst"]].reset_index(drop=True)
            if "_m" in df.columns
            else df[["src", "dst"]],
            batch_format="pandas",
        )
        # the filter above can emit schema-less empty blocks — heal
        # BEFORE the second anti-join or its key probe fails; and
        # materialize so the two anti-joins never run concurrently
        # (aggregator CPU-slot starvation, see ec above)
        active_edges = heal_schema(active_edges, np_).materialize()
        if active_edges.count() == 0:
            # every surviving node is edge-free ⇒ its own SCC; a fully
            # empty dataset is schema-less and must not reach a join
            active_nodes = retire_rest(active_nodes)
            break
        active_edges = active_edges.join(
            heal_schema(
                anti.map_batches(
                    lambda df: df.rename(columns={"node": "dst"}).assign(_m=1),
                    batch_format="pandas",
                ),
                np_,
            ),
            "left_outer",
            np_,
            on=("dst",),
        ).map_batches(
            lambda df: df[df["_m"].isna()][["src", "dst"]].reset_index(drop=True)
            if "_m" in df.columns
            else df[["src", "dst"]],
            batch_format="pandas",
        )
        active_edges = heal_schema(active_edges, np_).materialize()
        if active_edges.count() == 0:
            active_nodes = retire_rest(active_nodes)
            break
    else:
        raise RuntimeError(
            f"scc: peeling did not finish within max_outer_rounds="
            f"{max_outer_rounds}"
        )

    out = done[0]
    for d in done[1:]:
        out = heal_schema(out, np_).union(heal_schema(d, np_))
    return out


def dag_path_counts(
    edges: "ray.data.Dataset",
    *,
    max_iters: int = 64,
    max_driver_edges: int = 2_000_000,
    num_partitions: int | None = None,
) -> "ray.data.Dataset":
    """Distinct root-to-node path counts over a dependency DAG — the
    provenance/fan-in question (how many build orders reach this
    module): roots are nodes with NO incoming edge, paths(root) = 1,
    paths(v) = Σ paths(u) over in-edges u → v.  Returns (node,
    n_paths) for every node.  Iteration is the monotone fixpoint
    p_{i+1}(v) = is_root(v) + Σ_{u→v} p_i(u) (p_i counts root paths of
    length ≤ i), which stabilizes in longest-path rounds on a DAG; a
    cyclic graph grows forever and raises at ``max_iters`` instead of
    returning wrong counts.

    Size-adaptive like ``dag_depth`` (parity-tested): vectorized
    driver loop under ``max_driver_edges``; above it each round is one
    hash join (counts ⋈ edges on src) + one bucketed sum + a fixpoint
    signature check."""
    from ..functions.kernel import distinct

    np_ = _nparts(num_partitions)

    def to_pairs(df: pd.DataFrame) -> pd.DataFrame:
        return pd.DataFrame(
            {"src": df["subj"].astype("string"), "dst": df["obj"].astype("string")}
        ).drop_duplicates(ignore_index=True)

    # GLOBAL distinct, not just per-batch: a duplicate (src, dst) pair
    # split across blocks would double-count every path through it in
    # the distributed fixpoint (the driver regime and the SQL oracle
    # both dedup globally)
    pairs = distinct(
        edges.map_batches(to_pairs, batch_format="pandas"), ["src", "dst"]
    ).materialize()
    n_edges = pairs.count()

    if n_edges == 0:
        import pyarrow as pa

        return ray.data.from_arrow(
            pa.schema([("node", pa.string()), ("n_paths", pa.int64())])
            .empty_table()
        )

    if n_edges <= max_driver_edges:
        e = pd.concat(
            list(pairs.iter_batches(batch_format="pandas", batch_size=65536)),
            ignore_index=True,
        ).drop_duplicates(ignore_index=True)
        nodes = pd.Index(pd.concat([e["src"], e["dst"]]).unique())
        root = (~nodes.isin(e["dst"])).astype("int64")
        root = pd.Series(root, index=nodes)
        p = root.copy()
        for _ in range(max_iters):
            inc = (
                pd.DataFrame({"dst": e["dst"], "c": p[e["src"]].to_numpy()})
                .groupby("dst")["c"]
                .sum()
                .reindex(nodes, fill_value=0)
                .astype("int64")
            )
            new = (root + inc).astype("int64")
            if new.equals(p):
                break
            p = new
        else:
            raise RuntimeError(
                f"dag_path_counts did not converge in {max_iters} rounds: "
                "the graph contains a cycle or is deeper than the bound"
            )
        out = pd.DataFrame(
            {"node": pd.Series(nodes, dtype="string"), "n_paths": p.to_numpy()}
        )
        return ray.data.from_pandas(out.sort_values("node", ignore_index=True))

    # distributed regime
    from ..util import bucket_sum, ds_signature

    pairs = heal_schema(pairs, np_).materialize()

    def node_partial(df: pd.DataFrame) -> pd.DataFrame:
        u = pd.concat([df["src"], df["dst"]], ignore_index=True).drop_duplicates()
        return pd.DataFrame({"node": u.astype("string")})

    nodes_ds = heal_schema(
        distinct(pairs.map_batches(node_partial, batch_format="pandas"), ["node"]),
        np_,
    ).materialize()

    dst_set = heal_schema(
        distinct(
            pairs.map_batches(
                lambda df: pd.DataFrame(
                    {"node": df["dst"].astype("string")}
                ).drop_duplicates(ignore_index=True),
                batch_format="pandas",
            ),
            ["node"],
        ).map_batches(lambda df: df.assign(_in=1), batch_format="pandas"),
        np_,
    )
    roots_ds = heal_schema(nodes_ds, np_).join(
        dst_set, "left_outer", np_, on=("node",)
    ).map_batches(
        lambda df: pd.DataFrame(
            {
                "node": df["node"].astype("string"),
                "root": (
                    df["_in"].isna()
                    if "_in" in df.columns
                    else pd.Series(True, index=df.index)
                ).astype("int64"),
            }
        ),
        batch_format="pandas",
    )
    roots_ds = heal_schema(roots_ds, np_).materialize()

    p_ds = roots_ds.map_batches(
        lambda df: pd.DataFrame(
            {"node": df["node"].astype("string"),
             "c": df["root"].astype("int64")}
        ),
        batch_format="pandas",
    ).materialize()

    def sig(ds) -> int:
        return ds_signature(ds, ["node", "c"])

    cur = sig(p_ds)
    for it in range(max_iters + 1):
        if it == max_iters:
            raise RuntimeError(
                f"dag_path_counts did not converge in {max_iters} rounds: "
                "the graph contains a cycle or is deeper than the bound"
            )
        msgs = pairs.join(
            heal_schema(_ren(p_ds, {"node": "src"}), np_),
            "inner",
            np_,
            on=("src",),
        ).map_batches(
            lambda df: pd.DataFrame(
                {"node": df["dst"].astype("string"),
                 "c": df["c"].astype("int64")}
            ),
            batch_format="pandas",
        )
        sums = heal_schema(
            bucket_sum(heal_schema(msgs, np_), ["node"], ["c"], num_buckets=np_),
            np_,
        )
        p_new = roots_ds.join(
            _ren(sums, {"c": "s"}), "left_outer", np_, on=("node",)
        ).map_batches(
            lambda df: pd.DataFrame(
                {
                    "node": df["node"].astype("string"),
                    "c": (
                        df["root"].astype("int64")
                        + (
                            df["s"].fillna(0).astype("int64")
                            if "s" in df.columns
                            else 0
                        )
                    ).astype("int64"),
                }
            ),
            batch_format="pandas",
        ).materialize()
        p_ds = p_new
        new = sig(p_ds)
        if new == cur:
            break
        cur = new
    return p_ds.map_batches(
        lambda df: df.rename(columns={"c": "n_paths"}), batch_format="pandas"
    )


def tree_betweenness(
    edges: "ray.data.Dataset",
    *,
    max_iters: int = 64,
    max_driver_edges: int = 2_000_000,
    num_partitions: int | None = None,
) -> "ray.data.Dataset":
    """Exact betweenness centrality on a parent-pointer FOREST (subj =
    child, obj = parent; ≤1 out-edge per node) in closed form — no
    per-pair path work: removing node v splits its tree (size n_t) into
    its child subtrees (sizes c_1..c_k) and the "up" component of size
    u = n_t − 1 − Σc_i, so the number of unordered (s, t) pairs whose
    unique path passes THROUGH v is

        bet(v) = C(n_t−1, 2) − Σ_i C(c_i, 2) − C(u, 2).

    Everything reduces to subtree sizes: the monotone fixpoint
    d_{i+1}(v) = 1 + Σ_{child c} d_i(c) (d_i = descendants within depth
    ≤ i, incl. self) converges in height rounds; per-parent (Σc, Σc²)
    is one bucketed sum; tree sizes come from connected-component
    labels (component count = #trees, so label→size broadcasts).
    Size-adaptive like :func:`dag_path_counts` (parity-tested): exact
    vectorized pandas under ``max_driver_edges``, else each round is
    one hash join + one bucketed sum with a fixpoint signature check.
    A node with TWO parents raises (not a forest); a cycle never
    converges and raises at ``max_iters``.  Returns (node, betweenness),
    int64, one row per node appearing in the edge set."""
    from ..functions.kernel import distinct
    from ..util import bucket_count, bucket_sum, ds_signature, heal_schema

    np_ = _nparts(num_partitions)

    def to_pairs(df: pd.DataFrame) -> pd.DataFrame:
        return pd.DataFrame(
            {"src": df["subj"].astype("string"),
             "dst": df["obj"].astype("string")}
        ).drop_duplicates(ignore_index=True)

    pairs = distinct(
        edges.map_batches(to_pairs, batch_format="pandas"), ["src", "dst"]
    ).materialize()
    n_edges = pairs.count()

    if n_edges == 0:
        import pyarrow as pa

        return ray.data.from_arrow(
            pa.schema([("node", pa.string()), ("betweenness", pa.int64())])
            .empty_table()
        )

    def _bet(n_t, sumc, sumc2):
        # C(n_t-1,2) - Σ C(c_i,2) - C(u,2), all int64-vectorized
        # (Σ C(c_i,2) = (Σc_i² - Σc_i)/2; u = n_t - 1 - Σc_i)
        up = n_t - 1 - sumc
        c2 = lambda x: x * (x - 1) // 2  # noqa: E731
        return c2(n_t - 1) - (sumc2 - sumc) // 2 - c2(up)

    if n_edges <= max_driver_edges:
        e = pd.concat(
            list(pairs.iter_batches(batch_format="pandas", batch_size=65536)),
            ignore_index=True,
        ).drop_duplicates(ignore_index=True)
        if e["src"].duplicated().any():
            bad = e.loc[e["src"].duplicated(), "src"].iloc[0]
            raise RuntimeError(
                f"tree_betweenness: node {bad!r} has more than one parent "
                "— the edge set is not a parent-pointer forest"
            )
        nodes = pd.Index(pd.concat([e["src"], e["dst"]]).unique())
        d = pd.Series(1, index=nodes, dtype="int64")
        for it in range(max_iters + 1):
            if it == max_iters:
                raise RuntimeError(
                    f"tree_betweenness did not converge in {max_iters} "
                    "rounds: the graph contains a cycle or is deeper"
                )
            inc = (
                pd.DataFrame({"dst": e["dst"], "c": d[e["src"]].to_numpy()})
                .groupby("dst")["c"]
                .sum()
                .reindex(nodes, fill_value=0)
                .astype("int64")
            )
            new = (1 + inc).astype("int64")
            if new.equals(d):
                break
            d = new
        # tree label per node: follow parent pointers to the root
        pmap = pd.Series(e["dst"].to_numpy(), index=e["src"].to_numpy())
        root = pd.Series(nodes.to_numpy(), index=nodes)
        for it in range(max_iters + 1):
            nxt = root.map(pmap)
            done = nxt.isna()
            if done.all():
                break
            if it == max_iters:
                raise RuntimeError(
                    f"tree_betweenness root-following did not converge in "
                    f"{max_iters} rounds: cycle or over-deep tree"
                )
            root = nxt.where(~done, root)
        sizes = root.value_counts()
        n_t = root.map(sizes).astype("int64")
        ch = (
            pd.DataFrame({"p": e["dst"], "c": d[e["src"]].to_numpy()})
            .assign(c2=lambda x: x["c"] * x["c"])
            .groupby("p")[["c", "c2"]]
            .sum()
        )
        sumc = ch["c"].reindex(nodes, fill_value=0).astype("int64")
        sumc2 = ch["c2"].reindex(nodes, fill_value=0).astype("int64")
        out = pd.DataFrame(
            {
                "node": pd.Series(nodes, dtype="string"),
                "betweenness": _bet(
                    n_t.to_numpy(), sumc.to_numpy(), sumc2.to_numpy()
                ),
            }
        )
        return ray.data.from_pandas(out.sort_values("node", ignore_index=True))

    # ---- distributed regime ------------------------------------------------
    pairs = heal_schema(pairs, np_).materialize()
    dup = (
        bucket_count(pairs, ["src"], out_col="n", num_buckets=np_)
        .filter(expr="n > 1")
        .take(1)
    )
    if dup:
        raise RuntimeError(
            f"tree_betweenness: node {dup[0]['src']!r} has more than one "
            "parent — the edge set is not a parent-pointer forest"
        )

    def node_partial(df: pd.DataFrame) -> pd.DataFrame:
        u = pd.concat([df["src"], df["dst"]], ignore_index=True).drop_duplicates()
        return pd.DataFrame({"node": u.astype("string")})

    nodes_ds = heal_schema(
        distinct(pairs.map_batches(node_partial, batch_format="pandas"), ["node"]),
        np_,
    ).materialize()

    d_ds = nodes_ds.map_batches(
        lambda df: pd.DataFrame(
            {"node": df["node"].astype("string"),
             "c": pd.Series(1, index=df.index, dtype="int64")}
        ),
        batch_format="pandas",
    ).materialize()

    cur = ds_signature(d_ds, ["node", "c"])
    for it in range(max_iters + 1):
        if it == max_iters:
            raise RuntimeError(
                f"tree_betweenness did not converge in {max_iters} rounds: "
                "the graph contains a cycle or is deeper than the bound"
            )
        msgs = pairs.join(
            heal_schema(_ren(d_ds, {"node": "src"}), np_),
            "inner",
            np_,
            on=("src",),
        ).map_batches(
            lambda df: pd.DataFrame(
                {"node": df["dst"].astype("string"),
                 "c": df["c"].astype("int64")}
            ),
            batch_format="pandas",
        )
        sums = heal_schema(
            bucket_sum(heal_schema(msgs, np_), ["node"], ["c"], num_buckets=np_),
            np_,
        )
        d_new = nodes_ds.join(
            _ren(sums, {"c": "s"}), "left_outer", np_, on=("node",)
        ).map_batches(
            lambda df: pd.DataFrame(
                {
                    "node": df["node"].astype("string"),
                    "c": (
                        1
                        + (
                            df["s"].fillna(0).astype("int64")
                            if "s" in df.columns
                            else 0
                        )
                    ).astype("int64"),
                }
            ),
            batch_format="pandas",
        ).materialize()
        d_ds = d_new
        new = ds_signature(d_ds, ["node", "c"])
        if new == cur:
            break
        cur = new

    # tree sizes: component labels (tree count is small → broadcast sizes)
    labels = components(
        pairs.map_batches(
            lambda df: pd.DataFrame(
                {"subj": df["src"].astype("string"),
                 "obj": df["dst"].astype("string")}
            ),
            batch_format="pandas",
        ),
        num_partitions=np_,
    ).materialize()
    sizes = (
        bucket_count(labels, ["label"], out_col="n", num_buckets=np_)
        .to_pandas()
        .set_index("label")["n"]
        .astype("int64")
        .to_dict()
    )
    sizes_ref = ray.put(sizes)

    # per-parent child-subtree sums: one join + one bucketed sum
    ch = pairs.join(
        heal_schema(_ren(d_ds, {"node": "src"}), np_), "inner", np_, on=("src",)
    ).map_batches(
        lambda df: pd.DataFrame(
            {
                "node": df["dst"].astype("string"),
                "sumc": df["c"].astype("int64"),
                "sumc2": (df["c"].astype("int64") ** 2),
            }
        ),
        batch_format="pandas",
    )
    ch = heal_schema(
        bucket_sum(heal_schema(ch, np_), ["node"], ["sumc", "sumc2"],
                   num_buckets=np_),
        np_,
    )

    full = heal_schema(d_ds, np_).join(
        ch, "left_outer", np_, on=("node",)
    ).join(heal_schema(labels, np_), "inner", np_, on=("node",))

    def finish(df: pd.DataFrame) -> pd.DataFrame:
        sz = ray.get(sizes_ref)
        n_t = df["label"].map(sz).astype("int64").to_numpy()
        sumc = (
            df["sumc"].fillna(0).astype("int64").to_numpy()
            if "sumc" in df.columns
            else np.zeros(len(df), dtype="int64")
        )
        sumc2 = (
            df["sumc2"].fillna(0).astype("int64").to_numpy()
            if "sumc2" in df.columns
            else np.zeros(len(df), dtype="int64")
        )
        return pd.DataFrame(
            {
                "node": df["node"].astype("string"),
                "betweenness": _bet(n_t, sumc, sumc2),
            }
        )

    return full.map_batches(finish, batch_format="pandas")


def _edge_support_driver(df: pd.DataFrame) -> pd.DataFrame:
    """Per-edge triangle support of a canonical (x < y) undirected edge
    frame, fully vectorized on the driver: degree-orient every edge from
    its lower-(degree, id) endpoint (out-degree stays O(√m), hub-proof),
    wedge-join the oriented adjacency on the source, close each wedge
    against the canonical edge set with one merge, then count each
    triangle into its three edges.  Returns (x, y, support) covering
    EVERY input edge (support 0 when triangle-free)."""
    x = df["x"].astype(str)
    y = df["y"].astype(str)
    nodes, _ = None, None
    codes, uniq = pd.factorize(pd.concat([x, y], ignore_index=True))
    ex = codes[: len(df)]
    ey = codes[len(df):]
    n = len(uniq)
    deg = np.bincount(ex, minlength=n) + np.bincount(ey, minlength=n)
    # orientation rank: (deg, id-code) lexicographic, collision-free
    rank = deg.astype(np.int64) * n + np.arange(n, dtype=np.int64)
    fwd = rank[ex] < rank[ey]
    s = np.where(fwd, ex, ey)
    t = np.where(fwd, ey, ex)
    o = pd.DataFrame({"s": s, "t": t})
    w = o.merge(o, on="s")
    w = w[rank[w["t_x"].to_numpy()] < rank[w["t_y"].to_numpy()]]
    # close wedges against the canonical edge set (id order, not rank)
    b = np.minimum(w["t_x"].to_numpy(), w["t_y"].to_numpy())
    c = np.maximum(w["t_x"].to_numpy(), w["t_y"].to_numpy())
    ekey = pd.DataFrame(
        {"lo": np.minimum(ex, ey), "hi": np.maximum(ex, ey)}
    )
    tri = pd.DataFrame({"a": w["s"].to_numpy(), "lo": b, "hi": c}).merge(
        ekey, on=["lo", "hi"]
    )
    # one (lo*n + hi) int key per triangle edge → bincount-free value_counts
    a = tri["a"].to_numpy()
    b = tri["lo"].to_numpy()
    c = tri["hi"].to_numpy()
    e1 = np.minimum(a, b).astype(np.int64) * n + np.maximum(a, b)
    e2 = np.minimum(a, c).astype(np.int64) * n + np.maximum(a, c)
    e3 = b.astype(np.int64) * n + c
    keys, counts = np.unique(
        np.concatenate([e1, e2, e3]), return_counts=True
    )
    sup = pd.Series(counts, index=keys)
    ek = np.minimum(ex, ey).astype(np.int64) * n + np.maximum(ex, ey)
    out = pd.DataFrame(
        {
            "x": x.to_numpy(),
            "y": y.to_numpy(),
            "support": pd.Series(ek).map(sup).fillna(0).astype("int64").to_numpy(),
        }
    )
    return out


def ktruss(
    edges: "ray.data.Dataset",
    *,
    k: int = 3,
    max_rounds: int = 8,
    max_driver_edges: int = 2_000_000,
    num_partitions: int | None = None,
) -> "ray.data.Dataset":
    """The k-truss of the UNDIRECTED closure of a (subj, obj) edge
    Dataset: iteratively drop every edge whose triangle support inside
    the surviving subgraph is below ``k − 2`` until a pass drops
    nothing.  Returns (x, y, support) — the truss edges with their
    final in-truss support.  The cohesion filter one notch stronger
    than k-core (every truss edge sits in ≥ k−2 triangles), the usual
    pre-filter before community mining on a noisy KG.

    Same convergence contract as :func:`kcore`: rounds are bounded and
    a graph still peeling after ``max_rounds`` raises loudly, because
    the SQL oracle twin unrolls exactly that many peels.

    Size-adaptive: at or under ``max_driver_edges`` distinct undirected
    edges the peel runs as vectorized pandas/numpy merges on the driver
    (:func:`_edge_support_driver` — degree-oriented wedge join, O(m^1.5)
    work bound); above it each round is one distributed
    :func:`triangle_enum` (degree-oriented, hub-proof), a 3-way edge
    explode, one bucketed support count and one hash semi-join — edge-
    linear shuffle volume per round, no corpus-scale driver state."""
    import pyarrow as pa

    from ..util import bucket_sum, join_partitions

    empty = pa.schema(
        [("x", pa.string()), ("y", pa.string()), ("support", pa.int64())]
    ).empty_table()
    und = _undirected(edges).materialize()
    m = und.count()
    if m == 0:
        return ray.data.from_arrow(empty)

    if m <= max_driver_edges:
        cur = und.to_pandas()
        for _ in range(max_rounds):
            sup = _edge_support_driver(cur)
            keep = sup["support"] >= k - 2
            if keep.all():
                out = sup.astype(
                    {"x": "string", "y": "string", "support": "int64"}
                )
                return (
                    ray.data.from_pandas(out)
                    if len(out)
                    else ray.data.from_arrow(empty)
                )
            cur = sup.loc[keep, ["x", "y"]].reset_index(drop=True)
            if not len(cur):
                return ray.data.from_arrow(empty)
        raise RuntimeError(
            f"ktruss: still peeling after {max_rounds} rounds — raise "
            "max_rounds (and regenerate the oracle) for this graph"
        )

    np_ = join_partitions(num_partitions)

    def explode(df: pd.DataFrame) -> pd.DataFrame:
        # triangle (a, b, c) is degree-orientation-ordered; re-canonicalize
        # each of its 3 edges to id order for the support key
        parts = []
        for u, v in (("a", "b"), ("a", "c"), ("b", "c")):
            lo = df[u].where(df[u] < df[v], df[v])
            hi = df[v].where(df[u] < df[v], df[u])
            parts.append(pd.DataFrame({"x": lo, "y": hi}))
        out = pd.concat(parts, ignore_index=True).astype("string")
        out["support"] = np.int64(1)
        return out

    cur = und
    prev_m = m
    for _ in range(max_rounds):
        tri = triangle_enum(cur, undirected=cur, num_partitions=np_)
        sup = bucket_sum(
            tri.map_batches(explode, batch_format="pandas"),
            ["x", "y"],
            ["support"],
        )
        strong = sup.filter(expr=f"support >= {k - 2}").materialize()
        if strong.count() == 0:
            return ray.data.from_arrow(empty)
        # semi-join: keep current edges present in the strong-support set
        kept = heal_schema(cur, np_).join(
            heal_schema(strong, np_), "inner", np_, on=("x", "y"),
        ).materialize()
        cur_m = kept.count()
        if cur_m == prev_m:
            return kept.map_batches(
                lambda df: df[["x", "y", "support"]].astype(
                    {"x": "string", "y": "string", "support": "int64"}
                ),
                batch_format="pandas",
            )
        if cur_m == 0:
            return ray.data.from_arrow(empty)
        cur = kept.map_batches(
            lambda df: df[["x", "y"]] if len(df) else df,
            batch_format="pandas",
        ).materialize()
        prev_m = cur_m
    raise RuntimeError(
        f"ktruss: still peeling after {max_rounds} rounds — raise "
        "max_rounds (and regenerate the oracle) for this graph"
    )


def _md5_edge_w(src, dst, mod: int) -> np.ndarray:
    """Deterministic integer edge weights 1..mod from the md5 oracle
    bridge: ``md5_u64(f"{src}|{dst}") % mod + 1`` — bulk digest buffer,
    same bits as DuckDB ``md5_number_lower(src || '|' || dst)``."""
    import hashlib

    md5 = hashlib.md5
    joined = (
        pd.Series(src).astype(str) + "|" + pd.Series(dst).astype(str)
    ).to_numpy()
    digs = b"".join([md5(s.encode("utf-8")).digest() for s in joined])
    h = np.frombuffer(digs, "<u8")[1::2]
    return (h % np.uint64(mod)).astype(np.int64) + 1


def sssp(
    edges: "ray.data.Dataset",
    seeds: list[str],
    *,
    reverse: bool = False,
    weight_mod: int = 9,
    max_rounds: int = 256,
    max_driver_edges: int = 2_000_000,
    num_partitions: int | None = None,
) -> "ray.data.Dataset":
    """Weighted single-source shortest paths (seed set at distance 0)
    with deterministic integer edge weights w = md5_u64(src|dst) %
    ``weight_mod`` + 1 — the weighted upgrade of :func:`bfs_distances`
    (cost-aware provenance/routing queries over a KG where hops are not
    equal).  Synchronous Bellman-Ford rounds (Jacobi relaxation), so a
    recursive SQL twin enumerating (node, cumdist) pairs reaches the
    same fixpoint; rounds are bounded and non-convergence RAISES (the
    weights are strictly positive, so the fixpoint always exists — the
    bound only guards adversarial path-length blowups).

    Size-adaptive: at or under ``max_driver_edges`` the relaxation is a
    driver numpy loop (np.minimum.at per round over int-coded edges);
    above it each round is ONE hash join (dist ⋈ edges on the source)
    plus one bucketed min, with a (count, sum) metadata fixpoint test —
    distances never increase, so an unchanged (rows, sum) pair means
    converged.  Returns (node, dist) for every reachable node."""
    import pyarrow as pa

    from ..util import bucket_agg, heal_schema, join_partitions

    empty = pa.schema(
        [("node", pa.string()), ("dist", pa.int64())]
    ).empty_table()

    def proj(df: pd.DataFrame) -> pd.DataFrame:
        s, d = ("obj", "subj") if reverse else ("subj", "obj")
        out = pd.DataFrame({"src": df[s], "dst": df[d]})
        return out.drop_duplicates().astype("string")

    e = edges.map_batches(proj, batch_format="pandas").materialize()
    m = e.count()
    seeds = list(dict.fromkeys(seeds))

    if m <= max_driver_edges:
        df = e.to_pandas().drop_duplicates()
        codes, uniq = pd.factorize(
            pd.concat(
                [df["src"], df["dst"], pd.Series(seeds, dtype="string")],
                ignore_index=True,
            )
        )
        n = len(uniq)
        es = codes[: len(df)]
        ed = codes[len(df): 2 * len(df)]
        seed_codes = codes[2 * len(df):]
        w = _md5_edge_w(df["src"], df["dst"], weight_mod) if len(df) else (
            np.zeros(0, dtype=np.int64)
        )
        INF = np.int64(1 << 62)
        dist = np.full(n, INF, dtype=np.int64)
        dist[seed_codes] = 0
        for _ in range(max_rounds):
            cand = dist[es] + w            # old-dist candidates: synchronous
            cand[dist[es] == INF] = INF
            new = dist.copy()
            np.minimum.at(new, ed, cand)
            if (new == dist).all():
                reach = dist < INF
                out = pd.DataFrame(
                    {
                        "node": pd.array(
                            np.asarray(uniq)[reach], dtype="string"
                        ),
                        "dist": dist[reach],
                    }
                )
                return (
                    ray.data.from_pandas(out)
                    if len(out)
                    else ray.data.from_arrow(empty)
                )
            dist = new
        raise RuntimeError(
            f"sssp: still relaxing after {max_rounds} rounds — raise "
            "max_rounds for this graph"
        )

    np_ = join_partitions(num_partitions)
    dist = ray.data.from_pandas(
        pd.DataFrame(
            {"node": pd.array(seeds, dtype="string"),
             "dist": np.zeros(len(seeds), dtype=np.int64)}
        )
    ).materialize()
    prev = (len(seeds), 0)
    e_src = e.map_batches(
        lambda df: df.rename(columns={"src": "node"}), batch_format="pandas"
    ).materialize()
    # (sssp distributed loop continues below)

    def relax(df: pd.DataFrame) -> pd.DataFrame:
        w = _md5_edge_w(df["node"], df["dst"], weight_mod)
        return pd.DataFrame(
            {
                "node": df["dst"].astype("string"),
                "dist": df["dist"].astype("int64") + w,
            }
        )

    def gmin(df: pd.DataFrame) -> pd.DataFrame:
        g = df.groupby("node", as_index=False, sort=False)["dist"].min()
        return g.astype({"node": "string", "dist": "int64"})

    for _ in range(max_rounds):
        cand = heal_schema(dist, np_).join(
            heal_schema(e_src, np_), "inner", np_, on=("node",),
        ).map_batches(relax, batch_format="pandas")
        new = bucket_agg(
            dist.union(cand), ["node"], gmin
        ).materialize()
        from ray.data.aggregate import Sum

        cur = (new.count(), int(new.aggregate(Sum("dist"))["sum(dist)"] or 0))
        if cur == prev:
            return new
        dist, prev = new, cur
    raise RuntimeError(
        f"sssp: still relaxing after {max_rounds} rounds — raise "
        "max_rounds for this graph"
    )


def temporal_reachability(
    contacts: "ray.data.Dataset",
    seeds: list[str],
    *,
    max_rounds: int = 256,
    max_driver_edges: int = 2_000_000,
    num_partitions: int | None = None,
) -> "ray.data.Dataset":
    """Time-respecting reachability over a temporal contact graph —
    rows ``(src, dst, t)`` mean "src can pass to dst at instant t".
    A node v is reached at arrival(v) = the minimum t of any contact
    path whose timestamps STRICTLY increase along the path (strict ``>``
    makes same-instant relays impossible, so tie order between
    equal-timestamp contacts never matters); seeds start at arrival 0.
    The information-flow / contagion primitive over event streams —
    plain BFS over the static projection overcounts (it follows edges
    backwards in time).

    Synchronous Jacobi rounds, exactly :func:`sssp`'s shape: relax
    every contact with t > arrival(src) to a candidate arrival t, take
    per-node minimums, repeat to fixpoint — so a recursive SQL twin
    enumerating (node, t) pairs reaches the identical fixpoint.
    Size-adaptive and parity-tested: at or under ``max_driver_edges``
    the rounds are a driver numpy loop (np.minimum.at over int-coded
    contacts); above it each round is one hash join (arrival ⋈ contacts
    on src) plus one bucketed min with a (count, sum) metadata fixpoint
    test (arrivals never increase).  Returns ``(node, arrival)`` for
    every reached node, seeds included at 0."""
    import pyarrow as pa

    from ..util import bucket_agg, heal_schema, join_partitions

    empty = pa.schema(
        [("node", pa.string()), ("arrival", pa.int64())]
    ).empty_table()

    def proj(df: pd.DataFrame) -> pd.DataFrame:
        out = pd.DataFrame(
            {
                "src": df["src"].astype("string"),
                "dst": df["dst"].astype("string"),
                "t": df["t"].astype("int64"),
            }
        )
        return out.drop_duplicates()

    e = contacts.map_batches(proj, batch_format="pandas").materialize()
    m = e.count()
    seeds = list(dict.fromkeys(seeds))
    if (
        pd.Series(seeds, dtype="object").map(lambda s: not isinstance(s, str)).any()
    ):
        raise TypeError("temporal_reachability seeds must be strings")

    if m <= max_driver_edges:
        df = e.to_pandas()
        if not len(df):
            out = pd.DataFrame(
                {"node": pd.array(seeds, dtype="string"),
                 "arrival": np.zeros(len(seeds), dtype=np.int64)}
            )
            return (
                ray.data.from_pandas(out) if len(out)
                else ray.data.from_arrow(empty)
            )
        codes, uniq = pd.factorize(
            pd.concat(
                [df["src"], df["dst"], pd.Series(seeds, dtype="string")],
                ignore_index=True,
            )
        )
        n = len(uniq)
        es = codes[: len(df)]
        ed = codes[len(df): 2 * len(df)]
        seed_codes = codes[2 * len(df):]
        t = df["t"].to_numpy(dtype=np.int64)
        INF = np.int64(1 << 62)
        arr = np.full(n, INF, dtype=np.int64)
        arr[seed_codes] = 0
        for _ in range(max_rounds):
            cand = np.where(arr[es] < t, t, INF)
            new = arr.copy()
            np.minimum.at(new, ed, cand)
            if (new == arr).all():
                reach = arr < INF
                out = pd.DataFrame(
                    {
                        "node": pd.array(
                            np.asarray(uniq)[reach], dtype="string"
                        ),
                        "arrival": arr[reach],
                    }
                )
                return (
                    ray.data.from_pandas(out)
                    if len(out)
                    else ray.data.from_arrow(empty)
                )
            arr = new
        raise RuntimeError(
            f"temporal_reachability: still relaxing after {max_rounds} "
            "rounds — raise max_rounds for this contact set"
        )

    np_ = join_partitions(num_partitions)
    arrival = ray.data.from_pandas(
        pd.DataFrame(
            {"node": pd.array(seeds, dtype="string"),
             "arrival": np.zeros(len(seeds), dtype=np.int64)}
        )
    ).materialize()
    prev = (len(seeds), 0)
    e_src = e.map_batches(
        lambda df: df.rename(columns={"src": "node"}), batch_format="pandas"
    ).materialize()

    def relax(df: pd.DataFrame) -> pd.DataFrame:
        keep = df.loc[df["t"] > df["arrival"]]
        return pd.DataFrame(
            {
                "node": keep["dst"].astype("string"),
                "arrival": keep["t"].astype("int64"),
            }
        )

    def gmin(df: pd.DataFrame) -> pd.DataFrame:
        g = df.groupby("node", as_index=False, sort=False)["arrival"].min()
        return g.astype({"node": "string", "arrival": "int64"})

    for _ in range(max_rounds):
        cand = heal_schema(arrival, np_).join(
            heal_schema(e_src, np_), "inner", np_, on=("node",),
        ).map_batches(relax, batch_format="pandas")
        new = bucket_agg(
            arrival.union(cand), ["node"], gmin
        ).materialize()
        from ray.data.aggregate import Sum

        cur = (
            new.count(),
            int(new.aggregate(Sum("arrival"))["sum(arrival)"] or 0),
        )
        if cur == prev:
            return new
        arrival, prev = new, cur
    raise RuntimeError(
        f"temporal_reachability: still relaxing after {max_rounds} "
        "rounds — raise max_rounds for this contact set"
    )


def harmonic_table(
    edges: "ray.data.Dataset",
    seeds: list[str],
    *,
    reverse: bool = False,
    scale: int = 1_000_000,
    max_rounds: int = 64,
    max_driver_edges: int = 2_000_000,
) -> "ray.data.Dataset":
    """Sampled harmonic centrality + eccentricity: for each seed,
    harmonic_ppm = Σ over reached nodes v ≠ seed of (scale // dist(v))
    (integer floor terms — exact on both engine and SQL sides, unlike
    the float 1/d sum) and ecc = max dist (the seed's eccentricity
    restricted to its reachable set).  Harmonic centrality handles
    disconnected graphs gracefully where closeness does not — the
    standard companion metric.  Same single multi-source BFS as
    closeness_table, then a K-row aggregate (map-side partials +
    bucketed sum/max)."""
    pairs = multi_bfs_distances(
        edges,
        seeds,
        reverse=reverse,
        max_rounds=max_rounds,
        max_driver_edges=max_driver_edges,
    )

    def partial(df: pd.DataFrame) -> pd.DataFrame:
        d = df["dist"].to_numpy(dtype=np.int64)
        h = np.where(d > 0, scale // np.maximum(d, 1), 0)
        t = pd.DataFrame({"src": df["src"], "h": h, "ecc": d})
        g = t.groupby("src", sort=False).agg(
            harmonic_ppm=("h", "sum"), ecc=("ecc", "max")
        )
        return pd.DataFrame(
            {
                "src": pd.Series(g.index, dtype="string"),
                "harmonic_ppm": g["harmonic_ppm"].to_numpy().astype("int64"),
                "ecc": g["ecc"].to_numpy().astype("int64"),
            }
        )

    from ..util import bucket_agg

    def merge(df: pd.DataFrame) -> pd.DataFrame:
        g = df.groupby("src", sort=False).agg(
            harmonic_ppm=("harmonic_ppm", "sum"), ecc=("ecc", "max")
        )
        return pd.DataFrame(
            {
                "src": pd.Series(g.index, dtype="string"),
                "harmonic_ppm": g["harmonic_ppm"].to_numpy().astype("int64"),
                "ecc": g["ecc"].to_numpy().astype("int64"),
            }
        )

    out = bucket_agg(
        pairs.map_batches(partial, batch_format="pandas"), ["src"], merge
    )
    return out.sort("src")


# ---------------------------------------------------------------------------
# SPARQL property paths: one-or-more (p+) closure pairs + BGP integration
# ---------------------------------------------------------------------------

_CLOSURE_PAIR_CAP = 50_000_000  # loud bound on materialized closure size


def closure_pairs(
    edges: "ray.data.Dataset",
    *,
    max_iters: int = 64,
    max_driver_edges: int = 2_000_000,
    max_pairs: int = _CLOSURE_PAIR_CAP,
    num_partitions: int | None = None,
) -> "ray.data.Dataset":
    """Distinct transitive-closure PAIRS (subj reaches obj in ≥ 1 hop)
    of an edge table — the evaluation of a SPARQL ``p+`` property path
    (SPARQL 1.1 §18.4 ZeroOrMorePath minus the zero case).  Cycles are
    LEGAL here (unlike ancestor_closure): semi-naive iteration with an
    accumulated-pair dedup saturates on cyclic inputs.

    Size-adaptive like the other graph kernels: below
    ``max_driver_edges`` the factorized int64-pair-key loop runs on the
    driver (the ancestor_closure inner machinery, keeping pairs instead
    of digests); above it, semi-naive rounds run as distributed hash
    joins (delta ⋈ edges) with a bucketed anti-join against the
    accumulated pair set each round.  Either regime RAISES loudly past
    ``max_pairs`` — a p+ over a dense graph is quadratic output, and a
    silent OOM is worse than an explicit cap (callers constrain the
    path's endpoints first when the closure itself is the bottleneck)."""
    import pyarrow as pa

    from ..functions.kernel import distinct as _distinct
    from ..util import bucket_agg

    np_ = _nparts(num_partitions)

    def to_pairs(df: pd.DataFrame) -> pd.DataFrame:
        return pd.DataFrame(
            {
                "node": df["subj"].astype("string"),
                "dst": df["obj"].astype("string"),
            }
        ).drop_duplicates(ignore_index=True)

    pairs = edges.map_batches(to_pairs, batch_format="pandas").materialize()
    n_edges = pairs.count()
    empty = pa.schema([("subj", pa.string()), ("obj", pa.string())])
    if n_edges == 0:
        return ray.data.from_arrow(empty.empty_table())

    if n_edges <= max_driver_edges:
        e = pd.concat(
            list(pairs.iter_batches(batch_format="pandas", batch_size=65536)),
            ignore_index=True,
        ).drop_duplicates(ignore_index=True)
        both = pd.concat([e["node"], e["dst"]], ignore_index=True)
        codes, uniq = pd.factorize(both)
        n = len(uniq)
        if n >= (1 << 31):
            raise RuntimeError(
                "closure_pairs driver regime: node count exceeds the "
                "int64 pair-key domain; lower max_driver_edges"
            )
        src = codes[: len(e)].astype(np.int64)
        dst = codes[len(e):].astype(np.int64)
        order = np.argsort(src, kind="stable")
        e_src, e_dst = src[order], dst[order]
        bounds = np.searchsorted(e_src, np.arange(n + 1))
        acc = np.unique(src * n + dst)
        d_node, d_dst = src, dst
        for _ in range(max_iters):
            lo, hi = bounds[d_dst], bounds[d_dst + 1]
            fan = (hi - lo).astype(np.int64)
            if not fan.sum():
                break
            # fully-vectorized segment gather (the ancestor_closure
            # trick) — no per-delta-row Python list building
            rep = np.repeat(np.arange(len(d_node)), fan)
            idx = np.repeat(lo, fan) + (
                np.arange(fan.sum()) - np.repeat(np.cumsum(fan) - fan, fan)
            )
            cand = d_node[rep] * n + e_dst[idx]
            cand = np.unique(cand)
            new = cand[~np.isin(cand, acc, assume_unique=True)]
            if not len(new):
                break
            acc = np.union1d(acc, new)
            if len(acc) > max_pairs:
                raise RuntimeError(
                    f"closure_pairs exceeded max_pairs={max_pairs}: "
                    "constrain the path's endpoints or raise the cap"
                )
            d_node, d_dst = new // n, new % n
        else:
            raise RuntimeError(
                f"closure_pairs did not converge in {max_iters} rounds"
            )
        out = pd.DataFrame(
            {
                "subj": pd.array(uniq[(acc // n)], dtype="string"),
                "obj": pd.array(uniq[(acc % n)], dtype="string"),
            }
        )
        return ray.data.from_pandas(out)

    # distributed regime: semi-naive rounds of hash join + bucketed
    # anti-join vs the accumulated pair set
    edges_j = heal_schema(
        pairs.map_batches(
            lambda df: df.rename(columns={"node": "mid", "dst": "dst2"}),
            batch_format="pandas",
        ),
        np_,
    ).materialize()
    acc_ds = pairs.materialize()
    delta = acc_ds
    for _ in range(max_iters):
        ext = heal_schema(
            delta.map_batches(
                lambda df: df.rename(columns={"dst": "mid"}),
                batch_format="pandas",
            ),
            np_,
        ).join(edges_j, "inner", np_, on=("mid",))
        cand = _distinct(
            ext.map_batches(
                lambda df: pd.DataFrame(
                    {
                        "node": df["node"].astype("string"),
                        "dst": df["dst2"].astype("string"),
                    }
                ),
                batch_format="pandas",
            ),
            ["node", "dst"],
        )
        tagged = cand.map_batches(
            lambda df: df.assign(side=pd.array([1] * len(df), dtype="int64")),
            batch_format="pandas",
        ).union(
            acc_ds.map_batches(
                lambda df: df.assign(
                    side=pd.array([0] * len(df), dtype="int64")
                ),
                batch_format="pandas",
            )
        )

        def anti(df: pd.DataFrame) -> pd.DataFrame:
            seen = df.loc[df["side"] == 0, ["node", "dst"]]
            newer = df[df["side"] == 1].merge(
                seen, on=["node", "dst"], how="left", indicator=True
            )
            keep = newer[newer["_merge"] == "left_only"]
            return pd.DataFrame(
                {
                    "node": keep["node"].astype("string"),
                    "dst": keep["dst"].astype("string"),
                }
            )

        new_ds = bucket_agg(tagged, ["node", "dst"], anti).materialize()
        if new_ds.count() == 0:
            break
        acc_ds = acc_ds.union(new_ds).materialize()
        if acc_ds.count() > max_pairs:
            raise RuntimeError(
                f"closure_pairs exceeded max_pairs={max_pairs}: "
                "constrain the path's endpoints or raise the cap"
            )
        delta = new_ds
    else:
        raise RuntimeError(
            f"closure_pairs did not converge in {max_iters} rounds"
        )
    return acc_ds.map_batches(
        lambda df: df.rename(columns={"node": "subj", "dst": "obj"}),
        batch_format="pandas",
    )


def bgp_match_path(
    triples: "ray.data.Dataset",
    patterns: list[tuple[str, str, str]],
    *,
    num_partitions: int | None = None,
    closure_kwargs: dict | None = None,
) -> "ray.data.Dataset":
    """bgp_match extended with SPARQL one-or-more property paths: a
    pattern predicate ending in ``+`` (e.g. ``kgp:follows+``) matches
    the TRANSITIVE CLOSURE of that predicate's edges.  Each ``p+`` is
    evaluated once by :func:`closure_pairs` and materialized as
    synthetic triples under the literal ``p+`` predicate name; the
    conjunctive join plan is then exactly bgp_match's over the union —
    path patterns compose freely with ordinary patterns, OPTIONAL-free
    §18.4 semantics (no zero-hop case; use p? ∪ p+ upstream for p*).

    Alternation groups are supported: a predicate ``(p1|p2)+`` closes
    over the UNION of the alternatives' edge sets (SPARQL 1.1 §18.4
    AlternativePath under OneOrMorePath) — the closure kernel is
    identical, only the edge filter widens."""
    plus_preds = sorted(
        {p[:-1] for _, p, _ in patterns if not p.startswith("?") and p.endswith("+")}
    )
    base = triples.map_batches(
        lambda df: df[["subj", "pred", "obj", "obj_kind"]],
        batch_format="pandas",
    )
    parts = [base]
    for pred in plus_preds:
        alts = (
            tuple(pred[1:-1].split("|"))
            if pred.startswith("(") and pred.endswith(")")
            else (pred,)
        )
        e = triples.map_batches(
            lambda df, al=alts: df[
                df["pred"].isin(al) & (df["obj_kind"] == 0)
            ].reset_index(drop=True),
            batch_format="pandas",
        )
        cp = closure_pairs(
            e, num_partitions=num_partitions, **(closure_kwargs or {})
        )
        parts.append(
            cp.map_batches(
                lambda df, pr=pred: pd.DataFrame(
                    {
                        "subj": df["subj"].astype("string"),
                        "pred": pd.array([pr + "+"] * len(df), dtype="string"),
                        "obj": df["obj"].astype("string"),
                        "obj_kind": pd.array([0] * len(df), dtype="int8"),
                    }
                ),
                batch_format="pandas",
            )
        )
    merged = parts[0]
    for p_ in parts[1:]:
        merged = merged.union(p_)
    return bgp_match(merged, patterns, num_partitions=num_partitions)


def bgp_match_minus(
    triples: "ray.data.Dataset",
    patterns: list[tuple[str, str, str]],
    minus_patterns: list[tuple[str, str, str]],
    *,
    num_partitions: int | None = None,
) -> "ray.data.Dataset":
    """SPARQL MINUS (SPARQL 1.1 §18.5 Minus): keep each solution of
    ``patterns`` unless a solution of ``minus_patterns`` agrees on the
    shared variables.  BGP solutions bind every pattern variable, so
    compatibility degenerates to equality on the shared-variable tuple
    — one bucketed anti-join, the same partitioned existence pass as
    the relational anti/semi operator, never a broadcast of a
    corpus-scale solution set.  Per the spec's dom() rule, DISJOINT
    variable domains remove nothing: the left side passes through
    unchanged (that is MINUS's documented divergence from NOT EXISTS)."""
    from ..util import bucket_agg

    left = bgp_match(triples, patterns, num_partitions=num_partitions)
    lvars = _bgp_vars(patterns)
    rvars = _bgp_vars(minus_patterns)
    shared = [v for v in lvars if v in rvars]
    if not shared:
        return left
    right = bgp_match(triples, minus_patterns, num_partitions=num_partitions)

    def proj(df: pd.DataFrame) -> pd.DataFrame:
        out = df[shared].drop_duplicates(ignore_index=True)
        out["_side"] = pd.array([0] * len(out), dtype="int64")
        for v in lvars:
            if v not in out.columns:
                out[v] = pd.array([""] * len(out), dtype="string")
        return out[lvars + ["_side"]]

    def tag_left(df: pd.DataFrame) -> pd.DataFrame:
        out = df.copy()
        out["_side"] = pd.array([1] * len(out), dtype="int64")
        return out

    tagged = left.map_batches(tag_left, batch_format="pandas").union(
        right.map_batches(proj, batch_format="pandas")
    )

    def anti(df: pd.DataFrame) -> pd.DataFrame:
        kill = df.loc[df["_side"] == 0, shared].drop_duplicates()
        keep = df[df["_side"] == 1].merge(
            kill, on=shared, how="left", indicator=True
        )
        keep = keep[keep["_merge"] == "left_only"]
        return keep[lvars].reset_index(drop=True).astype("string")

    return bucket_agg(tagged, shared, anti)


def bgp_match_agg(
    triples: "ray.data.Dataset",
    patterns: list[tuple[str, str, str]],
    *,
    group_vars: list[str],
    count_as: str = "n",
    num_partitions: int | None = None,
) -> "ray.data.Dataset":
    """SPARQL SELECT-aggregate (SPARQL 1.1 §18.5 Group/Aggregation,
    COUNT(*) form): evaluate the BGP — property-path patterns included,
    via bgp_match_path — and count solutions per ``group_vars`` tuple.
    The count rides util.bucket_agg, so solution-scale groups never
    reach a Ray per-key aggregate; output columns are ``group_vars`` +
    ``count_as``."""
    from ..util import bucket_agg

    sol = bgp_match_path(triples, patterns, num_partitions=num_partitions)

    def cnt(df: pd.DataFrame) -> pd.DataFrame:
        g = df.groupby(group_vars, as_index=False, sort=False).size()
        g = g.rename(columns={"size": count_as})
        return g.astype({count_as: "int64"})

    return bucket_agg(sol, group_vars, cnt)


# ---------------------------------------------------------------------------
# node2vec-biased deterministic walks
# ---------------------------------------------------------------------------

# integer weight classes (node2vec p=4, q=1/4 up to the common x4 scale):
# backtracking discouraged, 2-hop exploration encouraged
_N2V_W_RETURN = 1
_N2V_W_BFS = 2
_N2V_W_DFS = 4


def _n2v_pick(cand: pd.DataFrame, step: int) -> pd.DataFrame:
    """Weighted deterministic pick: per walk, the candidate minimizing
    (md5_u64(walk|step|dst) // w, dst) — integer division by the weight
    class makes heavier candidates win proportionally more walks while
    staying bit-reproducible and SQL-replicable (same bulk-md5 contract
    as random_walks._pick).  ``cand`` columns: walk, prev, dst, w."""
    import hashlib

    if not len(cand):
        return pd.DataFrame(
            {
                "walk": pd.Series(dtype="string"),
                "prev": pd.Series(dtype="string"),
                "node": pd.Series(dtype="string"),
            }
        )
    md5 = hashlib.md5
    joined = (
        cand["walk"].astype("string") + f"|{step}|" + cand["dst"].astype("string")
    ).to_numpy()
    digs = b"".join([md5(s.encode("utf-8")).digest() for s in joined])
    h = np.frombuffer(digs, "<u8")[1::2]
    key = h // cand["w"].to_numpy("uint64")
    wcodes, wuniq = pd.factorize(cand["walk"])
    dcodes, duniq = pd.factorize(cand["dst"], sort=True)
    order = np.lexsort((dcodes, key, wcodes))
    ws = wcodes[order]
    first = np.ones(len(ws), dtype=bool)
    first[1:] = ws[1:] != ws[:-1]
    pick = order[first]
    # the PICKED node's predecessor for the next step is this step's cur
    return pd.DataFrame(
        {
            "walk": pd.array(np.asarray(wuniq)[wcodes[pick]], dtype="string"),
            "prev": cand["cur"].to_numpy()[pick],
            "node": pd.array(np.asarray(duniq)[dcodes[pick]], dtype="string"),
        }
    ).astype({"prev": "string"})


def _n2v_weights(cand: pd.DataFrame, e: pd.DataFrame) -> pd.DataFrame:
    """Attach the node2vec weight class: return (dst == prev), BFS
    (prev→dst is an edge), else DFS — one vectorized indicator merge."""
    m = cand.merge(
        e.rename(columns={"src": "prev", "dst": "dst"}),
        on=["prev", "dst"],
        how="left",
        indicator=True,
    )
    is_ret = (m["dst"] == m["prev"]).to_numpy()
    is_bfs = (m["_merge"] == "both").to_numpy() & ~is_ret
    w = np.where(is_ret, _N2V_W_RETURN, np.where(is_bfs, _N2V_W_BFS, _N2V_W_DFS))
    out = m.drop(columns=["_merge"]).copy()
    out["w"] = w.astype("int64")
    return out


def node2vec_walks(
    edges: "ray.data.Dataset",
    *,
    length: int = 4,
    starts: list[str] | None = None,
    max_driver_edges: int = 2_000_000,
) -> "ray.data.Dataset":
    """node2vec-biased deterministic walks (Grover & Leskovec 2016): the
    step distribution prefers 2-hop exploration over backtracking via
    the p/q weight classes (integer weights — see _N2V_W_*), with the
    same no-RNG md5 contract as :func:`random_walks` so every retry,
    cluster size and the DuckDB oracle agree bit-for-bit.  Step 1 has
    no predecessor and is uniform (all weights _N2V_W_DFS — a constant
    divisor preserves the hash order).

    Rows (walk, step, node), step 0 = start.  Size-adaptive: driver
    frames below ``max_driver_edges``; above it, each step is one hash
    join (frontier ⋈ edges) plus TWO bucketed passes — a
    (prev, dst)-bucketed tagged union that marks the BFS class against
    the edge set (no broadcast of a corpus-scale edge set), then the
    per-walk weighted argmin."""
    from ..util import bucket_agg

    def proj(d: pd.DataFrame) -> pd.DataFrame:
        return d[["subj", "obj"]].rename(columns={"subj": "src", "obj": "dst"})

    n_edges = edges.count()
    if n_edges <= max_driver_edges:
        e = pd.concat(
            list(
                edges.map_batches(proj, batch_format="pandas").iter_batches(
                    batch_format="pandas", batch_size=None
                )
            ),
            ignore_index=True,
        ).drop_duplicates()
        if starts is None:
            starts = sorted(set(e["src"]) | set(e["dst"]))
        rows = [
            pd.DataFrame(
                {
                    "walk": pd.Series(starts, dtype="string"),
                    "step": pd.Series([0] * len(starts), dtype="int64"),
                    "node": pd.Series(starts, dtype="string"),
                }
            )
        ]
        frontier = pd.DataFrame(
            {
                "walk": pd.Series(starts, dtype="string"),
                "prev": pd.Series([""] * len(starts), dtype="string"),
                "cur": pd.Series(starts, dtype="string"),
            }
        )
        for t in range(1, length + 1):
            cand = frontier.merge(e, left_on="cur", right_on="src")[
                ["walk", "prev", "cur", "dst"]
            ]
            if not len(cand):
                break
            nxt = _n2v_pick(_n2v_weights(cand, e), t)
            rows.append(nxt.assign(step=t)[["walk", "step", "node"]])
            frontier = nxt.rename(columns={"node": "cur"})[
                ["walk", "prev", "cur"]
            ]
            # the NEXT step's prev is THIS step's cur (already set by
            # _n2v_pick: prev column = the node we just left)
        out = pd.concat(rows, ignore_index=True)
        out["step"] = out["step"].astype("int64")
        return ray.data.from_pandas(
            out.sort_values(["walk", "step"], ignore_index=True)
        )

    np_ = _nparts(None)
    mat = edges.map_batches(proj, batch_format="pandas").materialize()
    if starts is None:
        from ..functions.kernel import distinct

        su = mat.map_batches(
            lambda df: pd.DataFrame(
                {
                    "walk": pd.concat(
                        [df["src"], df["dst"]], ignore_index=True
                    ).astype("string")
                }
            ).drop_duplicates(),
            batch_format="pandas",
        )
        start_ds = distinct(su, ["walk"]).materialize()
    else:
        start_ds = ray.data.from_pandas(
            pd.DataFrame({"walk": pd.Series(starts, dtype="string")})
        ).materialize()

    result = start_ds.map_batches(
        lambda df: pd.DataFrame(
            {
                "walk": df["walk"].astype("string"),
                "step": pd.Series(0, index=df.index, dtype="int64"),
                "node": df["walk"].astype("string"),
            }
        ),
        batch_format="pandas",
    )
    frontier = start_ds.map_batches(
        lambda df: pd.DataFrame(
            {
                "walk": df["walk"].astype("string"),
                "prev": pd.Series("", index=df.index, dtype="string"),
                "src": df["walk"].astype("string"),
            }
        ),
        batch_format="pandas",
    ).materialize()
    # Broadcast-prune gate for the per-step BFS-mark pass: the only
    # edges that can influence a candidate's weight class share their
    # (prev, dst) pair with some candidate, so src ∈ {frontier.prev}.
    # Below the cap we broadcast the hashed prev-set once per step and
    # filter the edge side MAP-SIDE (scan, no shuffle) — each step's
    # shuffle then moves candidate-scale rows, not the full edge set
    # (VERDICT r4 next-round #4).  Hash collisions only ADD edges (a
    # superset); the mark merges on the string pair, so results are
    # exact.  Above the cap (more walks than we can broadcast) fall
    # back to the full tagged union.
    max_broadcast_prevs = 2_000_000

    def _h64(s: pd.Series) -> np.ndarray:
        return pd.util.hash_pandas_object(
            s.astype("string"), index=False
        ).to_numpy(dtype="uint64")

    for t in range(1, length + 1):
        cand = heal_schema(frontier, np_).join(
            heal_schema(mat, np_), "inner", np_, on=("src",)
        )
        # mark the BFS class: tagged union bucketed on (prev, dst) —
        # candidate rows meet the edge rows that share their pair
        cand_t = cand.map_batches(
            lambda df: pd.DataFrame(
                {
                    "walk": df["walk"].astype("string"),
                    "cur": df["src"].astype("string"),
                    "prev": df["prev"].astype("string"),
                    "dst": df["dst"].astype("string"),
                    "side": pd.Series(1, index=df.index, dtype="int64"),
                }
            ),
            batch_format="pandas",
        )
        edge_src = mat
        if frontier.count() <= max_broadcast_prevs:
            hs = [
                h
                for b in frontier.map_batches(
                    lambda df: pd.DataFrame(
                        {"h": np.unique(_h64(df["prev"]))}
                    ),
                    batch_format="pandas",
                ).iter_batches(batch_format="pandas", batch_size=None)
                for h in (b["h"].to_numpy(dtype="uint64"),)
            ]
            pset_ref = ray.put(
                np.unique(np.concatenate(hs))
                if hs
                else np.empty(0, dtype="uint64")
            )

            def keep_frontier_src(df: pd.DataFrame, *, _ref=pset_ref):
                pset = ray.get(_ref)
                return df[np.isin(_h64(df["src"]), pset)]

            edge_src = mat.map_batches(
                keep_frontier_src, batch_format="pandas"
            )
        edge_t = edge_src.map_batches(
            lambda df: pd.DataFrame(
                {
                    "walk": pd.Series("", index=df.index, dtype="string"),
                    "cur": pd.Series("", index=df.index, dtype="string"),
                    "prev": df["src"].astype("string"),
                    "dst": df["dst"].astype("string"),
                    "side": pd.Series(0, index=df.index, dtype="int64"),
                }
            ),
            batch_format="pandas",
        )

        def mark(df: pd.DataFrame) -> pd.DataFrame:
            seen = df.loc[df["side"] == 0, ["prev", "dst"]].drop_duplicates()
            c = df[df["side"] == 1].merge(
                seen, on=["prev", "dst"], how="left", indicator=True
            )
            is_ret = (c["dst"] == c["prev"]).to_numpy()
            is_bfs = (c["_merge"] == "both").to_numpy() & ~is_ret
            w = np.where(
                is_ret, _N2V_W_RETURN,
                np.where(is_bfs, _N2V_W_BFS, _N2V_W_DFS),
            )
            out = c[["walk", "cur", "prev", "dst"]].copy()
            out["w"] = w.astype("int64")
            return out

        marked = bucket_agg(cand_t.union(edge_t), ["prev", "dst"], mark)
        nxt = bucket_agg(
            marked, ["walk"], lambda df, _t=t: _n2v_pick(df, _t)
        ).materialize()
        if nxt.count() == 0:
            break
        result = result.union(
            nxt.map_batches(
                lambda df, _t=t: pd.DataFrame(
                    {
                        "walk": df["walk"].astype("string"),
                        "step": pd.Series(_t, index=df.index, dtype="int64"),
                        "node": df["node"].astype("string"),
                    }
                ),
                batch_format="pandas",
            )
        )
        frontier = nxt.map_batches(
            lambda df: pd.DataFrame(
                {
                    "walk": df["walk"].astype("string"),
                    "prev": df["prev"].astype("string"),
                    "src": df["node"].astype("string"),
                }
            ),
            batch_format="pandas",
        ).materialize()
    return result


def sage_neighbor_sample(
    edges: "ray.data.Dataset",
    *,
    fanout: int = 3,
    num_layers: int = 2,
) -> "ray.data.Dataset":
    """GraphSAGE-style deterministic neighbor sampling (Hamilton et al.
    2017): per root node, up to ``fanout`` out-neighbors at layer 1,
    then up to ``fanout`` out-neighbors of EACH sampled node at layer 2
    (and so on) — the minibatch-expansion a GNN trainer runs per epoch,
    made reproducible with the walks' md5 convention: layer ℓ keeps the
    k candidates minimizing (md5_u64(root|ℓ|src|dst), dst), so the
    sample depends on the ROOT (different roots draw different
    neighborhoods through the same node, as epoch-seeded samplers do).

    Rows (root, layer, src, dst).  Fully streaming: hashes are computed
    map-side on the (frontier ⋈ edges) rows and each layer's top-k is
    one bucketed pass per (root, src) group — never a per-node Ray
    aggregate, no driver state beyond the layer counter."""
    import hashlib

    from ..util import bucket_agg

    def proj(d: pd.DataFrame) -> pd.DataFrame:
        return d[["subj", "obj"]].rename(columns={"subj": "src", "obj": "dst"})

    mat = edges.map_batches(proj, batch_format="pandas").materialize()
    np_ = _nparts(None)

    def topk(df: pd.DataFrame, layer: int) -> pd.DataFrame:
        md5 = hashlib.md5
        joined = (
            df["root"].astype("string")
            + f"|{layer}|"
            + df["src"].astype("string")
            + "|"
            + df["dst"].astype("string")
        ).to_numpy()
        digs = b"".join([md5(s.encode("utf-8")).digest() for s in joined])
        h = np.frombuffer(digs, "<u8")[1::2]
        gcodes, _ = pd.factorize(
            df["root"].astype(str) + "\x1f" + df["src"].astype(str)
        )
        dcodes, duniq = pd.factorize(df["dst"], sort=True)
        order = np.lexsort((dcodes, h, gcodes))
        gs = gcodes[order]
        rank = np.arange(len(gs))
        starts = np.ones(len(gs), dtype=bool)
        starts[1:] = gs[1:] != gs[:-1]
        rank = rank - np.maximum.accumulate(np.where(starts, rank, 0))
        keep = order[rank < fanout]
        return pd.DataFrame(
            {
                "root": df["root"].to_numpy()[keep],
                "src": df["src"].to_numpy()[keep],
                "dst": df["dst"].to_numpy()[keep],
            }
        ).astype("string")

    from ..functions.kernel import distinct

    roots = distinct(
        mat.map_batches(
            lambda df: pd.DataFrame(
                {
                    "root": pd.concat(
                        [df["src"], df["dst"]], ignore_index=True
                    ).astype("string")
                }
            ).drop_duplicates(),
            batch_format="pandas",
        ),
        ["root"],
    ).materialize()

    frontier = roots.map_batches(
        lambda df: pd.DataFrame(
            {"root": df["root"].astype("string"),
             "src": df["root"].astype("string")}
        ),
        batch_format="pandas",
    )
    out = None
    for layer in range(1, num_layers + 1):
        cand = heal_schema(frontier, np_).join(
            heal_schema(mat, np_), "inner", np_, on=("src",)
        )
        # distinct (root, src, dst): the frontier may reach one src via
        # several paths; the sample is per (root, src), not per path
        cand = distinct(
            cand.map_batches(
                lambda df: df[["root", "src", "dst"]].reset_index(drop=True),
                batch_format="pandas",
            ),
            ["root", "src", "dst"],
        )
        picked = bucket_agg(
            cand, ["root", "src"], lambda df, _l=layer: topk(df, _l)
        ).materialize()
        lay = picked.map_batches(
            lambda df, _l=layer: pd.DataFrame(
                {
                    "root": df["root"].astype("string"),
                    "layer": pd.Series(_l, index=df.index, dtype="int64"),
                    "src": df["src"].astype("string"),
                    "dst": df["dst"].astype("string"),
                }
            ),
            batch_format="pandas",
        )
        out = lay if out is None else out.union(lay)
        frontier = distinct(
            picked.map_batches(
                lambda df: pd.DataFrame(
                    {
                        "root": df["root"].astype("string"),
                        "src": df["dst"].astype("string"),
                    }
                ),
                batch_format="pandas",
            ),
            ["root", "src"],
        )
    return out
