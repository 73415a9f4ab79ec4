"""Graph-analytics stage (stages/graph.py): unit semantics on a
hand-built edge set plus regime parity for the size-adaptive BFS."""

import pandas as pd
import pytest

import ray.data

from nospa_rdf_data_cube_validator_ray.stages import graph as G


def _triples(rows):
    """rows: (subj, pred, obj_kind, obj) → triple Dataset with the parse
    schema columns the stage reads."""
    df = pd.DataFrame(
        {
            "subj": [r[0] for r in rows],
            "pred": [r[1] for r in rows],
            "obj_kind": pd.Series([r[2] for r in rows], dtype="int8"),
            "obj": [r[3] for r in rows],
        }
    )
    return ray.data.from_pandas(df)


RDF_TYPE = G.RDF_TYPE

#   a --p--> b --p--> c --q--> d,   b --q--> d,   lit ignored, type ignored
ROWS = [
    ("a", "p", 0, "b"),
    ("b", "p", 0, "c"),
    ("c", "q", 0, "d"),
    ("b", "q", 0, "d"),
    ("a", "q", 1, "some literal"),
    ("a", RDF_TYPE, 0, "T"),
]


def test_extract_edges_drops_types_and_literals():
    edges = G.extract_edges(_triples(ROWS)).to_pandas()
    assert len(edges) == 4
    assert set(edges["pred"]) == {"p", "q"}


def test_degree_table():
    deg = (
        G.degree_table(G.extract_edges(_triples(ROWS)))
        .to_pandas()
        .set_index("node")
    )
    assert deg.loc["a", "out_deg"] == 1 and deg.loc["a", "in_deg"] == 0
    assert deg.loc["b", "out_deg"] == 2 and deg.loc["b", "in_deg"] == 1
    assert deg.loc["d", "out_deg"] == 0 and deg.loc["d", "in_deg"] == 2


def test_path2_counts():
    p2 = G.path2_counts(G.extract_edges(_triples(ROWS))).to_pandas()
    got = {(r.p1, r.p2): r.n for r in p2.itertuples()}
    # a-p->b-p->c, a-p->b-q->d, b-p->c-q->d
    assert got == {("p", "p"): 1, ("p", "q"): 2}


def test_class_profile():
    rows = ROWS + [("b", RDF_TYPE, 0, "T"), ("d", RDF_TYPE, 0, "U")]
    prof = G.class_profile(_triples(rows)).set_index("cls")
    assert prof.loc["T", "n_instances"] == 2
    assert prof.loc["T", "n_out_edges"] == 3  # a:1 + b:2
    assert prof.loc["T", "n_distinct_preds"] == 2
    assert prof.loc["T", "max_out_degree"] == 2
    # d has no out edges: profile row still present, zeros
    assert prof.loc["U", "n_out_edges"] == 0
    assert prof.loc["U", "max_out_degree"] == 0


def _chain_edges(n=30):
    rows = [(f"v{i}", "next", 0, f"v{i+1}") for i in range(n)]
    rows += [("root", "p", 0, "v0"), ("root", "p", 0, "w0")]
    return G.extract_edges(_triples(rows))


def test_bfs_driver_regime():
    dist = (
        G.bfs_distances(_chain_edges(), ["root"])
        .to_pandas()
        .set_index("node")["dist"]
    )
    assert dist["root"] == 0
    assert dist["v0"] == 1 and dist["w0"] == 1
    assert dist["v29"] == 30 and dist["v30"] == 31


def test_bfs_regime_parity():
    # short chain: the distributed regime pays two shuffles per ROUND
    # (join + anti-join), so parity runs at depth 7, not 31
    edges = _chain_edges(6)
    a = G.bfs_distances(edges, ["root"]).to_pandas()
    b = G.bfs_distances(edges, ["root"], max_driver_edges=0).to_pandas()
    pd.testing.assert_frame_equal(a, b)


def test_bfs_reverse_and_max_rounds():
    edges = _chain_edges()
    back = (
        G.bfs_distances(edges, ["v5"], reverse=True)
        .to_pandas()
        .set_index("node")["dist"]
    )
    assert back["v0"] == 5 and back["root"] == 6 and "v6" not in back.index
    for mde in (2_000_000, 0):
        with pytest.raises(RuntimeError, match="max_rounds"):
            G.bfs_distances(edges, ["root"], max_rounds=3, max_driver_edges=mde)


def test_bfs_cycle_terminates():
    rows = [("a", "p", 0, "b"), ("b", "p", 0, "c"), ("c", "p", 0, "a")]
    dist = (
        G.bfs_distances(G.extract_edges(_triples(rows)), ["a"])
        .to_pandas()
        .set_index("node")["dist"]
    )
    assert dict(dist) == {"a": 0, "b": 1, "c": 2}


def test_bgp_optional_unbound_and_empty():
    rows = [
        ("a", "p", 0, "b"), ("b", "p", 0, "c"),  # chain: c has no successor
    ]
    t = _triples(rows)
    out = (
        G.bgp_match_optional(
            t, [("?x", "p", "?y")], [("?y", "p", "?z")]
        )
        .to_pandas()
        .set_index(["x", "y"])
    )
    assert out.loc[("a", "b"), "z"] == "c"
    assert out.loc[("b", "c"), "z"] == ""  # unbound → ''
    # optional that matches NOTHING: required rows survive, all unbound
    none = (
        G.bgp_match_optional(
            t, [("?x", "p", "?y")], [("?y", "qqq", "?z")]
        )
        .to_pandas()
    )
    assert len(none) == 2 and (none["z"] == "").all()
    # no shared variable → explicit error, not a cartesian product
    with pytest.raises(ValueError, match="shares no variable"):
        G.bgp_match_optional(t, [("?x", "p", "?y")], [("?u", "p", "?v")])


def test_bgp_union_pads_and_dedups():
    rows = [
        ("a", "p", 0, "b"), ("b", "q", 0, "c"),
        ("a", "q", 0, "b"),  # (a,b) solution reachable from BOTH branches
    ]
    t = _triples(rows)
    out = (
        G.bgp_match_union(t, [[("?x", "p", "?y")], [("?x", "q", "?y")]])
        .to_pandas()
        .sort_values(["x", "y"], ignore_index=True)
    )
    # distinct across branches: (a,b) appears once
    assert list(map(tuple, out.to_numpy())) == [("a", "b"), ("b", "c")]
    # branch-only variables pad with '' (SPARQL unbound rendering)
    padded = (
        G.bgp_match_union(
            t, [[("?x", "p", "?y")], [("?x", "q", "?z")]]
        )
        .to_pandas()
        .sort_values(["x", "y", "z"], ignore_index=True)
    )
    assert list(padded.columns) == ["x", "y", "z"]
    assert ("" == padded["z"]).sum() == 1 and ("" == padded["y"]).sum() == 2
    with pytest.raises(ValueError, match="non-empty"):
        G.bgp_match_union(t, [[("?x", "p", "?y")], []])


def test_bgp_filter_ops_and_validation():
    rows = [
        ("a1", "p", 0, "b1"), ("a2", "p", 0, "b2"), ("xx", "p", 0, "xx"),
    ]
    t = _triples(rows)
    out = (
        G.bgp_match_filter(
            t, [("?x", "p", "?y")],
            [("?x", "strstarts", "a"), ("?y", "regex", r"[12]$")],
        )
        .to_pandas()
        .sort_values("x", ignore_index=True)
    )
    assert list(out["x"]) == ["a1", "a2"]
    # var-var comparison
    eq = G.bgp_match_filter(
        t, [("?x", "p", "?y")], [("?x", "==", "?y")]
    ).to_pandas()
    assert list(eq["x"]) == ["xx"]
    lt = G.bgp_match_filter(
        t, [("?x", "p", "?y")], [("?x", "<", "?y")]
    ).to_pandas()
    assert set(lt["x"]) == {"a1", "a2"}  # lexical compare
    with pytest.raises(ValueError, match="not a bound variable"):
        G.bgp_match_filter(t, [("?x", "p", "?y")], [("?z", "==", "a")])
    with pytest.raises(ValueError, match="unknown filter op"):
        G.bgp_match_filter(t, [("?x", "p", "?y")], [("?x", "~", "a")])
    with pytest.raises(ValueError, match="constant pattern"):
        G.bgp_match_filter(t, [("?x", "p", "?y")], [("?x", "regex", "?y")])


def test_bfs_tree_parent_pointers():
    rows = [
        ("root", "p", 0, "a"), ("root", "p", 0, "b"),
        ("a", "p", 0, "c"), ("b", "p", 0, "c"),   # two parents → min wins
        ("c", "p", 0, "d"),
    ]
    t = (
        G.bfs_tree(G.extract_edges(_triples(rows)), "root")
        .to_pandas()
        .set_index("node")
    )
    assert t.loc["root", "parent"] == "" and t.loc["root", "dist"] == 0
    assert t.loc["c", "parent"] == "a" and t.loc["c", "dist"] == 2
    assert t.loc["d", "parent"] == "c" and t.loc["d", "dist"] == 3
    # every non-root parent is one hop closer
    nr = t[t.index != "root"]
    assert all(t.loc[p, "dist"] == d - 1 for p, d in zip(nr["parent"], nr["dist"]))


def test_multi_bfs_driver_regime():
    edges = _chain_edges(6)
    df = G.multi_bfs_distances(edges, ["root", "v3", "root"]).to_pandas()
    # duplicate seed collapses; each src column is its own BFS
    assert set(df["src"].unique()) == {"root", "v3"}
    d = df.set_index(["src", "node"])["dist"]
    assert d[("root", "root")] == 0 and d[("root", "v6")] == 7
    assert d[("v3", "v6")] == 3 and ("v3", "v0") not in d.index
    # per-seed slices equal the single-source walk
    single = G.bfs_distances(edges, ["v3"]).to_pandas()
    sub = (
        df[df["src"] == "v3"][["node", "dist"]]
        .sort_values(["dist", "node"])
        .reset_index(drop=True)
    )
    pd.testing.assert_frame_equal(sub, single)


def test_multi_bfs_regime_parity_and_closeness():
    edges = _chain_edges(6)
    seeds = ["root", "v3"]
    a = G.multi_bfs_distances(edges, seeds).to_pandas()
    b = G.multi_bfs_distances(edges, seeds, max_driver_edges=0).to_pandas()
    pd.testing.assert_frame_equal(a, b)
    c = G.closeness_table(edges, seeds).to_pandas().set_index("src")
    # root reaches root,w0,v0..v6 = 9 nodes; dist_sum = 0+1+(1..7)
    assert c.loc["root", "n_reached"] == 9
    assert c.loc["root", "dist_sum"] == 1 + sum(range(1, 8))
    assert c.loc["v3", "n_reached"] == 4  # v3,v4,v5,v6
    assert c.loc["v3", "dist_sum"] == 0 + 1 + 2 + 3
    with pytest.raises(RuntimeError, match="max_rounds"):
        G.multi_bfs_distances(edges, ["root"], max_rounds=3)


def test_pred_subsumption_known_graph():
    rows = [
        ("a", "p", 0, "x"), ("b", "p", 0, "x"), ("c", "p", 0, "x"),
        ("a", "q", 0, "x"), ("b", "q", 0, "x"),   # q-subjects ⊆ p-subjects
        ("c", "r", 0, "x"), ("d", "r", 0, "x"),   # r overlaps p on c only
    ]
    df = (
        G.pred_subsumption(_triples(rows))
        .to_pandas()
        .set_index(["pred_a", "pred_b"])
    )
    assert len(df) == 6  # 3 preds → 6 ordered pairs
    assert df.loc[("q", "p"), "contained"] == 1
    assert df.loc[("q", "p"), "n_a"] == 2 and df.loc[("q", "p"), "n_ab"] == 2
    assert df.loc[("p", "q"), "contained"] == 0  # 3 subjects vs overlap 2
    assert df.loc[("r", "p"), "n_ab"] == 1
    assert df.loc[("r", "q"), "n_ab"] == 0  # zero-overlap pair still a row


def test_property_cardinality_known_graph():
    rows = [
        ("a", "p1", 0, "b"), ("a", "p1", 0, "c"),          # max_out 2
        ("a", "p2", 0, "b"), ("c", "p2", 0, "b"),          # max_in 2
        ("a", "p3", 0, "b"), ("a", "p3", 0, "b"),          # duplicate triple
    ]
    df = (
        G.property_cardinality(_triples(rows))
        .to_pandas()
        .set_index("pred")
    )
    assert df.loc["p1", "n_triples"] == 2
    assert df.loc["p1", "n_subjects"] == 1 and df.loc["p1", "n_objects"] == 2
    assert df.loc["p1", "max_out_per_subj"] == 2
    assert df.loc["p1", "functional"] == 0
    assert df.loc["p1", "inverse_functional"] == 1
    assert df.loc["p2", "functional"] == 1
    assert df.loc["p2", "inverse_functional"] == 0
    # a duplicated (s, p, o) row is multiplicity 2 on both sides
    assert df.loc["p3", "max_out_per_subj"] == 2
    assert df.loc["p3", "max_in_per_obj"] == 2
    # rdf:type rows counted too: _triples emits no type rows here, so
    # exactly the three predicates appear
    assert set(df.index) == {"p1", "p2", "p3"}


def test_triangle_motifs_known_graph():
    rows = [
        # feed-forward triad on a,b,c: a→b, b→c, a→c
        ("a", "p", 0, "b"), ("b", "p", 0, "c"), ("a", "p", 0, "c"),
        # directed 3-cycle on x,y,z: x→y, y→z, z→x
        ("x", "p", 0, "y"), ("y", "p", 0, "z"), ("z", "p", 0, "x"),
    ]
    out = (
        G.triangle_motifs(G.extract_edges(_triples(rows)))
        .to_pandas()
        .set_index(["a", "b", "c"])
    )
    assert len(out) == 2
    assert out.loc[("a", "b", "c"), "mask"] == 1 + 4 + 32
    assert out.loc[("a", "b", "c"), "motif"] == "transitive"
    assert out.loc[("x", "y", "z"), "mask"] == 1 + 4 + 16
    assert out.loc[("x", "y", "z"), "motif"] == "cyclic"
    # reciprocal edge flips nothing unless it completes a rotation:
    # add c→a — now a→b→c→a is a full rotation
    rows.append(("c", "p", 0, "a"))
    out2 = (
        G.triangle_motifs(G.extract_edges(_triples(rows)))
        .to_pandas()
        .set_index(["a", "b", "c"])
    )
    assert out2.loc[("a", "b", "c"), "mask"] == 1 + 4 + 16 + 32
    assert out2.loc[("a", "b", "c"), "motif"] == "cyclic"


def test_triangle_enum_known_graph():
    # K4 minus one edge on {a,b,c,d}: triangles abc, abd (cd missing);
    # plus an isolated edge e-f and a self-loop g-g (ignored)
    rows = [
        ("a", "p", 0, "b"),
        ("b", "p", 0, "c"),
        ("a", "p", 0, "c"),
        ("d", "p", 0, "a"),   # direction must not matter
        ("b", "p", 0, "d"),
        ("e", "p", 0, "f"),
        ("g", "p", 0, "g"),
        ("a", "p", 0, "b"),   # duplicate edge must not double-count
    ]
    tri = (
        G.triangle_enum(G.extract_edges(_triples(rows)))
        .to_pandas()
        .sort_values(["a", "b", "c"], ignore_index=True)
    )
    assert [tuple(r) for r in tri.to_numpy()] == [
        ("a", "b", "c"),
        ("a", "b", "d"),
    ]


def test_triangle_enum_regime_parity():
    rows = [
        ("a", "p", 0, "b"),
        ("b", "p", 0, "c"),
        ("c", "p", 0, "a"),
        ("c", "p", 0, "d"),
        ("d", "p", 0, "a"),
    ]
    edges = G.extract_edges(_triples(rows))
    fast = (
        G.triangle_enum(edges).to_pandas().sort_values(["a", "b", "c"], ignore_index=True)
    )
    joined = (
        G.triangle_enum(edges, max_broadcast_nodes=0)
        .to_pandas()
        .sort_values(["a", "b", "c"], ignore_index=True)
    )
    pd.testing.assert_frame_equal(fast, joined)
    assert [tuple(r) for r in fast.to_numpy()] == [("a", "b", "c"), ("a", "c", "d")]


def test_pagerank_int_semantics():
    # star: a -> b, c -> b, b -> a ; hand-computed 1 iteration:
    # base = 150000; contrib(a)=contrib(c)=1000000, contrib(b)=1000000
    # pr1(b) = 150000 + 85*2000000//100 = 1850000
    # pr1(a) = 150000 + 85*1000000//100 = 1000000
    # pr1(c) = 150000 (no incoming)
    rows = [("a", "p", 0, "b"), ("c", "p", 0, "b"), ("b", "p", 0, "a")]
    pr = (
        G.pagerank_int(G.extract_edges(_triples(rows)), iters=1)
        .to_pandas()
        .set_index("node")["pr"]
    )
    assert dict(pr) == {"a": 1000000, "b": 1850000, "c": 150000}


def test_pagerank_int_regime_parity():
    rows = [
        ("a", "p", 0, "b"),
        ("b", "p", 0, "c"),
        ("c", "p", 0, "a"),
        ("a", "p", 0, "c"),
        ("d", "p", 0, "a"),
        ("a", "p", 0, "a"),  # self-loop
        ("a", "p", 0, "b"),  # multi-edge
    ]
    edges = G.extract_edges(_triples(rows))
    fast = G.pagerank_int(edges, iters=2).to_pandas().sort_values("node", ignore_index=True)
    dist = (
        G.pagerank_int(edges, iters=2, max_driver_edges=0)
        .to_pandas()
        .sort_values("node", ignore_index=True)
    )
    pd.testing.assert_frame_equal(fast, dist.astype(fast.dtypes.to_dict()))


def test_hits_int_semantics():
    # a -> b, c -> b, b -> a ; 1 iteration, scale 1e6:
    # a_raw: b = hub(a)+hub(c) = 2e6, a = hub(b) = 1e6; amax = 2e6
    # auth:  b = 1e6, a = 500000, c = 0
    # h_raw: a = auth(b) = 1e6, c = auth(b) = 1e6, b = auth(a) = 500000
    # hmax = 1e6 -> hub: a = 1e6, c = 1e6, b = 500000
    rows = [("a", "p", 0, "b"), ("c", "p", 0, "b"), ("b", "p", 0, "a")]
    out = (
        G.hits_int(G.extract_edges(_triples(rows)), iters=1)
        .to_pandas()
        .set_index("node")
    )
    assert dict(out["auth"]) == {"a": 500000, "b": 1000000, "c": 0}
    assert dict(out["hub"]) == {"a": 1000000, "b": 500000, "c": 1000000}


def test_hits_int_regime_parity():
    rows = [
        ("a", "p", 0, "b"),
        ("b", "p", 0, "c"),
        ("c", "p", 0, "a"),
        ("a", "p", 0, "c"),
        ("d", "p", 0, "a"),
        ("a", "p", 0, "a"),  # self-loop
        ("a", "p", 0, "b"),  # multi-edge (contributes twice)
    ]
    edges = G.extract_edges(_triples(rows))
    fast = G.hits_int(edges, iters=2).to_pandas().sort_values("node", ignore_index=True)
    dist = (
        G.hits_int(edges, iters=2, max_driver_edges=0)
        .to_pandas()
        .sort_values("node", ignore_index=True)
    )
    pd.testing.assert_frame_equal(fast, dist.astype(fast.dtypes.to_dict()))


def test_clustering_coeff():
    # triangle a-b-c plus pendant d on a:
    # deg: a=3, b=2, c=2, d=1 ; tri: a=b=c=1, d=0
    # coeff(a) = 2*1*1e6 // (3*2) = 333333 ; b,c = 1e6 ; d = 0
    rows = [
        ("a", "p", 0, "b"),
        ("b", "p", 0, "c"),
        ("c", "p", 0, "a"),
        ("a", "p", 0, "d"),
        ("b", "p", 0, "a"),  # reverse duplicate collapses
    ]
    out = (
        G.clustering_coeff(G.extract_edges(_triples(rows)))
        .to_pandas()
        .set_index("node")
    )
    assert dict(out["tri"]) == {"a": 1, "b": 1, "c": 1, "d": 0}
    assert dict(out["deg"]) == {"a": 3, "b": 2, "c": 2, "d": 1}
    assert dict(out["coeff_ppm"]) == {
        "a": 333333, "b": 1000000, "c": 1000000, "d": 0,
    }


def test_jaccard_link_scores():
    # square a-b-c-d-a: non-adjacent diagonals (a,c) and (b,d).
    # N(a)={b,d}, N(c)={b,d} → common=2, deg 2+2 → jac = 2e6 // 2 = 1e6
    rows = [
        ("a", "p", 0, "b"),
        ("b", "p", 0, "c"),
        ("c", "p", 0, "d"),
        ("d", "p", 0, "a"),
    ]
    out = (
        G.link_scores(G.extract_edges(_triples(rows)), jaccard=True)
        .to_pandas()
        .sort_values(["node_u", "node_w"], ignore_index=True)
    )
    assert out.to_dict("records") == [
        {"node_u": "a", "node_w": "c", "score": 1_000_000},
        {"node_u": "b", "node_w": "d", "score": 1_000_000},
    ]
    # pendant e on a shifts a's degree to 3: jac(a,c) = 2e6 // 3 = 666666
    out2 = (
        G.link_scores(
            G.extract_edges(_triples(rows + [("a", "p", 0, "e")])),
            jaccard=True,
        )
        .to_pandas()
        .set_index(["node_u", "node_w"])["score"]
    )
    assert out2[("a", "c")] == 666_666
    assert out2[("b", "d")] == 1_000_000


def test_four_cycle_counts():
    # square a-b-c-d-a: one 4-cycle, every node participates once;
    # pendant e on a participates in none (filtered out of the output)
    rows = [
        ("a", "p", 0, "b"),
        ("b", "p", 0, "c"),
        ("c", "p", 0, "d"),
        ("d", "p", 0, "a"),
        ("a", "p", 0, "e"),
    ]
    out = (
        G.four_cycle_counts(G.extract_edges(_triples(rows)))
        .to_pandas()
        .set_index("node")["n_c4"]
    )
    assert dict(out) == {"a": 1, "b": 1, "c": 1, "d": 1}
    # K4 has 3 distinct 4-cycles, each through all 4 nodes
    k4 = [
        ("a", "p", 0, "b"), ("a", "p", 0, "c"), ("a", "p", 0, "d"),
        ("b", "p", 0, "c"), ("b", "p", 0, "d"), ("c", "p", 0, "d"),
    ]
    out2 = (
        G.four_cycle_counts(G.extract_edges(_triples(k4)))
        .to_pandas()
        .set_index("node")["n_c4"]
    )
    assert dict(out2) == {"a": 3, "b": 3, "c": 3, "d": 3}


def test_four_cycle_counts_square_free_empty():
    # a path graph has no squares: typed empty, not a schema-less
    # Dataset (from_arrow(empty).to_pandas() drops columns, so assert
    # on the Dataset schema — the engine-side contract)
    rows = [("a", "p", 0, "b"), ("b", "p", 0, "c")]
    out = G.four_cycle_counts(G.extract_edges(_triples(rows)))
    assert out.count() == 0
    assert out.schema().names == ["node", "n_c4"]


def test_personalized_pagerank_regime_parity():
    # chain a -> b -> c with restart at {a}: mass flows strictly
    # downstream of the seed; c's only mass is damped 2-hop flow
    rows = [("a", "p", 0, "b"), ("b", "p", 0, "c")]
    edges = G.extract_edges(_triples(rows))
    fast = (
        G.pagerank_int(edges, iters=2, restart_nodes=["a"])
        .to_pandas()
        .sort_values("node", ignore_index=True)
    )
    dist = (
        G.pagerank_int(edges, iters=2, restart_nodes=["a"], max_driver_edges=0)
        .to_pandas()
        .sort_values("node", ignore_index=True)
    )
    pd.testing.assert_frame_equal(fast, dist.astype(fast.dtypes.to_dict()))
    pr = dict(zip(fast["node"], fast["pr"]))
    scale, base = 1_000_000, 150_000
    # hand-rolled integer PPR, 2 iterations
    p = {"a": scale, "b": 0, "c": 0}
    for _ in range(2):
        s = {"a": 0, "b": p["a"] // 1, "c": p["b"] // 1}
        p = {n: (base if n == "a" else 0) + 85 * s[n] // 100 for n in p}
    assert pr == p
    assert pr["a"] == base  # nothing points at the seed


def _contacts(rows):
    return ray.data.from_pandas(
        pd.DataFrame(
            {
                "src": [r[0] for r in rows],
                "dst": [r[1] for r in rows],
                "t": pd.Series([r[2] for r in rows], dtype="int64"),
            }
        )
    )


def test_temporal_reachability_respects_time():
    # a→b at 5, b→c at 3 (BEFORE b is reached): c unreachable;
    # b→d at 9 relays (9 > 5); a→e at 5 reached directly
    rows = [("a", "b", 5), ("b", "c", 3), ("b", "d", 9), ("a", "e", 5)]
    out = (
        G.temporal_reachability(_contacts(rows), ["a"])
        .to_pandas()
        .set_index("node")["arrival"]
    )
    assert dict(out) == {"a": 0, "b": 5, "d": 9, "e": 5}
    # strict increase: same-instant relay never happens
    same_t = [("a", "b", 5), ("b", "c", 5)]
    out2 = (
        G.temporal_reachability(_contacts(same_t), ["a"])
        .to_pandas()
        .set_index("node")["arrival"]
    )
    assert dict(out2) == {"a": 0, "b": 5}


def test_temporal_reachability_regime_parity():
    rows = [
        ("a", "b", 1), ("b", "c", 2), ("c", "d", 3),
        ("d", "a", 4), ("a", "c", 10), ("x", "y", 1),
    ]
    fast = (
        G.temporal_reachability(_contacts(rows), ["a"])
        .to_pandas()
        .sort_values("node", ignore_index=True)
    )
    dist = (
        G.temporal_reachability(_contacts(rows), ["a"], max_driver_edges=0)
        .to_pandas()
        .sort_values("node", ignore_index=True)
    )
    pd.testing.assert_frame_equal(fast, dist.astype(fast.dtypes.to_dict()))
    # earliest arrival wins: c is reached at 2 via b, not at 10 direct
    assert dict(zip(fast["node"], fast["arrival"]))["c"] == 2


def _edge_ds(pairs):
    return ray.data.from_pandas(
        pd.DataFrame(
            {"subj": [a for a, _ in pairs],
             "pred": "p",
             "obj": [b for _, b in pairs]}
        ).astype("string")
    )


def _brute_tree_betweenness(pairs):
    """Reference betweenness by path enumeration (forest: unique paths)."""
    import itertools

    parent = dict(pairs)
    nodes = sorted({x for p in pairs for x in p})

    def root_path(v):
        path = [v]
        while path[-1] in parent:
            path.append(parent[path[-1]])
        return path

    bet = {v: 0 for v in nodes}
    for s, t in itertools.combinations(nodes, 2):
        ps, pt = root_path(s), root_path(t)
        if ps[-1] != pt[-1]:
            continue  # different trees: no path
        ss, st = set(ps), set(pt)
        lca = next(x for x in ps if x in st)
        on_path = (set(ps[: ps.index(lca)]) | set(pt[: pt.index(lca)])
                   | {lca}) - {s, t}
        for v in on_path:
            bet[v] += 1
    return bet


def test_tree_betweenness_exact_and_parity():
    pairs = [
        ("b", "a"), ("c", "a"), ("d", "b"), ("e", "b"), ("f", "c"),
        ("y", "x"),  # second tree in the forest
    ]
    ds = _edge_ds(pairs)
    out = (
        G.tree_betweenness(ds)
        .to_pandas()
        .sort_values("node", ignore_index=True)
    )
    got = dict(zip(out["node"], out["betweenness"]))
    assert got == _brute_tree_betweenness(pairs)
    assert got["a"] == 6 and got["b"] == 7 and got["c"] == 4
    assert got["d"] == got["e"] == got["f"] == 0
    assert got["x"] == got["y"] == 0
    dist = (
        G.tree_betweenness(ds, max_driver_edges=0)
        .to_pandas()
        .sort_values("node", ignore_index=True)
    )
    pd.testing.assert_frame_equal(out, dist.astype(out.dtypes.to_dict()))


def test_tree_betweenness_rejects_non_forest_and_cycle():
    two_parents = _edge_ds([("b", "a"), ("b", "c")])
    with pytest.raises(RuntimeError, match="more than one parent"):
        G.tree_betweenness(two_parents)
    with pytest.raises(RuntimeError, match="more than one parent"):
        G.tree_betweenness(two_parents, max_driver_edges=0)
    cycle = _edge_ds([("a", "b"), ("b", "c"), ("c", "a")])
    with pytest.raises(RuntimeError, match="converge"):
        G.tree_betweenness(cycle, max_iters=5)
    with pytest.raises(RuntimeError, match="converge"):
        G.tree_betweenness(cycle, max_driver_edges=0, max_iters=5)


def test_closure_pairs_cycles_and_regime_parity():
    """p+ closure over cyclic input saturates (self-pairs through the
    cycle are reachable in >= 1 hop) and the driver / distributed
    regimes agree pair-for-pair."""
    import pandas as pd

    import ray.data
    from nospa_rdf_data_cube_validator_ray.stages.graph import closure_pairs

    edges = ray.data.from_pandas(
        pd.DataFrame(
            {
                "subj": pd.array(["a", "b", "c", "x", "y"], dtype="string"),
                "obj": pd.array(["b", "c", "a", "y", "x"], dtype="string"),
            }
        )
    )
    drv = closure_pairs(edges).to_pandas().sort_values(
        ["subj", "obj"], ignore_index=True
    )
    dist = closure_pairs(edges, max_driver_edges=0).to_pandas().sort_values(
        ["subj", "obj"], ignore_index=True
    )
    assert drv.equals(dist)
    got = set(map(tuple, drv.to_numpy()))
    tri = {"a", "b", "c"}
    assert {(u, v) for u in tri for v in tri} <= got  # 3-cycle saturates
    assert {("x", "x"), ("x", "y"), ("y", "x"), ("y", "y")} <= got


def test_bgp_match_path_composes_with_plain_patterns():
    import pandas as pd

    import ray.data
    from nospa_rdf_data_cube_validator_ray.stages.graph import bgp_match_path

    t = ray.data.from_pandas(
        pd.DataFrame(
            {
                "subj": pd.array(["o2", "o3", "o1"], dtype="string"),
                "pred": pd.array(["f", "f", "pb"], dtype="string"),
                "obj": pd.array(["o1", "o2", "cust"], dtype="string"),
                "obj_kind": pd.array([0, 0, 0], dtype="int8"),
            }
        )
    )
    out = (
        bgp_match_path(t, [("?a", "f+", "?b"), ("?b", "pb", "?c")])
        .to_pandas()
        .sort_values(["a", "b"], ignore_index=True)
    )
    # closure f+: o2->o1, o3->o2, o3->o1; only b=o1 has placedBy
    assert list(map(tuple, out.to_numpy())) == [
        ("o2", "o1", "cust"),
        ("o3", "o1", "cust"),
    ]


def test_bgp_minus_disjoint_domains_removes_nothing():
    """SPARQL MINUS with no shared variables keeps every left solution
    (the spec's dom() rule — the documented divergence from NOT
    EXISTS)."""
    import pandas as pd

    import ray.data
    from nospa_rdf_data_cube_validator_ray.stages.graph import (
        bgp_match, bgp_match_minus,
    )

    t = ray.data.from_pandas(
        pd.DataFrame(
            {
                "subj": pd.array(["a", "b"], dtype="string"),
                "pred": pd.array(["p", "q"], dtype="string"),
                "obj": pd.array(["x", "y"], dtype="string"),
                "obj_kind": pd.array([0, 0], dtype="int8"),
            }
        )
    )
    base = bgp_match(t, [("?s", "p", "?o")]).to_pandas()
    out = bgp_match_minus(
        t, [("?s", "p", "?o")], [("?u", "q", "?v")]
    ).to_pandas()
    assert len(out) == len(base) == 1
    # and a SHARED variable does remove: s=a matches u=a? no q-edge from a,
    # so nothing removed; but minus on ?o vs q-object y removes nothing,
    # while minus against p's own subject wipes the row
    wiped = bgp_match_minus(
        t, [("?s", "p", "?o")], [("?s", "p", "?o2")]
    ).to_pandas()
    assert len(wiped) == 0


def test_node2vec_regime_parity_and_bias():
    """node2vec_walks: driver and distributed regimes agree bit-for-bit,
    and the weight classes actually bias — the backtrack candidate's
    hash key divides by 1 while exploration divides by 4."""
    import pandas as pd

    import ray.data
    from nospa_rdf_data_cube_validator_ray.stages.graph import node2vec_walks

    edges = ray.data.from_pandas(
        pd.DataFrame(
            {
                "subj": pd.array(
                    ["a", "a", "b", "b", "c", "d", "e"], dtype="string"
                ),
                "obj": pd.array(
                    ["b", "c", "a", "d", "d", "e", "a"], dtype="string"
                ),
            }
        )
    )
    drv = node2vec_walks(edges, length=4).to_pandas().sort_values(
        ["walk", "step"], ignore_index=True
    )
    dist = node2vec_walks(
        edges, length=4, max_driver_edges=0
    ).to_pandas().sort_values(["walk", "step"], ignore_index=True)
    assert drv.equals(dist)
    # every step follows a real edge and no walk exceeds the length
    e = {("a", "b"), ("a", "c"), ("b", "a"), ("b", "d"),
         ("c", "d"), ("d", "e"), ("e", "a")}
    for walk, g in drv.groupby("walk"):
        nodes = list(g.sort_values("step")["node"])
        assert all((u, v) in e for u, v in zip(nodes, nodes[1:]))
        assert len(nodes) <= 5
