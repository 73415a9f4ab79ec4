"""Stream-scale graph-kernel tests (functions/kernel.py) — the distributed
twins of ValidatorBase's HashMap search functions."""

import pandas as pd

import ray.data

from nospa_rdf_data_cube_validator_ray.functions import kernel as K


def triples_ds():
    rows = [
        # graph g1: chain a -p-> b -p-> c, plus a -q-> x
        ("g1", "a", "p", "b"), ("g1", "b", "p", "c"), ("g1", "a", "q", "x"),
        # cycle: c -p-> a  (reference's BFS would never terminate)
        ("g1", "c", "p", "a"),
        # graph g2: same node names, different edges (per-graph isolation)
        ("g2", "a", "p", "z"),
    ]
    df = pd.DataFrame(rows, columns=["graph", "subj", "pred", "obj"])
    df["file_sha256"] = "s"
    df["obj_kind"] = 0
    df["obj_dt"] = ""
    df["obj_lang"] = ""
    return ray.data.from_pandas(df)


def test_path_visit_two_hops():
    out = K.path_visit(triples_ds(), ["p", "p"]).to_pandas()
    got = {(g, s, e) for g, s, e in zip(out["graph"], out["start"], out["end"])}
    # path ENDS are term strings (LocalGraph.path_visit parity)
    assert got == {("g1", "a", "<c>"), ("g1", "b", "<a>"), ("g1", "c", "<b>")}


def test_star_pairs():
    out = K.star_pairs(triples_ds(), "p", "q").to_pandas()
    got = {(g, a, b) for g, a, b in zip(out["graph"], out["a"], out["b"])}
    assert got == {("g1", "b", "x")}


def test_reachable_cycle_safe():
    roots = ray.data.from_pandas(pd.DataFrame({"graph": ["g1"], "node": ["a"]}))
    out = K.reachable(triples_ds(), "p", roots).to_pandas()
    got = {(g, n) for g, n in zip(out["graph"], out["node"])}
    assert got == {("g1", "a"), ("g1", "b"), ("g1", "c")}  # terminates on cycle


def test_reachable_inverse():
    roots = ray.data.from_pandas(pd.DataFrame({"graph": ["g1"], "node": ["c"]}))
    out = K.reachable(triples_ds(), "p", roots, direction="inverse").to_pandas()
    got = {(g, n) for g, n in zip(out["graph"], out["node"])}
    assert got == {("g1", "c"), ("g1", "b"), ("g1", "a")}


def test_semi_joins():
    t = triples_ds()
    objs = K.objects_of(t, "p", {("g1", "a"), ("g2", "a")}).to_pandas()
    assert {(g, o) for g, o in zip(objs["graph"], objs["obj"])} == {
        ("g1", "<b>"), ("g2", "<z>"),
    }
    # objects are compared as TERM strings (literal-valued props work)
    subs = K.subjects_with(t, "p", {("g1", "<a>")}).to_pandas()
    assert {(g, s) for g, s in zip(subs["graph"], subs["subj"])} == {("g1", "c")}


def test_semi_joins_literal_objects():
    """Literal-valued properties flow through the stream kernels (Jena's
    listObjects/listSubjects do not filter literals)."""
    rows = [
        ("g1", "s1", "req", 2, "true", "http://www.w3.org/2001/XMLSchema#boolean", ""),
        ("g1", "s2", "req", 2, "false", "http://www.w3.org/2001/XMLSchema#boolean", ""),
    ]
    df = pd.DataFrame(
        rows,
        columns=["graph", "subj", "pred", "obj_kind", "obj", "obj_dt", "obj_lang"],
    )
    df["file_sha256"] = "s"
    t = ray.data.from_pandas(df[["graph", "file_sha256", "subj", "pred",
                                 "obj_kind", "obj", "obj_dt", "obj_lang"]])
    term = '"true"^^<http://www.w3.org/2001/XMLSchema#boolean>'
    subs = K.subjects_with(t, "req", {("g1", term)}).to_pandas()
    assert set(subs["subj"]) == {"s1"}
    objs = K.objects_of(t, "req", {("g1", "s2")}).to_pandas()
    assert set(objs["obj"]) == {'"false"^^<http://www.w3.org/2001/XMLSchema#boolean>'}


def test_reachable_max_hops_exhaustion_raises():
    import pytest

    roots = ray.data.from_pandas(pd.DataFrame({"graph": ["g1"], "node": ["a"]}))
    with pytest.raises(RuntimeError, match="max_hops"):
        K.reachable(triples_ds(), "p", roots, max_hops=1)


def test_reachable_join_fallback_parity():
    """A closure bigger than ``max_driver_nodes`` switches to the join
    formulation (VERDICT r3 #3) — same rows as the driver regime, on the
    cyclic fixture, forward and inverse, plus the max_hops raise."""
    import pytest

    roots = ray.data.from_pandas(pd.DataFrame({"graph": ["g1"], "node": ["a"]}))
    for direction in ("forward", "inverse"):
        want = K.reachable(
            triples_ds(), "p", roots, direction=direction
        ).to_pandas()
        got = K.reachable(
            triples_ds(), "p", roots, direction=direction, max_driver_nodes=1
        ).to_pandas()
        assert sorted(zip(got["graph"], got["node"])) == sorted(
            zip(want["graph"], want["node"])
        )
    with pytest.raises(RuntimeError, match="max_hops"):
        K.reachable(
            triples_ds(), "p", roots, max_hops=1, max_driver_nodes=1
        )


def test_reachable_join_fallback_empty_closure():
    """Join regime on a root with no outgoing pred edges → 0 rows with
    the (graph, node) schema (not a schema-less empty)."""
    roots = ray.data.from_pandas(pd.DataFrame({"graph": ["g1"], "node": ["x"]}))
    out = K.reachable(
        triples_ds(), "p", roots, max_driver_nodes=1
    ).to_pandas()
    assert len(out) == 0
