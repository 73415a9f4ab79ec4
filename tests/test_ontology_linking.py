"""Ontology + linking operators (stages/ontology, stages/linking):
closure regime parity, cycle detection, inference reconciliation
semantics, gazetteer matching vs brute force, and the co-occurrence
density cap."""

import pandas as pd
import pytest

import ray
import ray.data

from nospa_rdf_data_cube_validator_ray.stages.linking import (
    build_gazetteer,
    entity_cooccur,
    entity_mentions,
)
from nospa_rdf_data_cube_validator_ray.stages.ontology import (
    ancestor_closure,
    infer_types,
)


def _edges(pairs):
    return ray.data.from_pandas(
        pd.DataFrame(
            {
                "subj": pd.Series([a for a, _ in pairs], dtype="string"),
                "obj": pd.Series([b for _, b in pairs], dtype="string"),
            }
        )
    )


# a diamond + a chain: d ⊑ {b, c} ⊑ a ⊑ root; e ⊑ d
DIAMOND = [
    ("a", "root"),
    ("b", "a"),
    ("c", "a"),
    ("d", "b"),
    ("d", "c"),
    ("e", "d"),
]
EXPECT_ANC = {
    "a": {"root"},
    "b": {"a", "root"},
    "c": {"a", "root"},
    "d": {"b", "c", "a", "root"},
    "e": {"d", "b", "c", "a", "root"},
}


def _closure_df(ds):
    return (
        ds.to_pandas()
        .astype({"node": str, "anc_min": str})
        .sort_values("node", ignore_index=True)
    )


def test_ancestor_closure_driver_counts():
    out = _closure_df(ancestor_closure(_edges(DIAMOND)))
    got = dict(zip(out["node"], out["n_ancestors"]))
    assert got == {n: len(s) for n, s in EXPECT_ANC.items()}
    mins = dict(zip(out["node"], out["anc_min"]))
    assert mins == {n: min(s) for n, s in EXPECT_ANC.items()}


def test_ancestor_closure_regime_parity():
    drv = _closure_df(ancestor_closure(_edges(DIAMOND)))
    dist = _closure_df(
        ancestor_closure(_edges(DIAMOND), max_driver_edges=0, num_partitions=2)
    )
    pd.testing.assert_frame_equal(drv, dist)


@pytest.mark.parametrize("max_driver_edges", [2_000_000, 0])
def test_ancestor_closure_cycle_raises(max_driver_edges):
    cyc = [("a", "b"), ("b", "c"), ("c", "a")]
    with pytest.raises(RuntimeError, match="converge"):
        ancestor_closure(
            _edges(cyc),
            max_iters=8,
            max_driver_edges=max_driver_edges,
            num_partitions=2,
        ).materialize()


def test_ancestor_closure_empty():
    empty = _edges([]).filter(lambda r: False)
    assert ancestor_closure(empty).count() == 0


def _triples(type_rows):
    return ray.data.from_pandas(
        pd.DataFrame(
            {
                "subj": pd.Series([s for s, _ in type_rows], dtype="string"),
                "cls": pd.Series([c for _, c in type_rows], dtype="string"),
            }
        )
    )


def test_infer_types_new_and_conflict():
    # p declares domain X / range Y; n1 asserted X (match), n2 asserted
    # Z (conflict with X), n3 untyped (new via range Y)
    edges = ray.data.from_pandas(
        pd.DataFrame(
            {
                "subj": pd.Series(["n1", "n2"], dtype="string"),
                "pred": pd.Series(["p", "p"], dtype="string"),
                "obj": pd.Series(["n3", "n3"], dtype="string"),
            }
        )
    )
    types = _triples([("n1", "X"), ("n2", "Z")])
    out = (
        infer_types(edges, types, {"p": ("X", "Y")})
        .to_pandas()
        .astype({"cls": str})
        .set_index("cls")
    )
    assert out.loc["X", "n_inferred"] == 2
    assert out.loc["X", "n_new"] == 0
    assert out.loc["X", "n_conflict"] == 1  # n2 asserted Z, inferred X
    assert out.loc["Y", "n_inferred"] == 1
    assert out.loc["Y", "n_new"] == 1  # n3 has no asserted type
    assert out.loc["Y", "n_conflict"] == 0


def test_infer_types_none_sided_decl():
    # a range-only declaration must not infer a domain class
    edges = ray.data.from_pandas(
        pd.DataFrame(
            {
                "subj": pd.Series(["n1"], dtype="string"),
                "pred": pd.Series(["p"], dtype="string"),
                "obj": pd.Series(["n2"], dtype="string"),
            }
        )
    )
    out = infer_types(edges, _triples([]), {"p": (None, "Y")}).to_pandas()
    assert list(out["cls"]) == ["Y"]
    assert int(out["n_new"].iloc[0]) == 1


def _docs(rows):
    return ray.data.from_pandas(
        pd.DataFrame(
            {
                "doc_id": pd.Series([i for i, _ in rows], dtype="int64"),
                "text": pd.Series([t for _, t in rows], dtype="string"),
            }
        )
    )


def test_entity_mentions_brute_force():
    docs = _docs([(1, "cat dog cat bird"), (2, "dog dog fish"), (3, "")])
    gaz = build_gazetteer(docs, mod=1)  # every token is an entity
    out = entity_mentions(docs, gaz).to_pandas()
    got = {
        (int(r.doc_id), str(r.entity)): int(r.n_mentions)
        for r in out.itertuples()
    }
    assert got == {
        (1, "cat"): 2,
        (1, "dog"): 1,
        (1, "bird"): 1,
        (2, "dog"): 2,
        (2, "fish"): 1,
    }


def test_entity_cooccur_threshold():
    docs = _docs(
        [(1, "cat dog"), (2, "cat dog fish"), (3, "dog fish"), (4, "cat")]
    )
    m = entity_mentions(docs, build_gazetteer(docs, mod=1))
    out = entity_cooccur(m, min_count=2).to_pandas()
    got = {
        (str(r.ent_a), str(r.ent_b)): int(r.n) for r in out.itertuples()
    }
    # (cat, dog) in docs 1+2; (dog, fish) in docs 2+3; (cat, fish) only doc 2
    assert got == {("cat", "dog"): 2, ("dog", "fish"): 2}


def test_entity_cooccur_cap_raises():
    docs = _docs([(1, " ".join(f"t{i}" for i in range(20)))])
    m = entity_mentions(docs, build_gazetteer(docs, mod=1))
    with pytest.raises(RuntimeError, match="distinct"):
        entity_cooccur(m, max_entities_per_doc=10).materialize()


def test_triple_ids_dense_and_exact():
    from nospa_rdf_data_cube_validator_ray.stages.graph import triple_ids

    pairs = [("b", "a"), ("c", "a"), ("a", "d")]
    ds = ray.data.from_pandas(
        pd.DataFrame(
            {
                "subj": pd.Series([s for s, _ in pairs], dtype="string"),
                "pred": pd.Series(["q", "p", "p"], dtype="string"),
                "obj": pd.Series([o for _, o in pairs], dtype="string"),
            }
        )
    )
    out = (
        triple_ids(ds)
        .to_pandas()
        .sort_values(["h", "r", "t"], ignore_index=True)
    )
    # nodes sorted: a=0 b=1 c=2 d=3; preds sorted: p=0 q=1
    got = set(map(tuple, out[["h", "r", "t"]].to_numpy()))
    assert got == {(1, 1, 0), (2, 0, 0), (0, 0, 3)}


def test_shape_check_min_and_max_violations():
    from nospa_rdf_data_cube_validator_ray.stages.ontology import shape_check

    edges = ray.data.from_pandas(
        pd.DataFrame(
            {
                "subj": pd.Series(["n1", "n1", "n2"], dtype="string"),
                "pred": pd.Series(["p", "p", "p"], dtype="string"),
                "obj": pd.Series(["x", "y", "z"], dtype="string"),
            }
        )
    )
    types = ray.data.from_pandas(
        pd.DataFrame(
            {
                "subj": pd.Series(["n1", "n2", "n3"], dtype="string"),
                "cls": pd.Series(["C", "C", "C"], dtype="string"),
            }
        )
    )
    out = shape_check(edges, types, {"C": {"p": (1, 1)}}).to_pandas()
    got = {
        (str(r.node), int(r.n_found)) for r in out.itertuples()
    }
    # n1 has 2 (over max), n2 has 1 (ok), n3 has 0 (under min)
    assert got == {("n1", 2), ("n3", 0)}
    assert set(out["pred"].astype(str)) == {"p"}
    assert (out["expected_min"] == 1).all() and (out["expected_max"] == 1).all()
