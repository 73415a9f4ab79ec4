"""Skew: one giant dataset (the north rule's 'salted-key handling for
skewed qb:Observation blocks').  The shuffle path's bucket key is
hash(graph, subj) — per-observation, so a single dataset with N
observations spreads uniformly over buckets; this test runs a 6,000-obs
single-dataset cube through BOTH paths and checks identical findings,
including the injected duplicates and missing-dimension violations."""

import pyarrow as pa
import pytest

import ray.data

from nospa_rdf_data_cube_validator_ray import CubeValidator
from nospa_rdf_data_cube_validator_ray.fixtures import HEADER


def giant_cube(n_obs: int = 6000) -> str:
    L = [HEADER]
    L.append("ex:gds a qb:DataSet ;\n    qb:structure ex:gdsd .")
    L.append(
        "ex:gdsd a qb:DataStructureDefinition ;\n"
        "    qb:component [ qb:dimension ex:gd1 ], [ qb:dimension ex:gd2 ],\n"
        "        [ qb:measure ex:gval ] ."
    )
    L.append("ex:gd1 a rdf:Property, qb:DimensionProperty ;\n    rdfs:range ex:A .")
    L.append("ex:gd2 a rdf:Property, qb:DimensionProperty ;\n    rdfs:range ex:B .")
    L.append("ex:gval a rdf:Property, qb:MeasureProperty ;\n    rdfs:range xsd:decimal .")
    for i in range(n_obs):
        a, b = i // 100, i % 100
        lines = [f"ex:go{i} a qb:Observation ;", "    qb:dataSet ex:gds ;"]
        if i % 97 == 0:
            pass  # missing gd1 → IC-11
        else:
            lines.append(f"    ex:gd1 ex:a{a} ;")
        lines.append(f"    ex:gd2 ex:b{b} ;")
        if i % 101 == 0 and i % 97 != 0:
            # duplicate of observation i at the same dim point → IC-12
            L.append(
                f"ex:go{i}dup a qb:Observation ;\n    qb:dataSet ex:gds ;\n"
                f"    ex:gd1 ex:a{a} ;\n    ex:gd2 ex:b{b} ;\n    ex:gval 0.1 ."
            )
        lines.append(f"    ex:gval {i}.5 .")
        L.append("\n".join(lines))
    return "\n\n".join(L) + "\n"


@pytest.fixture(scope="module")
def giant_corpus():
    return pa.table(
        {
            "repo": ["skew"],
            "path": ["giant.ttl"],
            "commit": ["c"],
            "lang": ["turtle"],
            "content": [giant_cube()],
        }
    )


def _findings(corpus, mode):
    v = CubeValidator(ray.data.from_arrow(corpus), num_buckets=16, mode=mode)
    df = v.findings_df().sort_values(["ic", "subject"]).reset_index(drop=True)
    df["detail"] = df["detail"].map(tuple)
    return df


def test_giant_dataset_both_paths(giant_corpus):
    local = _findings(giant_corpus, "local")
    shuffle = _findings(giant_corpus, "shuffle")

    n11 = len(local[local["ic"] == "IC11"])
    n12 = len(local[local["ic"] == "IC12"])
    assert n11 == len(range(0, 6000, 97))
    assert n12 == len([i for i in range(0, 6000, 101) if i % 97 != 0])
    # every IC-12 flag is the 'dup' twin (min-subject rule keeps the original)
    assert local[local["ic"] == "IC12"]["subject"].str.endswith("dup>").all()

    assert len(local) == len(shuffle)
    assert local[["ic", "subject", "detail"]].equals(
        shuffle[["ic", "subject", "detail"]]
    )
