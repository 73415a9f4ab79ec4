"""IC-17 wildcard fallback: an observation with a multi-valued dimension
makes the reference's pairwise relation non-transitive
(ValidatorIC17.java:83 only compares dims where BOTH counts are 1), so the
group-count shortcut is invalid and the engine must fall back to exact
pairwise semantics for that dataset — in both execution modes."""

import pyarrow as pa
import pytest

import ray.data

from nospa_rdf_data_cube_validator_ray import CubeValidator
from nospa_rdf_data_cube_validator_ray.fixtures import HEADER


def wild_cube() -> str:
    L = [HEADER]
    L.append("ex:wds a qb:DataSet ;\n    qb:structure ex:wdsd .")
    L.append(
        "ex:wdsd a qb:DataStructureDefinition ;\n"
        "    qb:component [ qb:dimension ex:area ; qb:order 1 ],\n"
        "        [ qb:dimension qb:measureType ; qb:order 2 ],\n"
        "        [ qb:measure ex:life ], [ qb:measure ex:life2 ] ."
    )
    L.append("ex:area a rdf:Property, qb:DimensionProperty ;\n    rdfs:range ex:Area .")
    L.append(
        "<http://purl.org/linked-data/cube#measureType> a qb:DimensionProperty ;\n"
        "    rdfs:range qb:MeasureProperty ."
    )
    L.append("ex:life a rdf:Property, qb:MeasureProperty ;\n    rdfs:range xsd:decimal .")
    L.append("ex:life2 a rdf:Property, qb:MeasureProperty ;\n    rdfs:range xsd:decimal .")
    for ai, area in enumerate(("areaA", "areaB")):
        for mi, m in enumerate(("life", "life2")):
            L.append(
                f"ex:w{ai}_{mi} a qb:Observation ;\n    qb:dataSet ex:wds ;\n"
                f"    ex:area ex:{area} ;\n    qb:measureType ex:{m} ;\n"
                f"    ex:{m} {ai}{mi}.5 ."
            )
    # the wildcard: TWO area values → area is skipped when comparing with it
    L.append(
        "ex:wobs a qb:Observation ;\n    qb:dataSet ex:wds ;\n"
        "    ex:area ex:areaA, ex:areaB ;\n    qb:measureType ex:life ;\n"
        "    ex:life 9.5 ."
    )
    return "\n\n".join(L) + "\n"


@pytest.mark.parametrize("mode", ["local", "shuffle"])
def test_ic17_wildcard_pairwise(mode):
    corpus = pa.table(
        {
            "repo": ["w"], "path": ["wild.ttl"], "commit": ["c"],
            "lang": ["turtle"], "content": [wild_cube()],
        }
    )
    v = CubeValidator(ray.data.from_arrow(corpus), num_buckets=4, mode=mode)
    df = v.findings_df()
    ic17 = df[df["ic"] == "IC17"].set_index("subject")["detail"].map(list).to_dict()
    ex = "http://example.org/cube#"
    # each regular obs matches itself + its area-mate + the wildcard = 3 ≠ 2
    # measures (detail = total 5 − eq 3 = 2); the wildcard matches all 5
    assert ic17 == {
        f"<{ex}w0_0>": ["2"],
        f"<{ex}w0_1>": ["2"],
        f"<{ex}w1_0>": ["2"],
        f"<{ex}w1_1>": ["2"],
        f"<{ex}wobs>": ["0"],
    }
