"""IC-8 propSet accumulation quirk (ValidatorIC8.java:29-45): the slice-key
property set accumulates ACROSS DSDs, so an earlier DSD's key properties
are re-checked against every later DSD — producing the reference's extra
violations, which we reproduce deterministically (sorted DSD order)."""

import pyarrow as pa

import ray.data

from nospa_rdf_data_cube_validator_ray import CubeValidator
from nospa_rdf_data_cube_validator_ray.fixtures import HEADER


def two_dsd_cube() -> str:
    L = [HEADER]
    # dsdA: key skA with property pA — pA IS in dsdA's components (clean)
    L.append(
        "ex:dsdA a qb:DataStructureDefinition ;\n"
        "    qb:component [ qb:dimension ex:pA ], [ qb:measure ex:mA ] ;\n"
        "    qb:sliceKey ex:skA ."
    )
    L.append("ex:skA a qb:SliceKey ;\n    qb:componentProperty ex:pA .")
    # dsdB: key skB with property pB — pB IS in dsdB's components (clean)
    L.append(
        "ex:dsdB a qb:DataStructureDefinition ;\n"
        "    qb:component [ qb:dimension ex:pB ], [ qb:measure ex:mB ] ;\n"
        "    qb:sliceKey ex:skB ."
    )
    L.append("ex:skB a qb:SliceKey ;\n    qb:componentProperty ex:pB .")
    for p in ("pA", "pB"):
        L.append(f"ex:{p} a rdf:Property, qb:DimensionProperty ;\n    rdfs:range ex:T .")
    for m in ("mA", "mB"):
        L.append(f"ex:{m} a rdf:Property, qb:MeasureProperty .")
    return "\n\n".join(L) + "\n"


def test_ic8_accumulation_across_dsds():
    corpus = pa.table(
        {
            "repo": ["q"], "path": ["two.ttl"], "commit": ["c"],
            "lang": ["turtle"], "content": [two_dsd_cube()],
        }
    )
    v = CubeValidator(ray.data.from_arrow(corpus))
    df = v.findings_df()
    ic8 = sorted(df.loc[df["ic"] == "IC8", "subject"])
    # semantically both keys are clean, but the accumulated propSet makes
    # dsdB (processed second in sorted order) see skA's pA → pA flagged
    assert ic8 == ["<http://example.org/cube#pA>"]
