"""Property test: for RANDOM cubes (random dimensions, missing values,
duplicates, multi-valued dims, measure-type datasets), the zero-shuffle
local path and the bucketed shuffle path must emit identical findings.

Two independent execution strategies agreeing on arbitrary inputs is a
much stronger oracle than any fixed fixture."""

import random

import pyarrow as pa
import pytest

import ray.data

from nospa_rdf_data_cube_validator_ray import CubeValidator
from nospa_rdf_data_cube_validator_ray.fixtures import HEADER


def random_cube(rng: random.Random, fid: int) -> str:
    L = [HEADER]
    nd = rng.randint(1, 4)
    mt = rng.random() < 0.3
    dims = [f"rd{fid}_{i}" for i in range(nd)]
    comps = [f"[ qb:dimension ex:{d} ; qb:order {i+1} ]" for i, d in enumerate(dims)]
    if mt:
        comps.append("[ qb:dimension qb:measureType ]")
        comps.append("[ qb:measure ex:rm1 ]")
        comps.append("[ qb:measure ex:rm2 ]")
    else:
        comps.append("[ qb:measure ex:rm1 ]")
    if rng.random() < 0.5:
        comps.append('[ qb:attribute ex:ratt ; qb:componentRequired "true"^^xsd:boolean ]')
    L.append(f"ex:rds{fid} a qb:DataSet ;\n    qb:structure ex:rdsd{fid} .")
    L.append(
        f"ex:rdsd{fid} a qb:DataStructureDefinition ;\n    qb:component "
        + ",\n        ".join(comps) + " ."
    )
    for d in dims:
        L.append(f"ex:{d} a rdf:Property, qb:DimensionProperty ;\n    rdfs:range ex:T .")
    if mt:
        L.append(
            "<http://purl.org/linked-data/cube#measureType> a qb:DimensionProperty ;\n"
            "    rdfs:range qb:MeasureProperty ."
        )
        L.append("ex:rm2 a rdf:Property, qb:MeasureProperty .")
    L.append("ex:rm1 a rdf:Property, qb:MeasureProperty .")
    L.append("ex:ratt a rdf:Property, qb:AttributeProperty .")

    n_obs = rng.randint(3, 25)
    for i in range(n_obs):
        lines = [f"ex:ro{fid}_{i} a qb:Observation ;", f"    qb:dataSet ex:rds{fid} ;"]
        for d in dims:
            r = rng.random()
            if r < 0.15:
                continue  # missing dim → IC-11
            if r < 0.25:
                # multi-valued dim (IC-12 exclusion / IC-17 wildcard)
                lines.append(f"    ex:{d} ex:v{rng.randint(0, 2)}, ex:v{rng.randint(3, 5)} ;")
            else:
                lines.append(f"    ex:{d} ex:v{rng.randint(0, 2)} ;")
        if mt:
            r = rng.random()
            if r < 0.2:
                lines.append("    qb:measureType ex:rm1, ex:rm2 ;")  # IC-16
            elif r < 0.9:
                m = rng.choice(["rm1", "rm2"])
                lines.append(f"    qb:measureType ex:{m} ;")
                if rng.random() < 0.8:
                    lines.append(f"    ex:{m} {i}.5 ;")  # sometimes missing → IC-15
        if rng.random() < 0.7:
            lines.append(f'    ex:ratt "a{rng.randint(0, 1)}" ;')
        lines.append(f"    ex:rm1 {i}.25 .")
        L.append("\n".join(lines))
    return "\n\n".join(L) + "\n"


def test_mt_fixture_shuffle_parity():
    """The measureType oracle corpus (the IC-17-heavy fixture behind
    cube_mt_ic17) must emit IDENTICAL findings through mode="shuffle" —
    the streamed IC-17 finalize (finalize.fused_findings renders rows
    inside the shared bucketed map_groups) against the oracle-checked
    local path."""
    from nospa_rdf_data_cube_validator_ray import fixtures

    corpus = fixtures.tpch_mt_corpus("/root/testdata/sf0.001", n_files=8)

    def findings(mode):
        v = CubeValidator(ray.data.from_arrow(corpus), num_buckets=8, mode=mode)
        df = v.findings_df()
        df["detail"] = df["detail"].map(tuple)
        return df.sort_values(
            ["graph", "ic", "subject", "detail"]
        ).reset_index(drop=True)[["graph", "ic", "subject", "detail"]]

    local, shuffle = findings("local"), findings("shuffle")
    assert (local["ic"] == "IC17").sum() > 0  # fixture plants IC-17 hits
    assert local.equals(shuffle)


@pytest.mark.parametrize("seed", [11, 23, 37, 59, 71, 83, 97, 109])
def test_random_cube_mode_parity(seed):
    rng = random.Random(seed)
    rows = {"repo": [], "path": [], "commit": [], "lang": [], "content": []}
    for fid in range(rng.randint(2, 4)):
        rows["repo"].append("prop")
        rows["path"].append(f"r{seed}_{fid}.ttl")
        rows["commit"].append("c")
        rows["lang"].append("turtle")
        rows["content"].append(random_cube(rng, fid))
    corpus = pa.table({k: pa.array(v, pa.string()) for k, v in rows.items()})

    def findings(mode):
        v = CubeValidator(ray.data.from_arrow(corpus), num_buckets=8, mode=mode)
        df = v.findings_df().sort_values(
            ["graph", "ic", "subject"]
        ).reset_index(drop=True)
        df["detail"] = df["detail"].map(tuple)
        return df[["graph", "ic", "subject", "detail"]]

    local, shuffle = findings("local"), findings("shuffle")
    assert len(local) > 0  # the generator plants violations with high prob.
    if not local.equals(shuffle):
        only_l = local.merge(shuffle, how="left", indicator=True)
        only_l = only_l[only_l["_merge"] != "both"]
        only_s = shuffle.merge(local, how="left", indicator=True)
        only_s = only_s[only_s["_merge"] != "both"]
        raise AssertionError(
            f"mode divergence on seed {seed}:\nlocal only:\n{only_l}\n"
            f"shuffle only:\n{only_s}"
        )
