"""End-to-end: fixture corpus → CubeValidator → findings vs the
hand-derived expected violation maps (reference semantics, quirks incl.)."""

import ray.data
import pytest

from nospa_rdf_data_cube_validator_ray import CubeValidator
from nospa_rdf_data_cube_validator_ray import fixtures


@pytest.fixture(scope="module", params=["local", "shuffle"])
def findings_by_case(request):
    cases = fixtures.all_cases()
    corpus = fixtures.corpus_table(cases)
    v = CubeValidator(ray.data.from_arrow(corpus), num_buckets=8, mode=request.param)
    df = v.findings_df()
    out: dict[str, dict] = {name: {} for name in cases}
    for _, row in df.iterrows():
        case = row["graph"].split("\x1f")[1].removeprefix("cubes/").removesuffix(".ttl")
        out.setdefault(case, {}).setdefault(row["ic"], {})[row["subject"]] = sorted(row["detail"])
    return cases, out


@pytest.mark.parametrize("name", sorted(fixtures.all_cases().keys()))
def test_case(findings_by_case, name):
    cases, got = findings_by_case
    _content, expected = cases[name]
    assert got.get(name, {}) == expected, (
        f"case {name}: expected {expected}, got {got.get(name)}"
    )
