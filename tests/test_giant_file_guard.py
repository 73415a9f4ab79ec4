"""Local mode must refuse files whose triples would not fit one Arrow
block (the zero-shuffle invariant) and point at mode='shuffle'."""

import pyarrow as pa
import pytest

import ray.data

from nospa_rdf_data_cube_validator_ray import CubeValidator
from nospa_rdf_data_cube_validator_ray.sources.parse_stage import parse_corpus


def tiny_corpus():
    content = (
        "@prefix ex: <http://e.org/> .\n"
        + "\n".join(f"ex:s{i} ex:p ex:o{i} ." for i in range(50))
    )
    return pa.table(
        {
            "repo": ["r"], "path": ["big.ttl"], "commit": ["c"],
            "lang": ["turtle"], "content": [content],
        }
    )


def test_guard_triggers():
    ds = ray.data.from_arrow(tiny_corpus())
    with pytest.raises(Exception, match="mode='shuffle'"):
        parse_corpus(ds, max_triples_per_file=10).count()


def test_shuffle_mode_has_no_guard():
    v = CubeValidator(ray.data.from_arrow(tiny_corpus()), mode="shuffle")
    assert v.normalize().count() == 50
