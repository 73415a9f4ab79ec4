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


def test_spec_engine_raises_loud_on_oversize_graph():
    """VERDICT r3 #8: the SPARQL spec engine's shuffle path re-assembles a
    chunk-split graph into ONE worker frame; a graph beyond the per-worker
    row budget must raise the typed SpecGraphTooLargeError (pointing at the
    NOSPA bucketed pivot), never silently evaluate or OOM."""
    from nospa_rdf_data_cube_validator_ray import create_validator
    from nospa_rdf_data_cube_validator_ray.pipelines.sparql_validate import (
        SpecGraphTooLargeError,
    )

    v = create_validator(
        "SPARQL",
        corpus=ray.data.from_arrow(tiny_corpus()),
        mode="shuffle",
        spec_max_graph_rows=10,
    )
    with pytest.raises(Exception, match="SpecGraphTooLarge|NOSPA"):
        v.validate_all()

    # same corpus under the default budget validates fine
    v2 = create_validator(
        "SPARQL", corpus=ray.data.from_arrow(tiny_corpus()), mode="shuffle"
    )
    v2.validate_all()  # no raise; 50-triple graph is far under the cap
    assert SpecGraphTooLargeError.__doc__  # typed error is part of the API
