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


def test_local_path_raises_on_graph_spanning_blocks():
    """Round-4 sf0.1 sweep regression: a graph split across Arrow blocks
    silently corrupts every per-block check, so the local path must fail
    loud.  Split one graph across two from_arrow blocks → raise."""
    from nospa_rdf_data_cube_validator_ray.pipelines.validate import (
        assert_graph_block_alignment,
    )

    def tri_block(graph, n):
        return pa.table(
            {
                "graph": pa.array([graph] * n),
                "file_sha256": pa.array(["s"] * n),
                "subj": pa.array([f"http://e/{i}" for i in range(n)]),
                "pred": pa.array(["http://e/p"] * n),
                "obj_kind": pa.array([0] * n, pa.int8()),
                "obj": pa.array(["http://e/o"] * n),
                "obj_dt": pa.array([""] * n),
                "obj_lang": pa.array([""] * n),
            }
        )

    aligned = ray.data.from_arrow([tri_block("g1", 5), tri_block("g2", 5)])
    assert_graph_block_alignment(aligned)  # no raise
    split = ray.data.from_arrow([tri_block("g1", 5), tri_block("g1", 5)])
    with pytest.raises(RuntimeError, match="span multiple Arrow blocks"):
        assert_graph_block_alignment(split)


def test_phase1_oversize_block_yields_graph_aligned_batches():
    """phase1_augment_aligned must cut an oversize block at graph-run
    boundaries BEFORE augmenting, so every yielded batch is graph-pure
    and carries its own derivations."""
    import ray.data as rd

    from nospa_rdf_data_cube_validator_ray.sources.rdf_parser import (
        parse_turtle,
    )
    from nospa_rdf_data_cube_validator_ray.stages.normalize import (
        phase1_augment_aligned,
    )

    ttl = (
        "@prefix qb: <http://purl.org/linked-data/cube#> .\n"
        "@prefix ex: <http://e/> .\n"
        "ex:d qb:structure ex:dsd .\n"
        "ex:o1 qb:dataSet ex:d .\n"
    )
    rows = []
    for g in ("gA", "gB", "gC"):
        for s, p, k, o, dt, lg in parse_turtle(ttl):
            rows.append((g, "sha", s, p, k, o, dt, lg))
    cols = list(zip(*rows))
    batch = pa.table(
        {
            "graph": pa.array(cols[0]),
            "file_sha256": pa.array(cols[1]),
            "subj": pa.array(cols[2]),
            "pred": pa.array(cols[3]),
            "obj_kind": pa.array(cols[4], pa.int8()),
            "obj": pa.array(cols[5]),
            "obj_dt": pa.array(cols[6]),
            "obj_lang": pa.array(cols[7]),
        }
    )
    ctx = rd.DataContext.get_current()
    old = ctx.target_max_block_size
    ctx.target_max_block_size = 64  # force the per-graph path
    try:
        got = list(phase1_augment_aligned(batch))
    finally:
        ctx.target_max_block_size = old
    assert len(got) == 3
    for t, g in zip(got, ("gA", "gB", "gC")):
        graphs = set(t.column("graph").to_pylist())
        assert graphs == {g}
        # each slice carries its OWN phase-1 derivations (qb:dataSet →
        # rdf:type Observation/DataSet), not another graph's
        assert t.num_rows > 2
