"""Result sink / NT export / CLI / factory parity tests."""

import subprocess
import sys

import pyarrow.parquet as pq
import pytest

import ray.data

from nospa_rdf_data_cube_validator_ray import CubeValidator, create_validator, fixtures
from nospa_rdf_data_cube_validator_ray.pipelines.report import render_markdown
from nospa_rdf_data_cube_validator_ray.sources.rdf_parser import parse_ntriples
from nospa_rdf_data_cube_validator_ray.stages.export import write_ntriples


def test_report_render():
    v = CubeValidator(ray.data.from_arrow(fixtures.corpus_table()))
    df = v.findings_df()
    md = render_markdown(df)
    assert "# Validation results" in md
    assert "## IC12 — No duplicate observations" in md
    assert "o0_0b" in md  # the planted IC12 duplicate appears
    # a subset render shows "Pass." for the clean ICs
    md12 = render_markdown(df[df["ic"] == "IC12"])
    assert "Pass." in md12 and "o0_0b" in md12


def test_nt_export_roundtrip(tmp_path):
    v = CubeValidator(ray.data.from_arrow(fixtures.corpus_table()))
    norm = v.normalized_triples().materialize()
    files = write_ntriples(norm, str(tmp_path / "nt"))
    assert files
    triples = []
    for f in files:
        triples.extend(parse_ntriples(open(f).read()))
    assert len(triples) == norm.count()
    # the phase-1 derivation survives the round trip
    assert (
        "http://example.org/cube#ao1",
        "http://www.w3.org/1999/02/22-rdf-syntax-ns#type",
        0,
        "http://purl.org/linked-data/cube#Observation",
        "",
        "",
    ) in triples


def test_factory():
    v = create_validator("NOSPA", corpus=ray.data.from_arrow(fixtures.corpus_table()))
    assert isinstance(v, CubeValidator)
    with pytest.raises(ValueError):
        create_validator("JENA")


def test_cli_smoke(tmp_path):
    corpus = tmp_path / "corpus.parquet"
    pq.write_table(fixtures.corpus_table(), str(corpus))
    report = tmp_path / "out.md"
    p = subprocess.run(
        [
            sys.executable, "-m", "nospa_rdf_data_cube_validator_ray",
            str(corpus), "--report", str(report), "--ics", "IC12",
            "--num-cpus", "2",
        ],
        capture_output=True, text=True, timeout=300,
    )
    assert p.returncode == 0, p.stderr[-2000:]
    assert "validation finished in" in p.stdout
    md = report.read_text()
    assert "IC12" in md and "o0_0b" in md
