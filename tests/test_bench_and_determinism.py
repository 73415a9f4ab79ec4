"""Guards for the driver-facing artifacts: oracle corpora must be
byte-deterministic (the SQL oracles depend on it) and bench.py's suite
must run end-to-end."""

import sys

sys.path.insert(0, ".")

from nospa_rdf_data_cube_validator_ray import fixtures

SF = "/root/testdata/sf0.001"


def test_oracle_corpora_deterministic():
    for gen in (
        fixtures.tpch_cube_corpus,
        fixtures.tpch_mt_corpus,
        fixtures.tpch_slice_corpus,
        fixtures.tpch_schema_corpus,
    ):
        a, b = gen(SF), gen(SF)
        assert a.equals(b), gen.__name__
        assert a.num_rows > 0


def test_fixture_corpus_deterministic():
    assert fixtures.corpus_table().equals(fixtures.corpus_table())


def test_bench_headline_smoke(tmp_path, monkeypatch):
    import bench

    # redirect the corpus cache so the test never touches /tmp state
    monkeypatch.setattr(
        bench, "corpus_path",
        lambda sf_dir, n_shards=16, replicas=1: _mini_corpus(tmp_path),
    )
    out = bench.run_suite(SF, num_cpus=4, headline_only=True)
    assert out["unit"] == "sec" and out["value"] > 0
    assert out["triples"] > 0 and out["findings"] >= 0
    assert "cube_validate_all" in out["queries"]


def _mini_corpus(tmp_path):
    import pyarrow.parquet as pq

    d = tmp_path / "corpus"
    if not d.exists():
        d.mkdir()
        pq.write_table(fixtures.tpch_cube_corpus(SF, n_files=8), str(d / "p.parquet"))
    return str(d)
