"""Resumable run: partition skip on rerun, selective recompute, findings
parity with a direct validation."""

import json
import os

import pyarrow as pa
import pyarrow.parquet as pq

import ray.data

from nospa_rdf_data_cube_validator_ray import CubeValidator, fixtures
from nospa_rdf_data_cube_validator_ray.pipelines import checkpoint as cp


def shard_corpus(tmp_path, n_shards=4):
    t = fixtures.corpus_table()
    d = tmp_path / "corpus"
    d.mkdir()
    per = max(1, t.num_rows // n_shards)
    for i in range(0, t.num_rows, per):
        pq.write_table(t.slice(i, per), str(d / f"shard-{i // per:02d}.parquet"))
    return str(d)


def lineage(out_dir):
    out = {}
    for p in sorted(os.listdir(out_dir)):
        if p.startswith("part="):
            out[p] = json.load(open(os.path.join(out_dir, p, "_lineage.json")))
    return out


def test_resume_skips_completed_partitions(tmp_path):
    corpus = shard_corpus(tmp_path)
    out = str(tmp_path / "out")

    s1 = cp.run_resumable(corpus, out)
    assert s1["skipped"] == [] and len(s1["recomputed"]) == len(
        os.listdir(corpus)
    )
    l1 = lineage(out)
    assert all(rec["n_triples"] > 0 for rec in l1.values())

    # rerun: everything skipped, run ids unchanged
    s2 = cp.run_resumable(corpus, out)
    assert s2["recomputed"] == [] and len(s2["skipped"]) == s1["partitions"]
    assert lineage(out) == l1

    # invalidate ONE partition → only it recomputes
    victim = sorted(os.listdir(corpus))[1]
    stem = victim.removesuffix(".parquet")
    os.remove(os.path.join(out, f"part={stem}", "_lineage.json"))
    s3 = cp.run_resumable(corpus, out)
    assert s3["recomputed"] == [stem]
    l3 = lineage(out)
    assert l3[f"part={stem}"]["run_id"] != l1[f"part={stem}"]["run_id"]
    for k in l1:
        if k != f"part={stem}":
            assert l3[k]["run_id"] == l1[k]["run_id"]

    # findings across partitions == direct validation findings
    direct = (
        CubeValidator(ray.data.from_arrow(fixtures.corpus_table()))
        .findings_df()
        .sort_values(["graph", "ic", "subject"])
        .reset_index(drop=True)
    )
    parts = (
        cp.read_findings(out)
        .to_pandas()
        .sort_values(["graph", "ic", "subject"])
        .reset_index(drop=True)
    )
    direct["detail"] = direct["detail"].map(tuple)
    parts["detail"] = parts["detail"].map(lambda d: tuple(sorted(d)))
    assert len(direct) == len(parts)
    assert direct[["graph", "ic", "subject", "detail"]].equals(
        parts[["graph", "ic", "subject", "detail"]]
    )


def test_read_findings_clean_corpus_and_tmp_exclusion(tmp_path, ray_session):
    """A fully clean corpus (no findings anywhere) reads back as an empty
    findings Dataset; in-flight part=*.tmp dirs are never surfaced."""
    import os

    import pyarrow.parquet as pq

    from nospa_rdf_data_cube_validator_ray.fixtures import wf_cube
    from nospa_rdf_data_cube_validator_ray.pipelines.checkpoint import (
        read_findings,
        run_resumable,
    )

    corpus = tmp_path / "corpus"
    os.makedirs(corpus)
    content, _ = wf_cube()
    pq.write_table(
        pa.table(
            {"repo": ["r"], "path": ["wf.ttl"], "commit": ["c"],
             "lang": ["turtle"], "content": [content]}
        ),
        str(corpus / "s0.parquet"),
    )
    out = tmp_path / "out"
    summary = run_resumable(str(corpus), str(out))
    assert summary["findings"] == 0
    ds = read_findings(str(out))
    assert ds.count() == 0 and "ic" in ds.schema().names
    # a stale .tmp working dir must not be read
    os.makedirs(out / "part=zzz.tmp" / "findings")
    assert read_findings(str(out)).count() == 0


def test_checkpoint_dir_is_fresh_per_run(tmp_path, ray_session):
    """A reused checkpoint_dir must not append onto a stale checkpoint."""
    import ray.data

    from nospa_rdf_data_cube_validator_ray import CubeValidator
    from nospa_rdf_data_cube_validator_ray.fixtures import corpus_table

    ck = str(tmp_path / "ck")
    t = ray.data.from_arrow(corpus_table())
    n1 = CubeValidator(corpus=t, checkpoint_dir=ck).normalize().count()
    n2 = CubeValidator(corpus=t, checkpoint_dir=ck).normalize().count()
    assert n1 == n2  # second run over the same dir must not double


def test_checkpoint_dir_zero_rdf_corpus(tmp_path, ray_session):
    import ray.data

    from nospa_rdf_data_cube_validator_ray import CubeValidator

    t = pa.table(
        {"repo": ["r"], "path": ["x.py"], "commit": ["c"],
         "lang": ["python"], "content": ["print(1)"]}
    )
    v = CubeValidator(
        corpus=ray.data.from_arrow(t), checkpoint_dir=str(tmp_path / "ck0")
    )
    assert v.normalize().count() == 0
    assert len(v.findings_df()) == 0


def test_mode_local_rejects_unaligned_inputs(ray_session):
    import pytest
    import ray.data

    from nospa_rdf_data_cube_validator_ray import CubeValidator
    from nospa_rdf_data_cube_validator_ray.model import TRIPLE_SCHEMA

    empty = ray.data.from_arrow(
        pa.Table.from_arrays(
            [pa.array([], f.type) for f in TRIPLE_SCHEMA], schema=TRIPLE_SCHEMA
        )
    )
    with pytest.raises(ValueError, match="file-aligned"):
        CubeValidator(triples=empty, mode="local")


def test_validate_rejects_unknown_ic(ray_session):
    import pytest
    import ray.data

    from nospa_rdf_data_cube_validator_ray import CubeValidator
    from nospa_rdf_data_cube_validator_ray.fixtures import corpus_table

    v = CubeValidator(corpus=ray.data.from_arrow(corpus_table()))
    with pytest.raises(ValueError, match="IC1..IC21"):
        v.validate(["ic12"])


def test_report_scoped_ics_not_checked():
    import pandas as pd

    from nospa_rdf_data_cube_validator_ray.pipelines.report import render_markdown

    df = pd.DataFrame(
        {"graph": ["g"], "file_sha256": ["x"], "ic": ["IC12"],
         "subject": ["<s>"], "detail": [["d"]]}
    )
    md = render_markdown(df, ics=["IC12"])
    assert "## IC12" in md and "<s>" in md
    assert md.count("Not checked.") == 20  # the other 20 ICs did not run
    assert "Pass." not in md
