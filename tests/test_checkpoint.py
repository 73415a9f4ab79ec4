"""Resumable run: partition skip on rerun, selective recompute, findings
parity with a direct validation."""

import json
import os

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
