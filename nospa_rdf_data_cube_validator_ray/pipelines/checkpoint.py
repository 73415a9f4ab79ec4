"""Resumable validation runs: per-partition output layout + lineage.

North-rule requirement: "resumable from checkpoint with per-partition
lineage + metrics".  Layout:

    out_dir/
      part=<stem>/            one partition per input corpus shard
        findings/*.parquet    the partition's findings Dataset
        _lineage.json         input file, sizes, row/triple/finding counts,
                              content fingerprint, wall seconds, run id

A rerun skips every partition whose ``_lineage.json`` exists and whose
input fingerprint still matches (file size + mtime + path); a crashed or
invalidated partition is recomputed alone.  Partition writes are atomic
(tmp dir + rename, lineage written last), so a kill mid-partition never
leaves a partition that looks complete.

On a multi-node cluster the unit of resume stays the input shard: each
partition is its own streaming Dataset pipeline (read → parse → index →
local check → write), so intra-partition parallelism uses the whole
cluster while the driver loop only sequences shard-sized chunks.
"""

from __future__ import annotations

import json
import os
import shutil
import time
import uuid

import ray.data

from .validate import CubeValidator


def _fingerprint(path: str) -> dict:
    st = os.stat(path)
    return {"path": path, "bytes": st.st_size, "mtime": st.st_mtime}


def _partition_done(part_dir: str, fp: dict) -> bool:
    lineage = os.path.join(part_dir, "_lineage.json")
    if not os.path.exists(lineage):
        return False
    try:
        rec = json.load(open(lineage))
    except (OSError, json.JSONDecodeError):
        return False
    return rec.get("input") == fp


def run_resumable(
    corpus_dir: str,
    out_dir: str,
    *,
    num_buckets: int = 64,
    force: bool = False,
) -> dict:
    """Validate every parquet shard under ``corpus_dir``; returns a summary
    {partitions, skipped, recomputed, findings}."""
    shards = sorted(
        os.path.join(corpus_dir, f)
        for f in os.listdir(corpus_dir)
        if f.endswith(".parquet")
    )
    if not shards:
        raise ValueError(f"no parquet shards under {corpus_dir}")
    os.makedirs(out_dir, exist_ok=True)

    skipped, recomputed = [], []
    total_findings = 0
    for shard in shards:
        stem = os.path.splitext(os.path.basename(shard))[0]
        part_dir = os.path.join(out_dir, f"part={stem}")
        fp = _fingerprint(shard)
        if not force and _partition_done(part_dir, fp):
            rec = json.load(open(os.path.join(part_dir, "_lineage.json")))
            total_findings += rec["n_findings"]
            skipped.append(stem)
            continue

        t0 = time.perf_counter()
        v = CubeValidator(corpus_path=shard, num_buckets=num_buckets)
        n_triples = v.normalize().count()
        findings = v.validate_all()
        n_findings = findings.count()

        tmp = part_dir + ".tmp"
        if os.path.exists(tmp):
            shutil.rmtree(tmp)
        os.makedirs(os.path.join(tmp, "findings"))
        findings.write_parquet(os.path.join(tmp, "findings"))
        rec = {
            "run_id": uuid.uuid4().hex,
            "input": fp,
            "n_triples": n_triples,
            "n_findings": n_findings,
            "wall_s": round(time.perf_counter() - t0, 3),
        }
        with open(os.path.join(tmp, "_lineage.json"), "w") as f:
            json.dump(rec, f, indent=2)
        if os.path.exists(part_dir):
            shutil.rmtree(part_dir)
        os.rename(tmp, part_dir)
        total_findings += n_findings
        recomputed.append(stem)

    return {
        "partitions": len(shards),
        "skipped": skipped,
        "recomputed": recomputed,
        "findings": total_findings,
    }


def read_findings(out_dir: str) -> "ray.data.Dataset":
    import glob

    files = sorted(
        f
        for d in os.listdir(out_dir)
        if d.startswith("part=")
        for f in glob.glob(os.path.join(out_dir, d, "findings", "*.parquet"))
    )
    return ray.data.read_parquet(files)
