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


def _partition_record(part_dir: str, fp: dict) -> dict | None:
    """The partition's lineage record iff it exists and its input
    fingerprint still matches; None otherwise (one read, no TOCTOU
    between the check and the reuse)."""
    lineage = os.path.join(part_dir, "_lineage.json")
    try:
        rec = json.load(open(lineage))
    except (OSError, json.JSONDecodeError):
        return None
    return rec if rec.get("input") == fp else None


def run_resumable(
    corpus_dir: str,
    out_dir: str,
    *,
    num_buckets: int = 64,
    force: bool = False,
    **validator_kwargs,
) -> dict:
    """Validate every parquet shard under ``corpus_dir``; returns a summary
    {partitions, skipped, recomputed, findings}.  Extra keyword arguments
    pass through to :class:`CubeValidator` (e.g. ``mode="shuffle"`` for
    shards holding files too large for the one-block local path,
    ``strict_parse=True``)."""
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
        rec = None if force else _partition_record(part_dir, fp)
        if rec is not None:
            total_findings += rec["n_findings"]
            skipped.append(stem)
            continue

        t0 = time.perf_counter()
        v = CubeValidator(
            corpus_path=shard, num_buckets=num_buckets, **validator_kwargs
        )
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
    """All completed partitions' findings.  In-flight ``part=*.tmp``
    working dirs are excluded (a kill mid-recompute must not surface a
    partition twice), and a fully clean corpus (every partition wrote
    zero findings, so no parquet files exist) returns an EMPTY findings
    Dataset rather than crashing read_parquet on an empty path list."""
    import glob

    import pyarrow as pa

    from ..model import FINDINGS_SCHEMA

    files = sorted(
        f
        for d in os.listdir(out_dir)
        if d.startswith("part=") and not d.endswith(".tmp")
        for f in glob.glob(os.path.join(out_dir, d, "findings", "*.parquet"))
    )
    if not files:
        return ray.data.from_arrow(
            pa.Table.from_arrays(
                [pa.array([], f.type) for f in FINDINGS_SCHEMA],
                schema=FINDINGS_SCHEMA,
            )
        )
    return ray.data.read_parquet(files)
