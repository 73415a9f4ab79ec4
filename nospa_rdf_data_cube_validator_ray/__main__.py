"""CLI entry — parity with the reference's Main (Main.java:21-58):
load → normalize → validateAll → report, with elapsed-ms logging.

    python -m nospa_rdf_data_cube_validator_ray CORPUS \
        [--report validation_result.md] [--export-model DIR] \
        [--export-nt DIR] [--ics IC11 IC12] [--mode auto|local|shuffle]

CORPUS is a parquet file/dir with columns (repo, path, commit, lang,
content).  Owns its Ray session (guarded init) — library code never does.
"""

from __future__ import annotations

import argparse
import sys
import time


def main(argv=None) -> int:
    ap = argparse.ArgumentParser(prog="nospa_rdf_data_cube_validator_ray")
    ap.add_argument("corpus", help="parquet file/dir of (repo,path,commit,lang,content)")
    ap.add_argument("--report", default=None, help="write markdown report here")
    ap.add_argument("--export-model", default=None, help="write normalized triples")
    ap.add_argument(
        "--export-format", default="parquet",
        choices=["parquet", "ntriples", "turtle", "rdfxml"],
        help="serialization for --export-model (exportModel parity)",
    )
    ap.add_argument("--export-nt", default=None, help="write normalized triples (N-Triples)")
    ap.add_argument("--ics", nargs="*", default=None, help="subset of IC1..IC21")
    ap.add_argument("--mode", default="auto", choices=["auto", "local", "shuffle"])
    ap.add_argument("--num-cpus", type=int, default=None)
    ap.add_argument(
        "--stats", action="store_true",
        help="print per-stage Ray Data execution stats (ds.stats())",
    )
    args = ap.parse_args(argv)

    import ray

    if not ray.is_initialized():
        kw = {"include_dashboard": False}
        if args.num_cpus:
            kw["num_cpus"] = args.num_cpus
        ray.init(address="local", **kw)

    from . import CubeValidator
    from .pipelines.report import render_markdown

    t0 = time.time()
    v = CubeValidator(corpus_path=args.corpus, mode=args.mode)
    if args.ics:
        findings = v.validate(args.ics).to_pandas()
    else:
        findings = v.findings_df()
    elapsed_ms = int((time.time() - t0) * 1000)
    print(f"validation finished in {elapsed_ms} ms: {len(findings)} violation(s)")
    if args.stats:
        # per-stage wall/CPU breakdown of the materialized triple stream —
        # the reference logs elapsed ms only (Main.java:51-57); Ray Data
        # gives per-operator task counts, remote wall time and throughput
        print(v.normalize().stats())

    if args.report:
        from .pipelines.report import write_report

        write_report(findings, args.report, ics=args.ics)
        print(f"report written to {args.report}")
    else:
        print(render_markdown(findings, ics=args.ics))

    if args.export_model:
        v.export_model(args.export_model, fmt=args.export_format)
        print(
            f"normalized model written to {args.export_model} "
            f"({args.export_format})"
        )
    if args.export_nt:
        from .stages.export import write_ntriples

        files = write_ntriples(v.normalized_triples(), args.export_nt)
        print(f"{len(files)} N-Triples part(s) written to {args.export_nt}")

    ray.shutdown()
    return 0


if __name__ == "__main__":
    sys.exit(main())
