"""Scale-decade probe (VERDICT r4 next-round #5): exercise the engine at
10x the largest oracle-proven scale using the key-shifted tiled input
(tools/tile_sf.py) — pass/wall + loud-raise shakeout of the caps and
bucket heuristics, NOT an oracle comparison (tiling changes findings).

Three legs, matching how 100 TB actually arrives:
1. scale-OUT headline: the 21-IC cube validation over 640 files of the
   sf0.1 per-file size (tpch_cube_corpus(n_files=640) over the tiled
   6 M-row lineitem) — the many-files shape;
2. scale-UP giant: the same corpus emitted as 64 files of 10x size
   through the shuffle/chunk-split path (mode="shuffle") — the
   one-giant-file shape (cube_validate_all_giant at a decade up);
3. the heaviest non-cube queries() entries over the tiled tables
   (documents/embeddings/part are 10x).

    python tools/scale_probe.py /tmp/sf1_tiled

Prints one JSON line per leg: {"q": ..., "sec": ..., "rows": ...} or
{"q": ..., "error": ...} — a loud typed cap-raise is an acceptable,
documented outcome; a hang or a silent wrong shape is not.
"""

from __future__ import annotations

import functools
import json
import sys
import time

print = functools.partial(print, flush=True)  # noqa: A001

sys.path.insert(0, ".")

HEAVY = [
    "dedup_minhash_pairs",
    "dedup_lsh_recall",
    "kg_code_triangles",
    "kmeans_clusters",
    "knn_cosine_topk",
    "docs_containment_pairs",
    "docs_tfidf_simjoin",
]


def run_one(name, fn):
    t0 = time.perf_counter()
    try:
        res = fn()
        import ray.data

        n = res.count() if isinstance(res, ray.data.Dataset) else len(res)
        print(json.dumps({"q": name, "sec": round(time.perf_counter() - t0, 2), "rows": int(n)}))
    except Exception as e:  # noqa: BLE001
        print(json.dumps({
            "q": name,
            "sec": round(time.perf_counter() - t0, 2),
            "error": f"{type(e).__name__}: {e}"[:300],
        }))


def main() -> int:
    sf_dir = sys.argv[1] if len(sys.argv) > 1 else "/tmp/sf1_tiled"

    import ray

    if not ray.is_initialized():
        ray.init(address="local", num_cpus=32, include_dashboard=False)

    import os

    import pyarrow.parquet as pq

    from nospa_rdf_data_cube_validator_ray.fixtures import tpch_cube_corpus
    from nospa_rdf_data_cube_validator_ray.pipelines.validate import CubeValidator
    from nospa_rdf_data_cube_validator_ray.sources.parse_stage import read_corpus

    def shard(table, out, per=1):
        # the bench convention: sharded parquet with 1-row row groups so
        # read_corpus parallelizes the parse (a from_arrow single block
        # would serialize it onto one task — ingestion shape matters)
        tmp = out + ".tmp"
        os.makedirs(tmp, exist_ok=True)
        for i in range(0, table.num_rows, per):
            pq.write_table(
                table.slice(i, per),
                f"{tmp}/part-{i // per:04d}.parquet",
                row_group_size=1,
            )
        os.rename(tmp, out)
        return out

    t0 = time.perf_counter()
    d640 = "/tmp/probe_sf1_640"
    if not os.path.isdir(d640):
        shard(tpch_cube_corpus(sf_dir, n_files=640), d640)
    print(json.dumps({"q": "fixture_gen_640files", "sec": round(time.perf_counter() - t0, 2)}))

    run_one(
        "cube_validate_all@640files",
        lambda: CubeValidator(read_corpus(d640)).findings_df(),
    )

    t0 = time.perf_counter()
    d64 = "/tmp/probe_sf1_64giant"
    if not os.path.isdir(d64):
        shard(tpch_cube_corpus(sf_dir, n_files=64), d64)
    print(json.dumps({"q": "fixture_gen_64giant", "sec": round(time.perf_counter() - t0, 2)}))

    run_one(
        "cube_validate_giant@64x10",
        lambda: CubeValidator(read_corpus(d64), mode="shuffle").findings_df(),
    )

    import __ray_entry__ as entrymod

    qs = entrymod.queries()
    for name in HEAVY:
        run_one(name, functools.partial(qs[name], sf_dir))
    return 0


if __name__ == "__main__":
    sys.exit(main())
