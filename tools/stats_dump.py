"""Per-stage profile of any `queries()` entry: run it and print Ray
Data's executor stats (`Dataset.stats()`) for every Dataset the query
returns or materializes — the feedback loop for "wall-time should be
dominated by useful compute".  Usage:

    python tools/stats_dump.py <query_name> [sf_dir] [num_cpus]

Queries that return a pandas frame still run their internal pipelines;
for those this prints only wall time (their stages are profiled by
running the underlying stage functions directly)."""

from __future__ import annotations

import sys
import time

sys.path.insert(0, ".")


def main() -> None:
    name = sys.argv[1]
    sf_dir = sys.argv[2] if len(sys.argv) > 2 else "/root/testdata/sf0.01"
    cpus = int(sys.argv[3]) if len(sys.argv) > 3 else 8

    import ray

    if not ray.is_initialized():
        ray.init(address="local", num_cpus=cpus, include_dashboard=False)

    import __ray_entry__ as entry

    q = entry.queries()[name]
    t0 = time.perf_counter()
    res = q(sf_dir)
    import ray.data

    if isinstance(res, ray.data.Dataset):
        res = res.materialize()
        wall = time.perf_counter() - t0
        print(res.stats())
    else:
        wall = time.perf_counter() - t0
        print(f"(returned {type(res).__name__}; stages consumed internally)")
    print(f"\n== {name} @ {sf_dir} cpus={cpus}: {wall:.2f}s ==")
    ray.shutdown()


if __name__ == "__main__":
    main()
