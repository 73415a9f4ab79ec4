"""Scale-decade probe (VERDICT r4 next-round #5): run the headline
pipeline + the slowest sf0.1 queries against a 10x-tiled sf1 input
(tools/tile_sf.py) and record pass/wall — the caps/bucket-heuristics
shakeout at a data decade none of the oracles have seen.

    python tools/scale_probe.py /tmp/sf1_tiled q1 q2 ...

Prints one JSON line per query: {"q": name, "sec": w, "rows": n} or
{"q": name, "error": "..."} — a loud typed cap-raise is an acceptable,
documented outcome; a hang or silent wrong-shape is not.
"""

from __future__ import annotations

import functools
import json
import sys
import time

print = functools.partial(print, flush=True)  # noqa: A001

sys.path.insert(0, ".")


def main() -> int:
    sf_dir = sys.argv[1]
    names = sys.argv[2:]

    import ray

    if not ray.is_initialized():
        ray.init(address="local", num_cpus=32, include_dashboard=False)

    import __ray_entry__ as entrymod

    qs = entrymod.queries()
    for name in names:
        fn = qs[name]
        t0 = time.perf_counter()
        try:
            res = fn(sf_dir)
            import ray.data

            if isinstance(res, ray.data.Dataset):
                n = res.count()
            else:
                n = len(res)
            print(json.dumps({"q": name, "sec": round(time.perf_counter() - t0, 2), "rows": int(n)}))
        except Exception as e:  # noqa: BLE001
            print(json.dumps({
                "q": name,
                "sec": round(time.perf_counter() - t0, 2),
                "error": f"{type(e).__name__}: {e}"[:300],
            }))
    return 0


if __name__ == "__main__":
    sys.exit(main())
