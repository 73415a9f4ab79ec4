"""Driver-simulation: run every queries() entry and its oracle_sql() on
the same sf dir, compare row-count + schema + order-insensitive value
hash, print a pass/fail table.  Usage:

    python tools/check_oracles.py [sf_dir] [name ...]
"""

from __future__ import annotations

import hashlib
import functools
import sys

print = functools.partial(print, flush=True)  # noqa: A001 — line-buffer
# progress through shell redirects so long sweeps are observable

import duckdb
import pandas as pd

sys.path.insert(0, ".")


TABLES = [
    "region", "nation", "customer", "supplier", "part", "orders",
    "lineitem", "events", "documents", "embeddings",
]


def to_pandas(res) -> pd.DataFrame:
    import ray.data

    if isinstance(res, ray.data.Dataset):
        return res.to_pandas()
    if isinstance(res, pd.DataFrame):
        return res
    return res.to_pandas()  # pyarrow.Table


def value_hash(df: pd.DataFrame) -> str:
    df = df[sorted(df.columns)]
    rows = sorted(
        df.astype(str).itertuples(index=False, name=None)
    )
    h = hashlib.sha256()
    for r in rows:
        h.update("\x1f".join(r).encode("utf-8"))
        h.update(b"\x1e")
    return h.hexdigest()


def main() -> int:
    sf_dir = sys.argv[1] if len(sys.argv) > 1 else "/root/testdata/sf0.001"
    only = set(sys.argv[2:])

    import ray

    if not ray.is_initialized():
        ray.init(address="local", num_cpus=8, include_dashboard=False)

    import __ray_entry__ as entrymod

    qs = entrymod.queries()
    oracles = entrymod.oracle_sql()

    con = duckdb.connect()
    # Bound DuckDB's buffer growth: a 238-query sweep with the default
    # (80% of RAM) limit plus Ray's object store crossed 80% RSS by
    # query ~194 (BASELINE.md round 4); 4 GiB is ample at sf<=0.1.
    con.sql("SET memory_limit='4GB'")
    for t in TABLES:
        con.sql(
            f"CREATE VIEW {t} AS SELECT * FROM '{sf_dir}/{t}.parquet'"
        )

    import gc

    failed = []
    for name, fn in qs.items():
        if only and name not in only:
            continue
        try:
            res = fn(sf_dir)
            mine = to_pandas(res)
            del res  # drop the Dataset ref NOW so its blocks/pools free
        except Exception as e:  # noqa: BLE001
            print(f"{name:28s} ERROR running query: {e!r}")
            failed.append(name)
            continue
        sql = oracles.get(name)
        if sql is None:
            print(f"{name:28s} rows-only: {len(mine)} rows, cols={list(mine.columns)}")
            continue
        try:
            oracle = con.sql(sql).df()
        except Exception as e:  # noqa: BLE001
            print(f"{name:28s} ERROR in oracle SQL: {e!r}")
            failed.append(name)
            continue
        ok_rows = len(mine) == len(oracle)
        ok_cols = sorted(mine.columns) == sorted(oracle.columns)
        ok_hash = ok_cols and value_hash(mine) == value_hash(oracle)
        status = "OK" if (ok_rows and ok_cols and ok_hash) else "MISMATCH"
        print(
            f"{name:28s} {status}  rows {len(mine)}/{len(oracle)}"
            f" cols={'ok' if ok_cols else f'{sorted(mine.columns)} vs {sorted(oracle.columns)}'}"
            f" hash={'ok' if ok_hash else 'DIFF'}"
        )
        if status != "OK":
            failed.append(name)
            if ok_cols:
                merged = mine.astype(str).merge(
                    oracle.astype(str), how="outer", indicator=True,
                    on=sorted(mine.columns),
                )
                diff = merged[merged["_merge"] != "both"]
                print(diff.head(10).to_string())
        # per-query memory hygiene: the sweep must fit one session
        del mine, oracle
        gc.collect()
    print("FAILED:", failed if failed else "none")
    return 1 if failed else 0


if __name__ == "__main__":
    sys.exit(main())
