"""util.bucket_agg/bucket_sum/bucket_count vs plain pandas groupby —
including null keys (dropna=False semantics) and multi-column keys."""

import numpy as np
import pandas as pd

import ray.data

from nospa_rdf_data_cube_validator_ray.util import (
    bucket_agg,
    bucket_count,
    bucket_sum,
)


def _frame(seed: int, n: int = 500) -> pd.DataFrame:
    rng = np.random.default_rng(seed)
    keys = pd.Series(rng.integers(0, 40, n)).astype("string")
    keys[rng.random(n) < 0.05] = pd.NA  # null keys must stay groups
    return pd.DataFrame(
        {
            "k": keys,
            "k2": pd.Series(rng.integers(0, 3, n), dtype="int64"),
            "v": pd.Series(rng.integers(-100, 100, n), dtype="int64"),
        }
    )


def _norm(df: pd.DataFrame) -> list:
    return sorted(
        tuple("<NA>" if pd.isna(x) else x for x in r)
        for r in df.itertuples(index=False, name=None)
    )


def test_bucket_sum_matches_pandas_with_nulls():
    df = _frame(1)
    ds = ray.data.from_pandas(df).repartition(7)
    got = bucket_sum(ds, ["k", "k2"], ["v"], num_buckets=5).to_pandas()
    want = df.groupby(["k", "k2"], as_index=False, dropna=False)["v"].sum()
    assert _norm(got) == _norm(want)


def test_bucket_count_matches_pandas():
    df = _frame(2)
    ds = ray.data.from_pandas(df).repartition(3)
    got = bucket_count(ds, ["k"], out_col="c", num_buckets=4).to_pandas()
    want = (
        df.groupby(["k"], as_index=False, dropna=False)
        .size()
        .rename(columns={"size": "c"})
    )
    assert _norm(got[["k", "c"]]) == _norm(want)


def test_bucket_agg_key_locality():
    # every row of one key must reach the SAME fn invocation: an fn that
    # emits one row per (key, group-size) exposes split keys as dupes
    df = _frame(3)
    ds = ray.data.from_pandas(df).repartition(9)

    def sizes(d: pd.DataFrame) -> pd.DataFrame:
        g = d.groupby("k", as_index=False, dropna=False).size()
        return g.rename(columns={"size": "c"})

    got = bucket_agg(ds, ["k"], sizes, num_buckets=6).to_pandas()
    assert not got["k"].duplicated().any()
    assert int(got["c"].sum()) == len(df)
