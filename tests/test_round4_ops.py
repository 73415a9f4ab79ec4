"""Round-4 operators: vectorized Levenshtein, sorted-neighborhood ER
blocking (boundary replication), anti/semi join, star join pushdown,
and the postings AND-query — unit-level checks against brute-force
pandas/python references (the driver's DuckDB oracles cover the full
corpus path)."""

import numpy as np
import pandas as pd
import pytest

import ray
import ray.data

from nospa_rdf_data_cube_validator_ray.pipelines import relational as rel
from nospa_rdf_data_cube_validator_ray.stages.linking import levenshtein_vec


def _lev_ref(a: str, b: str) -> int:
    la, lb = len(a), len(b)
    prev = list(range(lb + 1))
    for i in range(1, la + 1):
        cur = [i] + [0] * lb
        for j in range(1, lb + 1):
            cur[j] = min(
                cur[j - 1] + 1,
                prev[j] + 1,
                prev[j - 1] + (a[i - 1] != b[j - 1]),
            )
        prev = cur
    return prev[lb]


def test_levenshtein_vec_matches_reference():
    rng = np.random.RandomState(7)
    alpha = list("abcde#01")
    pairs = []
    for _ in range(200):
        la, lb = rng.randint(0, 12), rng.randint(0, 12)
        pairs.append(
            (
                "".join(rng.choice(alpha, la)),
                "".join(rng.choice(alpha, lb)),
            )
        )
    pairs += [("", ""), ("", "xyz"), ("same", "same")]
    got = levenshtein_vec([p[0] for p in pairs], [p[1] for p in pairs])
    exp = [_lev_ref(a, b) for a, b in pairs]
    assert list(got) == exp


def _write_customer(tmp_path, names):
    df = pd.DataFrame(
        {
            "c_custkey": pd.array(range(len(names)), dtype="int64"),
            "c_name": pd.array(names, dtype="string"),
            "c_nationkey": pd.array([0] * len(names), dtype="int32"),
            "c_acctbal": pd.array([0.0] * len(names), dtype="float64"),
            "c_mktsegment": pd.array(["X"] * len(names), dtype="string"),
        }
    )
    df.to_parquet(tmp_path / "customer.parquet", index=False)
    return df


def test_er_blocking_boundary_replication(tmp_path, monkeypatch):
    # 40 rows with a tiny block width forces many cross-block pairs;
    # every (i, i+j≤window) neighbor within max_dist must appear ONCE
    monkeypatch.setattr(rel, "_ER_BLOCK", 8)
    names = [f"cust{i:04d}" for i in range(40)]
    df = _write_customer(tmp_path, names)
    got = (
        rel.q_er_blocking_pairs(str(tmp_path))
        .to_pandas()
        .sort_values(["a_custkey", "b_custkey"], ignore_index=True)
    )
    r = df.sort_values(["c_name", "c_custkey"], ignore_index=True)
    exp = []
    for i in range(len(r)):
        for j in range(1, rel._ER_WINDOW + 1):
            if i + j >= len(r):
                break
            d = _lev_ref(r["c_name"][i], r["c_name"][i + j])
            if d <= rel._ER_MAX_DIST:
                exp.append(
                    (int(r["c_custkey"][i]), int(r["c_custkey"][i + j]), d)
                )
    exp_df = pd.DataFrame(
        exp, columns=["a_custkey", "b_custkey", "dist"]
    ).sort_values(["a_custkey", "b_custkey"], ignore_index=True)
    assert len(got) == len(exp_df) > 0
    assert got.astype("int64").equals(exp_df.astype("int64"))


def test_orders_anti_semi_small(tmp_path):
    pd.DataFrame(
        {
            "o_orderkey": pd.array([1, 2, 3, 4], dtype="int64"),
            "o_custkey": pd.array([1, 1, 2, 2], dtype="int64"),
            "o_orderstatus": pd.array(["O"] * 4, dtype="string"),
            "o_totalprice": pd.array([1.0] * 4, dtype="float64"),
            "o_orderdate": pd.to_datetime(["2024-01-01"] * 4),
            "o_orderpriority": pd.array(["1-A", "1-A", "2-B", "2-B"], dtype="string"),
        }
    ).to_parquet(tmp_path / "orders.parquet", index=False)
    pd.DataFrame(
        {
            "l_orderkey": pd.array([1, 1, 3], dtype="int64"),
        }
    ).to_parquet(tmp_path / "lineitem.parquet", index=False)
    out = rel.q_orders_anti_semi(str(tmp_path))
    assert list(out["o_orderpriority"]) == ["1-A", "2-B"]
    assert list(out["n_anti"]) == [1, 1]
    assert list(out["n_semi"]) == [1, 1]
    assert list(out["anti_okey_sum"]) == [2, 4]


def test_star_revenue_integer_arithmetic(tmp_path):
    pd.DataFrame(
        {
            "l_orderkey": pd.array([1, 1, 2], dtype="int64"),
            "l_extendedprice": pd.array([10.01, 5.50, 2.00], dtype="float64"),
            "l_discount": pd.array([0.05, 0.00, 0.10], dtype="float64"),
        }
    ).to_parquet(tmp_path / "lineitem.parquet", index=False)
    pd.DataFrame(
        {
            "o_orderkey": pd.array([1, 2], dtype="int64"),
            "o_custkey": pd.array([7, 7], dtype="int64"),
            "o_orderdate": pd.to_datetime(["2024-03-01", "2025-06-01"]),
        }
    ).to_parquet(tmp_path / "orders.parquet", index=False)
    pd.DataFrame(
        {
            "c_custkey": pd.array([7], dtype="int64"),
            "c_nationkey": pd.array([3], dtype="int32"),
        }
    ).to_parquet(tmp_path / "customer.parquet", index=False)
    pd.DataFrame(
        {
            "n_nationkey": pd.array([3], dtype="int32"),
            "n_name": pd.array(["NARNIA"], dtype="string"),
            "n_regionkey": pd.array([1], dtype="int32"),
        }
    ).to_parquet(tmp_path / "nation.parquet", index=False)
    pd.DataFrame(
        {
            "r_regionkey": pd.array([1], dtype="int32"),
            "r_name": pd.array(["WEST"], dtype="string"),
        }
    ).to_parquet(tmp_path / "region.parquet", index=False)
    out = rel.q_star_revenue(str(tmp_path))
    assert list(out["o_year"]) == [2024, 2025]
    # 1001 * 95 + 550 * 100 = 150095 ; 200 * 90 = 18000
    assert list(out["revenue"]) == [150095, 18000]
    assert list(out["n_items"]) == [2, 1]
    assert list(out["r_name"]) == ["WEST", "WEST"]
    assert list(out["n_name"]) == ["NARNIA", "NARNIA"]


def test_value_outliers_tiny_groups(tmp_path):
    """n <= 2 makes the q1 and q3 rank positions coincide; both slots
    must still resolve (review finding: a single-slot dict dropped q1)."""
    pd.DataFrame(
        {
            "event_id": pd.array([1, 2, 3, 4, 5], dtype="int64"),
            "ts": pd.to_datetime(["2024-01-01 00:00:00"] * 5),
            "user_id": pd.array([1] * 5, dtype="int64"),
            "event_type": pd.array(["a", "b", "b", "c", "c"], dtype="string"),
            "value": pd.array([5.0, 1.0, 9.0, 2.0, 2.0], dtype="float64"),
            "props": pd.array(["{}"] * 5, dtype="string"),
        }
    ).to_parquet(tmp_path / "events.parquet", index=False)
    out = rel.q_events_value_outliers(str(tmp_path))
    assert list(out["event_type"]) == ["a", "b", "c"]
    # n=1: q1 == q3 == the element; n=2: positions (2-1)*25//100 == 0
    # and (2-1)*75//100 == 0 -> both quartiles are the smaller element
    assert list(out["q1"]) == [5.0, 1.0, 2.0]
    assert list(out["q3"]) == [5.0, 1.0, 2.0]
    assert not out["q1"].isna().any()
    # b's 9.0 exceeds q3 + 1.5*(q3-q1) = 1.0 -> one outlier
    assert list(out["n_outliers"]) == [0, 1, 0]
