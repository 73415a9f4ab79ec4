"""Round-3 operators: deterministic random walks and the Count-Min
sketch — regime parity, determinism, and the sketch's estimate bound."""

import numpy as np
import pandas as pd
import pytest

import ray
import ray.data

from nospa_rdf_data_cube_validator_ray.stages.dedup import (
    _md5_u64,
    tokens,
)
from nospa_rdf_data_cube_validator_ray.stages.graph import random_walks


def _edges(pairs):
    return ray.data.from_pandas(
        pd.DataFrame(
            {
                "subj": pd.Series([a for a, _ in pairs], dtype="string"),
                "obj": pd.Series([b for _, b in pairs], dtype="string"),
            }
        )
    )


CHAIN = [("a", "b"), ("b", "c"), ("c", "d")]
FAN = [("r", f"x{i}") for i in range(5)] + [(f"x{i}", "r") for i in range(5)]


def _walk_df(ds):
    df = ds.to_pandas()
    return (
        df.astype({"walk": str, "node": str, "step": "int64"})
        .sort_values(["walk", "step"])
        .reset_index(drop=True)
    )


def test_walks_follow_edges_and_stop_at_sinks():
    out = _walk_df(random_walks(_edges(CHAIN), length=5))
    a = out[out["walk"] == "a"]
    # the chain is deterministic: a → b → c → d, then d is a sink
    assert list(a["node"]) == ["a", "b", "c", "d"]
    assert list(a["step"]) == [0, 1, 2, 3]
    d = out[out["walk"] == "d"]
    assert list(d["node"]) == ["d"]


def test_walks_pick_is_the_documented_hash_argmin():
    out = _walk_df(random_walks(_edges(FAN), length=1, starts=["r"]))
    step1 = out[(out["walk"] == "r") & (out["step"] == 1)]["node"].iloc[0]
    expect = min(
        (f"x{i}" for i in range(5)),
        key=lambda v: (_md5_u64(f"r|1|{v}"), v),
    )
    assert step1 == expect


def test_walks_regime_parity():
    e = _edges(FAN + CHAIN + [("d", "a"), ("x3", "b")])
    a = _walk_df(random_walks(e, length=4))
    b = _walk_df(random_walks(e, length=4, max_driver_edges=0))
    pd.testing.assert_frame_equal(a, b)


def test_countmin_estimate_upper_bounds_true_count():
    from nospa_rdf_data_cube_validator_ray.pipelines.training_data import (
        q_token_countmin,
    )

    sf = "/root/testdata/sf0.001"
    sk = q_token_countmin(sf).to_pandas()
    depth, width = 4, 1024
    cnt = np.zeros((depth, width), dtype=np.int64)
    cnt[sk["d"].to_numpy(), sk["col"].to_numpy()] = sk["n"].to_numpy()

    import pyarrow.parquet as pq

    texts = pq.read_table(
        f"{sf}/documents.parquet", columns=["text"]
    ).column("text").to_pylist()
    true: dict[str, int] = {}
    for t in texts:
        for w in tokens(t or ""):
            true[w] = true.get(w, 0) + 1
    total = sum(true.values())
    # every row's cell sums to the total stream length (mergeable sums)
    assert (cnt.sum(axis=1) == total).all()
    # the CM estimate (min over rows) never under-counts
    for w, c in list(true.items())[:200]:
        est = min(
            cnt[d, _md5_u64(f"{d}|{w}") % width] for d in range(depth)
        )
        assert est >= c


def test_incremental_pairs_are_cross_side_only():
    from nospa_rdf_data_cube_validator_ray.stages.dedup import (
        minhash_lsh_pairs,
        minhash_lsh_pairs_against,
    )

    base = "the quick brown fox jumps over the lazy dog " * 8
    docs = pd.DataFrame(
        {
            "doc_id": pd.Series(range(6), dtype="int64"),
            "text": [
                base,                      # 0: corpus
                base + "tail tail",        # 1: corpus near-dup of 0
                "completely different words " * 10,   # 2: corpus
                base + "extra token",      # 3: NEW near-dup of 0/1
                "unrelated shard text " * 10,         # 4: NEW
                base,                      # 5: NEW exact dup of 0
            ],
        }
    )
    new = ray.data.from_pandas(docs.iloc[3:].reset_index(drop=True))
    corpus = ray.data.from_pandas(docs.iloc[:3].reset_index(drop=True))
    got = minhash_lsh_pairs_against(
        new, corpus, threshold=0.7
    ).to_pandas()
    assert len(got), "expected cross-side near-dup pairs"
    assert set(got["new_doc_id"]) <= {3, 4, 5}
    assert set(got["corpus_doc_id"]) <= {0, 1, 2}
    # every cross pair the within-corpus run finds on the union shows up
    allp = minhash_lsh_pairs(
        ray.data.from_pandas(docs), threshold=0.7
    ).to_pandas()
    cross = {
        (max(a, b), min(a, b))
        for a, b in zip(allp["doc_id_a"], allp["doc_id_b"])
        if (a >= 3) != (b >= 3)
    }
    got_set = {
        (n, c) for n, c in zip(got["new_doc_id"], got["corpus_doc_id"])
    }
    assert got_set == cross
