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


# ---------------------------------------------------------------------------
# HLL sketch + Bloom contamination (round-3 session 2)
# ---------------------------------------------------------------------------


def _docs_ds(rows):
    return ray.data.from_pandas(
        pd.DataFrame(
            {
                "doc_id": pd.Series([r[0] for r in rows], dtype="int64"),
                "source": pd.Series([r[1] for r in rows], dtype="string"),
                "text": pd.Series([r[2] for r in rows], dtype="string"),
            }
        )
    )


def test_hll_estimate_tracks_exact_distinct():
    # 3 sources with very different true cardinalities; HLL raw estimate
    # (256 registers) must land within ±25% once n >> m is false — at
    # these sizes the raw estimator's bias is small and DETERMINISTIC,
    # so the bound is safe for a fixed corpus
    import importlib.util, sys

    spec = importlib.util.spec_from_file_location(
        "q", "/root/repo/__ray_entry__.py"
    )
    m = importlib.util.module_from_spec(spec)
    spec.loader.exec_module(m)
    rows = []
    for i in range(200):
        rows.append((i, "big", " ".join(f"tok{j}" for j in range(i * 7, i * 7 + 7))))
    rows.append((900, "tiny", "a b c a b"))
    import tempfile, os

    with tempfile.TemporaryDirectory() as td:
        import pyarrow as pa, pyarrow.parquet as pq

        df = pd.DataFrame(
            {
                "doc_id": [r[0] for r in rows],
                "text": [r[2] for r in rows],
                "lang": "en",
                "source": [r[1] for r in rows],
                "n_chars": [len(r[2]) for r in rows],
            }
        )
        pq.write_table(pa.Table.from_pandas(df), os.path.join(td, "documents.parquet"))
        out = m.queries()["distinct_sketch_hll"](td).to_pandas()
    big = out[out["source"] == "big"].iloc[0]
    tiny = out[out["source"] == "tiny"].iloc[0]
    assert abs(int(big["est_hll"]) - 1400) / 1400 < 0.25
    # 3 distinct tokens: the RAW estimator is biased high at tiny n
    # (≈ alpha·m = 184 when all registers sit near rho=1) — that's the
    # documented raw-HLL behavior; n_regs is exact so a caller can apply
    # linear counting (m·ln(m/V), float) downstream when n ≪ m
    assert int(tiny["n_regs"]) == 3
    assert 150 < int(tiny["est_hll"]) < 230


def test_bloom_hits_superset_of_exact_overlap():
    from nospa_rdf_data_cube_validator_ray.stages.dedup import (
        benchmark_contamination,
        bloom_contamination,
    )

    # find doc ids on each side of the md5 % 20 split
    evals = [i for i in range(200) if _md5_u64(str(i)) % 20 == 0][:3]
    trains = [i for i in range(200) if _md5_u64(str(i)) % 20 != 0][:6]
    rows = [(i, "s", "shared gram one two three four") for i in evals]
    # half the train docs overlap the eval text, half are clean
    rows += [
        (i, "s", "shared gram one zzz")
        if j < 3
        else (i, "s", f"clean text {j} alpha beta gamma")
        for j, i in enumerate(trains)
    ]
    ds = _docs_ds(rows)
    exact = benchmark_contamination(ds).to_pandas().set_index("doc_id")
    bloom = bloom_contamination(ds).to_pandas().set_index("doc_id")
    assert sorted(exact.index) == sorted(bloom.index)
    for i in exact.index:
        # Bloom never under-counts: every exact hit is a bloom hit
        assert bloom.loc[i, "n_hits"] >= exact.loc[i, "n_overlap"]
        assert bloom.loc[i, "n_grams"] == exact.loc[i, "n_grams"]
    assert (exact["n_overlap"] > 0).sum() >= 3  # the overlapping half


def test_bloom_filter_is_deterministic():
    from nospa_rdf_data_cube_validator_ray.stages.dedup import bloom_contamination

    rows = [(i, "s", f"text {i} common words here") for i in range(40)]
    a = bloom_contamination(_docs_ds(rows)).to_pandas().sort_values("doc_id")
    b = bloom_contamination(_docs_ds(rows)).to_pandas().sort_values("doc_id")
    assert a.reset_index(drop=True).equals(b.reset_index(drop=True))


# ---------------------------------------------------------------------------
# link_scores + bgp_match
# ---------------------------------------------------------------------------


def _triples_ds(rows):
    return ray.data.from_pandas(
        pd.DataFrame(
            {
                "graph": pd.Series(["g"] * len(rows), dtype="string"),
                "file_sha256": pd.Series(["x"] * len(rows), dtype="string"),
                "subj": pd.Series([r[0] for r in rows], dtype="string"),
                "pred": pd.Series([r[1] for r in rows], dtype="string"),
                "obj_kind": pd.Series([0] * len(rows), dtype="int8"),
                "obj": pd.Series([r[2] for r in rows], dtype="string"),
                "obj_dt": pd.Series([""] * len(rows), dtype="string"),
                "obj_lang": pd.Series([""] * len(rows), dtype="string"),
            }
        )
    )


def test_link_scores_counts_common_neighbors():
    from nospa_rdf_data_cube_validator_ray.stages.graph import link_scores

    # star: a,b,c all point at m (siblings share 1 common neighbor);
    # a-b also share a second mid m2
    pairs = [("a", "m"), ("b", "m"), ("c", "m"), ("a", "m2"), ("b", "m2")]
    out = link_scores(_edges(pairs)).to_pandas()
    got = {
        (r.node_u, r.node_w): r.score for r in out.itertuples()
    }
    assert got[("a", "b")] == 2
    assert got[("a", "c")] == 1 and got[("b", "c")] == 1
    # m and m2 are adjacent to every sibling — (m, m2) share a,b as
    # common neighbors and are NOT adjacent themselves
    assert got[("m", "m2")] == 2
    # existing edges never appear
    assert ("a", "m") not in got


def test_link_scores_hub_cap_excludes_high_degree_mids():
    from nospa_rdf_data_cube_validator_ray.stages.graph import link_scores

    pairs = [(f"x{i}", "hub") for i in range(6)]
    out = link_scores(_edges(pairs), max_mid_degree=5).to_pandas()
    assert len(out) == 0  # the only mid is over the cap


def test_bgp_match_chain_and_constants():
    from nospa_rdf_data_cube_validator_ray.stages.graph import bgp_match

    rows = [
        ("o1", "P", "c1"), ("o2", "P", "c2"),
        ("c1", "N", "n1"), ("c2", "N", "n2"), ("n1", "R", "r1"),
        ("n2", "R", "r2"),
    ]
    out = bgp_match(
        _triples_ds(rows),
        [("?o", "P", "?c"), ("?c", "N", "?n"), ("?n", "R", "r1")],
    ).to_pandas()
    assert list(out.columns) == ["o", "c", "n"]  # first-appearance order
    assert [tuple(r) for r in out.to_numpy()] == [("o1", "c1", "n1")]


def test_bgp_match_repeated_variable_and_cartesian_guard():
    from nospa_rdf_data_cube_validator_ray.stages.graph import bgp_match

    rows = [("a", "P", "a"), ("a", "P", "b"), ("b", "Q", "c")]
    out = bgp_match(_triples_ds(rows), [("?x", "P", "?x")]).to_pandas()
    assert list(out["x"]) == ["a"]
    with pytest.raises(ValueError, match="cartesian"):
        bgp_match(
            _triples_ds(rows), [("?x", "P", "?y"), ("?z", "Q", "?w")]
        ).to_pandas()


# ---------------------------------------------------------------------------
# sentence stats + expectations + SCD-2
# ---------------------------------------------------------------------------


def test_sentence_stats_segments_and_blanks():
    from nospa_rdf_data_cube_validator_ray.functions.text import sentence_stats

    df = pd.DataFrame(
        {
            "doc_id": pd.Series([1, 2, 3, 4], dtype="int64"),
            "text": pd.Series(
                ["One two. Three!? Four five six.", "...", None, "no stop"],
                dtype="string",
            ),
        }
    )
    out = sentence_stats(df).set_index("doc_id")
    assert list(out.loc[1]) == [3, 3, 6]      # 2 + 1 + 3 tokens
    assert list(out.loc[2]) == [0, 0, 0]      # pure punctuation
    assert list(out.loc[3]) == [0, 0, 0]      # NULL text
    assert list(out.loc[4]) == [1, 2, 2]      # unterminated sentence


def test_expectations_counts_injected_violations():
    from nospa_rdf_data_cube_validator_ray.stages.expect import expectations

    df = pd.DataFrame(
        {
            "doc_id": pd.Series([1, 1, 2, None, None], dtype="Int64"),
            "lang": pd.Series(["en", "xx", None, "en", "en"], dtype="string"),
            "n": pd.Series([5, 50, 500, None, 5], dtype="Int64"),
        }
    )
    out = expectations(
        ray.data.from_pandas(df),
        [
            ("id_unique", "unique", "doc_id"),
            ("lang_ok", "in_set", "lang", {"en"}),
            ("n_range", "between", "n", 10, 100),
            ("lang_re", "matches", "lang", r"[a-z]{2}"),
        ],
    ).set_index("rule")
    # distinct doc_ids = {1, 2, NULL} → 5 − 3 = 2 dup rows
    assert list(out.loc["id_unique"]) == [5, 2]
    assert list(out.loc["lang_ok"]) == [5, 2]      # 'xx' + NULL
    assert list(out.loc["n_range"]) == [5, 4]      # 5, 500, NULL, 5
    assert list(out.loc["lang_re"]) == [5, 1]      # NULL→'' fails fullmatch


def test_scd_collapses_runs_and_versions():
    from nospa_rdf_data_cube_validator_ray.pipelines.relational import q_events_scd
    import tempfile, os
    import pyarrow as pa, pyarrow.parquet as pq

    ts = pd.to_datetime(
        ["2024-01-01 00:00:00", "2024-01-01 01:00:00",
         "2024-01-01 02:00:00", "2024-01-01 03:00:00",
         "2024-01-01 00:30:00"]
    ).astype("datetime64[us]")
    df = pd.DataFrame(
        {
            "event_id": pd.Series([1, 2, 3, 4, 5], dtype="int64"),
            "ts": ts,
            "user_id": pd.Series([7, 7, 7, 7, 9], dtype="int64"),
            "event_type": ["view", "view", "buy", "view", "view"],
            "value": 0.0,
            "props": "",
        }
    )
    with tempfile.TemporaryDirectory() as td:
        pq.write_table(pa.Table.from_pandas(df), os.path.join(td, "events.parquet"))
        out = q_events_scd(td)
    u7 = out[out["user_id"] == 7].sort_values("version")
    assert list(u7["event_type"]) == ["view", "buy", "view"]  # run collapsed
    assert list(u7["version"]) == [1, 2, 3]
    # interval chaining: each valid_to == next valid_from; last is open
    assert list(u7["valid_to_us"])[:2] == list(u7["valid_from_us"])[1:]
    assert list(u7["valid_to_us"])[2] == -1
    u9 = out[out["user_id"] == 9]
    assert len(u9) == 1 and int(u9["valid_to_us"].iloc[0]) == -1


# ---------------------------------------------------------------------------
# PQ ANN + pivot + split + profile
# ---------------------------------------------------------------------------


def _emb_ds(n=64, dim=16, seed=3):
    rng = np.random.RandomState(seed)
    mat = rng.standard_normal((n, dim))
    return ray.data.from_pandas(
        pd.DataFrame(
            {
                "vec_id": pd.Series(range(n), dtype="int64"),
                "embedding": [row.astype(np.float32) for row in mat],
            }
        )
    )


def test_pq_reranked_topk_matches_exact_on_small_corpus():
    from nospa_rdf_data_cube_validator_ray.stages.embedding import (
        knn_topk,
        pq_topk,
    )

    ds = _emb_ds()
    # shortlist ≥ corpus ⇒ the rerank IS the exact scan: results equal
    exact = knn_topk(ds, query_ids=[0, 1, 2], k=5)
    pq = pq_topk(ds, query_ids=[0, 1, 2], k=5, m=4, shortlist=64)
    pd.testing.assert_frame_equal(
        exact.reset_index(drop=True), pq.reset_index(drop=True)
    )


def test_pq_codes_are_deterministic_and_bounded():
    from nospa_rdf_data_cube_validator_ray.stages.embedding import PQIndex

    ds = _emb_ds(n=40)
    sample = np.stack(ds.to_pandas()["embedding"].to_numpy())
    a = PQIndex(m=4, k=8).train(sample)
    b = PQIndex(m=4, k=8).train(sample)
    assert np.array_equal(a.codebooks, b.codebooks)  # seeded training
    enc = a.encode(ds).to_pandas()
    for mi in range(4):
        c = enc[f"pq{mi}"]
        assert c.between(0, 7).all()


def test_events_pivot_counts_match_value_counts():
    import tempfile, os
    import pyarrow as pa, pyarrow.parquet as pq
    from nospa_rdf_data_cube_validator_ray.pipelines.training_data import (
        q_events_pivot,
    )

    df = pd.DataFrame(
        {
            "event_id": pd.Series(range(8), dtype="int64"),
            "ts": pd.to_datetime(["2024-01-01"] * 8).astype("datetime64[us]"),
            "user_id": pd.Series([1, 1, 1, 2, 2, 3, 3, 3], dtype="int64"),
            "event_type": ["view", "view", "click", "purchase", "view",
                           "error", "signup", "error"],
            "value": 0.0,
            "props": "",
        }
    )
    with tempfile.TemporaryDirectory() as td:
        pq.write_table(pa.Table.from_pandas(df), os.path.join(td, "events.parquet"))
        out = q_events_pivot(td).to_pandas().set_index("user_id").sort_index()
    assert list(out.columns) == ["n_click", "n_error", "n_purchase",
                                 "n_signup", "n_view"]
    assert list(out.loc[1]) == [1, 0, 0, 0, 2]
    assert list(out.loc[2]) == [0, 0, 1, 0, 1]
    assert list(out.loc[3]) == [0, 2, 0, 1, 0]


def test_table_profile_exact_counts():
    from nospa_rdf_data_cube_validator_ray.stages.expect import table_profile

    df = pd.DataFrame(
        {
            "a": pd.Series([1, 2, 2, None], dtype="Int64"),
            "b": pd.Series(["x", None, "y", "x"], dtype="string"),
        }
    )
    out = table_profile(ray.data.from_pandas(df), ["a", "b"]).set_index("col_name")
    assert list(out.loc["a"]) == [4, 1, 2, "1", "2"]
    assert list(out.loc["b"]) == [4, 1, 2, "x", "y"]


# ---------------------------------------------------------------------------
# kcore / entity_lift / gopher_filter
# ---------------------------------------------------------------------------


def test_kcore_peels_tendrils_and_keeps_the_clique():
    from nospa_rdf_data_cube_validator_ray.stages.graph import kcore

    # triangle a-b-c (the 2-core) with a pendant chain c-d-e
    pairs = [("a", "b"), ("b", "c"), ("a", "c"), ("c", "d"), ("d", "e")]
    out = kcore(_edges(pairs), k=2).to_pandas()
    got = dict(zip(out["node"], out["deg"]))
    assert got == {"a": 2, "b": 2, "c": 2}


def test_kcore_regime_parity_and_empty_core():
    from nospa_rdf_data_cube_validator_ray.stages.graph import kcore

    # two triangles joined by a bridge + a star that fully peels at k=2
    pairs = (
        [("a", "b"), ("b", "c"), ("a", "c"),
         ("p", "q"), ("q", "r"), ("p", "r"), ("c", "p")]
        + [("hub", f"leaf{i}") for i in range(4)]
    )
    drv = kcore(_edges(pairs), k=2).to_pandas()
    dist = kcore(_edges(pairs), k=2, max_driver_edges=0).to_pandas()
    key = lambda df: sorted(zip(df["node"], df["deg"]))
    assert key(drv) == key(dist)
    assert "hub" not in set(drv["node"])
    # a pure star has no 2-core at all: both regimes return empty
    star = [("hub", f"leaf{i}") for i in range(4)]
    assert kcore(_edges(star), k=2).count() == 0
    assert kcore(_edges(star), k=2, max_driver_edges=0).count() == 0


def test_kcore_raises_when_peel_outruns_the_bound():
    from nospa_rdf_data_cube_validator_ray.stages.graph import kcore

    # a length-6 path needs 3 peel rounds at k=2 to empty out
    path = [(f"n{i}", f"n{i+1}") for i in range(6)]
    with pytest.raises(RuntimeError, match="still peeling"):
        kcore(_edges(path), k=2, max_rounds=2)


def test_entity_lift_matches_hand_computation():
    from nospa_rdf_data_cube_validator_ray.stages.linking import entity_lift

    # 3 docs; A and B co-occur in docs 1 and 2; c(A)=3, c(B)=2, N=3
    mentions = ray.data.from_pandas(
        pd.DataFrame(
            {
                "doc_id": pd.array([1, 1, 2, 2, 3], dtype="int64"),
                "entity": pd.array(["A", "B", "A", "B", "A"], dtype="string"),
                "n_mentions": pd.array([1, 1, 1, 1, 1], dtype="int64"),
            }
        )
    )
    out = entity_lift(mentions, min_count=2).to_pandas()
    assert len(out) == 1
    row = out.iloc[0]
    assert (row["ent_a"], row["ent_b"], row["n"]) == ("A", "B", 2)
    assert row["lift"] == (3 * 2) / (3 * 2)


def test_gopher_filter_rules_fire_individually():
    from nospa_rdf_data_cube_validator_ray.functions.text import gopher_filter

    good = "the quick brown fox jumps have with that " * 8  # 64 words
    df = pd.DataFrame(
        {
            "doc_id": [1, 2, 3, 4],
            "text": [
                good,
                "short text",                     # fails r_nwords
                good + " ####" * 20,              # symbol-heavy
                "\n".join(["- b"] * 10),          # all bullet lines
            ],
        }
    )
    out = gopher_filter(df).set_index("doc_id")
    assert bool(out.loc[1, "keep"])
    assert not bool(out.loc[2, "r_nwords"])
    assert not bool(out.loc[3, "r_sym"])
    assert not bool(out.loc[4, "r_bullet"])
    # null text behaves like empty: zero words, keep = False
    nul = gopher_filter(pd.DataFrame({"doc_id": [9], "text": [None]}))
    assert int(nul.loc[0, "n_words"]) == 0 and not bool(nul.loc[0, "keep"])


def test_ra_weighted_link_scores_integer_damping():
    from nospa_rdf_data_cube_validator_ray.stages.graph import link_scores

    # u-m1-w and u-m2-w wedges; deg(m1)=2, deg(m2)=3 (extra leaf)
    pairs = [
        ("u", "m1"), ("w", "m1"),
        ("u", "m2"), ("w", "m2"), ("m2", "leaf"),
    ]
    out = link_scores(_edges(pairs), mid_weight="inv_deg").to_pandas()
    row = out[(out["node_u"] == "u") & (out["node_w"] == "w")]
    assert len(row) == 1
    # 10^6//2 + 10^6//3 = 500000 + 333333
    assert int(row["score"].iloc[0]) == 833333
    plain = link_scores(_edges(pairs)).to_pandas()
    prow = plain[(plain["node_u"] == "u") & (plain["node_w"] == "w")]
    assert int(prow["score"].iloc[0]) == 2


def test_phash_bits_and_pair_completeness():
    import numpy as np

    from nospa_rdf_data_cube_validator_ray.functions import codecs as C
    from nospa_rdf_data_cube_validator_ray.stages.multimodal import (
        PHash,
        phash_pairs,
    )

    # two images one dark-pixel apart -> tiny hamming; one inverted -> far
    base = np.zeros((4, 4, 3), dtype=np.uint8)
    base[:2] = 200  # top half bright
    near = base.copy(); near[3, 3, 2] = 255
    far = 200 - base
    pf = pd.DataFrame(
        {
            "doc_id": [1, 2, 3],
            "payload": [C.encode_bmp(a) for a in (base, near, far)],
            "media_type": ["image/bmp"] * 3,
        }
    )
    t = PHash()(pf)
    h = dict(zip(t["doc_id"], t["phash"].to_numpy(np.int64).view(np.uint64)))
    ham = lambda a, b: bin(int(h[a] ^ h[b])).count("1")
    assert ham(1, 2) <= 7 < ham(1, 3)
    pairs = phash_pairs(ray.data.from_pandas(pf)).to_pandas()
    got = set(zip(pairs["doc_id_a"], pairs["doc_id_b"]))
    assert (1, 2) in got and (1, 3) not in got
    assert int(pairs.set_index(["doc_id_a", "doc_id_b"]).loc[(1, 2), "hamming"]) == ham(1, 2)


def test_cdc_merge_upsert_delete_semantics():
    from nospa_rdf_data_cube_validator_ray.pipelines.relational import cdc_merge

    base = ray.data.from_pandas(
        pd.DataFrame(
            {
                "k": pd.array([1, 2, 3], dtype="int64"),
                "v": pd.array([10, 20, 30], dtype="int64"),
            }
        )
    )
    feed = ray.data.from_pandas(
        pd.DataFrame(
            {
                "k": pd.array([2, 3, 3, 4], dtype="int64"),
                "v": pd.array([21, 31, 0, 40], dtype="int64"),
                "seq": pd.array([1, 1, 2, 1], dtype="int64"),
                "op": pd.array(["U", "U", "D", "U"], dtype="string"),
            }
        )
    )
    out = cdc_merge(base, feed, key="k").to_pandas()
    got = dict(zip(out["k"].astype(int), out["v"].astype(int)))
    # 1 untouched, 2 updated, 3 updated-then-deleted, 4 inserted by feed
    assert got == {1: 10, 2: 21, 4: 40}


def test_lp_communities_regime_parity_and_tiebreak():
    from nospa_rdf_data_cube_validator_ray.stages.graph import lp_communities

    pairs = [
        ("a", "b"), ("b", "c"), ("a", "c"),
        ("p", "q"), ("q", "r"), ("p", "r"), ("c", "p"), ("a", "z"),
    ]
    drv = lp_communities(_edges(pairs)).to_pandas()
    dist = lp_communities(_edges(pairs), max_driver_edges=0).to_pandas()
    key = lambda df: sorted(zip(df["node"], df["label"]))
    assert key(drv) == key(dist)
    lab = dict(zip(drv["node"], drv["label"]))
    # triangles converge to their lexicographic minima
    assert lab["a"] == lab["b"] == lab["c"] == "a"
    assert lab["q"] == lab["r"]


# -- paragraph dedup + quality classifier -----------------------------------


def test_paragraph_dedup_global_first_occurrence():
    """Within-doc repeats and later cross-doc copies are dropped; the
    first occurrence in (doc_id, idx) order survives."""
    from nospa_rdf_data_cube_validator_ray.pipelines.training_data import (
        q_paragraph_dedup,
    )
    import pyarrow.parquet as pq
    import duckdb

    out = (
        q_paragraph_dedup("/root/testdata/sf0.001")
        .to_pandas()
        .sort_values("doc_id", ignore_index=True)
    )
    assert len(out) == 500
    assert (out["n_par"] == 4).all()
    # the in-doc header repeat guarantees every doc loses at least one
    assert (out["n_kept"] <= 3).all()
    # doc 0 is globally first: header + own text + footer all survive
    assert out.loc[out["doc_id"] == 0, "n_kept"].iloc[0] == 3
    # any doc with doc_id >= 15 shares header (mod 5) and footer (mod 3)
    # with strictly earlier docs — only its own text can survive, unless
    # that text itself duplicates an earlier doc's text
    docs = pq.read_table(
        "/root/testdata/sf0.001/documents.parquet"
    ).to_pandas()
    first_by_text = docs.groupby(docs["text"].fillna(""))["doc_id"].min()
    own_is_first = (
        docs.set_index("doc_id")["text"].fillna("").map(first_by_text)
        == docs.set_index("doc_id").index
    )
    late = out[out["doc_id"] >= 15].set_index("doc_id")
    expected = own_is_first.loc[late.index].astype(int)
    assert (late["n_kept"] == expected).all()


def test_quality_classifier_deterministic_and_scored():
    from nospa_rdf_data_cube_validator_ray.pipelines.training_data import (
        _QualityModel,
    )

    m = _QualityModel()
    df = pd.DataFrame(
        {"doc_id": pd.array([1, 2], dtype="int64"),
         "text": ["hash join scan", None]}
    )
    a = m(df)
    b = _QualityModel()(df)
    pd.testing.assert_frame_equal(a, b)
    # 3 unigrams + 2 bigrams
    assert a["n_grams"].tolist() == [5, 0]
    assert a.loc[1, "score"] == 0 and a.loc[1, "keep"] == 0
    assert a.loc[0, "keep"] == (1 if a.loc[0, "score"] > 0 else 0)


def test_kmeans_int_separates_two_blobs():
    from nospa_rdf_data_cube_validator_ray.stages.embedding import kmeans_int

    rows = []
    for i in range(6):
        base = 0.9 if i % 2 else -0.9
        rows.append(
            {"vec_id": i,
             "embedding": np.full(4, base, dtype=np.float32)
             + np.float32(0.01 * i)}
        )
    ds = ray.data.from_pandas(pd.DataFrame(rows))
    out = (
        kmeans_int(ds, k=2, iters=2)
        .to_pandas()
        .sort_values("vec_id", ignore_index=True)
    )
    # seeds are vec_id 0 (negative blob) and 1 (positive blob):
    # evens cluster with 0, odds with 1
    assert out["cluster"].tolist() == [0, 1, 0, 1, 0, 1]
    assert (out["dist2"] >= 0).all()
    again = (
        kmeans_int(ds, k=2, iters=2)
        .to_pandas()
        .sort_values("vec_id", ignore_index=True)
    )
    pd.testing.assert_frame_equal(out, again)


def test_kmeans_assign_batch_matches_fit_and_semdedup_keep_rule():
    from nospa_rdf_data_cube_validator_ray.stages.embedding import (
        kmeans_assign_batch,
        kmeans_int,
    )

    rng = np.random.default_rng(7)
    df = pd.DataFrame(
        {
            "vec_id": range(40),
            "embedding": [
                (rng.normal(size=4) + (3.0 if i % 2 else -3.0)).astype(
                    np.float32
                )
                for i in range(40)
            ],
        }
    )
    ds = ray.data.from_pandas(df)
    fit, cent = kmeans_int(ds, k=2, iters=2, return_centroids=True)
    fit = fit.to_pandas().sort_values("vec_id", ignore_index=True)
    # map-side re-assignment from the fitted centroids is bit-identical
    re_asg = (
        kmeans_assign_batch(df, cent)[["vec_id", "cluster", "dist2"]]
        .sort_values("vec_id", ignore_index=True)
    )
    pd.testing.assert_frame_equal(fit, re_asg)
    # duplicate group: two identical vectors — exactly one survives,
    # and it's the one FARTHER from its centroid (max dist2, tie low id)
    dup = pd.DataFrame(
        {
            "vec_id": [100, 101, 102],
            "embedding": [
                np.full(4, 1.0, dtype=np.float32),
                np.full(4, 1.0, dtype=np.float32),
                np.full(4, -1.0, dtype=np.float32),
            ],
        }
    )
    from nospa_rdf_data_cube_validator_ray.pipelines.training_data import (
        _semdedup_groups,
    )

    tagged = kmeans_assign_batch(dup, cent)
    res = _semdedup_groups(tagged).sort_values("vec_id", ignore_index=True)
    # identical vectors are a cosine-1 pair: min-label 100, exactly one
    # survivor picked by (dist2 DESC, vec_id ASC); the opposite vector
    # is a singleton and always keeps
    pair = res[res["vec_id"].isin([100, 101])]
    assert pair["keep"].sum() == 1
    assert (pair["sem_cluster"] == 100).all()
    assert res.loc[res["vec_id"] == 102, "keep"].all()
    # oversize cluster fails loud, not O(n²) silently
    import nospa_rdf_data_cube_validator_ray.pipelines.training_data as td

    big = pd.concat([tagged] * 2, ignore_index=True)
    orig = td._SEMDEDUP_MAX_CLUSTER
    td._SEMDEDUP_MAX_CLUSTER = 3
    try:
        with pytest.raises(RuntimeError, match="raise k"):
            _semdedup_groups(big)
    finally:
        td._SEMDEDUP_MAX_CLUSTER = orig


def test_dedup_normalized_collapses_reformatted_copies():
    from nospa_rdf_data_cube_validator_ray.stages import dedup as D

    docs = ray.data.from_pandas(
        pd.DataFrame(
            {
                "doc_id": pd.array([3, 1, 2], dtype="int64"),
                "text": ["Hello,  World!", "hello world", "other doc"],
            }
        )
    )

    def normalize(df):
        n = (
            df["text"].fillna("").str.lower()
            .str.replace(r"[^a-z0-9\s]", "", regex=True)
            .str.replace(r"\s+", " ", regex=True)
            .str.strip()
        )
        return pd.DataFrame(
            {"doc_id": df["doc_id"].astype("int64"), "norm": n.astype("string")}
        )

    kept = (
        D.exact_dedup(
            docs.map_batches(normalize, batch_format="pandas"), text_col="norm"
        )
        .to_pandas()
        .sort_values("doc_id", ignore_index=True)
    )
    # doc 3 ("Hello,  World!") normalizes to doc 1's text -> min id 1 kept
    assert kept["doc_id"].tolist() == [1, 2]


def test_zorder_interleave_matches_bit_definition():
    from nospa_rdf_data_cube_validator_ray.pipelines.relational import (
        q_events_zorder,
    )

    out = q_events_zorder("/root/testdata/sf0.001").to_pandas()
    import pyarrow.parquet as pq

    ev = pq.read_table(
        "/root/testdata/sf0.001/events.parquet",
        columns=["event_id", "ts", "user_id"],
    ).to_pandas()
    merged = out.merge(ev, on="event_id")
    row = merged.iloc[0]
    a = int(row["user_id"]) % 65536
    minutes = int(
        (row["ts"] - pd.Timestamp(0)) // pd.Timedelta(minutes=1)
    ) % 65536
    z = 0
    for i in range(16):
        z |= ((a >> i) & 1) << (2 * i)
        z |= ((minutes >> i) & 1) << (2 * i + 1)
    assert int(row["z"]) == z
    assert int(row["zbucket"]) == z >> 24


# -- SCC --------------------------------------------------------------------


SCC_GRAPH = [
    ("a", "b"), ("b", "c"), ("c", "a"),        # 3-cycle
    ("c", "d"), ("d", "e"), ("e", "d"),        # 2-cycle downstream
    ("e", "f"),                                # tail singleton
    ("g", "g"),                                # self-loop singleton
]


def test_scc_driver_labels():
    from nospa_rdf_data_cube_validator_ray.stages.graph import scc

    out = scc(_edges(SCC_GRAPH)).to_pandas().set_index("node")["label"]
    assert dict(out) == {
        "a": "a", "b": "a", "c": "a",
        "d": "d", "e": "d",
        "f": "f", "g": "g",
    }


def test_scc_regime_parity():
    from nospa_rdf_data_cube_validator_ray.stages.graph import scc

    edges = _edges(SCC_GRAPH)
    fast = scc(edges).to_pandas().sort_values("node", ignore_index=True)
    dist = (
        scc(edges, max_driver_edges=0)
        .to_pandas()
        .sort_values("node", ignore_index=True)
    )
    pd.testing.assert_frame_equal(fast, dist.astype(fast.dtypes.to_dict()))


def test_scc_distributed_acyclic_fast_path_and_chain_of_cycles():
    from nospa_rdf_data_cube_validator_ray.stages.graph import scc

    # descending chain: every node is its own color (no smaller id
    # reaches it) -> no intra-color edge -> acyclic fast path finishes
    # the whole graph in ONE outer round
    chain = [(f"n{i + 1:02d}", f"n{i:02d}") for i in range(4)]
    out = (
        scc(_edges(chain), max_driver_edges=0, max_outer_rounds=1)
        .to_pandas()
        .set_index("node")["label"]
    )
    assert all(out.index == out.to_numpy())
    # chained 2-cycles peel one SCC per outer round: 3 cycles can't
    # finish in 2 rounds
    cyc = [
        ("a1", "a2"), ("a2", "a1"), ("a2", "b1"),
        ("b1", "b2"), ("b2", "b1"), ("b2", "c1"),
        ("c1", "c2"), ("c2", "c1"),
    ]
    with pytest.raises(RuntimeError, match="outer_rounds"):
        scc(_edges(cyc), max_driver_edges=0, max_outer_rounds=2)


def test_dag_path_counts_hand_and_parity_and_cycle():
    from nospa_rdf_data_cube_validator_ray.stages.graph import dag_path_counts

    # diamond: r -> a, r -> b, a -> t, b -> t  (2 paths to t) plus tail
    dag = [("r", "a"), ("r", "b"), ("a", "t"), ("b", "t"), ("t", "u")]
    out = (
        dag_path_counts(_edges(dag)).to_pandas().set_index("node")["n_paths"]
    )
    assert dict(out) == {"r": 1, "a": 1, "b": 1, "t": 2, "u": 2}
    dist = (
        dag_path_counts(_edges(dag), max_driver_edges=0)
        .to_pandas()
        .set_index("node")["n_paths"]
    )
    assert dict(dist) == dict(out)
    # a root-free cycle stabilizes at 0 paths (no root reaches it) —
    # correct, not an error
    iso = dag_path_counts(_edges([("a", "b"), ("b", "a")])).to_pandas()
    assert iso["n_paths"].tolist() == [0, 0]
    # a cycle REACHABLE from a root grows forever -> must raise
    with pytest.raises(RuntimeError, match="converge"):
        dag_path_counts(_edges([("r", "a"), ("a", "b"), ("b", "a")]))


# ---------------------------------------------------------------------------
# ktruss
# ---------------------------------------------------------------------------


def test_ktruss_drops_bridges_and_keeps_triangle_mesh():
    from nospa_rdf_data_cube_validator_ray.stages.graph import ktruss

    # two triangles sharing edge (b, c) — every edge of the mesh is in
    # >=1 triangle; the pendant chain and the bridge peel away at k=3
    pairs = [
        ("a", "b"), ("b", "c"), ("a", "c"),
        ("b", "d"), ("c", "d"),
        ("d", "e"), ("e", "f"),
    ]
    out = ktruss(_edges(pairs), k=3).to_pandas()
    got = {(x, y): s for x, y, s in zip(out["x"], out["y"], out["support"])}
    assert got == {
        ("a", "b"): 1, ("a", "c"): 1, ("b", "c"): 2,
        ("b", "d"): 1, ("c", "d"): 1,
    }


def test_ktruss_regime_parity_and_cascade():
    from nospa_rdf_data_cube_validator_ray.stages.graph import ktruss

    # k=4 (support >= 2): the 4-clique survives; the extra triangle
    # hanging off it cascades away only on the SECOND peel round
    clique = [("a", "b"), ("a", "c"), ("a", "d"),
              ("b", "c"), ("b", "d"), ("c", "d")]
    tail = [("d", "e"), ("d", "f"), ("e", "f")]
    drv = ktruss(_edges(clique + tail), k=4).to_pandas()
    dist = ktruss(
        _edges(clique + tail), k=4, max_driver_edges=0
    ).to_pandas()
    key = lambda df: sorted(zip(df["x"], df["y"], df["support"]))
    assert key(drv) == key(dist)
    assert set(zip(drv["x"], drv["y"])) == {
        ("a", "b"), ("a", "c"), ("a", "d"),
        ("b", "c"), ("b", "d"), ("c", "d"),
    }
    assert set(drv["support"]) == {2}
    # triangle-free graph: no 3-truss at all, both regimes
    star = [("hub", f"leaf{i}") for i in range(4)]
    assert ktruss(_edges(star), k=3).count() == 0
    assert ktruss(_edges(star), k=3, max_driver_edges=0).count() == 0


def test_ktruss_raises_when_peel_outruns_the_bound():
    import pytest

    from nospa_rdf_data_cube_validator_ray.stages.graph import ktruss

    # triangle mesh + pendant chain needs TWO rounds (drop chain, then
    # verify the mesh is stable); a 1-round bound must raise, not
    # silently return the unverified superset
    pairs = [
        ("a", "b"), ("b", "c"), ("a", "c"),
        ("b", "d"), ("c", "d"),
        ("d", "e"), ("e", "f"),
    ]
    with pytest.raises(RuntimeError, match="still peeling"):
        ktruss(_edges(pairs), k=3, max_rounds=1)


def test_sssp_weighted_paths_and_regime_parity():
    from nospa_rdf_data_cube_validator_ray.stages.graph import (
        _md5_edge_w,
        sssp,
    )

    # diamond with a detour: s->a->t and the direct s->t edge compete on
    # md5-derived weights; compute the expected answer from the same kernel
    pairs = [("s", "a"), ("a", "t"), ("s", "t"), ("t", "u"), ("x", "y")]
    w = {
        (a, b): int(_md5_edge_w([a], [b], 9)[0]) for a, b in pairs
    }
    exp_t = min(w[("s", "t")], w[("s", "a")] + w[("a", "t")])
    drv = sssp(_edges(pairs), ["s"]).to_pandas()
    got = dict(zip(drv["node"], drv["dist"]))
    assert got["s"] == 0 and got["a"] == w[("s", "a")]
    assert got["t"] == exp_t and got["u"] == exp_t + w[("t", "u")]
    assert "x" not in got and "y" not in got  # disconnected component
    dist = sssp(_edges(pairs), ["s"], max_driver_edges=0).to_pandas()
    key = lambda df: sorted(zip(df["node"], df["dist"]))
    assert key(drv) == key(dist)


def test_sssp_raises_when_relaxation_outruns_the_bound():
    import pytest

    from nospa_rdf_data_cube_validator_ray.stages.graph import sssp

    chain = [(f"c{i}", f"c{i + 1}") for i in range(6)]
    with pytest.raises(RuntimeError, match="still relaxing"):
        sssp(_edges(chain), ["c0"], max_rounds=2)
