"""Training-data operator tests: text analysis, dedup families,
similarity search, multimodal plumbing."""

import numpy as np
import pandas as pd
import pytest

import ray.data

from nospa_rdf_data_cube_validator_ray.functions import text as T
from nospa_rdf_data_cube_validator_ray.stages import dedup as D
from nospa_rdf_data_cube_validator_ray.stages import embedding as E
from nospa_rdf_data_cube_validator_ray.stages import multimodal as M


def docs_ds():
    base = "the quick brown fox jumps over the lazy dog " * 8
    rows = [
        # 0/1: exact duplicates
        (0, base, "en", "srcA"),
        (1, base, "en", "srcA"),
        # 2: near-duplicate of 0 (one word changed)
        (2, base.replace("lazy", "sleepy", 1), "en", "srcA"),
        # 3: unrelated
        (3, "completely different content about databases and queries " * 6, "en", "srcA"),
        # 4: different block (other source)
        (4, base, "en", "srcB"),
        # 5: CJK for lang-id
        (5, "数据 立方体 验证 引擎 流式 处理 " * 10, "zh", "srcB"),
    ]
    df = pd.DataFrame(rows, columns=["doc_id", "text", "lang", "source"])
    df["n_chars"] = df["text"].str.len()
    return df, ray.data.from_pandas(df)


def test_text_stats():
    out = T.text_stats(pd.DataFrame({"doc_id": [1, 2], "text": ["Ab c!  2x", ""]}))
    r = out.set_index("doc_id")
    assert r.loc[1, "n_chars"] == 9
    assert r.loc[1, "n_tokens"] == 3
    assert r.loc[1, "n_punct"] == 1
    assert r.loc[1, "n_upper"] == 1
    assert r.loc[1, "n_digit"] == 1
    assert r.loc[2, "n_tokens"] == 0


def test_repetition_stats():
    out = T.repetition_stats(
        pd.DataFrame(
            {
                "doc_id": [1, 2, 3, 4],
                # 1: "a b" bigram dominates → repetitive
                "text": ["a b a b a b a b", "x y z w v u t s r q", "", "b a"],
            }
        )
    ).set_index("doc_id")
    assert out.loc[1, "n_tokens"] == 8
    assert out.loc[1, "n_distinct_tokens"] == 2
    assert out.loc[1, "top_token"] == "a"  # tie with "b" → lexicographic
    assert out.loc[1, "top_token_count"] == 4
    assert out.loc[1, "top_bigram_count"] == 4  # "a b" ×4
    assert out.loc[1, "is_repetitive"] == 1
    assert out.loc[2, "is_repetitive"] == 0
    assert out.loc[3, "n_tokens"] == 0 and out.loc[3, "top_token"] == ""
    assert out.loc[3, "is_repetitive"] == 0
    assert out.loc[4, "top_token"] == "a" and out.loc[4, "top_bigram_count"] == 1
    # empty batch keeps the schema
    empty = T.repetition_stats(pd.DataFrame({"doc_id": [], "text": []}))
    assert list(empty.columns) == list(out.reset_index().columns)


def test_lang_id_scripts():
    df, _ = docs_ds()
    out = T.lang_id(df).set_index("doc_id")["lang_pred"]
    assert out[5] == "zh"
    assert out[0] == "en"


def test_fingerprint_deterministic():
    df, _ = docs_ds()
    a = T.fingerprint(df)
    b = T.fingerprint(df)
    pd.testing.assert_frame_equal(a, b)
    assert (a["n_fingerprints"] > 0).all()
    # identical docs → identical fingerprint summaries
    assert a.loc[0, "fp_xor"] == a.loc[1, "fp_xor"]
    assert a.loc[0, "fp_xor"] != a.loc[3, "fp_xor"]


def test_exact_dedup():
    _, ds = docs_ds()
    kept = D.exact_dedup(ds).to_pandas()
    ids = sorted(kept["doc_id"])
    # doc 1 and 4 are exact dups of doc 0 → only min id 0 survives
    assert ids == [0, 2, 3, 5]


def test_jaccard_block_pairs():
    _, ds = docs_ds()
    pairs = D.jaccard_block_pairs(
        ds, block_cols=("lang", "source"), threshold_num=8, threshold_den=10
    ).to_pandas()
    got = {(a, b) for a, b in zip(pairs["doc_id_a"], pairs["doc_id_b"])}
    assert (0, 1) in got          # identical
    assert (0, 2) in got          # near-dup
    assert (0, 3) not in got      # unrelated
    assert (0, 4) not in got      # other block, never compared
    r = pairs.set_index(["doc_id_a", "doc_id_b"]).loc[(0, 1)]
    assert r["n_inter"] == r["n_union"]  # identical word sets


def test_jaccard_ngram_pairs():
    _, ds = docs_ds()
    # trigram Jaccard is order-sensitive: exact dups still pair, the
    # one-word-changed near-dup needs a lower threshold than word-set
    pairs = D.jaccard_block_pairs(
        ds, block_cols=("lang", "source"), ngram=3,
        threshold_num=7, threshold_den=10,
    ).to_pandas()
    got = {(a, b) for a, b in zip(pairs["doc_id_a"], pairs["doc_id_b"])}
    assert (0, 1) in got          # identical → trigram jaccard 1
    assert (0, 2) in got          # near-dup: 1 changed word kills ≤3 trigrams
    assert (0, 3) not in got


def test_jaccard_clusters():
    _, ds = docs_ds()
    out = D.jaccard_clusters(ds).to_pandas().sort_values("doc_id")
    # {0,1,2} near-dup cluster in (en,srcA); 3 unrelated; 4/5 other blocks
    assert dict(zip(out.doc_id, out.cluster_id)) == {0: 0, 1: 0, 2: 0, 3: 3, 4: 4, 5: 5}


def test_jaccard_clusters_distributed_parity():
    # force the cc_labels join-rounds path (max_driver_edges=0) and check
    # it matches the driver union-find path on the same input — incl. a
    # 3-hop near-dup chain that needs >1 propagation round
    _, ds = docs_ds()
    small = D.jaccard_clusters(ds).to_pandas()
    dist = D.jaccard_clusters(
        ds, max_driver_edges=0, num_partitions=2
    ).to_pandas()
    a = dict(zip(small.doc_id, small.cluster_id))
    b = dict(zip(dist.doc_id, dist.cluster_id))
    assert a == b


def test_benchmark_contamination():
    import ray.data as rd

    from nospa_rdf_data_cube_validator_ray.stages.dedup import (
        _md5_u64,
        shingle_set,
    )

    docs = pd.DataFrame(
        {
            "doc_id": range(40),
            "text": [
                f"shared prefix tokens doc {i} unique tail {i * 7}"
                if i % 3 else "completely shared benchmark sentence here"
                for i in range(40)
            ],
        }
    )
    ds = rd.from_pandas(docs).repartition(3)
    out = D.benchmark_contamination(ds, bench_mod=4).to_pandas()
    # mini-oracle in pure python
    bench_ids = {i for i in range(40) if _md5_u64(str(i)) % 4 == 0}
    grams = set()
    for i in bench_ids:
        grams.update(shingle_set(docs.text[i], 3))
    exp = {}
    for i in range(40):
        if i in bench_ids:
            continue
        sh = shingle_set(docs.text[i], 3)
        ov = sum(1 for s in sh if s in grams)
        exp[i] = (len(sh), ov, int(ov >= 1))
    got = {
        int(r.doc_id): (int(r.n_grams), int(r.n_overlap), int(r.contaminated))
        for r in out.itertuples()
    }
    assert got == exp
    assert bench_ids.isdisjoint(got)
    # the %3==0 non-bench docs share all shingles with bench copies
    assert any(v[2] for v in exp.values())


def test_pack_sequences_matches_pandas_cumsum():
    import ray.data as rd

    from nospa_rdf_data_cube_validator_ray.stages.packing import pack_sequences

    docs = pd.DataFrame(
        {
            "doc_id": range(97),  # odd count -> uneven blocks
            "text": [" ".join(["tok"] * ((i * 7) % 13 + 1)) for i in range(97)],
        }
    )
    # shuffle input order: packing must sort by doc_id itself
    ds = rd.from_pandas(docs.sample(frac=1, random_state=3)).repartition(5)
    got = pack_sequences(ds, window=16).to_pandas().sort_values("doc_id")
    n = docs["text"].str.count(r"\S+").astype("int64")
    start = n.cumsum() - n
    assert list(got["n_tokens"]) == list(n)
    assert list(got["start_tok"]) == list(start)
    assert list(got["pack_id"]) == list(start // 16)
    assert got["pack_id"].nunique() > 5  # actually spans many packs


def test_union_find_labels_chain():
    import ray.data as rd

    from nospa_rdf_data_cube_validator_ray.stages.canonicalize import (
        _union_find_labels,
    )

    # 0-1-2-...-9 chain (symmetric edges): one component rooted at 0
    e = pd.DataFrame({"src": list(range(9)) + list(range(1, 10)),
                      "dst": list(range(1, 10)) + list(range(9))})
    out = _union_find_labels(rd.from_pandas(e)).to_pandas()
    assert set(out.label) == {0} and len(out) == 10
    # string nodes: lexicographic min root, dtype preserved
    es = pd.DataFrame({"src": ["b", "c", "a"], "dst": ["c", "b", "c"]})
    outs = _union_find_labels(rd.from_pandas(es)).to_pandas()
    assert set(outs.label) == {"a"} and len(outs) == 3


def test_minhash_lsh_pairs():
    _, ds = docs_ds()
    pairs = D.minhash_lsh_pairs(ds, threshold=0.7).to_pandas()
    got = {(a, b) for a, b in zip(pairs["doc_id_a"], pairs["doc_id_b"])}
    assert (0, 1) in got and (0, 4) in got and (1, 4) in got  # exact dups
    assert (0, 2) in got                                       # near-dup
    assert not any(3 in p for p in got)                        # unrelated


def test_simhash_pairs():
    _, ds = docs_ds()
    pairs = D.simhash_pairs(ds, max_hamming=3).to_pandas()
    got = {(a, b) for a, b in zip(pairs["doc_id_a"], pairs["doc_id_b"])}
    assert (0, 1) in got
    assert not any(3 in p and 5 not in p for p in got if p != (0, 1) and 3 in p)
    table = D.simhash_table(ds).to_pandas().set_index("doc_id")
    assert table.loc[0, "simhash"] == table.loc[1, "simhash"]


def embeddings_ds(n=50, dim=16, seed=7):
    rng = np.random.RandomState(seed)
    mat = rng.standard_normal((n, dim))
    df = pd.DataFrame({"vec_id": range(n), "embedding": [r.tolist() for r in mat]})
    return mat, ray.data.from_pandas(df)


def test_knn_topk_matches_numpy():
    mat, ds = embeddings_ds()
    out = E.knn_topk(ds, query_ids=[0, 1, 2], k=4)
    N = mat / np.linalg.norm(mat, axis=1, keepdims=True)
    C = N @ N.T
    for q in (0, 1, 2):
        order = [j for j in np.lexsort((np.arange(len(mat)), -C[q])) if j != q][:4]
        got = out[out["query_id"] == q].sort_values("rank")["neighbor_id"].tolist()
        assert got == order


def test_cosine_threshold_pairs_matches_numpy():
    mat, ds = embeddings_ds()
    thr = 0.5
    out = E.cosine_threshold_pairs(ds, threshold=thr).to_pandas()
    N = mat / np.linalg.norm(mat, axis=1, keepdims=True)
    C = N @ N.T
    iu = np.triu_indices(len(mat), 1)
    expected = {
        (int(a), int(b)) for a, b in zip(*iu) if C[a, b] >= thr
    }
    got = {(a, b) for a, b in zip(out["vec_id_a"], out["vec_id_b"])}
    assert got == expected


def test_ivf_topk_recall():
    mat, ds = embeddings_ds()
    exact = E.knn_topk(ds, query_ids=[0, 1, 2], k=4)
    approx = E.ivf_topk(ds, query_ids=[0, 1, 2], k=4, nlist=8, nprobe=8)
    # nprobe == nlist → every list probed → exact agreement
    assert approx.equals(exact)
    # fewer probes: valid shape, deterministic, recall may drop
    a1 = E.ivf_topk(ds, query_ids=[0, 1, 2], k=4, nlist=8, nprobe=2)
    a2 = E.ivf_topk(ds, query_ids=[0, 1, 2], k=4, nlist=8, nprobe=2)
    assert a1.equals(a2)
    hits = len(
        set(map(tuple, a1[["query_id", "neighbor_id"]].values))
        & set(map(tuple, exact[["query_id", "neighbor_id"]].values))
    )
    assert hits >= 6  # ≥ 50% recall on this easy set


def test_lsh_pairs_subset_of_exact():
    mat, ds = embeddings_ds()
    thr = 0.5
    exact = E.cosine_threshold_pairs(ds, threshold=thr).to_pandas()
    exact_set = {(a, b) for a, b in zip(exact["vec_id_a"], exact["vec_id_b"])}
    lsh = E.lsh_cosine_pairs(ds, dim=16, threshold=thr, n_planes=4).to_pandas()
    lsh_set = {(a, b) for a, b in zip(lsh["vec_id_a"], lsh["vec_id_b"])}
    assert lsh_set <= exact_set


def test_multimodal_fake_and_real():
    _, ds = docs_ds()
    feats = M.decode_features(M.attach_payload(ds), mode="fake").to_pandas()
    assert len(feats) == 6
    row = feats.set_index("doc_id").loc[0]
    assert int(sum(row["features"])) == row["n_bytes"]  # histogram sums to bytes
    assert len(row["features"]) == 16
    with pytest.raises(ValueError):
        M.DecodeFeatures(mode="nope")
    # real mode decodes bmp/wav, raises for opaque media types
    with pytest.raises(ValueError, match="no decoder"):
        M.DecodeFeatures(mode="real")(
            pd.DataFrame({"payload": [b"x"], "doc_id": [0], "n_bytes": [1],
                          "media_type": ["application/octet-stream"]})
        )


def test_multimodal_resize_and_frames():
    _, ds = docs_ds()
    payloads = M.attach_payload(ds).materialize()
    resized = M.resize_payloads(payloads, target_bytes=100).to_pandas()
    assert (resized["n_bytes"] <= 100).all()
    # deterministic subsample
    again = M.resize_payloads(payloads, target_bytes=100).to_pandas()
    assert resized.sort_values("doc_id")["payload"].tolist() == \
        again.sort_values("doc_id")["payload"].tolist()
    frames = M.sample_frames(payloads, frame_bytes=64, stride=4).to_pandas()
    r = frames.set_index("doc_id").loc[0]
    orig = payloads.to_pandas().set_index("doc_id").loc[0, "n_bytes"]
    expected = len(range(0, int(orig), 64)[::4])
    assert r["n_frames"] == expected
    with pytest.raises(ValueError, match="video/x-nbv"):
        M.SampleFrames(mode="real")(
            pd.DataFrame({"payload": [b"x"], "doc_id": [0],
                          "media_type": ["application/octet-stream"]})
        )


def test_codecs_roundtrip():
    import numpy as np

    from nospa_rdf_data_cube_validator_ray.functions import codecs as C

    rng = np.random.RandomState(9)
    px = rng.randint(0, 256, size=(7, 5, 3), dtype=np.uint8)  # odd width → row padding
    assert (C.decode_bmp(C.encode_bmp(px)) == px).all()
    s = rng.randint(-32768, 32767, size=333).astype(np.int16)
    rate, got = C.decode_wav(C.encode_wav(s, rate=8000))
    assert rate == 8000 and (got == s).all()
    frames = [rng.randint(0, 256, size=(4, 4, 3), dtype=np.uint8) for _ in range(5)]
    back = [C.decode_bmp(f) for f in C.iter_nbv_frames(C.encode_nbv(frames))]
    assert len(back) == 5 and all((a == b).all() for a, b in zip(back, frames))
    small = C.resize_nn(px, 3, 2)
    assert small.shape == (3, 2, 3)


def test_multimodal_real_decode_pipeline():
    """mode='real' over real BMP / WAV / NBV payloads end-to-end."""
    _, ds = docs_ds()
    # image: decode features carry true dimensions
    bmp = M.attach_payload(ds, media="bmp").materialize()
    feats = M.decode_features(bmp, mode="real").to_pandas()
    f0 = feats.set_index("doc_id").loc[0, "features"]
    assert len(f0) == 6 and f0[0] >= 4 and f0[0] == f0[1]  # square side ≥ 4
    # image: real resize → valid BMP at target side
    from nospa_rdf_data_cube_validator_ray.functions import codecs as C

    rez = M.resize_payloads(bmp, mode="real", target_side=6).to_pandas()
    assert all(
        C.decode_bmp(bytes(p)).shape == (6, 6, 3) for p in rez["payload"]
    )
    # audio: rate + sample count features
    wav = M.attach_payload(ds, media="wav")
    af = M.decode_features(wav, mode="real").to_pandas()
    a0 = af.set_index("doc_id").loc[0, "features"]
    assert a0[0] == 8000.0 and a0[1] >= 64
    # video: stride-2 keeps every other frame of the 4-frame clips
    nbv = M.attach_payload(ds, media="nbv")
    fr = M.sample_frames(nbv, stride=2, mode="real").to_pandas()
    assert (fr["n_frames"] == 2).all()
    assert all(
        C.decode_bmp(bytes(f)).shape == (8, 8, 3)
        for f in fr["frames"].iloc[0]
    )


def test_split_leakage_safe_invariant():
    """Docs sharing a near-dup cluster always land in the same split."""
    from nospa_rdf_data_cube_validator_ray.pipelines.training_data import (
        q_docs_split_leakage_safe,
    )
    from nospa_rdf_data_cube_validator_ray.stages.dedup import _md5_u64

    df = q_docs_split_leakage_safe("/root/testdata/sf0.001").to_pandas()
    assert (df.groupby("cluster_id")["split"].nunique() == 1).all()
    # the guard is actually exercised: some cluster holds >1 doc
    sizes = df.groupby("cluster_id").size()
    assert (sizes > 1).any()
    # split rule matches the shared stable-hash convention
    row = df.iloc[0]
    h = _md5_u64(f"{int(row['cluster_id'])}:split") % 100
    expected = "train" if h < 80 else ("val" if h < 90 else "test")
    assert row["split"] == expected


def test_resample_audio_decimation():
    """ResampleAudio keeps exactly every k-th sample at rate // k."""
    import numpy as np

    from nospa_rdf_data_cube_validator_ray.functions import codecs as C

    rng = np.random.RandomState(3)
    s = rng.randint(-32768, 32767, size=1001).astype(np.int16)
    df = pd.DataFrame(
        {
            "doc_id": [7],
            "payload": [C.encode_wav(s, rate=8000)],
            "media_type": ["audio/wav"],
        }
    )
    out = M.ResampleAudio(factor=4)(df)
    rate, got = C.decode_wav(bytes(out.loc[0, "payload"]))
    assert rate == 2000 and (got == s[::4]).all()
    with pytest.raises(ValueError, match="audio/wav"):
        M.ResampleAudio(factor=4)(
            pd.DataFrame({"payload": [b"x"], "doc_id": [0],
                          "media_type": ["image/bmp"]})
        )
    with pytest.raises(ValueError):
        M.ResampleAudio(factor=0)


def test_scene_cuts_kernel():
    import numpy as np

    from nospa_rdf_data_cube_validator_ray.functions import codecs as C

    lo = np.zeros((4, 4, 3), dtype=np.uint8)
    hi = np.full((4, 4, 3), 200, dtype=np.uint8)
    clip = [lo, hi, hi, lo]  # two hard cuts, one still segment
    df = pd.DataFrame(
        {
            "doc_id": [1],
            "frames": [[C.encode_bmp(f) for f in clip]],
        }
    )
    out = M.SceneCuts(threshold=1000)(df)
    assert out.loc[0, "n_cuts"] == 2
    assert out.loc[0, "max_delta"] == 200 * 48
    with pytest.raises(ValueError, match=">= 2 frames"):
        M.SceneCuts()(pd.DataFrame({"doc_id": [0],
                                    "frames": [[C.encode_bmp(lo)]]}))


def test_audio_vad_kernel():
    import numpy as np

    from nospa_rdf_data_cube_validator_ray.functions import codecs as C

    # 3 full frames of 4 samples + a dropped 2-sample tail
    s = np.array([100, -100, 100, -100,    # energy 400
                  1, -1, 1, -1,            # energy 4
                  50, 50, 50, 50,          # energy 200
                  9, 9], dtype=np.int16)
    df = pd.DataFrame(
        {
            "doc_id": [3],
            "payload": [C.encode_wav(s, rate=8000)],
            "media_type": ["audio/wav"],
        }
    )
    out = M.AudioVAD(frame=4, threshold=150)(df)
    assert out.loc[0, "n_frames"] == 3
    assert out.loc[0, "n_active"] == 2  # 400 and 200 beat 150; tail dropped
    assert out.loc[0, "total_energy"] == 604
    with pytest.raises(ValueError, match="audio/wav"):
        M.AudioVAD()(pd.DataFrame({"payload": [b"x"], "doc_id": [0],
                                   "media_type": ["image/bmp"]}))


def test_resize_real_matches_manual_nn():
    """Real resize through the payload pipeline equals a hand resize."""
    import numpy as np

    from nospa_rdf_data_cube_validator_ray.functions import codecs as C

    rng = np.random.RandomState(5)
    px = rng.randint(0, 256, size=(13, 13, 3), dtype=np.uint8)
    df = pd.DataFrame(
        {
            "doc_id": [1],
            "payload": [C.encode_bmp(px)],
            "media_type": ["image/bmp"],
        }
    )
    out = M.ResizeImage(mode="real", target_side=8)(df)
    got = C.decode_bmp(bytes(out.loc[0, "payload"]))
    assert (got == C.resize_nn(px, 8, 8)).all()


def test_pii_scrub_kernel():
    df = pd.DataFrame(
        {
            "doc_id": [0, 1, 2, 3],
            "text": [
                "mail a.b+c@foo.org and x@y.io now",
                "call +1-555-0199 or +44-123-4567 at 10.0.0.1",
                None,
                "v1.2.3.4beta is a version, not 5.6.7.8",  # \b guards
            ],
        }
    )
    out = T.pii_scrub(df).set_index("doc_id")
    assert out.loc[0, "n_email"] == 2 and out.loc[0, "n_phone"] == 0
    assert out.loc[1, "n_phone"] == 2 and out.loc[1, "n_ipv4"] == 1
    assert out.loc[2, "clean_len"] == 0 and out.loc[2, "n_email"] == 0
    # 1.2.3.4 touches the word char 'v' on the left (no \b) but 'beta'
    # on the right is also word-material: only the standalone IP matches
    assert out.loc[3, "n_ipv4"] == 1
    # scrubbed text is PII-free: re-scrub is a fixpoint
    from nospa_rdf_data_cube_validator_ray.functions.text import (
        _EMAIL_RE,
        _PHONE_RE,
    )

    assert out.loc[1, "clean_len"] == len("call <PHONE> or <PHONE> at <IP>")


def test_doc_len_quantiles_index_rule():
    # n=1 group: every quantile is the single value; n=4: idx 0,1,2,2
    import duckdb

    df = pd.DataFrame(
        {
            "source": ["a", "b", "b", "b", "b"],
            "n_chars": [7, 10, 40, 20, 30],
        }
    )
    con = duckdb.connect()
    con.register("documents", df)
    from nospa_rdf_data_cube_validator_ray.pipelines.training_data import (
        _SQL_LEN_QUANTILES,
    )

    out = con.execute(_SQL_LEN_QUANTILES).df().set_index("source")
    assert list(out.loc["a"]) == [1, 7, 7, 7, 7]
    assert list(out.loc["b"]) == [4, 10, 20, 30, 30]


def test_tfidf_score_is_exact_division():
    # score column must be bit-exact tf/df so the oracle hash matches
    import os

    df = pd.DataFrame(
        {
            "doc_id": [0, 1],
            "text": ["a a b unique", "a b b"],
            "lang": ["en"] * 2,
            "source": ["s"] * 2,
            "n_chars": [10, 5],
        }
    )
    from nospa_rdf_data_cube_validator_ray.pipelines.training_data import (
        q_doc_tfidf_topk,
    )

    os.makedirs("/tmp/tfidf_sf", exist_ok=True)
    df.to_parquet("/tmp/tfidf_sf/documents.parquet", index=False)
    out = (
        q_doc_tfidf_topk("/tmp/tfidf_sf")
        .to_pandas()
        .sort_values(["doc_id", "rank"])
        .reset_index(drop=True)
    )
    d0 = out[out.doc_id == 0]
    # doc 0: unique (tf1/df1=1.0) > a (2/2) = 1.0 tie -> 'a' first by token
    assert list(d0.token) == ["a", "unique", "b"]
    assert d0.score.iloc[0] == 1.0 and d0.score.iloc[2] == 0.5


def test_global_rank_total_order_across_blocks():
    from nospa_rdf_data_cube_validator_ray.stages.packing import global_rank

    # many duplicate sort values spread over blocks: the doc_id
    # tie-breaker must still produce a dense 1..N permutation
    df = pd.DataFrame({"doc_id": range(100), "n_chars": [7] * 50 + [3] * 50})
    ds = ray.data.from_pandas(df).repartition(8)
    out = (
        global_rank(ds, keys=["n_chars", "doc_id"], descending=[True, False])
        .to_pandas()
        .sort_values("rank")
    )
    assert list(out["rank"]) == list(range(1, 101))
    # n_chars=7 ids (0..49) outrank n_chars=3 ids, each in id order
    assert list(out["doc_id"]) == list(range(100))


def test_bpe_pairs_counts_and_doc_boundaries(tmp_path):
    from nospa_rdf_data_cube_validator_ray.pipelines.training_data import (
        q_docs_bpe_pairs,
    )

    docs = pd.DataFrame(
        {"doc_id": [1, 2, 3], "text": ["abab", "ba", None]}
    )
    docs.to_parquet(tmp_path / "documents.parquet")
    out = q_docs_bpe_pairs(str(tmp_path))
    got = dict(zip(out["pair"], out["n"]))
    # "abab" → ab, ba, ab ; "ba" → ba ; NO cross-doc pair (b↔b), NULL
    # text contributes nothing
    assert got == {"ab": 2, "ba": 2}
    # deterministic order: n desc, pair asc
    assert list(out["pair"]) == ["ab", "ba"]


def test_image_hist_bins_sum_to_pixel_count():
    _, ds = docs_ds()
    bmp = M.attach_payload(ds, media="bmp").materialize()
    hist = M.image_hist(bmp).to_pandas()
    stats = M.image_stats(bmp).to_pandas().set_index("doc_id")
    assert set(hist["bin"]) <= set(range(16))
    per_doc = hist.groupby("doc_id")
    # all 16 bins present per doc; counts sum to H*W*3 bytes
    assert (per_doc["bin"].count() == 16).all()
    for doc_id, total in per_doc["n_px"].sum().items():
        assert total == stats.loc[doc_id, "height"] * stats.loc[doc_id, "width"] * 3
