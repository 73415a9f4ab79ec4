"""End-to-end invariants beyond the fixture findings: sha256 preservation,
normalized-triple export, selective validation, checkpoint/shuffle parity."""

import hashlib

import pytest

import ray.data

from nospa_rdf_data_cube_validator_ray import CubeValidator
from nospa_rdf_data_cube_validator_ray import fixtures
from nospa_rdf_data_cube_validator_ray import vocab as V
from nospa_rdf_data_cube_validator_ray.model import split_graph_id


@pytest.fixture(scope="module")
def corpus():
    return fixtures.corpus_table()


def test_sha256_preserved_end_to_end(corpus):
    """north rule: per-row content sha256 equality, input → triple stream →
    findings."""
    expected = {
        f"cubes/{name}.ttl": hashlib.sha256(content.encode()).hexdigest()
        for name, (content, _e) in fixtures.all_cases().items()
    }
    v = CubeValidator(ray.data.from_arrow(corpus))
    triples = v.normalize().to_pandas()
    for g, sha in triples[["graph", "file_sha256"]].drop_duplicates().itertuples(index=False):
        _repo, path, _commit = split_graph_id(g)
        assert expected[path] == sha
    findings = v.findings_df()
    for g, sha in findings[["graph", "file_sha256"]].drop_duplicates().itertuples(index=False):
        if not sha:
            continue  # driver-side rows for graphs without observations keep ""
        _repo, path, _commit = split_graph_id(g)
        assert expected[path] == sha


def test_normalized_triple_export(corpus, tmp_path):
    """exportModel parity (NospaValidator.java:56-67): the normalized set
    contains the phase-1 type closure and phase-2 pushdowns of the
    abbreviated cube (Normalizer.java:23-72,90-189)."""
    v = CubeValidator(ray.data.from_arrow(corpus))
    out = v.normalized_triples().to_pandas()
    ab = out[out["graph"].str.contains("ABBREV")]
    spo = {(s, p, o) for s, p, o in zip(ab["subj"], ab["pred"], ab["obj"])}
    ex = "http://example.org/cube#"
    # phase 1: obs + dataset types derived from qb:dataSet
    assert (f"{ex}ao1", V.RDF_type, V.QB_Observation) in spo
    assert (f"{ex}ads", V.RDF_type, V.QB_DataSet) in spo
    # phase 1: componentProperty + property types from qb:dimension/measure
    assert (f"{ex}adim", V.RDF_type, V.QB_DimensionProperty) in spo
    assert (f"{ex}aval", V.RDF_type, V.QB_MeasureProperty) in spo
    # no duplicates after exact dedup
    cols = ["graph", "subj", "pred", "obj_kind", "obj", "obj_dt", "obj_lang"]
    assert not out.duplicated(cols).any()
    # write_parquet round-trip
    v.export_model(str(tmp_path / "model"))
    back = ray.data.read_parquet(str(tmp_path / "model")).count()
    assert back == len(out)


def test_export_nquads_roundtrip(corpus, tmp_path):
    """fmt='nquads' writes the graph column as the 4th term; re-parsing
    the part files through the normal front end recovers the same
    per-predicate triple counts and one graph label per source graph."""
    from nospa_rdf_data_cube_validator_ray.sources.parse_stage import (
        parse_corpus,
    )

    import pyarrow as pa

    v = CubeValidator(ray.data.from_arrow(corpus))
    out = v.normalized_triples().to_pandas()
    v.export_model(str(tmp_path / "nq"), fmt="nquads")
    import glob

    files = sorted(glob.glob(str(tmp_path / "nq" / "*.nq")))
    assert files
    rows = {
        "repo": [], "path": [], "commit": [], "lang": [], "content": [],
    }
    for i, f in enumerate(files):
        rows["repo"].append("m")
        rows["path"].append(f"p{i}.nq")
        rows["commit"].append("c")
        rows["lang"].append("nquads")
        rows["content"].append(open(f).read())
    back = parse_corpus(
        ray.data.from_arrow(
            pa.table({k: pa.array(v_, pa.string()) for k, v_ in rows.items()})
        )
    ).to_pandas()
    assert len(back) == len(out)
    assert (
        back["pred"].value_counts().sort_index()
        == out["pred"].value_counts().sort_index()
    ).all()
    # every graph label is the urn-mapped original graph id
    assert all(g.startswith("urn:graph:") for g in back["graph"].unique())
    assert back["graph"].nunique() == out["graph"].nunique()


def test_selective_validation(corpus):
    v = CubeValidator(ray.data.from_arrow(corpus))
    only12 = v.validate(["IC12"]).to_pandas()
    assert set(only12["ic"]) == {"IC12"}
    allf = v.findings_df()
    assert len(only12) == (allf["ic"] == "IC12").sum()


def test_checkpoint_shuffle_parity(corpus, tmp_path):
    """Parquet checkpoint breaks file↔block alignment → auto mode must pick
    the shuffle path and produce identical findings."""
    v_local = CubeValidator(ray.data.from_arrow(corpus))
    v_ckpt = CubeValidator(
        ray.data.from_arrow(corpus), checkpoint_dir=str(tmp_path / "ckpt")
    )
    assert v_ckpt.mode == "shuffle"
    a = v_local.findings_df().sort_values(["graph", "ic", "subject"]).reset_index(drop=True)
    b = v_ckpt.findings_df().sort_values(["graph", "ic", "subject"]).reset_index(drop=True)
    a["detail"] = a["detail"].map(tuple)
    b["detail"] = b["detail"].map(tuple)
    assert a.equals(b)


def test_strict_parse_off_skips_bad_rows():
    import pyarrow as pa

    bad = pa.table(
        {
            "repo": ["r", "r"],
            "path": ["good.ttl", "bad.ttl"],
            "commit": ["c", "c"],
            "lang": ["turtle", "turtle"],
            "content": [
                "@prefix ex: <http://e.org/> . ex:s ex:p ex:o .",
                "@prefix ex: <http://e.org/ . BROKEN",
            ],
        }
    )
    v = CubeValidator(ray.data.from_arrow(bad), strict_parse=False)
    t = v.normalize().to_pandas()
    assert set(t["graph"].map(lambda g: split_graph_id(g)[1])) == {"good.ttl"}


def test_non_rdf_only_corpus():
    """A corpus with zero RDF rows must validate cleanly to zero findings."""
    import pyarrow as pa

    noise = pa.table(
        {
            "repo": ["r"], "path": ["main.py"], "commit": ["c"],
            "lang": ["python"], "content": ["print('hi')\n"],
        }
    )
    v = CubeValidator(ray.data.from_arrow(noise))
    df = v.findings_df()
    assert len(df) == 0
    assert list(df.columns) == ["graph", "file_sha256", "ic", "subject", "detail"]


def test_empty_and_nonrdf_corpora(ray_session):
    """Zero-RDF and minimal corpora flow through without schema-less-block
    crashes; findings are empty."""
    import pyarrow as pa
    import ray.data

    from nospa_rdf_data_cube_validator_ray import CubeValidator

    t = pa.table(
        {"repo": ["r"], "path": ["x.py"], "commit": ["c"],
         "lang": ["python"], "content": ["print(1)"]}
    )
    assert len(CubeValidator(corpus=ray.data.from_arrow(t)).findings_df()) == 0
    t2 = pa.table(
        {"repo": ["r"], "path": ["a.ttl"], "commit": ["c"], "lang": ["turtle"],
         "content": ["<http://e/s> <http://e/p> <http://e/o> ."]}
    )
    assert len(CubeValidator(corpus=ray.data.from_arrow(t2)).findings_df()) == 0


def test_asof_join_semantics():
    import pandas as pd
    import ray.data as rd

    from nospa_rdf_data_cube_validator_ray.pipelines.relational import asof_join

    left = rd.from_pandas(
        pd.DataFrame(
            {"event_id": [1, 2, 3, 4, 5],
             "user_id": [7, 7, 7, 8, 8],
             "ts_us": [10, 20, 30, 10, 50]}
        )
    ).repartition(2)
    right = rd.from_pandas(
        pd.DataFrame(
            {"user_id": [7, 7, 8],
             "ts_us": [20, 25, 60],
             "v": [1.5, 2.5, 9.0]}
        )
    ).repartition(2)
    out = (
        asof_join(left, right, by="user_id", on="ts_us", right_vals=["v"])
        .to_pandas()
        .sort_values("event_id")
    )
    got = list(out["v"])
    # event 1: before any right row -> NaN; event 2: exact match ts 20;
    # event 3: latest <= 30 is ts 25; user 8 events both before ts 60 -> NaN
    assert pd.isna(got[0]) and got[1] == 1.5 and got[2] == 2.5
    assert pd.isna(got[3]) and pd.isna(got[4])


def test_range_join_semantics():
    import pandas as pd
    import ray.data as rd

    from nospa_rdf_data_cube_validator_ray.pipelines.relational import range_join

    left = rd.from_pandas(
        pd.DataFrame(
            {"event_id": [1, 2, 3, 4],
             "user_id": [7, 7, 7, 8],
             "ts_us": [5, 15, 25, 100]}
        )
    ).repartition(2)
    # non-overlapping intervals per user; ts 25 falls in the gap
    right = rd.from_pandas(
        pd.DataFrame(
            {"user_id": [7, 7, 8],
             "start_us": [0, 30, 90],
             "end_us": [20, 40, 110],
             "sid": [1, 2, 9]}
        )
    )
    out = (
        range_join(
            left, right, by="user_id", on="ts_us",
            start="start_us", end="end_us", right_vals=["sid"],
        )
        .to_pandas()
        .sort_values("event_id")
    )
    assert dict(zip(out.event_id, out.sid)) == {1: 1, 2: 1, 4: 9}  # 3 dropped


def test_asof_join_one_sided_buckets_and_string_keys():
    import pandas as pd
    import ray.data as rd

    from nospa_rdf_data_cube_validator_ray.pipelines.relational import asof_join

    # sparse right side: one key matching no left rows -> many buckets
    # hold only one side; must yield a clean left join, not a KeyError
    left = rd.from_pandas(
        pd.DataFrame(
            {"event_id": range(40), "user_id": list(range(40)),
             "ts_us": [10] * 40}
        )
    ).repartition(4)
    right = rd.from_pandas(
        pd.DataFrame({"user_id": [1000], "ts_us": [5], "v": [3.0]})
    )
    out = asof_join(
        left, right, by="user_id", on="ts_us", right_vals=["v"]
    ).to_pandas()
    assert len(out) == 40 and out["v"].isna().all()
    assert out["event_id"].dtype == "int64"  # no float promotion of ids

    # entirely empty right side
    empty = rd.from_pandas(
        pd.DataFrame({"user_id": pd.Series(dtype="int64"),
                      "ts_us": pd.Series(dtype="int64"),
                      "v": pd.Series(dtype="float64")})
    )
    out2 = asof_join(
        left, empty, by="user_id", on="ts_us", right_vals=["v"]
    ).to_pandas()
    assert len(out2) == 40 and out2["v"].isna().all()

    # string by-keys are supported (generic operator)
    ls = rd.from_pandas(
        pd.DataFrame({"event_id": [1, 2], "user_id": ["a", "b"],
                      "ts_us": [10, 10]})
    )
    rs = rd.from_pandas(
        pd.DataFrame({"user_id": ["a"], "ts_us": [5], "v": [7.0]})
    )
    out3 = asof_join(
        ls, rs, by="user_id", on="ts_us", right_vals=["v"]
    ).to_pandas().sort_values("event_id")
    assert list(out3["v"])[0] == 7.0 and pd.isna(list(out3["v"])[1])


def test_cluster_from_pairs_regime_contract_parity():
    import pandas as pd
    import ray.data as rd

    from nospa_rdf_data_cube_validator_ray.stages.dedup import cluster_from_pairs

    # pairs referencing an id absent from ds (99) + a duplicate ds id (4):
    # both regimes must emit one row per ds row and ignore edge-only nodes
    ds = rd.from_pandas(
        pd.DataFrame({"doc_id": [0, 1, 2, 3, 4, 4]})
    ).repartition(2)
    pairs = rd.from_pandas(
        pd.DataFrame({"doc_id_a": [0, 1, 99], "doc_id_b": [1, 2, 3]})
    )
    small = cluster_from_pairs(ds, pairs).to_pandas()
    dist = cluster_from_pairs(ds, pairs, max_driver_edges=0).to_pandas()
    for out in (small, dist):
        s = out.sort_values(["doc_id", "cluster_id"]).reset_index(drop=True)
        assert list(s.doc_id) == [0, 1, 2, 3, 4, 4]
        # {0,1,2} cluster 0; 3 linked to 99 -> root is min(3, 99) = 3
        assert list(s.cluster_id) == [0, 0, 0, 3, 4, 4]


def test_asof_join_mixed_key_widths_and_int_values():
    import pandas as pd
    import ray.data as rd

    from nospa_rdf_data_cube_validator_ray.pipelines.relational import (
        asof_join,
        range_join,
    )

    # int32 right keys with NEGATIVE values: raw-representation hashing
    # would bucket int32 -5 and int64 -5 differently and drop the match
    left = rd.from_pandas(
        pd.DataFrame(
            {"event_id": [1, 2], "user_id": pd.array([-5, 7], dtype="int64"),
             "ts_us": [10, 10]}
        )
    )
    right = rd.from_pandas(
        pd.DataFrame(
            {"user_id": pd.array([-5, 7], dtype="int32"),
             "ts_us": [5, 5],
             "ref": pd.array([2**53 + 3, 4], dtype="int64")}
        )
    )
    out = (
        asof_join(left, right, by="user_id", on="ts_us", right_vals=["ref"])
        .to_pandas()
        .sort_values("event_id")
    )
    # both keys matched, and the int64 value survived exactly (no
    # float64 passage): 2**53+3 rounds to 2**53+4 in float64
    assert list(out["ref"]) == [2**53 + 3, 4]

    # partial coverage: missed rows are NA while hits stay exact int
    right2 = rd.from_pandas(
        pd.DataFrame(
            {"user_id": pd.array([-5], dtype="int64"), "ts_us": [5],
             "ref": pd.array([2**53 + 3], dtype="int64")}
        )
    )
    out2 = (
        asof_join(left, right2, by="user_id", on="ts_us", right_vals=["ref"])
        .to_pandas()
        .sort_values("event_id")
    )
    vals = list(out2["ref"])
    assert vals[0] == 2**53 + 3 and pd.isna(vals[1])

    # range_join keeps typed empties and exact ints too
    r3 = rd.from_pandas(
        pd.DataFrame(
            {"user_id": pd.array([7], dtype="int64"), "lo": [0], "hi": [20],
             "sid": pd.array([2**53 + 5], dtype="int64")}
        )
    )
    out3 = range_join(
        left, r3, by="user_id", on="ts_us", start="lo", end="hi",
        right_vals=["sid"],
    ).to_pandas()
    assert list(out3["event_id"]) == [2] and out3["sid"].iloc[0] == 2**53 + 5


def test_attributed_window_kernel_bruteforce():
    """Randomized parity for the composite-key searchsorted attribution
    window (events_attributed's kernel shape): strict (t-1h, t) window,
    boundary ties excluded, no cross-user bleed."""
    import numpy as np
    import pandas as pd

    hour_us = 3_600_000_000
    rng = np.random.default_rng(7)
    n = 1500
    df = pd.DataFrame(
        {
            "event_id": np.arange(n, dtype="int64"),
            "user_id": rng.integers(0, 12, n).astype("int64"),
            # cluster timestamps so windows overlap and EXACT boundary
            # collisions occur
            "ts_us": (
                rng.integers(0, 50, n) * (hour_us // 2)
                + rng.integers(0, 3, n)
            ).astype("int64"),
            "is_view": rng.random(n) < 0.6,
        }
    )

    base = int(df["ts_us"].min())
    rel = (df["ts_us"] - base).to_numpy("int64")
    bits = int(rel.max() + hour_us).bit_length() + 1
    key = (df["user_id"].to_numpy("int64") << bits) | rel
    v = np.sort(key[df["is_view"].to_numpy()])
    pm = ~df["is_view"].to_numpy()
    pk = key[pm]
    lo = np.searchsorted(v, pk - hour_us, side="right")
    hi = np.searchsorted(v, pk, side="left")
    got = dict(zip(df.loc[pm, "event_id"], (hi - lo).astype(int)))

    views = df[df["is_view"]]
    for _, p in df[pm].iterrows():
        w = views[
            (views["user_id"] == p["user_id"])
            & (views["ts_us"] > p["ts_us"] - hour_us)
            & (views["ts_us"] < p["ts_us"])
        ]
        assert got[p["event_id"]] == len(w), p["event_id"]
