"""Driver contract for the graft builder (Ray Data target).

``entry()`` — flagship pipeline (cube validation over the TPC-H-derived
corpus) at sf0.001.  ``queries()`` — one callable per implemented
operator/pipeline from SURVEY.md §2 plus the training-data ops;
``oracle_sql()`` — DuckDB-equivalent SQL over the same parquet tables.

The RDF-cube queries are end-to-end checkable in SQL because the corpus
is a *pure function of lineitem*: `fixtures.tpch_cube_corpus` turns every
lineitem row into one qb:Observation (bucketed into Turtle files by
l_orderkey % 64) and injects violations as modular functions of
l_orderkey (MOD_IC1/11/12/13/14/19/2021 in fixtures.py), so DuckDB can predict
every finding the Ray pipeline must emit without parsing any RDF.

Ray is initialised by the driver BEFORE this module is imported: nothing
here calls ``ray.init()`` / ``ray.shutdown()``.
"""

from __future__ import annotations

from collections.abc import Callable
from typing import Any

import pandas as pd

TP = "http://example.org/tpch/"
QB = "http://purl.org/linked-data/cube#"

# ---------------------------------------------------------------------------
# shared per-sf_dir pipeline cache (the driver calls each query separately;
# the validator amortizes one parse + one pivot shuffle across all ICs, so
# the first cube query pays and the rest are lookups)
# ---------------------------------------------------------------------------

_CACHE: dict[str, dict[str, Any]] = {}


def _cube_state(sf_dir: str) -> dict[str, Any]:
    state = _CACHE.get(sf_dir)
    if state is None:
        from nospa_rdf_data_cube_validator_ray.fixtures import tpch_cube_corpus
        from nospa_rdf_data_cube_validator_ray.pipelines.validate import CubeValidator

        validator = CubeValidator(tpch_cube_corpus(sf_dir))
        state = {"validator": validator}
        _CACHE[sf_dir] = state
    return state


def _findings(sf_dir: str) -> pd.DataFrame:
    state = _cube_state(sf_dir)
    if "findings" not in state:
        state["findings"] = state["validator"].findings_df()
    return state["findings"]


def _ic(sf_dir: str, ic: str) -> pd.DataFrame:
    df = _findings(sf_dir)
    return df[df["ic"] == ic].reset_index(drop=True)


def _docs(sf_dir: str):
    import ray.data

    return ray.data.read_parquet(f"{sf_dir}/documents.parquet")


def _embs(sf_dir: str):
    import ray.data

    return ray.data.read_parquet(f"{sf_dir}/embeddings.parquet")


# ---------------------------------------------------------------------------
# cube validation queries (SURVEY.md §2.3/§2.4)
# ---------------------------------------------------------------------------


def q_cube_ic1(sf_dir: str) -> pd.DataFrame:
    df = _ic(sf_dir, "IC1")
    return pd.DataFrame(
        {
            "subject": df["subject"],
            "detail_0": df["detail"].map(lambda d: d[0]),
            "detail_1": df["detail"].map(lambda d: d[1]),
        }
    )


def q_cube_ic2(sf_dir: str) -> pd.DataFrame:
    return _ic(sf_dir, "IC2")[["subject"]]


def _subject_missing(df: pd.DataFrame) -> pd.DataFrame:
    return pd.DataFrame(
        {"subject": df["subject"], "missing": df["detail"].map(lambda d: d[0])}
    )


def q_cube_ic11(sf_dir: str) -> pd.DataFrame:
    return _subject_missing(_ic(sf_dir, "IC11"))


def q_cube_ic12(sf_dir: str) -> pd.DataFrame:
    return _ic(sf_dir, "IC12")[["subject"]]


def q_cube_ic13(sf_dir: str) -> pd.DataFrame:
    return _subject_missing(_ic(sf_dir, "IC13"))


def q_cube_ic14(sf_dir: str) -> pd.DataFrame:
    return _subject_missing(_ic(sf_dir, "IC14"))


def q_cube_ic19(sf_dir: str) -> pd.DataFrame:
    df = _ic(sf_dir, "IC19")
    return pd.DataFrame(
        {"subject": df["subject"], "detail_0": df["detail"].map(lambda d: d[0])}
    )


def q_cube_ic20(sf_dir: str) -> pd.DataFrame:
    df = _ic(sf_dir, "IC20")
    return pd.DataFrame(
        {"subject": df["subject"], "detail_0": df["detail"].map(lambda d: d[0])}
    )


def q_cube_ic21(sf_dir: str) -> pd.DataFrame:
    df = _ic(sf_dir, "IC21")
    return pd.DataFrame(
        {"subject": df["subject"], "detail_0": df["detail"].map(lambda d: d[0])}
    )


# -- measureType corpus queries (orders-derived; IC-12/14/15/16/17) --------


def _mt_findings(sf_dir: str) -> pd.DataFrame:
    state = _CACHE.setdefault(sf_dir, {})
    if "mt_findings" not in state:
        from nospa_rdf_data_cube_validator_ray.fixtures import tpch_mt_corpus
        from nospa_rdf_data_cube_validator_ray.pipelines.validate import CubeValidator

        state["mt_findings"] = CubeValidator(tpch_mt_corpus(sf_dir)).findings_df()
    return state["mt_findings"]


def _mt_ic(sf_dir: str, ic: str) -> pd.DataFrame:
    df = _mt_findings(sf_dir)
    return df[df["ic"] == ic].reset_index(drop=True)


def q_mt_ic12(sf_dir: str) -> pd.DataFrame:
    return _mt_ic(sf_dir, "IC12")[["subject"]]


def q_mt_ic14(sf_dir: str) -> pd.DataFrame:
    df = _mt_ic(sf_dir, "IC14")
    return pd.DataFrame(
        {"subject": df["subject"],
         "n_missing": df["detail"].map(len).astype("int64")}
    )


def q_mt_ic15(sf_dir: str) -> pd.DataFrame:
    df = _mt_ic(sf_dir, "IC15")
    return pd.DataFrame(
        {"subject": df["subject"], "detail_0": df["detail"].map(lambda d: d[0])}
    )


def q_mt_ic16(sf_dir: str) -> pd.DataFrame:
    df = _mt_ic(sf_dir, "IC16")
    return pd.DataFrame(
        {
            "subject": df["subject"],
            "detail_0": df["detail"].map(lambda d: d[0]),
            "detail_1": df["detail"].map(lambda d: d[1]),
        }
    )


def q_mt_ic17(sf_dir: str) -> pd.DataFrame:
    df = _mt_ic(sf_dir, "IC17")
    return pd.DataFrame(
        {"subject": df["subject"], "detail_0": df["detail"].map(lambda d: d[0])}
    )


def q_cube_report_lines(sf_dir: str) -> pd.DataFrame:
    """End-to-end result-sink check (the reference's markdown appender,
    NospaValidator.java:445-490): validate → write_report to a FILE →
    re-read the file → count the violation bullet lines under each IC
    section heading.  The oracle predicts the same per-IC counts straight
    from lineitem, so the renderer and the report round-trip are both on
    the correctness gate."""
    import os
    import re
    import tempfile

    from nospa_rdf_data_cube_validator_ray.pipelines.report import write_report

    df = _findings(sf_dir)
    with tempfile.TemporaryDirectory() as td:
        path = write_report(df, os.path.join(td, "validation_result.md"))
        with open(path) as f:
            text = f.read()
    counts: dict[str, int] = {}
    cur = None
    for line in text.splitlines():
        m = re.match(r"^## (IC\d+) ", line)
        if m:
            cur = m.group(1)
            counts[cur] = 0
        elif line.startswith("- `") and cur:
            counts[cur] += 1
    rows = [(ic, n) for ic, n in sorted(counts.items()) if n > 0]
    return pd.DataFrame(rows, columns=["ic", "n"]).astype({"n": "int64"})


# -- SPARQL-specification engine queries ------------------------------------
# create_validator("SPARQL") — the independent cross-check engine
# (pipelines/sparql_validate.py, hand-translated from the reference's
# sparql/IntegrityConstraint.java).  Oracles encode the SPEC semantics:
# where they match the NoSPA oracles the engines agree; cube_sparql_ic12_pairs /
# _ic19 / _mt_profile encode the documented divergences exactly.


def _sparql_findings(sf_dir: str) -> pd.DataFrame:
    state = _CACHE.setdefault(sf_dir, {})
    if "sparql_findings" not in state:
        from nospa_rdf_data_cube_validator_ray import create_validator
        from nospa_rdf_data_cube_validator_ray.fixtures import tpch_cube_corpus

        v = create_validator("SPARQL", corpus=tpch_cube_corpus(sf_dir))
        state["sparql_findings"] = v.findings_df()
    return state["sparql_findings"]


def _sparql_mt_findings(sf_dir: str) -> pd.DataFrame:
    state = _CACHE.setdefault(sf_dir, {})
    if "sparql_mt_findings" not in state:
        from nospa_rdf_data_cube_validator_ray import create_validator
        from nospa_rdf_data_cube_validator_ray.fixtures import tpch_mt_corpus

        v = create_validator("SPARQL", corpus=tpch_mt_corpus(sf_dir))
        state["sparql_mt_findings"] = v.findings_df()
    return state["sparql_mt_findings"]


def _sparql_ic(sf_dir: str, ic: str) -> pd.DataFrame:
    df = _sparql_findings(sf_dir)
    return df[df["ic"] == ic].reset_index(drop=True)


def q_sparql_ic1(sf_dir: str) -> pd.DataFrame:
    """Spec IC-1 ≡ NoSPA IC-1 on this corpus (dataSet count != 1)."""
    return _sparql_ic(sf_dir, "IC1")[["subject"]]


def q_sparql_ic11(sf_dir: str) -> pd.DataFrame:
    return _subject_missing(_sparql_ic(sf_dir, "IC11"))


def q_sparql_ic12_pairs(sf_dir: str) -> pd.DataFrame:
    """Spec IC-12 emits ORDERED (obs1, obs2) pairs (both directions) —
    the documented divergence from NoSPA's 2nd-member-only flagging."""
    df = _sparql_ic(sf_dir, "IC12")
    out = df[["subject", "detail"]].explode("detail")
    return pd.DataFrame(
        {"subject": out["subject"], "partner": out["detail"]}
    ).reset_index(drop=True)


def q_sparql_ic14(sf_dir: str) -> pd.DataFrame:
    return _subject_missing(_sparql_ic(sf_dir, "IC14"))


def q_sparql_ic19(sf_dir: str) -> pd.DataFrame:
    """Spec IC-19 keys by (obs, dim) — NoSPA keys by value."""
    df = _sparql_ic(sf_dir, "IC19")
    return pd.DataFrame(
        {"subject": df["subject"], "dim": df["detail"].map(lambda d: d[0])}
    )


def q_sparql_ic20(sf_dir: str) -> pd.DataFrame:
    df = _sparql_ic(sf_dir, "IC20")
    return pd.DataFrame(
        {"subject": df["subject"], "detail_0": df["detail"].map(lambda d: d[0])}
    )


def q_sparql_mt_profile(sf_dir: str) -> pd.DataFrame:
    """Per-IC finding counts of the spec engine over the measureType
    corpus — encodes the IC-14 skip (no row), the per-binding IC-15, the
    pairwise IC-12 and the grouped-count IC-17 in one oracle."""
    df = _sparql_mt_findings(sf_dir)
    g = df.groupby("ic", as_index=False).size().rename(columns={"size": "n"})
    g["n"] = g["n"].astype("int64")
    return g.sort_values("ic", ignore_index=True)


def q_sparql_ic2(sf_dir: str) -> pd.DataFrame:
    """Spec IC-2 ≡ NoSPA IC-2 on this corpus: the K%107 extra dataset is
    typed qb:DataSet by phase-1 rule 1 (NormalizationAlgorithm.java:9-14)
    and carries no qb:structure, so BOTH engines flag it."""
    return _sparql_ic(sf_dir, "IC2")[["subject"]]


def q_sparql_ic13(sf_dir: str) -> pd.DataFrame:
    """Spec IC-13 ≡ NoSPA IC-13 here: a_status is the only
    componentRequired-true property missing from any obs (a_unit is
    DataSet-attached and pushed down by phase 2 before the check)."""
    return _subject_missing(_sparql_ic(sf_dir, "IC13"))


def q_sparql_ic21(sf_dir: str) -> pd.DataFrame:
    """Spec IC-21: the global-pcp substitution (SparqlValidator.java:
    217-234) unions failures over every declared inverse pcp; with one
    hierarchy carrying one inverse pcp the spec agrees with NoSPA's
    per-hierarchy closure on this corpus."""
    df = _sparql_ic(sf_dir, "IC21")
    return pd.DataFrame(
        {"subject": df["subject"], "detail_0": df["detail"].map(lambda d: d[0])}
    )


def _sparql_slice_findings(sf_dir: str) -> pd.DataFrame:
    state = _CACHE.setdefault(sf_dir, {})
    if "sparql_slice_findings" not in state:
        from nospa_rdf_data_cube_validator_ray import create_validator
        from nospa_rdf_data_cube_validator_ray.fixtures import tpch_slice_corpus

        v = create_validator("SPARQL", corpus=tpch_slice_corpus(sf_dir))
        # IC selection pushed into the kernel: the three slice queries
        # need IC10/11/18 only, and skipping the spec's quadratic IC-12
        # compare is what keeps this corpus viable at 10x driver scale
        state["sparql_slice_findings"] = v.findings_df(
            ics=["IC10", "IC11", "IC18"]
        )
    return state["sparql_slice_findings"]


def _sparql_slice_ic(sf_dir: str, ic: str) -> pd.DataFrame:
    df = _sparql_slice_findings(sf_dir)
    return df[df["ic"] == ic].reset_index(drop=True)


def q_sparql_slice_ic10(sf_dir: str) -> pd.DataFrame:
    """Spec IC-10 over the slice corpus (slice missing a value for a key
    dimension) — phase-2b pushdown must run before the check on both
    engines, so the spec result matches NoSPA's."""
    return _subject_missing(_sparql_slice_ic(sf_dir, "IC10"))


def q_sparql_slice_ic11(sf_dir: str) -> pd.DataFrame:
    """Spec IC-11 over the slice corpus — the slice-attached dimension
    reaches each observation only via phase-2b pushdown, so this also
    pins the spec engine's phase-2 ordering."""
    return _subject_missing(_sparql_slice_ic(sf_dir, "IC11"))


def q_sparql_slice_ic18(sf_dir: str) -> pd.DataFrame:
    """Spec IC-18 (slice obs must link back to the dataset) over the
    slice corpus; detail is the dataset term as in the NoSPA twin."""
    df = _sparql_slice_ic(sf_dir, "IC18")
    return pd.DataFrame(
        {"subject": df["subject"], "detail_0": df["detail"].map(lambda d: d[0])}
    )


def q_sparql_schema_ics(sf_dir: str) -> pd.DataFrame:
    """All spec schema constraints (IC-3..IC-9) over the supplier-derived
    schema corpus.  The engines agree on every subject here — the IC-8
    accumulation quirk (ValidatorIC8.java:29 vs IntegrityConstraint.java:
    90-98) needs a cross-DSD slice-key reference to diverge, which this
    corpus does not seed — so the NoSPA schema oracle is exact for the
    spec engine too."""
    state = _CACHE.setdefault(sf_dir, {})
    if "sparql_schema_findings" not in state:
        from nospa_rdf_data_cube_validator_ray import create_validator
        from nospa_rdf_data_cube_validator_ray.fixtures import tpch_schema_corpus

        v = create_validator("SPARQL", corpus=tpch_schema_corpus(sf_dir))
        state["sparql_schema_findings"] = v.findings_df()
    df = state["sparql_schema_findings"]
    return df[["ic", "subject"]].sort_values(["ic", "subject"]).reset_index(drop=True)


# -- slice corpus queries (phase-2b pushdown + IC-10/18 at scale) ----------


def _slice_findings(sf_dir: str) -> pd.DataFrame:
    state = _CACHE.setdefault(sf_dir, {})
    if "slice_findings" not in state:
        from nospa_rdf_data_cube_validator_ray.fixtures import tpch_slice_corpus
        from nospa_rdf_data_cube_validator_ray.pipelines.validate import CubeValidator

        state["slice_validator"] = CubeValidator(tpch_slice_corpus(sf_dir))
        state["slice_findings"] = state["slice_validator"].findings_df()
    return state["slice_findings"]


def _slice_ic(sf_dir: str, ic: str) -> pd.DataFrame:
    df = _slice_findings(sf_dir)
    return df[df["ic"] == ic].reset_index(drop=True)


def q_slice_ic10(sf_dir: str) -> pd.DataFrame:
    return _subject_missing(_slice_ic(sf_dir, "IC10"))


def q_slice_ic11(sf_dir: str) -> pd.DataFrame:
    return _subject_missing(_slice_ic(sf_dir, "IC11"))


def q_slice_ic18(sf_dir: str) -> pd.DataFrame:
    df = _slice_ic(sf_dir, "IC18")
    return pd.DataFrame(
        {"subject": df["subject"], "detail_0": df["detail"].map(lambda d: d[0])}
    )


def q_slice_ic2(sf_dir: str) -> pd.DataFrame:
    return _slice_ic(sf_dir, "IC2")[["subject"]]


def q_slice_phase2_by_pred(sf_dir: str):
    """Phase-2b slice pushdown materialization: one derived tp:d_sup8
    triple per observation of a slice that carries the value."""
    from nospa_rdf_data_cube_validator_ray.stages.export import phase2_triples

    _slice_findings(sf_dir)
    v = _CACHE[sf_dir]["slice_validator"]
    v._ensure_indexes()
    p2 = phase2_triples(v.normalize(), v._index_ref)
    out = p2.groupby("pred").count().rename_columns({"count()": "n"}).to_pandas()
    out["n"] = out["n"].astype("int64")
    return out


def q_schema_ics(sf_dir: str) -> pd.DataFrame:
    """All schema-only constraints (IC-3..IC-9) over the supplier-derived
    schema corpus — every remaining IC oracle-checked at scale.  Note the
    interaction the oracle must reproduce: the IC-9 second slice key is
    itself unreferenced by the DSD, so B%17 buckets also yield an IC-7."""
    state = _CACHE.setdefault(sf_dir, {})
    if "schema_findings" not in state:
        from nospa_rdf_data_cube_validator_ray.fixtures import tpch_schema_corpus
        from nospa_rdf_data_cube_validator_ray.pipelines.validate import CubeValidator

        state["schema_findings"] = CubeValidator(
            tpch_schema_corpus(sf_dir)
        ).findings_df()
    df = state["schema_findings"]
    return df[["ic", "subject"]].sort_values(["ic", "subject"]).reset_index(drop=True)


def q_cube_obs_per_dataset(sf_dir: str):
    """Observation count per qb:DataSet from the parsed triple stream —
    checks parser + corpus generation end-to-end (groupby-count shape of
    IC-1/2/9, ValidatorIC1.java:24-36)."""
    state = _cube_state(sf_dir)
    triples = state["validator"].normalize()
    from nospa_rdf_data_cube_validator_ray import vocab as V

    from nospa_rdf_data_cube_validator_ray.util import bucket_count

    # dataset IRIs are corpus-scale keys — bucketed count (util.bucket_agg)
    ds = bucket_count(
        triples.filter(expr=f"pred == '{V.QB_dataSet}'").select_columns(
            ["obj"]
        ),
        ["obj"],
        out_col="n_obs",
    )
    # rename in pandas, not rename_columns: Project ops choke on the
    # schema-less empty blocks sparse groupbys can emit
    out = ds.to_pandas().rename(columns={"obj": "dataset"})
    out["dataset"] = "<" + out["dataset"] + ">"
    return out


def q_cube_triples_by_pred(sf_dir: str):
    """Raw-parse triple count per predicate — the parser-level invariant
    (every content row → exactly the predicted triple fan-out)."""
    state = _cube_state(sf_dir)
    if "raw_by_pred" not in state:
        from nospa_rdf_data_cube_validator_ray.fixtures import tpch_cube_corpus
        from nospa_rdf_data_cube_validator_ray.sources.parse_stage import parse_corpus
        import ray.data

        corpus = ray.data.from_arrow(tpch_cube_corpus(sf_dir))
        ds = (
            parse_corpus(corpus)
            .groupby("pred")
            .count()
            .rename_columns({"count()": "n"})
        )
        state["raw_by_pred"] = ds.to_pandas()
    return state["raw_by_pred"]


def _reserialized_by_pred(sf_dir: str, *, cache_key, ext, lang, render):
    """Shared round-trip harness for every non-Turtle serialization:
    parse each Turtle corpus file, re-serialize it with ``render
    (triples, path) -> text``, re-parse via the normal format-dispatch
    front end, and count triples per predicate — the per-pred counts
    must equal the Turtle corpus's (oracle: cube_triples_by_pred's
    SQL), proving writer+reader fidelity at corpus scale."""
    state = _CACHE.setdefault(sf_dir, {})
    if cache_key not in state:
        import pyarrow as pa
        import ray.data

        from nospa_rdf_data_cube_validator_ray.fixtures import tpch_cube_corpus
        from nospa_rdf_data_cube_validator_ray.sources.parse_stage import parse_corpus
        from nospa_rdf_data_cube_validator_ray.sources.rdf_parser import parse_turtle

        corpus = ray.data.from_arrow(tpch_cube_corpus(sf_dir))

        def reserialize(batch: pa.Table) -> pa.Table:
            cols = {c: batch.column(c).to_pylist()
                    for c in ("repo", "path", "commit", "lang", "content")}
            out = {k: [] for k in cols}
            for repo, path, commit, _lang, content in zip(
                cols["repo"], cols["path"], cols["commit"],
                cols["lang"], cols["content"],
            ):
                out["repo"].append(repo)
                out["path"].append(path.rsplit(".", 1)[0] + "." + ext)
                out["commit"].append(commit)
                out["lang"].append(lang)
                out["content"].append(render(parse_turtle(content), path))
            return pa.table({k: pa.array(v, pa.string()) for k, v in out.items()})

        re_corpus = corpus.map_batches(
            reserialize, batch_format="pyarrow", batch_size=1
        )
        ds = (
            parse_corpus(re_corpus)
            .groupby("pred")
            .count()
            .rename_columns({"count()": "n"})
        )
        state[cache_key] = ds.to_pandas()
    return state[cache_key]


def q_cube_xml_by_pred(sf_dir: str):
    """RDF/XML parser oracle-checked at TPC-H scale: every Turtle corpus
    file is parsed, re-serialized as RDF/XML (stages/export.rdfxml_document)
    and re-parsed by the RDF/XML reader; the per-predicate counts must
    equal the Turtle corpus's (same oracle as cube_triples_by_pred) —
    round-trip fidelity of both serializers/parsers on the full corpus."""
    from nospa_rdf_data_cube_validator_ray.stages.export import rdfxml_document

    return _reserialized_by_pred(
        sf_dir,
        cache_key="xml_by_pred",
        ext="rdf",
        lang="rdfxml",
        render=lambda triples, _path: rdfxml_document(triples),
    )


def q_cube_nquads_by_pred(sf_dir: str):
    """N-Quads parser oracle-checked at TPC-H scale: every Turtle corpus
    file is re-serialized as N-Quads with a per-file NAMED GRAPH label
    (stages/export.nquads_document) and re-parsed by the N-Quads reader
    (rdf_parser.parse_nquads — graph label scopes each row); the
    per-predicate counts must equal the Turtle corpus's (same oracle as
    cube_triples_by_pred).  Graph-label semantics (named vs default
    graph, per-file bnode standardize-apart) are unit-tested in
    tests/test_multiformat.py."""
    from nospa_rdf_data_cube_validator_ray.stages.export import nquads_document

    return _reserialized_by_pred(
        sf_dir,
        cache_key="nquads_by_pred",
        ext="nq",
        lang="nquads",
        render=lambda triples, path: nquads_document(
            triples, graph_iri=f"http://example.org/g/{path}"
        ),
    )


def q_cube_trig_by_pred(sf_dir: str):
    """TriG parser oracle-checked at TPC-H scale: every Turtle corpus
    file re-serialized as a TriG named-graph block
    (stages/export.trig_document) and re-parsed by the TriG reader
    (rdf_parser.parse_trig — the Turtle grammar plus graph blocks);
    per-predicate counts must equal the Turtle corpus's."""
    from nospa_rdf_data_cube_validator_ray.stages.export import trig_document

    return _reserialized_by_pred(
        sf_dir,
        cache_key="trig_by_pred",
        ext="trig",
        lang="trig",
        render=lambda triples, path: trig_document(
            triples, graph_iri=f"http://example.org/g/{path}"
        ),
    )


def q_cube_phase2_by_pred(sf_dir: str):
    """Phase-2 normalization materialization (the export path,
    Normalizer.java:90-189): the DataSet-attached tp:a_unit is pushed down
    to every observation — count the derived triples per predicate."""
    from nospa_rdf_data_cube_validator_ray.stages.export import phase2_triples

    state = _cube_state(sf_dir)
    v = state["validator"]
    v._ensure_indexes()
    p2 = phase2_triples(v.normalize(), v._index_ref)
    out = p2.groupby("pred").count().rename_columns({"count()": "n"}).to_pandas()
    out["n"] = out["n"].astype("int64")
    return out


# ---------------------------------------------------------------------------
# oracle SQL for the cube queries (pure lineitem arithmetic)
# ---------------------------------------------------------------------------

# every observation row the corpus generates: one per lineitem row (the
# row-unique rank within its order — lineitem has duplicate
# (orderkey, linenumber) pairs) plus the injected duplicate of the
# first-ranked row for l_orderkey % 101 == 0
_OBS_CTE = """
WITH ranked AS (
  SELECT l_orderkey AS k, l_suppkey AS s,
         row_number() OVER (
           PARTITION BY l_orderkey
           ORDER BY l_linenumber, l_suppkey, round(l_quantity * 100)
         ) AS l
  FROM lineitem
),
obs AS (
  SELECT k, l, s, '' AS suffix FROM ranked
  UNION ALL
  SELECT k, 1, s, 'dup' FROM ranked WHERE k % 101 = 0 AND l = 1
)
"""


def _obs_iri(expr_k: str = "k", expr_l: str = "l", suffix: str = "suffix") -> str:
    return f"'<{TP}obs/' || {expr_k} || '/' || {expr_l} || {suffix} || '>'"


_SQL_IC1 = f"""
SELECT DISTINCT '<{TP}obs/' || l_orderkey || '/1>' AS subject,
       '<{TP}ds-' || (l_orderkey % 64) || '>' AS detail_0,
       '<{TP}ds/extra/' || l_orderkey || '>' AS detail_1
FROM lineitem
WHERE l_orderkey % 107 = 0
"""

_SQL_IC2 = f"""
SELECT DISTINCT '<{TP}ds/extra/' || l_orderkey || '>' AS subject
FROM lineitem
WHERE l_orderkey % 107 = 0
"""

_SQL_IC11 = f"""{_OBS_CTE}
SELECT {_obs_iri()} AS subject, '<{TP}d_supp>' AS missing
FROM obs WHERE k % 97 = 0
"""

_SQL_IC12 = f"""
SELECT DISTINCT '<{TP}obs/' || l_orderkey || '/1dup>' AS subject
FROM lineitem
WHERE l_orderkey % 101 = 0 AND l_orderkey % 97 != 0
"""

_SQL_IC13 = f"""{_OBS_CTE}
SELECT {_obs_iri()} AS subject, '<{TP}a_status>' AS missing
FROM obs WHERE k % 103 = 0
"""

_SQL_IC14 = f"""{_OBS_CTE}
SELECT {_obs_iri()} AS subject, '<{TP}m_price>' AS missing
FROM obs WHERE k % 109 = 0
"""

_SQL_IC19 = f"""
SELECT DISTINCT '<{TP}mode/bad/' || l_orderkey || '>' AS subject,
       '<{TP}modes>' AS detail_0
FROM lineitem
WHERE l_orderkey % 113 = 0
"""

_SQL_IC2021 = f"""
SELECT DISTINCT '<{TP}zone/bad/' || l_orderkey || '>' AS subject,
       '<{TP}geo>' AS detail_0
FROM lineitem
WHERE l_orderkey % 127 = 0
"""

# -- SPARQL-spec engine oracles ---------------------------------------------
# spec IC-1 flags the SAME subjects as NoSPA but with no detail set
_SQL_SPARQL_IC1 = f"""
SELECT DISTINCT '<{TP}obs/' || l_orderkey || '/1>' AS subject
FROM lineitem
WHERE l_orderkey % 107 = 0
"""

# spec IC-12 = ordered pairs over shared-dim agreement: on this corpus the
# only agreeing pairs are the injected duplicates (d_order pins obs of
# different orders apart; d_line pins ranks apart), flagged in BOTH
# directions — including K%97 pairs NoSPA's IC-11 branch excludes
_SQL_SPARQL_IC12_PAIRS = f"""
WITH k AS (
  SELECT DISTINCT l_orderkey AS k FROM lineitem WHERE l_orderkey % 101 = 0
)
SELECT '<{TP}obs/' || k || '/1>' AS subject,
       '<{TP}obs/' || k || '/1dup>' AS partner FROM k
UNION ALL
SELECT '<{TP}obs/' || k || '/1dup>', '<{TP}obs/' || k || '/1>' FROM k
"""

# spec IC-19 keys by (obs, dim): the rank-1 obs carrying the bad code —
# and its injected duplicate when K is also a duplicate key
_SQL_SPARQL_IC19 = f"""
WITH k AS (
  SELECT DISTINCT l_orderkey AS k FROM lineitem WHERE l_orderkey % 113 = 0
)
SELECT '<{TP}obs/' || k || '/1>' AS subject, '<{TP}d_mode>' AS dim FROM k
UNION ALL
SELECT '<{TP}obs/' || k || '/1dup>', '<{TP}d_mode>' FROM k WHERE k % 101 = 0
"""

# spec per-IC counts on the measureType corpus:
#   IC-14 absent (spec skips measureType cubes — the quirk divergence);
#   IC-12: single-measureType obs pair within (customer, parity) groups;
#   IC-15: every measureType binding missing its value;
#   IC-16: a second declared measure present on the obs;
#   IC-17: count(obs1) = w1 · Σ_{same cust} w2 (w = #measureType values,
#   self included) must equal numMeasures = 2 ⟺ w1 = 1 ∧ S(cust) = 2.
_SQL_SPARQL_MT_PROFILE = """
SELECT ic, n FROM (
  SELECT 'IC12' AS ic, coalesce(sum(n), 0)::BIGINT AS n FROM (
    SELECT count(*) AS n FROM orders WHERE o_orderkey % 137 != 0
    GROUP BY o_custkey, o_orderkey % 2
  ) WHERE n >= 2
  UNION ALL
  SELECT 'IC15', count(*)::BIGINT FROM orders
  WHERE o_orderkey % 131 = 0 OR o_orderkey % 137 = 0
  UNION ALL
  SELECT 'IC16', count(*)::BIGINT FROM orders
  WHERE o_orderkey % 137 = 0 AND o_orderkey % 131 != 0
  UNION ALL
  SELECT 'IC17', count(*)::BIGINT FROM (
    SELECT o_orderkey, o_custkey,
           CASE WHEN o_orderkey % 137 = 0 THEN 2 ELSE 1 END AS w,
           sum(CASE WHEN o_orderkey % 137 = 0 THEN 2 ELSE 1 END)
               OVER (PARTITION BY o_custkey) AS sw
    FROM orders
  ) WHERE NOT (w = 1 AND sw = 2)
) WHERE n > 0
ORDER BY ic
"""

# every observation carries qb:dataSet → exactly one pushed-down a_unit
_SQL_PHASE2 = f"""{_OBS_CTE}
SELECT '{TP}a_unit' AS pred, count(*)::BIGINT AS n FROM obs
"""

_SQL_OBS_PER_DS = f"""{_OBS_CTE}
SELECT dataset, count(*)::BIGINT AS n_obs FROM (
  SELECT '<{TP}ds-' || (k % 64) || '>' AS dataset FROM obs
  UNION ALL
  SELECT '<{TP}ds/extra/' || k || '>' FROM obs
  WHERE k % 107 = 0 AND l = 1 AND suffix = ''
) GROUP BY dataset
"""

# per-file (bucket) schema triple fan-out — see fixtures.tpch_cube_turtle:
#   rdf:type 16/file + 1/obs; qb:component 7/file; rdfs:range 5/file; etc.
_SQL_TRIPLES_BY_PRED = f"""{_OBS_CTE},
nf AS (SELECT count(DISTINCT l_orderkey % 64) AS files FROM lineitem),
n AS (SELECT count(*) AS total,
             count(*) FILTER (WHERE k % 97 != 0) AS with_supp,
             count(*) FILTER (WHERE k % 103 != 0) AS with_status,
             count(*) FILTER (WHERE k % 109 != 0) AS with_price,
             count(*) FILTER (WHERE k % 107 = 0 AND l = 1 AND suffix = '') AS extra_ds
      FROM obs)
SELECT pred, n::BIGINT AS n FROM (
  SELECT '{QB}dataSet' AS pred, total + extra_ds AS n FROM n, nf
  UNION ALL SELECT '{TP}d_order', total FROM n, nf
  UNION ALL SELECT '{TP}d_line', total FROM n, nf
  UNION ALL SELECT '{TP}d_mode', total FROM n, nf
  UNION ALL SELECT '{TP}d_geo', total FROM n, nf
  UNION ALL SELECT '{TP}m_qty', total FROM n, nf
  UNION ALL SELECT '{TP}d_supp', with_supp FROM n, nf
  UNION ALL SELECT '{TP}a_status', with_status FROM n, nf
  UNION ALL SELECT '{TP}m_price', with_price FROM n, nf
  UNION ALL SELECT 'http://www.w3.org/1999/02/22-rdf-syntax-ns#type',
                   total + 27 * files FROM n, nf
  UNION ALL SELECT '{QB}structure', files FROM n, nf
  UNION ALL SELECT '{TP}a_unit', files FROM n, nf
  UNION ALL SELECT '{QB}component', 9 * files FROM n, nf
  UNION ALL SELECT '{QB}dimension', 5 * files FROM n, nf
  UNION ALL SELECT '{QB}order', 3 * files FROM n, nf
  UNION ALL SELECT '{QB}measure', 2 * files FROM n, nf
  UNION ALL SELECT '{QB}attribute', 2 * files FROM n, nf
  UNION ALL SELECT '{QB}componentRequired', 2 * files FROM n, nf
  UNION ALL SELECT '{QB}componentAttachment', files FROM n, nf
  UNION ALL SELECT 'http://www.w3.org/2000/01/rdf-schema#range', 7 * files FROM n, nf
  UNION ALL SELECT '{QB}codeList', 2 * files FROM n, nf
  UNION ALL SELECT 'http://www.w3.org/2004/02/skos/core#inScheme', 5 * files FROM n, nf
  UNION ALL SELECT '{QB}hierarchyRoot', files FROM n, nf
  UNION ALL SELECT '{QB}parentChildProperty', 2 * files FROM n, nf
  UNION ALL SELECT 'http://www.w3.org/2002/07/owl#inverseOf', files FROM n, nf
  UNION ALL SELECT '{TP}contains', 24 * files FROM n, nf
  UNION ALL SELECT '{TP}within', 24 * files FROM n, nf
)
"""


# measureType-corpus oracles: the obs value-set group is
# (custkey, first-measureType) — K%137 carries both mts so its FIRST value
# is mm1 regardless of parity
_SQL_MT_G = f"""
WITH g AS (
  SELECT o_orderkey AS k, o_custkey AS c,
         CASE WHEN o_orderkey % 137 = 0 THEN 0 ELSE o_orderkey % 2 END AS p,
         '<{TP}mtobs/' || o_orderkey || '>' AS s
  FROM orders
)
"""

_SQL_MT_IC12 = _SQL_MT_G + """
SELECT s AS subject FROM (
  SELECT s, min(s) OVER (PARTITION BY c, p) AS ms,
         count(*) OVER (PARTITION BY c, p) AS n
  FROM g
) WHERE n > 1 AND s != ms
"""

_SQL_MT_IC14 = _SQL_MT_G + """
SELECT s AS subject,
       (CASE WHEN k % 131 = 0 THEN 2 ELSE 1 END)::BIGINT AS n_missing
FROM g
"""

_SQL_MT_IC15 = f"""
SELECT '<{TP}mtobs/' || o_orderkey || '>' AS subject,
       CASE WHEN o_orderkey % 2 = 0 THEN '<{TP}mm1>' ELSE '<{TP}mm2>' END AS detail_0
FROM orders WHERE o_orderkey % 131 = 0 AND o_orderkey % 137 != 0
"""

_SQL_MT_IC16 = f"""
SELECT '<{TP}mtobs/' || o_orderkey || '>' AS subject,
       '<{TP}mm1>' AS detail_0, '<{TP}mm2>' AS detail_1
FROM orders WHERE o_orderkey % 137 = 0
"""

_SQL_MT_IC17 = f"""
WITH g AS (SELECT o_orderkey AS k, o_custkey AS c, o_custkey % 32 AS b FROM orders),
t AS (SELECT b, count(*) AS tn FROM g GROUP BY 1),
n AS (SELECT c, b, count(*) AS cn FROM g GROUP BY 1, 2)
SELECT '<{TP}mtobs/' || g.k || '>' AS subject,
       CAST(t.tn - n.cn AS VARCHAR) AS detail_0
FROM g JOIN n ON g.c = n.c JOIN t ON g.c % 32 = t.b
WHERE n.cn != 2
"""


_SQL_SLICE_RANKED = """
WITH ranked AS (
  SELECT l_orderkey AS k, l_suppkey AS s,
         row_number() OVER (
           PARTITION BY l_orderkey
           ORDER BY l_linenumber, l_suppkey, round(l_quantity * 100)
         ) AS r
  FROM lineitem
)
"""

_SQL_SLICE_IC10 = _SQL_SLICE_RANKED + f"""
SELECT DISTINCT '<{TP}sslice/' || (k % 16) || '/' || (s % 8) || '>' AS subject,
       '<{TP}d_sup8>' AS missing
FROM ranked WHERE (8 * (k % 16) + (s % 8)) % 11 = 0
"""

_SQL_SLICE_IC11 = _SQL_SLICE_RANKED + f"""
SELECT '<{TP}sobs/' || k || '/' || r || '>' AS subject,
       '<{TP}d_sup8>' AS missing
FROM ranked
WHERE (8 * (k % 16) + (s % 8)) % 11 = 0 AND NOT (r = 1 AND k % 149 = 0)
"""

_SQL_SLICE_IC18 = f"""
SELECT DISTINCT '<{TP}sobs/' || l_orderkey || '/1>' AS subject,
       '<{TP}sds-' || (l_orderkey % 16) || '>' AS detail_0
FROM lineitem WHERE l_orderkey % 149 = 0
"""

_SQL_SLICE_IC2 = f"""
SELECT DISTINCT '<{TP}sds/other/' || l_orderkey || '>' AS subject
FROM lineitem WHERE l_orderkey % 149 = 0
"""

_SQL_SLICE_PHASE2 = _SQL_SLICE_RANKED + f"""
SELECT '{TP}d_sup8' AS pred, count(*)::BIGINT AS n
FROM ranked WHERE (8 * (k % 16) + (s % 8)) % 11 != 0
"""


_SQL_SCHEMA_ICS = f"""
WITH b AS (SELECT DISTINCT s_suppkey % 64 AS b FROM supplier)
SELECT ic, subject FROM (
  SELECT 'IC3' AS ic, '<{TP}sc' || b || '_dsd>' AS subject FROM b WHERE b % 5 = 0
  UNION ALL SELECT 'IC4', '<{TP}sc' || b || '_d2>' FROM b WHERE b % 7 = 0
  UNION ALL SELECT 'IC5', '<{TP}sc' || b || '_d3>' FROM b WHERE b % 11 = 0
  UNION ALL SELECT 'IC6', '<{TP}sc' || b || '_d1>' FROM b WHERE b % 13 = 0
  UNION ALL SELECT 'IC7', '<{TP}sc' || b || '_orphan>' FROM b WHERE b % 9 = 0
  UNION ALL SELECT 'IC7', '<{TP}sc' || b || '_skB>' FROM b WHERE b % 17 = 0
  UNION ALL SELECT 'IC8', '<{TP}sc' || b || '_rogue>' FROM b WHERE b % 19 = 0
  UNION ALL SELECT 'IC9', '<{TP}sc' || b || '_sl>' FROM b WHERE b % 17 = 0
)
"""


# ---------------------------------------------------------------------------
# entity resolution (nation-derived owl:sameAs corpus)
# ---------------------------------------------------------------------------

_OWL_SAMEAS = "http://www.w3.org/2002/07/owl#sameAs"


def _entity_triples(sf_dir: str):
    """Parse the nation-derived sameAs corpus once per sf_dir."""
    state = _CACHE.setdefault(sf_dir, {})
    if "entity_triples" not in state:
        import ray.data

        from nospa_rdf_data_cube_validator_ray.fixtures import tpch_entity_corpus
        from nospa_rdf_data_cube_validator_ray.sources.parse_stage import parse_corpus

        state["entity_triples"] = parse_corpus(
            ray.data.from_arrow(tpch_entity_corpus(sf_dir))
        ).materialize()
    return state["entity_triples"]


def q_kg_canonical_iris(sf_dir: str):
    """RFC-3986 IRI canonicalization as an oracle-checked map: every
    as-written IRI in the sameAs corpus (messy case/port, dot-segment,
    percent-encoding variants — fixtures.entity_messy_iri) → its
    normalized form (stages/canonicalize.normalize_iri).  The oracle
    rebuilds both columns from nation with string concatenation."""
    from nospa_rdf_data_cube_validator_ray.functions.kernel import distinct
    from nospa_rdf_data_cube_validator_ray.stages.canonicalize import (
        normalize_iri_series,
    )

    sameas = _entity_triples(sf_dir).filter(expr=f"pred == '{_OWL_SAMEAS}'")

    def raw_iris(df: pd.DataFrame) -> pd.DataFrame:
        vals = pd.unique(
            pd.concat([df["subj"], df["obj"]], ignore_index=True)
        )
        return pd.DataFrame({"iri": pd.Series(vals, dtype=object)})

    iris = distinct(
        sameas.map_batches(raw_iris, batch_format="pandas"), ["iri"]
    )

    def canon(df: pd.DataFrame) -> pd.DataFrame:
        return pd.DataFrame(
            {"iri": df["iri"], "canonical": normalize_iri_series(df["iri"])}
        )

    return iris.map_batches(canon, batch_format="pandas")


def q_kg_sameas_roots(sf_dir: str):
    """Entity resolution end-to-end: parse → normalize IRIs → connected
    components over owl:sameAs → (node, root) alias table, root = the
    component's lexicographic minimum.  Exercises the size-adaptive CC
    (driver union-find here; cc_labels join rounds above the threshold,
    parity-tested)."""
    from nospa_rdf_data_cube_validator_ray.stages.canonicalize import (
        sameas_alias_table,
    )

    return sameas_alias_table(_entity_triples(sf_dir))


_SQL_KG_CANONICAL = """
WITH n AS (SELECT n_nationkey AS k FROM nation),
chain AS (
  SELECT k, unnest(generate_series(0, k % 4)) AS j FROM n WHERE k % 4 >= 1
),
crossn AS (
  SELECT k, 0 AS j FROM n WHERE k >= 20
  UNION ALL
  SELECT k - 20 AS k, 0 AS j FROM n WHERE k >= 20
),
nodes AS (
  SELECT DISTINCT k, j FROM (SELECT * FROM chain UNION ALL SELECT * FROM crossn)
)
SELECT CASE j
         WHEN 1 THEN 'HTTP://Example.ORG:80/ent/' || k || '/1'
         WHEN 2 THEN 'http://example.org/x/../ent/' || k || '/2'
         WHEN 3 THEN 'http://example.org/%65nt/' || k || '/3'
         ELSE 'http://example.org/ent/' || k || '/' || j
       END AS iri,
       'http://example.org/ent/' || k || '/' || j AS canonical
FROM nodes
"""

_SQL_KG_ROOTS = """
WITH n AS (SELECT n_nationkey AS k FROM nation),
chain AS (
  SELECT k, unnest(generate_series(0, k % 4)) AS j FROM n WHERE k % 4 >= 1
),
crossn AS (
  SELECT k, 0 AS j FROM n WHERE k >= 20
  UNION ALL
  SELECT k - 20 AS k, 0 AS j FROM n WHERE k >= 20
),
members AS (
  SELECT DISTINCT CASE WHEN k >= 20 THEN k - 20 ELSE k END AS c,
         'http://example.org/ent/' || k || '/' || j AS node
  FROM (SELECT * FROM chain UNION ALL SELECT * FROM crossn)
),
roots AS (SELECT c, min(node) AS root FROM members GROUP BY c)
SELECT m.node, r.root FROM members m JOIN roots r USING (c)
WHERE m.node != r.root
"""


# ---------------------------------------------------------------------------
# incremental / resumable validation (checkpoint + per-partition lineage)
# ---------------------------------------------------------------------------


def q_cube_incremental(sf_dir: str):
    """End-to-end resume + delta recompute through the checkpoint layer
    (pipelines/checkpoint.run_resumable): the cube corpus is sharded
    into 4 parquet partitions; phase 1 validates with shard 2 STALE
    (its last corpus file withheld), then shard 2 is rewritten complete
    and the run repeats — the second run must SKIP shards 0/1/3 (their
    lineage fingerprints still match) and recompute only shard 2, and
    the combined findings must equal a from-scratch full-corpus run.
    Returns per-IC finding counts; the oracle predicts them with the
    same SQL the per-IC queries use.  Raises if the skip/recompute sets
    are wrong, so a broken resume fails the driver check loudly."""
    import hashlib
    import os
    import shutil
    import tempfile

    import pyarrow as pa
    import pyarrow.compute as pc
    import pyarrow.parquet as pq

    from nospa_rdf_data_cube_validator_ray.fixtures import tpch_cube_corpus
    from nospa_rdf_data_cube_validator_ray.pipelines.checkpoint import (
        read_findings,
        run_resumable,
    )

    corpus = tpch_cube_corpus(sf_dir)
    base = os.path.join(
        tempfile.gettempdir(),
        "graft_incr_" + hashlib.md5(sf_dir.encode()).hexdigest()[:8],
    )
    shutil.rmtree(base, ignore_errors=True)
    shards_dir = os.path.join(base, "shards")
    out_dir = os.path.join(base, "out")
    os.makedirs(shards_dir)

    shard_of = pa.array([i % 4 for i in range(corpus.num_rows)], pa.int32())

    def shard_table(s: int) -> pa.Table:
        return corpus.filter(pc.equal(shard_of, s))

    for s in range(4):
        t = shard_table(s)
        if s == 2:  # stale phase-1 state: last corpus file missing
            t = t.slice(0, max(t.num_rows - 1, 0))
        pq.write_table(t, os.path.join(shards_dir, f"shard-{s}.parquet"))
    run_resumable(shards_dir, out_dir)

    pq.write_table(shard_table(2), os.path.join(shards_dir, "shard-2.parquet"))
    r2 = run_resumable(shards_dir, out_dir)
    if sorted(r2["recomputed"]) != ["shard-2"] or sorted(r2["skipped"]) != [
        "shard-0",
        "shard-1",
        "shard-3",
    ]:
        raise RuntimeError(f"incremental resume mis-skipped: {r2}")

    counts = read_findings(out_dir).groupby("ic").count()
    return (
        counts.to_pandas()
        .rename(columns={"count()": "n"})
        .astype({"n": "int64"})
        .sort_values("ic", ignore_index=True)
    )


# ---------------------------------------------------------------------------
# link-graph analytics (orders/customer/nation-derived provenance graph)
# ---------------------------------------------------------------------------

_KGP = "http://example.org/kg#"
_KGN = "http://example.org/kg/"


def _link_triples(sf_dir: str):
    """Parse the link-graph corpus once per sf_dir (fixtures.tpch_link_corpus:
    order chains + customer/nation/region hierarchy, edges CROSS files)."""
    state = _CACHE.setdefault(sf_dir, {})
    if "link_triples" not in state:
        import ray.data

        from nospa_rdf_data_cube_validator_ray.fixtures import tpch_link_corpus
        from nospa_rdf_data_cube_validator_ray.sources.parse_stage import parse_corpus

        state["link_triples"] = parse_corpus(
            ray.data.from_arrow(tpch_link_corpus(sf_dir))
        ).materialize()
    return state["link_triples"]


def q_kg_degree(sf_dir: str):
    """Per-node out/in degree over the link graph — map-side partial
    counts + one groupby-sum (stages/graph.degree_table)."""
    from nospa_rdf_data_cube_validator_ray.stages.graph import (
        degree_table,
        extract_edges,
    )

    return degree_table(extract_edges(_link_triples(sf_dir)))


def q_kg_path2(sf_dir: str):
    """2-hop path motif census (p1, p2, n) — one mid-node hash join
    (stages/graph.path2_counts)."""
    from nospa_rdf_data_cube_validator_ray.stages.graph import (
        extract_edges,
        path2_counts,
    )

    return path2_counts(extract_edges(_link_triples(sf_dir)))


def q_kg_class_profile(sf_dir: str):
    """Per-class schema summary (instances, out-edges, distinct preds,
    max out-degree) — edges x rdf:type hash join + class-scale merges
    (stages/graph.class_profile)."""
    from nospa_rdf_data_cube_validator_ray.stages.graph import class_profile

    return class_profile(_link_triples(sf_dir))


def q_kg_link_scores(sf_dir: str):
    """Common-neighbor link-prediction scores over the link graph
    (stages/graph.link_scores): hub-capped wedge generation, anti-join
    against existing edges, bucketed per-node top-5."""
    from nospa_rdf_data_cube_validator_ray.stages.graph import (
        extract_edges,
        link_scores,
    )

    return link_scores(extract_edges(_link_triples(sf_dir)))


def q_kg_bgp_match(sf_dir: str):
    """Generic SPARQL basic-graph-pattern execution
    (stages/graph.bgp_match): 'orders placed by customers in a region-1
    nation' as a 3-pattern left-deep hash-join plan."""
    from nospa_rdf_data_cube_validator_ray.stages.graph import bgp_match

    return bgp_match(
        _link_triples(sf_dir),
        [
            ("?o", f"{_KGP}placedBy", "?c"),
            ("?c", f"{_KGP}inNation", "?n"),
            ("?n", f"{_KGP}inRegion", f"{_KGN}reg/1"),
        ],
    )


def q_kg_bgp_optional(sf_dir: str):
    """SPARQL OPTIONAL execution (stages/graph.bgp_match_optional —
    §18.5 LeftJoin as one extra hash join): every follows-edge order
    with its OPTIONAL successor; each customer's LAST chained order has
    none, so unbound rows ('' per SPARQL unbound) genuinely occur."""
    from nospa_rdf_data_cube_validator_ray.stages.graph import (
        bgp_match_optional,
    )

    return bgp_match_optional(
        _link_triples(sf_dir),
        [("?o", f"{_KGP}follows", "?prev")],
        [("?o2", f"{_KGP}follows", "?o")],
    )


def q_kg_bgp_union(sf_dir: str):
    """SPARQL UNION execution (stages/graph.bgp_match_union — §18.5
    Union as a metadata-only Dataset.union + one distinct): containment
    edges from either level of the hierarchy, '?x inNation ?y' UNION
    '?x inRegion ?y', so customers and nations land in ONE (x, y)
    solution set."""
    from nospa_rdf_data_cube_validator_ray.stages.graph import bgp_match_union

    return bgp_match_union(
        _link_triples(sf_dir),
        [
            [("?x", f"{_KGP}inNation", "?y")],
            [("?x", f"{_KGP}inRegion", "?y")],
        ],
    )


def q_kg_bgp_filter(sf_dir: str):
    """SPARQL FILTER execution (stages/graph.bgp_match_filter — §18.5
    Filter as one vectorized map_batches over the joined solutions):
    first orders joined to their customer's nation, restricted by a
    STRSTARTS on the order IRI and a regex on the nation IRI."""
    from nospa_rdf_data_cube_validator_ray.stages.graph import bgp_match_filter

    return bgp_match_filter(
        _link_triples(sf_dir),
        [
            ("?o", f"{_KGP}placedBy", "?c"),
            ("?c", f"{_KGP}inNation", "?n"),
        ],
        [
            ("?o", "strstarts", f"{_KGN}ord/1"),
            ("?n", "regex", r"nat/\d*[02468]$"),
        ],
    )


def q_kg_bgp_path(sf_dir: str):
    """SPARQL property-path execution (stages/graph.bgp_match_path —
    §18.4 one-or-more): '?a follows+ ?b . ?b placedBy ?c' over the
    order-chain corpus.  The ``follows+`` closure is evaluated once by
    the size-adaptive closure_pairs kernel (semi-naive, cycle-safe) and
    joins the ordinary placedBy pattern through the regular BGP plan —
    placedBy only exists on chain HEADS, so the join keeps exactly the
    (descendant order, head order, customer) rows."""
    from nospa_rdf_data_cube_validator_ray.stages.graph import bgp_match_path

    return bgp_match_path(
        _link_triples(sf_dir),
        [
            ("?a", f"{_KGP}follows+", "?b"),
            ("?b", f"{_KGP}placedBy", "?c"),
        ],
    )


def q_kg_bgp_path_alt(sf_dir: str):
    """SPARQL alternation under a one-or-more path (§18.4
    AlternativePath ∘ OneOrMorePath): '?a (follows|placedBy)+ ?b' —
    the closure runs over the UNION of both predicates' edge sets, so
    chains extend through their head order onto the customer
    (stages/graph.bgp_match_path alternation groups; same size-adaptive
    cycle-safe closure_pairs kernel underneath)."""
    from nospa_rdf_data_cube_validator_ray.stages.graph import bgp_match_path

    return bgp_match_path(
        _link_triples(sf_dir),
        [("?a", f"({_KGP}follows|{_KGP}placedBy)+", "?b")],
    )


def q_kg_bgp_minus(sf_dir: str):
    """SPARQL MINUS execution (stages/graph.bgp_match_minus — §18.5
    Minus as one bucketed anti-join on the shared variables): orders
    that follow a predecessor MINUS orders that are themselves followed
    — i.e. each customer chain's TAIL order with its predecessor."""
    from nospa_rdf_data_cube_validator_ray.stages.graph import bgp_match_minus

    return bgp_match_minus(
        _link_triples(sf_dir),
        [("?o", f"{_KGP}follows", "?prev")],
        [("?x", f"{_KGP}follows", "?o")],
    )


def q_kg_bgp_agg(sf_dir: str):
    """SPARQL SELECT-aggregate over a property-path BGP
    (stages/graph.bgp_match_agg — §18.5 Group/Aggregation): per
    customer, COUNT of (descendant, head) chain pairs reachable through
    '?a follows+ ?b . ?b placedBy ?c' GROUP BY ?c — the full algebra
    stack (path closure → conjunctive join → grouped aggregate) in one
    plan, no driver-side grouping."""
    from nospa_rdf_data_cube_validator_ray.stages.graph import bgp_match_agg

    out = bgp_match_agg(
        _link_triples(sf_dir),
        [
            ("?a", f"{_KGP}follows+", "?b"),
            ("?b", f"{_KGP}placedBy", "?c"),
        ],
        group_vars=["c"],
    )
    df = out.to_pandas().sort_values("c", ignore_index=True)
    return df.astype({"c": "string", "n": "int64"})


def q_kg_assortativity(sf_dir: str):
    """Degree-assortativity SUFFICIENT STATISTICS over the link graph:
    per directed edge (u, v), x = out_deg(u), y = in_deg(v); emits one
    row (n_edges, sum_x, sum_y, sum_xy, sum_x2, sum_y2) — every term an
    order-independent int64, so the Pearson assortativity coefficient
    is one driver-side formula away while the oracle hashes bit-exactly
    (the events_type_trend integer-sufficient-statistics convention;
    a float correlation would hostage the hash to summation order).

    Scale shape: degree_table (map-side partials + one bucketed sum),
    then the edge table joins the node-scale degree table twice
    (partitioned hash joins — both sides scale, neither broadcasts) and
    the six sums reduce map-side to ONE row per block."""
    import ray.data

    from nospa_rdf_data_cube_validator_ray.stages.graph import (
        degree_table,
        extract_edges,
    )
    from nospa_rdf_data_cube_validator_ray.util import (
        heal_schema,
        join_partitions,
    )

    edges = extract_edges(_link_triples(sf_dir))
    deg = degree_table(edges).materialize()
    np_ = join_partitions(None)

    e = edges.map_batches(
        lambda df: pd.DataFrame(
            {
                "u": df["subj"].astype("string"),
                "v": df["obj"].astype("string"),
            }
        ),
        batch_format="pandas",
    )
    du = deg.map_batches(
        lambda df: pd.DataFrame(
            {
                "u": df["node"].astype("string"),
                "x": df["out_deg"].astype("int64"),
            }
        ),
        batch_format="pandas",
    )
    dv = deg.map_batches(
        lambda df: pd.DataFrame(
            {
                "v": df["node"].astype("string"),
                "y": df["in_deg"].astype("int64"),
            }
        ),
        batch_format="pandas",
    )
    j = heal_schema(e, np_).join(heal_schema(du, np_), "inner", np_, on=("u",))
    j = heal_schema(j, np_).join(heal_schema(dv, np_), "inner", np_, on=("v",))

    def stats(df: pd.DataFrame) -> pd.DataFrame:
        x = df["x"].astype("int64")
        y = df["y"].astype("int64")
        return pd.DataFrame(
            {
                "n_edges": pd.array([len(df)], dtype="int64"),
                "sum_x": pd.array([int(x.sum())], dtype="int64"),
                "sum_y": pd.array([int(y.sum())], dtype="int64"),
                "sum_xy": pd.array([int((x * y).sum())], dtype="int64"),
                "sum_x2": pd.array([int((x * x).sum())], dtype="int64"),
                "sum_y2": pd.array([int((y * y).sum())], dtype="int64"),
            }
        )

    parts = j.map_batches(stats, batch_format="pandas").to_pandas()
    cols = ["n_edges", "sum_x", "sum_y", "sum_xy", "sum_x2", "sum_y2"]
    if parts.empty or "n_edges" not in parts.columns:
        return pd.DataFrame({c: pd.array([0], dtype="int64") for c in cols})
    tot = parts.sum()
    return pd.DataFrame(
        {c: pd.array([int(tot[c])], dtype="int64") for c in cols}
    )


def q_kg_tree_betweenness(sf_dir: str):
    """Exact betweenness centrality over the provenance forest
    (stages/graph.tree_betweenness — closed-form from subtree sizes:
    bet(v) = C(n_t−1,2) − Σ C(c_i,2) − C(up,2), computed with one
    height-round fixpoint + one bucketed child-sum, never per-pair).
    The oracle rebuilds subtree sizes analytically from the chain
    structure (window ranks over orders, group sums up the
    cust→nation→region levels)."""
    from nospa_rdf_data_cube_validator_ray.stages.graph import (
        extract_edges,
        tree_betweenness,
    )

    return tree_betweenness(extract_edges(_link_triples(sf_dir)))


def q_kg_bfs_tree(sf_dir: str):
    """Shortest-path reconstruction: the parent-pointer BFS tree from
    region 1 over reversed provenance edges — parent = the
    lexicographically smallest predecessor one hop closer
    (stages/graph.bfs_tree: size-adaptive BFS + two hash joins + one
    bucketed min; walking parents from any node yields a shortest
    path)."""
    from nospa_rdf_data_cube_validator_ray.stages.graph import (
        bfs_tree,
        extract_edges,
    )

    return bfs_tree(
        extract_edges(_link_triples(sf_dir)), f"{_KGN}reg/1", reverse=True
    )


def q_kg_bfs_depths(sf_dir: str):
    """Min-hop BFS distances from region 1 along reversed edges (the
    provenance chains point leaf→root) — size-adaptive traversal
    (stages/graph.bfs_distances; broadcast-frontier regime parity-tested
    in tests/test_graph.py)."""
    from nospa_rdf_data_cube_validator_ray.stages.graph import (
        bfs_distances,
        extract_edges,
    )

    return bfs_distances(
        extract_edges(_link_triples(sf_dir)), [f"{_KGN}reg/1"], reverse=True
    )


# ---------------------------------------------------------------------------
# source-code import-graph extraction (part-derived Python corpus)
# ---------------------------------------------------------------------------

_CODE = "http://example.org/code#"
_CODEN = "http://example.org/code/"


def _code_import_edges(sf_dir: str):
    """Import edges (module-level import / from-import only), a
    pred-filter view over the ONE cached extraction (_code_triples)."""
    state = _CACHE.setdefault(sf_dir, {})
    if "code_edges" not in state:
        imp = (f"{_CODE}imports", f"{_CODE}importsFrom")
        state["code_edges"] = _code_triples(sf_dir).map_batches(
            lambda df: df[df["pred"].isin(imp)].reset_index(drop=True),
            batch_format="pandas",
        ).materialize()
    return state["code_edges"]


def q_kg_code_imports(sf_dir: str):
    """The extracted import-edge multiset (src, dst, kind) — vectorized
    regex triple extraction over repository file content
    (sources/code_extract.py); nested/commented imports must be absent,
    aliases stripped, comma lists exploded."""
    edges = _code_import_edges(sf_dir)
    return edges.map_batches(
        lambda df: df[["subj", "pred", "obj"]].rename(
            columns={"subj": "src", "pred": "kind", "obj": "dst"}
        ),
        batch_format="pandas",
    )


def q_kg_code_triangles(sf_dir: str):
    """All triangles of the (undirected) import graph, canonical
    lexicographic (a, b, c) — degree-oriented node-iterator enumeration
    (stages/graph.triangle_enum: orientation bounds wedge fan-out by
    O(sqrt(m)); size-adaptive degree lookup, parity-tested)."""
    from nospa_rdf_data_cube_validator_ray.stages.graph import triangle_enum

    return triangle_enum(_code_import_edges(sf_dir))


def q_kg_code_degree(sf_dir: str):
    """Degree profile of the extracted import graph — the extraction
    front end composed with stages/graph.degree_table."""
    from nospa_rdf_data_cube_validator_ray.stages.graph import degree_table

    return degree_table(_code_import_edges(sf_dir))


def q_kg_snapshot_latest(sf_dir: str):
    """Commit-version snapshot resolution over a multi-commit corpus:
    latest commit wins per (repo, path) (stages/dedup.latest_snapshot —
    map-side combiner + one coarse-bucket shuffle), then the surviving
    rows' content sha256 — the north-rule per-row content invariant —
    checked value-exactly by the oracle (DuckDB sha256 over rebuilt
    content)."""
    import hashlib

    from nospa_rdf_data_cube_validator_ray.fixtures import tpch_versioned_corpus
    from nospa_rdf_data_cube_validator_ray.stages.dedup import latest_snapshot

    import ray.data

    latest = latest_snapshot(
        ray.data.from_arrow(tpch_versioned_corpus(sf_dir))
    )

    def project(df: pd.DataFrame) -> pd.DataFrame:
        return pd.DataFrame(
            {
                "path": df["path"].astype("string"),
                "commit": df["commit"].astype("string"),
                "sha": pd.Series(
                    [
                        hashlib.sha256(t.encode("utf-8")).hexdigest()
                        for t in df["content"]
                    ],
                    dtype="string",
                    index=df.index,
                ),
            }
        )

    return latest.map_batches(project, batch_format="pandas")


def q_kg_snapshot_asof(sf_dir: str, asof: int = 1):
    """Time-travel read: the corpus AS OF commit ``asof`` — versions
    newer than the cutoff are filtered map-side (predicate pushdown on
    the totally ordered commit column), then the same latest-wins
    resolution as kg_snapshot_latest.  Output carries the per-row
    content sha256 (the north-rule invariant) so the oracle checks the
    reconstructed historical snapshot value-exactly."""
    import hashlib

    from nospa_rdf_data_cube_validator_ray.fixtures import tpch_versioned_corpus
    from nospa_rdf_data_cube_validator_ray.stages.dedup import latest_snapshot

    import ray.data

    cutoff = f"{asof:040d}"
    asof_rows = ray.data.from_arrow(tpch_versioned_corpus(sf_dir)).map_batches(
        lambda df: df[df["commit"] <= cutoff].reset_index(drop=True),
        batch_format="pandas",
    )
    latest = latest_snapshot(asof_rows)

    def project(df: pd.DataFrame) -> pd.DataFrame:
        return pd.DataFrame(
            {
                "path": df["path"].astype("string"),
                "commit": df["commit"].astype("string"),
                "sha": pd.Series(
                    [
                        hashlib.sha256(t.encode("utf-8")).hexdigest()
                        for t in df["content"]
                    ],
                    dtype="string",
                    index=df.index,
                ),
            }
        )

    return latest.map_batches(project, batch_format="pandas")


_SQL_SNAPSHOT_ASOF = """
WITH p AS (SELECT p_partkey AS k FROM part),
snap AS (
  SELECT k, CASE WHEN k % 2 = 0 THEN 1 ELSE 0 END AS j
  FROM p
)
SELECT 'src/m' || k || '.py' AS path,
       lpad(j::VARCHAR, 40, '0') AS "commit",
       sha256('import m' || ((k + 13 * j) % 97) || chr(10)) AS sha
FROM snap
"""


_SQL_SNAPSHOT_LATEST = """
WITH p AS (SELECT p_partkey AS k FROM part),
latest AS (
  SELECT k,
         CASE WHEN k % 4 = 0 THEN 2 WHEN k % 2 = 0 THEN 1 ELSE 0 END AS j
  FROM p
)
SELECT 'src/m' || k || '.py' AS path,
       lpad(j::VARCHAR, 40, '0') AS "commit",
       sha256('import m' || ((k + 13 * j) % 97) || chr(10)) AS sha
FROM latest
"""


_CODE_EDGE_BODY = f"""
p AS (SELECT p_partkey AS k FROM part),
cedges AS (
  SELECT '{_CODEN}mod/m' || k AS src, '{_CODEN}mod/m' || (k % 97) AS dst,
         '{_CODE}imports' AS kind
  FROM p
  UNION ALL
  SELECT '{_CODEN}mod/m' || k, '{_CODEN}mod/m' || ((7 * k + 1) % 101),
         '{_CODE}imports'
  FROM p WHERE k % 3 = 0
  UNION ALL
  SELECT '{_CODEN}mod/m' || k, '{_CODEN}mod/m' || ((11 * k + 3) % 103),
         '{_CODE}importsFrom'
  FROM p WHERE k % 3 = 1
  UNION ALL
  SELECT '{_CODEN}mod/m' || k, '{_CODEN}mod/m' || ((5 * k + 2) % 107),
         '{_CODE}imports'
  FROM p WHERE k % 3 = 2
  UNION ALL
  SELECT '{_CODEN}mod/m' || k, '{_CODEN}mod/m' || ((3 * k + 5) % 109),
         '{_CODE}imports'
  FROM p WHERE k % 3 = 2
)
"""

_SQL_CODE_IMPORTS = f"""
WITH {_CODE_EDGE_BODY}
SELECT src, dst, kind FROM cedges
"""

_SQL_RECIPROCITY = f"""
WITH {_CODE_EDGE_BODY},
e AS (SELECT DISTINCT src AS a, dst AS b FROM cedges
      WHERE kind = '{_CODE}imports' AND src <> dst)
SELECT (SELECT count(*) FROM e)::BIGINT AS n_edges,
       (SELECT count(*) FROM e x JOIN e y
          ON x.a = y.b AND x.b = y.a)::BIGINT AS n_reciprocal
"""

def q_kg_code_pagerank(sf_dir: str):
    """Deterministic integer PageRank (3 iterations, floor arithmetic —
    bit-exact across engines, unlike float PageRank) over the import
    graph (stages/graph.pagerank_int; size-adaptive: driver loop under
    an edge threshold, per-iteration hash joins above, parity-tested)."""
    from nospa_rdf_data_cube_validator_ray.stages.graph import pagerank_int

    return pagerank_int(_code_import_edges(sf_dir))


def _pagerank_sql(
    iters: int = 3,
    scale: int = 1_000_000,
    dn: int = 85,
    dd: int = 100,
    seeds: tuple[str, ...] | None = None,
) -> str:
    """K chained-CTE PageRank iterations mirroring pagerank_int's
    integer semantics exactly (floor division both sides).  ``seeds``
    produces the personalized variant: initial mass and the restart
    term land only on the seed set, mirroring restart_nodes."""
    base = (dd - dn) * scale // dd
    if seeds is None:
        pr0 = f"{scale}::BIGINT"
        base_term = str(base)
    else:
        inlist = ", ".join(f"'{s}'" for s in seeds)
        pr0 = f"(CASE WHEN node IN ({inlist}) THEN {scale} ELSE 0 END)::BIGINT"
        base_term = f"(CASE WHEN n.node IN ({inlist}) THEN {base} ELSE 0 END)"
    parts = [
        f"""nodes AS (
  SELECT DISTINCT node
  FROM (SELECT src AS node FROM cedges UNION ALL SELECT dst FROM cedges)
),
od AS (SELECT src AS node, count(*) AS d FROM cedges GROUP BY src),
pr0 AS (SELECT node, {pr0} AS pr FROM nodes)"""
    ]
    for i in range(iters):
        parts.append(
            f""",
pr{i + 1} AS (
  SELECT n.node, ({base_term} + {dn} * coalesce(s.s, 0) // {dd})::BIGINT AS pr
  FROM nodes n LEFT JOIN (
    SELECT e.dst AS node, sum(p.pr // od.d)::BIGINT AS s
    FROM pr{i} p
    JOIN od ON p.node = od.node
    JOIN cedges e ON e.src = p.node
    GROUP BY e.dst
  ) s ON n.node = s.node
)"""
        )
    return (
        f"WITH {_CODE_EDGE_BODY},\n"
        + "".join(parts)
        + f"\nSELECT node, pr FROM pr{iters}"
    )


_SQL_CODE_PAGERANK = _pagerank_sql()

# PPR seeds: one popular hub target (m0) + one mid-tier module — shared
# constant so the engine call and the oracle can never drift
_PPR_SEEDS = (f"{_CODEN}mod/m0", f"{_CODEN}mod/m7")
_SQL_CODE_PPR = _pagerank_sql(seeds=_PPR_SEEDS)


def q_kg_code_ppr(sf_dir: str):
    """Personalized PageRank from a 2-module seed set over the import
    graph — pagerank_int(restart_nodes=...): initial mass and the
    restart term land only on the seeds, integer floor arithmetic end
    to end (stages/graph.pagerank_int, size-adaptive + parity-tested
    driver/distributed regimes)."""
    from nospa_rdf_data_cube_validator_ray.stages.graph import pagerank_int

    return pagerank_int(
        _code_import_edges(sf_dir), restart_nodes=list(_PPR_SEEDS)
    )


_SQL_CODE_TRIANGLES = f"""
WITH {_CODE_EDGE_BODY},
u AS (
  SELECT DISTINCT least(src, dst) AS x, greatest(src, dst) AS y
  FROM cedges WHERE src != dst
)
SELECT e1.x AS a, e1.y AS b, e2.y AS c
FROM u e1
JOIN u e2 ON e2.x = e1.y
JOIN u e3 ON e3.x = e1.x AND e3.y = e2.y
"""

_SQL_CODE_DEGREE = f"""
WITH {_CODE_EDGE_BODY},
o AS (SELECT src AS node, count(*) AS c FROM cedges GROUP BY src),
i AS (SELECT dst AS node, count(*) AS c FROM cedges GROUP BY dst)
SELECT coalesce(o.node, i.node) AS node,
       coalesce(o.c, 0)::BIGINT AS out_deg,
       coalesce(i.c, 0)::BIGINT AS in_deg
FROM o FULL OUTER JOIN i ON o.node = i.node
"""


def q_kg_hits(sf_dir: str):
    """Deterministic integer HITS hubs & authorities (2 iterations,
    max-normalized floor arithmetic — bit-exact across engines, unlike
    the classical L2-normalized float HITS) over the import graph
    (stages/graph.hits_int; size-adaptive: driver loop under an edge
    threshold, per-half-step hash join + bucketed sum + scalar-max
    broadcast above, parity-tested)."""
    from nospa_rdf_data_cube_validator_ray.stages.graph import hits_int

    return hits_int(_code_import_edges(sf_dir))


def _hits_sql(iters: int = 2, scale: int = 1_000_000) -> str:
    """K unrolled MATERIALIZED-CTE HITS iterations mirroring
    hits_int's integer semantics exactly (floor division and
    max-normalization both sides).  MATERIALIZED matters: DuckDB
    inlines plain chained CTEs exponentially (the kg_kcore lesson)."""
    parts = [
        f"""nodes AS MATERIALIZED (
  SELECT DISTINCT node
  FROM (SELECT src AS node FROM cedges UNION ALL SELECT dst FROM cedges)
),
hub0 AS MATERIALIZED (SELECT node, {scale}::BIGINT AS v FROM nodes)"""
    ]
    for i in range(1, iters + 1):
        parts.append(
            f""",
a{i}r AS MATERIALIZED (
  SELECT n.node, coalesce(s.s, 0)::BIGINT AS s
  FROM nodes n LEFT JOIN (
    SELECT e.dst AS node, sum(h.v)::BIGINT AS s
    FROM hub{i - 1} h JOIN cedges e ON e.src = h.node GROUP BY e.dst
  ) s ON n.node = s.node
),
a{i}m AS MATERIALIZED (SELECT greatest(max(s), 1) AS m FROM a{i}r),
auth{i} AS MATERIALIZED (
  SELECT r.node, (r.s * {scale} // m.m)::BIGINT AS v
  FROM a{i}r r CROSS JOIN a{i}m m
),
h{i}r AS MATERIALIZED (
  SELECT n.node, coalesce(s.s, 0)::BIGINT AS s
  FROM nodes n LEFT JOIN (
    SELECT e.src AS node, sum(a.v)::BIGINT AS s
    FROM auth{i} a JOIN cedges e ON e.dst = a.node GROUP BY e.src
  ) s ON n.node = s.node
),
h{i}m AS MATERIALIZED (SELECT greatest(max(s), 1) AS m FROM h{i}r),
hub{i} AS MATERIALIZED (
  SELECT r.node, (r.s * {scale} // m.m)::BIGINT AS v
  FROM h{i}r r CROSS JOIN h{i}m m
)"""
        )
    return (
        f"WITH {_CODE_EDGE_BODY},\n"
        + "".join(parts)
        + f"""
SELECT a.node, a.v AS auth, h.v AS hub
FROM auth{iters} a JOIN hub{iters} h ON a.node = h.node"""
    )


_SQL_CODE_HITS = _hits_sql()


def q_kg_clustering(sf_dir: str):
    """Per-node local clustering coefficient of the undirected import
    graph, as integer parts-per-million (stages/graph.clustering_coeff:
    triangle membership counts from the degree-oriented enumeration +
    one bucketed sum, joined onto distinct-neighbor degrees)."""
    from nospa_rdf_data_cube_validator_ray.stages.graph import clustering_coeff

    return clustering_coeff(_code_import_edges(sf_dir))


_SQL_CODE_CLUSTERING = f"""
WITH {_CODE_EDGE_BODY},
u AS MATERIALIZED (
  SELECT DISTINCT least(src, dst) AS x, greatest(src, dst) AS y
  FROM cedges WHERE src != dst
),
tris AS MATERIALIZED (
  SELECT e1.x AS a, e1.y AS b, e2.y AS c
  FROM u e1
  JOIN u e2 ON e2.x = e1.y
  JOIN u e3 ON e3.x = e1.x AND e3.y = e2.y
),
tcount AS (
  SELECT node, count(*)::BIGINT AS tri
  FROM (SELECT a AS node FROM tris
        UNION ALL SELECT b FROM tris
        UNION ALL SELECT c FROM tris)
  GROUP BY node
),
deg AS (
  SELECT node, count(*)::BIGINT AS deg
  FROM (SELECT x AS node FROM u UNION ALL SELECT y FROM u)
  GROUP BY node
)
SELECT d.node,
       coalesce(t.tri, 0)::BIGINT AS tri,
       d.deg,
       CASE WHEN d.deg >= 2
            THEN (2 * coalesce(t.tri, 0) * 1000000 // (d.deg * (d.deg - 1)))::BIGINT
            ELSE 0::BIGINT END AS coeff_ppm
FROM deg d LEFT JOIN tcount t ON d.node = t.node
"""


def q_kg_scc(sf_dir: str):
    """Strongly connected components (cycle groups) of the directed
    import graph — label = each SCC's lexicographically smallest module
    (stages/graph.scc; size-adaptive: iterative Tarjan on the driver
    under an edge threshold, distributed FW-BW-MIN peeling above,
    parity-tested)."""
    from nospa_rdf_data_cube_validator_ray.stages.graph import scc

    return scc(_code_import_edges(sf_dir))


_SQL_CODE_SCC = f"""
WITH RECURSIVE {_CODE_EDGE_BODY},
de AS MATERIALIZED (SELECT DISTINCT src, dst FROM cedges),
nodes AS MATERIALIZED (
  SELECT DISTINCT node
  FROM (SELECT src AS node FROM de UNION ALL SELECT dst FROM de)
),
reach AS (
  SELECT src AS a, dst AS b FROM de
  UNION
  SELECT r.a, e.dst FROM reach r JOIN de e ON e.src = r.b
),
mutual AS (
  SELECT r1.a, r1.b
  FROM reach r1 JOIN reach r2 ON r1.a = r2.b AND r1.b = r2.a
)
SELECT n.node, least(n.node, coalesce(min(m.b), n.node)) AS label
FROM nodes n LEFT JOIN mutual m ON m.a = n.node
GROUP BY n.node
"""


def _code_triples(sf_dir: str):
    """All code triples (imports + definitions) for the code corpus,
    extracted once per sf_dir."""
    state = _CACHE.setdefault(sf_dir, {})
    if "code_triples" not in state:
        import ray.data

        from nospa_rdf_data_cube_validator_ray.fixtures import tpch_code_corpus
        from nospa_rdf_data_cube_validator_ray.sources.code_extract import (
            extract_code_corpus,
        )

        state["code_triples"] = extract_code_corpus(
            ray.data.from_arrow(tpch_code_corpus(sf_dir))
        ).materialize()
    return state["code_triples"]


# keep _code_import_edges derived from the SAME cached extraction (a
# separate extract+materialize would double the work per sf_dir)


def q_kg_code_components(sf_dir: str):
    """Connected components of the undirected import graph — the
    size-adaptive CC engine (driver union-find / cc_labels min-label
    propagation, parity-tested) applied to the code KG; label = the
    component's lexicographically smallest module IRI."""
    from nospa_rdf_data_cube_validator_ray.stages.graph import components

    return components(_code_import_edges(sf_dir))


def q_kg_code_reachable(sf_dir: str):
    """Multi-hop reverse traversal: every module that TRANSITIVELY
    imports mod/m1, with its min-hop distance (stages/graph.bfs_distances,
    reverse=True — size-adaptive driver BFS / broadcast-frontier walk)."""
    from nospa_rdf_data_cube_validator_ray.stages.graph import bfs_distances

    return bfs_distances(
        _code_import_edges(sf_dir), [f"{_CODEN}mod/m1"], reverse=True
    )


def q_kg_weighted_sssp(sf_dir: str):
    """Weighted shortest paths from mod/m1 along reversed import edges:
    deterministic integer edge weights md5_u64(src|dst) % 9 + 1 (the md5
    oracle bridge), synchronous Bellman-Ford with a convergence raise
    (stages/graph.sssp — size-adaptive driver numpy relaxation /
    per-round hash join + bucketed min with a (count, sum) fixpoint
    test).  The cost-aware upgrade of kg_code_reachable."""
    from nospa_rdf_data_cube_validator_ray.stages.graph import sssp

    return sssp(
        _code_import_edges(sf_dir), [f"{_CODEN}mod/m1"], reverse=True
    )


# recursive (node, cumdist) enumeration: every prefix of a shortest path
# has cumdist < 9 * min-hop-eccentricity (~20 on this graph) << 512, so
# the guard never cuts a shortest path; min() collapses the rest
_SQL_KG_SSSP = f"""
WITH RECURSIVE {_CODE_EDGE_BODY},
re AS (SELECT DISTINCT obj AS src, subj AS dst FROM (
  SELECT src AS subj, dst AS obj FROM cedges WHERE src <> dst)),
w AS (SELECT src, dst,
        (md5_number_lower(src || '|' || dst) % 9 + 1)::BIGINT AS w
      FROM re),
reach(node, d) AS (
  SELECT '{_CODEN}mod/m1' AS node, 0::BIGINT AS d
  UNION
  SELECT w.dst AS node, r.d + w.w AS d
  FROM reach r JOIN w ON w.src = r.node
  WHERE r.d < 512
)
SELECT node, min(d)::BIGINT AS dist FROM reach GROUP BY node
"""


def q_kg_triangle_types(sf_dir: str):
    """Directed-motif census of the import graph's triangles: which of
    the 6 ordered pairs exist (bit mask) and the cyclic/transitive
    split (stages/graph.triangle_motifs — map-side bit-weighted pair
    explosion meeting the distinct directed edge set in ONE hash join,
    re-assembled by a bucketed sum)."""
    from nospa_rdf_data_cube_validator_ray.stages.graph import triangle_motifs

    return triangle_motifs(_code_import_edges(sf_dir))


_SQL_TRIANGLE_TYPES = f"""
WITH {_CODE_EDGE_BODY},
de AS (SELECT DISTINCT src, dst FROM cedges WHERE src != dst),
u AS (SELECT DISTINCT least(src, dst) AS x, greatest(src, dst) AS y FROM de),
tri AS (
  SELECT e1.x AS a, e1.y AS b, e2.y AS c
  FROM u e1 JOIN u e2 ON e2.x = e1.y
  JOIN u e3 ON e3.x = e1.x AND e3.y = e2.y
),
m AS (
  SELECT a, b, c,
     (CASE WHEN EXISTS (SELECT 1 FROM de WHERE src = a AND dst = b)
           THEN 1 ELSE 0 END
    + CASE WHEN EXISTS (SELECT 1 FROM de WHERE src = b AND dst = a)
           THEN 2 ELSE 0 END
    + CASE WHEN EXISTS (SELECT 1 FROM de WHERE src = b AND dst = c)
           THEN 4 ELSE 0 END
    + CASE WHEN EXISTS (SELECT 1 FROM de WHERE src = c AND dst = b)
           THEN 8 ELSE 0 END
    + CASE WHEN EXISTS (SELECT 1 FROM de WHERE src = c AND dst = a)
           THEN 16 ELSE 0 END
    + CASE WHEN EXISTS (SELECT 1 FROM de WHERE src = a AND dst = c)
           THEN 32 ELSE 0 END)::BIGINT AS mask
  FROM tri
)
SELECT a, b, c, mask,
       CASE WHEN (mask & 21) = 21 OR (mask & 42) = 42
            THEN 'cyclic' ELSE 'transitive' END AS motif
FROM m
"""


def q_kg_property_cardinality(sf_dir: str):
    """Ontology bootstrapping: per-predicate cardinality profile of the
    code KG — triple count, distinct subject/object counts, max out/in
    multiplicities, functional / inverse-functional flags
    (stages/graph.property_cardinality — per-block partials, one
    bucketed sum per side, driver combine of |preds|-scale rows)."""
    from nospa_rdf_data_cube_validator_ray.stages.graph import (
        property_cardinality,
    )

    return property_cardinality(_code_triples(sf_dir))


_SQL_PROPERTY_CARDINALITY = f"""
WITH {_CODE_EDGE_BODY},
trip AS (
  SELECT src AS s, kind AS pred, dst AS o FROM cedges
  UNION ALL
  SELECT '{_CODEN}mod/m' || k, '{_CODE}definesFunction',
         '{_CODEN}def/m' || k || '.fn_' || k FROM p
  UNION ALL
  SELECT '{_CODEN}mod/m' || k, '{_CODE}definesClass',
         '{_CODEN}def/m' || k || '.C' || k FROM p
),
ps AS (SELECT pred, s, count(*) AS c FROM trip GROUP BY 1, 2),
po AS (SELECT pred, o, count(*) AS c FROM trip GROUP BY 1, 2),
sagg AS (SELECT pred, count(*) AS n_subjects, max(c) AS mx, sum(c) AS n
         FROM ps GROUP BY 1),
oagg AS (SELECT pred, count(*) AS n_objects, max(c) AS mo FROM po GROUP BY 1)
SELECT s.pred,
       s.n::BIGINT AS n_triples,
       s.n_subjects::BIGINT AS n_subjects,
       o.n_objects::BIGINT AS n_objects,
       s.mx::BIGINT AS max_out_per_subj,
       o.mo::BIGINT AS max_in_per_obj,
       (CASE WHEN s.mx = 1 THEN 1 ELSE 0 END)::BIGINT AS functional,
       (CASE WHEN o.mo = 1 THEN 1 ELSE 0 END)::BIGINT AS inverse_functional
FROM sagg s JOIN oagg o ON s.pred = o.pred
"""


def q_kg_pred_subsumption(sf_dir: str):
    """Property-hierarchy induction over the code KG: ordered predicate
    pairs with subject-set overlap and containment flags
    (stages/graph.pred_subsumption — subject-bucketed dedup with
    in-bucket pair expansion; the importsFrom ⊑ imports containment is
    real in this corpus: every k%3==1 module also plain-imports)."""
    from nospa_rdf_data_cube_validator_ray.stages.graph import pred_subsumption

    return pred_subsumption(_code_triples(sf_dir))


_SQL_PRED_SUBSUMPTION = f"""
WITH {_CODE_EDGE_BODY},
trip AS (
  SELECT src AS s, kind AS pred, dst AS o FROM cedges
  UNION ALL
  SELECT '{_CODEN}mod/m' || k, '{_CODE}definesFunction',
         '{_CODEN}def/m' || k || '.fn_' || k FROM p
  UNION ALL
  SELECT '{_CODEN}mod/m' || k, '{_CODE}definesClass',
         '{_CODEN}def/m' || k || '.C' || k FROM p
),
sp AS (SELECT DISTINCT pred, s FROM trip),
tot AS (SELECT pred, count(*) AS n FROM sp GROUP BY 1),
ab AS (
  SELECT a.pred AS pred_a, b.pred AS pred_b, count(*) AS n_ab
  FROM sp a JOIN sp b ON a.s = b.s AND a.pred <> b.pred
  GROUP BY 1, 2
)
SELECT t.pred AS pred_a, t2.pred AS pred_b,
       t.n::BIGINT AS n_a,
       coalesce(ab.n_ab, 0)::BIGINT AS n_ab,
       (CASE WHEN coalesce(ab.n_ab, 0) = t.n THEN 1 ELSE 0 END)::BIGINT
         AS contained
FROM tot t JOIN tot t2 ON t.pred <> t2.pred
LEFT JOIN ab ON ab.pred_a = t.pred AND ab.pred_b = t2.pred
"""


def q_kg_degree_incremental(sf_dir: str):
    """Incremental degree-view maintenance over a keyed change feed:
    DELETE keys remove every matching (src, dst) edge, INSERT rows
    append; the maintained view = base degree partials + feed deltas
    through ONE bucketed sum — the base edge table is scanned once for
    delete-key matches (broadcast feed membership, map-side) and the
    degree table is never recomputed.  Must equal a full recompute on
    the modified edge multiset (the oracle).  Feed (part-derived):
    delete (m_k → m_(k%97)) for k%5=0, insert (m_k → m_(2k+1 mod 97))
    for k%7=0."""
    import pandas as pd
    import ray.data

    from nospa_rdf_data_cube_validator_ray.stages.graph import degree_table
    from nospa_rdf_data_cube_validator_ray.util import bucket_sum

    edges = _code_import_edges(sf_dir)
    base_deg = degree_table(edges)

    keys = (
        ray.data.read_parquet(
            f"{sf_dir}/part.parquet", columns=["p_partkey"]
        )
        .to_pandas()["p_partkey"]
        .to_numpy()
    )
    rem_k = keys[keys % 5 == 0]
    add_k = keys[keys % 7 == 0]
    # the delete-key set is feed-scale: broadcast it ONCE via ray.put
    # (per-worker cached ray.get) instead of pickling it into every
    # map task's closure — the cluster_from_pairs broadcast pattern
    import ray as _ray

    rem_ref = _ray.put(
        set(f"{_CODEN}mod/m{k}\x01{_CODEN}mod/m{k % 97}" for k in rem_k)
    )
    adds = pd.DataFrame(
        {
            "subj": [f"{_CODEN}mod/m{k}" for k in add_k],
            "obj": [f"{_CODEN}mod/m{(2 * k + 1) % 97}" for k in add_k],
        }
    )

    def removal_deltas(df: pd.DataFrame) -> pd.DataFrame:
        import ray as _r

        rem_pairs = _r.get(rem_ref)
        hit = (df["subj"].astype(str) + "\x01" + df["obj"].astype(str)).isin(
            rem_pairs
        )
        d = df[hit]
        o = d["subj"].value_counts()
        i = d["obj"].value_counts()
        nodes = o.index.union(i.index)
        return pd.DataFrame(
            {
                "node": pd.Series(nodes, dtype="string"),
                "out_deg": -o.reindex(nodes, fill_value=0)
                .astype("int64")
                .to_numpy(),
                "in_deg": -i.reindex(nodes, fill_value=0)
                .astype("int64")
                .to_numpy(),
            }
        )

    def add_deltas(df: pd.DataFrame) -> pd.DataFrame:
        o = df["subj"].value_counts()
        i = df["obj"].value_counts()
        nodes = o.index.union(i.index)
        return pd.DataFrame(
            {
                "node": pd.Series(nodes, dtype="string"),
                "out_deg": o.reindex(nodes, fill_value=0)
                .astype("int64")
                .to_numpy(),
                "in_deg": i.reindex(nodes, fill_value=0)
                .astype("int64")
                .to_numpy(),
            }
        )

    deltas = edges.map_batches(removal_deltas, batch_format="pandas").union(
        ray.data.from_pandas(add_deltas(adds))
    )
    updated = bucket_sum(
        base_deg.union(deltas), ["node"], ["out_deg", "in_deg"]
    )

    def finish(df: pd.DataFrame) -> pd.DataFrame:
        if not len(df):
            return pd.DataFrame(
                {
                    "node": pd.Series(dtype="string"),
                    "out_deg": pd.Series(dtype="int64"),
                    "in_deg": pd.Series(dtype="int64"),
                }
            )
        keep = (df["out_deg"] != 0) | (df["in_deg"] != 0)
        out = df[keep].reset_index(drop=True)
        return out.astype(
            {"node": "string", "out_deg": "int64", "in_deg": "int64"}
        )

    return updated.map_batches(finish, batch_format="pandas")


_SQL_DEGREE_INCREMENTAL = f"""
WITH {_CODE_EDGE_BODY},
rem AS (
  SELECT '{_CODEN}mod/m' || k AS src, '{_CODEN}mod/m' || (k % 97) AS dst
  FROM p WHERE k % 5 = 0
),
ins AS (
  SELECT '{_CODEN}mod/m' || k AS src,
         '{_CODEN}mod/m' || ((2 * k + 1) % 97) AS dst
  FROM p WHERE k % 7 = 0
),
m AS (
  SELECT c.src, c.dst FROM cedges c
  WHERE NOT EXISTS (
    SELECT 1 FROM rem r WHERE r.src = c.src AND r.dst = c.dst
  )
  UNION ALL
  SELECT src, dst FROM ins
),
o AS (SELECT src AS node, count(*) AS c FROM m GROUP BY 1),
i AS (SELECT dst AS node, count(*) AS c FROM m GROUP BY 1)
SELECT coalesce(o.node, i.node) AS node,
       coalesce(o.c, 0)::BIGINT AS out_deg,
       coalesce(i.c, 0)::BIGINT AS in_deg
FROM o FULL OUTER JOIN i ON o.node = i.node
"""


def q_kg_degree_hist(sf_dir: str):
    """Degree-distribution health check: log2-bucket histogram of total
    degree over the import graph — the skew diagnostic a planner reads
    before picking shuffle partitioning.  Rides degree_table; the
    bucket domain is ≤64, so the final aggregate is trivially small.
    Buckets via the exact float exponent (frexp), not log2 rounding."""
    import numpy as np
    import pandas as pd

    from nospa_rdf_data_cube_validator_ray.stages.graph import degree_table
    from nospa_rdf_data_cube_validator_ray.util import bucket_sum

    deg = degree_table(_code_import_edges(sf_dir))

    def partial(df: pd.DataFrame) -> pd.DataFrame:
        tot = (
            df["out_deg"].astype("int64") + df["in_deg"].astype("int64")
        ).to_numpy()
        b = np.frexp(tot.astype("float64"))[1] - 1  # floor(log2), exact
        g = (
            pd.DataFrame({"bucket": b.astype("int64")})
            .groupby("bucket", as_index=False)
            .size()
            .rename(columns={"size": "n_nodes"})
        )
        return g.astype("int64")

    return bucket_sum(
        deg.map_batches(partial, batch_format="pandas"),
        ["bucket"],
        ["n_nodes"],
    )


# floor(log2(tot)) via binary-string length — exact, no float log
_SQL_DEGREE_HIST = f"""
WITH {_CODE_EDGE_BODY},
o AS (SELECT src AS node, count(*) AS c FROM cedges GROUP BY 1),
i AS (SELECT dst AS node, count(*) AS c FROM cedges GROUP BY 1),
d AS (
  SELECT coalesce(o.c, 0) + coalesce(i.c, 0) AS tot
  FROM o FULL OUTER JOIN i ON o.node = i.node
)
SELECT (length(format('{{:b}}', tot)) - 1)::BIGINT AS bucket,
       count(*)::BIGINT AS n_nodes
FROM d GROUP BY 1
"""


def q_kg_degree_asof(sf_dir: str):
    """Time-travel graph analytics: the import-graph degree table AS OF
    commit 1 — the as-of snapshot read (map-side commit-cutoff
    pushdown + latest-wins resolution, the kg_snapshot_asof machinery)
    feeds the code-triple extractor and stages/graph.degree_table;
    nothing newer than the cutoff is ever parsed."""
    import ray.data

    from nospa_rdf_data_cube_validator_ray.fixtures import tpch_versioned_corpus
    from nospa_rdf_data_cube_validator_ray.sources.parse_stage import (
        extract_corpus,
    )
    from nospa_rdf_data_cube_validator_ray.stages.dedup import latest_snapshot
    from nospa_rdf_data_cube_validator_ray.stages.graph import degree_table

    cutoff = f"{1:040d}"
    rows = ray.data.from_arrow(tpch_versioned_corpus(sf_dir)).map_batches(
        lambda df: df[df["commit"] <= cutoff].reset_index(drop=True),
        batch_format="pandas",
    )
    triples = extract_corpus(latest_snapshot(rows))
    imp = (f"{_CODE}imports", f"{_CODE}importsFrom")
    edges = triples.map_batches(
        lambda df: df[df["pred"].isin(imp)].reset_index(drop=True),
        batch_format="pandas",
    )
    return degree_table(edges)


# as-of commit 1: k even → version j=1 (import m_(k+13 mod 97)),
# k odd → j=0 (import m_(k mod 97)); one import edge per module file
_SQL_DEGREE_ASOF = f"""
WITH p AS (SELECT p_partkey AS k FROM part),
v AS (SELECT k, CASE WHEN k % 2 = 0 THEN 1 ELSE 0 END AS j FROM p),
e AS (
  SELECT '{_CODEN}mod/m' || k AS src,
         '{_CODEN}mod/m' || ((k + 13 * j) % 97) AS dst
  FROM v
),
o AS (SELECT src AS node, count(*) AS c FROM e GROUP BY 1),
i AS (SELECT dst AS node, count(*) AS c FROM e GROUP BY 1)
SELECT coalesce(o.node, i.node) AS node,
       coalesce(o.c, 0)::BIGINT AS out_deg,
       coalesce(i.c, 0)::BIGINT AS in_deg
FROM o FULL OUTER JOIN i ON o.node = i.node
"""


_CLOSENESS_SEEDS = [f"{_CODEN}mod/m{k}" for k in (1, 2, 3, 5)]


def q_kg_closeness(sf_dir: str):
    """Sampled closeness centrality over the import graph: ONE
    multi-source BFS carries all K seed frontiers at once (state keyed
    on the (src, node) pair — stages/graph.multi_bfs_distances, the
    size-adaptive driver/distributed generalization of bfs_distances),
    then a K-row aggregate of reachable-set size and integer distance
    sum (the exact ingredients of closeness; the float division is
    presentation)."""
    from nospa_rdf_data_cube_validator_ray.stages.graph import closeness_table

    return closeness_table(_code_import_edges(sf_dir), _CLOSENESS_SEEDS)


_SQL_KG_CLOSENESS = f"""
WITH RECURSIVE {_CODE_EDGE_BODY},
seeds(s) AS (
  SELECT unnest(['{_CODEN}mod/m1', '{_CODEN}mod/m2',
                 '{_CODEN}mod/m3', '{_CODEN}mod/m5'])
),
reach(src, node, d) AS (
  SELECT s, s, 0 FROM seeds
  UNION
  SELECT r.src, c.dst, r.d + 1
  FROM reach r JOIN cedges c ON c.src = r.node
  WHERE r.d < 100
),
m AS (SELECT src, node, min(d) AS d FROM reach GROUP BY src, node)
SELECT src, count(*)::BIGINT AS n_reached, sum(d)::BIGINT AS dist_sum
FROM m GROUP BY src
"""


def q_kg_harmonic(sf_dir: str):
    """Sampled harmonic centrality + eccentricity over the import graph
    — stages/graph.harmonic_table: the same single multi-source BFS as
    closeness, aggregated as Σ (10^6 // dist) integer floor terms (the
    disconnected-graph-safe centrality) and max dist per seed."""
    from nospa_rdf_data_cube_validator_ray.stages.graph import harmonic_table

    return harmonic_table(_code_import_edges(sf_dir), _CLOSENESS_SEEDS)


_SQL_KG_HARMONIC = f"""
WITH RECURSIVE {_CODE_EDGE_BODY},
seeds(s) AS (
  SELECT unnest(['{_CODEN}mod/m1', '{_CODEN}mod/m2',
                 '{_CODEN}mod/m3', '{_CODEN}mod/m5'])
),
reach(src, node, d) AS (
  SELECT s, s, 0 FROM seeds
  UNION
  SELECT r.src, c.dst, r.d + 1
  FROM reach r JOIN cedges c ON c.src = r.node
  WHERE r.d < 100
),
m AS (SELECT src, node, min(d) AS d FROM reach GROUP BY src, node)
SELECT src,
       sum(CASE WHEN d > 0 THEN 1000000 // d ELSE 0 END)::BIGINT
         AS harmonic_ppm,
       max(d)::BIGINT AS ecc
FROM m GROUP BY src
"""


def q_kg_code_defs(sf_dir: str):
    """The materialized definition-attribute view (module, kind, name)
    of the code KG — definesFunction/definesClass triples projected
    map-only (sources/code_extract.definition_table)."""
    from nospa_rdf_data_cube_validator_ray.sources.code_extract import (
        definition_table,
    )

    return definition_table(_code_triples(sf_dir))


def q_kg_module_summary(sf_dir: str):
    """Graph materialize: the per-node attribute table of the code KG —
    (node, out_imports, n_defs, n_classes, in_imports) via map-side
    partial counts + ONE node-scale groupby-sum
    (sources/code_extract.module_summary)."""
    from nospa_rdf_data_cube_validator_ray.sources.code_extract import (
        module_summary,
    )

    return module_summary(_code_triples(sf_dir))


def q_kg_commit_import_diff(sf_dir: str):
    """Commit-evolution delta over the multi-commit corpus: per
    (repo, path), the import targets added ('+') / removed ('-')
    between its first and latest commit — extraction ∪ corpus marker
    rows → one (repo, path)-bucketed shuffle → vectorized set compare
    (sources/code_extract.import_set_diff)."""
    import ray.data

    from nospa_rdf_data_cube_validator_ray.fixtures import tpch_versioned_corpus
    from nospa_rdf_data_cube_validator_ray.sources.code_extract import (
        import_set_diff,
    )

    return import_set_diff(
        ray.data.from_arrow(tpch_versioned_corpus(sf_dir))
    )


def q_kg_mixed_by_pred(sf_dir: str):
    """Heterogeneous-corpus format dispatch: the cube Turtle corpus and
    the Python code corpus concatenated into ONE repository table, fed
    to sources/parse_stage.extract_corpus (RDF rows → RDF parsers, code
    rows → code extractor, one streaming union), counted per predicate.
    The oracle is the cube per-pred prediction UNION the code-pred
    arithmetic — any cross-contamination between branches shifts a
    count."""
    import pyarrow as pa

    import ray.data

    from nospa_rdf_data_cube_validator_ray.fixtures import (
        tpch_code_corpus,
        tpch_cube_corpus,
    )
    from nospa_rdf_data_cube_validator_ray.sources.parse_stage import (
        extract_corpus,
    )

    mixed = pa.concat_tables(
        [tpch_cube_corpus(sf_dir), tpch_code_corpus(sf_dir)]
    )
    out = (
        extract_corpus(ray.data.from_arrow(mixed))
        .groupby("pred")
        .count()
        .to_pandas()
    )
    # rename in pandas, not rename_columns (Project chokes on the
    # schema-less empty blocks sparse groupbys can emit)
    out = out.rename(columns={"count()": "n"})
    out["n"] = out["n"].astype("int64")
    return out


def q_kg_code_2hop(sf_dir: str):
    """Per-node 2-hop neighborhood size over the import graph — the
    fan-out census a GNN sampling plan needs (stages/graph.two_hop_sizes:
    one mid-node hash join + bucketed distinct + bucketed count)."""
    from nospa_rdf_data_cube_validator_ray.stages.graph import two_hop_sizes

    return two_hop_sizes(_code_import_edges(sf_dir))


_SQL_CODE_2HOP = f"""
WITH {_CODE_EDGE_BODY},
e AS (SELECT DISTINCT src, dst FROM cedges),
two AS (
  SELECT src, dst FROM e
  UNION
  SELECT a.src, b.dst FROM e a JOIN e b ON a.dst = b.src
)
SELECT src AS node, count(*)::BIGINT AS n_2hop
FROM two WHERE src <> dst GROUP BY src
"""


def q_kg_random_walks(sf_dir: str):
    """Deterministic hash-pick random walks (length 4, one walk per
    node) over the import graph — the node2vec/DeepWalk-style corpus
    generator, exactly reproducible because each step is
    argmin(md5_u64(walk|step|candidate)) over the out-neighbors
    (stages/graph.random_walks; size-adaptive driver frames / per-step
    hash join + bucketed argmin, parity-tested)."""
    from nospa_rdf_data_cube_validator_ray.stages.graph import random_walks

    return random_walks(_code_import_edges(sf_dir), length=4)


def q_kg_node2vec_walks(sf_dir: str):
    """node2vec-BIASED deterministic walks (Grover & Leskovec 2016)
    over the import graph (stages/graph.node2vec_walks): the step
    distribution discourages backtracking and encourages 2-hop
    exploration via integer weight classes (return 1 / BFS 2 / DFS 4 —
    p=4, q=1/4 up to scale), each step picked by
    argmin(md5_u64(walk|t|cand) // w, cand).  Size-adaptive
    driver/distributed regimes, parity-tested."""
    from nospa_rdf_data_cube_validator_ray.stages.graph import node2vec_walks

    return node2vec_walks(_code_import_edges(sf_dir), length=4)


def q_kg_sage_neighbors(sf_dir: str):
    """GraphSAGE minibatch neighbor sampling (stages/graph.
    sage_neighbor_sample): per root, up to 3 out-neighbors at layer 1
    and up to 3 of each sampled node at layer 2, deterministically
    drawn by the walks' md5 convention (root-seeded, so different
    roots sample different neighborhoods through the same node) —
    the GNN-trainer expansion as a streaming two-pass pipeline."""
    from nospa_rdf_data_cube_validator_ray.stages.graph import (
        sage_neighbor_sample,
    )

    return sage_neighbor_sample(_code_import_edges(sf_dir), fanout=3)


_SQL_SAGE = f"""
WITH {_CODE_EDGE_BODY},
e AS (SELECT DISTINCT src, dst FROM cedges),
n AS (
  SELECT DISTINCT node
  FROM (SELECT src AS node FROM e UNION ALL SELECT dst FROM e)
),
l1 AS (
  SELECT root, src, dst FROM (
    SELECT n.node AS root, e.src, e.dst,
           row_number() OVER (
             PARTITION BY n.node, e.src
             ORDER BY md5_number_lower(
               n.node || '|1|' || e.src || '|' || e.dst), e.dst
           ) AS rn
    FROM n JOIN e ON e.src = n.node
  ) WHERE rn <= 3
),
f2 AS (SELECT DISTINCT root, dst AS nxt FROM l1),
c2 AS (
  SELECT DISTINCT f2.root, e.src, e.dst
  FROM f2 JOIN e ON e.src = f2.nxt
),
l2 AS (
  SELECT root, src, dst FROM (
    SELECT root, src, dst,
           row_number() OVER (
             PARTITION BY root, src
             ORDER BY md5_number_lower(
               root || '|2|' || src || '|' || dst), dst
           ) AS rn
    FROM c2
  ) WHERE rn <= 3
)
SELECT root, 1::BIGINT AS layer, src, dst FROM l1
UNION ALL
SELECT root, 2::BIGINT AS layer, src, dst FROM l2
"""


def _random_walks_cte(length: int = 4) -> str:
    """CTE body (w0..wL plus a unioned ``walks`` view) mirroring
    random_walks' pick exactly: row_number ordered by
    (md5_number_lower(walk|step|dst), dst) — the UBIGINT hash compares
    unsigned on both sides."""
    parts = [
        """e AS (SELECT DISTINCT src, dst FROM cedges),
n AS (
  SELECT DISTINCT node
  FROM (SELECT src AS node FROM e UNION ALL SELECT dst FROM e)
),
w0 AS (SELECT node AS walk, 0::BIGINT AS step, node FROM n)"""
    ]
    for t in range(1, length + 1):
        parts.append(
            f""",
w{t} AS (
  SELECT walk, {t}::BIGINT AS step, dst AS node
  FROM (
    SELECT w.walk, e.dst,
           row_number() OVER (
             PARTITION BY w.walk
             ORDER BY md5_number_lower(w.walk || '|{t}|' || e.dst), e.dst
           ) AS rn
    FROM w{t - 1} w JOIN e ON e.src = w.node
  ) WHERE rn = 1
)"""
        )
    union = "\n  UNION ALL\n  ".join(
        f"SELECT walk, step, node FROM w{t}" for t in range(length + 1)
    )
    return "".join(parts) + f",\nwalks AS (\n  {union}\n)"


_SQL_RANDOM_WALKS = (
    f"WITH {_CODE_EDGE_BODY},\n"
    + _random_walks_cte()
    + "\nSELECT walk, step, node FROM walks"
)


def _node2vec_cte(length: int = 4) -> str:
    """CTE body mirroring node2vec_walks: each step's key is
    md5_number_lower(walk|t|dst) // w with w = 1 (dst = prev), 2
    (prev->dst is an edge), else 4; step 1 has no prev so every
    candidate divides by 4 (the SAME division — // 4 introduces ties a
    raw-hash ordering would not have, so the oracle must divide too)."""
    parts = [
        """e AS (SELECT DISTINCT src, dst FROM cedges),
n AS (
  SELECT DISTINCT node
  FROM (SELECT src AS node FROM e UNION ALL SELECT dst FROM e)
),
v0 AS (SELECT node AS walk, 0::BIGINT AS step, node,
              ''::VARCHAR AS prev FROM n)"""
    ]
    for t in range(1, length + 1):
        w_case = (
            "CASE WHEN e.dst = w.prev THEN 1 "
            "WHEN EXISTS (SELECT 1 FROM e e2 WHERE e2.src = w.prev "
            "AND e2.dst = e.dst) THEN 2 ELSE 4 END"
        )
        parts.append(
            f""",
v{t} AS (
  SELECT walk, {t}::BIGINT AS step, dst AS node, prev
  FROM (
    SELECT w.walk, e.dst, w.node AS prev,
           row_number() OVER (
             PARTITION BY w.walk
             ORDER BY md5_number_lower(w.walk || '|{t}|' || e.dst)
                      // ({w_case}), e.dst
           ) AS rn
    FROM v{t - 1} w JOIN e ON e.src = w.node
  ) WHERE rn = 1
)"""
        )
    union = "\n  UNION ALL\n  ".join(
        f"SELECT walk, step, node FROM v{t}" for t in range(length + 1)
    )
    return "".join(parts) + f",\nn2v_walks AS (\n  {union}\n)"


_SQL_NODE2VEC = (
    f"WITH {_CODE_EDGE_BODY},\n"
    + _node2vec_cte()
    + "\nSELECT walk, step, node FROM n2v_walks"
)


def q_kg_walk_skipgrams(sf_dir: str, window: int = 2):
    """Skip-gram (center, context) pairs from the deterministic walks —
    the input tuples a node-embedding trainer consumes.  One map_batches
    self-merge per walk block is wrong at scale (walk rows for one walk
    can span blocks), so pairs come from a bucketed per-walk group:
    within each walk, every ordered pair with 0 < |step gap| ≤ window."""
    from nospa_rdf_data_cube_validator_ray.stages.graph import random_walks
    from nospa_rdf_data_cube_validator_ray.util import bucket_agg

    walks = random_walks(_code_import_edges(sf_dir), length=4)

    def pairs(df):
        import pandas as pd

        m = df.merge(df, on="walk", suffixes=("_a", "_b"))
        gap = (m["step_a"] - m["step_b"]).abs()
        m = m[(gap > 0) & (gap <= window)]
        out = pd.DataFrame(
            {
                "center": m["node_a"].astype("string"),
                "context": m["node_b"].astype("string"),
            }
        )
        return out.groupby(
            ["center", "context"], as_index=False, sort=False
        ).size().rename(columns={"size": "n"})

    from nospa_rdf_data_cube_validator_ray.util import bucket_sum

    # per-walk pair fan-out, then a cell-wise sum over the (center,
    # context) pair vocabulary — both bucketed, never per-key groups
    per_walk = bucket_agg(walks, ["walk"], pairs)
    out = bucket_sum(per_walk, ["center", "context"], ["n"])
    return out.map_batches(
        lambda df: df.assign(n=df["n"].astype("int64")),
        batch_format="pandas",
    )


_SQL_WALK_SKIPGRAMS = (
    f"WITH {_CODE_EDGE_BODY},\n"
    + _random_walks_cte()
    + """
SELECT a.node AS center, b.node AS context, count(*)::BIGINT AS n
FROM walks a
JOIN walks b ON b.walk = a.walk AND abs(b.step - a.step) BETWEEN 1 AND 2
GROUP BY 1, 2
"""
)


def q_kg_dag_depth(sf_dir: str):
    """Longest-path dependency depth (build-order / critical-path) over
    an acyclic import corpus — monotone Bellman-Ford-style fixpoint,
    rounds = graph depth, raises on cycles (stages/graph.dag_depth;
    size-adaptive driver loop / join rounds, parity-tested)."""
    import ray.data

    from nospa_rdf_data_cube_validator_ray.fixtures import tpch_dag_corpus
    from nospa_rdf_data_cube_validator_ray.sources.code_extract import (
        extract_code_corpus,
    )
    from nospa_rdf_data_cube_validator_ray.stages.graph import dag_depth

    imp = (f"{_CODE}imports", f"{_CODE}importsFrom")
    edges = extract_code_corpus(
        ray.data.from_arrow(tpch_dag_corpus(sf_dir))
    ).map_batches(
        lambda df: df[df["pred"].isin(imp)].reset_index(drop=True),
        batch_format="pandas",
    )
    return dag_depth(edges)


_SQL_DAG_DEPTH = f"""
WITH RECURSIVE p AS (SELECT p_partkey AS k FROM part WHERE p_partkey >= 2),
dedges AS (
  SELECT k AS src, k // 2 AS dst FROM p
  UNION
  SELECT k, k // 3 FROM p
),
dnodes AS (SELECT src AS n FROM dedges UNION SELECT dst FROM dedges),
reach(node, d) AS (
  SELECT n, 0 FROM dnodes
  UNION
  SELECT e.src, r.d + 1 FROM reach r JOIN dedges e ON e.dst = r.node
  WHERE r.d < 64
)
SELECT '{_CODEN}mod/m' || node AS node, max(d)::BIGINT AS depth
FROM reach GROUP BY node
"""


def q_kg_dag_paths(sf_dir: str):
    """Distinct root-to-module path counts (provenance fan-in) over the
    acyclic import corpus — monotone sum fixpoint, rounds = graph
    depth, raises on cycles (stages/graph.dag_path_counts;
    size-adaptive driver loop / join rounds, parity-tested)."""
    import ray.data

    from nospa_rdf_data_cube_validator_ray.fixtures import tpch_dag_corpus
    from nospa_rdf_data_cube_validator_ray.sources.code_extract import (
        extract_code_corpus,
    )
    from nospa_rdf_data_cube_validator_ray.stages.graph import dag_path_counts

    imp = (f"{_CODE}imports", f"{_CODE}importsFrom")
    edges = extract_code_corpus(
        ray.data.from_arrow(tpch_dag_corpus(sf_dir))
    ).map_batches(
        lambda df: df[df["pred"].isin(imp)].reset_index(drop=True),
        batch_format="pandas",
    )
    return dag_path_counts(edges)


_SQL_DAG_PATHS = f"""
WITH RECURSIVE p AS (SELECT p_partkey AS k FROM part WHERE p_partkey >= 2),
dedges AS (
  -- explicit DISTINCT: inside a WITH RECURSIVE block DuckDB 1.0 leaves
  -- duplicate rows in a sibling CTE's plain UNION (observed: one dup
  -- pair), which max-based oracles tolerate but path COUNTS must not
  SELECT DISTINCT src, dst FROM (
    SELECT k AS src, k // 2 AS dst FROM p
    UNION ALL
    SELECT k, k // 3 FROM p)
),
dnodes AS (
  SELECT DISTINCT n FROM (
    SELECT src AS n FROM dedges UNION ALL SELECT dst FROM dedges)
),
roots AS (
  SELECT n FROM dnodes WHERE n NOT IN (SELECT dst FROM dedges)
),
walk(node) AS (
  SELECT n FROM roots
  UNION ALL
  SELECT e.dst FROM walk w JOIN dedges e ON e.src = w.node
)
SELECT '{_CODEN}mod/m' || node AS node, count(*)::BIGINT AS n_paths
FROM walk GROUP BY node
"""


def q_kg_node_features(sf_dir: str):
    """GNN feature assembly: ONE node-feature table (node, out_deg,
    in_deg, n_2hop, pr) composed from three analytics results by hash
    joins on the node id — the feature-store join shape; nodes outside
    the 2-hop census (self-loop-only reach) get 0.  All four features
    are the already-oracled operators, so the composed oracle is their
    SQL bodies joined identically."""
    import pandas as pd

    from nospa_rdf_data_cube_validator_ray.stages.graph import (
        degree_table,
        pagerank_int,
        two_hop_sizes,
    )
    from nospa_rdf_data_cube_validator_ray.util import heal_schema

    np_ = 8
    edges = _code_import_edges(sf_dir)
    deg = degree_table(edges)
    hop = two_hop_sizes(edges)
    pr = pagerank_int(edges)

    out = heal_schema(deg, np_).join(
        heal_schema(hop, np_), "left_outer", np_, on=("node",)
    )
    out = heal_schema(out, np_).join(
        heal_schema(pr, np_), "inner", np_, on=("node",)
    )

    def finish(df: pd.DataFrame) -> pd.DataFrame:
        return pd.DataFrame(
            {
                "node": df["node"].astype("string"),
                "out_deg": df["out_deg"].astype("int64"),
                "in_deg": df["in_deg"].astype("int64"),
                "n_2hop": df["n_2hop"].fillna(0).astype("int64"),
                "pr": df["pr"].astype("int64"),
            }
        )

    return out.map_batches(finish, batch_format="pandas")


def q_kg_link_negatives(sf_dir: str):
    """Deterministic negative sampling for KG link prediction: every
    import edge (m_a → m_b) proposes the candidate m_{(7a+3b+11) mod 97},
    and candidates that are REAL edges are removed by a distributed
    ANTI-join (left_outer hash join + null filter — no broadcast edge
    set).  Rows (src, neg_dst), distinct.  The hash-based proposal is
    reproducible across retries/cluster sizes, unlike RNG negatives."""
    import pandas as pd

    from nospa_rdf_data_cube_validator_ray.functions.kernel import distinct
    from nospa_rdf_data_cube_validator_ray.util import heal_schema

    np_ = 8
    edges = _code_import_edges(sf_dir)

    def cand(df: pd.DataFrame) -> pd.DataFrame:
        a = df["subj"].str.extract(r"m(\d+)$", expand=False).astype("int64")
        b = df["obj"].str.extract(r"m(\d+)$", expand=False).astype("int64")
        neg = (7 * a + 3 * b + 11) % 97
        return pd.DataFrame(
            {
                "src": df["subj"].astype("string"),
                "dst": (_CODEN + "mod/m" + neg.astype(str)).astype("string"),
            }
        ).drop_duplicates(ignore_index=True)

    cands = distinct(
        edges.map_batches(cand, batch_format="pandas"), ["src", "dst"]
    )

    def real(df: pd.DataFrame) -> pd.DataFrame:
        return pd.DataFrame(
            {
                "src": df["subj"].astype("string"),
                "dst": df["obj"].astype("string"),
                "_real": pd.Series(1, index=df.index, dtype="int64"),
            }
        ).drop_duplicates(["src", "dst"], ignore_index=True)

    real_edges = distinct(
        edges.map_batches(real, batch_format="pandas"), ["src", "dst", "_real"]
    )
    joined = heal_schema(cands, np_).join(
        heal_schema(real_edges, np_), "left_outer", np_, on=("src", "dst")
    )

    def keep_negative(df: pd.DataFrame) -> pd.DataFrame:
        m = df["_real"].isna() if "_real" in df.columns else pd.Series(
            True, index=df.index
        )
        out = df[m]
        return pd.DataFrame(
            {
                "src": out["src"].astype("string"),
                "neg_dst": out["dst"].astype("string"),
            }
        ).reset_index(drop=True)

    return joined.map_batches(keep_negative, batch_format="pandas")


_SQL_NODE_FEATURES = f"""
SELECT d.node, d.out_deg, d.in_deg,
       coalesce(h.n_2hop, 0)::BIGINT AS n_2hop, p.pr
FROM ({_SQL_CODE_DEGREE}) d
LEFT JOIN ({_SQL_CODE_2HOP}) h ON h.node = d.node
JOIN ({_SQL_CODE_PAGERANK}) p ON p.node = d.node
"""


_SQL_LINK_NEGATIVES = f"""
WITH {_CODE_EDGE_BODY},
ik AS (
  SELECT DISTINCT
         CAST(regexp_extract(src, 'm(\\d+)$', 1) AS BIGINT) AS a,
         CAST(regexp_extract(dst, 'm(\\d+)$', 1) AS BIGINT) AS b,
         src
  FROM cedges
),
cand AS (
  SELECT DISTINCT src,
         '{_CODEN}mod/m' || ((7 * a + 3 * b + 11) % 97) AS dst
  FROM ik
)
SELECT c.src, c.dst AS neg_dst
FROM cand c
WHERE NOT EXISTS (
  SELECT 1 FROM cedges e WHERE e.src = c.src AND e.dst = c.dst
)
"""


# ---------------------------------------------------------------------------
# ontology construction: RDFS inference + entity linking (stages/ontology,
# stages/linking)
# ---------------------------------------------------------------------------


def q_kg_type_inference(sf_dir: str):
    """RDFS domain/range inference (rdfs2/rdfs3) reconciled against a
    PARTIALLY-typed corpus: type assertions for nodes with
    md5(node) % 3 == 0 are withheld (simulating an under-typed KG), and
    kg:inNation deliberately declares range kg:Country — a class the
    data asserts as kg:Nation — so the conflict counter is exercised.
    Output: one row per inferred class (cls, n_inferred, n_new,
    n_conflict); the declaration dict is ontology-scale and rides in the
    batch closure, the only shuffle is ONE coarse node-bucket exchange
    (stages/ontology.infer_types)."""
    import pandas as pd

    from nospa_rdf_data_cube_validator_ray.stages.dedup import _md5_u64_cached
    from nospa_rdf_data_cube_validator_ray.stages.graph import (
        extract_edges,
        type_table,
    )
    from nospa_rdf_data_cube_validator_ray.stages.ontology import infer_types

    triples = _link_triples(sf_dir)

    def withhold(df: pd.DataFrame) -> pd.DataFrame:
        keep = df["subj"].map(lambda s: _md5_u64_cached(s) % 3 != 0)
        return df[keep.to_numpy()].reset_index(drop=True)

    decls = {
        f"{_KGP}placedBy": (f"{_KGP}Order", f"{_KGP}Customer"),
        f"{_KGP}follows": (f"{_KGP}Order", f"{_KGP}Order"),
        f"{_KGP}inNation": (f"{_KGP}Customer", f"{_KGP}Country"),
        f"{_KGP}inRegion": (f"{_KGP}Nation", f"{_KGP}Region"),
    }
    return infer_types(
        extract_edges(triples),
        type_table(triples).map_batches(withhold, batch_format="pandas"),
        decls,
    )


# composed with _KG_EDGE_BODY (defined further down) after its binding
_SQL_TYPE_INFERENCE_BODY = f"""
ktypes AS (
  SELECT subj, cls FROM (
    SELECT '{_KGN}ord/' || o_orderkey AS subj, '{_KGP}Order' AS cls FROM orders
    UNION ALL
    SELECT '{_KGN}cust/' || c_custkey, '{_KGP}Customer' FROM customer
    UNION ALL
    SELECT '{_KGN}nat/' || n_nationkey, '{_KGP}Nation' FROM nation
    UNION ALL
    SELECT '{_KGN}reg/' || r_regionkey, '{_KGP}Region' FROM region
  ) WHERE md5_number_lower(subj) % 3 != 0
),
decls(pred, dom, rng) AS (VALUES
  ('{_KGP}placedBy', '{_KGP}Order', '{_KGP}Customer'),
  ('{_KGP}follows', '{_KGP}Order', '{_KGP}Order'),
  ('{_KGP}inNation', '{_KGP}Customer', '{_KGP}Country'),
  ('{_KGP}inRegion', '{_KGP}Nation', '{_KGP}Region')
),
inf AS (
  SELECT DISTINCT node, cls FROM (
    SELECT e.subj AS node, d.dom AS cls
    FROM edges e JOIN decls d ON e.pred = d.pred
    UNION ALL
    SELECT e.obj, d.rng FROM edges e JOIN decls d ON e.pred = d.pred
  )
),
ast AS (SELECT DISTINCT subj AS node, cls FROM ktypes),
astn AS (SELECT DISTINCT node FROM ast)
SELECT inf.cls AS cls,
       count(*)::BIGINT AS n_inferred,
       sum(CASE WHEN astn.node IS NULL THEN 1 ELSE 0 END)::BIGINT AS n_new,
       sum(CASE WHEN astn.node IS NOT NULL AND m.node IS NULL
                THEN 1 ELSE 0 END)::BIGINT AS n_conflict
FROM inf
LEFT JOIN astn ON astn.node = inf.node
LEFT JOIN ast m ON m.node = inf.node AND m.cls = inf.cls
GROUP BY inf.cls
ORDER BY cls
"""


def q_kg_subclass_closure(sf_dir: str):
    """Ontology ancestor closure: the acyclic import corpus read as a
    subClassOf hierarchy (m_k ⊑ m_{k//2}, m_k ⊑ m_{k//3}), transitively
    closed (rdfs5/rdfs11 entailment) and summarized per class as
    (node, n_ancestors, anc_min, anc_xor) — the xor is the 61-bit md5
    fold that makes the closure SET value-exact in SQL.  Size-adaptive
    semi-naive iteration, rounds = hierarchy depth
    (stages/ontology.ancestor_closure; distributed regime
    parity-tested)."""
    import ray.data

    from nospa_rdf_data_cube_validator_ray.fixtures import tpch_dag_corpus
    from nospa_rdf_data_cube_validator_ray.sources.code_extract import (
        extract_code_corpus,
    )
    from nospa_rdf_data_cube_validator_ray.stages.ontology import (
        ancestor_closure,
    )

    imp = (f"{_CODE}imports", f"{_CODE}importsFrom")
    edges = extract_code_corpus(
        ray.data.from_arrow(tpch_dag_corpus(sf_dir))
    ).map_batches(
        lambda df: df[df["pred"].isin(imp)].reset_index(drop=True),
        batch_format="pandas",
    )
    return ancestor_closure(edges)


_SQL_SUBCLASS_CLOSURE = f"""
WITH RECURSIVE p AS (SELECT p_partkey AS k FROM part WHERE p_partkey >= 2),
sedges AS (
  SELECT '{_CODEN}mod/m' || k AS node, '{_CODEN}mod/m' || (k // 2) AS a FROM p
  UNION
  SELECT '{_CODEN}mod/m' || k, '{_CODEN}mod/m' || (k // 3) FROM p
),
cl(node, a) AS (
  SELECT node, a FROM sedges
  UNION
  SELECT c.node, e.a FROM cl c JOIN sedges e ON e.node = c.a
)
SELECT node,
       count(*)::BIGINT AS n_ancestors,
       min(a) AS anc_min,
       coalesce(bit_xor((md5_number_lower(a) % {1 << 61})::UBIGINT),
                0)::BIGINT AS anc_xor
FROM cl GROUP BY node
"""


def q_kg_entity_mentions(sf_dir: str):
    """Gazetteer mention linking: the label dictionary (distinct corpus
    tokens with md5 % 5 == 0 — a deterministic stand-in for an external
    entity list) is built by one bucketed distinct, broadcast once via
    ray.put, and matched MAP-ONLY per document — no corpus-scale
    shuffle (stages/linking.entity_mentions)."""
    from nospa_rdf_data_cube_validator_ray.stages.linking import (
        build_gazetteer,
        entity_mentions,
    )

    docs = _docs(sf_dir)
    return entity_mentions(docs, build_gazetteer(docs))


_SQL_ENTITY_MENTIONS = r"""
WITH toks AS (
  SELECT doc_id, unnest(regexp_extract_all(coalesce(text, ''), '\S+')) AS t
  FROM documents
),
labels AS (SELECT DISTINCT t FROM toks WHERE md5_number_lower(t) % 5 = 0)
SELECT doc_id, t AS entity, count(*)::BIGINT AS n_mentions
FROM toks JOIN labels USING (t)
GROUP BY doc_id, t
"""


def q_kg_entity_cooccur(sf_dir: str):
    """Relation-candidate edges: unordered entity pairs co-mentioned in
    one document, counted corpus-wide, kept at n >= 2.  Per-document
    pair fan-out is cap-guarded (RAISES on pathological density rather
    than silently truncating); the collapse is ONE coarse bucketed count
    at pair-vocabulary scale (stages/linking.entity_cooccur)."""
    from nospa_rdf_data_cube_validator_ray.stages.linking import (
        build_gazetteer,
        entity_cooccur,
        entity_mentions,
    )

    docs = _docs(sf_dir)
    return entity_cooccur(
        entity_mentions(docs, build_gazetteer(docs)), min_count=2
    )


_SQL_ENTITY_COOCCUR = r"""
WITH toks AS (
  SELECT doc_id, unnest(regexp_extract_all(coalesce(text, ''), '\S+')) AS t
  FROM documents
),
labels AS (SELECT DISTINCT t FROM toks WHERE md5_number_lower(t) % 5 = 0),
de AS (SELECT DISTINCT doc_id, t FROM toks JOIN labels USING (t))
SELECT a.t AS ent_a, b.t AS ent_b, count(*)::BIGINT AS n
FROM de a JOIN de b ON a.doc_id = b.doc_id AND a.t < b.t
GROUP BY a.t, b.t
HAVING count(*) >= 2
"""


def q_kg_ra_scores(sf_dir: str):
    """Resource-allocation link prediction over the link graph —
    link_scores with mid_weight="inv_deg": score = Σ over common
    neighbors m of (10^6 // deg(m)), integer floor arithmetic so the
    damping is bit-exact on both sides (float 1/deg sums are
    order-dependent under IEEE addition)."""
    from nospa_rdf_data_cube_validator_ray.stages.graph import (
        extract_edges,
        link_scores,
    )

    return link_scores(
        extract_edges(_link_triples(sf_dir)), mid_weight="inv_deg"
    )


def q_kg_aa_scores(sf_dir: str):
    """Adamic-Adar-style link prediction over the link graph —
    link_scores with mid_weight="inv_log2": score = Σ over common
    neighbors m of (10^6 // max(1, ⌊log2 deg(m)⌋)); the frexp-exponent
    integer log keeps the damping bit-exact on both sides (float ln is
    not reproducible across engines)."""
    from nospa_rdf_data_cube_validator_ray.stages.graph import (
        extract_edges,
        link_scores,
    )

    return link_scores(
        extract_edges(_link_triples(sf_dir)), mid_weight="inv_log2"
    )


def q_kg_jaccard_scores(sf_dir: str):
    """Neighbor-set Jaccard link prediction over the link graph —
    link_scores(jaccard=True): score = (common × 10^6) //
    (deg(u) + deg(w) − common) in integer ppm, two degree hash joins
    after the hub-capped wedge aggregation (floor division keeps engine
    and SQL bit-identical)."""
    from nospa_rdf_data_cube_validator_ray.stages.graph import (
        extract_edges,
        link_scores,
    )

    return link_scores(extract_edges(_link_triples(sf_dir)), jaccard=True)


def q_kg_four_cycles(sf_dir: str):
    """Per-node 4-cycle participation counts over the undirected import
    graph — stages/graph.four_cycle_counts: pair-common-neighbor C(c,2)
    combinatorics through hub-capped wedges (every 4-cycle has two
    diagonals and each node sits on exactly one, so the two-sided pair
    explode counts each cycle through a node exactly once)."""
    from nospa_rdf_data_cube_validator_ray.stages.graph import (
        four_cycle_counts,
    )

    ds = four_cycle_counts(_code_import_edges(sf_dir)).materialize()
    if ds.count() == 0:
        # a square-free corpus is legal at some scales; empty Datasets
        # are schema-less (column-less to_pandas) → typed frame
        return pd.DataFrame(
            {
                "node": pd.Series(dtype="string"),
                "n_c4": pd.Series(dtype="int64"),
            }
        )
    return ds


def q_kg_communities(sf_dir: str):
    """Deterministic synchronous label propagation (3 rounds, neighbour
    mode with lexicographic-min tie-break) over the undirected import
    graph — stages/graph.lp_communities, size-adaptive driver/bucketed
    regimes, parity-tested.  Float-free, so the fixed-round unroll has
    an exact SQL twin."""
    from nospa_rdf_data_cube_validator_ray.stages.graph import lp_communities

    return lp_communities(_code_import_edges(sf_dir), rounds=_LP_ROUNDS)


_LP_ROUNDS = 3


def _lp_sql(rounds: int) -> str:
    """``rounds`` chained label-propagation CTEs mirroring
    stages/graph.lp_communities exactly (MATERIALIZED — plain chained
    CTEs inline exponentially in DuckDB)."""
    parts = [
        "und AS (SELECT DISTINCT least(src, dst) AS x,"
        " greatest(src, dst) AS y FROM cedges WHERE src <> dst)",
        "adj AS MATERIALIZED (SELECT x AS src, y AS dst FROM und"
        " UNION ALL SELECT y, x FROM und)",
        "l0 AS MATERIALIZED (SELECT DISTINCT src AS node, src AS label"
        " FROM adj)",
    ]
    for i in range(rounds):
        parts.append(
            f"c{i + 1} AS MATERIALIZED (SELECT a.dst AS node, l.label,"
            f" count(*) AS c FROM adj a JOIN l{i} l ON l.node = a.src"
            f" GROUP BY a.dst, l.label)"
        )
        parts.append(
            f"l{i + 1} AS MATERIALIZED (SELECT node, label FROM ("
            f"SELECT node, label, row_number() OVER ("
            f"PARTITION BY node ORDER BY c DESC, label) AS rn FROM c{i + 1}"
            f") WHERE rn = 1)"
        )
    body = ",\n".join(parts)
    return f"""
WITH {{_CODE_EDGE_BODY}},
{body}
SELECT node, label FROM l{rounds}
""".replace("{_CODE_EDGE_BODY}", _CODE_EDGE_BODY)


_SQL_KG_COMMUNITIES = _lp_sql(_LP_ROUNDS)


def q_kg_entity_lift(sf_dir: str):
    """Association-scored relation candidates: lift(a, b) =
    N·c(a,b) / (c(a)·c(b)) over the co-occurrence edges (lift =
    exp(PMI); the ratio form is IEEE-exact on both sides — ONE
    int64→float64 division, no ln).  Per-entity document frequencies
    are dictionary-scale and broadcast once; scoring is map-only
    (stages/linking.entity_lift)."""
    from nospa_rdf_data_cube_validator_ray.stages.linking import (
        build_gazetteer,
        entity_lift,
        entity_mentions,
    )

    docs = _docs(sf_dir)
    return entity_lift(
        entity_mentions(docs, build_gazetteer(docs)), min_count=2
    )


_SQL_ENTITY_LIFT = r"""
WITH toks AS (
  SELECT doc_id, unnest(regexp_extract_all(coalesce(text, ''), '\S+')) AS t
  FROM documents
),
labels AS (SELECT DISTINCT t FROM toks WHERE md5_number_lower(t) % 5 = 0),
de AS (SELECT DISTINCT doc_id, t FROM toks JOIN labels USING (t)),
nd AS (SELECT count(DISTINCT doc_id) AS total FROM de),
ec AS (SELECT t, count(*) AS c FROM de GROUP BY t),
pairs AS (
  SELECT a.t AS ent_a, b.t AS ent_b, count(*) AS n
  FROM de a JOIN de b ON a.doc_id = b.doc_id AND a.t < b.t
  GROUP BY a.t, b.t
  HAVING count(*) >= 2
)
SELECT ent_a, ent_b, n::BIGINT AS n,
       ((SELECT total FROM nd) * n)::DOUBLE / (ca.c * cb.c)::DOUBLE AS lift
FROM pairs
JOIN ec ca ON ca.t = ent_a
JOIN ec cb ON cb.t = ent_b
"""


def q_kg_kcore(sf_dir: str):
    """k-core (k=2) of the undirected import graph — bounded iterative
    peel (stages/graph.kcore: size-adaptive driver bincount loop /
    per-round bucketed degree + two hash semi-joins; RAISES rather than
    early-stopping if the graph out-peels the bound, because the SQL
    twin unrolls exactly that many rounds).  Rows: (node, deg-in-core)."""
    from nospa_rdf_data_cube_validator_ray.stages.graph import kcore

    return kcore(_code_import_edges(sf_dir), k=2, max_rounds=_KCORE_ROUNDS)


_KCORE_ROUNDS = 16


def _kcore_sql(k: int, rounds: int) -> str:
    """``rounds`` chained peel CTEs mirroring stages/graph.kcore: each
    round recomputes undirected degrees and keeps edges whose BOTH
    endpoints have degree >= k.  After convergence the remaining rounds
    are no-ops, so the unrolled form equals the fixpoint whenever the
    engine (which verifies convergence and raises otherwise) returns."""
    parts = [
        f"und AS (SELECT DISTINCT least(src, dst) AS x,"
        f" greatest(src, dst) AS y FROM cedges WHERE src <> dst)",
        "e0 AS MATERIALIZED (SELECT x, y FROM und)",
    ]
    for i in range(rounds):
        parts.append(
            f"d{i} AS MATERIALIZED (SELECT node, count(*) AS deg FROM "
            f"(SELECT x AS node FROM e{i} UNION ALL SELECT y FROM e{i}) "
            f"GROUP BY node)"
        )
        parts.append(
            f"e{i + 1} AS MATERIALIZED (SELECT x, y FROM e{i} "
            f"WHERE x IN (SELECT node FROM d{i} WHERE deg >= {k}) "
            f"AND y IN (SELECT node FROM d{i} WHERE deg >= {k}))"
        )
    body = ",\n".join(parts)
    return f"""
WITH {_CODE_EDGE_BODY},
{body}
SELECT node, count(*)::BIGINT AS deg
FROM (SELECT x AS node FROM e{rounds} UNION ALL SELECT y FROM e{rounds})
GROUP BY node
"""


_SQL_KG_KCORE = _kcore_sql(2, _KCORE_ROUNDS)


_KTRUSS_ROUNDS = 8


def q_kg_ktruss(sf_dir: str):
    """k-truss (k=3) of the undirected import graph — every surviving
    edge sits in >= k-2 triangles INSIDE the truss (stages/graph.ktruss:
    size-adaptive bounded peel; driver regime = degree-oriented wedge
    merges, distributed regime = per-round triangle_enum + bucketed
    support count + hash semi-join; RAISES past the round bound because
    the SQL twin unrolls exactly that many peels).  One notch stronger
    than kg_kcore as a KG cohesion filter.  Rows: (x, y, support)."""
    from nospa_rdf_data_cube_validator_ray.stages.graph import ktruss

    return ktruss(_code_import_edges(sf_dir), k=3, max_rounds=_KTRUSS_ROUNDS)


def _ktruss_sql(k: int, rounds: int) -> str:
    """``rounds`` chained peel CTEs mirroring stages/graph.ktruss: each
    round enumerates triangles over the surviving edge set (a < b < c id
    order — enumeration order differs from the engine's degree
    orientation, but per-edge support counts are identical), counts each
    triangle into its three canonical edges, and keeps edges with
    support >= k-2.  Post-convergence rounds are no-ops, so the
    unrolled form equals the fixpoint whenever the engine (which
    verifies convergence and raises otherwise) returns.  MATERIALIZED
    everywhere: plain chained CTEs inline exponentially in DuckDB."""
    parts = [
        "und AS (SELECT DISTINCT least(src, dst) AS x,"
        " greatest(src, dst) AS y FROM cedges WHERE src <> dst)",
        "e0 AS MATERIALIZED (SELECT x, y FROM und)",
    ]
    for i in range(rounds + 1):
        parts.append(
            f"t{i} AS MATERIALIZED (SELECT e1.x AS a, e1.y AS b, e2.y AS c "
            f"FROM e{i} e1 JOIN e{i} e2 ON e2.x = e1.x AND e2.y > e1.y "
            f"JOIN e{i} e3 ON e3.x = e1.y AND e3.y = e2.y)"
        )
        parts.append(
            f"s{i} AS MATERIALIZED (SELECT x, y, count(*)::BIGINT AS sup "
            f"FROM (SELECT a AS x, b AS y FROM t{i} "
            f"UNION ALL SELECT a, c FROM t{i} "
            f"UNION ALL SELECT b, c FROM t{i}) GROUP BY 1, 2)"
        )
        if i < rounds:
            parts.append(
                f"e{i + 1} AS MATERIALIZED (SELECT e.x, e.y FROM e{i} e "
                f"LEFT JOIN s{i} s ON s.x = e.x AND s.y = e.y "
                f"WHERE coalesce(s.sup, 0) >= {k - 2})"
            )
    body = ",\n".join(parts)
    return f"""
WITH {_CODE_EDGE_BODY},
{body}
SELECT e.x, e.y, coalesce(s.sup, 0)::BIGINT AS support
FROM e{rounds} e LEFT JOIN s{rounds} s ON s.x = e.x AND s.y = e.y
"""


_SQL_KG_KTRUSS = _ktruss_sql(3, _KTRUSS_ROUNDS)


def q_kg_triple_ids(sf_dir: str):
    """KG-embedding input encoding: the link KG dictionary-encoded to
    dense 0-based integer (h, r, t) triples — entity ids are the global
    lexicographic rank of the node IRI (ONE distributed sort via
    packing.global_rank, no driver vocabulary), applied back with two
    hash joins; the relation vocabulary is predicate-scale and
    broadcasts as a dict (stages/graph.triple_ids)."""
    from nospa_rdf_data_cube_validator_ray.stages.graph import (
        extract_edges,
        triple_ids,
    )

    return triple_ids(extract_edges(_link_triples(sf_dir)))


def q_kg_shape_check(sf_dir: str):
    """SHACL-style cardinality validation over the link KG: Orders must
    have exactly one kg:placedBy (chain orders carry kg:follows instead
    — deliberate violations with n_found = 0), Customers exactly one
    kg:inNation (satisfied — exercises the no-violation path), Nations
    exactly TWO kg:inRegion (deliberately strict: every nation violates
    with n_found = 1).  One row per violation; out-edge counts are
    map-side partials meeting the type assertions in ONE coarse
    node-bucket exchange (stages/ontology.shape_check)."""
    from nospa_rdf_data_cube_validator_ray.stages.graph import (
        extract_edges,
        type_table,
    )
    from nospa_rdf_data_cube_validator_ray.stages.ontology import shape_check

    shapes = {
        f"{_KGP}Order": {f"{_KGP}placedBy": (1, 1)},
        f"{_KGP}Customer": {f"{_KGP}inNation": (1, 1)},
        f"{_KGP}Nation": {f"{_KGP}inRegion": (2, 2)},
    }
    triples = _link_triples(sf_dir)
    return shape_check(extract_edges(triples), type_table(triples), shapes)


def q_kg_pred_profile(sf_dir: str):
    """Per-predicate planner statistics over the code KG — triple count
    plus a KMV sketch of the distinct-subject cardinality (kth-min
    61-bit md5 + integer estimate, the same bit-exact sketch as
    distinct_sketch_kmv): the pay-as-you-go schema/statistics pass a
    query planner runs over a freshly constructed KG.  Map-side
    partials (counts + per-pred k-smallest subject hashes), ONE
    bucketed merge."""
    import pandas as pd

    from nospa_rdf_data_cube_validator_ray.stages.dedup import (
        _md5_u64_cached,
        kmv_sketch,
    )
    from nospa_rdf_data_cube_validator_ray.util import bucket_agg

    k = 64
    mask = (1 << 61) - 1
    triples = _code_triples(sf_dir)

    def partial(df: pd.DataFrame) -> pd.DataFrame:
        rows_p, rows_h, rows_n = [], [], []
        for pred, g in df.groupby("pred", sort=False):
            hs = sorted(
                {_md5_u64_cached(s) & mask for s in g["subj"].unique()}
            )[:k]
            rows_p.extend([pred] * len(hs))
            rows_h.extend(hs)
            rows_n.extend([0] * len(hs))
            rows_p.append(pred)
            rows_h.append(-1)  # count-carrier row
            rows_n.append(len(g))
        return pd.DataFrame(
            {
                "pred": pd.Series(rows_p, dtype="string"),
                "h": pd.Series(rows_h, dtype="int64"),
                "n": pd.Series(rows_n, dtype="int64"),
            }
        )

    def merge(df: pd.DataFrame) -> pd.DataFrame:
        out = []
        for pred, g in df.groupby("pred", sort=False):
            n = int(g["n"].sum())
            kth, est = kmv_sketch(g.loc[g["h"] >= 0, "h"].tolist(), k)
            out.append((pred, n, kth, est))
        return pd.DataFrame(
            out, columns=["pred", "n_triples", "kth_min_subj", "est_subjects"]
        ).astype(
            {"pred": "string", "n_triples": "int64",
             "kth_min_subj": "int64", "est_subjects": "int64"}
        )

    return bucket_agg(
        triples.map_batches(partial, batch_format="pandas"), ["pred"], merge
    )


# subjects per pred are module IRIs (pure functions of part keys) — the
# oracle rebuilds them, hashes with md5_number_lower % 2^61, and applies
# the identical KMV rule; counts follow the import-edge arithmetic
_SQL_PRED_PROFILE = f"""
WITH p AS (SELECT p_partkey AS k FROM part),
subj AS (
  SELECT '{_CODE}imports' AS pred, '{_CODEN}mod/m' || k AS s FROM p
  UNION ALL
  SELECT '{_CODE}importsFrom', '{_CODEN}mod/m' || k FROM p WHERE k % 3 = 1
  UNION ALL
  SELECT '{_CODE}definesFunction', '{_CODEN}mod/m' || k FROM p
  UNION ALL
  SELECT '{_CODE}definesClass', '{_CODEN}mod/m' || k FROM p
),
counts AS (
  SELECT '{_CODE}imports' AS pred,
         (count(*) + count(*) FILTER (WHERE k % 3 = 0)
            + 2 * count(*) FILTER (WHERE k % 3 = 2))::BIGINT AS n_triples
  FROM p
  UNION ALL
  SELECT '{_CODE}importsFrom',
         count(*) FILTER (WHERE k % 3 = 1)::BIGINT FROM p
  UNION ALL SELECT '{_CODE}definesFunction', count(*)::BIGINT FROM p
  UNION ALL SELECT '{_CODE}definesClass', count(*)::BIGINT FROM p
),
hashed AS (
  SELECT DISTINCT pred,
         (md5_number_lower(s) % (1::HUGEINT << 61))::BIGINT AS h
  FROM subj
),
r AS (
  SELECT pred, h,
         row_number() OVER (PARTITION BY pred ORDER BY h) AS rn,
         count(*) OVER (PARTITION BY pred) AS n
  FROM hashed
)
SELECT c.pred, c.n_triples,
       r.h::BIGINT AS kth_min_subj,
       CASE WHEN r.n >= 64 THEN (63 * (1::HUGEINT << 61) // r.h)::BIGINT
            ELSE r.n::BIGINT END AS est_subjects
FROM counts c JOIN r ON r.pred = c.pred AND r.rn = least(r.n, 64)
"""


def q_kg_repo_profile(sf_dir: str):
    """Per-repo KG rollup over the base+fork corpus: file count, import
    edge count, and DISTINCT import-target count — map-side partials +
    bucketed distinct + tiny per-repo sum (kernel.distinct /
    util.bucket_sum; nothing repo×target-scale reaches Ray's
    Aggregate)."""
    import ray.data

    from nospa_rdf_data_cube_validator_ray.fixtures import tpch_fork_corpus
    from nospa_rdf_data_cube_validator_ray.functions.kernel import distinct
    from nospa_rdf_data_cube_validator_ray.model import GRAPH_SEP
    from nospa_rdf_data_cube_validator_ray.sources.code_extract import (
        extract_code_corpus,
    )
    from nospa_rdf_data_cube_validator_ray.util import bucket_sum

    corpus = ray.data.from_arrow(tpch_fork_corpus(sf_dir))
    triples = extract_code_corpus(corpus).materialize()
    imp = (f"{_CODE}imports", f"{_CODE}importsFrom")

    def file_partial(df: pd.DataFrame) -> pd.DataFrame:
        g = df.groupby("repo", as_index=False).size()
        return pd.DataFrame(
            {"repo": g["repo"].astype("string"),
             "n_files": g["size"].astype("int64")}
        )

    n_files = bucket_sum(
        corpus.map_batches(file_partial, batch_format="pandas"),
        ["repo"],
        ["n_files"],
    ).to_pandas()

    def edge_partial(df: pd.DataFrame) -> pd.DataFrame:
        d = df[df["pred"].isin(imp)]
        repo = d["graph"].str.split(GRAPH_SEP, n=1).str[0]
        g = repo.value_counts()
        return pd.DataFrame(
            {"repo": pd.Series(g.index, dtype="string"),
             "n_import_edges": g.to_numpy().astype("int64")}
        )

    n_edges = bucket_sum(
        triples.map_batches(edge_partial, batch_format="pandas"),
        ["repo"],
        ["n_import_edges"],
    ).to_pandas()

    def target_pairs(df: pd.DataFrame) -> pd.DataFrame:
        d = df[df["pred"].isin(imp)]
        return pd.DataFrame(
            {
                "repo": d["graph"]
                .str.split(GRAPH_SEP, n=1)
                .str[0]
                .astype("string"),
                "target": d["obj"].astype("string"),
            }
        ).drop_duplicates(ignore_index=True)

    def tgt_partial(df: pd.DataFrame) -> pd.DataFrame:
        g = df.groupby("repo", as_index=False).size()
        return pd.DataFrame(
            {"repo": g["repo"].astype("string"),
             "n_distinct_targets": g["size"].astype("int64")}
        )

    n_targets = bucket_sum(
        distinct(
            triples.map_batches(target_pairs, batch_format="pandas"),
            ["repo", "target"],
        ).map_batches(tgt_partial, batch_format="pandas"),
        ["repo"],
        ["n_distinct_targets"],
    ).to_pandas()

    out = n_files.merge(n_edges, on="repo").merge(n_targets, on="repo")
    for c in ("n_files", "n_import_edges", "n_distinct_targets"):
        out[c] = out[c].astype("int64")
    return out.sort_values("repo", ignore_index=True)


# both repos carry identical import structure (the fork patch is a
# trailing comment line): per-repo counts derive from part arithmetic
_SQL_REPO_PROFILE = f"""
WITH p AS (SELECT p_partkey AS k FROM part),
counts AS (
  SELECT count(*)::BIGINT AS n_files,
         (count(*) + count(*) FILTER (WHERE k % 3 = 0)
            + count(*) FILTER (WHERE k % 3 = 1)
            + 2 * count(*) FILTER (WHERE k % 3 = 2))::BIGINT AS n_import_edges
  FROM p
),
targets AS (
  SELECT count(DISTINCT v)::BIGINT AS n_distinct_targets FROM (
    SELECT 'm' || (k % 97) AS v FROM p
    UNION ALL SELECT 'm' || ((7 * k + 1) % 101) FROM p WHERE k % 3 = 0
    UNION ALL SELECT 'm' || ((11 * k + 3) % 103) FROM p WHERE k % 3 = 1
    UNION ALL SELECT 'm' || ((5 * k + 2) % 107) FROM p WHERE k % 3 = 2
    UNION ALL SELECT 'm' || ((3 * k + 5) % 109) FROM p WHERE k % 3 = 2
  )
)
SELECT r.repo, c.n_files, c.n_import_edges, t.n_distinct_targets
FROM (SELECT 'synthetic/tpch-code' AS repo
      UNION ALL SELECT 'synthetic/tpch-code-fork') r,
     counts c, targets t
"""


def q_kg_code_metrics(sf_dir: str):
    """Per-module code metrics (lines, comment lines, branch statements,
    top-level defs/classes) — map-only vectorized str.count over the
    code corpus (sources/code_extract.code_metrics); the fixture's
    k-dependent body/comment padding gives every column a non-constant
    arithmetic oracle."""
    import ray.data

    from nospa_rdf_data_cube_validator_ray.fixtures import tpch_code_corpus
    from nospa_rdf_data_cube_validator_ray.sources.code_extract import (
        code_metrics,
    )

    return code_metrics(ray.data.from_arrow(tpch_code_corpus(sf_dir)))


# content layout of src/m{k}.py (fixtures.tpch_code_corpus): 9 fixed
# lines + k%5 'if' lines + a 'while' when 7|k + k%4 trailing comments;
# exactly one fixed line is comment-led ('# import m999 commented out')
_SQL_CODE_METRICS = f"""
WITH p AS (SELECT p_partkey AS k FROM part)
SELECT '{_CODEN}mod/m' || k AS module,
       (9 + (k % 5) + CASE WHEN k % 7 = 0 THEN 1 ELSE 0 END
          + (k % 4))::BIGINT AS n_lines,
       (1 + (k % 4))::BIGINT AS n_comment_lines,
       ((k % 5) + CASE WHEN k % 7 = 0 THEN 1 ELSE 0 END)::BIGINT
         AS n_branch_stmts,
       1::BIGINT AS n_defs,
       1::BIGINT AS n_classes
FROM p
"""


def q_kg_code_clones(sf_dir: str):
    """Cross-repo exact clone detection over the base+fork corpus:
    content-identity entity linking — files with byte-identical sha256
    grouped; members of groups ≥ 2 emitted with the group's min
    (repo, path) root (sources/code_extract.clone_groups; sha-bucketed
    single shuffle, content never leaves the map side)."""
    import ray.data

    from nospa_rdf_data_cube_validator_ray.fixtures import tpch_fork_corpus
    from nospa_rdf_data_cube_validator_ray.sources.code_extract import (
        clone_groups,
    )

    return clone_groups(ray.data.from_arrow(tpch_fork_corpus(sf_dir)))


# cube per-pred prediction UNION the code-pred arithmetic (preds are
# disjoint between the two branches; GROUP BY keeps that honest)
_SQL_MIXED_BY_PRED = f"""
SELECT pred, sum(n)::BIGINT AS n FROM (
  SELECT pred, n FROM ({_SQL_TRIPLES_BY_PRED})
  UNION ALL
  SELECT '{_CODE}imports' AS pred,
         (SELECT count(*) + count(*) FILTER (WHERE p_partkey % 3 = 0)
                 + 2 * count(*) FILTER (WHERE p_partkey % 3 = 2)
          FROM part) AS n
  UNION ALL
  SELECT '{_CODE}importsFrom',
         (SELECT count(*) FILTER (WHERE p_partkey % 3 = 1) FROM part)
  UNION ALL
  SELECT '{_CODE}definesFunction', (SELECT count(*) FROM part)
  UNION ALL
  SELECT '{_CODE}definesClass', (SELECT count(*) FROM part)
) GROUP BY pred
"""


# the fork's copy of src/m{k}.py is byte-identical iff k % 5 == 0; the
# min (repo, path) key uses a \x01 separator so string order == tuple
# order ('synthetic/tpch-code' + \x01 sorts below '...-fork' + anything)
_SQL_CODE_CLONES = """
WITH p AS (SELECT p_partkey AS k FROM part WHERE p_partkey % 5 = 0),
both_repos AS (
  SELECT 'synthetic/tpch-code' AS repo, k FROM p
  UNION ALL
  SELECT 'synthetic/tpch-code-fork', k FROM p
)
SELECT repo, 'src/m' || k || '.py' AS path,
       'synthetic/tpch-code' || chr(1) || 'src/m' || k || '.py' AS clone_root,
       2::BIGINT AS group_size
FROM both_repos
"""


def _cc_unrolled_sql(rounds: int = 40) -> str:
    """Fixed-round UNROLLED min-label propagation (MATERIALIZED CTEs) —
    the recursive enumeration form retains every (node, label) pair it
    ever generates, which explodes to disk-full on the sf0.1 import
    graph (one 20 K-node component); K synchronous rounds are exact
    once K ≥ graph diameter (sf0.1 converges by round 40, verified with
    an l_K == l_{{K-1}} fixpoint probe), and an under-K non-convergence
    shows up as a hash mismatch against the engine, never silently."""
    body = [
        """und AS MATERIALIZED (
  SELECT DISTINCT least(src, dst) AS x, greatest(src, dst) AS y
  FROM cedges WHERE src <> dst
),
adj AS MATERIALIZED (
  SELECT x AS node, y AS nbr FROM und UNION ALL SELECT y, x FROM und
),
l0 AS MATERIALIZED (SELECT DISTINCT node, node AS lbl FROM adj)"""
    ]
    for i in range(rounds):
        body.append(
            f"""l{i + 1} AS MATERIALIZED (
  SELECT n.node, least(n.lbl, coalesce(min(a_l.lbl), n.lbl)) AS lbl
  FROM l{i} n
  LEFT JOIN adj ON adj.node = n.node
  LEFT JOIN l{i} a_l ON a_l.node = adj.nbr
  GROUP BY n.node, n.lbl
)"""
        )
    return (
        f"WITH {_CODE_EDGE_BODY},\n"
        + ",\n".join(body)
        + f"\nSELECT node, lbl AS label FROM l{rounds}"
    )


_SQL_CODE_COMPONENTS = _cc_unrolled_sql()

_SQL_CODE_REACHABLE = f"""
WITH RECURSIVE {_CODE_EDGE_BODY},
reach(node, d) AS (
  SELECT '{_CODEN}mod/m1' AS node, 0 AS d
  UNION
  SELECT c.src AS node, r.d + 1 AS d
  FROM reach r JOIN cedges c ON c.dst = r.node
  WHERE r.d < 100
)
SELECT node, min(d)::BIGINT AS dist FROM reach GROUP BY node
"""

_SQL_CODE_DEFS = f"""
WITH p AS (SELECT p_partkey AS k FROM part)
SELECT '{_CODEN}mod/m' || k AS module, 'function' AS kind,
       'fn_' || k AS name FROM p
UNION ALL
SELECT '{_CODEN}mod/m' || k, 'class', 'C' || k FROM p
"""

_SQL_MODULE_SUMMARY = f"""
WITH {_CODE_EDGE_BODY},
o AS (SELECT src AS node, count(*) AS c FROM cedges GROUP BY src),
i AS (SELECT dst AS node, count(*) AS c FROM cedges GROUP BY dst),
d AS (SELECT '{_CODEN}mod/m' || k AS node, 1 AS n_defs, 1 AS n_classes FROM p),
nodes AS (
  SELECT node FROM o UNION SELECT node FROM i UNION SELECT node FROM d
)
SELECT n.node,
       coalesce(o.c, 0)::BIGINT AS out_imports,
       coalesce(d.n_defs, 0)::BIGINT AS n_defs,
       coalesce(d.n_classes, 0)::BIGINT AS n_classes,
       coalesce(i.c, 0)::BIGINT AS in_imports
FROM nodes n
LEFT JOIN o ON n.node = o.node
LEFT JOIN i ON n.node = i.node
LEFT JOIN d ON n.node = d.node
"""

# versioned corpus: content of src/m{k}.py at commit j is
# 'import m{(k+13j) % 97}'; latest j = 2 (k%4=0) / 1 (k%2=0) / 0 — the
# import always changes when j>0 (13j is never 0 mod 97 for j in 1..2)
_SQL_COMMIT_DIFF = """
WITH p AS (SELECT p_partkey AS k FROM part WHERE p_partkey % 2 = 0),
lastj AS (
  SELECT k, CASE WHEN k % 4 = 0 THEN 2 ELSE 1 END AS j FROM p
)
SELECT 'synthetic/tpch-versions' AS repo,
       'src/m' || k || '.py' AS path, '-' AS change,
       'http://example.org/code/mod/m' || (k % 97) AS module
FROM lastj
UNION ALL
SELECT 'synthetic/tpch-versions', 'src/m' || k || '.py', '+',
       'http://example.org/code/mod/m' || ((k + 13 * j) % 97)
FROM lastj
"""


# edge-table CTE body (no WITH keyword — BFS prefixes WITH RECURSIVE);
# lag() over (custkey, orderkey) rebuilds the order chains exactly as
# fixtures.tpch_link_corpus writes them
_KG_EDGE_BODY = f"""
ok AS (
  SELECT o_orderkey AS k, o_custkey AS c,
         lag(o_orderkey) OVER (
           PARTITION BY o_custkey ORDER BY o_orderkey
         ) AS pk
  FROM orders
),
edges AS (
  SELECT '{_KGN}ord/' || k AS subj, '{_KGP}placedBy' AS pred,
         '{_KGN}cust/' || c AS obj
  FROM ok WHERE pk IS NULL
  UNION ALL
  SELECT '{_KGN}ord/' || k, '{_KGP}follows', '{_KGN}ord/' || pk
  FROM ok WHERE pk IS NOT NULL
  UNION ALL
  SELECT '{_KGN}cust/' || c_custkey, '{_KGP}inNation',
         '{_KGN}nat/' || c_nationkey
  FROM customer
  UNION ALL
  SELECT '{_KGN}nat/' || n_nationkey, '{_KGP}inRegion',
         '{_KGN}reg/' || n_regionkey
  FROM nation
)
"""

_SQL_TYPE_INFERENCE = f"WITH {_KG_EDGE_BODY},{_SQL_TYPE_INFERENCE_BODY}"

_SQL_TRIPLE_IDS = f"""
WITH {_KG_EDGE_BODY},
tnodes AS (
  SELECT node, row_number() OVER (ORDER BY node) - 1 AS nid
  FROM (SELECT subj AS node FROM edges UNION SELECT obj FROM edges)
),
trels AS (
  SELECT pred, row_number() OVER (ORDER BY pred) - 1 AS rid
  FROM (SELECT DISTINCT pred FROM edges)
)
SELECT n1.nid::BIGINT AS h, r.rid::BIGINT AS r, n2.nid::BIGINT AS t
FROM edges e
JOIN tnodes n1 ON e.subj = n1.node
JOIN trels r ON e.pred = r.pred
JOIN tnodes n2 ON e.obj = n2.node
"""

_SQL_SHAPE_CHECK = f"""
WITH {_KG_EDGE_BODY},
ktypes AS (
  SELECT '{_KGN}ord/' || o_orderkey AS node, '{_KGP}Order' AS cls FROM orders
  UNION ALL
  SELECT '{_KGN}cust/' || c_custkey, '{_KGP}Customer' FROM customer
  UNION ALL
  SELECT '{_KGN}nat/' || n_nationkey, '{_KGP}Nation' FROM nation
),
shp(cls, pred, mn, mx) AS (VALUES
  ('{_KGP}Order', '{_KGP}placedBy', 1, 1),
  ('{_KGP}Customer', '{_KGP}inNation', 1, 1),
  ('{_KGP}Nation', '{_KGP}inRegion', 2, 2)
),
cnt AS (SELECT subj AS node, pred, count(*) AS c FROM edges GROUP BY subj, pred),
req AS (
  SELECT t.node, s.cls, s.pred, s.mn, s.mx
  FROM ktypes t JOIN shp s ON t.cls = s.cls
)
SELECT req.node AS node, req.cls AS cls, req.pred AS pred,
       coalesce(cnt.c, 0)::BIGINT AS n_found,
       req.mn::BIGINT AS expected_min, req.mx::BIGINT AS expected_max
FROM req LEFT JOIN cnt ON cnt.node = req.node AND cnt.pred = req.pred
WHERE coalesce(cnt.c, 0) < req.mn OR coalesce(cnt.c, 0) > req.mx
"""

_SQL_KG_DEGREE = f"""
WITH {_KG_EDGE_BODY},
o AS (SELECT subj AS node, count(*) AS c FROM edges GROUP BY subj),
i AS (SELECT obj AS node, count(*) AS c FROM edges GROUP BY obj)
SELECT coalesce(o.node, i.node) AS node,
       coalesce(o.c, 0)::BIGINT AS out_deg,
       coalesce(i.c, 0)::BIGINT AS in_deg
FROM o FULL OUTER JOIN i ON o.node = i.node
"""

_SQL_KG_PATH2 = f"""
WITH {_KG_EDGE_BODY}
SELECT a.pred AS p1, b.pred AS p2, count(*)::BIGINT AS n
FROM edges a JOIN edges b ON a.obj = b.subj
GROUP BY a.pred, b.pred
"""

_SQL_KG_CLASS_PROFILE = f"""
WITH {_KG_EDGE_BODY},
types AS (
  SELECT '{_KGN}ord/' || o_orderkey AS subj, '{_KGP}Order' AS cls FROM orders
  UNION ALL
  SELECT '{_KGN}cust/' || c_custkey, '{_KGP}Customer' FROM customer
  UNION ALL
  SELECT '{_KGN}nat/' || n_nationkey, '{_KGP}Nation' FROM nation
  UNION ALL
  SELECT '{_KGN}reg/' || r_regionkey, '{_KGP}Region' FROM region
),
j AS (SELECT t.cls, e.subj, e.pred FROM edges e JOIN types t ON e.subj = t.subj),
per_subj AS (SELECT cls, subj, count(*) AS out_n FROM j GROUP BY cls, subj)
SELECT ty.cls AS cls,
       ty.n_instances,
       coalesce(e.n_out_edges, 0)::BIGINT AS n_out_edges,
       coalesce(p.n_distinct_preds, 0)::BIGINT AS n_distinct_preds,
       coalesce(e.max_out_degree, 0)::BIGINT AS max_out_degree
FROM (SELECT cls, count(*)::BIGINT AS n_instances FROM types GROUP BY cls) ty
LEFT JOIN (
  SELECT cls, sum(out_n)::BIGINT AS n_out_edges,
         max(out_n)::BIGINT AS max_out_degree
  FROM per_subj GROUP BY cls
) e ON ty.cls = e.cls
LEFT JOIN (
  SELECT cls, count(DISTINCT pred)::BIGINT AS n_distinct_preds
  FROM j GROUP BY cls
) p ON ty.cls = p.cls
"""

_SQL_KG_LINK_SCORES = f"""
WITH {_KG_EDGE_BODY},
und AS (
  SELECT DISTINCT least(subj, obj) AS x, greatest(subj, obj) AS y
  FROM edges WHERE subj <> obj
),
adj AS (
  SELECT x AS node, y AS nbr FROM und UNION ALL SELECT y, x FROM und
),
deg AS (SELECT node, count(*) AS d FROM adj GROUP BY node),
a2 AS (
  SELECT a.node, a.nbr AS mid FROM adj a JOIN deg ON a.nbr = deg.node
  WHERE deg.d <= 128
),
wed AS (
  SELECT a.node AS u, b.node AS w, count(*) AS score
  FROM a2 a JOIN a2 b ON a.mid = b.mid
  WHERE a.node < b.node
  GROUP BY a.node, b.node
),
nw AS (
  SELECT wed.* FROM wed ANTI JOIN und ON wed.u = und.x AND wed.w = und.y
),
rk AS (
  SELECT u, w, score,
         row_number() OVER (PARTITION BY u ORDER BY score DESC, w) AS rn
  FROM nw
)
SELECT u AS node_u, w AS node_w, score::BIGINT AS score FROM rk WHERE rn <= 5
"""



_SQL_KG_RA_SCORES = f"""
WITH {_KG_EDGE_BODY},
und AS (
  SELECT DISTINCT least(subj, obj) AS x, greatest(subj, obj) AS y
  FROM edges WHERE subj <> obj
),
adj AS (
  SELECT x AS node, y AS nbr FROM und UNION ALL SELECT y, x FROM und
),
deg AS (SELECT node, count(*) AS d FROM adj GROUP BY node),
a2 AS (
  SELECT a.node, a.nbr AS mid, (1000000 // deg.d) AS wm
  FROM adj a JOIN deg ON a.nbr = deg.node
  WHERE deg.d <= 128
),
wed AS (
  SELECT a.node AS u, b.node AS w, sum(a.wm) AS score
  FROM a2 a JOIN a2 b ON a.mid = b.mid
  WHERE a.node < b.node
  GROUP BY a.node, b.node
),
nw AS (
  SELECT wed.* FROM wed ANTI JOIN und ON wed.u = und.x AND wed.w = und.y
),
rk AS (
  SELECT u, w, score,
         row_number() OVER (PARTITION BY u ORDER BY score DESC, w) AS rn
  FROM nw
)
SELECT u AS node_u, w AS node_w, score::BIGINT AS score FROM rk WHERE rn <= 5
"""

_SQL_KG_AA_SCORES = f"""
WITH {_KG_EDGE_BODY},
und AS (
  SELECT DISTINCT least(subj, obj) AS x, greatest(subj, obj) AS y
  FROM edges WHERE subj <> obj
),
adj AS (
  SELECT x AS node, y AS nbr FROM und UNION ALL SELECT y, x FROM und
),
deg AS (SELECT node, count(*) AS d FROM adj GROUP BY node),
a2 AS (
  SELECT a.node, a.nbr AS mid,
         (1000000 // greatest(1, length(format('{{:b}}', deg.d)) - 1)) AS wm
  FROM adj a JOIN deg ON a.nbr = deg.node
  WHERE deg.d <= 128
),
wed AS (
  SELECT a.node AS u, b.node AS w, sum(a.wm) AS score
  FROM a2 a JOIN a2 b ON a.mid = b.mid
  WHERE a.node < b.node
  GROUP BY a.node, b.node
),
nw AS (
  SELECT wed.* FROM wed ANTI JOIN und ON wed.u = und.x AND wed.w = und.y
),
rk AS (
  SELECT u, w, score,
         row_number() OVER (PARTITION BY u ORDER BY score DESC, w) AS rn
  FROM nw
)
SELECT u AS node_u, w AS node_w, score::BIGINT AS score FROM rk WHERE rn <= 5
"""

_SQL_KG_JACCARD_SCORES = f"""
WITH {_KG_EDGE_BODY},
und AS (
  SELECT DISTINCT least(subj, obj) AS x, greatest(subj, obj) AS y
  FROM edges WHERE subj <> obj
),
adj AS (
  SELECT x AS node, y AS nbr FROM und UNION ALL SELECT y, x FROM und
),
deg AS (SELECT node, count(*) AS d FROM adj GROUP BY node),
a2 AS (
  SELECT a.node, a.nbr AS mid FROM adj a JOIN deg ON a.nbr = deg.node
  WHERE deg.d <= 128
),
wed AS (
  SELECT a.node AS u, b.node AS w, count(*) AS c
  FROM a2 a JOIN a2 b ON a.mid = b.mid
  WHERE a.node < b.node
  GROUP BY a.node, b.node
),
nw AS (
  SELECT wed.* FROM wed ANTI JOIN und ON wed.u = und.x AND wed.w = und.y
),
jac AS (
  SELECT u, w, (c * 1000000) // (du.d + dw.d - c) AS score
  FROM nw JOIN deg du ON nw.u = du.node JOIN deg dw ON nw.w = dw.node
),
rk AS (
  SELECT u, w, score,
         row_number() OVER (PARTITION BY u ORDER BY score DESC, w) AS rn
  FROM jac
)
SELECT u AS node_u, w AS node_w, score::BIGINT AS score FROM rk WHERE rn <= 5
"""

_SQL_KG_FOUR_CYCLES = f"""
WITH {_CODE_EDGE_BODY},
und AS (
  SELECT DISTINCT least(src, dst) AS x, greatest(src, dst) AS y
  FROM cedges WHERE src <> dst
),
adj AS (
  SELECT x AS node, y AS nbr FROM und UNION ALL SELECT y, x FROM und
),
deg AS (SELECT node, count(*) AS d FROM adj GROUP BY node),
a2 AS (
  SELECT a.node, a.nbr AS mid FROM adj a JOIN deg ON a.nbr = deg.node
  WHERE deg.d <= 128
),
wed AS (
  SELECT a.node AS u, b.node AS w, count(*) AS c
  FROM a2 a JOIN a2 b ON a.mid = b.mid
  WHERE a.node < b.node
  GROUP BY a.node, b.node
),
q AS (
  SELECT u, w, c * (c - 1) // 2 AS q FROM wed WHERE c >= 2
),
sides AS (
  SELECT u AS node, q FROM q UNION ALL SELECT w AS node, q FROM q
)
SELECT node, sum(q)::BIGINT AS n_c4 FROM sides GROUP BY node
"""

_SQL_KG_BGP = f"""
WITH {_KG_EDGE_BODY}
SELECT p1.subj AS o, p1.obj AS c, p2.obj AS n
FROM (SELECT DISTINCT subj, obj FROM edges
      WHERE pred = '{_KGP}placedBy') p1
JOIN (SELECT DISTINCT subj, obj FROM edges
      WHERE pred = '{_KGP}inNation') p2 ON p1.obj = p2.subj
JOIN (SELECT DISTINCT subj FROM edges
      WHERE pred = '{_KGP}inRegion' AND obj = '{_KGN}reg/1') p3
  ON p2.obj = p3.subj
"""

_SQL_KG_BFS = f"""
WITH RECURSIVE {_KG_EDGE_BODY},
reach(node, d) AS (
  SELECT '{_KGN}reg/1' AS node, 0 AS d
  UNION
  SELECT e.subj AS node, r.d + 1 AS d
  FROM reach r JOIN edges e ON e.obj = r.node
  WHERE r.d < 100
)
SELECT node, min(d)::BIGINT AS dist FROM reach GROUP BY node
"""


# parent of s = min obj one hop closer to the seed (reverse walk:
# r JOIN e ON e.obj = r.node expands e.subj, so s's predecessor is its obj)
_SQL_KG_BFS_TREE = f"""
WITH RECURSIVE {_KG_EDGE_BODY},
reach(node, d) AS (
  SELECT '{_KGN}reg/1' AS node, 0 AS d
  UNION
  SELECT e.subj AS node, r.d + 1 AS d
  FROM reach r JOIN edges e ON e.obj = r.node
  WHERE r.d < 100
),
dist AS (SELECT node, min(d) AS d FROM reach GROUP BY node)
SELECT n.node, coalesce(p.parent, '') AS parent, n.d::BIGINT AS dist
FROM dist n LEFT JOIN (
  SELECT e.subj AS node, min(e.obj) AS parent
  FROM edges e
  JOIN dist ds ON ds.node = e.subj
  JOIN dist dp ON dp.node = e.obj AND dp.d + 1 = ds.d
  GROUP BY e.subj
) p ON p.node = n.node
"""


_SQL_BGP_OPTIONAL = f"""
WITH {_KG_EDGE_BODY},
f AS (SELECT DISTINCT subj AS o, obj AS prev FROM edges
      WHERE pred = '{_KGP}follows'),
g AS (SELECT DISTINCT subj AS o2, obj AS o FROM edges
      WHERE pred = '{_KGP}follows')
SELECT f.o, f.prev, coalesce(g.o2, '') AS o2
FROM f LEFT JOIN g ON g.o = f.o
"""

_SQL_BGP_PATH = f"""
WITH RECURSIVE {_KG_EDGE_BODY},
f AS (SELECT DISTINCT subj AS s, obj AS o FROM edges
      WHERE pred = '{_KGP}follows'),
cl(a, b) AS (
  SELECT s, o FROM f
  UNION
  SELECT cl.a, f.o FROM cl JOIN f ON f.s = cl.b
),
pb AS (SELECT DISTINCT subj AS b, obj AS c FROM edges
       WHERE pred = '{_KGP}placedBy')
SELECT cl.a, cl.b, pb.c FROM cl JOIN pb USING (b)
"""

_SQL_ASSORT = f"""
WITH {_KG_EDGE_BODY},
e AS (SELECT subj AS u, obj AS v FROM edges),
od AS (SELECT subj AS node, count(*)::BIGINT AS x FROM edges GROUP BY 1),
idg AS (SELECT obj AS node, count(*)::BIGINT AS y FROM edges GROUP BY 1)
SELECT count(*)::BIGINT AS n_edges,
       sum(od.x)::BIGINT AS sum_x,
       sum(idg.y)::BIGINT AS sum_y,
       sum(od.x * idg.y)::BIGINT AS sum_xy,
       sum(od.x * od.x)::BIGINT AS sum_x2,
       sum(idg.y * idg.y)::BIGINT AS sum_y2
FROM e JOIN od ON e.u = od.node JOIN idg ON e.v = idg.node
"""

_SQL_BGP_PATH_ALT = f"""
WITH RECURSIVE {_KG_EDGE_BODY},
f AS (SELECT DISTINCT subj AS s, obj AS o FROM edges
      WHERE pred IN ('{_KGP}follows', '{_KGP}placedBy')),
cl(a, b) AS (
  SELECT s, o FROM f
  UNION
  SELECT cl.a, f.o FROM cl JOIN f ON f.s = cl.b
)
SELECT a, b FROM cl
"""

_SQL_BGP_MINUS = f"""
WITH {_KG_EDGE_BODY},
f AS (SELECT DISTINCT subj AS o, obj AS prev FROM edges
      WHERE pred = '{_KGP}follows')
SELECT o, prev FROM f
WHERE o NOT IN (SELECT prev FROM f)
"""

_SQL_BGP_AGG = f"""
WITH RECURSIVE {_KG_EDGE_BODY},
f AS (SELECT DISTINCT subj AS s, obj AS o FROM edges
      WHERE pred = '{_KGP}follows'),
cl(a, b) AS (
  SELECT s, o FROM f
  UNION
  SELECT cl.a, f.o FROM cl JOIN f ON f.s = cl.b
),
pb AS (SELECT DISTINCT subj AS b, obj AS c FROM edges
       WHERE pred = '{_KGP}placedBy')
SELECT pb.c, count(*)::BIGINT AS n
FROM cl JOIN pb USING (b)
GROUP BY 1 ORDER BY 1
"""

# tree betweenness: subtree sizes rebuilt analytically from the chain
# structure — order at chain position pos (of L) has subtree L-pos+1 and
# ONE child of size L-pos; cust subtree = 1+L (child = first order, size
# L); nation = 1 + Σ(1+L); region = 1 + Σ nation.  bet(v) =
# C(n_t-1,2) - (Σc²-Σc)/2 - C(n_t-1-Σc,2), n_t = its region's subtree.
_SQL_TREE_BET = f"""
WITH ch AS (
  SELECT o_orderkey AS k, o_custkey AS c,
         row_number() OVER (PARTITION BY o_custkey ORDER BY o_orderkey) AS pos,
         count(*) OVER (PARTITION BY o_custkey) AS L
  FROM orders
),
cust AS (
  SELECT c_custkey AS c, c_nationkey AS n, coalesce(cl.L, 0) AS L
  FROM customer LEFT JOIN (SELECT c, max(L) AS L FROM ch GROUP BY c) cl
    ON cl.c = c_custkey
),
nat AS (
  SELECT n_nationkey AS n, n_regionkey AS r,
         1 + coalesce(sum(1 + cust.L), 0) AS d,
         coalesce(sum(1 + cust.L), 0) AS sumc,
         coalesce(sum((1 + cust.L) * (1 + cust.L)), 0) AS sumc2
  FROM nation LEFT JOIN cust ON cust.n = n_nationkey
  GROUP BY n_nationkey, n_regionkey
),
reg AS (
  SELECT r, 1 + sum(d) AS d, sum(d) AS sumc, sum(d * d) AS sumc2
  FROM nat GROUP BY r
),
pern AS (
  SELECT '{_KGN}ord/' || ch.k AS node, reg.d AS n_t,
         CASE WHEN ch.pos < ch.L THEN ch.L - ch.pos ELSE 0 END AS sumc,
         CASE WHEN ch.pos < ch.L
              THEN (ch.L - ch.pos) * (ch.L - ch.pos) ELSE 0 END AS sumc2
  FROM ch JOIN cust ON cust.c = ch.c
  JOIN nat ON nat.n = cust.n JOIN reg ON reg.r = nat.r
  UNION ALL
  SELECT '{_KGN}cust/' || cust.c, reg.d, cust.L, cust.L * cust.L
  FROM cust JOIN nat ON nat.n = cust.n JOIN reg ON reg.r = nat.r
  UNION ALL
  SELECT '{_KGN}nat/' || nat.n, reg.d, nat.sumc, nat.sumc2
  FROM nat JOIN reg ON reg.r = nat.r
  UNION ALL
  SELECT '{_KGN}reg/' || r, d, sumc, sumc2 FROM reg
)
SELECT node,
       ((n_t - 1) * (n_t - 2) // 2
        - (sumc2 - sumc) // 2
        - (n_t - 1 - sumc) * (n_t - 2 - sumc) // 2)::BIGINT AS betweenness
FROM pern
"""

_SQL_BGP_UNION = f"""
WITH {_KG_EDGE_BODY}
SELECT DISTINCT subj AS x, obj AS y FROM edges
WHERE pred = '{_KGP}inNation'
UNION
SELECT DISTINCT subj, obj FROM edges
WHERE pred = '{_KGP}inRegion'
"""

_SQL_BGP_FILTER = f"""
WITH {_KG_EDGE_BODY}
SELECT p1.subj AS o, p1.obj AS c, p2.obj AS n
FROM (SELECT DISTINCT subj, obj FROM edges
      WHERE pred = '{_KGP}placedBy') p1
JOIN (SELECT DISTINCT subj, obj FROM edges
      WHERE pred = '{_KGP}inNation') p2 ON p1.obj = p2.subj
WHERE p1.subj LIKE '{_KGN}ord/1%'
  AND regexp_matches(p2.obj, 'nat/[0-9]*[02468]$')
"""


# per-IC finding counts over the plain cube corpus — the incremental
# run's combined output must land exactly on the same per-IC SQL the
# individual IC queries are checked against (only these 9 ICs fire on
# this corpus; an unexpected IC would surface as an extra row)
_SQL_INCREMENTAL = "\nUNION ALL\n".join(
    f"SELECT '{ic}' AS ic, count(*)::BIGINT AS n FROM ({sql})"
    for ic, sql in [
        ("IC1", _SQL_IC1),
        ("IC2", _SQL_IC2),
        ("IC11", _SQL_IC11),
        ("IC12", _SQL_IC12),
        ("IC13", _SQL_IC13),
        ("IC14", _SQL_IC14),
        ("IC19", _SQL_IC19),
        ("IC20", _SQL_IC2021),
        ("IC21", _SQL_IC2021),
    ]
)


# ---------------------------------------------------------------------------
# driver contract
# ---------------------------------------------------------------------------


def entry() -> Any:
    """Flagship: full 21-IC validation of the TPC-H-derived cube corpus at
    sf0.001 (read → parse → normalize → pivot shuffle → findings)."""
    return _findings("/root/testdata/sf0.001")


def queries() -> dict[str, Callable[[str], Any]]:
    from nospa_rdf_data_cube_validator_ray.pipelines import relational as rel
    from nospa_rdf_data_cube_validator_ray.pipelines import training_data as td

    q = {
        "cube_ic1": q_cube_ic1,
        "cube_ic2": q_cube_ic2,
        "cube_ic11": q_cube_ic11,
        "cube_ic12": q_cube_ic12,
        "cube_ic13": q_cube_ic13,
        "cube_ic14": q_cube_ic14,
        "cube_ic19": q_cube_ic19,
        "cube_ic20": q_cube_ic20,
        "cube_ic21": q_cube_ic21,
        "cube_sparql_ic1": q_sparql_ic1,
        "cube_sparql_ic11": q_sparql_ic11,
        "cube_sparql_ic12_pairs": q_sparql_ic12_pairs,
        "cube_sparql_ic14": q_sparql_ic14,
        "cube_sparql_ic19": q_sparql_ic19,
        "cube_sparql_ic20": q_sparql_ic20,
        "cube_sparql_mt_profile": q_sparql_mt_profile,
        "cube_sparql_ic2": q_sparql_ic2,
        "cube_sparql_ic13": q_sparql_ic13,
        "cube_sparql_ic21": q_sparql_ic21,
        "cube_sparql_slice_ic10": q_sparql_slice_ic10,
        "cube_sparql_slice_ic11": q_sparql_slice_ic11,
        "cube_sparql_slice_ic18": q_sparql_slice_ic18,
        "cube_sparql_schema_ics": q_sparql_schema_ics,
        "cube_obs_per_dataset": q_cube_obs_per_dataset,
        "cube_phase2_by_pred": q_cube_phase2_by_pred,
        "cube_schema_ics": q_schema_ics,
        "cube_slice_ic10": q_slice_ic10,
        "cube_slice_ic11": q_slice_ic11,
        "cube_slice_ic18": q_slice_ic18,
        "cube_slice_ic2": q_slice_ic2,
        "cube_slice_phase2_by_pred": q_slice_phase2_by_pred,
        "cube_mt_ic12": q_mt_ic12,
        "cube_mt_ic14": q_mt_ic14,
        "cube_mt_ic15": q_mt_ic15,
        "cube_mt_ic16": q_mt_ic16,
        "cube_mt_ic17": q_mt_ic17,
        "cube_triples_by_pred": q_cube_triples_by_pred,
        "cube_xml_by_pred": q_cube_xml_by_pred,
        "cube_nquads_by_pred": q_cube_nquads_by_pred,
        "cube_trig_by_pred": q_cube_trig_by_pred,
        "kg_canonical_iris": q_kg_canonical_iris,
        "kg_sameas_roots": q_kg_sameas_roots,
        "kg_degree": q_kg_degree,
        "kg_path2": q_kg_path2,
        "kg_class_profile": q_kg_class_profile,
        "kg_link_scores": q_kg_link_scores,
        "kg_bgp_match": q_kg_bgp_match,
        "kg_bfs_depths": q_kg_bfs_depths,
        "kg_bfs_tree": q_kg_bfs_tree,
        "kg_bgp_optional": q_kg_bgp_optional,
        "kg_bgp_union": q_kg_bgp_union,
        "kg_bgp_filter": q_kg_bgp_filter,
        "kg_bgp_path": q_kg_bgp_path,
        "kg_bgp_path_alt": q_kg_bgp_path_alt,
        "kg_bgp_minus": q_kg_bgp_minus,
        "kg_bgp_agg": q_kg_bgp_agg,
        "kg_assortativity": q_kg_assortativity,
        "kg_tree_betweenness": q_kg_tree_betweenness,
        "cube_incremental": q_cube_incremental,
        "cube_report_lines": q_cube_report_lines,
        "kg_code_imports": q_kg_code_imports,
        "kg_reciprocity": q_kg_reciprocity,
        "kg_code_degree": q_kg_code_degree,
        "kg_code_triangles": q_kg_code_triangles,
        "kg_snapshot_latest": q_kg_snapshot_latest,
        "kg_code_pagerank": q_kg_code_pagerank,
        "kg_code_ppr": q_kg_code_ppr,
        "kg_code_components": q_kg_code_components,
        "kg_code_reachable": q_kg_code_reachable,
        "kg_closeness": q_kg_closeness,
        "kg_harmonic": q_kg_harmonic,
        "kg_triangle_types": q_kg_triangle_types,
        "kg_property_cardinality": q_kg_property_cardinality,
        "kg_pred_subsumption": q_kg_pred_subsumption,
        "kg_degree_asof": q_kg_degree_asof,
        "kg_degree_hist": q_kg_degree_hist,
        "kg_degree_incremental": q_kg_degree_incremental,
        "kg_code_defs": q_kg_code_defs,
        "kg_module_summary": q_kg_module_summary,
        "kg_commit_import_diff": q_kg_commit_import_diff,
        "kg_code_clones": q_kg_code_clones,
        "kg_mixed_by_pred": q_kg_mixed_by_pred,
        "kg_code_metrics": q_kg_code_metrics,
        "kg_repo_profile": q_kg_repo_profile,
        "kg_dag_depth": q_kg_dag_depth,
        "kg_code_2hop": q_kg_code_2hop,
        "kg_random_walks": q_kg_random_walks,
        "kg_node2vec_walks": q_kg_node2vec_walks,
        "kg_sage_neighbors": q_kg_sage_neighbors,
        "kg_walk_skipgrams": q_kg_walk_skipgrams,
        "kg_pred_profile": q_kg_pred_profile,
        "kg_link_negatives": q_kg_link_negatives,
        "kg_node_features": q_kg_node_features,
        "kg_type_inference": q_kg_type_inference,
        "kg_subclass_closure": q_kg_subclass_closure,
        "kg_entity_mentions": q_kg_entity_mentions,
        "kg_entity_cooccur": q_kg_entity_cooccur,
        "kg_entity_lift": q_kg_entity_lift,
        "kg_ra_scores": q_kg_ra_scores,
        "kg_jaccard_scores": q_kg_jaccard_scores,
        "kg_aa_scores": q_kg_aa_scores,
        "kg_four_cycles": q_kg_four_cycles,
        "kg_communities": q_kg_communities,
        "kg_kcore": q_kg_kcore,
        "kg_ktruss": q_kg_ktruss,
        "kg_weighted_sssp": q_kg_weighted_sssp,
        "kg_triple_ids": q_kg_triple_ids,
        "kg_shape_check": q_kg_shape_check,
        "kg_hits": q_kg_hits,
        "kg_clustering": q_kg_clustering,
        "kg_scc": q_kg_scc,
        "kg_dag_paths": q_kg_dag_paths,
        "kg_snapshot_asof": q_kg_snapshot_asof,
    }
    q.update(td.QUERIES)
    q.update(rel.QUERIES)
    return {name: _at_plan_boundary(name, fn) for name, fn in q.items()}


def _at_plan_boundary(name: str, fn):
    """Wrap a query callable with a pool-drain at entry.  The driver
    runs queries back-to-back in ONE Ray session; Ray 2.49 releases a
    finished plan's actor pools asynchronously (and not at all while a
    dead executor ref survives), so without this boundary a later
    query's fixed-size pool can deadlock with every actor pending
    against leaked slots (VERDICT r4 "What's wrong" #1).  The drain is
    a no-op (one ``available_resources`` call) on a quiet cluster."""
    import functools

    from nospa_rdf_data_cube_validator_ray.util import drain_stale_pools

    @functools.wraps(fn)
    def run(sf_dir: str, *a, **kw):
        drain_stale_pools()
        return fn(sf_dir, *a, **kw)

    return run


def oracle_sql() -> dict[str, str]:
    from nospa_rdf_data_cube_validator_ray.pipelines import relational as rel
    from nospa_rdf_data_cube_validator_ray.pipelines import training_data as td

    o = {
        "cube_ic1": _SQL_IC1,
        "cube_ic2": _SQL_IC2,
        "cube_ic11": _SQL_IC11,
        "cube_ic12": _SQL_IC12,
        "cube_ic13": _SQL_IC13,
        "cube_ic14": _SQL_IC14,
        "cube_ic19": _SQL_IC19,
        "cube_ic20": _SQL_IC2021,
        "cube_ic21": _SQL_IC2021,
        "cube_sparql_ic1": _SQL_SPARQL_IC1,
        "cube_sparql_ic11": _SQL_IC11,
        "cube_sparql_ic12_pairs": _SQL_SPARQL_IC12_PAIRS,
        "cube_sparql_ic14": _SQL_IC14,
        "cube_sparql_ic19": _SQL_SPARQL_IC19,
        "cube_sparql_ic20": _SQL_IC2021,
        "cube_sparql_mt_profile": _SQL_SPARQL_MT_PROFILE,
        "cube_sparql_ic2": _SQL_IC2,
        "cube_sparql_ic13": _SQL_IC13,
        "cube_sparql_ic21": _SQL_IC2021,
        "cube_sparql_slice_ic10": _SQL_SLICE_IC10,
        "cube_sparql_slice_ic11": _SQL_SLICE_IC11,
        "cube_sparql_slice_ic18": _SQL_SLICE_IC18,
        "cube_sparql_schema_ics": _SQL_SCHEMA_ICS,
        "cube_obs_per_dataset": _SQL_OBS_PER_DS,
        "cube_phase2_by_pred": _SQL_PHASE2,
        "cube_schema_ics": _SQL_SCHEMA_ICS,
        "cube_slice_ic10": _SQL_SLICE_IC10,
        "cube_slice_ic11": _SQL_SLICE_IC11,
        "cube_slice_ic18": _SQL_SLICE_IC18,
        "cube_slice_ic2": _SQL_SLICE_IC2,
        "cube_slice_phase2_by_pred": _SQL_SLICE_PHASE2,
        "cube_mt_ic12": _SQL_MT_IC12,
        "cube_mt_ic14": _SQL_MT_IC14,
        "cube_mt_ic15": _SQL_MT_IC15,
        "cube_mt_ic16": _SQL_MT_IC16,
        "cube_mt_ic17": _SQL_MT_IC17,
        "cube_triples_by_pred": _SQL_TRIPLES_BY_PRED,
        "cube_xml_by_pred": _SQL_TRIPLES_BY_PRED,
        "cube_nquads_by_pred": _SQL_TRIPLES_BY_PRED,
        "cube_trig_by_pred": _SQL_TRIPLES_BY_PRED,
        "kg_canonical_iris": _SQL_KG_CANONICAL,
        "kg_sameas_roots": _SQL_KG_ROOTS,
        "kg_degree": _SQL_KG_DEGREE,
        "kg_path2": _SQL_KG_PATH2,
        "kg_class_profile": _SQL_KG_CLASS_PROFILE,
        "kg_link_scores": _SQL_KG_LINK_SCORES,
        "kg_bgp_match": _SQL_KG_BGP,
        "kg_bfs_depths": _SQL_KG_BFS,
        "kg_bfs_tree": _SQL_KG_BFS_TREE,
        "kg_bgp_optional": _SQL_BGP_OPTIONAL,
        "kg_bgp_union": _SQL_BGP_UNION,
        "kg_bgp_filter": _SQL_BGP_FILTER,
        "kg_assortativity": _SQL_ASSORT,
        "kg_bgp_path": _SQL_BGP_PATH,
        "kg_bgp_path_alt": _SQL_BGP_PATH_ALT,
        "kg_bgp_minus": _SQL_BGP_MINUS,
        "kg_bgp_agg": _SQL_BGP_AGG,
        "kg_tree_betweenness": _SQL_TREE_BET,
        "cube_incremental": _SQL_INCREMENTAL,
        "cube_report_lines": (
            "SELECT ic, n FROM (" + _SQL_INCREMENTAL + ") WHERE n > 0 ORDER BY ic"
        ),
        "kg_code_imports": _SQL_CODE_IMPORTS,
        "kg_reciprocity": _SQL_RECIPROCITY,
        "kg_code_degree": _SQL_CODE_DEGREE,
        "kg_code_triangles": _SQL_CODE_TRIANGLES,
        "kg_snapshot_latest": _SQL_SNAPSHOT_LATEST,
        "kg_code_pagerank": _SQL_CODE_PAGERANK,
        "kg_code_ppr": _SQL_CODE_PPR,
        "kg_code_components": _SQL_CODE_COMPONENTS,
        "kg_code_reachable": _SQL_CODE_REACHABLE,
        "kg_closeness": _SQL_KG_CLOSENESS,
        "kg_harmonic": _SQL_KG_HARMONIC,
        "kg_triangle_types": _SQL_TRIANGLE_TYPES,
        "kg_property_cardinality": _SQL_PROPERTY_CARDINALITY,
        "kg_pred_subsumption": _SQL_PRED_SUBSUMPTION,
        "kg_degree_asof": _SQL_DEGREE_ASOF,
        "kg_degree_hist": _SQL_DEGREE_HIST,
        "kg_degree_incremental": _SQL_DEGREE_INCREMENTAL,
        "kg_code_defs": _SQL_CODE_DEFS,
        "kg_module_summary": _SQL_MODULE_SUMMARY,
        "kg_commit_import_diff": _SQL_COMMIT_DIFF,
        "kg_code_clones": _SQL_CODE_CLONES,
        "kg_mixed_by_pred": _SQL_MIXED_BY_PRED,
        "kg_code_metrics": _SQL_CODE_METRICS,
        "kg_repo_profile": _SQL_REPO_PROFILE,
        "kg_dag_depth": _SQL_DAG_DEPTH,
        "kg_code_2hop": _SQL_CODE_2HOP,
        "kg_random_walks": _SQL_RANDOM_WALKS,
        "kg_node2vec_walks": _SQL_NODE2VEC,
        "kg_sage_neighbors": _SQL_SAGE,
        "kg_walk_skipgrams": _SQL_WALK_SKIPGRAMS,
        "kg_pred_profile": _SQL_PRED_PROFILE,
        "kg_link_negatives": _SQL_LINK_NEGATIVES,
        "kg_node_features": _SQL_NODE_FEATURES,
        "kg_type_inference": _SQL_TYPE_INFERENCE,
        "kg_subclass_closure": _SQL_SUBCLASS_CLOSURE,
        "kg_entity_mentions": _SQL_ENTITY_MENTIONS,
        "kg_entity_cooccur": _SQL_ENTITY_COOCCUR,
        "kg_entity_lift": _SQL_ENTITY_LIFT,
        "kg_ra_scores": _SQL_KG_RA_SCORES,
        "kg_jaccard_scores": _SQL_KG_JACCARD_SCORES,
        "kg_aa_scores": _SQL_KG_AA_SCORES,
        "kg_four_cycles": _SQL_KG_FOUR_CYCLES,
        "kg_communities": _SQL_KG_COMMUNITIES,
        "kg_kcore": _SQL_KG_KCORE,
        "kg_ktruss": _SQL_KG_KTRUSS,
        "kg_weighted_sssp": _SQL_KG_SSSP,
        "kg_triple_ids": _SQL_TRIPLE_IDS,
        "kg_shape_check": _SQL_SHAPE_CHECK,
        "kg_hits": _SQL_CODE_HITS,
        "kg_clustering": _SQL_CODE_CLUSTERING,
        "kg_scc": _SQL_CODE_SCC,
        "kg_dag_paths": _SQL_DAG_PATHS,
        "kg_snapshot_asof": _SQL_SNAPSHOT_ASOF,
    }
    o.update(td.ORACLES)
    o.update(rel.ORACLES)
    return o


def q_kg_reciprocity(sf_dir: str):
    """Edge reciprocity of the code-import graph — (n_edges,
    n_reciprocal): how many directed import edges have their reverse
    present (mutual imports), the classic directedness health metric.
    One pass projects distinct edges; the reverse probe rides the same
    bucketed existence pass as the anti/semi join (both orientations of
    a pair land in one bucket via the unordered pair key), so nothing
    joins at row scale twice."""
    import ray.data

    import pandas as pd

    from nospa_rdf_data_cube_validator_ray.sources.code_extract import (
        extract_code_corpus,
    )
    from nospa_rdf_data_cube_validator_ray.fixtures import tpch_code_corpus
    from nospa_rdf_data_cube_validator_ray.util import bucket_agg

    edges = extract_code_corpus(
        ray.data.from_arrow(tpch_code_corpus(sf_dir))
    )

    def proj(df: pd.DataFrame) -> pd.DataFrame:
        d = df[df["pred"] == f"{_CODE}imports"]
        out = pd.DataFrame(
            {
                "a": d["subj"].astype("string"),
                "b": d["obj"].astype("string"),
            }
        ).drop_duplicates()
        out = out[out["a"] != out["b"]]
        # unordered pair key so both orientations co-locate
        lo = out[["a", "b"]].min(axis=1)
        hi = out[["a", "b"]].max(axis=1)
        out["lo"] = lo
        out["hi"] = hi
        return out

    e = edges.map_batches(proj, batch_format="pandas")

    def pair_stats(df: pd.DataFrame) -> pd.DataFrame:
        df = df.drop_duplicates(["a", "b"])
        g = df.groupby(["lo", "hi"], as_index=False).size()
        n_edges = int(len(df))
        n_recip = int(2 * (g["size"] == 2).sum())
        return pd.DataFrame(
            {
                "n_edges": pd.array([n_edges], dtype="int64"),
                "n_reciprocal": pd.array([n_recip], dtype="int64"),
            }
        )

    parts = bucket_agg(e, ["lo", "hi"], pair_stats).to_pandas()
    return pd.DataFrame(
        {
            "n_edges": pd.array([int(parts["n_edges"].sum())], dtype="int64"),
            "n_reciprocal": pd.array(
                [int(parts["n_reciprocal"].sum())], dtype="int64"
            ),
        }
    )
