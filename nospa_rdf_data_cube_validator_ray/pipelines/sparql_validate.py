"""The SPARQL-specification validator backend — the reference's second
engine (sparql/SparqlValidator.java:90-234) re-expressed over the triple
Dataset.

This is NOT a SPARQL engine: each of the 21 constraint SELECTs in
sparql/IntegrityConstraint.java (IC1 :15-29 … IC21B :295-305) is
hand-translated into vectorized pandas relational algebra over one
graph's triples, following the *specification* semantics — NOT the
nonsparql package's bug-for-bug behavior.  The two engines therefore
deliberately diverge where the NoSPA path carries documented quirks:

* IC-8  — NoSPA accumulates componentProperty sets across DSDs
          (ValidatorIC8.java:29,34-45); the spec checks each slice key
          against ITS dsd only (IntegrityConstraint.java:90-98).
* IC-12 — NoSPA flags the 2nd+ member of each duplicate group
          (ValidatorIC11_12.java:61-85); the spec emits every ordered
          pair (?obs1, ?obs2) whose SHARED dimensions all agree
          (IntegrityConstraint.java:133-151) — an obs missing a
          dimension still pairs with one that has it.
* IC-14 — NoSPA requires ALL component properties on every observation
          of a measureType cube (ValidatorIC14.java:31-33); the spec
          SKIPS measureType cubes entirely (:163-175).
* IC-19 — NoSPA keys violations by VALUE and only checks single-valued
          dimensions (ValidatorIC19.java:113-128); the spec checks every
          (obs, dim, value) binding and keys by (obs, dim) (:246-263).
* IC-20/21 — NoSPA closes each hierarchy over its OWN parent-child
          properties; the spec substitutes EVERY globally-declared pcp
          into the path query one at a time and unions the failures
          (SparqlValidator.java:217-234), and an empty pcp set means
          *pass* (validateIC20_21 returns the empty pcpSet) where NoSPA
          still requires root membership.

Normalization is shared: phase 1 (NormalizationAlgorithm.java:7-50) is
the same six rules the streaming engine applies (stages/normalize.py);
phase 2 (:52-89) is computed per graph inside the check so pushed-down
values are visible to the constraints, exactly as the reference's
UPDATE mutates the model before validateAll.

Execution shape: graphs are file-local, so the local path is ONE
map_batches over file-aligned blocks (zero shuffle, zero broadcast —
the LocalCheck architecture).  The shuffle path buckets whole graphs by
hash so IC-12/17's intra-graph pairwise semantics stay co-located; a
single graph larger than worker heap (e.g. a chunk-split giant file
whose chunks re-assemble in the shuffle) raises a loud, typed
:class:`SpecGraphTooLargeError` pointing at the NOSPA backend's
bucketed pivot — never a silent OOM.
"""

from __future__ import annotations

import numpy as np
import pandas as pd
import pyarrow as pa

from ..model import FINDINGS_SCHEMA, KIND_LITERAL
from .. import vocab as V

_DETAIL_SEP = "\x1e"

# loud-failure bounds for the spec's inherently pairwise constraints
# (IC-12 emits ordered pairs; observations with missing/multi-valued
# dimensions need per-pair comparison) — these are pathological-input
# guards, not scale limits: regular cubes take the hash-group path
_PAIR_CAP = 2_000_000
_ODD_OPS_CAP = 5_000_000

# one graph must fit one worker's heap on the spec engine's shuffle path
# (the per-graph evaluator is a single pandas frame); a chunk-split giant
# file re-assembles into ONE group there, so it must fail loudly with a
# pointer at the NOSPA engine instead of silently OOMing the worker
_SPEC_GRAPH_ROWS_CAP = 4_000_000


class SpecGraphTooLargeError(RuntimeError):
    """A single graph exceeds the spec engine's per-worker frame budget.

    The spec translations evaluate each graph as one pandas frame
    (intra-graph pairwise IC-12/17 semantics); a graph beyond
    ``_SPEC_GRAPH_ROWS_CAP`` rows — e.g. a chunk-split giant Turtle file
    whose chunks re-co-locate in the shuffle — needs the NOSPA backend's
    bucketed pivot (``create_validator("NOSPA", mode="shuffle")``)."""


def _sterm(s: pd.Series) -> pd.Series:
    """Vectorized subject rendering (subj_term)."""
    s = s.astype(str)
    return s.where(s.str.startswith("_:"), "<" + s + ">")


def _oterm(df: pd.DataFrame) -> np.ndarray:
    from ..stages.pivot import _obj_term_vec

    return _obj_term_vec(df)


class _Graph:
    """One graph's triples with the accessors the constraint
    translations share.  ``t`` carries columns subj, pred, obj,
    obj_kind, oterm — phase-2 pushdown rows included, set semantics
    (deduped on (subj, pred, oterm))."""

    def __init__(self, gdf: pd.DataFrame):
        base = pd.DataFrame(
            {
                "subj": gdf["subj"].astype(str).to_numpy(),
                "pred": gdf["pred"].astype(str).to_numpy(),
                "obj": gdf["obj"].astype(str).to_numpy(),
                "obj_kind": gdf["obj_kind"].to_numpy(),
                "oterm": _oterm(gdf),
            }
        )
        self.t = self._with_phase2(base)
        tr = self.t[self.t["pred"] == V.RDF_type]
        tr = tr[tr["obj_kind"] == 0]
        self._typed: dict[str, set] = {
            cls: set(sub["subj"]) for cls, sub in tr.groupby("obj", sort=False)
        }

    # -- accessors ---------------------------------------------------------

    def rows(self, pred: str) -> pd.DataFrame:
        return self.t[self.t["pred"] == pred]

    def node_pairs(self, pred: str) -> pd.DataFrame:
        """(s, o) pairs with NODE objects only (IRI / bnode) — the graph
        navigation form; literal objects can't be subjects."""
        r = self.rows(pred)
        r = r[r["obj_kind"] != KIND_LITERAL]
        return pd.DataFrame({"s": r["subj"].to_numpy(), "o": r["obj"].to_numpy()})

    def typed(self, cls: str) -> set:
        return self._typed.get(cls, set())

    def obj_count(self, pred: str) -> pd.Series:
        """subject → COUNT(DISTINCT object term) for ``pred``."""
        r = self.rows(pred)
        if not len(r):
            return pd.Series(dtype="int64")
        return r.groupby("subj", sort=False)["oterm"].nunique()

    # -- spec PHASE2 (NormalizationAlgorithm.java:52-89) --------------------

    @staticmethod
    def _with_phase2(t: pd.DataFrame) -> pd.DataFrame:
        def np_(pred):
            r = t[(t["pred"] == pred) & (t["obj_kind"] != KIND_LITERAL)]
            return pd.DataFrame(
                {"s": r["subj"].to_numpy(), "o": r["obj"].to_numpy()}
            )

        ds_struct = np_(V.QB_structure)                 # dataset → dsd
        dsd_comp = np_(V.QB_component)                  # dsd → spec
        sc = t[(t["pred"] == V.QB_componentProperty) & (t["obj_kind"] == 0)]
        spec_comp = pd.DataFrame(                       # spec → comp IRI
            {"spec": sc["subj"].to_numpy(), "comp": sc["obj"].to_numpy()}
        ).drop_duplicates()
        ds_spec = ds_struct.merge(
            dsd_comp.rename(columns={"s": "o", "o": "spec"}), on="o"
        )[["s", "spec"]].rename(columns={"s": "dataset"}).drop_duplicates()

        att = t[(t["pred"] == V.QB_componentAttachment) & (t["obj_kind"] == 0)]
        att_ds = set(att.loc[att["obj"] == V.QB_DataSet, "subj"])
        att_sl = set(att.loc[att["obj"] == V.QB_Slice, "subj"])
        dim_typed = set(
            t.loc[
                (t["pred"] == V.RDF_type)
                & (t["obj"] == V.QB_DimensionProperty)
                & (t["obj_kind"] == 0),
                "subj",
            ]
        )

        dsof = np_(V.QB_dataSet).rename(columns={"s": "obs", "o": "dataset"})
        ds_slice = np_(V.QB_slice).rename(columns={"s": "dataset", "o": "slice"})
        slice_obs = np_(V.QB_observation).rename(columns={"s": "slice", "o": "obs"})

        vals = t[["subj", "pred", "obj", "obj_kind", "oterm"]]
        parts = []

        def emit(targets: pd.DataFrame, holder_col: str, comp_frame: pd.DataFrame):
            """comp_frame: (holder, comp); values read off the holder,
            pushed to targets' obs — the insertValueToObs fan-out."""
            if not len(comp_frame) or not len(targets):
                return
            v = comp_frame.merge(
                vals.rename(columns={"subj": holder_col, "pred": "comp"}),
                on=[holder_col, "comp"],
            )
            if not len(v):
                return
            out = v.merge(targets, on=holder_col)
            if not len(out):
                return
            parts.append(
                pd.DataFrame(
                    {
                        "subj": out["obs"].to_numpy(),
                        "pred": out["comp"].to_numpy(),
                        "obj": out["obj"].to_numpy(),
                        "obj_kind": out["obj_kind"].to_numpy(),
                        "oterm": out["oterm"].to_numpy(),
                    }
                )
            )

        # 2a — DataSet attachments (:55-64)
        a = ds_spec[ds_spec["spec"].isin(att_ds)].merge(spec_comp, on="spec")
        emit(dsof, "dataset", a[["dataset", "comp"]].drop_duplicates())

        # slice targets shared by 2b/2c: (dataset, slice) ⋈ (slice, obs)
        sl_tgt = ds_slice.merge(slice_obs, on="slice")[["slice", "obs"]]

        # 2b — Slice attachments (:66-76): spec reachable from the
        # slice's dataset
        b = ds_spec[ds_spec["spec"].isin(att_sl)].merge(spec_comp, on="spec")
        b_sl = b.merge(ds_slice, on="dataset")[["slice", "comp"]].drop_duplicates()
        emit(sl_tgt, "slice", b_sl)

        # 2c — dimension values on slices (:78-88): ANY spec whose comp is
        # a typed DimensionProperty
        c = ds_spec.merge(spec_comp, on="spec")
        c = c[c["comp"].isin(dim_typed)]
        c_sl = c.merge(ds_slice, on="dataset")[["slice", "comp"]].drop_duplicates()
        emit(sl_tgt, "slice", c_sl)

        if parts:
            t = pd.concat([t, *parts], ignore_index=True)
        return t.drop_duplicates(["subj", "pred", "oterm"], ignore_index=True)


def _anti(left: pd.DataFrame, right: pd.DataFrame, on: list[str]) -> pd.DataFrame:
    """left rows with NO match in right (FILTER NOT EXISTS)."""
    if not len(right):
        return left
    m = left.merge(right.drop_duplicates(), on=on, how="left", indicator=True)
    return m[m["_merge"] == "left_only"].drop(columns="_merge")


def spec_eval_graph(gdf: pd.DataFrame, ics=None) -> pd.DataFrame:
    """One graph's triples (phase 1 applied) → spec findings
    (ic, subject, detail) — detail entries joined by \\x1e, one row per
    (ic, subject) with merged sorted-unique details.

    ``ics`` (an iterable of "ICn" names, None = all) pushes per-IC
    selection INTO the kernel — parity with the reference, whose
    SparqlValidator runs one SELECT per requested constraint
    (SparqlValidator.java:90-234).  Only the two cap-bounded pairwise
    kernels (IC-12, IC-17) are actually skipped; the linear kernels
    cost less than the selection plumbing would save, and callers
    filter the output rows regardless.  This is what lets a
    slice-corpus IC-10/11/18 run at 10× driver scale avoid executing
    the spec's quadratic IC-12 compare entirely."""
    want = (lambda ic: True) if ics is None else (lambda ic: ic in ics)
    G = _Graph(gdf)
    t = G.t
    out: list[tuple[str, str, str]] = []  # (ic, subject_term, one detail term)

    def emit_series(ic: str, subjects: pd.Series, details=None):
        st = _sterm(subjects)
        if details is None:
            out.extend((ic, s, "") for s in st)
        else:
            out.extend(zip([ic] * len(st), st, details))

    # shared navigation frames -------------------------------------------
    dsof = G.node_pairs(V.QB_dataSet).rename(columns={"s": "obs", "o": "dataset"})
    dsof = dsof.drop_duplicates()
    ds_struct = G.node_pairs(V.QB_structure).rename(
        columns={"s": "dataset", "o": "dsd"}
    ).drop_duplicates()
    dsd_comp = G.node_pairs(V.QB_component).rename(
        columns={"s": "dsd", "o": "spec"}
    ).drop_duplicates()
    cp = G.rows(V.QB_componentProperty)
    spec_comp_any = pd.DataFrame(        # spec → comp (ANY node, term form)
        {
            "spec": cp["subj"].to_numpy(),
            "comp_term": cp["oterm"],
            "comp": cp["obj"].to_numpy(),
            "comp_is_iri": (cp["obj_kind"] == 0).to_numpy(),
        }
    ).drop_duplicates(["spec", "comp_term"])
    spec_comp = spec_comp_any[spec_comp_any["comp_is_iri"]][["spec", "comp"]]
    dsd_prop = dsd_comp.merge(spec_comp, on="spec")          # (dsd, spec, comp)
    ds_dsd = ds_struct                                        # alias
    obs_ds_dsd = dsof.merge(ds_dsd, on="dataset")             # (obs, dataset, dsd)

    dim_typed = G.typed(V.QB_DimensionProperty)
    meas_typed = G.typed(V.QB_MeasureProperty)

    # (obs, pred) existence pairs for `?obs ?p []` probes
    have = t[["subj", "pred"]].drop_duplicates().rename(
        columns={"subj": "obs", "pred": "p"}
    )

    # --- IC1 (:15-29): obs typed Observation with dataSet count != 1 -----
    obs_typed = G.typed(V.QB_Observation)
    if obs_typed:
        cnt = G.obj_count(V.QB_dataSet)
        ot = pd.DataFrame({"obs": sorted(obs_typed)})
        n = ot["obs"].map(cnt).fillna(0)
        emit_series("IC1", ot.loc[n != 1, "obs"])

    # --- IC2 (:31-45): dataset typed DataSet with structure count != 1 ---
    ds_typed = G.typed(V.QB_DataSet)
    if ds_typed:
        cnt = G.obj_count(V.QB_structure)
        dt_ = pd.DataFrame({"ds": sorted(ds_typed)})
        n = dt_["ds"].map(cnt).fillna(0)
        emit_series("IC2", dt_.loc[n != 1, "ds"])

    # --- IC3 (:47-53): DSD without component/componentProperty/[a Measure]
    for dsd in sorted(G.typed(V.QB_DataStructureDefinition)):
        props = dsd_prop.loc[dsd_prop["dsd"] == dsd, "comp"]
        if not any(p in meas_typed for p in props):
            out.append(("IC3", _one_term(dsd), ""))

    # --- IC4 (:55-61): dimension without rdfs:range ----------------------
    ranged = set(G.rows(V.RDFS_range)["subj"])
    for dim in sorted(dim_typed - ranged):
        out.append(("IC4", _one_term(dim), ""))

    # --- IC5 (:63-70): range skos:Concept but no codeList ----------------
    rr = G.rows(V.RDFS_range)
    concept_ranged = set(
        rr.loc[(rr["obj"] == V.SKOS_Concept) & (rr["obj_kind"] == 0), "subj"]
    )
    has_cl = set(G.rows(V.QB_codeList)["subj"])
    for dim in sorted((dim_typed & concept_ranged) - has_cl):
        out.append(("IC5", _one_term(dim), ""))

    # --- IC6 (:72-80): componentRequired false → must be Attribute -------
    req = G.rows(V.QB_componentRequired)
    _bool_term = lambda lex: f'"{lex}"^^<{V.XSD_boolean}>'  # noqa: E731
    req_false = set(req.loc[req["oterm"] == _bool_term(V.LEX_FALSE), "subj"])
    attr_typed = G.typed(V.QB_AttributeProperty)
    in_component = set(dsd_comp["spec"])
    ic6 = spec_comp_any[
        spec_comp_any["spec"].isin(req_false & in_component)
    ]
    for term, is_iri, comp in sorted(
        zip(ic6["comp_term"], ic6["comp_is_iri"], ic6["comp"])
    ):
        if not (is_iri and comp in attr_typed):
            out.append(("IC6", term, ""))

    # --- IC7 (:82-88): typed SliceKey not referenced from a typed DSD ----
    sk_edges = G.node_pairs(V.QB_sliceKey)
    dsd_typed = G.typed(V.QB_DataStructureDefinition)
    referenced = set(sk_edges.loc[sk_edges["s"].isin(dsd_typed), "o"])
    for sk in sorted(G.typed(V.QB_SliceKey) - referenced):
        out.append(("IC7", _one_term(sk), ""))

    # --- IC8 (:90-98): slice-key comp props ⊆ THAT dsd's comp props ------
    # (spec semantics — no cross-DSD accumulation; ?dsd is untyped)
    sk_typed = G.typed(V.QB_SliceKey)
    key_props = spec_comp_any[spec_comp_any["spec"].isin(sk_typed)]
    if len(key_props):
        dsd_props_by_term = dsd_comp.merge(
            spec_comp_any[["spec", "comp_term"]], on="spec"
        )
        for dsd, key in sk_edges.itertuples(index=False):
            if key not in sk_typed:
                continue
            dsd_terms = set(
                dsd_props_by_term.loc[dsd_props_by_term["dsd"] == dsd, "comp_term"]
            )
            for term in key_props.loc[key_props["spec"] == key, "comp_term"]:
                if term not in dsd_terms:
                    out.append(("IC8", term, ""))

    # --- IC9 (:100-114): slice typed Slice with sliceStructure count != 1
    sl_typed = G.typed(V.QB_Slice)
    if sl_typed:
        cnt = G.obj_count(V.QB_sliceStructure)
        sl = pd.DataFrame({"s": sorted(sl_typed)})
        n = sl["s"].map(cnt).fillna(0)
        emit_series("IC9", sl.loc[n != 1, "s"])

    # --- IC10 (:116-122): slice missing a value for a key dimension ------
    ss = G.node_pairs(V.QB_sliceStructure).rename(
        columns={"s": "slice", "o": "key"}
    )
    slice_dim = ss.merge(
        spec_comp_any.rename(columns={"spec": "key"}), on="key"
    )
    if len(slice_dim):
        sd = slice_dim.rename(columns={"slice": "obs", "comp": "p"})
        miss = _anti(
            sd[sd["comp_is_iri"]][["obs", "p", "comp_term"]], have, ["obs", "p"]
        )
        emit_series("IC10", miss["obs"], miss["comp_term"].to_numpy())
        noniri = sd[~sd["comp_is_iri"]]  # a non-IRI dim can never be a pred
        emit_series("IC10", noniri["obs"], noniri["comp_term"].to_numpy())

    # --- IC11 (:124-131): obs missing a declared typed dimension ---------
    ds_dim = ds_dsd.merge(dsd_prop, on="dsd")
    ds_dim = ds_dim[ds_dim["comp"].isin(dim_typed)][
        ["dataset", "comp"]
    ].drop_duplicates()
    obs_dim = dsof.merge(ds_dim, on="dataset")[["obs", "comp"]].drop_duplicates()
    if len(obs_dim):
        miss = _anti(
            obs_dim.rename(columns={"comp": "p"}), have, ["obs", "p"]
        )
        emit_series("IC11", miss["obs"], ("<" + miss["p"] + ">").to_numpy())

    # --- IC12 (:133-151): ordered obs pairs agreeing on all SHARED dims --
    if want("IC12"):
        dims_by_ds = {
            ds: list(sub["comp"])
            for ds, sub in ds_dim.groupby("dataset", sort=False)
        }
        ov = dsof.merge(ds_dim, on="dataset")
        ov = ov.merge(
            t[["subj", "pred", "oterm"]].rename(
                columns={"subj": "obs", "pred": "comp"}
            ),
            on=["obs", "comp"],
        ).drop_duplicates(["dataset", "obs", "comp", "oterm"])
        for ds, sub in ov.groupby("dataset", sort=False):
            dims = dims_by_ds.get(ds, [])
            if not dims:
                continue
            pairs = _spec_equal_pairs(sub, dims, require_shared=True)
            for o1, o2s in pairs.items():
                for o2 in o2s:
                    out.append(("IC12", _one_term(o1), _one_term(o2)))

    # --- IC13 (:153-161): required components missing on obs -------------
    req_true = set(req.loc[req["oterm"] == _bool_term(V.LEX_TRUE), "subj"])
    ds_req = (
        ds_dsd.merge(dsd_comp, on="dsd")
        .merge(spec_comp_any, on="spec")
    )
    ds_req = ds_req[ds_req["spec"].isin(req_true)][
        ["dataset", "comp", "comp_term", "comp_is_iri"]
    ].drop_duplicates(["dataset", "comp_term"])
    if len(ds_req):
        obs_req = dsof.merge(ds_req, on="dataset")
        ok = obs_req[obs_req["comp_is_iri"]]
        miss = _anti(
            ok.rename(columns={"comp": "p"})[["obs", "p", "comp_term"]],
            have, ["obs", "p"],
        )
        emit_series("IC13", miss["obs"], miss["comp_term"].to_numpy())
        noniri = obs_req[~obs_req["comp_is_iri"]]
        emit_series("IC13", noniri["obs"], noniri["comp_term"].to_numpy())

    # --- IC14 (:163-175): non-measureType cube must carry every measure --
    dsd_has_mt = set(dsd_prop.loc[dsd_prop["comp"] == V.QB_measureType, "dsd"])
    dsd_meas = dsd_prop[
        dsd_prop["comp"].isin(meas_typed) & ~dsd_prop["dsd"].isin(dsd_has_mt)
    ][["dsd", "comp"]].drop_duplicates()
    if len(dsd_meas):
        om = obs_ds_dsd.merge(dsd_meas, on="dsd")[["obs", "comp"]].drop_duplicates()
        miss = _anti(om.rename(columns={"comp": "p"}), have, ["obs", "p"])
        emit_series("IC14", miss["obs"], ("<" + miss["p"] + ">").to_numpy())

    # --- IC15 (:177-187): measureType value must exist on the obs --------
    mtv = G.rows(V.QB_measureType)
    mt_rows = pd.DataFrame(
        {
            "obs": mtv["subj"].to_numpy(),
            "m": mtv["obj"].to_numpy(),
            "m_term": mtv["oterm"],
            "m_is_iri": (mtv["obj_kind"] == 0).to_numpy(),
        }
    ).drop_duplicates(["obs", "m_term"])
    mt_obs = obs_ds_dsd[obs_ds_dsd["dsd"].isin(dsd_has_mt)][["obs", "dsd"]]
    if len(mt_obs) and len(mt_rows):
        o15 = mt_obs[["obs"]].drop_duplicates().merge(mt_rows, on="obs")
        ok = o15[o15["m_is_iri"]]
        miss = _anti(
            ok.rename(columns={"m": "p"})[["obs", "p", "m_term"]],
            have, ["obs", "p"],
        )
        emit_series("IC15", miss["obs"], miss["m_term"].to_numpy())
        noniri = o15[~o15["m_is_iri"]]
        emit_series("IC15", noniri["obs"], noniri["m_term"].to_numpy())

        # --- IC16 (:189-203): another measure present on a measureType obs
        dsd_meas_all = dsd_prop[dsd_prop["comp"].isin(meas_typed)][
            ["dsd", "comp"]
        ].drop_duplicates()
        om = mt_obs.merge(dsd_meas_all, on="dsd")[["obs", "comp"]].drop_duplicates()
        present = om.merge(
            have, left_on=["obs", "comp"], right_on=["obs", "p"]
        )[["obs", "comp"]]
        j = present.merge(mt_rows, on="obs")
        # FILTER(?omeasure != ?measure) is TERM inequality — compare term
        # renderings (an IRI and a literal with the same characters differ)
        bad = j[("<" + j["comp"] + ">") != j["m_term"]].drop_duplicates(
            ["obs", "m_term"]
        )
        emit_series("IC16", bad["obs"], bad["m_term"].to_numpy())

    # --- IC17 (:205-235): measure count at each dimension point ----------
    if want("IC17"):
        out.extend(
            _spec_ic17(G, obs_ds_dsd, dsd_prop, dim_typed, meas_typed, mt_rows, t)
        )

    # --- IC18 (:237-244): slice obs must link back to the dataset --------
    ds_slice = G.node_pairs(V.QB_slice).rename(
        columns={"s": "dataset", "o": "slice"}
    )
    slice_obs = G.node_pairs(V.QB_observation).rename(
        columns={"s": "slice", "o": "obs"}
    )
    ds_obs = ds_slice.merge(slice_obs, on="slice")[["dataset", "obs"]]
    if len(ds_obs):
        miss = _anti(ds_obs.drop_duplicates(), dsof, ["obs", "dataset"])
        emit_series("IC18", miss["obs"], _sterm(miss["dataset"]).to_numpy())

    # --- IC19 (:246-263): codes from ConceptScheme / Collection ----------
    out.extend(_spec_ic19(G, dsof, ds_dsd, dsd_prop, dim_typed, t))

    # --- IC20/21 (:265-305 + SparqlValidator.java:217-234) ---------------
    out.extend(_spec_ic20_21(G, dsof, ds_dsd, dsd_prop, dim_typed, t))

    if not out:
        return pd.DataFrame(columns=["ic", "subject", "detail"])
    f = pd.DataFrame(out, columns=["ic", "subject", "detail"]).drop_duplicates()
    merged = (
        f[f["detail"] != ""]
        .sort_values(["ic", "subject", "detail"])
        .groupby(["ic", "subject"], sort=False)["detail"]
        .agg(_DETAIL_SEP.join)
        .reset_index()
    )
    empty = f[~f.set_index(["ic", "subject"]).index.isin(
        merged.set_index(["ic", "subject"]).index
    )][["ic", "subject"]].drop_duplicates()
    empty["detail"] = ""
    return pd.concat([merged, empty], ignore_index=True)


def _one_term(node: str) -> str:
    return node if node.startswith("_:") else f"<{node}>"


def _obs_dim_shape(sub: pd.DataFrame, dims: list[str]):
    """Per-dataset observation classification for the pairwise
    constraints: rows (obs, comp, oterm) → (full_pivot, odd) where
    ``full_pivot`` is the obs × dim value matrix of observations carrying
    ALL dims single-valued (hash-groupable — compatibility degenerates to
    tuple equality) and ``odd`` maps the rest to {dim: {values}}."""
    nv = sub.groupby(["obs", "comp"], sort=False)["oterm"].nunique()
    multi_obs = set(nv[nv > 1].index.get_level_values(0))
    ndim = sub.groupby("obs", sort=False)["comp"].nunique()
    complete = set(ndim[ndim == len(dims)].index) - multi_obs
    all_obs = set(ndim.index)
    odd_names = all_obs - complete
    fsub = sub[sub["obs"].isin(complete)]
    full_pivot = (
        fsub.pivot_table(
            index="obs", columns="comp", values="oterm", aggfunc="first"
        )
        .reindex(columns=dims)
        if len(fsub)
        else pd.DataFrame(columns=dims)
    )
    odd: dict[str, dict[str, set]] = {}
    if odd_names:
        osub = sub[sub["obs"].isin(odd_names)]
        for (o, c), vs in osub.groupby(["obs", "comp"], sort=False)["oterm"]:
            odd.setdefault(o, {})[c] = set(vs)
        for o in odd_names:
            odd.setdefault(o, {})
    return full_pivot, odd


def _compat(dv1: dict, dv2: dict, require_shared: bool) -> bool:
    """SPARQL pair semantics: for every dim with values on BOTH
    observations, all value pairs equal ⟺ |union| == 1."""
    shared = dv1.keys() & dv2.keys()
    if require_shared and not shared:
        return False
    return all(len(dv1[d] | dv2[d]) == 1 for d in shared)


def _spec_equal_pairs(
    sub: pd.DataFrame, dims: list[str], *, require_shared: bool
) -> dict[str, list[str]]:
    """IC-12 kernel: obs1 → [obs2 ...] ordered pairs whose shared dims
    all agree (IntegrityConstraint.java:133-151)."""
    full_pivot, odd = _obs_dim_shape(sub, dims)
    pairs: dict[str, set] = {}

    def add(a: str, b: str):
        pairs.setdefault(a, set()).add(b)
        pairs.setdefault(b, set()).add(a)

    total = 0
    if len(full_pivot):
        gid = full_pivot.groupby(list(full_pivot.columns), dropna=False).ngroup()
        for _, members in full_pivot.index.to_series().groupby(gid.to_numpy()):
            m = list(members)
            if len(m) < 2:
                continue
            total += len(m) * (len(m) - 1)
            if total > _PAIR_CAP:
                raise RuntimeError("spec IC-12 pair output exceeded cap")
            for i, a in enumerate(m):
                for b in m[i + 1:]:
                    add(a, b)
    if odd:
        full_vals = {
            o: {d: {v} for d, v in row.items() if pd.notna(v)}
            for o, row in full_pivot.iterrows()
        }
        others = list(full_vals.items())
        if len(odd) * (len(others) + len(odd)) > _ODD_OPS_CAP:
            raise RuntimeError("spec IC-12 odd-observation compare exceeded cap")
        odd_items = list(odd.items())
        for i, (o1, dv1) in enumerate(odd_items):
            for o2, dv2 in others:
                if _compat(dv1, dv2, require_shared):
                    add(o1, o2)
            for o2, dv2 in odd_items[i + 1:]:
                if _compat(dv1, dv2, require_shared):
                    add(o1, o2)
    return {a: sorted(bs) for a, bs in pairs.items()}


def _spec_ic17(G, obs_ds_dsd, dsd_prop, dim_typed, meas_typed, mt_rows, t):
    """IC-17 (:205-235): per (obs1, numMeasures) group, COUNT of
    (obs2, m2) bindings at the same dimension point (self included, no
    shared-dim requirement) must equal numMeasures."""
    out = []
    # numMeasures per dsd = COUNT of (component, prop) bindings with the
    # prop typed MeasureProperty — multiplicity over components
    dm = dsd_prop[dsd_prop["comp"].isin(meas_typed)]
    nmeas = dm.groupby("dsd", sort=False).size()
    if not len(mt_rows):
        return out
    m_per_obs = mt_rows.groupby("obs", sort=False).size()  # m-binding weight

    pairs = obs_ds_dsd.drop_duplicates(["obs", "dataset", "dsd"])
    for (ds, dsd), sub_pairs in pairs.groupby(["dataset", "dsd"], sort=False):
        if dsd not in nmeas.index:
            # the inner numMeasures subquery only binds DSDs with ≥1
            # measure binding — measure-less DSDs never join
            continue
        nm = int(nmeas.get(dsd, 0))
        dims = sorted(
            set(
                dsd_prop.loc[
                    (dsd_prop["dsd"] == dsd)
                    & dsd_prop["comp"].isin(dim_typed)
                    & (dsd_prop["comp"] != V.QB_measureType),
                    "comp",
                ]
            )
        )
        # observations of THIS dataset carrying measureType
        ds_obs = set(sub_pairs["obs"]) & set(m_per_obs.index)
        if not ds_obs:
            continue
        obs_f = pd.DataFrame({"obs": sorted(ds_obs)})
        ov = obs_f.merge(
            t[t["pred"].isin(dims)][["subj", "pred", "oterm"]].rename(
                columns={"subj": "obs", "pred": "comp"}
            ),
            on="obs",
        ).drop_duplicates(["obs", "comp", "oterm"])
        full_pivot, odd = _obs_dim_shape(ov, dims)
        # observations with NO dim rows at all never appear in ov — they
        # are "odd" with an empty dim map (compatible with everybody)
        for o in ds_obs - set(full_pivot.index) - set(odd):
            odd[o] = {}

        w = {o: int(m_per_obs.get(o, 0)) for o in ds_obs}
        counts: dict[str, int] = {}
        if len(full_pivot):
            fp = full_pivot[full_pivot.index.isin(ds_obs)]
            gid = fp.groupby(list(fp.columns), dropna=False).ngroup()
            wsum: dict[int, int] = {}
            members: dict[int, list] = {}
            for o, g_ in zip(fp.index, gid.to_numpy()):
                wsum[g_] = wsum.get(g_, 0) + w[o]
                members.setdefault(g_, []).append(o)
            group_vals = {
                g_: {d: {v} for d, v in fp.loc[ms[0]].items() if pd.notna(v)}
                for g_, ms in members.items()
            }
            odd_ds = {o: dv for o, dv in odd.items() if o in ds_obs}
            if len(odd_ds) * max(len(members), 1) > _ODD_OPS_CAP:
                raise RuntimeError("spec IC-17 odd-observation compare exceeded cap")
            for g_, ms in members.items():
                c = wsum[g_]
                for o2, dv2 in odd_ds.items():
                    if _compat(group_vals[g_], dv2, False):
                        c += w[o2]
                for o in ms:
                    counts[o] = c
            for o1, dv1 in odd_ds.items():
                c = 0
                for g_, ms in members.items():
                    if _compat(dv1, group_vals[g_], False):
                        c += wsum[g_]
                for o2, dv2 in odd_ds.items():
                    if _compat(dv1, dv2, False):
                        c += w[o2]
                counts[o1] = c
        else:
            odd_ds = {o: dv for o, dv in odd.items() if o in ds_obs}
            if len(odd_ds) ** 2 > _ODD_OPS_CAP:
                raise RuntimeError("spec IC-17 odd-observation compare exceeded cap")
            for o1, dv1 in odd_ds.items():
                counts[o1] = sum(
                    w[o2] for o2, dv2 in odd_ds.items() if _compat(dv1, dv2, False)
                )
        for o in sorted(ds_obs):
            total = w[o] * counts.get(o, 0)
            if total != nm:
                out.append(
                    ("IC17", _one_term(o), f"count={total}")
                )
                out.append(("IC17", _one_term(o), f"numMeasures={nm}"))
    return out


def _spec_ic19(G, dsof, ds_dsd, dsd_prop, dim_typed, t):
    """IC-19 (:246-263): every (obs, dim, value) binding must be a typed
    skos:Concept in the scheme (branch A) / reachable via skos:member+
    from the collection (branch B)."""
    out = []
    cl = G.node_pairs(V.QB_codeList).rename(columns={"s": "dim", "o": "list"})
    cl = cl[cl["dim"].isin(dim_typed)]
    if not len(cl):
        return out
    schemes = G.typed(V.SKOS_ConceptScheme)
    collections = G.typed(V.SKOS_Collection)
    concepts = G.typed(V.SKOS_Concept)
    concept_terms = {_one_term(c) for c in concepts}

    insch = G.rows(V.SKOS_inScheme)
    in_scheme: dict[str, set] = {}   # list → {member concept terms}
    for s, k, o in zip(insch["subj"], insch["obj_kind"], insch["obj"]):
        if k != KIND_LITERAL:
            in_scheme.setdefault(o, set()).add(_one_term(s))

    member = G.node_pairs(V.SKOS_member)
    madj: dict[str, list] = {}
    for s, o in member.itertuples(index=False):
        madj.setdefault(s, []).append(o)

    def member_closure(lst: str) -> set:
        seen: set = set()
        frontier = list(madj.get(lst, ()))
        while frontier:
            nxt = []
            for n in frontier:
                if n in seen:
                    continue
                seen.add(n)
                nxt.extend(madj.get(n, ()))
            frontier = nxt
        return {_one_term(n) for n in seen}

    ds_dim = ds_dsd.merge(dsd_prop, on="dsd")[["dataset", "comp"]].drop_duplicates()
    dim_lists = ds_dim.merge(cl, left_on="comp", right_on="dim")[
        ["dataset", "dim", "list"]
    ].drop_duplicates()
    if not len(dim_lists):
        return out
    obs_dim = dsof.merge(dim_lists, on="dataset")
    vals = obs_dim.merge(
        t[["subj", "pred", "oterm"]].rename(columns={"subj": "obs", "pred": "dim"}),
        on=["obs", "dim"],
    ).drop_duplicates(["obs", "dim", "list", "oterm"])
    if not len(vals):
        return out
    for lst, sub in vals.groupby("list", sort=False):
        branches = []
        if lst in schemes:
            branches.append(concept_terms & in_scheme.get(lst, set()))
        if lst in collections:
            branches.append(concept_terms & member_closure(lst))
        for valid in branches:
            bad = sub[~sub["oterm"].isin(valid)]
            for o, d in zip(bad["obs"], bad["dim"]):
                out.append(("IC19", _one_term(o), _one_term(d)))
    return out


def _spec_ic20_21(G, dsof, ds_dsd, dsd_prop, dim_typed, t):
    """IC-20/21: two-step (SparqlValidator.java:217-234) — collect the
    GLOBAL pcp sets (IC20A/IC21A), then for EACH pcp run the reachability
    query and union the failures; empty pcp set ⇒ pass (the reference
    returns the empty pcpSet itself)."""
    out = []
    hiers = G.typed(V.QB_HierarchicalCodeList)
    if not hiers:
        return out
    pcp = G.rows(V.QB_parentChildProperty)
    pcp = pcp[pcp["subj"].isin(hiers)]
    direct_ps = sorted(set(pcp.loc[pcp["obj_kind"] == 0, "obj"]))
    inv = G.rows(V.OWL_inverseOf)
    inv_of_bnode = {
        s: o
        for s, k, o in zip(inv["subj"], inv["obj_kind"], inv["obj"])
        if k == 0
    }
    inverse_ps = sorted(
        {
            inv_of_bnode[b]
            for b in pcp.loc[pcp["obj_kind"] == 1, "obj"]
            if b in inv_of_bnode
        }
    )

    cl = G.node_pairs(V.QB_codeList).rename(columns={"s": "dim", "o": "list"})
    cl = cl[cl["dim"].isin(dim_typed) & cl["list"].isin(hiers)]
    if not len(cl):
        return out
    ds_dim = ds_dsd.merge(dsd_prop, on="dsd")[["dataset", "comp"]].drop_duplicates()
    dim_lists = ds_dim.merge(cl, left_on="comp", right_on="dim")[
        ["dataset", "dim", "list"]
    ].drop_duplicates()
    obs_dim = dsof.merge(dim_lists, on="dataset")
    vals = obs_dim.merge(
        t[["subj", "pred", "oterm"]].rename(columns={"subj": "obs", "pred": "dim"}),
        on=["obs", "dim"],
    )[["list", "oterm"]].drop_duplicates()
    if not len(vals):
        return out

    roots = G.rows(V.QB_hierarchyRoot)
    roots_by_list: dict[str, set] = {}
    for s, term in zip(roots["subj"], roots["oterm"]):
        roots_by_list.setdefault(s, set()).add(term)

    def closure(lst: str, p: str, inverse: bool) -> set:
        pr = G.rows(p)
        adj: dict[str, list] = {}
        if inverse:
            # root (^p)* v: step x → y where (y p x)
            for s, term in zip(pr["subj"], pr["oterm"]):
                adj.setdefault(term, []).append(_one_term(s))
        else:
            for s, term in zip(pr["subj"], pr["oterm"]):
                adj.setdefault(_one_term(s), []).append(term)
        seen = set(roots_by_list.get(lst, ()))  # zero hops: roots themselves
        frontier = list(seen)
        while frontier:
            nxt = []
            for n in frontier:
                for m in adj.get(n, ()):
                    if m not in seen:
                        seen.add(m)
                        nxt.append(m)
            frontier = nxt
        return seen

    for ic, ps, inverse in (("IC20", direct_ps, False), ("IC21", inverse_ps, True)):
        for p in ps:
            for lst, sub in vals.groupby("list", sort=False):
                reach = closure(lst, p, inverse)
                for vterm in sub.loc[~sub["oterm"].isin(reach), "oterm"]:
                    out.append((ic, vterm, _one_term(lst)))
    return out


# ---------------------------------------------------------------------------
# Dataset plumbing
# ---------------------------------------------------------------------------


def _findings_arrow(rows: pd.DataFrame) -> pa.Table:
    details = [
        [] if not d else sorted(d.split(_DETAIL_SEP))
        for d in rows["detail"].tolist()
    ]
    return pa.Table.from_arrays(
        [
            pa.array(rows["graph"].tolist(), pa.string()),
            pa.array(rows["file_sha256"].tolist(), pa.string()),
            pa.array(rows["ic"].tolist(), pa.string()),
            pa.array(rows["subject"].tolist(), pa.string()),
            pa.array(details, pa.list_(pa.string())),
        ],
        schema=FINDINGS_SCHEMA,
    )


def _check_frame(df: pd.DataFrame, ics=None) -> pd.DataFrame:
    parts = []
    for (graph, sha), gdf in df.groupby(["graph", "file_sha256"], sort=False):
        f = spec_eval_graph(gdf, ics)
        if len(f):
            f.insert(0, "file_sha256", sha)
            f.insert(0, "graph", graph)
            parts.append(f)
    if not parts:
        return pd.DataFrame(
            columns=["graph", "file_sha256", "ic", "subject", "detail"]
        )
    return pd.concat(parts, ignore_index=True)


class SpecLocalCheck:
    """Zero-shuffle spec validation over file-aligned triple blocks
    (graphs never span blocks on the parse path — pivot.LocalCheck).
    ``ics`` pushes per-IC selection into the kernel (see
    spec_eval_graph)."""

    def __init__(self, ics=None):
        self._ics = None if ics is None else frozenset(ics)

    def __call__(self, batch: pa.Table) -> pa.Table:
        return _findings_arrow(_check_frame(batch.to_pandas(), self._ics))


def spec_findings_shuffle(
    triples, num_buckets: int = 64, max_graph_rows: int = _SPEC_GRAPH_ROWS_CAP,
    ics=None,
):
    """Non-file-aligned inputs: ONE shuffle co-locating whole graphs by
    hash(graph), then the per-graph evaluator per bucket.  Partitioning
    assumption: one graph fits one worker's heap (the spec's pairwise
    IC-12/17 are intra-graph); a graph larger than ``max_graph_rows``
    raises :class:`SpecGraphTooLargeError` loudly instead of OOMing —
    use the NOSPA engine's bucketed pivot for such inputs."""

    def add_kb(df: pd.DataFrame) -> pd.DataFrame:
        df = df.copy()
        if not len(df):
            df["kb"] = pd.Series(dtype="int64")
            return df
        h = pd.util.hash_pandas_object(df["graph"], index=False)
        df["kb"] = (h % num_buckets).astype("int64").to_numpy()
        return df

    def run(df: pd.DataFrame) -> pd.DataFrame:
        sizes = df.groupby("graph", sort=False).size()
        big = sizes[sizes > max_graph_rows]
        if len(big):
            raise SpecGraphTooLargeError(
                f"graph {big.index[0]!r} has {int(big.iloc[0])} triples "
                f"(> {max_graph_rows}); the SPARQL spec engine evaluates "
                "one graph per worker frame — validate this corpus with "
                'create_validator("NOSPA", mode="shuffle") instead'
            )
        return _check_frame(df.drop(columns=["kb"]), ics)

    out = (
        triples.map_batches(add_kb, batch_format="pandas")
        .groupby("kb")
        .map_groups(run, batch_format="pandas")
    )
    return out.map_batches(
        lambda df: _findings_arrow(df), batch_format="pandas"
    )


class SparqlCubeValidator:
    """``create_validator("SPARQL")`` — the independent cross-check
    engine (ValidatorFactory.java:26-53 dispatches "SPARQL" to
    SparqlValidator).  Shares the corpus/normalize/export plumbing with
    the NOSPA engine via composition; only validate_all differs."""

    def __init__(self, *args, spec_max_graph_rows: int | None = None, **kwargs):
        from .validate import CubeValidator

        self._inner = CubeValidator(*args, **kwargs)
        self.mode = self._inner.mode
        self.num_buckets = self._inner.num_buckets
        self._max_graph_rows = spec_max_graph_rows or _SPEC_GRAPH_ROWS_CAP
        self._findings_cache: dict = {}

    # shared surface --------------------------------------------------------
    def normalize(self):
        return self._inner.normalize()

    def normalized_triples(self):
        return self._inner.normalized_triples()

    def export_model(self, out_dir: str, fmt: str = "parquet"):
        # exportModel is engine-independent (SparqlValidator.java:63-74
        # writes the same normalized model)
        return self._inner.export_model(out_dir, fmt)

    # spec validation --------------------------------------------------------
    def _compute(self, ics=None):
        """Findings Dataset for the requested IC subset (None = all),
        cached per subset — the per-IC selection is pushed into the
        kernel (spec_eval_graph) so an IC-10-only run never executes
        the quadratic IC-12 compare."""
        key = None if ics is None else frozenset(ics)
        if key in self._findings_cache:
            return self._findings_cache[key]
        if key is not None and None in self._findings_cache:
            # a materialized ALL-ICs run is a superset of any subset:
            # serve it (validate()'s row filter does the rest) instead
            # of re-running the whole kernel per distinct subset
            return self._findings_cache[None]
        triples = self.normalize()
        if self.mode == "local":
            from .validate import assert_graph_block_alignment

            assert_graph_block_alignment(triples)
            findings = triples.map_batches(
                SpecLocalCheck(key), batch_format="pyarrow", batch_size=None
            )
        else:
            findings = spec_findings_shuffle(
                triples, self._inner._buckets(),
                max_graph_rows=self._max_graph_rows, ics=key,
            )
        self._findings_cache[key] = findings.materialize()
        return self._findings_cache[key]

    def validate_all(self):
        return self._compute(None)

    def validate(self, ics):
        from .validate import ALL_ICS

        ics = set(ics)
        unknown = ics - set(ALL_ICS)
        if unknown:
            raise ValueError(
                f"unknown IC name(s) {sorted(unknown)}; valid: IC1..IC21"
            )
        keep = sorted(ics)
        # the kernel only SKIPS the pairwise ICs; linear kernels still
        # emit non-requested rows, so the output filter stays
        return self._compute(ics).map_batches(
            lambda df, k=keep: df[df["ic"].isin(k)].reset_index(drop=True),
            batch_format="pandas",
        )
    def findings_df(self, ics=None) -> pd.DataFrame:
        src = self.validate_all() if ics is None else self.validate(ics)
        df = src.to_pandas()
        if "detail" not in df.columns:
            return pd.DataFrame(
                columns=["graph", "file_sha256", "ic", "subject", "detail"]
            )
        df["detail"] = df["detail"].map(lambda d: sorted(d))
        return df
