"""Observation pivot — ONE (graph, subj)-bucketed shuffle amortized across
IC-1, IC-11..IC-18 and the code-list probes of IC-19/20/21.

The reference iterates observations one at a time against in-memory
HashMaps (ValidatorIC11_12.java:61-85 — the >99%-of-runtime hot loop,
README.md:15).  Here:

* ``PivotInputBuilder`` (stateless ``map_batches``) filters the triple
  stream down to observation-relevant rows using the broadcast per-graph
  schema index, applies the phase-2 pushdown emits (Normalizer.java:90-189)
  map-side (the small side — dataset/slice attachment values — rides in
  the broadcast index; the big side — qb:dataSet / qb:observation edges —
  streams), and keys every row with ``bucket = hash(graph, subj) % B``.
* ``groupby("bucket").map_groups(PivotCheck)`` evaluates all per-obs
  checks vectorized-per-bucket and emits findings plus the derived keys
  for the two remaining group stages (IC-12 duplicate value-sets, IC-17
  dimension-point counts) and the value-keyed IC-19/20/21 flags.

Skew: observations of one giant dataset spread uniformly over buckets
because the bucket key includes the observation IRI, not the dataset —
the salting the north rule asks for is built into the key choice.
"""

from __future__ import annotations

import numpy as np
import pandas as pd
import pyarrow as pa

import ray

from .. import vocab as V
from ..model import KIND_LITERAL

ROLE_PROP = 0
ROLE_DS = 1
ROLE_TYPE = 2
ROLE_EXPLINK = 3

# map-side-combined: ONE row per (graph, subj) per input batch, the
# subject's triples packed into parallel lists — the sort then moves
# observation-count rows, not triple-count rows (~9× fewer at reference
# shapes), and graph/sha/subj ship once per subject instead of per triple
_PIVOT_SCHEMA = pa.schema(
    [
        ("bucket", pa.int32()),
        ("graph", pa.string()),
        ("file_sha256", pa.string()),
        ("subj", pa.string()),
        ("roles", pa.list_(pa.int8())),
        ("preds", pa.list_(pa.string())),
        ("oterms", pa.list_(pa.string())),
    ]
)

_OUT_COLUMNS = ["kind", "graph", "file_sha256", "ic", "subject", "detail", "dataset", "key"]

_DETAIL_SEP = "\x1e"


class _IndexCache:
    """Per-process cache of the broadcast {graph: GraphIndex} dict."""

    _cached: dict = {}

    @classmethod
    def get(cls, ref):
        if isinstance(ref, dict):
            # already-resolved indexes (the self-indexing per-block path):
            # pass through — caching by id() would churn the shared cache
            # every block and pin the last block's indexes forever
            return ref
        key = ref.hex() if hasattr(ref, "hex") else id(ref)
        if key not in cls._cached:
            cls._cached.clear()
            cls._cached[key] = ray.get(ref) if isinstance(ref, ray.ObjectRef) else ref
        return cls._cached[key]


def _obj_term_vec(df: pd.DataFrame, dt_render=None) -> np.ndarray:
    """Vectorized term_str over (obj_kind, obj, obj_dt, obj_lang).

    ``dt_render`` (Series -> Series) optionally renders the datatype IRI of
    ``"lex"^^<dt>`` literals (the Turtle writer abbreviates it to a prefixed
    name); default is the canonical ``<dt>`` form — everything else stays
    bit-identical to :func:`model.term_str`."""
    kind = df["obj_kind"].to_numpy()
    o = df["obj"].astype(str)
    out = np.empty(len(df), dtype=object)
    m = kind == 0
    if m.any():
        out[m] = ("<" + o[m] + ">").to_numpy()
    m = kind == 1
    if m.any():
        out[m] = o[m].to_numpy()
    lit = kind == KIND_LITERAL
    if lit.any():
        ol = o[lit]
        # MUST mirror model.term_str exactly: the schema index renders its
        # values with term_str, and any divergence (e.g. a literal with a
        # newline escaped on one side only) splits IC-12/17 keys
        esc = (
            ol.str.contains('"', regex=False)
            | ol.str.contains("\\", regex=False)
            | ol.str.contains("\n", regex=False)
            | ol.str.contains("\r", regex=False)
            | ol.str.contains("\t", regex=False)
            | ol.str.contains("\x1e", regex=False)
        )
        if esc.any():
            ol = ol.where(
                ~esc,
                ol.str.replace("\\", "\\\\", regex=False)
                .str.replace('"', '\\"', regex=False)
                .str.replace("\n", "\\n", regex=False)
                .str.replace("\r", "\\r", regex=False)
                .str.replace("\t", "\\t", regex=False)
                .str.replace("\x1e", "\\u001E", regex=False),
            )
        dt = df["obj_dt"][lit].astype(str)
        lg = df["obj_lang"][lit].astype(str)
        base = '"' + ol + '"'
        dtt = ("<" + dt + ">") if dt_render is None else dt_render(dt)
        out[lit] = np.select(
            [lg.ne("").to_numpy(), dt.ne("").to_numpy()],
            [(base + "@" + lg).to_numpy(), (base + "^^" + dtt).to_numpy()],
            base.to_numpy(),
        )
    return out


class PivotInputBuilder:
    """Triple batch → pivot rows (Arrow in / pandas vector ops / Arrow out).

    Fully vectorized: the broadcast per-graph index is flattened once per
    actor into four small join tables — relevant (graph, pred) pairs, the
    phase-2a dataset-attachment values, the phase-2b/c slice pushdown
    values, and the slice→dataset edges (IC-18) — and each triple batch is
    processed with boolean masks + C-level merges, no per-row Python.
    """

    def __init__(self, index_ref, num_buckets: int):
        self.index_ref = index_ref
        self.num_buckets = num_buckets
        self._indexes = None
        self._tables = None

    def _ensure_tables(self):
        if self._tables is not None:
            return
        rel, attach, push, sdv = [], [], [], []
        for g, idx in self._indexes.items():
            rel.extend((g, p) for p in idx.relevant_preds)
            for dterm, by_prop in idx.ds_attach.items():
                attach.extend(
                    (g, dterm, prop, v) for prop, vs in by_prop.items() for v in vs
                )
            for sterm, by_prop in idx.slice_push.items():
                push.extend(
                    (g, sterm, prop, v) for prop, vs in by_prop.items() for v in vs
                )
            for sterm, dss in idx.slice_datasets.items():
                sdv.extend((g, sterm, d) for d in dss)
        self._tables = {
            "rel": pd.DataFrame(rel, columns=["graph", "pred"]),
            "attach": pd.DataFrame(
                attach, columns=["graph", "obj_term", "pred_out", "val"]
            ),
            "push": pd.DataFrame(push, columns=["graph", "sterm", "pred_out", "val"]),
            "sdv": pd.DataFrame(sdv, columns=["graph", "sterm", "dsterm"]),
        }

    def __call__(self, batch: pa.Table) -> pa.Table:
        if self._indexes is None:
            self._indexes = _IndexCache.get(self.index_ref)
        self._ensure_tables()
        tabs = self._tables
        df = batch.to_pandas()
        pred = df["pred"]
        kind = df["obj_kind"].to_numpy()
        parts: list[pd.DataFrame] = []

        def mk(g, sha, subj, role, pred_out, oterm):
            return pd.DataFrame(
                {
                    "graph": g,
                    "file_sha256": sha,
                    "subj": subj,
                    "role": role,
                    "pred": pred_out,
                    "obj_term": oterm,
                }
            )

        # qb:dataSet edges → DS + TYPE rows + phase-2a attachment pushdown
        dsm = (pred == V.QB_dataSet).to_numpy()
        if dsm.any():
            d = df[dsm]
            dterm = _obj_term_vec(d)
            parts.append(mk(d["graph"], d["file_sha256"], d["subj"], ROLE_DS, "", dterm))
            parts.append(mk(d["graph"], d["file_sha256"], d["subj"], ROLE_TYPE, "", ""))
            if len(tabs["attach"]):
                j = pd.DataFrame(
                    {
                        "graph": d["graph"].to_numpy(),
                        "file_sha256": d["file_sha256"].to_numpy(),
                        "subj": d["subj"].to_numpy(),
                        "obj_term": dterm,
                    }
                ).merge(tabs["attach"], on=["graph", "obj_term"])
                if len(j):
                    parts.append(
                        mk(j["graph"], j["file_sha256"], j["subj"], ROLE_PROP,
                           j["pred_out"], j["val"])
                    )

        # qb:observation edges → TYPE for the obs + IC-18 links + phase-2b/c
        obm = ((pred == V.QB_observation).to_numpy()) & (kind != KIND_LITERAL)
        if obm.any():
            d = df[obm]
            parts.append(mk(d["graph"], d["file_sha256"], d["obj"], ROLE_TYPE, "", ""))
            if len(tabs["sdv"]) or len(tabs["push"]):
                sterm = pd.Series(
                    np.where(
                        d["subj"].str.startswith("_:"), d["subj"], "<" + d["subj"] + ">"
                    ),
                    index=d.index,
                )
                base = pd.DataFrame(
                    {
                        "graph": d["graph"].to_numpy(),
                        "file_sha256": d["file_sha256"].to_numpy(),
                        "obs": d["obj"].to_numpy(),
                        "sterm": sterm.to_numpy(),
                    }
                )
                if len(tabs["sdv"]):
                    j = base.merge(tabs["sdv"], on=["graph", "sterm"])
                    if len(j):
                        parts.append(
                            mk(j["graph"], j["file_sha256"], j["obs"], ROLE_EXPLINK,
                               "", j["dsterm"])
                        )
                if len(tabs["push"]):
                    j = base.merge(tabs["push"], on=["graph", "sterm"])
                    if len(j):
                        parts.append(
                            mk(j["graph"], j["file_sha256"], j["obs"], ROLE_PROP,
                               j["pred_out"], j["val"])
                        )

        # explicit rdf:type qb:Observation
        tym = (
            (pred == V.RDF_type).to_numpy()
            & (df["obj"] == V.QB_Observation).to_numpy()
            & (kind != KIND_LITERAL)
        )
        if tym.any():
            d = df[tym]
            parts.append(mk(d["graph"], d["file_sha256"], d["subj"], ROLE_TYPE, "", ""))

        # schema-relevant property values (per-graph predicate sets).
        # NOT masked by dsm/obm: a (pathological) DSD may declare
        # qb:dataSet / qb:observation themselves as components, and the
        # reference would still see those triples as property values
        if len(tabs["rel"]):
            d = df.merge(tabs["rel"], on=["graph", "pred"])
            if len(d):
                parts.append(
                    mk(d["graph"], d["file_sha256"], d["subj"], ROLE_PROP,
                       d["pred"], _obj_term_vec(d))
                )

        if parts:
            out = pd.concat(parts, ignore_index=True)
        else:
            out = pd.DataFrame(
                columns=["graph", "file_sha256", "subj", "role", "pred", "obj_term"]
            )
        # map-side combine: sort the batch's rows by (graph, subj), emit
        # ONE packed row per subject — graph / sha / subj amortize over
        # the subject's triples and the shuffle moves ~9× fewer rows
        out = out.sort_values(["graph", "subj"], kind="stable", ignore_index=True)
        g = out["graph"].to_numpy()
        sj = out["subj"].to_numpy()
        if len(out):
            starts = np.flatnonzero(
                np.r_[True, (g[1:] != g[:-1]) | (sj[1:] != sj[:-1])]
            )
        else:
            starts = np.array([], dtype=np.int64)
        offsets = pa.array(
            np.r_[starts, len(out)].astype(np.int32), pa.int32()
        )
        graph_u = g[starts]
        subj_u = sj[starts]
        sha_u = out["file_sha256"].to_numpy()[starts]
        h = pd.util.hash_pandas_object(
            pd.Series(graph_u, dtype=object).astype(str)
            + "\x00"
            + pd.Series(subj_u, dtype=object).astype(str),
            index=False,
        ).to_numpy()
        return pa.Table.from_arrays(
            [
                pa.array((h % self.num_buckets).astype(np.int32), pa.int32()),
                pa.array(graph_u, pa.string()),
                pa.array(sha_u, pa.string()),
                pa.array(subj_u, pa.string()),
                pa.ListArray.from_arrays(
                    offsets, pa.array(out["role"].to_numpy(), pa.int8())
                ),
                pa.ListArray.from_arrays(
                    offsets, pa.array(out["pred"], pa.string())
                ),
                pa.ListArray.from_arrays(
                    offsets, pa.array(out["obj_term"], pa.string())
                ),
            ],
            schema=_PIVOT_SCHEMA,
        )


def _sterm_series(s: pd.Series) -> pd.Series:
    """Vectorized subj_term: wrap IRIs in <>, keep bnode ids."""
    is_b = s.str.startswith("_:")
    return np.where(is_b, s, "<" + s + ">")


class PivotCheck:
    """Per-bucket evaluation of the per-observation constraints.

    Emits a mixed-kind DataFrame:
      kind 'f'   — finished finding (ic, subject, detail)
      kind 'dup' — IC-12 candidate: key = value-set hash, dataset
      kind 'pt'  — IC-17 point row: key = dim-point, dataset ('w' in detail
                   marks a wildcard obs with a non-single-valued dimension)
      kind 'val' — IC-19/20/21 value flag: subject = value, detail = code lists
      kind 'dss' — dataset seen (IC-2 universe)

    The hot path (IC-1/11/12/13/14/18 — everything a plain cube exercises)
    is fully vectorized: per-dataset requirement tables are flattened from
    the broadcast index once per actor, then evaluated with pandas joins /
    group transforms over the whole bucket.  The reference's one-obs-at-a-
    time HashMap loop (ValidatorIC11_12.java:61-85) survives only as the
    fallback for datasets with measureType / code-list / hierarchy probes
    (schema-gated, observation cohorts restricted to those datasets).

    IC-12's duplicate key is the *unordered set* of first dimension values
    (ValidatorIC11_12.java:70-80): value terms are deduplicated per
    observation, hashed (deterministic 64-bit), and combined with an
    order-insensitive wrapping sum + count — equality of (sum, count) is
    the shuffle key downstream.
    """

    def __init__(self, index_ref):
        self.index_ref = index_ref
        self._indexes = None
        self._req = None          # flattened requirement tables
        self._special = None      # {(graph, dataset)} needing the slow path
        self._slow = None

    # -- per-actor flattening of the broadcast index --------------------

    def _ensure_tables(self):
        if self._req is not None:
            return
        indexes = self._indexes
        dims, req13, req14 = [], [], []
        mt_ds, mtm, ic17d, ic17ds = [], [], [], []
        ic19m, ic19a, ctyped = [], [], []
        hmeta, hdir, hinv = [], [], []
        special = set()
        probe_id = 0
        for g, idx in indexes.items():
            for d, ps in idx.dims_by_ds.items():
                dims.extend((g, d, p, i) for i, p in enumerate(ps))
            for d, ps in idx.req13_by_ds.items():
                req13.extend((g, d, p, i) for i, p in enumerate(ps))
            for d, ps in idx.ic14_req_by_ds.items():
                req14.extend((g, d, p, i) for i, p in enumerate(ps))
            for d, measures in idx.mt_measures_by_ds.items():
                special.add((g, d))
                mt_ds.append((g, d))
                mtm.extend((g, d, m) for m in measures)
            for d, ps in idx.ic17_dims_by_ds.items():
                ic17ds.append((g, d))
                ic17d.extend((g, d, p, i) for i, p in enumerate(ps))
            for d, probes in idx.ic19_by_ds.items():
                special.add((g, d))
                for dim_prop, entries in probes.items():
                    for _is_concept, cls, allowed in entries:
                        ic19m.append(
                            (g, d, dim_prop, probe_id, _DETAIL_SEP.join(cls))
                        )
                        ic19a.extend((probe_id, v) for v in allowed)
                        probe_id += 1
            ctyped.extend((g, v) for v in idx.concept_typed)
            for d, probes in idx.ic2021_by_ds.items():
                special.add((g, d))
                for dim_prop, (cls, a_dir, a_inv) in probes.items():
                    hmeta.append((g, d, dim_prop, _DETAIL_SEP.join(cls)))
                    hdir.extend((g, d, dim_prop, v) for v in a_dir)
                    hinv.extend((g, d, dim_prop, v) for v in a_inv)
        cols = ["graph", "dataset", "pred", "ord"]
        self._req = {
            "dims": pd.DataFrame(dims, columns=cols),
            "req13": pd.DataFrame(req13, columns=cols),
            "req14": pd.DataFrame(req14, columns=cols),
            "mt_ds": pd.DataFrame(mt_ds, columns=["graph", "dataset"]),
            "mtm": pd.DataFrame(mtm, columns=["graph", "dataset", "measure"]),
            "ic17d": pd.DataFrame(ic17d, columns=cols),
            "ic17ds": pd.DataFrame(ic17ds, columns=["graph", "dataset"]),
            "ic19m": pd.DataFrame(
                ic19m, columns=["graph", "dataset", "dim_prop", "probe_id", "cls"]
            ),
            "ic19a": pd.DataFrame(ic19a, columns=["probe_id", "av"]),
            "ctyped": pd.DataFrame(ctyped, columns=["graph", "tv"]),
            "hmeta": pd.DataFrame(
                hmeta, columns=["graph", "dataset", "dim_prop", "cls"]
            ),
            "hdir": pd.DataFrame(hdir, columns=["graph", "dataset", "dim_prop", "dv"]),
            "hinv": pd.DataFrame(hinv, columns=["graph", "dataset", "dim_prop", "iv"]),
        }
        self._special = special

    def __call__(self, df: pd.DataFrame) -> pd.DataFrame:
        if self._indexes is None:
            self._indexes = _IndexCache.get(self.index_ref)
        self._ensure_tables()
        parts: list[pd.DataFrame] = []

        def fdf(graph, sha, ic, subject, detail, dataset="", key="", kind="f"):
            return pd.DataFrame(
                {
                    "kind": kind,
                    "graph": graph,
                    "file_sha256": sha,
                    "ic": ic,
                    "subject": subject,
                    "detail": detail,
                    "dataset": dataset,
                    "key": key,
                },
                columns=_OUT_COLUMNS,
            )

        # unpack the map-side-combined rows: one packed row per
        # (graph, subj) per input batch → the flat per-triple frame the
        # vectorized checks below operate on (np.repeat for the packed
        # scalars, one concatenate per list column)
        lens = np.fromiter(
            (len(r) for r in df["roles"]), dtype=np.int64, count=len(df)
        )
        df = pd.DataFrame(
            {
                "graph": np.repeat(df["graph"].to_numpy(), lens),
                "file_sha256": np.repeat(df["file_sha256"].to_numpy(), lens),
                "subj": np.repeat(df["subj"].to_numpy(), lens),
                "role": (
                    np.concatenate([np.asarray(r) for r in df["roles"]])
                    if len(df)
                    else np.array([], dtype=np.int8)
                ),
                "pred": (
                    np.concatenate(
                        [np.asarray(r, dtype=object) for r in df["preds"]]
                    )
                    if len(df)
                    else np.array([], dtype=object)
                ),
                "obj_term": (
                    np.concatenate(
                        [np.asarray(r, dtype=object) for r in df["oterms"]]
                    )
                    if len(df)
                    else np.array([], dtype=object)
                ),
            }
        )
        roles = df["role"].to_numpy()
        sha_by_graph = (
            df[["graph", "file_sha256"]]
            .drop_duplicates("graph")
            .set_index("graph")["file_sha256"]
        )
        # composite int64 (graph, subj) key: every hot merge / groupby /
        # sort runs on ONE integer column instead of two object columns
        # (string factorization inside pandas merges was ~half the stage)
        g_codes, _gu = pd.factorize(df["graph"])
        s_codes, _su = pd.factorize(df["subj"])
        if len(_gu) < (1 << 23) and len(_su) < (1 << 40):
            df = df.assign(
                _gs=(g_codes.astype("int64") << 40) | s_codes.astype("int64")
            )
        else:
            # composite would wrap int64 and silently fuse unrelated
            # (graph, subj) cohorts — fall back to a combined-key factorize
            # (slower, only ever reached when ONE bucket frame holds ≥ 2^23
            # distinct graphs)
            comb, _ = pd.factorize(
                df["graph"].astype(str) + "\x1f" + df["subj"].astype(str)
            )
            df = df.assign(_gs=comb.astype("int64"))
        lookup = df.drop_duplicates("_gs")[["_gs", "graph", "subj"]]

        ds_pairs = df.loc[
            roles == ROLE_DS, ["_gs", "graph", "subj", "obj_term"]
        ].drop_duplicates(["_gs", "obj_term"])
        typed = df.loc[roles == ROLE_TYPE, ["_gs", "graph", "subj"]].drop_duplicates("_gs")
        expl = df.loc[
            roles == ROLE_EXPLINK, ["_gs", "graph", "subj", "obj_term"]
        ].drop_duplicates(["_gs", "obj_term"])
        prop = df.loc[
            roles == ROLE_PROP, ["_gs", "graph", "subj", "pred", "obj_term"]
        ].drop_duplicates(["_gs", "pred", "obj_term"])

        # -- IC-1 unique dataset (ValidatorIC1.java:24-36) ---------------
        cnt = ds_pairs.groupby("_gs", sort=False).size()
        multi = cnt[cnt > 1]
        if len(multi):
            m = ds_pairs[ds_pairs["_gs"].isin(multi.index)].sort_values(
                ["_gs", "obj_term"]
            )
            det = m.groupby(["_gs", "graph", "subj"], sort=False)["obj_term"].agg(
                _DETAIL_SEP.join
            ).reset_index()
            parts.append(
                fdf(
                    det["graph"],
                    det["graph"].map(sha_by_graph),
                    "IC1",
                    _sterm_series(det["subj"]),
                    det["obj_term"],
                )
            )
        zero = typed.merge(
            ds_pairs[["_gs"]].drop_duplicates(),
            on="_gs", how="left", indicator=True,
        )
        zero = zero[zero["_merge"] == "left_only"]
        if len(zero):
            parts.append(
                fdf(
                    zero["graph"],
                    zero["graph"].map(sha_by_graph),
                    "IC1",
                    _sterm_series(zero["subj"]),
                    "",
                )
            )

        # -- IC-18 consistent links (ValidatorIC18.java:25-39) -----------
        if len(expl):
            miss = expl.merge(
                ds_pairs[["_gs", "obj_term"]],
                on=["_gs", "obj_term"], how="left", indicator=True,
            )
            miss = miss[miss["_merge"] == "left_only"].sort_values(
                ["_gs", "obj_term"]
            )
            if len(miss):
                parts.append(
                    fdf(
                        miss["graph"],
                        miss["graph"].map(sha_by_graph),
                        "IC18",
                        _sterm_series(miss["subj"]),
                        miss["obj_term"],
                    )
                )

        # -- dataset universe for IC-2 -----------------------------------
        dss = ds_pairs[~ds_pairs["obj_term"].str.startswith('"')][
            ["graph", "obj_term"]
        ].drop_duplicates()
        if len(dss):
            parts.append(
                fdf(
                    dss["graph"],
                    dss["graph"].map(sha_by_graph),
                    "", "", "",
                    dataset=dss["obj_term"],
                    kind="dss",
                )
            )

        # -- per-dataset requirement checks ------------------------------
        # cohort = (gs, graph, subj, dataset) via qb:dataSet edges
        cohort = ds_pairs.rename(columns={"obj_term": "dataset"})
        present = prop[["_gs", "pred"]].drop_duplicates()

        def missing_findings(req: pd.DataFrame, ic: str):
            """Anti-join (cohort × required preds) against present props,
            emit one finding per (subj, dataset) with ord-ordered detail."""
            rp = cohort.merge(req, on=["graph", "dataset"])
            if not len(rp):
                return None, None
            hit = rp.merge(present, on=["_gs", "pred"], how="left", indicator=True)
            miss = hit[hit["_merge"] == "left_only"]
            out = None
            if len(miss):
                miss = miss.sort_values(["_gs", "dataset", "ord"])
                agg = (
                    miss.groupby(["_gs", "dataset"], sort=False)["pred"]
                    .agg(lambda p: _DETAIL_SEP.join(f"<{x}>" for x in p))
                    .reset_index()
                    .merge(lookup, on="_gs")
                )
                out = fdf(
                    agg["graph"],
                    agg["graph"].map(sha_by_graph),
                    ic,
                    _sterm_series(agg["subj"]),
                    agg["pred"],
                    dataset=agg["dataset"],
                )
            return out, miss[["_gs", "dataset"]].drop_duplicates()

        f11, miss11 = missing_findings(self._req["dims"], "IC11")
        if f11 is not None:
            parts.append(f11)
        f13, _ = missing_findings(self._req["req13"], "IC13")
        if f13 is not None:
            parts.append(f13)
        f14, _ = missing_findings(self._req["req14"], "IC14")
        if f14 is not None:
            parts.append(f14)

        # -- IC-12 duplicate value-set keys ------------------------------
        rp = cohort.merge(self._req["dims"], on=["graph", "dataset"])
        if len(rp):
            if miss11 is not None and len(miss11):
                rp = rp.merge(
                    miss11, on=["_gs", "dataset"], how="left", indicator=True
                )
                rp = rp[rp["_merge"] == "left_only"].drop(columns="_merge")
        if len(rp):
            firsts = rp.merge(prop[["_gs", "pred", "obj_term"]], on=["_gs", "pred"])
            # first value = min term per (obs, dim): sort + C-level dedup
            firsts = firsts.sort_values(
                ["_gs", "dataset", "pred", "obj_term"]
            ).drop_duplicates(["_gs", "dataset", "pred"])
            vals = firsts[["_gs", "dataset", "obj_term"]].drop_duplicates()
            h = pd.util.hash_pandas_object(vals["obj_term"], index=False)
            vals = vals.assign(_h=h.to_numpy())
            agg = vals.groupby(["_gs", "dataset"], sort=False)["_h"].agg(
                ["sum", "size"]
            ).reset_index().merge(lookup, on="_gs")
            key = agg["sum"].astype("uint64").astype(str) + ":" + agg["size"].astype(str)
            parts.append(
                fdf(
                    agg["graph"],
                    agg["graph"].map(sha_by_graph),
                    "",
                    _sterm_series(agg["subj"]),
                    "",
                    dataset=agg["dataset"],
                    key=key,
                    kind="dup",
                )
            )

        # -- measureType / code-list / hierarchy datasets (IC-15..21) ----
        if self._special:
            sp = cohort[
                pd.MultiIndex.from_frame(cohort[["graph", "dataset"]]).isin(
                    self._special
                )
            ]
            if len(sp):
                parts.extend(
                    self._special_checks(sp, prop, sha_by_graph, fdf, lookup)
                )

        # -- IC-17 point rows (ValidatorIC17.java:28-96) ------------------
        # EVERY dataset with a DSD participates; observations are filtered
        # to those CARRYING a qb:measureType property (obsWithMeasure in
        # the reference) — not to datasets declaring it as a component.
        # Entries join dim and value with \x1f (never raw in rendered
        # terms) so the wildcard fallback can reparse the point even when
        # a dim IRI contains '='.
        if len(self._req["ic17ds"]):
            mt_obs = prop.loc[
                prop["pred"] == V.QB_measureType, ["_gs"]
            ].drop_duplicates()
            if len(mt_obs):
                base = cohort.merge(
                    self._req["ic17ds"], on=["graph", "dataset"]
                ).merge(mt_obs, on="_gs")
                if len(base):
                    pvb = prop.merge(base[["_gs"]].drop_duplicates(), on="_gs")
                    pvb = pvb.sort_values(["_gs", "pred", "obj_term"])
                    g2 = pvb.groupby(["_gs", "pred"], sort=False)
                    fv = pvb.drop_duplicates(["_gs", "pred"]).copy()
                    fv["cnt"] = g2.size().to_numpy()
                    pts = base.merge(
                        self._req["ic17d"], on=["graph", "dataset"], how="left"
                    )
                    res_frames = []
                    with_d = pts[pts["pred"].notna()]
                    if len(with_d):
                        wd = with_d.merge(
                            fv[["_gs", "pred", "obj_term", "cnt"]],
                            on=["_gs", "pred"], how="left",
                        )
                        one = wd["cnt"].fillna(0).eq(1)
                        wd["_e"] = np.where(
                            one,
                            wd["pred"] + "\x1f" + wd["obj_term"].fillna(""),
                            wd["pred"] + "\x1f*",
                        )
                        wd["_w"] = ~one
                        wd = wd.sort_values(["_gs", "dataset", "ord"])
                        gb = wd.groupby(["_gs", "dataset"], sort=False)
                        res_frames.append(
                            gb.agg(key=("_e", _DETAIL_SEP.join), wild=("_w", "max"))
                            .reset_index().merge(lookup, on="_gs")
                        )
                    no_d = pts[pts["pred"].isna()]
                    if len(no_d):
                        # no declared non-measureType dims: every obs pair
                        # compares equal (empty dim loop) — one empty-key
                        # point per observation
                        res_frames.append(
                            no_d[["_gs", "dataset"]].drop_duplicates()
                            .assign(key="", wild=False).merge(lookup, on="_gs")
                        )
                    for res in res_frames:
                        parts.append(
                            fdf(res["graph"], res["graph"].map(sha_by_graph), "",
                                _sterm_series(res["subj"]),
                                np.where(res["wild"], "w", ""),
                                dataset=res["dataset"], key=res["key"],
                                kind="pt")
                        )

        if not parts:
            return pd.DataFrame(
                {k: pd.Series(dtype=object) for k in _OUT_COLUMNS},
                columns=_OUT_COLUMNS,
            )
        out = pd.concat(parts, ignore_index=True)
        out["detail"] = out["detail"].fillna("")
        return out[_OUT_COLUMNS]


    # -- vectorized IC-15..21 (measureType / code-list / hierarchy) ------

    def _special_checks(self, sp, prop, sha_by_graph, fdf, lookup):
        """All remaining per-observation checks as C-level joins against
        the flattened probe tables (the reference's one-obs-at-a-time
        HashMap loops, ValidatorIC15_16/17/19/20_21).  ``sp`` is the
        (gs, graph, subj, dataset) cohort restricted to special datasets."""
        out = []
        keys = sp[["_gs"]].drop_duplicates()
        pv = prop.merge(keys, on="_gs")
        # per (obs, pred) value stats: first (min) value + count
        pv = pv.sort_values(["_gs", "pred", "obj_term"])
        grp = pv.groupby(["_gs", "pred"], sort=False)
        firstv = pv.drop_duplicates(["_gs", "pred"]).copy()
        firstv["cnt"] = grp.size().to_numpy()

        def sha(frame):
            return frame["graph"].map(sha_by_graph)

        # IC-15/16 measure dimension (ValidatorIC15_16.java:25-70; split by
        # detail-set size — NospaValidator.java:339-347)
        if len(self._req["mt_ds"]):
            mtc = sp.merge(self._req["mt_ds"], on=["graph", "dataset"])
            mtv = firstv[firstv["pred"] == V.QB_measureType]
            j = mtc.merge(
                mtv[["_gs", "obj_term", "cnt"]], on="_gs", how="left"
            )
            cnt = j["cnt"].fillna(0).astype("int64")
            multi = j[cnt != 1]
            if len(multi):
                det = (
                    pv[pv["pred"] == V.QB_measureType]
                    .groupby("_gs", sort=False)["obj_term"]
                    .agg(_DETAIL_SEP.join)
                )
                dvals = multi["_gs"].map(det)
                out.append(
                    fdf(multi["graph"], sha(multi), "IC16",
                        _sterm_series(multi["subj"]),
                        dvals.fillna(""))
                )
            single = j[cnt == 1].copy()
            if len(single):
                m = single["obj_term"]
                is_iri = m.str.startswith("<")
                single["mprop"] = m.str.slice(1, -1).where(is_iri, "\x00none")
                single = single.merge(
                    self._req["mtm"].assign(_in=True),
                    left_on=["graph", "dataset", "obj_term"],
                    right_on=["graph", "dataset", "measure"], how="left",
                )
                vc = firstv[["_gs", "pred", "cnt"]].rename(
                    columns={"pred": "mprop", "cnt": "cnt2"}
                )
                single = single.merge(vc, on=["_gs", "mprop"], how="left")
                viol = single[
                    single["_in"].isna() | (single["cnt2"].fillna(0) != 1)
                ]
                if len(viol):
                    out.append(
                        fdf(viol["graph"], sha(viol), "IC15",
                            _sterm_series(viol["subj"]), viol["obj_term"])
                    )

        # single-valued dimension values (shared by IC-19/20/21 probes)
        v1 = firstv[firstv["cnt"] == 1][
            ["_gs", "pred", "obj_term"]
        ].rename(columns={"pred": "dim_prop", "obj_term": "v"})

        # IC-19 codes from code list (ValidatorIC19.java:96-133)
        if len(self._req["ic19m"]):
            pr = sp.merge(self._req["ic19m"], on=["graph", "dataset"])
            j = pr.merge(v1, on=["_gs", "dim_prop"])
            if len(j):
                j = j.merge(
                    self._req["ctyped"].assign(_t=True),
                    left_on=["graph", "v"], right_on=["graph", "tv"], how="left",
                )
                j = j.merge(
                    self._req["ic19a"].assign(_a=True),
                    left_on=["probe_id", "v"], right_on=["probe_id", "av"],
                    how="left",
                )
                viol = j[
                    ~(
                        j["v"].str.startswith("<")
                        & j["_t"].notna()
                        & j["_a"].notna()
                    )
                ]
                if len(viol):
                    out.append(
                        fdf(viol["graph"], sha(viol), "IC19", viol["v"],
                            viol["cls"], kind="val")
                    )

        # IC-20/21 codes from hierarchy (ValidatorIC20_21.java:30-134)
        if len(self._req["hmeta"]):
            pr = sp.merge(self._req["hmeta"], on=["graph", "dataset"])
            j = pr.merge(v1, on=["_gs", "dim_prop"])
            if len(j):
                j = j.merge(
                    self._req["hdir"].assign(_d=True),
                    left_on=["graph", "dataset", "dim_prop", "v"],
                    right_on=["graph", "dataset", "dim_prop", "dv"], how="left",
                )
                j = j.merge(
                    self._req["hinv"].assign(_i=True),
                    left_on=["graph", "dataset", "dim_prop", "v"],
                    right_on=["graph", "dataset", "dim_prop", "iv"], how="left",
                )
                v20 = j[j["_d"].isna()]
                if len(v20):
                    out.append(
                        fdf(v20["graph"], sha(v20), "IC20", v20["v"],
                            v20["cls"], kind="val")
                    )
                v21 = j[j["_i"].isna()]
                if len(v21):
                    out.append(
                        fdf(v21["graph"], sha(v21), "IC21", v21["v"],
                            v21["cls"], kind="val")
                    )
        return out


class LocalCheck:
    """Zero-shuffle per-observation validation (the common case).

    A graph (= one source file) never spans triple blocks: the parser
    emits one file per batch and phase-1 / materialize preserve blocks, so
    every second-stage group key — IC-12's (dataset, value-set), IC-17's
    (dataset, dim-point), IC-19/20/21's value, IC-2's dataset — is local
    to the block.  One ``map_batches(LocalCheck, batch_size=None)`` call
    therefore replaces the pivot shuffle *and* both finalize shuffles.
    Files whose triples exceed one block (~128 MB Arrow) must use the
    bucketed shuffle path (CubeValidator(mode="shuffle")) instead.
    """

    def __init__(self, index_ref):
        # index_ref=None → SELF-INDEXING: the block builds the schema
        # indexes for its own graphs (schema subgraphs never cross a file),
        # so NOTHING is broadcast — state scales with the block, not the
        # corpus.  With a ref, the (bounded) broadcast index is used.
        self.index_ref = index_ref
        self._indexes = None
        self._builder = None
        self._check = None

    def __call__(self, batch: pa.Table) -> pa.Table:
        from ..checks.finalize import (
            ic2_typed_findings,
            local_finalize,
            schema_findings_df,
        )
        from ..model import FINDINGS_SCHEMA

        if self.index_ref is not None:
            if self._indexes is None:
                self._indexes = _IndexCache.get(self.index_ref)
                self._builder = PivotInputBuilder(self._indexes, 1)
                self._check = PivotCheck(self._indexes)
            indexes = self._indexes
            # schema-only ICs still come from THIS block's graphs (each
            # graph lives in exactly one block on the local path, so no
            # duplication) — a broadcast index must not silently drop
            # IC-3..IC-10 and typed-IC-2 findings
            import pyarrow.compute as pc

            graphs = set(pc.unique(batch.column("graph")).to_pylist())
            blk = {g: idx for g, idx in indexes.items() if g in graphs}
            schema_parts = [schema_findings_df(blk), ic2_typed_findings(blk)]
        else:
            from .schema_index import extract_indexes_from_batch

            indexes = extract_indexes_from_batch(batch)
            # schema-only ICs (3..10) + the typed half of IC-2, emitted
            # right here — the driver does nothing per graph
            schema_parts = [
                schema_findings_df(indexes),
                ic2_typed_findings(indexes),
            ]
        if self._builder is not None:
            rows = self._builder(batch).to_pandas()
            out = self._check(rows)
        else:
            rows = PivotInputBuilder(indexes, 1)(batch).to_pandas()
            out = PivotCheck(indexes)(rows)
        f = local_finalize(out, indexes)
        if schema_parts:
            f = pd.concat(schema_parts + [f], ignore_index=True)
        details = [
            [] if not d else d.split(_DETAIL_SEP) for d in f["detail"].tolist()
        ]
        return pa.Table.from_arrays(
            [
                pa.array(f["graph"].tolist(), pa.string()),
                pa.array(f["file_sha256"].tolist(), pa.string()),
                pa.array(f["ic"].tolist(), pa.string()),
                pa.array(f["subject"].tolist(), pa.string()),
                pa.array(details, pa.list_(pa.string())),
            ],
            schema=FINDINGS_SCHEMA,
        )


_LOCAL_CHECK_CACHE: dict = {}


def local_findings(triples, index_ref=None):
    """triples → findings Dataset with no shuffle at all.

    Task-based (not an actor pool): tasks fan out to every core instantly
    with no pool ramp-up.  Default (index_ref=None) is the self-indexing
    form — no broadcast state at all; pass a broadcast index ref to reuse
    a precomputed one."""

    if index_ref is None:
        lc = LocalCheck(None)
        return triples.map_batches(lc, batch_format="pyarrow", batch_size=None)

    def check_block(batch: pa.Table) -> pa.Table:
        key = index_ref.hex() if hasattr(index_ref, "hex") else id(index_ref)
        lc = _LOCAL_CHECK_CACHE.get(key)
        if lc is None:
            _LOCAL_CHECK_CACHE.clear()
            _LOCAL_CHECK_CACHE[key] = lc = LocalCheck(index_ref)
        return lc(batch)

    return triples.map_batches(
        check_block, batch_format="pyarrow", batch_size=None
    )


def build_pivot_rows(triples, index_ref, num_buckets: int):
    return triples.map_batches(
        PivotInputBuilder(index_ref, num_buckets), batch_format="pyarrow"
    )


def run_pivot(triples, index_ref, num_buckets: int):
    rows = build_pivot_rows(triples, index_ref, num_buckets)
    check = PivotCheck(index_ref)

    def pivot_check(df: pd.DataFrame) -> pd.DataFrame:
        return check(df)

    return rows.groupby("bucket").map_groups(pivot_check, batch_format="pandas")
