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

import zlib

import pandas as pd
import pyarrow as pa

import ray

from .. import vocab as V
from ..model import KIND_LITERAL
from ..model_terms import iri_of, obj_term, subj_term

ROLE_PROP = 0
ROLE_DS = 1
ROLE_TYPE = 2
ROLE_EXPLINK = 3

_PIVOT_SCHEMA = pa.schema(
    [
        ("bucket", pa.int32()),
        ("graph", pa.string()),
        ("file_sha256", pa.string()),
        ("subj", pa.string()),
        ("role", pa.int8()),
        ("pred", pa.string()),
        ("obj_term", pa.string()),
    ]
)

_OUT_COLUMNS = ["kind", "graph", "file_sha256", "ic", "subject", "detail", "dataset", "key"]

_DETAIL_SEP = "\x1e"


def _bucket(graph: str, subj: str, n: int) -> int:
    return zlib.crc32((graph + "\x00" + subj).encode("utf-8")) % n


class _IndexCache:
    """Per-process cache of the broadcast {graph: GraphIndex} dict."""

    _cached: dict = {}

    @classmethod
    def get(cls, ref):
        key = ref.hex() if hasattr(ref, "hex") else id(ref)
        if key not in cls._cached:
            cls._cached.clear()
            cls._cached[key] = ray.get(ref) if isinstance(ref, ray.ObjectRef) else ref
        return cls._cached[key]


class PivotInputBuilder:
    """Triple batch → pivot rows (Arrow in / Arrow out)."""

    def __init__(self, index_ref, num_buckets: int):
        self.index_ref = index_ref
        self.num_buckets = num_buckets
        self._indexes = None

    def __call__(self, batch: pa.Table) -> pa.Table:
        if self._indexes is None:
            self._indexes = _IndexCache.get(self.index_ref)
        indexes = self._indexes
        nb = self.num_buckets

        out = {k: [] for k in ("bucket", "graph", "file_sha256", "subj", "role", "pred", "obj_term")}

        def emit(g, sha, s, role, pred, oterm):
            out["bucket"].append(_bucket(g, s, nb))
            out["graph"].append(g)
            out["file_sha256"].append(sha)
            out["subj"].append(s)
            out["role"].append(role)
            out["pred"].append(pred)
            out["obj_term"].append(oterm)

        cols = [
            batch.column(c).to_pylist()
            for c in ("graph", "file_sha256", "subj", "pred", "obj_kind", "obj", "obj_dt", "obj_lang")
        ]
        for g, sha, s, p, k, o, dt, lg_ in zip(*cols):
            idx = indexes.get(g)
            if p == V.QB_dataSet:
                dterm = obj_term(k, o, dt, lg_)
                emit(g, sha, s, ROLE_DS, "", dterm)
                emit(g, sha, s, ROLE_TYPE, "", "")  # P1: subj a qb:Observation
                if idx is not None:
                    vals_by_prop = idx.ds_attach.get(dterm)
                    if vals_by_prop:
                        # phase 2a pushdown (Normalizer.java:90-116)
                        for prop, vals in vals_by_prop.items():
                            for v in vals:
                                emit(g, sha, s, ROLE_PROP, prop, v)
            elif p == V.QB_observation:
                if k == KIND_LITERAL:
                    continue
                # P1: objects of qb:observation are typed qb:Observation
                emit(g, sha, o, ROLE_TYPE, "", "")
                if idx is not None:
                    sterm = subj_term(s)
                    for d in idx.slice_datasets.get(sterm, ()):
                        emit(g, sha, o, ROLE_EXPLINK, "", d)  # IC-18 expected link
                    push = idx.slice_push.get(sterm)
                    if push:
                        # phase 2b/2c pushdown (Normalizer.java:121-189)
                        for prop, vals in push.items():
                            for v in vals:
                                emit(g, sha, o, ROLE_PROP, prop, v)
            elif p == V.RDF_type:
                if o == V.QB_Observation and k != KIND_LITERAL:
                    emit(g, sha, s, ROLE_TYPE, "", "")
            elif idx is not None and p in idx.relevant_preds:
                emit(g, sha, s, ROLE_PROP, p, obj_term(k, o, dt, lg_))

        return pa.Table.from_arrays(
            [
                pa.array(out["bucket"], pa.int32()),
                pa.array(out["graph"], pa.string()),
                pa.array(out["file_sha256"], pa.string()),
                pa.array(out["subj"], pa.string()),
                pa.array(out["role"], pa.int8()),
                pa.array(out["pred"], pa.string()),
                pa.array(out["obj_term"], pa.string()),
            ],
            schema=_PIVOT_SCHEMA,
        )


class PivotCheck:
    """Per-bucket evaluation of the per-observation constraints.

    Emits a mixed-kind DataFrame:
      kind 'f'   — finished finding (ic, subject, detail)
      kind 'dup' — IC-12 candidate: key = value-set hash, dataset
      kind 'pt'  — IC-17 point row: key = dim-point, dataset ('w' in detail
                   marks a wildcard obs with a non-single-valued dimension)
      kind 'val' — IC-19/20/21 value flag: subject = value, detail = code lists
      kind 'dss' — dataset seen (IC-2 universe)
    """

    def __init__(self, index_ref):
        self.index_ref = index_ref
        self._indexes = None

    def __call__(self, df: pd.DataFrame) -> pd.DataFrame:
        if self._indexes is None:
            self._indexes = _IndexCache.get(self.index_ref)
        indexes = self._indexes

        out = {k: [] for k in _OUT_COLUMNS}

        def emit(kind, g, sha, ic="", subject="", detail="", dataset="", key=""):
            out["kind"].append(kind)
            out["graph"].append(g)
            out["file_sha256"].append(sha)
            out["ic"].append(ic)
            out["subject"].append(subject)
            out["detail"].append(detail)
            out["dataset"].append(dataset)
            out["key"].append(key)

        seen_ds: set[tuple[str, str]] = set()

        for (g, s), grp in df.groupby(["graph", "subj"], sort=False):
            idx = indexes.get(g)
            sha = grp["file_sha256"].iat[0]
            roles = grp["role"].to_numpy()
            sterm = subj_term(s)

            ds_values = sorted(set(grp["obj_term"][roles == ROLE_DS]))
            is_obs = (roles == ROLE_TYPE).any()
            explinks = set(grp["obj_term"][roles == ROLE_EXPLINK])
            if not is_obs and not explinks and not ds_values:
                continue  # non-observation subject that leaked via a shared pred

            props: dict[str, list[str]] = {}
            pm = roles == ROLE_PROP
            if pm.any():
                for pred, vals in grp[pm].groupby("pred", sort=False)["obj_term"]:
                    props[pred] = sorted(set(vals))

            # IC-1 Unique DataSet (ValidatorIC1.java:24-36)
            if is_obs and len(ds_values) != 1:
                emit("f", g, sha, "IC1", sterm, _DETAIL_SEP.join(ds_values))

            # IC-18 consistent dataset links (ValidatorIC18.java:25-39)
            for d in sorted(explinks):
                if d not in ds_values:
                    emit("f", g, sha, "IC18", sterm, d)

            for d in ds_values:
                seen = (g, d)
                if seen not in seen_ds and not d.startswith('"'):
                    seen_ds.add(seen)
                    emit("dss", g, sha, dataset=d)
                if idx is None:
                    continue

                # IC-11 / IC-12 (ValidatorIC11_12.java:61-85)
                dims = idx.dims_by_ds.get(d)
                if dims is not None:
                    missing = [p for p in dims if p not in props]
                    if missing:
                        emit(
                            "f", g, sha, "IC11", sterm,
                            _DETAIL_SEP.join(f"<{p}>" for p in missing),
                        )
                    else:
                        # unordered set of FIRST values across dims
                        vset = sorted({props[p][0] for p in dims})
                        emit("dup", g, sha, subject=sterm, dataset=d,
                             key=_DETAIL_SEP.join(vset))

                # IC-13 required attributes (ValidatorIC13.java:20-66)
                req = idx.req13_by_ds.get(d)
                if req:
                    missing = [p for p in req if p not in props]
                    if missing:
                        emit("f", g, sha, "IC13", sterm,
                             _DETAIL_SEP.join(f"<{p}>" for p in missing))

                # IC-14 all measures present, incl. measureType quirk
                # (ValidatorIC14.java:21-62)
                req14 = idx.ic14_req_by_ds.get(d)
                if req14:
                    missing = [p for p in req14 if p not in props]
                    if missing:
                        emit("f", g, sha, "IC14", sterm,
                             _DETAIL_SEP.join(f"<{p}>" for p in missing))

                # IC-15/16 measure dimension (ValidatorIC15_16.java:25-70;
                # split by detail-set size — NospaValidator.java:339-347)
                measures = idx.mt_measures_by_ds.get(d)
                if measures is not None:
                    mts = props.get(V.QB_measureType, [])
                    if len(mts) != 1:
                        ic = "IC15" if len(mts) == 1 else "IC16"
                        emit("f", g, sha, ic, sterm, _DETAIL_SEP.join(mts))
                    else:
                        m = mts[0]
                        mprop = iri_of(m)
                        vals = props.get(mprop, []) if mprop else []
                        if m not in measures or len(vals) != 1:
                            emit("f", g, sha, "IC15", sterm, m)

                # IC-17 point rows (ValidatorIC17.java:24-96)
                dims17 = idx.ic17_dims_by_ds.get(d)
                if dims17 is not None and V.QB_measureType in props:
                    point = []
                    wild = False
                    for p in dims17:
                        vals = props.get(p, [])
                        if len(vals) == 1:
                            point.append(p + "=" + vals[0])
                        else:
                            wild = True
                            point.append(p + "=*")
                    emit("pt", g, sha, subject=sterm, dataset=d,
                         key=_DETAIL_SEP.join(point), detail="w" if wild else "")

                # IC-19 codes from code list (ValidatorIC19.java:96-133)
                probes = idx.ic19_by_ds.get(d)
                if probes:
                    for dim_prop, entries in probes.items():
                        vals = props.get(dim_prop, [])
                        if len(vals) != 1:
                            continue
                        v = vals[0]
                        ok_typed = v in idx.concept_typed
                        for is_concept, cls, allowed in entries:
                            if not (v.startswith("<") and ok_typed and v in allowed):
                                emit("val", g, sha, "IC19", v, _DETAIL_SEP.join(cls))

                # IC-20/21 codes from hierarchy (ValidatorIC20_21.java:30-134)
                hprobes = idx.ic2021_by_ds.get(d)
                if hprobes:
                    for dim_prop, (cls, a_dir, a_inv) in hprobes.items():
                        vals = props.get(dim_prop, [])
                        if len(vals) != 1:
                            continue
                        v = vals[0]
                        if v not in a_dir:
                            emit("val", g, sha, "IC20", v, _DETAIL_SEP.join(cls))
                        if v not in a_inv:
                            emit("val", g, sha, "IC21", v, _DETAIL_SEP.join(cls))

        return pd.DataFrame(out, columns=_OUT_COLUMNS)


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
