"""Normalization phase 1 — type & property closure as a streaming transform.

The reference's ``normalizePhase1`` (Normalizer.java:23-72) is six
single-triple-pattern rules, each reading ONE triple and adding 1-2 derived
triples.  That is an embarrassingly parallel per-batch emit: no shuffle, no
state.  The derived triples may duplicate existing ones; the engine keeps
*set semantics* downstream (all aggregations count distinct terms), so no
global dedup shuffle is needed on the hot path — exact dedup happens only
in the (optional) normalized-model export.

Quirk preserved: the reference calls ``.asResource()`` on qb:slice objects
without an ``isResource()`` guard (Normalizer.java:42-44), crashing on a
literal object; the other rules guard.  We derive only for resource
objects in all rules (the crash is not reproducible behavior worth
matching — documented divergence).
"""

from __future__ import annotations

import pyarrow as pa
import pyarrow.compute as pc

from ..model import KIND_IRI, KIND_LITERAL, TRIPLE_SCHEMA
from .. import vocab as V

# rule table: pred -> (type for subject, type for resource object,
#                      also-emit (subj, componentProperty, obj))
_P1_RULES = {
    V.QB_observation: (None, V.QB_Observation, False),
    V.QB_dataSet: (V.QB_Observation, V.QB_DataSet, False),
    V.QB_slice: (None, V.QB_Slice, False),
    V.QB_dimension: (None, V.QB_DimensionProperty, True),
    V.QB_measure: (None, V.QB_MeasureProperty, True),
    V.QB_attribute: (None, V.QB_AttributeProperty, True),
}


def phase1_derive(batch: pa.Table) -> pa.Table:
    """One Arrow batch of triples → derived phase-1 triples (only)."""
    preds = batch.column("pred")
    mask = pc.is_in(preds, value_set=pa.array(list(_P1_RULES.keys())))
    sub = batch.filter(mask)
    if sub.num_rows == 0:
        return pa.Table.from_arrays(
            [pa.array([], f.type) for f in TRIPLE_SCHEMA], schema=TRIPLE_SCHEMA
        )

    graphs = sub.column("graph").to_pylist()
    shas = sub.column("file_sha256").to_pylist()
    subjs = sub.column("subj").to_pylist()
    spreds = sub.column("pred").to_pylist()
    okinds = sub.column("obj_kind").to_pylist()
    objs = sub.column("obj").to_pylist()
    odts = sub.column("obj_dt").to_pylist()
    olangs = sub.column("obj_lang").to_pylist()

    og, osha, osubj, opred, okind, oobj, odt, olang = [], [], [], [], [], [], [], []

    def emit(g, sha, s, p, k, o, dt="", lang=""):
        og.append(g)
        osha.append(sha)
        osubj.append(s)
        opred.append(p)
        okind.append(k)
        oobj.append(o)
        odt.append(dt)
        olang.append(lang)

    for g, sha, s, p, k, o, dt, lang in zip(
        graphs, shas, subjs, spreds, okinds, objs, odts, olangs
    ):
        subj_type, obj_type, comp_prop = _P1_RULES[p]
        if subj_type is not None:
            emit(g, sha, s, V.RDF_type, KIND_IRI, subj_type)
        if obj_type is not None and k != KIND_LITERAL:
            emit(g, sha, o, V.RDF_type, KIND_IRI, obj_type)
        if comp_prop:
            # qb:componentProperty copies the object verbatim — ANY kind,
            # INCLUDING a literal's datatype/language tag (stripping them
            # would corrupt term identity in the exported model and
            # diverge from the broadcast phase-1 twin)
            emit(g, sha, s, V.QB_componentProperty, k, o, dt, lang)

    return pa.Table.from_arrays(
        [
            pa.array(og, pa.string()),
            pa.array(osha, pa.string()),
            pa.array(osubj, pa.string()),
            pa.array(opred, pa.string()),
            pa.array(okind, pa.int8()),
            pa.array(oobj, pa.string()),
            pa.array(odt, pa.string()),
            pa.array(olang, pa.string()),
        ],
        schema=TRIPLE_SCHEMA,
    )


def phase1_augment(batch: pa.Table) -> pa.Table:
    """One batch → the same batch plus its phase-1 derivations.

    Single-pass (the original ``union(triples, derived)`` formulation made
    Ray execute the parse lineage twice — once per union branch) and
    block-preserving: each input block maps to exactly one output block,
    which keeps triple blocks file-aligned for the shuffle-free local
    validation path (see pivot.LocalCheck)."""
    derived = phase1_derive(batch)
    if derived.num_rows == 0:
        return batch
    return pa.concat_tables([batch, derived]).combine_chunks()


def with_phase1(triples: "ray.data.Dataset") -> "ray.data.Dataset":  # noqa: F821
    """triples ∪ phase-1 derivations (duplicates allowed; set semantics
    downstream)."""
    return triples.map_batches(phase1_augment, batch_format="pyarrow")
