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
    Ray execute the parse lineage twice — once per union branch)."""
    derived = phase1_derive(batch)
    if derived.num_rows == 0:
        return batch
    return pa.concat_tables([batch, derived]).combine_chunks()


def phase1_augment_aligned(batch: pa.Table):
    """Generator form of :func:`phase1_augment` that yields GRAPH-ALIGNED
    tables, preserving the local path's one-graph-one-block invariant.

    Ray's output buffer slices a yielded batch mid-rows only when that
    single batch exceeds ``target_max_block_size`` (otherwise it flushes
    at whole-batch boundaries) — measured on Ray 2.49, and the round-4
    sf0.1 sweep caught the violation this guards against: the old
    default-``batch_size`` form re-batched blocks at 1024 rows, so flush
    boundaries landed mid-graph and LocalCheck silently validated
    partial graphs (missing IC-10/11, phantom IC-2/18 on the sliced
    cube corpus).  Small blocks yield whole (one table, no per-graph
    cost); a block near the slicing threshold yields one table per
    contiguous graph run, each bounded by the parse-side 96 MB per-file
    cap + ~10% phase-1 growth — always under the 128 MB default target,
    so never sliced."""
    import numpy as np

    import ray.data

    target = ray.data.DataContext.get_current().target_max_block_size
    # ~10% phase-1 growth margin on the input estimate; a single yielded
    # batch under the slicing threshold keeps the whole block together,
    # which preserves alignment without any per-graph work
    if (
        target is None
        or batch.num_rows == 0
        or int(batch.nbytes * 1.15) <= int(target * 0.75)
    ):
        yield phase1_augment(batch)
        return
    # oversize block: augment and yield one table per contiguous graph
    # run of the INPUT (derived rows append at the tail, so runs must be
    # cut before augmenting or a graph's derivations land in another run)
    graphs = batch.column("graph").to_pandas().to_numpy()
    bounds = np.flatnonzero(graphs[1:] != graphs[:-1]) + 1
    starts = np.concatenate([[0], bounds])
    ends = np.concatenate([bounds, [len(graphs)]])
    for s, e in zip(starts, ends):
        yield phase1_augment(batch.slice(int(s), int(e - s)))


def with_phase1(triples: "ray.data.Dataset") -> "ray.data.Dataset":  # noqa: F821
    """triples ∪ phase-1 derivations (duplicates allowed; set semantics
    downstream).  ``batch_size=None`` + the aligned generator keep every
    output block graph-aligned (see phase1_augment_aligned)."""
    return triples.map_batches(
        phase1_augment_aligned, batch_format="pyarrow", batch_size=None
    )
