"""Schema-side extraction, per-graph index build, and the schema-only ICs.

The reference's HashMap "query plans" all start from the *schema* slice of
the graph — DSD / component / slice-key / code-list triples — which is
bounded per file regardless of observation count.  This stage:

1. filters the triple Dataset down to schema triples in two streaming
   passes (pass 2 needs subjects / pcp predicates discovered in pass 1),
2. builds one :class:`GraphIndex` per graph on the driver (each graph's
   schema subgraph is small by construction; a cap guards pathological
   files),
3. evaluates the schema-only constraints IC-3..IC-10 (plus partial IC-2
   state) directly on the index, since they never touch observations,
4. returns the indexes for ``ray.put`` broadcast into the observation
   pivot stage.

Scale note: at 10^12 files the collection in (2) becomes a
``groupby("graph").map_groups`` stage emitting serialized indexes that are
hash-joined back to the stream on ``graph``; the per-graph build function
below is already shaped for that (pure function of one graph's schema
triples).  On the test corpus driver-side collection is both simpler and
faster.
"""

from __future__ import annotations

from dataclasses import dataclass, field

import pyarrow as pa
import pyarrow.compute as pc

from .. import vocab as V
from ..model import KIND_LITERAL
from ..model_terms import iri_of, obj_term, subj_term
from ..state.graphstore import LocalGraph

T_TRUE = f'"true"^^<{V.XSD_boolean}>'
T_FALSE = f'"false"^^<{V.XSD_boolean}>'


def _t(iri: str) -> str:
    return f"<{iri}>"


SCHEMA_PREDS = {
    V.QB_structure,
    V.QB_component,
    V.QB_componentProperty,
    V.QB_dimension,
    V.QB_measure,
    V.QB_attribute,
    V.QB_componentAttachment,
    V.QB_componentRequired,
    V.QB_sliceKey,
    V.QB_sliceStructure,
    V.QB_codeList,
    V.QB_hierarchyRoot,
    V.QB_parentChildProperty,
    V.QB_slice,
    V.RDFS_range,
    V.SKOS_inScheme,
    V.SKOS_member,
    V.OWL_inverseOf,
}

SCHEMA_CLASSES = {
    V.QB_DataSet,
    V.QB_DataStructureDefinition,
    V.QB_DimensionProperty,
    V.QB_MeasureProperty,
    V.QB_AttributeProperty,
    V.QB_SliceKey,
    V.QB_Slice,
    V.SKOS_ConceptScheme,
    V.SKOS_Collection,
    V.QB_HierarchicalCodeList,
    V.SKOS_Concept,
}

# Stop runaway schema collections (a pathological file could put the whole
# observation body behind a schema predicate).
MAX_SCHEMA_TRIPLES = 50_000_000


@dataclass
class GraphIndex:
    graph: str
    sha: str
    # streaming-side filter set (beyond qb:dataSet / qb:observation / rdf:type)
    relevant_preds: frozenset = frozenset()
    # per-dataset checks (dataset keys + node values are term_str;
    # properties are raw IRIs)
    dims_by_ds: dict = field(default_factory=dict)          # IC-11/12
    req13_by_ds: dict = field(default_factory=dict)         # IC-13
    ic14_req_by_ds: dict = field(default_factory=dict)      # IC-14 (quirk incl.)
    mt_measures_by_ds: dict = field(default_factory=dict)   # IC-15/16 (only mt ds)
    ic17_dims_by_ds: dict = field(default_factory=dict)     # IC-17 (only mt ds)
    ic17_nmeas_by_ds: dict = field(default_factory=dict)
    # normalization phase 2 pushdown
    ds_attach: dict = field(default_factory=dict)           # ds -> {prop: (terms…)}
    slice_push: dict = field(default_factory=dict)          # slice -> {prop: (terms…)}
    slice_datasets: dict = field(default_factory=dict)      # slice -> (ds terms…)  (IC-18)
    # IC-19 probes: ds -> {dim_prop: [(is_concept, cls tuple, allowed frozenset)]}
    ic19_by_ds: dict = field(default_factory=dict)
    concept_typed: frozenset = frozenset()
    # IC-20/21 probes: ds -> {dim_prop: (cls tuple, allowed_dir, allowed_inv)}
    ic2021_by_ds: dict = field(default_factory=dict)
    # IC-2 state
    typed_datasets: frozenset = frozenset()
    structure_vals_by_ds: dict = field(default_factory=dict)
    # findings from IC-3..IC-10 evaluated at build time
    schema_findings: list = field(default_factory=list)


# ---------------------------------------------------------------------------
# streaming collection
# ---------------------------------------------------------------------------


def _distinct(t: pa.Table) -> pa.Table:
    """Map-side exact dedup (C-level group-by over all columns): phase-1
    derives one identical `?ds a qb:DataSet` row per observation — without
    this the schema collection would ship the whole observation count."""
    if t.num_rows == 0:
        return t
    return t.group_by(t.column_names).aggregate([]).select(t.column_names)


# hoisted: these value-set arrays are identical for every batch of the
# streaming passes — rebuilding+sorting them per batch was pure overhead
_SCHEMA_PREDS_ARR = pa.array(sorted(SCHEMA_PREDS))
_SCHEMA_CLASSES_ARR = pa.array(sorted(SCHEMA_CLASSES))


def _filter_pass1(batch: pa.Table) -> pa.Table:
    pred = batch.column("pred")
    m1 = pc.is_in(pred, value_set=_SCHEMA_PREDS_ARR)
    m2 = pc.and_(
        pc.equal(pred, V.RDF_type),
        pc.is_in(batch.column("obj"), value_set=_SCHEMA_CLASSES_ARR),
    )
    return _distinct(batch.filter(pc.or_(m1, m2)))


def _discover_pass2_keys(t1: pa.Table) -> tuple[set, set]:
    """Pass-2 key discovery from the pass-1 schema slice: schema SUBJECTS
    (datasets / slices) and hierarchy edge PREDICATES (pcp / inverse pcp).
    Shared by the driver-collected and the per-block self-indexing paths."""
    subj_keys: set[str] = set()
    edge_preds: set[str] = set()
    if t1.num_rows == 0 or "graph" not in t1.column_names:
        return subj_keys, edge_preds
    for g, s, p, k, o in zip(
        t1.column("graph").to_pylist(),
        t1.column("subj").to_pylist(),
        t1.column("pred").to_pylist(),
        t1.column("obj_kind").to_pylist(),
        t1.column("obj").to_pylist(),
    ):
        if p == V.QB_slice:
            subj_keys.add(g + "\x00" + s)          # dataset subjects
            if k != KIND_LITERAL:
                subj_keys.add(g + "\x00" + o)      # slice subjects
        elif p in (V.QB_structure, V.QB_sliceStructure):
            subj_keys.add(g + "\x00" + s)          # datasets / slices
        elif p == V.QB_parentChildProperty and k != KIND_LITERAL:
            if not o.startswith("_:"):
                edge_preds.add(o)                  # direct pcp
        elif p == V.OWL_inverseOf and k != KIND_LITERAL and not o.startswith("_:"):
            edge_preds.add(o)                      # inverse pcp
    return subj_keys, edge_preds


class _FilterPass2:
    """Keep triples whose (graph, subj) is a known schema subject (dataset /
    slice attachment values) or whose pred is a discovered pcp / inverse-pcp
    property (hierarchy edges).  qb:observation edges stay stream-side."""

    def __init__(self, subj_keys: frozenset, edge_preds: frozenset):
        self.subj_keys = subj_keys
        self.edge_preds = edge_preds

    def __call__(self, batch: pa.Table) -> pa.Table:
        import pandas as pd

        key = pd.Series(
            pc.binary_join_element_wise(
                batch.column("graph"), batch.column("subj"), "\x00"
            ).to_pandas()
        )
        keep = key.isin(self.subj_keys).to_numpy()
        if self.edge_preds:
            keep = keep | pd.Series(
                batch.column("pred").to_pandas()
            ).isin(self.edge_preds).to_numpy()
        return _distinct(batch.filter(pa.array(keep)))


def collect_schema_tables(triples) -> list[pa.Table]:
    """Two filtered streaming passes over the triple Dataset; returns the
    collected schema-side Arrow tables (small by design, capped)."""
    pass1 = triples.map_batches(_filter_pass1, batch_format="pyarrow")
    t1 = _collect(pass1)

    subj_keys, edge_preds = _discover_pass2_keys(t1)
    if not subj_keys and not edge_preds:
        return [t1]
    pass2 = triples.map_batches(
        _FilterPass2(frozenset(subj_keys), frozenset(edge_preds)),
        batch_format="pyarrow",
    )
    return [t1, _collect(pass2)]


def _collect(ds) -> pa.Table:
    tables = []
    n = 0
    for b in ds.iter_batches(batch_size=65536, batch_format="pyarrow"):
        n += b.num_rows
        if n > MAX_SCHEMA_TRIPLES:
            raise RuntimeError(
                "schema-side triple collection exceeded cap; "
                "a pathological file inflated the schema slice"
            )
        tables.append(b if isinstance(b, pa.Table) else pa.Table.from_batches([b]))
    if not tables:
        return pa.table({})
    return pa.concat_tables(tables)


# ---------------------------------------------------------------------------
# per-graph index build
# ---------------------------------------------------------------------------


def build_indexes(tables: list[pa.Table]) -> dict[str, GraphIndex]:
    by_graph: dict[str, tuple[str, LocalGraph]] = {}
    seen: dict[str, set] = {}
    for t in tables:
        if t.num_rows == 0 or "graph" not in t.column_names:
            continue
        for g, sha, s, p, k, o, dt, lg_ in zip(
            t.column("graph").to_pylist(),
            t.column("file_sha256").to_pylist(),
            t.column("subj").to_pylist(),
            t.column("pred").to_pylist(),
            t.column("obj_kind").to_pylist(),
            t.column("obj").to_pylist(),
            t.column("obj_dt").to_pylist(),
            t.column("obj_lang").to_pylist(),
        ):
            if g not in by_graph:
                by_graph[g] = (sha, LocalGraph())
                seen[g] = set()
            key = (s, p, k, o, dt, lg_)
            if key in seen[g]:
                continue
            seen[g].add(key)
            by_graph[g][1].add(subj_term(s), p, obj_term(k, o, dt, lg_))
    return {
        g: _build_one(g, sha, lg) for g, (sha, lg) in by_graph.items()
    }


def _apply_local_phase1(lg: LocalGraph) -> None:
    """Schema-side slice of the phase-1 closure (Normalizer.java:23-72):
    the qb:dimension/measure/attribute and qb:slice rules read schema
    predicates; the qb:dataSet/qb:observation rules are stream-scale and
    handled in the pivot stage."""
    rules = [
        (V.QB_dimension, V.QB_DimensionProperty),
        (V.QB_measure, V.QB_MeasureProperty),
        (V.QB_attribute, V.QB_AttributeProperty),
    ]
    for pred, cls in rules:
        for s in list(lg.subjects_with(pred)):
            for o in list(lg.objects_of(s, pred)):
                if not o.startswith('"'):
                    lg.add(o, V.RDF_type, _t(cls))
                lg.add(s, V.QB_componentProperty, o)
    for s in list(lg.subjects_with(V.QB_slice)):
        for o in list(lg.objects_of(s, V.QB_slice)):
            if not o.startswith('"'):
                lg.add(o, V.RDF_type, _t(V.QB_Slice))


def _path_from(lg: LocalGraph, subj: str, path: list[str]) -> set[str]:
    nodes = {subj}
    for p in path:
        nxt: set[str] = set()
        for n in nodes:
            if n.startswith('"'):
                continue
            nxt |= lg.objects_of(n, p)
        nodes = nxt
    return nodes


def _build_one(graph: str, sha: str, lg: LocalGraph) -> GraphIndex:
    _apply_local_phase1(lg)
    idx = GraphIndex(graph=graph, sha=sha)
    findings = idx.schema_findings

    typed = lambda cls: lg.subjects_with(V.RDF_type, _t(cls))  # noqa: E731
    dims_typed = typed(V.QB_DimensionProperty)
    measures_typed = typed(V.QB_MeasureProperty)
    attrs_typed = typed(V.QB_AttributeProperty)

    # dataset → component specs / component properties (the reference's
    # searchByPathVisit(null, [structure, component(, componentProperty)], null))
    specs_by_ds = lg.path_visit([V.QB_structure, V.QB_component])
    comps_by_ds = lg.path_visit(
        [V.QB_structure, V.QB_component, V.QB_componentProperty]
    )
    mt_term = _t(V.QB_measureType)

    req_true_specs = lg.multi_prop_subjects({V.QB_componentRequired: T_TRUE})
    attach_ds_specs = lg.multi_prop_subjects({V.QB_componentAttachment: _t(V.QB_DataSet)})
    attach_slice_specs = lg.multi_prop_subjects({V.QB_componentAttachment: _t(V.QB_Slice)})

    def _props(terms) -> tuple:
        """nodeToProperty: URI resources only, as raw IRIs, sorted."""
        return tuple(sorted(i for i in (iri_of(x) for x in terms) if i))

    for ds in comps_by_ds:
        comps = comps_by_ds[ds]
        dims = comps & dims_typed
        idx.dims_by_ds[ds] = _props(dims)
        req_specs = specs_by_ds.get(ds, set()) & req_true_specs
        req_props: set[str] = set()
        for spec in req_specs:
            req_props |= lg.objects_of(spec, V.QB_componentProperty)
        idx.req13_by_ds[ds] = _props(req_props)
        has_mt = mt_term in comps
        idx.ic14_req_by_ds[ds] = _props(comps if has_mt else comps & measures_typed)
        if has_mt:
            idx.mt_measures_by_ds[ds] = tuple(sorted(comps & measures_typed))
        # IC-17 state for EVERY dataset with a DSD: the reference runs
        # IC-17 over all compPropByDataset keys and filters observations
        # to those carrying a qb:measureType property — it does NOT
        # require measureType to be a declared component
        # (ValidatorIC17.java:28-43)
        idx.ic17_dims_by_ds[ds] = tuple(
            p for p in _props(comps & dims_typed) if p != V.QB_measureType
        )
        idx.ic17_nmeas_by_ds[ds] = len(comps & measures_typed)

    # ---- normalization phase-2 pushdown state (Normalizer.java:90-189) ----
    for ds in specs_by_ds:
        comps_a: set[str] = set()
        for spec in specs_by_ds[ds] & attach_ds_specs:
            comps_a |= lg.objects_of(spec, V.QB_componentProperty)
        vals = {}
        for prop in _props(comps_a):
            v = lg.objects_of(ds, prop)
            if v:
                vals[prop] = tuple(sorted(v))
        if vals:
            idx.ds_attach[ds] = vals

    for ds in sorted(specs_by_ds):
        comps_b: set[str] = set()
        for spec in specs_by_ds[ds] & attach_slice_specs:
            comps_b |= lg.objects_of(spec, V.QB_componentProperty)
        push_props = set(_props(comps_b)) | set(idx.dims_by_ds.get(ds, ()))
        slices = [s for s in lg.objects_of(ds, V.QB_slice) if not s.startswith('"')]
        for sl in slices:
            dss = idx.slice_datasets.setdefault(sl, set())
            dss.add(ds)
            if push_props:
                tgt = idx.slice_push.setdefault(sl, {})
                for prop in push_props:
                    v = lg.objects_of(sl, prop)
                    if v:
                        tgt[prop] = tuple(sorted(set(tgt.get(prop, ())) | v))
    idx.slice_datasets = {k: tuple(sorted(v)) for k, v in idx.slice_datasets.items()}

    # ---- IC-19 code-list probes (accumulation quirk: conceptCLByDim /
    # collectionCLByDim grow across datasets — ValidatorIC19.java:24-27,38) --
    concept_schemes = typed(V.SKOS_ConceptScheme)
    collections = typed(V.SKOS_Collection)
    idx.concept_typed = frozenset(typed(V.SKOS_Concept))
    allowed_concept: dict[str, frozenset] = {}
    for cl in concept_schemes:
        allowed_concept[cl] = frozenset(lg.subjects_with(V.SKOS_inScheme, cl))
    allowed_coll: dict[str, frozenset] = {}
    for cl in collections:
        allowed_coll[cl] = frozenset(lg.reachable_from([cl], V.SKOS_member))

    acc: dict[str, list] = {}
    for ds in sorted(comps_by_ds):
        dims_cl = comps_by_ds[ds] & dims_typed
        for dim in sorted(dims_cl):
            dim_prop = iri_of(dim)
            if dim_prop is None:
                continue
            cls = lg.objects_of(dim, V.QB_codeList)
            cset = tuple(sorted(cls & concept_schemes))
            oset = tuple(sorted(cls & collections))
            entries = acc.get(dim_prop, ())
            if cset and not any(e[0] for e in entries):
                al = frozenset().union(*(allowed_concept[c] for c in cset))
                acc.setdefault(dim_prop, []).append((True, cset, al))
            if oset and not any(not e[0] for e in entries):
                al = frozenset().union(*(allowed_coll[c] for c in oset))
                acc.setdefault(dim_prop, []).append((False, oset, al))
        probes = {d: list(es) for d, es in acc.items() if es}
        if probes:
            idx.ic19_by_ds[ds] = probes

    # ---- IC-20/21 hierarchy probes (no accumulation) ----------------------
    hcls = typed(V.QB_HierarchicalCodeList)
    hier_info: dict[str, tuple] = {}
    for cl in hcls:
        roots = set(lg.objects_of(cl, V.QB_hierarchyRoot))
        dir_pcps: list[str] = []
        inv_pcps: list[str] = []
        for pcp in lg.objects_of(cl, V.QB_parentChildProperty):
            p = iri_of(pcp)
            if p is not None:
                dir_pcps.append(p)
            elif pcp.startswith("_:"):
                for inv in lg.objects_of(pcp, V.OWL_inverseOf):
                    i = iri_of(inv)
                    if i is not None:
                        inv_pcps.append(i)
        a_dir = set(roots)
        for p in dir_pcps:
            a_dir |= lg.reachable_from(roots, p)
        a_inv = set(roots)
        for p in inv_pcps:
            a_inv |= lg.reaching_to(roots, p)
        hier_info[cl] = (frozenset(a_dir), frozenset(a_inv))
    for ds in comps_by_ds:
        dims_cl = comps_by_ds[ds] & dims_typed
        per_dim = {}
        for dim in sorted(dims_cl):
            dim_prop = iri_of(dim)
            if dim_prop is None:
                continue
            cls = tuple(sorted(lg.objects_of(dim, V.QB_codeList) & set(hier_info)))
            if not cls:
                continue
            a_dir = frozenset().union(*(hier_info[c][0] for c in cls))
            a_inv = frozenset().union(*(hier_info[c][1] for c in cls))
            per_dim[dim_prop] = (cls, a_dir, a_inv)
        if per_dim:
            idx.ic2021_by_ds[ds] = per_dim

    # ---- IC-2 state -------------------------------------------------------
    idx.typed_datasets = frozenset(typed(V.QB_DataSet))
    for ds in lg.subjects_with(V.QB_structure):
        idx.structure_vals_by_ds[ds] = tuple(sorted(lg.objects_of(ds, V.QB_structure)))

    # ---- schema-only ICs --------------------------------------------------
    # IC-3 DSD includes measure (ValidatorIC3.java:25-39)
    for dsd in sorted(typed(V.QB_DataStructureDefinition)):
        cp = _path_from(lg, dsd, [V.QB_component, V.QB_componentProperty])
        if not (cp & measures_typed):
            findings.append(("IC3", dsd, []))
    # IC-4 dimensions have range (ValidatorIC4.java:22-30)
    no_range = dims_typed - lg.subjects_with(V.RDFS_range)
    for dim in sorted(no_range):
        findings.append(("IC4", dim, []))
    # IC-5 concept dimensions have code lists (ValidatorIC5.java:23-34)
    cdims = lg.multi_prop_subjects(
        {V.RDF_type: _t(V.QB_DimensionProperty), V.RDFS_range: _t(V.SKOS_Concept)}
    )
    for dim in sorted(cdims):
        if not lg.objects_of(dim, V.QB_codeList):
            findings.append(("IC5", dim, []))
    # IC-6 only attributes may be optional (ValidatorIC6.java:21-38)
    req_false_specs = lg.multi_prop_subjects({V.QB_componentRequired: T_FALSE})
    comp_spec_objs = lg.all_objects_of(V.QB_component) & req_false_specs
    ic6_props: set[str] = set()
    for spec in comp_spec_objs:
        ic6_props |= lg.objects_of(spec, V.QB_componentProperty)
    for prop in sorted(ic6_props - attrs_typed):
        findings.append(("IC6", prop, []))
    # IC-7 slice keys must be declared (ValidatorIC7.java:23-34)
    keys_left = set(typed(V.QB_SliceKey))
    for dsd in typed(V.QB_DataStructureDefinition):
        keys_left -= lg.objects_of(dsd, V.QB_sliceKey)
    for k in sorted(keys_left):
        findings.append(("IC7", k, []))
    # IC-8 slice keys consistent with DSD — with the reference's propSet
    # accumulation across DSDs (ValidatorIC8.java:29-45), iterated in
    # sorted order for determinism (the reference's HashMap order is not
    # deterministic).
    sk_typed = typed(V.QB_SliceKey)
    sk_by_dsd = lg.path_visit([V.QB_sliceKey])
    prop_acc: set[str] = set()
    ic8_flagged: set[str] = set()
    for dsd in sorted(sk_by_dsd):
        for sk in sk_by_dsd[dsd]:
            if sk in sk_typed:
                prop_acc |= lg.objects_of(sk, V.QB_componentProperty)
        dsd_props = _path_from(lg, dsd, [V.QB_component, V.QB_componentProperty])
        for prop in prop_acc:
            if prop not in dsd_props:
                ic8_flagged.add(prop)
    for prop in sorted(ic8_flagged):
        findings.append(("IC8", prop, []))
    # IC-9 unique slice structure (ValidatorIC9.java:23-34)
    for sl in sorted(typed(V.QB_Slice)):
        st = lg.objects_of(sl, V.QB_sliceStructure)
        if len(st) != 1:
            findings.append(("IC9", sl, sorted(st)))
    # IC-10 slice dimensions complete (ValidatorIC10.java:20-34)
    dim_by_slice = lg.path_visit([V.QB_sliceStructure, V.QB_componentProperty])
    for sl in sorted(dim_by_slice):
        missing = []
        for dim in dim_by_slice[sl]:
            dp = iri_of(dim)
            if dp is None:
                continue
            if not lg.objects_of(sl, dp):
                missing.append(dim)
        if missing:
            findings.append(("IC10", sl, sorted(missing)))

    # streaming-side relevant predicate set
    rel: set[str] = set()
    for d in (idx.dims_by_ds, idx.req13_by_ds, idx.ic14_req_by_ds, idx.ic17_dims_by_ds):
        for props in d.values():
            rel.update(props)
    for ms in idx.mt_measures_by_ds.values():
        rel.update(i for i in (iri_of(m) for m in ms) if i)
    if idx.ic17_nmeas_by_ds:
        # any DSD dataset: IC-17 keys on observations CARRYING measureType
        rel.add(V.QB_measureType)
    for per_dim in idx.ic19_by_ds.values():
        rel.update(per_dim.keys())
    for per_dim in idx.ic2021_by_ds.values():
        rel.update(per_dim.keys())
    idx.relevant_preds = frozenset(rel)
    return idx


def build_schema_indexes(triples) -> dict[str, GraphIndex]:
    return build_indexes(collect_schema_tables(triples))


# ---------------------------------------------------------------------------
# distributed per-file index extraction (the 10^12-file path)
# ---------------------------------------------------------------------------


def extract_indexes_from_batch(batch: pa.Table) -> dict[str, GraphIndex]:
    """One triple block (whole graphs — see pivot.LocalCheck's alignment
    invariant) → {graph: GraphIndex} for the graphs in the block.

    Both collection passes run *inside* the block: pass-2 subjects (the
    componentAttachment value carriers) are discovered from the block's own
    pass-1 slice, because schema subjects never cross a file either."""
    t1 = _filter_pass1(batch)
    subj_keys, edge_preds = _discover_pass2_keys(t1)
    tables = [t1]
    if subj_keys or edge_preds:
        tables.append(
            _FilterPass2(frozenset(subj_keys), frozenset(edge_preds))(batch)
        )
    return build_indexes(tables)


def _extract_block_indexes(batch: pa.Table) -> pa.Table:
    """Arrow-serializable wrapper of :func:`extract_indexes_from_batch`
    for the driver-collected index build (export paths / shuffle mode)."""
    import pickle

    indexes = extract_indexes_from_batch(batch)
    return pa.table(
        {
            "graph": pa.array(list(indexes.keys()), pa.string()),
            "index_pkl": pa.array(
                [pickle.dumps(v) for v in indexes.values()], pa.binary()
            ),
        }
    )


def build_schema_indexes_local(triples) -> dict[str, GraphIndex]:
    """Single parallel pass over file-aligned triple blocks; driver work is
    deserializing one small blob per graph.  NOTE: the resulting dict (and
    its ray.put broadcast) scales with the number of graphs — fine for
    export/shuffle paths over bounded corpora; the zero-shuffle validation
    path avoids it entirely (pivot.LocalCheck self-indexes per block)."""
    import pickle

    out: dict[str, GraphIndex] = {}
    rows = triples.map_batches(
        _extract_block_indexes, batch_format="pyarrow", batch_size=None
    ).to_pandas()  # not take_all: ~0.5 ms/row at graph-scale rows
    if len(rows):  # empty to_pandas frames are column-less
        for g, pkl in zip(rows["graph"], rows["index_pkl"]):
            out[g] = pickle.loads(pkl)
    return out
