"""Normalized-model export: phase-2 materialization + exact triple dedup.

On the hot validation path phase-2 pushdown values never exist as triples
(they ride the broadcast index into the pivot).  ``exportModel`` parity
(NospaValidator.java:56-67) requires the actual triple set, so this stage
materializes the pushdown emits and exact-dedups the union: hash the
triple identity per batch, bucket-shuffle, drop duplicates per bucket.
Jena's Model is a set (model.add is idempotent) — this is the only place
the engine pays for that set property with a full shuffle, and it is off
the validation path.
"""

from __future__ import annotations

import pandas as pd
import pyarrow as pa

from .. import vocab as V
from ..model import KIND_LITERAL, TRIPLE_SCHEMA, parse_term
from .pivot import _IndexCache


class Phase2Emit:
    """qb:dataSet / qb:observation edges × broadcast attachment values →
    derived triples (Normalizer.java:90-189).  Vectorized: the attachment
    value tables are flattened (terms pre-parsed into kind/obj/dt/lang
    columns) once per actor, each batch is two C-level merges."""

    def __init__(self, index_ref):
        self.index_ref = index_ref
        self._indexes = None
        self._tables = None

    def _ensure_tables(self):
        if self._tables is not None:
            return
        attach, push = [], []
        for g, idx in self._indexes.items():
            for dterm, by_prop in idx.ds_attach.items():
                for prop, vs in by_prop.items():
                    attach.extend((g, dterm, prop, *parse_term(v)) for v in vs)
            for sterm, by_prop in idx.slice_push.items():
                for prop, vs in by_prop.items():
                    push.extend((g, sterm, prop, *parse_term(v)) for v in vs)
        cols = ["graph", "key", "pred_out", "obj_kind", "obj", "obj_dt", "obj_lang"]
        self._tables = {
            "attach": pd.DataFrame(attach, columns=cols),
            "push": pd.DataFrame(push, columns=cols),
        }

    def __call__(self, batch: pa.Table) -> pa.Table:
        import numpy as np

        from .pivot import _obj_term_vec

        if self._indexes is None:
            self._indexes = _IndexCache.get(self.index_ref)
        self._ensure_tables()
        df = batch.to_pandas()
        pred = df["pred"]
        kind = df["obj_kind"].to_numpy()
        parts = []

        dsm = (pred == V.QB_dataSet).to_numpy()
        if dsm.any() and len(self._tables["attach"]):
            d = df[dsm]
            j = pd.DataFrame(
                {
                    "graph": d["graph"].to_numpy(),
                    "file_sha256": d["file_sha256"].to_numpy(),
                    "subj": d["subj"].to_numpy(),
                    "key": _obj_term_vec(d),
                }
            ).merge(self._tables["attach"], on=["graph", "key"])
            if len(j):
                parts.append(j)

        obm = ((pred == V.QB_observation).to_numpy()) & (kind != KIND_LITERAL)
        if obm.any() and len(self._tables["push"]):
            d = df[obm]
            sterm = np.where(
                d["subj"].str.startswith("_:"), d["subj"], "<" + d["subj"] + ">"
            )
            j = pd.DataFrame(
                {
                    "graph": d["graph"].to_numpy(),
                    "file_sha256": d["file_sha256"].to_numpy(),
                    "subj": d["obj"].to_numpy(),
                    "key": sterm,
                }
            ).merge(self._tables["push"], on=["graph", "key"])
            if len(j):
                parts.append(j)

        if not parts:
            return pa.Table.from_arrays(
                [pa.array([], f.type) for f in TRIPLE_SCHEMA], schema=TRIPLE_SCHEMA
            )
        out = pd.concat(parts, ignore_index=True).rename(columns={"pred_out": "pred"})
        return pa.Table.from_arrays(
            [
                pa.array(out["graph"], pa.string()),
                pa.array(out["file_sha256"], pa.string()),
                pa.array(out["subj"], pa.string()),
                pa.array(out["pred"], pa.string()),
                pa.array(out["obj_kind"].to_numpy(), pa.int8()),
                pa.array(out["obj"], pa.string()),
                pa.array(out["obj_dt"], pa.string()),
                pa.array(out["obj_lang"], pa.string()),
            ],
            schema=TRIPLE_SCHEMA,
        )


def phase2_triples(triples, index_ref):
    return triples.map_batches(Phase2Emit(index_ref), batch_format="pyarrow")


def _add_triple_hash(batch: pa.Table, num_buckets: int) -> pa.Table:
    df = batch.to_pandas()
    key = df["graph"]
    for c in ("subj", "pred", "obj", "obj_dt", "obj_lang"):
        key = key + "\x00" + df[c]
    key = key + "\x00" + df["obj_kind"].astype(str)
    h = pd.util.hash_pandas_object(key, index=False).to_numpy()
    return batch.append_column(
        "bucket", pa.array((h % num_buckets).astype("int32"), pa.int32())
    )


def _dedup_group(df: pd.DataFrame) -> pd.DataFrame:
    return df.drop_duplicates(
        subset=["graph", "subj", "pred", "obj_kind", "obj", "obj_dt", "obj_lang"]
    ).drop(columns=["bucket"])


def _write_rdf_parts(triples, out_dir: str, ext: str, lines_fn) -> list[str]:
    """Shared line-oriented RDF sink: one ``part-*.{ext}`` per block
    (side-effect sink with task-unique names), ``lines_fn(df) -> Series``
    renders the block's statements vectorized.  Returns the sorted list."""
    import os
    import uuid

    os.makedirs(out_dir, exist_ok=True)

    def write_block(batch: pa.Table) -> pa.Table:
        df = batch.to_pandas()
        lines = lines_fn(df)
        path = os.path.join(out_dir, f"part-{uuid.uuid4().hex}.{ext}")
        with open(path, "w") as f:
            f.write("\n".join(lines) + ("\n" if len(lines) else ""))
        return pa.table({"path": pa.array([path]), "rows": pa.array([len(lines)])})

    manifest = triples.map_batches(
        write_block, batch_format="pyarrow", batch_size=None
    ).to_pandas()
    return sorted(manifest["path"]) if len(manifest) else []


def _stmt_lines(df: pd.DataFrame) -> pd.Series:
    """Vectorized ``<s> <p> term`` statement bodies (no terminator)."""
    import numpy as np

    from .pivot import _obj_term_vec

    subj = df["subj"].astype(str)
    st = pd.Series(
        np.where(subj.str.startswith("_:"), subj, "<" + subj + ">"),
        index=df.index,
    )
    objt = pd.Series(_obj_term_vec(df), index=df.index).astype(str)
    return st + " <" + df["pred"].astype(str) + "> " + objt


def write_ntriples(triples, out_dir: str) -> list[str]:
    """Serialize the triple Dataset as N-Triples text, one ``part-*.nt``
    per block (exportModel's RDF text output, NospaValidator.java:56-67;
    our canonical sink stays Parquet — this is the interchange format).
    Line assembly is vectorized pandas string concat."""
    return _write_rdf_parts(
        triples, out_dir, "nt", lambda df: _stmt_lines(df) + " ."
    )


_TTL_PREFIXES = [
    ("qb", V.PREFIX_CUBE),
    ("rdf", V.PREFIX_RDF),
    ("rdfs", V.PREFIX_RDFS),
    ("skos", V.PREFIX_SKOS),
    ("owl", V.PREFIX_OWL),
    ("xsd", V.PREFIX_XSD),
]
import re as _re

_PN_LOCAL_RE = _re.compile(r"[A-Za-z_][A-Za-z0-9_\-]*$")


def _ttl_iri(iri: str) -> str:
    for p, ns in _TTL_PREFIXES:
        if iri.startswith(ns) and _PN_LOCAL_RE.match(iri[len(ns):]):
            return f"{p}:{iri[len(ns):]}"
    return f"<{iri}>"


def _ttl_iri_vec(s: pd.Series) -> pd.Series:
    """Vectorized :func:`_ttl_iri`: prefixed-name abbreviation over an IRI
    Series — one startswith + anchored match per vocabulary prefix."""
    s = s.astype(str)
    out = "<" + s + ">"
    done = pd.Series(False, index=s.index)
    for p, ns in _TTL_PREFIXES:
        m = ~done & s.str.startswith(ns)
        if not m.any():
            continue
        local = s[m].str[len(ns):]
        ok = local.str.match(_PN_LOCAL_RE)
        if not ok.any():
            continue
        hit = m.copy()
        hit[m] = ok.to_numpy()
        out[hit] = p + ":" + local[ok.to_numpy()]
        done |= hit
    return out


def write_turtle(triples, out_dir: str) -> list[str]:
    """Serialize the triple Dataset as Turtle (the reference's dominant
    interchange format; exportModel accepts any Jena serialization,
    NospaValidator.java:56-67).  One ``part-*.ttl`` per block, subjects
    grouped with ``;`` predicate lists, vocabulary terms abbreviated with
    the standard qb:/rdf:/rdfs:/skos:/owl:/xsd: prefixes, ``rdf:type``
    as ``a``.  Round-trips through our own parser:
    ``parse_turtle(written) == input`` term-for-term (bnode labels kept).
    Fully vectorized: prefixed names, object terms and the ``;``-grouped
    subject paragraphs are all pandas/numpy string ops — the paragraph
    structure comes from first/last-of-group masks on the sorted block,
    no per-row Python."""
    import os
    import uuid

    import numpy as np

    from ..model import KIND_IRI
    from .pivot import _obj_term_vec

    header = "".join(f"@prefix {p}: <{ns}> .\n" for p, ns in _TTL_PREFIXES)

    def write_block(batch: pa.Table) -> pa.Table:
        # group sort == the old groupby(sort=True): paragraphs in key order,
        # statements in original order within each (graph, subj) paragraph
        df = batch.to_pandas().sort_values(["graph", "subj"], kind="stable")
        n = len(df)
        subj = df["subj"].astype(str)
        subj_t = pd.Series(
            np.where(subj.str.startswith("_:"), subj, _ttl_iri_vec(subj)),
            index=df.index,
        )
        pred = df["pred"].astype(str)
        pred_t = pd.Series(
            np.where(pred == V.RDF_type, "a", _ttl_iri_vec(pred)),
            index=df.index,
        )
        obj_t = pd.Series(
            _obj_term_vec(df, dt_render=_ttl_iri_vec), index=df.index
        ).astype(str)
        m_iri = (df["obj_kind"] == KIND_IRI).to_numpy()
        if m_iri.any():
            obj_t[m_iri] = _ttl_iri_vec(df["obj"][m_iri])
        po = pred_t + " " + obj_t
        key = df["graph"].astype(str) + "\x00" + subj
        first = key.ne(key.shift()).to_numpy()
        last = key.ne(key.shift(-1)).to_numpy()
        lead = np.where(first, "\n\n", "")
        if n:
            lead[0] = ""
        parts = (
            pd.Series(lead, index=df.index)
            + np.where(first, subj_t + " ", " ;\n    ")
            + po
            + np.where(last, " .", "")
        )
        body = "".join(parts.to_list())
        path = os.path.join(out_dir, f"part-{uuid.uuid4().hex}.ttl")
        with open(path, "w") as f:
            f.write(header + "\n" + body + ("\n" if n else ""))
        return pa.table({"path": pa.array([path]), "rows": pa.array([n])})

    os.makedirs(out_dir, exist_ok=True)
    manifest = triples.map_batches(
        write_block, batch_format="pyarrow", batch_size=None
    ).to_pandas()
    return sorted(manifest["path"]) if len(manifest) else []


_NCNAME_RE = _re.compile(r"[A-Za-z_][A-Za-z0-9_.\-]*$")

# code points XML 1.0 cannot carry in any form (C0 controls minus \t\n\r)
_XML_ILLEGAL_RE = _re.compile(r"[\x00-\x08\x0b\x0c\x0e-\x1f]")


def _split_qname(iri: str) -> tuple[str, str]:
    """(namespace, local) with a valid XML NCName local part, splitting at
    the last #, / or : that yields one."""
    for i in range(len(iri) - 1, 0, -1):
        if iri[i] in "#/:":
            local = iri[i + 1 :]
            if local and _NCNAME_RE.match(local):
                return iri[: i + 1], local
            break
    raise ValueError(f"IRI has no XML-serializable local name: {iri!r}")


def rdfxml_document(rows) -> str:
    """RDF/XML document string from (subj, pred, obj_kind, obj, obj_dt,
    obj_lang) tuples: one rdf:Description per subject (in given order),
    namespace prefixes collected per document.  Round-trips through
    ``parse_rdfxml``."""
    from xml.sax.saxutils import escape, quoteattr

    from ..model import KIND_BNODE, KIND_IRI

    ns_prefix: dict[str, str] = {V.PREFIX_RDF: "rdf"}

    def pfx(ns: str) -> str:
        p = ns_prefix.get(ns)
        if p is None:
            p = f"ns{len(ns_prefix)}"
            ns_prefix[ns] = p
        return p

    by_subj: dict[str, list] = {}
    for r in rows:
        by_subj.setdefault(r[0], []).append(r)
    bodies = []
    for subj, rs in by_subj.items():
        if subj.startswith("_:"):
            sattr = f"rdf:nodeID={quoteattr(subj[2:])}"
        else:
            sattr = f"rdf:about={quoteattr(subj)}"
        props = []
        for _s, pred, kind, obj, dt, lang_ in rs:
            ns, local = _split_qname(pred)
            tag = f"{pfx(ns)}:{local}"
            if kind == KIND_IRI:
                props.append(f"    <{tag} rdf:resource={quoteattr(obj)}/>")
            elif kind == KIND_BNODE:
                props.append(f"    <{tag} rdf:nodeID={quoteattr(obj[2:])}/>")
            else:
                if _XML_ILLEGAL_RE.search(obj):
                    # XML 1.0 cannot represent these code points AT ALL
                    # (not even as character references) — fail loudly
                    # rather than emit a document no parser accepts;
                    # Turtle/N-Triples serialize such literals fine
                    raise ValueError(
                        "literal contains XML-1.0-illegal control chars; "
                        "export this model as turtle/ntriples instead"
                    )
                extra = ""
                if dt:
                    extra = f" rdf:datatype={quoteattr(dt)}"
                elif lang_:
                    extra = f" xml:lang={quoteattr(lang_)}"
                props.append(f"    <{tag}{extra}>{escape(obj)}</{tag}>")
        bodies.append(
            f"  <rdf:Description {sattr}>\n" + "\n".join(props)
            + "\n  </rdf:Description>"
        )
    decls = "".join(
        f'\n    xmlns:{p}={quoteattr(ns)}' for ns, p in ns_prefix.items()
    )
    return (
        '<?xml version="1.0" encoding="utf-8"?>\n'
        f"<rdf:RDF{decls}>\n" + "\n".join(bodies) + "\n</rdf:RDF>\n"
    )


def write_rdfxml(triples, out_dir: str) -> list[str]:
    """Serialize the triple Dataset as RDF/XML (exportModel parity for the
    reference's default serialization, NospaValidator.java:56-67): one
    ``part-*.rdf`` per block, one rdf:Description per (graph, subj) with
    namespace prefixes collected per file."""
    import os
    import uuid

    os.makedirs(out_dir, exist_ok=True)

    def write_block(batch: pa.Table) -> pa.Table:
        df = batch.to_pandas().sort_values(["graph", "subj"], kind="stable")
        rows = zip(
            df["subj"], df["pred"], df["obj_kind"], df["obj"],
            df["obj_dt"], df["obj_lang"],
        )
        doc = rdfxml_document(rows)
        path = os.path.join(out_dir, f"part-{uuid.uuid4().hex}.rdf")
        with open(path, "w") as f:
            f.write(doc)
        return pa.table({"path": pa.array([path]), "rows": pa.array([len(df)])})

    manifest = triples.map_batches(
        write_block, batch_format="pyarrow", batch_size=None
    ).to_pandas()
    return sorted(manifest["path"]) if len(manifest) else []


# IRIREF-illegal characters (N-Quads grammar): controls, space, and
# <>"{}|^`\ — a pass-through graph value containing any of these would
# serialize as a line our own parser rejects
_IRI_ILLEGAL_RE = _re.compile(r'[\x00-\x20<>"{}|^`\\]')


def _graph_term(g: str) -> str:
    """Graph-column value → N-Quads graph label.  Values that are
    already clean IRIs or bnode labels pass through; anything else
    (file-scoped repo|path|commit ids, IRI-illegal characters) maps to
    a deterministic reversible urn:graph: percent-encoded IRI."""
    if g.startswith("_:"):
        return g
    if _re.match(r"^[A-Za-z][A-Za-z0-9+.\-]*:", g) and not _IRI_ILLEGAL_RE.search(g):
        return f"<{g}>"
    from urllib.parse import quote

    return f"<urn:graph:{quote(g, safe='')}>"


def write_nquads(triples, out_dir: str) -> list[str]:
    """Serialize the triple Dataset as N-Quads, the graph column as the
    4th term (its native quad serialization) — same sink shape as
    write_ntriples.  Graph labels repeat block-wide, so ``_graph_term``
    runs once per distinct graph and broadcasts via ``Series.map``."""

    def lines(df: pd.DataFrame) -> pd.Series:
        g = df["graph"].astype(str)
        gterm = g.map({u: _graph_term(u) for u in g.unique()})
        return _stmt_lines(df) + " " + gterm + " ."

    return _write_rdf_parts(triples, out_dir, "nq", lines)


def nquads_document(rows, graph_iri: str | None = None) -> str:
    """Parser triple tuples (s, p, kind, obj, dt, lang) → N-Quads text,
    every line labeled with ``graph_iri`` (None → default-graph lines,
    i.e. plain N-Triples).  The write twin of rdf_parser.parse_nquads.
    ``graph_iri`` must be IRIREF-legal — a label with spaces/braces/controls
    would serialize a line our own parser rejects, so it raises here
    (the Dataset-level ``write_nquads`` percent-encodes instead because its
    graph column carries arbitrary file ids)."""
    from ..model import term_str

    if graph_iri and _IRI_ILLEGAL_RE.search(graph_iri):
        raise ValueError(f"graph label is not a legal IRIREF: {graph_iri!r}")
    g = f" <{graph_iri}>" if graph_iri else ""
    lines = []
    for s, p, k, o, dt, lg_ in rows:
        st = s if s.startswith("_:") else f"<{s}>"
        lines.append(f"{st} <{p}> {term_str(k, o, dt, lg_)}{g} .")
    return "\n".join(lines) + ("\n" if lines else "")


def trig_document(rows, graph_iri: str | None = None) -> str:
    """Parser triple tuples → TriG text: one named-graph block when
    ``graph_iri`` is given, else default-graph statements (plain
    Turtle-compatible lines).  The write twin of rdf_parser.parse_trig.
    Raises on IRIREF-illegal ``graph_iri`` (see nquads_document)."""
    from ..model import term_str

    if graph_iri and _IRI_ILLEGAL_RE.search(graph_iri):
        raise ValueError(f"graph label is not a legal IRIREF: {graph_iri!r}")
    lines = []
    for s, p, k, o, dt, lg_ in rows:
        st = s if s.startswith("_:") else f"<{s}>"
        lines.append(f"{st} <{p}> {term_str(k, o, dt, lg_)} .")
    body = "\n".join(lines)
    if graph_iri is None:
        return body + ("\n" if lines else "")
    return f"<{graph_iri}> {{\n{body}\n}}\n"


def exact_dedup_triples(triples, num_buckets: int = 64):
    """Exact set-dedup of the triple table: per-batch identity hash →
    bucket shuffle → per-bucket drop_duplicates (the groupby-shuffle dedup
    pattern; duplicates of one triple always share a bucket)."""
    hashed = triples.map_batches(
        lambda b, n=num_buckets: _add_triple_hash(b, n), batch_format="pyarrow"
    )
    return hashed.groupby("bucket").map_groups(_dedup_group, batch_format="pandas")
