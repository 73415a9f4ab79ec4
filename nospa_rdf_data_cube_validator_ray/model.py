"""The core triple-table data model.

The reference holds one Jena ``Model`` (a fully materialized in-memory bag
of triples) per run (NospaValidator.java:17,41-48).  Here the whole corpus
is ONE logical ``ray.data.Dataset`` of Arrow blocks with the schema below;
each source file is a *logical graph*, identified by the ``graph`` column
(``repo\\x1fpath\\x1fcommit``) so that 10^12 files are rows, not objects.

Term encoding
-------------
* ``subj``  — IRI string, or canonicalized blank-node id ``_:<label>``
              (labels are file-scoped; anonymous nodes get ``_:a<n>`` in
              deterministic parse order so task retries emit identical rows).
* ``pred``  — IRI string (~40 hot vocabulary terms; dictionary-encodes well).
* ``obj_kind`` — 0 = IRI, 1 = blank node, 2 = literal
              (Jena RDFNode.isURIResource/isAnon/isLiteral distinction).
* ``obj``   — IRI / bnode id / literal lexical form.
* ``obj_dt``, ``obj_lang`` — literal datatype IRI and language tag ("" if
              absent).  Term equality in every reference check is *term*
              identity (lexical + datatype + lang), never value arithmetic
              (e.g. ValidatorIC11_12.java:79), so strings suffice.
"""

from __future__ import annotations

import re

import pyarrow as pa

GRAPH_SEP = "\x1f"

_UNESC_RE = re.compile(r'\\(["\\nrt]|u001[Ee])')
_UNESC_MAP = {
    '"': '"', "\\": "\\", "n": "\n", "r": "\r", "t": "\t",
    "u001E": "\x1e", "u001e": "\x1e",
}

KIND_IRI = 0
KIND_BNODE = 1
KIND_LITERAL = 2

TRIPLE_SCHEMA = pa.schema(
    [
        ("graph", pa.string()),      # repo \x1f path \x1f commit
        ("file_sha256", pa.string()),
        ("subj", pa.string()),
        ("pred", pa.string()),
        ("obj_kind", pa.int8()),
        ("obj", pa.string()),
        ("obj_dt", pa.string()),
        ("obj_lang", pa.string()),
    ]
)

FINDINGS_SCHEMA = pa.schema(
    [
        ("graph", pa.string()),
        ("file_sha256", pa.string()),
        ("ic", pa.string()),         # "IC1" .. "IC21"
        ("subject", pa.string()),    # term string of the flagged node
        ("detail", pa.list_(pa.string())),  # sorted term strings
    ]
)


def make_graph_id(repo: str, path: str, commit: str) -> str:
    return f"{repo}{GRAPH_SEP}{path}{GRAPH_SEP}{commit}"


def split_graph_id(graph: str) -> tuple[str, str, str]:
    repo, path, commit = graph.split(GRAPH_SEP, 2)
    return repo, path, commit


def term_str(kind: int, lex: str, dt: str = "", lang: str = "") -> str:
    """Canonical single-string rendering of a term (N-Triples style).

    Used for finding details, set keys and value-set hashes, matching the
    role of Jena's RDFNode identity in HashSets
    (e.g. ValidatorIC11_12.java:70-80).
    """
    if kind == KIND_IRI:
        return f"<{lex}>"
    if kind == KIND_BNODE:
        return lex
    if (
        '"' in lex or "\\" in lex or "\n" in lex or "\r" in lex
        or "\t" in lex or "\x1e" in lex
    ):
        # \x1e doubles as the engine's detail/key separator (_DETAIL_SEP),
        # so it must never survive raw inside a rendered term
        lex = (
            lex.replace("\\", "\\\\")
            .replace('"', '\\"')
            .replace("\n", "\\n")
            .replace("\r", "\\r")
            .replace("\t", "\\t")
            .replace("\x1e", "\\u001E")
        )
    if lang:
        return f'"{lex}"@{lang}'
    if dt:
        return f'"{lex}"^^<{dt}>'
    return f'"{lex}"'


def parse_term(term: str) -> tuple[int, str, str, str]:
    """Inverse of :func:`term_str` → (kind, lex, dt, lang)."""
    if term.startswith("<"):
        return KIND_IRI, term[1:-1], "", ""
    if term.startswith("_:"):
        return KIND_BNODE, term, "", ""
    if term.endswith('"'):
        body, dt, lang = term[1:-1], "", ""
    elif term.endswith(">") and '"^^<' in term:
        body, dt = term[1:].rsplit('"^^<', 1)
        dt, lang = dt[:-1], ""
    else:
        body, lang = term[1:].rsplit('"@', 1)
        dt = ""
    if "\\" in body:
        body = _UNESC_RE.sub(lambda m: _UNESC_MAP[m.group(1)], body)
    return KIND_LITERAL, body, dt, lang
