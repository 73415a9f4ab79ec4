"""Pure-Python RDF parsers: Turtle (+N3 subset) and N-Triples.

The reference delegates parsing to Jena's ``model.read(stream, null, fmt)``
with the format inferred from the file extension (Main.java:23-43,
NospaValidator.java:40-48): .ttl → TURTLE, .nt → N-TRIPLE, .n3 → N3,
.xml/.rdf → RDF/XML.  This module is a from-scratch implementation sized
for the hot path of a Ray ``map_batches`` stage: one compiled master-regex
tokenizer, no per-character Python loops, all state local to a document.

Output triples are tuples ``(subj, pred, obj_kind, obj, obj_dt, obj_lang)``
using the term encoding of :mod:`..model`.  Blank nodes are canonicalized
per document: labelled nodes keep ``_:<label>``, anonymous ``[...]`` / ``()``
nodes get ``_:a<n>`` in deterministic parse order (stable across Ray task
retries because parsing is a pure function of the content string).
"""

from __future__ import annotations

import re
from typing import Iterator

from ..vocab import (
    PREFIX_RDF,
    RDF_first,
    RDF_nil,
    RDF_rest,
    RDF_type,
    XSD_boolean,
    XSD_decimal,
    XSD_double,
    XSD_integer,
)
from ..model import KIND_BNODE, KIND_IRI, KIND_LITERAL

Triple = tuple[str, str, int, str, str, str]


class RDFSyntaxError(ValueError):
    pass


# ---------------------------------------------------------------------------
# Tokenizer
# ---------------------------------------------------------------------------

# alternatives ordered by corpus frequency (WS > PUNCT > IRIREF > PNAME >
# numbers > strings > …) subject to the REQUIRED precedences: PUNCT '.'
# must not shadow DECIMAL (kept safe because DECIMAL needs a digit and
# PUNCT '.' only matches when followed by non-digit via lookahead below);
# PREFIX_DECL before LANGTAG ('@prefix') and before PNAME ('PREFIX');
# BNODE before PNAME ('_:x' would parse as prefix '_'); STRING long forms
# before short; DOUBLE before DECIMAL before INTEGER.
_TOKEN_RE = re.compile(
    r"""
    (?P<WS>\s+)
  | (?P<PUNCT>[;,\[\](){}]|\.(?![0-9]))
  | (?P<IRIREF><[^<>"{}|^`\\\x00-\x20]*>)
  | (?P<PREFIX_DECL>@prefix|@base|(?i:PREFIX(?=\s))|(?i:BASE(?=\s)))
  | (?P<BNODE>_:[A-Za-z0-9_.\-]*[A-Za-z0-9_\-])
  | (?P<PNAME>(?:[A-Za-z_][A-Za-z0-9_.\-]*)?:(?:\\[_~.\-!$&'()*+,;=/?\#@%]|[A-Za-z0-9_:%\-]|\.(?=[A-Za-z0-9_:%\-\\.])|[^\x00-\x7F])*|[A-Za-z_][A-Za-z0-9_\-]*)
  | (?P<DOUBLE>[+-]?(?:\d+\.\d*[eE][+-]?\d+|\.?\d+[eE][+-]?\d+))
  | (?P<DECIMAL>[+-]?\d*\.\d+)
  | (?P<INTEGER>[+-]?\d+)
  | (?P<STRING_LONG2>\"\"\"(?:[^"\\]|\\.|\"(?!\"\"))*\"\"\")
  | (?P<STRING_LONG1>'''(?:[^'\\]|\\.|'(?!''))*''')
  | (?P<STRING2>\"(?:[^"\\\n]|\\.)*\")
  | (?P<STRING1>'(?:[^'\\\n]|\\.)*')
  | (?P<LANGTAG>@[a-zA-Z]+(?:-[a-zA-Z0-9]+)*)
  | (?P<DTSEP>\^\^)
  | (?P<COMMENT>\#[^\n]*)
  | (?P<ERR>\S)
    """,
    re.VERBOSE,
)

_ESCAPE_RE = re.compile(r"\\(u[0-9a-fA-F]{4}|U[0-9a-fA-F]{8}|[tbnrf\"'\\])")
_ESCAPE_MAP = {"t": "\t", "b": "\b", "n": "\n", "r": "\r", "f": "\f", '"': '"', "'": "'", "\\": "\\"}
_LOCAL_ESC_RE = re.compile(r"\\([_~.\-!$&'()*+,;=/?#@%])")


def _unescape(s: str) -> str:
    def repl(m: re.Match) -> str:
        g = m.group(1)
        if g[0] == "u":
            return chr(int(g[1:], 16))
        if g[0] == "U":
            return chr(int(g[1:], 16))
        return _ESCAPE_MAP[g]

    return _ESCAPE_RE.sub(repl, s)


def _tokenize(text: str) -> list[tuple[str, str]]:
    # WS is matched (one cheap first-alternative hit per run of whitespace
    # beats per-position failure scans) but filtered here; the ERR
    # catch-all (\S) turns any unmatchable non-space character into its own
    # token (raised below), so no contiguity bookkeeping is needed and the
    # whole scan is one comprehension over the master regex
    tokens = [
        (m.lastgroup, m.group())
        for m in _TOKEN_RE.finditer(text)
        if m.lastgroup != "WS" and m.lastgroup != "COMMENT"
    ]
    if tokens and any(k == "ERR" for k, _ in tokens):
        bad = next(v for k, v in tokens if k == "ERR")
        raise RDFSyntaxError(f"unrecognized input near {bad!r}")
    return tokens


# ---------------------------------------------------------------------------
# Turtle parser
# ---------------------------------------------------------------------------


class TurtleParser:
    """Recursive-descent parser over the token stream.

    Supports the Turtle features the reference's inputs use (@prefix/@base,
    prefixed names, 'a', object/predicate lists, anonymous and labelled
    blank nodes, collections, numeric/boolean/string literals with language
    tags and datatypes), which also covers machine-generated N3.
    """

    def __init__(self) -> None:
        self.prefixes: dict[str, str] = {}
        self.base = ""
        self.triples: list[Triple] = []
        self._anon = 0
        self._tokens: list[tuple[str, str]] = []
        self._i = 0
        # term memo: raw PNAME/IRIREF/numeric token → resolved term tuple
        # (cube serializations repeat a small term vocabulary millions of
        # times; resolution becomes one dict hit after first sight)
        self._term_cache: dict[str, tuple] = {}
        self._pred_cache: dict[str, str] = {}
        self._anon_prefix = "a"   # chunked parses use "c<i>_a" to keep
                                  # anonymous bnode ids document-unique
        self._used_labels: set[str] = set()

    # -- token helpers ----------------------------------------------------

    def _peek(self) -> tuple[str, str]:
        if self._i >= len(self._tokens):
            return ("EOF", "")
        return self._tokens[self._i]

    def _next(self) -> tuple[str, str]:
        tok = self._peek()
        self._i += 1
        return tok

    def _expect_punct(self, ch: str) -> None:
        kind, val = self._next()
        if kind != "PUNCT" or val != ch:
            raise RDFSyntaxError(f"expected {ch!r}, got {kind} {val!r} at token {self._i}")

    def _new_anon(self) -> str:
        # deterministic ids that can NEVER merge with a user-labelled
        # blank node: skip over labels the document itself uses (collected
        # once in parse(); Jena keeps labelled and anonymous nodes distinct)
        while True:
            self._anon += 1
            label = f"{self._anon_prefix}{self._anon}"
            if label not in self._used_labels:
                return f"_:{label}"

    # -- term production --------------------------------------------------

    def _resolve_iri(self, raw: str) -> str:
        iri = _unescape(raw[1:-1])
        if self.base and not re.match(r"^[A-Za-z][A-Za-z0-9+.\-]*:", iri):
            # RFC 3986 reference resolution (dot segments, fragments,
            # absolute paths) — naive concatenation produced IRIs Jena
            # never would (e.g. base <http://x/a/b> + <c> must be
            # <http://x/a/c>, not <http://x/a/bc>)
            from urllib.parse import urljoin

            return urljoin(self.base, iri)
        return iri

    def _resolve_pname(self, raw: str) -> str:
        if ":" not in raw:
            raise RDFSyntaxError(f"bare word {raw!r} is not a valid term")
        prefix, local = raw.split(":", 1)
        ns = self.prefixes.get(prefix)
        if ns is None:
            raise RDFSyntaxError(f"undefined prefix {prefix!r}:")
        return ns + _LOCAL_ESC_RE.sub(r"\1", local)

    def _string_value(self, kind: str, val: str) -> str:
        if kind in ("STRING_LONG2", "STRING_LONG1"):
            return _unescape(val[3:-3])
        return _unescape(val[1:-1])

    def _parse_term(self, kind: str, val: str):
        """Returns (kind, lex, dt, lang)."""
        cached = self._term_cache.get(val) if kind[0] in "IPBD" else None
        if cached is not None:
            return cached
        if kind == "IRIREF":
            t = (KIND_IRI, self._resolve_iri(val), "", "")
            self._term_cache[val] = t
            return t
        if kind == "PNAME":
            if val == "a":
                return (KIND_IRI, RDF_type, "", "")
            if val == "true" or val == "false":
                return (KIND_LITERAL, val, XSD_boolean, "")
            t = (KIND_IRI, self._resolve_pname(val), "", "")
            self._term_cache[val] = t
            return t
        if kind == "BNODE":
            t = (KIND_BNODE, "_:" + val[2:], "", "")
            self._term_cache[val] = t
            return t
        if kind == "INTEGER":
            return (KIND_LITERAL, val, XSD_integer, "")
        if kind == "DECIMAL":
            t = (KIND_LITERAL, val, XSD_decimal, "")
            self._term_cache[val] = t
            return t
        if kind == "DOUBLE":
            t = (KIND_LITERAL, val, XSD_double, "")
            self._term_cache[val] = t
            return t
        if kind.startswith("STRING"):
            lex = self._string_value(kind, val)
            nkind, nval = self._peek()
            if nkind == "LANGTAG":
                self._next()
                return (KIND_LITERAL, lex, "", nval[1:])
            if nkind == "DTSEP":
                self._next()
                dkind, dval = self._next()
                if dkind == "IRIREF":
                    dt = self._resolve_iri(dval)
                elif dkind == "PNAME":
                    dt = self._resolve_pname(dval)
                else:
                    raise RDFSyntaxError(f"bad datatype token {dkind}")
                return (KIND_LITERAL, lex, dt, "")
            return (KIND_LITERAL, lex, "", "")
        if kind == "PUNCT" and val == "[":
            node = self._new_anon()
            nkind, nval = self._peek()
            if nkind == "PUNCT" and nval == "]":
                self._next()
            else:
                self._parse_predicate_object_list(node)
                self._expect_punct("]")
            return (KIND_BNODE, node, "", "")
        if kind == "PUNCT" and val == "(":
            head = self._parse_collection()
            # an empty collection IS the IRI rdf:nil, not a blank node
            return (KIND_IRI if head == RDF_nil else KIND_BNODE, head, "", "")
        raise RDFSyntaxError(f"unexpected token {kind} {val!r}")

    def _parse_collection(self) -> str:
        items = []
        while True:
            kind, val = self._next()
            if kind == "PUNCT" and val == ")":
                break
            items.append(self._parse_term(kind, val))
        if not items:
            return RDF_nil
        head = self._new_anon()
        cur = head
        for idx, (k, lex, dt, lang) in enumerate(items):
            self.triples.append((cur, RDF_first, k, lex, dt, lang))
            if idx == len(items) - 1:
                self.triples.append((cur, RDF_rest, KIND_IRI, RDF_nil, "", ""))
            else:
                nxt = self._new_anon()
                self.triples.append((cur, RDF_rest, KIND_BNODE, nxt, "", ""))
                cur = nxt
        return head

    # -- statement productions -------------------------------------------

    def _parse_predicate_object_list(self, subj: str) -> None:
        tokens = self._tokens
        n = len(tokens)
        append = self.triples.append
        pred_cache = self._pred_cache
        term_cache = self._term_cache
        while True:
            if self._i >= n:
                raise RDFSyntaxError("unexpected end of input in predicate list")
            kind, val = tokens[self._i]
            self._i += 1
            pred = pred_cache.get(val)
            if pred is None:
                if kind == "PNAME" and val == "a":
                    pred = RDF_type
                elif kind == "IRIREF":
                    pred = self._resolve_iri(val)
                elif kind == "PNAME":
                    pred = self._resolve_pname(val)
                else:
                    raise RDFSyntaxError(f"expected predicate, got {kind} {val!r}")
                pred_cache[val] = pred
            # object list
            while True:
                if self._i >= n:
                    raise RDFSyntaxError("unexpected end of input in object list")
                kind, val = tokens[self._i]
                self._i += 1
                t = term_cache.get(val) if kind[0] in "IPBD" else None
                if t is None:
                    t = self._parse_term(kind, val)
                append((subj, pred, t[0], t[1], t[2], t[3]))
                if self._i < n:
                    nkind, nval = tokens[self._i]
                    if nkind == "PUNCT" and nval == ",":
                        self._i += 1
                        continue
                break
            if self._i < n:
                nkind, nval = tokens[self._i]
                if nkind == "PUNCT" and nval == ";":
                    self._i += 1
                    # the grammar is (';' (verb objectList)?)*: consecutive
                    # and trailing semicolons are all legal — skip them
                    while self._i < n:
                        nkind, nval = tokens[self._i]
                        if nkind == "PUNCT" and nval == ";":
                            self._i += 1
                            continue
                        break
                    if self._i < n:
                        nkind, nval = tokens[self._i]
                        # '}' closes a TriG graph block (trailing ';' form)
                        if nkind == "PUNCT" and nval in (".", "]", "}"):
                            return
                    continue
            return

    def _parse_directive(self, val: str) -> None:
        """@prefix / @base / PREFIX / BASE (shared by Turtle and TriG)."""
        decl = val.lower()
        if decl in ("@prefix", "prefix"):
            pkind, pval = self._next()
            if pkind != "PNAME" or not pval.endswith(":"):
                # PNAME token for "p:" — prefix decl has empty local
                if pkind != "PNAME" or ":" not in pval:
                    raise RDFSyntaxError(f"bad prefix declaration near {pval!r}")
            prefix = pval.split(":", 1)[0]
            ikind, ival = self._next()
            if ikind != "IRIREF":
                raise RDFSyntaxError("prefix declaration requires IRIREF")
            ns = _unescape(ival[1:-1])
            # legal Turtle may redefine a prefix mid-document: the
            # term/pred caches are keyed on raw tokens, so entries
            # resolved under the old namespace must be dropped
            if self.prefixes.get(prefix, ns) != ns:
                self._term_cache.clear()
                self._pred_cache.clear()
            self.prefixes[prefix] = ns
        else:  # @base / BASE
            ikind, ival = self._next()
            if ikind != "IRIREF":
                raise RDFSyntaxError("base declaration requires IRIREF")
            newbase = _unescape(ival[1:-1])
            # cached relative-IRI resolutions depend on the base
            if self.base != newbase:
                self._term_cache.clear()
                self._pred_cache.clear()
            self.base = newbase
        if decl.startswith("@"):
            self._expect_punct(".")

    def parse(self, text: str) -> list[Triple]:
        self._tokens = _tokenize(text)
        self._i = 0
        self._used_labels = {
            v[2:] for k, v in self._tokens if k == "BNODE"
        }
        while True:
            kind, val = self._next()
            if kind == "EOF":
                break
            if kind == "PREFIX_DECL":
                self._parse_directive(val)
                continue
            # subject; only a standalone '[...]' property list may omit
            # the predicate-object list (Turtle: triples ::= subject
            # predicateObjectList | blankNodePropertyList p-o-list?)
            skind, slex, _, _ = self._parse_term(kind, val)
            if skind == KIND_LITERAL:
                raise RDFSyntaxError("literal cannot be a subject")
            nkind, nval = self._peek()
            if nkind == "PUNCT" and nval == ".":
                if not (kind == "PUNCT" and val == "["):
                    raise RDFSyntaxError(
                        f"subject {slex!r} has no predicate-object list"
                    )
            else:
                self._parse_predicate_object_list(slex)
            self._expect_punct(".")
        return self.triples


# ---------------------------------------------------------------------------
# N-Triples parser (fast line-based path)
# ---------------------------------------------------------------------------

# IRIREF body (same character class as the Turtle tokenizer's IRIREF token)
# and BCP-47-shaped language tag — the line formats must not be laxer than
# the tokenizer, or grammar-invalid input "parses" here and round-trips fail
_IRI_BODY = r'[^<>"{}|^`\\\x00-\x20]*'
_LANG_TAG = r"[a-zA-Z]+(?:-[a-zA-Z0-9]+)*"

_NT_LINE_RE = re.compile(
    rf"""^[ \t]*
    (?:(?P<s_iri><{_IRI_BODY}>)|(?P<s_bn>_:\S+))
    [ \t]+<(?P<p>{_IRI_BODY})>[ \t]+
    (?:(?P<o_iri><{_IRI_BODY}>)
      |(?P<o_bn>_:[^ \t]+)
      |"(?P<o_lit>(?:[^"\\]|\\.)*)"
        (?:\^\^<(?P<o_dt>{_IRI_BODY})>|@(?P<o_lang>{_LANG_TAG}))?
    )
    [ \t]*\.[ \t]*(?:\#.*)?$""",
    re.VERBOSE,
)


def parse_ntriples(text: str) -> list[Triple]:
    triples: list[Triple] = []
    append = triples.append
    for line in text.split("\n"):
        line = line.strip()
        if not line or line.startswith("#"):
            continue
        m = _NT_LINE_RE.match(line)
        if m is None:
            raise RDFSyntaxError(f"bad N-Triples line: {line[:80]!r}")
        if m.group("s_iri"):
            s = _unescape(m.group("s_iri")[1:-1])
        else:
            s = m.group("s_bn")
        p = _unescape(m.group("p"))
        if m.group("o_iri"):
            append((s, p, KIND_IRI, _unescape(m.group("o_iri")[1:-1]), "", ""))
        elif m.group("o_bn"):
            append((s, p, KIND_BNODE, m.group("o_bn"), "", ""))
        else:
            append(
                (
                    s,
                    p,
                    KIND_LITERAL,
                    _unescape(m.group("o_lit")),
                    _unescape(m.group("o_dt") or ""),
                    m.group("o_lang") or "",
                )
            )
    return triples


# ---------------------------------------------------------------------------
# TriG parser (RDF 1.1: Turtle + named-graph blocks)
# ---------------------------------------------------------------------------


class TriGParser(TurtleParser):
    """TriG = every Turtle production plus the block grammar
    ``GRAPH? (iri|bnode) '{' stmts '}'`` / ``'{' stmts '}'`` / plain
    Turtle statements (default graph).  Reuses the Turtle tokenizer,
    term productions and directive handling wholesale; only the
    top-level loop differs.  Emits (graph_label, triple) pairs — ""
    marks the default graph, matching parse_nquads."""

    def _graph_label(self, kind: str, val: str) -> str:
        if kind == "IRIREF":
            return self._resolve_iri(val)
        if kind == "PNAME":
            return self._resolve_pname(val)
        if kind == "BNODE":
            return "_:" + val[2:]
        raise RDFSyntaxError(f"bad graph label token {kind} {val!r}")

    def _statement(self, kind: str, val: str) -> None:
        """One triples-statement starting at the already-consumed subject
        token; the terminator ('.' or a block's '}') stays unconsumed.
        Only a standalone ``[...]`` blank-node property list may omit the
        predicate-object list (it already emitted its triples) — a bare
        IRI/PNAME/BNODE subject followed by '.' or '}' is a syntax error."""
        skind, slex, _, _ = self._parse_term(kind, val)
        if skind == KIND_LITERAL:
            raise RDFSyntaxError("literal cannot be a subject")
        nkind, nval = self._peek()
        if nkind == "PUNCT" and nval in (".", "}"):
            if not (kind == "PUNCT" and val == "["):
                raise RDFSyntaxError(
                    f"subject {slex!r} has no predicate-object list"
                )
        else:
            self._parse_predicate_object_list(slex)

    def _parse_block(self, g: str) -> None:
        while True:
            kind, val = self._next()
            if kind == "PUNCT" and val == "}":
                return
            if kind == "EOF":
                raise RDFSyntaxError("unterminated graph block")
            before = len(self.triples)
            self._statement(kind, val)
            self.graphs.extend([g] * (len(self.triples) - before))
            # TriG makes the final statement's '.' optional before '}'
            nkind, nval = self._peek()
            if nkind == "PUNCT" and nval == ".":
                self._next()

    def parse_quads(self, text: str) -> list[tuple[str, Triple]]:
        self._tokens = _tokenize(text)
        self._i = 0
        self._used_labels = {v[2:] for k, v in self._tokens if k == "BNODE"}
        self.graphs: list[str] = []
        while True:
            kind, val = self._next()
            if kind == "EOF":
                break
            if kind == "PREFIX_DECL":
                self._parse_directive(val)
                continue
            if kind == "PNAME" and val.lower() == "graph":
                gkind, gval = self._next()
                g = self._graph_label(gkind, gval)
                self._expect_punct("{")
                self._parse_block(g)
                continue
            if kind == "PUNCT" and val == "{":
                self._parse_block("")
                continue
            nkind, nval = self._peek()
            if (
                kind in ("IRIREF", "PNAME", "BNODE")
                and nkind == "PUNCT"
                and nval == "{"
            ):
                g = self._graph_label(kind, val)
                self._next()
                self._parse_block(g)
                continue
            # plain Turtle statement in the default graph
            before = len(self.triples)
            self._statement(kind, val)
            self.graphs.extend([""] * (len(self.triples) - before))
            self._expect_punct(".")
        return list(zip(self.graphs, self.triples))


def parse_trig(text: str, anon_prefix: str = "a") -> list[tuple[str, Triple]]:
    p = TriGParser()
    p._anon_prefix = anon_prefix
    return p.parse_quads(text)


# ---------------------------------------------------------------------------
# N-Quads parser (N-Triples line + optional graph label, RDF 1.1 N-Quads)
# ---------------------------------------------------------------------------

_NQ_LINE_RE = re.compile(
    rf"""^[ \t]*
    (?:(?P<s_iri><{_IRI_BODY}>)|(?P<s_bn>_:\S+))
    [ \t]+<(?P<p>{_IRI_BODY})>[ \t]+
    (?:(?P<o_iri><{_IRI_BODY}>)
      |(?P<o_bn>_:[^ \t]+)
      |"(?P<o_lit>(?:[^"\\]|\\.)*)"
        (?:\^\^<(?P<o_dt>{_IRI_BODY})>|@(?P<o_lang>{_LANG_TAG}))?
    )
    (?:[ \t]+(?:(?P<g_iri><{_IRI_BODY}>)|(?P<g_bn>_:[^ \t]+)))?
    [ \t]*\.[ \t]*(?:\#.*)?$""",
    re.VERBOSE,
)


def parse_nquads(text: str) -> list[tuple[str, Triple]]:
    """N-Quads → (graph_label, triple) pairs.  A line without a graph
    label belongs to the default graph: graph_label is "" and the caller
    assigns its own scope (ParseRDF uses the file's graph id, matching
    how every 3-term format is scoped)."""
    quads: list[tuple[str, Triple]] = []
    append = quads.append
    for line in text.split("\n"):
        line = line.strip()
        if not line or line.startswith("#"):
            continue
        m = _NQ_LINE_RE.match(line)
        if m is None:
            raise RDFSyntaxError(f"bad N-Quads line: {line[:80]!r}")
        if m.group("s_iri"):
            s = _unescape(m.group("s_iri")[1:-1])
        else:
            s = m.group("s_bn")
        p = _unescape(m.group("p"))
        if m.group("g_iri"):
            g = _unescape(m.group("g_iri")[1:-1])
        else:
            g = m.group("g_bn") or ""
        if m.group("o_iri"):
            t = (s, p, KIND_IRI, _unescape(m.group("o_iri")[1:-1]), "", "")
        elif m.group("o_bn"):
            t = (s, p, KIND_BNODE, m.group("o_bn"), "", "")
        else:
            t = (
                s,
                p,
                KIND_LITERAL,
                _unescape(m.group("o_lit")),
                _unescape(m.group("o_dt") or ""),
                m.group("o_lang") or "",
            )
        append((g, t))
    return quads


def parse_turtle(text: str, anon_prefix: str = "a") -> list[Triple]:
    p = TurtleParser()
    p._anon_prefix = anon_prefix
    return p.parse(text)


_PREFIX_LINE_RE = re.compile(
    r"^[ \t]*(?:@prefix[^\n]*|@base[^\n]*|(?i:PREFIX)[ \t][^\n]*|(?i:BASE)[ \t][^\n]*)$",
    re.MULTILINE,
)


# quote-state scan: every token that could hide a quote or a blank line —
# long strings (the only construct that may CONTAIN a blank line), short
# strings, IRIREFs and comments — so split boundaries never land inside one
_QSCAN_RE = re.compile(
    r'"""(?:[^"\\]|\\.|"(?!""))*"""'
    r"|'''(?:[^'\\]|\\.|'(?!''))*'''"
    r'|"(?:[^"\n\\]|\\.)*"'
    r"|'(?:[^'\n\\]|\\.)*'"
    r"|<[^>\n]*>"
    r"|#[^\n]*",
    re.S,
)


def _long_string_spans(text: str) -> list[tuple[int, int]]:
    """(start, end) spans of tokens that span multiple lines (triple-quoted
    long strings) — the regions a blank-line chunk boundary must avoid."""
    return [
        m.span()
        for m in _QSCAN_RE.finditer(text)
        if m.group(0)[0] in "\"'" and "\n" in m.group(0)
    ]


def split_turtle(text: str, chunk_bytes: int) -> list[str]:
    """Split a large Turtle document into independently parseable chunks at
    blank-line statement boundaries (the layout of machine-generated
    dumps; every chunk must end with a top-level '.').  All prefix/base
    declarations are replicated into every chunk.  Candidate boundaries
    inside triple-quoted long strings are skipped (a blank line inside a
    literal is data, not a boundary).  Raises if a candidate boundary does
    not close a statement — the caller then falls back to whole-document
    parsing."""
    spans = _long_string_spans(text)

    def outside_spans(pos: int) -> bool:
        for s0, e0 in spans:
            if s0 <= pos < e0:
                return False
            if s0 > pos:
                break
        return True

    # positional prefix/base declarations, EXCLUDING prefix-looking lines
    # inside long-string literals (data, not declarations) — each chunk's
    # header replays only the declarations in force at its start position,
    # in document order, so mid-document redefinition resolves identically
    # to the whole-file parse
    decls = [
        (m.start(), m.group(0))
        for m in _PREFIX_LINE_RE.finditer(text)
        if outside_spans(m.start())
    ]
    chunks: list[tuple[int, str]] = []
    n = len(text)
    start = 0
    si = 0
    while start < n:
        if n - start <= chunk_bytes:
            chunks.append((start, text[start:]))
            break
        cut = text.find("\n\n", start + chunk_bytes)
        while cut != -1:
            while si < len(spans) and spans[si][1] <= cut:
                si += 1
            if si < len(spans) and spans[si][0] <= cut:
                cut = text.find("\n\n", spans[si][1])  # inside a long string
                continue
            break
        if cut == -1:
            chunks.append((start, text[start:]))
            break
        piece = text[start:cut]
        if not piece.rstrip().endswith("."):
            raise RDFSyntaxError(
                "blank-line boundary does not close a statement; "
                "cannot chunk this document"
            )
        chunks.append((start, piece))
        start = cut + 2

    out = []
    for i, (pos, c) in enumerate(chunks):
        if i == 0:
            out.append(c)
            continue
        header = "\n".join(d for p, d in decls if p < pos)
        out.append(header + "\n" + c if header else c)
    return out


# ---------------------------------------------------------------------------
# RDF/XML parser (subset)
# ---------------------------------------------------------------------------

_RDF_NS = PREFIX_RDF


_XML_NS = "http://www.w3.org/XML/1998/namespace"
_ABS_IRI_RE = re.compile(r"^[A-Za-z][A-Za-z0-9+.\-]*:")

# attributes that are syntax, not property attributes
_SYNTAX_ATTRS = {
    f"{{{PREFIX_RDF}}}about",
    f"{{{PREFIX_RDF}}}ID",
    f"{{{PREFIX_RDF}}}nodeID",
    f"{{{PREFIX_RDF}}}resource",
    f"{{{PREFIX_RDF}}}datatype",
    f"{{{PREFIX_RDF}}}parseType",
    f"{{{_XML_NS}}}lang",
    f"{{{_XML_NS}}}base",
}


def parse_rdfxml(text: str) -> list[Triple]:
    """RDF/XML reader covering what Jena accepts for cube corpora
    (Main.java:23-28 maps .rdf/.xml here): rdf:Description / typed node
    elements, rdf:about / rdf:ID / rdf:nodeID / rdf:resource, nested node
    elements, rdf:datatype, property attributes, inherited xml:lang,
    **xml:base** resolution (relative rdf:about/resource, rdf:ID →
    base#id), **rdf:li** container expansion (rdf:_1, rdf:_2, … numbered
    per node element), and **rdf:parseType** "Resource" (inline blank
    node), "Collection" (rdf:first/rdf:rest list, empty → rdf:nil) and
    "Literal" (inner XML serialized as an rdf:XMLLiteral-typed literal).
    rdf:ID on a property element (reification) emits the base triple and
    ignores the reification quad."""
    import xml.etree.ElementTree as ET

    try:
        root = ET.fromstring(text)
    except ET.ParseError as exc:  # pragma: no cover
        raise RDFSyntaxError(str(exc)) from exc

    triples: list[Triple] = []
    anon = [0]
    used_labels = {
        el.get(f"{{{PREFIX_RDF}}}nodeID")
        for el in root.iter()
        if el.get(f"{{{PREFIX_RDF}}}nodeID") is not None
    }

    def qname(tag: str) -> str:
        if tag.startswith("{"):
            ns, local = tag[1:].split("}", 1)
            return ns + local
        return tag

    def new_anon() -> str:
        # never collide with a document-labelled rdf:nodeID
        while True:
            anon[0] += 1
            if f"a{anon[0]}" not in used_labels:
                return f"_:a{anon[0]}"

    def resolve(iri: str, base: str) -> str:
        if not base or _ABS_IRI_RE.match(iri):
            return iri
        from urllib.parse import urljoin

        return urljoin(base, iri)

    def scope(el, base: str, lang: str) -> tuple[str, str]:
        b = el.get(f"{{{_XML_NS}}}base")
        lg = el.get(f"{{{_XML_NS}}}lang")
        return (resolve(b, base) if b is not None else base,
                lg if lg is not None else lang)

    def node_id(el, base: str) -> tuple[int, str]:
        about = el.get(f"{{{_RDF_NS}}}about")
        if about is not None:
            return KIND_IRI, resolve(about, base)
        rid = el.get(f"{{{_RDF_NS}}}ID")
        if rid is not None:
            return KIND_IRI, resolve("#" + rid, base)
        nid = el.get(f"{{{_RDF_NS}}}nodeID")
        if nid is not None:
            return KIND_BNODE, "_:" + nid
        return KIND_BNODE, new_anon()

    def prop_attrs(el, s: str, base: str, lang: str) -> None:
        for attr, val in el.attrib.items():
            if attr in _SYNTAX_ATTRS:
                continue
            if not attr.startswith("{"):
                continue  # no namespace → not a property attribute
            p = qname(attr)
            if p == _RDF_NS + "type":
                triples.append((s, RDF_type, KIND_IRI, resolve(val, base), "", ""))
            else:
                triples.append((s, p, KIND_LITERAL, val, "", lang))

    def walk_node(el, base: str, lang: str) -> tuple[int, str]:
        base, lang = scope(el, base, lang)
        skind, s = node_id(el, base)
        tag = qname(el.tag)
        if tag != _RDF_NS + "Description":
            triples.append((s, RDF_type, KIND_IRI, tag, "", ""))
        prop_attrs(el, s, base, lang)
        li_count = [0]
        for prop in el:
            walk_prop(prop, s, base, lang, li_count)
        return skind, s

    def walk_prop(prop, s: str, base: str, lang: str, li_count: list) -> None:
        pbase, plang = scope(prop, base, lang)
        p = qname(prop.tag)
        if p == _RDF_NS + "li":
            li_count[0] += 1
            p = f"{_RDF_NS}_{li_count[0]}"
        res = prop.get(f"{{{_RDF_NS}}}resource")
        nid = prop.get(f"{{{_RDF_NS}}}nodeID")
        dt = prop.get(f"{{{_RDF_NS}}}datatype")
        ptype = prop.get(f"{{{_RDF_NS}}}parseType")
        children = list(prop)
        if ptype == "Resource":
            node = new_anon()
            triples.append((s, p, KIND_BNODE, node, "", ""))
            inner_li = [0]
            for sub in children:
                walk_prop(sub, node, pbase, plang, inner_li)
            return
        if ptype == "Collection":
            if not children:
                triples.append((s, p, KIND_IRI, RDF_nil, "", ""))
                return
            items = [walk_node(c, pbase, plang) for c in children]
            head = new_anon()
            triples.append((s, p, KIND_BNODE, head, "", ""))
            cur = head
            for idx, (okind, o) in enumerate(items):
                triples.append((cur, RDF_first, okind, o, "", ""))
                if idx == len(items) - 1:
                    triples.append((cur, RDF_rest, KIND_IRI, RDF_nil, "", ""))
                else:
                    nxt = new_anon()
                    triples.append((cur, RDF_rest, KIND_BNODE, nxt, "", ""))
                    cur = nxt
            return
        if ptype == "Literal":
            import xml.etree.ElementTree as ET

            inner = (prop.text or "") + "".join(
                ET.tostring(c, encoding="unicode") for c in children
            )
            triples.append(
                (s, p, KIND_LITERAL, inner, _RDF_NS + "XMLLiteral", "")
            )
            return
        if res is not None:
            triples.append((s, p, KIND_IRI, resolve(res, pbase), "", ""))
            obj_attrs = {
                a: v for a, v in prop.attrib.items() if a not in _SYNTAX_ATTRS
            }
            if obj_attrs:
                prop_attrs(prop, resolve(res, pbase), pbase, plang)
            return
        if nid is not None:
            triples.append((s, p, KIND_BNODE, "_:" + nid, "", ""))
            return
        if children:
            okind, o = walk_node(children[0], pbase, plang)
            triples.append((s, p, okind, o, "", ""))
            return
        obj_attrs = {a: v for a, v in prop.attrib.items() if a not in _SYNTAX_ATTRS}
        if obj_attrs and (prop.text or "").strip() == "":
            # empty property element with property attributes → blank node
            node = new_anon()
            triples.append((s, p, KIND_BNODE, node, "", ""))
            prop_attrs(prop, node, pbase, plang)
            return
        # a datatyped literal has NO language tag (the inherited xml:lang
        # does not apply once rdf:datatype is present)
        triples.append(
            (s, p, KIND_LITERAL, prop.text or "", dt or "", "" if dt else plang)
        )

    root_base, root_lang = "", ""
    root_tag = qname(root.tag)
    if root_tag == _RDF_NS + "RDF":
        root_base, root_lang = scope(root, root_base, root_lang)
        nodes = list(root)
    else:
        nodes = [root]
    for el in nodes:
        walk_node(el, root_base, root_lang)
    return triples


_FORMAT_ALIASES = {
    "turtle": "turtle",
    "ttl": "turtle",
    "n3": "turtle",
    "ntriples": "ntriples",
    "n-triples": "ntriples",
    "nt": "ntriples",
    "rdfxml": "rdfxml",
    "rdf/xml": "rdfxml",
    "rdf": "rdfxml",
    "xml": "rdfxml",
    "nquads": "nquads",
    "n-quads": "nquads",
    "nq": "nquads",
    "trig": "trig",
}


def format_for(lang: str, path: str) -> str | None:
    """Parser dispatch: the ``lang`` column first, then the file extension
    (the reference's ext→format map, Main.java:23-43).  Returns None for
    non-RDF rows (they are filtered out, not errors)."""
    key = (lang or "").strip().lower()
    if key in _FORMAT_ALIASES:
        return _FORMAT_ALIASES[key]
    dot = path.rfind(".")
    if dot != -1:
        ext = path[dot + 1 :].lower()
        if ext in _FORMAT_ALIASES:
            return _FORMAT_ALIASES[ext]
    return None


def parse_document(content: str, fmt: str) -> list[Triple]:
    if fmt == "turtle":
        return parse_turtle(content)
    if fmt == "ntriples":
        return parse_ntriples(content)
    if fmt == "rdfxml":
        return parse_rdfxml(content)
    if fmt == "nquads":
        # graph labels dropped: callers that scope by graph (ParseRDF)
        # call parse_nquads directly
        return [t for _, t in parse_nquads(content)]
    if fmt == "trig":
        return [t for _, t in parse_trig(content)]
    raise RDFSyntaxError(f"unsupported format {fmt!r}")


def iter_documents(contents, fmts) -> Iterator[list[Triple]]:
    for content, fmt in zip(contents, fmts):
        yield parse_document(content, fmt)
