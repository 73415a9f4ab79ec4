"""Property-based tests (hypothesis): term-encoding round trips, N-Triples
serialization round trips, and parse determinism (retries must emit
identical triples — the engine's lineage-retry safety depends on it)."""

import string

from hypothesis import given, settings, strategies as st

from nospa_rdf_data_cube_validator_ray.model import (
    KIND_BNODE,
    KIND_IRI,
    KIND_LITERAL,
    parse_term,
    term_str,
)
from nospa_rdf_data_cube_validator_ray.sources.rdf_parser import (
    parse_ntriples,
    parse_turtle,
)

_iri = st.text(
    alphabet=string.ascii_letters + string.digits + ":/#.-_~%",
    min_size=1,
    max_size=40,
).map(lambda s: "http://e.org/" + s.replace(" ", ""))

_lex = st.text(
    alphabet=string.printable, min_size=0, max_size=60
).filter(lambda s: "\r" not in s)

_lang = st.sampled_from(["", "en", "en-GB", "de", "zh-Hans"])


@st.composite
def terms(draw):
    kind = draw(st.sampled_from([KIND_IRI, KIND_BNODE, KIND_LITERAL]))
    if kind == KIND_IRI:
        return (kind, draw(_iri), "", "")
    if kind == KIND_BNODE:
        label = draw(st.text(alphabet=string.ascii_letters + string.digits, min_size=1, max_size=12))
        return (kind, "_:" + label, "", "")
    lex = draw(_lex)
    lang = draw(_lang)
    dt = "" if lang else draw(st.one_of(st.just(""), _iri))
    return (kind, lex, dt, lang)


@given(terms())
@settings(max_examples=300, deadline=None)
def test_term_str_round_trip(t):
    kind, lex, dt, lang = t
    assert parse_term(term_str(kind, lex, dt, lang)) == t


def _nt_escape(s: str) -> str:
    return (
        s.replace("\\", "\\\\")
        .replace('"', '\\"')
        .replace("\n", "\\n")
        .replace("\r", "\\r")
        .replace("\t", "\\t")
    )


@given(st.lists(st.tuples(_iri, _iri, _lex, _lang), min_size=0, max_size=20))
@settings(max_examples=100, deadline=None)
def test_ntriples_literal_round_trip(rows):
    lines = [
        f'<{s}> <{p}> "{_nt_escape(lex)}"{("@" + lang) if lang else ""} .'
        for s, p, lex, lang in rows
    ]
    parsed = parse_ntriples("\n".join(lines))
    assert parsed == [
        (s, p, KIND_LITERAL, lex, "", lang) for s, p, lex, lang in rows
    ]


@given(st.integers(min_value=0, max_value=2**32 - 1))
@settings(max_examples=30, deadline=None)
def test_turtle_parse_deterministic(seed):
    """Same content → byte-identical triples, including anonymous bnode ids
    (task-retry determinism)."""
    import random

    rng = random.Random(seed)
    doc = ["@prefix ex: <http://e.org/> ."]
    for i in range(rng.randint(1, 8)):
        objs = ", ".join(
            rng.choice([f"ex:o{j}", f'"{j}"', "[ ex:inner ex:v ]"])
            for j in range(rng.randint(1, 4))
        )
        doc.append(f"ex:s{i} ex:p{i % 3} {objs} .")
    text = "\n".join(doc)
    assert parse_turtle(text) == parse_turtle(text)


# -- split_turtle invariance -------------------------------------------------

_word = st.text(alphabet=string.ascii_lowercase, min_size=1, max_size=8)
_lit_body = st.text(
    alphabet=string.ascii_letters + ' .\n"', min_size=0, max_size=40
)


@st.composite
def turtle_docs(draw):
    """Random flat Turtle documents whose statements are separated by blank
    lines, with a mix of IRI objects, plain literals and triple-quoted
    long literals that may contain blank lines and trailing dots."""
    stmts = []
    n = draw(st.integers(min_value=3, max_value=25))
    for i in range(n):
        kind = draw(st.integers(min_value=0, max_value=2))
        s = f"<http://e.org/s{i}>"
        p = f"<http://e.org/p{draw(st.integers(0, 3))}>"
        if kind == 0:
            o = f"<http://e.org/o{draw(st.integers(0, 9))}>"
        elif kind == 1:
            w = draw(_word)
            o = f'"{w}"'
        else:
            body = draw(_lit_body).replace('"""', "'x'")
            # avoid a quote right at the delimiter boundary
            if body.endswith('"'):
                body += "x"
            if body.startswith('"'):
                body = "x" + body
            o = f'"""{body}"""'
        stmts.append(f"{s} {p} {o} .")
    return "\n\n".join(stmts)


@given(doc=turtle_docs(), chunk=st.integers(min_value=40, max_value=600))
@settings(max_examples=60, deadline=None)
def test_split_turtle_chunked_parse_equals_whole(doc, chunk):
    from nospa_rdf_data_cube_validator_ray.sources.rdf_parser import split_turtle

    whole = sorted(parse_turtle(doc))
    chunks = split_turtle(doc, chunk)
    got = []
    for c in chunks:
        got.extend(parse_turtle(c))
    assert sorted(got) == whole
