from nospa_rdf_data_cube_validator_ray.sources.rdf_parser import (
    parse_ntriples,
    parse_rdfxml,
    parse_turtle,
    format_for,
)
from nospa_rdf_data_cube_validator_ray.model import KIND_BNODE, KIND_IRI, KIND_LITERAL


def test_turtle_basics():
    ts = parse_turtle(
        """@prefix ex: <http://e.org/> .
        @prefix xsd: <http://www.w3.org/2001/XMLSchema#> .
        ex:s a ex:T ; ex:p "hi"@en , "x"^^xsd:string , 4 , 4.5 , true ;
             ex:q [ ex:r ex:o ] .
        _:b1 ex:p ex:s ."""
    )
    spo = {(s, p, k, o, dt, lang) for s, p, k, o, dt, lang in ts}
    assert (
        "http://e.org/s",
        "http://www.w3.org/1999/02/22-rdf-syntax-ns#type",
        KIND_IRI,
        "http://e.org/T",
        "",
        "",
    ) in spo
    assert ("http://e.org/s", "http://e.org/p", KIND_LITERAL, "hi", "", "en") in spo
    assert (
        "http://e.org/s", "http://e.org/p", KIND_LITERAL, "4",
        "http://www.w3.org/2001/XMLSchema#integer", "",
    ) in spo
    assert (
        "http://e.org/s", "http://e.org/p", KIND_LITERAL, "4.5",
        "http://www.w3.org/2001/XMLSchema#decimal", "",
    ) in spo
    assert (
        "http://e.org/s", "http://e.org/p", KIND_LITERAL, "true",
        "http://www.w3.org/2001/XMLSchema#boolean", "",
    ) in spo
    # anonymous bnode got a deterministic id and carries the nested triple
    anon = [o for s, p, k, o, *_ in ts if p == "http://e.org/q"]
    assert anon == ["_:a1"]
    assert ("_:a1", "http://e.org/r", KIND_IRI, "http://e.org/o", "", "") in spo
    assert ("_:b1", "http://e.org/p", KIND_IRI, "http://e.org/s", "", "") in spo


def test_turtle_reference_fixture():
    text = open("/root/reference/test.ttl").read()
    ts = parse_turtle(text)
    assert len(ts) == 206
    preds = {p for _, p, *_ in ts}
    assert "http://purl.org/linked-data/cube#observation" in preds
    obs = {s for s, p, *_ in ts if p == "http://purl.org/linked-data/cube#dataSet"}
    assert len(obs) == 24


def test_turtle_collections():
    ts = parse_turtle("@prefix ex: <http://e.org/> .\nex:s ex:p (ex:a ex:b) .")
    firsts = [o for _, p, k, o, *_ in ts if p.endswith("#first")]
    assert firsts == ["http://e.org/a", "http://e.org/b"]


def test_ntriples():
    ts = parse_ntriples(
        '<http://e.org/s> <http://e.org/p> "v\\n"^^<http://e.org/dt> .\n'
        "<http://e.org/s> <http://e.org/p> _:b0 .\n"
        "# comment\n"
        '_:b0 <http://e.org/q> "x"@en-GB .'
    )
    assert ts[0] == ("http://e.org/s", "http://e.org/p", KIND_LITERAL, "v\n", "http://e.org/dt", "")
    assert ts[1][3] == "_:b0" and ts[1][2] == KIND_BNODE
    assert ts[2] == ("_:b0", "http://e.org/q", KIND_LITERAL, "x", "", "en-GB")


def test_rdfxml():
    ts = parse_rdfxml(
        """<?xml version="1.0"?>
        <rdf:RDF xmlns:rdf="http://www.w3.org/1999/02/22-rdf-syntax-ns#"
                 xmlns:ex="http://e.org/">
          <ex:T rdf:about="http://e.org/s">
            <ex:p rdf:resource="http://e.org/o"/>
            <ex:q rdf:datatype="http://e.org/dt">42</ex:q>
            <ex:r><ex:U rdf:about="http://e.org/u"/></ex:r>
          </ex:T>
        </rdf:RDF>"""
    )
    spo = set(ts)
    assert ("http://e.org/s", "http://www.w3.org/1999/02/22-rdf-syntax-ns#type", KIND_IRI, "http://e.org/T", "", "") in spo
    assert ("http://e.org/s", "http://e.org/p", KIND_IRI, "http://e.org/o", "", "") in spo
    assert ("http://e.org/s", "http://e.org/q", KIND_LITERAL, "42", "http://e.org/dt", "") in spo
    assert ("http://e.org/u", "http://www.w3.org/1999/02/22-rdf-syntax-ns#type", KIND_IRI, "http://e.org/U", "", "") in spo


def test_format_dispatch():
    assert format_for("turtle", "x") == "turtle"
    assert format_for("", "a/b.ttl") == "turtle"
    assert format_for("", "a/b.nt") == "ntriples"
    assert format_for("", "a/b.rdf") == "rdfxml"
    assert format_for("n3", "x") == "turtle"
    assert format_for("python", "a/b.py") is None
