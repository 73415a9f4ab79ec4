"""RDF/XML completeness: xml:base, rdf:li containers, parseType
Resource/Collection/Literal, property attributes, inherited xml:lang —
each construct checked against its spec-defined triple expansion
(expected sets derived by hand from the RDF/XML syntax spec; the
reference accepts these via Jena, Main.java:23-28)."""

from nospa_rdf_data_cube_validator_ray.sources.rdf_parser import parse_rdfxml

RDF = "http://www.w3.org/1999/02/22-rdf-syntax-ns#"
EX = "http://example.org/"


def spo(triples):
    return {(s, p, k, o, dt, lg) for (s, p, k, o, dt, lg) in triples}


def test_xml_base_resolution():
    xml = f"""<?xml version="1.0"?>
<rdf:RDF xmlns:rdf="{RDF}" xmlns:ex="{EX}" xml:base="http://base.org/dir/doc">
  <rdf:Description rdf:about="rel">
    <ex:p rdf:resource="other"/>
    <ex:q rdf:resource="/abs"/>
    <ex:r rdf:resource="http://full.example/x"/>
  </rdf:Description>
  <rdf:Description rdf:ID="frag">
    <ex:p rdf:resource="#self"/>
  </rdf:Description>
</rdf:RDF>"""
    got = spo(parse_rdfxml(xml))
    assert ("http://base.org/dir/rel", EX + "p", 0, "http://base.org/dir/other", "", "") in got
    assert ("http://base.org/dir/rel", EX + "q", 0, "http://base.org/abs", "", "") in got
    assert ("http://base.org/dir/rel", EX + "r", 0, "http://full.example/x", "", "") in got
    assert ("http://base.org/dir/doc#frag", EX + "p", 0, "http://base.org/dir/doc#self", "", "") in got


def test_xml_base_nested_override():
    xml = f"""<?xml version="1.0"?>
<rdf:RDF xmlns:rdf="{RDF}" xmlns:ex="{EX}" xml:base="http://outer.org/">
  <rdf:Description rdf:about="a" xml:base="http://inner.org/">
    <ex:p rdf:resource="b"/>
  </rdf:Description>
</rdf:RDF>"""
    got = spo(parse_rdfxml(xml))
    assert ("http://inner.org/a", EX + "p", 0, "http://inner.org/b", "", "") in got


def test_rdf_li_containers():
    xml = f"""<?xml version="1.0"?>
<rdf:RDF xmlns:rdf="{RDF}" xmlns:ex="{EX}">
  <rdf:Seq rdf:about="{EX}seq">
    <rdf:li rdf:resource="{EX}one"/>
    <rdf:li>two</rdf:li>
    <rdf:li rdf:resource="{EX}three"/>
  </rdf:Seq>
</rdf:RDF>"""
    got = spo(parse_rdfxml(xml))
    assert (EX + "seq", RDF + "type", 0, RDF + "Seq", "", "") in got
    assert (EX + "seq", RDF + "_1", 0, EX + "one", "", "") in got
    assert (EX + "seq", RDF + "_2", 2, "two", "", "") in got
    assert (EX + "seq", RDF + "_3", 0, EX + "three", "", "") in got


def test_parsetype_collection():
    xml = f"""<?xml version="1.0"?>
<rdf:RDF xmlns:rdf="{RDF}" xmlns:ex="{EX}">
  <rdf:Description rdf:about="{EX}s">
    <ex:members rdf:parseType="Collection">
      <rdf:Description rdf:about="{EX}a"/>
      <rdf:Description rdf:about="{EX}b"/>
    </ex:members>
    <ex:empty rdf:parseType="Collection"/>
  </rdf:Description>
</rdf:RDF>"""
    triples = parse_rdfxml(xml)
    got = spo(triples)
    # empty collection → rdf:nil directly
    assert (EX + "s", EX + "empty", 0, RDF + "nil", "", "") in got
    # non-empty: s members head; head first a; head rest n2; n2 first b; n2 rest nil
    heads = [o for (s, p, k, o, *_ ) in got if p == EX + "members"]
    assert len(heads) == 1 and heads[0].startswith("_:")
    head = heads[0]
    assert (head, RDF + "first", 0, EX + "a", "", "") in got
    rest = [o for (s, p, k, o, *_ ) in got if s == head and p == RDF + "rest"][0]
    assert (rest, RDF + "first", 0, EX + "b", "", "") in got
    assert (rest, RDF + "rest", 0, RDF + "nil", "", "") in got


def test_parsetype_resource_and_literal():
    xml = f"""<?xml version="1.0"?>
<rdf:RDF xmlns:rdf="{RDF}" xmlns:ex="{EX}">
  <rdf:Description rdf:about="{EX}s">
    <ex:nested rdf:parseType="Resource">
      <ex:inner>v</ex:inner>
    </ex:nested>
    <ex:markup rdf:parseType="Literal">plain <ex:b>bold</ex:b> tail</ex:markup>
  </rdf:Description>
</rdf:RDF>"""
    got = spo(parse_rdfxml(xml))
    nodes = [o for (s, p, k, o, *_ ) in got if p == EX + "nested"]
    assert len(nodes) == 1 and nodes[0].startswith("_:")
    assert (nodes[0], EX + "inner", 2, "v", "", "") in got
    lits = [(o, dt) for (s, p, k, o, dt, lg) in got if p == EX + "markup"]
    assert len(lits) == 1
    assert lits[0][1] == RDF + "XMLLiteral"
    assert "plain" in lits[0][0] and "bold" in lits[0][0] and "tail" in lits[0][0]


def test_property_attributes_and_lang_inheritance():
    xml = f"""<?xml version="1.0"?>
<rdf:RDF xmlns:rdf="{RDF}" xmlns:ex="{EX}" xml:lang="en">
  <rdf:Description rdf:about="{EX}s" ex:label="hello">
    <ex:plain>inherited</ex:plain>
    <ex:tagged xml:lang="fr">bonjour</ex:tagged>
    <ex:blank ex:x="1"/>
  </rdf:Description>
</rdf:RDF>"""
    got = spo(parse_rdfxml(xml))
    assert (EX + "s", EX + "label", 2, "hello", "", "en") in got
    assert (EX + "s", EX + "plain", 2, "inherited", "", "en") in got
    assert (EX + "s", EX + "tagged", 2, "bonjour", "", "fr") in got
    # empty property element with property attributes → blank node object
    bn = [o for (s, p, k, o, *_ ) in got if p == EX + "blank"]
    assert len(bn) == 1 and bn[0].startswith("_:")
    assert (bn[0], EX + "x", 2, "1", "", "en") in got


def test_typed_node_and_datatype_still_work():
    xml = f"""<?xml version="1.0"?>
<rdf:RDF xmlns:rdf="{RDF}" xmlns:ex="{EX}">
  <ex:Widget rdf:about="{EX}w">
    <ex:size rdf:datatype="http://www.w3.org/2001/XMLSchema#integer">4</ex:size>
  </ex:Widget>
</rdf:RDF>"""
    got = spo(parse_rdfxml(xml))
    assert (EX + "w", RDF + "type", 0, EX + "Widget", "", "") in got
    assert (EX + "w", EX + "size", 2, "4",
            "http://www.w3.org/2001/XMLSchema#integer", "") in got
