"""End-to-end over mixed serializations: the same cube as Turtle,
N-Triples and RDF/XML rows in one corpus must yield per-graph-identical
findings (format dispatch Main.java:23-43)."""

import pyarrow as pa
import pytest

import ray.data

from nospa_rdf_data_cube_validator_ray import CubeValidator
from nospa_rdf_data_cube_validator_ray.fixtures import wf_cube
from nospa_rdf_data_cube_validator_ray.model import split_graph_id, term_str
from nospa_rdf_data_cube_validator_ray.sources.rdf_parser import parse_turtle


def to_ntriples(turtle_text: str) -> str:
    lines = []
    for s, p, k, o, dt, lang in parse_turtle(turtle_text):
        st = s if s.startswith("_:") else f"<{s}>"
        lines.append(f"{st} <{p}> {term_str(k, o, dt, lang)} .")
    return "\n".join(lines) + "\n"


def to_rdfxml(turtle_text: str) -> str:
    """Minimal RDF/XML writer for IRI-subject triples (enough for a cube
    without blank nodes in subject position after flattening)."""
    from collections import defaultdict
    from xml.sax.saxutils import escape, quoteattr

    by_subj = defaultdict(list)
    for s, p, k, o, dt, lang in parse_turtle(turtle_text):
        by_subj[s].append((p, k, o, dt, lang))
    out = ['<?xml version="1.0"?>',
           '<rdf:RDF xmlns:rdf="http://www.w3.org/1999/02/22-rdf-syntax-ns#">']
    bnode_names = {}

    def ref(s):
        if s.startswith("_:"):
            return "rdf:nodeID=" + quoteattr(bnode_names.setdefault(s, f"b{len(bnode_names)}"))
        return "rdf:about=" + quoteattr(s)

    for s, props in by_subj.items():
        out.append(f"<rdf:Description {ref(s)}>")
        for p, k, o, dt, lang in props:
            tag_ns, _, local = p.rpartition("/") if "#" not in p else p.rpartition("#")
            sep = "#" if "#" in p else "/"
            out.append(f'<n:{local} xmlns:n={quoteattr(tag_ns + sep)}')
            if k == 0:
                out.append(f" rdf:resource={quoteattr(o)}/>")
            elif k == 1:
                out.append(
                    " rdf:nodeID="
                    + quoteattr(bnode_names.setdefault(o, f"b{len(bnode_names)}"))
                    + "/>"
                )
            else:
                attrs = ""
                if dt:
                    attrs += f" rdf:datatype={quoteattr(dt)}"
                if lang:
                    attrs += f" xml:lang={quoteattr(lang)}"
                out.append(f"{attrs}>{escape(o)}</n:{local}>")
        out.append("</rdf:Description>")
    out.append("</rdf:RDF>")
    return "\n".join(out)


def test_nquads_parse_and_graph_scoping():
    from nospa_rdf_data_cube_validator_ray.sources.parse_stage import parse_corpus
    from nospa_rdf_data_cube_validator_ray.sources.rdf_parser import (
        RDFSyntaxError,
        parse_nquads,
    )

    nq = "\n".join(
        [
            "# comment",
            '<http://x/s> <http://x/p> "lit"@en <http://x/g1> .',
            '<http://x/s> <http://x/p> "4"^^<http://www.w3.org/2001/XMLSchema#int> .',
            "_:b1 <http://x/q> <http://x/o> _:gb .",
            "<http://x/s2> <http://x/p> _:b2 <http://x/g1> .  # trailing",
            "",
        ]
    )
    quads = parse_nquads(nq)
    assert [g for g, _ in quads] == ["http://x/g1", "", "_:gb", "http://x/g1"]
    assert quads[0][1] == ("http://x/s", "http://x/p", 2, "lit", "", "en")
    assert quads[2][1][0] == "_:b1" and quads[2][1][2] == 0
    with pytest.raises(RDFSyntaxError, match="N-Quads"):
        parse_nquads("<http://x/s> <http://x/p> .")

    # corpus path: named-graph rows scope to the label, default-graph
    # rows to the file's graph id
    corpus = pa.table(
        {
            "repo": pa.array(["m"]),
            "path": pa.array(["f.nq"]),
            "commit": pa.array(["c"]),
            "lang": pa.array([""]),
            "content": pa.array([nq]),
        }
    )
    df = parse_corpus(ray.data.from_arrow(corpus)).to_pandas()
    assert len(df) == 4
    gs = set(df["graph"])
    assert "http://x/g1" in gs
    # a bnode graph label is document-scoped: the corpus path renames
    # it with the per-file tag (RDF 1.1 standardize-apart)
    bn = [g for g in gs if g.startswith("_:")]
    assert len(bn) == 1 and bn[0].endswith("_gb")
    assert sum(not g.startswith(("http://x/g1", "_:")) for g in df["graph"]) == 1
    # labeled subject bnodes get the same per-file tag
    bsubs = [s for s in df["subj"] if s.startswith("_:")]
    assert len(bsubs) == 1 and bsubs[0].endswith("_b1")


def test_trig_parse_blocks_and_default_graph():
    from nospa_rdf_data_cube_validator_ray.sources.rdf_parser import (
        RDFSyntaxError,
        parse_trig,
        parse_turtle,
    )

    doc = """
    @prefix ex: <http://x/> .
    ex:top ex:p ex:o .                       # default graph
    ex:g1 { ex:s ex:p "v"@en ; ex:q 4 . }    # labeled block
    GRAPH <http://x/g2> { ex:s2 ex:p [ ex:inner ex:o ] }  # GRAPH kw, no final dot
    { ex:d ex:p ex:o . }                     # anonymous block = default graph
    _:gb { ex:s3 ex:p ex:o . }               # bnode graph label
    """
    quads = parse_trig(doc)
    by_g = {}
    for g, t in quads:
        by_g.setdefault(g, []).append(t)
    assert len(by_g[""]) == 2  # top-level + anonymous block
    assert {t[0] for t in by_g[""]} == {"http://x/top", "http://x/d"}
    assert len(by_g["http://x/g1"]) == 2
    assert ("http://x/s", "http://x/p", 2, "v", "", "en") in by_g["http://x/g1"]
    # nested bnode property list inside a block stays in that graph
    assert len(by_g["http://x/g2"]) == 2
    assert "_:gb" in by_g and len(by_g["_:gb"]) == 1
    with pytest.raises(RDFSyntaxError, match="unterminated"):
        parse_trig("<http://x/g> { <http://x/s> <http://x/p> <http://x/o> .")
    # plain Turtle is valid TriG: identical triples, all default-graph
    ttl, _ = wf_cube("IC11")
    quads2 = parse_trig(ttl)
    assert all(g == "" for g, _ in quads2)
    assert sorted(t for _, t in quads2) == sorted(parse_turtle(ttl))


def test_trig_corpus_scoping_and_writer():
    from nospa_rdf_data_cube_validator_ray.sources.parse_stage import parse_corpus
    from nospa_rdf_data_cube_validator_ray.sources.rdf_parser import parse_trig
    from nospa_rdf_data_cube_validator_ray.stages.export import trig_document

    ttl, _ = wf_cube("IC11")
    triples = parse_turtle(ttl)
    doc = trig_document(triples, graph_iri="http://x/g")
    back = parse_trig(doc)
    assert all(g == "http://x/g" for g, _ in back)
    assert sorted(t for _, t in back) == sorted(triples)
    corpus = pa.table(
        {
            "repo": pa.array(["m"]),
            "path": pa.array(["f.trig"]),
            "commit": pa.array(["c"]),
            "lang": pa.array([""]),
            "content": pa.array(
                ['<http://x/g> { <http://x/s> <http://x/p> "1" . }\n'
                 '<http://x/s0> <http://x/p> "0" .']
            ),
        }
    )
    df = parse_corpus(ray.data.from_arrow(corpus)).to_pandas()
    assert len(df) == 2
    assert set(df["graph"]) == {
        "http://x/g",
        df[df["subj"] == "http://x/s0"]["graph"].iloc[0],
    }
    assert df[df["subj"] == "http://x/s0"]["graph"].iloc[0] != "http://x/g"


def test_quad_bnodes_standardized_apart_across_files():
    """Two files writing _:b1 into the SAME named graph must yield two
    distinct blank nodes (RDF 1.1 document scope), and anonymous TriG
    bnodes from different files must not collide either."""
    from nospa_rdf_data_cube_validator_ray.sources.parse_stage import parse_corpus

    trig = '<http://g> {{ <http://s{n}> <http://p> [ <http://q> "v{n}" ] . }}\n' \
           '<http://g> {{ _:b1 <http://p> "w{n}" . }}'
    corpus = pa.table(
        {
            "repo": pa.array(["m", "m"]),
            "path": pa.array(["f1.trig", "f2.trig"]),
            "commit": pa.array(["c", "c"]),
            "lang": pa.array(["", ""]),
            "content": pa.array([trig.format(n=1), trig.format(n=2)]),
        }
    )
    df = parse_corpus(ray.data.from_arrow(corpus)).to_pandas()
    # anonymous bnodes: one object bnode per file, distinct labels
    anon = df[df["obj_kind"] == 1]["obj"]
    assert len(anon) == 2 and anon.nunique() == 2
    # labeled bnodes: _:b1 from the two files are two subjects
    labeled = df[df["subj"].str.endswith("_b1")]["subj"]
    assert len(labeled) == 2 and labeled.nunique() == 2


def test_named_graph_rejected_on_local_path():
    """The zero-shuffle local validator must refuse quad corpora whose
    rows carry named graph labels (one-graph-one-block invariant)."""
    import pytest as _p

    from nospa_rdf_data_cube_validator_ray.sources.parse_stage import ParseRDF

    corpus = pa.table(
        {
            "repo": pa.array(["m"]),
            "path": pa.array(["f.nq"]),
            "commit": pa.array(["c"]),
            "lang": pa.array([""]),
            "content": pa.array(
                ["<http://s> <http://p> <http://o> <http://g> ."]
            ),
        }
    )
    with _p.raises(RuntimeError, match="shuffle"):
        ParseRDF(strict=True, max_triples_per_file=10_000)(corpus)
    # default-graph-only quad files stay valid on the local path
    ok = pa.table(
        {
            "repo": pa.array(["m"]),
            "path": pa.array(["f.nq"]),
            "commit": pa.array(["c"]),
            "lang": pa.array([""]),
            "content": pa.array(["<http://s> <http://p> <http://o> ."]),
        }
    )
    out = ParseRDF(strict=True, max_triples_per_file=10_000)(ok)
    assert out.num_rows == 1


def test_nquads_corpus_validates_like_turtle():
    """ONE .nq file holding two cubes under two graph labels must
    validate (shuffle mode — named graphs span the file/block layout)
    exactly like the two-file Turtle corpus."""
    from nospa_rdf_data_cube_validator_ray.sources.rdf_parser import parse_turtle
    from nospa_rdf_data_cube_validator_ray.stages.export import nquads_document

    ttl_a, _ = wf_cube("IC11")
    ttl_b, _ = wf_cube("IC1")
    ttl_corpus = pa.table(
        {
            "repo": pa.array(["m", "m"]),
            "path": pa.array(["a.ttl", "b.ttl"]),
            "commit": pa.array(["c", "c"]),
            "lang": pa.array(["turtle", "turtle"]),
            "content": pa.array([ttl_a, ttl_b]),
        }
    )
    nq = nquads_document(parse_turtle(ttl_a), graph_iri="http://g/a") + \
        nquads_document(parse_turtle(ttl_b), graph_iri="http://g/b")
    nq_corpus = pa.table(
        {
            "repo": pa.array(["m"]),
            "path": pa.array(["all.nq"]),
            "commit": pa.array(["c"]),
            "lang": pa.array(["nquads"]),
            "content": pa.array([nq]),
        }
    )

    def findings_set(corpus, mode):
        v = CubeValidator(ray.data.from_arrow(corpus), mode=mode)
        df = v.findings_df()
        return {
            (row["ic"], row["subject"], tuple(row["detail"]))
            for _, row in df.iterrows()
        }

    a = findings_set(ttl_corpus, "local")
    b = findings_set(nq_corpus, "shuffle")
    assert a == b
    assert any(ic == "IC11" for ic, _, _ in b)
    assert any(ic == "IC1" for ic, _, _ in b)


def test_nquads_roundtrip_writer():
    from nospa_rdf_data_cube_validator_ray.sources.rdf_parser import parse_nquads
    from nospa_rdf_data_cube_validator_ray.stages.export import nquads_document

    ttl, _ = wf_cube("IC11")
    triples = parse_turtle(ttl)
    doc = nquads_document(triples, graph_iri="http://x/g")
    back = parse_nquads(doc)
    assert all(g == "http://x/g" for g, _ in back)
    assert sorted(t for _, t in back) == sorted(triples)
    # default-graph writer emits plain N-Triples lines
    doc2 = nquads_document(triples)
    back2 = parse_nquads(doc2)
    assert all(g == "" for g, _ in back2)
    assert sorted(t for _, t in back2) == sorted(triples)


def test_mixed_formats_same_findings():
    ttl, _expected = wf_cube("IC11")  # one IC-11 violation planted
    rows = {
        "repo": ["m", "m", "m"],
        "path": ["cube.ttl", "cube.nt", "cube.rdf"],
        "commit": ["c", "c", "c"],
        "lang": ["turtle", "ntriples", "rdfxml"],
        "content": [ttl, to_ntriples(ttl), to_rdfxml(ttl)],
    }
    corpus = pa.table({k: pa.array(v, pa.string()) for k, v in rows.items()})
    v = CubeValidator(ray.data.from_arrow(corpus))
    df = v.findings_df()
    by_path = {}
    for _, row in df.iterrows():
        path = split_graph_id(row["graph"])[1]
        by_path.setdefault(path, set()).add(
            (row["ic"], row["subject"], tuple(row["detail"]))
        )
    assert by_path["cube.ttl"] == by_path["cube.nt"] == by_path["cube.rdf"]
    assert any(ic == "IC11" for ic, _, _ in by_path["cube.ttl"])


def test_grammar_strictness_round4():
    """ADVICE round-3 lows: the line formats must reject IRI-illegal
    characters and digit-leading language tags; Turtle/TriG must reject a
    bare IRI/PNAME/BNODE subject with no predicate-object list; the
    document helpers must reject IRIREF-illegal graph labels."""
    from nospa_rdf_data_cube_validator_ray.sources.rdf_parser import (
        RDFSyntaxError,
        parse_nquads,
        parse_ntriples,
        parse_trig,
    )
    from nospa_rdf_data_cube_validator_ray.stages.export import (
        nquads_document,
        trig_document,
    )

    # IRI with a space / brace is IRIREF-illegal in N-Quads and N-Triples
    for bad in (
        '<http://e/a b> <http://e/p> <http://e/o> .',
        '<http://e/s> <http://e/p> <http://e/{o}> .',
        '<http://e/s> <http://e/p> "x"@1en .',      # digit-leading lang tag
    ):
        with pytest.raises(RDFSyntaxError):
            parse_nquads(bad)
        with pytest.raises(RDFSyntaxError):
            parse_ntriples(bad)
    # legal lines still parse, including a hyphenated language tag
    assert len(parse_ntriples('<http://e/s> <http://e/p> "x"@en-GB .')) == 1
    assert parse_nquads(
        '<http://e/s> <http://e/p> "x" <http://e/g> .'
    )[0][0] == "http://e/g"

    # bare subject with no predicate-object list: Turtle and TriG raise
    with pytest.raises(RDFSyntaxError):
        parse_turtle("@prefix ex: <http://e/> . ex:s .")
    with pytest.raises(RDFSyntaxError):
        parse_trig("@prefix ex: <http://e/> . <http://e/g> { ex:s }")
    with pytest.raises(RDFSyntaxError):
        parse_trig("@prefix ex: <http://e/> . <http://e/g> { ex:s . }")
    # ...but a standalone blank-node property list stays legal Turtle
    got = parse_turtle('[ <http://e/p> "v" ] .')
    assert len(got) == 1 and got[0][2:] == (2, "v", "", "")
    got = parse_trig('<http://e/g> { [ <http://e/p> "v" ] }')
    assert len(got) == 1 and got[0][0] == "http://e/g"

    # document helpers raise on IRIREF-illegal graph labels
    rows = [("http://e/s", "http://e/p", 0, "http://e/o", "", "")]
    for helper in (nquads_document, trig_document):
        with pytest.raises(ValueError):
            helper(rows, graph_iri="http://e/bad label")
        assert "http://e/g" in helper(rows, graph_iri="http://e/g")
