"""End-to-end over mixed serializations: the same cube as Turtle,
N-Triples and RDF/XML rows in one corpus must yield per-graph-identical
findings (format dispatch Main.java:23-43)."""

import pyarrow as pa

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
    import pytest

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
    assert "http://x/g1" in gs and "_:gb" in gs
    assert sum(g not in ("http://x/g1", "_:gb") for g in df["graph"]) == 1


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
