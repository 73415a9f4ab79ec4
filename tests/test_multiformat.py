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
