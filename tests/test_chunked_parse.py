"""Chunked parallel parse of giant Turtle files: same triples, same
whole-file sha256, bnode ids collision-free across chunks."""

import hashlib

import pyarrow as pa

import ray.data

from nospa_rdf_data_cube_validator_ray.sources.parse_stage import parse_corpus
from nospa_rdf_data_cube_validator_ray.sources.rdf_parser import split_turtle


def big_doc(n=2000) -> str:
    L = ["@prefix ex: <http://e.org/> ."]
    for i in range(n):
        L.append(f"ex:s{i} a ex:T ;\n    ex:p ex:o{i % 7} ;\n    ex:q {i} .")
    return "\n\n".join(L) + "\n"


def corpus_for(content: str):
    return ray.data.from_arrow(
        pa.table(
            {
                "repo": ["r"], "path": ["big.ttl"], "commit": ["c"],
                "lang": ["turtle"], "content": [content],
            }
        )
    )


def test_split_turtle_boundaries():
    doc = big_doc(200)
    chunks = split_turtle(doc, chunk_bytes=2000)
    assert len(chunks) > 3
    assert all(c.rstrip().endswith(".") for c in chunks)
    assert all(c.startswith("@prefix") for c in chunks)  # header replicated


def test_chunked_equals_whole():
    doc = big_doc()
    sha = hashlib.sha256(doc.encode()).hexdigest()
    whole = parse_corpus(corpus_for(doc)).to_pandas()
    chunked = parse_corpus(
        corpus_for(doc), split_threshold=1000, chunk_bytes=5000
    ).to_pandas()
    cols = ["graph", "subj", "pred", "obj_kind", "obj", "obj_dt", "obj_lang"]
    a = set(map(tuple, whole[cols].values))
    b = set(map(tuple, chunked[cols].values))
    assert a == b
    assert set(chunked["file_sha256"]) == {sha}  # whole-file sha on every row


def test_chunked_anon_bnodes_unique():
    L = ["@prefix ex: <http://e.org/> ."]
    for i in range(60):
        L.append(f"ex:s{i} ex:p [ ex:inner ex:v{i} ] .")
    doc = "\n\n".join(L) + "\n"
    chunked = parse_corpus(
        corpus_for(doc), split_threshold=100, chunk_bytes=400
    ).to_pandas()
    anon = chunked.loc[
        (chunked["obj_kind"] == 1) & chunked["obj"].str.startswith("_:"), "obj"
    ]
    inner = chunked[chunked["pred"] == "http://e.org/inner"]
    # every [ ... ] node distinct: one inner triple per distinct bnode id
    assert len(inner) == 60
    assert inner["subj"].nunique() == 60
    assert anon.nunique() == 60
