"""Source-code import/definition triple extraction (sources/code_extract.py)."""

import pandas as pd

import ray.data

from nospa_rdf_data_cube_validator_ray.sources import code_extract as C


def _extract(content, path="src/mymod.py", lang="python"):
    corpus = ray.data.from_pandas(
        pd.DataFrame(
            {
                "repo": ["r"],
                "path": [path],
                "commit": ["c" * 40],
                "lang": [lang],
                "content": [content],
            }
        )
    )
    return C.extract_code_corpus(corpus).to_pandas()


def test_module_level_only_and_aliases():
    df = _extract(
        "import aaa\n"
        "import bbb as b, ccc.sub as c\n"
        "from ddd.x import y\n"
        "# import commented\n"
        "  # import indented_comment\n"
        "def f():\n"
        "    import nested\n"
        "class K:\n"
        "    import also_nested\n"
    )
    by_pred = {p: sorted(g["obj"]) for p, g in df.groupby("pred")}
    assert by_pred[C.IMPORTS] == [
        C.CODEN + "mod/aaa",
        C.CODEN + "mod/bbb",
        C.CODEN + "mod/ccc.sub",
    ]
    assert by_pred[C.IMPORTS_FROM] == [C.CODEN + "mod/ddd.x"]
    assert by_pred[C.DEFINES_FN] == [C.CODEN + "def/mymod.f"]
    assert by_pred[C.DEFINES_CLASS] == [C.CODEN + "def/mymod.K"]
    assert (df["subj"] == C.CODEN + "mod/mymod").all()


def test_sha256_provenance_and_schema():
    import hashlib

    text = "import x\n"
    df = _extract(text)
    assert (df["file_sha256"] == hashlib.sha256(text.encode()).hexdigest()).all()
    assert list(df.columns) == [
        "graph",
        "file_sha256",
        "subj",
        "pred",
        "obj_kind",
        "obj",
        "obj_dt",
        "obj_lang",
    ]
    assert (df["obj_kind"] == 0).all()


def test_non_python_rows_skipped():
    df = _extract("import x\n", path="doc.ttl", lang="turtle")
    assert len(df) == 0
