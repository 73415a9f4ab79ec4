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


def _corpus(rows):
    return ray.data.from_pandas(pd.DataFrame(rows))


def test_definition_table_and_module_summary():
    corpus = _corpus(
        {
            "repo": ["r", "r"],
            "path": ["src/a.py", "src/b.py"],
            "commit": ["c" * 40] * 2,
            "lang": ["python"] * 2,
            "content": [
                "import b\nimport c\ndef f1():\n    pass\nclass K1:\n    pass\nclass K2:\n    pass\n",
                "import a\ndef g():\n    pass\n",
            ],
        }
    )
    triples = C.extract_code_corpus(corpus)
    defs = C.definition_table(triples).to_pandas()
    got = sorted(map(tuple, defs[["module", "kind", "name"]].to_numpy()))
    M = C.CODEN + "mod/"
    assert got == [
        (M + "a", "class", "K1"),
        (M + "a", "class", "K2"),
        (M + "a", "function", "f1"),
        (M + "b", "function", "g"),
    ]

    summ = (
        C.module_summary(triples)
        .to_pandas()
        .set_index("node")
        .sort_index()
    )
    assert summ.loc[M + "a"].tolist() == [2, 1, 2, 1]  # out, defs, classes, in
    assert summ.loc[M + "b"].tolist() == [1, 1, 0, 1]
    assert summ.loc[M + "c"].tolist() == [0, 0, 0, 1]  # import-only target


def test_import_set_diff_first_vs_latest():
    corpus = _corpus(
        {
            "repo": ["r"] * 4,
            "path": ["src/a.py", "src/a.py", "src/a.py", "src/b.py"],
            "commit": ["0" * 40, "1".zfill(40), "2".zfill(40), "0" * 40],
            "lang": ["python"] * 4,
            "content": [
                "import x\nimport y\n",
                "import z\n",  # middle commit must NOT matter
                "import y\nimport z\n",
                "import q\n",  # single commit -> no rows
            ],
        }
    )
    out = C.import_set_diff(corpus).to_pandas()
    got = sorted(
        map(tuple, out[["repo", "path", "change", "module"]].to_numpy())
    )
    M = C.CODEN + "mod/"
    assert got == [
        ("r", "src/a.py", "+", M + "z"),
        ("r", "src/a.py", "-", M + "x"),
    ]


def test_import_set_diff_importless_commits_and_repo_key():
    corpus = _corpus(
        {
            # a.py in r1: first commit has NO imports, latest adds one —
            # the import must show as '+' (import-less commits are
            # versions too); c.py loses all imports -> '-'
            # a.py also exists in r2 with a single commit: repos must
            # not merge (no rows for r2)
            "repo": ["r1", "r1", "r2", "r1", "r1"],
            "path": ["src/a.py", "src/a.py", "src/a.py", "src/c.py", "src/c.py"],
            "commit": ["0" * 40, "1".zfill(40), "9".zfill(40), "0" * 40, "1".zfill(40)],
            "lang": ["python"] * 5,
            "content": [
                "x = 1\n",
                "import a\n",
                "import other\n",
                "import gone\n",
                "y = 2\n",
            ],
        }
    )
    out = C.import_set_diff(corpus).to_pandas()
    got = sorted(
        map(tuple, out[["repo", "path", "change", "module"]].to_numpy())
    )
    M = C.CODEN + "mod/"
    assert got == [
        ("r1", "src/a.py", "+", M + "a"),
        ("r1", "src/c.py", "-", M + "gone"),
    ]


def test_components_regime_parity():
    from nospa_rdf_data_cube_validator_ray.stages.graph import components

    # two components: {a,b,c} via a-b, b-c (plus a self-loop to drop),
    # {d,e}; node f appears ONLY in a self-loop -> absent
    edges = ray.data.from_pandas(
        pd.DataFrame(
            {
                "subj": ["a", "b", "a", "d", "f"],
                "obj": ["b", "c", "a", "e", "f"],
            }
        )
    )
    want = [("a", "a"), ("b", "a"), ("c", "a"), ("d", "d"), ("e", "d")]
    for kw in ({}, {"max_driver_edges": 0}):
        got = sorted(
            map(tuple, components(edges, **kw).to_pandas().to_numpy())
        )
        assert got == want, kw


def test_clone_groups_cross_repo():
    corpus = _corpus(
        {
            "repo": ["r1", "r2", "r3", "r1", "r2"],
            "path": ["a.py", "b.py", "c.py", "uniq.py", "other.py"],
            "commit": ["0" * 40] * 5,
            "lang": ["python"] * 5,
            "content": ["same\n", "same\n", "same\n", "only\n", "different\n"],
        }
    )
    out = C.clone_groups(corpus).to_pandas()
    got = sorted(map(tuple, out.to_numpy()))
    root = "r1\x01a.py"
    assert got == [
        ("r1", "a.py", root, 3),
        ("r2", "b.py", root, 3),
        ("r3", "c.py", root, 3),
    ]


def test_extract_corpus_mixed_dispatch():
    from nospa_rdf_data_cube_validator_ray.sources.parse_stage import (
        extract_corpus,
    )

    corpus = _corpus(
        {
            "repo": ["r"] * 3,
            "path": ["data/a.ttl", "src/b.py", "README.md"],
            "commit": ["0" * 40] * 3,
            "lang": ["turtle", "python", "markdown"],
            "content": [
                "<http://x/s> <http://x/p> <http://x/o> .\n",
                "import zzz\n",
                "# not code, not rdf\nimport looks_like_code\n",
            ],
        }
    )
    df = extract_corpus(corpus).to_pandas()
    by_pred = dict(df.groupby("pred").size())
    assert by_pred == {"http://x/p": 1, C.IMPORTS: 1}
    assert set(df["subj"]) == {"http://x/s", C.CODEN + "mod/b"}


def test_code_metrics_counts():
    content = (
        '"""doc"""\n'
        "import a\n"
        "# top comment\n"
        "def f():\n"
        "    if x > 1: x = 1\n"
        "    while x: x -= 1\n"
        "    return x\n"
        "class K:\n"
        "    pass\n"
        "# tail\n"
    )
    corpus = _corpus(
        {
            "repo": ["r", "r"],
            "path": ["src/a.py", "notes.txt"],
            "commit": ["0" * 40] * 2,
            "lang": ["python", "text"],
            "content": [content, "if while for\n# nope\n"],
        }
    )
    out = C.code_metrics(corpus).to_pandas()
    assert len(out) == 1
    row = out.iloc[0]
    assert row["module"] == C.CODEN + "mod/a"
    assert row["n_lines"] == 10
    assert row["n_comment_lines"] == 2
    assert row["n_branch_stmts"] == 2
    assert row["n_defs"] == 1
    assert row["n_classes"] == 1


def test_extract_corpus_single_format_blocks():
    """Multi-block corpus where each block is single-format: the
    dispatcher must never leak schema-less empty blocks (regression for
    the two-branch filter+union design)."""
    import pyarrow as pa

    from nospa_rdf_data_cube_validator_ray.sources.parse_stage import (
        extract_corpus,
    )

    def tbl(path, lang, content):
        return pa.table(
            {
                "repo": ["r"],
                "path": [path],
                "commit": ["0" * 40],
                "lang": [lang],
                "content": [content],
            }
        )

    corpus = ray.data.from_arrow(
        [
            tbl("a.ttl", "turtle", "<http://x/s> <http://x/p> <http://x/o> .\n"),
            tbl("b.py", "python", "import zzz\n"),
            tbl("c.md", "markdown", "# neither\n"),
        ]
    )
    out = (
        extract_corpus(corpus)
        .groupby("pred")
        .count()
        .to_pandas()
        .rename(columns={"count()": "n"})
    )
    assert dict(zip(out["pred"], out["n"])) == {"http://x/p": 1, C.IMPORTS: 1}


def test_dag_depth_regime_parity_and_cycle_detection():
    import pytest

    from nospa_rdf_data_cube_validator_ray.stages.graph import dag_depth

    # diamond + tail: a->b, a->c, b->d, c->d, d->e
    edges = ray.data.from_pandas(
        pd.DataFrame(
            {
                "subj": ["a", "a", "b", "c", "d"],
                "obj": ["b", "c", "d", "d", "e"],
            }
        )
    )
    want = [("a", 3), ("b", 2), ("c", 2), ("d", 1), ("e", 0)]
    for kw in ({}, {"max_driver_edges": 0}):
        got = sorted(
            (r["node"], int(r["depth"]))
            for r in dag_depth(edges, **kw).take_all()
        )
        assert got == want, kw

    cyc = ray.data.from_pandas(
        pd.DataFrame({"subj": ["a", "b"], "obj": ["b", "a"]})
    )
    for kw in ({}, {"max_driver_edges": 0}):
        with pytest.raises(RuntimeError, match="cycle"):
            dag_depth(cyc, max_iters=8, **kw)
