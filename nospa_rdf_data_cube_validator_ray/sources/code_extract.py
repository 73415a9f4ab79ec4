"""Vectorized triple extraction from source-code file content.

North-rule surface: "map_batches triple extraction over Arrow batches of
repository file content".  The RDF parse stage (parse_stage.py) covers
RDF payloads; this stage covers CODE payloads: module-level ``import`` /
``from ... import`` statements and top-level ``def`` / ``class``
definitions become (subj, pred, obj) triples carrying the same
graph / file_sha256 provenance columns the RDF parser emits
(model.TRIPLE_SCHEMA), so the per-row content-sha256 invariant flows
end-to-end on the code path too.

Extraction is pandas-vectorized: ``Series.str.extractall`` with compiled
MULTILINE regexes (anchored at column 0, so nested/indented imports and
``# import ...`` comments are skipped), ``str.split(',') + explode`` for
comma-separated import lists, and alias (``as x``) stripping — no
per-row Python loop in the hot path.  Reference parity: the reference
has no code-extraction twin (Jena's RIOT only parses RDF); this is the
beyond-reference KG-construction front end.
"""

from __future__ import annotations

import hashlib
import re

import pandas as pd

from ..model import TRIPLE_SCHEMA, make_graph_id

CODE = "http://example.org/code#"
CODEN = "http://example.org/code/"

IMPORTS = CODE + "imports"
IMPORTS_FROM = CODE + "importsFrom"
DEFINES_FN = CODE + "definesFunction"
DEFINES_CLASS = CODE + "definesClass"

# module-level only: anchored at column 0 under re.M
_IMPORT_RE = re.compile(r"^import[ \t]+([^\n#]+)", re.M)
_FROM_RE = re.compile(r"^from[ \t]+([A-Za-z_][\w.]*)[ \t]+import\b", re.M)
_DEF_RE = re.compile(r"^def[ \t]+([A-Za-z_]\w*)", re.M)
_CLASS_RE = re.compile(r"^class[ \t]+([A-Za-z_]\w*)", re.M)
_MOD_HEAD_RE = re.compile(r"^\s*([A-Za-z_][\w.]*)")


def _mod_iri(names: pd.Series) -> pd.Series:
    return CODEN + "mod/" + names


class ExtractCodeTriples:
    """map_batches stage (pandas): corpus rows → TRIPLE_SCHEMA rows.

    Non-Python rows pass through as zero triples; a row's module node is
    derived from its path stem, so extraction is per-file independent
    (embarrassingly parallel, no state, no shuffle)."""

    def __call__(self, df: pd.DataFrame):
        import pyarrow as pa

        py = df[
            (df["lang"] == "python") | df["path"].str.endswith(".py")
        ].reset_index(drop=True)
        if not len(py):
            return TRIPLE_SCHEMA.empty_table()

        graph = pd.Series(
            [
                make_graph_id(r, p, c)
                for r, p, c in zip(py["repo"], py["path"], py["commit"])
            ],
            dtype=object,
        )
        sha = pd.Series(
            [
                hashlib.sha256(t.encode("utf-8")).hexdigest()
                for t in py["content"].fillna("")
            ],
            dtype=object,
        )
        stem = py["path"].str.extract(r"([^/]+?)(?:\.py)?$", expand=False)
        subj = _mod_iri(stem)
        content = py["content"].fillna("")

        frames: list[pd.DataFrame] = []

        def emit(rows: pd.Series, pred: str, obj: pd.Series) -> None:
            """rows: int index into py for each match."""
            frames.append(
                pd.DataFrame(
                    {
                        "graph": graph.iloc[rows].to_numpy(),
                        "file_sha256": sha.iloc[rows].to_numpy(),
                        "subj": subj.iloc[rows].to_numpy(),
                        "pred": pred,
                        "obj_kind": pd.Series(
                            0, index=range(len(rows)), dtype="int8"
                        ),
                        "obj": obj.to_numpy(),
                        "obj_dt": "",
                        "obj_lang": "",
                    }
                )
            )

        # plain imports: comma lists, aliases stripped
        imp = content.str.extractall(_IMPORT_RE)[0]
        if len(imp):
            parts = imp.str.split(",").explode().str.strip()
            mods = parts.str.extract(_MOD_HEAD_RE, expand=False).dropna()
            emit(
                mods.index.get_level_values(0),
                IMPORTS,
                _mod_iri(mods),
            )

        frm = content.str.extractall(_FROM_RE)[0]
        if len(frm):
            emit(frm.index.get_level_values(0), IMPORTS_FROM, _mod_iri(frm))

        for rx, pred in ((_DEF_RE, DEFINES_FN), (_CLASS_RE, DEFINES_CLASS)):
            m = content.str.extractall(rx)[0]
            if len(m):
                rows = m.index.get_level_values(0)
                emit(
                    rows,
                    pred,
                    CODEN + "def/" + stem.iloc[rows].to_numpy() + "." + m,
                )

        if not frames:
            return TRIPLE_SCHEMA.empty_table()
        out = pd.concat(frames, ignore_index=True)
        # emit ARROW blocks (TRIPLE_SCHEMA-typed, even when empty): the
        # RDF parse stage emits Arrow too, so the two front ends union
        # without a block-type clash, and empties stay schema-typed
        return pa.Table.from_pandas(
            out, schema=TRIPLE_SCHEMA, preserve_index=False
        )


def extract_code_corpus(corpus) -> "object":
    """corpus Dataset (repo, path, commit, lang, content) → triple
    Dataset (TRIPLE_SCHEMA columns, Arrow blocks)."""
    return corpus.map_batches(ExtractCodeTriples(), batch_format="pandas")


def definition_table(triples) -> "object":
    """Definition triples → (module, kind, name) rows: the materialized
    node-attribute view of ``definesFunction`` / ``definesClass``.
    Stateless projection (map-only, no shuffle); name = the segment
    after the final '.' of the def IRI, exactly as ``ExtractCodeTriples``
    minted it."""
    kinds = {DEFINES_FN: "function", DEFINES_CLASS: "class"}

    def project(df: pd.DataFrame) -> pd.DataFrame:
        d = df[df["pred"].isin(kinds)]
        if not len(d):
            return pd.DataFrame(
                {
                    "module": pd.Series(dtype="string"),
                    "kind": pd.Series(dtype="string"),
                    "name": pd.Series(dtype="string"),
                }
            )
        return pd.DataFrame(
            {
                "module": d["subj"].astype("string"),
                "kind": d["pred"].map(kinds).astype("string"),
                "name": d["obj"].str.rsplit(".", n=1).str[-1].astype("string"),
            }
        ).reset_index(drop=True)

    return triples.map_batches(project, batch_format="pandas")


def module_summary(triples, *, num_partitions: int | None = None) -> "object":
    """Graph-materialize step: the per-node attribute table of the code
    KG — (node, out_imports, n_defs, n_classes, in_imports) for every
    module node (import sources, import targets, and defining modules;
    def IRIs are attributes, not nodes).

    Map-side partial counts per batch (combiner), then ONE coarse
    node-hash bucket shuffle with a vectorized per-bucket sum
    (util.bucket_sum) — the ``degree_table`` pattern extended to typed
    attribute columns."""
    from ..util import bucket_sum

    imp = (IMPORTS, IMPORTS_FROM)
    cols = ["out_imports", "n_defs", "n_classes", "in_imports"]

    def partial(df: pd.DataFrame) -> pd.DataFrame:
        is_imp = df["pred"].isin(imp)
        frames = [
            pd.DataFrame(
                {"node": df.loc[is_imp, "subj"], "m": "out_imports"}
            ),
            pd.DataFrame({"node": df.loc[is_imp, "obj"], "m": "in_imports"}),
            pd.DataFrame(
                {"node": df.loc[df["pred"] == DEFINES_FN, "subj"], "m": "n_defs"}
            ),
            pd.DataFrame(
                {
                    "node": df.loc[df["pred"] == DEFINES_CLASS, "subj"],
                    "m": "n_classes",
                }
            ),
        ]
        longf = pd.concat(frames, ignore_index=True)
        counts = (
            longf.groupby(["node", "m"], sort=False).size().unstack(fill_value=0)
        )
        out = counts.reindex(columns=cols, fill_value=0).reset_index()
        out["node"] = out["node"].astype("string")
        return out.astype({c: "int64" for c in cols})

    return bucket_sum(
        triples.map_batches(partial, batch_format="pandas"), ["node"], cols
    )


def import_set_diff(corpus, *, num_buckets: int = 32) -> "object":
    """Commit-evolution delta of the import graph: for every
    (repo, path), the import targets ADDED ('+') or REMOVED ('-')
    between its FIRST and LATEST commit (lexicographic commit order,
    the corpus's convention — see ``stages.dedup.latest_snapshot``).
    Rows (repo, path, change, module); single-commit files emit
    nothing.  The commit range comes from a marker row per CORPUS row
    (module = ''), not from the extracted edges — a commit with zero
    module-level imports still counts as a version, so imports added
    after (or removed down to) an import-less revision diff correctly.

    Pipeline: vectorized triple extraction (``ExtractCodeTriples``) →
    provenance split (graph id → repo, path, commit) ∪ corpus marker
    rows → ONE coarse bucket shuffle on hash(repo, path)
    (util.bucket_agg) so each file's whole history is bucket-local →
    per-bucket vectorized first/last set compare (merge with indicator,
    no per-file Python groups)."""
    from ..model import GRAPH_SEP
    from ..util import bucket_agg

    triples = extract_code_corpus(corpus)
    imp = (IMPORTS, IMPORTS_FROM)
    cols = ("repo", "path", "commit", "module")

    def _typed(frame: dict) -> pd.DataFrame:
        return pd.DataFrame(
            {c: pd.Series(frame.get(c, []), dtype="string") for c in cols}
        )

    def edge_rows(df: pd.DataFrame) -> pd.DataFrame:
        d = df[df["pred"].isin(imp)]
        if not len(d):
            return _typed({})
        parts = d["graph"].str.split(GRAPH_SEP, n=2, expand=True)
        return _typed(
            {
                "repo": parts[0].to_numpy(),
                "path": parts[1].to_numpy(),
                "commit": parts[2].to_numpy(),
                "module": d["obj"].to_numpy(),
            }
        ).drop_duplicates(ignore_index=True)

    def marker_rows(df: pd.DataFrame) -> pd.DataFrame:
        return _typed(
            {
                "repo": df["repo"].to_numpy(),
                "path": df["path"].to_numpy(),
                "commit": df["commit"].to_numpy(),
                "module": [""] * len(df),
            }
        ).drop_duplicates(ignore_index=True)

    rows = triples.map_batches(edge_rows, batch_format="pandas").union(
        corpus.map_batches(marker_rows, batch_format="pandas")
    )

    def diff(df: pd.DataFrame) -> pd.DataFrame:
        grp = df.groupby(["repo", "path"], sort=False)["commit"]
        lo = grp.transform("min")
        hi = grp.transform("max")
        ed = df[df["module"] != ""]
        keys = ["repo", "path", "module"]
        first = ed[ed["commit"] == lo[ed.index]][keys].drop_duplicates()
        last = ed[ed["commit"] == hi[ed.index]][keys].drop_duplicates()
        m = first.merge(last, on=keys, how="outer", indicator=True)
        changed = m[m["_merge"] != "both"]
        return pd.DataFrame(
            {
                "repo": changed["repo"].astype("string"),
                "path": changed["path"].astype("string"),
                "change": changed["_merge"]
                .map({"left_only": "-", "right_only": "+"})
                .astype("string"),
                "module": changed["module"].astype("string"),
            }
        ).reset_index(drop=True)

    return bucket_agg(rows, ["repo", "path"], diff, num_buckets=num_buckets)


def clone_groups(corpus, *, num_buckets: int = 64) -> "object":
    """Cross-repo exact clone detection — the content-identity form of
    entity linking over source files: files whose content sha256 is
    byte-identical form a clone group; every member of a group of
    size ≥ 2 is emitted as (repo, path, clone_root, group_size), where
    clone_root is the group's minimum ``repo\\x01path`` key (\\x01 sorts
    below every printable byte, so string order == (repo, path) tuple
    order — same trick as the sameAs alias roots).

    Digest map-side (the content never shuffles — only its 64-hex sha),
    ONE coarse bucket shuffle on hash(sha) via util.bucket_agg so each
    group is bucket-local, then a vectorized transform('min')/size scan
    per bucket."""
    from ..util import bucket_agg

    def digest(df: pd.DataFrame) -> pd.DataFrame:
        sha = pd.Series(
            [
                hashlib.sha256(t.encode("utf-8")).hexdigest()
                for t in df["content"].fillna("")
            ],
            index=df.index,
        )
        return pd.DataFrame(
            {
                "sha": sha.astype("string").to_numpy(),
                "repo": df["repo"].astype("string").to_numpy(),
                "path": df["path"].astype("string").to_numpy(),
            }
        )

    def groups(df: pd.DataFrame) -> pd.DataFrame:
        key = df["repo"].astype(str) + "\x01" + df["path"].astype(str)
        g = pd.DataFrame(
            {"sha": df["sha"], "repo": df["repo"], "path": df["path"], "key": key}
        )
        grp = g.groupby("sha", sort=False)["key"]
        g["clone_root"] = grp.transform("min")
        g["group_size"] = grp.transform("size").astype("int64")
        out = g[g["group_size"] >= 2]
        return pd.DataFrame(
            {
                "repo": out["repo"].astype("string"),
                "path": out["path"].astype("string"),
                "clone_root": out["clone_root"].astype("string"),
                "group_size": out["group_size"],
            }
        ).reset_index(drop=True)

    return bucket_agg(
        corpus.map_batches(digest, batch_format="pandas"),
        ["sha"],
        groups,
        num_buckets=num_buckets,
    )


def code_metrics(corpus) -> "object":
    """Per-module code-quality metrics for corpus curation — line count,
    comment-line count, branch-statement count, top-level def/class
    counts.  Pure map-side ``Series.str.count`` with inline-flag
    regexes: no shuffle, no per-row Python loop; non-Python rows
    contribute nothing."""

    def metrics(df: pd.DataFrame) -> pd.DataFrame:
        py = df[
            (df["lang"] == "python") | df["path"].str.endswith(".py")
        ].reset_index(drop=True)
        if not len(py):
            return pd.DataFrame(
                {
                    "module": pd.Series(dtype="string"),
                    **{
                        c: pd.Series(dtype="int64")
                        for c in (
                            "n_lines",
                            "n_comment_lines",
                            "n_branch_stmts",
                            "n_defs",
                            "n_classes",
                        )
                    },
                }
            )
        stem = py["path"].str.extract(r"([^/]+?)(?:\.py)?$", expand=False)
        c = py["content"].fillna("")
        return pd.DataFrame(
            {
                "module": _mod_iri(stem).astype("string"),
                "n_lines": c.str.count(r"\n").astype("int64"),
                "n_comment_lines": c.str.count(r"(?m)^[ \t]*#").astype("int64"),
                "n_branch_stmts": c.str.count(
                    r"(?m)^[ \t]*(?:if|elif|while|for)\b"
                ).astype("int64"),
                "n_defs": c.str.count(r"(?m)^def[ \t]").astype("int64"),
                "n_classes": c.str.count(r"(?m)^class[ \t]").astype("int64"),
            }
        )

    return corpus.map_batches(metrics, batch_format="pandas")
