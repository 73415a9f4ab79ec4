"""Corpus → triple-table Ray Data stages.

Input is the driver-mandated Parquet table of source-code repository files
``(repo, path, commit, lang, content)``; the reference's whole-file
``model.read`` (NospaValidator.java:40-48) becomes a stateless
``map_batches`` transform that fans each file's content out into N triple
rows (Arrow in / Arrow out, one parser instance per actor).
"""

from __future__ import annotations

import hashlib

import pyarrow as pa

import ray.data

from ..model import TRIPLE_SCHEMA, make_graph_id
from .rdf_parser import format_for, parse_document, RDFSyntaxError


def read_corpus(paths, *, columns=None) -> "ray.data.Dataset":
    """Read the (repo, path, commit, lang, content) table; prune columns at
    the read so only what the parser needs leaves storage."""
    return ray.data.read_parquet(
        paths, columns=columns or ["repo", "path", "commit", "lang", "content"]
    )


class SplitLargeFiles:
    """Pre-parse stage: break Turtle documents larger than ``threshold``
    into independently parseable chunk rows (blank-line statement
    boundaries, prefixes replicated, per-chunk bnode prefixes downstream)
    so a giant single file parses in parallel instead of serially.

    Emits (repo, path, commit, lang, content, chunk_id, file_sha): the
    whole-document sha256 rides every chunk row — the per-row content
    invariant is against the ORIGINAL file.  Only valid on the shuffle
    validation path (chunks of one graph land in different blocks)."""

    def __init__(self, threshold: int, chunk_bytes: int):
        self.threshold = threshold
        self.chunk_bytes = chunk_bytes

    def __call__(self, batch: pa.Table) -> pa.Table:
        from .rdf_parser import RDFSyntaxError, split_turtle

        out = {k: [] for k in ("repo", "path", "commit", "lang", "content",
                               "chunk_id", "file_sha")}

        def emit(repo, path, commit, lang, content, cid, sha):
            out["repo"].append(repo)
            out["path"].append(path)
            out["commit"].append(commit)
            out["lang"].append(lang)
            out["content"].append(content)
            out["chunk_id"].append(cid)
            out["file_sha"].append(sha)

        for repo, path, commit, lang, content in zip(
            *(batch.column(c).to_pylist()
              for c in ("repo", "path", "commit", "lang", "content"))
        ):
            if content is None:
                continue
            sha = hashlib.sha256(content.encode("utf-8")).hexdigest()
            fmt = format_for(lang, path)
            if fmt == "turtle" and len(content) > self.threshold:
                try:
                    chunks = split_turtle(content, self.chunk_bytes)
                except RDFSyntaxError:
                    chunks = [content]  # unsplittable layout → whole-file parse
            else:
                chunks = [content]
            if len(chunks) == 1:
                emit(repo, path, commit, lang, chunks[0], 0, sha)
            else:
                # 1-based so chunk_id is truthy for EVERY chunk of a split
                # file — downstream "is this a chunk row" guards (lenient-
                # mode corruption raise, chunk-scoped bnode prefixes) must
                # fire for the first chunk too
                for i, c in enumerate(chunks):
                    emit(repo, path, commit, lang, c, i + 1, sha)

        return pa.table(
            {
                "repo": pa.array(out["repo"], pa.string()),
                "path": pa.array(out["path"], pa.string()),
                "commit": pa.array(out["commit"], pa.string()),
                "lang": pa.array(out["lang"], pa.string()),
                "content": pa.array(out["content"], pa.string()),
                "chunk_id": pa.array(out["chunk_id"], pa.int32()),
                "file_sha": pa.array(out["file_sha"], pa.string()),
            }
        )


class ParseRDF:
    """Actor-pool stage: one batch of corpus rows → triple rows.

    Non-RDF rows (``lang`` not an RDF serialization and no RDF file
    extension) are skipped silently, mirroring the reference CLI which is
    only ever handed cube files.  Rows that fail to parse become zero
    triples plus an error row in the side ``errors`` column handling —
    kept simple: parse errors raise by default (strict=True) or skip.
    """

    def __init__(
        self,
        strict: bool = True,
        max_triples_per_file: int | None = None,
        max_bytes_per_file: int | None = None,
    ):
        self.strict = strict
        self.max_triples_per_file = max_triples_per_file
        self.max_bytes_per_file = max_bytes_per_file

    def __call__(self, batch: pa.Table) -> pa.Table:
        graphs: list[str] = []
        shas: list[str] = []
        subjs: list[str] = []
        preds: list[str] = []
        okinds: list[int] = []
        objs: list[str] = []
        odts: list[str] = []
        olangs: list[str] = []

        repo_col = batch.column("repo").to_pylist()
        path_col = batch.column("path").to_pylist()
        commit_col = batch.column("commit").to_pylist()
        lang_col = batch.column("lang").to_pylist()
        content_col = batch.column("content").to_pylist()
        has_chunks = "chunk_id" in batch.column_names
        chunk_col = batch.column("chunk_id").to_pylist() if has_chunks else [0] * batch.num_rows
        sha_col = batch.column("file_sha").to_pylist() if has_chunks else [None] * batch.num_rows

        for repo, path, commit, lang, content, cid, fsha in zip(
            repo_col, path_col, commit_col, lang_col, content_col, chunk_col, sha_col
        ):
            fmt = format_for(lang, path)
            if fmt is None or content is None:
                continue
            sha = fsha or hashlib.sha256(content.encode("utf-8")).hexdigest()
            glabels = None
            try:
                if fmt == "turtle" and cid:
                    from .rdf_parser import parse_turtle

                    triples = parse_turtle(content, anon_prefix=f"c{cid}_a")
                elif fmt in ("nquads", "trig"):
                    # the quad's graph label scopes the row; default-graph
                    # rows fall back to the file's graph id below
                    from .rdf_parser import KIND_BNODE, parse_nquads, parse_trig

                    quads = (
                        parse_nquads(content)
                        if fmt == "nquads"
                        else parse_trig(content)
                    )
                    # RDF 1.1 scopes blank-node labels to the DOCUMENT:
                    # a named graph can span files, so every bnode
                    # (subject, object, bnode graph label) is
                    # standardized apart with a per-file tag — two
                    # files writing _:b1 into the same named graph must
                    # NOT merge into one node.  (The 3-term formats
                    # never needed this: there, graph scope == file
                    # scope by construction.)
                    tag = f"_:d{sha[:12]}_"

                    def _bn(term: str, tag=tag) -> str:
                        return tag + term[2:]

                    triples = []
                    glabels = []
                    for g, (s, p, k, o, dt, lg) in quads:
                        glabels.append(_bn(g) if g.startswith("_:") else g)
                        triples.append(
                            (
                                _bn(s) if s.startswith("_:") else s,
                                p,
                                k,
                                _bn(o) if k == KIND_BNODE else o,
                                dt,
                                lg,
                            )
                        )
                else:
                    triples = parse_document(content, fmt)
            except RDFSyntaxError as e:
                if self.strict:
                    raise
                if cid:
                    # a chunk row comes from split_turtle on a document that
                    # DID look splittable: skipping it would silently drop
                    # that chunk's triples from an otherwise-parsed file, so
                    # always surface chunk corruption even in lenient mode
                    raise RDFSyntaxError(
                        f"chunk {cid} of {path!r} failed to parse "
                        f"(bad split boundary?): {e}"
                    ) from e
                continue
            gid = make_graph_id(repo, path, commit)
            if (
                glabels is not None
                and any(glabels)
                and (
                    self.max_triples_per_file is not None
                    or self.max_bytes_per_file is not None
                )
            ):
                # the size caps mark the zero-shuffle LOCAL path, which
                # assumes one graph == one file == one block; a named
                # graph can span files, so quad corpora with graph
                # labels must take the bucketed shuffle path (same
                # remedy as the size guards below)
                raise RuntimeError(
                    f"file {path!r} carries named graph labels, which "
                    "break the local path's one-graph-one-block "
                    "invariant: validate this corpus with "
                    "CubeValidator(mode='shuffle')"
                )
            n = len(triples)
            if self.max_triples_per_file is not None and n > self.max_triples_per_file:
                # the zero-shuffle local path requires a graph to fit one
                # Arrow block; a file this large must go through the
                # bucketed shuffle path instead
                raise RuntimeError(
                    f"file {path!r} produced {n} triples "
                    f"(> {self.max_triples_per_file}): validate this corpus "
                    "with CubeValidator(mode='shuffle')"
                )
            if self.max_bytes_per_file is not None and n:
                # row count alone is a weak proxy: Ray splits task outputs
                # at target_max_block_size by BYTES, and long IRIs/literals
                # can blow past it under the row cap, silently splitting a
                # graph across blocks.  Estimate serialized size from a
                # bounded (≤2048-triple) strided sample — constant cost per
                # file; this VM is bandwidth-bound at wide parallelism, so
                # the guard must not add per-triple traffic.
                stride = max(1, n // 2048)
                est = stride * sum(
                    len(t[0]) + len(t[1]) + len(t[3]) + len(t[4]) + len(t[5]) + 16
                    for t in triples[::stride]
                )
                if est > self.max_bytes_per_file:
                    raise RuntimeError(
                        f"file {path!r} produced ~{est >> 20} MB of triples "
                        f"(> {self.max_bytes_per_file >> 20} MB block budget): "
                        "validate this corpus with CubeValidator(mode='shuffle')"
                    )
            if glabels is None:
                graphs.extend([gid] * n)
            else:
                graphs.extend([g or gid for g in glabels])
            shas.extend([sha] * n)
            for s, p, k, o, dt, lg in triples:
                subjs.append(s)
                preds.append(p)
                okinds.append(k)
                objs.append(o)
                odts.append(dt)
                olangs.append(lg)

        return pa.Table.from_arrays(
            [
                pa.array(graphs, pa.string()),
                pa.array(shas, pa.string()),
                pa.array(subjs, pa.string()),
                pa.array(preds, pa.string()),
                pa.array(okinds, pa.int8()),
                pa.array(objs, pa.string()),
                pa.array(odts, pa.string()),
                pa.array(olangs, pa.string()),
            ],
            schema=TRIPLE_SCHEMA,
        )


def parse_corpus(
    corpus: "ray.data.Dataset",
    *,
    strict: bool = True,
    batch_size: int = 1,
    concurrency=None,
    max_triples_per_file: int | None = None,
    max_bytes_per_file: int | None = None,
    split_threshold: int | None = None,
    chunk_bytes: int = 4 << 20,
) -> "ray.data.Dataset":
    """corpus Dataset → triple Dataset.

    ``batch_size`` counts *files* and defaults to 1: cube files are large
    (a few MB of Turtle → ~10^5 triple rows each), so one file per task
    maximizes parse parallelism and keeps output blocks near the Arrow
    sweet spot without holding many parsed documents in one heap.
    """
    if split_threshold is not None:
        # chunk giant files, then repartition so every chunk row lands in
        # its own block (repartition defaults to shuffle=False — a local
        # block split/merge, not an all-to-all — and one-row-one-block is
        # the same one-graph-one-block invariant local mode relies on).
        # Probe for chunks on the pruned chunk_id column first so a corpus
        # with no giant files skips the block rewrite entirely
        # (chunk ids are 1-based for split files, 0 otherwise).
        chunked = corpus.map_batches(
            SplitLargeFiles(split_threshold, chunk_bytes),
            batch_format="pyarrow",
            batch_size=1,
        ).materialize()
        max_chunk = chunked.select_columns(["chunk_id"]).max("chunk_id")
        if max_chunk and max_chunk > 0:
            corpus = chunked.repartition(max(1, chunked.count()))
        else:
            corpus = chunked
    return corpus.map_batches(
        ParseRDF(strict, max_triples_per_file, max_bytes_per_file),
        batch_format="pyarrow",
        batch_size=batch_size,
        concurrency=concurrency,
    )


class ExtractAny:
    """Format-dispatch extraction UDF: RDF rows (Turtle / N-Triples /
    RDF-XML, by ``lang`` then file extension — rdf_parser.format_for,
    the reference's ext→format map at Main.java:23-43) go through
    :class:`ParseRDF`, Python rows through
    ``code_extract.ExtractCodeTriples``, anything else contributes zero
    triples.  One batch in, one TRIPLE_SCHEMA Arrow table out — both
    kernels skip non-matching rows themselves and always return typed
    (possibly empty) TRIPLE_SCHEMA tables, so no schema-less block can
    ever reach downstream ops (a two-branch filter+union design leaks
    0-row object-dtype blocks whenever an input block is single-format:
    the graft-env-quirks empty-block trap)."""

    def __init__(self, strict: bool = True):
        from .code_extract import ExtractCodeTriples

        self._rdf = ParseRDF(strict)
        self._code = ExtractCodeTriples()

    def __call__(self, batch: pa.Table) -> pa.Table:
        rdf = self._rdf(batch)
        code = self._code(batch.to_pandas())
        if code.num_rows == 0:
            return rdf
        if rdf.num_rows == 0:
            return code
        return pa.concat_tables([rdf, code])


def extract_corpus(
    corpus: "ray.data.Dataset",
    *,
    strict: bool = True,
    concurrency=None,
    batch_size: int = 1,
) -> "ray.data.Dataset":
    """Heterogeneous-corpus front end: ONE triple Dataset from a mixed
    repository table via a SINGLE :class:`ExtractAny` map_batches stage
    (rows can't match both kernels — no RDF format alias maps to
    python / .py).  ``batch_size`` counts files, like
    :func:`parse_corpus`.  Giant-Turtle chunk splitting is exclusive to
    the pure-RDF :func:`parse_corpus` path."""
    return corpus.map_batches(
        ExtractAny(strict),
        batch_format="pyarrow",
        batch_size=batch_size,
        concurrency=concurrency,
    )
