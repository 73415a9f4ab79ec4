"""End-to-end validation pipeline and the Validator-style facade.

Mirrors the reference lifecycle (Main.java:51-57 / NospaValidator.java):
load → normalize → validateAll → results, re-expressed as:

    read_parquet(corpus) → map_batches(parse) → union(phase-1 derivations)
      → [schema-side collect → per-graph index → ray.put broadcast]
      → map_batches(pivot input build; phase-2 pushdown fused map-side)
      → groupby(bucket).map_groups(per-obs checks)
      → second-stage groupbys (IC-12 / IC-17 / IC-19..21)
      → findings Dataset

The triple stream is materialized once (object store by default, Parquet
checkpoint when ``checkpoint_dir`` is given — the resumable layout) since
three consumers read it: the schema collector (twice, filtered) and the
pivot.  Normalization phase 2 never materializes its fan-out as triples on
the hot path: the pushed-down values ride the broadcast index and are
emitted map-side into the pivot, which is what turns the reference's
obs × component insert loop (Normalizer.java:197-206) into a shuffle-free
transform.  ``export_model`` materializes them explicitly for parity with
``NospaValidator.exportModel`` (NospaValidator.java:56-67).
"""

from __future__ import annotations

import pandas as pd
import pyarrow as pa

import ray
import ray.data

from ..model import FINDINGS_SCHEMA, TRIPLE_SCHEMA
from ..sources.parse_stage import parse_corpus, read_corpus
from ..stages.normalize import with_phase1
from ..stages.pivot import run_pivot
from ..stages.schema_index import build_schema_indexes
from ..checks import finalize

_DETAIL_SEP = "\x1e"

ALL_ICS = [f"IC{i}" for i in range(1, 22)]


def assert_graph_block_alignment(triples) -> None:
    """Loud guard for the local path's one-graph-one-block invariant.

    Reads ONLY each block's first and last graph value (zero-copy Arrow
    column endpoints — no per-row scan) and raises when any graph touches
    the endpoints of more than one block, i.e. it was split across
    blocks: Ray's output buffer slices a yielded batch at
    ``target_max_block_size``, and parquet-sourced triple streams
    (checkpoints, foreign inputs) carry row-group boundaries — both
    silently corrupt every per-block check, so the misalignment must
    fail here with a pointer at mode='shuffle' instead.  Caught live by
    the round-4 sf0.1 sweep (phase-1 re-batching split 15/16 slice-cube
    graphs; findings were silently wrong)."""
    import uuid

    def endpoints(batch: pa.Table) -> pa.Table:
        g = batch.column("graph")
        return pa.table(
            {
                "block": pa.array([uuid.uuid4().hex]),
                "g_first": pa.array([g[0].as_py()]),
                "g_last": pa.array([g[batch.num_rows - 1].as_py()]),
            }
        )

    eps = triples.map_batches(
        endpoints, batch_format="pyarrow", batch_size=None
    ).to_pandas()
    if not len(eps):
        return
    from collections import Counter

    seen: Counter = Counter()
    for f, last in zip(eps["g_first"], eps["g_last"]):
        seen[f] += 1
        if last != f:
            seen[last] += 1
    bad = sorted(g for g, c in seen.items() if c > 1)
    if bad:
        raise RuntimeError(
            f"graph(s) {bad[:3]!r} span multiple Arrow blocks — the "
            "zero-shuffle local path requires one graph per block "
            "(parquet/checkpoint-sourced triples and oversize blocks are "
            "not block-aligned): validate this corpus with "
            "CubeValidator(mode='shuffle')"
        )


def _findings_table(df: pd.DataFrame) -> pa.Table:
    details = [
        [] if not d else d.split(_DETAIL_SEP) for d in df["detail"].tolist()
    ]
    return pa.Table.from_arrays(
        [
            pa.array(df["graph"].tolist(), pa.string()),
            pa.array(df["file_sha256"].tolist(), pa.string()),
            pa.array(df["ic"].tolist(), pa.string()),
            pa.array(df["subject"].tolist(), pa.string()),
            pa.array(details, pa.list_(pa.string())),
        ],
        schema=FINDINGS_SCHEMA,
    )


def _split_kind(pivot_out, kind: str):
    return pivot_out.map_batches(
        lambda df, kind=kind: df[df["kind"] == kind],
        batch_format="pandas",
    )


class CubeValidator:
    """Ray-Data-native analog of the reference ``Validator`` interface
    (Validator.java:6-24: exportModel / normalize / validateAll) plus the
    per-IC entry points of NospaValidator (README.md:53-73)."""

    def __init__(
        self,
        corpus=None,
        *,
        corpus_path: str | None = None,
        triples=None,
        num_buckets: int | None = None,
        checkpoint_dir: str | None = None,
        strict_parse: bool = False,
        parse_concurrency=None,
        mode: str = "auto",
    ):
        """``mode="local"``: zero-shuffle per-file validation — valid
        while no single file's triples exceed one Arrow block (the parser
        keeps each file's triples in one block; see pivot.LocalCheck).
        ``mode="shuffle"``: the bucketed pivot shuffle for giant single
        files / triple Datasets whose blocks are not file-aligned (an
        external triple Dataset or a Parquet checkpoint).  ``auto`` picks
        shuffle in those two cases, local otherwise."""
        if mode == "auto":
            mode = "shuffle" if (checkpoint_dir or triples is not None) else "local"
        if mode not in ("local", "shuffle"):
            raise ValueError(mode)
        if mode == "local" and (checkpoint_dir or triples is not None):
            # the local path's correctness rests on one-graph-per-block,
            # which only the parse pipeline guarantees; an external triple
            # Dataset or a parquet checkpoint is not file-aligned and
            # would silently self-index partial graphs
            raise ValueError(
                "mode='local' requires the file-aligned parse path; use "
                "mode='auto'/'shuffle' with triples= or checkpoint_dir"
            )
        self.mode = mode
        if corpus is None and corpus_path is not None:
            corpus = read_corpus(corpus_path)
        if corpus is None and triples is None:
            raise ValueError("need corpus, corpus_path or triples")
        if isinstance(corpus, pa.Table):
            corpus = ray.data.from_arrow(corpus)
        self._corpus = corpus
        self._raw_triples = triples
        self.num_buckets = num_buckets
        self.checkpoint_dir = checkpoint_dir
        self.strict_parse = strict_parse
        self.parse_concurrency = parse_concurrency
        self._triples = None        # normalized (phase 1) triple stream
        self._derived_buckets = None
        self._indexes = None
        self._index_ref = None
        self._findings = None

    # -- normalize --------------------------------------------------------

    def normalize(self):
        """Parse + phase-1 closure, materialized once for multi-consumer
        reads (Parquet checkpoint if configured, else object store)."""
        if self._triples is not None:
            return self._triples
        t = self._raw_triples
        if t is None:
            # local mode's zero-shuffle checks need each graph in ONE Arrow
            # block; Ray splits task outputs near target_max_block_size
            # (128 MB ≈ 400K triple rows), so larger files must fail fast
            # with a pointer at mode="shuffle" rather than silently split
            t = parse_corpus(
                self._corpus,
                strict=self.strict_parse,
                concurrency=self.parse_concurrency,
                max_triples_per_file=400_000 if self.mode == "local" else None,
                # and by bytes: long IRIs/literals can exceed the 128 MB
                # block budget well under 400K rows (96 MB leaves margin)
                max_bytes_per_file=(96 << 20) if self.mode == "local" else None,
                # shuffle mode: chunk giant Turtle files so one 200 MB file
                # parses in parallel instead of serially on one task
                split_threshold=(32 << 20) if self.mode == "shuffle" else None,
            )
        t = with_phase1(t)
        if self.checkpoint_dir:
            import glob
            import os
            import shutil

            # Ray's write_parquet APPENDS: a stale/partial checkpoint from
            # an earlier run or corpus version would silently merge into
            # this one — start from an empty directory
            if os.path.isdir(self.checkpoint_dir):
                shutil.rmtree(self.checkpoint_dir)
            t.write_parquet(self.checkpoint_dir)
            if glob.glob(os.path.join(self.checkpoint_dir, "*.parquet")):
                t = ray.data.read_parquet(self.checkpoint_dir)
            else:
                # zero-triple corpus: Ray skips empty blocks entirely, so
                # the directory has no files to read — empty triple stream
                t = ray.data.from_arrow(
                    pa.Table.from_arrays(
                        [pa.array([], f.type) for f in TRIPLE_SCHEMA],
                        schema=TRIPLE_SCHEMA,
                    )
                )
        else:
            t = t.materialize()
        self._triples = t
        return t

    def _buckets(self) -> int:
        """Shuffle-group count — derived from the triple count unless set.

        Ray 2.49's sort-based groupby degrades sharply once a key value's
        row volume passes ~50K rows (measured on an 8×540K-obs corpus,
        39 M pivot rows, 32 cpus: 512 buckets = 154 s, 1024 = 15 s,
        2048 = 9.5 s, 4096 = 11 s), so buckets are sized to ~16K rows
        each: floor 256 (tiny corpora pay ≤0.25 s of per-key overhead),
        cap 2^18 (the ~0.5 ms/distinct-key aggregator cost stays ≤2 min
        even at 10^10-triple scale, where it amortizes)."""
        if self.num_buckets is not None:
            return self.num_buckets
        if self._derived_buckets is None:
            import math

            n = self.normalize().count()  # materialized → metadata count
            self._derived_buckets = min(
                1 << 18, 1 << max(8, math.ceil(math.log2(max(1, n // 16_000))))
            )
        return self._derived_buckets

    def _ensure_indexes(self):
        if self._indexes is None:
            if self.mode == "local":
                from ..stages.schema_index import build_schema_indexes_local

                self._indexes = build_schema_indexes_local(self.normalize())
            else:
                self._indexes = build_schema_indexes(self.normalize())
            self._index_ref = ray.put(self._indexes)
        return self._indexes

    # -- validate ---------------------------------------------------------

    def validate_all(self):
        """All 21 ICs; returns the findings Dataset
        (graph, file_sha256, ic, subject, detail)."""
        if self._findings is not None:
            return self._findings
        triples = self.normalize()
        if self.mode == "local":
            return self._validate_local(triples)

        indexes = self._ensure_indexes()
        pivot_out = run_pivot(triples, self._index_ref, self._buckets()).materialize()

        f_stream = _split_kind(pivot_out, "f").map_batches(
            lambda df: df[["graph", "file_sha256", "ic", "subject", "detail"]],
            batch_format="pandas",
        )
        # IC-12 + IC-19/20/21 + IC-17 share ONE bucketed shuffle (disjoint
        # kb spaces per kind); findings render inside the map_groups —
        # observation-scale on a pathological corpus, never driver-side
        fused = finalize.fused_findings(pivot_out, indexes, self._buckets())

        driver_dfs = [
            finalize.schema_findings_df(indexes),
            finalize.ic2_findings(
                _split_kind(pivot_out, "dss")
                .map_batches(
                    lambda df: df[["graph", "dataset"]].drop_duplicates(),
                    batch_format="pandas",
                )
                .to_pandas()
                .to_dict("records"),
                indexes,
            ),
        ]
        driver_df = pd.concat(driver_dfs, ignore_index=True)

        streams = [f_stream, fused]
        parts = [
            ds.map_batches(
                lambda df: _findings_table(df), batch_format="pandas"
            )
            for ds in streams
        ]
        findings = parts[0].union(*parts[1:])
        if len(driver_df):
            findings = findings.union(
                ray.data.from_arrow(_findings_table(driver_df))
            )
        self._findings = findings.materialize()
        return self._findings

    def _validate_local(self, triples):
        """Zero-shuffle, zero-broadcast path: ONE map_batches per block
        builds the block's own schema indexes (schema subgraphs are
        file-local), evaluates every IC including the schema-side ones and
        all second-stage groupings, and emits final findings.  No state
        scales with the corpus — neither a driver loop nor a broadcast."""
        from ..stages.pivot import local_findings

        assert_graph_block_alignment(triples)
        self._findings = local_findings(triples).materialize()
        return self._findings

    def validate(self, ics) -> "ray.data.Dataset":
        """Selective validation (the reference's per-IC public methods) —
        the engine amortizes all ICs over shared shuffles, so selection is
        a filter on the findings."""
        ics = set(ics)
        unknown = ics - set(ALL_ICS)
        if unknown:
            # a typo ("ic12", "IC-12") must not masquerade as a clean run
            raise ValueError(
                f"unknown IC name(s) {sorted(unknown)}; valid: IC1..IC21"
            )
        # vectorized batch filter, not Dataset.filter(lambda): the row
        # path pays per-row Python on finding-scale data
        keep = sorted(ics)
        return self.validate_all().map_batches(
            lambda df, k=keep: df[df["ic"].isin(k)].reset_index(drop=True),
            batch_format="pandas",
        )

    def findings_df(self) -> pd.DataFrame:
        df = self.validate_all().to_pandas()
        if "detail" not in df.columns:  # zero-finding corpus → schema-less empty
            return pd.DataFrame(
                columns=["graph", "file_sha256", "ic", "subject", "detail"]
            )
        df["detail"] = df["detail"].map(lambda d: sorted(d))
        return df

    # -- export -----------------------------------------------------------

    def normalized_triples(self):
        """Phase-1 ∪ phase-2 triples (phase 2 materialized here only —
        export parity with NospaValidator.exportModel)."""
        triples = self.normalize()
        self._ensure_indexes()
        from ..stages.export import phase2_triples, exact_dedup_triples

        p2 = phase2_triples(triples, self._index_ref)
        return exact_dedup_triples(triples.union(p2), self._buckets())

    def export_model(self, out_dir: str, fmt: str = "parquet"):
        """exportModel parity (NospaValidator.java:56-67): serialize the
        fully-normalized model.  ``fmt`` ∈ parquet (canonical) | ntriples
        | turtle | rdfxml | nquads (graph column as the 4th term),
        mirroring the reference's Jena format choice."""
        t = self.normalized_triples()
        if fmt == "parquet":
            t.write_parquet(out_dir)
            return out_dir
        from ..stages import export as X

        if fmt in ("ntriples", "nt"):
            X.write_ntriples(t, out_dir)
        elif fmt in ("turtle", "ttl"):
            X.write_turtle(t, out_dir)
        elif fmt in ("rdfxml", "rdf", "xml"):
            X.write_rdfxml(t, out_dir)
        elif fmt in ("nquads", "nq"):
            X.write_nquads(t, out_dir)
        else:
            raise ValueError(f"unknown export format {fmt!r}")
        return out_dir
