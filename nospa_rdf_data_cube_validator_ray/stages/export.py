"""Normalized-model export: phase-2 materialization + exact triple dedup.

On the hot validation path phase-2 pushdown values never exist as triples
(they ride the broadcast index into the pivot).  ``exportModel`` parity
(NospaValidator.java:56-67) requires the actual triple set, so this stage
materializes the pushdown emits and exact-dedups the union: hash the
triple identity per batch, bucket-shuffle, drop duplicates per bucket.
Jena's Model is a set (model.add is idempotent) — this is the only place
the engine pays for that set property with a full shuffle, and it is off
the validation path.
"""

from __future__ import annotations

import zlib

import pandas as pd
import pyarrow as pa

import ray

from .. import vocab as V
from ..model import KIND_LITERAL, TRIPLE_SCHEMA, parse_term
from ..model_terms import subj_term
from .pivot import _IndexCache


class Phase2Emit:
    """qb:dataSet / qb:observation edges × broadcast attachment values →
    derived triples (Normalizer.java:90-189)."""

    def __init__(self, index_ref):
        self.index_ref = index_ref
        self._indexes = None

    def __call__(self, batch: pa.Table) -> pa.Table:
        if self._indexes is None:
            self._indexes = _IndexCache.get(self.index_ref)
        indexes = self._indexes
        out = {k: [] for k in TRIPLE_SCHEMA.names}

        def emit(g, sha, s, p, term):
            k, o, dt, lang = parse_term(term)
            out["graph"].append(g)
            out["file_sha256"].append(sha)
            out["subj"].append(s)
            out["pred"].append(p)
            out["obj_kind"].append(k)
            out["obj"].append(o)
            out["obj_dt"].append(dt)
            out["obj_lang"].append(lang)

        cols = [
            batch.column(c).to_pylist()
            for c in ("graph", "file_sha256", "subj", "pred", "obj_kind", "obj", "obj_dt", "obj_lang")
        ]
        for g, sha, s, p, k, o, dt, lg_ in zip(*cols):
            idx = indexes.get(g)
            if idx is None:
                continue
            if p == V.QB_dataSet:
                from ..model import term_str

                dterm = term_str(k, o, dt, lg_)
                vals_by_prop = idx.ds_attach.get(dterm)
                if vals_by_prop:
                    for prop, vals in vals_by_prop.items():
                        for v in vals:
                            emit(g, sha, s, prop, v)
            elif p == V.QB_observation and k != KIND_LITERAL:
                push = idx.slice_push.get(subj_term(s))
                if push:
                    for prop, vals in push.items():
                        for v in vals:
                            emit(g, sha, o, prop, v)

        return pa.Table.from_arrays(
            [pa.array(out[f.name], f.type) for f in TRIPLE_SCHEMA],
            schema=TRIPLE_SCHEMA,
        )


def phase2_triples(triples, index_ref):
    return triples.map_batches(Phase2Emit(index_ref), batch_format="pyarrow")


def _add_triple_hash(batch: pa.Table, num_buckets: int) -> pa.Table:
    cols = [batch.column(c).to_pylist() for c in ("graph", "subj", "pred", "obj_kind", "obj", "obj_dt", "obj_lang")]
    buckets = [
        zlib.crc32("\x00".join((g, s, p, str(k), o, dt, lg_)).encode("utf-8")) % num_buckets
        for g, s, p, k, o, dt, lg_ in zip(*cols)
    ]
    return batch.append_column("bucket", pa.array(buckets, pa.int32()))


def _dedup_group(df: pd.DataFrame) -> pd.DataFrame:
    return df.drop_duplicates(
        subset=["graph", "subj", "pred", "obj_kind", "obj", "obj_dt", "obj_lang"]
    ).drop(columns=["bucket"])


def write_ntriples(triples, out_dir: str) -> list[str]:
    """Serialize the triple Dataset as N-Triples text, one ``part-*.nt``
    per block (exportModel's RDF text output, NospaValidator.java:56-67;
    our canonical sink stays Parquet — this is the interchange format).
    Each task writes its own part file (side-effect sink with task-unique
    names); returns the file list."""
    import os
    import uuid

    from ..model import term_str

    os.makedirs(out_dir, exist_ok=True)

    def write_block(batch: pa.Table) -> pa.Table:
        cols = [
            batch.column(c).to_pylist()
            for c in ("subj", "pred", "obj_kind", "obj", "obj_dt", "obj_lang")
        ]
        lines = []
        for s, p, k, o, dt, lg_ in zip(*cols):
            st = s if s.startswith("_:") else f"<{s}>"
            lines.append(f"{st} <{p}> {term_str(k, o, dt, lg_)} .")
        path = os.path.join(out_dir, f"part-{uuid.uuid4().hex}.nt")
        with open(path, "w") as f:
            f.write("\n".join(lines) + ("\n" if lines else ""))
        return pa.table({"path": pa.array([path]), "rows": pa.array([len(lines)])})

    manifest = triples.map_batches(
        write_block, batch_format="pyarrow", batch_size=None
    ).take_all()
    return sorted(r["path"] for r in manifest)


def exact_dedup_triples(triples, num_buckets: int = 64):
    """Exact set-dedup of the triple table: per-batch identity hash →
    bucket shuffle → per-bucket drop_duplicates (the groupby-shuffle dedup
    pattern; duplicates of one triple always share a bucket)."""
    hashed = triples.map_batches(
        lambda b, n=num_buckets: _add_triple_hash(b, n), batch_format="pyarrow"
    )
    return hashed.groupby("bucket").map_groups(_dedup_group, batch_format="pandas")
