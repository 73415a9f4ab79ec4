"""Entity mention linking over a document corpus — the text-side half
of KG construction: find gazetteer entities in raw text, emit
(document, entity) mention tables and entity co-occurrence candidate
edges (the classic distant-supervision relation-candidate shape).

Design for 100 TB:
* the gazetteer (entity label dictionary) is the SMALL side — built
  once with a bucketed distinct, then broadcast via ``ray.put`` and
  read zero-copy in every matching task (never re-shipped per batch,
  never a shuffle join against the corpus);
* mention matching is map-ONLY: one vectorized tokenize + isin per
  batch, counts are exact per document because a document is one row —
  no exchange touches corpus-scale data;
* co-occurrence pairs fan out per document (bounded by
  ``max_entities_per_doc``, which RAISES on pathological docs rather
  than silently truncating) and collapse through one coarse bucketed
  count — the only shuffle, at pair-vocabulary scale, not corpus scale.

Tokenization is the project-wide ASCII ``\\S+`` (functions/text.py) so
every count is exactly reproducible by the DuckDB oracles'
``regexp_extract_all(text, '\\S+')``.
"""

from __future__ import annotations

import numpy as np
import pandas as pd

import ray
import ray.data

from ..functions.text import _TOKEN_RE
from ..util import bucket_agg, bucket_count
from .dedup import _md5_u64_cached


def build_gazetteer(
    docs: "ray.data.Dataset", *, mod: int = 5, residue: int = 0
) -> "ray.data.Dataset":
    """Deterministic label dictionary: the distinct corpus tokens whose
    md5 lands on ``residue`` (mod ``mod``) — a stand-in for an external
    entity-label list that keeps tests self-contained (the md5 kernel
    is the same ``md5_number_lower`` bridge every oracle replays).
    Map-side per-batch dedup, then one bucketed distinct: token-scale
    keys never reach a per-key Ray aggregate."""

    def local(df: pd.DataFrame) -> pd.DataFrame:
        toks = df["text"].fillna("").str.findall(_TOKEN_RE)
        flat = pd.unique(
            np.concatenate([np.asarray(t, dtype=object) for t in toks])
            if len(toks)
            else np.array([], dtype=object)
        )
        keep = [t for t in flat if _md5_u64_cached(t) % mod == residue]
        return pd.DataFrame({"entity": pd.array(keep, dtype="string")})

    cand = docs.map_batches(local, batch_format="pandas")
    return bucket_agg(
        cand, ["entity"], lambda df: df.drop_duplicates(["entity"])
    )


def _collect_labels(gazetteer: "ray.data.Dataset"):
    """Gazetteer → a broadcast pandas Index in the object store.  The
    dictionary side is assumed worker-RAM-sized (label lists are MBs at
    web scale); ``ray.put`` once, zero-copy ``ray.get`` per task."""
    df = gazetteer.to_pandas()
    labels = (
        pd.Index(df["entity"].astype(object))
        if len(df)
        else pd.Index([], dtype=object)
    )
    return ray.put(labels)


def entity_mentions(
    docs: "ray.data.Dataset", gazetteer: "ray.data.Dataset"
) -> "ray.data.Dataset":
    """(doc_id, entity, n_mentions) for every gazetteer entity occurring
    in each document — map-only (a document is one row, so per-batch
    counts are globally exact; nothing shuffles)."""
    ref = _collect_labels(gazetteer)

    def match(df: pd.DataFrame) -> pd.DataFrame:
        labels = ray.get(ref)
        toks = df["text"].fillna("").str.findall(_TOKEN_RE)
        lens = toks.str.len().to_numpy(dtype=np.int64)
        flat = (
            np.concatenate([np.asarray(t, dtype=object) for t in toks])
            if lens.sum()
            else np.array([], dtype=object)
        )
        doc = np.repeat(df["doc_id"].to_numpy(), lens)
        m = pd.Index(flat).isin(labels)
        out = pd.DataFrame({"doc_id": doc[m], "entity": flat[m]})
        out = out.groupby(["doc_id", "entity"], as_index=False, sort=False).agg(
            n_mentions=("entity", "size")
        )
        return out.astype(
            {"doc_id": "int64", "entity": "string", "n_mentions": "int64"}
        )

    return docs.map_batches(match, batch_format="pandas")


def entity_cooccur(
    mentions: "ray.data.Dataset",
    *,
    min_count: int = 2,
    max_entities_per_doc: int = 512,
    num_buckets: int = 64,
) -> "ray.data.Dataset":
    """Relation-candidate edges: unordered entity pairs co-mentioned in
    a document, counted across the corpus, kept at ``>= min_count``.
    Consumes :func:`entity_mentions` output.

    Pair fan-out is quadratic per document, so documents beyond
    ``max_entities_per_doc`` distinct entities RAISE (a loud skew guard
    — silent truncation would undercount edges); the per-doc pair sets
    collapse through one coarse bucketed count."""

    def doc_pairs(df: pd.DataFrame) -> pd.DataFrame:
        de = df[["doc_id", "entity"]].drop_duplicates()
        k = de.groupby("doc_id", sort=False)["entity"].size()
        if len(k) and int(k.max()) > max_entities_per_doc:
            raise RuntimeError(
                f"entity_cooccur: a document mentions {int(k.max())} distinct "
                f"entities (> {max_entities_per_doc}); raise the cap "
                "explicitly if this corpus is expected to be that dense"
            )
        # vectorized all-pairs: self-merge within doc, keep a < b
        p = de.merge(de, on="doc_id", suffixes=("_a", "_b"))
        p = p[p["entity_a"] < p["entity_b"]]
        return pd.DataFrame(
            {
                "ent_a": p["entity_a"].astype("string"),
                "ent_b": p["entity_b"].astype("string"),
            }
        )

    # a document's mention rows are emitted inside one batch by
    # entity_mentions, but a downstream repartition could split them —
    # group by doc bucket first so pair generation sees whole documents
    def regroup_pairs(df: pd.DataFrame) -> pd.DataFrame:
        return doc_pairs(df)

    pairs = bucket_agg(
        mentions, ["doc_id"], regroup_pairs, num_buckets=num_buckets
    )
    counted = bucket_count(
        pairs, ["ent_a", "ent_b"], out_col="n", num_buckets=num_buckets
    )

    def thresh(df: pd.DataFrame) -> pd.DataFrame:
        return df[df["n"] >= min_count].reset_index(drop=True)

    return counted.map_batches(thresh, batch_format="pandas")


def entity_lift(
    mentions: "ray.data.Dataset",
    *,
    min_count: int = 2,
    num_buckets: int = 64,
) -> "ray.data.Dataset":
    """PMI-family association scoring of the co-occurrence edges —
    the step that turns raw relation-candidate counts into ranked
    candidates: ``lift(a, b) = N * c(a,b) / (c(a) * c(b))`` where
    ``c`` counts documents and ``N`` is the corpus document count
    (lift is exp(PMI); the RATIO form keeps both sides IEEE-exact —
    one int64→float64 conversion and ONE division, whereas ln() is
    not bit-reproducible across libms).

    Scale shape: pair counts come from :func:`entity_cooccur` (the one
    pair-vocabulary-scale shuffle); per-entity document frequencies are
    entity-vocabulary-scale — the same dictionary regime as the
    gazetteer itself — so they collapse through a bucketed count and
    BROADCAST once via ``ray.put``; the scoring pass is map-only."""
    de = mentions.map_batches(
        lambda df: df[["doc_id", "entity"]].drop_duplicates(),
        batch_format="pandas",
    ).materialize()
    pairs = entity_cooccur(mentions, min_count=min_count,
                           num_buckets=num_buckets)
    ec = bucket_count(de, ["entity"], out_col="c", num_buckets=num_buckets)
    ecp = ec.to_pandas()
    n_docs = int(
        bucket_agg(
            de.map_batches(
                lambda df: df[["doc_id"]].drop_duplicates(),
                batch_format="pandas",
            ),
            ["doc_id"],
            lambda df: df.drop_duplicates(["doc_id"]),
            num_buckets=num_buckets,
        ).count()
    )
    ref = ray.put(dict(zip(ecp["entity"], ecp["c"])) if len(ecp) else {})

    def score(df: pd.DataFrame) -> pd.DataFrame:
        if not len(df):
            return pd.DataFrame(
                {
                    "ent_a": pd.array([], dtype="string"),
                    "ent_b": pd.array([], dtype="string"),
                    "n": pd.array([], dtype="int64"),
                    "lift": pd.array([], dtype="float64"),
                }
            )
        cmap = ray.get(ref)
        ca = df["ent_a"].map(cmap).to_numpy(dtype=np.int64)
        cb = df["ent_b"].map(cmap).to_numpy(dtype=np.int64)
        n = df["n"].to_numpy(dtype=np.int64)
        out = df[["ent_a", "ent_b", "n"]].copy()
        # int64 products are exact below 2^53, then ONE float division —
        # the DuckDB twin computes (N*n)::DOUBLE / (ca*cb)::DOUBLE
        out["lift"] = (n_docs * n).astype(np.float64) / (
            ca * cb
        ).astype(np.float64)
        return out

    return pairs.map_batches(score, batch_format="pandas")


def levenshtein_vec(a, b) -> "np.ndarray":
    """Exact Levenshtein distance for N aligned string pairs at once —
    the verify kernel of sorted-neighborhood blocking.  The DP runs as
    ``max_len²`` sequential steps, each a numpy op over ALL pairs (no
    per-pair Python), with strings packed into fixed-width byte
    matrices via numpy's ``S``-dtype view (no per-char loops either).
    Unicode beyond Latin-1 compares at utf-8 byte granularity, which is
    still a true edit distance over bytes — matching DuckDB's
    ``levenshtein`` on ASCII, the only regime the oracle exercises."""
    import numpy as np

    n = len(a)
    if n == 0:
        return np.zeros(0, dtype="int64")
    ab = np.asarray([s.encode("utf-8") for s in a], dtype=object)
    bb = np.asarray([s.encode("utf-8") for s in b], dtype=object)
    la = np.frompyfunc(len, 1, 1)(ab).astype("int64")
    lb = np.frompyfunc(len, 1, 1)(bb).astype("int64")
    ma, mb = int(la.max()), int(lb.max())
    A = np.asarray(ab, dtype=f"S{max(ma, 1)}").view(np.uint8).reshape(n, -1)
    B = np.asarray(bb, dtype=f"S{max(mb, 1)}").view(np.uint8).reshape(n, -1)
    # D[p, i, j] = edit distance between a[p][:i] and b[p][:j]; padded
    # cells beyond (la, lb) hold garbage the final gather never reads
    D = np.empty((n, ma + 1, mb + 1), dtype="int32")
    D[:, :, 0] = np.arange(ma + 1)[None, :]
    D[:, 0, :] = np.arange(mb + 1)[None, :]
    for i in range(1, ma + 1):
        cost = (A[:, i - 1 : i] != B[:, :mb]).astype("int32")
        for j in range(1, mb + 1):
            D[:, i, j] = np.minimum(
                np.minimum(D[:, i, j - 1] + 1, D[:, i - 1, j] + 1),
                D[:, i - 1, j - 1] + cost[:, j - 1],
            )
    return D[np.arange(n), la, lb].astype("int64")
