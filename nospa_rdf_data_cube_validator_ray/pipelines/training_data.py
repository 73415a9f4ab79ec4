"""Training-data pipeline queries over the driver's documents/embeddings
tables, with DuckDB oracle SQL where the op is SQL-expressible.

Integer-arithmetic thresholds (Jaccard) and double-cast cosine keep the
Ray and SQL sides bit-comparable; ops whose kernels are inherently
non-SQL (MinHash, SimHash, winnowing fingerprints, LSH buckets, language
ID) ship without an oracle → the driver records a rows-only check.
"""

from __future__ import annotations

import pandas as pd

import ray.data

from ..functions import text as T
from ..stages import dedup as D
from ..stages import embedding as E
from ..stages import multimodal as M


def _docs(sf_dir: str) -> "ray.data.Dataset":
    return ray.data.read_parquet(f"{sf_dir}/documents.parquet")


def _embs(sf_dir: str) -> "ray.data.Dataset":
    return ray.data.read_parquet(f"{sf_dir}/embeddings.parquet")


# -- text analysis ----------------------------------------------------------


def q_text_stats(sf_dir: str):
    return _docs(sf_dir).map_batches(T.text_stats, batch_format="pandas")


def q_token_counts(sf_dir: str):
    return _docs(sf_dir).map_batches(T.token_counts, batch_format="pandas")


def q_quality(sf_dir: str):
    out = _docs(sf_dir).map_batches(T.quality_scores, batch_format="pandas")
    return out.select_columns(["doc_id", "n_tokens", "n_alpha", "n_stopwords"])


def q_lang_id(sf_dir: str):
    return _docs(sf_dir).map_batches(T.lang_id, batch_format="pandas")


def q_fingerprint(sf_dir: str):
    return _docs(sf_dir).map_batches(T.fingerprint, batch_format="pandas")


# -- dedup ------------------------------------------------------------------


def q_dedup_exact(sf_dir: str):
    kept = D.exact_dedup(_docs(sf_dir))
    return kept.select_columns(["doc_id", "n_chars"])


def q_jaccard_pairs(sf_dir: str):
    return D.jaccard_block_pairs(
        _docs(sf_dir), block_cols=("lang", "source"), threshold_num=4, threshold_den=10
    )


def q_minhash_pairs(sf_dir: str):
    return D.minhash_lsh_pairs(_docs(sf_dir), threshold=0.7)


def q_minhash_signatures(sf_dir: str):
    sigs = D.minhash_signatures(_docs(sf_dir))

    def summarize(df: pd.DataFrame) -> pd.DataFrame:
        import numpy as np

        mats = [np.frombuffer(s, dtype=np.uint64) for s in df["sig"]]
        return pd.DataFrame(
            {
                "doc_id": df["doc_id"],
                "sig_min": [int(m.min()) for m in mats],
                "sig_sum": [int(m.sum(dtype=np.uint64)) for m in mats],
            }
        )

    return sigs.map_batches(summarize, batch_format="pandas")


def q_simhash(sf_dir: str):
    return D.simhash_table(_docs(sf_dir))


def q_simhash_pairs(sf_dir: str):
    return D.simhash_pairs(_docs(sf_dir), max_hamming=3)


def q_corpus_clean_summary(sf_dir: str):
    """Composed training-data pipeline: quality filter → exact dedup →
    per-language survivor counts (the C4-style cleanup shape)."""
    import re

    tok_re = re.compile(r"\S+")

    def keep_quality(df: pd.DataFrame) -> pd.DataFrame:
        return df[df["text"].fillna("").str.count(tok_re) >= 30].reset_index(
            drop=True
        )

    filtered = _docs(sf_dir).map_batches(keep_quality, batch_format="pandas")
    kept = D.exact_dedup(filtered)
    out = kept.groupby("lang").count().rename_columns({"count()": "n"}).to_pandas()
    out["n"] = out["n"].astype("int64")
    return out


# -- embeddings / similarity search ----------------------------------------


def q_knn(sf_dir: str):
    return E.knn_topk(_embs(sf_dir), query_ids=list(range(10)), k=5)


def q_cosine_pairs(sf_dir: str):
    return E.cosine_threshold_pairs(_embs(sf_dir), threshold=0.35)


def q_lsh_buckets(sf_dir: str):
    return E.lsh_hyperplane_buckets(_embs(sf_dir), dim=64, n_planes=16)


def q_ivf_topk(sf_dir: str):
    return E.ivf_topk(_embs(sf_dir), query_ids=list(range(10)), k=5, nlist=16, nprobe=6)


# -- multimodal (stubbed decode; plumbing real) -----------------------------


def q_multimodal(sf_dir: str):
    payloads = M.attach_payload(_docs(sf_dir))
    feats = M.decode_features(payloads, mode="fake")
    return feats.select_columns(["doc_id", "n_bytes"])


QUERIES = {
    "text_stats": q_text_stats,
    "token_counts": q_token_counts,
    "text_quality": q_quality,
    "lang_id": q_lang_id,
    "doc_fingerprint": q_fingerprint,
    "dedup_exact": q_dedup_exact,
    "corpus_clean_summary": q_corpus_clean_summary,
    "dedup_jaccard_pairs": q_jaccard_pairs,
    "dedup_minhash_pairs": q_minhash_pairs,
    "minhash_signatures": q_minhash_signatures,
    "simhash": q_simhash,
    "dedup_simhash_pairs": q_simhash_pairs,
    "knn_cosine_topk": q_knn,
    "embedding_dup_pairs": q_cosine_pairs,
    "lsh_buckets": q_lsh_buckets,
    "knn_ivf_topk": q_ivf_topk,
    "multimodal_features": q_multimodal,
}

ORACLES = {
    "text_stats": r"""
SELECT doc_id,
       length(text)::BIGINT AS n_chars,
       length(regexp_extract_all(text, '\S+'))::BIGINT AS n_tokens,
       length(regexp_extract_all(text, '[.,!?;:]'))::BIGINT AS n_punct,
       length(regexp_extract_all(text, '[A-Z]'))::BIGINT AS n_upper,
       length(regexp_extract_all(text, '[0-9]'))::BIGINT AS n_digit
FROM documents
""",
    "token_counts": r"""
SELECT doc_id,
       length(regexp_extract_all(text, '\S+'))::BIGINT AS n_ws_tokens,
       length(regexp_extract_all(text, '[A-Za-z]+|[0-9]|[^A-Za-z0-9\s]+'))::BIGINT AS n_bpe_tokens
FROM documents
""",
    "text_quality": r"""
SELECT doc_id,
       length(regexp_extract_all(text, '\S+'))::BIGINT AS n_tokens,
       length(regexp_extract_all(text, '[A-Za-z]'))::BIGINT AS n_alpha,
       length(regexp_extract_all(text, '\b(?:the|and|of|to|a|in|is|for)\b'))::BIGINT AS n_stopwords
FROM documents
""",
    "dedup_exact": """
SELECT min(doc_id)::BIGINT AS doc_id, min(n_chars)::BIGINT AS n_chars
FROM documents GROUP BY text
""",
    "corpus_clean_summary": r"""
WITH kept AS (
  SELECT arg_min(lang, doc_id) AS lang
  FROM documents
  WHERE length(regexp_extract_all(text, '\S+')) >= 30
  GROUP BY text
)
SELECT lang, count(*)::BIGINT AS n FROM kept GROUP BY 1
""",
    "dedup_jaccard_pairs": r"""
WITH w AS (
  SELECT doc_id, lang, source,
         list_distinct(regexp_extract_all(text, '\S+')) AS words
  FROM documents
)
SELECT a.doc_id::BIGINT AS doc_id_a, b.doc_id::BIGINT AS doc_id_b,
       length(list_intersect(a.words, b.words))::BIGINT AS n_inter,
       (length(a.words) + length(b.words)
        - length(list_intersect(a.words, b.words)))::BIGINT AS n_union
FROM w a JOIN w b
  ON a.lang = b.lang AND a.source = b.source AND a.doc_id < b.doc_id
WHERE length(list_intersect(a.words, b.words)) * 10 >=
      (length(a.words) + length(b.words) - length(list_intersect(a.words, b.words))) * 4
""",
    "knn_cosine_topk": """
SELECT q.vec_id::BIGINT AS query_id, n.vec_id::BIGINT AS neighbor_id,
       row_number() OVER (
         PARTITION BY q.vec_id
         ORDER BY list_cosine_similarity(q.embedding::DOUBLE[], n.embedding::DOUBLE[]) DESC,
                  n.vec_id
       )::BIGINT AS rank
FROM embeddings q, embeddings n
WHERE q.vec_id < 10 AND n.vec_id != q.vec_id
QUALIFY rank <= 5
""",
    "embedding_dup_pairs": """
SELECT a.vec_id::BIGINT AS vec_id_a, b.vec_id::BIGINT AS vec_id_b
FROM embeddings a, embeddings b
WHERE a.vec_id < b.vec_id
  AND list_cosine_similarity(a.embedding::DOUBLE[], b.embedding::DOUBLE[]) >= 0.35
""",
    "multimodal_features": """
SELECT doc_id, octet_length(encode(text))::BIGINT AS n_bytes FROM documents
""",
}
