"""Training-data pipeline queries over the driver's documents/embeddings
tables, with DuckDB oracle SQL for EVERY query.

The hash-kernel queries (MinHash signatures/LSH pairs, SimHash +
Hamming pairs, winnowing fingerprints) are exactly SQL-checkable because
every kernel is md5-derived: Python's ``_md5_u64`` equals DuckDB's
``md5_number_lower``, MinHash permutations are (a·h+b) mod (2^61−1) with
the seed-derived constants baked into the SQL as literals
(``dedup.minhash_params``), and SimHash band bucketing is
pigeonhole-complete for Hamming ≤ 3 so its pair set equals the all-pairs
SQL.  Integer arithmetic (mod 2^61−1) keeps both sides int64-safe and
hash-identical; floats appear only in the cosine queries, double-cast on
both sides.
"""

from __future__ import annotations

import numpy as np
import pandas as pd

import ray.data

from ..functions import text as T
from ..stages import dedup as D
from ..stages import embedding as E
from ..stages import multimodal as M


def _docs(sf_dir: str) -> "ray.data.Dataset":
    # a single parquet file reads as ONE block, starving every downstream
    # map_batches of parallelism; split the read up front (row order is
    # irrelevant to these pipelines — every query keys on doc_id)
    import ray

    nb = max(8, int(ray.cluster_resources().get("CPU", 8)))
    return ray.data.read_parquet(
        f"{sf_dir}/documents.parquet", override_num_blocks=nb
    )


def _embs(sf_dir: str) -> "ray.data.Dataset":
    import ray

    nb = max(8, int(ray.cluster_resources().get("CPU", 8)))
    # order-preserving split: blocks keep file order, so ds.limit() (the
    # IVF train sample) still sees the same leading rows
    return ray.data.read_parquet(
        f"{sf_dir}/embeddings.parquet", override_num_blocks=nb
    )


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


def q_text_repetition(sf_dir: str):
    return _docs(sf_dir).map_batches(T.repetition_stats, batch_format="pandas")


def q_fingerprint(sf_dir: str):
    return _docs(sf_dir).map_batches(T.fingerprint, batch_format="pandas")


# -- dedup ------------------------------------------------------------------


def q_dedup_clusters(sf_dir: str):
    return D.jaccard_clusters(_docs(sf_dir))


def q_dedup_exact(sf_dir: str):
    kept = D.exact_dedup(_docs(sf_dir))
    return kept.select_columns(["doc_id", "n_chars"])


def q_jaccard_pairs(sf_dir: str):
    return D.jaccard_block_pairs(
        _docs(sf_dir), block_cols=("lang", "source"), threshold_num=4, threshold_den=10
    )


def q_minhash_pairs(sf_dir: str):
    return D.minhash_lsh_pairs(_docs(sf_dir), threshold=0.7)


def q_dedup_incremental(sf_dir: str):
    """Shard-vs-corpus near-dup filter (dedup.minhash_lsh_pairs_against):
    documents with doc_id % 10 = 7 play the ARRIVING shard, the rest the
    EXISTING corpus; only cross-side LSH candidates are enumerated and
    each side's signatures verify through its own join — the
    incremental-ingest shape of a continuously-fed training pipeline."""

    def side(pred):
        return _docs(sf_dir).map_batches(
            lambda df, p=pred: df[p(df["doc_id"])].reset_index(drop=True),
            batch_format="pandas",
        )

    return D.minhash_lsh_pairs_against(
        side(lambda d: d % 10 == 7),
        side(lambda d: d % 10 != 7),
        threshold=0.7,
    )


def q_minhash_signatures(sf_dir: str):
    sigs = D.minhash_signatures(_docs(sf_dir))

    def summarize(df: pd.DataFrame) -> pd.DataFrame:
        import numpy as np

        mats = [np.frombuffer(s, dtype=np.uint64) for s in df["sig"]]
        return pd.DataFrame(
            {
                "doc_id": df["doc_id"].astype("int64"),
                "sig_min": np.array([int(m.min()) for m in mats], dtype=np.int64),
                "sig_sum": np.array(
                    [sum(int(v) for v in m) % ((1 << 61) - 1) for m in mats],
                    dtype=np.int64,
                ),
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
    # rename driver-side: Ray's Project op chokes on the schema-less empty
    # pandas blocks a sparse groupby can emit (see graft-env-quirks)
    out = kept.groupby("lang").count().to_pandas()
    out = out.rename(columns={"count()": "n"})
    out["n"] = out["n"].astype("int64")
    return out


# -- embeddings / similarity search ----------------------------------------


def q_knn(sf_dir: str):
    return E.knn_topk(_embs(sf_dir), query_ids=list(range(10)), k=5)


def q_cosine_pairs(sf_dir: str):
    return E.cosine_threshold_pairs(_embs(sf_dir), threshold=0.35)


def q_lsh_buckets(sf_dir: str):
    return E.lsh_hyperplane_buckets(_embs(sf_dir), dim=64, n_planes=16)


def q_ivf_recall(sf_dir: str):
    """IVF ANN graded by a recall bound (an approximate index has no
    exact-output oracle by construction): per query, is |IVF@nprobe14
    top-5 ∩ exact top-5| ≥ 3?  The oracle predicts all-true; any recall
    regression flips a row and fails the hash."""
    embs = _embs(sf_dir)
    exact = E.knn_topk(embs, query_ids=list(range(10)), k=5)
    ivf = E.ivf_topk(embs, query_ids=list(range(10)), k=5, nlist=16, nprobe=14)
    ex = exact.groupby("query_id")["neighbor_id"].apply(set)
    iv = ivf.groupby("query_id")["neighbor_id"].apply(set)
    qids = sorted(ex.index)
    return pd.DataFrame(
        {
            "query_id": pd.array(qids, dtype="int64"),
            "recall_ok": [len(ex[q] & iv.get(q, set())) >= 3 for q in qids],
        }
    )



def _token_partial_counts(df: pd.DataFrame) -> pd.DataFrame:
    """Map-side combiner: one (token, n) row per distinct token per batch —
    shared by vocab_topk and doc_familiarity so their tokenization (and
    their SQL oracles) can never desynchronize."""
    from collections import Counter

    from ..stages.dedup import tokens

    c = Counter()
    for t in df["text"].fillna(""):
        c.update(tokens(t))
    return pd.DataFrame(
        {"token": list(c.keys()), "n": pd.array(list(c.values()), dtype="int64")}
    )


def q_vocab_topk(sf_dir: str, k: int = 50):
    """Corpus-wide token frequency top-k with MAP-SIDE COMBINING: each
    batch emits its local Counter (one row per distinct token per block —
    the partial-aggregate pattern that keeps the shuffle vocabulary-sized,
    not token-occurrence-sized), a small groupby sums partials, then
    per-block top-k candidates merge on the driver (exact: counts are
    final after the groupby, so the global top-k ⊆ union of block
    top-ks)."""

    from ..util import bucket_sum

    agg = bucket_sum(
        _docs(sf_dir).map_batches(
            _token_partial_counts, batch_format="pandas"
        ),
        ["token"],
        ["n"],
    )

    def block_topk(df: pd.DataFrame) -> pd.DataFrame:
        return df.sort_values(["n", "token"], ascending=[False, True]).head(k)

    cands = agg.map_batches(block_topk, batch_format="pandas").to_pandas()
    out = (
        cands.sort_values(["n", "token"], ascending=[False, True])
        .head(k)
        .reset_index(drop=True)
    )
    out["n"] = out["n"].astype("int64")
    return out


def q_text_bigrams(sf_dir: str, k: int = 30):
    """Corpus-wide BIGRAM frequency top-k — the vocab_topk shape one
    n-gram order up: map-side Counter over adjacent token pairs,
    bucketed sum (vocabulary²-scale keys: util.bucket_sum), per-block
    top-k candidates, exact driver merge (global top-k ⊆ union of
    block top-ks since counts are final after the sum)."""
    from collections import Counter

    from ..stages.dedup import tokens
    from ..util import bucket_sum

    def partial(df: pd.DataFrame) -> pd.DataFrame:
        c = Counter()
        for t in df["text"].fillna(""):
            toks = tokens(t)
            c.update(a + " " + b for a, b in zip(toks, toks[1:]))
        return pd.DataFrame(
            {
                "bigram": list(c.keys()),
                "n": pd.array(list(c.values()), dtype="int64"),
            }
        )

    agg = bucket_sum(
        _docs(sf_dir).map_batches(partial, batch_format="pandas"),
        ["bigram"],
        ["n"],
    )

    def block_topk(df: pd.DataFrame) -> pd.DataFrame:
        return df.sort_values(["n", "bigram"], ascending=[False, True]).head(k)

    cands = agg.map_batches(block_topk, batch_format="pandas").to_pandas()
    out = (
        cands.sort_values(["n", "bigram"], ascending=[False, True])
        .head(k)
        .reset_index(drop=True)
    )
    out["n"] = out["n"].astype("int64")
    return out


def q_hash_sample(sf_dir: str):
    """Deterministic 10% hash sample (md5 of doc_id) — reproducible across
    cluster sizes and retries, unlike random_shuffle-based sampling; the
    sampling predicate is the same md5_number_lower the SQL oracle runs."""
    from ..stages.dedup import _md5_u64

    def f(df: pd.DataFrame) -> pd.DataFrame:
        ids = df["doc_id"].astype("int64")
        keep = [(_md5_u64(str(i)) % 100) < 10 for i in ids]
        return df.loc[keep, ["doc_id", "lang", "n_chars"]]

    return _docs(sf_dir).map_batches(f, batch_format="pandas")


def q_contamination(sf_dir: str):
    """Benchmark decontamination scan (see
    stages.dedup.benchmark_contamination): md5-split eval set, broadcast
    shingle set, map-only overlap scoring."""
    return D.benchmark_contamination(_docs(sf_dir))


def q_source_mix_sample(sf_dir: str):
    """Domain mixing: per-source acceptance rates applied as a
    deterministic hash sample — source s keeps ``(1 + md5(s) % 9)/10``
    of its docs, decided per doc by a salted md5 of doc_id, so the mix
    is exactly reproducible across cluster sizes and retries and never
    shuffles (vs. weighted random_shuffle sampling).  The per-source
    rate here is hash-derived for the oracle; a real pipeline passes a
    curated weights table the same way."""
    from ..stages.dedup import _md5_u64

    def f(df: pd.DataFrame) -> pd.DataFrame:
        ids = df["doc_id"].astype("int64")
        # one md5 per DISTINCT source, not per row (sources are few)
        rates = {s: 1 + _md5_u64(s) % 9 for s in df["source"].unique()}
        rate = df["source"].map(rates)
        keep = [
            (_md5_u64(f"{i}:mix") % 10) < r for i, r in zip(ids, rate)
        ]
        out = df.loc[keep, ["doc_id", "source"]].copy()
        out["rate_num"] = rate[keep].astype("int64")
        return out

    return _docs(sf_dir).map_batches(f, batch_format="pandas")


def q_pack_sequences(sf_dir: str):
    """Sequence packing (GPT-style token-stream packs) via the
    distributed ordered prefix-sum in stages/packing.py."""
    from ..stages.packing import pack_sequences

    return pack_sequences(_docs(sf_dir), window=512)


def q_embedding_clusters(sf_dir: str):
    """Embedding-level near-dup clusters: the exact cosine pair graph fed
    into the shared size-adaptive connected-components engine
    (stages.dedup.cluster_from_pairs)."""
    embs = _embs(sf_dir)
    pairs = E.cosine_threshold_pairs(embs, threshold=0.35)
    return D.cluster_from_pairs(
        embs, pairs, id_col="vec_id", a_col="vec_id_a", b_col="vec_id_b"
    )


def q_doc_familiarity(sf_dir: str):
    """Corpus-familiarity score (unigram-LM shape with integer arithmetic
    so the oracle is exact): global token counts are aggregated once
    (map-side Counter → vocabulary-sized groupby), broadcast via ray.put,
    and each document scores as the sum of its tokens' corpus frequencies
    — the aggregate-then-broadcast two-phase pattern a perplexity filter
    uses.  At corpora where the vocabulary outgrows a broadcast, swap the
    broadcast for a token-keyed join (same shape as
    canonicalize_with_alias_table)."""
    import ray

    docs = _docs(sf_dir)
    from ..util import bucket_sum

    vocab_df = bucket_sum(
        docs.map_batches(_token_partial_counts, batch_format="pandas"),
        ["token"],
        ["n"],
    ).to_pandas()
    vocab = dict(zip(vocab_df["token"], vocab_df["n"].astype("int64")))
    vref = ray.put(vocab)

    def score(df: pd.DataFrame) -> pd.DataFrame:
        v = ray.get(vref)
        fams, ntoks = [], []
        from ..stages.dedup import tokens as _tok

        for t in df["text"].fillna(""):
            toks = _tok(t)
            fams.append(sum(v.get(w, 0) for w in toks))
            ntoks.append(len(toks))
        return pd.DataFrame(
            {
                "doc_id": df["doc_id"].astype("int64"),
                "familiarity": pd.array(fams, dtype="int64"),
                "n_tokens": pd.array(ntoks, dtype="int64"),
            }
        )

    return docs.map_batches(score, batch_format="pandas")


_SQL_DOC_FAMILIARITY = r"""
WITH tk AS (
  SELECT doc_id, unnest(regexp_extract_all(coalesce(text, ''), '\S+')) AS t
  FROM documents
),
vc AS (SELECT t, count(*)::BIGINT AS c FROM tk GROUP BY t)
SELECT d.doc_id,
       coalesce(sum(vc.c), 0)::BIGINT AS familiarity,
       count(tk.t)::BIGINT AS n_tokens
FROM documents d
LEFT JOIN tk ON tk.doc_id = d.doc_id
LEFT JOIN vc ON vc.t = tk.t
GROUP BY d.doc_id
"""


_SQL_VOCAB_TOPK = r"""
SELECT token, count(*)::BIGINT AS n FROM (
  SELECT unnest(regexp_extract_all(coalesce(text, ''), '\S+')) AS token
  FROM documents
) GROUP BY token
ORDER BY n DESC, token
LIMIT 50
"""

_SQL_TEXT_BIGRAMS = r"""
WITH t AS (
  SELECT regexp_extract_all(coalesce(text, ''), '\S+') AS toks FROM documents
),
b AS (
  SELECT toks[i] || ' ' || toks[i + 1] AS bigram
  FROM t, unnest(generate_series(1, len(toks) - 1)) AS u(i)
)
SELECT bigram, count(*)::BIGINT AS n FROM b GROUP BY bigram
ORDER BY n DESC, bigram
LIMIT 30
"""

_SQL_HASH_SAMPLE = """
SELECT doc_id, lang, n_chars FROM documents
WHERE md5_number_lower(doc_id::VARCHAR) % 100 < 10
"""

# same shingling as the MinHash CTE (k=3); benchmark split = md5 % 20
_SQL_CONTAMINATION = r"""
WITH toks AS (
  SELECT doc_id, regexp_extract_all(coalesce(text, ''), '\S+') AS w
  FROM documents
),
sh AS (
  SELECT doc_id, unnest(list_distinct(
    CASE WHEN length(w) = 0 THEN []::VARCHAR[]
         WHEN length(w) < 3 THEN [array_to_string(w, ' ')]
         ELSE list_transform(generate_series(1, length(w) - 2),
                             i -> array_to_string(w[i:i + 2], ' '))
    END)) AS s
  FROM toks
),
bench AS (
  SELECT DISTINCT s FROM sh
  WHERE md5_number_lower(doc_id::VARCHAR) % 20 = 0
),
scores AS (
  SELECT d.doc_id,
         count(sh.s)::BIGINT AS n_grams,
         count(b.s)::BIGINT AS n_overlap
  FROM documents d
  LEFT JOIN sh ON sh.doc_id = d.doc_id
  LEFT JOIN bench b ON b.s = sh.s
  WHERE md5_number_lower(d.doc_id::VARCHAR) % 20 != 0
  GROUP BY d.doc_id
)
SELECT doc_id, n_grams, n_overlap,
       (n_overlap >= 1)::BIGINT AS contaminated
FROM scores
"""

_SQL_SOURCE_MIX = """
SELECT doc_id, source,
       (1 + md5_number_lower(source) % 9)::BIGINT AS rate_num
FROM documents
WHERE md5_number_lower(doc_id::VARCHAR || ':mix') % 10 <
      1 + md5_number_lower(source) % 9
"""

# shared SQL kernels: ONE copy of the Jaccard pair predicate and ONE copy
# of the recursive connected-components tail (the builder precedent of
# _minhash_cte) so pair/cluster oracles cannot desynchronize
_JACCARD_W_CTE = r"""w AS (
  SELECT doc_id, lang, source,
         list_distinct(regexp_extract_all(text, '\S+')) AS words
  FROM documents
)"""

_JACCARD_PAIRS_SELECT = """
  SELECT a.doc_id AS a, b.doc_id AS b,
         length(list_intersect(a.words, b.words)) AS n_inter,
         (length(a.words) + length(b.words)
          - length(list_intersect(a.words, b.words))) AS n_union
  FROM w a JOIN w b
    ON a.lang = b.lang AND a.source = b.source AND a.doc_id < b.doc_id
  WHERE (length(a.words) + length(b.words)
         - length(list_intersect(a.words, b.words))) > 0
    AND length(list_intersect(a.words, b.words)) * 10 >=
        (length(a.words) + length(b.words)
         - length(list_intersect(a.words, b.words))) * 4
"""

_EMB_PAIRS_CTE = """p AS (
  SELECT a.vec_id AS a, b.vec_id AS b
  FROM embeddings a, embeddings b
  WHERE a.vec_id < b.vec_id
    AND list_cosine_similarity(a.embedding::DOUBLE[], b.embedding::DOUBLE[])
        >= 0.35
)"""


def _cc_sql(*, pairs_ctes: str, base_table: str, id_col: str) -> str:
    """Recursive connected-components SQL over a pair CTE ``p(a, b, …)``
    — the oracle twin of ``stages.dedup.cluster_from_pairs`` (min label
    over the symmetric closure; rows of ``base_table`` in no pair are
    singleton clusters)."""
    return f"""
WITH RECURSIVE {pairs_ctes},
e AS (
  SELECT a, b FROM p UNION ALL SELECT b, a FROM p
), comp(node, lbl) AS (
  SELECT a, a FROM e
  UNION
  SELECT e.b, c.lbl FROM comp c JOIN e ON e.a = c.node
), lab AS (
  SELECT node, min(lbl) AS cluster_id FROM comp GROUP BY node
)
SELECT t.{id_col}::BIGINT AS {id_col},
       coalesce(lab.cluster_id, t.{id_col})::BIGINT AS cluster_id
FROM {base_table} t LEFT JOIN lab ON lab.node = t.{id_col}
"""


_SQL_PACK_SEQUENCES = r"""
WITH t AS (
  SELECT doc_id,
         length(regexp_extract_all(coalesce(text, ''), '\S+'))::BIGINT AS n_tokens
  FROM documents
),
c AS (
  SELECT doc_id, n_tokens,
         (sum(n_tokens) OVER (ORDER BY doc_id
            ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW)
          - n_tokens)::BIGINT AS start_tok
  FROM t
)
SELECT doc_id, n_tokens, start_tok, (start_tok // 512)::BIGINT AS pack_id
FROM c
"""

_SQL_EMBEDDING_CLUSTERS = _cc_sql(
    pairs_ctes=_EMB_PAIRS_CTE, base_table="embeddings", id_col="vec_id"
)


# -- multimodal (stubbed decode; plumbing real) -----------------------------


def q_multimodal(sf_dir: str):
    payloads = M.attach_payload(_docs(sf_dir))
    feats = M.decode_features(payloads, mode="fake")
    return feats.select_columns(["doc_id", "n_bytes"])


# -- PII scrub (derived corpus: deterministic PII injected from doc_id) -----


def _inject_pii(df: pd.DataFrame) -> pd.DataFrame:
    """The documents fixture carries no PII-shaped text, so the query
    derives a PII-bearing corpus as a pure function of (doc_id, text) —
    the same derived-corpus trick the kg_* entity queries use — and the
    oracle rebuilds it with string concatenation in SQL."""
    ids = df["doc_id"].astype("int64")
    base = df["text"].fillna("")
    pre = pd.Series(
        ["alt" + str(i) + "@alt.org " if i % 5 == 0 else "" for i in ids],
        index=df.index,
    )
    suf = pd.Series(
        [
            " contact user%d@ex%d.com or +1-555-%04d ip 10.%d.0.%d"
            % (i, i % 7, (i * 37) % 10000, i % 256, (i * 3) % 256)
            if i % 3 != 0
            else ""
            for i in ids
        ],
        index=df.index,
    )
    return pd.DataFrame({"doc_id": ids, "text": pre + base + suf})


def q_pii_scrub(sf_dir: str):
    return _docs(sf_dir).map_batches(
        lambda df: T.pii_scrub(_inject_pii(df)), batch_format="pandas"
    )


# both sides share the regexes verbatim (RE2 / re.ASCII parity — see
# functions.text.PII_PATTERNS); counts are taken on the text as left by
# the previous replacement, exactly like the Python kernel
_SQL_PII = r"""
WITH inj AS (
  SELECT doc_id,
    (CASE WHEN doc_id % 5 = 0 THEN 'alt' || doc_id || '@alt.org ' ELSE '' END)
    || coalesce(text, '')
    || (CASE WHEN doc_id % 3 != 0 THEN
          ' contact user' || doc_id || '@ex' || (doc_id % 7)
          || '.com or +1-555-' || lpad(((doc_id * 37) % 10000)::VARCHAR, 4, '0')
          || ' ip 10.' || (doc_id % 256) || '.0.' || ((doc_id * 3) % 256)
        ELSE '' END) AS t0
  FROM documents
),
s1 AS (
  SELECT doc_id, t0,
         regexp_replace(t0, '[A-Za-z0-9._%+-]+@[A-Za-z0-9.-]+\.[A-Za-z]{2,}',
                        '<EMAIL>', 'g') AS t1
  FROM inj
),
s2 AS (
  SELECT *, regexp_replace(t1, '\+[0-9]{1,3}-[0-9]{3}-[0-9]{4}',
                           '<PHONE>', 'g') AS t2
  FROM s1
),
s3 AS (
  SELECT *, regexp_replace(
      t2, '\b[0-9]{1,3}\.[0-9]{1,3}\.[0-9]{1,3}\.[0-9]{1,3}\b',
      '<IP>', 'g') AS t3
  FROM s2
)
SELECT doc_id,
  length(regexp_extract_all(t0, '[A-Za-z0-9._%+-]+@[A-Za-z0-9.-]+\.[A-Za-z]{2,}'))::BIGINT AS n_email,
  length(regexp_extract_all(t1, '\+[0-9]{1,3}-[0-9]{3}-[0-9]{4}'))::BIGINT AS n_phone,
  length(regexp_extract_all(t2, '\b[0-9]{1,3}\.[0-9]{1,3}\.[0-9]{1,3}\.[0-9]{1,3}\b'))::BIGINT AS n_ipv4,
  length(t3)::BIGINT AS clean_len,
  (md5_number_lower(t3) % 2305843009213693952)::BIGINT AS clean_h61
FROM s3
"""


# -- TF-IDF top-k terms per document ----------------------------------------


def q_doc_tfidf_topk(sf_dir: str, k: int = 5):
    """Per-document top-k terms by tf·idf with idf = N_docs/df — the
    ratio form keeps the score a single IEEE-exact float64 DIVISION of
    two integers (N_docs cancels inside a per-doc ranking), so the DuckDB
    oracle hashes bit-identically; a log-idf would hostage the oracle to
    transcendental-function ulps.

    Two-phase aggregate-then-broadcast (the doc_familiarity shape):
    document frequencies aggregate map-side (each document lives in
    exactly one batch, so a per-batch count of docs containing a token is
    a valid partial), the vocabulary-sized df table broadcasts via
    ray.put, and each batch ranks its own documents locally — the top-k
    needs no shuffle because a document never spans batches.  At corpora
    where the vocabulary outgrows a broadcast, swap for a token-keyed
    join."""
    import ray

    from collections import Counter

    from ..stages.dedup import tokens as _tok

    docs = _docs(sf_dir)

    def df_partial(df: pd.DataFrame) -> pd.DataFrame:
        c = Counter()
        for t in df["text"].fillna(""):
            c.update(set(_tok(t)))
        return pd.DataFrame(
            {"token": list(c.keys()),
             "nd": pd.array(list(c.values()), dtype="int64")}
        )

    from ..util import bucket_sum

    df_tab = bucket_sum(
        docs.map_batches(df_partial, batch_format="pandas"),
        ["token"],
        ["nd"],
    ).to_pandas()
    dfm = dict(zip(df_tab["token"], df_tab["nd"].astype("int64")))
    ref = ray.put(dfm)

    def topk(df: pd.DataFrame) -> pd.DataFrame:
        m = ray.get(ref)
        ids, toks, tfs, dfs, scores, ranks = [], [], [], [], [], []
        for doc_id, t in zip(df["doc_id"].astype("int64"), df["text"].fillna("")):
            c = Counter(_tok(t))
            scored = sorted(
                ((tf / m[tok], tok, tf) for tok, tf in c.items()),
                key=lambda x: (-x[0], x[1]),
            )[:k]
            for r, (sc, tok, tf) in enumerate(scored, 1):
                ids.append(doc_id)
                toks.append(tok)
                tfs.append(tf)
                dfs.append(m[tok])
                scores.append(sc)
                ranks.append(r)
        return pd.DataFrame(
            {
                "doc_id": pd.array(ids, dtype="int64"),
                "token": pd.array(toks, dtype="string"),
                "tf": pd.array(tfs, dtype="int64"),
                "df": pd.array(dfs, dtype="int64"),
                "score": pd.array(scores, dtype="float64"),
                "rank": pd.array(ranks, dtype="int64"),
            }
        )

    return docs.map_batches(topk, batch_format="pandas")


_SQL_TFIDF_TOPK = r"""
WITH tk AS (
  SELECT doc_id, unnest(regexp_extract_all(coalesce(text, ''), '\S+')) AS t
  FROM documents
),
tf AS (SELECT doc_id, t, count(*)::BIGINT AS tf FROM tk GROUP BY 1, 2),
dfq AS (SELECT t, count(DISTINCT doc_id)::BIGINT AS df FROM tk GROUP BY 1)
SELECT doc_id, t AS token, tf, df,
       tf::DOUBLE / df::DOUBLE AS score,
       row_number() OVER (
         PARTITION BY doc_id ORDER BY tf::DOUBLE / df::DOUBLE DESC, t
       )::BIGINT AS rank
FROM tf JOIN dfq USING (t)
QUALIFY rank <= 5
"""


# -- exact per-group quantiles via a value histogram ------------------------


def _source_len_histogram(sf_dir: str, *, columns=("source", "n_chars")):
    """The shared (source, n_chars) counting histogram: map-side
    partials → bucketed sum → aggregate-sized pandas frame (|sources| ×
    |distinct lengths| — never corpus-sized).  One implementation for
    every quantile consumer so the index rule and grouping cannot
    desynchronize between queries."""
    import ray

    from ..util import bucket_sum

    nb = max(8, int(ray.cluster_resources().get("CPU", 8)))
    ds = ray.data.read_parquet(
        f"{sf_dir}/documents.parquet",
        columns=list(columns),
        override_num_blocks=nb,
    )

    def partial(df: pd.DataFrame) -> pd.DataFrame:
        g = df.groupby(["source", "n_chars"], as_index=False).size()
        return g.rename(columns={"size": "n"})

    hist = bucket_sum(
        ds.map_batches(
            lambda df: partial(df[["source", "n_chars"]]),
            batch_format="pandas",
        ),
        ["source", "n_chars"],
        ["n"],
    ).to_pandas()
    return ds, hist


def _pct_threshold(g: pd.DataFrame, pct: int) -> tuple[int, int]:
    """(n_docs, value at the integer lower-index quantile
    idx = (n−1)·pct // 100) for ONE source's sorted histogram slice —
    no float interpolation, so SQL reproduces it exactly."""
    import numpy as np

    g = g.sort_values("n_chars")
    cum = g["n"].to_numpy().cumsum()
    n = int(cum[-1])
    idx = (n - 1) * pct // 100
    return n, int(g["n_chars"].to_numpy()[np.searchsorted(cum, idx + 1)])


def q_doc_len_quantiles(sf_dir: str):
    """Exact per-source document-length quantiles WITHOUT a distributed
    sort: lengths are small integers, so the shared counting histogram
    (_source_len_histogram) captures the full distribution and the
    quantiles read off cumulative counts on the driver — the 100-TB
    shape for any bounded-cardinality metric."""
    _, hist = _source_len_histogram(sf_dir)
    rows = []
    for src, g in hist.groupby("source"):
        row = {"source": src}
        for pct in (25, 50, 75, 95):
            n, v = _pct_threshold(g, pct)
            row["n_docs"] = n
            row[f"p{pct}"] = v
        rows.append(row)
    out = pd.DataFrame(rows).sort_values("source").reset_index(drop=True)
    out = out[["source", "n_docs", "p25", "p50", "p75", "p95"]]
    for c in ("n_docs", "p25", "p50", "p75", "p95"):
        out[c] = out[c].astype("int64")
    return out


_SQL_LEN_QUANTILES = r"""
WITH s AS (
  SELECT source, list_sort(list(n_chars)) AS v, count(*)::BIGINT AS n_docs
  FROM documents GROUP BY source
)
SELECT source, n_docs,
  v[(n_docs - 1) * 25 // 100 + 1]::BIGINT AS p25,
  v[(n_docs - 1) * 50 // 100 + 1]::BIGINT AS p50,
  v[(n_docs - 1) * 75 // 100 + 1]::BIGINT AS p75,
  v[(n_docs - 1) * 95 // 100 + 1]::BIGINT AS p95
FROM s
"""


# -- global rank / distinct counts ------------------------------------------


def q_docs_global_rank(sf_dir: str):
    """Corpus-wide dense ranking by (n_chars DESC, doc_id) — the
    distributed sort + ordered-prefix-sum rank primitive
    (stages.packing.global_rank); doc_id makes the order total."""
    import ray

    from ..stages.packing import global_rank

    nb = max(8, int(ray.cluster_resources().get("CPU", 8)))
    ds = ray.data.read_parquet(
        f"{sf_dir}/documents.parquet",
        columns=["doc_id", "n_chars"],
        override_num_blocks=nb,
    )
    return global_rank(
        ds, keys=["n_chars", "doc_id"], descending=[True, False]
    )


_SQL_GLOBAL_RANK = r"""
SELECT doc_id, n_chars,
       row_number() OVER (ORDER BY n_chars DESC, doc_id)::BIGINT AS rank
FROM documents
"""


def q_distinct_tokens_per_source(sf_dir: str):
    """Exact per-source distinct-token counts: per-batch distinct
    (source, token) pairs (map-side dedup shrinks the exchange to the
    per-block vocabulary), one groupby co-locates each pair, and a
    vocabulary-sized second pass counts per source — the exact
    COUNT(DISTINCT) pattern without ever shuffling token occurrences."""
    from ..stages.dedup import tokens as _tok

    docs = _docs(sf_dir)

    def pairs(df: pd.DataFrame) -> pd.DataFrame:
        seen = set()
        for src, t in zip(df["source"], df["text"].fillna("")):
            for w in set(_tok(t)):
                seen.add((src, w))
        if not seen:
            return pd.DataFrame(
                {"source": pd.array([], dtype="string"),
                 "token": pd.array([], dtype="string")}
            )
        s, w = zip(*seen)
        return pd.DataFrame(
            {"source": pd.array(s, dtype="string"),
             "token": pd.array(w, dtype="string")}
        )

    from ..functions.kernel import distinct as _distinct

    # (source, token) is vocabulary-scale — bucketed exact distinct, not
    # Ray's per-key Aggregate
    distinct = _distinct(
        docs.map_batches(pairs, batch_format="pandas"), ["source", "token"]
    )

    def partial(df: pd.DataFrame) -> pd.DataFrame:
        g = df.groupby("source", as_index=False).size()
        return g.rename(columns={"size": "nd"})

    from ..util import bucket_sum

    out = bucket_sum(
        distinct.map_batches(partial, batch_format="pandas"),
        ["source"],
        ["nd"],
    )

    def final(df: pd.DataFrame) -> pd.DataFrame:
        return pd.DataFrame(
            {"source": df["source"],
             "n_distinct_tokens": df["nd"].astype("int64")}
        )

    return out.map_batches(final, batch_format="pandas")


_SQL_DISTINCT_TOKENS = r"""
SELECT source, count(DISTINCT t)::BIGINT AS n_distinct_tokens
FROM (
  SELECT source, unnest(regexp_extract_all(coalesce(text, ''), '\S+')) AS t
  FROM documents
)
GROUP BY source
"""


def q_token_countmin(sf_dir: str, depth: int = 4, width: int = 1024):
    """Count-Min sketch of the corpus token stream — the mergeable
    frequency-estimate / heavy-hitter structure (Cormode & Muthukrishnan
    2005) next to the KMV cardinality sketch.  Each block folds its own
    token counts into a depth×width partial counter matrix MAP-side, so
    the exchange is ≤ depth×width cells per block regardless of corpus
    size; partials merge by cell-wise sum (bucketed — the key space is
    only depth×width).  Row hash d is md5_u64(f"{d}|{token}") % width —
    the established DuckDB bridge — so the cell matrix is bit-exact
    against SQL, and estimates (min over rows at query time) upper-bound
    true counts, asserted as a property in tests."""
    import numpy as np

    from ..stages.dedup import _md5_u64_cached
    from ..stages.dedup import tokens as _tok

    docs = _docs(sf_dir)

    def partial(df: pd.DataFrame) -> pd.DataFrame:
        toks = [w for t in df["text"].fillna("") for w in _tok(t)]
        if not toks:
            return pd.DataFrame(
                {
                    "d": pd.Series(dtype="int64"),
                    "col": pd.Series(dtype="int64"),
                    "n": pd.Series(dtype="int64"),
                }
            )
        vc = pd.Series(toks, dtype="object").value_counts()
        cnt = np.zeros((depth, width), dtype=np.int64)
        for w, c in vc.items():
            for d in range(depth):
                cnt[d, _md5_u64_cached(f"{d}|{w}") % width] += int(c)
        d_idx, col_idx = np.nonzero(cnt)
        return pd.DataFrame(
            {
                "d": d_idx.astype("int64"),
                "col": col_idx.astype("int64"),
                "n": cnt[d_idx, col_idx],
            }
        )

    from ..util import bucket_sum

    return bucket_sum(
        docs.map_batches(partial, batch_format="pandas"), ["d", "col"], ["n"]
    )


_SQL_TOKEN_COUNTMIN = r"""
WITH tk AS (
  SELECT unnest(regexp_extract_all(coalesce(text, ''), '\S+')) AS t
  FROM documents
),
dd AS (SELECT unnest(generate_series(0, 3)) AS d)
SELECT dd.d::BIGINT AS d,
       (md5_number_lower(dd.d::varchar || '|' || t) % 1024)::BIGINT AS col,
       count(*)::BIGINT AS n
FROM tk CROSS JOIN dd
GROUP BY 1, 2
"""


# -- boilerplate (line-level) removal ---------------------------------------


def q_boilerplate_removal(sf_dir: str, min_df: int = 10):
    """RefinedWeb/CCNet-style boilerplate stripping: drop every LINE
    that occurs in ≥ ``min_df`` distinct documents, keeping the
    remaining lines in order.  The fixture corpus is single-line, so the
    query derives a multi-line corpus by framing each document with
    shared header/footer lines (a pure function of doc_id — the
    derived-corpus oracle trick).

    Distribution: line document-frequencies aggregate map-side (distinct
    lines per doc per batch → groupby sum), and only lines ABOVE the
    threshold broadcast — the frequent-line set is bounded by
    total_lines/min_df and in practice by the boilerplate vocabulary, so
    the broadcast stays small at any corpus size (same size argument as
    the contamination scan's eval-set broadcast)."""
    import ray

    from collections import Counter

    from ..stages.dedup import _md5_u64

    docs = _docs(sf_dir)

    def inject(df: pd.DataFrame) -> pd.DataFrame:
        ids = df["doc_id"].astype("int64")
        t = (
            "BOILER head v" + (ids % 2).astype(str)
            + "\n" + df["text"].fillna("")
            + "\nBOILER foot " + (ids % 4).astype(str)
        )
        return pd.DataFrame({"doc_id": ids, "t": t})

    inj = docs.map_batches(inject, batch_format="pandas")

    def line_partial(df: pd.DataFrame) -> pd.DataFrame:
        c = Counter()
        for t in df["t"]:
            c.update(set(t.split("\n")))
        return pd.DataFrame(
            {"ln": list(c.keys()),
             "nd": pd.array(list(c.values()), dtype="int64")}
        )

    from ..util import bucket_sum

    freq_df = (
        bucket_sum(
            inj.map_batches(line_partial, batch_format="pandas"),
            ["ln"],
            ["nd"],
        )
        .map_batches(
            lambda df: df[df["nd"] >= min_df][["ln"]],
            batch_format="pandas",
        )
        .to_pandas()
    )
    ref = ray.put(set(freq_df["ln"]))

    def scrub(df: pd.DataFrame) -> pd.DataFrame:
        f = ray.get(ref)
        ids, n_lines, n_kept, h61 = [], [], [], []
        for doc_id, t in zip(df["doc_id"], df["t"]):
            lines = t.split("\n")
            kept = [x for x in lines if x not in f]
            ids.append(doc_id)
            n_lines.append(len(lines))
            n_kept.append(len(kept))
            h61.append(_md5_u64("\n".join(kept)) % (1 << 61))
        return pd.DataFrame(
            {
                "doc_id": pd.array(ids, dtype="int64"),
                "n_lines": pd.array(n_lines, dtype="int64"),
                "n_kept": pd.array(n_kept, dtype="int64"),
                "clean_h61": pd.array(h61, dtype="int64"),
            }
        )

    return inj.map_batches(scrub, batch_format="pandas")


_SQL_BOILERPLATE = r"""
WITH inj AS (
  SELECT doc_id,
         'BOILER head v' || (doc_id % 2) || chr(10) || coalesce(text, '')
         || chr(10) || 'BOILER foot ' || (doc_id % 4) AS t
  FROM documents
),
lsts AS (SELECT doc_id, string_split(t, chr(10)) AS lst FROM inj),
lines AS (SELECT doc_id, unnest(lst) AS ln FROM lsts),
ldf AS (SELECT ln, count(DISTINCT doc_id) AS nd FROM lines GROUP BY ln),
fl AS (SELECT coalesce(list(ln), []) AS f FROM ldf WHERE nd >= 10),
sel AS (
  SELECT doc_id, lst,
         list_filter(lst, x -> NOT list_contains(fl.f, x)) AS kept
  FROM lsts, fl
)
SELECT doc_id,
       len(lst)::BIGINT AS n_lines,
       len(kept)::BIGINT AS n_kept,
       (md5_number_lower(array_to_string(kept, chr(10)))
        % 2305843009213693952)::BIGINT AS clean_h61
FROM sel
"""


def q_dup_span_coverage(sf_dir: str):
    """Exact-substring dedup statistics: per-doc token positions covered
    by 8-gram shingles shared with another document
    (stages/dedup.dup_span_coverage — positional shingle rows, one
    df groupby, one hash join, coarse-bucket vectorized interval
    union)."""
    from ..stages.dedup import dup_span_coverage

    return dup_span_coverage(_docs(sf_dir))


QUERIES = {
    "text_stats": q_text_stats,
    "token_counts": q_token_counts,
    "text_quality": q_quality,
    "lang_id": q_lang_id,
    "text_repetition": q_text_repetition,
    "doc_fingerprint": q_fingerprint,
    "dedup_exact": q_dedup_exact,
    "corpus_clean_summary": q_corpus_clean_summary,
    "dedup_jaccard_pairs": q_jaccard_pairs,
    "dedup_clusters": q_dedup_clusters,
    "dedup_minhash_pairs": q_minhash_pairs,
    "dedup_incremental": q_dedup_incremental,
    "minhash_signatures": q_minhash_signatures,
    "simhash": q_simhash,
    "dedup_simhash_pairs": q_simhash_pairs,
    "knn_cosine_topk": q_knn,
    "embedding_dup_pairs": q_cosine_pairs,
    "lsh_buckets": q_lsh_buckets,
    "knn_ivf_recall": q_ivf_recall,
    "multimodal_features": q_multimodal,
    "vocab_topk": q_vocab_topk,
    "text_bigrams": q_text_bigrams,
    "docs_hash_sample": q_hash_sample,
    "doc_familiarity": q_doc_familiarity,
    "contamination": q_contamination,
    "source_mix_sample": q_source_mix_sample,
    "pack_sequences": q_pack_sequences,
    "embedding_clusters": q_embedding_clusters,
    "pii_scrub": q_pii_scrub,
    "doc_tfidf_topk": q_doc_tfidf_topk,
    "doc_len_quantiles": q_doc_len_quantiles,
    "docs_global_rank": q_docs_global_rank,
    "distinct_tokens_per_source": q_distinct_tokens_per_source,
    "token_countmin": q_token_countmin,
    "boilerplate_removal": q_boilerplate_removal,
    "dup_span_coverage": q_dup_span_coverage,
}

# ---------------------------------------------------------------------------
# oracle SQL builders for the md5-based hash kernels
# ---------------------------------------------------------------------------

_M61 = (1 << 61) - 1   # permutation modulus (dedup._M61)
_B61 = 1 << 61         # shingle-hash domain


def _minhash_cte(num_perm: int = 128, shingle_k: int = 3, seed: int = 42) -> str:
    """CTEs ``toks``/``sh``/``mh``: per-doc distinct k-shingles and the
    full MinHash slot table — the same integers dedup.MinHasher computes
    (md5_number_lower == _md5_u64; HUGEINT (a·h+b) mod 2^61−1 ==
    _mulmod61).  Constants come from dedup.minhash_params(seed)."""
    a, b = D.minhash_params(num_perm, seed)
    perm_rows = ", ".join(f"({i}, {a[i]}, {b[i]})" for i in range(num_perm))
    return rf"""
toks AS (
  SELECT doc_id, regexp_extract_all(coalesce(text, ''), '\S+') AS w FROM documents
),
sh AS (
  SELECT doc_id, unnest(list_distinct(
    CASE WHEN length(w) = 0 THEN []::VARCHAR[]
         WHEN length(w) < {shingle_k} THEN [array_to_string(w, ' ')]
         ELSE list_transform(generate_series(1, length(w) - {shingle_k} + 1),
                             i -> array_to_string(w[i:i + {shingle_k} - 1], ' '))
    END)) AS s
  FROM toks
),
mh AS (
  SELECT doc_id, p.perm,
         min((p.a::HUGEINT * (md5_number_lower(s) % {_B61}) + p.b) % {_M61})::BIGINT AS h
  FROM sh, (VALUES {perm_rows}) p(perm, a, b)
  GROUP BY doc_id, p.perm
)"""


_SQL_MINHASH_SIGS = f"""
WITH {_minhash_cte()}
SELECT d.doc_id,
       coalesce(min(h), {_M61})::BIGINT AS sig_min,
       coalesce(sum(h::HUGEINT) % {_M61}, 0)::BIGINT AS sig_sum
FROM documents d LEFT JOIN mh USING (doc_id)
GROUP BY d.doc_id
"""

# bands of 4 consecutive perms (128/32); bucket key = md5 of the exact
# string dedup.band_buckets builds; candidates join on bucket equality;
# verification counts equal slots, threshold 0.7 → ceil(0.7·128) = 90
_SQL_MINHASH_PAIRS = f"""
WITH {_minhash_cte()},
bands AS (
  SELECT doc_id, perm // 4 AS band,
         md5_number_lower((perm // 4)::VARCHAR || ':' ||
                          string_agg(h::VARCHAR, ',' ORDER BY perm)) AS bucket
  FROM mh GROUP BY doc_id, perm // 4
),
cand AS (
  SELECT DISTINCT a.doc_id AS da, b.doc_id AS db
  FROM bands a JOIN bands b ON a.bucket = b.bucket AND a.doc_id < b.doc_id
)
SELECT c.da AS doc_id_a, c.db AS doc_id_b,
       (count(*) FILTER (WHERE x.h = y.h))::BIGINT AS est_jaccard_num
FROM cand c
JOIN mh x ON x.doc_id = c.da
JOIN mh y ON y.doc_id = c.db AND y.perm = x.perm
GROUP BY 1, 2
HAVING count(*) FILTER (WHERE x.h = y.h) >= 90
"""

# incremental shard-vs-corpus variant: same bands, cross-side candidates
# only, same 90-slot threshold
_SQL_DEDUP_INCREMENTAL = f"""
WITH {_minhash_cte()},
bands AS (
  SELECT doc_id, perm // 4 AS band,
         md5_number_lower((perm // 4)::VARCHAR || ':' ||
                          string_agg(h::VARCHAR, ',' ORDER BY perm)) AS bucket
  FROM mh GROUP BY doc_id, perm // 4
),
cand AS (
  SELECT DISTINCT a.doc_id AS dn, b.doc_id AS dc
  FROM bands a JOIN bands b ON a.bucket = b.bucket
  WHERE a.doc_id % 10 = 7 AND b.doc_id % 10 != 7
)
SELECT c.dn AS new_doc_id, c.dc AS corpus_doc_id,
       (count(*) FILTER (WHERE x.h = y.h))::BIGINT AS est_jaccard_num
FROM cand c
JOIN mh x ON x.doc_id = c.dn
JOIN mh y ON y.doc_id = c.dc AND y.perm = x.perm
GROUP BY 1, 2
HAVING count(*) FILTER (WHERE x.h = y.h) >= 90
"""

# SimHash: per-token md5_u64 bit votes (token multiplicity kept — no
# distinct), bit set iff the vote sum is strictly positive; bands are the
# four 16-bit quarters; empty docs hash to 0 via the LEFT JOIN.
_SQL_SIMHASH_CTE = r"""
tk AS (
  SELECT doc_id, unnest(regexp_extract_all(coalesce(text, ''), '\S+')) AS t
  FROM documents
),
th AS (SELECT doc_id, md5_number_lower(t) AS h FROM tk),
bits AS (
  SELECT doc_id, b,
         sum(CASE WHEN (h >> b) & 1 = 1 THEN 1 ELSE -1 END) AS acc
  FROM th, (SELECT unnest(generate_series(0, 63)) AS b) bb
  GROUP BY doc_id, b
),
shash AS (
  SELECT doc_id, sum(CASE WHEN acc > 0 THEN (1::HUGEINT << b) ELSE 0::HUGEINT END) AS u
  FROM bits GROUP BY doc_id
),
sx AS (
  SELECT d.doc_id, coalesce(u, 0::HUGEINT) AS u
  FROM documents d LEFT JOIN shash USING (doc_id)
)
"""

_SQL_SIMHASH = f"""
WITH {_SQL_SIMHASH_CTE}
SELECT doc_id,
       (CASE WHEN u >= 9223372036854775808 THEN u - 18446744073709551616
             ELSE u END)::BIGINT AS simhash,
       (u % 65536)::BIGINT AS band0,
       ((u >> 16) % 65536)::BIGINT AS band1,
       ((u >> 32) % 65536)::BIGINT AS band2,
       ((u >> 48) % 65536)::BIGINT AS band3
FROM sx
"""

# the Ray side's 4×16-bit band bucketing is pigeonhole-complete for
# Hamming ≤ 3, so its pair set equals this all-pairs filter exactly
_SQL_SIMHASH_PAIRS = f"""
WITH {_SQL_SIMHASH_CTE}
SELECT a.doc_id AS doc_id_a, b.doc_id AS doc_id_b,
       bit_count(xor(a.u::UBIGINT, b.u::UBIGINT))::BIGINT AS hamming
FROM sx a JOIN sx b ON a.doc_id < b.doc_id
WHERE bit_count(xor(a.u::UBIGINT, b.u::UBIGINT)) <= 3
"""

# lang_id: the exact decision procedure of functions.text.lang_id —
# distinct-stopword hits per language over the 2000-char sample token
# set, CJK-share shortcut, alphabetical tie-break
_LID_HITS = ",\n       ".join(
    "length(list_intersect(ts, ["
    + ", ".join(f"'{w}'" for w in T._LID_STOPWORDS[lang])
    + f"]))::BIGINT AS n_{lang}"
    for lang in T._LID_LANGS
)

_SQL_LANG_ID = rf"""
WITH s AS (
  SELECT doc_id, substr(coalesce(text, ''), 1, 2000) AS sample FROM documents
),
sig AS (
  SELECT doc_id,
         length(sample)::BIGINT AS n_sample,
         length(regexp_extract_all(sample, '[\x{{4e00}}-\x{{9fff}}]'))::BIGINT AS n_cjk,
         list_distinct(regexp_extract_all(lower(sample), '\S+')) AS ts
  FROM s
)
SELECT doc_id, n_cjk,
       {_LID_HITS},
       CASE WHEN n_sample > 0 AND n_cjk * 10 >= n_sample THEN 'zh'
            WHEN greatest(n_de, n_en, n_es, n_fr, n_it) = 0 THEN 'und'
            WHEN n_de >= n_en AND n_de >= n_es AND n_de >= n_fr AND n_de >= n_it THEN 'de'
            WHEN n_en >= n_es AND n_en >= n_fr AND n_en >= n_it THEN 'en'
            WHEN n_es >= n_fr AND n_es >= n_it THEN 'es'
            WHEN n_fr >= n_it THEN 'fr'
            ELSE 'it' END AS lang_pred
FROM sig
"""

# lsh_buckets: the seeded projection planes baked in as float64 literals
# (repr round-trips, DuckDB's parse is correctly rounded, and
# list_inner_product runs in double — sign flips would need a dot product
# within one ulp of zero)
def _lsh_buckets_sql(dim: int = 64, n_planes: int = 16, seed: int = 42) -> str:
    planes = E.hyperplane_params(dim, n_planes, seed)
    rows = ", ".join(
        f"({i}, [{', '.join(repr(float(v)) for v in planes[i])}])"
        for i in range(n_planes)
    )
    return f"""
SELECT vec_id::BIGINT AS vec_id,
       sum(CASE WHEN list_inner_product(embedding::DOUBLE[], p.v) > 0
                THEN (1::BIGINT << p.i) ELSE 0 END)::BIGINT AS bucket
FROM embeddings, (VALUES {rows}) p(i, v)
GROUP BY vec_id
"""


_SQL_IVF_RECALL = """
SELECT vec_id::BIGINT AS query_id, true AS recall_ok
FROM embeddings WHERE vec_id < 10
"""

# winnowing fingerprint (md5 kernel): char 8-gram hashes, window-of-16
# minima (windows of the hash sequence; short docs → single global min),
# distinct selection summarized as count/min/xor
_SQL_FINGERPRINT = f"""
WITH g AS (
  SELECT doc_id,
         md5_number_lower(substr(text, i, 8)) % {_B61} AS h,
         i, greatest(length(text) - 7, 0) AS n
  FROM (SELECT doc_id, coalesce(text, '') AS text,
               unnest(generate_series(
                   1, greatest(length(coalesce(text, '')) - 7, 0))) AS i
        FROM documents)
),
wm AS (
  SELECT doc_id, n, i,
         min(h) OVER (PARTITION BY doc_id ORDER BY i
                      ROWS BETWEEN 15 PRECEDING AND CURRENT ROW) AS m
  FROM g
),
sel AS (
  SELECT DISTINCT doc_id, n, m FROM wm WHERE i >= 16 OR i = n
)
SELECT d.doc_id,
       coalesce(max(sel.n),
                greatest(length(coalesce(d.text, '')) - 7, 0))::BIGINT AS n_grams,
       count(sel.m)::BIGINT AS n_fingerprints,
       coalesce(min(sel.m), 0)::BIGINT AS fp_min,
       coalesce(bit_xor(sel.m::UBIGINT), 0)::BIGINT AS fp_xor
FROM documents d LEFT JOIN sel ON d.doc_id = sel.doc_id
GROUP BY d.doc_id, d.text
"""


# 8-gram positional shingles; dup = shingle hash in ≥2 distinct docs;
# coverage = distinct token positions inside [pos, pos+7] dup windows —
# the integer interval-union twin of dedup.dup_span_coverage's gap scan
_SQL_DUP_SPAN = rf"""
WITH toks AS (
  SELECT doc_id, regexp_extract_all(coalesce(text, ''), '\S+') AS w
  FROM documents
),
sh AS (
  SELECT doc_id, i AS pos,
         (md5_number_lower(array_to_string(w[i:i + 7], ' ')) % {_B61})::BIGINT AS h
  FROM (
    SELECT doc_id, w, unnest(generate_series(1, length(w) - 7)) AS i
    FROM toks
  )
),
dup AS (
  SELECT h
  FROM (SELECT h, count(DISTINCT doc_id) AS c FROM sh GROUP BY h)
  WHERE c > 1
),
dpos AS (SELECT doc_id, pos FROM sh WHERE h IN (SELECT h FROM dup)),
cov AS (
  SELECT doc_id, count(DISTINCT pp)::BIGINT AS covered_tokens,
         count(DISTINCT pos)::BIGINT AS n_dup_pos
  FROM (
    SELECT doc_id, pos, unnest(generate_series(pos, pos + 7)) AS pp
    FROM dpos
  )
  GROUP BY doc_id
)
SELECT d.doc_id,
       length(regexp_extract_all(coalesce(d.text, ''), '\S+'))::BIGINT AS n_tokens,
       coalesce(cov.n_dup_pos, 0)::BIGINT AS n_dup_pos,
       coalesce(cov.covered_tokens, 0)::BIGINT AS covered_tokens
FROM documents d LEFT JOIN cov USING (doc_id)
"""

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
    "text_repetition": r"""
WITH tl AS (
  SELECT doc_id, regexp_extract_all(coalesce(text,''), '\S+') AS toks FROM documents
), uc AS (
  SELECT doc_id, tok, count(*) AS n
  FROM (SELECT doc_id, unnest(toks) AS tok FROM tl) GROUP BY 1, 2
), uagg AS (
  SELECT doc_id, count(*) AS n_distinct_tokens, max(n) AS top_token_count FROM uc GROUP BY 1
), utop AS (
  SELECT doc_id, tok AS top_token
  FROM (SELECT doc_id, tok,
               row_number() OVER (PARTITION BY doc_id ORDER BY n DESC, tok) AS rk
        FROM uc)
  WHERE rk = 1
), bc AS (
  SELECT doc_id, bg, count(*) AS n
  FROM (SELECT doc_id, unnest(list_transform(
            list_zip(toks[1:length(toks)-1], toks[2:length(toks)]),
            x -> x[1] || ' ' || x[2])) AS bg
        FROM tl WHERE length(toks) >= 2)
  GROUP BY 1, 2
), bagg AS (
  SELECT doc_id, max(n) AS top_bigram_count FROM bc GROUP BY 1
)
SELECT tl.doc_id,
  length(tl.toks)::BIGINT AS n_tokens,
  coalesce(uagg.n_distinct_tokens, 0)::BIGINT AS n_distinct_tokens,
  coalesce(utop.top_token, '') AS top_token,
  coalesce(uagg.top_token_count, 0)::BIGINT AS top_token_count,
  coalesce(bagg.top_bigram_count, 0)::BIGINT AS top_bigram_count,
  (CASE WHEN (length(tl.toks) >= 2 AND coalesce(bagg.top_bigram_count,0) * 5 > length(tl.toks) - 1)
          OR (length(tl.toks) > 0 AND coalesce(uagg.n_distinct_tokens,0) * 5 < length(tl.toks) * 2)
        THEN 1 ELSE 0 END)::BIGINT AS is_repetitive
FROM tl
LEFT JOIN uagg USING (doc_id) LEFT JOIN utop USING (doc_id) LEFT JOIN bagg USING (doc_id)
""",
    "dedup_exact": """
SELECT min(doc_id)::BIGINT AS doc_id, min(n_chars)::BIGINT AS n_chars
FROM documents GROUP BY coalesce(text, '')
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
    "dedup_jaccard_pairs": rf"""
WITH {_JACCARD_W_CTE},
p AS ({_JACCARD_PAIRS_SELECT})
SELECT a::BIGINT AS doc_id_a, b::BIGINT AS doc_id_b,
       n_inter::BIGINT AS n_inter, n_union::BIGINT AS n_union
FROM p
""",
    "dedup_clusters": _cc_sql(
        pairs_ctes=f"{_JACCARD_W_CTE},\np AS ({_JACCARD_PAIRS_SELECT})",
        base_table="documents",
        id_col="doc_id",
    ),
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
    "embedding_dup_pairs": f"""
WITH {_EMB_PAIRS_CTE}
SELECT a::BIGINT AS vec_id_a, b::BIGINT AS vec_id_b FROM p
""",
    "multimodal_features": """
SELECT doc_id, octet_length(encode(text))::BIGINT AS n_bytes FROM documents
""",
    "minhash_signatures": _SQL_MINHASH_SIGS,
    "dedup_minhash_pairs": _SQL_MINHASH_PAIRS,
    "dedup_incremental": _SQL_DEDUP_INCREMENTAL,
    "simhash": _SQL_SIMHASH,
    "dedup_simhash_pairs": _SQL_SIMHASH_PAIRS,
    "lang_id": _SQL_LANG_ID,
    "doc_fingerprint": _SQL_FINGERPRINT,
    "lsh_buckets": _lsh_buckets_sql(),
    "knn_ivf_recall": _SQL_IVF_RECALL,
    "vocab_topk": _SQL_VOCAB_TOPK,
    "text_bigrams": _SQL_TEXT_BIGRAMS,
    "docs_hash_sample": _SQL_HASH_SAMPLE,
    "doc_familiarity": _SQL_DOC_FAMILIARITY,
    "contamination": _SQL_CONTAMINATION,
    "source_mix_sample": _SQL_SOURCE_MIX,
    "pack_sequences": _SQL_PACK_SEQUENCES,
    "embedding_clusters": _SQL_EMBEDDING_CLUSTERS,
    "pii_scrub": _SQL_PII,
    "doc_tfidf_topk": _SQL_TFIDF_TOPK,
    "doc_len_quantiles": _SQL_LEN_QUANTILES,
    "docs_global_rank": _SQL_GLOBAL_RANK,
    "distinct_tokens_per_source": _SQL_DISTINCT_TOKENS,
    "token_countmin": _SQL_TOKEN_COUNTMIN,
    "boilerplate_removal": _SQL_BOILERPLATE,
    "dup_span_coverage": _SQL_DUP_SPAN,
}


def q_docs_above_p90(sf_dir: str):
    """Per-source p90 length gate — the quality-filter composition: the
    counting-histogram quantile (aggregate-sized, no distributed sort —
    see q_doc_len_quantiles) yields one threshold per source on the
    driver, which broadcasts into a map-only filter.  Rows
    (doc_id, source, n_chars) with n_chars STRICTLY above the source's
    p90 (integer lower-index rule (n−1)·90 // 100)."""
    import ray

    ds, hist = _source_len_histogram(
        sf_dir, columns=("doc_id", "source", "n_chars")
    )
    thr = {
        src: _pct_threshold(g, 90)[1] for src, g in hist.groupby("source")
    }
    ref = ray.put(thr)

    def gate(df: pd.DataFrame) -> pd.DataFrame:
        t = ray.get(ref)
        keep = df["n_chars"].astype("int64") > df["source"].map(t).astype("int64")
        out = df[keep].reset_index(drop=True)
        return pd.DataFrame(
            {
                "doc_id": out["doc_id"].astype("int64"),
                "source": out["source"].astype("string"),
                "n_chars": out["n_chars"].astype("int64"),
            }
        )

    return ds.map_batches(gate, batch_format="pandas")


_SQL_DOCS_ABOVE_P90 = """
WITH r AS (
  SELECT source, n_chars,
         row_number() OVER (PARTITION BY source ORDER BY n_chars) - 1 AS rn,
         count(*) OVER (PARTITION BY source) AS n
  FROM documents
),
th AS (
  SELECT source, n_chars AS thr FROM r WHERE rn = (n - 1) * 90 // 100
)
SELECT d.doc_id::BIGINT AS doc_id, d.source, d.n_chars::BIGINT AS n_chars
FROM documents d JOIN th USING (source)
WHERE d.n_chars > th.thr
"""

QUERIES["docs_above_p90"] = q_docs_above_p90
ORACLES["docs_above_p90"] = _SQL_DOCS_ABOVE_P90


def q_knn_neighbor_sources(sf_dir: str):
    """Similarity-search enrichment: exact cosine top-k joined to the
    documents table for each neighbor's metadata — a Dataset.join of a
    small result against the corpus-scale side (the join would flip to
    a broadcast at real scale; here it exercises Ray's hash join on the
    driver surface).  Rows (query_id, neighbor_id, rank, source)."""
    import ray

    from ..util import heal_schema

    from ..util import join_partitions

    # cluster-derived (a constant 8 = all aggregator slots in an
    # 8-cpu session -> producer starvation deadlock)
    np_ = join_partitions(None)
    knn = E.knn_topk(_embs(sf_dir), query_ids=list(range(10)), k=5)
    left = heal_schema(
        ray.data.from_pandas(knn.rename(columns={"neighbor_id": "doc_id"})),
        np_,
    )
    docs = heal_schema(
        ray.data.read_parquet(
            f"{sf_dir}/documents.parquet", columns=["doc_id", "source"]
        ),
        np_,
    )
    joined = left.join(docs, "inner", np_, on=("doc_id",))

    def project(df: pd.DataFrame) -> pd.DataFrame:
        return pd.DataFrame(
            {
                "query_id": df["query_id"].astype("int64"),
                "neighbor_id": df["doc_id"].astype("int64"),
                "rank": df["rank"].astype("int64"),
                "source": df["source"].astype("string"),
            }
        )

    return joined.map_batches(project, batch_format="pandas")


_SQL_KNN_SOURCES = """
WITH k AS (
  SELECT q.vec_id::BIGINT AS query_id, n.vec_id::BIGINT AS neighbor_id,
         row_number() OVER (
           PARTITION BY q.vec_id
           ORDER BY list_cosine_similarity(q.embedding::DOUBLE[], n.embedding::DOUBLE[]) DESC,
                    n.vec_id
         )::BIGINT AS rank
  FROM embeddings q, embeddings n
  WHERE q.vec_id < 10 AND n.vec_id != q.vec_id
  QUALIFY rank <= 5
)
SELECT k.query_id, k.neighbor_id, k.rank, d.source
FROM k JOIN documents d ON d.doc_id = k.neighbor_id
"""


def q_source_stratified_sample(sf_dir: str, n_per_source: int = 10):
    """Per-source stratified sample: the ``n_per_source`` docs with the
    SMALLEST md5(doc_id) per source — deterministic across cluster
    sizes and retries (hash order, not random_shuffle), the dataset-
    balancing step of a training mix.  Source-bucketed shuffle +
    per-bucket vectorized nsmallest (a source lives wholly in one
    bucket, so per-bucket top-n is globally exact)."""
    from ..stages.dedup import _md5_u64
    from ..util import bucket_agg

    ds = ray.data.read_parquet(
        f"{sf_dir}/documents.parquet", columns=["doc_id", "source"]
    )

    def with_hash(df: pd.DataFrame) -> pd.DataFrame:
        ids = df["doc_id"].astype("int64")
        return pd.DataFrame(
            {
                "doc_id": ids,
                "source": df["source"].astype("string"),
                # stays uint64: an int64 cast flips the sign of large
                # hashes and desyncs the order from SQL's unsigned
                # md5_number_lower
                "h": pd.Series(
                    [_md5_u64(str(i)) for i in ids], dtype="uint64",
                    index=df.index,
                ),
            }
        )

    def pick(df: pd.DataFrame) -> pd.DataFrame:
        top = (
            df.sort_values(["source", "h", "doc_id"])
            .groupby("source", sort=False)
            .head(n_per_source)
        )
        return top[["doc_id", "source"]].reset_index(drop=True)

    return bucket_agg(
        ds.map_batches(with_hash, batch_format="pandas"), ["source"], pick
    )


_SQL_STRATIFIED = """
SELECT doc_id::BIGINT AS doc_id, source FROM (
  SELECT doc_id, source,
         row_number() OVER (
           PARTITION BY source
           ORDER BY md5_number_lower(doc_id::VARCHAR), doc_id
         ) AS rn
  FROM documents
) WHERE rn <= 10
"""

QUERIES["knn_neighbor_sources"] = q_knn_neighbor_sources
ORACLES["knn_neighbor_sources"] = _SQL_KNN_SOURCES
QUERIES["source_stratified_sample"] = q_source_stratified_sample
ORACLES["source_stratified_sample"] = _SQL_STRATIFIED


def q_multimodal_image_stats(sf_dir: str):
    """REAL multimodal round-trip, value-exact: text → 24-bit BMP binary
    payload (attach_payload media='bmp') → actor-pool decode with the
    actual codec (stages/multimodal.ImageStats) → integer pixel stats.
    The oracle re-derives side length and the cycled byte sum purely in
    SQL (documents text is ASCII, so ascii(substr(...)) == the utf-8
    byte the encoder consumed)."""
    payloads = M.attach_payload(_docs(sf_dir), media="bmp")
    return M.image_stats(payloads)


# pixel array = np.resize(utf8_bytes, side*side*3), side =
# max(4, min(32, int(sqrt(len)))): px_sum = full_cycles * sum(bytes)
# + sum(bytes[:rem])
_SQL_IMAGE_STATS = """
WITH d AS (
  SELECT doc_id, text, length(text) AS n,
         greatest(4, least(32, floor(sqrt(length(text)))::INT)) AS side
  FROM documents
),
s AS (
  SELECT doc_id, side, n, text,
         side * side * 3 AS total,
         list_sum(list_transform(generate_series(1, n),
                                 i -> ascii(substr(text, i, 1)))) AS sum_all
  FROM d
)
SELECT doc_id::BIGINT AS doc_id,
       side::BIGINT AS height, side::BIGINT AS width,
       ((total // n) * sum_all
        + coalesce(list_sum(list_transform(generate_series(1, total % n),
                                           i -> ascii(substr(text, i, 1)))), 0)
       )::BIGINT AS px_sum
FROM s
"""

QUERIES["multimodal_image_stats"] = q_multimodal_image_stats
ORACLES["multimodal_image_stats"] = _SQL_IMAGE_STATS


def q_multimodal_audio_stats(sf_dir: str):
    """REAL audio round-trip, value-exact: text → PCM16 WAV payload
    (attach_payload media='wav') → decode with the actual codec →
    integer stats (rate, n_samples, sample sum)."""
    payloads = M.attach_payload(_docs(sf_dir), media="wav")
    return M.audio_stats(payloads)


# samples = np.resize(bytes.astype(int16) - 128, n) * 256 with
# n = max(64, min(4000, 4*len)): sum = 256 * (cycles * (sum_all - 128*len)
# + prefix_rem_shifted)
_SQL_AUDIO_STATS = """
WITH d AS (
  SELECT doc_id, text, length(text) AS len,
         greatest(64, least(4000, 4 * length(text))) AS n
  FROM documents
),
s AS (
  SELECT doc_id, n, len, text,
         list_sum(list_transform(generate_series(1, len),
                                 i -> ascii(substr(text, i, 1)) - 128)) AS sum_all
  FROM d
)
SELECT doc_id::BIGINT AS doc_id, 8000::BIGINT AS rate, n::BIGINT AS n_samples,
       (256 * ((n // len) * sum_all
        + coalesce(list_sum(list_transform(generate_series(1, n % len),
                     i -> ascii(substr(text, i, 1)) - 128)), 0)))::BIGINT
         AS samp_sum
FROM s
"""

QUERIES["multimodal_audio_stats"] = q_multimodal_audio_stats
ORACLES["multimodal_audio_stats"] = _SQL_AUDIO_STATS


def q_multimodal_resize(sf_dir: str):
    """REAL image-resize round trip, value-exact: text → 24-bit BMP →
    actor-pool nearest-neighbor resample to an 8×8 thumbnail with the
    actual codec (stages/multimodal.ResizeImage mode='real': decode →
    resize_nn → re-encode) → decode the thumbnail → integer pixel stats.
    The oracle re-derives every thumbnail pixel purely in SQL from the
    NN index rule out[i,j] = in[i*side//8, j*side//8]."""
    from ..util import stage_concurrency

    # TWO actor pools share this plan (ResizeImage → ImageStats):
    # split the pool budget or the chained pools deadlock
    c = stage_concurrency(2)
    payloads = M.attach_payload(_docs(sf_dir), media="bmp")
    thumbs = M.resize_payloads(payloads, mode="real", target_side=8, concurrency=c)
    return M.image_stats(thumbs, concurrency=c)


# source pixel byte for thumb index k (row i=k//24, col j=(k//3)%8,
# channel c=k%3) is cycled text byte ((i*side//8)*side + j*side//8)*3+c mod n
_SQL_RESIZE = """
WITH d AS (
  SELECT doc_id, text, length(text) AS n,
         greatest(4, least(32, floor(sqrt(length(text)))::INT)) AS side
  FROM documents
)
SELECT doc_id::BIGINT AS doc_id, 8::BIGINT AS height, 8::BIGINT AS width,
       list_sum(list_transform(generate_series(0, 191),
         k -> ascii(substr(text,
              ((((k // 24) * side // 8) * side
                 + ((k // 3) % 8) * side // 8) * 3 + k % 3) % n + 1,
              1))))::BIGINT AS px_sum
FROM d
"""

QUERIES["multimodal_resize"] = q_multimodal_resize
ORACLES["multimodal_resize"] = _SQL_RESIZE


def q_multimodal_audio_resample(sf_dir: str):
    """REAL audio decimation round trip, value-exact: text → PCM16 WAV →
    actor-pool 4× decimation with the actual codec
    (stages/multimodal.ResampleAudio: decode → every 4th sample →
    re-encode at rate//4) → decode the resampled payload → integer
    stats.  The oracle picks exactly the surviving sample indices."""
    from ..util import stage_concurrency

    c = stage_concurrency(2)
    payloads = M.attach_payload(_docs(sf_dir), media="wav")
    down = M.resample_audio(payloads, factor=4, concurrency=c)
    return M.audio_stats(down, concurrency=c)


# surviving sample m (of ceil(n/4)) is cycled byte (4m mod len) shifted
# and scaled exactly as attach_payload built the original samples
_SQL_AUDIO_RESAMPLE = """
WITH d AS (
  SELECT doc_id, text, length(text) AS len,
         greatest(64, least(4000, 4 * length(text))) AS n
  FROM documents
)
SELECT doc_id::BIGINT AS doc_id, 2000::BIGINT AS rate,
       ((n + 3) // 4)::BIGINT AS n_samples,
       (256 * list_sum(list_transform(generate_series(0, (n + 3) // 4 - 1),
          m -> ascii(substr(text, (m * 4) % len + 1, 1)) - 128)))::BIGINT
         AS samp_sum
FROM d
"""

QUERIES["multimodal_audio_resample"] = q_multimodal_audio_resample
ORACLES["multimodal_audio_resample"] = _SQL_AUDIO_RESAMPLE


def q_multimodal_video_stats(sf_dir: str):
    """REAL video round-trip, value-exact: text → 4-frame NBV clip
    (attach_payload media='nbv') → actor-pool frame sampling that keeps
    every 2nd frame WITHOUT decoding dropped ones
    (stages/multimodal.sample_frames mode='real') → decode the kept
    frames → integer pixel sums.  The oracle re-derives each sampled
    frame's cycled byte sum in SQL (frame k pixels =
    np.resize(bytes[k:], 8*8*3))."""
    from ..util import stage_concurrency

    # TWO actor-pool stages share this plan: split the pool budget or
    # the chained pools over-subscribe the CPU slots and deadlock
    c = stage_concurrency(2)
    payloads = M.attach_payload(_docs(sf_dir), media="nbv")
    sampled = M.sample_frames(payloads, stride=2, mode="real", concurrency=c)
    return M.video_frame_stats(sampled, concurrency=c)


# clip = 4 frames, frame k = np.resize(bytes[k:], 192); stride-2 real
# sampling keeps frames 0 and 2 without touching 1 and 3
_SQL_VIDEO_STATS = """
WITH d AS (SELECT doc_id, text, length(text) AS len FROM documents),
f AS (
  SELECT doc_id, u.k, len - u.k AS lk, text
  FROM d, unnest([0, 2]) AS u(k)
),
s AS (
  SELECT doc_id,
         (192 // lk) * list_sum(list_transform(
             generate_series(k + 1, k + lk),
             i -> ascii(substr(text, i, 1)))) AS whole,
         coalesce(list_sum(list_transform(
             generate_series(k + 1, k + (192 % lk)),
             i -> ascii(substr(text, i, 1)))), 0) AS rem
  FROM f
)
SELECT doc_id::BIGINT AS doc_id, 2::BIGINT AS n_frames,
       sum(whole + rem)::BIGINT AS px_sum
FROM s GROUP BY doc_id
"""

QUERIES["multimodal_video_stats"] = q_multimodal_video_stats
ORACLES["multimodal_video_stats"] = _SQL_VIDEO_STATS


def q_distinct_sketch_kmv(sf_dir: str, k: int = 64):
    """KMV (k-minimum-values) distinct-token sketch per source — the
    mergeable cardinality estimator pattern: every batch keeps only its
    k smallest DISTINCT token hashes per source (constant memory), the
    per-source partials merge associatively in one bucketed pass, and
    the estimate is the deterministic integer formula
    (k−1)·2^61 // kth_min.  Unlike HyperLogLog the whole sketch is
    md5-derived, so a DuckDB oracle reproduces kth_min AND the estimate
    bit-exactly.  Rows (source, kth_min, est_distinct, exact ≥ k flag is
    implicit: sources with < k distinct tokens report exact counts with
    est_distinct = n_distinct)."""
    from ..stages.dedup import _md5_u64_cached, tokens
    from ..util import bucket_agg

    def partial(df: pd.DataFrame) -> pd.DataFrame:
        per: dict[str, set[int]] = {}
        for src, t in zip(df["source"], df["text"].fillna("")):
            s = per.setdefault(src, set())
            for tok in tokens(t):
                # 61-bit domain keeps kth_min and the estimate int64-safe
                s.add(_md5_u64_cached(tok) & ((1 << 61) - 1))
        rows_s, rows_h = [], []
        for src, hs in per.items():
            keep = sorted(hs)[:k]
            rows_s.extend([src] * len(keep))
            rows_h.extend(keep)
        return pd.DataFrame(
            {
                "source": pd.Series(rows_s, dtype="string"),
                "h": pd.Series(rows_h, dtype="uint64"),
            }
        )

    def merge(df: pd.DataFrame) -> pd.DataFrame:
        from ..stages.dedup import kmv_sketch

        out_s, out_kth, out_est = [], [], []
        for src, g in df.groupby("source", sort=False):
            kth, est = kmv_sketch(g["h"].tolist(), k)
            out_s.append(src)
            out_kth.append(kth)
            out_est.append(est)
        return pd.DataFrame(
            {
                "source": pd.Series(out_s, dtype="string"),
                "kth_min": pd.Series(out_kth, dtype="int64"),
                "est_distinct": pd.Series(out_est, dtype="int64"),
            }
        )

    return bucket_agg(
        _docs(sf_dir).map_batches(partial, batch_format="pandas"),
        ["source"],
        merge,
    )


# md5_number_lower == _md5_u64; per source: 64th smallest distinct token
# hash, estimate (63)·2^61 // kth (exact count when < 64 distinct)
_SQL_KMV = r"""
WITH th AS (
  SELECT DISTINCT source,
         (md5_number_lower(unnest(regexp_extract_all(coalesce(text, ''), '\S+')))
          % (1::HUGEINT << 61))::BIGINT AS h
  FROM documents
),
r AS (
  SELECT source, h,
         row_number() OVER (PARTITION BY source ORDER BY h) AS rn,
         count(*) OVER (PARTITION BY source) AS n
  FROM th
)
SELECT source,
       h::BIGINT AS kth_min,
       CASE WHEN n >= 64 THEN (63 * (1::HUGEINT << 61) // h)::BIGINT
            ELSE n::BIGINT END AS est_distinct
FROM r
WHERE rn = least(n, 64)
"""

QUERIES["distinct_sketch_kmv"] = q_distinct_sketch_kmv
ORACLES["distinct_sketch_kmv"] = _SQL_KMV


def q_dedup_ppjoin_pairs(sf_dir: str):
    """Exact GLOBAL shingle-Jaccard pairs (≥ 7/10) via PPJoin prefix
    filtering (stages/dedup.ppjoin_pairs) — the third, unblocked+exact
    dedup mechanism; the oracle recomputes the same pair set from a
    shared-shingle self-join."""
    return D.ppjoin_pairs(
        _docs(sf_dir), threshold_num=7, threshold_den=10, shingle_k=3
    )


_SQL_PPJOIN = rf"""
WITH toks AS (
  SELECT doc_id, regexp_extract_all(coalesce(text, ''), '\S+') AS w FROM documents
),
shp AS (
  SELECT doc_id, unnest(list_distinct(
    CASE WHEN length(w) = 0 THEN []::VARCHAR[]
         WHEN length(w) < 3 THEN [array_to_string(w, ' ')]
         ELSE list_transform(generate_series(1, length(w) - 2),
                             i -> array_to_string(w[i:i + 2], ' '))
    END)) AS s
  FROM toks
),
sh2 AS (
  SELECT DISTINCT doc_id,
         (md5_number_lower(s) % (1::HUGEINT << 61))::BIGINT AS h
  FROM shp
),
sizes AS (SELECT doc_id, count(*) AS n FROM sh2 GROUP BY doc_id),
inter AS (
  SELECT a.doc_id AS a, b.doc_id AS b, count(*) AS i
  FROM sh2 a JOIN sh2 b ON a.h = b.h AND a.doc_id < b.doc_id
  GROUP BY 1, 2
)
SELECT i.a::BIGINT AS doc_id_a, i.b::BIGINT AS doc_id_b
FROM inter i
JOIN sizes sa ON sa.doc_id = i.a
JOIN sizes sb ON sb.doc_id = i.b
WHERE i.i * 10 >= (sa.n + sb.n - i.i) * 7
"""

QUERIES["dedup_ppjoin_pairs"] = q_dedup_ppjoin_pairs
ORACLES["dedup_ppjoin_pairs"] = _SQL_PPJOIN


def q_dedup_cluster_keep(sf_dir: str):
    """Canonical-survivor selection — the step AFTER near-dup
    clustering: per cluster keep the best document (longest, ties to
    the smallest doc_id) and report the cluster size.  One hash join
    (cluster labels ⋈ doc metadata) + a bucketed per-cluster arg-max —
    cluster groups never become per-key Ray aggregates."""
    import ray

    from ..util import bucket_agg, heal_schema

    from ..util import join_partitions

    # cluster-derived (a constant 8 = all aggregator slots in an
    # 8-cpu session -> producer starvation deadlock)
    np_ = join_partitions(None)
    clusters = D.jaccard_clusters(_docs(sf_dir))  # (doc_id, cluster_id)
    meta = ray.data.read_parquet(
        f"{sf_dir}/documents.parquet", columns=["doc_id", "n_chars"]
    )
    joined = heal_schema(clusters, np_).join(
        heal_schema(meta, np_), "inner", np_, on=("doc_id",)
    )

    def keep(df: pd.DataFrame) -> pd.DataFrame:
        d = df.sort_values(
            ["cluster_id", "n_chars", "doc_id"],
            ascending=[True, False, True],
        )
        sizes = d.groupby("cluster_id", sort=False)["doc_id"].transform("size")
        d = d.assign(n_members=sizes.astype("int64"))
        first = d.drop_duplicates("cluster_id")
        return pd.DataFrame(
            {
                "cluster_id": first["cluster_id"].astype("int64"),
                "kept_doc_id": first["doc_id"].astype("int64"),
                "n_members": first["n_members"],
            }
        ).reset_index(drop=True)

    return bucket_agg(joined, ["cluster_id"], keep)


_SQL_CLUSTER_KEEP = f"""
SELECT cluster_id, doc_id AS kept_doc_id, n_members FROM (
  SELECT c.cluster_id, d.doc_id,
         row_number() OVER (
           PARTITION BY c.cluster_id ORDER BY d.n_chars DESC, d.doc_id
         ) AS rn,
         count(*) OVER (PARTITION BY c.cluster_id)::BIGINT AS n_members
  FROM ({ORACLES["dedup_clusters"]}) c
  JOIN documents d USING (doc_id)
) WHERE rn = 1
"""

QUERIES["dedup_cluster_keep"] = q_dedup_cluster_keep
ORACLES["dedup_cluster_keep"] = _SQL_CLUSTER_KEEP


def q_distinct_sketch_hll(sf_dir: str):
    """HyperLogLog distinct-token sketch per source (Flajolet et al.
    2007) — the constant-memory sibling of distinct_sketch_kmv: 256
    registers (p=8) over the 61-bit md5 token-hash domain, register =
    top 8 bits, rho = leading-zero rank of the remaining 53 bits
    (1..54), register value = max rho.  Registers merge associatively
    (elementwise max), so each batch emits at most 256 rows per source
    and one bucketed pass combines them — the canonical mergeable-sketch
    layout that never ships token-scale state.

    Everything stays INTEGER so the DuckDB twin is bit-exact: the raw
    HLL estimate alpha_256 * 256^2 / sum(2^-M[j]) is computed as
    (7213 * 65536 * 2^54) // (10000 * sum(2^(54 - M[j]))) with empty
    registers contributing 2^54 (no float ever appears; alpha_256 ≈
    0.7213 carried as the rational 7213/10000).  This is the RAW
    estimator — biased high (≈ alpha·m) when n ≪ m; n_regs is exact, so
    a caller needing small-range accuracy applies linear counting
    (m·ln(m/(m−n_regs)), float) downstream.  Rows per source:
    (n_regs hit, sum_rho, est_hll)."""
    from ..stages.dedup import _md5_u64_cached, tokens
    from ..util import bucket_agg

    def partial(df: pd.DataFrame) -> pd.DataFrame:
        best: dict[tuple, int] = {}
        for src, t in zip(df["source"], df["text"].fillna("")):
            for tok in set(tokens(t)):
                h = _md5_u64_cached(tok) & ((1 << 61) - 1)
                rho = 54 - (h & ((1 << 53) - 1)).bit_length()
                k = (src, h >> 53)
                if best.get(k, 0) < rho:
                    best[k] = rho
        return pd.DataFrame(
            {
                "source": pd.Series([k[0] for k in best], dtype="string"),
                "reg": pd.Series([k[1] for k in best], dtype="int64"),
                "rho": pd.Series(list(best.values()), dtype="int64"),
            }
        )

    def merge(df: pd.DataFrame) -> pd.DataFrame:
        out = []
        for src, g in df.groupby("source", sort=False):
            m = g.groupby("reg")["rho"].max()
            denom = sum(1 << (54 - int(r)) for r in m)
            denom += (256 - len(m)) * (1 << 54)
            est = (7213 * 65536 * (1 << 54)) // (10000 * denom)
            out.append((src, len(m), int(m.sum()), min(est, 1 << 62)))
        return pd.DataFrame(
            out, columns=["source", "n_regs", "sum_rho", "est_hll"]
        ).astype({"source": "string", "n_regs": "int64",
                  "sum_rho": "int64", "est_hll": "int64"})

    return bucket_agg(
        _docs(sf_dir).map_batches(partial, batch_format="pandas"),
        ["source"],
        merge,
    )


# md5_number_lower == _md5_u64; reg = top 8 of 61 bits, rho = 54 -
# bit_length(low 53); estimate = integer-rational HLL raw formula
_SQL_HLL = r"""
WITH th AS (
  SELECT DISTINCT source,
         (md5_number_lower(unnest(regexp_extract_all(coalesce(text, ''), '\S+')))
          % (1::HUGEINT << 61))::BIGINT AS h
  FROM documents
),
regs AS (
  SELECT source, h // (1::BIGINT << 53) AS reg,
         max(CASE WHEN h % (1::BIGINT << 53) = 0 THEN 54
                  ELSE 54 - length(bin(h % (1::BIGINT << 53))) END) AS rho
  FROM th GROUP BY source, reg
),
agg AS (
  SELECT source, count(*) AS n_regs, sum(rho) AS sum_rho,
         sum(1::HUGEINT << (54 - rho)) AS d_hit
  FROM regs GROUP BY source
)
SELECT source, n_regs::BIGINT AS n_regs, sum_rho::BIGINT AS sum_rho,
       least((7213::HUGEINT * 65536 * (1::HUGEINT << 54))
             // (10000 * (d_hit + (256 - n_regs) * (1::HUGEINT << 54))),
             1::HUGEINT << 62)::BIGINT AS est_hll
FROM agg
"""

QUERIES["distinct_sketch_hll"] = q_distinct_sketch_hll
ORACLES["distinct_sketch_hll"] = _SQL_HLL


def q_contamination_bloom(sf_dir: str):
    """Fixed-memory Bloom-filter decontamination
    (stages.dedup.bloom_contamination): 64 Kbit filter over the eval
    split's shingles, 3 md5-salted hash functions, deterministic false
    positives reproduced bit-exactly by the SQL twin."""
    return D.bloom_contamination(_docs(sf_dir))


# filter bits = 3 salted md5 positions per eval shingle; a train shingle
# "hits" iff all 3 of its positions are set (false positives included —
# that's the semantics under test)
_SQL_CONTAM_BLOOM = r"""
WITH toks AS (
  SELECT doc_id, regexp_extract_all(coalesce(text, ''), '\S+') AS w
  FROM documents
),
sh AS (
  SELECT doc_id, unnest(list_distinct(
    CASE WHEN length(w) = 0 THEN []::VARCHAR[]
         WHEN length(w) < 3 THEN [array_to_string(w, ' ')]
         ELSE list_transform(generate_series(1, length(w) - 2),
                             i -> array_to_string(w[i:i + 2], ' '))
    END)) AS s
  FROM toks
),
bits AS (
  SELECT DISTINCT
         md5_number_lower(s || chr(31) || 'bloom' || j) % 65536 AS p
  FROM sh, unnest([0, 1, 2]) AS u(j)
  WHERE md5_number_lower(doc_id::VARCHAR) % 20 = 0
),
hits AS (
  SELECT doc_id, count(*)::BIGINT AS n_hits
  FROM (
    SELECT doc_id,
           md5_number_lower(s || chr(31) || 'bloom0') % 65536 AS p0,
           md5_number_lower(s || chr(31) || 'bloom1') % 65536 AS p1,
           md5_number_lower(s || chr(31) || 'bloom2') % 65536 AS p2
    FROM sh
    WHERE md5_number_lower(doc_id::VARCHAR) % 20 <> 0
  )
  WHERE p0 IN (SELECT p FROM bits) AND p1 IN (SELECT p FROM bits)
        AND p2 IN (SELECT p FROM bits)
  GROUP BY doc_id
),
grams AS (
  SELECT doc_id, count(s)::BIGINT AS n_grams FROM sh GROUP BY doc_id
)
SELECT d.doc_id,
       coalesce(g.n_grams, 0)::BIGINT AS n_grams,
       coalesce(h.n_hits, 0)::BIGINT AS n_hits,
       (coalesce(h.n_hits, 0) > 0)::BIGINT AS flagged
FROM documents d
LEFT JOIN grams g ON d.doc_id = g.doc_id
LEFT JOIN hits h ON d.doc_id = h.doc_id
WHERE md5_number_lower(d.doc_id::VARCHAR) % 20 <> 0
"""

QUERIES["contamination_bloom"] = q_contamination_bloom
ORACLES["contamination_bloom"] = _SQL_CONTAM_BLOOM


def q_text_sentences(sf_dir: str):
    """Sentence segmentation stats (functions/text.sentence_stats):
    vectorized split + explode + one groupby per batch."""
    return _docs(sf_dir).map_batches(T.sentence_stats, batch_format="pandas")


# sentence = [.!?]+-delimited segment with ≥1 \S+ token
_SQL_SENTENCES = r"""
WITH segs AS (
  SELECT doc_id,
         unnest(regexp_split_to_array(coalesce(text, ''), '[.!?]+')) AS seg
  FROM documents
),
st AS (
  SELECT doc_id, length(regexp_extract_all(seg, '\S+')) AS t FROM segs
),
nz AS (SELECT doc_id, t FROM st WHERE t > 0)
SELECT d.doc_id,
       coalesce(count(nz.t), 0)::BIGINT AS n_sentences,
       coalesce(max(nz.t), 0)::BIGINT AS max_sentence_tokens,
       coalesce(sum(nz.t), 0)::BIGINT AS sum_sentence_tokens
FROM documents d LEFT JOIN nz ON d.doc_id = nz.doc_id
GROUP BY d.doc_id
"""

QUERIES["text_sentences"] = q_text_sentences
ORACLES["text_sentences"] = _SQL_SENTENCES


def q_docs_expectations(sf_dir: str):
    """Data-quality expectations gate (stages/expect.expectations):
    six rules over documents — five row-local rules in one streaming
    scan, one bucketed exact-distinct for the uniqueness rule."""
    from ..stages.expect import expectations

    return expectations(
        _docs(sf_dir),
        [
            ("doc_id_unique", "unique", "doc_id"),
            ("lang_in_set", "in_set", "lang", {"en", "de", "fr"}),
            ("n_chars_between", "between", "n_chars", 64, 100_000),
            ("n_chars_consistent", "custom",
             lambda df: df["text"].fillna("").str.len().to_numpy()
             != df["n_chars"].to_numpy()),
            ("source_matches", "matches", "source", r"src[0-9]+"),
            ("text_not_null", "not_null", "text"),
        ],
    )


_SQL_EXPECTATIONS = """
SELECT * FROM (
  -- violations = rows − distinct values, NULL counting as ONE distinct
  -- value (count(DISTINCT) skips NULLs, hence the (any nulls)::INT term)
  SELECT 'doc_id_unique' AS rule, count(*)::BIGINT AS n_checked,
         (count(*) - count(DISTINCT doc_id)
          - (count(*) FILTER (WHERE doc_id IS NULL) > 0)::INT
         )::BIGINT AS n_violations
  FROM documents
  UNION ALL
  SELECT 'lang_in_set', count(*),
         count(*) FILTER (WHERE lang IS NULL
                          OR lang NOT IN ('en', 'de', 'fr'))
  FROM documents
  UNION ALL
  SELECT 'n_chars_between', count(*),
         count(*) FILTER (WHERE n_chars IS NULL OR n_chars < 64
                          OR n_chars > 100000)
  FROM documents
  UNION ALL
  SELECT 'n_chars_consistent', count(*),
         count(*) FILTER (WHERE length(coalesce(text, '')) <> n_chars
                          OR n_chars IS NULL)
  FROM documents
  UNION ALL
  SELECT 'source_matches', count(*),
         count(*) FILTER (
           WHERE NOT regexp_full_match(coalesce(source, ''), 'src[0-9]+'))
  FROM documents
  UNION ALL
  SELECT 'text_not_null', count(*),
         count(*) FILTER (WHERE text IS NULL)
  FROM documents
) ORDER BY rule
"""

QUERIES["docs_expectations"] = q_docs_expectations
ORACLES["docs_expectations"] = _SQL_EXPECTATIONS


def q_pq_recall(sf_dir: str):
    """Product-quantization ANN (stages/embedding.PQIndex: 8×16
    subspace codebooks, ADC lookup-table scan, exact block rerank)
    graded like knn_ivf_recall by a recall bound: per query,
    |PQ top-5 ∩ exact top-5| ≥ 4.  The oracle predicts all-true."""
    embs = _embs(sf_dir)
    exact = E.knn_topk(embs, query_ids=list(range(10)), k=5)
    pq = E.pq_topk(embs, query_ids=list(range(10)), k=5)
    ex = exact.groupby("query_id")["neighbor_id"].apply(set)
    pv = pq.groupby("query_id")["neighbor_id"].apply(set)
    qids = sorted(ex.index)
    return pd.DataFrame(
        {
            "query_id": pd.array(qids, dtype="int64"),
            "recall_ok": [len(ex[q] & pv.get(q, set())) >= 4 for q in qids],
        }
    )


_SQL_PQ_RECALL = """
SELECT vec_id::BIGINT AS query_id, true AS recall_ok
FROM embeddings WHERE vec_id < 10
"""

QUERIES["knn_pq_recall"] = q_pq_recall
ORACLES["knn_pq_recall"] = _SQL_PQ_RECALL


_EVENT_TYPES = ("click", "error", "purchase", "signup", "view")


def q_events_pivot(sf_dir: str):
    """Long→wide pivot: per-user event-type count matrix (the feature
    table a churn model trains on).  Map-side combine — each batch emits
    one partially-aggregated row per user seen — then one bucketed sum
    over users; the pivot itself is vectorized crosstab arithmetic, and
    the column set is FIXED (declared types), so the schema is stable
    regardless of which types a shard happens to contain."""
    import ray.data as rd

    from ..util import bucket_sum

    ds = rd.read_parquet(
        f"{sf_dir}/events.parquet", columns=["user_id", "event_type"]
    )

    def partial(df: pd.DataFrame) -> pd.DataFrame:
        ct = pd.crosstab(df["user_id"].astype("int64"), df["event_type"])
        out = pd.DataFrame({"user_id": ct.index.astype("int64")})
        for t in _EVENT_TYPES:
            out[f"n_{t}"] = (
                ct[t].to_numpy() if t in ct.columns else 0
            )
            out[f"n_{t}"] = out[f"n_{t}"].astype("int64")
        return out.reset_index(drop=True)

    return bucket_sum(
        ds.map_batches(partial, batch_format="pandas"),
        ["user_id"],
        [f"n_{t}" for t in _EVENT_TYPES],
    )


_SQL_EVENTS_PIVOT = """
SELECT user_id::BIGINT AS user_id,
       count(*) FILTER (WHERE event_type = 'click')::BIGINT AS n_click,
       count(*) FILTER (WHERE event_type = 'error')::BIGINT AS n_error,
       count(*) FILTER (WHERE event_type = 'purchase')::BIGINT AS n_purchase,
       count(*) FILTER (WHERE event_type = 'signup')::BIGINT AS n_signup,
       count(*) FILTER (WHERE event_type = 'view')::BIGINT AS n_view
FROM events GROUP BY user_id
"""

QUERIES["events_pivot"] = q_events_pivot
ORACLES["events_pivot"] = _SQL_EVENTS_PIVOT


def q_docs_split_counts(sf_dir: str):
    """Reproducible train/val/test assignment: split =
    md5(doc_id || ':split') % 100 → train < 80 ≤ val < 90 ≤ test — a
    pure per-row hash, so the assignment is identical across cluster
    sizes, retries and shards (never random_shuffle + slice, which is
    neither stable nor resumable).  Reported as per-(source, split)
    counts via map-side combine + one tiny groupby."""
    from ..stages.dedup import _md5_u64
    from ..util import bucket_sum

    def partial(df: pd.DataFrame) -> pd.DataFrame:
        h = pd.Series(
            [_md5_u64(f"{int(i)}:split") % 100 for i in df["doc_id"]],
            index=df.index,
        )
        split = pd.Series(
            np.where(h < 80, "train", np.where(h < 90, "val", "test")),
            index=df.index,
        )
        g = (
            pd.DataFrame({"source": df["source"], "split": split})
            .groupby(["source", "split"], sort=False)
            .size()
            .reset_index(name="n")
        )
        return g.astype({"source": "string", "split": "string", "n": "int64"})

    return bucket_sum(
        _docs(sf_dir).map_batches(partial, batch_format="pandas"),
        ["source", "split"],
        ["n"],
    )


_SQL_SPLIT_COUNTS = """
WITH s AS (
  SELECT source,
         md5_number_lower(doc_id::VARCHAR || ':split') % 100 AS h
  FROM documents
)
SELECT source,
       CASE WHEN h < 80 THEN 'train'
            WHEN h < 90 THEN 'val' ELSE 'test' END AS split,
       count(*)::BIGINT AS n
FROM s GROUP BY 1, 2
"""

QUERIES["docs_split_counts"] = q_docs_split_counts
ORACLES["docs_split_counts"] = _SQL_SPLIT_COUNTS


def q_docs_split_leakage_safe(sf_dir: str):
    """LEAKAGE-SAFE train/val/test assignment: the hash split key is the
    near-dup CLUSTER id (stages/dedup.jaccard_clusters), not the doc id,
    so a near-duplicate pair can never straddle train and test — the
    cluster-aware eval-contamination guard every dedup paper recommends
    over per-doc hashing.  Same stable-hash rule as docs_split_counts
    (md5(key || ':split') % 100 → 80/10/10), applied per cluster."""
    from ..stages.dedup import _md5_u64

    clusters = D.jaccard_clusters(_docs(sf_dir))

    def assign(df: pd.DataFrame) -> pd.DataFrame:
        if not len(df):
            return pd.DataFrame(
                {
                    "doc_id": pd.Series(dtype="int64"),
                    "cluster_id": pd.Series(dtype="int64"),
                    "split": pd.Series(dtype="string"),
                }
            )
        # memoized per batch: cluster ids repeat by construction
        memo = {
            int(c): _md5_u64(f"{int(c)}:split") % 100
            for c in df["cluster_id"].unique()
        }
        h = df["cluster_id"].map(memo).to_numpy()
        out = df[["doc_id", "cluster_id"]].astype("int64").copy()
        out["split"] = pd.Series(
            np.where(h < 80, "train", np.where(h < 90, "val", "test")),
            index=df.index,
        ).astype("string")
        return out

    return clusters.map_batches(assign, batch_format="pandas")


_SQL_SPLIT_LEAKAGE_SAFE = f"""
SELECT doc_id, cluster_id,
       CASE WHEN md5_number_lower(cluster_id::VARCHAR || ':split') % 100 < 80
            THEN 'train'
            WHEN md5_number_lower(cluster_id::VARCHAR || ':split') % 100 < 90
            THEN 'val' ELSE 'test' END AS split
FROM ({_cc_sql(
    pairs_ctes=f"{_JACCARD_W_CTE},{chr(10)}p AS ({_JACCARD_PAIRS_SELECT})",
    base_table="documents",
    id_col="doc_id",
)}) cl
"""

QUERIES["docs_split_leakage_safe"] = q_docs_split_leakage_safe
ORACLES["docs_split_leakage_safe"] = _SQL_SPLIT_LEAKAGE_SAFE


def q_docs_quality_buckets(sf_dir: str):
    """CCNet-style corpus bucketing: every document lands in
    head/middle/tail by GLOBAL terciles of an integer quality score
    (stop-word permille — higher reads as more natural English; CCNet
    uses LM perplexity, the bucketing mechanics are identical).  The
    score domain is bounded (0..1000), so the terciles come from the
    counting-histogram + integer lower-index rule (no distributed
    sort), and assignment is one broadcast-threshold map — the 100-TB
    shape doc_len_quantiles established."""
    from ..functions.text import quality_scores
    from ..util import bucket_sum

    def score(df: pd.DataFrame) -> pd.DataFrame:
        q = quality_scores(df)
        tok = np.maximum(q["n_tokens"].to_numpy(dtype=np.int64), 1)
        s = 1000 * q["n_stopwords"].to_numpy(dtype=np.int64) // tok
        return pd.DataFrame(
            {
                "doc_id": q["doc_id"].astype("int64"),
                "score": s.astype("int64"),
            }
        )

    scored = (
        _docs(sf_dir).map_batches(score, batch_format="pandas").materialize()
    )
    hist = (
        bucket_sum(
            scored.map_batches(
                lambda df: df.groupby("score", as_index=False)
                .size()
                .rename(columns={"size": "n"}),
                batch_format="pandas",
            ),
            ["score"],
            ["n"],
        )
        .to_pandas()
        .sort_values("score")
    )
    cum = hist["n"].to_numpy().cumsum()
    n = int(cum[-1])
    vals = hist["score"].to_numpy()
    t33 = int(vals[np.searchsorted(cum, (n - 1) * 33 // 100 + 1)])
    t66 = int(vals[np.searchsorted(cum, (n - 1) * 66 // 100 + 1)])

    def assign(df: pd.DataFrame, t33=t33, t66=t66) -> pd.DataFrame:
        s = df["score"].to_numpy()
        out = df[["doc_id", "score"]].copy()
        out["bucket"] = pd.Series(
            np.where(s > t66, "head", np.where(s > t33, "middle", "tail")),
            index=df.index,
        ).astype("string")
        return out

    return scored.map_batches(assign, batch_format="pandas")


_SQL_QUALITY_BUCKETS = r"""
WITH t AS (
  SELECT doc_id,
         length(regexp_extract_all(coalesce(text, ''), '\S+')) AS n_tokens,
         length(regexp_extract_all(coalesce(text, ''),
                '\b(?:the|and|of|to|a|in|is|for)\b')) AS n_stop
  FROM documents
),
s AS (SELECT doc_id, (1000 * n_stop) // greatest(n_tokens, 1) AS score FROM t),
o AS (SELECT score, row_number() OVER (ORDER BY score) AS rn,
             count(*) OVER () AS n FROM s),
th AS (SELECT
   max(CASE WHEN rn = (n - 1) * 33 // 100 + 1 THEN score END) AS t33,
   max(CASE WHEN rn = (n - 1) * 66 // 100 + 1 THEN score END) AS t66
 FROM o)
SELECT doc_id::BIGINT AS doc_id, score::BIGINT AS score,
       CASE WHEN score > t66 THEN 'head'
            WHEN score > t33 THEN 'middle' ELSE 'tail' END AS bucket
FROM s, th
"""

QUERIES["docs_quality_buckets"] = q_docs_quality_buckets
ORACLES["docs_quality_buckets"] = _SQL_QUALITY_BUCKETS


def q_multimodal_sniff(sf_dir: str):
    """Header-only media metadata scan — the 100-TB shape for a
    metadata pass: dimensions / rate / frame counts come from fixed-
    offset header reads (BMP info header, RIFF chunk walk, NBV index),
    NO pixel or sample ever decodes.  One stateless map over the union
    of all three payload types."""
    import struct

    docs = _docs(sf_dir)
    parts = [
        M.attach_payload(docs, media=m) for m in ("bmp", "wav", "nbv")
    ]
    ds = parts[0].union(parts[1]).union(parts[2])

    def sniff(df: pd.DataFrame) -> pd.DataFrame:
        m1, m2 = [], []
        for p, mt in zip(df["payload"], df["media_type"]):
            b = bytes(p)
            if mt == "image/bmp":
                _, w, h = struct.unpack_from("<Iii", b, 14)
                m1.append(w)
                m2.append(abs(h))
            elif mt == "audio/wav":
                rate, nsamp, pos = 0, 0, 12
                while pos + 8 <= len(b):
                    cid, size = struct.unpack_from("<4sI", b, pos)
                    pos += 8
                    if cid == b"fmt ":
                        rate = struct.unpack_from("<I", b, pos + 4)[0]
                    elif cid == b"data":
                        nsamp = size // 2
                    pos += size + (size & 1)
                m1.append(rate)
                m2.append(nsamp)
            elif mt == "video/x-nbv":
                (n,) = struct.unpack_from("<I", b, 4)
                (first,) = struct.unpack_from("<I", b, 8)
                m1.append(n)
                m2.append(first)
            else:
                raise ValueError(f"unknown media {mt!r}")
        return pd.DataFrame(
            {
                "doc_id": df["doc_id"].astype("int64"),
                "media_type": df["media_type"].astype("string"),
                "n_bytes": df["n_bytes"].astype("int64"),
                "meta1": pd.Series(m1, dtype="int64", index=df.index),
                "meta2": pd.Series(m2, dtype="int64", index=df.index),
            }
        )

    return ds.map_batches(sniff, batch_format="pandas")


# every header field is pure text-length arithmetic: BMP row stride is
# padded to 4 bytes; WAV n = max(64, min(4000, 4*len)); the NBV clip is
# 4 frames of the constant 8x8 BMP (54 + 24*8 = 246 bytes each)
_SQL_MULTIMODAL_SNIFF = """
WITH d AS (SELECT doc_id, length(coalesce(text, '')) AS len FROM documents),
b AS (
  SELECT doc_id, len,
         greatest(4, least(32, floor(sqrt(len))::INT)) AS side
  FROM d
)
SELECT doc_id::BIGINT AS doc_id, 'image/bmp' AS media_type,
       (54 + ((side * 3 + 3) // 4) * 4 * side)::BIGINT AS n_bytes,
       side::BIGINT AS meta1, side::BIGINT AS meta2
FROM b
UNION ALL
SELECT doc_id::BIGINT, 'audio/wav',
       (44 + 2 * greatest(64, least(4000, 4 * len)))::BIGINT,
       8000::BIGINT, greatest(64, least(4000, 4 * len))::BIGINT
FROM d
UNION ALL
SELECT doc_id::BIGINT, 'video/x-nbv', 1008::BIGINT, 4::BIGINT, 246::BIGINT
FROM d
"""

QUERIES["multimodal_sniff"] = q_multimodal_sniff
ORACLES["multimodal_sniff"] = _SQL_MULTIMODAL_SNIFF


def q_docs_domain_topk(sf_dir: str):
    """URL/domain profiling (the domain-filter pass of a web-scale
    pretraining pipeline) over a derived URL-bearing corpus: every doc
    gets deterministic URLs appended (pure doc_id arithmetic, the PII-
    corpus trick), domains regex-extract map-side, count through ONE
    bucketed sum, and the top 10 (count DESC, domain) resolve on the
    driver — domain cardinality is bounded, so only (domain, partial
    count) rows ever shuffle."""
    import re

    from ..util import bucket_sum

    rx = re.compile(r"https?://([A-Za-z0-9.\-]+)", re.ASCII)

    def partial(df: pd.DataFrame) -> pd.DataFrame:
        d = df["doc_id"].astype("int64")
        # regex-scan ONLY the synthesized URL string: the oracle derives
        # domains from doc_id arithmetic and cannot see free text, so a
        # corpus whose text happens to contain URLs must not leak extra
        # domains into the Ray side
        t = (
            " http://w" + (d % 37).astype(str) + ".example.org/p/"
            + d.astype(str)
        )
        extra = " https://w" + (d % 11).astype(str) + ".example.net/q"
        t = t + pd.Series(
            np.where(d % 3 == 0, extra, ""), index=df.index
        )
        doms = t.str.findall(rx).explode().dropna()
        g = doms.value_counts()
        return pd.DataFrame(
            {
                "domain": pd.Series(g.index, dtype="string"),
                "n": g.to_numpy().astype("int64"),
            }
        )

    agg = bucket_sum(
        _docs(sf_dir)
        .select_columns(["doc_id"])
        .map_batches(partial, batch_format="pandas"),
        ["domain"],
        ["n"],
    )

    # counts are final after the bucketed sum, so the global top-10 ⊆
    # union of per-block top-10s — only buckets × 10 candidate rows
    # ever reach the driver (vocab_topk's pattern), never the
    # domain-cardinality table
    def block_topk(df: pd.DataFrame) -> pd.DataFrame:
        return df.sort_values(["n", "domain"], ascending=[False, True]).head(10)

    cands = agg.map_batches(block_topk, batch_format="pandas").to_pandas()
    if not len(cands):
        return pd.DataFrame(
            {"domain": pd.Series(dtype="string"), "n": pd.Series(dtype="int64")}
        )
    out = (
        cands.sort_values(["n", "domain"], ascending=[False, True])
        .head(10)
        .reset_index(drop=True)
    )
    return out.astype({"domain": "string", "n": "int64"})


_SQL_DOMAIN_TOPK = """
WITH d AS (SELECT doc_id FROM documents),
doms AS (
  SELECT 'w' || (doc_id % 37) || '.example.org' AS domain FROM d
  UNION ALL
  SELECT 'w' || (doc_id % 11) || '.example.net' FROM d WHERE doc_id % 3 = 0
),
c AS (SELECT domain, count(*)::BIGINT AS n FROM doms GROUP BY 1)
SELECT domain, n FROM c
QUALIFY row_number() OVER (ORDER BY n DESC, domain) <= 10
"""

QUERIES["docs_domain_topk"] = q_docs_domain_topk
ORACLES["docs_domain_topk"] = _SQL_DOMAIN_TOPK


def q_multimodal_audio_vad(sf_dir: str):
    """REAL audio analysis, value-exact: text → PCM16 WAV → actor-pool
    frame-energy voice-activity detection (stages/multimodal.AudioVAD —
    |sample| sums per 64-sample frame, integer threshold).  The oracle
    recomputes every frame energy from the text bytes."""
    payloads = M.attach_payload(_docs(sf_dir), media="wav")
    return M.audio_vad(payloads)


# sample m = 256*(byte(m % len) - 128); frame f covers m in
# [64f, 64f+63], full frames only (n // 64 of them, n >= 64 always)
_SQL_AUDIO_VAD = """
WITH d AS (
  SELECT doc_id, text, length(text) AS len,
         greatest(64, least(4000, 4 * length(text))) AS n
  FROM documents
),
f AS (
  SELECT doc_id, u.f AS frame,
         list_sum(list_transform(generate_series(u.f * 64, u.f * 64 + 63),
            m -> abs(256 * (ascii(substr(text, m % len + 1, 1)) - 128))))
           AS energy
  FROM d, unnest(generate_series(0, n // 64 - 1)) AS u(f)
)
SELECT doc_id::BIGINT AS doc_id, count(*)::BIGINT AS n_frames,
       (count(*) FILTER (WHERE energy > 800000))::BIGINT AS n_active,
       sum(energy)::BIGINT AS total_energy
FROM f GROUP BY doc_id
"""

QUERIES["multimodal_audio_vad"] = q_multimodal_audio_vad
ORACLES["multimodal_audio_vad"] = _SQL_AUDIO_VAD


def q_multimodal_image_tiles(sf_dir: str):
    """REAL 2×2 spatial pooling, value-exact: text → BMP → actor-pool
    decode → integer quadrant pixel sums (stages/multimodal.ImageTiles)
    — the pooling pass of a vision feature extractor; the oracle
    re-derives every quadrant sum from the cycled text bytes."""
    payloads = M.attach_payload(_docs(sf_dir), media="bmp")
    return M.image_tiles(payloads)


# byte j of the side²·3 pixel buffer: pixel p = j//3 at (r, c) =
# (p//side, p%side), quadrant (r·2//side)·2 + (c·2//side)
_SQL_IMAGE_TILES = """
WITH d AS (
  SELECT doc_id, coalesce(text, '') AS text,
         length(coalesce(text, '')) AS n,
         greatest(4, least(32, floor(sqrt(length(coalesce(text, ''))))::INT))
           AS side
  FROM documents
),
p2 AS (SELECT doc_id, text, n, side, side * side * 3 AS total FROM d),
b AS (
  SELECT doc_id,
         (((j // 3) // side) * 2 // side) * 2
           + (((j // 3) % side) * 2 // side) AS tile,
         CASE WHEN n = 0 THEN 0
              ELSE ascii(substr(text, ((j % n) + 1)::INT, 1)) END AS v
  FROM p2, unnest(generate_series(0, total - 1)) AS t(j)
)
SELECT doc_id::BIGINT AS doc_id, tile::BIGINT AS tile,
       sum(v)::BIGINT AS px_sum
FROM b GROUP BY 1, 2
"""

QUERIES["multimodal_image_tiles"] = q_multimodal_image_tiles
ORACLES["multimodal_image_tiles"] = _SQL_IMAGE_TILES


def q_multimodal_scene_cuts(sf_dir: str):
    """REAL video shot-boundary detection, value-exact: NBV clip →
    stride-1 real frame sampling → per-frame integer pixel sums → a cut
    when |Δsum| between consecutive frames beats the threshold
    (stages/multimodal.SceneCuts).  TWO actor pools share the plan —
    split the budget."""
    from ..util import stage_concurrency

    c = stage_concurrency(2)
    payloads = M.attach_payload(_docs(sf_dir), media="nbv")
    sampled = M.sample_frames(payloads, stride=1, mode="real", concurrency=c)
    return M.scene_cuts(sampled, concurrency=c)


# frame k (k = 0..3) pixels = np.resize(bytes[k:], 192): cycled prefix
# sums, then window deltas over k
_SQL_SCENE_CUTS = """
WITH d AS (SELECT doc_id, text, length(text) AS len FROM documents),
f AS (
  SELECT doc_id, u.k, len - u.k AS lk, text
  FROM d, unnest([0, 1, 2, 3]) AS u(k)
),
s AS (
  SELECT doc_id, k,
         (192 // lk) * list_sum(list_transform(
             generate_series(k + 1, k + lk),
             i -> ascii(substr(text, i, 1))))
         + coalesce(list_sum(list_transform(
             generate_series(k + 1, k + (192 % lk)),
             i -> ascii(substr(text, i, 1)))), 0) AS fsum
  FROM f
),
dl AS (
  SELECT doc_id,
         abs(fsum - lag(fsum) OVER (PARTITION BY doc_id ORDER BY k)) AS delta
  FROM s
)
SELECT doc_id::BIGINT AS doc_id,
       (count(*) FILTER (WHERE delta > 150))::BIGINT AS n_cuts,
       max(delta)::BIGINT AS max_delta
FROM dl WHERE delta IS NOT NULL GROUP BY doc_id
"""

QUERIES["multimodal_scene_cuts"] = q_multimodal_scene_cuts
ORACLES["multimodal_scene_cuts"] = _SQL_SCENE_CUTS


def q_dedup_lsh_recall(sf_dir: str):
    """Approximation audit: the MinHash-LSH pair set measured against
    the EXACT global Jaccard join (PPJoin) on the SAME shingle space
    and threshold (3-shingles, J ≥ 0.7) — (n_true, n_lsh, n_common,
    recall_pct), the audit a dedup-pipeline owner runs before trusting
    LSH at corpus scale.  Both mechanisms and their intersection are
    deterministic, so the whole measurement is exact-oracled through
    the two SQL twins."""
    from ..util import heal_schema, join_partitions

    truth = D.ppjoin_pairs(
        _docs(sf_dir), threshold_num=7, threshold_den=10, shingle_k=3
    ).materialize()
    est = D.minhash_lsh_pairs(_docs(sf_dir), threshold=0.7).materialize()
    n_true = truth.count()
    n_lsh = est.count()
    if n_true and n_lsh:
        jp = join_partitions(None)
        est2 = est.map_batches(
            lambda df: df[["doc_id_a", "doc_id_b"]], batch_format="pandas"
        )
        n_common = (
            heal_schema(truth, jp)
            .join(heal_schema(est2, jp), "inner", jp,
                  on=("doc_id_a", "doc_id_b"))
            .count()
        )
    else:
        n_common = 0
    recall = 100 if n_true == 0 else 100 * n_common // n_true
    return pd.DataFrame(
        {
            "n_true": [n_true],
            "n_lsh": [n_lsh],
            "n_common": [n_common],
            "recall_pct": [recall],
        }
    ).astype("int64")


_SQL_LSH_RECALL = f"""
WITH t AS (SELECT doc_id_a, doc_id_b FROM ({_SQL_PPJOIN})),
e AS (SELECT doc_id_a, doc_id_b FROM ({_SQL_MINHASH_PAIRS})),
c AS (SELECT count(*) AS n FROM t JOIN e USING (doc_id_a, doc_id_b)),
nt AS (SELECT count(*) AS n FROM t),
ne AS (SELECT count(*) AS n FROM e)
SELECT nt.n::BIGINT AS n_true, ne.n::BIGINT AS n_lsh,
       c.n::BIGINT AS n_common,
       (CASE WHEN nt.n = 0 THEN 100
             ELSE 100 * c.n // nt.n END)::BIGINT AS recall_pct
FROM nt, ne, c
"""

QUERIES["dedup_lsh_recall"] = q_dedup_lsh_recall
ORACLES["dedup_lsh_recall"] = _SQL_LSH_RECALL


def q_docs_lang_mix(sf_dir: str):
    """Language-mix curation report: per (source, predicted language)
    document counts — the lang-id kernel composed with a map-side
    combine; the per-language sampling-budget table a multilingual
    pipeline balances against."""
    from ..functions.text import lang_id
    from ..util import bucket_sum

    def partial(df: pd.DataFrame) -> pd.DataFrame:
        lp = lang_id(df)["lang_pred"]
        g = (
            pd.DataFrame(
                {
                    "source": df["source"].astype("string"),
                    "lang": lp.astype("string").to_numpy(),
                }
            )
            .groupby(["source", "lang"], as_index=False)
            .size()
            .rename(columns={"size": "n"})
        )
        return g.astype({"n": "int64"})

    return bucket_sum(
        _docs(sf_dir).map_batches(partial, batch_format="pandas"),
        ["source", "lang"],
        ["n"],
    )


_SQL_LANG_MIX = f"""
WITH lid AS ({_SQL_LANG_ID})
SELECT d.source, lid.lang_pred AS lang, count(*)::BIGINT AS n
FROM lid JOIN documents d USING (doc_id)
GROUP BY 1, 2
"""

QUERIES["docs_lang_mix"] = q_docs_lang_mix
ORACLES["docs_lang_mix"] = _SQL_LANG_MIX


_RV_SHARDS = 8  # shared by the Ray side and the oracle SQL — no drift


def q_docs_rendezvous_shards(sf_dir: str, n_shards: int = _RV_SHARDS):
    """Rendezvous (highest-random-weight) shard assignment: doc →
    argmax over shards of md5(doc:shard).  Adding or removing a shard
    moves ONLY the docs whose argmax changes (1/n in expectation),
    unlike mod-N hashing which reshuffles everything — the
    resharding-stable placement rule a growing corpus store wants.
    Pure per-row hashing, map-only; ties break to the smaller shard id
    on both sides."""
    from ..stages.dedup import _md5_u64

    def assign(df: pd.DataFrame) -> pd.DataFrame:
        ids = df["doc_id"].astype("int64").to_numpy()
        # build each doc's "doc:" prefix ONCE, not once per shard
        prefixes = [f"{d}:" for d in ids]
        hs = np.stack(
            [
                np.fromiter(
                    (_md5_u64(p + ss) for p in prefixes),
                    dtype=np.uint64,
                    count=len(prefixes),
                )
                for ss in (str(s) for s in range(n_shards))
            ],
            axis=1,
        )
        return pd.DataFrame(
            {
                "doc_id": pd.Series(ids, dtype="int64", index=df.index),
                "shard": pd.Series(
                    hs.argmax(axis=1).astype("int64"), index=df.index
                ),
            }
        )

    return _docs(sf_dir).map_batches(assign, batch_format="pandas")


_SQL_RENDEZVOUS = f"""
WITH e AS (
  SELECT doc_id, s,
         md5_number_lower(doc_id::VARCHAR || ':' || s) AS h
  FROM documents, unnest(generate_series(0, {_RV_SHARDS - 1})) t(s)
)
SELECT doc_id::BIGINT AS doc_id, s::BIGINT AS shard
FROM e QUALIFY row_number() OVER (PARTITION BY doc_id ORDER BY h DESC, s) = 1
"""

QUERIES["docs_rendezvous_shards"] = q_docs_rendezvous_shards
ORACLES["docs_rendezvous_shards"] = _SQL_RENDEZVOUS


def q_docs_ngram_novelty(sf_dir: str):
    """First-occurrence novelty scoring: each doc's DISTINCT 8-gram
    shingles split into NOVEL (this doc is the corpus-min doc_id owner
    of the shingle) vs seen-before; novelty = permille of novel
    shingles — the freshness signal a curation pipeline uses to
    down-weight recycled text (docs shorter than one shingle are
    vacuously novel).  Distinct (doc, shingle) pairs map-side → ONE
    bucketed min per shingle → hash join back → per-doc counts;
    shingle-scale keys never reach a Ray aggregate."""
    from ..stages.dedup import _md5_u64_cached, tokens
    from ..util import bucket_agg, bucket_sum, heal_schema, join_partitions

    B61 = 1 << 61
    docs = _docs(sf_dir)

    def pairs(df: pd.DataFrame) -> pd.DataFrame:
        out_id: list[int] = []
        out_h: list[int] = []
        for i, t in zip(df["doc_id"].astype("int64"), df["text"].fillna("")):
            toks = tokens(t)
            hs = {
                _md5_u64_cached(" ".join(toks[p : p + 8])) % B61
                for p in range(len(toks) - 7)
            }
            out_id.extend([int(i)] * len(hs))
            out_h.extend(hs)
        return pd.DataFrame(
            {
                "doc_id": pd.Series(out_id, dtype="int64"),
                "h": pd.Series(out_h, dtype="int64"),
            }
        )

    prs = docs.map_batches(pairs, batch_format="pandas").materialize()
    owner = bucket_agg(
        prs,
        ["h"],
        lambda df: df.groupby("h", as_index=False)["doc_id"]
        .min()
        .rename(columns={"doc_id": "owner"}),
    )
    jp = join_partitions(None)
    joined = heal_schema(prs, jp).join(
        heal_schema(owner, jp), "inner", jp, on=("h",)
    )

    def partial(df: pd.DataFrame) -> pd.DataFrame:
        g = pd.DataFrame(
            {
                "doc_id": df["doc_id"].astype("int64"),
                "n_shingles": np.ones(len(df), dtype="int64"),
                "n_novel": (df["doc_id"] == df["owner"]).to_numpy()
                .astype("int64"),
            }
        ).groupby("doc_id", as_index=False).sum()
        return g.astype("int64")

    counts = bucket_sum(
        joined.map_batches(partial, batch_format="pandas"),
        ["doc_id"],
        ["n_shingles", "n_novel"],
    )
    ids = docs.map_batches(
        lambda df: pd.DataFrame({"doc_id": df["doc_id"].astype("int64")}),
        batch_format="pandas",
    )

    def finish(df: pd.DataFrame) -> pd.DataFrame:
        cols = ("n_shingles", "n_novel")
        if not len(df):
            return pd.DataFrame(
                {
                    "doc_id": pd.Series(dtype="int64"),
                    "n_shingles": pd.Series(dtype="int64"),
                    "n_novel": pd.Series(dtype="int64"),
                    "novelty_permille": pd.Series(dtype="int64"),
                }
            )
        out = pd.DataFrame({"doc_id": df["doc_id"].astype("int64")})
        for c in cols:
            out[c] = (
                df[c].fillna(0).astype("int64")
                if c in df.columns
                else np.int64(0)
            )
        n = out["n_shingles"].to_numpy()
        nov = out["n_novel"].to_numpy()
        out["novelty_permille"] = np.where(
            n == 0, 1000, 1000 * nov // np.maximum(n, 1)
        ).astype("int64")
        return out

    return (
        heal_schema(ids, jp)
        .join(heal_schema(counts, jp), "left_outer", jp, on=("doc_id",))
        .map_batches(finish, batch_format="pandas")
    )


_SQL_NGRAM_NOVELTY = rf"""
WITH toks AS (
  SELECT doc_id, regexp_extract_all(coalesce(text, ''), '\S+') AS w
  FROM documents
),
sh AS (
  SELECT DISTINCT doc_id,
         (md5_number_lower(array_to_string(w[i:i + 7], ' '))
            % {_B61})::BIGINT AS h
  FROM (
    SELECT doc_id, w, unnest(generate_series(1, length(w) - 7)) AS i
    FROM toks
  )
),
own AS (SELECT h, min(doc_id) AS owner FROM sh GROUP BY h),
cnt AS (
  SELECT sh.doc_id,
         count(*) AS n_shingles,
         (count(*) FILTER (WHERE own.owner = sh.doc_id)) AS n_novel
  FROM sh JOIN own USING (h) GROUP BY 1
)
SELECT d.doc_id::BIGINT AS doc_id,
       coalesce(cnt.n_shingles, 0)::BIGINT AS n_shingles,
       coalesce(cnt.n_novel, 0)::BIGINT AS n_novel,
       (CASE WHEN coalesce(cnt.n_shingles, 0) = 0 THEN 1000
             ELSE 1000 * cnt.n_novel // cnt.n_shingles END)::BIGINT
         AS novelty_permille
FROM documents d LEFT JOIN cnt ON cnt.doc_id = d.doc_id
"""

QUERIES["docs_ngram_novelty"] = q_docs_ngram_novelty
ORACLES["docs_ngram_novelty"] = _SQL_NGRAM_NOVELTY


def q_docs_profile(sf_dir: str):
    """Catalog-style column profile over documents
    (stages/expect.table_profile): per column — rows, nulls, exact
    distinct (one combined bucketed distinct for all columns),
    lexicographic min/max of the string form."""
    from ..stages.expect import table_profile

    return table_profile(
        _docs(sf_dir), ["doc_id", "lang", "source", "n_chars"]
    )


# min/max compare the VARCHAR form (binary collation == Python code
# points for this ASCII data); count(DISTINCT) skips NULLs on both sides
_SQL_DOCS_PROFILE = """
SELECT * FROM (
  SELECT 'doc_id' AS col_name, count(*)::BIGINT AS n_rows,
         count(*) FILTER (WHERE doc_id IS NULL)::BIGINT AS n_nulls,
         count(DISTINCT doc_id)::BIGINT AS n_distinct,
         min(doc_id::VARCHAR) AS min_str, max(doc_id::VARCHAR) AS max_str
  FROM documents
  UNION ALL
  SELECT 'lang', count(*), count(*) FILTER (WHERE lang IS NULL),
         count(DISTINCT lang), min(lang), max(lang)
  FROM documents
  UNION ALL
  SELECT 'source', count(*), count(*) FILTER (WHERE source IS NULL),
         count(DISTINCT source), min(source), max(source)
  FROM documents
  UNION ALL
  SELECT 'n_chars', count(*), count(*) FILTER (WHERE n_chars IS NULL),
         count(DISTINCT n_chars),
         min(n_chars::VARCHAR), max(n_chars::VARCHAR)
  FROM documents
) ORDER BY col_name
"""

QUERIES["docs_profile"] = q_docs_profile
ORACLES["docs_profile"] = _SQL_DOCS_PROFILE


def q_docs_gopher_filter(sf_dir: str):
    """Gopher-style composite quality filter (functions/text.gopher_filter):
    per doc, one boolean per rule (word-count bounds, mean word length,
    symbol ratio, bullet/ellipsis line ratios, alpha-word fraction,
    stop-word presence) + the conjunction — map-only, flat-array
    reduceat reductions, integer-arithmetic thresholds so the SQL twin
    is bit-exact."""
    from ..functions.text import gopher_filter

    return _docs(sf_dir).map_batches(gopher_filter, batch_format="pandas")


# the Gopher-gate CTE block (word/line statistics feeding the rule
# arithmetic in functions/text.py:gopher_filter) — ONE definition shared
# by the docs_gopher_filter oracle and the composed corpus_build oracle,
# so a threshold change cannot silently desynchronize them
_SQL_GOPHER_CTES = r"""WITH d AS (SELECT doc_id, coalesce(text, '') AS text, source FROM documents),
toks AS (
  SELECT doc_id, unnest(regexp_extract_all(text, '\S+')) AS t FROM d
),
tstat AS (
  SELECT doc_id,
         count(*) AS n_words,
         sum(length(t)) AS sum_len,
         count(*) FILTER (WHERE regexp_matches(t, '[A-Za-z]')) AS n_alpha,
         count(DISTINCT lower(t)) FILTER (
           WHERE lower(t) IN ('and','be','have','of','that','the','to','with')
         ) AS n_stop
  FROM toks GROUP BY doc_id
),
lstat AS (
  SELECT doc_id,
         length(text) - length(replace(text, '#', ''))
           + len(regexp_extract_all(text, '\.\.\.')) AS n_sym,
         len(string_split(text, chr(10))) AS n_lines,
         len(regexp_extract_all(text, '(?m)^[-*]')) AS n_bullet,
         len(regexp_extract_all(text, '(?m)\.\.\.$')) AS n_ell
  FROM d
),
j AS (
  SELECT d.doc_id,
         coalesce(n_words, 0) AS w, coalesce(sum_len, 0) AS sl,
         coalesce(n_alpha, 0) AS na, coalesce(n_stop, 0) AS ns,
         n_sym, n_lines, n_bullet, n_ell
  FROM d LEFT JOIN tstat USING (doc_id) JOIN lstat USING (doc_id)
)"""

_SQL_GOPHER = rf"""
{_SQL_GOPHER_CTES}
SELECT doc_id, w::BIGINT AS n_words,
       (w >= 50 AND w <= 100000) AS r_nwords,
       (3 * w <= sl AND sl <= 10 * w) AS r_wordlen,
       (10 * n_sym <= w) AS r_sym,
       (10 * n_bullet <= 9 * n_lines) AS r_bullet,
       (10 * n_ell <= 3 * n_lines) AS r_ellipsis,
       (5 * na >= 4 * w) AS r_alpha,
       (ns >= 2) AS r_stop,
       (w >= 50 AND w <= 100000 AND 3 * w <= sl AND sl <= 10 * w
        AND 10 * n_sym <= w AND 10 * n_bullet <= 9 * n_lines
        AND 10 * n_ell <= 3 * n_lines AND 5 * na >= 4 * w
        AND ns >= 2) AS keep
FROM j
"""

QUERIES["docs_gopher_filter"] = q_docs_gopher_filter
ORACLES["docs_gopher_filter"] = _SQL_GOPHER


def q_multimodal_phash(sf_dir: str):
    """Perceptual block hash over REAL decoded BMP pixels
    (stages/multimodal.PHash): 64 floor-boundary pixel segments, bit =
    segment brighter than the image mean via cross-multiplied INTEGER
    compare — every bit (and the 4 x 16-bit LSH band keys) reproduced
    exactly by the SQL twin from the text bytes the encoder consumed.
    Bands are 8 x 8-bit (radius-7 pigeonhole)."""
    payloads = M.attach_payload(_docs(sf_dir), media="bmp")
    from ..stages.multimodal import phash_table

    return phash_table(payloads)


# pixel byte j (0-based, row-major RGB) = text byte j % n (np.resize
# cycling; ASCII corpus so ascii(substr) == the utf-8 byte); segment of
# byte j = (j*64)//total; bit i set iff seg_sum*total > all_sum*seg_len
_SQL_PHASH_CTE = """
d AS (
  SELECT doc_id, coalesce(text, '') AS text, length(coalesce(text, '')) AS n,
         greatest(4, least(32, floor(sqrt(length(coalesce(text, ''))))::INT))
           AS side
  FROM documents
),
p AS (SELECT doc_id, text, n, side * side * 3 AS total FROM d),
bytes AS (
  SELECT doc_id, (j * 64) // total AS seg,
         CASE WHEN n = 0 THEN 0
              ELSE ascii(substr(text, ((j % n) + 1)::INT, 1)) END AS v
  FROM p, unnest(generate_series(0, total - 1)) AS t(j)
),
segs AS (
  SELECT doc_id, seg, sum(v) AS s, count(*) AS l
  FROM bytes GROUP BY doc_id, seg
),
tots AS (SELECT doc_id, sum(v) AS ts, count(*) AS tl FROM bytes GROUP BY doc_id),
ph AS (
  SELECT segs.doc_id,
         sum(CASE WHEN s * tl > ts * l THEN (1::HUGEINT << seg::INT)
                  ELSE 0::HUGEINT END) AS u
  FROM segs JOIN tots USING (doc_id)
  GROUP BY segs.doc_id
)
"""

_SQL_PHASH = f"""
WITH {_SQL_PHASH_CTE}
SELECT doc_id,
       (CASE WHEN u >= 9223372036854775808 THEN u - 18446744073709551616
             ELSE u END)::BIGINT AS phash,
       (u % 256)::BIGINT AS band0, ((u >> 8) % 256)::BIGINT AS band1,
       ((u >> 16) % 256)::BIGINT AS band2, ((u >> 24) % 256)::BIGINT AS band3,
       ((u >> 32) % 256)::BIGINT AS band4, ((u >> 40) % 256)::BIGINT AS band5,
       ((u >> 48) % 256)::BIGINT AS band6, ((u >> 56) % 256)::BIGINT AS band7
FROM ph
"""

QUERIES["multimodal_phash"] = q_multimodal_phash
ORACLES["multimodal_phash"] = _SQL_PHASH


def q_multimodal_phash_pairs(sf_dir: str):
    """Near-duplicate IMAGE pairs (multimodal dedup): phash band-bucket
    candidates + exact SWAR-popcount verify at Hamming <= 7
    (stages/multimodal.phash_pairs).  The 8-band bucketing is
    pigeonhole-complete for that radius, so the pair set equals the
    oracle's all-pairs filter exactly."""
    payloads = M.attach_payload(_docs(sf_dir), media="bmp")
    from ..stages.multimodal import phash_pairs

    ds = phash_pairs(payloads).materialize()
    if ds.count() == 0:
        # zero near-dup pairs is a legal outcome at some corpus scales
        # (sf0.01's min pairwise Hamming is > 7): a fully-empty Dataset
        # is schema-less in Ray 2.49 (column-less to_pandas), so the
        # driver-facing result must be a TYPED empty frame
        return pd.DataFrame(
            {
                "doc_id_a": pd.Series(dtype="int64"),
                "doc_id_b": pd.Series(dtype="int64"),
                "hamming": pd.Series(dtype="int64"),
            }
        )
    return ds


_SQL_PHASH_PAIRS = f"""
WITH {_SQL_PHASH_CTE}
SELECT a.doc_id AS doc_id_a, b.doc_id AS doc_id_b,
       bit_count(xor(a.u::UBIGINT, b.u::UBIGINT))::BIGINT AS hamming
FROM ph a JOIN ph b ON a.doc_id < b.doc_id
WHERE bit_count(xor(a.u::UBIGINT, b.u::UBIGINT)) <= 7
"""

QUERIES["multimodal_phash_pairs"] = q_multimodal_phash_pairs
ORACLES["multimodal_phash_pairs"] = _SQL_PHASH_PAIRS


def q_multimodal_phash_clusters(sf_dir: str):
    """Near-duplicate IMAGE clusters: the phash pair graph fed through
    the shared size-adaptive connected-components tail
    (stages/dedup.cluster_from_pairs) — every document labeled with its
    image-similarity cluster, singletons included; the multimodal twin
    of dedup_clusters / embedding_clusters."""
    from ..stages.multimodal import phash_pairs

    payloads = M.attach_payload(_docs(sf_dir), media="bmp")
    return D.cluster_from_pairs(_docs(sf_dir), phash_pairs(payloads))


# the phash CTE body defines its own `p`, so it nests inside a derived
# table (the inner WITH shadows the outer pair CTE's name)
ORACLES["multimodal_phash_clusters"] = _cc_sql(
    pairs_ctes=(
        "p AS (\n"
        "  SELECT a, b FROM (\n"
        f"    WITH {_SQL_PHASH_CTE}\n"
        "    SELECT x.doc_id AS a, y.doc_id AS b\n"
        "    FROM ph x JOIN ph y ON x.doc_id < y.doc_id\n"
        "    WHERE bit_count(xor(x.u::UBIGINT, y.u::UBIGINT)) <= 7\n"
        "  )\n"
        ")"
    ),
    base_table="documents",
    id_col="doc_id",
)
QUERIES["multimodal_phash_clusters"] = q_multimodal_phash_clusters


def q_docs_lm_oov(sf_dir: str, k: int = 1000):
    """LM-familiarity proxy without a model: fraction of each document's
    token bigrams (with multiplicity) that fall OUTSIDE the corpus-wide
    top-k bigram table — high OOV-bigram fraction flags boilerplate-free
    but unnatural text the way an n-gram LM perplexity cut would,
    in exact integer counts plus ONE IEEE division.

    Scale shape: the top-k table is the small side — built by the
    text_bigrams machinery (map-side Counter, bucketed sum, block top-k
    merge; ties broken n DESC then bigram ASC so the cut is
    deterministic), broadcast once via ray.put; scoring is map-only."""
    from collections import Counter

    import ray

    from ..stages.dedup import tokens
    from ..util import bucket_sum

    def partial(df: pd.DataFrame) -> pd.DataFrame:
        c = Counter()
        for t in df["text"].fillna(""):
            toks = tokens(t)
            c.update(a + " " + b for a, b in zip(toks, toks[1:]))
        return pd.DataFrame(
            {
                "bigram": list(c.keys()),
                "n": pd.array(list(c.values()), dtype="int64"),
            }
        )

    agg = bucket_sum(
        _docs(sf_dir).map_batches(partial, batch_format="pandas"),
        ["bigram"],
        ["n"],
    )

    def block_topk(df: pd.DataFrame) -> pd.DataFrame:
        return df.sort_values(["n", "bigram"], ascending=[False, True]).head(k)

    cands = agg.map_batches(block_topk, batch_format="pandas").to_pandas()
    top = set(
        cands.sort_values(["n", "bigram"], ascending=[False, True])
        .head(k)["bigram"]
    ) if len(cands) else set()
    ref = ray.put(top)

    def score(df: pd.DataFrame) -> pd.DataFrame:
        vocab = ray.get(ref)
        nb, noov = [], []
        for t in df["text"].fillna(""):
            toks = tokens(t)
            bgs = [a + " " + b for a, b in zip(toks, toks[1:])]
            nb.append(len(bgs))
            noov.append(sum(1 for g in bgs if g not in vocab))
        nb = np.asarray(nb, dtype=np.int64)
        noov = np.asarray(noov, dtype=np.int64)
        return pd.DataFrame(
            {
                "doc_id": df["doc_id"].astype("int64"),
                "n_bigrams": nb,
                "n_oov": noov,
                "oov_frac": np.where(
                    nb > 0, noov.astype(np.float64) / np.maximum(nb, 1), 0.0
                ),
            }
        )

    return _docs(sf_dir).map_batches(score, batch_format="pandas")


_SQL_LM_OOV = r"""
WITH t AS (
  SELECT doc_id, regexp_extract_all(coalesce(text, ''), '\S+') AS toks
  FROM documents
),
b AS (
  SELECT doc_id, toks[i] || ' ' || toks[i + 1] AS bigram
  FROM t, unnest(generate_series(1, len(toks) - 1)) AS u(i)
),
top AS (
  SELECT bigram FROM (
    SELECT bigram, count(*) AS n,
           row_number() OVER (ORDER BY count(*) DESC, bigram) AS rn
    FROM b GROUP BY bigram
  ) WHERE rn <= 1000
),
per AS (
  SELECT b.doc_id, count(*) AS nb,
         count(*) FILTER (WHERE top.bigram IS NULL) AS noov
  FROM b LEFT JOIN top ON b.bigram = top.bigram
  GROUP BY b.doc_id
)
SELECT d.doc_id,
       coalesce(nb, 0)::BIGINT AS n_bigrams,
       coalesce(noov, 0)::BIGINT AS n_oov,
       CASE WHEN coalesce(nb, 0) > 0
            THEN noov::DOUBLE / nb::DOUBLE ELSE 0.0 END AS oov_frac
FROM documents d LEFT JOIN per USING (doc_id)
"""

QUERIES["docs_lm_oov"] = q_docs_lm_oov
ORACLES["docs_lm_oov"] = _SQL_LM_OOV


# -- paragraph-level global first-occurrence dedup --------------------------


def q_paragraph_dedup(sf_dir: str):
    """Exact paragraph dedup with GLOBAL first-occurrence keep (the
    Pile / SlimPajama line-dedup rule): every paragraph occurrence
    except the first in corpus order (doc_id, position) is dropped —
    including repeats WITHIN a document — and each document is
    reassembled from its surviving paragraphs.  The single-line fixture
    corpus derives a 4-paragraph corpus as a pure function of doc_id
    (the derived-corpus oracle trick shared with boilerplate_removal):
    a shared header (doc_id % 5) that repeats inside the document, the
    document's own text, and a shared footer (doc_id % 3).

    Distribution: occurrences (doc_id, idx, h61) explode map-side; the
    global winner per paragraph hash is one bucketed min over a packed
    (doc_id·8 + idx) composite (util.bucket_agg — never a per-key Ray
    aggregate at paragraph-hash scale); one hash join flags each
    occurrence against its winner; reassembly is a second bucketed
    aggregate keyed by doc_id.  Nothing corpus-scale touches the
    driver, and paragraph text rides the shuffle once."""
    from ..stages.dedup import _md5_u64, _md5_u64_cached
    from ..util import bucket_agg, heal_schema, join_partitions

    docs = _docs(sf_dir)
    np_ = join_partitions(None)

    def occurrences(df: pd.DataFrame) -> pd.DataFrame:
        ids = df["doc_id"].astype("int64")
        head = "PARA head " + (ids % 5).astype(str)
        foot = "PARA foot " + (ids % 3).astype(str)
        body = df["text"].fillna("")
        paras = pd.concat([head, body, head, foot], ignore_index=True)
        n = len(df)
        out = pd.DataFrame(
            {
                "doc_id": pd.concat([ids] * 4, ignore_index=True),
                "idx": np.repeat(np.arange(4, dtype="int64"), n),
                "para": paras.astype("string"),
            }
        )
        # cached: the head/foot paragraphs have only 8 distinct values
        # corpus-wide, so ~half the hashes here are repeats
        out["h61"] = pd.array(
            [_md5_u64_cached(p) % (1 << 61) for p in out["para"]],
            dtype="int64",
        )
        return out

    occ = docs.map_batches(occurrences, batch_format="pandas").materialize()

    def min_per_hash(df: pd.DataFrame) -> pd.DataFrame:
        ck = df["doc_id"].to_numpy() * 8 + df["idx"].to_numpy()
        g = (
            pd.DataFrame({"h61": df["h61"], "mn": ck})
            .groupby("h61", as_index=False)["mn"]
            .min()
        )
        return g.astype({"h61": "int64", "mn": "int64"})

    winners = bucket_agg(occ, ["h61"], min_per_hash)

    flagged = heal_schema(occ, np_).join(
        heal_schema(winners, np_), "inner", np_, on=("h61",)
    )

    def reassemble(df: pd.DataFrame) -> pd.DataFrame:
        g = df.sort_values(["doc_id", "idx"], ignore_index=True)
        keep = (g["doc_id"].to_numpy() * 8 + g["idx"].to_numpy()) == g[
            "mn"
        ].to_numpy()
        kept = g[keep]
        n_par = g.groupby("doc_id").size()
        n_kept = kept.groupby("doc_id").size().reindex(n_par.index, fill_value=0)
        clean = (
            kept.groupby("doc_id")["para"]
            .agg("\n".join)
            .reindex(n_par.index, fill_value="")
        )
        return pd.DataFrame(
            {
                "doc_id": pd.array(n_par.index, dtype="int64"),
                "n_par": pd.array(n_par.to_numpy(), dtype="int64"),
                "n_kept": pd.array(n_kept.to_numpy(), dtype="int64"),
                "clean_h61": pd.array(
                    [_md5_u64(t) % (1 << 61) for t in clean],
                    dtype="int64",
                ),
            }
        )

    return bucket_agg(flagged, ["doc_id"], reassemble)


_SQL_PARA_DEDUP = r"""
WITH lsts AS (
  SELECT doc_id,
         ['PARA head ' || (doc_id % 5),
          coalesce(text, ''),
          'PARA head ' || (doc_id % 5),
          'PARA foot ' || (doc_id % 3)] AS lst
  FROM documents
),
occ AS (
  SELECT doc_id, unnest(lst) AS para,
         unnest([0, 1, 2, 3]) AS idx
  FROM lsts
),
ranked AS (
  SELECT doc_id, idx, para,
         row_number() OVER (
           PARTITION BY md5_number_lower(para) % 2305843009213693952
           ORDER BY doc_id, idx
         ) AS rn
  FROM occ
)
SELECT doc_id,
       count(*)::BIGINT AS n_par,
       count(*) FILTER (WHERE rn = 1)::BIGINT AS n_kept,
       (md5_number_lower(coalesce(
          string_agg(para, chr(10) ORDER BY idx) FILTER (WHERE rn = 1), ''))
        % 2305843009213693952)::BIGINT AS clean_h61
FROM ranked
GROUP BY doc_id
"""

QUERIES["paragraph_dedup"] = q_paragraph_dedup
ORACLES["paragraph_dedup"] = _SQL_PARA_DEDUP


# -- hashed linear quality classifier (model-inference shape) ---------------


class _QualityModel:
    """Fasttext-style linear classifier over hashed uni+bigram features
    — the model-inference stage shape: the weight table is built ONCE
    per actor in __init__ (for a real model this is the
    load-checkpoint step), __call__ scores whole batches.  Weights are
    a pure function of the feature id (md5-derived integers in
    [-1000, 1000]) so the DuckDB oracle reproduces scores bit-exactly
    without shipping a weight file."""

    def __init__(self, dim: int = 4096):
        from ..stages.dedup import _md5_u64

        self.dim = dim
        self.w = np.array(
            [_md5_u64(f"w{f}") % 2001 - 1000 for f in range(dim)],
            dtype=np.int64,
        )

    def __call__(self, df: pd.DataFrame) -> pd.DataFrame:
        from ..stages.dedup import _md5_u64_cached, tokens

        ids, n_grams, scores = [], [], []
        for doc_id, text in zip(df["doc_id"], df["text"]):
            toks = tokens(text if isinstance(text, str) else "")
            grams = toks + [
                f"{a} {b}" for a, b in zip(toks, toks[1:])
            ]
            fs = np.array(
                [_md5_u64_cached(g) % self.dim for g in grams], dtype=np.int64
            )
            ids.append(doc_id)
            n_grams.append(len(grams))
            scores.append(int(self.w[fs].sum()) if len(fs) else 0)
        return pd.DataFrame(
            {
                "doc_id": pd.array(ids, dtype="int64"),
                "n_grams": pd.array(n_grams, dtype="int64"),
                "score": pd.array(scores, dtype="int64"),
                "keep": pd.array(
                    [1 if s > 0 else 0 for s in scores], dtype="int64"
                ),
            }
        )


def q_quality_classifier(sf_dir: str):
    """Deterministic linear quality-classifier inference over the
    corpus (actor pool: weights built once per actor, batches scored
    vectorized against the in-actor weight table)."""
    from ..util import auto_concurrency

    return _docs(sf_dir).map_batches(
        _QualityModel,
        batch_format="pandas",
        concurrency=auto_concurrency(None),
        batch_size=256,
    )


_SQL_QUALITY_CLF = r"""
WITH toks AS (
  SELECT doc_id, regexp_extract_all(coalesce(text, ''), '\S+') AS t
  FROM documents
),
uni AS (SELECT doc_id, unnest(t) AS g FROM toks),
bi AS (
  SELECT doc_id, t[i] || ' ' || t[i + 1] AS g
  FROM toks, unnest(generate_series(1, len(t) - 1)) AS u(i)
),
grams AS (SELECT * FROM uni UNION ALL SELECT * FROM bi),
scored AS (
  SELECT doc_id,
         ((md5_number_lower('w' || (md5_number_lower(g) % 4096)) % 2001)::BIGINT
          - 1000) AS wt
  FROM grams
),
per AS (
  SELECT doc_id, count(*)::BIGINT AS n, sum(wt)::BIGINT AS s
  FROM scored GROUP BY doc_id
)
SELECT d.doc_id,
       coalesce(per.n, 0)::BIGINT AS n_grams,
       coalesce(per.s, 0)::BIGINT AS score,
       (CASE WHEN coalesce(per.s, 0) > 0 THEN 1 ELSE 0 END)::BIGINT AS keep
FROM documents d LEFT JOIN per USING (doc_id)
"""

QUERIES["quality_classifier"] = q_quality_classifier
ORACLES["quality_classifier"] = _SQL_QUALITY_CLF


# -- integer k-means embedding clustering -----------------------------------


def q_kmeans_clusters(sf_dir: str):
    """Deterministic integer Lloyd's k-means over the embedding table
    (stages/embedding.kmeans_int: quantize → seed from the k lowest
    ids → 2 broadcast-assignment/partial-sum rounds → final assignment;
    only k×dim centroids and k-per-block partials ever leave the
    stream)."""
    from ..stages.embedding import kmeans_int

    return kmeans_int(_embs(sf_dir))


def _kmeans_sql(k: int = 8, iters: int = 2, dim: int = 64,
                scale: int = 10_000, offset: int = 100_000) -> str:
    """Unrolled MATERIALIZED-CTE Lloyd's iterations mirroring
    kmeans_int exactly: nonnegative quantization (so DuckDB's
    truncating ``//`` equals numpy's floor), argmin ties to the lowest
    centroid id, empty clusters keep their previous centroid."""
    d2 = (
        "list_sum(list_transform(generate_series(1, {dim}), "
        "i -> (q.qv[i] - c.qv[i]) * (q.qv[i] - c.qv[i])))::BIGINT"
    ).format(dim=dim)

    def asg_body(prev: str) -> str:
        return f"""(
    SELECT vec_id, qv, cid, d2,
           row_number() OVER (PARTITION BY vec_id ORDER BY d2, cid) AS rn
    FROM (
      SELECT q.vec_id, q.qv, c.cid, {d2} AS d2
      FROM q CROSS JOIN {prev} c))"""

    parts = [
        f"""q AS MATERIALIZED (
  SELECT vec_id,
         list_transform(embedding,
                        x -> floor(x::DOUBLE * {scale})::BIGINT + {offset}) AS qv
  FROM embeddings
),
cent0 AS MATERIALIZED (
  SELECT row_number() OVER (ORDER BY vec_id) - 1 AS cid, qv
  FROM q ORDER BY vec_id LIMIT {k}
)"""
    ]
    for j in range(1, iters + 1):
        parts.append(
            f""",
asg{j} AS MATERIALIZED (
  SELECT vec_id, qv, cid FROM {asg_body(f"cent{j - 1}")}
  WHERE rn = 1
),
sums{j} AS MATERIALIZED (
  SELECT cid, i, sum(qv[i])::BIGINT AS s, count(*)::BIGINT AS n
  FROM asg{j}, unnest(generate_series(1, {dim})) AS u(i)
  GROUP BY cid, i
),
cent{j} AS MATERIALIZED (
  SELECT p.cid, coalesce(nv.qv, p.qv) AS qv
  FROM cent{j - 1} p LEFT JOIN (
    SELECT cid, list(s // n ORDER BY i) AS qv FROM sums{j} GROUP BY cid
  ) nv ON p.cid = nv.cid
)"""
        )
    return (
        "WITH "
        + "".join(parts)
        + f"""
SELECT vec_id, cid AS cluster, d2 AS dist2
FROM {asg_body(f"cent{iters}")}
WHERE rn = 1"""
    )


_SQL_KMEANS = _kmeans_sql()

QUERIES["kmeans_clusters"] = q_kmeans_clusters
ORACLES["kmeans_clusters"] = _SQL_KMEANS


# -- SemDeDup: semantic dedup inside k-means clusters ------------------------


_SEMDEDUP_TAU = 0.35
_SEMDEDUP_MAX_CLUSTER = 200_000  # pairwise is O(n²) per cluster — fail loud


def q_embedding_semdedup(sf_dir: str):
    """SemDeDup (Abbas et al. 2023, arXiv:2303.09540) re-expressed
    join-free on the engine's exact primitives: fit integer k-means
    (stages/embedding.kmeans_int — broadcast centroids, map-side
    partials), re-attach (cluster, dist2) MAP-SIDE from the fitted
    centroids (kmeans_assign_batch — bit-identical argmin, zero joins),
    then ONE bucketed groupby by cluster does the whole per-cluster
    phase in pandas/numpy: pairwise cosine≥τ (normalized matmul),
    min-label components (scatter-min rounds), and the paper's
    keep-the-outlier rule — in each component KEEP the vector farthest
    from its centroid (max integer dist2, ties to the lowest vec_id).
    The clustering is what makes corpus-scale semantic dedup tractable
    (candidates never cross clusters); the partitioning assumption is
    the paper's — one cluster fits one worker (k scales with corpus
    size), enforced by a loud cap.  Returns (vec_id, cluster,
    sem_cluster, keep); keep-count = #components + #singletons."""
    from ..stages.embedding import kmeans_assign_batch, kmeans_int
    from ..util import bucket_agg

    embs = _embs(sf_dir)
    _, cent = kmeans_int(embs, return_centroids=True)

    def attach(df: pd.DataFrame) -> pd.DataFrame:
        return kmeans_assign_batch(df, cent)

    tagged = embs.map_batches(attach, batch_format="pandas")
    return bucket_agg(tagged, ["cluster"], _semdedup_groups)


def _semdedup_groups(df: pd.DataFrame) -> pd.DataFrame:
    """Per-cluster SemDeDup kernel (bucket_agg fn): pairwise cosine≥τ
    via normalized matmul, min-label components via scatter-min rounds,
    keep = max dist2 (ties to the lowest vec_id) per component."""
    outs = []
    for _, g in df.groupby("cluster", sort=False):
        if len(g) > _SEMDEDUP_MAX_CLUSTER:
            raise RuntimeError(
                f"semdedup cluster has {len(g)} rows > "
                f"{_SEMDEDUP_MAX_CLUSTER}: raise k (more, smaller "
                "clusters) before the O(n²) per-cluster phase"
            )
        g = g.sort_values("vec_id", ignore_index=True)
        ids = g["vec_id"].to_numpy(dtype=np.int64)
        v = np.stack(g["embedding"].to_numpy()).astype(np.float64)
        nv = v / np.linalg.norm(v, axis=1, keepdims=True)
        sim = nv @ nv.T
        iu, ju = np.triu_indices(len(g), 1)
        hit = sim[iu, ju] >= _SEMDEDUP_TAU
        i, j = iu[hit], ju[hit]
        lbl = ids.copy()
        while True:
            before = lbl.copy()
            m = np.minimum(lbl[i], lbl[j])
            np.minimum.at(lbl, i, m)
            np.minimum.at(lbl, j, m)
            if np.array_equal(lbl, before):
                break
        gg = pd.DataFrame(
            {
                "vec_id": ids,
                "cluster": g["cluster"].to_numpy(),
                "sem_cluster": lbl,
                "dist2": g["dist2"].to_numpy(),
            }
        ).sort_values(
            ["sem_cluster", "dist2", "vec_id"],
            ascending=[True, False, True],
        )
        gg["keep"] = ~gg["sem_cluster"].duplicated()
        outs.append(gg.drop(columns=["dist2"]))
    return pd.concat(outs, ignore_index=True)


def _semdedup_sql(k: int = 8, iters: int = 2, dim: int = 64,
                  scale: int = 10_000, offset: int = 100_000,
                  tau: float = 0.35) -> str:
    """kmeans CTEs (same generator as _SQL_KMEANS) + same-cluster cosine
    pairs + recursive min-label components + farthest-from-centroid
    window — the exact SQL twin of q_embedding_semdedup."""
    km = _kmeans_sql(k=k, iters=iters, dim=dim, scale=scale, offset=offset)
    body = km[len("WITH "):]  # CTE list + final assignment SELECT
    ctes, final_select = body.rsplit("\nSELECT vec_id, cid AS cluster", 1)
    final = (
        "final AS MATERIALIZED (\nSELECT vec_id, cid AS cluster"
        + final_select + "\n)"
    )
    return f"""
WITH RECURSIVE {ctes},
{final},
p AS MATERIALIZED (
  SELECT a.vec_id AS a, b.vec_id AS b
  FROM embeddings a
  JOIN final fa ON fa.vec_id = a.vec_id
  JOIN embeddings b ON a.vec_id < b.vec_id
  JOIN final fb ON fb.vec_id = b.vec_id AND fa.cluster = fb.cluster
  WHERE list_cosine_similarity(a.embedding::DOUBLE[],
                               b.embedding::DOUBLE[]) >= {tau}
),
e AS (SELECT a, b FROM p UNION ALL SELECT b, a FROM p),
comp(node, lbl) AS (
  SELECT a, a FROM e
  UNION
  SELECT e.b, c.lbl FROM comp c JOIN e ON e.a = c.node
),
lab AS (SELECT node, min(lbl) AS sem FROM comp GROUP BY node),
lbl AS (
  SELECT f.vec_id, f.cluster, coalesce(lab.sem, f.vec_id) AS sem_cluster,
         f.dist2
  FROM final f LEFT JOIN lab ON lab.node = f.vec_id
)
SELECT vec_id, cluster::BIGINT AS cluster, sem_cluster::BIGINT AS sem_cluster,
       (row_number() OVER (
          PARTITION BY sem_cluster ORDER BY dist2 DESC, vec_id) = 1) AS keep
FROM lbl
"""


QUERIES["embedding_semdedup"] = q_embedding_semdedup
ORACLES["embedding_semdedup"] = _semdedup_sql()


# -- Matryoshka-style dimension-sliced retrieval -----------------------------


def q_knn_matryoshka_topk(sf_dir: str, dims: int = 16):
    """Dimension-sliced exact retrieval (the Matryoshka-representation
    serving pattern, Kusupati et al. 2022: rank with a PREFIX of the
    embedding, 4× less memory bandwidth): cosine top-5 computed on the
    first ``dims`` coordinates only, through the same broadcast-query
    actor stage as knn_cosine_topk — one extra map_batches slices the
    column, everything downstream is unchanged.  Exact-output oracle
    (the slice is deterministic), unlike the recall-gated IVF/PQ/int8
    audits."""

    def trunc(df: pd.DataFrame) -> pd.DataFrame:
        df = df.copy()
        df["embedding"] = [
            np.asarray(v[:dims], dtype=np.float32) for v in df["embedding"]
        ]
        return df

    tds = _embs(sf_dir).map_batches(trunc, batch_format="pandas")
    return E.knn_topk(tds, query_ids=list(range(10)), k=5)


_SQL_MATRYOSHKA = """
SELECT q.vec_id::BIGINT AS query_id, n.vec_id::BIGINT AS neighbor_id,
       row_number() OVER (
         PARTITION BY q.vec_id
         ORDER BY list_cosine_similarity((q.embedding[1:16])::DOUBLE[],
                                         (n.embedding[1:16])::DOUBLE[]) DESC,
                  n.vec_id
       )::BIGINT AS rank
FROM embeddings q, embeddings n
WHERE q.vec_id < 10 AND n.vec_id != q.vec_id
QUALIFY rank <= 5
"""

QUERIES["knn_matryoshka_topk"] = q_knn_matryoshka_topk
ORACLES["knn_matryoshka_topk"] = _SQL_MATRYOSHKA


# -- windowed HLL: distinct users per hour ------------------------------------


def q_events_hourly_hll(sf_dir: str):
    """Per-hour distinct-user HyperLogLog — the mergeable-sketch +
    time-window composition a streaming metrics pipeline runs (count
    distinct users per window without per-window user sets): the same
    integer 256-register HLL as distinct_sketch_hll keyed by event hour;
    each batch ships ≤256 (hour, reg, rho) rows per hour touched, one
    bucketed pass merges (register max) and evaluates the integer raw
    estimator.  Rows: (hour, n_regs, sum_rho, est_hll) — bit-exact SQL
    twin, no float anywhere."""
    import ray.data

    from ..stages.dedup import _md5_u64_cached
    from ..util import bucket_agg

    events = ray.data.read_parquet(
        f"{sf_dir}/events.parquet", columns=["ts", "user_id"]
    )

    def partial(df: pd.DataFrame) -> pd.DataFrame:
        hrs = (df["ts"].astype("int64") // 3_600_000_000).to_numpy()
        uids = df["user_id"].astype("int64").to_numpy()
        best: dict[tuple, int] = {}
        for hr, uid in zip(hrs, uids):
            h = _md5_u64_cached(str(uid)) & ((1 << 61) - 1)
            rho = 54 - (h & ((1 << 53) - 1)).bit_length()
            k = (hr, h >> 53)
            if best.get(k, 0) < rho:
                best[k] = rho
        return pd.DataFrame(
            {
                "hour": pd.Series([k[0] for k in best], dtype="int64"),
                "reg": pd.Series([k[1] for k in best], dtype="int64"),
                "rho": pd.Series(list(best.values()), dtype="int64"),
            }
        )

    def merge(df: pd.DataFrame) -> pd.DataFrame:
        out = []
        for hr, g in df.groupby("hour", sort=False):
            m = g.groupby("reg")["rho"].max()
            denom = sum(1 << (54 - int(r)) for r in m)
            denom += (256 - len(m)) * (1 << 54)
            est = (7213 * 65536 * (1 << 54)) // (10000 * denom)
            out.append((hr, len(m), int(m.sum()), min(est, 1 << 62)))
        return pd.DataFrame(
            out, columns=["hour", "n_regs", "sum_rho", "est_hll"]
        ).astype("int64")

    return bucket_agg(
        events.map_batches(partial, batch_format="pandas"), ["hour"], merge
    )


_SQL_EVENTS_HLL = r"""
WITH uh AS (
  SELECT DISTINCT epoch_us(ts) // 3600000000 AS hour,
         (md5_number_lower(user_id::VARCHAR) % (1::HUGEINT << 61))::BIGINT AS h
  FROM events
),
regs AS (
  SELECT hour, h // (1::BIGINT << 53) AS reg,
         max(CASE WHEN h % (1::BIGINT << 53) = 0 THEN 54
                  ELSE 54 - length(bin(h % (1::BIGINT << 53))) END) AS rho
  FROM uh GROUP BY hour, reg
),
agg AS (
  SELECT hour, count(*) AS n_regs, sum(rho) AS sum_rho,
         sum(1::HUGEINT << (54 - rho)) AS d_hit
  FROM regs GROUP BY hour
)
SELECT hour::BIGINT AS hour, n_regs::BIGINT AS n_regs,
       sum_rho::BIGINT AS sum_rho,
       least((7213::HUGEINT * 65536 * (1::HUGEINT << 54))
             // (10000 * (d_hit + (256 - n_regs) * (1::HUGEINT << 54))),
             1::HUGEINT << 62)::BIGINT AS est_hll
FROM agg
"""

QUERIES["events_hourly_hll"] = q_events_hourly_hll
ORACLES["events_hourly_hll"] = _SQL_EVENTS_HLL


# -- partitioned-parquet sink round-trip --------------------------------------


def q_events_parquet_partitioned(sf_dir: str):
    """Resumable-output sink proof: the event stream written as
    HIVE-PARTITIONED parquet (``write_parquet(partition_cols=["day"])``
    — one directory per day, so a failed 100 TB run re-lists the sink
    and skips finished partitions instead of restarting), then re-read
    through partition discovery and re-aggregated; the per-day counts
    and integer cent sums must match the direct-from-source oracle,
    which pins BOTH directions of the partitioned codec (column →
    directory key → column).  floor(value·100) keeps the money integer
    (identical float64 op on both engines — round() differs between
    numpy half-even and SQL half-away)."""
    import shutil
    import tempfile

    import ray.data

    from ..util import bucket_agg

    ev = ray.data.read_parquet(
        f"{sf_dir}/events.parquet", columns=["ts", "value"]
    )

    def prep(df: pd.DataFrame) -> pd.DataFrame:
        return pd.DataFrame(
            {
                "day": (df["ts"].astype("int64") // 86_400_000_000).astype(
                    "int64"
                ),
                "cents": np.floor(
                    df["value"].to_numpy(dtype=np.float64) * 100
                ).astype("int64"),
            }
        )

    out_dir = tempfile.mkdtemp(prefix="events_by_day_", dir="/tmp")
    try:
        ev.map_batches(prep, batch_format="pandas").write_parquet(
            out_dir, partition_cols=["day"]
        )
        back = ray.data.read_parquet(out_dir)

        def agg(df: pd.DataFrame) -> pd.DataFrame:
            g = df.groupby("day", as_index=False, sort=False).agg(
                n=("cents", "size"), sum_cents=("cents", "sum")
            )
            g["day"] = g["day"].astype("int64")
            return g.astype({"n": "int64", "sum_cents": "int64"})

        return bucket_agg(back, ["day"], agg).to_pandas()
    finally:
        shutil.rmtree(out_dir, ignore_errors=True)


_SQL_EVENTS_PARTITIONED = """
SELECT (epoch_us(ts) // 86400000000)::BIGINT AS day,
       count(*)::BIGINT AS n,
       sum(floor(value * 100)::BIGINT)::BIGINT AS sum_cents
FROM events GROUP BY day
"""

QUERIES["events_parquet_partitioned"] = q_events_parquet_partitioned
ORACLES["events_parquet_partitioned"] = _SQL_EVENTS_PARTITIONED


# -- positional inverted index build ----------------------------------------


def q_postings_index(sf_dir: str):
    """Search-index construction: the positional inverted index
    (token → ordered (doc, position) postings) summarized per token as
    document frequency, collection frequency, and a content hash of the
    ordered postings list — the verifiable artifact a phrase/proximity
    query engine would consume.  Postings explode map-side (one row per
    token occurrence, 1-based positions); the per-token assembly is one
    bucketed aggregate (util.bucket_agg — token-scale keys never reach
    a Ray per-key aggregate), with each token's postings serialized in
    (doc_id, pos) order inside its bucket."""
    from ..stages.dedup import _md5_u64, tokens
    from ..util import bucket_agg

    docs = _docs(sf_dir)

    def explode(df: pd.DataFrame) -> pd.DataFrame:
        ids, toks, poss = [], [], []
        for doc_id, text in zip(df["doc_id"], df["text"]):
            ts = tokens(text if isinstance(text, str) else "")
            ids.extend([doc_id] * len(ts))
            toks.extend(ts)
            poss.extend(range(1, len(ts) + 1))
        return pd.DataFrame(
            {
                "doc_id": pd.array(ids, dtype="int64"),
                "token": pd.array(toks, dtype="string"),
                "pos": pd.array(poss, dtype="int64"),
            }
        )

    occ = docs.map_batches(explode, batch_format="pandas")

    def per_token(df: pd.DataFrame) -> pd.DataFrame:
        g = df.sort_values(["token", "doc_id", "pos"], ignore_index=True)
        g["entry"] = g["doc_id"].astype(str) + ":" + g["pos"].astype(str)
        agg = g.groupby("token").agg(
            df_=("doc_id", "nunique"),
            cf=("doc_id", "size"),
            plist=("entry", " ".join),
        )
        return pd.DataFrame(
            {
                "token": pd.array(agg.index, dtype="string"),
                "df": pd.array(agg["df_"].to_numpy(), dtype="int64"),
                "cf": pd.array(agg["cf"].to_numpy(), dtype="int64"),
                "postings_h61": pd.array(
                    [_md5_u64(p) % (1 << 61) for p in agg["plist"]],
                    dtype="int64",
                ),
            }
        )

    return bucket_agg(occ, ["token"], per_token)


_SQL_POSTINGS = r"""
WITH toks AS (
  SELECT doc_id, regexp_extract_all(coalesce(text, ''), '\S+') AS t
  FROM documents
),
pos AS (
  SELECT doc_id, t[i] AS token, i
  FROM toks, unnest(generate_series(1, len(t))) AS u(i)
)
SELECT token,
       count(DISTINCT doc_id)::BIGINT AS df,
       count(*)::BIGINT AS cf,
       (md5_number_lower(
          string_agg(doc_id || ':' || i, ' ' ORDER BY doc_id, i))
        % 2305843009213693952)::BIGINT AS postings_h61
FROM pos GROUP BY token
"""

QUERIES["postings_index"] = q_postings_index
ORACLES["postings_index"] = _SQL_POSTINGS


# -- normalized-text exact dedup (CCNet-style) ------------------------------


def q_dedup_normalized(sf_dir: str):
    """Exact dedup AFTER text normalization (the CCNet/Gopher variant
    that catches trivially-reformatted copies): lowercase, strip
    non-alphanumerics, collapse whitespace runs, trim — then keep the
    min doc_id per normalized form.  Normalization is a vectorized
    pandas .str chain (ASCII regex classes, RE2-parity like pii_scrub);
    dedup rides the coarse-bucketed exact_dedup engine, so nothing is
    ever grouped per distinct text by Ray."""
    import re

    from ..stages import dedup as D
    from ..stages.dedup import _md5_u64

    docs = _docs(sf_dir)

    # re.ASCII: Python's default \s is Unicode while DuckDB's RE2 \s is
    # ASCII-only — without the flag a U+00A0/U+2028 document would
    # normalize differently on the two sides (the tokens() convention)
    drop_re = re.compile(r"[^a-z0-9\s]", re.ASCII)
    ws_re = re.compile(r"\s+", re.ASCII)

    def normalize(df: pd.DataFrame) -> pd.DataFrame:
        n = (
            df["text"]
            .fillna("")
            .str.lower()
            .str.replace(drop_re, "", regex=True)
            .str.replace(ws_re, " ", regex=True)
            .str.strip()
        )
        return pd.DataFrame(
            {"doc_id": df["doc_id"].astype("int64"),
             "norm": n.astype("string")}
        )

    kept = D.exact_dedup(
        docs.map_batches(normalize, batch_format="pandas"), text_col="norm"
    )

    def project(df: pd.DataFrame) -> pd.DataFrame:
        return pd.DataFrame(
            {
                "doc_id": df["doc_id"].astype("int64"),
                "norm_h61": pd.array(
                    [_md5_u64(t) % (1 << 61) for t in df["norm"]],
                    dtype="int64",
                ),
            }
        )

    return kept.map_batches(project, batch_format="pandas")


_SQL_DEDUP_NORM = r"""
WITH n AS (
  SELECT doc_id,
         trim(regexp_replace(
           regexp_replace(lower(coalesce(text, '')), '[^a-z0-9\s]', '', 'g'),
           '\s+', ' ', 'g')) AS norm
  FROM documents
)
SELECT min(doc_id)::BIGINT AS doc_id,
       (md5_number_lower(norm) % 2305843009213693952)::BIGINT AS norm_h61
FROM n GROUP BY norm
"""

QUERIES["dedup_normalized"] = q_dedup_normalized
ORACLES["dedup_normalized"] = _SQL_DEDUP_NORM


# -- deterministic hashed-projection embedding inference --------------------


class _HashEmbedder:
    """Embedding-inference stage shape: a deterministic 16-dim hashed
    random-projection text encoder (feature-hashing with md5-derived
    ±1 signs — the Charikar/Weinberger hashing-trick layout a real
    encoder checkpoint would replace).  Per-actor state: the sign cache
    (token → ±1 vector) built lazily in the actor, so repeated tokens
    across batches never re-hash — the analogue of a loaded model's
    weight table living in __init__."""

    DIM = 16

    def __init__(self):
        self._signs: dict[str, "np.ndarray"] = {}

    def _sign_vec(self, tok: str) -> "np.ndarray":
        from ..stages.dedup import _md5_u64

        v = self._signs.get(tok)
        if v is None:
            v = np.array(
                [
                    1 if _md5_u64(f"{tok}|{d}") % 2 == 1 else -1
                    for d in range(self.DIM)
                ],
                dtype=np.int64,
            )
            self._signs[tok] = v
        return v

    def __call__(self, df: pd.DataFrame) -> pd.DataFrame:
        from ..stages.dedup import tokens

        n = len(df)
        out = np.zeros((n, self.DIM), dtype=np.int64)
        n_toks = np.zeros(n, dtype=np.int64)
        for i, text in enumerate(df["text"]):
            ts = tokens(text if isinstance(text, str) else "")
            n_toks[i] = len(ts)
            acc = out[i]
            for t in ts:
                acc += self._sign_vec(t)
        res = {"doc_id": df["doc_id"].astype("int64").to_numpy(),
               "n_tokens": n_toks}
        for d in range(self.DIM):
            res[f"e{d}"] = out[:, d]
        return pd.DataFrame(res)


def q_doc_embed_hash(sf_dir: str):
    """Deterministic hashed-projection document embeddings (actor pool
    with a lazily-built per-actor sign table — the batched-inference
    stage shape; output is 16 integer coordinates per doc)."""
    from ..util import auto_concurrency

    return _docs(sf_dir).map_batches(
        _HashEmbedder,
        batch_format="pandas",
        concurrency=auto_concurrency(None),
        batch_size=256,
    )


def _embed_hash_sql(dim: int = 16) -> str:
    cols = ",\n       ".join(
        f"coalesce(sum(s) FILTER (WHERE i = {d}), 0)::BIGINT AS e{d}"
        for d in range(dim)
    )
    return f"""
WITH toks AS (
  SELECT doc_id, regexp_extract_all(coalesce(text, ''), '\\S+') AS t
  FROM documents
),
occ AS (SELECT doc_id, unnest(t) AS tok FROM toks),
signs AS (
  SELECT doc_id, i,
         CASE WHEN md5_number_lower(tok || '|' || i) % 2 = 1
              THEN 1 ELSE -1 END AS s
  FROM occ, unnest(generate_series(0, {dim - 1})) AS u(i)
),
per AS (
  SELECT doc_id,
       {cols}
  FROM signs GROUP BY doc_id
),
nt AS (
  SELECT doc_id, len(t)::BIGINT AS n_tokens FROM toks
)
SELECT nt.doc_id, nt.n_tokens,
       {", ".join(f"coalesce(per.e{d}, 0)::BIGINT AS e{d}" for d in range(dim))}
FROM nt LEFT JOIN per USING (doc_id)
"""


_SQL_EMBED_HASH = _embed_hash_sql()

QUERIES["doc_embed_hash"] = q_doc_embed_hash
ORACLES["doc_embed_hash"] = _SQL_EMBED_HASH


# -- overlapping token chunking (RAG/window pre-processing) -----------------


def q_docs_chunks(sf_dir: str, width: int = 64, stride: int = 48):
    """Sliding-window token chunking (the RAG / context-window
    preprocessing step): each document splits into chunks of ``width``
    tokens starting every ``stride`` tokens (overlap = width − stride),
    the final chunk truncated at the document end; empty documents
    produce no chunks.  Pure map-side fan-out — chunk assembly never
    shuffles; rows are (doc_id, chunk_id, n_chunk_tokens, chunk_h61)
    with the chunk content value-checked by hash."""
    from ..stages.dedup import _md5_u64, tokens

    docs = _docs(sf_dir)

    def explode(df: pd.DataFrame) -> pd.DataFrame:
        ids, cids, ns, hs = [], [], [], []
        for doc_id, text in zip(df["doc_id"], df["text"]):
            ts = tokens(text if isinstance(text, str) else "")
            for cid, s in enumerate(range(0, len(ts), stride)):
                chunk = ts[s : s + width]
                ids.append(doc_id)
                cids.append(cid)
                ns.append(len(chunk))
                hs.append(_md5_u64(" ".join(chunk)) % (1 << 61))
        return pd.DataFrame(
            {
                "doc_id": pd.array(ids, dtype="int64"),
                "chunk_id": pd.array(cids, dtype="int64"),
                "n_chunk_tokens": pd.array(ns, dtype="int64"),
                "chunk_h61": pd.array(hs, dtype="int64"),
            }
        )

    return docs.map_batches(explode, batch_format="pandas")


_SQL_DOCS_CHUNKS = r"""
WITH toks AS (
  SELECT doc_id, regexp_extract_all(coalesce(text, ''), '\S+') AS t
  FROM documents
),
nz AS (SELECT doc_id, t, len(t) AS n FROM toks WHERE len(t) > 0),
starts AS (
  SELECT doc_id, t, n, unnest(generate_series(0, n - 1, 48)) AS s
  FROM nz
)
SELECT doc_id,
       (s // 48)::BIGINT AS chunk_id,
       (least(s + 64, n) - s)::BIGINT AS n_chunk_tokens,
       (md5_number_lower(array_to_string(t[s + 1:least(s + 64, n)], ' '))
        % 2305843009213693952)::BIGINT AS chunk_h61
FROM starts
"""

QUERIES["docs_chunks"] = q_docs_chunks
ORACLES["docs_chunks"] = _SQL_DOCS_CHUNKS


_BPE_TOPK = 50


def q_docs_bpe_pairs(sf_dir: str):
    """Corpus-wide adjacent BYTE-pair frequency top-k — the counting
    step of one BPE tokenizer-training merge round.  Fully vectorized
    map-side combine: each batch joins its texts with a NUL separator,
    views the blob as a uint8 array, packs adjacent bytes into one
    uint16 code and bincounts — one numpy pass per batch, ≤ 65 536
    candidate rows out regardless of batch text volume.  Bucketed sum →
    per-block top-k candidates → exact driver merge (global top-k ⊆
    union of block top-ks since counts are final after the sum).

    Contract: ASCII corpora only (the repo-wide tokens() convention) —
    byte pairs and DuckDB's character substring agree exactly on ASCII;
    a non-Latin-1 byte raises loud rather than silently diverging from
    the oracle."""
    from ..util import bucket_sum

    def partial(df: pd.DataFrame) -> pd.DataFrame:
        texts = df["text"].fillna("").tolist()
        blob = "\x00".join(texts)
        if not blob:
            return pd.DataFrame(
                {"pair": pd.Series(dtype="string"),
                 "n": pd.Series(dtype="int64")}
            )
        try:
            a = np.frombuffer(blob.encode("latin-1"), dtype=np.uint8)
        except UnicodeEncodeError as e:
            raise ValueError(
                "docs_bpe_pairs requires Latin-1-safe text (ASCII corpus "
                f"contract); got a code point above U+00FF: {e}"
            ) from e
        if len(a) < 2:
            return pd.DataFrame(
                {"pair": pd.Series(dtype="string"),
                 "n": pd.Series(dtype="int64")}
            )
        codes = (a[:-1].astype(np.uint32) << 8) | a[1:]
        mask = (a[:-1] != 0) & (a[1:] != 0)
        counts = np.bincount(codes[mask], minlength=65536)
        nz = np.flatnonzero(counts)
        return pd.DataFrame(
            {
                "pair": pd.Series(
                    [chr(c >> 8) + chr(c & 0xFF) for c in nz], dtype="string"
                ),
                "n": counts[nz].astype(np.int64),
            }
        )

    agg = bucket_sum(
        _docs(sf_dir).map_batches(partial, batch_format="pandas"),
        ["pair"],
        ["n"],
    )

    def block_topk(df: pd.DataFrame) -> pd.DataFrame:
        return df.sort_values(
            ["n", "pair"], ascending=[False, True]
        ).head(_BPE_TOPK)

    cands = agg.map_batches(block_topk, batch_format="pandas").to_pandas()
    out = (
        cands.sort_values(["n", "pair"], ascending=[False, True])
        .head(_BPE_TOPK)
        .reset_index(drop=True)
    )
    out["n"] = out["n"].astype("int64")
    return out


_SQL_DOCS_BPE_PAIRS = f"""
WITH ch AS (
  SELECT substring(d.text, t.i, 2) AS pair
  FROM documents d, unnest(generate_series(1, length(d.text) - 1)) AS t(i)
  WHERE length(d.text) >= 2
)
SELECT pair, count(*)::BIGINT AS n FROM ch GROUP BY pair
ORDER BY n DESC, pair LIMIT {_BPE_TOPK}
"""

QUERIES["docs_bpe_pairs"] = q_docs_bpe_pairs
ORACLES["docs_bpe_pairs"] = _SQL_DOCS_BPE_PAIRS


def q_multimodal_image_hist(sf_dir: str):
    """Per-image 16-bin brightness histogram, value-exact through the
    REAL codec: text → 24-bit BMP payload → actor-pool decode
    (stages/multimodal.ImageHist) → bincount(byte // 16).  The oracle
    re-derives every bin count from the cycled-byte synthesis
    arithmetic (full_cycles × per-bin byte count + the remainder
    prefix's per-bin count), entirely in SQL."""
    payloads = M.attach_payload(_docs(sf_dir), media="bmp")
    return M.image_hist(payloads)


# pixel array = np.resize(utf8_bytes, side*side*3): each bin count =
# (total // n) * count(bytes in bin) + count(bytes[:total % n] in bin)
_SQL_IMAGE_HIST = """
WITH d AS (
  SELECT doc_id, text, length(text) AS n,
         greatest(4, least(32, floor(sqrt(length(text)))::INT)) AS side
  FROM documents
),
pos AS (
  SELECT d.doc_id, d.n, d.side * d.side * 3 AS total, t.i AS i,
         ascii(substr(d.text, t.i, 1)) // 16 AS b
  FROM d, unnest(generate_series(1, d.n)) AS t(i)
),
cnt AS (
  SELECT doc_id, b,
         count(*) AS c_all,
         count(*) FILTER (i <= total % n) AS c_rem,
         any_value(total) AS total, any_value(n) AS n
  FROM pos GROUP BY doc_id, b
),
bins AS (
  SELECT d.doc_id, g.b FROM d, unnest(generate_series(0, 15)) AS g(b)
)
SELECT bins.doc_id::BIGINT AS doc_id, bins.b::BIGINT AS bin,
       coalesce((cnt.total // cnt.n) * cnt.c_all + cnt.c_rem, 0)::BIGINT
         AS n_px
FROM bins LEFT JOIN cnt ON bins.doc_id = cnt.doc_id AND bins.b = cnt.b
"""

QUERIES["multimodal_image_hist"] = q_multimodal_image_hist
ORACLES["multimodal_image_hist"] = _SQL_IMAGE_HIST


def q_docs_temperature_sample(sf_dir: str):
    """√-temperature mixture sampling (τ = 2): per-source quota =
    isqrt(n_source), filled by the smallest-md5(doc_id) docs — the
    standard temperature rebalancing of a training mix (large sources
    down-weighted toward √n, small sources kept nearly whole),
    deterministic across cluster sizes and retries.  Source counts are
    a ≤10-row broadcast; selection is the stratified-sample machinery
    with a per-source k.  isqrt and SQL floor(sqrt(n::DOUBLE)) agree
    exactly for corpus-scale n (a correctly-rounded double sqrt of a
    non-square below 2^52 never rounds onto an integer)."""
    import math

    from ..stages.dedup import _md5_u64
    from ..util import bucket_agg, bucket_count

    ds = ray.data.read_parquet(
        f"{sf_dir}/documents.parquet", columns=["doc_id", "source"]
    )
    counts = bucket_count(
        ds.map_batches(
            lambda df: df[["source"]].astype({"source": "string"}),
            batch_format="pandas",
        ),
        ["source"],
        out_col="n",
    ).to_pandas()
    quota = {
        s: math.isqrt(int(n)) for s, n in zip(counts["source"], counts["n"])
    }

    def with_hash(df: pd.DataFrame) -> pd.DataFrame:
        ids = df["doc_id"].astype("int64")
        return pd.DataFrame(
            {
                "doc_id": ids,
                "source": df["source"].astype("string"),
                "h": pd.Series(
                    [_md5_u64(str(i)) for i in ids], dtype="uint64",
                    index=df.index,
                ),
            }
        )

    def pick(df: pd.DataFrame) -> pd.DataFrame:
        ranked = df.sort_values(["source", "h", "doc_id"])
        rn = ranked.groupby("source", sort=False).cumcount() + 1
        k = ranked["source"].map(quota).astype("int64")
        top = ranked.loc[(rn <= k).to_numpy()]
        return top[["doc_id", "source"]].reset_index(drop=True)

    return bucket_agg(
        ds.map_batches(with_hash, batch_format="pandas"), ["source"], pick
    )


_SQL_TEMPERATURE_SAMPLE = """
WITH n AS (SELECT source, count(*) AS n FROM documents GROUP BY source),
r AS (
  SELECT doc_id, source,
         row_number() OVER (
           PARTITION BY source
           ORDER BY md5_number_lower(doc_id::VARCHAR), doc_id
         ) AS rn
  FROM documents
)
SELECT r.doc_id::BIGINT AS doc_id, r.source
FROM r JOIN n ON r.source = n.source
WHERE r.rn <= CAST(floor(sqrt(n.n)) AS BIGINT)
"""

QUERIES["docs_temperature_sample"] = q_docs_temperature_sample
ORACLES["docs_temperature_sample"] = _SQL_TEMPERATURE_SAMPLE


def q_docs_containment_pairs(sf_dir: str):
    """Exact global DIRECTED shingle-containment join (≥ 8/10 of the
    contained side) — sub-document duplication that Jaccard misses when
    |b| ≫ |a| (stages/dedup.containment_pairs: A-side-only prefix
    filter, ppjoin-style distributed intersection verify, integer-ppm
    scores).  Oracle recomputes the full directed join without the
    prefix filter, so the filter's losslessness is checked too."""
    ds = D.containment_pairs(
        _docs(sf_dir), threshold_num=8, threshold_den=10, shingle_k=3
    )
    pdf = ds.to_pandas()
    if not len(pdf):
        return pd.DataFrame(
            {
                "doc_id_a": pd.Series(dtype="int64"),
                "doc_id_b": pd.Series(dtype="int64"),
                "containment_ppm": pd.Series(dtype="int64"),
            }
        )
    return pdf


_SQL_CONTAINMENT = rf"""
WITH toks AS (
  SELECT doc_id, regexp_extract_all(coalesce(text, ''), '\S+') AS w FROM documents
),
shp AS (
  SELECT doc_id, unnest(list_distinct(
    CASE WHEN length(w) = 0 THEN []::VARCHAR[]
         WHEN length(w) < 3 THEN [array_to_string(w, ' ')]
         ELSE list_transform(generate_series(1, length(w) - 2),
                             i -> array_to_string(w[i:i + 2], ' '))
    END)) AS s
  FROM toks
),
sh2 AS (
  SELECT DISTINCT doc_id,
         (md5_number_lower(s) % (1::HUGEINT << 61))::BIGINT AS h
  FROM shp
),
sizes AS (SELECT doc_id, count(*) AS n FROM sh2 GROUP BY doc_id),
inter AS (
  SELECT a.doc_id AS a, b.doc_id AS b, count(*) AS i
  FROM sh2 a JOIN sh2 b ON a.h = b.h AND a.doc_id <> b.doc_id
  GROUP BY 1, 2
)
SELECT i.a::BIGINT AS doc_id_a, i.b::BIGINT AS doc_id_b,
       (i.i * 1000000 // sa.n)::BIGINT AS containment_ppm
FROM inter i JOIN sizes sa ON sa.doc_id = i.a
WHERE i.i * 10 >= sa.n * 8
"""

QUERIES["docs_containment_pairs"] = q_docs_containment_pairs
ORACLES["docs_containment_pairs"] = _SQL_CONTAINMENT


def q_knn_int8_recall(sf_dir: str):
    """Scalar-quantization ANN audit: per query, does the int8-code
    cosine top-5 (stages/embedding.int8_topk — 4× memory compression)
    keep ≥ 4 of the exact float top-5?  Graded like knn_ivf_recall by a
    recall bound (quantized rankings have no exact-output oracle); any
    quantization-recall regression flips a row and fails the hash."""
    embs = _embs(sf_dir)
    exact = E.knn_topk(embs, query_ids=list(range(10)), k=5)
    q8 = E.int8_topk(embs, query_ids=list(range(10)), k=5)
    ex = exact.groupby("query_id")["neighbor_id"].apply(set)
    qs = q8.groupby("query_id")["neighbor_id"].apply(set)
    qids = sorted(ex.index)
    return pd.DataFrame(
        {
            "query_id": pd.array(qids, dtype="int64"),
            "recall_ok": [len(ex[q] & qs.get(q, set())) >= 4 for q in qids],
        }
    )


_SQL_INT8_RECALL = """
SELECT vec_id::BIGINT AS query_id, true AS recall_ok
FROM embeddings WHERE vec_id < 10
"""

QUERIES["knn_int8_recall"] = q_knn_int8_recall
ORACLES["knn_int8_recall"] = _SQL_INT8_RECALL


# -- search serving: boolean-AND postings intersection -----------------------


def _top2_query_patterns(sf_dir: str):
    """The deterministic two-token 'user query' shared by the postings
    retrieval queries: the two globally most frequent tokens (count
    DESC, token ASC) compiled as token-boundary regexes —
    (?<!\\S)tok(?!\\S) is exactly the \\S+ tokenizer's notion of one
    token, and this single definition keeps postings_and_query and
    postings_bm25_topk (and their oracles) from desynchronizing."""
    import re as _re

    top2 = q_vocab_topk(sf_dir, k=2)["token"].tolist()
    tok_a, tok_b = sorted(top2)
    pat_a = _re.compile(r"(?<!\S)" + _re.escape(tok_a) + r"(?!\S)")
    pat_b = _re.compile(r"(?<!\S)" + _re.escape(tok_b) + r"(?!\S)")
    return pat_a, pat_b


def q_postings_and_query(sf_dir: str):
    """Boolean-AND retrieval over the inverted index: resolve the two
    globally most frequent tokens (count DESC, token ASC — a
    deterministic stand-in for a user query), then return every
    document containing BOTH, with per-doc term frequencies — the
    serving-side postings-intersection a search stack runs against the
    index q_postings_index builds.

    Two streamed passes: pass 1 is the shared map-side-combined token
    count (vocabulary-sized exchange, driver sees only block top-k
    candidates); pass 2 re-scans the corpus counting just the two query
    tokens per doc with vectorized ``str.count`` on a token-boundary
    regex ((?<!\\S)tok(?!\\S) — exactly the \\S+ tokenizer's notion of a
    token), filtering docs where both hit.  No shuffle in pass 2 at
    all: doc rows already carry everything the predicate needs."""
    pat_a, pat_b = _top2_query_patterns(sf_dir)

    def hits(df: pd.DataFrame) -> pd.DataFrame:
        text = df["text"].fillna("")
        n_a = text.str.count(pat_a).astype("int64")
        n_b = text.str.count(pat_b).astype("int64")
        m = (n_a > 0) & (n_b > 0)
        return pd.DataFrame(
            {
                "doc_id": df.loc[m, "doc_id"].astype("int64"),
                "n_a": n_a[m],
                "n_b": n_b[m],
            }
        )

    return _docs(sf_dir).map_batches(hits, batch_format="pandas")


_SQL_POSTINGS_AND = r"""
WITH occ AS (
  SELECT doc_id, unnest(regexp_extract_all(coalesce(text, ''), '\S+')) AS token
  FROM documents
),
top2 AS (
  SELECT token FROM occ GROUP BY token
  ORDER BY count(*) DESC, token LIMIT 2
),
q AS (SELECT token, row_number() OVER (ORDER BY token) AS r FROM top2),
c AS (
  SELECT o.doc_id,
         coalesce(sum(CASE WHEN q.r = 1 THEN 1 END), 0)::BIGINT AS n_a,
         coalesce(sum(CASE WHEN q.r = 2 THEN 1 END), 0)::BIGINT AS n_b
  FROM occ o JOIN q USING (token) GROUP BY 1
)
SELECT doc_id, n_a, n_b FROM c WHERE n_a > 0 AND n_b > 0
"""

QUERIES["postings_and_query"] = q_postings_and_query
ORACLES["postings_and_query"] = _SQL_POSTINGS_AND


# -- sketch set operations: KMV union / intersection estimates ---------------


def q_kmv_source_overlap(sf_dir: str, k: int = 64):
    """Sketch SET OPERATIONS: for every source pair, estimate the token
    UNION and INTERSECTION cardinalities from the per-source KMV
    sketches alone — the mergeable-summary algebra that lets a 100 TB
    corpus answer overlap questions (shared vocabulary, contamination
    surface) without ever co-shuffling token occurrences.

    Per-source k-min sets build exactly like distinct_sketch_kmv
    (map-side distinct + k-min partials, one source-bucketed merge);
    the pairwise combine runs on ≤ |sources| × k driver rows (bounded
    state).  Estimators are the deterministic integer forms: union =
    (k−1)·2^61 // kth of the combined k-min set (exact when < k), and
    intersection = matches · union_est // K where matches counts
    combined-k-min hashes present in BOTH sketches (Beyer et al.'s
    ρ·|A∪B| with integer arithmetic) — every value reproduced
    bit-exactly by the DuckDB twin."""
    from ..stages.dedup import _md5_u64_cached, kmv_sketch, tokens
    from ..util import bucket_agg

    def partial(df: pd.DataFrame) -> pd.DataFrame:
        per: dict[str, set[int]] = {}
        for src, t in zip(df["source"], df["text"].fillna("")):
            s = per.setdefault(src, set())
            for tok in tokens(t):
                s.add(_md5_u64_cached(tok) & ((1 << 61) - 1))
        rows_s, rows_h = [], []
        for src, hs in per.items():
            keep = sorted(hs)[:k]
            rows_s.extend([src] * len(keep))
            rows_h.extend(keep)
        return pd.DataFrame(
            {
                "source": pd.Series(rows_s, dtype="string"),
                "h": pd.Series(rows_h, dtype="uint64"),
            }
        )

    def merge(df: pd.DataFrame) -> pd.DataFrame:
        rows_s, rows_h = [], []
        for src, g in df.groupby("source", sort=False):
            keep = sorted(set(int(v) for v in g["h"]))[:k]
            rows_s.extend([src] * len(keep))
            rows_h.extend(keep)
        return pd.DataFrame(
            {
                "source": pd.Series(rows_s, dtype="string"),
                "h": pd.Series(rows_h, dtype="int64"),
            }
        )

    sketches = bucket_agg(
        _docs(sf_dir).map_batches(partial, batch_format="pandas"),
        ["source"],
        merge,
    ).to_pandas()

    per_src = {
        src: set(g["h"].tolist())
        for src, g in sketches.groupby("source", sort=False)
    }
    rows = []
    for sa in sorted(per_src):
        for sb in sorted(per_src):
            if sa >= sb:
                continue
            a, b = per_src[sa], per_src[sb]
            union_kmin = sorted(a | b)[:k]
            kk = len(union_kmin)
            kth, union_est = kmv_sketch(union_kmin, k)
            matches = sum(1 for h in union_kmin if h in a and h in b)
            inter_est = matches * union_est // kk if kk else 0
            rows.append((sa, sb, matches, union_est, inter_est))
    out = pd.DataFrame(
        rows, columns=["src_a", "src_b", "matches", "union_est", "inter_est"]
    )
    return out.astype(
        {
            "src_a": "string",
            "src_b": "string",
            "matches": "int64",
            "union_est": "int64",
            "inter_est": "int64",
        }
    ).sort_values(["src_a", "src_b"], ignore_index=True)


_SQL_KMV_OVERLAP = r"""
WITH th AS (
  SELECT DISTINCT source,
         (md5_number_lower(unnest(regexp_extract_all(coalesce(text, ''), '\S+')))
          % (1::HUGEINT << 61))::BIGINT AS h
  FROM documents
),
sk AS (
  SELECT source, h FROM (
    SELECT source, h,
           row_number() OVER (PARTITION BY source ORDER BY h) AS rn
    FROM th
  ) WHERE rn <= 64
),
srcs AS (SELECT DISTINCT source FROM sk),
pr AS (
  SELECT a.source AS src_a, b.source AS src_b
  FROM srcs a JOIN srcs b ON a.source < b.source
),
uni AS (
  SELECT p.src_a, p.src_b, s.h,
         count(DISTINCT s.source)::BIGINT AS both_cnt
  FROM pr p JOIN sk s ON s.source = p.src_a OR s.source = p.src_b
  GROUP BY 1, 2, 3
),
ru AS (
  SELECT src_a, src_b, h, both_cnt,
         row_number() OVER (PARTITION BY src_a, src_b ORDER BY h) AS rn,
         count(*) OVER (PARTITION BY src_a, src_b) AS n_u
  FROM uni
),
agg AS (
  SELECT src_a, src_b,
         max(h) AS kth,
         least(max(n_u), 64) AS kk,
         max(n_u) AS n_u,
         coalesce(sum(CASE WHEN both_cnt = 2 THEN 1 END), 0)::BIGINT AS matches
  FROM ru WHERE rn <= least(n_u, 64)
  GROUP BY 1, 2
)
SELECT src_a, src_b, matches,
       CASE WHEN n_u >= 64 THEN (63 * (1::HUGEINT << 61) // kth)::BIGINT
            ELSE n_u::BIGINT END AS union_est,
       ((matches * CASE WHEN n_u >= 64 THEN 63 * (1::HUGEINT << 61) // kth
                        ELSE n_u::HUGEINT END) // kk)::BIGINT AS inter_est
FROM agg ORDER BY 1, 2
"""

QUERIES["kmv_source_overlap"] = q_kmv_source_overlap
ORACLES["kmv_source_overlap"] = _SQL_KMV_OVERLAP


# -- ranked retrieval: BM25 top-k --------------------------------------------


def q_postings_bm25_topk(sf_dir: str, k: int = 20):
    """BM25-ranked retrieval for the deterministic two-token query
    (the postings_and_query query, now scored): Robertson ratio idf
    ((N − df + 0.5)/(df + 0.5) — the ratio form, NOT ln, for the same
    reason doc_tfidf_topk documents: a transcendental would hostage the
    oracle to libm ulps) and the standard k1=1.2 / b=0.75 saturation.
    Each term's weight is algebraically cleared to ONE division of two
    exact int64s (k1/b constants ×10: w = (2N−2df+1)·22·tf·Σlen /
    ((2df+1)·(10·Σlen·tf + 3·Σlen + 9·nt·N))), because a
    multi-step float pipeline diverged from DuckDB by 1 ulp on half
    the scores (measured) — single-division doubles hash bit-exactly.
    int64 headroom: numerator ≈ 44·N·tf·Σlen must stay < 2^63 (and
    < 2^53 for the double conversion to be exact); petabyte corpora
    would widen to HUGEINT/float128 partials (documented limit).

    Three streamed passes, zero shuffles: (1) the shared map-side
    token-count top-2; (2) corpus stats — N, Σlen, per-term df — as
    map-side partial sums collapsing to one driver row; (3) scoring,
    where each batch ranks its own docs against the broadcast stats and
    only per-block top-k candidates (k rows per block) reach the
    driver.  Exact because a doc lives in exactly one batch and scores
    are final the moment they're computed."""
    import re as _re

    pat_a, pat_b = _top2_query_patterns(sf_dir)
    pat_t = _re.compile(r"\S+")

    def stat_partial(df: pd.DataFrame) -> pd.DataFrame:
        text = df["text"].fillna("")
        nt = text.str.count(pat_t).astype("int64")
        na = text.str.count(pat_a).astype("int64")
        nb = text.str.count(pat_b).astype("int64")
        return pd.DataFrame(
            {
                "n_docs": pd.array([len(df)], dtype="int64"),
                "sum_len": pd.array([int(nt.sum())], dtype="int64"),
                "df_a": pd.array([int((na > 0).sum())], dtype="int64"),
                "df_b": pd.array([int((nb > 0).sum())], dtype="int64"),
            }
        )

    stats = (
        _docs(sf_dir)
        .map_batches(stat_partial, batch_format="pandas")
        .to_pandas()
        .sum()
    )
    n_docs, sum_len = int(stats["n_docs"]), int(stats["sum_len"])
    df_a, df_b = int(stats["df_a"]), int(stats["df_b"])
    idf_num_a, idf_den_a = 2 * n_docs - 2 * df_a + 1, 2 * df_a + 1
    idf_num_b, idf_den_b = 2 * n_docs - 2 * df_b + 1, 2 * df_b + 1

    def block_topk(df: pd.DataFrame) -> pd.DataFrame:
        text = df["text"].fillna("")
        nt = text.str.count(pat_t).to_numpy("int64")
        tf_a = text.str.count(pat_a).to_numpy("int64")
        tf_b = text.str.count(pat_b).to_numpy("int64")
        base = 3 * sum_len + 9 * nt * n_docs
        w_a = (idf_num_a * 22 * sum_len * tf_a).astype("float64") / (
            idf_den_a * (10 * sum_len * tf_a + base)
        ).astype("float64")
        w_b = (idf_num_b * 22 * sum_len * tf_b).astype("float64") / (
            idf_den_b * (10 * sum_len * tf_b + base)
        ).astype("float64")
        score = w_a + w_b
        out = pd.DataFrame(
            {
                "doc_id": df["doc_id"].astype("int64"),
                "score": score,
            }
        )
        out = out[(tf_a + tf_b) > 0]
        return out.sort_values(
            ["score", "doc_id"], ascending=[False, True]
        ).head(k)

    cands = (
        _docs(sf_dir)
        .map_batches(block_topk, batch_format="pandas")
        .to_pandas()
        .sort_values(["score", "doc_id"], ascending=[False, True])
        .head(k)
        .reset_index(drop=True)
    )
    cands["rank"] = pd.array(range(1, len(cands) + 1), dtype="int64")
    return cands.astype({"doc_id": "int64", "score": "float64"})


_SQL_BM25 = r"""
WITH occ AS (
  SELECT doc_id, unnest(regexp_extract_all(coalesce(text, ''), '\S+')) AS token
  FROM documents
),
top2 AS (
  SELECT token FROM occ GROUP BY token
  ORDER BY count(*) DESC, token LIMIT 2
),
q AS (SELECT token, row_number() OVER (ORDER BY token) AS r FROM top2),
nt AS (
  SELECT doc_id,
         len(regexp_extract_all(coalesce(text, ''), '\S+'))::BIGINT AS nt
  FROM documents
),
tfq AS (
  SELECT o.doc_id,
         coalesce(sum(CASE WHEN q.r = 1 THEN 1 END), 0)::BIGINT AS tf_a,
         coalesce(sum(CASE WHEN q.r = 2 THEN 1 END), 0)::BIGINT AS tf_b
  FROM occ o JOIN q USING (token) GROUP BY 1
),
stats AS (
  SELECT (SELECT count(*) FROM documents)::BIGINT AS n_docs,
         (SELECT sum(nt) FROM nt)::BIGINT AS sum_len,
         (SELECT count(*) FROM tfq WHERE tf_a > 0)::BIGINT AS df_a,
         (SELECT count(*) FROM tfq WHERE tf_b > 0)::BIGINT AS df_b
),
scored AS (
  SELECT n.doc_id,
         (((2 * s.n_docs - 2 * s.df_a + 1) * 22 * s.sum_len * t.tf_a)::DOUBLE
          / ((2 * s.df_a + 1)
             * (10 * s.sum_len * t.tf_a + 3 * s.sum_len + 9 * n.nt * s.n_docs))::DOUBLE)
         + (((2 * s.n_docs - 2 * s.df_b + 1) * 22 * s.sum_len * t.tf_b)::DOUBLE
            / ((2 * s.df_b + 1)
               * (10 * s.sum_len * t.tf_b + 3 * s.sum_len + 9 * n.nt * s.n_docs))::DOUBLE)
           AS score
  FROM tfq t JOIN nt n USING (doc_id) CROSS JOIN stats s
  WHERE t.tf_a + t.tf_b > 0
)
SELECT doc_id, score,
       row_number() OVER (ORDER BY score DESC, doc_id)::BIGINT AS rank
FROM scored
ORDER BY score DESC, doc_id LIMIT 20
"""

QUERIES["postings_bm25_topk"] = q_postings_bm25_topk
ORACLES["postings_bm25_topk"] = _SQL_BM25


# -- binary-quantized retrieval: sign bits + Hamming top-k --------------------


def q_knn_sign_hamming(sf_dir: str, k: int = 5, n_queries: int = 10):
    """Binary (1-bit) quantized retrieval: embeddings collapse to their
    SIGN bits (64 dims → one uint64 word) and ranking is Hamming
    distance — the 32×-compression serving tier under int8/PQ, where a
    100 TB vector corpus becomes CPU-popcount-bound instead of
    memory-bandwidth-bound.

    The packed query words broadcast once (ray.put); each block packs
    its own rows with ``np.packbits``, XORs against every query in one
    vectorized op, popcounts via the same unpackbits-free SWAR kernel
    shape as simhash, and only per-block top-k candidates reach the
    driver.  Exact deterministic output (distance ASC, neighbor_id) so
    the oracle recomputes the full ranking from sign comparisons."""
    from ..util import auto_concurrency

    import ray

    ds = _embs(sf_dir)
    qrows = ds.filter(expr=f"vec_id in {list(range(n_queries))}").take_all()
    qrows.sort(key=lambda r: r["vec_id"])
    qmat = np.array([r["embedding"] for r in qrows], dtype=np.float64)
    qbits = np.packbits(qmat >= 0, axis=1)  # (nq, dims/8) uint8
    qref = ray.put({"ids": [int(r["vec_id"]) for r in qrows], "bits": qbits})

    _POP = np.unpackbits(np.arange(256, dtype=np.uint8)[:, None], axis=1).sum(
        axis=1
    )  # 256-entry popcount LUT, built once per process

    class BlockTopK:
        def __init__(self, query_ref, k: int):
            q = ray.get(query_ref) if isinstance(
                query_ref, ray.ObjectRef
            ) else query_ref
            self.qids = q["ids"]
            self.qbits = q["bits"]
            self.k = k

        def __call__(self, df: pd.DataFrame) -> pd.DataFrame:
            if not len(df):
                return pd.DataFrame(
                    {
                        "query_id": pd.array([], dtype="int64"),
                        "neighbor_id": pd.array([], dtype="int64"),
                        "hamming": pd.array([], dtype="int64"),
                    }
                )
            mat = np.stack(
                [np.asarray(v, dtype=np.float64) for v in df["embedding"]]
            )
            bits = np.packbits(mat >= 0, axis=1)  # (n, dims/8)
            ids = df["vec_id"].to_numpy("int64")
            # (nq, n, dims/8) xor → LUT popcount → (nq, n) distances
            ham = _POP[self.qbits[:, None, :] ^ bits[None, :, :]].sum(axis=2)
            out_q, out_n, out_h = [], [], []
            kk = min(self.k + 1, ham.shape[1])
            for qi, qid in enumerate(self.qids):
                row = ham[qi]
                top = np.lexsort((ids, row))[:kk]
                for j in top:
                    if ids[j] != qid:
                        out_q.append(qid)
                        out_n.append(int(ids[j]))
                        out_h.append(int(row[j]))
            return pd.DataFrame(
                {
                    "query_id": pd.array(out_q, dtype="int64"),
                    "neighbor_id": pd.array(out_n, dtype="int64"),
                    "hamming": pd.array(out_h, dtype="int64"),
                }
            )

    cands = ds.map_batches(
        BlockTopK,
        fn_constructor_kwargs={"query_ref": qref, "k": k},
        batch_format="pandas",
        concurrency=auto_concurrency(None),
    ).to_pandas()
    cands = cands.sort_values(
        ["query_id", "hamming", "neighbor_id"], ignore_index=True
    )
    top = cands.groupby("query_id", sort=True).head(k).reset_index(drop=True)
    top["rank"] = (top.groupby("query_id").cumcount() + 1).astype("int64")
    return top.astype(
        {"query_id": "int64", "neighbor_id": "int64", "hamming": "int64"}
    )


_SQL_SIGN_HAMMING = """
SELECT query_id, neighbor_id, hamming, rank FROM (
  SELECT q.vec_id::BIGINT AS query_id, n.vec_id::BIGINT AS neighbor_id,
         list_sum(list_transform(list_zip(q.embedding, n.embedding),
           x -> CASE WHEN (x[1] >= 0) <> (x[2] >= 0) THEN 1 ELSE 0 END
         ))::BIGINT AS hamming,
         row_number() OVER (
           PARTITION BY q.vec_id
           ORDER BY list_sum(list_transform(list_zip(q.embedding, n.embedding),
             x -> CASE WHEN (x[1] >= 0) <> (x[2] >= 0) THEN 1 ELSE 0 END)),
             n.vec_id
         )::BIGINT AS rank
  FROM embeddings q, embeddings n
  WHERE q.vec_id < 10 AND n.vec_id != q.vec_id
) WHERE rank <= 5
ORDER BY query_id, rank
"""

QUERIES["knn_sign_hamming"] = q_knn_sign_hamming
ORACLES["knn_sign_hamming"] = _SQL_SIGN_HAMMING


# -- composed end-to-end corpus build -----------------------------------------


def q_corpus_build_manifest(sf_dir: str):
    """The END-TO-END training-corpus build, composed from the engine's
    own stages and verified as ONE exact oracle: Gopher quality filter
    → benchmark decontamination (eval split held out, its 8-gram
    shingles broadcast — GPT-3-appendix-C-style long n-grams: 3-grams
    measured ~100% false-hit rate on this small-vocabulary corpus) → normalized exact dedup (keep min doc_id per
    normalized form) → per-source manifest with GPT-style
    concat-and-chunk sequence counts (⌈Σtokens / 512⌉).  This is the
    pipeline a "switch from the reference" user actually ships; every
    intermediate rides a stage that already has its own oracle
    (docs_gopher_filter, contamination, dedup_normalized,
    pack_sequences), and the composition itself is what this query
    pins — an off-by-one in stage ORDER (e.g. dedup before
    decontamination) changes the manifest and fails the hash.

    Scale shape: three streamed map passes + exact_dedup's single
    digest-bucketed shuffle; the only driver state is the eval-split
    shingle set (benchmark-scale by construction) and the |sources|
    manifest rows."""
    import re

    from ..functions.text import gopher_filter
    from ..stages import dedup as D
    from ..stages.dedup import _md5_u64, shingle_set

    import ray

    docs = _docs(sf_dir)

    # the gate is the Gopher conjunction MINUS the stopword rule: the
    # synthetic corpus is stopword-free by construction (r_stop fails on
    # every doc — verified), and a gate that keeps nothing pins nothing;
    # the six structural rules discriminate (~45% survive at sf0.01)
    _RULES = ["r_nwords", "r_wordlen", "r_sym", "r_bullet",
              "r_ellipsis", "r_alpha"]

    def survive(df: pd.DataFrame) -> pd.DataFrame:
        g = gopher_filter(df)
        g = g[g[_RULES].all(axis=1)]
        m = df.merge(g[["doc_id", "n_words"]], on="doc_id")
        return pd.DataFrame(
            {
                "doc_id": m["doc_id"].astype("int64"),
                "text": m["text"].fillna("").astype("string"),
                "source": m["source"].astype("string"),
                "n_words": m["n_words"].astype("int64"),
            }
        )

    s1 = docs.map_batches(survive, batch_format="pandas")

    def bench_grams(df: pd.DataFrame) -> pd.DataFrame:
        grams: set[str] = set()
        for i, t in zip(df["doc_id"], df["text"]):
            if _md5_u64(str(int(i))) % 20 == 0:
                grams.update(shingle_set(t, 8))
        return pd.DataFrame({"g": sorted(grams)})

    gdf = s1.map_batches(bench_grams, batch_format="pandas").to_pandas()
    bench = frozenset(gdf["g"]) if len(gdf) else frozenset()
    ref = ray.put(bench)

    drop_re = re.compile(r"[^a-z0-9\s]", re.ASCII)
    ws_re = re.compile(r"\s+", re.ASCII)

    def clean(df: pd.DataFrame) -> pd.DataFrame:
        b = ray.get(ref)
        is_train = np.array(
            [_md5_u64(str(int(i))) % 20 != 0 for i in df["doc_id"]]
        )
        hit = np.array(
            [
                any(s in b for s in shingle_set(t, 8))
                for t in df["text"]
            ]
        )
        m = df[is_train & ~hit]
        norm = (
            m["text"]
            .str.lower()
            .str.replace(drop_re, "", regex=True)
            .str.replace(ws_re, " ", regex=True)
            .str.strip()
        )
        return pd.DataFrame(
            {
                "doc_id": m["doc_id"].astype("int64"),
                "source": m["source"].astype("string"),
                "n_words": m["n_words"].astype("int64"),
                "norm": norm.astype("string"),
            }
        )

    kept = D.exact_dedup(s1.map_batches(clean, batch_format="pandas"),
                         text_col="norm")

    def part(df: pd.DataFrame) -> pd.DataFrame:
        g = df.groupby("source", as_index=False, sort=False).agg(
            n_docs=("doc_id", "size"), n_tokens=("n_words", "sum")
        )
        return g.astype(
            {"source": "string", "n_docs": "int64", "n_tokens": "int64"}
        )

    parts = kept.map_batches(part, batch_format="pandas").to_pandas()
    if not len(parts):
        # an all-filtered corpus yields a typed empty manifest
        parts = pd.DataFrame(
            {"source": pd.array([], dtype="string"),
             "n_docs": pd.array([], dtype="int64"),
             "n_tokens": pd.array([], dtype="int64")}
        )
    out = parts.groupby("source", as_index=False).sum()
    out["n_sequences"] = (out["n_tokens"] + 511) // 512
    return out.astype(
        {
            "source": "string", "n_docs": "int64",
            "n_tokens": "int64", "n_sequences": "int64",
        }
    ).sort_values("source", ignore_index=True)


_SQL_CORPUS_BUILD = rf"""
{_SQL_GOPHER_CTES},
s1 AS (
  SELECT d.doc_id, d.text, d.source, j.w AS n_words
  FROM d JOIN j USING (doc_id)
  WHERE j.w >= 50 AND j.w <= 100000 AND 3 * j.w <= j.sl AND j.sl <= 10 * j.w
    AND 10 * j.n_sym <= j.w AND 10 * j.n_bullet <= 9 * j.n_lines
    AND 10 * j.n_ell <= 3 * j.n_lines AND 5 * j.na >= 4 * j.w
),
sw AS (SELECT doc_id, regexp_extract_all(text, '\S+') AS w FROM s1),
sh AS (
  SELECT doc_id, unnest(list_distinct(
    CASE WHEN length(w) = 0 THEN []::VARCHAR[]
         WHEN length(w) < 8 THEN [array_to_string(w, ' ')]
         ELSE list_transform(generate_series(1, length(w) - 7),
                             i -> array_to_string(w[i:i + 7], ' '))
    END)) AS s
  FROM sw
),
bench AS (
  SELECT DISTINCT s FROM sh
  WHERE md5_number_lower(doc_id::VARCHAR) % 20 = 0
),
contam AS (SELECT DISTINCT sh.doc_id FROM sh JOIN bench USING (s)),
clean AS (
  SELECT doc_id, source, n_words,
         trim(regexp_replace(
           regexp_replace(lower(text), '[^a-z0-9\s]', '', 'g'),
           '\s+', ' ', 'g')) AS norm
  FROM s1
  WHERE md5_number_lower(doc_id::VARCHAR) % 20 != 0
    AND doc_id NOT IN (SELECT doc_id FROM contam)
),
kept AS (SELECT min(doc_id) AS doc_id FROM clean GROUP BY norm)
SELECT source, count(*)::BIGINT AS n_docs, sum(n_words)::BIGINT AS n_tokens,
       ((sum(n_words) + 511) // 512)::BIGINT AS n_sequences
FROM clean JOIN kept USING (doc_id)
GROUP BY source ORDER BY source
"""

QUERIES["corpus_build_manifest"] = q_corpus_build_manifest
ORACLES["corpus_build_manifest"] = _SQL_CORPUS_BUILD


# -- sparse weighted TF cosine similarity join ------------------------------

# tuning constants shared by the Ray side and the generated oracle SQL so
# the two sides cannot drift: posting lists longer than _SIM_MAX_DF are
# pruned from BOTH the dot products and the norms (similarity is defined
# in the pruned space — the standard df-cutoff that bounds pair fan-out
# by |vocab|·MAX_DF² and drops only tokens too common to discriminate);
# pairs kept when cos² ≥ _SIM_TAU2_BP/10000, tested by integer
# cross-multiplication so no sqrt/float ever enters the contract.
_SIM_MAX_DF = 100
_SIM_TAU2_BP = 2500  # (cos ≥ 0.5)²·10⁴


def q_docs_tfidf_simjoin(sf_dir: str):
    """Weighted sparse all-pairs similarity join (Bayardo et al.,
    WWW'07 shape) over term-frequency vectors — the WEIGHTED
    counterpart of dedup_ppjoin_pairs' set-semantics join: pairs of
    documents whose tf-vector cosine (computed in the df-pruned space)
    passes the threshold, found from inverted posting lists with no
    all-pairs matmul and no broadcast of anything corpus-sized.

    Scale shape: one map pass builds (doc_id, token, tf) postings;
    token document-frequencies aggregate through ONE coarse-bucketed
    sum (vocab-scale output); the df-keep set broadcasts via ray.put
    (vocabulary after pruning-eligibility is bounded, documented);
    candidate pairs with partial products are generated inside a
    token-bucketed groupby (posting lists capped at _SIM_MAX_DF rows);
    pair dots reduce through coarse-bucketed sums.  Per-doc norms are
    computed as a doc-scale Dataset and joined onto the postings with
    ONE doc-keyed partitioned hash join (never a driver dict — that
    would be a corpus-sized broadcast), so every pair row carries its
    norms and the final threshold is map-side.

    Everything is integer (dot, norms, the cross-multiplied threshold),
    so the DuckDB oracle hashes bit-identically."""
    from collections import Counter

    import ray

    from ..stages.dedup import tokens as _tok
    from ..util import bucket_agg, bucket_sum

    docs = _docs(sf_dir)

    def postings(df: pd.DataFrame) -> pd.DataFrame:
        ids, toks, tfs = [], [], []
        for doc_id, t in zip(df["doc_id"].astype("int64"), df["text"].fillna("")):
            c = Counter(_tok(t))
            ids.extend([doc_id] * len(c))
            toks.extend(c.keys())
            tfs.extend(c.values())
        return pd.DataFrame(
            {
                "doc_id": pd.array(ids, dtype="int64"),
                "token": pd.array(toks, dtype="string"),
                "tf": pd.array(tfs, dtype="int64"),
            }
        )

    post = docs.map_batches(postings, batch_format="pandas").materialize()

    dfr = post.map_batches(
        lambda df: pd.DataFrame(
            {"token": df["token"], "nd": pd.Series(1, index=df.index, dtype="int64")}
        ),
        batch_format="pandas",
    )
    df_tab = bucket_sum(dfr, ["token"], ["nd"]).to_pandas()
    keep = frozenset(df_tab.loc[df_tab["nd"] <= _SIM_MAX_DF, "token"])
    keep_ref = ray.put(keep)

    def prune(df: pd.DataFrame) -> pd.DataFrame:
        k = ray.get(keep_ref)
        return df[df["token"].isin(k)].reset_index(drop=True)

    kept = post.map_batches(prune, batch_format="pandas").materialize()

    # per-doc norms in the pruned space (doc-scale)
    def sq(df: pd.DataFrame) -> pd.DataFrame:
        return pd.DataFrame(
            {
                "doc_id": df["doc_id"].astype("int64"),
                "sq": (df["tf"].astype("int64") ** 2),
            }
        )

    def _typed_empty() -> pd.DataFrame:
        return pd.DataFrame(
            {
                "doc_a": pd.Series(dtype="int64"),
                "doc_b": pd.Series(dtype="int64"),
                "dot": pd.Series(dtype="int64"),
                "norm_a": pd.Series(dtype="int64"),
                "norm_b": pd.Series(dtype="int64"),
            }
        )

    # a corpus where EVERY token exceeds _SIM_MAX_DF (e.g. 10x exact
    # duplication of a small-vocabulary corpus) prunes every posting;
    # an all-empty Dataset round-trips to a COLUMNLESS pandas frame, so
    # short-circuit before indexing it (found by the sf1 scale probe)
    if not keep:
        return _typed_empty()
    # norms stay a DATASET and reach the pair stage through a
    # doc-keyed partitioned join onto the postings (doc-scale — a
    # driver dict of per-doc norms would be a corpus-sized broadcast
    # at 100 TB); after the join every posting row carries its doc's
    # norm, so pair generation is self-contained per token group
    from ..util import heal_schema, join_partitions

    np_ = join_partitions(None)
    norms_ds = bucket_sum(
        kept.map_batches(sq, batch_format="pandas"), ["doc_id"], ["sq"]
    )
    kept2 = heal_schema(kept, np_).join(
        heal_schema(norms_ds, np_), "inner", np_, on=("doc_id",)
    )

    def pairs(df: pd.DataFrame) -> pd.DataFrame:
        m = df.merge(df, on="token", suffixes=("_a", "_b"))
        m = m[m["doc_id_a"] < m["doc_id_b"]]
        if not len(m):
            return pd.DataFrame(
                {
                    "doc_a": pd.Series(dtype="int64"),
                    "doc_b": pd.Series(dtype="int64"),
                    "norm_a": pd.Series(dtype="int64"),
                    "norm_b": pd.Series(dtype="int64"),
                    "prod": pd.Series(dtype="int64"),
                }
            )
        return pd.DataFrame(
            {
                "doc_a": m["doc_id_a"].astype("int64").to_numpy(),
                "doc_b": m["doc_id_b"].astype("int64").to_numpy(),
                "norm_a": m["sq_a"].astype("int64").to_numpy(),
                "norm_b": m["sq_b"].astype("int64").to_numpy(),
                "prod": (
                    m["tf_a"].astype("int64").to_numpy()
                    * m["tf_b"].astype("int64").to_numpy()
                ),
            }
        )

    cand = bucket_agg(kept2, ["token"], pairs)
    dots = bucket_sum(cand, ["doc_a", "doc_b", "norm_a", "norm_b"], ["prod"])

    def thresh(df: pd.DataFrame) -> pd.DataFrame:
        d = df["prod"].astype("int64")
        ok = 10000 * d * d >= _SIM_TAU2_BP * df["norm_a"].astype("int64") * df[
            "norm_b"
        ].astype("int64")
        out = df[ok].rename(columns={"prod": "dot"})
        return out[["doc_a", "doc_b", "dot", "norm_a", "norm_b"]].reset_index(
            drop=True
        )

    return dots.map_batches(thresh, batch_format="pandas")


_SQL_TFIDF_SIMJOIN = rf"""
WITH tk AS (
  SELECT doc_id, unnest(regexp_extract_all(coalesce(text, ''), '\S+')) AS t
  FROM documents
),
tf AS (SELECT doc_id, t, count(*)::BIGINT AS tf FROM tk GROUP BY 1, 2),
dfq AS (SELECT t, count(*)::BIGINT AS df FROM tf GROUP BY 1),
kept AS (
  SELECT tf.doc_id, tf.t, tf.tf FROM tf JOIN dfq USING (t)
  WHERE df <= {_SIM_MAX_DF}
),
nrm AS (SELECT doc_id, sum(tf * tf)::BIGINT AS na FROM kept GROUP BY 1),
dot AS (
  SELECT a.doc_id AS da, b.doc_id AS db, sum(a.tf * b.tf)::BIGINT AS dot
  FROM kept a JOIN kept b USING (t)
  WHERE a.doc_id < b.doc_id
  GROUP BY 1, 2
)
SELECT da AS doc_a, db AS doc_b, dot, x.na AS norm_a, y.na AS norm_b
FROM dot JOIN nrm x ON da = x.doc_id JOIN nrm y ON db = y.doc_id
WHERE 10000 * dot * dot >= {_SIM_TAU2_BP} * x.na * y.na
"""


QUERIES["docs_tfidf_simjoin"] = q_docs_tfidf_simjoin
ORACLES["docs_tfidf_simjoin"] = _SQL_TFIDF_SIMJOIN


# -- positional phrase query over the inverted index -------------------------

# the fixed query phrase, shared by the Ray side and the generated oracle;
# a REPEATED token on purpose — adjacency pairs (p, p+1) within one
# posting list are the boundary case a phrase engine gets wrong first
_PHRASE = ("batch", "batch")


def q_postings_phrase_query(sf_dir: str):
    """Exact phrase retrieval ("w1 w2" adjacent) through the positional
    posting lists — the consumer of postings_index's artifact: filter
    the position stream to the phrase's two tokens (map-side — the
    selective step a real engine does by seeking two posting lists),
    then ONE doc-bucketed pass intersects positions with pos₂ = pos₁+1
    vectorized (np.isin on int64 position arrays).  Emits
    (doc_id, n_phrase) for matching documents only.  No row-scale
    shuffle: what moves is the two tokens' postings, not the corpus."""
    from ..stages.dedup import tokens as _tok
    from ..util import bucket_agg

    docs = _docs(sf_dir)
    w1, w2 = _PHRASE

    def explode_sel(df: pd.DataFrame) -> pd.DataFrame:
        ids, toks, poss = [], [], []
        for doc_id, text in zip(df["doc_id"], df["text"]):
            ts = _tok(text if isinstance(text, str) else "")
            for i, t in enumerate(ts, 1):
                if t == w1 or t == w2:
                    ids.append(doc_id)
                    toks.append(t)
                    poss.append(i)
        return pd.DataFrame(
            {
                "doc_id": pd.array(ids, dtype="int64"),
                "token": pd.array(toks, dtype="string"),
                "pos": pd.array(poss, dtype="int64"),
            }
        )

    occ = docs.map_batches(explode_sel, batch_format="pandas")

    def adjacency(df: pd.DataFrame) -> pd.DataFrame:
        out_ids, out_n = [], []
        for doc_id, g in df.groupby("doc_id", sort=False):
            p1 = g.loc[g["token"] == w1, "pos"].to_numpy(dtype="int64")
            p2 = g.loc[g["token"] == w2, "pos"].to_numpy(dtype="int64")
            n = int(np.isin(p1 + 1, p2).sum())
            if n:
                out_ids.append(int(doc_id))
                out_n.append(n)
        return pd.DataFrame(
            {
                "doc_id": pd.array(out_ids, dtype="int64"),
                "n_phrase": pd.array(out_n, dtype="int64"),
            }
        )

    return bucket_agg(occ, ["doc_id"], adjacency)


_SQL_PHRASE = rf"""
WITH toks AS (
  SELECT doc_id, regexp_extract_all(coalesce(text, ''), '\S+') AS t
  FROM documents
),
pos AS (
  SELECT doc_id, t[i] AS token, i
  FROM toks, unnest(generate_series(1, len(t))) AS u(i)
)
SELECT a.doc_id, count(*)::BIGINT AS n_phrase
FROM pos a JOIN pos b ON b.doc_id = a.doc_id AND b.i = a.i + 1
WHERE a.token = '{_PHRASE[0]}' AND b.token = '{_PHRASE[1]}'
GROUP BY 1
"""


QUERIES["postings_phrase_query"] = q_postings_phrase_query
ORACLES["postings_phrase_query"] = _SQL_PHRASE


# -- per-source token-budget apportionment ----------------------------------

# total token budget to apportion (largest-remainder / Hamilton method) —
# shared constant so the Ray side and the oracle cannot drift
_BUDGET_TOKENS = 1_000_000


def q_docs_token_budget(sf_dir: str):
    """Training-mix engineering: apportion a fixed token budget across
    sources proportionally to their token counts with the
    largest-remainder (Hamilton) method — all integer, so exact: source
    i gets ⌊B·cᵢ/C⌋ plus one of the B − Σ⌊·⌋ leftover tokens by
    remainder rank (ties by source name).  Per-source token counts
    reduce through ONE coarse-bucketed sum; the apportionment itself
    runs on the |sources|-row aggregate (driver-side by design — the
    rank couples every row, and the frame is dimension-sized)."""
    from ..stages.dedup import tokens as _tok
    from ..util import bucket_sum

    docs = _docs(sf_dir)

    def counts(df: pd.DataFrame) -> pd.DataFrame:
        return pd.DataFrame(
            {
                "source": df["source"].astype("string"),
                "n_tokens": pd.array(
                    [
                        len(_tok(t if isinstance(t, str) else ""))
                        for t in df["text"]
                    ],
                    dtype="int64",
                ),
            }
        )

    tab = bucket_sum(
        docs.map_batches(counts, batch_format="pandas"),
        ["source"],
        ["n_tokens"],
    ).to_pandas()
    tab = tab.sort_values("source", ignore_index=True)
    C = int(tab["n_tokens"].sum())
    B = _BUDGET_TOKENS
    floor = (B * tab["n_tokens"].astype("int64")) // C
    rem = (B * tab["n_tokens"].astype("int64")) % C
    leftover = B - int(floor.sum())
    order = np.lexsort((tab["source"].to_numpy(), -rem.to_numpy()))
    bonus = np.zeros(len(tab), dtype="int64")
    bonus[order[:leftover]] = 1
    return pd.DataFrame(
        {
            "source": tab["source"].astype("string"),
            "n_tokens": tab["n_tokens"].astype("int64"),
            "budget": pd.array(floor.to_numpy() + bonus, dtype="int64"),
        }
    )


_SQL_TOKEN_BUDGET = rf"""
WITH c AS (
  SELECT source,
         sum(len(regexp_extract_all(coalesce(text, ''), '\S+')))::BIGINT
           AS n_tokens
  FROM documents GROUP BY 1
),
tot AS (SELECT sum(n_tokens)::BIGINT AS ct FROM c),
sh AS (
  SELECT source, n_tokens,
         ({_BUDGET_TOKENS}::BIGINT * n_tokens) // ct AS fl,
         ({_BUDGET_TOKENS}::BIGINT * n_tokens) % ct AS rem
  FROM c, tot
),
rk AS (
  SELECT *,
         row_number() OVER (ORDER BY rem DESC, source) AS r,
         (SELECT {_BUDGET_TOKENS} - sum(fl) FROM sh) AS leftover
  FROM sh
)
SELECT source, n_tokens,
       (fl + CASE WHEN r <= leftover THEN 1 ELSE 0 END)::BIGINT AS budget
FROM rk
"""


QUERIES["docs_token_budget"] = q_docs_token_budget
ORACLES["docs_token_budget"] = _SQL_TOKEN_BUDGET


# -- per-source duplicate-rate report ---------------------------------------


def q_docs_dup_rate_by_source(sf_dir: str):
    """Corpus-health metric: per source, how many documents collapse
    under normalized exact dedup — (n_docs, n_distinct_norm, n_dup_rows
    = n_docs − n_distinct) — the per-source duplication-rate report a
    crawl pipeline watches per ingest batch.

    Scale shape: documents reduce to (source, md5(norm)) digests
    map-side (the dedup_normalized text-normalization chain, RE2-parity
    regexes), distinct-digest counting rides ONE coarse-bucketed pass
    keyed by the digest (each digest lands in one bucket, so per-bucket
    nunique partials sum globally), and the per-source rollup is a
    second bucketed sum over |sources| keys.  Content never shuffles —
    only 16-byte digests."""
    import re

    from ..stages.dedup import _md5_u64
    from ..util import bucket_agg, bucket_sum

    docs = _docs(sf_dir)
    drop_re = re.compile(r"[^a-z0-9\s]", re.ASCII)
    ws_re = re.compile(r"\s+", re.ASCII)

    def digests(df: pd.DataFrame) -> pd.DataFrame:
        n = (
            df["text"]
            .fillna("")
            .str.lower()
            .str.replace(drop_re, "", regex=True)
            .str.replace(ws_re, " ", regex=True)
            .str.strip()
        )
        return pd.DataFrame(
            {
                "source": df["source"].astype("string"),
                "h": pd.array(
                    [_md5_u64(s) % (1 << 61) for s in n], dtype="int64"
                ),
            }
        )

    dg = docs.map_batches(digests, batch_format="pandas")

    def partial(df: pd.DataFrame) -> pd.DataFrame:
        g = df.groupby("source", as_index=False).agg(
            n_docs=("h", "size"), n_distinct=("h", "nunique")
        )
        return g

    # bucket by (source, h) would split a source across buckets; bucket
    # by h alone keeps each digest whole, and a (source, digest) pair
    # lives in exactly one bucket, so per-bucket nunique sums correctly
    per_bucket = bucket_agg(dg, ["h"], partial)
    tot = bucket_sum(
        per_bucket, ["source"], ["n_docs", "n_distinct"]
    ).to_pandas()
    return pd.DataFrame(
        {
            "source": tot["source"].astype("string"),
            "n_docs": tot["n_docs"].astype("int64"),
            "n_distinct": tot["n_distinct"].astype("int64"),
            "n_dup_rows": (
                tot["n_docs"].astype("int64") - tot["n_distinct"].astype("int64")
            ),
        }
    ).sort_values("source", ignore_index=True)


_SQL_DUP_RATE = r"""
WITH n AS (
  SELECT source,
         trim(regexp_replace(regexp_replace(lower(coalesce(text, '')),
              '[^a-z0-9\s]', '', 'g'), '\s+', ' ', 'g')) AS norm
  FROM documents
)
SELECT source,
       count(*)::BIGINT AS n_docs,
       count(DISTINCT norm)::BIGINT AS n_distinct,
       (count(*) - count(DISTINCT norm))::BIGINT AS n_dup_rows
FROM n GROUP BY 1 ORDER BY 1
"""


QUERIES["docs_dup_rate_by_source"] = q_docs_dup_rate_by_source
ORACLES["docs_dup_rate_by_source"] = _SQL_DUP_RATE


# -- winnowing document fingerprints (MOSS) ---------------------------------

# winnowing parameters (Schleimer, Wilkerson & Aiken, SIGMOD'03):
# character k-gram size and window width, shared with the oracle SQL
_WINNOW_K = 8
_WINNOW_W = 4


def q_docs_winnowing(sf_dir: str):
    """Winnowing fingerprints (the MOSS plagiarism-detector selection
    rule): hash every character k-gram, slide a w-window over the hash
    sequence, keep the minimum of each window — RIGHTMOST position on
    ties, per the paper — and emit the distinct (doc_id, pos, h61)
    selections.  Guarantees: any shared substring of length ≥ k+w−1
    yields at least one shared fingerprint, while only ~2/(w+1) of
    hashes are kept.

    Fully map-side (a document's fingerprints depend on nothing else):
    k-gram hashes use the md5 contract (DuckDB ``md5_number_lower``
    parity), the rolling rightmost-argmin is one vectorized
    sliding_window_view pass (reverse trick: argmin of the reversed
    window = rightmost minimum), dedup is per-doc.  No shuffle at
    all."""
    from ..stages.dedup import _md5_u64

    docs = _docs(sf_dir)
    K, W = _WINNOW_K, _WINNOW_W

    def winnow(df: pd.DataFrame) -> pd.DataFrame:
        ids, poss, hs = [], [], []
        for doc_id, text in zip(df["doc_id"].astype("int64"), df["text"]):
            t = text if isinstance(text, str) else ""
            n = len(t) - K + 1
            if n < W:
                continue
            hv = np.array(
                [_md5_u64(t[i : i + K]) % (1 << 61) for i in range(n)],
                dtype="int64",
            )
            win = np.lib.stride_tricks.sliding_window_view(hv, W)
            rev = win[:, ::-1]
            arg = W - 1 - rev.argmin(axis=1)  # rightmost minimum
            sel_pos = np.arange(n - W + 1) + arg + 1  # 1-based k-gram pos
            sel_h = win[np.arange(n - W + 1), arg]
            pair = np.unique(
                np.stack([sel_pos, sel_h], axis=1), axis=0
            )
            ids.extend([doc_id] * len(pair))
            poss.extend(pair[:, 0].tolist())
            hs.extend(pair[:, 1].tolist())
        return pd.DataFrame(
            {
                "doc_id": pd.array(ids, dtype="int64"),
                "pos": pd.array(poss, dtype="int64"),
                "h61": pd.array(hs, dtype="int64"),
            }
        )

    return docs.map_batches(winnow, batch_format="pandas")


_SQL_WINNOW = f"""
WITH d AS (
  SELECT doc_id, coalesce(text, '') AS t FROM documents
  WHERE length(coalesce(text, '')) >= {_WINNOW_K + _WINNOW_W - 1}
),
h AS (
  SELECT doc_id, i,
         (md5_number_lower(substr(t, i, {_WINNOW_K}))
          % 2305843009213693952)::BIGINT AS hv
  FROM d, unnest(generate_series(1, length(t) - {_WINNOW_K} + 1)) AS u(i)
),
np_ AS (SELECT doc_id, max(i) AS p FROM h GROUP BY 1),
win AS (
  SELECT np_.doc_id, w.j
  FROM np_, unnest(generate_series(1, np_.p - {_WINNOW_W} + 1)) AS w(j)
),
ex AS (
  SELECT win.doc_id, win.j, h.i, h.hv
  FROM win JOIN h ON h.doc_id = win.doc_id
        AND h.i BETWEEN win.j AND win.j + {_WINNOW_W} - 1
),
g1 AS (SELECT doc_id, j, min(hv) AS mh FROM ex GROUP BY 1, 2),
sel AS (
  SELECT ex.doc_id, ex.j, g1.mh, max(ex.i) AS pi
  FROM ex JOIN g1 ON g1.doc_id = ex.doc_id AND g1.j = ex.j
  WHERE ex.hv = g1.mh
  GROUP BY 1, 2, 3
)
SELECT DISTINCT doc_id, pi AS pos, mh AS h61 FROM sel
"""


QUERIES["docs_winnowing"] = q_docs_winnowing
ORACLES["docs_winnowing"] = _SQL_WINNOW


# -- exact per-label embedding centroid sums --------------------------------

# quantization scale + dim cap shared with the oracle: float32 payloads
# are quantized to integers BEFORE summation so the distributed sum is
# order-independent (a float centroid would hash differently per block
# order); 8 leading dims keep the output frame tiny
_CENT_SCALE = 1_000_000
_CENT_DIMS = 8


def q_embedding_label_centroids(sf_dir: str):
    """Per-class embedding centroid statistics — the drift-monitoring /
    class-prototype aggregation a training pipeline tracks per shard:
    for each label and each of the first 8 dimensions, the EXACT
    integer sum of rint(x·10⁶) plus the class count, from which the
    centroid is one division away.

    Scale shape: batches quantize and partial-sum map-side into
    (label, dim) rows — 10 labels × 8 dims regardless of corpus size —
    then ONE tiny bucketed sum.  The array column never shuffles."""
    from ..util import bucket_sum

    ds = _embs(sf_dir)

    def partial(df: pd.DataFrame) -> pd.DataFrame:
        mat = np.array(df["embedding"].tolist(), dtype="float64")[
            :, :_CENT_DIMS
        ]
        q = np.rint(mat * _CENT_SCALE).astype("int64")
        lab = df["label"].astype("int64").to_numpy()
        out = []
        for lb in np.unique(lab):
            rows = q[lab == lb]
            out.append(
                pd.DataFrame(
                    {
                        "label": np.full(_CENT_DIMS, lb, dtype="int64"),
                        "dim": np.arange(_CENT_DIMS, dtype="int64"),
                        "sum_q": rows.sum(axis=0),
                        "n": np.full(_CENT_DIMS, len(rows), dtype="int64"),
                    }
                )
            )
        return (
            pd.concat(out, ignore_index=True)
            if out
            else pd.DataFrame(
                {
                    "label": pd.Series(dtype="int64"),
                    "dim": pd.Series(dtype="int64"),
                    "sum_q": pd.Series(dtype="int64"),
                    "n": pd.Series(dtype="int64"),
                }
            )
        )

    return bucket_sum(
        ds.map_batches(partial, batch_format="pandas"),
        ["label", "dim"],
        ["sum_q", "n"],
        num_buckets=16,
    )


_SQL_CENTROIDS = f"""
WITH x AS (
  SELECT label::BIGINT AS label, u.i - 1 AS dim,
         round(embedding[u.i]::DOUBLE * {_CENT_SCALE})::BIGINT AS q
  FROM embeddings, unnest(generate_series(1, {_CENT_DIMS})) AS u(i)
)
SELECT label, dim::BIGINT AS dim, sum(q)::BIGINT AS sum_q,
       count(*)::BIGINT AS n
FROM x GROUP BY 1, 2
"""


QUERIES["embedding_label_centroids"] = q_embedding_label_centroids
ORACLES["embedding_label_centroids"] = _SQL_CENTROIDS


# -- survivorship / golden-record merge -------------------------------------


def q_docs_golden_record(sf_dir: str):
    """MDM survivorship: collapse each normalized-text duplicate group
    to ONE golden record with field-level merge rules — keeper =
    longest raw text (ties → min doc_id), plus the group's max n_chars
    and member count.  The "which copy wins, field by field" operator a
    record-linkage pipeline runs after dedup.

    One digest-bucketed pass holds every group whole (16-byte digests
    shuffle, content stays put as per-batch metadata: doc_id, n_chars
    travel, text does not)."""
    import re

    from ..stages.dedup import _md5_u64
    from ..util import bucket_agg

    docs = _docs(sf_dir)
    drop_re = re.compile(r"[^a-z0-9\s]", re.ASCII)
    ws_re = re.compile(r"\s+", re.ASCII)

    def digests(df: pd.DataFrame) -> pd.DataFrame:
        n = (
            df["text"]
            .fillna("")
            .str.lower()
            .str.replace(drop_re, "", regex=True)
            .str.replace(ws_re, " ", regex=True)
            .str.strip()
        )
        return pd.DataFrame(
            {
                "h": pd.array(
                    [_md5_u64(s) % (1 << 61) for s in n], dtype="int64"
                ),
                "doc_id": df["doc_id"].astype("int64"),
                "n_chars": df["n_chars"].astype("int64"),
                "raw_len": df["text"].fillna("").str.len().astype("int64"),
            }
        )

    dg = docs.map_batches(digests, batch_format="pandas")

    def golden(df: pd.DataFrame) -> pd.DataFrame:
        g = df.sort_values(
            ["h", "raw_len", "doc_id"], ascending=[True, False, True]
        )
        first = g.drop_duplicates("h", keep="first")
        agg = df.groupby("h", as_index=False).agg(
            n_members=("doc_id", "size"), max_chars=("n_chars", "max")
        )
        out = first.merge(agg, on="h")
        return pd.DataFrame(
            {
                "h": out["h"].astype("int64"),
                "golden_doc_id": out["doc_id"].astype("int64"),
                "n_members": out["n_members"].astype("int64"),
                "max_chars": out["max_chars"].astype("int64"),
            }
        )

    return bucket_agg(dg, ["h"], golden)


_SQL_GOLDEN = r"""
WITH n AS (
  SELECT doc_id, n_chars, length(coalesce(text, '')) AS raw_len,
         (md5_number_lower(trim(regexp_replace(regexp_replace(
             lower(coalesce(text, '')), '[^a-z0-9\s]', '', 'g'),
             '\s+', ' ', 'g'))) % 2305843009213693952)::BIGINT AS h
  FROM documents
),
r AS (
  SELECT *, row_number() OVER (
           PARTITION BY h ORDER BY raw_len DESC, doc_id
         ) AS rk
  FROM n
),
agg AS (
  SELECT h, count(*)::BIGINT AS n_members, max(n_chars)::BIGINT AS max_chars
  FROM n GROUP BY 1
)
SELECT r.h, r.doc_id AS golden_doc_id, agg.n_members, agg.max_chars
FROM r JOIN agg USING (h) WHERE r.rk = 1
"""


QUERIES["docs_golden_record"] = q_docs_golden_record
ORACLES["docs_golden_record"] = _SQL_GOLDEN
