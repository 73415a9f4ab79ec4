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

_TOKEN_RE = re.compile(r"\S+")
_PUNCT_RE = re.compile(r"[.,!?;:]")
_UPPER_RE = re.compile(r"[A-Z]")
_DIGIT_RE = re.compile(r"[0-9]")
# BPE-ish subword pieces: word chars, or runs of punctuation, GPT-2 style
_BPE_RE = re.compile(r"[A-Za-z]+|[0-9]|[^A-Za-z0-9\s]+")


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


# ---------------------------------------------------------------------------
# language identification (n-gram/script heuristic — no model downloads)
# ---------------------------------------------------------------------------

_SCRIPT_RANGES = [
    ("zh", 0x4E00, 0x9FFF),
    ("ja", 0x3040, 0x30FF),
    ("ko", 0xAC00, 0xD7AF),
    ("ru", 0x0400, 0x04FF),
    ("ar", 0x0600, 0x06FF),
    ("el", 0x0370, 0x03FF),
]

_STOPWORDS = {
    "en": {"the", "and", "of", "to", "is", "in", "that", "it", "for", "was"},
    "de": {"der", "die", "und", "das", "ist", "nicht", "ein", "mit", "auf", "für"},
    "fr": {"le", "la", "et", "les", "des", "est", "pas", "que", "une", "dans"},
    "es": {"el", "los", "las", "una", "por", "con", "para", "está", "pero", "como"},
    "it": {"il", "che", "di", "non", "per", "con", "una", "sono", "della", "questo"},
}


def _lang_of(text: str) -> str:
    if not text:
        return "und"
    sample = text[:2000]
    counts = {}
    non_ascii = 0
    for ch in sample:
        cp = ord(ch)
        if cp > 127:
            non_ascii += 1
            for lang, lo, hi in _SCRIPT_RANGES:
                if lo <= cp <= hi:
                    counts[lang] = counts.get(lang, 0) + 1
                    break
    if counts:
        best = max(sorted(counts), key=counts.get)
        if counts[best] * 10 >= len(sample):
            return best
    words = set(w.lower() for w in _TOKEN_RE.findall(sample))
    scores = {lang: len(words & sw) for lang, sw in _STOPWORDS.items()}
    best = max(sorted(scores), key=scores.get)
    return best if scores[best] > 0 else "und"


def lang_id(df: pd.DataFrame, *, text_col: str = "text", id_col: str = "doc_id") -> pd.DataFrame:
    return pd.DataFrame(
        {
            "doc_id": df[id_col],
            "lang_pred": [_lang_of(t) for t in df[text_col].fillna("")],
        }
    )


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


def fingerprint(df: pd.DataFrame, *, text_col: str = "text", id_col: str = "doc_id") -> pd.DataFrame:
    """Winnowed fingerprint set summary per document: the minimum hash in
    every sliding window of rolling k-gram hashes (Schleimer et al.,
    SIGMOD'03 winnowing), reduced to exact-integer summaries."""
    ids, nfp, fmin, fxor = [], [], [], []
    for doc_id, text in zip(df[id_col], df[text_col].fillna("")):
        h = _rolling_hashes(text.encode("utf-8"))
        if len(h) == 0:
            sel = np.zeros(0, dtype=np.uint64)
        elif len(h) <= _FP_WINDOW:
            sel = np.array([h.min()], dtype=np.uint64)
        else:
            w = np.lib.stride_tricks.sliding_window_view(h, _FP_WINDOW)
            sel = np.unique(w.min(axis=1))
        ids.append(doc_id)
        nfp.append(len(sel))
        fmin.append(int(sel.min()) if len(sel) else 0)
        x = np.uint64(0)
        for v in sel:
            x ^= v
        fxor.append(int(x))
    return pd.DataFrame(
        {"doc_id": ids, "n_fingerprints": nfp, "fp_min": fmin, "fp_xor": fxor}
    )
