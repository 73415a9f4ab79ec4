"""Deduplication stages for training-data pipelines.

Four families, all expressed Ray-Data-first:

* exact        — hash-partition on a content digest, keep min-id per group
                 (one shuffle, map-side digest).
* blocked Jaccard — word-set Jaccard within blocking keys
                 (groupby(block).map_groups pairwise; integer-arithmetic
                 threshold so a DuckDB oracle matches bit-for-bit).
* MinHash+LSH  — shingle → signature (map_batches, numpy universal
                 hashing) → band buckets (flat_map) → candidate pairs per
                 bucket (groupby.map_groups) → signature-estimated Jaccard
                 filter.  Only bucket groups shuffle; signatures are
                 ~256 B/doc regardless of document size.
* SimHash      — 64-bit token-weight simhash; near-dup candidates via
                 16-bit band buckets (Hamming ≤ 3 ⇒ one of four 16-bit
                 quarters equal, pigeonhole).

Scale notes (100 TB): every stage shuffles only digests/signatures, never
document bodies; blocking keys bound group sizes; a pathological bucket
(all-identical content) is still one group — cap emitted pairs per bucket
with ``max_pairs_per_bucket`` and report truncation.
"""

from __future__ import annotations

import hashlib

import numpy as np
import pandas as pd

import ray.data

_MERSENNE = (1 << 61) - 1


# ---------------------------------------------------------------------------
# exact dedup
# ---------------------------------------------------------------------------


def _digest_batch(df: pd.DataFrame, text_col: str) -> pd.DataFrame:
    df = df.copy()
    df["_digest"] = [
        hashlib.sha256(t.encode("utf-8")).hexdigest()
        for t in df[text_col].fillna("")
    ]
    return df


def exact_dedup(
    ds: "ray.data.Dataset", *, text_col: str = "text", id_col: str = "doc_id"
) -> "ray.data.Dataset":
    """Keep exactly one row (min ``id_col``) per distinct ``text_col``.

    sha256-digest map-side, then ONE hash shuffle on the digest; document
    bodies never leave their block a second time (only the winning row's
    columns ride through the groupby)."""

    def keep_first(grp: pd.DataFrame) -> pd.DataFrame:
        return grp.sort_values(id_col).head(1)

    return (
        ds.map_batches(
            lambda df: _digest_batch(df, text_col), batch_format="pandas"
        )
        .groupby("_digest")
        .map_groups(keep_first, batch_format="pandas")
        .drop_columns(["_digest"])
    )


# ---------------------------------------------------------------------------
# blocked word-set Jaccard
# ---------------------------------------------------------------------------


def jaccard_block_pairs(
    ds: "ray.data.Dataset",
    *,
    block_cols: tuple[str, ...] = ("lang", "source"),
    text_col: str = "text",
    id_col: str = "doc_id",
    threshold_num: int = 4,
    threshold_den: int = 10,
    max_block: int = 10_000,
    ngram: int = 1,
) -> "ray.data.Dataset":
    """All pairs within a blocking key whose word n-gram-set Jaccard ≥
    threshold_num/threshold_den, compared with pure integer arithmetic
    (|A∩B| * den ≥ |A∪B| * num) so results are float-free and exactly
    reproducible by a SQL oracle (``ngram=1`` — word sets; higher n gives
    shingle Jaccard, stricter about ordering).

    Blocking bounds the quadratic term: pairs are only formed inside one
    (lang, source, …) group; a group larger than ``max_block`` raises
    rather than silently exploding.
    """

    def shingles(text: str) -> set:
        toks = text.split()
        if ngram <= 1 or len(toks) < ngram:
            return set(toks)
        return {" ".join(toks[i : i + ngram]) for i in range(len(toks) - ngram + 1)}

    def pairs(grp: pd.DataFrame) -> pd.DataFrame:
        if len(grp) > max_block:
            raise RuntimeError(
                f"jaccard block exceeded cap: {len(grp)} > {max_block}"
            )
        grp = grp.sort_values(id_col)
        ids = grp[id_col].to_numpy()
        sets = [shingles(t) for t in grp[text_col].fillna("")]
        rows = []
        for i in range(len(ids)):
            a = sets[i]
            for j in range(i + 1, len(ids)):
                inter = len(a & sets[j])
                union = len(a | sets[j])
                if union and inter * threshold_den >= union * threshold_num:
                    rows.append((ids[i], ids[j], inter, union))
        return pd.DataFrame(
            rows, columns=["doc_id_a", "doc_id_b", "n_inter", "n_union"]
        ).astype("int64")

    return ds.groupby(list(block_cols)).map_groups(pairs, batch_format="pandas")


# ---------------------------------------------------------------------------
# MinHash + LSH
# ---------------------------------------------------------------------------


_TOKEN_HASH_CACHE: dict[str, int] = {}


def _token_hashes(toks: list[str]) -> np.ndarray:
    """Per-token 64-bit blake2b, memoized per process (token vocabularies
    are Zipfian — the cache turns the hashing loop into dict lookups)."""
    cache = _TOKEN_HASH_CACHE
    if len(cache) > 2_000_000:
        cache.clear()
    out = np.empty(len(toks), dtype=np.uint64)
    for i, t in enumerate(toks):
        h = cache.get(t)
        if h is None:
            h = int.from_bytes(
                hashlib.blake2b(t.encode(), digest_size=8).digest(), "big"
            )
            cache[t] = h
        out[i] = h
    return out


_SHINGLE_MIX = np.array([0x9E3779B97F4A7C15, 0xC2B2AE3D27D4EB4F, 0x165667B19E3779F9,
                         0xD6E8FEB86659FD93, 0xA5A5A5A5A5A5A5A5], dtype=np.uint64)


class MinHasher:
    """Stateful map_batches stage: text → MinHash signature.

    Permutation parameters are derived once per actor in ``__init__`` from
    a fixed seed (deterministic across retries and cluster sizes); shingle
    hashes are a vectorized mix of memoized per-token hashes."""

    def __init__(self, num_perm: int = 128, shingle_k: int = 3, seed: int = 42):
        rng = np.random.RandomState(seed)
        self.a = rng.randint(1, _MERSENNE, size=num_perm, dtype=np.uint64)
        self.b = rng.randint(0, _MERSENNE, size=num_perm, dtype=np.uint64)
        self.num_perm = num_perm
        self.k = shingle_k

    def _shingle_hashes(self, text: str) -> np.ndarray:
        toks = text.split()
        if not toks:
            return np.zeros(0, dtype=np.uint64)
        th = _token_hashes(toks)
        k = min(self.k, len(th))
        n = len(th) - k + 1
        with np.errstate(over="ignore"):
            g = np.zeros(n, dtype=np.uint64)
            for j in range(k):
                g = g ^ (th[j : j + n] * _SHINGLE_MIX[j % len(_SHINGLE_MIX)])
        return np.unique(g)

    def signature(self, text: str) -> np.ndarray:
        h = self._shingle_hashes(text)
        if len(h) == 0:
            return np.full(self.num_perm, np.iinfo(np.uint64).max, dtype=np.uint64)
        with np.errstate(over="ignore"):
            # (num_perm, n_shingles) universal hash, min per row
            m = (np.outer(self.a, h) + self.b[:, None]) % np.uint64(_MERSENNE)
        return m.min(axis=1)

    def __call__(self, df: pd.DataFrame) -> pd.DataFrame:
        sigs = [self.signature(t) for t in df["text"].fillna("")]
        out = pd.DataFrame({"doc_id": df["doc_id"].astype("int64")})
        out["sig"] = [s.tobytes() for s in sigs]  # fixed num_perm×8 bytes
        return out


def minhash_signatures(
    ds: "ray.data.Dataset", *, num_perm: int = 128, shingle_k: int = 3, concurrency=None
) -> "ray.data.Dataset":
    return ds.map_batches(
        MinHasher,
        fn_constructor_kwargs={"num_perm": num_perm, "shingle_k": shingle_k},
        batch_format="pandas",
        concurrency=concurrency or 4,
    )


def minhash_lsh_pairs(
    ds: "ray.data.Dataset",
    *,
    num_perm: int = 128,
    bands: int = 32,
    shingle_k: int = 3,
    threshold: float = 0.8,
    max_bucket: int = 100_000,
    concurrency=None,
) -> "ray.data.Dataset":
    """Near-duplicate pairs: MinHash signatures → LSH band buckets →
    candidate pairs → map-side signature verification.

    Only (bucket, doc_id) rows go through the shuffle; signatures stay out
    of the exchange and are broadcast once (``ray.put``) for the verify
    step — at corpora where the signature matrix itself outgrows a worker
    heap, swap the broadcast for a hash-partitioned signature join.

    Output: (doc_id_a, doc_id_b, est_jaccard_num) with
    est_jaccard_num = #equal signature slots (out of ``num_perm``) —
    integer, ≥ ceil(threshold * num_perm)."""
    import ray

    rows_per_band = num_perm // bands
    min_eq = int(np.ceil(threshold * num_perm))

    sigs = minhash_signatures(
        ds, num_perm=num_perm, shingle_k=shingle_k, concurrency=concurrency
    ).materialize()

    def to_buckets(df: pd.DataFrame) -> pd.DataFrame:
        ids, buckets = [], []
        for doc_id, sig in zip(df["doc_id"], df["sig"]):
            mv = memoryview(sig)
            for b in range(bands):
                chunk = mv[b * rows_per_band * 8 : (b + 1) * rows_per_band * 8]
                bh = hashlib.blake2b(chunk, digest_size=8).hexdigest()
                ids.append(doc_id)
                buckets.append(f"{b}:{bh}")
        return pd.DataFrame({"bucket": buckets, "doc_id": ids})

    buckets = sigs.map_batches(to_buckets, batch_format="pandas")

    def bucket_pairs(grp: pd.DataFrame) -> pd.DataFrame:
        ids = np.unique(grp["doc_id"].to_numpy())
        if len(ids) < 2:
            return pd.DataFrame({"doc_id_a": [], "doc_id_b": []}).astype("int64")
        if len(ids) > max_bucket:
            raise RuntimeError("LSH bucket cap exceeded (skewed bucket)")
        a, b = np.triu_indices(len(ids), 1)
        return pd.DataFrame(
            {"doc_id_a": ids[a], "doc_id_b": ids[b]}
        ).astype("int64")

    cands = (
        buckets.groupby("bucket")
        .map_groups(bucket_pairs, batch_format="pandas")
        .groupby(["doc_id_a", "doc_id_b"])
        .map_groups(lambda g: g.head(1), batch_format="pandas")
    )

    sig_pd = sigs.to_pandas()
    mat = np.frombuffer(b"".join(sig_pd["sig"]), dtype=np.uint64).reshape(
        len(sig_pd), num_perm
    )
    ref = ray.put({"row": {int(d): i for i, d in enumerate(sig_pd["doc_id"])},
                   "mat": mat})

    def verify(df: pd.DataFrame) -> pd.DataFrame:
        s = ray.get(ref) if not isinstance(ref, dict) else ref
        row, m = s["row"], s["mat"]
        ia = np.array([row[int(x)] for x in df["doc_id_a"]], dtype=np.int64)
        ib = np.array([row[int(x)] for x in df["doc_id_b"]], dtype=np.int64)
        eq = (m[ia] == m[ib]).sum(axis=1).astype("int64")
        out = df.copy()
        out["est_jaccard_num"] = eq
        return out[eq >= min_eq].reset_index(drop=True)

    return cands.map_batches(verify, batch_format="pandas")


# ---------------------------------------------------------------------------
# SimHash
# ---------------------------------------------------------------------------


_BIT_SHIFTS = np.arange(64, dtype=np.uint64)


def _simhash64(text: str) -> int:
    toks = text.split()
    if not toks:
        return 0
    hs = _token_hashes(toks)
    bits = ((hs[:, None] >> _BIT_SHIFTS) & np.uint64(1)).astype(np.int64)
    acc = (2 * bits - 1).sum(axis=0)
    return int(((acc > 0).astype(np.uint64) << _BIT_SHIFTS).sum(dtype=np.uint64))


def simhash_table(
    ds: "ray.data.Dataset", *, text_col: str = "text", id_col: str = "doc_id"
) -> "ray.data.Dataset":
    """(doc_id, simhash, band0..band3): 64-bit simhash split into four
    16-bit bands; Hamming-≤3 near-dups share at least one band."""

    def f(df: pd.DataFrame) -> pd.DataFrame:
        hs = [_simhash64(t) for t in df[text_col].fillna("")]
        out = pd.DataFrame({"doc_id": df[id_col].astype("int64")})
        out["simhash"] = np.array(hs, dtype=np.uint64).astype(np.int64)
        for b in range(4):
            out[f"band{b}"] = np.array(
                [(h >> (16 * b)) & 0xFFFF for h in hs], dtype=np.int64
            )
        return out

    return ds.map_batches(f, batch_format="pandas")


def simhash_pairs(
    ds: "ray.data.Dataset",
    *,
    max_hamming: int = 3,
    text_col: str = "text",
    id_col: str = "doc_id",
) -> "ray.data.Dataset":
    """Near-duplicate pairs with Hamming distance ≤ ``max_hamming`` via
    band buckets (4 × 16-bit; pigeonhole-complete for distance ≤ 3)."""
    table = simhash_table(ds, text_col=text_col, id_col=id_col)

    def to_band_rows(row: dict) -> list[dict]:
        return [
            {
                "bkey": f"{b}:{row[f'band{b}']}",
                "doc_id": row["doc_id"],
                "simhash": row["simhash"],
            }
            for b in range(4)
        ]

    def bucket_pairs(grp: pd.DataFrame) -> pd.DataFrame:
        grp = grp.sort_values("doc_id")
        ids = grp["doc_id"].to_numpy()
        hs = grp["simhash"].to_numpy().astype(np.uint64)
        rows = []
        for i in range(len(ids)):
            x = hs[i + 1 :] ^ hs[i]
            d = np.array([bin(v).count("1") for v in x])
            for off in np.nonzero(d <= max_hamming)[0]:
                j = i + 1 + off
                if ids[i] != ids[j]:
                    rows.append((ids[i], ids[j], int(d[off])))
        return pd.DataFrame(rows, columns=["doc_id_a", "doc_id_b", "hamming"]).astype(
            "int64"
        )

    pairs = (
        table.flat_map(to_band_rows)
        .groupby("bkey")
        .map_groups(bucket_pairs, batch_format="pandas")
    )

    def dedup_pairs(grp: pd.DataFrame) -> pd.DataFrame:
        return grp.head(1)

    return pairs.groupby(["doc_id_a", "doc_id_b"]).map_groups(
        dedup_pairs, batch_format="pandas"
    )
