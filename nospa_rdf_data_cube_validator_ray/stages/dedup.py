"""Deduplication stages for training-data pipelines.

Four families, all expressed Ray-Data-first:

* exact        — map-side content digest + coarse-bucket shuffle, per-bucket
                 vectorized ``drop_duplicates`` keeping the min id (the
                 ``export.exact_dedup_triples`` pattern — never one pandas
                 group per distinct document).
* blocked Jaccard — word/shingle-set Jaccard within blocking keys
                 (groupby(block).map_groups pairwise; integer-arithmetic
                 threshold so a DuckDB oracle matches bit-for-bit).
* MinHash+LSH  — shingle → signature (actor-pool map_batches) → band
                 buckets → candidate pairs (coarse-bucket shuffle) →
                 signature verification via a hash-partitioned JOIN of the
                 candidate pairs against the signature table (a-side then
                 b-side).  The signature matrix is NEVER materialized on
                 the driver and never broadcast: at 10^9 docs the
                 signatures stay partitioned and only the candidate-pair
                 table (bounded by true near-dup density) flows through
                 the joins.
* SimHash      — 64-bit token simhash; near-dup candidates via 16-bit
                 band buckets (Hamming ≤ 3 ⇒ one of four 16-bit quarters
                 equal, pigeonhole — candidate recall is exactly 1, so the
                 pair set is deterministic and SQL-checkable).

Every hash kernel here is **md5-derived** (``_md5_u64`` = little-endian of
md5 bytes 8..16 == DuckDB ``md5_number_lower``), and the MinHash
permutations are (a·h+b) mod (2^61−1) with seed-derived constants exposed
by :func:`minhash_params` — so signatures, band buckets, candidate pairs
and verified pairs are all *exactly* recomputable by a DuckDB oracle (see
``pipelines/training_data.py``).  2^61−1 keeps every value int64-safe on
both sides.

Scale notes (100 TB): every stage shuffles only digests/signatures/pairs,
never document bodies; candidate-pair dedup uses coarse hash buckets (a
few × cluster cores), not one group per pair; a pathological bucket
(all-identical content) raises at ``max_bucket`` rather than silently
exploding.
"""

from __future__ import annotations

import hashlib
import re

import numpy as np
import pandas as pd

import ray.data

# \S+ with ASCII \s semantics == RE2's \S in the DuckDB oracles: Unicode
# whitespace (\u00a0 etc.) is token material on BOTH sides
_TOKENS_RE = re.compile(r"\S+", re.ASCII)


def tokens(text: str) -> list[str]:
    return _TOKENS_RE.findall(text)

_M61 = (1 << 61) - 1          # Mersenne modulus for permutation hashing
_B61 = np.uint64(1 << 61)     # shingle-hash domain (mask to 61 bits)
_LOW31 = np.uint64((1 << 31) - 1)
_LOW30 = np.uint64((1 << 30) - 1)

# coarse shuffle width for pair dedup / bucketing stages: a few × typical
# core counts so groups are big pandas frames, not per-key slivers
_COARSE = 64


def _md5_u64(s: str) -> int:
    """64-bit hash == DuckDB ``md5_number_lower(s)`` (little-endian of the
    md5 digest's last 8 bytes) — the bridge that makes every downstream
    kernel SQL-replicable."""
    return int.from_bytes(hashlib.md5(s.encode("utf-8")).digest()[8:], "little")


_HASH_CACHE: dict[str, int] = {}


def _md5_u64_cached(s: str) -> int:
    cache = _HASH_CACHE
    if len(cache) > 2_000_000:
        cache.clear()
    h = cache.get(s)
    if h is None:
        h = _md5_u64(s)
        cache[s] = h
    return h


def _fold61(x: np.ndarray) -> np.ndarray:
    """Exact ``x mod (2^61−1)`` for x < 2^63: one Mersenne shift-fold
    (x = q·2^61 + r ≡ q + r) then one conditional subtract — the fold
    result is < 2·M61 for any x < 2^63.  Replaces u64 ``%`` (hardware
    division, unvectorizable) in the MinHash permute hot path: the
    divisions made the signature stage ALU-bound and memory-hungry
    enough to stop scaling across workers."""
    m = np.uint64(_M61)
    x = (x & m) + (x >> np.uint64(61))
    return x - m * (x >= m)


def _mulmod61(a: np.ndarray, h: np.ndarray) -> np.ndarray:
    """(a*h) mod (2^61−1) for uint64 arrays, overflow-free (numpy has no
    128-bit ints): split both factors at 31/30 bits and reduce with
    2^61 ≡ 1 (mod M61).  Broadcasting-friendly.  Division-free — every
    partial stays provably below 2^63, so :func:`_fold61` is exact:

    * t1 = 2·a1·h1 ≤ 2·(2^30−1)² = 2^61 − 2^32 + 2 < M61: no reduction
    * mid = a1·h0 + a0·h1 < 2^62: one fold
    * t2 pre-fold < 2^61 (x0 < 2^30 ⇒ x0·2^31 ≤ 2^61 − 2^31): one fold
    * t3 = a0·h0 < 2^62: one fold
    * t1 + t2 + t3 < 3·M61 < 2^63: one fold"""
    a1, a0 = a >> np.uint64(31), a & _LOW31          # a1 < 2^30, a0 < 2^31
    h1, h0 = h >> np.uint64(31), h & _LOW31
    # a*h = a1*h1*2^62 + (a1*h0 + a0*h1)*2^31 + a0*h0;  2^62 ≡ 2 (mod M61)
    t1 = (a1 * h1) << np.uint64(1)
    mid = _fold61(a1 * h0 + a0 * h1)                 # mid*2^31 ≡ x1 + x0*2^31
    t2 = _fold61((mid >> np.uint64(30)) + ((mid & _LOW30) << np.uint64(31)))
    t3 = _fold61(a0 * h0)
    return _fold61(t1 + t2 + t3)


def kmv_sketch(hashes, k: int = 64) -> tuple[int, int]:
    """K-minimum-values cardinality estimate from an iterable of 61-bit
    hashes: (kth_min, est_distinct) with the deterministic integer
    estimator (k-1)*2^61 // kth_min, or the exact count when fewer than
    k distinct hashes exist — the shared rule for distinct_sketch_kmv
    and kg_pred_profile, bit-exact against their SQL twins."""
    hs = sorted(set(hashes))[:k]
    if not hs:
        return 0, 0
    kth = int(hs[-1])
    est = (k - 1) * (1 << 61) // kth if len(hs) == k else len(hs)
    return kth, int(est)


def minhash_params(num_perm: int = 128, seed: int = 42) -> tuple[list[int], list[int]]:
    """The (a, b) permutation constants, exposed so the DuckDB oracle can
    bake the identical integers into its SQL."""
    rng = np.random.RandomState(seed)
    a = rng.randint(1, _M61, size=num_perm, dtype=np.int64)
    b = rng.randint(0, _M61, size=num_perm, dtype=np.int64)
    return a.tolist(), b.tolist()


def shingle_set(text: str, k: int) -> list[str]:
    """Distinct k-token shingle strings (space-joined); fewer than k tokens
    ⇒ one whole-text shingle.  Mirrored in SQL by
    list_distinct(list_transform(...array_to_string(w[i:i+k-1])))."""
    toks = tokens(text)
    if not toks:
        return []
    if len(toks) < k:
        return [" ".join(toks)]
    return list({" ".join(toks[i : i + k]) for i in range(len(toks) - k + 1)})


# ---------------------------------------------------------------------------
# exact dedup
# ---------------------------------------------------------------------------


def exact_dedup(
    ds: "ray.data.Dataset",
    *,
    text_col: str = "text",
    id_col: str = "doc_id",
    num_buckets: int = _COARSE,
) -> "ray.data.Dataset":
    """Keep exactly one row (min ``id_col``) per distinct ``text_col``.

    sha256-digest map-side, coarse-bucket the digest, then ONE shuffle into
    ``num_buckets`` big groups deduped with vectorized
    ``sort_values + drop_duplicates`` — duplicates of one text always share
    a bucket, and no per-digest pandas group is ever created."""

    def digest(df: pd.DataFrame) -> pd.DataFrame:
        df = df.copy()
        dg = [
            hashlib.sha256(t.encode("utf-8")).digest()
            for t in df[text_col].fillna("")
        ]
        df["_digest"] = [d.hex() for d in dg]
        df["_bucket"] = np.array(
            [int.from_bytes(d[:8], "big") % num_buckets for d in dg], dtype="int32"
        )
        return df

    def dedup_bucket(grp: pd.DataFrame) -> pd.DataFrame:
        return (
            grp.sort_values(id_col)
            .drop_duplicates("_digest", keep="first")
            .drop(columns=["_digest", "_bucket"])
        )

    return (
        ds.map_batches(digest, batch_format="pandas")
        .groupby("_bucket")
        .map_groups(dedup_bucket, batch_format="pandas")
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
        toks = tokens(text)
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


def jaccard_clusters(
    ds: "ray.data.Dataset",
    *,
    block_cols: tuple[str, ...] = ("lang", "source"),
    text_col: str = "text",
    id_col: str = "doc_id",
    threshold_num: int = 4,
    threshold_den: int = 10,
    max_block: int = 10_000,
    ngram: int = 1,
    max_iters: int = 15,
    num_partitions: int | None = None,
    max_driver_edges: int = 2_000_000,
) -> "ray.data.Dataset":
    """Near-duplicate cluster assignment: the blocked exact-Jaccard pair
    graph (:func:`jaccard_block_pairs`) fed into connected components,
    then every document labeled with its cluster's minimum doc_id —
    docs in no pair are their own singleton cluster.  Returns a Dataset
    (doc_id, cluster_id), both int64; downstream "keep one per cluster"
    is a filter on doc_id == cluster_id.

    Component-finding is size-adaptive (same regime split as
    ``cosine_threshold_pairs``): a near-dup edge list is tiny relative
    to the corpus (only docs in ≥1 pair appear), so up to
    ``max_driver_edges`` it is collected ONCE and union-found exactly on
    the driver — each of Ray 2.49's hash-shuffle ops costs ~10 s in
    aggregator-actor spin-up, so the join-rounds path costs minutes of
    fixed overhead regardless of input size.  Above the threshold it
    switches to :func:`..canonicalize.cc_labels` (min-label propagation
    + pointer-jumping joins — O(log diameter) rounds, no edge list on
    the driver); parity between the two paths is tested on seeded
    graphs (tests/test_training_data.py).  Pair generation is
    block-bounded either way, and the final assignment is one union +
    groupby-min — never a corpus-scale driver materialization."""
    pairs = jaccard_block_pairs(
        ds,
        block_cols=block_cols,
        text_col=text_col,
        id_col=id_col,
        threshold_num=threshold_num,
        threshold_den=threshold_den,
        max_block=max_block,
        ngram=ngram,
    )
    return cluster_from_pairs(
        ds,
        pairs,
        id_col=id_col,
        a_col="doc_id_a",
        b_col="doc_id_b",
        max_iters=max_iters,
        num_partitions=num_partitions,
        max_driver_edges=max_driver_edges,
    )


def cluster_from_pairs(
    ds: "ray.data.Dataset",
    pairs: "ray.data.Dataset",
    *,
    id_col: str = "doc_id",
    a_col: str = "doc_id_a",
    b_col: str = "doc_id_b",
    max_iters: int = 15,
    num_partitions: int | None = None,
    max_driver_edges: int = 2_000_000,
) -> "ray.data.Dataset":
    """Shared cluster-assignment tail for any near-dup pair graph
    (Jaccard, cosine, MinHash-verified, …): connected components over
    ``pairs`` with the size-adaptive engine documented on
    :func:`jaccard_clusters`, then every row of ``ds`` labeled
    (id_col, cluster_id) — rows in no pair are singleton clusters.

    In the driver regime the {node: root} map is already
    driver-resident, so the assignment is a broadcast + one stateless
    map_batches — ZERO shuffle; only the distributed regime pays the
    union + groupby-min."""
    from .canonicalize import _union_find_dict, cc_labels

    def sym(df: pd.DataFrame) -> pd.DataFrame:
        a = df[a_col].astype("int64")
        b = df[b_col].astype("int64")
        return pd.DataFrame(
            {"src": pd.concat([a, b], ignore_index=True),
             "dst": pd.concat([b, a], ignore_index=True)}
        )

    edges = pairs.map_batches(sym, batch_format="pandas").materialize()
    n_edges = edges.count()
    # output contract (BOTH regimes): one row per ``ds`` row, in ds
    # order semantics — edge nodes absent from ds are ignored, duplicate
    # ds ids yield duplicate rows
    if n_edges <= max_driver_edges:
        mapping = _union_find_dict(edges)
        map_df = pd.DataFrame(
            {
                id_col: pd.array(list(mapping.keys()), dtype="int64"),
                "cluster_id": pd.array(list(mapping.values()), dtype="Int64"),
            }
        )
        ref = ray.put(map_df)

        def assign(df: pd.DataFrame) -> pd.DataFrame:
            # vectorized hash-merge against the broadcast map (per-worker
            # deserialization is cached by Ray); nullable Int64 keeps
            # unmatched ids exact before the fillna
            m = ray.get(ref)
            out = pd.DataFrame({id_col: df[id_col].astype("int64")})
            out = out.merge(m, on=id_col, how="left")
            out["cluster_id"] = (
                out["cluster_id"].fillna(out[id_col]).astype("int64")
            )
            return out

        return ds.map_batches(assign, batch_format="pandas")

    labels = cc_labels(
        edges, max_iters=max_iters, num_partitions=num_partitions
    )

    def ids_only(df: pd.DataFrame) -> pd.DataFrame:
        return pd.DataFrame({"node": df[id_col].astype("int64")})

    from ..util import heal_schema, join_partitions

    # cluster-derived, never a constant: 8 aggregator actors in an
    # 8-cpu session starve the producer tasks (deadlock)
    num_partitions = join_partitions(num_partitions)

    joined = heal_schema(
        ds.map_batches(ids_only, batch_format="pandas"), num_partitions
    ).join(
        heal_schema(labels, num_partitions), "left_outer",
        num_partitions, on=("node",),
    )

    def final(t):
        # arrow-level coalesce: int64-with-nulls stays exact (a pandas
        # conversion would round ids above 2^53 through float64)
        import pyarrow as pa
        import pyarrow.compute as pc

        node = pc.cast(t["node"], pa.int64())
        lbl = (
            pc.cast(t["label"], pa.int64())
            if "label" in t.column_names
            else pa.nulls(len(t), pa.int64())
        )
        return pa.table({id_col: node, "cluster_id": pc.coalesce(lbl, node)})

    return joined.map_batches(final, batch_format="pyarrow")


# ---------------------------------------------------------------------------
# MinHash + LSH
# ---------------------------------------------------------------------------


class MinHasher:
    """Stateful map_batches stage: text → MinHash signature.

    Permutation parameters are derived once per actor in ``__init__`` from
    a fixed seed (deterministic across retries and cluster sizes); shingle
    hashes are memoized md5_u64 values masked to 61 bits, permuted with an
    exact (a·h+b) mod (2^61−1) — the same integers a DuckDB oracle
    computes with HUGEINT arithmetic."""

    def __init__(
        self,
        num_perm: int = 128,
        shingle_k: int = 3,
        seed: int = 42,
        memo_rows: int = 1 << 19,
        chunk_rows: int = 128,
    ):
        a, b = minhash_params(num_perm, seed)
        self.a = np.array(a, dtype=np.uint64)[:, None]
        self.b = np.array(b, dtype=np.uint64)[:, None]
        self.num_perm = num_perm
        self.k = shingle_k
        # cross-batch memo of PERMUTED rows (shingle → its num_perm
        # signature slots), array-backed so per-doc minima gather straight
        # from it: near-dup corpora repeat shingles heavily ACROSS batches
        # (measured ~5× on the bench probe), and re-permuting a repeat
        # costs ~35 array passes vs one dict hit.  Bounded: reset when
        # ``memo_rows`` (default 512 K rows ≈ num_perm·8 B each) is full —
        # per-ACTOR memory, independent of corpus size.
        self._memo_cap = memo_rows
        self._chunk = chunk_rows
        self._idx: dict[str, int] = {}
        self._rows = np.empty((0, num_perm), dtype=np.uint64)
        self._n = 0

    def signature(self, text: str) -> np.ndarray:
        sh = shingle_set(text, self.k)
        if not sh:
            # sentinel: real slots are < M61, so all-M61 marks "no shingles"
            return np.full(self.num_perm, _M61, dtype=np.uint64)
        h = np.array([_md5_u64_cached(s) for s in sh], dtype=np.uint64) & (
            _B61 - np.uint64(1)  # % 2^61 == low-61-bit mask: no division
        )
        m = _fold61(_mulmod61(self.a, h[None, :]) + self.b)  # sum < 2·M61
        return m.min(axis=1)

    def __call__(self, df: pd.DataFrame) -> pd.DataFrame:
        # Two regimes, chosen per batch, bit-identical outputs (min over
        # a multiset equals min over its support, and both paths compute
        # the same (a·h+b) mod M61 integers):
        #
        # * MEMO path — near-dup corpora repeat shingles heavily (sf0.1
        #   documents: ~25% unique within a batch, ~5× repetition across
        #   a block), so permute each distinct shingle ONCE per actor
        #   lifetime (bounded array-backed memo) and take per-doc row
        #   minima by gathering memo rows.
        # * STREAM path — when repetition is LOW (word-shingle corpora
        #   are mostly unique), the memo is pure overhead: its row
        #   writes + per-instance gathers stream ~2 KB per shingle
        #   through a >L3 buffer, which saturates single-node DRAM and
        #   stops the stage scaling across workers.  Instead permute the
        #   per-instance hash array in doc-aligned chunks small enough
        #   to stay in cache and reduce per-doc minima in place
        #   (np.minimum.reduceat) — nothing corpus-sized is written.
        texts = df["text"].fillna("")
        sh_lists = [shingle_set(t, self.k) for t in texts]
        lens = np.fromiter(
            (len(s) for s in sh_lists), dtype=np.int64, count=len(sh_lists)
        )
        instances = int(lens.sum())
        # batch-local dedup first (cheap, needed by both paths)
        code_of: dict[str, int] = {}
        doc_codes: list[list[int]] = []
        for sh in sh_lists:
            doc_codes.append([code_of.setdefault(s, len(code_of)) for s in sh])
        uniq = list(code_of)
        # hits the memo would score on this batch (batch-distinct already
        # in it) — decide the regime from actual reuse, not a guess
        memo_hits = sum(1 for s in uniq if s in self._idx) if self._n else 0
        reuse = (instances - len(uniq)) + memo_hits
        if uniq and reuse * 3 < instances:
            return self._stream_batch(df, sh_lists, lens, code_of, doc_codes)
        return self._memo_batch(df, uniq, doc_codes)

    def _hash_uniq(self, uniq: list[str]) -> np.ndarray:
        return np.fromiter(
            (_md5_u64_cached(s) for s in uniq),
            dtype=np.uint64,
            count=len(uniq),
        ) & (_B61 - np.uint64(1))  # % 2^61 == low-61-bit mask: no division

    def _finish(self, df: pd.DataFrame, sigs) -> pd.DataFrame:
        out = pd.DataFrame({"doc_id": df["doc_id"].astype("int64")})
        out["sig"] = [s.tobytes() for s in sigs]  # fixed num_perm×8 B, LE
        return out

    def _stream_batch(self, df, sh_lists, lens, code_of, doc_codes):
        h_uniq = self._hash_uniq(list(code_of))
        flat = h_uniq[np.concatenate(doc_codes).astype(np.int64)] if len(
            h_uniq
        ) else np.array([], dtype=np.uint64)
        ends = np.cumsum(lens)
        starts = ends - lens
        sent = np.full(self.num_perm, _M61, dtype=np.uint64)
        sigs: list = [sent] * len(sh_lists)
        # doc-aligned chunks of ~8·chunk instances: the (num_perm × n)
        # permute temporaries stay cache-resident and are consumed by
        # reduceat immediately — no memo write, no gather
        target = max(self._chunk * 8, 1024)
        d0 = 0
        while d0 < len(sh_lists):
            d1 = d0
            tot = 0
            while d1 < len(sh_lists) and (tot == 0 or tot + lens[d1] <= target):
                tot += lens[d1]
                d1 += 1
            nz = [d for d in range(d0, d1) if lens[d]]
            if nz:
                lo, hi = starts[nz[0]], ends[nz[-1]]
                hc = flat[lo:hi]
                m = _fold61(
                    _mulmod61(self.a, hc[None, :]) + self.b
                )  # (num_perm, tot); sum < 2·M61
                offs = (starts[nz] - lo).astype(np.int64)
                mins = np.minimum.reduceat(m, offs, axis=1)
                for j, d in enumerate(nz):
                    sigs[d] = mins[:, j]
            d0 = d1
        return self._finish(df, sigs)

    def _memo_batch(self, df, uniq, doc_codes):
        if self._n > self._memo_cap:
            self._idx = {}
            self._rows = np.empty((0, self.num_perm), dtype=np.uint64)
            self._n = 0
        idx = self._idx
        n0 = self._n
        new_sh: list[str] = []
        remap = np.empty(len(uniq), dtype=np.int64)
        for bc, s in enumerate(uniq):
            i = idx.get(s)
            if i is None:
                i = n0 + len(new_sh)
                idx[s] = i
                new_sh.append(s)
            remap[bc] = i
        if new_sh:
            need = n0 + len(new_sh)
            if need > len(self._rows):
                grown = np.empty(
                    (max(need, 2 * len(self._rows), 1 << 16), self.num_perm),
                    dtype=np.uint64,
                )
                grown[:n0] = self._rows[:n0]
                self._rows = grown
            h = self._hash_uniq(new_sh)
            # (|U| × num_perm) layout: each doc's gather then reads ~|doc|
            # CONTIGUOUS 1 KB rows — the (num_perm × |U|) orientation made
            # it a strided column gather across a >100 MB matrix (cache-
            # and TLB-hostile, and it stopped scaling across workers).
            # CHUNKED over shingles: 128 rows × num_perm × 8 B keeps every
            # permute temporary ~128 KB — L2-resident and below glibc's
            # mmap threshold, so the ~10 temporaries per fold recycle in
            # cache instead of streaming 4 MB each through DRAM/munmap;
            # measured 16-way actor-parallel, big chunks made per-task
            # CPU inflate ~10x vs the same kernel standalone
            step = self._chunk
            for s0 in range(0, len(new_sh), step):
                hc = h[s0 : s0 + step, None]
                self._rows[n0 + s0 : n0 + min(s0 + step, len(new_sh))] = (
                    _fold61(_mulmod61(hc, self.a.T) + self.b.T)  # sum < 2·M61
                )
            self._n = need
        m = self._rows
        sent = np.full(self.num_perm, _M61, dtype=np.uint64)
        sigs = [
            m[remap[c]].min(axis=0) if c else sent for c in doc_codes
        ]
        return self._finish(df, sigs)


def minhash_signatures(
    ds: "ray.data.Dataset",
    *,
    num_perm: int = 128,
    shingle_k: int = 3,
    concurrency=None,
    batch_size: int = 1024,
) -> "ray.data.Dataset":
    # batch_size is EXPLICIT and small: each batch materializes a
    # (distinct-shingles × num_perm) u64 permute matrix, and word-level
    # k-shingles are nearly unique — a block-sized batch (tens of
    # thousands of docs) allocates GiB-scale temporaries per actor,
    # saturating DRAM so extra workers stop helping (measured: the
    # signature stage ran 4 cpus == 16 cpus on 20 K-doc batches).
    # ~1 K docs keeps the matrix ~100 MB and restores task-level
    # parallel slack.
    from ..util import auto_concurrency

    return ds.map_batches(
        MinHasher,
        fn_constructor_kwargs={"num_perm": num_perm, "shingle_k": shingle_k},
        batch_format="pandas",
        batch_size=batch_size,
        concurrency=auto_concurrency(concurrency),
    )



def _segment_bounds(keys: np.ndarray) -> np.ndarray:
    """Boundaries of equal-key runs in a SORTED key array (shared by every
    per-bucket pair generator so the segmentation logic exists once)."""
    return np.flatnonzero(np.r_[True, keys[1:] != keys[:-1], True])


def _grouped_pairs(df: pd.DataFrame, key: str, max_bucket: int) -> pd.DataFrame:
    """All within-group id pairs for every group of ``key`` present in this
    (coarse) partition: sort once, slice per group — a python loop only
    over the (few) groups of size ≥ 2, numpy inside."""
    df = df[[key, "doc_id"]].drop_duplicates().sort_values([key, "doc_id"])
    keys = df[key].to_numpy()
    ids = df["doc_id"].to_numpy()
    bounds = _segment_bounds(keys)
    outs_a, outs_b = [], []
    for s, e in zip(bounds[:-1], bounds[1:]):
        n = e - s
        if n < 2:
            continue
        if n > max_bucket:
            raise RuntimeError(f"LSH bucket cap exceeded: {n} > {max_bucket}")
        ia, ib = np.triu_indices(n, 1)
        outs_a.append(ids[s + ia])
        outs_b.append(ids[s + ib])
    if not outs_a:
        return pd.DataFrame({"doc_id_a": [], "doc_id_b": []}).astype("int64")
    return pd.DataFrame(
        {"doc_id_a": np.concatenate(outs_a), "doc_id_b": np.concatenate(outs_b)}
    ).astype("int64")


def _dedup_pairs(
    pairs: "ray.data.Dataset",
    extra_cols: tuple[str, ...] = (),
    id_cols: tuple[str, str] = ("doc_id_a", "doc_id_b"),
) -> "ray.data.Dataset":
    """Distinct id pairs via coarse hash buckets + per-bucket
    ``drop_duplicates`` — NOT one pandas group per pair."""
    ca, cb = id_cols

    def add_bucket(df: pd.DataFrame) -> pd.DataFrame:
        df = df.copy()
        df["_pb"] = (
            (df[ca].to_numpy(np.uint64) * np.uint64(0x9E3779B97F4A7C15)
             + df[cb].to_numpy(np.uint64)) % np.uint64(_COARSE)
        ).astype("int32")
        return df

    cols = [ca, cb, *extra_cols]

    def dedup(grp: pd.DataFrame) -> pd.DataFrame:
        return (
            grp.sort_values([ca, cb])
            .drop_duplicates([ca, cb], keep="first")[cols]
        )

    return (
        pairs.map_batches(add_bucket, batch_format="pandas")
        .groupby("_pb")
        .map_groups(dedup, batch_format="pandas")
    )


def band_buckets(
    sigs: "ray.data.Dataset", *, num_perm: int = 128, bands: int = 32
) -> "ray.data.Dataset":
    """(bucket, doc_id) rows: one md5_u64 bucket key per signature band
    (``band:h0,h1,...`` — the exact string a SQL oracle re-derives with
    string_agg).  Docs with no shingles (sentinel signature) emit nothing."""
    if num_perm % bands:
        raise ValueError(
            f"bands ({bands}) must divide num_perm ({num_perm}): trailing "
            "permutations would silently drop out of candidate generation"
        )
    rows_per_band = num_perm // bands

    def to_buckets(df: pd.DataFrame) -> pd.DataFrame:
        if not len(df):
            return pd.DataFrame(
                {"bucket": pd.array([], dtype="int64"),
                 "doc_id": pd.array([], dtype="int64")}
            )
        mat = np.frombuffer(b"".join(df["sig"]), dtype=np.uint64).reshape(
            len(df), -1
        )
        keep = mat[:, 0] != _M61  # sentinel: docs with no shingles
        mat = mat[keep]
        ids = df["doc_id"].to_numpy(np.int64)[keep]
        rows = mat.tolist()  # one C-level pass to python ints
        md5 = hashlib.md5
        buckets = np.empty(len(rows) * bands, dtype=np.uint64)
        i = 0
        for sig in rows:
            for b in range(bands):
                key = "%d:%s" % (
                    b, ",".join(map(str, sig[b * rows_per_band:(b + 1) * rows_per_band])),
                )
                buckets[i] = int.from_bytes(md5(key.encode()).digest()[8:], "little")
                i += 1
        return pd.DataFrame(
            {"bucket": buckets.astype(np.int64),
             "doc_id": np.repeat(ids, bands)}
        )

    return sigs.map_batches(to_buckets, batch_format="pandas")


def minhash_lsh_pairs(
    ds: "ray.data.Dataset",
    *,
    num_perm: int = 128,
    bands: int = 32,
    shingle_k: int = 3,
    threshold: float = 0.8,
    max_bucket: int = 100_000,
    num_partitions: int | None = None,
    concurrency=None,
) -> "ray.data.Dataset":
    """Near-duplicate pairs: MinHash signatures → LSH band buckets →
    candidate pairs → signature verification, all distributed.

    The verify step hash-partition-JOINs the candidate pairs against the
    signature table twice (a-side, b-side) — no driver-side signature
    materialization, no broadcast: at corpus scale the signatures stay
    where the shuffle put them and only candidate pairs (bounded by the
    near-dup density times band count) move.  The candidate table is
    materialized once (it is pair-sized, not corpus-sized) to keep the two
    join probes from recomputing the bucket shuffle.

    Output: (doc_id_a, doc_id_b, est_jaccard_num) with
    est_jaccard_num = #equal signature slots (out of ``num_perm``) —
    integer, ≥ ceil(threshold * num_perm)."""
    min_eq = int(np.ceil(threshold * num_perm))
    from ..util import join_partitions

    num_partitions = join_partitions(num_partitions)

    # materialize the signature table ONCE: the bucket pipeline and both
    # join probes consume it, and without a checkpoint each consumer would
    # re-execute the MinHasher lineage (signatures are num_perm×8 B/doc —
    # object-store-sized at any corpus scale, spilling if needed; at 10^12
    # docs swap for a write_parquet checkpoint)
    sigs = minhash_signatures(
        ds, num_perm=num_perm, shingle_k=shingle_k, concurrency=concurrency
    ).materialize()

    buckets = band_buckets(sigs, num_perm=num_perm, bands=bands)

    def coarse(df: pd.DataFrame) -> pd.DataFrame:
        df = df.copy()
        df["_cb"] = (df["bucket"].to_numpy(np.uint64) % np.uint64(_COARSE)).astype(
            "int32"
        )
        return df

    raw_pairs = (
        buckets.map_batches(coarse, batch_format="pandas")
        .groupby("_cb")
        .map_groups(
            lambda g: _grouped_pairs(g, "bucket", max_bucket), batch_format="pandas"
        )
    )
    cands = _dedup_pairs(raw_pairs).materialize()

    def rename(col_id: str, col_sig: str):
        def f(df: pd.DataFrame) -> pd.DataFrame:
            return pd.DataFrame({col_id: df["doc_id"], col_sig: df["sig"]})

        return f

    from ..util import heal_schema

    sig_a = heal_schema(
        sigs.map_batches(rename("doc_id_a", "sig_a"), batch_format="pandas"),
        num_partitions,
    )
    sig_b = heal_schema(
        sigs.map_batches(rename("doc_id_b", "sig_b"), batch_format="pandas"),
        num_partitions,
    )
    first = heal_schema(cands, num_partitions).join(
        sig_a, "inner", num_partitions, on=("doc_id_a",)
    )
    # heal between the chained joins: the first join's output can carry
    # schema-less empty partitions that break the second join's key
    # resolution (same failure mode fixed in minhash_lsh_pairs_against)
    joined = heal_schema(first, num_partitions).join(
        sig_b, "inner", num_partitions, on=("doc_id_b",)
    )

    def verify(df: pd.DataFrame) -> pd.DataFrame:
        if not len(df):
            return pd.DataFrame(
                {"doc_id_a": [], "doc_id_b": [], "est_jaccard_num": []}
            ).astype("int64")
        sa = np.frombuffer(b"".join(df["sig_a"]), dtype=np.uint64).reshape(
            len(df), num_perm
        )
        sb = np.frombuffer(b"".join(df["sig_b"]), dtype=np.uint64).reshape(
            len(df), num_perm
        )
        eq = (sa == sb).sum(axis=1).astype("int64")
        out = pd.DataFrame(
            {
                "doc_id_a": df["doc_id_a"].to_numpy(np.int64),
                "doc_id_b": df["doc_id_b"].to_numpy(np.int64),
                "est_jaccard_num": eq,
            }
        )
        return out[eq >= min_eq].reset_index(drop=True)

    return joined.map_batches(verify, batch_format="pandas")


def minhash_lsh_pairs_against(
    new_ds: "ray.data.Dataset",
    corpus_ds: "ray.data.Dataset",
    *,
    num_perm: int = 128,
    bands: int = 32,
    shingle_k: int = 3,
    threshold: float = 0.8,
    max_bucket: int = 100_000,
    num_partitions: int | None = None,
    concurrency=None,
) -> "ray.data.Dataset":
    """Incremental-ingest near-dup filter: (new_doc_id, corpus_doc_id,
    est_jaccard_num) pairs between a NEW shard and an EXISTING corpus —
    the shape a continuously-fed training pipeline runs per arriving
    shard, where within-corpus pairs are already resolved and only
    cross-side matches matter.

    Same LSH machinery as :func:`minhash_lsh_pairs`, but the band-bucket
    rows carry a side tag and each bucket emits only CROSS-side pairs
    (new × corpus), so a bucket with n new + m corpus members costs
    n·m, not (n+m)².  Verification joins each side's OWN signature
    table — overlapping doc_id spaces between shard and corpus stay
    unambiguous.  The corpus side's signatures/buckets are recomputed
    here; a production loop would checkpoint them once (write_parquet)
    and reuse across shards."""
    min_eq = int(np.ceil(threshold * num_perm))
    from ..util import heal_schema, join_partitions

    num_partitions = join_partitions(num_partitions)

    sig_n = minhash_signatures(
        new_ds, num_perm=num_perm, shingle_k=shingle_k, concurrency=concurrency
    ).materialize()
    sig_c = minhash_signatures(
        corpus_ds, num_perm=num_perm, shingle_k=shingle_k,
        concurrency=concurrency,
    ).materialize()

    def tag(side: int):
        def f(df: pd.DataFrame) -> pd.DataFrame:
            df = df.copy()
            df["side"] = np.int8(side)
            df["_cb"] = (
                df["bucket"].to_numpy(np.uint64) % np.uint64(_COARSE)
            ).astype("int32")
            return df

        return f

    both = (
        band_buckets(sig_n, num_perm=num_perm, bands=bands)
        .map_batches(tag(1), batch_format="pandas")
        .union(
            band_buckets(sig_c, num_perm=num_perm, bands=bands)
            .map_batches(tag(0), batch_format="pandas")
        )
    )

    def cross_pairs(df: pd.DataFrame) -> pd.DataFrame:
        d = df[["bucket", "side", "doc_id"]].drop_duplicates().sort_values(
            ["bucket", "side", "doc_id"]
        )
        keys = d["bucket"].to_numpy()
        sides = d["side"].to_numpy()
        ids = d["doc_id"].to_numpy()
        bounds = _segment_bounds(keys)
        outs_n, outs_c = [], []
        for s, e in zip(bounds[:-1], bounds[1:]):
            if e - s > max_bucket:
                raise RuntimeError(
                    f"LSH bucket cap exceeded: {e - s} > {max_bucket}"
                )
            seg_sides = sides[s:e]
            c_ids = ids[s:e][seg_sides == 0]
            n_ids = ids[s:e][seg_sides == 1]
            if len(c_ids) and len(n_ids):
                outs_n.append(np.repeat(n_ids, len(c_ids)))
                outs_c.append(np.tile(c_ids, len(n_ids)))
        if not outs_n:
            return pd.DataFrame(
                {"new_doc_id": [], "corpus_doc_id": []}
            ).astype("int64")
        return pd.DataFrame(
            {
                "new_doc_id": np.concatenate(outs_n),
                "corpus_doc_id": np.concatenate(outs_c),
            }
        ).astype("int64")

    raw = both.groupby("_cb").map_groups(cross_pairs, batch_format="pandas")
    cands = _dedup_pairs(
        raw, id_cols=("new_doc_id", "corpus_doc_id")
    ).materialize()

    def rename(col_id: str, col_sig: str):
        def f(df: pd.DataFrame) -> pd.DataFrame:
            return pd.DataFrame({col_id: df["doc_id"], col_sig: df["sig"]})

        return f

    first = heal_schema(cands, num_partitions).join(
        heal_schema(
            sig_n.map_batches(
                rename("new_doc_id", "sig_a"), batch_format="pandas"
            ),
            num_partitions,
        ),
        "inner", num_partitions, on=("new_doc_id",),
    )
    # heal BETWEEN the chained joins too: the first join's output can
    # contain schema-less empty partitions (sparse candidate sets), and
    # those reach the second join's key resolution as column-less blocks
    # ("No match for key field corpus_doc_id" — hit at sf0.01)
    joined = heal_schema(first, num_partitions).join(
        heal_schema(
            sig_c.map_batches(
                rename("corpus_doc_id", "sig_b"), batch_format="pandas"
            ),
            num_partitions,
        ),
        "inner", num_partitions, on=("corpus_doc_id",),
    )

    def verify(df: pd.DataFrame) -> pd.DataFrame:
        if not len(df):
            return pd.DataFrame(
                {"new_doc_id": [], "corpus_doc_id": [], "est_jaccard_num": []}
            ).astype("int64")
        sa = np.frombuffer(b"".join(df["sig_a"]), dtype=np.uint64).reshape(
            len(df), num_perm
        )
        sb = np.frombuffer(b"".join(df["sig_b"]), dtype=np.uint64).reshape(
            len(df), num_perm
        )
        eq = (sa == sb).sum(axis=1).astype("int64")
        out = pd.DataFrame(
            {
                "new_doc_id": df["new_doc_id"].to_numpy(np.int64),
                "corpus_doc_id": df["corpus_doc_id"].to_numpy(np.int64),
                "est_jaccard_num": eq,
            }
        )
        return out[eq >= min_eq].reset_index(drop=True)

    return joined.map_batches(verify, batch_format="pandas")


# ---------------------------------------------------------------------------
# SimHash
# ---------------------------------------------------------------------------


_BIT_SHIFTS = np.arange(64, dtype=np.uint64)

_SW1 = np.uint64(0x5555555555555555)
_SW2 = np.uint64(0x3333333333333333)
_SW4 = np.uint64(0x0F0F0F0F0F0F0F0F)
_SWM = np.uint64(0x0101010101010101)


def _popcount64(x: np.ndarray) -> np.ndarray:
    """Vectorized SWAR popcount over a uint64 array."""
    x = x - ((x >> np.uint64(1)) & _SW1)
    x = (x & _SW2) + ((x >> np.uint64(2)) & _SW2)
    x = (x + (x >> np.uint64(4))) & _SW4
    with np.errstate(over="ignore"):
        return (x * _SWM) >> np.uint64(56)


def _simhash_batch(texts: "pd.Series") -> np.ndarray:
    """64-bit simhash per text, vectorized across the whole batch: one flat
    token-hash array + reduceat per document (token multiplicity counts,
    per the classic Charikar construction)."""
    tok_lists = [tokens(t) for t in texts]
    lens = np.array([len(t) for t in tok_lists], dtype=np.int64)
    flat = [tok for toks in tok_lists for tok in toks]
    if not flat:
        return np.zeros(len(tok_lists), dtype=np.uint64)
    hs = np.array([_md5_u64_cached(t) for t in flat], dtype=np.uint64)
    bits = ((hs[:, None] >> _BIT_SHIFTS) & np.uint64(1)).astype(np.int64)  # (T, 64)
    starts = np.zeros(len(lens), dtype=np.int64)
    np.cumsum(lens[:-1], out=starts[1:])
    # reduceat needs strictly valid segment starts; empty docs handled after
    nonempty = lens > 0
    seg = np.zeros((len(lens), 64), dtype=np.int64)
    if nonempty.any():
        red = np.add.reduceat(bits, starts[nonempty], axis=0)
        # reduceat with duplicate starts (consecutive empty docs) is avoided
        # by indexing only nonempty segments
        seg[nonempty] = red
    acc = 2 * seg - lens[:, None]                  # sum of (2·bit − 1)
    out = ((acc > 0).astype(np.uint64) << _BIT_SHIFTS[None, :]).sum(
        axis=1, dtype=np.uint64
    )
    out[~nonempty] = 0
    return out


def simhash_table(
    ds: "ray.data.Dataset", *, text_col: str = "text", id_col: str = "doc_id"
) -> "ray.data.Dataset":
    """(doc_id, simhash, band0..band3): 64-bit simhash split into four
    16-bit bands; Hamming-≤3 near-dups share at least one band.  Token
    hashes are md5_u64 so a DuckDB oracle rebuilds the identical bits."""

    def f(df: pd.DataFrame) -> pd.DataFrame:
        hs = _simhash_batch(df[text_col].fillna(""))
        out = pd.DataFrame({"doc_id": df[id_col].astype("int64")})
        out["simhash"] = hs.view(np.int64)
        for b in range(4):
            out[f"band{b}"] = (
                (hs >> np.uint64(16 * b)) & np.uint64(0xFFFF)
            ).astype(np.int64)
        return out

    return ds.map_batches(f, batch_format="pandas")


def simhash_pairs(
    ds: "ray.data.Dataset",
    *,
    max_hamming: int = 3,
    text_col: str = "text",
    id_col: str = "doc_id",
    max_bucket: int = 100_000,
) -> "ray.data.Dataset":
    """Near-duplicate pairs with Hamming distance ≤ ``max_hamming`` via
    band buckets (4 × 16-bit; pigeonhole-complete for distance ≤ 3, so
    recall is exactly 1 and the output equals the all-pairs SQL oracle).

    Band fan-out is a batch-level concat (4× repeat with a band-keyed
    column), bucket grouping is coarse (``_COARSE`` partitions, per-bucket
    pairing inside), Hamming is a vectorized SWAR popcount, and the final
    pair dedup is bucket-hash + drop_duplicates — no row-wise flat_map, no
    per-pair pandas groups."""
    table = simhash_table(ds, text_col=text_col, id_col=id_col)

    def fan_out(df: pd.DataFrame) -> pd.DataFrame:
        parts = []
        for b in range(4):
            parts.append(
                pd.DataFrame(
                    {
                        "bkey": (df[f"band{b}"].to_numpy(np.int64) + (b << 16)),
                        "doc_id": df["doc_id"].to_numpy(np.int64),
                        "simhash": df["simhash"].to_numpy(np.int64),
                        "_cb": ((df[f"band{b}"].to_numpy(np.int64) + b) % _COARSE),
                    }
                )
            )
        return pd.concat(parts, ignore_index=True)

    def bucket_pairs(grp: pd.DataFrame) -> pd.DataFrame:
        grp = grp[["bkey", "doc_id", "simhash"]].drop_duplicates(
            ["bkey", "doc_id"]
        ).sort_values(["bkey", "doc_id"])
        keys = grp["bkey"].to_numpy()
        ids = grp["doc_id"].to_numpy()
        hs = grp["simhash"].to_numpy().view(np.uint64)
        bounds = _segment_bounds(keys)
        rows_a, rows_b, rows_d = [], [], []
        for s, e in zip(bounds[:-1], bounds[1:]):
            n = e - s
            if n < 2:
                continue
            if n > max_bucket:
                raise RuntimeError(f"simhash bucket cap exceeded: {n}")
            ia, ib = np.triu_indices(n, 1)
            d = _popcount64(hs[s + ia] ^ hs[s + ib]).astype(np.int64)
            keep = d <= max_hamming
            rows_a.append(ids[s + ia][keep])
            rows_b.append(ids[s + ib][keep])
            rows_d.append(d[keep])
        if not rows_a:
            return pd.DataFrame(
                {"doc_id_a": [], "doc_id_b": [], "hamming": []}
            ).astype("int64")
        return pd.DataFrame(
            {
                "doc_id_a": np.concatenate(rows_a),
                "doc_id_b": np.concatenate(rows_b),
                "hamming": np.concatenate(rows_d),
            }
        ).astype("int64")

    pairs = (
        table.map_batches(fan_out, batch_format="pandas")
        .groupby("_cb")
        .map_groups(bucket_pairs, batch_format="pandas")
    )
    return _dedup_pairs(pairs, extra_cols=("hamming",))


# ---------------------------------------------------------------------------
# benchmark contamination (decontamination scan)
# ---------------------------------------------------------------------------


def benchmark_contamination(
    ds: "ray.data.Dataset",
    *,
    bench_mod: int = 20,
    shingle_k: int = 3,
    id_col: str = "doc_id",
    text_col: str = "text",
    min_overlap: int = 1,
) -> "ray.data.Dataset":
    """Decontamination scan: flag training documents that share k-token
    shingles with a held-out benchmark/eval set (the overlap check run
    before any training corpus ships — GPT-3 appendix C / Llama-style
    n-gram decontamination).

    The benchmark membership here is the deterministic md5 split
    (``md5(doc_id) % bench_mod == 0`` — same kernel as
    ``docs_hash_sample``); in a real pipeline it would be an external
    eval corpus.  Either way the benchmark side is EVAL-scale (MBs, not
    corpus-scale), so its distinct shingle set is collected once on the
    driver and broadcast via ``ray.put``; the scan itself is one
    stateless ``map_batches`` over the corpus — zero shuffle, linear in
    corpus size, trivially resumable.  Shingling mirrors
    :func:`shingle_set` (== the MinHash oracle CTE).

    Returns per-TRAINING-doc (benchmark docs are not scored)
    ``(doc_id, n_grams, n_overlap, contaminated)`` — all int64."""

    def bench_grams(df: pd.DataFrame) -> pd.DataFrame:
        ids = df[id_col].astype("int64")
        grams: set[str] = set()
        for i, t in zip(ids, df[text_col].fillna("")):
            if _md5_u64(str(int(i))) % bench_mod == 0:
                grams.update(shingle_set(t, shingle_k))
        return pd.DataFrame({"g": sorted(grams)})

    # per-batch distinct first, then a driver set() over the (tiny)
    # benchmark gram rows — documented eval-scale assumption
    # to_pandas, NOT take_all: Ray 2.49's take_all pays ~0.5 ms/row
    # (per-row dict materialization) — 13 K gram rows cost seconds
    gdf = ds.map_batches(bench_grams, batch_format="pandas").to_pandas()
    # len-guard: an all-empty result is a COLUMN-LESS frame
    bench = frozenset(gdf["g"]) if len(gdf) else frozenset()
    ref = ray.put(bench)

    def scan(df: pd.DataFrame) -> pd.DataFrame:
        g = ray.get(ref)
        ids = df[id_col].astype("int64")
        rows = []
        for i, t in zip(ids, df[text_col].fillna("")):
            if _md5_u64(str(int(i))) % bench_mod == 0:
                continue
            sh = shingle_set(t, shingle_k)
            ov = sum(1 for s in sh if s in g)
            rows.append(
                (int(i), len(sh), ov, 1 if ov >= min_overlap else 0)
            )
        return pd.DataFrame(
            rows, columns=[id_col, "n_grams", "n_overlap", "contaminated"]
        ).astype("int64")

    return ds.map_batches(scan, batch_format="pandas")


def bloom_contamination(
    ds: "ray.data.Dataset",
    *,
    bench_mod: int = 20,
    shingle_k: int = 3,
    m_bits: int = 1 << 16,
    n_hashes: int = 3,
    id_col: str = "doc_id",
    text_col: str = "text",
) -> "ray.data.Dataset":
    """Bloom-filter decontamination scan — the FIXED-MEMORY variant of
    :func:`benchmark_contamination`.  The exact scan broadcasts the eval
    set's full distinct-shingle set; at a 100 TB eval corpus that set is
    itself unbounded, while a Bloom filter is ``m_bits`` forever (here
    64 Kbit = 8 KB; production would size m from the eval cardinality).
    Cost: deterministic false positives — flagged counts are an UPPER
    bound on true overlap, which is the safe direction for
    decontamination (never under-flag).

    Every bit position is md5-derived (position j of shingle s =
    ``md5(s + '\\x1f' + 'bloom' + str(j)) % m_bits``), so a DuckDB twin
    reproduces the filter AND the false positives bit-exactly.

    Two streaming passes, zero shuffle: (1) per-batch distinct bit
    positions from eval-split docs (``md5(doc_id) % bench_mod == 0``,
    same split as the exact scan) merged into one numpy bool array on
    the driver and ``ray.put`` once; (2) a stateless map_batches scan
    counting, per training doc, shingles whose ``n_hashes`` positions
    are all set.  Returns (doc_id, n_grams, n_hits, flagged) int64."""
    salts = [f"bloom{j}" for j in range(n_hashes)]

    def eval_bits(df: pd.DataFrame) -> pd.DataFrame:
        pos: set[int] = set()
        for i, t in zip(df[id_col].astype("int64"), df[text_col].fillna("")):
            if _md5_u64(str(int(i))) % bench_mod != 0:
                continue
            for s in shingle_set(t, shingle_k):
                for salt in salts:
                    pos.add(_md5_u64_cached(f"{s}\x1f{salt}") % m_bits)
        return pd.DataFrame({"p": pd.Series(sorted(pos), dtype="int64")})

    # the filter is ≤ m_bits positions regardless of eval size — the
    # whole point; to_pandas (not take_all: ~0.5 ms/row) then one array
    pdf = ds.map_batches(eval_bits, batch_format="pandas").to_pandas()
    bits = np.zeros(m_bits, dtype=bool)
    if len(pdf):  # empty to_pandas frames are COLUMN-LESS — len-guard
        bits[pdf["p"].to_numpy()] = True
    ref = ray.put(bits)

    def scan(df: pd.DataFrame) -> pd.DataFrame:
        b = ray.get(ref)
        rows = []
        for i, t in zip(df[id_col].astype("int64"), df[text_col].fillna("")):
            i = int(i)
            if _md5_u64(str(i)) % bench_mod == 0:
                continue
            sh = shingle_set(t, shingle_k)
            hits = 0
            for s in sh:
                if all(
                    b[_md5_u64_cached(f"{s}\x1f{salt}") % m_bits]
                    for salt in salts
                ):
                    hits += 1
            rows.append((i, len(sh), hits, 1 if hits else 0))
        return pd.DataFrame(
            rows, columns=[id_col, "n_grams", "n_hits", "flagged"]
        ).astype("int64")

    return ds.map_batches(scan, batch_format="pandas")


# ---------------------------------------------------------------------------
# duplicate n-gram span coverage
# ---------------------------------------------------------------------------


def dup_span_coverage(
    ds: "ray.data.Dataset",
    *,
    id_col: str = "doc_id",
    text_col: str = "text",
    ngram: int = 8,
    num_partitions: int | None = None,
) -> "ray.data.Dataset":
    """Per-document duplicate-span statistics — the exact-substring face
    of corpus dedup (Lee et al. 2021, "Deduplicating Training Data Makes
    Language Models Better", at token-n-gram granularity): position i of
    a document is DUPLICATED when its ngram-token shingle also occurs in
    at least one OTHER document.  One row per document:
    (doc_id, n_tokens, n_dup_pos, covered_tokens), covered_tokens being
    the size of the union of the [i, i+ngram-1] windows over duplicated
    positions — how many tokens sit inside some cross-document span.

    Shape: positional shingle rows (md5-hashed — SQL-replicable) with a
    map-side first-in-doc flag → document frequency per hash via ONE
    groupby-count over the flagged rows → hash join back to positions →
    per-document interval union via a coarse-bucket shuffle and a
    vectorized same-doc gap scan (window length is constant, so the
    union is sum(min(gap, ngram)) over sorted positions — no per-doc
    pandas groups, no Python interval loop)."""
    from .graph import _nparts
    from ..util import heal_schema

    np_ = _nparts(num_partitions)
    B61 = 1 << 61

    def shingles(df: pd.DataFrame) -> pd.DataFrame:
        out_id: list[int] = []
        out_pos: list[int] = []
        out_h: list[int] = []
        out_first: list[bool] = []
        for i, t in zip(df[id_col].astype("int64"), df[text_col].fillna("")):
            toks = tokens(t)
            n_pos = len(toks) - ngram + 1
            if n_pos <= 0:
                continue
            seen: set[int] = set()
            i = int(i)
            for p in range(n_pos):
                h = _md5_u64_cached(" ".join(toks[p : p + ngram])) % B61
                out_id.append(i)
                out_pos.append(p + 1)  # 1-based == the SQL generate_series
                out_h.append(h)
                out_first.append(h not in seen)
                seen.add(h)
        return pd.DataFrame(
            {
                "doc_id": pd.Series(out_id, dtype="int64"),
                "pos": pd.Series(out_pos, dtype="int64"),
                "h": pd.Series(out_h, dtype="int64"),
                "first": pd.Series(out_first, dtype="bool"),
            }
        )

    def n_tok(df: pd.DataFrame) -> pd.DataFrame:
        return pd.DataFrame(
            {
                "doc_id": df[id_col].astype("int64"),
                "n_tokens": pd.Series(
                    [len(tokens(t)) for t in df[text_col].fillna("")],
                    dtype="int64",
                    index=df.index,
                ),
            }
        )

    toks_ds = ds.map_batches(n_tok, batch_format="pandas")
    sh = ds.map_batches(shingles, batch_format="pandas").materialize()

    def firsts(df: pd.DataFrame) -> pd.DataFrame:
        return df.loc[df["first"], ["h"]].reset_index(drop=True)

    def over_one(df: pd.DataFrame) -> pd.DataFrame:
        vc = df["h"].value_counts()
        return pd.DataFrame(
            {"h": pd.Series(vc.index[vc > 1], dtype="int64")}
        )

    from ..util import bucket_agg

    # h is shingle-scale — coarse-bucket the document-frequency count
    # (Ray's Aggregate pays per distinct key; see util.bucket_agg)
    dup = bucket_agg(
        sh.map_batches(firsts, batch_format="pandas"), ["h"], over_one
    ).materialize()

    def zeros(df: pd.DataFrame) -> pd.DataFrame:
        df = df.copy()
        df["n_dup_pos"] = pd.Series(0, dtype="int64", index=df.index)
        df["covered_tokens"] = pd.Series(0, dtype="int64", index=df.index)
        return df

    if dup.count() == 0:
        # no cross-document shingle anywhere; ALSO the fully-empty-Dataset
        # guard (heal_schema cannot conjure a schema for it)
        return toks_ds.map_batches(zeros, batch_format="pandas")

    pos_rows = sh.map_batches(
        lambda df: df[["doc_id", "pos", "h"]], batch_format="pandas"
    )
    dpos = heal_schema(pos_rows, np_).join(
        heal_schema(dup, np_), "inner", np_, on=("h",)
    )

    def bucket(df: pd.DataFrame) -> pd.DataFrame:
        out = df[["doc_id", "pos"]].copy()
        out["_b"] = (out["doc_id"] % _COARSE).astype("int32")
        return out

    def cov_scan(g: pd.DataFrame) -> pd.DataFrame:
        g = g.sort_values(["doc_id", "pos"])
        did = g["doc_id"].to_numpy()
        pos = g["pos"].to_numpy()
        same = np.empty(len(g), dtype=bool)
        same[:-1] = did[1:] == did[:-1]
        same[-1] = False
        gap = np.full(len(g), ngram, dtype="int64")
        gap[:-1] = np.where(same[:-1], pos[1:] - pos[:-1], ngram)
        contrib = np.minimum(gap, ngram)
        agg = (
            pd.DataFrame({"doc_id": did, "c": contrib})
            .groupby("doc_id")["c"]
            .agg(covered_tokens="sum", n_dup_pos="count")
            .reset_index()
        )
        return agg.astype("int64")

    cov = (
        dpos.map_batches(bucket, batch_format="pandas")
        .groupby("_b")
        .map_groups(cov_scan, batch_format="pandas")
    )

    joined = heal_schema(toks_ds, np_).join(
        heal_schema(cov, np_), "left_outer", np_, on=("doc_id",)
    )

    def final(t):
        import pyarrow as pa
        import pyarrow.compute as pc

        def col(name):
            if name in t.column_names:
                return pc.coalesce(
                    pc.cast(t[name], pa.int64()), pa.scalar(0, pa.int64())
                )
            return pa.nulls(len(t), pa.int64()).fill_null(0)

        return pa.table(
            {
                "doc_id": pc.cast(t["doc_id"], pa.int64()),
                "n_tokens": pc.cast(t["n_tokens"], pa.int64()),
                "n_dup_pos": col("n_dup_pos"),
                "covered_tokens": col("covered_tokens"),
            }
        )

    return joined.map_batches(final, batch_format="pyarrow")


# ---------------------------------------------------------------------------
# commit-version snapshot resolution
# ---------------------------------------------------------------------------


def latest_snapshot(
    corpus: "ray.data.Dataset",
    *,
    key_cols: tuple[str, ...] = ("repo", "path"),
    order_col: str = "commit",
    num_buckets: int = _COARSE,
) -> "ray.data.Dataset":
    """Resolve a multi-commit corpus to its latest snapshot: for every
    ``key_cols`` group keep the row with the maximum ``order_col``
    (requires a totally ordered version column — sortable commit ids or
    a joined-in timestamp; raw git hashes are NOT ordered).

    Same shape as exact_dedup: map-side pre-dedup per batch (combiner —
    shuffle traffic is distinct-files-per-block, not version-scale),
    coarse bucket hash of the file key, ONE shuffle, per-bucket
    vectorized ``sort_values + drop_duplicates(keep="last")`` — no
    per-file pandas groups."""
    keys = list(key_cols)

    def local_latest(df: pd.DataFrame) -> pd.DataFrame:
        df = df.sort_values(keys + [order_col]).drop_duplicates(
            keys, keep="last"
        )
        kh = df[keys[0]].astype(str)
        for c in keys[1:]:
            kh = kh + "\x00" + df[c].astype(str)
        df = df.copy()
        df["_bucket"] = np.array(
            [_md5_u64(s) % num_buckets for s in kh], dtype="int32"
        )
        return df

    def bucket_latest(grp: pd.DataFrame) -> pd.DataFrame:
        return (
            grp.sort_values(keys + [order_col])
            .drop_duplicates(keys, keep="last")
            .drop(columns=["_bucket"])
        )

    return (
        corpus.map_batches(local_latest, batch_format="pandas")
        .groupby("_bucket")
        .map_groups(bucket_latest, batch_format="pandas")
    )


def ppjoin_pairs(
    ds: "ray.data.Dataset",
    *,
    threshold_num: int = 7,
    threshold_den: int = 10,
    shingle_k: int = 3,
    text_col: str = "text",
    id_col: str = "doc_id",
    max_bucket: int = 100_000,
    num_partitions: int | None = None,
) -> "ray.data.Dataset":
    """EXACT global set-similarity self-join (k-shingle-hash Jaccard ≥
    num/den) via PREFIX FILTERING — the PPJoin candidate rule (Xiao et
    al., WWW'08; no positional filter): under ANY fixed total order of
    the token universe (here the 61-bit shingle hash value), two sets
    with J ≥ t MUST share a token inside their prefixes of length
    |x| − ceil(t·|x|) + 1, so candidates come from a prefix-token join
    instead of an all-pairs scan — the third dedup mechanism beside
    blocking (jaccard_block_pairs) and LSH (minhash_lsh_pairs), and the
    only global+exact one.

    Fully distributed verify: candidates ⋈ shingle rows (a-side) ⋈
    shingle rows (b-side, composite (doc, h) key) → bucketed
    intersection count → integer threshold test
    |A∩B|·den ≥ |A∪B|·num.  No set ever reaches the driver; shuffle
    volume is prefix rows + candidate-matched shingle rows."""
    from ..util import bucket_agg, heal_schema

    import ray as _ray

    if not (0 < threshold_num <= threshold_den):
        raise ValueError(
            f"threshold must satisfy 0 < num <= den, got "
            f"{threshold_num}/{threshold_den}"
        )

    from ..util import join_partitions

    np_ = join_partitions(num_partitions)
    mask = (1 << 61) - 1

    def doc_rows(df: pd.DataFrame) -> pd.DataFrame:
        out_id: list[int] = []
        out_h: list[int] = []
        out_n: list[int] = []
        out_p: list[bool] = []
        for i, t in zip(df[id_col].astype("int64"), df[text_col].fillna("")):
            hs = sorted(
                {_md5_u64_cached(s) & mask for s in shingle_set(t, shingle_k)}
            )
            n = len(hs)
            if not n:
                continue
            p = n - ((threshold_num * n + threshold_den - 1) // threshold_den) + 1
            out_id.extend([int(i)] * n)
            out_h.extend(hs)
            out_n.extend([n] * n)
            out_p.extend([True] * p + [False] * (n - p))
        return pd.DataFrame(
            {
                "doc_id": pd.Series(out_id, dtype="int64"),
                "h": pd.Series(out_h, dtype="int64"),
                "n": pd.Series(out_n, dtype="int64"),
                "pref": pd.Series(out_p, dtype="bool"),
            }
        )

    shingles = ds.map_batches(doc_rows, batch_format="pandas").materialize()

    def prefix_pairs(df: pd.DataFrame) -> pd.DataFrame:
        return _grouped_pairs(df, "h", max_bucket)

    cands = _dedup_pairs(
        bucket_agg(
            shingles.map_batches(
                lambda df: df[df["pref"]][["doc_id", "h"]],
                batch_format="pandas",
            ),
            ["h"],
            prefix_pairs,
        )
    ).materialize()
    if cands.count() == 0:
        import pyarrow as pa

        return ray.data.from_arrow(
            pa.schema([("doc_id_a", pa.int64()), ("doc_id_b", pa.int64())])
            .empty_table()
        )

    def _ren(d, m):
        return d.map_batches(
            lambda df, mm=m: df.rename(columns=mm), batch_format="pandas"
        )

    sh_a = heal_schema(
        _ren(shingles, {"doc_id": "doc_id_a", "n": "n_a"}).map_batches(
            lambda df: df[["doc_id_a", "h", "n_a"]], batch_format="pandas"
        ),
        np_,
    )
    sh_b = heal_schema(
        _ren(shingles, {"doc_id": "doc_id_b", "n": "n_b"}).map_batches(
            lambda df: df[["doc_id_b", "h", "n_b"]], batch_format="pandas"
        ),
        np_,
    )
    with_a = heal_schema(cands, np_).join(sh_a, "inner", np_, on=("doc_id_a",))
    shared = heal_schema(with_a, np_).join(
        sh_b, "inner", np_, on=("doc_id_b", "h")
    )

    def verdict(df: pd.DataFrame) -> pd.DataFrame:
        g = df.groupby(["doc_id_a", "doc_id_b"], sort=False).agg(
            i=("h", "size"), n_a=("n_a", "first"), n_b=("n_b", "first")
        ).reset_index()
        union = g["n_a"] + g["n_b"] - g["i"]
        keep = g[g["i"] * threshold_den >= union * threshold_num]
        return keep[["doc_id_a", "doc_id_b"]].astype("int64").reset_index(
            drop=True
        )

    return bucket_agg(shared, ["doc_id_a", "doc_id_b"], verdict)


def containment_pairs(
    ds: "ray.data.Dataset",
    *,
    threshold_num: int = 8,
    threshold_den: int = 10,
    shingle_k: int = 3,
    text_col: str = "text",
    id_col: str = "doc_id",
    max_bucket: int = 100_000,
    num_partitions: int | None = None,
) -> "ray.data.Dataset":
    """Exact global DIRECTED set-containment join: every ordered pair
    (a, b), a ≠ b, with |shingles(a) ∩ shingles(b)| ≥ (num/den)·|a| —
    the sub-document-duplication detector (a quote, boilerplate block
    or near-verbatim excerpt of b scores high even when Jaccard is low
    because |b| ≫ |a|).  Containment-style prefix filter: if
    |A∩B| ≥ t·|A| then A's prefix of length |A| − ⌈t·|A|⌉ + 1 shares a
    token with B (pigeonhole on the A side only, so candidates join
    A-prefix rows against ALL of B's rows — no symmetric prefix
    reduction exists for containment).  Verify is the ppjoin_pairs
    distributed-intersection plan; scores are integer ppm
    (i · 10^6 // |A|), bit-exact vs SQL."""
    from ..util import bucket_agg, heal_schema, join_partitions

    if not (0 < threshold_num <= threshold_den):
        raise ValueError(
            f"threshold must satisfy 0 < num <= den, got "
            f"{threshold_num}/{threshold_den}"
        )
    np_ = join_partitions(num_partitions)
    mask = (1 << 61) - 1

    def doc_rows(df: pd.DataFrame) -> pd.DataFrame:
        out_id: list[int] = []
        out_h: list[int] = []
        out_n: list[int] = []
        out_p: list[bool] = []
        for i, t in zip(df[id_col].astype("int64"), df[text_col].fillna("")):
            hs = sorted(
                {_md5_u64_cached(s) & mask for s in shingle_set(t, shingle_k)}
            )
            n = len(hs)
            if not n:
                continue
            p = n - ((threshold_num * n + threshold_den - 1) // threshold_den) + 1
            out_id.extend([int(i)] * n)
            out_h.extend(hs)
            out_n.extend([n] * n)
            out_p.extend([True] * p + [False] * (n - p))
        return pd.DataFrame(
            {
                "doc_id": pd.Series(out_id, dtype="int64"),
                "h": pd.Series(out_h, dtype="int64"),
                "n": pd.Series(out_n, dtype="int64"),
                "pref": pd.Series(out_p, dtype="bool"),
            }
        )

    shingles = ds.map_batches(doc_rows, batch_format="pandas").materialize()

    def directed_pairs(df: pd.DataFrame, cap=max_bucket) -> pd.DataFrame:
        d = df[["h", "doc_id", "pref"]].drop_duplicates(
            ["h", "doc_id", "pref"]
        ).sort_values(["h", "doc_id"])
        keys = d["h"].to_numpy()
        ids = d["doc_id"].to_numpy()
        pref = d["pref"].to_numpy()
        bounds = _segment_bounds(keys)
        outs_a, outs_b = [], []
        for s, e in zip(bounds[:-1], bounds[1:]):
            if e - s > cap:
                raise RuntimeError(
                    f"containment bucket cap exceeded: {e - s} > {cap}"
                )
            seg_ids = ids[s:e]
            # one row per (doc, h), so the a-side is simply the pref rows
            a_ids = seg_ids[pref[s:e]]
            if not len(a_ids) or len(seg_ids) < 2:
                continue
            if len(a_ids) * (e - s) > cap:
                raise RuntimeError(
                    "containment candidate cap exceeded: "
                    f"{len(a_ids)}×{e - s} > {cap} for one shingle"
                )
            ia, ib = np.meshgrid(a_ids, np.unique(seg_ids), indexing="ij")
            ia, ib = ia.ravel(), ib.ravel()
            keep = ia != ib
            outs_a.append(ia[keep])
            outs_b.append(ib[keep])
        if not outs_a:
            return pd.DataFrame(
                {"doc_id_a": [], "doc_id_b": []}
            ).astype("int64")
        return pd.DataFrame(
            {
                "doc_id_a": np.concatenate(outs_a),
                "doc_id_b": np.concatenate(outs_b),
            }
        ).astype("int64")

    cands = _dedup_pairs(
        bucket_agg(
            shingles.map_batches(
                lambda df: df[["doc_id", "h", "pref"]], batch_format="pandas"
            ),
            ["h"],
            directed_pairs,
        )
    ).materialize()
    import pyarrow as pa

    empty = pa.schema(
        [
            ("doc_id_a", pa.int64()),
            ("doc_id_b", pa.int64()),
            ("containment_ppm", pa.int64()),
        ]
    ).empty_table()
    if cands.count() == 0:
        return ray.data.from_arrow(empty)

    def _ren(d, m):
        return d.map_batches(
            lambda df, mm=m: df.rename(columns=mm), batch_format="pandas"
        )

    sh_a = heal_schema(
        _ren(shingles, {"doc_id": "doc_id_a", "n": "n_a"}).map_batches(
            lambda df: df[["doc_id_a", "h", "n_a"]], batch_format="pandas"
        ),
        np_,
    )
    sh_b = heal_schema(
        _ren(shingles, {"doc_id": "doc_id_b"}).map_batches(
            lambda df: df[["doc_id_b", "h"]], batch_format="pandas"
        ),
        np_,
    )
    with_a = heal_schema(cands, np_).join(sh_a, "inner", np_, on=("doc_id_a",))
    shared = heal_schema(with_a, np_).join(
        sh_b, "inner", np_, on=("doc_id_b", "h")
    )

    def verdict(df: pd.DataFrame) -> pd.DataFrame:
        g = df.groupby(["doc_id_a", "doc_id_b"], sort=False).agg(
            i=("h", "size"), n_a=("n_a", "first")
        ).reset_index()
        keep = g[g["i"] * threshold_den >= g["n_a"] * threshold_num].copy()
        keep["containment_ppm"] = (
            keep["i"].to_numpy(dtype=np.int64) * 1_000_000
            // keep["n_a"].to_numpy(dtype=np.int64)
        )
        return keep[
            ["doc_id_a", "doc_id_b", "containment_ppm"]
        ].astype("int64").reset_index(drop=True)

    out = bucket_agg(shared, ["doc_id_a", "doc_id_b"], verdict).materialize()
    if out.count() == 0:
        return ray.data.from_arrow(empty)
    return out
