"""Similarity search over an embedding column (list<float>).

* ``knn_topk``          — brute-force cosine top-k: the (small) query
  matrix is broadcast once via ``ray.put``; every data block computes a
  block × query matmul and emits only its local top-k candidates, which a
  final tiny driver-side merge reduces — the classic combiner pattern, so
  the full similarity matrix never materializes anywhere.
* ``cosine_threshold_pairs`` — all pairs with cosine ≥ τ against a
  broadcast reference matrix (for near-dup detection the reference side is
  the dataset itself; the broadcast is one ray.put, read zero-copy by
  every task, never re-shipped per batch).
* ``lsh_hyperplane_buckets`` — the 100 TB path: signed random projections
  (seeded, deterministic) bucket vectors so candidate generation is a
  groupby on the bucket key instead of an all-pairs matmul.

``cosine_threshold_pairs`` has two exact modes: the broadcast regime
(reference matrix fits a worker heap) and ``mode="block"`` — a
block-nested-loop theta-join (rows replicated to ``blocks`` partner
groups, each group an independent two-block matmul) that is exact,
driver-materialization-free, and shuffles ``blocks×`` the vector table;
``mode="auto"`` switches on a row-count guard.  The approximate scale
path stays ``lsh_hyperplane_buckets`` / ``lsh_cosine_pairs``.
"""

from __future__ import annotations

import numpy as np
import pandas as pd

import ray
import ray.data

from ..util import auto_concurrency


def _normalize(mat: np.ndarray) -> np.ndarray:
    norms = np.linalg.norm(mat, axis=1, keepdims=True)
    norms[norms == 0] = 1.0
    return mat / norms


def _emb_matrix(df: pd.DataFrame, col: str) -> np.ndarray:
    if not len(df):
        return np.zeros((0, 0), dtype=np.float64)  # keep 2-D for _normalize
    return np.array(df[col].tolist(), dtype=np.float64)


def _block_topk_frame(
    sims: np.ndarray, ids: np.ndarray, qids, k: int
) -> pd.DataFrame:
    """Per-query top-(k+1) over a (n_query, n_block) sims matrix, fully
    vectorized — no Python loop over queries (the old per-row lexsort
    was the block stage's hot loop at ≥10³ queries).

    Exactness under ties: per row, ``np.partition`` finds the (k+1)-th
    largest cosine, the mask ``sims >= v`` keeps a SUPERSET including
    every boundary tie, and one global ``lexsort`` by (query, -cos,
    neighbor_id) ranks the survivors — so exact cosine ties keep the
    lowest id even when the tie spans the cut, matching the driver
    merge's deterministic tie-break and the SQL oracle's ``ORDER BY sim
    DESC, vec_id``.  Self-matches are dropped AFTER the k+1 cut
    (unchanged semantics: the query's own row may consume one slot; the
    driver merge trims to k)."""
    n = sims.shape[1]
    k1 = min(k + 1, n)                       # +1: self may be in block
    v = np.partition(sims, n - k1, axis=1)[:, n - k1]
    qidx, cidx = np.nonzero(sims >= v[:, None])
    vals = sims[qidx, cidx]
    nids = ids[cidx]
    order = np.lexsort((nids, -vals, qidx))
    qidx, vals, nids = qidx[order], vals[order], nids[order]
    # rank within each query group (qidx ascending after the lexsort)
    pos = np.arange(len(qidx))
    is_new = np.r_[True, qidx[1:] != qidx[:-1]] if len(qidx) else np.array([], bool)
    grp_start = np.maximum.accumulate(np.where(is_new, pos, 0))
    keep = (pos - grp_start) < k1
    qid_arr = np.asarray(qids)[qidx]
    keep &= nids != qid_arr                  # drop self AFTER the cut
    return pd.DataFrame(
        {"query_id": qid_arr[keep], "neighbor_id": nids[keep], "cos": vals[keep]}
    )


class _BlockTopK:
    """Actor stage: block rows × broadcast query matrix → local top-k."""

    def __init__(self, query_ref, k: int):
        q = ray.get(query_ref) if isinstance(query_ref, ray.ObjectRef) else query_ref
        self.qids = q["ids"]
        self.qmat = q["mat"]          # already L2-normalized
        self.k = k

    def __call__(self, df: pd.DataFrame) -> pd.DataFrame:
        if not len(df):
            return pd.DataFrame({"query_id": [], "neighbor_id": [], "cos": []})
        mat = _normalize(_emb_matrix(df, "embedding"))
        ids = df["vec_id"].to_numpy()
        sims = self.qmat @ mat.T                     # (n_query, n_block)
        return _block_topk_frame(sims, ids, self.qids, self.k)


def knn_topk(
    ds: "ray.data.Dataset",
    query_ids: list[int],
    *,
    k: int = 5,
    emb_col: str = "embedding",
    id_col: str = "vec_id",
) -> pd.DataFrame:
    """Exact cosine top-k for ``query_ids`` (must be rows of ``ds``).

    Returns (query_id, neighbor_id, rank) with rank 1..k, ties broken by
    neighbor_id — deterministic across parallelism levels."""
    qrows = ds.filter(expr=f"{id_col} in {sorted(set(query_ids))}").take_all()
    order = {v: i for i, v in enumerate(query_ids)}
    qrows.sort(key=lambda r: order[r[id_col]])
    qmat = _normalize(np.array([r[emb_col] for r in qrows], dtype=np.float64))
    qref = ray.put({"ids": [r[id_col] for r in qrows], "mat": qmat})

    cands = ds.map_batches(
        _BlockTopK,
        fn_constructor_kwargs={"query_ref": qref, "k": k},
        batch_format="pandas",
        concurrency=auto_concurrency(None),
    ).to_pandas()

    cands = cands.sort_values(
        ["query_id", "cos", "neighbor_id"], ascending=[True, False, True]
    )
    top = cands.groupby("query_id", sort=True).head(k).reset_index(drop=True)
    top["rank"] = top.groupby("query_id").cumcount() + 1
    return top[["query_id", "neighbor_id", "rank"]].astype("int64")


def _quantize_int8(mat: np.ndarray) -> np.ndarray:
    """Per-vector symmetric int8 scalar quantization: q = ⌊x·127/s⌋
    with s = max|x| over the vector (zero vectors quantize to zeros).
    Floor (not round) so an integer SQL twin could reproduce the codes;
    determinism across parallelism is exact because each vector's codes
    depend only on itself."""
    s = np.abs(mat).max(axis=1, keepdims=True)
    s[s == 0] = 1.0
    return np.floor(mat * 127.0 / s)


class _BlockTopKInt8:
    """Actor stage: int8-quantized block rows × broadcast quantized
    query matrix → local top-k by quantized cosine (integer dot over
    float norms of the CODES — the scalar-quantization ANN ranking)."""

    def __init__(self, query_ref, k: int):
        q = ray.get(query_ref) if isinstance(query_ref, ray.ObjectRef) else query_ref
        self.qids = q["ids"]
        self.qmat = q["mat"]          # quantized codes, L2-normalized
        self.k = k

    def __call__(self, df: pd.DataFrame) -> pd.DataFrame:
        if not len(df):
            return pd.DataFrame({"query_id": [], "neighbor_id": [], "cos": []})
        mat = _normalize(_quantize_int8(_emb_matrix(df, "embedding")))
        ids = df["vec_id"].to_numpy()
        sims = self.qmat @ mat.T
        return _block_topk_frame(sims, ids, self.qids, self.k)


def int8_topk(
    ds: "ray.data.Dataset",
    query_ids: list[int],
    *,
    k: int = 5,
    emb_col: str = "embedding",
    id_col: str = "vec_id",
) -> pd.DataFrame:
    """Scalar-quantized (int8) brute-force top-k — the 4×-compression
    ANN baseline: every vector is per-vector symmetrically quantized to
    int8 codes and ranked by the codes' cosine.  Same broadcast + block
    top-k plan as :func:`knn_topk`; returns (query_id, neighbor_id,
    rank) with the identical deterministic tie-break."""
    qrows = ds.filter(expr=f"{id_col} in {sorted(set(query_ids))}").take_all()
    order = {v: i for i, v in enumerate(query_ids)}
    qrows.sort(key=lambda r: order[r[id_col]])
    qmat = _normalize(
        _quantize_int8(np.array([r[emb_col] for r in qrows], dtype=np.float64))
    )
    qref = ray.put({"ids": [r[id_col] for r in qrows], "mat": qmat})

    cands = ds.map_batches(
        _BlockTopKInt8,
        fn_constructor_kwargs={"query_ref": qref, "k": k},
        batch_format="pandas",
        concurrency=auto_concurrency(None),
    ).to_pandas()

    cands = cands.sort_values(
        ["query_id", "cos", "neighbor_id"], ascending=[True, False, True]
    )
    top = cands.groupby("query_id", sort=True).head(k).reset_index(drop=True)
    top["rank"] = top.groupby("query_id").cumcount() + 1
    return top[["query_id", "neighbor_id", "rank"]].astype("int64")


class _ThresholdPairs:
    def __init__(self, ref, threshold: float):
        r = ray.get(ref) if isinstance(ref, ray.ObjectRef) else ref
        self.rids = np.asarray(r["ids"])
        self.rmat = r["mat"]
        self.threshold = threshold

    def __call__(self, df: pd.DataFrame) -> pd.DataFrame:
        if not len(df):
            return pd.DataFrame({"vec_id_a": [], "vec_id_b": []}).astype("int64")
        mat = _normalize(_emb_matrix(df, "embedding"))
        ids = df["vec_id"].to_numpy()
        sims = mat @ self.rmat.T                     # (n_block, n_ref)
        bi, rj = np.nonzero(sims >= self.threshold)
        a = ids[bi]
        b = self.rids[rj]
        keep = a < b                                  # each unordered pair once
        return pd.DataFrame(
            {"vec_id_a": a[keep].astype("int64"), "vec_id_b": b[keep].astype("int64")}
        )


def cosine_threshold_pairs(
    ds: "ray.data.Dataset",
    *,
    threshold: float = 0.35,
    emb_col: str = "embedding",
    id_col: str = "vec_id",
    mode: str = "auto",
    max_broadcast_rows: int = 200_000,
    blocks: int = 8,
) -> "ray.data.Dataset":
    """All unordered pairs with cosine ≥ threshold (embedding near-dup).
    Exact in every mode; both modes produce identical pairs.

    mode="broadcast" — the dataset itself is the reference matrix,
    ``ray.put`` once, each block matmuls against it.  Valid while
    n_vectors × dim fits a worker heap (the small-side regime).
    mode="block" — block-nested-loop: rows are hash-assigned to
    ``blocks`` groups, replicated to every partner group, and each of the
    blocks·(blocks+1)/2 group tasks matmuls its two sides — no driver
    materialization, no broadcast, shuffle volume = blocks × table.
    mode="auto" — one ``count()`` guard picks broadcast below
    ``max_broadcast_rows``, block above.  (The *approximate* scale path —
    sub-quadratic — is ``lsh_cosine_pairs``.)"""
    if mode == "auto":
        mode = "broadcast" if ds.count() <= max_broadcast_rows else "block"
    if mode == "block":
        return _block_threshold_pairs(
            ds, threshold=threshold, emb_col=emb_col, id_col=id_col, blocks=blocks
        )
    rows = (
        ds.select_columns([id_col, emb_col])
        .to_pandas()  # not take_all: ~0.5 ms/row
    )
    if not len(rows):  # column-less empty frame — no pairs to emit
        import pyarrow as pa

        return ray.data.from_arrow(
            pa.schema([("vec_id_a", pa.int64()), ("vec_id_b", pa.int64())])
            .empty_table()
        )
    rows = rows.sort_values(id_col, ignore_index=True)
    rmat = _normalize(np.stack(rows[emb_col].to_numpy()).astype(np.float64))
    ref = ray.put({"ids": rows[id_col].tolist(), "mat": rmat})
    return ds.map_batches(
        _ThresholdPairs,
        fn_constructor_kwargs={"ref": ref, "threshold": threshold},
        batch_format="pandas",
        concurrency=auto_concurrency(None),
    )


def _block_threshold_pairs(
    ds: "ray.data.Dataset",
    *,
    threshold: float,
    emb_col: str,
    id_col: str,
    blocks: int,
) -> "ray.data.Dataset":
    """Exact all-pairs ≥ threshold as a block-nested-loop theta-join: each
    vector goes to every (min(b,p), max(b,p)) group once; a group holds
    two hash-blocks and emits its cross (or triangular) matches.  Group
    count = blocks·(blocks+1)/2 coarse tasks; per-task memory is two
    blocks, not the corpus."""

    def replicate(df: pd.DataFrame) -> pd.DataFrame:
        if not len(df):
            return pd.DataFrame(
                {"_gk": pd.array([], dtype="int64"),
                 "_bid": pd.array([], dtype="int64"),
                 id_col: pd.array([], dtype="int64"),
                 emb_col: []}
            )
        ids = df[id_col].to_numpy(np.int64)
        bid = ids % blocks
        parts = []
        for p in range(blocks):
            lo = np.minimum(bid, p)
            hi = np.maximum(bid, p)
            parts.append(
                pd.DataFrame(
                    {
                        "_gk": lo * blocks + hi,
                        "_bid": bid,
                        id_col: ids,
                        emb_col: df[emb_col].to_numpy(),
                    }
                )
            )
        out = pd.concat(parts, ignore_index=True)
        # a row whose own block is p appears once in group (p,p)
        return out.drop_duplicates(["_gk", id_col])

    def group_pairs(grp: pd.DataFrame) -> pd.DataFrame:
        gk = int(grp["_gk"].iloc[0])
        lo, hi = gk // blocks, gk % blocks
        mat = _normalize(_emb_matrix(grp, emb_col))
        ids = grp[id_col].to_numpy(np.int64)
        side = grp["_bid"].to_numpy(np.int64)
        if lo == hi:
            sims = mat @ mat.T
            ai, bj = np.nonzero(sims >= threshold)
            a, b = ids[ai], ids[bj]
            keep = a < b                       # both orders present: keep one
            a, b = a[keep], b[keep]
        else:
            li, hj = side == lo, side == hi
            sims = mat[li] @ mat[hj].T
            ai, bj = np.nonzero(sims >= threshold)
            a, b = ids[li][ai], ids[hj][bj]    # each cross pair appears once
            a, b = np.minimum(a, b), np.maximum(a, b)
        return pd.DataFrame({"vec_id_a": a, "vec_id_b": b}).astype("int64")

    return (
        ds.map_batches(replicate, batch_format="pandas")
        .groupby("_gk")
        .map_groups(group_pairs, batch_format="pandas")
    )


class IVFIndex:
    """Inverted-file ANN: seeded spherical k-means centroids (built once on
    a driver-side sample — the stateful 'train' step), cluster assignment
    as a map_batches matmul, search probes the ``nprobe`` nearest lists.

    The scale path for similarity search when the corpus no longer fits a
    broadcast matrix: assignment streams, each query touches only
    nprobe/nlist of the data, and the per-list search is an exact matmul
    within the probed partitions."""

    def __init__(self, nlist: int = 16, nprobe: int = 4, iters: int = 10, seed: int = 42):
        self.nlist = nlist
        self.nprobe = nprobe
        self.iters = iters
        self.seed = seed
        self.centroids = None

    def train(self, sample: np.ndarray) -> "IVFIndex":
        x = _normalize(np.asarray(sample, dtype=np.float64))
        rng = np.random.RandomState(self.seed)
        k = min(self.nlist, len(x))
        c = x[rng.choice(len(x), size=k, replace=False)]
        for _ in range(self.iters):
            assign = np.argmax(x @ c.T, axis=1)
            for j in range(k):
                m = assign == j
                if m.any():
                    v = x[m].mean(axis=0)
                    n = np.linalg.norm(v)
                    if n > 0:
                        c[j] = v / n
        self.centroids = c
        return self

    def assign(self, ds: "ray.data.Dataset", *, emb_col: str = "embedding") -> "ray.data.Dataset":
        cref = ray.put(self.centroids)

        def f(df: pd.DataFrame) -> pd.DataFrame:
            if not len(df):
                out = df.copy()
                out["ivf_list"] = pd.array([], dtype="int64")
                return out
            c = ray.get(cref)
            mat = _normalize(_emb_matrix(df, emb_col))
            out = df.copy()
            out["ivf_list"] = np.argmax(mat @ c.T, axis=1).astype("int64")
            return out

        return ds.map_batches(f, batch_format="pandas")

    def search(
        self,
        assigned: "ray.data.Dataset",
        queries: np.ndarray,
        query_ids: list[int],
        *,
        k: int = 5,
        emb_col: str = "embedding",
        id_col: str = "vec_id",
    ) -> pd.DataFrame:
        q = _normalize(np.asarray(queries, dtype=np.float64))
        probe = np.argsort(-(q @ self.centroids.T), axis=1)[:, : self.nprobe]
        lists_needed = sorted(set(probe.flatten().tolist()))
        qref = ray.put({"q": q, "ids": np.asarray(query_ids), "probe": probe})

        def f(df: pd.DataFrame) -> pd.DataFrame:
            if not len(df):
                return pd.DataFrame(columns=["query_id", "neighbor_id", "cos"])
            s = ray.get(qref)
            mat = _normalize(_emb_matrix(df, emb_col))
            ids = df[id_col].to_numpy()
            lists = df["ivf_list"].to_numpy()
            sims = s["q"] @ mat.T
            frames = []
            for qi in range(len(s["ids"])):
                j = np.nonzero(
                    np.isin(lists, s["probe"][qi]) & (ids != s["ids"][qi])
                )[0]
                if not len(j):
                    continue
                # block-local top-k in the exact global (-cos, neighbor_id)
                # order, so truncation here cannot change the driver merge
                # and the driver holds ≤ blocks × queries × k rows
                jj = j[np.lexsort((ids[j], -sims[qi, j]))[:k]]
                frames.append(pd.DataFrame({
                    "query_id": s["ids"][qi],
                    "neighbor_id": ids[jj],
                    "cos": sims[qi, jj],
                }))
            if not frames:
                return pd.DataFrame(columns=["query_id", "neighbor_id", "cos"])
            return pd.concat(frames, ignore_index=True)

        cands = assigned.filter(
            expr=f"ivf_list in {lists_needed}"
        ).map_batches(f, batch_format="pandas").to_pandas()
        cands = cands.sort_values(
            ["query_id", "cos", "neighbor_id"], ascending=[True, False, True]
        )
        top = cands.groupby("query_id", sort=True).head(k).reset_index(drop=True)
        top["rank"] = top.groupby("query_id").cumcount() + 1
        return top[["query_id", "neighbor_id", "rank"]].astype("int64")


def ivf_topk(
    ds: "ray.data.Dataset",
    query_ids: list[int],
    *,
    k: int = 5,
    nlist: int = 16,
    nprobe: int = 4,
    train_sample: int = 4096,
    emb_col: str = "embedding",
    id_col: str = "vec_id",
) -> pd.DataFrame:
    """Approximate top-k via IVF (recall < 1 when a true neighbor lives in
    an unprobed list; raise nprobe to trade cost for recall)."""
    sdf = ds.limit(train_sample).to_pandas()
    if not len(sdf):
        raise ValueError("ivf_topk needs a non-empty embedding dataset")
    sample = np.stack(sdf[emb_col].to_numpy()).astype(np.float64)
    index = IVFIndex(nlist=nlist, nprobe=nprobe).train(sample)
    assigned = index.assign(ds, emb_col=emb_col).materialize()
    qrows = ds.filter(expr=f"{id_col} in {sorted(set(query_ids))}").take_all()
    order = {v: i for i, v in enumerate(query_ids)}
    qrows.sort(key=lambda r: order[r[id_col]])
    qmat = np.array([r[emb_col] for r in qrows], dtype=np.float64)
    return index.search(
        assigned, qmat, [r[id_col] for r in qrows], k=k, emb_col=emb_col, id_col=id_col
    )


def hyperplane_params(dim: int, n_planes: int = 16, seed: int = 42) -> np.ndarray:
    """The seeded projection planes, exposed so the DuckDB oracle can bake
    the identical float64 literals into its SQL (repr round-trips)."""
    rng = np.random.RandomState(seed)
    return rng.standard_normal((n_planes, dim))


class _HyperplaneHasher:
    """Actor stage: seeded signed-random-projection bucket per vector."""

    def __init__(self, dim: int, n_planes: int = 16, seed: int = 42):
        self.planes = hyperplane_params(dim, n_planes, seed)
        self.weights = (1 << np.arange(n_planes)).astype(np.int64)

    def __call__(self, df: pd.DataFrame) -> pd.DataFrame:
        if not len(df):
            return pd.DataFrame(
                {"vec_id": pd.array([], dtype="int64"),
                 "bucket": pd.array([], dtype="int64")}
            )
        mat = _emb_matrix(df, "embedding")
        signs = (mat @ self.planes.T) > 0
        return pd.DataFrame(
            {
                "vec_id": df["vec_id"].astype("int64"),
                "bucket": (signs @ self.weights).astype("int64"),
            }
        )


def lsh_hyperplane_buckets(
    ds: "ray.data.Dataset", *, dim: int, n_planes: int = 16, seed: int = 42
) -> "ray.data.Dataset":
    return ds.map_batches(
        _HyperplaneHasher,
        fn_constructor_kwargs={"dim": dim, "n_planes": n_planes, "seed": seed},
        batch_format="pandas",
        concurrency=auto_concurrency(None),
    )


def lsh_cosine_pairs(
    ds: "ray.data.Dataset",
    *,
    dim: int,
    threshold: float = 0.35,
    n_planes: int = 8,
    seed: int = 42,
    max_bucket: int = 100_000,
    n_tables: int = 1,
) -> "ray.data.Dataset":
    """Scale path: bucket by hyperplane signature, verify exact cosine only
    within buckets.  Recall < 1 by construction for one table (a candidate
    is missed when any plane separates a near pair); ``n_tables``
    independent plane sets (seeds seed..seed+T−1) union their candidates,
    recall ≈ 1−(1−(1−θ/π)^b)^T — the classic multi-table trade of compute
    for recall.  Emitted pairs are exact-verified and deduped across
    tables.  A bucket larger than ``max_bucket`` (skewed: near-identical
    vectors or too few planes for the corpus) raises instead of silently
    going quadratic — re-run with more planes."""
    hashers = [hyperplane_params(dim, n_planes, seed + t) for t in range(n_tables)]
    weights = (1 << np.arange(n_planes)).astype(np.int64)
    planes_ref = ray.put(hashers)

    def fan_out(df: pd.DataFrame) -> pd.DataFrame:
        if not len(df):
            out = df.copy()
            out["bucket"] = pd.array([], dtype="int64")
            return out
        ps = ray.get(planes_ref)
        mat = _emb_matrix(df, "embedding")
        parts = []
        for t, planes in enumerate(ps):
            out = df.copy()
            signs = (mat @ planes.T) > 0
            out["bucket"] = ((signs @ weights) + (t << n_planes)).astype(np.int64)
            parts.append(out)
        return pd.concat(parts, ignore_index=True)

    with_bucket = ds.map_batches(fan_out, batch_format="pandas")

    def pairs(grp: pd.DataFrame) -> pd.DataFrame:
        if len(grp) > max_bucket:
            raise RuntimeError(
                f"LSH cosine bucket cap exceeded: {len(grp)} > {max_bucket}; "
                "increase n_planes"
            )
        mat = _normalize(_emb_matrix(grp, "embedding"))
        ids = grp["vec_id"].to_numpy()
        sims = mat @ mat.T
        ai, bj = np.nonzero(sims >= threshold)
        keep = ids[ai] < ids[bj]
        return pd.DataFrame(
            {
                "vec_id_a": ids[ai][keep].astype("int64"),
                "vec_id_b": ids[bj][keep].astype("int64"),
            }
        )

    from ..util import bucket_agg

    def coarse_pairs(df: pd.DataFrame) -> pd.DataFrame:
        # bucket ids are signature-scale (up to n_tables·2^n_planes
        # distinct) — Ray's Aggregate pays per distinct key, so group on
        # a 64-way coarse hash and loop buckets vectorized inside
        out = [pairs(g) for _, g in df.groupby("bucket", sort=False)]
        if not out:
            return pd.DataFrame(
                {
                    "vec_id_a": pd.Series(dtype="int64"),
                    "vec_id_b": pd.Series(dtype="int64"),
                }
            )
        return pd.concat(out, ignore_index=True)

    found = bucket_agg(with_bucket, ["bucket"], coarse_pairs)
    if n_tables == 1:
        return found
    from .dedup import _dedup_pairs

    return _dedup_pairs(found, id_cols=("vec_id_a", "vec_id_b"))


class PQIndex:
    """Product quantization ANN (Jégou et al. 2011, "Product
    Quantization for Nearest Neighbor Search"): the vector splits into
    ``m`` subspaces, each k-means-quantized to ``k`` centroids on a
    bounded driver-side sample, and every corpus vector is encoded as
    ``m`` small codes — m bytes instead of 4·dim, the compression that
    keeps a 100 TB embedding corpus scannable.

    Search is asymmetric distance computation (ADC): per query, ONE
    (m × k) lookup table of subspace dot products; scoring a corpus
    block is a pure integer gather + row sum over the code matrix — no
    float matmul over corpus vectors.  ``search`` then exact-reranks
    each block's ADC shortlist (the standard IVFADC+R production
    pattern), so the returned top-k is exact over the union of block
    shortlists and recall degrades only when a true neighbor falls
    outside a whole block's shortlist."""

    def __init__(self, m: int = 8, k: int = 16, iters: int = 10, seed: int = 42):
        self.m = m
        self.k = k
        self.iters = iters
        self.seed = seed
        self.codebooks = None  # (m, k, dim/m)

    def train(self, sample: np.ndarray) -> "PQIndex":
        x = _normalize(np.asarray(sample, dtype=np.float64))
        dim = x.shape[1]
        if dim % self.m:
            raise ValueError(f"dim {dim} not divisible by m={self.m}")
        dsub = dim // self.m
        rng = np.random.RandomState(self.seed)
        books = np.empty((self.m, self.k, dsub))
        for mi in range(self.m):
            sub = x[:, mi * dsub : (mi + 1) * dsub]
            kk = min(self.k, len(sub))
            c = sub[rng.choice(len(sub), size=kk, replace=False)]
            for _ in range(self.iters):
                # L2 assignment via the expanded form (‖c‖² − 2·x·c)
                d = (c * c).sum(axis=1)[None, :] - 2.0 * (sub @ c.T)
                assign = np.argmin(d, axis=1)
                for j in range(kk):
                    sel = assign == j
                    if sel.any():
                        c[j] = sub[sel].mean(axis=0)
            if kk < self.k:  # degenerate tiny sample: pad by repetition
                c = np.concatenate([c, np.repeat(c[:1], self.k - kk, axis=0)])
            books[mi] = c
        self.codebooks = books
        return self

    def encode(
        self, ds: "ray.data.Dataset", *, emb_col: str = "embedding"
    ) -> "ray.data.Dataset":
        """Adds int64 columns pq0..pq{m-1} (argmin-L2 subspace codes);
        keeps the embedding column for the rerank step."""
        bref = ray.put(self.codebooks)
        m = self.m

        def f(df: pd.DataFrame) -> pd.DataFrame:
            out = df.copy()
            if not len(df):
                for mi in range(m):
                    out[f"pq{mi}"] = pd.array([], dtype="int64")
                return out
            books = ray.get(bref)
            mat = _normalize(_emb_matrix(df, emb_col))
            dsub = mat.shape[1] // m
            for mi in range(m):
                sub = mat[:, mi * dsub : (mi + 1) * dsub]
                c = books[mi]
                d = (c * c).sum(axis=1)[None, :] - 2.0 * (sub @ c.T)
                out[f"pq{mi}"] = np.argmin(d, axis=1).astype("int64")
            return out

        return ds.map_batches(f, batch_format="pandas")

    def search(
        self,
        encoded: "ray.data.Dataset",
        queries: np.ndarray,
        query_ids: list[int],
        *,
        k: int = 5,
        shortlist: int = 64,
        emb_col: str = "embedding",
        id_col: str = "vec_id",
    ) -> pd.DataFrame:
        q = _normalize(np.asarray(queries, dtype=np.float64))
        m = self.m
        dsub = q.shape[1] // m
        # per-query (m, k) dot-product LUTs — the whole query-side state
        luts = np.stack(
            [
                np.stack(
                    [
                        q[qi, mi * dsub : (mi + 1) * dsub] @ self.codebooks[mi].T
                        for mi in range(m)
                    ]
                )
                for qi in range(len(q))
            ]
        )
        qref = ray.put(
            {"luts": luts, "ids": np.asarray(query_ids), "q": q}
        )

        def f(df: pd.DataFrame) -> pd.DataFrame:
            cols = ["query_id", "neighbor_id", "cos"]
            if not len(df):
                return pd.DataFrame(columns=cols)
            s = ray.get(qref)
            codes = np.stack(
                [df[f"pq{mi}"].to_numpy(np.int64) for mi in range(m)], axis=1
            )
            ids = df[id_col].to_numpy()
            mat = None  # decoded lazily, only for shortlist rows
            frames = []
            for qi in range(len(s["ids"])):
                lut = s["luts"][qi]  # (m, k)
                adc = lut[np.arange(m)[:, None], codes.T].sum(axis=0)
                j = np.nonzero(ids != s["ids"][qi])[0]
                if not len(j):
                    continue
                jj = j[np.lexsort((ids[j], -adc[j]))[:shortlist]]
                if mat is None:
                    mat = _normalize(_emb_matrix(df, emb_col))
                cos = mat[jj] @ s["q"][qi]
                top = np.lexsort((ids[jj], -cos))[:k]
                frames.append(
                    pd.DataFrame(
                        {
                            "query_id": s["ids"][qi],
                            "neighbor_id": ids[jj][top],
                            "cos": cos[top],
                        }
                    )
                )
            if not frames:
                return pd.DataFrame(columns=cols)
            return pd.concat(frames, ignore_index=True)

        cands = encoded.map_batches(f, batch_format="pandas").to_pandas()
        if not len(cands):
            return pd.DataFrame(
                columns=["query_id", "neighbor_id", "rank"]
            ).astype("int64")
        cands = cands.sort_values(
            ["query_id", "cos", "neighbor_id"], ascending=[True, False, True]
        )
        top = cands.groupby("query_id", sort=True).head(k).reset_index(drop=True)
        top["rank"] = top.groupby("query_id").cumcount() + 1
        return top[["query_id", "neighbor_id", "rank"]].astype("int64")


def pq_topk(
    ds: "ray.data.Dataset",
    query_ids: list[int],
    *,
    k: int = 5,
    m: int = 8,
    n_centroids: int = 16,
    shortlist: int = 64,
    train_sample: int = 4096,
    emb_col: str = "embedding",
    id_col: str = "vec_id",
) -> pd.DataFrame:
    """Approximate top-k via PQ ADC + exact block rerank."""
    sdf = ds.limit(train_sample).to_pandas()
    if not len(sdf):
        raise ValueError("pq_topk needs a non-empty embedding dataset")
    sample = np.stack(sdf[emb_col].to_numpy()).astype(np.float64)
    index = PQIndex(m=m, k=n_centroids).train(sample)
    encoded = index.encode(ds, emb_col=emb_col).materialize()
    qrows = ds.filter(expr=f"{id_col} in {sorted(set(query_ids))}").take_all()
    order = {v: i for i, v in enumerate(query_ids)}
    qrows.sort(key=lambda r: order[r[id_col]])
    qmat = np.array([r[emb_col] for r in qrows], dtype=np.float64)
    return index.search(
        encoded, qmat, [r[id_col] for r in qrows],
        k=k, shortlist=shortlist, emb_col=emb_col, id_col=id_col,
    )


def kmeans_int(
    embs: "ray.data.Dataset",
    *,
    k: int = 8,
    iters: int = 2,
    scale: int = 10_000,
    offset: int = 100_000,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    return_centroids: bool = False,
) -> "ray.data.Dataset":
    """Deterministic INTEGER Lloyd's k-means over an embedding column —
    the embedding-clustering curation step (SemDeDup-style cluster
    assignment), made bit-exact across engines:

    - vectors quantize to ``floor(x * scale) + offset`` (int64; the
      offset keeps every coordinate nonnegative so floor and truncating
      integer division agree — DuckDB ``//`` truncates toward zero on
      negatives while numpy floors; distances are offset-invariant)
    - seeds = the k lowest-``id_col`` vectors (globally deterministic)
    - assignment = argmin integer squared distance, ties to the lowest
      centroid id (numpy argmin-first == SQL ORDER BY d2, cid)
    - update = elementwise integer mean ``S // n``; empty clusters keep
      their previous centroid
    - ``iters`` update rounds, then one final assignment pass; returns
      (id, cluster, dist2).

    Distribution (the classic MapReduce Lloyd's): centroids are k×dim
    int64 — driver-resident and broadcast into each assignment pass via
    closure capture; per-batch partial sums (k rows per block) are the
    only thing reduced driver-side, so nothing corpus-scale leaves the
    object store at any cluster size."""
    import numpy as np
    import pandas as pd

    def quantize(df: pd.DataFrame) -> pd.DataFrame:
        v = np.stack(df[vec_col].to_numpy()).astype(np.float64)
        q = np.floor(v * scale).astype(np.int64) + offset
        return pd.DataFrame(
            {"vec_id": df[id_col].astype("int64"),
             "qv": list(q)}
        )

    ds_q = embs.map_batches(quantize, batch_format="pandas").materialize()

    # deterministic seeds: k lowest ids (bounded per-block partials,
    # never a full sort)
    def seed_partial(df: pd.DataFrame) -> pd.DataFrame:
        return df.nsmallest(k, "vec_id")

    seeds = (
        ds_q.map_batches(seed_partial, batch_format="pandas")
        .to_pandas()
        .nsmallest(k, "vec_id")
        .sort_values("vec_id", ignore_index=True)
    )
    cent = np.stack(seeds["qv"].to_numpy()).astype(np.int64)  # (k, dim)

    def assign(q: np.ndarray, c: np.ndarray):
        qq = np.einsum("ij,ij->i", q, q)
        cc = np.einsum("ij,ij->i", c, c)
        d2 = qq[:, None] - 2 * (q @ c.T) + cc[None, :]
        a = np.argmin(d2, axis=1)
        return a, d2[np.arange(len(a)), a]

    for _ in range(iters):
        def partial(df: pd.DataFrame, c=cent) -> pd.DataFrame:
            q = np.stack(df["qv"].to_numpy()).astype(np.int64)
            a, _ = assign(q, c)
            s = np.zeros_like(c)
            np.add.at(s, a, q)
            n = np.bincount(a, minlength=len(c)).astype(np.int64)
            return pd.DataFrame(
                {"cid": np.arange(len(c), dtype="int64"),
                 "n": n, "s": list(s)}
            )

        parts = ds_q.map_batches(partial, batch_format="pandas").to_pandas()
        if len(parts) == 0:
            break
        n_tot = parts.groupby("cid")["n"].sum()
        new = cent.copy()
        for cid in range(len(cent)):
            n = int(n_tot.get(cid, 0))
            if n > 0:
                s = np.sum(
                    np.stack(parts.loc[parts["cid"] == cid, "s"].to_numpy()),
                    axis=0,
                ).astype(np.int64)
                new[cid] = s // n  # nonnegative: floor == trunc
        cent = new

    def final(df: pd.DataFrame, c=cent) -> pd.DataFrame:
        q = np.stack(df["qv"].to_numpy()).astype(np.int64)
        a, d = assign(q, c)
        return pd.DataFrame(
            {"vec_id": df["vec_id"].astype("int64"),
             "cluster": pd.array(a, dtype="int64"),
             "dist2": pd.array(d, dtype="int64")}
        )

    out = ds_q.map_batches(final, batch_format="pandas")
    if return_centroids:
        return out, cent
    return out


def kmeans_assign_batch(
    df: "pd.DataFrame",
    cent: np.ndarray,
    *,
    scale: int = 10_000,
    offset: int = 100_000,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
) -> "pd.DataFrame":
    """Map-side re-assignment against FITTED integer centroids — the
    zero-join way to attach (cluster, dist2) to any embedding batch:
    centroids are k×dim int64 (closure-broadcast), quantization and
    argmin are the exact kmeans_int kernels, so labels are bit-identical
    to the fitted assignment.  Keeps every input column."""
    import numpy as np

    v = np.stack(df[vec_col].to_numpy()).astype(np.float64)
    q = np.floor(v * scale).astype(np.int64) + offset
    qq = np.einsum("ij,ij->i", q, q)
    cc = np.einsum("ij,ij->i", cent, cent)
    d2 = qq[:, None] - 2 * (q @ cent.T) + cc[None, :]
    a = np.argmin(d2, axis=1)
    out = df.copy()
    out["cluster"] = pd.array(a, dtype="int64")
    out["dist2"] = pd.array(d2[np.arange(len(a)), a], dtype="int64")
    return out
