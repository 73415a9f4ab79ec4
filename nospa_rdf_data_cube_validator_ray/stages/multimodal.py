"""Multimodal column plumbing: opaque ``binary`` payloads + typed metadata.

Heavy decode libraries (PIL/torchaudio/ffmpeg) are not in this container,
so ``mode="real"`` decodes the simple end of each modality with the
pure-numpy codecs in ``functions/codecs.py`` — 24-bit BMP images, PCM16
WAV audio, and the documented NBV concatenated-BMP video container — and
raises for media types it cannot decode (an honest error, not a silent
fake).  ``mode="fake"`` keeps the deterministic byte-level features for
opaque payloads.  Everything Ray-side is identical in both modes: schema
(binary column + metadata), actor-pool stage shape (decoder state built
once per actor in ``__init__``), small batch sizes for large payloads,
and list<float> feature output layout.
"""

from __future__ import annotations

import numpy as np
import pandas as pd

from ..functions import codecs as C


def _media_types(df: pd.DataFrame):
    """media_type column, defaulting to opaque bytes — fake-mode callers
    with plain (doc_id, payload) frames keep working."""
    if "media_type" in df.columns:
        return df["media_type"]
    return ["application/octet-stream"] * len(df)


def attach_payload(
    ds: "ray.data.Dataset",
    *,
    text_col: str = "text",
    id_col: str = "doc_id",
    media: str = "bytes",
) -> "ray.data.Dataset":
    """Synthesize an opaque binary payload column + metadata from text.

    media="bytes" — raw utf-8 (opaque; pairs with mode="fake").
    media="bmp"   — a real 24-bit BMP whose pixels derive from the text
                    bytes (decodable by any image tool).
    media="wav"   — a real PCM16 WAV whose samples derive from the text.
    media="nbv"   — a multi-frame NBV clip of BMP frames.
    All deterministic functions of the row, so retries emit identical
    payloads."""

    def f(df: pd.DataFrame) -> pd.DataFrame:
        payloads, mtypes = [], []
        for doc_id, t in zip(df[id_col], df[text_col].fillna("")):
            raw = t.encode("utf-8")
            if media == "bytes":
                payloads.append(raw)
                mtypes.append("application/octet-stream")
                continue
            b = np.frombuffer(raw, dtype=np.uint8)
            if media == "bmp":
                side = max(4, min(32, int(len(b) ** 0.5)))
                px = np.resize(b, side * side * 3).reshape(side, side, 3)
                payloads.append(C.encode_bmp(px))
                mtypes.append("image/bmp")
            elif media == "wav":
                n = max(64, min(4000, len(b) * 4))
                samples = (
                    np.resize(b.astype(np.int16) - 128, n) * 256
                ).astype(np.int16)
                payloads.append(C.encode_wav(samples, rate=8000))
                mtypes.append("audio/wav")
            elif media == "nbv":
                side = 8
                frames = []
                for k in range(4):
                    px = np.resize(b[k:], side * side * 3).reshape(side, side, 3)
                    frames.append(px)
                payloads.append(C.encode_nbv(frames))
                mtypes.append("video/x-nbv")
            else:
                raise ValueError(f"unknown media kind {media!r}")
        return pd.DataFrame(
            {
                "doc_id": df[id_col].astype("int64"),
                "payload": payloads,
                "n_bytes": np.array([len(p) for p in payloads], dtype=np.int64),
                "media_type": mtypes,
            }
        )

    return ds.map_batches(f, batch_format="pandas")


class DecodeFeatures:
    """Actor-pool decode stage (the shape a real image/audio decoder uses:
    codec/state init once per actor, per-batch decode in __call__).

    mode="real" — decode by media_type: image/bmp → (h, w, per-channel
    mean, overall std); audio/wav → (rate, n_samples, rms,
    zero-crossings).  Unknown media types raise.
    mode="fake" — deterministic 16-bin byte histogram (opaque payloads).
    """

    def __init__(self, mode: str = "fake", n_bins: int = 16):
        if mode not in ("fake", "real"):
            raise ValueError(mode)
        self.mode = mode
        self.n_bins = n_bins
        self.edges = np.linspace(0, 256, n_bins + 1)

    def _real_features(self, payload: bytes, media_type: str) -> list[float]:
        if media_type == "image/bmp":
            px = C.decode_bmp(payload)
            means = px.reshape(-1, 3).mean(axis=0)
            return [
                float(px.shape[0]), float(px.shape[1]),
                float(means[0]), float(means[1]), float(means[2]),
                float(px.std()),
            ]
        if media_type == "audio/wav":
            rate, s = C.decode_wav(payload)
            x = s.astype(np.float64)
            rms = float(np.sqrt((x * x).mean())) if len(x) else 0.0
            zc = int(((s[:-1] < 0) != (s[1:] < 0)).sum()) if len(s) > 1 else 0
            return [float(rate), float(len(s)), rms, float(zc)]
        raise ValueError(
            f"no decoder for media type {media_type!r} (real mode decodes "
            "image/bmp and audio/wav in this environment)"
        )

    def __call__(self, df: pd.DataFrame) -> pd.DataFrame:
        feats = []
        if self.mode == "real":
            for p, mt in zip(df["payload"], _media_types(df)):
                feats.append(self._real_features(bytes(p), mt))
        else:
            for p in df["payload"]:
                b = np.frombuffer(bytes(p), dtype=np.uint8)
                hist = np.histogram(b, bins=self.edges)[0] if len(b) else np.zeros(
                    self.n_bins, dtype=np.int64
                )
                feats.append(hist.astype(np.float32).tolist())
        out = df[["doc_id", "n_bytes"]].copy()
        out["features"] = feats
        return out


def decode_features(
    ds: "ray.data.Dataset",
    *,
    mode: str = "fake",
    batch_size: int = 64,
    concurrency=None,
) -> "ray.data.Dataset":
    """Payload table → (doc_id, n_bytes, features list<float>).  Small
    ``batch_size``: payload batches are large; batch × concurrency must
    fit the worker heap."""
    from ..util import auto_concurrency

    return ds.map_batches(
        DecodeFeatures,
        fn_constructor_kwargs={"mode": mode},
        batch_format="pandas",
        batch_size=batch_size,
        concurrency=auto_concurrency(concurrency),
    )


class ResizeImage:
    """Actor-pool resize stage.  mode="real": decode BMP → nearest-neighbor
    resample to ``target_side``² → re-encode BMP (pure numpy, real image
    semantics).  mode="fake": subsample the raw byte payload to
    ``target_bytes`` (opaque payloads; output layout identical)."""

    def __init__(
        self, target_bytes: int = 256, mode: str = "fake", target_side: int = 8
    ):
        if mode not in ("fake", "real"):
            raise ValueError(mode)
        self.mode = mode
        self.target = target_bytes
        self.side = target_side

    def __call__(self, df: pd.DataFrame) -> pd.DataFrame:
        out_payloads = []
        mts = _media_types(df)
        for p, mt in zip(df["payload"], mts):
            b = bytes(p)
            if self.mode == "real":
                if mt != "image/bmp":
                    raise ValueError(f"real resize needs image/bmp, got {mt!r}")
                px = C.decode_bmp(b)
                out_payloads.append(
                    C.encode_bmp(C.resize_nn(px, self.side, self.side))
                )
                continue
            arr = np.frombuffer(b, dtype=np.uint8)
            if len(arr) > self.target:
                idx = np.linspace(0, len(arr) - 1, self.target).astype(np.int64)
                arr = arr[idx]
            out_payloads.append(arr.tobytes())
        out = df[["doc_id"]].copy()
        out["media_type"] = list(_media_types(df))
        out["payload"] = out_payloads
        out["n_bytes"] = np.array([len(p) for p in out_payloads], dtype=np.int64)
        return out


class SampleFrames:
    """Actor-pool frame-sampling stage (video → every ``stride``-th frame).
    mode="real": walk the NBV container index and keep every stride-th BMP
    frame WITHOUT decoding dropped frames (what a real sampler does with
    keyframes).  mode="fake": fixed-size pseudo-frames from raw bytes."""

    def __init__(self, frame_bytes: int = 64, stride: int = 4, mode: str = "fake"):
        if mode not in ("fake", "real"):
            raise ValueError(mode)
        self.mode = mode
        self.frame_bytes = frame_bytes
        self.stride = stride

    def __call__(self, df: pd.DataFrame) -> pd.DataFrame:
        frames_col, counts = [], []
        for p, mt in zip(df["payload"], _media_types(df)):
            b = bytes(p)
            if self.mode == "real":
                if mt != "video/x-nbv":
                    raise ValueError(f"real sampling needs video/x-nbv, got {mt!r}")
                frames = list(C.iter_nbv_frames(b))[:: self.stride]
            else:
                frames = [
                    b[i : i + self.frame_bytes]
                    for i in range(0, len(b), self.frame_bytes)
                ][:: self.stride]
            frames_col.append(frames)
            counts.append(len(frames))
        out = df[["doc_id"]].copy()
        out["frames"] = frames_col
        out["n_frames"] = np.array(counts, dtype=np.int64)
        return out


def resize_payloads(
    ds, *, target_bytes: int = 256, mode: str = "fake", target_side: int = 8,
    concurrency=None,
):
    from ..util import auto_concurrency

    return ds.map_batches(
        ResizeImage,
        fn_constructor_kwargs={
            "target_bytes": target_bytes, "mode": mode, "target_side": target_side,
        },
        batch_format="pandas", batch_size=64,
        concurrency=auto_concurrency(concurrency),
    )


def sample_frames(
    ds, *, frame_bytes: int = 64, stride: int = 4, mode: str = "fake",
    concurrency=None,
):
    from ..util import auto_concurrency

    return ds.map_batches(
        SampleFrames,
        fn_constructor_kwargs={
            "frame_bytes": frame_bytes, "stride": stride, "mode": mode,
        },
        batch_format="pandas", batch_size=64,
        concurrency=auto_concurrency(concurrency),
    )


class ImageStats:
    """Actor-pool image-statistics stage over REAL decoded pixels —
    integer outputs (height, width, px_sum) so a SQL oracle can
    reproduce them exactly (float channel means cannot be
    hash-compared): the payload column is parsed by the actual BMP
    codec (functions/codecs.decode_bmp), so this exercises the full
    encode → binary column → decode round-trip."""

    def __call__(self, df: pd.DataFrame) -> pd.DataFrame:
        hs, ws, sums = [], [], []
        for p, mt in zip(df["payload"], _media_types(df)):
            if mt != "image/bmp":
                raise ValueError(f"ImageStats needs image/bmp rows, got {mt!r}")
            px = C.decode_bmp(bytes(p))
            hs.append(px.shape[0])
            ws.append(px.shape[1])
            sums.append(int(px.astype(np.int64).sum()))
        return pd.DataFrame(
            {
                "doc_id": df["doc_id"].astype("int64"),
                "height": pd.Series(hs, dtype="int64", index=df.index),
                "width": pd.Series(ws, dtype="int64", index=df.index),
                "px_sum": pd.Series(sums, dtype="int64", index=df.index),
            }
        )


def image_stats(
    ds: "ray.data.Dataset", *, batch_size: int = 64, concurrency=None
) -> "ray.data.Dataset":
    """Payload table (image/bmp) → (doc_id, height, width, px_sum)."""
    from ..util import auto_concurrency

    return ds.map_batches(
        ImageStats,
        batch_format="pandas",
        batch_size=batch_size,
        concurrency=auto_concurrency(concurrency),
    )


class ImageHist:
    """Actor-pool brightness-histogram stage: decode each image/bmp
    payload with the real codec and bincount its bytes into 16
    brightness bins (value // 16) — integer counts, so a SQL oracle
    reproduces them exactly from the synthesis arithmetic.  Emits all
    16 bins per image (zeros included) for a fixed per-image shape."""

    def __call__(self, df: pd.DataFrame) -> pd.DataFrame:
        ids, bins, counts = [], [], []
        bin_idx = np.arange(16, dtype=np.int64)
        for doc_id, p, mt in zip(
            df["doc_id"].astype("int64"), df["payload"], _media_types(df)
        ):
            if mt != "image/bmp":
                raise ValueError(f"ImageHist needs image/bmp rows, got {mt!r}")
            px = C.decode_bmp(bytes(p))
            h = np.bincount(px.reshape(-1) >> 4, minlength=16)
            ids.append(np.full(16, doc_id, dtype=np.int64))
            bins.append(bin_idx)
            counts.append(h.astype(np.int64))
        if not ids:
            return pd.DataFrame(
                {
                    "doc_id": pd.Series(dtype="int64"),
                    "bin": pd.Series(dtype="int64"),
                    "n_px": pd.Series(dtype="int64"),
                }
            )
        return pd.DataFrame(
            {
                "doc_id": np.concatenate(ids),
                "bin": np.concatenate(bins),
                "n_px": np.concatenate(counts),
            }
        )


def image_hist(
    ds: "ray.data.Dataset", *, batch_size: int = 64, concurrency=None
) -> "ray.data.Dataset":
    """Payload table (image/bmp) → (doc_id, bin 0..15, n_px)."""
    from ..util import auto_concurrency

    return ds.map_batches(
        ImageHist,
        batch_format="pandas",
        batch_size=batch_size,
        concurrency=auto_concurrency(concurrency),
    )


class AudioStats:
    """Actor-pool audio-statistics stage (integer outputs — SQL-exact):
    PCM16 WAV payloads → (doc_id, rate, n_samples, samp_sum) through the
    actual codec (functions/codecs.decode_wav)."""

    def __call__(self, df: pd.DataFrame) -> pd.DataFrame:
        rates, ns, sums = [], [], []
        for p, mt in zip(df["payload"], _media_types(df)):
            if mt != "audio/wav":
                raise ValueError(f"AudioStats needs audio/wav rows, got {mt!r}")
            rate, s = C.decode_wav(bytes(p))
            rates.append(rate)
            ns.append(len(s))
            sums.append(int(s.astype(np.int64).sum()))
        return pd.DataFrame(
            {
                "doc_id": df["doc_id"].astype("int64"),
                "rate": pd.Series(rates, dtype="int64", index=df.index),
                "n_samples": pd.Series(ns, dtype="int64", index=df.index),
                "samp_sum": pd.Series(sums, dtype="int64", index=df.index),
            }
        )


def audio_stats(
    ds: "ray.data.Dataset", *, batch_size: int = 64, concurrency=None
) -> "ray.data.Dataset":
    """Payload table (audio/wav) → (doc_id, rate, n_samples, samp_sum)."""
    from ..util import auto_concurrency

    return ds.map_batches(
        AudioStats,
        batch_format="pandas",
        batch_size=batch_size,
        concurrency=auto_concurrency(concurrency),
    )


class ResampleAudio:
    """Actor-pool audio-resample stage (integer decimation): decode the
    PCM16 WAV payload, keep every ``factor``-th sample, re-encode at
    ``rate // factor``.  Pure index arithmetic — no filtering — so a SQL
    oracle can reproduce the surviving samples exactly, and the
    decode → slice → encode round trip exercises the real codec in both
    directions."""

    def __init__(self, factor: int = 4):
        if factor < 1:
            raise ValueError("factor must be >= 1")
        self.factor = factor

    def __call__(self, df: pd.DataFrame) -> pd.DataFrame:
        payloads = []
        for p, mt in zip(df["payload"], _media_types(df)):
            if mt != "audio/wav":
                raise ValueError(f"ResampleAudio needs audio/wav rows, got {mt!r}")
            rate, s = C.decode_wav(bytes(p))
            payloads.append(C.encode_wav(s[:: self.factor], rate // self.factor))
        out = df[["doc_id"]].copy()
        out["media_type"] = "audio/wav"
        out["payload"] = payloads
        out["n_bytes"] = np.array([len(p) for p in payloads], dtype=np.int64)
        return out


def resample_audio(
    ds: "ray.data.Dataset", *, factor: int = 4, concurrency=None
) -> "ray.data.Dataset":
    """Payload table (audio/wav) → decimated audio/wav payload table."""
    from ..util import auto_concurrency

    return ds.map_batches(
        ResampleAudio,
        fn_constructor_kwargs={"factor": factor},
        batch_format="pandas",
        batch_size=64,
        concurrency=auto_concurrency(concurrency),
    )


class ImageTiles:
    """2×2 spatial pooling over REAL decoded pixels: integer quadrant
    sums (the pooling layer of a vision feature extractor) — one row
    per (doc, tile), tile = (r·2//side)·2 + (c·2//side), floor
    boundaries so a SQL oracle reproduces every sum exactly."""

    def __call__(self, df: pd.DataFrame) -> pd.DataFrame:
        ids, tiles, sums = [], [], []
        for doc_id, p, mt in zip(df["doc_id"], df["payload"], _media_types(df)):
            if mt != "image/bmp":
                raise ValueError(f"ImageTiles needs image/bmp rows, got {mt!r}")
            px = C.decode_bmp(bytes(p)).astype(np.int64)
            h, w = px.shape[:2]
            pix = px.sum(axis=2)
            ti = np.arange(h) * 2 // h
            tj = np.arange(w) * 2 // w
            idx = (ti[:, None] * 2 + tj[None, :]).ravel()
            s = np.bincount(idx, weights=pix.ravel(), minlength=4)
            ids.extend([int(doc_id)] * 4)
            tiles.extend(range(4))
            sums.extend(int(x) for x in s)
        return pd.DataFrame(
            {
                "doc_id": pd.Series(ids, dtype="int64"),
                "tile": pd.Series(tiles, dtype="int64"),
                "px_sum": pd.Series(sums, dtype="int64"),
            }
        )


def image_tiles(
    ds: "ray.data.Dataset", *, batch_size: int = 64, concurrency=None
) -> "ray.data.Dataset":
    """Payload table (image/bmp) → (doc_id, tile, px_sum) quadrant sums."""
    from ..util import auto_concurrency

    return ds.map_batches(
        ImageTiles,
        batch_format="pandas",
        batch_size=batch_size,
        concurrency=auto_concurrency(concurrency),
    )


class AudioVAD:
    """Frame-energy voice-activity detection over PCM16 WAV payloads:
    |sample| sums per ``frame``-sample window (full frames only; the
    tail is dropped), frames above ``threshold`` count as active —
    integer arithmetic end-to-end so a SQL oracle reproduces every
    energy exactly.  The decode runs once per payload in the actor."""

    def __init__(self, frame: int = 64, threshold: int = 800_000):
        if frame < 1:
            raise ValueError("frame must be >= 1")
        self.frame = frame
        self.threshold = threshold

    def __call__(self, df: pd.DataFrame) -> pd.DataFrame:
        nf, na, te = [], [], []
        for p, mt in zip(df["payload"], _media_types(df)):
            if mt != "audio/wav":
                raise ValueError(f"AudioVAD needs audio/wav rows, got {mt!r}")
            _, s = C.decode_wav(bytes(p))
            k = len(s) // self.frame
            e = (
                np.abs(s[: k * self.frame].astype(np.int64))
                .reshape(k, self.frame)
                .sum(axis=1)
            )
            nf.append(k)
            na.append(int((e > self.threshold).sum()))
            te.append(int(e.sum()))
        return pd.DataFrame(
            {
                "doc_id": df["doc_id"].astype("int64"),
                "n_frames": pd.Series(nf, dtype="int64", index=df.index),
                "n_active": pd.Series(na, dtype="int64", index=df.index),
                "total_energy": pd.Series(te, dtype="int64", index=df.index),
            }
        )


def audio_vad(
    ds: "ray.data.Dataset",
    *,
    frame: int = 64,
    threshold: int = 800_000,
    concurrency=None,
) -> "ray.data.Dataset":
    """Payload table (audio/wav) → (doc_id, n_frames, n_active,
    total_energy)."""
    from ..util import auto_concurrency

    return ds.map_batches(
        AudioVAD,
        fn_constructor_kwargs={"frame": frame, "threshold": threshold},
        batch_format="pandas",
        batch_size=64,
        concurrency=auto_concurrency(concurrency),
    )


class VideoFrameStats:
    """Actor-pool decoded-frame statistics over a SampleFrames output
    (frames = list of BMP-encoded byte strings): integer pixel sums —
    SQL-exact — per document across the SAMPLED frames only."""

    def __call__(self, df: pd.DataFrame) -> pd.DataFrame:
        sums = []
        for frames in df["frames"]:
            s = 0
            for fb in frames:
                s += int(C.decode_bmp(bytes(fb)).astype(np.int64).sum())
            sums.append(s)
        return pd.DataFrame(
            {
                "doc_id": df["doc_id"].astype("int64"),
                "n_frames": df["n_frames"].astype("int64"),
                "px_sum": pd.Series(sums, dtype="int64", index=df.index),
            }
        )


def video_frame_stats(
    ds: "ray.data.Dataset", *, batch_size: int = 64, concurrency=None
) -> "ray.data.Dataset":
    """SampleFrames output → (doc_id, n_frames, px_sum)."""
    from ..util import auto_concurrency

    return ds.map_batches(
        VideoFrameStats,
        batch_format="pandas",
        batch_size=batch_size,
        concurrency=auto_concurrency(concurrency),
    )


class SceneCuts:
    """Shot-boundary detection over a SampleFrames output: per-frame
    integer pixel sums, a cut = |Δsum| above ``threshold`` between
    consecutive frames — integer end-to-end so a SQL oracle reproduces
    every delta.  Clips need ≥ 2 frames (stride-1 sampling upstream)."""

    def __init__(self, threshold: int = 150):
        self.threshold = threshold

    def __call__(self, df: pd.DataFrame) -> pd.DataFrame:
        nc, mx = [], []
        for frames in df["frames"]:
            sums = [
                int(C.decode_bmp(bytes(fb)).astype(np.int64).sum())
                for fb in frames
            ]
            deltas = [abs(b - a) for a, b in zip(sums, sums[1:])]
            if not deltas:
                raise ValueError("SceneCuts needs clips with >= 2 frames")
            nc.append(sum(d > self.threshold for d in deltas))
            mx.append(max(deltas))
        return pd.DataFrame(
            {
                "doc_id": df["doc_id"].astype("int64"),
                "n_cuts": pd.Series(nc, dtype="int64", index=df.index),
                "max_delta": pd.Series(mx, dtype="int64", index=df.index),
            }
        )


def scene_cuts(
    ds: "ray.data.Dataset",
    *,
    threshold: int = 150,
    batch_size: int = 64,
    concurrency=None,
) -> "ray.data.Dataset":
    """SampleFrames output → (doc_id, n_cuts, max_delta)."""
    from ..util import auto_concurrency

    return ds.map_batches(
        SceneCuts,
        fn_constructor_kwargs={"threshold": threshold},
        batch_format="pandas",
        batch_size=batch_size,
        concurrency=auto_concurrency(concurrency),
    )


class PHash:
    """Perceptual block hash over REAL decoded pixels — the image
    analogue of SimHash for near-duplicate detection: the flattened
    pixel byte sequence splits into 64 equal floor-boundary segments
    (byte j → segment (j·64)//total), and bit i is set when segment i
    is brighter than the image average (cross-multiplied integer
    compare ``seg_sum · total_count > total_sum · seg_count`` — no
    float division, so the SQL oracle reproduces every bit).  Output:
    the signed-int64 view of the 64-bit hash + its 8 × 8-bit band
    keys (pigeonhole-complete bucketing for Hamming ≤ 7 — images move
    more bits per edit than text simhash, so the radius is wider and
    the bands narrower than stages/dedup.simhash's 4 × 16)."""

    def __call__(self, df: pd.DataFrame) -> pd.DataFrame:
        seg64 = np.arange(64, dtype=np.uint64)
        hashes = np.empty(len(df), dtype=np.uint64)
        for r, (p, mt) in enumerate(zip(df["payload"], _media_types(df))):
            if mt != "image/bmp":
                raise ValueError(f"PHash needs image/bmp rows, got {mt!r}")
            px = C.decode_bmp(bytes(p)).astype(np.int64).ravel()
            total = px.size
            seg = (np.arange(total) * 64) // total
            s = np.bincount(seg, weights=px, minlength=64).astype(np.int64)
            cnt = np.bincount(seg, minlength=64).astype(np.int64)
            bits = (s * total) > (int(px.sum()) * cnt)
            hashes[r] = np.sum(
                np.where(bits, np.uint64(1) << seg64, np.uint64(0)),
                dtype=np.uint64,
            )
        out = pd.DataFrame({"doc_id": df["doc_id"].astype("int64")})
        out["phash"] = hashes.view(np.int64)
        for bidx in range(8):
            out[f"band{bidx}"] = (
                (hashes >> np.uint64(8 * bidx)) & np.uint64(0xFF)
            ).astype("int64")
        return out


def phash_table(
    ds: "ray.data.Dataset", *, batch_size: int = 64, concurrency=None
) -> "ray.data.Dataset":
    """Payload table (image/bmp) → (doc_id, phash, band0..band7)."""
    from ..util import auto_concurrency

    return ds.map_batches(
        PHash,
        batch_format="pandas",
        batch_size=batch_size,
        concurrency=auto_concurrency(concurrency),
    )


def phash_pairs(
    ds: "ray.data.Dataset", *, max_hamming: int = 7, num_buckets: int = 64
) -> "ray.data.Dataset":
    """Near-duplicate IMAGE pairs: band-bucket candidate generation over
    the 8 × 8-bit phash bands (any pair within Hamming ≤ 7 of 64 bits
    shares at least one exact band — pigeonhole), then exact SWAR
    popcount verify.  Mirrors stages/dedup.simhash_pairs' shape: the
    only shuffle is the coarse band-bucket groupby at candidate scale."""
    from ..stages import dedup as D

    hashes = phash_table(ds).materialize()

    def fan_out(df: pd.DataFrame) -> pd.DataFrame:
        frames = []
        for bidx in range(8):
            frames.append(
                pd.DataFrame(
                    {
                        "doc_id": df["doc_id"].astype("int64"),
                        "u": df["phash"].astype("int64"),
                        "bucket": (
                            df[f"band{bidx}"].to_numpy(np.int64)
                            + (bidx << 8)
                        ),
                    }
                )
            )
        return pd.concat(frames, ignore_index=True)

    fanned = hashes.map_batches(fan_out, batch_format="pandas")

    def coarse(df: pd.DataFrame) -> pd.DataFrame:
        out = df.copy()
        out["_cb"] = (out["bucket"].to_numpy(np.int64) % num_buckets).astype(
            "int32"
        )
        return out

    def pairs(df: pd.DataFrame) -> pd.DataFrame:
        d = df[["bucket", "doc_id", "u"]].drop_duplicates(
            ["bucket", "doc_id"]
        ).sort_values(["bucket", "doc_id"])
        ks = d["bucket"].to_numpy()
        ids = d["doc_id"].to_numpy(np.int64)
        us = d["u"].to_numpy(np.int64).view(np.uint64)
        bounds = D._segment_bounds(ks)
        outs = []
        for s0, e0 in zip(bounds[:-1], bounds[1:]):
            n = e0 - s0
            if n < 2:
                continue
            ia, ib = np.triu_indices(n, k=1)
            ham = D._popcount64(
                us[s0:e0][ia] ^ us[s0:e0][ib]
            ).astype("int64")
            keep = ham <= max_hamming
            outs.append(
                pd.DataFrame(
                    {
                        "doc_id_a": ids[s0:e0][ia][keep],
                        "doc_id_b": ids[s0:e0][ib][keep],
                        "hamming": ham[keep],
                    }
                )
            )
        if not outs:
            return pd.DataFrame(
                {"doc_id_a": [], "doc_id_b": [], "hamming": []}
            ).astype("int64")
        return pd.concat(outs, ignore_index=True)

    raw = (
        fanned.map_batches(coarse, batch_format="pandas")
        .groupby("_cb")
        .map_groups(pairs, batch_format="pandas")
    )
    return D._dedup_pairs(raw, extra_cols=("hamming",))
