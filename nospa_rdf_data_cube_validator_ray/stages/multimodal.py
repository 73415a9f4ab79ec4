"""Multimodal column plumbing: opaque ``binary`` payloads + typed metadata.

The real decode libraries (PIL/torchaudio/ffmpeg) are not in this
container, so the decode kernel is STUBBED — ``DecodeFeatures`` raises
``NotImplementedError`` in ``mode="real"`` and computes a deterministic
byte-level feature vector in ``mode="fake"``.  Everything Ray-side is
real and tested: schema (binary column + metadata), actor-pool stage
shape (decoder "model" built once per actor in ``__init__``), small
batch sizes for large payloads, and list<float> feature output layout.
"""

from __future__ import annotations

import numpy as np
import pandas as pd


def attach_payload(
    ds: "ray.data.Dataset", *, text_col: str = "text", id_col: str = "doc_id"
) -> "ray.data.Dataset":
    """Synthesize an opaque binary payload column + metadata from text
    (stand-in for image/audio bytes; deterministic)."""

    def f(df: pd.DataFrame) -> pd.DataFrame:
        payloads = [t.encode("utf-8") for t in df[text_col].fillna("")]
        return pd.DataFrame(
            {
                "doc_id": df[id_col].astype("int64"),
                "payload": payloads,
                "n_bytes": np.array([len(p) for p in payloads], dtype=np.int64),
                "media_type": "application/octet-stream",
            }
        )

    return ds.map_batches(f, batch_format="pandas")


class DecodeFeatures:
    """Actor-pool decode stage (the shape a real image/audio decoder uses:
    heavy model/codec init once per actor, per-batch decode in __call__).

    mode="real" — would decode via PIL/libav; raises NotImplementedError
    here (libraries not installed, clearly marked stub).
    mode="fake" — deterministic 16-bin byte histogram as the "feature
    vector" so the Ray plumbing (schema in/out, batch sizing, actor reuse)
    is fully exercised and testable.
    """

    def __init__(self, mode: str = "fake", n_bins: int = 16):
        if mode not in ("fake", "real"):
            raise ValueError(mode)
        self.mode = mode
        self.n_bins = n_bins
        # real path would load the codec/model HERE, once per actor
        self.edges = np.linspace(0, 256, n_bins + 1)

    def __call__(self, df: pd.DataFrame) -> pd.DataFrame:
        if self.mode == "real":
            raise NotImplementedError(
                "real decode requires PIL/libav — not available in this "
                "environment; use mode='fake' for the deterministic stub"
            )
        feats = []
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
    concurrency: int = 4,
) -> "ray.data.Dataset":
    """Payload table → (doc_id, n_bytes, features list<float>).  Small
    ``batch_size``: payload batches are large; batch × concurrency must
    fit the worker heap."""
    return ds.map_batches(
        DecodeFeatures,
        fn_constructor_kwargs={"mode": mode},
        batch_format="pandas",
        batch_size=batch_size,
        concurrency=concurrency,
    )


class ResizeImage:
    """Actor-pool resize stage (image downscale shape).  mode="real" would
    decode + resample via PIL — NotImplementedError here; mode="fake"
    deterministically subsamples the byte payload to ``target_bytes`` so
    output layout (smaller binary payload + updated metadata) is real."""

    def __init__(self, target_bytes: int = 256, mode: str = "fake"):
        if mode not in ("fake", "real"):
            raise ValueError(mode)
        self.mode = mode
        self.target = target_bytes

    def __call__(self, df: pd.DataFrame) -> pd.DataFrame:
        if self.mode == "real":
            raise NotImplementedError("real resize requires PIL — stubbed")
        out_payloads = []
        for p in df["payload"]:
            b = np.frombuffer(bytes(p), dtype=np.uint8)
            if len(b) > self.target:
                idx = np.linspace(0, len(b) - 1, self.target).astype(np.int64)
                b = b[idx]
            out_payloads.append(b.tobytes())
        out = df[["doc_id", "media_type"]].copy()
        out["payload"] = out_payloads
        out["n_bytes"] = np.array([len(p) for p in out_payloads], dtype=np.int64)
        return out


class SampleFrames:
    """Actor-pool frame-sampling stage (video → every k-th frame shape).
    mode="fake" splits the payload into fixed-size pseudo-frames and keeps
    every ``stride``-th one as a list<binary> column."""

    def __init__(self, frame_bytes: int = 64, stride: int = 4, mode: str = "fake"):
        if mode not in ("fake", "real"):
            raise ValueError(mode)
        self.mode = mode
        self.frame_bytes = frame_bytes
        self.stride = stride

    def __call__(self, df: pd.DataFrame) -> pd.DataFrame:
        if self.mode == "real":
            raise NotImplementedError("real frame sampling requires libav — stubbed")
        frames_col, counts = [], []
        for p in df["payload"]:
            b = bytes(p)
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


def resize_payloads(ds, *, target_bytes: int = 256, concurrency: int = 4):
    return ds.map_batches(
        ResizeImage,
        fn_constructor_kwargs={"target_bytes": target_bytes},
        batch_format="pandas", batch_size=64, concurrency=concurrency,
    )


def sample_frames(ds, *, frame_bytes: int = 64, stride: int = 4, concurrency: int = 4):
    return ds.map_batches(
        SampleFrames,
        fn_constructor_kwargs={"frame_bytes": frame_bytes, "stride": stride},
        batch_format="pandas", batch_size=64, concurrency=concurrency,
    )
