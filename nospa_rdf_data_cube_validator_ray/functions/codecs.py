"""Pure-numpy media codecs (no PIL/libav in this environment).

Real, spec-conformant encoders/decoders for the simple end of each
modality — enough to make the multimodal pipeline's ``mode="real"`` a
genuine decode path rather than a stub:

* BMP  — 24-bit uncompressed Windows bitmap (BITMAPINFOHEADER, bottom-up
         rows, 4-byte row padding).  Any BMP writer/reader agrees on it.
* WAV  — RIFF PCM 16-bit mono.
* NBV  — "naive BMP video": length-prefixed concatenated BMP frames
         (magic ``NBV1`` + u32 frame count + per-frame u32 size).  Our own
         container (documented, versioned) standing in for a video codec;
         the frame payloads themselves are standard BMPs.
"""

from __future__ import annotations

import struct

import numpy as np


# ---------------------------------------------------------------------------
# BMP (24-bit, uncompressed)
# ---------------------------------------------------------------------------


def encode_bmp(arr: np.ndarray) -> bytes:
    """HxWx3 uint8 (RGB) → 24-bit BMP bytes."""
    if arr.ndim != 3 or arr.shape[2] != 3 or arr.dtype != np.uint8:
        raise ValueError("encode_bmp expects HxWx3 uint8")
    h, w, _ = arr.shape
    row_bytes = (w * 3 + 3) & ~3
    img_size = row_bytes * h
    header = struct.pack(
        "<2sIHHI", b"BM", 14 + 40 + img_size, 0, 0, 14 + 40
    ) + struct.pack("<IiiHHIIiiII", 40, w, h, 1, 24, 0, img_size, 2835, 2835, 0, 0)
    rows = np.zeros((h, row_bytes), dtype=np.uint8)
    # BGR channel order, bottom-up row order
    rows[:, : w * 3] = arr[::-1, :, ::-1].reshape(h, w * 3)
    return header + rows.tobytes()


def decode_bmp(data: bytes) -> np.ndarray:
    """24-bit BMP bytes → HxWx3 uint8 (RGB)."""
    if data[:2] != b"BM":
        raise ValueError("not a BMP payload")
    data_off = struct.unpack_from("<I", data, 10)[0]
    hdr_size, w, h = struct.unpack_from("<Iii", data, 14)
    planes, bpp = struct.unpack_from("<HH", data, 26)
    compression = struct.unpack_from("<I", data, 30)[0]
    if bpp != 24 or compression != 0:
        raise ValueError(f"unsupported BMP variant (bpp={bpp}, comp={compression})")
    bottom_up = h > 0
    h = abs(h)
    row_bytes = (w * 3 + 3) & ~3
    rows = np.frombuffer(data, dtype=np.uint8, count=row_bytes * h, offset=data_off)
    rows = rows.reshape(h, row_bytes)[:, : w * 3].reshape(h, w, 3)
    if bottom_up:
        rows = rows[::-1]
    return rows[:, :, ::-1].copy()  # BGR → RGB


def resize_nn(arr: np.ndarray, out_h: int, out_w: int) -> np.ndarray:
    """Nearest-neighbor resize (pure index arithmetic, vectorized)."""
    h, w = arr.shape[:2]
    yi = (np.arange(out_h) * h // out_h).clip(0, h - 1)
    xi = (np.arange(out_w) * w // out_w).clip(0, w - 1)
    return arr[yi][:, xi]


# ---------------------------------------------------------------------------
# WAV (RIFF PCM16 mono)
# ---------------------------------------------------------------------------


def encode_wav(samples: np.ndarray, rate: int = 16_000) -> bytes:
    """int16 mono samples → RIFF/WAVE PCM bytes."""
    if samples.dtype != np.int16:
        raise ValueError("encode_wav expects int16 samples")
    payload = samples.tobytes()
    return (
        struct.pack("<4sI4s", b"RIFF", 36 + len(payload), b"WAVE")
        + struct.pack(
            "<4sIHHIIHH", b"fmt ", 16, 1, 1, rate, rate * 2, 2, 16
        )
        + struct.pack("<4sI", b"data", len(payload))
        + payload
    )


def decode_wav(data: bytes) -> tuple[int, np.ndarray]:
    """RIFF/WAVE PCM16 mono bytes → (sample_rate, int16 samples)."""
    if data[:4] != b"RIFF" or data[8:12] != b"WAVE":
        raise ValueError("not a WAV payload")
    pos = 12
    rate, samples = None, None
    while pos + 8 <= len(data):
        cid, size = struct.unpack_from("<4sI", data, pos)
        pos += 8
        if cid == b"fmt ":
            fmt, ch, rate = struct.unpack_from("<HHI", data, pos)
            if fmt != 1 or ch != 1:
                raise ValueError("unsupported WAV variant (PCM16 mono only)")
        elif cid == b"data":
            samples = np.frombuffer(data, dtype="<i2", count=size // 2, offset=pos)
        pos += size + (size & 1)
    if rate is None or samples is None:
        raise ValueError("WAV missing fmt/data chunks")
    return rate, samples


# ---------------------------------------------------------------------------
# NBV (naive concatenated-BMP video container)
# ---------------------------------------------------------------------------


def encode_nbv(frames: list[np.ndarray]) -> bytes:
    bmps = [encode_bmp(f) for f in frames]
    out = [struct.pack("<4sI", b"NBV1", len(bmps))]
    for b in bmps:
        out.append(struct.pack("<I", len(b)))
        out.append(b)
    return b"".join(out)


def iter_nbv_frames(data: bytes):
    """Yield raw BMP frame payloads without decoding them (a real frame
    sampler skips the decode for dropped frames)."""
    if data[:4] != b"NBV1":
        raise ValueError("not an NBV payload")
    (n,) = struct.unpack_from("<I", data, 4)
    pos = 8
    for _ in range(n):
        (size,) = struct.unpack_from("<I", data, pos)
        pos += 4
        yield data[pos : pos + size]
        pos += size
