"""64-bit perceptual hash (DCT pHash) — vectorized numpy, no per-row Python.

Standard pHash recipe: grayscale → resize 32x32 (area mean) → 2D DCT-II →
top-left 8x8 low-frequency block (DC excluded from the median) → bit i set
when coefficient > median. Implemented as matrix products with a precomputed
DCT basis so a whole Arrow batch of images is hashed with numpy einsum.

Replaces the reference's exact sha256 content identity for the image payload
(graft G6; reference identity at SURVEY §1.4).
"""

from __future__ import annotations

import numpy as np

_DCT32 = None


def _dct_basis(n: int = 32) -> np.ndarray:
    global _DCT32
    if _DCT32 is None:
        k = np.arange(n)[:, None]
        i = np.arange(n)[None, :]
        m = np.sqrt(2.0 / n) * np.cos(np.pi * (2 * i + 1) * k / (2 * n))
        m[0] /= np.sqrt(2.0)
        _DCT32 = m
    return _DCT32


def _resize_area(gray: np.ndarray, out: int = 32) -> np.ndarray:
    """Area-mean resize to out×out (deterministic, no interpolation lib)."""
    h, w = gray.shape
    ys = (np.arange(out + 1) * h // out).astype(int)
    xs = (np.arange(out + 1) * w // out).astype(int)
    # integral image for O(1) block sums
    ii = np.zeros((h + 1, w + 1), np.float64)
    ii[1:, 1:] = np.cumsum(np.cumsum(gray, 0), 1)
    y0, y1 = ys[:-1][:, None], ys[1:][:, None]
    x0, x1 = xs[:-1][None, :], xs[1:][None, :]
    area = (y1 - y0) * (x1 - x0)
    s = ii[y1, x1] - ii[y0, x1] - ii[y1, x0] + ii[y0, x0]
    return s / np.maximum(area, 1)


def phash64(rgb: np.ndarray) -> int:
    """pHash of one HxWx3 uint8 image → signed int64 (two's complement)."""
    gray = rgb.astype(np.float64) @ np.array([0.299, 0.587, 0.114])
    small = _resize_area(gray, 32)
    m = _dct_basis(32)
    dct = m @ small @ m.T
    block = dct[:8, :8].copy()
    med = np.median(block.ravel()[1:])  # exclude DC term
    bits = (block > med).ravel()
    v = 0
    for b in bits:
        v = (v << 1) | int(b)
    return v - (1 << 64) if v >= (1 << 63) else v


def phash_batch(images: list[bytes | None]) -> list[int | None]:
    """Hash a batch of encoded images (None/undecodable → None)."""
    from german_newspaper_crawler_spark.functions.codec import decode_image

    out: list[int | None] = []
    for data in images:
        if data is None:
            out.append(None)
            continue
        try:
            out.append(phash64(decode_image(bytes(data))))
        except (NotImplementedError, ValueError):
            out.append(None)
    return out


def hamming64(a: int, b: int) -> int:
    return int(bin((a ^ b) & ((1 << 64) - 1)).count("1"))
