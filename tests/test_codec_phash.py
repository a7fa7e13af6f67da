"""Image codec + pHash unit tests (graft G5/G6, input_hint invariants)."""

from __future__ import annotations

import numpy as np
import pytest

from german_newspaper_crawler_spark.fixtures import make_image
from german_newspaper_crawler_spark.functions import codec
from german_newspaper_crawler_spark.functions.phash import hamming64, phash64, phash_batch


def test_png_roundtrip_lossless():
    img = make_image(7, size=48)
    assert (codec.decode_png(codec.encode_png(img)) == img).all()


def test_fake_jpeg_psnr_above_40():
    img = make_image(11, size=64)
    dec = codec.decode_fake_jpeg(codec.encode_fake_jpeg(img))
    assert codec.psnr(img, dec) >= 40.0
    assert not (dec == img).all()  # genuinely lossy


def test_decode_dispatch_and_unknown_format():
    img = make_image(3, size=32)
    assert (codec.decode_image(codec.encode_png(img)) == img).all()
    with pytest.raises(NotImplementedError):
        codec.decode_image(b"GIF89a not supported without PIL")


def test_phash_invariance_and_discrimination():
    img = make_image(21, size=128)
    h = phash64(img)
    # invariant under the lossy codec and small noise
    lossy = codec.decode_fake_jpeg(codec.encode_fake_jpeg(img))
    assert hamming64(h, phash64(lossy)) <= 4
    noisy = make_image(21, size=128, noise=5)
    assert hamming64(h, phash64(noisy)) <= 4
    # invariant under resize (same content, different resolution)
    big = make_image(21, size=256)
    assert hamming64(h, phash64(big)) <= 4
    # discriminates different content
    other = make_image(22, size=128)
    assert hamming64(h, phash64(other)) >= 16


def test_phash_batch_handles_nulls_and_junk():
    img = make_image(5, size=32)
    out = phash_batch([codec.encode_png(img), None, b"junk bytes"])
    assert out[0] == phash64(img)
    assert out[1] is None and out[2] is None
