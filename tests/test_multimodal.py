"""Multimodal binary-column plumbing: sniff, resize (real), audio features
and video frame sampling (real plumbing over the stubbed codec boundary)."""

from __future__ import annotations

import numpy as np
import pytest

from german_newspaper_crawler_spark.fixtures import make_image
from german_newspaper_crawler_spark.functions.codec import decode_png, encode_png, psnr
from german_newspaper_crawler_spark.operators import multimodal as MM


@pytest.fixture(scope="module")
def media_df(spark):
    rows = []
    for i in range(6):
        rows.append((f"img-{i}", bytearray(encode_png(make_image(i, size=64)))))
    rng = np.random.default_rng(5)
    for i in range(4):
        pcm = (np.sin(np.linspace(0, 40 * (i + 1), 16000)) * 20000).astype("<i2")
        rows.append((f"aud-{i}", bytearray(MM.encode_fake_audio(pcm, 16000))))
    for i in range(3):
        frames = np.stack([make_image(100 + i * 10 + f, size=32) for f in range(9)])
        rows.append((f"vid-{i}", bytearray(MM.encode_fake_video(frames))))
    rows.append(("junk-0", bytearray(b"mystery bytes")))
    return spark.createDataFrame(rows, ["media_id", "bytes"])


def test_sniff_metadata(spark, media_df):
    got = {r["media_id"]: r["mime"] for r in MM.sniff_binary_metadata(media_df, "media_id", "bytes").collect()}
    assert got["img-0"] == "image/png"
    assert got["aud-1"] == "audio/fake-pcm"
    assert got["vid-2"] == "video/fake-raw"
    assert got["junk-0"] == "application/octet-stream"


def test_resize_images_real(spark, media_df):
    out = MM.resize_images(
        media_df.where("media_id like 'img-%'"), 16, id_col="media_id"
    ).collect()
    assert len(out) == 6
    for r in out:
        rgb = decode_png(bytes(r["bytes"]))
        assert rgb.shape == (16, 16, 3)
    # area-resize of a flat image stays flat (content sanity)
    flat = spark.createDataFrame(
        [("f", bytearray(encode_png(np.full((64, 64, 3), 128, np.uint8))))],
        ["image_id", "bytes"],
    )
    r = MM.resize_images(flat, 8).collect()[0]
    assert (decode_png(bytes(r["bytes"])) == 128).all()


def test_audio_features_plumbing(spark, media_df):
    out = {r["media_id"]: r for r in MM.audio_features(media_df, "media_id", "bytes").collect()}
    assert set(out) == {f"aud-{i}" for i in range(4)}  # non-audio rows skipped
    a = out["aud-0"]
    assert a["sample_rate"] == 16000
    assert a["duration_s"] == pytest.approx(1.0)
    assert 0.3 < a["rms"] < 0.6  # sine RMS ≈ amplitude/√2 ≈ 0.43
    assert a["zero_crossings"] > 0


def test_video_frame_sampling_plumbing(spark, media_df):
    out = MM.sample_video_frames(media_df, every_n=3, id_col="media_id", bytes_col="bytes")
    rows = out.collect()
    by_vid: dict = {}
    for r in rows:
        by_vid.setdefault(r["media_id"], []).append(r["frame_idx"])
    assert set(by_vid) == {f"vid-{i}" for i in range(3)}
    for idxs in by_vid.values():
        assert sorted(idxs) == [0, 3, 6]  # 9 frames sampled every 3
    # frames round-trip and are phashable
    r0 = rows[0]
    assert decode_png(bytes(r0["png"])).shape == (32, 32, 3)
    assert r0["phash"] is not None


def test_real_formats_raise_not_implemented():
    with pytest.raises(NotImplementedError):
        MM.decode_audio(b"RIFF....WAVEfmt ")
    with pytest.raises(NotImplementedError):
        MM.decode_video(b"\x00\x00\x00 ftypisom")


def test_image_stats_features(spark):
    """image_stats (LAION-style pre-filter features): a flat solid image has
    ~zero std/entropy/edges; a noisy one is high on all three; dimensions
    and luminance land where constructed; undecodable rows drop."""
    import numpy as np

    from german_newspaper_crawler_spark.functions.codec import encode_png
    from german_newspaper_crawler_spark.operators.multimodal import image_stats

    flat = np.full((16, 24, 3), 128, dtype=np.uint8)
    rng = np.random.default_rng(7)
    noisy = rng.integers(0, 256, size=(16, 24, 3), dtype=np.uint8).astype(np.uint8)
    rows = [
        ("flat", bytearray(encode_png(flat))),
        ("noisy", bytearray(encode_png(noisy))),
        ("broken", bytearray(b"\x00\x01notanimage")),
        ("null", None),
    ]
    df = spark.createDataFrame(rows, "image_id string, bytes binary")
    got = {r["image_id"]: r for r in image_stats(df).collect()}
    assert set(got) == {"flat", "noisy"}  # broken/null dropped
    f, n = got["flat"], got["noisy"]
    assert (f["w"], f["h"]) == (24, 16)
    assert abs(f["mean_lum"] - 128.0) < 1.0
    assert f["std_lum"] == 0.0 and f["entropy"] == 0.0 and f["edge_density"] == 0.0
    assert n["std_lum"] > 30 and n["entropy"] > 4 and n["edge_density"] > 0.5
    # the downstream filter is a plain relational predicate
    kept = image_stats(df).where("std_lum > 5 AND entropy > 1").collect()
    assert [r["image_id"] for r in kept] == ["noisy"]
