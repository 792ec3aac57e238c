"""Multimodal column plumbing: decode / resize / features real; audio &
video kernels real: stdlib-WAV decode, NVID frame sampling."""

from __future__ import annotations

import numpy as np
import pytest

from navi_spark.operators import multimodal
from navi_spark.sources.codec import decode_png
from navi_spark.sources.datagen import generate_images


@pytest.fixture(scope="module")
def images(spark):
    df = generate_images(spark, 60, parts=2).cache()
    df.count()
    return df


def test_decode_images(images):
    out = multimodal.decode_images(images).collect()
    assert len(out) == 60 and all(r["ok"] for r in out)
    r = out[0]
    px = np.frombuffer(bytes(r["pixels"]), np.uint8)
    assert px.size == r["w"] * r["h"] * 3


def test_decode_flags_corrupt_rows(spark, images):
    import pyspark.sql.functions as F

    corrupt = images.limit(3).withColumn(
        "bytes", F.lit(b"not an image").cast("binary")
    )
    out = multimodal.decode_images(corrupt).collect()
    assert len(out) == 3 and not any(r["ok"] for r in out)


def test_resize_images(images):
    out = multimodal.resize_images(images, 16, 16).collect()
    assert len(out) == 60
    for r in out[:5]:
        px = decode_png(bytes(r["bytes"]))
        assert px.shape == (16, 16, 3)


def test_image_features(images):
    out = multimodal.image_features(images).collect()
    assert len(out) == 60
    feats = np.array([r["features"] for r in out], dtype=np.float32)
    assert feats.shape == (60, 70)
    assert np.isfinite(feats).all()
    assert (feats[:, :64] >= 0).all() and (feats[:, :64] <= 1).all()


def test_audio_decode_roundtrip(spark):
    """WAV PCM16 decode via stdlib wave: header fields, sample counts and
    the square wave's exact peak/RMS (= amplitude) all round-trip; corrupt
    payloads and foreign codecs flag ok=false instead of failing."""
    from navi_spark.sources import datagen

    audio = datagen.generate_audio(spark, 20, parts=4)
    bad = spark.createDataFrame(
        [("abad1", b"\x00\x01", "wav"), ("abad2", b"RIFFjunk", "mp3")],
        "audio_id string, bytes binary, codec string",
    )
    out = {
        r["audio_id"]: r
        for r in multimodal.decode_audio(
            audio.select("audio_id", "bytes", "codec").unionByName(bad)
        ).collect()
    }
    assert len(out) == 22
    for i in range(20):
        n, amp = datagen.audio_params(i)
        r = out[f"aud{i:08d}"]
        assert r["ok"] and r["sample_rate"] == datagen.AUDIO_SAMPLE_RATE
        assert r["n_channels"] == 1 and r["n_samples"] == n
        assert r["peak"] == amp and r["rms"] == float(amp)
        x = np.frombuffer(r["pcm"], dtype="<i2")
        assert len(x) == n and x[0] == amp and x[1] == -amp
    assert not out["abad1"]["ok"] and not out["abad2"]["ok"]


def test_video_frame_sampling_roundtrip(spark):
    """NVID container parse + stride sampling: frame indices are the
    every_n multiples below n_frames, each sampled frame PNG-decodes back
    to its constant pixel value; corrupt containers are dropped."""
    from navi_spark.sources import datagen
    from navi_spark.sources.codec import decode_image

    every_n = 3
    video = datagen.generate_video(spark, 12, parts=4)
    bad = spark.createDataFrame(
        [("vbad", b"XXXX\x00\x01", "nvid"), ("vmp4", b"NVID", "mp4")],
        "video_id string, bytes binary, container string",
    )
    rows = multimodal.sample_video_frames(
        video.unionByName(bad), every_n=every_n
    ).collect()
    got = {(r["video_id"], r["frame_idx"]) for r in rows}
    want = {
        (f"vid{i:08d}", j)
        for i in range(12)
        for j in range(0, datagen.video_params(i), every_n)
    }
    assert got == want
    for r in rows:
        i = int(r["video_id"][3:])
        v = datagen.video_frame_value(i, r["frame_idx"])
        assert r["mean_val"] == float(v)
        px = decode_image(bytes(r["frame_png"]), "png")
        assert px.shape == (datagen.VIDEO_H, datagen.VIDEO_W, 3)
        assert (px == v).all()
