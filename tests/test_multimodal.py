"""Multimodal column plumbing: decode / resize / features real; audio &
video kernels stubbed but with real Spark contracts."""

from __future__ import annotations

import numpy as np
import pytest
from pyspark.sql.utils import PythonException

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


def test_audio_video_stubs_raise(spark):
    audio = spark.createDataFrame(
        [("a0", b"\x00\x01", "wav")], "audio_id string, bytes binary, codec string"
    )
    with pytest.raises(PythonException, match="NotImplementedError"):
        multimodal.decode_audio(audio).collect()
    video = spark.createDataFrame(
        [("v0", b"\x00\x01", "mp4")],
        "video_id string, bytes binary, container string",
    )
    with pytest.raises(PythonException, match="NotImplementedError"):
        multimodal.sample_video_frames(video).collect()
