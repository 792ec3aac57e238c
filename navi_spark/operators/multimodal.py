"""Multimodal column processing: opaque binary payloads + typed metadata.

The ground table keeps media as `binary` columns with typed metadata
(w, h, fmt — input_hint). This module provides the Spark-side plumbing a
training-data pipeline needs over such columns — schema contracts, Arrow
batch shape, partition sizing — with the codec seam isolated:

  decode_images     real (navi_spark.sources.codec: PNG + stub lossy)
  resize_images     real (numpy area pooling / nearest upsample)
  image_features    real (8×8 luma thumbnail + channel stats → float vector)
  decode_audio      STUB — no audio libs in this container; raises
                    NotImplementedError behind the same mapInPandas plumbing
  sample_video_frames  STUB — same pattern for frame sampling

Arrow batch sizing: payload rows are fat (encoded bytes), so callers should
cap `spark.sql.execution.arrow.maxRecordsPerBatch` (e.g. 256) and size
`spark.sql.files.maxPartitionBytes` so a partition of encoded images fits
executor memory — at 100 TB the input partitioning, not the UDF, is the
lever that bounds peak memory.
"""

from __future__ import annotations

from typing import Iterator

import numpy as np
import pandas as pd
from pyspark.sql import DataFrame

from navi_spark.sources.codec import decode_image, encode_png

DECODED_SCHEMA = (
    "image_id string, w int, h int, fmt string, pixels binary, ok boolean"
)
RESIZED_SCHEMA = "image_id string, w int, h int, bytes binary"
FEATURES_SCHEMA = "image_id string, features array<float>"


def decode_images(images: DataFrame) -> DataFrame:
    """binary+fmt → raw RGB pixel buffer (h·w·3 uint8) + ok flag.

    One Arrow batch in, one out; decode failures flag ok=false instead of
    failing the task (a 100 TB crawl always contains corrupt payloads)."""

    def gen(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for b in batches:
            out = {"image_id": [], "w": [], "h": [], "fmt": [],
                   "pixels": [], "ok": []}
            for iid, data, fmt, w, h in zip(
                b["image_id"], b["bytes"], b["fmt"], b["w"], b["h"]
            ):
                try:
                    px = decode_image(bytes(data), fmt)
                    ok = px.shape == (int(h), int(w), 3)
                except Exception:
                    px, ok = np.zeros((0, 0, 3), np.uint8), False
                out["image_id"].append(iid)
                out["w"].append(int(w))
                out["h"].append(int(h))
                out["fmt"].append(fmt)
                out["pixels"].append(px.tobytes())
                out["ok"].append(ok)
            yield pd.DataFrame(out)

    return images.select("image_id", "bytes", "fmt", "w", "h").mapInPandas(
        gen, DECODED_SCHEMA
    )


def _resize(px: np.ndarray, tw: int, th: int) -> np.ndarray:
    """Deterministic area-mean downsample / nearest upsample (pure numpy)."""
    h, w, _ = px.shape
    if h % th == 0 and w % tw == 0:
        return (
            px.reshape(th, h // th, tw, w // tw, 3)
            .mean(axis=(1, 3))
            .astype(np.uint8)
        )
    yi = (np.arange(th) * h // th).clip(0, h - 1)
    xi = (np.arange(tw) * w // tw).clip(0, w - 1)
    return px[yi][:, xi]


def resize_images(images: DataFrame, tw: int, th: int) -> DataFrame:
    """Decode → resize → re-encode PNG; the canonical normalize-resolution
    stage of an image training pipeline."""

    def gen(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for b in batches:
            rows = []
            for iid, data, fmt in zip(b["image_id"], b["bytes"], b["fmt"]):
                try:
                    px = decode_image(bytes(data), fmt)
                    rows.append((iid, tw, th, encode_png(_resize(px, tw, th))))
                except Exception:
                    continue  # drop undecodable rows
            yield pd.DataFrame(rows, columns=["image_id", "w", "h", "bytes"])

    return images.select("image_id", "bytes", "fmt").mapInPandas(
        gen, RESIZED_SCHEMA
    )


def image_features(images: DataFrame) -> DataFrame:
    """64-dim luma thumbnail + 6 channel stats → 70-dim float vector.

    A deterministic stand-in for a real vision encoder with the same
    Spark contract (binary in, array<float> out) — swap the kernel for an
    ONNX/Torch call on a GPU cluster; the plan shape stays identical."""

    def gen(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for b in batches:
            ids, feats = [], []
            for iid, data, fmt in zip(b["image_id"], b["bytes"], b["fmt"]):
                try:
                    px = decode_image(bytes(data), fmt).astype(np.float32)
                except Exception:
                    continue
                luma = px.mean(axis=2)
                thumb = _resize(
                    luma[:, :, None].repeat(3, axis=2).astype(np.uint8), 8, 8
                )[:, :, 0].astype(np.float32) / 255.0
                stats = np.concatenate(
                    [px.mean(axis=(0, 1)) / 255.0, px.std(axis=(0, 1)) / 255.0]
                )
                ids.append(iid)
                feats.append(np.concatenate([thumb.reshape(-1), stats])
                             .astype(np.float32).tolist())
            yield pd.DataFrame({"image_id": ids, "features": feats})

    return images.select("image_id", "bytes", "fmt").mapInPandas(
        gen, FEATURES_SCHEMA
    )


def decode_audio(audio: DataFrame, sample_rate: int = 16000) -> DataFrame:
    """STUB: audio decode (no libsndfile/ffmpeg in this container).

    The plumbing contract is real — (audio_id, bytes, codec) in,
    (audio_id, pcm binary, n_samples) out via mapInPandas — only the codec
    kernel raises. Wire a real decoder on a cluster with the libs."""

    def gen(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        raise NotImplementedError(
            "audio decode requires an audio codec library not present "
            "in this environment; plug a decoder into decode_audio.gen"
        )
        yield  # pragma: no cover — marks gen as a generator

    return audio.select("audio_id", "bytes", "codec").mapInPandas(
        gen, "audio_id string, pcm binary, n_samples long"
    )


def sample_video_frames(video: DataFrame, every_n: int = 30) -> DataFrame:
    """STUB: video frame sampling (no ffmpeg in this container); same
    real-plumbing/stub-kernel pattern as decode_audio."""

    def gen(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        raise NotImplementedError(
            "video frame sampling requires ffmpeg-like bindings not "
            "present in this environment"
        )
        yield  # pragma: no cover — marks gen as a generator

    return video.select("video_id", "bytes", "container").mapInPandas(
        gen, "video_id string, frame_idx long, frame_png binary"
    )
