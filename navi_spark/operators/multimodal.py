"""Multimodal column processing: opaque binary payloads + typed metadata.

The ground table keeps media as `binary` columns with typed metadata
(w, h, fmt — input_hint). This module provides the Spark-side plumbing a
training-data pipeline needs over such columns — schema contracts, Arrow
batch shape, partition sizing — with the codec seam isolated:

  decode_images     real (navi_spark.sources.codec: PNG + stub lossy)
  resize_images     real (numpy area pooling / nearest upsample)
  image_features    real (8×8 luma thumbnail + channel stats → float vector)
  decode_audio      real (RIFF/WAVE PCM16 via stdlib `wave`; other codecs
                    flag ok=false — swap in libsndfile/ffmpeg on a cluster)
  sample_video_frames  real (NVID raw-frame container parse + PNG encode;
                    swap the parser for ffmpeg bindings on a cluster)

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


AUDIO_SCHEMA_OUT = (
    "audio_id string, sample_rate int, n_channels int, n_samples long, "
    "peak int, rms double, pcm binary, ok boolean"
)


def decode_audio(audio: DataFrame) -> DataFrame:
    """Audio decode: RIFF/WAVE PCM via the stdlib `wave` module (a real
    codec, no external libs) — (audio_id, bytes, codec) in; per-clip
    header fields, int16 PCM buffer and summary stats (peak, RMS in
    float64) out via mapInPandas. Non-WAV codecs and corrupt payloads flag
    ok=false instead of failing the task (a 100 TB corpus always contains
    undecodable rows). Swap the kernel for libsndfile/ffmpeg bindings on a
    cluster that has them; the Spark contract stays identical."""

    def gen(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        import io
        import wave as wave_mod

        for b in batches:
            out = {k: [] for k in ("audio_id", "sample_rate", "n_channels",
                                   "n_samples", "peak", "rms", "pcm", "ok")}
            for aid, data, codec in zip(b["audio_id"], b["bytes"], b["codec"]):
                sr = nch = 0
                n = peak = 0
                rms = 0.0
                pcm = b""
                ok = False
                try:
                    if codec != "wav":
                        raise ValueError(f"unsupported codec {codec}")
                    with wave_mod.open(io.BytesIO(bytes(data))) as w:
                        if w.getsampwidth() != 2:
                            raise ValueError("only PCM16 supported")
                        sr, nch = w.getframerate(), w.getnchannels()
                        n = w.getnframes()
                        pcm = w.readframes(n)
                    x = np.frombuffer(pcm, dtype="<i2")
                    if len(x):
                        peak = int(np.abs(x.astype(np.int32)).max())
                        rms = float(np.sqrt(np.mean(x.astype(np.float64) ** 2)))
                    ok = True
                except Exception:
                    sr = nch = n = peak = 0
                    rms, pcm = 0.0, b""
                out["audio_id"].append(aid)
                out["sample_rate"].append(sr)
                out["n_channels"].append(nch)
                out["n_samples"].append(n)
                out["peak"].append(peak)
                out["rms"].append(rms)
                out["pcm"].append(pcm)
                out["ok"].append(ok)
            yield pd.DataFrame(out)

    return audio.select("audio_id", "bytes", "codec").mapInPandas(
        gen, AUDIO_SCHEMA_OUT
    )


def sample_video_frames(video: DataFrame, every_n: int = 30) -> DataFrame:
    """Fixed-stride frame sampling over the NVID raw-frame container
    (navi_spark.sources.datagen.video_container_bytes: 'NVID' magic +
    n_frames/w/h uint32 LE header + RGB24 frames): emits every `every_n`-th
    frame re-encoded as PNG plus its mean pixel value. One input row fans
    out to ceil(n_frames/every_n) output rows — at scale, size the input
    partitions for the DECODED fan-out, not the container bytes. Corrupt
    containers are dropped, not fatal. Swap the parser for ffmpeg bindings
    on a cluster that has them; the contract stays identical."""
    from navi_spark.sources.codec import encode_png
    from navi_spark.sources.datagen import VIDEO_MAGIC

    def gen(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        import struct

        for b in batches:
            rows = []
            for vid, data, container in zip(
                b["video_id"], b["bytes"], b["container"]
            ):
                try:
                    if container != "nvid":
                        raise ValueError(f"unsupported container {container}")
                    raw = bytes(data)
                    if raw[:4] != VIDEO_MAGIC:
                        raise ValueError("bad magic")
                    n_frames, w, h = struct.unpack_from("<III", raw, 4)
                    fsz = w * h * 3
                    if len(raw) != 16 + n_frames * fsz:
                        raise ValueError("truncated container")
                    for j in range(0, n_frames, every_n):
                        off = 16 + j * fsz
                        px = np.frombuffer(
                            raw, dtype=np.uint8, count=fsz, offset=off
                        ).reshape(h, w, 3)
                        rows.append(
                            (vid, j, encode_png(px), float(px.mean()))
                        )
                except Exception:
                    continue  # drop undecodable containers
            yield pd.DataFrame(
                rows,
                columns=["video_id", "frame_idx", "frame_png", "mean_val"],
            )

    return video.select("video_id", "bytes", "container").mapInPandas(
        gen,
        "video_id string, frame_idx long, frame_png binary, mean_val double",
    )
