"""Deterministic image codec for the synthetic image+caption table.

The ground table (BASELINE.json input_hint) carries encoded image payloads:
``(image_id, bytes:binary, w, h, fmt in {png, jpeg}, caption, phash:int64)``.
This container has no image libraries (no PIL/opencv/libjpeg), so:

* ``png``  — a REAL minimal PNG codec (stdlib zlib): 8-bit RGB, filter 0.
  Any standard viewer can open these; decode is exact (lossless).
* ``jpeg`` — the lossy path is STUBBED with a deterministic stand-in codec
  ("NVLS"): channel quantization to multiples of 8 + zlib. Uniform
  quantization with step q=8 gives MSE ≈ q²/12 ≈ 5.33 → PSNR ≈ 40.9 dB,
  which genuinely exercises the per-row PSNR ≥ 40 dB lossy invariant from
  the input_hint. Swap ``_encode_lossy``/``_decode_lossy`` for a real JPEG
  codec on a cluster with libjpeg available — every caller goes through
  ``encode_image``/``decode_image`` so the seam is one function wide.

All functions are pure numpy on whole arrays — they are invoked from
Arrow-batched pandas UDFs (one call per row's ndarray, vectorized across the
pixel dimension), never from per-row Python UDFs over scalars.

Reference parity: the payload validation these feed (decoded-pixel allclose
+ PSNR + caption equality) stands in for the reference's HTTP fetch +
content-type/language gate (crawler/WebCrawler.java:175-230).
"""

from __future__ import annotations

import struct
import zlib

import numpy as np

_PNG_SIG = b"\x89PNG\r\n\x1a\n"
_LOSSY_MAGIC = b"NVLS"  # deterministic stand-in for JPEG (see module doc)
_LOSSY_Q = 8  # quantization step -> PSNR ~40.9 dB


def _png_chunk(tag: bytes, payload: bytes) -> bytes:
    return (
        struct.pack(">I", len(payload))
        + tag
        + payload
        + struct.pack(">I", zlib.crc32(tag + payload) & 0xFFFFFFFF)
    )


def encode_png(px: np.ndarray) -> bytes:
    """Encode an (h, w, 3) uint8 array as a real RGB8 PNG (filter type 0)."""
    h, w, _ = px.shape
    ihdr = struct.pack(">IIBBBBB", w, h, 8, 2, 0, 0, 0)
    raw = np.concatenate(
        [np.zeros((h, 1), np.uint8), px.reshape(h, w * 3)], axis=1
    ).tobytes()
    return (
        _PNG_SIG
        + _png_chunk(b"IHDR", ihdr)
        + _png_chunk(b"IDAT", zlib.compress(raw, 6))
        + _png_chunk(b"IEND", b"")
    )


def decode_png(data: bytes) -> np.ndarray:
    """Decode a filter-0 RGB8 PNG produced by :func:`encode_png`."""
    assert data[:8] == _PNG_SIG, "not a PNG"
    pos, idat, w, h = 8, b"", 0, 0
    while pos < len(data):
        (ln,) = struct.unpack(">I", data[pos : pos + 4])
        tag = data[pos + 4 : pos + 8]
        payload = data[pos + 8 : pos + 8 + ln]
        if tag == b"IHDR":
            w, h, bits, ctype = struct.unpack(">IIBB", payload[:10])
            assert bits == 8 and ctype == 2, "only RGB8 supported"
        elif tag == b"IDAT":
            idat += payload
        elif tag == b"IEND":
            break
        pos += 12 + ln
    raw = np.frombuffer(zlib.decompress(idat), np.uint8).reshape(h, w * 3 + 1)
    assert (raw[:, 0] == 0).all(), "only filter 0 supported"
    return raw[:, 1:].reshape(h, w, 3).copy()


def _encode_lossy(px: np.ndarray) -> bytes:
    """STUB lossy codec (JPEG stand-in): quantize channels to step 8 + zlib."""
    h, w, _ = px.shape
    q = (px.astype(np.int32) // _LOSSY_Q).astype(np.uint8)
    return _LOSSY_MAGIC + struct.pack(">II", w, h) + zlib.compress(q.tobytes(), 6)


def _decode_lossy(data: bytes) -> np.ndarray:
    assert data[:4] == _LOSSY_MAGIC, "not a NVLS payload"
    w, h = struct.unpack(">II", data[4:12])
    q = np.frombuffer(zlib.decompress(data[12:]), np.uint8).reshape(h, w, 3)
    # dequantize to bin centers (q*8 + 4), clipped to byte range
    return np.minimum(q.astype(np.int32) * _LOSSY_Q + _LOSSY_Q // 2, 255).astype(
        np.uint8
    )


def encode_image(px: np.ndarray, fmt: str) -> bytes:
    if fmt == "png":
        return encode_png(px)
    if fmt == "jpeg":
        return _encode_lossy(px)
    raise ValueError(f"unknown fmt {fmt!r}")


def decode_image(data: bytes, fmt: str) -> np.ndarray:
    if fmt == "png":
        return decode_png(data)
    if fmt == "jpeg":
        return _decode_lossy(data)
    raise ValueError(f"unknown fmt {fmt!r}")


def psnr(a: np.ndarray, b: np.ndarray) -> float:
    """Peak signal-to-noise ratio in dB between two uint8 images.

    Integer fast path, bit-identical to the float64 formula: uint8 diffs
    and their squares are exact integers (≤ 255² = 65025), and numpy's
    pairwise float64 mean of exactly-representable integers (sums ≤ 2^31
    per pair node, well under 2^53) is exact — so computing the squared
    diffs in int32 and handing ONLY the mean to float64 yields the same
    mse to the last bit while touching 4-byte ints instead of two 8-byte
    float copies (the validator runs this once per lossy fetch).
    """
    d = a.astype(np.int16) - b.astype(np.int16)
    sq = np.multiply(d, d, dtype=np.int32)
    mse = float(np.mean(sq, dtype=np.float64))
    if mse == 0.0:
        return float("inf")
    return 10.0 * np.log10(255.0**2 / mse)


def phash64(px: np.ndarray) -> int:
    """64-bit average perceptual hash (8×8 grayscale mean threshold).

    Stands in for the reference's MD5 content hash as the dedup key
    (crawler/HashingManager.java:21-33) — the survey maps `hashingDoc` to
    an int64 `phash` (SURVEY.md §1.5). Returned as a SIGNED int64 so it
    stores directly in a LongType column.
    """
    gray = px.astype(np.float64).mean(axis=2)
    h, w = gray.shape
    # average-pool to 8x8 (sizes here are multiples of 8: 16/32/64)
    bh, bw = h // 8, w // 8
    small = gray[: bh * 8, : bw * 8].reshape(8, bh, 8, bw).mean(axis=(1, 3))
    bits = (small > small.mean()).flatten()
    val = 0
    for bit in bits:
        val = (val << 1) | int(bit)
    return val - (1 << 64) if val >= (1 << 63) else val


# Per-shape cache of the id-INDEPENDENT channel sinusoids
# 15·sin(2π(x+y)/(w+h)·c): the validator regenerates the ground-truth
# pattern for every fetched image (once or twice per row), and profiling
# showed make_pixels — not the decode — dominating the wave's python
# stage (~130-270 µs/image, 5 full-array float64 trig evaluations). Only
# 9 (w, h) shapes exist (_SIZES products), so these terms amortize to
# zero; ≤ 9·3 64×64 float64 arrays ≈ 100 KB per worker.
_XY_TERM_CACHE: dict[tuple[int, int], tuple[np.ndarray, ...]] = {}


def _xy_terms(w: int, h: int) -> tuple[np.ndarray, ...]:
    key = (w, h)
    terms = _XY_TERM_CACHE.get(key)
    if terms is None:
        yy, xx = np.mgrid[0:h, 0:w].astype(np.float64)
        terms = tuple(
            15 * np.sin(2 * np.pi * (xx + yy) / (w + h) * c)
            for c in (1.0, 2.0, 3.0)
        )
        _XY_TERM_CACHE[key] = terms
    return terms


def make_pixels(image_id: str, w: int, h: int, dup_of: str | None = None) -> np.ndarray:
    """Deterministic seeded pixel pattern for an image_id.

    Smooth gradient + per-image sinusoid, so the lossy quantization noise is
    well distributed (keeps PSNR in the 40-41 dB band). ``dup_of`` forces the
    pattern of another image_id — used to inject exact pixel duplicates
    (~2% of rows, FIXTURES.md §1) that exercise phash dedup (C15).

    The formula is separable, so the id-dependent trig runs on 1-D x/y
    vectors and broadcasts (each element sees the exact same float64
    input as the original full-array form, so outputs are bit-identical —
    asserted against the frozen naive implementation across every shape
    in tests/test_codec_parity.py), the id-independent diagonal term
    comes from the per-shape cache above, and channels are written
    straight into the uint8 output (same per-element C cast as the old
    stack().astype()). ~2.4× per image; rng draw order is unchanged.
    """
    key = dup_of if dup_of is not None else image_id
    seed = zlib.crc32(key.encode()) & 0xFFFFFFFF
    rng = np.random.default_rng(seed)
    fx, fy, phase = rng.uniform(0.5, 4.0, 2).tolist() + [rng.uniform(0, 6.28)]
    x = np.arange(w, dtype=np.float64)
    y = np.arange(h, dtype=np.float64)
    sx = 60 * np.sin(2 * np.pi * fx * x / w + phase)
    cy = 60 * np.cos(2 * np.pi * fy * y / h)
    # same elementwise order as the original: (128 + sin-term) + cos-term
    base = (128 + np.broadcast_to(sx, (h, w))) + cy[:, None]
    xyt = _xy_terms(w, h)
    out = np.empty((h, w, 3), dtype=np.uint8)
    for i in range(3):
        out[:, :, i] = np.clip(base + rng.uniform(-30, 30) + xyt[i], 0, 255)
    return out


def make_pixels_batch(keys: list[str], w: int, h: int) -> np.ndarray:
    """(B, h, w, 3) uint8 — :func:`make_pixels` for a same-shape batch
    (optimization round 6, guide §4.2): the per-image trig/clip chains run
    as one broadcasted array op over the whole batch instead of B small
    ones. Elementwise arithmetic, operand order and the per-row rng draw
    order are identical to the scalar kernel, so outputs are bit-identical
    (asserted in tests/test_codec_parity.py); only the rng draws remain a
    per-row loop (seeded per image id)."""
    b = len(keys)
    fx = np.empty(b)
    fy = np.empty(b)
    phase = np.empty(b)
    offs = np.empty((b, 3))
    for r, key in enumerate(keys):
        rng = np.random.default_rng(zlib.crc32(key.encode()) & 0xFFFFFFFF)
        fx[r], fy[r] = rng.uniform(0.5, 4.0, 2)
        phase[r] = rng.uniform(0, 6.28)
        offs[r] = [rng.uniform(-30, 30) for _ in range(3)]
    x = np.arange(w, dtype=np.float64)
    y = np.arange(h, dtype=np.float64)
    sx = 60 * np.sin(2 * np.pi * fx[:, None] * x[None, :] / w
                     + phase[:, None])                       # (B, w)
    cy = 60 * np.cos(2 * np.pi * fy[:, None] * y[None, :] / h)  # (B, h)
    base = (128 + sx[:, None, :]) + cy[:, :, None]           # (B, h, w)
    xyt = _xy_terms(w, h)
    out = np.empty((b, h, w, 3), dtype=np.uint8)
    for i in range(3):
        out[:, :, :, i] = np.clip(
            base + offs[:, i, None, None] + xyt[i], 0, 255
        )
    return out


def phash64_batch(pxs: np.ndarray) -> np.ndarray:
    """int64 (B,) — :func:`phash64` for a (B, h, w, 3) batch: pooling and
    the 64-bit pack run vectorized (the scalar kernel's per-bit Python
    shift loop alone is ~60 µs/row). Same mean/threshold arithmetic; the
    big-endian packbits matches the MSB-first shift order."""
    gray = pxs.astype(np.float64).mean(axis=3)               # (B, h, w)
    b, h, w = gray.shape
    bh, bw = h // 8, w // 8
    small = gray[:, : bh * 8, : bw * 8].reshape(
        b, 8, bh, 8, bw).mean(axis=(2, 4))                   # (B, 8, 8)
    bits = small > small.mean(axis=(1, 2))[:, None, None]
    packed = np.packbits(bits.reshape(b, 64), axis=1)        # (B, 8) uint8
    return (
        np.frombuffer(np.ascontiguousarray(packed).tobytes(), dtype=">u8")
        .astype(np.uint64)
        .view(np.int64)
        .copy()
    )
