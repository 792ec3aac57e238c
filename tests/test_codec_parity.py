"""Bit-parity pin for the optimized codec hot path.

`make_pixels` is the validator's ground-truth regeneration — it runs once
or twice per fetched image inside the wave's dominant python stage, and
round 5 rewrote it from 5 full-array float64 trig evaluations to
separable 1-D trig + a per-shape cache of the id-independent diagonal
term. The stored synthetic stores (payload bytes, phash columns, oracle
fixtures) all derive from the ORIGINAL formula, so the optimization must
be bit-identical, not merely close: this file freezes the naive
implementation and asserts exact equality across every shape the data
generator and tests use, dup_of paths included. Same for the integer
`psnr` fast path vs the float64 formula.
"""

from __future__ import annotations

import zlib

import numpy as np

from navi_spark.sources.codec import (
    decode_image,
    encode_image,
    make_pixels,
    psnr,
)


def _naive_make_pixels(image_id: str, w: int, h: int,
                       dup_of: str | None = None) -> np.ndarray:
    """The pre-round-5 implementation, frozen verbatim as the oracle."""
    key = dup_of if dup_of is not None else image_id
    seed = zlib.crc32(key.encode()) & 0xFFFFFFFF
    rng = np.random.default_rng(seed)
    fx, fy, phase = rng.uniform(0.5, 4.0, 2).tolist() + [rng.uniform(0, 6.28)]
    yy, xx = np.mgrid[0:h, 0:w].astype(np.float64)
    base = (
        128
        + 60 * np.sin(2 * np.pi * fx * xx / w + phase)
        + 60 * np.cos(2 * np.pi * fy * yy / h)
    )
    chans = [
        np.clip(
            base + rng.uniform(-30, 30)
            + 15 * np.sin(2 * np.pi * (xx + yy) / (w + h) * c),
            0, 255,
        )
        for c in (1.0, 2.0, 3.0)
    ]
    return np.stack(chans, axis=2).astype(np.uint8)


def _naive_psnr(a: np.ndarray, b: np.ndarray) -> float:
    mse = float(np.mean((a.astype(np.float64) - b.astype(np.float64)) ** 2))
    if mse == 0.0:
        return float("inf")
    return 10.0 * np.log10(255.0**2 / mse)


def test_make_pixels_bit_parity_all_shapes():
    # datagen shapes (_SIZES products) + the odd/non-multiple shapes other
    # tests exercise; many ids per shape so every trig phase region is hit
    shapes = [(w, h) for w in (16, 32, 64) for h in (16, 32, 64)]
    shapes += [(48, 32), (17, 33), (24, 64)]
    for w, h in shapes:
        for i in range(0, 300, 7):
            iid = f"img{i:010d}"
            assert np.array_equal(
                make_pixels(iid, w, h), _naive_make_pixels(iid, w, h)
            ), (w, h, iid)


def test_make_pixels_bit_parity_dup_paths():
    for w, h in ((16, 64), (32, 32), (64, 16)):
        for i in (57, 83, 157, 183, 1057):
            iid = f"img{i:010d}"
            src = f"img{i - 50:010d}"
            assert np.array_equal(
                make_pixels(iid, w, h, dup_of=src),
                _naive_make_pixels(iid, w, h, dup_of=src),
            ), (w, h, iid)


def test_psnr_bit_parity_and_fastpath():
    for i in range(40):
        px = make_pixels(f"img{i:010d}", 32, 48)
        dec = decode_image(encode_image(px, "jpeg"), "jpeg")
        assert psnr(px, dec) == _naive_psnr(px, dec)
    # exact-equal images: both forms return +inf
    px = make_pixels("imgX", 16, 16)
    assert psnr(px, px) == float("inf") == _naive_psnr(px, px)


def test_batched_pixel_and_phash_kernels_bit_identical():
    """r06: make_pixels_batch / phash64_batch must reproduce the scalar
    kernels bit-for-bit across every (w, h) fixture shape."""
    import itertools

    import numpy as np

    from navi_spark.sources.codec import (
        make_pixels,
        make_pixels_batch,
        phash64,
        phash64_batch,
    )

    for w, h in itertools.product((16, 32, 64), repeat=2):
        keys = [f"img{i:010d}" for i in range(0, 220, 11)]
        bx = make_pixels_batch(keys, w, h)
        ph = phash64_batch(bx)
        for r, k in enumerate(keys):
            px = make_pixels(k, w, h)
            assert np.array_equal(bx[r], px), (w, h, k)
            assert int(ph[r]) == phash64(px), (w, h, k)
