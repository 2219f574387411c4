"""Baseline JPEG codec (ops/jpeg.py): round-trip pinning of the
decoder against the matching encoder, all sampling modes, marker
handling, and loud rejection of unsupported stream types."""

import numpy as np
import pytest

from cuely_spark.ops.jpeg import decode_jpeg, encode_jpeg


def _smooth(h, w, seed=0):
    yy, xx = np.mgrid[0:h, 0:w]
    return np.clip(np.stack([
        128 + 60 * np.sin(yy / 5 + seed),
        128 + 50 * np.cos(xx / 4 + seed),
        128 + 40 * np.sin((xx + yy) / 7 + seed)], axis=-1),
        0, 255).astype(np.uint8)


@pytest.mark.parametrize("h,w", [(8, 8), (16, 24), (29, 37), (7, 5)])
def test_roundtrip_444(h, w):
    img = _smooth(h, w)
    dec = decode_jpeg(encode_jpeg(img, quality=92))
    assert dec.shape == img.shape
    assert np.abs(dec.astype(int) - img.astype(int)).mean() < 3.0


def test_roundtrip_420_subsampled():
    img = _smooth(29, 37, seed=2)
    dec = decode_jpeg(encode_jpeg(img, quality=92, subsample=True))
    assert dec.shape == img.shape
    # chroma is box-averaged 2x2, so the bound is looser than 4:4:4
    assert np.abs(dec.astype(int) - img.astype(int)).mean() < 6.0


def test_roundtrip_grayscale():
    yy, xx = np.mgrid[0:21, 0:18]
    g = np.clip(128 + 80 * np.sin(yy / 4) * np.cos(xx / 3),
                0, 255).astype(np.uint8)
    dec = decode_jpeg(encode_jpeg(g, quality=95))
    assert dec.shape == (21, 18, 3)
    assert np.abs(dec[:, :, 0].astype(int) - g.astype(int)).mean() < 2.0
    assert (dec[:, :, 0] == dec[:, :, 1]).all()


def test_noise_image_survives_entropy_coding():
    """Random pixels maximize AC activity (exercises ZRL runs, high
    categories, and byte stuffing — 0xFF bytes appear in the stream)."""
    rng = np.random.default_rng(3)
    img = rng.integers(0, 256, size=(32, 32, 3), dtype=np.uint8)
    enc = encode_jpeg(img, quality=75)
    dec = decode_jpeg(enc)
    assert dec.shape == img.shape
    # lossy on noise, but bounded and deterministic
    assert np.abs(dec.astype(int) - img.astype(int)).mean() < 40

    flat = np.full((16, 16, 3), 255, dtype=np.uint8)
    assert (decode_jpeg(encode_jpeg(flat, quality=95))
            .astype(int) - 255 <= 2).all()


def test_quality_monotonic():
    img = _smooth(24, 24, seed=1)
    errs = []
    for q in (30, 60, 95):
        dec = decode_jpeg(encode_jpeg(img, quality=q))
        errs.append(np.abs(dec.astype(int) - img.astype(int)).mean())
    assert errs[0] >= errs[1] >= errs[2]


def test_rejects_non_baseline():
    img = _smooth(16, 16)
    enc = bytearray(encode_jpeg(img))
    # flip SOF0 (FFC0) to progressive SOF2 (FFC2)
    i = bytes(enc).find(b"\xff\xc0")
    enc[i + 1] = 0xC2
    with pytest.raises(ValueError, match="baseline"):
        decode_jpeg(bytes(enc))
    with pytest.raises(ValueError):
        decode_jpeg(b"\x00\x01\x02")


def test_multimodal_dispatch_uses_jpeg():
    from cuely_spark.ops.multimodal import _decode_image

    img = _smooth(12, 12)
    dec = _decode_image(encode_jpeg(img, quality=95), 12, 12)
    assert np.abs(dec.astype(int) - img.astype(int)).mean() < 3.0
