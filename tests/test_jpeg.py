"""Baseline JPEG codec (ITU-T T.81) — VERDICT r6 ask #5.

The oracle gate (multimodal_jpeg_roundtrip) pins the lossless
block-constant class; this suite enforces everything else: general
lossy fidelity (PSNR bounds on smooth content — JPEG's design case),
bounded worst-case error, marker/wire structure, restart-marker
recovery, the 4:2:0 color path with chroma upsampling, dimension
edge cases (non-multiples of 8/16), and loud failure on inputs the
decoder must not silently mangle (progressive SOF2, truncated data).
"""

from __future__ import annotations

import numpy as np
import pytest

from reair_spark.datapipe.jpeg import (
    QTABLE_DC_EXACT,
    QTABLE_LUMA,
    jpeg_decode,
    jpeg_encode_gray,
    jpeg_encode_rgb,
)


def _psnr(a, b) -> float:
    mse = ((a.astype(float) - b.astype(float)) ** 2).mean()
    return 10 * np.log10(255**2 / (mse + 1e-12))


def _smooth(h, w):
    xx, yy = np.meshgrid(np.arange(w), np.arange(h))
    return ((np.sin(xx / 9.0) + np.cos(yy / 7.0)) * 60 + 128).astype(np.uint8)


def test_block_constant_class_is_exact():
    """The gate's contract: constant 8×8 blocks + DC=8 quantizer
    roundtrip bit-exactly (zero AC energy; 8·(v−128) divides by 8)."""
    rng = np.random.RandomState(11)
    vals = rng.randint(0, 256, size=(9, 13), dtype=np.uint8)
    img = np.repeat(np.repeat(vals, 8, axis=0), 8, axis=1)
    out = jpeg_decode(jpeg_encode_gray(img, QTABLE_DC_EXACT))
    assert out.dtype == np.uint8 and np.array_equal(out, img)


def test_smooth_gray_psnr_and_odd_dimensions():
    """Lossy path on smooth content at several non-8-multiple sizes:
    decoded dims match the SOF dims exactly (edge padding cropped) and
    PSNR stays above 40 dB — normal baseline-JPEG territory."""
    for h, w in [(48, 64), (41, 67), (8, 8), (17, 9)]:
        img = _smooth(h, w)
        out = jpeg_decode(jpeg_encode_gray(img))
        assert out.shape == (h, w)
        assert _psnr(out, img) > 40, (h, w)


def test_random_noise_error_is_bounded():
    """Worst-case content (uniform noise): still no crash, right dims,
    and error bounded well below full-scale (the Annex K table
    quantizes high frequencies hard; 120 is ~half of full scale)."""
    rng = np.random.RandomState(3)
    img = rng.randint(0, 256, size=(40, 48), dtype=np.uint8)
    out = jpeg_decode(jpeg_encode_gray(img))
    assert out.shape == img.shape
    assert np.abs(out.astype(int) - img.astype(int)).max() < 120


def test_dc_only_gradient_exercises_dc_prediction_chain():
    """A per-block-constant gradient makes every DC diff nonzero in
    both signs — any error in the differential chain or the
    one's-complement negative encoding shifts whole blocks."""
    vals = (np.arange(64, dtype=np.int64) * 37 % 256).astype(np.uint8)
    img = np.repeat(np.repeat(vals.reshape(8, 8), 8, 0), 8, 1)
    out = jpeg_decode(jpeg_encode_gray(img, QTABLE_DC_EXACT))
    assert np.array_equal(out, img)


@pytest.mark.parametrize("ri", [1, 3, 7, 25])
def test_restart_markers_roundtrip(ri):
    """DRI/RSTn: predictor + byte alignment reset every ri MCUs; the
    decoder resynchronizes at each marker. (ri < 54 blocks so at
    least one RSTn actually lands between chunks.)"""
    rng = np.random.RandomState(5)
    vals = rng.randint(0, 256, size=(6, 9), dtype=np.uint8)
    img = np.repeat(np.repeat(vals, 8, 0), 8, 1)
    enc = jpeg_encode_gray(img, QTABLE_DC_EXACT, restart_interval=ri)
    assert any(
        enc[i] == 0xFF and 0xD0 <= enc[i + 1] <= 0xD7
        for i in range(len(enc) - 1)
    )
    assert np.array_equal(jpeg_decode(enc), img)


def test_color_420_roundtrip_psnr_and_chroma_upsampling():
    """4:2:0 color: YCbCr conversion, 2×2 chroma subsampling on the
    way in, nearest-neighbor upsampling + YCbCr→RGB on the way out.
    Smooth chroma content survives above 30 dB; dims exact."""
    h, w = 50, 70  # not multiples of 16: exercises MCU padding + crop
    xx, yy = np.meshgrid(np.arange(w), np.arange(h))
    rgb = np.stack([
        ((np.sin(xx / 8.0)) * 100 + 128).astype(np.uint8),
        ((np.cos(yy / 6.0)) * 100 + 128).astype(np.uint8),
        np.full((h, w), 90, np.uint8),
    ], axis=-1)
    out = jpeg_decode(jpeg_encode_rgb(rgb))
    assert out.shape == (h, w, 3)
    assert _psnr(out, rgb) > 30


def test_gray_color_consistency():
    """A gray RGB image decodes to (nearly) equal channels — the
    color matrix pair is consistent both ways."""
    img = _smooth(32, 32)
    rgb = np.stack([img, img, img], axis=-1)
    out = jpeg_decode(jpeg_encode_rgb(rgb))
    spread = np.abs(out.astype(int) - out[..., :1].astype(int)).max()
    assert spread <= 2  # channels agree to rounding


def test_wire_structure():
    """Marker framing: SOI/EOI bracket, JFIF APP0, DQT stored in
    zigzag order, SOF0 dims big-endian, entropy bytes stuffed."""
    img = _smooth(24, 40)
    enc = jpeg_encode_gray(img)
    assert enc[:2] == b"\xff\xd8" and enc[-2:] == b"\xff\xd9"
    assert b"JFIF\x00" in enc[:30]
    i = enc.find(b"\xff\xc0")
    assert i > 0
    h = int.from_bytes(enc[i + 5: i + 7], "big")
    w = int.from_bytes(enc[i + 7: i + 9], "big")
    assert (h, w) == (24, 40)
    # every 0xFF inside the entropy segment is stuffed or a marker
    sos_end = enc.find(b"\xff\xda") + 2 + int.from_bytes(
        enc[enc.find(b"\xff\xda") + 2: enc.find(b"\xff\xda") + 4], "big")
    body = enc[sos_end:-2]
    for j in range(len(body) - 1):
        if body[j] == 0xFF:
            assert body[j + 1] == 0x00 or 0xD0 <= body[j + 1] <= 0xD7


def test_rejects_non_baseline_and_garbage():
    img = _smooth(16, 16)
    enc = bytearray(jpeg_encode_gray(img))
    i = enc.find(b"\xff\xc0")
    enc[i + 1] = 0xC2  # pretend progressive
    with pytest.raises(ValueError, match="SOF2"):
        jpeg_decode(bytes(enc))
    with pytest.raises(ValueError, match="SOI"):
        jpeg_decode(b"not a jpeg at all")


def test_interops_with_pil_if_available():
    """When an imaging library IS present, our encoder's files decode
    identically in it (wire-format interop), and its encoder's files
    decode in ours. No-op in codec-less containers — the native-codec
    tests above still run everywhere."""
    PIL = pytest.importorskip("PIL.Image")
    import io

    img = np.repeat(np.repeat(
        np.arange(64, dtype=np.uint8).reshape(8, 8), 8, 0), 8, 1)
    theirs = np.asarray(PIL.open(io.BytesIO(
        jpeg_encode_gray(img, QTABLE_DC_EXACT))))
    assert np.array_equal(theirs, img)
