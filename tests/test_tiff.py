"""Baseline TIFF codec tests: exact roundtrips over compression
none/LZW/LZW+predictor, wire structure, the LZW early-change width
convention (pinned against GIF's late change — the two flavors must
NOT be interchangeable), and garbage rejection."""

import numpy as np
import pytest

from reair_spark.datapipe.tiff import (
    _lzw_decode,
    _lzw_encode,
    tiff_decode,
    tiff_encode,
)

RNG = np.random.RandomState(42)

CASES = {
    "noise": RNG.randint(0, 256, (37, 53)).astype(np.uint8),
    "const": np.full((20, 20), 7, np.uint8),
    "gradient": np.tile(np.arange(256, dtype=np.uint8), (10, 1)),
    "tiny": np.array([[1]], np.uint8),
    "text": np.frombuffer((b"baseline tiff 6.0 " * 57)[:1024], np.uint8).reshape(32, 32),
    "big_runs": RNG.randint(0, 4, (200, 300)).astype(np.uint8),
    "big_noise": RNG.randint(0, 256, (150, 150)).astype(np.uint8),
}


@pytest.mark.parametrize("name", sorted(CASES))
@pytest.mark.parametrize(
    "kw",
    [{"compression": 1}, {"compression": 5},
     {"compression": 5, "predictor": True}],
    ids=["none", "lzw", "lzw+pred"],
)
def test_roundtrip_exact(name, kw):
    img = CASES[name]
    dec = tiff_decode(tiff_encode(img, **kw))
    assert dec.shape == img.shape
    assert np.array_equal(dec, img)


def test_wire_structure():
    img = CASES["text"]
    enc = tiff_encode(img, compression=1)
    assert enc[:4] == b"II*\x00"
    # uncompressed single strip: last h*w bytes are the raw pixels
    assert enc[-img.size:] == img.tobytes()
    dec = tiff_decode(enc)
    assert np.array_equal(dec, img)


def test_lzw_primitives_incl_clear_boundary():
    for data in [b"", b"\x00", b"TOBEORNOT" * 300,
                 bytes(RNG.randint(0, 256, 100000)),  # crosses 4094 clears
                 bytes(RNG.randint(0, 3, 50000))]:
        assert _lzw_decode(_lzw_encode(data), len(data)) == data


def test_predictor_compresses_gradients():
    g = CASES["gradient"]
    plain = len(tiff_encode(g, compression=5))
    pred = len(tiff_encode(g, compression=5, predictor=True))
    assert pred < plain / 2  # differencing flattens ramps to constants


def test_lzw_flavors_are_not_interchangeable():
    """TIFF LZW (MSB-first, early change) and GIF LZW (LSB-first,
    late change) must disagree — if they ever produced the same bytes
    the width-convention handling would be suspect."""
    from reair_spark.datapipe.gif import _lzw_encode as gif_encode_lzw

    data = b"TOBEORNOTTOBEORTOBEORNOT" * 30
    assert _lzw_encode(data) != gif_encode_lzw(data, 8)


def test_decode_rejects_garbage():
    with pytest.raises(ValueError):
        tiff_decode(b"PK\x03\x04....")
    img = CASES["tiny"]
    enc = bytearray(tiff_encode(img, compression=5))
    enc[2] = 99  # wrong magic
    with pytest.raises(ValueError):
        tiff_decode(bytes(enc))
