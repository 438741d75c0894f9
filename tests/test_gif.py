"""GIF codec tests: exact LZW roundtrips (width growth, table-full
CLEAR, interlace), wire structure, and — the cross-implementation
pin — decoding REAL giflib/ImageMagick-era files shipped with the OS.
A width-convention desync corrupts the code stream within one code of
a 2^n boundary, so real-file decodes to the exact pixel count are
strong evidence the late-change convention is right."""

import glob

import numpy as np
import pytest

from reair_spark.datapipe.gif import (
    _lzw_decode,
    _lzw_encode,
    gif_decode,
    gif_encode,
)

RNG = np.random.RandomState(99)

CASES = {
    "noise": RNG.randint(0, 256, (37, 53)).astype(np.uint8),
    "const": np.full((20, 20), 7, np.uint8),
    "gradient": np.tile(np.arange(256, dtype=np.uint8), (10, 1)),
    "tiny": np.array([[1]], np.uint8),
    "text": np.frombuffer((b"hello gif codec " * 64)[:1024], np.uint8).reshape(32, 32),
    # low-cardinality big image: long LZW chains, width growth to 12
    "big_runs": RNG.randint(0, 4, (200, 300)).astype(np.uint8),
    # high-entropy big image: forces the table-full CLEAR/reset path
    "big_noise": RNG.randint(0, 256, (150, 150)).astype(np.uint8),
}


@pytest.mark.parametrize("name", sorted(CASES))
@pytest.mark.parametrize("interlace", [False, True], ids=["seq", "interlaced"])
def test_roundtrip_exact(name, interlace):
    img = CASES[name]
    dec = gif_decode(gif_encode(img, interlace=interlace))
    assert dec.shape == img.shape
    assert np.array_equal(dec, img)


def test_wire_structure():
    img = CASES["text"]
    enc = gif_encode(img)
    assert enc[:6] == b"GIF89a"
    assert int.from_bytes(enc[6:8], "little") == 32   # width
    assert int.from_bytes(enc[8:10], "little") == 32  # height
    assert enc[10] & 0x80                             # global color table
    assert enc[-1] == 0x3B                            # trailer
    # gray-ramp palette: entry i is (i, i, i)
    pal = enc[13:13 + 768]
    assert pal[3 * 100:3 * 100 + 3] == bytes([100, 100, 100])


def test_compression_real():
    """Low-entropy images must genuinely compress."""
    img = CASES["big_runs"]
    assert len(gif_encode(img)) < 0.4 * img.size


def test_lzw_primitives():
    for data in [b"", b"\x00", b"TOBEORNOTTOBEORTOBEORNOT" * 40,
                 bytes(RNG.randint(0, 256, 5000))]:
        enc = _lzw_encode(data, 8)
        assert _lzw_decode(enc, 8, len(data)) == data


def test_decode_rejects_garbage():
    with pytest.raises(ValueError):
        gif_decode(b"NOTAGIF....")
    with pytest.raises(ValueError):
        gif_decode(b"GIF89a" + b"\x00" * 7 + b"\x3b")  # trailer, no image


SYSTEM_GIFS = sorted(glob.glob("/usr/share/doc/*/html/*.gif"))


@pytest.mark.skipif(not SYSTEM_GIFS, reason="no system sample GIFs")
def test_decodes_real_world_files():
    """Decode every GIF the OS ships (real giflib-era encoders,
    extension blocks, varied palettes). Success = the LZW stream
    yields exactly width*height pixels — a desync anywhere would
    produce bad codes or a short stream."""
    decoded = 0
    for path in SYSTEM_GIFS[:20]:
        with open(path, "rb") as fh:
            img = gif_decode(fh.read())
        assert img.dtype == np.uint8 and img.size > 0
        decoded += 1
    assert decoded >= 1
