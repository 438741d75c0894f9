"""FLAC codec tests: exact roundtrips over every subframe/option
path, wire-structure checks, corruption detection, and compression
honesty. The oracle gate (multimodal_flac_roundtrip) covers the
Spark-side plumbing; these pin the codec itself."""

import hashlib

import numpy as np
import pytest

from reair_spark.datapipe.flac import (
    _crc8,
    _crc16,
    _utf8_decode_num,
    _utf8_encode_num,
    flac_decode,
    flac_encode,
)

RNG = np.random.RandomState(1234)

CASES = {
    "noise": RNG.randint(-32768, 32768, 5000).astype(np.int16),
    "sine": (3000 * np.sin(np.arange(5000) * 0.05)).astype(np.int16),
    "ramp": np.arange(-2000, 3000, dtype=np.int16),
    "const": np.full(2048, -123, np.int16),
    "empty": np.zeros(0, np.int16),
    "one": np.array([5], np.int16),
    "three": np.array([5, -9, 10000], np.int16),
    "exact_block": RNG.randint(-100, 100, 1024).astype(np.int16),
    "all_zero": np.zeros(777, np.int16),
    "extremes": np.array([-32768, 32767, -32768, 32767, 0], np.int16),
    "shifted": (RNG.randint(0, 128, 2000).astype(np.int16) * 256 - 16384),
}


@pytest.mark.parametrize("name", sorted(CASES))
@pytest.mark.parametrize(
    "kw",
    [
        {},
        {"partition_order": 2},
        {"block_size": 256, "partition_order": 2},
        {"method": "lpc"},
        {"force_escape": True},
    ],
    ids=["default", "po2", "bs256po2", "lpc", "escape"],
)
def test_roundtrip_exact(name, kw):
    x = CASES[name]
    rate, dec = flac_decode(flac_encode(x, **kw))
    assert rate == 8000
    assert dec.dtype == np.int16
    assert np.array_equal(dec, x)


def test_wire_structure():
    x = CASES["sine"]
    enc = flac_encode(x, rate=44100)
    assert enc[:4] == b"fLaC"
    assert enc[4] == 0x80  # last-metadata flag + STREAMINFO type 0
    assert int.from_bytes(enc[5:8], "big") == 34
    info = enc[8:42]
    # min/max block size fields
    assert int.from_bytes(info[0:2], "big") == 1024
    assert int.from_bytes(info[2:4], "big") == 1024
    # STREAMINFO MD5 is the real PCM digest
    assert info[18:34] == hashlib.md5(x.astype("<i2").tobytes()).digest()
    # first frame starts right after STREAMINFO with the 14-bit sync
    assert enc[42] == 0xFF and (enc[43] >> 2) == 0b111110
    rate, dec = flac_decode(enc)
    assert rate == 44100 and np.array_equal(dec, x)


def test_compression_real():
    """Smooth signals must genuinely compress; the gate's text-derived
    PCM (multiples of 256) must win the wasted-bits discount."""
    sine = CASES["sine"]
    assert len(flac_encode(sine)) < 0.25 * 2 * len(sine)
    text = (np.frombuffer(b"the quick brown fox " * 60, np.uint8)
            .astype(np.int16) - 96) * 256
    assert len(flac_encode(text, block_size=256)) < 0.6 * 2 * len(text)


def test_multiframe_and_short_last_block():
    x = RNG.randint(-500, 500, 1024 + 700).astype(np.int16)  # 2 frames
    enc = flac_encode(x)
    rate, dec = flac_decode(enc)
    assert np.array_equal(dec, x)
    # uncommon-blocksize form (last block of 700): n-1 fits in 16 bits
    x2 = RNG.randint(-500, 500, 50).astype(np.int16)
    assert np.array_equal(flac_decode(flac_encode(x2))[1], x2)


@pytest.mark.parametrize("where", ["header_crc", "body", "md5_region"])
def test_corruption_detected(where):
    x = CASES["sine"]
    enc = bytearray(flac_encode(x))
    if where == "header_crc":
        enc[46] ^= 0x01  # inside the first frame header
    elif where == "body":
        enc[len(enc) // 2] ^= 0x40
    else:
        enc[10] ^= 0xFF  # STREAMINFO min-frame region feeds nothing,
        enc[30] ^= 0x01  # but the MD5 bytes do
    with pytest.raises(ValueError):
        flac_decode(bytes(enc))


def test_verify_false_skips_crc():
    x = CASES["ramp"]
    enc = bytearray(flac_encode(x))
    enc[30] ^= 0x01  # corrupt a STREAMINFO MD5 byte only
    rate, dec = flac_decode(bytes(enc), verify=False)
    assert np.array_equal(dec, x)


def test_utf8_number_coding():
    for v in [0, 1, 0x7F, 0x80, 0x7FF, 0x800, 0xFFFF, 0x1FFFFF,
              0x3FFFFFF, 0x7FFFFFFF, (1 << 36) - 1]:
        b = _utf8_encode_num(v)
        got, pos = _utf8_decode_num(b, 0)
        assert got == v and pos == len(b)


def test_crc_vectors():
    # linearity/shift sanity + a couple of fixed points computed from
    # the polynomial definitions (MSB-first, init 0)
    assert _crc8(b"") == 0 and _crc16(b"") == 0
    assert _crc8(b"\x00") == 0 and _crc16(b"\x00") == 0
    assert _crc8(b"\x01") == 0x07
    assert _crc16(b"\x01") == 0x8005
    assert _crc8(b"123456789") == 0xF4   # CRC-8/SMBUS check value
    assert _crc16(b"123456789") == 0xFEE8  # CRC-16/BUYPASS check value


def test_streaminfo_total_and_rate_fields():
    x = RNG.randint(-10, 10, 3000).astype(np.int16)
    rate, dec = flac_decode(flac_encode(x, rate=16000, block_size=512))
    assert rate == 16000 and len(dec) == 3000


def test_decode_audio_real_sniffs_both_native_codecs():
    from reair_spark.datapipe.multimodal import (
        decode_audio_real,
        wav_encode,
    )

    x = CASES["sine"]
    rate, dec = decode_audio_real(wav_encode(x))
    assert rate == 8000 and np.array_equal(dec, x)
    rate, dec = decode_audio_real(flac_encode(x, rate=8000))
    assert rate == 8000 and np.array_equal(dec, x)
    with pytest.raises(NotImplementedError):
        decode_audio_real(b"ID3\x04...mp3 frame...")


def test_decoder_rejects_garbage():
    with pytest.raises(ValueError):
        flac_decode(b"RIFF1234")
    with pytest.raises(ValueError):
        flac_decode(b"fLaC" + b"\x80\x00\x00\x22" + b"\x00" * 34 + b"\xde\xad")
