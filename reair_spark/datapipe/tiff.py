"""Baseline TIFF 6.0 codec in pure stdlib + numpy — no imaging
library.

Completes the from-spec raster-codec series (PNG r6; JPEG, FLAC, GIF
r7): with TIFF implemented, the external-library image gate narrows
to WebP alone — which genuinely requires a VP8 implementation and is
the defensible boundary of from-spec work.

encoder (8-bit grayscale, little-endian, single strip):
  - classic header (II, magic 42), one IFD with the baseline
    grayscale tag set (ImageWidth/ImageLength/BitsPerSample/
    Compression/Photometric/StripOffsets/SamplesPerPixel/RowsPerStrip/
    StripByteCounts),
  - Compression 1 (none) or 5 (TIFF-flavor LZW: MSB-first bit
    packing, EARLY code-width change at 2^n − 1 — the documented
    difference from GIF's late change — ClearCode 256, EOI 257,
    table cleared at 4094 per the spec's reference algorithm),
  - optional Predictor 2 (horizontal differencing before LZW).

decoder (any baseline file our scope emits, plus the general cases):
  - both byte orders (II/MM), IFD walk with out-of-line values,
  - multi-strip assembly (RowsPerStrip), Compression 1 and 5,
    Predictor 1/2 undo, 8-bit grayscale and RGB (SamplesPerPixel 3),
  - returns (h, w) gray or (h, w, 3) RGB uint8.

LZW is code-serial; per-image loops are dict-walk Python (documents-
rasterization sized), everything else numpy.
"""

from __future__ import annotations

import numpy as np

_CLEAR = 256
_EOI = 257
_FIRST_FREE = 258
_TIFF_TABLE_CLEAR_AT = 4094  # spec reference impl clears at 4094


# ---------------------------------------------------------------------------
# TIFF-flavor LZW (MSB-first, early change)
# ---------------------------------------------------------------------------


def _lzw_encode(data: bytes) -> bytes:
    out = bytearray()
    acc = 0
    nbits = 0

    def emit(code: int, width: int) -> None:
        nonlocal acc, nbits
        acc = (acc << width) | code
        nbits += width
        while nbits >= 8:
            nbits -= 8
            out.append((acc >> nbits) & 0xFF)

    table: dict[bytes, int] = {bytes([i]): i for i in range(256)}
    next_code = _FIRST_FREE
    width = 9
    emit(_CLEAR, width)
    w = b""
    for b in data:
        wk = w + bytes([b])
        if wk in table:
            w = wk
            continue
        emit(table[w], width)
        table[wk] = next_code
        next_code += 1
        # EARLY change: the width bumps as soon as the NEXT allocation
        # would be 2^width − 1 (TIFF 6.0 §LZW "because of the
        # off-by-one problem")
        if next_code == (1 << width) - 1 and width < 12:
            width += 1
        if next_code >= _TIFF_TABLE_CLEAR_AT:
            emit(_CLEAR, width)
            table = {bytes([i]): i for i in range(256)}
            next_code = _FIRST_FREE
            width = 9
        w = bytes([b])
    if w:
        emit(table[w], width)
    emit(_EOI, width)
    if nbits:
        out.append((acc << (8 - nbits)) & 0xFF)
    return bytes(out)


def _lzw_decode(data: bytes, expected: int) -> bytes:
    pos = 0
    total_bits = len(data) * 8

    def read(width: int) -> int:
        nonlocal pos
        if pos + width > total_bits:
            raise ValueError("TIFF: truncated LZW stream")
        byte0 = pos >> 3
        chunk = int.from_bytes(data[byte0:byte0 + 3], "big")
        v = (chunk >> (24 - (pos & 7) - width)) & ((1 << width) - 1)
        pos += width
        return v

    base = [bytes([i]) for i in range(256)] + [b"", b""]
    table = list(base)
    width = 9
    out = bytearray()
    prev: bytes | None = None
    while len(out) < expected:
        code = read(width)
        if code == _CLEAR:
            table = list(base)
            width = 9
            prev = None
            continue
        if code == _EOI:
            break
        if code < len(table):
            entry = table[code]
        elif code == len(table) and prev is not None:
            entry = prev + prev[:1]
        else:
            raise ValueError("TIFF: bad LZW code")
        out += entry
        if prev is not None:
            table.append(prev + entry[:1])
        prev = entry
        # the decoder's own table lags the encoder's by one
        # allocation, so it must switch one code earlier still: at
        # next-free == 2^width − 2 (the off-by-one the TIFF 6.0 LZW
        # section calls out explicitly)
        if len(table) == (1 << width) - 2 and width < 12:
            width += 1
    if len(out) < expected:
        raise ValueError("TIFF: LZW output short of pixel count")
    return bytes(out[:expected])


# ---------------------------------------------------------------------------
# container
# ---------------------------------------------------------------------------

_TYPE_SHORT = 3
_TYPE_LONG = 4


def tiff_encode(
    img: np.ndarray, compression: int = 5, predictor: bool = False,
) -> bytes:
    """Encode an (h, w) uint8 grayscale array as little-endian
    baseline TIFF; compression 1 (none) or 5 (LZW), optional
    horizontal-differencing predictor (LZW only)."""
    img = np.asarray(img, dtype=np.uint8)
    if img.ndim != 2:
        raise ValueError("tiff_encode takes an (h, w) grayscale array")
    if compression not in (1, 5):
        raise ValueError("compression must be 1 (none) or 5 (LZW)")
    h, w = img.shape
    raw = img
    if predictor:
        if compression != 5:
            raise ValueError("predictor requires LZW compression")
        raw = img.astype(np.int16)
        raw = np.concatenate(
            [raw[:, :1], np.diff(raw, axis=1)], axis=1
        ).astype(np.uint8)  # mod-256 horizontal differencing
    data = raw.tobytes()
    if compression == 5:
        data = _lzw_encode(data)

    entries = [
        (256, _TYPE_LONG, 1, w),            # ImageWidth
        (257, _TYPE_LONG, 1, h),            # ImageLength
        (258, _TYPE_SHORT, 1, 8),           # BitsPerSample
        (259, _TYPE_SHORT, 1, compression),
        (262, _TYPE_SHORT, 1, 1),           # BlackIsZero
        (273, _TYPE_LONG, 1, 0),            # StripOffsets (patched below)
        (277, _TYPE_SHORT, 1, 1),           # SamplesPerPixel
        (278, _TYPE_LONG, 1, h),            # RowsPerStrip: one strip
        (279, _TYPE_LONG, 1, len(data)),    # StripByteCounts
    ]
    if predictor:
        entries.append((317, _TYPE_SHORT, 1, 2))
    entries.sort()
    ifd_offset = 8
    strip_offset = ifd_offset + 2 + 12 * len(entries) + 4
    out = bytearray(b"II*\x00")
    out += ifd_offset.to_bytes(4, "little")
    out += len(entries).to_bytes(2, "little")
    for tag, typ, count, value in entries:
        if tag == 273:
            value = strip_offset
        out += tag.to_bytes(2, "little")
        out += typ.to_bytes(2, "little")
        out += count.to_bytes(4, "little")
        out += value.to_bytes(4, "little")  # all values fit inline
    out += (0).to_bytes(4, "little")        # no next IFD
    out += data
    return bytes(out)


def tiff_decode(payload: bytes) -> np.ndarray:
    """Decode the first IFD of a baseline TIFF. Returns (h, w) uint8
    gray or (h, w, 3) uint8 RGB."""
    if payload[:2] == b"II":
        bo = "little"
    elif payload[:2] == b"MM":
        bo = "big"
    else:
        raise ValueError("TIFF: bad byte-order mark")

    def u(b: bytes) -> int:
        return int.from_bytes(b, bo)

    if u(payload[2:4]) != 42:
        raise ValueError("TIFF: bad magic")
    ifd = u(payload[4:8])
    n = u(payload[ifd:ifd + 2])
    tags: dict[int, list[int]] = {}
    type_size = {1: 1, 3: 2, 4: 4}
    for i in range(n):
        e = ifd + 2 + 12 * i
        tag = u(payload[e:e + 2])
        typ = u(payload[e + 2:e + 4])
        count = u(payload[e + 4:e + 8])
        if typ not in type_size:
            continue  # RATIONAL etc. — not needed for baseline decode
        size = type_size[typ] * count
        src = e + 8 if size <= 4 else u(payload[e + 8:e + 12])
        vals = [
            u(payload[src + j * type_size[typ]:src + (j + 1) * type_size[typ]])
            for j in range(count)
        ]
        tags[tag] = vals

    def one(tag: int, default: int | None = None) -> int:
        if tag in tags:
            return tags[tag][0]
        if default is None:
            raise ValueError(f"TIFF: missing required tag {tag}")
        return default

    w = one(256)
    h = one(257)
    compression = one(259, 1)
    spp = one(277, 1)
    bits = tags.get(258, [8])
    if any(b != 8 for b in bits):
        raise ValueError("TIFF: only 8 bits per sample supported")
    if compression not in (1, 5):
        raise ValueError(f"TIFF: unsupported compression {compression}")
    predictor = one(317, 1)
    rows_per_strip = one(278, h)
    offsets = tags.get(273)
    counts = tags.get(279)
    if not offsets or not counts:
        raise ValueError("TIFF: missing strip layout")
    chunks = []
    for si, (off, cnt) in enumerate(zip(offsets, counts)):
        strip_rows = min(rows_per_strip, h - si * rows_per_strip)
        expected = strip_rows * w * spp
        blob = payload[off:off + cnt]
        chunks.append(
            _lzw_decode(blob, expected) if compression == 5 else blob[:expected]
        )
    flat = np.frombuffer(b"".join(chunks), dtype=np.uint8)
    if len(flat) != h * w * spp:
        raise ValueError("TIFF: pixel data short of dimensions")
    img = flat.reshape(h, w, spp) if spp > 1 else flat.reshape(h, w)
    if predictor == 2:
        # horizontal differencing undo: per-row cumsum mod 256 (for
        # RGB the diff is per channel along the row, which axis=1
        # cumsum over (h, w, spp) reproduces)
        img = np.cumsum(img.astype(np.int64), axis=1).astype(np.uint8)
    elif predictor != 1:
        raise ValueError(f"TIFF: unsupported predictor {predictor}")
    return img
