"""GIF codec (GIF87a/89a) in pure stdlib + numpy — no imaging library.

Continues the from-spec codec series (PNG r6, JPEG+FLAC r7): with GIF
implemented, the external-library image gate narrows to TIFF/WebP.

encoder (single-frame, 8-bit palettized; the engine's synth-image
scope is grayscale, so the default palette is the 256-level gray
ramp):
  - GIF89a header, logical screen descriptor, global color table,
  - image descriptor (optionally interlaced — rows emitted in the
    spec's four-pass order),
  - variable-width LZW compression per the GIF flavor: LSB-first bit
    packing, code width grows when the next code to allocate would
    overflow it, CLEAR emitted at table-full (4096), EOI terminator,
  - 255-byte data sub-block framing, trailer.

decoder (any 87a/89a stream our scope emits, plus the general cases):
  - header/LSD parse, global AND local color tables,
  - extension blocks skipped (graphic control, comment, application),
  - full variable-width LZW decode with CLEAR/EOI handling, the
    "code == next_code" self-referential case, and the 12-bit table
    cap (deferred-clear streams decode correctly — the table simply
    stops growing),
  - four-pass de-interlacing,
  - palette application to an (h, w) grayscale array when the palette
    is gray (r==g==b), else (h, w, 3) RGB.

LZW is inherently code-serial; the per-image loops are dict-walk
Python, which is the honest cost of the format (images here are
document-rasterization sized). Everything around them is numpy.
"""

from __future__ import annotations

import numpy as np

_MAX_CODE_WIDTH = 12
_TABLE_CAP = 1 << _MAX_CODE_WIDTH

_GRAY_PALETTE = bytes(v for i in range(256) for v in (i, i, i))

_INTERLACE_PASSES = ((0, 8), (4, 8), (2, 4), (1, 2))


def _interlace_order(h: int) -> list[int]:
    order: list[int] = []
    for start, step in _INTERLACE_PASSES:
        order.extend(range(start, h, step))
    return order


# ---------------------------------------------------------------------------
# LZW (GIF flavor: LSB-first, CLEAR/EOI, growing code width)
# ---------------------------------------------------------------------------


def _lzw_encode(data: bytes, min_code_size: int) -> bytes:
    clear = 1 << min_code_size
    eoi = clear + 1
    out = bytearray()
    acc = 0
    nbits = 0

    def emit(code: int, width: int) -> None:
        nonlocal acc, nbits
        acc |= code << nbits
        nbits += width
        while nbits >= 8:
            out.append(acc & 0xFF)
            acc >>= 8
            nbits -= 8

    # width growth follows the giflib ("late change") convention both
    # directions: the growth check runs after each emission with the
    # PRE-allocation next_code, so the first code emitted after the
    # table reaches 2^width entries still uses the old width and the
    # one after it switches — the decoder mirrors this by counting
    # reads, not table entries.
    table: dict[bytes, int] = {bytes([i]): i for i in range(clear)}
    next_code = eoi + 1
    width = min_code_size + 1
    emit(clear, width)
    w = b""
    for b in data:
        wk = w + bytes([b])
        if wk in table:
            w = wk
            continue
        emit(table[w], width)
        if next_code >= (1 << width) and width < _MAX_CODE_WIDTH:
            width += 1
        if next_code < _TABLE_CAP:
            table[wk] = next_code
            next_code += 1
        else:
            emit(clear, width)
            table = {bytes([i]): i for i in range(clear)}
            next_code = eoi + 1
            width = min_code_size + 1
        w = bytes([b])
    if w:
        emit(table[w], width)
        if next_code >= (1 << width) and width < _MAX_CODE_WIDTH:
            width += 1
    emit(eoi, width)
    if nbits:
        out.append(acc & 0xFF)
    return bytes(out)


def _lzw_decode(data: bytes, min_code_size: int, expected: int) -> bytes:
    clear = 1 << min_code_size
    eoi = clear + 1
    pos = 0  # bit position
    total_bits = len(data) * 8

    def read(width: int) -> int:
        nonlocal pos
        if pos + width > total_bits:
            raise ValueError("GIF: truncated LZW stream")
        byte0 = pos >> 3
        v = int.from_bytes(data[byte0:byte0 + 3], "little") >> (pos & 7)
        pos += width
        return v & ((1 << width) - 1)

    # `running` mirrors the ENCODER's next_code by counting reads (the
    # decoder's own table lags one allocation behind) — the giflib
    # "late change" convention; growing on len(table) desyncs one code
    # after each width boundary.
    table: list[bytes] = [bytes([i]) for i in range(clear)] + [b"", b""]
    width = min_code_size + 1
    running = eoi + 1
    out = bytearray()
    prev: bytes | None = None
    while True:
        code = read(width)
        running += 1
        if running > (1 << width) and width < _MAX_CODE_WIDTH:
            width += 1
        if code == clear:
            table = table[:eoi + 1]
            width = min_code_size + 1
            running = eoi + 1
            prev = None
            continue
        if code == eoi:
            break
        if code < len(table):
            entry = table[code]
        elif code == len(table) and prev is not None:
            entry = prev + prev[:1]
        else:
            raise ValueError("GIF: bad LZW code")
        out += entry
        if prev is not None and len(table) < _TABLE_CAP:
            table.append(prev + entry[:1])
        prev = entry
        if len(out) >= expected:
            # streams may omit an explicit EOI before the block end
            break
    if len(out) < expected:
        raise ValueError("GIF: LZW output short of pixel count")
    return bytes(out[:expected])


# ---------------------------------------------------------------------------
# container
# ---------------------------------------------------------------------------


def gif_encode(
    img: np.ndarray, palette: bytes = _GRAY_PALETTE, interlace: bool = False,
) -> bytes:
    """Encode an (h, w) uint8 index array as a single-frame GIF89a.
    With the default gray-ramp palette, indices ARE gray levels."""
    img = np.asarray(img, dtype=np.uint8)
    if img.ndim != 2:
        raise ValueError("gif_encode takes an (h, w) palette-index array")
    h, w = img.shape
    if len(palette) != 256 * 3:
        raise ValueError("palette must hold 256 RGB entries")
    out = bytearray(b"GIF89a")
    out += w.to_bytes(2, "little") + h.to_bytes(2, "little")
    out.append(0b1_111_0_111)  # GCT present, 8-bit color res, 256 entries
    out += b"\x00\x00"          # background index, aspect
    out += palette
    out += b"\x2c" + b"\x00\x00\x00\x00"   # image descriptor at (0, 0)
    out += w.to_bytes(2, "little") + h.to_bytes(2, "little")
    out.append(0b0100_0000 if interlace else 0)
    rows = img[_interlace_order(h)] if interlace else img
    min_code_size = 8
    out.append(min_code_size)
    lzw = _lzw_encode(rows.tobytes(), min_code_size)
    for i in range(0, len(lzw), 255):
        chunk = lzw[i:i + 255]
        out.append(len(chunk))
        out += chunk
    out += b"\x00\x3b"          # block terminator, trailer
    return bytes(out)


def _read_subblocks(payload: bytes, pos: int) -> tuple[bytes, int]:
    out = bytearray()
    while True:
        n = payload[pos]
        pos += 1
        if n == 0:
            return bytes(out), pos
        out += payload[pos:pos + n]
        pos += n


def gif_decode(payload: bytes) -> np.ndarray:
    """Decode the first image of a GIF87a/89a stream. Returns (h, w)
    uint8 gray when the applied palette is a gray ramp, else
    (h, w, 3) uint8 RGB."""
    if payload[:6] not in (b"GIF87a", b"GIF89a"):
        raise ValueError("GIF: bad signature")
    pos = 6
    pos += 4  # logical screen w/h (frame carries its own size)
    packed = payload[pos]
    pos += 3
    gct = None
    if packed & 0x80:
        n = 2 << (packed & 0x07)
        gct = payload[pos:pos + 3 * n]
        pos += 3 * n
    while True:
        block = payload[pos]
        pos += 1
        if block == 0x21:        # extension: label + sub-blocks
            pos += 1
            _, pos = _read_subblocks(payload, pos)
        elif block == 0x2C:      # image descriptor
            w = int.from_bytes(payload[pos + 4:pos + 6], "little")
            h = int.from_bytes(payload[pos + 6:pos + 8], "little")
            ipacked = payload[pos + 8]
            pos += 9
            pal = gct
            if ipacked & 0x80:   # local color table overrides
                n = 2 << (ipacked & 0x07)
                pal = payload[pos:pos + 3 * n]
                pos += 3 * n
            if pal is None:
                raise ValueError("GIF: no color table")
            min_code_size = payload[pos]
            pos += 1
            lzw, pos = _read_subblocks(payload, pos)
            idx = np.frombuffer(
                _lzw_decode(lzw, min_code_size, w * h), dtype=np.uint8
            ).reshape(h, w)
            if ipacked & 0x40:   # de-interlace
                img = np.empty_like(idx)
                img[_interlace_order(h)] = idx
                idx = img
            p = np.frombuffer(pal.ljust(768, b"\x00"), dtype=np.uint8)
            p = p.reshape(256, 3)
            if np.array_equal(p[:, 0], p[:, 1]) and np.array_equal(p[:, 1], p[:, 2]):
                return p[idx, 0]            # gray palette → (h, w)
            return p[idx]                   # (h, w, 3) RGB
        elif block == 0x3B:
            raise ValueError("GIF: trailer before any image")
        else:
            raise ValueError(f"GIF: unknown block {block:#04x}")
