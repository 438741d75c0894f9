"""WebP-lossless (VP8L) codec in pure stdlib + numpy — no imaging
library. Closes the engine's LAST image-capability gate (PNG r6,
JPEG r7, GIF+TIFF r7, WebP r8).

Decoder — the full VP8L feature surface, so REAL lossless .webp files
decode, not just our own output:
  - RIFF/WEBP container walk (VP8L direct or inside a VP8X extended
    file; lossy VP8 is explicitly out of scope — a DCT codec with its
    own arithmetic coder, the documented boundary),
  - 14-bit dimensions header, LSB-first bit reader,
  - all four transforms, inverted in reverse bitstream order:
    PREDICTOR (all 14 modes, spec edge rules: 0xff000000 seed, L on
    the first row, T on the first column, TR of the rightmost column
    wrapping to the row start), COLOR (signed 3.5 fixed-point deltas,
    blue depends on the POST-transform red), SUBTRACT_GREEN, and
    COLOR_INDEXING (delta-coded palette + sub-byte pixel bundling for
    palettes of ≤16/≤4/≤2 entries),
  - canonical prefix codes: the "simple" 1/2-symbol form and the
    full form (code-length code in kCodeLengthCodeOrder, 16/17/18
    repeat codes, the optional max_symbol cut),
  - entropy (meta-huffman) image selecting per-block code groups,
  - color cache (1..11 bit, 0x1e35a7bd multiplicative hash, inserts
    on literals AND backward-copied pixels),
  - LZ77: 24 length / 40 distance prefix codes with extra bits, and
    the 120-entry close-neighborhood distance map.

Encoder — a real compressing encoder (not a stored-form escape
hatch), enough to roundtrip arbitrary ARGB and exercise the decoder's
main paths end-to-end:
  - per-channel histogram → canonical Huffman codes (length-capped by
    count scaling), written through the full code-length coding with
    16/17/18 run codes,
  - LZ77 run detection emitting distance-1 backrefs through the
    distance MAP (the close-neighborhood idiom),
  - optional SUBTRACT_GREEN, PREDICTOR (single-mode sub-image) and
    COLOR_INDEXING (palette + bundling) transforms,
  - vectorized bit packing: symbols become (value, nbits) arrays and
    one numpy pass packs the LSB-first stream (Huffman code bits are
    pre-reversed so tree-descent order falls out of the same packer —
    the jpeg.py packbits discipline).

Entropy decode is symbol-serial by nature; the decoder keeps it
tolerable with per-code window tables (canonical codes tile the
window space, so one np.repeat builds each table) and a 64-bit
rolling buffer. Everything around the symbol loop is numpy.

Reference scope note: the reference engine ships no codecs — this
module exists for the multimodal ingestion surface (SURVEY.md §2's
LLM-pipeline extensions), same as datapipe/{png,jpeg,gif,tiff,flac}.
"""

from __future__ import annotations

import numpy as np

# order in which code-length-code lengths are stored (spec §"Decoding
# the Code Lengths")
_CL_ORDER = (17, 18, 0, 1, 2, 3, 4, 5, 16, 6, 7, 8, 9, 10, 11, 12, 13, 14, 15)

# close-neighborhood distance map: distance codes 1..120 address
# (dx, dy) offsets near the current pixel; dist = dx + dy*width
# (clamped to >= 1), codes > 120 are literal distances minus 120.
_DIST_MAP = (
    (0, 1), (1, 0), (1, 1), (-1, 1), (0, 2), (2, 0), (1, 2), (-1, 2),
    (2, 1), (-2, 1), (2, 2), (-2, 2), (0, 3), (3, 0), (1, 3), (-1, 3),
    (3, 1), (-3, 1), (2, 3), (-2, 3), (3, 2), (-3, 2), (0, 4), (4, 0),
    (1, 4), (-1, 4), (4, 1), (-4, 1), (3, 3), (-3, 3), (2, 4), (-2, 4),
    (4, 2), (-4, 2), (0, 5), (3, 4), (-3, 4), (4, 3), (-4, 3), (5, 0),
    (1, 5), (-1, 5), (5, 1), (-5, 1), (2, 5), (-2, 5), (5, 2), (-5, 2),
    (4, 4), (-4, 4), (3, 5), (-3, 5), (5, 3), (-5, 3), (0, 6), (6, 0),
    (1, 6), (-1, 6), (6, 1), (-6, 1), (2, 6), (-2, 6), (6, 2), (-6, 2),
    (4, 5), (-4, 5), (5, 4), (-5, 4), (3, 6), (-3, 6), (6, 3), (-6, 3),
    (0, 7), (7, 0), (1, 7), (-1, 7), (5, 5), (-5, 5), (7, 1), (-7, 1),
    (4, 6), (-4, 6), (6, 4), (-6, 4), (2, 7), (-2, 7), (7, 2), (-7, 2),
    (3, 7), (-3, 7), (7, 3), (-7, 3), (5, 6), (-5, 6), (6, 5), (-6, 5),
    (8, 0), (4, 7), (-4, 7), (7, 4), (-7, 4), (8, 1), (8, 2), (6, 6),
    (-6, 6), (8, 3), (5, 7), (-5, 7), (7, 5), (-7, 5), (8, 4), (6, 7),
    (-6, 7), (7, 6), (-7, 6), (8, 5), (7, 7), (-7, 7), (8, 6), (8, 7),
)
assert len(_DIST_MAP) == 120

_HASH_MUL = 0x1E35A7BD
_MAX_LZ_LENGTH = 4096


# ---------------------------------------------------------------------------
# bit I/O
# ---------------------------------------------------------------------------


class BitReader:
    """LSB-first bit reader with a 64-bit rolling window (VP8L packs
    bits into bytes least-significant-bit first)."""

    __slots__ = ("data", "pos", "nbits")

    def __init__(self, data: bytes):
        # pad so the 8-byte window read never falls off the end
        self.data = bytes(data) + b"\x00" * 8
        self.pos = 0
        self.nbits = len(data) * 8

    def read(self, n: int) -> int:
        p = self.pos
        if n == 0:
            return 0
        if p + n > self.nbits:
            raise ValueError("VP8L: bitstream truncated")
        byte = p >> 3
        window = int.from_bytes(self.data[byte:byte + 8], "little")
        self.pos = p + n
        return (window >> (p & 7)) & ((1 << n) - 1)

    def peek_window(self, n: int) -> int:
        """Next ``n`` bits LSB-first WITHOUT length checking (table
        lookups peek past the logical end; consume() validates)."""
        p = self.pos
        byte = p >> 3
        window = int.from_bytes(self.data[byte:byte + 8], "little")
        return (window >> (p & 7)) & ((1 << n) - 1)

    def consume(self, n: int) -> None:
        self.pos += n
        if self.pos > self.nbits:
            raise ValueError("VP8L: bitstream truncated")


class BitWriter:
    """LSB-first (value, nbits) collector; bytes() runs ONE vectorized
    pack over everything written."""

    __slots__ = ("vals", "bits")

    def __init__(self):
        self.vals: list[int] = []
        self.bits: list[int] = []

    def write(self, value: int, n: int) -> None:
        if n:
            self.vals.append(int(value))
            self.bits.append(int(n))

    def write_arrays(self, values, nbits) -> None:
        self.vals.extend(int(v) for v in values)
        self.bits.extend(int(b) for b in nbits)

    def tobytes(self) -> bytes:
        if not self.vals:
            return b""
        vals = np.asarray(self.vals, dtype=np.uint64)
        bits = np.asarray(self.bits, dtype=np.int64)
        maxb = int(bits.max())
        # (n, maxb) LSB-first bit matrix, mask to each field's width
        cols = np.arange(maxb, dtype=np.uint64)
        mat = (vals[:, None] >> cols[None, :]) & np.uint64(1)
        mask = cols[None, :] < bits[:, None].astype(np.uint64)
        stream = mat[mask].astype(np.uint8)  # row-major: field order kept
        return np.packbits(stream, bitorder="little").tobytes()


# ---------------------------------------------------------------------------
# canonical prefix codes
# ---------------------------------------------------------------------------


def canonical_codes(lengths: np.ndarray) -> np.ndarray:
    """DEFLATE-style canonical code values for a length array (0 =
    unused): codes assigned in order of (length, symbol)."""
    lengths = np.asarray(lengths, dtype=np.int64)
    codes = np.zeros(len(lengths), dtype=np.int64)
    code = 0
    for ln in range(1, int(lengths.max()) + 1 if lengths.size else 1):
        for sym in np.nonzero(lengths == ln)[0]:
            codes[sym] = code
            code += 1
        code <<= 1
    return codes


def _reverse_bits(v: int, n: int) -> int:
    r = 0
    for _ in range(n):
        r = (r << 1) | (v & 1)
        v >>= 1
    return r


class PrefixCode:
    """Decoder-side canonical prefix code with an LSB-first window
    table: index = next max_len stream bits; entry = (symbol, len).
    Canonical codes tile the (bit-reversed) window space, so the table
    is built with vectorized scatter writes."""

    __slots__ = ("table_sym", "table_len", "max_len", "single")

    def __init__(self, lengths, symbols=None):
        """``lengths`` over the alphabet; or simple form via
        ``symbols`` = [s] (0-bit) / [s0, s1] (1-bit, listed order)."""
        if symbols is not None:
            if len(symbols) == 1:
                self.single = int(symbols[0])
                self.max_len = 0
                self.table_sym = self.table_len = None
                return
            self.single = None
            self.max_len = 1
            self.table_sym = np.array(symbols, dtype=np.int64)
            self.table_len = np.ones(2, dtype=np.int64)
            return
        lengths = np.asarray(lengths, dtype=np.int64)
        used = np.nonzero(lengths > 0)[0]
        if len(used) == 0:
            raise ValueError("VP8L: empty prefix code")
        if len(used) == 1:
            # degenerate normal code: single symbol, zero bits
            self.single = int(used[0])
            self.max_len = 0
            self.table_sym = self.table_len = None
            return
        self.single = None
        # completeness (Kraft == 1) — required for a table decoder and
        # by the spec for multi-symbol codes
        kraft = int(np.sum((1 << 15) >> lengths[used]))
        if kraft != (1 << 15):
            raise ValueError("VP8L: incomplete/oversubscribed prefix code")
        max_len = int(lengths[used].max())
        self.max_len = max_len
        codes = canonical_codes(lengths)
        self.table_sym = np.zeros(1 << max_len, dtype=np.int64)
        self.table_len = np.zeros(1 << max_len, dtype=np.int64)
        for sym in used:
            ln = int(lengths[sym])
            rev = _reverse_bits(int(codes[sym]), ln)
            n_fill = 1 << (max_len - ln)
            idx = rev + (np.arange(n_fill) << ln)
            self.table_sym[idx] = sym
            self.table_len[idx] = ln

    def decode(self, br: BitReader) -> int:
        if self.single is not None:
            return self.single
        idx = br.peek_window(self.max_len)
        br.consume(int(self.table_len[idx]))
        return int(self.table_sym[idx])


def huffman_lengths(counts: np.ndarray, max_len: int) -> np.ndarray:
    """Length-capped Huffman code lengths from symbol counts (heap
    build; on overflow the counts are flattened and rebuilt — the
    classic scaling fallback, fine at this corpus's alphabet sizes).
    Symbols with count 0 get length 0. ≥2 used symbols → a complete
    canonical code; 1 used symbol → length 1 on it alone (the CALLER
    must pair it with a dummy or use the simple form — a lone 1-bit
    code is incomplete)."""
    import heapq
    import itertools

    counts = np.asarray(counts, dtype=np.int64)
    used = np.nonzero(counts > 0)[0]
    lengths = np.zeros(len(counts), dtype=np.int64)
    if len(used) == 0:
        return lengths
    if len(used) == 1:
        lengths[used[0]] = 1
        return lengths
    work = counts.copy()
    tie = itertools.count()
    while True:
        heap = [(int(work[s]), next(tie), int(s), None, None) for s in used]
        heapq.heapify(heap)
        while len(heap) > 1:
            a = heapq.heappop(heap)
            b = heapq.heappop(heap)
            heapq.heappush(
                heap, (a[0] + b[0], next(tie), -1, a, b)
            )

        def depths(node, d, out):
            if node[2] >= 0:
                out.append((node[2], max(d, 1)))
            else:
                depths(node[3], d + 1, out)
                depths(node[4], d + 1, out)

        out: list[tuple[int, int]] = []
        depths(heap[0], 0, out)
        if max(d for _, d in out) <= max_len:
            for s, d in out:
                lengths[s] = d
            return lengths
        work[used] = (work[used] >> 2) | 1  # flatten and retry


# ---------------------------------------------------------------------------
# LZ77 prefix coding (lengths AND distances use the same scheme)
# ---------------------------------------------------------------------------


def prefix_decode_value(code: int, br: BitReader) -> int:
    if code < 4:
        return code + 1
    extra = (code - 2) >> 1
    offset = (2 + (code & 1)) << extra
    return offset + br.read(extra) + 1


def prefix_encode_value(value: int) -> tuple[int, int, int]:
    """value (≥1) → (prefix_code, extra_val, extra_bits)."""
    v = value - 1
    if v < 4:
        return v, 0, 0
    b = v.bit_length() - 1
    extra = b - 1
    code = 2 * b + ((v >> (b - 1)) & 1)
    offset = (2 + (code & 1)) << extra
    return code, v - offset, extra


# ---------------------------------------------------------------------------
# decoder
# ---------------------------------------------------------------------------


def _read_prefix_code(br: BitReader, alphabet_size: int) -> PrefixCode:
    if br.read(1):  # simple code
        num_symbols = br.read(1) + 1
        first_8bit = br.read(1)
        s0 = br.read(8 if first_8bit else 1)
        if num_symbols == 2:
            return PrefixCode(None, symbols=[s0, br.read(8)])
        return PrefixCode(None, symbols=[s0])
    # full form: code-length code, then RLE-coded symbol lengths
    num_cl = br.read(4) + 4
    cl_lengths = np.zeros(19, dtype=np.int64)
    for i in range(num_cl):
        cl_lengths[_CL_ORDER[i]] = br.read(3)
    cl_code = PrefixCode(cl_lengths)
    lengths = np.zeros(alphabet_size, dtype=np.int64)
    if br.read(1):  # length-limited read
        length_nbits = 2 + 2 * br.read(3)
        max_symbol = 2 + br.read(length_nbits)
    else:
        max_symbol = alphabet_size
    symbol = 0
    prev_len = 8
    while symbol < alphabet_size:
        if max_symbol == 0:
            break
        max_symbol -= 1
        cl = cl_code.decode(br)
        if cl < 16:
            lengths[symbol] = cl
            symbol += 1
            if cl:
                prev_len = cl
        else:
            if cl == 16:
                repeat, fill = br.read(2) + 3, prev_len
            elif cl == 17:
                repeat, fill = br.read(3) + 3, 0
            else:
                repeat, fill = br.read(7) + 11, 0
            end = min(symbol + repeat, alphabet_size)
            lengths[symbol:end] = fill
            symbol = end
    return PrefixCode(lengths)


def _sub_size(size: int, bits: int) -> int:
    return (size + (1 << bits) - 1) >> bits


def _decode_image_stream(br: BitReader, w: int, h: int, is_level0: bool):
    """Returns (argb uint32 array (h, w), transforms) — transforms
    non-empty only at level 0, as (type, payload) in READ order."""
    transforms = []
    if is_level0:
        seen = set()
        while br.read(1):
            ttype = br.read(2)
            if ttype in seen:
                raise ValueError("VP8L: duplicate transform")
            seen.add(ttype)
            if ttype == 2:  # SUBTRACT_GREEN
                transforms.append((2, None))
            elif ttype in (0, 1):  # PREDICTOR / COLOR
                size_bits = br.read(3) + 2
                tw, th = _sub_size(w, size_bits), _sub_size(h, size_bits)
                sub, _ = _decode_image_stream(br, tw, th, False)
                transforms.append((ttype, (size_bits, sub)))
            else:  # COLOR_INDEXING
                n_colors = br.read(8) + 1
                pal_img, _ = _decode_image_stream(br, n_colors, 1, False)
                deltas = pal_img[0]
                # palette entries are componentwise cumulative sums
                a = np.cumsum((deltas >> 24) & 0xFF, dtype=np.uint64) & 0xFF
                r = np.cumsum((deltas >> 16) & 0xFF, dtype=np.uint64) & 0xFF
                g = np.cumsum((deltas >> 8) & 0xFF, dtype=np.uint64) & 0xFF
                b = np.cumsum(deltas & 0xFF, dtype=np.uint64) & 0xFF
                palette = ((a << 24) | (r << 16) | (g << 8) | b).astype(
                    np.uint32
                )
                if n_colors <= 2:
                    width_bits = 3
                elif n_colors <= 4:
                    width_bits = 2
                elif n_colors <= 16:
                    width_bits = 1
                else:
                    width_bits = 0
                transforms.append((3, (width_bits, palette, w)))
                w = _sub_size(w, width_bits)  # everything after is packed

    cache_bits = 0
    if br.read(1):
        cache_bits = br.read(4)
        if not 1 <= cache_bits <= 11:
            raise ValueError("VP8L: bad color cache size")
    cache_size = (1 << cache_bits) if cache_bits else 0

    huff_img = None
    huff_bits = 0
    n_groups = 1
    if is_level0 and br.read(1):  # entropy (meta-prefix) image
        huff_bits = br.read(3) + 2
        hw, hh = _sub_size(w, huff_bits), _sub_size(h, huff_bits)
        himg, _ = _decode_image_stream(br, hw, hh, False)
        huff_img = ((himg >> 8) & 0xFFFF).astype(np.int64)
        n_groups = int(huff_img.max()) + 1

    alphabets = (256 + 24 + cache_size, 256, 256, 256, 40)
    groups = [
        [_read_prefix_code(br, a) for a in alphabets]
        for _ in range(n_groups)
    ]

    n = w * h
    out = np.zeros(n, dtype=np.uint32)
    cache = np.zeros(cache_size, dtype=np.uint32) if cache_size else None
    shift = 32 - cache_bits if cache_bits else 0
    pos = 0
    g_codes, r_codes, b_codes, a_codes, d_codes = groups[0]
    cur_group = 0
    while pos < n:
        if huff_img is not None:
            x, y = pos % w, pos // w
            gi = int(huff_img[y >> huff_bits, x >> huff_bits])
            if gi != cur_group:
                cur_group = gi
                g_codes, r_codes, b_codes, a_codes, d_codes = groups[gi]
        s = g_codes.decode(br)
        if s < 256:
            red = r_codes.decode(br)
            blue = b_codes.decode(br)
            alpha = a_codes.decode(br)
            px = (alpha << 24) | (red << 16) | (s << 8) | blue
            out[pos] = px
            pos += 1
            if cache is not None:
                cache[((px * _HASH_MUL) & 0xFFFFFFFF) >> shift] = px
        elif s < 280:
            length = prefix_decode_value(s - 256, br)
            dcode = prefix_decode_value(d_codes.decode(br), br)
            if dcode > 120:
                dist = dcode - 120
            else:
                dx, dy = _DIST_MAP[dcode - 1]
                dist = dx + dy * w
                if dist < 1:
                    dist = 1
            if dist > pos or pos + length > n:
                raise ValueError("VP8L: backref out of range")
            if dist >= length:  # non-overlapping: one vector copy
                out[pos:pos + length] = out[pos - dist:pos - dist + length]
            else:
                for i in range(length):
                    out[pos + i] = out[pos + i - dist]
            if cache is not None:
                seg = out[pos:pos + length].astype(np.uint64)
                idx = ((seg * _HASH_MUL) & 0xFFFFFFFF).astype(
                    np.uint64
                ) >> shift
                cache[idx.astype(np.int64)] = seg.astype(np.uint32)
            pos += length
        else:
            if cache is None or s - 280 >= cache_size:
                raise ValueError("VP8L: cache reference without cache")
            out[pos] = cache[s - 280]
            pos += 1
    return out.reshape(h, w), transforms


def _unpack(px: np.ndarray):
    px = px.astype(np.int64)
    return (px >> 24) & 0xFF, (px >> 16) & 0xFF, (px >> 8) & 0xFF, px & 0xFF


def _pack(a, r, g, b):
    return (
        ((a & 0xFF) << 24) | ((r & 0xFF) << 16) | ((g & 0xFF) << 8)
        | (b & 0xFF)
    ).astype(np.uint32)


def _predict(mode: int, L: int, T: int, TL: int, TR: int) -> int:
    """One predicted ARGB pixel from the spec's 14 modes (scalar —
    the predictor inverse is inherently serial along a row because
    L is the just-reconstructed neighbor)."""
    if mode == 0:
        return 0xFF000000
    if mode == 1:
        return L
    if mode == 2:
        return T
    if mode == 3:
        return TR
    if mode == 4:
        return TL
    if mode == 5:
        return _avg2_scalar(_avg2_scalar(L, TR), T)
    if mode == 6:
        return _avg2_scalar(L, TL)
    if mode == 7:
        return _avg2_scalar(L, T)
    if mode == 8:
        return _avg2_scalar(TL, T)
    if mode == 9:
        return _avg2_scalar(T, TR)
    if mode == 10:
        return _avg2_scalar(_avg2_scalar(L, TL), _avg2_scalar(T, TR))
    if mode == 11:  # Select
        pl = pt = 0
        for sh in (24, 16, 8, 0):
            lc, tc, tlc = (L >> sh) & 0xFF, (T >> sh) & 0xFF, (TL >> sh) & 0xFF
            p = lc + tc - tlc
            pl += abs(p - lc)
            pt += abs(p - tc)
        return L if pl < pt else T
    if mode == 12:  # ClampAddSubtractFull
        out = 0
        for sh in (24, 16, 8, 0):
            v = ((L >> sh) & 0xFF) + ((T >> sh) & 0xFF) - ((TL >> sh) & 0xFF)
            out |= max(0, min(255, v)) << sh
        return out
    # mode 13: ClampAddSubtractHalf — the spec's (a - b) / 2 truncates
    # toward zero (C semantics), Python // floors, so branch on sign
    out = 0
    for sh in (24, 16, 8, 0):
        avg = (((L >> sh) & 0xFF) + ((T >> sh) & 0xFF)) >> 1
        d = avg - ((TL >> sh) & 0xFF)
        v = avg + (d // 2 if d >= 0 else -((-d) // 2))
        out |= max(0, min(255, v)) << sh
    return out


def _avg2_scalar(a: int, b: int) -> int:
    return (((a ^ b) & 0xFEFEFEFE) >> 1) + (a & b)


def _add_pixels(a: int, b: int) -> int:
    """Per-channel (a + b) & 0xff without carries between channels."""
    return (
        (((a & 0xFF00FF00) + (b & 0xFF00FF00)) & 0xFF00FF00)
        | (((a & 0x00FF00FF) + (b & 0x00FF00FF)) & 0x00FF00FF)
    )


def _inverse_predictor(img: np.ndarray, size_bits: int,
                       modes: np.ndarray) -> np.ndarray:
    h, w = img.shape
    out = img.astype(np.int64).copy()
    for y in range(h):
        row_modes = modes[y >> size_bits]
        for x in range(w):
            if x == 0 and y == 0:
                pred = 0xFF000000
            elif y == 0:
                pred = int(out[0, x - 1])  # L
            elif x == 0:
                pred = int(out[y - 1, 0])  # T
            else:
                mode = int(row_modes[x >> size_bits])
                L = int(out[y, x - 1])
                T = int(out[y - 1, x])
                TL = int(out[y - 1, x - 1])
                # TR of the rightmost column wraps to the current
                # row's first pixel (the contiguous-buffer rule)
                TR = int(out[y - 1, x + 1]) if x + 1 < w else int(out[y, 0])
                pred = _predict(mode, L, T, TL, TR)
            out[y, x] = _add_pixels(int(out[y, x]), pred)
    return out.astype(np.uint32)


def _ct_delta(t: np.ndarray, c: np.ndarray) -> np.ndarray:
    """ColorTransformDelta: (int8(t) * int8(c)) >> 5 (arithmetic)."""
    ts = np.where(t > 127, t - 256, t)
    cs = np.where(c > 127, c - 256, c)
    return (ts * cs) >> 5


def _inverse_color_transform(img: np.ndarray, size_bits: int,
                             cte: np.ndarray) -> np.ndarray:
    h, w = img.shape
    a, r, g, b = _unpack(img)
    ys = (np.arange(h) >> size_bits)[:, None]
    xs = (np.arange(w) >> size_bits)[None, :]
    e = cte[ys, xs].astype(np.int64)
    g2r, g2b, r2b = e & 0xFF, (e >> 8) & 0xFF, (e >> 16) & 0xFF
    r = (r + _ct_delta(g2r, g)) & 0xFF
    b = (b + _ct_delta(g2b, g) + _ct_delta(r2b, r)) & 0xFF
    return _pack(a, r, g, b)


def _inverse_subtract_green(img: np.ndarray) -> np.ndarray:
    a, r, g, b = _unpack(img)
    return _pack(a, (r + g) & 0xFF, g, (b + g) & 0xFF)


def _inverse_palette(img: np.ndarray, width_bits: int, palette: np.ndarray,
                     orig_w: int) -> np.ndarray:
    h = img.shape[0]
    idx = ((img >> 8) & 0xFF).astype(np.int64)  # green channel
    if width_bits:
        per = 1 << width_bits
        bits = 8 >> width_bits
        sub = np.arange(orig_w)
        packed = idx[:, sub >> width_bits]
        shifts = (sub & (per - 1)) * bits
        idx = (packed >> shifts[None, :]) & ((1 << bits) - 1)
    else:
        idx = idx[:, :orig_w]
    safe = np.where(idx < len(palette), idx, 0)
    out = palette[safe]
    out[idx >= len(palette)] = 0  # out-of-range index → transparent black
    return out.reshape(h, orig_w)


def vp8l_decode(data: bytes) -> np.ndarray:
    """VP8L chunk payload → ARGB uint32 (h, w)."""
    if not data or data[0] != 0x2F:
        raise ValueError("VP8L: bad signature byte")
    br = BitReader(data[1:])
    w = br.read(14) + 1
    h = br.read(14) + 1
    br.read(1)  # alpha hint
    if br.read(3) != 0:
        raise ValueError("VP8L: unsupported version")
    img, transforms = _decode_image_stream(br, w, h, True)
    for ttype, payload in reversed(transforms):
        if ttype == 2:
            img = _inverse_subtract_green(img)
        elif ttype == 0:
            size_bits, sub = payload
            modes = ((sub >> 8) & 0xFF).astype(np.int64)
            img = _inverse_predictor(img, size_bits, modes)
        elif ttype == 1:
            size_bits, sub = payload
            img = _inverse_color_transform(img, size_bits, sub)
        else:
            width_bits, palette, orig_w = payload
            img = _inverse_palette(img, width_bits, palette, orig_w)
    return img


def webp_decode(payload: bytes) -> np.ndarray:
    """RIFF/WEBP container → (h, w, 3) RGB uint8 (or (h, w, 4) RGBA
    when any alpha < 255). Lossless (VP8L) only; VP8 lossy raises."""
    if payload[:4] != b"RIFF" or payload[8:12] != b"WEBP":
        raise ValueError("not a RIFF/WEBP file")
    pos = 12
    vp8l = None
    while pos + 8 <= len(payload):
        tag = payload[pos:pos + 4]
        size = int.from_bytes(payload[pos + 4:pos + 8], "little")
        body = payload[pos + 8:pos + 8 + size]
        if tag == b"VP8L":
            vp8l = body
            break
        if tag == b"VP8 ":
            raise NotImplementedError(
                "lossy VP8 (DCT + arithmetic coder) is out of scope; "
                "this decoder handles lossless WebP (VP8L)"
            )
        pos += 8 + size + (size & 1)  # chunks are 2-byte aligned
    if vp8l is None:
        raise ValueError("WEBP: no VP8L chunk")
    argb = vp8l_decode(vp8l)
    a = (argb >> 24) & 0xFF
    rgb = np.stack(
        [(argb >> 16) & 0xFF, (argb >> 8) & 0xFF, argb & 0xFF], axis=-1
    ).astype(np.uint8)
    if np.all(a == 255):
        return rgb
    return np.concatenate([rgb, a[..., None].astype(np.uint8)], axis=-1)


# ---------------------------------------------------------------------------
# encoder
# ---------------------------------------------------------------------------

_MIN_RUN = 4  # shortest pixel run worth a distance-1 backref


def _sub_pixels(a: int, b: int) -> int:
    out = 0
    for sh in (24, 16, 8, 0):
        out |= (((a >> sh) - (b >> sh)) & 0xFF) << sh
    return out


def _rle_code_lengths(lengths: np.ndarray) -> list[tuple[int, int, int]]:
    """Symbol-length array → code-length-code symbol stream as
    (cl_symbol, extra_val, extra_bits), using 16/17/18 run codes.
    16 is only emitted right after a literal of the same value, so
    the decoder's prev-nonzero-length rule reproduces the array."""
    out: list[tuple[int, int, int]] = []
    i, n = 0, len(lengths)
    while i < n:
        v = int(lengths[i])
        j = i
        while j < n and lengths[j] == v:
            j += 1
        run = j - i
        if v == 0:
            while run >= 11:
                r = min(run, 138)
                out.append((18, r - 11, 7))
                run -= r
            while run >= 3:
                r = min(run, 10)
                out.append((17, r - 3, 3))
                run -= r
            out.extend((0, 0, 0) for _ in range(run))
        else:
            out.append((v, 0, 0))
            run -= 1
            while run >= 3:
                r = min(run, 6)
                out.append((16, r - 3, 2))
                run -= r
            out.extend((v, 0, 0) for _ in range(run))
        i = j
    return out


def _emit_tables(lengths: np.ndarray) -> tuple[np.ndarray, np.ndarray]:
    """(write_code, nbits) per symbol: canonical codes bit-reversed so
    the LSB-first packer emits them in tree-descent (MSB-first)
    order."""
    codes = canonical_codes(lengths)
    wcodes = np.zeros(len(lengths), dtype=np.int64)
    for sym in np.nonzero(lengths > 0)[0]:
        wcodes[sym] = _reverse_bits(int(codes[sym]), int(lengths[sym]))
    return wcodes, np.asarray(lengths, dtype=np.int64)


def _write_prefix_code(
    bw: BitWriter, counts: np.ndarray, alphabet_size: int
) -> tuple[np.ndarray, np.ndarray]:
    """Write one prefix code (simple form when it fits, else the full
    code-length coding); returns (write_code, nbits) emission tables."""
    counts = np.asarray(counts, dtype=np.int64)
    used = np.nonzero(counts > 0)[0]
    codes = np.zeros(alphabet_size, dtype=np.int64)
    lens = np.zeros(alphabet_size, dtype=np.int64)
    if len(used) == 0:
        # the decoder reads five codes unconditionally; an unused
        # alphabet gets the cheapest valid one (1 symbol, 0 bits)
        bw.write(1, 1)
        bw.write(0, 1)
        bw.write(0, 1)
        bw.write(0, 1)
        return codes, lens
    if len(used) == 1 and used[0] <= 255:
        s = int(used[0])
        bw.write(1, 1)  # simple
        bw.write(0, 1)  # one symbol
        if s <= 1:
            bw.write(0, 1)
            bw.write(s, 1)
        else:
            bw.write(1, 1)
            bw.write(s, 8)
        return codes, lens  # zero-bit code
    if len(used) == 2 and used[1] <= 255:
        s0, s1 = int(used[0]), int(used[1])
        bw.write(1, 1)
        bw.write(1, 1)  # two symbols
        if s0 <= 1:
            bw.write(0, 1)
            bw.write(s0, 1)
        else:
            bw.write(1, 1)
            bw.write(s0, 8)
        bw.write(s1, 8)
        codes[s0], lens[s0] = 0, 1  # listed order, not canonical
        codes[s1], lens[s1] = 1, 1
        return codes, lens
    lengths = huffman_lengths(counts, 15)
    if len(used) == 1:
        # lone symbol > 255 can't use the simple form; pair it with a
        # dummy to keep the canonical code complete
        lengths[used[0]] = 1
        lengths[0 if used[0] != 0 else 1] = 1
    bw.write(0, 1)  # full form
    cl_stream = _rle_code_lengths(lengths)
    cl_counts = np.zeros(19, dtype=np.int64)
    for sym, _, _ in cl_stream:
        cl_counts[sym] += 1
    cl_lengths = huffman_lengths(cl_counts, 7)
    cl_used = np.nonzero(cl_lengths > 0)[0]
    if len(cl_used) == 1:
        other = 0 if cl_used[0] != 0 else 1
        cl_lengths[cl_used[0]] = 1
        cl_lengths[other] = 1
    bw.write(19 - 4, 4)  # all 19 code-length-code lengths
    for sym in _CL_ORDER:
        bw.write(int(cl_lengths[sym]), 3)
    bw.write(0, 1)  # no max_symbol shortcut
    cl_wcodes, cl_wlens = _emit_tables(cl_lengths)
    for sym, ev, eb in cl_stream:
        bw.write(int(cl_wcodes[sym]), int(cl_wlens[sym]))
        if eb:
            bw.write(ev, eb)
    return _emit_tables(lengths)


def _find_runs(flat: np.ndarray) -> list[tuple[int, int]]:
    """Maximal runs (start, length) of pixels equal to their left
    neighbor, each worth a distance-1 backref; long runs split at the
    LZ77 length cap."""
    if len(flat) < 2:
        return []
    eq = flat[1:] == flat[:-1]
    idx = np.flatnonzero(np.diff(np.concatenate(([0], eq.view(np.int8), [0]))))
    runs = []
    for s, e in zip(idx[::2], idx[1::2]):
        start, length = int(s) + 1, int(e - s)
        if length < _MIN_RUN:
            continue
        while length > 0:
            chunk = min(length, _MAX_LZ_LENGTH)
            runs.append((start, chunk))
            start += chunk
            length -= chunk
    return runs


def _encode_entropy_image(
    bw: BitWriter, flat: np.ndarray, level0: bool, use_lz: bool = False
) -> None:
    """One spatially-coded image: no color cache, no meta image; real
    per-channel Huffman codes; optional distance-1 LZ77 backrefs
    (through the close-neighborhood map) for pixel runs."""
    bw.write(0, 1)  # no color cache
    if level0:
        bw.write(0, 1)  # no entropy image
    runs = _find_runs(flat) if use_lz else []
    covered = np.zeros(len(flat), dtype=bool)
    for start, length in runs:
        covered[start:start + length] = True
    lit = flat[~covered].astype(np.int64)
    g_counts = np.bincount((lit >> 8) & 0xFF, minlength=280)
    r_counts = np.bincount((lit >> 16) & 0xFF, minlength=256)
    b_counts = np.bincount(lit & 0xFF, minlength=256)
    a_counts = np.bincount((lit >> 24) & 0xFF, minlength=256)
    d_counts = np.zeros(40, dtype=np.int64)
    len_tokens = []
    for _, length in runs:
        code, ev, eb = prefix_encode_value(length)
        g_counts[256 + code] += 1
        len_tokens.append((256 + code, ev, eb))
        # distance 1 → map entry (1, 0) → dist code 2 → prefix sym 1
        d_counts[prefix_encode_value(2)[0]] += 1
    gc, gl = _write_prefix_code(bw, g_counts, 280)
    rc, rl = _write_prefix_code(bw, r_counts, 256)
    bc, bl = _write_prefix_code(bw, b_counts, 256)
    ac, al = _write_prefix_code(bw, a_counts, 256)
    dc, dl = _write_prefix_code(bw, d_counts, 40)
    d_sym = prefix_encode_value(2)[0]

    def emit_literals(seg: np.ndarray) -> None:
        if len(seg) == 0:
            return
        seg = seg.astype(np.int64)
        g = (seg >> 8) & 0xFF
        r = (seg >> 16) & 0xFF
        b = seg & 0xFF
        a = (seg >> 24) & 0xFF
        vals = np.stack([gc[g], rc[r], bc[b], ac[a]], axis=1).reshape(-1)
        bits = np.stack([gl[g], rl[r], bl[b], al[a]], axis=1).reshape(-1)
        keep = bits > 0  # zero-bit (single-symbol) codes emit nothing
        bw.write_arrays(vals[keep], bits[keep])

    pos = 0
    for (start, length), (lsym, ev, eb) in zip(runs, len_tokens):
        emit_literals(flat[pos:start])
        bw.write(int(gc[lsym]), int(gl[lsym]))
        if eb:
            bw.write(ev, eb)
        if dl[d_sym]:
            bw.write(int(dc[d_sym]), int(dl[d_sym]))
        pos = start + length
    emit_literals(flat[pos:])


def _forward_predictor(img: np.ndarray, size_bits: int,
                       mode: int) -> np.ndarray:
    """Residuals for a uniform predictor mode (spec edge rules mirror
    the decoder's); forward prediction uses ORIGINAL neighbors, which
    is exactly what the decoder reconstructs progressively."""
    h, w = img.shape
    src = img.astype(np.int64)
    out = np.zeros_like(src)
    for y in range(h):
        for x in range(w):
            if x == 0 and y == 0:
                pred = 0xFF000000
            elif y == 0:
                pred = int(src[0, x - 1])
            elif x == 0:
                pred = int(src[y - 1, 0])
            else:
                L = int(src[y, x - 1])
                T = int(src[y - 1, x])
                TL = int(src[y - 1, x - 1])
                TR = int(src[y - 1, x + 1]) if x + 1 < w else int(src[y, 0])
                pred = _predict(mode, L, T, TL, TR)
            out[y, x] = _sub_pixels(int(src[y, x]), pred)
    return out.astype(np.uint32)


def vp8l_encode(
    argb: np.ndarray,
    subtract_green: bool = True,
    use_lz: bool = True,
    predictor_mode: int | None = None,
    palette: bool = False,
    color_transform: tuple[int, int, int] | None = None,
) -> bytes:
    """ARGB uint32 (h, w) → VP8L chunk payload. Transforms are written
    in argument order (palette, subtract_green, color_transform,
    predictor); the decoder inverts them in reverse.
    ``color_transform`` is a uniform (g2r, g2b, r2b) element (signed
    3.5 fixed-point bytes) applied image-wide."""
    h, w = argb.shape
    if not (1 <= w <= 1 << 14 and 1 <= h <= 1 << 14):
        raise ValueError("VP8L: dimensions out of range")
    bw = BitWriter()
    bw.write(w - 1, 14)
    bw.write(h - 1, 14)
    img = argb.astype(np.uint32)
    bw.write(int(np.any((img >> 24) & 0xFF != 255)), 1)  # alpha hint
    bw.write(0, 3)  # version
    eff_w = w
    if palette:
        colors = np.unique(img)
        if len(colors) > 256:
            raise ValueError("palette transform needs ≤ 256 colors")
        bw.write(1, 1)
        bw.write(3, 2)
        bw.write(len(colors) - 1, 8)
        prev = np.concatenate(([0], colors[:-1])).astype(np.uint32)
        deltas = np.zeros(len(colors), dtype=np.uint32)
        for i, (c, p) in enumerate(zip(colors, prev)):
            deltas[i] = _sub_pixels(int(c), int(p))
        _encode_entropy_image(bw, deltas, level0=False)
        lut = {int(c): i for i, c in enumerate(colors)}
        idx = np.vectorize(lut.__getitem__)(img.astype(np.int64))
        n = len(colors)
        width_bits = 3 if n <= 2 else 2 if n <= 4 else 1 if n <= 16 else 0
        if width_bits:
            per = 1 << width_bits
            bits = 8 >> width_bits
            eff_w = _sub_size(w, width_bits)
            packed = np.zeros((h, eff_w), dtype=np.int64)
            for k in range(per):
                cols = np.arange(eff_w) * per + k
                valid = cols < w
                packed[:, valid] |= idx[:, cols[valid]] << (k * bits)
            idx = packed
        img = (0xFF000000 | (idx.astype(np.uint32) << 8)).astype(np.uint32)
    if subtract_green:
        bw.write(1, 1)
        bw.write(2, 2)
        a, r, g, b = _unpack(img)
        img = _pack(a, (r - g) & 0xFF, g, (b - g) & 0xFF)
    if color_transform is not None:
        g2r, g2b, r2b = color_transform
        bw.write(1, 1)
        bw.write(1, 2)
        size_bits = 4
        bw.write(size_bits - 2, 3)
        tw, th = _sub_size(eff_w, size_bits), _sub_size(h, size_bits)
        cte_px = 0xFF000000 | (r2b << 16) | (g2b << 8) | g2r
        _encode_entropy_image(
            bw, np.full(th * tw, cte_px, dtype=np.uint32), level0=False
        )
        a, r, g, b = _unpack(img)
        # forward: stored red/blue subtract the deltas the inverse
        # adds back (inverse's red input to r2b is the ORIGINAL red)
        e = np.full_like(g, 1)
        sr = (r - _ct_delta(e * g2r, g)) & 0xFF
        sb = (b - _ct_delta(e * g2b, g) - _ct_delta(e * r2b, r)) & 0xFF
        img = _pack(a, sr, g, sb)
    if predictor_mode is not None:
        bw.write(1, 1)
        bw.write(0, 2)
        size_bits = 4
        bw.write(size_bits - 2, 3)
        tw, th = _sub_size(eff_w, size_bits), _sub_size(h, size_bits)
        sub = np.full(
            (th, tw), 0xFF000000 | (predictor_mode << 8), dtype=np.uint32
        )
        _encode_entropy_image(bw, sub.reshape(-1), level0=False)
        img = _forward_predictor(img, size_bits, predictor_mode)
    bw.write(0, 1)  # end of transforms
    _encode_entropy_image(bw, img.reshape(-1), level0=True, use_lz=use_lz)
    return b"\x2f" + bw.tobytes()


def webp_encode(
    pixels: np.ndarray,
    subtract_green: bool = True,
    use_lz: bool = True,
    predictor_mode: int | None = None,
    palette: bool = False,
    color_transform: tuple[int, int, int] | None = None,
) -> bytes:
    """(h, w) gray / (h, w, 3) RGB / (h, w, 4) RGBA uint8 → lossless
    .webp bytes (RIFF + VP8L)."""
    px = np.asarray(pixels, dtype=np.uint8)
    if px.ndim == 2:
        px = np.stack([px, px, px], axis=-1)
    h, w = px.shape[:2]
    r = px[..., 0].astype(np.uint32)
    g = px[..., 1].astype(np.uint32)
    b = px[..., 2].astype(np.uint32)
    a = (
        px[..., 3].astype(np.uint32)
        if px.shape[-1] == 4
        else np.full((h, w), 255, dtype=np.uint32)
    )
    argb = (a << 24) | (r << 16) | (g << 8) | b
    payload = vp8l_encode(
        argb, subtract_green=subtract_green, use_lz=use_lz,
        predictor_mode=predictor_mode, palette=palette,
        color_transform=color_transform,
    )
    chunk = b"VP8L" + len(payload).to_bytes(4, "little") + payload
    if len(payload) & 1:
        chunk += b"\x00"
    riff = b"WEBP" + chunk
    return b"RIFF" + len(riff).to_bytes(4, "little") + riff
