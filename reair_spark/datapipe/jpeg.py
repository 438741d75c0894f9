"""Baseline JPEG codec (ITU-T T.81, baseline sequential DCT) in
numpy + stdlib — no imaging library.

This closes the engine's last environment-blocked image codec
(VERDICT r6 ask #5; PNG landed in round 6 the same way): the
multimodal pipeline can now encode AND decode real JPEG files without
PIL; datapipe/flac.py closes the audio side the same way, leaving
only GIF/TIFF/WebP behind the external-library capability gate.

What is implemented, per the spec:

encoder (grayscale and 4:2:0 YCbCr color):
  - level shift, 8×8 forward DCT (exact orthonormal matrix, einsum
    over all blocks at once), quantization against DQT tables,
  - zigzag ordering, DC differential coding, AC run-length coding
    (EOB / ZRL 16-zero runs), magnitude categories with one's-
    complement negative value bits (F.1.2.1),
  - canonical Huffman coding from (BITS, HUFFVAL) pairs (Annex C),
    byte stuffing (0xFF → 0xFF 0x00), 1-padded final byte,
  - JFIF APP0, DQT (zigzag order, as the spec stores them), SOF0,
    DHT, SOS, EOI marker structure; RGB → YCbCr (JFIF/BT.601) with
    2×2 mean chroma subsampling for the color path.

decoder (any baseline file our scope emits, plus the general cases):
  - full marker walk (skips APPn/COM; DQT/DHT/DRI/SOF0/SOS parsed;
    SOF1/2 rejected with a clear error — baseline only),
  - canonical Huffman table reconstruction from DHT, bit-reader with
    byte unstuffing and RSTn handling (DC predictors + bit alignment
    reset),
  - interleaved MCU scan for arbitrary (h, v) sampling factors,
    dequantize → dezigzag → inverse DCT (einsum over all blocks),
  - nearest-neighbor chroma upsampling to the luma grid, crop to the
    SOF dimensions, YCbCr → RGB for 3-component scans.

The Huffman tables default to the Annex K typical tables, but both
sides treat DHT as authoritative — any table set round-trips.

Exactness note for the oracle gate (multimodal_jpeg_roundtrip): JPEG
is lossy in general, but an image whose every 8×8 block is CONSTANT
survives exactly when the DC quantizer divides 8: the level-shifted
block has DC = 8·(v−128) and zero AC, so quantization is exact
integer arithmetic and the IDCT reproduces v to machine epsilon.
The gate rasterizes one document byte per block against a DC=8
quantization table, which makes the decoded statistics a closed-form
function of the text — while the bytes on the wire still pass through
every real stage (DCT, quantizer, zigzag, DC prediction, Huffman,
stuffing, marker framing, the full parser back). Lossy-path fidelity
is covered by pytest PSNR bounds instead (tests/test_jpeg.py).
"""

from __future__ import annotations

import struct

import numpy as np

# --------------------------------------------------------------- tables

#: Annex K.1 luminance quantization table (natural order).
QTABLE_LUMA = np.array([
    [16, 11, 10, 16, 24, 40, 51, 61],
    [12, 12, 14, 19, 26, 58, 60, 55],
    [14, 13, 16, 24, 40, 57, 69, 56],
    [14, 17, 22, 29, 51, 87, 80, 62],
    [18, 22, 37, 56, 68, 109, 103, 77],
    [24, 35, 55, 64, 81, 104, 113, 92],
    [49, 64, 78, 87, 103, 121, 120, 101],
    [72, 92, 95, 98, 112, 100, 103, 99],
], dtype=np.int32)

#: Annex K.2 chrominance quantization table (natural order).
QTABLE_CHROMA = np.array([
    [17, 18, 24, 47, 99, 99, 99, 99],
    [18, 21, 26, 66, 99, 99, 99, 99],
    [24, 26, 56, 99, 99, 99, 99, 99],
    [47, 66, 99, 99, 99, 99, 99, 99],
    [99, 99, 99, 99, 99, 99, 99, 99],
    [99, 99, 99, 99, 99, 99, 99, 99],
    [99, 99, 99, 99, 99, 99, 99, 99],
    [99, 99, 99, 99, 99, 99, 99, 99],
], dtype=np.int32)

#: A DC-exact table (every entry 8): quantization divides the DC of a
#: constant block exactly, the lossless-by-construction input class
#: the oracle gate uses. Still a perfectly ordinary DQT on the wire.
QTABLE_DC_EXACT = np.full((8, 8), 8, dtype=np.int32)

# Annex K.3 typical Huffman tables as (BITS[16], HUFFVAL) pairs.
DC_LUMA_BITS = [0, 1, 5, 1, 1, 1, 1, 1, 1, 0, 0, 0, 0, 0, 0, 0]
DC_LUMA_VALS = list(range(12))
DC_CHROMA_BITS = [0, 3, 1, 1, 1, 1, 1, 1, 1, 1, 1, 0, 0, 0, 0, 0]
DC_CHROMA_VALS = list(range(12))

AC_LUMA_BITS = [0, 2, 1, 3, 3, 2, 4, 3, 5, 5, 4, 4, 0, 0, 1, 125]
AC_LUMA_VALS = [
    0x01, 0x02, 0x03, 0x00, 0x04, 0x11, 0x05, 0x12,
    0x21, 0x31, 0x41, 0x06, 0x13, 0x51, 0x61, 0x07,
    0x22, 0x71, 0x14, 0x32, 0x81, 0x91, 0xA1, 0x08,
    0x23, 0x42, 0xB1, 0xC1, 0x15, 0x52, 0xD1, 0xF0,
    0x24, 0x33, 0x62, 0x72, 0x82, 0x09, 0x0A, 0x16,
    0x17, 0x18, 0x19, 0x1A, 0x25, 0x26, 0x27, 0x28,
    0x29, 0x2A, 0x34, 0x35, 0x36, 0x37, 0x38, 0x39,
    0x3A, 0x43, 0x44, 0x45, 0x46, 0x47, 0x48, 0x49,
    0x4A, 0x53, 0x54, 0x55, 0x56, 0x57, 0x58, 0x59,
    0x5A, 0x63, 0x64, 0x65, 0x66, 0x67, 0x68, 0x69,
    0x6A, 0x73, 0x74, 0x75, 0x76, 0x77, 0x78, 0x79,
    0x7A, 0x83, 0x84, 0x85, 0x86, 0x87, 0x88, 0x89,
    0x8A, 0x92, 0x93, 0x94, 0x95, 0x96, 0x97, 0x98,
    0x99, 0x9A, 0xA2, 0xA3, 0xA4, 0xA5, 0xA6, 0xA7,
    0xA8, 0xA9, 0xAA, 0xB2, 0xB3, 0xB4, 0xB5, 0xB6,
    0xB7, 0xB8, 0xB9, 0xBA, 0xC2, 0xC3, 0xC4, 0xC5,
    0xC6, 0xC7, 0xC8, 0xC9, 0xCA, 0xD2, 0xD3, 0xD4,
    0xD5, 0xD6, 0xD7, 0xD8, 0xD9, 0xDA, 0xE1, 0xE2,
    0xE3, 0xE4, 0xE5, 0xE6, 0xE7, 0xE8, 0xE9, 0xEA,
    0xF1, 0xF2, 0xF3, 0xF4, 0xF5, 0xF6, 0xF7, 0xF8,
    0xF9, 0xFA,
]
AC_CHROMA_BITS = [0, 2, 1, 2, 4, 4, 3, 4, 7, 5, 4, 4, 0, 1, 2, 119]
AC_CHROMA_VALS = [
    0x00, 0x01, 0x02, 0x03, 0x11, 0x04, 0x05, 0x21,
    0x31, 0x06, 0x12, 0x41, 0x51, 0x07, 0x61, 0x71,
    0x13, 0x22, 0x32, 0x81, 0x08, 0x14, 0x42, 0x91,
    0xA1, 0xB1, 0xC1, 0x09, 0x23, 0x33, 0x52, 0xF0,
    0x15, 0x62, 0x72, 0xD1, 0x0A, 0x16, 0x24, 0x34,
    0xE1, 0x25, 0xF1, 0x17, 0x18, 0x19, 0x1A, 0x26,
    0x27, 0x28, 0x29, 0x2A, 0x35, 0x36, 0x37, 0x38,
    0x39, 0x3A, 0x43, 0x44, 0x45, 0x46, 0x47, 0x48,
    0x49, 0x4A, 0x53, 0x54, 0x55, 0x56, 0x57, 0x58,
    0x59, 0x5A, 0x63, 0x64, 0x65, 0x66, 0x67, 0x68,
    0x69, 0x6A, 0x73, 0x74, 0x75, 0x76, 0x77, 0x78,
    0x79, 0x7A, 0x82, 0x83, 0x84, 0x85, 0x86, 0x87,
    0x88, 0x89, 0x8A, 0x92, 0x93, 0x94, 0x95, 0x96,
    0x97, 0x98, 0x99, 0x9A, 0xA2, 0xA3, 0xA4, 0xA5,
    0xA6, 0xA7, 0xA8, 0xA9, 0xAA, 0xB2, 0xB3, 0xB4,
    0xB5, 0xB6, 0xB7, 0xB8, 0xB9, 0xBA, 0xC2, 0xC3,
    0xC4, 0xC5, 0xC6, 0xC7, 0xC8, 0xC9, 0xCA, 0xD2,
    0xD3, 0xD4, 0xD5, 0xD6, 0xD7, 0xD8, 0xD9, 0xDA,
    0xE2, 0xE3, 0xE4, 0xE5, 0xE6, 0xE7, 0xE8, 0xE9,
    0xEA, 0xF2, 0xF3, 0xF4, 0xF5, 0xF6, 0xF7, 0xF8,
    0xF9, 0xFA,
]

for _bits, _vals in (
    (DC_LUMA_BITS, DC_LUMA_VALS), (DC_CHROMA_BITS, DC_CHROMA_VALS),
    (AC_LUMA_BITS, AC_LUMA_VALS), (AC_CHROMA_BITS, AC_CHROMA_VALS),
):
    assert sum(_bits) == len(_vals), "corrupt Huffman table constants"


def _zigzag_order() -> np.ndarray:
    """(row, col) visit order of the 64 coefficients (Figure 5)."""
    coords = []
    for s in range(15):
        diag = [(r, s - r) for r in range(max(0, s - 7), min(s, 7) + 1)]
        if s % 2 == 0:
            diag.reverse()  # even diagonals run bottom-left → top-right
        coords.extend(diag)
    return np.array(coords, dtype=np.int64)


_ZZ = _zigzag_order()
_ZZ_FLAT = _ZZ[:, 0] * 8 + _ZZ[:, 1]          # natural idx per zigzag pos
_UNZZ_FLAT = np.argsort(_ZZ_FLAT)             # zigzag pos per natural idx


def _dct_matrix() -> np.ndarray:
    m = np.zeros((8, 8))
    for u in range(8):
        cu = (1 / np.sqrt(2)) if u == 0 else 1.0
        for x in range(8):
            m[u, x] = 0.5 * cu * np.cos((2 * x + 1) * u * np.pi / 16)
    return m


_DCT_M = _dct_matrix()


def _blocks_of(plane: np.ndarray) -> tuple[np.ndarray, int, int]:
    """Pad (edge-replicate) to 8-multiples, return (n,8,8) blocks."""
    h, w = plane.shape
    ph, pw = -(-h // 8) * 8, -(-w // 8) * 8
    if (ph, pw) != (h, w):
        plane = np.pad(plane, ((0, ph - h), (0, pw - w)), mode="edge")
    nbh, nbw = ph // 8, pw // 8
    blocks = plane.reshape(nbh, 8, nbw, 8).transpose(0, 2, 1, 3)
    return blocks.reshape(-1, 8, 8), nbh, nbw


def _unblocks(blocks: np.ndarray, nbh: int, nbw: int) -> np.ndarray:
    return (
        blocks.reshape(nbh, nbw, 8, 8)
        .transpose(0, 2, 1, 3)
        .reshape(nbh * 8, nbw * 8)
    )


def _fdct(blocks: np.ndarray) -> np.ndarray:
    # batched BLAS matmuls: M @ B @ Mᵀ over the whole (n,8,8) stack
    return _DCT_M @ blocks @ _DCT_M.T


def _idct(blocks: np.ndarray) -> np.ndarray:
    return _DCT_M.T @ blocks @ _DCT_M


# --------------------------------------------------------- huffman/bits


def _canonical_codes(bits: list[int], vals: list[int]) -> dict[int, tuple[int, int]]:
    """symbol → (code, length), per Annex C's canonical assignment."""
    out, code, k = {}, 0, 0
    for length in range(1, 17):
        for _ in range(bits[length - 1]):
            out[vals[k]] = (code, length)
            code += 1
            k += 1
        code <<= 1
    return out


_FAST_TABLE_CACHE: dict[tuple, tuple[np.ndarray, np.ndarray]] = {}


def _fast_table(bits: list[int], vals: list[int]):
    """(sym[65536], len[65536]): every 16-bit window maps straight to
    its leading symbol and code length — one array load replaces the
    bit-by-bit canonical walk. Tables repeat across images (DHT
    contents are the key), so the 64K build cost amortizes to zero."""
    key = (tuple(bits), tuple(vals))
    hit = _FAST_TABLE_CACHE.get(key)
    if hit is not None:
        return hit
    sym_arr = np.zeros(1 << 16, dtype=np.uint16)
    len_arr = np.zeros(1 << 16, dtype=np.uint8)  # 0 = invalid prefix
    for sym, (code, length) in _canonical_codes(bits, vals).items():
        start = code << (16 - length)
        end = (code + 1) << (16 - length)
        sym_arr[start:end] = sym
        len_arr[start:end] = length
    # plain lists: the symbol loop indexes these millions of times
    out = (sym_arr.tolist(), len_arr.tolist())
    _FAST_TABLE_CACHE[key] = out
    return out


class _SegmentReader:
    """Entropy reader over pre-unstuffed restart chunks: a sliding
    32-bit window array gives any 16 bits at any bit position in one
    index — no per-bit Python. RSTn resyncs jump to the next chunk."""

    def __init__(self, chunks: list[bytes]):
        self._chunks = chunks
        self._ci = -1
        self._next_chunk()

    def _next_chunk(self) -> None:
        self._ci += 1
        if self._ci >= len(self._chunks):
            raise ValueError("expected RSTn marker, hit end of data")
        raw = self._chunks[self._ci] + b"\x00" * 8  # zero-fill past end
        b = np.frombuffer(raw, dtype=np.uint8).astype(np.uint32)
        win = (b[:-3] << 24) | (b[1:-2] << 16) | (b[2:-1] << 8) | b[3:]
        # plain-list indexing beats numpy scalar indexing ~7× in the
        # per-symbol loop (this is the decode hot path)
        self._win = win.tolist()
        self.pos = 0

    def _peek16(self) -> int:
        p = self.pos
        return (self._win[p >> 3] >> (16 - (p & 7))) & 0xFFFF

    def read_symbol(self, table) -> int:
        p = self.pos
        w = (self._win[p >> 3] >> (16 - (p & 7))) & 0xFFFF
        length = table[1][w]
        if length == 0:
            raise ValueError("invalid Huffman code in entropy segment")
        self.pos = p + length
        return table[0][w]

    def read_bits(self, n: int) -> int:
        if n == 0:
            return 0
        p = self.pos
        v = ((self._win[p >> 3] >> (16 - (p & 7))) & 0xFFFF) >> (16 - n)
        self.pos = p + n
        return v

    def resync_restart(self) -> None:
        self._next_chunk()


def _split_entropy(payload: bytes, pos: int) -> list[bytes]:
    """Unstuff the entropy-coded data starting at ``pos`` and split it
    at restart markers; one numpy pass over the segment instead of a
    per-byte state machine."""
    data = np.frombuffer(payload, dtype=np.uint8)
    ff = np.flatnonzero(data[pos:-1] == 0xFF) + pos
    nxt = data[ff + 1]
    # the first non-(stuffing|restart) marker ends the scan
    term = ff[(nxt != 0x00) & ~((nxt >= 0xD0) & (nxt <= 0xD7))]
    end = int(term[0]) if term.size else len(payload)
    seg = data[pos:end]
    rel_ff = np.flatnonzero(seg[:-1] == 0xFF)
    rel_nxt = seg[rel_ff + 1]
    stuff = rel_ff[rel_nxt == 0x00] + 1        # the 0x00 after FF
    rst = rel_ff[(rel_nxt >= 0xD0) & (rel_nxt <= 0xD7)]
    cuts = sorted(rst)
    drop = set(stuff.tolist())
    for r in rst.tolist():
        drop.add(r)
        drop.add(r + 1)
    chunks, start = [], 0
    keep_mask = np.ones(seg.size, dtype=bool)
    keep_mask[list(drop)] = False
    for r in cuts:
        part = seg[start:r]
        chunks.append(part[keep_mask[start:r]].tobytes())
        start = r + 2
    part = seg[start:]
    chunks.append(part[keep_mask[start:]].tobytes())
    return chunks


def _extend(bits: int, size: int) -> int:
    """Inverse of _value_bits (F.2.2.1 EXTEND)."""
    if size == 0:
        return 0
    return bits if bits >= (1 << (size - 1)) else bits - (1 << size) + 1


# -------------------------------------------------------------- encoder


def _quantize_plane(plane: np.ndarray, qtable: np.ndarray):
    blocks, nbh, nbw = _blocks_of(plane.astype(np.float64) - 128.0)
    coeff = np.rint(_fdct(blocks) / qtable.astype(np.float64)).astype(np.int32)
    # zigzag every block at once → (n, 64)
    return coeff.reshape(-1, 64)[:, _ZZ_FLAT], nbh, nbw


def _code_arrays(codes: dict[int, tuple[int, int]]):
    """dict → (code[256], length[256]) uint32 arrays for vector use."""
    c = np.zeros(256, dtype=np.uint32)
    ln = np.zeros(256, dtype=np.uint32)
    for sym, (code, length) in codes.items():
        c[sym], ln[sym] = code, length
    return c, ln


def _category_vec(v: np.ndarray) -> np.ndarray:
    """Vectorized magnitude category (bit length of |v|)."""
    a = np.abs(v).astype(np.int64)
    out = np.zeros(a.shape, dtype=np.int64)
    nz = a > 0
    out[nz] = np.floor(np.log2(a[nz])).astype(np.int64) + 1
    return out


def _pack_pairs(values: np.ndarray, lengths: np.ndarray) -> bytes:
    """Concatenate variable-length big-endian codes into a 1-padded,
    0xFF-stuffed byte string — the whole scan packed in one numpy
    pass (the JPEG counterpart of round 6's whole-image PNG filter
    vectorization)."""
    total = int(lengths.sum())
    pad = (-total) % 8
    if pad:
        values = np.append(values.astype(np.uint64), (1 << pad) - 1)
        lengths = np.append(lengths.astype(np.uint64), pad)
    j = np.arange(16)
    shifts = lengths[:, None].astype(np.int64) - 1 - j
    valid = shifts >= 0
    bits = (values[:, None].astype(np.uint64)
            >> np.maximum(shifts, 0).astype(np.uint64)) & 1
    # row-major selection preserves stream order
    flat = bits[valid].astype(np.uint8)
    packed = np.packbits(flat)
    stuffed = np.insert(
        packed, np.flatnonzero(packed == 0xFF) + 1, 0
    )
    return stuffed.tobytes()


def _entropy_encode(
    zz: np.ndarray,
    comp_of_block: np.ndarray,
    dc_tabs: list[tuple[np.ndarray, np.ndarray]],
    ac_tabs: list[tuple[np.ndarray, np.ndarray]],
) -> bytes:
    """Whole-scan vectorized entropy coder: DC differential + AC
    run-length symbols for EVERY block at once, merged into stream
    order with one lexsort, packed with one numpy pass.

    ``zz`` is (N, 64) quantized zigzag coefficients in SCAN order;
    ``comp_of_block`` maps each block to the component whose Huffman
    tables and DC predictor chain it uses."""
    n = zz.shape[0]
    recs_v, recs_l, k1, k2, k3 = [], [], [], [], []

    def emit(values, lengths, b, col, sub):
        recs_v.append(values.astype(np.uint64))
        recs_l.append(lengths.astype(np.uint64))
        k1.append(b)
        k2.append(col)
        k3.append(sub)

    # ---- DC: per-component differential chains ----
    dc = zz[:, 0].astype(np.int64)
    blocks_idx = np.arange(n, dtype=np.int64)
    for ci, (codes, lens) in enumerate(dc_tabs):
        idx = blocks_idx[comp_of_block == ci]
        if idx.size == 0:
            continue
        d = np.diff(dc[idx], prepend=0)
        s = _category_vec(d)
        vb = np.where(d >= 0, d, d + (1 << s) - 1).astype(np.uint64)
        emit(codes[s], lens[s], idx, np.zeros(idx.size), np.zeros(idx.size))
        has = s > 0
        emit(vb[has], s[has], idx[has],
             np.zeros(has.sum()), np.ones(has.sum()))

    # ---- AC: nonzero positions, runs, ZRL, EOB ----
    r, k = np.nonzero(zz[:, 1:])
    k = k + 1  # true zigzag position
    same = np.empty(r.shape, dtype=bool)
    same[0:1] = False
    same[1:] = r[1:] == r[:-1]
    prev_k = np.empty_like(k)
    prev_k[1:] = k[:-1]
    run = np.where(same, k - prev_k - 1, k - 1)
    n_zrl = run >> 4
    rem = run & 0xF
    s = _category_vec(zz[r, k].astype(np.int64))
    sym = (rem << 4) | s
    vb = np.where(zz[r, k] >= 0, zz[r, k],
                  zz[r, k] + (1 << s) - 1).astype(np.int64)

    for ci, (codes, lens) in enumerate(ac_tabs):
        m = comp_of_block[r] == ci
        if not np.any(m) and not np.any(comp_of_block == ci):
            continue
        rm, km = r[m], k[m]
        # ZRL markers: t-th of n_zrl[j] sits just before nonzero j
        zr = np.repeat(rm, n_zrl[m])
        zk = np.repeat(km, n_zrl[m])
        if zr.size:
            reps = n_zrl[m]
            sub = (np.arange(zr.size)
                   - np.repeat(np.cumsum(reps) - reps, reps))
            emit(np.full(zr.size, codes[0xF0]),
                 np.full(zr.size, lens[0xF0]),
                 zr, zk, sub - 40)  # before the coefficient's own pair
        emit(codes[sym[m]], lens[sym[m]], rm, km, np.zeros(rm.size))
        emit(vb[m].astype(np.uint64), s[m], rm, km, np.ones(rm.size))
        # EOB for this component's blocks whose last nonzero < 63
        cblocks = blocks_idx[comp_of_block == ci]
        last_nz = np.zeros(n, dtype=np.int64)
        last_nz[rm] = km  # (r, k) are sorted → final write wins
        eob = cblocks[last_nz[cblocks] < 63]
        emit(np.full(eob.size, codes[0x00]),
             np.full(eob.size, lens[0x00]),
             eob, np.full(eob.size, 64), np.zeros(eob.size))

    values = np.concatenate(recs_v)
    lengths = np.concatenate(recs_l)
    key1 = np.concatenate(k1).astype(np.int64)
    key2 = np.concatenate(k2).astype(np.int64)
    key3 = np.concatenate(k3).astype(np.int64)
    order = np.lexsort((key3, key2, key1))
    return _pack_pairs(values[order], lengths[order])


def _seg(marker: int, body: bytes) -> bytes:
    return struct.pack(">BBH", 0xFF, marker, len(body) + 2) + body


def _dqt_seg(tq: int, qtable: np.ndarray) -> bytes:
    zz = qtable.reshape(64)[_ZZ_FLAT]  # DQT stores zigzag order
    return _seg(0xDB, bytes([tq]) + bytes(int(x) for x in zz))


def _dht_seg(tc: int, th: int, bits: list[int], vals: list[int]) -> bytes:
    return _seg(0xC4, bytes([(tc << 4) | th]) + bytes(bits) + bytes(vals))


_APP0_JFIF = _seg(0xE0, b"JFIF\x00\x01\x01\x00\x00\x01\x00\x01\x00\x00")


def jpeg_encode_gray(
    gray: np.ndarray,
    qtable: np.ndarray | None = None,
    restart_interval: int = 0,
) -> bytes:
    """Grayscale baseline JPEG: one component, (1,1) sampling.

    ``restart_interval`` > 0 emits a DRI segment and an RSTn marker
    every N MCUs (one MCU = one block here), resetting the DC
    predictor and byte alignment — the error-resilience feature real
    encoders use on large scans."""
    if gray.ndim != 2:
        raise ValueError("expected a 2-D grayscale array")
    q = QTABLE_LUMA if qtable is None else np.asarray(qtable, dtype=np.int32)
    h, w = gray.shape
    zz_blocks, nbh, nbw = _quantize_plane(np.asarray(gray, dtype=np.uint8), q)

    dc_tab = [_code_arrays(_canonical_codes(DC_LUMA_BITS, DC_LUMA_VALS))]
    ac_tab = [_code_arrays(_canonical_codes(AC_LUMA_BITS, AC_LUMA_VALS))]
    comp = np.zeros(zz_blocks.shape[0], dtype=np.int64)
    if restart_interval:
        # each restart chunk is its own byte-aligned entropy segment
        # with a fresh DC predictor — exactly what RSTn means
        chunks = []
        for ri, start in enumerate(range(0, zz_blocks.shape[0],
                                         restart_interval)):
            seg_zz = zz_blocks[start: start + restart_interval]
            if ri:
                chunks.append(bytes([0xFF, 0xD0 + ((ri - 1) % 8)]))
            chunks.append(_entropy_encode(
                seg_zz, comp[: seg_zz.shape[0]], dc_tab, ac_tab))
        data = b"".join(chunks)
    else:
        data = _entropy_encode(zz_blocks, comp, dc_tab, ac_tab)

    dri = _seg(0xDD, struct.pack(">H", restart_interval)) \
        if restart_interval else b""
    sof = _seg(0xC0, struct.pack(">BHHB", 8, h, w, 1) + bytes([1, 0x11, 0]))
    sos = _seg(0xDA, bytes([1, 1, 0x00, 0, 63, 0]))
    return (
        b"\xff\xd8" + _APP0_JFIF + _dqt_seg(0, q)
        + _dht_seg(0, 0, DC_LUMA_BITS, DC_LUMA_VALS)
        + _dht_seg(1, 0, AC_LUMA_BITS, AC_LUMA_VALS)
        + dri + sof + sos + data + b"\xff\xd9"
    )


def _rgb_to_ycbcr(rgb: np.ndarray) -> tuple[np.ndarray, np.ndarray, np.ndarray]:
    r = rgb[..., 0].astype(np.float64)
    g = rgb[..., 1].astype(np.float64)
    b = rgb[..., 2].astype(np.float64)
    y = 0.299 * r + 0.587 * g + 0.114 * b
    cb = -0.168736 * r - 0.331264 * g + 0.5 * b + 128.0
    cr = 0.5 * r - 0.418688 * g - 0.081312 * b + 128.0
    clip = lambda p: np.clip(np.rint(p), 0, 255).astype(np.uint8)  # noqa: E731
    return clip(y), clip(cb), clip(cr)


def _subsample2(plane: np.ndarray) -> np.ndarray:
    """2×2 mean chroma subsampling (pad odd edges by replication)."""
    h, w = plane.shape
    if h % 2 or w % 2:
        plane = np.pad(plane, ((0, h % 2), (0, w % 2)), mode="edge")
        h, w = plane.shape
    p = plane.astype(np.float64).reshape(h // 2, 2, w // 2, 2)
    return np.clip(np.rint(p.mean(axis=(1, 3))), 0, 255).astype(np.uint8)


def jpeg_encode_rgb(rgb: np.ndarray) -> bytes:
    """Color baseline JPEG: YCbCr, 4:2:0 (luma (2,2), chroma (1,1))."""
    if rgb.ndim != 3 or rgb.shape[2] != 3:
        raise ValueError("expected an (h, w, 3) RGB array")
    h, w = rgb.shape[:2]
    y, cb, cr = _rgb_to_ycbcr(np.asarray(rgb, dtype=np.uint8))
    cb, cr = _subsample2(cb), _subsample2(cr)

    # pad Y to 16-multiples so each MCU holds a full 2×2 of Y blocks
    ph, pw = -(-h // 16) * 16, -(-w // 16) * 16
    y = np.pad(y, ((0, ph - h), (0, pw - w)), mode="edge")
    cb = np.pad(cb, ((0, ph // 2 - cb.shape[0]), (0, pw // 2 - cb.shape[1])),
                mode="edge")
    cr = np.pad(cr, ((0, ph // 2 - cr.shape[0]), (0, pw // 2 - cr.shape[1])),
                mode="edge")

    zz_y, nbh_y, nbw_y = _quantize_plane(y, QTABLE_LUMA)
    zz_cb, nbh_c, nbw_c = _quantize_plane(cb, QTABLE_CHROMA)
    zz_cr, _, _ = _quantize_plane(cr, QTABLE_CHROMA)

    # interleaved MCU scan order: 2×2 Y blocks (row-major), Cb, Cr —
    # built as one gather so the whole scan entropy-codes vectorized
    mr, mc = np.meshgrid(np.arange(nbh_c), np.arange(nbw_c), indexing="ij")
    mr, mc = mr.ravel(), mc.ravel()
    y_idx = np.stack([
        (mr * 2 + dy) * nbw_y + (mc * 2 + dx)
        for dy in range(2) for dx in range(2)
    ], axis=1)                       # (n_mcu, 4)
    c_idx = mr * nbw_c + mc          # (n_mcu,)
    scan_zz = np.concatenate([
        zz_y[y_idx.reshape(-1)].reshape(-1, 4, 64),
        zz_cb[c_idx][:, None, :],
        zz_cr[c_idx][:, None, :],
    ], axis=1).reshape(-1, 64)       # (n_mcu*6, 64) in scan order
    comp = np.tile(np.array([0, 0, 0, 0, 1, 2]), mr.size)

    dc_tabs = [
        _code_arrays(_canonical_codes(DC_LUMA_BITS, DC_LUMA_VALS)),
        _code_arrays(_canonical_codes(DC_CHROMA_BITS, DC_CHROMA_VALS)),
        _code_arrays(_canonical_codes(DC_CHROMA_BITS, DC_CHROMA_VALS)),
    ]
    ac_tabs = [
        _code_arrays(_canonical_codes(AC_LUMA_BITS, AC_LUMA_VALS)),
        _code_arrays(_canonical_codes(AC_CHROMA_BITS, AC_CHROMA_VALS)),
        _code_arrays(_canonical_codes(AC_CHROMA_BITS, AC_CHROMA_VALS)),
    ]
    data = _entropy_encode(scan_zz, comp, dc_tabs, ac_tabs)

    sof = _seg(0xC0, struct.pack(">BHHB", 8, h, w, 3)
               + bytes([1, 0x22, 0]) + bytes([2, 0x11, 1]) + bytes([3, 0x11, 1]))
    sos = _seg(0xDA, bytes([3, 1, 0x00, 2, 0x11, 3, 0x11, 0, 63, 0]))
    return (
        b"\xff\xd8" + _APP0_JFIF
        + _dqt_seg(0, QTABLE_LUMA) + _dqt_seg(1, QTABLE_CHROMA)
        + _dht_seg(0, 0, DC_LUMA_BITS, DC_LUMA_VALS)
        + _dht_seg(1, 0, AC_LUMA_BITS, AC_LUMA_VALS)
        + _dht_seg(0, 1, DC_CHROMA_BITS, DC_CHROMA_VALS)
        + _dht_seg(1, 1, AC_CHROMA_BITS, AC_CHROMA_VALS)
        + sof + sos + data + b"\xff\xd9"
    )


# -------------------------------------------------------------- decoder


def jpeg_decode(payload: bytes) -> np.ndarray:
    """Decode a baseline JPEG. Returns (h, w) uint8 for 1-component
    files, (h, w, 3) uint8 RGB for 3-component (YCbCr) files."""
    if payload[:2] != b"\xff\xd8":
        raise ValueError("not a JPEG (missing SOI)")
    qtables: dict[int, np.ndarray] = {}
    htables: dict[tuple[int, int], dict] = {}
    restart_interval = 0
    sof = None
    pos = 2
    n = len(payload)
    while pos < n:
        if payload[pos] != 0xFF:
            raise ValueError(f"expected marker at byte {pos}")
        marker = payload[pos + 1]
        pos += 2
        if marker == 0xD9:  # EOI
            break
        if marker in (0x01,) or 0xD0 <= marker <= 0xD7:
            continue  # parameterless
        (seglen,) = struct.unpack_from(">H", payload, pos)
        body = payload[pos + 2: pos + seglen]
        pos += seglen
        if marker == 0xDB:  # DQT (possibly several tables per segment)
            off = 0
            while off < len(body):
                pq, tq = body[off] >> 4, body[off] & 0x0F
                if pq != 0:
                    raise ValueError("only 8-bit quantization tables")
                zz = np.frombuffer(body, dtype=np.uint8,
                                   count=64, offset=off + 1)
                nat = np.empty(64, dtype=np.int32)
                nat[_ZZ_FLAT] = zz
                qtables[tq] = nat.reshape(8, 8)
                off += 65
        elif marker == 0xC4:  # DHT
            off = 0
            while off < len(body):
                tc, th = body[off] >> 4, body[off] & 0x0F
                bits = list(body[off + 1: off + 17])
                nvals = sum(bits)
                vals = list(body[off + 17: off + 17 + nvals])
                htables[(tc, th)] = _fast_table(bits, vals)
                off += 17 + nvals
        elif marker == 0xDD:  # DRI
            (restart_interval,) = struct.unpack(">H", body)
        elif marker == 0xC0:  # SOF0 baseline
            prec, height, width, nf = struct.unpack_from(">BHHB", body)
            if prec != 8:
                raise ValueError("only 8-bit precision")
            comps = []
            for i in range(nf):
                cid, hv, tq = body[6 + 3 * i: 9 + 3 * i]
                comps.append({"id": cid, "h": hv >> 4, "v": hv & 0x0F,
                              "tq": tq})
            sof = {"h": height, "w": width, "comps": comps}
        elif marker in (0xC1, 0xC2, 0xC3, 0xC5, 0xC6, 0xC7,
                        0xC9, 0xCA, 0xCB, 0xCD, 0xCE, 0xCF):
            raise ValueError(
                f"SOF{marker - 0xC0}: only baseline sequential (SOF0) "
                f"is supported"
            )
        elif marker == 0xDA:  # SOS — entropy data follows
            if sof is None:
                raise ValueError("SOS before SOF0")
            ns = body[0]
            scan = {}
            for i in range(ns):
                cid, tt = body[1 + 2 * i], body[2 + 2 * i]
                scan[cid] = (tt >> 4, tt & 0x0F)
            return _decode_scan(
                payload, pos, sof, scan, qtables, htables, restart_interval
            )
        # APPn / COM / anything else: skipped
    raise ValueError("no SOS marker found")


def _decode_scan(payload, pos, sof, scan, qtables, htables, restart_interval):
    comps = sof["comps"]
    hmax = max(c["h"] for c in comps)
    vmax = max(c["v"] for c in comps)
    mcux = -(-sof["w"] // (8 * hmax))
    mcuy = -(-sof["h"] // (8 * vmax))

    # per-component coefficient buffers, (n_blocks, 64) zigzag ints
    store = []
    for c in comps:
        nbw = mcux * c["h"]
        nbh = mcuy * c["v"]
        store.append(np.zeros((nbh * nbw, 64), dtype=np.int32))

    reader = _SegmentReader(_split_entropy(payload, pos))
    preds = [0] * len(comps)
    mcu_count = 0
    for my in range(mcuy):
        for mx in range(mcux):
            if restart_interval and mcu_count == restart_interval:
                reader.resync_restart()
                preds = [0] * len(comps)
                mcu_count = 0
            for ci, c in enumerate(comps):
                dc_t = htables[(0, scan[c["id"]][0])]
                ac_t = htables[(1, scan[c["id"]][1])]
                nbw = mcux * c["h"]
                for dy in range(c["v"]):
                    for dx in range(c["h"]):
                        zz = np.zeros(64, dtype=np.int32)
                        size = reader.read_symbol(dc_t)
                        diff = _extend(reader.read_bits(size), size)
                        preds[ci] += diff
                        zz[0] = preds[ci]
                        k = 1
                        while k < 64:
                            sym = reader.read_symbol(ac_t)
                            if sym == 0x00:  # EOB
                                break
                            if sym == 0xF0:  # ZRL
                                k += 16
                                continue
                            k += sym >> 4
                            size = sym & 0x0F
                            if k > 63:
                                raise ValueError("AC index out of range")
                            zz[k] = _extend(reader.read_bits(size), size)
                            k += 1
                        row = my * c["v"] + dy
                        col = mx * c["h"] + dx
                        store[ci][row * nbw + col] = zz
            mcu_count += 1

    planes = []
    for ci, c in enumerate(comps):
        nbw = mcux * c["h"]
        nbh = mcuy * c["v"]
        q = qtables[c["tq"]].reshape(64).astype(np.float64)
        nat = np.zeros_like(store[ci], dtype=np.float64)
        nat[:, _ZZ_FLAT] = store[ci] * q[_ZZ_FLAT]
        pix = _idct(nat.reshape(-1, 8, 8)) + 128.0
        plane = _unblocks(pix, nbh, nbw)
        # nearest-neighbor upsample to the luma grid, crop to SOF dims
        plane = np.repeat(np.repeat(plane, vmax // c["v"], axis=0),
                          hmax // c["h"], axis=1)
        planes.append(plane[: sof["h"], : sof["w"]])

    if len(planes) == 1:
        return np.clip(np.rint(planes[0]), 0, 255).astype(np.uint8)
    y, cb, cr = planes[0], planes[1] - 128.0, planes[2] - 128.0
    r = y + 1.402 * cr
    g = y - 0.344136 * cb - 0.714136 * cr
    b = y + 1.772 * cb
    rgb = np.stack([r, g, b], axis=-1)
    return np.clip(np.rint(rgb), 0, 255).astype(np.uint8)
