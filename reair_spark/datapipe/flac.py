"""FLAC codec (RFC 9639 subset) in numpy + stdlib — no audio library.

This closes the engine's last environment-blocked AUDIO codec the
same way PNG (round 6) and baseline JPEG (round 7) closed the image
side: the multimodal pipeline can encode AND decode real FLAC files
without soundfile/libFLAC, narrowing the external-library capability
gate to the formats we genuinely don't implement (GIF/TIFF/WebP).

What is implemented, per the public spec (RFC 9639 / xiph format doc):

encoder (mono, 16-bit — the scope of the engine's synth-audio path,
matching the WAV codec):
  - ``fLaC`` stream marker + STREAMINFO metadata block (block sizes,
    sample rate, channels, bit depth, total samples, and a REAL MD5
    of the unencoded PCM — giving decode verification end-to-end),
  - fixed-blocksize frames: 14-bit sync code, blocksize/sample-rate
    codes (table values plus the 8/16-bit uncommon forms for the last
    short block), UTF-8-style coded frame number, CRC-8 header check,
  - per-block subframe selection: CONSTANT (all-equal blocks),
    VERBATIM (incompressible blocks — chosen whenever the entropy-
    coded form would be larger), FIXED predictors order 0-4
    (residual = k-th difference; warmup samples stored raw), and an
    optional order-2 quantized-LPC path (Levinson-Durbin on the
    autocorrelation, 12-bit coefficient precision, arithmetic-shift
    prediction) to exercise the decoder's LPC branch,
  - partitioned Rice residual coding (coding method 0): 4-bit
    partition order, per-partition 4-bit Rice parameter chosen by
    exact cost minimization over p = 0..14, zigzag folding, plus the
    0b1111 escape (raw two's-complement residuals) both directions,
  - frame zero-padding to byte alignment and a CRC-16 trailer over
    the whole frame.

decoder (any stream our scope emits, plus the general cases):
  - metadata-block walk (STREAMINFO parsed, others skipped),
  - frame header parse with sync validation, both blocking
    strategies, all blocksize/sample-rate code forms, CRC-8 verify,
  - subframe types CONSTANT / VERBATIM / FIXED 0-4 / LPC any order,
    wasted-bits unary prefix, partitioned Rice with escape support,
  - fixed-predictor reconstruction as k-fold cumulative sums seeded
    from warmup differences (vectorized — no per-sample Python in
    the FIXED path), LPC reconstruction via the spec's
    sum-then-arithmetic-shift recurrence,
  - CRC-16 verify per frame and STREAMINFO MD5 verify over the
    reassembled PCM (``verify=True``).

Rice decoding is the only bit-serial stage; it runs as a forward
pointer walk over the precomputed one-bit positions of the frame
(amortized O(set bits)), with the low-bit fields gathered in one
vectorized indexing pass — the same shape as the JPEG Huffman
window-table reader.

Reference parity: the reference engine treats media payloads as
opaque bytes (SURVEY.md §2 multimodal rows); this codec exists for
the pipeline's decode/feature path and is an original construction
from the public spec.
"""

from __future__ import annotations

import hashlib

import numpy as np

# ---------------------------------------------------------------------------
# CRCs (FLAC frame header CRC-8 poly 0x07, frame CRC-16 poly 0x8005,
# both init 0, MSB-first)
# ---------------------------------------------------------------------------


def _make_crc_table(poly: int, width: int) -> list[int]:
    top = 1 << (width - 1)
    mask = (1 << width) - 1
    table = []
    for b in range(256):
        r = b << (width - 8)
        for _ in range(8):
            r = ((r << 1) ^ poly) & mask if r & top else (r << 1) & mask
        table.append(r)
    return table


_CRC8_TABLE = _make_crc_table(0x07, 8)
_CRC16_TABLE = _make_crc_table(0x8005, 16)


def _crc8(data: bytes) -> int:
    crc = 0
    t = _CRC8_TABLE
    for b in data:
        crc = t[crc ^ b]
    return crc


def _crc16(data: bytes) -> int:
    crc = 0
    t = _CRC16_TABLE
    for b in data:
        crc = t[((crc >> 8) ^ b) & 0xFF] ^ ((crc << 8) & 0xFFFF)
    return crc


# ---------------------------------------------------------------------------
# bit packing helpers
# ---------------------------------------------------------------------------


class _BitWriter:
    """MSB-first bit accumulator; bulk writes stay vectorized."""

    def __init__(self) -> None:
        self._chunks: list[np.ndarray] = []

    def write(self, value: int, nbits: int) -> None:
        if nbits == 0:
            return
        bits = np.fromiter(
            ((value >> (nbits - 1 - i)) & 1 for i in range(nbits)),
            dtype=np.uint8, count=nbits,
        )
        self._chunks.append(bits)

    def write_signed_array(self, values: np.ndarray, nbits: int) -> None:
        """Each value as nbits-bit two's complement, MSB first."""
        if len(values) == 0 or nbits == 0:
            return
        u = np.asarray(values, dtype=np.int64) & ((1 << nbits) - 1)
        shifts = np.arange(nbits - 1, -1, -1, dtype=np.int64)
        bits = ((u[:, None] >> shifts[None, :]) & 1).astype(np.uint8)
        self._chunks.append(bits.ravel())

    def write_bits_array(self, bits: np.ndarray) -> None:
        if len(bits):
            self._chunks.append(bits.astype(np.uint8, copy=False))

    def to_bytes(self) -> bytes:
        if not self._chunks:
            return b""
        bits = np.concatenate(self._chunks)
        return np.packbits(bits).tobytes()  # packbits zero-pads the tail


def _read_uint(bits: np.ndarray, pos: int, n: int) -> tuple[int, int]:
    """Read n MSB-first bits at pos as an unsigned Python int."""
    if n == 0:
        return 0, pos
    chunk = bits[pos:pos + n].astype(np.int64)
    if len(chunk) < n:
        raise ValueError("FLAC: truncated stream")
    w = (np.int64(1) << np.arange(n - 1, -1, -1, dtype=np.int64))
    return int(chunk @ w), pos + n


def _read_signed_array(
    bits: np.ndarray, pos: int, n: int, width: int
) -> tuple[np.ndarray, int]:
    """Read n two's-complement width-bit values, vectorized."""
    if n == 0:
        return np.zeros(0, dtype=np.int64), pos
    end = pos + n * width
    if end > len(bits):
        raise ValueError("FLAC: truncated subframe")
    mat = bits[pos:end].astype(np.int64).reshape(n, width)
    w = (np.int64(1) << np.arange(width - 1, -1, -1, dtype=np.int64))
    vals = mat @ w
    vals -= (vals >> (width - 1)) << width  # sign extend
    return vals, end


# ---------------------------------------------------------------------------
# Rice coding (residual coding method 0: 4-bit parameter)
# ---------------------------------------------------------------------------

_RICE_ESCAPE = 0b1111


def _zigzag(res: np.ndarray) -> np.ndarray:
    r = np.asarray(res, dtype=np.int64)
    return np.where(r >= 0, r << 1, ((-r) << 1) - 1)


def _rice_cost(z: np.ndarray, p: int) -> int:
    return int((z >> p).sum()) + len(z) * (p + 1)


def _best_rice_param(z: np.ndarray) -> tuple[int, int]:
    """(param, bit cost) minimizing the exact coded size over 0..14."""
    best_p, best_c = 0, _rice_cost(z, 0)
    for p in range(1, 15):
        c = _rice_cost(z, p)
        if c < best_c:
            best_p, best_c = p, c
    return best_p, best_c


def _rice_encode_bits(res: np.ndarray, p: int) -> np.ndarray:
    """Vectorized Rice encode: one scatter for terminators, p scatters
    for the low-bit fields — no per-sample Python."""
    if len(res) == 0:
        return np.zeros(0, dtype=np.uint8)
    z = _zigzag(res)
    q = z >> p
    lens = q + 1 + p
    offs = np.concatenate(([0], np.cumsum(lens)[:-1]))
    bits = np.zeros(int(lens.sum()), dtype=np.uint8)
    bits[offs + q] = 1
    if p:
        low0 = offs + q + 1
        for j in range(p):
            bits[low0 + j] = (z >> (p - 1 - j)) & 1
    return bits


def _rice_decode(
    bits: np.ndarray, ones: list[int], pos: int, p: int, n: int
) -> tuple[np.ndarray, int]:
    """Decode n Rice(p) codes starting at bit pos.

    ``ones`` is the sorted list of ALL one-bit positions in ``bits``
    (computed once per stream); the unary quotients are recovered by a
    monotone forward pointer over it — low-bit fields that happen to
    contain ones are skipped by the same pointer, so total work is
    O(ones visited), never quadratic in frames."""
    if n == 0:
        return np.zeros(0, dtype=np.int64), pos
    import bisect

    ptr = bisect.bisect_left(ones, pos)
    qs = [0] * n
    low_starts = [0] * n
    cur = pos
    for i in range(n):
        while ones[ptr] < cur:
            ptr += 1
        t = ones[ptr]
        ptr += 1
        qs[i] = t - cur
        low_starts[i] = t + 1
        cur = t + 1 + p
    q = np.asarray(qs, dtype=np.int64)
    if p:
        idx = np.asarray(low_starts, dtype=np.int64)[:, None] + np.arange(p)
        if int(idx[-1, -1]) >= len(bits):
            raise ValueError("FLAC: truncated Rice partition")
        w = (np.int64(1) << np.arange(p - 1, -1, -1, dtype=np.int64))
        low = bits[idx].astype(np.int64) @ w
    else:
        low = np.zeros(n, dtype=np.int64)
    z = (q << p) | low
    vals = np.where(z & 1, -((z + 1) >> 1), z >> 1)
    return vals, cur


# ---------------------------------------------------------------------------
# UTF-8-style coded number (frame/sample index)
# ---------------------------------------------------------------------------


def _utf8_encode_num(v: int) -> bytes:
    if v < 0x80:
        return bytes([v])
    for nbytes in range(2, 8):
        if v < (1 << (5 * nbytes + 1)):
            break
    out = bytearray(nbytes)
    out[0] = (0xFF << (8 - nbytes)) & 0xFF
    shift = 6 * (nbytes - 1)
    out[0] |= v >> shift
    for i in range(1, nbytes):
        shift -= 6
        out[i] = 0x80 | ((v >> shift) & 0x3F)
    return bytes(out)


def _utf8_decode_num(payload: bytes, pos: int) -> tuple[int, int]:
    b0 = payload[pos]
    if b0 < 0x80:
        return b0, pos + 1
    nbytes = 0
    while (b0 << nbytes) & 0x80:
        nbytes += 1
    if nbytes < 2 or nbytes > 7:
        raise ValueError("FLAC: bad coded number")
    v = b0 & (0x7F >> nbytes)
    for i in range(1, nbytes):
        c = payload[pos + i]
        if c & 0xC0 != 0x80:
            raise ValueError("FLAC: bad coded-number continuation")
        v = (v << 6) | (c & 0x3F)
    return v, pos + nbytes


# ---------------------------------------------------------------------------
# frame header tables
# ---------------------------------------------------------------------------

_BS_TABLE = {
    192: 0b0001, 576: 0b0010, 1152: 0b0011, 2304: 0b0100, 4608: 0b0101,
    256: 0b1000, 512: 0b1001, 1024: 0b1010, 2048: 0b1011, 4096: 0b1100,
    8192: 0b1101, 16384: 0b1110, 32768: 0b1111,
}
_BS_INV = {v: k for k, v in _BS_TABLE.items()}
_SS_BITS = {0b001: 8, 0b010: 12, 0b100: 16, 0b101: 20, 0b110: 24, 0b111: 32}


def _bs_code(n: int) -> tuple[int, bytes]:
    if n in _BS_TABLE:
        return _BS_TABLE[n], b""
    if n - 1 < 256:
        return 0b0110, bytes([n - 1])
    return 0b0111, (n - 1).to_bytes(2, "big")


# ---------------------------------------------------------------------------
# encoder
# ---------------------------------------------------------------------------

FLAC_RATE = 8000
_FIXED_MAX_ORDER = 4


def _fixed_residual(x64: np.ndarray, order: int) -> np.ndarray:
    return np.diff(x64, n=order) if order else x64.copy()


def _effective_partition_order(n: int, order: int, po: int) -> int:
    """Largest usable order ≤ po: 2^po must divide n and the first
    partition (which loses the warmup samples) must stay non-empty."""
    while po > 0 and (n % (1 << po) or (n >> po) <= order):
        po -= 1
    return po


def _write_residual(
    bw: _BitWriter, res: np.ndarray, n: int, order: int, po: int,
    force_escape: bool,
) -> int:
    """Partitioned Rice coding (method 0). Returns bits written
    (approx; used only by the encoder's subframe cost race)."""
    bw.write(0b00, 2)          # residual coding method: 4-bit Rice
    bw.write(po, 4)
    total = 6
    step = n >> po
    start = 0
    for part in range(1 << po):
        cnt = step - order if part == 0 else step
        chunk = res[start:start + cnt]
        start += cnt
        if force_escape:
            width = max(1, int(np.abs(chunk).max()).bit_length() + 1) if len(chunk) else 1
            bw.write(_RICE_ESCAPE, 4)
            bw.write(width, 5)
            bw.write_signed_array(chunk, width)
            total += 9 + cnt * width
            continue
        z = _zigzag(chunk)
        p, cost = _best_rice_param(z)
        bw.write(p, 4)
        bw.write_bits_array(_rice_encode_bits(chunk, p))
        total += 4 + cost
    return total


def _residual_cost(res: np.ndarray, n: int, order: int, po: int) -> int:
    step = n >> po
    start = 0
    total = 6
    for part in range(1 << po):
        cnt = step - order if part == 0 else step
        z = _zigzag(res[start:start + cnt])
        start += cnt
        total += 4 + _best_rice_param(z)[1]
    return total


def _lpc_order2(x64: np.ndarray) -> tuple[np.ndarray, int, int]:
    """Quantized order-2 LPC coefficients via Levinson-Durbin.
    Returns (qcoefs[2], shift, precision)."""
    xf = x64.astype(np.float64)
    n = len(xf)
    r = [float(xf @ xf), float(xf[1:] @ xf[:-1]), float(xf[2:] @ xf[:-2])]
    if r[0] <= 0:
        a = np.zeros(2)
    else:
        k1 = r[1] / r[0]
        e = r[0] * (1 - k1 * k1)
        a1 = k1
        if e <= 0:
            a = np.array([a1, 0.0])
        else:
            k2 = (r[2] - a1 * r[1]) / e
            a = np.array([a1 - k2 * a1, k2])
    precision = 12
    cmax = float(np.max(np.abs(a))) if np.any(a) else 1.0
    shift = 0
    while shift < 15 and cmax * (1 << (shift + 1)) < (1 << (precision - 1)):
        shift += 1
    q = np.clip(np.round(a * (1 << shift)), -(1 << (precision - 1)),
                (1 << (precision - 1)) - 1).astype(np.int64)
    return q, shift, precision


def _write_sf_header(bw: _BitWriter, stype: int, wasted: int) -> None:
    bw.write(0, 1)              # mandatory zero pad bit
    bw.write(stype, 6)
    if wasted:
        bw.write(1, 1)
        bw.write(1, wasted)     # unary (wasted-1 zeros then a one)
    else:
        bw.write(0, 1)


def _encode_subframe(
    bw: _BitWriter, x64: np.ndarray, bps: int, po: int, method: str,
    force_escape: bool,
) -> None:
    n = len(x64)
    # wasted bits: trailing zeros common to every sample (text-derived
    # PCM is a multiple of 256 → 8 free bits per sample)
    wasted = 0
    if n:
        orv = int(np.bitwise_or.reduce(x64))
        if orv:
            wasted = min((orv & -orv).bit_length() - 1, bps - 1)
    if wasted:
        x64 = x64 >> wasted
        bps -= wasted
    if n and np.all(x64 == x64[0]):
        _write_sf_header(bw, 0b000000, wasted)   # CONSTANT
        bw.write(int(x64[0]) & ((1 << bps) - 1), bps)
        return
    if method == "lpc" and n > 2:
        q, shift, precision = _lpc_order2(x64)
        pred = (q[0] * x64[1:-1] + q[1] * x64[:-2]) >> shift
        res = x64[2:] - pred
        epo = _effective_partition_order(n, 2, po)
        _write_sf_header(bw, 0b100000 | (2 - 1), wasted)   # LPC, order 2
        bw.write_signed_array(x64[:2], bps)                # warmup
        bw.write(precision - 1, 4)
        bw.write(shift, 5)
        bw.write_signed_array(q, precision)
        _write_residual(bw, res, n, 2, epo, force_escape)
        return
    # race FIXED orders 0..4 against VERBATIM on exact coded size
    best = None
    for order in range(0, min(_FIXED_MAX_ORDER, max(n - 1, 0)) + 1):
        res = _fixed_residual(x64, order)
        epo = _effective_partition_order(n, order, po)
        cost = order * bps + _residual_cost(res, n, order, epo)
        if best is None or cost < best[0]:
            best = (cost, order, res, epo)
    if best is None or best[0] >= n * bps:
        _write_sf_header(bw, 0b000001, wasted)   # VERBATIM
        bw.write_signed_array(x64, bps)
        return
    _, order, res, epo = best
    _write_sf_header(bw, 0b001000 | order, wasted)   # FIXED
    bw.write_signed_array(x64[:order], bps)
    _write_residual(bw, res, len(x64), order, epo, force_escape)


def _encode_frame(
    block: np.ndarray, idx: int, po: int, method: str, force_escape: bool,
) -> bytes:
    n = len(block)
    hdr = bytearray([0xFF, 0xF8])          # sync + fixed blocksize strategy
    code, extra = _bs_code(n)
    hdr.append((code << 4) | 0b0000)       # sample rate: from STREAMINFO
    hdr.append((0 << 4) | (0b100 << 1))    # mono, 16-bit, reserved 0
    hdr += _utf8_encode_num(idx)
    hdr += extra
    hdr.append(_crc8(bytes(hdr)))
    bw = _BitWriter()
    _encode_subframe(bw, block.astype(np.int64), 16, po, method, force_escape)
    frame = bytes(hdr) + bw.to_bytes()
    return frame + _crc16(frame).to_bytes(2, "big")


def flac_encode(
    samples, rate: int = FLAC_RATE, block_size: int = 1024,
    partition_order: int = 0, method: str = "fixed",
    force_escape: bool = False,
) -> bytes:
    """Encode mono int16 PCM into a real FLAC stream.

    ``method='lpc'`` routes non-constant blocks through the order-2
    quantized-LPC subframe (exercises the decoder's LPC branch);
    ``force_escape`` forces the Rice escape (raw residuals) path.
    """
    x = np.asarray(samples, dtype=np.int16)
    total = len(x)
    md5 = hashlib.md5(x.astype("<i2").tobytes()).digest()
    sw = _BitWriter()
    sw.write(block_size, 16)   # min block size
    sw.write(block_size, 16)   # max block size
    sw.write(0, 24)            # min frame size: unknown
    sw.write(0, 24)            # max frame size: unknown
    sw.write(rate, 20)
    sw.write(0, 3)             # channels - 1
    sw.write(15, 5)            # bits per sample - 1
    sw.write(total, 36)
    info = sw.to_bytes() + md5
    out = [b"fLaC", bytes([0x80]), len(info).to_bytes(3, "big"), info]
    for idx, start in enumerate(range(0, total, block_size)):
        out.append(_encode_frame(
            x[start:start + block_size], idx, partition_order, method,
            force_escape,
        ))
    return b"".join(out)


# ---------------------------------------------------------------------------
# decoder
# ---------------------------------------------------------------------------


def _undiff(res: np.ndarray, warmup: np.ndarray, order: int) -> np.ndarray:
    """Invert the k-th difference: k seeded cumulative sums (the FIXED
    predictor reconstruction, fully vectorized)."""
    cur = res
    for j in range(order - 1, -1, -1):
        seed = int(np.diff(warmup, n=j)[-1])
        cur = seed + np.cumsum(cur)
    return np.concatenate([warmup, cur]) if order else cur


def _decode_subframe(
    bits: np.ndarray, ones: list[int], pos: int, n: int, bps: int,
) -> tuple[np.ndarray, int]:
    pad, pos = _read_uint(bits, pos, 1)
    if pad:
        raise ValueError("FLAC: subframe padding bit set")
    stype, pos = _read_uint(bits, pos, 6)
    wflag, pos = _read_uint(bits, pos, 1)
    wasted = 0
    if wflag:
        # unary-coded (k-1): count zeros up to the terminating one
        import bisect

        t = ones[bisect.bisect_left(ones, pos)]
        wasted = t - pos + 1
        pos = t + 1
    eff = bps - wasted
    if stype == 0b000000:        # CONSTANT
        v, pos = _read_uint(bits, pos, eff)
        v -= (v >> (eff - 1)) << eff
        x = np.full(n, v, dtype=np.int64)
    elif stype == 0b000001:      # VERBATIM
        x, pos = _read_signed_array(bits, pos, n, eff)
    elif 0b001000 <= stype <= 0b001100:   # FIXED 0..4
        order = stype & 0b000111
        warmup, pos = _read_signed_array(bits, pos, order, eff)
        res, pos = _decode_residual(bits, ones, pos, n, order)
        x = _undiff(res, warmup, order)
    elif stype & 0b100000:       # LPC
        order = (stype & 0b011111) + 1
        warmup, pos = _read_signed_array(bits, pos, order, eff)
        prec, pos = _read_uint(bits, pos, 4)
        prec += 1
        shift, pos = _read_uint(bits, pos, 5)
        coefs, pos = _read_signed_array(bits, pos, order, prec)
        res, pos = _decode_residual(bits, ones, pos, n, order)
        x = np.empty(n, dtype=np.int64)
        x[:order] = warmup
        c = [int(v) for v in coefs]
        xi = [int(v) for v in warmup]
        r = [int(v) for v in res]
        for i in range(order, n):
            pred = sum(c[j] * xi[i - 1 - j] for j in range(order)) >> shift
            xi.append(r[i - order] + pred)
        x = np.asarray(xi, dtype=np.int64)
    else:
        raise ValueError(f"FLAC: reserved subframe type {stype:#08b}")
    return x << wasted, pos


def _decode_residual(
    bits: np.ndarray, ones: list[int], pos: int, n: int, order: int,
) -> tuple[np.ndarray, int]:
    method, pos = _read_uint(bits, pos, 2)
    if method not in (0, 1):
        raise ValueError("FLAC: reserved residual coding method")
    pbits = 4 if method == 0 else 5
    escape = (1 << pbits) - 1
    po, pos = _read_uint(bits, pos, 4)
    step = n >> po
    if step << po != n or step <= order:
        raise ValueError("FLAC: invalid partition order")
    parts = []
    for part in range(1 << po):
        cnt = step - order if part == 0 else step
        p, pos = _read_uint(bits, pos, pbits)
        if p == escape:
            width, pos = _read_uint(bits, pos, 5)
            if width:
                chunk, pos = _read_signed_array(bits, pos, cnt, width)
            else:
                chunk = np.zeros(cnt, dtype=np.int64)
            parts.append(chunk)
        else:
            chunk, pos = _rice_decode(bits, ones, pos, p, cnt)
            parts.append(chunk)
    return np.concatenate(parts) if parts else np.zeros(0, np.int64), pos


def _decode_frame(
    payload: bytes, bits: np.ndarray, ones: list[int], pos: int,
    info: dict, verify: bool,
) -> tuple[np.ndarray, int]:
    start = pos
    if payload[pos] != 0xFF or (payload[pos + 1] >> 2) != 0b111110:
        raise ValueError("FLAC: lost frame sync")
    b2, b3 = payload[pos + 2], payload[pos + 3]
    bs_code, sr_code = b2 >> 4, b2 & 0xF
    chan, ss_code = b3 >> 4, (b3 >> 1) & 0b111
    if b3 & 1:
        raise ValueError("FLAC: reserved frame-header bit set")
    pos += 4
    _, pos = _utf8_decode_num(payload, pos)
    if bs_code == 0b0110:
        n = payload[pos] + 1
        pos += 1
    elif bs_code == 0b0111:
        n = int.from_bytes(payload[pos:pos + 2], "big") + 1
        pos += 2
    elif bs_code in _BS_INV:
        n = _BS_INV[bs_code]
    else:
        raise ValueError("FLAC: reserved block size code")
    if sr_code == 0b1100:
        pos += 1
    elif sr_code in (0b1101, 0b1110):
        pos += 2
    elif sr_code == 0b1111:
        raise ValueError("FLAC: invalid sample rate code")
    if verify and _crc8(payload[start:pos]) != payload[pos]:
        raise ValueError("FLAC: frame header CRC-8 mismatch")
    pos += 1
    if chan != 0:
        raise ValueError("FLAC: scope is mono (channel assignment 0)")
    bps = info["bps"] if ss_code == 0 else _SS_BITS[ss_code]
    bitpos = pos * 8
    x, bitpos = _decode_subframe(bits, ones, bitpos, n, bps)
    pos = (bitpos + 7) // 8
    if verify:
        want = int.from_bytes(payload[pos:pos + 2], "big")
        if _crc16(payload[start:pos]) != want:
            raise ValueError("FLAC: frame CRC-16 mismatch")
    return x, pos + 2


def flac_decode(payload: bytes, verify: bool = True):
    """Decode a FLAC stream to (sample_rate, int16 samples).

    ``verify=True`` checks every frame's CRC-8/CRC-16 and the
    STREAMINFO MD5 against the reassembled PCM."""
    if payload[:4] != b"fLaC":
        raise ValueError("FLAC: bad stream marker")
    pos = 4
    info = None
    while True:
        hdr = payload[pos]
        length = int.from_bytes(payload[pos + 1:pos + 4], "big")
        body = payload[pos + 4:pos + 4 + length]
        if hdr & 0x7F == 0:
            b = np.unpackbits(np.frombuffer(body, dtype=np.uint8))
            rate, _ = _read_uint(b, 80, 20)
            ch, _ = _read_uint(b, 100, 3)
            bps, _ = _read_uint(b, 103, 5)
            total, _ = _read_uint(b, 108, 36)
            info = {
                "rate": rate, "channels": ch + 1, "bps": bps + 1,
                "total": total, "md5": body[18:34],
            }
        pos += 4 + length
        if hdr & 0x80:
            break
    if info is None:
        raise ValueError("FLAC: missing STREAMINFO")
    if info["channels"] != 1 or info["bps"] != 16:
        raise ValueError("FLAC: scope is mono/16-bit")
    bits = np.unpackbits(np.frombuffer(payload, dtype=np.uint8))
    ones = np.flatnonzero(bits).tolist()
    ones.append(len(bits))  # sentinel so pointer walks never overrun
    out = []
    got = 0
    while got < info["total"]:
        x, pos = _decode_frame(payload, bits, ones, pos, info, verify)
        out.append(x)
        got += len(x)
    if got != info["total"]:
        raise ValueError("FLAC: sample count mismatch")
    pcm = (np.concatenate(out) if out else np.zeros(0, np.int64)).astype(np.int16)
    if verify and info["md5"] != b"\x00" * 16:
        if hashlib.md5(pcm.astype("<i2").tobytes()).digest() != info["md5"]:
            raise ValueError("FLAC: STREAMINFO MD5 mismatch")
    return info["rate"], pcm
