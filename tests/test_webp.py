"""VP8L (lossless WebP) codec tests — roundtrips through every
encoder-reachable path, plus HANDCRAFTED bitstreams for the decoder
features our encoder deliberately doesn't emit (color cache, entropy
image, max_symbol cut, general distance-map codes), so the full
decode surface is pinned, not just the self-consistent half."""

from __future__ import annotations

import numpy as np
import pytest

from reair_spark.datapipe.webp import (
    _DIST_MAP,
    BitReader,
    BitWriter,
    _encode_entropy_image,
    _write_prefix_code,
    prefix_decode_value,
    prefix_encode_value,
    vp8l_decode,
    webp_decode,
    webp_encode,
)


def _rt(img, **kw):
    out = webp_decode(webp_encode(img, **kw))
    want = img if img.ndim == 3 else np.stack([img] * 3, axis=-1)
    assert np.array_equal(out, want), kw


def test_roundtrip_random_rgb_and_rgba():
    rng = np.random.default_rng(7)
    _rt(rng.integers(0, 256, size=(13, 17, 3), dtype=np.uint8))
    _rt(rng.integers(0, 256, size=(6, 31, 4), dtype=np.uint8))
    _rt(rng.integers(0, 256, size=(16, 16), dtype=np.uint8))


def test_roundtrip_lz_runs_and_flat():
    img = np.tile(np.array([[10, 20, 30]], np.uint8), (9, 40, 1))
    _rt(img.reshape(9, 40, 3))
    big = np.zeros((80, 80, 3), dtype=np.uint8)  # one giant run (cap split)
    _rt(big)
    _rt(big, use_lz=False)


def test_roundtrip_every_predictor_mode():
    rng = np.random.default_rng(3)
    img = rng.integers(0, 256, size=(10, 12, 3), dtype=np.uint8)
    for mode in range(14):
        _rt(img, predictor_mode=mode, subtract_green=(mode % 2 == 0))


def test_roundtrip_palette_bundlings():
    rng = np.random.default_rng(5)
    for n_colors, w in ((2, 30), (3, 23), (4, 17), (16, 9), (17, 8), (200, 40)):
        vals = np.sort(rng.choice(256, size=n_colors, replace=False))
        pal_img = rng.choice(vals, size=(7, w)).astype(np.uint8)
        _rt(np.stack([pal_img, pal_img // 2, pal_img], axis=-1),
            palette=True, subtract_green=False)


def test_roundtrip_color_transform_uniform():
    rng = np.random.default_rng(11)
    img = rng.integers(0, 256, size=(19, 21, 3), dtype=np.uint8)
    for ct in ((0, 0, 0), (16, 5, 250), (255, 128, 1)):
        _rt(img, color_transform=ct, subtract_green=False)
    _rt(img, subtract_green=True, color_transform=(16, 5, 250),
        predictor_mode=7)


def test_roundtrip_edge_geometries():
    rng = np.random.default_rng(2)
    _rt(np.array([[[5, 6, 7]]], dtype=np.uint8))
    _rt(rng.integers(0, 256, size=(1, 40, 3), dtype=np.uint8),
        predictor_mode=11)
    _rt(rng.integers(0, 256, size=(40, 1, 3), dtype=np.uint8),
        predictor_mode=13)


def test_prefix_value_coding_bijective():
    bw = BitWriter()
    vals = list(range(1, 130)) + [777, 4096]
    for v in vals:
        code, ev, eb = prefix_encode_value(v)
        assert 0 <= code < 40
        bw.write(ev, eb)
    br = BitReader(bw.tobytes())
    for v in vals:
        code, ev, eb = prefix_encode_value(v)
        assert prefix_decode_value(code, br) == v


def test_distance_map_shape():
    assert len(_DIST_MAP) == 120
    assert len(set(_DIST_MAP)) == 120
    assert all(-8 <= dx <= 8 and 0 <= dy <= 7 for dx, dy in _DIST_MAP)
    assert _DIST_MAP[0] == (0, 1) and _DIST_MAP[1] == (1, 0)


# ---- handcrafted bitstreams: decoder-only features ------------------


def _header(bw, w, h):
    bw.write(w - 1, 14)
    bw.write(h - 1, 14)
    bw.write(0, 1)  # alpha hint
    bw.write(0, 3)  # version


def _argb(a, r, g, b):
    return (a << 24) | (r << 16) | (g << 8) | b


def test_decode_color_cache_hit():
    """Literal pixel inserts into the cache; a 280+idx green symbol
    replays it."""
    px = _argb(0xFF, 0x12, 0x34, 0x56)
    cache_bits = 4
    idx = ((px * 0x1E35A7BD) & 0xFFFFFFFF) >> (32 - cache_bits)
    bw = BitWriter()
    _header(bw, 2, 1)
    bw.write(0, 1)  # no transforms
    bw.write(1, 1)  # color cache present
    bw.write(cache_bits, 4)
    bw.write(0, 1)  # no entropy image
    g_counts = np.zeros(280 + (1 << cache_bits), dtype=np.int64)
    g_counts[0x34] = 1
    g_counts[280 + idx] = 1
    gc, gl = _write_prefix_code(bw, g_counts, len(g_counts))
    one = np.zeros(256, dtype=np.int64)
    one[0x12] = 1
    rc, rl = _write_prefix_code(bw, one, 256)            # red
    one2 = np.zeros(256, dtype=np.int64)
    one2[0x56] = 1
    _write_prefix_code(bw, one2, 256)                    # blue (0-bit)
    one3 = np.zeros(256, dtype=np.int64)
    one3[0xFF] = 1
    _write_prefix_code(bw, one3, 256)                    # alpha (0-bit)
    _write_prefix_code(bw, np.zeros(40, dtype=np.int64), 40)  # distance
    # literal (green + red are 1-bit codes; blue/alpha are 0-bit)
    bw.write(int(gc[0x34]), int(gl[0x34]))
    if rl[0x12]:
        bw.write(int(rc[0x12]), int(rl[0x12]))
    # cache hit
    bw.write(int(gc[280 + idx]), int(gl[280 + idx]))
    out = vp8l_decode(b"\x2f" + bw.tobytes())
    assert out.shape == (1, 2)
    assert int(out[0, 0]) == px and int(out[0, 1]) == px


def test_decode_entropy_image_two_groups():
    """An 8×1 image whose meta-huffman image (block bits 2 → 4-px
    blocks) routes the halves through DIFFERENT code groups: group 0
    only knows pixel A, group 1 only knows pixel B — decoding proves
    per-block group selection."""
    A, B = _argb(0xFF, 1, 2, 3), _argb(0xFF, 9, 8, 7)
    bw = BitWriter()
    _header(bw, 8, 1)
    bw.write(0, 1)  # no transforms
    bw.write(0, 1)  # no cache
    bw.write(1, 1)  # entropy image present
    bw.write(0, 3)  # huff_bits = 2 → two 4-px blocks
    # meta image (2×1): meta codes 0 and 1 in (red<<8|green)
    _encode_entropy_image(
        bw, np.array([_argb(0xFF, 0, 0, 0), _argb(0xFF, 0, 1, 0)],
                     dtype=np.uint32),
        level0=False,
    )
    for px in (A, B):  # group 0 then group 1, 5 codes each
        for alphabet, sym in (
            (280, (px >> 8) & 0xFF), (256, (px >> 16) & 0xFF),
            (256, px & 0xFF), (256, (px >> 24) & 0xFF),
        ):
            counts = np.zeros(alphabet, dtype=np.int64)
            counts[sym] = 1
            _write_prefix_code(bw, counts, alphabet)  # all 0-bit simple
        _write_prefix_code(bw, np.zeros(40, dtype=np.int64), 40)
    # eight pixels: every code is 0-bit, so NO data bits at all
    out = vp8l_decode(b"\x2f" + bw.tobytes())
    assert [int(v) for v in out[0]] == [A] * 4 + [B] * 4


def test_decode_general_distance_map_code():
    """A backref through map code 5 — (0, 2) ⇒ distance 2·width —
    copies from two rows up (our encoder only emits code 2, so this
    pins the map semantics beyond it)."""
    w = 4
    px = [_argb(0xFF, i, 2 * i, 3 * i) for i in range(w * 2)]
    bw = BitWriter()
    _header(bw, w, 3)
    bw.write(0, 1)
    bw.write(0, 1)
    bw.write(0, 1)
    g_counts = np.zeros(280, dtype=np.int64)
    for p in px:
        g_counts[(p >> 8) & 0xFF] += 1
    lcode, lev, leb = prefix_encode_value(4)  # copy one full row
    g_counts[256 + lcode] += 1
    gc, gl = _write_prefix_code(bw, g_counts, 280)
    chans = []
    for shift in (16, 0, 24):
        counts = np.zeros(256, dtype=np.int64)
        for p in px:
            counts[(p >> shift) & 0xFF] += 1
        chans.append(_write_prefix_code(bw, counts, 256))
    d_counts = np.zeros(40, dtype=np.int64)
    dcode, dev, deb = prefix_encode_value(5)  # map entry 5 → (0, 2)
    d_counts[dcode] += 1
    dc, dl = _write_prefix_code(bw, d_counts, 40)
    for p in px:  # two literal rows
        bw.write(int(gc[(p >> 8) & 0xFF]), int(gl[(p >> 8) & 0xFF]))
        for (cc, cl), shift in zip(chans, (16, 0, 24)):
            s = (p >> shift) & 0xFF
            if cl[s]:
                bw.write(int(cc[s]), int(cl[s]))
    bw.write(int(gc[256 + lcode]), int(gl[256 + lcode]))  # row 3 = backref
    if leb:
        bw.write(lev, leb)
    if dl[dcode]:
        bw.write(int(dc[dcode]), int(dl[dcode]))
    if deb:
        bw.write(dev, deb)
    out = vp8l_decode(b"\x2f" + bw.tobytes())
    assert [int(v) for v in out[0]] == px[:4]
    assert [int(v) for v in out[1]] == px[4:]
    assert [int(v) for v in out[2]] == px[:4]  # copied from 2 rows up


def test_decode_max_symbol_cut():
    """The optional max_symbol field stops the code-length read early;
    remaining symbols are implicitly zero-length."""
    bw = BitWriter()
    _header(bw, 1, 1)
    bw.write(0, 1)
    bw.write(0, 1)
    bw.write(0, 1)
    # green code, full form, lengths: sym 5 → 1, sym 6 → 1, rest 0,
    # written with ONLY two length entries thanks to max_symbol
    bw.write(0, 1)  # not simple
    # CL code: symbols {0:len2, 1:len1, 17:len2} (0 and 17 unused by
    # the stream but keep the CL code complete)
    cl_lengths = {0: 2, 1: 1, 17: 2}
    order = (17, 18, 0, 1, 2, 3, 4, 5, 16, 6, 7, 8, 9, 10, 11, 12, 13,
             14, 15)
    bw.write(15, 4)  # 19 entries
    for sym in order:
        bw.write(cl_lengths.get(sym, 0), 3)
    bw.write(1, 1)  # USE max_symbol
    bw.write(0, 3)  # length_nbits = 2
    # max_symbol counts CL-symbol READS: exactly 3 below (17, 1, 1),
    # so max_symbol = 2 + 1 = 3; everything past symbol 6 is zero
    bw.write(1, 2)
    # canonical CL codes: sym1 → 0 (len1); sym0 → 10; sym17 → 11
    bw.write(0b11, 2)  # sym 17 (MSB-first: 1,1)
    bw.write(5 - 3, 3)  # repeat zero ×5 → symbols 0..4 = 0
    bw.write(0, 1)      # sym 1 → length 1 on symbol 5
    bw.write(0, 1)      # sym 1 → length 1 on symbol 6
    gc_green_5 = 0  # canonical: sym5 → 0, sym6 → 1
    for alphabet in (256, 256, 256):
        counts = np.zeros(alphabet, dtype=np.int64)
        counts[9] = 1
        _write_prefix_code(bw, counts, alphabet)
    _write_prefix_code(bw, np.zeros(40, dtype=np.int64), 40)
    bw.write(gc_green_5, 1)  # one literal, green symbol 5
    out = vp8l_decode(b"\x2f" + bw.tobytes())
    assert int(out[0, 0]) == _argb(9, 9, 5, 9)


def test_container_vp8x_and_lossy():
    img = np.full((2, 2, 3), 7, dtype=np.uint8)
    full = webp_encode(img)
    vp8l_chunk = full[12:]
    # wrap in a VP8X extended container: decoder must skip to VP8L
    vp8x = b"VP8X" + (10).to_bytes(4, "little") + bytes(10)
    body = b"WEBP" + vp8x + vp8l_chunk
    wrapped = b"RIFF" + len(body).to_bytes(4, "little") + body
    assert np.array_equal(webp_decode(wrapped), np.stack([img[..., 0]] * 3,
                                                         axis=-1) * 0 + 7)
    # lossy VP8 is a documented boundary, not a crash
    lossy_body = b"WEBP" + b"VP8 " + (4).to_bytes(4, "little") + bytes(4)
    lossy = b"RIFF" + len(lossy_body).to_bytes(4, "little") + lossy_body
    with pytest.raises(NotImplementedError):
        webp_decode(lossy)
    with pytest.raises(ValueError):
        webp_decode(b"RIFF\x00\x00\x00\x00JUNK")


def test_truncated_stream_raises():
    img = np.arange(48, dtype=np.uint8).reshape(4, 4, 3)
    payload = webp_encode(img)
    with pytest.raises(ValueError):
        vp8l_decode(payload[20:30])  # garbage slice, bad signature
    vp8l = payload[20:]  # inside the VP8L chunk body
    # chop the tail off the real bitstream → truncation error, not junk
    with pytest.raises(ValueError):
        vp8l_decode(vp8l[: max(2, len(vp8l) // 4)])


def test_pil_interop_if_available():
    """Cross-implementation check when an imaging library exists (not
    in this container — documented interop test, same pattern as the
    PNG/JPEG gates)."""
    PIL = pytest.importorskip("PIL.Image")
    import io

    rng = np.random.default_rng(4)
    img = rng.integers(0, 256, size=(11, 13, 3), dtype=np.uint8)
    ours = webp_encode(img)
    theirs = np.asarray(PIL.open(io.BytesIO(ours)).convert("RGB"))
    assert np.array_equal(theirs, img)
    buf = io.BytesIO()
    PIL.fromarray(img).save(buf, format="WEBP", lossless=True)
    assert np.array_equal(webp_decode(buf.getvalue())[..., :3], img)
