"""WebP VP8L codec tests.

The hand-vector test assembles a VP8L stream bit-by-bit from the
public spec (independent longhand re-derivation — its own bit writer,
no imports from the codec), the way ``autotest/gcore/data/*.jpg``
pins GDAL's JPEG driver to known files. Reference behavior surface:
``frmts/webp/webpdataset.cpp`` (lossless path).
"""

import struct

import numpy as np
import pytest

from gdal_spark.raster import codec, webp
from gdal_spark.sources.synth import synth_pixels


# ---------------------------------------------------------------------------
# round trips (encoder → decoder, every supported shape)
# ---------------------------------------------------------------------------


@pytest.mark.parametrize(
    "shape", [(1, 1, 3), (2, 3, 3), (7, 5, 3), (16, 16, 3), (33, 1, 3), (1, 47, 3)]
)
def test_roundtrip_rgb(shape):
    a = (np.arange(np.prod(shape), dtype=np.int64) * 37 % 256).astype(np.uint8)
    a = a.reshape(shape)
    rt = webp.decode(webp.encode(a))
    assert rt.shape == shape
    assert (rt == a).all()


def test_roundtrip_gray_promotes_to_rgb():
    g = np.linspace(0, 255, 48 * 64).astype(np.uint8).reshape(48, 64)
    rt = webp.decode(webp.encode(g))
    assert rt.shape == (48, 64, 3)
    assert (rt[:, :, 0] == g).all() and (rt[:, :, 1] == g).all() and (rt[:, :, 2] == g).all()


def test_roundtrip_rgba_alpha_preserved():
    a = np.random.default_rng(0).integers(0, 256, (32, 32, 4)).astype(np.uint8)
    rt = webp.decode(webp.encode(a))
    assert rt.shape == (32, 32, 4)
    assert (rt == a).all()


def test_roundtrip_uniform_alpha_drops_channel():
    a = np.random.default_rng(1).integers(0, 256, (8, 8, 4)).astype(np.uint8)
    a[:, :, 3] = 255
    rt = webp.decode(webp.encode(a))
    assert rt.shape == (8, 8, 3)
    assert (rt == a[:, :, :3]).all()


def test_roundtrip_full_random_worstcase():
    a = np.random.default_rng(7).integers(0, 256, (100, 100, 3)).astype(np.uint8)
    assert (webp.decode(webp.encode(a)) == a).all()


def test_roundtrip_synth_fixture_and_determinism():
    arr = synth_pixels("img-000123", 192, 128)
    b1 = webp.encode(arr)
    b2 = webp.encode(arr)
    assert b1 == b2
    assert (webp.decode(b1) == arr).all()


def test_single_color_tiny_file():
    c = np.full((64, 64, 3), 200, np.uint8)
    buf = webp.encode(c)
    assert len(buf) < 64  # five simple codes + header, no per-pixel bits
    assert (webp.decode(buf) == c).all()


# ---------------------------------------------------------------------------
# container structure (RIFF framing per spec)
# ---------------------------------------------------------------------------


def test_container_structure():
    a = np.zeros((3, 5, 3), np.uint8)
    buf = webp.encode(a)
    assert buf[:4] == b"RIFF"
    (riff_len,) = struct.unpack_from("<I", buf, 4)
    assert riff_len == len(buf) - 8
    assert buf[8:12] == b"WEBP"
    assert buf[12:16] == b"VP8L"
    (chunk_len,) = struct.unpack_from("<I", buf, 16)
    assert len(buf) == 20 + chunk_len + (chunk_len & 1)
    assert buf[20] == 0x2F  # VP8L signature byte
    # width-1 / height-1: 14-bit LSB-first fields starting at byte 21
    bits = np.unpackbits(np.frombuffer(buf[21:25], np.uint8), bitorder="little")
    w_m1 = int((bits[:14] * (1 << np.arange(14))).sum())
    h_m1 = int((bits[14:28] * (1 << np.arange(14))).sum())
    assert (w_m1 + 1, h_m1 + 1) == (5, 3)


# ---------------------------------------------------------------------------
# hand-assembled known vector (independent longhand spec derivation)
# ---------------------------------------------------------------------------


class _HandBits:
    """Longhand LSB-first bit writer — deliberately NOT the codec's."""

    def __init__(self):
        self.bits = []

    def put(self, value, n):
        for i in range(n):
            self.bits.append((value >> i) & 1)

    def tobytes(self):
        out = bytearray()
        for i in range(0, len(self.bits), 8):
            byte = 0
            for j, b in enumerate(self.bits[i : i + 8]):
                byte |= b << j
            out.append(byte)
        return bytes(out)


def test_hand_assembled_simple_code_stream():
    """2x2 image; all five prefix codes in the 'simple' form, green has
    two symbols (1-bit codes), the rest one symbol (0-bit codes)."""
    hb = _HandBits()
    hb.put(1, 14)  # width - 1
    hb.put(1, 14)  # height - 1
    hb.put(0, 1)  # alpha hint
    hb.put(0, 3)  # version
    hb.put(0, 1)  # no transforms
    hb.put(0, 1)  # no color cache
    hb.put(0, 1)  # no meta prefix image

    def simple_two(s0, s1):
        hb.put(1, 1)  # is_simple
        hb.put(1, 1)  # num_symbols - 1 = 1
        hb.put(1, 1)  # first symbol in 8 bits
        hb.put(s0, 8)
        hb.put(s1, 8)

    def simple_one(s0):
        hb.put(1, 1)
        hb.put(0, 1)  # one symbol
        hb.put(1, 1)
        hb.put(s0, 8)

    simple_two(20, 200)  # green: code 0 → 20, code 1 → 200
    simple_one(10)  # red
    simple_one(30)  # blue
    simple_one(255)  # alpha
    simple_one(0)  # distance (unused)
    # pixels, raster order, green-then-R-B-A; only green costs bits
    hb.put(0, 1)  # (0,0) green 20
    hb.put(0, 1)  # (0,1) green 20
    hb.put(1, 1)  # (1,0) green 200
    hb.put(1, 1)  # (1,1) green 200
    payload = b"\x2f" + hb.tobytes()
    chunk = b"VP8L" + struct.pack("<I", len(payload)) + payload
    if len(payload) & 1:
        chunk += b"\x00"
    riff = b"WEBP" + chunk
    buf = b"RIFF" + struct.pack("<I", len(riff)) + riff

    img = webp.decode(buf)
    expect = np.array(
        [[[10, 20, 30], [10, 20, 30]], [[10, 200, 30], [10, 200, 30]]], np.uint8
    )
    assert img.shape == (2, 2, 3)
    assert (img == expect).all()


# ---------------------------------------------------------------------------
# dispatch + the lossless invariant
# ---------------------------------------------------------------------------


def test_codec_dispatch_and_lossless_invariant():
    arr = synth_pixels("img-000007", 64, 48)
    buf = codec.encode_image(arr, "webp")
    assert buf[:4] == b"RIFF"
    rt = codec.decode_image(buf, "webp")
    assert (rt == arr).all()
    assert codec.psnr(arr, rt) == float("inf")


def test_unsupported_features_raise():
    # a garbage VP8 (lossy) chunk must be refused loudly, not
    # misparsed: NotImplementedError without libwebp, ValueError from
    # the library (it rejects the empty stream)
    fake = b"RIFF" + struct.pack("<I", 12) + b"WEBP" + b"VP8 " + struct.pack("<I", 0)
    with pytest.raises((NotImplementedError, ValueError)):
        webp.decode(fake)
    with pytest.raises(ValueError):
        webp.decode(b"RIFX" + b"\x00" * 20)


# ---------------------------------------------------------------------------
# LZ77 back-references + color cache (round-4 verdict item 2)
# ---------------------------------------------------------------------------


def _wrap_vp8l(hb):
    payload = b"\x2f" + hb.tobytes()
    chunk = b"VP8L" + struct.pack("<I", len(payload)) + payload
    if len(payload) & 1:
        chunk += b"\x00"
    riff = b"WEBP" + chunk
    return b"RIFF" + struct.pack("<I", len(riff)) + riff


def _simple_one(hb, s0):
    hb.put(1, 1)
    hb.put(0, 1)
    hb.put(1, 1)
    hb.put(s0, 8)


def _simple_two(hb, s0, s1):
    hb.put(1, 1)
    hb.put(1, 1)
    hb.put(1, 1)
    hb.put(s0, 8)
    hb.put(s1, 8)


def test_hand_assembled_backref_stream():
    """4x2; green is a hand-built FULL code over {literal 40, length
    symbol 257 (copy len 2)} with zero runs transmitted via CL symbol
    18 and the use-max-symbol header; distance code is the 0-bit
    symbol 0 → plane code 1 → (0,1) → dist = width. Row 1 must copy
    row 0 (spec §"Backward reference", §"Code lengths")."""
    hb = _HandBits()
    hb.put(3, 14)  # width 4
    hb.put(1, 14)  # height 2
    hb.put(0, 1)
    hb.put(0, 3)
    hb.put(0, 1)  # no transforms
    hb.put(0, 1)  # no color cache
    hb.put(0, 1)  # no meta prefix

    # green: full code. CL code over {1:len1, 18:len1} → canonical:
    # '0'→1, '1'→18. Transmit 8 CL lengths in kOrder
    # [17,18,0,1,2,3,4,5] = [0,1,0,1,0,0,0,0].
    hb.put(0, 1)  # is_simple = 0
    hb.put(8 - 4, 4)
    for v in (0, 1, 0, 1, 0, 0, 0, 0):
        hb.put(v, 3)
    hb.put(1, 1)  # use max_symbol
    hb.put(0, 3)  # length_nbits = 2 + 2*0 = 2
    hb.put(3, 2)  # max_symbol = 2 + 3 = 5 CL reads
    hb.put(1, 1)  # CL 18: zeros run
    hb.put(40 - 11, 7)  # 40 zeros → symbols 0..39
    hb.put(0, 1)  # CL 1 → lengths[40] = 1 (literal green 40)
    hb.put(1, 1)  # CL 18
    hb.put(138 - 11, 7)  # 138 zeros → 41..178
    hb.put(1, 1)  # CL 18
    hb.put(78 - 11, 7)  # 78 zeros → 179..256
    hb.put(0, 1)  # CL 1 → lengths[257] = 1 (length code 1 → len 2)
    # green canonical: '0' → 40, '1' → 257
    _simple_two(hb, 5, 200)  # red: '0'→5, '1'→200
    _simple_one(hb, 30)  # blue
    _simple_one(hb, 255)  # alpha
    _simple_one(hb, 0)  # distance: always plane code 1 → (0,1) → width

    # row 0: literals G=40 with reds 5,200,5,200
    for rbit in (0, 1, 0, 1):
        hb.put(0, 1)  # green literal
        hb.put(rbit, 1)
    # row 1: two copies of length 2, dist = width (0-bit dist symbol)
    hb.put(1, 1)
    hb.put(1, 1)

    img = webp.decode(_wrap_vp8l(hb))
    row = [[5, 40, 30], [200, 40, 30], [5, 40, 30], [200, 40, 30]]
    assert img.shape == (2, 4, 3)
    assert (img == np.array([row, row], np.uint8)).all()


def test_hand_assembled_color_cache_stream():
    """2x2 with a 1-bit color cache: literal then cache-hit twice.
    Pins the hash (0x1e35a7bd * ARGB) >> 31 and the cache-symbol
    offset 280 (spec §"Color cache coding")."""
    argb = (255 << 24) | (7 << 16) | (100 << 8) | 2  # R=7 G=100 B=2
    idx = ((0x1E35A7BD * argb) & 0xFFFFFFFF) >> 31
    cache_sym = 280 + idx

    hb = _HandBits()
    hb.put(1, 14)
    hb.put(1, 14)
    hb.put(0, 1)
    hb.put(0, 3)
    hb.put(0, 1)  # no transforms
    hb.put(1, 1)  # color cache present
    hb.put(1, 4)  # cache_bits = 1
    hb.put(0, 1)  # no meta prefix

    # green full code over {100, cache_sym}, alphabet 282
    hb.put(0, 1)
    hb.put(8 - 4, 4)
    for v in (0, 1, 0, 1, 0, 0, 0, 0):  # CL lengths: 1→1 bit, 18→1 bit
        hb.put(v, 3)
    hb.put(1, 1)  # use max_symbol
    hb.put(0, 3)  # length_nbits = 2
    zeros_mid = cache_sym - 101  # symbols 101..cache_sym-1
    reads = 5 if zeros_mid > 138 else 4
    hb.put(reads - 2, 2)
    hb.put(1, 1)
    hb.put(100 - 11, 7)  # zeros 0..99
    hb.put(0, 1)  # lengths[100] = 1
    if zeros_mid > 138:
        hb.put(1, 1)
        hb.put(138 - 11, 7)
        zeros_mid -= 138
    hb.put(1, 1)
    hb.put(zeros_mid - 11, 7)
    hb.put(0, 1)  # lengths[cache_sym] = 1
    _simple_one(hb, 7)  # red
    _simple_one(hb, 2)  # blue
    _simple_one(hb, 255)  # alpha
    _simple_one(hb, 0)  # distance (unused)

    hb.put(0, 1)  # literal green 100 (inserts ARGB into cache)
    hb.put(1, 1)  # cache hit
    hb.put(1, 1)  # cache hit
    hb.put(1, 1)  # cache hit

    img = webp.decode(_wrap_vp8l(hb))
    assert img.shape == (2, 2, 3)
    assert (img == np.array([7, 100, 2], np.uint8)).all()


@pytest.mark.parametrize("cache_bits", [0, 4, 8])
@pytest.mark.parametrize("use_plane", [True, False])
def test_lz77_roundtrip_matrix(cache_bits, use_plane):
    yy, xx = np.mgrid[0:48, 0:40]
    cart = np.stack(
        [(yy // 8) % 4 * 60, (xx // 16) % 3 * 80, ((yy + xx) // 12) % 5 * 50],
        -1,
    ).astype(np.uint8)
    buf = webp.encode_lz77(cart, cache_bits=cache_bits, use_plane_codes=use_plane)
    assert (webp.decode(buf) == cart).all()


def test_lz77_roundtrip_shapes_and_content():
    rng = np.random.default_rng(5)
    cases = [
        rng.integers(0, 255, (31, 29, 3), dtype=np.uint8),  # noise: literals
        np.full((40, 40, 3), 9, np.uint8),  # flat: one long run
        np.repeat(rng.integers(0, 255, (1, 37, 3), dtype=np.uint8), 21, 0),
        np.repeat(rng.integers(0, 255, (21, 1, 3), dtype=np.uint8), 37, 1),
    ]
    rgba = np.dstack([cases[1], (np.arange(1600) % 256).reshape(40, 40).astype(np.uint8)])
    for arr in cases:
        assert (webp.decode(webp.encode_lz77(arr)) == arr).all()
    out = webp.decode(webp.encode_lz77(rgba))
    assert out.shape == (40, 40, 4) and (out == rgba).all()


def test_lz77_long_run_splits_at_4096():
    arr = np.full((70, 70, 3), 200, np.uint8)  # 4900 pixels, one color
    buf = webp.encode_lz77(arr, cache_bits=0)
    assert (webp.decode(buf) == arr).all()


def test_dist_map_pins():
    """First plane codes per the spec list: (0,1)=row above, (1,0)=
    previous pixel; 120 entries, all within the 8-neighborhood."""
    assert webp.DIST_MAP[0] == (0, 1)
    assert webp.DIST_MAP[1] == (1, 0)
    assert webp.DIST_MAP[2] == (1, 1)
    assert webp.DIST_MAP[3] == (-1, 1)
    assert len(webp.DIST_MAP) == 120
    assert len(set(webp.DIST_MAP)) == 120
    # the 16x8 causal window libwebp's plane_to_code_lut addresses
    for dx, dy in webp.DIST_MAP:
        assert -7 <= dx <= 8 and 0 <= dy <= 7
        assert dy > 0 or dx > 0
    # published-list prefix (spec, first rows verified by hand)
    assert webp.DIST_MAP[:12] == (
        (0, 1), (1, 0), (1, 1), (-1, 1), (0, 2), (2, 0), (1, 2), (-1, 2),
        (2, 1), (-2, 1), (2, 2), (-2, 2),
    )
    assert webp.DIST_MAP[22:28] == ((0, 4), (4, 0), (1, 4), (-1, 4), (4, 1), (-4, 1))
    assert webp.DIST_MAP[34:40] == ((0, 5), (3, 4), (-3, 4), (4, 3), (-4, 3), (5, 0))


def test_prefix_split_inverts_prefix_value():
    for v in list(range(1, 300)) + [4095, 4096, 1 << 19]:
        code, extra, nbits = webp._prefix_split(v)
        assert webp._prefix_value(code, extra) == v
        assert extra < (1 << nbits) or nbits == 0
