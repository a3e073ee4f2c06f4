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
    # VP8 (lossy) chunk tag must be refused loudly, not misparsed
    fake = b"RIFF" + struct.pack("<I", 12) + b"WEBP" + b"VP8 " + struct.pack("<I", 0)
    with pytest.raises(NotImplementedError):
        webp.decode(fake)
    with pytest.raises(ValueError):
        webp.decode(b"RIFX" + b"\x00" * 20)
