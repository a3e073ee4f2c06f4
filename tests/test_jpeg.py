"""Baseline JPEG codec tests — independent scalar oracles.

Kernel-vs-spec checks (NOT self-referential): the DCT is compared
against a naive O(n^4) loop implementation of the T.81 FDCT formula;
the decoder is checked against a hand-assembled known-vector JPEG
whose expected pixels are derived by hand (the
``autotest/gcore/data/*.jpg`` known-file method); the encoder is
checked by the decoder AND by size/PSNR envelope properties.
"""

import struct

import numpy as np
import pytest

from gdal_spark.raster import jpeg
from gdal_spark.raster.codec import decode_image, encode_image, psnr
from gdal_spark.sources.synth import synth_pixels


def naive_dct2(block: np.ndarray) -> np.ndarray:
    """O(n^4) orthonormal 2-D DCT-II straight from the T.81 formula —
    independent of the matrix form the codec uses."""
    out = np.zeros((8, 8))
    for u in range(8):
        for v in range(8):
            s = 0.0
            for x in range(8):
                for y in range(8):
                    s += (
                        block[x, y]
                        * np.cos((2 * x + 1) * u * np.pi / 16)
                        * np.cos((2 * y + 1) * v * np.pi / 16)
                    )
            cu = 1 / np.sqrt(2) if u == 0 else 1.0
            cv = 1 / np.sqrt(2) if v == 0 else 1.0
            out[u, v] = 0.25 * cu * cv * s
    return out


def test_dct_matrix_matches_naive_formula():
    rng = np.random.default_rng(7)
    block = rng.uniform(-128, 127, (8, 8))
    fast = jpeg.DCT_M @ block @ jpeg.DCT_M.T
    assert np.allclose(fast, naive_dct2(block), atol=1e-9)
    # inverse round-trips
    back = jpeg.DCT_M.T @ fast @ jpeg.DCT_M
    assert np.allclose(back, block, atol=1e-9)


def test_zigzag_is_the_t81_scan():
    # first and last entries of the public zigzag order
    expect_head = [0, 1, 8, 16, 9, 2, 3, 10, 17, 24]
    assert list(jpeg.ZIGZAG[:10]) == expect_head
    assert jpeg.ZIGZAG[63] == 63
    assert sorted(jpeg.ZIGZAG) == list(range(64))
    assert np.array_equal(jpeg.ZIGZAG[jpeg.UNZIGZAG], np.arange(64))


def _hand_jpeg() -> bytes:
    """Hand-assembled 16×8 grayscale baseline JPEG, DRI=1, two MCUs.

    Quant table: all 16s. Uniform pixel 144 → level-shift 16 → DC =
    8·16 = 128 → quantized 8 (category 4, value bits 1000). Huffman:
    DC symbols 0..11 at length 4 (symbol 4 → code 0100); AC table has
    only EOB at length 2 (code 00). Scan per MCU: 0100 1000 00 + 1-pad
    → 0x48 0x3F; RST0 between MCUs resets the DC predictor."""
    out = [b"\xff\xd8"]
    out.append(b"\xff\xdb" + struct.pack(">HB", 67, 0) + bytes([16] * 64))
    out.append(
        b"\xff\xc0" + struct.pack(">HBHHB", 11, 8, 8, 16, 1) + bytes([1, 0x11, 0])
    )
    dc_bits = bytes([0, 0, 0, 12] + [0] * 12)
    out.append(b"\xff\xc4" + struct.pack(">HB", 31, 0x00) + dc_bits + bytes(range(12)))
    ac_bits = bytes([0, 1] + [0] * 14)
    out.append(b"\xff\xc4" + struct.pack(">HB", 20, 0x10) + ac_bits + bytes([0x00]))
    out.append(b"\xff\xdd" + struct.pack(">HH", 4, 1))
    out.append(b"\xff\xda" + struct.pack(">HB", 8, 1) + bytes([1, 0x00, 0, 63, 0]))
    out.append(b"\x48\x3f" + b"\xff\xd0" + b"\x48\x3f")
    out.append(b"\xff\xd9")
    return b"".join(out)


def test_decode_hand_assembled_known_vector():
    arr = jpeg.decode(_hand_jpeg())
    assert arr.shape == (8, 16)
    assert np.all(arr == 144)


@pytest.mark.parametrize("shape", [(64, 128), (128, 64), (45, 67)])
@pytest.mark.parametrize("sub", ["444", "420"])
def test_roundtrip_psnr_color(shape, sub):
    w, h = shape
    arr = synth_pixels(f"img{w}x{h}", w, h)
    dec = jpeg.decode(jpeg.encode(arr, quality=98, subsampling=sub))
    assert dec.shape == arr.shape
    # 4:2:0 halves chroma resolution — hold it to a looser envelope
    assert psnr(arr, dec) >= (40.0 if sub == "444" else 28.0)


def test_roundtrip_gray_smooth_near_exact():
    g = np.tile(np.arange(64, dtype=np.uint8), (32, 1))
    dec = jpeg.decode(jpeg.encode(g, quality=95))
    assert dec.shape == g.shape
    assert psnr(g, dec) > 55.0


def test_dispatch_and_psnr_gate_on_fixture():
    arr = synth_pixels("img000000000777", 256, 512)
    buf = encode_image(arr, "jpeg")
    assert buf[:2] == b"\xff\xd8" and buf[-2:] == b"\xff\xd9"
    dec = decode_image(buf, "jpeg")
    assert psnr(arr, dec) >= 40.0  # the north-rule lossy invariant
    assert encode_image(arr, "jpeg") == buf  # deterministic


def test_quality_monotonicity_and_size():
    arr = synth_pixels("imgq", 64, 64)
    sizes = []
    errs = []
    for q in (50, 75, 90, 98):
        b = jpeg.encode(arr, quality=q)
        sizes.append(len(b))
        errs.append(psnr(arr, jpeg.decode(b)))
    assert sizes == sorted(sizes)
    assert errs == sorted(errs)


def test_progressive_marker_rejected():
    buf = bytearray(_hand_jpeg())
    i = buf.find(b"\xff\xc0")
    buf[i + 1] = 0xC2  # SOF2 progressive
    with pytest.raises(NotImplementedError):
        jpeg.decode(bytes(buf))
