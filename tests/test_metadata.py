"""Cross-format XMP / ICC / text metadata — raster/metadata.py.

External oracle: the reference's own cross-driver matrix
(autotest/gdrivers/xmp.py) — each fixture either carries XMP or must
yield none, exactly as the published test asserts.
"""

import os
import zlib

import numpy as np
import pytest

from gdal_spark.raster import codec, metadata as M

_ROOT = "/root/reference/autotest/gdrivers/data"

# (fmt, relative path, expect_xmp) — the subset of the reference's
# autotest/gdrivers/xmp.py `lst` whose formats this engine implements
XMP_MATRIX = [
    ("tiff", "gtiff/byte_with_xmp.tif", True),
    ("tiff", "byte.tif", False),
    ("jpeg", "jpeg/byte_with_xmp.jpg", True),
    ("jpeg", "jpeg/byte_with_xmp_before_soc.jpg", True),
    ("jpeg", "jpeg/rgbsmall_rgb.jpg", False),
    ("png", "png/byte_with_xmp.png", True),
    ("png", "png/test.png", False),
    ("webp", "webp/rgbsmall_with_xmp.webp", True),
    ("webp", "webp/rgbsmall.webp", False),
    ("gif", "gif/byte_with_xmp.gif", True),
    ("gif", "gif/fakebig.gif", False),
]


def _ref(rel):
    p = os.path.join(_ROOT, rel)
    if not os.path.exists(p):
        pytest.skip("reference autotest data not present")
    with open(p, "rb") as f:
        return f.read()


@pytest.mark.parametrize("fmt,rel,expect", XMP_MATRIX,
                         ids=[f"{f}-{e}" for f, r, e in XMP_MATRIX])
def test_xmp_matrix(fmt, rel, expect):
    x = M.image_xmp(_ref(rel), fmt)
    if expect:
        assert x is not None and len(x) > 0, rel
    else:
        assert x is None, rel


def test_webp_meta_chunk_content():
    """The reference's rgbsmall_with_xmp.webp META chunk carries the
    literal placeholder the autotest was built with."""
    x = M.webp_xmp(_ref("webp/rgbsmall_with_xmp.webp"))
    assert x == "FAKE_XMP\n"


def test_png_text_roundtrip_and_munge():
    arr = ((np.arange(16 * 16 * 3) % 256).reshape(16, 16, 3)).astype(
        np.uint8
    )
    png = codec.encode_image(arr, "png")
    chunks = [
        M.build_png_text_chunk("Comment", "hello world"),
        M.build_png_text_chunk("Author Name", "someone"),  # munged key
        M.build_png_itxt_xmp("<x:xmpmeta/>"),
    ]
    p2 = M.insert_png_chunks(png, chunks)
    # still decodes identically
    assert np.array_equal(
        codec.decode_image(p2, "png"), codec.decode_image(png, "png")
    )
    txt = M.png_text(p2)
    # pngdataset.cpp:1590 key munge: ' ' -> '_'; XMP excluded from text
    assert txt == {"Comment": "hello world", "Author_Name": "someone"}
    assert M.png_xmp(p2) == "<x:xmpmeta/>"
    md = M.image_metadata(p2, "png")
    assert md[""]["Comment"] == "hello world"
    assert md["xml:XMP"]["XMP"] == "<x:xmpmeta/>"


def test_png_ztxt_chunk():
    import struct

    data = b"Soft" + b"\x00\x00" + zlib.compress(b"gdal_spark")
    body = b"zTXt" + data
    chunk = (
        struct.pack(">I", len(data)) + body
        + struct.pack(">I", zlib.crc32(body) & 0xFFFFFFFF)
    )
    png = codec.encode_image(np.zeros((4, 4, 3), np.uint8), "png")
    p2 = M.insert_png_chunks(png, [chunk])
    assert M.png_text(p2) == {"Soft": "gdal_spark"}


def test_png_uint16_interlaced_text_fixture():
    """A reference-shipped PNG with a real tEXt chunk."""
    txt = M.png_text(_ref("png/uint16_interlaced.png"))
    assert txt  # non-empty; keys munged
    assert all(
        " " not in k and "=" not in k and ":" not in k for k in txt
    )


def test_webp_exif_and_icc_chunks():
    """libwebp-mux-style EXIF/ICCP chunks in a VP8X container parse
    via the shared TIFF walk (extension beyond the reference's
    XMP-only WebP surface)."""
    import struct

    from gdal_spark.raster import exif as E

    app1 = E.build_exif_app1({"EXIF_Make": "WebCam", "EXIF_Orientation": 5})
    tiffbuf = app1[10:]  # strip marker+len+Exif\0\0
    prof = b"\x00\x00\x00\x20fake-icc-profile-payload\x00\x00\x00\x00"

    def chunk(tag, data):
        pad = b"\x00" if len(data) & 1 else b""
        return tag + struct.pack("<I", len(data)) + data + pad

    body = (
        b"WEBP"
        + chunk(b"VP8X", b"\x00" * 10)
        + chunk(b"EXIF", b"Exif\x00\x00" + tiffbuf)
        + chunk(b"ICCP", prof)
    )
    buf = b"RIFF" + struct.pack("<I", len(body)) + body
    md = M.webp_exif(buf)
    assert md["EXIF_Make"] == "WebCam"
    assert md["EXIF_Orientation"] == "5"
    assert M.webp_icc_profile(buf) == prof


def test_image_metadata_domains_jpeg():
    md = M.image_metadata(_ref("jpeg/albania.jpg"), "jpeg")
    assert md[""]["EXIF_GPSLatitude"] == "(41) (1) (22.91)"
    assert "xml:XMP" not in md
    md2 = M.image_metadata(
        _ref("jpeg/arcgis_geodataxform_gcp.jpg"), "jpeg"
    )
    assert "COLOR_PROFILE" in md2
    import base64

    assert len(base64.b64decode(md2["COLOR_PROFILE"]["SOURCE_ICC_PROFILE"])) == 544
