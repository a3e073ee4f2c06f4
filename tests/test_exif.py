"""EXIF metadata — raster/exif.py.

External oracles: the reference autotest's own pinned values
(autotest/gdrivers/jpeg.py::test_jpeg_2 on albania.jpg and
::test_jpeg_apply_orientation on exif_orientation/F1..F8.jpg) — real
camera-produced files, expected strings copied from the published
test, nothing read from the reference at build time.
"""

import os

import numpy as np
import pytest

from gdal_spark.raster import codec
from gdal_spark.raster import exif as E

_REF = "/root/reference/autotest/gdrivers/data/jpeg"


def _ref(path):
    p = os.path.join(_REF, path)
    if not os.path.exists(p):
        pytest.skip("reference autotest data not present")
    with open(p, "rb") as f:
        return f.read()


def test_albania_pins():
    """autotest/gdrivers/jpeg.py::test_jpeg_2 expected strings."""
    md = E.parse_exif(_ref("albania.jpg"))
    assert md["EXIF_GPSLatitudeRef"] == "N"
    assert md["EXIF_GPSLatitude"] == "(41) (1) (22.91)"
    assert md["EXIF_PixelXDimension"] == "361"
    assert md["EXIF_GPSVersionID"] == "0x02 0x00 0x00 0x00"
    assert md["EXIF_ExifVersion"] == "0210"
    assert md["EXIF_XResolution"] == "(96)"
    assert md["EXIF_GPSLongitude"] == "(19) (55) (42.35)"
    raw = E.parse_exif_raw(_ref("albania.jpg"))
    lat = E.gps_decimal(raw, "lat")
    lon = E.gps_decimal(raw, "lon")
    assert lat == pytest.approx(41 + 1 / 60 + 22.91 / 3600)
    assert lon == pytest.approx(19 + 55 / 60 + 42.35 / 3600)


@pytest.mark.parametrize("orientation", range(1, 9))
def test_apply_orientation_autotest(orientation):
    """autotest/gdrivers/jpeg.py::test_jpeg_apply_orientation: every
    F{1..8}.jpg must decode+orient to the same 3x5 'F' shape."""
    data = _ref(f"exif_orientation/F{orientation}.jpg")
    md = E.parse_exif(data)
    assert md["EXIF_Orientation"] == str(orientation)
    arr = codec.decode_image(data, "jpeg")
    out = E.apply_exif_orientation(arr, orientation)
    a2 = out[..., 0] if out.ndim == 3 else out
    assert a2.shape == (5, 3)
    got = [1 if v else 0 for v in a2.flatten()]
    assert got == [1, 1, 1, 1, 0, 0, 1, 1, 0, 1, 0, 0, 1, 0, 0]


def test_build_parse_roundtrip():
    arr = ((np.arange(16 * 24 * 3).reshape(16, 24, 3) * 7) % 256).astype(
        np.uint8
    )
    jpg = codec.encode_image(arr, "jpeg")
    md = {
        "EXIF_Make": "CamCo",
        "EXIF_Model": "X100",
        "EXIF_Orientation": 6,
        "EXIF_DateTime": "2024:05:06 12:00:00",
        "EXIF_ExposureTime": (1, 250),
        "EXIF_ISOSpeedRatings": 400,
        "EXIF_PixelXDimension": 24,
        "EXIF_GPSLatitudeRef": "S",
        "EXIF_GPSLatitude": [(41123456, 1000000), (0, 1), (0, 1)],
        "EXIF_GPSLongitudeRef": "E",
        "EXIF_GPSLongitude": [(2987654, 1000000), (0, 1), (0, 1)],
    }
    j2 = E.insert_exif(jpg, md)
    out = E.parse_exif(j2)
    assert out["EXIF_Make"] == "CamCo"
    assert out["EXIF_Orientation"] == "6"
    assert out["EXIF_DateTime"] == "2024:05:06 12:00:00"
    assert out["EXIF_ExposureTime"] == "(0.004)"
    assert out["EXIF_ISOSpeedRatings"] == "400"
    raw = E.parse_exif_raw(j2)
    assert E.gps_decimal(raw, "lat") == pytest.approx(-41.123456)
    assert E.gps_decimal(raw, "lon") == pytest.approx(2.987654)
    # payload still decodes identically
    assert np.array_equal(
        codec.decode_image(j2, "jpeg"), codec.decode_image(jpg, "jpeg")
    )


def test_big_endian_tiff_header():
    """MM byte order (the reference handles both via bSwabflag)."""
    import struct

    # hand-assembled MM IFD0: Orientation=3 (SHORT, inline left-packed)
    ifd = struct.pack(">H", 1)
    ifd += struct.pack(">HHI", 0x112, 3, 1) + struct.pack(">HH", 3, 0)
    ifd += struct.pack(">I", 0)
    tiff = b"MM" + struct.pack(">HI", 42, 8) + ifd
    payload = b"Exif\x00\x00" + tiff
    app1 = b"\xff\xe1" + struct.pack(">H", len(payload) + 2) + payload
    jpeg = b"\xff\xd8" + app1 + b"\xff\xd9"
    assert E.parse_exif(jpeg) == {"EXIF_Orientation": "3"}


def test_unknown_tag_decimal_name():
    md = {"EXIF_Make": "x"}
    jpg = codec.encode_image(
        np.zeros((8, 8, 3), dtype=np.uint8), "jpeg"
    )
    j2 = E.insert_exif(jpg, md)
    # patch the Make tag id (0x10F) to an unregistered one (0x9999)
    import struct

    idx = j2.find(struct.pack("<HH", 0x10F, 2))
    patched = j2[:idx] + struct.pack("<H", 0x9999) + j2[idx + 2:]
    out = E.parse_exif(patched)
    assert "EXIF_39321" in out  # 0x9999 = 39321, gdalexif.cpp:664 style


def test_no_exif_returns_empty():
    jpg = codec.encode_image(np.zeros((8, 8, 3), dtype=np.uint8), "jpeg")
    assert E.parse_exif(jpg) == {}
    png = codec.encode_image(np.zeros((8, 8, 3), dtype=np.uint8), "png")
    assert E.parse_exif(png) == {}


def test_oriented_size_and_involutions():
    assert E.oriented_size(24, 16, 1) == (24, 16)
    assert E.oriented_size(24, 16, 6) == (16, 24)
    arr = np.arange(12).reshape(3, 4)
    # orientations 2,3,4 are involutions; 5 and 7 are self-inverse
    for o in (2, 3, 4, 5, 7):
        assert np.array_equal(
            E.apply_exif_orientation(E.apply_exif_orientation(arr, o), o),
            arr,
        )
    # 6 and 8 are inverses of each other
    assert np.array_equal(
        E.apply_exif_orientation(E.apply_exif_orientation(arr, 6), 8), arr
    )


def test_corrupt_exif_vophead():
    """autotest/gdrivers/jpeg.py::test_jpeg_6: vophead.jpg carries a
    corrupt EXIF directory (entry count 65499) that must be skipped,
    leaving exactly {'EXIF_Software': 'IrfanView'} — the reference's
    unlikely-entry-count guard (gcore/gdalexif.cpp:529)."""
    md = E.parse_exif(_ref("vophead.jpg"))
    assert md == {"EXIF_Software": "IrfanView"}


def test_xmp_fixture():
    """ReadXMPMetadata (jpgdataset.cpp:450): the xml:XMP domain of
    byte_with_xmp.jpg is a valid xpacket."""
    x = E.parse_xmp(_ref("byte_with_xmp.jpg"))
    assert x is not None and x.startswith("<?xpacket begin=")
    assert "<x:xmpmeta" in x and x.rstrip().endswith("?>")
    # files without XMP return None
    assert E.parse_xmp(_ref("albania.jpg")) is None


def test_icc_profile_fixture():
    """ReadICCProfile (jpgdataset.cpp:1358): APP2 ICC_PROFILE chunks
    of arcgis_geodataxform_gcp.jpg reassemble into a profile whose
    ICC header size field matches the byte count."""
    import struct

    p = E.parse_icc_profile(_ref("arcgis_geodataxform_gcp.jpg"))
    assert p is not None
    (declared,) = struct.unpack_from(">I", p, 0)
    assert declared == len(p) == 544
    assert p[4:8] == b"lcms"  # CMM signature
    assert E.parse_icc_profile(_ref("albania.jpg")) is None


def test_icc_chunk_roundtrip_and_guards():
    prof = bytes(range(256)) * 300  # forces a 2-chunk split
    segs = E.build_icc_app2(prof)
    assert len(segs) == 2
    fake = b"\xff\xd8" + b"".join(segs) + b"\xff\xd9"
    assert E.parse_icc_profile(fake) == prof
    # missing chunk → None (the reference discards incomplete sets)
    fake_missing = b"\xff\xd8" + segs[0] + b"\xff\xd9"
    assert E.parse_icc_profile(fake_missing) is None
    # duplicate chunk id → None
    fake_dup = b"\xff\xd8" + segs[0] + segs[0] + b"\xff\xd9"
    assert E.parse_icc_profile(fake_dup) is None


def test_translate_apply_orientation(spark):
    """translate(apply_orientation=True) mirrors APPLY_ORIENTATION:
    the autotest F-fixtures all normalize to the same 3x5 'F'."""
    import pandas as pd

    from gdal_spark.raster.pipeline import translate

    rows = []
    for o in range(1, 9):
        rows.append(("F%d" % o, _ref(f"exif_orientation/F{o}.jpg"),
                     3, 5, "jpeg", None))
    df = spark.createDataFrame(
        pd.DataFrame(rows, columns=[
            "image_id", "bytes", "w", "h", "fmt", "caption"]),
        schema="image_id string, bytes binary, w int, h int,"
               " fmt string, caption string",
    )
    out = translate(df, out_fmt="png", apply_orientation=True).collect()
    assert len(out) == 8
    want = [1, 1, 1, 1, 0, 0, 1, 1, 0, 1, 0, 0, 1, 0, 0]
    for r in out:
        assert (r.w, r.h) == (3, 5), r.image_id
        a = codec.decode_image(bytes(r.bytes), "png")
        band = a[..., 0] if a.ndim == 3 else a
        assert [1 if v else 0 for v in band.flatten()] == want, r.image_id
