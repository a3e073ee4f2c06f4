"""TGA (Truevision Targa) codec — GDAL's read-only TGA driver in NumPy.

Mirrors ``frmts/tga/tgadataset.cpp``:

* image types 1/2/3 (uncompressed colormap / true-color / grayscale)
  and 9/10/11 (their RLE forms); RLE packets may cross scanline
  boundaries (pinned on the autotest's ffmpeg sample ``test1g.tga``);
* pixel depths 8 (gray / colormap index), 16 (5-5-5 true color,
  each field expanded ``v << 3`` per ``tgadataset.cpp:375``; or
  16-bit colormap index), 24 (BGR) and 32 (BGRA);
* bottom-up default row order, top-down when descriptor bit 5 set;
* color maps with 15/16/24/32-bit entries, returned as an RGBA table
  (``tgadataset.cpp:268`` 5-bit→8-bit shifts); single fully
  transparent 32-bit entry → nodata index (``:236-256``);
* the TGA 2.0 footer (``TRUEVISION-XFILE.`` signature) and its 495-
  byte extension area: AUTHOR_NAME (40 chars), COMMENTS (4×81 lines,
  newline-joined), attributes type 1/2 demoting the fourth channel
  (``:656-663``); IMAGE_ID from the 18-byte header's ID field;
* fourth channel is Alpha iff descriptor's attribute-bit count is 8
  and the extension area doesn't demote it (``:118,586``).

Every fixture in ``autotest/gdrivers/data/tga/`` decodes to GDAL's
published band checksums in ``tests/test_tga.py``.

The writer emits uncompressed or RLE type 2/3/10/11 files (GDAL's
driver is read-only — the writer exists for round-trip tests and
distributed sinks, and its output re-reads through this decoder and
through GDAL's semantics).
"""

from __future__ import annotations

import struct

import numpy as np


class TgaInfo(dict):
    """Decoded metadata: w h bands pixels index palette metadata ..."""

    __getattr__ = dict.__getitem__
    __setattr__ = dict.__setitem__


def _rle_expand(data: bytes, n_pix: int, bpp: int) -> bytes:
    """Expand TGA RLE packets (runs may cross scanlines)."""
    out = bytearray()
    need = n_pix * bpp
    i = 0
    while len(out) < need and i < len(data):
        hdr = data[i]
        i += 1
        count = (hdr & 0x7F) + 1
        if hdr & 0x80:  # run packet: one pixel value repeated
            out += data[i : i + bpp] * count
            i += bpp
        else:  # raw packet: count literal pixels
            out += data[i : i + count * bpp]
            i += count * bpp
    if len(out) < need:
        raise ValueError("truncated TGA RLE stream")
    return bytes(out[:need])


def _expand_555(v: np.ndarray) -> np.ndarray:
    """(…,) uint16 → (…, 3) uint8 RGB, each 5-bit field << 3."""
    r = ((v >> 10) & 31) << 3
    g = ((v >> 5) & 31) << 3
    b = (v & 31) << 3
    return np.stack([r, g, b], axis=-1).astype(np.uint8)


def decode_full(buf: bytes) -> TgaInfo:
    buf = bytes(buf)
    if len(buf) < 18:
        raise ValueError("not a TGA (too short)")
    id_len, cmap_type, img_type = buf[0], buf[1], buf[2]
    cmap_first, cmap_len = struct.unpack_from("<HH", buf, 3)
    cmap_entry_size = buf[7]
    w, h = struct.unpack_from("<HH", buf, 12)
    depth, descriptor = buf[16], buf[17]
    if img_type not in (1, 2, 3, 9, 10, 11):
        raise NotImplementedError(f"TGA image type {img_type}")
    if w == 0 or h == 0:
        raise ValueError("zero-sized TGA")
    top_down = bool(descriptor & 0x20)
    has_fourth = (descriptor & 15) == 8
    fourth_is_alpha = has_fourth

    meta: dict[str, str] = {}
    if id_len:
        meta["IMAGE_ID"] = buf[18 : 18 + id_len].decode("latin-1")

    off = 18 + id_len
    palette = None
    nodata = None
    if cmap_type == 1 and cmap_len:
        esz = cmap_entry_size
        if esz not in (15, 16, 24, 32):
            raise NotImplementedError(f"color map entry size {esz}")
        nbytes = cmap_len * ((esz + 7) // 8)
        raw = buf[off : off + nbytes]
        off += nbytes
        pal = np.zeros((cmap_first + cmap_len, 4), np.uint8)
        pal[:, 3] = 255
        if esz in (15, 16):
            v = np.frombuffer(raw, "<u2", cmap_len).astype(np.uint16)
            pal[cmap_first:, :3] = _expand_555(v)
        elif esz == 24:
            bgr = np.frombuffer(raw, np.uint8).reshape(cmap_len, 3)
            pal[cmap_first:, :3] = bgr[:, ::-1]
        else:
            bgra = np.frombuffer(raw, np.uint8).reshape(cmap_len, 4)
            pal[cmap_first:, :3] = bgra[:, 2::-1]
            pal[cmap_first:, 3] = bgra[:, 3]
            zero = np.nonzero(bgra[:, 3] == 0)[0]
            if len(zero) == 1:  # tgadataset.cpp:254 single-alpha-0 nodata
                nodata = int(cmap_first + zero[0])
        palette = pal

    # TGA 2.0 footer → extension area (AUTHOR_NAME/COMMENTS/attr type)
    if len(buf) >= 26 and buf[-18:] == b"TRUEVISION-XFILE.\x00":
        (ext_off,) = struct.unpack_from("<I", buf, len(buf) - 26)
        if ext_off and ext_off + 495 <= len(buf):
            ext = buf[ext_off : ext_off + 495]
            (ext_size,) = struct.unpack_from("<H", ext, 0)
            if ext_size >= 495:
                if ext[2] not in (0x20, 0):
                    s = ext[2:42].split(b"\x00")[0].decode("latin-1").rstrip()
                    if s:
                        meta["AUTHOR_NAME"] = s
                if ext[43] not in (0x20, 0):
                    lines = []
                    for i in range(4):
                        seg = ext[43 + 81 * i : 43 + 81 * i + 80]
                        if seg[:1] == b"\x00":
                            break
                        lines.append(
                            seg.split(b"\x00")[0].decode("latin-1").rstrip())
                    if lines:
                        meta["COMMENTS"] = "\n".join(lines)
                attr_type = ext[494]
                if attr_type == 1:
                    has_fourth = False
                elif attr_type == 2:
                    fourth_is_alpha = False

    gray_or_map = img_type in (1, 3, 9, 11)
    if gray_or_map and depth not in (8, 16):
        raise NotImplementedError(f"pixel depth {depth} for gray/colormap")
    if not gray_or_map and depth not in (16, 24, 32):
        raise NotImplementedError(f"pixel depth {depth} for true color")
    bpp = (depth + 7) // 8

    if img_type >= 9:
        raw = _rle_expand(buf[off:], w * h, bpp)
    else:
        raw = buf[off : off + w * h * bpp]
        if len(raw) < w * h * bpp:
            raise ValueError("truncated TGA pixel data")

    info = TgaInfo(w=w, h=h, metadata=meta, palette=palette, nodata=nodata,
                   index=None, pixels=None, alpha=False)
    if gray_or_map:
        dt = np.uint8 if bpp == 1 else np.dtype("<u2")
        band = np.frombuffer(raw, dt).reshape(h, w)
        if not top_down:
            band = band[::-1]
        info["index"] = np.ascontiguousarray(band)
        info["bands"] = 1
        return info

    if depth == 16:
        v = np.frombuffer(raw, "<u2").reshape(h, w)
        px = _expand_555(v)
        nb = 3
    elif depth == 24:
        px = np.frombuffer(raw, np.uint8).reshape(h, w, 3)[:, :, ::-1]
        nb = 3
    else:
        bgra = np.frombuffer(raw, np.uint8).reshape(h, w, 4)
        px = np.concatenate([bgra[:, :, 2::-1], bgra[:, :, 3:4]], axis=2)
        nb = 4  # band 4 always exposed; its interpretation varies
    if not top_down:
        px = px[::-1]
    info["pixels"] = np.ascontiguousarray(px)
    info["bands"] = nb
    info["alpha"] = bool(nb == 4 and has_fourth and fourth_is_alpha)
    return info


def decode(buf: bytes) -> np.ndarray:
    """Pixel view: palette files expand through the color table."""
    g = decode_full(buf)
    if g.pixels is not None:
        return g.pixels
    if g.palette is not None:
        return g.palette[g.index][..., :3]
    return g.index


def _rle_compress(raw: bytes, n_pix: int, bpp: int) -> bytes:
    """Greedy TGA RLE: runs of equal pixels → run packets, else raw."""
    px = np.frombuffer(raw, np.uint8).reshape(n_pix, bpp)
    same = np.concatenate([[False], (px[1:] == px[:-1]).all(axis=1)])
    out = bytearray()
    i = 0
    while i < n_pix:
        j = i + 1
        while j < n_pix and same[j] and j - i < 128:
            j += 1
        if j - i >= 2:  # run packet: header 0x80 | (count-1)
            out.append(0x80 | (j - i - 1))
            out += px[i].tobytes()
            i = j
        else:  # raw packet: until next run of >=2 or 128 pixels
            j = i + 1
            while (j < n_pix and j - i < 128
                   and not (j + 1 < n_pix and same[j + 1] and same[j])):
                j += 1
            out.append(j - i - 1)
            out += px[i:j].tobytes()
            i = j
    return bytes(out)


def encode(arr: np.ndarray, rle: bool = True, image_id: str = "") -> bytes:
    """Write gray (h,w), RGB (h,w,3) or RGBA (h,w,4) uint8 as TGA,
    top-down row order (descriptor bit 5), optional RLE."""
    a = np.ascontiguousarray(arr, np.uint8)
    if a.ndim == 2:
        img_type, depth, attr = 3, 8, 0
        raw = a.tobytes()
        bpp = 1
    elif a.ndim == 3 and a.shape[2] == 3:
        img_type, depth, attr = 2, 24, 0
        raw = a[:, :, ::-1].tobytes()
        bpp = 3
    elif a.ndim == 3 and a.shape[2] == 4:
        img_type, depth, attr = 2, 32, 8
        raw = np.concatenate(
            [a[:, :, 2::-1], a[:, :, 3:4]], axis=2).tobytes()
        bpp = 4
    else:
        raise ValueError(f"unsupported array shape {a.shape}")
    h, w = a.shape[:2]
    idb = image_id.encode("latin-1")[:255]
    if rle:
        img_type += 8
        raw = _rle_compress(raw, w * h, bpp)
    hdr = struct.pack(
        "<BBBHHBHHHHBB", len(idb), 0, img_type, 0, 0, 0, 0, 0,
        w, h, depth, 0x20 | attr)
    return hdr + idb + raw
