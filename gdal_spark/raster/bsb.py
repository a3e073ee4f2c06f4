"""BSB / NOS nautical chart (.kap) reader in NumPy.

Mirrors ``frmts/bsb/bsb_read.c`` (itself a clean-room read-only
implementation — the format's patent covers writers only, as the
in-source correspondence gleefully notes):

* text header of ``XXX/`` keyword lines: ``BSB/...RA=w,h`` (or the
  NOS variant with RA at +3/+4), ``RGB/index,r,g,b`` palette
  entries (CSLTokenizeStringComplex on ``,=``), ``VER/``;
  continuation lines and the 0x0D/0x0A handling of
  ``BSBReadHeaderLine`` (a lone 0x1A pushes back and ends the
  header; pinned on the rgbsmall_with_line_break fixture and the
  errant-0x1A-in-header fixture);
* ``NOS/`` ``.NO1`` files decode every byte as ``(b - 9) & 0xFF``;
* header ends at the ``0x1A 0x00`` sequence followed by the color
  size byte (with the 0x31–0x38 ASCII repair quirk,
  ``bsb_read.c:421-428``);
* each scanline starts with a 7-bit big-endian varint line marker
  (values are 0- or 1-based depending on version), then RLE runs:
  the first byte packs the pixel value in the top ``nColorSize``
  bits (after the continuation bit) and a run count in the rest;
  0x80-continued count bytes extend ``count = count*128 + (b &
  0x7F)``; a 0x00 terminates the line; runs emit ``count + 1``
  pixels; one-pixel-short lines get a trailing zero
  (``BSBReadScanline``, ``:786-905``);
* the band is the palette index; the RGB/ palette rides as a color
  table.

Pinned on the autotest checksum 30321 across four fixture variants
(plain, index-table, line-break, errant 0x1A) and the truncated
fixtures failing like the reference (``tests/test_bsb.py``).
"""

from __future__ import annotations

import numpy as np


class _Cur:
    __slots__ = ("buf", "pos", "no1")

    def __init__(self, buf: bytes, no1: bool):
        self.buf = buf
        self.pos = 0
        self.no1 = no1

    def getc(self) -> int:
        if self.pos >= len(self.buf):
            raise EOFError("truncated BSB file")
        b = self.buf[self.pos]
        self.pos += 1
        if self.no1:
            b = (b - 9) & 0xFF
        return b

    def peek(self) -> int:
        if self.pos >= len(self.buf):
            return -1
        b = self.buf[self.pos]
        return (b - 9) & 0xFF if self.no1 else b


def _read_header_line(c: _Cur) -> str | None:
    """BSBReadHeaderLine exactly (bsb_read.c:589-656): '\\0' ends the
    header (the preceding 0x1A is pushed back), a lone 0x1A is
    skipped (errant-0x1A charts), CR/LF pairs collapse, and
    continuation lines starting with spaces join with a comma."""
    out = []
    got_1a = False
    while True:
        try:
            ch = c.getc()
        except EOFError:
            return None
        if ch == 0x00:
            c.pos -= 1
            if got_1a:
                c.pos -= 1
            return None
        got_1a = False
        if ch == 0x1A:
            got_1a = True
            continue
        if ch in (10, 13):
            nxt = c.peek()
            if nxt in (10, 13):
                c.getc()
            # continuation check
            if c.peek() == 0x20:
                while c.peek() == 0x20:
                    c.getc()
                out.append(",")
                continue
            return "".join(out)
        out.append(chr(ch))


def read_bsb(buf: bytes) -> tuple[np.ndarray, dict]:
    no1 = buf[:4] in (b"WX\\x",) or bytes(
        ((b - 9) & 0xFF) for b in buf[:4]) == b"NOS/"
    c = _Cur(buf, no1)

    w = h = 0
    version = 0
    palette = np.zeros((0, 3), np.uint8)
    header_lines = []
    while True:
        line = _read_header_line(c)
        if line is None:
            break
        header_lines.append(line)
    for line in header_lines:
        if len(line) < 4 or line[3] != "/":
            continue
        body = line[4:]
        toks = [t.strip() for t in body.replace("=", ",").split(",")]
        if line.upper().startswith("BSB/") or \
                line.upper().startswith("NOS/"):
            try:
                ra = next(i for i, t in enumerate(toks)
                          if t.upper() == "RA")
            except StopIteration:
                raise ValueError("Failed to extract RA from BSB/NOS line")
            off = 1 if line.upper().startswith("BSB/") else 3
            w = int(toks[ra + off])
            h = int(toks[ra + off + 1])
        elif line.upper().startswith("RGB/") and len(toks) >= 4:
            idx = int(toks[0])
            if idx < 0 or idx > 128:
                raise ValueError("Invalid BSB color table index")
            if idx >= palette.shape[0]:
                grown = np.zeros((idx + 1, 3), np.uint8)
                grown[:palette.shape[0]] = palette
                palette = grown
            palette[idx] = [int(toks[1]), int(toks[2]), int(toks[3])]
        elif line.upper().startswith("VER/"):
            version = int(100 * float(toks[0]) + 0.5)
    if w <= 0 or h <= 0 or palette.shape[0] == 0:
        raise ValueError("BSB header missing RA dimensions or RGB palette")

    # skip to 0x1A 0x00 (tolerating stray 0x1A inside the header tail)
    while True:
        ch = c.getc()
        if ch == 0x1A and c.peek() == 0x00:
            c.getc()
            break
    color_size = c.getc()
    if 0x31 <= color_size <= 0x38:
        color_size -= 0x30  # ASCII digit repair (bsb_read.c:426)
    if not (0 < color_size <= 7):
        raise ValueError(f"Bad BSB color size {color_size}")

    value_shift = 7 - color_size
    value_mask = ((1 << color_size) - 1) << value_shift
    count_mask = (1 << (7 - color_size)) - 1

    # optional line-offset index table: the last 4 bytes point at h
    # big-endian uint32 row offsets (bsb_read.c:127-196)
    line_offsets = None
    if len(buf) >= 4 + 4 * h + 4 and not no1:
        import struct
        tbl = struct.unpack(">I", buf[-4:])[0]
        if tbl + 4 * h + 4 == len(buf) and tbl > c.pos:
            offs = np.frombuffer(buf, ">u4", h, tbl)
            if offs[0] >= c.pos and np.all(np.diff(offs.astype(np.int64))
                                           > 0) and offs[-1] < tbl:
                line_offsets = offs

    arr = np.zeros((h, w), np.uint8)
    for row in range(h):
        if line_offsets is not None:
            c.pos = int(line_offsets[row])
        # line marker varint (skip stray zero bytes like optech charts)
        marker = 0
        while True:
            b = c.getc()
            while row != 0 and marker == 0 and b == 0:
                b = c.getc()
            marker = marker * 128 + (b & 0x7F)
            if not (b & 0x80):
                break
        if marker not in (row, row + 1):
            raise ValueError(
                f"Got scanline id {marker} when looking for {row + 1}")
        ipix = 0
        while True:  # refill loop (bsb_read.c "just repeat the process")
            while True:
                b = c.getc()
                if b == 0:
                    break
                val = (b & value_mask) >> value_shift
                count = b & count_mask
                while b & 0x80:
                    b = c.getc()
                    count = count * 128 + (b & 0x7F)
                if ipix + count + 1 > w:
                    count = w - ipix - 1
                if count >= 0:
                    arr[row, ipix:ipix + count + 1] = val
                    ipix += count + 1
            if ipix >= w:
                break
            if ipix == w - 1:
                arr[row, ipix] = 0
                break
            if row == h - 1:
                break
            # peek: are the following bytes the next line's marker?
            saved = c.pos
            try:
                marker = 0
                while True:
                    b = c.getc()
                    while marker == 0 and b == 0:
                        b = c.getc()
                    marker = marker * 128 + (b & 0x7F)
                    if not (b & 0x80):
                        break
                is_next = marker in (row + 1, row + 2)
            except EOFError:
                is_next = True
            c.pos = saved
            if is_next:
                break

    # indices are 1-based (0 = filled/missing): the band shifts nonzero
    # values down and the color table drops entry 0
    # (bsbdataset.cpp:108,130-137)
    arr[arr > 0] -= 1
    pal = palette[1:] if palette.shape[0] > 1 else palette
    rgba = np.zeros((pal.shape[0], 4), np.uint8)
    rgba[:, :3] = pal
    rgba[:, 3] = 255
    return arr, {
        "w": w, "h": h, "palette": rgba, "version": version,
        "color_size": int(color_size), "no1": no1,
    }
