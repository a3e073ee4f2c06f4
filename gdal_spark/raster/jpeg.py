"""Baseline JPEG codec (ITU-T T.81 / JFIF), pure NumPy + stdlib.

Replaces the round-1/2 ``FakeLossyCodec`` for ``fmt='jpeg'`` so the
engine's flagship lossy invariant — decoded-pixel PSNR ≥ 40 dB, the
metric of ``apps/gdalalg_raster_compare.cpp:1094`` — measures a real
DCT transform codec. Reference behavior surface:
``frmts/jpeg/jpgdataset.cpp`` (libjpeg wrapper); this module is an
original from-scratch implementation of the public ITU-T T.81 spec
(baseline sequential DCT, Huffman entropy coding, Annex K tables).

Scope (everything the engine emits + the common decode surface):

- 8-bit baseline sequential (SOF0), grayscale or YCbCr.
- Sampling factors 1×1 (4:4:4) and 2×2-luma (4:2:0) on both paths.
- Standard Annex K quantization + Huffman tables on encode, arbitrary
  DQT/DHT on decode; restart intervals (DRI/RSTn) on decode.

Design for Spark: the ENCODER is fully vectorized across blocks —
color transform, 8×8 DCT (one einsum over all blocks), quantize,
zigzag, run-length symbol construction, Huffman code lookup, and
variable-length bit packing are all whole-image NumPy array programs
(no per-block Python). The DECODER's Huffman scan is inherently
bit-serial (each code's length gates the next read), so it runs as a
table-driven (2^16-entry LUT) Python loop over symbols only;
dequantize → inverse zigzag → IDCT → upsample → color transform are
vectorized over all blocks. Both run inside Arrow-batched pandas UDFs
(one call per image, many images per batch per partition).
"""

from __future__ import annotations

import struct
from array import array

import numpy as np

# ---------------------------------------------------------------------------
# Constants (ITU-T T.81 Annex K — public spec tables)
# ---------------------------------------------------------------------------

# K.1 luminance / K.2 chrominance quantization tables (natural order)
QUANT_LUMA = np.array(
    [
        16, 11, 10, 16, 24, 40, 51, 61,
        12, 12, 14, 19, 26, 58, 60, 55,
        14, 13, 16, 24, 40, 57, 69, 56,
        14, 17, 22, 29, 51, 87, 80, 62,
        18, 22, 37, 56, 68, 109, 103, 77,
        24, 35, 55, 64, 81, 104, 113, 92,
        49, 64, 78, 87, 103, 121, 120, 101,
        72, 92, 95, 98, 112, 100, 103, 99,
    ],
    dtype=np.int32,
)
QUANT_CHROMA = np.array(
    [
        17, 18, 24, 47, 99, 99, 99, 99,
        18, 21, 26, 66, 99, 99, 99, 99,
        24, 26, 56, 99, 99, 99, 99, 99,
        47, 66, 99, 99, 99, 99, 99, 99,
        99, 99, 99, 99, 99, 99, 99, 99,
        99, 99, 99, 99, 99, 99, 99, 99,
        99, 99, 99, 99, 99, 99, 99, 99,
        99, 99, 99, 99, 99, 99, 99, 99,
    ],
    dtype=np.int32,
)

# zigzag scan order: ZIGZAG[k] = natural index of the k-th zigzag coeff
def _make_zigzag() -> np.ndarray:
    order = []
    for s in range(15):
        idx = range(s + 1)
        for i in (idx if s % 2 else reversed(list(idx))):
            j = s - i
            if i < 8 and j < 8:
                order.append(i * 8 + j)
    return np.array(order, dtype=np.int64)


ZIGZAG = _make_zigzag()
UNZIGZAG = np.argsort(ZIGZAG)
UNZIGZAG_I32 = np.ascontiguousarray(UNZIGZAG, dtype=np.int32)

# K.3 standard Huffman tables: (bits[1..16], values)
DC_LUMA_BITS = [0, 1, 5, 1, 1, 1, 1, 1, 1, 0, 0, 0, 0, 0, 0, 0]
DC_LUMA_VALS = list(range(12))
DC_CHROMA_BITS = [0, 3, 1, 1, 1, 1, 1, 1, 1, 1, 1, 0, 0, 0, 0, 0]
DC_CHROMA_VALS = list(range(12))
AC_LUMA_BITS = [0, 2, 1, 3, 3, 2, 4, 3, 5, 5, 4, 4, 0, 0, 1, 0x7D]
AC_LUMA_VALS = [
    0x01, 0x02, 0x03, 0x00, 0x04, 0x11, 0x05, 0x12, 0x21, 0x31, 0x41, 0x06,
    0x13, 0x51, 0x61, 0x07, 0x22, 0x71, 0x14, 0x32, 0x81, 0x91, 0xA1, 0x08,
    0x23, 0x42, 0xB1, 0xC1, 0x15, 0x52, 0xD1, 0xF0, 0x24, 0x33, 0x62, 0x72,
    0x82, 0x09, 0x0A, 0x16, 0x17, 0x18, 0x19, 0x1A, 0x25, 0x26, 0x27, 0x28,
    0x29, 0x2A, 0x34, 0x35, 0x36, 0x37, 0x38, 0x39, 0x3A, 0x43, 0x44, 0x45,
    0x46, 0x47, 0x48, 0x49, 0x4A, 0x53, 0x54, 0x55, 0x56, 0x57, 0x58, 0x59,
    0x5A, 0x63, 0x64, 0x65, 0x66, 0x67, 0x68, 0x69, 0x6A, 0x73, 0x74, 0x75,
    0x76, 0x77, 0x78, 0x79, 0x7A, 0x83, 0x84, 0x85, 0x86, 0x87, 0x88, 0x89,
    0x8A, 0x92, 0x93, 0x94, 0x95, 0x96, 0x97, 0x98, 0x99, 0x9A, 0xA2, 0xA3,
    0xA4, 0xA5, 0xA6, 0xA7, 0xA8, 0xA9, 0xAA, 0xB2, 0xB3, 0xB4, 0xB5, 0xB6,
    0xB7, 0xB8, 0xB9, 0xBA, 0xC2, 0xC3, 0xC4, 0xC5, 0xC6, 0xC7, 0xC8, 0xC9,
    0xCA, 0xD2, 0xD3, 0xD4, 0xD5, 0xD6, 0xD7, 0xD8, 0xD9, 0xDA, 0xE1, 0xE2,
    0xE3, 0xE4, 0xE5, 0xE6, 0xE7, 0xE8, 0xE9, 0xEA, 0xF1, 0xF2, 0xF3, 0xF4,
    0xF5, 0xF6, 0xF7, 0xF8, 0xF9, 0xFA,
]
AC_CHROMA_BITS = [0, 2, 1, 2, 4, 4, 3, 4, 7, 5, 4, 4, 0, 1, 2, 0x77]
AC_CHROMA_VALS = [
    0x00, 0x01, 0x02, 0x03, 0x11, 0x04, 0x05, 0x21, 0x31, 0x06, 0x12, 0x41,
    0x51, 0x07, 0x61, 0x71, 0x13, 0x22, 0x32, 0x81, 0x08, 0x14, 0x42, 0x91,
    0xA1, 0xB1, 0xC1, 0x09, 0x23, 0x33, 0x52, 0xF0, 0x15, 0x62, 0x72, 0xD1,
    0x0A, 0x16, 0x24, 0x34, 0xE1, 0x25, 0xF1, 0x17, 0x18, 0x19, 0x1A, 0x26,
    0x27, 0x28, 0x29, 0x2A, 0x35, 0x36, 0x37, 0x38, 0x39, 0x3A, 0x43, 0x44,
    0x45, 0x46, 0x47, 0x48, 0x49, 0x4A, 0x53, 0x54, 0x55, 0x56, 0x57, 0x58,
    0x59, 0x5A, 0x63, 0x64, 0x65, 0x66, 0x67, 0x68, 0x69, 0x6A, 0x73, 0x74,
    0x75, 0x76, 0x77, 0x78, 0x79, 0x7A, 0x82, 0x83, 0x84, 0x85, 0x86, 0x87,
    0x88, 0x89, 0x8A, 0x92, 0x93, 0x94, 0x95, 0x96, 0x97, 0x98, 0x99, 0x9A,
    0xA2, 0xA3, 0xA4, 0xA5, 0xA6, 0xA7, 0xA8, 0xA9, 0xAA, 0xB2, 0xB3, 0xB4,
    0xB5, 0xB6, 0xB7, 0xB8, 0xB9, 0xBA, 0xC2, 0xC3, 0xC4, 0xC5, 0xC6, 0xC7,
    0xC8, 0xC9, 0xCA, 0xD2, 0xD3, 0xD4, 0xD5, 0xD6, 0xD7, 0xD8, 0xD9, 0xDA,
    0xE2, 0xE3, 0xE4, 0xE5, 0xE6, 0xE7, 0xE8, 0xE9, 0xEA, 0xF2, 0xF3, 0xF4,
    0xF5, 0xF6, 0xF7, 0xF8, 0xF9, 0xFA,
]

# orthonormal 8×8 DCT-II matrix: forward F = M @ f @ M.T
_k = np.arange(8)
DCT_M = np.cos((2 * _k[None, :] + 1) * _k[:, None] * np.pi / 16.0) * 0.5
DCT_M[0, :] *= 1.0 / np.sqrt(2.0)

# contiguous typed copies handed to the native kernels
DCT_M_C = np.ascontiguousarray(DCT_M, dtype=np.float64)


def _batched_2d(blocks: np.ndarray, left: np.ndarray, right: np.ndarray) -> np.ndarray:
    """``left @ X @ right`` for every 8×8 ``X`` in a (B,8,8) stack as two
    flat (B·8, 8) GEMMs — ~50× faster than the equivalent c_einsum."""
    nb = blocks.shape[0]
    t = (blocks.reshape(-1, 8) @ right).reshape(nb, 8, 8)
    t = (t.transpose(0, 2, 1).reshape(-1, 8) @ left.T).reshape(nb, 8, 8)
    return t.transpose(0, 2, 1)


def _canonical_codes(bits: list[int]) -> list[tuple[int, int]]:
    """(code, length) list in symbol order from the T.81 BITS counts."""
    out = []
    code = 0
    for ln in range(1, 17):
        for _ in range(bits[ln - 1]):
            out.append((code, ln))
            code += 1
        code <<= 1
    return out


def _enc_table(bits, vals) -> tuple[np.ndarray, np.ndarray]:
    """symbol → (code, length) lookup arrays (256-wide)."""
    code = np.zeros(256, dtype=np.int64)
    length = np.zeros(256, dtype=np.int64)
    for (c, ln), v in zip(_canonical_codes(bits), vals):
        code[v] = c
        length[v] = ln
    return code, length


_DEC_LUT_CACHE: dict[tuple, np.ndarray] = {}


def _dec_lut(bits, vals) -> np.ndarray:
    """2^16 lookup: top-16-bit peek → (length << 8) | symbol; 0 invalid.

    Cached by table content — the Annex K tables recur on every image,
    and building the 65536-entry table costs ~15 ms uncached."""
    key = (tuple(bits), tuple(vals))
    hit = _DEC_LUT_CACHE.get(key)
    if hit is not None:
        return hit
    lut = np.zeros(65536, dtype=np.int32)
    for (c, ln), v in zip(_canonical_codes(bits), vals):
        lo = c << (16 - ln)
        lut[lo : lo + (1 << (16 - ln))] = (ln << 8) | v
    _DEC_LUT_CACHE[key] = lut
    return lut


ENC_DC = (_enc_table(DC_LUMA_BITS, DC_LUMA_VALS), _enc_table(DC_CHROMA_BITS, DC_CHROMA_VALS))
ENC_AC = (_enc_table(AC_LUMA_BITS, AC_LUMA_VALS), _enc_table(AC_CHROMA_BITS, AC_CHROMA_VALS))


def quality_tables(quality: int) -> tuple[np.ndarray, np.ndarray]:
    """IJG quality scaling of the Annex K tables (public formula)."""
    q = max(1, min(100, int(quality)))
    scale = 5000 // q if q < 50 else 200 - 2 * q
    out = []
    for base in (QUANT_LUMA, QUANT_CHROMA):
        t = (base * scale + 50) // 100
        out.append(np.clip(t, 1, 255).astype(np.int32))
    return out[0], out[1]


def rgb_to_ycbcr(arr: np.ndarray) -> np.ndarray:
    """JFIF full-range BT.601. float64 (h, w, 3)."""
    a = arr.astype(np.float64)
    r, g, b = a[..., 0], a[..., 1], a[..., 2]
    y = 0.299 * r + 0.587 * g + 0.114 * b
    cb = 128.0 - 0.168735892 * r - 0.331264108 * g + 0.5 * b
    cr = 128.0 + 0.5 * r - 0.418687589 * g - 0.081312411 * b
    return np.stack([y, cb, cr], axis=-1)


def ycbcr_to_rgb(y: np.ndarray, cb: np.ndarray, cr: np.ndarray) -> np.ndarray:
    r = y + 1.402 * (cr - 128.0)
    g = y - 0.344136286 * (cb - 128.0) - 0.714136286 * (cr - 128.0)
    b = y + 1.772 * (cb - 128.0)
    return np.clip(np.round(np.stack([r, g, b], axis=-1)), 0, 255).astype(np.uint8)


def _pad_to_block(plane: np.ndarray, bh: int, bw: int) -> np.ndarray:
    """Edge-replicate pad to multiples of (bh, bw)."""
    h, w = plane.shape
    ph = (-h) % bh
    pw = (-w) % bw
    if ph or pw:
        plane = np.pad(plane, ((0, ph), (0, pw)), mode="edge")
    return plane


def _blocks(plane: np.ndarray) -> np.ndarray:
    """(h, w) → (nby, nbx, 8, 8) → (B, 8, 8) raster block order."""
    h, w = plane.shape
    return (
        plane.reshape(h // 8, 8, w // 8, 8).transpose(0, 2, 1, 3).reshape(-1, 8, 8)
    )


# ---------------------------------------------------------------------------
# Encoder (vectorized across all blocks)
# ---------------------------------------------------------------------------


def _mcu_order_index(nby: int, nbx: int, h: int, v: int, mcux: int) -> np.ndarray:
    """Raster-block index of each block of one component in MCU scan
    order: for MCU (my, mx), the component contributes its blocks
    (v·my+dy, h·mx+dx) for dy<v, dx<h (T.81 A.2.3 interleaving)."""
    my, mx = np.meshgrid(np.arange(nby // v), np.arange(mcux), indexing="ij")
    base = (my[..., None, None] * v + np.arange(v)[None, None, :, None]) * nbx + (
        mx[..., None, None] * h + np.arange(h)[None, None, None, :]
    )
    return base.reshape(-1)


def _category(v: np.ndarray) -> np.ndarray:
    """JPEG magnitude category (bit length of |v|); 0 for v == 0."""
    return np.frexp(np.abs(v).astype(np.float64))[1].astype(np.int64)


def _pack_bits(tokbits: np.ndarray, toklen: np.ndarray) -> bytes:
    """Concatenate variable-length big-endian codes into a padded,
    0xFF-stuffed byte stream (vectorized: one pass per bit lane)."""
    toklen = toklen.astype(np.int64)
    offs = np.cumsum(toklen) - toklen
    total = int(offs[-1] + toklen[-1]) if len(toklen) else 0
    nbits = (total + 7) & ~7
    bits = np.ones(nbits, dtype=np.uint8)  # pad with 1s (T.81 F.1.2.3)
    maxlen = int(toklen.max()) if len(toklen) else 0
    for i in range(maxlen):
        m = toklen > i
        bits[offs[m] + i] = (tokbits[m] >> (toklen[m] - 1 - i)) & 1
    by = np.packbits(bits)
    # byte stuffing: 0xFF → 0xFF 0x00
    ff = np.flatnonzero(by == 0xFF)
    if len(ff):
        by = np.insert(by, ff + 1, 0)
    return by.tobytes()


def encode(arr: np.ndarray, quality: int = 95, subsampling: str = "444") -> bytes:
    """Encode uint8 gray (h,w) or RGB (h,w,3) to baseline JFIF bytes."""
    arr = np.ascontiguousarray(arr)
    if arr.dtype != np.uint8:
        raise ValueError("jpeg encode expects uint8")
    gray = arr.ndim == 2
    h_img, w_img = arr.shape[:2]
    qy, qc = quality_tables(quality)

    if gray:
        comps = [(arr.astype(np.float64), 1, 1, 0)]  # (plane, h, v, qtab_id)
    else:
        ycc = rgb_to_ycbcr(arr)
        if subsampling == "420":
            y = ycc[..., 0]
            # chroma: 2×2 box average on an edge-padded even grid
            p = _pad_to_block(ycc[..., 1], 2, 2)
            cb = (p[0::2, 0::2] + p[0::2, 1::2] + p[1::2, 0::2] + p[1::2, 1::2]) / 4.0
            p = _pad_to_block(ycc[..., 2], 2, 2)
            cr = (p[0::2, 0::2] + p[0::2, 1::2] + p[1::2, 0::2] + p[1::2, 1::2]) / 4.0
            comps = [(y, 2, 2, 0), (cb, 1, 1, 1), (cr, 1, 1, 1)]
        elif subsampling == "444":
            comps = [(ycc[..., 0], 1, 1, 0), (ycc[..., 1], 1, 1, 1), (ycc[..., 2], 1, 1, 1)]
        else:
            raise ValueError(f"unsupported subsampling {subsampling!r}")

    hmax = max(c[1] for c in comps)
    vmax = max(c[2] for c in comps)
    # pad each plane to its own MCU-aligned block grid
    grids = []
    for plane, ch, cv, qid in comps:
        # edge-pad each plane to a whole number of MCUs (cv×ch blocks)
        grids.append((_pad_to_block(plane, 8 * cv, 8 * ch), ch, cv, qid))
    mcux = grids[0][0].shape[1] // (8 * grids[0][1])
    mcuy = grids[0][0].shape[0] // (8 * grids[0][2])
    for plane, ch, cv, _ in grids[1:]:
        # chroma grids must describe the same MCU count
        assert plane.shape[0] // (8 * cv) == mcuy and plane.shape[1] // (8 * ch) == mcux

    # per-component blocks → MCU-interleaved global sequence
    all_blocks = []
    comp_ids = []
    for ci, (plane, ch, cv, qid) in enumerate(grids):
        b = _blocks(plane)
        nby, nbx = plane.shape[0] // 8, plane.shape[1] // 8
        order = _mcu_order_index(nby, nbx, ch, cv, mcux)
        all_blocks.append(b[order])
        comp_ids.append(np.full(len(order), ci, dtype=np.int64))
    blocks_per_mcu = [g[1] * g[2] for g in grids]
    # interleave: MCU m contributes comps' chunks in order
    seq_blocks = np.empty(
        (sum(len(a) for a in all_blocks), 8, 8), dtype=np.float64
    )
    seq_comp = np.empty(len(seq_blocks), dtype=np.int64)
    stride = sum(blocks_per_mcu)
    off = 0
    for ci, a in enumerate(all_blocks):
        k = blocks_per_mcu[ci]
        idx = (np.arange(len(a)) // k) * stride + off + (np.arange(len(a)) % k)
        seq_blocks[idx] = a
        seq_comp[idx] = ci
        off += k

    # forward DCT over every block at once, quantize, zigzag.
    # NOTE: einsum kept deliberately — _batched_2d's GEMM reduction order
    # rounds a handful of exactly-.5 quantized coefficients differently,
    # which changes the encoded bytes vs the golden oracles; encode is not
    # the hot path (decode is), so bit-stability wins here.
    shifted = seq_blocks - 128.0
    F = np.einsum("ij,bjk,lk->bil", DCT_M, shifted, DCT_M)
    qtab = np.stack([qy, qc])[[g[3] for g in grids]]  # (ncomp, 64)
    Fq = np.round(F.reshape(-1, 64) / qtab[seq_comp]).astype(np.int64)
    Z = Fq[:, ZIGZAG]

    # DC differentials per component chain
    dc = Z[:, 0].copy()
    diff = np.empty_like(dc)
    for ci in range(len(grids)):
        m = seq_comp == ci
        sub = dc[m]
        d = np.empty_like(sub)
        d[0] = sub[0]
        d[1:] = sub[1:] - sub[:-1]
        diff[m] = d

    nb_total = len(Z)
    tclass = np.array([0 if g[3] == 0 else 1 for g in grids])[seq_comp]  # table class

    # --- DC tokens ---
    dc_cat = _category(diff)
    dc_vbits = np.where(diff > 0, diff, diff + (1 << dc_cat) - 1).astype(np.int64)
    dc_code = np.where(tclass == 0, ENC_DC[0][0][dc_cat], ENC_DC[1][0][dc_cat])
    dc_hlen = np.where(tclass == 0, ENC_DC[0][1][dc_cat], ENC_DC[1][1][dc_cat])
    dc_bits = (dc_code << dc_cat) | np.where(dc_cat > 0, dc_vbits & ((1 << dc_cat) - 1), 0)
    dc_len = dc_hlen + dc_cat

    # --- AC tokens (vectorized RLE) ---
    ac = Z[:, 1:]
    bi, kposm1 = np.nonzero(ac)
    kpos = kposm1 + 1  # zigzag position 1..63
    vals = ac[bi, kposm1]
    newblk = np.empty(len(bi), dtype=bool)
    if len(bi):
        newblk[0] = True
        newblk[1:] = bi[1:] != bi[:-1]
    prevk = np.where(newblk, 0, np.concatenate([[0], kpos[:-1]]))
    run = kpos - prevk - 1
    nzrl = run // 16
    rrun = run % 16
    cat = _category(vals)
    vbits = np.where(vals > 0, vals, vals + (1 << cat) - 1).astype(np.int64)
    sym = (rrun << 4) | cat
    tcl = tclass[bi]
    code = np.where(tcl == 0, ENC_AC[0][0][sym], ENC_AC[1][0][sym])
    hlen = np.where(tcl == 0, ENC_AC[0][1][sym], ENC_AC[1][1][sym])
    ac_bits = (code << cat) | (vbits & ((1 << cat) - 1))
    ac_len = hlen + cat

    # sequence position within each block: DC = 0, AC tokens count
    # (nzrl + 1) slots each, grouped-cumsum per block
    tpe = nzrl + 1
    cs = np.cumsum(tpe)
    blk_first = np.flatnonzero(newblk)
    blk_of = np.cumsum(newblk) - 1 if len(bi) else np.array([], dtype=np.int64)
    cs0 = np.concatenate([[0], cs])[blk_first] if len(bi) else np.array([], dtype=np.int64)
    seq_end = cs - cs0[blk_of] if len(bi) else np.array([], dtype=np.int64)

    # ZRL filler tokens
    zrl_src = np.flatnonzero(nzrl > 0)
    zrl_blk = np.repeat(bi[zrl_src], nzrl[zrl_src])
    zrl_seq = (
        np.concatenate(
            [np.arange(seq_end[i] - nzrl[i], seq_end[i]) for i in zrl_src]
        )
        if len(zrl_src)
        else np.array([], dtype=np.int64)
    )
    zrl_tcl = tclass[zrl_blk]
    zrl_code = np.where(zrl_tcl == 0, ENC_AC[0][0][0xF0], ENC_AC[1][0][0xF0])
    zrl_len = np.where(zrl_tcl == 0, ENC_AC[0][1][0xF0], ENC_AC[1][1][0xF0])

    # EOB where the block's last nonzero AC position < 63 (or none)
    last_k = np.zeros(nb_total, dtype=np.int64)
    if len(bi):
        last_k[bi] = kpos  # ascending within block → final write wins
    eob_blk = np.flatnonzero(last_k < 63)
    eob_tcl = tclass[eob_blk]
    eob_code = np.where(eob_tcl == 0, ENC_AC[0][0][0x00], ENC_AC[1][0][0x00])
    eob_len = np.where(eob_tcl == 0, ENC_AC[0][1][0x00], ENC_AC[1][1][0x00])

    tok_blk = np.concatenate([np.arange(nb_total), bi, zrl_blk, eob_blk])
    tok_seq = np.concatenate(
        [
            np.zeros(nb_total, dtype=np.int64),
            seq_end,
            zrl_seq,
            np.full(len(eob_blk), 1 << 30, dtype=np.int64),
        ]
    )
    tok_bits = np.concatenate([dc_bits, ac_bits, zrl_code, eob_code])
    tok_len = np.concatenate([dc_len, ac_len, zrl_len, eob_len])
    order = np.lexsort((tok_seq, tok_blk))
    scan = _pack_bits(tok_bits[order], tok_len[order])

    # --- markers ---
    out = [b"\xff\xd8"]  # SOI
    out.append(
        b"\xff\xe0" + struct.pack(">H", 16) + b"JFIF\x00\x01\x01\x00"
        + struct.pack(">HHBB", 1, 1, 0, 0)
    )
    ntab = 1 if gray else 2
    for tid, q in enumerate((qy, qc)[:ntab]):
        out.append(b"\xff\xdb" + struct.pack(">HB", 67, tid) + bytes(q[ZIGZAG].astype(np.uint8)))
    sof = struct.pack(">HBHHB", 8 + 3 * len(grids), 8, h_img, w_img, len(grids))
    for ci, (_, ch, cv, qid) in enumerate(grids):
        sof += struct.pack(">BBB", ci + 1, (ch << 4) | cv, qid)
    out.append(b"\xff\xc0" + sof)
    huffs = [(0x00, DC_LUMA_BITS, DC_LUMA_VALS), (0x10, AC_LUMA_BITS, AC_LUMA_VALS)]
    if not gray:
        huffs += [(0x01, DC_CHROMA_BITS, DC_CHROMA_VALS), (0x11, AC_CHROMA_BITS, AC_CHROMA_VALS)]
    for tc, bits, vals_ in huffs:
        out.append(
            b"\xff\xc4"
            + struct.pack(">HB", 19 + len(vals_), tc)
            + bytes(bits)
            + bytes(vals_)
        )
    sos = struct.pack(">HB", 6 + 2 * len(grids), len(grids))
    for ci, (_, _, _, qid) in enumerate(grids):
        sos += struct.pack(">BB", ci + 1, 0x00 if qid == 0 else 0x11)
    sos += b"\x00\x3f\x00"
    out.append(b"\xff\xda" + sos)
    out.append(scan)
    out.append(b"\xff\xd9")  # EOI
    return b"".join(out)


# ---------------------------------------------------------------------------
# Progressive encoder (SOF2) — libjpeg-style scan script, Annex K tables
# ---------------------------------------------------------------------------

# default scan scripts (component indices), mirroring libjpeg
# jcparam.c jpeg_simple_progression: (comps, Ss, Se, Ah, Al)
PROG_SCANS_COLOR = (
    ((0, 1, 2), 0, 0, 0, 1),
    ((0,), 1, 5, 0, 2),
    ((2,), 1, 63, 0, 1),
    ((1,), 1, 63, 0, 1),
    ((0,), 6, 63, 0, 2),
    ((0,), 1, 63, 2, 1),
    ((0, 1, 2), 0, 0, 1, 0),
    ((2,), 1, 63, 1, 0),
    ((1,), 1, 63, 1, 0),
    ((0,), 1, 63, 1, 0),
)
PROG_SCANS_GRAY = (
    ((0,), 0, 0, 0, 1),
    ((0,), 1, 5, 0, 2),
    ((0,), 6, 63, 0, 2),
    ((0,), 1, 63, 2, 1),
    ((0,), 0, 0, 1, 0),
    ((0,), 1, 63, 1, 0),
)


def _gen_optimal_table(freq: np.ndarray) -> tuple[list[int], list[int]]:
    """Frequency-optimal length-limited Huffman table → (BITS[1..16]
    counts padded to index 0..16, symbol list).

    The classic IJG construction (public algorithm of jchuff.c
    ``jpeg_gen_optimal_table``): repeated two-least-frequent merge with
    an 'others' chain, then the >16-bit length fix-up, then dropping
    the pseudo-symbol that reserves the all-ones code."""
    f = np.zeros(257, dtype=np.int64)
    f[: len(freq)] = freq
    f[256] = 1  # pseudo-symbol: keeps the all-ones code unused (T.81)
    codesize = np.zeros(257, dtype=np.int64)
    others = np.full(257, -1, dtype=np.int64)
    while True:
        nz = np.flatnonzero(f)
        if len(nz) <= 1:
            break
        order = nz[np.lexsort((-nz, f[nz]))]  # freq asc, index desc on ties
        c1, c2 = int(order[0]), int(order[1])
        f[c1] += f[c2]
        f[c2] = 0
        codesize[c1] += 1
        while others[c1] >= 0:
            c1 = int(others[c1])
            codesize[c1] += 1
        others[c1] = c2
        codesize[c2] += 1
        while others[c2] >= 0:
            c2 = int(others[c2])
            codesize[c2] += 1
    bits = [0] * 33
    for i in range(257):
        if codesize[i]:
            bits[int(codesize[i])] += 1
    for i in range(32, 16, -1):  # limit code lengths to 16
        while bits[i] > 0:
            j = i - 2
            while bits[j] == 0:
                j -= 1
            bits[i] -= 2
            bits[i - 1] += 1
            bits[j + 1] += 2
            bits[j] -= 1
    for i in range(16, 0, -1):
        if bits[i] > 0:
            bits[i] -= 1  # drop the pseudo-symbol's (longest) code
            break
    vals = [
        s
        for s in sorted(range(256), key=lambda s: (int(codesize[s]), s))
        if codesize[s] > 0
    ]
    return bits[:17], vals


def _run_prog_scan(
    Zs, grids, comp_idx, ss, se, ah, al, mcux, nbx_c, bw_c, bh_c, dri,
    sym, put, boundary,
) -> None:
    """Walk one progressive scan's coding units exactly once, calling
    ``sym(key, s)`` per Huffman symbol (key = ('dc'|'ac', tclass)),
    ``put(v, n)`` per raw-bit group, and ``boundary()`` at restart
    edges. Run twice: a counting pass (build optimal tables) and an
    emission pass — both produce the identical symbol stream.

    Symbol/bit ordering mirrors libjpeg's jcphuff.c (the exact inverse
    of ``_prog_block_*`` below), including general EOB runs (≤32767)
    with buffered refinement correction bits."""
    tclass = [0 if g[3] == 0 else 1 for g in grids]
    tc_scan = tclass[comp_idx[0]]
    ac_key = ("ac", tc_scan)
    eob = {"run": 0, "bits": []}

    def flush_eobrun() -> None:
        n = eob["run"]
        if n:
            r = n.bit_length() - 1
            sym(ac_key, r << 4)
            if r:
                put(n - (1 << r), r)
            for b in eob["bits"]:
                put(b, 1)
            eob["run"] = 0
            eob["bits"] = []

    def dc_first(ci: int, bidx: int, preds: list[int]) -> None:
        v = int(Zs[ci][bidx, 0]) >> al  # arithmetic shift, per jcphuff
        diff = v - preds[ci]
        preds[ci] = v
        cat = abs(diff).bit_length()
        sym(("dc", tclass[ci]), cat)
        if cat:
            vb = diff if diff > 0 else diff + (1 << cat) - 1
            put(vb & ((1 << cat) - 1), cat)

    def dc_refine(ci: int, bidx: int) -> None:
        put((int(Zs[ci][bidx, 0]) >> al) & 1, 1)

    def ac_first(ci: int, bidx: int) -> None:
        band = Zs[ci][bidx][ss : se + 1].tolist()
        r = 0
        for k, v in enumerate(band, start=ss):
            t = abs(v) >> al  # magnitude shift, per jcphuff
            if t == 0:
                r += 1
                continue
            flush_eobrun()
            while r > 15:
                sym(ac_key, 0xF0)
                r -= 16
            cat = t.bit_length()
            sym(ac_key, (r << 4) | cat)
            put((t if v > 0 else -t + (1 << cat) - 1) & ((1 << cat) - 1), cat)
            r = 0
        if r > 0:  # trailing zeros join the pending EOB run
            eob["run"] += 1
            if eob["run"] == 0x7FFF:
                flush_eobrun()

    def ac_refine(ci: int, bidx: int) -> None:
        band = Zs[ci][bidx][ss : se + 1].tolist()
        absv = [abs(v) >> al for v in band]
        eobpos = -1
        for j, t in enumerate(absv):
            if t == 1:
                eobpos = j
        r = 0
        br: list[int] = []  # correction bits pending within this block
        for j, t in enumerate(absv):
            if t == 0:
                r += 1
                continue
            # ZRLs that cannot fold into the EOB run (jcphuff ordering:
            # flushed BEFORE the already-nonzero correction test)
            while r > 15 and j <= eobpos:
                flush_eobrun()
                sym(ac_key, 0xF0)
                r -= 16
                for b in br:
                    put(b, 1)
                br = []
            if t > 1:  # already nonzero: defer its correction bit
                br.append(t & 1)
                continue
            flush_eobrun()
            sym(ac_key, (r << 4) | 1)
            put(1 if band[j] > 0 else 0, 1)
            for b in br:
                put(b, 1)
            br = []
            r = 0
        if r > 0 or br:
            eob["run"] += 1
            eob["bits"].extend(br)
            if eob["run"] == 0x7FFF:
                flush_eobrun()

    if len(comp_idx) > 1:  # interleaved DC scan over the MCU grid
        ci0 = comp_idx[0]
        n_units = len(Zs[ci0]) // (grids[ci0][1] * grids[ci0][2])  # mcux*mcuy
        plan = []
        for ci in comp_idx:
            _, ch, cv, _ = grids[ci]
            for dy in range(cv):
                for dx in range(ch):
                    plan.append((ci, ch, cv, dy, dx))
    else:
        ci0 = comp_idx[0]
        n_units = bw_c[ci0] * bh_c[ci0]

    preds = [0] * len(grids)
    for unit in range(n_units):
        if dri and unit and unit % dri == 0:
            flush_eobrun()
            boundary()
            preds = [0] * len(grids)
        if len(comp_idx) > 1:
            my, mx = divmod(unit, mcux)
            for ci, ch, cv, dy, dx in plan:
                bidx = (my * cv + dy) * nbx_c[ci] + mx * ch + dx
                if ah == 0:
                    dc_first(ci, bidx, preds)
                else:
                    dc_refine(ci, bidx)
        else:
            row_, col = divmod(unit, bw_c[ci0])
            bidx = row_ * nbx_c[ci0] + col
            if ss == 0:
                if ah == 0:
                    dc_first(ci0, bidx, preds)
                else:
                    dc_refine(ci0, bidx)
            elif ah == 0:
                ac_first(ci0, bidx)
            else:
                ac_refine(ci0, bidx)
    flush_eobrun()


def encode_progressive(
    arr: np.ndarray,
    quality: int = 95,
    subsampling: str = "444",
    dri: int = 0,
    scans=None,
) -> bytes:
    """Encode uint8 gray (h,w) or RGB (h,w,3) to progressive (SOF2)
    JFIF bytes.

    Same color transform / DCT / quantization as the baseline
    ``encode`` (identical quantized coefficients), entropy-coded with
    spectral selection + successive approximation over a libjpeg-style
    scan script — so ``decode(encode_progressive(a)) ==
    decode(encode(a))`` bit-for-bit. Like real progressive encoders,
    each scan carries frequency-optimized Huffman tables (DHT emitted
    per scan) and general EOB runs, so the decoder's EOBRUN path is
    exercised by every fixture. Reference decode surface:
    ``frmts/jpeg/jpgdataset.cpp`` (libjpeg SOF2 path)."""
    arr = np.ascontiguousarray(arr)
    if arr.dtype != np.uint8:
        raise ValueError("jpeg encode expects uint8")
    gray = arr.ndim == 2
    h_img, w_img = arr.shape[:2]
    qy, qc = quality_tables(quality)

    if gray:
        comps = [(arr.astype(np.float64), 1, 1, 0)]
    else:
        ycc = rgb_to_ycbcr(arr)
        if subsampling == "420":
            y = ycc[..., 0]
            p = _pad_to_block(ycc[..., 1], 2, 2)
            cb = (p[0::2, 0::2] + p[0::2, 1::2] + p[1::2, 0::2] + p[1::2, 1::2]) / 4.0
            p = _pad_to_block(ycc[..., 2], 2, 2)
            cr = (p[0::2, 0::2] + p[0::2, 1::2] + p[1::2, 0::2] + p[1::2, 1::2]) / 4.0
            comps = [(y, 2, 2, 0), (cb, 1, 1, 1), (cr, 1, 1, 1)]
        elif subsampling == "444":
            comps = [(ycc[..., 0], 1, 1, 0), (ycc[..., 1], 1, 1, 1), (ycc[..., 2], 1, 1, 1)]
        else:
            raise ValueError(f"unsupported subsampling {subsampling!r}")

    hmax = max(c[1] for c in comps)
    vmax = max(c[2] for c in comps)
    grids = []
    for plane, ch, cv, qid in comps:
        grids.append((_pad_to_block(plane, 8 * cv, 8 * ch), ch, cv, qid))
    mcux = grids[0][0].shape[1] // (8 * grids[0][1])
    mcuy = grids[0][0].shape[0] // (8 * grids[0][2])

    # per-component quantized zigzag coefficients in raster block order
    # (same einsum expression as `encode` — identical rounding ties)
    Zs = []
    nbx_c = []
    for plane, ch, cv, qid in grids:
        b = _blocks(plane)
        Fc = np.einsum("ij,bjk,lk->bil", DCT_M, b - 128.0, DCT_M)
        qtab = qy if qid == 0 else qc
        Fq = np.round(Fc.reshape(-1, 64) / qtab).astype(np.int64)
        Zs.append(Fq[:, ZIGZAG])
        nbx_c.append(plane.shape[1] // 8)
    cdiv = lambda a, b: -(-a // b)  # noqa: E731
    bw_c = [cdiv(cdiv(w_img * g[1], hmax), 8) for g in grids]
    bh_c = [cdiv(cdiv(h_img * g[2], vmax), 8) for g in grids]

    if scans is None:
        scans = PROG_SCANS_GRAY if gray else PROG_SCANS_COLOR

    out = [b"\xff\xd8"]
    out.append(
        b"\xff\xe0" + struct.pack(">H", 16) + b"JFIF\x00\x01\x01\x00"
        + struct.pack(">HHBB", 1, 1, 0, 0)
    )
    ntab = 1 if gray else 2
    for tid, q in enumerate((qy, qc)[:ntab]):
        out.append(b"\xff\xdb" + struct.pack(">HB", 67, tid) + bytes(q[ZIGZAG].astype(np.uint8)))
    sof = struct.pack(">HBHHB", 8 + 3 * len(grids), 8, h_img, w_img, len(grids))
    for ci, (_, ch, cv, qid) in enumerate(grids):
        sof += struct.pack(">BBB", ci + 1, (ch << 4) | cv, qid)
    out.append(b"\xff\xc2" + sof)
    if dri:
        out.append(b"\xff\xdd" + struct.pack(">HH", 4, dri))

    for comp_idx, ss, se, ah, al in scans:
        # single walk: record the symbol stream + raw-bit groups, count
        # frequencies as we go, then REPLAY for emission (the block
        # logic runs once per scan, not twice)
        freqs: dict[tuple, np.ndarray] = {}
        stream: list[tuple] = []  # (key, sym) | (None, (v, n)) | boundary

        def sym1(key, s):
            a = freqs.get(key)
            if a is None:
                a = freqs[key] = np.zeros(256, dtype=np.int64)
            a[s] += 1
            stream.append((key, s))

        def put1(v, n):
            stream.append((None, v, n))

        def bnd1():
            stream.append(None)

        _run_prog_scan(
            Zs, grids, comp_idx, ss, se, ah, al, mcux, nbx_c, bw_c, bh_c,
            dri, sym1, put1, bnd1,
        )
        tables = {k: _gen_optimal_table(f) for k, f in freqs.items()}
        enc = {
            k: (c.tolist(), ln.tolist())
            for k, (c, ln) in (
                (k2, _enc_table(b16[1:17], v)) for k2, (b16, v) in tables.items()
            )
        }
        for (kind, tc), (b16, v) in sorted(tables.items()):
            tcbyte = (0x00 if kind == "dc" else 0x10) | tc
            out.append(
                b"\xff\xc4"
                + struct.pack(">HB", 19 + len(v), tcbyte)
                + bytes(b16[1:17])
                + bytes(v)
            )
        sos = struct.pack(">HB", 6 + 2 * len(comp_idx), len(comp_idx))
        for ci in comp_idx:
            tc = 0 if grids[ci][3] == 0 else 1
            sos += struct.pack(">BB", ci + 1, (tc << 4) | tc)
        sos += struct.pack(">BBB", ss, se, (ah << 4) | al)
        out.append(b"\xff\xda" + sos)

        # replay
        segs: list[bytes] = []
        bits_l: list[int] = []
        len_l: list[int] = []
        for ev in stream:
            if ev is None:
                segs.append(
                    _pack_bits(
                        np.asarray(bits_l, dtype=np.int64),
                        np.asarray(len_l, dtype=np.int64),
                    )
                )
                bits_l = []
                len_l = []
            elif ev[0] is None:
                bits_l.append(ev[1])
                len_l.append(ev[2])
            else:
                c, ln = enc[ev[0]]
                bits_l.append(c[ev[1]])
                len_l.append(ln[ev[1]])
        segs.append(
            _pack_bits(
                np.asarray(bits_l, dtype=np.int64),
                np.asarray(len_l, dtype=np.int64),
            )
        )
        for si, sdata in enumerate(segs):
            out.append(sdata)
            if si < len(segs) - 1:
                out.append(bytes([0xFF, 0xD0 + si % 8]))
    out.append(b"\xff\xd9")
    return b"".join(out)


# ---------------------------------------------------------------------------
# Decoder
# ---------------------------------------------------------------------------


def _extend(bits: int, sz: int) -> int:
    return bits if bits >= (1 << (sz - 1)) else bits - (1 << sz) + 1


def _entropy_segments(buf: bytes, start: int) -> tuple[list[bytearray], int]:
    """Destuffed entropy data from ``start`` to the next non-RST marker,
    split into restart segments. Returns ``(segments, end)`` where
    ``end`` indexes the 0xFF of the terminating marker (or len(buf))."""
    segs: list[bytearray] = [bytearray()]
    i = start
    n = len(buf)
    while i < n:
        nxt = buf.find(b"\xff", i)
        if nxt < 0:
            segs[-1] += buf[i:]
            i = n
            break
        segs[-1] += buf[i:nxt]
        m = buf[nxt + 1] if nxt + 1 < n else 0xD9
        if m == 0x00:
            segs[-1].append(0xFF)
            i = nxt + 2
        elif 0xD0 <= m <= 0xD7:
            segs.append(bytearray())
            i = nxt + 2
        else:
            i = nxt
            break
    return segs, i


def _bit_windows(data: bytes) -> tuple[np.ndarray, np.ndarray]:
    """32-bit MSB-first stream window at EVERY bit position.

    Returns ``(win, win16)`` where ``win[i]`` holds bits i..i+31 of the
    byte stream and ``win16 = win >> 16`` (the Huffman peek). Computed
    whole-stream so the entropy decode's per-symbol work is one table
    index instead of bit-accumulator arithmetic (VERDICT r03 item 1).
    ``data`` must carry ≥ 4 trailing pad bytes."""
    b = np.frombuffer(data, dtype=np.uint8).astype(np.int64)
    w40 = (b[:-4] << 32) | (b[1:-3] << 24) | (b[2:-2] << 16) | (b[3:-1] << 8) | b[4:]
    win = np.empty(len(w40) * 8, dtype=np.int64)
    for o in range(8):
        win[o::8] = w40 >> (8 - o)
    win &= 0xFFFFFFFF
    return win, (win >> 16).astype(np.int32)


def _dc_records(win: np.ndarray, win16: np.ndarray, lut: np.ndarray) -> array:
    """Packed per-bit-position DC decode record:
    ``(diff+2048) | (advance<<12) | (invalid<<18)``."""
    e = lut[win16].astype(np.int64)
    ln = e >> 8
    size = e & 255
    invalid = (e == 0) | (size > 11)  # 8-bit baseline: DC category ≤ 11
    size = np.where(invalid, 0, size)
    bits = (win >> (32 - ln - size)) & ((1 << size) - 1)
    half = np.left_shift(1, np.maximum(size - 1, 0))
    val = np.where(size > 0, np.where(bits >= half, bits, bits - (1 << size) + 1), 0)
    rec = ((val + 2048) | ((ln + size) << 12) | (invalid.astype(np.int64) << 18)).astype(
        np.int32
    )
    out = array("i")
    out.frombytes(rec.tobytes())
    return out


def _ac_records(win: np.ndarray, win16: np.ndarray, lut: np.ndarray) -> array:
    """Packed per-bit-position AC decode record:
    ``(val+1024) | (run<<11) | (advance<<15) | (flag<<21)`` with flag
    0=coef, 1=EOB, 2=ZRL, 3=invalid."""
    e = lut[win16].astype(np.int64)
    ln = e >> 8
    s = e & 255
    size = s & 15
    run = s >> 4
    invalid = (e == 0) | (size > 10)  # 8-bit baseline: AC size ≤ 10
    size = np.where(invalid, 0, size)
    bits = (win >> (32 - ln - size)) & ((1 << size) - 1)
    half = np.left_shift(1, np.maximum(size - 1, 0))
    val = np.where(size > 0, np.where(bits >= half, bits, bits - (1 << size) + 1), 0)
    flag = np.where(invalid, 3, np.where(s == 0, 1, np.where(s == 0xF0, 2, 0)))
    rec = ((val + 1024) | (run << 11) | ((ln + size) << 15) | (flag << 21)).astype(
        np.int32
    )
    out = array("i")
    out.frombytes(rec.tobytes())
    return out


def decode(
    buf: bytes, raw_components: bool = False, cmyk_to_rgb: bool = True
) -> np.ndarray:
    """Decode baseline JFIF bytes → uint8 (h, w) or (h, w, 3|4).

    ``raw_components=True`` skips the YCbCr→RGB inversion and returns
    the decoded component planes as-is — required for JPEG-in-TIFF
    payloads tagged PHOTOMETRIC_RGB, whose three components are
    untransformed R,G,B.

    4-component (CMYK/YCCK) files follow the reference's JPEG driver
    (frmts/jpeg/jpgdataset.cpp:3582-3615 + 1808-1840): the Adobe APP14
    transform byte picks CMYK (0) or YCCK (2, YCbCr-inverted then
    complemented, libjpeg ``ycck_cmyk_convert``); with ``cmyk_to_rgb``
    (the GDAL_JPEG_TO_RGB=YES default) the result collapses to RGB via
    ``R = C*K/255`` integer math, else the 4 CMYK bands return as-is."""
    buf = bytes(buf)
    if buf[:2] != b"\xff\xd8":
        raise ValueError("not a JPEG (no SOI)")
    qtabs: dict[int, np.ndarray] = {}
    hufs: dict[int, np.ndarray] = {}  # (class<<4)|id → 2^16 LUT (int32)
    comps = None  # list of (id, h, v, qid)
    h_img = w_img = None
    dri = 0
    scan_comps = None
    adobe_transform = None  # APP14 color-transform byte (None = no APP14)
    pos = 2
    scan_start = None
    progressive = False
    prog_scans: list[dict] = []  # one entry per SOS (progressive only)
    base_segs: list[bytearray] | None = None
    while pos < len(buf):
        if buf[pos] != 0xFF:
            pos += 1
            continue
        marker = buf[pos + 1]
        if marker in (0xD8, 0x01) or 0xD0 <= marker <= 0xD7:
            pos += 2
            continue
        if marker == 0xD9:
            break
        (seglen,) = struct.unpack_from(">H", buf, pos + 2)
        seg = buf[pos + 4 : pos + 2 + seglen]
        if marker == 0xDB:  # DQT
            o = 0
            while o < len(seg):
                pq_, tq = seg[o] >> 4, seg[o] & 15
                if pq_ != 0:
                    raise NotImplementedError("16-bit quant tables unsupported")
                t = np.frombuffer(seg, dtype=np.uint8, count=64, offset=o + 1).astype(np.int32)
                z = np.zeros(64, dtype=np.int32)
                z[ZIGZAG] = t  # stored in zigzag order → natural
                qtabs[tq] = z
                o += 65
        elif marker in (0xC0, 0xC1, 0xC2):  # SOF0/1/2 (sequential + progressive)
            prec, h_img, w_img, nc = struct.unpack_from(">BHHB", seg, 0)
            if prec != 8:
                raise NotImplementedError("only 8-bit precision")
            progressive = marker == 0xC2
            comps = []
            for i in range(nc):
                cid, hv, qid = struct.unpack_from(">BBB", seg, 6 + 3 * i)
                comps.append((cid, hv >> 4, hv & 15, qid))
        elif marker == 0xC3 or 0xC5 <= marker <= 0xCF and marker not in (0xC8, 0xCC):
            raise NotImplementedError(f"non-baseline SOF 0x{marker:02x}")
        elif marker == 0xC4:  # DHT
            o = 0
            while o < len(seg):
                tc = seg[o]
                bits = list(seg[o + 1 : o + 17])
                nv = sum(bits)
                vals = list(seg[o + 17 : o + 17 + nv])
                hufs[tc] = _dec_lut(bits, vals)
                o += 17 + nv
        elif marker == 0xDD:  # DRI
            (dri,) = struct.unpack_from(">H", seg, 0)
        elif marker == 0xEE and seg[:5] == b"Adobe" and len(seg) >= 12:
            adobe_transform = seg[11]
        elif marker == 0xDA:  # SOS
            ns = seg[0]
            scan_comps = []
            for i in range(ns):
                cs, tabs = seg[1 + 2 * i], seg[2 + 2 * i]
                scan_comps.append((cs, tabs >> 4, tabs & 15))
            scan_start = pos + 2 + seglen
            if not progressive:
                base_segs, _ = _entropy_segments(buf, scan_start)
                break
            if comps is None:
                raise ValueError("SOS before SOF")
            ss, se = seg[1 + 2 * ns], seg[2 + 2 * ns]
            ahal = seg[3 + 2 * ns]
            sc = []
            for cs, td, ta in scan_comps:
                ci = next(
                    (k for k, c in enumerate(comps) if c[0] == cs), None
                )
                if ci is None:
                    raise ValueError(f"scan component {cs} not in frame")
                dclut = hufs.get(td) if ss == 0 else None
                aclut = hufs.get(0x10 | ta) if se > 0 else None
                if ss == 0 and ahal >> 4 == 0 and dclut is None:
                    raise ValueError("missing DC huffman table")
                if ss > 0 and aclut is None:
                    raise ValueError("missing AC huffman table")
                sc.append((ci, dclut, aclut))
            segs, endpos = _entropy_segments(buf, scan_start)
            prog_scans.append(
                {
                    "comps": sc,
                    "ss": ss,
                    "se": se,
                    "ah": ahal >> 4,
                    "al": ahal & 15,
                    "dri": dri,
                    "segs": segs,
                }
            )
            pos = endpos
            continue
        pos += 2 + seglen
    if comps is None or (scan_start is None and not prog_scans):
        raise ValueError("missing SOF/SOS")
    if progressive:
        return _decode_progressive(
            comps, h_img, w_img, qtabs, prog_scans, raw_components,
            adobe_transform=adobe_transform, cmyk_to_rgb=cmyk_to_rgb,
        )
    segs = base_segs

    hmax = max(c[1] for c in comps)
    vmax = max(c[2] for c in comps)
    mcux = -(-w_img // (8 * hmax))
    mcuy = -(-h_img // (8 * vmax))
    n_mcu = mcux * mcuy

    # coefficient store per component — views into one shared buffer so
    # the native walk (when available) fills all components in place
    comp_off = []
    total = 0
    for cid, ch, cv, qid in comps:
        comp_off.append(total)
        total += mcuy * cv * mcux * ch * 64
    coefbuf = np.zeros(total, dtype=np.int32)
    coef = []
    for (cid, ch, cv, qid), off in zip(comps, comp_off):
        nb = mcuy * cv * mcux * ch
        coef.append(coefbuf[off : off + nb * 64].reshape(nb, 64))
    dc_lut = {}
    ac_lut = {}
    for cs, td, ta in scan_comps:
        ci = next(k for k, c in enumerate(comps) if c[0] == cs)
        dc_lut[ci] = hufs[td]
        ac_lut[ci] = hufs[0x10 | ta]

    # per-MCU block slots: (comp, block_index_fn)
    mcu_plan = []
    for ci, (cid, ch, cv, qid) in enumerate(comps):
        for dy in range(cv):
            for dx in range(ch):
                mcu_plan.append((ci, ch, cv, dy, dx))
    nbx_comp = [mcux * c[1] for c in comps]

    from gdal_spark.native import get_lib

    lib = get_lib()
    if lib is not None:
        # Native walk: one C call per restart segment fills coefbuf
        # directly. Bit-identical to the Python fallback below
        # (tests/test_native.py).
        uniq_off: dict[int, int] = {}
        uniq: list[np.ndarray] = []
        for lut in list(dc_lut.values()) + list(ac_lut.values()):
            if id(lut) not in uniq_off:
                uniq_off[id(lut)] = len(uniq) * 65536
                uniq.append(lut)
        lutbuf = np.ascontiguousarray(np.concatenate(uniq), dtype=np.int32)
        plan = np.empty((len(mcu_plan), 6), dtype=np.int64)
        for pi, (ci, ch, cv, dy, dx) in enumerate(mcu_plan):
            nbx = nbx_comp[ci]
            plan[pi] = (
                ci,
                uniq_off[id(dc_lut[ci])],
                uniq_off[id(ac_lut[ci])],
                (cv * nbx) << 6,
                ch << 6,
                comp_off[ci] + ((dy * nbx + dx) << 6),
            )
        preds_arr = np.zeros(len(comps), dtype=np.int64)
        mcu_idx = 0
        for seg in segs:
            if mcu_idx >= n_mcu:
                break
            data_arr = np.frombuffer(bytes(seg) + b"\xff" * 256, dtype=np.uint8)
            end_mcu = min(n_mcu, mcu_idx + dri) if dri else n_mcu
            preds_arr[:] = 0
            rc = lib.jpeg_walk(
                data_arr.ctypes.data,
                len(data_arr),
                lutbuf.ctypes.data,
                plan.ctypes.data,
                len(mcu_plan),
                mcux,
                mcu_idx,
                end_mcu,
                preds_arr.ctypes.data,
                coefbuf.ctypes.data,
            )
            if rc == -1:
                raise ValueError("invalid huffman code (DC)")
            if rc == -2:
                raise ValueError("invalid huffman code (AC)")
            if rc == -3:
                raise ValueError("AC index overflow")
            if rc < 0:
                raise ValueError("truncated JPEG scan")
            mcu_idx = end_mcu
        return _finish_decode(
            coef, comps, qtabs, mcux, mcuy, h_img, w_img, raw_components,
            adobe_transform=adobe_transform, cmyk_to_rgb=cmyk_to_rgb,
        )

    # flat coefficient accumulators (bulk numpy scatter afterwards beats
    # per-coefficient numpy scalar writes ~5×)
    out_pos: list[list[int]] = [[] for _ in comps]
    out_val: list[list[int]] = [[] for _ in comps]
    mcu_idx = 0
    for seg in segs:
        if mcu_idx >= n_mcu:
            break
        # Phase 1 (vectorized): packed (value, advance, flag) records at
        # every bit position, one array per Huffman table in the scan.
        # Phase 2 (serial, inherently so): the walk is one array index +
        # integer unpack per symbol. 64 pad bytes of 1s (T.81 F.2.2.5)
        # absorb the tail peek; a truncated stream indexes past the pad
        # and surfaces as IndexError → ValueError.
        data = bytes(seg) + b"\xff" * 64
        win, win16 = _bit_windows(data)
        built: dict[tuple[int, int], array] = {}
        dtab: dict[int, array] = {}
        atab: dict[int, array] = {}
        for ci, lut in dc_lut.items():
            key = (0, id(lut))
            if key not in built:
                built[key] = _dc_records(win, win16, lut)
            dtab[ci] = built[key]
        for ci, lut in ac_lut.items():
            key = (1, id(lut))
            if key not in built:
                built[key] = _ac_records(win, win16, lut)
            atab[ci] = built[key]
        i = 0
        preds = [0] * len(comps)
        end_mcu = min(n_mcu, mcu_idx + dri) if dri else n_mcu
        try:
            while mcu_idx < end_mcu:
                my, mx = divmod(mcu_idx, mcux)
                for ci, ch, cv, dy, dx in mcu_plan:
                    base = ((my * cv + dy) * nbx_comp[ci] + mx * ch + dx) << 6
                    A = atab[ci]
                    pos_l = out_pos[ci]
                    val_l = out_val[ci]
                    # --- DC ---
                    e = dtab[ci][i]
                    if e >> 18:
                        raise ValueError("invalid huffman code (DC)")
                    i += (e >> 12) & 63
                    pred = preds[ci] + (e & 4095) - 2048
                    preds[ci] = pred
                    pos_l.append(base)
                    val_l.append(pred)
                    # --- AC ---
                    k = 1
                    while k < 64:
                        e = A[i]
                        i += (e >> 15) & 63
                        f = e >> 21
                        if f:
                            if f == 1:
                                break  # EOB
                            if f == 2:
                                k += 16  # ZRL
                                continue
                            raise ValueError("invalid huffman code (AC)")
                        k += (e >> 11) & 15
                        if k > 63:
                            raise ValueError("AC index overflow")
                        pos_l.append(base + k)
                        val_l.append((e & 2047) - 1024)
                        k += 1
                mcu_idx += 1
        except IndexError:
            raise ValueError("truncated JPEG scan") from None
    for ci in range(len(comps)):
        flat = coef[ci].reshape(-1)
        flat[np.asarray(out_pos[ci], dtype=np.int64)] = np.asarray(
            out_val[ci], dtype=np.int32
        )
    return _finish_decode(
        coef, comps, qtabs, mcux, mcuy, h_img, w_img, raw_components,
        adobe_transform=adobe_transform, cmyk_to_rgb=cmyk_to_rgb,
    )


# ---------------------------------------------------------------------------
# Progressive decoder (SOF2, spectral selection + successive approximation)
# ---------------------------------------------------------------------------


class _BitReader:
    """MSB-first bit reader over one destuffed entropy segment, built on
    the same whole-stream ``_bit_windows`` tables as the baseline walk.
    Reads past the end index into the 1-pad and surface as IndexError
    (caller maps to 'truncated')."""

    __slots__ = ("win", "win16", "i", "end")

    def __init__(self, data: bytes):
        win, win16 = _bit_windows(data + b"\xff" * 64)
        # native-int lists: per-symbol indexing is ~5x numpy scalars
        self.win = win.tolist()
        self.win16 = win16.tolist()
        self.i = 0
        self.end = len(data) * 8

    def huff(self, lut) -> int:
        if self.i >= self.end:
            raise ValueError("truncated JPEG scan")
        e = lut[self.win16[self.i]]
        if e == 0:
            raise ValueError("invalid huffman code")
        self.i += e >> 8
        return e & 255

    def bits(self, n: int) -> int:
        if n == 0:
            return 0
        if self.i >= self.end:
            raise ValueError("truncated JPEG scan")
        v = (self.win[self.i] >> (32 - n)) & ((1 << n) - 1)
        self.i += n
        return v


def _prog_block_dc_first(br, dclut, preds, ci, blk, al):
    t = br.huff(dclut)
    if t > 11:
        raise ValueError("invalid DC category")
    diff = _extend(br.bits(t), t) if t else 0
    pred = preds[ci] + diff
    preds[ci] = pred
    blk[0] = pred << al


def _prog_block_ac_first(br, aclut, blk, ss, se, al, eobrun):
    """Returns the updated EOB run (jdphuff.c decode_mcu_AC_first)."""
    if eobrun > 0:
        return eobrun - 1
    k = ss
    while k <= se:
        sym = br.huff(aclut)
        r, s = sym >> 4, sym & 15
        if s:
            k += r
            if k > se:
                raise ValueError("AC index overflow")
            blk[k] = _extend(br.bits(s), s) << al
            k += 1
        else:
            if r != 15:
                eobrun = 1 << r
                if r:
                    eobrun += br.bits(r)
                return eobrun - 1
            k += 16  # ZRL
    return 0


def _prog_block_ac_refine(br, aclut, blk, ss, se, al, eobrun):
    """Returns the updated EOB run (jdphuff.c decode_mcu_AC_refine)."""
    p1 = 1 << al
    m1 = -1 << al
    k = ss
    if eobrun == 0:
        while k <= se:
            sym = br.huff(aclut)
            r, s = sym >> 4, sym & 15
            val = 0
            if s:
                if s != 1:
                    raise ValueError("invalid refinement size")
                val = p1 if br.bits(1) else m1
            elif r != 15:
                eobrun = 1 << r
                if r:
                    eobrun += br.bits(r)
                break
            # advance over r zero-history coefficients, emitting
            # correction bits for every nonzero-history one passed
            while k <= se:
                c = blk[k]
                if c != 0:
                    if br.bits(1) and (c & p1) == 0:
                        blk[k] = c + (p1 if c >= 0 else m1)
                else:
                    if r == 0:
                        break
                    r -= 1
                k += 1
            if val and k <= se:
                blk[k] = val
            k += 1
    if eobrun > 0:
        while k <= se:
            c = blk[k]
            if c != 0:
                if br.bits(1) and (c & p1) == 0:
                    blk[k] = c + (p1 if c >= 0 else m1)
            k += 1
        eobrun -= 1
    return eobrun


def _decode_progressive(
    comps, h_img, w_img, qtabs, scans, raw_components,
    adobe_transform=None, cmyk_to_rgb=True,
):
    """Accumulate coefficients over all scans, then share the baseline
    finish (dequant → IDCT → upsample → color).

    Semantics follow ITU-T T.81 Annex G as implemented by the
    reference's libjpeg path (``frmts/jpeg/jpgdataset.cpp`` decode of
    SOF2 streams): DC first/refine, AC first with EOB runs, AC
    refinement with correction bits; non-interleaved scans walk the
    component's own block grid (not the padded MCU grid); restart
    intervals reset predictors and the EOB run."""
    hmax = max(c[1] for c in comps)
    vmax = max(c[2] for c in comps)
    mcux = -(-w_img // (8 * hmax))
    mcuy = -(-h_img // (8 * vmax))
    nbx_comp = [mcux * c[1] for c in comps]
    # plain-int rows while scanning (native ops beat numpy scalar
    # writes ~5x); converted to the int32 arrays _finish_decode wants
    coef_l = [
        [[0] * 64 for _ in range(mcuy * cv * mcux * ch)]
        for (_, ch, cv, _) in comps
    ]
    # single-component (non-interleaved) scans cover ceil(comp_dim/8)
    # blocks of the component's own ceil(dim*sampling/max) grid
    cdiv = lambda a, b: -(-a // b)  # noqa: E731
    bw_comp = [cdiv(cdiv(w_img * ch, hmax), 8) for (_, ch, _, _) in comps]
    bh_comp = [cdiv(cdiv(h_img * cv, vmax), 8) for (_, _, cv, _) in comps]

    lut_memo: dict[int, list] = {}

    def _as_list(lut):
        if lut is None:
            return None
        hit = lut_memo.get(id(lut))
        if hit is None:
            hit = lut_memo[id(lut)] = lut.tolist()
        return hit

    for scan in scans:
        ss, se, ah, al = scan["ss"], scan["se"], scan["ah"], scan["al"]
        dri = scan["dri"]
        sc = [
            (ci, _as_list(dclut), _as_list(aclut))
            for ci, dclut, aclut in scan["comps"]
        ]
        ncomp_scan = len(sc)
        if ss > 0 and ncomp_scan != 1:
            raise ValueError("interleaved AC scan is invalid in progressive")

        if ncomp_scan == 1:
            ci, dclut, aclut = sc[0]
            bw, bh = bw_comp[ci], bh_comp[ci]
            nbx = nbx_comp[ci]
            n_units = bw * bh
        else:
            n_units = mcux * mcuy
            plan = []
            for ci, dclut, aclut in sc:
                _, ch, cv, _ = comps[ci]
                for dy in range(cv):
                    for dx in range(ch):
                        plan.append((ci, dclut, ch, cv, dy, dx))

        unit = 0
        for seg in scan["segs"]:
            if unit >= n_units:
                break
            br = _BitReader(bytes(seg))
            preds = [0] * len(comps)
            eobrun = 0
            end = min(n_units, unit + dri) if dri else n_units
            try:
                if ncomp_scan > 1:  # interleaved DC scan over MCUs
                    while unit < end:
                        my, mx = divmod(unit, mcux)
                        for ci2, dclut2, ch, cv, dy, dx in plan:
                            bidx = (my * cv + dy) * nbx_comp[ci2] + mx * ch + dx
                            blk = coef_l[ci2][bidx]
                            if ah == 0:
                                _prog_block_dc_first(
                                    br, dclut2, preds, ci2, blk, al
                                )
                            elif br.bits(1):
                                blk[0] |= 1 << al
                        unit += 1
                elif ss == 0:  # single-component DC scan
                    while unit < end:
                        row, col = divmod(unit, bw)
                        blk = coef_l[ci][row * nbx + col]
                        if ah == 0:
                            _prog_block_dc_first(br, dclut, preds, ci, blk, al)
                        elif br.bits(1):
                            blk[0] |= 1 << al
                        unit += 1
                else:  # AC scan
                    fn = (
                        _prog_block_ac_first if ah == 0 else _prog_block_ac_refine
                    )
                    while unit < end:
                        row, col = divmod(unit, bw)
                        blk = coef_l[ci][row * nbx + col]
                        eobrun = fn(br, aclut, blk, ss, se, al, eobrun)
                        unit += 1
            except IndexError:
                raise ValueError("truncated JPEG scan") from None
            unit = end
    coef = [np.asarray(c, dtype=np.int32) for c in coef_l]
    return _finish_decode(
        coef, comps, qtabs, mcux, mcuy, h_img, w_img, raw_components,
        adobe_transform=adobe_transform, cmyk_to_rgb=cmyk_to_rgb,
    )


def _mm8_seq(A: np.ndarray, B: np.ndarray) -> np.ndarray:
    """(n,8,8) @ (8,8) with a FIXED k-ascending reduction order.

    This is the bit-exactness contract with the native kernel
    (``_csrc.py`` ``jpeg_idct_plane``): both perform the identical
    IEEE-754 op sequence, so decoded pixels are equal to the last bit
    whether or not a C compiler exists on the host — unlike BLAS
    einsum/matmul, whose blocked reduction order varies by build."""
    out = A[:, :, 0, None] * B[0]
    for k in range(1, 8):
        out = out + A[:, :, k, None] * B[k]
    return out


def _finish_decode(
    coef, comps, qtabs, mcux, mcuy, h_img, w_img, raw_components,
    adobe_transform=None, cmyk_to_rgb=True,
):
    """Coefficients → pixels: dequantize, IDCT, upsample, color
    transform (shared by the native and fallback entropy walks; the
    IDCT + color stages themselves also go native when available)."""
    from gdal_spark.native import get_lib

    lib = get_lib()
    hmax = max(c[1] for c in comps)
    vmax = max(c[2] for c in comps)
    planes = []
    subs = []  # (ysub, xsub) per component, pre-crop
    for ci, (cid, ch, cv, qid) in enumerate(comps):
        nby = mcuy * cv
        nbx = mcux * ch
        if lib is not None:
            plane = np.empty((nby * 8, nbx * 8), dtype=np.float64)
            qtab = np.ascontiguousarray(qtabs[qid], dtype=np.int32)
            cf = np.ascontiguousarray(coef[ci], dtype=np.int32)
            lib.jpeg_idct_plane(
                cf.ctypes.data,
                UNZIGZAG_I32.ctypes.data,
                qtab.ctypes.data,
                DCT_M_C.ctypes.data,
                nby * nbx,
                nbx,
                plane.ctypes.data,
            )
        else:
            # dequantize → natural order → IDCT (all-blocks, fixed order)
            Z = coef[ci].astype(np.float64)
            nat = Z[:, UNZIGZAG] * qtabs[qid][None, :]
            blocks = nat.reshape(-1, 8, 8)
            t = _mm8_seq(blocks, DCT_M)  # nat @ M
            pix = _mm8_seq(t.transpose(0, 2, 1), DCT_M).transpose(0, 2, 1) + 128.0
            plane = (
                pix.reshape(nby, nbx, 8, 8)
                .transpose(0, 2, 1, 3)
                .reshape(nby * 8, nbx * 8)
            )
        subs.append((max(vmax // cv, 1), max(hmax // ch, 1)))
        planes.append(plane)

    if len(planes) == 3 and not raw_components and lib is not None:
        out = np.empty((h_img, w_img, 3), dtype=np.uint8)
        args = []
        for p, (vs, hs) in zip(planes, subs):
            args += [p.ctypes.data, p.shape[1], vs, hs]
        lib.jpeg_color(*args, h_img, w_img, out.ctypes.data)
        return out

    full = []
    for p, (vs, hs) in zip(planes, subs):
        if vs > 1:
            p = np.repeat(p, vs, axis=0)
        if hs > 1:
            p = np.repeat(p, hs, axis=1)
        full.append(p[:h_img, :w_img])
    if len(full) == 1:
        return np.clip(np.round(full[0]), 0, 255).astype(np.uint8)
    if raw_components:
        # JPEG-in-TIFF with PHOTOMETRIC_RGB stores untransformed R,G,B
        # components (frmts/gtiff JPEG path): no YCbCr inversion
        return np.stack(
            [np.clip(np.round(p), 0, 255).astype(np.uint8) for p in full], axis=-1
        )
    if len(full) == 4:
        # CMYK / YCCK per the Adobe APP14 transform byte
        # (jpgdataset.cpp:3582-3615; libjpeg jdcolor ycck_cmyk_convert)
        if adobe_transform == 2:  # YCCK: invert YCbCr, complement
            y, cb, cr = full[0], full[1], full[2]
            r = y + 1.402 * (cr - 128.0)
            g = y - 0.344136286 * (cb - 128.0) - 0.714136286 * (cr - 128.0)
            b = y + 1.772 * (cb - 128.0)
            c = 255.0 - np.clip(np.round(r), 0, 255)
            m = 255.0 - np.clip(np.round(g), 0, 255)
            ye = 255.0 - np.clip(np.round(b), 0, 255)
            k = np.clip(np.round(full[3]), 0, 255)
        else:  # transform 0 / absent: stored CMYK (Adobe-inverted ink)
            c, m, ye, k = (np.clip(np.round(p), 0, 255) for p in full)
        cmyk = np.stack([c, m, ye, k], axis=-1).astype(np.uint8)
        if not cmyk_to_rgb:  # GDAL_JPEG_TO_RGB=NO: expose the 4 bands
            return cmyk
        # GDAL's RGB collapse (jpgdataset.cpp:1808-1840): R = C*K/255
        i32 = cmyk.astype(np.int32)
        return (
            (i32[..., :3] * i32[..., 3:4]) // 255
        ).astype(np.uint8)
    return ycbcr_to_rgb(full[0], full[1], full[2])
