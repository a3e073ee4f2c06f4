"""Lossless WebP (VP8L) codec, pure NumPy + stdlib.

Replaces the round-1/2 ``FakeLossyCodec`` for ``fmt='webp'`` so the
last remaining codec row of the ``input_hint`` schema (``fmt`` ∈
png/jpeg/webp) carries a real, spec-conformant container. Reference
behavior surface: ``frmts/webp/webpdataset.cpp`` (libwebp wrapper);
this module is an original from-scratch implementation of the public
"WebP Lossless Bitstream Specification" (VP8L, Google, RFC-hosted at
developers.google.com/speed/webp/docs/webp_lossless_bitstream_specification).

VP8L is **lossless**, so the per-row invariant of BASELINE.json
(`decoded-pixel allclose, PSNR >= 40 dB for lossy`) is met exactly:
round-trip PSNR is infinite and ``lossless_exact`` holds, mirroring
GDAL's own behavior for WEBP_LOSSLESS=YES rasters.

Scope:

- ENCODE: two paths. :func:`encode` — full-spec-valid literal streams
  (no transforms, no color cache, no meta-prefix image, per-channel
  canonical prefix codes, lengths limited to 15). :func:`encode_lz77`
  — the wild-file shapes: LZ77 back-references (row/column copies via
  the 2-D distance plane codes or plain 1-D distances) plus a color
  cache, with per-stream frequency-built codes.
- DECODE: literals + LZ77 back-references (incl. all 120 distance
  plane codes) + color cache — the stream features real-world
  lossless WebP relies on (round-4 verdict item 2). Transforms
  (predictor/color/subtract-green/palette), meta prefix images and
  lossy VP8 fall back to the capability-probed libwebp binding
  (``native/webp_lib.py`` — present in this container and on any
  cluster node; the exact library ``webpdataset.cpp`` wraps), which
  also serves as an EXTERNAL ORACLE: the real decoder reproduces the
  in-repo encoder's streams byte-exactly (tests/test_webp_lib.py),
  empirically pinning the distance plane-code table and cache hash.
  Without the library those features raise the documented
  NotImplementedError.

Design for Spark: the encoder is vectorized whole-image — channel
histograms, canonical code construction, per-pixel symbol→(bits,len)
table lookup, and a 15-pass LSB-first bit packer are all NumPy array
programs; only the prefix-code headers (≤ a few hundred bits) go
through a scalar token list. The decoder's prefix-code scan is
bit-serial by nature (each code length gates the next read), so it
runs as a table-driven (2^15 LUT) Python loop over symbols, exactly
like the JPEG decoder's Huffman scan; both run inside Arrow-batched
pandas UDFs (one call per image, many images per batch).

Bit conventions (spec §"RIFF header" / §"Prefix coding"):
- bytes little-endian; within a byte, bits are consumed LSB first;
- multi-bit ``ReadBits(n)`` fields arrive LSB-first;
- canonical prefix-code bits are read MSB-of-code first (DEFLATE
  convention), i.e. the writer emits ``bit_reverse(code, len)``
  through the LSB-first packer.
"""

from __future__ import annotations

import struct

import numpy as np

# Order in which code-length-code lengths are transmitted (spec §"Code
# lengths" — same role as DEFLATE's order but VP8L-specific).
K_CL_ORDER = [17, 18, 0, 1, 2, 3, 4, 5, 16, 6, 7, 8, 9, 10, 11, 12, 13, 14, 15]

MAX_CODE_LEN = 15  # spec limit for symbol codes
MAX_CL_LEN = 7  # code-length-code lengths are stored in 3 bits

GREEN_ALPHABET = 256 + 24  # literals + length codes (no color cache)
DIST_ALPHABET = 40

# Distance plane codes 1..120 → (dx, dy) close-neighborhood offsets,
# decoded as dist = dy*width + dx (clamped to >= 1), per the WebP
# Lossless Bitstream Specification §"Decoding the distance" (RFC 9649
# §5.2.2). The spec's 120-entry table is exactly the 16×8 pixel window
# libwebp's plane_to_code_lut addresses (y 0..7, x -7..8, causal cells
# only) ordered by squared Euclidean distance, ties broken by larger y
# then positive x — verified entry-for-entry against the spec's
# published list for the first 92 codes AND empirically against the
# real libwebp decoder, which reproduces our plane-code streams
# byte-exactly (tests/test_webp_lib.py).
DIST_MAP = tuple(
    sorted(
        (
            (dx, dy)
            for dy in range(8)
            for dx in range(-7, 9)
            if dy > 0 or dx > 0
        ),
        key=lambda t: (t[0] * t[0] + t[1] * t[1], -t[1], -t[0]),
    )
)

CACHE_MUL = 0x1E35A7BD  # color-cache hash multiplier (spec constant)


def _prefix_value(code: int, extra: int) -> int:
    """LZ77 prefix code + extra-bits value → length/distance (spec
    §"Decoding of meta prefix codes": codes 0-3 literal, then
    (2 + code%2) << ((code-2)>>1) ranges)."""
    if code < 4:
        return code + 1
    nbits = (code - 2) >> 1
    offset = (2 + (code & 1)) << nbits
    return offset + extra + 1


def _prefix_nbits(code: int) -> int:
    return 0 if code < 4 else (code - 2) >> 1


def _prefix_split(v: int) -> tuple[int, int, int]:
    """length/distance value → (prefix_code, extra_value, extra_bits);
    exact inverse of :func:`_prefix_value`."""
    x = v - 1
    if x < 4:
        return x, 0, 0
    hb = x.bit_length() - 1
    nbits = hb - 1
    if x - (1 << hb) < (1 << nbits):
        return 2 * hb, x - (1 << hb), nbits
    return 2 * hb + 1, x - (1 << hb) - (1 << nbits), nbits


# ---------------------------------------------------------------------------
# Canonical prefix codes
# ---------------------------------------------------------------------------


def _huffman_lengths(counts: np.ndarray, limit: int) -> np.ndarray:
    """Code length per symbol from frequency counts, max depth ``limit``.

    Standard heap Huffman; if the tree exceeds ``limit``, counts are
    repeatedly halved (ceil, floor 1) and rebuilt — each rebuild is a
    true Huffman tree, so the resulting code is always complete
    (Kraft sum == 1), which conformant decoders verify.
    """
    import heapq

    counts = counts.astype(np.int64)
    nz = np.flatnonzero(counts)
    lengths = np.zeros(len(counts), dtype=np.int32)
    if len(nz) == 0:
        return lengths
    if len(nz) == 1:
        lengths[nz[0]] = 1
        return lengths
    work = counts.copy()
    m = len(nz)
    while True:
        # heap of (count, tiebreak, node); parent pointers instead of
        # per-merge symbol-list concatenation (that was O(n²))
        heap = [(int(work[s]), int(i), int(i)) for i, s in enumerate(nz)]
        heapq.heapify(heap)
        parent = [0] * (2 * m - 1)
        nxt = m
        while len(heap) > 1:
            c1, _, n1 = heapq.heappop(heap)
            c2, _, n2 = heapq.heappop(heap)
            parent[n1] = nxt
            parent[n2] = nxt
            heapq.heappush(heap, (c1 + c2, nxt, nxt))
            nxt += 1
        root = nxt - 1
        depth_nodes = [0] * nxt
        for node in range(nxt - 2, -1, -1):
            depth_nodes[node] = depth_nodes[parent[node]] + 1
        lengths[:] = 0
        lengths[nz] = depth_nodes[:m]
        if root == 0:  # single node (can't happen: m >= 2 here)
            lengths[nz] = 1
        if lengths.max() <= limit:
            return lengths
        work = np.maximum((work + 1) // 2, np.where(work > 0, 1, 0))


def _canonical_codes(lengths: np.ndarray) -> np.ndarray:
    """Canonical code value per symbol (DEFLATE ordering: increasing
    length, ties by symbol index). Zero-length symbols get code 0."""
    codes = np.zeros(len(lengths), dtype=np.int64)
    max_len = int(lengths.max()) if len(lengths) else 0
    code = 0
    bl_count = np.bincount(lengths, minlength=max_len + 1)
    next_code = np.zeros(max_len + 2, dtype=np.int64)
    for ln in range(1, max_len + 1):
        code = (code + int(bl_count[ln - 1])) << 1
        next_code[ln] = code
    for sym in range(len(lengths)):
        ln = int(lengths[sym])
        if ln:
            codes[sym] = next_code[ln]
            next_code[ln] += 1
    return codes


def _bit_reverse(vals: np.ndarray, lens: np.ndarray) -> np.ndarray:
    """Reverse the low ``lens`` bits of each value (vectorized)."""
    out = np.zeros_like(vals)
    v = vals.copy()
    maxlen = int(lens.max()) if len(lens) else 0
    for _ in range(maxlen):
        out = (out << 1) | (v & 1)
        v >>= 1
    # symbols with shorter lengths were reversed over maxlen bits;
    # shift the surplus back out
    return out >> (maxlen - lens)


# ---------------------------------------------------------------------------
# Bit I/O
# ---------------------------------------------------------------------------


class _TokenWriter:
    """Collects (value, nbits) tokens; packs LSB-first in one pass.

    Tokens are kept as NumPy chunks (scalar ``put`` runs are batched)
    so the pixel stream never round-trips through a Python list; the
    final pack runs in the native kernel when available, else the
    vectorized per-bit-plane NumPy path (identical bytes either way —
    the packer is pure integer work)."""

    def __init__(self):
        self._chunks: list[tuple[np.ndarray, np.ndarray]] = []
        self._svals: list[int] = []
        self._slens: list[int] = []

    def put(self, value: int, nbits: int) -> None:
        if nbits:
            self._svals.append(int(value))
            self._slens.append(int(nbits))

    def _flush_scalars(self) -> None:
        if self._svals:
            self._chunks.append(
                (
                    np.asarray(self._svals, dtype=np.int64),
                    np.asarray(self._slens, dtype=np.int64),
                )
            )
            self._svals = []
            self._slens = []

    def extend_arrays(self, vals: np.ndarray, lens: np.ndarray) -> None:
        self._flush_scalars()
        keep = lens > 0
        self._chunks.append(
            (
                np.ascontiguousarray(vals[keep], dtype=np.int64),
                np.ascontiguousarray(lens[keep], dtype=np.int64),
            )
        )

    def pack(self) -> bytes:
        self._flush_scalars()
        if not self._chunks:
            return b""
        vals = np.concatenate([c[0] for c in self._chunks])
        lens = np.concatenate([c[1] for c in self._chunks])
        total = int(lens.sum())
        nbytes = (total + 7) // 8

        from gdal_spark.native import get_lib

        lib = get_lib()
        if lib is not None and len(vals):
            out = np.zeros(nbytes + 8, dtype=np.uint8)
            lib.lsb_pack(
                vals.ctypes.data, lens.ctypes.data, len(vals), out.ctypes.data
            )
            return out[:nbytes].tobytes()

        offs = np.concatenate(([0], np.cumsum(lens)))
        bits = np.zeros(total, dtype=np.uint8)
        if len(lens):
            maxlen = int(lens.max())
            starts = offs[:-1]
            for b in range(maxlen):
                m = lens > b
                bits[starts[m] + b] = (vals[m] >> b) & 1
        return np.packbits(bits, bitorder="little").tobytes()


class _BitReader:
    """LSB-first bit reader over bytes, O(1) peeks via 32-bit words.

    ``warr`` (uint32 NumPy view, ≥2 trailing zero pad words) feeds the
    native literal-scan kernel; the Python-list ``words`` tuple the
    fallback hot loop wants is built lazily only when needed."""

    def __init__(self, data: bytes):
        pad = data + b"\x00" * 8
        n = (len(pad) + 3) // 4
        self.warr = np.frombuffer(pad.ljust(n * 4, b"\x00"), dtype="<u4")
        self._words: tuple | None = None
        self.pos = 0
        self.nbits = len(data) * 8

    @property
    def words(self) -> tuple:
        if self._words is None:
            self._words = tuple(int(w) for w in self.warr)
        return self._words

    def peek(self, n: int) -> int:
        i, s = divmod(self.pos, 32)
        w = self.warr
        v = int(w[i]) >> s
        if s:
            v |= int(w[i + 1]) << (32 - s)
        return v & ((1 << n) - 1)

    def read(self, n: int) -> int:
        v = self.peek(n)
        self.pos += n
        return v


class _PrefixCode:
    """Decoder-side prefix code: 2^15 LUT of (symbol, length)."""

    __slots__ = ("lut_sym", "lut_len", "single")

    def __init__(self, lengths: np.ndarray, symbols: np.ndarray | None = None):
        """``lengths[i]`` is the code length of symbol ``symbols[i]``
        (or of symbol ``i`` when ``symbols`` is None)."""
        if symbols is None:
            symbols = np.arange(len(lengths))
        nz = lengths > 0
        if nz.sum() == 1:
            self.single = int(symbols[np.flatnonzero(nz)[0]])
            self.lut_sym = None
            self.lut_len = None
            return
        self.single = -1
        codes = _canonical_codes(lengths)
        lut_sym = np.zeros(1 << MAX_CODE_LEN, dtype=np.int32)
        lut_len = np.zeros(1 << MAX_CODE_LEN, dtype=np.int32)
        # vectorized fill, grouped by code length: every symbol of
        # length ln owns the 2^(15-ln) LUT slots rc + (m << ln)
        nzi = np.flatnonzero(nz)
        lens_nz = np.asarray(lengths, dtype=np.int64)[nzi]
        rcs = _bit_reverse(np.asarray(codes, dtype=np.int64)[nzi], lens_nz)
        syms_nz = np.asarray(symbols, dtype=np.int64)[nzi]
        for ln in np.unique(lens_nz):
            m = lens_nz == ln
            width = 1 << (MAX_CODE_LEN - int(ln))
            stride_idx = np.arange(width, dtype=np.int64) << int(ln)
            idx = (rcs[m][:, None] + stride_idx[None, :]).ravel()
            lut_sym[idx] = np.repeat(syms_nz[m], width)
            lut_len[idx] = int(ln)
        if (lut_len == 0).any():
            raise ValueError("incomplete prefix code")
        self.lut_sym = lut_sym
        self.lut_len = lut_len

    def read(self, br: _BitReader) -> int:
        if self.single >= 0:
            return self.single
        idx = br.peek(MAX_CODE_LEN)
        br.pos += int(self.lut_len[idx])
        return int(self.lut_sym[idx])


# ---------------------------------------------------------------------------
# Encoder
# ---------------------------------------------------------------------------


def _rle_code_lengths(lengths: np.ndarray) -> list[tuple[int, int, int]]:
    """RLE a code-length sequence into (cl_symbol, extra_value,
    extra_bits) triples using spec symbols 16 (repeat previous
    non-zero 3-6×), 17 (zeros 3-10×), 18 (zeros 11-138×)."""
    out: list[tuple[int, int, int]] = []
    n = len(lengths)
    i = 0
    while i < n:
        v = int(lengths[i])
        j = i
        while j < n and int(lengths[j]) == v:
            j += 1
        run = j - i
        if v == 0:
            while run >= 11:
                take = min(run, 138)
                out.append((18, take - 11, 7))
                run -= take
            while run >= 3:
                take = min(run, 10)
                out.append((17, take - 3, 3))
                run -= take
            out.extend([(0, 0, 0)] * run)
        else:
            out.append((v, 0, 0))
            run -= 1
            while run >= 3:
                take = min(run, 6)
                out.append((16, take - 3, 2))
                run -= take
            out.extend([(v, 0, 0)] * run)
        i = j
    return out


def _write_full_code(tw: _TokenWriter, lengths: np.ndarray) -> None:
    """Emit a full (non-simple) prefix code header for ``lengths``."""
    tw.put(0, 1)  # is_simple = 0
    triples = _rle_code_lengths(lengths)
    cl_counts = np.zeros(19, dtype=np.int64)
    for sym, _, _ in triples:
        cl_counts[sym] += 1
    cl_lengths = _huffman_lengths(cl_counts, MAX_CL_LEN)
    if (cl_lengths > 0).sum() == 1:
        # single-symbol CL code would be incomplete; add a 1-bit pair
        # with a dummy second symbol (cheapest unused one)
        used = int(np.flatnonzero(cl_lengths)[0])
        dummy = 0 if used != 0 else 1
        cl_lengths[:] = 0
        cl_lengths[used] = 1
        cl_lengths[dummy] = 1
    cl_codes = _canonical_codes(cl_lengths)
    # transmit CL lengths in kOrder, trimmed to the last non-zero
    order_lens = [int(cl_lengths[s]) for s in K_CL_ORDER]
    num = 19
    while num > 4 and order_lens[num - 1] == 0:
        num -= 1
    tw.put(num - 4, 4)
    for k in range(num):
        tw.put(order_lens[k], 3)
    tw.put(0, 1)  # use_max_symbol = 0 (full alphabet, 17/18 cover zeros)
    for sym, extra, ebits in triples:
        ln = int(cl_lengths[sym])
        code = int(cl_codes[sym])
        rc = 0
        for _ in range(ln):
            rc = (rc << 1) | (code & 1)
            code >>= 1
        tw.put(rc, ln)
        if ebits:
            tw.put(extra, ebits)


def _build_channel_code(
    tw: _TokenWriter, values: np.ndarray, alphabet: int
) -> tuple[np.ndarray, np.ndarray]:
    """Write the prefix-code header for one channel and return the
    encode tables (reversed_code[sym], len[sym]) over ``alphabet``."""
    counts = np.bincount(values, minlength=alphabet).astype(np.int64)
    return _build_code_from_counts(tw, counts)


def _build_code_from_counts(
    tw: _TokenWriter, counts: np.ndarray
) -> tuple[np.ndarray, np.ndarray]:
    counts = np.asarray(counts, dtype=np.int64)
    alphabet = len(counts)
    distinct = np.flatnonzero(counts)
    rev = np.zeros(alphabet, dtype=np.int64)
    lens = np.zeros(alphabet, dtype=np.int64)
    if len(distinct) <= 2 and (len(distinct) == 0 or distinct.max() < 256):
        # simple code (1 or 2 symbols, each ≤ 8 bits)
        syms = sorted(int(s) for s in distinct) or [0]
        tw.put(1, 1)  # is_simple
        tw.put(len(syms) - 1, 1)  # num_symbols - 1
        tw.put(1, 1)  # first symbol in 8 bits
        tw.put(syms[0], 8)
        if len(syms) == 2:
            tw.put(syms[1], 8)
            lens[syms[0]] = 1
            lens[syms[1]] = 1
            rev[syms[0]] = 0
            rev[syms[1]] = 1
        # 1 symbol: zero-length code, nothing to emit per token
        return rev, lens
    lengths = _huffman_lengths(counts, MAX_CODE_LEN)
    _write_full_code(tw, lengths)
    codes = _canonical_codes(lengths)
    nz = lengths > 0
    rev[nz] = _bit_reverse(codes[nz], lengths[nz])
    lens[nz] = lengths[nz]
    return rev, lens


def encode(arr: np.ndarray) -> bytes:
    """Encode HxW (gray), HxWx3 (RGB) or HxWx4 (RGBA) uint8 as a
    lossless WebP (VP8L) file. Gray is stored as R=G=B."""
    arr = np.ascontiguousarray(arr, dtype=np.uint8)
    if arr.ndim == 2:
        r = g = b = arr
        a = None
    elif arr.ndim == 3 and arr.shape[2] == 3:
        r, g, b = arr[:, :, 0], arr[:, :, 1], arr[:, :, 2]
        a = None
    elif arr.ndim == 3 and arr.shape[2] == 4:
        r, g, b, a = (arr[:, :, i] for i in range(4))
    else:
        raise ValueError(f"unsupported array shape {arr.shape}")
    h, w = arr.shape[:2]
    if not (0 < w <= 1 << 14 and 0 < h <= 1 << 14):
        raise ValueError(f"VP8L dimensions out of range: {w}x{h}")
    alpha_used = a is not None and bool((a != 255).any())
    av = (a if a is not None else np.full((h, w), 255, dtype=np.uint8)).ravel()
    gv, rv, bv = g.ravel(), r.ravel(), b.ravel()

    tw = _TokenWriter()
    tw.put(w - 1, 14)
    tw.put(h - 1, 14)
    tw.put(1 if alpha_used else 0, 1)
    tw.put(0, 3)  # version
    tw.put(0, 1)  # no transforms
    tw.put(0, 1)  # no color cache
    tw.put(0, 1)  # no meta prefix image
    # five prefix codes: green(+len), red, blue, alpha, distance
    g_rev, g_len = _build_channel_code(tw, gv, GREEN_ALPHABET)
    r_rev, r_len = _build_channel_code(tw, rv, 256)
    b_rev, b_len = _build_channel_code(tw, bv, 256)
    a_rev, a_len = _build_channel_code(tw, av, 256)
    _build_channel_code(tw, np.zeros(1, dtype=np.int64), DIST_ALPHABET)

    # pixel stream: per pixel G,R,B,A codes — vectorized table lookup,
    # interleaved via C-order ravel of an (N,4) matrix (column writes
    # into one preallocated block; np.stack's dispatch cost ~30 ms/img)
    vals = np.empty((gv.size, 4), dtype=np.int64)
    lens = np.empty((gv.size, 4), dtype=np.int64)
    vals[:, 0] = g_rev[gv]
    vals[:, 1] = r_rev[rv]
    vals[:, 2] = b_rev[bv]
    vals[:, 3] = a_rev[av]
    lens[:, 0] = g_len[gv]
    lens[:, 1] = r_len[rv]
    lens[:, 2] = b_len[bv]
    lens[:, 3] = a_len[av]
    tw.extend_arrays(vals.ravel(), lens.ravel())

    payload = b"\x2f" + tw.pack()
    chunk = b"VP8L" + struct.pack("<I", len(payload)) + payload
    if len(payload) & 1:
        chunk += b"\x00"
    riff = b"WEBP" + chunk
    return b"RIFF" + struct.pack("<I", len(riff)) + riff


# ---------------------------------------------------------------------------
# LZ77 + color-cache encoder (wild-file-shaped fixture path)
# ---------------------------------------------------------------------------


def _next_false_runs(eq: np.ndarray) -> np.ndarray:
    """run[i] = number of consecutive True values starting at i."""
    n = len(eq)
    pos = np.where(~eq, np.arange(n), 2 * n)
    nf = np.minimum.accumulate(pos[::-1])[::-1]
    return np.minimum(nf, n) - np.arange(n)


def _tokenize_lz77(
    pix: np.ndarray, w: int, cache_bits: int, min_run: int
) -> list[tuple]:
    """Greedy tokens over the ARGB pixel sequence: ('lit', argb),
    ('copy', length, dist) for dist ∈ {1, w} runs (the row/column
    copies real encoders emit most), ('cache', idx) for color-cache
    hits. Mirrors the decoder's cache-state evolution exactly."""
    n = len(pix)
    eq1 = np.zeros(n, dtype=bool)
    eq1[1:] = pix[1:] == pix[:-1]
    eqw = np.zeros(n, dtype=bool)
    if n > w:
        eqw[w:] = pix[w:] == pix[:-w]
    run1 = _next_false_runs(eq1).tolist()
    runw = _next_false_runs(eqw).tolist()
    pl = pix.tolist()
    size = 1 << cache_bits if cache_bits else 0
    cache = [0] * size
    seen = bytearray(size)
    shift = 32 - cache_bits if cache_bits else 0
    tokens: list[tuple] = []
    i = 0
    while i < n:
        lw = runw[i]
        l1 = run1[i]
        ln = lw if lw >= l1 else l1
        if ln >= min_run:
            ln = min(ln, 4096)
            dist = w if lw >= l1 else 1
            tokens.append(("copy", ln, dist))
            if cache_bits:
                for j in range(i, i + ln):
                    p = pl[j]
                    idx = ((CACHE_MUL * p) & 0xFFFFFFFF) >> shift
                    cache[idx] = p
                    seen[idx] = 1
            i += ln
            continue
        p = pl[i]
        if cache_bits:
            idx = ((CACHE_MUL * p) & 0xFFFFFFFF) >> shift
            if seen[idx] and cache[idx] == p:
                tokens.append(("cache", idx))
            else:
                cache[idx] = p
                seen[idx] = 1
                tokens.append(("lit", p))
        else:
            tokens.append(("lit", p))
        i += 1
    return tokens


def encode_lz77(
    arr: np.ndarray,
    cache_bits: int = 8,
    min_run: int = 4,
    use_plane_codes: bool = True,
) -> bytes:
    """Encode like :func:`encode` but with LZ77 back-references and a
    color cache — the stream shapes real-world lossless WebP uses
    (``frmts/webp/webpdataset.cpp:1210`` decodes these via libwebp).
    Lossless: decode(encode_lz77(a)) == a exactly. Distances 1 and
    ``width`` exercise the 2-D distance plane-code table both ways."""
    arr = np.ascontiguousarray(arr, dtype=np.uint8)
    if arr.ndim == 2:
        r = g = b = arr
        a = None
    elif arr.ndim == 3 and arr.shape[2] == 3:
        r, g, b = arr[:, :, 0], arr[:, :, 1], arr[:, :, 2]
        a = None
    elif arr.ndim == 3 and arr.shape[2] == 4:
        r, g, b, a = (arr[:, :, i] for i in range(4))
    else:
        raise ValueError(f"unsupported array shape {arr.shape}")
    h, w = arr.shape[:2]
    if not (0 < w <= 1 << 14 and 0 < h <= 1 << 14):
        raise ValueError(f"VP8L dimensions out of range: {w}x{h}")
    if not 0 <= cache_bits <= 11:
        raise ValueError("cache_bits must be 0..11")
    alpha_used = a is not None and bool((a != 255).any())
    av = (a if a is not None else np.full((h, w), 255, dtype=np.uint8)).ravel()
    pixv = (
        (av.astype(np.uint32) << 24)
        | (r.ravel().astype(np.uint32) << 16)
        | (g.ravel().astype(np.uint32) << 8)
        | b.ravel().astype(np.uint32)
    )
    tokens = _tokenize_lz77(pixv, w, cache_bits, min_run)

    # distance value → smallest plane code that decodes back to it
    plane: dict[int, int] = {}
    for idx, (dx, dy) in enumerate(DIST_MAP):
        d = dy * w + dx
        if d >= 1 and d not in plane:
            plane[d] = idx + 1

    cache_size = (1 << cache_bits) if cache_bits else 0
    gcounts = np.zeros(GREEN_ALPHABET + cache_size, dtype=np.int64)
    rcounts = np.zeros(256, dtype=np.int64)
    bcounts = np.zeros(256, dtype=np.int64)
    acounts = np.zeros(256, dtype=np.int64)
    dcounts = np.zeros(DIST_ALPHABET, dtype=np.int64)
    emit_plan: list[tuple] = []  # resolved symbols + extra-bit groups
    for t in tokens:
        if t[0] == "lit":
            p = t[1]
            gcounts[(p >> 8) & 255] += 1
            rcounts[(p >> 16) & 255] += 1
            bcounts[p & 255] += 1
            acounts[p >> 24] += 1
            emit_plan.append(t)
        elif t[0] == "copy":
            ln, dist = t[1], t[2]
            lc, lex, lnb = _prefix_split(ln)
            dval = plane.get(dist, dist + 120) if use_plane_codes else dist + 120
            dc, dex, dnb = _prefix_split(dval)
            gcounts[256 + lc] += 1
            dcounts[dc] += 1
            emit_plan.append(("copy", lc, lex, lnb, dc, dex, dnb))
        else:  # cache
            gcounts[280 + t[1]] += 1
            emit_plan.append(t)

    tw = _TokenWriter()
    tw.put(w - 1, 14)
    tw.put(h - 1, 14)
    tw.put(1 if alpha_used else 0, 1)
    tw.put(0, 3)  # version
    tw.put(0, 1)  # no transforms
    if cache_bits:
        tw.put(1, 1)
        tw.put(cache_bits, 4)
    else:
        tw.put(0, 1)
    tw.put(0, 1)  # no meta prefix image
    g_rev, g_len = _build_code_from_counts(tw, gcounts)
    r_rev, r_len = _build_code_from_counts(tw, rcounts)
    b_rev, b_len = _build_code_from_counts(tw, bcounts)
    a_rev, a_len = _build_code_from_counts(tw, acounts)
    d_rev, d_len = _build_code_from_counts(tw, dcounts)

    for t in emit_plan:
        if t[0] == "lit":
            p = t[1]
            gi = (p >> 8) & 255
            tw.put(int(g_rev[gi]), int(g_len[gi]))
            ri = (p >> 16) & 255
            tw.put(int(r_rev[ri]), int(r_len[ri]))
            bi = p & 255
            tw.put(int(b_rev[bi]), int(b_len[bi]))
            ai = p >> 24
            tw.put(int(a_rev[ai]), int(a_len[ai]))
        elif t[0] == "copy":
            _, lc, lex, lnb, dc, dex, dnb = t
            tw.put(int(g_rev[256 + lc]), int(g_len[256 + lc]))
            if lnb:
                tw.put(lex, lnb)
            tw.put(int(d_rev[dc]), int(d_len[dc]))
            if dnb:
                tw.put(dex, dnb)
        else:
            gi = 280 + t[1]
            tw.put(int(g_rev[gi]), int(g_len[gi]))

    payload = b"\x2f" + tw.pack()
    chunk = b"VP8L" + struct.pack("<I", len(payload)) + payload
    if len(payload) & 1:
        chunk += b"\x00"
    riff = b"WEBP" + chunk
    return b"RIFF" + struct.pack("<I", len(riff)) + riff


# ---------------------------------------------------------------------------
# Decoder
# ---------------------------------------------------------------------------


def _decode_via_libwebp(buf: bytes, reason: str | None = None):
    """Wild-file fallback through the capability-probed libwebp
    binding (``native/webp_lib.py``); raises the documented
    NotImplementedError when the library is absent."""
    from gdal_spark.native.webp_lib import decode_rgba, get_libwebp

    if get_libwebp() is None:
        raise NotImplementedError(
            (reason or "lossy VP8 / extended WebP decoding")
            + " — and libwebp is not available on this host"
        )
    img = decode_rgba(bytes(buf))
    if (img[:, :, 3] != 255).any():
        return img
    return np.ascontiguousarray(img[:, :, :3])


def _read_code(br: _BitReader, alphabet: int) -> _PrefixCode:
    if br.read(1):  # simple
        num_symbols = br.read(1) + 1
        first_8 = br.read(1)
        s0 = br.read(8 if first_8 else 1)
        if num_symbols == 2:
            s1 = br.read(8)
            return _PrefixCode(
                np.array([1, 1]), symbols=np.array([s0, s1])
            )
        return _PrefixCode(np.array([1]), symbols=np.array([s0]))
    # full code: code-length code first
    num = br.read(4) + 4
    cl_lengths = np.zeros(19, dtype=np.int64)
    for k in range(num):
        cl_lengths[K_CL_ORDER[k]] = br.read(3)
    cl_code = _PrefixCode(cl_lengths)
    if br.read(1):
        length_nbits = 2 + 2 * br.read(3)
        max_symbol = 2 + br.read(length_nbits)
    else:
        max_symbol = alphabet
    lengths = np.zeros(alphabet, dtype=np.int64)
    sym = 0
    prev = 8
    while sym < alphabet:
        if max_symbol <= 0:
            break
        max_symbol -= 1
        cl = cl_code.read(br)
        if cl < 16:
            lengths[sym] = cl
            sym += 1
            if cl:
                prev = cl
        elif cl == 16:
            rep = 3 + br.read(2)
            lengths[sym : sym + rep] = prev
            sym += rep
        elif cl == 17:
            sym += 3 + br.read(3)
        else:
            sym += 11 + br.read(7)
    return _PrefixCode(lengths)


def decode(buf: bytes) -> np.ndarray:
    """Decode a lossless WebP (VP8L) file — the no-transform /
    no-cache / no-meta literal subset (everything :func:`encode`
    emits). Returns HxWx4 if alpha is used, else HxWx3."""
    b = bytes(buf)
    if b[:4] != b"RIFF" or b[8:12] != b"WEBP":
        raise ValueError("not a WebP (RIFF/WEBP) container")
    off = 12
    payload = None
    while off + 8 <= len(b):
        tag = b[off : off + 4]
        (ln,) = struct.unpack_from("<I", b, off + 4)
        if tag == b"VP8L":
            payload = b[off + 8 : off + 8 + ln]
            break
        if tag in (b"VP8 ", b"VP8X"):
            # lossy VP8 / extended container: the cluster codec library
            # (capability-probed; frmts/webp/webpdataset.cpp:1210 path)
            return _decode_via_libwebp(b)
        off += 8 + ln + (ln & 1)
    if payload is None:
        raise ValueError("no VP8L chunk found")
    if payload[0] != 0x2F:
        raise ValueError("bad VP8L signature")
    br = _BitReader(payload[1:])
    w = br.read(14) + 1
    h = br.read(14) + 1
    alpha_hint = br.read(1)
    version = br.read(3)
    if version != 0:
        raise ValueError(f"unsupported VP8L version {version}")
    if br.read(1):
        # VP8L transforms (predictor/color/subtract-green/palette):
        # outside the pure-NumPy subset — fall back to the library
        return _decode_via_libwebp(
            b,
            "VP8L transforms (predictor/color/subtract-green/palette) "
            "not implemented in the pure-NumPy subset",
        )
    cache_bits = 0
    if br.read(1):
        cache_bits = br.read(4)
        if not 1 <= cache_bits <= 11:
            raise ValueError(f"invalid color-cache bits {cache_bits}")
    if br.read(1):
        return _decode_via_libwebp(
            b, "VP8L meta prefix image not implemented in the pure-NumPy subset"
        )
    cache_size = (1 << cache_bits) if cache_bits else 0
    g_code = _read_code(br, GREEN_ALPHABET + cache_size)
    r_code = _read_code(br, 256)
    b_code = _read_code(br, 256)
    a_code = _read_code(br, 256)
    d_code = _read_code(br, DIST_ALPHABET)

    n = w * h

    from gdal_spark.native import get_lib

    lib = get_lib()
    if lib is not None and cache_bits == 0:
        # native literal scan (capability-probed; bit-identical to the
        # Python loop below — tests/test_native.py). Falls back to the
        # general Python walk when the stream holds back-references.
        out = np.empty((n, 4), dtype=np.uint8)
        warr = br.warr
        zero = np.zeros(1, dtype=np.int32)

        def _ptrs(code: _PrefixCode):
            if code.single >= 0:
                return zero.ctypes.data, zero.ctypes.data, code.single
            return code.lut_sym.ctypes.data, code.lut_len.ctypes.data, -1

        args: list[int] = [warr.ctypes.data, len(warr), br.pos]
        for code in (g_code, r_code, b_code, a_code):
            args.extend(_ptrs(code))
        rc = lib.vp8l_literals(*args, n, out.ctypes.data)
        if rc == -2000000000:
            raise ValueError("truncated VP8L stream")
        if rc >= 0:
            br.pos = rc
            img = out.reshape(h, w, 4)
            if alpha_hint and (img[:, :, 3] != 255).any():
                return img
            return img[:, :, :3]
        # rc < 0: back-reference encountered — br.pos untouched, redo
        # the pixel walk generally (out is rewritten from scratch)

    return _decode_pixels(
        br, g_code, r_code, b_code, a_code, d_code, w, h, cache_bits, alpha_hint
    )


def _decode_pixels(
    br: _BitReader,
    g_code: _PrefixCode,
    r_code: _PrefixCode,
    b_code: _PrefixCode,
    a_code: _PrefixCode,
    d_code: _PrefixCode,
    w: int,
    h: int,
    cache_bits: int,
    alpha_hint: int,
) -> np.ndarray:
    """General VP8L pixel walk: literals, LZ77 back-references (incl.
    the 120 close-neighborhood distance plane codes) and color-cache
    hits (spec §"Decoding image data"; reference decode surface
    ``frmts/webp/webpdataset.cpp:1210`` via libwebp). The prefix scan
    is inherently bit-serial, so it runs as a table-driven Python loop
    over symbols with the bit reader inlined (32-bit word peeks)."""
    n = w * h
    words = br.words
    pos = br.pos
    mask15 = (1 << MAX_CODE_LEN) - 1

    def _tab(code: _PrefixCode):
        if code.single >= 0:
            return None, None, code.single
        return code.lut_sym.tolist(), code.lut_len.tolist(), -1

    gs, gl, g1 = _tab(g_code)
    rs, rl, r1 = _tab(r_code)
    bs, bl, b1 = _tab(b_code)
    as_, al, a1 = _tab(a_code)
    ds, dl, d1 = _tab(d_code)
    cache = [0] * (1 << cache_bits) if cache_bits else None
    shift = 32 - cache_bits if cache_bits else 0
    pix = [0] * n  # 0xAARRGGBB
    i = 0
    try:
        while i < n:
            if g1 >= 0:
                s = g1
            else:
                wi = pos >> 5
                sh = pos & 31
                v = words[wi] >> sh
                if sh:
                    v |= words[wi + 1] << (32 - sh)
                idx = v & mask15
                s = gs[idx]
                pos += gl[idx]
            if s < 256:  # literal: G then R, B, A
                if r1 >= 0:
                    rr = r1
                else:
                    wi = pos >> 5
                    sh = pos & 31
                    v = words[wi] >> sh
                    if sh:
                        v |= words[wi + 1] << (32 - sh)
                    idx = v & mask15
                    rr = rs[idx]
                    pos += rl[idx]
                if b1 >= 0:
                    bb = b1
                else:
                    wi = pos >> 5
                    sh = pos & 31
                    v = words[wi] >> sh
                    if sh:
                        v |= words[wi + 1] << (32 - sh)
                    idx = v & mask15
                    bb = bs[idx]
                    pos += bl[idx]
                if a1 >= 0:
                    aa = a1
                else:
                    wi = pos >> 5
                    sh = pos & 31
                    v = words[wi] >> sh
                    if sh:
                        v |= words[wi + 1] << (32 - sh)
                    idx = v & mask15
                    aa = as_[idx]
                    pos += al[idx]
                argb = (aa << 24) | (rr << 16) | (s << 8) | bb
                pix[i] = argb
                i += 1
                if cache is not None:
                    cache[((CACHE_MUL * argb) & 0xFFFFFFFF) >> shift] = argb
            elif s < 280:  # LZ77 back-reference
                code = s - 256
                nb = 0 if code < 4 else (code - 2) >> 1
                extra = 0
                if nb:
                    wi = pos >> 5
                    sh = pos & 31
                    v = words[wi] >> sh
                    if sh:
                        v |= words[wi + 1] << (32 - sh)
                    extra = v & ((1 << nb) - 1)
                    pos += nb
                length = _prefix_value(code, extra)
                if d1 >= 0:
                    dsym = d1
                else:
                    wi = pos >> 5
                    sh = pos & 31
                    v = words[wi] >> sh
                    if sh:
                        v |= words[wi + 1] << (32 - sh)
                    idx = v & mask15
                    dsym = ds[idx]
                    pos += dl[idx]
                nb = 0 if dsym < 4 else (dsym - 2) >> 1
                extra = 0
                if nb:
                    wi = pos >> 5
                    sh = pos & 31
                    v = words[wi] >> sh
                    if sh:
                        v |= words[wi + 1] << (32 - sh)
                    extra = v & ((1 << nb) - 1)
                    pos += nb
                dist_val = _prefix_value(dsym, extra)
                if dist_val > 120:
                    dist = dist_val - 120
                else:
                    dx, dy = DIST_MAP[dist_val - 1]
                    dist = dy * w + dx
                    if dist < 1:
                        dist = 1
                if dist > i or i + length > n:
                    raise ValueError("invalid VP8L back-reference")
                if cache is not None:
                    cm = CACHE_MUL
                    for _ in range(length):
                        p = pix[i - dist]
                        pix[i] = p
                        i += 1
                        cache[((cm * p) & 0xFFFFFFFF) >> shift] = p
                elif dist >= length:
                    pix[i : i + length] = pix[i - dist : i - dist + length]
                    i += length
                elif dist == 1:
                    pix[i : i + length] = [pix[i - 1]] * length
                    i += length
                else:
                    for _ in range(length):
                        pix[i] = pix[i - dist]
                        i += 1
            else:  # color-cache hit
                if cache is None:
                    raise ValueError("cache symbol without color cache")
                pix[i] = cache[s - 280]
                i += 1
    except IndexError:
        raise ValueError("truncated VP8L stream") from None
    br.pos = pos
    arr = np.array(pix, dtype=np.uint32)
    out = np.empty((n, 4), dtype=np.uint8)
    out[:, 0] = (arr >> 16) & 255
    out[:, 1] = (arr >> 8) & 255
    out[:, 2] = arr & 255
    out[:, 3] = arr >> 24
    img = out.reshape(h, w, 4)
    if alpha_hint and (img[:, :, 3] != 255).any():
        return img
    return img[:, :, :3]
