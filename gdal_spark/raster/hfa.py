"""HFA — Erdas Imagine (.img) reader in NumPy.

Mirrors ``frmts/hfa/`` (hfaopen.cpp, hfaentry.cpp, hfadictionary.cpp,
hfafield.cpp, hfaband.cpp):

* ``EHFA_HEADER_TAG`` + Ehfa_File header (version, rootEntryPtr,
  dictionaryPtr), entry tree of Ehfa_Entry records (six uint32 links
  + 64-byte name + 32-byte type — ``hfaentry.cpp:60-100``);
* the full MIF data dictionary: ``{itemdefs}typename,`` definitions
  with item grammar ``count:[p|*]typechar[extras]fieldname,``
  (``hfafield.cpp Initialize``), atomic sizes per
  ``HFADictionary::GetItemSize``, pointer fields carrying an inline
  4-byte count + 4-byte self-offset, enums as uint16 indices,
  BASEDATA (rows, cols, EPT type, objecttype, packed array),
  nested ``o`` objects and inline ``x{...}`` definitions;
* Eimg_Layer bands: width/height/blockWidth/blockHeight/pixelType
  (EPT 0..12 incl. the 1/2/4-bit packed types), RasterDMS
  (Edms_State) blockinfo arrays with offset/size/logvalid/
  compressionType per block, and ExternalRasterDMS spill files
  (``ERDAS_IMG_EXTERNAL_RASTER`` .ige: validity bitmap at
  layerStackValidFlagsOffset + 20-byte header skip, block data at
  ``dataOffset + blockSize·(iBlock·stackCount + stackIndex)``,
  ``hfaband.cpp:455-540,1202``);
* the ESRI block compression (``UncompressBlock``,
  ``hfaband.cpp:571-900``): 13-byte header (min value, run count,
  value offset, bits-per-value), reduced-precision mode
  (numruns == -1) with LSB-first sub-byte packing, else run records
  whose repeat counts use the 2-bit-length-prefixed big-endian
  encoding; f32 output reconstructs from integer bits (#1000);
* Eimg_NonInitializedValue basedata → nodata; Map_Info /
  Eprj_MapInfo georeferencing (pixel-center corners).

Pinned on the autotest fixtures: int.img checksum 6691, float.img
23529 + the published pixel value 41.0217 at (100,100), dem10.img,
i8u_c_i.img (RLE-compressed int8), small1bit.img, and the spill.img/
spill.ige pair (``tests/test_hfa.py``).
"""

from __future__ import annotations

import struct

import numpy as np

EPT_BITS = {0: 1, 1: 2, 2: 4, 3: 8, 4: 8, 5: 16, 6: 16, 7: 32, 8: 32,
            9: 32, 10: 64, 11: 64, 12: 128}
EPT_DTYPE = {3: "u1", 4: "i1", 5: "<u2", 6: "<i2", 7: "<u4", 8: "<i4",
             9: "<f4", 10: "<f8", 11: "<c8", 12: "<c16"}
_ITEM_SIZE = {"1": 1, "2": 1, "4": 1, "c": 1, "C": 1, "e": 2, "s": 2,
              "S": 2, "t": 4, "l": 4, "L": 4, "f": 4, "d": 8, "m": 8,
              "M": 16, "b": -1, "o": 0, "x": 0}


class HfaField:
    __slots__ = ("count", "pointer", "item_type", "obj_type",
                 "enum_names", "name")


def _parse_field(s: str, pos: int):
    f = HfaField()
    j = pos
    while s[j].isdigit():
        j += 1
    f.count = int(s[pos:j]) if j > pos else 1
    assert s[j] == ":", (pos, s[pos:pos + 30])
    j += 1
    f.pointer = ""
    if s[j] in "p*":
        f.pointer = s[j]
        j += 1
    f.item_type = s[j]
    j += 1
    f.obj_type = None
    f.enum_names = None
    if f.item_type == "o":
        k = s.index(",", j)
        f.obj_type = s[j:k]
        j = k + 1
    elif f.item_type == "x" and s[j] == "{":
        depth = 1
        j += 1
        while depth > 0:
            if s[j] == "{":
                depth += 1
            elif s[j] == "}":
                depth -= 1
            j += 1
        f.item_type = "o"
        k = s.index(",", j)
        f.obj_type = s[j:k]
        j = k + 1
    elif f.item_type == "e":
        k = s.index(":", j)
        n_enum = int(s[j:k])
        j = k + 1
        names = []
        for _ in range(n_enum):
            k = s.index(",", j)
            names.append(s[j:k])
            j = k + 1
        f.enum_names = names
    k = s.index(",", j)
    f.name = s[j:k]
    return f, k + 1


def parse_dictionary(s: str) -> dict:
    """MIF dictionary text → {typename: [HfaField, ...]}."""
    types: dict[str, list] = {}
    pos = 0
    while pos < len(s) and s[pos] == "{":
        pos += 1
        fields = []
        while s[pos] != "}":
            fld, pos = _parse_field(s, pos)
            fields.append(fld)
        pos += 1  # }
        k = s.index(",", pos)
        types[s[pos:k]] = fields
        pos = k + 1
    return types


class _Decoder:
    def __init__(self, buf: bytes, types: dict):
        self.buf = buf
        self.types = types

    def decode(self, type_name: str, pos: int, end: int):
        """Decode one instance of a named type → (dict, new_pos)."""
        out = {}
        for f in self.types[type_name]:
            val, pos = self._field(f, pos, end)
            out[f.name] = val
        return out, pos

    def _field(self, f: HfaField, pos: int, end: int):
        count = f.count
        if f.pointer:
            if pos + 8 > end:
                return None, end
            count = struct.unpack_from("<I", self.buf, pos)[0]
            pos += 8
        t = f.item_type
        if t == "b":
            if count == 0:
                return None, pos
            rows, cols = struct.unpack_from("<ii", self.buf, pos)
            base_type, = struct.unpack_from("<h", self.buf, pos + 8)
            pos += 12
            nbits = EPT_BITS.get(base_type, 8)
            nbytes = (nbits * rows * cols + 7) // 8
            dt = EPT_DTYPE.get(base_type)
            if dt is not None and rows * cols > 0:
                arr = np.frombuffer(self.buf, dt, rows * cols,
                                    pos).reshape(rows, cols)
            else:
                arr = None
            return arr, pos + nbytes
        if t == "o":
            items = []
            for _ in range(count):
                if pos >= end:
                    break
                item, pos = self.decode(f.obj_type, pos, end)
                items.append(item)
            if f.count == 1 and not f.pointer and items:
                return items[0], pos
            return items, pos
        size = _ITEM_SIZE[t]
        if t in ("c", "C"):
            raw = self.buf[pos:pos + count]
            pos += count
            return raw.split(b"\0")[0].decode("latin-1"), pos
        vals = []
        for _ in range(count):
            if pos + size > end:
                vals.append(None)
                continue
            if t in ("1", "2", "4"):
                v = self.buf[pos]
            elif t == "e":
                idx = struct.unpack_from("<H", self.buf, pos)[0]
                v = (f.enum_names[idx]
                     if f.enum_names and idx < len(f.enum_names) else idx)
            elif t == "s":
                v = struct.unpack_from("<H", self.buf, pos)[0]
            elif t == "S":
                v = struct.unpack_from("<h", self.buf, pos)[0]
            elif t in ("t", "L"):
                v = struct.unpack_from("<I", self.buf, pos)[0]
            elif t == "l":
                v = struct.unpack_from("<i", self.buf, pos)[0]
            elif t == "f":
                v = struct.unpack_from("<f", self.buf, pos)[0]
            elif t == "d":
                v = struct.unpack_from("<d", self.buf, pos)[0]
            elif t in ("m", "M"):
                v = None
            else:
                v = None
            vals.append(v)
            pos += size
        if f.count == 1 and not f.pointer:
            return vals[0] if vals else None, pos
        return vals, pos


class HfaEntry:
    __slots__ = ("name", "type", "data_pos", "data_size", "children",
                 "_file", "_next")

    def __init__(self, file, pos):
        buf = file.buf
        nxt, prev, parent, child, data, size = struct.unpack_from(
            "<6I", buf, pos)
        self.name = buf[pos + 24:pos + 88].split(b"\0")[0].decode(
            "latin-1")
        self.type = buf[pos + 88:pos + 120].split(b"\0")[0].decode(
            "latin-1")
        self.data_pos = data
        self.data_size = size
        self._file = file
        self.children = []
        if child:
            self.children = file._read_siblings(child)
        self._next = nxt

    def child(self, name: str):
        for c in self.children:
            if c.name == name:
                return c
        return None

    def fields(self) -> dict:
        if self.type not in self._file.types or self.data_size == 0:
            return {}
        dec = _Decoder(self._file.buf, self._file.types)
        out, _ = dec.decode(self.type, self.data_pos,
                            self.data_pos + self.data_size)
        return out


class HfaFile:
    def __init__(self, buf: bytes):
        if not buf.startswith(b"EHFA_HEADER_TAG"):
            raise ValueError("not an Erdas Imagine (HFA) file")
        self.buf = buf
        hdr_pos, = struct.unpack_from("<I", buf, 16)
        version, free_list, root_ptr, entry_len, dict_ptr = \
            struct.unpack_from("<IIIHI", buf, hdr_pos)
        self.version = version
        # dictionary: text from dict_ptr up to the terminating '.'
        dend = buf.index(b".", dict_ptr)
        self.types = parse_dictionary(
            buf[dict_ptr:dend].decode("latin-1"))
        self.root = HfaEntry(self, root_ptr)

    def _read_siblings(self, pos):
        out = []
        while pos:
            e = HfaEntry(self, pos)
            out.append(e)
            pos = e._next
        return out


def _uncompress_block(cdata: bytes, n_pixels: int,
                      ept: int) -> np.ndarray:
    """hfaband.cpp UncompressBlock → int64/float values array."""
    data_min, num_runs, data_off = struct.unpack_from("<Iii", cdata, 0)
    num_bits = cdata[13 - 1]
    out = np.zeros(n_pixels, np.int64)

    def read_values(vbuf, n):
        if num_bits == 0:
            return np.zeros(n, np.int64)
        if num_bits in (1, 2, 4):
            bits = np.unpackbits(
                np.frombuffer(vbuf, np.uint8,
                              (num_bits * n + 7) // 8).reshape(-1, 1),
                axis=1, bitorder="little").ravel()
            vals = np.zeros(n, np.int64)
            for k in range(num_bits):
                vals |= bits[k:n * num_bits:num_bits].astype(
                    np.int64) << k
            return vals
        if num_bits == 8:
            return np.frombuffer(vbuf, np.uint8, n).astype(np.int64)
        if num_bits == 16:
            return np.frombuffer(vbuf, ">u2", n).astype(np.int64)
        if num_bits == 32:
            return np.frombuffer(vbuf, ">i4", n).astype(np.int64)
        raise ValueError(f"HFA compression num_bits {num_bits}")

    if num_runs == -1:
        vals = read_values(cdata[13:], n_pixels)
        out[:] = vals + np.int64(np.int32(data_min))
    else:
        # repeat counts: 2-bit length prefix, big-endian remainder
        counts = np.empty(num_runs, np.int64)
        p = 13
        for i in range(num_runs):
            b0 = cdata[p]
            nb = (b0 >> 6) + 1
            v = b0 & 0x3F
            for k in range(1, nb):
                v = v * 256 + cdata[p + k]
            counts[i] = v
            p += nb
        vals = read_values(cdata[data_off:], num_runs) \
            + np.int64(np.int32(data_min))
        out = np.repeat(vals, counts)
        if len(out) < n_pixels:
            out = np.concatenate(
                [out, np.zeros(n_pixels - len(out), np.int64)])
        out = out[:n_pixels]
    if ept == 9:  # f32 from integer bits (#1000)
        return out.astype(np.int64).astype("<i4").view("<f4").astype(
            np.float64)
    return out


def _unpack_subbyte(raw: np.ndarray, n: int, bits: int) -> np.ndarray:
    b = np.unpackbits(raw.reshape(-1, 1), axis=1,
                      bitorder="little").ravel()
    vals = np.zeros((len(raw) * 8) // bits, np.uint8)
    for k in range(bits):
        vals |= (b[k::bits][:len(vals)] << k).astype(np.uint8)
    return vals[:n]


def _decode_layer(hfa: HfaFile, layer: HfaEntry, resolve=None):
    """Decode one Eimg_Layer node → (band array, layer info dict)."""
    buf = hfa.buf
    lf = layer.fields()
    w = int(lf["width"])
    h = int(lf["height"])
    bw = int(lf["blockWidth"])
    bh = int(lf["blockHeight"])
    ept = lf["pixelType"]
    if isinstance(ept, str):
        ept = ["u1", "u2", "u4", "u8", "s8", "u16", "s16", "u32",
               "s32", "f32", "f64", "c64", "c128"].index(ept)
    bits = EPT_BITS[ept]
    blocks_per_row = (w + bw - 1) // bw
    blocks_per_col = (h + bh - 1) // bh
    n_blocks = blocks_per_row * blocks_per_col
    pixels_per_block = bw * bh
    block_bytes = (pixels_per_block * bits + 7) // 8

    if ept >= 3:
        dt = np.dtype(EPT_DTYPE[ept])
    else:
        dt = np.dtype("u1")
    band = np.zeros((blocks_per_col * bh, blocks_per_row * bw), dt)

    dms = layer.child("RasterDMS")
    ext = layer.child("ExternalRasterDMS")
    if dms is not None:
        df = dms.fields()
        binfo = df.get("blockinfo") or []
        for i in range(min(n_blocks, len(binfo))):
            bi = binfo[i]
            by, bx = divmod(i, blocks_per_row)
            if not bi.get("logvalid", 1):
                continue
            off = int(bi["offset"])
            size = int(bi["size"])
            comp = bi.get("compressionType", 0)
            compressed = comp not in (0, "no compression", None)
            raw = buf[off:off + size]
            if compressed:
                vals = _uncompress_block(raw, pixels_per_block, ept)
                tile = vals.astype(dt if ept != 9 else "<f4")
            elif bits < 8:
                tile = _unpack_subbyte(
                    np.frombuffer(raw, np.uint8), pixels_per_block,
                    bits)
            else:
                tile = np.frombuffer(raw, dt, pixels_per_block)
            band[by * bh:(by + 1) * bh, bx * bw:(bx + 1) * bw] = \
                np.asarray(tile).reshape(bh, bw)
    elif ext is not None:
        ef = ext.fields()
        fname = ef.get("fileName")
        if isinstance(fname, dict):
            fname = fname.get("string", "")
        if resolve is None:
            raise ValueError("HFA spill file needs a resolve callback")
        ige = resolve(str(fname).rsplit("\\", 1)[-1].rsplit(
            "/", 1)[-1])
        if not ige.startswith(b"ERDAS_IMG_EXTERNAL_RASTER"):
            raise ValueError("corrupt HFA spill (.ige) file")
        stack_count = int(ef["layerStackCount"])
        stack_index = int(ef["layerStackIndex"])

        def big(v):
            return int(v[0]) if isinstance(v, list) else int(v)

        flags_off = big(ef["layerStackValidFlagsOffset"])
        data_off = big(ef["layerStackDataOffset"])
        bytes_per_row = (blocks_per_row + 7) // 8
        bmap = np.frombuffer(
            ige, np.uint8,
            bytes_per_row * blocks_per_col + 20, flags_off)
        for i in range(n_blocks):
            by, bx = divmod(i, blocks_per_row)
            nbit = by * bytes_per_row * 8 + bx + 20 * 8
            if not (bmap[nbit >> 3] >> (nbit & 7)) & 1:
                continue
            off = data_off + block_bytes * (i * stack_count
                                            + stack_index)
            raw = ige[off:off + block_bytes]
            if bits < 8:
                tile = _unpack_subbyte(
                    np.frombuffer(raw, np.uint8),
                    pixels_per_block, bits)
            else:
                tile = np.frombuffer(raw, dt, pixels_per_block)
            band[by * bh:(by + 1) * bh, bx * bw:(bx + 1) * bw] = \
                np.asarray(tile).reshape(bh, bw)
    else:
        raise ValueError(f"layer {layer.name}: no RasterDMS")

    band = band[:h, :w]

    nodata = None
    ninit = layer.child("Eimg_NonInitializedValue")
    if ninit is not None:
        nf = ninit.fields()
        v = nf.get("valueBD")
        if isinstance(v, np.ndarray) and v.size:
            nodata = float(v.ravel()[0])

    gt = None
    mi = layer.child("Map_Info")
    if mi is None:
        for c in layer.children:
            if c.type == "Eprj_MapInfo":
                mi = c
                break
    if mi is not None:
        mf = mi.fields()

        def first(v):
            while isinstance(v, list):
                v = v[0] if v else {}
            return v if isinstance(v, dict) else {}

        ul = first(mf.get("upperLeftCenter"))
        ps = first(mf.get("pixelSize"))
        if ul and ps:
            def num(v):
                return float(v[0]) if isinstance(v, list) else float(v)

            px = num(ps.get("width", 1.0))
            py = num(ps.get("height", 1.0))
            gt = (num(ul["x"]) - px / 2.0, px, 0.0,
                  num(ul["y"]) + py / 2.0, 0.0, -py)

    return band, {"w": w, "h": h, "dtype": band.dtype.name,
                  "ept": ept, "block": (bw, bh), "nodata": nodata,
                  "geotransform": gt, "name": layer.name}


def read_hfa(buf: bytes, resolve=None):
    """Decode the first/all Eimg_Layer bands → ((h, w) or (h, w, n)
    array, info).  ``resolve(filename)`` supplies .ige spill files."""
    hfa = HfaFile(buf)
    layers = [c for c in hfa.root.children if c.type == "Eimg_Layer"]
    if not layers:
        raise ValueError("HFA file has no Eimg_Layer nodes")
    bands = []
    info: dict = {}
    for layer in layers:
        band, linfo = _decode_layer(hfa, layer, resolve)
        bands.append(band)
        if not info:
            info = dict(linfo, layer_names=[])
        info["layer_names"].append(layer.name)
    info["bands"] = len(bands)
    arr = bands[0] if len(bands) == 1 else np.stack(bands, axis=-1)
    return arr, info


def read_hfa_overviews(buf: bytes, resolve):
    """Reduced-resolution datasets from RRDNamesList entries like
    ``foo.rrd(:Layer_1:_ss_2_)`` (hfaband.cpp LoadOverviews):
    ``resolve`` supplies the .rrd/.rde companion files.  Returns
    [(array, info), ...] per overview of the first layer."""
    hfa = HfaFile(buf)
    layers = [c for c in hfa.root.children if c.type == "Eimg_Layer"]
    if not layers:
        return []
    rrd = layers[0].child("RRDNamesList")
    if rrd is None:
        return []
    rf = rrd.fields()
    names = rf.get("nameList") or []
    if isinstance(names, dict):
        names = [names]
    out = []
    dep_cache = {}
    for entry in names:
        s = entry.get("string", "") if isinstance(entry, dict) else ""
        if "(:" not in s:
            continue
        fname, _, path = s.partition("(:")
        path = path.rstrip(")").replace(":", ".")
        base = fname.rsplit("\\", 1)[-1].rsplit("/", 1)[-1]
        if base not in dep_cache:
            dep_cache[base] = HfaFile(resolve(base))
        dep = dep_cache[base]
        node = dep.root
        ok = True
        for part in path.split("."):
            node = node.child(part) if node else None
            if node is None:
                ok = False
                break
        if not ok or node is None:
            continue
        band, linfo = _decode_layer(dep, node, resolve)
        out.append((band, linfo))
    return out


# ------------------------------------------------------------------ writer

_WRITE_DICT = (
    "{1:lwidth,1:lheight,1:e3:thematic,athematic,fft of real valued data,"
    "layerType,1:e13:u1,u2,u4,u8,s8,u16,s16,u32,s32,f32,f64,c64,c128,"
    "pixelType,1:lblockWidth,1:lblockHeight,}Eimg_Layer,"
    "{1:SfileCode,1:Loffset,1:Lsize,1:slogvalid,1:scompressionType,}"
    "Edms_VirtualBlockInfo,"
    "{1:lnumvirtualblocks,1:lnumobjectsperblock,1:lnextobjectnum,"
    "1:e2:no compression,ESRI GRID compression,compressionType,"
    "0:poEdms_VirtualBlockInfo,blockinfo,}Edms_State,"
    "{1:dx,1:dy,}Eprj_Coordinate,"
    "{1:dwidth,1:dheight,}Eprj_Size,"
    "{0:pcproName,1:*oEprj_Coordinate,upperLeftCenter,"
    "1:*oEprj_Coordinate,lowerRightCenter,1:*oEprj_Size,pixelSize,"
    "0:pcunits,}Eprj_MapInfo,"
    "{1:*bvalueBD,}Eimg_NonInitializedValue,"
)

_EPT_FOR_DTYPE = {"u1": 3, "i1": 4, "u2": 5, "i2": 6, "u4": 7, "i4": 8,
                  "f4": 9, "f8": 10}


def write_hfa(arr: np.ndarray, geotransform=None, nodata=None,
              block: int = 64) -> bytes:
    """Encode a single-band array as a minimal standard-layout HFA
    file (uncompressed RasterDMS blocks) that round-trips through
    this reader using the same on-disk structures as the reference
    writer."""
    arr = np.asarray(arr)
    h, w = arr.shape
    ept = _EPT_FOR_DTYPE.get(arr.dtype.str.lstrip("<>=|"))
    if ept is None:
        raise ValueError(f"HFA writer cannot store {arr.dtype}")
    item = arr.dtype.itemsize
    bw = bh = block
    bpr = (w + bw - 1) // bw
    bpc = (h + bh - 1) // bh
    n_blocks = bpr * bpc
    block_bytes = bw * bh * item

    out = bytearray()
    out += b"EHFA_HEADER_TAG\0"
    out += struct.pack("<I", 20)
    hdr_at = len(out)
    out += b"\0" * 18  # Ehfa_File placeholder (IIIHI = 18 bytes)
    dict_pos = len(out)
    out += _WRITE_DICT.encode("latin-1") + b"."

    def entry(name, etype, next_p, child_p, data_p, data_sz, parent=0,
              prev=0):
        rec = struct.pack("<6I", next_p, prev, parent, child_p, data_p,
                          data_sz)
        rec += name.encode()[:63].ljust(64, b"\0")
        rec += etype.encode()[:31].ljust(32, b"\0")
        return rec + b"\0" * 8  # entryHeaderLength = 128

    # plan positions
    pos = len(out)
    root_pos = pos
    layer_pos = root_pos + 128
    dms_pos = layer_pos + 128
    map_pos = dms_pos + 128 if geotransform is not None else 0
    nd_pos = (map_pos or dms_pos) + 128 if nodata is not None else 0
    after_entries = max(dms_pos, map_pos or 0, nd_pos or 0) + 128

    # layer data
    layer_data_pos = after_entries
    layer_data = struct.pack("<ll", w, h) + struct.pack("<H", 1) \
        + struct.pack("<H", ept) + struct.pack("<ll", bw, bh)

    # DMS data: 3 ints + enum + pointer blockinfo
    dms_data_pos = layer_data_pos + len(layer_data)
    blocks_start = 0  # filled below
    dms_head = struct.pack("<lll", n_blocks, bw * bh, n_blocks) \
        + struct.pack("<H", 0)
    binfo_bytes = 14 * n_blocks
    dms_data_len = len(dms_head) + 8 + binfo_bytes
    map_data_pos = dms_data_pos + dms_data_len
    map_data = b""
    if geotransform is not None:
        gt = geotransform
        ulx = gt[0] + gt[1] / 2.0
        uly = gt[3] + gt[5] / 2.0
        lrx = gt[0] + gt[1] * w - gt[1] / 2.0
        lry = gt[3] + gt[5] * h - gt[5] / 2.0

        def ptr_obj(payload):
            return struct.pack("<II", 1, 0) + payload

        map_data = (struct.pack("<II", 0, 0)  # proName empty pointer
                    + ptr_obj(struct.pack("<dd", ulx, uly))
                    + ptr_obj(struct.pack("<dd", lrx, lry))
                    + ptr_obj(struct.pack("<dd", abs(gt[1]), abs(gt[5])))
                    + struct.pack("<II", 0, 0))  # units empty
    nd_data_pos = map_data_pos + len(map_data)
    nd_data = b""
    if nodata is not None:
        nd_data = (struct.pack("<II", 1, 0)
                   + struct.pack("<iihh", 1, 1, 10, 0)
                   + struct.pack("<d", float(nodata)))
    blocks_start = nd_data_pos + len(nd_data)

    # entries
    out += entry("root", "root", 0, layer_pos, 0, 0)
    out += entry("Layer_1", "Eimg_Layer", 0, dms_pos, layer_data_pos,
                 len(layer_data), parent=root_pos)
    nxt = map_pos or nd_pos or 0
    out += entry("RasterDMS", "Edms_State", nxt, 0, dms_data_pos,
                 dms_data_len, parent=layer_pos)
    if geotransform is not None:
        out += entry("Map_Info", "Eprj_MapInfo", nd_pos or 0, 0,
                     map_data_pos, len(map_data), parent=layer_pos)
    if nodata is not None:
        out += entry("Eimg_NonInitializedValue",
                     "Eimg_NonInitializedValue", 0, 0, nd_data_pos,
                     len(nd_data), parent=layer_pos)
    assert len(out) == after_entries, (len(out), after_entries)

    out += layer_data
    out += dms_head + struct.pack("<II", n_blocks, 0)
    for i in range(n_blocks):
        out += struct.pack("<hIIhh", 0, blocks_start + i * block_bytes,
                           block_bytes, 1, 0)
    out += map_data
    out += nd_data
    assert len(out) == blocks_start
    ldt = arr.dtype.newbyteorder("<")
    for i in range(n_blocks):
        by, bx = divmod(i, bpr)
        tile = np.zeros((bh, bw), ldt)
        sub = arr[by * bh:(by + 1) * bh, bx * bw:(bx + 1) * bw]
        tile[:sub.shape[0], :sub.shape[1]] = sub
        out += tile.tobytes()

    struct.pack_into("<IIIHI", out, hdr_at, 1, 0, root_pos, 128,
                     dict_pos)
    return bytes(out)
