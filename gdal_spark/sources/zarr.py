"""Zarr v2 multidim source — the `GDALGroup`/`GDALMDArray` model.

Reference surface: ``gcore/multidim/gdal_multidim.h`` (GDALGroup /
GDALMDArray) and ``frmts/zarr/`` (GDAL's Zarr driver, Zarr v2
encoding). SURVEY §1.1 declared multidim out of scope v1; this closes
the common 2-D case the image workload actually meets: a chunked 2-D
array read as a DataFrame of chunks, decoded in Arrow batches, with
**chunk pruning as the partition-pruning analogue** — a window read
lists only the chunk files it intersects, exactly like GDAL's
``GetBlockRef`` and Spark's parquet partition pruning.

Format notes (public Zarr v2 spec):
- ``.zarray`` JSON: shape, chunks, dtype (NumPy endian-coded str),
  order ('C'/'F'), compressor (null or {"id": "zlib", "level": n}),
  fill_value; chunk files named ``"<i>.<j>"`` (dot-separated, one
  index per dimension).
- Edge chunks are stored FULL-SIZE (padded with fill_value).

Scope: any NumPy numeric dtype, C or F chunk order, compressors
null / zlib / gzip / **zstd** (capability-probed libzstd,
``native/zstd_lib.py`` — the modern Zarr default) / **lz4**
(numcodecs 4-byte-size-prefix frame through liblz4,
``native/lz4_lib.py``).  Blosc raises loudly naming the c-blosc
library (its block/split container is only safely decoded by the
real library).

Scale design: ``read_zarr_chunks`` parallelizes over chunk files via
``spark.read.format("binaryFile")`` (each chunk decodes independently
inside ``mapInPandas``); a 100 TB array is just more chunk files.
``window`` prunes with a pathGlobFilter-free filter on the chunk
indices parsed from the file name — the filter reaches the file scan
(binaryFile lists then filters by path column before reading content
at 0 I/O cost for pruned rows thanks to lazy content loading... in
practice we pre-compute the matching file list and pass it to load(),
so pruned chunks are never even listed as splits).
"""

from __future__ import annotations

import json
import os
import zlib

import numpy as np
import pandas as pd
from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F


_BLOSC_MSG = (
    "compressor 'blosc' needs the c-blosc cluster library — its "
    "block/split container is not safely re-implementable without it"
)


def _comp_meta(compressor: str | None, level: int):
    """compressor name → .zarray compressor JSON value."""
    if compressor is None:
        return None
    if compressor == "zlib":
        return {"id": "zlib", "level": level}
    if compressor == "gzip":
        return {"id": "gzip", "level": level}
    if compressor == "zstd":
        return {"id": "zstd", "level": level}
    if compressor == "lz4":
        return {"id": "lz4", "acceleration": 1}
    raise NotImplementedError(f"writer compressor {compressor!r}")


def _encode_chunk(raw: bytes, compressor: str | None, level: int) -> bytes:
    if compressor is None:
        return raw
    if compressor == "zlib":
        return zlib.compress(raw, level)
    if compressor == "gzip":
        import gzip as _gzip

        return _gzip.compress(raw, level)
    if compressor == "zstd":
        from gdal_spark.native import zstd_lib

        return zstd_lib.compress(raw, level)
    if compressor == "lz4":
        from gdal_spark.native import lz4_lib

        return lz4_lib.compress_frame(raw)
    raise NotImplementedError(f"writer compressor {compressor!r}")


def _decode_chunk(raw: bytes, comp_id: str | None, nbytes: int) -> bytes:
    """One chunk file's bytes → uncompressed buffer of `nbytes`."""
    if comp_id is None:
        return raw
    if comp_id == "zlib":
        return zlib.decompress(raw)
    if comp_id == "gzip":
        import gzip as _gzip

        return _gzip.decompress(raw)
    if comp_id == "zstd":
        from gdal_spark.native import zstd_lib

        return zstd_lib.decompress(raw, nbytes)
    if comp_id == "lz4":
        from gdal_spark.native import lz4_lib

        return lz4_lib.decompress_frame(raw)
    if comp_id == "blosc":
        raise NotImplementedError(_BLOSC_MSG)
    raise NotImplementedError(
        f"compressor {comp_id!r} needs its codec library"
    )


_KNOWN_COMP = (None, "zlib", "gzip", "zstd", "lz4")


def write_zarr(
    path: str,
    arr: np.ndarray,
    chunks: tuple[int, int],
    compressor: str | None = "zlib",
    level: int = 1,
    fill_value=0,
) -> None:
    """Write a 2-D NumPy array as a Zarr v2 store (test/fixture
    helper — the engine's sinks stay parquet/Iceberg; this exists so
    the reader can be exercised hermetically)."""
    if arr.ndim != 2:
        raise ValueError("2-D arrays only")
    os.makedirs(path, exist_ok=True)
    cy, cx = chunks
    meta = {
        "zarr_format": 2,
        "shape": list(arr.shape),
        "chunks": [cy, cx],
        "dtype": arr.dtype.str,
        "order": "C",
        "compressor": _comp_meta(compressor, level),
        "fill_value": fill_value,
        "filters": None,
    }
    with open(os.path.join(path, ".zarray"), "w") as f:
        json.dump(meta, f)
    h, w = arr.shape
    for i in range(-(-h // cy)):
        for j in range(-(-w // cx)):
            block = np.full((cy, cx), fill_value, dtype=arr.dtype)
            part = arr[i * cy : min((i + 1) * cy, h), j * cx : min((j + 1) * cx, w)]
            block[: part.shape[0], : part.shape[1]] = part
            raw = _encode_chunk(block.tobytes(order="C"), compressor, level)
            with open(os.path.join(path, f"{i}.{j}"), "wb") as f:
                f.write(raw)


def read_zarray_meta(path: str) -> dict:
    with open(os.path.join(path, ".zarray")) as f:
        meta = json.load(f)
    if len(meta["shape"]) != 2:
        raise NotImplementedError("only 2-D arrays in this reader")
    if meta.get("order", "C") not in ("C", "F"):
        raise ValueError(f"bad order {meta.get('order')!r}")
    comp = meta.get("compressor")
    if comp is not None and comp.get("id") not in _KNOWN_COMP:
        if comp.get("id") == "blosc":
            raise NotImplementedError(_BLOSC_MSG)
        raise NotImplementedError(
            f"compressor {comp.get('id')!r} needs its codec library"
        )
    return meta


def read_zarr_chunks(
    spark: SparkSession,
    path: str,
    window: tuple[int, int, int, int] | None = None,
) -> DataFrame:
    """Chunked scan → (cy, cx, y0, x0, h, w, values array<double>)
    per chunk, edge chunks trimmed to the array shape. ``window`` =
    (y_off, x_off, h, w) prunes chunk FILES before Spark ever lists
    them (the RasterIO window-read / partition-pruning analogue)."""
    meta = read_zarray_meta(path)
    H, W = meta["shape"]
    CY, CX = meta["chunks"]
    dtype = np.dtype(meta["dtype"])
    comp_id = (meta.get("compressor") or {}).get("id")
    order = meta.get("order", "C")

    ny, nx = -(-H // CY), -(-W // CX)
    if window is not None:
        wy, wx, wh, ww = window
        i0, i1 = wy // CY, min(ny - 1, (wy + wh - 1) // CY)
        j0, j1 = wx // CX, min(nx - 1, (wx + ww - 1) // CX)
    else:
        i0, i1, j0, j1 = 0, ny - 1, 0, nx - 1
    files = [
        os.path.join(path, f"{i}.{j}")
        for i in range(i0, i1 + 1)
        for j in range(j0, j1 + 1)
        if os.path.exists(os.path.join(path, f"{i}.{j}"))
    ]
    if not files:
        return spark.createDataFrame(
            [], "cy int, cx int, y0 int, x0 int, h int, w int, values array<double>"
        )
    scan = spark.read.format("binaryFile").load(files)

    def decode(it):
        for pdf in it:
            rows = []
            for r in pdf.itertuples():
                name = os.path.basename(r.path)
                i, j = (int(v) for v in name.split("."))
                raw = _decode_chunk(
                    bytes(r.content), comp_id, CY * CX * dtype.itemsize)
                block = np.frombuffer(raw, dtype=dtype).reshape(
                    (CY, CX), order=order)
                h = min(CY, H - i * CY)
                w = min(CX, W - j * CX)
                rows.append(
                    {
                        "cy": i,
                        "cx": j,
                        "y0": i * CY,
                        "x0": j * CX,
                        "h": h,
                        "w": w,
                        "values": block[:h, :w].astype(np.float64).ravel().tolist(),
                    }
                )
            yield pd.DataFrame(rows)

    return scan.mapInPandas(
        decode, schema="cy int, cx int, y0 int, x0 int, h int, w int, values array<double>"
    )


# ---------------------------------------------------------------------------
# N-D hypercubes (round 4, VERDICT r03 item 9): time/band cubes of the
# GDALMDArray model (gcore/multidim/gdal_multidim.h), arbitrary rank,
# same chunk-file-pruning scan shape as the 2-D path.
# ---------------------------------------------------------------------------


def write_zarr_nd(
    path: str,
    arr: np.ndarray,
    chunks: tuple[int, ...],
    compressor: str | None = "zlib",
    level: int = 1,
    fill_value=0,
) -> None:
    """N-D Zarr v2 writer (fixture helper): chunk files named
    ``i.j.k...``, edge chunks stored full-size per the spec."""
    if len(chunks) != arr.ndim:
        raise ValueError("chunks rank must match array rank")
    os.makedirs(path, exist_ok=True)
    meta = {
        "zarr_format": 2,
        "shape": list(arr.shape),
        "chunks": list(int(c) for c in chunks),
        "dtype": arr.dtype.str,
        "order": "C",
        "compressor": _comp_meta(compressor, level),
        "fill_value": fill_value,
        "filters": None,
    }
    with open(os.path.join(path, ".zarray"), "w") as f:
        json.dump(meta, f)
    grids = [range(-(-s // c)) for s, c in zip(arr.shape, chunks)]
    import itertools

    for idx in itertools.product(*grids):
        block = np.full(chunks, fill_value, dtype=arr.dtype)
        sel = tuple(
            slice(i * c, min((i + 1) * c, s))
            for i, c, s in zip(idx, chunks, arr.shape)
        )
        part = arr[sel]
        block[tuple(slice(0, p) for p in part.shape)] = part
        raw = _encode_chunk(block.tobytes(order="C"), compressor, level)
        with open(os.path.join(path, ".".join(str(i) for i in idx)), "wb") as f:
            f.write(raw)


def read_zarray_meta_nd(path: str) -> dict:
    with open(os.path.join(path, ".zarray")) as f:
        meta = json.load(f)
    if meta.get("order", "C") not in ("C", "F"):
        raise ValueError(f"bad order {meta.get('order')!r}")
    comp = meta.get("compressor")
    if comp is not None and comp.get("id") not in _KNOWN_COMP:
        if comp.get("id") == "blosc":
            raise NotImplementedError(_BLOSC_MSG)
        raise NotImplementedError(
            f"compressor {comp.get('id')!r} needs its codec library"
        )
    return meta


_V3_DTYPES = {
    "float64": "<f8", "float32": "<f4",
    "int64": "<i8", "int32": "<i4", "int16": "<i2", "int8": "|i1",
    "uint64": "<u8", "uint32": "<u4", "uint16": "<u2", "uint8": "|u1",
}


def write_zarr_v3(
    path: str,
    arr: np.ndarray,
    chunks: tuple[int, ...],
    codec: str | None = "gzip",
    level: int = 1,
    fill_value=0,
) -> None:
    """Zarr v3 array writer (``zarr.json`` + ``c/<i>/<j>/...`` chunk
    keys, bytes+gzip codec chain — the v3 core spec the reference's
    ``frmts/zarr`` driver reads alongside v2)."""
    import gzip as _gzip
    import itertools

    os.makedirs(path, exist_ok=True)
    dt_name = {v: k for k, v in _V3_DTYPES.items()}[
        arr.dtype.newbyteorder("<").str if arr.dtype.itemsize > 1 else arr.dtype.str
    ]
    codecs = [{"name": "bytes", "configuration": {"endian": "little"}}]
    if codec == "gzip":
        codecs.append({"name": "gzip", "configuration": {"level": level}})
    elif codec == "zstd":
        codecs.append({"name": "zstd",
                       "configuration": {"level": level, "checksum": False}})
    elif codec is not None:
        raise NotImplementedError(f"v3 writer codec {codec!r}")
    meta = {
        "zarr_format": 3,
        "node_type": "array",
        "shape": list(arr.shape),
        "data_type": dt_name,
        "chunk_grid": {
            "name": "regular",
            "configuration": {"chunk_shape": [int(c) for c in chunks]},
        },
        "chunk_key_encoding": {
            "name": "default",
            "configuration": {"separator": "/"},
        },
        "fill_value": fill_value,
        "codecs": codecs,
    }
    with open(os.path.join(path, "zarr.json"), "w") as f:
        json.dump(meta, f)
    le = arr.dtype.newbyteorder("<")
    grids = [range(-(-s // c)) for s, c in zip(arr.shape, chunks)]
    for idx in itertools.product(*grids):
        block = np.full(chunks, fill_value, dtype=le)
        sel = tuple(
            slice(i * c, min((i + 1) * c, s))
            for i, c, s in zip(idx, chunks, arr.shape)
        )
        part = arr[sel]
        block[tuple(slice(0, p) for p in part.shape)] = part
        raw = block.astype(le, copy=False).tobytes(order="C")
        if codec == "gzip":
            raw = _gzip.compress(raw, level)
        elif codec == "zstd":
            from gdal_spark.native import zstd_lib

            raw = zstd_lib.compress(raw, level)
        d = os.path.join(path, "c", *[str(i) for i in idx[:-1]])
        os.makedirs(d, exist_ok=True)
        with open(os.path.join(d, str(idx[-1])), "wb") as f:
            f.write(raw)


def read_zarr_meta_v3(path: str) -> dict:
    """zarr.json → the v2-reader's normalized field set + v3 markers."""
    with open(os.path.join(path, "zarr.json")) as f:
        m = json.load(f)
    if m.get("node_type") != "array" or m.get("zarr_format") != 3:
        raise NotImplementedError("only Zarr v3 array nodes supported")
    names = [c["name"] for c in m.get("codecs", [])]
    if names and names[0] != "bytes":
        raise NotImplementedError("v3 codec chain must start with 'bytes'")
    extra = [n for n in names[1:] if n not in ("gzip", "zstd")]
    if extra:
        raise NotImplementedError(
            f"v3 codecs {extra} need their codec libraries — "
            "bytes/gzip/zstd are available in-container"
        )
    endian = "<"
    for c in m.get("codecs", []):
        if c["name"] == "bytes" and c.get("configuration", {}).get("endian") == "big":
            endian = ">"
    base = _V3_DTYPES[m["data_type"]]
    dtype = base if base[0] == "|" else endian + base[1:]
    sep = (
        m.get("chunk_key_encoding", {})
        .get("configuration", {})
        .get("separator", "/")
    )
    return {
        "shape": m["shape"],
        "chunks": m["chunk_grid"]["configuration"]["chunk_shape"],
        "dtype": dtype,
        "compressor": (
            {"id": "gzip"} if "gzip" in names
            else {"id": "zstd"} if "zstd" in names else None
        ),
        "v3": True,
        "sep": sep,
    }


def _read_meta_any(path: str) -> dict:
    if os.path.exists(os.path.join(path, "zarr.json")):
        return read_zarr_meta_v3(path)
    meta = read_zarray_meta_nd(path)
    meta["v3"] = False
    return meta


def read_zarr_chunks_nd(
    spark: SparkSession,
    path: str,
    window: list[tuple[int, int]] | None = None,
) -> DataFrame:
    """N-D chunked scan → one row per chunk:
    (idx array<int>, origin array<int>, dims array<int>,
    values array<double> row-major, edge-trimmed).

    ``window`` = [(off, size)] per dimension; the per-dimension
    chunk-index ranges are intersected BEFORE the file list is built —
    the N-D generalization of the 2-D path's partition pruning (GDAL
    ``GetBlockRef`` / parquet partition pruning analogue): a window
    over a (time, band, y, x) hypercube touches only the chunk files
    of its time/band/space sub-grid."""
    import itertools

    meta = _read_meta_any(path)
    v3 = meta.get("v3", False)
    shape = [int(s) for s in meta["shape"]]
    csz = [int(c) for c in meta["chunks"]]
    dtype = np.dtype(meta["dtype"])
    comp_id = (meta.get("compressor") or {}).get("id")
    order = meta.get("order", "C")
    ngrid = [-(-s // c) for s, c in zip(shape, csz)]
    if window is not None:
        if len(window) != len(shape):
            raise ValueError("window rank must match array rank")
        ranges = [
            range(off // c, min(n - 1, (off + sz - 1) // c) + 1)
            for (off, sz), c, n in zip(window, csz, ngrid)
        ]
    else:
        ranges = [range(n) for n in ngrid]
    files = []
    for idx in itertools.product(*ranges):
        if v3:
            p = os.path.join(path, "c", *[str(i) for i in idx])
        else:
            p = os.path.join(path, ".".join(str(i) for i in idx))
        if os.path.exists(p):
            files.append(p)
    schema = "idx array<int>, origin array<int>, dims array<int>, values array<double>"
    if not files:
        return spark.createDataFrame([], schema)
    scan = spark.read.format("binaryFile").load(files)
    rank = len(shape)

    def decode(it):
        for pdf in it:
            rows = []
            for r in pdf.itertuples():
                if v3:  # .../c/<i>/<j>/<k> — last `rank` path parts
                    parts = r.path.split("/")[-rank:]
                    idx = [int(v) for v in parts]
                else:
                    idx = [int(v) for v in os.path.basename(r.path).split(".")]
                nbytes = int(np.prod(csz)) * dtype.itemsize
                raw = _decode_chunk(bytes(r.content), comp_id, nbytes)
                block = np.frombuffer(raw, dtype=dtype).reshape(
                    csz, order=order)
                dims = [
                    min(c, s - i * c) for i, c, s in zip(idx, csz, shape)
                ]
                trimmed = block[tuple(slice(0, d) for d in dims)]
                rows.append(
                    {
                        "idx": idx,
                        "origin": [i * c for i, c in zip(idx, csz)],
                        "dims": dims,
                        "values": trimmed.astype(np.float64).ravel().tolist(),
                    }
                )
            yield pd.DataFrame(rows)

    return scan.mapInPandas(decode, schema=schema)


def zarr_hypercube_window(
    spark: SparkSession, path: str, window: list[tuple[int, int]]
) -> DataFrame:
    """N-D window read → long-form rows (d0, d1, ..., value) clipped
    to the window; only intersecting chunk files are read. The explode
    is per chunk (bounded batch), coordinates recovered from the
    row-major position with pure SQL arithmetic."""
    meta = _read_meta_any(path)
    rank = len(meta["shape"])
    chunks = read_zarr_chunks_nd(spark, path, window)
    ex = chunks.select(
        "origin", "dims", F.posexplode("values").alias("pos", "value")
    )
    # row-major index decomposition: stride of dim d = prod(dims[d+1:])
    cols = []
    for d in range(rank):
        stride = "1"
        for k in range(d + 1, rank):
            stride = f"{stride} * dims[{k}]"
        cols.append(
            F.expr(f"origin[{d}] + (pos DIV ({stride})) % dims[{d}]")
            .cast("int")
            .alias(f"d{d}")
        )
    out = ex.select(*cols, "value")
    cond = None
    for d, (off, sz) in enumerate(window):
        c = (F.col(f"d{d}") >= off) & (F.col(f"d{d}") < off + sz)
        cond = c if cond is None else (cond & c)
    return out.filter(cond)


def zarr_axis_stats(
    spark: SparkSession, path: str, axis: int = 0
) -> DataFrame:
    """Per-index statistics along one axis of a hypercube (e.g. a
    time-series mean over every (band, y, x) cell of each time step —
    ``GDALMDArray::GetStatistics`` per slice). Partial per-chunk
    reductions (NumPy inside the scan's mapInPandas shape) feed one
    small groupBy on the axis index — per-pixel rows never shuffle."""
    meta = _read_meta_any(path)
    rank = len(meta["shape"])
    if not 0 <= axis < rank:
        raise ValueError("axis out of range")
    chunks = read_zarr_chunks_nd(spark, path)

    import pandas as _pd

    def partials(it):
        for pdf in it:
            rows = []
            for r in pdf.itertuples():
                dims = [int(v) for v in r.dims]
                block = np.asarray(r.values, dtype=np.float64).reshape(dims)
                other = tuple(d for d in range(rank) if d != axis)
                s = block.sum(axis=other)
                mn = block.min(axis=other)
                mx = block.max(axis=other)
                n = int(np.prod([dims[d] for d in other])) if other else 1
                base = int(r.origin[axis])
                for k in range(dims[axis]):
                    rows.append(
                        {
                            "i": base + k,
                            "n": n,
                            "s": float(s[k]),
                            "mn": float(mn[k]),
                            "mx": float(mx[k]),
                        }
                    )
            yield _pd.DataFrame(rows)

    per = chunks.mapInPandas(
        partials, schema="i int, n long, s double, mn double, mx double"
    )
    return per.groupBy("i").agg(
        F.sum("n").cast("long").alias("count"),
        F.min("mn").alias("vmin"),
        F.max("mx").alias("vmax"),
        F.round(F.sum("s"), 6).alias("vsum"),
        F.round(F.sum("s") / F.sum("n"), 6).alias("mean"),
    )


def zarr_band_stats(spark: SparkSession, path: str) -> DataFrame:
    """gdalinfo -stats over a Zarr array (GDALMDArray.GetStatistics,
    ``gcore/multidim/gdal_multidim.h``): per-chunk partial aggregates
    combined by Spark — one row (count, vmin, vmax, vsum, mean).
    Map-side partials: no per-pixel rows ever shuffle."""
    chunks = read_zarr_chunks(spark, path)
    per = chunks.select(
        F.size("values").alias("n"),
        F.array_min("values").alias("mn"),
        F.array_max("values").alias("mx"),
        F.aggregate(
            "values", F.lit(0.0), lambda acc, x: acc + x
        ).alias("s"),
    )
    return per.agg(
        F.sum("n").cast("long").alias("count"),
        F.min("mn").alias("vmin"),
        F.max("mx").alias("vmax"),
        F.round(F.sum("s"), 6).alias("vsum"),
        F.round(F.sum("s") / F.sum("n"), 6).alias("mean"),
    )


def zarr_window_values(
    spark: SparkSession, path: str, window: tuple[int, int, int, int]
) -> DataFrame:
    """Window read → long-form (y, x, value) rows clipped to the
    window; only intersecting chunk files are ever read."""
    wy, wx, wh, ww = window
    chunks = read_zarr_chunks(spark, path, window)
    exploded = chunks.select(
        "y0",
        "x0",
        "w",
        F.posexplode("values").alias("pos", "value"),
    ).select(
        (F.col("y0") + F.expr("pos DIV w")).cast("int").alias("y"),
        (F.col("x0") + F.col("pos") % F.col("w")).cast("int").alias("x"),
        "value",
    )
    return exploded.filter(
        (F.col("y") >= wy)
        & (F.col("y") < wy + wh)
        & (F.col("x") >= wx)
        & (F.col("x") < wx + ww)
    )


def write_zarr_distributed(
    chunks: DataFrame,
    path: str,
    shape: tuple[int, int],
    chunk_shape: tuple[int, int],
    dtype: str = "<f8",
    compressor: str | None = "zlib",
    level: int = 1,
    fill_value=0,
) -> None:
    """Distributed Zarr v2 sink (the GDAL Zarr driver's write side,
    ``frmts/zarr/zarrarray.cpp``, as a Spark job).

    Zarr's one-file-per-chunk layout is what makes it a natural
    distributed sink: every executor writes its partition's chunk
    files straight to the store (object-store pattern — one PUT per
    chunk, no driver funnel, no shuffle), and the driver writes the
    tiny ``.zarray`` metadata document once.  Writes go through a
    temp-file + atomic rename so a re-run/resume can never leave a
    torn chunk (the tiler-manifest idempotency rule applied to the
    multidim model).

    ``chunks`` must carry ``cy, cx`` (chunk indices) and ``values``
    (row-major doubles, trimmed edge chunks allowed — padded back to
    full chunk size with ``fill_value`` per the Zarr spec's
    full-size-edge-chunk rule).
    """
    os.makedirs(path, exist_ok=True)
    dt = np.dtype(dtype)
    meta = {
        "zarr_format": 2,
        "shape": [int(shape[0]), int(shape[1])],
        "chunks": [int(chunk_shape[0]), int(chunk_shape[1])],
        "dtype": dt.str,
        "order": "C",
        "compressor": (
            {"id": "zlib", "level": int(level)} if compressor == "zlib" else None
        ),
        "fill_value": fill_value,
        "filters": None,
    }
    with open(os.path.join(path, ".zarray"), "w") as f:
        json.dump(meta, f)
    CY, CX = int(chunk_shape[0]), int(chunk_shape[1])
    H, W = int(shape[0]), int(shape[1])

    def write_partition(rows):
        for r in rows:
            i, j = int(r.cy), int(r.cx)
            block = np.full((CY, CX), fill_value, dtype=dt)
            h = min(CY, H - i * CY)
            w = min(CX, W - j * CX)
            vals = np.asarray(r.values, dtype=np.float64).reshape(h, w)
            block[:h, :w] = vals.astype(dt)
            raw = block.tobytes(order="C")
            if compressor == "zlib":
                raw = zlib.compress(raw, level)
            final = os.path.join(path, f"{i}.{j}")
            tmp = final + ".tmp"
            with open(tmp, "wb") as f:
                f.write(raw)
            os.replace(tmp, final)  # atomic: resume-safe

    chunks.foreachPartition(write_partition)
