"""Zarr v2 source tests (gcore/multidim model, frmts/zarr encoding)."""

import numpy as np
import pytest

from gdal_spark.sources import zarr as Z


def make_arr(h=37, w=53):
    # deterministic, covers negative values and edge chunks
    y, x = np.mgrid[0:h, 0:w]
    return ((y * w + x) % 251 - 17).astype(np.int32)


def test_write_read_roundtrip(spark, tmp_path):
    arr = make_arr()
    p = str(tmp_path / "z1")
    Z.write_zarr(p, arr, chunks=(16, 16))
    rows = Z.zarr_window_values(spark, p, (0, 0, 37, 53)).collect()
    assert len(rows) == 37 * 53
    got = np.zeros_like(arr, dtype=np.float64)
    for r in rows:
        got[r.y, r.x] = r.value
    assert (got == arr).all()


def test_uncompressed_and_dtypes(spark, tmp_path):
    arr = (np.arange(100, dtype=np.float32).reshape(10, 10)) / 4.0
    p = str(tmp_path / "z2")
    Z.write_zarr(p, arr, chunks=(4, 4), compressor=None)
    stats = Z.zarr_band_stats(spark, p).collect()[0]
    assert stats["count"] == 100
    assert stats.vmin == 0.0 and stats.vmax == pytest.approx(99 / 4.0)
    assert stats.mean == pytest.approx(float(arr.mean()), abs=1e-6)


def test_window_prunes_chunk_files(spark, tmp_path):
    arr = make_arr(64, 64)
    p = str(tmp_path / "z3")
    Z.write_zarr(p, arr, chunks=(16, 16))  # 4x4 = 16 chunk files
    # window entirely inside chunk (1,1)..(2,2) → at most 4 files scanned
    df = Z.read_zarr_chunks(spark, p, window=(20, 20, 20, 20))
    chunk_rows = df.collect()
    assert len(chunk_rows) == 4
    assert {(r.cy, r.cx) for r in chunk_rows} == {(1, 1), (1, 2), (2, 1), (2, 2)}
    # window values correct
    vals = Z.zarr_window_values(spark, p, (20, 20, 20, 20)).collect()
    assert len(vals) == 400
    for r in vals[:50]:
        assert r.value == float(arr[r.y, r.x])


def test_edge_chunks_trimmed(spark, tmp_path):
    arr = make_arr(18, 18)  # chunks 16 → edge chunks 2 wide
    p = str(tmp_path / "z4")
    Z.write_zarr(p, arr, chunks=(16, 16), fill_value=-999)
    stats = Z.zarr_band_stats(spark, p).collect()[0]
    assert stats["count"] == 18 * 18
    assert stats.vmin == float(arr.min())  # fill padding never leaks


def test_unsupported_compressor_raises(tmp_path):
    import json
    import os

    p = str(tmp_path / "z5")
    os.makedirs(p)
    with open(os.path.join(p, ".zarray"), "w") as f:
        json.dump(
            {"zarr_format": 2, "shape": [4, 4], "chunks": [4, 4],
             "dtype": "<i4", "order": "C",
             "compressor": {"id": "blosc"}, "fill_value": 0}, f
        )
    with pytest.raises(NotImplementedError, match="blosc"):
        Z.read_zarray_meta(p)


def test_distributed_zarr_writer_roundtrip(spark, tmp_path):
    """read → transform → distributed write → read back; atomic-rename
    resume safety and edge-chunk padding included."""
    import numpy as np
    from pyspark.sql import functions as F

    from gdal_spark.sources.zarr import (
        read_zarr_chunks,
        write_zarr,
        write_zarr_distributed,
    )

    rng = np.random.default_rng(17)
    arr = (rng.random((70, 53)) * 100).astype("<f8")  # non-divisible by chunks
    src = str(tmp_path / "src.zarr")
    dst = str(tmp_path / "dst.zarr")
    write_zarr(src, arr, chunks=(32, 16))

    chunks = read_zarr_chunks(spark, src)
    doubled = chunks.withColumn(
        "values", F.transform("values", lambda v: v * F.lit(2.0))
    )
    write_zarr_distributed(
        doubled, dst, shape=arr.shape, chunk_shape=(32, 16), dtype="<f8"
    )

    back = read_zarr_chunks(spark, dst).collect()
    out = np.zeros_like(arr)
    for r in back:
        out[r.y0 : r.y0 + r.h, r.x0 : r.x0 + r.w] = np.asarray(r.values).reshape(
            r.h, r.w
        )
    assert np.array_equal(out, arr * 2.0)

    # window read on the written store still prunes to the right values
    win = read_zarr_chunks(spark, dst, window=(40, 20, 10, 10)).collect()
    assert all(r.y0 + r.h > 32 for r in win)  # only bottom chunk rows listed

    # re-write is idempotent (atomic replace, same bytes)
    write_zarr_distributed(
        doubled, dst, shape=arr.shape, chunk_shape=(32, 16), dtype="<f8"
    )
    back2 = read_zarr_chunks(spark, dst).collect()
    out2 = np.zeros_like(arr)
    for r in back2:
        out2[r.y0 : r.y0 + r.h, r.x0 : r.x0 + r.w] = np.asarray(r.values).reshape(
            r.h, r.w
        )
    assert np.array_equal(out2, arr * 2.0)
