"""gdalmdimtranslate analogue: window + transpose + re-chunk between
multidim stores, verified against NumPy ground truth."""

import numpy as np
import pytest

from gdal_spark.sources import mdim, netcdf as NC, zarr as Z


def _cube(shape):
    idx = np.meshgrid(*[np.arange(s) for s in shape], indexing="ij")
    return (sum(c * i for c, i in zip([5, 2, 1], idx)) % 89).astype(np.float64)


@pytest.fixture()
def nc_store(tmp_path):
    arr = _cube((8, 12, 14))
    p = str(tmp_path / "src.nc")
    NC.write_netcdf(
        p, {"t": None, "y": 12, "x": 14}, {"temp": (["t", "y", "x"], arr)}
    )
    return p, arr


def _read_back(spark, path):
    meta = Z.read_zarray_meta_nd(path)
    shape = meta["shape"]
    rows = Z.zarr_hypercube_window(
        spark, path, [(0, s) for s in shape]
    ).collect()
    out = np.full(shape, np.nan)
    for r in rows:
        out[tuple(r[f"d{d}"] for d in range(len(shape)))] = r.value
    return out


def test_netcdf_to_zarr_window_transpose(spark, tmp_path, nc_store):
    p, arr = nc_store
    win = [(1, 5), (2, 8), (3, 10)]
    dst = str(tmp_path / "dst.zarr")
    res = mdim.mdim_translate_netcdf_to_zarr(
        spark, p, "temp", win, [2, 0, 1], dst, (4, 2, 3)
    )
    exp = arr[1:6, 2:10, 3:13].transpose(2, 0, 1)  # (10, 5, 8)
    assert res["shape"] == exp.shape
    assert res["n_chunks_written"] == 3 * 3 * 3  # ceil(10/4)*ceil(5/2)*ceil(8/3)
    got = _read_back(spark, dst)
    np.testing.assert_array_equal(got, exp)


def test_identity_full(spark, tmp_path, nc_store):
    p, arr = nc_store
    dst = str(tmp_path / "idt.zarr")
    mdim.mdim_translate_netcdf_to_zarr(
        spark, p, "temp", [(0, 8), (0, 12), (0, 14)], [0, 1, 2], dst, (8, 12, 14)
    )
    np.testing.assert_array_equal(_read_back(spark, dst), arr)


def test_zarr_to_zarr_rechunk(spark, tmp_path):
    arr = _cube((6, 10, 9))
    src = str(tmp_path / "src.zarr")
    Z.write_zarr_nd(src, arr, (2, 4, 4))
    win = [(0, 6), (1, 8), (2, 7)]
    blocks = Z.read_zarr_chunks_nd(spark, src, win)
    dst = str(tmp_path / "re.zarr")
    mdim.mdim_translate(spark, blocks, win, [1, 2, 0], dst, (5, 4, 3))
    exp = arr[0:6, 1:9, 2:9].transpose(1, 2, 0)
    np.testing.assert_array_equal(_read_back(spark, dst), exp)


def test_rerun_idempotent(spark, tmp_path, nc_store):
    p, arr = nc_store
    dst = str(tmp_path / "rr.zarr")
    for _ in range(2):
        mdim.mdim_translate_netcdf_to_zarr(
            spark, p, "temp", [(2, 3), (0, 12), (0, 14)], [0, 1, 2], dst, (2, 6, 7)
        )
    np.testing.assert_array_equal(_read_back(spark, dst), arr[2:5])


def test_bad_transpose(spark, tmp_path, nc_store):
    p, _ = nc_store
    blocks = NC.read_netcdf_slabs(spark, p, "temp")
    with pytest.raises(ValueError, match="permutation"):
        mdim.mdim_translate(
            spark, blocks, [(0, 8), (0, 12), (0, 14)], [0, 0, 2],
            str(tmp_path / "bad.zarr"), (2, 2, 2),
        )
