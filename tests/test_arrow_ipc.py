"""Arrow IPC stream export/import (OGRLayer::GetArrowStream parity).

Reference: ``ogr/ogrsf_frmts/generic/ogrlayerarrow.cpp`` (batch 65,536,
WKB geometry columns); perf surface ``perftests/ogr2ogr_arrow.py``.
"""

import os
import tempfile

import pyarrow as pa

from gdal_spark.functions import geometry as G
from gdal_spark.sources import arrow_ipc as A


def test_roundtrip_bit_exact(spark):
    rows = [(G.wkb_point(i * 0.1 - 5.0, i * 0.7), i, f"r{i}", i / 7.0)
            for i in range(1000)]
    df = spark.createDataFrame(rows, "geom binary, k long, s string, v double")
    path = tempfile.mkdtemp(prefix="arrows_")
    manifest = A.write_arrow_stream(df.repartition(6), path)
    assert sum(m["rows"] for m in manifest) == 1000
    assert len(manifest) > 1  # distributed: one file per partition

    back = A.read_arrow_stream(spark, path)
    got = {r.k: r for r in back.collect()}
    assert len(got) == 1000
    assert bytes(got[421].geom) == G.wkb_point(421 * 0.1 - 5.0, 421 * 0.7)
    assert got[421].v == 421 / 7.0 and got[421].s == "r421"


def test_batch_cap_matches_reference(spark):
    df = spark.createDataFrame(
        [(i,) for i in range(5000)], "k long").coalesce(1)
    path = tempfile.mkdtemp(prefix="arrows_")
    A.write_arrow_stream(df, path, batch_rows=1024)
    fn = os.path.join(path, sorted(os.listdir(path))[0])
    with open(fn, "rb") as f:
        sizes = [b.num_rows for b in pa.ipc.open_stream(f)]
    assert max(sizes) <= 1024 and sum(sizes) == 5000


def test_stream_files_are_valid_arrow(spark):
    df = spark.createDataFrame([(G.wkb_point(1.0, 2.0), "a")],
                               "geom binary, name string")
    path = tempfile.mkdtemp(prefix="arrows_")
    A.write_arrow_stream(df, path)
    files = [f for f in os.listdir(path) if f.endswith(".arrows")]
    assert files
    with open(os.path.join(path, files[0]), "rb") as f:
        tbl = pa.ipc.open_stream(f).read_all()
    assert tbl.column_names == ["geom", "name"]
    assert bytes(tbl["geom"][0].as_py()) == G.wkb_point(1.0, 2.0)
