"""PMTiles v3 codec — EXTERNAL ORACLE against the reference's vendored
spec implementation.

The strongest check in this file compiles the reference driver's
single-header C++ implementation (``ogr/ogrsf_frmts/pmtiles/pmtiles/
pmtiles.hpp`` — the format spec's canonical code) with the host g++
and asserts that (a) its ``zxy_to_tileid`` agrees with ours on every
tile through z4, and (b) it parses OUR archive's header and root
directory back to the exact entries we wrote. Skipped when the
reference tree or g++ is unavailable.
"""

from __future__ import annotations

import gzip
import os
import shutil
import subprocess
import tempfile

import pytest

from gdal_spark.sources import pmtiles as P

_HPP = "/root/reference/ogr/ogrsf_frmts/pmtiles/pmtiles/pmtiles.hpp"

_ORACLE_CPP = r"""
#include <cstdio>
#include <cstdint>
#include <fstream>
#include <sstream>
#include <string>
#include "pmtiles.hpp"
int main(int argc, char** argv) {
    if (argc >= 3) {
        std::ifstream h(argv[1], std::ios::binary);
        std::stringstream hs; hs << h.rdbuf();
        auto hdr = pmtiles::deserialize_header(hs.str().substr(0, 127));
        std::printf("H %llu %llu %llu %llu %llu %u %u %u %u\n",
            (unsigned long long)hdr.root_dir_offset,
            (unsigned long long)hdr.root_dir_bytes,
            (unsigned long long)hdr.tile_data_offset,
            (unsigned long long)hdr.tile_data_bytes,
            (unsigned long long)hdr.tile_entries_count,
            (unsigned)hdr.tile_type, (unsigned)hdr.min_zoom,
            (unsigned)hdr.max_zoom, (unsigned)hdr.tile_compression);
        std::ifstream d(argv[2], std::ios::binary);
        std::stringstream ds; ds << d.rdbuf();
        auto ents = pmtiles::deserialize_directory(ds.str());
        for (auto const& e : ents)
            std::printf("E %llu %llu %u %u\n",
                (unsigned long long)e.tile_id,
                (unsigned long long)e.offset, e.length, e.run_length);
    }
    for (uint32_t z = 0; z <= 4; z++)
        for (uint32_t x = 0; x < (1u << z); x++)
            for (uint32_t y = 0; y < (1u << z); y++)
                std::printf("T %u %u %u %llu\n", z, x, y,
                    (unsigned long long)pmtiles::zxy_to_tileid(z, x, y));
    return 0;
}
"""


@pytest.fixture(scope="module")
def oracle_bin():
    if not os.path.exists(_HPP) or shutil.which("g++") is None:
        pytest.skip("reference pmtiles.hpp or g++ unavailable")
    d = tempfile.mkdtemp(prefix="pmtiles_oracle_")
    src = os.path.join(d, "oracle.cpp")
    open(src, "w").write(_ORACLE_CPP)
    exe = os.path.join(d, "oracle")
    subprocess.run(
        ["g++", "-O1", "-std=c++17", f"-I{os.path.dirname(_HPP)}", src, "-o", exe],
        check=True,
        capture_output=True,
    )
    return exe


def test_tileid_roundtrip_and_level_offsets():
    assert P.zxy_to_tileid(0, 0, 0) == 0
    assert [P.zxy_to_tileid(1, x, y) for x, y in [(0, 0), (0, 1), (1, 1), (1, 0)]] == [1, 2, 3, 4]
    assert P.zxy_to_tileid(2, 0, 0) == 5
    for z in range(6):
        for x in range(1 << z):
            for y in range(1 << z):
                assert P.tileid_to_zxy(P.zxy_to_tileid(z, x, y)) == (z, x, y)


def test_tileid_matches_reference(oracle_bin):
    out = subprocess.run([oracle_bin], capture_output=True, text=True, check=True)
    for line in out.stdout.splitlines():
        if line.startswith("T "):
            _, z, x, y, tid = line.split()
            assert P.zxy_to_tileid(int(z), int(x), int(y)) == int(tid)


def test_directory_roundtrip():
    ents = [(1, 0, 10, 1), (2, 10, 7, 1), (9, 17, 3, 2), (40, 5, 9, 1)]
    assert P.deserialize_directory(P.serialize_directory(ents)) == ents


def test_archive_roundtrip_and_reference_parse(spark, tmp_path, oracle_bin):
    from gdal_spark.sources import mvt

    polys = spark.createDataFrame(
        [
            (1, 10.0, 40.0, 10.4, 40.3, "park"),
            (2, -74.3, 40.5, -73.8, 40.9, "urban"),
            (3, 139.5, 35.4, 140.1, 35.9, "water"),
        ],
        "poly_id long, lon_min double, lat_min double, lon_max double,"
        " lat_max double, category string",
    )
    tiles = mvt.build_mvt_tiles(polys, 6, tag_cols=("category",))
    path = str(tmp_path / "t.pmtiles")
    info = P.write_pmtiles(tiles, path, tile_type="mvt")
    assert info["entries"] >= 3

    # our reader round-trips content + TMS coordinates
    src = {(r.z, r.tx, r.ty): bytes(r.tile) for r in tiles.collect()}
    got = {(r.z, r.tx, r.ty): bytes(r.tile) for r in P.read_pmtiles(spark, path).collect()}
    assert src == got

    # the REFERENCE implementation parses our header + root directory
    h = P.read_header(path)
    with open(path, "rb") as f:
        f.seek(h["root_dir_offset"])
        raw = gzip.decompress(f.read(h["root_dir_bytes"]))
    dir_file = str(tmp_path / "dir.bin")
    open(dir_file, "wb").write(raw)
    out = subprocess.run(
        [oracle_bin, path, dir_file], capture_output=True, text=True, check=True
    )
    lines = out.stdout.splitlines()
    hline = next(l for l in lines if l.startswith("H "))
    _, rdo, rdb, tdo, tdb, nent, ttype, minz, maxz, tcomp = hline.split()
    assert int(rdo) == h["root_dir_offset"]
    assert int(rdb) == h["root_dir_bytes"]
    assert int(tdo) == h["tile_data_offset"]
    assert int(tdb) == h["tile_data_bytes"]
    assert int(nent) == info["entries"]
    assert int(ttype) == 1 and int(tcomp) == P.COMPRESSION_NONE
    assert (int(minz), int(maxz)) == (6, 6)
    ref_entries = [
        tuple(int(v) for v in l.split()[1:]) for l in lines if l.startswith("E ")
    ]
    ours = P.deserialize_directory(raw)
    assert ref_entries == ours


def test_leaf_directories_roundtrip(spark, tmp_path):
    """Writer splits into leaf directories past leaf_size; the
    leaf-aware reader reassembles every entry (the planet-scale
    layout: root -> leaf -> ranged tile read)."""
    rows = []
    z = 7
    for x in range(16):
        for y in range(16):
            rows.append((z, x, y, bytes([x, y]) * 3))
    tiles = spark.createDataFrame(rows, "z int, tx int, ty int, tile binary")
    path = str(tmp_path / "leafy.pmtiles")
    info = P.write_pmtiles(tiles, path, tile_type="unknown", leaf_size=50)
    assert info["leaf_bytes"] > 0
    ents = P.read_entries(path)
    assert len(ents) == 256
    got = {(r.z, r.tx, r.ty): bytes(r.tile) for r in P.read_pmtiles(spark, path).collect()}
    assert len(got) == 256
    assert got[(z, 3, 9)] == bytes([3, 9]) * 3  # TMS ty round-trips


def test_tile_job_pmtiles_sink(spark, sf_dir, tmp_path):
    """jobs/tile_job.py --pmtiles: the raster pyramid ships as one
    cloud-optimized archive; read back and spot-check a tile byte-for-
    byte against the cluster store."""
    import io
    import json as _json
    from contextlib import redirect_stdout

    from jobs.tile_job import main

    out = str(tmp_path / "tiles_out")
    arc = str(tmp_path / "pyramid.pmtiles")
    argv = [
        "--sf-dir", sf_dir, "--out", out,
        "--min-zoom", "11", "--max-zoom", "12",
        "--subset", "okey % 200 = 0",
        "--pmtiles", arc,
    ]
    buf = io.StringIO()
    with redirect_stdout(buf):
        assert main(argv) == 0
    stats = _json.loads(buf.getvalue().strip().splitlines()[-1])
    assert stats["pmtiles"]["entries"] == stats["n_tiles"]
    h = P.read_header(arc)
    assert (h["min_zoom"], h["max_zoom"]) == (11, 12)
    assert h["tile_type"] == P.TILE_TYPES["png"]
    store = {
        (r.z, r.tx, r.ty): bytes(r.tile)
        for r in spark.read.parquet(f"{out}/tiles").collect()
    }
    back = {
        (r.z, r.tx, r.ty): bytes(r.tile)
        for r in P.read_pmtiles(spark, arc).collect()
    }
    assert back == store


def test_read_gzip_tile_compression(spark, tmp_path):
    """Externally produced archives gzip their tiles (go-pmtiles default);
    read_pmtiles must honour header tile_compression."""
    import gzip

    blobs = {(1, 0, 0): b"tile-a" * 10, (1, 1, 0): b"tile-b" * 10}
    staged = sorted(
        (P.zxy_to_tileid(z, x, y), raw) for (z, x, y), raw in blobs.items()
    )
    data = bytearray()
    entries = []
    for tid, raw in staged:
        comp = gzip.compress(raw)
        entries.append((tid, len(data), len(comp), 1))
        data += comp
    root = gzip.compress(P.serialize_directory(entries))
    meta = gzip.compress(b"{}")
    root_off = P.HEADER_SIZE
    meta_off = root_off + len(root)
    data_off = meta_off + len(meta)
    header = P._pack_header(
        {
            "root_dir_offset": root_off,
            "root_dir_bytes": len(root),
            "json_metadata_offset": meta_off,
            "json_metadata_bytes": len(meta),
            "leaf_dirs_offset": data_off,
            "leaf_dirs_bytes": 0,
            "tile_data_offset": data_off,
            "tile_data_bytes": len(data),
            "addressed_tiles_count": len(entries),
            "tile_entries_count": len(entries),
            "tile_contents_count": len(entries),
            "internal_compression": P.COMPRESSION_GZIP,
            "tile_compression": P.COMPRESSION_GZIP,
            "min_zoom": 1,
            "max_zoom": 1,
        }
    )
    path = str(tmp_path / "gz.pmtiles")
    with open(path, "wb") as f:
        f.write(header + root + meta + bytes(data))
    got = {
        (r.z, r.tx, (1 << r.z) - 1 - r.ty): bytes(r.tile)
        for r in P.read_pmtiles(spark, path).collect()
    }
    assert got == blobs

    # brotli/zstd must raise, never return compressed bytes
    patched = bytearray(header)
    # tile_compression is the byte right after internal_compression;
    # locate it by re-packing with a sentinel
    h2 = P.read_header(path)
    assert h2["tile_compression"] == P.COMPRESSION_GZIP
    import struct as _s

    idx = header.index(bytes([P.COMPRESSION_GZIP, P.COMPRESSION_GZIP]))
    patched[idx + 1] = 4  # zstd
    path2 = str(tmp_path / "zstd.pmtiles")
    with open(path2, "wb") as f:
        f.write(bytes(patched) + root + meta + bytes(data))
    with pytest.raises(NotImplementedError):
        P.read_pmtiles(spark, path2)


def test_write_pmtiles_empty_raises(spark, tmp_path):
    empty = spark.createDataFrame([], "z int, tx int, ty int, tile binary")
    with pytest.raises(ValueError, match="no tiles"):
        P.write_pmtiles(empty, str(tmp_path / "e.pmtiles"))
