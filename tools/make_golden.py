"""Golden-row generator for the raster queries (the non-SQL ops).

Mirrors the reference's own golden-checksum test method
(``alg/gdalchecksum.cpp:48``, ``autotest/utilities/test_gdal_translate.py:52``):
every raster query's expected output rows are precomputed HERE by a
single-process, Spark-free driver loop over plain pyarrow/NumPy —
reusing the in-repo pixel kernels (codec/checksum/dem/warp/resample)
but none of the distribution machinery — and written to
``golden/<sf>/<query>.parquet``.  ``__spark_entry__.oracle_sql`` then
points DuckDB at these files, so the driver's rows+schema+value-hash
gate covers the raster queries too: a distributed run must reproduce
the single-process reference bit-for-bit (checksums, stats, PSNR).

What this independently checks: partitioning, Arrow batching, shuffle,
compose grouping, and resume logic cannot change any pixel or any
row — the exact property GDAL's autotest checksums pin down.

Usage: python tools/make_golden.py [sf_dir ...]
  default: /root/testdata/sf0.01 and /root/testdata/sf0.001
"""

from __future__ import annotations

import os
import sys

import numpy as np
import pyarrow as pa
import pyarrow.parquet as pq

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from gdal_spark.functions import geometry as G  # noqa: E402
from gdal_spark.functions import tile_math as tm  # noqa: E402
from gdal_spark.raster import codec  # noqa: E402
from gdal_spark.raster import dem  # noqa: E402
from gdal_spark.raster.checksum import checksum_band, checksum_bands  # noqa: E402
from gdal_spark.raster.composite import default_palette  # noqa: E402
from gdal_spark.raster.rasterize import reclassify_expr  # noqa: E402
from gdal_spark.raster.resample import block_reduce, resize_nearest  # noqa: E402
from gdal_spark.raster.warp import _sample_bilinear, warp_lonlat_to_merc_tile  # noqa: E402
from gdal_spark.sources import synth  # noqa: E402

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))

W_CYCLE = [64, 128, 256, 512]
H_CYCLE = [128, 64, 512, 256]
FMT_CYCLE = ["png", "jpeg", "webp"]


# ---------------------------------------------------------------------------
# single-process mirrors of the synthetic layers (same IEEE op order)
# ---------------------------------------------------------------------------


def footprint(okey: int) -> dict:
    """Python mirror of synth.FOOT_LON_SQL/FOOT_LAT_SQL + w/h/fmt cycles."""
    lon = -179.5 + ((okey * synth.LON_MUL) % 359000) / 1000.0
    lat = -84.5 + ((okey * synth.LAT_MUL) % 169000) / 1000.0
    return {
        "okey": okey,
        "image_id": f"img{okey:012d}",
        "lon": lon,
        "lat": lat,
        "lon_min": lon - 0.005,
        "lat_min": lat - 0.005,
        "lon_max": lon + 0.005,
        "lat_max": lat + 0.005,
        "w": W_CYCLE[okey % 4],
        "h": H_CYCLE[okey % 4],
        "fmt": FMT_CYCLE[okey % 3],
    }


def decoded_pixels(fp: dict) -> np.ndarray:
    """Exactly what the Spark pipeline sees: synth → encode(fmt) →
    decode. The lossy stub round-trip is part of the semantics."""
    arr = synth.synth_pixels(fp["image_id"], fp["w"], fp["h"])
    return codec.decode_image(codec.encode_image(arr, fp["fmt"], compress_level=1))


def order_keys(sf_dir: str) -> list[int]:
    t = pq.read_table(f"{sf_dir}/orders.parquet", columns=["o_orderkey"])
    return sorted(int(v) for v in t.column("o_orderkey").to_pylist())


def aoi_rows(sf_dir: str) -> list[dict]:
    t = pq.read_table(f"{sf_dir}/nation.parquet", columns=["n_nationkey"])
    out = []
    for nk in sorted(int(v) for v in t.column("n_nationkey").to_pylist()):
        x0, y0, x1, y1 = synth.aoi_sql_bounds(nk)
        out.append(
            {
                "poly_id": nk,
                "lon_min": x0,
                "lat_min": y0,
                "lon_max": x1,
                "lat_max": y1,
                "wkb": G.wkb_bbox_polygon(x0, y0, x1, y1),
                "burn": float(nk % 200 + 30),
            }
        )
    return out


# ---------------------------------------------------------------------------
# per-query golden builders → (pyarrow schema, rows)
# ---------------------------------------------------------------------------

I32, I64, F64, STR, BOOL = pa.int32(), pa.int64(), pa.float64(), pa.string(), pa.bool_()


def g_raster_checksums(sf_dir):
    rows = []
    for okey in order_keys(sf_dir):
        if okey % 20:
            continue
        fp = footprint(okey)
        cs = checksum_bands(decoded_pixels(fp))
        rows.append(
            (fp["image_id"], fp["fmt"], fp["w"], fp["h"], cs[0],
             cs[1] if len(cs) > 1 else cs[0], cs[2] if len(cs) > 2 else cs[0])
        )
    schema = pa.schema(
        [("image_id", STR), ("fmt", STR), ("w", I32), ("h", I32),
         ("checksum_b0", I32), ("checksum_b1", I32), ("checksum_b2", I32)]
    )
    return schema, rows


def g_raster_translate(sf_dir):
    rows = []
    for okey in order_keys(sf_dir):
        if okey % 100:
            continue
        fp = footprint(okey)
        arr = decoded_pixels(fp)[0:48, 0:48]
        arr = np.clip(arr.astype(np.float64) * 0.5 + 10.0, 0, 255)
        arr = np.floor(arr + 0.5).astype(np.uint8)
        rt = codec.decode_image(codec.encode_image(arr, "png"))
        rows.append((fp["image_id"], rt.shape[1], rt.shape[0], checksum_bands(rt)[0]))
    schema = pa.schema(
        [("image_id", STR), ("w", I32), ("h", I32), ("checksum_b0", I32)]
    )
    return schema, rows


def g_raster_resample_kernels(sf_dir):
    from gdal_spark.raster.resample import resample

    algs = ("near", "bilinear", "cubic", "cubicspline", "lanczos", "gauss", "average")
    rows = []
    for okey in order_keys(sf_dir):
        if okey % 200:
            continue
        fp = footprint(okey)
        arr = decoded_pixels(fp)
        for alg in algs:
            out = resample(arr, 32, 32, alg)
            rows.append((fp["image_id"], alg, 32, 32, checksum_bands(out)[0]))
    schema = pa.schema(
        [("image_id", STR), ("alg", STR), ("w", I32), ("h", I32), ("checksum_b0", I32)]
    )
    return schema, rows


def g_raster_as_features(sf_dir):
    rows = []
    for okey in order_keys(sf_dir):
        if okey % 500:
            continue
        fp = footprint(okey)
        arr = decoded_pixels(fp)
        b = (arr[:, :, 0] if arr.ndim == 3 else arr)[::64, ::64]
        h, w = b.shape
        for rr in range(h):
            for cc in range(w):
                rows.append((fp["image_id"], rr * 64, cc * 64, int(b[rr, cc])))
    schema = pa.schema(
        [("image_id", STR), ("row", I32), ("col", I32), ("value", I32)]
    )
    return schema, rows


def g_raster_band_stats(sf_dir):
    rows = []
    for okey in order_keys(sf_dir):
        if okey % 100:
            continue
        fp = footprint(okey)
        arr = decoded_pixels(fp)
        b = arr[:, :, 0] if arr.ndim == 3 else arr
        rows.append(
            (fp["image_id"], int(b.min()), int(b.max()), float(b.mean()), float(b.std()))
        )
    schema = pa.schema(
        [("image_id", STR), ("min_v", I32), ("max_v", I32),
         ("mean_v", F64), ("std_v", F64)]
    )
    return schema, rows


def g_raster_interp_at_points(sf_dir):
    keys = [k for k in order_keys(sf_dir) if k % 500 == 0]
    fps = [footprint(k) for k in keys]
    rows = []
    for pt in fps:  # each footprint center is a query point (pt_id = okey)
        for img in fps:
            if not (
                img["lon_min"] <= pt["lon"] < img["lon_max"]
                and img["lat_min"] <= pt["lat"] < img["lat_max"]
            ):
                continue
            arr = decoded_pixels(img)
            b = arr[:, :, 0] if arr.ndim == 3 else arr
            h, w = b.shape
            sx = np.array([(pt["lon"] - img["lon_min"]) / (img["lon_max"] - img["lon_min"]) * w])
            sy = np.array([(img["lat_max"] - pt["lat"]) / (img["lat_max"] - img["lat_min"]) * h])
            v, _ = _sample_bilinear(b, sx, sy)
            rows.append((pt["okey"], img["image_id"], round(float(v[0]), 4)))
    schema = pa.schema([("pt_id", I64), ("image_id", STR), ("value", F64)])
    return schema, rows


def g_rasterize_burn(sf_dir, zoom=4, tile_size=256):
    m = tm.GlobalMercator(tile_size)
    from gdal_spark.raster.warp import merc_to_lat, merc_to_lon

    tiles: dict[tuple[int, int], list[dict]] = {}
    for a in aoi_rows(sf_dir):
        tx0, ty0 = m.LatLonToTile(a["lat_min"], a["lon_min"], zoom)
        tx1, ty1 = m.LatLonToTile(a["lat_max"], a["lon_max"], zoom)
        for tx in range(tx0, tx1 + 1):
            for ty in range(ty0, ty1 + 1):
                tiles.setdefault((tx, ty), []).append(a)
    rows = []
    for (tx, ty), polys in sorted(tiles.items()):
        minx, miny, maxx, maxy = m.TileBounds(tx, ty, zoom)
        res = (maxx - minx) / tile_size
        mx = minx + (np.arange(tile_size) + 0.5) * res
        my = maxy - (np.arange(tile_size) + 0.5) * res
        lon = merc_to_lon(mx)
        lat = merc_to_lat(my)
        glon = np.broadcast_to(lon[None, :], (tile_size, tile_size)).ravel()
        glat = np.broadcast_to(lat[:, None], (tile_size, tile_size)).ravel()
        canvas = np.zeros(tile_size * tile_size, dtype=np.float64)
        for p in polys:
            g = G.parse_wkb(p["wkb"])
            inside = G.points_in_rings(glon, glat, g.rings)
            canvas[inside] = np.maximum(canvas[inside], p["burn"])
        arr = np.clip(canvas, 0, 255).reshape(tile_size, tile_size).astype(np.uint8)
        rows.append(
            (zoom, tx, (1 << zoom) - 1 - ty, checksum_band(arr),
             int((arr > 0).sum()), len(polys))
        )
    schema = pa.schema(
        [("z", I32), ("x", I32), ("y", I32), ("checksum", I32),
         ("n_burned_px", I64), ("n_polys", I32)]
    )
    return schema, rows


def g_raster_reclassify(sf_dir):
    lut = reclassify_expr([(0, 63, 0), (64, 191, 128), (192, 255, 255)])
    rows = []
    for okey in order_keys(sf_dir):
        if okey % 200:
            continue
        fp = footprint(okey)
        arr = decoded_pixels(fp)
        b = arr[:, :, 0] if arr.ndim == 3 else arr
        out = lut[b]
        rows.append(
            (fp["image_id"], checksum_band(b), checksum_band(out), int((out != b).sum()))
        )
    schema = pa.schema(
        [("image_id", STR), ("checksum_before", I32), ("checksum_after", I32),
         ("n_changed", I64)]
    )
    return schema, rows


def g_raster_band_calc(sf_dir):
    rows = []
    for okey in order_keys(sf_dir):
        if okey % 200:
            continue
        fp = footprint(okey)
        arr = decoded_pixels(fp)
        if arr.ndim == 2:
            arr = arr[:, :, None]
        x1 = arr[:, :, 0].astype(np.float64)
        x2 = arr[:, :, 1].astype(np.float64) if arr.shape[2] > 1 else x1
        x3 = arr[:, :, 2].astype(np.float64) if arr.shape[2] > 2 else x1
        out = np.clip((x1 + x2) / 2 + np.sqrt(x3), 0, 255)
        out = np.clip(np.floor(out + 0.5), 0, 255).astype(np.uint8)
        rows.append((fp["image_id"], out.shape[1], out.shape[0], checksum_bands(out)[0]))
    schema = pa.schema(
        [("image_id", STR), ("w", I32), ("h", I32), ("checksum", I32)]
    )
    return schema, rows


def g_raster_dem_metrics(sf_dir):
    ops = ("slope", "hillshade", "roughness", "tpi", "tri", "aspect", "hillshade_combined", "hillshade_md", "hillshade_igor")
    rows = []
    for okey in order_keys(sf_dir):
        if okey % 200:
            continue
        fp = footprint(okey)
        arr = decoded_pixels(fp)
        z = (arr[:, :, 0] if arr.ndim == 3 else arr).astype(np.float64)
        vals = [fp["image_id"]]
        for op in ops:
            out = dem._DEM_FUNCS[op](z)
            if out.dtype != np.uint8:
                out = np.clip(np.floor(np.abs(out) + 0.5), 0, 255).astype(np.uint8)
            vals.append(checksum_band(out))
        rows.append(tuple(vals))
    schema = pa.schema([("image_id", STR)] + [(f"cs_{op}", I32) for op in ops])
    return schema, rows


def g_raster_color_map(sf_dir):
    pal = default_palette()
    rows = []
    for okey in order_keys(sf_dir):
        if okey % 200:
            continue
        fp = footprint(okey)
        arr = decoded_pixels(fp)
        b = arr[:, :, 0] if arr.ndim == 3 else arr
        rgb = pal[b]
        rows.append(
            (fp["image_id"], checksum_band(rgb[:, :, 0]),
             checksum_band(rgb[:, :, 1]), checksum_band(rgb[:, :, 2]))
        )
    schema = pa.schema(
        [("image_id", STR), ("cs_r", I32), ("cs_g", I32), ("cs_b", I32)]
    )
    return schema, rows


def g_raster_blend(sf_dir, alpha=0.5):
    groups: dict[int, list[dict]] = {}
    for okey in order_keys(sf_dir):
        if okey % 100:
            continue
        fp = footprint(okey)
        groups.setdefault((okey // 100) % 50, []).append(fp)
    rows = []
    for pid, fps in sorted(groups.items()):
        fps = sorted(fps, key=lambda f: f["image_id"])
        arrs = [decoded_pixels(f) for f in fps]
        base = arrs[0][:, :, 0] if arrs[0].ndim == 3 else arrs[0]
        acc = base.astype(np.float64) * alpha
        others = arrs[1:]
        if others:
            w_each = (1.0 - alpha) / len(others)
            for a in others:
                gg = a[:, :, 0] if a.ndim == 3 else a
                if gg.shape != base.shape:
                    gg = resize_nearest(gg, base.shape[0], base.shape[1])
                acc += gg.astype(np.float64) * w_each
        out = np.clip(np.floor(acc + 0.5), 0, 255).astype(np.uint8)
        rows.append((pid, checksum_band(out), out.shape[1], out.shape[0], len(fps)))
    schema = pa.schema(
        [("pair_id", I64), ("checksum", I32), ("w", I32), ("h", I32),
         ("n_members", I32)]
    )
    return schema, rows


def g_raster_psnr_gate(sf_dir, min_db=40.0):
    rows = []
    for okey in order_keys(sf_dir):
        if okey % 50:
            continue
        fp = footprint(okey)
        arr = decoded_pixels(fp)
        rt = codec.decode_image(codec.encode_image(arr, fp["fmt"], 1), fp["fmt"])
        if fp["fmt"] in ("png", "webp"):
            exact = rt.shape == arr.shape and bool((rt == arr).all())
            rows.append((fp["image_id"], fp["fmt"], exact, float("inf"), exact))
        else:
            p = round(codec.psnr(arr, rt), 2)
            rows.append((fp["image_id"], fp["fmt"], False, p, bool(p >= min_db)))
    schema = pa.schema(
        [("image_id", STR), ("fmt", STR), ("lossless_exact", BOOL),
         ("psnr_db", F64), ("ok", BOOL)]
    )
    return schema, rows


def g_jpeg_progressive(sf_dir, min_db=25.0):
    from gdal_spark.raster import jpeg

    rows = []
    for okey in order_keys(sf_dir):
        if okey % 101:
            continue
        fp = footprint(okey)
        arr = decoded_pixels(fp)
        sub = "420" if okey % 3 == 0 else "444"
        q = 85 if okey % 2 else 95
        bp = jpeg.encode_progressive(arr, q, subsampling=sub)
        bb = jpeg.encode(arr, q, subsampling=sub)
        dp = jpeg.decode(bp)
        db = jpeg.decode(bb)
        match = dp.shape == db.shape and bool((dp == db).all())
        p = round(codec.psnr(arr, dp), 2)
        rows.append(
            (fp["image_id"], fp["w"], fp["h"], sub, q, len(bp), match, p,
             bool(match and p >= min_db))
        )
    schema = pa.schema(
        [("image_id", STR), ("w", I32), ("h", I32), ("subsampling", STR),
         ("quality", I32), ("prog_len", I64), ("match_baseline", BOOL),
         ("psnr_db", F64), ("ok", BOOL)]
    )
    return schema, rows


def g_webp_lz77(sf_dir):
    from gdal_spark.raster import webp

    rows = []
    for okey in order_keys(sf_dir):
        if okey % 103:
            continue
        fp = footprint(okey)
        arr = decoded_pixels(fp)
        post = ((arr >> 5) << 5).astype(np.uint8)
        cb = (0, 4, 8)[okey % 3]
        upc = okey % 2 == 0
        blz = webp.encode_lz77(post, cache_bits=cb, use_plane_codes=upc)
        blit = webp.encode(post)
        out = webp.decode(blz)
        exact = out.shape == post.shape and bool((out == post).all())
        rows.append(
            (fp["image_id"], fp["w"], fp["h"], cb, upc, len(blz), len(blit),
             exact, len(blz) < len(blit), exact)
        )
    schema = pa.schema(
        [("image_id", STR), ("w", I32), ("h", I32), ("cache_bits", I32),
         ("plane_codes", BOOL), ("lz77_len", I64), ("literal_len", I64),
         ("lossless_exact", BOOL), ("smaller", BOOL), ("ok", BOOL)]
    )
    return schema, rows


def g_webp_lossy(sf_dir, min_db=40.0):
    from gdal_spark.native.webp_lib import encode_rgb
    from gdal_spark.raster import webp as W
    from gdal_spark.raster.composite import _box_smooth

    rows = []
    for okey in order_keys(sf_dir):
        if okey % 107:
            continue
        fp = footprint(okey)
        arr = _box_smooth(decoded_pixels(fp))
        q = 85 if okey % 2 else 95
        blob = encode_rgb(arr, float(q))
        out = W.decode(blob)
        p = round(codec.psnr(arr, out), 2)
        rows.append(
            (fp["image_id"], fp["w"], fp["h"], q, len(blob), p,
             bool(p >= min_db))
        )
    schema = pa.schema(
        [("image_id", STR), ("w", I32), ("h", I32), ("quality", I32),
         ("vp8_len", I64), ("psnr_db", F64), ("ok", BOOL)]
    )
    return schema, rows


def _phash_clusters(sf_dir):
    clusters: dict[int, list[str]] = {}
    for okey in order_keys(sf_dir):
        if okey % 20:
            continue
        fp = footprint(okey)
        # phash is computed on the ORIGINAL pixels (before the codec
        # round trip), exactly as sources/synth.images does
        ph = synth.phash64(synth.synth_pixels(fp["image_id"], fp["w"], fp["h"]))
        clusters.setdefault(ph, []).append(fp["image_id"])
    return clusters


def g_grid_tin(sf_dir):
    from gdal_spark.operators.tin import tin_interpolate_grid

    GRID_NX, GRID_NY = 73, 37
    BOUNDS = (-180.0, -85.0, 180.0, 85.0)
    t = pq.read_table(f"{sf_dir}/supplier.parquet", columns=["s_suppkey", "s_acctbal"])
    pts = []
    for k, v in zip(t.column(0).to_pylist(), t.column(1).to_pylist()):
        k = int(k)
        lon = -180.0 + ((k * synth.SITE_LON_MUL) % 360000) / 1000.0
        lat = -85.0 + ((k * synth.SITE_LAT_MUL) % 170000) / 1000.0
        pts.append((lon, lat, float(v)))
    pts.sort()  # mirrors grid_linear's (x, y, v) order normalization
    sites = np.array([(x, y) for x, y, _ in pts])
    vals = np.array([v for _, _, v in pts])
    gx, gy, out = tin_interpolate_grid(sites, vals, BOUNDS, GRID_NX, GRID_NY)
    rows = [(int(a), int(b), round(float(c), 6)) for a, b, c in zip(gx, gy, out)]
    schema = pa.schema([("gx", I32), ("gy", I32), ("value", F64)])
    return schema, rows


def g_image_phash_dedup(sf_dir):
    rows = [
        (ph, min(ids), len(ids)) for ph, ids in sorted(_phash_clusters(sf_dir).items())
    ]
    schema = pa.schema([("phash", I64), ("keep_id", STR), ("n", I64)])
    return schema, rows


def g_image_phash_neardup(sf_dir, max_hamming=3):
    cl = _phash_clusters(sf_dir)
    sigs = sorted(cl)
    rows = []
    for i, a in enumerate(sigs):
        for b in sigs[i + 1 :]:
            h = bin((a ^ b) & 0xFFFFFFFFFFFFFFFF).count("1")
            if h <= max_hamming:
                rows.append((a, b, h, min(cl[a]), min(cl[b]), len(cl[a]), len(cl[b])))
    schema = pa.schema(
        [("sig_a", I64), ("sig_b", I64), ("hamming", I32), ("keep_a", STR),
         ("keep_b", STR), ("n_a", I64), ("n_b", I64)]
    )
    return schema, rows


def g_raster_warp_lcc(sf_dir, out_w=64, out_h=64):
    """Single-process mirror of pipeline.warp_to_crs(EPSG:2154) over
    the Lambert-93 service-box images (same float-exact box filter:
    footprint lon/lat are integer-millidegree grid points, so the
    Python and Spark doubles are identical)."""
    from gdal_spark.functions import srs as S
    from gdal_spark.raster.warp import warp_lonlat_to_grid

    rows = []
    for okey in order_keys(sf_dir):
        fp = footprint(okey)
        if not (-4.0 <= fp["lon"] < 9.0 and 41.0 <= fp["lat"] < 51.0):
            continue
        arr = decoded_pixels(fp)
        ce, cn = S.transform_np(
            [fp["lon_min"], fp["lon_max"], fp["lon_min"], fp["lon_max"]],
            [fp["lat_min"], fp["lat_min"], fp["lat_max"], fp["lat_max"]],
            4326, 2154,
        )
        bounds = (float(ce.min()), float(cn.min()), float(ce.max()), float(cn.max()))
        out, _ = warp_lonlat_to_grid(
            arr, fp["lon_min"], fp["lat_min"], fp["lon_max"], fp["lat_max"],
            bounds, 2154, out_w, out_h, "near",
        )
        b = out[:, :, 0] if out.ndim == 3 else out
        rows.append((fp["image_id"], 2154, out_w, out_h, checksum_band(b)))
    schema = pa.schema(
        [("image_id", STR), ("epsg", I32), ("w", I32), ("h", I32), ("checksum", I32)]
    )
    return schema, rows


def g_raster_warp_utm(sf_dir, out_w=64, out_h=64):
    from gdal_spark.functions import srs as S
    from gdal_spark.raster.warp import warp_lonlat_to_grid

    rows = []
    for okey in order_keys(sf_dir):
        if okey % 200:
            continue
        fp = footprint(okey)
        arr = decoded_pixels(fp)
        zone = int((fp["lon"] + 180.0) // 6) + 1
        south = fp["lat"] < 0
        epsg = (32700 if south else 32600) + zone
        ce, cn = S.utm_forward_np(
            [fp["lon_min"], fp["lon_max"], fp["lon_min"], fp["lon_max"]],
            [fp["lat_min"], fp["lat_min"], fp["lat_max"], fp["lat_max"]],
            zone, south,
        )
        bounds = (float(ce.min()), float(cn.min()), float(ce.max()), float(cn.max()))
        out, _ = warp_lonlat_to_grid(
            arr, fp["lon_min"], fp["lat_min"], fp["lon_max"], fp["lat_max"],
            bounds, epsg, out_w, out_h, "near",
        )
        b = out[:, :, 0] if out.ndim == 3 else out
        rows.append((fp["image_id"], epsg, out_w, out_h, checksum_band(b)))
    schema = pa.schema(
        [("image_id", STR), ("epsg", I32), ("w", I32), ("h", I32), ("checksum", I32)]
    )
    return schema, rows


def g_raster_warp_gcp(sf_dir, out_w=64, out_h=64):
    from gdal_spark.raster.pipeline import synth_gcps, warp_gcp_array

    rows = []
    for okey in order_keys(sf_dir):
        if okey % 200:
            continue
        fp = footprint(okey)
        arr = decoded_pixels(fp)
        gcps = synth_gcps(
            okey, fp["w"], fp["h"], fp["lon_min"], fp["lat_min"],
            fp["lon_max"], fp["lat_max"],
        )
        for m in ("poly1", "poly2", "tps"):
            out, _, rms = warp_gcp_array(arr, gcps, m, out_w, out_h, "bilinear")
            b = out[:, :, 0] if out.ndim == 3 else out
            # integer nano-degrees: raw rms doubles diverge ~1e-14
            # between BLAS contexts (see pipeline.warp_with_gcps)
            rows.append(
                (fp["image_id"], m, out_w, out_h, checksum_band(b), round(rms * 1e9))
            )
    schema = pa.schema(
        [("image_id", STR), ("method", STR), ("w", I32), ("h", I32),
         ("checksum", I32), ("rms_ndeg", I64)]
    )
    return schema, rows


def g_raster_warp_geoloc(sf_dir, out_w=64, out_h=64):
    from gdal_spark.functions.geoloc import synth_geoloc
    from gdal_spark.raster.pipeline import warp_geoloc_array

    rows = []
    for okey in order_keys(sf_dir):
        if okey % 200:
            continue
        fp = footprint(okey)
        arr = decoded_pixels(fp)
        g = synth_geoloc(
            okey, fp["w"], fp["h"], fp["lon_min"], fp["lat_min"],
            fp["lon_max"], fp["lat_max"],
        )
        out, _, rt = warp_geoloc_array(arr, g, out_w, out_h, "bilinear")
        b = out[:, :, 0] if out.ndim == 3 else out
        rows.append((fp["image_id"], out_w, out_h, checksum_band(b), round(rt * 1e9)))
    schema = pa.schema(
        [("image_id", STR), ("w", I32), ("h", I32),
         ("checksum", I32), ("rt_err_ndeg", I64)]
    )
    return schema, rows


def g_raster_rpc_ortho(sf_dir, out_w=64, out_h=64):
    import numpy as np
    from gdal_spark.functions.rpc import RPCTransform, synth_rpc
    from gdal_spark.raster.warp import sample_at

    rows = []
    for okey in order_keys(sf_dir):
        if okey % 200:
            continue
        fp = footprint(okey)
        arr = decoded_pixels(fp)
        m = synth_rpc(okey, fp["w"], fp["h"], fp["lon_min"], fp["lat_min"],
                      fp["lon_max"], fp["lat_max"])
        t = RPCTransform(m)
        lon = fp["lon_min"] + (np.arange(out_w) + 0.5) * (fp["lon_max"] - fp["lon_min"]) / out_w
        lat = fp["lat_max"] - (np.arange(out_h) + 0.5) * (fp["lat_max"] - fp["lat_min"]) / out_h
        glon, glat = np.meshgrid(lon, lat)
        sx, sy = t.forward(glon, glat, np.full_like(glon, 0.0))
        out, _ = sample_at(arr, sx, sy, "bilinear")
        px0 = (glon - m.long_off) / m.long_scale * m.samp_scale + m.samp_off
        py0 = (m.lat_off - glat) / m.lat_scale * m.line_scale + m.line_off
        disp = float(np.hypot(sx - px0, sy - py0).mean())
        b = out[:, :, 0] if out.ndim == 3 else out
        rows.append((fp["image_id"], out_w, out_h, checksum_band(b), round(disp * 1e6)))
    schema = pa.schema(
        [("image_id", STR), ("w", I32), ("h", I32), ("checksum", I32),
         ("mean_disp_mpx", I64)]
    )
    return schema, rows


def g_raster_proximity(sf_dir, target_min=200, maxdist=64.0):
    from gdal_spark.raster.morphology import edt

    rows = []
    for okey in order_keys(sf_dir):
        if okey % 200:
            continue
        fp = footprint(okey)
        arr = decoded_pixels(fp)
        b = arr[:, :, 0] if arr.ndim == 3 else arr
        d = np.minimum(edt(b >= target_min), maxdist)
        out = np.floor(d / maxdist * 255.0 + 0.5).astype(np.uint8)
        rows.append((fp["image_id"], checksum_band(out), int((d == 0).sum())))
    schema = pa.schema([("image_id", STR), ("checksum", I32), ("n_target", I64)])
    return schema, rows


def g_raster_sieve(sf_dir, threshold=32, quant=64):
    from gdal_spark.raster.morphology import sieve_array

    rows = []
    for okey in order_keys(sf_dir):
        if okey % 200:
            continue
        fp = footprint(okey)
        arr = decoded_pixels(fp)
        b = arr[:, :, 0] if arr.ndim == 3 else arr
        q = (b // quant).astype(np.uint8)
        out = sieve_array(q, threshold)
        rows.append(
            (fp["image_id"], checksum_band(q), checksum_band(out), int((out != q).sum()))
        )
    schema = pa.schema(
        [("image_id", STR), ("checksum_before", I32), ("checksum_after", I32),
         ("n_changed", I64)]
    )
    return schema, rows


def g_raster_fillnodata(sf_dir, nodata_below=16):
    from gdal_spark.raster.morphology import fill_nodata_array

    rows = []
    for okey in order_keys(sf_dir):
        if okey % 200:
            continue
        fp = footprint(okey)
        arr = decoded_pixels(fp)
        b = arr[:, :, 0] if arr.ndim == 3 else arr
        masked = np.where(b < nodata_below, 0, b).astype(np.uint8)
        out = fill_nodata_array(masked, 0)
        rows.append((fp["image_id"], checksum_band(out), int((masked == 0).sum())))
    schema = pa.schema([("image_id", STR), ("checksum", I32), ("n_filled", I64)])
    return schema, rows


def g_raster_polygonize(sf_dir, quant=64, min_px=64):
    from gdal_spark.raster.vectorize import polygonize_array

    rows = []
    for okey in order_keys(sf_dir):
        if okey % 200:
            continue
        fp = footprint(okey)
        arr = decoded_pixels(fp)
        b = arr[:, :, 0] if arr.ndim == 3 else arr
        q = (b // quant).astype(np.uint8)
        for t in polygonize_array(q, min_px=min_px):
            rows.append((fp["image_id"], *t))
    schema = pa.schema(
        [("image_id", STR), ("value", I32), ("n_pixels", I64), ("xmin", I32),
         ("ymin", I32), ("xmax", I32), ("ymax", I32)]
    )
    return schema, rows


def g_raster_contour(sf_dir, levels=(64.0, 128.0, 192.0)):
    from gdal_spark.raster.vectorize import contour_stats

    rows = []
    for okey in order_keys(sf_dir):
        if okey % 200:
            continue
        fp = footprint(okey)
        arr = decoded_pixels(fp)
        b = arr[:, :, 0] if arr.ndim == 3 else arr
        for level, n, ln in contour_stats(b, levels):
            rows.append((fp["image_id"], level, n, round(ln, 4)))
    schema = pa.schema(
        [("image_id", STR), ("level", F64), ("n_segments", I64), ("total_len", F64)]
    )
    return schema, rows


def g_raster_palette(sf_dir, n_colors=16):
    from gdal_spark.raster.palette import map_nearest, median_cut

    rows = []
    for okey in order_keys(sf_dir):
        if okey % 200:
            continue
        fp = footprint(okey)
        arr = decoded_pixels(fp)
        if arr.ndim == 2:
            arr = np.repeat(arr[:, :, None], 3, axis=2)
        pal = median_cut(arr, n_colors)
        idx = map_nearest(arr, pal)
        rows.append(
            (fp["image_id"], len(pal), checksum_band(idx),
             checksum_band(pal.reshape(1, -1)))
        )
    schema = pa.schema(
        [("image_id", STR), ("n_colors", I32), ("checksum_idx", I32),
         ("palette_hash", I32)]
    )
    return schema, rows


def g_raster_pct_roundtrip(sf_dir, n_colors=16):
    from gdal_spark.raster.palette import map_nearest, median_cut, palette_expand

    rows = []
    for okey in order_keys(sf_dir):
        if okey % 200:
            continue
        fp = footprint(okey)
        arr = decoded_pixels(fp)
        if arr.ndim == 2:
            arr = np.repeat(arr[:, :, None], 3, axis=2)
        pal = median_cut(arr, n_colors)
        rgb = palette_expand(map_nearest(arr, pal), pal)
        err = rgb.astype(np.int32) - arr.astype(np.int32)
        rows.append(
            (fp["image_id"], len(pal), checksum_band(rgb[:, :, 0]),
             int(np.abs(err).max()),
             round(float((err.astype(np.float64) ** 2).mean()), 6))
        )
    schema = pa.schema(
        [("image_id", STR), ("n_colors", I32), ("checksum_r", I32),
         ("max_err", I32), ("mse", F64)]
    )
    return schema, rows


def g_raster_viewshed(sf_dir, obs_height=10.0):
    from gdal_spark.raster.viewshed import viewshed_mask_wang

    rows = []
    for okey in order_keys(sf_dir):
        if okey % 200:
            continue
        fp = footprint(okey)
        arr = decoded_pixels(fp)
        dem = arr[:, :, 0] if arr.ndim == 3 else arr
        h, w = dem.shape
        mask = viewshed_mask_wang(dem, w // 2, h // 2, obs_height)
        vis255 = (mask * 255).astype(np.uint8)
        rows.append(
            (fp["image_id"], int(mask.sum()),
             round(float(mask.mean()) * 100.0, 4), checksum_band(vis255))
        )
    schema = pa.schema(
        [("image_id", STR), ("n_visible", I64), ("pct_visible", F64),
         ("checksum", I32)]
    )
    return schema, rows


def g_tile_pyramid(sf_dir, min_zoom=10, max_zoom=12, tile_size=256):
    m = tm.GlobalMercator(tile_size)
    fps = [footprint(k) for k in order_keys(sf_dir) if k % 100 == 0]

    # base level: per-tile partial renders, first-wins compose by image_id
    partials: dict[tuple[int, int], list[tuple[str, np.ndarray]]] = {}
    for fp in fps:
        arr = decoded_pixels(fp)
        tx0, ty0 = m.LatLonToTile(fp["lat_min"], fp["lon_min"], max_zoom)
        tx1, ty1 = m.LatLonToTile(fp["lat_max"], fp["lon_max"], max_zoom)
        for tx in range(tx0, tx1 + 1):
            for ty in range(ty0, ty1 + 1):
                tb = m.TileBounds(tx, ty, max_zoom)
                tile, valid = warp_lonlat_to_merc_tile(
                    arr, fp["lon_min"], fp["lat_min"], fp["lon_max"], fp["lat_max"],
                    tb, tile_size, "near",
                )
                if not valid.any():
                    continue
                if tile.ndim == 2:
                    tile = np.repeat(tile[:, :, None], 3, axis=2)
                rgba = np.dstack([tile, (valid * 255).astype(np.uint8)])
                partials.setdefault((tx, ty), []).append((fp["image_id"], rgba))

    rows = []
    level: dict[tuple[int, int], tuple[np.ndarray, int]] = {}
    for (tx, ty), parts in partials.items():
        canvas = np.zeros((tile_size, tile_size, 4), dtype=np.uint8)
        for _, part in sorted(parts, key=lambda p: p[0]):
            put = (part[:, :, 3] > 0) & (canvas[:, :, 3] == 0)
            canvas[put] = part[put]
        level[(tx, ty)] = (canvas, len(parts))

    def emit(z, lv):
        for (tx, ty), (canvas, n) in sorted(lv.items()):
            rows.append(
                (z, tx, (1 << z) - 1 - ty, m.QuadTree(tx, ty, z),
                 checksum_band(canvas[:, :, 0]), n)
            )

    emit(max_zoom, level)
    for z in range(max_zoom - 1, min_zoom - 1, -1):
        nxt: dict[tuple[int, int], tuple[np.ndarray, int]] = {}
        groups: dict[tuple[int, int], list[tuple[int, int, np.ndarray]]] = {}
        for (tx, ty), (canvas, _) in level.items():
            groups.setdefault((tx >> 1, ty >> 1), []).append((tx, ty, canvas))
        for (ptx, pty), children in groups.items():
            big = np.zeros((2 * tile_size, 2 * tile_size, 4), dtype=np.uint8)
            for tx, ty, child in children:
                ox = (tx - 2 * ptx) * tile_size
                oy = (1 - (ty - 2 * pty)) * tile_size
                big[oy : oy + tile_size, ox : ox + tile_size] = child
            rgb = block_reduce(big[:, :, :3], tile_size, tile_size, "average")
            alpha = block_reduce(big[:, :, 3], tile_size, tile_size, "max")
            nxt[(ptx, pty)] = (np.dstack([rgb, alpha]), len(children))
        emit(z, nxt)
        level = nxt

    schema = pa.schema(
        [("z", I32), ("x", I32), ("y", I32), ("quadkey", STR),
         ("checksum", I32), ("n_srcs", I32)]
    )
    return schema, rows


def g_raster_histogram(sf_dir, band=0, n_bins=32):
    width = 256.0 / n_bins
    rows = []
    for okey in order_keys(sf_dir):
        if okey % 200:
            continue
        fp = footprint(okey)
        arr = decoded_pixels(fp)
        b = arr[:, :, band] if arr.ndim == 3 else arr
        counts = np.bincount((b.ravel() // int(width)).astype(np.int64), minlength=n_bins)
        for i in range(n_bins):
            rows.append(
                (fp["image_id"], i, i * width - 0.5, (i + 1) * width - 0.5, int(counts[i]))
            )
    schema = pa.schema(
        [("image_id", STR), ("bin", I32), ("bin_min", F64), ("bin_max", F64), ("n", I64)]
    )
    return schema, rows


def g_raster_pansharpen(sf_dir, factor=2):
    from gdal_spark.raster.resample import block_reduce

    rows = []
    for okey in order_keys(sf_dir):
        if okey % 200:
            continue
        fp = footprint(okey)
        arr = decoded_pixels(fp)
        if arr.ndim == 2:
            arr = np.repeat(arr[:, :, None], 3, axis=2)
        h, w = arr.shape[:2]
        h2, w2 = h // factor, w // factor
        arr = arr[: h2 * factor, : w2 * factor]
        pan = arr.astype(np.float64).mean(axis=2)
        ms = np.dstack(
            [block_reduce(arr[:, :, c], h2, w2, "average") for c in range(3)]
        ).astype(np.float64)
        up = np.repeat(np.repeat(ms, factor, axis=0), factor, axis=1)
        denom = up.mean(axis=2)
        with np.errstate(divide="ignore", invalid="ignore"):
            ratio = np.where(denom > 0, pan / denom, 0.0)
        outp = np.clip(np.floor(up * ratio[:, :, None] + 0.5), 0, 255).astype(np.uint8)
        rows.append(
            (fp["image_id"], outp.shape[1], outp.shape[0],
             checksum_band(outp[:, :, 0]), checksum_band(outp[:, :, 1]),
             checksum_band(outp[:, :, 2]))
        )
    schema = pa.schema(
        [("image_id", STR), ("w", I32), ("h", I32), ("cs_r", I32), ("cs_g", I32),
         ("cs_b", I32)]
    )
    return schema, rows


def g_tile_pyramid_geodetic(sf_dir, min_zoom=8, max_zoom=10, tile_size=256):
    from gdal_spark.raster.warp import warp_lonlat_to_grid

    gg = tm.GlobalGeodetic(tmscompatible=True, tile_size=tile_size)
    fps = [footprint(k) for k in order_keys(sf_dir) if k % 200 == 0]
    partials: dict[tuple[int, int], list[tuple[str, np.ndarray]]] = {}
    for fp in fps:
        arr = decoded_pixels(fp)
        tx0, ty0 = gg.LonLatToTile(fp["lon_min"], fp["lat_min"], max_zoom)
        tx1, ty1 = gg.LonLatToTile(fp["lon_max"], fp["lat_max"], max_zoom)
        for tx in range(tx0, tx1 + 1):
            for ty in range(ty0, ty1 + 1):
                tile, valid = warp_lonlat_to_grid(
                    arr, fp["lon_min"], fp["lat_min"], fp["lon_max"], fp["lat_max"],
                    gg.TileBounds(tx, ty, max_zoom), 4326, tile_size, tile_size, "near",
                )
                if not valid.any():
                    continue
                if tile.ndim == 2:
                    tile = np.repeat(tile[:, :, None], 3, axis=2)
                rgba = np.dstack([tile, (valid * 255).astype(np.uint8)])
                partials.setdefault((tx, ty), []).append((fp["image_id"], rgba))

    rows = []
    level: dict[tuple[int, int], tuple[np.ndarray, int]] = {}
    for (tx, ty), parts in partials.items():
        canvas = np.zeros((tile_size, tile_size, 4), dtype=np.uint8)
        for _, part in sorted(parts, key=lambda p: p[0]):
            put = (part[:, :, 3] > 0) & (canvas[:, :, 3] == 0)
            canvas[put] = part[put]
        level[(tx, ty)] = (canvas, len(parts))

    def emit(z, lv):
        for (tx, ty), (canvas, n) in sorted(lv.items()):
            rows.append(
                (z, tx, (1 << z) - 1 - ty, checksum_band(canvas[:, :, 0]), n)
            )

    emit(max_zoom, level)
    for z in range(max_zoom - 1, min_zoom - 1, -1):
        groups: dict[tuple[int, int], list[tuple[int, int, np.ndarray]]] = {}
        for (tx, ty), (canvas, _) in level.items():
            groups.setdefault((tx >> 1, ty >> 1), []).append((tx, ty, canvas))
        nxt: dict[tuple[int, int], tuple[np.ndarray, int]] = {}
        for (ptx, pty), children in groups.items():
            big = np.zeros((2 * tile_size, 2 * tile_size, 4), dtype=np.uint8)
            for tx, ty, child in children:
                ox = (tx - 2 * ptx) * tile_size
                oy = (1 - (ty - 2 * pty)) * tile_size
                big[oy : oy + tile_size, ox : ox + tile_size] = child
            rgb = block_reduce(big[:, :, :3], tile_size, tile_size, "average")
            alpha = block_reduce(big[:, :, 3], tile_size, tile_size, "max")
            nxt[(ptx, pty)] = (np.dstack([rgb, alpha]), len(children))
        emit(z, nxt)
        level = nxt

    schema = pa.schema(
        [("z", I32), ("x", I32), ("y", I32), ("checksum", I32), ("n_srcs", I32)]
    )
    return schema, rows


def g_raster_cutline(sf_dir):
    from gdal_spark.raster.rasterize import cutline_array

    aois = aoi_rows(sf_dir)
    rows = []
    for okey in order_keys(sf_dir):
        if okey % 50:
            continue
        fp = footprint(okey)
        arr = decoded_pixels(fp)
        band = arr if arr.ndim == 2 else arr[:, :, 0]
        for a in aois:
            if not (
                fp["lon_min"] < a["lon_max"]
                and fp["lon_max"] > a["lon_min"]
                and fp["lat_min"] < a["lat_max"]
                and fp["lat_max"] > a["lat_min"]
            ):
                continue
            g = G.parse_wkb(a["wkb"])
            masked, cropped, n_valid = cutline_array(
                band,
                (fp["lon_min"], fp["lat_min"], fp["lon_max"], fp["lat_max"]),
                g,
            )
            rows.append(
                (
                    fp["image_id"], a["poly_id"], checksum_band(masked),
                    checksum_band(cropped) if cropped.size else 0,
                    cropped.shape[1], cropped.shape[0], n_valid,
                    round(n_valid / band.size, 9),
                )
            )
    schema = pa.schema(
        [
            ("image_id", STR), ("poly_id", I64), ("cs_masked", I32),
            ("cs_cropped", I32), ("crop_w", I32), ("crop_h", I32),
            ("n_valid", I64), ("valid_frac", F64),
        ]
    )
    return schema, rows


def g_raster_color_relief(sf_dir):
    from gdal_spark.raster.composite import color_relief_array

    modes = ("interpolate", "nearest", "exact")
    rows = []
    for okey in order_keys(sf_dir):
        if okey % 200:
            continue
        fp = footprint(okey)
        arr = decoded_pixels(fp)
        b = arr[:, :, 0] if arr.ndim == 3 else arr
        vals = [fp["image_id"]]
        for mode in modes:
            rgba = color_relief_array(b, mode=mode)
            vals.append(checksum_band(rgba[:, :, 0]))
            vals.append(int(rgba[:, :, 3].astype(np.int64).sum()))
        rows.append(tuple(vals))
    schema = pa.schema(
        [("image_id", STR)]
        + [(f"{p}_{m}", I32 if p == "cs" else I64)
           for m in modes for p in ("cs", "a")]
    )
    return schema, rows


def g_st_geodesic(sf_dir):
    from gdal_spark.functions.geodesic import geodesic_area, geodesic_length

    rows = []
    for a in aoi_rows(sf_dir):
        g = G.parse_wkb(a["wkb"])
        rows.append(
            (a["poly_id"], round(geodesic_area(g), 3), round(geodesic_length(g), 6))
        )
    schema = pa.schema([("poly_id", I64), ("area_m2", F64), ("len_m", F64)])
    return schema, rows


def g_geotiff_cog(sf_dir):
    from gdal_spark.raster import tiff

    rows = []
    for okey in order_keys(sf_dir):
        if okey % 40:
            continue
        fp = footprint(okey)
        arr = decoded_pixels(fp)
        gt = (float(fp["w"]) * 10.0, 0.5, 0.0, float(fp["h"]) * 10.0, 0.0, -0.5)
        cog = tiff.encode_geotiff(
            arr, gt, 3857, block=(64, 64), compression="deflate", overviews=2
        )
        offs = tiff.ifd_offsets(cog)
        full, info = tiff.decode_full(cog, 0)
        ov1 = tiff.decode_full(cog, 1)[0] if len(offs) > 1 else full
        bo, big, _ = tiff._read_header(cog)

        def tiles(o):
            t = tiff._read_ifd(cog, bo, big, o)[0][324]
            return t if isinstance(t, list) else [t]

        min_payload = min(min(tiles(o)) for o in offs)
        rows.append(
            (
                fp["image_id"], fp["fmt"], fp["w"], fp["h"], len(offs), len(cog),
                checksum_bands(np.atleast_3d(full))[0],
                checksum_bands(np.atleast_3d(ov1))[0],
                bool(np.array_equal(full, arr)),
                bool(max(offs) < min_payload),
                bool(min(tiles(offs[0])) > max(tiles(offs[-1]))) if len(offs) > 1 else True,
                info["geotransform"][0],
                info["epsg"],
            )
        )
    schema = pa.schema(
        [
            ("image_id", STR), ("fmt", STR), ("w", I32), ("h", I32),
            ("n_ifds", I32), ("cog_size", I64), ("cs_full", I32),
            ("cs_ov1", I32), ("lossless", BOOL), ("headers_first", BOOL),
            ("ov_before_full", BOOL), ("gt_x0", F64), ("epsg", I32),
        ]
    )
    return schema, rows


def g_raster_neighbors(sf_dir):
    from gdal_spark.raster.focal import DEFAULT_SPECS, KERNELS, neighbors_array

    rows = []
    for okey in order_keys(sf_dir):
        if okey % 200:
            continue
        fp = footprint(okey)
        arr = decoded_pixels(fp)
        b = arr[:, :, 0] if arr.ndim == 3 else arr
        for kname, method in DEFAULT_SPECS:
            out = neighbors_array(b, KERNELS[kname], method)
            rows.append((fp["image_id"], kname, method, checksum_band(out)))
    schema = pa.schema(
        [("image_id", STR), ("kernel", STR), ("method", STR), ("checksum", I32)]
    )
    return schema, rows


def g_raster_clean_collar(sf_dir, out_w=64, out_h=64):
    from gdal_spark.raster.collar import BLACK, WHITE, clean_collar_array, warp_utm_array

    rows = []
    for okey in order_keys(sf_dir):
        if okey % 100:
            continue
        fp = footprint(okey)
        arr = decoded_pixels(fp)
        warped, epsg, _pw, _ph = warp_utm_array(
            arr, fp["lon"], fp["lat"], fp["lon_min"], fp["lat_min"],
            fp["lon_max"], fp["lat_max"], (out_w, out_h),
        )
        cleaned, alpha = clean_collar_array(warped, (BLACK, WHITE), 15)
        b0 = cleaned[:, :, 0] if cleaned.ndim == 3 else cleaned
        rows.append(
            (fp["image_id"], epsg, int((alpha == 0).sum()),
             checksum_band(b0), checksum_band(alpha))
        )
    schema = pa.schema(
        [("image_id", STR), ("epsg", I32), ("n_collar", I32),
         ("checksum_b0", I32), ("checksum_alpha", I32)]
    )
    return schema, rows


def g_raster_nodata_alpha(sf_dir, out_w=64, out_h=64):
    from gdal_spark.raster.collar import warp_utm_array
    from gdal_spark.raster.checksum import checksum_band as _cb

    rows = []
    for okey in order_keys(sf_dir):
        if okey % 100:
            continue
        fp = footprint(okey)
        arr = decoded_pixels(fp)
        warped, epsg, _pw, _ph = warp_utm_array(
            arr, fp["lon"], fp["lat"], fp["lon_min"], fp["lat_min"],
            fp["lon_max"], fp["lat_max"], (out_w, out_h),
        )
        a = warped if warped.ndim == 3 else warped[:, :, None]
        transparent = (a == 0).all(axis=2)
        alpha = np.where(transparent, 0, 255).astype(np.uint8)
        rows.append(
            (fp["image_id"], epsg, int(transparent.sum()),
             _cb(a[:, :, 0]), _cb(alpha))
        )
    schema = pa.schema(
        [("image_id", STR), ("epsg", I32), ("n_transparent", I32),
         ("checksum_b0", I32), ("checksum_alpha", I32)]
    )
    return schema, rows


def g_raster_footprint(sf_dir, out_w=64, out_h=64, min_ring_area=4):
    from gdal_spark.raster.collar import footprint_digest, warp_utm_array

    rows = []
    for okey in order_keys(sf_dir):
        if okey % 100:
            continue
        fp = footprint(okey)
        arr = decoded_pixels(fp)
        warped, epsg, px_w, px_h = warp_utm_array(
            arr, fp["lon"], fp["lat"], fp["lon_min"], fp["lat_min"],
            fp["lon_max"], fp["lat_max"], (out_w, out_h),
        )
        n_rings, valid_px, area, hull = footprint_digest(
            warped, px_w, px_h, 0, min_ring_area
        )
        rows.append((fp["image_id"], epsg, n_rings, valid_px, area, hull))
    schema = pa.schema(
        [("image_id", STR), ("epsg", I32), ("n_rings", I32), ("valid_px", I32),
         ("area_m2", F64), ("hull_area_m2", F64)]
    )
    return schema, rows


def g_gnm_shortest_path(sf_dir):
    """Single-process heapq-Dijkstra mirror of the GNM SSSP tree
    (gnm/gnmgraph.cpp:185 DijkstraShortestPathTree) over the same
    deterministic small-world network the Spark query builds; the
    lexicographic (dist, hops, parent) fixed point is algorithm-
    independent, so distributed Bellman-Ford must match bit-for-bit."""
    from gdal_spark.operators import gnm

    t = pq.read_table(f"{sf_dir}/part.parquet", columns=["p_partkey"])
    keys = sorted(int(v) for v in t.column("p_partkey").to_pylist())
    n = len(keys)

    def lon(k):
        return -180.0 + ((k * synth.SITE_LON_MUL) % 360000) / 1000.0

    def lat(k):
        return -85.0 + ((k * synth.SITE_LAT_MUL) % 170000) / 1000.0

    blocked = {k for k in keys if k % 97 == 13}
    adj: dict[int, list[tuple[int, float]]] = {}
    for i in keys:
        if i in blocked:
            continue
        for s in gnm.DEFAULT_SKIPS:
            j = (i + s) % n
            if j == i or j in blocked:
                continue
            w = gnm.haversine_m_py(lon(i), lat(i), lon(j), lat(j))
            adj.setdefault(i, []).append((j, w))
            adj.setdefault(j, []).append((i, w))
    best = gnm.dijkstra_tree_py(adj, 0)
    rows = [
        (node, d, h, p)
        for node, (d, h, p) in sorted(best.items())
    ]
    schema = pa.schema(
        [("node", I64), ("dist_m", F64), ("hops", I32), ("parent", I64)]
    )
    return schema, rows


def g_gnm_components(sf_dir):
    """Union-find mirror of the GNM connectivity analysis
    (GATConnectedComponents, gnm/gnmgraph.cpp:377+) over the skip-1
    ring with blocked vertices — component id = min node id, matching
    the min-label propagation's canonical label."""
    t = pq.read_table(f"{sf_dir}/part.parquet", columns=["p_partkey"])
    keys = sorted(int(v) for v in t.column("p_partkey").to_pylist())
    n = len(keys)
    blocked = {k for k in keys if k % 97 == 13}
    parent = {}

    def find(x):
        while parent[x] != x:
            parent[x] = parent[parent[x]]
            x = parent[x]
        return x

    nodes_in = set()
    for i in keys:
        if i in blocked:
            continue
        j = (i + 1) % n
        if j == i or j in blocked:
            continue
        for v in (i, j):
            parent.setdefault(v, v)
        nodes_in.update((i, j))
        ra, rb = find(i), find(j)
        if ra != rb:
            # union by min id so find() roots are the canonical labels
            if ra < rb:
                parent[rb] = ra
            else:
                parent[ra] = rb
    comp: dict[int, list[int]] = {}
    for v in nodes_in:
        comp.setdefault(find(v), []).append(v)
    rows = []
    for root, members in comp.items():
        for m in members:
            rows.append((m, root, len(members)))
    rows.sort()
    schema = pa.schema([("node", I64), ("component_id", I64), ("size", I32)])
    return schema, rows


GOLDEN_BUILDERS = {
    "raster_checksums": g_raster_checksums,
    "geotiff_cog": g_geotiff_cog,
    "raster_cutline": g_raster_cutline,
    "st_geodesic": g_st_geodesic,
    "raster_color_relief": g_raster_color_relief,
    "raster_translate": g_raster_translate,
    "raster_resample_kernels": g_raster_resample_kernels,
    "raster_as_features": g_raster_as_features,
    "raster_band_stats": g_raster_band_stats,
    "raster_interp_at_points": g_raster_interp_at_points,
    "rasterize_burn": g_rasterize_burn,
    "raster_reclassify": g_raster_reclassify,
    "raster_band_calc": g_raster_band_calc,
    "raster_dem_metrics": g_raster_dem_metrics,
    "raster_color_map": g_raster_color_map,
    "raster_blend": g_raster_blend,
    "raster_psnr_gate": g_raster_psnr_gate,
    "jpeg_progressive": g_jpeg_progressive,
    "webp_lz77_roundtrip": g_webp_lz77,
    "webp_lossy_vp8": g_webp_lossy,
    "raster_warp_utm": g_raster_warp_utm,
    "raster_warp_lcc": g_raster_warp_lcc,
    "raster_warp_gcp": g_raster_warp_gcp,
    "raster_warp_geoloc": g_raster_warp_geoloc,
    "raster_rpc_ortho": g_raster_rpc_ortho,
    "grid_tin": g_grid_tin,
    "image_phash_dedup": g_image_phash_dedup,
    "image_phash_neardup": g_image_phash_neardup,
    "raster_proximity": g_raster_proximity,
    "raster_sieve": g_raster_sieve,
    "raster_fillnodata": g_raster_fillnodata,
    "raster_polygonize": g_raster_polygonize,
    "raster_contour": g_raster_contour,
    "raster_palette": g_raster_palette,
    "raster_pct_roundtrip": g_raster_pct_roundtrip,
    "raster_histogram": g_raster_histogram,
    "raster_pansharpen": g_raster_pansharpen,
    "raster_viewshed": g_raster_viewshed,
    "raster_neighbors": g_raster_neighbors,
    "raster_clean_collar": g_raster_clean_collar,
    "raster_footprint": g_raster_footprint,
    "raster_nodata_alpha": g_raster_nodata_alpha,
    "tile_pyramid": g_tile_pyramid,
    "tile_pyramid_geodetic": g_tile_pyramid_geodetic,
    "gnm_shortest_path": g_gnm_shortest_path,
    "gnm_components": g_gnm_components,
}


def write_golden(sf_dir: str, only: set[str] | None = None) -> None:
    sf_name = os.path.basename(sf_dir.rstrip("/"))
    out_dir = os.path.join(REPO, "golden", sf_name)
    os.makedirs(out_dir, exist_ok=True)
    for name, build in GOLDEN_BUILDERS.items():
        if only and name not in only:
            continue
        schema, rows = build(sf_dir)
        cols = [pa.array([r[i] for r in rows], type=f.type) for i, f in enumerate(schema)]
        table = pa.Table.from_arrays(cols, schema=schema)
        pq.write_table(table, os.path.join(out_dir, f"{name}.parquet"))
        print(f"{sf_name}/{name}: {len(rows)} rows")


if __name__ == "__main__":
    args = sys.argv[1:]
    only: set[str] | None = None
    if "--only" in args:
        i = args.index("--only")
        only = set(args[i + 1].split(","))
        args = args[:i] + args[i + 2 :]
    bad = [a for a in args if a.startswith("-") or not os.path.isdir(a)]
    if bad:
        sys.exit(f"not a testdata dir: {bad} (usage: make_golden.py [SF_DIR...] [--only name,...])")
    dirs = args or ["/root/testdata/sf0.01", "/root/testdata/sf0.001"]
    for d in dirs:
        write_golden(d, only)
