"""GDAL image checksum — the reference's golden-test oracle.

Reimplements ``GDALChecksumImage`` (``alg/gdalchecksum.cpp:48-375``)
exactly for integer data: iterate pixels row-major and accumulate
``(value % primes[i % 11]) & 0xffff`` with primes
{7,11,13,17,19,23,29,31,37,41,43} (``alg/gdalchecksum.cpp:54-58``) and
a prime index that runs continuously across lines
(``alg/gdalchecksum.cpp:360-367``). Floating data is converted with
GDALCopyWords rounding (+0.5 then floor, ``:77-87``).

Multi-band arrays checksum each band independently (GDAL checksums are
per-band); ``checksum`` of an HxWxC array returns the band-0 value and
``checksum_bands`` returns all of them.
"""

from __future__ import annotations

import numpy as np

PRIMES = np.array([7, 11, 13, 17, 19, 23, 29, 31, 37, 41, 43], dtype=np.int64)


def checksum_band(band: np.ndarray) -> int:
    """16-bit checksum of a single 2-D band, any integer/float dtype."""
    a = np.asarray(band)
    if a.dtype.kind == "f":
        # GDALCopyWords float→Int32: add 0.5, clamp, floor (:77-87)
        v = a.astype(np.float64) + 0.5
        v = np.clip(v, -2147483647.0, 2147483647.0)
        flat = np.floor(v).astype(np.int64).ravel()
    else:
        flat = a.astype(np.int64).ravel()
    mods = PRIMES[np.arange(flat.size) % 11]
    # C's % truncates toward zero (sign of dividend); numpy's floors.
    rem = np.abs(flat) % mods
    rem = np.where(flat < 0, -rem, rem)
    return int(rem.sum()) & 0xFFFF


def checksum(arr: np.ndarray) -> int:
    """Checksum of band 0 (gray array or first channel)."""
    if arr.ndim == 2:
        return checksum_band(arr)
    return checksum_band(arr[:, :, 0])


def checksum_bands(arr: np.ndarray) -> list[int]:
    if arr.ndim == 2:
        return [checksum_band(arr)]
    return [checksum_band(arr[:, :, c]) for c in range(arr.shape[2])]
