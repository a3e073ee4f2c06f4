"""GEOS (shapely) fast-path dispatch + kernel equivalence.

The fallback branch is the certified path in this container; the
shapely equivalence suite runs wherever the library exists (cluster).
"""

import numpy as np
import pytest

from gdal_spark.functions import geometry as G
from gdal_spark.functions import geos_fast as GF
from gdal_spark.functions import predicates as P

RECT = G.wkb_polygon([[(0, 0), (10, 0), (10, 10), (0, 10), (0, 0)]])
RECT2 = G.wkb_polygon([[(5, 5), (15, 5), (15, 15), (5, 15), (5, 5)]])
FAR = G.wkb_polygon([[(100, 100), (101, 100), (101, 101), (100, 101), (100, 100)]])
INNER = G.wkb_polygon([[(2, 2), (4, 2), (4, 4), (2, 4), (2, 2)]])
EDGE = G.wkb_polygon([[(10, 0), (20, 0), (20, 10), (10, 10), (10, 0)]])
CONCAVE = G.wkb_polygon(
    [[(0, 0), (10, 0), (10, 10), (6, 10), (6, 2), (4, 2), (4, 10), (0, 10), (0, 0)]])
ROTATED = G.wkb_polygon([[(10, 0), (10, 10), (0, 10), (0, 0), (10, 0)]])

PAIRS = [
    (RECT, RECT2), (RECT, FAR), (RECT, INNER), (RECT, EDGE),
    (RECT, CONCAVE), (RECT, ROTATED), (CONCAVE, INNER), (None, RECT),
]


def test_fallback_matches_direct_kernels():
    wa = [a for a, _ in PAIRS]
    wb = [b for _, b in PAIRS]
    for name in GF._PREDICATES:
        got = GF.kernel_batch_predicate(wa, wb, name)
        for (a, b), v in zip(PAIRS, got):
            if a is None or b is None:
                assert v is None
            else:
                assert v == P.predicate(G.parse_wkb(a), G.parse_wkb(b), name)


def test_dispatch_uses_kernels_when_no_shapely():
    res = GF.batch_predicate([RECT], [ROTATED], "equals")
    assert bool(res[0]) is True  # normalized topological equals
    res = GF.batch_predicate([RECT], [EDGE], "touches")
    assert bool(res[0]) is True


def test_unknown_predicate_rejected():
    with pytest.raises(ValueError):
        GF.batch_predicate([RECT], [RECT], "covers")


@pytest.mark.skipif(not GF.HAS_SHAPELY, reason="shapely 2.x not installed")
def test_shapely_equivalence_against_kernels():
    wa = [a for a, _ in PAIRS if a is not None]
    wb = [b for a, b in PAIRS if a is not None]
    for name in GF._PREDICATES:
        fast = GF.shapely_batch_predicate(wa, wb, name)
        slow = GF.kernel_batch_predicate(wa, wb, name)
        assert list(fast) == list(slow), name
