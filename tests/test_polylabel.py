"""Pole of inaccessibility (geom/polylabel.py): brute-force grid parity,
shapes where centroid fails, holes, multipolygon part choice, and the
render-form plumb."""

import numpy as np

from planetiler_openmaptiles_spark.geom.polylabel import (
    _signed_distance,
    polylabel,
)


def _ring(pts):
    return np.array(pts + [pts[0]], dtype=np.float64)


def _brute_best(rings, n=160):
    outer = rings[0]
    minx, miny = outer.min(axis=0)
    maxx, maxy = outer.max(axis=0)
    best, bd = None, -np.inf
    for x in np.linspace(minx, maxx, n):
        for y in np.linspace(miny, maxy, n):
            d = _signed_distance(float(x), float(y), rings)
            if d > bd:
                bd, best = d, (float(x), float(y))
    return best, bd


def test_square_center():
    sq = ("Polygon", [_ring([(0, 0), (10, 0), (10, 10), (0, 10)])])
    x, y = polylabel(sq, precision=0.01)
    assert abs(x - 5) < 0.02 and abs(y - 5) < 0.02


def test_u_shape_beats_centroid():
    # U: the centroid sits in the notch (outside); polylabel must land
    # inside one of the legs with near-optimal clearance
    u = ("Polygon", [_ring([
        (0, 0), (10, 0), (10, 10), (7, 10), (7, 3), (3, 3), (3, 10), (0, 10)
    ])])
    rings = [np.asarray(r) for r in u[1]]
    x, y = polylabel(u, precision=0.01)
    d = _signed_distance(x, y, rings)
    assert d > 0  # inside
    _, bd = _brute_best(rings)
    assert d >= bd - 0.05  # clearance matches the brute-force optimum
    from planetiler_openmaptiles_spark.geom.ops import centroid
    cx, cy = centroid(u)
    assert _signed_distance(float(cx), float(cy), rings) < d


def test_hole_pushes_anchor_off_center():
    # centered square hole: the best anchor is in the ring between
    # outer and hole, never inside the hole
    poly = ("Polygon", [
        _ring([(0, 0), (12, 0), (12, 12), (0, 12)]),
        _ring([(4, 4), (8, 4), (8, 8), (4, 8)]),
    ])
    rings = [np.asarray(r) for r in poly[1]]
    x, y = polylabel(poly, precision=0.01)
    d = _signed_distance(x, y, rings)
    assert d > 0
    assert not (4 < x < 8 and 4 < y < 8)  # not in the hole
    _, bd = _brute_best(rings)
    assert d >= bd - 0.05


def test_multipolygon_labels_biggest_part():
    mp = ("MultiPolygon", [
        [_ring([(0, 0), (1, 0), (1, 1), (0, 1)])],
        [_ring([(10, 10), (30, 10), (30, 30), (10, 30)])],
    ])
    x, y = polylabel(mp, precision=0.01)
    assert 10 < x < 30 and 10 < y < 30
    assert abs(x - 20) < 0.05 and abs(y - 20) < 0.05


def test_render_form_plumb(spark):
    from planetiler_openmaptiles_spark.tiling.explode import _resolve_form
    from planetiler_openmaptiles_spark.geom import wkt

    g = wkt.parse_wkt(
        "POLYGON ((0 0, 10 0, 10 10, 7 10, 7 3, 3 3, 3 10, 0 10, 0 0))"
    )
    out = _resolve_form(g, "polylabel")
    assert out[0] == "Point"
    rings = [np.asarray(r) for r in g[1]]
    assert _signed_distance(float(out[1][0]), float(out[1][1]), rings) > 0
    # non-polygon falls back to centroid
    line = wkt.parse_wkt("LINESTRING (0 0, 2 2)")
    assert _resolve_form(line, "polylabel")[0] == "Point"


def test_sliver_polygon_fast_and_inside():
    # 10-deg x 1e-4-deg sliver at the DEFAULT precision (diag/1000 — what
    # the render form uses): without the seed-grid coarsening this seeded
    # 100,000 initial cells (~4 s measured); with it, ~64. The frontier
    # is O(perimeter/precision) by the algorithm's nature, so precision
    # far below the default is the caller's explicit cost decision.
    import time

    sliver = ("Polygon", [_ring([(0, 0), (10, 0), (10, 1e-4), (0, 1e-4)])])
    t0 = time.perf_counter()
    x, y = polylabel(sliver)
    wall = time.perf_counter() - t0
    rings = [np.asarray(r) for r in sliver[1]]
    assert _signed_distance(x, y, rings) > 0
    assert wall < 1.0, wall
