"""Geometry kernel unit tests (no Spark)."""

import numpy as np
import pytest

from planetiler_openmaptiles_spark.geom import parse_wkt, to_wkt
from planetiler_openmaptiles_spark.geom.mercator import lonlat_to_world, world_to_lonlat
from planetiler_openmaptiles_spark.geom import ops
from planetiler_openmaptiles_spark.geom import raster


def sq(x0, y0, w):
    return np.array([[x0, y0], [x0 + w, y0], [x0 + w, y0 + w], [x0, y0 + w], [x0, y0]], float)


def test_wkt_roundtrip():
    cases = [
        "POINT (1 2)",
        "LINESTRING (0 0, 1 1, 2 0)",
        "POLYGON ((0 0, 4 0, 4 4, 0 4, 0 0), (1 1, 2 1, 2 2, 1 2, 1 1))",
        "MULTIPOLYGON (((0 0, 1 0, 1 1, 0 1, 0 0)), ((5 5, 6 5, 6 6, 5 6, 5 5)))",
        "MULTILINESTRING ((0 0, 1 1), (2 2, 3 3))",
        "MULTIPOINT (1 1, 2 2)",
    ]
    for w in cases:
        g = parse_wkt(w)
        assert to_wkt(g) == w
        assert to_wkt(parse_wkt(to_wkt(g))) == w


def test_mercator_roundtrip():
    lon = np.array([-180.0, 0.0, 7.42, 179.9])
    lat = np.array([-60.0, 0.0, 43.73, 80.0])
    x, y = lonlat_to_world(lon, lat)
    lon2, lat2 = world_to_lonlat(x, y)
    np.testing.assert_allclose(lon2, lon, atol=1e-9)
    np.testing.assert_allclose(lat2, lat, atol=1e-9)
    assert 0 <= x.min() and x.max() <= 1 and 0 <= y.min() and y.max() <= 1


def test_area_centroid():
    poly = ("Polygon", [sq(0, 0, 4), sq(1, 1, 1)[::-1]])
    assert ops.geom_area(poly) == pytest.approx(15.0)
    c = ops.centroid(("Polygon", [sq(2, 2, 2)]))
    np.testing.assert_allclose(c, [3, 3])
    assert ops.line_length(np.array([[0, 0], [3, 4]])) == pytest.approx(5.0)


def test_point_in_polygon_and_pos():
    poly = ("Polygon", [sq(0, 0, 4), sq(1, 1, 1)[::-1]])
    assert ops.point_in_geom([0.5, 0.5], poly)
    assert not ops.point_in_geom([1.5, 1.5], poly)  # in hole
    assert not ops.point_in_geom([5, 5], poly)
    pos = ops.point_on_surface(poly)
    assert ops.point_in_geom(pos, poly)


def test_convexity():
    assert ops.is_convex(("Polygon", [sq(0, 0, 1)]))
    concave = np.array([[0, 0], [4, 0], [4, 4], [2, 1], [0, 4], [0, 0]], float)
    assert not ops.is_convex(("Polygon", [concave]))


def test_simplify():
    line = np.array([[0, 0], [1, 0.001], [2, 0], [3, 5], [4, 0]], float)
    s = ops.douglas_peucker(line, 0.01)
    assert len(s) == 4  # middle point on straight run dropped
    np.testing.assert_allclose(s[0], [0, 0])
    np.testing.assert_allclose(s[-1], [4, 0])


def test_clip_polygon_box():
    g = ops.clip_geom_box(("Polygon", [sq(0, 0, 4)]), 2, 2, 6, 6)
    assert g is not None and g[0] == "Polygon"
    assert ops.geom_area(g) == pytest.approx(4.0)
    assert ops.clip_geom_box(("Polygon", [sq(0, 0, 1)]), 5, 5, 6, 6) is None


def test_clip_line_box():
    g = ops.clip_geom_box(("LineString", np.array([[0, 1], [10, 1]], float)), 2, 0, 4, 2)
    assert g[0] == "LineString"
    assert ops.line_length(g[1]) == pytest.approx(2.0)
    # line crossing out and back in → multilinestring
    zig = np.array([[0, 0], [5, 10], [10, 0]], float)
    g2 = ops.clip_geom_box(("LineString", zig), 0, 0, 10, 4)
    assert g2[0] == "MultiLineString" and len(g2[1]) == 2


def test_merge_lines():
    a = np.array([[0, 0], [1, 0]], float)
    b = np.array([[1, 0], [2, 0]], float)
    c = np.array([[5, 5], [6, 6]], float)
    merged = ops.merge_lines([a, b, c])
    assert len(merged) == 2
    assert max(len(m) for m in merged) == 3
    # degree-3 junction must NOT merge through
    d = np.array([[1, 0], [1, 1]], float)
    merged2 = ops.merge_lines([a, b, d])
    assert len(merged2) == 3


def test_raster_union_merges_overlapping():
    polys = [[sq(0.0, 0.0, 0.5)], [sq(0.4, 0.0, 0.5)]]
    out = raster.union_polygons(polys, 0.0, 0.0, 1.0, 1.0 / 256, simplify_px=0.0)
    assert len(out) == 1
    area = ops.polygon_area(out[0])
    assert area == pytest.approx(0.5 * 0.5 + 0.5 * 0.5 - 0.1 * 0.5, rel=0.05)


def test_raster_union_keeps_disjoint_and_buffer_merges():
    polys = [[sq(0.1, 0.1, 0.2)], [sq(0.35, 0.1, 0.2)]]
    px = 1.0 / 256
    out = raster.union_polygons(polys, 0.0, 0.0, 1.0, px, simplify_px=0.0)
    assert len(out) == 2
    # gap = 0.05 world = 12.8 px; buffer 7px closes it
    out2 = raster.union_polygons(polys, 0.0, 0.0, 1.0, px, buffer_dist_px=7.0, simplify_px=0.0)
    assert len(out2) == 1


def test_raster_union_hole_preserved():
    donut = [sq(0.1, 0.1, 0.8), sq(0.3, 0.3, 0.4)[::-1]]
    out = raster.union_polygons([donut], 0.0, 0.0, 1.0, 1.0 / 256, simplify_px=0.0)
    assert len(out) == 1
    assert len(out[0]) == 2  # outer + hole
    area = ops.polygon_area(out[0])
    assert area == pytest.approx(0.64 - 0.16, rel=0.05)


def test_intersection_area_argmax_ordering():
    big = [[sq(0, 0, 10)]]        # overlap with target = [5,10]² = 25
    small = [[sq(14, 14, 10)]]    # overlap with target = [14,15]² = 1
    target = [[sq(5, 5, 10)]]
    a1 = raster.intersection_area(target, big)
    a2 = raster.intersection_area(target, small)
    assert a1 > a2 > 0
    assert a1 == pytest.approx(25.0, rel=0.05)
    assert a2 == pytest.approx(1.0, rel=0.3)


def test_dp_thresholds_match_direct_dp():
    """coords[thr2 > tol²] must equal douglas_peucker(coords, tol) for all
    tolerances (the per-zoom simplify in tile render relies on this)."""
    rng = np.random.default_rng(7)
    for trial in range(50):
        n = int(rng.integers(2, 120))
        coords = np.cumsum(rng.normal(size=(n, 2)), axis=0)
        if trial % 3 == 0:  # closed ring case
            coords = np.vstack([coords, coords[:1]])
        thr2 = ops.dp_thresholds(coords)
        for tol in (0.01, 0.1, 0.5, 1.0, 3.0, 10.0):
            direct = ops.douglas_peucker(coords, tol)
            filt = ops.dp_filter(coords, thr2, tol)
            np.testing.assert_array_equal(filt, direct)


def test_clip_line_box_pieces():
    # line exits and re-enters the box → two pieces
    line = np.array([[-1, 1], [1, 1], [3, 1], [3, 5], [1, 5], [1, 3]], float)
    pieces = ops.clip_line_box(line, 0, 0, 2, 4)
    assert len(pieces) == 2
    np.testing.assert_allclose(pieces[0], [[0, 1], [1, 1], [2, 1]])
    np.testing.assert_allclose(pieces[1], [[1, 4], [1, 3]])
    # fully inside
    inside = np.array([[0.5, 0.5], [1.5, 1.5]])
    assert len(ops.clip_line_box(inside, 0, 0, 2, 2)) == 1
    # fully outside
    assert ops.clip_line_box(np.array([[5.0, 5], [6, 6]]), 0, 0, 2, 2) == []


def test_simplify_with_thresholds_matches_simplify():
    rng = np.random.default_rng(11)

    def ring(n, r):
        th = np.sort(rng.uniform(0, 2 * np.pi, n))
        pts = np.column_stack([r * np.cos(th), r * np.sin(th)]) + rng.normal(0, 0.3, (n, 2))
        return np.vstack([pts, pts[:1]])

    geoms = [
        ("LineString", np.cumsum(rng.normal(size=(40, 2)), axis=0)),
        ("MultiLineString", [np.cumsum(rng.normal(size=(k, 2)), axis=0) for k in (5, 30, 2)]),
        ("Polygon", [ring(30, 10.0), ring(8, 2.0)]),
        ("MultiPolygon", [[ring(25, 8.0)], [ring(6, 0.4), ring(5, 0.1)]]),
    ]
    for g in geoms:
        thrs = ops.geom_dp_thresholds(g)
        for tol in (0.01, 0.2, 1.0, 5.0, 50.0):
            a = ops.simplify(g, tol)
            b = ops.simplify_with_thresholds(g, thrs, tol)
            assert (a is None) == (b is None), (g[0], tol)
            if a is not None:
                from planetiler_openmaptiles_spark.geom import to_wkt

                assert to_wkt(a) == to_wkt(b), (g[0], tol)


def test_fmt_coords_vectorized_parity():
    """np.char.mod %.10g must byte-match Python's .10g (to_wkt fast path)."""
    from planetiler_openmaptiles_spark.geom.wkt import _fmt_coords

    rng = np.random.default_rng(3)
    arr = np.concatenate(
        [
            rng.uniform(-300, 4_300_000, (50, 2)),
            rng.normal(0, 1e-9, (20, 2)),
            np.array([[0.0, -0.0], [1e30, -1e-30], [0.1 + 0.2, 256.0]]),
        ]
    )
    slow = ", ".join(f"{x:.10g} {y:.10g}" for x, y in arr)
    assert _fmt_coords(arr) == slow


def test_cover_cells_coarsen_no_truncation(spark):
    """A continent-scale polygon must coarsen its cover level, not truncate:
    its own-level cells still meet a tiny far-corner lake's ancestors
    (the round-1 cap dropped those candidates silently)."""
    from pyspark.sql import functions as F
    from planetiler_openmaptiles_spark import spatial

    big = spark.createDataFrame(
        [("big", "POLYGON ((-179 -80, 179 -80, 179 80, -179 80, -179 -80))")],
        "id_a string, wa string")
    small = spark.createDataFrame(
        [("small", "POLYGON ((170.0 70.0, 170.2 70.0, 170.2 70.2, 170.0 70.2, 170.0 70.0))"),
         ("outside", "POLYGON ((0 0, 0.1 0, 0.1 0.1, 0 0.1, 0 0))")],
        "id_b string, wb string")
    pairs = spatial.cover_join(big, small, "wa", "wb", zoom=9, cap=64)
    got = {(r["id_a"], r["id_b"]) for r in pairs.select("id_a", "id_b").collect()}
    # bbox covers the world -> both small polys are candidates
    assert ("big", "small") in got and ("big", "outside") in got
    # two small far-apart polys never pair with each other
    pairs2 = spatial.cover_join(small, small.withColumnRenamed("id_b", "id_c")
                                .withColumnRenamed("wb", "wc"), "wb", "wc", zoom=9, cap=64)
    got2 = {(r["id_b"], r["id_c"]) for r in pairs2.select("id_b", "id_c").collect()}
    assert ("small", "outside") not in got2 and ("small", "small") in got2
