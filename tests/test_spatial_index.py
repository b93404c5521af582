"""Cell-index spatial join surface: exact kNN join, cover-join PIP,
raster coverage (spatial.py knn_join / cover_join / raster_coverage_udf).

Reference parity targets: planetiler PointIndex.getNearest /
PolygonIndex.getContaining (in-RAM JTS indexes the engine re-expresses as
cell equi-joins — SURVEY.md §4).
"""

from __future__ import annotations

import math

import numpy as np
import pytest
from pyspark.sql import functions as F

from planetiler_openmaptiles_spark import spatial
from planetiler_openmaptiles_spark.geom import mercator


def _pt(lon, lat):
    return f"POINT ({lon:.7f} {lat:.7f})"


def _brute_knn(probes, targets, k):
    """probes/targets: dict id -> (lon, lat). Returns {(pid, rank): tid}."""
    out = {}
    for pid, (plon, plat) in probes.items():
        px, py = mercator.lonlat_to_world(plon, plat)
        scored = []
        for tid, (tlon, tlat) in targets.items():
            tx, ty = mercator.lonlat_to_world(tlon, tlat)
            scored.append((float((px - tx) ** 2 + (py - ty) ** 2), tid))
        scored.sort()
        for r, (_, tid) in enumerate(scored[:k], start=1):
            out[(pid, r)] = tid
    return out


def test_knn_join_matches_brute_force(spark):
    rng = np.random.default_rng(7)
    # dense blob (complete probes) + far-away isolated outliers whose
    # 3x3 neighborhood is empty -> exercises the brute-force fallback
    targets = {f"t{i}": (7.40 + rng.random() * 0.01, 43.72 + rng.random() * 0.01)
               for i in range(40)}
    probes = {f"p{i}": (7.40 + rng.random() * 0.01, 43.72 + rng.random() * 0.01)
              for i in range(10)}
    probes["p_far"] = (7.90, 43.95)      # no target within many cells
    probes["p_far2"] = (6.90, 43.10)
    a = spark.createDataFrame(
        [(k, _pt(*v)) for k, v in probes.items()], "a_id string, a_wkt string"
    )
    b = spark.createDataFrame(
        [(k, _pt(*v)) for k, v in targets.items()], "b_id string, b_wkt string"
    )
    got = {
        (r["a_id"], r["rank"]): r["b_id"]
        for r in spatial.knn_join(a, b, k=3).collect()
    }
    assert got == _brute_knn(probes, targets, 3)


def test_knn_join_fewer_targets_than_k(spark):
    a = spark.createDataFrame([("p", _pt(7.41, 43.73))], "a_id string, a_wkt string")
    b = spark.createDataFrame(
        [("t1", _pt(7.42, 43.74)), ("t2", _pt(7.40, 43.72))],
        "b_id string, b_wkt string",
    )
    rows = spatial.knn_join(a, b, k=5).collect()
    assert {(r["a_id"], r["rank"], r["b_id"]) for r in rows} == {
        ("p", 1, "t2"), ("p", 2, "t1")
    } or len(rows) == 2  # order depends on distances; just demand both ranked
    assert sorted(r["rank"] for r in rows) == [1, 2]


def test_cover_join_pip_matches_brute(spark):
    from planetiler_openmaptiles_spark.geom import ops, wkt as wktmod

    rng = np.random.default_rng(3)
    polys = []
    for i in range(12):
        cx, cy = 7.40 + rng.random() * 0.03, 43.72 + rng.random() * 0.03
        r = 0.001 + rng.random() * 0.004
        ang = np.linspace(0, 2 * np.pi, 7, endpoint=False)
        pts = [f"{cx + r * math.cos(t):.7f} {cy + r * math.sin(t):.7f}" for t in ang]
        pts.append(pts[0])
        polys.append((f"g{i}", "POLYGON ((" + ", ".join(pts) + "))"))
    points = [
        (f"q{i}", _pt(7.40 + rng.random() * 0.03, 43.72 + rng.random() * 0.03))
        for i in range(200)
    ]
    a = spark.createDataFrame(points, "pt_id string, pt_wkt string")
    b = spark.createDataFrame(polys, "poly_id string, poly_wkt string")
    cand = spatial.cover_join(a, b, "pt_wkt", "poly_wkt")
    got = {
        (r["pt_id"], r["poly_id"])
        for r in cand.filter(
            spatial.contains_point_udf(F.col("poly_wkt"), F.col("pt_wkt"))
        ).collect()
    }
    want = set()
    for pid, pw in points:
        gp = spatial._parse_world(pw)
        for gid, gw in polys:
            gg = spatial._parse_world(gw)
            if ops.point_in_geom(gp[1], gg):
                want.add((pid, gid))
    assert got == want
    assert want  # non-trivial vector


def test_raster_coverage_counts(spark):
    # axis-aligned square covering exactly the central quarter of its own
    # bbox-anchored grid: bbox == square, so all 32x32 centers are inside
    sq = "POLYGON ((7.4000000 43.7200000, 7.4100000 43.7200000, " \
         "7.4100000 43.7300000, 7.4000000 43.7300000, 7.4000000 43.7200000))"
    df = spark.createDataFrame([("s", sq)], "poly_id string, wkt string")
    cov = spatial.raster_coverage_udf(32)
    n = df.select(cov(F.col("wkt")).alias("n")).collect()[0]["n"]
    # bbox is not square in world units (mercator stretches y), grid cell =
    # max(w,h)/32 -> the shorter axis covers fewer than 32 columns of
    # centers; bound: full coverage on the long axis, >=60% on the short
    assert 32 * 19 <= n <= 32 * 32


def test_point_cell_scientific_notation(spark):
    """%.10g renders near-meridian coords as e-notation; the JVM-side
    coordinate extraction must not silently NULL them."""
    df = spark.createDataFrame(
        [("a", "POINT (1.2e-05 3.4)"), ("b", "POINT (0.00123 -4.5e-03)")],
        "pid string, wkt string",
    )
    rows = df.select(
        spatial.point_cell(F.col("wkt"), 10).alias("cell")
    ).collect()
    assert all(r["cell"] is not None for r in rows)
    # e-notation and plain rendering of the SAME point land in one cell
    eq = spark.createDataFrame(
        [("e", "POINT (1.2e-05 3.4)"), ("p", "POINT (0.000012 3.4)")],
        "pid string, wkt string",
    ).select(spatial.point_cell(F.col("wkt"), 10).alias("cell")).collect()
    assert eq[0]["cell"] == eq[1]["cell"]


def test_raster_vectorize_roundtrip(spark):
    """Raster→vector diagnostics: traced-ring perimeter equals the numpy
    boundary-segment count, and a polygon with a hole has Euler number 0
    (one outer, one hole) while a solid square has 1."""
    from pyspark.sql import functions as F

    from planetiler_openmaptiles_spark import spatial

    solid = "POLYGON ((0 0, 40 0, 40 40, 0 40, 0 0))"
    holed = ("POLYGON ((0 0, 40 0, 40 40, 0 40, 0 0), "
             "(10 10, 30 10, 30 30, 10 30, 10 10))")
    df = spark.createDataFrame(
        [(1, solid), (2, holed)], "poly_id long, wkt string"
    )
    v = spatial.raster_vectorize_udf(16)
    got = {
        r["poly_id"]: r
        for r in df.select(
            "poly_id", v(F.col("wkt")).alias("v")
        ).select("poly_id", "v.*").collect()
    }
    assert got[1]["euler"] == 1
    assert got[2]["euler"] == 0
    for r in got.values():
        assert r["n_pixels"] > 0
        assert r["perim_units"] == r["n_edges"]  # tracer covers each segment once
    # solid square: one full-width band of the 16x16 grid (mercator
    # y-extent exceeds the x-extent for a 40-degree box, so the square
    # dimension is the y side and x covers 15 of 16 columns)
    assert got[1]["n_pixels"] == 240 and got[1]["n_edges"] == 62


def test_point_density_pyramid(spark):
    """Pyramid invariants: every zoom preserves the total point count,
    tile counts shrink monotonically toward z0, and a child's ancestor
    cell holds at least the child's count."""
    from pyspark.sql import functions as F

    from planetiler_openmaptiles_spark import spatial

    pts = spark.createDataFrame(
        [(0.1, 0.1), (0.1, 0.1), (0.6, 0.6), (0.9, 0.2)], "wx double, wy double"
    )
    pyr = spatial.point_density_pyramid(pts, "wx", "wy", max_zoom=6).collect()
    byz = {}
    for r in pyr:
        byz.setdefault(r["z"], []).append(r)
    assert set(byz) == set(range(7))
    for z in range(7):
        assert sum(r["n"] for r in byz[z]) == 4
    assert len(byz[0]) == 1 and byz[0][0]["n"] == 4
    for z in range(1, 7):
        assert len(byz[z]) >= len(byz[z - 1])
        parents = {(r["x"], r["y"]): r["n"] for r in byz[z - 1]}
        for r in byz[z]:
            assert parents[(r["x"] // 2, r["y"] // 2)] >= r["n"]


def test_density_isobands(spark):
    """Isoband masks: the low threshold covers a superset of the high
    one, and a single dense blob yields euler 1 with perimeter equal to
    the independent segment count."""
    rows = []
    # 3x3 dense blob: 5 points per cell around (10..12, 10..12) at z6
    for cx in (10, 11, 12):
        for cy in (10, 11, 12):
            for _ in range(5):
                rows.append(((cx + 0.5) / 64.0, (cy + 0.5) / 64.0))
    # sparse singles elsewhere
    rows += [((40 + 0.5) / 64.0, (40 + 0.5) / 64.0)]
    pts = spark.createDataFrame(rows, "wx double, wy double")
    from planetiler_openmaptiles_spark import spatial

    got = {r["threshold"]: r
           for r in spatial.density_isobands(pts, thresholds=(1, 5), zoom=6).collect()}
    assert got[1]["n_cells"] == 10 and got[5]["n_cells"] == 9
    assert got[5]["euler"] == 1            # one solid 3x3 blob
    assert got[1]["euler"] == 2            # blob + isolated cell
    for r in got.values():
        assert r["perim_units"] == r["n_edges"]
    assert got[5]["n_edges"] == 12          # 3x3 square boundary
