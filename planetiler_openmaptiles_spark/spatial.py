"""Spatial-join infrastructure: geometry stats, cell covers, exact refiners.

The engine's replacement for the reference's in-RAM spatial indexes
(PolygonIndex / PointIndex / PreparedGeometry — SURVEY.md §4): a spatial
predicate join runs as

    candidates = A (exploded on cover cells)  ⋈cell  B (exploded on cells)
    result     = candidates.filter(exact predicate via Arrow UDF)

Cell keys are web-mercator quad tiles (tiling/cells.py) so Catalyst plans a
plain (broadcastable, saltable) hash join; the Arrow UDFs below do only the
exact refinement on the much smaller candidate set.

All UDFs are vectorized over Arrow batches; geometry parsing is the numpy
WKT kernel. Coordinates: input WKT is lon/lat; predicates computed in
world [0,1]² (same convention as the reference's worldGeometry()).
"""

from __future__ import annotations

import numpy as np
import pandas as pd
from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F
from pyspark.sql import types as T
from pyspark.sql.functions import pandas_udf

from .geom import mercator, ops, raster, wkt
from .tiling.cells import CELL_ZOOM


def _parse_world(w: str):
    if w is None or w == "":
        return None
    try:
        g = wkt.parse_wkt(w)
    except (ValueError, IndexError):
        return None
    if g is None:
        return None

    def fn(c):
        x, y = mercator.lonlat_to_world(c[:, 0], c[:, 1])
        return np.column_stack([x, y])

    kind, data = g
    if kind == "Point":
        return (kind, fn(data.reshape(1, 2))[0])
    if kind in ("LineString", "MultiPoint"):
        return (kind, fn(np.asarray(data)))
    if kind in ("MultiLineString", "Polygon"):
        return (kind, [fn(np.asarray(c)) for c in data])
    if kind == "MultiPolygon":
        return (kind, [[fn(np.asarray(r)) for r in rings] for rings in data])
    return None


_STATS_TYPE = T.StructType(
    [
        T.StructField("area", T.DoubleType()),
        T.StructField("length", T.DoubleType()),
        T.StructField("min_x", T.DoubleType()),
        T.StructField("min_y", T.DoubleType()),
        T.StructField("max_x", T.DoubleType()),
        T.StructField("max_y", T.DoubleType()),
    ]
)


@pandas_udf(_STATS_TYPE)
def geom_stats_udf(wkts: pd.Series) -> pd.DataFrame:
    """World-coordinate area/length/bbox per WKT (lon/lat input)."""
    rows = []
    for w in wkts:
        g = _parse_world(w)
        if g is None:
            rows.append((None, None, None, None, None, None))
            continue
        x0, y0, x1, y1 = ops.bbox(g)
        rows.append(
            (float(ops.geom_area(g)), float(ops.geom_length(g)), float(x0), float(y0), float(x1), float(y1))
        )
    return pd.DataFrame(rows, columns=["area", "length", "min_x", "min_y", "max_x", "max_y"])


def with_geom_stats(df: DataFrame, wkt_col: str = "geom_wkt") -> DataFrame:
    s = geom_stats_udf(F.col(wkt_col))
    return df.withColumn("_s", s).select("*", "_s.*").drop("_s")


_COVER_TYPE = T.ArrayType(
    T.StructType([T.StructField("cell", T.LongType()), T.StructField("own", T.BooleanType())])
)


def _bbox_range(x0, y0, x1, y1, z):
    n = 1 << z
    tx0, tx1 = max(0, int(x0 * n)), min(n - 1, int(x1 * n))
    ty0, ty1 = max(0, int(y0 * n)), min(n - 1, int(y1 * n))
    return tx0, ty0, tx1, ty1


def cover_cells_udf(zoom: int = CELL_ZOOM, cap: int = 4096):
    """WKT → array of (cell, own) covering cells for candidate generation.

    NO TRUNCATION: a geometry whose bbox cover at `zoom` exceeds `cap`
    coarsens to the finest level whose cover fits (bbox spans are known up
    front), so exact refinement always sees every overlapping pair — the
    old cap silently dropped cells of continent-scale polygons (false
    negatives). Cross-level matching: each geometry also emits its ancestor
    cells at every coarser level with own=false; join on cell and keep
    pairs where EITHER side is `own` (ancestor↔ancestor pairs at coarse
    levels carry no information and would degenerate to a cross join)."""

    @pandas_udf(_COVER_TYPE)
    def cover(wkts: pd.Series) -> pd.Series:
        out = []
        for w in wkts:
            g = _parse_world(w)
            if g is None:
                out.append([])
                continue
            x0, y0, x1, y1 = ops.bbox(g)
            z = zoom
            while z > 0:
                tx0, ty0, tx1, ty1 = _bbox_range(x0, y0, x1, y1, z)
                if (tx1 - tx0 + 1) * (ty1 - ty0 + 1) <= cap:
                    break
                z -= 1
            cells = []
            tx0, ty0, tx1, ty1 = _bbox_range(x0, y0, x1, y1, z)
            for tx in range(tx0, tx1 + 1):
                for ty in range(ty0, ty1 + 1):
                    cells.append(((z << 58) | (tx << 29) | ty, True))
            for lvl in range(z - 1, -1, -1):
                tx0, ty0, tx1, ty1 = _bbox_range(x0, y0, x1, y1, lvl)
                for tx in range(tx0, tx1 + 1):
                    for ty in range(ty0, ty1 + 1):
                        cells.append(((lvl << 58) | (tx << 29) | ty, False))
            out.append(cells)
        return pd.Series(out)

    return cover


def cover_join(a: DataFrame, b: DataFrame, a_wkt: str, b_wkt: str,
               zoom: int = CELL_ZOOM, cap: int = 4096,
               broadcast_b: bool = False) -> DataFrame:
    """Candidate pairs of a×b whose bbox covers share a cell (either side's
    own-level cells; see cover_cells_udf). Result = a's columns × b's
    columns, distinct."""
    cover = cover_cells_udf(zoom, cap)
    ac = a.withColumn("_cc", F.explode(cover(F.col(a_wkt)))).select(
        "*", F.col("_cc.cell").alias("_cell"), F.col("_cc.own").alias("_own_a")
    ).drop("_cc")
    bc = b.withColumn("_cc", F.explode(cover(F.col(b_wkt)))).select(
        "*", F.col("_cc.cell").alias("_cell"), F.col("_cc.own").alias("_own_b")
    ).drop("_cc")
    if broadcast_b:
        bc = F.broadcast(bc)
    return (
        ac.join(bc, "_cell")
        .filter(F.col("_own_a") | F.col("_own_b"))
        .drop("_cell", "_own_a", "_own_b")
        .distinct()
    )


@pandas_udf(T.DoubleType())
def intersection_area_udf(wkt_a: pd.Series, wkt_b: pd.Series) -> pd.Series:
    """|A ∩ B| in world units² (raster-approx; ordering-faithful for the
    argmax joins — reference layers/Water.java:296-301)."""
    out = np.full(len(wkt_a), 0.0)
    for i, (wa, wb) in enumerate(zip(wkt_a, wkt_b)):
        ga, gb = _parse_world(wa), _parse_world(wb)
        if ga is None or gb is None:
            continue
        pa = [ga[1]] if ga[0] == "Polygon" else (list(ga[1]) if ga[0] == "MultiPolygon" else None)
        pb = [gb[1]] if gb[0] == "Polygon" else (list(gb[1]) if gb[0] == "MultiPolygon" else None)
        if pa is None or pb is None:
            continue
        out[i] = raster.intersection_area(pa, pb)
    return pd.Series(out)


@pandas_udf(T.BooleanType())
def intersects_udf(wkt_a: pd.Series, wkt_b: pd.Series) -> pd.Series:
    """Approximate polygon-polygon intersects (bbox + raster overlap)."""
    out = np.zeros(len(wkt_a), dtype=bool)
    for i, (wa, wb) in enumerate(zip(wkt_a, wkt_b)):
        ga, gb = _parse_world(wa), _parse_world(wb)
        if ga is None or gb is None:
            continue
        ax0, ay0, ax1, ay1 = ops.bbox(ga)
        bx0, by0, bx1, by1 = ops.bbox(gb)
        if ax1 < bx0 or bx1 < ax0 or ay1 < by0 or by1 < ay0:
            continue
        pa = [ga[1]] if ga[0] == "Polygon" else (list(ga[1]) if ga[0] == "MultiPolygon" else None)
        pb = [gb[1]] if gb[0] == "Polygon" else (list(gb[1]) if gb[0] == "MultiPolygon" else None)
        if pa is None or pb is None:
            continue
        out[i] = raster.intersection_area(pa, pb) > 0.0
    return pd.Series(out)


@pandas_udf(T.BooleanType())
def contains_point_udf(poly_wkt: pd.Series, pt_wkt: pd.Series) -> pd.Series:
    """Point-in-polygon exact test (J5 refinement)."""
    out = np.zeros(len(poly_wkt), dtype=bool)
    for i, (wp, wq) in enumerate(zip(poly_wkt, pt_wkt)):
        gp, gq = _parse_world(wp), _parse_world(wq)
        if gp is None or gq is None or gq[0] != "Point":
            continue
        out[i] = ops.point_in_geom(gq[1], gp)
    return pd.Series(out)


@pandas_udf(T.DoubleType())
def point_distance_udf(pt_wkt: pd.Series, other_wkt: pd.Series) -> pd.Series:
    """World-unit distance point → geometry (J3/J4/J5 refinement)."""
    out = np.full(len(pt_wkt), np.inf)
    for i, (wp, wo) in enumerate(zip(pt_wkt, other_wkt)):
        gp, go = _parse_world(wp), _parse_world(wo)
        if gp is None or go is None or gp[0] != "Point":
            continue
        out[i] = ops.point_geom_dist(gp[1], go)
    return pd.Series(out)


# POINT WKT coordinate pair: accepts scientific notation — inter-stage
# WKT is rendered with %.10g, which emits e-notation for |coord|<1e-4
# (points within ~11 m of the prime meridian / equator); a plain
# [-]?[\d.]+ pattern silently NULLs those coordinates.
_PT_NUMS = (
    r"\(\s*([-+]?[0-9]*\.?[0-9]+(?:[eE][-+]?[0-9]+)?)"
    r"\s+([-+]?[0-9]*\.?[0-9]+(?:[eE][-+]?[0-9]+)?)"
)


def point_cell(lon_lat_wkt_col: Column, zoom: int = CELL_ZOOM) -> Column:
    """Cell key of a POINT WKT — JVM-side (regex coordinate extraction, no
    Python): for point-keyed joins the cell assignment stays in codegen."""
    from .tiling import cells

    lon = F.regexp_extract(lon_lat_wkt_col, _PT_NUMS, 1).cast("double")
    lat = F.regexp_extract(lon_lat_wkt_col, _PT_NUMS, 2).cast("double")
    return cells.cell_of_lonlat(lon, lat, zoom)


def s2_cell_udf(level: int = 10):
    """(lon, lat) -> S2 cell id at `level` (geom/s2.py), Arrow-vectorized.
    The spherical alternative to the mercator quad key: near-equal cell
    areas keep per-cell shuffle work flat at high latitudes, and Hilbert
    ordering makes id ranges spatially compact (range pruning on the
    sorted cell column)."""
    from .geom import s2

    @pandas_udf("long")
    def fn(lon: pd.Series, lat: pd.Series) -> pd.Series:
        ids = s2.cell_id(
            lon.to_numpy(np.float64), lat.to_numpy(np.float64), level
        )
        return pd.Series(ids)

    return fn


def s2_parent_col(ids: Column, level: int) -> Column:
    """Ancestor cell at a coarser level — pure Column bit math (stays in
    whole-stage codegen; geom/s2.py `parent` is the numpy twin)."""
    lsb = 1 << (2 * (30 - level))
    return (ids.bitwiseAND(F.lit(-lsb))).bitwiseOR(F.lit(lsb))


def point_kring(lon_lat_wkt_col: Column, meters: float, zoom: int = CELL_ZOOM) -> Column:
    from .tiling import cells

    lon = F.regexp_extract(lon_lat_wkt_col, _PT_NUMS, 1).cast("double")
    lat = F.regexp_extract(lon_lat_wkt_col, _PT_NUMS, 2).cast("double")
    return cells.cells_within_meters(lon, lat, meters, zoom)


def _pt_world_cols(wkt_col: Column) -> tuple[Column, Column]:
    """POINT WKT → world (x, y) Column pair, JVM-side (mirrors
    mercator.lonlat_to_world bit-for-bit via tiling.cells)."""
    from .tiling import cells

    lon = F.regexp_extract(wkt_col, _PT_NUMS, 1).cast("double")
    lat = F.regexp_extract(wkt_col, _PT_NUMS, 2).cast("double")
    return cells.world_x(lon), cells.world_y(lat)


def knn_join(a: DataFrame, b: DataFrame, k: int,
             a_id: str = "a_id", a_wkt: str = "a_wkt",
             b_id: str = "b_id", b_wkt: str = "b_wkt",
             zoom: int = 16) -> DataFrame:
    """EXACT k-nearest-neighbors join of two point sets (big × big).

    Replaces the reference's in-RAM PointIndex.getWithin/getNearest
    (planetiler PointIndex, used by Place.java city label joins) with a
    shuffle-friendly plan that never materializes either side on one node:

      1. b emits itself into its own cell and the 8 neighbors at `zoom`
         (so a probe's single cell sees every b within one full cell side).
      2. candidates = a ⋈cell b — a plain hash equi-join; per-probe
         window takes the k nearest by squared world distance.
      3. a probe is PROVABLY complete iff it found ≥ k candidates and its
         k-th distance < one cell side (Euclidean ≥ Chebyshev, so every
         point that near must have landed in the 3×3 neighborhood).
      4. the (rare) incomplete probes — sparse border regions — are
         re-run as a tiny broadcast brute-force pass against all of b.

    Entirely JVM/Catalyst: coordinate math, cell keys, distances and the
    windows are Column expressions; no Python in the hot path. Output:
    a_id, b_id, rank (1-based), dist2 (squared world-unit distance).
    """
    from pyspark.sql import Window

    ax, ay = _pt_world_cols(F.col(a_wkt))
    bx, by = _pt_world_cols(F.col(b_wkt))
    n = 1 << zoom
    cell_side = 1.0 / n

    a2 = a.select(F.col(a_id), ax.alias("_ax"), ay.alias("_ay")).withColumn(
        "_cx", F.floor(F.col("_ax") * n).cast("long")
    ).withColumn("_cy", F.floor(F.col("_ay") * n).cast("long"))
    b2 = b.select(F.col(b_id), bx.alias("_bx"), by.alias("_by")).withColumn(
        "_bcx", F.floor(F.col("_bx") * n).cast("long")
    ).withColumn("_bcy", F.floor(F.col("_by") * n).cast("long"))
    offs = F.expr("explode(flatten(transform(sequence(-1,1), dx -> transform(sequence(-1,1), dy -> struct(dx, dy)))))")
    b3 = b2.select("*", offs.alias("_o")).select(
        F.col(b_id), "_bx", "_by",
        (F.col("_bcx") + F.col("_o.dx")).alias("_cx"),
        (F.col("_bcy") + F.col("_o.dy")).alias("_cy"),
    )

    d2 = (F.col("_ax") - F.col("_bx")) * (F.col("_ax") - F.col("_bx")) + (
        F.col("_ay") - F.col("_by")
    ) * (F.col("_ay") - F.col("_by"))
    w = Window.partitionBy(a_id).orderBy(F.col("_d2").asc(), F.col(b_id).asc())
    cand = (
        a2.join(b3, ["_cx", "_cy"])
        .withColumn("_d2", d2)
        .withColumn("_rk", F.row_number().over(w))
        .filter(F.col("_rk") <= k)
    )
    stats = cand.groupBy(a_id).agg(
        F.count("*").alias("_n"), F.max("_d2").alias("_kd2")
    )
    complete = stats.filter(
        (F.col("_n") >= k) & (F.col("_kd2") < F.lit(cell_side * cell_side))
    ).select(a_id)
    # no broadcast hints: `complete` is ~|a| rows (almost every probe), so
    # these are plain a_id-keyed joins — cand is already hashed on a_id by
    # the window, and AQE broadcasts if the probe side happens to be small.
    done = cand.join(complete, a_id, "left_semi").select(
        F.col(a_id), F.col(b_id), F.col("_rk").alias("rank"), F.col("_d2").alias("dist2")
    )

    # probes with ZERO candidates never reach `stats`, so the fallback set
    # must come from an anti-join of the full probe table (rare rows:
    # sparse border regions) — these brute-force against all of b.
    rest = a2.join(complete, a_id, "left_anti")
    brute = (
        rest.crossJoin(b2.select(F.col(b_id), "_bx", "_by"))
        .withColumn("_d2", d2)
        .withColumn("_rk", F.row_number().over(w))
        .filter(F.col("_rk") <= k)
        .select(F.col(a_id), F.col(b_id), F.col("_rk").alias("rank"), F.col("_d2").alias("dist2"))
    )
    return done.unionByName(brute)


def raster_coverage_udf(grid: int = 32):
    """WKT polygon → number of covered pixels when rasterized on a
    grid×grid center-sampled raster anchored at its world bbox min corner
    with square cells of max(w, h)/grid (the same kernel the polygon-merge
    reducers use — geom/raster.py rasterize). Exposed so the raster↔vector
    path has a first-class, DuckDB-replayable surface: the oracle
    recomputes every pixel with an even-odd center test in SQL."""

    @pandas_udf(T.LongType())
    def cov(wkts: pd.Series) -> pd.Series:
        out = np.zeros(len(wkts), dtype=np.int64)
        for i, w in enumerate(wkts):
            g = _parse_world(w)
            if g is None:
                continue
            polys = [g[1]] if g[0] == "Polygon" else (list(g[1]) if g[0] == "MultiPolygon" else None)
            if not polys:
                continue
            x0, y0, x1, y1 = ops.bbox(g)
            cell = max(x1 - x0, y1 - y0) / grid
            if cell <= 0:
                continue
            mask = raster.rasterize(polys, x0, y0, cell, (grid, grid))
            out[i] = int(np.count_nonzero(mask))
        return pd.Series(out)

    return cov


def point_density_pyramid(points: DataFrame, wx_col: str = "wx",
                          wy_col: str = "wy", max_zoom: int = 14,
                          min_zoom: int = 0) -> DataFrame:
    """Multi-resolution point-density pyramid — the heatmap/cluster rollup
    a map-analytics service precomputes for every zoom. Returns one row
    per non-empty tile per zoom: ``(z, x, y, n)``.

    Two-stage shape chosen for 10^12 points: first count per FINEST-zoom
    tile (the only shuffle whose input scales with the corpus; its key
    space is bounded by 4^max_zoom, and map-side combine collapses each
    partition to its distinct tiles before the exchange), then explode
    each z_max aggregate row to its (max_zoom+1) ancestors by integer
    right-shift and re-aggregate — the second shuffle carries
    #distinct-tiles × zoom-levels rows, independent of input size. The
    naive per-zoom re-aggregation of raw points would shuffle the corpus
    15 times.
    """
    from .tiling import cells

    tx = cells.tile_coord(F.col(wx_col), max_zoom)
    ty = cells.tile_coord(F.col(wy_col), max_zoom)
    base = (
        points.select(tx.alias("tx"), ty.alias("ty"))
        .groupBy("tx", "ty")
        .agg(F.count("*").alias("n"))
    )
    lv = base.select(
        "tx", "ty", "n",
        F.explode(F.sequence(F.lit(min_zoom), F.lit(max_zoom))).alias("z"),
    )
    return (
        lv.select(
            "z",
            F.expr(f"shiftright(tx, {max_zoom} - z)").alias("x"),
            F.expr(f"shiftright(ty, {max_zoom} - z)").alias("y"),
            "n",
        )
        .groupBy("z", "x", "y")
        .agg(F.sum("n").alias("n"))
    )


def mask_vector_stats(mask: "np.ndarray", x0: float = 0.0, y0: float = 0.0,
                      cell: float = 1.0) -> tuple[int, int, int, int]:
    """(n_pixels, n_edges, perim_units, euler) for a binary mask:
    boundary unit segments from numpy 4-neighbor transitions, traced-ring
    perimeter (independent recomputation via geom/raster.py trace_rings),
    and the ring-orientation Euler number. Shared by the raster→vector
    round-trip UDF and the density-isoband query."""
    n_pixels = int(np.count_nonzero(mask))
    pad = np.zeros((mask.shape[0] + 2, mask.shape[1] + 2), dtype=bool)
    pad[1:-1, 1:-1] = mask
    n_edges = int(
        (pad[1:, :] & ~pad[:-1, :]).sum()
        + (pad[:-1, :] & ~pad[1:, :]).sum()
        + (pad[:, 1:] & ~pad[:, :-1]).sum()
        + (pad[:, :-1] & ~pad[:, 1:]).sum()
    )
    rings = raster.trace_rings(mask, x0, y0, cell)
    perim = sum(float(np.abs(np.diff(r, axis=0)).sum()) for r in rings)
    perim_units = int(round(perim / cell)) if cell > 0 else 0
    euler = sum(1 if raster.ring_signed_area(r) > 0 else -1 for r in rings)
    return n_pixels, n_edges, perim_units, euler


def density_isobands(points: DataFrame, thresholds=(1, 5, 20),
                     zoom: int = 6, wx_col: str = "wx",
                     wy_col: str = "wy") -> DataFrame:
    """Density isobands: threshold the zoom-level point-density grid and
    re-vectorize each level-set mask with the engine's boundary tracer —
    contour polygons of a heatmap, entirely in-engine. Returns one row
    per threshold: ``(threshold, n_cells, n_edges, perim_units, euler)``.

    Scale shape: the density grid comes from ``point_density_pyramid``
    (one corpus-sized shuffle); the per-threshold vectorization works on
    the AGGREGATE grid (<= 4^zoom cells — bounded by construction, not by
    input size), one Arrow task per threshold."""
    import pandas as pd  # noqa: F811 — local for the kernel closure

    pyr = point_density_pyramid(points, wx_col, wy_col,
                                max_zoom=zoom, min_zoom=zoom)
    side = 1 << zoom
    tagged = pyr.select(
        "x", "y", "n",
        F.explode(F.array(*[F.lit(int(t)) for t in thresholds])).alias(
            "threshold"
        ),
    ).filter(F.col("n") >= F.col("threshold"))

    schema = T.StructType(
        [
            T.StructField("threshold", T.IntegerType()),
            T.StructField("n_cells", T.LongType()),
            T.StructField("n_edges", T.LongType()),
            T.StructField("perim_units", T.LongType()),
            T.StructField("euler", T.LongType()),
        ]
    )

    def kernel(key, pdf: pd.DataFrame) -> pd.DataFrame:
        mask = np.zeros((side, side), dtype=bool)
        mask[pdf["y"].to_numpy(), pdf["x"].to_numpy()] = True
        n_px, n_e, perim, euler = mask_vector_stats(mask)
        return pd.DataFrame(
            [(int(key[0]), n_px, n_e, perim, euler)],
            columns=["threshold", "n_cells", "n_edges", "perim_units", "euler"],
        )

    return tagged.groupBy("threshold").applyInPandas(kernel, schema)


def raster_vectorize_udf(grid: int = 32):
    """WKT polygon → raster→vector round-trip diagnostics on the same
    grid×grid center-sampled raster as ``raster_coverage_udf``:

    * ``n_pixels`` — covered pixel count (mask cardinality),
    * ``n_edges``  — boundary unit segments of the mask (filled↔unfilled
      4-neighbor transitions, outer border included),
    * ``perim_units`` — total perimeter of the rings RE-TRACED from the
      mask by ``geom/raster.py trace_rings`` (the vectorizer the polygon
      union/merge reducers rely on), expressed in cell units. Boundary
      tracing covers each boundary segment exactly once, so this must
      equal ``n_edges`` — the engine computes the two INDEPENDENTLY
      (numpy transitions vs traced world rings) and the oracle pins both
      to its own SQL edge count.
    * ``euler`` — #outer rings − #holes from traced ring orientation;
      the oracle recomputes it as the 4-connectivity Euler number via
      Gray's 2×2 quad-count formula (Q1 − Q3 + 2·Qd)/4 — a winding,
      saddle-resolution, or orientation bug in the tracer breaks it.
    """
    schema = T.StructType(
        [
            T.StructField("n_pixels", T.LongType()),
            T.StructField("n_edges", T.LongType()),
            T.StructField("perim_units", T.LongType()),
            T.StructField("euler", T.LongType()),
        ]
    )

    @pandas_udf(schema)
    def vec(wkts: pd.Series) -> pd.DataFrame:
        rows = []
        for w in wkts:
            g = _parse_world(w)
            polys = None
            if g is not None:
                polys = (
                    [g[1]] if g[0] == "Polygon"
                    else (list(g[1]) if g[0] == "MultiPolygon" else None)
                )
            if not polys:
                rows.append((0, 0, 0, 0))
                continue
            x0, y0, x1, y1 = ops.bbox(g)
            cell = max(x1 - x0, y1 - y0) / grid
            if cell <= 0:
                rows.append((0, 0, 0, 0))
                continue
            mask = raster.rasterize(polys, x0, y0, cell, (grid, grid))
            rows.append(mask_vector_stats(mask, x0, y0, cell))
        return pd.DataFrame(
            rows, columns=["n_pixels", "n_edges", "perim_units", "euler"]
        )

    return vec


@pandas_udf(T.StringType())
def strip_accents_udf(s: pd.Series) -> pd.Series:
    """Apache-commons StringUtils.stripAccents equivalent (J4 city match)."""
    import unicodedata

    def strip(v):
        if v is None:
            return None
        return "".join(
            ch for ch in unicodedata.normalize("NFD", v) if not unicodedata.combining(ch)
        )

    return s.map(strip)


@pandas_udf(T.BooleanType())
def within_distance_udf_10km(poly_wkt: pd.Series, geom_wkt: pd.Series) -> pd.Series:
    """geometry intersects polygon buffered by 10 km (J6 GB/IE route test —
    reference Transportation.java:319-350). Vertex-sampled approximation:
    true iff any vertex is inside the polygon or within the buffer of it."""
    buf = 10_000.0 / 40075016.686
    out = np.zeros(len(poly_wkt), dtype=bool)
    for i, (wp, wg) in enumerate(zip(poly_wkt, geom_wkt)):
        gp, gg = _parse_world(wp), _parse_world(wg)
        if gp is None or gg is None or gp[0] not in ("Polygon", "MultiPolygon"):
            continue
        pts = ops._all_coords(gg)
        hit = False
        for pt in pts:
            if ops.point_in_geom(pt, gp) or ops.point_geom_dist(pt, gp) <= buf:
                hit = True
                break
        out[i] = hit
    return pd.Series(out)
