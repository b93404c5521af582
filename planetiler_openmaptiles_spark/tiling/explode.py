"""Feature → (z, x, y) tile explode — the render stage.

Reference parity: planetiler's FeatureRenderer step (SURVEY.md §3.1 step 8):
slice every rendered feature into each tile it touches between its min/max
zoom, clip to 256px + buffer, simplify per zoom, resolve zoom-gated attrs,
compute the label-grid group, then shuffle by tile for per-tile reduction.

Spark-first decomposition — three sub-stages so the expensive work is pruned
as early as possible and everything prunable stays JVM-side:

  A. ``prepare_geoms`` (mapInPandas, one Arrow pass): parse WKT once per
     feature, resolve the geometry *form* (centroid / point_on_surface /
     centroid_if_convex), convert lon/lat → world [0,1]², and attach cheap
     stats (bbox, sqrt-area / length in world units). After this stage the
     geometry is a world-coordinate WKT and every gate below is arithmetic.

  B. ``zoom_explode`` (pure Catalyst): explode the zoom range, resolve
     zoom-gated attrs / min-pixel-size / tolerance / label-grid spec for
     each z, and FILTER on the pixel-size gate using the stage-A stats —
     at z5 a 10 m building dies here, in codegen, before any Python. Also
     computes the tile coordinate range per (feature, z) so stage C's cost
     is known to the optimizer (AQE balances by exploded row count).

  C. ``tile_cut`` (mapInPandas): simplify at z-tolerance, assign + clip to
     each covered tile (px coords, origin = tile top-left). Consecutive rows
     share the parsed geometry via last-feature memoization (explode keeps a
     feature's zoom rows adjacent within a partition). Giant polygons
     (ocean: millions of z14 tiles) take the fill path: rasterize the tile
     grid, interior tiles emit a canned full-cover rectangle, only boundary
     tiles pay for an exact clip — planetiler's "tile fill" optimization.

At 100 TB the shuffle after stage C (repartition by z,x,y,layer) is the big
exchange; it is keyed by tile so the per-tile reducers (windows + merge
UDFs) are co-located, and AQE splits oversized tile partitions.
"""

from __future__ import annotations

from typing import Iterator

import numpy as np
import pandas as pd
from pyspark.sql import DataFrame
from pyspark.sql import functions as F
from pyspark.sql import types as T

from ..geom import mercator, ops, packed, wkt
from ..features import TILE_EXTENT

MAX_ZOOM = 14
FILL_TILE_THRESHOLD = 1024  # tiles per (feature, z) beyond which fill path kicks in
DEFAULT_TOLERANCE_PX = 0.1  # planetiler --simplify-tolerance default

# per-layer simplification tolerance overrides (layer → fn(z, attrs,
# default) -> px). The explicit setPixelTolerance values stay absolute;
# only the fall-through uses the configured default — planetiler's
# --simplify-tolerance arg changes the default, not per-layer overrides.
# landcover: 0.25px at z<=10 (reference layers/Landcover.java:129-130);
# buildings & residential landuse: 0.25px (Building.java:172-176,
# Landuse.java:124-126)
LAYER_TOLERANCE = {
    "landcover": lambda z, a, d: 0.25 if z <= 10 else d,
    "building": lambda z, a, d: 0.25,
    "landuse": lambda z, a, d: 0.25 if a.get("class") == "residential" else d,
}


# ------------------------------------------------------------------ stage A

_PREP_EXTRA = [
    ("kind", T.StringType()),
    ("src_kind", T.StringType()),
    ("geom_world", T.StringType()),
    ("min_x", T.DoubleType()),
    ("min_y", T.DoubleType()),
    ("max_x", T.DoubleType()),
    ("max_y", T.DoubleType()),
    ("size_world", T.DoubleType()),
]


def _resolve_form(geom, form: str):
    """Apply the requested geometry form (F9). Returns geometry or None."""
    gk = wkt.geom_kind(geom)
    if form == "point":
        return geom if gk == "point" else ("Point", ops.centroid(geom))
    if form == "centroid":
        return ("Point", ops.centroid(geom))
    if form == "point_on_surface":
        return ("Point", ops.point_on_surface(geom))
    if form == "centroid_if_convex":
        return ("Point", ops.centroid_if_convex(geom))
    if form == "polylabel":
        # pole of inaccessibility — beyond-reference label anchor
        if gk != "polygon":
            return ("Point", ops.centroid(geom))
        from planetiler_openmaptiles_spark.geom.polylabel import polylabel

        return ("Point", np.asarray(polylabel(geom), dtype=np.float64))
    if form == "line":
        if gk == "linestring":
            return geom
        if geom[0] == "Polygon":  # polygon boundary as line (pier lines etc.)
            rings = geom[1]
            return ("LineString", rings[0]) if len(rings) == 1 else ("MultiLineString", list(rings))
        if geom[0] == "MultiPolygon":
            return ("MultiLineString", [r for rings in geom[1] for r in rings])
        return None
    if form == "polygon":
        return geom if gk == "polygon" else None
    raise ValueError(form)


def prepare_geoms(features: DataFrame) -> DataFrame:
    """Stage A: parse + form-resolve + world-convert + stats (one Arrow pass)."""
    out_schema = T.StructType(
        list(features.schema.fields) + [T.StructField(n, t) for n, t in _PREP_EXTRA]
    )

    def run(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            rows = {n: [] for n, _ in _PREP_EXTRA}
            keep = np.ones(len(pdf), dtype=bool)
            for i, (gw, form) in enumerate(zip(pdf["geom_wkt"], pdf["form"])):
                try:
                    src = wkt.parse_wkt(gw)
                    g = _resolve_form(src, form) if src is not None else None
                except (ValueError, IndexError):
                    src, g = None, None
                if g is None:
                    keep[i] = False
                    for n in rows:
                        rows[n].append(None)
                    continue
                g = _to_world(g)
                x0, y0, x1, y1 = ops.bbox(g)
                gk = wkt.geom_kind(g)
                # pixel gates measure the SOURCE geometry (planetiler
                # setMinPixelSize semantics — a pointOnSurface label is
                # gated by its source polygon's size, WaterName.java:246-257)
                src_kind = wkt.geom_kind(src)
                if src_kind == "polygon":
                    sw = _to_world(src) if form != "polygon" else g
                    size = float(np.sqrt(max(ops.geom_area(sw), 0.0)))
                elif src_kind == "linestring":
                    sw = _to_world(src) if form not in ("line",) else g
                    size = float(ops.geom_length(sw))
                else:
                    size = 0.0
                attrs = _attrs_dict(pdf["attrs"].iloc[i])
                if attrs.get("_numpoints") == "__computed__":
                    # setNumPointsAttr (reference layers/Landcover.java:84,133)
                    attrs = dict(attrs)
                    attrs["_numpoints"] = str(len(ops._all_coords(g)))
                    pdf.iat[i, pdf.columns.get_loc("attrs")] = attrs
                rows["kind"].append(gk)
                rows["src_kind"].append(src_kind)
                rows["geom_world"].append(wkt.to_wkt(g))
                rows["min_x"].append(float(x0))
                rows["min_y"].append(float(y0))
                rows["max_x"].append(float(x1))
                rows["max_y"].append(float(y1))
                rows["size_world"].append(size)
            for n, vals in rows.items():
                pdf[n] = vals
            pdf["attrs"] = [_attrs_dict(a) for a in pdf["attrs"]]
            yield pdf[keep]

    return features.mapInPandas(run, schema=out_schema)


def _map_coords(geom, fn):
    kind, data = geom
    if kind == "Point":
        return (kind, fn(data.reshape(1, 2))[0])
    if kind in ("LineString", "MultiPoint"):
        return (kind, fn(np.asarray(data)))
    if kind in ("MultiLineString", "Polygon"):
        return (kind, [fn(np.asarray(c)) for c in data])
    if kind == "MultiPolygon":
        return (kind, [[fn(np.asarray(r)) for r in rings] for rings in data])
    raise ValueError(kind)


def _to_world(geom):
    def fn(c):
        x, y = mercator.lonlat_to_world(c[:, 0], c[:, 1])
        return np.column_stack([x, y])

    return _map_coords(geom, fn)


# ------------------------------------------------------------------ stage B


def zoom_explode(prepared: DataFrame, max_zoom: int = MAX_ZOOM) -> DataFrame:
    """Stage B: explode zoom, resolve z-dependent specs, pixel-gate (JVM)."""
    # a feature whose minzoom exceeds the build's max zoom renders nowhere —
    # without this filter F.sequence(minzoom, max_zoom) would run BACKWARDS
    # (Spark sequences descend when start > stop) and leak tiles beyond the
    # requested max zoom
    df = prepared.filter(
        F.greatest(F.lit(0), F.col("minzoom")) <= F.least(F.lit(max_zoom), F.col("maxzoom"))
    ).withColumn(
        "z",
        F.explode(
            F.sequence(
                F.greatest(F.lit(0), F.col("minzoom")),
                F.least(F.lit(max_zoom), F.col("maxzoom")),
            )
        ),
    )
    z = F.col("z")
    scale = F.lit(float(TILE_EXTENT)) * F.pow(F.lit(2.0), z.cast("double"))  # px per world unit

    # resolve zoom-gated attrs: base map overwritten by active zattrs
    # (LAST_WIN map policy set in session); higher-minzoom entries win.
    active = F.array_sort(
        F.filter(F.coalesce(F.col("zattrs"), F.array()), lambda e: e["minzoom"] <= z),
        lambda a, b: F.when(a["minzoom"] < b["minzoom"], -1)
        .when(a["minzoom"] > b["minzoom"], 1)
        .otherwise(0),
    )
    attrs_z = F.map_concat(
        F.col("attrs"),
        F.map_from_entries(
            F.transform(active, lambda e: F.struct(e["key"].alias("key"), e["value"].alias("value")))
        ),
    )
    # min pixel size at z: smallest-matching below_zoom override, else base
    ov = F.filter(F.coalesce(F.col("mps_overrides"), F.array()), lambda o: z <= o["below_zoom"])
    ov_sorted = F.array_sort(
        ov,
        lambda a, b: F.when(a["below_zoom"] < b["below_zoom"], -1)
        .when(a["below_zoom"] > b["below_zoom"], 1)
        .otherwise(0),
    )
    mps_z = F.when(F.size(ov_sorted) > 0, F.element_at(ov_sorted, 1)["size"]).otherwise(
        F.col("min_pixel_size")
    )
    # label grid spec at z
    grid_z = F.filter(
        F.coalesce(F.col("grid"), F.array()),
        lambda g: (g["minzoom"] <= z) & (z <= g["maxzoom"]),
    )
    grid_size_z = F.when(F.size(grid_z) > 0, F.element_at(grid_z, 1)["size"])
    grid_limit_z = F.when(F.size(grid_z) > 0, F.element_at(grid_z, 1)["limit"]).otherwise(F.lit(0))

    buf_ov = F.filter(F.coalesce(F.col("buffer_overrides"), F.array()), lambda o: o["zoom"] == z)
    buffer_z = F.when(F.size(buf_ov) > 0, F.element_at(buf_ov, 1)["size"]).otherwise(
        F.col("buffer_px")
    )
    df = (
        df.withColumn("attrs_z", attrs_z)
        .withColumn("buffer_z", buffer_z)
        .withColumn("mps_z", mps_z)
        .withColumn("grid_size_z", grid_size_z)
        .withColumn("grid_limit_z", grid_limit_z)
        .withColumn("size_px", F.col("size_world") * scale)
    )
    # the pixel gate (skipped at the map max zoom so overzooming keeps data —
    # planetiler FeatureCollector.Feature#setMinPixelSize semantics)
    gate = (
        (F.col("src_kind") == "point")
        | (z == F.lit(max_zoom))
        | (F.col("size_px") >= F.col("mps_z"))
    )
    return df.filter(gate)


# ------------------------------------------------------------------ stage C

TILE_FEATURE_SCHEMA = T.StructType(
    [
        T.StructField("z", T.IntegerType()),
        T.StructField("x", T.IntegerType()),
        T.StructField("y", T.IntegerType()),
        T.StructField("layer", T.StringType()),
        T.StructField("doc_id", T.StringType()),
        T.StructField("elem_id", T.LongType()),
        T.StructField("kind", T.StringType()),
        # packed geometry (geom/packed.py): one flat binary blob per row.
        # Arrow moves it as a single memcpy and the JVM shuffles/sorts it
        # as one variable-length field — no WKT text on the render→reduce
        # path (the round-1 bandwidth hot spot).
        T.StructField("geom_px", T.BinaryType()),
        T.StructField("attrs", T.MapType(T.StringType(), T.StringType())),
        T.StructField("sort_key", T.IntegerType()),
        T.StructField("grid_cell", T.LongType()),
        T.StructField("grid_limit", T.IntegerType()),
        # point rows carry their tile-local coordinate as plain doubles so
        # pure-Catalyst post-processors (mountain_peak's 64px buffer drop)
        # never have to reinterpret the blob JVM-side
        T.StructField("pt_x", T.DoubleType()),
        T.StructField("pt_y", T.DoubleType()),
    ]
)


def _scale_to_tile(geom, tx, ty, scale_tiles):
    """world → px coords local to tile (tx, ty): px = world*2^z*256 - tile*256."""

    def fn(c):
        out = c * (scale_tiles * TILE_EXTENT)
        out[:, 0] -= tx * TILE_EXTENT
        out[:, 1] -= ty * TILE_EXTENT
        return out

    return _map_coords(geom, fn)


def _attrs_dict(a):
    if a is None:
        return {}
    if isinstance(a, dict):
        return a
    return dict(a)  # Arrow may hand maps over as arrays of (k, v) tuples


def _emit_row(out, row, z, tx, ty, geom_px, grid_cell, ptx=None, pty=None):
    out["z"].append(z)
    out["x"].append(tx)
    out["y"].append(ty)
    out["layer"].append(row.layer)
    out["doc_id"].append(row.doc_id)
    out["elem_id"].append(row.elem_id)
    out["kind"].append(row.kind)
    out["geom_px"].append(
        geom_px if isinstance(geom_px, bytes) else packed.pack(geom_px)
    )
    out["attrs"].append(_attrs_dict(row.attrs_z))
    out["sort_key"].append(row.sort_key)
    out["grid_cell"].append(grid_cell)
    out["grid_limit"].append(row.grid_limit_z)
    out["pt_x"].append(ptx)
    out["pt_y"].append(pty)


def _cut_tiles_grid(out, row, gs, z, n, scale, buf, tx0, tx1, ty0, ty1):
    """Axis-separable tile cut: clip each covered COLUMN once against its
    x-strip, then clip tiles against the (much smaller) column geometry —
    O(cols·N + tiles·N_col) instead of O(tiles·N) for a feature covering
    many tiles (the round-2 verdict's stage-C hot loop). For polygons the
    output is byte-identical to the one-shot 4-edge clip: Sutherland-
    Hodgman is a SEQUENCE of half-plane clips, and the strip pass just
    runs the two x half-planes first (the per-tile pass's x edges then
    see an all-inside ring and skip). Line endpoints may differ in the
    last ulp (Liang-Barsky interpolates per stage)."""
    inf = float("inf")
    # the column pre-clip amortizes over the column's tile count: with <3
    # rows it's pure overhead (measured net loss on the sf0.1 distribution
    # where most features span a 1-2 tile neighbourhood)
    do_strip = tx1 > tx0 and (ty1 - ty0) >= 2
    for tx in range(tx0, tx1 + 1):
        bx0 = (tx * TILE_EXTENT - buf) / scale
        bx1 = ((tx + 1) * TILE_EXTENT + buf) / scale
        col = ops.clip_geom_box(gs, bx0, -inf, bx1, inf) if do_strip else gs
        if col is None:
            continue
        for ty in range(ty0, ty1 + 1):
            by0 = (ty * TILE_EXTENT - buf) / scale
            by1 = ((ty + 1) * TILE_EXTENT + buf) / scale
            c = ops.clip_geom_box(col, bx0, by0, bx1, by1)
            if c is None:
                continue
            _emit_row(out, row, z, tx, ty, _scale_to_tile(c, tx, ty, n), None)


_FILL_GEOM = None


def _fill_rect(buffer_px):
    return (
        "Polygon",
        [
            np.array(
                [
                    [-buffer_px, -buffer_px],
                    [TILE_EXTENT + buffer_px, -buffer_px],
                    [TILE_EXTENT + buffer_px, TILE_EXTENT + buffer_px],
                    [-buffer_px, TILE_EXTENT + buffer_px],
                    [-buffer_px, -buffer_px],
                ]
            )
        ],
    )


def tile_cut(exploded: DataFrame, default_tol: float = DEFAULT_TOLERANCE_PX) -> DataFrame:
    """Stage C: per (feature, z) → tile rows with clipped px geometry."""

    def run(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        memo_key, memo_geom, memo_thrs = None, None, None
        for pdf in batches:
            out = {f.name: [] for f in TILE_FEATURE_SCHEMA.fields}
            for row in pdf.itertuples(index=False):
                # keyed on the WKT itself: same (doc_id, elem_id, layer, form)
                # can carry different geometries (boundary vote groups) and a
                # stale memo would clip against the wrong geometry
                key = row.geom_world
                if key != memo_key:
                    memo_key = key
                    memo_geom = wkt.parse_wkt(row.geom_world)
                    memo_thrs = False  # computed lazily (skipped for points)
                g = memo_geom
                if g is None:
                    continue
                z = int(row.z)
                n = 1 << z
                scale = n * TILE_EXTENT  # px per world unit
                buf = float(row.buffer_z)
                buf_world = buf / scale
                if row.kind == "point":
                    _cut_points(out, row, g, z, n, scale, buf)
                    continue
                if memo_thrs is False:
                    # Douglas-Peucker retention thresholds once per feature:
                    # the per-zoom simplify below becomes a boolean filter
                    memo_thrs = ops.geom_dp_thresholds(g)
                # simplify at this zoom's tolerance (world units)
                tol_fn = LAYER_TOLERANCE.get(row.layer)
                tol_px = tol_fn(z, row.attrs_z or {}, default_tol) if tol_fn else default_tol
                gs = (
                    ops.simplify_with_thresholds(g, memo_thrs, tol_px / scale)
                    if tol_px > 0
                    else g
                )
                if gs is None:
                    continue
                fx0 = int(np.floor((row.min_x - buf_world) * n))
                fx1 = int(np.floor((row.max_x + buf_world) * n))
                fy0 = int(np.floor((row.min_y - buf_world) * n))
                fy1 = int(np.floor((row.max_y + buf_world) * n))
                if fx0 == fx1 and fy0 == fy1 and 0 <= fx0 < n and 0 <= fy0 < n:
                    # buffered bbox entirely inside one tile → clip is a no-op
                    # (simplified geometry's bbox ⊆ source bbox); rings from
                    # the layer stages are closed, so output bytes match the
                    # clip path's fully-inside fast path exactly
                    _emit_row(out, row, z, fx0, fy0, _scale_to_tile(gs, fx0, fy0, n), None)
                    continue
                x0, x1 = max(0, fx0), min(n - 1, fx1)
                y0, y1 = max(0, fy0), min(n - 1, fy1)
                ntiles = (x1 - x0 + 1) * (y1 - y0 + 1)
                if row.kind == "polygon" and ntiles > FILL_TILE_THRESHOLD:
                    _cut_polygon_fill(out, row, gs, z, n, scale, buf, x0, x1, y0, y1)
                    continue
                _cut_tiles_grid(out, row, gs, z, n, scale, buf, x0, x1, y0, y1)
            yield pd.DataFrame(out)

    return exploded.mapInPandas(run, schema=TILE_FEATURE_SCHEMA)


def _cut_points(out, row, g, z, n, scale, buf, zb=None):
    pts = g[1].reshape(1, 2) if g[0] == "Point" else np.asarray(g[1])
    gsize = row.grid_size_z
    bx0, bx1, by0, by1 = zb if zb is not None else (0, n - 1, 0, n - 1)
    for px, py in np.asarray(pts, dtype=np.float64):
        gx, gy = px * scale, py * scale  # global px at z
        if gsize is not None and not (isinstance(gsize, float) and np.isnan(gsize)) and gsize > 0:
            cell = (int(gx // gsize) << 31) | int(gy // gsize)
        else:
            cell = None
        tx0, tx1 = int((gx - buf) // TILE_EXTENT), int((gx + buf) // TILE_EXTENT)
        ty0, ty1 = int((gy - buf) // TILE_EXTENT), int((gy + buf) // TILE_EXTENT)
        for tx in range(max(tx0, 0, bx0), min(tx1, n - 1, bx1) + 1):
            for ty in range(max(ty0, 0, by0), min(ty1, n - 1, by1) + 1):
                lx, ly = gx - tx * TILE_EXTENT, gy - ty * TILE_EXTENT
                local = np.array([lx, ly]).tobytes()
                _emit_row(out, row, z, tx, ty, local, cell, lx, ly)


def _cut_polygon_fill(out, row, gs, z, n, scale, buf, x0, x1, y0, y1):
    """Fill path for giant polygons: classify tiles via a tile-grid raster;
    interior tiles emit a full-cover rectangle, boundary tiles exact-clip."""
    from ..geom import raster

    polys = [gs[1]] if gs[0] == "Polygon" else list(gs[1])
    cols, rows_n = x1 - x0 + 1, y1 - y0 + 1
    cell_w = 1.0 / n
    mask = raster.rasterize(polys, x0 * cell_w, y0 * cell_w, cell_w, (rows_n, cols))
    # boundary cells: any cell whose 3×3 neighborhood is not uniformly filled
    interior = raster.erode(mask, 1)
    edge_mask = _edge_cells(polys, x0, y0, cols, rows_n, n)
    boundary = (mask | edge_mask) & ~(interior & ~edge_mask)
    fill = interior & ~edge_mask
    fr, fc = np.nonzero(fill)
    rect = packed.pack(_fill_rect(buf))  # pack the canned rectangle once
    for r, c in zip(fr.tolist(), fc.tolist()):
        _emit_row(out, row, z, x0 + c, y0 + r, rect, None)
    br, bc = np.nonzero(boundary)
    for r, c in zip(br.tolist(), bc.tolist()):
        tx, ty = x0 + c, y0 + r
        bx0 = (tx * TILE_EXTENT - buf) / scale
        bx1 = ((tx + 1) * TILE_EXTENT + buf) / scale
        by0 = (ty * TILE_EXTENT - buf) / scale
        by1 = ((ty + 1) * TILE_EXTENT + buf) / scale
        cgeom = ops.clip_geom_box(gs, bx0, by0, bx1, by1)
        if cgeom is not None:
            _emit_row(out, row, z, tx, ty, _scale_to_tile(cgeom, tx, ty, n), None)


def _edge_cells(polys, x0, y0, cols, rows_n, n):
    """Cells crossed by any polygon edge (conservative supercover)."""
    mask = np.zeros((rows_n, cols), dtype=bool)
    for rings in polys:
        for ring in rings:
            c = np.asarray(ring) * n  # tile units
            cx, cy = c[:, 0] - x0, c[:, 1] - y0
            for i in range(len(c) - 1):
                _mark_segment(mask, cx[i], cy[i], cx[i + 1], cy[i + 1], cols, rows_n)
    return mask


def _mark_segment(mask, ax, ay, bx, by, cols, rows_n):
    steps = int(max(abs(bx - ax), abs(by - ay)) * 2) + 1
    ts = np.linspace(0.0, 1.0, steps + 1)
    xs = np.clip((ax + (bx - ax) * ts).astype(np.int64), 0, cols - 1)
    ys = np.clip((ay + (by - ay) * ts).astype(np.int64), 0, rows_n - 1)
    # mark a 1-cell neighborhood to stay conservative at corners
    for dx in (-1, 0, 1):
        for dy in (-1, 0, 1):
            mask[np.clip(ys + dy, 0, rows_n - 1), np.clip(xs + dx, 0, cols - 1)] = True


# -------------------------------------------------------------- fused stage


class _ZRow:
    """Per-(feature, z) view handed to the emit/cut helpers (same attribute
    surface as the staged pipeline's exploded row)."""

    __slots__ = (
        "layer", "doc_id", "elem_id", "kind", "attrs_z", "sort_key",
        "grid_limit_z", "grid_size_z", "buffer_z", "z",
    )

    def __init__(self, layer, doc_id, elem_id, kind, sort_key):
        self.layer = layer
        self.doc_id = doc_id
        self.elem_id = elem_id
        self.kind = kind
        self.sort_key = sort_key


def _entry_get(e, k):
    # Arrow hands struct elements over as dicts; Rows expose [] too
    return e[k]


def bounds_tile_ranges(bounds, max_zoom: int):
    """Per-zoom inclusive tile ranges covering a (lonmin, latmin, lonmax,
    latmax) box — planetiler TileExtents parity: a tile is in range iff its
    extent intersects the closed bounds box."""
    bw, bs, be, bn = bounds
    xs, ys = mercator.lonlat_to_world(np.array([bw, be]), np.array([bs, bn]))
    wx0, wx1 = float(xs.min()), float(xs.max())
    wy0, wy1 = float(ys.min()), float(ys.max())
    out = {}
    for z in range(max_zoom + 1):
        n = 1 << z
        out[z] = (
            max(0, int(np.floor(wx0 * n))),
            min(n - 1, int(np.floor(wx1 * n))),
            max(0, int(np.floor(wy0 * n))),
            min(n - 1, int(np.floor(wy1 * n))),
        )
    return out


def render_tiles_fused(
    features: DataFrame,
    max_zoom: int = MAX_ZOOM,
    default_tol: float = DEFAULT_TOLERANCE_PX,
    bounds=None,
    algo: str = "dp",
) -> DataFrame:
    """features → per-tile features in ONE mapInPandas pass.

    Semantics identical to tile_cut(zoom_explode(prepare_geoms(df))) — the
    staged pipeline kept for unit-level parity tests — but the zoom loop runs
    in-process per feature, so:

      * geometry crosses the JVM↔Python Arrow boundary ONCE per feature
        (the staged form shipped the world-WKT out of stage A and back into
        stage C duplicated per zoom — ~7× the geometry bytes at z0-14);
      * the geometry is parsed once and its Douglas-Peucker retention
        thresholds computed once per feature, then reused across zooms;
      * zoom-gated attrs resolve incrementally (sorted entries applied as z
        advances) instead of per-row array filtering.

    Python-side byte traffic is the scaling limiter on wide nodes (measured:
    this host's per-core throughput drops ~26% when 32 memory-bound workers
    run vs 8), so halving Arrow bytes buys both wall time and N→4N scaling
    efficiency. At 100 TB the win compounds: the explode amplification never
    hits the exchange."""
    cols = [
        "doc_id", "elem_id", "layer", "form", "geom_wkt", "attrs", "zattrs",
        "minzoom", "maxzoom", "buffer_px", "buffer_overrides",
        "min_pixel_size", "mps_overrides", "sort_key", "grid",
    ]
    src_df = features.select(*cols)
    # --bounds: per-zoom allowed tile ranges, clamped inside the render loop
    # (planetiler FeatureRenderer + TileExtents: out-of-bounds tiles are
    # never cut, so the partial-build cost is proportional to the box)
    zbounds = bounds_tile_ranges(bounds, max_zoom) if bounds is not None else None
    # --simplify-algorithm: per-vertex retention thresholds share one
    # storage contract, so DP vs Visvalingam-Whyatt is a free swap here
    if algo not in ("dp", "vw"):
        raise ValueError(f"simplify_algorithm must be 'dp' or 'vw', got {algo!r}")
    thr_fn = ops.geom_vw_thresholds if algo == "vw" else ops.geom_dp_thresholds

    def run(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            out = {f.name: [] for f in TILE_FEATURE_SCHEMA.fields}
            it = zip(*(pdf[c].tolist() for c in cols))
            for (doc_id, elem_id, layer, form, geom_wkt, attrs, zattrs,
                 minzoom, maxzoom, buffer_px, buf_ov, mps, mps_ov,
                 sort_key, grid) in it:
                z0 = 0 if minzoom is None else max(0, int(minzoom))
                z1 = max_zoom if maxzoom is None else min(max_zoom, int(maxzoom))
                if z0 > z1:
                    continue
                try:
                    src = wkt.parse_wkt(geom_wkt)
                    g = _resolve_form(src, form) if src is not None else None
                except (ValueError, IndexError):
                    g = None
                if g is None:
                    continue
                g = _to_world(g)
                x0w, y0w, x1w, y1w = ops.bbox(g)
                gk = wkt.geom_kind(g)
                src_kind = wkt.geom_kind(src)
                # pixel gates measure the SOURCE geometry (planetiler
                # setMinPixelSize semantics, WaterName.java:246-257)
                if src_kind == "polygon":
                    sw = _to_world(src) if form != "polygon" else g
                    size_world = float(np.sqrt(max(ops.geom_area(sw), 0.0)))
                elif src_kind == "linestring":
                    sw = _to_world(src) if form != "line" else g
                    size_world = float(ops.geom_length(sw))
                else:
                    size_world = 0.0
                attrs = _attrs_dict(attrs)
                if attrs.get("_numpoints") == "__computed__":
                    attrs = dict(attrs)
                    attrs["_numpoints"] = str(len(ops._all_coords(g)))
                # zoom-gated attrs: base overwritten by entries with
                # minzoom <= z, applied in (minzoom, array order) — the
                # LAST_WIN map_concat of the staged form
                zs = sorted(
                    (_entry_get(e, "minzoom"), i, _entry_get(e, "key"), _entry_get(e, "value"))
                    for i, e in enumerate(zattrs if zattrs is not None else [])
                    if _entry_get(e, "minzoom") is not None
                )
                mps_sorted = sorted(
                    ((_entry_get(o, "below_zoom"), _entry_get(o, "size"))
                     for o in (mps_ov if mps_ov is not None else [])
                     if _entry_get(o, "below_zoom") is not None),
                )
                buf_map = {
                    _entry_get(o, "zoom"): _entry_get(o, "size")
                    for o in (buf_ov if buf_ov is not None else [])
                }
                grid_list = [
                    (_entry_get(gr, "minzoom"), _entry_get(gr, "maxzoom"),
                     _entry_get(gr, "size"), _entry_get(gr, "limit"))
                    for gr in (grid if grid is not None else [])
                ]
                tol_fn = LAYER_TOLERANCE.get(layer)
                row = _ZRow(layer, doc_id, elem_id, gk, sort_key)
                cur_attrs = attrs
                ptr = 0
                thrs = False
                for z in range(z0, z1 + 1):
                    if ptr < len(zs) and zs[ptr][0] <= z:
                        cur_attrs = dict(cur_attrs)
                        while ptr < len(zs) and zs[ptr][0] <= z:
                            cur_attrs[zs[ptr][2]] = zs[ptr][3]
                            ptr += 1
                    mps_z = mps
                    for bz, sz in mps_sorted:
                        if z <= bz:
                            mps_z = sz
                            break
                    n = 1 << z
                    scale = n * TILE_EXTENT  # px per world unit
                    if src_kind != "point" and z != max_zoom:
                        # the pixel gate (skipped at max zoom: overzooming)
                        if mps_z is None or not (size_world * scale >= mps_z):
                            continue
                    gsz = glim = None
                    for gmn, gmx, gsize, glimit in grid_list:
                        if gmn is not None and gmx is not None and gmn <= z <= gmx:
                            gsz, glim = gsize, glimit
                            break
                    row.attrs_z = cur_attrs
                    row.grid_size_z = gsz
                    row.grid_limit_z = glim if glim is not None else 0
                    buf = buf_map.get(z, buffer_px)
                    row.buffer_z = buf
                    buf = float(buf)
                    buf_world = buf / scale
                    row.z = z
                    zb = zbounds[z] if zbounds is not None else None
                    if gk == "point":
                        _cut_points(out, row, g, z, n, scale, buf, zb)
                        continue
                    if thrs is False:
                        thrs = thr_fn(g)
                    tol_px = tol_fn(z, cur_attrs, default_tol) if tol_fn else default_tol
                    gs = (
                        ops.simplify_with_thresholds(g, thrs, tol_px / scale)
                        if tol_px > 0
                        else g
                    )
                    if gs is None:
                        continue
                    fx0 = int(np.floor((x0w - buf_world) * n))
                    fx1 = int(np.floor((x1w + buf_world) * n))
                    fy0 = int(np.floor((y0w - buf_world) * n))
                    fy1 = int(np.floor((y1w + buf_world) * n))
                    if fx0 == fx1 and fy0 == fy1 and 0 <= fx0 < n and 0 <= fy0 < n:
                        if zb is None or (zb[0] <= fx0 <= zb[1] and zb[2] <= fy0 <= zb[3]):
                            _emit_row(out, row, z, fx0, fy0, _scale_to_tile(gs, fx0, fy0, n), None)
                        continue
                    tx0, tx1 = max(0, fx0), min(n - 1, fx1)
                    ty0, ty1 = max(0, fy0), min(n - 1, fy1)
                    if zb is not None:
                        tx0, tx1 = max(tx0, zb[0]), min(tx1, zb[1])
                        ty0, ty1 = max(ty0, zb[2]), min(ty1, zb[3])
                        if tx0 > tx1 or ty0 > ty1:
                            continue
                    ntiles = (tx1 - tx0 + 1) * (ty1 - ty0 + 1)
                    if gk == "polygon" and ntiles > FILL_TILE_THRESHOLD:
                        _cut_polygon_fill(out, row, gs, z, n, scale, buf, tx0, tx1, ty0, ty1)
                        continue
                    _cut_tiles_grid(out, row, gs, z, n, scale, buf, tx0, tx1, ty0, ty1)
            if out["z"]:  # empty frames infer float64 cols Arrow can't map-cast
                yield pd.DataFrame(out)

    return src_df.mapInPandas(run, schema=TILE_FEATURE_SCHEMA)


# -------------------------------------------------------------- full stage


def render_tiles_staged(
    features: DataFrame,
    max_zoom: int = MAX_ZOOM,
    default_tol: float = DEFAULT_TOLERANCE_PX,
) -> DataFrame:
    """Staged A/B/C form (kept as the parity reference for the fused path;
    see test_tiling fused-vs-staged equivalence)."""
    return tile_cut(zoom_explode(prepare_geoms(features), max_zoom), default_tol)


def render_tiles(
    features: DataFrame,
    max_zoom: int = MAX_ZOOM,
    default_tol: float = DEFAULT_TOLERANCE_PX,
    bounds=None,
    algo: str = "dp",
) -> DataFrame:
    """features → per-tile features, before tile reduction (fused pass)."""
    return render_tiles_fused(features, max_zoom, default_tol, bounds, algo)
