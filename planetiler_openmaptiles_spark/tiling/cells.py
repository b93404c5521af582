"""JVM-side web-mercator tile / cell math as Spark Column expressions.

This is the engine's spatial-index convention (replaces the reference's
in-RAM STRtree/PreparedGeometry indexes — SURVEY.md §4): geometries are
keyed by quadtree cells (= web-mercator tiles at a fixed CELL_ZOOM), and
spatial-predicate joins become salted hash equi-joins on cell keys followed
by exact geometric refinement in Arrow UDFs.

Everything here is pure `pyspark.sql.functions` — no Python in the hot path;
Catalyst folds the constants and the expressions stay in whole-stage codegen.
Mirrors the numpy math in geom/mercator.py (kept bit-identical: same clamp,
same formulas).
"""

from __future__ import annotations

import math

from pyspark.sql import Column
from pyspark.sql import functions as F

CELL_ZOOM = 14  # default index resolution: ~2.4 km cells at the equator
MAX_LAT = 85.05112878


def world_x(lon: Column) -> Column:
    return (lon + F.lit(180.0)) / F.lit(360.0)


def world_y(lat: Column) -> Column:
    clamped = F.greatest(F.lit(-MAX_LAT), F.least(F.lit(MAX_LAT), lat))
    siny = F.sin(F.radians(clamped))
    return F.lit(0.5) - F.log((F.lit(1.0) + siny) / (F.lit(1.0) - siny)) / F.lit(4 * math.pi)


def tile_coord(world: Column, zoom: Column | int) -> Column:
    """floor(world * 2^z) clamped into [0, 2^z - 1]."""
    z = zoom if isinstance(zoom, Column) else F.lit(zoom)
    n = F.pow(F.lit(2.0), z.cast("double"))
    c = F.floor(world.cast("double") * n).cast("long")
    return F.greatest(F.lit(0).cast("long"), F.least(c, (n - 1).cast("long")))


def pack_cell(x: Column, y: Column, zoom: Column | int) -> Column:
    """(z, x, y) → int64 cell key: z<<58 | x<<29 | y  (z ≤ 30)."""
    z = (zoom if isinstance(zoom, Column) else F.lit(zoom)).cast("long")
    return F.shiftleft(z, 58) + F.shiftleft(x.cast("long"), 29) + y.cast("long")


def cell_of_lonlat(lon: Column, lat: Column, zoom: int = CELL_ZOOM) -> Column:
    return pack_cell(tile_coord(world_x(lon), zoom), tile_coord(world_y(lat), zoom), zoom)


def cell_x(cell: Column) -> Column:
    return F.shiftright(cell, 29).bitwiseAND(F.lit((1 << 29) - 1).cast("long"))


def cell_y(cell: Column) -> Column:
    return cell.bitwiseAND(F.lit((1 << 29) - 1).cast("long"))


def cell_z(cell: Column) -> Column:
    return F.shiftright(cell, 58)


def kring_cells(cell: Column, k: int = 1) -> Column:
    """Array of the (2k+1)² neighbor cells (clamped at the grid edge,
    deduplicated). Used for within-distance joins: index points at CELL_ZOOM,
    explode the kRing of the probe side, equi-join on cell."""
    z = cell_z(cell)
    n = F.pow(F.lit(2.0), z.cast("double")).cast("long")
    x, y = cell_x(cell), cell_y(cell)
    offsets = [(dx, dy) for dx in range(-k, k + 1) for dy in range(-k, k + 1)]
    neigh = [
        pack_cell(
            F.greatest(F.lit(0).cast("long"), F.least(n - 1, x + F.lit(dx))),
            F.greatest(F.lit(0).cast("long"), F.least(n - 1, y + F.lit(dy))),
            z,
        )
        for dx, dy in offsets
    ]
    return F.array_distinct(F.array(*neigh))


def bbox_cover_cells(
    min_lon: Column, min_lat: Column, max_lon: Column, max_lat: Column, zoom: int = CELL_ZOOM, cap: int = 4096
) -> Column:
    """Array of cells covering a lon/lat bbox at `zoom` (capped; generated
    JVM-side with sequence × sequence — no Python). Candidate set for
    polygon spatial joins; exact refinement happens after the equi-join.

    Note web-mercator y is flipped vs latitude: max_lat → min ty."""
    x0 = tile_coord(world_x(min_lon), zoom)
    x1 = tile_coord(world_x(max_lon), zoom)
    y0 = tile_coord(world_y(max_lat), zoom)
    y1 = tile_coord(world_y(min_lat), zoom)
    xs = F.sequence(x0, F.least(x1, x0 + F.lit(cap)))
    ys = F.sequence(y0, F.least(y1, y0 + F.lit(cap)))
    return F.flatten(F.transform(xs, lambda x: F.transform(ys, lambda y: pack_cell(x, y, zoom))))


def meters_to_world_units(meters: float, ref_lat: float = 0.0) -> float:
    """Constant conversion for distance thresholds (driver-side)."""
    circumference = 40075016.686 * math.cos(math.radians(ref_lat))
    return meters / circumference


def cells_within_meters(lon: Column, lat: Column, meters: float, zoom: int = CELL_ZOOM) -> Column:
    """kRing sized to guarantee coverage of a `meters` radius at `zoom`
    (equator-conservative). 50 km at z14 → k=2."""
    cell_world = 1.0 / (1 << zoom)
    k = max(1, math.ceil(meters_to_world_units(meters) / cell_world))
    return kring_cells(cell_of_lonlat(lon, lat, zoom), k)
