"""Rendered-feature schema + collector helpers (FeatureCollector parity).

A "rendered feature" row is the Spark analog of the reference's
`FeatureCollector.Feature` (SURVEY.md §1.1): target layer, requested
geometry form, attr map (with optional zoom-gated attrs), zoom window,
buffer px, pixel-size gates, sort key and label-grid spec.

Layer transform modules build these rows with plain `select` projections so
the whole per-feature stage stays inside whole-stage codegen; only the tile
explode and tile post-process stages drop into Arrow-batched pandas.

Reference parity targets: FeatureCollector emitters used across layers,
e.g. layers/Transportation.java:514-540, layers/Place.java:353-359,
layers/MountainPeak.java:117-139.
"""

from __future__ import annotations

from functools import lru_cache

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F
from pyspark.sql import types as T

from . import exprs as X

TILE_EXTENT = 256  # px per tile edge (reference buffer units)

# geometry forms a layer may request (F9 in SURVEY.md §2.2)
FORMS = (
    "point",
    "line",
    "polygon",
    "centroid",
    "point_on_surface",
    "centroid_if_convex",
)

ZATTR_TYPE = T.ArrayType(
    T.StructType(
        [
            T.StructField("key", T.StringType()),
            T.StructField("minzoom", T.IntegerType()),
            T.StructField("value", T.StringType()),
        ]
    )
)

GRID_TYPE = T.ArrayType(
    T.StructType(
        [
            T.StructField("minzoom", T.IntegerType()),
            T.StructField("maxzoom", T.IntegerType()),
            T.StructField("size", T.DoubleType()),
            T.StructField("limit", T.IntegerType()),
        ]
    )
)

MPS_TYPE = T.ArrayType(
    T.StructType(
        [
            T.StructField("below_zoom", T.IntegerType()),
            T.StructField("size", T.DoubleType()),
        ]
    )
)

BUF_TYPE = T.ArrayType(
    T.StructType(
        [
            T.StructField("zoom", T.IntegerType()),
            T.StructField("size", T.DoubleType()),
        ]
    )
)

WORLD_CIRCUMFERENCE_METERS = 40075016.686


def meters_to_px(meters: float, zoom: int) -> float:
    """planetiler GeoUtils.metersToPixelAtEquator(zoom, meters)."""
    return meters * TILE_EXTENT * (1 << zoom) / WORLD_CIRCUMFERENCE_METERS


def meters_to_world(meters: float) -> float:
    return meters / WORLD_CIRCUMFERENCE_METERS


def meter_thresholds_buffer(thresholds: dict[int, float]) -> Column:
    """ZoomFunction.MeterToPixelThresholds as per-zoom buffer overrides
    (reference setBufferPixelOverrides — layers/Waterway.java:202)."""
    return _meter_thresholds_buffer(tuple(sorted(thresholds.items())))


@lru_cache(maxsize=1024)
def _meter_thresholds_buffer(items: tuple) -> Column:
    return F.array(
        *[
            F.struct(
                X.const(z, "int", "zoom"),
                X.const(meters_to_px(m, z), None, "size"),
            )
            for z, m in items
        ]
    )

FEATURE_COLUMNS = [
    "doc_id",
    "elem_id",
    "layer",
    "form",
    "geom_wkt",
    "attrs",
    "zattrs",
    "minzoom",
    "maxzoom",
    "buffer_px",
    "buffer_overrides",
    "min_pixel_size",
    "mps_overrides",
    "sort_key",
    "grid",
]


def attr_entries(**attrs: Column | str | int | float | None) -> Column:
    """Build a map<string,string> attr column; null values are omitted
    (reference `nullIfEmpty` convention, util/Utils.java:31-49).

    Built as map_filter(create_map(k1, v1, …)) — key literals come from
    the process-wide expression cache and the whole map is a handful of
    py4j calls instead of ~6 per attr (the old struct-array-filter form);
    entry order and null-dropping semantics are identical."""
    if not attrs:
        return X.expr("map_filter(map('', ''), (k, v) -> false)")
    kv = []
    for k, v in attrs.items():
        kv.append(X.lit(k))
        if isinstance(v, Column):
            kv.append(v.cast("string"))
        else:
            kv.append(X.const(v, "string"))
    return F.map_filter(F.create_map(*kv), lambda k, v: v.isNotNull())


def zattr(key: str, minzoom: Column | int, value: Column) -> Column:
    """One zoom-gated attr entry: active at z >= minzoom
    (reference setAttrWithMinzoom / ZoomFunction)."""
    if isinstance(minzoom, Column):
        mz = minzoom.cast("int").alias("minzoom")
    else:
        mz = X.const(minzoom, "int", "minzoom")
    return F.struct(
        X.const(key, None, "key"),
        mz,
        value.cast("string").alias("value"),
    )


# DDL text of the array types above (for the cached null-literal casts)
ZATTR_DDL = "array<struct<key:string,minzoom:int,value:string>>"
GRID_DDL = "array<struct<minzoom:int,maxzoom:int,size:double,limit:int>>"
MPS_DDL = "array<struct<below_zoom:int,size:double>>"
BUF_DDL = "array<struct<zoom:int,size:double>>"


def zattrs_array(*entries: Column) -> Column:
    if not entries:
        return X.const(None, ZATTR_DDL)
    return F.filter(F.array(*entries), lambda e: e["value"].isNotNull())


@lru_cache(maxsize=4096)
def grid_entry(minzoom: int, maxzoom: int, size: float, limit: int = 0) -> Column:
    return F.struct(
        X.const(minzoom, "int", "minzoom"),
        X.const(maxzoom, "int", "maxzoom"),
        X.const(float(size), None, "size"),
        X.const(limit, "int", "limit"),
    )


@lru_cache(maxsize=4096)
def mps_below(below_zoom: int, size: float) -> Column:
    """setMinPixelSizeBelowZoom(z, s): gate applies at zoom <= z
    (planetiler ZoomFunction.maxZoom semantics — WaterTest asserts
    _minpixelsize 2 at z11 for setMinPixelSizeBelowZoom(11, 2))."""
    return F.struct(
        X.const(below_zoom, "int", "below_zoom"),
        X.const(float(size), None, "size"),
    )


def emit(
    layer: str,
    form: str | Column,
    *,
    geom: Column | None = None,
    attrs: Column | None = None,
    zattrs: Column | None = None,
    minzoom: Column | int = 0,
    maxzoom: Column | int = 14,
    buffer_px: Column | float = 4.0,
    buffer_overrides: Column | None = None,
    min_pixel_size: Column | float = 1.0,
    mps_overrides: Column | None = None,
    sort_key: Column | int = 0,
    grid: Column | None = None,
) -> list[Column]:
    """Column list for one rendered feature (append id columns yourself via
    the standard doc_id/elem_id pass-through). Constant arguments (the
    common case for zoom windows, buffers, sort keys) come from the
    process-wide expression cache — zero py4j traffic on reuse."""

    def _c(v, typ, alias):
        if isinstance(v, Column):
            c = v.cast(typ) if typ else v
            return c.alias(alias)
        return X.const(v, typ, alias)

    return [
        X.col("doc_id"),
        X.col("elem_id"),
        X.const(layer, None, "layer"),
        _c(form, None, "form"),
        (geom.alias("geom_wkt") if geom is not None else X.aliased("geom_wkt", "geom_wkt")),
        (attrs if attrs is not None else attr_entries()).alias("attrs"),
        (zattrs.alias("zattrs") if zattrs is not None else X.const(None, ZATTR_DDL, "zattrs")),
        _c(minzoom, "int", "minzoom"),
        _c(maxzoom, "int", "maxzoom"),
        _c(buffer_px, "double", "buffer_px"),
        (buffer_overrides.alias("buffer_overrides") if buffer_overrides is not None
         else X.const(None, BUF_DDL, "buffer_overrides")),
        _c(min_pixel_size, "double", "min_pixel_size"),
        (mps_overrides.alias("mps_overrides") if mps_overrides is not None
         else X.const(None, MPS_DDL, "mps_overrides")),
        _c(sort_key, "int", "sort_key"),
        (grid.alias("grid") if grid is not None else X.const(None, GRID_DDL, "grid")),
    ]


def empty_features(spark) -> DataFrame:
    schema = T.StructType(
        [
            T.StructField("doc_id", T.StringType()),
            T.StructField("elem_id", T.LongType()),
            T.StructField("layer", T.StringType()),
            T.StructField("form", T.StringType()),
            T.StructField("geom_wkt", T.StringType()),
            T.StructField("attrs", T.MapType(T.StringType(), T.StringType())),
            T.StructField("zattrs", ZATTR_TYPE),
            T.StructField("minzoom", T.IntegerType()),
            T.StructField("maxzoom", T.IntegerType()),
            T.StructField("buffer_px", T.DoubleType()),
            T.StructField("buffer_overrides", BUF_TYPE),
            T.StructField("min_pixel_size", T.DoubleType()),
            T.StructField("mps_overrides", MPS_TYPE),
            T.StructField("sort_key", T.IntegerType()),
            T.StructField("grid", GRID_TYPE),
        ]
    )
    return spark.createDataFrame([], schema)


def union_features(dfs: list[DataFrame]) -> DataFrame:
    """unionByName over layer outputs (SURVEY.md §2.7).

    Balanced-tree union: every Dataset transformation re-runs the analyzer
    over its whole subtree, so a left-deep chain of n unions costs
    O(n²) analyzer node-visits while a balanced tree costs O(n log n) —
    measurable driver wall at 16 layers, structurally the same plan."""
    dfs = [df.select(*[X.col(c) for c in FEATURE_COLUMNS]) for df in dfs]
    while len(dfs) > 1:
        dfs = [
            dfs[i].unionByName(dfs[i + 1]) if i + 1 < len(dfs) else dfs[i]
            for i in range(0, len(dfs), 2)
        ]
    return dfs[0]


# --------------------------------------------------------------- sort keys
# Reference packs multi-field orderings into one int (SortKey; SURVEY.md
# §2.6). We reproduce the packing so rank stamping (A6/A7) sees the same
# order. Fields are packed most-significant-first.


class SortKeyPacker:
    """Build `sort_key` int expressions by packing ordered fields.

    Mirrors planetiler's SortKey.orderByInt/orderByLog/orderByTruesFirst:
    each field occupies ceil(log2(levels)) of the key, most-significant
    first; ascending packs the value, descending packs (levels-1 - value).
    """

    def __init__(self):
        self._expr = F.lit(0)

    def _push(self, value: Column, levels: int) -> "SortKeyPacker":
        self._expr = self._expr * F.lit(levels) + F.greatest(
            F.lit(0), F.least(F.lit(levels - 1), value.cast("int"))
        )
        return self

    def asc(self, value: Column, lo: int, hi: int) -> "SortKeyPacker":
        return self._push(value - F.lit(lo), hi - lo + 1)

    def desc(self, value: Column, lo: int, hi: int) -> "SortKeyPacker":
        return self._push(F.lit(hi) - value, hi - lo + 1)

    def trues_first(self, cond: Column) -> "SortKeyPacker":
        return self._push(F.when(cond, F.lit(0)).otherwise(F.lit(1)), 2)

    def asc_log(self, value: Column, lo: float, hi: float, buckets: int) -> "SortKeyPacker":
        """log-scale ascending bucket (planetiler orderByLog)."""
        import math

        v = F.greatest(F.lit(float(lo)), F.least(F.lit(float(hi)), value.cast("double")))
        scaled = (F.log(v / F.lit(float(lo))) / F.lit(math.log(hi / lo))) * F.lit(buckets - 1)
        return self._push(F.round(scaled).cast("int"), buckets)

    def desc_log(self, value: Column, lo: float, hi: float, buckets: int) -> "SortKeyPacker":
        import math

        v = F.greatest(F.lit(float(lo)), F.least(F.lit(float(hi)), value.cast("double")))
        scaled = (F.log(v / F.lit(float(lo))) / F.lit(math.log(hi / lo))) * F.lit(buckets - 1)
        return self._push(F.lit(buckets - 1) - F.round(scaled).cast("int"), buckets)

    def key(self) -> Column:
        return self._expr.cast("int")
