"""`water_name` layer — ocean/sea/lake/bay labels.

Reference: layers/WaterName.java (lake centerlines :110-131, NE marine
registry :134-149, J3 fuzzy-name marine join :151-185, marine points
:187-216, water-polygon labels incl. centerline swap J7 :218-260).

Spark shape: lake centerlines aggregate per osm id (groupBy + geometry
combine) then equi-join to named water polygons (J7). The NE marine
registry is tiny → collected once and broadcast into an Arrow UDF that
reproduces the exact lookup order (name, name:en, name:es, then
ceilingEntry-prefix) + 50 km distance accept (J3).
"""

from __future__ import annotations

import bisect

import numpy as np
import pandas as pd
from pyspark.sql import DataFrame
from pyspark.sql import functions as F
from pyspark.sql import types as T

from .. import spatial
from ..features import WORLD_CIRCUMFERENCE_METERS, attr_entries, emit, union_features
from ..schema.layers import LAYER_BUFFERS
from .util import bool_int, names_col, names_map, names_zattrs_col, nullif_empty

BUFFER = LAYER_BUFFERS["water_name"]  # 256

MARINE_JOIN_DISTANCE = 50_000.0 / WORLD_CIRCUMFERENCE_METERS
MINZOOM_BAY = 9
MINZOOM_LAKE = 3


def _marine_registry(ctx) -> list[tuple[str, int, str]]:
    """(normalized name, scalerank, wkt) sorted by name — tiny, driver-side
    (the reference's ConcurrentSkipListMap)."""
    rows = (
        ctx.natural_earth("ne_10m_geography_marine_polys")
        .select(
            F.element_at(F.col("tags"), "name").alias("name"),
            F.element_at(F.col("tags"), "scalerank").cast("int").alias("scalerank"),
            F.col("geom_wkt"),
        )
        .filter(F.col("name").isNotNull() & F.col("scalerank").isNotNull())
        .collect()
    )
    reg = {}
    for r in rows:
        key = " ".join(r["name"].split()).strip().lower()
        reg[key] = (r["scalerank"], r["geom_wkt"])
    return sorted((k, v[0], v[1]) for k, v in reg.items())


def _marine_rank_udf(registry: list[tuple[str, int, str]]):
    keys = [r[0] for r in registry]

    @F.pandas_udf(T.IntegerType())
    def lookup(name: pd.Series, name_en: pd.Series, name_es: pd.Series, wkt: pd.Series) -> pd.Series:
        from ..geom import ops
        from ..spatial import _parse_world

        out = []
        for n, ne, ns, w in zip(name, name_en, name_es, wkt):
            res = None
            n = (n or "").lower()
            for probe in (n, (ne or "").lower(), (ns or "").lower()):
                if probe:
                    i = bisect.bisect_left(keys, probe)
                    if i < len(keys) and keys[i] == probe:
                        res = registry[i]
                        break
            if res is None and n:
                i = bisect.bisect_left(keys, n)
                if i < len(keys) and keys[i].startswith(n):
                    res = registry[i]
            if res is not None:
                gp = _parse_world(w)
                gr = _parse_world(res[2])
                if gp is not None and gr is not None and gp[0] == "Point":
                    if ops.point_geom_dist(gp[1], gr) <= MARINE_JOIN_DISTANCE:
                        out.append(res[1])
                        continue
            out.append(None)
        return pd.Series(out, dtype="object")

    return lookup


@F.pandas_udf(T.StringType())
def _combine_lines_udf(wkts: pd.Series) -> pd.Series:
    """GeoUtils.combine for centerline fragments (array<wkt> → one wkt)."""
    from ..geom import wkt as wktmod

    out = []
    for arr in wkts:
        lines = []
        for w in arr:
            g = wktmod.parse_wkt(w)
            if g is None:
                continue
            if g[0] == "LineString":
                lines.append(np.asarray(g[1]))
            elif g[0] == "MultiLineString":
                lines.extend(np.asarray(l) for l in g[1])
        if not lines:
            out.append(None)
        elif len(lines) == 1:
            out.append(wktmod.to_wkt(("LineString", lines[0])))
        else:
            out.append(wktmod.to_wkt(("MultiLineString", lines)))
    return pd.Series(out)


def transform(ctx) -> DataFrame:
    parts = []

    # --- marine points (J3)
    mp = ctx.table("osm_marine_point").filter(
        F.col("name").isNotNull() & (F.trim(F.col("name")) != "")
    )
    registry = _marine_registry(ctx)
    ne_rank = (
        _marine_rank_udf(registry)(
            F.col("name"),
            F.coalesce(F.col("name_en"), F.lit("")),
            F.coalesce(F.col("name_es"), F.lit("")),
            F.col("geom_wkt"),
        )
        if registry
        else F.lit(None).cast("int")
    )
    clazz = F.coalesce(nullif_empty(F.col("natural")), nullif_empty(F.col("place")))
    rank = F.coalesce(ne_rank, F.col("rank").cast("int"))
    minzoom = (
        F.when(F.col("place") == "ocean", F.lit(0))
        .when(rank.isNotNull(), rank)
        .when(F.col("natural") == "bay", F.lit(13))
        .otherwise(F.lit(8))
    )
    parts.append(
        mp.select(
            *emit(
                "water_name", "point",
                attrs=F.map_concat(
                    attr_entries(**{"class": clazz,
                                    "intermittent": bool_int(F.col("is_intermittent"))}),
                    names_col(),
                ),
                minzoom=minzoom, buffer_px=BUFFER,
            )
        )
    )

    # --- named water polygons (J7 centerline swap)
    wp = ctx.table("osm_water_polygon").filter(
        nullif_empty(F.col("name")).isNotNull()
        & ~F.coalesce(F.col("leisure") == "swimming_pool", F.lit(False))
    )
    cl = (
        ctx.source("lake_centerlines")
        .groupBy("elem_id")
        .agg(F.collect_list("geom_wkt").alias("_wkts"))
        .select(F.col("elem_id").alias("_cl_id"), _combine_lines_udf(F.col("_wkts")).alias("_cl_wkt"))
    )
    wp = wp.join(F.broadcast(cl), wp["elem_id"] == cl["_cl_id"], "left").drop("_cl_id")
    clazz = (
        F.when(F.col("natural") == "bay", F.lit("bay"))
        .when(F.col("place") == "sea", F.lit("sea"))
        .otherwise(F.lit("lake"))
    )
    minzoom_cl = F.when(clazz == "lake", F.lit(MINZOOM_LAKE)).otherwise(F.lit(MINZOOM_BAY))
    base_attrs = F.map_concat(
        attr_entries(**{"class": clazz, "intermittent": bool_int(F.col("is_intermittent"))}),
        names_col(),
    )
    has_cl = F.col("_cl_wkt").isNotNull()
    name_len_px = F.lit(6.0) * F.length(F.col("name")).cast("double")

    # centerline line feature (z >= minzoomCL)
    parts.append(
        wp.filter(has_cl).select(
            *emit(
                "water_name", "line",
                geom=F.col("_cl_wkt"),
                attrs=base_attrs,
                minzoom=minzoom_cl, buffer_px=BUFFER,
                mps_overrides=F.array(
                    F.struct(F.lit(13).cast("int").alias("below_zoom"),
                             name_len_px.alias("size"))
                ),
            )
        )
    )

    # label point (when no centerline, or below the centerline minzoom)
    pt_minzoom = F.when(F.col("place").isin("sea", "ocean"), F.lit(0)).otherwise(F.lit(MINZOOM_LAKE))
    pt = wp.filter(~has_cl | (pt_minzoom < minzoom_cl))
    parts.append(
        pt.select(
            *emit(
                "water_name", "point_on_surface",
                attrs=base_attrs,
                minzoom=pt_minzoom,
                maxzoom=F.when(has_cl, minzoom_cl - 1).otherwise(F.lit(14)),
                buffer_px=BUFFER,
                mps_overrides=F.array(
                    F.struct(F.lit(13).cast("int").alias("below_zoom"),
                             F.lit(128.0).alias("size"))
                ),
            )
        )
    )
    return union_features(parts)
