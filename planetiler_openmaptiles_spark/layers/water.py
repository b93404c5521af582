"""`water` layer — oceans and lakes.

Reference: layers/Water.java (NE dispatch :105-160, osm ocean :170-176,
OSM water polygons :178-192, NE-lake OSM-id backfill :194-266, tile merge
:268-271). Class mapping: OpenMapTilesSchema.java:181-188.

Spark shape:
  * NE oceans / osm ocean polys / OSM water polygons: narrow projections.
  * J2 (NE lake ⋈ OSM lake id backfill): name equi-join (against the
    biggest-lake-per-name registry, A4) UNION cell-cover candidate join,
    exact raster intersection refinement, then argmax-per-NE-lake — the
    reference's "DISTINCT ON ... ORDER BY area_ratio DESC" replayed as
    groupBy(ne_id).agg(max_by(osm_id, intersection_area)). The NE side is
    tiny and broadcast; the OSM side is pre-filtered by the 4px area gate
    (OSM_ID_MATCH_AREA_LIMIT) before any UDF runs.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from .. import spatial
from ..features import attr_entries, emit, mps_below, union_features, zattr, zattrs_array
from ..schema.layers import LAYER_BUFFERS, WATER_CLASS_DEFAULT, WATER_CLASS_RULES
from ..tiling import postprocess
from .util import bool_int, brunnel, class_case

BUFFER = LAYER_BUFFERS["water"]

# smallest OSM lake worth an NE match: ~4px at z6 (Water.java:86-88)
OSM_ID_MATCH_AREA_LIMIT = 4.0 ** -20

NE_OCEANS = {"ne_110m_ocean": (0, 1), "ne_50m_ocean": (2, 4), "ne_10m_ocean": (5, 5)}
NE_LAKES = {"ne_110m_lakes": (0, 1), "ne_50m_lakes": (2, 3), "ne_10m_lakes": (4, 5)}

LAKE_JOIN_CELL_ZOOM = 9  # candidate-cell resolution for the intersects join


def _ne_zooms(mapping: dict) -> tuple:
    mz = F.lit(None).cast("int")
    xz = F.lit(None).cast("int")
    for table, (lo, hi) in mapping.items():
        mz = F.when(F.col("source_layer") == table, F.lit(lo)).otherwise(mz)
        xz = F.when(F.col("source_layer") == table, F.lit(hi)).otherwise(xz)
    return mz, xz


def transform(ctx) -> DataFrame:
    parts = []

    # --- NE oceans (Water.java:105-117)
    ne_ocean = ctx.natural_earth(*NE_OCEANS)
    mz, xz = _ne_zooms(NE_OCEANS)
    parts.append(
        ne_ocean.select(
            *emit(
                "water",
                "polygon",
                attrs=attr_entries(**{"class": F.lit("ocean")}),
                minzoom=mz,
                maxzoom=xz,
                buffer_px=BUFFER,
            )
        )
    )

    # --- ocean polygons from the water_polygons source (Water.java:170-176)
    parts.append(
        ctx.source("water_polygons").select(
            *emit(
                "water",
                "polygon",
                attrs=attr_entries(**{"class": F.lit("ocean")}),
                minzoom=6,
                buffer_px=BUFFER,
            )
        )
    )

    # --- OSM water polygons (Water.java:178-192)
    wp = ctx.table("osm_water_polygon").filter(
        ~F.coalesce(F.col("natural") == "bay", F.lit(False))
    )
    clazz = class_case(WATER_CLASS_RULES, WATER_CLASS_DEFAULT)
    parts.append(
        wp.select(
            *emit(
                "water",
                "polygon",
                attrs=attr_entries(
                    **{
                        "class": clazz,
                        "id": F.col("elem_id"),
                        "intermittent": bool_int(F.col("is_intermittent")),
                    }
                ),
                zattrs=zattrs_array(
                    zattr("brunnel", 12, brunnel(F.col("is_bridge"), F.col("is_tunnel")))
                ),
                minzoom=6,
                buffer_px=BUFFER,
                mps_overrides=F.array(mps_below(11, 2.0)),
            )
        )
    )

    # --- NE lakes with OSM id backfill (J2 — Water.java:118-160,194-266)
    parts.append(_ne_lakes_with_ids(ctx))

    return union_features(parts)


def _ne_lakes_with_ids(ctx) -> DataFrame:
    mz, xz = _ne_zooms(NE_LAKES)
    ne = (
        ctx.natural_earth(*NE_LAKES)
        .select(
            F.col("source_layer").alias("ne_table"),
            F.col("elem_id").alias("ne_id"),
            F.element_at(F.col("tags"), "name").alias("ne_name"),
            F.col("geom_wkt").alias("ne_wkt"),
            mz.alias("ne_minzoom"),
            xz.alias("ne_maxzoom"),
        )
    )
    ne = spatial.with_geom_stats(ne, "ne_wkt").withColumnRenamed("area", "ne_area")

    # biggest-lake-per-name registry, one per NE table (A4, Water.java:142-146)
    ne_named = (
        ne.filter(F.col("ne_name").isNotNull())
        .groupBy("ne_table", "ne_name")
        .agg(
            F.max_by(
                F.struct("ne_id", "ne_wkt"), F.struct(F.col("ne_area"), -F.col("ne_id"))
            ).alias("best")
        )
        .select("ne_table", "ne_name", "best.ne_id", "best.ne_wkt")
    )

    osm = ctx.table("osm_water_polygon").filter(
        ~F.coalesce(F.col("natural") == "bay", F.lit(False))
    )
    osm = (
        spatial.with_geom_stats(
            osm.select("elem_id", "name", "geom_wkt"), "geom_wkt"
        )
        .filter(F.col("area") >= F.lit(OSM_ID_MATCH_AREA_LIMIT))
        .select(
            F.col("elem_id").alias("osm_id"),
            F.col("name").alias("osm_name"),
            F.col("geom_wkt").alias("osm_wkt"),
        )
    )

    # path 1: name match against the per-table registries (short-circuits the
    # spatial path for that OSM element — Water.java:216-228)
    name_pairs = osm.filter(F.col("osm_name").isNotNull()).join(
        F.broadcast(ne_named), F.col("osm_name") == F.col("ne_name"), "inner"
    )
    name_matched_ids = name_pairs.select("osm_id").distinct()

    # path 2: cell-cover candidates for everything not name-matched
    # (per-geometry coarsened covers — a continent-sized polygon coarsens
    # its level instead of truncating, so no candidate is silently lost)
    cell_pairs = spatial.cover_join(
        osm.join(name_matched_ids, "osm_id", "left_anti"),
        ne.select("ne_table", "ne_id", "ne_wkt"),
        "osm_wkt", "ne_wkt", zoom=LAKE_JOIN_CELL_ZOOM, broadcast_b=True,
    )

    pairs = name_pairs.select("ne_table", "ne_id", "ne_wkt", "osm_id", "osm_wkt").unionByName(
        cell_pairs.select("ne_table", "ne_id", "ne_wkt", "osm_id", "osm_wkt")
    )
    scored = pairs.withColumn(
        "inter_area", spatial.intersection_area_udf(F.col("osm_wkt"), F.col("ne_wkt"))
    ).filter(F.col("inter_area") > 0)

    # argmax per NE lake: biggest intersection wins, ties → lowest OSM id
    winners = scored.groupBy("ne_table", "ne_id").agg(
        F.max_by(F.col("osm_id"), F.struct(F.col("inter_area"), -F.col("osm_id"))).alias("osm_id")
    )

    ne_out = ne.join(F.broadcast(winners), ["ne_table", "ne_id"], "left")
    return ne_out.select(
        F.concat(F.lit("natural_earth/"), F.col("ne_table"), F.lit("/"), F.col("ne_id")).alias(
            "doc_id"
        ),
        F.col("ne_id").alias("elem_id"),
        F.col("ne_wkt").alias("geom_wkt"),
        F.col("ne_minzoom").alias("minzoom_src"),
        F.col("ne_maxzoom").alias("maxzoom_src"),
        F.col("osm_id"),
    ).select(
        *emit(
            "water",
            "polygon",
            attrs=attr_entries(**{"class": F.lit("lake"), "id": F.col("osm_id")}),
            minzoom=F.col("minzoom_src"),
            maxzoom=F.col("maxzoom_src"),
            buffer_px=BUFFER,
        )
    )


def _post_process(zoom: int, pdf):
    """mergeOverlappingPolygons at the zoom's min feature size
    (Water.java:268-271; planetiler minFeatureSize: 1px² below max zoom)."""
    if len(pdf) <= 1:
        return pdf[["elem_id", "kind", "geom_px", "attrs"]]
    min_area = 0.0625 if zoom >= 14 else 1.0
    return postprocess.merge_overlapping_polygons(pdf, min_area)


postprocess.register_post_processor("water", _post_process)
