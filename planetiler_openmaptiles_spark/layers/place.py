"""`place` layer — continents, countries, states, islands, cities.

Reference: layers/Place.java (NE indexes :165-201, continent :208-218,
country J5 :220-257, state J5 :259-283, islands :285-310, city J4 kNN+name
join :312-383, grid-rank postProcess :394-404).

Spark shape: the three NE side tables are tiny → broadcast; J5 (PIP) runs
as a broadcast cross join + exact contains/distance refinement; J4 (cities
within 50 km) runs as a z9 cell-kRing equi-join + distance filter + match
predicate, then argmin-distance per OSM city.
"""

from __future__ import annotations

import math

import pandas as pd
from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F

from .. import spatial
from ..features import (
    SortKeyPacker,
    WORLD_CIRCUMFERENCE_METERS,
    attr_entries,
    emit,
    grid_entry,
    union_features,
)
from ..schema.layers import LAYER_BUFFERS
from ..tiling import postprocess
from .util import names_col, names_map, names_zattrs_col, nullif_empty, tag

BUFFER = LAYER_BUFFERS["place"]  # 256

MIN_ISLAND_WORLD_AREA = 4.0 ** -26
CITY_JOIN_DISTANCE = 50_000.0 / WORLD_CIRCUMFERENCE_METERS
MAX_CITY_POPULATION = 100_000_000.0
MAJOR_CITY_PLACES = ("city", "town", "village")
PLACE_TYPES = ["city", "town", "village", "hamlet", "suburb", "quarter",
               "neighbourhood", "isolated_dwelling"]
SORT_KEY_BITS = 23


def _sq_meters_to_world_area(m2: float) -> float:
    return (math.sqrt(m2) / WORLD_CIRCUMFERENCE_METERS) ** 2


# area → rank thresholds (Place.java:101-108): rank = ceilingEntry(area)
AREA_RANKS = [
    (_sq_meters_to_world_area(1_000_000), 6),
    (_sq_meters_to_world_area(15_000_000), 5),
    (_sq_meters_to_world_area(40_000_000), 4),
    (_sq_meters_to_world_area(160_000_000), 3),
    (_sq_meters_to_world_area(640_000_000), 2),
]


def _area_rank(area: F.Column) -> F.Column:
    c = F.lit(1)
    for thresh, rank in AREA_RANKS:
        c = F.when(area <= F.lit(thresh), F.lit(rank)).otherwise(c)
    return c


def _names_with_en_fallback(en_fallback: F.Column) -> F.Column:
    """getNames + name_en fallback from the NE region name."""
    names = names_col()
    return F.when(
        F.element_at(names, "name_en").isNull() & en_fallback.isNotNull(),
        F.map_concat(names, F.create_map(F.lit("name_en"), en_fallback)),
    ).otherwise(names)


def _ne_regions(ctx, table: str, *rank_fields: str) -> DataFrame:
    ne = ctx.natural_earth(table)
    ranks = [tag(f).cast("double") for f in rank_fields]
    avg = sum(ranks[1:], ranks[0]) / F.lit(float(len(ranks)))
    rank = F.coalesce(F.ceil(avg).cast("int"), F.lit(6))
    return ne.select(
        tag("name").alias("ne_region_name"),
        rank.alias("ne_rank"),
        F.col("geom_wkt").alias("ne_wkt"),
        F.col("elem_id").alias("ne_id"),
        *[tag(f).cast("double").alias(f) for f in rank_fields],
    )


def transform(ctx) -> DataFrame:
    parts = []

    # --- continent (Place.java:208-218)
    cont = ctx.table("osm_continent_point").filter(nullif_empty(F.col("name")).isNotNull())
    parts.append(
        cont.select(
            *emit(
                "place", "point",
                attrs=F.map_concat(
                    attr_entries(**{"class": F.lit("continent"), "rank": F.lit(1)}),
                    names_col(),
                ),
                minzoom=0, maxzoom=3, buffer_px=BUFFER,
            )
        )
    )

    # --- country (J5: centroid in NE country poly, else nearest)
    countries = _ne_regions(ctx, "ne_10m_admin_0_countries", "scalerank", "labelrank")
    cp = ctx.table("osm_country_point").filter(nullif_empty(F.col("name")).isNotNull())
    iso = F.coalesce(
        nullif_empty(F.col("country_code_iso3166_1_alpha_2")),
        nullif_empty(F.col("iso3166_1_alpha_2")),
        nullif_empty(F.col("iso3166_1")),
    )
    cp = cp.filter(iso.isNotNull()).withColumn("_iso", iso)
    cand = cp.join(F.broadcast(countries), F.lit(True), "left")
    cand = cand.withColumn(
        "_contains", spatial.contains_point_udf(F.col("ne_wkt"), F.col("geom_wkt"))
    ).withColumn("_dist", spatial.point_distance_udf(F.col("geom_wkt"), F.col("ne_wkt")))
    w = Window.partitionBy("doc_id").orderBy(
        F.col("_contains").desc(), F.col("_dist").asc(), F.col("ne_id").asc()
    )
    best = cand.withColumn("_rn", F.row_number().over(w)).filter(F.col("_rn") == 1)
    rank = F.greatest(F.lit(1), F.least(F.lit(6), F.coalesce(F.col("ne_rank"), F.lit(7))))
    parts.append(
        best.select(
            *emit(
                "place", "point",
                attrs=F.map_concat(
                    attr_entries(**{"iso_a2": F.col("_iso"), "class": F.lit("country"),
                                    "rank": rank}),
                    _names_with_en_fallback(F.col("ne_region_name")),
                ),
                minzoom=rank - 1, buffer_px=BUFFER, sort_key=rank,
            )
        )
    )

    # --- state (J5: only if contained in a pre-filtered NE state poly)
    states = _ne_regions(
        ctx, "ne_10m_admin_1_states_provinces", "scalerank", "labelrank", "datarank"
    ).filter((F.col("scalerank") <= 6) & (F.col("labelrank") <= 7))
    sp = ctx.table("osm_state_point")
    scand = sp.join(F.broadcast(states), F.lit(True), "inner")
    scand = scand.filter(spatial.contains_point_udf(F.col("ne_wkt"), F.col("geom_wkt")))
    sw = Window.partitionBy("doc_id").orderBy(F.col("ne_id").asc())
    sbest = scand.withColumn("_rn", F.row_number().over(sw)).filter(F.col("_rn") == 1)
    srank = F.greatest(F.lit(1), F.least(F.lit(6), F.col("ne_rank")))
    parts.append(
        sbest.select(
            *emit(
                "place", "point",
                attrs=F.map_concat(
                    attr_entries(**{"class": F.col("place"), "rank": srank}),
                    _names_with_en_fallback(F.col("ne_region_name")),
                ),
                minzoom=2, buffer_px=BUFFER, sort_key=srank,
            )
        )
    )

    # --- islands (area-ranked polygon labels + z12 points)
    ip = spatial.with_geom_stats(ctx.table("osm_island_polygon"))
    irank = _area_rank(F.col("area"))
    iminzoom = F.when(irank <= 3, 8).when(irank <= 4, 9).otherwise(10)
    isort = SortKeyPacker().desc_log(F.col("area"), MIN_ISLAND_WORLD_AREA, 1.0, 1 << (SORT_KEY_BITS - 1)).key()
    parts.append(
        ip.select(
            *emit(
                "place", "point_on_surface",
                attrs=F.map_concat(
                    attr_entries(**{"class": F.lit("island"), "rank": irank}), names_col()
                ),
                minzoom=iminzoom, buffer_px=BUFFER, sort_key=isort,
            )
        )
    )
    ipt = ctx.table("osm_island_point")
    parts.append(
        ipt.select(
            *emit(
                "place", "point",
                attrs=F.map_concat(
                    attr_entries(**{"class": F.lit("island"), "rank": F.lit(7)}), names_col()
                ),
                minzoom=12, buffer_px=BUFFER,
            )
        )
    )

    # --- boundary polygons (aboriginal lands — Place.java:385-398)
    bp = spatial.with_geom_stats(ctx.table("osm_boundary_polygon"))
    brank = _area_rank(F.col("area"))
    parts.append(
        bp.select(
            *emit(
                "place", "point_on_surface",
                attrs=F.map_concat(
                    attr_entries(**{"class": F.col("boundary"), "rank": brank}), names_col()
                ),
                minzoom=F.when(brank <= 4, brank + 5).otherwise(10),
                buffer_px=BUFFER,
            )
        )
    )

    # --- cities (J4 kNN + name/wikidata match against NE populated places)
    parts.append(_cities(ctx))
    return union_features(parts)


def _cities(ctx) -> DataFrame:
    cp = ctx.table("osm_city_point")
    ne = ctx.natural_earth("ne_10m_populated_places").select(
        F.col("elem_id").alias("ne_id"),
        tag("name").alias("ne_name"),
        tag("wikidataid").alias("ne_wikidata"),
        tag("scalerank").cast("int").alias("ne_scalerank"),
        F.array_distinct(
            F.filter(
                F.array(
                    F.lower(tag("name")), F.lower(tag("namealt")), F.lower(tag("meganame")),
                    F.lower(tag("name_en")), F.lower(tag("nameascii")),
                ),
                lambda v: v.isNotNull(),
            )
        ).alias("ne_names"),
        F.col("geom_wkt").alias("ne_wkt"),
    )
    ne = ne.withColumn("cell", spatial.point_cell(F.col("ne_wkt"), zoom=9))

    major = cp.filter(F.col("place").isin(*MAJOR_CITY_PLACES))
    probe = major.select(
        "doc_id",
        F.col("geom_wkt").alias("pt_wkt"),
        F.lower(F.coalesce(F.col("name"), F.lit(""))).alias("_lname"),
        F.lower(F.coalesce(F.col("name_en"), F.lit(""))).alias("_lname_en"),
        spatial.strip_accents_udf(F.coalesce(F.col("name"), F.lit(""))).alias("_norm_name"),
        F.coalesce(tag("wikidata"), F.lit("")).alias("_wd"),
    ).withColumn("cell", F.explode(spatial.point_kring(F.col("pt_wkt"), 50_000.0, zoom=9)))

    cand = probe.join(F.broadcast(ne), "cell")
    cand = cand.withColumn(
        "_dist", spatial.point_distance_udf(F.col("pt_wkt"), F.col("ne_wkt"))
    ).filter(F.col("_dist") <= CITY_JOIN_DISTANCE)
    matched = cand.filter(
        (F.col("_wd") == F.col("ne_wikidata"))
        | F.array_contains(F.col("ne_names"), F.col("_lname"))
        | F.array_contains(F.col("ne_names"), F.col("_lname_en"))
        | (F.col("_norm_name") == F.col("ne_name"))
    )
    w = Window.partitionBy("doc_id").orderBy(F.col("_dist").asc(), F.col("ne_id").asc())
    winner = (
        matched.withColumn("_rn", F.row_number().over(w))
        .filter(F.col("_rn") == 1)
        .select(
            F.col("doc_id"),
            F.when(F.col("ne_scalerank") <= 5, F.col("ne_scalerank") + 1)
            .otherwise(F.col("ne_scalerank"))
            .alias("_ne_rank"),
        )
    )
    cp = cp.join(winner, "doc_id", "left")
    rank = F.col("_ne_rank")

    place_ord = F.array_position(
        F.array(*[F.lit(p) for p in PLACE_TYPES]), F.col("place")
    )  # 1-based; 0 = unknown
    place_ord = F.when(place_ord == 0, F.lit(16)).otherwise(place_ord)  # unknown last

    minzoom = (
        F.when(rank == 1, F.lit(2))
        .when(rank.isNotNull() & (rank <= 8), F.greatest(F.lit(3), rank - 1))
        .when(place_ord <= 2, F.lit(7))   # city, town
        .when(place_ord <= 3, F.lit(8))   # village
        .when(place_ord <= 5, F.lit(11))  # hamlet, suburb
        .otherwise(F.lit(14))
    )
    population = F.coalesce(F.col("population").cast("long"), F.lit(0))
    sort_key = (
        SortKeyPacker()
        .asc(F.coalesce(rank, F.lit(15)), 0, 15)
        .asc(place_ord - 1, 0, 15)
        .desc_log(F.greatest(population, F.lit(1)).cast("double"), 1.0, MAX_CITY_POPULATION,
                  1 << (SORT_KEY_BITS - 13) - 1)
        .asc(F.least(F.length(F.coalesce(F.col("name"), F.lit(""))), F.lit(31)), 0, 31)
        .key()
    )
    capital = (
        F.when(F.col("capital").isin("2", "yes"), F.lit(2))
        .when(F.col("capital").isin("3", "4", "5", "6"), F.col("capital").cast("int"))
    )
    # label grid: 128px at z<=12; top-k limits only when no NE rank
    grid = F.when(
        rank.isNull(),
        F.array(
            grid_entry(0, 8, 128.0, 4),
            grid_entry(9, 9, 128.0, 8),
            grid_entry(10, 10, 128.0, 12),
            grid_entry(11, 12, 128.0, 14),
        ),
    ).otherwise(F.array(grid_entry(0, 12, 128.0, 0)))

    return cp.select(
        *emit(
            "place", "point",
            attrs=F.map_concat(
                attr_entries(
                    **{"class": F.col("place"), "rank": rank, "capital": capital}
                ),
                names_col(),
            ),
            minzoom=minzoom, buffer_px=BUFFER, sort_key=sort_key, grid=grid,
        )
    )


def _post_process(zoom: int, pdf: pd.DataFrame) -> pd.DataFrame:
    """rank = 10 + JVM grid order when absent (Place.java:394-404); grid_rank
    comes from ``grid_windows`` — stateless per-row map, salt safe."""
    ranks = pdf["grid_rank"]
    new_attrs = []
    for i in range(len(pdf)):
        a = postprocess._as_dict(pdf["attrs"].iloc[i])
        if "rank" not in a:
            a["rank"] = str(10 + int(ranks.iloc[i]))
        new_attrs.append(a)
    out = pdf[["elem_id", "kind", "geom_px"]].copy()
    out["attrs"] = new_attrs
    return out


postprocess.register_post_processor("place", _post_process)
