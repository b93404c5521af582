"""`park` layer — protected-area polygons + label points.

Reference: layers/Park.java (class mapping :99-119, polygon + label emit
:121-155, area-based label minzoom :157-163, label-grid rank stamping +
low-zoom merge :166-180).
"""

from __future__ import annotations

import math

import pandas as pd
from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from ..features import (
    SortKeyPacker,
    WORLD_CIRCUMFERENCE_METERS,
    attr_entries,
    emit,
    grid_entry,
    union_features,
    zattr,
    zattrs_array,
)
from ..schema.layers import LAYER_BUFFERS
from ..spatial import with_geom_stats
from ..tiling import postprocess
from .util import names_col, names_map, names_zattrs, names_zattrs_col, nullif_empty, tag

BUFFER = LAYER_BUFFERS["park"]

WORLD_AREA_FOR_70K_M2 = (math.sqrt(70_000) / WORLD_CIRCUMFERENCE_METERS) ** 2
SMALLEST_PARK_WORLD_AREA = 4.0 ** -26
SORT_KEY_BITS = 23  # planetiler SortKey space

PROTECT_CLASS_MAP = {
    "1a": "conservation",
    "1b": "wilderness_preserve",
    "2": "national_park",
    "3": "conservation",
    "4": "wildlife_refuge",
    "5": "conservation",
    "6": "sustainable",
}


def _park_class() -> F.Column:
    pc_map = F.create_map(*[F.lit(x) for kv in PROTECT_CLASS_MAP.items() for x in kv])
    return (
        F.when(F.col("maritime"), F.lit("marine"))
        .when(F.col("boundary") == "national_park", F.lit("national_park"))
        .when(
            F.col("boundary") == "protected_area",
            F.coalesce(
                nullif_empty(F.col("protected_area")),
                F.when(
                    nullif_empty(F.col("protect_class")).isNotNull(),
                    F.element_at(pc_map, F.col("protect_class")),
                ),
                nullif_empty(F.col("protection_title")),
                F.lit("protected_area"),
            ),
        )
        .when(F.col("leisure") == "nature_reserve", F.lit("nature_reserve"))
        .when(F.col("leisure") == "recreation_ground", F.lit("recreation_ground"))
        .when(
            F.col("historic").isNotNull() & (F.col("historic") != ""), F.lit("historic")
        )
        .otherwise(F.lit("nature_reserve"))
    )


def transform(ctx) -> DataFrame:
    pk = ctx.table("osm_park_polygon")
    if "maritime" not in pk.columns:
        pk = pk.withColumn(
            "maritime",
            F.coalesce(F.lower(tag("maritime")).isin("yes", "true", "1"), F.lit(False)),
        )
    if "historic" not in pk.columns:
        pk = pk.withColumn("historic", tag("historic"))
    if "protected_area" not in pk.columns:
        pk = pk.withColumn("protected_area", tag("protected_area"))
    pk = pk.withColumn("_class", _park_class())

    parts = [
        # park outline polygon (class + names gated at z5)
        pk.select(
            *emit(
                "park",
                "polygon",
                attrs=attr_entries(),
                zattrs=F.concat(
                    zattrs_array(zattr("class", 5, F.col("_class"))),
                    F.when(
                        F.col("name").isNotNull(), names_zattrs_col(5)
                    ).otherwise(F.array().cast("array<struct<key:string,minzoom:int,value:string>>")),
                ),
                minzoom=4,
                buffer_px=BUFFER,
                min_pixel_size=2.0,
            )
        )
    ]

    # label point (pointOnSurface) with area-based minzoom + label grid + sort key
    named = with_geom_stats(pk.filter(F.col("name").isNotNull()))
    minzoom = F.floor(
        F.lit(20) - F.log2(F.col("area") / F.lit(WORLD_AREA_FOR_70K_M2))
    ).cast("int")
    minzoom = F.greatest(F.lit(5), F.least(F.lit(14), minzoom))
    has_wiki = tag("wikipedia").isNotNull() | tag("wikidata").isNotNull()
    sort_key = (
        SortKeyPacker()
        .trues_first(F.col("_class") == "national_park")
        .trues_first(has_wiki)
        .desc_log(
            F.col("area"), SMALLEST_PARK_WORLD_AREA, 1.0, 1 << (SORT_KEY_BITS - 2) - 1
        )
        .key()
    )
    parts.append(
        named.select(
            *emit(
                "park",
                "point_on_surface",
                attrs=F.map_concat(
                    attr_entries(**{"class": F.col("_class")}), names_col()
                ),
                minzoom=minzoom,
                buffer_px=256.0,
                sort_key=sort_key,
                grid=F.array(grid_entry(0, 14, 100.0, 0)),
            )
        )
    )
    return union_features(parts)


def _post_process(zoom: int, pdf: pd.DataFrame) -> pd.DataFrame:
    """Stamp rank from label-grid order; merge polygons at z<=4
    (Park.java:166-180)."""
    out = pdf.copy()
    new_attrs = []
    for i in range(len(out)):
        a = postprocess._as_dict(out["attrs"].iloc[i])
        # reference stamps rank ONLY for grouped points (hasGroup()) —
        # grid_rank is now always set, so gate on grid_cell instead
        cell = out["grid_cell"].iloc[i] if "grid_cell" in out.columns else None
        gr = out["grid_rank"].iloc[i] if "grid_rank" in out.columns else None
        if (
            out["kind"].iloc[i] == "point"
            and cell is not None
            and not pd.isna(cell)
            and gr is not None
            and not pd.isna(gr)
        ):
            a["rank"] = str(int(gr))
        new_attrs.append(a)
    out["attrs"] = new_attrs
    if zoom <= 4:
        return postprocess.merge_overlapping_polygons(out, 0.0)
    return out[["elem_id", "kind", "geom_px", "attrs"]]


postprocess.register_post_processor("park", _post_process)
