"""`building` layer — reference layers/Building.java:75-190.

J1 (building relation outline → hide_3d) comes from the document's `rel`
spans instead of the reference's two-pass relation replay.
"""

from __future__ import annotations

import pandas as pd
from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from ..features import attr_entries, emit, union_features, zattr, zattrs_array
from ..schema.layers import LAYER_BUFFERS
from ..tiling import postprocess
from .util import nullif_empty, parse_meters, tag

BUFFER = LAYER_BUFFERS["building"]

MATERIAL_COLORS = {
    "cement_block": "#6a7880", "brick": "#bd8161", "plaster": "#dadbdb",
    "wood": "#d48741", "concrete": "#d3c2b0", "metal": "#b7b1a6",
    "stone": "#b4a995", "mud": "#9d8b75", "steel": "#b7b1a6",
    "glass": "#5a81a0", "traditional": "#bd8161", "masonry": "#bd8161",
    "Brick": "#bd8161", "tin": "#b7b1a6", "timber_framing": "#b3b0a9",
    "sandstone": "#b4a995", "clay": "#9d8b75",
}


def transform(ctx) -> DataFrame:
    b = ctx.table("osm_building_polygon")
    hide3d = F.exists(
        F.coalesce(F.col("rels"), F.array().cast("array<struct<rel_id:long,role:string,rel_tags:map<string,string>>>")),
        lambda r: (r["role"] == "outline")
        & (F.element_at(r["rel_tags"], "type") == "building"),
    )
    color_map = F.create_map(*[F.lit(x) for kv in MATERIAL_COLORS.items() for x in kv])
    color = F.coalesce(F.col("colour"), F.element_at(color_map, F.col("material")))
    color = F.lower(color)

    height = parse_meters(
        F.coalesce(nullif_empty(F.col("height")), nullif_empty(tag("building:height")))
    )
    min_height = parse_meters(
        F.coalesce(nullif_empty(F.col("min_height")), nullif_empty(tag("building:min_height")))
    )
    levels = F.coalesce(
        nullif_empty(F.col("levels")).cast("double"),
        nullif_empty(tag("building:levels")).cast("double"),
    )
    min_levels = F.coalesce(
        nullif_empty(F.col("min_level")).cast("double"),
        nullif_empty(tag("building:min_level")).cast("double"),
    )
    render_height = F.ceil(
        F.coalesce(height, levels * F.lit(3.66), F.lit(5.0))
    ).cast("int")
    render_min_height = F.floor(
        F.coalesce(min_height, min_levels * F.lit(3.66), F.lit(0.0))
    ).cast("int")

    merge_z13 = ctx.config.building_merge_z13
    b = b.filter((render_height < 3660) & (render_min_height < 3660))
    return union_features([
        b.select(
            *emit(
                "building",
                "polygon",
                attrs=attr_entries(),
                zattrs=zattrs_array(
                    zattr("render_height", 14, render_height),
                    zattr("render_min_height", 14, render_min_height),
                    zattr("colour", 14, color),
                    zattr("hide_3d", 14, F.when(hide3d, F.lit("true"))),
                ),
                minzoom=13,
                buffer_px=BUFFER,
                min_pixel_size=0.1 if merge_z13 else 2.0,
                sort_key=render_height,
            )
        )
    ])


def _post_process(zoom: int, pdf: pd.DataFrame) -> pd.DataFrame:
    if zoom == 13:
        return postprocess.merge_nearby_polygons(pdf, 4.0, 4.0, 0.5, 0.5)
    return postprocess.merge_multi_polygon(pdf)


postprocess.register_post_processor("building", _post_process)
