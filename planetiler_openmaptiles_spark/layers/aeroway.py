"""`aeroway` layer — reference layers/Aeroway.java:59-83."""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from ..features import attr_entries, emit, union_features
from ..schema.layers import LAYER_BUFFERS

BUFFER = LAYER_BUFFERS["aeroway"]


def transform(ctx) -> DataFrame:
    def attrs():
        return attr_entries(**{"class": F.col("aeroway"), "ref": F.col("ref")})

    poly = ctx.table("osm_aeroway_polygon").select(
        *emit("aeroway", "polygon", attrs=attrs(), minzoom=10, buffer_px=BUFFER,
              min_pixel_size=2.0)
    )
    line = ctx.table("osm_aeroway_linestring").select(
        *emit("aeroway", "line", attrs=attrs(), minzoom=10, buffer_px=BUFFER)
    )
    point = ctx.table("osm_aeroway_point").select(
        *emit("aeroway", "point", attrs=attrs(), minzoom=14, buffer_px=BUFFER)
    )
    return union_features([poly, line, point])
