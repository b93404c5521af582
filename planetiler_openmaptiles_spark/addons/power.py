"""Example addon layer: `power` — transmission lines and towers.

Demonstrates the documented extension path (reference
`addons/ExtraLayers.java:12-19` + README.md:66-113): a custom layer that
subscribes to raw OSM elements (no generated table needed), emits rendered
features through the standard ``emit`` helper, and registers a tile
post-processor, all without touching engine code. Enable with::

    Config(addons=("planetiler_openmaptiles_spark.addons.power",))
"""

from __future__ import annotations

import pandas as pd
from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from ..features import attr_entries, emit, union_features
from ..tiling import postprocess

LAYER_NAME = "power"
BUFFER = 4.0


def _tag(key):
    return F.element_at(F.col("tags"), key)


def transform(ctx) -> DataFrame:
    osm = ctx.source("osm")
    lines = osm.filter(
        (F.col("geom_kind") == "linestring") & _tag("power").isin("line", "minor_line", "cable")
    ).select(
        *emit(
            LAYER_NAME, "line",
            attrs=attr_entries(**{
                "class": _tag("power"),
                "voltage": _tag("voltage"),
            }),
            minzoom=9, buffer_px=BUFFER,
        )
    )
    towers = osm.filter(
        (F.col("geom_kind") == "point") & _tag("power").isin("tower", "pole")
    ).select(
        *emit(
            LAYER_NAME, "point",
            attrs=attr_entries(**{"class": _tag("power")}),
            minzoom=13, buffer_px=BUFFER,
        )
    )
    return union_features([lines, towers])


def _post_process(zoom: int, pdf: pd.DataFrame) -> pd.DataFrame:
    # merge connected line segments with identical attrs, like the built-in
    # transportation layer does
    pts = pdf[pdf["kind"] == "point"][["elem_id", "kind", "geom_px", "attrs"]]
    merged = postprocess.merge_line_strings(pdf[pdf["kind"] == "linestring"], buffer_px=BUFFER)
    return pd.concat([merged, pts], ignore_index=True) if len(pts) else merged


postprocess.register_post_processor(LAYER_NAME, _post_process)
