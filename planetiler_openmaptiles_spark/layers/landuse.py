"""`landuse` layer.

Reference: layers/Landuse.java (NE urban areas :97-105, OSM polygons
:107-133, residential merge :135-157).
"""

from __future__ import annotations

import pandas as pd
from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from ..features import attr_entries, emit, mps_below, union_features
from ..schema.layers import LAYER_BUFFERS
from ..tiling import postprocess
from .util import nullif_empty

BUFFER = LAYER_BUFFERS["landuse"]

Z6_CLASSES = {"residential", "suburb", "quarter", "neighbourhood"}

# zoom → mergeNearbyPolygons min-dist/buffer (Landuse.java:79-86, ceilingEntry)
MINDIST_AND_BUFFER = [(5, 0.1), (6, 0.5), (7, 0.25), (8, 0.125)]
MINDIST_DEFAULT = 0.1


def transform(ctx) -> DataFrame:
    parts = []
    # NE urban areas (Landuse.java:97-105)
    ne = ctx.natural_earth("ne_50m_urban_areas")
    scalerank = F.element_at(F.col("tags"), "scalerank").cast("double")
    parts.append(
        ne.select(
            *emit(
                "landuse",
                "polygon",
                attrs=attr_entries(**{"class": F.lit("residential")}),
                minzoom=F.when(scalerank <= 2, F.lit(4)).otherwise(F.lit(5)),
                maxzoom=5,
                buffer_px=BUFFER,
            )
        )
    )

    lu = ctx.table("osm_landuse_polygon")
    clazz = F.coalesce(
        nullif_empty(F.col("landuse")),
        nullif_empty(F.col("amenity")),
        nullif_empty(F.col("leisure")),
        nullif_empty(F.col("tourism")),
        nullif_empty(F.col("place")),
        nullif_empty(F.col("waterway")),
    )
    clazz = F.when(clazz == "grave_yard", F.lit("cemetery")).otherwise(clazz)
    is_residential = clazz == "residential"
    lu = lu.withColumn("_class", clazz).filter(F.col("_class").isNotNull())
    parts.append(
        lu.select(
            *emit(
                "landuse",
                "polygon",
                attrs=attr_entries(**{"class": F.col("_class")}),
                minzoom=F.when(F.col("_class").isin(*Z6_CLASSES), F.lit(6)).otherwise(F.lit(9)),
                buffer_px=BUFFER,
                min_pixel_size=F.when(is_residential, F.lit(0.1)).otherwise(F.lit(1.0)),
                # non-residential: fromMaxZoomThresholds{13:4, 7:2, 6:1}
                mps_overrides=F.when(
                    is_residential, F.lit(None).cast("array<struct<below_zoom:int,size:double>>")
                ).otherwise(
                    F.array(mps_below(6, 1.0), mps_below(7, 2.0), mps_below(13, 4.0))
                ),
            )
        )
    )
    return union_features(parts)


# residential uses pixel tolerance 0.25 at every zoom (setPixelTolerance)
from ..tiling.explode import DEFAULT_TOLERANCE_PX, LAYER_TOLERANCE  # noqa: E402


def _mindist(zoom: int) -> float:
    for z, d in MINDIST_AND_BUFFER:
        if zoom <= z:
            return d
    return MINDIST_DEFAULT


def _post_process(zoom: int, pdf: pd.DataFrame) -> pd.DataFrame:
    cols = ["elem_id", "kind", "geom_px", "attrs"]
    res_mask = [postprocess._as_dict(a).get("class") == "residential" for a in pdf["attrs"]]
    keep = pdf[[not m for m in res_mask]][cols]
    to_merge = pdf[res_mask]
    if to_merge.empty:
        return keep
    if zoom <= 12:
        d = _mindist(zoom)
        merged = postprocess.merge_nearby_polygons(to_merge, 1.0, 1.0, d, d)
    else:
        merged = postprocess.merge_multi_polygon(to_merge)
    return pd.concat([keep, merged], ignore_index=True)


postprocess.register_post_processor("landuse", _post_process)
