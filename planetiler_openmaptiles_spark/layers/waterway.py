"""`waterway` layer — rivers/streams/canals.

Reference: layers/Waterway.java (NE rivers z3-5 :121-138, river relations
z6-8 :146-182 with A1 total-length aggregation, OSM ways z9+ :186-203,
length-filtered line merge :205-231).

A1 (river relation total length) is a groupBy(rel_id).sum(length) joined
back — the effective minzoom within 6..8 is computed from the aggregate so
the per-zoom post-process drop becomes a plain column filter (thresholds
decrease monotonically with z).
"""

from __future__ import annotations

import pandas as pd
from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from .. import spatial
from ..features import (
    attr_entries,
    emit,
    meter_thresholds_buffer,
    meters_to_px,
    meters_to_world,
    mps_below,
    union_features,
    zattr,
    zattrs_array,
)
from ..schema.layers import LAYER_BUFFERS
from ..tiling import postprocess
from .util import bool_int, brunnel, names_col, names_map, names_zattrs, names_zattrs_col, nullif_empty

BUFFER = LAYER_BUFFERS["waterway"]

CLASS_MINZOOM = {"river": 12, "canal": 12, "stream": 13, "drain": 13, "ditch": 13}

# zoom → meters (Waterway.java:111-117)
MIN_PIXEL_LENGTHS = {6: 500_000, 7: 400_000, 8: 300_000, 9: 8_000, 10: 4_000, 11: 1_000}


def transform(ctx) -> DataFrame:
    parts = []

    # NE rivers z3-5 (Waterway.java:121-138)
    ne = ctx.natural_earth(
        "ne_110m_rivers_lake_centerlines", "ne_50m_rivers_lake_centerlines"
    ).filter(F.element_at(F.col("tags"), "featurecla") == "River")
    mz = F.when(F.col("source_layer") == "ne_110m_rivers_lake_centerlines", 3).otherwise(4)
    xz = F.when(F.col("source_layer") == "ne_110m_rivers_lake_centerlines", 3).otherwise(5)
    parts.append(
        ne.select(
            *emit("waterway", "line",
                  attrs=attr_entries(**{"class": F.lit("river")}),
                  minzoom=mz, maxzoom=xz, buffer_px=BUFFER)
        )
    )

    # river relations z6-8 (J1 membership + A1 length aggregate)
    feats = ctx.features
    rel_ways = feats.select(
        "doc_id", "elem_id", "geom_wkt", "geom_kind",
        F.explode(F.coalesce(F.col("rels"), F.array().cast(
            "array<struct<rel_id:long,role:string,rel_tags:map<string,string>>>"))).alias("r"),
    ).filter(
        (F.col("geom_kind") == "linestring")
        & (F.element_at(F.col("r.rel_tags"), "waterway") == "river")
        & F.element_at(F.col("r.rel_tags"), "name").isNotNull()
        & ((F.col("r.role") == "") | F.col("r.role").isNull() | (F.col("r.role") == "main_stream"))
    )
    rel_ways = spatial.with_geom_stats(rel_ways)
    rel_len = rel_ways.groupBy("r.rel_id").agg(F.sum("length").alias("_rel_len"))
    rel_ways = rel_ways.join(F.broadcast(rel_len), F.col("r.rel_id") == rel_len["rel_id"]).drop(rel_len["rel_id"])
    rel_names = F.map_from_entries(
        F.filter(
            F.map_entries(F.col("r.rel_tags")),
            lambda e: e["key"].startswith("name"),
        )
    )
    parts.append(
        rel_ways.select(
            *emit(
                "waterway", "line",
                attrs=F.map_concat(
                    attr_entries(**{
                        "class": F.lit("river"),
                        "_relid": F.col("r.rel_id"),
                        "_rellen": F.col("_rel_len"),
                    }),
                    names_map(F.col("r.rel_tags")),
                ),
                minzoom=6, maxzoom=8, buffer_px=BUFFER, min_pixel_size=0.0,
            )
        )
    )

    # OSM ways z9+ (Waterway.java:186-203)
    ww = ctx.table("osm_waterway_linestring")
    name = nullif_empty(F.col("name"))
    important = (F.col("waterway") == "river") & name.isNotNull()
    class_mz = F.lit(14)
    for cls, z in CLASS_MINZOOM.items():
        class_mz = F.when(F.col("waterway") == cls, F.lit(z)).otherwise(class_mz)
    minzoom = F.when(important, F.lit(9)).otherwise(class_mz)
    parts.append(
        ww.select(
            *emit(
                "waterway", "line",
                attrs=F.map_concat(
                    attr_entries(**{"class": F.col("waterway")}), names_col()
                ),
                zattrs=zattrs_array(
                    zattr("brunnel", 12, brunnel(F.col("is_bridge"), F.col("is_tunnel"))),
                    zattr("intermittent", 12, bool_int(F.col("is_intermittent"))),
                ),
                minzoom=minzoom, buffer_px=BUFFER,
                buffer_overrides=meter_thresholds_buffer(MIN_PIXEL_LENGTHS),
                mps_overrides=F.array(mps_below(11, 0.0)),
            )
        )
    )
    return union_features(parts)


def _post_process(zoom: int, pdf: pd.DataFrame) -> pd.DataFrame:
    """Merge linestrings with per-zoom min length (Waterway.java:205-231)."""
    cols = ["elem_id", "kind", "geom_px", "attrs"]
    if 6 <= zoom <= 8:
        # drop relation rivers whose total length misses the zoom threshold
        # (Waterway.java:206-215), then merge
        min_size = meters_to_world(MIN_PIXEL_LENGTHS[zoom])
        keep = []
        for i in range(len(pdf)):
            a = postprocess._as_dict(pdf["attrs"].iloc[i])
            if "_relid" in a and float(a.get("_rellen", "0")) < min_size:
                continue
            keep.append(i)
        pdf = pdf.iloc[keep].copy()
        # reference strips _relid BEFORE merging, so same-name ways from
        # different relations do merge (Waterway.java:210-216)
        pdf["attrs"] = [
            {k: v for k, v in postprocess._as_dict(a).items() if not k.startswith("_")}
            for a in pdf["attrs"]
        ]
        return postprocess.merge_line_strings(pdf, 1.0, 0.1, BUFFER)
    if 9 <= zoom <= 11:
        return postprocess.merge_line_strings(
            pdf, meters_to_px(MIN_PIXEL_LENGTHS[zoom], zoom), 0.1, BUFFER
        )
    out = pdf[cols].copy()
    out["attrs"] = [
        {k: v for k, v in postprocess._as_dict(a).items() if not k.startswith("_")}
        for a in out["attrs"]
    ]
    return out


postprocess.register_post_processor("waterway", _post_process)
