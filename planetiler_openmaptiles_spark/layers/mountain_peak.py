"""`mountain_peak` layer — peaks, ridges, US customary-feet tagging.

Reference: layers/MountainPeak.java (peaks :117-141, ridge lines :143-156,
US flag join J6 :101-113,158-173, grid-rank + buffer re-clip :176-204).
"""

from __future__ import annotations

import pandas as pd
from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from .. import spatial
from ..features import attr_entries, emit, grid_entry, union_features
from ..geom import packed
from ..schema.layers import LAYER_BUFFERS
from ..tiling import postprocess
from .util import names_col, names_map, names_zattrs_col, nullif_empty, parse_meters, tag

BUFFER = LAYER_BUFFERS["mountain_peak"]  # 64 — the *output* buffer


def transform(ctx) -> DataFrame:
    peaks = ctx.table("osm_peak_point")
    meters = parse_meters(F.col("ele"))
    named = nullif_empty(F.col("name")).isNotNull()
    has_wiki = nullif_empty(F.col("wikipedia")).isNotNull()
    keep = (meters.isNotNull() & (F.abs(meters) < 10000)) | named
    peaks = peaks.filter(keep).withColumn("_m", meters)

    # J6: customary_ft for peaks inside the US polygon (broadcast NE country)
    us = (
        ctx.natural_earth("ne_10m_admin_0_countries")
        .filter(F.element_at(F.col("tags"), "iso_a2") == "US")
        .select(F.col("geom_wkt").alias("_us_wkt"))
        .limit(1)
    )
    peaks = peaks.join(F.broadcast(us), F.lit(True), "left")
    in_us = F.when(
        F.col("_us_wkt").isNotNull(),
        spatial.contains_point_udf(F.col("_us_wkt"), F.col("geom_wkt")),
    ).otherwise(F.lit(False))

    ele_m = F.round(F.col("_m")).cast("int")
    ele_ft = F.round(F.col("_m") / F.lit(0.3048)).cast("int")
    sort_val = (
        F.coalesce(F.col("_m").cast("int"), F.lit(0))
        + F.when(has_wiki, F.lit(10000)).otherwise(F.lit(0))
        + F.when(named, F.lit(10000)).otherwise(F.lit(0))
    )
    peak_feats = peaks.select(
        *emit(
            "mountain_peak",
            "point",
            attrs=F.map_concat(
                attr_entries(
                    **{
                        "class": tag("natural"),
                        "ele": ele_m,
                        "ele_ft": ele_ft,
                        "customary_ft": F.when(in_us, F.lit(1)),
                    }
                ),
                names_col(),
            ),
            minzoom=7,
            buffer_px=100.0,  # oversized for stable grid ranks; re-clipped in postProcess
            sort_key=-sort_val,  # setSortKeyDescending
            grid=F.array(grid_entry(0, 13, 100.0, 5)),
        )
    )

    ridges = ctx.table("osm_mountain_linestring")
    rank = (
        F.lit(3)
        - F.when(nullif_empty(F.col("wikipedia")).isNotNull(), 1).otherwise(0)
        - F.when(nullif_empty(F.col("name")).isNotNull(), 1).otherwise(0)
    ) if "wikipedia" in ridges.columns else (
        F.lit(3) - F.when(nullif_empty(F.col("name")).isNotNull(), 1).otherwise(0)
    )
    ridge_feats = ridges.select(
        *emit(
            "mountain_peak",
            "line",
            attrs=F.map_concat(
                attr_entries(**{"class": tag("natural"), "rank": rank}), names_col()
            ),
            minzoom=13,
            buffer_px=100.0,
            sort_key=rank,
        )
    )
    return union_features([peak_feats, ridge_feats])


def _post_process(zoom: int, pdf: pd.DataFrame) -> pd.DataFrame:
    """Stamp rank from the JVM label-grid order, drop points outside the 64px
    buffer (MountainPeak.java:176-204). grid_rank is computed once in
    ``grid_windows`` (ungrouped rows share one bucket, matching the
    reference's group()==0 counter) — no in-pandas recount, so this
    processor is a stateless per-row map (salt/partition safe)."""
    keep_idx, new_attrs = [], []
    ranks = pdf["grid_rank"]
    for i in range(len(pdf)):
        a = postprocess._as_dict(pdf["attrs"].iloc[i])
        if pdf["kind"].iloc[i] == "point":
            pts = packed.points_of(pdf["geom_px"].iloc[i])
            if len(pts) == 1:
                x, y = float(pts[0, 0]), float(pts[0, 1])
                if not (-BUFFER <= x <= 256 + BUFFER and -BUFFER <= y <= 256 + BUFFER):
                    continue
        if "rank" not in a:
            a["rank"] = str(int(ranks.iloc[i]))
        keep_idx.append(i)
        new_attrs.append(a)
    out = pdf.iloc[keep_idx][["elem_id", "kind", "geom_px"]].copy()
    out["attrs"] = new_attrs
    return out[["elem_id", "kind", "geom_px", "attrs"]]


postprocess.register_post_processor("mountain_peak", _post_process)
