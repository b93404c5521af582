"""`landcover` layer.

Reference: layers/Landcover.java (NE glaciers/ice shelves :99-121, OSM
polygons :123-137, numpoints-keyed tile merge :139-185); class mapping
OpenMapTilesSchema.java Landcover.FieldMappings.
"""

from __future__ import annotations

import pandas as pd
from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from ..features import attr_entries, emit, mps_below, union_features
from ..schema.layers import LAYER_BUFFERS
from ..tiling import postprocess

BUFFER = LAYER_BUFFERS["landcover"]

# subclass → class (OpenMapTilesSchema Landcover.FieldMappings.Class)
CLASS_OF_SUBCLASS = {}
for _cls, _subs in [
    ("farmland", ["farmland", "farm", "orchard", "vineyard", "plant_nursery"]),
    ("ice", ["glacier", "ice_shelf"]),
    ("wood", ["wood", "forest"]),
    ("rock", ["bare_rock", "scree"]),
    ("grass", ["fell", "flowerbed", "grassland", "heath", "scrub", "shrubbery", "tundra",
               "grass", "meadow", "allotments", "park", "village_green", "recreation_ground",
               "garden", "golf_course"]),
    ("wetland", ["wetland", "bog", "swamp", "wet_meadow", "marsh", "reedbed", "saltern",
                 "tidalflat", "saltmarsh", "mangrove"]),
    ("sand", ["beach", "sand", "dune"]),
]:
    for _s in _subs:
        CLASS_OF_SUBCLASS[_s] = _cls

NE_TABLES = {
    "ne_110m_glaciated_areas": ("glacier", 0, 1),
    "ne_50m_glaciated_areas": ("glacier", 2, 4),
    "ne_10m_glaciated_areas": ("glacier", 5, 6),
    "ne_50m_antarctic_ice_shelves_polys": ("ice_shelf", 2, 4),
    "ne_10m_antarctic_ice_shelves_polys": ("ice_shelf", 5, 6),
}

WOOD_OR_FOREST = {"wood", "forest"}


def _class_expr(subclass: F.Column) -> F.Column:
    m = F.create_map(*[F.lit(x) for kv in CLASS_OF_SUBCLASS.items() for x in kv])
    return F.element_at(m, subclass)


def transform(ctx) -> DataFrame:
    parts = []
    # NE ice (Landcover.java:99-121)
    ne = ctx.natural_earth(*NE_TABLES)
    sub = F.lit(None).cast("string")
    mz = F.lit(None).cast("int")
    xz = F.lit(None).cast("int")
    for table, (s, lo, hi) in NE_TABLES.items():
        cond = F.col("source_layer") == table
        sub = F.when(cond, F.lit(s)).otherwise(sub)
        mz = F.when(cond, F.lit(lo)).otherwise(mz)
        xz = F.when(cond, F.lit(hi)).otherwise(xz)
    parts.append(
        ne.select(
            *emit(
                "landcover",
                "polygon",
                attrs=attr_entries(**{"class": _class_expr(sub), "subclass": sub}),
                minzoom=mz,
                maxzoom=xz,
                buffer_px=BUFFER,
            )
        )
    )

    # OSM landcover (Landcover.java:123-137)
    lc = ctx.table("osm_landcover_polygon")
    clazz = _class_expr(F.col("subclass"))
    parts.append(
        lc.filter(clazz.isNotNull()).select(
            *emit(
                "landcover",
                "polygon",
                attrs=attr_entries(
                    **{
                        "class": clazz,
                        "subclass": F.col("subclass"),
                        "_numpoints": F.lit("__computed__"),
                    }
                ),
                minzoom=7,
                buffer_px=BUFFER,
                # fromMaxZoomThresholds{13:8, 10:4, 9:2}
                mps_overrides=F.array(mps_below(9, 2.0), mps_below(10, 4.0), mps_below(13, 8.0)),
            )
        )
    )
    return union_features(parts)


def _post_process(zoom: int, pdf: pd.DataFrame) -> pd.DataFrame:
    """numpoints-keyed selective merge (Landcover.java:139-185)."""
    cols = ["elem_id", "kind", "geom_px", "attrs"]
    if zoom < 7 or zoom > 13:
        out = pdf[cols].copy()
        out["attrs"] = [
            {k: v for k, v in postprocess._as_dict(a).items() if k != "_numpoints"}
            for a in out["attrs"]
        ]
        return out
    keep_rows, merge_rows = [], []
    # to_dict("records") once: per-row .iloc costs ~100µs each and this
    # loop runs over 10k+ rows on a fat landcover tile
    for row in pdf.to_dict("records"):
        attrs = postprocess._as_dict(row["attrs"])
        n = int(attrs.pop("_numpoints", "0") or 0)
        sub = attrs.get("subclass")
        if zoom >= 10:
            if sub in WOOD_OR_FOREST and n < 300:
                attrs["_group"] = "<300"
                row["attrs"] = attrs
                merge_rows.append(row)
            else:
                row["attrs"] = attrs
                keep_rows.append(row)
        elif zoom >= 8:
            if sub in WOOD_OR_FOREST:
                attrs["_group"] = "<300" if n < 300 else ">300"
                row["attrs"] = attrs
                merge_rows.append(row)
            else:
                row["attrs"] = attrs
                keep_rows.append(row)
        else:  # zoom 7
            row["attrs"] = attrs
            merge_rows.append(row)
    result = pd.DataFrame(keep_rows, columns=pdf.columns) if keep_rows else pdf.iloc[0:0]
    result = result[cols]
    if merge_rows:
        merged = postprocess.merge_overlapping_polygons(
            pd.DataFrame(merge_rows, columns=pdf.columns), 4.0
        )
        result = pd.concat([result, merged], ignore_index=True)
    return result


postprocess.register_post_processor("landcover", _post_process)
