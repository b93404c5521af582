"""`housenumber` layer — reference layers/Housenumber.java:66-165.

F6 display range ("1;3;5" → "1–5") is pure Column logic; J12 tile dedup
(partition by street+block+number, prefer unnamed) runs in the per-tile
reduce.
"""

from __future__ import annotations

import pandas as pd
from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from ..features import attr_entries, emit, union_features
from ..schema.layers import LAYER_BUFFERS
from ..tiling import postprocess

BUFFER = LAYER_BUFFERS["housenumber"]

DISPLAY_SEP = "–"


def display_housenumber(hn: F.Column) -> F.Column:
    """Housenumber.java:85-116 (F6)."""
    parts = F.filter(
        F.transform(F.split(hn, ";"), lambda p: F.trim(p)), lambda p: p != ""
    )
    nonnumeric = hn.rlike("[^0-9;]")
    first_last = F.concat(
        F.element_at(parts, 1), F.lit(DISPLAY_SEP), F.element_at(parts, -1)
    )
    nums = F.transform(parts, lambda p: p.cast("long"))
    min_max = F.concat(
        F.array_min(nums).cast("string"), F.lit(DISPLAY_SEP), F.array_max(nums).cast("string")
    )
    return (
        F.when(~hn.contains(";"), hn)
        .when(F.size(parts) == 0, hn)
        .when(nonnumeric, first_last)
        .otherwise(min_max)
    )


def transform(ctx) -> DataFrame:
    h = ctx.table("osm_housenumber_point")
    display = display_housenumber(F.col("housenumber"))
    partition = F.concat(
        F.coalesce(F.col("street"), F.lit("")),
        F.coalesce(F.col("block_number"), F.lit("")),
        display,
    )
    has_name = F.when(
        F.col("name").isNotNull() & (F.col("name") != ""), F.lit("true")
    ).otherwise(F.lit("false"))
    return union_features([
        h.select(
            *emit(
                "housenumber",
                "centroid_if_convex",
                attrs=attr_entries(
                    housenumber=display,
                    _partition=partition,
                    _has_name=has_name,
                ),
                minzoom=14,
                buffer_px=BUFFER,
            )
        )
    ])


def _post_process(zoom: int, pdf: pd.DataFrame) -> pd.DataFrame:
    """J12 dedup + multipoint merge (Housenumber.java:145-165)."""
    best: dict[str, int] = {}
    best_named: dict[str, bool] = {}
    for i in range(len(pdf)):
        a = postprocess._as_dict(pdf["attrs"].iloc[i])
        part = a.get("_partition", "")
        named = a.get("_has_name") == "true"
        if part not in best or (best_named[part] and not named):
            best[part] = i
            best_named[part] = named
    keep = sorted(best.values())
    sub = pdf.iloc[keep].copy()
    sub["attrs"] = [
        {k: v for k, v in postprocess._as_dict(a).items() if not k.startswith("_")}
        for a in sub["attrs"]
    ]
    return postprocess.merge_multi_point(sub)


postprocess.register_post_processor("housenumber", _post_process)
