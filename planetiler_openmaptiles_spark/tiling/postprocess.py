"""Per-tile reduction: label-grid windows + layer post-process UDFs.

Reference parity: ForwardingProfile.LayerPostProcessor.postProcess — the
per-(tile, layer) reduce that runs after features are binned to tiles
(SURVEY.md §2.5, P1-P6), plus the label-grid rank/limit windows (A6/A7).

Spark shape:
  1. ``grid_windows`` — row_number() over (z,x,y,layer,grid_cell) ordered by
     the packed sort key: stamps `grid_rank` and applies the top-k limit.
     Pure Catalyst window, one shuffle keyed by tile.
  2. ``reduce_tiles`` — groupBy(z,x,y,layer).applyInPandas dispatching to the
     registered layer post-processor. Input pandas frame arrives sorted by
     sort_key (the reference's in-tile feature order, SURVEY.md §2.6).

The merge kernels (mergeLineStrings / mergeOverlappingPolygons /
mergeNearbyPolygons / mergeMulti*) mirror planetiler FeatureMerge semantics
on the numpy kernel (no GEOS): see geom/ops.py + geom/raster.py.
"""

from __future__ import annotations

import json
from typing import Callable

import numpy as np
import pandas as pd
from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F
from pyspark.sql import types as T

from ..features import TILE_EXTENT
from ..geom import ops, raster, wkt

TILE_OUT_SCHEMA = T.StructType(
    [
        T.StructField("z", T.IntegerType()),
        T.StructField("x", T.IntegerType()),
        T.StructField("y", T.IntegerType()),
        T.StructField("layer", T.StringType()),
        T.StructField("seq", T.IntegerType()),
        T.StructField("elem_id", T.LongType()),
        T.StructField("kind", T.StringType()),
        T.StructField("geom_px", T.StringType()),
        T.StructField("attrs", T.MapType(T.StringType(), T.StringType())),
    ]
)

# layer name -> fn(z: int, pdf: pd.DataFrame) -> pd.DataFrame
# pdf columns: elem_id, kind, geom_px, attrs(dict), sort_key, grid_rank
POST_PROCESSORS: dict[str, Callable[[int, pd.DataFrame], pd.DataFrame]] = {}


def register_post_processor(layer: str, fn) -> None:
    POST_PROCESSORS[layer] = fn


# ------------------------------------------------------------------ windows


def grid_windows(tile_feats: DataFrame) -> DataFrame:
    """Label-grid rank + limit (A6/A7). Features without a grid cell pass
    through with grid_rank null."""
    w = Window.partitionBy("z", "x", "y", "layer", "grid_cell").orderBy(
        F.col("sort_key").asc(), F.col("elem_id").asc()
    )
    df = tile_feats.withColumn(
        "grid_rank",
        F.when(F.col("grid_cell").isNotNull(), F.row_number().over(w)).otherwise(F.lit(None)),
    )
    return df.filter(
        (F.col("grid_limit") <= 0)
        | F.col("grid_rank").isNull()
        | (F.col("grid_rank") <= F.col("grid_limit"))
    )


# --------------------------------------------------------------- merge utils


def _attrs_key(attrs: dict, drop: tuple = ()) -> str:
    return json.dumps(
        {k: v for k, v in (attrs or {}).items() if k not in drop}, sort_keys=True
    )


def _as_dict(attrs) -> dict:
    if isinstance(attrs, dict):
        return dict(attrs)
    if attrs is None:
        return {}
    return dict(attrs)  # list of (k, v) pairs from Arrow map



def _parse_lines(geoms) -> list[np.ndarray]:
    out = []
    for g in geoms:
        if g is None:
            continue
        if g[0] == "LineString":
            out.append(np.asarray(g[1]))
        elif g[0] == "MultiLineString":
            out.extend(np.asarray(l) for l in g[1])
    return out


def _parse_polys(geoms) -> list[list[np.ndarray]]:
    out = []
    for g in geoms:
        if g is None:
            continue
        if g[0] == "Polygon":
            out.append([np.asarray(r) for r in g[1]])
        elif g[0] == "MultiPolygon":
            out.extend([np.asarray(r) for r in rings] for rings in g[1])
    return out


def merge_line_strings(
    pdf: pd.DataFrame,
    min_length_px: float = 0.0,
    tolerance_px: float = -1.0,
    buffer_px: float = 4.0,
    fence_keys: tuple = (),
    min_length_fn=None,
) -> pd.DataFrame:
    """FeatureMerge.mergeLineStrings parity (P1): group by identical attrs
    (+fence keys), node connected segments, simplify, drop short, clip to the
    tile buffer. `min_length_fn(attrs) -> px` overrides min_length_px per
    group (transportation_name uses name-length-dependent limits)."""
    if pdf.empty:
        return pdf.iloc[0:0]
    groups: dict[str, list] = {}
    order: dict[str, int] = {}
    meta: dict[str, tuple] = {}
    for i, row in enumerate(pdf.itertuples(index=False)):
        attrs = _as_dict(row.attrs)
        k = _attrs_key(attrs)
        if k not in groups:
            groups[k] = []
            order[k] = i
            meta[k] = (row.elem_id, attrs)
        g = wkt.parse_wkt(row.geom_px)
        groups[k].extend(_parse_lines([g]))
    rows = []
    lo, hi = -buffer_px, TILE_EXTENT + buffer_px
    for k in sorted(groups, key=lambda k: order[k]):
        elem_id, attrs = meta[k]
        out_attrs = {kk: vv for kk, vv in attrs.items() if not kk.startswith("_")}
        min_len = min_length_fn(attrs) if min_length_fn else min_length_px
        merged = ops.merge_lines(groups[k], quantum=0.25 / 16)
        kept = []
        for line in merged:
            if tolerance_px >= 0:
                line = ops.douglas_peucker(line, tolerance_px)
            if min_len > 0 and ops.line_length(line) < min_len:
                continue
            for piece in ops.clip_line_box(line, lo, lo, hi, hi):
                if len(piece) >= 2:
                    kept.append(piece)
        if not kept:
            continue
        geom = ("LineString", kept[0]) if len(kept) == 1 else ("MultiLineString", kept)
        rows.append((elem_id, "linestring", wkt.to_wkt(geom), out_attrs))
    return pd.DataFrame(rows, columns=["elem_id", "kind", "geom_px", "attrs"])


def merge_overlapping_polygons(pdf: pd.DataFrame, min_area_px2: float = 0.0) -> pd.DataFrame:
    """FeatureMerge.mergeOverlappingPolygons parity (P2)."""
    return _merge_polygons(pdf, min_area_px2, 0.0, 0.0, 0.0)


def merge_nearby_polygons(
    pdf: pd.DataFrame,
    min_area_px2: float,
    min_hole_area_px2: float,
    min_dist_px: float,
    buffer_px: float,
) -> pd.DataFrame:
    """FeatureMerge.mergeNearbyPolygons parity (P3): buffer-union-unbuffer."""
    return _merge_polygons(pdf, min_area_px2, min_hole_area_px2, min_dist_px / 2.0, buffer_px)


def _merge_polygons(pdf, min_area_px2, min_hole_px2, buffer_dist_px, clip_buffer_px):
    if pdf.empty:
        return pdf.iloc[0:0]
    groups: dict[str, list] = {}
    order: dict[str, int] = {}
    meta: dict[str, tuple] = {}
    for i, row in enumerate(pdf.itertuples(index=False)):
        attrs = _as_dict(row.attrs)
        k = _attrs_key(attrs)
        if k not in groups:
            groups[k], order[k], meta[k] = [], i, (row.elem_id, attrs)
        groups[k].extend(_parse_polys([wkt.parse_wkt(row.geom_px)]))
    rows = []
    # window covers tile + the largest layer buffer we use for polygons
    pad = max(clip_buffer_px, 4.0)
    x0 = -pad
    extent = TILE_EXTENT + 2 * pad
    for k in sorted(groups, key=lambda kk: order[kk]):
        elem_id, attrs = meta[k]
        out_attrs = {kk: vv for kk, vv in attrs.items() if not kk.startswith("_")}
        merged = raster.union_polygons(
            groups[k],
            x0,
            x0,
            extent,
            1.0,  # px per "tile pixel" — geometry already in px coords
            buffer_dist_px=buffer_dist_px,
            min_hole_area_px2=min_hole_px2,
        )
        kept = [rings for rings in merged if ops.polygon_area(rings) >= min_area_px2]
        if not kept:
            continue
        geom = ("Polygon", kept[0]) if len(kept) == 1 else ("MultiPolygon", kept)
        rows.append((elem_id, "polygon", wkt.to_wkt(geom), out_attrs))
    return pd.DataFrame(rows, columns=["elem_id", "kind", "geom_px", "attrs"])


def merge_multi_point(pdf: pd.DataFrame) -> pd.DataFrame:
    """P4: combine same-attr points into one MultiPoint (size optimization)."""
    if pdf.empty:
        return pdf.iloc[0:0]
    groups: dict[str, list] = {}
    order: dict[str, int] = {}
    meta: dict[str, tuple] = {}
    for i, row in enumerate(pdf.itertuples(index=False)):
        attrs = _as_dict(row.attrs)
        k = _attrs_key(attrs)
        if k not in groups:
            groups[k], order[k], meta[k] = [], i, (row.elem_id, attrs)
        g = wkt.parse_wkt(row.geom_px)
        if g[0] == "Point":
            groups[k].append(g[1])
        elif g[0] == "MultiPoint":
            groups[k].extend(np.asarray(g[1]))
    rows = []
    for k in sorted(groups, key=lambda kk: order[kk]):
        elem_id, attrs = meta[k]
        out_attrs = {kk: vv for kk, vv in attrs.items() if not kk.startswith("_")}
        pts = np.array(groups[k])
        geom = ("Point", pts[0]) if len(pts) == 1 else ("MultiPoint", pts)
        rows.append((elem_id, "point", wkt.to_wkt(geom), out_attrs))
    return pd.DataFrame(rows, columns=["elem_id", "kind", "geom_px", "attrs"])


def merge_multi_polygon(pdf: pd.DataFrame) -> pd.DataFrame:
    """P4: combine same-attr polygons into one MultiPolygon (no union)."""
    if pdf.empty:
        return pdf.iloc[0:0]
    groups: dict[str, list] = {}
    order: dict[str, int] = {}
    meta: dict[str, tuple] = {}
    for i, row in enumerate(pdf.itertuples(index=False)):
        attrs = _as_dict(row.attrs)
        k = _attrs_key(attrs)
        if k not in groups:
            groups[k], order[k], meta[k] = [], i, (row.elem_id, attrs)
        groups[k].extend(_parse_polys([wkt.parse_wkt(row.geom_px)]))
    rows = []
    for k in sorted(groups, key=lambda kk: order[kk]):
        elem_id, attrs = meta[k]
        out_attrs = {kk: vv for kk, vv in attrs.items() if not kk.startswith("_")}
        polys = groups[k]
        geom = ("Polygon", polys[0]) if len(polys) == 1 else ("MultiPolygon", polys)
        rows.append((elem_id, "polygon", wkt.to_wkt(geom), out_attrs))
    return pd.DataFrame(rows, columns=["elem_id", "kind", "geom_px", "attrs"])


# ------------------------------------------------------------------ dispatch


def reduce_tiles(tile_feats: DataFrame) -> DataFrame:
    """groupBy(z,x,y,layer).applyInPandas → per-layer post-process."""

    def dispatch(key, pdf: pd.DataFrame) -> pd.DataFrame:
        z, x, y, layer = int(key[0]), int(key[1]), int(key[2]), key[3]
        pdf = pdf.sort_values(["sort_key", "elem_id"], kind="mergesort").reset_index(drop=True)
        fn = POST_PROCESSORS.get(layer)
        if fn is not None:
            body = fn(z, pdf)
        else:
            body = pdf[["elem_id", "kind", "geom_px", "attrs"]]
        body = body.reset_index(drop=True)
        n = len(body)
        # dtype=object everywhere non-numeric: an empty pandas column defaults
        # to float64, which Arrow cannot convert to map<string,string>
        return pd.DataFrame(
            {
                "z": np.full(n, z, dtype=np.int32),
                "x": np.full(n, x, dtype=np.int32),
                "y": np.full(n, y, dtype=np.int32),
                "layer": pd.Series([layer] * n, dtype="object"),
                "seq": np.arange(n, dtype=np.int32),
                "elem_id": body["elem_id"].astype("int64"),
                "kind": pd.Series(list(body["kind"]), dtype="object"),
                "geom_px": pd.Series(list(body["geom_px"]), dtype="object"),
                "attrs": pd.Series([_as_dict(a) for a in body["attrs"]], dtype="object"),
            }
        )

    return tile_feats.groupBy("z", "x", "y", "layer").applyInPandas(dispatch, TILE_OUT_SCHEMA)


def finalize_tiles(tile_feats: DataFrame) -> DataFrame:
    """windows + per-layer reduce (the full tile reduction)."""
    return reduce_tiles(grid_windows(tile_feats))
