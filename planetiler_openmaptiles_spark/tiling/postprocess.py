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

from typing import Callable

import numpy as np
import pandas as pd
from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F
from pyspark.sql import types as T

from ..features import TILE_EXTENT
from ..geom import ops, packed, raster

TILE_OUT_SCHEMA = T.StructType(
    [
        T.StructField("z", T.IntegerType()),
        T.StructField("x", T.IntegerType()),
        T.StructField("y", T.IntegerType()),
        T.StructField("layer", T.StringType()),
        T.StructField("seq", T.IntegerType()),
        T.StructField("elem_id", T.LongType()),
        T.StructField("kind", T.StringType()),
        # packed geometry (geom/packed.py): one flat binary blob per row
        T.StructField("geom_px", T.BinaryType()),
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
    """Label-grid rank + limit (A6/A7). EVERY row gets a grid_rank: features
    without a grid cell share one per-(tile,layer) bucket (nulls group
    together in the window partition), mirroring the reference's
    ``groupCounts.getOrDefault(feature.group(), 1)`` where ungrouped
    features all have group()==0 (Poi.java:328-338, MountainPeak.java:176-188,
    Place.java:394-404). The limit filter still applies only to real cells."""
    w = Window.partitionBy("z", "x", "y", "layer", "grid_cell").orderBy(
        F.col("sort_key").asc(), F.col("elem_id").asc()
    )
    df = tile_feats.withColumn("grid_rank", F.row_number().over(w))
    return df.filter(
        (F.col("grid_limit") <= 0)
        | F.col("grid_cell").isNull()
        | (F.col("grid_rank") <= F.col("grid_limit"))
    )


# --------------------------------------------------------------- merge utils


def _attrs_key(attrs: dict, drop: tuple = ()) -> tuple:
    """Hashable group key for identical attr maps (a sorted tuple: json
    serialization here cost ~1.6 s alone on a z13 megacity building tile)."""
    return tuple(sorted((k, v) for k, v in (attrs or {}).items() if k not in drop))


def _as_dict(attrs) -> dict:
    if isinstance(attrs, dict):
        return dict(attrs)
    if attrs is None:
        return {}
    return dict(attrs)  # list of (k, v) pairs from Arrow map


def _split_kind(pdf: pd.DataFrame, kind: str):
    """(matching, passthrough-rows) split for a merge kernel.

    planetiler's FeatureMerge.groupByAttrs passes features whose geometry
    type doesn't match the merge straight through unchanged (others come
    FIRST in the result, in input order; merged groups follow) — e.g.
    transportation_name's motorway-junction POINTS must survive
    mergeLineStrings untouched, not be misread as a line part stream."""
    mask = pdf["kind"].to_numpy() == kind
    if mask.all():
        return pdf, []
    passthrough = [
        (
            row.elem_id,
            row.kind,
            row.geom_px,
            {k: v for k, v in _as_dict(row.attrs).items() if not k.startswith("_")},
        )
        for row in pdf[~mask].itertuples(index=False)
    ]
    return pdf[mask], passthrough





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
    pdf, rows = _split_kind(pdf, "linestring")
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
        groups[k].extend(packed.lines_of(row.geom_px))
    lo, hi = -buffer_px, TILE_EXTENT + buffer_px
    for k in sorted(groups, key=lambda k: order[k]):
        elem_id, attrs = meta[k]
        out_attrs = {kk: vv for kk, vv in attrs.items() if not kk.startswith("_")}
        min_len = min_length_fn(attrs) if min_length_fn else min_length_px
        merged = ops.merge_lines(groups[k], quantum=0.25 / 16)
        kept = []
        for line in merged:
            # min-length drop on the RAW merged chain, before tolerance
            # simplification — planetiler's LoopLineMerger applies
            # setMinLength to the merged (quantized) geometry and only
            # then simplifies, so a wiggly chain just over the limit
            # survives even though its simplified form would measure short.
            if min_len > 0 and ops.line_length(line) < min_len:
                continue
            if tolerance_px >= 0:
                line = ops.douglas_peucker(line, tolerance_px)
            for piece in ops.clip_line_box(line, lo, lo, hi, hi):
                if len(piece) >= 2:
                    kept.append(piece)
        if not kept:
            continue
        rows.append((elem_id, "linestring", packed.from_lines(kept), out_attrs))
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
    pdf, rows = _split_kind(pdf, "polygon")
    groups: dict[str, list] = {}
    order: dict[str, int] = {}
    meta: dict[str, tuple] = {}
    for i, row in enumerate(pdf.itertuples(index=False)):
        attrs = _as_dict(row.attrs)
        k = _attrs_key(attrs)
        if k not in groups:
            groups[k], order[k], meta[k] = [], i, (row.elem_id, attrs)
        groups[k].extend(packed.polys_of(row.geom_px))
    # window covers tile + the largest layer buffer we use for polygons
    pad = max(clip_buffer_px, 4.0)
    x0 = -pad
    extent = TILE_EXTENT + 2 * pad
    for k in sorted(groups, key=lambda kk: order[kk]):
        elem_id, attrs = meta[k]
        out_attrs = {kk: vv for kk, vv in attrs.items() if not kk.startswith("_")}
        merged = _union_by_components(
            groups[k], x0, extent, buffer_dist_px, min_hole_px2
        )
        kept = [rings for rings in merged if ops.polygon_area(rings) >= min_area_px2]
        if not kept:
            continue
        rows.append((elem_id, "polygon", packed.from_polys(kept), out_attrs))
    return pd.DataFrame(rows, columns=["elem_id", "kind", "geom_px", "attrs"])


def _ring_convex(ring) -> bool:
    """Closed ring convexity: all edge cross products share a sign (zeros —
    collinear runs — allowed)."""
    c = np.asarray(ring)
    if len(c) < 4:
        return True
    e = np.diff(c, axis=0)  # closed ring: last edge wraps to the start
    e = np.vstack([e, e[:1]])
    cross = e[:-1, 0] * e[1:, 1] - e[:-1, 1] * e[1:, 0]
    return bool((cross >= 0).all() or (cross <= 0).all())


def _box_clusters(boxes: np.ndarray, margin: float) -> list[list[int]]:
    """Cluster boxes (N×4 [x0,y0,x1,y1]) whose `margin`-inflated extents may
    touch, by recursive axis-alternating interval splitting — all numpy, no
    per-pair Python loop (the naive sweep was quadratic on a z13 megacity
    building tile). Interval clustering on one axis is a conservative
    coarsening of true 2-D box connectivity; recursion on the other axis
    tightens it. Over-grouping is harmless (the raster union keeps disjoint
    masks disjoint); under-grouping never happens."""
    out: list[list[int]] = []

    def rec(idx: np.ndarray, axis: int, other_was_solid: bool):
        lo = boxes[idx, axis] - margin
        hi = boxes[idx, axis + 2] + margin
        o = np.argsort(lo, kind="stable")
        runmax = np.maximum.accumulate(hi[o])
        br = np.nonzero(lo[o][1:] > runmax[:-1])[0] + 1
        if len(br) == 0:
            if other_was_solid or len(idx) == 1:
                out.append(idx.tolist())
            else:
                rec(idx, 1 - axis, True)
            return
        for chunk in np.split(o, br):
            rec(idx[chunk], 1 - axis, False)

    rec(np.arange(len(boxes)), 0, False)
    return out


def _union_by_components(polys, wx0, extent, buffer_dist_px, min_hole_px2):
    """Union a same-attrs polygon group via bbox connected components.

    JTS semantics (FeatureMerge.mergeOverlappingPolygons unions only what
    actually intersects): members whose inflated bboxes touch nothing pass
    through with EXACT coordinates; each multi-member cluster rasterizes
    over its own bbox — snapped to the tile's global sub-pixel lattice so a
    cluster's traced rings are identical to the full-window raster's — not
    the whole tile window. A megacity z13 building tile is thousands of
    small clusters, not one 1056² grid per attr group."""
    if len(polys) == 1 and buffer_dist_px == 0 and min_hole_px2 == 0:
        # union of one geometry is itself (the round-1 singleton fast path)
        return polys
    cell = 1.0 / raster.GRID_PER_PX
    # grouping slack: dilated masks can touch when bbox gap <= 2*buffer;
    # +2 cells covers raster snap. Conservative over-grouping is harmless
    # (the raster union keeps disjoint masks disjoint).
    margin = buffer_dist_px + 2 * cell
    boxes = np.empty((len(polys), 4))
    for i, rings in enumerate(polys):
        allc = np.concatenate([np.asarray(r) for r in rings])
        boxes[i] = (allc[:, 0].min(), allc[:, 1].min(), allc[:, 0].max(), allc[:, 1].max())
    comp_list = _box_clusters(boxes, margin)
    out = []
    for idxs in sorted(comp_list, key=min):
        members = [polys[i] for i in idxs]
        if len(idxs) == 1:
            rings = members[0]
            if buffer_dist_px == 0 and min_hole_px2 == 0:
                out.extend(members)
                continue
            if len(rings) == 1 and _ring_convex(rings[0]):
                # buffer(+r).buffer(-r) (morphological closing) is identity
                # on a convex hole-free polygon — pass exact coords through
                # (JTS would, too); z13 building tiles are mostly these
                out.extend(members)
                continue
        bx = boxes[idxs]
        # sub-window: component bbox + dilation headroom, snapped to the
        # lattice anchored at the tile window origin, clamped to the window
        m = buffer_dist_px + 2 * cell
        sx0 = wx0 + np.floor((bx[:, 0].min() - m - wx0) / cell) * cell
        sy0 = wx0 + np.floor((bx[:, 1].min() - m - wx0) / cell) * cell
        sx1 = wx0 + np.ceil((bx[:, 2].max() + m - wx0) / cell) * cell
        sy1 = wx0 + np.ceil((bx[:, 3].max() + m - wx0) / cell) * cell
        sx0, sy0 = max(sx0, wx0), max(sy0, wx0)
        sx1, sy1 = min(sx1, wx0 + extent), min(sy1, wx0 + extent)
        if sx1 <= sx0 or sy1 <= sy0:
            continue  # entirely outside the tile window
        out.extend(
            raster.union_polygons_rect(
                members, sx0, sy0, sx1 - sx0, sy1 - sy0,
                1.0,  # px per "tile pixel" — geometry already in px coords
                buffer_dist_px=buffer_dist_px,
                min_hole_area_px2=min_hole_px2,
            )
        )
    return out


def merge_multi_point(pdf: pd.DataFrame) -> pd.DataFrame:
    """P4: combine same-attr points into one MultiPoint (size optimization)."""
    if pdf.empty:
        return pdf.iloc[0:0]
    pdf, rows = _split_kind(pdf, "point")
    groups: dict[str, list] = {}
    order: dict[str, int] = {}
    meta: dict[str, tuple] = {}
    for i, row in enumerate(pdf.itertuples(index=False)):
        attrs = _as_dict(row.attrs)
        k = _attrs_key(attrs)
        if k not in groups:
            groups[k], order[k], meta[k] = [], i, (row.elem_id, attrs)
        groups[k].append(packed.points_of(row.geom_px))
    for k in sorted(groups, key=lambda kk: order[kk]):
        elem_id, attrs = meta[k]
        out_attrs = {kk: vv for kk, vv in attrs.items() if not kk.startswith("_")}
        pts = np.concatenate(groups[k])
        rows.append((elem_id, "point", packed.from_points(pts), out_attrs))
    return pd.DataFrame(rows, columns=["elem_id", "kind", "geom_px", "attrs"])


def merge_multi_polygon(pdf: pd.DataFrame) -> pd.DataFrame:
    """P4: combine same-attr polygons into one MultiPolygon (no union)."""
    if pdf.empty:
        return pdf.iloc[0:0]
    pdf, rows = _split_kind(pdf, "polygon")
    groups: dict[str, list] = {}
    order: dict[str, int] = {}
    meta: dict[str, tuple] = {}
    for i, row in enumerate(pdf.itertuples(index=False)):
        attrs = _as_dict(row.attrs)
        k = _attrs_key(attrs)
        if k not in groups:
            groups[k], order[k], meta[k] = [], i, (row.elem_id, attrs)
        groups[k].extend(packed.polys_of(row.geom_px))
    for k in sorted(groups, key=lambda kk: order[kk]):
        elem_id, attrs = meta[k]
        out_attrs = {kk: vv for kk, vv in attrs.items() if not kk.startswith("_")}
        rows.append((elem_id, "polygon", packed.from_polys(groups[k]), out_attrs))
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


# ------------------------------------------------- Catalyst merge routes
#
# The P4 merges (mergeMultiPolygon / mergeMultiPoint, FeatureMerge.java) and
# the housenumber dedup (Housenumber.java:145-165) are pure attrs-keyed
# concatenations — no geometry math. Expressed as Catalyst aggregations over
# (z,x,y,layer,attrs) they (a) never touch geometry coordinates (packed
# parts arrays concatenate with ``flatten``, exact float64 passthrough),
# and (b) shuffle on a key that includes the attrs map, so a megacity z14
# building tile spreads over its attr groups instead of serializing in one
# Python task — the hot-tile floor the reference flags at z13
# (Building.java:82-85) disappears for the z!=13 path. Salting beyond the
# attrs key is unnecessary: group output is one row, and partial
# aggregation (collect_list map-side) bounds skew.

def _ord():
    return F.struct(F.col("sort_key").alias("sk"), F.col("elem_id").alias("eid"))


def _strip_private(attrs):
    return F.map_filter(attrs, lambda k, _: ~k.startswith("_"))


def _merge_groups_sql(df: DataFrame, geom_builder, kind: str) -> DataFrame:
    """Shared shape of the Catalyst P4 merges: group by (tile, layer, attrs),
    collect per-row packed geometries in (sort_key, elem_id) order, combine
    them with `geom_builder` (an expression over the ordered array of parts
    arrays), keep the first row's elem_id/attrs, re-rank groups into the
    tile's seq order."""
    rows = df.select(
        "z", "x", "y", "layer",
        F.array_sort(F.map_entries("attrs")).alias("akey"),
        _ord().alias("ord"), F.col("geom_px").alias("contrib"),
        "elem_id", "attrs",
    )
    g = rows.groupBy("z", "x", "y", "layer", "akey").agg(
        F.min("ord").alias("min_ord"),
        F.transform(
            F.array_sort(F.collect_list(F.struct("ord", "contrib"))),
            lambda s: s["contrib"],
        ).alias("ordered"),
        F.min_by(F.struct("elem_id", "attrs"), "ord").alias("first"),
    )
    seq_w = Window.partitionBy("z", "x", "y", "layer").orderBy("min_ord")
    return g.select(
        "z", "x", "y", "layer",
        (F.row_number().over(seq_w) - 1).cast("int").alias("seq"),
        F.col("first.elem_id").alias("elem_id"),
        F.lit(kind).alias("kind"),
        geom_builder(F.col("ordered")).alias("geom_px"),
        _strip_private(F.col("first.attrs")).alias("attrs"),
    )


def _concat_blobs(ordered):
    """Binary concat of the sort-ordered packed blobs: the packed format is
    a headerless part stream (geom/packed.py), so byte concatenation IS the
    geometric append — the whole merge stays inside Catalyst.

    Via hex → array_join → unhex, which is LINEAR in total bytes. The
    obvious ``aggregate(.., concat)`` fold re-copies the accumulated buffer
    per element — quadratic, ~400 GB of memcpy for a 94k-building z14
    megacity tile (measured as a 46 s straggler task)."""
    return F.unhex(F.array_join(F.transform(ordered, F.hex), ""))


def merge_multi_polygon_sql(df: DataFrame) -> DataFrame:
    """Catalyst mergeMultiPolygon (P4): same output values as
    ``merge_multi_polygon`` without a per-tile Python task — polygon parts
    append in row order exactly like the pandas kernel."""
    return _merge_groups_sql(df, _concat_blobs, "polygon")


def merge_multi_point_sql(df: DataFrame) -> DataFrame:
    """Catalyst mergeMultiPoint (P4): point blobs are raw coordinate
    pairs, so the combined geometry is the ordered byte concat."""
    return _merge_groups_sql(
        df.filter(F.col("kind") == "point"), _concat_blobs, "point"
    )


def housenumber_reduce_sql(df: DataFrame) -> DataFrame:
    """Catalyst J12: per-(tile,_partition) keep the first unnamed row (else
    first), strip private attrs, then mergeMultiPoint — the Spark form of
    Housenumber.java:145-165 (nonHousenumberAttrs dedup + point merge)."""
    named = F.element_at("attrs", "_has_name") == F.lit("true")
    part = F.coalesce(F.element_at("attrs", "_partition"), F.lit(""))
    w = Window.partitionBy("z", "x", "y", "layer", part).orderBy(
        F.when(named, 1).otherwise(0).asc(), F.col("sort_key").asc(), F.col("elem_id").asc()
    )
    kept = (
        df.withColumn("_rn", F.row_number().over(w))
        .filter(F.col("_rn") == 1)
        .drop("_rn")
        .withColumn("attrs", _strip_private(F.col("attrs")))
    )
    return merge_multi_point_sql(kept)


# ---------------------------------------------- distributed building z13
#
# The reference flags the z13 building merge (mergeNearbyPolygons over the
# whole tile) as its single hottest tile cost: "+50% runtime"
# (Building.java:82-85). Sharding on the attrs key — the P4 trick — is a
# no-op here: building attrs are EMPTY at z13 (zattrs activate at z14), so
# a megacity tile is ONE group. What IS independent is the bbox connected
# component: `_union_by_components` already decomposes the group into
# components whose dilated bboxes touch, and each final component is
# axis-solid on both axes by construction, so re-running the union on one
# component's members alone is byte-identical to its slice of the per-tile
# run. The distributed route therefore:
#
#   1. explodes rows into polygon parts + bboxes (narrow Arrow pass);
#   2. per (tile, attrs-group): assigns each part its component id from
#      bboxes ONLY (numpy interval clustering — a 94k-building tile is
#      ~3 MB of boxes, milliseconds);
#   3. joins ids back and unions PER COMPONENT — the expensive raster
#      unions of a megacity tile fan out across the cluster;
#   4. reassembles per group with a Catalyst ordered blob concat (the
#      packed format concatenates bytewise) + one seq window.
#
# Byte parity with the per-tile pandas route is asserted by
# tests/test_postprocess_merge.py::test_building_z13_sharded_parity.
# Only tiles with > BUILDING_SHARD_MIN_ROWS rows take this route (3 extra
# small shuffles); typical tiles keep the single-task pandas dispatch.

BUILDING_SHARD_MIN_ROWS = 4096
_BZ13 = dict(min_area_px2=4.0, min_hole_px2=4.0, buffer_dist_px=0.25, pad=4.0)

_AKEY_T = T.ArrayType(
    T.StructType([T.StructField("key", T.StringType()), T.StructField("value", T.StringType())])
)

_BZ13_PARTS_SCHEMA = T.StructType(
    [
        T.StructField("z", T.IntegerType()),
        T.StructField("x", T.IntegerType()),
        T.StructField("y", T.IntegerType()),
        T.StructField("layer", T.StringType()),
        T.StructField("rn", T.IntegerType()),
        T.StructField("pi", T.IntegerType()),
        T.StructField("part", T.BinaryType()),
        T.StructField("bx0", T.DoubleType()),
        T.StructField("by0", T.DoubleType()),
        T.StructField("bx1", T.DoubleType()),
        T.StructField("by1", T.DoubleType()),
        T.StructField("elem_id", T.LongType()),
        T.StructField("attrs", T.MapType(T.StringType(), T.StringType())),
    ]
)

_BZ13_CLUSTER_SCHEMA = T.StructType(
    [
        T.StructField("z", T.IntegerType()),
        T.StructField("x", T.IntegerType()),
        T.StructField("y", T.IntegerType()),
        T.StructField("layer", T.StringType()),
        T.StructField("akey", _AKEY_T),
        T.StructField("rn", T.IntegerType()),
        T.StructField("pi", T.IntegerType()),
        T.StructField("ckey", T.IntegerType()),
    ]
)

_BZ13_UNION_SCHEMA = T.StructType(
    [
        T.StructField("z", T.IntegerType()),
        T.StructField("x", T.IntegerType()),
        T.StructField("y", T.IntegerType()),
        T.StructField("layer", T.StringType()),
        T.StructField("akey", _AKEY_T),
        T.StructField("ckey", T.IntegerType()),
        T.StructField("min_rn", T.IntegerType()),
        T.StructField("elem_id", T.LongType()),
        T.StructField("blob", T.BinaryType()),
    ]
)


def building_z13_sharded(df: DataFrame) -> DataFrame:
    """Distributed mergeNearbyPolygons(4, 4, 0.5, 0.5) for fat z13 building
    tiles (see block comment above)."""
    cell = 1.0 / raster.GRID_PER_PX
    margin = _BZ13["buffer_dist_px"] + 2 * cell
    pad = _BZ13["pad"]
    extent = TILE_EXTENT + 2 * pad

    def explode_parts(batches):
        for pdf in batches:
            rows = []
            for r in pdf.itertuples(index=False):
                if r.kind != "polygon":
                    continue  # building emits polygons only; guard regardless
                for pi, rings in enumerate(packed.polys_of(r.geom_px)):
                    allc = np.concatenate([np.asarray(rg) for rg in rings])
                    rows.append((
                        r.z, r.x, r.y, r.layer, r.rn, pi,
                        packed.from_polys([rings]),
                        float(allc[:, 0].min()), float(allc[:, 1].min()),
                        float(allc[:, 0].max()), float(allc[:, 1].max()),
                        r.elem_id, _as_dict(r.attrs),
                    ))
            if rows:
                yield pd.DataFrame(rows, columns=[f.name for f in _BZ13_PARTS_SCHEMA.fields])

    def assign_clusters(key, pdf: pd.DataFrame) -> pd.DataFrame:
        pdf = pdf.sort_values(["rn", "pi"], kind="mergesort").reset_index(drop=True)
        boxes = pdf[["bx0", "by0", "bx1", "by1"]].to_numpy(dtype=np.float64)
        ckey = np.empty(len(pdf), dtype=np.int32)
        for idxs in _box_clusters(boxes, margin):
            ckey[idxs] = min(idxs)  # cluster label = min member position
        return pd.DataFrame(
            {
                "z": pdf["z"], "x": pdf["x"], "y": pdf["y"], "layer": pdf["layer"],
                "akey": pd.Series([key[4]] * len(pdf), dtype="object"),
                "rn": pdf["rn"], "pi": pdf["pi"], "ckey": ckey,
            }
        )

    def union_cluster(key, pdf: pd.DataFrame) -> pd.DataFrame:
        pdf = pdf.sort_values(["rn", "pi"], kind="mergesort").reset_index(drop=True)
        polys = [packed.polys_of(b)[0] for b in pdf["part"]]
        merged = _union_by_components(
            polys, -pad, extent, _BZ13["buffer_dist_px"], _BZ13["min_hole_px2"]
        )
        kept = [r for r in merged if ops.polygon_area(r) >= _BZ13["min_area_px2"]]
        if not kept:
            # typed empty: untyped empty columns default to float64, which
            # Arrow cannot cast to the binary/array fields
            return pd.DataFrame(
                {
                    "z": pd.Series(dtype="int32"), "x": pd.Series(dtype="int32"),
                    "y": pd.Series(dtype="int32"),
                    "layer": pd.Series(dtype="object"),
                    "akey": pd.Series(dtype="object"),
                    "ckey": pd.Series(dtype="int32"),
                    "min_rn": pd.Series(dtype="int32"),
                    "elem_id": pd.Series(dtype="int64"),
                    "blob": pd.Series(dtype="object"),
                }
            )
        head = pdf.iloc[0]
        return pd.DataFrame(
            {
                "z": [int(head["z"])], "x": [int(head["x"])], "y": [int(head["y"])],
                "layer": [head["layer"]], "akey": [key[4]],
                "ckey": [int(head["ckey"])], "min_rn": [int(head["rn"])],
                "elem_id": [int(head["elem_id"])],
                "blob": [packed.from_polys(kept)],
            }
        ).astype({"z": "int32", "x": "int32", "y": "int32", "ckey": "int32",
                  "min_rn": "int32"})

    akey = F.array_sort(F.map_entries("attrs")).alias("akey")
    w_rn = Window.partitionBy("z", "x", "y", "layer").orderBy(
        F.col("sort_key").asc(), F.col("elem_id").asc()
    )
    parts = (
        df.withColumn("rn", F.row_number().over(w_rn).cast("int"))
        .select("z", "x", "y", "layer", "rn", "kind", "geom_px", "elem_id", "attrs")
        .mapInPandas(explode_parts, _BZ13_PARTS_SCHEMA)
    )
    clusters = parts.groupBy("z", "x", "y", "layer", akey).applyInPandas(
        assign_clusters, _BZ13_CLUSTER_SCHEMA
    )
    tagged = parts.join(clusters, ["z", "x", "y", "layer", "rn", "pi"])
    unions = tagged.groupBy("z", "x", "y", "layer", F.col("akey"), "ckey").applyInPandas(
        union_cluster, _BZ13_UNION_SCHEMA
    )
    g = unions.groupBy("z", "x", "y", "layer", "akey").agg(
        F.min("min_rn").alias("grp_rn"),
        F.min_by("elem_id", "min_rn").alias("elem_id"),
        F.transform(
            F.array_sort(F.collect_list(F.struct("ckey", "blob"))), lambda s: s["blob"]
        ).alias("ordered"),
    )
    seq_w = Window.partitionBy("z", "x", "y", "layer").orderBy("grp_rn")
    return g.select(
        "z", "x", "y", "layer",
        (F.row_number().over(seq_w) - 1).cast("int").alias("seq"),
        "elem_id",
        F.lit("polygon").alias("kind"),
        _concat_blobs(F.col("ordered")).alias("geom_px"),
        _strip_private(F.map_from_entries("akey")).alias("attrs"),
    )


def _stamp_if_absent(attrs, rank_str):
    """attrs + {'rank': rank_str} unless the feature already carries one."""
    return F.when(F.map_contains_key(attrs, "rank"), attrs).otherwise(
        F.map_concat(attrs, F.create_map(F.lit("rank"), rank_str))
    )


# predicate: (layer, z) combinations whose post-processor is a stateless
# per-row map (rank stamp from the JVM grid_rank / private-attr strip) —
# these run as ONE Catalyst branch instead of per-tile Python tasks. The
# pandas processors for the same layers remain the semantics reference
# (poi/place/mountain_peak docstrings) and still serve the other zooms.
def stamped_sql_pred():
    l, z = F.col("layer"), F.col("z")
    return (
        l.isin("poi", "place", "mountain_peak")
        | ((l == "park") & (z > 4))
        | ((l == "waterway") & ((z < 6) | (z > 11)))
        | ((l == "landcover") & ((z < 7) | (z > 13)))
    )


def stamped_reduce_sql(df: DataFrame) -> DataFrame:
    """Catalyst form of the stateless layer post-processors:

    * poi      — rank := grid_rank when absent (Poi.java:328-338)
    * place    — rank := 10 + grid_rank when absent (Place.java:394-404)
    * mountain_peak — rank := grid_rank when absent; drop points outside the
      64px output buffer (MountainPeak.java:176-204)
    * park z>4 — rank := grid_rank for grid-cell points (overwrite,
      Park.java:166-180)
    * waterway z<6|z>11 — strip private attrs (no merge at these zooms)
    * landcover z<7|z>13 — strip the _numpoints bookkeeping attr

    One shuffle (the seq window), zero Python tasks."""
    l, z = F.col("layer"), F.col("z")
    attrs = F.col("attrs")
    rank_abs = F.col("grid_rank").cast("string")
    is_pt = F.col("kind") == "point"
    new_attrs = (
        F.when(l == "poi", _stamp_if_absent(attrs, rank_abs))
        .when(l == "place", _stamp_if_absent(attrs, (F.col("grid_rank") + 10).cast("string")))
        .when(l == "mountain_peak", _stamp_if_absent(attrs, rank_abs))
        .when(
            l == "park",
            F.when(
                is_pt & F.col("grid_cell").isNotNull(),
                # LAST_WIN map dedup (session conf) → overwrite semantics
                F.map_concat(attrs, F.create_map(F.lit("rank"), rank_abs)),
            ).otherwise(attrs),
        )
        .when(l == "waterway", _strip_private(attrs))
        .when(l == "landcover", F.map_filter(attrs, lambda k, _: k != F.lit("_numpoints")))
        .otherwise(attrs)
    )
    px, py = F.col("pt_x"), F.col("pt_y")
    peak_buf = 64.0  # LAYER_BUFFERS["mountain_peak"]
    peak_keep = (
        (l != "mountain_peak")
        | ~is_pt
        | (px.between(-peak_buf, TILE_EXTENT + peak_buf)
           & py.between(-peak_buf, TILE_EXTENT + peak_buf))
    )
    return identity_reduce_sql(df.withColumn("attrs", new_attrs).filter(peak_keep))


def identity_reduce_sql(df: DataFrame) -> DataFrame:
    """Layers with no post-processor: pure Catalyst seq assignment."""
    w = Window.partitionBy("z", "x", "y", "layer").orderBy(
        F.col("sort_key").asc(), F.col("elem_id").asc()
    )
    return df.select(
        "z", "x", "y", "layer",
        (F.row_number().over(w) - 1).cast("int").alias("seq"),
        "elem_id", "kind", "geom_px", "attrs",
    )


# Live finalize cache per session (id -> cached DataFrame): each new
# finalize_tiles call releases the previous build's pinned grid-window
# table, so drivers that build many tile sets in one session (bench
# loops, the oracle board) hold at most ONE cache even if a consumer
# never reaches pipeline.write_tiles' unpersist.
_FINALIZE_CACHE: dict[int, DataFrame] = {}


def release_finalize_cache(spark) -> None:
    """Unpersist the session's live finalize cache, if any."""
    prev = _FINALIZE_CACHE.pop(id(spark), None)
    if prev is not None:
        try:
            prev.unpersist()
        except Exception:
            pass


def finalize_tiles(tile_feats: DataFrame, size_hint: int = 0) -> DataFrame:
    """windows + per-layer reduce (the full tile reduction).

    Routing: layers whose post-process is a pure concatenation or identity
    run as Catalyst aggregations (no per-tile Python task, no hot-tile
    floor); only genuinely geometric reduces (line noding, raster unions,
    rank+buffer filters) go through the pandas dispatch.

    ONE exchange + ONE pass for the whole reduction: the explicit
    repartition on (z,x,y,layer) satisfies every downstream clustering
    requirement — the label-grid window (its key is a superset), each
    branch's seq window, the P4/housenumber groupBys, and the pandas
    dispatch — and the persist() materializes the shuffled+ranked table
    once so the five routing branches read the cache instead of each
    re-scanning and re-shuffling the full tile table (union analysis
    re-aliases the branches, which defeats Spark's exchange reuse — five
    full exchanges of the biggest table; the measured scaling limiter is
    exactly this JVM memory traffic, not CPU). The cached scan preserves
    the hash partitioning, so no branch adds an exchange."""
    # doc_id is render-stage lineage only — dead weight in the reduce.
    # _tile_rows: count window on the same partitioning (no extra exchange)
    # routes fat z13 building tiles to the distributed component merge.
    #
    # Exchange width scales with INPUT SIZE (the ``size_hint`` the
    # pipeline derives from corpus bytes on disk), not just the session
    # default: the pandas dispatch is Python-CPU-bound per merge GROUP,
    # so at one wave per core on a 1M-doc corpus each task holds ~14
    # megacity merge groups and runs ~30 s (measured via
    # tools/profile_tile_phase — max task 32.9 s at 32 partitions vs
    # 6.7 s at ~1000). Small corpora keep the lean session default; a
    # file-count probe was rejected because checkpoint-resume scans
    # count many tiny part files and over-partition small builds.
    session_parts = int(
        tile_feats.sparkSession.conf.get("spark.sql.shuffle.partitions")
    )
    n_parts = max(session_parts, min(4096, size_hint))
    tf = grid_windows(
        tile_feats.drop("doc_id").repartition(
            n_parts, "z", "x", "y", "layer"
        )
    ).withColumn(
        "_tile_rows", F.count("*").over(Window.partitionBy("z", "x", "y", "layer"))
    ).persist()
    # Fill the cache with ONE job before the branches fan out. The union
    # action otherwise materializes the five routing branches as concurrent
    # AQE stage-jobs that RACE to fill this cache: within one executor the
    # block lock dedupes the compute, but across executors each JVM
    # recomputes the same uncached partitions (BlockManager only locks
    # locally; remote blocks that aren't finished yet fall back to full
    # lineage recompute — measured on a 4-executor standalone cluster as
    # ~6x duplicated scan+shuffle+window work, tools/cluster_diag.py).
    # On a SINGLE executor (local mode) the block lock already dedupes, so
    # the extra pass is pure overhead — fill eagerly only when >1 executor.
    # getExecutorInfos includes the DRIVER as one entry (local mode: just
    # "driver" = 1; a 1-executor cluster: driver + executor = 2), so the
    # multi-executor condition is strictly more than two entries.
    sc = tile_feats.sparkSession.sparkContext
    if len(sc._jsc.sc().statusTracker().getExecutorInfos()) > 2:
        tf.count()
    mp_pred = (F.col("layer") == "building") & (F.col("z") != 13)
    bz13_pred = (
        (F.col("layer") == "building") & (F.col("z") == 13)
        & (F.col("_tile_rows") > BUILDING_SHARD_MIN_ROWS)
    )
    hn_pred = F.col("layer") == "housenumber"
    sql_pred = stamped_sql_pred()
    pandas_layers = [l for l in POST_PROCESSORS if l != "housenumber"]
    pandas_pred = (
        F.col("layer").isin(pandas_layers) & ~mp_pred & ~bz13_pred & ~sql_pred
    )
    # identity layers ride the stamped branch: its when-chain falls through
    # to attrs-unchanged for them (one less full pass over the cached table)
    stamped_pred = sql_pred | (
        ~F.col("layer").isin(list(POST_PROCESSORS.keys()) + ["housenumber"])
    )
    parts = [
        reduce_tiles(tf.filter(pandas_pred).drop("_tile_rows")),
        merge_multi_polygon_sql(tf.filter(mp_pred)),
        building_z13_sharded(tf.filter(bz13_pred)),
        housenumber_reduce_sql(tf.filter(hn_pred)),
        stamped_reduce_sql(tf.filter(stamped_pred)),
    ]
    out = parts[0]
    for p in parts[1:]:
        out = out.unionByName(p)
    # hand the cache handle to the sink so it can unpersist after the
    # first materializing action (pipeline.write_tiles) instead of pinning
    # the full ranked tile table through the mbtiles/read-back phases;
    # also register it per-session so the NEXT finalize_tiles (or an
    # explicit release_finalize_cache) evicts it even when the consumer
    # never writes — bounds pinned caches to one per session.
    spark = tile_feats.sparkSession
    release_finalize_cache(spark)
    _FINALIZE_CACHE[id(spark)] = tf
    out._omt_cached = tf
    return out
