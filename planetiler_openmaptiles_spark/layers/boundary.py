"""`boundary` layer — admin boundaries with left/right country codes.

Reference: layers/Boundary.java (NE lines :176-216, relation aggregation A5
:243-328, region polygonize + left/right vote J8 :339-472, line merge
:384-390).

Spark shape:
  * per-way relation aggregation (A5) is pure array expressions over the
    document's `rel` spans — no shuffle.
  * J8: admin-2 region member ways groupBy(region) → polygonize (Arrow UDF);
    the resulting region polygons are a tiny dimension → collected and
    broadcast into the left/right vote UDF, which samples 10 points offset
    ±10 m perpendicular and takes the majority region on each side —
    exactly the reference algorithm.
  * boundary segments that border countries groupBy their grouping key →
    applyInPandas: merge member lines, then vote per merged line.
"""

from __future__ import annotations

import numpy as np
import pandas as pd
from pyspark.sql import DataFrame
from pyspark.sql import functions as F
from pyspark.sql import types as T

from ..features import WORLD_CIRCUMFERENCE_METERS, attr_entries, emit, mps_below, union_features, zattr, zattrs_array
from ..geom import mercator, ops, wkt as wktmod
from ..schema.layers import LAYER_BUFFERS
from ..tiling import postprocess
from .util import names_col, names_map, names_zattrs_col, nullif_empty, tag

BUFFER = LAYER_BUFFERS["boundary"]

# ±10 m perpendicular sampling offset — the reference keeps planetiler's
# px-at-z0 value (metersToPixelAtEquator(0, 10)/256), we match it exactly
COUNTRY_TEST_OFFSET = 10.0 * 256 / WORLD_CIRCUMFERENCE_METERS / 256.0

REL_ARRAY = "array<struct<rel_id:long,role:string,rel_tags:map<string,string>>>"


def _is_disputed(tags_col):
    def b(key):
        return F.lower(F.coalesce(F.element_at(tags_col, key), F.lit(""))).isin(
            "yes", "true", "1"
        )

    return (
        b("disputed")
        | b("dispute")
        | (F.element_at(tags_col, "border_status") == "dispute")
        | F.element_at(tags_col, "disputed_by").isNotNull()
        | F.element_at(tags_col, "claimed_by").isNotNull()
    )


def _boundary_rels(rels):
    """Filter rel entries to admin boundary relations (admin_level 2..10)."""
    return F.filter(
        F.coalesce(rels, F.array().cast(REL_ARRAY)),
        lambda r: (F.element_at(r["rel_tags"], "type") == "boundary")
        & (F.element_at(r["rel_tags"], "boundary") == "administrative")
        & F.round(F.element_at(r["rel_tags"], "admin_level").cast("double")).cast("int").between(2, 10),
    )


def transform(ctx) -> DataFrame:
    parts = []
    cfg = ctx.config

    # --- NE boundary lines z0-4 (Boundary.java:176-216)
    if not cfg.boundary_osm_only:
        parts.append(_ne_lines(ctx))

    # --- OSM ways via relation aggregation (A5)
    feats = ctx.features.filter(F.col("geom_kind") == "linestring")
    rels = _boundary_rels(F.col("rels"))
    admin = F.transform(rels, lambda r: F.round(F.element_at(r["rel_tags"], "admin_level").cast("double")).cast("int"))
    min_admin = F.array_min(admin)
    rel_disputed = F.exists(rels, lambda r: _is_disputed(r["rel_tags"]))
    disputed_rel = F.element_at(F.filter(rels, lambda r: _is_disputed(r["rel_tags"])), 1)
    way_disputed = _is_disputed(F.col("tags"))
    disputed = rel_disputed | way_disputed
    disputed_name = F.coalesce(
        F.element_at(disputed_rel["rel_tags"], "name"),
        F.when(way_disputed, F.element_at(F.col("tags"), "name")),
    )
    claimed_by = F.coalesce(
        F.element_at(disputed_rel["rel_tags"], "claimed_by"),
        F.when(way_disputed, F.element_at(F.col("tags"), "claimed_by")),
    )
    maritime = (
        F.lower(F.coalesce(tag("maritime"), F.lit(""))).isin("yes", "true", "1")
        | (tag("natural") == "coastline")
        | (tag("boundary_type") == "maritime")
    )
    # admin-2 regions with an ISO code this way belongs to
    region_rels = F.filter(
        rels,
        lambda r: (F.round(F.element_at(r["rel_tags"], "admin_level").cast("double")).cast("int") == 2)
        & F.element_at(r["rel_tags"], "ISO3166-1:alpha3").isNotNull(),
    )
    region_ids = F.array_distinct(F.transform(region_rels, lambda r: r["rel_id"]))
    minzoom = (
        F.when(maritime & (min_admin == 2), 4)
        .when(min_admin <= 4, 5)
        .when(min_admin <= 6, 9)
        .when(min_admin <= 8, 11)
        .otherwise(12)
    )
    if cfg.boundary_osm_only:
        minzoom = F.when(
            min_admin <= 4,
            F.when(min_admin == 2, F.when(maritime, 4).otherwise(0)).otherwise(1),
        ).otherwise(minzoom)

    ways = feats.filter(F.size(rels) > 0).select(
        "doc_id", "elem_id", "geom_wkt",
        min_admin.alias("_admin"),
        disputed.cast("boolean").alias("_disputed"),
        maritime.alias("_maritime"),
        minzoom.alias("_minzoom"),
        claimed_by.alias("_claimed_by"),
        disputed_name.alias("_disputed_name"),
        region_ids.alias("_regions"),
        F.transform(
            region_rels,
            lambda r: F.struct(
                r["rel_id"].alias("rel_id"),
                F.element_at(r["rel_tags"], "ISO3166-1:alpha3").alias("iso"),
            ),
        ).alias("_region_iso"),
    ).filter(F.col("_admin").isNotNull())

    use_vote = cfg.boundary_country_names
    bordering = ways.filter(F.size(F.col("_regions")) > 0) if use_vote else ways.limit(0)
    direct = ways.filter(F.size(F.col("_regions")) == 0) if use_vote else ways

    def _edit_name(c):
        return F.regexp_replace(
            F.regexp_replace(F.regexp_replace(c, " at ", ""), r"\s+", ""), "Extentof", ""
        )

    parts.append(
        direct.select(
            *emit(
                "boundary", "line",
                attrs=attr_entries(
                    admin_level=F.col("_admin"),
                    disputed=F.when(F.col("_disputed"), 1).otherwise(0),
                    maritime=F.when(F.col("_maritime"), 1).otherwise(0),
                    claimed_by=F.col("_claimed_by"),
                    disputed_name=_edit_name(F.col("_disputed_name")),
                ),
                minzoom=F.col("_minzoom"), buffer_px=BUFFER, min_pixel_size=0.0,
            )
        )
    )

    if use_vote:
        parts.append(_bordering_with_vote(ctx, bordering))

    # --- boundary polygons (aboriginal lands)
    bp = ctx.table("osm_boundary_polygon")
    parts.append(
        bp.select(
            *emit(
                "boundary", "polygon",
                attrs=F.map_concat(
                    attr_entries(**{"class": F.col("boundary")}), names_col()
                ),
                minzoom=4, buffer_px=BUFFER,
                mps_overrides=F.array(mps_below(13, 4.0)),
            )
        )
    )
    return union_features(parts)


def _ne_lines(ctx) -> DataFrame:
    ne = ctx.natural_earth(
        "ne_110m_admin_0_boundary_lines_land",
        "ne_50m_admin_0_boundary_lines_land",
        "ne_10m_admin_0_boundary_lines_land",
        "ne_10m_admin_1_states_provinces_lines",
    )
    fcla = F.coalesce(tag("featurecla"), F.lit(""))
    disputed = fcla.startswith("Disputed")
    left, right = tag("adm0_left"), tag("adm0_right")
    ss_ke = disputed & (
        ((left == "South Sudan") & (right == "Kenya"))
        | ((left == "Kenya") & (right == "South Sudan"))
    )
    min_zoom_tag = tag("min_zoom").cast("double")
    tbl = F.col("source_layer")
    admin = F.when(tbl == "ne_10m_admin_1_states_provinces_lines", 4).otherwise(2)
    mz = (
        F.when(tbl == "ne_110m_admin_0_boundary_lines_land", F.lit(0))
        .when(tbl == "ne_50m_admin_0_boundary_lines_land", F.lit(1))
        .when(tbl == "ne_10m_admin_0_boundary_lines_land",
              F.when(ss_ke, F.lit(1)).otherwise(F.lit(4)))
        .when(min_zoom_tag <= 7, F.lit(1))
        .when(min_zoom_tag <= 7.7, F.lit(4))
    )
    xz = (
        F.when(tbl == "ne_110m_admin_0_boundary_lines_land", F.lit(0))
        .when(tbl == "ne_50m_admin_0_boundary_lines_land", F.lit(3))
        .otherwise(F.lit(4))
    )
    keep = mz.isNotNull() & ~(
        (tbl == "ne_10m_admin_0_boundary_lines_land") & (fcla == "Lease limit") & ~ss_ke
    )
    return ne.filter(keep).select(
        *emit(
            "boundary", "line",
            attrs=attr_entries(
                admin_level=admin,
                maritime=F.lit(0),
                disputed=F.when(disputed, 1).otherwise(0),
            ),
            minzoom=mz, maxzoom=xz, buffer_px=BUFFER, min_pixel_size=0.0,
        )
    )


_VOTE_SCHEMA = T.StructType(
    [
        T.StructField("doc_id", T.StringType()),
        T.StructField("elem_id", T.LongType()),
        T.StructField("geom_wkt", T.StringType()),
        T.StructField("_admin", T.IntegerType()),
        T.StructField("_disputed", T.BooleanType()),
        T.StructField("_maritime", T.BooleanType()),
        T.StructField("_minzoom", T.IntegerType()),
        T.StructField("_claimed_by", T.StringType()),
        T.StructField("_disputed_name", T.StringType()),
        T.StructField("adm0_l", T.StringType()),
        T.StructField("adm0_r", T.StringType()),
    ]
)


def _to_world(g):
    def fn(c):
        x, y = mercator.lonlat_to_world(c[:, 0], c[:, 1])
        return np.column_stack([x, y])

    kind, data = g
    if kind == "LineString":
        return (kind, fn(np.asarray(data)))
    if kind == "MultiLineString":
        return (kind, [fn(np.asarray(l)) for l in data])
    return None


def _bordering_with_vote(ctx, bordering: DataFrame) -> DataFrame:
    """J8: polygonize regions, merge boundary segments, vote left/right."""
    # Region polygons: all member ways of each admin-2 region, polygonized
    # PER REGION ON THE EXECUTORS (groupBy rel_id → applyInPandas); the
    # driver collects only the finished polygons (pickled, exact float64)
    # and broadcasts them. Member-way geometries never pass through the
    # driver — at planet scale the old region_ways.collect() pulled every
    # admin-2 way through driver memory.
    region_ways = bordering.select(
        F.explode(F.col("_region_iso")).alias("ri"), F.col("geom_wkt")
    ).select(F.col("ri.rel_id").alias("rel_id"), F.col("ri.iso").alias("iso"), "geom_wkt")

    poly_schema = T.StructType(
        [
            T.StructField("rel_id", T.LongType()),
            T.StructField("iso", T.StringType()),
            T.StructField("poly", T.BinaryType()),
        ]
    )

    def polygonize(key, pdf: pd.DataFrame) -> pd.DataFrame:
        import pickle

        lines = []
        for w in pdf["geom_wkt"]:
            g = wktmod.parse_wkt(w)
            g = _to_world(g) if g is not None else None
            if g is None:
                continue
            if g[0] == "LineString":
                lines.append(np.asarray(g[1]))
            else:
                lines.extend(np.asarray(l) for l in g[1])
        poly = ops.polygonize_lines(lines, quantum=1e-9) if lines else None
        if poly is None:
            return pd.DataFrame({"rel_id": [], "iso": [], "poly": []}).astype(
                {"rel_id": "int64"}
            )
        return pd.DataFrame(
            {
                "rel_id": [int(key[0])],
                "iso": [pdf["iso"].iloc[0]],
                "poly": [pickle.dumps(poly, protocol=4)],
            }
        )

    import pickle

    region_polys = {}
    iso_by_region = {}
    for r in region_ways.groupBy("rel_id").applyInPandas(polygonize, poly_schema).collect():
        region_polys[r["rel_id"]] = pickle.loads(r["poly"])
        iso_by_region[r["rel_id"]] = r["iso"]

    spark = ctx.spark
    bc_polys = spark.sparkContext.broadcast(region_polys)
    bc_iso = spark.sparkContext.broadcast(iso_by_region)

    grouped = bordering.withColumn(
        "_gkey",
        F.concat_ws(
            "|",
            F.col("_admin"), F.col("_disputed").cast("string"),
            F.col("_maritime").cast("string"), F.col("_minzoom"),
            F.coalesce(F.col("_claimed_by"), F.lit("")),
            F.coalesce(F.col("_disputed_name"), F.lit("")),
            F.array_join(F.sort_array(F.col("_regions")), ","),
        ),
    )

    def vote(key, pdf: pd.DataFrame) -> pd.DataFrame:
        polys = bc_polys.value
        regions = set()
        lines = []
        for w in pdf["geom_wkt"]:
            g = wktmod.parse_wkt(w)
            g = _to_world(g) if g is not None else None
            if g is None:
                continue
            if g[0] == "LineString":
                lines.append(np.asarray(g[1]))
            else:
                lines.extend(np.asarray(l) for l in g[1])
        for arr in pdf["_regions"]:
            regions.update(int(x) for x in arr)
        merged = ops.merge_lines(lines, quantum=1e-9)
        first = pdf.iloc[0]
        out = []
        for line in merged:
            lefts, rights = [], []
            valid = [r for r in regions if r in polys]
            for i in range(10):
                ratio = (i + 1) / 12.0
                right_pt = ops.point_along_offset(line, ratio, COUNTRY_TEST_OFFSET)
                left_pt = ops.point_along_offset(line, ratio, -COUNTRY_TEST_OFFSET)
                for rid in valid:
                    geom = polys[rid]
                    if ops.point_in_geom(right_pt, geom):
                        rights.append(rid)
                    elif ops.point_in_geom(left_pt, geom):
                        lefts.append(rid)

            def mode(vals):
                if not vals:
                    return None
                counts = {}
                for v in vals:
                    counts[v] = counts.get(v, 0) + 1
                return max(counts.items(), key=lambda kv: (kv[1], -kv[0]))[0]

            right = mode(rights)
            if right is not None:
                lefts = [v for v in lefts if v != right]
            left = mode(lefts)
            iso = bc_iso.value
            # back to lon/lat WKT for the feature pipeline
            lon, lat = mercator.world_to_lonlat(line[:, 0], line[:, 1])
            ll = np.column_stack([lon, lat])
            out.append(
                (
                    first["doc_id"], int(first["elem_id"]),
                    wktmod.to_wkt(("LineString", ll)),
                    int(first["_admin"]), bool(first["_disputed"]),
                    bool(first["_maritime"]), int(first["_minzoom"]),
                    first["_claimed_by"], first["_disputed_name"],
                    iso.get(left) if left is not None else None,
                    iso.get(right) if right is not None else None,
                )
            )
        return pd.DataFrame(out, columns=[f.name for f in _VOTE_SCHEMA.fields])

    voted = grouped.groupBy("_gkey").applyInPandas(vote, _VOTE_SCHEMA)

    def _edit_name(c):
        return F.regexp_replace(
            F.regexp_replace(F.regexp_replace(c, " at ", ""), r"\s+", ""), "Extentof", ""
        )

    is_adm2_clean = (F.col("_admin") == 2) & (~F.col("_disputed"))
    return voted.select(
        *emit(
            "boundary", "line",
            attrs=attr_entries(
                admin_level=F.col("_admin"),
                disputed=F.when(F.col("_disputed"), 1).otherwise(0),
                maritime=F.when(F.col("_maritime"), 1).otherwise(0),
                claimed_by=F.col("_claimed_by"),
                disputed_name=F.when(F.col("_disputed"), _edit_name(F.col("_disputed_name"))),
            ),
            zattrs=zattrs_array(
                zattr("adm0_l", 5, F.when(is_adm2_clean, F.col("adm0_l"))),
                zattr("adm0_r", 5, F.when(is_adm2_clean, F.col("adm0_r"))),
            ),
            minzoom=F.col("_minzoom"), buffer_px=BUFFER, min_pixel_size=0.0,
        )
    )


def _post_process(zoom: int, pdf: pd.DataFrame) -> pd.DataFrame:
    tol = 0.1 if zoom < 14 else 0.0625
    return postprocess.merge_line_strings(pdf, 0.0625, tol, BUFFER)


postprocess.register_post_processor("boundary", _post_process)
