"""`transportation_name` layer — road name/ref labels + motorway junctions.

Reference: layers/TransportationName.java (junction preprocess J10
:156-210, highway labels :214-304, aerialway/shipway labels :306-340,
name-length-limited line merge :343-372, HighwayClass enum :375-408).

J9: reuses the shared route-joined highway DataFrame from transportation.
J10: the reference replays way→node topology; the document model has no
node ids, so the junction join is geometric — highways explode their
quantized vertices and equi-join the junction point coordinate, then
groupBy(junction).max(highway class rank). Same observable result, one
shuffle on the vertex key.
"""

from __future__ import annotations

import pandas as pd
from pyspark.sql import DataFrame
from pyspark.sql import functions as F
from pyspark.sql import types as T
from pyspark.sql.functions import pandas_udf

from ..features import attr_entries, emit, meter_thresholds_buffer, union_features, zattr, zattrs_array
from ..schema.layers import LAYER_BUFFERS
from ..tiling import postprocess
from .util import names_col, names_map, names_zattrs_col, nullif_empty, tag
from .transportation import highway_class, prepared_highways

BUFFER = LAYER_BUFFERS["transportation_name"]  # 8

MIN_LENGTH_METERS = {6: 20_000, 7: 20_000, 8: 14_000, 9: 8_000, 10: 4_000, 11: 2_000}

HIGHWAY_CLASS_RANK = {"motorway": 6, "trunk": 5, "primary": 4, "secondary": 3,
                      "tertiary": 2, "unclassified": 1}
RANK_TO_HIGHWAY = {v: k for k, v in HIGHWAY_CLASS_RANK.items()}

VERTEX_QUANTUM = 1e-7  # degrees — exact shared-node coordinates match


@pandas_udf(T.ArrayType(T.StringType()))
def _vertices_udf(wkts: pd.Series) -> pd.Series:
    from ..geom import wkt as wktmod
    from ..geom import ops

    out = []
    for w in wkts:
        try:
            g = wktmod.parse_wkt(w)
        except (ValueError, IndexError):
            g = None
        if g is None:
            out.append([])
            continue
        pts = ops._all_coords(g)
        out.append([f"{round(x / VERTEX_QUANTUM)}:{round(y / VERTEX_QUANTUM)}" for x, y in pts])
    return pd.Series(out)


def transform(ctx) -> DataFrame:
    parts = []
    cfg = ctx.config
    hw = ctx.shared("prepared_highways", lambda: prepared_highways(ctx))

    # --- J10 motorway junctions: max highway class among ways at the point
    junctions = ctx.table("osm_highway_point")
    if junctions.limit(1).count() > 0:  # tiny table; skip the join when empty
        class_rank = F.lit(0)
        for cls, rk in HIGHWAY_CLASS_RANK.items():
            class_rank = F.when(F.col("highway").isin(cls, cls + "_link"), F.lit(rk)).otherwise(class_rank)
        # reference HighwayClass.from matches the exact value only
        class_rank = F.lit(0)
        for cls, rk in HIGHWAY_CLASS_RANK.items():
            class_rank = F.when(F.col("highway") == cls, F.lit(rk)).otherwise(class_rank)
        way_vertices = (
            ctx.table("osm_highway_linestring")
            .withColumn("_rank", class_rank)
            .filter(F.col("_rank") > 0)
            .select(F.explode(_vertices_udf(F.col("geom_wkt"))).alias("_v"), "_rank")
        )
        best = way_vertices.groupBy("_v").agg(F.max("_rank").alias("_best_rank"))
        jpts = junctions.withColumn(
            "_v", F.element_at(_vertices_udf(F.col("geom_wkt")), 1)
        ).join(best, "_v", "inner").filter(F.col("_best_rank") > 0)
        cls_sql = "CASE " + " ".join(
            f"WHEN _best_rank = {int(rk)} THEN '{cls}'"
            for rk, cls in RANK_TO_HIGHWAY.items()
        ) + " END"
        jcls = highway_class(
            cls_sql, "CAST(NULL AS STRING)",
            "CAST(NULL AS STRING)", "CAST(NULL AS STRING)")
        parts.append(
            jpts.select(
                *emit(
                    "transportation_name", "point",
                    attrs=F.map_concat(
                        attr_entries(
                            **{
                                "ref": F.col("ref"),
                                "ref_length": F.length(F.col("ref")),
                                "class": jcls,
                                "subclass": F.lit("junction"),
                                "layer": F.when(F.col("layer") != 0, F.col("layer")),
                            }
                        ),
                        names_col(),
                    ),
                    minzoom=10, buffer_px=BUFFER,
                    sort_key=-F.coalesce(F.col("layer").cast("int"), F.lit(0)),
                )
            )
        )

    # --- highway labels (J9 reuse of _routes)
    routes = F.col("_routes")
    first_with_network = F.element_at(
        F.filter(routes, lambda x: x["network_type"].isNotNull()), 1
    )
    rel_ref = nullif_empty(first_with_network["ref"])
    ref = F.coalesce(rel_ref, nullif_empty(F.col("ref")))
    if cfg.transportation_name_minor_refs:
        any_ref = F.element_at(
            F.filter(routes, lambda x: x["ref"] != ""), 1
        )["ref"]
        ref = F.coalesce(ref, any_ref)
    name = nullif_empty(F.col("name"))
    clazz = highway_class("highway", "CAST(NULL AS STRING)",
                          "construction", "man_made")
    base_class = F.regexp_replace(clazz, "_construction$", "")
    is_link = F.col("highway").endswith("_link")

    labeled = (
        hw.withColumn("_class", clazz)
        .filter(
            nullif_empty(F.col("highway")).isNotNull()
            & F.col("_class").isNotNull()
            & (name.isNotNull() | ref.isNotNull())
        )
    )
    # label minzoom floor by class, then inherit the road's own minzoom.
    # (we recompute the same minzoom expression as transportation.transform —
    # shared via the prepared DataFrame's route columns)
    from .transportation import SERVICE_VALUES, TRUNK_Z5_LENGTH_WORLD, Z5_TRUNK_NETWORKS, Z5_MOTORWAY_EXEMPT

    route_rank = F.coalesce(F.array_min(F.transform(routes, lambda x: x["rank"])), F.lit(3))
    svc = F.when(F.col("service").isin(*SERVICE_VALUES), F.col("service"))
    z5_trunk_nets = F.exists(
        routes, lambda x: F.array_contains(F.array(*[F.lit(n) for n in Z5_TRUNK_NETWORKS]), x["network_type"])
    )
    z4_nets = F.exists(
        routes,
        lambda x: F.array_contains(
            F.array(*[F.lit(n) for n in Z5_TRUNK_NETWORKS if n not in Z5_MOTORWAY_EXEMPT]),
            x["network_type"],
        ),
    )
    no_network = ~F.exists(routes, lambda x: x["network_type"].isNotNull())
    trunk_mergeable = F.col("length") < F.lit(TRUNK_Z5_LENGTH_WORLD)
    z13_paths = cfg.transportation_z13_paths
    class_minzooms = {"path": 13 if z13_paths else 14, "track": 14, "service": 13,
                      "minor": 13, "raceway": 12, "busway": 11, "bus_guideway": 11,
                      "tertiary": 11, "secondary": 9, "primary": 7, "trunk": 6, "motorway": 4}
    cls_mz = F.lit(99)
    for c, z in class_minzooms.items():
        cls_mz = F.when(base_class == c, F.lit(z)).otherwise(cls_mz)
    trunk_z5_all = ((F.col("highway") == "trunk") & z5_trunk_nets) | trunk_mergeable
    road_minzoom = (
        F.when(F.col("man_made") == "pier", F.lit(13))
        .when(F.col("highway").isin("residential", "unclassified"), F.lit(12))
        .when(base_class == "service",
              F.when(svc.isin("driveway", "parking_aisle"), 14).otherwise(13))
        .when(
            base_class.isin("track", "path"),
            F.when(route_rank == 1, 12).otherwise(
                F.when(
                    F.lit(z13_paths) | name.isNotNull() | (route_rank <= 2)
                    | nullif_empty(F.col("sac_scale")).isNotNull(),
                    13,
                ).otherwise(14)
            ),
        )
        .when(
            base_class == "trunk",
            F.when(trunk_z5_all & z4_nets, F.lit(4))
            .when(trunk_z5_all, F.lit(5))
            .otherwise(F.lit(6)),
        )
        .when(base_class == "motorway", F.when(no_network | z4_nets, 4).otherwise(5))
        .otherwise(cls_mz)
    )
    road_minzoom = F.when(
        is_link | F.coalesce(F.col("construction").endswith("_link"), F.lit(False)),
        F.greatest(road_minzoom, F.lit(9)),
    ).otherwise(road_minzoom)

    label_floor = (
        F.when(base_class == "trunk", 8)
        .when(base_class == "motorway", 6)
        .when(is_link, 13)
        .otherwise(12)
    )
    minzoom = F.greatest(label_floor, road_minzoom)

    network_attr = F.coalesce(
        first_with_network["network_type"],
        F.when(ref.isNotNull(), F.lit("road")),
    )
    # route_N_* fanout with dedup (TransportationName.java:272-287)
    dedup = F.array_distinct(
        F.transform(
            routes,
            lambda x: F.struct(
                x["network"].alias("network"),
                F.coalesce(x["ref"], F.lit("")).alias("ref"),
                F.coalesce(x["name"], F.lit("")).alias("name"),
                F.coalesce(x["colour"], F.lit("")).alias("colour"),
            ),
        )
    )
    route_entries = F.flatten(
        F.transform(
            dedup,
            lambda x, i: F.filter(
                F.array(
                    F.struct(F.concat(F.lit("route_"), (i + 1).cast("string"), F.lit("_network")).alias("key"),
                             x["network"].alias("value")),
                    F.struct(F.concat(F.lit("route_"), (i + 1).cast("string"), F.lit("_ref")).alias("key"),
                             nullif_empty(x["ref"]).alias("value")),
                    F.struct(F.concat(F.lit("route_"), (i + 1).cast("string"), F.lit("_name")).alias("key"),
                             nullif_empty(x["name"]).alias("value")),
                    F.struct(F.concat(F.lit("route_"), (i + 1).cast("string"), F.lit("_colour")).alias("key"),
                             nullif_empty(x["colour"]).alias("value")),
                ),
                lambda e: e["value"].isNotNull(),
            ),
        )
    )
    is_footway_or_steps = F.col("highway").isin("footway", "steps")
    limit_merge = cfg.transportation_name_limit_merge
    extra = {}
    if limit_merge:
        extra["__islink"] = F.when(is_link, F.lit(1)).otherwise(F.lit(0))
        extra["__relid"] = first_with_network["rel_id"]
    zat = []
    if cfg.transportation_name_brunnel:
        from .util import brunnel as brunnel_fn

        z_at_3px = F.ceil(
            F.log2(F.lit(3.0) / (F.lit(256.0) * F.greatest(F.col("length"), F.lit(1e-15))))
        ).cast("int")
        zat.append(
            zattr("brunnel", F.greatest(F.lit(4), F.least(F.lit(12), z_at_3px)),
                  brunnel_fn(F.col("is_bridge"), F.col("is_tunnel"), F.col("is_ford")))
        )
    zat += [
        zattr("layer", 12, F.when(is_footway_or_steps & (F.col("layer") != 0), F.col("layer"))),
        zattr("level", 12, F.when(is_footway_or_steps, tag("level").cast("long"))),
        zattr("indoor", 12, F.when(is_footway_or_steps & F.col("indoor"), F.lit(1))),
    ]
    parts.append(
        labeled.filter(minzoom <= 14).select(
            *emit(
                "transportation_name", "line",
                attrs=F.map_concat(
                    F.map_concat(
                        attr_entries(
                            **{
                                "ref": ref,
                                "ref_length": F.when(ref.isNotNull(), F.length(ref)),
                                "network": network_attr,
                                "class": F.col("_class"),
                                "subclass": F.when(
                                    F.col("_class") == "path", F.col("highway")
                                ),
                                **extra,
                            }
                        ),
                        names_col(),
                    ),
                    F.map_from_entries(route_entries),
                ),
                zattrs=zattrs_array(*zat),
                minzoom=minzoom, buffer_px=BUFFER,
                buffer_overrides=meter_thresholds_buffer(MIN_LENGTH_METERS),
                min_pixel_size=0.0,
                sort_key=F.col("z_order"),
            )
        )
    )

    # --- aerialway / shipway labels
    aw = ctx.table("osm_aerialway_linestring").filter(nullif_empty(F.col("name")).isNotNull())
    parts.append(
        aw.select(
            *emit(
                "transportation_name", "line",
                attrs=F.map_concat(
                    attr_entries(**{"class": F.lit("aerialway"), "subclass": F.col("aerialway")}),
                    names_col(),
                ),
                minzoom=12, buffer_px=BUFFER,
                buffer_overrides=meter_thresholds_buffer(MIN_LENGTH_METERS),
                min_pixel_size=0.0, sort_key=F.col("z_order"),
            )
        )
    )
    sw = ctx.table("osm_shipway_linestring").filter(nullif_empty(F.col("name")).isNotNull())
    parts.append(
        sw.select(
            *emit(
                "transportation_name", "line",
                attrs=F.map_concat(
                    attr_entries(**{"class": F.col("shipway")}), names_col()
                ),
                minzoom=12, buffer_px=BUFFER,
                buffer_overrides=meter_thresholds_buffer(MIN_LENGTH_METERS),
                min_pixel_size=0.0, sort_key=F.col("z_order"),
            )
        )
    )
    return union_features(parts)


def _make_post_process(size_for_shield: bool):
    from ..features import meters_to_px

    def pp(zoom: int, pdf: pd.DataFrame) -> pd.DataFrame:
        tol = 0.1 if zoom < 14 else 0.0625
        min_len = meters_to_px(MIN_LENGTH_METERS[zoom], zoom) if zoom in MIN_LENGTH_METERS else 0.0
        if zoom >= 14:
            fn = None
            min_len = 0.0
        elif min_len > 0:
            fn = None
        else:
            def fn(attrs):
                ref = attrs.get("ref")
                name = attrs.get("name") or ref
                if size_for_shield and ref is not None:
                    return 6.0
                return len(name) * 6.0 if isinstance(name, str) else 1e18

        return postprocess.merge_line_strings(
            pdf, min_length_px=min_len, tolerance_px=tol, buffer_px=BUFFER, min_length_fn=fn
        )

    return pp


postprocess.register_post_processor("transportation_name", _make_post_process(False))
