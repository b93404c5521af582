"""`transportation` layer — roads, rails, aerialways, ferries.

Reference: layers/Transportation.java (class mapping OpenMapTilesSchema
:1174-1212, route-relation network classification :352-474, highway emit
:514-560, minzoom logic :562-616, rail :636-663, aerialway :666-678,
shipway :681-694, highway polygons :697-713, oneway-fenced line merge
:715-736).

Route relations (J1) come from the document's `rel` spans; the GB/IE
ref-network inference (J6) is a broadcast country-polygon intersects test.
The shared route-joined highway DataFrame is published via ctx.shared for
transportation_name (J9).
"""

from __future__ import annotations

from functools import lru_cache

import pandas as pd
from pyspark.sql import DataFrame
from pyspark.sql import functions as F
from pyspark.sql import types as T

from .. import exprs as X
from .. import spatial
from ..features import attr_entries, emit, meters_to_px, union_features, zattr, zattrs_array
from ..schema.layers import LAYER_BUFFERS
from ..tiling import postprocess
from .util import brunnel, nullif_empty, tag, tag_sql

BUFFER = LAYER_BUFFERS["transportation"]

# --------------------------------------------------------------- vocabularies

RAILWAY_RAIL = ("rail", "narrow_gauge", "preserved", "funicular")
RAILWAY_TRANSIT = ("subway", "light_rail", "monorail", "tram")
SERVICE_VALUES = ("spur", "yard", "siding", "crossover", "driveway", "alley", "parking_aisle")
SURFACE_UNPAVED = ("unpaved", "compacted", "dirt", "earth", "fine_gravel", "grass",
                   "grass_paver", "gravel", "gravel_turf", "ground", "ice", "mud",
                   "pebblestone", "salt", "sand", "snow", "woodchips")
SURFACE_PAVED = ("paved", "asphalt", "cobblestone", "concrete", "concrete:lanes",
                 "concrete:plates", "metal", "paving_stones", "sett",
                 "unhewn_cobblestone", "wood", "grade1")
ACCESS_NO = ("private", "no")

CLASS_RULES = [
    ("motorway", ("motorway", "motorway_link")),
    ("trunk", ("trunk", "trunk_link")),
    ("primary", ("primary", "primary_link")),
    ("secondary", ("secondary", "secondary_link")),
    ("tertiary", ("tertiary", "tertiary_link")),
    ("minor", ("unclassified", "residential", "living_street", "road")),
    ("path", ("pedestrian", "path", "footway", "cycleway", "steps", "bridleway", "corridor")),
    ("service", ("service",)),
    ("track", ("track",)),
    ("raceway", ("raceway",)),
    ("busway", ("busway",)),
    ("bus_guideway", ("bus_guideway",)),
    ("ferry", ("shipway",)),
]
CONSTRUCTION_CLASSES = {
    "motorway": ("motorway", "motorway_link"),
    "trunk": ("trunk", "trunk_link"),
    "primary": ("primary", "primary_link"),
    "secondary": ("secondary", "secondary_link"),
    "tertiary": ("tertiary", "tertiary_link"),
    "minor": ("", "unclassified", "residential", "living_street", "road"),
    "path": ("pedestrian", "path", "footway", "cycleway", "steps", "bridleway", "corridor"),
    "service": ("service",),
    "track": ("track",),
    "raceway": ("raceway",),
}

MIN_LENGTH_PX = {7: 50, 6: 100, 5: 500, 4: 1_000}  # meters per zoom (postProcess)

Z5_TRUNK_NETWORKS = ("ca-transcanada", "ca-provincial-arterial", "us-interstate",
                     "us-highway", "gb-motorway", "gb-trunk", "ie-motorway",
                     "ie-national", "e-road", "a-road")
Z5_MOTORWAY_EXEMPT = ("gb-trunk", "us-highway")

NETWORK_ORDER = ["us-interstate", "us-highway", "us-state", "ca-transcanada",
                 "ca-provincial-arterial", "ca-provincial", "gb-motorway", "gb-trunk",
                 "gb-primary", "ie-motorway", "ie-national", "ie-regional", "e-road",
                 "a-road"]

TRUNK_Z5_LENGTH_WORLD = 500.0 * 256 / 40075016.686  # planetiler unit quirk kept


@lru_cache(maxsize=256)
def highway_class(highway: str, public_transport: str,
                  construction: str, man_made: str) -> F.Column:
    """Transportation.java highwayClass, rendered as one SQL CASE text
    (single py4j call, cached process-wide; identical Catalyst tree to
    the former per-rule F.when chain). Arguments are SQL fragments —
    column names, tag lookups, or 'CAST(NULL AS STRING)'."""
    hw, pt, cons, mm = highway, public_transport, construction, man_made

    def _in(expr_sql, values):
        vals = ", ".join("'" + X.sql_quote(v) + "'" for v in values)
        return f"{expr_sql} IN ({vals})"

    def fize(expr_sql):
        return "coalesce(" + expr_sql + ", '')"

    whens = []
    for clazz, values in CLASS_RULES:
        cond = _in(hw, values)
        if clazz == "path":
            cond = f"({cond}) OR ({pt} = 'platform')"
        whens.append(f"WHEN {cond} THEN '{clazz}'")
    for clazz, cvals in CONSTRUCTION_CLASSES.items():
        whens.append(
            f"WHEN {hw} = 'construction' AND {_in(fize(cons), cvals)} "
            f"THEN '{clazz}_construction'"
        )
    mapped = f"CASE {' '.join(whens)} ELSE CAST(NULL AS STRING) END"
    has_hw = (
        f"({hw} IS NOT NULL AND {hw} <> '') OR ({pt} IS NOT NULL AND {pt} <> '')"
    )
    return X.expr(
        f"CASE WHEN {has_hw} THEN {mapped} "
        f"ELSE CASE WHEN {_in(mm, ('bridge', 'pier'))} THEN {mm} END END"
    )


def _surface(v: F.Column) -> F.Column:
    return (
        F.when(v.isin(*SURFACE_PAVED), F.lit("paved"))
        .when(v.isin(*SURFACE_UNPAVED), F.lit("unpaved"))
        .otherwise(F.lit(None))
    )


def _network_type(network: F.Column, ref: F.Column) -> F.Column:
    """Route relation network classification (Transportation.java:362-391)."""
    return (
        F.when(network == "US:I", F.lit("us-interstate"))
        .when(network == "US:US", F.lit("us-highway"))
        .when((F.length(network) == 5) & network.startswith("US:"), F.lit("us-state"))
        .when(network.startswith("CA:transcanada"), F.lit("ca-transcanada"))
        .when(network == "CA:QC:A", F.lit("ca-provincial-arterial"))
        .when(
            network == "CA:ON:primary",
            F.when((F.length(ref) == 3) & ref.startswith("4"), F.lit("ca-provincial-arterial"))
            .when(ref == "QEW", F.lit("ca-provincial-arterial"))
            .otherwise(F.lit("ca-provincial")),
        )
        .when((network == "CA:MB:PTH") & (ref == "75"), F.lit("ca-provincial-arterial"))
        .when((network == "CA:AB:primary") & ref.isin("2", "3", "4"), F.lit("ca-provincial-arterial"))
        .when((network == "CA:BC") & ref.isin("3", "5", "99"), F.lit("ca-provincial-arterial"))
        .when(
            ((F.length(network) == 5) & network.startswith("CA:"))
            | ((F.length(network) >= 6) & network.startswith("CA:") & (F.substring(network, 6, 1) == ":")),
            F.lit("ca-provincial"),
        )
        .otherwise(F.lit(None))
    )


REL_STRUCT = ("array<struct<ref:string,network:string,name:string,colour:string,"
              "network_type:string,rank:int,rel_id:long>>")


def route_relations(ctx, hw: DataFrame) -> DataFrame:
    """Adds `_routes`: sorted array of route-relation infos per way, including
    the GB/IE ref-convention pseudo-relations (J6)."""
    routes = F.transform(
        F.filter(
            F.coalesce(F.col("rels"), F.array().cast(
                "array<struct<rel_id:long,role:string,rel_tags:map<string,string>>>")),
            lambda rr: rr["rel_tags"].isNotNull()
            & F.coalesce(F.element_at(rr["rel_tags"], "type") == "route", F.lit(False))
            & F.coalesce(
                F.element_at(rr["rel_tags"], "route").isin("road", "hiking"), F.lit(False)
            ),
        ),
        lambda rr: F.struct(
            F.coalesce(F.element_at(rr["rel_tags"], "ref"), F.lit("")).alias("ref"),
            F.element_at(rr["rel_tags"], "network").alias("network"),
            nullif_empty(F.element_at(rr["rel_tags"], "name")).alias("name"),
            F.coalesce(
                nullif_empty(F.element_at(rr["rel_tags"], "colour")),
                nullif_empty(F.element_at(rr["rel_tags"], "ref:colour")),
            ).alias("colour"),
            _network_type(
                F.element_at(rr["rel_tags"], "network"),
                F.element_at(rr["rel_tags"], "ref"),
            ).alias("network_type"),
            (
                F.when(F.element_at(rr["rel_tags"], "network").isin("iwn", "nwn", "rwn"), 1)
                .when(F.element_at(rr["rel_tags"], "network") == "lwn", 2)
                .when(
                    F.element_at(rr["rel_tags"], "osmc:symbol").isNotNull()
                    | F.element_at(rr["rel_tags"], "colour").isNotNull(),
                    2,
                )
                .otherwise(3)
            ).cast("int").alias("rank"),
            rr["rel_id"].alias("rel_id"),
        ),
    )
    # keep only relations the reference would keep (network set or rank<3)
    routes = F.filter(routes, lambda x: x["network"].isNotNull() | (x["rank"] < 3))

    # GB / IE ref-convention pseudo relations (broadcast country polys, J6)
    gb = (
        ctx.natural_earth("ne_10m_admin_0_countries")
        .filter(F.element_at(F.col("tags"), "iso_a2") == "GB")
        .select(F.col("geom_wkt").alias("_gb_wkt")).limit(1)
    )
    ie = (
        ctx.natural_earth("ne_10m_admin_0_countries")
        .filter(F.element_at(F.col("tags"), "iso_a2") == "IE")
        .select(F.col("geom_wkt").alias("_ie_wkt")).limit(1)
    )
    hw = hw.join(F.broadcast(gb), F.lit(True), "left").join(
        F.broadcast(ie), F.lit(True), "left"
    )
    gb_ref = F.regexp_extract(F.col("ref"), r"^[ABM][0-9ABM()]+", 0)
    ie_ref = F.regexp_extract(F.col("ref"), r"^[MNRL][0-9]+", 0)
    in_gb = (
        (gb_ref != "") & F.col("_gb_wkt").isNotNull()
        & spatial.within_distance_udf_10km(F.col("_gb_wkt"), F.col("geom_wkt"))
    )
    in_ie = (
        (ie_ref != "") & F.col("_ie_wkt").isNotNull()
        & spatial.within_distance_udf_10km(F.col("_ie_wkt"), F.col("geom_wkt"))
    )
    gb_type = (
        F.when(F.col("highway") == "motorway", F.lit("gb-motorway"))
        .when(F.col("highway") == "trunk", F.lit("gb-trunk"))
        .when(F.col("highway").isin("primary", "secondary"), F.lit("gb-primary"))
    )
    gb_net = F.when(gb_type.isNotNull(), F.concat(F.lit("omt-"), gb_type))
    ie_type = (
        F.when(F.col("highway") == "motorway", F.lit("ie-motorway"))
        .when(F.col("highway").isin("trunk", "primary"), F.lit("ie-national"))
        .otherwise(F.lit("ie-regional"))
    )
    pseudo = []
    for cond, refm, ntype, nnet in (
        (in_gb, gb_ref, gb_type, gb_net),
        (in_ie, ie_ref, ie_type, F.concat(F.lit("omt-"), ie_type)),
    ):
        pseudo.append(
            F.when(
                cond,
                F.array(
                    F.struct(
                        refm.alias("ref"),
                        nnet.alias("network"),
                        F.lit(None).cast("string").alias("name"),
                        F.lit(None).cast("string").alias("colour"),
                        ntype.alias("network_type"),
                        F.lit(-1).cast("int").alias("rank"),
                        F.lit(0).cast("long").alias("rel_id"),
                    )
                ),
            ).otherwise(F.array().cast(REL_STRUCT))
        )
    all_routes = F.concat(routes.cast(REL_STRUCT), *pseudo)
    # RELATION_ORDERING: network_type ordinal, network, len(ref), ref
    order_map = F.array(*[F.lit(n) for n in NETWORK_ORDER])
    sorted_routes = F.array_sort(
        F.transform(
            all_routes,
            lambda x: F.struct(
                F.when(x["network_type"].isNull(), F.lit(99))
                .otherwise(F.array_position(order_map, x["network_type"]) - 1)
                .cast("int").alias("ord"),
                F.coalesce(x["network"], F.lit("")).alias("net_sort"),
                F.length(x["ref"]).cast("int").alias("ref_len"),
                x["ref"].alias("ref"),
                x["network"].alias("network"),
                x["name"].alias("name"),
                x["colour"].alias("colour"),
                x["network_type"].alias("network_type"),
                x["rank"].alias("rank"),
                x["rel_id"].alias("rel_id"),
            ),
        )
    )
    return hw.withColumn("_routes", sorted_routes).drop("_gb_wkt", "_ie_wkt")


def _min_route_rank(routes: F.Column) -> F.Column:
    return F.coalesce(
        F.array_min(F.transform(routes, lambda x: x["rank"])), F.lit(3)
    )


def _has_network(routes: F.Column, *networks: str) -> F.Column:
    arr = F.array(*[F.lit(n) for n in networks])
    return F.exists(routes, lambda x: F.array_contains(arr, x["network_type"]))


def prepared_highways(ctx) -> DataFrame:
    """Shared route-joined highway table (consumed by transportation_name too).

    persist() is load-bearing twice over: (a) the `_routes` array expression
    is enormous — without a materialization barrier CollapseProject inlines
    it into every downstream reference and the generated code blows past the
    JVM 64 KB method limit (interpreted fallback, ~300 ms/row); (b) both
    transportation and transportation_name consume this table (J9)."""
    hw = ctx.table("osm_highway_linestring").filter(~F.col("is_area"))
    hw = spatial.with_geom_stats(hw)
    hw = route_relations(ctx, hw)
    return hw.persist()


def transform(ctx) -> DataFrame:
    parts = []
    z13_paths = ctx.config.transportation_z13_paths
    hw = ctx.shared("prepared_highways", lambda: prepared_highways(ctx))

    clazz = highway_class("highway", "public_transport",
                          "construction", "man_made")
    hw = hw.withColumn("_class", clazz).filter(F.col("_class").isNotNull())
    # drop closed pier lines (F10, Transportation.java:618-632)
    is_closed = F.col("geom_wkt").rlike(r"^LINESTRING") & (
        F.regexp_extract(F.col("geom_wkt"), r"\(\s*([^,]+),", 1)
        == F.regexp_extract(F.col("geom_wkt"), r",\s*([^,]+)\s*\)$", 1)
    )
    hw = hw.filter(~((F.col("man_made") == "pier") & is_closed))

    routes = F.col("_routes")
    route_rank = _min_route_rank(routes)
    base_class = F.regexp_replace(F.col("_class"), "_construction$", "")
    svc = F.when(F.col("service").isin(*SERVICE_VALUES), F.col("service"))
    z5_trunk_nets = _has_network(routes, *Z5_TRUNK_NETWORKS)
    z4_motorway_nets = F.exists(
        routes,
        lambda x: F.array_contains(
            F.array(*[F.lit(n) for n in Z5_TRUNK_NETWORKS if n not in Z5_MOTORWAY_EXEMPT]),
            x["network_type"],
        ),
    )
    no_network = ~F.exists(routes, lambda x: x["network_type"].isNotNull())
    trunk_mergeable = F.col("length") < F.lit(TRUNK_Z5_LENGTH_WORLD)
    is_link = F.col("highway").endswith("_link")

    class_minzooms = {
        "path": 13 if z13_paths else 14, "track": 14, "service": 13, "minor": 13,
        "raceway": 12, "busway": 11, "bus_guideway": 11, "tertiary": 11,
        "secondary": 9, "primary": 7, "trunk": 6, "motorway": 4,
    }
    cls_mz = F.lit(99)
    for c, z in class_minzooms.items():
        cls_mz = F.when(base_class == c, F.lit(z)).otherwise(cls_mz)

    trunk_z5 = (F.col("highway") == "trunk") & z5_trunk_nets
    trunk_z5_all = trunk_z5 | trunk_mergeable
    trunk_to_motorway = trunk_z5_all & z4_motorway_nets
    minzoom = (
        F.when(F.col("man_made") == "pier", F.lit(13))
        .when(F.col("highway").isin("residential", "unclassified"), F.lit(12))
        .when(base_class == "service",
              F.when(svc.isin("driveway", "parking_aisle"), 14).otherwise(13))
        .when(
            base_class.isin("track", "path"),
            F.when(route_rank == 1, 12).otherwise(
                F.when(
                    F.lit(z13_paths)
                    | nullif_empty(F.col("name")).isNotNull()
                    | (route_rank <= 2)
                    | nullif_empty(F.col("sac_scale")).isNotNull(),
                    13,
                ).otherwise(14)
            ),
        )
        .when(
            base_class == "trunk",
            F.when(trunk_to_motorway, F.lit(class_minzooms["motorway"]))
            .when(trunk_z5_all, F.lit(5))
            .otherwise(F.lit(class_minzooms["trunk"])),
        )
        .when(
            base_class == "motorway",
            F.when(no_network | z4_motorway_nets, F.lit(4)).otherwise(F.lit(5)),
        )
        .otherwise(cls_mz)
    )
    minzoom = F.when(
        is_link | F.coalesce(F.col("construction").endswith("_link"), F.lit(False)),
        F.greatest(minzoom, F.lit(9)),
    ).otherwise(minzoom)

    # trunk→motorway class override at z<=5 for small mergeable segments
    class_zattr = F.when(
        (base_class == "trunk") & trunk_mergeable & ~trunk_to_motorway & (minzoom <= 5),
        F.array(
            zattr("class", 0, F.regexp_replace(F.col("_class"), "trunk", "motorway")),
            zattr("class", 6, F.col("_class")),
        ),
    )

    network_type = F.element_at(F.filter(routes, lambda x: x["network_type"].isNotNull()), 1)["network_type"]
    subclass = F.when(
        F.col("_class") == "path",
        F.coalesce(nullif_empty(F.col("public_transport")), F.col("highway")),
    )
    ramp_above = F.when(is_link | F.col("is_ramp"), F.lit(1))
    ramp_below = F.when(is_link, F.lit(1))
    expressway = F.when(
        F.col("expressway") & (F.col("highway") != "motorway") & ~(F.col("is_ramp") | is_link),
        F.lit(1),
    )
    official = F.when(
        F.col("highway").isin("path", "footway", "cycleway", "bridleway"),
        F.when(tag("informal") == "yes", F.lit(0))
        .when((tag("informal") == "no") | (nullif_empty(tag("operator")).isNotNull()), F.lit(1)),
    )
    # setAttrWithMinSize(value, minPixelSize=4, minZ, maxZ): attr minzoom =
    # clamp(zoom where feature reaches 4px, minZ, maxZ)
    z_at_4px = F.ceil(
        F.log2(F.lit(4.0) / (F.lit(256.0) * F.greatest(F.col("length"), F.lit(1e-15))))
    ).cast("int")
    brunnel_mz = F.greatest(F.lit(4), F.least(F.lit(12), z_at_4px))
    layer_mz = F.greatest(F.lit(9), F.least(F.lit(12), z_at_4px))
    is_footway_or_steps = F.col("highway").isin("footway", "steps")

    hw_feats = hw.select(
        *emit(
            "transportation", "line",
            attrs=attr_entries(
                **{
                    "class": F.when(class_zattr.isNotNull(), F.lit(None)).otherwise(
                        F.coalesce(
                            F.when(trunk_to_motorway,
                                   F.regexp_replace(F.col("_class"), "trunk", "motorway")),
                            F.col("_class"),
                        )
                    ),
                    "subclass": subclass,
                    "network": network_type,
                    "ramp": F.when(minzoom >= 12, ramp_above),
                    "level": F.when(is_footway_or_steps, tag("level").cast("long")),
                    "indoor": F.when(is_footway_or_steps & F.col("indoor"), F.lit(1)),
                }
            ),
            zattrs=F.concat(
                F.coalesce(class_zattr, F.array().cast(
                    "array<struct<key:string,minzoom:int,value:string>>")),
                zattrs_array(
                    zattr("brunnel", brunnel_mz,
                          brunnel(F.col("is_bridge"), F.col("is_tunnel"), F.col("is_ford"))),
                    zattr("expressway", 8, expressway),
                    zattr("layer", layer_mz, F.when(F.col("layer") != 0, F.col("layer"))),
                    zattr("bicycle", 9, nullif_empty(F.col("bicycle"))),
                    zattr("foot", 9, nullif_empty(F.col("foot"))),
                    zattr("horse", 9, nullif_empty(F.col("horse"))),
                    zattr("mtb_scale", 9, nullif_empty(F.col("mtb_scale"))),
                    zattr("official", 9, official),
                    zattr("access", 9, F.when(F.col("access").isin(*ACCESS_NO), F.lit("no"))),
                    zattr("toll", 9, F.when(F.col("toll"), F.lit(1))),
                    zattr("ramp", 9, F.when(minzoom < 12, ramp_below)),
                    zattr("ramp", 12, F.when(minzoom < 12, ramp_above)),
                    zattr("service", 12, svc),
                    zattr("oneway", 12, F.when(F.col("is_oneway") != 0, F.col("is_oneway"))),
                    zattr("surface", 12,
                          _surface(F.coalesce(F.col("surface"), tag("tracktype")))),
                ),
            ),
            minzoom=minzoom, buffer_px=BUFFER, min_pixel_size=0.0,
            sort_key=F.col("z_order"),
        )
    ).filter(F.col("minzoom") <= 14)
    parts.append(hw_feats)

    # --- railway (Transportation.java:636-663)
    rw = ctx.table("osm_railway_linestring")
    rclazz = (
        F.when(F.col("railway").isin(*RAILWAY_RAIL), F.lit("rail"))
        .when(F.col("railway").isin(*RAILWAY_TRANSIT), F.lit("transit"))
    )
    rsvc = nullif_empty(F.col("service"))
    rminzoom = (
        F.when(rsvc.isNotNull(), 14)
        .when((F.col("railway") == "rail") & (tag("usage") == "main"), 8)
        .when(F.col("railway") == "rail", 10)
        .when(F.col("railway") == "narrow_gauge", 10)
        .when(F.col("railway") == "light_rail", 11)
        .otherwise(14)
    )
    parts.append(
        rw.filter(rclazz.isNotNull()).select(
            *emit(
                "transportation", "line",
                attrs=attr_entries(
                    **{
                        "class": rclazz,
                        "subclass": F.col("railway"),
                        "service": F.when(rsvc.isin(*SERVICE_VALUES), rsvc),
                        "ramp": F.when(F.col("is_ramp"), F.lit(1)),
                    }
                ),
                zattrs=zattrs_array(
                    zattr("brunnel", 10,
                          brunnel(F.col("is_bridge"), F.col("is_tunnel"), F.col("is_ford"))),
                    zattr("layer", 9, F.when(F.col("layer") != 0, F.col("layer"))),
                ),
                minzoom=rminzoom, buffer_px=BUFFER, min_pixel_size=0.0,
                sort_key=F.col("z_order"),
            )
        )
    )

    # --- aerialway (:666-678)
    aw = ctx.table("osm_aerialway_linestring")
    parts.append(
        aw.select(
            *emit(
                "transportation", "line",
                attrs=attr_entries(
                    **{
                        "class": F.lit("aerialway"),
                        "subclass": F.col("aerialway"),
                        "service": F.when(F.col("service").isin(*SERVICE_VALUES), F.col("service")),
                        "oneway": F.when(F.col("is_oneway") != 0, F.col("is_oneway")),
                        "ramp": F.when(F.col("is_ramp"), F.lit(1)),
                        "brunnel": brunnel(F.col("is_bridge"), F.col("is_tunnel"), F.col("is_ford")),
                        "layer": F.when(F.col("layer") != 0, F.col("layer")),
                    }
                ),
                minzoom=12, buffer_px=BUFFER, min_pixel_size=0.0,
                sort_key=F.col("z_order"),
            )
        )
    )

    # --- shipway / ferry (:681-694)
    sw = ctx.table("osm_shipway_linestring")
    parts.append(
        sw.select(
            *emit(
                "transportation", "line",
                attrs=attr_entries(
                    **{
                        "class": F.col("shipway"),
                        "service": F.when(F.col("service").isin(*SERVICE_VALUES), F.col("service")),
                        "ramp": F.when(F.col("is_ramp"), F.lit(1)),
                        "brunnel": brunnel(F.col("is_bridge"), F.col("is_tunnel"), F.col("is_ford")),
                        "layer": F.when(F.col("layer") != 0, F.col("layer")),
                    }
                ),
                minzoom=4, buffer_px=BUFFER, min_pixel_size=0.0,
                sort_key=F.col("z_order"),
                mps_overrides=F.array(
                    F.struct(F.lit(10).cast("int").alias("below_zoom"), F.lit(32.0).alias("size"))
                ),
            )
        )
    )

    # --- highway polygons (:697-713)
    hp = ctx.table("osm_highway_polygon")
    pclazz = highway_class(
        "highway", tag_sql("public_transport"), "CAST(NULL AS STRING)",
        "man_made" if "man_made" in hp.columns else tag_sql("man_made"))
    keep = tag("man_made").isin("bridge", "pier") | (F.coalesce(F.col("layer"), F.lit(0)) >= 0)
    parts.append(
        hp.filter(keep & pclazz.isNotNull()).select(
            *emit(
                "transportation", "polygon",
                attrs=attr_entries(
                    **{
                        "class": pclazz,
                        "subclass": F.when(
                            pclazz == "path",
                            F.coalesce(nullif_empty(tag("public_transport")), F.col("highway")),
                        ),
                        "brunnel": F.when(tag("man_made") == "bridge", F.lit("bridge")),
                        "layer": F.when(F.col("layer") != 0, F.col("layer")),
                    }
                ),
                minzoom=13, buffer_px=BUFFER,
                sort_key=F.col("z_order"),
            )
        )
    )
    return union_features(parts)


def _post_process(zoom: int, pdf: pd.DataFrame) -> pd.DataFrame:
    """Oneway-fenced line merge with per-zoom min length
    (Transportation.java:715-736)."""
    tol = 0.1 if zoom < 14 else 0.0625
    min_len = meters_to_px(MIN_LENGTH_PX[zoom], zoom) if zoom in MIN_LENGTH_PX else 0.0
    pdf = pdf.copy()
    oneway_id = [1]

    def fence(a):
        a = postprocess._as_dict(a)
        ow = a.get("oneway")
        if ow in ("1", "-1"):
            a["__limit_merge"] = str(oneway_id[0])
            oneway_id[0] += 1
        return a

    pdf["attrs"] = [fence(a) for a in pdf["attrs"]]
    lines = pdf[pdf["kind"] == "linestring"]
    polys = pdf[pdf["kind"] == "polygon"]
    merged = postprocess.merge_line_strings(lines, min_len, tol, BUFFER)
    if len(polys):
        keep = polys[["elem_id", "kind", "geom_px"]].copy()
        keep["attrs"] = [
            {k: v for k, v in postprocess._as_dict(a).items() if not k.startswith("_")}
            for a in polys["attrs"]
        ]
        merged = pd.concat([merged, keep], ignore_index=True)
    return merged


postprocess.register_post_processor("transportation", _post_process)
