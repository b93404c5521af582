"""`poi` layer — points of interest.

Reference: layers/Poi.java (class ranks :92-115, agg_stop grouping J11
:117-124,166-258, feature setup :265-324, grid-rank postProcess :328-338);
class mapping OpenMapTilesSchema Poi.FieldMappings.Class.

J11 (agg_stop) is pure window functions: the winner per uic_ref group =
first by (subclass priority, distance to the group centroid, id) — no UDF,
one shuffle on the agg-stop key.
"""

from __future__ import annotations

import pandas as pd
from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F

from ..features import attr_entries, emit, grid_entry, mps_below, union_features
from ..schema.layers import LAYER_BUFFERS
from ..tiling import postprocess
from .util import _only_latin, names_map, nullif_empty, tag

BUFFER = LAYER_BUFFERS["poi"]

CLASS_RANKS = {
    "hospital": 20, "railway": 40, "bus": 50, "attraction": 70, "harbor": 75,
    "college": 80, "school": 85, "stadium": 90, "zoo": 95, "town_hall": 100,
    "campsite": 110, "cemetery": 115, "park": 120, "library": 130, "police": 135,
    "post": 140, "golf": 150, "shop": 400, "grocery": 500, "fast_food": 600,
    "clothing_store": 700, "bar": 800,
}
DEFAULT_CLASS_RANK = 1000

AGG_STOP_ORDER = ["subway", "tram_stop", "bus_station", "bus_stop"]
UNIVERSITY_SUBCLASSES = ("university", "college")
BRAND_OPERATOR_REF_SUBCLASSES = ("charging_station", "parcel_locker")

# class mapping rules: first match wins (subclass in values [+ mapping_key])
CLASS_RULES: list[tuple[str, tuple, str | None]] = [
    ("shop", ("accessories", "antiques", "beauty", "bed", "boutique", "camera", "carpet",
              "charity", "chemist", "chocolate", "coffee", "computer", "convenience",
              "confectionery", "copyshop", "cosmetics", "garden_centre", "doityourself",
              "erotic", "electronics", "fabric", "florist", "frozen_food", "furniture",
              "video_games", "video", "general", "gift", "hardware", "hearing_aids", "hifi",
              "interior_decoration", "jewelry", "kiosk", "locksmith", "lamps", "mall",
              "massage", "motorcycle", "mobile_phone", "newsagent", "optician", "outdoor",
              "paint", "perfumery", "perfume", "pet", "photo", "second_hand", "shoes",
              "sports", "stationery", "tailor", "tattoo", "ticket", "tobacco", "toys",
              "travel_agency", "watches", "weapons", "wholesale"), None),
    ("office", ("accountant", "advertising_agency", "architect", "association",
                "bail_bond_agent", "charity", "company", "construction_company", "consulting",
                "cooperative", "courier", "coworking", "diplomatic", "educational_institution",
                "employment_agency", "energy_supplier", "engineer", "estate_agent", "financial",
                "financial_advisor", "forestry", "foundation", "geodesist", "government",
                "graphic_design", "guide", "harbour_master", "health_insurance", "insurance",
                "interior_design", "it", "lawyer", "logistics", "marketing", "moving_company",
                "newspaper", "ngo", "notary", "physician", "political_party",
                "private_investigator", "property_management", "publisher", "quango",
                "religion", "research", "security", "surveyor", "tax_advisor", "taxi",
                "telecommunication", "therapist", "translator", "travel_agent", "tutoring",
                "union", "university", "water_utility", "web_design", "wedding_planner"), None),
    ("town_hall", ("townhall", "public_building", "courthouse", "community_centre"), None),
    ("golf", ("golf", "golf_course", "miniature_golf"), None),
    ("fast_food", ("fast_food", "food_court"), None),
    ("park", ("park", "bbq"), None),
    ("bus", ("bus_stop", "bus_station"), None),
    ("railway", ("station",), "railway"),
    ("railway", ("halt", "tram_stop", "subway"), None),
    ("aerialway", ("station",), "aerialway"),
    ("entrance", ("subway_entrance", "train_station_entrance"), None),
    ("campsite", ("camp_site", "caravan_site"), None),
    ("laundry", ("laundry", "dry_cleaning"), None),
    ("grocery", ("supermarket", "deli", "delicatessen", "department_store", "greengrocer",
                 "marketplace"), None),
    ("library", ("books", "library"), None),
    ("college", ("university", "college"), None),
    ("lodging", ("hotel", "motel", "bed_and_breakfast", "guest_house", "hostel", "chalet",
                 "alpine_hut", "dormitory"), None),
    ("ice_cream", ("ice_cream",), None),
    ("post", ("post_box", "post_office", "parcel_locker"), None),
    ("cafe", ("cafe",), None),
    ("school", ("school", "kindergarten"), None),
    ("alcohol_shop", ("alcohol", "beverages", "wine"), None),
    ("bar", ("bar", "nightclub"), None),
    ("harbor", ("marina", "dock"), None),
    ("car", ("car", "car_repair", "car_parts", "taxi"), None),
    ("hospital", ("hospital", "nursing_home", "clinic"), None),
    ("cemetery", ("grave_yard", "cemetery"), None),
    ("attraction", ("attraction", "viewpoint"), None),
    ("beer", ("biergarten", "pub"), None),
    ("music", ("music", "musical_instrument"), None),
    ("stadium", ("american_football", "stadium", "soccer"), None),
    ("art_gallery", ("art", "artwork", "gallery", "arts_centre"), None),
    ("clothing_store", ("bag", "clothes"), None),
    ("swimming", ("swimming_area", "swimming"), None),
    ("castle", ("castle", "ruins"), None),
    ("atm", ("atm",), None),
    ("fuel", ("fuel", "charging_station"), None),
    ("zoo", ("zoo", "enclosure'", "petting_zoo", "aviary", "wildlife_park", "birds",
             "safari_park", "butterfly", "falconry", "reptile", "terrarium"), None),
]


# class lookup as literal maps (one map per arity) — a 40-branch CASE chain
# over hundreds of values costs seconds of codegen per query; element_at on
# a literal map is a single hash probe and compiles instantly.
_KEYED_CLASS = {}   # "subclass|mapping_key" → class (order: first rule wins)
_PLAIN_CLASS = {}   # subclass → class
for _clazz, _subs, _mk in CLASS_RULES:
    for _s in _subs:
        if _mk is not None:
            _KEYED_CLASS.setdefault(f"{_s}|{_mk}", _clazz)
        else:
            _PLAIN_CLASS.setdefault(_s, _clazz)


def _literal_map(d: dict) -> F.Column:
    """One-py4j-call literal map (create_map with 2N args costs 2N gateway
    round trips — ~10 s of driver time for the POI tables)."""
    body = ",".join(f"{k}\t{v}" for k, v in d.items())
    return F.str_to_map(F.lit(body), F.lit(","), F.lit("\t"))


def _poi_class(raw_subclass: F.Column, mapping_key: F.Column) -> F.Column:
    keyed = _literal_map(_KEYED_CLASS)
    plain = _literal_map(_PLAIN_CLASS)
    return F.coalesce(
        # amenity=university special case → college (Poi.java:142-146)
        F.when((mapping_key == "amenity") & (raw_subclass == "university"), F.lit("college")),
        F.element_at(keyed, F.concat(raw_subclass, F.lit("|"), F.coalesce(mapping_key, F.lit("")))),
        F.element_at(plain, raw_subclass),
        raw_subclass,
    )


def _rank_expr(clazz: F.Column) -> F.Column:
    m = _literal_map(CLASS_RANKS)
    return F.coalesce(
        F.element_at(m, clazz).cast("int"), F.lit(DEFAULT_CLASS_RANK)
    )


def _setup(df: DataFrame, form: str, agg_stop: F.Column | None = None) -> DataFrame:
    raw = F.col("subclass")
    raw = F.when((raw == "station") & (F.col("station") == "subway"), F.lit("subway")).otherwise(raw)
    raw = F.when((raw == "station") & (F.col("funicular") == "yes"), F.lit("halt")).otherwise(raw)

    # name fallbacks mutate the tag map fed to the i18n extractor
    atm_name = F.coalesce(nullif_empty(F.col("operator")), nullif_empty(F.col("network")))
    pl_base = F.coalesce(nullif_empty(F.col("brand")), nullif_empty(F.col("operator")))
    pl_ref = nullif_empty(F.col("ref"))
    pl_name = F.when(
        pl_ref.isNotNull(),
        F.when(pl_base.isNotNull(), F.concat(pl_base, F.lit(" "), pl_ref)).otherwise(pl_ref),
    ).otherwise(pl_base)
    unnamed = nullif_empty(F.col("name")).isNull()
    fallback = (
        F.when((raw == "atm") & unnamed, atm_name)
        .when(raw.isin(*BRAND_OPERATOR_REF_SUBCLASSES) & unnamed, pl_name)
        .otherwise(F.lit(None))
    )
    subclass = (
        F.when(raw == "information", nullif_empty(F.col("information")))
        .when(raw == "place_of_worship", nullif_empty(F.col("religion")))
        .when(raw == "pitch", nullif_empty(F.col("sport")))
        .otherwise(raw)
    )
    clazz = _poi_class(raw, F.col("mapping_key"))
    effective_name = F.coalesce(nullif_empty(F.col("name")), fallback)
    rank_order = _rank_expr(clazz) + F.when(effective_name.isNull(), F.lit(2000)).otherwise(F.lit(0))

    low_zoom = (
        ((F.col("subclass") == "station") & (F.col("mapping_key") == "railway"))
        | (F.col("subclass") == "halt")
        | (F.col("subclass") == "ferry_terminal")
    )
    is_university = raw.isin(*UNIVERSITY_SUBCLASSES)
    minzoom = F.when(is_university, F.lit(10)).when(low_zoom, F.lit(12)).otherwise(F.lit(14))

    # names: the materialized map, except ATM/parcel-locker fallback rows.
    # Those rows have no name tags at all, so getNames(tags + {name: fb})
    # reduces to this small closed form — inlining the full names_map tree
    # here blew the 64 KB codegen limit and made the whole projection
    # interpreted (the layer's dominant cost).
    fb_latin = _only_latin(fallback)
    fallback_names = F.map_from_entries(
        F.filter(
            F.array(
                F.struct(F.lit("name").alias("key"), fallback.alias("value")),
                F.struct(F.lit("name_en").alias("key"), fallback.alias("value")),
                F.struct(F.lit("name_de").alias("key"), fallback.alias("value")),
                F.struct(F.lit("name:latin").alias("key"),
                         F.when(fb_latin, fallback).alias("value")),
                F.struct(F.lit("name_int").alias("key"), fallback.alias("value")),
            ),
            lambda e: e["value"].isNotNull(),
        )
    )
    names = F.when(fallback.isNotNull(), fallback_names).otherwise(F.col("names"))
    attrs = F.map_concat(
        attr_entries(
            **{
                "class": clazz,
                "subclass": subclass,
                "layer": F.when(F.col("layer") != 0, F.col("layer")),
                "level": tag("level").cast("long"),
                "indoor": F.when(F.col("indoor"), F.lit(1)),
                "agg_stop": agg_stop if agg_stop is not None else F.lit(None).cast("int"),
            }
        ),
        names,
    )
    return df.select(
        *emit(
            "poi",
            form,
            attrs=attrs,
            minzoom=minzoom,
            buffer_px=BUFFER,
            sort_key=rank_order,
            grid=F.array(grid_entry(0, 14, 64.0, 0)),
            mps_overrides=F.when(is_university, F.array(mps_below(13, 80.0))),
        )
    )


def transform(ctx) -> DataFrame:
    pts = ctx.table("osm_poi_point")
    is_agg = F.col("uic_ref").isNotNull() & F.col("subclass").isin(*AGG_STOP_ORDER)

    plain = pts.filter(~is_agg)
    plain_feats = _setup(plain, "point")

    # J11 agg_stop: window over the composite stop key
    stops = pts.filter(is_agg)
    key = F.concat(
        F.col("uic_ref"),
        F.coalesce(nullif_empty(F.col("name")), F.lit("")),
        F.coalesce(nullif_empty(F.col("network")), F.lit("")),
        F.coalesce(nullif_empty(F.col("operator")), F.lit("")),
    )
    sub_order = F.array_position(
        F.array(*[F.lit(s) for s in AGG_STOP_ORDER]), F.col("subclass")
    )
    px = F.regexp_extract(F.col("geom_wkt"), r"\(\s*(-?[\d.eE+]+)\s+(-?[\d.eE+]+)", 1).cast("double")
    py = F.regexp_extract(F.col("geom_wkt"), r"\(\s*(-?[\d.eE+]+)\s+(-?[\d.eE+]+)", 2).cast("double")
    # world coords for centroid distance (planetiler uses worldGeometry)
    from ..tiling.cells import world_x, world_y

    stops = (
        stops.withColumn("_key", key)
        .withColumn("_so", sub_order)
        .withColumn("_wx", world_x(px))
        .withColumn("_wy", world_y(py))
    )
    wk = Window.partitionBy("_key")
    stops = stops.withColumn("_cx", F.avg("_wx").over(wk)).withColumn(
        "_cy", F.avg("_wy").over(wk)
    )
    dist = F.sqrt(
        (F.col("_wx") - F.col("_cx")) ** 2 + (F.col("_wy") - F.col("_cy")) ** 2
    )
    rn = F.row_number().over(
        Window.partitionBy("_key").orderBy(
            F.col("_so").asc(), dist.asc(), F.col("elem_id").asc()
        )
    )
    stops = stops.withColumn("_aggstop", F.when(rn == 1, F.lit(1)))
    stop_feats = _setup(stops, "point", agg_stop=F.col("_aggstop"))

    polys = ctx.table("osm_poi_polygon")
    poly_feats = _setup(polys, "centroid_if_convex")

    return union_features([plain_feats, stop_feats, poly_feats])


def _post_process(zoom: int, pdf: pd.DataFrame) -> pd.DataFrame:
    """Stamp rank from the JVM label-grid order (Poi.java:328-338); grid_rank
    comes from ``grid_windows`` — stateless per-row map, salt safe."""
    ranks = pdf["grid_rank"]
    new_attrs = []
    for i in range(len(pdf)):
        a = postprocess._as_dict(pdf["attrs"].iloc[i])
        if "rank" not in a:
            a["rank"] = str(int(ranks.iloc[i]))
        new_attrs.append(a)
    out = pdf[["elem_id", "kind", "geom_px"]].copy()
    out["attrs"] = new_attrs
    return out


postprocess.register_post_processor("poi", _post_process)
