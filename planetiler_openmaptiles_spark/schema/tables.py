"""The 30 imposm3 "table" mappings as declarative specs → Spark Columns.

Reference: /root/reference/src/main/java/org/openmaptiles/generated/
Tables.java:1367-1421 (MAPPINGS registry) and the per-record MAPPING
expressions (e.g. OsmWaterPolygon Tables.java:110-114, OsmHighwayLinestring
:371-377, OsmBuildingPolygon :530-534). Expression algebra: and/or/not/
matchAny(key, values...)/matchField(key)/matchType(point|linestring|polygon).

Spark-first design: all 30 filters are evaluated in ONE narrow projection as
an array of matched table names (Catalyst constant-folds and subexpression-
eliminates the shared DNF terms), then exploded. Matching an element to
multiple tables (aerodrome → aeroway_polygon + building_polygon +
aerodrome_label_point) falls out naturally.
"""

from __future__ import annotations

from dataclasses import dataclass, field

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

# ------------------------------------------------------------ expression DSL
#
# Every node renders to a Spark-SQL STRING and `col()` wraps it in ONE
# F.expr call: building these trees out of pyspark Column operators cost
# 3-6 py4j socket roundtrips per node (the 30-table DNF index alone was
# ~2.5 s of driver wall per session; measured round 3) — a text render is
# pure Python and the JVM parses the whole expression in one call. The
# resulting Catalyst tree is identical.
#
# The parse itself is NOT free: the big table mappings render to multi-KB
# strings and the ANTLR SQL parser costs real driver time, while layers
# re-request the same table/typed-column expressions over and over (the
# 19-layer fan-out re-parsed the 30-table DNF per layer — measured +15 s
# wall at sf0.1). Unresolved Column expressions are plan-independent, so
# parse each unique string once per process and reuse the Column.
from functools import lru_cache

# One process-wide parse cache: reuse exprs.expr / exprs.sql_quote
# rather than keeping a second parallel lru_cache here (identical parsed
# Columns pinned twice, and a future quoting fix applying to only one of
# two SQL-render paths).
from ..exprs import expr as _expr
from ..exprs import sql_quote as _q


def _tag_sql(key: str) -> str:
    return f"element_at(tags, '{_q(key)}')"


@dataclass(frozen=True)
class MatchAny:
    key: str
    values: tuple

    def sql(self) -> str:
        tag = _tag_sql(self.key)
        exact = [v for v in self.values if not str(v).endswith("%")]
        like = [v for v in self.values if str(v).endswith("%")]
        parts = []
        if exact:
            vals = ", ".join(f"'{_q(v)}'" for v in exact)
            parts.append(f"{tag} IN ({vals})")
        for pat in like:
            parts.append(f"startswith({tag}, '{_q(str(pat)[:-1])}')")
        body = " OR ".join(parts) if parts else "false"
        return f"coalesce({body}, false)"  # null tag → no match

    def col(self) -> Column:
        return _expr(self.sql())


@dataclass(frozen=True)
class MatchField:
    key: str

    def sql(self) -> str:
        tag = _tag_sql(self.key)
        return f"({tag} IS NOT NULL AND {tag} != '')"

    def col(self) -> Column:
        return _expr(self.sql())


@dataclass(frozen=True)
class MatchType:
    gtype: str  # point | linestring | polygon

    def sql(self) -> str:
        return f"(geom_kind = '{_q(self.gtype)}')"

    def col(self) -> Column:
        return _expr(self.sql())


@dataclass(frozen=True)
class And:
    parts: tuple

    def sql(self) -> str:
        if not self.parts:
            return "true"
        return "(" + " AND ".join(p.sql() for p in self.parts) + ")"

    def col(self) -> Column:
        return _expr(self.sql())


@dataclass(frozen=True)
class Or:
    parts: tuple

    def sql(self) -> str:
        if not self.parts:
            return "false"
        return "(" + " OR ".join(p.sql() for p in self.parts) + ")"

    def col(self) -> Column:
        return _expr(self.sql())


@dataclass(frozen=True)
class Not:
    part: object

    def sql(self) -> str:
        # imposm3 semantics: not(matchAny(k, v)) is true when the key is
        # absent OR has a different value
        return f"(NOT coalesce({self.part.sql()}, false))"

    def col(self) -> Column:
        return _expr(self.sql())


def AND(*parts):
    return And(tuple(parts))


def OR(*parts):
    return Or(tuple(parts))


def NOT(part):
    return Not(part)


def ANY(key, *values):
    return MatchAny(key, tuple(values))


def FIELD(key):
    return MatchField(key)


def TYPE(gtype):
    return MatchType(gtype)


# --------------------------------------------------- per-table column types
# "s"=string, "b"=boolean (yes/1/true), "l"=long, "i"=int,
# "d"=direction (-1/0/1 from oneway-style tags), "z"=way z_order

_NAME_COLS = {"name": ("name", "s"), "name_en": ("name:en", "s"), "name_de": ("name:de", "s")}


@dataclass(frozen=True)
class TableSpec:
    name: str
    mapping: object
    # out_col -> (tag_key, type); tag_key "__mapping_key__"/"__mapping_value__"
    # resolve against the key that triggered the match
    columns: dict = field(default_factory=dict)
    # keys participating in the mapping, used to resolve mapping_key
    mapping_keys: tuple = ()


_POI_KEYS = {
    "aerialway": ("station",),
    "amenity": (
        "arts_centre", "atm", "bank", "bar", "bbq", "bicycle_parking", "bicycle_rental", "biergarten",
        "bus_station", "cafe", "charging_station", "cinema", "clinic", "college", "community_centre",
        "courthouse", "dentist", "doctors", "drinking_water", "fast_food", "ferry_terminal", "fire_station",
        "food_court", "fuel", "grave_yard", "hospital", "ice_cream", "kindergarten", "library", "marketplace",
        "motorcycle_parking", "nightclub", "nursing_home", "parking", "pharmacy", "place_of_worship", "police",
        "parcel_locker", "post_box", "post_office", "prison", "pub", "public_building", "recycling",
        "restaurant", "school", "shelter", "swimming_pool", "taxi", "telephone", "theatre", "toilets",
        "townhall", "university", "veterinary", "waste_basket",
    ),
    "barrier": ("bollard", "border_control", "cycle_barrier", "gate", "lift_gate", "sally_port", "stile", "toll_booth"),
    "building": ("dormitory",),
    "highway": ("bus_stop",),
    "historic": ("monument", "castle", "ruins"),
    "landuse": ("basin", "brownfield", "cemetery", "reservoir", "winter_sports"),
    "leisure": (
        "dog_park", "escape_game", "garden", "golf_course", "ice_rink", "hackerspace", "marina",
        "miniature_golf", "park", "pitch", "playground", "sports_centre", "stadium", "swimming_area",
        "swimming_pool", "water_park",
    ),
    "office": (
        "accountant", "advertising_agency", "architect", "association", "bail_bond_agent", "charity", "company",
        "construction_company", "consulting", "cooperative", "courier", "coworking", "diplomatic",
        "educational_institution", "employment_agency", "energy_supplier", "engineer", "estate_agent",
        "financial", "financial_advisor", "forestry", "foundation", "geodesist", "government", "graphic_design",
        "guide", "harbour_master", "health_insurance", "insurance", "interior_design", "it", "lawyer",
        "logistics", "marketing", "moving_company", "newspaper", "ngo", "notary", "physician", "political_party",
        "private_investigator", "property_management", "publisher", "quango", "religion", "research", "security",
        "surveyor", "tax_advisor", "taxi", "telecommunication", "therapist", "translator", "travel_agent",
        "tutoring", "union", "university", "water_utility", "web_design", "wedding_planner",
    ),
    "railway": ("halt", "station", "subway_entrance", "train_station_entrance", "tram_stop"),
    "shop": (
        "accessories", "alcohol", "antiques", "art", "bag", "bakery", "beauty", "bed", "beverages", "bicycle",
        "books", "boutique", "butcher", "camera", "car", "car_repair", "car_parts", "carpet", "charity",
        "chemist", "chocolate", "clothes", "coffee", "computer", "confectionery", "convenience", "copyshop",
        "cosmetics", "deli", "delicatessen", "department_store", "doityourself", "dry_cleaning", "electronics",
        "erotic", "fabric", "florist", "frozen_food", "furniture", "garden_centre", "general", "gift",
        "greengrocer", "hairdresser", "hardware", "hearing_aids", "hifi", "ice_cream", "interior_decoration",
        "jewelry", "kiosk", "lamps", "laundry", "locksmith", "mall", "massage", "mobile_phone", "motorcycle",
        "music", "musical_instrument", "newsagent", "optician", "outdoor", "paint", "perfume", "perfumery",
        "pet", "photo", "second_hand", "shoes", "sports", "stationery", "supermarket", "tailor", "tattoo",
        "ticket", "tobacco", "toys", "travel_agency", "video", "video_games", "watches", "weapons", "wholesale",
        "wine",
    ),
    "sport": (
        "american_football", "archery", "athletics", "australian_football", "badminton", "baseball",
        "basketball", "beachvolleyball", "billiards", "bmx", "boules", "bowls", "boxing", "canadian_football",
        "canoe", "chess", "climbing", "climbing_adventure", "cricket", "cricket_nets", "croquet", "curling",
        "cycling", "disc_golf", "diving", "dog_racing", "equestrian", "fatsal", "field_hockey", "free_flying",
        "gaelic_games", "golf", "gymnastics", "handball", "hockey", "horse_racing", "horseshoes", "ice_hockey",
        "ice_stock", "judo", "karting", "korfball", "long_jump", "model_aerodrome", "motocross", "motor",
        "multi", "netball", "orienteering", "paddle_tennis", "paintball", "paragliding", "pelota", "racquet",
        "rc_car", "rowing", "rugby", "rugby_league", "rugby_union", "running", "sailing", "scuba_diving",
        "shooting", "shooting_range", "skateboard", "skating", "skiing", "soccer", "surfing", "swimming",
        "table_soccer", "table_tennis", "team_handball", "tennis", "toboggan", "volleyball", "water_ski", "yoga",
    ),
    "zoo": (
        "enclosure", "petting_zoo", "aviary", "wildlife_park", "birds", "safari_park", "butterfly", "falconry",
        "reptile", "terrarium",
    ),
    "tourism": (
        "alpine_hut", "aquarium", "artwork", "attraction", "bed_and_breakfast", "camp_site", "caravan_site",
        "chalet", "gallery", "guest_house", "hostel", "hotel", "information", "motel", "museum", "picnic_site",
        "theme_park", "viewpoint", "zoo",
    ),
    "waterway": ("dock",),
}


def _poi_mapping(gtype: str):
    return AND(OR(*[ANY(k, *vs) for k, vs in _POI_KEYS.items()]), TYPE(gtype))


_POI_COLUMNS = {
    **_NAME_COLS,
    "subclass": ("__mapping_value__", "s"),
    "mapping_key": ("__mapping_key__", "s"),
    "station": ("station", "s"),
    "funicular": ("funicular", "s"),
    "information": ("information", "s"),
    "uic_ref": ("uic_ref", "s"),
    "religion": ("religion", "s"),
    "level": ("level", "l"),
    "indoor": ("indoor", "b"),
    "layer": ("layer", "l"),
    "sport": ("sport", "s"),
    "operator": ("operator", "s"),
    "network": ("network", "s"),
    "brand": ("brand", "s"),
    "ref": ("ref", "s"),
}

_LANDCOVER_KEYS = {
    "landuse": (
        "allotments", "farm", "farmland", "orchard", "flowerbed", "plant_nursery", "vineyard", "grass",
        "grassland", "meadow", "forest", "village_green", "recreation_ground",
    ),
    "natural": (
        "wood", "wetland", "fell", "grassland", "heath", "scrub", "shrubbery", "tundra", "glacier", "bare_rock",
        "scree", "beach", "sand", "dune",
    ),
    "leisure": ("park", "garden", "golf_course"),
    "wetland": ("bog", "swamp", "wet_meadow", "marsh", "reedbed", "saltern", "tidalflat", "saltmarsh", "mangrove"),
}

TABLES: dict[str, TableSpec] = {}


def _t(name, mapping, columns=None, mapping_keys=()):
    TABLES[name] = TableSpec(name, mapping, columns or {}, mapping_keys)


_t(
    "osm_water_polygon",
    AND(
        OR(
            ANY("landuse", "reservoir", "basin", "salt_pond"),
            ANY("leisure", "swimming_pool"),
            ANY("natural", "water", "bay", "spring"),
            ANY("waterway", "dock"),
            ANY("water", "river", "stream", "canal", "ditch", "drain", "pond", "basin", "wastewater"),
        ),
        NOT(ANY("covered", "yes")),
        TYPE("polygon"),
    ),
    {
        **_NAME_COLS,
        "place": ("place", "s"),
        "natural": ("natural", "s"),
        "landuse": ("landuse", "s"),
        "waterway": ("waterway", "s"),
        "leisure": ("leisure", "s"),
        "water": ("water", "s"),
        "is_intermittent": ("intermittent", "b"),
        "is_tunnel": ("tunnel", "b"),
        "is_bridge": ("bridge", "b"),
    },
)
_t(
    "osm_waterway_linestring",
    AND(ANY("waterway", "stream", "river", "canal", "drain", "ditch"), TYPE("linestring")),
    {
        **_NAME_COLS,
        "waterway": ("waterway", "s"),
        "is_tunnel": ("tunnel", "b"),
        "is_bridge": ("bridge", "b"),
        "is_intermittent": ("intermittent", "b"),
    },
)
_t(
    "osm_landcover_polygon",
    AND(OR(*[ANY(k, *vs) for k, vs in _LANDCOVER_KEYS.items()]), TYPE("polygon")),
    {"subclass": ("__mapping_value__", "s"), "mapping_key": ("__mapping_key__", "s")},
    mapping_keys=tuple(_LANDCOVER_KEYS),
)
_t(
    "osm_landuse_polygon",
    AND(
        OR(
            ANY("landuse", "railway", "cemetery", "military", "quarry", "residential", "commercial",
                "industrial", "garages", "retail"),
            ANY("amenity", "bus_station", "school", "university", "kindergarten", "college", "library",
                "hospital", "grave_yard"),
            ANY("leisure", "stadium", "pitch", "playground", "track"),
            ANY("tourism", "theme_park", "zoo"),
            ANY("place", "suburb", "quarter", "neighbourhood"),
            ANY("waterway", "dam"),
        ),
        TYPE("polygon"),
    ),
    {
        **_NAME_COLS,
        "landuse": ("landuse", "s"),
        "amenity": ("amenity", "s"),
        "leisure": ("leisure", "s"),
        "tourism": ("tourism", "s"),
        "place": ("place", "s"),
        "waterway": ("waterway", "s"),
    },
)
_t(
    "osm_peak_point",
    AND(ANY("natural", "peak", "volcano", "saddle"), TYPE("point")),
    {
        **_NAME_COLS,
        "natural": ("natural", "s"),
        "ele": ("ele", "s"),
        "wikipedia": ("wikipedia", "s"),
        "wikidata": ("wikidata", "s"),
    },
)
_t(
    "osm_mountain_linestring",
    AND(ANY("natural", "ridge", "cliff", "arete"), TYPE("linestring")),
    {**_NAME_COLS, "natural": ("natural", "s")},
)
_t(
    "osm_park_polygon",
    AND(
        OR(
            ANY("leisure", "nature_reserve"),
            ANY("boundary", "national_park", "protected_area", "aboriginal_lands"),
            ANY("historic", "archaeological_site", "battlefield", "district"),
        ),
        TYPE("polygon"),
    ),
    {
        **_NAME_COLS,
        "leisure": ("leisure", "s"),
        "boundary": ("boundary", "s"),
        "protect_class": ("protect_class", "s"),
        "protection_title": ("protection_title", "s"),
        "wikipedia": ("wikipedia", "s"),
        "wikidata": ("wikidata", "s"),
    },
)
_t(
    "osm_boundary_polygon",
    AND(ANY("boundary", "aboriginal_lands"), ANY("type", "boundary"), TYPE("polygon")),
    {**_NAME_COLS, "boundary": ("boundary", "s")},
)
_t(
    "osm_aeroway_polygon",
    AND(
        OR(
            ANY("aeroway", "aerodrome", "heliport", "runway", "helipad", "taxiway", "apron"),
            ANY("area:aeroway", "aerodrome", "heliport", "runway", "helipad", "taxiway", "apron"),
        ),
        TYPE("polygon"),
    ),
    {"ref": ("ref", "s"), "aeroway": ("aeroway", "s"), "area_aeroway": ("area:aeroway", "s")},
)
_t(
    "osm_aeroway_linestring",
    AND(ANY("aeroway", "runway", "taxiway"), TYPE("linestring")),
    {"ref": ("ref", "s"), "aeroway": ("aeroway", "s")},
)
_t(
    "osm_aeroway_point",
    AND(ANY("aeroway", "gate"), TYPE("point")),
    {"ref": ("ref", "s"), "aeroway": ("aeroway", "s")},
)
_t(
    "osm_highway_linestring",
    AND(
        OR(
            ANY("highway", "motorway", "motorway_link", "trunk", "trunk_link", "primary", "primary_link",
                "secondary", "secondary_link", "tertiary", "tertiary_link", "unclassified", "residential",
                "living_street", "road", "pedestrian", "path", "footway", "cycleway", "steps", "bridleway",
                "corridor", "service", "track", "raceway", "busway", "bus_guideway", "construction"),
            ANY("public_transport", "platform"),
            ANY("man_made", "pier"),
            ANY("service", "driveway", "parking_aisle"),
        ),
        TYPE("linestring"),
    ),
    {
        **_NAME_COLS,
        "highway": ("highway", "s"),
        "construction": ("construction", "s"),
        "ref": ("ref", "s"),
        "network": ("network", "s"),
        "z_order": ("layer", "z"),
        "layer": ("layer", "l"),
        "level": ("level", "l"),
        "indoor": ("indoor", "b"),
        "is_tunnel": ("tunnel", "b"),
        "is_bridge": ("bridge", "b"),
        "is_ford": ("ford", "b"),
        "is_ramp": ("ramp", "b"),
        "is_oneway": ("oneway", "d"),
        "is_area": ("area", "b"),
        "service": ("service", "s"),
        "public_transport": ("public_transport", "s"),
        "man_made": ("man_made", "s"),
        "bicycle": ("bicycle", "s"),
        "foot": ("foot", "s"),
        "horse": ("horse", "s"),
        "mtb_scale": ("mtb:scale", "s"),
        "sac_scale": ("sac_scale", "s"),
        "access": ("access", "s"),
        "toll": ("toll", "b"),
        "expressway": ("expressway", "b"),
        "surface": ("surface", "s"),
    },
)
_t(
    "osm_railway_linestring",
    AND(
        ANY("railway", "rail", "narrow_gauge", "preserved", "funicular", "subway", "light_rail",
            "monorail", "tram"),
        TYPE("linestring"),
    ),
    {
        **_NAME_COLS,
        "railway": ("railway", "s"),
        "ref": ("ref", "s"),
        "network": ("network", "s"),
        "z_order": ("layer", "z"),
        "layer": ("layer", "l"),
        "level": ("level", "l"),
        "indoor": ("indoor", "b"),
        "is_tunnel": ("tunnel", "b"),
        "is_bridge": ("bridge", "b"),
        "is_ford": ("ford", "b"),
        "is_ramp": ("ramp", "b"),
        "is_oneway": ("oneway", "d"),
        "is_area": ("area", "b"),
        "service": ("service", "s"),
        "usage": ("usage", "s"),
    },
)
_t(
    "osm_aerialway_linestring",
    AND(
        ANY("aerialway", "chair_lift", "drag_lift", "platter", "t-bar", "gondola", "cable_car", "j-bar",
            "mixed_lift"),
        TYPE("linestring"),
    ),
    {
        **_NAME_COLS,
        "aerialway": ("aerialway", "s"),
        "ref": ("ref", "s"),
        "network": ("network", "s"),
        "z_order": ("layer", "z"),
        "layer": ("layer", "l"),
        "is_tunnel": ("tunnel", "b"),
        "is_bridge": ("bridge", "b"),
        "is_ford": ("ford", "b"),
        "is_ramp": ("ramp", "b"),
        "is_oneway": ("oneway", "d"),
        "is_area": ("area", "b"),
        "service": ("service", "s"),
        "usage": ("usage", "s"),
    },
)
_t(
    "osm_shipway_linestring",
    AND(ANY("route", "ferry"), TYPE("linestring")),
    {
        **_NAME_COLS,
        "shipway": ("route", "s"),
        "ref": ("ref", "s"),
        "network": ("network", "s"),
        "z_order": ("layer", "z"),
        "layer": ("layer", "l"),
        "level": ("level", "l"),
        "indoor": ("indoor", "b"),
        "is_tunnel": ("tunnel", "b"),
        "is_bridge": ("bridge", "b"),
        "is_ford": ("ford", "b"),
        "is_ramp": ("ramp", "b"),
        "is_oneway": ("oneway", "d"),
        "is_area": ("area", "b"),
        "service": ("service", "s"),
        "usage": ("usage", "s"),
    },
)
_t(
    "osm_highway_polygon",
    AND(
        OR(
            ANY("highway", "path", "cycleway", "bridleway", "footway", "corridor", "pedestrian", "steps"),
            ANY("public_transport", "platform"),
            ANY("man_made", "bridge", "pier"),
        ),
        TYPE("polygon"),
    ),
    {
        "highway": ("highway", "s"),
        "z_order": ("layer", "z"),
        "layer": ("layer", "l"),
        "level": ("level", "l"),
        "indoor": ("indoor", "b"),
        "is_area": ("area", "b"),
        "public_transport": ("public_transport", "s"),
        "man_made": ("man_made", "s"),
    },
)
_t(
    "osm_highway_point",
    AND(ANY("highway", "motorway_junction"), TYPE("point")),
    {**_NAME_COLS, "highway": ("highway", "s"), "ref": ("ref", "s"), "layer": ("layer", "l")},
)
_t(
    "osm_building_polygon",
    AND(
        OR(
            FIELD("building:part"),
            FIELD("building"),
            ANY("aeroway", "terminal", "hangar"),
            ANY("location", "underground"),
        ),
        NOT(ANY("building", "no", "none", "No")),
        NOT(ANY("building:part", "no", "none", "No")),
        NOT(ANY("man_made", "bridge")),
        NOT(ANY("location", "underground")),
        TYPE("polygon"),
    ),
    {
        "material": ("building:material", "s"),
        "colour": ("building:colour", "s"),
        "height": ("height", "s"),
        "min_height": ("min_height", "s"),
        "levels": ("building:levels", "s"),
        "min_level": ("building:min_level", "s"),
        "building": ("building", "s"),
        "building_part": ("building:part", "s"),
        "hide_3d": ("hide_3d", "b"),
    },
)
_t(
    "osm_marine_point",
    AND(OR(ANY("place", "ocean", "sea"), ANY("natural", "bay", "strait")), FIELD("name"), TYPE("point")),
    {
        **_NAME_COLS,
        "name_es": ("name:es", "s"),
        "place": ("place", "s"),
        "natural": ("natural", "s"),
        "rank": ("rank", "l"),
        "is_intermittent": ("intermittent", "b"),
    },
)
_t(
    "osm_continent_point",
    AND(ANY("place", "continent"), FIELD("name"), TYPE("point")),
    {**_NAME_COLS, "wikidata": ("wikidata", "s")},
)
_t(
    "osm_country_point",
    AND(ANY("place", "country"), FIELD("name"), TYPE("point")),
    {
        **_NAME_COLS,
        "place": ("place", "s"),
        "country_code_iso3166_1_alpha_2": ("country_code_iso3166_1_alpha_2", "s"),
        "iso3166_1_alpha_2": ("ISO3166-1:alpha2", "s"),
        "iso3166_1": ("ISO3166-1", "s"),
        "rank": ("rank", "l"),
        "wikidata": ("wikidata", "s"),
    },
)
_t(
    "osm_island_polygon",
    AND(ANY("place", "island"), FIELD("name"), TYPE("polygon")),
    {**_NAME_COLS, "place": ("place", "s"), "rank": ("rank", "l")},
)
_t(
    "osm_island_point",
    AND(ANY("place", "island"), FIELD("name"), TYPE("point")),
    {**_NAME_COLS, "place": ("place", "s"), "rank": ("rank", "l")},
)
_t(
    "osm_state_point",
    AND(ANY("place", "state", "province"), FIELD("name"), TYPE("point")),
    {
        **_NAME_COLS,
        "place": ("place", "s"),
        "is_in_country": ("is_in:country", "s"),
        "is_in_country_code": ("is_in:country_code", "s"),
        "ref": ("ref", "s"),
        "rank": ("rank", "l"),
        "wikidata": ("wikidata", "s"),
    },
)
_t(
    "osm_city_point",
    AND(
        ANY("place", "city", "town", "village", "hamlet", "borough", "suburb", "quarter", "neighbourhood",
            "isolated_dwelling"),
        FIELD("name"),
        TYPE("point"),
    ),
    {
        **_NAME_COLS,
        "place": ("place", "s"),
        "capital": ("capital", "s"),
        "population": ("population", "s"),
        "rank": ("rank", "l"),
        "wikidata": ("wikidata", "s"),
    },
)
_t(
    "osm_housenumber_point",
    OR(
        AND(FIELD("addr:housenumber"), TYPE("point")),
        AND(FIELD("addr:housenumber"), TYPE("polygon")),
    ),
    {
        "housenumber": ("addr:housenumber", "s"),
        "street": ("addr:street", "s"),
        "block_number": ("addr:block_number", "s"),
        "name": ("name", "s"),
    },
)
_t("osm_poi_point", _poi_mapping("point"), dict(_POI_COLUMNS), mapping_keys=tuple(_POI_KEYS))
_t("osm_poi_polygon", _poi_mapping("polygon"), dict(_POI_COLUMNS), mapping_keys=tuple(_POI_KEYS))
_t(
    "osm_aerodrome_label_point",
    OR(
        AND(ANY("aeroway", "aerodrome"), TYPE("point")),
        AND(ANY("aeroway", "aerodrome"), TYPE("polygon")),
    ),
    {
        **_NAME_COLS,
        "aeroway": ("aeroway", "s"),
        "aerodrome_type": ("aerodrome:type", "s"),
        "aerodrome": ("aerodrome", "s"),
        "military": ("military", "s"),
        "iata": ("iata", "s"),
        "icao": ("icao", "s"),
        "ele": ("ele", "s"),
    },
)


# --------------------------------------------------------------- projections


def _typed_col_sql(tag_key: str, typ: str, mapping_keys: tuple) -> str:
    """SQL text of one typed tag extraction (see DSL block comment: text
    render = one py4j call for the whole projection instead of 3-6 per
    node; the Catalyst tree is identical to the old Column-operator form)."""
    if tag_key == "__mapping_key__":
        whens = " ".join(
            f"WHEN {_tag_sql(k)} IS NOT NULL THEN '{_q(k)}'" for k in mapping_keys
        )
        return f"CASE {whens} ELSE CAST(NULL AS STRING) END"
    if tag_key == "__mapping_value__":
        whens = " ".join(
            f"WHEN {_tag_sql(k)} IS NOT NULL THEN {_tag_sql(k)}" for k in mapping_keys
        )
        return f"CASE {whens} ELSE CAST(NULL AS STRING) END"
    tag = _tag_sql(tag_key)
    if typ == "s":
        return tag
    if typ == "b":
        return f"coalesce(lower({tag}) IN ('yes', 'true', '1'), false)"
    if typ == "l":
        return f"CAST({tag} AS LONG)"
    if typ == "i":
        return f"CAST({tag} AS INT)"
    if typ == "d":
        # direction: oneway=-1 → -1; yes/true/1 → 1; else 0 (Tables.java getDirection)
        return (
            f"CASE WHEN {tag} = '-1' THEN -1"
            f" WHEN lower({tag}) IN ('yes', 'true', '1') THEN 1 ELSE 0 END"
        )
    if typ == "z":
        # way z_order (Tables.java:357-368): layer*10 clamped to ±100
        return (
            f"CAST(greatest(-100, least(100, coalesce(CAST({tag} AS LONG), 0) * 10)) AS INT)"
        )
    raise ValueError(typ)


def _typed_col(tag_key: str, typ: str, mapping_keys: tuple) -> Column:
    return _expr(_typed_col_sql(tag_key, typ, mapping_keys))


def match_tables_column() -> Column:
    """Array of matched table names — ONE projection evaluating all 30 DNF
    filters (Tables.java MAPPINGS equivalent; Catalyst CSE shares terms),
    rendered as a single SQL string (one py4j call for all 30)."""
    cases = ", ".join(
        f"CASE WHEN {spec.mapping.sql()} THEN '{_q(name)}' END"
        for name, spec in TABLES.items()
    )
    return _expr(f"array_compact(array({cases}))")


_BASE_ROW_COLS = (
    "doc_id", "source", "source_layer", "elem_id",
    "tags", "geom_wkt", "geom_kind", "rels",
)


@lru_cache(maxsize=1024)
def _aliased_typed_col(tag_key: str, typ: str, mapping_keys: tuple, out_col: str) -> Column:
    return _expr(f"{_typed_col_sql(tag_key, typ, mapping_keys)} AS `{out_col}`")


def table_rows(features: DataFrame, table: str) -> DataFrame:
    """Typed rows of one imposm3 table: filter + per-column tag extraction.
    Every column expression (and its alias) comes from the process-wide
    parse cache — one py4j call per distinct column, ever."""
    spec = TABLES[table]
    cols = [_expr(c) for c in _BASE_ROW_COLS]
    if "names" in features.columns:  # materialized i18n map (pipeline)
        cols.append(_expr("names"))
    for out_col, (tag_key, typ) in spec.columns.items():
        cols.append(_aliased_typed_col(tag_key, typ, spec.mapping_keys, out_col))
    return features.filter(spec.mapping.col()).select(*cols)


def all_table_matches(features: DataFrame) -> DataFrame:
    """features + exploded `table` column (elements matching multiple tables
    appear once per match — SURVEY.md §1.4)."""
    return features.withColumn("table", F.explode(match_tables_column()))
