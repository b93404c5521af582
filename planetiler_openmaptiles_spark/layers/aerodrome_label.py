"""`aerodrome_label` layer — reference layers/AerodromeLabel.java:58-84;
class mapping OpenMapTilesSchema AerodromeLabel.FieldMappings.Class."""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from ..features import attr_entries, emit, union_features
from ..schema.layers import LAYER_BUFFERS
from .util import names_col, names_map, names_zattrs_col, nullif_empty, parse_meters, tag

BUFFER = LAYER_BUFFERS["aerodrome_label"]


def _clazz() -> F.Column:
    aero = tag("aerodrome")
    atype = tag("aerodrome:type")
    mil = tag("military")
    return (
        F.when((aero == "international") | (atype == "international"), F.lit("international"))
        .when((aero == "public") | atype.contains("public") | (atype == "civil"), F.lit("public"))
        .when((aero == "regional") | (atype == "regional"), F.lit("regional"))
        .when((aero == "military") | atype.contains("military") | (mil == "airfield"), F.lit("military"))
        .when((aero == "private") | (atype == "private"), F.lit("private"))
        .otherwise(F.lit("other"))
    )


def transform(ctx) -> DataFrame:
    a = ctx.table("osm_aerodrome_label_point")
    clazz = _clazz()
    important = nullif_empty(F.col("iata")).isNotNull() & (clazz == "international")
    m = parse_meters(F.col("ele"))
    return union_features([
        a.select(
            *emit(
                "aerodrome_label",
                "centroid",
                attrs=F.map_concat(
                    attr_entries(
                        **{
                            "class": clazz,
                            "iata": nullif_empty(F.col("iata")),
                            "icao": nullif_empty(F.col("icao")),
                            "ele": F.round(m).cast("int"),
                            "ele_ft": F.round(m / F.lit(0.3048)).cast("int"),
                        }
                    ),
                    names_col(),
                ),
                minzoom=F.when(important, F.lit(8)).otherwise(F.lit(10)),
                buffer_px=BUFFER,
            )
        )
    ])
