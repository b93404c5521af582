"""Shared layer helpers (reference util/Utils.java + OmtLanguageUtils).

All pure Column expressions — they compile into the layer projections and
stay inside whole-stage codegen.
"""

from __future__ import annotations

from pyspark.sql import Column
from pyspark.sql import functions as F


def nullif_empty(c: Column) -> Column:
    """util/Utils.java:31-38 — empty string → null (omit attribute)."""
    return F.when((c.isNull()) | (c == ""), F.lit(None)).otherwise(c)


def brunnel(is_bridge: Column, is_tunnel: Column, is_ford: Column | None = None) -> Column:
    """util/Utils.java:68-76."""
    c = F.when(is_bridge, F.lit("bridge")).when(is_tunnel, F.lit("tunnel"))
    if is_ford is not None:
        c = c.when(is_ford, F.lit("ford"))
    return c.otherwise(F.lit(None))


def bool_int(c: Column) -> Column:
    """boolean → 1/0 attr value."""
    return F.when(c, F.lit(1)).otherwise(F.lit(0))


def tag(key: str) -> Column:
    return F.element_at(F.col("tags"), key)


METERS_PER_FOOT = 0.3048


def parse_meters(c: Column) -> Column:
    """Parse.meters subset ("12", "12 m", "40 ft", "12.5m") → double meters
    (reference layers/Building.java:143-150 via planetiler Parse.meters)."""
    s = F.trim(F.lower(c.cast("string")))
    num = F.regexp_extract(s, r"^(-?\d+(?:\.\d+)?)", 1).cast("double")
    is_ft = s.rlike(r"(ft|feet|')\s*$")
    return F.when(num.isNull(), F.lit(None)).otherwise(
        F.when(is_ft, num * F.lit(METERS_PER_FOOT)).otherwise(num)
    )


def elevation_attrs(ele_col: Column) -> dict[str, Column]:
    """util/Utils.java:51-66 — ele (m, rounded) + ele_ft."""
    m = parse_meters(ele_col)
    return {
        "ele": F.round(m).cast("int"),
        "ele_ft": F.round(m / F.lit(METERS_PER_FOOT)).cast("int"),
    }


def class_case(rules: list[tuple[str, tuple[str, tuple]]], default: str | None = None) -> Column:
    """MultiExpression first-match over `tags` → class value (F3):
    rules = [(class_value, (tag_key, (accepted values...))), ...]."""
    c = None
    for value, (key, accepted) in rules:
        cond = F.element_at(F.col("tags"), key).isin(*accepted)
        c = F.when(cond, F.lit(value)) if c is None else c.when(cond, F.lit(value))
    return c.otherwise(F.lit(default)) if c is not None else F.lit(default)
