"""Shared layer helpers (reference util/Utils.java + OmtLanguageUtils).

All pure Column expressions — they compile into the layer projections and
stay inside whole-stage codegen.
"""

from __future__ import annotations

from functools import lru_cache

from pyspark.sql import Column
from pyspark.sql import functions as F

from .. import exprs as X


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


@lru_cache(maxsize=4096)
def tag(key: str) -> Column:
    return F.element_at(F.col("tags"), key)


def tag_sql(key: str) -> str:
    """SQL text of a tag lookup (for text-rendered expressions)."""
    return f"element_at(tags, '{X.sql_quote(key)}')"


METERS_PER_FOOT = 0.3048


def parse_meters(c: Column) -> Column:
    """Parse.meters ("12", "12 m", "40 ft", "100' 11\\"") → double meters
    (reference layers/Building.java:143-150 via planetiler Parse.meters)."""
    s = F.trim(F.lower(c.cast("string")))
    ft_re = r"^(-?\d+(?:\.\d+)?)\s*(?:'|ft|feet)(?:\s*(\d+(?:\.\d+)?)\s*(?:\x22|in(?:ch(?:es)?)?))?\s*$"
    feet = F.regexp_extract(s, ft_re, 1)
    inches = F.regexp_extract(s, ft_re, 2)
    ft_val = (
        feet.cast("double") + F.coalesce(inches.cast("double"), F.lit(0.0)) / F.lit(12.0)
    ) * F.lit(METERS_PER_FOOT)
    num = F.regexp_extract(s, r"^(-?\d+(?:\.\d+)?)\s*m?\s*$", 1).cast("double")
    return F.when(feet != "", ft_val).otherwise(num)


def elevation_attrs(ele_col: Column) -> dict[str, Column]:
    """util/Utils.java:51-66 — ele (m, rounded) + ele_ft."""
    m = parse_meters(ele_col)
    return {
        "ele": F.round(m).cast("int"),
        "ele_ft": F.round(m / F.lit(METERS_PER_FOOT)).cast("int"),
    }


# ----------------------------------------------------------- name / i18n
# Port of util/OmtLanguageUtils.java:76-115 (F5) as pure Column expressions.
# Latin detection ≈ planetiler LanguageUtils.containsOnlyLatinCharacters:
# code points < U+024F or in the Latin script (Java regex \p{IsLatin}).

_LATIN_ONLY = "^[\\u0020-\\u024F\\u1E00-\\u1EFF\\u2C60-\\u2C7F\\uA720-\\uA7FF]*$"
_NAME_LANG_KEY = r"^name:[a-z]{2,3}(?:[-_][a-zA-Z]{2,4})?$"

# The reference's default translation-language set
# (generated/OpenMapTilesSchema.java:62-66, fed to
# Planetiler.setDefaultLanguages in OpenMapTilesMain.java:33 and
# overridable with planetiler's --languages arg).
OMT_LANGUAGES = (
    "af", "am", "ar", "az", "be", "bg", "bn", "br", "bs", "ca", "co",
    "cs", "cy", "da", "de", "el", "en", "eo", "es", "et", "eu", "fa",
    "fi", "fr", "fy", "ga", "gd", "he", "hi", "hr", "hu", "hy", "id",
    "is", "it", "ja", "ja_kana", "ja_rm", "ja-Latn", "ja-Hira", "ka",
    "kk", "kn", "ko", "ko-Latn", "ku", "la", "lb", "lt", "lv", "mk",
    "mt", "ml", "nl", "no", "oc", "pa", "pnb", "pl", "pt", "rm", "ro",
    "ru", "sk", "sl", "sq", "sr", "sr-Latn", "sv", "ta", "te", "th",
    "tok", "tr", "uk", "ur", "vi", "zh", "zh-Hant", "zh-Hans",
)


def _lang_key_pred(e, languages: tuple | None):
    """Predicate for a map entry being a translation key: when a
    language list applies, an exact-key InSet (which subsumes the
    name:xx shape — one hash probe per entry, regex skipped); with
    languages=None, the name:xx shape regex."""
    if languages is not None:
        if not languages:
            return F.lit(False)
        return e["key"].isin(*[f"name:{code}" for code in languages])
    return e["key"].rlike(_NAME_LANG_KEY)


def _only_latin(c: Column) -> Column:
    return c.isNotNull() & (c != "") & c.rlike(_LATIN_ONLY)


def names_map(
    tags: Column | None = None,
    translations: bool = True,
    transliterate: bool = True,
    languages: tuple | None = OMT_LANGUAGES,
) -> Column:
    """map<string,string> of name, name_en, name_de, name:latin,
    name:nonlatin, name_int (+ passthrough name:xx translations for the
    configured ``languages`` — default the reference's
    OpenMapTilesSchema.LANGUAGES list; pass None to accept any
    name:xx-shaped key).

    When no latin-script alias exists and `transliterate` is on (the
    reference's default — OmtLanguageUtils.java:90-93 →
    Translations.transliterate), name:latin falls back to a best-effort
    transliteration of name (layers/translit.py)."""
    tags = F.col("tags") if tags is None else tags
    name = nullif_empty(F.element_at(tags, "name"))
    int_name = nullif_empty(F.element_at(tags, "int_name"))
    name_en = nullif_empty(F.element_at(tags, "name:en"))
    name_de = nullif_empty(F.element_at(tags, "name:de"))

    other_translations = F.transform(
        F.filter(
            F.map_entries(tags),
            lambda e: _lang_key_pred(e, languages)
            & ~e["key"].isin("name:en", "name:de"),
        ),
        lambda e: e["value"],
    )
    latin_candidates = F.concat(
        F.array(name_en, int_name, name_de), other_translations
    )
    first_latin = F.element_at(
        F.filter(latin_candidates, lambda v: v.isNotNull() & (v != "") & v.rlike(_LATIN_ONLY)),
        1,
    )
    latin = F.when(_only_latin(name), name).otherwise(first_latin)
    if transliterate:
        from .translit import transliterate as _translit

        # the UDF argument is nulled unless the name actually needs
        # transliteration — Spark evaluates extracted python UDFs for every
        # row, so passing null keeps the Arrow pass near-free on
        # latin-majority corpora
        latin = F.coalesce(
            latin, _translit(F.when(~_only_latin(name), name))
        )
    non_latin_raw = F.regexp_replace(
        name, "[\\u0020-\\u024F\\u1E00-\\u1EFF\\u2C60-\\u2C7F\\uA720-\\uA7FF]", ""
    )
    non_latin = F.when(_only_latin(name), F.lit(None)).otherwise(nullif_empty(non_latin_raw))
    non_latin = F.when(non_latin.eqNullSafe(latin), F.lit(None)).otherwise(non_latin)

    entries = [
        F.struct(F.lit("name").alias("key"), name.alias("value")),
        F.struct(F.lit("name_en").alias("key"), F.coalesce(name_en, name).alias("value")),
        F.struct(F.lit("name_de").alias("key"), F.coalesce(name_de, name, name_en).alias("value")),
        F.struct(F.lit("name:latin").alias("key"), latin.alias("value")),
        F.struct(F.lit("name:nonlatin").alias("key"), non_latin.alias("value")),
        F.struct(
            F.lit("name_int").alias("key"),
            F.coalesce(int_name, name_en, latin, name).alias("value"),
        ),
    ]
    base = F.filter(F.array(*entries), lambda e: e["value"].isNotNull())
    if translations:
        trans = F.filter(
            F.map_entries(tags),
            lambda e: _lang_key_pred(e, languages)
            & e["value"].isNotNull()
            & (e["value"] != ""),
        )
        base = F.concat(base, trans)
    return F.map_from_entries(base)


def names_zattrs(minzoom: int, tags: Column | None = None, translations: bool = True) -> Column:
    """names_map as zoom-gated attr entries (putAttrsWithMinzoom)."""
    mz = F.lit(minzoom).cast("int")
    return F.transform(
        F.map_entries(names_map(tags, translations)),
        lambda e: F.struct(e["key"].alias("key"), mz.alias("minzoom"), e["value"].alias("value")),
    )


def class_case(rules: list[tuple[str, tuple[str, tuple]]], default: str | None = None) -> Column:
    """MultiExpression first-match over `tags` → class value (F3):
    rules = [(class_value, (tag_key, (accepted values...))), ...].

    Rendered as one SQL CASE text and parsed JVM-side in a single py4j
    call (then cached process-wide) — the Catalyst tree is identical to
    the old per-rule F.when chain: `x IN (…)` on a missing tag is NULL,
    which CASE treats as no-match, exactly like Column.isin."""
    frozen = tuple((v, (k, tuple(a))) for v, (k, a) in rules)
    return _class_case(frozen, default)


@lru_cache(maxsize=1024)
def _class_case(rules: tuple, default: str | None) -> Column:
    q = X.sql_quote
    parts = []
    for value, (key, accepted) in rules:
        vals = ", ".join("'" + q(v) + "'" for v in accepted)
        parts.append(f"WHEN {tag_sql(key)} IN ({vals}) THEN '{q(value)}'")
    whens = " ".join(parts)
    else_sql = f"'{q(default)}'" if default is not None else "CAST(NULL AS STRING)"
    if not whens:
        return X.expr(else_sql)
    return X.expr(f"CASE {whens} ELSE {else_sql} END")


def names_col() -> Column:
    """The per-element i18n name map, materialized once at decode time
    (pipeline.make_context). Layers must use this instead of re-inlining
    names_map() — see the 64 KB-codegen note there."""
    return F.col("names")


def names_zattrs_col(minzoom: int) -> Column:
    mz = F.lit(minzoom).cast("int")
    return F.transform(
        F.map_entries(names_col()),
        lambda e: F.struct(e["key"].alias("key"), mz.alias("minzoom"), e["value"].alias("value")),
    )
