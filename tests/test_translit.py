"""name:latin transliteration fallback (F5 parity,
OmtLanguageUtils.java:90-121 / Translations.transliterate)."""

import pandas as pd
import pytest
from pyspark.sql import functions as F

from planetiler_openmaptiles_spark.layers.translit import transliterate_str
from planetiler_openmaptiles_spark.layers.util import names_map


def test_transliterate_str_tables():
    assert transliterate_str("Москва") == "Moskva"
    assert transliterate_str("Щёлково") == "Shchyolkovo"
    assert transliterate_str("Київ") == "Kiyiv"  # single-table best effort
    assert transliterate_str("Αθήνα") == "Athina"
    assert transliterate_str("Θεσσαλονίκη") == "Thessaloniki"
    assert transliterate_str("北京") == "bei jing"
    assert transliterate_str("上海市") == "shang hai shi"
    assert transliterate_str("とうきょう") == "toukiyou"  # naive digraphs
    assert transliterate_str("カタカナ") == "katakana"
    # latin passes through; unmapped chars preserved (best effort)
    assert transliterate_str("Paris") == "Paris"
    assert transliterate_str(None) is None


def _names(spark, tags, **kw):
    df = spark.createDataFrame([(tags,)], "tags map<string,string>")
    return df.select(names_map(F.col("tags"), **kw).alias("n")).collect()[0]["n"]


def test_names_map_translit_fallback(spark):
    # no latin alias anywhere -> transliterated fallback
    n = _names(spark, {"name": "Москва"})
    assert n["name:latin"] == "Moskva"
    assert n["name:nonlatin"] == "Москва"
    assert n["name_int"] == "Moskva"  # coalesce(int_name, name:en, latin, name)
    n = _names(spark, {"name": "Αθήνα"})
    assert n["name:latin"] == "Athina"
    n = _names(spark, {"name": "北京"})
    assert n["name:latin"] == "bei jing"


def test_names_map_alias_beats_translit(spark):
    n = _names(spark, {"name": "Москва", "name:en": "Moscow"})
    assert n["name:latin"] == "Moscow"


def test_names_map_translit_off(spark):
    n = _names(spark, {"name": "Москва"}, transliterate=False)
    assert n.get("name:latin") is None


def test_names_map_languages_default_list(spark):
    """Default = OpenMapTilesSchema.LANGUAGES: in-list codes pass
    through, out-of-list (but name:xx-shaped) keys are dropped."""
    tags = {"name": "Foo", "name:es": "Fu", "name:qqq": "Zz"}
    n = _names(spark, tags)
    assert n["name:es"] == "Fu"
    assert "name:qqq" not in n


def test_names_map_languages_override(spark):
    tags = {"name": "Foo", "name:es": "Fu", "name:fr": "Fou"}
    n = _names(spark, tags, languages=("fr",))
    assert "name:es" not in n and n["name:fr"] == "Fou"
    # () = no passthrough; None = accept any shaped key
    n0 = _names(spark, tags, languages=())
    assert "name:es" not in n0 and "name:fr" not in n0
    nany = _names(spark, {"name": "Foo", "name:qqq": "Zz"}, languages=None)
    assert nany["name:qqq"] == "Zz"
