"""Expression-cache correctness (exprs.py)."""

from pyspark.sql import functions as F

from planetiler_openmaptiles_spark import exprs as X


def test_lit_cache_type_keyed(spark):
    # True == 1 == 1.0 hash identically in Python; the cache must not
    # conflate them (a boolean literal is not an int literal)
    df = spark.range(1).select(
        X.lit(True).alias("b"), X.lit(1).alias("i"), X.lit(1.0).alias("d")
    )
    assert [f.dataType.simpleString() for f in df.schema.fields] == [
        "boolean", "int", "double"
    ]
    r = df.first()
    assert r["b"] is True and r["i"] == 1 and r["d"] == 1.0


def test_cached_columns_reusable_across_plans(spark):
    c = X.const(7, "int", "v")
    a = spark.range(3).select(c).agg(F.sum("v")).first()[0]
    b = spark.range(5).select(c).agg(F.sum("v")).first()[0]
    assert (a, b) == (21, 35)
    assert X.const(7, "int", "v") is c  # same cached object


def test_class_case_sql_semantics(spark):
    from planetiler_openmaptiles_spark.layers.util import class_case

    rules = [("river", ("waterway", ("river", "stream"))),
             ("it's", ("odd'key", ("v'1",)))]  # quote escaping
    df = spark.createDataFrame(
        [({"waterway": "stream"},), ({"odd'key": "v'1"},), ({"x": "y"},), ({},)],
        "tags map<string,string>",
    )
    got = [r[0] for r in df.select(class_case(rules, default="other")).collect()]
    assert got == ["river", "it's", "other", "other"]
    got2 = [r[0] for r in df.select(class_case(rules)).collect()]
    assert got2 == ["river", "it's", None, None]
