"""Span codec + table matching tests (Spark)."""

import os

from pyspark.sql import functions as F

from planetiler_openmaptiles_spark import spans
from planetiler_openmaptiles_spark.schema import tables


def _docs(spark, corpus_dir):
    return spark.read.parquet(os.path.join(corpus_dir, "documents.parquet"))


def test_decode_shapes(spark, corpus_dir):
    docs = _docs(spark, corpus_dir)
    feats = spans.decode_documents(docs)
    n = docs.count()
    assert feats.count() == n
    row = feats.filter(F.col("source") == "osm").first()
    assert row.elem_id > 0
    assert row.geom_kind in ("point", "linestring", "polygon")
    assert isinstance(row.tags, dict)


def test_span_sequence_invariant(spark, corpus_dir):
    docs = _docs(spark, corpus_dir)
    feats = spans.decode_documents(docs)
    checked = spans.with_span_invariant(docs, feats)
    bad = checked.filter(~F.col("span_invariant_ok")).count()
    assert bad == 0, f"{bad} docs failed span-sequence equality"


def test_table_matching_multi(spark, corpus_dir):
    docs = _docs(spark, corpus_dir)
    feats = spans.decode_documents(docs).filter(F.col("source") == "osm")
    matched = tables.all_table_matches(feats)
    counts = {r["table"]: r["count"] for r in matched.groupBy("table").count().collect()}
    assert counts.get("osm_building_polygon", 0) > 0
    assert counts.get("osm_highway_linestring", 0) > 0
    assert counts.get("osm_water_polygon", 0) > 0
    assert counts.get("osm_poi_point", 0) > 0
    assert counts.get("osm_housenumber_point", 0) > 0
    # aerodrome polygons must match BOTH aeroway_polygon and aerodrome_label
    aero = feats.filter(F.element_at("tags", "aeroway") == "aerodrome")
    m = tables.all_table_matches(aero).groupBy("table").count().collect()
    got = {r["table"] for r in m}
    assert {"osm_aeroway_polygon", "osm_aerodrome_label_point"} <= got


def test_typed_extraction(spark, corpus_dir):
    docs = _docs(spark, corpus_dir)
    feats = spans.decode_documents(docs)
    water = tables.table_rows(feats, "osm_water_polygon")
    row = water.filter(F.col("name").isNotNull()).first()
    assert row is not None
    assert row.is_intermittent in (True, False)
    hw = tables.table_rows(feats, "osm_highway_linestring")
    assert hw.filter(F.col("is_oneway") == 1).count() > 0
    assert set(hw.select("highway").distinct().toPandas()["highway"]) <= {
        "motorway", "trunk", "primary", "secondary", "tertiary", "residential",
        "service", "footway", "path", "cycleway",
    }
