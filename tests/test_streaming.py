"""Structured-Streaming incremental ingest test (availableNow trigger)."""

import os
import shutil

from planetiler_openmaptiles_spark.streaming.incremental import (
    incremental_tile_build,
    stream_documents,
    streaming_table_match_counts,
)


def test_streaming_table_match_counts(spark, corpus_dir, tmp_path):
    src = str(tmp_path / "docs_in")
    os.makedirs(src)
    shutil.copy(os.path.join(corpus_dir, "documents.parquet"), src)
    stream = stream_documents(spark, src)
    agg = streaming_table_match_counts(stream)
    q = (
        agg.writeStream.format("memory").queryName("tbl_counts")
        .outputMode("complete").trigger(availableNow=True).start()
    )
    q.awaitTermination(120)
    rows = {r["table"]: r["count"] for r in spark.sql("select * from tbl_counts").collect()}
    assert rows.get("osm_building_polygon", 0) > 0
    assert rows.get("osm_highway_linestring", 0) > 0


def test_incremental_tile_build(spark, corpus_dir, tmp_path):
    from planetiler_openmaptiles_spark.layers import Config

    src = str(tmp_path / "docs_in2")
    os.makedirs(src)
    shutil.copy(os.path.join(corpus_dir, "documents.parquet"), src)
    out = str(tmp_path / "tiles_out")
    ckpt = str(tmp_path / "stream_ckpt")
    q = incremental_tile_build(
        spark, src, out, ckpt, config=Config(only_layers=("water",)), max_zoom=6
    )
    q.awaitTermination(300)
    tiles = spark.read.parquet(out)
    assert tiles.count() > 0
    assert {r["layer"] for r in tiles.select("layer").distinct().collect()} == {"water"}
