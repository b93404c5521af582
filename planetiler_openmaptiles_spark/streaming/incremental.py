"""Incremental document ingest via Structured Streaming.

The reference is strictly batch (SURVEY.md §2.9: the only temporal
construct is the end-of-source finish barrier). This module is the
engine's *addition* for continuously-arriving document corpora: new
parquet files landing in the documents directory stream through the
same decode + table-match logic, and `foreachBatch` drives the batch
tile pipeline incrementally per micro-batch — the pattern a 100 TB
deployment uses for daily OSM diffs.

Stateless decode/match run as plain streaming transformations; anything
needing the full corpus (NE lake argmax, finish barriers) belongs in the
foreachBatch handler where the micro-batch DataFrame is just a batch DF.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from ..spans import SPAN_SCHEMA, decode_documents
from ..schema.tables import match_tables_column


def stream_documents(spark: SparkSession, path: str, max_files_per_trigger: int = 16) -> DataFrame:
    """readStream over the documents directory (file source; schema fixed)."""
    schema = "doc_id string, spans array<struct<kind:string,text:string,media_ref:string,offset:int>>"
    return (
        spark.readStream.schema(schema)
        .option("maxFilesPerTrigger", max_files_per_trigger)
        .parquet(path)
    )


def streaming_table_match_counts(docs_stream: DataFrame) -> DataFrame:
    """Continuous per-table element counts (complete-mode aggregate)."""
    feats = decode_documents(docs_stream)
    return (
        feats.withColumn("table", F.explode(match_tables_column()))
        .groupBy("table")
        .count()
    )


def incremental_tile_build(
    spark: SparkSession,
    docs_path: str,
    out_dir: str,
    checkpoint_dir: str,
    config=None,
    max_zoom: int = 14,
):
    """foreachBatch: run the per-batch slice of the tile pipeline for each
    micro-batch of new documents and append to the tiles table. Cross-batch
    reduction (re-merging a tile across batches) happens on read or in a
    periodic compaction pass — the standard lambda-style split."""
    from ..features import union_features
    from ..layers import Config, LayerContext, transform_all
    from ..tiling.explode import render_tiles
    from ..tiling.postprocess import finalize_tiles

    config = config or Config()

    def handle_batch(batch_df: DataFrame, batch_id: int):
        if batch_df.isEmpty():
            return
        from ..layers.util import names_map

        feats = decode_documents(batch_df).withColumn("names", names_map())
        ctx = LayerContext(spark=spark, features=feats, side={}, config=config)
        rendered = union_features(transform_all(ctx))
        tiles = finalize_tiles(render_tiles(rendered, max_zoom))
        (
            tiles.withColumn("_batch_id", F.lit(batch_id))
            .write.mode("append")
            .partitionBy("z")
            .parquet(out_dir)
        )

    stream = stream_documents(spark, docs_path)
    return (
        stream.writeStream.foreachBatch(handle_batch)
        .option("checkpointLocation", checkpoint_dir)
        .trigger(availableNow=True)
        .start()
    )
