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
        tiles = finalize_tiles(render_tiles(
            rendered, max_zoom, config.simplify_tolerance, config.bounds,
            config.simplify_algorithm,
        ))
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


def incremental_tile_stream(
    spark: SparkSession,
    docs_path: str,
    out_dir: str,
    checkpoint_dir: str,
    config=None,
    max_files_per_trigger: int = 16,
    side_corpus: str | None = None,
):
    """EXACT incremental tile materialization over a document stream —
    the merge-on-read upgrade of ``incremental_tile_build`` (which defers
    cross-batch merging). Per micro-batch:

      1. render the batch's documents and APPEND their pre-finalize rows
         to a cumulative ``state_tile_features`` table (the streaming
         analog of the batch checkpoint ``incremental_retile`` reads);
      2. recompute ONLY the affected tile keys from the cumulative state
         (sound for the same reason as incremental_retile: every finalize
         key starts with (z, x, y));
      3. append the recomputed tiles stamped with the batch id — a later
         batch's rows supersede earlier rows for the same tile key.

    ``read_current_tiles`` resolves the latest version per tile key
    (merge-on-read); ``compact_tiles`` rewrites the table to just the
    current rows (the periodic compaction an Iceberg MOR table runs).
    Restricted to the per-document layer allowlist (pipeline.PER_DOC_LAYERS)
    — cross-document layers need a full rebuild.

    ``side_corpus``: a corpus dir whose documents (dimension sources) and
    side tables (wikidata) join every batch for CONTEXT — place/NE joins
    and name translations then match a batch build — without being
    re-emitted (the side corpus's doc_ids are anti-joined out of each
    batch's rendered rows).

    Replay safety: both the cumulative state and the tiles table are
    partitioned by ``_batch_id`` and written with dynamic partition
    overwrite, so an at-least-once foreachBatch replay of batch N rewrites
    partition N instead of duplicating it."""
    import os

    from ..features import union_features
    from ..layers import (
        Config, LayerContext, load_addon_modules, transform_all,
    )
    from ..pipeline import (
        PER_DOC_LAYERS, context_from_docs, load_documents, load_side_tables,
    )
    from ..tiling.explode import render_tiles
    from ..tiling.postprocess import finalize_tiles

    config = config or Config()
    bad = [n for n in config.active_layers() if n not in PER_DOC_LAYERS]
    if bad:
        raise ValueError(
            f"incremental_tile_stream: layers {bad} aggregate across "
            "documents; restrict Config(only_layers=...) to "
            f"{sorted(PER_DOC_LAYERS)}"
        )
    if load_addon_modules(config):
        raise ValueError(
            "incremental_tile_stream: addon layers are not supported — "
            "their render may aggregate across documents"
        )
    state_dir = os.path.join(out_dir, "state_tile_features")
    tiles_dir = os.path.join(out_dir, "tiles_mor")
    side_docs = side_ids = None
    side = {}
    if side_corpus:
        side_docs = load_documents(spark, side_corpus)
        side_ids = side_docs.select("doc_id")
        side = load_side_tables(spark, side_corpus)

    def handle_batch(batch_df: DataFrame, batch_id: int):
        if batch_df.isEmpty():
            return
        docs = (
            batch_df.unionByName(side_docs) if side_docs is not None
            else batch_df
        )
        ctx = context_from_docs(spark, docs, side, config)
        rendered = union_features(transform_all(ctx))
        if side_ids is not None:
            rendered = rendered.join(side_ids, "doc_id", "left_anti")
        batch_feats = render_tiles(
            rendered, config.max_zoom, config.simplify_tolerance,
            config.bounds, config.simplify_algorithm,
        )
        (
            batch_feats.withColumn("_batch_id", F.lit(batch_id))
            .write.mode("overwrite")
            .partitionBy("_batch_id")
            .option("partitionOverwriteMode", "dynamic")
            .parquet(state_dir)
        )
        ctx.features.unpersist()
        # re-read this batch's own rows from the state (cheap, pruned) so
        # the render runs once; recompute from the CUMULATIVE state
        state = spark.read.parquet(state_dir)
        affected = (
            state.filter(F.col("_batch_id") == batch_id)
            .select("z", "x", "y").distinct()
        )
        combined = state.drop("_batch_id").join(
            F.broadcast(affected), ["z", "x", "y"], "left_semi"
        )
        recomputed = finalize_tiles(combined)
        (
            recomputed.withColumn("_batch_id", F.lit(batch_id))
            .write.mode("overwrite")
            .partitionBy("_batch_id")
            .option("partitionOverwriteMode", "dynamic")
            .parquet(tiles_dir)
        )
        cached = getattr(recomputed, "_omt_cached", None)
        if cached is not None:
            cached.unpersist()

    stream = stream_documents(spark, docs_path, max_files_per_trigger)
    return (
        stream.writeStream.foreachBatch(handle_batch)
        .option("checkpointLocation", checkpoint_dir)
        .trigger(availableNow=True)
        .start()
    )


def read_current_tiles(spark: SparkSession, out_dir: str) -> DataFrame:
    """Merge-on-read: latest batch's rows per tile key. One aggregate on
    the tile key + one co-partitioned join — the read-side cost compaction
    amortizes away."""
    import os

    mor = spark.read.parquet(os.path.join(out_dir, "tiles_mor"))
    latest = mor.groupBy("z", "x", "y").agg(
        F.max("_batch_id").alias("_batch_id")
    )
    return mor.join(latest, ["z", "x", "y", "_batch_id"]).drop("_batch_id")


def compact_tiles(spark: SparkSession, out_dir: str) -> int:
    """Rewrite tiles_mor to only the current rows (drops superseded
    versions); returns the current row count. Run with the stream STOPPED
    (like an Iceberg maintenance job taking the table lock); the swap is
    crash-safe — the old table is moved aside before the new one lands,
    so no window exists where tiles_mor is missing both."""
    import os
    import shutil

    cur = read_current_tiles(spark, out_dir).withColumn(
        "_batch_id", F.lit(-1)
    )
    tmp = os.path.join(out_dir, "tiles_mor_compact")
    cur.write.mode("overwrite").partitionBy("_batch_id").parquet(tmp)
    final = os.path.join(out_dir, "tiles_mor")
    old = final + ".old"
    shutil.rmtree(old, ignore_errors=True)
    os.replace(final, old)
    os.replace(tmp, final)
    shutil.rmtree(old)
    return spark.read.parquet(final).count()
