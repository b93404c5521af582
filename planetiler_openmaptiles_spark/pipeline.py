"""End-to-end tile build: documents → decoded features → layers → tiles.

The Spark mirror of OpenMapTilesMain (SURVEY.md §3.1): one declarative DAG
instead of the reference's multi-pass imperative pipeline. Stage boundaries
(decode / per-layer transform / render / tile reduce) are where the
checkpoint manager (checkpoint.py) persists parquet + lineage so a killed
job resumes mid-zoom without recompute.
"""

from __future__ import annotations

import os

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from . import layers as layers_pkg
from .features import union_features
from .layers import Config, LayerContext, transform_all
from .spans import decode_documents
from .tiling.explode import prepare_geoms, render_tiles, tile_cut, zoom_explode
from .tiling.postprocess import finalize_tiles


def load_documents(spark: SparkSession, corpus_dir: str) -> DataFrame:
    return spark.read.parquet(os.path.join(corpus_dir, "documents.parquet"))


def load_side_tables(spark: SparkSession, corpus_dir: str) -> dict:
    side = {}
    for name in ("natural_earth", "lake_centerlines", "wikidata"):
        p = os.path.join(corpus_dir, f"{name}.parquet")
        if os.path.exists(p):
            side[name] = spark.read.parquet(p)
    return side


def make_context(spark: SparkSession, corpus_dir: str, config: Config | None = None) -> LayerContext:
    docs = load_documents(spark, corpus_dir)
    feats = decode_documents(docs)
    return LayerContext(
        spark=spark,
        features=feats,
        side=load_side_tables(spark, corpus_dir),
        config=config or Config(),
    )


def rendered_features(ctx: LayerContext) -> DataFrame:
    return union_features(transform_all(ctx))


def build_tiles(
    spark: SparkSession,
    corpus_dir: str,
    config: Config | None = None,
) -> DataFrame:
    """documents → final per-tile features DataFrame."""
    ctx = make_context(spark, corpus_dir, config)
    feats = rendered_features(ctx)
    tile_feats = render_tiles(feats, (config or Config()).max_zoom)
    return finalize_tiles(tile_feats)
