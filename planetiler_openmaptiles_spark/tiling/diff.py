"""Tile-archive diff — regression comparison of two builds.

The scale problem this solves: after a code or schema change you have
two z0-14 builds (billions of tiles at planet scale) and need to know
*what changed, where* without downloading either. The diff works on
the finalized feature tables (the parquet form both the mbtiles and
pmtiles sinks consume), entirely as one full-outer equi-join on the
tile key:

* ``tile_signatures`` — per (z, x, y, layer): feature count and an
  order-insensitive multiset fingerprint (``bit_xor`` of per-feature
  ``xxhash64`` over kind, geometry bytes, and order-canonicalized
  attrs). One map-side-combined aggregate; no sort, no Python.
* ``tile_diff`` — full-outer join of two signature tables on
  (z, x, y, layer) → per-(z, layer) counts of tiles only_a / only_b /
  changed / same. The join shuffles on the tile key both sides; at
  100 TB both inputs are already tile-partitioned parquet so AQE
  coalesces to co-located work.

The per-feature hash is xxhash64 (not replayable in DuckDB), so the
driver oracle checkpoints both signature tables as aux parquet and
independently replays the join classification + rollup — the logic
that can silently break (same trust boundary as the MinHash/SimHash
oracles).
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F


def tile_signatures(tiles: DataFrame) -> DataFrame:
    """(z, x, y, layer, n_features, sig): multiset content fingerprint
    per tile layer."""
    attrs_canon = F.to_json(F.array_sort(F.map_entries("attrs")))
    h = F.xxhash64("kind", "geom_px", attrs_canon)
    return (
        tiles.select(
            "z", "x", "y", "layer", h.alias("h")
        )
        .groupBy("z", "x", "y", "layer")
        .agg(
            F.count(F.lit(1)).alias("n_features"),
            F.expr("bit_xor(h)").alias("sig"),
        )
    )


def tile_diff(a: DataFrame, b: DataFrame) -> DataFrame:
    """Per-(z, layer) archive diff over two finalized feature tables:
    n_only_a, n_only_b, n_changed, n_same (tile granularity)."""
    sa = tile_signatures(a).withColumnRenamed("sig", "sig_a")
    sb = tile_signatures(b).withColumnRenamed("sig", "sig_b")
    j = sa.select("z", "x", "y", "layer", "sig_a").join(
        sb.select("z", "x", "y", "layer", "sig_b"),
        ["z", "x", "y", "layer"],
        "full_outer",
    )
    return (
        j.groupBy("z", "layer")
        .agg(
            F.sum(
                F.when(F.col("sig_b").isNull(), 1).otherwise(0)
            ).alias("n_only_a"),
            F.sum(
                F.when(F.col("sig_a").isNull(), 1).otherwise(0)
            ).alias("n_only_b"),
            F.sum(
                F.when(
                    F.col("sig_a").isNotNull()
                    & F.col("sig_b").isNotNull()
                    & (F.col("sig_a") != F.col("sig_b")),
                    1,
                ).otherwise(0)
            ).alias("n_changed"),
            F.sum(
                F.when(F.col("sig_a") == F.col("sig_b"), 1).otherwise(0)
            ).alias("n_same"),
        )
    )
