"""Tile/layer size statistics — planetiler's ``--output-layerstats``
analog (planetiler core ``TileSizeStats``; the openmaptiles profile
inherits it). At planet scale the first question about a slow or
oversized archive is "which layer, at which zoom, in which tile?" —
this module answers it from the finalized feature table without
writing an archive.

Two stages:
* ``tile_layer_sizes`` — one ``applyInPandas`` pass per (z,x,y) tile
  (same partitioning the MVT sink uses, so no extra shuffle shape):
  encodes each layer of the tile once with the engine's own MVT codec
  and emits (z, x, y, layer, n_features, bytes); a ``_tile`` row per
  tile carries the whole-tile encoded and gzipped sizes. The encoder
  itself is cross-engine-verified by the ``geo_tiles_mvt`` round-trip
  oracle; this pass only measures it.
* ``layer_stats`` — pure-Catalyst rollup per (z, layer): tile/feature
  counts, total/max bytes, and the biggest tile's coordinates via a
  single ``max(struct(bytes, x, y))`` (deterministic tie-break:
  larger x, then y). One map-side-combined aggregate; integers only,
  so the result is bit-stable across engines.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

TILE_ROW = "_tile"


def tile_layer_sizes(tiles: DataFrame) -> DataFrame:
    """(z, x, y, layer, n_features, bytes, gz_bytes) per encoded tile
    layer (``gz_bytes`` null), plus one ``_tile`` row per tile with the
    whole-tile encoded bytes and its gzipped archive size."""
    import pandas as pd
    from pyspark.sql import types as T

    from planetiler_openmaptiles_spark.geom import packed
    from planetiler_openmaptiles_spark.tiling import mvt

    schema = T.StructType(
        [
            T.StructField("z", T.IntegerType()),
            T.StructField("x", T.IntegerType()),
            T.StructField("y", T.IntegerType()),
            T.StructField("layer", T.StringType()),
            T.StructField("n_features", T.LongType()),
            T.StructField("bytes", T.LongType()),
            T.StructField("gz_bytes", T.LongType()),
        ]
    )

    def sizes(key, pdf: pd.DataFrame) -> pd.DataFrame:
        z, x, y = int(key[0]), int(key[1]), int(key[2])
        pdf = pdf.sort_values(["layer", "seq"], kind="mergesort")
        layers: dict = {}
        for row in pdf.itertuples(index=False):
            g = packed.to_geom(row.geom_px, row.kind)
            if g is None:
                continue
            attrs = dict(row.attrs) if row.attrs is not None else {}
            layers.setdefault(row.layer, []).append(
                (row.elem_id, row.kind, g, attrs)
            )
        out = []
        nf_total = 0
        for name in sorted(layers):
            blob = mvt.encode_tile({name: layers[name]})
            nf_total += len(layers[name])
            out.append((z, x, y, name, len(layers[name]), len(blob), None))
        whole = mvt.encode_tile({k: layers[k] for k in sorted(layers)})
        out.append(
            (z, x, y, TILE_ROW, nf_total, len(whole),
             len(mvt.gzip_tile(whole)))
        )
        return pd.DataFrame(out, columns=schema.fieldNames()).astype(
            {"z": "int32", "x": "int32", "y": "int32"}
        )

    return tiles.groupBy("z", "x", "y").applyInPandas(sizes, schema)


def layer_stats(sizes: DataFrame) -> DataFrame:
    """Per-(z, layer) rollup: n_tiles, n_features, total_bytes,
    total_gz_bytes (``_tile`` rows only), max_bytes, and the biggest
    tile's (big_x, big_y)."""
    big = F.max(F.struct("bytes", "x", "y")).alias("big")
    return (
        sizes.groupBy("z", "layer")
        .agg(
            F.count(F.lit(1)).alias("n_tiles"),
            F.sum("n_features").alias("n_features"),
            F.sum("bytes").alias("total_bytes"),
            F.sum("gz_bytes").alias("total_gz_bytes"),
            big,
        )
        .select(
            "z",
            "layer",
            "n_tiles",
            "n_features",
            "total_bytes",
            "total_gz_bytes",
            F.col("big.bytes").alias("max_bytes"),
            F.col("big.x").alias("big_x"),
            F.col("big.y").alias("big_y"),
        )
    )
