"""Append-shard incremental rebuild (no reference equivalent — planetiler
is full-batch only): recompute just the tiles a new document shard
touches and splice the rest from the previous build.

Usage:
  python -m tools.incremental_retile \
    --base-corpus DIR --shard-corpus DIR \
    --checkpoints CKPT --base-out DIR --out DIR \
    [--only-layers building,housenumber,...] [--max-zoom 14] \
    [--new-doc-prefix osm/] [--master local[8]]

The shard corpus must carry the dimension documents (natural_earth /
water_polygons / lake_centerlines) for join context; --new-doc-prefix
selects the genuinely new documents so dimensions aren't re-emitted.
Prints one JSON line with tile counts.
"""

from __future__ import annotations

import argparse
import json
import os
import sys

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, REPO)


def main() -> None:
    ap = argparse.ArgumentParser()
    ap.add_argument("--base-corpus", required=True)
    ap.add_argument("--shard-corpus", required=True)
    ap.add_argument("--checkpoints", required=True)
    ap.add_argument("--base-out", required=True)
    ap.add_argument("--out", required=True)
    ap.add_argument("--only-layers", default="")
    ap.add_argument("--max-zoom", type=int, default=14)
    ap.add_argument("--new-doc-prefix", default=None)
    ap.add_argument("--update-mbtiles", default=None,
                    help="also update this compact mbtiles archive in "
                         "place (delete+reinsert only the affected tiles)")
    ap.add_argument("--master", default="local[8]")
    args = ap.parse_args()

    from pyspark.sql import functions as F

    from planetiler_openmaptiles_spark.layers import Config
    from planetiler_openmaptiles_spark.pipeline import (
        incremental_retile, write_tiles,
    )
    from planetiler_openmaptiles_spark.session import get_spark

    from planetiler_openmaptiles_spark.pipeline import PER_DOC_LAYERS

    spark = get_spark(master=args.master)
    layers = tuple(n for n in args.only_layers.split(",") if n)
    if not layers:
        # the full 16-layer set includes cross-document layers the
        # incremental guard rejects — default to the per-doc allowlist
        layers = tuple(sorted(PER_DOC_LAYERS))
    cfg = Config(only_layers=layers, max_zoom=args.max_zoom)
    pred = (
        F.col("doc_id").startswith(args.new_doc_prefix)
        if args.new_doc_prefix else None
    )
    tiles = incremental_retile(
        spark, args.base_corpus, args.shard_corpus, args.checkpoints,
        args.base_out, cfg, new_doc_pred=pred,
    )
    written = write_tiles(tiles, args.out)
    back = spark.read.parquet(written["path"])
    report = {
        "tile_features": back.count(),
        "tiles": back.select("z", "x", "y").distinct().count(),
    }
    if args.update_mbtiles:
        from planetiler_openmaptiles_spark.pipeline import update_mbtiles

        report["mbtiles"] = update_mbtiles(
            back, args.update_mbtiles, tiles._omt_affected
        )
    print(json.dumps(report))


if __name__ == "__main__":
    main()
