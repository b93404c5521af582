"""Append-shard incremental rebuild (no reference equivalent — planetiler
is full-batch only): recompute just the tiles a new document shard
touches and splice the rest from the previous build.

Usage:
  python -m tools.incremental_retile \
    --base-corpus DIR --shard-corpus DIR \
    --checkpoints CKPT --base-out DIR --out DIR \
    [--only-layers building,housenumber,...] [--max-zoom 14] \
    [--new-doc-prefix osm/] [--master local[8]]

  OSM replication shape (no shard corpus needed — the diff derives it):
  python -m tools.incremental_retile \
    --base-corpus pbf:planet.osm.pbf --osc minute/123.osc \
    --checkpoints CKPT --base-out DIR --out DIR [--update-mbtiles X.mbtiles]

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
    ap.add_argument("--shard-corpus", default=None,
                    help="parquet corpus of new documents (or use --osc)")
    ap.add_argument("--osc", default=None,
                    help="OsmChange .osc diff applied to the base extract "
                         "(replication shape); derives the shard and the "
                         "removed-document set automatically")
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

    if bool(args.shard_corpus) == bool(args.osc):
        ap.error("exactly one of --shard-corpus or --osc is required")

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
    removed = None
    shard = args.shard_corpus
    tmp_shard = None
    if args.osc:
        import tempfile

        from planetiler_openmaptiles_spark.sources.osm_osc import (
            apply_osmchange,
        )

        if not args.base_corpus.startswith("pbf:"):
            ap.error("--osc requires --base-corpus pbf:<extract>")
        _, new_docs, removed = apply_osmchange(
            spark, args.base_corpus[len("pbf:"):], args.osc
        )
        shard = tmp_shard = tempfile.mkdtemp(prefix="osc_shard_")
        new_docs.write.mode("overwrite").parquet(
            os.path.join(shard, "documents.parquet")
        )
        # modified docs keep their doc_id — the default existing-id
        # anti-join would drop them; every shard doc IS new content
        pred = F.lit(True)
    tiles = incremental_retile(
        spark, args.base_corpus, shard, args.checkpoints,
        args.base_out, cfg, new_doc_pred=pred, removed_doc_ids=removed,
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
    if tmp_shard:
        # every job that reads the derived shard has run (write_tiles and
        # the archive update are both materializing) — a replication loop
        # must not accumulate one shard dir per minutely diff
        import shutil

        shutil.rmtree(tmp_shard, ignore_errors=True)
    print(json.dumps(report))


if __name__ == "__main__":
    main()
