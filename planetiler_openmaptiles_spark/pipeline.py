"""End-to-end tile build: documents → decoded features → layers → tiles.

The Spark mirror of OpenMapTilesMain (SURVEY.md §3.1): one declarative DAG
instead of the reference's multi-pass imperative pipeline. Stage boundaries
(decode / rendered features / tile features / tiles) checkpoint through
`checkpoint.CheckpointManager` (parquet+manifest Iceberg emulation) with
lineage + row counts, so a killed job resumes from the last complete stage.

Run via spark-submit:

    spark-submit --py-files planetiler_openmaptiles_spark.zip \
        -m planetiler_openmaptiles_spark.pipeline \
        --corpus /path/corpus --out /path/tiles --checkpoints /path/ckpt

The per-row span-sequence invariant (BASELINE.json input_hint) is enforced
in `decode_stage` — any document whose re-encoded spans differ from the
original fails the run.
"""

from __future__ import annotations

import argparse
import hashlib
import json
import os
import sys
import time

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from .checkpoint import CheckpointManager
from .features import union_features
from .layers import Config, LayerContext, transform_all
from .spans import decode_documents, reencode_spans
from .tiling.explode import render_tiles
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


def check_span_invariant(docs: DataFrame, feats: DataFrame) -> int:
    """Count rows violating span-sequence equality (must be 0)."""
    rebuilt = feats.withColumn("_re", reencode_spans())
    orig = docs.select("doc_id", F.array_sort(
        F.col("spans"),
        lambda a, b: F.when(a["offset"] < b["offset"], F.lit(-1))
        .when(a["offset"] > b["offset"], F.lit(1)).otherwise(F.lit(0)),
    ).alias("_orig"))
    j = rebuilt.join(orig, "doc_id")
    same = F.zip_with(
        F.col("_re"), F.col("_orig"),
        lambda a, b: a["kind"].eqNullSafe(b["kind"]) & a["text"].eqNullSafe(b["text"])
        & a["media_ref"].eqNullSafe(b["media_ref"]) & a["offset"].eqNullSafe(b["offset"]),
    )
    ok = (F.size("_re") == F.size("_orig")) & F.forall(same, lambda x: x)
    return j.filter(~ok).count()


def with_wikidata_translations(feats: DataFrame, wikidata: DataFrame) -> DataFrame:
    """S4: join wikidata name translations onto the tag map — the Spark
    mirror of the reference's wikidata fetch + Translations provider
    (OpenMapTilesMain.java:34, OpenMapTilesProfile.java:125-128). The
    wikidata table is a small dimension → broadcast left join on the
    `wikidata` tag; matched languages surface as name:<lang> tags, which
    layers/util.names_map then emits automatically."""
    wd = (
        wikidata.groupBy("qid")
        .agg(
            F.map_from_entries(
                F.collect_list(
                    F.struct(F.concat(F.lit("name:"), F.col("lang")).alias("key"),
                             F.col("name").alias("value"))
                )
            ).alias("_wd_names")
        )
    )
    qid = F.element_at(F.col("tags"), "wikidata")
    out = feats.join(F.broadcast(wd), qid == wd["qid"], "left").drop("qid")
    # existing name:xx tags on the element win over wikidata (reference
    # Translations precedence) → concat with element tags LAST
    return out.withColumn(
        "tags",
        F.when(
            F.col("_wd_names").isNotNull(), F.map_concat(F.col("_wd_names"), F.col("tags"))
        ).otherwise(F.col("tags")),
    ).drop("_wd_names")


def make_context(spark: SparkSession, corpus_dir: str, config: Config | None = None) -> LayerContext:
    docs = load_documents(spark, corpus_dir)
    side = load_side_tables(spark, corpus_dir)
    # the decoded features feed 30 table projections + several plan-time
    # collects (NE registries, region polygons) — persist the decode once.
    # At full scale this is the decode-stage checkpoint instead.
    feats = decode_documents(docs)
    if "wikidata" in side:
        feats = with_wikidata_translations(feats, side["wikidata"])
    # materialize the i18n name map ONCE per element: inlining names_map into
    # every layer expression blew the generated code past the JVM 64 KB
    # method limit → interpreted fallback (~300 ms/row). The persist() below
    # is the collapse barrier that makes this a real materialization.
    from .layers.util import names_map

    feats = feats.withColumn("names", names_map()).persist()
    return LayerContext(
        spark=spark,
        features=feats,
        side=side,
        config=config or Config(),
    )


def rendered_features(ctx: LayerContext) -> DataFrame:
    return union_features(transform_all(ctx))


def _fingerprint(*parts) -> str:
    return hashlib.sha256("|".join(str(p) for p in parts).encode()).hexdigest()[:16]


def build_tiles(
    spark: SparkSession,
    corpus_dir: str,
    config: Config | None = None,
    checkpoint_dir: str | None = None,
    check_invariant: bool = False,
) -> DataFrame:
    """documents → final per-tile features DataFrame (checkpointed)."""
    config = config or Config()
    cp = CheckpointManager(checkpoint_dir or "", enabled=bool(checkpoint_dir))
    fp = _fingerprint(corpus_dir, sorted(vars(config).items()))

    docs = load_documents(spark, corpus_dir)
    if check_invariant:
        feats = decode_documents(docs)
        bad = check_span_invariant(docs, feats)
        if bad:
            raise AssertionError(f"span-sequence invariant violated for {bad} documents")

    if checkpoint_dir:
        # one checkpoint stage per layer: Catalyst analysis/optimization cost
        # grows superlinearly with plan size — the single 16-layer union plan
        # serialized to ~26 MB and its per-action optimization dominated wall
        # time (zero core-scaling). Sixteen small plans optimize fast, fail
        # independently, and give per-layer resume + lineage. The stages are
        # submitted from CONCURRENT driver threads (Spark schedules jobs from
        # multiple threads fine) so per-stage driver analysis and the small
        # write barriers overlap instead of serializing — on a real cluster
        # this is the difference between 16 sequential barriers and ~3.
        ctx = make_context(spark, corpus_dir, config)
        from .features import FEATURE_COLUMNS
        import importlib
        from concurrent.futures import ThreadPoolExecutor

        names = config.active_layers()
        # import serially first: modules register post-processors at import
        mods = [importlib.import_module(f".layers.{n}", __package__) for n in names]
        # materialize the shared decode persist once before fan-out so
        # concurrent stages hit the cache instead of racing to fill it
        ctx.features.count()

        def run_stage(name, mod):
            return cp.stage(
                f"layer_{name}", fp,
                lambda: mod.transform(ctx).select(*FEATURE_COLUMNS),
                spark, lineage=["documents"],
            )

        with ThreadPoolExecutor(max_workers=8) as ex:
            futs = [ex.submit(run_stage, n, m) for n, m in zip(names, mods)]
            layer_dfs = [f.result() for f in futs]
        rendered = union_features(layer_dfs)
    else:

        def _rendered():
            ctx = make_context(spark, corpus_dir, config)
            return rendered_features(ctx)

        rendered = cp.stage("rendered_features", fp, _rendered, spark, lineage=["documents"])
    tile_feats = cp.stage(
        "tile_features", fp, lambda: render_tiles(rendered, config.max_zoom), spark,
        lineage=["rendered_features"],
    )
    tiles = finalize_tiles(tile_feats)
    return tiles


def write_tiles(tiles: DataFrame, out_dir: str) -> dict:
    """Write the tile table partitioned by zoom (the mbtiles-sink analog,
    S5) and a small metadata JSON."""
    tiles.write.mode("overwrite").partitionBy("z").parquet(os.path.join(out_dir, "tiles"))
    return {"path": os.path.join(out_dir, "tiles")}


def main(argv=None):
    ap = argparse.ArgumentParser()
    ap.add_argument("--corpus", required=True)
    ap.add_argument("--out", required=True)
    ap.add_argument("--checkpoints", default=None)
    ap.add_argument("--max-zoom", type=int, default=14)
    ap.add_argument("--only-layers", default="")
    ap.add_argument("--exclude-layers", default="")
    ap.add_argument("--check-invariant", action="store_true")
    ap.add_argument("--master", default=None)
    args = ap.parse_args(argv)

    from .session import get_spark

    spark = get_spark("omt-tile-build", master=args.master)
    config = Config(
        only_layers=tuple(x for x in args.only_layers.split(",") if x),
        exclude_layers=tuple(x for x in args.exclude_layers.split(",") if x),
        max_zoom=args.max_zoom,
    )
    t0 = time.time()
    tiles = build_tiles(spark, args.corpus, config, args.checkpoints,
                        check_invariant=args.check_invariant)
    tiles = tiles.cache()
    n_feats = tiles.count()
    n_tiles = tiles.select("z", "x", "y").distinct().count()
    write_tiles(tiles, args.out)
    wall = time.time() - t0
    report = {
        "tile_features": n_feats,
        "tiles": n_tiles,
        "wall_s": round(wall, 2),
        "tiles_per_sec": round(n_tiles / wall, 2),
    }
    with open(os.path.join(args.out, "build_report.json"), "w") as f:
        json.dump(report, f, indent=2)
    print(json.dumps(report))
    spark.stop()


if __name__ == "__main__":
    main()
