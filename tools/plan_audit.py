"""Capture .explain(formatted) for the engine's key plans → PLANS.md.

Run:  python tools/plan_audit.py

The audit checks the physical properties the engine's design relies on:
parquet PushedFilters / pruned ReadSchema, BroadcastHashJoin for the NE
dimension joins, whole-stage codegen spans around the tag-match and
zoom-explode stages, and a single tile-keyed exchange before the per-tile
reduce.
"""

from __future__ import annotations

import io
import os
import sys
from contextlib import redirect_stdout

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, REPO)

MANUAL_MARKER = "<!-- MANUAL SECTIONS BELOW — preserved by tools/plan_audit.py -->"


def explain_str(df) -> str:
    buf = io.StringIO()
    with redirect_stdout(buf):
        df.explain("formatted")
    return buf.getvalue()


def main():
    from pyspark.sql import functions as F

    from planetiler_openmaptiles_spark.datagen import write_corpus
    from planetiler_openmaptiles_spark.layers import Config
    from planetiler_openmaptiles_spark.pipeline import make_context, rendered_features
    from planetiler_openmaptiles_spark.session import get_spark
    from planetiler_openmaptiles_spark.tiling.explode import prepare_geoms, zoom_explode
    from planetiler_openmaptiles_spark.schema.tables import match_tables_column

    spark = get_spark("plan-audit", master="local[4]", shuffle_partitions=8)
    d = write_corpus(os.path.join(REPO, ".gendata"), n_docs=500, seed=42)

    sections = []

    docs = spark.read.parquet(os.path.join(d, "documents.parquet"))
    from planetiler_openmaptiles_spark.spans import decode_documents

    feats = decode_documents(docs)

    # 1. table match + explode — should be one scan + codegen project/explode
    tm = feats.withColumn("table", F.explode(match_tables_column())).groupBy("table").count()
    sections.append(("Table match + explode (F1)", explain_str(tm)))

    # 2. water layer transform — NE broadcast joins + argmax aggregation
    ctx = make_context(spark, d, Config(only_layers=("water",)))
    sections.append(("Water layer (J2 lake argmax join)", explain_str(rendered_features(ctx))))

    # 3. zoom explode + pixel gate — filter must sit before the python stage
    ctx2 = make_context(spark, d, Config(only_layers=("landcover",)))
    ze = zoom_explode(prepare_geoms(rendered_features(ctx2)), 14)
    sections.append(("Zoom explode + JVM pixel gate (stage B)", explain_str(ze)))

    # 4. a relational query — parquet pushdown evidence
    li = spark.read.parquet("/root/testdata/sf0.001/lineitem.parquet")
    q = li.filter(F.col("l_quantity") > 30).select("l_orderkey", "l_quantity")
    sections.append(("Filter/column pushdown to parquet", explain_str(q)))

    # 5. inverted index — the salted pre-cap window and the per-term
    # window/aggregate chain must reuse ONE term-keyed exchange after the
    # (term, doc) count; no extra shuffles between them.
    sfdocs = spark.read.parquet("/root/testdata/sf0.001/documents.parquet")
    from planetiler_openmaptiles_spark.textops.index import (
        build_inverted_index,
    )

    sections.append(
        (
            "Inverted index (salted top-N cap, exchange reuse)",
            "NOTE: the static plan prints the stats branch and the postings"
            " branch as two subtrees, but at runtime AQE's ReuseExchange"
            " collapses the identical (term, doc_id) shuffles — verified:"
            " the post-execution adaptive plan contains ReusedExchange, so"
            " the corpus explode+count is paid once. Spark also rewrites"
            " each row_number cap into WindowGroupLimit (partial top-N"
            " before the sort), visible below.\n\n"
            + explain_str(build_inverted_index(sfdocs)),
        )
    )

    # 6. as-of join — ONE shuffle+sort per user key; the carry window and
    # the left-row filter stay in the same exchange.
    ev = spark.read.parquet("/root/testdata/sf0.001/events.parquet")
    from planetiler_openmaptiles_spark.eventops import asof_join

    sections.append(
        ("As-of join (union-and-carry, one sort)", explain_str(asof_join(ev, "click", "error")))
    )

    # 7. DSIR — one corpus scan feeds both the bucket model and the per-doc
    # stream; model and totals come back as BroadcastHashJoins.
    from planetiler_openmaptiles_spark.textops.selection import dsir_weights

    sections.append(
        (
            "DSIR importance weights (broadcast model)",
            explain_str(dsir_weights(sfdocs, F.col("source") == "src0")),
        )
    )

    # 8. LM perplexity scoring — the bigram/context model tables must come
    # back as BroadcastHashJoins onto the exploded corpus bigrams, with the
    # per-doc aggregate map-side-combined; token→unk mapping is a pure
    # Column expression (vocab inlined), so no Python anywhere.
    from planetiler_openmaptiles_spark.textops.lm import perplexity_buckets

    sections.append(
        (
            "LM perplexity (broadcast model, codegen scoring)",
            explain_str(
                perplexity_buckets(sfdocs, F.col("lang") == "en", vocab_size=64)
            ),
        )
    )

    # 9. composite training pipeline — the four chained stages (dedup →
    # quality gate → perplexity buckets → hash split) must fuse into one
    # job graph: dedup's window is the only full-corpus sort, the LM model
    # tables come back broadcast, and the split is a zero-shuffle map.
    import __spark_entry__ as entry

    sections.append(
        (
            "Composite training pipeline (one job graph)",
            explain_str(
                entry._q_training_pipeline(spark, "/root/testdata/sf0.001")
            ),
        )
    )

    # 10. archive read+decode — one mapInPandas chain over the split plan
    # (no shuffle until the consumer asks for one); the tile_diff rollup
    # below shuffles ONCE per side on the tile key then full-outer joins.
    from planetiler_openmaptiles_spark.pipeline import write_mbtiles
    from planetiler_openmaptiles_spark.sources.tile_archive import (
        decode_tiles, read_mbtiles,
    )
    from planetiler_openmaptiles_spark.tiling.diff import tile_diff

    arc = os.path.join(REPO, ".gendata", "plan_audit.mbtiles")
    from planetiler_openmaptiles_spark.pipeline import build_tiles

    tiles4 = build_tiles(spark, d, Config(only_layers=("water",), max_zoom=4))
    write_mbtiles(tiles4, arc, max_zoom=4)
    dec = decode_tiles(read_mbtiles(spark, arc))
    sections.append(("Tile-archive read + MVT decode (S6: no pre-shuffle)",
                     explain_str(dec)))
    sections.append((
        "Archive diff (one exchange per side, full-outer on tile key)",
        explain_str(tile_diff(dec, dec)),
    ))

    # 11. S2 cell aggregation — Arrow UDF projection + ONE map-side-combined
    # aggregate; the parent column is pure bit math in codegen.
    from planetiler_openmaptiles_spark.spatial import s2_cell_udf, s2_parent_col

    pts = spark.range(10000).select(
        ((F.col("id") * 79) % 360 - 180 + 0.5).cast("double").alias("lon"),
        ((F.col("id") * 37) % 160 - 80 + 0.5).cast("double").alias("lat"),
    )
    s2q = (
        pts.select(s2_cell_udf(8)(F.col("lon"), F.col("lat")).alias("cell8"))
        .withColumn("parent4", s2_parent_col(F.col("cell8"), 4))
        .groupBy("cell8", "parent4").count()
    )
    sections.append(("S2 cell aggregation (Arrow UDF + codegen bit math)",
                     explain_str(s2q)))

    # 12. PageRank — edge derivation is one explode + one groupBy (pairs
    # expand in array math, never a second shuffle); each iteration is one
    # hash join rank⋈edges + one map-side-combined groupBy(dst), and
    # localCheckpoint truncates lineage so the printed plan stays flat at
    # iteration 5 (no 5×-nested join tree).
    from planetiler_openmaptiles_spark.textops.graph import (
        document_pagerank, shared_gram_edges)

    sections.append(
        (
            "PageRank (df-capped edges, flat per-iteration plan)",
            "Edge derivation:\n"
            + explain_str(shared_gram_edges(sfdocs))
            + "\n\nFull 5-iteration query (localCheckpoint keeps it flat):\n"
            + explain_str(document_pagerank(sfdocs, iters=2)),
        )
    )

    # 13. HLL registers — the ONLY corpus-sized shuffle carries (group,
    # bucket, rank) with partial max (map-side combine) before the
    # exchange; the estimate groupBy runs over <= 256 rows per group.
    from planetiler_openmaptiles_spark.textops.sketches import hll_distinct

    sections.append(
        (
            "HyperLogLog (register-level shuffle, partial max)",
            explain_str(hll_distinct(ev, "user_id", ["event_type"])),
        )
    )

    # 14. density pyramid — stage 1 groupBy is the only corpus-sized
    # exchange (key space bounded by 4^z); the ancestor explode runs over
    # the aggregate and re-aggregates a zoom-levels×distinct-tiles table.
    from planetiler_openmaptiles_spark.spatial import point_density_pyramid

    wpts = spark.range(20000).select(
        ((F.col("id") * 7919 % 10007) / 10007.0).alias("wx"),
        ((F.col("id") * 104729 % 10007) / 10007.0).alias("wy"),
    )
    sections.append(
        (
            "Density pyramid (finest-zoom aggregate, bit-shift ancestors)",
            explain_str(point_density_pyramid(wpts, max_zoom=10)),
        )
    )

    out = ["# PLANS — physical-plan audit (generated by tools/plan_audit.py)\n"]
    out.append(
        "Checks: PushedFilters / pruned ReadSchema on scans; BroadcastHashJoin"
        " for NE dimensions; WholeStageCodegen around match/explode/gates;"
        " tile-keyed exchange before the per-tile reduce.\n"
    )
    for title, text in sections:
        out.append(f"\n## {title}\n\n```\n{text}\n```\n")
    # preserve hand-maintained sections (measured straggler tables etc.)
    # below the marker — regeneration must not clobber them
    path = os.path.join(REPO, "PLANS.md")
    manual = ""
    if os.path.exists(path):
        prev = open(path).read()
        idx = prev.find(MANUAL_MARKER)
        if idx != -1:
            manual = prev[idx:]
    with open(path, "w") as f:
        f.write("\n".join(out))
        if manual:
            f.write("\n" + manual)
    print("wrote PLANS.md")
    spark.stop()


if __name__ == "__main__":
    main()
