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


def test_stateful_dedup_cross_batch(spark, tmp_path):
    """applyInPandasWithState dedup: duplicates inside a batch AND across
    micro-batches are suppressed; first-seen doc_id wins (state recovers
    from the checkpoint between availableNow runs)."""
    import pandas as pd

    from planetiler_openmaptiles_spark.streaming.stateful import (
        streaming_dedup_first_seen,
    )

    src = str(tmp_path / "dedup_in")
    out = str(tmp_path / "dedup_out")
    ckpt = str(tmp_path / "dedup_ckpt")
    os.makedirs(src)

    def run_once():
        stream = (
            spark.readStream.schema("doc_id bigint, text string")
            .option("maxFilesPerTrigger", 1)
            .parquet(src)
        )
        q = (
            streaming_dedup_first_seen(stream)
            .writeStream.format("parquet").option("path", out)
            .outputMode("append").option("checkpointLocation", ckpt)
            .trigger(availableNow=True).start()
        )
        q.awaitTermination(120)

    # batch 1: two distinct texts, one in-batch duplicate
    pd.DataFrame(
        {"doc_id": [1, 2, 3], "text": ["alpha", "beta", "alpha"]}
    ).to_parquet(os.path.join(src, "b1.parquet"))
    run_once()
    got = {r["doc_id"] for r in spark.read.parquet(out).collect()}
    assert got == {1, 2}
    # batch 2 arrives later: one replayed text, one new
    pd.DataFrame({"doc_id": [4, 5], "text": ["alpha", "gamma"]}).to_parquet(
        os.path.join(src, "b2.parquet")
    )
    run_once()
    got2 = {r["doc_id"] for r in spark.read.parquet(out).collect()}
    assert got2 == {1, 2, 5}  # "alpha" suppressed by cross-batch state


def test_windowed_event_counts(spark, tmp_path):
    import pandas as pd

    from planetiler_openmaptiles_spark.streaming.stateful import windowed_event_counts

    src = str(tmp_path / "ev_in")
    os.makedirs(src)
    ts = pd.to_datetime(
        ["2026-01-01 00:10", "2026-01-01 00:40", "2026-01-01 01:05", "2026-01-01 00:20"]
    ).astype("datetime64[us]")  # micros: Spark's parquet timestamp unit
    pd.DataFrame(
        {"ts": ts, "event_type": ["click", "click", "click", "view"]}
    ).to_parquet(os.path.join(src, "e1.parquet"))
    stream = spark.readStream.schema("ts timestamp, event_type string").parquet(src)
    q = (
        windowed_event_counts(stream, window="1 hour", watermark="1 day")
        .writeStream.format("memory").queryName("ev_counts")
        .outputMode("complete").trigger(availableNow=True).start()
    )
    q.awaitTermination(120)
    rows = {
        (str(r["window_start"]), r["event_type"]): r["n"]
        for r in spark.sql("select * from ev_counts").collect()
    }
    assert rows[("2026-01-01 00:00:00", "click")] == 2
    assert rows[("2026-01-01 01:00:00", "click")] == 1
    assert rows[("2026-01-01 00:00:00", "view")] == 1


def test_streaming_sessionize(spark, tmp_path):
    import pandas as pd

    from planetiler_openmaptiles_spark.streaming.stateful import (
        streaming_sessionize,
    )

    src = str(tmp_path / "sess_in")
    os.makedirs(src)
    ts = pd.to_datetime(
        [
            "2026-01-01 00:00",  # u1 session A
            "2026-01-01 00:10",  # u1 session A (gap 10m < 30m)
            "2026-01-01 01:00",  # u1 session B (gap 50m)
            "2026-01-01 00:05",  # u2 session A
        ]
    ).astype("datetime64[us]")
    pd.DataFrame({"ts": ts, "user_id": [1, 1, 1, 2]}).to_parquet(
        os.path.join(src, "e1.parquet")
    )
    stream = spark.readStream.schema("ts timestamp, user_id long").parquet(src)
    q = (
        streaming_sessionize(stream, gap="30 minutes", watermark="1 hour")
        .writeStream.format("memory").queryName("sessions")
        .outputMode("complete").trigger(availableNow=True).start()
    )
    q.awaitTermination(120)
    rows = sorted(
        (r["user_id"], str(r["session_start"]), r["n_events"])
        for r in spark.sql("select * from sessions").collect()
    )
    assert rows == [
        (1, "2026-01-01 00:00:00", 2),
        (1, "2026-01-01 01:00:00", 1),
        (2, "2026-01-01 00:05:00", 1),
    ]


def test_windowed_counts_append_mode_drops_late_data(spark, tmp_path):
    """Append-mode watermark semantics pinned: a row arriving in a later
    batch with an event time older than (max seen ts - watermark) is
    DROPPED, and windows emit only once finalized — the behavior that
    bounds state at 100 TB stream scale. Two availableNow runs against
    one checkpoint (a parquet sink supports recovery) model a restarted
    job consuming a late shard."""
    import pandas as pd

    from planetiler_openmaptiles_spark.streaming.stateful import (
        windowed_event_counts,
    )

    src = str(tmp_path / "late_in")
    out = str(tmp_path / "late_out")
    ckpt = str(tmp_path / "late_ckpt")
    os.makedirs(src)

    def write(name, times, kinds):
        ts = pd.to_datetime(times).astype("datetime64[us]")
        pd.DataFrame({"ts": ts, "event_type": kinds}).to_parquet(
            os.path.join(src, name)
        )

    def run_once():
        stream = spark.readStream.schema(
            "ts timestamp, event_type string"
        ).parquet(src)
        q = (
            windowed_event_counts(
                stream, window="1 hour", watermark="1 hour"
            )
            .writeStream.format("parquet").option("path", out)
            .option("checkpointLocation", ckpt)
            .outputMode("append").trigger(availableNow=True).start()
        )
        q.awaitTermination(180)

    # batch 1: events up to 03:30 -> watermark (1h) finalizes 00:xx
    write("b1.parquet",
          ["2026-01-01 00:10", "2026-01-01 00:20", "2026-01-01 03:30"],
          ["click", "click", "click"])
    run_once()
    # batch 2: one late event (3h+ behind the watermark) + one in-time
    write("b2.parquet",
          ["2026-01-01 00:30", "2026-01-01 03:45"], ["click", "click"])
    run_once()

    rows = {
        str(r["window_start"]): r["n"]
        for r in spark.read.parquet(out).collect()
    }
    # the 00:00 window finalized with the ORIGINAL 2 clicks; the late
    # 00:30 row never mutates it
    assert rows.get("2026-01-01 00:00:00") == 2
    # the 03:00 window is still open (watermark has not passed it), so
    # append mode has not emitted it yet
    assert "2026-01-01 03:00:00" not in rows


def test_incremental_tile_stream_exact_mor(spark, corpus_dir, tmp_path):
    """Exact streaming materialization: after two micro-batches of OSM
    documents (dimension docs + wikidata arriving via side_corpus), the
    merge-on-read current tiles equal the REAL batch pipeline over the
    whole corpus — including NE-joined place attrs and i18n names — and
    compaction preserves them while dropping superseded versions."""
    import glob

    from pyspark.sql import functions as F

    from planetiler_openmaptiles_spark.layers import Config
    from planetiler_openmaptiles_spark.pipeline import (
        make_context, rendered_features,
    )
    from planetiler_openmaptiles_spark.streaming.incremental import (
        compact_tiles, incremental_tile_stream, read_current_tiles,
    )
    from planetiler_openmaptiles_spark.tiling.explode import render_tiles
    from planetiler_openmaptiles_spark.tiling.postprocess import finalize_tiles

    cfg = Config(
        only_layers=("building", "housenumber", "transportation", "place"),
        max_zoom=9,
    )
    docs = spark.read.parquet(os.path.join(corpus_dir, "documents.parquet"))
    is_osm = F.col("doc_id").startswith("osm/")
    split = F.substring(F.col("doc_id"), -1, 1).isin("3", "7")

    src = str(tmp_path / "docs_stream")
    os.makedirs(src)
    for name, pred in (("b0.parquet", is_osm & ~split),
                       ("b1.parquet", is_osm & split)):
        d = str(tmp_path / ("w_" + name))
        docs.filter(pred).coalesce(1).write.parquet(d)
        shutil.copy(glob.glob(os.path.join(d, "part-*.parquet"))[0],
                    os.path.join(src, name))
    side_dir = str(tmp_path / "side_corpus")
    os.makedirs(side_dir)
    docs.filter(~is_osm).write.parquet(
        os.path.join(side_dir, "documents.parquet"))
    for side in ("lake_centerlines.parquet", "natural_earth.parquet",
                 "wikidata.parquet"):
        srcp = os.path.join(corpus_dir, side)
        dstp = os.path.join(side_dir, side)
        (shutil.copytree if os.path.isdir(srcp) else shutil.copy2)(srcp, dstp)

    out = str(tmp_path / "mor_out")
    q = incremental_tile_stream(
        spark, src, out, str(tmp_path / "mor_ckpt"), config=cfg,
        max_files_per_trigger=1, side_corpus=side_dir,
    )
    q.awaitTermination(600)

    ctx = make_context(spark, corpus_dir, cfg)
    full = finalize_tiles(render_tiles(
        rendered_features(ctx), cfg.max_zoom,
        cfg.simplify_tolerance, cfg.bounds))

    def rows(df):
        return sorted(
            (r["z"], r["x"], r["y"], r["layer"], r["seq"],
             bytes(r["geom_px"]), tuple(sorted(r["attrs"].items())))
            for r in df.collect())

    want = rows(full)
    assert rows(read_current_tiles(spark, out)) == want
    # place must actually exercise the NE dimension join via side_corpus
    assert any(t[3] == "place" for t in want)
    # superseded versions exist pre-compaction (batch 1 rewrote some keys)
    mor = spark.read.parquet(os.path.join(out, "tiles_mor"))
    assert mor.count() > len(want)
    n = compact_tiles(spark, out)
    assert n == len(want)
    assert rows(read_current_tiles(spark, out)) == want

    # cross-document layers rejected
    import pytest as _pytest
    with _pytest.raises(ValueError, match="aggregate across documents"):
        incremental_tile_stream(
            spark, src, out, str(tmp_path / "mor_ckpt2"),
            config=Config(only_layers=("water",)),
        )


def test_streaming_windowed_hll_matches_batch(spark, tmp_path):
    """Streaming HLL register maintenance (one watermarked aggregation)
    finished batch-side equals the batch hll_distinct over the same
    events — register state is algebraic, so incremental folding across
    micro-batches loses nothing."""
    import pandas as pd

    from pyspark.sql import functions as F

    from planetiler_openmaptiles_spark.streaming.stateful import (
        windowed_hll_registers)
    from planetiler_openmaptiles_spark.textops.sketches import (
        hll_distinct, hll_estimate_from_registers)

    src = str(tmp_path / "hll_in")
    os.makedirs(src)
    ts = pd.to_datetime(
        ["2026-01-01 00:05"] * 40 + ["2026-01-01 01:10"] * 25
    ).astype("datetime64[us]")
    users = list(range(40)) + [1000 + i % 10 for i in range(25)]
    pd.DataFrame(
        {"ts": ts[:30], "event_type": "click", "user_id": users[:30]}
    ).to_parquet(os.path.join(src, "b1.parquet"))
    pd.DataFrame(
        {"ts": ts[30:], "event_type": "click", "user_id": users[30:]}
    ).to_parquet(os.path.join(src, "b2.parquet"))

    stream = spark.readStream.schema(
        "ts timestamp, event_type string, user_id long"
    ).option("maxFilesPerTrigger", 1).parquet(src)
    q = (
        windowed_hll_registers(stream, "user_id", window="1 hour")
        .writeStream.format("memory").queryName("hll_regs")
        .outputMode("complete").trigger(availableNow=True).start()
    )
    q.awaitTermination(120)
    regs = spark.sql("select * from hll_regs")
    est = {
        (str(r["window_start"]), r["event_type"]): r["hll_estimate"]
        for r in hll_estimate_from_registers(
            regs, ["window_start", "event_type"]
        ).collect()
    }
    batch = spark.read.parquet(src).select(
        F.window("ts", "1 hour").alias("w"), "event_type", "user_id"
    ).select(F.col("w.start").alias("window_start"), "event_type", "user_id")
    want = {
        (str(r["window_start"]), r["event_type"]): r["hll_estimate"]
        for r in hll_distinct(
            batch, "user_id", ["window_start", "event_type"]
        ).collect()
    }
    assert est == want and len(est) == 2
    # small-cardinality windows resolve near-exactly via linear counting
    assert abs(est[("2026-01-01 01:00:00", "click")] - 10) < 1
    assert abs(est[("2026-01-01 00:00:00", "click")] - 40) < 8


def test_stream_stream_interval_join_matches_batch(spark, tmp_path):
    """Watermarked stream-stream attribution join (availableNow over two
    file streams) equals the batch interval join over the same data."""
    import pandas as pd
    from pyspark.sql import functions as F

    from planetiler_openmaptiles_spark.streaming.stateful import (
        attributed_events)

    imp_dir = str(tmp_path / "imp")
    clk_dir = str(tmp_path / "clk")
    os.makedirs(imp_dir)
    os.makedirs(clk_dir)
    imp_ts = pd.to_datetime(
        ["2026-01-01 00:00", "2026-01-01 02:00", "2026-01-01 00:30"]
    ).astype("datetime64[us]")
    pd.DataFrame({"ts": imp_ts, "user_id": [1, 1, 2]}).to_parquet(
        os.path.join(imp_dir, "i1.parquet"))
    clk_ts = pd.to_datetime(
        ["2026-01-01 00:40",   # joins user1 imp@00:00
         "2026-01-01 02:10",   # joins user1 imp@02:00
         "2026-01-01 03:00",   # exactly 3600s after imp@02:00 (inclusive)
         "2026-01-01 00:35"]   # user2 imp@00:30
    ).astype("datetime64[us]")
    pd.DataFrame({"ts": clk_ts, "user_id": [1, 1, 1, 2]}).to_parquet(
        os.path.join(clk_dir, "c1.parquet"))

    schema = "ts timestamp, user_id long"
    s_imp = spark.readStream.schema(schema).parquet(imp_dir)
    s_clk = spark.readStream.schema(schema).parquet(clk_dir)
    q = (
        attributed_events(s_imp, s_clk, window_seconds=3600)
        .writeStream.format("memory").queryName("attrib")
        .outputMode("append").trigger(availableNow=True).start()
    )
    q.awaitTermination(120)
    got = {(r["user_id"], str(r["imp_ts"]), str(r["click_ts"]), r["lag_seconds"])
           for r in spark.sql("select * from attrib").collect()}

    b_imp = spark.read.parquet(imp_dir)
    b_clk = spark.read.parquet(clk_dir)
    want = {(r["user_id"], str(r["imp_ts"]), str(r["click_ts"]), r["lag_seconds"])
            for r in attributed_events(b_imp, b_clk, window_seconds=3600).collect()}
    assert got == want
    assert len(got) == 4
    assert (1, "2026-01-01 00:00:00", "2026-01-01 00:40:00", 2400) in got
    assert (1, "2026-01-01 02:00:00", "2026-01-01 03:00:00", 3600) in got
