"""Custom stateful streaming operators (applyInPandasWithState).

The reference is batch-only (SURVEY.md §2.9); these are the engine's
streaming additions for continuously-arriving training-data corpora:

- ``streaming_dedup_first_seen``: cross-micro-batch exact dedup — the
  streaming form of ``textops.dedup.exact_dups``. State is keyed by a
  bounded content-hash *bucket* (not one state row per document), so each
  state-store entry holds the set of full hashes seen in that bucket;
  bucket count is the knob that trades state-row count against row size.
  Emits each new unique document once with its content hash; replays and
  cross-batch duplicates are suppressed.

- ``windowed_event_counts``: watermark + tumbling-window aggregate over the
  ``events`` table shape (ts/event_type) — the built-in-operator baseline
  the custom op is measured against; late rows beyond the watermark drop.

At 100 TB the dedup state shards across the state store by bucket key and
every micro-batch shuffles only (bucket, hash, id) triples, never text.
"""

from __future__ import annotations

from typing import Iterable

import pandas as pd
from pyspark.sql import DataFrame
from pyspark.sql import functions as F
from pyspark.sql.streaming.state import GroupState, GroupStateTimeout

OUT_SCHEMA = "doc_id bigint, content_hash bigint"
STATE_SCHEMA = "seen array<long>"
_N_BUCKETS = 256


def _dedup_group(
    key, pdfs: Iterable[pd.DataFrame], state: GroupState
) -> Iterable[pd.DataFrame]:
    """One hash bucket: emit rows whose full hash is unseen, then fold the
    new hashes into the bucket's state."""
    seen = set(state.get[0]) if state.exists else set()
    out_ids, out_hashes = [], []
    for pdf in pdfs:
        # first occurrence inside the batch wins too: stable doc_id order
        pdf = pdf.sort_values("doc_id")
        for h, i in zip(pdf["content_hash"], pdf["doc_id"]):
            h = int(h)
            if h not in seen:
                seen.add(h)
                out_ids.append(int(i))
                out_hashes.append(h)
    state.update((list(seen),))
    if out_ids:
        yield pd.DataFrame({"doc_id": out_ids, "content_hash": out_hashes})


def streaming_dedup_first_seen(docs: DataFrame, text_col: str = "text") -> DataFrame:
    """Exact-dedup a stream of (doc_id, text): keep the first-seen document
    per distinct text across ALL micro-batches. Returns (doc_id,
    content_hash) of the survivors."""
    hashed = docs.select(
        F.col("doc_id").cast("long").alias("doc_id"),
        F.xxhash64(F.col(text_col)).alias("content_hash"),
        F.pmod(F.xxhash64(F.col(text_col)), F.lit(_N_BUCKETS)).alias("bucket"),
    )
    return hashed.groupBy("bucket").applyInPandasWithState(
        _dedup_group,
        outputStructType=OUT_SCHEMA,
        stateStructType=STATE_SCHEMA,
        outputMode="append",
        timeoutConf=GroupStateTimeout.NoTimeout,
    )


def streaming_sessionize(
    events: DataFrame,
    gap: str = "30 minutes",
    watermark: str = "1 hour",
) -> DataFrame:
    """Streaming gap-sessionization: the SAME ``session_window``
    aggregate the batch `eventops.sessionize` uses, run incrementally —
    Spark keeps per-(user, open-session) state, merges windows as events
    arrive, and emits a session once the watermark passes its close.
    State is bounded by watermark horizon × active users, not history.
    """
    return (
        events.withWatermark("ts", watermark)
        .groupBy(F.col("user_id"), F.session_window("ts", gap).alias("w"))
        .agg(F.count(F.lit(1)).alias("n_events"))
        .select(
            "user_id",
            F.col("w.start").alias("session_start"),
            F.col("w.end").alias("session_end"),
            "n_events",
        )
    )


def windowed_event_counts(
    events: DataFrame, window: str = "1 hour", watermark: str = "1 day"
) -> DataFrame:
    """Tumbling-window per-type event counts with late-data watermark."""
    return (
        events.withWatermark("ts", watermark)
        .groupBy(F.window("ts", window).alias("w"), "event_type")
        .agg(F.count("*").alias("n"))
        .select(
            F.col("w.start").alias("window_start"),
            F.col("event_type"),
            F.col("n"),
        )
    )


def windowed_hll_registers(
    events: DataFrame, value_col: str = "user_id", window: str = "1 hour",
    watermark: str = "1 day", p: int = 8
) -> DataFrame:
    """Streaming HyperLogLog pre-aggregation: per (tumbling window,
    event_type) maintain the HLL register table incrementally —
    ``max(rank)`` is algebraic, so Structured Streaming folds each
    micro-batch into watermarked register state without reprocessing
    history; state per key is <= 2^p tiny rows regardless of event
    volume. Structured Streaming allows one aggregation per query, so
    the estimate itself is finished batch-side on the sink with
    ``textops.sketches.hll_estimate_from_registers`` — the standard
    lakehouse split (streaming pre-aggregate, batch finish)."""
    from ..textops.sketches import hll_registers

    w = events.withWatermark("ts", watermark).select(
        F.window("ts", window).alias("w"), "event_type",
        F.col(value_col).alias("v"),
    )
    return hll_registers(w, "v", ["w", "event_type"], p).select(
        F.col("w.start").alias("window_start"), "event_type", "bucket", "reg"
    )


def attributed_events(
    impressions: DataFrame, clicks: DataFrame,
    window_seconds: int = 3600, watermark: str = "2 hours"
) -> DataFrame:
    """Watermarked stream-stream interval join (the attribution shape:
    click joins the impression that preceded it within the window). Both
    sides carry watermarks plus the time-range predicate, so Spark bounds
    EACH side's join state and evicts rows older than watermark + range —
    without the interval condition the state grows forever. Returns one
    row per attributed pair ``(user_id, imp_ts, click_ts, lag_seconds)``."""
    imp = impressions.select(
        F.col("user_id").alias("i_user"), F.col("ts").alias("imp_ts")
    ).withWatermark("imp_ts", watermark)
    clk = clicks.select(
        F.col("user_id").alias("c_user"), F.col("ts").alias("click_ts")
    ).withWatermark("click_ts", watermark)
    cond = (
        (F.col("i_user") == F.col("c_user"))
        & (F.col("click_ts") >= F.col("imp_ts"))
        & (F.col("click_ts")
           <= F.col("imp_ts") + F.expr(f"INTERVAL {window_seconds} SECONDS"))
    )
    return imp.join(clk, cond).select(
        F.col("i_user").alias("user_id"), "imp_ts", "click_ts",
        (F.unix_timestamp("click_ts")
         - F.unix_timestamp("imp_ts")).alias("lag_seconds"),
    )
