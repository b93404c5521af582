"""Event-stream analytics: sessionization, as-of joins, JSON rollups.

Classic event-table operators a telemetry/behavioral pipeline needs,
each Spark-first:

* ``sessionize`` — gap-based sessions via the NATIVE
  ``F.session_window`` aggregate (Spark's dynamic-gap session operator,
  the same one Structured Streaming uses for stateful sessionization);
  one shuffle on the user key, windows merged JVM-side.

* ``asof_join`` — the time-series "most recent prior row" join
  (pandas ``merge_asof`` / DuckDB ``ASOF JOIN`` / kdb ``aj``), built as
  the distributed union-and-carry pattern: tag both sides, union, ONE
  shuffle+sort per user ordered by (ts, right-first), then
  ``last_value(ignorenulls)`` carries the latest right-side attributes
  onto each left row. No range join, no per-key quadratic blowup — a
  key whose history is huge still costs one sort.

* ``props_rollup`` — JSON property extraction (``get_json_object``)
  with a numeric rollup per event type; stays in whole-stage codegen.

All timestamps leave as epoch MICROSECONDS (bigint) so independent
engines compare exactly (no timestamp-formatting drift).
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame, Window
from pyspark.sql import functions as F


def _us(col: Column) -> Column:
    """Epoch microseconds. Parquet timestamps arrive as TIMESTAMP_NTZ;
    the session timezone is pinned to UTC (session.py:48), so the cast
    is an identity reinterpretation, matching DuckDB's epoch_us."""
    return F.unix_micros(col.cast("timestamp"))


def sessionize(
    events: DataFrame,
    gap: str = "30 minutes",
    user_col: str = "user_id",
    ts_col: str = "ts",
    value_col: str = "value",
) -> DataFrame:
    """Per-user gap sessions: events within ``gap`` of the previous one
    (INCLUSIVE — exactly-gap-apart still merges, Spark ``session_window``
    semantics) chain into one session; the session window ends ``gap``
    after its last event.

    Returns (user_id, session_start_us, session_end_us, n_events,
    sum_value, n_types).
    """
    return (
        events.groupBy(
            F.col(user_col).alias("user_id"),
            F.session_window(F.col(ts_col), gap).alias("w"),
        )
        .agg(
            F.count(F.lit(1)).alias("n_events"),
            F.round(F.sum(value_col), 6).alias("sum_value"),
            F.count_distinct("event_type").alias("n_types"),
        )
        .select(
            "user_id",
            _us(F.col("w.start")).alias("session_start_us"),
            _us(F.col("w.end")).alias("session_end_us"),
            "n_events",
            "sum_value",
            "n_types",
        )
    )


def asof_join(
    events: DataFrame,
    left_type: str,
    right_type: str,
    user_col: str = "user_id",
    ts_col: str = "ts",
) -> DataFrame:
    """For every ``left_type`` event, attach the most recent
    ``right_type`` event of the same user with ``right.ts <= left.ts``
    (inclusive, matching DuckDB/pandas asof semantics). Left rows with
    no prior right row keep nulls.

    Ties: a right row at exactly the left row's timestamp matches; among
    multiple right rows sharing one timestamp the highest event_id wins
    (the union sort is (ts, right-first, event_id), and last_value takes
    the final carry).

    Returns (event_id, user_id, ts_us, matched_event_id, matched_ts_us,
    matched_value, lag_us).
    """
    tagged = events.where(
        F.col("event_type").isin(left_type, right_type)
    ).select(
        "event_id",
        F.col(user_col).alias("user_id"),
        _us(F.col(ts_col)).alias("ts_us"),
        "value",
        (F.col("event_type") == right_type).alias("is_right"),
    )
    # right rows sort BEFORE the left row at an equal timestamp so the
    # inclusive (<=) match semantics hold.
    order = [
        F.col("ts_us"),
        F.col("is_right").desc(),
        F.col("event_id"),
    ]
    w = (
        Window.partitionBy("user_id")
        .orderBy(*order)
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    )

    # Carry the matched right row as ONE struct: per-column carries would
    # tear a match whose value is NULL (ignorenulls skips the NULL value
    # column but still advances event_id/ts_us, mixing two events).
    carried = F.last(
        F.when(
            F.col("is_right"),
            F.struct(
                F.col("event_id").alias("e"),
                F.col("ts_us").alias("t"),
                F.col("value").alias("v"),
            ),
        ),
        ignorenulls=True,
    ).over(w)

    return (
        tagged.withColumn("_m", carried)
        .select(
            "event_id",
            "user_id",
            "ts_us",
            "value",
            "is_right",
            F.col("_m.e").alias("matched_event_id"),
            F.col("_m.t").alias("matched_ts_us"),
            F.col("_m.v").alias("matched_value"),
        )
        .where(~F.col("is_right"))
        .select(
            "event_id",
            "user_id",
            "ts_us",
            "matched_event_id",
            "matched_ts_us",
            "matched_value",
            (F.col("ts_us") - F.col("matched_ts_us")).alias("lag_us"),
        )
    )


def funnel(
    events: DataFrame,
    stages: list[str],
    user_col: str = "user_id",
    ts_col: str = "ts",
) -> DataFrame:
    """Ordered funnel: the first time each user completes
    stage1 → stage2 → … in sequence (each stage strictly after the
    previous stage's matched event; equal timestamps do NOT advance).

    One shuffle (groupBy user), then a single JVM ``aggregate`` fold
    over the user's time-sorted events — no iterative self-joins, no
    per-stage passes. The per-user event list is bounded by that user's
    history; a pathological power-user is one task, not a plan blowup.

    Returns (user_id, stage_reached, t_stage1_us … t_stageK_us).
    """
    n = len(stages)
    ev = events.where(F.col("event_type").isin(*stages)).select(
        F.col(user_col).alias("user_id"),
        _us(F.col(ts_col)).alias("ts_us"),
        "event_type",
    )
    zero = F.struct(
        *[F.lit(None).cast("long").alias(f"t{i}") for i in range(n)]
    )

    def step(acc, x):
        fields = []
        for i, stage in enumerate(stages):
            prev_done = F.lit(True) if i == 0 else acc[f"t{i-1}"].isNotNull()
            if i > 0:
                prev_done = prev_done & (x["ts_us"] > acc[f"t{i-1}"])
            take = (
                acc[f"t{i}"].isNull()
                & (x["event_type"] == F.lit(stage))
                & prev_done
            )
            fields.append(
                F.when(take, x["ts_us"]).otherwise(acc[f"t{i}"]).alias(f"t{i}")
            )
        return F.struct(*fields)

    folded = (
        ev.groupBy("user_id")
        .agg(
            F.aggregate(
                F.array_sort(F.collect_list(F.struct("ts_us", "event_type"))),
                zero,
                step,
            ).alias("f")
        )
    )
    # deepest non-null t_i wins (t_i non-null implies t_{i-1} non-null)
    stage_reached = F.lit(0)
    for i in range(n):
        stage_reached = F.when(
            F.col(f"f.t{i}").isNotNull(), i + 1
        ).otherwise(stage_reached)
    return folded.select(
        "user_id",
        stage_reached.alias("stage_reached"),
        *[F.col(f"f.t{i}").alias(f"t_stage{i + 1}_us") for i in range(n)],
    )


def cohort_retention(
    events: DataFrame,
    user_col: str = "user_id",
    ts_col: str = "ts",
) -> DataFrame:
    """Classic cohort/retention grid: users grouped by first-active day,
    counted on each later active day offset.

    Two shuffles: first-day per user, then (cohort_day, offset) counts —
    the user→cohort attach is a plain key join that co-partitions with
    the first aggregate. Returns (cohort_day, day_offset, n_users).
    """
    days = events.select(
        F.col(user_col).alias("user_id"),
        F.to_date(F.col(ts_col)).alias("day"),
    ).distinct()
    first = days.groupBy("user_id").agg(F.min("day").alias("cohort_day"))
    return (
        days.join(first, "user_id")
        .groupBy(
            F.col("cohort_day").cast("string").alias("cohort_day"),
            F.datediff("day", "cohort_day").alias("day_offset"),
        )
        .agg(F.count(F.lit(1)).alias("n_users"))
        .orderBy("cohort_day", "day_offset")
    )


def top_transitions(events: DataFrame, k: int = 20) -> DataFrame:
    """Path mining: the k most common consecutive event-type transitions
    (src → dst) across all users — funnel DISCOVERY, where ``funnel``
    checks a known sequence. One shuffle+sort per user key (the lead
    window), then a map-side-combined global count; deterministic order
    (n desc, src, dst). At 100 TB the per-user sort is the same exchange
    ``sessionize``/``asof_join`` already pay — no per-user arrays are
    materialized."""
    w = Window.partitionBy("user_id").orderBy("ts", "event_id")
    pairs = events.select(
        F.col("event_type").alias("src"),
        F.lead("event_type").over(w).alias("dst"),
    ).filter(F.col("dst").isNotNull())
    return (
        pairs.groupBy("src", "dst")
        .agg(F.count(F.lit(1)).alias("n"))
        .orderBy(F.desc("n"), "src", "dst")
        .limit(k)
    )


def hourly_anomalies(
    events: DataFrame, trailing: int = 24, z_thresh: float = 3.0
) -> DataFrame:
    """Volume-anomaly detection: hourly event counts per type scored
    against the trailing ``trailing``-row mean/stddev (ROWS window, so
    gaps don't stretch the baseline), flagged at |z| ≥ ``z_thresh``.
    Two shuffles total (hour rollup, per-type window); z is rounded to
    4 decimals and the flag is computed on the ROUNDED value so the
    cut is engine-portable."""
    hourly = (
        events.groupBy(
            F.date_trunc("hour", "ts").alias("hour"), "event_type"
        )
        .agg(F.count(F.lit(1)).alias("n"))
    )
    w = (
        Window.partitionBy("event_type")
        .orderBy("hour")
        .rowsBetween(-trailing, -1)
    )
    mu = F.avg("n").over(w)
    sd = F.stddev_samp(F.col("n").cast("double")).over(w)
    z = F.round(
        F.when(sd > 0, (F.col("n") - mu) / sd), 4
    )
    return hourly.select(
        "hour",
        "event_type",
        "n",
        z.alias("z"),
        (F.abs(z) >= F.lit(z_thresh)).alias("is_anomaly"),
    )


def props_rollup(events: DataFrame, json_col: str = "props") -> DataFrame:
    """Extract the numeric ``k`` property from the JSON blob and roll it
    up per event type: (event_type, n_events, sum_k, n_with_k).
    ``get_json_object`` is a JVM expression — the parse stays inside
    whole-stage codegen; the rollup is one map-side-combined groupBy.
    """
    k = F.get_json_object(F.col(json_col), "$.k").cast("long")
    return (
        events.select("event_type", k.alias("k"))
        .groupBy("event_type")
        .agg(
            F.count(F.lit(1)).alias("n_events"),
            F.sum("k").alias("sum_k"),
            F.count("k").alias("n_with_k"),
        )
        .orderBy("event_type")
    )


def key_skew_profile(
    df: DataFrame, group_col: str = "event_type", key_col: str = "user_id"
) -> DataFrame:
    """Shuffle-key skew diagnostics: per `group_col`, the distribution of
    per-`key_col` row counts — the numbers that decide salting factors and
    AQE skew thresholds BEFORE launching a 100 TB join on that key.

    Reports n_keys, total rows, max key count, exact p50/p90/p99 of the
    per-key counts, and the hottest key's traffic share in ppm. Two
    map-side-combined aggregates: one on (group, key), one on group —
    the profile itself can never be the skewed stage.

    The hot-key share is the direct input to the salting decision: a key
    holding >1/parallelism of the traffic stalls its reducer; this query
    is how the engine's own salted operators (inverted_index,
    stratified_sample) pick their factors."""
    per_key = df.groupBy(
        F.col(group_col).alias("grp"), F.col(key_col).alias("key")
    ).agg(F.count(F.lit(1)).alias("cnt"))
    pct = F.percentile(
        F.col("cnt"), F.array(*[F.lit(p) for p in (0.5, 0.9, 0.99)])
    )
    top = F.max(F.struct("cnt", "key"))
    return (
        per_key.groupBy("grp")
        .agg(
            F.count(F.lit(1)).cast("long").alias("n_keys"),
            F.sum("cnt").alias("total"),
            F.max("cnt").alias("max_cnt"),
            pct.alias("_p"),
            top.alias("_top"),
        )
        .select(
            "grp",
            "n_keys",
            "total",
            "max_cnt",
            F.round(F.element_at("_p", 1), 6).alias("p50_cnt"),
            F.round(F.element_at("_p", 2), 6).alias("p90_cnt"),
            F.round(F.element_at("_p", 3), 6).alias("p99_cnt"),
            F.col("_top.key").alias("top_key"),
            F.round(
                F.col("_top.cnt").cast("double")
                / F.col("total").cast("double")
                * F.lit(1000000.0)
            ).cast("long").alias("top_share_ppm"),
        )
        .orderBy("grp")
    )
