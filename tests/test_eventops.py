"""Vectors for eventops: sessionization, as-of join, JSON rollup."""

import datetime as dt

from pyspark.sql import functions as F

from planetiler_openmaptiles_spark.eventops import (
    asof_join,
    props_rollup,
    sessionize,
)

T0 = dt.datetime(2024, 1, 1, 0, 0, 0)


def _ev(spark, rows):
    return spark.createDataFrame(
        [
            (i, T0 + dt.timedelta(seconds=s), u, t, v, p)
            for i, (s, u, t, v, p) in enumerate(rows)
        ],
        "event_id long, ts timestamp, user_id long, event_type string, "
        "value double, props string",
    )


def test_sessionize_gap_semantics(spark):
    # user 1: events at 0s, 10m, 39m59s -> one session (each gap < 30m);
    # then 70m -> second session (gap 30m01s >= 30m).
    # user 2: single event.
    ev = _ev(
        spark,
        [
            (0, 1, "view", 1.0, "{}"),
            (600, 1, "click", 2.0, "{}"),
            (2399, 1, "view", 3.0, "{}"),
            (4200, 1, "error", 4.0, "{}"),
            (0, 2, "view", 9.0, "{}"),
        ],
    )
    got = sessionize(ev, "30 minutes").orderBy(
        "user_id", "session_start_us"
    ).collect()
    assert [(r["user_id"], r["n_events"]) for r in got] == [
        (1, 3),
        (1, 1),
        (2, 1),
    ]
    s1 = got[0]
    assert s1["session_start_us"] == 0 + int(T0.timestamp()) * 1_000_000
    # window end = last event + gap
    assert (
        s1["session_end_us"] - s1["session_start_us"]
        == (2399 + 1800) * 1_000_000
    )
    assert s1["sum_value"] == 6.0
    assert s1["n_types"] == 2


def test_sessionize_exact_gap_merges(spark):
    # Spark session_window merges an event landing EXACTLY gap after the
    # previous one (inclusive bound); one second past the gap splits.
    ev = _ev(spark, [(0, 1, "view", 1.0, "{}"), (1800, 1, "view", 1.0, "{}")])
    assert len(sessionize(ev, "30 minutes").collect()) == 1
    ev2 = _ev(spark, [(0, 1, "view", 1.0, "{}"), (1801, 1, "view", 1.0, "{}")])
    assert len(sessionize(ev2, "30 minutes").collect()) == 2


def test_asof_join_inclusive_and_null(spark):
    ev = _ev(
        spark,
        [
            (0, 1, "error", 10.0, "{}"),   # id 0
            (5, 1, "click", 1.0, "{}"),    # id 1 -> matches id 0
            (9, 1, "error", 20.0, "{}"),   # id 2
            (9, 1, "click", 1.0, "{}"),    # id 3 -> equal ts matches id 2
            (2, 2, "click", 1.0, "{}"),    # id 4 -> no prior error: nulls
            (7, 2, "error", 30.0, "{}"),   # id 5 (after the click)
            (8, 2, "click", 1.0, "{}"),    # id 6 -> matches id 5
        ],
    )
    got = {r["event_id"]: r for r in asof_join(ev, "click", "error").collect()}
    assert set(got) == {1, 3, 4, 6}
    assert got[1]["matched_event_id"] == 0 and got[1]["lag_us"] == 5_000_000
    assert got[3]["matched_event_id"] == 2 and got[3]["lag_us"] == 0
    assert got[4]["matched_event_id"] is None and got[4]["lag_us"] is None
    assert got[6]["matched_event_id"] == 5 and got[6]["matched_value"] == 30.0


def test_asof_join_null_value_not_torn(spark):
    """A matched right event whose value is NULL must be reported whole:
    event_id/ts_us/value all from THAT event, not value carried from an
    older one (per-column ignorenulls carries tear the match)."""
    ev = _ev(
        spark,
        [
            (0, 1, "error", 5.0, "{}"),    # id 0: value 5
            (3, 1, "error", None, "{}"),   # id 1: value NULL (latest error)
            (6, 1, "click", 1.0, "{}"),    # id 2 -> must match id 1 whole
        ],
    )
    got = {r["event_id"]: r for r in asof_join(ev, "click", "error").collect()}
    assert got[2]["matched_event_id"] == 1
    assert (
        got[2]["matched_ts_us"]
        == 3_000_000 + int(T0.timestamp()) * 1_000_000
    )
    assert got[2]["matched_value"] is None


def test_props_rollup(spark):
    ev = _ev(
        spark,
        [
            (0, 1, "click", 1.0, '{"k": 3}'),
            (1, 1, "click", 1.0, '{"k": 7}'),
            (2, 1, "click", 1.0, '{"other": 1}'),
            (3, 1, "view", 1.0, '{"k": 5}'),
        ],
    )
    got = {r["event_type"]: r for r in props_rollup(ev).collect()}
    assert got["click"]["n_events"] == 3
    assert got["click"]["sum_k"] == 10
    assert got["click"]["n_with_k"] == 2
    assert got["view"]["sum_k"] == 5


def test_funnel_ordered_stages(spark):
    from planetiler_openmaptiles_spark.eventops import funnel

    ev = _ev(
        spark,
        [
            # user 1 completes in order
            (0, 1, "view", 0.0, "{}"),
            (1, 1, "click", 0.0, "{}"),
            (2, 1, "error", 0.0, "{}"),
            # user 2: click BEFORE any view -> that click can't count;
            # a later click does
            (0, 2, "click", 0.0, "{}"),
            (1, 2, "view", 0.0, "{}"),
            (5, 2, "click", 0.0, "{}"),
            # user 3: click at the SAME ts as view -> strict > blocks it
            (0, 3, "view", 0.0, "{}"),
            (0, 3, "click", 0.0, "{}"),
            # user 4: only unrelated events -> excluded entirely
            (0, 4, "other", 0.0, "{}"),
        ],
    )
    got = {r["user_id"]: r for r in
           funnel(ev, ["view", "click", "error"]).collect()}
    assert got[1]["stage_reached"] == 3
    assert (got[1]["t_stage1_us"], got[1]["t_stage3_us"])[1] is not None
    assert got[2]["stage_reached"] == 2
    assert got[2]["t_stage2_us"] - got[2]["t_stage1_us"] == 4_000_000
    assert got[3]["stage_reached"] == 1
    assert got[3]["t_stage2_us"] is None
    assert 4 not in got


def test_cohort_retention_grid(spark):
    from planetiler_openmaptiles_spark.eventops import cohort_retention

    ev = _ev(
        spark,
        [
            (0, 1, "view", 0.0, "{}"),                 # day 0
            (86400, 1, "view", 0.0, "{}"),             # day 1
            (86400 + 60, 1, "click", 0.0, "{}"),       # day 1 dup -> distinct
            (86400, 2, "view", 0.0, "{}"),             # user 2 starts day 1
            (3 * 86400, 2, "view", 0.0, "{}"),         # day 3 (offset 2)
        ],
    )
    got = {(r["cohort_day"], r["day_offset"]): r["n_users"]
           for r in cohort_retention(ev).collect()}
    assert got[("2024-01-01", 0)] == 1
    assert got[("2024-01-01", 1)] == 1
    assert got[("2024-01-02", 0)] == 1
    assert got[("2024-01-02", 2)] == 1
    assert len(got) == 4
