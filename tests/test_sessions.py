"""Semantic tests for event-sequence analytics (operators/sessions.py);
oracle parity runs through tests/test_entry_contract.py."""

from datetime import datetime

from pyspark.sql import functions as F

from machine_learning_with_spark_streaming_spark.operators.sessions import (
    cohort_retention,
    funnel_reach,
    session_summary,
    sessionize,
)


def _ev(spark, rows):
    return spark.createDataFrame(
        rows, "event_id long, user_id long, event_type string, ts timestamp"
    )


def test_sessionize_gap_splits(spark):
    t = lambda h, m=0: datetime(2024, 1, 1, h, m)
    df = _ev(
        spark,
        [
            (1, 7, "view", t(0)),
            (2, 7, "click", t(0, 30)),   # 30 min gap -> same session
            (3, 7, "view", t(3)),        # 2.5 h gap  -> new session
            (4, 9, "view", t(0)),        # other user independent
        ],
    )
    out = {
        r["event_id"]: r["session_idx"]
        for r in sessionize(df, gap_minutes=60).collect()
    }
    assert out == {1: 0, 2: 0, 3: 1, 4: 0}


def test_session_summary_duration(spark):
    t = lambda h, m=0: datetime(2024, 1, 1, h, m)
    df = _ev(spark, [(1, 7, "a", t(0)), (2, 7, "b", t(0, 45))])
    row = session_summary(df, gap_minutes=60).collect()[0]
    assert row["n_events"] == 2
    assert row["duration_us"] == 45 * 60 * 1_000_000


def test_funnel_requires_stage_order(spark):
    t = lambda h: datetime(2024, 1, 1, h)
    df = _ev(
        spark,
        [
            # user 1: full ordered funnel
            (1, 1, "view", t(1)), (2, 1, "click", t(2)), (3, 1, "purchase", t(3)),
            # user 2: purchase BEFORE click -> reaches click only
            (4, 2, "view", t(1)), (5, 2, "purchase", t(2)), (6, 2, "click", t(3)),
            # user 3: click with no view -> reaches nothing
            (7, 3, "click", t(1)),
        ],
    )
    got = {
        r["stage"]: r["n_users"]
        for r in funnel_reach(df, ["view", "click", "purchase"]).collect()
    }
    assert got == {"view": 2, "click": 2, "purchase": 1}


def test_cohort_retention_offsets(spark):
    # user 5 first active Mon Jan 1 (cohort week), active again 8 days
    # later -> offsets {0, 1}; user 6 appears only in week 0
    df = _ev(
        spark,
        [
            (1, 5, "view", datetime(2024, 1, 1, 12)),
            (2, 5, "view", datetime(2024, 1, 9, 12)),
            (3, 6, "view", datetime(2024, 1, 2, 0)),
        ],
    )
    got = {
        (r["cohort_week_us"], r["week_offset"]): r["n_active_users"]
        for r in cohort_retention(df).collect()
    }
    offsets = sorted(k[1] for k in got)
    assert offsets == [0, 1]
    # week 0: both users active; week 1: only user 5
    assert sum(got.values()) == 3
    assert {got[k] for k in got if k[1] == 0} == {2}
    assert {got[k] for k in got if k[1] == 1} == {1}
    # both users share the same cohort week (week of Jan 1)
    assert len({k[0] for k in got}) == 1
