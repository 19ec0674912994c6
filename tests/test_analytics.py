"""Behavioral analytics: cohort retention and sequential funnels.

Python oracles: dict/set recomputation of the cohort grid; a direct
recurrence replay for the funnel, including broken chains, pre-stage
events that must not count, and same-timestamp tie resolution.
"""

from __future__ import annotations

import datetime as dt

from webindex_spark.operators.analytics import (
    cohort_retention,
    funnel,
    funnel_summary,
)


def _ts(day, hour=0, minute=0, second=0, micro=0):
    return dt.datetime(2024, 1, day, hour, minute, second, micro)


def test_cohort_retention_grid(spark):
    rows = [
        # user 1: first week of Jan 1 (Mon), active weeks 0, 1, 3
        (1, _ts(1)), (1, _ts(2)), (1, _ts(9)), (1, _ts(23)),
        # user 2: joins week 1, active weeks 0 and 2
        (2, _ts(8)), (2, _ts(24)),
        # user 3: single touch
        (3, _ts(3)),
    ]
    df = spark.createDataFrame(rows, ["user_id", "ts"])
    got = {
        (r["cohort_week"].isoformat(), r["week_offset"]): r["n_users"]
        for r in cohort_retention(df).collect()
    }
    assert got == {
        ("2024-01-01", 0): 2,   # users 1 and 3
        ("2024-01-01", 1): 1,
        ("2024-01-01", 3): 1,
        ("2024-01-08", 0): 1,   # user 2
        ("2024-01-08", 2): 1,
    }


STAGES = ["view", "click", "purchase"]


def test_funnel_sequential_dependency(spark):
    rows = [
        # user 1 completes in order
        (1, _ts(1, 10), "view"), (1, _ts(1, 11), "click"),
        (1, _ts(1, 12), "purchase"),
        # user 2: click BEFORE the first view must not count; no click
        # after the view, so the chain stops at view even though a
        # purchase follows
        (2, _ts(2, 9), "click"), (2, _ts(2, 10), "view"),
        (2, _ts(2, 11), "purchase"),
        # user 3: never views
        (3, _ts(3, 9), "click"), (3, _ts(3, 10), "purchase"),
        # user 4: completes with an early decoy purchase
        (4, _ts(4, 8), "purchase"), (4, _ts(4, 9), "view"),
        (4, _ts(4, 10), "click"), (4, _ts(4, 11), "purchase"),
    ]
    df = spark.createDataFrame(rows, ["user_id", "ts", "event_type"])
    got = {r["user_id"]: (r["t0"], r["t1"], r["t2"]) for r in
           funnel(df, STAGES).collect()}

    HOUR = 3600 * 1_000_000
    t0, t1, t2 = got[1]
    assert t1 - t0 == HOUR and t2 - t1 == HOUR
    assert got[2][0] is not None and got[2][1] is None and got[2][2] is None
    assert got[3] == (None, None, None)
    t0, t1, t2 = got[4]
    assert t1 - t0 == HOUR and t2 - t1 == HOUR  # decoy purchase ignored

    summary = {r["stage"]: (r["n_users"], r["sum_gap_us"]) for r in
               funnel_summary(df, STAGES).collect()}
    assert summary["view"] == (3, 0)
    assert summary["click"] == (2, 2 * 3600 * 1_000_000)
    assert summary["purchase"] == (2, 2 * 3600 * 1_000_000)


def test_funnel_same_microsecond_ties(spark):
    # all three stages at the identical timestamp: earlier stage wins
    # the sort tiebreak, so the whole chain completes at that instant
    t = _ts(5, 12)
    df = spark.createDataFrame(
        [(1, t, "purchase"), (1, t, "click"), (1, t, "view")],
        ["user_id", "ts", "event_type"],
    )
    r = funnel(df, STAGES).collect()[0]
    assert r["t0"] == r["t1"] == r["t2"] is not None
