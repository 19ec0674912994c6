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


def test_ewma_matches_python_recurrence(spark):
    from webindex_spark.operators.analytics import ewma_by_key

    rows = [
        # user 1: out-of-order arrival, fold must sort by (ts, event_id)
        (1, _ts(1, 12), 103, 4.0), (1, _ts(1, 10), 101, 2.0),
        (1, _ts(1, 11), 102, 10.0),
        # user 2: single event -> ewma == value
        (2, _ts(2, 9), 201, 7.5),
        # user 3: same-ts tie broken by event_id
        (3, _ts(3, 8), 302, 1.0), (3, _ts(3, 8), 301, 9.0),
    ]
    df = spark.createDataFrame(rows, ["user_id", "ts", "event_id", "value"])
    got = {r["user_id"]: r for r in ewma_by_key(df).collect()}

    def py(vals):
        s = None
        for v in vals:
            sv = round(v * 1000)
            s = sv if s is None else (sv + s) // 2
        return s

    assert got[1]["ewma"] == py([2.0, 10.0, 4.0]) and got[1]["n_events"] == 3
    assert got[2]["ewma"] == 7500 and got[2]["last_v"] == 7500
    assert got[3]["ewma"] == py([9.0, 1.0])       # event_id 301 first


def test_zorder_interleave_and_locality(spark):
    import pyspark.sql.functions as F

    from webindex_spark.functions.zorder import zvalue16

    pts = [(x, y) for x in (0, 1, 5, 255, 1023, 65535)
           for y in (0, 2, 7, 512, 65535)]
    df = spark.createDataFrame(pts, ["x", "y"])
    got = {(r["x"], r["y"]): r["z"] for r in
           df.select("x", "y", zvalue16(F.col("x"), F.col("y")).alias("z")).collect()}

    def py_z(x, y):
        z = 0
        for i in range(16):
            z |= ((x >> i) & 1) << (2 * i)
            z |= ((y >> i) & 1) << (2 * i + 1)
        return z

    for (x, y), z in got.items():
        assert z == py_z(x, y), (x, y)
    # locality: fixing one dimension, the key is monotone in the other
    assert got[(0, 0)] < got[(1, 0)] < got[(5, 0)] < got[(255, 0)]
    assert got[(0, 0)] < got[(0, 2)] < got[(0, 7)] < got[(0, 512)]


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
