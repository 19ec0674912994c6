"""As-of join vs hand-computed expectations: <= tie semantics, no-match
NULLs, per-key independence, and NULL-payload carriage (the struct
marker)."""

from __future__ import annotations

import datetime as dt

from webindex_spark.operators.asof import asof_join

T0 = dt.datetime(2024, 1, 1)


def _t(minutes):
    return T0 + dt.timedelta(minutes=minutes)


def test_asof_basic_and_ties(spark):
    left = spark.createDataFrame(
        [(1, 101, _t(10)), (1, 102, _t(20)), (2, 201, _t(5))],
        ["k", "lid", "ts"],
    )
    right = spark.createDataFrame(
        [(1, 11, _t(10)), (1, 12, _t(15)), (2, 21, _t(6))],
        ["k", "rid", "ts"],
    )
    got = {
        r["lid"]: r["r_rid"]
        for r in asof_join(left, right, ["k"], "ts", ["rid"]).collect()
    }
    # lid=101: right at EXACTLY t=10 matches (<= semantics)
    # lid=102: latest of {10,15} -> 12;  lid=201: right at t=6 is later -> NULL
    assert got == {101: 11, 102: 12, 201: None}


def test_asof_null_payload_rides_along(spark):
    left = spark.createDataFrame([(1, _t(10))], ["k", "ts"])
    right = spark.createDataFrame(
        [(1, None, _t(1)), (1, 7, _t(0))], ["k", "v", "ts"]
    )
    row = asof_join(left, right, ["k"], "ts", ["v"]).first()
    # the t=1 row is the match even though its payload value is NULL —
    # the struct wrapper, not the value, is the ignorenulls marker
    assert row["r_v"] is None and row["r_ts"] == _t(1)


def test_asof_keys_do_not_leak(spark):
    left = spark.createDataFrame([(1, _t(10)), (2, _t(10))], ["k", "ts"])
    right = spark.createDataFrame([(1, 5, _t(1))], ["k", "v", "ts"])
    got = {r["k"]: r["r_v"] for r in asof_join(left, right, ["k"], "ts", ["v"]).collect()}
    assert got == {1: 5, 2: None}


def test_interval_join_bounds_inclusive_and_bucket_edges(spark):
    """Matches exactly [ts - lookback, ts], including rows sitting in
    the predecessor bucket and at both inclusive endpoints."""
    from webindex_spark.operators.asof import interval_join

    W = 3_600_000_000  # 1h in us
    left = spark.createDataFrame([(1, 100, _t(90))], ["k", "lid", "ts"])
    right = spark.createDataFrame(
        [
            (1, 1, _t(30)),            # == ts - 1h exactly -> match
            (1, 2, _t(29, )),          # 61 min before -> no
            (1, 3, _t(90)),            # == ts exactly -> match
            (1, 4, _t(91)),            # after -> no
            (1, 5, _t(45)),            # mid-window, predecessor bucket -> match
            (2, 6, _t(60)),            # other key -> no
        ],
        ["k", "rid", "ts"],
    )
    got = sorted(
        r["r_rid"]
        for r in interval_join(left, right, ["k"], "ts", W).collect()
    )
    assert got == [1, 3, 5]


def test_interval_join_no_nested_loop(spark):
    from webindex_spark.operators.asof import interval_join

    left = spark.createDataFrame([(1, _t(0))], ["k", "ts"])
    right = spark.createDataFrame([(1, 1, _t(0))], ["k", "rid", "ts"])
    plan = interval_join(left, right, ["k"], "ts", 60_000_000)._jdf.queryExecution().executedPlan().toString()
    assert "NestedLoop" not in plan and "Cartesian" not in plan
