"""Gap sessionization vs hand-computed expectations: gap boundaries at
exactly 30 minutes, per-user independence, tie-breaking by event id,
and the exact integer-scaled value sum."""

from __future__ import annotations

import datetime as dt

from webindex_spark.operators.sessions import session_stats, sessionize

T0 = dt.datetime(2024, 1, 1, 0, 0, 0)


def _ev(eid, user, minutes, value=1.0, seconds=0.0):
    return (eid, T0 + dt.timedelta(minutes=minutes, seconds=seconds), user, value)


def _df(spark, rows):
    return spark.createDataFrame(rows, ["event_id", "ts", "user_id", "value"])


def test_gap_boundary_is_strict(spark):
    rows = [
        _ev(1, 1, 0),
        _ev(2, 1, 30),            # exactly 30 min gap -> SAME session (> gap splits)
        _ev(3, 1, 60, seconds=1), # 30 min + 1 s -> new session
        _ev(4, 1, 61),
    ]
    got = {
        r["event_id"]: r["session_seq"]
        for r in sessionize(_df(spark, rows)).collect()
    }
    assert got == {1: 1, 2: 1, 3: 2, 4: 2}


def test_users_independent_and_stats(spark):
    rows = [
        _ev(1, 1, 0, 2.25),
        _ev(2, 1, 10, 1.50),
        _ev(3, 2, 5, 4.00),
        _ev(4, 1, 100, 0.25),
    ]
    out = {
        (r["user_id"], r["session_seq"]): r.asDict()
        for r in session_stats(_df(spark, rows)).collect()
    }
    assert set(out) == {(1, 1), (1, 2), (2, 1)}
    s11 = out[(1, 1)]
    assert s11["n_events"] == 2
    assert s11["duration_us"] == 10 * 60 * 1_000_000
    assert s11["total_value"] == 3.75
    assert out[(1, 2)]["n_events"] == 1
    assert out[(1, 2)]["duration_us"] == 0
    assert out[(2, 1)]["total_value"] == 4.0


def test_same_timestamp_ties_break_by_event_id(spark):
    rows = [_ev(2, 1, 0), _ev(1, 1, 0), _ev(3, 1, 45)]
    got = {
        r["event_id"]: r["session_seq"]
        for r in sessionize(_df(spark, rows)).collect()
    }
    assert got == {1: 1, 2: 1, 3: 2}


def test_native_session_window_matches_batch_rule(spark):
    """Spark's session_window (the streaming lane's operator, here in
    batch mode) splits on the SAME rule as sessionize: delta > gap ends
    a session, delta == gap does not."""
    from pyspark.sql import functions as F

    from webindex_spark.streaming.event_stream import session_rollup

    rows = [
        _ev(1, 1, 0), _ev(2, 1, 30),            # exactly 30 -> same
        _ev(3, 1, 60, seconds=1),               # 30m+1s -> new
        _ev(4, 2, 0),
    ]
    df = _df(spark, rows).select(
        "event_id", F.col("ts").cast("timestamp").alias("ts"), "user_id",
        F.round(F.col("value") * 1000).cast("long").alias("value"),
    )
    native = session_rollup(df).select("user_id", "n_events").collect()
    got = sorted((r["user_id"], r["n_events"]) for r in native)
    batch = (
        session_stats(_df(spark, rows))
        .select("user_id", "n_events")
        .collect()
    )
    assert got == sorted((r["user_id"], r["n_events"]) for r in batch)
    assert got == [(1, 1), (1, 2), (2, 1)]
