"""Gap-based sessionization over an event stream — the batch twin of
the streaming lane's stateful session windows.

An event belongs to the same session as its predecessor (per user) iff
the time gap is <= ``gap``; otherwise it starts a new session.  The
standard two-window formulation: a lag-diff flag marks session starts,
a running sum of flags numbers the sessions — both windows keyed by
user, so parallelism is the user count and no global window appears.

Gap comparison uses integer epoch MICROSECONDS (``unix_micros`` here,
``epoch_us`` in the DuckDB twin) — never float seconds, so the
boundary decision is bit-exact across engines.  Aggregates sum
``value`` integer-scaled (the event_rollup idiom: round(value*1000) as
long, summed exactly, divided back), because a straight double sum
depends on shuffle arrival order.

Scale posture: per-user windows partition cleanly; a pathological
power user concentrates one partition — the streaming lane
(streaming/event_stream.py) is the answer for unbounded per-key state,
and a batch salt-by-day pre-split is the usual mitigation.  Ordering
ties (same user, same timestamp) are broken by event id so the session
numbering is deterministic.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, Window, functions as F


def sessionize(
    events: DataFrame,
    user_col: str = "user_id",
    ts_col: str = "ts",
    id_col: str = "event_id",
    gap_minutes: int = 30,
) -> DataFrame:
    """Per-event session labels: adds ``session_seq`` (1-based per-user
    session number) to every event.  Deterministic: ordering is
    (ts, event id), gap compared in integer microseconds."""
    gap_us = gap_minutes * 60_000_000
    # parquet timestamps load as TIMESTAMP_NTZ; the engine session runs
    # UTC (session.py), so the cast keeps wall clock == epoch and
    # matches DuckDB's epoch_us over the same naive values
    us = F.unix_micros(F.col(ts_col).cast("timestamp"))
    w = Window.partitionBy(user_col).orderBy(us.asc(), F.col(id_col).asc())
    is_start = F.when(
        F.lag(us).over(w).isNull() | ((us - F.lag(us).over(w)) > gap_us),
        F.lit(1),
    ).otherwise(F.lit(0))
    return events.withColumn(
        "session_seq",
        F.sum(is_start).over(
            w.rowsBetween(Window.unboundedPreceding, Window.currentRow)
        ).cast("long"),
    )


def session_stats(
    events: DataFrame,
    user_col: str = "user_id",
    ts_col: str = "ts",
    id_col: str = "event_id",
    gap_minutes: int = 30,
) -> DataFrame:
    """Per-session rollup: ``(user, session_seq, n_events, first_ts,
    last_ts, duration_us, total_value)``.  ``total_value`` sums
    integer-scaled (exact, order-free) and divides back to double."""
    labeled = sessionize(events, user_col, ts_col, id_col, gap_minutes)
    return labeled.groupBy(user_col, "session_seq").agg(
        F.count(F.lit(1)).alias("n_events"),
        F.min(ts_col).alias("first_ts"),
        F.max(ts_col).alias("last_ts"),
        (
            F.unix_micros(F.max(ts_col).cast("timestamp"))
            - F.unix_micros(F.min(ts_col).cast("timestamp"))
        )
        .cast("long")
        .alias("duration_us"),
        (F.sum(F.round(F.col("value") * 1000).cast("long")) / 1000.0)
        .alias("total_value"),
    )
