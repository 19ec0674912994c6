"""Structured Streaming rollup (SURVEY.md §2.9; batch twin: q_event_rollup).

The reference has no event-time semantics (T8 in SURVEY.md — Fluo
notifications play the streaming role), so this module exists for target
coverage: a watermarked, windowed aggregation over an events stream, plus
a stateful per-key counter via ``applyInPandasWithState`` mirroring the
UriInfo combine-queue semantics (T3) for deployments that want the
continuously-running form instead of snapshot batch.
"""

from __future__ import annotations

import pandas as pd
import pyspark.sql.functions as F
import pyspark.sql.types as T
from pyspark.sql import DataFrame
from pyspark.sql.streaming.state import GroupState, GroupStateTimeout

EVENT_SCHEMA = (
    "event_id long, ts timestamp, user_id long, event_type string, "
    "value double, props string"
)


def windowed_rollup(events: DataFrame, window: str = "1 hour",
                    watermark: str = "2 hours") -> DataFrame:
    """Per event_type tumbling-window counts/sums with late-data handling.

    ``sum_value`` is accumulated as integer thousandths (round(v*1000)
    summed as long, divided back on output) — the event_rollup idiom:
    cross-micro-batch state merges happen in arbitrary order, and a raw
    double sum would be merge-order-dependent in the last ulps.  Exact
    whenever values carry <= 3 decimal places."""
    return (
        events.withWatermark("ts", watermark)
        .groupBy(F.window("ts", window).alias("w"), F.col("event_type"))
        .agg(
            F.count(F.lit(1)).alias("n_events"),
            F.sum(F.round(F.col("value") * 1000).cast("long")).alias("__sv"),
        )
        .select(
            F.col("w.start").alias("window_start"),
            "event_type", "n_events",
            (F.col("__sv") / 1000.0).alias("sum_value"),
        )
    )


def session_rollup(events: DataFrame, gap: str = "30 minutes",
                   watermark: str = "2 hours") -> DataFrame:
    """Per-user SESSION-window aggregation — Spark's native
    ``session_window`` (gap-merged, watermark-closed) as the streaming
    twin of operators/sessions.py's batch lag/running-sum formulation.
    In append mode a session row is emitted once the watermark passes
    its end (last event + gap), carrying totals merged across every
    micro-batch that touched the session.  ``value`` must be pre-scaled
    to integer units by the caller (the event_rollup idiom) so
    cross-batch merge order cannot perturb the sum."""
    return (
        events.withWatermark("ts", watermark)
        .groupBy("user_id", F.session_window("ts", gap).alias("w"))
        .agg(
            F.count(F.lit(1)).alias("n_events"),
            F.min("ts").alias("first_ts"),
            F.max("ts").alias("last_ts"),
            F.sum("value").alias("sum_value"),
        )
        .select("user_id", "n_events", "first_ts", "last_ts", "sum_value")
    )


def purchase_view_join(
    events: DataFrame,
    lookback: str = "1 hour",
    watermark: str = "2 hours",
) -> DataFrame:
    """Stream-stream interval self-join: each purchase matched to the
    same user's views in the preceding ``lookback`` — Spark's native
    watermarked stream-stream join (both sides carry a watermark; the
    event-time range predicate bounds join state so view rows are
    evicted once no future purchase can reach back to them).

    Emits one row per (purchase, view) match in append mode.  With the
    watermark delay strictly greater than ``lookback`` plus the
    out-of-orderness of the source, NO match is lost to state eviction
    — the inner join's emitted set equals the batch interval join
    (operators/asof.interval_join), which is what the oracle certifies.

    ``vs`` is the view's value pre-scaled to integer thousandths (the
    event_rollup idiom) so downstream sums are order-independent.
    """
    p = (
        events.where(F.col("event_type") == "purchase")
        .select("user_id", "event_id", "ts")
        .withWatermark("ts", watermark)
    )
    v = (
        events.where(F.col("event_type") == "view")
        .select(
            F.col("user_id").alias("v_user_id"),
            F.col("event_id").alias("vid"),
            F.col("ts").alias("vts"),
            F.round(F.col("value") * 1000).cast("long").alias("vs"),
        )
        .withWatermark("vts", watermark)
    )
    return p.join(
        v,
        F.expr(
            "user_id = v_user_id AND "
            f"vts >= ts - interval {lookback} AND vts <= ts"
        ),
        "inner",
    ).select("user_id", "event_id", "ts", "vid", "vts", "vs")


def dedup_stream(
    events: DataFrame,
    keys: list[str] | None = None,
    watermark: str = "30 days",
) -> DataFrame:
    """Streaming exactly-once-per-key dedup:
    ``dropDuplicatesWithinWatermark`` keeps per-key state only until
    the watermark passes the FIRST occurrence plus the delay — bounded
    state, unlike plain ``dropDuplicates`` on a stream (which retains
    every key forever).  A duplicate is guaranteed dropped iff it
    arrives within ``watermark`` of the first copy's event time; size
    the delay above the source's duplication lag (the replay harness
    proves its own bound the same way stream_join does)."""
    return events.withWatermark("ts", watermark).dropDuplicatesWithinWatermark(
        keys or ["event_id"]
    )


_STATE_SCHEMA = T.StructType([T.StructField("total", T.LongType())])
_OUT_SCHEMA = T.StructType(
    [
        T.StructField("event_type", T.StringType()),
        T.StructField("total", T.LongType()),
    ]
)


def running_counts(events: DataFrame) -> DataFrame:
    """Stateful running count per event_type — the streaming twin of the
    UriInfo combine queue (sum deltas into persistent per-key state)."""

    def update(key, pdfs, state: GroupState):
        delta = sum(len(pdf) for pdf in pdfs)
        total = (state.get[0] if state.exists else 0) + delta
        state.update((total,))
        yield pd.DataFrame({"event_type": [key[0]], "total": [total]})

    return (
        events.groupBy("event_type")
        .applyInPandasWithState(
            update, _OUT_SCHEMA, _STATE_SCHEMA, "update",
            GroupStateTimeout.NoTimeout,
        )
    )
