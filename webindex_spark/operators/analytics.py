"""Event-analytics primitives: cohort retention and sequential funnels.

The crawl's event stream (and any product telemetry riding the same
engine) needs the two classic behavioral rollups no single built-in
expresses:

* :func:`cohort_retention` — users grouped by first-activity week, the
  count still active N weeks later.  Pure relational composition
  (distinct activity grid → per-user minimum → offset rollup).
* :func:`funnel` — ordered multi-stage conversion (stage k counts only
  after stage k-1's timestamp).  The sequential dependency makes this
  a per-user RECURRENCE, not a join: each user's events are collected
  once and a linear in-row fold assigns stage timestamps in event-time
  order — one shuffle, no per-stage self-joins (the relational form
  costs one join per stage and re-shuffles the event table each time).

Scale notes: the funnel fold collects one user's events into a row —
bounded by per-user activity, the same assumption every sessionizer in
this repo already makes; a per-user event cap upstream is the guard if
a bot user can grow unbounded.  All timestamps fold as integer
microseconds; ties at the same microsecond resolve by stage order
(earlier stage first), which the oracle reproduces.
"""

from __future__ import annotations

import pyspark.sql.functions as F
from pyspark.sql import DataFrame


def cohort_retention(
    events: DataFrame,
    user_col: str = "user_id",
    ts_col: str = "ts",
) -> DataFrame:
    """``(cohort_week, week_offset, n_users)`` — users active in the
    week ``cohort_week + 7*week_offset`` among those whose FIRST
    activity fell in ``cohort_week`` (ISO weeks, Monday start, in both
    engines).  The (user, week) grid is distinct, so the final count is
    a plain ``count(*)`` — no count-distinct shuffle."""
    wk = F.date_trunc("week", F.col(ts_col)).cast("date")
    grid = (
        events.select(F.col(user_col).alias("u"), wk.alias("wk")).distinct()
    )
    first = grid.groupBy("u").agg(F.min("wk").alias("cohort_week"))
    return (
        grid.join(first, "u")
        .select(
            "cohort_week",
            (F.datediff(F.col("wk"), F.col("cohort_week")) / 7)
            .cast("long")
            .alias("week_offset"),
        )
        .groupBy("cohort_week", "week_offset")
        .agg(F.count(F.lit(1)).cast("long").alias("n_users"))
    )


def funnel(
    events: DataFrame,
    stages: list[str],
    user_col: str = "user_id",
    ts_col: str = "ts",
    type_col: str = "event_type",
) -> DataFrame:
    """Per-user sequential funnel: one row per user with each stage's
    conversion timestamp (integer µs; null once the chain breaks).
    Stage k's timestamp is the user's earliest stage-k event at or
    after stage k-1's timestamp.

    One shuffle: events pre-filtered to funnel stages, collected per
    user as (µs, stage_idx) structs, sorted in-row, folded linearly —
    the stage chain is a recurrence, so the fold replaces the
    one-self-join-per-stage relational plan.
    """
    n = len(stages)
    idx = F.lit(None).cast("int")
    for i, s in reversed(list(enumerate(stages))):
        idx = F.when(F.col(type_col) == s, F.lit(i)).otherwise(idx)
    ev = events.select(
        F.col(user_col).alias("u"),
        F.unix_micros(F.col(ts_col).cast("timestamp")).alias("us"),
        idx.alias("si"),
    ).where(F.col("si").isNotNull())
    collected = ev.groupBy("u").agg(
        F.array_sort(
            F.collect_list(F.struct(F.col("us"), F.col("si")))
        ).alias("evs")
    )
    nul = F.lit(None).cast("long")
    init = F.struct(*[nul.alias(f"t{i}") for i in range(n)])

    def step(acc, e):
        fields = []
        for i in range(n):
            t = acc[f"t{i}"]
            if i == 0:
                cond = t.isNull() & (e["si"] == 0)
            else:
                cond = (
                    t.isNull()
                    & (e["si"] == i)
                    & acc[f"t{i - 1}"].isNotNull()
                )
            fields.append(F.when(cond, e["us"]).otherwise(t).alias(f"t{i}"))
        return F.struct(*fields)

    folded = collected.select(
        F.col("u").alias(user_col), F.aggregate("evs", init, step).alias("f")
    )
    return folded.select(
        user_col, *[F.col(f"f.t{i}").alias(f"t{i}") for i in range(n)]
    )


def ewma_by_key(
    events: DataFrame,
    key_col: str = "user_id",
    ts_col: str = "ts",
    value_col: str = "value",
    order_tiebreak: str = "event_id",
    p: int = 1,
    q: int = 2,
    scale: int = 1000,
) -> DataFrame:
    """Per-key exponentially weighted moving average, integer
    fixed-point: ``s_i = (p·v_i + (q-p)·s_(i-1)) div q`` with
    ``v_i = round(value·scale)`` — the decayed host-latency /
    quality-score recurrence a crawl scheduler keeps per host.

    A recurrence, so no window function expresses it; like
    :func:`funnel` it folds in-row: ONE shuffle collects each key's
    (µs, tiebreak, v) structs, an in-row sort + linear fold runs the
    recurrence.  Integer div each step ⇒ bit-identical across engines
    and replayable by the oracle (float ``alpha`` powers would drift).
    The first observation initializes ``s = v``.

    Returns ``(key, n_events, last_v, ewma)`` with ``ewma`` still in
    scaled integer units (callers divide by ``scale`` for display).
    """
    ev = events.select(
        F.col(key_col).alias("k"),
        F.unix_micros(F.col(ts_col).cast("timestamp")).alias("us"),
        F.col(order_tiebreak).alias("tb"),
        F.round(F.col(value_col) * scale).cast("long").alias("v"),
    )
    collected = ev.groupBy("k").agg(
        F.array_sort(
            F.collect_list(F.struct(F.col("us"), F.col("tb"), F.col("v")))
        ).alias("evs")
    )
    nul = F.lit(None).cast("long")
    init = F.struct(nul.alias("s"), nul.alias("last"), F.lit(0).cast("long").alias("n"))

    def step(acc, e):
        nxt = F.when(acc["s"].isNull(), e["v"]).otherwise(
            _floor_div(e["v"] * p + acc["s"] * (q - p), q)
        )
        return F.struct(
            nxt.alias("s"), e["v"].alias("last"), (acc["n"] + 1).alias("n")
        )

    folded = collected.select(
        F.col("k").alias(key_col), F.aggregate("evs", init, step).alias("f")
    )
    return folded.select(
        key_col,
        F.col("f.n").alias("n_events"),
        F.col("f.last").alias("last_v"),
        F.col("f.s").alias("ewma"),
    )


def _floor_div(num, den: int):
    """Exact FLOOR int64 division as a column expression: subtracting
    the positive pmod makes the numerator an exact multiple of ``den``,
    so the double division is exact for any |num| < 2^52.  Floor (not
    truncate) matches DuckDB's ``//`` on negatives too."""
    return ((num - F.pmod(num, F.lit(den))) / den).cast("long")


def funnel_summary(
    events: DataFrame,
    stages: list[str],
    user_col: str = "user_id",
    ts_col: str = "ts",
    type_col: str = "event_type",
) -> DataFrame:
    """One row per stage: users reaching it + total µs spent converting
    from the previous stage (integer-exact, order-free sums)."""
    # one scalar aggregate per stage over the same per-user table —
    # materialize it once (tiny: one row per funnel-active user)
    per = funnel(events, stages, user_col, ts_col, type_col).localCheckpoint(
        eager=True
    )
    rows = []
    for i, s in enumerate(stages):
        gap = (
            F.sum(F.col(f"t{i}") - F.col(f"t{i - 1}")) if i else F.lit(0)
        )
        rows.append(
            per.agg(
                F.lit(i).cast("int").alias("stage_idx"),
                F.lit(s).alias("stage"),
                F.count(F.col(f"t{i}")).cast("long").alias("n_users"),
                F.coalesce(gap, F.lit(0)).cast("long").alias("sum_gap_us"),
            )
        )
    out = rows[0]
    for r in rows[1:]:
        out = out.unionAll(r)
    return out
