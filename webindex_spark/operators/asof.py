"""As-of join — for every left row, the single most recent right row
with ``right.ts <= left.ts`` within the same key group.

Spark has no native ASOF JOIN (DuckDB does — which is exactly what the
oracle twin uses, so the implementation is certified against a real
engine's native semantics).  The scalable formulation is the
union+window trick, NOT a range join:

  1. tag right rows 0 and left rows 1, union them on a common schema
     with the right payload packed into ONE struct column;
  2. one window per key, ordered by (integer-microsecond ts, tag):
     ``last(payload_struct, ignorenulls=True)`` over the unbounded-
     preceding frame carries the latest right payload forward onto
     every subsequent row — right-before-left at equal timestamps gives
     the ``<=`` (not ``<``) match semantics;
  3. keep the left rows, unpack the struct.

Cost: ONE shuffle of |L|+|R| rows to (key)-partitions and a per-key
sort — the same price as the groupBys around it, vs. the O(|L|·|R|)
blow-up of the naive ``theta <=`` join Spark would otherwise plan
(BroadcastNestedLoop / cartesian — the classic range-join trap).
Parallelism is the key count; a pathologically hot key is pre-split by
day exactly like sessions.py documents.

Payload rows pack into a struct so a right column that is legitimately
NULL still rides along (the struct itself is the non-null marker that
``ignorenulls`` keys on).

Determinism: timestamps compare as integer epoch microseconds; callers
must make the right side unique per (key, ts) first (e.g. keep
``max(id)`` per timestamp — the gate does) or ties at identical
timestamps would be window-order dependent.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, Window, functions as F


def asof_join(
    left: DataFrame,
    right: DataFrame,
    on: list[str],
    ts_col: str,
    right_payload: list[str],
    prefix: str = "r_",
) -> DataFrame:
    """All columns of ``left`` plus, for the latest right row at or
    before each left row's timestamp: ``<prefix><payload-col>...`` and
    ``<prefix>ts`` (all NULL when no right row precedes)."""
    us = F.unix_micros(F.col(ts_col).cast("timestamp"))
    # the payload carries the ORIGINAL ts column (type-preserving), the
    # window orders by the integer microsecond projection
    payload = F.struct(
        F.col(ts_col).alias("__rts"), *[F.col(c) for c in right_payload]
    )
    lt = left.withColumn("__us", us).withColumn("__tag", F.lit(1)).withColumn(
        "__p", F.lit(None).cast(
            right.select(payload.alias("__p")).schema["__p"].dataType
        )
    )
    rt = (
        right.select(*on, us.alias("__us"), payload.alias("__p"))
        .withColumn("__tag", F.lit(0))
    )
    # align schemas: right rows carry NULL for every left-only column
    for c in lt.columns:
        if c not in rt.columns:
            rt = rt.withColumn(c, F.lit(None).cast(lt.schema[c].dataType))
    w = (
        Window.partitionBy(*on)
        .orderBy("__us", "__tag")
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    )
    carried = (
        lt.unionByName(rt.select(*lt.columns))
        .withColumn("__m", F.last("__p", ignorenulls=True).over(w))
        .filter(F.col("__tag") == 1)
    )
    return carried.select(
        *left.columns,
        *[F.col(f"__m.{c}").alias(prefix + c) for c in right_payload],
        F.col("__m.__rts").alias(prefix + "ts"),
    )


def interval_join(
    left: DataFrame,
    right: DataFrame,
    on: list[str],
    ts_col: str,
    lookback_us: int,
    prefix: str = "r_",
) -> DataFrame:
    """Inner interval join: every (left, right) pair sharing ``on`` keys
    with ``left.ts - lookback <= right.ts <= left.ts`` (integer
    microseconds, both ends inclusive).  Right columns come back
    ``prefix``-renamed.

    CONTRACT: timestamps must be at or after the epoch (1970-01-01).
    Bucket ids are computed with SQL integer ``div``, which truncates
    toward zero — identical to floor division only for non-negative
    microseconds.  A pre-1970 ts (negative ``unix_micros``) would land
    in the wrong bucket and silently miss matches; shift such data into
    the non-negative range before calling, or widen the bucket math to
    ``(x - pmod(x, w)) / w``.

    Spark plans a naive ``BETWEEN`` theta join as
    BroadcastNestedLoopJoin — quadratic per key group and a
    driver-memory bomb at scale.  This is the standard bucketization
    instead: bucket width == the lookback, right rows keyed by their
    bucket, left rows exploded to the only TWO buckets a match can
    live in (``floor(ts/w)`` and its predecessor), then an EQUI-join on
    (keys, bucket) plus the exact residual filter.  Cost: one 2x
    duplication of the (narrow) left keys and a hash shuffle join —
    the same plan shape as every other keyed join in the engine, AQE
    skew-splittable, never nested-loop."""
    w = int(lookback_us)
    l_us = F.unix_micros(F.col(ts_col).cast("timestamp"))
    r_us = F.unix_micros(F.col(ts_col).cast("timestamp"))
    # bucket ids use integer `div`, never F.floor(x / w): double
    # division misrounds past 2^53, and epoch-microsecond timestamps
    # are already ~2^51 (the priority_sample discipline).  unix_micros
    # of any post-1970 ts is non-negative, where div == floor-div.
    lt = left.withColumn("__lus", l_us).withColumn(
        "__bkt",
        F.explode(
            F.array(
                F.expr(f"__lus div {w}L") - 1,
                F.expr(f"__lus div {w}L"),
            )
        ),
    )
    rt = right.select(
        *on,
        r_us.alias("__rus"),
        *[
            F.col(c).alias(prefix + c)
            for c in right.columns
            if c not in on
        ],
    ).withColumn("__bkt", F.expr(f"__rus div {w}L"))
    return (
        lt.join(rt, [*on, "__bkt"])
        .filter(
            (F.col("__rus") >= F.col("__lus") - F.lit(w))
            & (F.col("__rus") <= F.col("__lus"))
        )
        .drop("__bkt", "__lus", "__rus")
    )
