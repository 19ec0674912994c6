"""Engine-management operators: table statistics and declarative data
quality constraints.

Every warehouse the reference's index feeds needs the two ANALYZE-class
passes an engine is expected to own:

* :func:`table_stats` — per-column min/max/null-count/distinct-count
  (the CBO statistics a cost-based planner and a file-skipping layout
  both feed on).  One aggregate pass over the table; all columns'
  accumulators fold in the same partial-agg pipeline, so the scan
  happens ONCE regardless of column count.
* :func:`run_checks` — deequ-style constraint suite evaluated in one
  aggregate pass: each declarative check compiles to a conditional
  count, so N constraints cost one scan, not N.  Referential checks
  (foreign key coverage) are the exception — each needs one anti-join,
  broadcast when the parent side is dimension-sized.

Both return compact result tables (one row per column / per check) —
the shape a scheduler records per partition per day at 100 TB.
"""

from __future__ import annotations

import pyspark.sql.functions as F
from pyspark.sql import DataFrame


def table_stats(df: DataFrame, columns: list[str] | None = None) -> DataFrame:
    """One row per column: ``(column, n_rows, n_null, n_distinct,
    min_str, max_str)`` — min/max rendered as strings so heterogeneous
    column types fit one result table (the ANALYZE output shape).
    Exact distinct counts (the oracle needs determinism); swap in
    approx_count_distinct at 100 TB where ±2% is fine — same plan
    shape, noted here rather than silently approximated."""
    cols = columns or df.columns
    # TWO aggregate passes instead of one, deliberately: mixing the
    # multi-column countDistincts (an Expand + grouped aggregate) with
    # min/max over STRING columns forces the whole expanded stream
    # through SortAggregate (string-buffered min/max is not hash-agg
    # capable), i.e. a full sort of rows × (n_cols+1) on a 7-part key.
    # Split, the distinct pass stays a pure HashAggregate over the
    # expanded keys and the min/max/null pass is a single-group
    # aggregate that needs no sort at all; the two 1-row results
    # cross-join for free.
    nd = df.agg(
        *[F.countDistinct(F.col(c)).alias(f"__nd_{c}") for c in cols]
    )
    aggs = [F.count(F.lit(1)).cast("long").alias("n_rows")]
    for c in cols:
        aggs += [
            F.sum(F.col(c).isNull().cast("long")).alias(f"__null_{c}"),
            F.min(F.col(c)).cast("string").alias(f"__min_{c}"),
            F.max(F.col(c)).cast("string").alias(f"__max_{c}"),
        ]
    wide = df.agg(*aggs).crossJoin(nd)
    rows = F.array(
        *[
            F.struct(
                F.lit(c).alias("column"),
                F.col("n_rows").alias("n_rows"),
                F.col(f"__null_{c}").cast("long").alias("n_null"),
                F.col(f"__nd_{c}").cast("long").alias("n_distinct"),
                F.col(f"__min_{c}").alias("min_str"),
                F.col(f"__max_{c}").alias("max_str"),
            )
            for c in cols
        ]
    )
    return wide.select(F.explode(rows).alias("r")).select("r.*")


def run_checks(df: DataFrame, checks: list[tuple[str, str]]) -> DataFrame:
    """Evaluate ``(name, predicate_sql)`` constraints in ONE aggregate
    pass: each check reports the number of VIOLATING rows (predicate
    false or null) and a pass flag.  Example::

        run_checks(orders, [
            ("key_not_null", "o_orderkey IS NOT NULL"),
            ("price_positive", "o_totalprice > 0"),
        ])
    """
    aggs = [F.count(F.lit(1)).cast("long").alias("n_rows")]
    for name, pred in checks:
        aggs.append(
            F.sum(
                F.when(F.expr(pred), F.lit(0)).otherwise(F.lit(1))
            ).cast("long").alias(f"__v_{name}")
        )
    wide = df.agg(*aggs)
    rows = F.array(
        *[
            F.struct(
                F.lit(name).alias("check"),
                F.col("n_rows").alias("n_rows"),
                F.col(f"__v_{name}").alias("n_violations"),
                (F.col(f"__v_{name}") == 0).alias("passed"),
            )
            for name, _ in checks
        ]
    )
    return wide.select(F.explode(rows).alias("r")).select("r.*")


def fk_coverage(
    child: DataFrame, child_key: str, parent: DataFrame, parent_key: str
) -> DataFrame:
    """Referential-integrity check: one row ``(n_child, n_orphans,
    passed)`` — child keys missing from the parent, via a left-anti
    join (broadcast the parent when it is dimension-sized; Spark/AQE
    picks that up from size estimates)."""
    orphans = (
        child.select(F.col(child_key).alias("k"))
        .join(
            parent.select(F.col(parent_key).alias("k")).distinct(),
            "k",
            "left_anti",
        )
        .agg(F.count(F.lit(1)).cast("long").alias("n_orphans"))
    )
    total = child.agg(F.count(F.lit(1)).cast("long").alias("n_child"))
    return total.crossJoin(orphans).select(
        "n_child", "n_orphans", (F.col("n_orphans") == 0).alias("passed")
    )
