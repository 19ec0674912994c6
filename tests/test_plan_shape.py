"""Exchange-count regression gate (VERDICT r6 #6): lock the shuffle
count of the plan shapes this round's optimization established, so a
refactor that silently re-adds an exchange fails a test instead of a
bench round.

Counts are UNIQUE shuffle query stages of the EXECUTED (AQE-final)
plan: the pre-execution plan duplicates shared subtrees (every
reference re-prints the exchange), and at test-toy sizes AQE rewrites
joins to broadcast — so the tests pin auto-broadcast off and read
``ShuffleQueryStage <id>`` ids after running the frame.  Update a
golden deliberately when a plan change is intentional.
"""

from __future__ import annotations

import re

import pyspark.sql.functions as F
import pytest

from webindex_spark.operators import components


def _final_plan(df) -> str:
    df.collect()
    plan = df._jdf.queryExecution().executedPlan().toString()
    # the AQE string carries a trailing "== Initial Plan ==" section
    # whose exchanges never ran; count only the final plan
    return plan.split("== Initial Plan ==")[0]


def _executed_shuffles(df) -> int:
    # real shuffle WRITES only: a ReusedExchange gets its own
    # ShuffleQueryStage id but re-reads another stage's map output
    return len(re.findall(r"\+- Exchange ", _final_plan(df)))


@pytest.fixture()
def no_broadcast(spark):
    old = spark.conf.get("spark.sql.autoBroadcastJoinThreshold")
    spark.conf.set("spark.sql.autoBroadcastJoinThreshold", "-1")
    spark.conf.set("spark.sql.adaptive.autoBroadcastJoinThreshold", "-1")
    yield
    spark.conf.set("spark.sql.autoBroadcastJoinThreshold", old)
    spark.conf.unset("spark.sql.adaptive.autoBroadcastJoinThreshold")


@pytest.fixture()
def edges(spark):
    return spark.range(500).select(
        (F.col("id") % 31).alias("src"), (F.col("id") % 29 + 50).alias("dst")
    )


def test_components_round_is_four_shuffles(spark, edges, no_broadcast):
    """One large-star + small-star round executes exactly 4 unique
    shuffle stages: sym join-side (filter-pushed to dst>src), sym mins
    side, oriented (REUSED by small-star's dedup/mins/join via
    ReusedExchange), and the final (v,_m) distinct.  The r6 shape paid
    ~6 — each small-star consumer re-shuffled the oriented stream."""
    round_df = components._small_star(components._large_star(edges))
    assert _executed_shuffles(round_df) == 4


def test_components_round_catches_an_injected_repartition(
    spark, edges, no_broadcast
):
    """The gate actually bites: the same round with one stray
    repartition() on top shows one more unique shuffle stage."""
    round_df = components._small_star(
        components._large_star(edges)
    ).repartition(7)
    assert _executed_shuffles(round_df) == 5


def test_small_star_reuses_the_orientation_exchange(spark, edges, no_broadcast):
    """The load-bearing half of the round shape: small_star's dedup,
    min-aggregate and join all read ONE oriented repartition — the
    executed plan must carry ReusedExchange nodes for it."""
    round_df = components._small_star(components._large_star(edges))
    plan = _final_plan(round_df)
    assert "ReusedExchange" in plan, plan


def test_table_stats_has_no_sort_aggregate_on_expand(spark):
    """table_stats: the multi-distinct Expand path must stay hash
    aggregated — string min/max in the same grouping stage forced the
    whole expanded stream through SortAggregate (the round-7 4.0->1.6s
    fix)."""
    from webindex_spark.operators.checks import table_stats

    df = spark.range(100).select(
        F.col("id"), (F.col("id") % 7).cast("string").alias("s")
    )
    plan = _final_plan(table_stats(df, ["id", "s"]))
    assert "Expand" in plan, plan
    # a keyless SortAggregate (the min/max pass) needs no Sort; the
    # regression to guard against is a physical Sort operator feeding
    # the expanded stream
    assert "Sort [" not in plan, plan
