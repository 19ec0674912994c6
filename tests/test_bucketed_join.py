"""Bucketed tables: the co-located join must run exchange-free and
produce exactly the plain join's rows."""

from __future__ import annotations

import pyspark.sql.functions as F
import pytest

from webindex_spark.sources.bucketed import write_bucketed


@pytest.fixture()
def no_broadcast(spark):
    old = spark.conf.get("spark.sql.autoBroadcastJoinThreshold")
    spark.conf.set("spark.sql.autoBroadcastJoinThreshold", "-1")
    yield
    spark.conf.set("spark.sql.autoBroadcastJoinThreshold", old)


def test_bucketed_join_is_exchange_free_and_exact(spark, no_broadcast, tmp_path):
    spark.sql("DROP TABLE IF EXISTS bj_orders")
    spark.sql("DROP TABLE IF EXISTS bj_lineitem")
    sf = "/root/testdata/sf0.001"
    orders = spark.read.parquet(f"{sf}/orders.parquet")
    lineitem = spark.read.parquet(f"{sf}/lineitem.parquet")
    write_bucketed(orders, "bj_orders", "o_orderkey", 8)
    write_bucketed(lineitem, "bj_lineitem", "l_orderkey", 8)

    bo, bl = spark.table("bj_orders"), spark.table("bj_lineitem")
    j = bo.join(bl, bo.o_orderkey == bl.l_orderkey).select(
        "o_orderkey", "l_partkey", "l_quantity", "o_totalprice"
    )
    plan = j._jdf.queryExecution().executedPlan().toString()
    # either shuffle-join strategy is fine (the session prefers shuffled
    # hash, guide §3.1); the point of bucketing is the NEXT assert
    assert "SortMergeJoin" in plan or "ShuffledHashJoin" in plan
    # the whole point: neither side shuffles (bucketed layout satisfies
    # the join's distribution requirement at read time)
    assert "Exchange hashpartitioning" not in plan, plan

    base = orders.join(lineitem, orders.o_orderkey == lineitem.l_orderkey).select(
        "o_orderkey", "l_partkey", "l_quantity", "o_totalprice"
    )
    assert sorted(map(tuple, j.collect())) == sorted(map(tuple, base.collect()))

    # aggregation on the bucket key also skips its exchange
    agg = bl.groupBy("l_orderkey").agg(F.sum("l_quantity").alias("q"))
    aplan = agg._jdf.queryExecution().executedPlan().toString()
    assert "Exchange hashpartitioning" not in aplan, aplan

    spark.sql("DROP TABLE IF EXISTS bj_orders")
    spark.sql("DROP TABLE IF EXISTS bj_lineitem")
