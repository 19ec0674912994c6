"""Scan-level optimizations, asserted from the executed plan: predicate
pushdown, column pruning, and partition pruning — the 'free if you stay
declarative' wins the docs claim, made executable."""

from __future__ import annotations

import pyspark.sql.functions as F


def test_filter_and_projection_reach_the_parquet_scan(spark):
    df = spark.read.parquet("/root/testdata/sf0.001/orders.parquet")
    q = df.where(F.col("o_orderkey") < 100).select("o_orderkey", "o_totalprice")
    plan = q._jdf.queryExecution().executedPlan().toString()
    # predicate pushed into the scan, not applied post-hoc only
    assert "PushedFilters: [IsNotNull(o_orderkey), LessThan(o_orderkey,100)]" in plan, plan
    # column pruning: the scan reads 2 columns, not 6
    assert "ReadSchema: struct<o_orderkey:bigint,o_totalprice:double>" in plan, plan


def test_partition_pruning_on_partitioned_layout(spark, tmp_path):
    src = spark.read.parquet("/root/testdata/sf0.001/orders.parquet")
    out = str(tmp_path / "orders_by_status")
    src.write.partitionBy("o_orderstatus").mode("overwrite").parquet(out)
    q = spark.read.parquet(out).where(F.col("o_orderstatus") == "F")
    plan = q._jdf.queryExecution().executedPlan().toString()
    # the status predicate becomes a partition filter (pruned at
    # planning), NOT a data filter
    assert "PartitionFilters" in plan and "o_orderstatus" in plan.split("PushedFilters")[0], plan
    n_f = q.count()
    n_all = src.where(F.col("o_orderstatus") == "F").count()
    assert n_f == n_all and n_f > 0
