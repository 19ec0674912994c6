"""Driver contract for the spark-graft builder (PySpark target).

``entry(spark)`` runs the flagship batch index build (SURVEY.md §3.1) on
sf0.1; ``queries()``/``oracle_sql()`` expose the operator suite from
SURVEY.md §2 with DuckDB oracles (see webindex_spark/plans/crawl_queries.py
for the derivation and the column-aliasing/determinism rules).
"""

from __future__ import annotations

from collections.abc import Callable

from pyspark.sql import DataFrame, SparkSession

from webindex_spark.plans.crawl_queries import QUERIES


def entry(spark: SparkSession) -> DataFrame:
    """Flagship query on /root/testdata/sf0.1: derive the link graph,
    build the full rank index, return the sorted KV rows (driver checks
    rows > 0 and schema stability).  sf0.1 — the same scale bench.py
    runs — so the smoke check exercises the real partition counts, not
    a 2k-row toy."""
    from webindex_spark.plans import crawl_queries as cq
    from webindex_spark.operators import index_batch

    sf_dir = "/root/testdata/sf0.1"
    uri_counts = cq.uri_counts_df(spark, sf_dir)
    domain_counts = index_batch.create_domain_map(uri_counts)
    enc = uri_counts
    import pyspark.sql.functions as F

    from webindex_spark.functions.spark_udfs import rev_encode, uri_rev_domain_col

    rank_rows = enc.select(
        F.concat(
            F.lit("d:"),
            uri_rev_domain_col("uri"),
            F.lit(":"),
            rev_encode(F.col("links_to")),
            F.lit(":"),
            F.col("uri"),
        ).alias("row"),
        F.lit("rank").alias("cf"),
        F.lit("").alias("cq"),
        F.col("links_to").cast("string").alias("v"),
    )
    domain_rows = domain_counts.select(
        F.concat(F.lit("d:"), F.col("rev_domain")).alias("row"),
        F.lit("domain").alias("cf"),
        F.lit("pagecount").alias("cq"),
        F.col("pagecount").cast("string").alias("v"),
    )
    return rank_rows.unionByName(domain_rows).orderBy("row", "cf", "cq")


def queries() -> dict[str, Callable[[SparkSession, str], DataFrame]]:
    return {name: fn for name, (fn, _sql) in QUERIES.items()}


def oracle_sql() -> dict[str, str]:
    return {name: sql for name, (_fn, sql) in QUERIES.items() if sql is not None}
