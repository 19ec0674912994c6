"""Robots gate (north-rule core; SURVEY.md §7.2 M3).

Rules table: ``(host, disallow: array<string>, crawl_delay: double)``.
Disallow entries are path prefixes (the dominant robots.txt idiom); a URL
is blocked when any prefix matches the start of its path.

The rules side is tiny relative to the frontier (one row per host), so the
join is an explicit broadcast: at 100 TB the frontier never shuffles for
robots gating.  The prefix test itself is a higher-order ``exists`` over
the rule array — pure JVM, whole-stage-codegen'd, no UDF.

Hosts with no rules row are allowed with the default crawl delay.
"""

from __future__ import annotations

import pyspark.sql.functions as F
from pyspark.sql import DataFrame

DEFAULT_CRAWL_DELAY = 1.0


def apply_robots(
    frontier: DataFrame,
    robots: DataFrame,
    host_col: str = "host",
    path_col: str = "path",
) -> DataFrame:
    """frontier + (allowed: bool, crawl_delay: double).

    The caller filters on ``allowed``; keeping the column (rather than
    filtering here) lets the metrics layer count robots-blocked URLs per
    partition before dropping them.
    """
    r = robots.select(
        F.col("host").alias("__r_host"),
        F.col("disallow").alias("__r_disallow"),
        F.col("crawl_delay").alias("__r_delay"),
    )
    joined = frontier.join(
        F.broadcast(r), frontier[host_col] == r["__r_host"], "left"
    )
    blocked = F.exists(
        F.coalesce(F.col("__r_disallow"), F.array()),
        lambda p: F.col(path_col).startswith(p),
    )
    return (
        joined.withColumn("allowed", ~F.coalesce(blocked, F.lit(False)))
        .withColumn(
            "crawl_delay", F.coalesce(F.col("__r_delay"), F.lit(DEFAULT_CRAWL_DELAY))
        )
        .drop("__r_host", "__r_disallow", "__r_delay")
    )
