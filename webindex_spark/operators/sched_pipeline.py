"""Fused frontier-scheduling pipeline: one candidate exchange, reused.

The round-1 composite (seen.filter_unseen -> robots.apply_robots ->
politeness.schedule) was plan-correct stage by stage but paid THREE
shuffle exchanges of frontier-sized data:

  1. the exact-tier anti-join shuffled the maybe-seen slice by ``uri``;
  2. the phase-1 politeness window shuffled everything by (host, salt)
     — and the two-tier union upstream erased partitioning info, so this
     exchange was unavoidable and the union's branches each re-computed
     the candidate scan;
  3. the phase-2 window shuffled the survivors by host.

Measured N->4N scaling efficiency of that composite was 0.69 (the
exchanges are the part of the job that does NOT scale with cores —
cross-executor fetch shares one memory bus here, one network fabric on a
real cluster).  This module restates the same semantics around a SINGLE
up-front exchange:

  * candidates are salted and hash-partitioned ONCE by (host, __salt) —
    the politeness phase-1 key;
  * the **seen table is co-partitioned at rest** by the same derivable
    key (host + salt are pure functions of the canonical uri — this is
    the local model of an Iceberg ``bucket(...)`` table layout, see
    partition_for_schedule);
  * the exact-tier LEFT ANTI join then needs NO exchange: join keys
    (uri, host, __salt) are a superset of the partitioning key, so both
    sides are already co-located; a shuffle_hash hint avoids sorting the
    big side;
  * the phase-1 window's ClusteredDistribution((host, __salt)) is
    satisfied by the same exchange — NO new shuffle;
  * only the phase-2 exact-rank window (over the per-salt survivors,
    <= n_salts x budget rows per host) pays a second, much smaller
    exchange.

Equivalence: anti-join on (uri, host, salt) == anti-join on uri because
host/salt are functions of uri; the salted two-phase ranking is the same
phase-1-never-discards argument as politeness.schedule (its docstring).

Bloom tier: with a broadcastable filter the anti-join above is already
exchange-free, so a pre-probe would add per-row hash work and prune
nothing — the fused path therefore probes only in cogroup mode (filter
too big to broadcast, the 10^10 sizing), where the probe's pid-shuffle
replaces the candidate exchange and only the maybe-seen slice (a few %)
pays a co-located anti-join against the bucketed seen table.
"""

from __future__ import annotations

import pyspark.sql.functions as F
from pyspark.sql import DataFrame, Window

from webindex_spark.operators import robots as robots_ops
from webindex_spark.operators import seen as seen_ops

SALT_COL = "__salt"


def salt_col(uri_col: str = "uri", n_salts: int = 8) -> F.Column:
    """The politeness salt — a pure function of the canonical uri, so any
    table storing uris can be bucketed by it at rest."""
    return F.pmod(F.xxhash64(F.lit("sched"), F.col(uri_col)), F.lit(n_salts))


def partition_for_schedule(
    df: DataFrame,
    uri_col: str = "uri",
    host_col: str = "host",
    n_salts: int = 8,
    num_partitions: int | None = None,
) -> DataFrame:
    """Hash-partition by (host, salt) — THE exchange the fused pipeline
    reuses.  Applied to the seen table this models its at-rest layout
    (Iceberg: ``PARTITIONED BY (bucket(N, host), salt)``); appends land
    in the same buckets, so a real deployment pays this shuffle never —
    it is the write-side layout, not a per-epoch cost."""
    salted = df.withColumn(SALT_COL, salt_col(uri_col, n_salts))
    cols = [F.col(host_col), F.col(SALT_COL)]
    if num_partitions:
        return salted.repartition(num_partitions, *cols)
    return salted.repartition(*cols)


def schedule_frontier(
    candidates: DataFrame,
    seen: DataFrame,
    bloom: DataFrame | None,
    robots: DataFrame,
    budget: int,
    n_salts: int = 8,
    *,
    k: int,
    bits: int,
    n_partitions: int,
    num_partitions: int | None = None,
    uri_col: str = "uri",
    host_col: str = "host",
    seen_prepartitioned: bool = False,
    keep_cols: list[str] | None = None,
) -> DataFrame:
    """candidates -> unseen -> robots-allowed -> per-host budget/slots.

    Returns the scheduled rows (candidate columns + allowed/crawl_delay +
    slot + tick), identical to
    ``politeness.schedule(apply_robots(filter_unseen(...)))`` but with
    the fused single-exchange physical plan (module docstring).

    ``seen`` must carry (uri_col, host_col).  Pass
    ``seen_prepartitioned=True`` when it already has the
    partition_for_schedule layout (the at-rest case).

    ``keep_cols`` limits which extra candidate columns ride through the
    exchanges (default: all of them).  The pipeline itself needs only
    (uri, host, path->gate, priority); every byte beyond that is paid in
    the big exchange and both window sorts, so callers that only need the
    schedule should pass ``keep_cols=[]``.

    Physical ordering (all semantics-preserving commutes, measured wins):
      * robots gate FIRST — a broadcast join + filter before the exchange
        removes blocked rows AND lets ``path`` (gate-only) be projected
        away before any shuffle;
      * then the slim projection, the (host, salt) exchange, the
        co-partitioned anti-join, and the two windows.
    """
    keep = keep_cols if keep_cols is not None else [
        c for c in candidates.columns
        if c not in (uri_col, host_col, "path", "priority", "crawl_delay", "allowed")
    ]
    gated = robots_ops.apply_robots(candidates, robots, host_col=host_col)
    allowed = gated.where(F.col("allowed")).select(
        uri_col, host_col, "priority", "crawl_delay", *keep
    )

    cogroup_mode = (
        bloom is not None
        and seen is not None
        and n_partitions * (bits // 8) > seen_ops.BROADCAST_BLOOM_MAX_BYTES
    )

    if cogroup_mode:
        # 10^10 sizing: the cogroup probe's pid-shuffle carries the
        # candidates (pre-partitioning by (host, salt) first would only be
        # destroyed by it); only the maybe slice (~hit rate + fpp) joins
        # the seen table, and the phase-1 window's exchange below re-keys
        # the survivors by (host, salt).
        probed = seen_ops.bloom_probe(
            allowed, bloom, uri_col, k, bits, n_partitions
        ).localCheckpoint(eager=False)
        fresh = probed.where(~F.col("maybe_seen")).drop("maybe_seen")
        maybe = probed.where(F.col("maybe_seen")).drop("maybe_seen")
        confirmed = maybe.join(seen.select(uri_col), uri_col, "left_anti")
        unseen = fresh.unionByName(confirmed).withColumn(
            SALT_COL, salt_col(uri_col, n_salts)
        )
    else:
        # broadcast-filter regime: the exact anti-join is exchange-free on
        # the shared (host, salt) partitioning, so a bloom pre-probe would
        # prune nothing (every candidate continues into the windows either
        # way) — the exact tier alone is the optimal plan here
        cand = partition_for_schedule(
            allowed, uri_col, host_col, n_salts, num_partitions
        )
        if seen is None:
            unseen = cand
        else:
            if seen_prepartitioned and SALT_COL in seen.columns:
                s = seen.select(uri_col, host_col, SALT_COL)
            else:
                s = seen.select(uri_col, host_col)
                if not seen_prepartitioned:
                    s = partition_for_schedule(
                        s, uri_col, host_col, n_salts, num_partitions
                    )
                else:
                    s = s.withColumn(SALT_COL, salt_col(uri_col, n_salts))
            # NOTE: plain sort-merge, no shuffle_hash hint — SHJ's required
            # distribution rejects subset co-partitioning and re-shuffles
            # the big side on the full join keys (measured); SMJ accepts
            # the (host, salt) partitioning, and its in-partition sorts are
            # CPU that scales with cores, unlike an exchange.
            unseen = cand.join(s, [uri_col, host_col, SALT_COL], "left_anti")

    order = [F.desc("priority"), F.asc(uri_col)]
    w1 = Window.partitionBy(host_col, SALT_COL).orderBy(*order)
    survivors = (
        unseen.withColumn("__r1", F.row_number().over(w1))
        .where(F.col("__r1") <= budget)
        .drop(SALT_COL, "__r1")
    )
    w2 = Window.partitionBy(host_col).orderBy(*order)
    return (
        survivors.withColumn("slot", F.row_number().over(w2).cast("long") - 1)
        .where(F.col("slot") < budget)
        .withColumn("tick", (F.col("slot") * F.col("crawl_delay")).cast("double"))
    )
