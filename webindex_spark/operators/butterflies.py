"""Butterfly counting — the bipartite clustering primitive (4-cycles)
over the crawl's page→outlink graph.

The link graph is bipartite (source pages → linked resources), so the
triangle count is structurally zero; the analogue that measures
co-linking density is the BUTTERFLY: two sources both linking the same
two destinations.  Exact counts come from the standard wedge
decomposition:

    wedges(dst)            = C(deg(dst), 2)   source pairs sharing dst
    butterflies            = sum over source pairs (u1 < u2) of
                             C(#shared dsts, 2)

Scale posture (the wedge explosion is the whole game at 100 TB):

 * a hot destination (a footer link every page carries) contributes
   deg² wedge pairs — the exact spam-cluster shape lsh_candidates
   guards against.  Same guard here: destinations with degree >
   ``max_degree`` are dropped WHOLE before pair expansion, and the
   dropped count is returned for observability.  The oracle twin
   applies the identical deterministic cap, so the gate stays exact;
 * pair expansion runs JVM-side from each destination's sorted source
   array (the lsh_candidates idiom) — ONE corpus shuffle to build
   adjacency, bounded ≤ max_degree² output per destination, never an
   unguarded self-join;
 * the (u1, u2) shared-destination aggregation is the second and last
   shuffle; everything downstream is a scalar aggregate.

All arithmetic is int64 (d*(d-1) div 2), bit-exact in the oracle.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, functions as F


def butterfly_counts(
    edges: DataFrame,
    src: str = "src",
    dst: str = "dst",
    max_degree: int = 1000,
) -> DataFrame:
    """One-row summary ``(wedges, butterflies, dropped_dsts)`` over a
    (deduplicated) bipartite edge list, hot destinations above
    ``max_degree`` excluded from both counts (and tallied)."""
    e = edges.select(F.col(src).alias("u"), F.col(dst).alias("v")).distinct()
    adj = e.groupBy("v").agg(F.array_sort(F.collect_list("u")).alias("us"))
    kept = adj.where(F.size("us") <= max_degree)
    dropped = adj.where(F.size("us") > max_degree).agg(
        F.count(F.lit(1)).cast("long").alias("dropped_dsts")
    )
    wedges = kept.agg(
        F.coalesce(
            F.sum(
                F.expr(
                    "CAST(size(us) AS BIGINT) * (size(us) - 1) div 2"
                )
            ),
            F.lit(0),
        )
        .cast("long")
        .alias("wedges")
    )
    us = F.col("us")
    combos = F.flatten(
        F.transform(
            us,
            lambda x, i: F.transform(
                F.slice(us, i + F.lit(2), F.size(us) - i - 1),
                lambda y: F.struct(x.alias("u1"), y.alias("u2")),
            ),
        )
    )
    shared = (
        kept.where(F.size("us") >= 2)
        .select(F.explode(combos).alias("p"))
        .groupBy("p.u1", "p.u2")
        .agg(F.count(F.lit(1)).cast("long").alias("c"))
    )
    bf = shared.agg(
        F.coalesce(F.sum(F.expr("c * (c - 1) div 2")), F.lit(0))
        .cast("long")
        .alias("butterflies")
    )
    return wedges.crossJoin(bf).crossJoin(dropped)
