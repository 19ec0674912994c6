"""Exact triangle census over a general (unipartite) graph.

Complements the bipartite butterfly counter: the page→resource link
graph itself has no triangles, but its host-level projections (and any
similarity/co-citation graph the dedup stack emits) do, and the
triangle count / global clustering coefficient is the standard density
diagnostic for them.

Algorithm: degree orientation (compact-forward).  Every undirected
edge is oriented from its lower-(degree, node) endpoint to the higher;
each node's *oriented* out-degree is then O(√m) regardless of how
skewed the raw degree distribution is — a hub with a million neighbors
receives its edges instead of fanning them out, so the wedge expansion
below is bounded WITHOUT a drop-based cap (this is the rare graph op
where the skew guard is free and exact).  A triangle {x,y,z} with
key(x) < key(y) < key(z) is counted exactly once: as the wedge
x→y, x→z closed by the oriented edge y→z.

Shuffles: canonical-edge dedup, degree aggregate (small), two
broadcast-or-shuffle degree joins, adjacency groupBy, and the closing
edge join — every expansion JVM-side from sorted arrays (the
butterfly/lsh idiom), never an unguarded self-join on a raw column.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, functions as F


def triangle_census(
    edges: DataFrame, src: str = "src", dst: str = "dst"
) -> DataFrame:
    """One-row summary over an edge list (direction/duplicates ignored):
    ``(n_nodes, n_edges, wedges, triangles, global_cc)`` where
    ``wedges`` = Σ C(deg, 2) (open + closed paths of length 2) and
    ``global_cc`` = 3·triangles / wedges rounded to 6 digits."""
    # e and deg each feed 3-4 consumers (degree union, orientation
    # joins, edge/wedge counts) — cut once with LAZY localCheckpoints
    # (first consumer computes and caches; no dedicated barrier job)
    # instead of letting every consumer re-run the upstream scan +
    # join + distinct (measured 2.4x on the gated query)
    e = (
        edges.select(
            F.least(F.col(src), F.col(dst)).alias("a"),
            F.greatest(F.col(src), F.col(dst)).alias("b"),
        )
        .where(F.col("a") != F.col("b"))
        .distinct()
        .localCheckpoint(eager=False)
    )
    deg = (
        e.select(F.col("a").alias("n"))
        .unionAll(e.select(F.col("b").alias("n")))
        .groupBy("n")
        .agg(F.count(F.lit(1)).cast("long").alias("d"))
        .localCheckpoint(eager=False)
    )
    da = deg.select(F.col("n").alias("a"), F.col("d").alias("da"))
    db = deg.select(F.col("n").alias("b"), F.col("d").alias("db"))
    keyed = e.join(da, "a").join(db, "b")
    fwd = (F.col("da") < F.col("db")) | (
        (F.col("da") == F.col("db")) & (F.col("a") < F.col("b"))
    )
    oriented = keyed.select(
        F.when(fwd, F.col("a")).otherwise(F.col("b")).alias("u"),
        F.when(fwd, F.col("b")).otherwise(F.col("a")).alias("w"),
        F.when(fwd, F.col("db")).otherwise(F.col("da")).alias("dw"),
    ).localCheckpoint(eager=False)  # adjacency build + closing-edge probe
    adj = oriented.groupBy("u").agg(
        F.array_sort(
            F.collect_list(F.struct(F.col("dw").alias("dk"), F.col("w").alias("n")))
        ).alias("ns")
    )
    ns = F.col("ns")
    combos = F.flatten(
        F.transform(
            ns,
            lambda x, i: F.transform(
                F.slice(ns, i + F.lit(2), F.size(ns) - i - 1),
                lambda y: F.struct(x["n"].alias("c1"), y["n"].alias("c2")),
            ),
        )
    )
    cand = adj.where(F.size("ns") >= 2).select(F.explode(combos).alias("p")).select(
        F.col("p.c1").alias("u"), F.col("p.c2").alias("w")
    )
    tri = cand.join(oriented.select("u", "w"), ["u", "w"]).agg(
        F.count(F.lit(1)).cast("long").alias("triangles")
    )
    sums = deg.agg(
        F.count(F.lit(1)).cast("long").alias("n_nodes"),
        F.coalesce(F.sum(F.expr("d * (d - 1) div 2")), F.lit(0))
        .cast("long")
        .alias("wedges"),
    )
    ecnt = e.agg(F.count(F.lit(1)).cast("long").alias("n_edges"))
    return (
        sums.crossJoin(ecnt)
        .crossJoin(tri)
        .select(
            "n_nodes",
            "n_edges",
            "wedges",
            "triangles",
            F.round(
                (F.col("triangles") * 3)
                / F.greatest(F.col("wedges"), F.lit(1)),
                6,
            ).alias("global_cc"),
        )
    )
