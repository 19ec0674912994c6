"""Batch index build — the Spark-native restatement of ``webindex init``
(SURVEY.md §3.1; reference IndexUtil.java:52-213).

Input: a ``pages`` DataFrame with schema ``PAGE_SCHEMA``; outputs:
  * ``uri_counts(uri, links_to, docs)``      — IndexUtil.createUriMap:74-91
  * ``domain_counts(rev_domain, pagecount)`` — IndexUtil.createDomainMap:93-102
  * ``index_rows(row, cf, cq, v)``           — IndexUtil.createAccumuloIndex:107-153

Physical shape (what Catalyst produces and why it scales):
  * uri_counts: one explode (narrow) + one hash aggregate — Spark's
    HashAggregate does the map-side partial combine the reference got from
    ``reduceByKey``, so the shuffle carries only (uri, partial sums);
  * domain_counts: derived from uri_counts keys with a pure built-in
    (``split_part``), one more hash aggregate — no UDF, no extra scan;
  * index_rows: three narrow projections unioned — the only UDF work is
    the rank-key hex encode (per-unique-count, so effectively O(distinct
    counts)) and the Gson-canonical JSON render, both Arrow-vectorized.
At 100 TB the whole plan is two shuffles (the two aggregates) plus the
range-partitioned sort the sink wants; all filters/projections are pushed
into the parquet scan.
"""

from __future__ import annotations

import pyspark.sql.functions as F
import pyspark.sql.types as T
from pyspark.sql import DataFrame

from webindex_spark.functions.spark_udfs import page_json, rev_encode, uri_rev_domain_col

LINK_SCHEMA = T.StructType(
    [
        T.StructField("url", T.StringType()),
        T.StructField("uri", T.StringType()),
        T.StructField("anchor_text", T.StringType()),
    ]
)

PAGE_SCHEMA = T.StructType(
    [
        T.StructField("url", T.StringType()),
        T.StructField("uri", T.StringType()),
        T.StructField("crawl_date", T.StringType()),
        T.StructField("server", T.StringType()),
        T.StructField("title", T.StringType()),
        T.StructField("outbound_links", T.ArrayType(LINK_SCHEMA)),
    ]
)

INDEX_ROW_SCHEMA = T.StructType(
    [
        T.StructField("row", T.StringType()),
        T.StructField("cf", T.StringType()),
        T.StructField("cq", T.StringType()),
        T.StructField("v", T.StringType()),
    ]
)


def normalize_links(links_col) -> F.Column:
    """TreeSet<Link> semantics as built-ins (Page.java:39-41, Link.java:83-91):
    sort by (uri, url), drop duplicate (uri, url) pairs (adjacent after the
    sort).  Pure higher-order functions — no shuffle, no Python.
    """
    c = F.col(links_col) if isinstance(links_col, str) else links_col
    srt = F.array_sort(
        c,
        lambda a, b: F.when(a["uri"] < b["uri"], F.lit(-1))
        .when(a["uri"] > b["uri"], F.lit(1))
        .when(a["url"] < b["url"], F.lit(-1))
        .when(a["url"] > b["url"], F.lit(1))
        .otherwise(F.lit(0)),
    )
    # keep element i iff i==0 or (uri,url) differs from element i-1
    # (element_at is 1-based, so element_at(srt, i) IS the previous element)
    return F.filter(
        srt,
        lambda x, i: (i == F.lit(0))
        | (F.element_at(srt, i)["uri"] != x["uri"])
        | (F.element_at(srt, i)["url"] != x["url"]),
    )


def uri_map_from_edges(own_uris: DataFrame, link_targets: DataFrame) -> DataFrame:
    """The UriInfo commutative monoid as a hash agg over its edge form:
    ``own_uris(uri)`` are crawled pages (docs=1), ``link_targets(uri)`` are
    inbound-link endpoints (links_to=1), summed per uri
    (IndexUtil.java:74-91, UriInfo.java:69-74).  This is the single code
    path behind both the page-table wrapper (create_uri_map) and the
    derived-link-graph gate query (plans/crawl_queries.q_uri_counts)."""
    own = own_uris.select(
        F.col("uri"),
        F.lit(0).cast("long").alias("links_to"),
        F.lit(1).cast("long").alias("docs"),
    )
    lnk = link_targets.select(
        F.col("uri"),
        F.lit(1).cast("long").alias("links_to"),
        F.lit(0).cast("long").alias("docs"),
    )
    return (
        own.unionByName(lnk)
        .groupBy("uri")
        .agg(F.sum("links_to").alias("links_to"), F.sum("docs").alias("docs"))
    )


def create_uri_map(pages: DataFrame) -> DataFrame:
    """uri -> (links_to, docs) from a pages table.  Rows summing to ZERO
    never occur in batch (docs>=1 for own rows, links_to>=1 for links)."""
    own = pages.where(F.col("uri").isNotNull()).select("uri")
    lnk = pages.select(F.explode("outbound_links").alias("l")).select(
        F.col("l.uri").alias("uri")
    )
    return uri_map_from_edges(own, lnk)


def create_domain_map(uri_counts: DataFrame) -> DataFrame:
    """rev_domain -> count of distinct known URIs (IndexUtil.java:93-102).
    uri_counts keys are already distinct, so a plain count suffices."""
    return (
        uri_counts.select(uri_rev_domain_col("uri").alias("rev_domain"))
        .groupBy("rev_domain")
        .agg(F.count(F.lit(1)).alias("pagecount"))
    )


def create_index_rows(
    pages: DataFrame, uri_counts: DataFrame, domain_counts: DataFrame
) -> DataFrame:
    """The query-table KV rows (IndexUtil.createAccumuloIndex:107-153)."""
    pages_ok = pages.where(F.col("uri").isNotNull())

    # p:<uri> page:cur -> canonical JSON, only when the page has outlinks
    # (IndexUtil.java:122-124)
    page_cur = (
        pages_ok.where(F.size("outbound_links") > 0)
        .select(
            F.concat(F.lit("p:"), F.col("uri")).alias("row"),
            F.lit("page").alias("cf"),
            F.lit("cur").alias("cq"),
            page_json(
                F.struct("url", "uri", "outbound_links", "crawl_date", "server", "title")
            ).alias("v"),
        )
    )

    # p:<dstUri> inlinks:<srcUri> -> anchorText (IndexUtil.java:125-128)
    inlinks = (
        pages_ok.select(F.col("uri").alias("src_uri"), F.explode("outbound_links").alias("l"))
        .select(
            F.concat(F.lit("p:"), F.col("l.uri")).alias("row"),
            F.lit("inlinks").alias("cf"),
            F.col("src_uri").alias("cq"),
            F.col("l.anchor_text").alias("v"),
        )
    )

    # per-URI rows: t:<enc>:<uri>, d:<revDomain>:<enc>:<uri> rank, p:<uri>
    # page:incount (IndexUtil.java:132-144)
    enc = uri_counts.select(
        "uri",
        "links_to",
        rev_encode(F.col("links_to")).alias("enc"),
        uri_rev_domain_col("uri").alias("rev_domain"),
    )
    total_rows = enc.select(
        F.concat(F.lit("t:"), F.col("enc"), F.lit(":"), F.col("uri")).alias("row"),
        F.lit("").alias("cf"),
        F.lit("").alias("cq"),
        F.col("links_to").cast("string").alias("v"),
    )
    rank_rows = enc.select(
        F.concat(
            F.lit("d:"), F.col("rev_domain"), F.lit(":"), F.col("enc"), F.lit(":"), F.col("uri")
        ).alias("row"),
        F.lit("rank").alias("cf"),
        F.lit("").alias("cq"),
        F.col("links_to").cast("string").alias("v"),
    )
    incount_rows = enc.select(
        F.concat(F.lit("p:"), F.col("uri")).alias("row"),
        F.lit("page").alias("cf"),
        F.lit("incount").alias("cq"),
        F.col("links_to").cast("string").alias("v"),
    )

    # d:<revDomain> domain:pagecount (IndexUtil.java:146-148)
    domain_rows = domain_counts.select(
        F.concat(F.lit("d:"), F.col("rev_domain")).alias("row"),
        F.lit("domain").alias("cf"),
        F.lit("pagecount").alias("cq"),
        F.col("pagecount").cast("string").alias("v"),
    )

    return (
        page_cur.unionByName(inlinks)
        .unionByName(total_rows)
        .unionByName(rank_rows)
        .unionByName(incount_rows)
        .unionByName(domain_rows)
    )


def build_index(pages: DataFrame, cache: bool = True):
    """Full §3.1 replay: returns (uri_counts, domain_counts, index_rows).

    ``uri_counts`` is consumed by three downstream plans (domain map + two
    row renderers), mirroring the reference's DISK_ONLY persist of uriMap
    (IndexUtil.java:88); we cache it for the same reason.
    """
    uri_counts = create_uri_map(pages)
    if cache:
        uri_counts = uri_counts.persist()
    domain_counts = create_domain_map(uri_counts)
    index_rows = create_index_rows(pages, uri_counts, domain_counts)
    return uri_counts, domain_counts, index_rows


def observe_stats(pages: DataFrame):
    """A5: the reference's driver accumulators (IndexStats.java:30-56 —
    numPages/numEmpty/numExternalLinks) as a Spark ``observe``: collected
    for free during whatever action materializes the plan, no extra pass.
    Returns (df, Observation); read ``observation.get`` after an action."""
    from pyspark.sql import Observation

    obs = Observation("index_stats")
    observed = pages.observe(
        obs,
        F.count(F.when(F.col("uri").isNotNull(), 1)).alias("num_pages"),
        F.count(F.when(F.col("uri").isNull(), 1)).alias("num_empty"),
        F.sum(F.size(F.coalesce("outbound_links", F.array()))).alias("num_external_links"),
    )
    return observed, obs


def calculate_splits(index_rows: DataFrame, num_splits: int) -> list[str]:
    """O2 (IndexUtil.calculateSplits:199-213 + CalcSplits.java:64): sample
    ``num_splits`` rows, truncate keys to 29 bytes, return the sorted split
    points a pre-split sorted store would use.  The Spark-native sink
    doesn't need this (repartitionByRange samples internally — the same
    algorithm); provided for reference parity and for exporting splits to
    an external KV store."""
    sample = index_rows.select("row").orderBy(F.rand(42)).limit(num_splits).collect()
    return sorted({r["row"].encode("utf-8")[:29].decode("utf-8", "ignore") for r in sample})


def accumulo_default_splits() -> list[str]:
    """S10: the reference's hand-computed default pre-split points
    (IndexEnv.getAccumuloDefaultSplits, IndexEnv.java:
    splits/accumulo-default.txt — vendored verbatim as package data,
    Apache-2.0).  76 sorted points: first ``d:com.blogg``, last
    ``t:fefeff:d`` (IndexEnvTest.java:26-31).

    Read via importlib.resources so it also resolves from the
    ``spark-submit --py-files`` zip (zipimport-safe)."""
    from importlib import resources

    text = (
        resources.files("webindex_spark")
        / "resources"
        / "accumulo_default_splits.dat"
    ).read_text(encoding="utf-8")
    return sorted(line.strip() for line in text.splitlines() if line.strip())


def sorted_index_rows(index_rows: DataFrame, num_partitions: int | None = None) -> DataFrame:
    """Globally sorted (row, cf, cq) — the bulk-load order the reference's
    sink requires (IndexEnv.java:234-245).  ``orderBy`` range-partitions by
    sampled split points, the Spark-native version of the reference's
    hand-computed 76 split points (splits/accumulo-default.txt)."""
    if num_partitions:
        index_rows = index_rows.repartitionByRange(num_partitions, "row", "cf", "cq")
        return index_rows.sortWithinPartitions("row", "cf", "cq")
    return index_rows.orderBy("row", "cf", "cq")
