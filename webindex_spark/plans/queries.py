"""The reference's query surface (SURVEY.md §2.10) as DataFrame functions.

Replaces the Accumulo range-scan read path (IndexClient.java / the four
WebServer routes) with queries over the engine's state tables:

  uri_counts(uri, links_to, docs)        domain_counts(rev_domain, pagecount)
  pages_state(PAGE_SCHEMA rows)          inlinks edge view (from pages_state)

The reference achieves ranked reads *by key design* (rank encoded into the
row key, IndexClient.java:308-319); here Catalyst does the same work with
TakeOrderedAndProject / ranking windows, and keyset pagination replaces the
Pager's lookahead row (Pager.java:75-98).
"""

from __future__ import annotations

import pyspark.sql.functions as F
from pyspark.sql import DataFrame, Window

PAGE_SIZE = 25  # IndexClient.java:58


def top_results(uri_counts: DataFrame, next_uri: str | None = None,
                page_size: int = PAGE_SIZE) -> DataFrame:
    """Q1 getTopResults (IndexClient.java:69-95): all URIs by descending
    inbound count, keyset-paginated.  ``next_uri`` is the (links_to, uri)
    continuation token rendered as 'links_to|uri'; one extra row is
    returned as the next token (the Pager's lookahead)."""
    ranked = uri_counts.orderBy(F.desc("links_to"), F.asc("uri"))
    if next_uri is not None:
        links_to, uri = next_uri.split("|", 1)
        ranked = ranked.where(
            (F.col("links_to") < int(links_to))
            | ((F.col("links_to") == int(links_to)) & (F.col("uri") >= uri))
        )
    return ranked.limit(page_size + 1)


def page_details(pages_state: DataFrame, uri_counts: DataFrame, uri: str) -> DataFrame:
    """Q2 getPage (IndexClient.java:101-136): point lookup joining the page
    body with its inbound count.

    Always returns exactly one row — the reference synthesizes an empty
    ``new Page(uri)`` and still sets ``numInbound`` when no body is stored
    (IndexClient.java:131-135; a page can be a link target the crawl never
    fetched).  ``stored`` mirrors ``!Page.isEmpty()`` (Page.java:98-100)."""
    base = pages_state.sparkSession.createDataFrame([(uri,)], "uri string")
    p = pages_state.where(F.col("uri") == uri)
    c = uri_counts.where(F.col("uri") == uri).select("uri", "links_to")
    return (
        base.join(p, "uri", "left")
        .join(c, "uri", "left")
        .withColumn("num_inbound", F.coalesce("links_to", F.lit(0)))
        .withColumn("stored", F.col("url").isNotNull())
        .drop("links_to")
    )


def domain_stats(domain_counts: DataFrame, domain: str) -> DataFrame:
    """Q3 getDomainStats (IndexClient.java:138-157): pagecount point read.
    ``domain`` is the forward domain; the key is its reverse form."""
    rev = ".".join(reversed(domain.split(".")))
    return domain_counts.where(F.col("rev_domain") == rev)


def pages_in_domain(uri_counts: DataFrame, domain: str, top_k: int = PAGE_SIZE) -> DataFrame:
    """Q4 getPages (IndexClient.java:159-188): a domain's URIs by
    descending inbound count — ranking window over the domain slice."""
    rev = ".".join(reversed(domain.split(".")))
    sliced = uri_counts.where(F.split_part("uri", F.lit(">"), F.lit(1)) == rev)
    w = Window.partitionBy().orderBy(F.desc("links_to"), F.asc("uri"))
    return sliced.withColumn("rank", F.row_number().over(w)).where(
        F.col("rank") <= top_k
    )


def links_of(pages_state: DataFrame, uri: str, direction: str = "in",
             offset: int = 0, page_size: int = PAGE_SIZE) -> DataFrame:
    """Q5 getLinks (IndexClient.java:190-248).

    ``in``: scan the inverted edge set (who links here) — the inlinks
    family materialized at write time in the reference.
    ``out``: paginate the page's own outbound array (posexplode ==
    the reference's in-JSON skip/add loop, IndexClient.java:224-242).
    """
    if direction == "in":
        edges = pages_state.select(
            F.col("uri").alias("src_uri"),
            F.explode("outbound_links").alias("l"),
        ).select(
            "src_uri", F.col("l.uri").alias("dst_uri"),
            F.col("l.anchor_text").alias("anchor_text"),
        )
        return (
            edges.where(F.col("dst_uri") == uri)
            .orderBy("src_uri")
            .offset(offset).limit(page_size)
        )
    return (
        pages_state.where(F.col("uri") == uri)
        .select(F.posexplode("outbound_links").alias("pos", "l"))
        .where((F.col("pos") >= offset) & (F.col("pos") < offset + page_size))
        .select("pos", "l.url", "l.uri", "l.anchor_text")
    )
