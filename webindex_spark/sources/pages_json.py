"""Line-JSON page source (SURVEY.md §2.1 S4).

The reference's dev server and integration fixtures feed newline-delimited
Page JSON in Gson field naming (DevServer.java:127-129; 5-pages.txt):
``{"url":…, "uri":…, "numInbound":…, "numOutbound":…, "crawlDate":…,
"server":…, "title":…, "outboundLinks":[{"url":…, "uri":…,
"anchorText":…}]}``.

``read_pages_json`` parses that format straight into the engine's
PAGE_SCHEMA with an explicit schema (no inference pass — one read, full
pushdown) and renames to the engine's snake_case columns.  Link arrays are
re-sorted/deduped to TreeSet semantics on the way in, so any hand-edited
fixture is normalized exactly like the reference's model classes would.
"""

from __future__ import annotations

import pyspark.sql.functions as F
import pyspark.sql.types as T
from pyspark.sql import DataFrame, SparkSession

from webindex_spark.operators.index_batch import PAGE_SCHEMA, normalize_links

GSON_PAGE_SCHEMA = T.StructType(
    [
        T.StructField("url", T.StringType()),
        T.StructField("uri", T.StringType()),
        T.StructField("numInbound", T.LongType()),
        T.StructField("numOutbound", T.LongType()),
        T.StructField("crawlDate", T.StringType()),
        T.StructField("server", T.StringType()),
        T.StructField("title", T.StringType()),
        T.StructField(
            "outboundLinks",
            T.ArrayType(
                T.StructType(
                    [
                        T.StructField("url", T.StringType()),
                        T.StructField("uri", T.StringType()),
                        T.StructField("anchorText", T.StringType()),
                    ]
                )
            ),
        ),
    ]
)


def read_pages_json(spark: SparkSession, path: str) -> DataFrame:
    return gson_pages_transform(spark.read.schema(GSON_PAGE_SCHEMA).json(path))


def gson_pages_transform(raw: DataFrame) -> DataFrame:
    """Gson-named raw rows -> PAGE_SCHEMA (shared by the batch reader and
    the Structured Streaming source, streaming/page_stream.py)."""
    links = F.transform(
        F.coalesce("outboundLinks", F.array()),
        lambda l: F.struct(
            l["url"].alias("url"),
            l["uri"].alias("uri"),
            l["anchorText"].alias("anchor_text"),
        ),
    )
    df = raw.select(
        "url",
        "uri",
        F.col("crawlDate").alias("crawl_date"),
        "server",
        "title",
        links.alias("outbound_links"),
    )
    return df.select(*[f.name for f in PAGE_SCHEMA.fields]).withColumn(
        "outbound_links", normalize_links("outbound_links")
    )
