"""End-to-end batch index build vs the reference's golden output.

Replays IndexUtilTest.testDataSet1 (IndexUtilTest.java:55-120): the 2-page
"set1" fixture through the full pipeline, rendered as ``row|cf|cq|value``
lines with the reference's Hex.encNonAscii encoding, compared byte-for-byte
against tests/golden/set1-accumulo-data.txt (29 lines, copied verbatim from
modules/data/src/test/resources/data/set1/accumulo-data.txt).
"""

from __future__ import annotations

import pytest

from webindex_spark.functions import pagejson, urlnorm
from webindex_spark.operators import index_batch

GOLDEN = "tests/golden/set1-accumulo-data.txt"


def make_set1_pages(spark):
    """The fixture of IndexUtilTest.getPagesSet1 (IndexUtilTest.java:107-120),
    built through our own canonicalizer rather than hand-written uris."""
    def link(raw, anchor):
        r = urlnorm.parse_one(raw)
        return {"url": r["url_norm"], "uri": r["uri"], "anchor_text": anchor}

    def page(raw, links):
        r = urlnorm.parse_one(raw)
        return {
            "url": r["url_norm"],
            "uri": r["uri"],
            "crawl_date": None,
            "server": None,
            "title": None,
            "outbound_links": links,
        }

    rows = [
        page("http://a.com/1", [
            link("http://b.com/1", "b1"),
            link("http://b.com/3", "b3"),
            link("http://c.com/1", "c1"),
        ]),
        page("http://b.com", [
            link("http://c.com/1", "c1"),
            link("http://b.com/2", "b2"),
            link("http://b.com/3", "b3"),
        ]),
    ]
    df = spark.createDataFrame(rows, schema=index_batch.PAGE_SCHEMA)
    return df.withColumn(
        "outbound_links", index_batch.normalize_links("outbound_links")
    )


@pytest.fixture(scope="module")
def set1(spark):
    pages = make_set1_pages(spark)
    uri_counts, domain_counts, index_rows = index_batch.build_index(pages, cache=False)
    return pages, uri_counts, domain_counts, index_rows


def test_uri_counts(set1):
    _, uri_counts, _, _ = set1
    got = {r["uri"]: (r["links_to"], r["docs"]) for r in uri_counts.collect()}
    assert got == {
        "com.a>>o>/1": (0, 1),
        "com.b>>o>/": (0, 1),
        "com.b>>o>/1": (1, 0),
        "com.b>>o>/2": (1, 0),
        "com.b>>o>/3": (2, 0),
        "com.c>>o>/1": (2, 0),
    }


def test_domain_counts(set1):
    _, _, domain_counts, _ = set1
    got = {r["rev_domain"]: r["pagecount"] for r in domain_counts.collect()}
    assert got == {"com.a": 1, "com.b": 4, "com.c": 1}


def test_index_rows_golden(set1):
    _, _, _, index_rows = set1
    rows = index_batch.sorted_index_rows(index_rows).collect()
    got = [pagejson.render_kv_line(r["row"], r["cf"], r["cq"], r["v"]) for r in rows]
    with open(GOLDEN, encoding="utf-8") as f:
        expected = [line.rstrip("\n") for line in f if line.rstrip("\n")]
    assert len(got) == len(expected) == 29
    assert got == expected


def test_normalize_links_dedup(spark):
    rows = [
        {
            "url": "http://a.com/",
            "uri": "com.a>>o>/",
            "crawl_date": None,
            "server": None,
            "title": None,
            "outbound_links": [
                {"url": "http://b.com/2", "uri": "com.b>>o>/2", "anchor_text": "x"},
                {"url": "http://b.com/1", "uri": "com.b>>o>/1", "anchor_text": "y"},
                {"url": "http://b.com/2", "uri": "com.b>>o>/2", "anchor_text": "x"},
            ],
        }
    ]
    df = spark.createDataFrame(rows, schema=index_batch.PAGE_SCHEMA)
    out = df.select(index_batch.normalize_links("outbound_links").alias("l")).collect()[0]["l"]
    assert [(e["uri"], e["url"]) for e in out] == [
        ("com.b>>o>/1", "http://b.com/1"),
        ("com.b>>o>/2", "http://b.com/2"),
    ]
