"""The four reference query shapes over the set1 fixture state, checked
against the expectations implied by the golden data (accumulo-data.txt) and
DevServerIT.java:46-57's shape (totals + rank order)."""

from __future__ import annotations

import pytest

from webindex_spark.operators import index_batch
from webindex_spark.plans import queries
from tests.test_index_batch import make_set1_pages


@pytest.fixture(scope="module")
def state(spark):
    pages = make_set1_pages(spark).cache()
    uri_counts, domain_counts, _ = index_batch.build_index(pages, cache=False)
    return pages, uri_counts.cache(), domain_counts.cache()


def test_top_results_order_and_pagination(state):
    _, uc, _ = state
    rows = queries.top_results(uc, page_size=3).collect()
    assert len(rows) == 4  # 3 + lookahead
    assert [(r["uri"], r["links_to"]) for r in rows[:3]] == [
        ("com.b>>o>/3", 2), ("com.c>>o>/1", 2), ("com.b>>o>/1", 1),
    ]
    token = f"{rows[3]['links_to']}|{rows[3]['uri']}"
    page2 = queries.top_results(uc, next_uri=token, page_size=3).collect()
    assert page2[0]["uri"] == rows[3]["uri"]
    all_uris = {r["uri"] for r in rows[:3]} | {r["uri"] for r in page2}
    assert len(all_uris) == 6  # full coverage, no overlap/loss


def test_page_details(state):
    pages, uc, _ = state
    # link-only target: reference getPage synthesizes new Page(uri) and
    # still sets numInbound (IndexClient.java:131-135) — one row, not zero
    r = queries.page_details(pages, uc, "com.b>>o>/3").collect()
    assert len(r) == 1 and r[0]["stored"] is False
    assert r[0]["num_inbound"] == 2  # set1: two referrers, never crawled
    r = queries.page_details(pages, uc, "com.a>>o>/1").collect()[0]
    assert r["num_inbound"] == 0 and r["stored"] is True
    assert len(r["outbound_links"]) == 3


def test_domain_stats_and_pages(state):
    _, uc, dc = state
    assert queries.domain_stats(dc, "b.com").collect()[0]["pagecount"] == 4
    rows = queries.pages_in_domain(uc, "b.com").collect()
    assert [(r["uri"], r["links_to"], r["rank"]) for r in rows] == [
        ("com.b>>o>/3", 2, 1),
        ("com.b>>o>/1", 1, 2),
        ("com.b>>o>/2", 1, 3),
        ("com.b>>o>/", 0, 4),
    ]


def test_links(state):
    pages, _, _ = state
    inl = queries.links_of(pages, "com.b>>o>/3", "in").collect()
    assert [(r["src_uri"], r["anchor_text"]) for r in inl] == [
        ("com.a>>o>/1", "b3"), ("com.b>>o>/", "b3"),
    ]
    out = queries.links_of(pages, "com.a>>o>/1", "out", offset=1, page_size=1).collect()
    assert len(out) == 1 and out[0]["uri"] == "com.b>>o>/3"


# --------------------------------------------------------------------------
# DevServerIT parity: the reference's only end-to-end read-path assertion on
# real crawl data (DevServerIT.java:46-57 over 5-pages.txt): getPages for
# stackoverflow.com returns total=4, and the top-ranked page is
# http://blog.stackoverflow.com/2009/06/attribution-required/ with score 4.


def test_devserver_fixture_getpages(spark):
    import os

    from webindex_spark.functions.urlnorm import from_uri
    from webindex_spark.sources.pages_json import read_pages_json

    path = os.path.join(os.path.dirname(__file__), "golden", "5-pages.txt")
    pages = read_pages_json(spark, path)
    assert pages.count() == 5
    uri_counts, _dc, _rows = index_batch.build_index(pages, cache=False)

    got = queries.pages_in_domain(uri_counts, "stackoverflow.com").collect()
    assert len(got) == 4  # pages.getTotal()
    top = got[0]
    assert top["rank"] == 1
    assert from_uri(top["uri"])["url"] == (
        "http://blog.stackoverflow.com/2009/06/attribution-required/"
    )
    assert top["links_to"] == 4  # pageScore.getScore()
