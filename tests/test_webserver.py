"""End-to-end read path over HTTP: the stdlib server (plans/webserver.py)
serving the query surface reproduces DevServerIT's assertions
(DevServerIT.java:46-57 over 5-pages.txt) through real GET requests."""

import json
import os
import urllib.parse
import urllib.request

import pytest

from webindex_spark.operators import index_batch
from webindex_spark.plans import webserver
from webindex_spark.sources.pages_json import read_pages_json


@pytest.fixture(scope="module")
def served(spark):
    path = os.path.join(os.path.dirname(__file__), "golden", "5-pages.txt")
    pages = read_pages_json(spark, path)
    uri_counts, domain_counts, _rows = index_batch.build_index(pages, cache=False)
    app = webserver.WebIndexApp(spark, uri_counts, domain_counts, pages)
    srv = webserver.serve(app)
    yield f"http://127.0.0.1:{srv.server_port}"
    srv.shutdown()


def _get(base, path):
    with urllib.request.urlopen(base + path, timeout=60) as r:
        assert r.status == 200
        return json.loads(r.read())


def test_pages_route_devserverit_parity(served):
    from webindex_spark.functions.urlnorm import from_uri

    body = _get(served, "/pages?domain=stackoverflow.com")
    assert body["total"] == 4
    top = body["pages"][0]
    assert top["rank"] == 1 and top["score"] == 4
    assert from_uri(top["uri"])["url"] == (
        "http://blog.stackoverflow.com/2009/06/attribution-required/"
    )


def test_top_route_ranked(served):
    body = _get(served, "/top")
    scores = [r["links_to"] for r in body["results"]]
    assert scores == sorted(scores, reverse=True) and scores[0] == 4


def test_page_route_point_lookup(served):
    body = _get(
        served,
        "/page?url=" + urllib.parse.quote(
            "http://blog.stackoverflow.com/2009/06/attribution-required/"
        ),
    )
    # reference parity (IndexClient.java:131-135): the top page of the
    # 5-pages fixture is a link TARGET never crawled — getPage synthesizes
    # an empty page (stored=False) but still reports its inbound count
    assert body["num_inbound"] == 4 and body["stored"] is False
    body = _get(
        served,
        "/page?url=" + urllib.parse.quote(
            "http://apple.stackexchange.com/users/208/john-allers"
        ),
    )
    assert body["stored"] is True and body["title"] == "User John Allers - Ask Different"


def test_domain_and_links_routes(served):
    dom = _get(served, "/domain?domain=stackoverflow.com")
    assert dom["total"] == 4
    top = _get(served, "/pages?domain=stackoverflow.com")["pages"][0]
    links = _get(served, "/links?uri=" + urllib.parse.quote(top["uri"]))
    assert len(links["links"]) == 4
    assert {l["dst_uri"] for l in links["links"]} == {top["uri"]}


def test_unknown_route_404_and_missing_param_400(served):
    with pytest.raises(urllib.error.HTTPError) as e:
        _get(served, "/nope")
    assert e.value.code == 404
    with pytest.raises(urllib.error.HTTPError) as e:
        _get(served, "/pages")
    assert e.value.code == 400
    # non-integer offset and invalid url are 400s too — not dropped
    # connections, not 200-with-error-body (ADVICE round 3)
    with pytest.raises(urllib.error.HTTPError) as e:
        _get(served, "/links?uri=x&offset=abc")
    assert e.value.code == 400
    with pytest.raises(urllib.error.HTTPError) as e:
        _get(served, "/page?url=" + urllib.parse.quote("not a url"))
    assert e.value.code == 400
