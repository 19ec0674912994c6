"""HITS hubs/authorities: exact python-int replica + structural checks."""

from __future__ import annotations

from collections import defaultdict

from webindex_spark.operators.hits import hits

SCALE = 10**9


def _py_hits(edges, iterations=4, scale=SCALE):
    srcs = sorted({u for u, _ in edges})
    h = {u: scale // max(len(srcs), 1) for u in srcs}
    a = {}
    for _ in range(iterations):
        ar = defaultdict(int)
        for u, v in edges:
            ar[v] += h[u]
        g = max(1, sum(ar.values()) // scale)
        a = {v: r // g for v, r in ar.items()}
        hr = defaultdict(int)
        for u, v in edges:
            hr[u] += a[v]
        g = max(1, sum(hr.values()) // scale)
        h = {u: r // g for u, r in hr.items()}
    nodes = {u for u, _ in edges} | {v for _, v in edges}
    return {n: (h.get(n, 0), a.get(n, 0)) for n in nodes}


def test_hits_matches_python_replica(spark):
    edges = [
        ("h1", "a1"), ("h1", "a2"), ("h1", "a3"),
        ("h2", "a1"), ("h3", "a1"), ("h3", "a2"),
        # a chain node that is both hub and authority
        ("a1", "a4"),
    ]
    df = spark.createDataFrame(edges, ["src", "dst"])
    got = {r["id"]: (r["hub"], r["auth"]) for r in hits(df).collect()}
    assert got == _py_hits(edges)
    # structure: a1 (3 in-links from good hubs) is the top authority;
    # h1 and h3 (linking to it + others) are the top hubs
    top_auth = max(got, key=lambda n: got[n][1])
    assert top_auth == "a1"
    hubs = sorted(got, key=lambda n: -got[n][0])[:2]
    assert set(hubs) == {"h1", "h3"}


def test_hits_duplicate_edges_count_per_occurrence(spark):
    # multi-edge doubles the contribution unless caller dedupes
    e1 = [("u", "v"), ("u", "v"), ("w", "v")]
    df = spark.createDataFrame(e1, ["src", "dst"])
    got = {r["id"]: r for r in hits(df, iterations=1).collect()}
    exp = _py_hits(e1, iterations=1)
    assert {k: (v["hub"], v["auth"]) for k, v in got.items()} == exp
    assert got["u"]["hub"] > got["w"]["hub"]
