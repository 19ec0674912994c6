"""connected_components / dup_clusters vs a union-find python oracle.

The operator is the large-star/small-star alternation (components.py);
these tests pin (a) exact component labels on adversarial shapes — a
long chain, whose diameter defeats naive label propagation round
counts, cliques, and seeded random graphs — and (b) the dup_clusters
corpus wrapper: singleton handling, canonical-minimum labels, sizes.
"""

from __future__ import annotations

import random

from pyspark.sql import functions as F

from webindex_spark.operators.components import connected_components, dup_clusters


def _uf_components(nodes, edges):
    parent = {n: n for n in nodes}

    def find(x):
        while parent[x] != x:
            parent[x] = parent[parent[x]]
            x = parent[x]
        return x

    for a, b in edges:
        ra, rb = find(a), find(b)
        if ra != rb:
            parent[ra] = rb
    # label every node with its component's minimum id
    comp_min: dict = {}
    for n in nodes:
        r = find(n)
        comp_min[r] = min(comp_min.get(r, n), n)
    return {n: comp_min[find(n)] for n in nodes}


def _run(spark, edges):
    df = spark.createDataFrame(edges, ["src", "dst"])
    got = {
        r["id"]: r["component"]
        for r in connected_components(df).collect()
    }
    nodes = sorted({x for e in edges for x in e})
    want = _uf_components(nodes, edges)
    assert got == want
    return got


def test_chain_converges_in_log_rounds(spark):
    # a 200-node chain: diameter 199, but star-contraction needs ~log n
    # rounds — max_iter=50 would fail a diameter-bound algorithm
    edges = [(f"n{i:03d}", f"n{i + 1:03d}") for i in range(199)]
    got = _run(spark, edges)
    assert set(got.values()) == {"n000"}


def test_cliques_and_bridges(spark):
    edges = (
        [("a1", "a2"), ("a2", "a3"), ("a3", "a1")]
        + [("b1", "b2"), ("b2", "b3")]
        + [("a3", "b1")]          # bridge merges both
        + [("z8", "z9")]          # separate component
    )
    got = _run(spark, edges)
    assert got["b3"] == "a1" and got["z9"] == "z8"


def test_random_graphs_match_union_find(spark):
    rng = random.Random(7)
    for trial in range(3):
        n = 60
        nodes = [f"d{trial}{i:02d}" for i in range(n)]
        edges = [
            (rng.choice(nodes), rng.choice(nodes)) for _ in range(45)
        ]
        edges = [(a, b) for a, b in edges if a != b]
        _run(spark, edges)


def test_dup_clusters_singletons_and_sizes(spark):
    docs = spark.createDataFrame(
        [(f"doc{i}",) for i in range(6)], ["doc_id"]
    )
    pairs = spark.createDataFrame(
        [("doc1", "doc3"), ("doc3", "doc5"), ("doc0", "doc4")],
        ["id_a", "id_b"],
    )
    out = {
        r["doc_id"]: (r["cluster"], r["cluster_size"])
        for r in dup_clusters(docs, pairs).collect()
    }
    assert out == {
        "doc0": ("doc0", 2),
        "doc4": ("doc0", 2),
        "doc1": ("doc1", 3),
        "doc3": ("doc1", 3),
        "doc5": ("doc1", 3),
        "doc2": ("doc2", 1),
    }
    # canonical survivor policy: keep doc_id == cluster, one per cluster
    keep = [d for d, (c, _) in out.items() if d == c]
    assert sorted(keep) == ["doc0", "doc1", "doc2"]


def test_empty_edges(spark):
    docs = spark.createDataFrame([("a",), ("b",)], ["doc_id"])
    pairs = spark.createDataFrame([], "id_a string, id_b string")
    out = {r["doc_id"]: r["cluster_size"] for r in dup_clusters(docs, pairs).collect()}
    assert out == {"a": 1, "b": 1}


def test_distributed_posture(spark):
    # the loop must not collect vertex/edge data: the final plan is a
    # pure DataFrame (lazy), and intermediate rounds only pull 2 scalars
    df = spark.createDataFrame([("a", "b"), ("b", "c")], ["src", "dst"])
    out = connected_components(df)
    assert out.columns == ["id", "component"]
    assert out.count() == 3
