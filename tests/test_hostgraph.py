"""Host-graph contraction + co-citation census
(webindex_spark/operators/hostgraph.py) — closed-form examples,
including the link-farm out-degree guard."""

from __future__ import annotations

from pyspark.sql import functions as F

from webindex_spark.operators.hostgraph import domain_cooccur, host_graph


def _edges(spark, rows):
    df = spark.createDataFrame(rows, ["src_uri", "dst_uri"])
    return df.select(
        "src_uri",
        "dst_uri",
        F.split_part("src_uri", F.lit("/"), F.lit(1)).alias("src_host"),
        F.split_part("dst_uri", F.lit("/"), F.lit(1)).alias("dst_host"),
    )


def test_host_graph_contraction(spark):
    e = _edges(spark, [
        ("a/1", "b/1"), ("a/1", "b/2"), ("a/2", "b/1"),   # a -> b: 3 links
        ("a/1", "c/9"),                                    # a -> c: 1 link
        ("a/1", "a/2"),                                    # intra-host: dropped
    ])
    got = {
        (r["src_host"], r["dst_host"]):
            (r["n_links"], r["n_src_pages"], r["n_dst_pages"])
        for r in host_graph(e).collect()
    }
    assert got == {("a", "b"): (3, 2, 2), ("a", "c"): (1, 1, 1)}


def test_domain_cooccur_pairs_and_guard(spark):
    # p1 cites hosts b,c,d -> 3 pairs; p2 cites b,c -> 1 pair;
    # farm cites 5 hosts and is dropped by max_out=4
    rows = (
        [("p1", f"{h}/x") for h in ("b", "c", "d")]
        + [("p2", f"{h}/y") for h in ("b", "c")]
        + [("farm", f"h{i}/z") for i in range(5)]
    )
    e = spark.createDataFrame(rows, ["src_uri", "dst_uri"]).select(
        "src_uri",
        F.split_part("dst_uri", F.lit("/"), F.lit(1)).alias("dst_host"),
    )
    got = {
        (r["host_a"], r["host_b"]): r["n_pages"]
        for r in domain_cooccur(e, max_out=4).collect()
    }
    assert got == {("b", "c"): 2, ("b", "d"): 1, ("c", "d"): 1}
    # with the cap lifted the farm's 10 pairs appear
    lifted = domain_cooccur(e, max_out=64)
    assert lifted.count() == 3 + 10


def test_degree_census_buckets_exact_at_powers_of_two(spark):
    from webindex_spark.operators.hostgraph import degree_census

    # src "a" has out-degree 4 (bucket 2), "b" out-degree 1 (bucket 0),
    # "c" out-degree 3 (bucket 1); every dst has in-degree 1 (bucket 0)
    rows = (
        [("a", f"t{i}") for i in range(4)]
        + [("b", "t9")]
        + [("c", f"u{i}") for i in range(3)]
    )
    e = spark.createDataFrame(rows, ["src_uri", "dst_uri"])
    got = {
        (r["side"], r["bucket"]): (r["n_nodes"], r["min_deg"], r["max_deg"])
        for r in degree_census(e).collect()
    }
    assert got == {
        ("out", 2): (1, 4, 4),   # deg 4 -> bucket 2, exact at the power
        ("out", 0): (1, 1, 1),
        ("out", 1): (1, 3, 3),
        ("in", 0): (8, 1, 1),
    }


def test_domain_cooccur_dedups_repeat_links(spark):
    # the same (page, host) pair repeated must count once
    rows = [("p1", "b/x"), ("p1", "b/y"), ("p1", "c/z")]
    e = spark.createDataFrame(rows, ["src_uri", "dst_uri"]).select(
        "src_uri",
        F.split_part("dst_uri", F.lit("/"), F.lit(1)).alias("dst_host"),
    )
    got = domain_cooccur(e, max_out=8).collect()
    assert [(r["host_a"], r["host_b"], r["n_pages"]) for r in got] == [
        ("b", "c", 1)
    ]
