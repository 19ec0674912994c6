"""k-core peeling + multi-source BFS: closed-form graph oracles."""

from __future__ import annotations

from webindex_spark.operators.kcore import hop_distances, kcore_peel

K5 = [(f"k{i}", f"k{j}") for i in range(5) for j in range(i + 1, 5)]


def test_kcore_k5_survives_chain_peels(spark):
    # K5 (every node degree 4) + a 3-node tail hanging off k0:
    # k=3 peels the tail over two rounds, keeps K5 intact
    edges = K5 + [("k0", "t1"), ("t1", "t2"), ("t2", "t3")]
    df = spark.createDataFrame(edges, ["src", "dst"])
    got = {r["id"]: r for r in kcore_peel(df, k=3, rounds=6).collect()}
    assert all(got[f"k{i}"]["in_core"] for i in range(5))
    assert not any(got[t]["in_core"] for t in ("t1", "t2", "t3"))
    assert got["k0"]["degree"] == 4          # tail edge gone
    assert got["k0"]["converged"] is True
    assert got["t3"]["degree"] == 0


def test_kcore_bounded_rounds_reports_nonconvergence(spark):
    # a 7-node path with k=2 dissolves end-in: one round only strips
    # the outermost pair, so rounds=1 must NOT report convergence and
    # must leave the middle intact
    path = [(f"p{i}", f"p{i + 1}") for i in range(6)]
    df = spark.createDataFrame(path, ["src", "dst"])
    got = {r["id"]: r for r in kcore_peel(df, k=2, rounds=1).collect()}
    assert got["p3"]["in_core"] and not got["p0"]["in_core"]
    assert got["p3"]["converged"] is False
    # enough rounds: the whole path dissolves and converges
    done = {r["id"]: r for r in kcore_peel(df, k=2, rounds=6).collect()}
    assert not any(r["in_core"] for r in done.values())
    assert all(r["converged"] for r in done.values())


def test_hop_distances_directed_and_undirected(spark):
    edges = [("s", "a"), ("a", "b"), ("b", "c"), ("x", "s")]
    df = spark.createDataFrame(edges, ["src", "dst"])
    seeds = spark.createDataFrame([("s",)], ["id"])
    d = {r["id"]: r["dist"] for r in hop_distances(df, seeds, rounds=4).collect()}
    # directed: x is upstream of s, unreachable
    assert d == {"s": 0, "a": 1, "b": 2, "c": 3}
    u = {r["id"]: r["dist"] for r in
         hop_distances(df, seeds, rounds=4, directed=False).collect()}
    assert u == {"s": 0, "a": 1, "x": 1, "b": 2, "c": 3}


def test_hop_distances_horizon_and_multi_seed(spark):
    edges = [("a", "b"), ("b", "c"), ("c", "d"), ("z", "d")]
    df = spark.createDataFrame(edges, ["src", "dst"])
    seeds = spark.createDataFrame([("a",), ("z",)], ["id"])
    d = {r["id"]: r["dist"] for r in hop_distances(df, seeds, rounds=2).collect()}
    # d is 1 from z (not 3 from a); c beyond nothing: b=1, c=2; horizon
    # cuts nothing else here but rounds=2 excludes nothing extra
    assert d == {"a": 0, "z": 0, "b": 1, "d": 1, "c": 2}
