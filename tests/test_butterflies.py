"""Butterfly counting vs hand-computed graphs: the complete-bipartite
closed form, the hot-destination guard, and duplicate-edge immunity."""

from __future__ import annotations

from webindex_spark.operators.butterflies import butterfly_counts


def _edges(spark, pairs):
    return spark.createDataFrame(pairs, ["src", "dst"])


def test_complete_bipartite_closed_form(spark):
    # K(3,3): wedges = 3 dsts * C(3,2) = 9; butterflies = C(3,2)*C(3,2) = 9
    pairs = [(f"u{i}", f"v{j}") for i in range(3) for j in range(3)]
    row = butterfly_counts(_edges(spark, pairs)).first()
    assert (row["wedges"], row["butterflies"], row["dropped_dsts"]) == (9, 9, 0)


def test_single_butterfly_and_tail(spark):
    pairs = [("a", "x"), ("b", "x"), ("a", "y"), ("b", "y"), ("c", "z")]
    row = butterfly_counts(_edges(spark, pairs)).first()
    # wedges: x and y each contribute C(2,2)=1; z has deg 1 -> 0
    assert (row["wedges"], row["butterflies"]) == (2, 1)


def test_duplicate_edges_do_not_double_count(spark):
    pairs = [("a", "x"), ("a", "x"), ("b", "x"), ("a", "y"), ("b", "y")]
    row = butterfly_counts(_edges(spark, pairs)).first()
    assert row["butterflies"] == 1


def test_hot_destination_guard(spark):
    hot = [(f"u{i}", "spam") for i in range(10)]
    pairs = hot + [("u0", "x"), ("u1", "x")]
    row = butterfly_counts(_edges(spark, pairs), max_degree=5).first()
    # 'spam' (deg 10 > 5) dropped whole: its 45 wedges and every
    # butterfly through it vanish; only x's wedge remains
    assert (row["wedges"], row["butterflies"], row["dropped_dsts"]) == (1, 0, 1)
