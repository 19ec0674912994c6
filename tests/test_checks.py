"""Engine-management ops: table stats, constraint suite, fk coverage."""

from __future__ import annotations

from webindex_spark.operators.checks import fk_coverage, run_checks, table_stats


def test_table_stats_nulls_distinct_minmax(spark):
    df = spark.createDataFrame(
        [(1, "b", None), (2, "a", 5.0), (2, None, 7.5), (4, "a", None)],
        ["k", "s", "v"],
    )
    got = {r["column"]: r for r in table_stats(df).collect()}
    assert got["k"]["n_rows"] == 4 and got["k"]["n_null"] == 0
    assert got["k"]["n_distinct"] == 3
    assert got["k"]["min_str"] == "1" and got["k"]["max_str"] == "4"
    assert got["s"]["n_null"] == 1 and got["s"]["n_distinct"] == 2
    assert got["s"]["min_str"] == "a" and got["s"]["max_str"] == "b"
    assert got["v"]["n_null"] == 2 and got["v"]["min_str"] == "5.0"


def test_run_checks_counts_violations_and_nulls(spark):
    df = spark.createDataFrame(
        [(1, 10.0), (2, -3.0), (3, None)], ["k", "v"]
    )
    got = {r["check"]: r for r in run_checks(df, [
        ("k_not_null", "k IS NOT NULL"),
        ("v_positive", "v > 0"),          # null predicate counts as violation
    ]).collect()}
    assert got["k_not_null"]["passed"] is True
    assert got["v_positive"]["n_violations"] == 2
    assert got["v_positive"]["passed"] is False


def test_fk_coverage_orphans(spark):
    child = spark.createDataFrame([(1,), (2,), (9,)], ["ck"])
    parent = spark.createDataFrame([(1,), (2,), (3,)], ["pk"])
    row = fk_coverage(child, "ck", parent, "pk").collect()[0]
    assert (row["n_child"], row["n_orphans"], row["passed"]) == (3, 1, False)
    ok = fk_coverage(parent, "pk", parent, "pk").collect()[0]
    assert ok["passed"] is True
