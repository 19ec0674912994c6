"""Sketch operators vs pure-python replicas: HLL register math and
estimate accuracy, CMS one-sided bound + exactness at low load, and
percentile_disc semantics of the distributed exact quantiles."""

from __future__ import annotations

import pytest

from webindex_spark.operators import sketches

M31 = 1 << 31


def _phash31(s: str, base: int) -> int:
    h = 0
    for ch in s:
        h = (h * base + ord(ch)) % M31
    return h


def _mul32(x: int, c: int) -> int:
    return ((x & 0xFFFF) * c + (((x >> 16) * c) % (1 << 16)) * (1 << 16)) % (1 << 32)


def _mix32(x: int) -> int:
    x ^= x >> 16
    x = _mul32(x, 0x85EBCA6B)
    x ^= x >> 13
    x = _mul32(x, 0xC2B2AE35)
    return x ^ (x >> 16)


def _py_hll(values):
    """Reference HLL: registers + scaled harmonic sum + estimate."""
    m, rho_max = 1 << sketches.HLL_P, 33
    regs: dict[int, int] = {}
    for v in values:
        fa, fb = _mix32(_phash31(str(v), 31)), _mix32(_phash31(str(v), 131))
        rho = rho_max if fb == 0 else rho_max - fb.bit_length()
        b = fa % m
        regs[b] = max(regs.get(b, 0), rho)
    s = sum(1 << (rho_max - r) for r in regs.values())
    s += (m - len(regs)) * (1 << rho_max)
    return len(regs), s, sketches._hll_numerator() / float(s)


def test_hll_matches_python_replica(spark):
    vals = [f"uri-{i * 7919}" for i in range(5000)]
    df = spark.createDataFrame([("k", v) for v in vals], ["k", "u"])
    row = sketches.hll_distinct(df, ["k"], "u").first()
    used, s, est = _py_hll(vals)
    assert row["used"] == used
    assert row["s_scaled"] == s
    assert row["est"] == est


def test_hll_estimate_accuracy_and_dup_invariance(spark):
    vals = [f"doc:{i}" for i in range(20000)]
    df = spark.createDataFrame([("k", v) for v in vals + vals[:5000]], ["k", "u"])
    row = sketches.hll_distinct(df, ["k"], "u").first()
    # standard error 1.04/sqrt(512) ~ 4.6%; allow ~2 sigma
    assert abs(row["est"] - 20000) / 20000 < 0.10
    # duplicates cannot move any register
    row2 = sketches.hll_distinct(
        spark.createDataFrame([("k", v) for v in vals], ["k", "u"]), ["k"], "u"
    ).first()
    assert (row["used"], row["s_scaled"]) == (row2["used"], row2["s_scaled"])


def test_cms_upper_bound_and_exact_when_sparse(spark):
    rows = [(f"u{i}",) for i in range(40) for _ in range(i + 1)]
    df = spark.createDataFrame(rows, ["k"])
    regs = sketches.cms_registers(df, "k")
    keys = df.distinct()
    est = {
        r["k"]: r["cms_n"]
        for r in sketches.cms_estimate(keys, regs, "k").collect()
    }
    true = {f"u{i}": i + 1 for i in range(40)}
    for k, t in true.items():
        assert est[k] >= t            # CMS never underestimates
    # 40 keys in a 4x256 grid: collisions in ALL 4 rows are essentially
    # impossible, so the min-row estimate is exact
    assert est == true


def test_cms_unseen_keys_estimate_zero(spark):
    """Standard CMS contract: a key never added to the sketch must come
    back with estimate 0 (its cells are empty), not vanish from the
    output or inherit a collided cell's inflated min."""
    df = spark.createDataFrame([(f"u{i}",) for i in range(40)], ["k"])
    regs = sketches.cms_registers(df, "k")
    probe = spark.createDataFrame(
        [("u0",), ("never-seen-1",), ("never-seen-2",)], ["k"]
    )
    est = {
        r["k"]: r["cms_n"]
        for r in sketches.cms_estimate(probe, regs, "k").collect()
    }
    assert set(est) == {"u0", "never-seen-1", "never-seen-2"}
    assert est["u0"] >= 1
    # 40 keys / 4x256 grid: a 4-row full collision for an absent key is
    # essentially impossible, so the zero-cell min must surface
    assert est["never-seen-1"] == 0
    assert est["never-seen-2"] == 0


def test_exact_quantiles_percentile_disc_semantics(spark):
    df = spark.createDataFrame([(float(v),) for v in range(1, 101)], ["x"])
    got = {
        r["pct"]: r["value"]
        for r in sketches.exact_quantiles(df, "x", [1, 50, 99, 100]).collect()
    }
    # percentile_disc: smallest value with cum/total >= pct/100
    assert got == {1: 1.0, 50: 50.0, 99: 99.0, 100: 100.0}


def test_exact_quantiles_with_heavy_duplication(spark):
    rows = [(1.0,)] * 90 + [(2.0,)] * 9 + [(3.0,)]
    got = {
        r["pct"]: r["value"]
        for r in sketches.exact_quantiles(
            spark.createDataFrame(rows, ["x"]), "x", [50, 90, 91, 99, 100]
        ).collect()
    }
    assert got == {50: 1.0, 90: 1.0, 91: 2.0, 99: 2.0, 100: 3.0}


def test_hll_registers_merge_across_partitions(spark):
    """Mergeability — the property that makes the sketch the 100 TB
    tool: MAX-merging two days' register tables equals the register
    table of the union."""
    from pyspark.sql import functions as F

    day1 = spark.createDataFrame([("k", f"a{i}") for i in range(3000)], ["k", "u"])
    day2 = spark.createDataFrame(
        [("k", f"a{i}") for i in range(1500, 4500)], ["k", "u"]
    )
    both = day1.union(day2)
    merged = (
        sketches.hll_registers(day1, ["k"], "u")
        .union(sketches.hll_registers(day2, ["k"], "u"))
        .groupBy("k", "bucket")
        .agg(F.max("r").alias("r"))
    )
    direct = sketches.hll_registers(both, ["k"], "u")
    assert sorted(map(tuple, merged.collect())) == sorted(
        map(tuple, direct.collect())
    )
