"""Mergeable cardinality/frequency/quantile sketches — the approximate
query layer a 100 TB crawl store needs next to its exact aggregates.

All three operators are built so the DuckDB oracle can certify them
BIT-EXACTLY, which is unusual for sketches and worth spelling out:

* every hash is the engine-portable polynomial hash
  (functions/portable_hash.py), identical in both engines;
* every register is an INTEGER (max-rho for HLL, count sums for CMS,
  prefix-summed counts for quantiles), so register tables compare
  exactly;
* the only floating-point step anywhere is the final HLL estimate — a
  SINGLE IEEE-754 division of a literal constant by an exact integer,
  which both engines round identically.  No ln/exp/pow, no
  float accumulation order anywhere.

Scale posture:

* HLL: one shuffle of (key, bucket) — the register table is
  ``m = 2^p`` rows per key regardless of input size, and registers
  merge with MAX, so partial aggregation (map-side combine) does most
  of the work before the exchange.  This is the approximate twin of the
  reference's per-domain URI counting (UriCountExport.java builds the
  exact per-domain rollup; at 10^10 URIs an HLL per domain is the tool
  that fits in memory).
* CMS: the register table is a CONSTANT ``d × width`` grid (a few KiB)
  — built with one map-side-combined shuffle, then *broadcast* back for
  point estimates.  Estimation never shuffles the corpus.
* Quantiles: exact, not approximate — the value-histogram decomposition
  (groupBy(value) + the two-phase distributed prefix sum from
  curation.distributed_cumsum) never puts the corpus through one task
  and never touches a float threshold: ``cum * 100 >= pct * total`` is
  pure int64 arithmetic (percentile_disc semantics).  Works whenever
  the value domain is materially smaller than the row count — prices,
  sizes, scores, latencies — which is the common 100 TB histogram case.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, functions as F

from webindex_spark.functions import portable_hash as ph

# ------------------------------------------------------------------ HLL

HLL_P = 9                # 2^9 = 512 registers per key
_HLL_M = 1 << HLL_P
_HLL_RHO_MAX = 33        # rho = 32-bit leading zeros + 1, in [1, 33]
# alpha_m * m^2 * 2^33 — the whole numerator folded into ONE double
# literal so the estimate is a single deterministic IEEE division
_HLL_ALPHA = 0.7213 / (1.0 + 1.079 / _HLL_M)


def _hll_numerator() -> float:
    # 2^rho_max scale: empty registers contribute 2^-0 = 1 -> scaled 2^33
    return _HLL_ALPHA * _HLL_M * _HLL_M * float(1 << _HLL_RHO_MAX)


def hll_registers(
    df: DataFrame, key_cols: list[str], value_col: str
) -> DataFrame:
    """Per-key HLL register table ``(keys..., bucket, r)``.

    Two independent-base polynomial hashes of the value, each pushed
    through the Murmur 32-bit avalanche finalizer
    (portable_hash.mix32): bucket = ``fa mod m`` and ``r`` = max over
    values of (32-bit leading zeros of ``fb``) + 1.  The finalizer is
    load-bearing: rho reads bit POSITIONS, and the raw mod-2^31
    polynomial lanes only have well-mixed low bits (see mix32's
    docstring for the measured failure).  The register merge is MAX,
    so this is one plain map-side-combined groupBy — mergeable across
    partitions, files, days.
    """
    v = F.col(value_col).cast("string")
    fa = ph.mix32(ph.phash31(v, 31))
    fb = ph.mix32(ph.phash31(v, 131))
    # bit length via bin(): both engines render minimal binary strings
    rho = F.when(fb == 0, F.lit(_HLL_RHO_MAX)).otherwise(
        F.lit(_HLL_RHO_MAX) - F.length(F.bin(fb))
    )
    return (
        df.select(
            *key_cols,
            F.pmod(fa, F.lit(_HLL_M)).alias("bucket"),
            rho.cast("int").alias("rho"),
        )
        .groupBy(*key_cols, "bucket")
        .agg(F.max("rho").alias("r"))
    )


def hll_distinct(
    df: DataFrame, key_cols: list[str], value_col: str
) -> DataFrame:
    """Per-key HLL distinct-count estimate: ``(keys..., used, s_scaled,
    est)``.

    ``s_scaled`` is the harmonic denominator ``sum(2^-rho)`` scaled by
    ``2^33`` so it stays an exact int64 (max value ``m * 2^33 = 2^42``,
    nowhere near overflow); ``est`` is the raw
    HLL estimate ``alpha * m^2 / sum(2^-rho)`` computed as ONE double
    division of a literal by ``s_scaled`` — deterministic in both
    engines.  (No small-range linear-counting correction: that needs
    ``ln``, whose last-ulp behaviour is not portable; ``used`` and
    ``s_scaled`` carry everything a caller needs to apply it.)
    """
    regs = hll_registers(df, key_cols, value_col)
    per_key = regs.groupBy(*key_cols).agg(
        F.count(F.lit(1)).cast("long").alias("used"),
        F.sum(
            F.expr(f"shiftleft(CAST(1 AS BIGINT), {_HLL_RHO_MAX} - r)")
        ).alias("_s_obs"),
    )
    s = (
        F.col("_s_obs")
        + (F.lit(_HLL_M) - F.col("used")) * F.lit(1 << _HLL_RHO_MAX)
    ).cast("long")
    return per_key.select(
        *key_cols,
        "used",
        s.alias("s_scaled"),
        (F.lit(_hll_numerator()) / s.cast("double")).alias("est"),
    )


# ------------------------------------------------------------ count-min

CMS_BASES = (31, 131, 137, 139)   # one polynomial base per sketch row
CMS_WIDTH = 256


def cms_registers(
    df: DataFrame,
    key_col: str,
    weight_col: str | None = None,
    bases: tuple[int, ...] = CMS_BASES,
    width: int = CMS_WIDTH,
) -> DataFrame:
    """Count-min register grid ``(r, c, reg)`` — ``d = len(bases)`` rows
    by ``width`` columns, ``reg`` = exact sum of weights of keys hashing
    to that cell.  One shuffle, map-side combined; the grid is a few
    KiB no matter the corpus size."""
    w = F.col(weight_col) if weight_col else F.lit(1).cast("long")
    ks = F.col(key_col).cast("string")
    parts = [
        df.select(
            F.lit(r).alias("r"),
            F.pmod(ph.phash31(ks, base), F.lit(width)).alias("c"),
            w.alias("w"),
        )
        for r, base in enumerate(bases)
    ]
    u = parts[0]
    for p in parts[1:]:
        u = u.unionByName(p)
    return u.groupBy("r", "c").agg(F.sum("w").cast("long").alias("reg"))


def cms_estimate(
    keys: DataFrame,
    registers: DataFrame,
    key_col: str,
    bases: tuple[int, ...] = CMS_BASES,
    width: int = CMS_WIDTH,
) -> DataFrame:
    """Point-frequency estimates for ``keys``: ``(key, cms_n)`` with
    ``cms_n = min over sketch rows of the addressed register`` — the
    classic one-sided (>= true count) CMS bound.  The register grid is
    broadcast; the probe never shuffles the key set.

    The join is LEFT so a probed cell absent from the (sparse,
    non-empty-cells-only) register grid counts as 0 — standard CMS
    semantics: a key never sketched estimates 0, and a key whose rows
    straddle empty cells takes the zero into its min instead of
    silently ignoring it."""
    ks = F.col(key_col).cast("string")
    probes = None
    for r, base in enumerate(bases):
        p = keys.select(
            key_col,
            F.lit(r).alias("r"),
            F.pmod(ph.phash31(ks, base), F.lit(width)).alias("c"),
        )
        probes = p if probes is None else probes.unionByName(p)
    return (
        probes.join(F.broadcast(registers), ["r", "c"], "left")
        .groupBy(key_col)
        .agg(
            F.min(F.coalesce(F.col("reg"), F.lit(0)))
            .cast("long")
            .alias("cms_n")
        )
    )


# ------------------------------------------------------------ quantiles


def exact_quantiles(
    df: DataFrame, value_col: str, percents: list[int]
) -> DataFrame:
    """Exact ``percentile_disc`` quantiles ``(pct, value)`` via the
    distributed value histogram: groupBy(value) -> two-phase prefix sum
    (curation.distributed_cumsum — range partitions + per-partition
    windows + broadcast offsets, no single-task global window) -> for
    each pct the smallest value with ``cum * 100 >= pct * total``.
    The threshold comparison is pure int64 — no float quantile math to
    disagree on."""
    from webindex_spark.operators.curation import distributed_cumsum

    hist = df.groupBy(F.col(value_col).alias("v")).agg(
        F.count(F.lit(1)).cast("long").alias("n")
    )
    cum = distributed_cumsum(hist, "v", "n", "cum")
    total = hist.agg(F.sum("n").cast("long").alias("tot"))
    pcts = df.sparkSession.createDataFrame(
        [(int(p),) for p in percents], "pct int"
    )
    return (
        cum.crossJoin(F.broadcast(total))
        .crossJoin(F.broadcast(pcts))
        .filter(F.col("cum") * 100 >= F.col("pct").cast("long") * F.col("tot"))
        .groupBy("pct")
        .agg(F.min("v").alias("value"))
    )


def interp_quantiles(
    df: DataFrame, value_col: str, percents: list[int]
) -> DataFrame:
    """Exact ``percentile_cont`` (linear interpolation) on the same
    distributed value-histogram machinery as :func:`exact_quantiles`.

    The interpolation position ``h = (n-1)·pct/100`` is kept INTEGER:
    ``h_num = (n-1)·pct``, rank_lo = ``h_num div 100 + 1``, and the
    fractional weight is ``h_num mod 100`` hundredths — so both
    engines pick identical bracketing ranks, and the one float
    operation (``lo + frac·(hi-lo)/100``) runs on identical operands.
    Returns ``(pct, value)`` with value rounded to 6 digits.
    """
    from webindex_spark.operators.curation import distributed_cumsum

    hist = df.groupBy(F.col(value_col).alias("v")).agg(
        F.count(F.lit(1)).cast("long").alias("n")
    )
    cum = distributed_cumsum(hist, "v", "n", "cum")
    total = hist.agg(F.sum("n").cast("long").alias("tot"))
    pcts = df.sparkSession.createDataFrame(
        [(int(p),) for p in percents], "pct int"
    )
    ranks = (
        pcts.crossJoin(F.broadcast(total))
        .select(
            "pct",
            "tot",
            ((F.col("tot") - 1) * F.col("pct")).alias("h_num"),
        )
        .select(
            "pct",
            (F.expr("h_num div 100") + 1).alias("rank_lo"),
            F.least(F.expr("h_num div 100") + 2, F.col("tot")).alias("rank_hi"),
            F.pmod(F.col("h_num"), F.lit(100)).cast("long").alias("frac"),
        )
    )
    lo = (
        cum.crossJoin(F.broadcast(ranks))
        .filter(F.col("cum") >= F.col("rank_lo"))
        .groupBy("pct", "frac")
        .agg(F.min("v").alias("lo"))
    )
    hi = (
        cum.crossJoin(F.broadcast(ranks))
        .filter(F.col("cum") >= F.col("rank_hi"))
        .groupBy("pct")
        .agg(F.min("v").alias("hi"))
    )
    return lo.join(hi, "pct").select(
        "pct",
        F.round(
            F.col("lo") + F.col("frac") * (F.col("hi") - F.col("lo")) / 100.0, 6
        ).alias("value"),
    )
