"""Engine-portable deterministic hashes — Spark Column + DuckDB SQL twins.

The production dedup/fingerprint operators hash JVM-side with ``xxhash64``
(fast, 64-bit, codegen).  DuckDB has no xxhash64, so queries that must be
certified by the driver's DuckDB oracle parametrize the operators with
these *portable* hashes instead: a polynomial rolling hash over the
string's code points, computed with the exact same integer recurrence in
both engines (all arithmetic stays far inside int64 so Spark's ANSI mode
and DuckDB's overflow checks never trigger):

    h = 0;  h = (h * base + codepoint) mod 2^31        # phash31
    h62 = phash31(s, 31) + phash31(s, 131) * 2^31      # 62-bit variant

Both sides fold strictly left-to-right over the same characters, so the
values are bit-identical — which is what lets the driver gate verify the
*whole* minhash/simhash/winnowing pipelines (signature aggregation,
banding, bucket guards, hamming packing) end to end instead of running a
weak rows-only check.  The hash is NOT meant to be strong: the pipelines
only need determinism + dispersion, and collisions (2^31 space) affect
both engines identically.
"""

from __future__ import annotations

import pyspark.sql.functions as F
from pyspark.sql import Column

M31 = 1 << 31


def phash31(col: Column | str, base: int = 31) -> Column:
    """Polynomial rolling hash over code points, mod 2^31 (Spark side)."""
    c = F.col(col) if isinstance(col, str) else col
    return F.aggregate(
        F.split(c, ""),
        F.lit(0).cast("long"),
        lambda acc, ch: F.pmod(
            acc * F.lit(base) + F.coalesce(F.ascii(ch), F.lit(0)), F.lit(M31)
        ),
    )


def phash62(col: Column | str) -> Column:
    """62-bit portable hash: two independent-base 31-bit hashes packed.

    Both recurrences fold in ONE pass over the characters (struct
    accumulator) — half the HOF work of two separate phash31 calls."""
    c = F.col(col) if isinstance(col, str) else col
    folded = F.aggregate(
        F.split(c, ""),
        F.struct(
            F.lit(0).cast("long").alias("a"), F.lit(0).cast("long").alias("b")
        ),
        lambda acc, ch: F.struct(
            F.pmod(acc["a"] * 31 + F.coalesce(F.ascii(ch), F.lit(0)), F.lit(M31)).alias("a"),
            F.pmod(acc["b"] * 131 + F.coalesce(F.ascii(ch), F.lit(0)), F.lit(M31)).alias("b"),
        ),
    )
    return folded["a"] + folded["b"] * F.lit(M31)


def compose62(token_hashes: list[Column]) -> Column:
    """Order-sensitive 62-bit gram hash composed from per-token
    :func:`phash62` values — the token is hashed ONCE and each gram costs
    n integer ops, vs the O(chars × n) of re-folding every character of
    every gram (the round-2 hot spot of ngram/minhash/fingerprints).

    Null entries are SKIPPED (a null ``lead`` marks the clamped
    short-document gram), matching a DuckDB slice ``ths[i:i+n-1]`` that
    simply clamps at the list end.  Lanes: two independent 31-bit
    polynomial folds over the low/high halves of the 62-bit token hash
    (all arithmetic < 2^39, ANSI/overflow-safe in both engines).

    Shape matters: a per-step ``when(isNull, acc)`` chain embeds the
    accumulator twice per step — a 2^n expression tree that measured
    ~0.9 s/query slower at sf0.1.  Nulls can only be a TAIL (leads past
    the document end), so this builds the strict n-token chain (linear)
    plus one prefix chain per possible short length, selected by the
    non-null count — O(n²) total nodes, evaluated once per gram row."""

    def _prefix(js: int) -> Column:
        sa: Column = F.lit(0).cast("long")
        sb: Column = F.lit(0).cast("long")
        for c in token_hashes[:js]:
            sa = F.pmod(sa * F.lit(131) + c.bitwiseAND(F.lit(M31 - 1)), F.lit(M31))
            sb = F.pmod(sb * F.lit(137) + F.shiftright(c, 31), F.lit(M31))
        return sa + sb * F.lit(M31)

    strict = _prefix(len(token_hashes))
    if len(token_hashes) == 1:
        return strict
    n_nonnull = sum(
        [F.when(c.isNull(), 0).otherwise(1) for c in token_hashes[1:]], F.lit(1)
    )
    expr = strict
    for j in range(1, len(token_hashes)):
        expr = F.when(n_nonnull == j, _prefix(j)).otherwise(expr)
    return expr


M32 = 1 << 32
_MIX_C1 = 0x85EBCA6B
_MIX_C2 = 0xC2B2AE35


def _mul32(x: Column, c: int) -> Column:
    """``(x * c) mod 2^32`` without leaving int64: 16-bit split multiply
    (every intermediate < 2^48, ANSI/overflow-safe in both engines)."""
    lo = x.bitwiseAND(F.lit(0xFFFF)) * F.lit(c)
    hi = F.pmod(F.shiftright(x, 16) * F.lit(c), F.lit(1 << 16)) * F.lit(1 << 16)
    return F.pmod(lo + hi, F.lit(M32))


def mix32(x: Column) -> Column:
    """MurmurHash3's 32-bit avalanche finalizer over a value in
    ``[0, 2^32)`` — every input bit flips every output bit with ~1/2
    probability.  The polynomial hashes above have well-mixed LOW bits
    only (multiplication mod 2^31 never carries information downward),
    which is fine for bucketing but fatal for anything that reads bit
    *positions* — an HLL rho taken from unmixed bits saturates because
    high-rho values concentrate in a few buckets (measured: a 20k-doc
    corpus estimated as ~1.1k).  After this finalizer the same corpus
    estimates within 1 sigma.  Pure shifts/xors/16-bit-split multiplies,
    so the DuckDB twin is the same integer recurrence."""
    x = x.bitwiseXOR(F.shiftright(x, 16))
    x = _mul32(x, _MIX_C1)
    x = x.bitwiseXOR(F.shiftright(x, 13))
    x = _mul32(x, _MIX_C2)
    return x.bitwiseXOR(F.shiftright(x, 16))


def fold31(cols: list[Column], mult: int = 131) -> Column:
    """Order-sensitive fold of several int64 columns into one 31-bit value
    (the portable replacement for ``xxhash64(*cols)`` band buckets)."""
    acc: Column = F.lit(0).cast("long")
    for c in cols:
        acc = F.pmod(acc * F.lit(mult) + F.pmod(c, F.lit(M31)), F.lit(M31))
    return acc


# --------------------------------------------------------------- SQL twins


def sql_phash31(expr: str, base: int = 31) -> str:
    """DuckDB SQL computing the same value as :func:`phash31`."""
    return (
        "list_reduce(list_prepend(CAST(0 AS BIGINT), "
        f"list_transform(range(1, length({expr})+1), "
        f"i -> CAST(unicode(({expr})[i:i]) AS BIGINT))), "
        f"(acc, c) -> (acc * {base} + c) % {M31})"
    )


def sql_phash62(expr: str) -> str:
    return f"({sql_phash31(expr, 31)} + {sql_phash31(expr, 131)} * {M31})"


def sql_compose62_slice(list_expr: str) -> str:
    """DuckDB twin of :func:`compose62` over a (clamped) slice of a
    per-token phash62 list, e.g. ``sql_compose62_slice('ths[i:i+2]')``."""
    fa = (
        "list_reduce(list_prepend(CAST(0 AS BIGINT), "
        f"list_transform({list_expr}, t -> t & {M31 - 1})), "
        f"(acc, c) -> (acc * 131 + c) % {M31})"
    )
    fb = (
        "list_reduce(list_prepend(CAST(0 AS BIGINT), "
        f"list_transform({list_expr}, t -> t >> 31)), "
        f"(acc, c) -> (acc * 137 + c) % {M31})"
    )
    return f"({fa} + {fb} * {M31})"


def _sql_mul32(expr: str, c: int) -> str:
    return (
        f"(((({expr}) & 65535) * {c} + "
        f"(((({expr}) >> 16) * {c}) % 65536) * 65536) % {M32})"
    )


def sql_mix32(expr: str) -> str:
    """DuckDB SQL computing the same value as :func:`mix32`.  Uses a
    chain of scalar subquery-free expressions; callers should bind the
    input to a column first (the expression is substituted 2x per
    stage)."""
    s1 = f"(xor(({expr}), ({expr}) >> 16))"
    s2 = _sql_mul32(s1, _MIX_C1)
    s3 = f"(xor(({s2}), ({s2}) >> 13))"
    s4 = _sql_mul32(s3, _MIX_C2)
    return f"(xor(({s4}), ({s4}) >> 16))"


def sql_fold31(exprs: list[str], mult: int = 131) -> str:
    acc = "CAST(0 AS BIGINT)"
    for e in exprs:
        acc = f"((({acc}) * {mult} + (({e}) % {M31})) % {M31})"
    return acc
