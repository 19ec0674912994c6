"""Z-order (Morton) curve keys — layout clustering for data skipping.

At 100 TB the scan cost of a multi-dimensional predicate is decided by
LAYOUT: sorting files by a bit-interleaved key co-locates rows that are
close in BOTH dimensions, so min/max footer stats prune file groups for
either predicate (the Delta/Iceberg OPTIMIZE ZORDER primitive).  This
module provides the key itself as a pure integer column expression —
magic-number bit spreading, no UDF — plus the DuckDB twin so the gate
can certify every bit.

All arithmetic stays in non-negative int64 (masks < 2^32), safe under
Spark ANSI mode and DuckDB overflow checks.
"""

from __future__ import annotations

import pyspark.sql.functions as F
from pyspark.sql import Column

_SPREAD_STEPS = [(8, 0x00FF00FF), (4, 0x0F0F0F0F), (2, 0x33333333), (1, 0x55555555)]


def _spread16(x: Column) -> Column:
    """Spread a 16-bit value's bits to the even positions of 32 bits."""
    for sh, mask in _SPREAD_STEPS:
        x = (x.bitwiseOR(F.shiftleft(x, sh))).bitwiseAND(F.lit(mask))
    return x


def zvalue16(x: Column, y: Column) -> Column:
    """32-bit Morton key interleaving two 16-bit dimensions (x in the
    even bit positions, y in the odd) — inputs are masked to 16 bits."""
    xs = _spread16(x.cast("long").bitwiseAND(F.lit(0xFFFF)))
    ys = _spread16(y.cast("long").bitwiseAND(F.lit(0xFFFF)))
    return xs.bitwiseOR(F.shiftleft(ys, 1))


def _sql_spread16(expr: str) -> str:
    for sh, mask in _SPREAD_STEPS:
        expr = f"((({expr}) | (({expr}) << {sh})) & {mask})"
    return expr


def sql_zvalue16(x_expr: str, y_expr: str) -> str:
    """DuckDB SQL computing the same value as :func:`zvalue16`.

    Substitutes each input expression multiple times — bind inputs to
    columns in a CTE first (the sql_mix32 discipline)."""
    xs = _sql_spread16(f"(CAST({x_expr} AS BIGINT) & 65535)")
    ys = _sql_spread16(f"(CAST({y_expr} AS BIGINT) & 65535)")
    return f"(({xs}) | (({ys}) << 1))"
