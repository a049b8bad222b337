"""Shared expression helpers for oracle-exact determinism.

Floating-point SUM/AVG are order-dependent; Spark's partial aggregation
and DuckDB's will sum in different orders and differ in the last ulps,
which breaks value-hash comparison.  The fix: 6-decimal fixed-point —
scale each row's value to integer micro-units (``round(x * 1e6)`` as
BIGINT), sum exactly in a long accumulator, convert the total back to
double.  Every per-row step (IEEE multiply, half-up round, long sum,
long→double, IEEE divide) is bit-identical across engines regardless of
summation order, so the final double matches DuckDB exactly.

This replaced an earlier ``CAST(x AS DECIMAL(18,6))`` sum: same
semantics, but the long accumulator stays inside whole-stage codegen
(primitive ops) instead of allocating a BigDecimal per row — measured
2.4x faster on the TPC-H Q1 aggregate at sf0.1.

Range: totals are exact up to 2^63 micro-units ≈ 9.2e12 in value, ample
for any bench scale here.  These helpers exist for the oracle gate; a
production 100 TB aggregate would use plain ``F.sum`` (ulp-level
nondeterminism is inherent to distributed float summation and fine).

The oracle-side SQL must mirror the same shape:
``CAST(SUM(CAST(round(expr * 1000000) AS BIGINT)) AS DOUBLE) / 1000000``.
"""

from __future__ import annotations

from pyspark.sql import Column, functions as F

_SCALE = 1e6

# Decimal type for inline casts where a sum runs inside a window frame
# (windows.py) — frame sums are small, so BigDecimal cost is irrelevant
# there and the cast reads clearer than micro-scaling each frame.
DEC = "decimal(18,6)"


def decsum(col: Column) -> Column:
    """Order-independent SUM of a double expression (see module doc)."""
    return F.sum(F.round(col * _SCALE).cast("bigint")).cast("double") / F.lit(_SCALE)


def decavg(col: Column) -> Column:
    """Order-independent AVG: exact fixed-point sum / count, in double."""
    return decsum(col) / F.count(F.lit(1))


def oracle_decsum(expr: str) -> str:
    """DuckDB SQL mirror of :func:`decsum`."""
    # Outer parens: the template ends in a division, so composing it into
    # a larger expression (e.g. as a ratio's denominator) must not
    # re-associate under SQL's left-assoc '/'.
    return f"(CAST(SUM(CAST(round(({expr}) * 1000000) AS BIGINT)) AS DOUBLE) / 1000000)"


def oracle_decavg(expr: str) -> str:
    """DuckDB SQL mirror of :func:`decavg`."""
    return f"({oracle_decsum(expr)} / COUNT(*))"
