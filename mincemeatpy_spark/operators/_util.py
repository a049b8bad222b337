"""Shared expression helpers for oracle-exact determinism.

Floating-point SUM/AVG are order-dependent; Spark's partial aggregation
and DuckDB's will sum in different orders and differ in the last ulps,
which breaks value-hash comparison.  The fix: cast each row's value to a
decimal (exact arithmetic, order-independent), sum exactly, cast the total
back to double.  Per-row double expressions (products, 1-x, etc.) are IEEE
and bit-identical across engines, so the decimal cast sees identical
inputs and the final double is bit-identical too.

The oracle-side SQL must mirror the same shape:
``CAST(SUM(CAST(expr AS DECIMAL(18,6))) AS DOUBLE)``.
"""

from __future__ import annotations

from pyspark.sql import Column, functions as F

DEC = "decimal(18,6)"


def decsum(col: Column) -> Column:
    """Order-independent SUM of a double expression (see module doc)."""
    return F.sum(col.cast(DEC)).cast("double")


def decavg(col: Column) -> Column:
    """Order-independent AVG: exact decimal sum / count, in double."""
    return decsum(col) / F.count(F.lit(1))


def oracle_decsum(expr: str) -> str:
    """DuckDB SQL mirror of :func:`decsum`."""
    return f"CAST(SUM(CAST({expr} AS DECIMAL(18,6))) AS DOUBLE)"


def oracle_decavg(expr: str) -> str:
    """DuckDB SQL mirror of :func:`decavg`."""
    return f"{oracle_decsum(expr)} / COUNT(*)"
