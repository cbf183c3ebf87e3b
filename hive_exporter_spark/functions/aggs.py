"""Deterministic numeric aggregates.

Summing doubles is order-dependent, and Spark's partial (map-side)
aggregation order varies with partitioning — so a plain
``SUM(double)`` can drift in the last ulp between runs and between
engines. For oracle-checkable results the engine aggregates through
DECIMAL (exact, associative, order-independent) and casts the final
value back to DOUBLE. The DuckDB oracle does the identical
``CAST(SUM(CAST(x AS DECIMAL(p,s))) AS DOUBLE)`` dance, so the hashes
match bit-for-bit. This costs ~nothing at scale (decimal sum is still
a single-pass partial agg with map-side combine).
"""

from __future__ import annotations

from pyspark.sql import Column
from pyspark.sql import functions as F

DEC = "decimal(28,6)"


def dsum(col: str | Column) -> Column:
    """Order-independent SUM: sum as decimal(28,6), emit double."""
    c = F.col(col) if isinstance(col, str) else col
    return F.sum(c.cast(DEC)).cast("double")


def davg(col: str | Column) -> Column:
    """Order-independent AVG: decimal sum / count, emitted as double."""
    c = F.col(col) if isinstance(col, str) else col
    return (F.sum(c.cast(DEC)).cast("double") / F.count(c)).cast("double")


def dsum_sql(expr: str) -> str:
    """DuckDB-side twin of :func:`dsum` for oracle SQL strings."""
    return f"CAST(SUM(CAST(({expr}) AS DECIMAL(28,6))) AS DOUBLE)"


def davg_sql(expr: str) -> str:
    """DuckDB-side twin of :func:`davg`."""
    return (
        f"CAST(CAST(SUM(CAST(({expr}) AS DECIMAL(28,6))) AS DOUBLE)"
        f" / COUNT({expr}) AS DOUBLE)"
    )
