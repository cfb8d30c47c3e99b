"""Deterministic floating aggregates.

Spark sums doubles partially per partition and merges in a nondeterministic order;
DuckDB sums sequentially.  For oracle-checked queries the cross-engine contract is:

1. per-row arithmetic stays in IEEE double (bit-identical in both engines),
2. the row value is cast to DECIMAL (exact, order-independent addition),
3. the DECIMAL sum is cast back to double and rounded.

This gives bit-identical results regardless of partitioning / merge order — the property
that makes an aggregate safely distributable at 100 TB *and* testable against a
single-threaded oracle.
"""

from __future__ import annotations

from pyspark.sql import Column
from pyspark.sql import functions as F

#: Decimal type used for exact accumulation: 38 total digits minus 6 scale leaves
#: 10^32 of headroom — safe at any realistic scale factor.
ACC = "decimal(29,6)"


def dsum(col: Column, round_to: int = 2) -> Column:
    """Order-independent SUM of a double expression (see module docstring)."""
    return F.round(F.sum(col.cast(ACC)).cast("double"), round_to)


def davg(col: Column, round_to: int = 6) -> Column:
    """Order-independent AVG: exact decimal sum / non-null count, rounded in double."""
    return F.round(F.sum(col.cast(ACC)).cast("double") / F.count(col), round_to)


def sql_dsum(expr: str, round_to: int = 2) -> str:
    """DuckDB spelling of :func:`dsum` (for oracle strings)."""
    return f"ROUND(CAST(SUM(CAST({expr} AS DECIMAL(29,6))) AS DOUBLE), {round_to})"


def sql_davg(expr: str, round_to: int = 6) -> str:
    return (f"ROUND(CAST(SUM(CAST({expr} AS DECIMAL(29,6))) AS DOUBLE)"
            f" / COUNT({expr}), {round_to})")
