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

#: Decimal type used for exact accumulation: 29 total digits minus 6 scale leaves
#: 10^23 of headroom — safe at any realistic scale factor.  The accumulation
#: DOMAIN is part of the contract: per-row |value| is expected below ~10^20;
#: non-finite values (NaN/±Inf — unencodable in decimal, and an ANSI
#: task-killing cast error) are treated as NULL and excluded, on both engines.
ACC = "decimal(29,6)"


def finite(col: Column) -> Column:
    """``col`` where finite, else NULL — the decimal contract's input guard.
    A single NaN metric row must not poison (or, under ANSI decimal casts,
    crash) a 100 TB nightly aggregate; exclusion is explicit and mirrored by
    :func:`sql_finite` so both engines agree cell-for-cell."""
    return F.when(~F.isnan(col) & (F.abs(col) != float("inf")), col)


def sql_finite(expr: str) -> str:
    """DuckDB spelling of :func:`finite`."""
    return f"(CASE WHEN isfinite({expr}) THEN {expr} END)"


def dsum(col: Column, round_to: int = 2) -> Column:
    """Order-independent SUM of a double expression (see module docstring).

    The ROUND happens in exact decimal space and the double cast comes LAST:
    rounding a double is itself engine-divergent at large magnitude (DuckDB's
    double ROUND multiplies by 10^d, overflowing int64 near |x|·10^d ≈ 9e18),
    while decimal ROUND is exact HALF_UP on both engines and the final
    decimal→double cast is the same round-to-nearest everywhere."""
    return F.round(F.sum(finite(col).cast(ACC)), round_to).cast("double")


def davg(col: Column, round_to: int = 6) -> Column:
    """Order-independent AVG: exact decimal sum / finite count, rounded in double."""
    f = finite(col)
    return F.round(F.sum(f.cast(ACC)).cast("double") / F.count(f), round_to)


def sql_dsum(expr: str, round_to: int = 2) -> str:
    """DuckDB spelling of :func:`dsum` (for oracle strings).

    The decimal→double conversion goes THROUGH VARCHAR: DuckDB's direct
    decimal→double cast double-rounds (int128→double, then ÷10^scale) and is
    off by an ulp once the scaled integer exceeds 2^53, while its
    string→double parse — like Spark's BigDecimal.doubleValue — is correctly
    rounded."""
    return (f"CAST(CAST(ROUND(SUM(CAST({sql_finite(expr)} AS DECIMAL(29,6))), "
            f"{round_to}) AS VARCHAR) AS DOUBLE)")


def sql_davg(expr: str, round_to: int = 6) -> str:
    """Decimal→double via VARCHAR, like :func:`sql_dsum`; the division and
    final ROUND stay in double on both engines (identical inputs → identical
    outputs; the double ROUND is safe here because an average's magnitude is
    bounded by the max row value, far from the 9e18·10^-d overflow band)."""
    return (f"ROUND(CAST(CAST(SUM(CAST({sql_finite(expr)} AS DECIMAL(29,6))) "
            f"AS VARCHAR) AS DOUBLE) / COUNT({sql_finite(expr)}), {round_to})")
