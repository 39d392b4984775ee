"""Cross-engine-deterministic arithmetic helpers.

Floating-point aggregation order differs between Spark (partial/final
partitions) and any oracle engine, so a raw ``sum(double)`` is not
hash-stable.  Money-style sums instead go through DECIMAL(18,6): decimal
addition is exact and order-independent, so Spark and DuckDB produce
bit-identical results, which we round and cast back to double for a
clean output schema (SURVEY.md §7.3.1).

Averages divide the exact decimal sum *as a double* by the count —
IEEE-754 double division is correctly rounded and engine-independent —
then round.
"""

from __future__ import annotations

from pyspark.sql import Column
from pyspark.sql import functions as F

DEC = "decimal(18,6)"


def dec(c: Column | str) -> Column:
    col = F.col(c) if isinstance(c, str) else c
    return col.cast(DEC)


def dround(c: Column | str, ndigits: int = 2) -> Column:
    """Per-row money rounding that agrees across engines.

    ``round(double, 2)`` differs between Spark (HALF_UP on the exact
    binary value) and DuckDB (scale-then-std::round) precisely when the
    value is an exact decimal half (e.g. price*(1-disc) = x.xx5).  Going
    through DECIMAL(18,6) first recovers the exact decimal in both
    engines, so the final HALF_UP round is identical."""
    return F.round(dec(c), ndigits).cast("double")


def sql_dround(expr: str, ndigits: int = 2) -> str:
    return f"CAST(round(CAST({expr} AS DECIMAL(18,6)), {ndigits}) AS DOUBLE)"


def dsum(c: Column | str, ndigits: int = 2) -> Column:
    """Order-independent sum of a double column, rounded, as double."""
    return F.round(F.sum(dec(c)), ndigits).cast("double")


def davg(c: Column | str, ndigits: int = 4) -> Column:
    """Deterministic mean: exact decimal sum → double division → round."""
    return F.round(F.sum(dec(c)).cast("double") / F.count(F.lit(1)), ndigits)


def sql_dsum(expr: str, ndigits: int = 2) -> str:
    """DuckDB-side twin of :func:`dsum` for oracle SQL strings."""
    return f"CAST(round(sum(CAST({expr} AS DECIMAL(18,6))), {ndigits}) AS DOUBLE)"


def sql_davg(expr: str, ndigits: int = 4) -> str:
    return (
        f"round(CAST(sum(CAST({expr} AS DECIMAL(18,6))) AS DOUBLE)"
        f" / count(*), {ndigits})"
    )


def finite(c: Column | str) -> Column:
    """TRUE iff the double is finite (not NULL/NaN/±Inf).  The
    quarantine predicate for metric columns that feed integer-unit
    casts: round(NaN·1e6)::BIGINT is a whole-query crash under ANSI in
    Spark and an INT128 conversion error in DuckDB (found by the
    round-8 NaN probe — the b80-digitless-props class for numerics),
    so every value-casting query filters on this, mirrored by
    ``WHERE isfinite(value)`` in its oracle.  At 100 TB a metrics
    pipeline quarantines non-finite readings; it must never crash on
    one."""
    col = F.col(c) if isinstance(c, str) else c
    return (
        ~F.isnan(col)
        & (col > F.lit(float("-inf")))
        & (col < F.lit(float("inf")))
    )
