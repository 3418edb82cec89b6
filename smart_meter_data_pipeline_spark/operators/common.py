"""Shared expression helpers used across operators.

The one non-obvious pattern: **exact-decimal aggregation**. Floating-point
addition is not associative, and Spark's partial/final aggregation order
differs run-to-run and engine-to-engine. Summing doubles directly would
make results non-deterministic at scale (and break oracle hash-parity).
Casting each term to DECIMAL first makes the SUM exact and
order-insensitive; one final cast back to DOUBLE is deterministic. This
is also the right call at 100 TB: partial aggregation stays map-side
(decimal sums combine associatively), and results don't drift when AQE
changes the shuffle layout.
"""

from __future__ import annotations

from pyspark.sql import Column
from pyspark.sql import functions as F

# 25 integer digits / 6 fractional: wide enough that a 100 TB-scale SUM
# of per-row terms cannot overflow (Spark widens the accumulator to
# DECIMAL(35,6) internally), fine enough that casting a float64 term in
# loses nothing that survives the final round-trip to double.
EXACT_DECIMAL = "decimal(25,6)"


def dsum(col: str | Column, alias: str) -> Column:
    """Order-insensitive SUM of a double column via exact decimals."""
    c = F.col(col) if isinstance(col, str) else col
    return F.sum(c.cast(EXACT_DECIMAL)).cast("double").alias(alias)


def dsum_sql(expr: str, alias: str) -> str:
    """The DuckDB-oracle twin of :func:`dsum`."""
    return f"CAST(SUM(CAST({expr} AS DECIMAL(25,6))) AS DOUBLE) AS {alias}"


def guarded_pct(num: Column, den: Column, alias: str) -> Column:
    """``CASE WHEN den > 0 THEN num/den*100 ELSE 0 END`` (reference P10,
    fact_customer_billing_daily.sql:106-111)."""
    return (
        F.when(den > 0, num.cast("double") / den.cast("double") * F.lit(100.0))
        .otherwise(F.lit(0.0))
        .alias(alias)
    )
