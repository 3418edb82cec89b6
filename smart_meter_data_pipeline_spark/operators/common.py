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


def distributed_prefix_sum(
    df,
    order_cols,
    value_col: str,
    out_col: str,
    n_parts: int | None = None,
):
    """Cumulative ``SUM(value_col)`` over *df* ordered by *order_cols*
    WITHOUT the global single-partition window an un-partitioned
    ``SUM(...) OVER (ORDER BY ...)`` plans to.

    The classic two-pass distributed prefix sum (VERDICT r9 #3):

    1. ``repartitionByRange`` on the order key — global order across
       partitions, equal keys co-located — then ``localCheckpoint`` to
       pin partition ids (the subtotal pass and the cumsum pass must
       see the SAME pid assignment; checkpointing also makes the range
       exchange run once).
    2. Per-partition subtotals: a bounded frame (``<= n_parts`` rows)
       collected to the driver and turned into broadcast offsets
       (``offset[pid] = sum of subtotals of all earlier pids``) — the
       same bounded-metadata-collect pattern as the Bloom bitmap and
       greedy-argmax sites.
    3. The cumulative window runs ``partitionBy(spark_partition_id)``
       — every task sums only its own range; no Exchange
       SinglePartition anywhere in the plan.

    The result is invariant to where the sampled range boundaries
    fall: ``cum(row) = offset(pid) + local_cumsum(row)`` equals the
    global prefix sum for ANY contiguous split of a totally-ordered
    key. *order_cols* must therefore form a total order (unique key
    tuples — e.g. a DISTINCT-value rollup key, or (measure, pk));
    duplicate tuples would make per-row cumulative values
    tie-order-dependent under ANY engine, including the global window
    this replaces.

    ``value_col`` must be integer-typed (the offsets are carried as
    exact int64 — consistent with the engine's int-first cumulative
    discipline; see EXACT_DECIMAL note above for why float cumsums are
    banned from hashed outputs anyway).
    """
    from pyspark.sql import Window

    spark = df.sparkSession
    if n_parts is None:
        n_parts = int(spark.conf.get("spark.sql.shuffle.partitions", "32"))
    part = (
        df.repartitionByRange(n_parts, *order_cols)
        .withColumn("_pfx_pid", F.spark_partition_id())
        .localCheckpoint(eager=True)
    )
    subtot = (
        part.groupBy("_pfx_pid")
        .agg(F.sum(value_col).alias("s"))
        .collect()
    )  # bounded: <= n_parts rows
    running = 0
    offsets = []
    for r in sorted(subtot, key=lambda r: r["_pfx_pid"]):
        offsets.append((r["_pfx_pid"], running))
        running += int(r["s"] or 0)
    off_df = spark.createDataFrame(
        offsets or [(0, 0)], "_pfx_pid INT, _pfx_off BIGINT"
    )
    w_local = (
        Window.partitionBy("_pfx_pid")
        .orderBy(*order_cols)
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    )
    return (
        part.join(F.broadcast(off_df), "_pfx_pid")
        .withColumn(
            out_col,
            (F.col("_pfx_off") + F.sum(value_col).over(w_local)).cast(
                "bigint"
            ),
        )
        .drop("_pfx_pid", "_pfx_off")
    )


def distributed_row_number(df, order_cols, out_col: str, n_parts=None):
    """``ROW_NUMBER() OVER (ORDER BY ...)`` without the
    single-partition window: a :func:`distributed_prefix_sum` of
    constant 1s. Same total-order requirement (unique key tuples)."""
    tmp = df.withColumn("_pfx_one", F.lit(1).cast("bigint"))
    return distributed_prefix_sum(
        tmp, order_cols, "_pfx_one", out_col, n_parts
    ).drop("_pfx_one")


def ntile_sql(r: str, n: int, k: int) -> str:
    """SQL-standard ``NTILE(k)`` from a row number: the first
    ``n % k`` tiles carry ``n div k + 1`` rows, the rest ``n div k``
    — the exact engine semantics, computed from (row_number, total)
    so the tile assignment needs NO window at all (the row number
    comes from the distributed prefix sum). Guarded so the ELSE
    branch (which divides by ``n div k``) is unreachable when
    ``n < k``."""
    q, rem = n // k, n % k
    big = q + 1
    if q == 0:
        return f"CAST(({r} - 1) + 1 AS INT)"
    return (
        f"CAST(CASE WHEN {r} <= {rem * big}"
        f" THEN ({r} - 1) div {big} + 1"
        f" ELSE {rem} + ({r} - {rem * big} - 1) div {q} + 1 END AS INT)"
    )
