"""Registry of engine queries and their DuckDB oracle SQL.

Every operator claimed in SURVEY.md §2 gets a named query here. The
callable signature is ``(spark, sf_dir) -> DataFrame``; the oracle is an
ANSI-SQL string DuckDB can run against the same parquet tables
(pre-registered views: region nation customer supplier part orders
lineitem events documents embeddings).

Hash-parity rules (the driver compares sorted-column value hashes):

1. Alias every computed column identically in Spark and SQL.
2. Never SUM raw doubles — FP addition is order-sensitive and Spark's
   partial aggregation order differs from DuckDB's. Instead cast each
   term to DECIMAL, SUM exactly, then CAST the total to DOUBLE:
   ``CAST(SUM(CAST(x AS DECIMAL(25,6))) AS DOUBLE)``. Per-row double
   arithmetic (a*b, a-b) is deterministic and safe.
3. All randomness must come from portable integer-mix hashes, never
   ``rand(seed)`` (engine-specific streams).
"""

from __future__ import annotations

from collections.abc import Callable

from pyspark.sql import DataFrame, SparkSession

QueryFn = Callable[[SparkSession, str], DataFrame]

QUERIES: dict[str, QueryFn] = {}
ORACLES: dict[str, str] = {}


def register(name: str, oracle: str | None = None) -> Callable[[QueryFn], QueryFn]:
    """Decorator: register a query, optionally with its DuckDB oracle SQL.

    Queries registered without an oracle get the driver's weaker
    rows-only check (reserved for genuinely non-SQL-expressible ops).
    """

    def deco(fn: QueryFn) -> QueryFn:
        QUERIES[name] = fn
        if oracle is not None:
            ORACLES[name] = oracle
        return fn

    return deco


def load_all() -> None:
    """Import every module that registers queries (idempotent)."""
    from smart_meter_data_pipeline_spark.operators import (  # noqa: F401
        curation,
        events_pipeline,
        extended,
        meter_pipeline,
        tpch,
        dedup,
        text,
        similarity,
        multimodal,
    )
    from smart_meter_data_pipeline_spark.streaming import stream_queries  # noqa: F401
