"""Driver contract for the spark-graft builder (PySpark target).

The driver's verify runs ``entry(spark)`` as a smoke check, runs
each ``queries()[name]`` at sf=0.01 and compares it against the
matching ``oracle_sql()[name]`` via DuckDB (row-count + schema +
order-insensitive value-hash → CORRECTNESS_r{N}.json).

All real logic lives in the ``smart_meter_data_pipeline_spark``
package; this file only adapts its query registry to the driver's
shape.
"""

from __future__ import annotations

import os
import sys
from collections.abc import Callable

from pyspark.sql import DataFrame, SparkSession

sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))

from smart_meter_data_pipeline_spark.plans import registry  # noqa: E402


def _loaded() -> None:
    registry.load_all()


def entry(spark: SparkSession) -> DataFrame:
    """Flagship query: the daily customer billing mart (two-level
    rollup with LAG staging, dim joins, rate + guarded pct) on
    /root/testdata/sf0.001."""
    _loaded()
    return registry.QUERIES["daily_customer_billing"](spark, "/root/testdata/sf0.001")


def queries() -> dict[str, Callable[[SparkSession, str], DataFrame]]:
    """One entry per implemented operator from SURVEY.md §2."""
    _loaded()
    return dict(registry.QUERIES)


def oracle_sql() -> dict[str, str]:
    """DuckDB-equivalent SQL for every hash-checkable query; entries
    absent here (non-SQL-expressible ops) get the rows-only check."""
    _loaded()
    return dict(registry.ORACLES)
