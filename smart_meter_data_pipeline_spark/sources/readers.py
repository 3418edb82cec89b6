"""Table readers (reference: S7 — dbt ``source()`` → table scan).

Spark-first: ``spark.read.parquet`` gives columnar scans with predicate
pushdown and column pruning for free; callers express filters/projections
declaratively and Catalyst pushes them into the scan (verify with
``df.explain``: ``PushedFilters`` / ``ReadSchema``).
"""

from __future__ import annotations

import os

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

TESTDATA_TABLES = (
    "region",
    "nation",
    "customer",
    "supplier",
    "part",
    "orders",
    "lineitem",
    "events",
    "documents",
    "embeddings",
)


# Columns stored as parquet TIMESTAMP(NANOS); with
# spark.sql.legacy.parquet.nanosAsLong they surface as LongType
# (nanoseconds since epoch) and are converted to microsecond timestamps
# here. Integer `div` (not float /) — nano values exceed float64's exact
# integer range. DuckDB truncates ns→us the same way for positive values.
_NANO_TS_COLUMNS = {"events": ("ts",)}


def load_table(spark: SparkSession, sf_dir: str, name: str) -> DataFrame:
    """Read one testdata table (parquet) from ``sf_dir``."""
    df = spark.read.parquet(os.path.join(sf_dir, f"{name}.parquet"))
    for col in _NANO_TS_COLUMNS.get(name, ()):
        if dict(df.dtypes).get(col) == "bigint":
            df = df.withColumn(
                col, F.timestamp_micros(F.expr(f"`{col}` div 1000"))
            )
    return df


def register_views(spark: SparkSession, sf_dir: str) -> None:
    """Register every testdata table as a temp view for ``spark.sql``."""
    for name in TESTDATA_TABLES:
        load_table(spark, sf_dir, name).createOrReplaceTempView(name)
