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


# Columns whose on-disk physical encoding has drifted across testdata
# regenerations (TIMESTAMP(NANOS) → plain TIMESTAMP(MICROS) without
# isAdjustedToUTC). `normalize_timestamps` accepts every encoding seen
# so far and lands on TimestampType regardless:
# - NANOS + nanosAsLong ⇒ LongType (ns since epoch) ⇒ integer `div`
#   (not float /: nano values exceed float64's exact integer range;
#   DuckDB truncates ns→us the same way for positive values).
# - MICROS without UTC adjustment ⇒ TIMESTAMP_NTZ ⇒ cast to TIMESTAMP.
#   Under the pinned UTC session (see _RUNTIME_CONFS) the cast
#   reinterprets the wall clock as UTC — byte-identical micros, and the
#   same instants DuckDB reads from the file.
_NANO_TS_COLUMNS = {"events": ("ts",)}

# Runtime-settable confs every query depends on, applied here so reads
# work in ANY caller-provided session, not only ``session.get_spark()``'s:
# - nanosAsLong: events.parquet stores TIMESTAMP(NANOS), which the
#   vectorized parquet reader otherwise rejects (PARQUET_TYPE_ILLEGAL).
# - UTC session timezone: day/hour bucketing and the DuckDB oracle both
#   assume UTC; a host-local timezone would shift date_trunc results.
_RUNTIME_CONFS = {
    "spark.sql.legacy.parquet.nanosAsLong": "true",
    "spark.sql.session.timeZone": "UTC",
    # INT96 (the legacy default) carries NO footer min/max statistics,
    # which silently disables the manifest's per-file TIMESTAMP stats
    # (time-range file skipping). INT64 micros is the modern type
    # (Spark reads both), values are identical.
    "spark.sql.parquet.outputTimestampType": "TIMESTAMP_MICROS",
}


def ensure_runtime_confs(spark: SparkSession) -> None:
    """Idempotently apply session confs required for correct reads."""
    for key, value in _RUNTIME_CONFS.items():
        if spark.conf.get(key, None) != value:
            spark.conf.set(key, value)


def normalize_timestamps(df: DataFrame, nano_cols: tuple = ()) -> DataFrame:
    """Normalize physically-drifting time columns to ``TimestampType``.

    Works on batch AND streaming frames (pure projections). Every
    ``timestamp_ntz`` column is cast to ``timestamp`` (UTC session ⇒
    same micros); columns listed in ``nano_cols`` that surfaced as
    ``bigint`` under nanosAsLong are truncated ns→us.
    """
    for col, dtype in df.dtypes:
        if dtype == "timestamp_ntz":
            df = df.withColumn(col, F.col(col).cast("timestamp"))
        elif col in nano_cols and dtype == "bigint":
            df = df.withColumn(
                col, F.timestamp_micros(F.expr(f"`{col}` div 1000"))
            )
    return df


def load_table(spark: SparkSession, sf_dir: str, name: str) -> DataFrame:
    """Read one testdata table (parquet) from ``sf_dir``."""
    ensure_runtime_confs(spark)
    df = spark.read.parquet(os.path.join(sf_dir, f"{name}.parquet"))
    return normalize_timestamps(df, _NANO_TS_COLUMNS.get(name, ()))


def register_views(spark: SparkSession, sf_dir: str) -> None:
    """Register every testdata table as a temp view for ``spark.sql``."""
    for name in TESTDATA_TABLES:
        load_table(spark, sf_dir, name).createOrReplaceTempView(name)
