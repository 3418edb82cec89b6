"""Bucketed fact layout: the co-location optimization SURVEY.md §4
flags as the one physical technique worth adding beyond defaults.

The staging LAG window, the (date, meter) first-level rollups, and the
meter-dim join all cluster on ``meter_id``. Writing the fact table
bucketed by ``meter_id`` (sorted within buckets by the window's sort
key) means a reader's scan already satisfies the
``ClusteredDistribution(meter_id)`` every one of those operators
requires — Catalyst elides the Exchange entirely, so at 100 TB the
mart rebuild does ZERO full-fact shuffles: the only exchanges left
move kilobyte-scale rollup rows.

This mirrors the reference's TimescaleDB layout choices: hypertable
chunks ⇔ date partitioning (``sources.ingest``), and
``compress_segmentby meter_id / orderby reading_timestamp``
(01_create_schema.sql:126-136) ⇔ bucket-by meter_id, sort-by
(meter_id, reading_timestamp).

Bucketing requires the table catalog (``saveAsTable``) — plain
``.parquet(path)`` writes carry no bucket metadata.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession

N_BUCKETS_DEFAULT = 32


def write_bucketed_fact(
    readings: DataFrame,
    table: str,
    n_buckets: int = N_BUCKETS_DEFAULT,
    mode: str = "overwrite",
) -> None:
    """Persist raw readings bucketed by meter_id, sorted within each
    bucket by (meter_id, reading_timestamp) — the LAG window's exact
    clustering + ordering."""
    (
        readings.write.mode(mode)
        .bucketBy(n_buckets, "meter_id")
        .sortBy("meter_id", "reading_timestamp")
        .format("parquet")
        .saveAsTable(table)
    )


def read_bucketed_fact(spark: SparkSession, table: str) -> DataFrame:
    """Scan the bucketed fact table; the scan's output partitioning is
    HashPartitioning(meter_id, n_buckets), which downstream windows /
    aggregations / co-bucketed joins consume without an Exchange."""
    return spark.table(table)
