"""Compaction must shrink the file count without changing the data."""

from __future__ import annotations

import pytest

import os

from pyspark.sql import functions as F

from smart_meter_data_pipeline_spark.operators.meter_pipeline import (
    gen_meter_readings,
)
from smart_meter_data_pipeline_spark.sources.maintenance import compact_table


@pytest.mark.slow
def test_compaction_preserves_rows_and_shrinks_files(spark, tmp_path):
    target = str(tmp_path / "fact")
    readings = gen_meter_readings(spark, n_meters=50, n_ticks=96).withColumn(
        "reading_date", F.col("reading_timestamp").cast("date")
    )
    # simulate micro-batch litter: 12 small appends
    for i in range(12):
        readings.filter(F.col("meter_id") % 12 == i).repartition(4).write.mode(
            "append"
        ).partitionBy("reading_date").parquet(target)

    # materialize the baseline BEFORE compaction swaps the files out
    before_rows = sorted(
        (r["reading_timestamp"], r["meter_id"], r["reading_consumption_milliwatts"])
        for r in spark.read.parquet(target).collect()
    )
    part = [d for d in os.listdir(target) if d.startswith("reading_date=")][0]
    files_before = len(
        [f for f in os.listdir(os.path.join(target, part)) if f.endswith(".parquet")]
    )
    assert files_before >= 12

    result = compact_table(spark, target)
    files_after = sum(result.values())
    assert files_after < files_before
    assert files_after == len(result)  # tiny data → 1 file per date

    after_rows = sorted(
        (r["reading_timestamp"], r["meter_id"], r["reading_consumption_milliwatts"])
        for r in spark.read.parquet(target).collect()
    )
    assert after_rows == before_rows


def test_compaction_skips_active_date(spark, tmp_path):
    target = str(tmp_path / "fact")
    readings = gen_meter_readings(spark, n_meters=10, n_ticks=8).withColumn(
        "reading_date", F.col("reading_timestamp").cast("date")
    )
    readings.repartition(6).write.partitionBy("reading_date").parquet(target)
    dates = [
        d.split("=", 1)[1]
        for d in os.listdir(target)
        if d.startswith("reading_date=")
    ]
    result = compact_table(spark, target, skip_dates=set(dates))
    assert result == {}


def test_retention_sweep(spark, tmp_path):
    from smart_meter_data_pipeline_spark.operators.meter_pipeline import (
        gen_meter_readings,
    )
    from smart_meter_data_pipeline_spark.sources.maintenance import (
        retention_sweep,
    )
    from pyspark.sql import functions as F

    target = str(tmp_path / "fact")
    # 3 simulated days → 3 date partitions
    readings = gen_meter_readings(spark, n_meters=5, n_ticks=96 * 3)
    (
        readings.withColumn("reading_date", F.to_date("reading_timestamp"))
        .write.partitionBy("reading_date")
        .parquet(target)
    )
    import os

    parts = sorted(
        n.split("=", 1)[1]
        for n in os.listdir(target)
        if n.startswith("reading_date=")
    )
    assert len(parts) == 3
    dropped = retention_sweep(target, keep_after=parts[1])
    assert dropped == [parts[0]]
    left = spark.read.parquet(target)
    assert left.select("reading_date").distinct().count() == 2
    assert retention_sweep(target, keep_after=parts[0]) == []
