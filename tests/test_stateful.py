"""Stateful streaming deltas must equal the batch LAG transform,
regardless of micro-batch slicing."""

from __future__ import annotations

import os
import uuid

from pyspark.sql import functions as F

from smart_meter_data_pipeline_spark.operators.meter_pipeline import (
    gen_meter_readings,
    stg_transform,
)
from smart_meter_data_pipeline_spark.streaming.stateful import incremental_deltas


def test_incremental_deltas_match_batch(spark, tmp_path):
    """Split one day of readings into 4 time-ordered chunks delivered
    as separate files; the stateful operator's accumulated output must
    equal batch stg_transform exactly (integer deltas)."""
    readings = gen_meter_readings(spark, n_meters=30, n_ticks=32).cache()
    src = tmp_path / "stream_src"
    os.makedirs(src)
    # four chunks in time order (per-meter order preserved, as Kafka
    # key-partitioning would)
    for i in range(4):
        chunk = readings.filter(
            (F.hour("reading_timestamp") * 4 + F.minute("reading_timestamp") / 15)
            .cast("int")
            .between(i * 8, i * 8 + 7)
        )
        chunk.coalesce(1).write.parquet(str(src / f"chunk_{i}"))

    stream = (
        spark.readStream.schema(readings.schema)
        .option("maxFilesPerTrigger", 1)
        .parquet(str(src / "*"))
    )
    sink = f"stateful_{uuid.uuid4().hex[:8]}"
    q = (
        incremental_deltas(stream)
        .writeStream.format("memory")
        .queryName(sink)
        .outputMode("append")
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination()

    streamed = spark.table(sink).select(
        "meter_id",
        "reading_timestamp",
        "consumption_delta_mwh",
        "production_delta_mwh",
    )
    batch = stg_transform(readings).select(
        "meter_id",
        "reading_timestamp",
        F.col("consumption_delta_mwh").cast("long").alias("consumption_delta_mwh"),
        F.col("production_delta_mwh").cast("long").alias("production_delta_mwh"),
    )
    assert streamed.count() == batch.count() == 30 * 32
    assert streamed.exceptAll(batch).count() == 0
    assert batch.exceptAll(streamed).count() == 0


import pytest


@pytest.mark.parametrize("n_chunks", [1, 3, 8])
def test_incremental_deltas_chunking_invariant(spark, tmp_path, n_chunks):
    """The stateful operator's output must be identical no matter how
    the stream is sliced into micro-batches (1 = single batch, 8 =
    state crosses seven handoffs)."""
    readings = gen_meter_readings(spark, n_meters=12, n_ticks=24).cache()
    src = tmp_path / f"chunks_{n_chunks}"
    os.makedirs(src)
    ticks_per = 24 // n_chunks
    tick = (
        F.hour("reading_timestamp") * 4 + (F.minute("reading_timestamp") / 15)
    ).cast("int")
    for i in range(n_chunks):
        lo, hi = i * ticks_per, (i + 1) * ticks_per - 1
        chunk = readings.filter(tick.between(lo, 23 if i == n_chunks - 1 else hi))
        chunk.coalesce(1).write.parquet(str(src / f"chunk_{i}"))

    stream = (
        spark.readStream.schema(readings.schema)
        .option("maxFilesPerTrigger", 1)
        .parquet(str(src / "*"))
    )
    sink = f"stateful_inv_{uuid.uuid4().hex[:8]}"
    q = (
        incremental_deltas(stream)
        .writeStream.format("memory")
        .queryName(sink)
        .outputMode("append")
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination()
    streamed = spark.table(sink).select(
        "meter_id",
        "reading_timestamp",
        "consumption_delta_mwh",
        "production_delta_mwh",
    )
    batch = stg_transform(readings).select(
        "meter_id",
        "reading_timestamp",
        F.col("consumption_delta_mwh").cast("long").alias("consumption_delta_mwh"),
        F.col("production_delta_mwh").cast("long").alias("production_delta_mwh"),
    )
    assert streamed.count() == batch.count() == 12 * 24
    assert streamed.exceptAll(batch).count() == 0
    assert batch.exceptAll(streamed).count() == 0
