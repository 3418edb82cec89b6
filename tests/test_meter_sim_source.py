"""The meter_sim Python DataSource equals the DataFrame generator and
prunes meter-block partitions under pushed filters."""

from __future__ import annotations

import pytest
from pyspark.sql import functions as F

from smart_meter_data_pipeline_spark.operators.meter_pipeline import (
    gen_meter_readings,
)
from smart_meter_data_pipeline_spark.sources.meter_sim_source import (
    make_meter_sim_source,
)

N_M, N_T = 20, 24


@pytest.fixture(scope="module")
def registered(spark):
    spark.dataSource.register(make_meter_sim_source())
    # runtime-settable; required whenever a reader implements
    # pushFilters (Spark refuses to silently ignore the override)
    spark.conf.set("spark.sql.python.filterPushdown.enabled", "true")
    return spark


def _src(spark, **opts):
    r = spark.read.format("meter_sim")
    for k, v in {"n_meters": N_M, "n_ticks": N_T, **opts}.items():
        r = r.option(k, str(v))
    return r.load()


def test_source_rows_equal_dataframe_generator(registered, spark):
    got = sorted(map(tuple, _src(spark).collect()))
    want = sorted(map(tuple, gen_meter_readings(spark, N_M, N_T).collect()))
    assert got == want
    assert len(got) == N_M * N_T


def test_partition_parallel_blocks(registered, spark):
    df = _src(spark, meters_per_partition=5)
    assert df.rdd.getNumPartitions() == 4  # 20 meters / 5 per block


def test_filter_pushdown_prunes_meter_blocks(registered, spark):
    df = _src(spark, meters_per_partition=1).filter(F.col("meter_id") == 7)
    rows = df.collect()
    assert {r["meter_id"] for r in rows} == {7}
    assert len(rows) == N_T
    # one meter per partition + pushed equality → a single partition
    # survives planning (20 without pruning)
    assert df.rdd.getNumPartitions() <= 2

    rng = _src(spark, meters_per_partition=1).filter(
        (F.col("meter_id") >= 5) & (F.col("meter_id") < 8)
    )
    rng_rows = rng.collect()
    assert {r["meter_id"] for r in rng_rows} == {5, 6, 7}
    assert rng.rdd.getNumPartitions() <= 4


def test_overflow_guard(registered, spark):
    with pytest.raises(Exception, match="overflow|n_ticks"):
        _src(spark, n_ticks=100000).collect()


@pytest.mark.slow
def test_stream_reader_drains_to_batch_deltas(registered, spark, tmp_path):
    """availableNow drains the streaming source across multiple
    micro-batches (offset-sliced tick ranges); the union of emitted
    DELTAS reconstructs the batch generator's cumulative counters
    exactly — proving offset slicing loses/duplicates nothing."""
    import uuid as _uuid

    from pyspark.sql import Window

    stream = (
        spark.readStream.format("meter_sim")
        .option("n_meters", str(N_M))
        .option("n_ticks", str(N_T))
        .option("ticks_per_batch", "7")  # forces 4 uneven batches
        .load()
    )
    sink = f"meter_sim_stream_{_uuid.uuid4().hex[:8]}"
    q = (
        stream.writeStream.format("memory")
        .queryName(sink)
        .outputMode("append")
        .option("checkpointLocation", str(tmp_path / "ckpt"))
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination()
    drained = spark.table(sink)
    assert drained.count() == N_M * N_T

    w = (
        Window.partitionBy("meter_id")
        .orderBy("reading_timestamp")
        .rowsBetween(Window.unboundedPreceding, 0)
    )
    rebuilt = drained.select(
        "reading_timestamp",
        "meter_id",
        F.sum("reading_consumption_milliwatts")
        .over(w)
        .cast("int")
        .alias("reading_consumption_milliwatts"),
        F.sum("reading_production_milliwatts")
        .over(w)
        .cast("int")
        .alias("reading_production_milliwatts"),
        "status",
    )
    got = sorted(map(tuple, rebuilt.collect()))
    want = sorted(map(tuple, gen_meter_readings(spark, N_M, N_T).collect()))
    assert got == want


@pytest.mark.slow
def test_stream_checkpoint_recovery_exactly_once(registered, spark, tmp_path):
    """Kill the stream mid-drain, restart from the same checkpoint:
    the sink must end with every (meter, tick) row exactly once —
    offsets already committed are not re-emitted, offsets not yet
    processed are — the replayability contract the source's
    pure-function-of-offset-range design exists for."""
    out = str(tmp_path / "rows")
    ckpt = str(tmp_path / "ckpt")

    def start():
        return (
            spark.readStream.format("meter_sim")
            .option("n_meters", str(N_M))
            .option("n_ticks", str(N_T))
            .option("ticks_per_batch", "3")  # many small batches
            .load()
            .writeStream.format("parquet")
            .option("path", out)
            .option("checkpointLocation", ckpt)
            .outputMode("append")
        )

    q1 = start().trigger(processingTime="1 seconds").start()
    import time as _time

    deadline = _time.time() + 30
    while not q1.recentProgress and _time.time() < deadline:
        _time.sleep(0.5)
    q1.stop()  # mid-drain: some batches committed, some not
    q1.awaitTermination()

    q2 = start().trigger(availableNow=True).start()
    q2.awaitTermination()

    rows = spark.read.parquet(out).select(
        "meter_id", "reading_timestamp"
    ).collect()
    keys = [(r["meter_id"], r["reading_timestamp"]) for r in rows]
    assert len(keys) == N_M * N_T  # nothing lost
    assert len(set(keys)) == N_M * N_T  # nothing duplicated
