"""Stateful streaming deltas must equal the batch LAG transform,
regardless of micro-batch slicing."""

from __future__ import annotations

import pytest

import os
import uuid

from pyspark.sql import functions as F

from smart_meter_data_pipeline_spark.operators.meter_pipeline import (
    gen_meter_readings,
    stg_transform,
)
from smart_meter_data_pipeline_spark.streaming.stateful import incremental_deltas


@pytest.mark.slow
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




@pytest.mark.slow
def test_incremental_deltas_mixed_null_sequences(spark, tmp_path):
    """Meters whose counters are intermittently NULL must still match
    batch LAG semantics: a NULL-previous row falls back to the
    cumulative itself (COALESCE), NOT a delta against the last non-NULL
    value. The NULLs are placed so one sits immediately before a
    micro-batch boundary — the state handoff must carry the raw
    previous-row value (None included)."""
    import datetime as dt

    t0 = dt.datetime(2024, 3, 1, 0, 0)
    rows = []
    # meter 1: production NULL on ticks 1 and 3 (intermittent);
    # meter 2: consumption NULL on tick 2; meter 3: never NULL.
    series = {
        1: [(100, 10), (200, None), (350, 40), (500, None), (700, 90)],
        2: [(100, 5), (250, 15), (None, 30), (600, 50), (800, 80)],
        3: [(50, 1), (60, 2), (75, 4), (95, 7), (120, 11)],
    }
    for meter_id, ticks in series.items():
        for i, (cons, prod) in enumerate(ticks):
            rows.append(
                (t0 + dt.timedelta(minutes=15 * i), meter_id, cons, prod, "V")
            )
    readings = spark.createDataFrame(
        rows,
        "reading_timestamp timestamp, meter_id int, "
        "reading_consumption_milliwatts long, "
        "reading_production_milliwatts long, status string",
    ).cache()

    src = tmp_path / "null_chunks"
    os.makedirs(src)
    # boundary after tick 1 → meter 1's NULL production is the last
    # value of chunk 0; ticks 2-4 arrive in a later micro-batch.
    # (Absolute cutoff, NOT F.minute(): minute-of-hour would put the
    # 01:00 row in the first chunk and break time-ordered delivery.)
    first = F.col("reading_timestamp") < F.lit(t0 + dt.timedelta(minutes=30))
    readings.filter(first).coalesce(1).write.parquet(str(src / "c0"))
    readings.filter(~first).coalesce(1).write.parquet(str(src / "c1"))

    stream = (
        spark.readStream.schema(readings.schema)
        .option("maxFilesPerTrigger", 1)
        .parquet(str(src / "*"))
    )
    sink = f"stateful_null_{uuid.uuid4().hex[:8]}"
    q = (
        incremental_deltas(stream)
        .writeStream.format("memory")
        .queryName(sink)
        .outputMode("append")
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination()

    cols = [
        "meter_id",
        "reading_timestamp",
        "consumption_delta_mwh",
        "production_delta_mwh",
    ]
    streamed = spark.table(sink).select(*cols)
    batch = stg_transform(readings).select(
        "meter_id",
        "reading_timestamp",
        F.col("consumption_delta_mwh").cast("long").alias("consumption_delta_mwh"),
        F.col("production_delta_mwh").cast("long").alias("production_delta_mwh"),
    )
    assert streamed.count() == batch.count() == 15
    assert streamed.exceptAll(batch).count() == 0
    assert batch.exceptAll(streamed).count() == 0
    # spot-check the load-bearing rows: a NULL-previous counter must
    # fall back to the cumulative itself, not delta vs last non-NULL.
    got = {
        (r.meter_id, r.reading_timestamp.minute): (
            r.consumption_delta_mwh,
            r.production_delta_mwh,
        )
        for r in streamed.collect()
    }
    assert got[(1, 30)][1] == 40  # prod fallback (prev prod NULL)
    assert got[(2, 45)][0] == 600  # cons fallback (prev cons NULL)


@pytest.mark.parametrize("n_chunks", [1, 3, 8])
@pytest.mark.slow
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


@pytest.mark.slow
def test_incremental_deltas_restart_from_checkpoint(spark, tmp_path):
    """State must survive a full query stop/restart: drain chunk 0 with
    availableNow (parquet sink + checkpoint), stop, deliver chunk 1,
    restart from the SAME checkpoint — the combined output equals batch
    stg_transform, i.e. the restored per-meter state (not a re-emit of
    first-reading fallbacks) produced chunk 1's deltas."""
    readings = gen_meter_readings(spark, n_meters=15, n_ticks=24).cache()
    src = tmp_path / "restart_chunks"
    out = str(tmp_path / "restart_out")
    ckpt = str(tmp_path / "restart_ckpt")
    os.makedirs(src)
    half = F.hour("reading_timestamp") < 3
    readings.filter(half).coalesce(1).write.parquet(str(src / "c0"))

    def drain():
        stream = (
            spark.readStream.schema(readings.schema)
            .option("maxFilesPerTrigger", 1)
            .parquet(str(src / "*"))
        )
        q = (
            incremental_deltas(stream)
            .writeStream.format("parquet")
            .option("path", out)
            .option("checkpointLocation", ckpt)
            .outputMode("append")
            .trigger(availableNow=True)
            .start()
        )
        q.awaitTermination()

    drain()  # run 1: first half only
    n_first = spark.read.parquet(out).count()
    assert n_first == 15 * 12
    readings.filter(~half).coalesce(1).write.parquet(str(src / "c1"))
    drain()  # run 2: restart, second half against restored state

    streamed = spark.read.parquet(out).select(
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
    assert streamed.count() == batch.count() == 15 * 24
    assert streamed.exceptAll(batch).count() == 0
    assert batch.exceptAll(streamed).count() == 0


def test_running_totals_backends_equivalent(spark, sf_dir):
    """Both stateful backends must produce identical per-event running
    totals. The transformWithState leg skips (never fakes) when its
    Python runner's protobuf dependency is absent from the sandbox."""
    import os
    import shutil
    import tempfile
    import uuid

    import pytest as _pytest
    from pyspark.sql import functions as F

    from smart_meter_data_pipeline_spark.sources.readers import load_table
    from smart_meter_data_pipeline_spark.streaming.stateful import (
        running_user_totals,
    )

    def drain(api: str):
        workdir = tempfile.mkdtemp(prefix="smart_meter_tws_eq_")
        try:
            ev = load_table(spark, sf_dir, "events").select(
                "event_id", "user_id", "ts", "value"
            )
            mid = F.lit("2024-01-16 00:00:00").cast("timestamp")
            ev.filter(F.col("ts") < mid).coalesce(1).write.parquet(
                os.path.join(workdir, "chunk_0")
            )
            ev.filter(F.col("ts") >= mid).coalesce(1).write.parquet(
                os.path.join(workdir, "chunk_1")
            )
            stream = (
                spark.readStream.schema(ev.schema)
                .option("maxFilesPerTrigger", 1)
                .parquet(os.path.join(workdir, "*"))
            )
            sink = f"tws_eq_{uuid.uuid4().hex[:8]}"
            q = (
                running_user_totals(stream, api=api)
                .writeStream.format("memory")
                .queryName(sink)
                .outputMode("append")
                .trigger(availableNow=True)
                .start()
            )
            q.awaitTermination()
            return {
                (r["event_id"], r["user_id"]): r["running_value_micro"]
                for r in spark.table(sink).collect()
            }
        finally:
            shutil.rmtree(workdir, ignore_errors=True)

    base = drain("applyInPandasWithState")
    assert len(base) > 0
    _pytest.importorskip(
        "google.protobuf",
        reason="transformWithState Python runner requires protobuf",
    )
    assert drain("transformWithState") == base


def test_space_saving_fold_exact_and_eviction_regimes():
    from smart_meter_data_pipeline_spark.streaming.stateful import (
        space_saving_fold,
    )

    # exact regime: capacity never reached → plain counting
    m = {}
    space_saving_fold(m, [(1, 5), (2, 3)], capacity=4)
    space_saving_fold(m, [(1, 2), (3, 1)], capacity=4)
    assert m == {1: 7, 2: 3, 3: 1}

    # eviction: full map, new key takes over the min slot (ties →
    # smallest key) and inherits its count — the overestimate bound
    m = {10: 5, 20: 1, 30: 1}
    space_saving_fold(m, [(40, 2)], capacity=3)
    assert 20 not in m  # min count 1, tie broken to smallest key
    assert m == {10: 5, 30: 1, 40: 3}  # inherited 1 + 2

    # a true heavy hitter survives churn: feed capacity+many light
    # keys around one heavy key; heavy stays, count never undercounts
    m = {}
    items = [(99, 50)] + [(i, 1) for i in range(10)]
    space_saving_fold(m, items, capacity=4)
    assert 99 in m and m[99] >= 50
    assert len(m) == 4
