"""Structured Streaming tests: checkpointed ingest with redelivery
across micro-batches, progress listener, and stream-vs-batch parity."""

from __future__ import annotations

import pytest

import os
import time

from pyspark.sql import functions as F

from smart_meter_data_pipeline_spark.operators.meter_pipeline import (
    gen_meter_readings,
)
from smart_meter_data_pipeline_spark.streaming.ingest_stream import (
    ProgressRecorder,
    start_ingest_stream,
)
from smart_meter_data_pipeline_spark.streaming.stream_queries import (
    _wire_format,
    stream_hourly_events,
)


def _eventually(predicate, timeout: float = 20.0, interval: float = 0.2):
    """StreamingQueryListener events are delivered on the py4j callback
    thread ASYNCHRONOUSLY — ``awaitTermination`` returning does not
    guarantee the Python listener has seen the last batch's progress
    yet. Poll briefly before asserting on listener state (the r14 full
    suite caught exactly this race once in ~3 green runs)."""
    deadline = time.monotonic() + timeout
    while time.monotonic() < deadline:
        if predicate():
            return True
        time.sleep(interval)
    return predicate()


def test_stream_ingest_redelivery(spark, tmp_path):
    """Duplicate deliveries split across micro-batches must land
    exactly once (T1), and the listener must observe progress (T7)."""
    src = tmp_path / "msgs"
    target = str(tmp_path / "fact")
    ckpt = str(tmp_path / "ckpt")
    os.makedirs(src)
    readings = gen_meter_readings(spark, n_meters=20, n_ticks=8)
    wire = _wire_format(readings).select("value")
    wire.coalesce(2).write.mode("overwrite").text(str(src / "d1"))
    wire.coalesce(2).write.mode("overwrite").text(str(src / "d2"))

    rec = ProgressRecorder()
    spark.streams.addListener(rec)
    try:
        q = start_ingest_stream(
            spark, str(src / "*" / "*.txt"), target, ckpt, available_now=True
        )
        q.awaitTermination()
    finally:
        spark.streams.removeListener(rec)

    fact = spark.read.parquet(target)
    assert fact.count() == 20 * 8  # duplicates dropped
    assert fact.select("reading_timestamp", "meter_id").distinct().count() == 20 * 8
    _eventually(
        lambda: sum(p["numInputRows"] for p in rec.progress) == 2 * 20 * 8
    )
    assert sum(p["numInputRows"] for p in rec.progress) == 2 * 20 * 8


def test_stream_resume_from_checkpoint(spark, tmp_path):
    """New files after a stop are picked up by a restarted query from
    the same checkpoint; already-processed files are not reprocessed
    (T8 graceful-shutdown / restart semantics)."""
    src = tmp_path / "msgs"
    target = str(tmp_path / "fact")
    ckpt = str(tmp_path / "ckpt")
    os.makedirs(src)
    r1 = gen_meter_readings(spark, n_meters=10, n_ticks=4)
    _wire_format(r1).select("value").coalesce(1).write.text(str(src / "d1"))
    q = start_ingest_stream(spark, str(src / "*" / "*.txt"), target, ckpt)
    q.awaitTermination()
    assert spark.read.parquet(target).count() == 40

    r2 = gen_meter_readings(spark, n_meters=10, n_ticks=8)  # superset: 4 new ticks each
    _wire_format(r2).select("value").coalesce(1).write.text(str(src / "d2"))
    q2 = start_ingest_stream(spark, str(src / "*" / "*.txt"), target, ckpt)
    q2.awaitTermination()
    fact = spark.read.parquet(target)
    assert fact.count() == 80
    assert fact.select("reading_timestamp", "meter_id").distinct().count() == 80


def test_stream_watermark_drops_late_rows(spark, tmp_path):
    """T4: rows arriving after the watermark passed their window are
    dropped; finalized windows contain only on-time data. Two files,
    one micro-batch each (maxFilesPerTrigger=1): file 1 advances the
    watermark to 11:00; file 2's 09:10 row is then late (its window
    closed) while its 11:40 row is accepted into open state."""
    import json

    src = tmp_path / "late"
    os.makedirs(src)

    def write_file(name, rows, mtime):
        p = src / name
        with open(p, "w") as f:
            for r in rows:
                f.write(json.dumps(r) + "\n")
        os.utime(p, (mtime, mtime))

    out_dir = str(tmp_path / "out")
    ckpt = str(tmp_path / "ckpt")

    def run_available() -> None:
        # Separate availableNow runs against the SAME checkpoint: the
        # watermark persists across restarts, so the second run starts
        # with the watermark the first run established.
        stream = spark.readStream.schema("ts timestamp, v double").json(
            str(src)
        )
        agg = (
            stream.withWatermark("ts", "30 minutes")
            .groupBy(F.window("ts", "1 hour").alias("w"))
            .agg(F.count(F.lit(1)).alias("n"), F.sum("v").alias("sv"))
        )
        q = (
            agg.writeStream.outputMode("append")
            .format("parquet")
            .option("path", out_dir)
            .option("checkpointLocation", ckpt)
            .trigger(availableNow=True)
            .start()
        )
        q.awaitTermination()

    write_file(
        "f1.json",
        [
            {"ts": "2024-01-01 10:05:00", "v": 1.0},
            {"ts": "2024-01-01 10:15:00", "v": 2.0},
            {"ts": "2024-01-01 11:30:00", "v": 3.0},
        ],
        1_000_000_000,
    )
    run_available()  # watermark after this run: 11:30 − 30min = 11:00

    write_file(
        "f2.json",
        [
            {"ts": "2024-01-01 09:10:00", "v": 100.0},  # late: window closed
            {"ts": "2024-01-01 11:40:00", "v": 4.0},  # on time: open state
        ],
        1_000_000_100,
    )
    run_available()

    out = {
        r["w"]["start"].hour: (r["n"], r["sv"])
        for r in spark.read.parquet(out_dir).collect()
    }
    assert 9 not in out  # late row's window was already closed → dropped
    assert out[10] == (2, 3.0)  # finalized with only the on-time rows
    assert 11 not in out  # still open (watermark 11:10 < 12:00), not emitted


def test_stream_hourly_matches_batch(spark, sf_dir):
    """The streaming windowed aggregation equals the batch GROUP BY."""
    streamed = stream_hourly_events(spark, sf_dir)
    from smart_meter_data_pipeline_spark.operators.common import dsum
    from smart_meter_data_pipeline_spark.sources.readers import load_table

    batch = (
        load_table(spark, sf_dir, "events")
        .groupBy(F.date_trunc("hour", "ts").alias("load_hour"), "event_type")
        .agg(F.count(F.lit(1)).alias("n_events"), dsum("value", "total_value"))
    )
    assert streamed.count() == batch.count()
    assert streamed.exceptAll(batch).count() == 0


def test_stream_quarantine_and_lag_report(spark, tmp_path):
    """Invalid messages land in the quarantine table (not silently
    dropped), per-batch observed metrics count consumed/rejected, and
    the listener derives the reference monitor's lag report (backlog /
    pct_consumed — monitor/kafka_monitor.py:117-167): drained stream ⇒
    backlog 0, 100% consumed."""
    import json

    src = tmp_path / "msgs"
    target = str(tmp_path / "fact")
    quarantine = str(tmp_path / "quarantine")
    ckpt = str(tmp_path / "ckpt")
    os.makedirs(src / "d1")

    good = {
        "meter_id": 7,
        "reading_timestamp": "2024-01-01T00:15:00",
        "reading_consumption_milliwatts": 1000,
        "status": "V",
    }
    lines = [
        json.dumps(good),
        json.dumps(dict(good, reading_timestamp="2024-01-01T00:30:00")),
        "{broken json",
        json.dumps(dict(good, status="X")),
    ]
    with open(src / "d1" / "m.txt", "w") as f:
        f.write("\n".join(lines) + "\n")

    rec = ProgressRecorder()
    spark.streams.addListener(rec)
    try:
        q = start_ingest_stream(
            spark,
            str(src / "*" / "*.txt"),
            target,
            ckpt,
            available_now=True,
            quarantine_target=quarantine,
        )
        q.awaitTermination()
    finally:
        spark.streams.removeListener(rec)

    assert spark.read.parquet(target).count() == 2
    qrows = spark.read.parquet(quarantine)
    assert qrows.count() == 2
    reasons = sorted(r["reject_reason"] for r in qrows.collect())
    assert reasons == ["bad_status", "malformed_json"]
    assert set(qrows.columns) >= {"reject_reason", "batch_id"}

    def _consumed() -> int:
        return sum(
            (p["observedMetrics"].get("ingest") or {}).get("consumed", 0)
            for p in rec.progress
        )

    _eventually(lambda: _consumed() >= 4)
    report = rec.lag_report()
    assert report["backlog"] == 0
    assert report["pct_consumed"] == 100.0
    assert report["sources"], "per-source detail expected"
    observed = [
        p["observedMetrics"].get("ingest")
        for p in rec.progress
        if p["observedMetrics"].get("ingest")
    ]
    assert sum(m["consumed"] for m in observed) == 4
    assert sum(m["rejected"] for m in observed) == 2


def test_stream_foreachbatch_manifest_sink_exactly_once(spark, tmp_path):
    """The object-store sink under Structured Streaming: duplicate
    deliveries split across micro-batches drain through foreachBatch →
    manifest commit log and land exactly once — the same T1 guarantee
    as the flock sink, but via put-if-absent commits (the path a
    1000-executor S3 deployment uses). The commit log must show one
    commit per non-empty batch and no orphaned data files."""
    from smart_meter_data_pipeline_spark.sources.manifest import ManifestTable

    src = tmp_path / "msgs"
    target = str(tmp_path / "fact_manifest")
    ckpt = str(tmp_path / "ckpt")
    os.makedirs(src)
    readings = gen_meter_readings(spark, n_meters=20, n_ticks=8)
    wire = _wire_format(readings).select("value")
    wire.coalesce(2).write.mode("overwrite").text(str(src / "d1"))
    wire.coalesce(2).write.mode("overwrite").text(str(src / "d2"))

    q = start_ingest_stream(
        spark, str(src / "*" / "*.txt"), target, ckpt,
        available_now=True, sink="manifest",
    )
    q.awaitTermination()

    t = ManifestTable(target)
    fact = t.read(spark)
    assert fact.count() == 20 * 8  # duplicates dropped
    assert (
        fact.select("reading_timestamp", "meter_id").distinct().count()
        == 20 * 8
    )
    commits = t.snapshot()
    assert sum(c["count"] for c in commits) == 20 * 8
    # every staged data file is referenced by a commit (no orphans in
    # the happy path)
    committed = {f for c in commits for f in c["added"]}
    on_disk = set()
    for root, _dirs, files in os.walk(t.data_dir):
        for f in files:
            if f.endswith(".parquet"):
                rel = os.path.relpath(os.path.join(root, f), t.data_dir)
                on_disk.add(rel)
    assert on_disk == committed


@pytest.mark.slow
def test_stream_restatement_upsert_sink(spark, tmp_path):
    """Streaming MERGE: a restatement feed (same PKs, corrected
    values) drains through foreachBatch → ManifestTable.upsert.
    Delivery 1 inserts the baseline; delivery 2 re-states a subset
    with corrected consumption — an insert-only dedup sink would DROP
    those corrections as duplicates; the upsert sink must apply them
    as the post-image while leaving untouched meters alone."""
    from smart_meter_data_pipeline_spark.sources.manifest import ManifestTable

    src = tmp_path / "msgs"
    target = str(tmp_path / "fact_upsert")
    ckpt = str(tmp_path / "ckpt")
    os.makedirs(src)
    readings = gen_meter_readings(spark, n_meters=10, n_ticks=4)  # 40 rows
    _wire_format(readings).select("value").coalesce(1).write.text(
        str(src / "d1")
    )
    q = start_ingest_stream(
        spark, str(src / "*" / "*.txt"), target, ckpt,
        available_now=True, sink="manifest_upsert",
    )
    q.awaitTermination()
    t = ManifestTable(target)
    assert t.read(spark).count() == 40

    restated = readings.filter(F.col("meter_id") <= 5).withColumn(
        "reading_consumption_milliwatts",
        F.col("reading_consumption_milliwatts") + F.lit(999_983),
    )
    _wire_format(restated).select("value").coalesce(1).write.text(
        str(src / "d2")
    )
    q2 = start_ingest_stream(
        spark, str(src / "*" / "*.txt"), target, ckpt,
        available_now=True, sink="manifest_upsert",
    )
    q2.awaitTermination()

    fact = t.read(spark)
    assert fact.count() == 40  # restatement adds no rows
    assert (
        fact.select("reading_timestamp", "meter_id").distinct().count() == 40
    )
    # corrected meters carry the post-image, others the original
    expected = readings.withColumn(
        "expect_mw",
        F.when(
            F.col("meter_id") <= 5,
            F.col("reading_consumption_milliwatts") + F.lit(999_983),
        ).otherwise(F.col("reading_consumption_milliwatts")),
    ).select("reading_timestamp", "meter_id", "expect_mw")
    mismatches = (
        fact.join(expected, ["reading_timestamp", "meter_id"])
        .filter(
            F.col("reading_consumption_milliwatts") != F.col("expect_mw")
        )
        .count()
    )
    assert mismatches == 0
    # the restatement landed as ONE copy-on-write commit
    assert any(c.get("removed") for c in t.snapshot())


@pytest.mark.slow
def test_stream_upsert_if_newer_out_of_order_batches(spark, tmp_path):
    """Ordering-guarded streaming MERGE: corrections arrive in batch 1,
    the STALE baseline replays in batch 2 (out-of-order delivery).
    The guarded sink drops the stale rows on the monotone register
    value and keeps the corrections; the plain last-write-wins upsert
    sink, fed the identical sequence, REGRESSES them — the contrast
    that motivates the sink. A third drain replaying the corrections
    is an idempotent no-op in effect."""
    from smart_meter_data_pipeline_spark.sources.manifest import ManifestTable

    readings = gen_meter_readings(spark, n_meters=10, n_ticks=4)  # 40 rows
    corrected = readings.filter(F.col("meter_id") <= 5).withColumn(
        "reading_consumption_milliwatts",
        F.col("reading_consumption_milliwatts") + F.lit(999_983),
    )

    def run(name, sink):
        src = tmp_path / f"msgs_{name}"
        target = str(tmp_path / f"fact_{name}")
        ckpt = str(tmp_path / f"ckpt_{name}")
        os.makedirs(src)
        glob = str(src / "*" / "*.txt")
        _wire_format(corrected).select("value").coalesce(1).write.text(
            str(src / "d_fix")
        )
        start_ingest_stream(
            spark, glob, target, ckpt, available_now=True, sink=sink
        ).awaitTermination()
        _wire_format(readings).select("value").coalesce(1).write.text(
            str(src / "d_stale")
        )
        start_ingest_stream(
            spark, glob, target, ckpt, available_now=True, sink=sink
        ).awaitTermination()
        return ManifestTable(target), src, glob, target, ckpt

    t, src, glob, target, ckpt = run("guarded", "manifest_upsert_if_newer")
    fact = t.read(spark)
    assert fact.count() == 40
    n_regressed = (
        fact.filter(F.col("meter_id") <= 5)
        .join(
            corrected.select(
                "reading_timestamp",
                "meter_id",
                F.col("reading_consumption_milliwatts").alias("want"),
            ),
            ["reading_timestamp", "meter_id"],
        )
        .filter(F.col("reading_consumption_milliwatts") != F.col("want"))
        .count()
    )
    assert n_regressed == 0  # guard held: stale replay dropped

    # idempotent replay of the corrections: same end state
    _wire_format(corrected).select("value").coalesce(1).write.text(
        str(src / "d_fix_replay")
    )
    start_ingest_stream(
        spark, glob, target, ckpt,
        available_now=True, sink="manifest_upsert_if_newer",
    ).awaitTermination()
    fact2 = ManifestTable(target).read(spark)
    assert fact2.count() == 40
    assert (
        fact2.join(
            fact.select(
                "reading_timestamp",
                "meter_id",
                F.col("reading_consumption_milliwatts").alias("before"),
            ),
            ["reading_timestamp", "meter_id"],
        )
        .filter(F.col("reading_consumption_milliwatts") != F.col("before"))
        .count()
        == 0
    )

    # the CONTRAST: plain last-write-wins regresses in this order
    t_plain, *_ = run("plain", "manifest_upsert")
    regressed_plain = (
        t_plain.read(spark)
        .filter(F.col("meter_id") <= 5)
        .join(
            corrected.select(
                "reading_timestamp",
                "meter_id",
                F.col("reading_consumption_milliwatts").alias("want"),
            ),
            ["reading_timestamp", "meter_id"],
        )
        .filter(F.col("reading_consumption_milliwatts") != F.col("want"))
        .count()
    )
    assert regressed_plain == 20  # every corrected row regressed


def test_stream_branch_sink_isolates_until_publish(spark, tmp_path):
    """Streaming WAP: micro-batches routed onto a branch never touch
    the main log; after fast_forward main holds baseline + streamed
    day exactly once (redelivered feed dedups on the branch)."""
    from smart_meter_data_pipeline_spark.sources.manifest import ManifestTable

    src = tmp_path / "msgs"
    target = str(tmp_path / "fact_manifest")
    ckpt = str(tmp_path / "ckpt")
    os.makedirs(src)
    baseline = gen_meter_readings(spark, n_meters=20, n_ticks=8)
    t = ManifestTable(target)
    t.idempotent_append(spark, baseline)
    t.create_branch("staging")
    next_day = baseline.withColumn(
        "reading_timestamp",
        F.expr("timestampadd(DAY, 1, reading_timestamp)"),
    )
    wire = _wire_format(next_day).select("value")
    wire.coalesce(2).write.mode("overwrite").text(str(src / "d1"))
    wire.coalesce(2).write.mode("overwrite").text(str(src / "d1_redo"))

    q = start_ingest_stream(
        spark, str(src / "*" / "*.txt"), target, ckpt,
        available_now=True, sink="manifest", branch="staging",
    )
    q.awaitTermination()

    assert t.read(spark).count() == 20 * 8  # main untouched
    b = t.branch("staging")
    assert b.read(spark).count() == 20 * 8 * 2  # streamed day landed once
    assert b.fast_forward()["published"] == 1
    assert t.read(spark).count() == 20 * 8 * 2
    assert (
        t.read(spark)
        .select("reading_timestamp", "meter_id")
        .distinct()
        .count()
        == 20 * 8 * 2
    )


def test_stream_branch_requires_manifest_sink(spark, tmp_path):
    import pytest

    with pytest.raises(ValueError, match="manifest-family sink"):
        start_ingest_stream(
            spark,
            str(tmp_path / "nope" / "*.txt"),
            str(tmp_path / "t"),
            str(tmp_path / "c"),
            sink="lock",
            branch="staging",
        )
