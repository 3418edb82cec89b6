"""Kafka wire-contract tests (no broker in the container): the
round-trip through the producer envelope and consumer parse must be
lossless, and the option dicts must carry the reference's config."""

from __future__ import annotations

from smart_meter_data_pipeline_spark.operators.meter_pipeline import (
    gen_meter_readings,
)
from smart_meter_data_pipeline_spark.sources import kafka


def test_wire_roundtrip_lossless(spark):
    readings = gen_meter_readings(spark, n_meters=20, n_ticks=8).select(
        "reading_timestamp",
        "meter_id",
        "reading_consumption_milliwatts",
        "reading_production_milliwatts",
        "status",
    )
    back = kafka.from_wire(kafka.to_wire(readings))
    # nullability differs (JSON-parsed fields are nullable) — compare
    # names and types
    assert [(f.name, f.dataType) for f in back.schema] == [
        (f.name, f.dataType) for f in readings.schema
    ]
    assert back.exceptAll(readings).count() == 0
    assert readings.exceptAll(back).count() == 0


def test_wire_key_is_meter_id_string(spark):
    wire = kafka.to_wire(gen_meter_readings(spark, n_meters=3, n_ticks=2))
    rows = wire.collect()
    assert all(r["key"] in {"1", "2", "3"} for r in rows)
    assert all('"meter_id"' in r["value"] for r in rows)


def test_source_sink_options_match_reference():
    src = kafka.kafka_source_options("broker:9092")
    assert src["subscribe"] == "meter_readings"
    assert src["startingOffsets"] == "earliest"
    assert int(src["maxOffsetsPerTrigger"]) > 0
    snk = kafka.kafka_sink_options("broker:9092", checkpoint_dir="/tmp/ck")
    assert snk["kafka.compression.type"] == "snappy"
    assert snk["kafka.linger.ms"] == "10"
    assert snk["kafka.batch.size"] == "65536"
    assert snk["kafka.acks"] == "1"
    assert snk["checkpointLocation"] == "/tmp/ck"


def test_kafka_reader_builds_unstarted(spark):
    reader = kafka.kafka_reader(spark, "broker:9092")
    assert reader is not None  # builder-level only; .load() needs a broker
