"""Kafka source/sink builders — production parity for the reference's
producer/consumer configuration (S2/S3), engine-side.

The reference's wire contract (producer/meter_simulator.py:244-250,
:284-285; consumer/meter_consumer.py:185-196):

- topic ``meter_readings``, messages keyed by ``str(meter_id)`` so one
  meter's readings stay ordered within a partition (README.md:103),
- value = flat JSON envelope with ISO-8601 UTC timestamp,
- consumer group reads from ``earliest`` with manual commit-after-write
  — replaced here by Structured Streaming checkpointing, which commits
  source offsets atomically with sink epochs,
- producer backpressure (BufferError poll loop) — replaced by
  ``maxOffsetsPerTrigger`` source-side rate control (T6).

This container has no Kafka broker or spark-sql-kafka package, so
these builders are exercised in tests at the projection/option level
(the wire schema and option dicts), while the file-based twins in
``streaming/`` run end-to-end. On a real cluster, pass the returned
reader/writer straight to ``load()`` / ``start()``.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F
from pyspark.sql import types as T

TOPIC = "meter_readings"  # docker-compose.yml:74
MAX_OFFSETS_PER_TRIGGER = 100_000

WIRE_SCHEMA = T.StructType(
    [
        T.StructField("meter_id", T.IntegerType()),
        T.StructField("reading_timestamp", T.StringType()),
        T.StructField("reading_consumption_milliwatts", T.IntegerType()),
        T.StructField("reading_production_milliwatts", T.IntegerType()),
        T.StructField("status", T.StringType()),
    ]
)


def kafka_source_options(
    bootstrap_servers: str, topic: str = TOPIC, starting_offsets: str = "earliest"
) -> dict[str, str]:
    """Consumer-side options (S3): earliest like the reference's
    ``auto.offset.reset``; rate control instead of poll-loop
    backpressure (T6)."""
    return {
        "kafka.bootstrap.servers": bootstrap_servers,
        "subscribe": topic,
        "startingOffsets": starting_offsets,
        "maxOffsetsPerTrigger": str(MAX_OFFSETS_PER_TRIGGER),
        "failOnDataLoss": "false",
    }


def kafka_sink_options(
    bootstrap_servers: str, topic: str = TOPIC, checkpoint_dir: str | None = None
) -> dict[str, str]:
    """Producer-side options (S2). Batching/linger/compression are
    broker-client concerns configured via ``kafka.*`` passthrough
    (reference: linger 10ms, 64KB batches, snappy)."""
    opts = {
        "kafka.bootstrap.servers": bootstrap_servers,
        "topic": topic,
        "kafka.compression.type": "snappy",
        "kafka.linger.ms": "10",
        "kafka.batch.size": "65536",
        "kafka.acks": "1",
    }
    if checkpoint_dir:
        opts["checkpointLocation"] = checkpoint_dir
    return opts


def to_wire(readings: DataFrame) -> DataFrame:
    """Readings → Kafka record shape: (key, value) with key =
    str(meter_id) (per-meter ordering) and value = the JSON envelope.
    Works for batch ``write.format("kafka")`` and streaming
    ``writeStream`` alike."""
    return readings.select(
        F.col("meter_id").cast("string").alias("key"),
        F.to_json(
            F.struct(
                "meter_id",
                F.date_format(
                    "reading_timestamp", "yyyy-MM-dd'T'HH:mm:ss"
                ).alias("reading_timestamp"),
                "reading_consumption_milliwatts",
                "reading_production_milliwatts",
                "status",
            )
        ).alias("value"),
    )


def from_wire(records: DataFrame) -> DataFrame:
    """Kafka records → typed readings: parse the JSON envelope,
    re-type the timestamp. Invalid envelopes yield NULL fields and are
    dropped by the ingest validator downstream (S4 semantics)."""
    return records.select(
        F.from_json(F.col("value").cast("string"), WIRE_SCHEMA).alias("r")
    ).select(
        # try_to_timestamp: the wire string is untrusted; under ANSI
        # mode to_timestamp would throw on a malformed envelope instead
        # of yielding the NULL this docstring promises.
        F.try_to_timestamp("r.reading_timestamp").alias("reading_timestamp"),
        F.col("r.meter_id").alias("meter_id"),
        F.col("r.reading_consumption_milliwatts").alias(
            "reading_consumption_milliwatts"
        ),
        F.col("r.reading_production_milliwatts").alias(
            "reading_production_milliwatts"
        ),
        F.col("r.status").alias("status"),
    )


def kafka_reader(spark: SparkSession, bootstrap_servers: str, **kw):
    """Unstarted streaming reader for the readings topic. Call
    ``.load()`` on a cluster with the kafka package installed."""
    reader = spark.readStream.format("kafka")
    for k, v in kafka_source_options(bootstrap_servers, **kw).items():
        reader = reader.option(k, v)
    return reader
