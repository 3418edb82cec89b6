"""Structured Streaming ingest: the reference's Kafka consumer loop
(consumer/meter_consumer.py:226-318) re-expressed as a checkpointed
stream with an idempotent ``foreachBatch`` sink.

Semantics mapping (SURVEY.md §2.7):

- T1 effective exactly-once: the reference orders DB-txn-commit before
  Kafka offset-commit and relies on ``ON CONFLICT DO NOTHING`` replay
  safety. Here the checkpoint records source progress atomically with
  batch completion, and ``idempotent_append`` makes replays no-ops —
  same end state, no manual offset choreography.
- T5 micro-batching: ``trigger(availableNow=True)`` for drain-and-stop
  (tests, backfills) or ``processingTime`` for continuous; the
  size-1000/5s-idle flush heuristics (:40-44) are subsumed by Spark's
  trigger policy.
- T7 lag observability: ``ProgressRecorder`` captures per-batch
  numInputRows / inputRowsPerSecond / durationMs — the monitor's
  watermark−committed lag report (monitor/kafka_monitor.py:117-167)
  becomes ``StreamingQuery.lastProgress``.
- T8 graceful shutdown: ``query.stop()`` + checkpoint replaces the
  SIGTERM flush-then-commit dance (:439-443).

In production the source line becomes
``spark.readStream.format("kafka").option("startingOffsets","earliest")``
(S3); tests use the file source for hermeticity — same downstream graph.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql.streaming import StreamingQuery, StreamingQueryListener

from smart_meter_data_pipeline_spark.sources.ingest import (
    MESSAGE_SCHEMA,
    classify,
    idempotent_append,
    split_valid,
)


def read_message_stream(spark: SparkSession, source_dir: str) -> DataFrame:
    """File-based message stream (newline-delimited JSON, one file per
    'delivery'); swap for the kafka format in production."""
    return (
        spark.readStream.schema(MESSAGE_SCHEMA)
        .option("columnNameOfCorruptRecord", "_corrupt")
        .option("mode", "PERMISSIVE")
        .option("maxFilesPerTrigger", 4)  # micro-batch pacing (T5/T6)
        .json(source_dir)
    )


def start_ingest_stream(
    spark: SparkSession,
    source_dir: str,
    target: str,
    checkpoint_dir: str,
    available_now: bool = True,
) -> StreamingQuery:
    """readStream → classify/split → foreachBatch idempotent append."""
    stream = read_message_stream(spark, source_dir)

    def process_batch(batch_df: DataFrame, batch_id: int) -> None:
        valid, _quarantine = split_valid(classify(batch_df))
        idempotent_append(batch_df.sparkSession, valid, target)

    writer = (
        stream.writeStream.foreachBatch(process_batch)
        .option("checkpointLocation", checkpoint_dir)
        .outputMode("update")
    )
    if available_now:
        writer = writer.trigger(availableNow=True)
    else:
        writer = writer.trigger(processingTime="5 seconds")
    return writer.start()


class ProgressRecorder(StreamingQueryListener):
    """T7: per-batch progress metrics (the Spark-native consumer-lag
    monitor). Attach with ``spark.streams.addListener``."""

    def __init__(self) -> None:
        self.progress: list[dict] = []

    def onQueryStarted(self, event) -> None:  # noqa: N802
        pass

    def onQueryProgress(self, event) -> None:  # noqa: N802
        p = event.progress
        self.progress.append(
            {
                "batchId": p.batchId,
                "numInputRows": p.numInputRows,
                "inputRowsPerSecond": p.inputRowsPerSecond,
                "durationMs": dict(p.durationMs),
            }
        )

    def onQueryIdle(self, event) -> None:  # noqa: N802
        pass

    def onQueryTerminated(self, event) -> None:  # noqa: N802
        pass
