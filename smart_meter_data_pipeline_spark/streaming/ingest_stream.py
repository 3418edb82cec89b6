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
from pyspark.sql import functions as F
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
    quarantine_target: str | None = None,
    sink: str = "lock",
    version_col: str = "reading_consumption_milliwatts",
    branch: str | None = None,
    index_column: str | None = None,
) -> StreamingQuery:
    """readStream → classify → observe → foreachBatch idempotent append.

    Invalid messages are not dropped: with ``quarantine_target`` they
    are appended (with ``batch_id``) to a quarantine table — the
    streaming twin of the batch path's quarantine DataFrame. Either
    way, per-batch consumed/rejected counts are attached with
    ``observe("ingest", ...)`` so they surface in every progress event
    (``observedMetrics``; the reference counts failures in its stats
    loop, consumer/meter_consumer.py:282-283).

    ``sink`` picks the protocol the batches commit through:

    - ``"lock"``: flock-serialized anti-join append (POSIX path).
    - ``"manifest"``: put-if-absent commit log (object-store path).
    - ``"manifest_upsert"``: streaming MERGE — each micro-batch is
      applied as a copy-on-write upsert (``ManifestTable.upsert``),
      the sink for RESTATEMENT feeds where re-reads carry corrected
      values instead of duplicates (insert-only dedup would drop
      them). Within a batch the latest ``arrived_at`` per PK wins.
      Replays converge to the same row values (a retried batch
      rewrites matched rows to the identical post-image), so the
      exactly-once guarantee holds in effect for all three.
    - ``"manifest_upsert_if_newer"``: ordering-GUARDED streaming
      MERGE (``ManifestTable.upsert_if_newer`` on ``version_col``) —
      the sink for feeds that can arrive OUT OF ORDER across
      micro-batches (replayed partitions, late redeliveries): a
      batch row older than the landed row by ``version_col`` is
      dropped, never regressing newer data — the guarantee plain
      last-write-wins upsert cannot give once batch order stops
      matching event order. The default version column is the
      cumulative consumption register, monotone per meter by
      construction (meters never run backwards), so a stale baseline
      replayed AFTER a correction is rejected on value; CDC feeds
      with an explicit sequence pass it as ``version_col``. Within a
      batch the largest version per PK wins.

    ``branch`` routes every manifest-family sink's commits into the
    named BRANCH of the target table (streaming Write-Audit-Publish:
    the stream lands on an audit branch, main serves untouched until
    ``fast_forward`` squash-publishes the drained result). Requires a
    manifest sink; the flock path has no branch concept."""
    if index_column is not None and (
        branch is not None
        or sink
        not in ("manifest", "manifest_upsert", "manifest_upsert_if_newer")
    ):
        raise ValueError(
            "index_column requires a table-level manifest sink on "
            f"main (got sink={sink!r}, branch={branch!r}) — the "
            "posting index lives on the main table and an audit "
            "branch's files are not visible to it until publish"
        )
    if branch is not None and sink not in (
        "manifest",
        "manifest_upsert",
        "manifest_upsert_if_newer",
        "catalog_txn",
    ):
        raise ValueError(
            f"branch={branch!r} requires a manifest-family sink, "
            f"got sink={sink!r}"
        )

    def _open_target(session):
        from smart_meter_data_pipeline_spark.sources.manifest import (
            ManifestTable,
        )

        t = ManifestTable(target)
        return t.branch(branch) if branch is not None else t

    classified = classify(read_message_stream(spark, source_dir)).observe(
        "ingest",
        F.count(F.lit(1)).alias("consumed"),
        F.count(F.when(F.col("reject_reason").isNotNull(), 1)).alias("rejected"),
    )

    def process_batch(batch_df: DataFrame, batch_id: int) -> None:
        # Persist: the batch feeds two sinks (fact + quarantine); the
        # cache also pins the observe() node to a single execution, so
        # consumed/rejected counts aren't double-counted per pass.
        batch_df.persist()
        try:
            valid, quarantine = split_valid(batch_df)
            if sink == "manifest_upsert":
                from pyspark.sql import Window

                from smart_meter_data_pipeline_spark.sources.manifest import (
                    PK,
                    ManifestTable,
                )

                w = Window.partitionBy(*PK).orderBy(
                    F.col("arrived_at").desc(),
                    F.col("reading_consumption_milliwatts").desc(),
                )
                latest = (
                    valid.withColumn("_rn", F.row_number().over(w))
                    .filter(F.col("_rn") == 1)
                    .drop("_rn")
                )
                _open_target(batch_df.sparkSession).upsert(
                    batch_df.sparkSession, latest
                )
            elif sink == "manifest_upsert_if_newer":
                from pyspark.sql import Window

                from smart_meter_data_pipeline_spark.sources.manifest import (
                    PK,
                    ManifestTable,
                )

                w = Window.partitionBy(*PK).orderBy(
                    F.col(version_col).desc(),
                    F.col("arrived_at").desc(),
                )
                latest = (
                    valid.withColumn("_rn", F.row_number().over(w))
                    .filter(F.col("_rn") == 1)
                    .drop("_rn")
                )
                _open_target(batch_df.sparkSession).upsert_if_newer(
                    batch_df.sparkSession, latest, version_col
                )
            elif sink == "catalog_txn":
                # multi-table exactly-once: the batch's fact rows AND
                # its per-batch ingest-stats row land in ONE catalog
                # commit, so a replayed batch can neither double-count
                # stats nor leave stats and data disagreeing — the
                # metrics-drift problem separate metric sinks have.
                from smart_meter_data_pipeline_spark.sources.catalog import (
                    Catalog,
                )

                session = batch_df.sparkSession
                cat = Catalog(target)
                base = (
                    cat.branch(branch) if branch is not None else cat
                )
                txn = base.txn()
                txn.append(session, "fact", valid)
                stats_df = session.createDataFrame(
                    [
                        (
                            int(batch_id),
                            batch_df.count(),
                            quarantine.count(),
                        )
                    ],
                    "batch_id bigint, consumed bigint, rejected bigint",
                )
                txn.append(
                    session, "ingest_stats", stats_df, pk=["batch_id"]
                )
                txn.commit()
            elif sink == "manifest":
                _open_target(batch_df.sparkSession).idempotent_append(
                    batch_df.sparkSession, valid
                )
            else:
                idempotent_append(batch_df.sparkSession, valid, target)
            if index_column is not None:
                # per-batch secondary-index maintenance: the refresh
                # is incremental (only this batch's new files scan)
                # and pk-idempotent, so a replayed batch re-lands
                # nothing — and a crash BETWEEN commit and refresh
                # just leaves the index stale, which the read path
                # serves correctly anyway (unindexed files are read
                # unconditionally; sources/index.py soundness rule)
                from smart_meter_data_pipeline_spark.sources.index import (
                    refresh_index,
                )
                from smart_meter_data_pipeline_spark.sources.manifest import (
                    ManifestTable,
                )

                refresh_index(
                    ManifestTable(target),
                    batch_df.sparkSession,
                    index_column,
                )
            if quarantine_target is not None:
                (
                    quarantine.withColumn("batch_id", F.lit(batch_id))
                    .write.mode("append")
                    .parquet(quarantine_target)
                )
        finally:
            batch_df.unpersist()

    writer = (
        classified.writeStream.foreachBatch(process_batch)
        .option("checkpointLocation", checkpoint_dir)
        .outputMode("update")
    )
    if available_now:
        writer = writer.trigger(availableNow=True)
    else:
        writer = writer.trigger(processingTime="5 seconds")
    return writer.start()


def _offset_positions(raw: object) -> dict[str, int]:
    """Flatten a source offset JSON into ``{stream-key: position}``.

    Shapes seen in practice: the file source's ``{"logOffset": N}``,
    Kafka's ``{"topic": {"0": off, "1": off}}``, or a bare int.
    """
    import json as _json

    if raw is None:
        return {}
    val = raw
    if isinstance(val, str):
        try:
            val = _json.loads(val)
        except ValueError:
            return {}
    if isinstance(val, int):
        return {"offset": val}
    out: dict[str, int] = {}
    if isinstance(val, dict):
        for key, v in val.items():
            if isinstance(v, dict):  # kafka: topic → partition → offset
                for part, off in v.items():
                    if isinstance(off, int):
                        out[f"{key}-{part}"] = off
            elif isinstance(v, int):
                out[key] = v
    return out


class ProgressRecorder(StreamingQueryListener):
    """T7: per-batch progress metrics (the Spark-native consumer-lag
    monitor). Attach with ``spark.streams.addListener``.

    Beyond raw throughput/durations, each record derives the
    reference monitor's headline metrics (monitor/kafka_monitor.py:
    117-167): per-source **backlog** (latest available offset − batch
    end offset, summed across partitions) and **pct_consumed**
    (100 × end/latest). ``lag_report()`` returns the latest snapshot —
    the ``StreamingQuery.lastProgress`` twin of the reference's
    per-partition lag table. Observed metrics (e.g. the ingest
    consumed/rejected counters) are carried through verbatim.
    """

    def __init__(self) -> None:
        self.progress: list[dict] = []

    def onQueryStarted(self, event) -> None:  # noqa: N802
        pass

    def onQueryProgress(self, event) -> None:  # noqa: N802
        p = event.progress
        sources = []
        for s in p.sources:
            end = _offset_positions(s.endOffset)
            latest = _offset_positions(s.latestOffset)
            total_end = sum(end.values())
            total_latest = sum(latest.values()) if latest else total_end
            backlog = max(0, total_latest - total_end)
            sources.append(
                {
                    "description": s.description,
                    "numInputRows": s.numInputRows,
                    "endOffset": end,
                    "latestOffset": latest,
                    "backlog": backlog,
                    "pct_consumed": (
                        100.0
                        if total_latest == 0
                        else round(100.0 * total_end / total_latest, 2)
                    ),
                }
            )
        self.progress.append(
            {
                "batchId": p.batchId,
                "numInputRows": p.numInputRows,
                "inputRowsPerSecond": p.inputRowsPerSecond,
                "durationMs": dict(p.durationMs),
                "observedMetrics": {
                    name: row.asDict()
                    for name, row in dict(p.observedMetrics).items()
                },
                "sources": sources,
                "backlog": sum(s["backlog"] for s in sources),
            }
        )

    def lag_report(self) -> dict:
        """Latest consumer-lag snapshot: total backlog, per-source
        detail, and overall pct_consumed — the reference monitor's
        report shape."""
        if not self.progress:
            return {"backlog": None, "pct_consumed": None, "sources": []}
        last = self.progress[-1]
        pcts = [s["pct_consumed"] for s in last["sources"]]
        return {
            "batchId": last["batchId"],
            "backlog": last["backlog"],
            "pct_consumed": min(pcts) if pcts else 100.0,
            "sources": last["sources"],
        }

    def onQueryIdle(self, event) -> None:  # noqa: N802
        pass

    def onQueryTerminated(self, event) -> None:  # noqa: N802
        pass
