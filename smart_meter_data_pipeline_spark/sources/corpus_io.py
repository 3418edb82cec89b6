"""JSONL corpus export/import — the interchange sink for LLM
training corpora.

Training stacks consume line-delimited JSON shards (one document per
line, gzip-compressed, size-balanced across shards); this module is
the engine's edge for that format, mirroring the shard-assignment
policy of ``corpus_shard_manifest`` (operators/curation.py): shard =
portable hash of doc_id, so the layout is reproducible run-to-run and
engine-to-engine, never dependent on Spark's task scheduling.

Scale shape: the export is one hash-repartition shuffle (exactly the
write-side shuffle a size-balanced sharded layout requires) and a
scan-free metadata read back; Spark's JSON datasource handles
splittable reads of the uncompressed form and per-file parallelism of
the gzipped form (gzip members aren't splittable — shard count, not
file size, is the read-parallelism knob, which is why the shard count
is explicit).

Reference parity: the reference's edge formats are Kafka JSON
envelopes in and Postgres rows out (producer/meter_simulator.py,
consumer/meter_consumer.py); JSONL shards are the corpus-pipeline
analogue of that JSON wire contract.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

DEFAULT_SHARDS = 8


def export_corpus_jsonl(
    docs: DataFrame,
    path: str,
    n_shards: int = DEFAULT_SHARDS,
    compression: str = "gzip",
) -> None:
    """Write ``docs`` as ``n_shards`` JSONL files under ``path``.

    Sharding is BY CONTENT HASH of doc_id (xxhash64 — stable across
    runs and cluster layouts), not round-robin: re-running the export
    over the same corpus produces byte-stable shard membership, so
    downstream caches/resumable trainers see an idempotent layout.
    ``repartition(n, expr)`` is the one shuffle; each task writes one
    shard file sequentially.
    """
    sharded = docs.repartition(
        n_shards, F.pmod(F.xxhash64("doc_id"), F.lit(n_shards))
    )
    (
        sharded.write.mode("overwrite")
        .option("compression", compression)
        .json(path)
    )


def read_corpus_jsonl(spark: SparkSession, path: str, schema=None) -> DataFrame:
    """Read a :func:`export_corpus_jsonl` layout back.

    Pass the writing frame's ``schema`` to skip the inference scan (at
    100 TB schema inference is a full extra pass over the corpus —
    always pass the schema in production; inference is a debugging
    convenience only)."""
    reader = spark.read
    if schema is not None:
        reader = reader.schema(schema)
    return reader.json(path)
