"""Table maintenance: small-file compaction for the streaming fact
table.

Micro-batch appends (S5/S6 semantics) leave one small parquet file per
task per trigger — after a day of 5-second triggers a date partition
holds thousands of kilobyte files, and at 100 TB the scan's task
overhead dominates. Compaction rewrites each date partition to
size-targeted files; this is the engine-side twin of the reference's
post-hoc chunk compression job (TimescaleDB ``add_compression_policy``
after 1 day, 01_create_schema.sql:126-136): run it on partitions older
than the active ingest day so it never races the stream's appends.
"""

from __future__ import annotations

import os
import shutil
import tempfile

from pyspark.sql import SparkSession

TARGET_FILE_BYTES = 128 * 1024 * 1024  # one HDFS-ish block per file


def _partition_bytes(part_dir: str) -> int:
    return sum(
        os.path.getsize(os.path.join(part_dir, f))
        for f in os.listdir(part_dir)
        if f.endswith(".parquet")
    )


def compact_date_partition(
    spark: SparkSession,
    table_dir: str,
    reading_date: str,
    target_file_bytes: int = TARGET_FILE_BYTES,
) -> int:
    """Rewrite one ``reading_date=`` partition into
    ``ceil(bytes/target)`` files. Returns the new file count.

    The rewrite stages to a sibling temp dir and swaps atomically-ish
    (rename) so concurrent readers see either the old or the new file
    set, never a partial mix."""
    part_dir = os.path.join(table_dir, f"reading_date={reading_date}")
    n_files = max(1, -(-_partition_bytes(part_dir) // target_file_bytes))
    staged = tempfile.mkdtemp(
        prefix=f"compact_{reading_date}_", dir=table_dir
    )
    (
        spark.read.parquet(part_dir)
        .repartition(n_files)
        .write.mode("overwrite")
        .parquet(staged)
    )
    old = part_dir + ".old"
    os.rename(part_dir, old)
    os.rename(staged, part_dir)
    shutil.rmtree(old)
    return len(
        [f for f in os.listdir(part_dir) if f.endswith(".parquet")]
    )


def compact_table(
    spark: SparkSession,
    table_dir: str,
    target_file_bytes: int = TARGET_FILE_BYTES,
    skip_dates: set[str] | None = None,
) -> dict[str, int]:
    """Compact every date partition (minus ``skip_dates`` — pass the
    active ingest day). Returns {date: new_file_count}."""
    out: dict[str, int] = {}
    for name in sorted(os.listdir(table_dir)):
        if not name.startswith("reading_date="):
            continue
        date = name.split("=", 1)[1]
        if skip_dates and date in skip_dates:
            continue
        out[date] = compact_date_partition(
            spark, table_dir, date, target_file_bytes
        )
    return out
