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

Concurrency/visibility design:

- The rewrite stages into a dot-prefixed dir inside the table, which
  Spark's partition discovery ignores — a concurrent reader never sees
  the staged files as a phantom partition.
- The swap uses Linux ``renameat2(RENAME_EXCHANGE)`` when available:
  one atomic syscall exchanges the old and new partition directories,
  so a concurrent lister sees exactly the old or the new file set,
  never "partition missing". On filesystems without it, the fallback
  is rename-away + rename-in (both hidden names), which narrows the
  inconsistency to a partition-absent instant — still never a mixed or
  doubled file set.
- The whole rewrite holds the table's writer lock
  (:func:`~.txn.table_lock`), so it cannot interleave with an
  ``idempotent_append`` existing-keys scan (which could otherwise miss
  in-flight rows and re-insert duplicates).
"""

from __future__ import annotations

import ctypes
import os
import shutil
import uuid

from pyspark.sql import SparkSession

from smart_meter_data_pipeline_spark.sources.txn import table_lock

TARGET_FILE_BYTES = 128 * 1024 * 1024  # one HDFS-ish block per file


def _partition_bytes(part_dir: str) -> int:
    return sum(
        os.path.getsize(os.path.join(part_dir, f))
        for f in os.listdir(part_dir)
        if f.endswith(".parquet")
    )


def _exchange_paths(a: str, b: str) -> bool:
    """Atomically swap two directories with renameat2(RENAME_EXCHANGE).

    Returns False when the syscall (Linux ≥3.15, same filesystem) is
    unavailable, letting the caller fall back to sequential renames.
    """
    try:
        libc = ctypes.CDLL(None, use_errno=True)
        renameat2 = libc.renameat2
    except (OSError, AttributeError):
        return False
    at_fdcwd = -100
    rename_exchange = 2
    ret = renameat2(
        at_fdcwd, os.fsencode(a), at_fdcwd, os.fsencode(b), rename_exchange
    )
    return ret == 0


def compact_date_partition(
    spark: SparkSession,
    table_dir: str,
    reading_date: str,
    target_file_bytes: int = TARGET_FILE_BYTES,
) -> int:
    """Rewrite one ``reading_date=`` partition into
    ``ceil(bytes/target)`` files. Returns the new file count."""
    part_dir = os.path.join(table_dir, f"reading_date={reading_date}")
    n_files = max(1, -(-_partition_bytes(part_dir) // target_file_bytes))
    # Dot prefix: invisible to Spark's file listing AND partition
    # discovery while being rewritten.
    staged = os.path.join(
        table_dir, f".compact_{reading_date}_{uuid.uuid4().hex[:8]}"
    )
    with table_lock(table_dir):
        (
            spark.read.parquet(part_dir)
            .repartition(n_files)
            .write.mode("overwrite")
            .parquet(staged)
        )
        if _exchange_paths(staged, part_dir):
            shutil.rmtree(staged)  # now holds the OLD files
        else:
            old = os.path.join(
                table_dir, f".old_{reading_date}_{uuid.uuid4().hex[:8]}"
            )
            os.rename(part_dir, old)
            os.rename(staged, part_dir)
            shutil.rmtree(old)
    return len([f for f in os.listdir(part_dir) if f.endswith(".parquet")])


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


def retention_sweep(
    table_dir: str, keep_after: str
) -> list[str]:
    """Drop ``reading_date=`` partitions strictly older than
    ``keep_after`` (ISO date string) — the table-side lifecycle twin of
    the reference topic's 7-day retention (producer/meter_simulator.py:
    113 ``retention.ms``; TimescaleDB deployments pair it with chunk
    drops). Partition-granular deletes are O(dropped partitions), never
    a row-level scan; the writer lock keeps the sweep from racing an
    in-flight append's existing-keys scan. Returns the dropped dates.
    """
    dropped: list[str] = []
    if not os.path.isdir(table_dir):
        return dropped
    with table_lock(table_dir):
        for name in sorted(os.listdir(table_dir)):
            if not name.startswith("reading_date="):
                continue
            date = name.split("=", 1)[1]
            if date < keep_after:
                shutil.rmtree(os.path.join(table_dir, name))
                dropped.append(date)
    return dropped
