"""Exact secondary index over a manifest table — posting lists
(value → data file) maintained as their OWN manifest table, the
Hyperspace / Iceberg-secondary-index shape.

Where the per-file membership indexes (Bloom bitmaps, string
dictionaries) are COMMIT-SIZED approximations — great when the column
is low-cardinality or false positives only waste a candidate read —
the posting index is EXACT at any cardinality: a point lookup opens
exactly the files that contain the value, no FP reads ever. The cost
moves to maintenance (an index refresh scans the files added since
the last refresh), which is why both kinds coexist in real lakehouse
stacks.

Soundness under staleness (the part that makes the index an
OPTIMIZATION, never a correctness filter):

- The index records, atomically with its postings, the highest
  table-commit number it has seen (``indexed_upto``).
- A point read serves from ``(postings ∩ live files)`` UNION ``every
  live file whose origin commit > indexed_upto`` — unindexed files
  are read unconditionally, exactly the files-without-records rule
  the Bloom/dictionary prunes follow.
- Copy-on-write rewrites produce NEW files with origin numbers past
  any older refresh, so a stale posting at a removed file is ignored
  (∩ live) and the rewritten rows are still found (> indexed_upto).
- The row filter always applies on top, so the pruned read equals
  the plain ``read().filter(...)`` whatever the refresh lag.

Reference parity: the reference's Postgres PK index
(01_create_schema.sql) gives it free point lookups; this is that
capability rebuilt for immutable parquet + commit log."""

from __future__ import annotations

import json
import os

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from smart_meter_data_pipeline_spark.sources.manifest import ManifestTable

INDEXES_DIRNAME = "_indexes"


def _index_table_dir(table: ManifestTable, column: str) -> str:
    return os.path.join(table.table_dir, INDEXES_DIRNAME, column)


def _meta_path(table: ManifestTable, column: str) -> str:
    return os.path.join(_index_table_dir(table, column), "_index_meta.json")


def _load_meta(table: ManifestTable, column: str) -> dict:
    try:
        with open(_meta_path(table, column)) as fh:
            return json.load(fh)
    except (OSError, ValueError):
        return {"indexed_upto": -1}


def refresh_index(
    table: ManifestTable, spark: SparkSession, column: str
) -> dict:
    """Build or incrementally refresh the posting index for
    ``column``: scan ONLY the live files whose origin commit is past
    the last refresh (first call scans everything), append their
    distinct (value, file) postings into the index's own manifest
    table (pk-idempotent on (v, rel_file) — a re-run of an
    interrupted refresh re-lands nothing), then advance
    ``indexed_upto`` atomically. Returns
    ``{"files_indexed": n, "postings": m, "indexed_upto": k}``."""
    numbered = table.numbered_snapshot()
    if not numbered:
        return {"files_indexed": 0, "postings": 0, "indexed_upto": -1}
    commits = [c for _, c in numbered]
    upto = numbered[-1][0]
    meta = _load_meta(table, column)
    origins = table._file_origins(numbered)
    live = table._files(commits)
    new_files = [
        f for f in live if origins.get(f, 0) > meta["indexed_upto"]
    ]
    idx = ManifestTable(_index_table_dir(table, column))
    n_postings = 0
    if new_files:
        # _metadata.file_path carries a scheme ("file:/..." locally,
        # "s3a://..." on object storage) — anchor on the data-dir
        # marker instead of assuming the scheme's shape
        marker = table.data_dir + "/"
        postings = (
            spark.read.parquet(*new_files)
            .select(
                F.col(column).alias("v"),
                F.expr(
                    "substring(_metadata.file_path, "
                    f"instr(_metadata.file_path, '{marker}') "
                    f"+ {len(marker)})"
                ).alias("rel_file"),
            )
            .filter(F.col("v").isNotNull())
            .distinct()
        )
        n_postings = idx.idempotent_append(
            spark, postings, pk=["v", "rel_file"]
        )
    os.makedirs(_index_table_dir(table, column), exist_ok=True)
    tmp = _meta_path(table, column) + f".tmp.{os.getpid()}"
    with open(tmp, "w") as fh:
        json.dump({"indexed_upto": upto}, fh)
    os.replace(tmp, _meta_path(table, column))
    return {
        "files_indexed": len(new_files),
        "postings": n_postings,
        "indexed_upto": upto,
    }


def index_point_read(
    table: ManifestTable,
    spark: SparkSession,
    column: str,
    values: list,
) -> tuple[DataFrame | None, dict]:
    """Point lookup served through the posting index. Returns
    ``(df, report)`` where the report carries the skipping numbers
    (``files_live`` / ``files_read`` / ``files_unindexed``) the same
    way ``skipping_report`` does for the metadata indexes.

    The postings collect is bounded by the files that actually
    contain the looked-up values — the point-lookup regime the index
    exists for; a huge IN-list belongs on the zone-map path
    instead."""
    numbered = table.numbered_snapshot()
    if not numbered:
        return None, {"files_live": 0, "files_read": 0}
    commits = [c for _, c in numbered]
    live = table._files(commits)
    origins = table._file_origins(numbered)
    meta = _load_meta(table, column)
    idx = ManifestTable(_index_table_dir(table, column))
    idx_df = idx.read(spark)
    vals = [v for v in values if v is not None]
    posted: set[str] = set()
    if idx_df is not None and vals:
        posted = {
            r["rel_file"]
            for r in idx_df.filter(F.col("v").isin(vals))
            .select("rel_file")
            .distinct()
            .collect()
        }
    unindexed = [
        f for f in live if origins.get(f, 0) > meta["indexed_upto"]
    ]
    indexed_hits = [
        f
        for f in live
        if origins.get(f, 0) <= meta["indexed_upto"]
        and os.path.relpath(f, table.data_dir) in posted
    ]
    candidates = sorted(set(indexed_hits) | set(unindexed))
    report = {
        "files_live": len(live),
        "files_read": len(candidates),
        "files_unindexed": len(unindexed),
    }
    if not candidates:
        schema = ManifestTable._evolved_schema(commits)
        empty = (
            spark.createDataFrame([], schema)
            if schema is not None
            else None
        )
        return empty, report
    schema = ManifestTable._evolved_schema(commits)
    reader = spark.read
    if schema is not None:
        reader = reader.schema(schema)
    df = reader.parquet(*candidates).filter(F.col(column).isin(vals))
    return df, report
