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
- Candidate files are read through the table's merge-on-read
  tombstone reconciliation (``_read_files_with_tombstones``), so a
  pending ``delete_keys_mor`` / ``delete_where(mode="mor")`` is
  anti-joined onto exactly the rows it governs — the indexed read
  equals ``read().filter(...)`` under EVERY mutation kind, not just
  copy-on-write ones.
- The row filter always applies on top, so the pruned read equals
  the plain ``read().filter(...)`` whatever the refresh lag.

The index indexes ITSELF (round 12): postings are range-clustered by
``v`` at refresh time and the posting table records per-file ``v``
min/max (string zone maps), so a point lookup opens O(1) posting
files instead of scanning the whole posting table — at a million-file
table the posting table is itself ~10⁹ rows, and an "index" whose
every probe scans all of it would reintroduce the cost class it
exists to remove.

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


def _index_table(table: ManifestTable, column: str) -> ManifestTable:
    """The posting table, opened WITH its own skipping index: per-file
    [min, max] on ``v`` (int or string — string zone maps are the
    round-12 manifest extension this rides on). Persisted as table
    config, so a bare reopen keeps it."""
    return ManifestTable(
        _index_table_dir(table, column), stats_columns=["v"]
    )


def _meta_path(table: ManifestTable, column: str) -> str:
    return os.path.join(_index_table_dir(table, column), "_index_meta.json")


def _load_meta(table: ManifestTable, column: str) -> dict:
    try:
        with open(_meta_path(table, column)) as fh:
            return json.load(fh)
    except (OSError, ValueError):
        return {"indexed_upto": -1}


def refresh_index(
    table: ManifestTable,
    spark: SparkSession,
    column: str,
    posting_partitions: int | None = None,
) -> dict:
    """Build or incrementally refresh the posting index for
    ``column``: scan ONLY the live files whose origin commit is past
    the last refresh (first call scans everything), append their
    distinct (value, file) postings into the index's own manifest
    table (pk-idempotent on (v, rel_file) — a re-run of an
    interrupted refresh re-lands nothing), then advance
    ``indexed_upto`` atomically. Postings are written range-clustered
    by ``v`` (``cluster_by`` staging), so each posting file covers a
    narrow value slice and the point lookup's zone maps prune the
    posting table itself. Returns
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
    idx = _index_table(table, column)
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
        # posting-file count scales with the refresh's data-file
        # count (~one posting file per 8 data files, capped): enough
        # range slices that a lookup opens O(1) of them, few enough
        # that incremental refreshes don't accumulate tiny files;
        # override for tables whose per-file posting volume is known
        n_parts = posting_partitions or max(
            1, min(64, (len(new_files) + 7) // 8)
        )
        n_postings = idx.idempotent_append(
            spark,
            postings,
            pk=["v", "rel_file"],
            cluster_by=["v"],
            cluster_partitions=n_parts,
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


def index_candidate_files(
    table: ManifestTable,
    spark: SparkSession,
    column: str,
    values: list,
    numbered: list | None = None,
) -> tuple[list[str], dict]:
    """The sound candidate-file set for ``column IN (values)`` on the
    CURRENT snapshot: ``(postings ∩ live) ∪ unindexed-files`` — the
    shared core of :func:`index_point_read`, also consulted by
    ``ManifestTable.read(where_in=...)`` (round 12) so plain reads
    get posting-exact pruning without the dedicated API. Returns
    ``(absolute file paths, report)``. CURRENT-only by contract: a
    time-travel read must not consult the index (vacuum_index keeps
    postings only for currently-live files, so an old snapshot's
    rewritten files could be wrongly dropped)."""
    if numbered is None:
        numbered = table.numbered_snapshot()
    commits = [c for _, c in numbered]
    live = table._files(commits)
    origins = table._file_origins(numbered)
    meta = _load_meta(table, column)
    idx = _index_table(table, column)
    vals = [v for v in values if v is not None]
    posted: set[str] = set()
    posting_rep = {"files_live": 0, "files_read": 0}
    if vals:
        idx_df = idx.read(spark, where_in={"v": vals})
        if idx_df is not None:
            posting_rep = idx.skipping_report(where_in={"v": vals})
            posted = {
                r["rel_file"]
                for r in idx_df.select("rel_file").distinct().collect()
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
        "posting_files_live": posting_rep["files_live"],
        "posting_files_read": posting_rep["files_read"],
    }
    return candidates, report


def index_point_read(
    table: ManifestTable,
    spark: SparkSession,
    column: str,
    values: list,
) -> tuple[DataFrame | None, dict]:
    """Point lookup served through the posting index. Returns
    ``(df, report)`` where the report carries the skipping numbers
    (``files_live`` / ``files_read`` / ``files_unindexed``, plus the
    posting table's own ``posting_files_live`` /
    ``posting_files_read``) the same way ``skipping_report`` does for
    the metadata indexes.

    The posting lookup itself goes through ``read(where_in=...)`` so
    the posting table's ``v`` zone maps prune posting FILES before a
    row is touched; the postings collect is bounded by the files that
    actually contain the looked-up values — the point-lookup regime
    the index exists for; a huge IN-list belongs on the zone-map path
    instead. Candidate data files are read with pending merge-on-read
    tombstones reconciled, so the result equals
    ``read().filter(col.isin(values))`` even mid-``delete_keys_mor``
    lifecycle."""
    numbered = table.numbered_snapshot()
    if not numbered:
        return None, {"files_live": 0, "files_read": 0}
    commits = [c for _, c in numbered]
    vals = [v for v in values if v is not None]
    candidates, report = index_candidate_files(
        table, spark, column, vals, numbered
    )
    schema = ManifestTable._evolved_schema(commits)
    if not candidates:
        empty = (
            spark.createDataFrame([], schema)
            if schema is not None
            else None
        )
        return empty, report
    df = table._read_files_with_tombstones(
        spark, numbered, candidates, schema
    ).filter(F.col(column).isin(vals))
    return df, report


def vacuum_index(
    table: ManifestTable, spark: SparkSession, column: str
) -> dict:
    """Garbage-collect STALE postings — entries whose data file is no
    longer live (copy-on-write rewrites, OPTIMIZE, retention drops).
    Reads stay sound without this (the lookup intersects postings
    with the live set), but a high-churn table's posting table grows
    with every rewrite; this is the index's vacuum.

    Implemented with the posting table's OWN mutation machinery: the
    stale postings anti-join ``(postings ⟕̸ live rel_files)`` runs
    distributed, lands as a merge-on-read tombstone, and
    ``apply_tombstones`` settles it into rewrites immediately (one
    maintenance call = clean posting files, no read tax left). The
    live-file frame is metadata-sized — the commit log already holds
    the file list driver-side. Returns ``{"postings_removed": n}``."""
    from smart_meter_data_pipeline_spark.sources.manifest import (
        apply_tombstones,
    )

    numbered = table.numbered_snapshot()
    idx = _index_table(table, column)
    idx_df = idx.read(spark)
    if not numbered or idx_df is None:
        return {"postings_removed": 0}
    live_rels = sorted(
        os.path.relpath(f, table.data_dir)
        for f in table._files([c for _, c in numbered])
    )
    live_df = spark.createDataFrame(
        [(r,) for r in live_rels], "rel_file string"
    )
    stale = idx_df.join(
        F.broadcast(live_df), "rel_file", "left_anti"
    ).select("v", "rel_file")
    n = idx.delete_keys_mor(spark, stale, pk=["v", "rel_file"])
    if n:
        apply_tombstones(idx, spark)
    return {"postings_removed": n}
