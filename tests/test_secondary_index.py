"""Exact secondary index (sources/index.py): posting-list point
lookups with stale-index soundness over every mutation kind."""

from __future__ import annotations

import datetime as dt

from pyspark.sql import functions as F

from smart_meter_data_pipeline_spark.sources.index import (
    index_point_read,
    refresh_index,
)
from smart_meter_data_pipeline_spark.sources.manifest import ManifestTable

TS = dt.datetime(2024, 1, 1)


def _tbl(spark, tmp_path, n=4000, meters=800, parts=8):
    t = ManifestTable(str(tmp_path / "t"))
    df = spark.range(n).select(
        (F.col("id") % meters).alias("meter_id"),
        F.expr(
            "timestampadd(MINUTE, CAST(id AS INT),"
            " timestamp'2024-01-01 00:00:00')"
        ).alias("reading_timestamp"),
        (F.col("id") * 3).alias("v"),
    )
    t.idempotent_append(spark, df.repartition(parts))
    return t, df


def test_index_point_read_exact_and_reports(spark, tmp_path):
    t, df = _tbl(spark, tmp_path)
    r = refresh_index(t, spark, "meter_id")
    # staging file count depends on session shuffle settings — pin
    # behavior (everything indexed, postings exist), not the count
    assert r["files_indexed"] > 0 and r["postings"] > 0
    out, rep = index_point_read(t, spark, "meter_id", [17, 91])
    truth = t.read(spark).filter(F.col("meter_id").isin([17, 91]))
    assert out.count() == truth.count() == 10
    assert rep["files_unindexed"] == 0
    assert 0 < rep["files_read"] <= rep["files_live"]
    # absent value: zero candidate files, empty frame, right schema
    out0, rep0 = index_point_read(t, spark, "meter_id", [10**9])
    assert rep0["files_read"] == 0
    assert out0.count() == 0
    assert set(out0.columns) == set(t.read(spark).columns)


def test_index_stale_reads_unindexed_unconditionally(spark, tmp_path):
    t, df = _tbl(spark, tmp_path)
    refresh_index(t, spark, "meter_id")
    day2 = df.withColumn(
        "reading_timestamp",
        F.expr("timestampadd(DAY, 1, reading_timestamp)"),
    )
    t.idempotent_append(spark, day2.repartition(4))
    out, rep = index_point_read(t, spark, "meter_id", [17])
    assert rep["files_unindexed"] > 0
    assert out.count() == 10  # 5 rows/day x 2 days for meter 17
    r2 = refresh_index(t, spark, "meter_id")
    assert r2["files_indexed"] == rep["files_unindexed"]
    out2, rep2 = index_point_read(t, spark, "meter_id", [17])
    assert rep2["files_unindexed"] == 0
    assert out2.count() == 10


def test_index_survives_cow_rewrite(spark, tmp_path):
    """A CoW upsert moves rows into NEW files: stale postings point
    at removed files (ignored via the live-set intersection) and the
    rewritten rows are found through the unindexed rule."""
    t, df = _tbl(spark, tmp_path)
    refresh_index(t, spark, "meter_id")
    up = t.read(spark).filter("meter_id = 17").withColumn(
        "v", F.col("v") + 1_000_000
    )
    t.upsert(spark, up)
    out, rep = index_point_read(t, spark, "meter_id", [17])
    assert rep["files_unindexed"] > 0
    rows = out.collect()
    assert len(rows) == 5
    assert all(r.v >= 1_000_000 for r in rows)
    refresh_index(t, spark, "meter_id")
    out2, rep2 = index_point_read(t, spark, "meter_id", [17])
    assert rep2["files_unindexed"] == 0
    assert sorted(r.v for r in out2.collect()) == sorted(
        r.v for r in rows
    )


def test_index_refresh_is_idempotent(spark, tmp_path):
    t, _ = _tbl(spark, tmp_path, n=200, meters=40, parts=2)
    r1 = refresh_index(t, spark, "meter_id")
    r2 = refresh_index(t, spark, "meter_id")
    assert r1["postings"] > 0
    assert r2 == {
        "files_indexed": 0,
        "postings": 0,
        "indexed_upto": r1["indexed_upto"],
    }
