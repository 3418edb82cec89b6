"""The jsonl_corpus custom sink: manifest-gated visibility, round
trip, and no torn output from failed tasks."""

from __future__ import annotations

import glob
import json
import os

import pytest
from pyspark.sql import functions as F

from smart_meter_data_pipeline_spark.sources.jsonl_sink_source import (
    make_jsonl_corpus_sink,
)
from smart_meter_data_pipeline_spark.sources.readers import load_table


@pytest.fixture(scope="module")
def registered(spark):
    spark.dataSource.register(make_jsonl_corpus_sink())
    return spark


@pytest.mark.slow
def test_commit_publishes_files_and_manifest(registered, spark, sf_dir, tmp_path):
    docs = load_table(spark, sf_dir, "documents").repartition(3)
    out = str(tmp_path / "corpus_sink")
    docs.write.format("jsonl_corpus").option("path", out).mode(
        "append"
    ).save()

    files = sorted(glob.glob(os.path.join(out, "part-*.jsonl")))
    assert 1 <= len(files) <= 3
    assert not glob.glob(os.path.join(out, "_tmp.*"))  # all renamed
    with open(os.path.join(out, "_SUCCESS.manifest")) as fh:
        man = json.load(fh)
    assert man["n_rows"] == docs.count()
    assert sorted(p["file"] for p in man["files"]) == [
        os.path.basename(f) for f in files
    ]
    # round trip through the files the manifest names
    back = spark.read.json([os.path.join(out, p["file"]) for p in man["files"]])
    assert back.count() == docs.count()
    assert sorted(
        r["doc_id"] for r in back.select("doc_id").collect()
    ) == sorted(r["doc_id"] for r in docs.select("doc_id").collect())


def test_failed_job_leaves_no_visible_output(registered, spark, sf_dir, tmp_path):
    """A task that throws mid-batch aborts the job; the sink must leave
    no published files and no manifest (temp files at most, which the
    manifest-gated read protocol ignores)."""
    docs = load_table(spark, sf_dir, "documents").withColumn(
        "boom",
        F.when(F.col("doc_id") >= 0, F.col("doc_id")).otherwise(0),
    )
    exploding = docs.select(
        "doc_id",
        F.expr("assert_true(doc_id < 10, 'injected failure')").alias("chk"),
    )
    out = str(tmp_path / "failed_sink")
    with pytest.raises(Exception):
        exploding.write.format("jsonl_corpus").option("path", out).mode(
            "append"
        ).save()
    assert not glob.glob(os.path.join(out, "part-*.jsonl"))
    assert not os.path.exists(os.path.join(out, "_SUCCESS.manifest"))


def test_stream_sink_two_batches_manifested(spark, sf_dir, tmp_path):
    """The streaming writer publishes per-batch manifests and the
    manifested reader sees every row exactly once."""
    from smart_meter_data_pipeline_spark.streaming.stream_queries import (
        stream_jsonl_sink_roundtrip,
    )
    from smart_meter_data_pipeline_spark.sources.readers import load_table

    out = stream_jsonl_sink_roundtrip(spark, sf_dir)
    got = {r["event_type"]: r["n_rows"] for r in out.collect()}
    want = {
        r["event_type"]: r["n"]
        for r in load_table(spark, sf_dir, "events")
        .groupBy("event_type")
        .count()
        .withColumnRenamed("count", "n")
        .collect()
    }
    assert got == want


def test_stream_sink_commit_replay_is_idempotent(tmp_path):
    """Re-committing the SAME batchId (the crash-between-epochs replay)
    unpublishes the previous attempt's files first — no duplicates."""
    import json
    import os

    from smart_meter_data_pipeline_spark.sources.jsonl_sink_source import (
        make_jsonl_corpus_sink,
        manifested_stream_files,
    )

    ds = make_jsonl_corpus_sink()({"path": str(tmp_path)})
    w = ds.streamWriter(None, False)

    class _Row:
        def __init__(self, i):
            self.i = i

        def asDict(self):
            return {"event_id": self.i}

    m1 = w.write(iter([_Row(1), _Row(2)]))
    w.commit([m1], batchId=0)
    first_files = manifested_stream_files(str(tmp_path))
    assert len(first_files) == 1

    # replay batch 0 with a fresh attempt
    m2 = w.write(iter([_Row(1), _Row(2)]))
    w.commit([m2], batchId=0)
    files = manifested_stream_files(str(tmp_path))
    assert len(files) == 1
    assert files != first_files  # old attempt unpublished
    assert not os.path.exists(first_files[0])
    rows = [json.loads(line) for line in open(files[0])]
    assert [r["event_id"] for r in rows] == [1, 2]

    # abort leaves nothing visible
    m3 = w.write(iter([_Row(9)]))
    w.abort([m3], batchId=1)
    assert manifested_stream_files(str(tmp_path)) == files
    assert not any(
        n.startswith("_tmp.") for n in os.listdir(str(tmp_path))
    )
