"""Z-order layout: per-file bounding boxes must be BALANCED — clustered
in both dimensions — where a single-column sort clusters one dimension
perfectly and leaves the other at full span. Balanced boxes are what
make footer min/max stats prune predicates on either dimension."""

from __future__ import annotations

from pyspark.sql import functions as F

from smart_meter_data_pipeline_spark.operators.extended import (
    events_zorder_key,
)
from smart_meter_data_pipeline_spark.sources.layout import write_zordered

N_FILES = 32


def _mean_file_spans(spark, path) -> tuple[float, float]:
    """Mean per-file (b_user, b_time) range, normalized to the global
    span of each dimension — the fraction of that dimension's key
    space a file's footer stats CANNOT exclude."""
    df = spark.read.parquet(path).withColumn("f", F.input_file_name())
    g = df.agg(
        (F.max("b_user") - F.min("b_user") + 1).alias("su"),
        (F.max("b_time") - F.min("b_time") + 1).alias("st"),
    ).first()
    rows = (
        df.groupBy("f")
        .agg(
            (F.max("b_user") - F.min("b_user") + 1).alias("du"),
            (F.max("b_time") - F.min("b_time") + 1).alias("dt"),
        )
        .collect()
    )
    return (
        sum(r["du"] / g["su"] for r in rows) / len(rows),
        sum(r["dt"] / g["st"] for r in rows) / len(rows),
    )


def test_zorder_layout_clusters_both_dimensions(spark, sf_dir, tmp_path):
    keyed = events_zorder_key(spark, sf_dir)
    write_zordered(keyed, str(tmp_path / "z"), "z_key", n_files=N_FILES)
    (
        keyed.repartitionByRange(N_FILES, "b_user")
        .sortWithinPartitions("b_user")
        .write.mode("overwrite")
        .parquet(str(tmp_path / "single"))
    )
    zu, zt = _mean_file_spans(spark, str(tmp_path / "z"))
    su, st = _mean_file_spans(spark, str(tmp_path / "single"))
    # single-column sort: near-perfect on its column, useless on the
    # other (files span ~the whole time range)
    assert su < 0.2 and st > 0.8, (su, st)
    # the curve clusters BOTH: each dimension's per-file span is far
    # below full, so a predicate on either dimension skips files
    assert zu < 0.5 and zt < 0.5, (zu, zt)
    # and per-dimension pruning on the non-sorted axis beats the
    # single-column layout by a wide margin
    assert zt < st / 2, (zt, st)
    assert spark.read.parquet(str(tmp_path / "z")).count() == keyed.count()


def test_jsonl_corpus_roundtrip(spark, sf_dir, tmp_path):
    """Export → read-back preserves every row and column; shard count
    and membership are stable across re-exports."""
    import glob
    import os

    from smart_meter_data_pipeline_spark.sources.corpus_io import (
        export_corpus_jsonl,
        read_corpus_jsonl,
    )
    from smart_meter_data_pipeline_spark.sources.readers import load_table

    docs = load_table(spark, sf_dir, "documents")
    path = str(tmp_path / "corpus_jsonl")
    export_corpus_jsonl(docs, path, n_shards=4)
    files = sorted(glob.glob(os.path.join(path, "part-*")))
    # empty hash buckets write no file, so <= n_shards (tiny corpora
    # can leave a bucket empty); never more than n_shards
    assert 1 <= len(files) <= 4

    back = read_corpus_jsonl(spark, path, schema=docs.schema)
    orig = sorted(map(tuple, docs.collect()))
    got = sorted(map(tuple, back.collect()))
    assert got == orig

    # idempotent layout: same doc set lands in the same shard files
    sizes_a = sorted(os.path.getsize(f) for f in files)
    export_corpus_jsonl(docs, path, n_shards=4)
    files_b = sorted(glob.glob(os.path.join(path, "part-*")))
    sizes_b = sorted(os.path.getsize(f) for f in files_b)
    assert sizes_a == sizes_b


def test_jsonl_schema_evolution(spark, sf_dir, tmp_path):
    """Reading a JSONL layout with an evolved schema: an added column
    comes back NULL (forward compat), a subset schema prunes (the
    reader never fails on missing/extra fields — the property corpus
    consumers rely on across export versions)."""
    from pyspark.sql import functions as F
    from pyspark.sql.types import LongType, StringType, StructField, StructType

    from smart_meter_data_pipeline_spark.sources.corpus_io import (
        export_corpus_jsonl,
        read_corpus_jsonl,
    )
    from smart_meter_data_pipeline_spark.sources.readers import load_table

    docs = load_table(spark, sf_dir, "documents")
    path = str(tmp_path / "corpus_evo")
    export_corpus_jsonl(docs, path, n_shards=2)

    evolved = StructType(
        [
            StructField("doc_id", LongType()),
            StructField("lang", StringType()),
            StructField("quality_tier", StringType()),  # not in the data
        ]
    )
    back = read_corpus_jsonl(spark, path, schema=evolved)
    assert back.count() == docs.count()
    assert back.filter(F.col("quality_tier").isNotNull()).count() == 0
    langs = {r["lang"] for r in back.select("lang").distinct().collect()}
    assert langs == {
        r["lang"] for r in docs.select("lang").distinct().collect()
    }


def test_priority_names_all_registered():
    """Every _PRIORITY entry must name a registered query — a typo'd
    name silently drops out of the driver's evaluation ordering (the
    list is filtered, not validated, at load), which would quietly
    burn one of the ~50 per-round evaluation slots."""
    from smart_meter_data_pipeline_spark.plans import registry

    registry.load_all()
    missing = [n for n in registry._PRIORITY if n not in registry.QUERIES]
    assert missing == []
    dupes = {
        n for n in registry._PRIORITY if registry._PRIORITY.count(n) > 1
    }
    assert dupes == set()
