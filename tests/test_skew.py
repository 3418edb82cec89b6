"""Salted join must equal the plain join on skewed data."""

from __future__ import annotations

from pyspark.sql import functions as F

from smart_meter_data_pipeline_spark.operators.skew import salted_join


def test_salted_join_equals_plain_join(spark):
    # Heavily skewed left side: 90% of rows share key 1.
    left = spark.range(10_000).select(
        F.when(F.col("id") % 10 < 9, F.lit(1))
        .otherwise(F.col("id") % 100)
        .cast("long")
        .alias("k"),
        F.col("id").alias("payload"),
    )
    right = spark.range(100).select(
        F.col("id").alias("k"), (F.col("id") * 10).alias("attr")
    )
    plain = left.join(right, "k", "inner")
    salted = salted_join(left, right, "k", n_salts=8)
    assert salted.count() == plain.count()
    assert salted.exceptAll(plain).count() == 0
    assert plain.exceptAll(salted).count() == 0
    # the salt column must not leak into the result
    assert salted.columns == plain.columns
