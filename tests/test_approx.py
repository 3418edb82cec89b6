"""Approximate aggregates — the opt-in 100 TB path — must land within
documented error bounds of their exact counterparts (the exact forms
are the oracle-checked queries; approx is never silently substituted,
per SURVEY §2.4/A5)."""

from __future__ import annotations

import pytest

from pyspark.sql import functions as F

from smart_meter_data_pipeline_spark.sources.readers import load_table


@pytest.mark.slow
def test_approx_count_distinct_bound(spark, sf_dir):
    ev = load_table(spark, sf_dir, "events")
    exact = ev.select(F.countDistinct("user_id").alias("n")).collect()[0]["n"]
    approx = ev.select(
        F.approx_count_distinct("user_id", rsd=0.02).alias("n")
    ).collect()[0]["n"]
    assert abs(approx - exact) / exact < 0.05


def test_percentile_approx_bound(spark, sf_dir):
    ev = load_table(spark, sf_dir, "events")
    rows = ev.groupBy("event_type").agg(
        F.expr("percentile(value, 0.95)").alias("exact"),
        F.percentile_approx("value", 0.95, 10000).alias("approx"),
    ).collect()
    assert rows
    for r in rows:
        # percentile_approx returns an actual data value within the
        # accuracy rank-error of the true quantile
        assert abs(r["approx"] - r["exact"]) <= abs(r["exact"]) * 0.05 + 1e-9


def test_hist_quantile_within_one_bin_of_exact(spark, sf_dir):
    """The histogram-sketch estimate is an upper bound on the exact
    quantile, off by at most one bin width."""
    from smart_meter_data_pipeline_spark.operators.extended import (
        HIST_BINS,
        event_value_hist_quantiles,
    )

    ev = load_table(spark, sf_dir, "events")
    lo, hi = ev.agg(F.min("value"), F.max("value")).collect()[0]
    width = (hi - lo) / HIST_BINS
    est = {
        r["p"]: r["est_value"]
        for r in event_value_hist_quantiles(spark, sf_dir).collect()
    }
    assert len(est) == 3
    for p, e in est.items():
        exact = ev.agg(F.expr(f"percentile(value, {p})")).collect()[0][0]
        assert e >= exact - 1e-9
        assert e - exact <= width + 1e-9
