"""Bucketed fact layout must eliminate the full-fact shuffle from the
staging window (the SURVEY §4 co-location optimization)."""

from __future__ import annotations

import re

from smart_meter_data_pipeline_spark.operators.meter_pipeline import (
    gen_meter_readings,
    stg_transform,
)
from smart_meter_data_pipeline_spark.sources.bucketed import (
    read_bucketed_fact,
    write_bucketed_fact,
)


def _physical_plan(df) -> str:
    return df._sc._jvm.PythonSQLUtils.explainString(
        df._jdf.queryExecution(), "formatted"
    )


def test_bucketed_scan_elides_window_exchange(spark, tmp_path):
    readings = gen_meter_readings(spark, n_meters=50, n_ticks=8)
    write_bucketed_fact(readings, "bucketed_fact_test", n_buckets=8)
    try:
        landed = read_bucketed_fact(spark, "bucketed_fact_test")

        # Same rows round-trip.
        assert landed.count() == 50 * 8

        plan = _physical_plan(stg_transform(landed))
        # The plan must contain the Window but NO shuffle exchange —
        # the bucketed scan already clusters by meter_id. (Sort may
        # remain; eliminating the exchange is the scale win.)
        assert "Window" in plan
        exchanges = re.findall(r"\bExchange\b", plan)
        assert not exchanges, f"unexpected shuffle in plan:\n{plan}"

        # And the staging output equals the unbucketed path.
        expect = stg_transform(readings)
        got = stg_transform(landed)
        assert got.exceptAll(expect).count() == 0
        assert expect.exceptAll(got).count() == 0
    finally:
        spark.sql("DROP TABLE IF EXISTS bucketed_fact_test")
