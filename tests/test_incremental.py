"""Incremental mart refresh must equal the full rebuild, touching only
the changed partitions."""

from __future__ import annotations

import datetime as dt
import os

from pyspark.sql import functions as F

from smart_meter_data_pipeline_spark.operators.incremental import (
    refresh_marts_incremental,
)
from smart_meter_data_pipeline_spark.operators.meter_pipeline import (
    fact_customer_billing_daily,
    fact_grid_load_hourly,
    gen_dim_customers,
    gen_dim_grid_zones,
    gen_dim_meters,
    gen_dim_tariff_rates,
    gen_meter_readings,
    stg_transform,
)


def test_incremental_refresh_matches_full(spark, tmp_path):
    n_meters, days = 25, 3
    readings = gen_meter_readings(spark, n_meters=n_meters, n_ticks=96 * days)
    fact_dir = str(tmp_path / "fact")
    (
        readings.withColumn("reading_date", F.to_date("reading_timestamp"))
        .write.partitionBy("reading_date")
        .parquet(fact_dir)
    )
    dims = dict(
        dim_meters=gen_dim_meters(spark, n_meters),
        dim_customers=gen_dim_customers(spark, n_meters),
        dim_tariff_rates=gen_dim_tariff_rates(spark),
        dim_grid_zones=gen_dim_grid_zones(spark),
    )
    billing_dir = str(tmp_path / "billing")
    grid_dir = str(tmp_path / "grid")

    all_dates = sorted(
        r["d"]
        for r in readings.select(F.to_date("reading_timestamp").alias("d"))
        .distinct()
        .collect()
    )
    assert len(all_dates) == days

    # seed: build every date incrementally (day 1 has no predecessor —
    # overlap scan of a missing partition must be a no-op)
    refresh_marts_incremental(
        spark, fact_dir, billing_dir, grid_dir, all_dates, **dims
    )

    # corrupt day 2's mart partitions, then refresh ONLY day 2
    target = all_dates[1]
    stamp_before = {}
    for d, mart in ((all_dates[0], billing_dir), (all_dates[2], billing_dir)):
        part = os.path.join(mart, f"billing_date={d}")
        stamp_before[part] = sorted(os.listdir(part))
    refresh_marts_incremental(
        spark, fact_dir, billing_dir, grid_dir, [target], **dims
    )
    # untouched partitions keep their exact files
    for part, files in stamp_before.items():
        assert sorted(os.listdir(part)) == files

    # equality with the monolithic full rebuild
    stg = stg_transform(readings)
    full_billing = fact_customer_billing_daily(
        stg, dims["dim_meters"], dims["dim_customers"], dims["dim_tariff_rates"]
    )
    inc_billing = spark.read.parquet(billing_dir).select(*full_billing.columns)
    assert inc_billing.count() == full_billing.count()
    assert inc_billing.exceptAll(full_billing).count() == 0
    assert full_billing.exceptAll(inc_billing).count() == 0

    full_grid = fact_grid_load_hourly(
        stg, dims["dim_meters"], dims["dim_grid_zones"]
    )
    inc_grid = spark.read.parquet(grid_dir).select(*full_grid.columns)
    assert inc_grid.count() == full_grid.count()
    assert inc_grid.exceptAll(full_grid).count() == 0
    assert full_grid.exceptAll(inc_grid).count() == 0
