"""Property checks from FIXTURES.md §7 / SURVEY.md §5 over the
generated meter data and pipeline transforms."""

from __future__ import annotations

import pytest
from pyspark.sql import functions as F

from smart_meter_data_pipeline_spark.operators import meter_pipeline as mp


@pytest.fixture(scope="module")
def readings(spark):
    return mp.gen_meter_readings(spark).cache()


@pytest.fixture(scope="module")
def stg(spark, readings):
    return mp.stg_transform(readings).cache()


def test_pk_unique(readings):
    n = readings.count()
    assert n == mp.N_METERS * mp.N_TICKS
    assert readings.select("reading_timestamp", "meter_id").distinct().count() == n


def test_cumulative_non_decreasing(stg):
    assert stg.filter(F.col("consumption_delta_mwh") < 0).count() == 0
    assert stg.filter(F.col("production_delta_mwh") < 0).count() == 0


def test_production_null_iff_odd_meter(readings):
    bad = readings.filter(
        (F.col("meter_id") % 2 == 1)
        != F.col("reading_production_milliwatts").isNull()
    )
    assert bad.count() == 0


def test_status_distribution(readings):
    dist = {
        r["status"]: r["n"]
        for r in readings.groupBy("status").agg(F.count("*").alias("n")).collect()
    }
    n = sum(dist.values())
    assert 0.96 < dist["V"] / n < 0.99
    assert 0.005 < dist.get("E", 0) / n < 0.03
    assert 0.001 < dist.get("R", 0) / n < 0.012


def test_deltas_telescope_to_cumulative(stg):
    """Σ(deltas) per meter == last cumulative (first-reading fallback
    makes the sum telescope exactly — stg_meter_readings.sql:46-54)."""
    sums = stg.groupBy("meter_id").agg(
        F.sum("consumption_delta_mwh").alias("sum_delta"),
        F.max_by("cumulative_consumption_mwh", "reading_timestamp").alias("last_cum"),
    )
    assert sums.filter(F.col("sum_delta") != F.col("last_cum")).count() == 0


def test_inner_joins_drop_nothing(spark, stg):
    """Every fact meter_id has a dim row (ids 1..N) — the marts' inner
    joins must not drop readings (SURVEY §2.5 semantics note)."""
    dims = mp.gen_dim_meters(spark)
    n_stg_meters = stg.select("meter_id").distinct().count()
    joined = stg.join(dims, "meter_id", "inner").select("meter_id").distinct().count()
    assert joined == n_stg_meters == mp.N_METERS


def test_billing_conservation(spark, stg):
    """Mart-level invariant: total consumption across all customers ==
    total deltas in staging; net = consumption − production."""
    billing = mp.fact_customer_billing_daily(
        stg,
        mp.gen_dim_meters(spark),
        mp.gen_dim_customers(spark),
        mp.gen_dim_tariff_rates(spark),
    )
    b = billing.agg(
        F.sum("total_consumption_kwh").alias("cons"),
        F.sum("total_net_consumption_kwh").alias("net"),
        F.sum("total_production_kwh").alias("prod"),
    ).first()
    s = stg.agg(
        (F.sum("consumption_delta_mwh") / 1e6).alias("cons"),
        (F.sum("net_delta_mwh") / 1e6).alias("net"),
    ).first()
    assert abs(b["cons"] - s["cons"]) < 1e-6
    assert abs(b["net"] - s["net"]) < 1e-6
    assert abs((b["cons"] - b["prod"]) - b["net"]) < 1e-6


def test_grid_load_zones(spark, stg):
    """Meters reference only zones 5..20; every zone row has capacity."""
    grid = mp.fact_grid_load_hourly(
        stg, mp.gen_dim_meters(spark), mp.gen_dim_grid_zones(spark)
    )
    zones = [r["grid_zone_id"] for r in grid.select("grid_zone_id").distinct().collect()]
    assert min(zones) >= 5 and max(zones) <= 20
    assert grid.filter(F.col("max_capacity_megawatts") <= 0).count() == 0
    assert grid.filter(
        (F.col("data_quality_pct") < 0) | (F.col("data_quality_pct") > 100)
    ).count() == 0


def test_tariff_rate_matches_hardcode(spark):
    """§2.9: the joined rate must equal the reference's hard-coded 0.28."""
    rate = mp.gen_dim_tariff_rates(spark).first()["base_rate_per_kwh"]
    assert float(rate) == 0.28
