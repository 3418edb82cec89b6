"""Reference pipeline semantics over the driver's ``events`` table.

The reference engine's analytical core (stg_meter_readings.sql →
fact_customer_billing_daily.sql / fact_grid_load_hourly.sql) is:

    per-key LAG delta → project/convert/flag → two-level rollup
    (day×entity then day×owner; hour×entity then hour×zone) with
    dim joins, conditional aggregation, exact count-distinct,
    rate application and guarded percentages.

This module expresses exactly those operators over the driver's
``events`` table (user_id ~ meter_id, ts ~ reading_timestamp, value ~
reading, customer ~ dim_customers, nation ~ dim_grid_zones), each with a
DuckDB oracle. The meter-schema twin lives in ``meter_pipeline.py``.

Scale design (100 TB):

- The LAG window and the daily rollup share the shuffle: Catalyst plans
  one exchange on ``user_id`` for the window sort and reuses the
  hash-partitioning for the partial aggregation above it.
- Dimension joins are declared broadcast (reference J1-J4: 1M-row dims
  ≈ tens of MB — broadcastable; 25-row nation trivially so).
- All sums use exact-decimal accumulation (see ``common.dsum``), which
  keeps map-side partial aggregation correct and deterministic.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession, Window
from pyspark.sql import functions as F

from smart_meter_data_pipeline_spark.operators.common import dsum, guarded_pct
from smart_meter_data_pipeline_spark.plans.registry import register
from smart_meter_data_pipeline_spark.sources.readers import load_table

def _user_time_window():
    """Per-user event-time order; event_id breaks timestamp ties
    deterministically (reference relies on Kafka per-key ordering instead,
    producer/meter_simulator.py:283-284 — a sort key is the Spark-first
    way). Built lazily: Window exprs need an active session."""
    return Window.partitionBy("user_id").orderBy("ts", "event_id")

EVENT_TYPES = ("click", "view", "purchase", "signup", "error")


def stg_event_deltas(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Staging transform: W1-W2 LAG + P1-P6 projections.

    Mirrors stg_meter_readings.sql:22-82 — LAG() per key ordered by
    event time, delta vs previous, COALESCE first-row fallback
    (stg:46-54), unit conversion (stg:56-65), boolean flags (stg:76-82).
    """
    ev = load_table(spark, sf_dir, "events")
    prev = F.lag("value").over(_user_time_window())
    return (
        ev.select(
            "event_id",
            "ts",
            "user_id",
            "event_type",
            "value",
            prev.alias("prev_value"),
        )
        .withColumn("delta", F.col("value") - F.col("prev_value"))
        .withColumn("delta_or_value", F.coalesce("delta", "value"))
        .withColumn("value_k", F.col("value") / F.lit(1000.0))
        .withColumn("is_error", F.col("event_type") == F.lit("error"))
        .withColumn("is_purchase", F.col("event_type") == F.lit("purchase"))
    )


_STG_SQL = """
SELECT event_id, ts, user_id, event_type, value,
       LAG(value) OVER (PARTITION BY user_id ORDER BY ts, event_id) AS prev_value,
       value - LAG(value) OVER (PARTITION BY user_id ORDER BY ts, event_id) AS delta,
       COALESCE(value - LAG(value) OVER (PARTITION BY user_id ORDER BY ts, event_id),
                value) AS delta_or_value,
       value / 1000.0 AS value_k,
       event_type = 'error' AS is_error,
       event_type = 'purchase' AS is_purchase
FROM events
"""

register("stg_event_deltas", _STG_SQL)(stg_event_deltas)


def daily_user_rollup(spark: SparkSession, sf_dir: str) -> DataFrame:
    """First-level mart rollup: A1 + P7 + P12.

    Mirrors fact_customer_billing_daily.sql:25-46 — GROUP BY (day, key)
    with plain sums, COUNT(*), conditional counts
    (``SUM(CASE WHEN flag THEN 1 ELSE 0 END)``) and the
    ``MAX(bool::int)::boolean`` idiom (billing:42).
    """
    stg = stg_event_deltas(spark, sf_dir)
    return stg.groupBy(
        F.to_date("ts").alias("activity_date"), "user_id"
    ).agg(
        dsum("delta_or_value", "total_delta"),
        dsum("value", "total_value"),
        F.count(F.lit(1)).alias("n_events"),
        F.sum(F.when(F.col("is_error"), 1).otherwise(0)).alias("n_error"),
        F.sum(F.when(~F.col("is_error"), 1).otherwise(0)).alias("n_ok"),
        F.max(F.col("is_purchase").cast("int")).cast("boolean").alias("has_purchase"),
    )


_DAILY_USER_SQL = f"""
WITH stg AS ({_STG_SQL})
SELECT CAST(date_trunc('day', ts) AS DATE) AS activity_date,
       user_id,
       CAST(SUM(CAST(delta_or_value AS DECIMAL(25,6))) AS DOUBLE) AS total_delta,
       CAST(SUM(CAST(value AS DECIMAL(25,6))) AS DOUBLE) AS total_value,
       COUNT(*) AS n_events,
       CAST(SUM(CASE WHEN is_error THEN 1 ELSE 0 END) AS BIGINT) AS n_error,
       CAST(SUM(CASE WHEN NOT is_error THEN 1 ELSE 0 END) AS BIGINT) AS n_ok,
       CAST(MAX(CASE WHEN is_purchase THEN 1 ELSE 0 END) AS BOOLEAN) AS has_purchase
FROM stg
GROUP BY 1, 2
"""

register("daily_user_rollup", _DAILY_USER_SQL)(daily_user_rollup)


def daily_customer_billing(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Second-level billing mart: A2 + J1/J2 + P9/P10 + A5.

    Mirrors fact_customer_billing_daily.sql:49-114 — re-aggregate the
    first-level rollup after joining dimensions (inner-join drop
    semantics, billing:70-72), apply the 0.28 rate (billing:88-96),
    exact COUNT(DISTINCT) (billing:61), guarded percentage
    (billing:106-111).

    The customer join carries NO broadcast hint: customer scales
    linearly with the fact (15B rows at the 100 TB design point), so
    the hint would be an executor OOM there — both sides are already
    keyed/reducible on the same key, and AQE is free to pick broadcast
    at small SF where customer genuinely fits (the round-7 fact-scale
    hint policy; contract-pinned in test_plan_contracts).
    """
    rollup = daily_user_rollup(spark, sf_dir)
    cust = load_table(spark, sf_dir, "customer").select(
        "c_custkey", "c_name", "c_nationkey"
    )
    joined = rollup.join(
        cust, rollup.user_id == cust.c_custkey, "inner"
    )
    total_events = F.sum("n_events")
    return (
        joined.groupBy("activity_date", "c_custkey", "c_name")
        .agg(
            dsum("total_value", "billed_value"),
            F.countDistinct("user_id").alias("n_users"),
            total_events.alias("n_events"),
            F.sum("n_error").alias("n_error"),
        )
        .withColumn("charge", F.col("billed_value") * F.lit(0.28))
        .withColumn(
            "pct_error",
            F.when(
                F.col("n_events") > 0,
                F.col("n_error").cast("double")
                / F.col("n_events").cast("double")
                * 100.0,
            ).otherwise(0.0),
        )
    )


_DAILY_BILLING_SQL = f"""
WITH rollup AS ({_DAILY_USER_SQL})
SELECT activity_date, c_custkey, c_name,
       CAST(SUM(CAST(total_value AS DECIMAL(25,6))) AS DOUBLE) AS billed_value,
       COUNT(DISTINCT user_id) AS n_users,
       CAST(SUM(n_events) AS BIGINT) AS n_events,
       CAST(SUM(n_error) AS BIGINT) AS n_error,
       CAST(SUM(CAST(total_value AS DECIMAL(25,6))) AS DOUBLE) * 0.28 AS charge,
       CASE WHEN SUM(n_events) > 0
            THEN CAST(SUM(n_error) AS DOUBLE) / CAST(SUM(n_events) AS DOUBLE) * 100.0
            ELSE 0.0 END AS pct_error
FROM rollup
INNER JOIN customer ON user_id = c_custkey
GROUP BY 1, 2, 3
"""

register("daily_customer_billing", _DAILY_BILLING_SQL)(daily_customer_billing)


def hourly_nation_load(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Hourly zone-load mart: A3/A4 + J3/J4 + P8/P11.

    Mirrors fact_grid_load_hourly.sql:25-119 — hourly per-entity rollup,
    re-aggregated per zone (nation stands in for dim_grid_zones) with a
    capacity-utilization percentage and peak/critical threshold flags
    (grid:85-104, both guarded on capacity > 0). Capacity here is the
    deterministic expression ``n_nationkey*10 + 100`` (the testdata has
    no capacity column).

    Hint policy: nation keeps its broadcast (25 rows, bounded);
    customer does NOT (scales with the fact — AQE may still choose
    broadcast at small SF, but the plan must not force it).
    """
    ev = load_table(spark, sf_dir, "events")
    hourly = ev.groupBy(
        F.date_trunc("hour", "ts").alias("load_hour"), "user_id"
    ).agg(
        dsum("value", "user_value"),
        F.count(F.lit(1)).alias("n_events"),
        F.sum(F.when(F.col("event_type") == "error", 1).otherwise(0)).alias("n_error"),
    )
    cust = load_table(spark, sf_dir, "customer").select("c_custkey", "c_nationkey")
    nation = load_table(spark, sf_dir, "nation").select("n_nationkey", "n_name")
    joined = (
        hourly.join(cust, hourly.user_id == cust.c_custkey, "inner")
        .join(F.broadcast(nation), cust.c_nationkey == nation.n_nationkey, "inner")
        .withColumn("capacity", F.col("n_nationkey") * 10 + 100)
    )
    out = joined.groupBy("load_hour", "n_nationkey", "n_name", "capacity").agg(
        dsum("user_value", "zone_value"),
        F.countDistinct("user_id").alias("active_users"),
        F.sum("n_events").alias("n_events"),
        F.sum("n_error").alias("n_error"),
    )
    util = F.col("zone_value") / (F.col("capacity").cast("double") * 1000.0) * 100.0
    return (
        out.withColumn(
            "utilization_pct",
            F.when(F.col("capacity") > 0, util).otherwise(0.0),
        )
        .withColumn("is_peak_load", F.col("utilization_pct") > 80.0)
        .withColumn("is_critical_load", F.col("utilization_pct") > 95.0)
        .withColumn(
            "pct_error",
            F.when(
                F.col("n_events") > 0,
                F.col("n_error").cast("double")
                / F.col("n_events").cast("double")
                * 100.0,
            ).otherwise(0.0),
        )
    )


_HOURLY_NATION_SQL = """
WITH hourly AS (
  SELECT date_trunc('hour', ts) AS load_hour, user_id,
         CAST(SUM(CAST(value AS DECIMAL(25,6))) AS DOUBLE) AS user_value,
         COUNT(*) AS n_events,
         CAST(SUM(CASE WHEN event_type = 'error' THEN 1 ELSE 0 END) AS BIGINT) AS n_error
  FROM events GROUP BY 1, 2
), joined AS (
  SELECT h.*, n.n_nationkey, n.n_name, n.n_nationkey * 10 + 100 AS capacity
  FROM hourly h
  INNER JOIN customer c ON h.user_id = c.c_custkey
  INNER JOIN nation n ON c.c_nationkey = n.n_nationkey
), agg AS (
  SELECT load_hour, n_nationkey, n_name, capacity,
         CAST(SUM(CAST(user_value AS DECIMAL(25,6))) AS DOUBLE) AS zone_value,
         COUNT(DISTINCT user_id) AS active_users,
         CAST(SUM(n_events) AS BIGINT) AS n_events,
         CAST(SUM(n_error) AS BIGINT) AS n_error
  FROM joined GROUP BY 1, 2, 3, 4
)
SELECT *,
       CASE WHEN capacity > 0
            THEN zone_value / (CAST(capacity AS DOUBLE) * 1000.0) * 100.0
            ELSE 0.0 END AS utilization_pct,
       CASE WHEN capacity > 0
            THEN zone_value / (CAST(capacity AS DOUBLE) * 1000.0) * 100.0
            ELSE 0.0 END > 80.0 AS is_peak_load,
       CASE WHEN capacity > 0
            THEN zone_value / (CAST(capacity AS DOUBLE) * 1000.0) * 100.0
            ELSE 0.0 END > 95.0 AS is_critical_load,
       CASE WHEN n_events > 0
            THEN CAST(n_error AS DOUBLE) / CAST(n_events AS DOUBLE) * 100.0
            ELSE 0.0 END AS pct_error
FROM agg
"""

register("hourly_nation_load", _HOURLY_NATION_SQL)(hourly_nation_load)


def cumulative_user_value(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Running per-key cumulative sum (reference G2 — the generator's
    cumulative-counter semantics, producer/meter_simulator.py:198-203),
    as an exact-decimal windowed sum."""
    ev = load_table(spark, sf_dir, "events")
    running = (
        F.sum(F.col("value").cast("decimal(25,6)"))
        .over(_user_time_window().rowsBetween(Window.unboundedPreceding, 0))
        .cast("double")
    )
    return ev.select(
        "event_id", "ts", "user_id", "value", running.alias("cumulative_value")
    )


_CUMULATIVE_SQL = """
SELECT event_id, ts, user_id, value,
       CAST(SUM(CAST(value AS DECIMAL(25,6)))
            OVER (PARTITION BY user_id ORDER BY ts, event_id
                  ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW)
            AS DOUBLE) AS cumulative_value
FROM events
"""

register("cumulative_user_value", _CUMULATIVE_SQL)(cumulative_user_value)


def validation_summary(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Ingest validation / quarantine split: F1 + F4 semantics.

    Mirrors the consumer's required-field check
    (consumer/meter_consumer.py:213-215) and the schema CHECK
    constraints (01_create_schema.sql:84-93): classify every row into a
    reject reason (first violated rule wins) and count per bucket —
    the valid/quarantine split an ingest run would perform.
    """
    ev = load_table(spark, sf_dir, "events")
    reason = (
        F.when(F.col("ts").isNull() | F.col("user_id").isNull(), "missing_required")
        .when(F.col("value").isNull() | (F.col("value") < 0), "bad_value")
        .when(~F.col("event_type").isin(*EVENT_TYPES), "bad_type")
        .otherwise("ok")
    )
    return (
        ev.select(reason.alias("reject_reason"))
        .groupBy("reject_reason")
        .agg(F.count(F.lit(1)).alias("n_rows"))
    )


_VALIDATION_SQL = """
SELECT CASE
         WHEN ts IS NULL OR user_id IS NULL THEN 'missing_required'
         WHEN value IS NULL OR value < 0 THEN 'bad_value'
         WHEN event_type NOT IN ('click','view','purchase','signup','error')
              THEN 'bad_type'
         ELSE 'ok' END AS reject_reason,
       COUNT(*) AS n_rows
FROM events
GROUP BY 1
"""

register("validation_summary", _VALIDATION_SQL)(validation_summary)


def ingest_wire_quarantine(spark: SparkSession, sf_dir: str) -> DataFrame:
    """End-to-end S4/F1 totality under the gate: wire JSON →
    ``parse_messages`` → ``classify`` → per-reason counts, on a
    deterministic adversarial fixture derived from the events table.

    Each event row becomes one wire message; ``event_id % 7`` picks a
    mutation that must land in exactly one quarantine bucket (first
    violated rule wins, mirroring consumer/meter_consumer.py:198-224 +
    01_create_schema.sql:84-93):

    - ``% 7 == 0``: malformed OR out-of-domain timestamp string —
      split by ``% 14`` between ``'not-a-timestamp'`` (the input that
      crashed the whole batch under ANSI mode before the
      ``try_to_timestamp`` fix) and ``'3000-01-01'`` (parses, but
      outside the pandas-interop domain guard) → ``bad_timestamp``;
    - ``% 7 == 1``: status ``'X'`` → ``bad_status``;
    - ``% 7 == 2``: negative consumption → ``negative_reading``;
    - ``% 7 == 3``: meter_id omitted → ``missing_required``;
    - ``% 7 == 4``: non-JSON garbage → ``malformed_json``;
    - ``% 7 == 5``: both readings absent → ``no_reading``;
    - ``% 7 == 6``: clean → valid (``'ok'``).

    The oracle re-derives the buckets from the mutation rule alone, so
    any crash or misclassification in the parse/validate path is a
    hash mismatch — this is the driver-gate proof of the quarantine
    branches the registered fixtures never exercised before round 14.
    """
    from smart_meter_data_pipeline_spark.sources.ingest import (
        classify,
        parse_messages,
    )

    ev = load_table(spark, sf_dir, "events").filter(
        F.col("ts").isNotNull() & F.col("user_id").isNotNull()
    )
    m7 = F.pmod("event_id", F.lit(7))
    m14 = F.pmod("event_id", F.lit(14))
    ts_str = (
        F.when(m14 == 0, F.lit("not-a-timestamp"))
        .when(m14 == 7, F.lit("3000-01-01 00:00:00"))
        .otherwise(F.date_format("ts", "yyyy-MM-dd HH:mm:ss"))
    )
    status = F.when(m7 == 1, F.lit("X")).otherwise(
        F.element_at(
            F.array(F.lit("V"), F.lit("E"), F.lit("R")),
            (F.pmod("event_id", F.lit(3)) + 1).cast("int"),
        )
    )
    cons = (
        F.when(m7 == 2, F.lit(-1))
        .when(m7 == 5, F.lit(None))
        .otherwise(F.pmod("event_id", F.lit(1000)))
        .cast("int")
    )
    meter = (
        F.when(m7 == 3, F.lit(None))
        .otherwise(F.pmod("event_id", F.lit(1000000)))
        .cast("int")
    )
    envelope = F.to_json(
        F.struct(
            meter.alias("meter_id"),
            ts_str.alias("reading_timestamp"),
            cons.alias("reading_consumption_milliwatts"),
            F.lit(None).cast("int").alias("reading_production_milliwatts"),
            status.alias("status"),
        )
    )
    wire = F.when(
        m7 == 4,
        F.concat(F.lit("@@garbage@@"), F.col("event_id").cast("string")),
    ).otherwise(envelope)
    classified = classify(parse_messages(ev.select(wire.alias("value"))))
    return (
        classified.select(
            F.coalesce("reject_reason", F.lit("ok")).alias("reject_reason")
        )
        .groupBy("reject_reason")
        .agg(F.count(F.lit(1)).alias("n_rows"))
    )


_WIRE_QUARANTINE_SQL = """
SELECT CASE
         WHEN event_id % 7 = 4 THEN 'malformed_json'
         WHEN event_id % 7 = 3 THEN 'missing_required'
         WHEN event_id % 7 = 0 THEN 'bad_timestamp'
         WHEN event_id % 7 = 1 THEN 'bad_status'
         WHEN event_id % 7 = 2 THEN 'negative_reading'
         WHEN event_id % 7 = 5 THEN 'no_reading'
         ELSE 'ok' END AS reject_reason,
       COUNT(*) AS n_rows
FROM events
WHERE ts IS NOT NULL AND user_id IS NOT NULL
GROUP BY 1
"""

register("ingest_wire_quarantine", _WIRE_QUARANTINE_SQL)(
    ingest_wire_quarantine
)


def dedup_redelivery(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Idempotent-ingest semantics: T1 / S5.

    The reference survives Kafka at-least-once redelivery via
    ``INSERT ... ON CONFLICT DO NOTHING`` (consumer/meter_consumer.py:
    104-114). Spark-first equivalent: duplicate the stream (simulated
    redelivery), then dedup on the natural key before aggregating —
    output must equal the single-delivery result.
    """
    ev = load_table(spark, sf_dir, "events")
    redelivered = ev.unionByName(ev)
    deduped = redelivered.dropDuplicates(["event_id"])
    return deduped.groupBy(F.to_date("ts").alias("activity_date")).agg(
        F.count(F.lit(1)).alias("n_events"),
        dsum("value", "total_value"),
    )


_DEDUP_SQL = """
WITH redelivered AS (
  SELECT * FROM events UNION ALL SELECT * FROM events
), deduped AS (
  SELECT DISTINCT * FROM redelivered
)
SELECT CAST(date_trunc('day', ts) AS DATE) AS activity_date,
       COUNT(*) AS n_events,
       CAST(SUM(CAST(value AS DECIMAL(25,6))) AS DOUBLE) AS total_value
FROM deduped
GROUP BY 1
"""

register("dedup_redelivery", _DEDUP_SQL)(dedup_redelivery)


def top_value_users(spark: SparkSession, sf_dir: str) -> DataFrame:
    """ORDER BY + LIMIT (the README.md:59 ad-hoc query shape): top 10
    users by total value, deterministic tiebreak on user_id."""
    ev = load_table(spark, sf_dir, "events")
    return (
        ev.groupBy("user_id")
        .agg(dsum("value", "total_value"), F.count(F.lit(1)).alias("n_events"))
        .orderBy(F.col("total_value").desc(), F.col("user_id"))
        .limit(10)
    )


_TOP_USERS_SQL = """
SELECT user_id,
       CAST(SUM(CAST(value AS DECIMAL(25,6))) AS DOUBLE) AS total_value,
       COUNT(*) AS n_events
FROM events
GROUP BY user_id
ORDER BY total_value DESC, user_id
LIMIT 10
"""

register("top_value_users", _TOP_USERS_SQL)(top_value_users)


def events_dedup_latest(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Latest-record-per-key compaction: keep each (user, event_type)
    pair's most recent event — the standard CDC/changelog compaction
    read (Kafka compacted topic semantics as a batch query). One
    row_number window over the key, deterministic tie-break on
    event_id; the single shuffle is on the dedup key, and the filter
    on rn=1 collapses before anything downstream."""
    from pyspark.sql import Window

    events = load_table(spark, sf_dir, "events")
    w = Window.partitionBy("user_id", "event_type").orderBy(
        F.col("ts").desc(), F.col("event_id").desc()
    )
    return (
        events.withColumn("rn", F.row_number().over(w))
        .filter(F.col("rn") == 1)
        .select("user_id", "event_type", "event_id", "ts", "value")
    )


_DEDUP_LATEST_SQL = """
SELECT user_id, event_type, event_id, ts, value
FROM (
  SELECT *, ROW_NUMBER() OVER (PARTITION BY user_id, event_type
                               ORDER BY ts DESC, event_id DESC) AS rn
  FROM events
)
WHERE rn = 1
"""

register("events_dedup_latest", _DEDUP_LATEST_SQL)(events_dedup_latest)


def events_peak_detection(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Local-extrema detection: events that are a strict local maximum
    of their user's value series (higher than both neighbors) — the
    spike-screening primitive behind alerting and changepoint
    pipelines. One LAG + one LEAD over a single (user, time) window
    ordering — both neighbors come from the same sort, one shuffle
    total. Deterministic under tied timestamps via the event_id
    tiebreak in the ordering."""
    from pyspark.sql import Window

    events = load_table(spark, sf_dir, "events")
    w = Window.partitionBy("user_id").orderBy("ts", "event_id")
    prev_v = F.lag("value").over(w)
    next_v = F.lead("value").over(w)
    return (
        events.withColumn("prev_v", prev_v)
        .withColumn("next_v", next_v)
        .filter(
            F.col("prev_v").isNotNull()
            & F.col("next_v").isNotNull()
            & (F.col("value") > F.col("prev_v"))
            & (F.col("value") > F.col("next_v"))
        )
        .select("user_id", "event_id", "ts", "value")
    )


_PEAKS_SQL = """
SELECT user_id, event_id, ts, value
FROM (
  SELECT user_id, event_id, ts, value,
         LAG(value)  OVER (PARTITION BY user_id ORDER BY ts, event_id)
             AS prev_v,
         LEAD(value) OVER (PARTITION BY user_id ORDER BY ts, event_id)
             AS next_v
  FROM events
)
WHERE prev_v IS NOT NULL AND next_v IS NOT NULL
  AND value > prev_v AND value > next_v
"""

register("events_peak_detection", _PEAKS_SQL)(events_peak_detection)


def events_cusum_changepoint(spark: SparkSession, sf_dir: str) -> DataFrame:
    """CUSUM changepoint screen: per event type, the cumulative sum of
    deviations from the type mean along event time; the row where
    |CUSUM| peaks is the classic single-changepoint estimate (a level
    shift makes the deviation sum drift fastest there). One window
    pass + one argmax aggregate per type.

    Exactness: the running sum is DECIMAL (values and the rounded
    mean quantized to the 6-digit grid) — a double running sum would
    hash-break because DuckDB computes windowed sums with segment-tree
    association, not left-to-right. Output is all-integer
    (micro-units + counts); argmax ties break on (ts, event_id)."""
    from pyspark.sql import Window

    events = load_table(spark, sf_dir, "events").select(
        "event_id", "ts", "event_type", "value"
    )
    means = events.groupBy("event_type").agg(
        F.round(
            F.sum(F.col("value").cast("decimal(25,6)")).cast("double")
            / F.count(F.lit(1)),
            6,
        )
        .cast("decimal(12,6)")
        .alias("mean_v"),
        F.count(F.lit(1)).alias("n_events"),
    )
    dev = (
        events.join(F.broadcast(means), "event_type")
        .withColumn(
            "dev",
            F.round(F.col("value"), 6).cast("decimal(12,6)")
            - F.col("mean_v"),
        )
    )
    w = (
        Window.partitionBy("event_type")
        .orderBy("ts", "event_id")
        .rowsBetween(Window.unboundedPreceding, 0)
    )
    cusum = dev.withColumn("cusum", F.sum("dev").over(w))
    return (
        cusum.groupBy("event_type", "n_events")
        .agg(
            F.max(
                F.struct(
                    F.abs(F.col("cusum")).alias("a"),
                    F.col("ts").alias("ts"),
                    F.col("event_id").alias("eid"),
                )
            ).alias("peak")
        )
        .select(
            "event_type",
            F.col("n_events").cast("bigint").alias("n_events"),
            F.col("peak.ts").alias("changepoint_ts"),
            F.col("peak.eid").alias("changepoint_event_id"),
            F.floor(F.col("peak.a") * 1000000)
            .cast("bigint")
            .alias("peak_cusum_micro"),
        )
    )


_CUSUM_SQL = """
WITH means AS (
  SELECT event_type,
         CAST(round(CAST(SUM(CAST(value AS DECIMAL(25,6))) AS DOUBLE)
                    / COUNT(*), 6) AS DECIMAL(12,6)) AS mean_v,
         CAST(COUNT(*) AS BIGINT) AS n_events
  FROM events GROUP BY event_type
),
dev AS (
  SELECT e.event_type, e.event_id, e.ts, m.n_events,
         CAST(round(e.value, 6) AS DECIMAL(12,6)) - m.mean_v AS dev
  FROM events e JOIN means m USING (event_type)
),
cs AS (
  SELECT event_type, event_id, ts, n_events,
         SUM(dev) OVER (PARTITION BY event_type ORDER BY ts, event_id
                        ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW)
             AS cusum
  FROM dev
),
ranked AS (
  SELECT event_type, n_events, ts, event_id, ABS(cusum) AS a,
         ROW_NUMBER() OVER (PARTITION BY event_type
                            ORDER BY ABS(cusum) DESC, ts DESC,
                                     event_id DESC) AS rn
  FROM cs
)
SELECT event_type, n_events,
       ts AS changepoint_ts,
       event_id AS changepoint_event_id,
       CAST(FLOOR(a * 1000000) AS BIGINT) AS peak_cusum_micro
FROM ranked WHERE rn = 1
"""

register("events_cusum_changepoint", _CUSUM_SQL)(events_cusum_changepoint)


MAD_FACTOR = 3


def events_mad_outliers(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Robust outlier screen per event type: median absolute deviation
    (MAD), the standard heavy-tail-safe alternative to the z-score
    screen (events_anomaly_zscore) — a few extreme values move the
    mean/stddev but not the median/MAD.

    Exactness: medians are DISCRETE lower medians selected by rank
    (row_number == (n+1) div 2 over a total order with event_id
    tiebreaks) — pure row selection, no interpolation, so both
    engines pick the IDENTICAL row. dev = |value − med| and the
    3·MAD threshold are single IEEE ops (same bits in both engines).
    Output per type is all-integer micro-units.

    Scale note: the rank windows partition by event_type (bounded
    cardinality ⇒ per-type partitions carry n/|types| rows — the same
    inherent skew as exact CUSUM, documented there); at 100 TB the
    approx dial is percentile_approx on the same frame, traded
    deliberately for the exact cross-engine hash here."""
    from pyspark.sql import Window

    events = load_table(spark, sf_dir, "events").select(
        "event_id", "event_type", "value"
    )
    counts = events.groupBy("event_type").agg(
        F.count(F.lit(1)).alias("n_events")
    )
    w_val = Window.partitionBy("event_type").orderBy("value", "event_id")
    med = (
        events.withColumn("rn", F.row_number().over(w_val))
        .join(F.broadcast(counts), "event_type")
        .filter(F.col("rn") == F.expr("(n_events + 1) div 2"))
        .select("event_type", F.col("value").alias("med"))
    )
    dev = events.join(F.broadcast(med), "event_type").withColumn(
        "dev", F.abs(F.col("value") - F.col("med"))
    )
    w_dev = Window.partitionBy("event_type").orderBy("dev", "event_id")
    mad = (
        dev.withColumn("rn", F.row_number().over(w_dev))
        .join(F.broadcast(counts), "event_type")
        .filter(F.col("rn") == F.expr("(n_events + 1) div 2"))
        .select("event_type", F.col("dev").alias("mad"))
    )
    return (
        dev.join(F.broadcast(mad), "event_type")
        .groupBy("event_type")
        .agg(
            F.count(F.lit(1)).alias("n_events"),
            F.max(F.floor(F.col("med") * 1000000))
            .cast("bigint")
            .alias("med_micro"),
            F.max(F.floor(F.col("mad") * 1000000))
            .cast("bigint")
            .alias("mad_micro"),
            F.sum(
                (
                    F.col("dev") > F.lit(MAD_FACTOR) * F.col("mad")
                ).cast("int")
            )
            .cast("bigint")
            .alias("n_outliers"),
        )
        .withColumn("n_events", F.col("n_events").cast("bigint"))
    )


_MAD_SQL = f"""
WITH counts AS (
  SELECT event_type, COUNT(*) AS n_events FROM events GROUP BY 1
),
ranked AS (
  SELECT event_type, value,
         ROW_NUMBER() OVER (PARTITION BY event_type
                            ORDER BY value, event_id) AS rn
  FROM events
),
med AS (
  SELECT r.event_type, r.value AS med
  FROM ranked r JOIN counts c ON r.event_type = c.event_type
  WHERE r.rn = CAST((c.n_events + 1) // 2 AS BIGINT)
),
dev AS (
  SELECT e.event_type, e.event_id, e.value, m.med,
         ABS(e.value - m.med) AS dev
  FROM events e JOIN med m ON e.event_type = m.event_type
),
dev_ranked AS (
  SELECT event_type, dev,
         ROW_NUMBER() OVER (PARTITION BY event_type
                            ORDER BY dev, event_id) AS rn
  FROM dev
),
mad AS (
  SELECT r.event_type, r.dev AS mad
  FROM dev_ranked r JOIN counts c ON r.event_type = c.event_type
  WHERE r.rn = CAST((c.n_events + 1) // 2 AS BIGINT)
)
SELECT d.event_type,
       CAST(COUNT(*) AS BIGINT) AS n_events,
       CAST(MAX(FLOOR(d.med * 1000000)) AS BIGINT) AS med_micro,
       CAST(MAX(FLOOR(m.mad * 1000000)) AS BIGINT) AS mad_micro,
       CAST(SUM(CASE WHEN d.dev > {MAD_FACTOR} * m.mad
                     THEN 1 ELSE 0 END) AS BIGINT) AS n_outliers
FROM dev d JOIN mad m ON d.event_type = m.event_type
GROUP BY d.event_type
"""

register("events_mad_outliers", _MAD_SQL)(events_mad_outliers)


def events_sax_symbols(spark: SparkSession, sf_dir: str) -> DataFrame:
    """SAX-style symbolization of each user-day: the day's 24 hourly
    mean values are ranked within the day and mapped to quartile
    letters a-d (rank-based PAA→symbol step of Symbolic Aggregate
    approXimation — the time-series motif/anomaly indexing primitive);
    the day reads out as a compact symbol string in hour order.

    Rank-based letters instead of the textbook Gaussian breakpoints:
    breakpoints like ±0.6745σ need stddev (a sqrt is fine, but the
    z-division is a per-row double op whose operand ordering differs
    across engines in the windowed form) — ntile over an exact total
    order is engine-exact and keeps the classic 'equal-occupancy
    symbols' property. Hourly means divide an exact decimal sum by a
    count (the dsum idiom), so the ordering key is identical in both
    engines; ties break on the hour.

    Scale shape: one (user, day, hour) rollup (partial-combined),
    then a window partitioned by (user, day) — ≤24 rows per
    partition, perfectly parallel — then one (user, day) string fold.
    Reference parity: the hourly-profile family
    (fact_meter_grid_load_hourly, models/marts/
    fact_meter_grid_load_hourly.sql) taken to symbolic encoding."""
    from pyspark.sql import Window

    events = load_table(spark, sf_dir, "events").select(
        "user_id", "ts", "value"
    )
    hourly = (
        events.groupBy(
            "user_id",
            F.to_date("ts").alias("day"),
            F.hour("ts").alias("hour"),
        )
        .agg(
            (
                F.sum(F.col("value").cast("decimal(25,6)")).cast("double")
                / F.count(F.lit(1))
            ).alias("hour_mean")
        )
    )
    w = Window.partitionBy("user_id", "day").orderBy("hour_mean", "hour")
    lettered = hourly.withColumn("q", F.ntile(4).over(w)).withColumn(
        "letter", F.expr("substring('abcd', q, 1)")
    )
    return (
        lettered.groupBy("user_id", "day")
        .agg(
            F.count(F.lit(1)).alias("n_hours"),
            F.array_join(
                F.transform(
                    F.array_sort(
                        F.collect_list(F.struct("hour", "letter"))
                    ),
                    lambda s: s["letter"],
                ),
                "",
            ).alias("sax"),
        )
        .withColumn("n_hours", F.col("n_hours").cast("bigint"))
    )


_SAX_SQL = """
WITH hourly AS (
  SELECT user_id, CAST(ts AS DATE) AS day, EXTRACT(hour FROM ts) AS hour,
         CAST(SUM(CAST(value AS DECIMAL(25,6))) AS DOUBLE) / COUNT(*)
             AS hour_mean
  FROM events
  GROUP BY 1, 2, 3
),
lettered AS (
  SELECT user_id, day, hour,
         substring('abcd',
                   NTILE(4) OVER (PARTITION BY user_id, day
                                  ORDER BY hour_mean, hour),
                   1) AS letter
  FROM hourly
)
SELECT user_id, day,
       CAST(COUNT(*) AS BIGINT) AS n_hours,
       STRING_AGG(letter, '' ORDER BY hour) AS sax
FROM lettered
GROUP BY user_id, day
"""

register("events_sax_symbols", _SAX_SQL)(events_sax_symbols)


def events_max_drawdown(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Maximum drawdown per user: the deepest drop of the event value
    below its running maximum along event time — the risk/degradation
    metric (finance drawdown, SLO burn, battery sag) that needs ONE
    cumulative-max window, not a self-join against all earlier rows.

    Exactness: the running max is pure SELECTION (no arithmetic can
    diverge), the drop is one IEEE subtraction, the per-user max one
    more selection — every engine produces identical bits, so the
    micro-floor output hash-checks with no decimal staging at all.

    Scale shape: one (user)-partitioned window over (ts, event_id),
    one partial-combined rollup — the same two-op pipeline as the
    staging deltas (reference models/staging/stg_meter_readings.sql
    LAG), with MAX replacing LAG."""
    from pyspark.sql import Window

    events = load_table(spark, sf_dir, "events").select(
        "user_id", "ts", "event_id", "value"
    )
    w = (
        Window.partitionBy("user_id")
        .orderBy("ts", "event_id")
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    )
    dd = events.withColumn(
        "drop", F.max("value").over(w) - F.col("value")
    )
    return dd.groupBy("user_id").agg(
        F.count(F.lit(1)).cast("bigint").alias("n_events"),
        F.floor(F.max("drop") * 1000000)
        .cast("bigint")
        .alias("max_drawdown_micro"),
    )


_DRAWDOWN_SQL = """
SELECT user_id,
       CAST(COUNT(*) AS BIGINT) AS n_events,
       CAST(FLOOR(MAX(run_max - value) * 1000000) AS BIGINT)
           AS max_drawdown_micro
FROM (
  SELECT user_id, value,
         MAX(value) OVER (
           PARTITION BY user_id ORDER BY ts, event_id
           ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW
         ) AS run_max
  FROM events
)
GROUP BY user_id
"""

register("events_max_drawdown", _DRAWDOWN_SQL)(events_max_drawdown)


def events_benford_digits(spark: SparkSession, sf_dir: str) -> DataFrame:
    """First-significant-digit distribution of event values per type —
    the Benford's-law screen auditors and data-quality monitors run to
    spot fabricated or clipped measurements (natural multi-scale data
    leads with '1' ~30% of the time; uniform generators don't).

    Engine-exact digit extraction WITHOUT logarithms (log10 is not
    cross-engine bit-stable): the value is floored to micro-units in
    int64, and the first digit is the first character of the
    integer's decimal string — integer→string rendering is identical
    in every engine, unlike double→string. Output: per (type, digit)
    count and micro-share, all integers.

    Scale shape: one scan, one two-level (type, digit) rollup, one
    type-level total joined back by broadcast — no windows at all."""
    events = load_table(spark, sf_dir, "events").select(
        "event_type", "value"
    )
    digits = events.filter(F.col("value") > 0).select(
        "event_type",
        F.substring(
            F.floor(F.col("value") * 1000000).cast("bigint").cast("string"),
            1,
            1,
        )
        .cast("int")
        .alias("first_digit"),
    )
    counts = digits.groupBy("event_type", "first_digit").agg(
        F.count(F.lit(1)).alias("n")
    )
    totals = counts.groupBy("event_type").agg(
        F.sum("n").alias("total")
    )
    return counts.join(F.broadcast(totals), "event_type").select(
        "event_type",
        "first_digit",
        F.col("n").cast("bigint").alias("n"),
        F.expr("CAST((1000000 * n) div total AS BIGINT)").alias(
            "share_micro"
        ),
    )


_BENFORD_SQL = """
WITH digits AS (
  SELECT event_type,
         CAST(SUBSTRING(CAST(CAST(FLOOR(value * 1000000) AS BIGINT)
                             AS VARCHAR), 1, 1) AS INT) AS first_digit
  FROM events WHERE value > 0
),
counts AS (
  SELECT event_type, first_digit, COUNT(*) AS n
  FROM digits GROUP BY 1, 2
),
totals AS (
  SELECT event_type, SUM(n) AS total FROM counts GROUP BY 1
)
SELECT event_type, first_digit,
       CAST(n AS BIGINT) AS n,
       CAST((1000000 * n) // total AS BIGINT) AS share_micro
FROM counts JOIN totals USING (event_type)
"""

register("events_benford_digits", _BENFORD_SQL)(events_benford_digits)


MEDIAN_BUCKETS = 4096


def events_exact_median_2pass(spark: SparkSession, sf_dir: str) -> DataFrame:
    """EXACT per-type median WITHOUT sorting the fact: the two-pass
    distributed selection that answers events_mad_outliers' scale
    caveat. Pass 1 histograms each type into ``MEDIAN_BUCKETS``
    equal-width buckets (one map-side-combinable rollup); the bucket
    containing the target rank falls out of a cumulative sum over the
    (type × bucket) rollup — tiny. Pass 2 ranks ONLY the rows inside
    that one bucket (expected n/buckets rows per type), where the
    (rank_in_bucket == target − rows_before_bucket) row IS the
    discrete lower median. Same median row the single-window
    formulation selects — the oracle says so — but the biggest sort
    this plan ever does is one bucket's worth of rows.

    Bucket bounds come from the exact min/max (selection-only, engine
    identical); bucket ids are single-op double math floored to int64
    (same bits both engines); ranking ties break on event_id. Output:
    all-integer micro-units per type."""
    from pyspark.sql import Window

    events = load_table(spark, sf_dir, "events").select(
        "event_id", "event_type", "value"
    )
    stats = events.groupBy("event_type").agg(
        F.min("value").alias("vmin"),
        F.max("value").alias("vmax"),
        F.count(F.lit(1)).alias("n_events"),
    )
    binned = events.join(F.broadcast(stats), "event_type").withColumn(
        "bucket",
        F.when(
            F.col("vmax") > F.col("vmin"),
            F.least(
                F.floor(
                    (F.col("value") - F.col("vmin"))
                    / (F.col("vmax") - F.col("vmin"))
                    * MEDIAN_BUCKETS
                ).cast("bigint"),
                F.lit(MEDIAN_BUCKETS - 1).cast("bigint"),
            ),
        ).otherwise(F.lit(0).cast("bigint")),
    )
    hist = binned.groupBy("event_type", "bucket").agg(
        F.count(F.lit(1)).alias("cnt")
    )
    w_cum = (
        Window.partitionBy("event_type")
        .orderBy("bucket")
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    )
    target = binned.select("event_type", "n_events").distinct().select(
        "event_type", F.expr("(n_events + 1) div 2").alias("target_rank")
    )
    located = (
        hist.withColumn("cum", F.sum("cnt").over(w_cum))
        .withColumn("before", F.col("cum") - F.col("cnt"))
        .join(F.broadcast(target), "event_type")
        .filter(
            (F.col("before") < F.col("target_rank"))
            & (F.col("cum") >= F.col("target_rank"))
        )
        .select(
            "event_type",
            F.col("bucket").alias("med_bucket"),
            "before",
            "target_rank",
        )
    )
    w_in = Window.partitionBy("event_type").orderBy("value", "event_id")
    medians = (
        binned.join(F.broadcast(located), "event_type")
        .filter(F.col("bucket") == F.col("med_bucket"))
        .withColumn("rn", F.row_number().over(w_in))
        .filter(
            F.col("rn") == F.col("target_rank") - F.col("before")
        )
        .select("event_type", F.col("value").alias("med"))
    )
    return (
        events.groupBy("event_type")
        .agg(F.count(F.lit(1)).alias("n_events"))
        .join(medians, "event_type")
        .select(
            "event_type",
            F.col("n_events").cast("bigint").alias("n_events"),
            F.floor(F.col("med") * 1000000)
            .cast("bigint")
            .alias("med_micro"),
        )
    )


_MEDIAN_2PASS_SQL = """
WITH counts AS (
  SELECT event_type, COUNT(*) AS n_events FROM events GROUP BY 1
),
ranked AS (
  SELECT event_type, value,
         ROW_NUMBER() OVER (PARTITION BY event_type
                            ORDER BY value, event_id) AS rn
  FROM events
)
SELECT r.event_type,
       CAST(c.n_events AS BIGINT) AS n_events,
       CAST(FLOOR(r.value * 1000000) AS BIGINT) AS med_micro
FROM ranked r JOIN counts c ON r.event_type = c.event_type
WHERE r.rn = CAST((c.n_events + 1) // 2 AS BIGINT)
"""

register("events_exact_median_2pass", _MEDIAN_2PASS_SQL)(
    events_exact_median_2pass
)


LDC_EXCEEDANCE_PCTS = [10, 50, 90]


def nation_load_duration_curve(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Load-duration curve per nation — the power-engineering readout
    of the reference's hourly grid mart (fact_grid_load_hourly,
    models/marts/fact_grid_load_hourly.sql): sort each nation's
    hourly totals descending and read the load EXCEEDED 10% / 50% /
    90% of hours. Capacity planning reads peaks off the left edge and
    baseload off the right.

    Discrete rank selection over the hourly ROLLUP (nations × hours —
    already bounded long before any ranking), never the event fact:
    position = ((n·pct) div 100) + 1 in the descending (load, hour)
    order, pure row selection with integer positions so both engines
    pick identical rows. Exact-decimal hourly sums; micro outputs."""
    from pyspark.sql import Window

    ev = load_table(spark, sf_dir, "events").select(
        "user_id", "ts", "value"
    )
    cust = load_table(spark, sf_dir, "customer").select(
        "c_custkey", "c_nationkey"
    )
    hourly = (
        ev.join(cust, ev.user_id == cust.c_custkey)
        .groupBy(
            F.col("c_nationkey").alias("nationkey"),
            F.date_trunc("hour", "ts").alias("load_hour"),
        )
        .agg(
            F.sum(F.col("value").cast("decimal(25,6)")).alias("load_dec")
        )
    )
    w = Window.partitionBy("nationkey").orderBy(
        F.col("load_dec").desc(), F.col("load_hour")
    )
    ranked = hourly.withColumn("rn", F.row_number().over(w))
    counts = hourly.groupBy("nationkey").agg(
        F.count(F.lit(1)).alias("n_hours")
    )
    j = ranked.join(F.broadcast(counts), "nationkey")
    sels = [
        F.max(
            F.when(
                F.col("rn")
                == F.expr(f"(n_hours * {p}) div 100 + 1"),
                F.floor(F.col("load_dec").cast("double") * 1000000),
            )
        )
        .cast("bigint")
        .alias(f"exceeded_{p}pct_micro")
        for p in LDC_EXCEEDANCE_PCTS
    ]
    return (
        j.groupBy("nationkey")
        .agg(F.max("n_hours").cast("bigint").alias("n_hours"), *sels)
    )


def _ldc_sql() -> str:
    sel = ",\n".join(
        f"       CAST(MAX(CASE WHEN rn = CAST((n_hours * {p}) // 100"
        f" AS BIGINT) + 1\n"
        f"                     THEN FLOOR(CAST(load_dec AS DOUBLE)"
        f" * 1000000) END) AS BIGINT)\n"
        f"           AS exceeded_{p}pct_micro"
        for p in LDC_EXCEEDANCE_PCTS
    )
    return f"""
WITH hourly AS (
  SELECT c_nationkey AS nationkey,
         date_trunc('hour', ts) AS load_hour,
         SUM(CAST(value AS DECIMAL(25,6))) AS load_dec
  FROM events JOIN customer ON user_id = c_custkey
  GROUP BY 1, 2
),
ranked AS (
  SELECT nationkey, load_dec,
         ROW_NUMBER() OVER (PARTITION BY nationkey
                            ORDER BY load_dec DESC, load_hour) AS rn,
         COUNT(*) OVER (PARTITION BY nationkey) AS n_hours
  FROM hourly
)
SELECT nationkey,
       CAST(MAX(n_hours) AS BIGINT) AS n_hours,
{sel}
FROM ranked
GROUP BY nationkey
"""


register("nation_load_duration_curve", _ldc_sql())(
    nation_load_duration_curve
)


def nation_peak_coincidence(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Coincidence (diversity) factor per nation — the grid-planning
    ratio the reference's zone marts exist to feed: the nation's
    single system peak hour divided by the SUM of its users'
    individual peak hours. Near 1e6 means everyone peaks together
    (worst case for capacity); low means diversity absorbs the load.

    Exact path: (nation, user, hour) decimal rollup → per-user peak
    (decimal MAX — selection only) and per-(nation, hour) system
    series → nation peak; both floored to micro int64 BEFORE the
    single integer ratio. Three partial-combinable rollups, no
    windows, nothing driver-side."""
    ev = load_table(spark, sf_dir, "events").select(
        "user_id", "ts", "value"
    )
    cust = load_table(spark, sf_dir, "customer").select(
        "c_custkey", "c_nationkey"
    )
    user_hour = (
        ev.join(cust, ev.user_id == cust.c_custkey)
        .groupBy(
            F.col("c_nationkey").alias("nationkey"),
            "user_id",
            F.date_trunc("hour", "ts").alias("load_hour"),
        )
        .agg(F.sum(F.col("value").cast("decimal(25,6)")).alias("v"))
    )
    user_peak = user_hour.groupBy("nationkey", "user_id").agg(
        F.max("v").alias("peak_v")
    )
    sum_user_peaks = user_peak.groupBy("nationkey").agg(
        F.floor(F.sum("peak_v").cast("double") * 1000000)
        .cast("bigint")
        .alias("sum_user_peaks_micro"),
        F.count(F.lit(1)).cast("bigint").alias("n_users"),
    )
    system_peak = (
        user_hour.groupBy("nationkey", "load_hour")
        .agg(F.sum("v").alias("system_v"))
        .groupBy("nationkey")
        .agg(
            F.floor(F.max("system_v").cast("double") * 1000000)
            .cast("bigint")
            .alias("system_peak_micro")
        )
    )
    return sum_user_peaks.join(system_peak, "nationkey").select(
        "nationkey",
        "n_users",
        "system_peak_micro",
        "sum_user_peaks_micro",
        F.expr(
            "CAST((1000000 * system_peak_micro)"
            " div sum_user_peaks_micro AS BIGINT)"
        ).alias("coincidence_micro"),
    )


register(
    "nation_peak_coincidence",
    """
WITH user_hour AS (
  SELECT c_nationkey AS nationkey, user_id,
         date_trunc('hour', ts) AS load_hour,
         SUM(CAST(value AS DECIMAL(25,6))) AS v
  FROM events JOIN customer ON user_id = c_custkey
  GROUP BY 1, 2, 3
),
user_peak AS (
  SELECT nationkey, user_id, MAX(v) AS peak_v
  FROM user_hour GROUP BY 1, 2
),
sums AS (
  SELECT nationkey,
         CAST(FLOOR(CAST(SUM(peak_v) AS DOUBLE) * 1000000) AS BIGINT)
             AS sum_user_peaks_micro,
         CAST(COUNT(*) AS BIGINT) AS n_users
  FROM user_peak GROUP BY 1
),
system_peak AS (
  SELECT nationkey,
         CAST(FLOOR(CAST(MAX(system_v) AS DOUBLE) * 1000000) AS BIGINT)
             AS system_peak_micro
  FROM (
    SELECT nationkey, load_hour, SUM(v) AS system_v
    FROM user_hour GROUP BY 1, 2
  ) GROUP BY 1
)
SELECT nationkey, n_users, system_peak_micro, sum_user_peaks_micro,
       CAST((1000000 * system_peak_micro) // sum_user_peaks_micro
            AS BIGINT) AS coincidence_micro
FROM sums JOIN system_peak USING (nationkey)
""",
)(nation_peak_coincidence)


# ---------------------------------------------------------------------------
# Outlier-method ensemble agreement
# ---------------------------------------------------------------------------

IQR_FENCE_K = 1.5  # Tukey fence multiplier — same literal both engines


def events_outlier_ensemble(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Ensemble agreement audit across the three outlier screens the
    engine ships — parametric z-score (events_anomaly_zscore), robust
    MAD (events_mad_outliers), and Tukey IQR fences — re-derived
    per-row in one pipeline and voted: per event type, each method's
    flag count, the majority-vote (≥2) count, and the unanimous
    count. This is the dedup_method_agreement pattern applied to
    anomaly detection: methods disagreeing wildly on a type means the
    flags there are modeling artifacts, not data problems.

    Exactness: z reuses the quantized-grid sufficient statistics
    (decimal sums → round-12 mean/var → round-9 z); medians/quartiles
    are DISCRETE rank selections (both engines pick the identical
    row); fences and comparisons are single IEEE ops.

    Scale shape: per-type sufficient stats are a map-side-combining
    rollup; the rank selections ride per-type windows (bounded type
    cardinality — the documented exact-median skew trade); flags are
    broadcast joins of the tiny per-type stat tables back onto one
    scan; the vote rollup combines map-side."""
    from smart_meter_data_pipeline_spark.operators.extended import (
        ZSCORE_THRESHOLD,
        with_v6,
        zscore_stats,
    )

    events = with_v6(
        load_table(spark, sf_dir, "events").select(
            "event_id", "event_type", "value"
        )
    )
    counts = events.groupBy("event_type").agg(
        F.count(F.lit(1)).alias("n_events")
    )
    w_val = Window.partitionBy("event_type").orderBy("value", "event_id")
    ranked = events.withColumn("rn", F.row_number().over(w_val)).join(
        F.broadcast(counts), "event_type"
    )
    med = ranked.filter(F.col("rn") == F.expr("(n_events + 1) div 2")).select(
        "event_type", F.col("value").alias("med")
    )
    q1 = ranked.filter(F.col("rn") == F.expr("(n_events + 1) div 4")).select(
        "event_type", F.col("value").alias("q1")
    )
    q3 = ranked.filter(
        F.col("rn") == F.expr("(3 * (n_events + 1)) div 4")
    ).select("event_type", F.col("value").alias("q3"))
    dev = events.join(F.broadcast(med), "event_type").withColumn(
        "dev", F.abs(F.col("value") - F.col("med"))
    )
    w_dev = Window.partitionBy("event_type").orderBy("dev", "event_id")
    mad = (
        dev.withColumn("rn", F.row_number().over(w_dev))
        .join(F.broadcast(counts), "event_type")
        .filter(F.col("rn") == F.expr("(n_events + 1) div 2"))
        .select("event_type", F.col("dev").alias("mad"))
    )
    stats = zscore_stats(events)
    mean = F.round(F.col("sv").cast("double") / F.col("n"), 12)
    var = F.greatest(
        F.round(F.col("sv2").cast("double") / F.col("n") - mean * mean, 12),
        F.lit(0.0),
    )
    z = F.when(
        var > 0,
        F.round((F.col("v6").cast("double") - mean) / F.sqrt(var), 9),
    )
    flagged = (
        dev.join(F.broadcast(mad), "event_type")
        .join(F.broadcast(q1), "event_type")
        .join(F.broadcast(q3), "event_type")
        .join(F.broadcast(stats), "event_type")
        .select(
            "event_type",
            # coalesce: degenerate-variance types give z = NULL; the
            # vote sum needs 0 there (NULL would void the whole row)
            F.coalesce(
                (F.abs(z) > F.lit(ZSCORE_THRESHOLD)).cast("int"), F.lit(0)
            ).alias("f_z"),
            (F.col("dev") > F.lit(float(MAD_FACTOR)) * F.col("mad"))
            .cast("int")
            .alias("f_mad"),
            (
                (
                    F.col("value")
                    > F.col("q3")
                    + F.lit(IQR_FENCE_K) * (F.col("q3") - F.col("q1"))
                )
                | (
                    F.col("value")
                    < F.col("q1")
                    - F.lit(IQR_FENCE_K) * (F.col("q3") - F.col("q1"))
                )
            )
            .cast("int")
            .alias("f_iqr"),
        )
    )
    return flagged.groupBy("event_type").agg(
        F.count(F.lit(1)).cast("bigint").alias("n_events"),
        F.sum("f_z").cast("bigint").alias("n_flag_z"),
        F.sum("f_mad").cast("bigint").alias("n_flag_mad"),
        F.sum("f_iqr").cast("bigint").alias("n_flag_iqr"),
        F.sum(
            ((F.col("f_z") + F.col("f_mad") + F.col("f_iqr")) >= 2).cast(
                "int"
            )
        )
        .cast("bigint")
        .alias("n_majority"),
        F.sum(
            ((F.col("f_z") + F.col("f_mad") + F.col("f_iqr")) == 3).cast(
                "int"
            )
        )
        .cast("bigint")
        .alias("n_unanimous"),
    )


register(
    "events_outlier_ensemble",
    f"""
WITH g AS (
  SELECT event_id, event_type, value,
         CAST(round(value, 6) AS DECIMAL(12,6)) AS v6
  FROM events
),
counts AS (SELECT event_type, COUNT(*) AS n_events FROM g GROUP BY 1),
ranked AS (
  SELECT event_type, value,
         ROW_NUMBER() OVER (PARTITION BY event_type
                            ORDER BY value, event_id) AS rn
  FROM g
),
med AS (
  SELECT r.event_type, r.value AS med
  FROM ranked r JOIN counts c ON r.event_type = c.event_type
  WHERE r.rn = CAST((c.n_events + 1) // 2 AS BIGINT)
),
q1 AS (
  SELECT r.event_type, r.value AS q1
  FROM ranked r JOIN counts c ON r.event_type = c.event_type
  WHERE r.rn = CAST((c.n_events + 1) // 4 AS BIGINT)
),
q3 AS (
  SELECT r.event_type, r.value AS q3
  FROM ranked r JOIN counts c ON r.event_type = c.event_type
  WHERE r.rn = CAST((3 * (c.n_events + 1)) // 4 AS BIGINT)
),
dev AS (
  SELECT e.event_id, e.event_type, e.value, e.v6,
         ABS(e.value - m.med) AS dev
  FROM g e JOIN med m ON e.event_type = m.event_type
),
dev_ranked AS (
  SELECT event_type, dev,
         ROW_NUMBER() OVER (PARTITION BY event_type
                            ORDER BY dev, event_id) AS rn
  FROM dev
),
mad AS (
  SELECT r.event_type, r.dev AS mad
  FROM dev_ranked r JOIN counts c ON r.event_type = c.event_type
  WHERE r.rn = CAST((c.n_events + 1) // 2 AS BIGINT)
),
stats AS (
  SELECT event_type, COUNT(*) AS n,
         SUM(CAST(v6 AS DECIMAL(25,6))) AS sv,
         SUM(CAST(v6 AS DECIMAL(25,6)) * CAST(v6 AS DECIMAL(25,6))) AS sv2
  FROM g GROUP BY 1
),
flagged AS (
  SELECT d.event_type,
         CASE WHEN greatest(round(CAST(s.sv2 AS DOUBLE) / s.n
                  - round(CAST(s.sv AS DOUBLE) / s.n, 12)
                    * round(CAST(s.sv AS DOUBLE) / s.n, 12), 12), 0.0) > 0
               AND ABS(round((CAST(d.v6 AS DOUBLE)
                              - round(CAST(s.sv AS DOUBLE) / s.n, 12))
                  / sqrt(greatest(round(CAST(s.sv2 AS DOUBLE) / s.n
                      - round(CAST(s.sv AS DOUBLE) / s.n, 12)
                        * round(CAST(s.sv AS DOUBLE) / s.n, 12), 12), 0.0)),
                  9)) > 3.0
              THEN 1 ELSE 0 END AS f_z,
         CASE WHEN d.dev > {MAD_FACTOR}.0 * m.mad THEN 1 ELSE 0 END
           AS f_mad,
         CASE WHEN d.value > t3.q3 + {IQR_FENCE_K} * (t3.q3 - t1.q1)
                OR d.value < t1.q1 - {IQR_FENCE_K} * (t3.q3 - t1.q1)
              THEN 1 ELSE 0 END AS f_iqr
  FROM dev d
  JOIN mad m ON d.event_type = m.event_type
  JOIN q1 t1 ON d.event_type = t1.event_type
  JOIN q3 t3 ON d.event_type = t3.event_type
  JOIN stats s ON d.event_type = s.event_type
)
SELECT event_type,
       CAST(COUNT(*) AS BIGINT) AS n_events,
       CAST(SUM(f_z) AS BIGINT) AS n_flag_z,
       CAST(SUM(f_mad) AS BIGINT) AS n_flag_mad,
       CAST(SUM(f_iqr) AS BIGINT) AS n_flag_iqr,
       CAST(SUM(CASE WHEN f_z + f_mad + f_iqr >= 2 THEN 1 ELSE 0 END)
            AS BIGINT) AS n_majority,
       CAST(SUM(CASE WHEN f_z + f_mad + f_iqr = 3 THEN 1 ELSE 0 END)
            AS BIGINT) AS n_unanimous
FROM flagged GROUP BY event_type
""",
)(events_outlier_ensemble)


SAX_DISCORD_TOP_K = 20


def events_sax_discords(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Discord screening over the SAX vocabulary — the HOT-SAX
    candidate heuristic: user-days whose symbol word is GLOBALLY
    rarest are the anomaly candidates a full discord search examines
    first (a pattern nobody else's day exhibits is exactly what
    "unusual" means at the symbolic level; the exhaustive
    nearest-neighbor distance pass is the refinement step, run only
    on this shortlist). Reports the {SAX_DISCORD_TOP_K} rarest words
    with their day counts and a deterministic exemplar (user, day).

    Scale shape: composes ``events_sax_symbols``' bounded per-day
    word table — the discord rollup is |distinct words| ≤ |user-days|
    rows with a map-side-combined count, cut by TakeOrdered to a
    constant head; the rank window runs over the post-limit 20-row
    frame only (the adjudicated top-k shape)."""
    from pyspark.sql import Window

    words = events_sax_symbols(spark, sf_dir)
    vocab = words.groupBy("sax").agg(
        F.count(F.lit(1)).alias("n_days"),
        F.min(F.struct("user_id", "day")).alias("ex"),
    )
    head = vocab.orderBy("n_days", "sax").limit(SAX_DISCORD_TOP_K)
    w = Window.orderBy("n_days", "sax")
    return head.withColumn(
        "discord_rank", F.row_number().over(w)
    ).select(
        F.col("discord_rank").cast("int").alias("discord_rank"),
        "sax",
        F.col("n_days").cast("bigint").alias("n_days"),
        F.col("ex.user_id").cast("bigint").alias("example_user"),
        F.col("ex.day").alias("example_day"),
    )


register(
    "events_sax_discords",
    f"""
WITH base AS ({_SAX_SQL}),
vocab AS (
  SELECT sax, COUNT(*) AS n_days,
         MIN({{'user_id': user_id, 'day': day}}) AS ex
  FROM base GROUP BY 1
),
head AS (
  SELECT * FROM vocab ORDER BY n_days, sax LIMIT {SAX_DISCORD_TOP_K}
)
SELECT CAST(ROW_NUMBER() OVER (ORDER BY n_days, sax) AS INT)
         AS discord_rank,
       sax,
       CAST(n_days AS BIGINT) AS n_days,
       CAST(ex.user_id AS BIGINT) AS example_user,
       ex.day AS example_day
FROM head
""",
)(events_sax_discords)


# ---------------------------------------------------------------------------
# Demand-response baseline (CAISO/utility "10-in-10")
# ---------------------------------------------------------------------------

DR_EVENT_DAYS = ("2024-01-20", "2024-01-27")
DR_HOURS = (17, 18, 19, 20)
DR_BASELINE_DAYS = 10


def dr_event_grid(spark: SparkSession) -> DataFrame:
    """The |DR_EVENT_DAYS| × |DR_HOURS| event-cell frame, with the
    div/mod factors DERIVED from the tuples' lengths (round-12
    advice: a hardcoded factor silently builds a wrong grid when the
    event calendar changes). Shared by the batch settlement and its
    streaming twin."""
    n_days = len(DR_EVENT_DAYS)
    evt_days = [F.lit(d).cast("date") for d in DR_EVENT_DAYS]
    return spark.range(n_days * len(DR_HOURS)).select(
        F.element_at(
            F.array(*evt_days),
            (F.col("id") % n_days + 1).cast("int"),
        ).alias("event_day"),
        F.element_at(
            F.array(*[F.lit(h) for h in DR_HOURS]),
            (F.floor(F.col("id") / n_days) + 1).cast("int"),
        ).alias("hr"),
    )


def dr_settlement(rolled: DataFrame) -> DataFrame:
    """The 10-in-10 ranking + settlement half over a (d, hr, load)
    rollup — shared verbatim by :func:`events_dr_baseline` and the
    streaming twin (``stream_dr_baseline``), so the two entry points
    can never drift (round-12 advice: the twin carried a ~60-line
    copy). The rollup is calendar-bounded (≤ days×24 rows), so every
    frame here is broadcast-sized; the rank-1..10 window runs over
    pool days per event cell, never over fact rows."""
    spark = rolled.sparkSession
    is_evt = F.col("d").isin(*[F.lit(d) for d in DR_EVENT_DAYS])
    pool = rolled.filter(~is_evt).select(
        F.col("d").alias("pool_d"), F.col("hr").alias("pool_hr"), "load"
    )
    grid = dr_event_grid(spark)
    w = Window.partitionBy("event_day", "hr").orderBy(
        F.col("pool_d").desc()
    )
    cand = (
        grid.join(
            pool,
            (F.col("pool_hr") == F.col("hr"))
            & (F.col("pool_d") < F.col("event_day")),
        )
        .withColumn("rk", F.row_number().over(w))
        .filter(F.col("rk") <= DR_BASELINE_DAYS)
    )
    base = cand.groupBy("event_day", "hr").agg(
        F.count("*").cast("bigint").alias("n_baseline_days"),
        dsum("load", "baseline_sum"),
    )
    actual = rolled.filter(is_evt).select(
        F.col("d").alias("event_day"),
        F.col("hr").alias("a_hr"),
        F.col("load").alias("actual_load"),
    )
    return (
        base.join(
            actual,
            (base["event_day"] == actual["event_day"])
            & (F.col("a_hr") == F.col("hr")),
            "left",
        )
        .select(
            base["event_day"],
            "hr",
            "n_baseline_days",
            (
                F.col("baseline_sum")
                / F.col("n_baseline_days").cast("double")
            ).alias("baseline_load"),
            F.coalesce(F.col("actual_load"), F.lit(0.0)).alias(
                "actual_load"
            ),
            (
                F.col("baseline_sum")
                / F.col("n_baseline_days").cast("double")
                - F.coalesce(F.col("actual_load"), F.lit(0.0))
            ).alias("reduction"),
        )
    )


def events_dr_baseline(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Demand-response settlement baseline — the utility "10-in-10"
    method (CAISO/PJM customer-baseline-load): for each DR event day
    and event-window hour, the baseline is the average same-hour load
    over the 10 most recent prior NON-EVENT days, and the settled
    reduction is baseline − actual. This is the missing half of the
    meter pipeline's peak analytics (peak shaving SELECTS who to
    curtail; this SETTLES what they actually shed), run on the events
    table (user activity ~ metered load, hour-of-day grid).

    Scale shape: one scan → (day, hour) partial-aggregated rollup
    (≤ days×24 rows at ANY corpus size — the fact table never leaves
    its aggregation), then a broadcast-sized self-join of that rollup
    against the 8 event cells ranked per cell. No window over fact
    cardinality, no driver loop. Exactness: per-cell loads are
    exact-decimal sums; the baseline divides the exact sum by the day
    COUNT as the final double op (deterministic; house float rule)."""
    ev = load_table(spark, sf_dir, "events")
    daily = (
        ev.groupBy(
            F.to_date("ts").alias("d"),
            F.hour("ts").alias("hr"),
        )
        .agg(dsum("value", "load"))
        .localCheckpoint(eager=False)
    )
    return dr_settlement(daily)


register(
    "events_dr_baseline",
    f"""
WITH daily AS (
  SELECT CAST(ts AS DATE) AS d, EXTRACT(hour FROM ts) AS hr,
         CAST(SUM(CAST(value AS DECIMAL(25,6))) AS DOUBLE) AS load
  FROM events GROUP BY 1, 2
),
grid AS (
  SELECT CAST(ed AS DATE) AS event_day, hr
  FROM (VALUES ('2024-01-20'), ('2024-01-27')) e(ed),
       (VALUES (17), (18), (19), (20)) h(hr)
),
cand AS (
  SELECT g.event_day, g.hr, p.load,
         ROW_NUMBER() OVER (PARTITION BY g.event_day, g.hr
                            ORDER BY p.d DESC) AS rk
  FROM grid g
  JOIN daily p
    ON p.hr = g.hr AND p.d < g.event_day
   AND p.d NOT IN (DATE '2024-01-20', DATE '2024-01-27')
),
base AS (
  SELECT event_day, hr, CAST(COUNT(*) AS BIGINT) AS n_baseline_days,
         CAST(SUM(CAST(load AS DECIMAL(25,6))) AS DOUBLE) AS baseline_sum
  FROM cand WHERE rk <= {DR_BASELINE_DAYS}
  GROUP BY 1, 2
)
SELECT b.event_day,
       CAST(b.hr AS INT) AS hr,
       b.n_baseline_days,
       b.baseline_sum / CAST(b.n_baseline_days AS DOUBLE)
         AS baseline_load,
       COALESCE(a.load, 0.0) AS actual_load,
       b.baseline_sum / CAST(b.n_baseline_days AS DOUBLE)
         - COALESCE(a.load, 0.0) AS reduction
FROM base b
LEFT JOIN daily a
  ON a.d = b.event_day AND a.hr = b.hr
""",
)(events_dr_baseline)
