"""Extended operator surface — capabilities the reference lacks
(SURVEY.md §2.9 calls them out as absent) that a complete analytics
engine must offer, each oracle-checked: sessionization, grouping
sets/rollup, pivot, semi/anti joins, as-of join, sliding windows,
percentiles, first/last (argmin/argmax), and time-series gap
detection over the meter grid.

Scale notes inline per operator; the common theme is: one hash
partition per logical key, window sorts reuse the partitioning, and
everything that looks quadratic (as-of) is expressed as a
union + ordered window scan instead of a range join.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession, Window
from pyspark.sql import functions as F

from smart_meter_data_pipeline_spark.operators.common import dsum
from smart_meter_data_pipeline_spark.operators.meter_pipeline import (
    N_METERS,
    N_TICKS,
    _readings_cte,
    _u,
    gen_meter_readings,
)
from smart_meter_data_pipeline_spark.plans.registry import register
from smart_meter_data_pipeline_spark.sources.readers import load_table

SESSION_GAP_MIN = 30


def events_sessionized(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Gap-based sessionization (30-min inactivity): the batch
    formulation of a session window — new-session flag from LAG,
    running sum of flags = session id, then per-session rollup.
    Both windows and the aggregation share one user_id partitioning."""
    ev = load_table(spark, sf_dir, "events")
    w = Window.partitionBy("user_id").orderBy("ts", "event_id")
    gap_flag = F.when(
        (F.unix_timestamp("ts") - F.unix_timestamp(F.lag("ts").over(w)))
        > SESSION_GAP_MIN * 60,
        1,
    ).otherwise(0)
    flagged = ev.withColumn("new_session", gap_flag)
    sessions = flagged.withColumn(
        "session_seq",
        F.sum("new_session").over(w.rowsBetween(Window.unboundedPreceding, 0)),
    )
    return sessions.groupBy("user_id", "session_seq").agg(
        F.min("ts").alias("session_start"),
        F.max("ts").alias("session_end"),
        F.count(F.lit(1)).alias("n_events"),
        dsum("value", "session_value"),
    )


register(
    "events_sessionized",
    f"""
WITH flagged AS (
  SELECT *,
         CASE WHEN epoch(ts) - epoch(LAG(ts) OVER w) > {SESSION_GAP_MIN * 60}
              THEN 1 ELSE 0 END AS new_session
  FROM events
  WINDOW w AS (PARTITION BY user_id ORDER BY ts, event_id)
), sess AS (
  SELECT *,
         CAST(SUM(new_session) OVER (PARTITION BY user_id ORDER BY ts, event_id
                  ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS BIGINT)
           AS session_seq
  FROM flagged
)
SELECT user_id, session_seq,
       MIN(ts) AS session_start, MAX(ts) AS session_end,
       COUNT(*) AS n_events,
       CAST(SUM(CAST(value AS DECIMAL(25,6))) AS DOUBLE) AS session_value
FROM sess GROUP BY 1, 2
""",
)(events_sessionized)


def events_rollup(spark: SparkSession, sf_dir: str) -> DataFrame:
    """ROLLUP (date, event_type): subtotal and grand-total rows in one
    aggregation pass (Expand + single shuffle in Spark)."""
    ev = load_table(spark, sf_dir, "events")
    return (
        ev.select(F.to_date("ts").alias("activity_date"), "event_type", "value")
        .rollup("activity_date", "event_type")
        .agg(
            F.count(F.lit(1)).alias("n_events"),
            dsum("value", "total_value"),
            F.grouping_id().alias("grouping_level"),
        )
    )


register(
    "events_rollup",
    """
SELECT CAST(date_trunc('day', ts) AS DATE) AS activity_date, event_type,
       COUNT(*) AS n_events,
       CAST(SUM(CAST(value AS DECIMAL(25,6))) AS DOUBLE) AS total_value,
       CAST(GROUPING(CAST(date_trunc('day', ts) AS DATE)) * 2
            + GROUPING(event_type) AS BIGINT) AS grouping_level
FROM events
GROUP BY ROLLUP (1, 2)
""",
)(events_rollup)


def event_type_pivot(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Pivot: per-day event counts, one column per event type (explicit
    value list → no extra distinct pass, plan stays one aggregation)."""
    ev = load_table(spark, sf_dir, "events")
    types = ["click", "view", "purchase", "signup", "error"]
    return (
        ev.select(F.to_date("ts").alias("activity_date"), "event_type")
        .groupBy("activity_date")
        .pivot("event_type", types)
        .agg(F.count(F.lit(1)))
        .na.fill(0, types)
    )


register(
    "event_type_pivot",
    """
SELECT CAST(date_trunc('day', ts) AS DATE) AS activity_date,
       CAST(SUM(CASE WHEN event_type = 'click' THEN 1 ELSE 0 END) AS BIGINT) AS click,
       CAST(SUM(CASE WHEN event_type = 'view' THEN 1 ELSE 0 END) AS BIGINT) AS view,
       CAST(SUM(CASE WHEN event_type = 'purchase' THEN 1 ELSE 0 END) AS BIGINT) AS purchase,
       CAST(SUM(CASE WHEN event_type = 'signup' THEN 1 ELSE 0 END) AS BIGINT) AS signup,
       CAST(SUM(CASE WHEN event_type = 'error' THEN 1 ELSE 0 END) AS BIGINT) AS error
FROM events
GROUP BY 1
""",
)(event_type_pivot)


def customers_without_purchase(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Anti join (NOT EXISTS): customers with no purchase event.
    The event side reduces to distinct keys before the join."""
    cust = load_table(spark, sf_dir, "customer").select("c_custkey", "c_name")
    buyers = (
        load_table(spark, sf_dir, "events")
        .filter(F.col("event_type") == "purchase")
        .select(F.col("user_id").alias("c_custkey"))
        .distinct()
    )
    return cust.join(buyers, "c_custkey", "left_anti")


register(
    "customers_without_purchase",
    """
SELECT c_custkey, c_name FROM customer c
WHERE NOT EXISTS (
  SELECT 1 FROM events e
  WHERE e.user_id = c.c_custkey AND e.event_type = 'purchase'
)
""",
)(customers_without_purchase)


def customers_with_error(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Semi join (EXISTS): customers that hit at least one error."""
    cust = load_table(spark, sf_dir, "customer").select(
        "c_custkey", "c_name", "c_mktsegment"
    )
    errs = (
        load_table(spark, sf_dir, "events")
        .filter(F.col("event_type") == "error")
        .select(F.col("user_id").alias("c_custkey"))
    )
    return cust.join(errs, "c_custkey", "left_semi")


register(
    "customers_with_error",
    """
SELECT c_custkey, c_name, c_mktsegment FROM customer c
WHERE EXISTS (
  SELECT 1 FROM events e
  WHERE e.user_id = c.c_custkey AND e.event_type = 'error'
)
""",
)(customers_with_error)


def events_asof_orders(spark: SparkSession, sf_dir: str) -> DataFrame:
    """As-of join: each event matched to the customer's most recent
    order at-or-before the event time.

    Spark-first formulation (no built-in ASOF): tag + union both
    inputs, sort each key's timeline once, and carry the latest order
    forward with ``last(..., ignorenulls)`` — one shuffle on the key,
    linear scan, no range-join explosion. Orders are deduped to the
    max orderkey per (custkey, date) so ties are deterministic
    (matching the oracle's ASOF semantics).
    """
    ev = load_table(spark, sf_dir, "events").select(
        F.col("user_id").alias("k"),
        F.col("ts").alias("t"),
        "event_id",
        "event_type",
        "value",
    )
    orders = (
        load_table(spark, sf_dir, "orders")
        .groupBy(
            F.col("o_custkey").alias("k"), F.col("o_orderdate").alias("t")
        )
        .agg(F.max("o_orderkey").alias("o_orderkey"))
    )
    tagged = orders.select(
        "k", "t", F.lit(0).alias("tag"), "o_orderkey",
        F.lit(None).cast("long").alias("event_id"),
        F.lit(None).cast("string").alias("event_type"),
        F.lit(None).cast("double").alias("value"),
    ).unionByName(
        ev.select(
            "k", "t", F.lit(1).alias("tag"),
            F.lit(None).cast("long").alias("o_orderkey"),
            "event_id", "event_type", "value",
        )
    )
    w = (
        Window.partitionBy("k")
        .orderBy("t", "tag", "event_id")
        .rowsBetween(Window.unboundedPreceding, 0)
    )
    carried = tagged.withColumn(
        "asof_orderkey", F.last("o_orderkey", ignorenulls=True).over(w)
    )
    return carried.filter(F.col("tag") == 1).select(
        "event_id",
        F.col("k").alias("user_id"),
        F.col("t").alias("ts"),
        "event_type",
        "asof_orderkey",
    )


register(
    "events_asof_orders",
    """
WITH o AS (
  SELECT o_custkey, o_orderdate, MAX(o_orderkey) AS o_orderkey
  FROM orders GROUP BY 1, 2
)
SELECT e.event_id, e.user_id, e.ts, e.event_type,
       o.o_orderkey AS asof_orderkey
FROM events e
ASOF LEFT JOIN o ON e.user_id = o.o_custkey AND e.ts >= o.o_orderdate
""",
)(events_asof_orders)


def sliding_window_avg(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Sliding ROWS frame: trailing 4-event average per user (exact
    decimal sum / count — deterministic at any partitioning)."""
    ev = load_table(spark, sf_dir, "events")
    w = (
        Window.partitionBy("user_id")
        .orderBy("ts", "event_id")
        .rowsBetween(-3, 0)
    )
    return ev.select(
        "event_id",
        "user_id",
        "ts",
        "value",
        (
            F.sum(F.col("value").cast("decimal(25,6)")).over(w).cast("double")
            / F.count(F.lit(1)).over(w).cast("double")
        ).alias("trailing_avg_4"),
    )


register(
    "sliding_window_avg",
    """
SELECT event_id, user_id, ts, value,
       CAST(SUM(CAST(value AS DECIMAL(25,6)))
            OVER (PARTITION BY user_id ORDER BY ts, event_id
                  ROWS BETWEEN 3 PRECEDING AND CURRENT ROW) AS DOUBLE)
         / CAST(COUNT(*) OVER (PARTITION BY user_id ORDER BY ts, event_id
                  ROWS BETWEEN 3 PRECEDING AND CURRENT ROW) AS DOUBLE)
         AS trailing_avg_4
FROM events
""",
)(sliding_window_avg)


def first_last_readings(spark: SparkSession, sf_dir: str) -> DataFrame:
    """argmin/argmax (min_by/max_by): first and last cumulative reading
    per meter + the day's consumption as last − first — the telescoped
    equivalent of summing interval deltas (verified against the mart
    path by the staging property tests)."""
    r = gen_meter_readings(spark)
    return r.groupBy("meter_id").agg(
        F.min_by("reading_consumption_milliwatts", "reading_timestamp").alias(
            "first_cum_mwh"
        ),
        F.max_by("reading_consumption_milliwatts", "reading_timestamp").alias(
            "last_cum_mwh"
        ),
        F.min("reading_timestamp").alias("first_ts"),
        F.max("reading_timestamp").alias("last_ts"),
        (
            F.max_by("reading_consumption_milliwatts", "reading_timestamp")
            - F.min_by("reading_consumption_milliwatts", "reading_timestamp")
        ).alias("consumed_after_first_mwh"),
    )


register(
    "first_last_readings",
    f"""WITH {_readings_cte()}
SELECT meter_id,
       arg_min(reading_consumption_milliwatts, reading_timestamp) AS first_cum_mwh,
       arg_max(reading_consumption_milliwatts, reading_timestamp) AS last_cum_mwh,
       MIN(reading_timestamp) AS first_ts,
       MAX(reading_timestamp) AS last_ts,
       arg_max(reading_consumption_milliwatts, reading_timestamp)
         - arg_min(reading_consumption_milliwatts, reading_timestamp)
         AS consumed_after_first_mwh
FROM readings GROUP BY 1
""",
)(first_last_readings)


def missing_readings(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Time-series gap detection: anti-join the expected 15-minute grid
    against observed readings. Gaps are injected deterministically
    (portable PRNG, ~2% of slots) so the query provably finds exactly
    the dropped slots. At scale the expected grid is generated, never
    materialized — both sides stream through one hash join on
    (meter_id, slot)."""
    full = gen_meter_readings(spark)
    # deterministically drop ~2% of readings (salt 11)
    observed = full.withColumn(
        "slot", F.expr("CAST((unix_timestamp(reading_timestamp) - unix_timestamp(timestamp'2024-01-01 00:00:00')) div 900 AS INT)")
    ).filter(_u(11, F.col("meter_id"), F.col("slot")) >= 0.02)
    grid = spark.range(0, N_METERS * N_TICKS).select(
        (F.expr(f"id div {N_TICKS}") + 1).cast("int").alias("meter_id"),
        (F.col("id") % N_TICKS).cast("int").alias("slot"),
    )
    missing = grid.join(
        observed.select("meter_id", "slot"), ["meter_id", "slot"], "left_anti"
    )
    return missing.select(
        "meter_id",
        "slot",
        F.expr(
            "timestampadd(MINUTE, CAST(slot*15 AS INT), timestamp'2024-01-01 00:00:00')"
        ).alias("missing_timestamp"),
    )


from smart_meter_data_pipeline_spark.operators.meter_pipeline import _u_sql  # noqa: E402

register(
    "missing_readings",
    f"""WITH {_readings_cte()},
observed AS (
  SELECT meter_id,
         CAST((epoch(reading_timestamp)
               - epoch(TIMESTAMP '2024-01-01 00:00:00')) // 900 AS INT) AS slot
  FROM readings
  WHERE {_u_sql(11, "meter_id", "CAST((epoch(reading_timestamp) - epoch(TIMESTAMP '2024-01-01 00:00:00')) // 900 AS INT)")} >= 0.02
),
expected_grid AS (
  SELECT CAST(i // {N_TICKS} + 1 AS INT) AS meter_id,
         CAST(i % {N_TICKS} AS INT) AS slot
  FROM range(0, {N_METERS * N_TICKS}) t(i)
)
SELECT g.meter_id, g.slot,
       TIMESTAMP '2024-01-01 00:00:00' + to_minutes(CAST(g.slot * 15 AS BIGINT))
         AS missing_timestamp
FROM expected_grid g
ANTI JOIN observed o ON g.meter_id = o.meter_id AND g.slot = o.slot
""",
)(missing_readings)


def meter_quality_incidents(spark: SparkSession, sf_dir: str) -> DataFrame:
    """The partial-index query pattern (F2, 01_create_schema.sql:
    117-119): non-valid readings with meter context — in Spark the
    status filter pushes into the scan instead of using an index."""
    from smart_meter_data_pipeline_spark.operators.meter_pipeline import (
        gen_dim_meters,
    )

    r = gen_meter_readings(spark)
    dims = gen_dim_meters(spark)
    return (
        r.filter(F.col("status") != "V")
        .join(F.broadcast(dims.select("meter_id", "grid_zone_id", "gateway_idn")), "meter_id")
        .select(
            "reading_timestamp",
            "meter_id",
            "status",
            "grid_zone_id",
            "gateway_idn",
        )
    )


from smart_meter_data_pipeline_spark.operators.meter_pipeline import (  # noqa: E402
    _dim_meters_sql,
)

register(
    "meter_quality_incidents",
    f"""WITH {_readings_cte()},
dim_meters AS ({_dim_meters_sql()})
SELECT reading_timestamp, r.meter_id, status, grid_zone_id, gateway_idn
FROM readings r
JOIN dim_meters m ON r.meter_id = m.meter_id
WHERE status <> 'V'
""",
)(meter_quality_incidents)


def event_value_percentiles(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Exact interpolated percentiles (p50/p95/p99) of event value per
    type — the ordered-set aggregate family §2.9 notes the reference
    lacks. Spark's exact ``percentile`` and DuckDB's ``quantile_cont``
    share linear-interpolation semantics (verified bit-equal on this
    data); the approx variant for 100 TB is ``percentile_approx``
    (pytest-bounded against this exact answer)."""
    ev = load_table(spark, sf_dir, "events")
    p = F.expr("percentile(value, array(0.5, 0.95, 0.99))")
    return ev.groupBy("event_type").agg(
        F.round(p[0], 12).alias("p50"),
        F.round(p[1], 12).alias("p95"),
        F.round(p[2], 12).alias("p99"),
        F.count(F.lit(1)).alias("n_events"),
    )


register(
    "event_value_percentiles",
    """
SELECT event_type,
       round(quantile_cont(value, 0.5), 12) AS p50,
       round(quantile_cont(value, 0.95), 12) AS p95,
       round(quantile_cont(value, 0.99), 12) AS p99,
       COUNT(*) AS n_events
FROM events GROUP BY 1
""",
)(event_value_percentiles)


RETENTION_SPLIT = "2024-01-15"


def user_retention_sets(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Set operations (§2.9: absent from the reference): classify
    users by activity across the month's two halves — retained
    (INTERSECT), churned (EXCEPT), new (EXCEPT reversed) — stitched
    with UNION ALL. Each set op is a shuffle on user_id only (ids, not
    events, move)."""
    ev = load_table(spark, sf_dir, "events")
    first = ev.filter(F.col("ts") < RETENTION_SPLIT).select("user_id").distinct()
    second = ev.filter(F.col("ts") >= RETENTION_SPLIT).select("user_id").distinct()
    retained = first.intersect(second).select(
        "user_id", F.lit("retained").alias("cohort")
    )
    churned = first.exceptAll(second.select("user_id")).select(
        "user_id", F.lit("churned").alias("cohort")
    )
    new = second.exceptAll(first.select("user_id")).select(
        "user_id", F.lit("new").alias("cohort")
    )
    return retained.unionAll(churned).unionAll(new)


register(
    "user_retention_sets",
    f"""
WITH first_half AS (
  SELECT DISTINCT user_id FROM events WHERE ts < TIMESTAMP '{RETENTION_SPLIT}'
),
second_half AS (
  SELECT DISTINCT user_id FROM events WHERE ts >= TIMESTAMP '{RETENTION_SPLIT}'
)
SELECT user_id, 'retained' AS cohort
FROM (SELECT user_id FROM first_half INTERSECT SELECT user_id FROM second_half)
UNION ALL
SELECT user_id, 'churned' AS cohort
FROM (SELECT user_id FROM first_half EXCEPT SELECT user_id FROM second_half)
UNION ALL
SELECT user_id, 'new' AS cohort
FROM (SELECT user_id FROM second_half EXCEPT SELECT user_id FROM first_half)
""",
)(user_retention_sets)


# ---------------------------------------------------------------------------
# Banded range join: same-user event pairs within a time radius
# ---------------------------------------------------------------------------

RANGE_RADIUS_US = 300_000_000  # ±5 minutes, in microseconds
_BUCKET_US = RANGE_RADIUS_US  # bucket width == radius → match is in b−1..b+1


def events_range_pairs(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Range join (burst detection): pairs of same-user events at most
    5 minutes apart. The naive form is an inequality self-join —
    quadratic per user and un-plannable as a hash join. The scalable
    form banded here: bucket time by the radius, explode ONLY the left
    side to its 3 adjacent buckets, equi-join on (user, bucket), then
    filter the exact radius. Each qualifying pair meets exactly once
    (the right event owns one bucket), the join is a plain hash
    equi-join that AQE can size, and the explosion factor is a fixed
    3× on one side — independent of data volume and user skew."""
    ev = load_table(spark, sf_dir, "events").select(
        "user_id",
        "event_id",
        "event_type",
        F.unix_micros("ts").alias("us"),
    )
    b = F.floor(F.col("us") / F.lit(_BUCKET_US)).cast("bigint")
    left = ev.select(
        F.col("user_id").alias("l_user"),
        F.col("event_id").alias("event_a"),
        F.col("event_type").alias("type_a"),
        F.col("us").alias("us_a"),
        F.explode(F.array(b - 1, b, b + 1)).alias("jb"),
    )
    right = ev.select(
        F.col("user_id").alias("r_user"),
        F.col("event_id").alias("event_b"),
        F.col("event_type").alias("type_b"),
        F.col("us").alias("us_b"),
        b.alias("rb"),
    )
    return (
        left.join(
            right,
            (F.col("l_user") == F.col("r_user"))
            & (F.col("jb") == F.col("rb"))
            & (F.col("event_a") < F.col("event_b")),
        )
        .filter(F.abs(F.col("us_a") - F.col("us_b")) <= RANGE_RADIUS_US)
        .select(
            F.col("l_user").alias("user_id"),
            "event_a",
            "event_b",
            "type_a",
            "type_b",
            (
                F.abs(F.col("us_a") - F.col("us_b")).cast("double")
                / F.lit(1_000_000.0)
            ).alias("gap_seconds"),
        )
    )


register(
    "events_range_pairs",
    f"""
SELECT a.user_id, a.event_id AS event_a, b.event_id AS event_b,
       a.event_type AS type_a, b.event_type AS type_b,
       CAST(ABS(epoch_us(a.ts) - epoch_us(b.ts)) AS DOUBLE) / 1000000.0
         AS gap_seconds
FROM events a
JOIN events b
  ON a.user_id = b.user_id
 AND a.event_id < b.event_id
 AND ABS(epoch_us(a.ts) - epoch_us(b.ts)) <= {RANGE_RADIUS_US}
""",
)(events_range_pairs)


# ---------------------------------------------------------------------------
# JSON property extraction (semi-structured column → typed analytics)
# ---------------------------------------------------------------------------


def events_json_props(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Typed extraction from the semi-structured ``props`` JSON column
    (the one events field no other query touches), aggregated per
    event_type: the "sidecar attributes" pattern every event pipeline
    grows. ``get_json_object`` is a Catalyst expression (JVM-side,
    codegen) — the path extraction never leaves the scan stage, and
    only ``props`` plus the group keys are read (column pruning).

    The extracted ``k`` is integer so sums stay exact; the bucket
    breakdown proves the value survives a cast chain + modulo, not
    just a count."""
    ev = load_table(spark, sf_dir, "events")
    k = F.get_json_object("props", "$.k").cast("int")
    return (
        ev.select("event_type", k.alias("k"))
        .filter(F.col("k").isNotNull())
        .groupBy("event_type", (F.col("k") % 10).alias("k_bucket"))
        .agg(
            F.count(F.lit(1)).alias("n_events"),
            F.sum(F.col("k").cast("bigint")).alias("sum_k"),
            F.min("k").alias("min_k"),
            F.max("k").alias("max_k"),
        )
    )


register(
    "events_json_props",
    """
SELECT event_type,
       CAST(k AS INT) % 10 AS k_bucket,
       COUNT(*) AS n_events,
       CAST(SUM(CAST(k AS BIGINT)) AS BIGINT) AS sum_k,
       MIN(CAST(k AS INT)) AS min_k,
       MAX(CAST(k AS INT)) AS max_k
FROM (
  SELECT event_type, CAST(json_extract_string(props, '$.k') AS INT) AS k
  FROM events
)
WHERE k IS NOT NULL
GROUP BY 1, 2
""",
)(events_json_props)


# ---------------------------------------------------------------------------
# Sketch-based approximate aggregates (the 100 TB answer to DISTINCT)
# ---------------------------------------------------------------------------


def approx_sketch_check(spark: SparkSession, sf_dir: str) -> DataFrame:
    """HyperLogLog count-distinct and quantile sketches, with a
    property-style oracle. Exact COUNT(DISTINCT) needs a full shuffle
    of the key space — at 100 TB the sketch (fixed-size, map-side
    mergeable) is the only viable plan, so the engine must ship it.

    Sketch estimates are engine-specific, so the hash-checked output
    is the PROPERTY both engines must satisfy, not the estimate
    itself: per event_type, the exact distinct-user count plus
    booleans asserting each engine's own approx result lands within
    tolerance of its own exact result (±5% for HLL at rsd=0.01 —
    Spark's DEFAULT rsd 0.05 genuinely breaches 5% on 1500 distinct
    keys at sf0.1, caught by the scale-sanity sweep, so the sketch is
    sized explicitly; p50 sketch within the exact p40–p60 band). Both
    engines emitting ``true`` everywhere IS the cross-engine
    contract."""
    ev = load_table(spark, sf_dir, "events")
    per_type = ev.groupBy("event_type").agg(
        F.countDistinct("user_id").alias("n_users_exact"),
        F.approx_count_distinct("user_id", 0.01).alias("n_users_approx"),
        F.expr("approx_percentile(value, 0.5)").alias("p50_approx"),
        F.expr("percentile(value, 0.4)").alias("p40_exact"),
        F.expr("percentile(value, 0.6)").alias("p60_exact"),
    )
    return per_type.select(
        "event_type",
        "n_users_exact",
        (
            F.abs(F.col("n_users_approx") - F.col("n_users_exact"))
            <= F.col("n_users_exact") * 0.05
        ).alias("hll_within_5pct"),
        F.col("p50_approx").between(
            F.col("p40_exact"), F.col("p60_exact")
        ).alias("p50_within_band"),
    )


register(
    "approx_sketch_check",
    """
SELECT event_type,
       COUNT(DISTINCT user_id) AS n_users_exact,
       ABS(approx_count_distinct(user_id) - COUNT(DISTINCT user_id))
         <= COUNT(DISTINCT user_id) * 0.05 AS hll_within_5pct,
       approx_quantile(value, 0.5)
         BETWEEN quantile_cont(value, 0.4) AND quantile_cont(value, 0.6)
         AS p50_within_band
FROM events
GROUP BY 1
""",
)(approx_sketch_check)


# ---------------------------------------------------------------------------
# RANGE (time-interval) window frame — the value-based sibling of ROWS
# ---------------------------------------------------------------------------


def events_range_frame(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Trailing ONE-HOUR window per user — a RANGE frame over event
    time, not a ROWS count: the frame holds every event with
    ts ∈ [ts − 1h, ts], however many that is (``sliding_window_avg``
    is the fixed-4-rows sibling). Spark's rangeBetween needs a numeric
    order key, so the frame runs over epoch microseconds — exact, and
    identical to the oracle's ``RANGE BETWEEN INTERVAL 1 HOUR
    PRECEDING`` over the timestamp. Peers with equal keys are all
    included by RANGE semantics in both engines."""
    ev = load_table(spark, sf_dir, "events")
    us = F.unix_micros("ts")
    w = (
        Window.partitionBy("user_id")
        .orderBy(us)
        .rangeBetween(-3_600_000_000, 0)
    )
    return ev.select(
        "event_id",
        "user_id",
        "ts",
        F.count(F.lit(1)).over(w).alias("n_trailing_1h"),
        F.sum(F.col("value").cast("decimal(25,6)"))
        .over(w)
        .cast("double")
        .alias("sum_trailing_1h"),
    )


register(
    "events_range_frame",
    """
SELECT event_id, user_id, ts,
       COUNT(*) OVER w AS n_trailing_1h,
       CAST(SUM(CAST(value AS DECIMAL(25,6))) OVER w AS DOUBLE)
         AS sum_trailing_1h
FROM events
WINDOW w AS (PARTITION BY user_id ORDER BY ts
             RANGE BETWEEN INTERVAL 1 HOUR PRECEDING AND CURRENT ROW)
""",
)(events_range_frame)


def events_cube(spark: SparkSession, sf_dir: str) -> DataFrame:
    """CUBE (event_type, k_bucket): all 2² grouping combinations in
    one Expand + single shuffle — the cross-dimensional sibling of
    ``events_rollup``'s hierarchy, over a dimension extracted from the
    semi-structured props column."""
    ev = load_table(spark, sf_dir, "events")
    k_bucket = (
        F.get_json_object("props", "$.k").cast("int") % 10
    ).alias("k_bucket")
    return (
        ev.select("event_type", k_bucket, "value")
        .cube("event_type", "k_bucket")
        .agg(
            F.count(F.lit(1)).alias("n_events"),
            dsum("value", "total_value"),
            F.grouping_id().alias("grouping_level"),
        )
    )


register(
    "events_cube",
    """
SELECT event_type, k_bucket,
       COUNT(*) AS n_events,
       CAST(SUM(CAST(value AS DECIMAL(25,6))) AS DOUBLE) AS total_value,
       GROUPING(event_type) * 2 + GROUPING(k_bucket) AS grouping_level
FROM (
  SELECT event_type,
         CAST(json_extract_string(props, '$.k') AS INT) % 10 AS k_bucket,
         value
  FROM events
)
GROUP BY CUBE (event_type, k_bucket)
""",
)(events_cube)


# ---------------------------------------------------------------------------
# Gap fill + LOCF (TimescaleDB time_bucket_gapfill/locf twin)
# ---------------------------------------------------------------------------


def meter_gap_fill(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Regularize a sparse meter series back onto its 15-minute grid
    and forward-fill the cumulative counters (last-observation-carried-
    forward) — the ``time_bucket_gapfill`` + ``locf`` pair from the
    reference's TimescaleDB ecosystem, expressed as generate-grid →
    left join → ``last(ignorenulls)`` window. ~10% of readings are
    dropped by a portable hash so the oracle reproduces the identical
    gaps. Never-solar meters stay NULL through LOCF (no observation to
    carry), and leading gaps before a meter's first reading stay NULL —
    both semantics of the TimescaleDB pair."""
    from smart_meter_data_pipeline_spark.operators.meter_pipeline import (
        GEN_START,
    )

    readings = gen_meter_readings(spark)
    tick = F.expr(
        f"timestampdiff(MINUTE, timestamp'{GEN_START}', reading_timestamp)"
        " div 15"
    )
    sparse = (
        readings.withColumn("tick", tick)
        .filter(_u(6, F.col("meter_id"), F.col("tick")) >= 0.1)
        .select(
            "meter_id",
            "tick",
            "reading_consumption_milliwatts",
            "reading_production_milliwatts",
        )
    )
    grid = spark.range(0, N_METERS * N_TICKS).select(
        (F.expr(f"id div {N_TICKS}") + 1).cast("int").alias("meter_id"),
        (F.col("id") % N_TICKS).alias("tick"),
    )
    joined = grid.join(sparse, ["meter_id", "tick"], "left")
    w = (
        Window.partitionBy("meter_id")
        .orderBy("tick")
        .rowsBetween(Window.unboundedPreceding, 0)
    )
    return joined.select(
        "meter_id",
        F.expr(
            f"timestampadd(MINUTE, CAST(tick*15 AS INT), timestamp'{GEN_START}')"
        ).alias("reading_timestamp"),
        F.col("reading_consumption_milliwatts").isNotNull().alias("is_observed"),
        F.last("reading_consumption_milliwatts", ignorenulls=True)
        .over(w)
        .alias("cons_locf"),
        F.last("reading_production_milliwatts", ignorenulls=True)
        .over(w)
        .alias("prod_locf"),
    )


def _gap_fill_oracle() -> str:
    from smart_meter_data_pipeline_spark.operators.meter_pipeline import (
        GEN_START,
    )

    u6 = _u_sql(6, "meter_id", "tick")
    return f"""WITH {_readings_cte()},
ticked AS (
  SELECT meter_id, reading_consumption_milliwatts,
         reading_production_milliwatts,
         CAST(date_diff('minute', TIMESTAMP '{GEN_START}',
                        reading_timestamp) // 15 AS BIGINT) AS tick
  FROM readings
),
sparse AS (
  SELECT * FROM ticked WHERE {u6} >= 0.1
)
SELECT CAST(g.meter_id AS INT) AS meter_id,
       TIMESTAMP '{GEN_START}' + to_minutes(CAST(g.tick * 15 AS BIGINT))
         AS reading_timestamp,
       s.reading_consumption_milliwatts IS NOT NULL AS is_observed,
       last_value(s.reading_consumption_milliwatts IGNORE NULLS) OVER w
         AS cons_locf,
       last_value(s.reading_production_milliwatts IGNORE NULLS) OVER w
         AS prod_locf
FROM grid g
LEFT JOIN sparse s ON g.meter_id = s.meter_id AND g.tick = s.tick
WINDOW w AS (PARTITION BY g.meter_id ORDER BY g.tick
             ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW)
"""


register("meter_gap_fill", _gap_fill_oracle())(meter_gap_fill)


def meter_gap_interpolate(spark: SparkSession, sf_dir: str) -> DataFrame:
    """LINEAR interpolation across meter-series gaps — TimescaleDB's
    ``interpolate()`` next to :func:`meter_gap_fill`'s ``locf()``
    (the reference's hypertable ecosystem ships both; LOCF estimates
    a counter as flat, interpolation as linearly accruing — the VEE
    "E" step real AMI billing uses for in-day gaps). Same grid, same
    portable-hash gap pattern (salt 6, ~10% dropped) so the two
    estimators are directly comparable row-for-row.

    est = prev + ⌊(next − prev)·(tick − prev_tick) / (next_tick −
    prev_tick)⌋, all int64 (exact both engines; the counter delta is
    clamped non-negative so the floor division never sees a negative
    dividend — Spark div truncates, DuckDB // floors, identical only
    then). Edges keep interpolation semantics: a gap BEFORE the first
    or AFTER the last observation has only one anchor and stays NULL
    (LOCF fills the trailing case — that difference IS the semantic).

    Scale: two per-meter windows over the 15-min grid (bounded at
    96 ticks/day per meter), shuffled once on meter_id — no global
    window, no fact-scale sort."""
    from smart_meter_data_pipeline_spark.operators.meter_pipeline import (
        GEN_START,
        N_METERS,
        N_TICKS,
        _u,
    )

    readings = gen_meter_readings(spark)
    tick = F.expr(
        f"timestampdiff(MINUTE, timestamp'{GEN_START}', reading_timestamp)"
        " div 15"
    )
    sparse = (
        readings.withColumn("tick", tick)
        .filter(_u(6, F.col("meter_id"), F.col("tick")) >= 0.1)
        .select(
            "meter_id",
            "tick",
            "reading_consumption_milliwatts",
            "reading_production_milliwatts",
        )
    )
    grid = spark.range(0, N_METERS * N_TICKS).select(
        (F.expr(f"id div {N_TICKS}") + 1).cast("int").alias("meter_id"),
        (F.col("id") % N_TICKS).alias("tick"),
    )
    joined = grid.join(sparse, ["meter_id", "tick"], "left")
    w_prev = (
        Window.partitionBy("meter_id")
        .orderBy("tick")
        .rowsBetween(Window.unboundedPreceding, 0)
    )
    w_next = (
        Window.partitionBy("meter_id")
        .orderBy("tick")
        .rowsBetween(0, Window.unboundedFollowing)
    )
    cols = {}
    for name, src in (
        ("cons", "reading_consumption_milliwatts"),
        ("prod", "reading_production_milliwatts"),
    ):
        v = F.col(src).cast("bigint")
        cols[f"{name}_pv"] = F.last(v, ignorenulls=True).over(w_prev)
        cols[f"{name}_pt"] = F.last(
            F.when(v.isNotNull(), F.col("tick")), ignorenulls=True
        ).over(w_prev)
        cols[f"{name}_nv"] = F.first(v, ignorenulls=True).over(w_next)
        cols[f"{name}_nt"] = F.first(
            F.when(v.isNotNull(), F.col("tick")), ignorenulls=True
        ).over(w_next)
    staged = joined.select("*", *[c.alias(n) for n, c in cols.items()])

    def interp(name: str, src: str):
        return (
            F.when(F.col(src).isNotNull(), F.col(src).cast("bigint"))
            .when(
                F.col(f"{name}_pv").isNull()
                | F.col(f"{name}_nv").isNull(),
                F.lit(None).cast("bigint"),
            )
            .otherwise(
                F.expr(
                    f"{name}_pv + (greatest({name}_nv - {name}_pv, 0)"
                    f" * (tick - {name}_pt)) div ({name}_nt - {name}_pt)"
                )
            )
        )

    return staged.select(
        "meter_id",
        F.expr(
            f"timestampadd(MINUTE, CAST(tick*15 AS INT),"
            f" timestamp'{GEN_START}')"
        ).alias("reading_timestamp"),
        F.col("reading_consumption_milliwatts")
        .isNotNull()
        .alias("is_observed"),
        interp("cons", "reading_consumption_milliwatts").alias(
            "cons_interp"
        ),
        interp("prod", "reading_production_milliwatts").alias(
            "prod_interp"
        ),
    )


def _gap_interpolate_oracle() -> str:
    from smart_meter_data_pipeline_spark.operators.meter_pipeline import (
        GEN_START,
        N_METERS,
        N_TICKS,
        _u_sql,
    )

    u6 = _u_sql(6, "meter_id", "tick")

    def est(col: str) -> str:
        return f"""CASE
  WHEN s.{col} IS NOT NULL THEN CAST(s.{col} AS BIGINT)
  WHEN last_value(s.{col} IGNORE NULLS) OVER wp IS NULL
    OR first_value(s.{col} IGNORE NULLS) OVER wn IS NULL THEN NULL
  ELSE last_value(CAST(s.{col} AS BIGINT) IGNORE NULLS) OVER wp
     + CAST((greatest(first_value(CAST(s.{col} AS BIGINT) IGNORE NULLS)
                        OVER wn
                      - last_value(CAST(s.{col} AS BIGINT) IGNORE NULLS)
                        OVER wp, 0)
             * (g.tick - last_value(CASE WHEN s.{col} IS NOT NULL
                                   THEN g.tick END IGNORE NULLS) OVER wp))
            // (first_value(CASE WHEN s.{col} IS NOT NULL
                            THEN g.tick END IGNORE NULLS) OVER wn
                - last_value(CASE WHEN s.{col} IS NOT NULL
                             THEN g.tick END IGNORE NULLS) OVER wp)
            AS BIGINT)
END"""

    return f"""WITH {_readings_cte()},
ticked AS (
  SELECT meter_id, reading_consumption_milliwatts,
         reading_production_milliwatts,
         CAST(date_diff('minute', TIMESTAMP '{GEN_START}',
                        reading_timestamp) // 15 AS BIGINT) AS tick
  FROM readings
),
sparse AS (
  SELECT * FROM ticked WHERE {u6} >= 0.1
),
tick_grid AS (
  SELECT CAST(i // {N_TICKS} + 1 AS INT) AS meter_id,
         CAST(i % {N_TICKS} AS BIGINT) AS tick
  FROM (SELECT unnest(range(0, {N_METERS * N_TICKS})) AS i)
)
SELECT g.meter_id,
       TIMESTAMP '{GEN_START}' + to_minutes(CAST(g.tick * 15 AS BIGINT))
         AS reading_timestamp,
       s.reading_consumption_milliwatts IS NOT NULL AS is_observed,
       {est("reading_consumption_milliwatts")} AS cons_interp,
       {est("reading_production_milliwatts")} AS prod_interp
FROM tick_grid g
LEFT JOIN sparse s ON g.meter_id = s.meter_id AND g.tick = s.tick
WINDOW wp AS (PARTITION BY g.meter_id ORDER BY g.tick
              ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW),
       wn AS (PARTITION BY g.meter_id ORDER BY g.tick
              ROWS BETWEEN CURRENT ROW AND UNBOUNDED FOLLOWING)
"""


register("meter_gap_interpolate", _gap_interpolate_oracle())(
    meter_gap_interpolate
)


def events_ohlc_hourly(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Hourly OHLC downsample — the hypertable continuous-aggregate
    shape (TimescaleDB's first/last/min/max rollup the reference's
    stack advertises but never ships): per (hour, event_type), the
    opening and closing values by event time plus high/low/count.

    Open/close are deterministic argmin/argmax via min/max over a
    (ts, event_id, value) struct — event_id breaks same-microsecond
    ties identically in both engines, and the whole thing is one
    map-side-combinable aggregation (no window sort over the fact):
    shuffle volume is bounded by bucket×type cardinality, not rows, so
    the rollup runs at scan speed at 100 TB. Values are raw doubles
    (selected, never summed), so no decimal discipline is needed."""
    ev = load_table(spark, sf_dir, "events")
    edge = F.struct(F.col("ts"), F.col("event_id"), F.col("value"))
    return (
        ev.groupBy(
            F.date_trunc("hour", "ts").alias("bucket_hour"), "event_type"
        )
        .agg(
            F.min(edge).alias("o"),
            F.max(edge).alias("c"),
            F.max("value").alias("high_value"),
            F.min("value").alias("low_value"),
            F.count(F.lit(1)).alias("n_events"),
        )
        .select(
            "bucket_hour",
            "event_type",
            F.col("o.value").alias("open_value"),
            F.col("c.value").alias("close_value"),
            "high_value",
            "low_value",
            "n_events",
        )
    )


register(
    "events_ohlc_hourly",
    """
WITH g AS (
  SELECT date_trunc('hour', ts) AS bucket_hour, event_type,
         MIN(struct_pack(ts := ts, event_id := event_id, value := value)) AS o,
         MAX(struct_pack(ts := ts, event_id := event_id, value := value)) AS c,
         MAX(value) AS high_value,
         MIN(value) AS low_value,
         COUNT(*) AS n_events
  FROM events GROUP BY 1, 2
)
SELECT bucket_hour, event_type,
       o.value AS open_value, c.value AS close_value,
       high_value, low_value, n_events
FROM g
""",
)(events_ohlc_hourly)


ZSCORE_THRESHOLD = 3.0


def events_anomaly_zscore(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Per-type z-score anomaly flags — the streaming-quality screen
    run before readings enter a mart. Deterministic cross-engine via
    the quantized-grid idiom: values enter a DECIMAL(12,6) grid, the
    sufficient statistics (n, Σv, Σv²) are EXACT decimal sums, and
    only the final mean/std pass through double with a round-12
    re-quantize, so the z-score (round 9) and the threshold flag are
    bit-identical in both engines.

    Scale shape: stats are one map-side-combinable aggregation (3
    numbers per event_type); the flagging pass is a broadcast join of
    that tiny stats table back onto the scan — two scans, zero fact
    shuffles."""
    ev = with_v6(load_table(spark, sf_dir, "events"))
    return zscore_flags(ev, zscore_stats(ev))


def with_v6(ev: DataFrame) -> DataFrame:
    """Quantize ``value`` onto the shared DECIMAL(12,6) grid."""
    return ev.withColumn("v6", F.round("value", 6).cast("decimal(12,6)"))


def zscore_stats(ev6: DataFrame) -> DataFrame:
    """Per-type sufficient statistics (n, Σv, Σv²) — exact decimal
    sums, one map-side-combinable aggregation. Computed batch-side;
    the flagging pass (below) accepts batch OR streaming input."""
    return ev6.groupBy("event_type").agg(
        F.count(F.lit(1)).alias("n"),
        F.sum("v6").alias("sv"),
        F.sum(F.col("v6") * F.col("v6")).alias("sv2"),
    )


def zscore_flags(scored: DataFrame, stats: DataFrame) -> DataFrame:
    """Broadcast the tiny stats table onto ``scored`` (batch or
    streaming — stateless projections only) and flag. Clamps round-12
    cancellation residue to 0 and emits NULL z-scores for degenerate
    groups (constant values or n=1 → var 0): Spark's non-ANSI x/0.0 is
    NULL while DuckDB's is ±inf/NaN, so an unguarded divide breaks the
    cross-engine hash the first time the data serves up a constant
    event_type."""
    mean = F.round(F.col("sv").cast("double") / F.col("n"), 12)
    var = F.greatest(
        F.round(F.col("sv2").cast("double") / F.col("n") - mean * mean, 12),
        F.lit(0.0),
    )
    z = F.when(
        var > 0,
        F.round((F.col("v6").cast("double") - mean) / F.sqrt(var), 9),
    )
    enriched = scored.join(F.broadcast(stats), "event_type").select(
        "event_id",
        "event_type",
        "value",
        z.alias("z_score"),
    )
    return enriched.withColumn(
        "is_anomaly", F.abs("z_score") > ZSCORE_THRESHOLD
    )


# Shared by events_anomaly_zscore and its streaming twin
# stream_score_zscore (streaming/stream_queries.py) — deliberately the
# SAME semantics: the stream scores against batch-trained statistics,
# so a fully drained stream must hash-equal the batch query.
ZSCORE_ORACLE_SQL = f"""
WITH g AS (
  SELECT *, CAST(round(value, 6) AS DECIMAL(12,6)) AS v6 FROM events
),
stats AS (
  SELECT event_type, COUNT(*) AS n, SUM(v6) AS sv, SUM(v6 * v6) AS sv2
  FROM g GROUP BY 1
),
ms0 AS (
  SELECT event_type, n, round(CAST(sv AS DOUBLE) / n, 12) AS mean,
         round(CAST(sv2 AS DOUBLE) / n
               - round(CAST(sv AS DOUBLE) / n, 12)
                 * round(CAST(sv AS DOUBLE) / n, 12), 12) AS var0
  FROM stats
),
ms AS (SELECT event_type, n, mean, GREATEST(var0, 0) AS var FROM ms0),
z AS (
  SELECT g.event_id, g.event_type, g.value,
         CASE WHEN ms.var > 0
              THEN round((CAST(g.v6 AS DOUBLE) - ms.mean) / sqrt(ms.var), 9)
              ELSE NULL END AS z_score
  FROM g JOIN ms ON g.event_type = ms.event_type
)
SELECT event_id, event_type, value, z_score,
       abs(z_score) > {ZSCORE_THRESHOLD} AS is_anomaly
FROM z
"""

register("events_anomaly_zscore", ZSCORE_ORACLE_SQL)(events_anomaly_zscore)


def user_weekly_wow_change(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Week-over-week change per user: weekly value rollup, LAG to the
    prior week, guarded percent change (NULL when there is no prior
    week or it is zero) — the P10 guarded-pct pattern applied across a
    calendar window. One shuffle for the rollup; the LAG window reuses
    the user partitioning."""
    ev = load_table(spark, sf_dir, "events")
    weekly = ev.groupBy(
        F.date_trunc("week", "ts").alias("week_start"), "user_id"
    ).agg(
        F.count(F.lit(1)).alias("n_events"),
        dsum("value", "week_value"),
    )
    w = Window.partitionBy("user_id").orderBy("week_start")
    prev = F.lag("week_value").over(w)
    return weekly.select(
        "user_id",
        "week_start",
        "n_events",
        "week_value",
        prev.alias("prev_week_value"),
        F.when(
            prev.isNotNull() & (prev != 0),
            F.round((F.col("week_value") - prev) / prev, 9),
        ).alias("wow_pct"),
    )


register(
    "user_weekly_wow_change",
    """
WITH weekly AS (
  SELECT CAST(date_trunc('week', ts) AS TIMESTAMP) AS week_start, user_id,
         COUNT(*) AS n_events,
         CAST(SUM(CAST(value AS DECIMAL(25,6))) AS DOUBLE) AS week_value
  FROM events GROUP BY 1, 2
)
SELECT user_id, week_start, n_events, week_value,
       LAG(week_value) OVER w AS prev_week_value,
       CASE WHEN LAG(week_value) OVER w IS NOT NULL
             AND LAG(week_value) OVER w <> 0
            THEN round((week_value - LAG(week_value) OVER w)
                       / LAG(week_value) OVER w, 9)
            ELSE NULL END AS wow_pct
FROM weekly
WINDOW w AS (PARTITION BY user_id ORDER BY week_start)
""",
)(user_weekly_wow_change)


# ---------------------------------------------------------------------------
# Z-order (Morton) interleaved sort key — multi-dimensional data skipping
# ---------------------------------------------------------------------------

ZORDER_BITS = 16  # bits per dimension → 32-bit interleaved key


def zorder_key(b1, b2):
    """Morton-interleave two {ZORDER_BITS}-bit bucket columns into one
    bigint sort key: bit i of b1 lands at position 2i+1, bit i of b2
    at 2i. Pure integer div/mod/multiply — no bit intrinsics — so the
    identical expression runs in DuckDB. Sorting by this key gives a
    space-filling-curve layout: files become rectangles in (b1, b2)
    space and min/max footer stats prune on BOTH dimensions, where a
    single-column sort prunes on one."""
    terms = None
    for i in range(ZORDER_BITS):
        t = ((b1 / F.lit(2**i)).cast("bigint") % 2) * F.lit(
            2 ** (2 * i + 1)
        ) + ((b2 / F.lit(2**i)).cast("bigint") % 2) * F.lit(2 ** (2 * i))
        terms = t if terms is None else terms + t
    return terms.cast("bigint")


def _zorder_sql(b1: str, b2: str) -> str:
    parts = [
        f"((({b1}) // {2**i}) % 2) * {2 ** (2 * i + 1)}"
        f" + ((({b2}) // {2**i}) % 2) * {2 ** (2 * i)}"
        for i in range(ZORDER_BITS)
    ]
    return "CAST(" + " + ".join(parts) + " AS BIGINT)"


_ZMASK = 2**ZORDER_BITS - 1


def events_zorder_key(spark: SparkSession, sf_dir: str) -> DataFrame:
    """The z-key computation as a registered query: min/max-scale
    user_id and the event minute into the full {ZORDER_BITS}-bit range
    (raw values would leave one dimension's high bits constant and
    collapse the curve into a plain sort on the other), then
    Morton-interleave. Scaling is pure integer arithmetic —
    ((v − min)·(2^bits − 1)) // max(max − min, 1) — so the whole key is
    hash-checked: the curve is a data-layout contract, and a different
    key means a different file layout at 100 TB. The min/max pass is a
    1-row broadcast aggregate, the same stats-CTE shape as
    doc_bm25_mlt."""
    ev = load_table(spark, sf_dir, "events")
    minute = (F.unix_timestamp("ts") / 60).cast("bigint")
    base = ev.select("event_id", "user_id", minute.alias("minute"))
    stats = base.agg(
        F.min("user_id").alias("u_min"),
        F.max("user_id").alias("u_max"),
        F.min("minute").alias("t_min"),
        F.max("minute").alias("t_max"),
    )

    def scale(v, lo, hi):
        return ((v - F.col(lo)) * _ZMASK) / F.greatest(
            F.col(hi) - F.col(lo), F.lit(1)
        )

    keyed = base.crossJoin(F.broadcast(stats)).select(
        "event_id",
        "user_id",
        scale(F.col("user_id"), "u_min", "u_max")
        .cast("bigint")
        .alias("b_user"),
        scale(F.col("minute"), "t_min", "t_max")
        .cast("bigint")
        .alias("b_time"),
    )
    return keyed.select(
        "event_id",
        "user_id",
        "b_user",
        "b_time",
        zorder_key(F.col("b_user"), F.col("b_time")).alias("z_key"),
    )


_Z_SCALE_U = f"((user_id - u_min) * {_ZMASK}) // GREATEST(u_max - u_min, 1)"
_Z_SCALE_T = f"((minute - t_min) * {_ZMASK}) // GREATEST(t_max - t_min, 1)"

register(
    "events_zorder_key",
    f"""
WITH base AS (
  SELECT event_id, user_id,
         CAST(floor(epoch(ts)) AS BIGINT) // 60 AS minute
  FROM events
),
stats AS (
  SELECT MIN(user_id) AS u_min, MAX(user_id) AS u_max,
         MIN(minute) AS t_min, MAX(minute) AS t_max
  FROM base
),
keyed AS (
  SELECT event_id, user_id,
         {_Z_SCALE_U} AS b_user,
         {_Z_SCALE_T} AS b_time
  FROM base CROSS JOIN stats
)
SELECT event_id, user_id, b_user, b_time,
       {_zorder_sql("b_user", "b_time")} AS z_key
FROM keyed
""",
)(events_zorder_key)


def events_profile(spark: SparkSession, sf_dir: str) -> DataFrame:
    """One-pass data profile of the events table — the pre-flight
    audit a pipeline runs before trusting a new data drop: row count,
    and per key column null count / distinct count / min / max, plus
    the value range (round-6: per-row doubles compare exactly, and
    the extremes are single values, not sums). ONE aggregation, fully
    map-side-combinable except the exact distincts (each a single
    Expand pass — at 100 TB swap in approx_count_distinct, the
    sketch twin already proven by approx_sketch_check)."""
    ev = load_table(spark, sf_dir, "events")
    return ev.agg(
        F.count(F.lit(1)).alias("n_rows"),
        F.sum(F.col("user_id").isNull().cast("bigint")).alias("user_nulls"),
        F.countDistinct("user_id").alias("user_distinct"),
        F.min("user_id").alias("user_min"),
        F.max("user_id").alias("user_max"),
        F.sum(F.col("event_type").isNull().cast("bigint")).alias(
            "type_nulls"
        ),
        F.countDistinct("event_type").alias("type_distinct"),
        F.min("event_type").alias("type_min"),
        F.max("event_type").alias("type_max"),
        F.min("ts").alias("ts_min"),
        F.max("ts").alias("ts_max"),
        F.round(F.min("value"), 6).alias("value_min"),
        F.round(F.max("value"), 6).alias("value_max"),
    )


register(
    "events_profile",
    """
SELECT COUNT(*) AS n_rows,
       CAST(SUM(CASE WHEN user_id IS NULL THEN 1 ELSE 0 END) AS BIGINT)
         AS user_nulls,
       COUNT(DISTINCT user_id) AS user_distinct,
       MIN(user_id) AS user_min, MAX(user_id) AS user_max,
       CAST(SUM(CASE WHEN event_type IS NULL THEN 1 ELSE 0 END) AS BIGINT)
         AS type_nulls,
       COUNT(DISTINCT event_type) AS type_distinct,
       MIN(event_type) AS type_min, MAX(event_type) AS type_max,
       MIN(ts) AS ts_min, MAX(ts) AS ts_max,
       round(MIN(value), 6) AS value_min, round(MAX(value), 6) AS value_max
FROM events
""",
)(events_profile)


def events_funnel(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Ordered conversion funnel (view → click → purchase): per user,
    the first view, the first click strictly AFTER that view, and the
    first purchase strictly after that click — the order-sensitive
    funnel semantics (a purchase before the view chain does NOT
    count), plus the stage reached. Three aggregations and two joins,
    ALL keyed on user_id: one hash partitioning serves the entire
    plan, so at 100 TB the funnel costs one shuffle of the filtered
    event subsets and nothing else (the step tables are not broadcast
    — at scale they are user-count-sized, and the equi-join on the
    shared key stays co-partitioned)."""
    ev = load_table(spark, sf_dir, "events")

    def first_after(etype: str, prev: DataFrame, prev_ts: str, out: str):
        stepped = ev.filter(F.col("event_type") == etype).join(
            prev, "user_id"
        )
        return (
            stepped.filter(F.col("ts") > F.col(prev_ts))
            .groupBy("user_id")
            .agg(F.min("ts").alias(out))
        )

    views = (
        ev.filter(F.col("event_type") == "view")
        .groupBy("user_id")
        .agg(F.min("ts").alias("first_view"))
    )
    clicks = first_after("click", views, "first_view", "first_click")
    buys = first_after("purchase", clicks, "first_click", "first_purchase")
    stage = (
        F.when(F.col("first_purchase").isNotNull(), 3)
        .when(F.col("first_click").isNotNull(), 2)
        .otherwise(1)
    )
    return (
        views.join(clicks, "user_id", "left")
        .join(buys, "user_id", "left")
        .select(
            "user_id",
            "first_view",
            "first_click",
            "first_purchase",
            stage.alias("funnel_stage"),
        )
    )


register(
    "events_funnel",
    """
WITH v AS (
  SELECT user_id, MIN(ts) AS first_view
  FROM events WHERE event_type = 'view' GROUP BY 1
),
c AS (
  SELECT e.user_id, MIN(e.ts) AS first_click
  FROM events e JOIN v ON e.user_id = v.user_id
  WHERE e.event_type = 'click' AND e.ts > v.first_view
  GROUP BY 1
),
p AS (
  SELECT e.user_id, MIN(e.ts) AS first_purchase
  FROM events e JOIN c ON e.user_id = c.user_id
  WHERE e.event_type = 'purchase' AND e.ts > c.first_click
  GROUP BY 1
)
SELECT v.user_id, v.first_view, c.first_click, p.first_purchase,
       CASE WHEN p.first_purchase IS NOT NULL THEN 3
            WHEN c.first_click IS NOT NULL THEN 2
            ELSE 1 END AS funnel_stage
FROM v
LEFT JOIN c ON v.user_id = c.user_id
LEFT JOIN p ON v.user_id = p.user_id
""",
)(events_funnel)


RETENTION_WEEKS = 4


def events_cohort_retention(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Cohort retention matrix: users grouped by first-activity week,
    with distinct active users at week offsets 0..{RETENTION_WEEKS - 1}
    as columns — the standard growth-analytics triangle. Two
    aggregations on user_id (first-week, distinct activity) that share
    one partitioning, then a conditional-count pivot per cohort (one
    shuffle keyed on cohort_week, cohort-count-sized output)."""
    ev = load_table(spark, sf_dir, "events")
    weekly = (
        ev.select(
            "user_id", F.date_trunc("week", "ts").cast("date").alias("week")
        )
        .distinct()
    )
    first = weekly.groupBy("user_id").agg(
        F.min("week").alias("cohort_week")
    )
    offs = weekly.join(first, "user_id").select(
        "user_id",
        "cohort_week",
        (F.datediff("week", "cohort_week") / 7).cast("int").alias("off"),
    )
    aggs = [
        F.countDistinct(
            F.when(F.col("off") == k, F.col("user_id"))
        ).alias(f"w{k}")
        for k in range(RETENTION_WEEKS)
    ]
    return offs.groupBy("cohort_week").agg(*aggs)


_RET_COLS = ",\n       ".join(
    f"COUNT(DISTINCT CASE WHEN off = {k} THEN user_id END) AS w{k}"
    for k in range(RETENTION_WEEKS)
)

register(
    "events_cohort_retention",
    f"""
WITH weekly AS (
  SELECT DISTINCT user_id, CAST(date_trunc('week', ts) AS DATE) AS week
  FROM events
),
first AS (
  SELECT user_id, MIN(week) AS cohort_week FROM weekly GROUP BY 1
),
offs AS (
  SELECT w.user_id, f.cohort_week,
         CAST((week - cohort_week) // 7 AS INT) AS off
  FROM weekly w JOIN first f ON w.user_id = f.user_id
)
SELECT cohort_week,
       {_RET_COLS}
FROM offs GROUP BY 1
""",
)(events_cohort_retention)


SCD2_RATE = 0.25
SCD2_SALT = 47
SCD2_EPOCH = "2024-01-01 00:00:00"
SCD2_EFFECTIVE = "2024-02-01 00:00:00"


def dim_scd2_history(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Slowly-changing-dimension type 2 merge — the warehouse history
    pattern the reference's static dims lack: given the current
    customer dim and a change set (deterministic: customers whose
    portable hash u(c_custkey) < {SCD2_RATE} move to segment
    '<old>_V2' effective {SCD2_EFFECTIVE}), emit the full history —
    unchanged rows stay current, changed customers get their old row
    CLOSED (valid_to = effective date, is_current = false) plus a new
    OPEN row. The change set here is a scan-time predicate, so the
    whole merge is three filtered projections + a union — zero
    shuffles; with an EXTERNAL change table the same three legs become
    anti/semi/inner equi-joins on c_custkey, co-partitioned with the
    dim, still broadcast-free."""
    cust = load_table(spark, sf_dir, "customer").select(
        "c_custkey", "c_mktsegment"
    )
    changed = F.col("u") < SCD2_RATE
    marked = cust.withColumn(
        "u", _u(SCD2_SALT, F.col("c_custkey"), F.lit(0))
    )
    epoch = F.lit(SCD2_EPOCH).cast("timestamp")
    eff = F.lit(SCD2_EFFECTIVE).cast("timestamp")
    null_ts = F.lit(None).cast("timestamp")
    current_unchanged = marked.filter(~changed).select(
        "c_custkey",
        F.col("c_mktsegment").alias("segment"),
        epoch.alias("valid_from"),
        null_ts.alias("valid_to"),
        F.lit(True).alias("is_current"),
    )
    closed = marked.filter(changed).select(
        "c_custkey",
        F.col("c_mktsegment").alias("segment"),
        epoch.alias("valid_from"),
        eff.alias("valid_to"),
        F.lit(False).alias("is_current"),
    )
    opened = marked.filter(changed).select(
        "c_custkey",
        F.concat("c_mktsegment", F.lit("_V2")).alias("segment"),
        eff.alias("valid_from"),
        null_ts.alias("valid_to"),
        F.lit(True).alias("is_current"),
    )
    return current_unchanged.unionByName(closed).unionByName(opened)


register(
    "dim_scd2_history",
    f"""
WITH marked AS (
  SELECT c_custkey, c_mktsegment,
         {{u_expr}} AS u
  FROM customer
)
SELECT c_custkey, c_mktsegment AS segment,
       TIMESTAMP '{SCD2_EPOCH}' AS valid_from,
       CAST(NULL AS TIMESTAMP) AS valid_to,
       TRUE AS is_current
FROM marked WHERE u >= {SCD2_RATE}
UNION ALL
SELECT c_custkey, c_mktsegment,
       TIMESTAMP '{SCD2_EPOCH}', TIMESTAMP '{SCD2_EFFECTIVE}', FALSE
FROM marked WHERE u < {SCD2_RATE}
UNION ALL
SELECT c_custkey, c_mktsegment || '_V2',
       TIMESTAMP '{SCD2_EFFECTIVE}', CAST(NULL AS TIMESTAMP), TRUE
FROM marked WHERE u < {SCD2_RATE}
""".format(u_expr=_u_sql(SCD2_SALT, "c_custkey", "0")),
)(dim_scd2_history)


def user_value_rank_bands(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Global rank analytics over the per-user value rollup: NTILE
    quartile band, PERCENT_RANK and CUME_DIST — the W-family members
    (rank bands for tiering, percentile position for scoring) the other
    window queries don't exercise.

    Scale note (rebuilt round 10): NTILE is a global CONSTRUCT but no
    longer a global WINDOW — the row number comes from the
    range-partitioned two-pass prefix sum
    (:func:`common.distributed_row_number`, the orders_rfm_segments
    machinery), and NTILE / PERCENT_RANK / CUME_DIST are closed forms
    of (row_number, n): exact engine NTILE semantics via
    :func:`common.ntile_sql`, ``(r−1)/(n−1)`` and ``r/n`` for the
    rank fractions (the ordering is TOTAL — user_id tiebreak — so
    rank == row_number and every engine agrees). Zero Exchange
    SinglePartition in the plan at 10^9 users; contract-pinned."""
    from smart_meter_data_pipeline_spark.operators.common import (
        distributed_row_number,
        ntile_sql,
    )

    ev = load_table(spark, sf_dir, "events")
    per_user = ev.groupBy("user_id").agg(dsum("value", "total_value"))
    n = per_user.count()  # bounded scalar over the user rollup
    ranked = distributed_row_number(
        per_user,
        [F.col("total_value").desc(), F.col("user_id")],
        "r",
    )
    return ranked.select(
        "user_id",
        "total_value",
        F.expr(ntile_sql("r", n, 4)).alias("value_quartile"),
        F.round(
            F.expr(
                f"CASE WHEN {n} > 1 THEN CAST(r - 1 AS DOUBLE)"
                f" / CAST({n} - 1 AS DOUBLE) ELSE 0.0 END"
            ),
            9,
        ).alias("pct_rank"),
        F.round(
            F.expr(f"CAST(r AS DOUBLE) / CAST({n} AS DOUBLE)"), 9
        ).alias("cume_dist"),
    )


register(
    "user_value_rank_bands",
    """
WITH per_user AS (
  SELECT user_id,
         CAST(SUM(CAST(value AS DECIMAL(25,6))) AS DOUBLE) AS total_value
  FROM events GROUP BY 1
)
SELECT user_id, total_value,
       CAST(NTILE(4) OVER w AS INT) AS value_quartile,
       round(PERCENT_RANK() OVER w, 9) AS pct_rank,
       round(CUME_DIST() OVER w, 9) AS cume_dist
FROM per_user
WINDOW w AS (ORDER BY total_value DESC, user_id)
""",
)(user_value_rank_bands)


def referential_integrity_audit(spark: SparkSession, sf_dir: str) -> DataFrame:
    """dbt ``relationships``-test parity at warehouse scale (the
    reference's schema.yml relationship tests → one audit table): for
    every FK edge, the child row count and the count of orphans (child
    keys with no parent). All three lineitem edges ride ONE fact scan
    (chained parent-key left joins — part/supplier broadcast, orders
    the keyed fact→fact shuffle — then one aggregate unpivoted to
    per-edge rows), so the audit reads each child table exactly once,
    the plan a 100 TB integrity sweep needs. NULL child keys are not
    orphans (SQL FK semantics: NULL references nothing and passes)."""
    tables = {
        t: load_table(spark, sf_dir, t)
        for t in (
            "customer", "orders", "lineitem", "part",
            "supplier", "nation", "events",
        )
    }

    def keys(parent: str, pk: str, alias: str, broadcastable: bool = True):
        p = tables[parent].select(F.col(pk).alias(alias)).distinct()
        return F.broadcast(p) if broadcastable else p

    def orphan_count(ck: str, pk_alias: str, name: str):
        return F.count(
            F.when(F.col(ck).isNotNull() & F.col(pk_alias).isNull(), 1)
        ).alias(name)

    # All three lineitem edges audited in ONE fact scan: chain the
    # parent-key joins (orders by key — the fact→fact shuffle; part and
    # supplier broadcast), then count each orphan predicate in a single
    # aggregate and unpivot to the per-edge rows.
    li = (
        tables["lineitem"]
        .select("l_orderkey", "l_partkey", "l_suppkey")
        .join(keys("orders", "o_orderkey", "__ok", broadcastable=False),
              F.col("l_orderkey") == F.col("__ok"), "left")
        .join(keys("part", "p_partkey", "__pk"),
              F.col("l_partkey") == F.col("__pk"), "left")
        .join(keys("supplier", "s_suppkey", "__sk"),
              F.col("l_suppkey") == F.col("__sk"), "left")
        .agg(
            F.count(F.lit(1)).alias("n"),
            orphan_count("l_orderkey", "__ok", "orph_orders"),
            orphan_count("l_partkey", "__pk", "orph_part"),
            orphan_count("l_suppkey", "__sk", "orph_supp"),
        )
    )
    li_rows = li.select(
        F.explode(
            F.array(
                F.struct(
                    F.lit("lineitem.l_orderkey->orders").alias("relationship"),
                    F.col("n").alias("n_child_rows"),
                    F.col("orph_orders").alias("n_orphans"),
                ),
                F.struct(
                    F.lit("lineitem.l_partkey->part").alias("relationship"),
                    F.col("n").alias("n_child_rows"),
                    F.col("orph_part").alias("n_orphans"),
                ),
                F.struct(
                    F.lit("lineitem.l_suppkey->supplier").alias("relationship"),
                    F.col("n").alias("n_child_rows"),
                    F.col("orph_supp").alias("n_orphans"),
                ),
            )
        ).alias("e")
    ).select("e.*")

    def single_edge(name: str, child: str, ck: str, parent: str, pk: str):
        return (
            tables[child]
            .select(F.col(ck).alias("__ck"))
            .join(keys(parent, pk, "__pp"),
                  F.col("__ck") == F.col("__pp"), "left")
            .agg(
                F.lit(name).alias("relationship"),
                F.count(F.lit(1)).alias("n_child_rows"),
                orphan_count("__ck", "__pp", "n_orphans"),
            )
        )

    return (
        li_rows.unionByName(
            single_edge("orders.o_custkey->customer", "orders",
                        "o_custkey", "customer", "c_custkey")
        )
        .unionByName(
            single_edge("customer.c_nationkey->nation", "customer",
                        "c_nationkey", "nation", "n_nationkey")
        )
        .unionByName(
            single_edge("events.user_id->customer", "events",
                        "user_id", "customer", "c_custkey")
        )
    )


_RI_EDGE_SQL = """
SELECT '{name}' AS relationship,
       COUNT(*) AS n_child_rows,
       COUNT(CASE WHEN c.{ck} IS NOT NULL AND p.{pk} IS NULL
                  THEN 1 END) AS n_orphans
FROM {child} c
LEFT JOIN (SELECT DISTINCT {pk} FROM {parent}) p ON c.{ck} = p.{pk}
"""

register(
    "referential_integrity_audit",
    "\nUNION ALL\n".join(
        _RI_EDGE_SQL.format(name=n, child=c, ck=ck, parent=p, pk=pk)
        for (n, c, ck, p, pk) in [
            ("orders.o_custkey->customer", "orders", "o_custkey",
             "customer", "c_custkey"),
            ("lineitem.l_orderkey->orders", "lineitem", "l_orderkey",
             "orders", "o_orderkey"),
            ("lineitem.l_partkey->part", "lineitem", "l_partkey",
             "part", "p_partkey"),
            ("lineitem.l_suppkey->supplier", "lineitem", "l_suppkey",
             "supplier", "s_suppkey"),
            ("customer.c_nationkey->nation", "customer", "c_nationkey",
             "nation", "n_nationkey"),
            ("events.user_id->customer", "events", "user_id",
             "customer", "c_custkey"),
        ]
    ),
)(referential_integrity_audit)


# ---------------------------------------------------------------------------
# Mergeable fixed-bin histogram quantiles — the 100 TB quantile path.
# ---------------------------------------------------------------------------

HIST_BINS = 256
HIST_QS = ("0.5", "0.9", "0.99")  # shared decimal literals (see verify
# doc: the SAME decimal string must appear in both engines, or the two
# parsers can disagree in the last mantissa bit).


def event_value_hist_quantiles(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Histogram-sketch quantiles of event value — the mergeable
    companion to ``event_value_percentiles``. Exact percentiles need
    the full value multiset per group (a sort-based aggregate that
    cannot partially combine); the fixed-bin histogram is a
    ≤{HIST_BINS}-cell sketch that merges associatively, so at 100 TB
    the plan is two map-side-combinable scans (a 1-row min/max/count
    agg broadcast back, then a bin-count agg whose shuffle is bounded
    by {HIST_BINS} rows per mapper) and a {HIST_BINS}-row cumulative
    pass — no sort of the fact table anywhere. The estimate is the
    upper edge of the first bin whose cumulative count reaches
    ceil(p·n): a one-sided bound off by at most one bin width
    (pytest-checked against the exact percentile).

    Determinism: bin index and edges are the same `+ - * /` double
    expression string in both engines (IEEE per-row ops, no
    transcendentals); counts are int64; the vmax row is clamped into
    the last bin identically via LEAST."""
    ev = load_table(spark, sf_dir, "events")
    stats = ev.agg(
        F.min("value").alias("vmin"),
        F.max("value").alias("vmax"),
        F.count(F.lit(1)).alias("n_total"),
    )
    binned = ev.crossJoin(F.broadcast(stats)).select(
        F.when(
            F.col("vmax") > F.col("vmin"),
            F.least(
                F.floor(
                    (F.col("value") - F.col("vmin"))
                    / (F.col("vmax") - F.col("vmin"))
                    * HIST_BINS
                ).cast("bigint"),
                F.lit(HIST_BINS - 1).cast("bigint"),
            ),
        )
        .otherwise(F.lit(0).cast("bigint"))
        .alias("bin")
    )
    hist = binned.groupBy("bin").agg(F.count(F.lit(1)).alias("cnt"))
    cum = hist.select(
        "bin", F.sum("cnt").over(Window.orderBy("bin")).alias("cum")
    )
    qs = stats.select(
        F.explode(
            F.array(*[F.expr(f"CAST({q} AS DOUBLE)") for q in HIST_QS])
        ).alias("p"),
        "vmin",
        "vmax",
        "n_total",
    )
    return (
        cum.crossJoin(F.broadcast(qs))
        .groupBy("p", "vmin", "vmax", "n_total")
        .agg(
            F.min(
                F.when(
                    F.col("cum") >= F.ceil(F.col("p") * F.col("n_total")),
                    F.col("bin"),
                )
            ).alias("bin")
        )
        .select(
            "p",
            "bin",
            (
                F.col("vmin")
                + (F.col("bin") + 1)
                * (F.col("vmax") - F.col("vmin"))
                / F.lit(HIST_BINS)
            ).alias("est_value"),
            "n_total",
        )
    )


register(
    "event_value_hist_quantiles",
    f"""
WITH stats AS (
  SELECT min(value) AS vmin, max(value) AS vmax, COUNT(*) AS n_total
  FROM events
),
binned AS (
  SELECT CASE WHEN vmax > vmin
              THEN LEAST(CAST(floor((value - vmin) / (vmax - vmin)
                                    * {HIST_BINS}) AS BIGINT),
                         CAST({HIST_BINS - 1} AS BIGINT))
              ELSE CAST(0 AS BIGINT) END AS bin
  FROM events CROSS JOIN stats
),
hist AS (SELECT bin, COUNT(*) AS cnt FROM binned GROUP BY 1),
cum AS (SELECT bin, SUM(cnt) OVER (ORDER BY bin) AS cum FROM hist),
qs AS (
  SELECT CAST(unnest([{", ".join(HIST_QS)}]) AS DOUBLE) AS p,
         vmin, vmax, n_total
  FROM stats
),
sel AS (
  SELECT p, vmin, vmax, n_total,
         MIN(CASE WHEN cum >= ceil(p * n_total) THEN bin END) AS bin
  FROM cum CROSS JOIN qs
  GROUP BY 1, 2, 3, 4
)
SELECT p, bin,
       vmin + (bin + 1) * (vmax - vmin) / {HIST_BINS} AS est_value,
       n_total
FROM sel
""",
)(event_value_hist_quantiles)


def events_seasonal_anomaly(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Seasonal-baseline anomaly screen: z-scores against the
    (event_type, hour-of-day) baseline instead of the global per-type
    one — the screen that stops flagging every evening peak as an
    anomaly (meter-load and user-activity data are strongly diurnal;
    reference parity: the hourly grid mart's date_trunc('hour')
    bucketing, fact_grid_load_hourly.sql, turned into a baseline key).

    Same quantized-grid + guarded-divide discipline as
    ``events_anomaly_zscore``; the stats table grows to
    |event_type|×24 rows — still broadcast-trivially-small at any
    corpus scale, so the plan stays two scans with zero fact
    shuffles."""
    ev = with_v6(load_table(spark, sf_dir, "events")).withColumn(
        "hod", F.hour("ts").cast("int")
    )
    stats = ev.groupBy("event_type", "hod").agg(
        F.count(F.lit(1)).alias("n"),
        F.sum("v6").alias("sv"),
        F.sum(F.col("v6") * F.col("v6")).alias("sv2"),
    )
    mean = F.round(F.col("sv").cast("double") / F.col("n"), 12)
    var = F.greatest(
        F.round(F.col("sv2").cast("double") / F.col("n") - mean * mean, 12),
        F.lit(0.0),
    )
    z = F.when(
        var > 0,
        F.round((F.col("v6").cast("double") - mean) / F.sqrt(var), 9),
    )
    return (
        ev.join(F.broadcast(stats), ["event_type", "hod"])
        .select(
            "event_id",
            "event_type",
            "hod",
            "value",
            z.alias("z_score"),
        )
        .withColumn("is_anomaly", F.abs("z_score") > ZSCORE_THRESHOLD)
    )


register(
    "events_seasonal_anomaly",
    f"""
WITH g AS (
  SELECT *, CAST(round(value, 6) AS DECIMAL(12,6)) AS v6,
         CAST(hour(ts) AS INT) AS hod
  FROM events
),
stats AS (
  SELECT event_type, hod, COUNT(*) AS n,
         SUM(v6) AS sv, SUM(v6 * v6) AS sv2
  FROM g GROUP BY 1, 2
),
ms0 AS (
  SELECT event_type, hod, n, round(CAST(sv AS DOUBLE) / n, 12) AS mean,
         round(CAST(sv2 AS DOUBLE) / n
               - round(CAST(sv AS DOUBLE) / n, 12)
                 * round(CAST(sv AS DOUBLE) / n, 12), 12) AS var0
  FROM stats
),
ms AS (SELECT event_type, hod, n, mean, GREATEST(var0, 0) AS var FROM ms0),
z AS (
  SELECT g.event_id, g.event_type, g.hod, g.value,
         CASE WHEN ms.var > 0
              THEN round((CAST(g.v6 AS DOUBLE) - ms.mean) / sqrt(ms.var), 9)
              ELSE NULL END AS z_score
  FROM g JOIN ms ON g.event_type = ms.event_type AND g.hod = ms.hod
)
SELECT event_id, event_type, hod, value, z_score,
       abs(z_score) > {ZSCORE_THRESHOLD} AS is_anomaly
FROM z
""",
)(events_seasonal_anomaly)


def events_type_transitions(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Per-user event-type transition matrix (first-order Markov): for
    each (prev_type → type) edge, the count and the conditional
    probability P(type | prev_type) — the sequence-model summary that
    feeds session analysis and synthetic-trace generation.

    Scale shape: ONE shuffle partitions by user for the LAG window
    (ordering is total within user via (ts, event_id)); the edge
    rollup combines map-side into ≤|types|² rows, and the conditional
    denominator is a window SUM over that tiny matrix — nothing
    corpus-sized after the first exchange. Probability is int/int
    division rounded at 9, identical cross-engine."""
    ev = load_table(spark, sf_dir, "events")
    w = Window.partitionBy("user_id").orderBy("ts", "event_id")
    edges = (
        ev.withColumn("prev_type", F.lag("event_type").over(w))
        .filter(F.col("prev_type").isNotNull())
        .groupBy("prev_type", "event_type")
        .agg(F.count(F.lit(1)).alias("n_transitions"))
    )
    tot = Window.partitionBy("prev_type")
    return edges.select(
        "prev_type",
        "event_type",
        "n_transitions",
        F.round(
            F.col("n_transitions").cast("double")
            / F.sum("n_transitions").over(tot).cast("double"),
            9,
        ).alias("prob"),
    )


register(
    "events_type_transitions",
    """
WITH seq AS (
  SELECT user_id, event_type,
         LAG(event_type) OVER (
           PARTITION BY user_id ORDER BY ts, event_id) AS prev_type
  FROM events
),
edges AS (
  SELECT prev_type, event_type, COUNT(*) AS n_transitions
  FROM seq WHERE prev_type IS NOT NULL
  GROUP BY 1, 2
)
SELECT prev_type, event_type, n_transitions,
       round(CAST(n_transitions AS DOUBLE)
             / CAST(SUM(n_transitions) OVER (PARTITION BY prev_type)
                    AS DOUBLE), 9) AS prob
FROM edges
""",
)(events_type_transitions)


MARKOV_ROUNDS = 6
_MICRO = 1_000_000


def events_markov_stationary(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Stationary distribution of the first-order event-type Markov
    chain (the convergence companion to events_type_transitions):
    row-normalize the transition matrix in integer micro-units, then
    run {MARKOV_ROUNDS} power-iteration steps from the uniform vector
    — v'_j = (Σ_i v_i·p_micro(i→j)) div 1e6 — and report each type's
    stationary share next to its empirical share, the standard check
    that a sequence model's long-run behavior matches the observed
    mix.

    Scale shape: the ONLY data-sized work is the per-user LAG window
    (one shuffle keyed by user, shared contract with
    events_type_transitions) and the |types|² rollup; the matrix is
    bounded by the type vocabulary — independent of corpus size — so
    collecting it and iterating driver-side is the scale-correct
    plan (same class as the scalar-stats collects elsewhere). All
    arithmetic int64 floor-division, bit-identical cross-engine.

    Reference parity: greenfield beyond the reference surface
    (sequence-model summaries family)."""
    ev = load_table(spark, sf_dir, "events")
    w = Window.partitionBy("user_id").orderBy("ts", "event_id")
    trans = (
        ev.withColumn("prev_type", F.lag("event_type").over(w))
        .filter(F.col("prev_type").isNotNull())
        .groupBy("prev_type", "event_type")
        .agg(F.count(F.lit(1)).alias("n"))
    )
    tot = Window.partitionBy("prev_type")
    p_rows = (
        trans.withColumn("tot_n", F.sum("n").over(tot))
        .select(
            "prev_type",
            "event_type",
            F.expr(f"(n * {_MICRO}) div tot_n").alias("p_micro"),
        )
        .collect()
    )
    emp = (
        ev.groupBy("event_type")
        .agg(F.count(F.lit(1)).alias("cnt"))
        .withColumn("total", F.sum("cnt").over(Window.partitionBy()))
        .select(
            "event_type",
            F.expr(f"(cnt * {_MICRO}) div total").alias("empirical_micro"),
        )
    )
    types = sorted(r["event_type"] for r in emp.select("event_type").collect())
    p = {(r["prev_type"], r["event_type"]): r["p_micro"] for r in p_rows}
    v = {t: _MICRO // len(types) for t in types}
    for _ in range(MARKOV_ROUNDS):
        v = {
            j: sum(v[i] * p.get((i, j), 0) for i in types) // _MICRO
            for j in types
        }
    stat = spark.createDataFrame(
        [(t, v[t]) for t in types], ["event_type", "stationary_micro"]
    )
    return emp.join(stat, "event_type").select(
        "event_type",
        F.col("stationary_micro").cast("bigint").alias("stationary_micro"),
        F.col("empirical_micro").cast("bigint").alias("empirical_micro"),
    )


def _markov_oracle(rounds: int = MARKOV_ROUNDS) -> str:
    """Unrolled power-iteration CTEs; the per-step correlated subquery
    runs over the ≤|types|² matrix only. Every integer division is
    CAST(... AS BIGINT)-wrapped (DuckDB // promotes through DOUBLE;
    intermediates stay < 2^53: Σ v·p ≤ |types|·1e6·1e6 ≈ 5e12)."""
    parts = []
    for i in range(1, rounds + 1):
        parts.append(
            f"""
v{i} AS (
  SELECT ty.t,
         CAST(COALESCE((SELECT SUM(v.s * p.p_micro)
                        FROM p JOIN v{i - 1} v ON v.t = p.prev_type
                        WHERE p.event_type = ty.t), 0)
              // {_MICRO} AS BIGINT) AS s
  FROM types ty
)"""
        )
    body = ",".join(parts)
    return f"""
WITH seq AS (
  SELECT user_id, event_type,
         LAG(event_type) OVER (
           PARTITION BY user_id ORDER BY ts, event_id) AS prev_type
  FROM events
),
tr AS (
  SELECT prev_type, event_type, COUNT(*) AS n
  FROM seq WHERE prev_type IS NOT NULL
  GROUP BY 1, 2
),
p AS (
  SELECT prev_type, event_type,
         CAST((n * {_MICRO})
              // SUM(n) OVER (PARTITION BY prev_type) AS BIGINT)
           AS p_micro
  FROM tr
),
types AS (SELECT DISTINCT event_type AS t FROM events),
nt AS (SELECT COUNT(*) AS n FROM types),
v0 AS (SELECT t, CAST({_MICRO} // nt.n AS BIGINT) AS s FROM types, nt),{body},
emp AS (
  SELECT event_type, COUNT(*) AS cnt FROM events GROUP BY 1
),
tot AS (SELECT SUM(cnt) AS total FROM emp)
SELECT e.event_type,
       v.s AS stationary_micro,
       CAST((e.cnt * {_MICRO}) // t.total AS BIGINT) AS empirical_micro
FROM emp e CROSS JOIN tot t JOIN v{rounds} v ON v.t = e.event_type
"""


register("events_markov_stationary", _markov_oracle())(events_markov_stationary)


DRIFT_SPLIT = "2024-01-16 00:00:00"  # events span Jan 1-30; mid-month
# split gives two comparable windows (shared literal in both engines).


def events_drift_report(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Distribution-drift monitor: the event_type mix of the SECOND
    half of the month vs the FIRST, per type — share before, share
    after, the absolute share delta, and each type's contribution to
    total-variation distance (TV = ½·Σ|p−q|, reported per type as the
    |p−q| term so the audit stays row-per-type; the consumer sums).
    TV instead of PSI/KL deliberately: the information-theoretic
    scores need ln(), which is not cross-engine exact (see verify
    notes), while TV is pure rational arithmetic and carries the same
    alerting signal.

    Scale shape: one fact scan split by a pushed-down timestamp
    predicate into a (type × side) count — map-side combinable,
    |types|·2 shuffle rows — then all ratio math happens on the tiny
    aggregate; no second scan, no join against the fact."""
    ev = load_table(spark, sf_dir, "events")
    split = F.lit(DRIFT_SPLIT).cast("timestamp")
    sided = ev.groupBy("event_type").agg(
        F.count(F.when(F.col("ts") < split, 1)).alias("n_before"),
        F.count(F.when(F.col("ts") >= split, 1)).alias("n_after"),
    )
    tot = sided.agg(
        F.sum("n_before").alias("tot_before"),
        F.sum("n_after").alias("tot_after"),
    )
    share_b = F.col("n_before").cast("double") / F.col("tot_before").cast(
        "double"
    )
    share_a = F.col("n_after").cast("double") / F.col("tot_after").cast(
        "double"
    )
    return sided.crossJoin(F.broadcast(tot)).select(
        "event_type",
        "n_before",
        "n_after",
        F.round(share_b, 9).alias("share_before"),
        F.round(share_a, 9).alias("share_after"),
        F.round(F.abs(share_a - share_b), 9).alias("abs_share_delta"),
    )


register(
    "events_drift_report",
    f"""
WITH sided AS (
  SELECT event_type,
         COUNT(CASE WHEN ts < TIMESTAMP '{DRIFT_SPLIT}' THEN 1 END)
           AS n_before,
         COUNT(CASE WHEN ts >= TIMESTAMP '{DRIFT_SPLIT}' THEN 1 END)
           AS n_after
  FROM events GROUP BY 1
),
tot AS (
  SELECT SUM(n_before) AS tot_before, SUM(n_after) AS tot_after FROM sided
)
SELECT event_type, n_before, n_after,
       round(CAST(n_before AS DOUBLE) / CAST(tot_before AS DOUBLE), 9)
         AS share_before,
       round(CAST(n_after AS DOUBLE) / CAST(tot_after AS DOUBLE), 9)
         AS share_after,
       round(abs(CAST(n_after AS DOUBLE) / CAST(tot_after AS DOUBLE)
                 - CAST(n_before AS DOUBLE) / CAST(tot_before AS DOUBLE)),
             9) AS abs_share_delta
FROM sided CROSS JOIN tot
""",
)(events_drift_report)


BILLING_TZ = "Europe/Berlin"


def events_local_day_rollup(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Daily rollup on LOCAL calendar days ({BILLING_TZ}) instead of
    UTC days — the billing-correct semantics for the reference's
    domain (German smart meters bill on local days; a UTC day boundary
    misassigns the 23:00-00:00 UTC hour in winter, 22:00-00:00 in
    summer, and the DST transition days are 23/25 hours long). Spark's
    ``from_utc_timestamp`` and DuckDB's ``AT TIME ZONE`` chain both
    resolve via the IANA tzdb, so the per-row day assignment is
    engine-identical — the hash gate proves the two timezone stacks
    (JVM vs ICU) agree over the data.

    Scale shape: identical to the UTC daily mart — the tz conversion
    is a stateless per-row expression fused into the scan, grouping
    unchanged."""
    ev = load_table(spark, sf_dir, "events")
    local_day = F.to_date(F.from_utc_timestamp("ts", BILLING_TZ)).alias(
        "local_day"
    )
    return ev.groupBy(local_day, "event_type").agg(
        F.count(F.lit(1)).alias("n_events"),
        dsum("value", "total_value"),
    )


register(
    "events_local_day_rollup",
    f"""
SELECT CAST((ts AT TIME ZONE 'UTC') AT TIME ZONE '{BILLING_TZ}' AS DATE)
         AS local_day,
       event_type,
       COUNT(*) AS n_events,
       CAST(SUM(CAST(value AS DECIMAL(25,6))) AS DOUBLE) AS total_value
FROM events
GROUP BY 1, 2
""",
)(events_local_day_rollup)


EWMA_TAPS = 8
# exact binary weights 2^-(k+1): finite binary fractions, so every
# product and the normalization divisor are exact IEEE doubles and the
# same decimal literal parses identically in both engines.
EWMA_WEIGHTS = ["0.5", "0.25", "0.125", "0.0625",
                "0.03125", "0.015625", "0.0078125", "0.00390625"]


def events_ewma_smooth(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Exponentially weighted trailing smoothing per user (alpha=1/2,
    truncated at {EWMA_TAPS} taps, renormalized over the taps present)
    — the denoising pass run before thresholding noisy meters. The
    infinite-memory EWMA recurrence s=αv+(1-α)s is not expressible as
    a window function without higher-order state; the truncated form
    is (a LAG chain), loses at most 2^-{EWMA_TAPS} of the mass, and
    keeps every weight an exact binary fraction so the whole score is
    deterministic IEEE arithmetic (summation order fixed by writing
    the taps as one left-associated expression — cross-engine safe
    where a SUM over products would not be).

    Scale shape: ONE user-hash exchange for the window; all
    {EWMA_TAPS} LAGs ride the same sorted frame."""
    ev = load_table(spark, sf_dir, "events")
    w = Window.partitionBy("user_id").orderBy("ts", "event_id")
    vals = [F.col("value")] + [
        F.lag("value", k).over(w) for k in range(1, EWMA_TAPS)
    ]
    num = None
    den = None
    for k, v in enumerate(vals):
        wk = F.expr(f"CAST({EWMA_WEIGHTS[k]} AS DOUBLE)")
        term = F.when(v.isNotNull(), v * wk).otherwise(F.lit(0.0))
        pres = F.when(v.isNotNull(), wk).otherwise(F.lit(0.0))
        num = term if num is None else num + term
        den = pres if den is None else den + pres
    return ev.select(
        "event_id",
        "user_id",
        "value",
        F.round(num / den, 9).alias("ewma_value"),
    )


def _ewma_oracle() -> str:
    taps = []
    pres = []
    for k in range(EWMA_TAPS):
        v = (
            "value"
            if k == 0
            else f"LAG(value, {k}) OVER (PARTITION BY user_id ORDER BY ts, event_id)"
        )
        wk = f"CAST({EWMA_WEIGHTS[k]} AS DOUBLE)"
        taps.append(f"CASE WHEN {v} IS NOT NULL THEN {v} * {wk} ELSE 0.0 END")
        pres.append(f"CASE WHEN {v} IS NOT NULL THEN {wk} ELSE 0.0 END")
    num = " + ".join(taps)
    den = " + ".join(pres)
    return f"""
SELECT event_id, user_id, value,
       round(({num}) / ({den}), 9) AS ewma_value
FROM events
"""


register("events_ewma_smooth", _ewma_oracle())(events_ewma_smooth)


def nation_daily_peak_hour(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Per-(nation, day) PEAK HOUR — which hour carried the day's
    maximum load, and how much: the peak-demand question a capacity
    planner asks of the hourly mart (reference parity: the
    peak/critical flags of fact_grid_load_hourly.sql:85-104 reduced to
    their argmax form). Ties break to the earliest hour, making the
    selection total.

    Scale shape: the rank window runs over the HOURLY AGGREGATE (24
    rows per nation-day), never the fact table; its partition key
    (nation, day) is a coarsening of the rollup key, so the window can
    reuse the aggregation's clustering."""
    ev = load_table(spark, sf_dir, "events")
    cust = load_table(spark, sf_dir, "customer").select(
        F.col("c_custkey").alias("user_id"), "c_nationkey"
    )
    hourly = (
        ev.join(cust, "user_id")
        .groupBy(
            F.col("c_nationkey").alias("nationkey"),
            F.date_trunc("hour", "ts").alias("load_hour"),
        )
        .agg(dsum("value", "hour_value"))
    )
    w = Window.partitionBy(
        "nationkey", F.to_date("load_hour")
    ).orderBy(F.col("hour_value").desc(), "load_hour")
    return (
        hourly.withColumn("rn", F.row_number().over(w))
        .filter(F.col("rn") == 1)
        .select(
            "nationkey",
            F.to_date("load_hour").alias("load_day"),
            F.hour("load_hour").alias("peak_hour"),
            F.col("hour_value").alias("peak_value"),
        )
    )


register(
    "nation_daily_peak_hour",
    """
WITH hourly AS (
  SELECT c.c_nationkey AS nationkey,
         date_trunc('hour', e.ts) AS load_hour,
         CAST(SUM(CAST(e.value AS DECIMAL(25,6))) AS DOUBLE) AS hour_value
  FROM events e JOIN customer c ON e.user_id = c.c_custkey
  GROUP BY 1, 2
),
ranked AS (
  SELECT nationkey, load_hour, hour_value,
         ROW_NUMBER() OVER (
           PARTITION BY nationkey, CAST(load_hour AS DATE)
           ORDER BY hour_value DESC, load_hour) AS rn
  FROM hourly
)
SELECT nationkey, CAST(load_hour AS DATE) AS load_day,
       CAST(hour(load_hour) AS INT) AS peak_hour,
       hour_value AS peak_value
FROM ranked WHERE rn = 1
""",
)(nation_daily_peak_hour)


WINSOR_LO, WINSOR_HI = "0.01", "0.99"  # shared percentile literals


def events_winsorized_stats(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Winsorized per-type statistics: clamp values at the exact
    p[{WINSOR_LO}], p[{WINSOR_HI}] bounds and report n, clamped-sum
    and how many rows hit each side — the robust-stats preprocessing
    step that stops a handful of meter glitches from dragging a mean
    (the screen ``events_anomaly_zscore`` flags, applied as a
    correction). The interpolated percentile is round-12 requantized
    (the verified bit-equal idiom of ``event_value_percentiles``);
    clamping and the decimal sum are exact.

    Scale shape: the percentile pass is per-type sort-based (the exact
    small-group form; at unbounded cardinality swap in the histogram
    sketch the way ``event_value_hist_quantiles`` does), its 5-row
    bound table broadcasts back, and the clamped rollup combines
    map-side — the fact table is scanned twice, shuffled never."""
    ev = load_table(spark, sf_dir, "events")
    p = F.expr(f"percentile(value, array({WINSOR_LO}, {WINSOR_HI}))")
    bounds = ev.groupBy("event_type").agg(
        F.round(p[0], 12).alias("lo"),
        F.round(p[1], 12).alias("hi"),
    )
    clamped = ev.join(F.broadcast(bounds), "event_type").select(
        "event_type",
        "lo",
        "hi",
        F.greatest(F.least(F.col("value"), F.col("hi")), F.col("lo")).alias(
            "v_clamped"
        ),
        (F.col("value") < F.col("lo")).cast("int").alias("hit_lo"),
        (F.col("value") > F.col("hi")).cast("int").alias("hit_hi"),
    )
    return clamped.groupBy("event_type", "lo", "hi").agg(
        F.count(F.lit(1)).alias("n_events"),
        dsum("v_clamped", "winsorized_sum"),
        F.sum("hit_lo").alias("n_clamped_lo"),
        F.sum("hit_hi").alias("n_clamped_hi"),
    )


register(
    "events_winsorized_stats",
    f"""
WITH bounds AS (
  SELECT event_type,
         round(quantile_cont(value, {WINSOR_LO}), 12) AS lo,
         round(quantile_cont(value, {WINSOR_HI}), 12) AS hi
  FROM events GROUP BY 1
),
clamped AS (
  SELECT e.event_type, b.lo, b.hi,
         GREATEST(LEAST(e.value, b.hi), b.lo) AS v_clamped,
         CASE WHEN e.value < b.lo THEN 1 ELSE 0 END AS hit_lo,
         CASE WHEN e.value > b.hi THEN 1 ELSE 0 END AS hit_hi
  FROM events e JOIN bounds b ON e.event_type = b.event_type
)
SELECT event_type, lo, hi,
       COUNT(*) AS n_events,
       CAST(SUM(CAST(v_clamped AS DECIMAL(25,6))) AS DOUBLE)
         AS winsorized_sum,
       CAST(SUM(hit_lo) AS BIGINT) AS n_clamped_lo,
       CAST(SUM(hit_hi) AS BIGINT) AS n_clamped_hi
FROM clamped
GROUP BY 1, 2, 3
""",
)(events_winsorized_stats)


def user_value_trend(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Per-user OLS trend (slope + intercept of value over time) via
    the closed form — regression as a pure aggregation, no Python, no
    iteration: slope = (nΣxy − ΣxΣy) / (nΣx² − (Σx)²). x is seconds
    since the global stream start (the broadcast 1-row min shifts the
    epoch down so the double-precision final arithmetic operates on
    small magnitudes; the SUMS are exact decimals, so map-side
    partials combine deterministically and only the last four scalar
    ops run in float). Degenerate users (n=1 or constant x) emit NULL
    slope via the guarded divide.

    Scale shape: one map-side-combinable aggregation keyed by user —
    regression at 100 TB costs exactly one rollup shuffle."""
    ev = load_table(spark, sf_dir, "events")
    t0 = ev.agg(
        F.min(F.expr("CAST(floor(unix_timestamp(ts)) AS BIGINT)")).alias("t0")
    )
    base = ev.crossJoin(F.broadcast(t0)).select(
        "user_id",
        (
            F.expr("CAST(floor(unix_timestamp(ts)) AS BIGINT)") - F.col("t0")
        ).alias("x"),
        F.col("value").alias("y"),
    )
    sums = base.groupBy("user_id").agg(
        F.count(F.lit(1)).alias("n"),
        F.sum(F.col("x").cast("decimal(25,6)")).alias("sx"),
        F.sum(F.col("y").cast("decimal(25,6)")).alias("sy"),
        F.sum(
            (F.col("x") * F.col("x")).cast("decimal(38,6)")
        ).alias("sxx"),
        F.sum(
            (F.col("x").cast("double") * F.col("y")).cast("decimal(38,6)")
        ).alias("sxy"),
    )
    n = F.col("n").cast("double")
    sx = F.col("sx").cast("double")
    sy = F.col("sy").cast("double")
    sxx = F.col("sxx").cast("double")
    sxy = F.col("sxy").cast("double")
    den = n * sxx - sx * sx
    slope = (n * sxy - sx * sy) / den
    intercept = (sy - slope * sx) / n
    return sums.select(
        "user_id",
        F.col("n").alias("n_events"),
        F.when(den > 0, F.round(slope * 1000000.0, 9)).alias(
            "slope_micro_per_sec"
        ),
        F.when(den > 0, F.round(intercept, 9)).alias("intercept"),
    )


register(
    "user_value_trend",
    """
WITH t0 AS (
  SELECT MIN(CAST(floor(epoch(ts)) AS BIGINT)) AS t0 FROM events
),
base AS (
  SELECT user_id,
         CAST(floor(epoch(ts)) AS BIGINT) - t0 AS x,
         value AS y
  FROM events CROSS JOIN t0
),
sums AS (
  SELECT user_id, COUNT(*) AS n,
         SUM(CAST(x AS DECIMAL(25,6))) AS sx,
         SUM(CAST(y AS DECIMAL(25,6))) AS sy,
         SUM(CAST(x * x AS DECIMAL(38,6))) AS sxx,
         SUM(CAST(CAST(x AS DOUBLE) * y AS DECIMAL(38,6))) AS sxy
  FROM base GROUP BY 1
)
SELECT user_id, n AS n_events,
       CASE WHEN CAST(n AS DOUBLE) * CAST(sxx AS DOUBLE)
                 - CAST(sx AS DOUBLE) * CAST(sx AS DOUBLE) > 0
            THEN round(((CAST(n AS DOUBLE) * CAST(sxy AS DOUBLE)
                         - CAST(sx AS DOUBLE) * CAST(sy AS DOUBLE))
                        / (CAST(n AS DOUBLE) * CAST(sxx AS DOUBLE)
                           - CAST(sx AS DOUBLE) * CAST(sx AS DOUBLE)))
                       * 1000000.0, 9)
            END AS slope_micro_per_sec,
       CASE WHEN CAST(n AS DOUBLE) * CAST(sxx AS DOUBLE)
                 - CAST(sx AS DOUBLE) * CAST(sx AS DOUBLE) > 0
            THEN round((CAST(sy AS DOUBLE)
                        - ((CAST(n AS DOUBLE) * CAST(sxy AS DOUBLE)
                            - CAST(sx AS DOUBLE) * CAST(sy AS DOUBLE))
                           / (CAST(n AS DOUBLE) * CAST(sxx AS DOUBLE)
                              - CAST(sx AS DOUBLE) * CAST(sx AS DOUBLE)))
                          * CAST(sx AS DOUBLE))
                       / CAST(n AS DOUBLE), 9)
            END AS intercept
FROM sums
""",
)(user_value_trend)


def events_seasonal_forecast_mae(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Seasonal-naive forecast baseline + backtest: the second half of
    the stream is 'predicted' by the first half's mean value at the
    same (day-of-week, hour-of-day) slot per event type, and the
    mean absolute error is reported per type — the sanity baseline
    every forecasting effort must beat, and the backtest harness shape
    (train window → slot model → scoring join → error rollup) that
    carries over to real models.

    Determinism: the slot means are decimal-summed then round-12
    requantized (the z-score recipe), the per-row |v − pred| is plain
    IEEE, and the MAE numerator is an exact decimal sum. Scale shape:
    the slot model is ≤ types×7×24 rows broadcast onto the test scan;
    both passes combine map-side — zero fact shuffles."""
    ev = load_table(spark, sf_dir, "events")
    split = F.lit(DRIFT_SPLIT).cast("timestamp")
    slotted = ev.select(
        "event_type",
        "ts",
        "value",
        F.dayofweek("ts").alias("dow"),
        F.hour("ts").alias("hod"),
    )
    # All-decimal error arithmetic (the quantized-grid idiom): casting
    # the raw |v − pred| double to DECIMAL hits the engines' 1-ulp
    # half-way disagreement once enough rows flow through the sum
    # (observed at sf0.1) — so v enters the 6-grid, pred the 12-grid
    # (round-then-cast is safe: the value sits ON the grid), and the
    # subtraction/abs/sum never leave exact decimals.
    slotted = slotted.withColumn(
        "v6", F.round("value", 6).cast("decimal(12,6)")
    )
    model = (
        slotted.filter(F.col("ts") < split)
        .groupBy("event_type", "dow", "hod")
        .agg(
            F.round(
                F.sum("v6").cast("double") / F.count(F.lit(1)), 12
            )
            .cast("decimal(24,12)")
            .alias("pred")
        )
    )
    test = slotted.filter(F.col("ts") >= split)
    scored = test.join(F.broadcast(model), ["event_type", "dow", "hod"])
    return scored.groupBy("event_type").agg(
        F.count(F.lit(1)).alias("n_test"),
        F.round(
            F.sum(F.abs(F.col("v6") - F.col("pred"))).cast("double")
            / F.count(F.lit(1)),
            9,
        ).alias("mae"),
    )


register(
    "events_seasonal_forecast_mae",
    f"""
WITH slotted AS (
  SELECT event_type, ts,
         CAST(round(value, 6) AS DECIMAL(12,6)) AS v6,
         dayofweek(ts) + 1 AS dow, hour(ts) AS hod
  FROM events
),
model AS (
  SELECT event_type, dow, hod,
         CAST(round(CAST(SUM(v6) AS DOUBLE) / COUNT(*), 12)
              AS DECIMAL(24,12)) AS pred
  FROM slotted WHERE ts < TIMESTAMP '{DRIFT_SPLIT}'
  GROUP BY 1, 2, 3
),
scored AS (
  SELECT t.event_type, abs(t.v6 - m.pred) AS err
  FROM slotted t
  JOIN model m ON t.event_type = m.event_type
              AND t.dow = m.dow AND t.hod = m.hod
  WHERE t.ts >= TIMESTAMP '{DRIFT_SPLIT}'
)
SELECT event_type, COUNT(*) AS n_test,
       round(CAST(SUM(err) AS DOUBLE) / COUNT(*), 9) AS mae
FROM scored
GROUP BY 1
""",
)(events_seasonal_forecast_mae)


ACF_LAGS = (1, 2, 3)


def events_hourly_autocorr(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Lag-k autocorrelation (k ∈ {ACF_LAGS}) of each type's hourly
    value series — the seasonality detector behind choices like the
    seasonal-anomaly baseline key: high r at lag 24 says 'daily
    cycle', high r at lag 1 says 'smooth series, EWMA will work'.
    Pearson r from the closed-form sums over (v_t, v_(t+k)) pairs.

    Determinism: the hourly series enters the DECIMAL(12,6) grid, the
    five sufficient sums per (type, lag) are exact decimals, and the
    final r is a handful of per-row float ops plus one sqrt (IEEE
    correctly-rounded — the one transcendental-adjacent op that IS
    cross-engine safe). Degenerate series (zero variance either side)
    emit NULL via the guarded divide.

    Scale shape: the fact rolls up to type×hours once (map-side
    combine); the LAG windows and sums run over that tiny series."""
    ev = load_table(spark, sf_dir, "events")
    hourly = (
        ev.groupBy("event_type", F.date_trunc("hour", "ts").alias("h"))
        .agg(
            F.round(
                F.sum(F.col("value").cast("decimal(25,6)")).cast("double"), 6
            )
            .cast("decimal(12,6)")
            .alias("v")
        )
    )
    w = Window.partitionBy("event_type").orderBy("h")
    legs = []
    for k in ACF_LAGS:
        paired = hourly.select(
            "event_type",
            F.col("v").alias("x"),
            F.lead("v", k).over(w).alias("y"),
        ).filter(F.col("y").isNotNull())
        sums = paired.groupBy("event_type").agg(
            F.count(F.lit(1)).alias("n"),
            F.sum("x").alias("sx"),
            F.sum("y").alias("sy"),
            F.sum(F.col("x") * F.col("x")).alias("sxx"),
            F.sum(F.col("y") * F.col("y")).alias("syy"),
            F.sum(F.col("x") * F.col("y")).alias("sxy"),
        )
        n = F.col("n").cast("double")
        sx = F.col("sx").cast("double")
        sy = F.col("sy").cast("double")
        vx = n * F.col("sxx").cast("double") - sx * sx
        vy = n * F.col("syy").cast("double") - sy * sy
        cov = n * F.col("sxy").cast("double") - sx * sy
        legs.append(
            sums.select(
                "event_type",
                F.lit(k).alias("lag"),
                F.col("n").alias("n_pairs"),
                F.when(
                    (vx > 0) & (vy > 0),
                    F.round(cov / F.sqrt(vx * vy), 9),
                ).alias("autocorr"),
            )
        )
    out = legs[0]
    for df in legs[1:]:
        out = out.unionByName(df)
    return out


def _acf_leg_sql(k: int) -> str:
    # every product casts its operands up to DECIMAL(25,6) first:
    # DuckDB executes DECIMAL(12,6)×DECIMAL(12,6) in int64 and
    # overflows at sf0.1's magnitudes, while the wider type forces
    # int128 — the VALUES are identical exact decimals either way
    # (Spark's JVM decimals widen automatically, so only the oracle
    # needs the cast).
    return f"""
  SELECT event_type, {k} AS lag, COUNT(*) AS n_pairs,
         CASE WHEN CAST(COUNT(*) AS DOUBLE) * CAST(SUM(x * x) AS DOUBLE)
                   - CAST(SUM(x) AS DOUBLE) * CAST(SUM(x) AS DOUBLE) > 0
               AND CAST(COUNT(*) AS DOUBLE) * CAST(SUM(y * y) AS DOUBLE)
                   - CAST(SUM(y) AS DOUBLE) * CAST(SUM(y) AS DOUBLE) > 0
              THEN round((CAST(COUNT(*) AS DOUBLE) * CAST(SUM(x * y) AS DOUBLE)
                          - CAST(SUM(x) AS DOUBLE) * CAST(SUM(y) AS DOUBLE))
                         / sqrt((CAST(COUNT(*) AS DOUBLE)
                                 * CAST(SUM(x * x) AS DOUBLE)
                                 - CAST(SUM(x) AS DOUBLE)
                                   * CAST(SUM(x) AS DOUBLE))
                                * (CAST(COUNT(*) AS DOUBLE)
                                   * CAST(SUM(y * y) AS DOUBLE)
                                   - CAST(SUM(y) AS DOUBLE)
                                     * CAST(SUM(y) AS DOUBLE))), 9)
              END AS autocorr
  FROM (
    SELECT event_type,
           CAST(v AS DECIMAL(25,6)) AS x,
           CAST(LEAD(v, {k}) OVER (
             PARTITION BY event_type ORDER BY h) AS DECIMAL(25,6)) AS y
    FROM hourly
  ) WHERE y IS NOT NULL
  GROUP BY 1"""


register(
    "events_hourly_autocorr",
    f"""
WITH hourly AS (
  SELECT event_type, date_trunc('hour', ts) AS h,
         CAST(round(CAST(SUM(CAST(value AS DECIMAL(25,6))) AS DOUBLE), 6)
              AS DECIMAL(12,6)) AS v
  FROM events GROUP BY 1, 2
)
{" UNION ALL ".join(_acf_leg_sql(k) for k in ACF_LAGS)}
""",
)(events_hourly_autocorr)


def events_interarrival_stats(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Inter-arrival process characterization per event type: median
    and p90 of the per-user gap between consecutive events, plus the
    gap count — the arrival-rate profile that sizes watermarks and
    session timeouts (reference parity: the 5-second producer cadence
    assumption, producer/meter_simulator.py, measured instead of
    assumed). Gaps are exact integer seconds (epoch subtraction), so
    the interpolated percentiles divide small integers — engine-safe.

    Scale shape: one user-partitioned LAG window (the same exchange
    the session ops use), then a type-keyed percentile over integer
    gaps."""
    ev = load_table(spark, sf_dir, "events")
    w = Window.partitionBy("user_id").orderBy("ts", "event_id")
    gaps = (
        ev.select(
            "event_type",
            "user_id",
            F.expr("CAST(floor(unix_timestamp(ts)) AS BIGINT)").alias("t"),
            "ts",
            "event_id",
        )
        .withColumn("gap_s", F.col("t") - F.lag("t").over(w))
        .filter(F.col("gap_s").isNotNull())
    )
    p = F.expr("percentile(gap_s, array(0.5, 0.9))")
    return gaps.groupBy("event_type").agg(
        F.count(F.lit(1)).alias("n_gaps"),
        F.round(p[0], 6).alias("median_gap_s"),
        F.round(p[1], 6).alias("p90_gap_s"),
    )


register(
    "events_interarrival_stats",
    """
WITH gaps AS (
  SELECT event_type,
         CAST(floor(epoch(ts)) AS BIGINT)
           - LAG(CAST(floor(epoch(ts)) AS BIGINT)) OVER (
               PARTITION BY user_id ORDER BY ts, event_id) AS gap_s
  FROM events
)
SELECT event_type, COUNT(*) AS n_gaps,
       round(quantile_cont(gap_s, 0.5), 6) AS median_gap_s,
       round(quantile_cont(gap_s, 0.9), 6) AS p90_gap_s
FROM gaps WHERE gap_s IS NOT NULL
GROUP BY 1
""",
)(events_interarrival_stats)


EVENTS_WINDOW_MINUTES = 43200  # Jan 1-30 2024 = 30 days × 1440 — the
# fixed observation window; using it as the denominator folds the
# zero-event minutes into mean/variance WITHOUT materializing them
# (Σc over observed minutes is all events, Σc² is unchanged by zeros).


def events_burstiness(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Burstiness (Fano factor = var/mean of per-minute arrival
    counts) per event type — overdispersion says 'bursty arrivals,
    size buffers and watermarks for spikes'; ≈1 says Poisson-like.
    Counts are exact integers, so the sufficient sums are exact
    bigints and only the final mean/var/Fano divisions run in float
    (guarded, round 9 / round 12 requantized).

    Scale shape: one fact scan into a (type, minute) count — map-side
    combinable — then per-type sums over the minute series."""
    ev = load_table(spark, sf_dir, "events")
    per_min = ev.groupBy(
        "event_type", F.date_trunc("minute", "ts").alias("m")
    ).agg(F.count(F.lit(1)).alias("c"))
    sums = per_min.groupBy("event_type").agg(
        F.sum("c").alias("sc"),
        F.sum(F.col("c") * F.col("c")).alias("sc2"),
        F.count(F.lit(1)).alias("n_active_minutes"),
    )
    n = F.lit(EVENTS_WINDOW_MINUTES).cast("double")
    mean = F.round(F.col("sc").cast("double") / n, 12)
    var = F.greatest(
        F.round(F.col("sc2").cast("double") / n - mean * mean, 12),
        F.lit(0.0),
    )
    return sums.select(
        "event_type",
        F.col("sc").alias("n_events"),
        "n_active_minutes",
        mean.alias("mean_per_min"),
        F.when(mean > 0, F.round(var / mean, 9)).alias("fano_factor"),
    )


register(
    "events_burstiness",
    f"""
WITH per_min AS (
  SELECT event_type, date_trunc('minute', ts) AS m, COUNT(*) AS c
  FROM events GROUP BY 1, 2
),
sums AS (
  SELECT event_type, CAST(SUM(c) AS BIGINT) AS sc,
         CAST(SUM(c * c) AS BIGINT) AS sc2,
         COUNT(*) AS n_active_minutes
  FROM per_min GROUP BY 1
)
SELECT event_type, sc AS n_events, n_active_minutes,
       round(CAST(sc AS DOUBLE) / {EVENTS_WINDOW_MINUTES}.0, 12)
         AS mean_per_min,
       CASE WHEN round(CAST(sc AS DOUBLE) / {EVENTS_WINDOW_MINUTES}.0, 12) > 0
            THEN round(
              GREATEST(
                round(CAST(sc2 AS DOUBLE) / {EVENTS_WINDOW_MINUTES}.0
                      - round(CAST(sc AS DOUBLE)
                              / {EVENTS_WINDOW_MINUTES}.0, 12)
                        * round(CAST(sc AS DOUBLE)
                                / {EVENTS_WINDOW_MINUTES}.0, 12), 12),
                0.0)
              / round(CAST(sc AS DOUBLE) / {EVENTS_WINDOW_MINUTES}.0, 12), 9)
            END AS fano_factor
FROM sums
""",
)(events_burstiness)


PATH_TOP_K = 20
PATH_MAX_EVENTS = 12


def events_top_paths(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Top behavioral paths: the most common event-type SEQUENCES per
    session (gap-based sessions, same rule as events_sessionized) —
    the path-mining rollup behind funnel discovery and UX analysis,
    where events_funnel checks ONE known path and this surfaces the
    unknown ones.

    Each session contributes its first ``PATH_MAX_EVENTS`` events
    (row_number cap — keeps the path string bounded at 100 TB where a
    bot session can be arbitrarily long) joined as 'type>type>...';
    paths are counted corpus-wide and the top-K comes back as a
    TakeOrdered with the rank window above the K-row head. Ordering
    ties break on event_id everywhere, so the path strings are
    deterministic.

    Scale shape: the session windows and the path fold all share ONE
    user_id partitioning; the path rollup shuffles on the path string
    once."""
    ev = load_table(spark, sf_dir, "events").select(
        "user_id", "ts", "event_id", "event_type"
    )
    w = Window.partitionBy("user_id").orderBy("ts", "event_id")
    gap_flag = F.when(
        (F.unix_timestamp("ts") - F.unix_timestamp(F.lag("ts").over(w)))
        > SESSION_GAP_MIN * 60,
        1,
    ).otherwise(0)
    sessions = ev.withColumn("new_session", gap_flag).withColumn(
        "session_seq",
        F.sum("new_session").over(
            w.rowsBetween(Window.unboundedPreceding, 0)
        ),
    )
    w_sess = Window.partitionBy("user_id", "session_seq").orderBy(
        "ts", "event_id"
    )
    capped = sessions.withColumn(
        "rn", F.row_number().over(w_sess)
    ).filter(F.col("rn") <= PATH_MAX_EVENTS)
    paths = capped.groupBy("user_id", "session_seq").agg(
        F.array_join(
            F.transform(
                F.array_sort(
                    F.collect_list(
                        F.struct("ts", "event_id", "event_type")
                    )
                ),
                lambda s: s["event_type"],
            ),
            ">",
        ).alias("path")
    )
    counts = paths.groupBy("path").agg(
        F.count(F.lit(1)).alias("n_sessions")
    )
    head = counts.orderBy(
        F.col("n_sessions").desc(), F.col("path")
    ).limit(PATH_TOP_K)
    w_rank = Window.orderBy(F.col("n_sessions").desc(), F.col("path"))
    return head.withColumn("rank", F.row_number().over(w_rank)).select(
        "rank",
        "path",
        F.col("n_sessions").cast("bigint").alias("n_sessions"),
    )


register(
    "events_top_paths",
    f"""
WITH flagged AS (
  SELECT user_id, ts, event_id, event_type,
         CASE WHEN epoch(ts) - epoch(LAG(ts) OVER (
                PARTITION BY user_id ORDER BY ts, event_id
              )) > {SESSION_GAP_MIN * 60}
              THEN 1 ELSE 0 END AS new_session
  FROM events
),
sessions AS (
  SELECT *,
         SUM(new_session) OVER (
           PARTITION BY user_id ORDER BY ts, event_id
           ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW
         ) AS session_seq
  FROM flagged
),
capped AS (
  SELECT * FROM (
    SELECT *,
           ROW_NUMBER() OVER (
             PARTITION BY user_id, session_seq ORDER BY ts, event_id
           ) AS rn
    FROM sessions
  ) WHERE rn <= {PATH_MAX_EVENTS}
),
paths AS (
  SELECT user_id, session_seq,
         STRING_AGG(event_type, '>' ORDER BY ts, event_id) AS path
  FROM capped GROUP BY 1, 2
),
counts AS (
  SELECT path, COUNT(*) AS n_sessions FROM paths GROUP BY 1
),
head AS (
  SELECT path, n_sessions,
         ROW_NUMBER() OVER (ORDER BY n_sessions DESC, path) AS rank
  FROM counts
  ORDER BY n_sessions DESC, path
  LIMIT {PATH_TOP_K}
)
SELECT rank, path, CAST(n_sessions AS BIGINT) AS n_sessions FROM head
""",
)(events_top_paths)


def events_user_type_gini(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Behavioral-diversity screen: per user, the Gini IMPURITY of
    their event-type mix — 1 − Σ pᵢ² — high for users spread across
    types, zero for single-type (bot-like) users. The entropy screen's
    rational twin: Shannon entropy needs ln() (not cross-engine
    bit-stable), while impurity is exact integer arithmetic:
    impurity_micro = (1e6·(n² − Σcntᵢ²)) div n².

    Scale shape: one (user, type) rollup (partial-combined), one user
    rollup — no windows, no joins. int64 headroom: n² ≤ 9e18 holds
    through ~3e9 events per user."""
    ev = load_table(spark, sf_dir, "events").select(
        "user_id", "event_type"
    )
    per_type = ev.groupBy("user_id", "event_type").agg(
        F.count(F.lit(1)).alias("cnt")
    )
    return (
        per_type.groupBy("user_id")
        .agg(
            F.sum("cnt").alias("n_events"),
            F.sum(F.col("cnt") * F.col("cnt")).alias("sum_sq"),
            F.count(F.lit(1)).alias("n_types"),
        )
        .select(
            "user_id",
            F.col("n_events").cast("bigint").alias("n_events"),
            F.col("n_types").cast("bigint").alias("n_types"),
            F.expr(
                "CAST((1000000 * (n_events * n_events - sum_sq))"
                " div (n_events * n_events) AS BIGINT)"
            ).alias("impurity_micro"),
        )
    )


register(
    "events_user_type_gini",
    """
WITH per_type AS (
  SELECT user_id, event_type, COUNT(*) AS cnt
  FROM events GROUP BY 1, 2
),
per_user AS (
  SELECT user_id, SUM(cnt) AS n_events,
         SUM(cnt * cnt) AS sum_sq, COUNT(*) AS n_types
  FROM per_type GROUP BY 1
)
SELECT user_id,
       CAST(n_events AS BIGINT) AS n_events,
       CAST(n_types AS BIGINT) AS n_types,
       CAST((1000000 * (n_events * n_events - sum_sq))
            // (n_events * n_events) AS BIGINT) AS impurity_micro
FROM per_user
""",
)(events_user_type_gini)


def events_dow_hour_matrix(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Calendar-heatmap matrix: activity per (day-of-week × hour) cell
    with each cell's micro-share of the total — the load-profile
    rollup behind capacity planning and anomaly baselines (reference
    parity: the hourly grid mart's time axis, crossed with the
    weekly cycle it cannot see).

    day-of-week via DATE arithmetic on a known anchor Monday
    (engine-exact integer days-since-epoch modulo 7 — ``dayofweek``
    builtins disagree on week start across engines), hour via
    EXTRACT. One rollup + a 1-row broadcast total; ≤168 output
    rows."""
    ev = load_table(spark, sf_dir, "events").select("ts")
    cells = ev.select(
        F.expr(
            "CAST(pmod(datediff(CAST(ts AS DATE),"
            " DATE '1995-01-02'), 7) AS INT)"
        ).alias("dow"),
        F.hour("ts").alias("hour"),
    ).groupBy("dow", "hour").agg(F.count(F.lit(1)).alias("n_events"))
    total = cells.agg(F.sum("n_events").alias("total"))
    return cells.crossJoin(F.broadcast(total)).select(
        "dow",
        "hour",
        F.col("n_events").cast("bigint").alias("n_events"),
        F.expr("CAST((1000000 * n_events) div total AS BIGINT)").alias(
            "share_micro"
        ),
    )


register(
    "events_dow_hour_matrix",
    """
WITH cells AS (
  SELECT CAST(((CAST(ts AS DATE) - DATE '1995-01-02') % 7 + 7) % 7
              AS INT) AS dow,
         EXTRACT(hour FROM ts) AS hour,
         COUNT(*) AS n_events
  FROM events GROUP BY 1, 2
),
total AS (SELECT SUM(n_events) AS total FROM cells)
SELECT dow, hour,
       CAST(n_events AS BIGINT) AS n_events,
       CAST((1000000 * n_events) // total AS BIGINT) AS share_micro
FROM cells, total
""",
)(events_dow_hour_matrix)


def events_flapping_detection(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Flapping detection: how often each user's value series REVERSES
    direction — the alert-fatigue primitive (a service bouncing
    between states flaps; a trending one doesn't). Count of sign
    changes between consecutive deltas, per user, with a micro-ratio
    against the maximum possible reversals.

    Exactness: deltas compare by SIGN only (IEEE subtraction then a
    three-way sign — selection-grade determinism, zero-deltas count
    as no reversal); all outputs integer. One (user)-partitioned LAG
    window chain + one rollup — the stg-deltas shape with a second
    LAG over the sign."""
    ev = load_table(spark, sf_dir, "events").select(
        "user_id", "ts", "event_id", "value"
    )
    w = Window.partitionBy("user_id").orderBy("ts", "event_id")
    sgn = F.signum(F.col("value") - F.lag("value").over(w))
    signed = ev.withColumn("sgn", sgn).filter(
        F.col("sgn").isNotNull() & (F.col("sgn") != 0)
    )
    flips = signed.withColumn(
        "prev_sgn", F.lag("sgn").over(w)
    ).withColumn(
        "flip",
        (
            F.col("prev_sgn").isNotNull()
            & (F.col("sgn") != F.col("prev_sgn"))
        ).cast("long"),
    )
    return flips.groupBy("user_id").agg(
        F.count(F.lit(1)).cast("bigint").alias("n_moves"),
        F.sum("flip").cast("bigint").alias("n_reversals"),
        F.expr(
            "CAST(CASE WHEN count(1) > 1 THEN"
            " (1000000 * sum(flip)) div (count(1) - 1)"
            " ELSE 0 END AS BIGINT)"
        ).alias("flap_micro"),
    )


register(
    "events_flapping_detection",
    """
WITH sgn AS (
  SELECT user_id, ts, event_id,
         SIGN(value - LAG(value) OVER (
           PARTITION BY user_id ORDER BY ts, event_id)) AS sgn
  FROM events
),
moves AS (
  SELECT user_id, ts, event_id, sgn,
         LAG(sgn) OVER (PARTITION BY user_id
                        ORDER BY ts, event_id) AS prev_sgn
  FROM sgn WHERE sgn IS NOT NULL AND sgn <> 0
)
SELECT user_id,
       CAST(COUNT(*) AS BIGINT) AS n_moves,
       CAST(SUM(CASE WHEN prev_sgn IS NOT NULL AND sgn <> prev_sgn
                     THEN 1 ELSE 0 END) AS BIGINT) AS n_reversals,
       CAST(CASE WHEN COUNT(*) > 1 THEN
              (1000000 * SUM(CASE WHEN prev_sgn IS NOT NULL
                                   AND sgn <> prev_sgn
                                  THEN 1 ELSE 0 END))
              // (COUNT(*) - 1)
            ELSE 0 END AS BIGINT) AS flap_micro
FROM moves
GROUP BY user_id
""",
)(events_flapping_detection)


ROLLING_ACTIVE_DAYS = 7


def events_rolling_active_users(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Rolling 7-day active users per day (the WAU curve next to DAU):
    for every calendar day with activity, the count of DISTINCT users
    seen in the trailing ``ROLLING_ACTIVE_DAYS``-day window.

    COUNT(DISTINCT) over a sliding range frame is not
    partial-aggregatable — the scale-correct formulation EXPLODES each
    (user, active-day) pair to the ≤7 window-days it covers (a
    generated date sequence, LINEAR in pairs × window — never a
    pairs⋈spine range join, which plans as a nested loop), then runs
    one exact distinct count per window day. A broadcast semi-join
    against the observed-day spine (bounded by the calendar, not the
    data) drops trailing window days nothing actually happened on, so
    both engines emit the identical day set."""
    ev = load_table(spark, sf_dir, "events").select(
        "user_id", F.to_date("ts").alias("d")
    )
    pairs = ev.distinct()
    spine = pairs.select("d").distinct().select(
        F.col("d").alias("window_day")
    )
    covered = pairs.select(
        "user_id",
        F.explode(
            F.sequence(
                F.col("d"),
                F.date_add(F.col("d"), ROLLING_ACTIVE_DAYS - 1),
            )
        ).alias("window_day"),
    ).join(F.broadcast(spine), "window_day", "left_semi")
    return (
        covered.groupBy("window_day")
        .agg(
            F.countDistinct("user_id").cast("bigint").alias(
                "active_users"
            )
        )
    )


register(
    "events_rolling_active_users",
    f"""
WITH pairs AS (
  SELECT DISTINCT user_id, CAST(ts AS DATE) AS d FROM events
),
spine AS (SELECT DISTINCT d AS window_day FROM pairs)
SELECT window_day,
       CAST(COUNT(DISTINCT user_id) AS BIGINT) AS active_users
FROM pairs JOIN spine
  ON window_day >= d AND window_day < d + INTERVAL {ROLLING_ACTIVE_DAYS} DAY
GROUP BY window_day
""",
)(events_rolling_active_users)


MOTIF = ("view", "click", "purchase")


def events_motif_vcp(spark: SparkSession, sf_dir: str) -> DataFrame:
    """MATCH_RECOGNIZE-shaped strict-sequence motif detection: count,
    per user, the CONSECUTIVE view→click→purchase triples in their
    event stream (no gaps — the strict contiguity SQL's
    MATCH_RECOGNIZE PATTERN (A B C) expresses, which Spark lacks as a
    native operator). The funnel query answers "did they eventually
    convert"; this answers "how often does the exact 3-step path
    occur", the sequence-mining primitive under session-quality and
    bot-detection rules.

    Scale shape: one shuffle keyed by user for the ordered window,
    two row-bounded LEADs, then a map-side-combinable count — the
    same single-pass economics as the LAG/delta operators. Total
    order within user via (ts, event_id)."""
    ev = load_table(spark, sf_dir, "events")
    w = Window.partitionBy("user_id").orderBy("ts", "event_id")
    seq = ev.select(
        "user_id",
        "event_type",
        F.lead("event_type", 1).over(w).alias("t1"),
        F.lead("event_type", 2).over(w).alias("t2"),
    )
    hits = seq.filter(
        (F.col("event_type") == MOTIF[0])
        & (F.col("t1") == MOTIF[1])
        & (F.col("t2") == MOTIF[2])
    )
    return hits.groupBy("user_id").agg(
        F.count(F.lit(1)).cast("bigint").alias("n_motifs")
    )


register(
    "events_motif_vcp",
    f"""
WITH seq AS (
  SELECT user_id, event_type,
         LEAD(event_type, 1) OVER (
           PARTITION BY user_id ORDER BY ts, event_id) AS t1,
         LEAD(event_type, 2) OVER (
           PARTITION BY user_id ORDER BY ts, event_id) AS t2
  FROM events
)
SELECT user_id, CAST(COUNT(*) AS BIGINT) AS n_motifs
FROM seq
WHERE event_type = '{MOTIF[0]}' AND t1 = '{MOTIF[1]}' AND t2 = '{MOTIF[2]}'
GROUP BY user_id
""",
)(events_motif_vcp)


def events_key_skew_report(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Partition-skew diagnostic for the event fact's natural key: the
    per-user event-count distribution summarized as exact order
    statistics (p50/p99), the hottest key's share, and the p99/p50
    skew ratio — the report that decides whether a keyed shuffle
    needs salting (events_salted_rollup is the companion treatment).

    Scale shape: percentiles come from the COUNT-OF-COUNTS
    distribution — per-key rollup → groupBy(count) histogram (rows =
    distinct count VALUES, a tiny domain) → cumulative window over
    that histogram — so no user-sized frame is ever sorted in one
    partition (the trap the round-7 top-k fix removed elsewhere).
    Output is a single row of integers; all divisions are int64
    micro-unit floor divisions."""
    ev = load_table(spark, sf_dir, "events")
    per_key = ev.groupBy("user_id").agg(F.count(F.lit(1)).alias("cnt"))
    dist = per_key.groupBy("cnt").agg(F.count(F.lit(1)).alias("n_keys_at"))
    w = Window.orderBy("cnt").rowsBetween(
        Window.unboundedPreceding, Window.currentRow
    )
    cum = dist.select(
        "cnt",
        F.sum("n_keys_at").over(w).alias("cum_keys"),
    )
    totals = per_key.agg(
        F.count(F.lit(1)).alias("n_keys"),
        F.sum("cnt").alias("total_events"),
        F.max("cnt").alias("max_cnt"),
    )
    picked = (
        cum.crossJoin(F.broadcast(totals))
        .select(
            F.min(
                F.when(
                    F.col("cum_keys") * 2 >= F.col("n_keys"), F.col("cnt")
                )
            ).alias("p50_cnt"),
            F.min(
                F.when(
                    F.col("cum_keys") * 100 >= F.col("n_keys") * 99,
                    F.col("cnt"),
                )
            ).alias("p99_cnt"),
        )
    )
    return (
        totals.crossJoin(F.broadcast(picked))
        .select(
            F.col("n_keys").cast("bigint").alias("n_keys"),
            F.col("total_events").cast("bigint").alias("total_events"),
            F.col("max_cnt").cast("bigint").alias("max_cnt"),
            F.col("p50_cnt").cast("bigint").alias("p50_cnt"),
            F.col("p99_cnt").cast("bigint").alias("p99_cnt"),
            F.expr("(1000000 * p99_cnt) div p50_cnt")
            .cast("bigint")
            .alias("skew_ratio_micro"),
            F.expr("(1000000 * max_cnt) div total_events")
            .cast("bigint")
            .alias("top_key_share_micro"),
        )
    )


register(
    "events_key_skew_report",
    """
WITH per_key AS (
  SELECT user_id, COUNT(*) AS cnt FROM events GROUP BY 1
),
dist AS (
  SELECT cnt, COUNT(*) AS n_keys_at FROM per_key GROUP BY 1
),
cum AS (
  SELECT cnt,
         SUM(n_keys_at) OVER (ORDER BY cnt
                              ROWS BETWEEN UNBOUNDED PRECEDING
                              AND CURRENT ROW) AS cum_keys
  FROM dist
),
tot AS (
  SELECT COUNT(*) AS n_keys, SUM(cnt) AS total_events, MAX(cnt) AS max_cnt
  FROM per_key
),
picked AS (
  SELECT MIN(CASE WHEN cum_keys * 2 >= t.n_keys THEN cnt END) AS p50_cnt,
         MIN(CASE WHEN cum_keys * 100 >= t.n_keys * 99 THEN cnt END)
           AS p99_cnt
  FROM cum CROSS JOIN tot t
)
SELECT CAST(t.n_keys AS BIGINT) AS n_keys,
       CAST(t.total_events AS BIGINT) AS total_events,
       CAST(t.max_cnt AS BIGINT) AS max_cnt,
       CAST(p.p50_cnt AS BIGINT) AS p50_cnt,
       CAST(p.p99_cnt AS BIGINT) AS p99_cnt,
       CAST((1000000 * p.p99_cnt) // p.p50_cnt AS BIGINT)
         AS skew_ratio_micro,
       CAST((1000000 * t.max_cnt) // t.total_events AS BIGINT)
         AS top_key_share_micro
FROM tot t CROSS JOIN picked p
""",
)(events_key_skew_report)


def events_ks_distance(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Two-sample distribution-shift screen per event type: the
    Kolmogorov–Smirnov statistic between the value distributions of
    the first and second half-month, computed as the max
    micro-quantized ECDF gap — the CDF-based companion to
    events_drift_report's total-variation view (TV sees category mix;
    KS sees continuous-value shift). Each half's ECDF is evaluated in
    integer micro-units ((1e6·cum) div N, exact int64, no overflow at
    any N), so the reported statistic is the true KS within 2 micro —
    deterministic cross-engine, unlike a float ECDF.

    Scale shape: values quantize to the 6-digit decimal grid and roll
    up per (type, value) with the two half-counts as conditional sums
    — one fact scan, map-side combined; the cumulative window
    partitions by type over the DISTINCT-value domain, never raw
    rows."""
    ev = load_table(spark, sf_dir, "events")
    split = F.lit(DRIFT_SPLIT).cast("timestamp")
    v_micro = F.expr(
        "CAST(CAST(value AS DECIMAL(25,6)) * 1000000 AS BIGINT)"
    )
    cell = (
        ev.select(
            "event_type",
            v_micro.alias("v"),
            F.when(F.col("ts") < split, 1).otherwise(0).alias("in_first"),
        )
        .groupBy("event_type", "v")
        .agg(
            F.sum("in_first").alias("n1"),
            F.sum(F.lit(1) - F.col("in_first")).alias("n2"),
        )
    )
    w = Window.partitionBy("event_type").orderBy("v").rowsBetween(
        Window.unboundedPreceding, Window.currentRow
    )
    tot = Window.partitionBy("event_type")
    gaps = cell.select(
        "event_type",
        F.sum("n1").over(w).alias("c1"),
        F.sum("n2").over(w).alias("c2"),
        F.sum("n1").over(tot).alias("t1"),
        F.sum("n2").over(tot).alias("t2"),
    ).select(
        "event_type",
        "t1",
        "t2",
        F.abs(
            F.expr("(1000000 * c1) div t1") - F.expr("(1000000 * c2) div t2")
        ).alias("gap_micro"),
    )
    return gaps.groupBy("event_type").agg(
        F.max("t1").cast("bigint").alias("n_first"),
        F.max("t2").cast("bigint").alias("n_second"),
        F.max("gap_micro").cast("bigint").alias("ks_micro"),
    )


register(
    "events_ks_distance",
    f"""
WITH cell AS (
  SELECT event_type,
         CAST(CAST(value AS DECIMAL(25,6)) * 1000000 AS BIGINT) AS v,
         SUM(CASE WHEN ts < TIMESTAMP '{DRIFT_SPLIT}' THEN 1 ELSE 0 END)
           AS n1,
         SUM(CASE WHEN ts < TIMESTAMP '{DRIFT_SPLIT}' THEN 0 ELSE 1 END)
           AS n2
  FROM events
  GROUP BY 1, 2
),
gaps AS (
  SELECT event_type,
         SUM(n1) OVER (PARTITION BY event_type ORDER BY v
                       ROWS BETWEEN UNBOUNDED PRECEDING
                       AND CURRENT ROW) AS c1,
         SUM(n2) OVER (PARTITION BY event_type ORDER BY v
                       ROWS BETWEEN UNBOUNDED PRECEDING
                       AND CURRENT ROW) AS c2,
         SUM(n1) OVER (PARTITION BY event_type) AS t1,
         SUM(n2) OVER (PARTITION BY event_type) AS t2
  FROM cell
)
SELECT event_type,
       CAST(MAX(t1) AS BIGINT) AS n_first,
       CAST(MAX(t2) AS BIGINT) AS n_second,
       CAST(MAX(ABS(CAST((1000000 * c1) // t1 AS BIGINT)
                    - CAST((1000000 * c2) // t2 AS BIGINT))) AS BIGINT)
         AS ks_micro
FROM gaps
GROUP BY event_type
""",
)(events_ks_distance)


def events_daily_metrics_long(spark: SparkSession, sf_dir: str) -> DataFrame:
    """UNPIVOT (wide→long) over the daily operations rollup: the
    per-day wide row (n_events, n_errors, n_users, total_value) turns
    into (day, metric, value_micro) rows via ``stack`` — the
    relational inverse of event_type_pivot and the shape metric
    stores / plotting layers ingest. Counts are carried in micro too
    so the long column has ONE consistent unit.

    Scale shape: one calendar-bounded rollup (map-side combined), then
    a 4× Generate over day-sized rows — the explode happens AFTER
    aggregation, so the wide table is tiny when it fans out."""
    ev = load_table(spark, sf_dir, "events")
    daily = ev.groupBy(F.to_date("ts").alias("day")).agg(
        F.count(F.lit(1)).alias("n_events"),
        F.sum(F.when(F.col("event_type") == "error", 1).otherwise(0)).alias(
            "n_errors"
        ),
        F.countDistinct("user_id").alias("n_users"),
        F.sum(
            F.expr("CAST(CAST(value AS DECIMAL(25,6)) * 1000000 AS BIGINT)")
        ).alias("value_sum_micro"),
    )
    return daily.select(
        "day",
        F.expr(
            "stack(4,"
            " 'n_events', CAST(n_events * 1000000 AS BIGINT),"
            " 'n_errors', CAST(n_errors * 1000000 AS BIGINT),"
            " 'n_users', CAST(n_users * 1000000 AS BIGINT),"
            " 'value_sum_micro', value_sum_micro"
            ") AS (metric, value_micro)"
        ),
    )


register(
    "events_daily_metrics_long",
    """
WITH daily AS (
  SELECT CAST(ts AS DATE) AS day,
         COUNT(*) AS n_events,
         SUM(CASE WHEN event_type = 'error' THEN 1 ELSE 0 END) AS n_errors,
         COUNT(DISTINCT user_id) AS n_users,
         SUM(CAST(CAST(value AS DECIMAL(25,6)) * 1000000 AS BIGINT))
           AS value_sum_micro
  FROM events
  GROUP BY 1
)
SELECT day, metric, CAST(value_micro AS BIGINT) AS value_micro
FROM (
  SELECT day, 'n_events' AS metric, n_events * 1000000 AS value_micro
  FROM daily
  UNION ALL
  SELECT day, 'n_errors', n_errors * 1000000 FROM daily
  UNION ALL
  SELECT day, 'n_users', n_users * 1000000 FROM daily
  UNION ALL
  SELECT day, 'value_sum_micro', value_sum_micro FROM daily
)
""",
)(events_daily_metrics_long)


def events_type_crosscorr(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Cross-correlation between event types: Pearson r between every
    PAIR of types' hourly value series (same-hour inner join) — the
    lead-indicator screen (does view volume co-move with purchase
    volume?) that complements events_hourly_autocorr's within-series
    view. Same determinism contract: series on the DECIMAL(12,6)
    grid, exact sufficient sums, final r a handful of float ops plus
    one IEEE-exact sqrt, degenerate series guarded to NULL.

    Scale shape: ONE fact rollup to type×hours (map-side combine);
    the pair join and sums run over that tiny series (|types|²/2
    pairs × hours). Hours absent for either type drop from that
    pair's sample — identical semantics both engines."""
    ev = load_table(spark, sf_dir, "events")
    hourly = ev.groupBy(
        "event_type", F.date_trunc("hour", "ts").alias("h")
    ).agg(
        F.round(
            F.sum(F.col("value").cast("decimal(25,6)")).cast("double"), 6
        )
        .cast("decimal(12,6)")
        .alias("v")
    )
    a = hourly.select(
        F.col("event_type").alias("type_a"),
        F.col("h").alias("h"),
        F.col("v").alias("x"),
    )
    b = hourly.select(
        F.col("event_type").alias("type_b"),
        F.col("h").alias("hb"),
        F.col("v").alias("y"),
    )
    paired = a.join(
        b,
        (F.col("h") == F.col("hb")) & (F.col("type_a") < F.col("type_b")),
    )
    sums = paired.groupBy("type_a", "type_b").agg(
        F.count(F.lit(1)).alias("n"),
        F.sum("x").alias("sx"),
        F.sum("y").alias("sy"),
        F.sum(F.col("x") * F.col("x")).alias("sxx"),
        F.sum(F.col("y") * F.col("y")).alias("syy"),
        F.sum(F.col("x") * F.col("y")).alias("sxy"),
    )
    n = F.col("n").cast("double")
    sx = F.col("sx").cast("double")
    sy = F.col("sy").cast("double")
    vx = n * F.col("sxx").cast("double") - sx * sx
    vy = n * F.col("syy").cast("double") - sy * sy
    cov = n * F.col("sxy").cast("double") - sx * sy
    return sums.select(
        "type_a",
        "type_b",
        F.col("n").alias("n_hours"),
        F.when((vx > 0) & (vy > 0), F.round(cov / F.sqrt(vx * vy), 9)).alias(
            "crosscorr"
        ),
    )


register(
    "events_type_crosscorr",
    """
WITH hourly AS (
  SELECT event_type, date_trunc('hour', ts) AS h,
         CAST(round(CAST(SUM(CAST(value AS DECIMAL(25,6))) AS DOUBLE), 6)
              AS DECIMAL(12,6)) AS v
  FROM events GROUP BY 1, 2
),
paired AS (
  SELECT a.event_type AS type_a, b.event_type AS type_b,
         CAST(a.v AS DECIMAL(25,6)) AS x,
         CAST(b.v AS DECIMAL(25,6)) AS y
  FROM hourly a JOIN hourly b
    ON a.h = b.h AND a.event_type < b.event_type
)
SELECT type_a, type_b, COUNT(*) AS n_hours,
       CASE WHEN CAST(COUNT(*) AS DOUBLE) * CAST(SUM(x * x) AS DOUBLE)
                 - CAST(SUM(x) AS DOUBLE) * CAST(SUM(x) AS DOUBLE) > 0
             AND CAST(COUNT(*) AS DOUBLE) * CAST(SUM(y * y) AS DOUBLE)
                 - CAST(SUM(y) AS DOUBLE) * CAST(SUM(y) AS DOUBLE) > 0
            THEN round((CAST(COUNT(*) AS DOUBLE) * CAST(SUM(x * y) AS DOUBLE)
                        - CAST(SUM(x) AS DOUBLE) * CAST(SUM(y) AS DOUBLE))
                       / sqrt((CAST(COUNT(*) AS DOUBLE)
                               * CAST(SUM(x * x) AS DOUBLE)
                               - CAST(SUM(x) AS DOUBLE)
                                 * CAST(SUM(x) AS DOUBLE))
                              * (CAST(COUNT(*) AS DOUBLE)
                                 * CAST(SUM(y * y) AS DOUBLE)
                                 - CAST(SUM(y) AS DOUBLE)
                                   * CAST(SUM(y) AS DOUBLE))), 9)
            END AS crosscorr
FROM paired
GROUP BY 1, 2
""",
)(events_type_crosscorr)


EQUIDEPTH_BINS = 10


def events_value_equidepth_bins(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Equi-depth (decile) feature binning per event type — the exact
    quantile-bucketing pass ML feature prep runs (equal-POPULATION
    bins, where equi-width histograms waste buckets on sparse tails).
    Each distinct value's bin is ((cum−1)·{EQUIDEPTH_BINS}) div n + 1
    over the cumulative count — deterministic, ties share a bin, all
    int64. Output per (type, bin): value range, row count, distinct
    values.

    Scale shape: the fact rolls up to per-(type, distinct-value)
    counts once (map-side combine); the cumulative window partitions
    by type over the DISTINCT-value domain (the same count-of-counts
    economics as events_key_skew_report — no fact-sized sort
    anywhere); the bin rollup is ≤ types×{EQUIDEPTH_BINS} rows."""
    ev = load_table(spark, sf_dir, "events")
    v_micro = F.expr(
        "CAST(CAST(value AS DECIMAL(25,6)) * 1000000 AS BIGINT)"
    )
    dist = ev.select("event_type", v_micro.alias("v")).groupBy(
        "event_type", "v"
    ).agg(F.count(F.lit(1)).alias("c"))
    w = Window.partitionBy("event_type").orderBy("v").rowsBetween(
        Window.unboundedPreceding, Window.currentRow
    )
    tot = Window.partitionBy("event_type")
    binned = dist.select(
        "event_type",
        "v",
        "c",
        F.expr(
            f"((SUM(c) OVER (PARTITION BY event_type ORDER BY v"
            f" ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) - c)"
            f" * {EQUIDEPTH_BINS})"
            f" div SUM(c) OVER (PARTITION BY event_type) + 1"
        ).alias("bin"),
    )
    return binned.groupBy("event_type", "bin").agg(
        F.min("v").cast("bigint").alias("lo_micro"),
        F.max("v").cast("bigint").alias("hi_micro"),
        F.sum("c").cast("bigint").alias("n_rows"),
        F.count(F.lit(1)).cast("bigint").alias("n_distinct"),
    )


register(
    "events_value_equidepth_bins",
    f"""
WITH dist AS (
  SELECT event_type,
         CAST(CAST(value AS DECIMAL(25,6)) * 1000000 AS BIGINT) AS v,
         COUNT(*) AS c
  FROM events GROUP BY 1, 2
),
binned AS (
  SELECT event_type, v, c,
         CAST(((SUM(c) OVER (PARTITION BY event_type ORDER BY v
                             ROWS BETWEEN UNBOUNDED PRECEDING
                             AND CURRENT ROW) - c)
               * {EQUIDEPTH_BINS})
              // SUM(c) OVER (PARTITION BY event_type) AS BIGINT) + 1
           AS bin
  FROM dist
)
SELECT event_type, bin,
       CAST(MIN(v) AS BIGINT) AS lo_micro,
       CAST(MAX(v) AS BIGINT) AS hi_micro,
       CAST(SUM(c) AS BIGINT) AS n_rows,
       CAST(COUNT(*) AS BIGINT) AS n_distinct
FROM binned
GROUP BY 1, 2
""",
)(events_value_equidepth_bins)


def events_attribution_last_touch(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Last-touch attribution: every purchase is credited to the
    user's most recent PRECEDING non-purchase event type (the
    marketing-attribution primitive; first-touch and position-decay
    are the same plan with a different window pick). Purchases with
    no preceding touch attribute to 'none'. Output: attributed type ×
    purchase count × share.

    Scale shape: one shuffle keys by user for the ordered window
    (LAST_VALUE ... IGNORE NULLS over the preceding frame — both
    engines implement the same SQL window semantics); the attribution
    rollup is ≤|types|+1 rows and the share is an integer micro
    division over a window total."""
    ev = load_table(spark, sf_dir, "events")
    w = (
        Window.partitionBy("user_id")
        .orderBy("ts", "event_id")
        .rowsBetween(Window.unboundedPreceding, -1)
    )
    touch = F.last(
        F.when(F.col("event_type") != "purchase", F.col("event_type")),
        ignorenulls=True,
    ).over(w)
    attributed = (
        ev.withColumn("touch", touch)
        .filter(F.col("event_type") == "purchase")
        .select(F.coalesce(F.col("touch"), F.lit("none")).alias("touch"))
    )
    counts = attributed.groupBy("touch").agg(
        F.count(F.lit(1)).alias("n_purchases")
    )
    return counts.select(
        "touch",
        F.col("n_purchases").cast("bigint").alias("n_purchases"),
        F.expr(
            "CAST((1000000 * n_purchases)"
            " div SUM(n_purchases) OVER () AS BIGINT)"
        ).alias("share_micro"),
    )


register(
    "events_attribution_last_touch",
    """
WITH touched AS (
  SELECT event_type,
         LAST_VALUE(CASE WHEN event_type <> 'purchase'
                         THEN event_type END IGNORE NULLS)
           OVER (PARTITION BY user_id ORDER BY ts, event_id
                 ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING)
           AS touch
  FROM events
),
counts AS (
  SELECT COALESCE(touch, 'none') AS touch, COUNT(*) AS n_purchases
  FROM touched
  WHERE event_type = 'purchase'
  GROUP BY 1
)
SELECT touch,
       CAST(n_purchases AS BIGINT) AS n_purchases,
       CAST((1000000 * n_purchases) // SUM(n_purchases) OVER () AS BIGINT)
         AS share_micro
FROM counts
""",
)(events_attribution_last_touch)


def events_user_streaks(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Longest consecutive-day activity streak per user — the
    gaps-and-islands pattern (island id = day_number −
    dense_rank-over-days, constant within a consecutive run) that
    powers engagement streak features. Output per user: active days,
    longest streak, number of distinct streaks.

    Scale shape: distinct (user, day) first (map-side combined — the
    fact collapses to at most users×days rows before any window);
    both windows partition by user; the island rollup reuses the same
    partitioning. All integer date arithmetic."""
    ev = load_table(spark, sf_dir, "events")
    days = ev.select(
        "user_id", F.to_date("ts").alias("d")
    ).distinct()
    w = Window.partitionBy("user_id").orderBy("d")
    islands = days.select(
        "user_id",
        "d",
        (
            F.datediff(F.col("d"), F.lit("2024-01-01").cast("date"))
            - F.row_number().over(w)
        ).alias("island"),
    )
    streaks = islands.groupBy("user_id", "island").agg(
        F.count(F.lit(1)).alias("len")
    )
    return streaks.groupBy("user_id").agg(
        F.sum("len").cast("bigint").alias("n_active_days"),
        F.max("len").cast("bigint").alias("longest_streak"),
        F.count(F.lit(1)).cast("bigint").alias("n_streaks"),
    )


register(
    "events_user_streaks",
    """
WITH days AS (
  SELECT DISTINCT user_id, CAST(ts AS DATE) AS d FROM events
),
islands AS (
  SELECT user_id, d,
         datediff('day', DATE '2024-01-01', d)
           - row_number() OVER (PARTITION BY user_id ORDER BY d) AS island
  FROM days
),
streaks AS (
  SELECT user_id, island, COUNT(*) AS len
  FROM islands GROUP BY 1, 2
)
SELECT user_id,
       CAST(SUM(len) AS BIGINT) AS n_active_days,
       CAST(MAX(len) AS BIGINT) AS longest_streak,
       CAST(COUNT(*) AS BIGINT) AS n_streaks
FROM streaks
GROUP BY user_id
""",
)(events_user_streaks)


HLL_BUCKETS = 64
HLL_RHO_NIBBLES = 8  # scan 8 hex digits after the bucket pair; cap rho at 33
_HLL_HEX = "0123456789abcdef"


def _hll_rho_case(instr_fn: str) -> str:
    """Portable rho (leading-zero-bits + 1) over the md5 nibbles after
    the bucket pair — a nested CASE both engines evaluate identically.
    ``instr_fn`` is 'instr' (Spark) or 'strpos' (DuckDB)."""
    def lz(pos: int) -> str:
        d = f"({instr_fn}('{_HLL_HEX}', substr(h, {pos}, 1)) - 1)"
        return (
            f"CASE WHEN {d} >= 8 THEN 0 WHEN {d} >= 4 THEN 1"
            f" WHEN {d} >= 2 THEN 2 WHEN {d} >= 1 THEN 3 ELSE 4 END"
        )

    branches = []
    for i in range(HLL_RHO_NIBBLES):
        pos = 3 + i  # nibbles 3..10 of the hex digest
        branches.append(
            f"WHEN substr(h, {pos}, 1) <> '0'"
            f" THEN {i * 4 + 1} + {lz(pos)}"
        )
    return "CASE " + " ".join(branches) + f" ELSE {HLL_RHO_NIBBLES * 4 + 1} END"


def events_hll_registers(spark: SparkSession, sf_dir: str) -> DataFrame:
    """The HyperLogLog REGISTER TABLE per event type, hash-checked:
    bucket = first md5 byte mod {HLL_BUCKETS}, register = max(rho)
    where rho is leading-zero-bits+1 of the following nibbles. The
    registers — not the harmonic-mean estimate — are the output, for
    two reasons: they are exactly the mergeable state a distributed /
    streaming distinct-count maintains (max is commutative,
    associative, idempotent — any partitioning, any arrival order,
    same table), and they are pure integers, so the sketch CONTENT
    sits under the oracle hash while the float estimate could not.
    stream_hll_registers runs the identical sketch as streaming state.

    Scale shape: one scan, per-row constant hashing, one
    (type × bucket ≤ types·{HLL_BUCKETS}) rollup — map-side combined;
    this is the bounded-state form of COUNT(DISTINCT) at 100 TB."""
    ev = load_table(spark, sf_dir, "events").select("event_type", "user_id")
    h = ev.withColumn(
        "h", F.md5(F.col("user_id").cast("string").cast("binary"))
    )
    bucket = F.expr(
        f"((instr('{_HLL_HEX}', substr(h, 1, 1)) - 1) * 16"
        f" + (instr('{_HLL_HEX}', substr(h, 2, 1)) - 1)) % {HLL_BUCKETS}"
    )
    rho = F.expr(_hll_rho_case("instr"))
    return (
        h.select("event_type", bucket.alias("bucket"), rho.alias("rho"))
        .groupBy("event_type", "bucket")
        .agg(F.max("rho").alias("register"))
        .select(
            "event_type",
            F.col("bucket").cast("int").alias("bucket"),
            F.col("register").cast("int").alias("register"),
        )
    )


def _hll_oracle() -> str:
    rho = _hll_rho_case("strpos")
    return f"""
WITH hashed AS (
  SELECT event_type, md5(CAST(user_id AS VARCHAR)) AS h FROM events
),
scored AS (
  SELECT event_type,
         ((strpos('{_HLL_HEX}', substr(h, 1, 1)) - 1) * 16
          + (strpos('{_HLL_HEX}', substr(h, 2, 1)) - 1)) % {HLL_BUCKETS}
           AS bucket,
         {rho} AS rho
  FROM hashed
)
SELECT event_type, CAST(bucket AS INT) AS bucket,
       CAST(MAX(rho) AS INT) AS register
FROM scored
GROUP BY 1, 2
"""


register("events_hll_registers", _hll_oracle())(events_hll_registers)


def events_hll_daily_rollup(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Sketch re-aggregation, proven in-query: build PER-DAY HLL
    register tables, merge them with an elementwise max, and assert
    the merged table equals the direct whole-period sketch before
    returning it — the pre-aggregated-cube pattern that makes
    COUNT(DISTINCT) serveable at 100 TB (store daily sketches, merge
    any date range on demand; exact distinct cannot re-aggregate,
    sketches can). A failed merge (any register differing) raises
    rather than returning, so the driver hash additionally certifies
    the merge path end-to-end.

    Scale shape: one scan builds the (type × day × bucket) table —
    map-side combined; the merge is a second tiny rollup; the
    equality check joins two ≤types×{HLL_BUCKETS} tables."""
    ev = load_table(spark, sf_dir, "events").select(
        "event_type", "user_id", F.to_date("ts").alias("day")
    )
    h = ev.withColumn(
        "h", F.md5(F.col("user_id").cast("string").cast("binary"))
    )
    bucket = F.expr(
        f"((instr('{_HLL_HEX}', substr(h, 1, 1)) - 1) * 16"
        f" + (instr('{_HLL_HEX}', substr(h, 2, 1)) - 1)) % {HLL_BUCKETS}"
    )
    rho = F.expr(_hll_rho_case("instr"))
    scored = h.select(
        "event_type", "day", bucket.alias("bucket"), rho.alias("rho")
    )
    daily = scored.groupBy("event_type", "day", "bucket").agg(
        F.max("rho").alias("register")
    )
    merged = daily.groupBy("event_type", "bucket").agg(
        F.max("register").alias("register")
    )
    direct = scored.groupBy("event_type", "bucket").agg(
        F.max("rho").alias("register")
    )
    n_mismatch = (
        merged.join(direct, ["event_type", "bucket"], "full_outer")
        .filter(
            ~(merged["register"].eqNullSafe(direct["register"]))
        )
        .count()
    )
    if n_mismatch != 0:
        raise AssertionError(
            f"daily-sketch merge diverged from the direct sketch on "
            f"{n_mismatch} registers"
        )
    return merged.select(
        "event_type",
        F.col("bucket").cast("int").alias("bucket"),
        F.col("register").cast("int").alias("register"),
    )


def _register_hll_daily() -> None:
    from smart_meter_data_pipeline_spark.plans.registry import ORACLES

    register("events_hll_daily_rollup", ORACLES["events_hll_registers"])(
        events_hll_daily_rollup
    )


_register_hll_daily()


def events_welch_ttest(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Welch's two-sample t statistic for the mean value shift between
    the two half-months, per event type — the significance companion
    to the distance-based drift screens (TV sees mix shift, KS sees
    distribution shift; Welch says whether the MEAN moved beyond
    sampling noise, without assuming equal variances).

    Determinism contract (same as events_hourly_autocorr): the five
    sufficient sums per side are exact decimals off the value column;
    the t statistic is a fixed sequence of float ops plus one
    IEEE-correctly-rounded sqrt, rounded at 9; degenerate sides
    (n < 2 or zero variance both sides) emit NULL.

    Scale shape: ONE fact scan with the side flag folded into the
    conditional sums (map-side combined, |types| output rows); no
    join, no window, no second pass."""
    ev = load_table(spark, sf_dir, "events")
    split = F.lit(DRIFT_SPLIT).cast("timestamp")
    in_first = F.when(F.col("ts") < split, 1).otherwise(0)
    v = F.col("value").cast("decimal(25,6)")
    sums = ev.groupBy("event_type").agg(
        F.sum(in_first).alias("n1"),
        F.sum(F.lit(1) - in_first).alias("n2"),
        F.sum(v * in_first).alias("s1"),
        F.sum(v * (F.lit(1) - in_first)).alias("s2"),
        F.sum(v * v * in_first).alias("q1"),
        F.sum(v * v * (F.lit(1) - in_first)).alias("q2"),
    )
    n1 = F.col("n1").cast("double")
    n2 = F.col("n2").cast("double")
    s1 = F.col("s1").cast("double")
    s2 = F.col("s2").cast("double")
    q1 = F.col("q1").cast("double")
    q2 = F.col("q2").cast("double")
    var1 = (q1 - s1 * s1 / n1) / (n1 - 1)
    var2 = (q2 - s2 * s2 / n2) / (n2 - 1)
    se2 = var1 / n1 + var2 / n2
    t = (s1 / n1 - s2 / n2) / F.sqrt(se2)
    return sums.select(
        "event_type",
        F.col("n1").cast("bigint").alias("n_first"),
        F.col("n2").cast("bigint").alias("n_second"),
        F.when(
            (F.col("n1") > 1) & (F.col("n2") > 1) & (se2 > 0),
            F.round(t, 9),
        ).alias("t_stat"),
    )


register(
    "events_welch_ttest",
    f"""
WITH sums AS (
  SELECT event_type,
         SUM(CASE WHEN ts < TIMESTAMP '{DRIFT_SPLIT}' THEN 1 ELSE 0 END)
           AS n1,
         SUM(CASE WHEN ts < TIMESTAMP '{DRIFT_SPLIT}' THEN 0 ELSE 1 END)
           AS n2,
         SUM(CAST(value AS DECIMAL(25,6))
             * CASE WHEN ts < TIMESTAMP '{DRIFT_SPLIT}' THEN 1 ELSE 0 END)
           AS s1,
         SUM(CAST(value AS DECIMAL(25,6))
             * CASE WHEN ts < TIMESTAMP '{DRIFT_SPLIT}' THEN 0 ELSE 1 END)
           AS s2,
         SUM(CAST(CAST(value AS DECIMAL(25,6))
                  * CAST(value AS DECIMAL(25,6)) AS DECIMAL(38,12))
             * CASE WHEN ts < TIMESTAMP '{DRIFT_SPLIT}' THEN 1 ELSE 0 END)
           AS q1,
         SUM(CAST(CAST(value AS DECIMAL(25,6))
                  * CAST(value AS DECIMAL(25,6)) AS DECIMAL(38,12))
             * CASE WHEN ts < TIMESTAMP '{DRIFT_SPLIT}' THEN 0 ELSE 1 END)
           AS q2
  FROM events
  GROUP BY 1
)
SELECT event_type,
       CAST(n1 AS BIGINT) AS n_first,
       CAST(n2 AS BIGINT) AS n_second,
       CASE WHEN n1 > 1 AND n2 > 1
             AND (CAST(q1 AS DOUBLE)
                  - CAST(s1 AS DOUBLE) * CAST(s1 AS DOUBLE)
                    / CAST(n1 AS DOUBLE)) / (CAST(n1 AS DOUBLE) - 1)
                 / CAST(n1 AS DOUBLE)
               + (CAST(q2 AS DOUBLE)
                  - CAST(s2 AS DOUBLE) * CAST(s2 AS DOUBLE)
                    / CAST(n2 AS DOUBLE)) / (CAST(n2 AS DOUBLE) - 1)
                 / CAST(n2 AS DOUBLE) > 0
            THEN round((CAST(s1 AS DOUBLE) / CAST(n1 AS DOUBLE)
                        - CAST(s2 AS DOUBLE) / CAST(n2 AS DOUBLE))
                       / sqrt((CAST(q1 AS DOUBLE)
                               - CAST(s1 AS DOUBLE) * CAST(s1 AS DOUBLE)
                                 / CAST(n1 AS DOUBLE))
                              / (CAST(n1 AS DOUBLE) - 1)
                              / CAST(n1 AS DOUBLE)
                              + (CAST(q2 AS DOUBLE)
                                 - CAST(s2 AS DOUBLE) * CAST(s2 AS DOUBLE)
                                   / CAST(n2 AS DOUBLE))
                                / (CAST(n2 AS DOUBLE) - 1)
                                / CAST(n2 AS DOUBLE)), 9)
            END AS t_stat
FROM sums
""",
)(events_welch_ttest)


# Behavioral archetypes over the 24-hour activity profile, in micro
# shares (each sums to 1e6): the "model" of a serving-only segmentation
# — in production these come from an offline clustering; fixed literals
# keep the operator deterministic while exercising the identical plan.
ARCHETYPES = {
    "early_bird": [
        83334 if 5 <= h < 11 else 20833 for h in range(24)
    ],
    "night_owl": [
        83334 if (h >= 19 or h < 1) else 20833 for h in range(24)
    ],
    "uniform": [41667] * 24,
}


def events_user_archetypes(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Serving-only behavioral segmentation: each user's 24-hour
    activity share profile is assigned to its nearest archetype
    (early-bird / night-owl / uniform) by squared distance in integer
    micro-units — the nearest-centroid SERVE path of a behavioral
    clustering, run entirely with built-in expressions (the archetype
    table is a broadcast literal frame; in production it is the
    offline model artifact, same plan). Ties break to the
    lexicographically first archetype. Output: archetype × user count
    × mean distance.

    Scale shape: one (user, hour) rollup (map-side combined) → join
    the 72-row archetype frame (broadcast) → per-user distance sums
    reusing the user keying → argmin via aggregate struct-min → a
    3-row rollup. Missing hours contribute the archetype share
    squared, handled by summing over the ARCHETYPE frame side (every
    (user, hour) cell exists after the outer expansion)."""
    ev = load_table(spark, sf_dir, "events")
    per_uh = ev.groupBy(
        "user_id", F.hour("ts").alias("h")
    ).agg(F.count(F.lit(1)).alias("c"))
    totals = per_uh.groupBy("user_id").agg(F.sum("c").alias("n"))
    arch_rows = [
        (name, h, share)
        for name, prof in sorted(ARCHETYPES.items())
        for h, share in enumerate(prof)
    ]
    arch = spark.createDataFrame(
        arch_rows, ["archetype", "h", "arch_micro"]
    )
    # outer-expand: every (user, archetype, hour) cell — users missing
    # an hour contribute (0 - arch_micro)^2 for it
    cells = (
        totals.crossJoin(F.broadcast(arch))
        .join(per_uh, ["user_id", "h"], "left")
        .select(
            "user_id",
            "archetype",
            (
                (
                    F.expr(
                        "(1000000 * coalesce(c, 0)) div n"
                    )
                    - F.col("arch_micro")
                )
            ).alias("diff"),
        )
    )
    dists = cells.groupBy("user_id", "archetype").agg(
        F.sum(F.col("diff") * F.col("diff")).alias("d2")
    )
    best = (
        dists.groupBy("user_id")
        .agg(
            F.min(F.struct(F.col("d2"), F.col("archetype"))).alias("b")
        )
        .select(
            "user_id",
            F.col("b.archetype").alias("archetype"),
            F.col("b.d2").alias("d2"),
        )
    )
    return best.groupBy("archetype").agg(
        F.count(F.lit(1)).cast("bigint").alias("n_users"),
        F.expr("CAST(SUM(d2) div COUNT(1) AS BIGINT)").alias("mean_d2"),
    )


def _archetype_oracle() -> str:
    rows = ",\n    ".join(
        f"('{name}', {h}, {share})"
        for name, prof in sorted(ARCHETYPES.items())
        for h, share in enumerate(prof)
    )
    return f"""
WITH arch(archetype, h, arch_micro) AS (
  SELECT * FROM (VALUES
    {rows}
  )
),
per_uh AS (
  SELECT user_id, hour(ts) AS h, COUNT(*) AS c
  FROM events GROUP BY 1, 2
),
totals AS (SELECT user_id, SUM(c) AS n FROM per_uh GROUP BY 1),
cells AS (
  SELECT t.user_id, a.archetype,
         CAST((1000000 * COALESCE(p.c, 0)) // t.n AS BIGINT)
           - a.arch_micro AS diff
  FROM totals t
  CROSS JOIN arch a
  LEFT JOIN per_uh p ON p.user_id = t.user_id AND p.h = a.h
),
dists AS (
  SELECT user_id, archetype, SUM(diff * diff) AS d2
  FROM cells GROUP BY 1, 2
),
best AS (
  SELECT user_id, archetype, d2 FROM (
    SELECT *, row_number() OVER (PARTITION BY user_id
                                 ORDER BY d2, archetype) AS rn
    FROM dists
  ) WHERE rn = 1
)
SELECT archetype,
       CAST(COUNT(*) AS BIGINT) AS n_users,
       CAST(SUM(d2) // COUNT(*) AS BIGINT) AS mean_d2
FROM best
GROUP BY archetype
"""


register("events_user_archetypes", _archetype_oracle())(events_user_archetypes)


# ---------------------------------------------------------------------------
# Experiment assignment + sample-ratio-mismatch audit
# ---------------------------------------------------------------------------


def events_ab_assignment_srm(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Deterministic 50/50 experiment assignment + the sample-ratio-
    mismatch (SRM) audit every A/B platform runs before trusting a
    readout: users land in arm A/B by the parity of their first
    md5 nibble (portable, sticky, no rand()), and the audit computes
    the exact one-degree-of-freedom chi-square statistic for the
    50/50 design in micro-units — with exp = n/2 the statistic
    collapses to (2·n_A − n)²/n, so it is PURE integer arithmetic
    (no transcendental, hash-safe). chi2_micro > 3,841,459 (the 0.95
    quantile in micro-units) would flag assignment corruption.

    Per arm: distinct users, event volume, exact-decimal value sum —
    the balance columns a triggered-analysis readout starts from.

    Scale shape: one events scan → per-user rollup (map-side
    combined), then a 2-row arm rollup; the chi-square rides the
    2-row frame via a scalar crossJoin."""
    ev = load_table(spark, sf_dir, "events").select("user_id", "value")
    arm = F.expr(
        "CASE WHEN (instr('0123456789abcdef',"
        " substr(md5(CAST(CAST(user_id AS STRING) AS BINARY)), 1, 1)) - 1)"
        " % 2 = 0 THEN 'A' ELSE 'B' END"
    )
    per_user = (
        ev.withColumn("arm", arm)
        .groupBy("arm", "user_id")
        .agg(
            F.count(F.lit(1)).alias("n_events"),
            F.sum(F.col("value").cast("decimal(25,6)")).alias("value_sum"),
        )
    )
    arms = per_user.groupBy("arm").agg(
        F.count(F.lit(1)).alias("n_users"),
        F.sum("n_events").alias("n_events"),
        F.sum("value_sum").cast("double").alias("value_sum"),
    )
    totals = arms.agg(
        F.sum("n_users").alias("n_total"),
        F.max(F.when(F.col("arm") == "A", F.col("n_users"))).alias("n_a"),
    )
    return (
        arms.crossJoin(F.broadcast(totals))
        .select(
            "arm",
            F.col("n_users").cast("bigint").alias("n_users"),
            F.col("n_events").cast("bigint").alias("n_events"),
            "value_sum",
            F.expr(
                "(1000000 * (2 * n_a - n_total) * (2 * n_a - n_total))"
                " div n_total"
            )
            .cast("bigint")
            .alias("srm_chi2_micro"),
        )
    )


register(
    "events_ab_assignment_srm",
    """
WITH per_user AS (
  SELECT CASE WHEN (strpos('0123456789abcdef',
                           substr(md5(CAST(user_id AS VARCHAR)), 1, 1)) - 1)
                   % 2 = 0 THEN 'A' ELSE 'B' END AS arm,
         user_id,
         COUNT(*) AS n_events,
         SUM(CAST(value AS DECIMAL(25,6))) AS value_sum
  FROM events GROUP BY 1, 2
),
arms AS (
  SELECT arm, COUNT(*) AS n_users, SUM(n_events) AS n_events,
         CAST(SUM(value_sum) AS DOUBLE) AS value_sum
  FROM per_user GROUP BY 1
),
totals AS (
  SELECT SUM(n_users) AS n_total,
         MAX(CASE WHEN arm = 'A' THEN n_users END) AS n_a
  FROM arms
)
SELECT arm,
       CAST(n_users AS BIGINT) AS n_users,
       CAST(n_events AS BIGINT) AS n_events,
       value_sum,
       CAST((1000000 * (2 * n_a - n_total) * (2 * n_a - n_total))
            // n_total AS BIGINT) AS srm_chi2_micro
FROM arms, totals
""",
)(events_ab_assignment_srm)


# ---------------------------------------------------------------------------
# Two-way chi-square independence test (type × hour)
# ---------------------------------------------------------------------------

# Per-cell ratio grid: 1e8 keeps the floor-quantization error of the
# whole statistic under ~cells·n/1e8 (≈ 0.12 chi2 units at sf0.1)
# while every intermediate stays far inside int64.
_CHI2_GRID = 10**8


def events_type_hour_independence_chi2(
    spark: SparkSession, sf_dir: str
) -> DataFrame:
    """Pearson chi-square test of INDEPENDENCE between event type and
    hour-of-day — the two-way companion of the one-way uniformity
    test (orders_dow_uniformity_chi2): does traffic mix shift by hour
    (chi2 ≫ critical at df=(r−1)(c−1)) or is the type share
    hour-invariant? Uses the algebraic identity
    chi2 = n·(Σ_ij n_ij²/(r_i·c_j) − 1), whose per-cell ratio is
    bounded by 1 — so the whole statistic is EXACT integer arithmetic
    on a 1e8 grid (no transcendental, no decimal division), identical
    in both engines by construction; quantization bias is
    deterministic and < 1 chi2 unit at bench scales.

    Scale shape: one scan → (type × hour ≤ r·24)-cell rollup with
    map-side combine; marginals derive from the CELLS (window-free
    rollups over ≤ r·24 rows), never a second scan."""
    ev = load_table(spark, sf_dir, "events").select(
        "event_type", F.hour("ts").alias("hr")
    )
    cells = ev.groupBy("event_type", "hr").agg(
        F.count(F.lit(1)).alias("n_ij")
    )
    rows_m = cells.groupBy("event_type").agg(F.sum("n_ij").alias("r_i"))
    cols_m = cells.groupBy("hr").agg(F.sum("n_ij").alias("c_j"))
    n_tot = cells.agg(F.sum("n_ij").alias("n"))
    s = (
        cells.join(rows_m, "event_type")
        .join(F.broadcast(cols_m), "hr")
        .select(
            F.expr(
                f"(CAST({_CHI2_GRID} AS BIGINT) * n_ij * n_ij)"
                " div (r_i * c_j)"
            ).alias("cell")
        )
        .agg(F.sum("cell").alias("s_grid"))
    )
    return (
        s.crossJoin(F.broadcast(n_tot))
        .crossJoin(
            F.broadcast(
                rows_m.agg(F.count(F.lit(1)).alias("n_types"))
            )
        )
        .crossJoin(
            F.broadcast(cols_m.agg(F.count(F.lit(1)).alias("n_hours")))
        )
        .select(
            F.col("n").cast("bigint").alias("n_events"),
            F.col("n_types").cast("bigint").alias("n_types"),
            F.col("n_hours").cast("bigint").alias("n_hours"),
            ((F.col("n_types") - 1) * (F.col("n_hours") - 1))
            .cast("bigint")
            .alias("df"),
            F.expr(
                f"(1000 * n * greatest(s_grid - CAST({_CHI2_GRID} AS BIGINT),"
                f" CAST(0 AS BIGINT))) div CAST({_CHI2_GRID} AS BIGINT)"
            )
            .cast("bigint")
            .alias("chi2_milli"),
        )
    )


register(
    "events_type_hour_independence_chi2",
    f"""
WITH cells AS (
  SELECT event_type, EXTRACT(hour FROM ts) AS hr, COUNT(*) AS n_ij
  FROM events GROUP BY 1, 2
),
rows_m AS (SELECT event_type, SUM(n_ij) AS r_i FROM cells GROUP BY 1),
cols_m AS (SELECT hr, SUM(n_ij) AS c_j FROM cells GROUP BY 1),
tot AS (SELECT SUM(n_ij) AS n FROM cells),
s AS (
  SELECT SUM(CAST(({_CHI2_GRID} * n_ij * n_ij) // (r_i * c_j) AS BIGINT))
           AS s_grid
  FROM cells c JOIN rows_m r ON c.event_type = r.event_type
  JOIN cols_m m ON c.hr = m.hr
)
SELECT CAST(n AS BIGINT) AS n_events,
       CAST((SELECT COUNT(*) FROM rows_m) AS BIGINT) AS n_types,
       CAST((SELECT COUNT(*) FROM cols_m) AS BIGINT) AS n_hours,
       CAST(((SELECT COUNT(*) FROM rows_m) - 1)
            * ((SELECT COUNT(*) FROM cols_m) - 1) AS BIGINT) AS df,
       CAST((1000 * n * greatest(s_grid - {_CHI2_GRID}, 0)) // {_CHI2_GRID} AS BIGINT)
         AS chi2_milli
FROM s, tot
""",
)(events_type_hour_independence_chi2)


# ---------------------------------------------------------------------------
# Per-user automation (bot) screening
# ---------------------------------------------------------------------------

BOT_MIN_GAPS = 5
BOT_CV_MAX = "0.5"  # same literal string in both engines
BOT_MEAN_GAP_MAX_S = 60 * 60  # fast cadence: mean gap under an hour


def events_bot_score(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Per-user automation screening — the trust-and-safety twin of
    ``events_interarrival_stats``: a bot emits events at a fast AND
    unnaturally regular cadence, so the screen is (mean inter-arrival
    below {BOT_MEAN_GAP_MAX_S}s) AND (coefficient of variation of the
    gaps below {BOT_CV_MAX} — humans are bursty, cron jobs are not).

    Determinism contract: gaps are exact integer seconds; the CV
    simplifies to sqrt(n·Σg² − (Σg)²)/Σg — one IEEE sqrt over an
    exact integer, one division, rounded at 9 (the welch shape); the
    flag compares the UNROUNDED double against the same literal in
    both engines. Degenerate users (zero gap sum) emit NULL cv and
    never flag.

    Scale shape: one user-partitioned LAG pass (the sessionization
    exchange), then a per-user rollup of integer sufficient sums —
    no second scan, no joins, output one row per active user."""
    ev = load_table(spark, sf_dir, "events")
    w = Window.partitionBy("user_id").orderBy("ts", "event_id")
    gaps = (
        ev.select(
            "user_id",
            F.expr("CAST(floor(unix_timestamp(ts)) AS BIGINT)").alias("t"),
            "ts",
            "event_id",
        )
        .withColumn("gap_s", F.col("t") - F.lag("t").over(w))
    )
    stats = gaps.groupBy("user_id").agg(
        F.count(F.lit(1)).alias("n_events"),
        F.sum(F.when(F.col("gap_s").isNotNull(), 1).otherwise(0)).alias(
            "n_gaps"
        ),
        F.sum("gap_s").alias("sum_gap_s"),
        F.sum(F.col("gap_s") * F.col("gap_s")).alias("sum_gap2"),
    )
    nd = F.col("n_gaps").cast("double")
    sd = F.col("sum_gap_s").cast("double")
    qd = F.col("sum_gap2").cast("double")
    cv = F.sqrt(nd * qd - sd * sd) / sd
    mean_gap = F.expr("sum_gap_s div n_gaps")
    return (
        stats.filter(F.col("n_gaps") >= BOT_MIN_GAPS)
        .select(
            "user_id",
            F.col("n_events").cast("bigint").alias("n_events"),
            F.col("n_gaps").cast("bigint").alias("n_gaps"),
            F.col("sum_gap_s").cast("bigint").alias("sum_gap_s"),
            mean_gap.cast("bigint").alias("mean_gap_s"),
            F.when(F.col("sum_gap_s") > 0, F.round(cv, 9)).alias("gap_cv"),
            (
                (mean_gap < F.lit(BOT_MEAN_GAP_MAX_S))
                & F.coalesce(
                    F.when(F.col("sum_gap_s") > 0, cv)
                    < F.expr(f"CAST({BOT_CV_MAX} AS DOUBLE)"),
                    F.lit(False),
                )
            ).alias("bot_suspect"),
        )
    )


register(
    "events_bot_score",
    f"""
WITH seq AS (
  SELECT user_id,
         CAST(floor(epoch(ts)) AS BIGINT)
           - LAG(CAST(floor(epoch(ts)) AS BIGINT))
             OVER (PARTITION BY user_id ORDER BY ts, event_id) AS gap_s
  FROM events
),
stats AS (
  SELECT user_id, COUNT(*) AS n_events,
         SUM(CASE WHEN gap_s IS NOT NULL THEN 1 ELSE 0 END) AS n_gaps,
         SUM(gap_s) AS sum_gap_s,
         SUM(gap_s * gap_s) AS sum_gap2
  FROM seq GROUP BY 1
)
SELECT user_id,
       CAST(n_events AS BIGINT) AS n_events,
       CAST(n_gaps AS BIGINT) AS n_gaps,
       CAST(sum_gap_s AS BIGINT) AS sum_gap_s,
       CAST(CAST(sum_gap_s // n_gaps AS BIGINT) AS BIGINT) AS mean_gap_s,
       CASE WHEN sum_gap_s > 0
            THEN round(sqrt(CAST(n_gaps AS DOUBLE) * CAST(sum_gap2 AS DOUBLE)
                            - CAST(sum_gap_s AS DOUBLE)
                              * CAST(sum_gap_s AS DOUBLE))
                       / CAST(sum_gap_s AS DOUBLE), 9) END AS gap_cv,
       (CAST(sum_gap_s // n_gaps AS BIGINT) < {BOT_MEAN_GAP_MAX_S}
        AND COALESCE(
          CASE WHEN sum_gap_s > 0
               THEN sqrt(CAST(n_gaps AS DOUBLE) * CAST(sum_gap2 AS DOUBLE)
                         - CAST(sum_gap_s AS DOUBLE)
                           * CAST(sum_gap_s AS DOUBLE))
                    / CAST(sum_gap_s AS DOUBLE) END
          < CAST({BOT_CV_MAX} AS DOUBLE), FALSE)) AS bot_suspect
FROM stats
WHERE n_gaps >= {BOT_MIN_GAPS}
""",
)(events_bot_score)


# ---------------------------------------------------------------------------
# Rolling Bollinger-band breakouts
# ---------------------------------------------------------------------------

BOLL_LOOKBACK = 23  # band from the 23 preceding observations
BOLL_WIDTH = "2.0"  # ±2σ, same literal both engines


def events_bollinger_breakouts(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Rolling Bollinger-band breakout screen: each event is compared
    against mean ± {BOLL_WIDTH}·σ of the {BOLL_LOOKBACK} PRECEDING
    values of its type (history only — the observation never sits
    inside its own band), and breakouts are counted per (type, day).
    The rolling-volatility complement to the fixed-split z-score and
    EWMA screens: the band adapts to local variance, so a level shift
    flags immediately while a slowly-trending series does not.

    Determinism: the rolling Σv and Σv² are EXACT decimal window sums
    (the frame is a row-count frame, identical in both engines —
    order pinned by (ts, event_id)); mean/σ/band are a fixed-shape
    double expression over those exact sums with one IEEE sqrt;
    windows shorter than {BOLL_LOOKBACK} or with non-positive
    variance evaluate to 'no breakout'. Output is pure integers.

    Scale shape: one scan, one per-type ordered window (bounded
    |types|-way parallelism, the CUSUM/runs-test shape), one
    (type × day) rollup."""
    ev = load_table(spark, sf_dir, "events")
    w = (
        Window.partitionBy("event_type")
        .orderBy("ts", "event_id")
        .rowsBetween(-BOLL_LOOKBACK, -1)
    )
    v = F.col("value").cast("decimal(25,6)")
    v2 = (v * v).cast("decimal(38,12)")
    framed = ev.select(
        "event_type",
        F.to_date("ts").alias("day"),
        "value",
        F.count(F.lit(1)).over(w).alias("n"),
        F.sum(v).over(w).alias("s"),
        F.sum(v2).over(w).alias("q"),
    )
    # greatest() guards keep ANSI division happy on short windows
    # (n=0/1); those rows are excluded by the full-window flag anyway,
    # and the guard is written identically in the oracle.
    nd = F.greatest(F.col("n").cast("double"), F.lit(1.0))
    sd = F.col("s").cast("double")
    qd = F.col("q").cast("double")
    mean = sd / nd
    var = (qd - sd * sd / nd) / F.greatest(nd - F.lit(1.0), F.lit(1.0))
    band = F.expr(f"CAST({BOLL_WIDTH} AS DOUBLE)") * F.sqrt(var)
    full = F.col("n") == BOLL_LOOKBACK
    ok = full & (var > 0)
    return (
        framed.groupBy("event_type", "day")
        .agg(
            F.sum(F.when(ok & (F.col("value") > mean + band), 1).otherwise(0))
            .cast("bigint")
            .alias("breakouts_up"),
            F.sum(F.when(ok & (F.col("value") < mean - band), 1).otherwise(0))
            .cast("bigint")
            .alias("breakouts_down"),
            F.sum(F.when(ok, 1).otherwise(0))
            .cast("bigint")
            .alias("n_evaluated"),
        )
    )


register(
    "events_bollinger_breakouts",
    f"""
WITH framed AS (
  SELECT event_type, CAST(ts AS DATE) AS day, value,
         COUNT(*) OVER w AS n,
         SUM(CAST(value AS DECIMAL(25,6))) OVER w AS s,
         SUM(CAST(CAST(value AS DECIMAL(25,6))
                  * CAST(value AS DECIMAL(25,6)) AS DECIMAL(38,12)))
           OVER w AS q
  FROM events
  WINDOW w AS (PARTITION BY event_type ORDER BY ts, event_id
               ROWS BETWEEN {BOLL_LOOKBACK} PRECEDING AND 1 PRECEDING)
)
SELECT event_type, day,
       CAST(SUM(CASE WHEN n = {BOLL_LOOKBACK}
                      AND (CAST(q AS DOUBLE)
                           - CAST(s AS DOUBLE) * CAST(s AS DOUBLE)
                             / GREATEST(CAST(n AS DOUBLE), 1.0))
                          / GREATEST(CAST(n AS DOUBLE) - 1.0, 1.0) > 0
                      AND value > CAST(s AS DOUBLE) / GREATEST(CAST(n AS DOUBLE), 1.0)
                          + CAST({BOLL_WIDTH} AS DOUBLE)
                            * sqrt((CAST(q AS DOUBLE)
                                    - CAST(s AS DOUBLE) * CAST(s AS DOUBLE)
                                      / GREATEST(CAST(n AS DOUBLE), 1.0))
                                   / GREATEST(CAST(n AS DOUBLE) - 1.0, 1.0))
                     THEN 1 ELSE 0 END) AS BIGINT) AS breakouts_up,
       CAST(SUM(CASE WHEN n = {BOLL_LOOKBACK}
                      AND (CAST(q AS DOUBLE)
                           - CAST(s AS DOUBLE) * CAST(s AS DOUBLE)
                             / GREATEST(CAST(n AS DOUBLE), 1.0))
                          / GREATEST(CAST(n AS DOUBLE) - 1.0, 1.0) > 0
                      AND value < CAST(s AS DOUBLE) / GREATEST(CAST(n AS DOUBLE), 1.0)
                          - CAST({BOLL_WIDTH} AS DOUBLE)
                            * sqrt((CAST(q AS DOUBLE)
                                    - CAST(s AS DOUBLE) * CAST(s AS DOUBLE)
                                      / GREATEST(CAST(n AS DOUBLE), 1.0))
                                   / GREATEST(CAST(n AS DOUBLE) - 1.0, 1.0))
                     THEN 1 ELSE 0 END) AS BIGINT) AS breakouts_down,
       CAST(SUM(CASE WHEN n = {BOLL_LOOKBACK}
                      AND (CAST(q AS DOUBLE)
                           - CAST(s AS DOUBLE) * CAST(s AS DOUBLE)
                             / GREATEST(CAST(n AS DOUBLE), 1.0))
                          / GREATEST(CAST(n AS DOUBLE) - 1.0, 1.0) > 0
                     THEN 1 ELSE 0 END) AS BIGINT) AS n_evaluated
FROM framed
GROUP BY 1, 2
""",
)(events_bollinger_breakouts)


# ---------------------------------------------------------------------------
# CUPED variance reduction for the A/B readout
# ---------------------------------------------------------------------------


def events_cuped_adjustment(spark: SparkSession, sf_dir: str) -> DataFrame:
    """CUPED (Deng et al. 2013) — the industry-standard experiment
    variance reduction: regress each user's post-period metric on
    their PRE-period metric (θ = cov(x,y)/var(x), pooled across
    arms), report per-arm raw and adjusted means plus the pooled ρ²
    (the fraction of metric variance the covariate removes — the
    sensitivity gain an A/B platform quotes before/after CUPED).
    Composes with ``events_ab_assignment_srm``'s sticky md5 arms and
    the half-month split the drift family uses.

    Determinism: per-user pre/post totals are EXACT integer cents
    (value sits on the 0.01 grid; decimal ×100 → bigint is
    integer-valued, so Spark's truncating cast == DuckDB's rounding
    cast); the user-level moment sums are exact int64; θ, means and
    ρ² are fixed-shape double expressions over them, rounded at 9.

    Scale shape: one scan → per-(user, arm) conditional-sum rollup →
    a 2-row arm rollup + a 1-row pooled-moments aggregate joined back
    by broadcast; no windows, no row-level second pass."""
    ev = load_table(spark, sf_dir, "events")
    arm = F.expr(
        f"CASE WHEN (instr('{_HLL_HEX}',"
        " substr(md5(CAST(CAST(user_id AS STRING) AS BINARY)), 1, 1)) - 1)"
        " % 2 = 0 THEN 'A' ELSE 'B' END"
    )
    split = F.lit(DRIFT_SPLIT).cast("timestamp")
    cents = F.expr("CAST(CAST(value AS DECIMAL(12,2)) * 100 AS BIGINT)")
    per_user = (
        ev.select("user_id", arm.alias("arm"), "ts", cents.alias("c"))
        .groupBy("user_id", "arm")
        .agg(
            F.sum(
                F.when(F.col("ts") < split, F.col("c")).otherwise(0)
            ).alias("x"),
            F.sum(
                F.when(F.col("ts") >= split, F.col("c")).otherwise(0)
            ).alias("y"),
        )
        # feeds BOTH the pooled moments and the arm rollup: checkpoint
        # makes the one-scan property structural (user-count-sized)
        .localCheckpoint(eager=True)
    )
    pooled = per_user.agg(
        F.count(F.lit(1)).alias("n"),
        F.sum("x").alias("sx"),
        F.sum("y").alias("sy"),
        F.sum(F.col("x") * F.col("x")).alias("sxx"),
        F.sum(F.col("x") * F.col("y")).alias("sxy"),
        F.sum(F.col("y") * F.col("y")).alias("syy"),
    )
    arms = per_user.groupBy("arm").agg(
        F.count(F.lit(1)).alias("n_users"),
        F.sum("x").alias("ax"),
        F.sum("y").alias("ay"),
    )
    j = arms.crossJoin(F.broadcast(pooled))
    nd = F.col("n").cast("double")
    sxd = F.col("sx").cast("double")
    syd = F.col("sy").cast("double")
    sxxd = F.col("sxx").cast("double")
    sxyd = F.col("sxy").cast("double")
    syyd = F.col("syy").cast("double")
    cov_n = nd * sxyd - sxd * syd
    varx_n = nd * sxxd - sxd * sxd
    vary_n = nd * syyd - syd * syd
    theta = cov_n / varx_n
    rho2 = cov_n * cov_n / (varx_n * vary_n)
    and_ = F.col("n_users").cast("double")
    mean_y = F.col("ay").cast("double") / and_
    mean_x = F.col("ax").cast("double") / and_
    mean_y_adj = mean_y - theta * (mean_x - sxd / nd)
    ok = (varx_n > 0) & (vary_n > 0)
    return j.select(
        "arm",
        F.col("n_users").cast("bigint").alias("n_users"),
        F.col("ax").cast("bigint").alias("pre_cents"),
        F.col("ay").cast("bigint").alias("post_cents"),
        F.round(mean_y, 9).alias("mean_post_cents"),
        F.when(ok, F.round(mean_y_adj, 9)).alias("mean_post_adj_cents"),
        F.when(ok, F.round(theta, 9)).alias("theta"),
        F.when(ok, F.round(rho2, 9)).alias("rho2"),
    )


_CUPED_CENTS = "CAST(CAST(value AS DECIMAL(12,2)) * 100 AS BIGINT)"

register(
    "events_cuped_adjustment",
    f"""
WITH per_user AS (
  SELECT user_id,
         CASE WHEN (strpos('{_HLL_HEX}',
                    substr(md5(CAST(user_id AS VARCHAR)), 1, 1)) - 1)
                   % 2 = 0 THEN 'A' ELSE 'B' END AS arm,
         CAST(SUM(CASE WHEN ts < TIMESTAMP '{DRIFT_SPLIT}'
                       THEN {_CUPED_CENTS} ELSE 0 END) AS BIGINT) AS x,
         CAST(SUM(CASE WHEN ts >= TIMESTAMP '{DRIFT_SPLIT}'
                       THEN {_CUPED_CENTS} ELSE 0 END) AS BIGINT) AS y
  FROM events GROUP BY 1, 2
),
pooled AS (
  SELECT COUNT(*) AS n,
         CAST(SUM(x) AS BIGINT) AS sx, CAST(SUM(y) AS BIGINT) AS sy,
         CAST(SUM(x * x) AS BIGINT) AS sxx,
         CAST(SUM(x * y) AS BIGINT) AS sxy,
         CAST(SUM(y * y) AS BIGINT) AS syy
  FROM per_user
),
arms AS (
  SELECT arm, COUNT(*) AS n_users,
         CAST(SUM(x) AS BIGINT) AS ax, CAST(SUM(y) AS BIGINT) AS ay
  FROM per_user GROUP BY 1
)
SELECT arm,
       CAST(n_users AS BIGINT) AS n_users,
       ax AS pre_cents,
       ay AS post_cents,
       round(CAST(ay AS DOUBLE) / CAST(n_users AS DOUBLE), 9)
         AS mean_post_cents,
       CASE WHEN CAST(n AS DOUBLE) * CAST(sxx AS DOUBLE)
                 - CAST(sx AS DOUBLE) * CAST(sx AS DOUBLE) > 0
             AND CAST(n AS DOUBLE) * CAST(syy AS DOUBLE)
                 - CAST(sy AS DOUBLE) * CAST(sy AS DOUBLE) > 0
            THEN round(CAST(ay AS DOUBLE) / CAST(n_users AS DOUBLE)
                       - (CAST(n AS DOUBLE) * CAST(sxy AS DOUBLE)
                          - CAST(sx AS DOUBLE) * CAST(sy AS DOUBLE))
                         / (CAST(n AS DOUBLE) * CAST(sxx AS DOUBLE)
                            - CAST(sx AS DOUBLE) * CAST(sx AS DOUBLE))
                         * (CAST(ax AS DOUBLE) / CAST(n_users AS DOUBLE)
                            - CAST(sx AS DOUBLE) / CAST(n AS DOUBLE)), 9)
            END AS mean_post_adj_cents,
       CASE WHEN CAST(n AS DOUBLE) * CAST(sxx AS DOUBLE)
                 - CAST(sx AS DOUBLE) * CAST(sx AS DOUBLE) > 0
             AND CAST(n AS DOUBLE) * CAST(syy AS DOUBLE)
                 - CAST(sy AS DOUBLE) * CAST(sy AS DOUBLE) > 0
            THEN round((CAST(n AS DOUBLE) * CAST(sxy AS DOUBLE)
                        - CAST(sx AS DOUBLE) * CAST(sy AS DOUBLE))
                       / (CAST(n AS DOUBLE) * CAST(sxx AS DOUBLE)
                          - CAST(sx AS DOUBLE) * CAST(sx AS DOUBLE)), 9)
            END AS theta,
       CASE WHEN CAST(n AS DOUBLE) * CAST(sxx AS DOUBLE)
                 - CAST(sx AS DOUBLE) * CAST(sx AS DOUBLE) > 0
             AND CAST(n AS DOUBLE) * CAST(syy AS DOUBLE)
                 - CAST(sy AS DOUBLE) * CAST(sy AS DOUBLE) > 0
            THEN round((CAST(n AS DOUBLE) * CAST(sxy AS DOUBLE)
                        - CAST(sx AS DOUBLE) * CAST(sy AS DOUBLE))
                       * (CAST(n AS DOUBLE) * CAST(sxy AS DOUBLE)
                          - CAST(sx AS DOUBLE) * CAST(sy AS DOUBLE))
                       / ((CAST(n AS DOUBLE) * CAST(sxx AS DOUBLE)
                           - CAST(sx AS DOUBLE) * CAST(sx AS DOUBLE))
                          * (CAST(n AS DOUBLE) * CAST(syy AS DOUBLE)
                             - CAST(sy AS DOUBLE) * CAST(sy AS DOUBLE))), 9)
            END AS rho2
FROM arms CROSS JOIN pooled
""",
)(events_cuped_adjustment)


# ---------------------------------------------------------------------------
# Difference-in-differences and minimum detectable effect
# ---------------------------------------------------------------------------


def events_diff_in_diff(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Difference-in-differences readout over the sticky md5 arms and
    the half-month split: DiD = (B_post − B_pre) − (A_post − A_pre)
    on per-user mean cents — the quasi-experimental estimator that
    nets out both the arm-level baseline difference and the
    common time trend. One row: the four cell means (exact integer
    cent sums over per-user totals, divided once) and the DiD point
    estimate, rounded at 9.

    Scale shape: one scan → (arm × period) conditional-sum rollup
    (4 cells, map-side combined) → a 1-row pivot; no joins on the
    fact, no windows."""
    ev = load_table(spark, sf_dir, "events")
    arm_a = F.expr(
        f"(instr('{_HLL_HEX}',"
        " substr(md5(CAST(CAST(user_id AS STRING) AS BINARY)), 1, 1)) - 1)"
        " % 2 = 0"
    )
    split = F.lit(DRIFT_SPLIT).cast("timestamp")
    cents = F.expr("CAST(CAST(value AS DECIMAL(12,2)) * 100 AS BIGINT)")
    pre = F.col("ts") < split
    cell = ev.select(arm_a.alias("is_a"), pre.alias("is_pre"), cents.alias("c"))
    agg = cell.agg(
        *[
            F.sum(
                F.when(
                    (F.col("is_a") == a) & (F.col("is_pre") == p), F.col("c")
                ).otherwise(0)
            ).alias(f"s_{'a' if a else 'b'}_{'pre' if p else 'post'}")
            for a in (True, False)
            for p in (True, False)
        ],
        *[
            F.sum(
                F.when(
                    (F.col("is_a") == a) & (F.col("is_pre") == p), 1
                ).otherwise(0)
            ).alias(f"n_{'a' if a else 'b'}_{'pre' if p else 'post'}")
            for a in (True, False)
            for p in (True, False)
        ],
    )

    def m(side, period):
        return F.col(f"s_{side}_{period}").cast("double") / F.greatest(
            F.col(f"n_{side}_{period}"), F.lit(1)
        ).cast("double")

    did = (m("b", "post") - m("b", "pre")) - (m("a", "post") - m("a", "pre"))
    return agg.select(
        *[
            F.col(f"n_{s}_{p}").cast("bigint").alias(f"n_{s}_{p}")
            for s in ("a", "b")
            for p in ("pre", "post")
        ],
        F.round(m("a", "pre"), 9).alias("mean_a_pre"),
        F.round(m("a", "post"), 9).alias("mean_a_post"),
        F.round(m("b", "pre"), 9).alias("mean_b_pre"),
        F.round(m("b", "post"), 9).alias("mean_b_post"),
        F.round(did, 9).alias("did_cents"),
    )


def _did_mean_sql(side: str, period: str) -> str:
    return (
        f"CAST(s_{side}_{period} AS DOUBLE)"
        f" / CAST(GREATEST(n_{side}_{period}, 1) AS DOUBLE)"
    )


register(
    "events_diff_in_diff",
    f"""
WITH cells AS (
  SELECT (strpos('{_HLL_HEX}',
          substr(md5(CAST(user_id AS VARCHAR)), 1, 1)) - 1) % 2 = 0
           AS is_a,
         ts < TIMESTAMP '{DRIFT_SPLIT}' AS is_pre,
         CAST(CAST(value AS DECIMAL(12,2)) * 100 AS BIGINT) AS c
  FROM events
),
agg AS (
  SELECT
    CAST(SUM(CASE WHEN is_a AND is_pre THEN c ELSE 0 END) AS BIGINT) AS s_a_pre,
    CAST(SUM(CASE WHEN is_a AND NOT is_pre THEN c ELSE 0 END) AS BIGINT) AS s_a_post,
    CAST(SUM(CASE WHEN NOT is_a AND is_pre THEN c ELSE 0 END) AS BIGINT) AS s_b_pre,
    CAST(SUM(CASE WHEN NOT is_a AND NOT is_pre THEN c ELSE 0 END) AS BIGINT) AS s_b_post,
    CAST(SUM(CASE WHEN is_a AND is_pre THEN 1 ELSE 0 END) AS BIGINT) AS n_a_pre,
    CAST(SUM(CASE WHEN is_a AND NOT is_pre THEN 1 ELSE 0 END) AS BIGINT) AS n_a_post,
    CAST(SUM(CASE WHEN NOT is_a AND is_pre THEN 1 ELSE 0 END) AS BIGINT) AS n_b_pre,
    CAST(SUM(CASE WHEN NOT is_a AND NOT is_pre THEN 1 ELSE 0 END) AS BIGINT) AS n_b_post
  FROM cells
)
SELECT n_a_pre, n_a_post, n_b_pre, n_b_post,
       round({_did_mean_sql('a', 'pre')}, 9) AS mean_a_pre,
       round({_did_mean_sql('a', 'post')}, 9) AS mean_a_post,
       round({_did_mean_sql('b', 'pre')}, 9) AS mean_b_pre,
       round({_did_mean_sql('b', 'post')}, 9) AS mean_b_post,
       round(({_did_mean_sql('b', 'post')} - {_did_mean_sql('b', 'pre')})
             - ({_did_mean_sql('a', 'post')} - {_did_mean_sql('a', 'pre')}),
             9) AS did_cents
FROM agg
""",
)(events_diff_in_diff)


def events_ab_mde(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Minimum detectable effect for the A/B metric at 80% power /
    5% two-sided α: MDE = (z_{{α/2}} + z_{{power}}) · sqrt(σ²/n_A +
    σ²/n_B) with the z constants as the same decimal literals in
    both engines (1.959964, 0.841621) — the pre-experiment sizing
    answer ("what lift could this traffic even see?") every platform
    computes next to the readout. σ² is the pooled per-user metric
    variance from exact integer-cent sums; one sqrt, rounded at 6.

    Scale shape: one scan → per-(user, arm) cent totals → 2-row arm
    rollup with moment sums; the 1-row pooled variance broadcasts
    back."""
    ev = load_table(spark, sf_dir, "events")
    arm = F.expr(
        f"CASE WHEN (instr('{_HLL_HEX}',"
        " substr(md5(CAST(CAST(user_id AS STRING) AS BINARY)), 1, 1)) - 1)"
        " % 2 = 0 THEN 'A' ELSE 'B' END"
    )
    cents = F.expr("CAST(CAST(value AS DECIMAL(12,2)) * 100 AS BIGINT)")
    per_user = (
        ev.select("user_id", arm.alias("arm"), cents.alias("c"))
        .groupBy("user_id", "arm")
        .agg(F.sum("c").alias("y"))
        .localCheckpoint(eager=True)
    )
    pooled = per_user.agg(
        F.count(F.lit(1)).alias("n"),
        F.sum("y").alias("sy"),
        F.sum(F.col("y") * F.col("y")).alias("syy"),
    )
    arms = per_user.groupBy("arm").agg(F.count(F.lit(1)).alias("n_users"))
    j = arms.crossJoin(F.broadcast(pooled))
    nd = F.col("n").cast("double")
    syd = F.col("sy").cast("double")
    syyd = F.col("syy").cast("double")
    var = (syyd - syd * syd / nd) / (nd - F.lit(1.0))
    # n of the OTHER arm = n - n_users (two arms by construction)
    na = F.col("n_users").cast("double")
    nb = (F.col("n") - F.col("n_users")).cast("double")
    mde = F.expr("CAST(1.959964 AS DOUBLE) + CAST(0.841621 AS DOUBLE)") * F.sqrt(
        var / na + var / nb
    )
    return j.select(
        "arm",
        F.col("n_users").cast("bigint").alias("n_users"),
        # the variance's moment sums ride along EXACT (a rounded float
        # variance at ~1e10 magnitude has no stable 6th decimal)
        F.col("sy").cast("bigint").alias("sum_y_cents"),
        F.col("syy").cast("bigint").alias("sum_y2_cents"),
        F.when((na > 1) & (nb > 0) & (var > 0), F.round(mde, 6)).alias(
            "mde_cents"
        ),
    )


register(
    "events_ab_mde",
    f"""
WITH per_user AS (
  SELECT user_id,
         CASE WHEN (strpos('{_HLL_HEX}',
                    substr(md5(CAST(user_id AS VARCHAR)), 1, 1)) - 1)
                   % 2 = 0 THEN 'A' ELSE 'B' END AS arm,
         CAST(SUM(CAST(CAST(value AS DECIMAL(12,2)) * 100 AS BIGINT))
              AS BIGINT) AS y
  FROM events GROUP BY 1, 2
),
pooled AS (
  SELECT COUNT(*) AS n, CAST(SUM(y) AS BIGINT) AS sy,
         CAST(SUM(y * y) AS BIGINT) AS syy
  FROM per_user
),
arms AS (SELECT arm, COUNT(*) AS n_users FROM per_user GROUP BY 1)
SELECT arm, CAST(n_users AS BIGINT) AS n_users,
       sy AS sum_y_cents,
       syy AS sum_y2_cents,
       CASE WHEN CAST(n_users AS DOUBLE) > 1
             AND CAST(n - n_users AS DOUBLE) > 0
             AND (CAST(syy AS DOUBLE)
                  - CAST(sy AS DOUBLE) * CAST(sy AS DOUBLE)
                    / CAST(n AS DOUBLE)) / (CAST(n AS DOUBLE) - 1.0) > 0
            THEN round((CAST(1.959964 AS DOUBLE) + CAST(0.841621 AS DOUBLE))
                       * sqrt((CAST(syy AS DOUBLE)
                               - CAST(sy AS DOUBLE) * CAST(sy AS DOUBLE)
                                 / CAST(n AS DOUBLE))
                              / (CAST(n AS DOUBLE) - 1.0)
                              / CAST(n_users AS DOUBLE)
                              + (CAST(syy AS DOUBLE)
                                 - CAST(sy AS DOUBLE) * CAST(sy AS DOUBLE)
                                   / CAST(n AS DOUBLE))
                                / (CAST(n AS DOUBLE) - 1.0)
                                / CAST(n - n_users AS DOUBLE)), 6)
            END AS mde_cents
FROM arms CROSS JOIN pooled
""",
)(events_ab_mde)


# ---------------------------------------------------------------------------
# Position-based (U-shaped) multi-touch attribution
# ---------------------------------------------------------------------------

USHAPE_EDGE_MILLI = 400  # first and last touch each
USHAPE_MID_MILLI = 200  # split across the middle touches


def events_attribution_position(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Position-based (U-shaped 40/20/40) multi-touch attribution —
    the standard upgrade from ``events_attribution_last_touch``: each
    purchase's journey (the user's non-purchase touches since their
    previous purchase) splits 1000 milli-credits as {USHAPE_EDGE_MILLI}
    to the first touch, {USHAPE_EDGE_MILLI} to the last,
    {USHAPE_MID_MILLI} spread over the middles (integer floor per
    middle, remainder to the FIRST middle — documented so the split
    stays exactly 1000); single-touch journeys take all 1000,
    two-touch journeys 500/500, touchless purchases credit 'none'.

    Scale shape: journeys come from one per-user ordered window (a
    running count of prior purchases); credits from per-journey rank
    windows; everything integer, the final rollup ≤|types|+1 rows."""
    ev = load_table(spark, sf_dir, "events").select(
        "user_id", "ts", "event_id", "event_type"
    )
    w_prior = (
        Window.partitionBy("user_id")
        .orderBy("ts", "event_id")
        .rowsBetween(Window.unboundedPreceding, -1)
    )
    tagged = ev.withColumn(
        "journey",
        F.coalesce(
            F.sum(
                F.when(F.col("event_type") == "purchase", 1).otherwise(0)
            ).over(w_prior),
            F.lit(0),
        ),
    )
    purchases = tagged.filter(F.col("event_type") == "purchase").select(
        "user_id", "journey"
    )
    touches = tagged.filter(F.col("event_type") != "purchase").join(
        purchases, ["user_id", "journey"], "left_semi"
    )
    wj = Window.partitionBy("user_id", "journey").orderBy("ts", "event_id")
    wjn = Window.partitionBy("user_id", "journey")
    ranked = (
        touches.withColumn("rk", F.row_number().over(wj))
        .withColumn("n", F.count(F.lit(1)).over(wjn))
    )
    q = F.expr(f"CAST({USHAPE_MID_MILLI} div (n - 2) AS BIGINT)")
    rem = F.expr(
        f"CAST({USHAPE_MID_MILLI} - (n - 2)"
        f" * ({USHAPE_MID_MILLI} div (n - 2)) AS BIGINT)"
    )
    credit = (
        F.when(F.col("n") == 1, F.lit(1000))
        .when(F.col("n") == 2, F.lit(500))
        .when(F.col("rk") == 1, F.lit(USHAPE_EDGE_MILLI))
        .when(F.col("rk") == F.col("n"), F.lit(USHAPE_EDGE_MILLI))
        .otherwise(
            q + F.when(F.col("rk") == 2, rem).otherwise(F.lit(0))
        )
    )
    credited = ranked.select(
        F.col("event_type").alias("touch"),
        credit.cast("bigint").alias("credit_milli"),
    )
    none_rows = (
        purchases.join(
            touches.select("user_id", "journey").distinct(),
            ["user_id", "journey"],
            "left_anti",
        )
        .select(
            F.lit("none").alias("touch"),
            F.lit(1000).cast("bigint").alias("credit_milli"),
        )
    )
    out = credited.unionByName(none_rows)
    counts = out.groupBy("touch").agg(
        F.sum("credit_milli").alias("credit_milli")
    )
    return counts.select(
        "touch",
        F.col("credit_milli").cast("bigint").alias("credit_milli"),
        F.expr(
            "CAST((1000000 * credit_milli)"
            " div SUM(credit_milli) OVER () AS BIGINT)"
        ).alias("share_micro"),
    )


register(
    "events_attribution_position",
    f"""
WITH tagged AS (
  SELECT user_id, ts, event_id, event_type,
         COALESCE(SUM(CASE WHEN event_type = 'purchase' THEN 1 ELSE 0
                      END) OVER (
           PARTITION BY user_id ORDER BY ts, event_id
           ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING), 0)
           AS journey
  FROM events
),
purchases AS (
  SELECT user_id, journey FROM tagged WHERE event_type = 'purchase'
),
touches AS (
  SELECT t.* FROM tagged t
  SEMI JOIN purchases p
    ON t.user_id = p.user_id AND t.journey = p.journey
  WHERE t.event_type <> 'purchase'
),
ranked AS (
  SELECT event_type,
         row_number() OVER (PARTITION BY user_id, journey
                            ORDER BY ts, event_id) AS rk,
         COUNT(*) OVER (PARTITION BY user_id, journey) AS n
  FROM touches
),
credited AS (
  SELECT event_type AS touch,
         CAST(CASE WHEN n = 1 THEN 1000
                   WHEN n = 2 THEN 500
                   WHEN rk = 1 THEN {USHAPE_EDGE_MILLI}
                   WHEN rk = n THEN {USHAPE_EDGE_MILLI}
                   ELSE CAST({USHAPE_MID_MILLI} // (n - 2) AS BIGINT)
                        + CASE WHEN rk = 2
                               THEN {USHAPE_MID_MILLI} - (n - 2)
                                    * CAST({USHAPE_MID_MILLI} // (n - 2)
                                      AS BIGINT)
                               ELSE 0 END
              END AS BIGINT) AS credit_milli
  FROM ranked
  UNION ALL
  SELECT 'none' AS touch, CAST(1000 AS BIGINT) AS credit_milli
  FROM purchases p
  ANTI JOIN (SELECT DISTINCT user_id, journey FROM touches) t
    ON p.user_id = t.user_id AND p.journey = t.journey
),
counts AS (
  SELECT touch, CAST(SUM(credit_milli) AS BIGINT) AS credit_milli
  FROM credited GROUP BY 1
)
SELECT touch, credit_milli,
       CAST((1000000 * credit_milli)
            // (SELECT SUM(credit_milli) FROM counts) AS BIGINT)
         AS share_micro
FROM counts
""",
)(events_attribution_position)


# ---------------------------------------------------------------------------
# Bucketized range join (round 9)
# ---------------------------------------------------------------------------

RANGE_JOIN_WINDOW_S = 600  # follow-up window after each anchor event


def events_range_join_bucketized(
    spark: SparkSession, sf_dir: str
) -> DataFrame:
    """Range join, made equi-joinable: every ``error`` event opens a
    ({RANGE_JOIN_WINDOW_S}s] follow-up window, and we count the same
    user's subsequent events inside it — the "post-incident activity"
    probe a monitoring pipeline runs constantly.

    Spark has no native range join, and the naive formulation
    (``ON user AND t < ts AND ts <= t + w``) plans as a nested-loop
    over every same-user pair. The scale-safe shape is BUCKETIZATION:
    time is cut into window-width buckets, each anchor's window is
    registered in the <= 2 buckets it can overlap (a bounded explode),
    probes join on (user_id, bucket) — a plain shuffled equi-join
    bounded by |events| x 2 — and the exact range predicate filters
    the candidates. Each (anchor, probe) candidate appears at most
    once because a probe lives in exactly one bucket, so no dedup pass
    is needed. Plan contract (test_plan_contracts) pins the no-
    nested-loop property.

    Output: one row per anchor with the follow-up count and exact
    centi-value sum (events.value sits on the 0.01 grid), anchors with
    an empty window kept at zero via the left join."""
    ev = load_table(spark, sf_dir, "events")
    w = RANGE_JOIN_WINDOW_S
    anchors = ev.filter(F.col("event_type") == "error").select(
        F.col("event_id").alias("anchor_id"),
        F.col("user_id").alias("a_user"),
        F.col("ts").alias("a_ts"),
        F.unix_timestamp("ts").alias("a_epoch"),
    )
    # the (a_ts, a_ts + w] window overlaps buckets b and b+1 only
    a_buckets = anchors.select(
        "anchor_id",
        "a_user",
        "a_ts",
        F.explode(
            F.array(
                (F.col("a_epoch") / w).cast("bigint"),
                (F.col("a_epoch") / w).cast("bigint") + 1,
            )
        ).alias("bucket"),
    )
    probes = ev.select(
        F.col("event_id").alias("p_id"),
        F.col("user_id").alias("p_user"),
        F.col("ts").alias("p_ts"),
        (F.unix_timestamp("ts") / w).cast("bigint").alias("bucket"),
        (F.col("value").cast("decimal(12,2)") * 100)
        .cast("bigint")
        .alias("p_centi"),
    )
    matched = (
        a_buckets.join(
            probes,
            (F.col("a_user") == F.col("p_user"))
            & (a_buckets.bucket == probes.bucket),
        )
        .filter(
            (F.col("p_ts") > F.col("a_ts"))
            & (
                F.col("p_ts")
                <= F.col("a_ts") + F.expr(f"INTERVAL {w} SECONDS")
            )
        )
        .groupBy("anchor_id")
        .agg(
            F.count(F.lit(1)).alias("n_follow"),
            F.sum("p_centi").alias("follow_value_centi"),
        )
    )
    return anchors.join(matched, "anchor_id", "left").select(
        "anchor_id",
        F.col("a_user").alias("user_id"),
        F.coalesce("n_follow", F.lit(0)).cast("bigint").alias("n_follow"),
        F.coalesce("follow_value_centi", F.lit(0))
        .cast("bigint")
        .alias("follow_value_centi"),
    )


register(
    "events_range_join_bucketized",
    f"""
WITH anchors AS (
  SELECT event_id AS anchor_id, user_id, ts
  FROM events WHERE event_type = 'error'
),
matched AS (
  SELECT a.anchor_id,
         COUNT(*) AS n_follow,
         CAST(SUM(CAST(CAST(e.value AS DECIMAL(12,2)) * 100 AS BIGINT))
              AS BIGINT) AS follow_value_centi
  FROM anchors a
  JOIN events e
    ON e.user_id = a.user_id
   AND e.ts > a.ts
   AND e.ts <= a.ts + INTERVAL {RANGE_JOIN_WINDOW_S} SECONDS
  GROUP BY 1
)
SELECT a.anchor_id, a.user_id,
       CAST(COALESCE(m.n_follow, 0) AS BIGINT) AS n_follow,
       CAST(COALESCE(m.follow_value_centi, 0) AS BIGINT)
         AS follow_value_centi
FROM anchors a LEFT JOIN matched m ON a.anchor_id = m.anchor_id
""",
)(events_range_join_bucketized)


# ---------------------------------------------------------------------------
# Holt double-exponential smoothing (round 9)
# ---------------------------------------------------------------------------


def events_holt_forecast(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Holt's double-exponential smoothing over each event type's daily
    value series, with alpha = beta = 1/2 — the halving constants make
    every update an INTEGER floor operation, so the sequential
    recurrence (level/trend carried day to day) hashes identically
    cross-engine with no float-accumulation drift (the PageRank int64
    lesson applied to time-series state):

        level' = floor((obs + level + trend) / 2)
        trend' = floor((level' - level + trend) / 2)

    seeded level_0 = obs_0, trend_0 = 0; forecast = level + trend.

    Spark-first mechanics: the recurrence is inherently sequential per
    key, so it runs as ``aggregate()`` (a catalyst fold, JVM-side — no
    Python) over the per-type day-sorted series array; the DuckDB twin
    is a recursive CTE stepping the same integers. The distributed
    work is the (type, day) rollup — the fold input is CALENDAR-
    bounded (one element per day, ~365/decade per key), so collecting
    it into an array column stays O(days) at ANY corpus scale; daily
    sums in centi-units stay far under 2^52, keeping the /2.0 double
    path exact."""
    ev = load_table(spark, sf_dir, "events")
    daily = ev.groupBy(
        "event_type", F.to_date("ts").alias("day")
    ).agg(
        F.sum(
            (F.col("value").cast("decimal(12,2)") * 100).cast("bigint")
        ).alias("obs")
    )
    series = daily.groupBy("event_type").agg(
        F.sort_array(F.collect_list(F.struct("day", "obs"))).alias("s")
    )
    fold = F.expr(
        """
        aggregate(
          slice(s, 2, size(s) - 1),
          named_struct('level', s[0].obs, 'trend', CAST(0 AS BIGINT)),
          (acc, x) -> named_struct(
            'level',
            floor(CAST(x.obs + acc.level + acc.trend AS DOUBLE) / 2.0),
            'trend',
            floor(
              CAST(
                floor(CAST(x.obs + acc.level + acc.trend AS DOUBLE) / 2.0)
                - acc.level + acc.trend
                AS DOUBLE
              ) / 2.0
            )
          )
        )
        """
    )
    return series.select(
        "event_type",
        F.size("s").cast("bigint").alias("n_days"),
        fold.getField("level").cast("bigint").alias("level_centi"),
        fold.getField("trend").cast("bigint").alias("trend_centi"),
        (fold.getField("level") + fold.getField("trend"))
        .cast("bigint")
        .alias("forecast_centi"),
    )


register(
    "events_holt_forecast",
    """
WITH RECURSIVE daily AS (
  SELECT event_type, CAST(ts AS DATE) AS day,
         CAST(SUM(CAST(CAST(value AS DECIMAL(12,2)) * 100 AS BIGINT))
              AS BIGINT) AS obs
  FROM events GROUP BY 1, 2
),
idx AS (
  SELECT event_type, obs,
         row_number() OVER (PARTITION BY event_type ORDER BY day) AS i,
         COUNT(*) OVER (PARTITION BY event_type) AS n
  FROM daily
),
holt AS (
  SELECT event_type, 1 AS i, n, obs AS level, CAST(0 AS BIGINT) AS trend
  FROM idx WHERE i = 1
  UNION ALL
  SELECT h.event_type, h.i + 1, h.n,
         CAST(floor((x.obs + h.level + h.trend) / 2.0) AS BIGINT),
         CAST(floor((CAST(floor((x.obs + h.level + h.trend) / 2.0)
                          AS BIGINT) - h.level + h.trend) / 2.0)
              AS BIGINT)
  FROM holt h
  JOIN idx x ON x.event_type = h.event_type AND x.i = h.i + 1
)
SELECT event_type,
       CAST(n AS BIGINT) AS n_days,
       level AS level_centi,
       trend AS trend_centi,
       CAST(level + trend AS BIGINT) AS forecast_centi
FROM holt WHERE i = n
""",
)(events_holt_forecast)


def events_holt_backtest(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Walk-forward evaluation of the Holt smoother: at every day t >= 2
    the model's one-step-ahead forecast (level + trend BEFORE seeing
    day t) is scored against the day's actual total, accumulating the
    absolute error exactly in centi-units — the backtest that decides
    whether the forecast is usable, not just computable. Same integer
    fold as ``events_holt_forecast`` with an error accumulator riding
    the state; MAE is emitted as exact integer division (the moment-
    sums discipline: Σ|err| and n separately, plus the floored mean).

    Scale shape identical to the forecast op: distributed (type, day)
    rollup, calendar-bounded per-key fold."""
    ev = load_table(spark, sf_dir, "events")
    daily = ev.groupBy(
        "event_type", F.to_date("ts").alias("day")
    ).agg(
        F.sum(
            (F.col("value").cast("decimal(12,2)") * 100).cast("bigint")
        ).alias("obs")
    )
    series = daily.groupBy("event_type").agg(
        F.sort_array(F.collect_list(F.struct("day", "obs"))).alias("s")
    )
    fold = F.expr(
        """
        aggregate(
          slice(s, 2, size(s) - 1),
          named_struct('level', s[0].obs, 'trend', CAST(0 AS BIGINT),
                       'abs_err', CAST(0 AS BIGINT)),
          (acc, x) -> named_struct(
            'level',
            floor(CAST(x.obs + acc.level + acc.trend AS DOUBLE) / 2.0),
            'trend',
            floor(
              CAST(
                floor(CAST(x.obs + acc.level + acc.trend AS DOUBLE) / 2.0)
                - acc.level + acc.trend
                AS DOUBLE
              ) / 2.0
            ),
            'abs_err',
            acc.abs_err + abs(x.obs - (acc.level + acc.trend))
          )
        )
        """
    )
    return (
        series.select(
            "event_type", F.size("s").alias("n_days"), fold.alias("h")
        )
        .select(
            "event_type",
            (F.col("n_days") - 1).cast("bigint").alias("n_forecasts"),
            F.col("h.abs_err").cast("bigint").alias("abs_err_centi"),
            F.expr("CAST(h.abs_err div (n_days - 1) AS BIGINT)").alias(
                "mae_centi"
            ),
        )
    )


register(
    "events_holt_backtest",
    """
WITH RECURSIVE daily AS (
  SELECT event_type, CAST(ts AS DATE) AS day,
         CAST(SUM(CAST(CAST(value AS DECIMAL(12,2)) * 100 AS BIGINT))
              AS BIGINT) AS obs
  FROM events GROUP BY 1, 2
),
idx AS (
  SELECT event_type, obs,
         row_number() OVER (PARTITION BY event_type ORDER BY day) AS i,
         COUNT(*) OVER (PARTITION BY event_type) AS n
  FROM daily
),
holt AS (
  SELECT event_type, 1 AS i, n, obs AS level,
         CAST(0 AS BIGINT) AS trend, CAST(0 AS BIGINT) AS abs_err
  FROM idx WHERE i = 1
  UNION ALL
  SELECT h.event_type, h.i + 1, h.n,
         CAST(floor((x.obs + h.level + h.trend) / 2.0) AS BIGINT),
         CAST(floor((CAST(floor((x.obs + h.level + h.trend) / 2.0)
                          AS BIGINT) - h.level + h.trend) / 2.0)
              AS BIGINT),
         h.abs_err + abs(x.obs - (h.level + h.trend))
  FROM holt h
  JOIN idx x ON x.event_type = h.event_type AND x.i = h.i + 1
)
SELECT event_type,
       CAST(n - 1 AS BIGINT) AS n_forecasts,
       abs_err AS abs_err_centi,
       CAST(abs_err // (n - 1) AS BIGINT) AS mae_centi
FROM holt WHERE i = n
""",
)(events_holt_backtest)


# ---------------------------------------------------------------------------
# Rank statistics over daily series (round 10): Spearman / Mann-Kendall
# ---------------------------------------------------------------------------


def events_spearman_daily(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Spearman rank correlation between every PAIR of event types'
    DAILY volumes — the robust (outlier- and monotone-transform-
    invariant) twin of ``events_type_crosscorr``'s Pearson screen.
    Computed on the PAIRED sample (days where both types fired), with
    midranks for ties, via the d² identity
    ``rho = 1 − 6·Σd² / (n(n²−1))``.

    Determinism contract: ranks are carried as INTEGER doubled
    midranks (``2·rank + ties − 1``), so ``(2d)²`` and its sum are
    exact int64 and ``rho_micro`` is one integer cross-multiplication
    — no floats anywhere (the d² identity with midranks is the
    classic textbook estimator; it differs from Pearson-on-ranks only
    under heavy ties, stated here so the semantics are pinned).

    Scale shape: ONE fact scan → type×day rollup (map-side combine,
    bounded |types|·|days|); the pair join and the rank windows run
    over that tiny frame, windows partitioned by the (type_a, type_b)
    pair — never a global sort, never a second fact scan."""
    ev = load_table(spark, sf_dir, "events")
    daily = ev.groupBy(
        "event_type", F.to_date("ts").alias("day")
    ).agg(F.count(F.lit(1)).alias("c"))
    a = daily.select(
        F.col("event_type").alias("type_a"),
        "day",
        F.col("c").alias("c_a"),
    )
    b = daily.select(
        F.col("event_type").alias("type_b"),
        F.col("day").alias("day_b"),
        F.col("c").alias("c_b"),
    )
    paired = a.join(
        b,
        (F.col("day") == F.col("day_b"))
        & (F.col("type_a") < F.col("type_b")),
    ).select("type_a", "type_b", "day", "c_a", "c_b")

    def r2(col: str) -> F.Column:
        w_rank = Window.partitionBy("type_a", "type_b").orderBy(col)
        w_tie = Window.partitionBy("type_a", "type_b", col)
        return (
            2 * F.rank().over(w_rank) + F.count(F.lit(1)).over(w_tie) - 1
        ).cast("bigint")

    ranked = paired.select(
        "type_a",
        "type_b",
        r2("c_a").alias("r2_a"),
        r2("c_b").alias("r2_b"),
    )
    agg = ranked.groupBy("type_a", "type_b").agg(
        F.count(F.lit(1)).alias("n_days"),
        F.sum(
            (F.col("r2_a") - F.col("r2_b"))
            * (F.col("r2_a") - F.col("r2_b"))
        ).alias("sum_4d2"),
    )
    return agg.select(
        "type_a",
        "type_b",
        F.col("n_days").cast("bigint").alias("n_days"),
        F.col("sum_4d2").cast("bigint").alias("sum_4d2"),
        F.expr(
            "CASE WHEN n_days > 1 THEN CAST(1000000 -"
            " (1500000 * sum_4d2)"
            " div (n_days * (n_days * n_days - 1)) AS BIGINT) END"
        ).alias("rho_micro"),
    )


register(
    "events_spearman_daily",
    """
WITH daily AS (
  SELECT event_type, CAST(ts AS DATE) AS day, COUNT(*) AS c
  FROM events GROUP BY 1, 2
),
paired AS (
  SELECT a.event_type AS type_a, b.event_type AS type_b, a.day,
         a.c AS c_a, b.c AS c_b
  FROM daily a JOIN daily b
    ON a.day = b.day AND a.event_type < b.event_type
),
ranked AS (
  SELECT type_a, type_b,
         2 * RANK() OVER (PARTITION BY type_a, type_b ORDER BY c_a)
           + COUNT(*) OVER (PARTITION BY type_a, type_b, c_a) - 1 AS r2_a,
         2 * RANK() OVER (PARTITION BY type_a, type_b ORDER BY c_b)
           + COUNT(*) OVER (PARTITION BY type_a, type_b, c_b) - 1 AS r2_b
  FROM paired
),
agg AS (
  SELECT type_a, type_b, COUNT(*) AS n_days,
         SUM((r2_a - r2_b) * (r2_a - r2_b)) AS sum_4d2
  FROM ranked GROUP BY 1, 2
)
SELECT type_a, type_b,
       CAST(n_days AS BIGINT) AS n_days,
       CAST(sum_4d2 AS BIGINT) AS sum_4d2,
       CASE WHEN n_days > 1 THEN CAST(1000000 -
            CAST((1500000 * sum_4d2) AS BIGINT)
            // (n_days * (n_days * n_days - 1)) AS BIGINT) END
         AS rho_micro
FROM agg
""",
)(events_spearman_daily)


def events_mann_kendall(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Mann-Kendall monotone-trend test per event type over the daily
    volume series: ``S = Σ_{i<j} sign(x_j − x_i)`` with the
    tie-corrected variance
    ``Var(S) = [n(n−1)(2n+5) − Σ_t t(t−1)(2t+5)] / 18`` and the
    continuity-corrected normal score — the standard nonparametric
    "is this KPI drifting" screen (no distribution or linearity
    assumption, unlike a regression slope).

    Determinism contract: S, n and ``var18 = 18·Var(S)`` are exact
    int64; z is the only float — one exact division by 18.0, one
    IEEE-exact sqrt, one subtraction, rounded to 6 decimals at
    z-score magnitude (safe per the round-precision rule).

    Scale shape: ONE fact scan → type×day rollup (bounded
    |types|·|days|); the sign pair join is a self-join of that tiny
    frame per type (|days|²/2 pairs, calendar-bounded by
    construction), tie terms a second rollup of the same frame."""
    ev = load_table(spark, sf_dir, "events")
    daily = (
        ev.groupBy("event_type", F.to_date("ts").alias("day"))
        .agg(F.count(F.lit(1)).alias("c"))
        .localCheckpoint(eager=True)
    )  # feeds pairs AND tie rollup: one fact scan, structurally
    a = daily.select(
        "event_type", F.col("day").alias("d_i"), F.col("c").alias("c_i")
    )
    b = daily.select(
        F.col("event_type").alias("et"),
        F.col("day").alias("d_j"),
        F.col("c").alias("c_j"),
    )
    s = (
        a.join(
            b,
            (F.col("event_type") == F.col("et"))
            & (F.col("d_i") < F.col("d_j")),
        )
        .groupBy("event_type")
        .agg(
            F.sum(
                F.when(F.col("c_j") > F.col("c_i"), 1)
                .when(F.col("c_j") < F.col("c_i"), -1)
                .otherwise(0)
            ).alias("s_stat"),
        )
    )
    per_type = daily.groupBy("event_type").agg(
        F.count(F.lit(1)).alias("n_days")
    )
    ties = (
        daily.groupBy("event_type", "c")
        .agg(F.count(F.lit(1)).alias("t"))
        .groupBy("event_type")
        .agg(
            F.sum(
                F.expr("t * (t - 1) * (2 * t + 5)")
            ).alias("tie_term")
        )
    )
    out = (
        per_type.join(s, "event_type")
        .join(ties, "event_type")
        .withColumn(
            "var18",
            F.expr(
                "n_days * (n_days - 1) * (2 * n_days + 5) - tie_term"
            ).cast("bigint"),
        )
        .withColumn(
            "z",
            F.when(
                F.col("var18") > 0,
                F.round(
                    (
                        F.col("s_stat")
                        - F.signum(F.col("s_stat")).cast("bigint")
                    ).cast("double")
                    / F.sqrt(F.col("var18").cast("double") / F.lit(18.0)),
                    6,
                ),
            ),
        )
    )
    return out.select(
        "event_type",
        F.col("n_days").cast("bigint").alias("n_days"),
        F.col("s_stat").cast("bigint").alias("s_stat"),
        "var18",
        F.col("z").alias("z_score"),
        F.expr(
            "CASE WHEN z > 1.959964 THEN 'increasing'"
            " WHEN z < -1.959964 THEN 'decreasing'"
            " ELSE 'no_trend' END"
        ).alias("trend"),
    )


register(
    "events_mann_kendall",
    """
WITH daily AS (
  SELECT event_type, CAST(ts AS DATE) AS day, COUNT(*) AS c
  FROM events GROUP BY 1, 2
),
s AS (
  SELECT a.event_type,
         SUM(CASE WHEN b.c > a.c THEN 1
                  WHEN b.c < a.c THEN -1 ELSE 0 END) AS s_stat
  FROM daily a JOIN daily b
    ON a.event_type = b.event_type AND a.day < b.day
  GROUP BY 1
),
per_type AS (
  SELECT event_type, COUNT(*) AS n_days FROM daily GROUP BY 1
),
ties AS (
  SELECT event_type, SUM(t * (t - 1) * (2 * t + 5)) AS tie_term
  FROM (SELECT event_type, c, COUNT(*) AS t FROM daily GROUP BY 1, 2)
  GROUP BY 1
),
base AS (
  SELECT p.event_type, p.n_days, s.s_stat,
         CAST(p.n_days * (p.n_days - 1) * (2 * p.n_days + 5)
              - t.tie_term AS BIGINT) AS var18
  FROM per_type p JOIN s ON s.event_type = p.event_type
  JOIN ties t ON t.event_type = p.event_type
),
z AS (
  SELECT *,
         CASE WHEN var18 > 0 THEN
           round((s_stat - sign(s_stat))
                 / sqrt(CAST(var18 AS DOUBLE) / 18.0), 6)
         END AS z_score
  FROM base
)
SELECT event_type,
       CAST(n_days AS BIGINT) AS n_days,
       CAST(s_stat AS BIGINT) AS s_stat,
       var18,
       z_score,
       CASE WHEN z_score > 1.959964 THEN 'increasing'
            WHEN z_score < -1.959964 THEN 'decreasing'
            ELSE 'no_trend' END AS trend
FROM z
""",
)(events_mann_kendall)


def events_theil_sen_slope(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Theil-Sen slope per event type over the daily volume series —
    the robust trend MAGNITUDE companion to ``events_mann_kendall``'s
    direction test: the median of all pairwise slopes
    ``(c_j − c_i)/(d_j − d_i)``, insensitive to ~29% outliers where a
    least-squares slope is wrecked by one bad day.

    Determinism contract: each slope is the exact integer
    ``floor(10^6·dy/dx)``, computed SIGN-SPLIT so every integer
    division sees non-negative operands (where Spark's truncating
    ``div`` and DuckDB's flooring ``//`` agree, and intermediates
    stay far under 2^53 for DuckDB's double-promoted ``//``):
    ``dy >= 0 → (10^6·dy) div dx``;
    ``dy < 0 → −((10^6·|dy| + dx − 1) div dx)`` (floor = −ceil of the
    absolute value). The median is the LOWER median (element
    ``(n+1) div 2`` of the sorted slopes) — pure integer selection,
    no averaging, no floats.

    Scale shape: ONE fact scan → type×day rollup (bounded
    |types|·|days|); the pair join is |days|²/2 per type
    (calendar-bounded by construction — 435 pairs for a month); the
    median is a row_number selection in a per-type window over that
    bounded frame."""
    ev = load_table(spark, sf_dir, "events")
    daily = ev.groupBy(
        "event_type", F.to_date("ts").alias("day")
    ).agg(F.count(F.lit(1)).alias("c"))
    a = daily.select(
        "event_type",
        F.expr("datediff(day, DATE'2024-01-01')").alias("d_i"),
        F.col("c").alias("c_i"),
    )
    b = daily.select(
        F.col("event_type").alias("et"),
        F.expr("datediff(day, DATE'2024-01-01')").alias("d_j"),
        F.col("c").alias("c_j"),
    )
    slopes = a.join(
        b,
        (F.col("event_type") == F.col("et"))
        & (F.col("d_i") < F.col("d_j")),
    ).select(
        "event_type",
        F.expr(
            "CAST(CASE WHEN c_j >= c_i"
            " THEN (1000000 * (c_j - c_i)) div (d_j - d_i)"
            " ELSE -((1000000 * (c_i - c_j) + (d_j - d_i) - 1)"
            " div (d_j - d_i)) END AS BIGINT)"
        ).alias("slope_micro"),
    )
    w = Window.partitionBy("event_type").orderBy("slope_micro")
    ranked = slopes.withColumn("rn", F.row_number().over(w))
    counts = slopes.groupBy("event_type").agg(
        F.count(F.lit(1)).alias("n_pairs")
    )
    return (
        ranked.join(F.broadcast(counts), "event_type")
        .filter(F.expr("rn = (n_pairs + 1) div 2"))
        .select(
            "event_type",
            F.col("n_pairs").cast("bigint").alias("n_pairs"),
            F.col("slope_micro").cast("bigint").alias(
                "slope_micro_per_day"
            ),
        )
    )


register(
    "events_theil_sen_slope",
    f"""
WITH daily AS (
  SELECT event_type, CAST(ts AS DATE) AS day, COUNT(*) AS c
  FROM events GROUP BY 1, 2
),
idx AS (
  SELECT event_type, date_diff('day', DATE '2024-01-01', day) AS d, c
  FROM daily
),
slopes AS (
  SELECT a.event_type,
         CAST(CASE WHEN b.c >= a.c
              THEN CAST((1000000 * (b.c - a.c)) // (b.d - a.d)
                        AS BIGINT)
              ELSE -CAST((1000000 * (a.c - b.c) + (b.d - a.d) - 1)
                         // (b.d - a.d) AS BIGINT) END AS BIGINT)
           AS slope_micro
  FROM idx a JOIN idx b
    ON a.event_type = b.event_type AND a.d < b.d
),
ranked AS (
  SELECT event_type, slope_micro,
         ROW_NUMBER() OVER (PARTITION BY event_type
                            ORDER BY slope_micro) AS rn,
         COUNT(*) OVER (PARTITION BY event_type) AS n_pairs
  FROM slopes
)
SELECT event_type,
       CAST(n_pairs AS BIGINT) AS n_pairs,
       CAST(slope_micro AS BIGINT) AS slope_micro_per_day
FROM ranked
WHERE rn = (n_pairs + 1) // 2
""",
)(events_theil_sen_slope)


def events_ols_trend(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Ordinary-least-squares trend of daily REVENUE per event type —
    the classical-regression companion to ``events_theil_sen_slope``'s
    robust slope (same series family, L2 vs median-of-slopes): for
    each type, regress the daily value total (exact cents — the
    testdata's value column lives on a 2-dp grid) on the day index
    and report the closed-form normal-equation solution
    ``slope = (nΣdy − ΣdΣy) / (nΣd² − (Σd)²)``.

    Determinism contract: everything is EXACT int64 — y in cents, the
    four moment sums as plain integer SUMs, the slope/intercept
    NUMERATORS and the shared DENOMINATOR emitted as exact integers
    (so the regression is fully auditable), and the headline
    ``slope_milli_cents_per_day`` via the sign-split floor division
    idiom (truncating div == flooring // only on non-negative
    operands). No transcendental, no float, nothing off the grid —
    the reason a textbook `covar_pop/var_pop` formulation is banned
    from hashed outputs here.

    Scale shape: ONE fact scan → (type, day) partial-aggregated
    rollup (bounded |types|·|days|) → per-type moment sums (bounded
    |types| rows) → arithmetic on scalars. Magnitude audit (sf0.1):
    Σdy ≈ 7·10^9 cent·days, slope_num ≤ n·Σdy ≈ 2·10^11, ×1000 ≈
    2·10^14; intercept_num ≈ Σy·den ≈ 3·10^13 (emitted in plain
    CENTS — a ×1000 there would cross 2^53 and corrupt DuckDB's
    double-promoted ``//``) — exact int64 everywhere."""
    ev = load_table(spark, sf_dir, "events")
    daily = ev.groupBy(
        "event_type", F.to_date("ts").alias("day")
    ).agg(
        F.sum(F.expr("CAST(round(value * 100) AS BIGINT)")).alias(
            "y_cents"
        )
    )
    moments = daily.select(
        "event_type",
        F.expr("CAST(datediff(day, DATE'2024-01-01') AS BIGINT)").alias(
            "d"
        ),
        "y_cents",
    ).groupBy("event_type").agg(
        F.count(F.lit(1)).alias("n"),
        F.sum("d").alias("sd"),
        F.sum(F.expr("d * d")).alias("sdd"),
        F.sum("y_cents").alias("sy"),
        F.sum(F.expr("d * y_cents")).alias("sdy"),
    )
    return moments.select(
        "event_type",
        F.col("n").cast("bigint").alias("n_days"),
        F.col("sy").cast("bigint").alias("sum_y_cents"),
        F.expr("CAST(n * sdy - sd * sy AS BIGINT)").alias("slope_num"),
        F.expr("CAST(n * sdd - sd * sd AS BIGINT)").alias("den"),
        F.expr(
            "CAST(CASE WHEN n * sdy - sd * sy >= 0"
            " THEN (1000 * (n * sdy - sd * sy))"
            " div (n * sdd - sd * sd)"
            " ELSE -((1000 * (sd * sy - n * sdy)"
            " + (n * sdd - sd * sd) - 1)"
            " div (n * sdd - sd * sd)) END AS BIGINT)"
        ).alias("slope_milli_cents_per_day"),
        F.expr(
            "CAST(sy * (n * sdd - sd * sd)"
            " - (n * sdy - sd * sy) * sd AS BIGINT)"
        ).alias("intercept_num"),
        # intercept in plain CENTS: the ×1000 milli scaling would push
        # the numerator (~3·10^13 at sf0.1) past 2^53 for DuckDB's
        # double-promoted // — cents keep it at ~10^13, exact both
        # engines
        F.expr(
            "CAST(CASE WHEN sy * (n * sdd - sd * sd)"
            " - (n * sdy - sd * sy) * sd >= 0"
            " THEN (sy * (n * sdd - sd * sd)"
            " - (n * sdy - sd * sy) * sd)"
            " div (n * (n * sdd - sd * sd))"
            " ELSE -(((n * sdy - sd * sy) * sd"
            " - sy * (n * sdd - sd * sd)"
            " + n * (n * sdd - sd * sd) - 1)"
            " div (n * (n * sdd - sd * sd))) END AS BIGINT)"
        ).alias("intercept_cents"),
    ).orderBy("event_type")


register(
    "events_ols_trend",
    """
WITH daily AS (
  SELECT event_type, CAST(ts AS DATE) AS day,
         SUM(CAST(round(value * 100) AS BIGINT)) AS y_cents
  FROM events GROUP BY 1, 2
),
m AS (
  SELECT event_type,
         COUNT(*) AS n,
         SUM(date_diff('day', DATE '2024-01-01', day)) AS sd,
         SUM(date_diff('day', DATE '2024-01-01', day)
             * date_diff('day', DATE '2024-01-01', day)) AS sdd,
         SUM(y_cents) AS sy,
         SUM(date_diff('day', DATE '2024-01-01', day) * y_cents) AS sdy
  FROM daily GROUP BY 1
)
SELECT event_type,
       CAST(n AS BIGINT) AS n_days,
       CAST(sy AS BIGINT) AS sum_y_cents,
       CAST(n * sdy - sd * sy AS BIGINT) AS slope_num,
       CAST(n * sdd - sd * sd AS BIGINT) AS den,
       CAST(CASE WHEN n * sdy - sd * sy >= 0
            THEN CAST((1000 * (n * sdy - sd * sy))
                      // (n * sdd - sd * sd) AS BIGINT)
            ELSE -CAST((1000 * (sd * sy - n * sdy)
                        + (n * sdd - sd * sd) - 1)
                       // (n * sdd - sd * sd) AS BIGINT) END AS BIGINT)
         AS slope_milli_cents_per_day,
       CAST(sy * (n * sdd - sd * sd)
            - (n * sdy - sd * sy) * sd AS BIGINT) AS intercept_num,
       CAST(CASE WHEN sy * (n * sdd - sd * sd)
                      - (n * sdy - sd * sy) * sd >= 0
            THEN CAST((sy * (n * sdd - sd * sd)
                       - (n * sdy - sd * sy) * sd)
                      // (n * (n * sdd - sd * sd)) AS BIGINT)
            ELSE -CAST(((n * sdy - sd * sy) * sd
                        - sy * (n * sdd - sd * sd)
                        + n * (n * sdd - sd * sd) - 1)
                       // (n * (n * sdd - sd * sd)) AS BIGINT)
            END AS BIGINT) AS intercept_cents
FROM m
ORDER BY event_type
""",
)(events_ols_trend)


def events_holt_winters_forecast(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Holt-Winters ADDITIVE triple-exponential smoothing (level +
    trend + day-of-week seasonality, alpha = beta = gamma = 1/2) over
    each type's daily centi totals — the seasonal upgrade of
    ``events_holt_forecast`` for the strongly weekly-periodic series
    this data actually is (a trend-only smoother chases the weekend
    dip every Monday):

        d  = t mod 7
        L' = floor((x_t − S[d] + L + B) / 2)
        B' = floor((L' − L + B) / 2)
        S'[d] = floor((x_t − L' + S[d]) / 2)

    seeded from week one (L = floor(mean week 1), B = 0,
    S[i] = x_i − L) and folded from day 8 on; forecast for day n+1 is
    L + B + S[(n) mod 7].

    Same engineering contract as Holt: the recurrence is sequential
    per key, so it runs as ONE Catalyst ``aggregate()`` fold JVM-side
    — the seasonal array lives in the accumulator struct and updates
    via an index-aware ``transform`` — over the calendar-bounded
    day-sorted array; every update is an integer floor (the /2.0
    double path is exact under 2^52), and the DuckDB twin is a
    recursive CTE carrying the seven seasonal columns explicitly.
    Types shorter than 8 days are excluded (not enough data to seed a
    weekly profile) in both engines."""
    ev = load_table(spark, sf_dir, "events")
    daily = ev.groupBy(
        "event_type", F.to_date("ts").alias("day")
    ).agg(
        F.sum(
            (F.col("value").cast("decimal(12,2)") * 100).cast("bigint")
        ).alias("obs")
    )
    series = (
        daily.groupBy("event_type")
        .agg(
            F.sort_array(F.collect_list(F.struct("day", "obs"))).alias("s")
        )
        .filter(F.size("s") >= 8)
        .withColumn(
            "l0",
            F.expr(
                "CAST(floor(CAST(aggregate(slice(s, 1, 7),"
                " CAST(0 AS BIGINT), (a, x) -> a + x.obs) AS DOUBLE)"
                " / 7.0) AS BIGINT)"
            ),
        )
    )
    lvl = (
        "floor(CAST(x.obs"
        " - element_at(acc.s, CAST(acc.i % 7 AS INT) + 1)"
        " + acc.level + acc.trend AS DOUBLE) / 2.0)"
    )
    fold = F.expr(
        f"""
        aggregate(
          slice(s, 8, size(s) - 7),
          named_struct(
            'level', l0,
            'trend', CAST(0 AS BIGINT),
            's', transform(slice(s, 1, 7), x -> x.obs - l0),
            'i', 7
          ),
          (acc, x) -> named_struct(
            'level', {lvl},
            'trend',
            floor(CAST({lvl} - acc.level + acc.trend AS DOUBLE) / 2.0),
            's',
            transform(
              acc.s,
              (v, j) -> IF(
                j = CAST(acc.i % 7 AS INT),
                floor(CAST(x.obs - {lvl} + v AS DOUBLE) / 2.0),
                v
              )
            ),
            'i', acc.i + 1
          )
        )
        """
    )
    return series.select(
        "event_type",
        F.size("s").cast("bigint").alias("n_days"),
        fold.alias("hw"),
    ).select(
        "event_type",
        "n_days",
        F.col("hw.level").cast("bigint").alias("level_centi"),
        F.col("hw.trend").cast("bigint").alias("trend_centi"),
        F.expr(
            "CAST(element_at(hw.s, CAST(n_days % 7 AS INT) + 1)"
            " AS BIGINT)"
        ).alias("seasonal_next_centi"),
        F.expr(
            "CAST(hw.level + hw.trend"
            " + element_at(hw.s, CAST(n_days % 7 AS INT) + 1)"
            " AS BIGINT)"
        ).alias("forecast_centi"),
    )


def _hw_oracle() -> str:
    lvl = (
        "floor((x.obs - (CASE h.i % 7"
        " WHEN 0 THEN h.s0 WHEN 1 THEN h.s1 WHEN 2 THEN h.s2"
        " WHEN 3 THEN h.s3 WHEN 4 THEN h.s4 WHEN 5 THEN h.s5"
        " ELSE h.s6 END) + h.level + h.trend) / 2.0)"
    )
    s_next = " ,\n         ".join(
        f"CAST(CASE WHEN h.i % 7 = {k}"
        f" THEN floor((x.obs - CAST({lvl} AS BIGINT) + h.s{k}) / 2.0)"
        f" ELSE h.s{k} END AS BIGINT) AS s{k}"
        for k in range(7)
    )
    seed_s = ",\n         ".join(
        f"CAST(MAX(CASE WHEN i = {k + 1} THEN obs END)"
        f" - floor(SUM(obs) / 7.0) AS BIGINT) AS s{k}"
        for k in range(7)
    )
    return f"""
WITH RECURSIVE daily AS (
  SELECT event_type, CAST(ts AS DATE) AS day,
         CAST(SUM(CAST(CAST(value AS DECIMAL(12,2)) * 100 AS BIGINT))
              AS BIGINT) AS obs
  FROM events GROUP BY 1, 2
),
idx AS (
  SELECT event_type, obs,
         row_number() OVER (PARTITION BY event_type ORDER BY day) AS i,
         COUNT(*) OVER (PARTITION BY event_type) AS n
  FROM daily
),
seed AS (
  SELECT event_type, 7 AS i, MAX(n) AS n,
         CAST(floor(SUM(obs) / 7.0) AS BIGINT) AS level,
         CAST(0 AS BIGINT) AS trend,
         {seed_s}
  FROM idx WHERE i <= 7 AND n >= 8
  GROUP BY event_type
),
hw AS (
  SELECT * FROM seed
  UNION ALL
  SELECT h.event_type, h.i + 1, h.n,
         CAST({lvl} AS BIGINT),
         CAST(floor((CAST({lvl} AS BIGINT) - h.level + h.trend) / 2.0)
              AS BIGINT),
         {s_next}
  FROM hw h
  JOIN idx x ON x.event_type = h.event_type AND x.i = h.i + 1
)
SELECT event_type,
       CAST(n AS BIGINT) AS n_days,
       level AS level_centi,
       trend AS trend_centi,
       CAST(CASE n % 7
            WHEN 0 THEN s0 WHEN 1 THEN s1 WHEN 2 THEN s2
            WHEN 3 THEN s3 WHEN 4 THEN s4 WHEN 5 THEN s5
            ELSE s6 END AS BIGINT) AS seasonal_next_centi,
       CAST(level + trend + (CASE n % 7
            WHEN 0 THEN s0 WHEN 1 THEN s1 WHEN 2 THEN s2
            WHEN 3 THEN s3 WHEN 4 THEN s4 WHEN 5 THEN s5
            ELSE s6 END) AS BIGINT) AS forecast_centi
FROM hw WHERE i = n
"""


register("events_holt_winters_forecast", _hw_oracle())(
    events_holt_winters_forecast
)


def events_stl_decompose(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Classical seasonal-trend decomposition (the moving-average STL
    ancestor) of each type's daily centi totals: trend = centered
    7-day moving average, seasonal = the mean detrended value of each
    day-of-week CENTERED to sum ~0, residual = the rest — the
    decomposition REPORT (what moved: trend, weekday pattern, or
    noise?) that complements the Holt-Winters FORECAST.

    Determinism: every component is an integer floor of an exact sum
    (floor(CAST(Σ AS DOUBLE)/n) — exact under 2^52, negative-safe in
    both engines); day-of-week is datediff-mod-7 from a shared epoch
    literal (never engine dayofweek conventions). Only days with a
    FULL 7-day window carry a trend (the classical edge rule).

    Scale shape: one fact scan → type×day rollup; the trend is a
    7-row window per type over that calendar-bounded frame; the
    seasonal profile is a ≤|types|·7-row rollup broadcast back;
    everything after the first rollup is tiny."""
    ev = load_table(spark, sf_dir, "events")
    daily = ev.groupBy(
        "event_type", F.to_date("ts").alias("day")
    ).agg(
        F.sum(
            (F.col("value").cast("decimal(12,2)") * 100).cast("bigint")
        ).alias("obs")
    )
    w = (
        Window.partitionBy("event_type")
        .orderBy("day")
        .rowsBetween(-3, 3)
    )
    trended = (
        daily.withColumn("wsum", F.sum("obs").over(w))
        .withColumn("wn", F.count(F.lit(1)).over(w))
        .filter(F.col("wn") == 7)
        .withColumn(
            "trend",
            F.expr("CAST(floor(CAST(wsum AS DOUBLE) / 7.0) AS BIGINT)"),
        )
        .withColumn("detrended", F.col("obs") - F.col("trend"))
        .withColumn(
            "dow",
            F.expr("datediff(day, DATE'2024-01-01') % 7").cast("int"),
        )
        .localCheckpoint(eager=True)  # feeds profile AND final join
    )
    raw = trended.groupBy("event_type", "dow").agg(
        F.expr(
            "CAST(floor(CAST(SUM(detrended) AS DOUBLE) / COUNT(*))"
            " AS BIGINT)"
        ).alias("s_raw")
    )
    adj = raw.groupBy("event_type").agg(
        F.expr(
            "CAST(floor(CAST(SUM(s_raw) AS DOUBLE) / 7.0) AS BIGINT)"
        ).alias("s_adj")
    )
    seasonal = raw.join(adj, "event_type").select(
        "event_type",
        "dow",
        (F.col("s_raw") - F.col("s_adj")).alias("seasonal"),
    )
    return (
        trended.join(F.broadcast(seasonal), ["event_type", "dow"])
        .select(
            "event_type",
            "day",
            F.col("obs").cast("bigint").alias("obs_centi"),
            F.col("trend").cast("bigint").alias("trend_centi"),
            F.col("seasonal").cast("bigint").alias("seasonal_centi"),
            (F.col("obs") - F.col("trend") - F.col("seasonal"))
            .cast("bigint")
            .alias("residual_centi"),
        )
    )


register(
    "events_stl_decompose",
    """
WITH daily AS (
  SELECT event_type, CAST(ts AS DATE) AS day,
         CAST(SUM(CAST(CAST(value AS DECIMAL(12,2)) * 100 AS BIGINT))
              AS BIGINT) AS obs
  FROM events GROUP BY 1, 2
),
trended AS (
  SELECT *,
         CAST(floor(CAST(wsum AS DOUBLE) / 7.0) AS BIGINT) AS trend,
         obs - CAST(floor(CAST(wsum AS DOUBLE) / 7.0) AS BIGINT)
           AS detrended,
         CAST(date_diff('day', DATE '2024-01-01', day) % 7 AS INT)
           AS dow
  FROM (
    SELECT event_type, day, obs,
           SUM(obs) OVER (PARTITION BY event_type ORDER BY day
                          ROWS BETWEEN 3 PRECEDING AND 3 FOLLOWING)
             AS wsum,
           COUNT(*) OVER (PARTITION BY event_type ORDER BY day
                          ROWS BETWEEN 3 PRECEDING AND 3 FOLLOWING)
             AS wn
    FROM daily
  )
  WHERE wn = 7
),
raw AS (
  SELECT event_type, dow,
         CAST(floor(CAST(SUM(detrended) AS DOUBLE) / COUNT(*))
              AS BIGINT) AS s_raw
  FROM trended GROUP BY 1, 2
),
adj AS (
  SELECT event_type,
         CAST(floor(CAST(SUM(s_raw) AS DOUBLE) / 7.0) AS BIGINT)
           AS s_adj
  FROM raw GROUP BY 1
),
seasonal AS (
  SELECT r.event_type, r.dow, r.s_raw - a.s_adj AS seasonal
  FROM raw r JOIN adj a ON a.event_type = r.event_type
)
SELECT t.event_type, t.day,
       CAST(t.obs AS BIGINT) AS obs_centi,
       CAST(t.trend AS BIGINT) AS trend_centi,
       CAST(s.seasonal AS BIGINT) AS seasonal_centi,
       CAST(t.obs - t.trend - s.seasonal AS BIGINT) AS residual_centi
FROM trended t
JOIN seasonal s ON s.event_type = t.event_type AND s.dow = t.dow
""",
)(events_stl_decompose)


def events_conversion_lag(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Time-to-convert distribution: for every user whose first
    purchase follows their first view, the view→purchase lag in whole
    minutes, summarized as exact p50/p90/p99 — the latency readout the
    funnel's REACH numbers (events_funnel) don't carry.

    Determinism: lag minutes are exact integers
    (``(floor(epoch(p)) − floor(epoch(v))) div 60`` — the portable
    truncating-epoch idiom; non-negative, so div ≡ //); the
    percentiles are the smallest lag whose cumulative user count
    reaches ⌈q·n⌉, selected from the count-of-counts rollup (the
    adjudicated equi-depth idiom).

    Scale shape: two filtered aggregations and one join, all keyed on
    user_id (one partitioning serves the plan); the percentile scan
    runs over the DISTINCT-lag rollup — bounded by minutes in the
    observation window (calendar-bounded), never user-count-sized."""
    ev = load_table(spark, sf_dir, "events")
    views = (
        ev.filter(F.col("event_type") == "view")
        .groupBy("user_id")
        .agg(F.min("ts").alias("v_ts"))
    )
    first_purchase_after = (
        ev.filter(F.col("event_type") == "purchase")
        .join(views, "user_id")
        .filter(F.col("ts") > F.col("v_ts"))
        .groupBy("user_id", "v_ts")
        .agg(F.min("ts").alias("p_ts"))
    )
    lags = first_purchase_after.select(
        F.expr(
            "CAST((CAST(floor(unix_timestamp(p_ts)) AS BIGINT)"
            " - CAST(floor(unix_timestamp(v_ts)) AS BIGINT))"
            " div 60 AS BIGINT)"
        ).alias("lag_min")
    )
    hist = lags.groupBy("lag_min").agg(F.count(F.lit(1)).alias("c"))
    w = Window.orderBy("lag_min").rowsBetween(
        Window.unboundedPreceding, Window.currentRow
    )
    cum = hist.select(
        "lag_min",
        F.sum("c").over(w).alias("cum"),
        F.sum("c").over(
            Window.orderBy("lag_min").rowsBetween(
                Window.unboundedPreceding, Window.unboundedFollowing
            )
        ).alias("n"),
    )

    def pick(q_milli: int, alias: str):
        return F.min(
            F.when(
                F.col("cum") * 1000 >= F.lit(q_milli) * F.col("n"),
                F.col("lag_min"),
            )
        ).alias(alias)

    return cum.agg(
        F.max("n").cast("bigint").alias("n_converted"),
        pick(500, "p50_lag_min").cast("bigint").alias("p50_lag_min"),
        pick(900, "p90_lag_min").cast("bigint").alias("p90_lag_min"),
        pick(990, "p99_lag_min").cast("bigint").alias("p99_lag_min"),
    )


register(
    "events_conversion_lag",
    """
WITH views AS (
  SELECT user_id, MIN(ts) AS v_ts FROM events
  WHERE event_type = 'view' GROUP BY 1
),
conv AS (
  SELECT e.user_id, v.v_ts, MIN(e.ts) AS p_ts
  FROM events e JOIN views v ON v.user_id = e.user_id
  WHERE e.event_type = 'purchase' AND e.ts > v.v_ts
  GROUP BY 1, 2
),
lags AS (
  SELECT CAST((CAST(floor(epoch(p_ts)) AS BIGINT)
               - CAST(floor(epoch(v_ts)) AS BIGINT)) // 60 AS BIGINT)
           AS lag_min
  FROM conv
),
hist AS (SELECT lag_min, COUNT(*) AS c FROM lags GROUP BY 1),
cum AS (
  SELECT lag_min,
         SUM(c) OVER (ORDER BY lag_min
                      ROWS BETWEEN UNBOUNDED PRECEDING
                      AND CURRENT ROW) AS cum,
         SUM(c) OVER () AS n
  FROM hist
)
SELECT CAST(MAX(n) AS BIGINT) AS n_converted,
       CAST(MIN(CASE WHEN cum * 1000 >= 500 * n THEN lag_min END)
            AS BIGINT) AS p50_lag_min,
       CAST(MIN(CASE WHEN cum * 1000 >= 900 * n THEN lag_min END)
            AS BIGINT) AS p90_lag_min,
       CAST(MIN(CASE WHEN cum * 1000 >= 990 * n THEN lag_min END)
            AS BIGINT) AS p99_lag_min
FROM cum
""",
)(events_conversion_lag)


def events_forecast_model_select(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Forecast MODEL SELECTION by walk-forward error — the decision a
    forecasting platform automates per series: naive (yesterday),
    seasonal-naive (same weekday last week) and Holt each score their
    one-step-ahead MAE over the daily centi series, and the winner is
    the model a deployment would serve for that type. Seasonal-naive
    beating Holt on a strongly weekly series (and vice versa on a
    trending one) is exactly the signal this table carries.

    Determinism: every error is an exact centi integer
    (naive/seasonal-naive as LAG diffs over the bounded daily rollup,
    Holt via the audited integer fold — composed from
    ``events_holt_backtest`` verbatim so constituent fixes
    propagate); MAE is floored integer division; ties break by the
    fixed priority naive < snaive < holt (simpler model wins a tie).
    Each model scores on its OWN forecastable sample (naive from day
    2, seasonal-naive from day 8 — the standard per-model backtest
    convention, stated so the comparison is honest)."""
    ev = load_table(spark, sf_dir, "events")
    daily = ev.groupBy(
        "event_type", F.to_date("ts").alias("day")
    ).agg(
        F.sum(
            (F.col("value").cast("decimal(12,2)") * 100).cast("bigint")
        ).alias("obs")
    )
    w = Window.partitionBy("event_type").orderBy("day")
    diffs = daily.select(
        "event_type",
        F.abs(F.col("obs") - F.lag("obs", 1).over(w)).alias("e1"),
        F.abs(F.col("obs") - F.lag("obs", 7).over(w)).alias("e7"),
    )
    base = diffs.groupBy("event_type").agg(
        F.expr(
            "CAST(SUM(e1) div COUNT(e1) AS BIGINT)"
        ).alias("mae_naive_centi"),
        F.expr(
            "CAST(SUM(e7) div COUNT(e7) AS BIGINT)"
        ).alias("mae_snaive_centi"),
    )
    holt = events_holt_backtest(spark, sf_dir).select(
        "event_type", F.col("mae_centi").alias("mae_holt_centi")
    )
    return (
        base.join(holt, "event_type")
        .withColumn(
            "best_model",
            F.expr(
                "CASE WHEN mae_naive_centi <= mae_snaive_centi"
                " AND mae_naive_centi <= mae_holt_centi THEN 'naive'"
                " WHEN mae_snaive_centi <= mae_holt_centi"
                " THEN 'seasonal_naive' ELSE 'holt' END"
            ),
        )
    )


def _model_select_oracle() -> str:
    from smart_meter_data_pipeline_spark.plans.registry import ORACLES

    return f"""
WITH holt_bt AS ({ORACLES["events_holt_backtest"]}),
daily AS (
  SELECT event_type, CAST(ts AS DATE) AS day,
         CAST(SUM(CAST(CAST(value AS DECIMAL(12,2)) * 100 AS BIGINT))
              AS BIGINT) AS obs
  FROM events GROUP BY 1, 2
),
diffs AS (
  SELECT event_type,
         abs(obs - lag(obs, 1) OVER (PARTITION BY event_type
                                     ORDER BY day)) AS e1,
         abs(obs - lag(obs, 7) OVER (PARTITION BY event_type
                                     ORDER BY day)) AS e7
  FROM daily
),
base AS (
  SELECT event_type,
         CAST(CAST(SUM(e1) AS BIGINT) // COUNT(e1) AS BIGINT)
           AS mae_naive_centi,
         CAST(CAST(SUM(e7) AS BIGINT) // COUNT(e7) AS BIGINT)
           AS mae_snaive_centi
  FROM diffs GROUP BY 1
)
SELECT b.event_type, b.mae_naive_centi, b.mae_snaive_centi,
       CAST(h.mae_centi AS BIGINT) AS mae_holt_centi,
       CASE WHEN b.mae_naive_centi <= b.mae_snaive_centi
             AND b.mae_naive_centi <= h.mae_centi THEN 'naive'
            WHEN b.mae_snaive_centi <= h.mae_centi
              THEN 'seasonal_naive' ELSE 'holt' END AS best_model
FROM base b JOIN holt_bt h ON h.event_type = b.event_type
"""


def _register_model_select() -> None:
    register("events_forecast_model_select", _model_select_oracle())(
        events_forecast_model_select
    )


_register_model_select()


AUC_ERR_THRESHOLD = 14  # label: user emitted at least this many errors


def events_auc_activity(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Exact distributed AUC — the model-eval primitive every
    training pipeline needs at scale, computed WITHOUT the global
    sort that makes naive rank-based AUC a single-partition funnel:
    AUC = P(score_pos > score_neg) + ½P(tie) is a PAIR COUNT, and
    pair counting factors through the per-DISTINCT-SCORE rollup —
    Σ_s p_s·neg_below(s) + ½·p_s·n_s — so the only window runs over
    the distinct integer score levels (bounded by construction, the
    count-of-counts argument), never the user table.

    Demo classifier: per-user activity (event count, integer score)
    predicting heavy error emitters (label: ≥{AUC_ERR_THRESHOLD}
    error events). Everything integer until one final division
    (num2 = 2·Σpairs to avoid halves); degenerate single-class data
    emits NULL auc rather than a fake number.

    Scale shape: one fact scan → per-user rollup (partial agg) →
    distinct-score rollup (≤ max activity levels) → bounded window +
    scalar divide. No sort over users, no join."""
    ev = load_table(spark, sf_dir, "events")
    users = ev.groupBy("user_id").agg(
        F.count(F.lit(1)).alias("score"),
        (
            F.sum(F.when(F.col("event_type") == "error", 1).otherwise(0))
            >= AUC_ERR_THRESHOLD
        ).cast("int").alias("label"),
    )
    by_score = users.groupBy("score").agg(
        F.sum("label").alias("p_s"),
        F.sum(1 - F.col("label")).alias("n_s"),
    )
    w = Window.orderBy("score").rowsBetween(
        Window.unboundedPreceding, -1
    )
    contrib = by_score.withColumn(
        "neg_below", F.coalesce(F.sum("n_s").over(w), F.lit(0))
    ).select(
        (
            F.col("p_s") * (2 * F.col("neg_below"))
            + F.col("p_s") * F.col("n_s")
        ).alias("num2_part"),
        "p_s",
        "n_s",
    )
    totals = contrib.agg(
        F.sum("num2_part").cast("bigint").alias("auc_num2"),
        F.sum("p_s").cast("bigint").alias("n_pos"),
        F.sum("n_s").cast("bigint").alias("n_neg"),
    )
    return totals.select(
        "n_pos",
        "n_neg",
        "auc_num2",
        F.when(
            (F.col("n_pos") > 0) & (F.col("n_neg") > 0),
            F.col("auc_num2").cast("double")
            / (2.0 * F.col("n_pos") * F.col("n_neg")).cast("double"),
        ).alias("auc"),
    )


register(
    "events_auc_activity",
    f"""
WITH users AS (
  SELECT user_id, COUNT(*) AS score,
         CAST(SUM(CASE WHEN event_type = 'error' THEN 1 ELSE 0 END)
              >= {AUC_ERR_THRESHOLD} AS INT) AS label
  FROM events GROUP BY 1
),
by_score AS (
  SELECT score, SUM(label) AS p_s, SUM(1 - label) AS n_s
  FROM users GROUP BY 1
),
contrib AS (
  SELECT p_s, n_s,
         COALESCE(SUM(n_s) OVER (ORDER BY score
                                 ROWS BETWEEN UNBOUNDED PRECEDING
                                 AND 1 PRECEDING), 0) AS neg_below
  FROM by_score
),
totals AS (
  SELECT CAST(SUM(p_s * (2 * neg_below) + p_s * n_s) AS BIGINT)
           AS auc_num2,
         CAST(SUM(p_s) AS BIGINT) AS n_pos,
         CAST(SUM(n_s) AS BIGINT) AS n_neg
  FROM contrib
)
SELECT n_pos, n_neg, auc_num2,
       CASE WHEN n_pos > 0 AND n_neg > 0
            THEN CAST(auc_num2 AS DOUBLE)
                 / CAST(2.0 * n_pos * n_neg AS DOUBLE)
       END AS auc
FROM totals
""",
)(events_auc_activity)
