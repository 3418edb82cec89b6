"""Skew mitigation: salted join for hot keys.

AQE's skew-join splitting (on in ``session.py``) handles most skew at
runtime by splitting oversized shuffle partitions. Salting is the
static complement for the pathological case AQE can't fix: ONE key so
hot that a single (key) hash bucket exceeds an executor — e.g. a
null-ish default meter_id, or a celebrity user_id in events. The salted
form spreads that key over ``n_salts`` buckets at the cost of
replicating the (small but not broadcastable) right side n_salts×.

The salt must come from row identity on the LEFT side (salting by the
join key alone re-creates the same hot bucket); here it's a
deterministic hash of the whole row, so replays and retries place rows
identically — no rand(), no partition-id dependence.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F


def salted_join(
    left: DataFrame,
    right: DataFrame,
    on: str,
    n_salts: int = 16,
    how: str = "inner",
) -> DataFrame:
    """Equi-join ``left ⋈ right ON on`` with the left side spread over
    ``n_salts`` sub-buckets per key and the right side replicated to
    meet every bucket. Result equals the plain join (order aside)."""
    salt = F.pmod(
        F.xxhash64(F.struct(*[F.col(c) for c in left.columns])), F.lit(n_salts)
    )
    lhs = left.withColumn("_salt", salt)
    salts = (
        right.sparkSession.range(n_salts)
        .select(F.col("id").cast("int").alias("_salt"))
    )
    rhs = right.crossJoin(F.broadcast(salts))
    joined = lhs.join(rhs, [on, "_salt"], how)
    return joined.drop("_salt")


def events_salted_rollup(spark, sf_dir: str) -> DataFrame:
    """Per-nation rollup routed through :func:`salted_join` — the hash
    gate proves the salted physical plan is RESULT-IDENTICAL to the
    plain equi-join the oracle runs (the whole point of salting: a
    different shuffle layout, the same relation). The left/fact side
    is spread over 16 salt buckets by whole-row hash; the dim side
    replicates 16× via a broadcast cross join, so the hot-key bucket
    that would overflow one executor at 100 TB is split before the
    exchange instead of after (the static complement to AQE's
    skew-join splitting, which cannot split one single key)."""
    from smart_meter_data_pipeline_spark.operators.common import dsum
    from smart_meter_data_pipeline_spark.sources.readers import load_table

    ev = load_table(spark, sf_dir, "events").select("user_id", "value")
    cust = load_table(spark, sf_dir, "customer").select(
        F.col("c_custkey").alias("user_id"), "c_nationkey"
    )
    return (
        salted_join(ev, cust, "user_id")
        .groupBy("c_nationkey")
        .agg(
            F.count(F.lit(1)).alias("n_events"),
            dsum("value", "total_value"),
        )
    )


def _register() -> None:
    from smart_meter_data_pipeline_spark.plans.registry import register

    register(
        "events_salted_rollup",
        """
SELECT c.c_nationkey, COUNT(*) AS n_events,
       CAST(SUM(CAST(e.value AS DECIMAL(25,6))) AS DOUBLE) AS total_value
FROM events e JOIN customer c ON e.user_id = c.c_custkey
GROUP BY 1
""",
    )(events_salted_rollup)


_register()
