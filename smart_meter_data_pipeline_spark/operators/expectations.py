"""Declarative data-quality expectations — the dbt-tests /
Great-Expectations analog, Spark-first.

The reference ships two forms of data validation: the consumer's
required-field gate (consumer/meter_consumer.py:55-58, engine twin
sources/ingest.py) and the dimension-load verification counts
(02_populate_dimensions.sql:104-107, engine twin
meter_pipeline.meter_quality_checks). This module generalizes both into
a declarative runner any table can use: a suite is DATA (a list of
check dicts), the runner compiles it into as few Spark jobs as
possible, and the report is one tidy DataFrame — the shape dbt's
`schema.yml` tests compile to.

Scale design: every ROW-PREDICATE check on a table (not_null,
non_negative, accepted_values, range) folds into ONE conditional-sum
aggregate over ONE scan of that table — adding a check adds a column to
the partial aggregate, not a pass over the data. Only uniqueness
(groupBy the key) and relationships (anti-join against the referenced
key projection) need their own shuffles, which is inherent: they are
not row-local properties. Nothing collects more than one row per
check."""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from smart_meter_data_pipeline_spark.plans.registry import register
from smart_meter_data_pipeline_spark.sources.readers import load_table


def _violation_expr(check: dict) -> "F.Column":
    """Row-level violation predicate (TRUE = row violates) for the
    row-predicate check kinds."""
    kind = check["kind"]
    col = F.col(check["column"])
    if kind == "not_null":
        return col.isNull()
    if kind == "non_negative":
        return col.isNotNull() & (col < 0)
    if kind == "accepted_values":
        return col.isNotNull() & ~col.isin(check["values"])
    if kind == "in_range":
        lo, hi = check["lo"], check["hi"]
        return col.isNotNull() & ((col < lo) | (col > hi))
    raise ValueError(f"unknown row-predicate kind: {kind}")


def run_expectations(
    spark: SparkSession, sf_dir: str, suite: list[dict]
) -> DataFrame:
    """Execute a suite and return one row per check:
    ``(table_name, check_name, n_violations, passed)``.

    Check dict shapes::

        {"table": t, "kind": "not_null" | "non_negative"
                           | "accepted_values" (+"values")
                           | "in_range" (+"lo","hi"), "column": c}
        {"table": t, "kind": "unique", "columns": [c, ...]}
        {"table": t, "kind": "relationship", "column": c,
         "ref_table": rt, "ref_column": rc}
    """
    by_table: dict[str, list[dict]] = {}
    for c in suite:
        by_table.setdefault(c["table"], []).append(c)

    reports: list[DataFrame] = []
    for table, checks in by_table.items():
        df = load_table(spark, sf_dir, table)
        row_checks = [
            c
            for c in checks
            if c["kind"]
            in ("not_null", "non_negative", "accepted_values", "in_range")
        ]
        if row_checks:
            # ONE scan, one conditional sum per check
            agg = df.agg(
                *[
                    F.sum(_violation_expr(c).cast("long")).alias(
                        f"v{i}"
                    )
                    for i, c in enumerate(row_checks)
                ]
            )
            exploded = agg.select(
                F.explode(
                    F.array(
                        *[
                            F.struct(
                                F.lit(table).alias("table_name"),
                                F.lit(_check_name(c)).alias("check_name"),
                                F.coalesce(
                                    F.col(f"v{i}"), F.lit(0)
                                ).alias("n_violations"),
                            )
                            for i, c in enumerate(row_checks)
                        ]
                    )
                ).alias("r")
            ).select("r.*")
            reports.append(exploded)
        for c in checks:
            if c["kind"] == "unique":
                dup = (
                    df.groupBy(*c["columns"])
                    .agg(F.count(F.lit(1)).alias("n"))
                    .filter(F.col("n") > 1)
                    .agg(
                        F.coalesce(
                            F.sum(F.col("n") - 1), F.lit(0)
                        ).alias("n_violations")
                    )
                )
                reports.append(
                    dup.select(
                        F.lit(table).alias("table_name"),
                        F.lit(_check_name(c)).alias("check_name"),
                        "n_violations",
                    )
                )
            elif c["kind"] == "relationship":
                ref = load_table(spark, sf_dir, c["ref_table"]).select(
                    F.col(c["ref_column"]).alias("__ref")
                )
                orphans = (
                    df.select(F.col(c["column"]).alias("__fk"))
                    .filter(F.col("__fk").isNotNull())
                    .join(
                        ref, F.col("__fk") == F.col("__ref"), "left_anti"
                    )
                    .agg(F.count(F.lit(1)).alias("n_violations"))
                )
                reports.append(
                    orphans.select(
                        F.lit(table).alias("table_name"),
                        F.lit(_check_name(c)).alias("check_name"),
                        "n_violations",
                    )
                )
    out = reports[0]
    for r in reports[1:]:
        out = out.unionByName(r)
    return out.select(
        "table_name",
        "check_name",
        F.col("n_violations").cast("bigint").alias("n_violations"),
        (F.col("n_violations") == 0).alias("passed"),
    )


def _check_name(c: dict) -> str:
    kind = c["kind"]
    if kind == "unique":
        return f"unique_{'_'.join(c['columns'])}"
    if kind == "relationship":
        return f"fk_{c['column']}_to_{c['ref_table']}"
    return f"{kind}_{c['column']}"


# The canonical suite over the TPC-H-ish tables: the dbt-style contract
# a warehouse would ship with this schema. Deliberately includes checks
# that PASS and checks whose violation count is data-dependent (the
# oracle recomputes the same counts, so the hash pins both).
CANONICAL_SUITE: list[dict] = [
    {"table": "customer", "kind": "not_null", "column": "c_custkey"},
    {"table": "customer", "kind": "unique", "columns": ["c_custkey"]},
    {
        "table": "customer",
        "kind": "accepted_values",
        "column": "c_mktsegment",
        "values": [
            "AUTOMOBILE",
            "BUILDING",
            "FURNITURE",
            "HOUSEHOLD",
            "MACHINERY",
        ],
    },
    {"table": "orders", "kind": "unique", "columns": ["o_orderkey"]},
    {"table": "orders", "kind": "non_negative", "column": "o_totalprice"},
    {
        "table": "orders",
        "kind": "relationship",
        "column": "o_custkey",
        "ref_table": "customer",
        "ref_column": "c_custkey",
    },
    {
        "table": "lineitem",
        "kind": "unique",
        "columns": ["l_orderkey", "l_linenumber"],
    },
    {"table": "lineitem", "kind": "non_negative", "column": "l_quantity"},
    {
        "table": "lineitem",
        "kind": "in_range",
        "column": "l_discount",
        "lo": 0.0,
        "hi": 0.5,
    },
    {
        "table": "lineitem",
        "kind": "relationship",
        "column": "l_orderkey",
        "ref_table": "orders",
        "ref_column": "o_orderkey",
    },
    {"table": "nation", "kind": "unique", "columns": ["n_nationkey"]},
    {
        "table": "nation",
        "kind": "relationship",
        "column": "n_regionkey",
        "ref_table": "region",
        "ref_column": "r_regionkey",
    },
]


def dq_expectations_report(spark: SparkSession, sf_dir: str) -> DataFrame:
    """The canonical expectations suite under the driver hash gate:
    12 checks across 5 tables — row predicates folded into one
    conditional-sum scan per table, uniqueness as keyed rollups,
    FKs as anti-joins. Reference parity: generalizes the dimension
    verification counts (02_populate_dimensions.sql:104-107) and the
    consumer's required-field gate into the dbt-tests contract
    shape."""
    return run_expectations(spark, sf_dir, CANONICAL_SUITE)


_DQ_SQL = """
WITH checks AS (
  SELECT 'customer' AS table_name, 'not_null_c_custkey' AS check_name,
         CAST(SUM(CASE WHEN c_custkey IS NULL THEN 1 ELSE 0 END)
              AS BIGINT) AS n_violations
  FROM customer
  UNION ALL
  SELECT 'customer', 'unique_c_custkey',
         CAST(COALESCE(SUM(n - 1), 0) AS BIGINT)
  FROM (SELECT c_custkey, COUNT(*) AS n FROM customer
        GROUP BY 1 HAVING COUNT(*) > 1)
  UNION ALL
  SELECT 'customer', 'accepted_values_c_mktsegment',
         CAST(SUM(CASE WHEN c_mktsegment IS NOT NULL
                        AND c_mktsegment NOT IN
                            ('AUTOMOBILE','BUILDING','FURNITURE',
                             'HOUSEHOLD','MACHINERY')
                       THEN 1 ELSE 0 END) AS BIGINT)
  FROM customer
  UNION ALL
  SELECT 'orders', 'unique_o_orderkey',
         CAST(COALESCE(SUM(n - 1), 0) AS BIGINT)
  FROM (SELECT o_orderkey, COUNT(*) AS n FROM orders
        GROUP BY 1 HAVING COUNT(*) > 1)
  UNION ALL
  SELECT 'orders', 'non_negative_o_totalprice',
         CAST(SUM(CASE WHEN o_totalprice IS NOT NULL
                        AND o_totalprice < 0
                       THEN 1 ELSE 0 END) AS BIGINT)
  FROM orders
  UNION ALL
  SELECT 'orders', 'fk_o_custkey_to_customer',
         CAST(SUM(CASE WHEN o_custkey IS NOT NULL AND c_custkey IS NULL
                       THEN 1 ELSE 0 END) AS BIGINT)
  FROM orders LEFT JOIN customer ON o_custkey = c_custkey
  UNION ALL
  SELECT 'lineitem', 'unique_l_orderkey_l_linenumber',
         CAST(COALESCE(SUM(n - 1), 0) AS BIGINT)
  FROM (SELECT l_orderkey, l_linenumber, COUNT(*) AS n FROM lineitem
        GROUP BY 1, 2 HAVING COUNT(*) > 1)
  UNION ALL
  SELECT 'lineitem', 'non_negative_l_quantity',
         CAST(SUM(CASE WHEN l_quantity IS NOT NULL AND l_quantity < 0
                       THEN 1 ELSE 0 END) AS BIGINT)
  FROM lineitem
  UNION ALL
  SELECT 'lineitem', 'in_range_l_discount',
         CAST(SUM(CASE WHEN l_discount IS NOT NULL
                        AND (l_discount < 0.0 OR l_discount > 0.5)
                       THEN 1 ELSE 0 END) AS BIGINT)
  FROM lineitem
  UNION ALL
  SELECT 'lineitem', 'fk_l_orderkey_to_orders',
         CAST(SUM(CASE WHEN l_orderkey IS NOT NULL AND o_orderkey IS NULL
                       THEN 1 ELSE 0 END) AS BIGINT)
  FROM lineitem LEFT JOIN orders ON l_orderkey = o_orderkey
  UNION ALL
  SELECT 'nation', 'unique_n_nationkey',
         CAST(COALESCE(SUM(n - 1), 0) AS BIGINT)
  FROM (SELECT n_nationkey, COUNT(*) AS n FROM nation
        GROUP BY 1 HAVING COUNT(*) > 1)
  UNION ALL
  SELECT 'nation', 'fk_n_regionkey_to_region',
         CAST(SUM(CASE WHEN n_regionkey IS NOT NULL
                        AND r_regionkey IS NULL
                       THEN 1 ELSE 0 END) AS BIGINT)
  FROM nation LEFT JOIN region ON n_regionkey = r_regionkey
)
SELECT table_name, check_name, n_violations,
       n_violations = 0 AS passed
FROM checks
"""

register("dq_expectations_report", _DQ_SQL)(dq_expectations_report)
