"""Guard against silent physical-encoding drift in the driver testdata.

Round 4 regression: the driver regenerated ``events.parquet`` with
``ts`` as plain TIMESTAMP(MICROS) (no UTC adjustment) where it was
TIMESTAMP(NANOS), and the previously-hardcoded reader/stream schemas
broke 7 tests and one driver row. These tests pin the LOGICAL schema
every operator depends on — if the physical encoding drifts again,
this file fails first (cheap, obvious) instead of seven streaming
tests (expensive, obscure).
"""

from __future__ import annotations

import pytest

from smart_meter_data_pipeline_spark.sources.readers import (
    TESTDATA_TABLES,
    load_table,
    normalize_timestamps,
)

# The logical dtypes the engine is written against. Only columns whose
# physical encoding has drifted before (or plausibly could) are pinned;
# a new column appearing in testdata is NOT a failure.
_EXPECTED = {
    "events": {
        "event_id": "bigint",
        "ts": "timestamp",  # NOT timestamp_ntz, NOT bigint
        "user_id": "bigint",
        "event_type": "string",
        "value": "double",
    },
    "orders": {"o_orderkey": "bigint", "o_totalprice": "double"},
    "lineitem": {"l_orderkey": "bigint", "l_quantity": "double"},
    "documents": {"doc_id": "bigint", "text": "string"},
    "embeddings": {"vec_id": "bigint", "embedding": "array<float>"},
}


@pytest.mark.parametrize("table", sorted(_EXPECTED))
def test_loaded_dtypes_match_engine_expectations(spark, sf_dir, table):
    dtypes = dict(load_table(spark, sf_dir, table).dtypes)
    for col, want in _EXPECTED[table].items():
        assert col in dtypes, f"{table}.{col} missing from testdata"
        assert dtypes[col] == want, (
            f"{table}.{col} loads as {dtypes[col]}, engine expects {want} "
            f"— physical encoding drifted; fix normalize_timestamps in "
            f"sources/readers.py, not the call sites"
        )


def test_no_table_surfaces_ntz_or_raw_nanos(spark, sf_dir):
    """No loaded table may expose timestamp_ntz (watermarks and
    unix_micros reject it) or a raw bigint nano column."""
    from smart_meter_data_pipeline_spark.sources.readers import (
        _NANO_TS_COLUMNS,
    )

    for table in TESTDATA_TABLES:
        dtypes = load_table(spark, sf_dir, table).dtypes
        for col, dtype in dtypes:
            assert dtype != "timestamp_ntz", (
                f"{table}.{col} is timestamp_ntz after load_table — "
                f"normalize_timestamps missed it"
            )
        # the raw-nanos half of the promise: every known time column
        # must load as a real timestamp, never the bigint that a
        # nanosAsLong regression would surface
        for col in _NANO_TS_COLUMNS.get(table, ()):
            got = dict(dtypes).get(col)
            assert got == "timestamp", (
                f"{table}.{col} loads as {got}, expected timestamp — "
                f"raw-nanos bigint leaked through load_table"
            )


def test_normalize_timestamps_handles_both_encodings(spark):
    """The normalizer maps both historical encodings to the same
    instants: bigint nanos (nanosAsLong) and NTZ micros (UTC session)."""
    from pyspark.sql import functions as F

    nanos = spark.range(1).select(
        F.lit(1705316096123456789).alias("ts")  # 2024-01-15T10:54:56.123456789
    )
    out_n = dict(normalize_timestamps(nanos, ("ts",)).dtypes)
    assert out_n["ts"] == "timestamp"

    ntz = spark.range(1).select(
        F.lit("2024-01-15T10:54:56.123456").cast("timestamp_ntz").alias("ts")
    )
    out_z = normalize_timestamps(ntz)
    assert dict(out_z.dtypes)["ts"] == "timestamp"

    v_n = normalize_timestamps(nanos, ("ts",)).collect()[0].ts
    v_z = out_z.collect()[0].ts
    assert v_n == v_z, f"encodings disagree: {v_n} vs {v_z}"


def test_untouched_columns_pass_through(spark):
    """normalize_timestamps must not rewrite unrelated columns."""
    from pyspark.sql import functions as F

    df = spark.range(1).select(
        F.lit(42).alias("some_bigint"),
        F.lit("x").alias("s"),
        F.lit("2024-01-15 00:00:00").cast("timestamp").alias("already_ok"),
    )
    out = normalize_timestamps(df, ("ts",))
    assert out.dtypes == df.dtypes
