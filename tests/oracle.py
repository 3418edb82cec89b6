"""Local replica of the driver's DuckDB-oracle comparison.

Runs a registered Spark query and its oracle SQL on the same parquet
tables, sorts columns by name and rows by value, and requires exact
cell-level equality (floats compared by full-precision repr — the
engine's exact-decimal aggregation pattern makes this achievable).
"""

from __future__ import annotations

import datetime as dt
import math

import duckdb
import pandas as pd

from smart_meter_data_pipeline_spark.sources.readers import TESTDATA_TABLES


def run_oracle(sql: str, sf_dir: str) -> pd.DataFrame:
    con = duckdb.connect()
    try:
        for t in TESTDATA_TABLES:
            con.execute(
                f"CREATE VIEW {t} AS SELECT * FROM '{sf_dir}/{t}.parquet'"
            )
        return con.execute(sql).fetchdf()
    finally:
        con.close()


def _canon_cell(v) -> str:
    if v is None or v is pd.NaT:
        return "<null>"
    if isinstance(v, float):
        if math.isnan(v):
            return "<null>"
        return repr(v)
    if isinstance(v, (pd.Timestamp, dt.datetime)):
        ts = pd.Timestamp(v)
        if ts.tzinfo is not None:
            ts = ts.tz_convert("UTC").tz_localize(None)
        # DuckDB's fetchdf renders DATE as midnight datetime64; Spark's
        # toPandas keeps datetime.date — same logical value.
        if ts == ts.normalize():
            return ts.date().isoformat()
        return ts.isoformat()
    if isinstance(v, dt.date):
        return v.isoformat()
    if isinstance(v, (bool,)):
        return str(bool(v))
    if pd.isna(v):
        return "<null>"
    return str(v)


def canonical_rows(df: pd.DataFrame) -> list[tuple[str, ...]]:
    cols = sorted(df.columns)
    df = df[cols]
    rows = [tuple(_canon_cell(v) for v in row) for row in df.itertuples(index=False)]
    return sorted(rows)


def assert_parity(spark_df, oracle_df: pd.DataFrame, name: str = "") -> None:
    a = spark_df.toPandas()
    b = oracle_df
    assert sorted(a.columns) == sorted(b.columns), (
        f"{name}: column mismatch {sorted(a.columns)} vs {sorted(b.columns)}"
    )
    assert len(a) == len(b), f"{name}: row count {len(a)} vs {len(b)}"
    ra, rb = canonical_rows(a), canonical_rows(b)
    mismatches = [(x, y) for x, y in zip(ra, rb) if x != y]
    assert not mismatches, (
        f"{name}: {len(mismatches)}/{len(ra)} rows differ; first: "
        f"{mismatches[0][0]} != {mismatches[0][1]}"
    )
