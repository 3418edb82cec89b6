"""Declarative expectations runner: generic behavior on synthetic
tables with KNOWN violations (the canonical TPC-H suite is covered by
the oracle-parity gate; this pins the runner itself)."""

from __future__ import annotations

import pytest

from smart_meter_data_pipeline_spark.operators import expectations


def _run_on_df(spark, df, suite, monkeypatch):
    """Route load_table to in-memory frames so the runner is testable
    without parquet files."""
    tables = {"t": df}
    if any(c.get("ref_table") for c in suite):
        tables.update(
            {
                c["ref_table"]: c.pop("_ref_df")
                for c in suite
                if "_ref_df" in c
            }
        )
    monkeypatch.setattr(
        expectations,
        "load_table",
        lambda spark_, sf_dir_, name: tables[name],
    )
    out = expectations.run_expectations(spark, "unused", suite)
    return {r["check_name"]: r for r in out.collect()}


def test_row_predicate_checks_count_violations(spark, monkeypatch):
    df = spark.createDataFrame(
        [
            (1, "ok", 5.0),
            (None, "ok", -1.0),
            (3, "BAD", 0.5),
            (4, None, 2.0),
        ],
        "id long, status string, score double",
    )
    rows = _run_on_df(
        spark,
        df,
        [
            {"table": "t", "kind": "not_null", "column": "id"},
            {"table": "t", "kind": "non_negative", "column": "score"},
            {
                "table": "t",
                "kind": "accepted_values",
                "column": "status",
                "values": ["ok"],
            },
            {
                "table": "t",
                "kind": "in_range",
                "column": "score",
                "lo": 0.0,
                "hi": 3.0,
            },
        ],
        monkeypatch,
    )
    assert rows["not_null_id"]["n_violations"] == 1
    assert rows["non_negative_score"]["n_violations"] == 1
    # NULL status is not an accepted_values violation (dbt semantics:
    # null-ness is not_null's job)
    assert rows["accepted_values_status"]["n_violations"] == 1
    assert rows["in_range_score"]["n_violations"] == 2  # -1.0 and 5.0
    assert not rows["not_null_id"]["passed"]


def test_unique_and_relationship_checks(spark, monkeypatch):
    df = spark.createDataFrame(
        [(1, 10), (1, 10), (1, 20), (2, 99)], "k long, fk long"
    )
    ref = spark.createDataFrame([(10,), (20,)], "rk long")
    suite = [
        {"table": "t", "kind": "unique", "columns": ["k"]},
        {"table": "t", "kind": "unique", "columns": ["k", "fk"]},
        {
            "table": "t",
            "kind": "relationship",
            "column": "fk",
            "ref_table": "ref",
            "ref_column": "rk",
            "_ref_df": ref,
        },
    ]
    rows = _run_on_df(spark, df, suite, monkeypatch)
    # k=1 appears 3x -> 2 extra rows
    assert rows["unique_k"]["n_violations"] == 2
    # (1,10) appears 2x -> 1 extra
    assert rows["unique_k_fk"]["n_violations"] == 1
    # fk=99 has no ref row
    assert rows["fk_fk_to_ref"]["n_violations"] == 1


def test_clean_table_passes_everything(spark, monkeypatch):
    df = spark.createDataFrame([(1, 2.0), (2, 3.0)], "k long, v double")
    rows = _run_on_df(
        spark,
        df,
        [
            {"table": "t", "kind": "not_null", "column": "k"},
            {"table": "t", "kind": "unique", "columns": ["k"]},
            {"table": "t", "kind": "non_negative", "column": "v"},
        ],
        monkeypatch,
    )
    assert all(r["passed"] for r in rows.values())
    assert all(r["n_violations"] == 0 for r in rows.values())


def test_unknown_kind_raises(spark):
    with pytest.raises(ValueError, match="unknown"):
        expectations._violation_expr({"kind": "nope", "column": "x"})
