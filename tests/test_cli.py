"""CLI runner (python -m smart_meter_data_pipeline_spark)."""

from __future__ import annotations

from smart_meter_data_pipeline_spark.__main__ import main


def test_cli_list(capsys):
    assert main(["list"]) == 0
    out = capsys.readouterr().out.strip().splitlines()
    assert len(out) >= 70
    names = {line.split("\t")[0] for line in out}
    assert {"daily_customer_billing", "ann_pq_topk"} <= names


def test_cli_unknown_query(capsys):
    assert main(["run", "no_such_query"]) == 2


def test_cli_quality_gates(spark):
    # reuses the session via getOrCreate; exit 0 = all gates pass
    assert main(["test"]) == 0
