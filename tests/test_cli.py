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


def test_cli_maintain_compacts_and_sweeps(spark, tmp_path, capsys):
    import json as _json

    from tests.test_manifest import _valid_batch
    from smart_meter_data_pipeline_spark.sources import manifest as mf

    tdir = str(tmp_path / "m")
    t = mf.ManifestTable(tdir)
    for lo in range(1, 40, 10):
        t.idempotent_append(spark, _valid_batch(spark, lo, lo + 10))
    rc = main(["maintain", tdir, "--keep-last", "1"])
    assert rc == 0
    out = _json.loads(capsys.readouterr().out.strip().splitlines()[-1])
    assert out["commits_merged"] == 3
    assert out["commits_now"] == 2
    assert t.read(spark).count() == 40
