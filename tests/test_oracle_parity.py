"""Every registered query with an oracle must hash-match it — the
local replica of the driver's t2 correctness gate."""

from __future__ import annotations

import pytest

from smart_meter_data_pipeline_spark.plans import registry
from tests.oracle import assert_parity, run_oracle

registry.load_all()

ORACLE_CHECKED = sorted(registry.ORACLES)


@pytest.mark.parametrize("name", ORACLE_CHECKED)
def test_oracle_parity(spark, sf_dir, name):
    df = registry.QUERIES[name](spark, sf_dir)
    oracle = run_oracle(registry.ORACLES[name], sf_dir)
    assert_parity(df, oracle, name)


def test_all_queries_run(spark, sf_dir):
    """Rows-only queries (no oracle) must at least execute."""
    for name, fn in registry.QUERIES.items():
        if name in registry.ORACLES:
            continue
        df = fn(spark, sf_dir)
        assert df.count() >= 0, name
