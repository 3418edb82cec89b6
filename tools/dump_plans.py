"""Dump .explain("formatted") for registered queries to text files.

Usage: python tools/dump_plans.py <outdir> <suffix> <query> [<query> ...]

Writes <outdir>/<query>_<suffix>.txt for each name. The plan is the
pre-execution AdaptiveSparkPlan (isFinalPlan=false) — the shape the
optimization round's evidence files record (Exchange count, join
strategy, PushedFilters/ReadSchema, codegen spans).
"""

from __future__ import annotations

import contextlib
import io
import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from smart_meter_data_pipeline_spark.plans import registry  # noqa: E402
from smart_meter_data_pipeline_spark.session import get_spark  # noqa: E402

SF_DIR = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")


def main() -> None:
    outdir, suffix, *names = sys.argv[1:]
    os.makedirs(outdir, exist_ok=True)
    registry.load_all()
    spark = get_spark("plan-dump")
    for name in names:
        spark.sparkContext.setJobDescription(f"plan-dump: {name}")
        df = registry.QUERIES[name](spark, SF_DIR)
        buf = io.StringIO()
        with contextlib.redirect_stdout(buf):
            df.explain("formatted")
        path = os.path.join(outdir, f"{name}_{suffix}.txt")
        with open(path, "w") as fh:
            fh.write(buf.getvalue())
        print(f"wrote {path}")


if __name__ == "__main__":
    main()
