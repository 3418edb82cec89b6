"""Time individual bench-leg computations through the noop sink.

Usage: python tools/time_legs.py <leg> [<leg> ...]

A focused re-measure loop for the optimization round: each leg is the
same computation bench.py times, isolated (noop sink, best of 2) so a
single change can be measured in ~30s instead of a full bench run.
Not a replacement for bench.py — the official numbers come from there.
"""

from __future__ import annotations

import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from smart_meter_data_pipeline_spark.session import get_spark  # noqa: E402

SF_DIR = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")


def _materialize(df) -> None:
    df.write.format("noop").mode("overwrite").save()


def main() -> None:
    spark = get_spark("leg-timer")
    spark.range(1_000_000).selectExpr("sum(id)").collect()  # JVM warmup

    from smart_meter_data_pipeline_spark.operators import (  # noqa: F401
        dedup,
        events_pipeline,
        extended,
        meter_pipeline as mp,
        scale_ops,
        similarity,
        text,
        tpch,
    )
    from smart_meter_data_pipeline_spark.streaming import stream_queries

    legs = {
        "meter_marts_rebuild": lambda: [
            _materialize(m)
            for m in mp.build_all_marts(
                spark, mp.gen_meter_readings(spark, n_meters=20000, n_ticks=96), 20000
            )
        ],
        "stream_ingest_daily": lambda: stream_queries.stream_ingest_daily(
            spark, SF_DIR
        ).count(),
        "events_stg_deltas": lambda: _materialize(
            events_pipeline.stg_event_deltas(spark, SF_DIR)
        ),
        "events_billing_daily": lambda: _materialize(
            events_pipeline.daily_customer_billing(spark, SF_DIR)
        ),
        "events_hourly_load": lambda: _materialize(
            events_pipeline.hourly_nation_load(spark, SF_DIR)
        ),
        "tpch_pricing_summary": lambda: _materialize(
            tpch.pricing_summary(spark, SF_DIR)
        ),
        "range_join_bucketized": lambda: _materialize(
            extended.events_range_join_bucketized(spark, SF_DIR)
        ),
        "dedup_minhash_lsh": lambda: _materialize(
            dedup.dedup_minhash_lsh(spark, SF_DIR)
        ),
        "ann_topk_cosine": lambda: _materialize(
            similarity.ann_topk_cosine(spark, SF_DIR)
        ),
        "ann_ivf_topk": lambda: _materialize(similarity.ann_ivf_topk(spark, SF_DIR)),
        "doc_ngram_novelty": lambda: _materialize(
            text.doc_ngram_novelty(spark, SF_DIR)
        ),
        "doc_bm25_mlt": lambda: _materialize(text.doc_bm25_mlt(spark, SF_DIR)),
        "dedup_clusters": lambda: _materialize(dedup.dedup_clusters(spark, SF_DIR)),
        "dedup_semantic": lambda: _materialize(
            similarity.dedup_semantic(spark, SF_DIR)
        ),
        "dedup_incremental": lambda: _materialize(
            dedup.dedup_incremental(spark, SF_DIR)
        ),
        "dedup_edit_distance": lambda: _materialize(
            dedup.dedup_edit_distance(spark, SF_DIR)
        ),
        "bloom_semijoin": lambda: _materialize(
            scale_ops.lineitem_bloom_semijoin(spark, SF_DIR)
        ),
        "prefix_filter_join": lambda: _materialize(
            dedup.dedup_prefix_filter_join(spark, SF_DIR)
        ),
        "kmeans_fixed_rounds": lambda: _materialize(
            similarity.kmeans_fixed_rounds(spark, SF_DIR)
        ),
        "kmeans_silhouette": lambda: _materialize(
            similarity.kmeans_silhouette(spark, SF_DIR)
        ),
    }

    names = sys.argv[1:] or list(legs)
    out: dict[str, list[float]] = {}
    for name in names:
        fn = legs[name]
        runs = []
        for _ in range(2):
            spark.sparkContext.setJobDescription(f"leg: {name}")
            t0 = time.monotonic()
            fn()
            runs.append(round(time.monotonic() - t0, 3))
        out[name] = runs
        print(f"{name}: {runs} (best {min(runs)})", flush=True)
    print(json.dumps(out))


if __name__ == "__main__":
    main()
