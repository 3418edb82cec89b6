"""Registry of engine queries and their DuckDB oracle SQL.

Every operator claimed in SURVEY.md §2 gets a named query here. The
callable signature is ``(spark, sf_dir) -> DataFrame``; the oracle is an
ANSI-SQL string DuckDB can run against the same parquet tables
(pre-registered views: region nation customer supplier part orders
lineitem events documents embeddings).

Hash-parity rules (the driver compares sorted-column value hashes):

1. Alias every computed column identically in Spark and SQL.
2. Never SUM raw doubles — FP addition is order-sensitive and Spark's
   partial aggregation order differs from DuckDB's. Instead cast each
   term to DECIMAL, SUM exactly, then CAST the total to DOUBLE:
   ``CAST(SUM(CAST(x AS DECIMAL(25,6))) AS DOUBLE)``. Per-row double
   arithmetic (a*b, a-b) is deterministic and safe.
3. All randomness must come from portable integer-mix hashes, never
   ``rand(seed)`` (engine-specific streams).
"""

from __future__ import annotations

import functools
from collections.abc import Callable

from pyspark.sql import DataFrame, SparkSession

QueryFn = Callable[[SparkSession, str], DataFrame]

QUERIES: dict[str, QueryFn] = {}
ORACLES: dict[str, str] = {}


def register(name: str, oracle: str | None = None) -> Callable[[QueryFn], QueryFn]:
    """Decorator: register a query, optionally with its DuckDB oracle SQL.

    Queries registered without an oracle get the driver's weaker
    rows-only check (reserved for genuinely non-SQL-expressible ops).

    Every registered callable is wrapped to first apply the
    runtime-settable session confs the engine depends on (UTC timezone,
    nanosAsLong parquet reads) so queries behave identically in ANY
    caller-provided SparkSession, not only ``session.get_spark()``'s.
    """

    def deco(fn: QueryFn) -> QueryFn:
        @functools.wraps(fn)
        def wrapped(spark: SparkSession, sf_dir: str) -> DataFrame:
            from smart_meter_data_pipeline_spark.sources.readers import (
                ensure_runtime_confs,
            )

            ensure_runtime_confs(spark)
            return fn(spark, sf_dir)

        QUERIES[name] = wrapped
        if oracle is not None:
            ORACLES[name] = oracle
        return wrapped

    return deco


# Evaluation-priority order. An external harness may evaluate only a
# prefix of the registry (~50 of the len(QUERIES) registered rows per
# round), so order by proof staleness for ROUND 7:
# (0) queries added in round 7 — first driver row needed (inserted at
#     the head as they land);
# (1) the 3 queries whose code materially changed in round 6 AFTER
#     their last driver row (df-capped ngram pair path, append-mode
#     sliding windows) — their green rows predate the new definitions;
# (2) the 12 registered queries that have NEVER had a driver row;
# (3) the 38 whose latest green row is round 4 (the staleness tail) —
#     with (1)+(2) that fills the ~50-row window; anything past the cap
#     rolls to round 8;
# (4) round-5-latest, then (5) round-6-latest (freshest proofs last).
# Names not listed keep registration order after the listed ones.
_PRIORITY = [
    # (0) new in round 7 — first driver row needed
    "tpch_market_share",
    "tpch_order_count_dist",
    "tpch_small_qty_revenue",
    "tpch_disjunctive_revenue",
    "trade_triangles",
    "doc_prefix_dup",
    "tpch_sales_opportunity",
    "embedding_centroid_outliers",
    "manifest_cow_roundtrip",
    "tpch_supplier_part_variety",
    "orders_gap_stats",
    "doc_ttr",
    "stream_restatement_upsert",
    "events_dedup_latest",
    "dedup_semantic_served",
    "manifest_optimize_roundtrip",
    "events_peak_detection",
    "events_cusum_changepoint",
    "supplier_revenue_pareto",
    "nation_self_sufficiency",
    "customer_value_gini",
    "part_brand_price_dispersion",
    "doc_vocab_growth",
    # (1) code changed after last driver row
    "dedup_ngram_jaccard",
    "dedup_ngram_containment",
    "stream_sliding_windows",
    # (2) never driver-evaluated
    "corpus_quality_report",
    "dim_scd2_history",
    "doc_bm25_mlt",
    "doc_chunk_overlap",
    "events_cohort_retention",
    "events_funnel",
    "events_profile",
    "events_zorder_key",
    "source_temperature_sample",
    "stream_score_zscore",
    "tpch_returned_items",
    "tpch_volume_shipping",
    # (3) latest green row is round 4
    "approx_sketch_check",
    "dedup_minhash_lsh",
    "dedup_clusters",
    "ann_pq_topk",
    "meter_quality_incidents",
    "first_last_readings",
    "missing_readings",
    "doc_token_stats",
    "doc_lang_id",
    "doc_quality_score",
    "doc_fingerprint",
    "doc_repetition_ratio",
    "doc_ngram_novelty",
    "doc_pii_scrub",
    "sample_stratified",
    "decontaminate_docs",
    "quality_filter_chain",
    "pack_training_sequences",
    "source_quota_cap",
    "corpus_token_freq",
    "train_val_test_split",
    "corpus_shard_manifest",
    "pricing_summary",
    "top_revenue_orders",
    "nation_revenue",
    "orders_above_customer_avg",
    "dedup_exact",
    "dedup_simhash",
    "kmeans_embeddings",
    "batch_billing_incremental",
    "dedup_redelivery",
    "doc_span_dedup",
    "dedup_simhash_pairs",
    "ann_topk_cosine",
    "embedding_normalize_quantize",
    "embedding_dim_stats",
    "multimodal_features",
    "multimodal_resize",
    # (4) latest green row is round 5
    "dedup_keep_best",
    "events_anomaly_zscore",
    "ann_ivfpq_topk",
    "stream_dedup_watermark",
    "stream_hourly_events",
    "stream_session_windows",
    "stream_stream_interval_join",
    "stream_incremental_deltas",
    "stream_billing_incremental",
    "stream_grid_incremental",
    "events_range_frame",
    "events_range_pairs",
    "stream_static_join",
    "events_ohlc_hourly",
    "user_weekly_wow_change",
    "ann_ivf_topk",
    "stream_ingest_daily",
    "multimodal_frame_sample",
    "kmeans_fixed_rounds",
    "events_json_props",
    "events_cube",
    "meter_gap_fill",
    "corpus_build_pipeline",
    "stg_event_deltas",
    "daily_user_rollup",
    "daily_customer_billing",
    "hourly_nation_load",
    "cumulative_user_value",
    "validation_summary",
    "top_value_users",
    "events_sessionized",
    "events_rollup",
    "event_type_pivot",
    "customers_without_purchase",
    "customers_with_error",
    "events_asof_orders",
    "sliding_window_avg",
    "event_value_percentiles",
    "user_retention_sets",
    "meter_readings",
    "meter_stg",
    "meter_billing_daily",
    "meter_grid_load_hourly",
    "meter_dims",
    "meter_quality_checks",
    "ann_lsh_buckets",
    "dedup_embedding_cosine",
    "ann_lsh_topk",
    # (5) latest green row is round 6 (freshest)
    "stream_meter_sim_totals",
    "meter_sim_source_scan",
    "lang_confusion_matrix",
    "dedup_threshold_sweep",
    "events_burstiness",
    "part_supplier_hhi",
    "dedup_cluster_size_dist",
    "nation_trade_reciprocity",
    "dedup_incremental",
    "event_value_hist_quantiles",
    "corpus_heavy_hitters",
    "vocab_oov_rate",
    "mixture_rebalance",
    "stream_scd2_enrich",
    "events_seasonal_anomaly",
    "doc_tfidf_keywords",
    "events_type_transitions",
    "events_salted_rollup",
    "stream_hist_quantiles",
    "events_drift_report",
    "stream_topk_users",
    "basket_part_pairs",
    "events_local_day_rollup",
    "events_ewma_smooth",
    "nation_daily_peak_hour",
    "events_winsorized_stats",
    "embedding_jl_projection",
    "tpch_priority_checks",
    "dedup_method_agreement",
    "corpus_dedup_rate_by_source",
    "user_value_trend",
    "customer_rfm_segments",
    "nation_trade_balance",
    "events_seasonal_forecast_mae",
    "events_hourly_autocorr",
    "events_interarrival_stats",
    "stream_drift_report",
    "dedup_semantic",
    "stream_outer_interval_join",
    "stream_running_totals",
    "user_value_rank_bands",
    "referential_integrity_audit",
    "pagerank_trade_graph",
    "stream_sessionized_timeout",
    "ann_lsh_multiprobe",
    "stream_full_outer_interval_join",
    "stream_semi_interval_join",
    "tpch_promo_revenue",
    "tpch_large_orders",
    "tpch_top_supplier",
]


def load_all() -> None:
    """Import every module that registers queries (idempotent), then
    order the registry by evaluation priority.

    Import order does NOT control registration order (modules import
    each other, so e.g. importing ``stream_queries`` first would still
    register ``meter_pipeline``'s queries before its own); the explicit
    reorder below does.
    """
    from smart_meter_data_pipeline_spark.operators import (  # noqa: F401
        curation,
        events_pipeline,
        extended,
        graph,
        meter_pipeline,
        tpch,
        dedup,
        text,
        similarity,
        multimodal,
        incremental,
        skew,
    )
    from smart_meter_data_pipeline_spark.streaming import stream_queries  # noqa: F401

    ordered = [n for n in _PRIORITY if n in QUERIES]
    ordered += [n for n in QUERIES if n not in set(ordered)]
    for mapping in (QUERIES, ORACLES):
        snapshot = {n: mapping[n] for n in ordered if n in mapping}
        mapping.clear()
        mapping.update(snapshot)
