"""Scale-technique operators: runtime Bloom filters, storage-encoding
advice, and weighted priority sampling.

These are engine-side techniques a 100 TB deployment leans on daily:

- ``lineitem_bloom_semijoin`` — the runtime-filter (Bloom semi-join)
  pattern Spark's own ``spark.sql.optimizer.runtime.bloomFilter``
  applies: a compact bitset built from the selective build side prunes
  the probe side BEFORE its shuffle, cutting shuffled bytes by the
  filter's selectivity while the exact join keeps the result identical
  (false positives are dropped by the equi-join; false negatives are
  impossible). The oracle is therefore the PLAIN join — the bitmap can
  use engine-native hashing without any cross-engine parity concern.
- ``events_encoding_advisor`` — the per-column cardinality / size
  profile a columnar warehouse consults to pick parquet encodings
  (dictionary vs plain) and to predict dictionary blow-up before a
  compaction rewrites terabytes with the wrong encoding.
- ``sample_weighted_priority`` — Priority Sampling (Duffield, Lund,
  Thorup, JACM 2007): weight-biased sampling with a deterministic
  portable hash as the uniform variate, top-k by priority w/u. Unlike
  rand()-based reservoirs this is reproducible across engines, ranks
  in one TakeOrdered pass, and supports Horvitz-Thompson estimation
  via the (k+1)-th priority threshold.

Reference parity: the reference engine exposes none of these as named
operators; they generalize its batched-sink + aggregate patterns
(consumer/meter_consumer.py:116-183) to corpus-scale curation, per
SURVEY.md §2's "beyond-reference training-data operations" mandate.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from smart_meter_data_pipeline_spark.operators.common import dsum, dsum_sql
from smart_meter_data_pipeline_spark.plans.registry import register
from smart_meter_data_pipeline_spark.sources.readers import load_table

# ---------------------------------------------------------------------------
# Bloom-filter runtime semi-join
# ---------------------------------------------------------------------------

# 2^16 bits = 8 KiB — constant size regardless of data scale; with the
# bench's ~250 build keys the false-positive rate is ~(k·n/m)^k ≈ 1e-6,
# and even at 10^5 build keys it stays useful (~0.9^3). At a real
# deployment this would be sized from the build-side row estimate; the
# CONSTANT here documents the shape, not a tuning claim.
BLOOM_BITS = 1 << 16
BLOOM_WORDS = BLOOM_BITS // 64
BLOOM_HASHES = 3

URGENT_CUTOFF = "2001-01-01"


def _bloom_positions(key):
    """The k bit positions for a key: xxhash64 with k seeds, mod m.

    Engine-native hashing is deliberate — the Bloom set only gates
    which rows REACH the exact join, never the join's output, so
    cross-engine hash parity is not required (and xxhash64 stays
    JVM-side / codegen'd, unlike an md5-hex decode)."""
    return [
        F.pmod(F.xxhash64(key, F.lit(seed)), F.lit(BLOOM_BITS))
        for seed in range(BLOOM_HASHES)
    ]


def bloom_bitmap_rows(build: DataFrame, key: str) -> list:
    """Aggregate the build side's bit positions into (word, bits)
    rows — at most BLOOM_WORDS of them, independent of build size.

    The tiny collect here is the same driver-side materialization a
    BroadcastExchange performs for Spark's native runtime filter: the
    payload is bounded by the BITMAP size (8 KiB), never by the data.
    """
    pos = build.select(
        F.explode(F.array(*_bloom_positions(F.col(key)))).alias("pos")
    )
    words = pos.groupBy(F.expr("CAST(pos div 64 AS INT)").alias("word")).agg(
        F.expr(
            "bit_or(shiftleft(CAST(1 AS BIGINT), CAST(pos % 64 AS INT)))"
        ).alias("bits")
    )
    return words.collect()


def lineitem_bloom_semijoin(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Revenue rollup over lineitems of recent URGENT orders, with the
    probe side pre-pruned by a Bloom filter built from the selective
    order filter — the runtime-filter pattern that, at 100 TB, cuts
    the lineitem shuffle to ~the match rate before the join runs.

    Plan shape: (1) scan filtered orders once, fold its keys into an
    8 KiB bitset (bounded collect, same shape as a broadcast runtime
    filter); (2) probe each lineitem against the bitset via a 1-row
    broadcast crossJoin + bitwise tests (all codegen'd, no Python);
    (3) the surviving ~selectivity fraction shuffles into the exact
    equi-join, whose semantics make the whole construction
    result-transparent: the oracle is the plain join."""
    orders = load_table(spark, sf_dir, "orders")
    lineitem = load_table(spark, sf_dir, "lineitem")

    build = orders.filter(
        (F.col("o_orderpriority") == "1-URGENT")
        & (F.col("o_orderdate") >= F.lit(URGENT_CUTOFF))
    ).select("o_orderkey")

    rows = bloom_bitmap_rows(build, "o_orderkey")
    bitmap = [0] * BLOOM_WORDS
    for r in rows:
        bitmap[r["word"]] = r["bits"]
    # Sparse literal: only non-zero words enter the plan (map lookup
    # with a 0 default), so the expression stays small even though the
    # logical bitset is BLOOM_WORDS long.
    entries = [(w, bits) for w, bits in enumerate(bitmap) if bits] or [(-1, 0)]
    bitmap_map = F.create_map(
        *[F.lit(v) for w, bits in entries for v in (w, bits)]
    )
    one_row = spark.range(1).select(bitmap_map.alias("bloom"))

    probe = lineitem.crossJoin(F.broadcast(one_row))
    for i, p in enumerate(_bloom_positions(F.col("l_orderkey"))):
        probe = probe.withColumn(f"_bpos{i}", p)
    tests = [
        F.expr(
            f"(coalesce(element_at(bloom, CAST(_bpos{i} div 64 AS INT)),"
            f" CAST(0 AS BIGINT))"
            f" & shiftleft(CAST(1 AS BIGINT), CAST(_bpos{i} % 64 AS INT))) != 0"
        )
        for i in range(BLOOM_HASHES)
    ]
    cond = tests[0]
    for t in tests[1:]:
        cond = cond & t
    pruned = probe.filter(cond).drop(
        "bloom", *[f"_bpos{i}" for i in range(BLOOM_HASHES)]
    )

    return (
        pruned.join(build.withColumnRenamed("o_orderkey", "l_orderkey"), "l_orderkey")
        .groupBy("l_returnflag", "l_linestatus")
        .agg(
            dsum(
                F.col("l_extendedprice") * (F.lit(1.0) - F.col("l_discount")),
                "revenue",
            ),
            F.count(F.lit(1)).cast("bigint").alias("n_items"),
            F.countDistinct("l_orderkey").cast("bigint").alias("n_orders"),
        )
    )


register(
    "lineitem_bloom_semijoin",
    f"""
SELECT l_returnflag, l_linestatus,
       {dsum_sql("l_extendedprice * (1.0 - l_discount)", "revenue")},
       CAST(COUNT(*) AS BIGINT) AS n_items,
       CAST(COUNT(DISTINCT l_orderkey) AS BIGINT) AS n_orders
FROM lineitem
JOIN orders ON l_orderkey = o_orderkey
WHERE o_orderpriority = '1-URGENT'
  AND o_orderdate >= DATE '{URGENT_CUTOFF}'
GROUP BY l_returnflag, l_linestatus
""",
)(lineitem_bloom_semijoin)


# ---------------------------------------------------------------------------
# Column-encoding advisor
# ---------------------------------------------------------------------------

# Dictionary encoding pays when the dictionary is small relative to the
# data: recommend DICT below this distinct-per-million ratio.
DICT_MAX_RATIO_MICRO = 100_000  # n_distinct/n_rows < 10%


def events_encoding_advisor(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Per-column storage profile → parquet-encoding recommendation:
    exact distinct count, distinct-per-million ratio, average encoded
    width (micro-chars), and DICT/PLAIN advice at the
    {DICT_MAX_RATIO_MICRO}μ dictionary threshold.

    This is the planning input a compaction service (see
    sources/manifest.py OPTIMIZE) consults before rewriting terabytes:
    a low-cardinality column rewritten PLAIN wastes the rewrite; a
    high-cardinality column forced DICT blows parquet dictionary pages.

    Scale shape: ONE scan, one multi-distinct aggregate (Spark expands
    to one shuffle per distinct internally but keeps partial
    aggregation map-side), then a 4-row stack — no per-column rescans.
    """
    ev = load_table(spark, sf_dir, "events")
    agg = ev.agg(
        F.count(F.lit(1)).alias("n_rows"),
        F.countDistinct("event_type").alias("d_type"),
        F.countDistinct("user_id").alias("d_user"),
        F.countDistinct("value").alias("d_value"),
        F.countDistinct("props").alias("d_props"),
        F.sum(F.length("event_type").cast("bigint")).alias("w_type"),
        F.sum(F.length(F.col("user_id").cast("string")).cast("bigint")).alias(
            "w_user"
        ),
        # value renders via DECIMAL(12,2) — fixed-width rendering both
        # engines print identically ("1.50"), unlike raw double repr.
        F.sum(
            F.length(
                F.col("value").cast("decimal(12,2)").cast("string")
            ).cast("bigint")
        ).alias("w_value"),
        F.sum(F.length("props").cast("bigint")).alias("w_props"),
    )
    long = agg.select(
        "n_rows",
        F.expr(
            "stack(4,"
            " 'event_type', d_type, w_type,"
            " 'user_id',    d_user, w_user,"
            " 'value',      d_value, w_value,"
            " 'props',      d_props, w_props)"
            " AS (column_name, n_distinct, total_width)"
        ),
    )
    ratio = F.expr("(1000000 * n_distinct) div n_rows")
    return long.select(
        "column_name",
        F.col("n_rows").cast("bigint").alias("n_rows"),
        F.col("n_distinct").cast("bigint").alias("n_distinct"),
        ratio.cast("bigint").alias("distinct_ratio_micro"),
        F.expr("(1000000 * total_width) div n_rows")
        .cast("bigint")
        .alias("avg_width_micro"),
        F.when(ratio < DICT_MAX_RATIO_MICRO, F.lit("DICT"))
        .otherwise(F.lit("PLAIN"))
        .alias("recommended_encoding"),
    )


def _advisor_oracle() -> str:
    cols = {
        "event_type": "event_type",
        "user_id": "CAST(user_id AS VARCHAR)",
        "value": "CAST(CAST(value AS DECIMAL(12,2)) AS VARCHAR)",
        "props": "props",
    }
    branches = []
    for name, expr in cols.items():
        src = name if name != "user_id" else "user_id"
        branches.append(
            f"""
SELECT '{name}' AS column_name,
       CAST(COUNT(*) AS BIGINT) AS n_rows,
       CAST(COUNT(DISTINCT {src}) AS BIGINT) AS n_distinct,
       CAST((1000000 * COUNT(DISTINCT {src})) // COUNT(*) AS BIGINT)
         AS distinct_ratio_micro,
       CAST((1000000 * SUM(length({expr}))) // COUNT(*) AS BIGINT)
         AS avg_width_micro,
       CASE WHEN (1000000 * COUNT(DISTINCT {src})) // COUNT(*)
                 < {DICT_MAX_RATIO_MICRO}
            THEN 'DICT' ELSE 'PLAIN' END AS recommended_encoding
FROM events"""
        )
    return "\nUNION ALL\n".join(branches)


register("events_encoding_advisor", _advisor_oracle())(events_encoding_advisor)


# ---------------------------------------------------------------------------
# Weighted priority sampling
# ---------------------------------------------------------------------------

PRIORITY_SAMPLE_K = 25
# 10 md5 nibbles → u ∈ [0, 16^10): wide enough that priority ties are
# hash collisions only; small enough that w·SCALE // (u+1) stays far
# under 2^53 (exact in both engines' integer division).
_U_NIBBLES = 10
_U_SCALE = 10**12
_HEXCHARS = "0123456789abcdef"


def _uniform_from_md5(spark_side: bool) -> str:
    """Portable uniform integer: first {_U_NIBBLES} md5 nibbles of the
    doc id, decoded base-16 with the instr/strpos idiom both engines
    agree on (same shape as the HLL register hash)."""
    fn = "instr" if spark_side else "strpos"
    h = (
        "md5(CAST(CAST(doc_id AS STRING) AS BINARY))"
        if spark_side
        else "md5(CAST(doc_id AS VARCHAR))"
    )
    terms = [
        f"({fn}('{_HEXCHARS}', substr({h}, {i + 1}, 1)) - 1)"
        f" * CAST({16 ** (_U_NIBBLES - 1 - i)} AS BIGINT)"
        for i in range(_U_NIBBLES)
    ]
    return "(" + " + ".join(terms) + ")"


def sample_weighted_priority(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Priority sampling (Duffield-Lund-Thorup): each document draws a
    deterministic uniform u from md5(doc_id), gets priority
    q = w·{_U_SCALE} // (u+1) with w = n_chars, and the top
    {PRIORITY_SAMPLE_K} priorities are the sample — heavier documents
    are proportionally likelier to rank high, yet the draw is exactly
    reproducible across engines and reruns (no rand()).

    The (k+1)-th priority (the HT threshold τ) rides along on every
    row so a consumer can form the unbiased Horvitz-Thompson weight
    estimate max(w, τ·(u+1)//{_U_SCALE}) without re-scanning.

    Scale shape: per-row hash + one TakeOrdered(k+1) — per-partition
    top-k then a driver merge of k+1 rows; no global sort, no window,
    no shuffle of the corpus."""
    docs = load_table(spark, sf_dir, "documents").select(
        "doc_id", "source", F.col("n_chars").alias("weight")
    )
    u = F.expr(_uniform_from_md5(spark_side=True))
    scored = docs.select(
        "doc_id",
        "source",
        "weight",
        F.expr(f"(weight * {_U_SCALE}) div ({_uniform_from_md5(True)} + 1)")
        .cast("bigint")
        .alias("priority"),
    )
    top = scored.orderBy(F.col("priority").desc(), F.col("doc_id")).limit(
        PRIORITY_SAMPLE_K + 1
    )
    # τ = the smallest of the k+1 priorities; the sample is the other k.
    tau = top.agg(F.min("priority").alias("tau"))
    return (
        top.crossJoin(F.broadcast(tau))
        .orderBy(F.col("priority").desc(), F.col("doc_id"))
        .limit(PRIORITY_SAMPLE_K)
        .select(
            "doc_id",
            "source",
            F.col("weight").cast("bigint").alias("weight"),
            "priority",
            F.col("tau").cast("bigint").alias("tau"),
        )
    )


register(
    "sample_weighted_priority",
    f"""
WITH scored AS (
  SELECT doc_id, source, n_chars AS weight,
         CAST((n_chars * {_U_SCALE})
              // ({_uniform_from_md5(False)} + 1) AS BIGINT) AS priority
  FROM documents
),
top AS (
  SELECT * FROM scored
  ORDER BY priority DESC, doc_id LIMIT {PRIORITY_SAMPLE_K + 1}
),
tau AS (SELECT MIN(priority) AS tau FROM top)
SELECT doc_id, source, CAST(weight AS BIGINT) AS weight, priority,
       CAST(tau AS BIGINT) AS tau
FROM (
  SELECT t.*, tau.tau FROM top t, tau
  ORDER BY priority DESC, doc_id LIMIT {PRIORITY_SAMPLE_K}
)
""",
)(sample_weighted_priority)
