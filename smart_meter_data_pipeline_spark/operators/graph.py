"""Iterative graph analytics: fixed-rounds PageRank over the
customer↔supplier trade graph.

The near-dup pipeline already ships one iterative graph operator
(connected components, operators/dedup.py); this module adds the other
canonical one — a damped random-walk centrality — with the engine's
signature trick for iterative float algorithms: the quantized-decimal
grid (see ``kmeans_fixed_rounds``). Every rank and every per-edge
contribution is rounded to 9 decimal digits and carried as
DECIMAL(12,9); sums are exact decimal; the two divisions per round
(contribution r/deg, teleport 0.15/N) run in IEEE double on identical
inputs and are immediately re-quantized — so THREE fixed Lloyd-style
rounds hash-match a mechanically generated DuckDB CTE chain, integer
outputs and all.

Scale design: one round = one equi-join of the edge list against the
rank vector (shuffle keyed by node) + one keyed aggregation — the
standard Pregel-as-joins shape. Edge state (src, dst, deg) is built
once and checkpointed; nothing driver-side except the scalar node
count. At 100 TB the edge list partitions by src and both per-round
shuffles are bounded by |E| and |V|, never |V|²."""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from smart_meter_data_pipeline_spark.plans.registry import register
from smart_meter_data_pipeline_spark.sources.readers import load_table

PAGERANK_ROUNDS = 3
PAGERANK_DAMPING = "0.85"  # decimal literal strings: both engines must
PAGERANK_TELEPORT = "0.15"  # parse the SAME double (0.15 != 1-0.85 in
# general floating point; keeping both as literals sidesteps it)
_GRID = "decimal(12,9)"


def pagerank_trade_graph(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Fixed-seed, fixed-rounds PageRank over the undirected
    customer↔supplier trade graph (distinct (customer, supplier) pairs
    from lineitem ⋈ orders; undirected random walk, so there are no
    dangling-node corrections to diverge on). Nodes are namespaced
    into one BIGINT id space (customer → 2k, supplier → 2k+1).

    Output per node: type, id, degree, and rank_micro =
    ⌊rank × 1e6⌋ after {PAGERANK_ROUNDS} rounds — all integers."""
    li = load_table(spark, sf_dir, "lineitem").select("l_orderkey", "l_suppkey")
    orders = load_table(spark, sf_dir, "orders").select(
        "o_orderkey", "o_custkey"
    )
    pairs = (
        li.join(orders, li.l_orderkey == orders.o_orderkey, "inner")
        .select(
            (F.col("o_custkey") * 2).alias("c_node"),
            (F.col("l_suppkey") * 2 + 1).alias("s_node"),
        )
        .distinct()
    )
    edges = pairs.select(
        F.col("c_node").alias("src"), F.col("s_node").alias("dst")
    ).unionAll(
        pairs.select(F.col("s_node").alias("src"), F.col("c_node").alias("dst"))
    )
    deg = edges.groupBy("src").agg(F.count(F.lit(1)).alias("deg"))
    # Edge state built once, reused every round (the Pregel message
    # topology): src, dst, src's degree.
    edges_deg = edges.join(deg, "src").localCheckpoint(eager=True)
    nodes = deg.select(F.col("src").alias("node"), "deg")
    n_nodes = nodes.agg(F.count(F.lit(1)).alias("n"))

    rank = (
        nodes.join(F.broadcast(n_nodes))
        .select(
            "node",
            F.round(F.lit(1.0) / F.col("n").cast("double"), 9)
            .cast(_GRID)
            .alias("r"),
        )
        .localCheckpoint(eager=True)
    )
    for _ in range(PAGERANK_ROUNDS):
        contrib = edges_deg.join(
            rank, edges_deg.src == rank.node, "inner"
        ).select(
            "dst",
            F.round(
                F.col("r").cast("double") / F.col("deg").cast("double"), 9
            )
            .cast(_GRID)
            .alias("contrib"),
        )
        sums = contrib.groupBy("dst").agg(F.sum("contrib").alias("s"))
        rank = (
            nodes.join(sums, nodes.node == sums.dst, "left")
            .join(F.broadcast(n_nodes))
            .select(
                "node",
                F.round(
                    F.lit(PAGERANK_TELEPORT).cast("double")
                    / F.col("n").cast("double")
                    + F.lit(PAGERANK_DAMPING).cast("double")
                    * F.coalesce(
                        F.col("s"), F.lit("0").cast(_GRID)
                    ).cast("double"),
                    9,
                )
                .cast(_GRID)
                .alias("r"),
            )
            .localCheckpoint(eager=True)
        )

    return rank.join(nodes, "node").select(
        F.when(F.col("node") % 2 == 0, F.lit("customer"))
        .otherwise(F.lit("supplier"))
        .alias("node_type"),
        F.expr("node div 2").alias("node_id"),
        "deg",
        F.floor(F.col("r") * 1000000).cast("bigint").alias("rank_micro"),
    )


def _pagerank_oracle(n_rounds: int = PAGERANK_ROUNDS) -> str:
    """DuckDB twin: one (contrib, sums, rank) CTE triple per round,
    generated mechanically — same grid, same literal constants, same
    double→round(…,9)→DECIMAL(12,9) re-quantization points."""
    parts = []
    for i in range(1, n_rounds + 1):
        parts.append(
            f"""
c{i} AS (
  SELECT e.dst AS node,
         CAST(round(CAST(r.r AS DOUBLE) / CAST(e.deg AS DOUBLE), 9)
              AS DECIMAL(12,9)) AS contrib
  FROM edges_deg e JOIN r{i - 1} r ON e.src = r.node
),
s{i} AS (SELECT node, SUM(contrib) AS s FROM c{i} GROUP BY 1),
r{i} AS (
  SELECT d.node,
         CAST(round(CAST({PAGERANK_TELEPORT} AS DOUBLE) / CAST(nn.n AS DOUBLE)
                    + CAST({PAGERANK_DAMPING} AS DOUBLE)
                      * CAST(COALESCE(s.s, CAST(0 AS DECIMAL(12,9)))
                             AS DOUBLE), 9)
              AS DECIMAL(12,9)) AS r
  FROM deg d CROSS JOIN nn LEFT JOIN s{i} s ON d.node = s.node
)"""
        )
    body = ",".join(parts)
    return f"""
WITH pairs AS (
  SELECT DISTINCT o_custkey * 2 AS c_node, l_suppkey * 2 + 1 AS s_node
  FROM lineitem JOIN orders ON l_orderkey = o_orderkey
),
edges AS (
  SELECT c_node AS src, s_node AS dst FROM pairs
  UNION ALL
  SELECT s_node AS src, c_node AS dst FROM pairs
),
deg AS (SELECT src AS node, COUNT(*) AS deg FROM edges GROUP BY 1),
edges_deg AS (
  SELECT e.src, e.dst, d.deg FROM edges e JOIN deg d ON e.src = d.node
),
nn AS (SELECT COUNT(*) AS n FROM deg),
r0 AS (
  SELECT node, CAST(round(1.0 / CAST(nn.n AS DOUBLE), 9) AS DECIMAL(12,9)) AS r
  FROM deg CROSS JOIN nn
),{body}
SELECT CASE WHEN d.node % 2 = 0 THEN 'customer' ELSE 'supplier' END
         AS node_type,
       d.node // 2 AS node_id,
       d.deg,
       CAST(floor(r.r * 1000000) AS BIGINT) AS rank_micro
FROM r{n_rounds} r JOIN deg d ON r.node = d.node
"""


register("pagerank_trade_graph", _pagerank_oracle())(pagerank_trade_graph)
