"""Iterative graph analytics: fixed-rounds PageRank over the
customer↔supplier trade graph.

The near-dup pipeline already ships one iterative graph operator
(connected components, operators/dedup.py); this module adds the other
canonical one — a damped random-walk centrality — in the engine's most
robust cross-engine form: PURE INT64 ARITHMETIC. Ranks are carried in
nano-units (1.0 == 1e9), every per-round operation is integer floor
division or integer multiply/add, and there is NO double anywhere in
the pipeline — the first cut used round(double, 9) re-quantization (the
kmeans grid) and ONE node in 16.6k at sf0.1 landed on a half-way
rounding boundary where Spark (shortest-repr HALF_UP) and DuckDB
(binary) disagree by 1 ulp. Integer floor division has no such
boundary: ``a div b`` is the same value in every engine.

Semantics: r₀ = ⌊1e9/N⌋; each round every node sends ⌊r/deg⌋ along
each edge and collects r' = ⌊0.15e9/N⌋ + ⌊85·Σmsgs/100⌋. Floor losses
leak ~1 nano-unit per op (bounded drift, deterministic) — the price of
exactness, documented rather than hidden.

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
ONE_NANO = 1_000_000_000  # rank 1.0 in nano-units
TELEPORT_NANO = 150_000_000  # 0.15 in nano-units
DAMP_NUM, DAMP_DEN = 85, 100  # 0.85 as an integer ratio


def pagerank_trade_graph(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Fixed-seed, fixed-rounds integer PageRank over the undirected
    customer↔supplier trade graph (distinct (customer, supplier) pairs
    from lineitem ⋈ orders; undirected random walk, so there are no
    dangling-node corrections to diverge on). Nodes are namespaced
    into one BIGINT id space (customer → 2k, supplier → 2k+1).

    Output per node: type, id, degree, and rank_micro =
    rank_nano div 1000 after {PAGERANK_ROUNDS} rounds — all integers,
    all arithmetic int64."""
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
            F.expr(f"CAST({ONE_NANO} AS BIGINT) div n").alias("r_nano"),
        )
        .localCheckpoint(eager=True)
    )
    for _ in range(PAGERANK_ROUNDS):
        contrib = edges_deg.join(
            rank, edges_deg.src == rank.node, "inner"
        ).select("dst", F.expr("r_nano div deg").alias("contrib"))
        sums = contrib.groupBy("dst").agg(F.sum("contrib").alias("s"))
        rank = (
            nodes.join(sums, nodes.node == sums.dst, "left")
            .join(F.broadcast(n_nodes))
            .select(
                "node",
                (
                    F.expr(f"CAST({TELEPORT_NANO} AS BIGINT) div n")
                    + F.expr(
                        f"({DAMP_NUM} * coalesce(s, CAST(0 AS BIGINT)))"
                        f" div {DAMP_DEN}"
                    )
                ).alias("r_nano"),
            )
            .localCheckpoint(eager=True)
        )

    return rank.join(nodes, "node").select(
        F.when(F.col("node") % 2 == 0, F.lit("customer"))
        .otherwise(F.lit("supplier"))
        .alias("node_type"),
        F.expr("node div 2").alias("node_id"),
        "deg",
        F.expr("r_nano div 1000").alias("rank_micro"),
    )


def _pagerank_oracle(n_rounds: int = PAGERANK_ROUNDS) -> str:
    """DuckDB twin: one (contrib, sums, rank) CTE triple per round,
    generated mechanically — identical int64 floor-division arithmetic
    (every DuckDB ``//`` is wrapped in CAST(... AS BIGINT): the
    operator itself promotes through DOUBLE, but the floored VALUE of
    two non-negative int64s is exact in a double here because every
    intermediate stays < 2^53, so the cast recovers the integer Spark's
    ``div`` produces)."""
    parts = []
    for i in range(1, n_rounds + 1):
        parts.append(
            f"""
c{i} AS (
  SELECT e.dst AS node, CAST(r.r_nano // e.deg AS BIGINT) AS contrib
  FROM edges_deg e JOIN r{i - 1} r ON e.src = r.node
),
s{i} AS (SELECT node, SUM(contrib) AS s FROM c{i} GROUP BY 1),
r{i} AS (
  SELECT d.node,
         CAST(CAST({TELEPORT_NANO} AS BIGINT) // nn.n AS BIGINT)
           + CAST(({DAMP_NUM} * COALESCE(s.s, CAST(0 AS BIGINT)))
                  // {DAMP_DEN} AS BIGINT) AS r_nano
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
  SELECT node, CAST(CAST({ONE_NANO} AS BIGINT) // nn.n AS BIGINT) AS r_nano
  FROM deg CROSS JOIN nn
),{body}
SELECT CASE WHEN d.node % 2 = 0 THEN 'customer' ELSE 'supplier' END
         AS node_type,
       CAST(d.node // 2 AS BIGINT) AS node_id,
       d.deg,
       CAST(r.r_nano // 1000 AS BIGINT) AS rank_micro
FROM r{n_rounds} r JOIN deg d ON r.node = d.node
"""


register("pagerank_trade_graph", _pagerank_oracle())(pagerank_trade_graph)


def trade_triangles(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Triangle counting over the nation-level trade graph — the third
    canonical graph kernel next to connected components (dedup.py) and
    PageRank above. Nodes are nations; an undirected edge (a, b),
    a < b, exists when any lineitem ships from a supplier in one
    nation to a customer in the other. Output per nation: degree and
    the number of triangles it participates in.

    Algorithm: the standard ordered-edge join — enumerate each
    triangle exactly once as (a < b < c) by joining the ordered edge
    list to itself twice (e1=(a,b) ⋈ e2=(b,c) on b, then require edge
    (a,c)). With nations the edge list is tiny and broadcast; on a
    general graph this is the same plan GraphFrames uses, with the
    heavy join shuffling on the shared vertex and the degree-ordering
    trick available if hubs skew (orient edges low-degree → high).
    Reference parity: none (reference has no graph ops); this extends
    SURVEY §2's analytics breadth."""
    li = load_table(spark, sf_dir, "lineitem").select(
        "l_orderkey", "l_suppkey"
    )
    orders = load_table(spark, sf_dir, "orders").select(
        "o_orderkey", "o_custkey"
    )
    cust = load_table(spark, sf_dir, "customer").select(
        "c_custkey", "c_nationkey"
    )
    supp = load_table(spark, sf_dir, "supplier").select(
        "s_suppkey", "s_nationkey"
    )
    pairs = (
        li.join(orders, li.l_orderkey == orders.o_orderkey)
        .join(F.broadcast(supp), li.l_suppkey == supp.s_suppkey)
        .join(cust, orders.o_custkey == cust.c_custkey)
        .select(
            F.col("s_nationkey").cast("bigint").alias("sn"),
            F.col("c_nationkey").cast("bigint").alias("cn"),
        )
        .filter(F.col("sn") != F.col("cn"))
    )
    edges = (
        pairs.select(
            F.least("sn", "cn").alias("a"), F.greatest("sn", "cn").alias("b")
        )
        .distinct()
        .localCheckpoint(eager=True)
    )
    e1 = edges.select(F.col("a").alias("x"), F.col("b").alias("y"))
    e2 = edges.select(F.col("a").alias("y"), F.col("b").alias("z"))
    e3 = edges.select(F.col("a").alias("x"), F.col("b").alias("z"))
    tri = (
        e1.join(e2, "y")
        .join(e3, ["x", "z"], "left_semi")
        .select("x", "y", "z")
    )
    per_node = (
        tri.select(F.col("x").alias("nation_key"))
        .unionAll(tri.select(F.col("y").alias("nation_key")))
        .unionAll(tri.select(F.col("z").alias("nation_key")))
        .groupBy("nation_key")
        .agg(F.count(F.lit(1)).alias("n_triangles"))
    )
    degree = (
        edges.select(F.col("a").alias("nation_key"))
        .unionAll(edges.select(F.col("b").alias("nation_key")))
        .groupBy("nation_key")
        .agg(F.count(F.lit(1)).alias("degree"))
    )
    nation = load_table(spark, sf_dir, "nation").select(
        F.col("n_nationkey").cast("bigint").alias("nation_key"), "n_name"
    )
    return (
        nation.join(degree, "nation_key", "left")
        .join(per_node, "nation_key", "left")
        .select(
            "nation_key",
            "n_name",
            F.coalesce("degree", F.lit(0)).cast("bigint").alias("degree"),
            F.coalesce("n_triangles", F.lit(0))
            .cast("bigint")
            .alias("n_triangles"),
        )
    )


_TRIANGLES_SQL = """
WITH pairs AS (
  SELECT DISTINCT
         LEAST(s_nationkey, c_nationkey)    AS a,
         GREATEST(s_nationkey, c_nationkey) AS b
  FROM lineitem
  JOIN orders   ON l_orderkey = o_orderkey
  JOIN supplier ON l_suppkey = s_suppkey
  JOIN customer ON o_custkey = c_custkey
  WHERE s_nationkey <> c_nationkey
), tri AS (
  SELECT e1.a AS x, e1.b AS y, e2.b AS z
  FROM pairs e1
  JOIN pairs e2 ON e1.b = e2.a
  JOIN pairs e3 ON e3.a = e1.a AND e3.b = e2.b
), tri_nodes AS (
  SELECT x AS nation_key FROM tri
  UNION ALL SELECT y FROM tri
  UNION ALL SELECT z FROM tri
), per_node AS (
  SELECT nation_key, CAST(COUNT(*) AS BIGINT) AS n_triangles
  FROM tri_nodes GROUP BY nation_key
), edge_nodes AS (
  SELECT a AS nation_key FROM pairs
  UNION ALL SELECT b FROM pairs
), degree AS (
  SELECT nation_key, CAST(COUNT(*) AS BIGINT) AS degree
  FROM edge_nodes GROUP BY nation_key
)
SELECT CAST(n_nationkey AS BIGINT) AS nation_key, n_name,
       CAST(COALESCE(degree, 0) AS BIGINT) AS degree,
       CAST(COALESCE(n_triangles, 0) AS BIGINT) AS n_triangles
FROM nation
LEFT JOIN degree   ON CAST(n_nationkey AS BIGINT) = degree.nation_key
LEFT JOIN per_node ON CAST(n_nationkey AS BIGINT) = per_node.nation_key
"""

register("trade_triangles", _TRIANGLES_SQL)(trade_triangles)


KCORE_K = 30
KCORE_ROUNDS = 3


def trade_kcore(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Fixed-rounds k-core peeling over the same undirected
    customer↔supplier trade graph as PageRank (graph kernel #4): for
    ``KCORE_ROUNDS`` rounds, drop every node whose current degree is
    below ``KCORE_K`` together with its incident edges — the standard
    degeneracy screen (spam/hub detection, community pre-filtering)
    that, run to convergence, yields the k-core. Rounds are FIXED, not
    run-to-convergence, for the same reason PageRank's are: a
    deterministic, oracle-checkable prefix of the iteration.

    Scale shape: each round is one degree aggregation (shuffle keyed
    by node, partial-combined) plus two left-semi joins of the edge
    list against the surviving-node set (shuffle keyed by endpoint) —
    all bounded by |E|, nothing driver-side, edge state checkpointed
    per round to keep lineage flat. All-integer output: surviving
    (node_type, node_id, residual degree).

    Reference parity: extends the analytics family
    (reference queries/* JOIN+GROUP BY class) with the iterative
    kernel the single-node reference cannot express incrementally."""
    li = load_table(spark, sf_dir, "lineitem").select(
        "l_orderkey", "l_suppkey"
    )
    orders = load_table(spark, sf_dir, "orders").select(
        "o_orderkey", "o_custkey"
    )
    pairs = (
        li.join(orders, li.l_orderkey == orders.o_orderkey, "inner")
        .select(
            (F.col("o_custkey") * 2).alias("u"),
            (F.col("l_suppkey") * 2 + 1).alias("v"),
        )
        .distinct()
    )
    # undirected: keep one canonical row per pair, count both ends
    edges = pairs.localCheckpoint(eager=True)
    for _ in range(KCORE_ROUNDS):
        deg = (
            edges.select(F.col("u").alias("node"))
            .unionAll(edges.select(F.col("v").alias("node")))
            .groupBy("node")
            .agg(F.count(F.lit(1)).alias("deg"))
        )
        keep = deg.filter(F.col("deg") >= KCORE_K).select("node")
        edges = (
            edges.join(keep, edges.u == keep.node, "left_semi")
            .join(keep, edges.v == keep.node, "left_semi")
            .localCheckpoint(eager=True)
        )
    final_deg = (
        edges.select(F.col("u").alias("node"))
        .unionAll(edges.select(F.col("v").alias("node")))
        .groupBy("node")
        .agg(F.count(F.lit(1)).alias("deg"))
    )
    return final_deg.select(
        F.when(F.col("node") % 2 == 0, F.lit("customer"))
        .otherwise(F.lit("supplier"))
        .alias("node_type"),
        F.expr("node div 2").alias("node_id"),
        F.col("deg").cast("bigint").alias("deg"),
    )


def _kcore_oracle(k: int = KCORE_K, rounds: int = KCORE_ROUNDS) -> str:
    """Unrolled peeling rounds as chained CTEs (DuckDB recursive CTEs
    cannot carry the two-table state cleanly; the unroll matches the
    fixed-rounds semantics exactly)."""
    ctes = [
        """e0 AS (
  SELECT DISTINCT o_custkey * 2 AS u, l_suppkey * 2 + 1 AS v
  FROM lineitem JOIN orders ON l_orderkey = o_orderkey
)"""
    ]
    prev = "e0"
    for r in range(1, rounds + 1):
        ctes.append(
            f"""d{r} AS (
  SELECT node FROM (
    SELECT u AS node FROM {prev} UNION ALL SELECT v FROM {prev}
  ) GROUP BY node HAVING COUNT(*) >= {k}
),
e{r} AS (
  SELECT u, v FROM {prev}
  WHERE u IN (SELECT node FROM d{r})
    AND v IN (SELECT node FROM d{r})
)"""
        )
        prev = f"e{r}"
    return (
        "WITH "
        + ",\n".join(ctes)
        + f"""
SELECT CASE WHEN node % 2 = 0 THEN 'customer' ELSE 'supplier' END
         AS node_type,
       CAST(node // 2 AS BIGINT) AS node_id,
       CAST(COUNT(*) AS BIGINT) AS deg
FROM (SELECT u AS node FROM {prev} UNION ALL SELECT v FROM {prev})
GROUP BY node"""
    )


register("trade_kcore", _kcore_oracle())(trade_kcore)


LPA_ROUNDS = 3


def trade_label_propagation(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Fixed-rounds synchronous label propagation (community
    detection) over the undirected customer↔supplier trade graph —
    graph kernel #5 next to connected components (dedup.py), PageRank,
    triangles, and k-core. Every node starts labeled with its own id;
    each round it adopts the most frequent label among its neighbors,
    ties broken to the SMALLEST label (the standard deterministic LPA
    tie-break). Rounds are fixed, not run-to-convergence, so the
    iteration prefix is oracle-checkable.

    Scale shape: per round, one shuffle joining the edge list to the
    label table (keyed by node), one partial-combined (dst, label)
    rollup, then an AGGREGATE argmax — max(struct(count, -label)) —
    instead of a per-dst window, so the pick is map-side combinable
    and no sort runs over the message volume. Edge state is
    checkpointed once; per-round label frames are checkpointed to
    keep lineage flat. All arithmetic int64.

    Reference parity: greenfield beyond the reference surface, same
    family as pagerank_trade_graph (reference queries/* JOIN+GROUP BY
    class extended with iterative kernels)."""
    li = load_table(spark, sf_dir, "lineitem").select(
        "l_orderkey", "l_suppkey"
    )
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
    edges = (
        pairs.select(F.col("c_node").alias("src"), F.col("s_node").alias("dst"))
        .unionAll(
            pairs.select(
                F.col("s_node").alias("src"), F.col("c_node").alias("dst")
            )
        )
        .localCheckpoint(eager=True)
    )
    lab = (
        edges.select(F.col("src").alias("node"))
        .distinct()
        .select("node", F.col("node").alias("label"))
        .localCheckpoint(eager=True)
    )
    for _ in range(LPA_ROUNDS):
        msgs = edges.join(lab, edges.src == lab.node, "inner").select(
            "dst", "label"
        )
        cnt = msgs.groupBy("dst", "label").agg(F.count(F.lit(1)).alias("c"))
        best = cnt.groupBy("dst").agg(
            F.max(
                F.struct(F.col("c").alias("c"), (-F.col("label")).alias("neg"))
            ).alias("b")
        )
        lab = best.select(
            F.col("dst").alias("node"), (-F.col("b.neg")).alias("label")
        ).localCheckpoint(eager=True)
    sizes = lab.groupBy("label").agg(
        F.count(F.lit(1)).alias("community_size")
    )
    return lab.join(sizes, "label").select(
        F.when(F.col("node") % 2 == 0, F.lit("customer"))
        .otherwise(F.lit("supplier"))
        .alias("node_type"),
        F.expr("node div 2").alias("node_id"),
        F.col("label").cast("bigint").alias("community_id"),
        F.col("community_size").cast("bigint").alias("community_size"),
    )


def _lpa_oracle(rounds: int = LPA_ROUNDS) -> str:
    """Unrolled LPA rounds as chained CTEs. The argmax is expressed as
    a row_number window here (DuckDB side only — values are identical
    to Spark's aggregate max(struct(c, -label)) pick because both
    select (max count, min label))."""
    parts = []
    for i in range(1, rounds + 1):
        parts.append(
            f"""
g{i} AS (
  SELECT e.dst AS node, l.label, COUNT(*) AS c
  FROM edges e JOIN l{i - 1} l ON e.src = l.node
  GROUP BY 1, 2
),
l{i} AS (
  SELECT node, label FROM (
    SELECT node, label,
           row_number() OVER (
             PARTITION BY node ORDER BY c DESC, label) AS rn
    FROM g{i}
  ) WHERE rn = 1
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
l0 AS (SELECT DISTINCT src AS node, src AS label FROM edges),{body},
sizes AS (
  SELECT label, CAST(COUNT(*) AS BIGINT) AS community_size
  FROM l{rounds} GROUP BY 1
)
SELECT CASE WHEN l.node % 2 = 0 THEN 'customer' ELSE 'supplier' END
         AS node_type,
       CAST(l.node // 2 AS BIGINT) AS node_id,
       CAST(l.label AS BIGINT) AS community_id,
       s.community_size
FROM l{rounds} l JOIN sizes s ON l.label = s.label
"""


register("trade_label_propagation", _lpa_oracle())(trade_label_propagation)


def trade_degree_distribution(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Degree distribution of the supplier↔part bipartite trade graph:
    for each side, the count-of-counts histogram (how many suppliers
    serve exactly d parts; how many parts have exactly d suppliers) —
    the first diagnostic read on any graph workload (heavy-tailed
    degrees → plan for hub skew in the join kernels; the same signal
    events_key_skew_report gives for keyed shuffles, here for both
    ends of an edge list).

    Scale shape: distinct edge list once, two per-node degree rollups
    (map-side combined), then count-of-counts over the degree DOMAIN
    (tiny) — the fact is never sorted and no single-partition frame
    exceeds the distinct-degree count."""
    li = load_table(spark, sf_dir, "lineitem").select(
        "l_suppkey", "l_partkey"
    ).distinct()
    s_deg = li.groupBy("l_suppkey").agg(F.count(F.lit(1)).alias("deg"))
    p_deg = li.groupBy("l_partkey").agg(F.count(F.lit(1)).alias("deg"))
    s_hist = s_deg.groupBy("deg").agg(
        F.count(F.lit(1)).alias("n_nodes")
    ).select(F.lit("supplier").alias("side"), "deg", "n_nodes")
    p_hist = p_deg.groupBy("deg").agg(
        F.count(F.lit(1)).alias("n_nodes")
    ).select(F.lit("part").alias("side"), "deg", "n_nodes")
    return s_hist.unionByName(p_hist).select(
        "side",
        F.col("deg").cast("bigint").alias("deg"),
        F.col("n_nodes").cast("bigint").alias("n_nodes"),
    )


register(
    "trade_degree_distribution",
    """
WITH edges AS (
  SELECT DISTINCT l_suppkey, l_partkey FROM lineitem
),
s_deg AS (SELECT l_suppkey, COUNT(*) AS deg FROM edges GROUP BY 1),
p_deg AS (SELECT l_partkey, COUNT(*) AS deg FROM edges GROUP BY 1)
SELECT 'supplier' AS side, CAST(deg AS BIGINT) AS deg,
       CAST(COUNT(*) AS BIGINT) AS n_nodes
FROM s_deg GROUP BY deg
UNION ALL
SELECT 'part', CAST(deg AS BIGINT), CAST(COUNT(*) AS BIGINT)
FROM p_deg GROUP BY deg
""",
)(trade_degree_distribution)


def trade_graph_densification(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Temporal graph growth: per month, how many of the month's
    active customer↔supplier edges are NEW (first ever occurrence)
    vs repeat — the densification curve (new-edge rate decaying while
    actives grow says the graph is consolidating; a flat new-edge
    rate says it keeps expanding). The month of an edge's first
    activity comes from a per-edge min, so the fact is scanned once.

    Scale shape: (edge, month) distinct rollup keyed by the pair →
    per-edge first-month aggregate on the same key (no re-shuffle) →
    calendar-sized month rollup. All integer date arithmetic."""
    li = load_table(spark, sf_dir, "lineitem").select(
        "l_orderkey", "l_suppkey"
    )
    orders = load_table(spark, sf_dir, "orders").select(
        "o_orderkey", "o_custkey", "o_orderdate"
    )
    em = (
        li.join(orders, li.l_orderkey == orders.o_orderkey)
        .select(
            "o_custkey",
            "l_suppkey",
            F.date_trunc("month", "o_orderdate").cast("date").alias("m"),
        )
        .distinct()
    )
    first = em.groupBy("o_custkey", "l_suppkey").agg(
        F.min("m").alias("first_m")
    )
    tagged = em.join(first, ["o_custkey", "l_suppkey"]).select(
        "m", (F.col("m") == F.col("first_m")).alias("is_new")
    )
    return tagged.groupBy("m").agg(
        F.sum(F.when(F.col("is_new"), 1).otherwise(0))
        .cast("bigint")
        .alias("n_new_edges"),
        F.sum(F.when(F.col("is_new"), 0).otherwise(1))
        .cast("bigint")
        .alias("n_repeat_edges"),
        F.count(F.lit(1)).cast("bigint").alias("n_active_edges"),
    )


register(
    "trade_graph_densification",
    """
WITH em AS (
  SELECT DISTINCT o_custkey, l_suppkey,
         CAST(date_trunc('month', o_orderdate) AS DATE) AS m
  FROM lineitem JOIN orders ON l_orderkey = o_orderkey
),
first AS (
  SELECT o_custkey, l_suppkey, MIN(m) AS first_m
  FROM em GROUP BY 1, 2
)
SELECT em.m,
       CAST(SUM(CASE WHEN em.m = f.first_m THEN 1 ELSE 0 END) AS BIGINT)
         AS n_new_edges,
       CAST(SUM(CASE WHEN em.m = f.first_m THEN 0 ELSE 1 END) AS BIGINT)
         AS n_repeat_edges,
       CAST(COUNT(*) AS BIGINT) AS n_active_edges
FROM em
JOIN first f
  ON em.o_custkey = f.o_custkey AND em.l_suppkey = f.l_suppkey
GROUP BY em.m
""",
)(trade_graph_densification)


# ---------------------------------------------------------------------------
# Link prediction: common neighbors / resource allocation over the
# bipartite trade graph
# ---------------------------------------------------------------------------

# Customers connected to more suppliers than this are dropped as
# evidence: a hub customer generates O(deg²) supplier pairs while
# carrying almost no signal (the same reasoning as the resource-
# allocation 1/deg weighting, taken to its limit) — the standard
# hot-key cap that bounds the self-join fan-out at MAX² per customer
# regardless of graph size (MAX_SHINGLE_DF precedent in dedup).
LINKPRED_MAX_DEG = 40
LINKPRED_TOP_K = 50
RA_SCALE = 1_000_000


def trade_common_neighbors(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Link prediction over the bipartite customer↔supplier trade
    graph: for supplier pairs that share customers, the
    common-neighbors count, Jaccard (milli), and the Zhou-Lü-Zhang
    resource-allocation index RA = Σ_z 1/deg(z) over shared customers
    z — the strongest of the classic local similarity indices and the
    one that needs no logarithm (Adamic-Adar's ln(deg) would break
    the cross-engine hash contract; RA is its rational twin).
    Predicted links rank suppliers a procurement graph would
    recommend pairing/substituting.

    RA is reported in exact micro-units: each shared customer
    contributes {RA_SCALE} div deg(z) (integer floor division, both
    engines agree), so the SUM is an exact bigint.

    Scale shape: distinct (customer, supplier) edge list → hub cap
    (bounds the per-customer pair fan-out at {LINKPRED_MAX_DEG}²) →
    self-join on the customer key (equi-join, never all-pairs) →
    (s_a, s_b) rollup → TakeOrdered top-{LINKPRED_TOP_K} on the total
    order (common desc, ra desc, ids)."""
    li = load_table(spark, sf_dir, "lineitem").select(
        "l_orderkey", "l_suppkey"
    )
    orders = load_table(spark, sf_dir, "orders").select(
        "o_orderkey", "o_custkey"
    )
    pairs = (
        li.join(orders, li.l_orderkey == orders.o_orderkey)
        .select(
            F.col("o_custkey").alias("cust"),
            F.col("l_suppkey").alias("supp"),
        )
        .distinct()
    )
    cdeg = pairs.groupBy("cust").agg(F.count(F.lit(1)).alias("cdeg"))
    kept = pairs.join(
        cdeg.filter(F.col("cdeg") <= LINKPRED_MAX_DEG), "cust"
    )
    sdeg = kept.groupBy("supp").agg(F.count(F.lit(1)).alias("sdeg"))
    a = kept.select(
        "cust", F.col("supp").alias("s_a"), F.col("cdeg").alias("cdeg_a")
    )
    b = kept.select("cust", F.col("supp").alias("s_b"))
    co = (
        a.join(b, "cust")
        .filter(F.col("s_a") < F.col("s_b"))
        .groupBy("s_a", "s_b")
        .agg(
            F.count(F.lit(1)).alias("common"),
            F.sum(
                F.expr(f"CAST({RA_SCALE} AS BIGINT) div cdeg_a")
            ).alias("ra_micro"),
        )
    )
    scored = (
        co.join(
            sdeg.select(F.col("supp").alias("s_a"), F.col("sdeg").alias("deg_a")),
            "s_a",
        )
        .join(
            sdeg.select(F.col("supp").alias("s_b"), F.col("sdeg").alias("deg_b")),
            "s_b",
        )
        .select(
            "s_a",
            "s_b",
            F.col("common").cast("bigint").alias("common"),
            F.col("ra_micro").cast("bigint").alias("ra_micro"),
            F.col("deg_a").cast("bigint").alias("deg_a"),
            F.col("deg_b").cast("bigint").alias("deg_b"),
            F.expr(
                "CAST((1000 * common) div (deg_a + deg_b - common)"
                " AS BIGINT)"
            ).alias("jaccard_milli"),
        )
    )
    return scored.orderBy(
        F.col("common").desc(),
        F.col("ra_micro").desc(),
        "s_a",
        "s_b",
    ).limit(LINKPRED_TOP_K)


register(
    "trade_common_neighbors",
    f"""
WITH pairs AS (
  SELECT DISTINCT o.o_custkey AS cust, l.l_suppkey AS supp
  FROM lineitem l JOIN orders o ON l.l_orderkey = o.o_orderkey
),
cdeg AS (SELECT cust, COUNT(*) AS cdeg FROM pairs GROUP BY 1),
kept AS (
  SELECT p.cust, p.supp, d.cdeg
  FROM pairs p JOIN cdeg d ON p.cust = d.cust
  WHERE d.cdeg <= {LINKPRED_MAX_DEG}
),
sdeg AS (SELECT supp, COUNT(*) AS sdeg FROM kept GROUP BY 1),
co AS (
  SELECT a.supp AS s_a, b.supp AS s_b, COUNT(*) AS common,
         SUM(CAST(CAST({RA_SCALE} AS BIGINT) // a.cdeg AS BIGINT))
           AS ra_micro
  FROM kept a JOIN kept b ON a.cust = b.cust AND a.supp < b.supp
  GROUP BY 1, 2
)
SELECT co.s_a, co.s_b,
       CAST(common AS BIGINT) AS common,
       CAST(ra_micro AS BIGINT) AS ra_micro,
       CAST(da.sdeg AS BIGINT) AS deg_a,
       CAST(db.sdeg AS BIGINT) AS deg_b,
       CAST((1000 * common) // (da.sdeg + db.sdeg - common) AS BIGINT)
         AS jaccard_milli
FROM co
JOIN sdeg da ON co.s_a = da.supp
JOIN sdeg db ON co.s_b = db.supp
ORDER BY common DESC, ra_micro DESC, s_a, s_b
LIMIT {LINKPRED_TOP_K}
""",
)(trade_common_neighbors)


# ---------------------------------------------------------------------------
# Degree assortativity
# ---------------------------------------------------------------------------


def trade_assortativity(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Degree assortativity coefficient (Newman 2002) of the
    undirected customer↔supplier trade graph: the Pearson correlation
    of endpoint degrees over all directed edge instances — negative
    r means hubs attach to leaves (the disassortative shape almost
    all bipartite commerce graphs have), positive means rich-club.
    One number that tells the graph kernels' cost model whether
    hub-orientation tricks (trade_triangles' degree ordering) will
    pay.

    Determinism: every sufficient sum (Σx, Σx², Σxy over directed
    edges, x = source degree, y = destination degree) is an exact
    int64; r is one fixed-shape double expression with one sqrt,
    rounded at 9. By symmetry of the directed-instance list, x and y
    have identical marginals — the classic formula collapses to
    (SxyΣ·n − Sx²) / (Sxx·n − Sx²).

    Scale shape: edges → degree rollup → two broadcast-eligible
    degree joins onto the edge list → one 1-row moment aggregate."""
    li = load_table(spark, sf_dir, "lineitem").select(
        "l_orderkey", "l_suppkey"
    )
    orders = load_table(spark, sf_dir, "orders").select(
        "o_orderkey", "o_custkey"
    )
    pairs = (
        li.join(orders, li.l_orderkey == orders.o_orderkey)
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
    withx = edges.join(deg, "src").select(
        "dst", F.col("deg").alias("x")
    )
    withxy = withx.join(
        deg.select(F.col("src").alias("dst"), F.col("deg").alias("y")),
        "dst",
    )
    agg = withxy.agg(
        F.count(F.lit(1)).alias("m"),
        F.sum("x").alias("sx"),
        F.sum(F.col("x") * F.col("x")).alias("sxx"),
        F.sum(F.col("x") * F.col("y")).alias("sxy"),
    )
    md = F.col("m").cast("double")
    sxd = F.col("sx").cast("double")
    sxxd = F.col("sxx").cast("double")
    sxyd = F.col("sxy").cast("double")
    num = md * sxyd - sxd * sxd
    den = md * sxxd - sxd * sxd
    return agg.select(
        F.col("m").cast("bigint").alias("n_edge_instances"),
        F.col("sx").cast("bigint").alias("deg_sum"),
        F.col("sxx").cast("bigint").alias("deg_sq_sum"),
        F.col("sxy").cast("bigint").alias("deg_prod_sum"),
        F.when(den > 0, F.round(num / den, 9)).alias("assortativity"),
    )


register(
    "trade_assortativity",
    """
WITH pairs AS (
  SELECT DISTINCT o.o_custkey * 2 AS c_node, l.l_suppkey * 2 + 1 AS s_node
  FROM lineitem l JOIN orders o ON l.l_orderkey = o.o_orderkey
),
edges AS (
  SELECT c_node AS src, s_node AS dst FROM pairs
  UNION ALL
  SELECT s_node AS src, c_node AS dst FROM pairs
),
deg AS (SELECT src, COUNT(*) AS deg FROM edges GROUP BY 1),
inst AS (
  SELECT dx.deg AS x, dy.deg AS y
  FROM edges e
  JOIN deg dx ON e.src = dx.src
  JOIN deg dy ON e.dst = dy.src
),
agg AS (
  SELECT COUNT(*) AS m,
         CAST(SUM(x) AS BIGINT) AS sx,
         CAST(SUM(x * x) AS BIGINT) AS sxx,
         CAST(SUM(x * y) AS BIGINT) AS sxy
  FROM inst
)
SELECT CAST(m AS BIGINT) AS n_edge_instances,
       sx AS deg_sum, sxx AS deg_sq_sum, sxy AS deg_prod_sum,
       CASE WHEN CAST(m AS DOUBLE) * CAST(sxx AS DOUBLE)
                 - CAST(sx AS DOUBLE) * CAST(sx AS DOUBLE) > 0
            THEN round((CAST(m AS DOUBLE) * CAST(sxy AS DOUBLE)
                        - CAST(sx AS DOUBLE) * CAST(sx AS DOUBLE))
                       / (CAST(m AS DOUBLE) * CAST(sxx AS DOUBLE)
                          - CAST(sx AS DOUBLE) * CAST(sx AS DOUBLE)), 9)
            END AS assortativity
FROM agg
""",
)(trade_assortativity)


# ---------------------------------------------------------------------------
# HITS hubs & authorities
# ---------------------------------------------------------------------------

HITS_ROUNDS = 3
HITS_SCALE = 1_000_000
HITS_TOP_K = 20


def trade_hits_scores(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Kleinberg's HITS on the directed buys-from graph (customer →
    supplier): hub score = how much authoritative supply a customer
    aggregates, authority score = how much hub demand a supplier
    attracts — the mutually-recursive centrality pair that, unlike
    degree, rewards being connected to WELL-CONNECTED counterparties.
    {HITS_ROUNDS} synchronous rounds with MAX-normalization in integer
    micro-units (the usual L2 normalization needs a sqrt inside the
    iteration; max-normalization keeps every score an exact int64, so
    the whole fixpoint sits under the hash gate — pagerank's
    int-nano precedent), then the top {HITS_TOP_K} of each side by
    (score desc, id).

    Scale shape: each round is two keyed join+rollup passes over the
    edge list plus a 1-row max broadcast — the Pregel shape; the edge
    frame is checkpointed once and reused every round."""
    li = load_table(spark, sf_dir, "lineitem").select(
        "l_orderkey", "l_suppkey"
    )
    orders = load_table(spark, sf_dir, "orders").select(
        "o_orderkey", "o_custkey"
    )
    edges = (
        li.join(orders, li.l_orderkey == orders.o_orderkey)
        .select(
            F.col("o_custkey").alias("cust"),
            F.col("l_suppkey").alias("supp"),
        )
        .distinct()
        .localCheckpoint(eager=True)
    )
    auth = edges.select("supp").distinct().select(
        "supp", F.lit(HITS_SCALE).cast("bigint").alias("a")
    ).localCheckpoint(eager=True)
    hubs = None
    for _ in range(HITS_ROUNDS):
        h_raw = (
            edges.join(auth, "supp")
            .groupBy("cust")
            .agg(F.sum("a").alias("h_raw"))
        )
        h_max = h_raw.agg(F.max("h_raw").alias("m"))
        hubs = (
            h_raw.crossJoin(F.broadcast(h_max))
            .select(
                "cust",
                F.expr(f"(h_raw * CAST({HITS_SCALE} AS BIGINT)) div m")
                .cast("bigint")
                .alias("h"),
            )
            .localCheckpoint(eager=True)
        )
        a_raw = (
            edges.join(hubs, "cust")
            .groupBy("supp")
            .agg(F.sum("h").alias("a_raw"))
        )
        a_max = a_raw.agg(F.max("a_raw").alias("m"))
        auth = (
            a_raw.crossJoin(F.broadcast(a_max))
            .select(
                "supp",
                F.expr(f"(a_raw * CAST({HITS_SCALE} AS BIGINT)) div m")
                .cast("bigint")
                .alias("a"),
            )
            .localCheckpoint(eager=True)
        )
    top_hubs = (
        hubs.select(
            F.lit("hub").alias("role"),
            F.col("cust").cast("bigint").alias("node_id"),
            F.col("h").alias("score_micro"),
        )
        .orderBy(F.col("score_micro").desc(), "node_id")
        .limit(HITS_TOP_K)
    )
    top_auth = (
        auth.select(
            F.lit("authority").alias("role"),
            F.col("supp").cast("bigint").alias("node_id"),
            F.col("a").alias("score_micro"),
        )
        .orderBy(F.col("score_micro").desc(), "node_id")
        .limit(HITS_TOP_K)
    )
    return top_hubs.unionByName(top_auth)


def _hits_oracle(rounds: int = HITS_ROUNDS) -> str:
    parts = []
    prev_a = "a0"
    for i in range(1, rounds + 1):
        parts.append(
            f"""
hraw{i} AS (
  SELECT e.cust, SUM(a.a) AS h_raw
  FROM edges e JOIN {prev_a} a ON e.supp = a.supp GROUP BY 1
),
h{i} AS (
  SELECT cust,
         CAST((h_raw * CAST({HITS_SCALE} AS BIGINT))
              // (SELECT MAX(h_raw) FROM hraw{i}) AS BIGINT) AS h
  FROM hraw{i}
),
araw{i} AS (
  SELECT e.supp, SUM(h.h) AS a_raw
  FROM edges e JOIN h{i} h ON e.cust = h.cust GROUP BY 1
),
a{i} AS (
  SELECT supp,
         CAST((a_raw * CAST({HITS_SCALE} AS BIGINT))
              // (SELECT MAX(a_raw) FROM araw{i}) AS BIGINT) AS a
  FROM araw{i}
)"""
        )
        prev_a = f"a{i}"
    body = ",".join(parts)
    return f"""
WITH edges AS (
  SELECT DISTINCT o.o_custkey AS cust, l.l_suppkey AS supp
  FROM lineitem l JOIN orders o ON l.l_orderkey = o.o_orderkey
),
a0 AS (
  SELECT DISTINCT supp, CAST({HITS_SCALE} AS BIGINT) AS a FROM edges
),{body}
SELECT * FROM (
  SELECT 'hub' AS role, CAST(cust AS BIGINT) AS node_id,
         h AS score_micro
  FROM h{rounds} ORDER BY h DESC, cust LIMIT {HITS_TOP_K}
)
UNION ALL
SELECT * FROM (
  SELECT 'authority' AS role, CAST(supp AS BIGINT) AS node_id,
         a AS score_micro
  FROM a{rounds} ORDER BY a DESC, supp LIMIT {HITS_TOP_K}
)
"""


register("trade_hits_scores", _hits_oracle())(trade_hits_scores)


# ---------------------------------------------------------------------------
# Personalized PageRank from a seed nation's suppliers
# ---------------------------------------------------------------------------

PPR_SEED_NATION = 3
PPR_TOP_K = 50


def trade_personalized_pagerank(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Personalized PageRank — the recommendation workhorse: the
    teleport mass lands ONLY on the seed set (nation {PPR_SEED_NATION}
    's suppliers) instead of uniformly, so after {PAGERANK_ROUNDS}
    rounds the ranking answers "which counterparties matter MOST from
    this nation's point of view" (trade partners to prioritize,
    customers to cross-sell). Same integer-nano fixpoint as
    ``pagerank_trade_graph`` (teleport {TELEPORT_NANO}/1e9 split over
    seeds, damping {DAMP_NUM}/{DAMP_DEN}, all floor divisions), so the
    whole walk sits under the hash gate; output is the
    top-{PPR_TOP_K} nodes by (rank desc, node) — a total order.

    Scale shape: identical to pagerank — edge state checkpointed once,
    each round one keyed join+rollup; the seed set is a broadcast."""
    li = load_table(spark, sf_dir, "lineitem").select("l_orderkey", "l_suppkey")
    orders = load_table(spark, sf_dir, "orders").select(
        "o_orderkey", "o_custkey"
    )
    supplier = load_table(spark, sf_dir, "supplier").select(
        "s_suppkey", "s_nationkey"
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
    edges_deg = edges.join(deg, "src").localCheckpoint(eager=True)
    nodes = deg.select(F.col("src").alias("node"), "deg")
    seeds = (
        supplier.filter(F.col("s_nationkey") == PPR_SEED_NATION)
        .select((F.col("s_suppkey") * 2 + 1).alias("node"))
        .join(nodes.select("node"), "node", "left_semi")
        .localCheckpoint(eager=True)
    )
    n_seeds = seeds.agg(F.count(F.lit(1)).alias("ns"))
    seed_mass = seeds.crossJoin(F.broadcast(n_seeds)).select(
        "node",
        F.expr(f"CAST({TELEPORT_NANO} AS BIGINT) div ns").alias("tele"),
    )
    # start at the personalization vector itself
    rank = (
        nodes.join(
            seed_mass.withColumnRenamed("tele", "r0"), "node", "left"
        )
        .select(
            "node",
            F.coalesce(
                F.expr(
                    f"CAST((r0 * CAST({ONE_NANO} AS BIGINT))"
                    f" div {TELEPORT_NANO} AS BIGINT)"
                ),
                F.lit(0),
            ).alias("r_nano"),
        )
        .localCheckpoint(eager=True)
    )
    for _ in range(PAGERANK_ROUNDS):
        contrib = edges_deg.join(
            rank, edges_deg.src == rank.node, "inner"
        ).select("dst", F.expr("r_nano div deg").alias("contrib"))
        sums = contrib.groupBy("dst").agg(F.sum("contrib").alias("s"))
        rank = (
            nodes.join(sums, nodes.node == sums.dst, "left")
            .join(seed_mass, nodes.node == seed_mass.node, "left")
            .select(
                nodes.node.alias("node"),
                (
                    F.coalesce(F.col("tele"), F.lit(0))
                    + F.expr(
                        f"({DAMP_NUM} * coalesce(s, CAST(0 AS BIGINT)))"
                        f" div {DAMP_DEN}"
                    )
                ).alias("r_nano"),
            )
            .localCheckpoint(eager=True)
        )
    return (
        rank.join(nodes, "node")
        .select(
            F.when(F.col("node") % 2 == 0, F.lit("customer"))
            .otherwise(F.lit("supplier"))
            .alias("node_type"),
            F.expr("node div 2").cast("bigint").alias("node_id"),
            F.col("deg").cast("bigint").alias("deg"),
            F.expr("r_nano div 1000").cast("bigint").alias("rank_micro"),
        )
        .orderBy(F.col("rank_micro").desc(), "node_type", "node_id")
        .limit(PPR_TOP_K)
    )


def _ppr_oracle(n_rounds: int = PAGERANK_ROUNDS) -> str:
    parts = []
    for i in range(1, n_rounds + 1):
        parts.append(
            f"""
c{i} AS (
  SELECT e.dst AS node, CAST(r.r_nano // e.deg AS BIGINT) AS contrib
  FROM edges_deg e JOIN r{i - 1} r ON e.src = r.node
),
s{i} AS (SELECT node, SUM(contrib) AS s FROM c{i} GROUP BY 1),
r{i} AS (
  SELECT d.node,
         COALESCE(sm.tele, 0)
           + CAST(({DAMP_NUM} * COALESCE(s.s, CAST(0 AS BIGINT)))
                  // {DAMP_DEN} AS BIGINT) AS r_nano
  FROM deg d
  LEFT JOIN s{i} s ON d.node = s.node
  LEFT JOIN seed_mass sm ON d.node = sm.node
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
seeds AS (
  SELECT s_suppkey * 2 + 1 AS node FROM supplier
  WHERE s_nationkey = {PPR_SEED_NATION}
    AND s_suppkey * 2 + 1 IN (SELECT node FROM deg)
),
ns AS (SELECT COUNT(*) AS ns FROM seeds),
seed_mass AS (
  SELECT node, CAST(CAST({TELEPORT_NANO} AS BIGINT) // ns.ns AS BIGINT)
           AS tele
  FROM seeds CROSS JOIN ns
),
r0 AS (
  SELECT d.node,
         COALESCE(CAST((sm.tele * CAST({ONE_NANO} AS BIGINT))
                       // {TELEPORT_NANO} AS BIGINT), 0) AS r_nano
  FROM deg d LEFT JOIN seed_mass sm ON d.node = sm.node
),{body}
SELECT * FROM (
  SELECT CASE WHEN d.node % 2 = 0 THEN 'customer' ELSE 'supplier' END
           AS node_type,
         CAST(d.node // 2 AS BIGINT) AS node_id,
         CAST(d.deg AS BIGINT) AS deg,
         CAST(r.r_nano // 1000 AS BIGINT) AS rank_micro
  FROM r{n_rounds} r JOIN deg d ON r.node = d.node
  ORDER BY rank_micro DESC, node_type, node_id
  LIMIT {PPR_TOP_K}
)
"""


register("trade_personalized_pagerank", _ppr_oracle())(
    trade_personalized_pagerank
)


def trade_modularity(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Newman modularity Q of the LPA communities — the quality score
    that says whether the community structure is real or noise
    (Q ≈ 0: no better than random wiring; Q ≥ ~0.3: meaningful
    structure). The clustering-evaluation companion the kernels'
    silhouette (kmeans) already has, for graphs.

    Over the DOUBLED directed edge list (each undirected edge twice,
    2m = |directed|): ``Q = [2m·Σᵢeᵢᵢ − Σᵢdᵢ²] / (2m)²`` with eᵢᵢ the
    directed intra-community edges and dᵢ community i's degree sum —
    all exact int64, one sign-split floor division to milli units
    (numerator ≤ (2m)², so 10³·num stays far under 2⁶³ through
    sf0.1's ~10⁶ directed edges; the envelope is documented, not
    assumed). Composes the audited LPA labels verbatim.

    Scale shape: one labels⋈edges join keyed by node (twice — src and
    dst ends), a per-community rollup, then a 1-row summary."""
    labels = trade_label_propagation(spark, sf_dir).select(
        (
            F.col("node_id") * 2
            + F.when(F.col("node_type") == "supplier", 1).otherwise(0)
        ).alias("node"),
        F.col("community_id").alias("comm"),
    ).localCheckpoint(eager=True)  # feeds both edge ends + degrees
    li = load_table(spark, sf_dir, "lineitem").select(
        "l_orderkey", "l_suppkey"
    )
    orders = load_table(spark, sf_dir, "orders").select(
        "o_orderkey", "o_custkey"
    )
    pairs = (
        li.join(orders, li.l_orderkey == orders.o_orderkey)
        .select(
            (F.col("o_custkey") * 2).alias("c_node"),
            (F.col("l_suppkey") * 2 + 1).alias("s_node"),
        )
        .distinct()
    )
    edges = pairs.select(
        F.col("c_node").alias("src"), F.col("s_node").alias("dst")
    ).unionAll(
        pairs.select(
            F.col("s_node").alias("src"), F.col("c_node").alias("dst")
        )
    )
    tagged = (
        edges.join(
            labels.withColumnRenamed("node", "src").withColumnRenamed(
                "comm", "c_src"
            ),
            "src",
        )
        .join(
            labels.withColumnRenamed("node", "dst").withColumnRenamed(
                "comm", "c_dst"
            ),
            "dst",
        )
    )
    per_comm = tagged.groupBy("c_src").agg(
        F.count(F.lit(1)).alias("d"),
        F.sum(
            F.when(F.col("c_src") == F.col("c_dst"), 1).otherwise(0)
        ).alias("e_in"),
    )
    return per_comm.agg(
        F.count(F.lit(1)).cast("bigint").alias("n_communities"),
        F.sum("d").cast("bigint").alias("n_edges_directed"),
        F.sum("e_in").cast("bigint").alias("intra_edges_directed"),
        F.sum(F.col("d") * F.col("d")).cast("bigint").alias(
            "sum_degree_sq"
        ),
    ).select(
        "n_communities",
        "n_edges_directed",
        "intra_edges_directed",
        "sum_degree_sq",
        F.expr(
            "CAST(CASE WHEN n_edges_directed * intra_edges_directed"
            " - sum_degree_sq >= 0"
            " THEN (1000 * (n_edges_directed * intra_edges_directed"
            " - sum_degree_sq))"
            " div (n_edges_directed * n_edges_directed)"
            " ELSE -((1000 * (sum_degree_sq"
            " - n_edges_directed * intra_edges_directed)"
            " + n_edges_directed * n_edges_directed - 1)"
            " div (n_edges_directed * n_edges_directed))"
            " END AS BIGINT)"
        ).alias("modularity_milli"),
    )


def _modularity_oracle() -> str:
    from smart_meter_data_pipeline_spark.plans.registry import ORACLES

    return f"""
WITH lpa AS ({ORACLES["trade_label_propagation"]}),
labels AS (
  SELECT node_id * 2
         + CASE WHEN node_type = 'supplier' THEN 1 ELSE 0 END AS node,
         community_id AS comm
  FROM lpa
),
pairs AS (
  SELECT DISTINCT o_custkey * 2 AS c_node,
         l_suppkey * 2 + 1 AS s_node
  FROM lineitem JOIN orders ON l_orderkey = o_orderkey
),
edges AS (
  SELECT c_node AS src, s_node AS dst FROM pairs
  UNION ALL
  SELECT s_node, c_node FROM pairs
),
tagged AS (
  SELECT ls.comm AS c_src, ld.comm AS c_dst
  FROM edges e
  JOIN labels ls ON ls.node = e.src
  JOIN labels ld ON ld.node = e.dst
),
per_comm AS (
  SELECT c_src, COUNT(*) AS d,
         SUM(CASE WHEN c_src = c_dst THEN 1 ELSE 0 END) AS e_in
  FROM tagged GROUP BY 1
),
tot AS (
  SELECT CAST(COUNT(*) AS BIGINT) AS n_communities,
         CAST(SUM(d) AS BIGINT) AS n_edges_directed,
         CAST(SUM(e_in) AS BIGINT) AS intra_edges_directed,
         CAST(SUM(d * d) AS BIGINT) AS sum_degree_sq
  FROM per_comm
)
SELECT n_communities, n_edges_directed, intra_edges_directed,
       sum_degree_sq,
       CAST(CASE WHEN n_edges_directed * intra_edges_directed
                      - sum_degree_sq >= 0
            THEN CAST((1000 * (n_edges_directed * intra_edges_directed
                 - sum_degree_sq))
                 // (n_edges_directed * n_edges_directed) AS BIGINT)
            ELSE -CAST((1000 * (sum_degree_sq
                 - n_edges_directed * intra_edges_directed)
                 + n_edges_directed * n_edges_directed - 1)
                 // (n_edges_directed * n_edges_directed) AS BIGINT)
            END AS BIGINT) AS modularity_milli
FROM tot
"""


def _register_modularity() -> None:
    register("trade_modularity", _modularity_oracle())(trade_modularity)


_register_modularity()
