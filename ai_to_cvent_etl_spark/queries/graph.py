"""Iterative graph analytics (r3): G1 PageRank.

The customer–supplier trade graph: an undirected edge (customer c, supplier
s) for every distinct pair that traded (orders ⋈ lineitem). Three
synchronized power-iteration rounds of PageRank (d = 0.85) over the
edge-induced node set.

Cross-engine determinism: per-iteration neighbor contributions pr/deg are
quantized with floor(x * 1e12) and summed as DECIMAL — exact, associative,
order-insensitive — then the new rank is rebuilt in double with the
identical IEEE expression on both engines. floor() is exactly defined on
doubles everywhere (round() is not), so three chained iterations stay
bit-identical between Spark and DuckDB with NO rounding of the output.

Scale shape: each iteration is one join (edges ⋈ ranks, both partitioned by
the join key) + one keyed aggregation — the canonical Pregel-style
message-passing round expressed relationally. The edge list and degree
table are localCheckpoint'ed once (lineage truncation, same device as D5
connected components); per-round driver traffic is zero (no collect — the
scalar node count rides along as a broadcast 1-row crossJoin). At 100 TB
the edge checkpoint goes to reliable storage and iterations shuffle
edge-partition-locally; rounds are log-free and restartable."""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from ai_to_cvent_etl_spark.io import load_table
from ai_to_cvent_etl_spark.registry import register

_DAMP = 0.85
_ROUNDS = 3

# Checkpointed undirected trade-graph edges (customer c* <-> supplier s*)
# memoized per (Spark app, dataset): shared by G1 PageRank and G10 label
# propagation, each of which otherwise pays the orders><lineitem distinct
# build. Staleness contract identical to analytics_r3b._EDGE_CACHE /
# operators/kmeans._MODEL_CACHE: fixtures are immutable per process.
#
# Cluster-scale caveat (ADVICE r3): localCheckpoint truncates lineage, so a
# checkpointed block lost with its executor (dynamic allocation, preemption)
# is UNRECOVERABLE — G1/G10 would fail instead of recomputing. On a real
# cluster swap localCheckpoint for either `df.checkpoint()` against a
# reliable (HDFS/S3) checkpoint dir, or `df.persist(DISK_AND_MEMORY)` +
# a materializing count, both of which keep lineage or durable copies.
# local[32] has a single immortal executor, so the fast path is safe here.
# Eviction: entries for other (app, dataset) keys are dropped on insert so
# checkpointed blocks for retired SparkSessions / other SF dirs don't stay
# pinned in executor storage for the process lifetime.
_TRADE_EDGE_CACHE: dict = {}
_TRADE_EDGE_CACHE_MAX = 4  # tests touch at most sf0.001/sf0.01/sf0.1 per app


def trade_graph_edges(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Undirected (src, dst) string-node edges of the customer-supplier
    trade graph, localCheckpoint-truncated and memoized per app+dataset."""
    cache_key = (spark.sparkContext.applicationId, sf_dir)
    cached = _TRADE_EDGE_CACHE.get(cache_key)
    if cached is not None:
        return cached
    orders = load_table(spark, sf_dir, "orders")
    li = load_table(spark, sf_dir, "lineitem")
    e = (
        orders.join(li, orders.o_orderkey == li.l_orderkey)
        .select(
            F.concat(F.lit("c"), F.col("o_custkey").cast("string")).alias("a"),
            F.concat(F.lit("s"), F.col("l_suppkey").cast("string")).alias("b"),
        )
        .distinct()
    )
    und = (
        e.select(F.col("a").alias("src"), F.col("b").alias("dst"))
        .unionByName(e.select(F.col("b").alias("src"), F.col("a").alias("dst")))
        .localCheckpoint(eager=False)
    )
    stale = [k for k in _TRADE_EDGE_CACHE if k[0] != cache_key[0]]
    for k in stale:  # evict entries from dead/previous Spark apps first
        del _TRADE_EDGE_CACHE[k]
    while len(_TRADE_EDGE_CACHE) >= _TRADE_EDGE_CACHE_MAX:
        del _TRADE_EDGE_CACHE[next(iter(_TRADE_EDGE_CACHE))]
    _TRADE_EDGE_CACHE[cache_key] = und
    return und

_IT_DUCK = """
        c{i} AS (
            SELECT u.dst AS node,
                   SUM(CAST(floor(p.pr / d.deg * CAST(1e12 AS DOUBLE))
                            AS DECIMAL(38,0))) AS s
            FROM und u
            JOIN p{j} p ON u.src = p.node
            JOIN deg d ON u.src = d.src
            GROUP BY u.dst
        ),
        p{i} AS (
            SELECT c{i}.node,
                   CAST(0.15 AS DOUBLE) / n.n
                   + CAST(0.85 AS DOUBLE)
                     * (CAST(s AS DOUBLE) / CAST(1e12 AS DOUBLE)) AS pr
            FROM c{i} CROSS JOIN n
        )"""


@register(
    "q_graph_pagerank",
    oracle=(
        """
        WITH e AS (
            SELECT DISTINCT 'c' || CAST(o_custkey AS VARCHAR) AS a,
                            's' || CAST(l_suppkey AS VARCHAR) AS b
            FROM orders JOIN lineitem ON o_orderkey = l_orderkey
        ),
        und AS (
            SELECT a AS src, b AS dst FROM e
            UNION ALL
            SELECT b AS src, a AS dst FROM e
        ),
        deg AS (
            SELECT src, CAST(COUNT(*) AS DOUBLE) AS deg FROM und GROUP BY src
        ),
        n AS (SELECT CAST(COUNT(*) AS DOUBLE) AS n FROM deg),
        p0 AS (
            SELECT src AS node, CAST(1.0 AS DOUBLE) / n.n AS pr
            FROM deg CROSS JOIN n
        ),"""
        + ",".join(_IT_DUCK.format(i=i, j=i - 1) for i in range(1, _ROUNDS + 1))
        + f"""
        SELECT node, pr FROM p{_ROUNDS}
    """
    ),
    section="G1",
    doc="PageRank (3 power iterations, d=0.85) over the undirected "
    "customer–supplier trade graph: per-round contributions quantized "
    "floor(pr/deg * 1e12) and DECIMAL-summed (exact under any "
    "partitioning), rank rebuilt with the identical IEEE double expression "
    "— three chained iterations stay bit-identical cross-engine, output "
    "needs no rounding. Relational Pregel round: join + keyed agg per "
    "iteration, checkpointed edge list, zero per-round driver traffic.",
)
def q_graph_pagerank(spark: SparkSession, sf_dir: str) -> DataFrame:
    und = trade_graph_edges(spark, sf_dir)
    deg = (
        und.groupBy("src")
        .agg(F.count(F.lit(1)).cast("double").alias("deg"))
        .localCheckpoint(eager=False)
    )
    n = deg.agg(F.count(F.lit(1)).cast("double").alias("n"))
    pr = (
        deg.select(F.col("src").alias("node"))
        .crossJoin(F.broadcast(n))
        .select("node", (F.lit(1.0).cast("double") / F.col("n")).alias("pr"))
    )
    for _ in range(_ROUNDS):
        prd = pr.join(deg, pr.node == deg.src).select(
            F.col("src"),
            F.expr(
                "cast(floor(pr / deg * cast(1e12 as double)) as decimal(38,0))"
            ).alias("q"),
        )
        contrib = (
            und.join(prd, "src").groupBy("dst").agg(F.sum("q").alias("s"))
        )
        pr = (
            contrib.crossJoin(F.broadcast(n))
            .select(
                F.col("dst").alias("node"),
                (
                    F.lit(0.15).cast("double") / F.col("n")
                    + F.lit(0.85).cast("double")
                    * (F.col("s").cast("double") / F.lit(1e12).cast("double"))
                ).alias("pr"),
            )
        )
    return pr


@register(
    "q_graph_degree_dist",
    oracle="""
        WITH e AS (
            SELECT DISTINCT 'c' || CAST(o_custkey AS VARCHAR) AS a,
                            's' || CAST(l_suppkey AS VARCHAR) AS b
            FROM orders JOIN lineitem ON o_orderkey = l_orderkey
        ),
        und AS (
            SELECT a AS src FROM e UNION ALL SELECT b FROM e
        ),
        deg AS (
            SELECT src, CAST(COUNT(*) AS BIGINT) AS degree
            FROM und GROUP BY src
        )
        SELECT degree,
               CAST(COUNT(*) AS BIGINT) AS n_nodes,
               CAST(substr(src, 1, 1) = 'c' AS BOOLEAN) AS is_customer
        FROM deg
        GROUP BY degree, substr(src, 1, 1) = 'c'
    """,
    section="G3",
    doc="Degree distribution of the customer-supplier trade graph, split "
    "by node class — the skew diagnostic every graph job runs FIRST (it "
    "is how you decide whether G2-style rank sparsification or salting "
    "is needed before an expensive traversal). Two keyed aggregations "
    "(degree per node, nodes per degree), both map-side combinable; the "
    "second aggregates |V| rows down to the handful of distinct degrees.",
)
def q_graph_degree_dist(spark: SparkSession, sf_dir: str) -> DataFrame:
    orders = load_table(spark, sf_dir, "orders")
    li = load_table(spark, sf_dir, "lineitem")
    e = (
        orders.join(li, orders.o_orderkey == li.l_orderkey)
        .select(
            F.concat(F.lit("c"), F.col("o_custkey").cast("string")).alias("a"),
            F.concat(F.lit("s"), F.col("l_suppkey").cast("string")).alias("b"),
        )
        .distinct()
    )
    und = e.select(F.col("a").alias("src")).unionByName(
        e.select(F.col("b").alias("src"))
    )
    deg = und.groupBy("src").agg(F.count(F.lit(1)).alias("degree"))
    return (
        deg.groupBy(
            "degree",
            (F.substring("src", 1, 1) == "c").alias("is_customer"),
        )
        .agg(F.count(F.lit(1)).alias("n_nodes"))
        .select("degree", "n_nodes", "is_customer")
    )
