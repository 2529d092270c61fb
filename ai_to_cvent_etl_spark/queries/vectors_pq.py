"""V8: Product-quantization ANN with asymmetric distance computation (ADC).

The compressed-domain ANN serving path that complements IVF (V6/V7): the
64-dim embedding splits into 4 subspaces of 16 dims; each subspace gets its
own k=4 codebook trained with the deterministic Lloyd machinery
(operators/kmeans.py, 2 rounds, lowest-vec_id seeds); every corpus vector is
encoded as 4 small codes (= 1 byte here; 256-centroid books at production
scale). A query is NOT quantized — ADC looks up the exact
query-to-centroid distance per (subspace, code) from a 4x4 table computed
row-locally on the query side, and the approximate distance is the sum of 4
table lookups per corpus row.

Cross-engine determinism: identical to V6 — floor(x*1e6+0.5) grid
quantization, exact DECIMAL centroid sums, left-to-right distance folds,
lowest-cluster tie-break — applied per subspace, so all 4 codebooks and all
code assignments are bit-identical between Spark and the DuckDB oracle
(which retrains all 4 books in chained CTEs). The ADC sum is 4 chained
double additions in a fixed order on both engines.

Scale notes: training cost is 4 independent 16-dim k-means fits (memoized
per dataset like V6). Encoding is map-only over broadcast-literal codebooks
— the corpus never shuffles and afterwards is represented by 4 ints per
row, the whole point of PQ: the ADC scan reads codes, not vectors (16x
compression here; 64x with byte codes over float32 at production dims).
Query distance tables are (n_queries x 16) rows broadcast; the scan is one
broadcast join + top-k window per query."""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession, Window
from pyspark.sql import functions as F

from ai_to_cvent_etl_spark.io import load_table
from ai_to_cvent_etl_spark.registry import register

_N_SUB = 4
_SUB_DIM = 16
_K = 4


def _pq_dist(s: int) -> str:
    lo, hi = s * _SUB_DIM + 1, (s + 1) * _SUB_DIM
    return (
        f"list_reduce(list_transform(list_zip(e.embedding[{lo}:{hi}], c.c),"
        " p -> (CAST(p[1] AS DOUBLE) - CAST(p[2] AS DOUBLE))"
        " * (CAST(p[1] AS DOUBLE) - CAST(p[2] AS DOUBLE))),"
        " (acc, v) -> acc + v)"
    )


def _pq_ctes(s: int) -> str:
    """The V6 Lloyd chain (2 rounds, k=4) restricted to subspace ``s``."""
    lo, hi = s * _SUB_DIM + 1, (s + 1) * _SUB_DIM
    off = s * _SUB_DIM
    dist = _pq_dist(s)
    return f"""seeds_{s} AS (
            SELECT vec_id, ROW_NUMBER() OVER (ORDER BY vec_id) - 1 AS cluster
            FROM embeddings ORDER BY vec_id LIMIT {_K}
        ),
        c0_{s} AS (
            SELECT sd.cluster,
                   list_transform(e.embedding[{lo}:{hi}],
                       x -> floor(CAST(x AS DOUBLE) * 1000000.0 + 0.5)
                            / 1000000.0) AS c
            FROM seeds_{s} sd JOIN embeddings e USING (vec_id)
        ),
        a1_{s} AS (
            SELECT vec_id, cluster FROM (
                SELECT e.vec_id, c.cluster,
                       ROW_NUMBER() OVER (PARTITION BY e.vec_id
                                          ORDER BY {dist}, c.cluster) AS rn
                FROM embeddings e CROSS JOIN c0_{s} c
            ) WHERE rn = 1
        ),
        u1_{s} AS (
            SELECT a.cluster, d.i AS dim,
                   floor(CAST(SUM(CAST(
                             floor(CAST(e.embedding[{off} + d.i] AS DOUBLE)
                                   * 1000000.0 + 0.5) / 1000000.0
                         AS DECIMAL(18,6))) AS DOUBLE)
                         / COUNT(*) * 1000000.0 + 0.5) / 1000000.0 AS v
            FROM a1_{s} a JOIN embeddings e USING (vec_id),
                 range(1, {_SUB_DIM + 1}) d(i)
            GROUP BY a.cluster, d.i
        ),
        c1_{s} AS (
            SELECT cluster, list(v ORDER BY dim) AS c FROM u1_{s} GROUP BY cluster
        ),
        a2_{s} AS (
            SELECT vec_id, cluster FROM (
                SELECT e.vec_id, c.cluster,
                       ROW_NUMBER() OVER (PARTITION BY e.vec_id
                                          ORDER BY {dist}, c.cluster) AS rn
                FROM embeddings e CROSS JOIN c1_{s} c
            ) WHERE rn = 1
        ),
        qd_{s} AS (
            SELECT e.vec_id AS query_id, c.cluster, {dist} AS d
            FROM embeddings e CROSS JOIN c1_{s} c
            WHERE e.vec_id < 10
        )"""


_PQ_ORACLE = (
    "WITH "
    + ",\n        ".join(_pq_ctes(s) for s in range(_N_SUB))
    + """,
        codes AS (
            SELECT a2_0.vec_id,
                   a2_0.cluster AS k0, a2_1.cluster AS k1,
                   a2_2.cluster AS k2, a2_3.cluster AS k3
            FROM a2_0
            JOIN a2_1 USING (vec_id)
            JOIN a2_2 USING (vec_id)
            JOIN a2_3 USING (vec_id)
        )
        SELECT query_id, neighbor_id, CAST(rn AS BIGINT) AS rank FROM (
            SELECT qd0.query_id, x.vec_id AS neighbor_id,
                   ROW_NUMBER() OVER (
                       PARTITION BY qd0.query_id
                       ORDER BY qd0.d + qd1.d + qd2.d + qd3.d, x.vec_id
                   ) AS rn
            FROM codes x
            JOIN qd_0 qd0 ON qd0.cluster = x.k0
            JOIN qd_1 qd1 ON qd1.cluster = x.k1 AND qd1.query_id = qd0.query_id
            JOIN qd_2 qd2 ON qd2.cluster = x.k2 AND qd2.query_id = qd0.query_id
            JOIN qd_3 qd3 ON qd3.cluster = x.k3 AND qd3.query_id = qd0.query_id
            WHERE x.vec_id <> qd0.query_id
        ) WHERE rn <= 3
    """
)


@register(
    "q_vec_pq_adc",
    oracle=_PQ_ORACLE,
    section="V8",
    doc="Product-quantization ANN with asymmetric distance computation: "
    "4 subspaces x 16 dims, k=4 codebook per subspace trained with the V6 "
    "deterministic Lloyd rounds; corpus encoded to 4 codes (map-only, "
    "never shuffled), queries keep exact vectors and ADC sums 4 "
    "query-to-centroid table lookups per corpus row. Top-3 by (adc, id). "
    "All 4 codebooks bit-identical cross-engine (grid quantization + "
    "DECIMAL sums); the oracle retrains them in chained CTEs.",
)
def q_vec_pq_adc(spark: SparkSession, sf_dir: str) -> DataFrame:
    from ai_to_cvent_etl_spark.operators.kmeans import assign, kmeans_fit

    emb = load_table(spark, sf_dir, "embeddings")
    sliced = emb
    for s in range(_N_SUB):
        sliced = sliced.withColumn(
            f"pqsub{s}", F.slice("embedding", s * _SUB_DIM + 1, _SUB_DIM)
        )
    books = [
        kmeans_fit(sliced, k=_K, iters=2, vec_col=f"pqsub{s}", cache_key=sf_dir)
        for s in range(_N_SUB)
    ]
    codes = sliced
    for s in range(_N_SUB):
        codes = (
            assign(codes, books[s], vec_col=f"pqsub{s}")
            .withColumnRenamed("cluster", f"k{s}")
            .drop("dist2")
        )
    codes = codes.select("vec_id", *[f"k{s}" for s in range(_N_SUB)])

    # Query-side exact distance tables: one (query_id, cluster, d) row per
    # (query, subspace, centroid) — joined by code, NEVER indexed by
    # position, so codebooks that lost a cluster stay correct.
    q = sliced.filter(F.col("vec_id") < 10)
    qds = []
    for s in range(_N_SUB):
        entries = F.array(
            *[
                F.struct(
                    F.lit(int(cid)).cast("bigint").alias("cluster"),
                    F.aggregate(
                        F.zip_with(
                            F.col(f"pqsub{s}"),
                            F.array(*[F.lit(float(v)) for v in c]),
                            lambda x, y: (x.cast("double") - y)
                            * (x.cast("double") - y),
                        ),
                        F.lit(0.0),
                        lambda a, v: a + v,
                    ).alias("d"),
                )
                for cid, c in sorted(books[s])
            ]
        )
        qid = "query_id" if s == 0 else f"query_id_{s}"
        qds.append(
            q.select(
                F.col("vec_id").alias(qid), F.explode(entries).alias("e")
            ).select(
                qid,
                F.col("e.cluster").alias(f"qk{s}"),
                F.col("e.d").alias(f"d{s}"),
            )
        )

    out = codes.join(
        F.broadcast(qds[0]),
        (F.col("k0") == F.col("qk0")) & (F.col("vec_id") != F.col("query_id")),
    )
    for s in range(1, _N_SUB):
        out = out.join(
            F.broadcast(qds[s]),
            (F.col(f"k{s}") == F.col(f"qk{s}"))
            & (F.col("query_id") == F.col(f"query_id_{s}")),
        ).drop(f"query_id_{s}")
    adc = F.col("d0") + F.col("d1") + F.col("d2") + F.col("d3")
    w = Window.partitionBy("query_id").orderBy("adc", "neighbor_id")
    return (
        out.select(
            "query_id",
            F.col("vec_id").alias("neighbor_id"),
            adc.alias("adc"),
        )
        .withColumn("rn", F.row_number().over(w))
        .filter(F.col("rn") <= 3)
        .select("query_id", "neighbor_id", F.col("rn").cast("bigint").alias("rank"))
    )
