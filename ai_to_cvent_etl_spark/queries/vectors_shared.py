"""SURVEY §2.10 — vector / similarity operators (V1-V4).

All vector math uses Spark higher-order functions (transform / zip_with /
aggregate) — JVM-side, codegen-friendly, no Python UDF in any declared path.
Floats are widened to DOUBLE before arithmetic on both engines; folds run
left-to-right; irrational outputs are rounded to 4dp (§5.3 rule 2).

V3's output is ids+rank only — immune to float drift unless two similarities
are within ~1e-12 of each other (vanishingly unlikely for random vectors).
At 100 TB the brute-force cross join becomes block-partitioned broadcast k-NN
(queries/dedup_scale.py q_ann_ivf_topk); this exact form stays as the
correctness oracle.
"""

# Shared constants/helpers split out of vectors.py (r6: no
# source file over the 5k-line readability budget); query
# chunks import exactly what they reference.

from __future__ import annotations
from pyspark.sql import Column, DataFrame, SparkSession, Window
from pyspark.sql import functions as F
from ai_to_cvent_etl_spark.io import load_table
from ai_to_cvent_etl_spark.registry import register
from pyspark.sql import DataFrame, SparkSession, Window
from pyspark.sql.types import DecimalType
import pandas as pd
from ai_to_cvent_etl_spark.queries._util import dec2
from pyspark.sql import DataFrame, SparkSession
from ai_to_cvent_etl_spark.queries.analytics_r2 import (  # noqa: E402
    _KM_CTES as _DUNN_KM_CTES,
)

def _sq_norm(col: str) -> Column:
    """Sum of squares as a left-to-right double fold (matches list_sum order)."""
    return F.aggregate(
        F.transform(F.col(col), lambda x: x.cast("double") * x.cast("double")),
        F.lit(0.0),
        lambda acc, v: acc + v,
    )

def _dot(a: str, b: str) -> Column:
    return F.aggregate(
        F.zip_with(F.col(a), F.col(b), lambda x, y: x.cast("double") * y.cast("double")),
        F.lit(0.0),
        lambda acc, v: acc + v,
    )

# ==== from analytics_r3d ===========================================

_SCALE_DIMS = 8  # emit the first k dims long-form (output stays bounded)

# ==== from analytics_r3e ===========================================

def _recall_oracle() -> str:
    from ai_to_cvent_etl_spark.queries.dedup_scale import _dot_duck, _nsq_duck

    return f"""
        WITH exact3 AS MATERIALIZED (
            SELECT query_id, neighbor_id FROM (
                SELECT q.vec_id AS query_id, n.vec_id AS neighbor_id,
                       ROW_NUMBER() OVER (
                            PARTITION BY q.vec_id
                            ORDER BY list_cosine_similarity(
                                         q.embedding, n.embedding) DESC,
                                     n.vec_id
                       ) AS rank
                FROM (SELECT * FROM embeddings WHERE vec_id < 10) q
                JOIN embeddings n ON n.vec_id <> q.vec_id
            ) WHERE rank <= 3
        ),
        cells AS MATERIALIZED (
            SELECT vec_id, embedding,
                   4 * (CASE WHEN embedding[1] >= 0 THEN 1 ELSE 0 END)
                 + 2 * (CASE WHEN embedding[2] >= 0 THEN 1 ELSE 0 END)
                 +     (CASE WHEN embedding[3] >= 0 THEN 1 ELSE 0 END) AS cell
            FROM embeddings
        ),
        approx3 AS MATERIALIZED (
            SELECT query_id, neighbor_id FROM (
                SELECT a.vec_id AS query_id, b.vec_id AS neighbor_id,
                       ROW_NUMBER() OVER (
                            PARTITION BY a.vec_id
                            ORDER BY {_dot_duck('a', 'b')}
                                     / ({_nsq_duck('a')} * {_nsq_duck('b')})
                                     DESC,
                                     b.vec_id
                       ) AS rank
                FROM (SELECT * FROM cells WHERE vec_id < 10) a
                JOIN cells b ON a.cell = b.cell AND b.vec_id <> a.vec_id
            ) WHERE rank <= 3
        )
        SELECT e.query_id,
               CAST(COUNT(a.neighbor_id) AS BIGINT) AS n_match,
               CAST(COUNT(a.neighbor_id) AS DOUBLE) / 3.0 AS recall_at_3
        FROM exact3 e
        LEFT JOIN approx3 a
          ON e.query_id = a.query_id AND e.neighbor_id = a.neighbor_id
        GROUP BY e.query_id
    """

# ==== from analytics_r3g ===========================================

_PRUNE_KEEP = 8

# ==== from analytics_r3j ===========================================

_KNN_K = 5

def _knn_oracle() -> str:
    return f"""
        WITH nn AS MATERIALIZED (
            SELECT query_id, neighbor_id FROM (
                SELECT q.vec_id AS query_id, n.vec_id AS neighbor_id,
                       ROW_NUMBER() OVER (
                            PARTITION BY q.vec_id
                            ORDER BY list_cosine_similarity(
                                         q.embedding, n.embedding) DESC,
                                     n.vec_id
                       ) AS rank
                FROM (SELECT * FROM embeddings WHERE vec_id < 10) q
                JOIN embeddings n ON n.vec_id <> q.vec_id
            ) WHERE rank <= {_KNN_K}
        ),
        votes AS (
            SELECT nn.query_id, e.label,
                   CAST(COUNT(*) AS BIGINT) AS n_votes
            FROM nn JOIN embeddings e ON nn.neighbor_id = e.vec_id
            GROUP BY nn.query_id, e.label
        ),
        pred AS (
            SELECT query_id, label AS pred_label FROM (
                SELECT *, row_number() OVER (
                    PARTITION BY query_id ORDER BY n_votes DESC, label
                ) AS rnk FROM votes
            ) WHERE rnk = 1
        )
        SELECT p.query_id, p.pred_label,
               CAST(g.label AS INTEGER) AS true_label,
               CASE WHEN p.pred_label = g.label THEN 1 ELSE 0 END AS is_correct
        FROM pred p JOIN embeddings g ON p.query_id = g.vec_id
    """

# ==== from analytics_r3m ===========================================

_Q = 1e12

def _qsum(c):
    """Exact, order-insensitive sum of a double column: quantize with
    floor(x*1e12) (exactly defined on doubles), sum as DECIMAL(38,0),
    convert back to double. Bit-identical on Spark and DuckDB."""
    return (
        F.sum(F.floor(c * F.lit(_Q)).cast("decimal(38,0)")).cast("double")
        / F.lit(_Q)
    )

_QSUM_DUCK = "CAST(SUM(CAST(floor(({x}) * 1e12) AS DECIMAL(38,0))) AS DOUBLE) / 1e12"

_PCA_ROUNDS = 3

_PCA_IT_DUCK = """
        mv{i} AS (
            SELECT c.i AS i,
                   {qsum} AS s
            FROM cov c JOIN v{j} v ON v.i = c.j
            GROUP BY c.i
        ),
        nrm{i} AS (
            SELECT sqrt({qsum2}) AS nrm FROM mv{i}
        ),
        v{i} AS (
            SELECT i, s / nrm AS x FROM mv{i} CROSS JOIN nrm{i}
        )""".format(
    i="{i}",
    j="{j}",
    qsum=_QSUM_DUCK.format(x="c.c * v.x"),
    qsum2=_QSUM_DUCK.format(x="s * s"),
)

# ==== from analytics_r3o ===========================================

_HAM_TOPK = 10

_HAM_NQ = 10

def _pack_spark(lo: int) -> str:
    """Pack 32 sign bits (dims lo..lo+31, 1-based) into one BIGINT; 32-bit
    halves keep every shift < 63 (a 1<<63 overflows DuckDB's checked
    BIGINT shift and wraps negative in Spark — word arrays generalize)."""
    return (
        f"aggregate(transform(slice(embedding, {lo}, 32), (x, i) -> "
        "IF(x > CAST(0.0 AS FLOAT), shiftleft(CAST(1 AS BIGINT), i), "
        "CAST(0 AS BIGINT))), CAST(0 AS BIGINT), (a, b) -> a + b)"
    )

def _pack_duck(lo: int) -> str:
    return (
        f"CAST(list_sum(list_transform(list_slice(embedding, {lo}, "
        f"{lo + 31}), (x, i) -> CASE WHEN x > 0 THEN "
        "(CAST(1 AS BIGINT) << (i - 1)) ELSE CAST(0 AS BIGINT) END)) "
        "AS BIGINT)"
    )

# ==== from analytics_r3u ===========================================

_MAXSIM_NQ = 8

_COS_DUCK = """
    list_sum(list_transform(q.embedding,
             (x, i) -> CAST(x AS DOUBLE) * CAST(c.embedding[i] AS DOUBLE)))
    / (sqrt(list_sum(list_transform(q.embedding,
             (x, i) -> CAST(x AS DOUBLE) * CAST(x AS DOUBLE))))
       * sqrt(list_sum(list_transform(c.embedding,
             (x, i) -> CAST(x AS DOUBLE) * CAST(x AS DOUBLE)))))
"""

# ==== from analytics_r4j ===========================================

_QS = "CAST(SUM(CAST(floor(({x}) * 1e12) AS DECIMAL(38,0))) AS DOUBLE) / 1e12"

_MMR_QUERY_ID = 0

_MMR_POOL = 20      # candidate pool: top-20 by relevance

_MMR_K = 5          # picks

# lambda = 0.7 — scores are scaled x10 so the MMR objective
# 0.7*rel - 0.3*maxsim becomes the EXACT integer 7*relq - 3*msimq.


def _mmr_sel_ctes() -> str:
    """sel1..sel5 greedy CTEs + the cumulative selected-set unions."""
    parts = [
        "sel1 AS MATERIALIZED (SELECT vec_id FROM cands"
        " ORDER BY relq DESC, vec_id LIMIT 1)"
    ]
    for r in range(2, _MMR_K + 1):
        prev = " UNION ALL ".join(
            f"SELECT vec_id FROM sel{i}" for i in range(1, r)
        )
        parts.append(
            f"""picked{r} AS MATERIALIZED ({prev}),
        sc{r} AS MATERIALIZED (
            SELECT c.vec_id, 7 * c.relq - 3 * MAX(s.simq) AS score
            FROM cands c
            JOIN sims s ON s.a = c.vec_id
                       AND s.b IN (SELECT vec_id FROM picked{r})
            WHERE c.vec_id NOT IN (SELECT vec_id FROM picked{r})
            GROUP BY c.vec_id, c.relq
        ),
        sel{r} AS MATERIALIZED (
            SELECT vec_id FROM sc{r} ORDER BY score DESC, vec_id LIMIT 1
        )"""
        )
    return ",\n        ".join(parts)

_SIL_SEEDS = (3, 17, 42, 91)

_MKNN_CAP = 800   # corpus slice for the exact all-pairs build

_MKNN_K = 3

_TWONN_CAP = 500

_HUB_K = 3

# --- V38: NDCG@k retrieval quality ------------------------------------------

_NDCG_NQ = 10   # query vectors: vec_id < 10

_NDCG_K = 10    # ranking cutoff

# Quantized log2 discounts: disc[r] = round(1e9 / log2(r+1)) embedded as the
# SAME integer literals in both engines (computed once here), so the DCG sum
# is an exact BIGINT fold — no cross-engine libm log2 in the hot expression
# and no float summation order (SURVEY §5.3 rule 10 device).
_NDCG_DISC = [round(1e9 / __import__("math").log2(r + 1))
              for r in range(1, _NDCG_K + 1)]

_NDCG_PREFIX = [sum(_NDCG_DISC[:k]) for k in range(1, _NDCG_K + 1)]

# ---------------------------------------------------------------------------
# Wave 116 (r5): retrieval-metric addition — MRR.
# ---------------------------------------------------------------------------

_MRR_NQ = 10

_MRR_K = 10

_MRR_LCM = 2520  # lcm(1..10): 2520/r is an exact integer for every rank

_D2_DUCK = """
    list_sum(list_transform({a}, (x, i) ->
        (CAST(x AS DOUBLE) - CAST({b}[i] AS DOUBLE))
        * (CAST(x AS DOUBLE) - CAST({b}[i] AS DOUBLE))))
"""

# ==== wave 131: KNN-Shapley data valuation =========================

_SHAP_K = 5

# ==== wave 134: rank-biased overlap between retrieval paths ========

_RBO_P = 0.9

_RBO_K = 10

# w_q12[m] = floor(1e12 * sum_{d=m..K} (1-p) p^(d-1) / d): the exact
# truncated-RBO mass a common neighbor contributes when its WORSE rank is
# m. Computed ONCE in Python and embedded as integer literals in both
# engines — zero cross-engine float math.
_RBO_W_Q12 = [235416399425, 135416399425, 90416399425, 63416399425, 45191399425, 32069399425, 22227899425, 14635885139, 8657173890, 3874204890]

# ==== wave 162a: reciprocal-rank fusion ============================

_RRF_K = 60

# floor(1e12 / (k + r)) for r = 1..10 — Python-precomputed integer
# masses (the V22 device): engines only ever SUM these literals.
_RRF_Q12 = [16393442622, 16129032258, 15873015873, 15625000000, 15384615384, 15151515151, 14925373134, 14705882352, 14492753623, 14285714285]

# ==== wave 173b: local outlier factor (V39) =========================

_LOF_CAP = 300   # corpus slice for the exact all-pairs kNN build

_LOF_K = 5

# ==== wave 176a: Schilling-Henze kNN label test (V40) ===============

_SH_CAP = 400   # corpus slice for the exact all-pairs kNN build

_SH_K = 5

# ==== wave 191a: Dunn index (V42) ===================================

_DUNN_CAP = 400   # corpus slice for the exact all-pairs distances

# ==== wave 206b: ANN index memory budget (V45) ======================

# sizing constants: float32 vectors, int64 ids, k=8 coarse centroids,
# PQ with 4 subquantizers x 1-byte codes (the V6/V8 configurations)
_IMB_DIM = 64

_IMB_K = 8

_IMB_M = 4
