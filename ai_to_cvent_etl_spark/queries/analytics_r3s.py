"""Twenty-first-wave operators (r3 continuation): Mann-Whitney U test,
CDC net-change compaction.

  A37 q_agg_mann_whitney — nonparametric two-sample Mann-Whitney U test
                           (order values, status F vs O): tie-averaged
                           ranks, U statistic, tie-corrected normal
                           z — the rank-based member of the two-sample
                           family (A27 KS is distribution-shape, A28
                           Welch is mean-based).
  E25 q_etl_cdc_net      — CDC net-effect compaction: an I/U/D change
                           stream per key collapses to its NET effect
                           (I+…+D → nothing, I+… → upsert with final
                           value, U…D → delete) — the semantics a
                           change-feed consumer needs before applying
                           a batch (E16 applies; this nets first).

Determinism notes (SURVEY §5.3):
  * A37: tie-averaged ranks are rank() + (tie_count−1)/2 — exact halves
    in binary; rank sums are exact decimal-free integer+0.5 sums? No —
    summed as DOUBLE would reorder. They are summed as DECIMAL(38,1)
    (each rank is an exact .0/.5 value, lossless at scale 1), so R1 is
    exact; U, the tie-corrected sigma, and z are single IEEE formulas
    over exact moments, rounded 4dp. The tie term sums t³−t as exact
    BIGINTs.
  * E25 is pure integer/string logic: the op sequence is deterministic
    per key, first/last ops come from min_by/max_by on the exact seq
    number.

Scale notes:
  * A37 is one ranked window over the combined sample + two bounded
    reductions; at groups beyond a task's sort the rank comes from the
    two-pass range-partitioned rank (AQE ordered exchange) — the U
    formula is unchanged.
  * E25 is the net-changes operator Delta/CDF exposes: one keyed
    reduction per batch (min_by/max_by/count partials map-side), then
    E16's single-join MERGE applies the net rows — netting first is
    what keeps a chatty key (1000 updates) from becoming 1000 merge
    probes.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession, Window
from pyspark.sql import functions as F

from ai_to_cvent_etl_spark.io import load_table
from ai_to_cvent_etl_spark.registry import register

# --- A37: Mann-Whitney U -----------------------------------------------------


@register(
    "q_agg_mann_whitney",
    oracle="""
        WITH s AS (
            SELECT o_totalprice AS v,
                   CASE WHEN o_orderstatus = 'F' THEN 1 ELSE 0 END AS g
            FROM orders WHERE o_orderstatus IN ('F', 'O')
        ),
        r AS (
            SELECT v, g,
                   rank() OVER (ORDER BY v) AS rk,
                   COUNT(*) OVER (PARTITION BY v) AS tc
            FROM s
        ),
        m AS (
            SELECT CAST(SUM(g) AS BIGINT) AS n1,
                   CAST(SUM(1 - g) AS BIGINT) AS n2,
                   CAST(SUM(CASE WHEN g = 1 THEN
                       CAST(rk AS DECIMAL(38,1))
                       + CAST(tc - 1 AS DECIMAL(38,1)) / 2 END)
                       AS DOUBLE) AS r1
            FROM r
        ),
        ties AS (
            SELECT CAST(SUM(t * t * t - t) AS BIGINT) AS t3
            FROM (SELECT CAST(COUNT(*) AS BIGINT) AS t FROM s GROUP BY v)
        )
        SELECT n1, n2,
               ROUND(r1 - CAST(n1 AS DOUBLE) * (n1 + 1) / 2.0, 1) AS u,
               ROUND((r1 - CAST(n1 AS DOUBLE) * (n1 + 1) / 2.0
                      - CAST(n1 AS DOUBLE) * n2 / 2.0)
                     / sqrt(CAST(n1 AS DOUBLE) * n2 / 12.0
                            * (CAST(n1 + n2 + 1 AS DOUBLE)
                               - CAST(t3 AS DOUBLE)
                                 / (CAST(n1 + n2 AS DOUBLE)
                                    * (n1 + n2 - 1)))), 4) AS z
        FROM m CROSS JOIN ties
    """,
    section="A37",
    doc="Mann-Whitney U two-sample test on order values (status F vs "
    "O): tie-averaged ranks rank() + (ties−1)/2 — exact .0/.5 halves, "
    "summed as DECIMAL(38,1) so the rank sum R1 is exact and "
    "order-insensitive; U = R1 − n1(n1+1)/2 and the TIE-CORRECTED "
    "normal z are single IEEE formulas over exact moments (the t³−t "
    "tie term sums as exact BIGINTs). The rank-based member of the "
    "two-sample family: A27 KS tests shape, A28 Welch tests means "
    "under normality, Mann-Whitney tests stochastic dominance with no "
    "distributional assumption — the robust default for skewed "
    "metrics. One ranked window + two bounded reductions.",
)
def q_agg_mann_whitney(spark: SparkSession, sf_dir: str) -> DataFrame:
    orders = load_table(spark, sf_dir, "orders")
    s = orders.where(F.col("o_orderstatus").isin("F", "O")).select(
        F.col("o_totalprice").alias("v"),
        F.when(F.col("o_orderstatus") == "F", 1).otherwise(0).alias("g"),
    )
    r = s.select(
        "v",
        "g",
        F.rank().over(Window.orderBy("v")).alias("rk"),
        F.count("*").over(Window.partitionBy("v")).alias("tc"),
    )
    avg_rank = (
        F.col("rk").cast("decimal(38,1)")
        + (F.col("tc") - 1).cast("decimal(38,1)") / 2
    )
    m = r.agg(
        F.sum("g").alias("n1"),
        F.sum(F.lit(1) - F.col("g")).alias("n2"),
        F.sum(F.when(F.col("g") == 1, avg_rank)).cast("double").alias("r1"),
    )
    ties = (
        s.groupBy("v")
        .agg(F.count("*").alias("t"))
        .agg(
            F.sum(
                F.col("t") * F.col("t") * F.col("t") - F.col("t")
            ).alias("t3")
        )
    )
    n1d = F.col("n1").cast("double")
    n2d = F.col("n2").cast("double")
    nd = (F.col("n1") + F.col("n2")).cast("double")
    u = F.col("r1") - n1d * (F.col("n1") + 1) / 2.0
    sigma = F.sqrt(
        n1d
        * n2d
        / 12.0
        * (
            (F.col("n1") + F.col("n2") + 1).cast("double")
            - F.col("t3").cast("double") / (nd * (F.col("n1") + F.col("n2") - 1))
        )
    )
    return m.crossJoin(F.broadcast(ties)).select(
        "n1",
        "n2",
        F.round(u, 1).alias("u"),
        F.round((u - n1d * n2d / 2.0) / sigma, 4).alias("z"),
    )


# --- E25: CDC net-change compaction ------------------------------------------


@register(
    "q_etl_cdc_net",
    oracle="""
        WITH feed AS (
            SELECT o_orderkey AS key, u.seq AS seq, u.op AS op,
                   CAST(o_totalprice AS DECIMAL(18,2)) + u.seq AS val
            FROM orders,
                 unnest(CASE o_orderkey % 5
                        WHEN 0 THEN [struct_pack(seq := 1, op := 'I'),
                                     struct_pack(seq := 2, op := 'U')]
                        WHEN 1 THEN [struct_pack(seq := 1, op := 'I'),
                                     struct_pack(seq := 2, op := 'D')]
                        WHEN 2 THEN [struct_pack(seq := 1, op := 'U'),
                                     struct_pack(seq := 2, op := 'U'),
                                     struct_pack(seq := 3, op := 'U')]
                        WHEN 3 THEN [struct_pack(seq := 1, op := 'U'),
                                     struct_pack(seq := 2, op := 'D')]
                        ELSE [struct_pack(seq := 1, op := 'I')]
                        END) AS u(u)
                 , LATERAL (SELECT u.u.seq AS seq, u.u.op AS op) AS x
        ),
        net AS (
            SELECT key,
                   arg_min(op, seq) AS first_op,
                   arg_max(op, seq) AS last_op,
                   arg_max(val, seq) AS final_val,
                   CAST(COUNT(*) AS BIGINT) AS n_ops
            FROM feed GROUP BY key
        )
        SELECT CASE WHEN first_op = 'I' AND last_op = 'D' THEN 'noop'
                    WHEN last_op = 'D' THEN 'delete'
                    WHEN first_op = 'I' THEN 'insert'
                    ELSE 'update' END AS net_op,
               CAST(COUNT(*) AS BIGINT) AS n_keys,
               CAST(SUM(n_ops) AS BIGINT) AS n_raw_ops,
               CAST(SUM(CASE WHEN last_op <> 'D'
                        THEN CAST(final_val AS DECIMAL(18,2))
                        ELSE CAST(0 AS DECIMAL(18,2)) END) AS DOUBLE)
                   AS surviving_value
        FROM net
        GROUP BY 1
    """,
    section="E25",
    doc="CDC net-effect compaction: a deterministic I/U/D change stream "
    "per order key (sequence shape keyed by o_orderkey%5) collapses to "
    "its NET effect — insert-then-delete nets to NOTHING, "
    "insert-then-updates net to one insert with the final value, "
    "updates-then-delete nets to one delete — via min_by/max_by on the "
    "exact sequence number (one keyed reduction, partials map-side). "
    "Output: per net-op key counts, raw-op volume (the compaction "
    "ratio), and the exact surviving value mass. This is the "
    "net-changes half of CDC consumption; E16's single-join MERGE then "
    "applies the netted batch — netting first keeps a chatty key from "
    "becoming a thousand merge probes.",
)
def q_etl_cdc_net(spark: SparkSession, sf_dir: str) -> DataFrame:
    orders = load_table(spark, sf_dir, "orders")
    ops = F.expr(
        """
        CASE CAST(o_orderkey % 5 AS INT)
          WHEN 0 THEN array(struct(1 AS seq, 'I' AS op),
                            struct(2 AS seq, 'U' AS op))
          WHEN 1 THEN array(struct(1 AS seq, 'I' AS op),
                            struct(2 AS seq, 'D' AS op))
          WHEN 2 THEN array(struct(1 AS seq, 'U' AS op),
                            struct(2 AS seq, 'U' AS op),
                            struct(3 AS seq, 'U' AS op))
          WHEN 3 THEN array(struct(1 AS seq, 'U' AS op),
                            struct(2 AS seq, 'D' AS op))
          ELSE array(struct(1 AS seq, 'I' AS op))
        END
        """
    )
    feed = (
        orders.select(
            F.col("o_orderkey").alias("key"),
            F.col("o_totalprice").cast("decimal(18,2)").alias("base"),
            F.explode(ops).alias("u"),
        )
        .select(
            "key",
            F.col("u.seq").alias("seq"),
            F.col("u.op").alias("op"),
            (F.col("base") + F.col("u.seq")).alias("val"),
        )
    )
    net = feed.groupBy("key").agg(
        F.min_by("op", "seq").alias("first_op"),
        F.max_by("op", "seq").alias("last_op"),
        F.max_by("val", "seq").alias("final_val"),
        F.count("*").alias("n_ops"),
    )
    net_op = (
        F.when(
            (F.col("first_op") == "I") & (F.col("last_op") == "D"), "noop"
        )
        .when(F.col("last_op") == "D", "delete")
        .when(F.col("first_op") == "I", "insert")
        .otherwise("update")
    )
    z = F.lit(0).cast("decimal(18,2)")
    return net.groupBy(net_op.alias("net_op")).agg(
        F.count("*").alias("n_keys"),
        F.sum("n_ops").alias("n_raw_ops"),
        F.sum(
            F.when(
                F.col("last_op") != "D",
                F.col("final_val").cast("decimal(18,2)"),
            ).otherwise(z)
        )
        .cast("double")
        .alias("surviving_value"),
    )
