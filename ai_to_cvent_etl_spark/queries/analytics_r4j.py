"""Thirty-eighth-wave operators (r3 continuation): embedding OOD scoring,
largest-remainder allocation.

  V20 q_vec_ood_score — out-of-distribution scoring for embedding QA:
                        squared distance to the label centroid,
                        z-scored against the label's own distance
                        distribution — flags mislabeled/corrupt
                        vectors before they poison training.
  A49 q_agg_allocate  — largest-remainder (Hamilton) allocation: a
                        fixed cent budget spread across nations
                        proportional to revenue such that the integer
                        allocations sum EXACTLY to the budget — the
                        financial allocation operator naive rounding
                        breaks.

Determinism notes (SURVEY §5.3):
  * V20: centroids are quantized-sum means (G1's device); per-vector
    distances quantize before the per-label moment sums (rule 10
    margins hold: dist² ≲ 1e2 over ≲2e3 vectors); the z is one IEEE
    formula rounded 4dp, the flag compares identical bits.
  * A49 is exact integer arithmetic end to end: base = floor of an
    IEEE share product (identical bits), remainders ranked with a
    nation tie-break, top-(shortfall) get +1 cent.

Scale notes:
  * V20 is two keyed reductions (centroids, then label moments) + one
    map-side score pass — the per-label OOD gate runs in the same
    shape as V2/V14; swap label centroids for V6's learned cells when
    labels are absent.
  * A49 collapses to |entities| rows; the rank runs on the collapsed
    relation. The same shape allocates budgets, quotas, and sampling
    targets (L16's mixture plan rounded to exact document counts).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession, Window
from pyspark.sql import functions as F

from ai_to_cvent_etl_spark.io import load_table
from ai_to_cvent_etl_spark.registry import register

# --- V20: embedding OOD score ------------------------------------------------

_QS = "CAST(SUM(CAST(floor(({x}) * 1e12) AS DECIMAL(38,0))) AS DOUBLE) / 1e12"


@register(
    "q_vec_ood_score",
    oracle=f"""
        WITH ex AS (
            SELECT vec_id, label, u.i AS i, CAST(u.x AS DOUBLE) AS x
            FROM (
                SELECT vec_id, label,
                       unnest(list_transform(embedding,
                              (x, i) -> struct_pack(x := x, i := i))) AS u
                FROM embeddings
            )
        ),
        cent AS (
            SELECT label, i, {_QS.format(x='x')} / COUNT(*) AS c
            FROM ex GROUP BY label, i
        ),
        dist AS (
            SELECT e.vec_id, e.label,
                   {_QS.format(x='(e.x - c.c) * (e.x - c.c)')} AS d2
            FROM ex e JOIN cent c ON c.label = e.label AND c.i = e.i
            GROUP BY e.vec_id, e.label
        ),
        mom AS (
            SELECT label,
                   CAST(COUNT(*) AS DOUBLE) AS n,
                   {_QS.format(x='d2')} AS s1,
                   {_QS.format(x='d2 * d2')} AS s2
            FROM dist GROUP BY label
        )
        SELECT d.vec_id, d.label,
               ROUND(d.d2, 6) AS dist2,
               ROUND((d.d2 - m.s1 / m.n)
                     / sqrt(m.s2 / m.n - (m.s1 / m.n) * (m.s1 / m.n)), 4)
                   AS z,
               (d.d2 - m.s1 / m.n)
               / sqrt(m.s2 / m.n - (m.s1 / m.n) * (m.s1 / m.n)) > 3.0
                   AS is_ood
        FROM dist d JOIN mom m ON m.label = d.label
    """,
    section="V20",
    doc="Out-of-distribution scoring for embedding QA: each vector's "
    "squared distance to its LABEL centroid (quantized-sum exact — "
    "centroid means, per-vector distances, and the per-label distance "
    "moments all go through the floor(x·1e12) DECIMAL device), "
    "z-scored against the label's own distance distribution, flagged "
    "at z > 3 on identical bits. The embedding-hygiene gate that "
    "catches mislabeled or corrupt vectors before they poison "
    "training or skew V6's centroids; labels absent → swap in V6's "
    "learned cells, same shape. Two keyed reductions + one map-side "
    "score pass.",
)
def q_vec_ood_score(spark: SparkSession, sf_dir: str) -> DataFrame:
    emb = load_table(spark, sf_dir, "embeddings")
    ex = emb.select(
        "vec_id", "label", F.posexplode("embedding").alias("i0", "xf")
    ).select(
        "vec_id",
        "label",
        (F.col("i0") + 1).alias("i"),
        F.col("xf").cast("double").alias("x"),
    )

    def qsum(c):
        return (
            F.sum(F.floor(c * 1e12).cast("decimal(38,0)")).cast("double")
            / 1e12
        )

    cent = ex.groupBy("label", "i").agg(
        (qsum(F.col("x")) / F.count("*")).alias("c")
    )
    dist = (
        ex.join(cent, ["label", "i"])
        .groupBy("vec_id", "label")
        .agg(
            qsum((F.col("x") - F.col("c")) * (F.col("x") - F.col("c"))).alias(
                "d2"
            )
        )
    )
    mom = dist.groupBy("label").agg(
        F.count("*").cast("double").alias("n"),
        qsum(F.col("d2")).alias("s1"),
        qsum(F.col("d2") * F.col("d2")).alias("s2"),
    )
    j = dist.join(mom, "label")
    mean = F.col("s1") / F.col("n")
    sd = F.sqrt(F.col("s2") / F.col("n") - mean * mean)
    z = (F.col("d2") - mean) / sd
    return j.select(
        "vec_id",
        "label",
        F.round("d2", 6).alias("dist2"),
        F.round(z, 4).alias("z"),
        (z > 3.0).alias("is_ood"),
    )


# --- A49: largest-remainder allocation ---------------------------------------

_BUDGET_CENTS = 1_000_000


@register(
    "q_agg_allocate",
    oracle=f"""
        WITH rev AS (
            SELECT c.c_nationkey AS nation,
                   CAST(SUM(CAST(o.o_totalprice AS DECIMAL(18,2))) * 100
                        AS BIGINT) AS cents
            FROM orders o JOIN customer c ON c.c_custkey = o.o_custkey
            GROUP BY c.c_nationkey
        ),
        shares AS (
            SELECT nation, cents,
                   CAST(floor(CAST(cents AS DOUBLE)
                              / CAST(SUM(cents) OVER () AS DOUBLE)
                              * {_BUDGET_CENTS}) AS BIGINT) AS base,
                   CAST(cents AS DOUBLE)
                   / CAST(SUM(cents) OVER () AS DOUBLE)
                   * {_BUDGET_CENTS}
                   - floor(CAST(cents AS DOUBLE)
                           / CAST(SUM(cents) OVER () AS DOUBLE)
                           * {_BUDGET_CENTS}) AS rem
            FROM rev
        ),
        ranked AS (
            SELECT nation, cents, base, rem,
                   row_number() OVER (ORDER BY rem DESC, nation) AS rnk,
                   CAST({_BUDGET_CENTS} - SUM(base) OVER () AS BIGINT)
                       AS shortfall
            FROM shares
        )
        SELECT nation, base,
               CAST(base + CASE WHEN rnk <= shortfall THEN 1 ELSE 0 END
                    AS BIGINT) AS allocated_cents,
               CAST(rnk AS INT) AS remainder_rank
        FROM ranked
    """,
    section="A49",
    doc=f"Largest-remainder (Hamilton) allocation: a fixed "
    f"{_BUDGET_CENTS}-cent budget spread across nations proportional "
    "to exact revenue such that integer allocations SUM EXACTLY to "
    "the budget — base = floor(share·budget), then the shortfall "
    "cents go to the largest fractional remainders (nation "
    "tie-break). Naive per-row rounding drifts by up to |entities|/2 "
    "cents and reconciliation (J23) flags it forever. Share products "
    "are IEEE over exact integer cents — identical bits, so floor, "
    "remainders, and the rank all agree cross-engine. The same shape "
    "allocates quotas and sampling targets (L16's mixture rates "
    "rounded to exact document counts). Collapses to |nations| rows.",
)
def q_agg_allocate(spark: SparkSession, sf_dir: str) -> DataFrame:
    orders = load_table(spark, sf_dir, "orders")
    customer = load_table(spark, sf_dir, "customer")
    rev = (
        orders.join(customer, orders.o_custkey == customer.c_custkey)
        .groupBy(F.col("c_nationkey").alias("nation"))
        .agg(
            F.expr(
                "CAST(SUM(CAST(o_totalprice AS DECIMAL(18,2))) * 100 "
                "AS BIGINT)"
            ).alias("cents")
        )
    )
    w = Window.partitionBy()
    share = F.col("cents").cast("double") / F.sum("cents").over(w).cast(
        "double"
    )
    raw = share * _BUDGET_CENTS
    shares = rev.select(
        "nation",
        "cents",
        F.floor(raw).cast("long").alias("base"),
        (raw - F.floor(raw)).alias("rem"),
    )
    ranked = shares.select(
        "nation",
        "base",
        "rem",
        F.row_number()
        .over(Window.orderBy(F.desc("rem"), F.asc("nation")))
        .alias("rnk"),
        (F.lit(_BUDGET_CENTS) - F.sum("base").over(w)).alias("shortfall"),
    )
    return ranked.select(
        "nation",
        "base",
        (
            F.col("base")
            + F.when(F.col("rnk") <= F.col("shortfall"), 1).otherwise(0)
        ).cast("long").alias("allocated_cents"),
        F.col("rnk").cast("int").alias("remainder_rank"),
    )
