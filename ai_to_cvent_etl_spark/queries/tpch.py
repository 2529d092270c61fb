"""Canonical TPC-H query suite (SURVEY §2.125, family H).

The testdata is TPC-H-ish (TESTDATA.md): the canonical decision-support
queries are the lingua franca of OLAP engines, so the suite pins the exact
multi-join/group/top-k shapes every warehouse user expects, adapted to the
columns this schema actually carries (no o_shippriority / c_address /
p_mfgr — the adapted output lists note each drop).

Determinism: every revenue aggregate uses the §5.3 money device —
DECIMAL(18,2)-exact products and sums, ONE decimal→double cast at the end —
so the hash never rides on float summation order. Top-k selections use
row_number with full tie-breaks (the O1 device), so the SET is deterministic
even under revenue ties.

100 TB notes: these are the plans Catalyst is built for — dim tables
(nation/region, filtered customer slices) broadcast; the fact-side joins
shuffle on their keys with AQE sizing; date filters push to the parquet
scan; the top-k is a partial TakeOrdered, never a full sort.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession, Window
from pyspark.sql import functions as F

from ai_to_cvent_etl_spark.io import load_table
from ai_to_cvent_etl_spark.queries._util import (
    ORACLE_DISC_PRICE,
    dec2,
    disc_price,
)
from ai_to_cvent_etl_spark.registry import register

_Q3_CUT = "1998-06-01"
_Q3_SEGMENT = "BUILDING"
_Q3_TOPK = 10

_Q5_REGION = "ASIA"
_Q5_LO, _Q5_HI = "1996-01-01", "1997-01-01"

_Q10_LO, _Q10_HI = "1996-01-01", "1996-07-01"
_Q10_TOPK = 20


@register(
    "q_tpch_q3",
    oracle=f"""
        WITH agg AS (
            SELECT l.l_orderkey,
                   CAST(SUM({ORACLE_DISC_PRICE}) AS DOUBLE) AS revenue,
                   o.o_orderdate,
                   o.o_orderpriority
            FROM customer c
            JOIN orders o ON c.c_custkey = o.o_custkey
            JOIN lineitem l ON l.l_orderkey = o.o_orderkey
            WHERE c.c_mktsegment = '{_Q3_SEGMENT}'
              AND o.o_orderdate < TIMESTAMP '{_Q3_CUT} 00:00:00'
              AND l.l_shipdate > TIMESTAMP '{_Q3_CUT} 00:00:00'
            GROUP BY l.l_orderkey, o.o_orderdate, o.o_orderpriority
        )
        SELECT l_orderkey, revenue, o_orderdate, o_orderpriority
        FROM (
            SELECT *, row_number() OVER (
                ORDER BY revenue DESC, o_orderdate, l_orderkey) AS rn
            FROM agg
        ) WHERE rn <= {_Q3_TOPK}
    """,
    section="H3",
    doc="TPC-H Q3 (shipping priority): the 10 unshipped-revenue-heaviest "
    f"orders in the '{_Q3_SEGMENT}' market segment — orders placed "
    f"before {_Q3_CUT} with line items still shipping after it — the "
    "canonical 3-way fact/dim join + group + top-k every OLAP engine "
    "demos first. Adapted: o_shippriority doesn't exist in this "
    "schema; o_orderpriority carries the same role in the output. "
    "Revenue is the §5.3 exact-decimal device (DECIMAL(18,2) "
    "products, one cast to DOUBLE); the top-10 is a row_number with "
    "(revenue DESC, o_orderdate, l_orderkey) so the SET is "
    "deterministic under ties. Scale: the segment-filtered customer "
    "slice broadcasts into orders, the date filters push to both "
    "parquet scans, the group keys on l_orderkey (the fact grain), "
    "and the final top-k is TakeOrdered — no global sort.",
)
def q_tpch_q3(spark: SparkSession, sf_dir: str) -> DataFrame:
    cust = load_table(spark, sf_dir, "customer").where(
        F.col("c_mktsegment") == _Q3_SEGMENT
    )
    orders = load_table(spark, sf_dir, "orders").where(
        F.col("o_orderdate") < F.lit(_Q3_CUT).cast("timestamp")
    )
    li = load_table(spark, sf_dir, "lineitem").where(
        F.col("l_shipdate") > F.lit(_Q3_CUT).cast("timestamp")
    )
    agg = (
        li.join(
            orders, li.l_orderkey == orders.o_orderkey
        )
        .join(
            F.broadcast(cust.select("c_custkey")),
            F.col("o_custkey") == F.col("c_custkey"),
        )
        .groupBy("l_orderkey", "o_orderdate", "o_orderpriority")
        .agg(F.sum(disc_price()).cast("double").alias("revenue"))
    )
    w = Window.orderBy(
        F.col("revenue").desc(), "o_orderdate", "l_orderkey"
    )
    return (
        agg.withColumn("rn", F.row_number().over(w))
        .where(F.col("rn") <= _Q3_TOPK)
        .select("l_orderkey", "revenue", "o_orderdate", "o_orderpriority")
    )


@register(
    "q_tpch_q5",
    oracle=f"""
        SELECT n.n_name,
               CAST(SUM({ORACLE_DISC_PRICE}) AS DOUBLE) AS revenue
        FROM customer c
        JOIN orders o ON c.c_custkey = o.o_custkey
        JOIN lineitem l ON l.l_orderkey = o.o_orderkey
        JOIN supplier s ON l.l_suppkey = s.s_suppkey
                       AND c.c_nationkey = s.s_nationkey
        JOIN nation n ON s.s_nationkey = n.n_nationkey
        JOIN region r ON n.n_regionkey = r.r_regionkey
        WHERE r.r_name = '{_Q5_REGION}'
          AND o.o_orderdate >= TIMESTAMP '{_Q5_LO} 00:00:00'
          AND o.o_orderdate <  TIMESTAMP '{_Q5_HI} 00:00:00'
        GROUP BY n.n_name
    """,
    section="H5",
    doc="TPC-H Q5 (local supplier volume): revenue per nation from "
    f"{_Q5_REGION}-region customers buying from SAME-NATION suppliers "
    f"in {_Q5_LO[:4]} — the canonical 6-way snowflake join whose "
    "non-obvious edge is the c_nationkey = s_nationkey equality "
    "BETWEEN two dimensions (locality), the join optimizers "
    "historically got wrong. Revenue via the §5.3 exact-decimal "
    "device. Scale: nation⋈region collapses to a broadcast filter, "
    "supplier broadcasts, the fact chain shuffles on o_orderkey/"
    "o_custkey with the date filter pushed to the orders scan; the "
    "locality predicate evaluates as a post-join filter on two "
    "broadcast-carried ints — no extra shuffle.",
)
def q_tpch_q5(spark: SparkSession, sf_dir: str) -> DataFrame:
    cust = load_table(spark, sf_dir, "customer")
    orders = load_table(spark, sf_dir, "orders").where(
        (F.col("o_orderdate") >= F.lit(_Q5_LO).cast("timestamp"))
        & (F.col("o_orderdate") < F.lit(_Q5_HI).cast("timestamp"))
    )
    li = load_table(spark, sf_dir, "lineitem")
    supp = load_table(spark, sf_dir, "supplier")
    nation = load_table(spark, sf_dir, "nation")
    region = load_table(spark, sf_dir, "region").where(
        F.col("r_name") == _Q5_REGION
    )
    nat = nation.join(
        F.broadcast(region),
        nation.n_regionkey == region.r_regionkey,
    ).select("n_nationkey", "n_name")
    return (
        li.join(orders, li.l_orderkey == orders.o_orderkey)
        .join(cust, F.col("o_custkey") == cust.c_custkey)
        .join(
            F.broadcast(supp),
            (li.l_suppkey == supp.s_suppkey)
            & (cust.c_nationkey == supp.s_nationkey),
        )
        .join(
            F.broadcast(nat),
            supp.s_nationkey == F.col("n_nationkey"),
        )
        .groupBy("n_name")
        .agg(F.sum(disc_price()).cast("double").alias("revenue"))
    )


@register(
    "q_tpch_q10",
    oracle=f"""
        WITH agg AS (
            SELECT c.c_custkey, c.c_name,
                   CAST(SUM({ORACLE_DISC_PRICE}) AS DOUBLE) AS revenue,
                   c.c_acctbal, n.n_name
            FROM customer c
            JOIN orders o ON c.c_custkey = o.o_custkey
            JOIN lineitem l ON l.l_orderkey = o.o_orderkey
            JOIN nation n ON c.c_nationkey = n.n_nationkey
            WHERE o.o_orderdate >= TIMESTAMP '{_Q10_LO} 00:00:00'
              AND o.o_orderdate <  TIMESTAMP '{_Q10_HI} 00:00:00'
              AND l.l_returnflag = 'R'
            GROUP BY c.c_custkey, c.c_name, c.c_acctbal, n.n_name
        )
        SELECT c_custkey, c_name, revenue, c_acctbal, n_name
        FROM (
            SELECT *, row_number() OVER (
                ORDER BY revenue DESC, c_custkey) AS rn
            FROM agg
        ) WHERE rn <= {_Q10_TOPK}
    """,
    section="H10",
    doc="TPC-H Q10 (returned item reporting): the 20 customers who "
    f"returned the most revenue in the {_Q10_LO}..{_Q10_HI} half-"
    "year — the canonical churn-risk report joining the return-"
    "flagged fact slice back through orders to the customer dim. "
    "Adapted: c_address/c_phone/c_comment don't exist in this "
    "schema; the output keeps the analytic columns (custkey, name, "
    "acctbal, nation, revenue). Revenue via the §5.3 exact-decimal "
    "device; top-20 via row_number with a c_custkey tie-break. "
    "Scale: the returnflag + date filters push to the fact scans, "
    "nation broadcasts, the group keys on c_custkey, and the top-k "
    "is TakeOrdered over the grouped (customer-cardinality) relation.",
)
def q_tpch_q10(spark: SparkSession, sf_dir: str) -> DataFrame:
    cust = load_table(spark, sf_dir, "customer")
    orders = load_table(spark, sf_dir, "orders").where(
        (F.col("o_orderdate") >= F.lit(_Q10_LO).cast("timestamp"))
        & (F.col("o_orderdate") < F.lit(_Q10_HI).cast("timestamp"))
    )
    li = load_table(spark, sf_dir, "lineitem").where(
        F.col("l_returnflag") == "R"
    )
    nation = load_table(spark, sf_dir, "nation")
    agg = (
        li.join(orders, li.l_orderkey == orders.o_orderkey)
        .join(cust, F.col("o_custkey") == cust.c_custkey)
        .join(
            F.broadcast(nation),
            cust.c_nationkey == nation.n_nationkey,
        )
        .groupBy("c_custkey", "c_name", "c_acctbal", "n_name")
        .agg(F.sum(disc_price()).cast("double").alias("revenue"))
    )
    w = Window.orderBy(F.col("revenue").desc(), "c_custkey")
    return (
        agg.withColumn("rn", F.row_number().over(w))
        .where(F.col("rn") <= _Q10_TOPK)
        .select("c_custkey", "c_name", "revenue", "c_acctbal", "n_name")
    )


_Q4_LO, _Q4_HI = "1996-01-01", "1996-07-01"
_Q4_LATE_DAYS = 60

_Q13_EXCLUDE = "5-LOW"

_Q14_LO, _Q14_HI = "1996-09-01", "1996-10-01"

_Q17_BRAND = "Brand#12"
_Q17_FRACTION = 0.5

_Q18_QTY = 200
_Q18_TOPK = 100


@register(
    "q_tpch_q4",
    oracle=f"""
        SELECT o.o_orderpriority,
               CAST(COUNT(*) AS BIGINT) AS order_count
        FROM orders o
        WHERE o.o_orderdate >= TIMESTAMP '{_Q4_LO} 00:00:00'
          AND o.o_orderdate <  TIMESTAMP '{_Q4_HI} 00:00:00'
          AND EXISTS (
              SELECT 1 FROM lineitem l
              WHERE l.l_orderkey = o.o_orderkey
                AND l.l_shipdate > o.o_orderdate
                                   + INTERVAL {_Q4_LATE_DAYS} DAY
          )
        GROUP BY o.o_orderpriority
    """,
    section="H4",
    doc="TPC-H Q4 (order priority checking): orders in a half-year "
    "window with at least one SLOW line item, counted per priority — "
    "the canonical correlated-EXISTS-turned-semi-join. Adapted: this "
    "schema has no l_commitdate/l_receiptdate, so 'late' is "
    f"l_shipdate > o_orderdate + {_Q4_LATE_DAYS} days (fulfillment "
    "lag), preserving the correlated-predicate-on-both-tables shape "
    "that makes Q4 interesting (the EXISTS references the OUTER "
    "row's date, so the semi-join carries a non-equi conjunct). "
    "Exact BIGINT counts; date arithmetic is calendar-exact in both "
    "engines. Scale: Catalyst rewrites EXISTS to a left-semi join "
    "keyed on l_orderkey with the lag predicate evaluated post-"
    "probe; the date filter pushes to the orders scan; counts are "
    "map-combinable over 5 groups.",
)
def q_tpch_q4(spark: SparkSession, sf_dir: str) -> DataFrame:
    orders = load_table(spark, sf_dir, "orders").where(
        (F.col("o_orderdate") >= F.lit(_Q4_LO).cast("timestamp"))
        & (F.col("o_orderdate") < F.lit(_Q4_HI).cast("timestamp"))
    )
    li = load_table(spark, sf_dir, "lineitem").select(
        "l_orderkey", "l_shipdate"
    )
    late = orders.join(
        li,
        (orders.o_orderkey == li.l_orderkey)
        & (
            li.l_shipdate
            > orders.o_orderdate + F.expr(f"INTERVAL {_Q4_LATE_DAYS} DAY")
        ),
        "left_semi",
    )
    return late.groupBy("o_orderpriority").agg(
        F.count(F.lit(1)).cast("bigint").alias("order_count")
    )


@register(
    "q_tpch_q13",
    oracle=f"""
        WITH per_cust AS (
            SELECT c.c_custkey,
                   CAST(COUNT(o.o_orderkey) AS BIGINT) AS c_count
            FROM customer c
            LEFT JOIN orders o
              ON c.c_custkey = o.o_custkey
             AND o.o_orderpriority <> '{_Q13_EXCLUDE}'
            GROUP BY c.c_custkey
        )
        SELECT c_count,
               CAST(COUNT(*) AS BIGINT) AS custdist
        FROM per_cust
        GROUP BY c_count
    """,
    section="H13",
    doc="TPC-H Q13 (customer distribution): the histogram of customers "
    "by order count INCLUDING zero-order customers — the canonical "
    "left-outer-join-with-join-condition-filter (the exclusion "
    "predicate must live in the ON clause, not WHERE, or the "
    "zero-order bucket silently vanishes — the classic outer-join "
    "bug this query exists to catch). Adapted: the schema has no "
    f"o_comment, so the exclusion is o_orderpriority <> "
    f"'{_Q13_EXCLUDE}'. Exact BIGINT counts throughout. Scale: "
    "one customer-keyed outer join (orders shuffle on o_custkey), "
    "then a tiny count-of-counts agg; both map-combinable.",
)
def q_tpch_q13(spark: SparkSession, sf_dir: str) -> DataFrame:
    cust = load_table(spark, sf_dir, "customer").select("c_custkey")
    orders = load_table(spark, sf_dir, "orders").select(
        "o_custkey", "o_orderkey", "o_orderpriority"
    )
    per_cust = (
        cust.join(
            orders,
            (cust.c_custkey == orders.o_custkey)
            & (orders.o_orderpriority != _Q13_EXCLUDE),
            "left",
        )
        .groupBy("c_custkey")
        .agg(F.count("o_orderkey").cast("bigint").alias("c_count"))
    )
    return per_cust.groupBy("c_count").agg(
        F.count(F.lit(1)).cast("bigint").alias("custdist")
    )


@register(
    "q_tpch_q14",
    oracle=f"""
        SELECT CAST(100.0 * SUM(CASE WHEN p.p_type = 'PROMO'
                   THEN {ORACLE_DISC_PRICE}
                   ELSE CAST(0 AS DECIMAL(18,2)) END) AS DOUBLE)
               / CAST(SUM({ORACLE_DISC_PRICE}) AS DOUBLE)
                   AS promo_revenue_pct,
               CAST(COUNT(*) AS BIGINT) AS n_lines
        FROM lineitem l
        JOIN part p ON l.l_partkey = p.p_partkey
        WHERE l.l_shipdate >= TIMESTAMP '{_Q14_LO} 00:00:00'
          AND l.l_shipdate <  TIMESTAMP '{_Q14_HI} 00:00:00'
    """,
    section="H14",
    doc="TPC-H Q14 (promotion effect): the percentage of one month's "
    "revenue attributable to PROMO-type parts — the canonical "
    "conditional-aggregate-over-join. Adapted: p_type here is a "
    "single word ('PROMO'), so the match is equality, not LIKE "
    "'PROMO%%'. Both numerator and denominator are §5.3 exact-"
    "decimal sums; the ratio is ONE double division (the 100.0 "
    "scale lives inside the exact decimal world as a DECIMAL "
    "multiply). Scale: the month filter pushes to the lineitem "
    "scan, part broadcasts, the two sums fold in one pass.",
)
def q_tpch_q14(spark: SparkSession, sf_dir: str) -> DataFrame:
    from ai_to_cvent_etl_spark.queries._util import dec2

    li = load_table(spark, sf_dir, "lineitem").where(
        (F.col("l_shipdate") >= F.lit(_Q14_LO).cast("timestamp"))
        & (F.col("l_shipdate") < F.lit(_Q14_HI).cast("timestamp"))
    )
    part = load_table(spark, sf_dir, "part").select(
        "p_partkey", "p_type"
    )
    return (
        li.join(F.broadcast(part), li.l_partkey == part.p_partkey)
        .agg(
            (
                (
                    F.lit(100.0).cast("decimal(18,2)")
                    * F.sum(
                        F.when(
                            F.col("p_type") == "PROMO", disc_price()
                        ).otherwise(F.lit(0).cast("decimal(18,2)"))
                    )
                ).cast("double")
                / F.sum(disc_price()).cast("double")
            ).alias("promo_revenue_pct"),
            F.count(F.lit(1)).cast("bigint").alias("n_lines"),
        )
    )


@register(
    "q_tpch_q17",
    oracle=f"""
        WITH pa AS (
            SELECT l_partkey,
                   CAST(SUM(CAST(l_quantity AS DECIMAL(18,2)))
                        AS DOUBLE) / COUNT(*) AS avg_qty
            FROM lineitem GROUP BY l_partkey
        )
        SELECT CAST(SUM(CAST(l.l_extendedprice AS DECIMAL(18,2)))
                    AS DOUBLE) / 7.0 AS avg_yearly,
               CAST(COUNT(*) AS BIGINT) AS n_small_lines
        FROM lineitem l
        JOIN part p ON l.l_partkey = p.p_partkey
        JOIN pa ON pa.l_partkey = l.l_partkey
        WHERE p.p_brand = '{_Q17_BRAND}'
          AND l.l_quantity < {_Q17_FRACTION} * pa.avg_qty
    """,
    section="H17",
    doc="TPC-H Q17 (small-quantity-order revenue): the yearly revenue "
    f"that would be lost by refusing {_Q17_BRAND} orders below "
    f"{_Q17_FRACTION}x the part's average quantity — the canonical "
    "correlated-scalar-subquery-decorrelated-to-a-join (the per-part "
    "average must be computed once per part, not once per row). "
    f"Adapted: no p_container, so the slice is brand-only, and the "
    f"fraction is {_Q17_FRACTION} (this data's quantity is uniform, "
    "not TPC-H-skewed; 0.2 would thin to noise at sf0.001). "
    "avg_qty is an exact-decimal sum over count (§5.3 money-avg "
    "device) and the comparison is one IEEE multiply — identical "
    "both engines. Scale: the per-part average is a map-combinable "
    "agg keyed on l_partkey; the brand filter broadcasts through "
    "part; the probe joins on the same key, so AQE co-locates both "
    "shuffles.",
)
def q_tpch_q17(spark: SparkSession, sf_dir: str) -> DataFrame:
    from ai_to_cvent_etl_spark.queries._util import dec2

    li = load_table(spark, sf_dir, "lineitem")
    part = load_table(spark, sf_dir, "part").where(
        F.col("p_brand") == _Q17_BRAND
    )
    pa = li.groupBy(F.col("l_partkey").alias("pk")).agg(
        (
            F.sum(dec2(F.col("l_quantity"))).cast("double")
            / F.count(F.lit(1))
        ).alias("avg_qty")
    )
    return (
        li.join(
            F.broadcast(part.select("p_partkey")),
            li.l_partkey == F.col("p_partkey"),
        )
        .join(pa, li.l_partkey == pa.pk)
        .where(F.col("l_quantity") < _Q17_FRACTION * F.col("avg_qty"))
        .agg(
            (
                F.sum(dec2(F.col("l_extendedprice"))).cast("double") / 7.0
            ).alias("avg_yearly"),
            F.count(F.lit(1)).cast("bigint").alias("n_small_lines"),
        )
    )


@register(
    "q_tpch_q18",
    oracle=f"""
        WITH big AS (
            SELECT l_orderkey,
                   CAST(SUM(CAST(l_quantity AS DECIMAL(18,2)))
                        AS DOUBLE) AS total_qty
            FROM lineitem GROUP BY l_orderkey
            HAVING SUM(CAST(l_quantity AS DECIMAL(18,2))) > {_Q18_QTY}
        )
        SELECT c_name, c_custkey, o_orderkey, o_orderdate,
               o_totalprice, total_qty
        FROM (
            SELECT c.c_name, c.c_custkey, o.o_orderkey, o.o_orderdate,
                   o.o_totalprice, big.total_qty,
                   row_number() OVER (
                       ORDER BY o.o_totalprice DESC, o.o_orderkey) AS rn
            FROM big
            JOIN orders o ON o.o_orderkey = big.l_orderkey
            JOIN customer c ON c.c_custkey = o.o_custkey
        ) WHERE rn <= {_Q18_TOPK}
    """,
    section="H18",
    doc="TPC-H Q18 (large-volume customer): the top-100 orders by "
    f"total price among orders with more than {_Q18_QTY} total "
    "units — the canonical HAVING-on-grouped-fact feeding a "
    "dimension join (the group-THEN-join ordering is the point: "
    "grouping first shrinks the fact to order grain before any "
    "dimension touches it). Quantity totals are exact DECIMAL "
    "sums; the top-k is a row_number with an o_orderkey tie-break "
    "(o_totalprice is 2dp-exact, ties possible). Scale: the "
    "HAVING agg is map-combinable on l_orderkey; the survivor set "
    "is tiny and broadcasts into orders; TakeOrdered caps the "
    "result — no global sort.",
)
def q_tpch_q18(spark: SparkSession, sf_dir: str) -> DataFrame:
    from ai_to_cvent_etl_spark.queries._util import dec2

    li = load_table(spark, sf_dir, "lineitem")
    orders = load_table(spark, sf_dir, "orders")
    cust = load_table(spark, sf_dir, "customer")
    big = (
        li.groupBy("l_orderkey")
        .agg(F.sum(dec2(F.col("l_quantity"))).alias("tq"))
        .where(F.col("tq") > _Q18_QTY)
        .select("l_orderkey", F.col("tq").cast("double").alias("total_qty"))
    )
    joined = (
        F.broadcast(big)
        .join(orders, F.col("l_orderkey") == orders.o_orderkey)
        .join(cust, orders.o_custkey == cust.c_custkey)
    )
    w = Window.orderBy(F.col("o_totalprice").desc(), "o_orderkey")
    return (
        joined.withColumn("rn", F.row_number().over(w))
        .where(F.col("rn") <= _Q18_TOPK)
        .select(
            "c_name",
            "c_custkey",
            "o_orderkey",
            "o_orderdate",
            "o_totalprice",
            "total_qty",
        )
    )


# ---------------------------------------------------------------------------
# Wave 112 (r5): TPC-H suite III — Q6, Q7, Q8, Q9, Q12, Q15.
# ---------------------------------------------------------------------------

_Q6_LO, _Q6_HI = "1996-01-01", "1997-01-01"
_Q6_DISC_LO, _Q6_DISC_HI = 0.05, 0.07
_Q6_QTY = 24

_Q7_NATION_A, _Q7_NATION_B = "NATION_13", "NATION_19"
_Q7_LO, _Q7_HI = "1996-01-01", "1998-01-01"

_Q8_REGION = "ASIA"
_Q8_NATION = "NATION_12"
_Q8_TYPE = "PROMO"
_Q8_LO, _Q8_HI = "1996-01-01", "1998-01-01"

_Q9_COLOR = "red"
_Q9_COST_FRAC = "0.60"  # supplycost stand-in: 60% of retail price

_Q12_LATE_DAYS = 90
_Q12_LO, _Q12_HI = "1996-01-01", "1997-01-01"

_Q15_LO, _Q15_HI = "1996-01-01", "1996-04-01"


@register(
    "q_tpch_q6",
    oracle=f"""
        SELECT CAST(SUM(CAST(l_extendedprice AS DECIMAL(18,2))
                        * CAST(l_discount AS DECIMAL(18,2))) AS DOUBLE)
                   AS revenue
        FROM lineitem
        WHERE l_shipdate >= TIMESTAMP '{_Q6_LO} 00:00:00'
          AND l_shipdate <  TIMESTAMP '{_Q6_HI} 00:00:00'
          AND l_discount BETWEEN {_Q6_DISC_LO} AND {_Q6_DISC_HI}
          AND l_quantity < {_Q6_QTY}
    """,
    section="H6",
    doc="TPC-H Q6 (forecasting revenue change): single-table filter + "
    "scalar aggregate — what would revenue have been without these "
    "small discounts on small orders? The BETWEEN on l_discount "
    "compares the same stored doubles to the same literals in both "
    "engines (the generator writes 2dp values), and the product "
    "SUM(price*discount) is exact DECIMAL, one cast to DOUBLE at the "
    "end. Scale: the canonical predicate-pushdown showcase — all "
    "three conjuncts reach the parquet scan as PushedFilters, no "
    "shuffle at all (partial aggregates merge to one row).",
)
def q_tpch_q6(spark: SparkSession, sf_dir: str) -> DataFrame:
    from ai_to_cvent_etl_spark.queries._util import dec2

    li = load_table(spark, sf_dir, "lineitem").where(
        (F.col("l_shipdate") >= F.lit(_Q6_LO).cast("timestamp"))
        & (F.col("l_shipdate") < F.lit(_Q6_HI).cast("timestamp"))
        & (F.col("l_discount") >= _Q6_DISC_LO)
        & (F.col("l_discount") <= _Q6_DISC_HI)
        & (F.col("l_quantity") < _Q6_QTY)
    )
    return li.agg(
        F.sum(dec2(F.col("l_extendedprice")) * dec2(F.col("l_discount")))
        .cast("double")
        .alias("revenue")
    )


@register(
    "q_tpch_q7",
    oracle=f"""
        SELECT sn.n_name AS supp_nation,
               cn.n_name AS cust_nation,
               CAST(year(l.l_shipdate) AS INTEGER) AS l_year,
               CAST(SUM({ORACLE_DISC_PRICE}) AS DOUBLE) AS revenue
        FROM lineitem l
        JOIN supplier s ON l.l_suppkey = s.s_suppkey
        JOIN nation sn ON s.s_nationkey = sn.n_nationkey
        JOIN orders o ON l.l_orderkey = o.o_orderkey
        JOIN customer c ON o.o_custkey = c.c_custkey
        JOIN nation cn ON c.c_nationkey = cn.n_nationkey
        WHERE ((sn.n_name = '{_Q7_NATION_A}' AND cn.n_name = '{_Q7_NATION_B}')
            OR (sn.n_name = '{_Q7_NATION_B}' AND cn.n_name = '{_Q7_NATION_A}'))
          AND l.l_shipdate >= TIMESTAMP '{_Q7_LO} 00:00:00'
          AND l.l_shipdate <  TIMESTAMP '{_Q7_HI} 00:00:00'
        GROUP BY sn.n_name, cn.n_name, year(l.l_shipdate)
    """,
    section="H7",
    doc="TPC-H Q7 (volume shipping): bilateral trade volume between two "
    "nations by direction and year — the fact row's supplier side and "
    "its order's customer side each resolve through their own nation "
    "dim, and the disjunctive pair predicate couples the two "
    "dimension branches. Revenue is the exact-decimal money device. "
    "Scale: both nation-filtered dim slices (suppliers and customers "
    "of the two nations) broadcast, so the fact scan is pre-pruned by "
    "two broadcast semi-ish joins before the orders shuffle join; "
    "the pair disjunction evaluates post-probe on broadcast rows; "
    "year() never blocks the shipdate range pushdown.",
)
def q_tpch_q7(spark: SparkSession, sf_dir: str) -> DataFrame:
    nation = load_table(spark, sf_dir, "nation").where(
        F.col("n_name").isin(_Q7_NATION_A, _Q7_NATION_B)
    )
    supp = (
        load_table(spark, sf_dir, "supplier")
        .join(
            F.broadcast(nation),
            F.col("s_nationkey") == F.col("n_nationkey"),
        )
        .select("s_suppkey", F.col("n_name").alias("supp_nation"))
    )
    cust = (
        load_table(spark, sf_dir, "customer")
        .join(
            F.broadcast(nation),
            F.col("c_nationkey") == F.col("n_nationkey"),
        )
        .select("c_custkey", F.col("n_name").alias("cust_nation"))
    )
    li = load_table(spark, sf_dir, "lineitem").where(
        (F.col("l_shipdate") >= F.lit(_Q7_LO).cast("timestamp"))
        & (F.col("l_shipdate") < F.lit(_Q7_HI).cast("timestamp"))
    )
    orders = load_table(spark, sf_dir, "orders").select(
        "o_orderkey", "o_custkey"
    )
    return (
        li.join(F.broadcast(supp), F.col("l_suppkey") == F.col("s_suppkey"))
        .join(orders, F.col("l_orderkey") == F.col("o_orderkey"))
        .join(F.broadcast(cust), F.col("o_custkey") == F.col("c_custkey"))
        .where(
            (
                (F.col("supp_nation") == _Q7_NATION_A)
                & (F.col("cust_nation") == _Q7_NATION_B)
            )
            | (
                (F.col("supp_nation") == _Q7_NATION_B)
                & (F.col("cust_nation") == _Q7_NATION_A)
            )
        )
        .groupBy(
            "supp_nation",
            "cust_nation",
            F.year("l_shipdate").cast("int").alias("l_year"),
        )
        .agg(F.sum(disc_price()).cast("double").alias("revenue"))
    )


@register(
    "q_tpch_q8",
    oracle=f"""
        WITH all_nations AS (
            SELECT CAST(year(o.o_orderdate) AS INTEGER) AS o_year,
                   {ORACLE_DISC_PRICE} AS volume,
                   sn.n_name AS supp_nation
            FROM lineitem l
            JOIN part p ON l.l_partkey = p.p_partkey
            JOIN supplier s ON l.l_suppkey = s.s_suppkey
            JOIN nation sn ON s.s_nationkey = sn.n_nationkey
            JOIN orders o ON l.l_orderkey = o.o_orderkey
            JOIN customer c ON o.o_custkey = c.c_custkey
            JOIN nation cn ON c.c_nationkey = cn.n_nationkey
            JOIN region r ON cn.n_regionkey = r.r_regionkey
            WHERE r.r_name = '{_Q8_REGION}'
              AND p.p_type = '{_Q8_TYPE}'
              AND o.o_orderdate >= TIMESTAMP '{_Q8_LO} 00:00:00'
              AND o.o_orderdate <  TIMESTAMP '{_Q8_HI} 00:00:00'
        )
        SELECT o_year,
               CAST(SUM(CASE WHEN supp_nation = '{_Q8_NATION}'
                             THEN volume ELSE CAST(0 AS DECIMAL(18,2)) END)
                    AS DOUBLE)
               / CAST(SUM(volume) AS DOUBLE) AS mkt_share
        FROM all_nations
        GROUP BY o_year
    """,
    section="H8",
    doc=f"TPC-H Q8 (national market share): {_Q8_NATION}'s share of "
    f"{_Q8_TYPE}-part revenue sold into the {_Q8_REGION} region per "
    "order year — a 7-way snowflake where the nation dim is joined "
    "TWICE under different roles (supplier side feeds the CASE "
    "numerator, customer side routes through region for the filter). "
    "Both the conditional and unconditional volume sums stay exact "
    "DECIMAL; one IEEE double division per year at the end, identical "
    "in both engines. Scale: part/supplier/nation/region and the "
    "region-filtered customer slice all broadcast; the only shuffle "
    "is the lineitem-orders key join plus one 2-row aggregate; the "
    "orderdate filter pushes to the orders scan and prunes the fact "
    "via the join.",
)
def q_tpch_q8(spark: SparkSession, sf_dir: str) -> DataFrame:
    from ai_to_cvent_etl_spark.queries._util import dec2

    nation = load_table(spark, sf_dir, "nation")
    region = load_table(spark, sf_dir, "region").where(
        F.col("r_name") == _Q8_REGION
    )
    cust_nat = (
        nation.join(
            F.broadcast(region),
            F.col("n_regionkey") == F.col("r_regionkey"),
        ).select(F.col("n_nationkey").alias("cn_key"))
    )
    cust = (
        load_table(spark, sf_dir, "customer")
        .join(F.broadcast(cust_nat), F.col("c_nationkey") == F.col("cn_key"))
        .select("c_custkey")
    )
    supp = (
        load_table(spark, sf_dir, "supplier")
        .join(
            F.broadcast(nation),
            F.col("s_nationkey") == F.col("n_nationkey"),
        )
        .select("s_suppkey", F.col("n_name").alias("supp_nation"))
    )
    part = load_table(spark, sf_dir, "part").where(
        F.col("p_type") == _Q8_TYPE
    )
    orders = load_table(spark, sf_dir, "orders").where(
        (F.col("o_orderdate") >= F.lit(_Q8_LO).cast("timestamp"))
        & (F.col("o_orderdate") < F.lit(_Q8_HI).cast("timestamp"))
    )
    li = load_table(spark, sf_dir, "lineitem")
    vol = (
        li.join(
            F.broadcast(part.select("p_partkey")),
            F.col("l_partkey") == F.col("p_partkey"),
        )
        .join(F.broadcast(supp), F.col("l_suppkey") == F.col("s_suppkey"))
        .join(orders, F.col("l_orderkey") == F.col("o_orderkey"))
        .join(F.broadcast(cust), F.col("o_custkey") == F.col("c_custkey"))
        .select(
            F.year("o_orderdate").cast("int").alias("o_year"),
            disc_price().alias("volume"),
            "supp_nation",
        )
    )
    zero = dec2(F.lit(0))
    return vol.groupBy("o_year").agg(
        (
            F.sum(
                F.when(F.col("supp_nation") == _Q8_NATION, F.col("volume"))
                .otherwise(zero)
            ).cast("double")
            / F.sum("volume").cast("double")
        ).alias("mkt_share")
    )


@register(
    "q_tpch_q9",
    oracle=f"""
        SELECT sn.n_name AS nation,
               CAST(year(o.o_orderdate) AS INTEGER) AS o_year,
               CAST(SUM({ORACLE_DISC_PRICE}
                        - CAST({_Q9_COST_FRAC} AS DECIMAL(18,2))
                          * CAST(p.p_retailprice AS DECIMAL(18,2))
                          * CAST(l.l_quantity AS DECIMAL(18,2)))
                    AS DOUBLE) AS sum_profit
        FROM lineitem l
        JOIN part p ON l.l_partkey = p.p_partkey
        JOIN supplier s ON l.l_suppkey = s.s_suppkey
        JOIN nation sn ON s.s_nationkey = sn.n_nationkey
        JOIN orders o ON l.l_orderkey = o.o_orderkey
        WHERE p.p_name LIKE '%{_Q9_COLOR}%'
        GROUP BY sn.n_name, year(o.o_orderdate)
    """,
    section="H9",
    doc="TPC-H Q9 (product type profit): profit on color-named parts "
    "per supplier nation per order year. Adapted: this schema has no "
    f"partsupp, so supply cost is {_Q9_COST_FRAC} * p_retailprice — "
    "the profit expression keeps Q9's shape (revenue minus a "
    "cost-per-unit times quantity, mixing columns from three tables "
    "in one aggregate term) with every product exact DECIMAL and one "
    "final cast. Scale: the LIKE-filtered part slice and "
    "supplier+nation broadcast; lineitem-orders is the one big "
    "shuffle join (both sides keyed on orderkey); the 25x7 group is "
    "map-combinable so the exchange after the join carries only "
    "partial decimal sums.",
)
def q_tpch_q9(spark: SparkSession, sf_dir: str) -> DataFrame:
    from ai_to_cvent_etl_spark.queries._util import dec2

    part = (
        load_table(spark, sf_dir, "part")
        .where(F.col("p_name").like(f"%{_Q9_COLOR}%"))
        .select("p_partkey", "p_retailprice")
    )
    supp = (
        load_table(spark, sf_dir, "supplier")
        .join(
            F.broadcast(load_table(spark, sf_dir, "nation")),
            F.col("s_nationkey") == F.col("n_nationkey"),
        )
        .select("s_suppkey", F.col("n_name").alias("nation"))
    )
    orders = load_table(spark, sf_dir, "orders").select(
        "o_orderkey", "o_orderdate"
    )
    li = load_table(spark, sf_dir, "lineitem")
    cost = (
        F.lit(_Q9_COST_FRAC).cast("decimal(18,2)")
        * dec2(F.col("p_retailprice"))
        * dec2(F.col("l_quantity"))
    )
    return (
        li.join(
            F.broadcast(part), F.col("l_partkey") == F.col("p_partkey")
        )
        .join(F.broadcast(supp), F.col("l_suppkey") == F.col("s_suppkey"))
        .join(orders, F.col("l_orderkey") == F.col("o_orderkey"))
        .groupBy(
            "nation", F.year("o_orderdate").cast("int").alias("o_year")
        )
        .agg(
            F.sum(disc_price() - cost).cast("double").alias("sum_profit")
        )
    )


@register(
    "q_tpch_q12",
    oracle=f"""
        SELECT l.l_returnflag AS ship_class,
               CAST(SUM(CASE WHEN o.o_orderpriority IN
                                  ('1-URGENT', '2-HIGH')
                             THEN 1 ELSE 0 END) AS BIGINT)
                   AS high_line_count,
               CAST(SUM(CASE WHEN o.o_orderpriority NOT IN
                                  ('1-URGENT', '2-HIGH')
                             THEN 1 ELSE 0 END) AS BIGINT)
                   AS low_line_count
        FROM orders o
        JOIN lineitem l ON l.l_orderkey = o.o_orderkey
        WHERE l.l_shipdate > o.o_orderdate
                             + INTERVAL {_Q12_LATE_DAYS} DAY
          AND l.l_shipdate >= TIMESTAMP '{_Q12_LO} 00:00:00'
          AND l.l_shipdate <  TIMESTAMP '{_Q12_HI} 00:00:00'
        GROUP BY l.l_returnflag
    """,
    section="H12",
    doc="TPC-H Q12 (shipping modes and order priority): among LATE line "
    "items in a year window, how many belong to priority orders vs "
    "not, per shipping class — the canonical pivot-by-CASE over a "
    "fact/fact join with an inter-table inequality. Adapted: no "
    f"l_shipmode/l_commitdate/l_receiptdate here, so the class is "
    "l_returnflag and 'late' is l_shipdate > o_orderdate + "
    f"{_Q12_LATE_DAYS} days. Both counts are exact BIGINT. Scale: the "
    "shipdate window pushes to the lineitem scan; the orderkey join "
    "shuffles both sides once; the lateness inequality evaluates "
    "post-probe; the CASE-pivot aggregate is map-combinable over 3 "
    "groups so the final exchange carries six longs.",
)
def q_tpch_q12(spark: SparkSession, sf_dir: str) -> DataFrame:
    li = load_table(spark, sf_dir, "lineitem").where(
        (F.col("l_shipdate") >= F.lit(_Q12_LO).cast("timestamp"))
        & (F.col("l_shipdate") < F.lit(_Q12_HI).cast("timestamp"))
    )
    orders = load_table(spark, sf_dir, "orders").select(
        "o_orderkey", "o_orderdate", "o_orderpriority"
    )
    hi = F.col("o_orderpriority").isin("1-URGENT", "2-HIGH")
    return (
        li.join(
            orders,
            (F.col("l_orderkey") == F.col("o_orderkey"))
            & (
                F.col("l_shipdate")
                > F.col("o_orderdate")
                + F.expr(f"INTERVAL {_Q12_LATE_DAYS} DAY")
            ),
        )
        .groupBy(F.col("l_returnflag").alias("ship_class"))
        .agg(
            F.sum(F.when(hi, 1).otherwise(0))
            .cast("bigint")
            .alias("high_line_count"),
            F.sum(F.when(~hi, 1).otherwise(0))
            .cast("bigint")
            .alias("low_line_count"),
        )
    )


@register(
    "q_tpch_q15",
    oracle=f"""
        WITH revenue0 AS (
            SELECT l_suppkey AS supplier_no,
                   SUM({ORACLE_DISC_PRICE}) AS total_revenue
            FROM lineitem
            WHERE l_shipdate >= TIMESTAMP '{_Q15_LO} 00:00:00'
              AND l_shipdate <  TIMESTAMP '{_Q15_HI} 00:00:00'
            GROUP BY l_suppkey
        )
        SELECT s.s_suppkey, s.s_name,
               CAST(r.total_revenue AS DOUBLE) AS total_revenue
        FROM supplier s
        JOIN revenue0 r ON s.s_suppkey = r.supplier_no
        WHERE r.total_revenue = (SELECT MAX(total_revenue) FROM revenue0)
    """,
    section="H15",
    doc="TPC-H Q15 (top supplier): the supplier(s) whose quarter revenue "
    "equals the maximum over all suppliers — the classic "
    "view-plus-scalar-subquery shape whose equality predicate is only "
    "deterministic because revenue stays exact DECIMAL until after "
    "the comparison (an IEEE-double max-equality would be "
    "summation-order-dependent; TPC-H itself notes the tie case). "
    "Returns every tied supplier, so no tie-break is needed for set "
    "determinism. Scale: the quarter filter pushes to the scan; one "
    "map-combinable groupBy on l_suppkey; the 1-row MAX broadcasts "
    "back as a scalar-subquery filter; the supplier dim joins "
    "broadcast. Nothing shuffles twice.",
)
def q_tpch_q15(spark: SparkSession, sf_dir: str) -> DataFrame:
    li = load_table(spark, sf_dir, "lineitem").where(
        (F.col("l_shipdate") >= F.lit(_Q15_LO).cast("timestamp"))
        & (F.col("l_shipdate") < F.lit(_Q15_HI).cast("timestamp"))
    )
    rev = li.groupBy(F.col("l_suppkey").alias("supplier_no")).agg(
        F.sum(disc_price()).alias("total_revenue")
    )
    mx = rev.agg(F.max("total_revenue").alias("mx"))
    top = rev.join(
        F.broadcast(mx), F.col("total_revenue") == F.col("mx")
    ).select("supplier_no", "total_revenue")
    supp = load_table(spark, sf_dir, "supplier").select(
        "s_suppkey", "s_name"
    )
    return (
        supp.join(
            F.broadcast(top), F.col("s_suppkey") == F.col("supplier_no")
        )
        .select(
            "s_suppkey",
            "s_name",
            F.col("total_revenue").cast("double").alias("total_revenue"),
        )
    )


# ---------------------------------------------------------------------------
# Wave 113 (r5): TPC-H suite IV — Q2, Q16, Q19, Q21, Q22 (adapted; no
# partsupp / phone / commitdate in this schema).
# ---------------------------------------------------------------------------

_Q2_REGION = "EUROPE"
_Q2_TYPE = "LARGE"
_Q2_SIZE_LO, _Q2_SIZE_HI = 10, 20

_Q16_BRAND_NOT = "Brand#4"
_Q16_TYPE_NOT = "PROMO"
_Q16_SIZES = (1, 5, 15, 25, 35, 45, 49, 50)

_Q19_BUNDLES = (
    ("Brand#1", 1, 11, 1, 15),
    ("Brand#2", 10, 20, 1, 25),
    ("Brand#3", 20, 30, 1, 35),
)

_Q21_LATE_DAYS = 90
_Q21_TOPK = 10

_Q22_CODES = (2, 7, 12, 17, 22)
_Q22_CUTOFF = "2000-07-01"


@register(
    "q_tpch_q2",
    oracle=f"""
        WITH offers AS (
            SELECT l.l_partkey AS partkey, l.l_suppkey AS suppkey,
                   MIN(l.l_extendedprice) AS offer_price
            FROM lineitem l
            JOIN part p ON l.l_partkey = p.p_partkey
            JOIN supplier s ON l.l_suppkey = s.s_suppkey
            JOIN nation n ON s.s_nationkey = n.n_nationkey
            JOIN region r ON n.n_regionkey = r.r_regionkey
            WHERE p.p_type = '{_Q2_TYPE}'
              AND p.p_size BETWEEN {_Q2_SIZE_LO} AND {_Q2_SIZE_HI}
              AND r.r_name = '{_Q2_REGION}'
            GROUP BY 1, 2
        )
        SELECT s.s_acctbal, s.s_name, n.n_name,
               p.p_partkey, p.p_name, o.offer_price
        FROM offers o
        JOIN supplier s ON o.suppkey = s.s_suppkey
        JOIN nation n ON s.s_nationkey = n.n_nationkey
        JOIN part p ON o.partkey = p.p_partkey
        WHERE o.offer_price = (
            SELECT MIN(o2.offer_price) FROM offers o2
            WHERE o2.partkey = o.partkey
        )
    """,
    section="H2",
    doc="TPC-H Q2 (minimum cost supplier): for every mid-size "
    f"'{_Q2_TYPE}' part, the {_Q2_REGION}-region supplier(s) offering "
    "it cheapest — the canonical correlated-MIN subquery whose inner "
    "query repeats the outer's join. Adapted: no partsupp table, so "
    "the part-supplier offer relation is derived from lineitem "
    "(offer price = MIN l_extendedprice per part-supplier pair; MIN "
    "of stored doubles is exact, so the correlated equality is "
    "deterministic without the decimal device). All price ties "
    "return, keeping the SET deterministic with no tie-break. Scale: "
    "the region-routed supplier slice and the filtered part slice "
    "broadcast into the fact; the offers aggregate shuffles once on "
    "the (partkey, suppkey) grain; the correlated MIN decorrelates "
    "to a per-part broadcast re-join of the tiny offers table.",
)
def q_tpch_q2(spark: SparkSession, sf_dir: str) -> DataFrame:
    nation = load_table(spark, sf_dir, "nation")
    region = load_table(spark, sf_dir, "region").where(
        F.col("r_name") == _Q2_REGION
    )
    supp_region = (
        load_table(spark, sf_dir, "supplier")
        .join(
            F.broadcast(
                nation.join(
                    F.broadcast(region),
                    F.col("n_regionkey") == F.col("r_regionkey"),
                ).select("n_nationkey")
            ),
            F.col("s_nationkey") == F.col("n_nationkey"),
        )
        .select("s_suppkey")
    )
    part_slice = (
        load_table(spark, sf_dir, "part")
        .where(
            (F.col("p_type") == _Q2_TYPE)
            & F.col("p_size").between(_Q2_SIZE_LO, _Q2_SIZE_HI)
        )
        .select("p_partkey", "p_name")
    )
    li = load_table(spark, sf_dir, "lineitem").select(
        "l_partkey", "l_suppkey", "l_extendedprice"
    )
    offers = (
        li.join(
            F.broadcast(part_slice.select("p_partkey")),
            F.col("l_partkey") == F.col("p_partkey"),
        )
        .join(
            F.broadcast(supp_region),
            F.col("l_suppkey") == F.col("s_suppkey"),
        )
        .groupBy(
            F.col("l_partkey").alias("partkey"),
            F.col("l_suppkey").alias("suppkey"),
        )
        .agg(F.min("l_extendedprice").alias("offer_price"))
    )
    best = offers.groupBy(F.col("partkey").alias("b_partkey")).agg(
        F.min("offer_price").alias("best_price")
    )
    supp = load_table(spark, sf_dir, "supplier").join(
        F.broadcast(nation), F.col("s_nationkey") == F.col("n_nationkey")
    )
    return (
        offers.join(
            F.broadcast(best),
            (F.col("partkey") == F.col("b_partkey"))
            & (F.col("offer_price") == F.col("best_price")),
        )
        .join(
            F.broadcast(
                supp.select("s_suppkey", "s_acctbal", "s_name", "n_name")
            ),
            F.col("suppkey") == F.col("s_suppkey"),
        )
        .join(
            F.broadcast(part_slice),
            F.col("partkey") == F.col("p_partkey"),
        )
        .select(
            "s_acctbal", "s_name", "n_name",
            "p_partkey", "p_name", "offer_price",
        )
    )


@register(
    "q_tpch_q16",
    oracle=f"""
        SELECT p.p_brand, p.p_type, p.p_size,
               CAST(COUNT(DISTINCT l.l_suppkey) AS BIGINT)
                   AS supplier_cnt
        FROM lineitem l
        JOIN part p ON l.l_partkey = p.p_partkey
        WHERE p.p_brand <> '{_Q16_BRAND_NOT}'
          AND p.p_type <> '{_Q16_TYPE_NOT}'
          AND p.p_size IN ({", ".join(str(s) for s in _Q16_SIZES)})
          AND l.l_suppkey NOT IN (
              SELECT s_suppkey FROM supplier WHERE s_acctbal < 0
          )
        GROUP BY p.p_brand, p.p_type, p.p_size
    """,
    section="H16",
    doc="TPC-H Q16 (parts/supplier relationship): how many distinct "
    "suppliers can deliver each surviving (brand, type, size) "
    "combination, excluding a NOT-IN blacklist of suppliers — the "
    "canonical negated-membership + COUNT DISTINCT query. Adapted: "
    "the part-supplier bridge is lineitem (no partsupp) and the "
    "'complaints' blacklist is negative account balance (no "
    "s_comment). Scale: the blacklist subquery becomes a broadcast "
    "LEFT ANTI join (NOT IN with a non-nullable key is exactly "
    "anti-join); the filtered part slice broadcasts; the only "
    "shuffle is the distinct-aggregate on (brand, type, size, "
    "suppkey) — Spark's two-phase distinct-count keeps it "
    "map-combinable.",
)
def q_tpch_q16(spark: SparkSession, sf_dir: str) -> DataFrame:
    part_slice = (
        load_table(spark, sf_dir, "part")
        .where(
            (F.col("p_brand") != _Q16_BRAND_NOT)
            & (F.col("p_type") != _Q16_TYPE_NOT)
            & F.col("p_size").isin(*_Q16_SIZES)
        )
        .select("p_partkey", "p_brand", "p_type", "p_size")
    )
    bad_supp = (
        load_table(spark, sf_dir, "supplier")
        .where(F.col("s_acctbal") < 0)
        .select("s_suppkey")
    )
    li = load_table(spark, sf_dir, "lineitem").select(
        "l_partkey", "l_suppkey"
    )
    return (
        li.join(
            F.broadcast(bad_supp),
            F.col("l_suppkey") == F.col("s_suppkey"),
            "left_anti",
        )
        .join(
            F.broadcast(part_slice),
            F.col("l_partkey") == F.col("p_partkey"),
        )
        .groupBy("p_brand", "p_type", "p_size")
        .agg(
            F.countDistinct("l_suppkey")
            .cast("bigint")
            .alias("supplier_cnt")
        )
    )


def _q19_oracle_disjunct() -> str:
    terms = [
        f"(p.p_brand = '{b}' AND l.l_quantity BETWEEN {qlo} AND {qhi}"
        f" AND p.p_size BETWEEN {slo} AND {shi})"
        for b, qlo, qhi, slo, shi in _Q19_BUNDLES
    ]
    return "\n            OR ".join(terms)


@register(
    "q_tpch_q19",
    oracle=f"""
        SELECT CAST(SUM({ORACLE_DISC_PRICE}) AS DOUBLE) AS revenue
        FROM lineitem l
        JOIN part p ON l.l_partkey = p.p_partkey
        WHERE {_q19_oracle_disjunct()}
    """,
    section="H19",
    doc="TPC-H Q19 (discounted revenue): one scalar revenue over a "
    "disjunction of three (brand, quantity-range, size-range) "
    "predicate bundles mixing columns from both join sides — the "
    "canonical test that an optimizer can still use the join key "
    "under an OR of cross-table conjuncts instead of falling back "
    "to a cross product. Adapted: no shipmode/shipinstruct conjuncts "
    "(columns absent); the brand/qty/size triple keeps the "
    "cross-table-OR shape. Revenue is the exact-decimal device. "
    "Scale: the common p_partkey equi-key is extracted so the part "
    "side broadcasts and the OR evaluates post-probe; Catalyst also "
    "pushes the derived brand-OR and size-OR onto the part scan and "
    "the derived quantity-OR onto the lineitem scan as "
    "range-union PushedFilters.",
)
def q_tpch_q19(spark: SparkSession, sf_dir: str) -> DataFrame:
    part = load_table(spark, sf_dir, "part").select(
        "p_partkey", "p_brand", "p_size"
    )
    li = load_table(spark, sf_dir, "lineitem").select(
        "l_partkey", "l_quantity", "l_extendedprice", "l_discount"
    )
    disj = None
    for b, qlo, qhi, slo, shi in _Q19_BUNDLES:
        term = (
            (F.col("p_brand") == b)
            & F.col("l_quantity").between(qlo, qhi)
            & F.col("p_size").between(slo, shi)
        )
        disj = term if disj is None else (disj | term)
    return (
        li.join(
            F.broadcast(part), F.col("l_partkey") == F.col("p_partkey")
        )
        .where(disj)
        .agg(F.sum(disc_price()).cast("double").alias("revenue"))
    )


@register(
    "q_tpch_q21",
    oracle=f"""
        WITH fl AS (
            SELECT l.l_orderkey, l.l_suppkey,
                   l.l_shipdate > o.o_orderdate
                                  + INTERVAL {_Q21_LATE_DAYS} DAY
                       AS is_late
            FROM lineitem l
            JOIN orders o ON l.l_orderkey = o.o_orderkey
            WHERE o.o_orderstatus = 'F'
        ),
        waiters AS (
            SELECT DISTINCT a.l_orderkey, a.l_suppkey
            FROM fl a
            WHERE a.is_late
              AND EXISTS (
                  SELECT 1 FROM fl b
                  WHERE b.l_orderkey = a.l_orderkey
                    AND b.l_suppkey <> a.l_suppkey
              )
              AND NOT EXISTS (
                  SELECT 1 FROM fl c
                  WHERE c.l_orderkey = a.l_orderkey
                    AND c.l_suppkey <> a.l_suppkey
                    AND c.is_late
              )
        ),
        counts AS (
            SELECT s.s_name,
                   CAST(COUNT(*) AS BIGINT) AS numwait
            FROM waiters w
            JOIN supplier s ON w.l_suppkey = s.s_suppkey
            GROUP BY s.s_name
        )
        SELECT s_name, numwait
        FROM (
            SELECT *, row_number() OVER (
                ORDER BY numwait DESC, s_name) AS rn
            FROM counts
        ) WHERE rn <= {_Q21_TOPK}
    """,
    section="H21",
    doc="TPC-H Q21 (suppliers who kept orders waiting): suppliers who "
    "were the SOLE late supplier on a finished multi-supplier order — "
    "the hardest canonical shape: an EXISTS and a NOT EXISTS against "
    "the same fact, both correlated on the outer row's order AND "
    "inequality-correlated on its supplier. Adapted: 'late' is "
    f"l_shipdate > o_orderdate + {_Q21_LATE_DAYS} days (no "
    "commit/receipt dates). The Spark side decorrelates both "
    "quantifiers into ONE per-order aggregate — distinct suppliers, "
    "distinct late suppliers, and the min late supplier — because "
    "[sole late supplier on a >=2-supplier order] is exactly "
    "(n_supp >= 2 AND n_late_supp = 1), which turns two correlated "
    "self-joins into a single map-combinable groupBy; the oracle "
    "keeps the literal EXISTS/NOT-EXISTS form so the equivalence is "
    "hash-verified. Scale: one orderkey shuffle for the fact join, "
    "one for the per-order aggregate (vs THREE fact self-join "
    "shuffles in the naive plan); top-k is TakeOrdered.",
)
def q_tpch_q21(spark: SparkSession, sf_dir: str) -> DataFrame:
    orders = load_table(spark, sf_dir, "orders").where(
        F.col("o_orderstatus") == "F"
    ).select("o_orderkey", "o_orderdate")
    li = load_table(spark, sf_dir, "lineitem").select(
        "l_orderkey", "l_suppkey", "l_shipdate"
    )
    fl = li.join(orders, F.col("l_orderkey") == F.col("o_orderkey")).select(
        "l_orderkey",
        "l_suppkey",
        (
            F.col("l_shipdate")
            > F.col("o_orderdate") + F.expr(f"INTERVAL {_Q21_LATE_DAYS} DAY")
        ).alias("is_late"),
    )
    per_order = fl.groupBy("l_orderkey").agg(
        F.countDistinct("l_suppkey").alias("n_supp"),
        F.countDistinct(
            F.when(F.col("is_late"), F.col("l_suppkey"))
        ).alias("n_late_supp"),
        F.min(
            F.when(F.col("is_late"), F.col("l_suppkey"))
        ).alias("sole_late_supp"),
    )
    waiters = per_order.where(
        (F.col("n_supp") >= 2) & (F.col("n_late_supp") == 1)
    ).select("sole_late_supp")
    supp = load_table(spark, sf_dir, "supplier").select(
        "s_suppkey", "s_name"
    )
    counts = (
        waiters.join(
            F.broadcast(supp),
            F.col("sole_late_supp") == F.col("s_suppkey"),
        )
        .groupBy("s_name")
        .agg(F.count(F.lit(1)).cast("bigint").alias("numwait"))
    )
    w = Window.orderBy(F.col("numwait").desc(), "s_name")
    return (
        counts.withColumn("rn", F.row_number().over(w))
        .where(F.col("rn") <= _Q21_TOPK)
        .select("s_name", "numwait")
    )


@register(
    "q_tpch_q22",
    oracle=f"""
        WITH pool AS (
            SELECT CAST(c_nationkey AS VARCHAR) AS cntrycode,
                   c_custkey, c_acctbal
            FROM customer
            WHERE c_nationkey IN
                  ({", ".join(str(cd) for cd in _Q22_CODES)})
        ),
        cutoff AS (
            SELECT CAST(SUM(CAST(c_acctbal AS DECIMAL(18,2)))
                        AS DOUBLE) / COUNT(*) AS avg_bal
            FROM pool WHERE c_acctbal > 0
        )
        SELECT p.cntrycode,
               CAST(COUNT(*) AS BIGINT) AS numcust,
               CAST(SUM(CAST(p.c_acctbal AS DECIMAL(18,2))) AS DOUBLE)
                   AS totacctbal
        FROM pool p, cutoff
        WHERE p.c_acctbal > cutoff.avg_bal
          AND NOT EXISTS (
              SELECT 1 FROM orders o
              WHERE o.o_custkey = p.c_custkey
                AND o.o_orderdate >=
                    TIMESTAMP '{_Q22_CUTOFF} 00:00:00'
          )
        GROUP BY p.cntrycode
    """,
    section="H22",
    doc="TPC-H Q22 (global sales opportunity): well-funded customers in "
    "selected country codes who have gone dormant — an uncorrelated "
    "scalar AVG subquery feeding a filter PLUS a correlated "
    "NOT-EXISTS anti-join, per country code. Adapted: no c_phone, so "
    "the country code IS the nation key as a string; 'never ordered' "
    f"becomes 'no order since {_Q22_CUTOFF}' (every customer here "
    "has old orders). The average is the exact-decimal-sum / count "
    "device on BOTH engines, so the > threshold comparison cannot "
    "flip on float summation order. Scale: the scalar average "
    "broadcasts; the anti-join probes the date-filtered orders "
    "projection keyed on custkey (the only shuffle); the final "
    "5-group aggregate is map-combinable.",
)
def q_tpch_q22(spark: SparkSession, sf_dir: str) -> DataFrame:
    from ai_to_cvent_etl_spark.queries._util import dec2

    pool = (
        load_table(spark, sf_dir, "customer")
        .where(F.col("c_nationkey").isin(*_Q22_CODES))
        .select(
            F.col("c_nationkey").cast("string").alias("cntrycode"),
            "c_custkey",
            "c_acctbal",
        )
    )
    avg_bal = pool.where(F.col("c_acctbal") > 0).agg(
        (
            F.sum(dec2(F.col("c_acctbal"))).cast("double")
            / F.count(F.lit(1))
        ).alias("avg_bal")
    )
    recent = (
        load_table(spark, sf_dir, "orders")
        .where(
            F.col("o_orderdate") >= F.lit(_Q22_CUTOFF).cast("timestamp")
        )
        .select("o_custkey")
    )
    return (
        pool.crossJoin(F.broadcast(avg_bal))
        .where(F.col("c_acctbal") > F.col("avg_bal"))
        .join(
            recent,
            F.col("c_custkey") == F.col("o_custkey"),
            "left_anti",
        )
        .groupBy("cntrycode")
        .agg(
            F.count(F.lit(1)).cast("bigint").alias("numcust"),
            F.sum(dec2(F.col("c_acctbal")))
            .cast("double")
            .alias("totacctbal"),
        )
    )


_Q11_REGION = "EUROPE"

@register(
    "q_tpch_q11",
    oracle=f"""
        WITH v AS (
            SELECT l.l_partkey,
                   SUM(CAST(l.l_extendedprice AS DECIMAL(18,2))) AS dval
            FROM lineitem l
            JOIN supplier s ON l.l_suppkey = s.s_suppkey
            JOIN nation n ON s.s_nationkey = n.n_nationkey
            JOIN region r ON n.n_regionkey = r.r_regionkey
            WHERE r.r_name = '{_Q11_REGION}'
            GROUP BY l.l_partkey
        ),
        cents AS (
            SELECT l_partkey, CAST(dval * 100 AS BIGINT) AS value_cents
            FROM v
        ),
        t AS (
            SELECT SUM(value_cents) AS tot_cents, COUNT(*) AS n_parts
            FROM cents
        )
        SELECT c.l_partkey,
               CAST(c.value_cents AS DOUBLE) / 100 AS value
        FROM cents c, t
        WHERE c.value_cents * t.n_parts * 4 > t.tot_cents * 5
    """,
    section="H11",
    doc="TPC-H Q11 (important stock), adapted: the schema has no partsupp "
    "table (SURVEY §2.125 note), so 'supply value' is re-derived from the "
    "fact itself — per-part shipped value (exact-decimal l_extendedprice "
    f"sum) from {_Q11_REGION}-region suppliers, keeping parts whose value "
    "exceeds 1.25x the mean per-part value. The canonical shape survives "
    "intact: an aggregate, a SCALAR subquery over that same aggregate, and "
    "a HAVING-style threshold filter against it. Determinism device: the "
    "threshold compare runs in integer CENTS (decimal*100 -> BIGINT), so "
    "value_cents*n*4 > tot_cents*5 is exact int64 arithmetic on both "
    "engines — no float boundary rides on partial-sum order (max ~1e14 at "
    "sf1000, far under int64). Scale: region-filtered supplier slice "
    "broadcasts into the fact scan; the per-part agg shuffles once on "
    "l_partkey (the natural grain); the scalar total is a one-row "
    "broadcast cross join, so the threshold filter is map-side — the "
    "canonical Q11 plan with zero extra shuffles.",
)
def q_tpch_q11(spark: SparkSession, sf_dir: str) -> DataFrame:
    supp_slice = (
        load_table(spark, sf_dir, "supplier")
        .join(
            F.broadcast(
                load_table(spark, sf_dir, "nation").join(
                    F.broadcast(
                        load_table(spark, sf_dir, "region").where(
                            F.col("r_name") == _Q11_REGION
                        )
                    ),
                    F.col("n_regionkey") == F.col("r_regionkey"),
                )
            ),
            F.col("s_nationkey") == F.col("n_nationkey"),
        )
        .select("s_suppkey")
    )
    cents = (
        load_table(spark, sf_dir, "lineitem")
        .join(F.broadcast(supp_slice), F.col("l_suppkey") == F.col("s_suppkey"))
        .groupBy("l_partkey")
        .agg(
            (F.sum(dec2(F.col("l_extendedprice"))) * 100)
            .cast("bigint")
            .alias("value_cents")
        )
    )
    t = cents.agg(
        F.sum("value_cents").alias("tot_cents"),
        F.count(F.lit(1)).alias("n_parts"),
    )
    return (
        cents.crossJoin(F.broadcast(t))
        .where(
            F.col("value_cents") * F.col("n_parts") * 4
            > F.col("tot_cents") * 5
        )
        .select(
            "l_partkey",
            (F.col("value_cents").cast("double") / 100).alias("value"),
        )
    )


_Q20_PREFIX = "red"
_Q20_LO, _Q20_HI = "1996-01-01", "1997-01-01"
_Q20_NATION_PAT = "NATION_1%"


@register(
    "q_tpch_q20",
    oracle=f"""
        WITH shipped AS (
            SELECT l.l_partkey, l.l_suppkey,
                   CAST(SUM(l.l_quantity) AS BIGINT) AS qty
            FROM lineitem l
            JOIN part p ON l.l_partkey = p.p_partkey
            WHERE p.p_name LIKE '{_Q20_PREFIX}%'
              AND l.l_shipdate >= TIMESTAMP '{_Q20_LO} 00:00:00'
              AND l.l_shipdate <  TIMESTAMP '{_Q20_HI} 00:00:00'
            GROUP BY 1, 2
        ),
        tot AS (
            SELECT l_partkey, SUM(qty) AS total_qty
            FROM shipped GROUP BY 1
        ),
        dom AS (
            SELECT DISTINCT sh.l_suppkey
            FROM shipped sh JOIN tot t ON sh.l_partkey = t.l_partkey
            WHERE sh.qty * 2 > t.total_qty
        )
        SELECT su.s_suppkey, su.s_name
        FROM supplier su
        JOIN nation n ON su.s_nationkey = n.n_nationkey
        WHERE n.n_name LIKE '{_Q20_NATION_PAT}'
          AND su.s_suppkey IN (SELECT l_suppkey FROM dom)
    """,
    section="H20",
    doc="TPC-H Q20 (potential part promotion), adapted: no partsupp/"
    "ps_availqty exists (SURVEY §2.125 note), so 'has excess stock of a "
    f"part' becomes 'DOMINANT supplier of a part' — shipped more than half "
    f"of that part's total {_Q20_LO[:4]} volume of '{_Q20_PREFIX}%'-named "
    "parts. The canonical structure is preserved exactly: an inner "
    "correlated aggregate (qty vs 0.5x the per-part total) decorrelated "
    "into a per-(part,supplier) agg joined against a per-part agg, feeding "
    "a semi-join into the nation-filtered supplier list. Determinism: "
    "quantities are integral doubles summed then cast to BIGINT, so the "
    "qty*2 > total comparison is exact int64. Scale: the part-name filter "
    "broadcasts into the fact scan (with the date filter pushed to "
    "parquet); both aggs shuffle on l_partkey only — AQE coalesces the "
    "reuse; the dominant-supplier set is tiny and broadcasts into the "
    "supplier semi-join. No all-pairs anything.",
)
def q_tpch_q20(spark: SparkSession, sf_dir: str) -> DataFrame:
    red_parts = (
        load_table(spark, sf_dir, "part")
        .where(F.col("p_name").like(f"{_Q20_PREFIX}%"))
        .select("p_partkey")
    )
    shipped = (
        load_table(spark, sf_dir, "lineitem")
        .where(
            (F.col("l_shipdate") >= F.lit(_Q20_LO).cast("timestamp"))
            & (F.col("l_shipdate") < F.lit(_Q20_HI).cast("timestamp"))
        )
        .join(F.broadcast(red_parts), F.col("l_partkey") == F.col("p_partkey"))
        .groupBy("l_partkey", "l_suppkey")
        .agg(F.sum("l_quantity").cast("bigint").alias("qty"))
    )
    tot = shipped.groupBy("l_partkey").agg(
        F.sum("qty").alias("total_qty")
    )
    dom = (
        shipped.join(tot, "l_partkey")
        .where(F.col("qty") * 2 > F.col("total_qty"))
        .select("l_suppkey")
        .distinct()
    )
    return (
        load_table(spark, sf_dir, "supplier")
        .join(
            F.broadcast(load_table(spark, sf_dir, "nation")),
            F.col("s_nationkey") == F.col("n_nationkey"),
        )
        .where(F.col("n_name").like(_Q20_NATION_PAT))
        .join(
            F.broadcast(dom),
            F.col("s_suppkey") == F.col("l_suppkey"),
            "left_semi",
        )
        .select("s_suppkey", "s_name")
    )
