"""Eighteenth-wave operators (r3 continuation): table-argument UDTF,
key-sequence gap audit, calendar arithmetic, Theil inequality index.

  X8  q_udtf_table_arg   — Python UDTF invoked with a TABLE(...) argument
                           and PARTITION BY (the Spark 4 polymorphic
                           table function surface): per-partition
                           accumulation in eval(), emission in
                           terminate().
  E23 q_etl_key_gaps     — sequence-gap audit: missing [lo, hi] ranges
                           in a key sequence via lead-diff islands — the
                           completeness check for ingest pipelines that
                           assign monotonic ids.
  F16 q_date_funcs2      — calendar arithmetic wave 2: last_day,
                           add_months, whole-month age, day-of-year,
                           ISO week, quarter truncation.
  A34 q_agg_theil        — Theil T inequality index of order values per
                           market segment (the entropy-based member of
                           the inequality family: Gini A25, HHI A29).

Determinism notes (SURVEY §5.3):
  * X8's UDTF accumulates an exact cent total (int) per partition and
    emits one row in terminate(); the oracle is a plain GROUP BY with
    the same decimal sum. PARTITION BY guarantees one eval-stream per
    status regardless of physical partitioning.
  * E23 is pure integer window logic (lead - key > 1).
  * F16 is calendar integer logic; ISO week/day-of-year probed equal
    cross-engine on this data; whole-month age is explicit
    (year*12+month) difference — NOT months_between (fractional,
    engine-specific day handling).
  * A34: x ln(x/mu) terms are IEEE over identical decimal→double cents
    (int64-backed), quantized floor(x·1e6) before the exact per-group
    DECIMAL sum (values ~1e5·ln — rule 10 margin holds), one final
    IEEE expression rounded 6dp.

Scale notes:
  * X8: the TABLE argument hash-partitions by the PARTITION BY key and
    streams each group through one Python worker — per-group state is
    O(1) here; the Arrow batches amortize the boundary. Heavy logic
    belongs in eval-side accumulation, never buffered rows.
  * E23 is one ranked window keyed... by nothing global — at 100 TB,
    range-partition the keys (AQE handles the ordered exchange) or run
    per-shard gap audits and merge boundaries; the output is bounded
    by the number of gaps, not rows.
  * F16 is map-only.
  * A34 is two keyed reductions (per-segment mean, then per-segment
    quantized log-moment) — both partial-agg friendly; the 5-row mean
    side broadcasts back by the size-based planner.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession, Window
from pyspark.sql import functions as F

from ai_to_cvent_etl_spark.io import load_table
from ai_to_cvent_etl_spark.registry import register

# --- X8: TABLE-argument Python UDTF ------------------------------------------


def _make_status_summary_udtf():
    """Build the UDTF class lazily so importing this module never needs a
    SparkSession. Cited API: pyspark.sql.functions.udtf + TABLE(...)
    PARTITION BY (public since Spark 3.5, polymorphic in 4.x)."""
    from pyspark.sql.functions import udtf

    @udtf(returnType="o_orderstatus string, n_rows bigint, total_cents bigint")
    class StatusSummary:
        def __init__(self) -> None:
            self.key = None
            self.n = 0
            self.cents = 0

        def eval(self, row):
            self.key = row["o_orderstatus"]
            self.n += 1
            self.cents += int(row["cents"])

        def terminate(self):
            if self.key is not None:
                yield self.key, self.n, self.cents

    return StatusSummary


@register(
    "q_udtf_table_arg",
    oracle="""
        SELECT o_orderstatus,
               CAST(COUNT(*) AS BIGINT) AS n_rows,
               CAST(SUM(CAST(CAST(o_totalprice AS DECIMAL(18,2)) * 100
                             AS BIGINT)) AS BIGINT) AS total_cents
        FROM orders
        GROUP BY o_orderstatus
    """,
    section="X8",
    doc="Python UDTF invoked with a TABLE(...) argument and PARTITION BY "
    "o_orderstatus — the Spark 4 polymorphic-table-function surface: "
    "each partition streams through eval() (accumulating an exact cent "
    "total), terminate() emits one summary row per group. The cents are "
    "computed JVM-side (decimal*100 → BIGINT) so the Python side only "
    "adds exact integers. Verified against a plain GROUP BY — the UDTF "
    "must see every row of its partition exactly once regardless of "
    "physical partitioning. Per-group state is O(1); the TABLE argument "
    "is how user-defined relational operators compose with SQL at "
    "scale (vs X4's lateral-join UDTF).",
)
def q_udtf_table_arg(spark: SparkSession, sf_dir: str) -> DataFrame:
    orders = load_table(spark, sf_dir, "orders").select(
        "o_orderstatus",
        F.expr(
            "CAST(CAST(o_totalprice AS DECIMAL(18,2)) * 100 AS BIGINT)"
        ).alias("cents"),
    )
    orders.createOrReplaceTempView("x8_orders_cents")
    spark.udtf.register("x8_status_summary", _make_status_summary_udtf())
    return spark.sql(
        "SELECT * FROM x8_status_summary(TABLE(x8_orders_cents) "
        "PARTITION BY o_orderstatus)"
    )


# --- E23: key-sequence gap audit ---------------------------------------------


@register(
    "q_etl_key_gaps",
    oracle="""
        WITH keys AS (
            SELECT o_orderkey AS k FROM orders WHERE o_orderkey % 7 <> 3
        ),
        nxt AS (
            SELECT k, lead(k) OVER (ORDER BY k) AS nk FROM keys
        )
        SELECT k + 1 AS gap_lo,
               nk - 1 AS gap_hi,
               nk - k - 1 AS gap_len
        FROM nxt
        WHERE nk - k > 1
    """,
    section="E23",
    doc="Sequence-gap audit (ingest completeness check for monotonic-id "
    "feeds): the missing [lo, hi] ranges of a key sequence via the "
    "lead-diff islands device — one ordered window, gaps where "
    "next-key − key > 1, output one row per HOLE (bounded by the gap "
    "count, not the row count). Audited over a deterministic subset "
    "(every key ≡3 mod 7 removed) so the operator is exercised "
    "non-vacuously at every SF. Pure integer logic. At 100 TB the "
    "global order comes from range partitioning (AQE's ordered "
    "exchange); per-shard audits merge by checking shard boundaries.",
)
def q_etl_key_gaps(spark: SparkSession, sf_dir: str) -> DataFrame:
    orders = load_table(spark, sf_dir, "orders")
    keys = orders.where(F.col("o_orderkey") % 7 != 3).select(
        F.col("o_orderkey").alias("k")
    )
    nxt = keys.select(
        "k", F.lead("k").over(Window.orderBy("k")).alias("nk")
    )
    return nxt.where(F.col("nk") - F.col("k") > 1).select(
        (F.col("k") + 1).alias("gap_lo"),
        (F.col("nk") - 1).alias("gap_hi"),
        (F.col("nk") - F.col("k") - 1).alias("gap_len"),
    )


# --- F16: calendar arithmetic wave 2 -----------------------------------------


@register(
    "q_date_funcs2",
    oracle="""
        SELECT o_orderkey,
               last_day(CAST(o_orderdate AS DATE)) AS month_end,
               CAST(CAST(o_orderdate AS DATE) + INTERVAL 2 MONTH AS DATE)
                   AS plus_2mo,
               (date_part('year', o_orderdate) - 1995) * 12
               + date_part('month', o_orderdate) - 1 AS age_months,
               CAST(dayofyear(o_orderdate) AS BIGINT) AS doy,
               CAST(weekofyear(o_orderdate) AS BIGINT) AS iso_week,
               CAST(date_trunc('quarter', o_orderdate) AS DATE)
                   AS quarter_start
        FROM orders
    """,
    section="F16",
    doc="Calendar arithmetic wave 2: last_day (month end), add_months "
    "(+2), whole-month age since 1995-01 as an EXPLICIT year*12+month "
    "difference (months_between is fractional with engine-specific "
    "day/time handling — the F5-class trap), day-of-year, ISO week "
    "number, and quarter truncation — all as DATE/BIGINT outputs. "
    "Map-only; these normalizations are the partition-key builders for "
    "time-partitioned layouts (month/quarter directories).",
)
def q_date_funcs2(spark: SparkSession, sf_dir: str) -> DataFrame:
    o = load_table(spark, sf_dir, "orders")
    d = F.col("o_orderdate")
    return o.select(
        "o_orderkey",
        F.last_day(d).alias("month_end"),
        F.add_months(d, 2).alias("plus_2mo"),
        ((F.year(d) - 1995) * 12 + F.month(d) - 1)
        .cast("long")
        .alias("age_months"),
        F.dayofyear(d).cast("long").alias("doy"),
        F.weekofyear(d).cast("long").alias("iso_week"),
        F.date_trunc("quarter", d).cast("date").alias("quarter_start"),
    )


# --- A34: Theil T inequality index -------------------------------------------

_THEIL_QS = 1e6


@register(
    "q_agg_theil",
    oracle=f"""
        WITH c AS (
            SELECT c_mktsegment AS segment,
                   CAST(CAST(o_totalprice AS DECIMAL(18,2)) * 100
                        AS BIGINT) AS cents
            FROM orders JOIN customer ON c_custkey = o_custkey
        ),
        m AS (
            SELECT segment,
                   CAST(COUNT(*) AS BIGINT) AS n,
                   CAST(SUM(cents) AS BIGINT) AS total
            FROM c GROUP BY segment
        ),
        t AS (
            SELECT c.segment, m.n, m.total,
                   CAST(c.cents AS DOUBLE) * m.n / m.total AS r
            FROM c JOIN m ON m.segment = c.segment
        )
        SELECT segment, n,
               ROUND(CAST(SUM(CAST(floor(r * ln(r) * {_THEIL_QS})
                                   AS DECIMAL(38,0))) AS DOUBLE)
                     / {_THEIL_QS} / n, 6) AS theil_t
        FROM t GROUP BY segment, n
    """,
    section="A34",
    doc="Theil T inequality index of order values per market segment: "
    "T = mean(r·ln r) with r = x/mean — the entropy-based member of "
    "the inequality family (A25 Gini is rank-based, A29 HHI is "
    "concentration-based; Theil is the only one decomposable into "
    "within/between-group terms). r is IEEE over exact cent integers "
    "(int64-backed, identical bits); each r·ln r term is quantized "
    "floor(x·1e6) before the exact per-segment DECIMAL sum (§5.3 rule "
    "10 margin: |terms| ≲ 1e7 over ≲1e5 rows). Two keyed reductions — "
    "per-segment totals then the log-moment — with the 5-row totals "
    "side joining back via the size-based planner's broadcast.",
)
def q_agg_theil(spark: SparkSession, sf_dir: str) -> DataFrame:
    orders = load_table(spark, sf_dir, "orders")
    customer = load_table(spark, sf_dir, "customer")
    c = orders.join(
        customer, orders.o_custkey == customer.c_custkey
    ).select(
        F.col("c_mktsegment").alias("segment"),
        F.expr(
            "CAST(CAST(o_totalprice AS DECIMAL(18,2)) * 100 AS BIGINT)"
        ).alias("cents"),
    )
    m = c.groupBy("segment").agg(
        F.count("*").alias("n"), F.sum("cents").alias("total")
    )
    t = c.join(m, "segment").select(
        "segment",
        "n",
        (
            F.col("cents").cast("double") * F.col("n") / F.col("total")
        ).alias("r"),
    )
    return t.groupBy("segment", "n").agg(
        F.round(
            F.sum(
                F.floor(F.col("r") * F.log("r") * _THEIL_QS).cast(
                    "decimal(38,0)"
                )
            ).cast("double")
            / _THEIL_QS
            / F.col("n"),
            6,
        ).alias("theil_t")
    )
