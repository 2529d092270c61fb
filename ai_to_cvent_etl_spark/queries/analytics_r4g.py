"""Thirty-fifth-wave operators (r3 continuation): reconciliation join,
bag-semantics set ops, activity heatmap.

  J23 q_join_reconcile — finance-style reconciliation: orders matched
                         to a payment feed within a ±2-cent tolerance
                         via 1-D blocking (amount-bucket key + neighbor
                         probe) — the fuzzy-amount match that closes
                         the books, never a cross join.
  U8  q_setops_all     — EXCEPT ALL / INTERSECT ALL bag semantics:
                         multiplicity-aware differences the set forms
                         (U3/U4) silently collapse — pinned because
                         dedup accounting needs multiplicities.
  TS18 q_ts_activity_heatmap — the day-of-week × hour activity profile
                         with shares — the load-shaping heatmap behind
                         capacity scheduling.

Determinism notes (SURVEY §5.3):
  * J23 is exact integer cent arithmetic; the probe explodes only the
    order side (build buckets unique) so each candidate pair emits
    once; ties on |diff| keep both rows (the audit wants them).
  * U8 relies on identical bag semantics for EXCEPT ALL / INTERSECT
    ALL on both engines (probed); rows are exact projections.
  * TS18 is integer calendar arithmetic (datediff-mod-7 dow — the F5
    trap — and epoch-hour extraction); shares rounded 6dp.

Scale notes:
  * J23 is the 1-D form of J21's grid blocking: one keyed shuffle on
    the amount bucket, ×3 probe replication for the tolerance window;
    tolerance/bucket-size trade replication against bucket width.
  * U8: both ALL-variants plan as aggregations of signed counts —
    one keyed shuffle each, partial-agg friendly.
  * TS18 collapses to 168 cells immediately.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession, Window
from pyspark.sql import functions as F

from ai_to_cvent_etl_spark.io import load_table
from ai_to_cvent_etl_spark.registry import register

# --- J23: tolerance reconciliation join --------------------------------------

_REC_TOL = 2      # cents
_REC_BUCKET = 10  # cents per block


@register(
    "q_join_reconcile",
    oracle=f"""
        WITH o AS (
            SELECT o_orderkey AS k,
                   CAST(CAST(o_totalprice AS DECIMAL(18,2)) * 100
                        AS BIGINT) AS cents
            FROM orders
        ),
        pay AS (
            SELECT k AS pay_id,
                   cents + (k % 5) - 2 AS pay_cents
            FROM o WHERE k % 3 <> 0
        ),
        probe AS (
            SELECT k, cents,
                   cents // {_REC_BUCKET} + d.d AS bkt
            FROM o, (SELECT unnest([-1, 0, 1]) AS d) d
        ),
        build AS (
            SELECT pay_id, pay_cents,
                   pay_cents // {_REC_BUCKET} AS bkt
            FROM pay
        )
        SELECT p.k AS order_key, b.pay_id,
               CAST(abs(p.cents - b.pay_cents) AS BIGINT) AS diff_cents
        FROM probe p
        JOIN build b ON b.bkt = p.bkt
        WHERE abs(p.cents - b.pay_cents) <= {_REC_TOL}
    """,
    section="J23",
    doc="Finance reconciliation: orders matched to a payment feed (a "
    "deterministic subset carrying ±2-cent jitter and missing every "
    f"3rd order) within a {_REC_TOL}-cent tolerance, via 1-D amount "
    f"blocking — {_REC_BUCKET}-cent buckets, probe side exploded ±1 "
    "bucket (J21's grid device in one dimension), each candidate "
    "emitted exactly once (build buckets unique). Exact integer cent "
    "arithmetic; the unmatched remainder (anti-join of this result) "
    "is the break report. One keyed shuffle on the bucket — the fuzzy-"
    "amount match that closes the books without a cross join; at "
    "scale tolerance/bucket-size trade the ×3 replication against "
    "bucket width.",
)
def q_join_reconcile(spark: SparkSession, sf_dir: str) -> DataFrame:
    orders = load_table(spark, sf_dir, "orders")
    o = orders.select(
        F.col("o_orderkey").alias("k"),
        F.expr(
            "CAST(CAST(o_totalprice AS DECIMAL(18,2)) * 100 AS BIGINT)"
        ).alias("cents"),
    )
    pay = o.where(F.col("k") % 3 != 0).select(
        F.col("k").alias("pay_id"),
        (F.col("cents") + (F.col("k") % 5) - 2).alias("pay_cents"),
    )
    probe = o.select(
        "k",
        "cents",
        F.explode(F.array(F.lit(-1), F.lit(0), F.lit(1))).alias("d"),
    ).select(
        "k",
        "cents",
        (F.expr(f"cents DIV {_REC_BUCKET}") + F.col("d")).alias("bkt"),
    )
    build = pay.select(
        "pay_id",
        "pay_cents",
        F.expr(f"pay_cents DIV {_REC_BUCKET}").alias("bkt"),
    )
    j = probe.join(build, "bkt")
    diff = F.abs(F.col("cents") - F.col("pay_cents"))
    return j.where(diff <= _REC_TOL).select(
        F.col("k").alias("order_key"),
        "pay_id",
        diff.cast("long").alias("diff_cents"),
    )


# --- U8: EXCEPT ALL / INTERSECT ALL ------------------------------------------


@register(
    "q_setops_all",
    oracle="""
        WITH a AS (
            SELECT o_orderstatus AS st,
                   CAST(date_part('year', o_orderdate) AS INT) AS yr
            FROM orders WHERE o_orderkey % 4 IN (0, 1)
        ),
        b AS (
            SELECT o_orderstatus AS st,
                   CAST(date_part('year', o_orderdate) AS INT) AS yr
            FROM orders WHERE o_orderkey % 4 IN (1, 2)
        ),
        ex AS (
            SELECT st, yr FROM a EXCEPT ALL SELECT st, yr FROM b
        ),
        ix AS (
            SELECT st, yr FROM a INTERSECT ALL SELECT st, yr FROM b
        )
        SELECT 'except_all' AS op, st, yr,
               CAST(COUNT(*) AS BIGINT) AS multiplicity
        FROM ex GROUP BY st, yr
        UNION ALL
        SELECT 'intersect_all', st, yr, CAST(COUNT(*) AS BIGINT)
        FROM ix GROUP BY st, yr
    """,
    section="U8",
    doc="Bag-semantics set operations: EXCEPT ALL and INTERSECT ALL "
    "over two overlapping low-cardinality projections (status, year) "
    "— multiplicity-aware differences that the set forms (U3/U4) "
    "silently collapse to 0-or-1, summarized as per-value "
    "multiplicities. Pinned because volume accounting (how many MORE "
    "rows does feed A have per key) is a bag question: EXCEPT ALL's "
    "answer is max(count_a − count_b, 0) per value, which Spark plans "
    "as a signed-count aggregation — one keyed shuffle, no row-by-row "
    "matching.",
)
def q_setops_all(spark: SparkSession, sf_dir: str) -> DataFrame:
    orders = load_table(spark, sf_dir, "orders")
    proj = lambda mods: orders.where(
        (F.col("o_orderkey") % 4).isin(mods)
    ).select(
        F.col("o_orderstatus").alias("st"),
        F.year("o_orderdate").cast("int").alias("yr"),
    )
    a, b = proj([0, 1]), proj([1, 2])
    ex = (
        a.exceptAll(b)
        .groupBy("st", "yr")
        .agg(F.count("*").alias("multiplicity"))
        .select(F.lit("except_all").alias("op"), "st", "yr", "multiplicity")
    )
    ix = (
        a.intersectAll(b)
        .groupBy("st", "yr")
        .agg(F.count("*").alias("multiplicity"))
        .select(
            F.lit("intersect_all").alias("op"), "st", "yr", "multiplicity"
        )
    )
    return ex.unionAll(ix)


# --- TS18: activity heatmap --------------------------------------------------


@register(
    "q_ts_activity_heatmap",
    oracle="""
        WITH c AS (
            SELECT CAST(date_diff('day', TIMESTAMP '1995-01-02',
                                  date_trunc('day', ts)) AS BIGINT) % 7
                       AS dow,
                   CAST(date_part('hour', ts) AS INT) AS hour,
                   value
            FROM events
        )
        SELECT dow, hour,
               CAST(COUNT(*) AS BIGINT) AS n_events,
               ROUND(CAST(COUNT(*) AS DOUBLE)
                     / CAST(SUM(COUNT(*)) OVER () AS DOUBLE), 6)
                   AS share
        FROM c
        GROUP BY dow, hour
    """,
    section="TS18",
    doc="Day-of-week × hour activity heatmap with traffic shares — the "
    "load-shaping profile behind capacity scheduling, maintenance "
    "windows, and batch-slot placement. Day-of-week is datediff-mod-7 "
    "from a fixed Monday on the TRUNCATED day (the F5 numbering trap, "
    "avoided the same way as TS12); hour is a direct extraction. "
    "Collapses to ≤168 cells in one reduction; the share window runs "
    "over the collapsed cells.",
)
def q_ts_activity_heatmap(spark: SparkSession, sf_dir: str) -> DataFrame:
    ev = load_table(spark, sf_dir, "events")
    c = ev.select(
        (
            F.datediff(
                F.date_trunc("day", "ts"), F.lit("1995-01-02")
            ).cast("long")
            % 7
        ).alias("dow"),
        F.hour("ts").cast("int").alias("hour"),
    )
    g = c.groupBy("dow", "hour").agg(F.count("*").alias("n_events"))
    w = Window.partitionBy()
    return g.select(
        "dow",
        "hour",
        "n_events",
        F.round(
            F.col("n_events").cast("double")
            / F.sum("n_events").over(w).cast("double"),
            6,
        ).alias("share"),
    )
