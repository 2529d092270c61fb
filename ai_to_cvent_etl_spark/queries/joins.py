"""SURVEY §2.3 — joins (J1-J10).

Scale notes: dimension joins (nation/region/customer-at-dim-scale) broadcast —
no fact-table shuffle; fact⋈fact joins (lineitem⋈orders) shuffle on the join
key, the same key a bucketed 100 TB layout would co-partition on, so Catalyst
elides the shuffle when bucketing metadata is present. The as-of join (J10)
is a single-shuffle union+window, not a range join.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from ai_to_cvent_etl_spark.io import load_table
from ai_to_cvent_etl_spark.operators.asof import asof_join
from ai_to_cvent_etl_spark.queries._util import disc_price, ORACLE_DISC_PRICE
from ai_to_cvent_etl_spark.registry import register
from pyspark.sql import DataFrame, SparkSession, Window
from pyspark.sql.types import DecimalType
import pandas as pd
from ai_to_cvent_etl_spark.queries._util import dec2


@register(
    "q_join_inner_equi",
    oracle="""
        SELECT o.o_orderkey, o.o_totalprice, c.c_custkey, c.c_name, c.c_mktsegment
        FROM orders o JOIN customer c ON o.o_custkey = c.c_custkey
    """,
    section="J1",
)
def q_join_inner_equi(spark: SparkSession, sf_dir: str) -> DataFrame:
    orders = load_table(spark, sf_dir, "orders")
    customer = load_table(spark, sf_dir, "customer")
    return orders.join(
        customer, orders.o_custkey == customer.c_custkey, "inner"
    ).select("o_orderkey", "o_totalprice", "c_custkey", "c_name", "c_mktsegment")


@register(
    "q_join_star_5way",
    oracle=f"""
        SELECT r.r_name,
               CAST(SUM({ORACLE_DISC_PRICE}) AS DOUBLE) AS revenue,
               CAST(COUNT(*) AS BIGINT) AS n_lines
        FROM lineitem l
        JOIN orders o    ON l.l_orderkey = o.o_orderkey
        JOIN customer c  ON o.o_custkey = c.c_custkey
        JOIN nation n    ON c.c_nationkey = n.n_nationkey
        JOIN region r    ON n.n_regionkey = r.r_regionkey
        GROUP BY r.r_name
    """,
    section="J2",
    doc="Flagship star join: revenue per region over 5 tables.",
)
def q_join_star_5way(spark: SparkSession, sf_dir: str) -> DataFrame:
    lineitem = load_table(spark, sf_dir, "lineitem")
    orders = load_table(spark, sf_dir, "orders")
    customer = load_table(spark, sf_dir, "customer")
    nation = load_table(spark, sf_dir, "nation")
    region = load_table(spark, sf_dir, "region")
    return (
        lineitem.join(orders, F.col("l_orderkey") == F.col("o_orderkey"))
        .join(customer, F.col("o_custkey") == F.col("c_custkey"))
        .join(F.broadcast(nation), F.col("c_nationkey") == F.col("n_nationkey"))
        .join(F.broadcast(region), F.col("n_regionkey") == F.col("r_regionkey"))
        .groupBy("r_name")
        .agg(
            F.sum(disc_price()).cast("double").alias("revenue"),
            F.count(F.lit(1)).alias("n_lines"),
        )
    )


@register(
    "q_join_left_outer",
    oracle="""
        SELECT c.c_custkey, c.c_name,
               CAST(COUNT(o.o_orderkey) AS BIGINT) AS n_orders
        FROM customer c LEFT JOIN orders o ON c.c_custkey = o.o_custkey
        GROUP BY c.c_custkey, c.c_name
    """,
    section="J3",
    doc="LEFT JOIN preserving order-less customers (count 0 via COUNT(col)).",
)
def q_join_left_outer(spark: SparkSession, sf_dir: str) -> DataFrame:
    customer = load_table(spark, sf_dir, "customer")
    orders = load_table(spark, sf_dir, "orders")
    return (
        customer.join(orders, customer.c_custkey == orders.o_custkey, "left")
        .groupBy("c_custkey", "c_name")
        .agg(F.count(F.col("o_orderkey")).alias("n_orders"))
    )


@register(
    "q_join_full_outer",
    oracle="""
        SELECT COALESCE(a.o_orderkey, b.o_orderkey) AS orderkey,
               a.o_totalprice AS price_f, b.o_totalprice AS price_o
        FROM (SELECT o_orderkey, o_totalprice FROM orders WHERE o_orderstatus = 'F') a
        FULL OUTER JOIN
             (SELECT o_orderkey, o_totalprice FROM orders WHERE o_orderstatus = 'O') b
        ON a.o_orderkey = b.o_orderkey
    """,
    section="J4",
    doc="FULL OUTER over disjoint key sets -> NULLs on both sides.",
)
def q_join_full_outer(spark: SparkSession, sf_dir: str) -> DataFrame:
    orders = load_table(spark, sf_dir, "orders")
    a = orders.filter(F.col("o_orderstatus") == "F").select(
        "o_orderkey", "o_totalprice"
    )
    b = orders.filter(F.col("o_orderstatus") == "O").select(
        F.col("o_orderkey").alias("b_orderkey"),
        F.col("o_totalprice").alias("b_totalprice"),
    )
    return a.join(b, a.o_orderkey == b.b_orderkey, "full").select(
        F.coalesce(F.col("o_orderkey"), F.col("b_orderkey")).alias("orderkey"),
        F.col("o_totalprice").alias("price_f"),
        F.col("b_totalprice").alias("price_o"),
    )


@register(
    "q_join_semi",
    oracle="""
        SELECT c_custkey, c_name FROM customer c
        WHERE EXISTS (SELECT 1 FROM orders o WHERE o.o_custkey = c.c_custkey)
    """,
    section="J5",
)
def q_join_semi(spark: SparkSession, sf_dir: str) -> DataFrame:
    customer = load_table(spark, sf_dir, "customer")
    orders = load_table(spark, sf_dir, "orders")
    return customer.join(
        orders, customer.c_custkey == orders.o_custkey, "left_semi"
    ).select("c_custkey", "c_name")


@register(
    "q_join_anti",
    oracle="""
        SELECT c_custkey, c_name FROM customer c
        WHERE NOT EXISTS (
            SELECT 1 FROM orders o
            WHERE o.o_custkey = c.c_custkey
              AND o.o_orderdate >= '1996-01-01' AND o.o_orderdate < '1997-01-01'
        )
    """,
    section="J6",
    doc="Anti join — the ETL missing-rows diff pattern. The right side is a "
    "filtered orders slice (customers with no 1996 order) so the result is "
    "non-empty at every scale factor: every customer has >=1 order overall "
    "in this data, which made the unfiltered form a vacuous 0-row check.",
)
def q_join_anti(spark: SparkSession, sf_dir: str) -> DataFrame:
    customer = load_table(spark, sf_dir, "customer")
    orders = load_table(spark, sf_dir, "orders").filter(
        (F.col("o_orderdate") >= "1996-01-01") & (F.col("o_orderdate") < "1997-01-01")
    )
    return customer.join(
        orders, customer.c_custkey == orders.o_custkey, "left_anti"
    ).select("c_custkey", "c_name")


@register(
    "q_join_broadcast",
    oracle="""
        SELECT n.n_nationkey, n.n_name, r.r_regionkey, r.r_name
        FROM nation n JOIN region r ON n.n_regionkey = r.r_regionkey
    """,
    section="J7",
    doc="Explicit broadcast-hash join on the tiny dimension.",
)
def q_join_broadcast(spark: SparkSession, sf_dir: str) -> DataFrame:
    nation = load_table(spark, sf_dir, "nation")
    region = load_table(spark, sf_dir, "region")
    return nation.join(
        F.broadcast(region), nation.n_regionkey == region.r_regionkey
    ).select("n_nationkey", "n_name", "r_regionkey", "r_name")


@register(
    "q_join_cross",
    oracle="""
        SELECT r.r_name, n.n_name, r.r_name || '/' || n.n_name AS pair
        FROM region r CROSS JOIN nation n
    """,
    section="J8",
)
def q_join_cross(spark: SparkSession, sf_dir: str) -> DataFrame:
    region = load_table(spark, sf_dir, "region")
    nation = load_table(spark, sf_dir, "nation")
    return region.crossJoin(nation).select(
        "r_name",
        "n_name",
        F.concat(F.col("r_name"), F.lit("/"), F.col("n_name")).alias("pair"),
    )


@register(
    "q_join_theta_range",
    oracle="""
        SELECT l.l_orderkey, l.l_linenumber, p.p_partkey, l.l_quantity, p.p_size
        FROM lineitem l
        JOIN part p ON l.l_partkey = p.p_partkey
                   AND l.l_quantity BETWEEN p.p_size - 5 AND p.p_size + 5
    """,
    section="J9",
    doc="equi + range theta predicate: hash join with residual filter.",
)
def q_join_theta_range(spark: SparkSession, sf_dir: str) -> DataFrame:
    lineitem = load_table(spark, sf_dir, "lineitem")
    part = load_table(spark, sf_dir, "part")
    return lineitem.join(
        part,
        (F.col("l_partkey") == F.col("p_partkey"))
        & F.col("l_quantity").between(F.col("p_size") - 5, F.col("p_size") + 5),
    ).select("l_orderkey", "l_linenumber", "p_partkey", "l_quantity", "p_size")


@register(
    "q_join_asof",
    oracle="""
        SELECT l.event_id, l.user_id, l.ts,
               r.event_id_matched, r.ts_matched
        FROM (SELECT event_id, user_id, ts FROM events WHERE event_type = 'purchase') l
        ASOF LEFT JOIN (
            SELECT event_id AS event_id_matched, ts AS ts_matched, user_id
            FROM events WHERE event_type <> 'purchase'
        ) r ON l.user_id = r.user_id AND l.ts >= r.ts_matched
    """,
    section="J10",
    doc="As-of join: latest prior non-purchase event per purchase "
    "(union+window implementation, operators/asof.py).",
)
def q_join_asof(spark: SparkSession, sf_dir: str) -> DataFrame:
    events = load_table(spark, sf_dir, "events")
    purchases = events.filter(F.col("event_type") == "purchase").select(
        "event_id", "user_id", "ts"
    )
    others = events.filter(F.col("event_type") != "purchase").select(
        "event_id", "user_id", "ts"
    )
    return asof_join(
        purchases,
        others,
        on="ts",
        by="user_id",
        right_payload=["event_id", "ts"],
        tiebreak="event_id",
    )


# ==== from analytics_r3b ===========================================

@register(
    "q_join_asof_nearest",
    oracle="""
        WITH l AS (
            SELECT event_id, user_id, ts FROM events
            WHERE event_type = 'purchase'
        ),
        r AS (
            SELECT event_id, user_id, ts FROM events
            WHERE event_type <> 'purchase'
        ),
        bwd AS (
            SELECT * FROM (
                SELECT l.event_id, l.user_id, l.ts,
                       r.event_id AS b_id, r.ts AS b_ts,
                       ROW_NUMBER() OVER (PARTITION BY l.event_id
                           ORDER BY r.ts DESC, r.event_id DESC) AS rn
                FROM l LEFT JOIN r
                  ON l.user_id = r.user_id AND r.ts <= l.ts
            ) WHERE rn = 1
        ),
        fwd AS (
            SELECT * FROM (
                SELECT l.event_id,
                       r.event_id AS f_id, r.ts AS f_ts,
                       ROW_NUMBER() OVER (PARTITION BY l.event_id
                           ORDER BY r.ts ASC, r.event_id ASC) AS rn
                FROM l LEFT JOIN r
                  ON l.user_id = r.user_id AND r.ts >= l.ts
            ) WHERE rn = 1
        )
        SELECT b.event_id, b.user_id, b.ts,
               CASE WHEN f.f_id IS NULL THEN b.b_id
                    WHEN b.b_id IS NULL THEN f.f_id
                    WHEN epoch_us(b.ts) - epoch_us(b.b_ts)
                         <= epoch_us(f.f_ts) - epoch_us(b.ts) THEN b.b_id
                    ELSE f.f_id END AS matched_id,
               CASE WHEN f.f_id IS NULL THEN b.b_ts
                    WHEN b.b_id IS NULL THEN f.f_ts
                    WHEN epoch_us(b.ts) - epoch_us(b.b_ts)
                         <= epoch_us(f.f_ts) - epoch_us(b.ts) THEN b.b_ts
                    ELSE f.f_ts END AS matched_ts,
               CASE WHEN f.f_id IS NULL AND b.b_id IS NULL THEN 'none'
                    WHEN f.f_id IS NULL THEN 'backward'
                    WHEN b.b_id IS NULL THEN 'forward'
                    WHEN epoch_us(b.ts) - epoch_us(b.b_ts)
                         <= epoch_us(f.f_ts) - epoch_us(b.ts) THEN 'backward'
                    ELSE 'forward' END AS direction
        FROM bwd b JOIN fwd f ON f.event_id = b.event_id
    """,
    section="J17",
    doc="NEAREST as-of join (pandas merge_asof direction='nearest'): the "
    "closest non-purchase event per purchase in either time direction, "
    "ties preferring backward (pandas semantics). Composed from the "
    "backward (J10) and forward (J13) union+window as-of operators — two "
    "by-key window shuffles + one equi-join on the left key; BIGINT-"
    "microsecond distances, exact. Completes the as-of family: "
    "backward/forward/nearest.",
)
def q_join_asof_nearest(spark: SparkSession, sf_dir: str) -> DataFrame:
    from ai_to_cvent_etl_spark.operators.asof import asof_join

    events = load_table(spark, sf_dir, "events")
    purchases = events.filter(F.col("event_type") == "purchase").select(
        "event_id", "user_id", "ts"
    )
    others = events.filter(F.col("event_type") != "purchase").select(
        "event_id", "user_id", "ts"
    )
    bwd = asof_join(
        purchases, others, on="ts", by="user_id",
        right_payload=["event_id", "ts"], tiebreak="event_id",
    ).select(
        "event_id", "user_id", "ts",
        F.col("event_id_matched").alias("b_id"),
        F.col("ts_matched").alias("b_ts"),
    )
    fwd = asof_join(
        purchases, others, on="ts", by="user_id",
        right_payload=["event_id", "ts"], tiebreak="event_id",
        direction="forward",
    ).select(
        F.col("event_id").alias("f_event_id"),
        F.col("event_id_matched").alias("f_id"),
        F.col("ts_matched").alias("f_ts"),
    )
    j = bwd.join(fwd, bwd.event_id == fwd.f_event_id)
    db = F.unix_micros("ts") - F.unix_micros("b_ts")
    df2 = F.unix_micros("f_ts") - F.unix_micros("ts")
    pick_b = F.col("f_id").isNull() | (
        F.col("b_id").isNotNull() & (db <= df2)
    )
    return j.select(
        "event_id",
        "user_id",
        "ts",
        F.when(pick_b, F.col("b_id")).otherwise(F.col("f_id")).alias(
            "matched_id"
        ),
        F.when(pick_b, F.col("b_ts")).otherwise(F.col("f_ts")).alias(
            "matched_ts"
        ),
        F.when(
            F.col("b_id").isNull() & F.col("f_id").isNull(), F.lit("none")
        )
        .when(pick_b, F.lit("backward"))
        .otherwise(F.lit("forward"))
        .alias("direction"),
    )

# ==== from analytics_r3g ===========================================

_EXISTS_SQL = """
    SELECT c.c_custkey, c.c_mktsegment
    FROM customer c
    WHERE EXISTS (
        SELECT 1 FROM orders o
        WHERE o.o_custkey = c.c_custkey
          AND o.o_orderpriority = '1-URGENT' AND o.o_orderstatus = 'O'
    )
    AND NOT EXISTS (
        SELECT 1 FROM orders o
        WHERE o.o_custkey = c.c_custkey
          AND o.o_orderpriority = '5-LOW'
    )
"""

@register(
    "q_join_exists_correlated",
    oracle=_EXISTS_SQL,
    section="J19",
    doc="Correlated EXISTS + NOT EXISTS subqueries run through "
    "spark.sql: customers with an open urgent order and no low-priority "
    "order. Catalyst rewrites the pair to a semi join + anti join on the "
    "filtered orders slices — the correlated-subquery planning path that "
    "P6's (NOT) IN rewrite does not cover (EXISTS has no null-aware "
    "special case). The identical ANSI text runs verbatim on DuckDB.",
)
def q_join_exists_correlated(spark: SparkSession, sf_dir: str) -> DataFrame:
    for t in ("customer", "orders"):
        load_table(spark, sf_dir, t).createOrReplaceTempView(t)
    return spark.sql(_EXISTS_SQL)

# ==== from analytics_r3h ===========================================

_LATERAL_SQL = """
    SELECT c.c_custkey, c.c_mktsegment,
           l.o_orderkey, l.o_orderdate, l.o_totalprice
    FROM customer c,
    LATERAL (
        SELECT o_orderkey, o_orderdate, o_totalprice
        FROM orders o
        WHERE o.o_custkey = c.c_custkey
        ORDER BY o_orderdate DESC, o_orderkey DESC
        LIMIT 2
    ) l
    WHERE c.c_mktsegment = 'AUTOMOBILE'
"""

@register(
    "q_join_lateral_topk",
    oracle=_LATERAL_SQL,
    section="J20",
    doc="Correlated LATERAL subquery with ORDER BY ... LIMIT: the two "
    "latest orders per AUTOMOBILE customer — the lateral-join planning "
    "path (Catalyst rewrites the correlated limit to a partitioned "
    "window/rank over the orders side: one keyed shuffle, never a "
    "per-row subquery execution). Identical ANSI text on both engines; "
    "the per-customer order ends in the unique order key.",
)
def q_join_lateral_topk(spark: SparkSession, sf_dir: str) -> DataFrame:
    for t in ("customer", "orders"):
        load_table(spark, sf_dir, t).createOrReplaceTempView(t)
    return spark.sql(_LATERAL_SQL)

# ==== from analytics_r3k ===========================================

_NULL_SAFE_ORACLE = """
    WITH grp AS (
        SELECT NULLIF(o_orderstatus, 'O') AS nk,
               CAST(SUM(CAST(o_totalprice AS DECIMAL(18,2))) AS DOUBLE)
                   AS grp_rev,
               CAST(COUNT(*) AS BIGINT) AS grp_n
        FROM orders GROUP BY 1
    )
    SELECT o.o_orderkey, NULLIF(o.o_orderstatus, 'O') AS nk,
           g.grp_rev, g.grp_n
    FROM orders o
    JOIN grp g ON NULLIF(o.o_orderstatus, 'O') IS NOT DISTINCT FROM g.nk
    WHERE o.o_orderkey % 100 = 0
"""

@register(
    "q_join_null_safe",
    oracle=_NULL_SAFE_ORACLE,
    section="J18",
    doc="Null-safe equi-join (Spark <=> / SQL IS NOT DISTINCT FROM): the "
    "dominant 'O' status is NULLIF'd to NULL on both sides, so a plain "
    "equi-join would silently drop every such row while the null-safe "
    "variant matches them to the NULL group — a real physical-join "
    "variant (Spark plans EqualNullSafe as a hash join key, not a theta "
    "join). Probe side is a 1-percent keyed sample; build side is a 3-row "
    "per-status aggregate the size-based planner broadcasts unhinted.",
)
def q_join_null_safe(spark: SparkSession, sf_dir: str) -> DataFrame:
    o = load_table(spark, sf_dir, "orders")
    nk = F.nullif(F.col("o_orderstatus"), F.lit("O"))
    grp = o.groupBy(nk.alias("nk")).agg(
        F.sum(dec2(F.col("o_totalprice"))).cast("double").alias("grp_rev"),
        F.count(F.lit(1)).alias("grp_n"),
    )
    probe = o.where(F.col("o_orderkey") % 100 == 0).select(
        "o_orderkey", nk.alias("nk")
    )
    return probe.join(grp, probe.nk.eqNullSafe(grp.nk)).select(
        probe.o_orderkey, probe.nk, grp.grp_rev, grp.grp_n
    )

# ==== from analytics_r3v ===========================================

_GRID = 200     # coordinate domain [0, _GRID)

_CELL = 4       # cell edge; 3x3 neighborhood covers Chebyshev radius <= 4

_RADIUS = 3

@register(
    "q_join_spatial_grid",
    oracle=f"""
        WITH pts AS (
            SELECT c_custkey AS k,
                   (c_custkey * 37) % {_GRID} AS x,
                   (c_custkey * 91) % {_GRID} AS y
            FROM customer
        ),
        probe AS (
            SELECT k, x, y,
                   (x // {_CELL} + dx.d) AS cx,
                   (y // {_CELL} + dy.d) AS cy
            FROM pts,
                 (SELECT unnest([-1, 0, 1]) AS d) dx,
                 (SELECT unnest([-1, 0, 1]) AS d) dy
        ),
        build AS (
            SELECT k, x, y, x // {_CELL} AS cx, y // {_CELL} AS cy
            FROM pts
        )
        SELECT p.k AS k_lo, b.k AS k_hi,
               CAST(greatest(abs(p.x - b.x), abs(p.y - b.y)) AS BIGINT)
                   AS cheb
        FROM probe p
        JOIN build b ON b.cx = p.cx AND b.cy = p.cy AND b.k > p.k
        WHERE abs(p.x - b.x) <= {_RADIUS} AND abs(p.y - b.y) <= {_RADIUS}
    """,
    section="J21",
    doc="Grid-blocked spatial self-join: customers placed on a "
    f"{_GRID}×{_GRID} plane by deterministic coordinates, all pairs "
    f"within Chebyshev distance {_RADIUS} found by joining each "
    "point's 3×3 neighbor-cell keys against the build side's unique "
    "cell — each qualifying pair emitted EXACTLY once (only the probe "
    "side explodes, the build cell is unique), no pair-distinct pass. "
    "The distributed spatial-join pattern: one keyed shuffle on cell "
    "id, quadratic work confined to (cell, neighbor) buckets — never "
    "an unblocked cross join; at 100 TB hot cells take D1's bucket "
    "cap or J15's salting, and cell size trades the ×9 probe "
    "replication against per-cell pair cost.",
)
def q_join_spatial_grid(spark: SparkSession, sf_dir: str) -> DataFrame:
    c = load_table(spark, sf_dir, "customer")
    pts = c.select(
        F.col("c_custkey").alias("k"),
        ((F.col("c_custkey") * 37) % _GRID).alias("x"),
        ((F.col("c_custkey") * 91) % _GRID).alias("y"),
    )
    d = F.array(F.lit(-1), F.lit(0), F.lit(1))
    probe = pts.select(
        "k",
        "x",
        "y",
        F.explode(d).alias("dx"),
    ).select(
        "k",
        "x",
        "y",
        F.explode(d).alias("dy"),
        F.col("dx"),
    ).select(
        "k",
        "x",
        "y",
        (F.expr(f"x DIV {_CELL}") + F.col("dx")).alias("cx"),
        (F.expr(f"y DIV {_CELL}") + F.col("dy")).alias("cy"),
    )
    build = pts.select(
        F.col("k").alias("bk"),
        F.col("x").alias("bx"),
        F.col("y").alias("by"),
        F.expr(f"x DIV {_CELL}").alias("cx"),
        F.expr(f"y DIV {_CELL}").alias("cy"),
    )
    j = probe.join(build, ["cx", "cy"]).where(F.col("bk") > F.col("k"))
    dx = F.abs(F.col("x") - F.col("bx"))
    dy = F.abs(F.col("y") - F.col("by"))
    return j.where((dx <= _RADIUS) & (dy <= _RADIUS)).select(
        F.col("k").alias("k_lo"),
        F.col("bk").alias("k_hi"),
        F.greatest(dx, dy).cast("long").alias("cheb"),
    )

# ==== from analytics_r3y ===========================================

_RATES = [
    # (status, year, fee_bps) — specific rules
    ("F", 1996, 25),
    ("F", 1997, 30),
    ("O", 1996, 40),
    ("P", 1995, 10),
]

_DEFAULTS = [("F", 20), ("O", 35), ("P", 15)]  # status-level fallback

@register(
    "q_join_waterfall",
    oracle=f"""
        WITH rates AS (
            SELECT * FROM (VALUES
                {', '.join(f"('{s}', {y}, {b})" for s, y, b in _RATES)}
            ) t(st, yr, fee_bps)
        ),
        defaults AS (
            SELECT * FROM (VALUES
                {', '.join(f"('{s}', {b})" for s, b in _DEFAULTS)}
            ) t(st, fee_bps)
        )
        , resolved AS (
            SELECT o.o_orderstatus,
                   CAST(date_part('year', o.o_orderdate) AS INT) AS yr,
                   CAST(o.o_totalprice AS DECIMAL(18,2)) AS price,
                   coalesce(r.fee_bps, d.fee_bps) AS fee
            FROM orders o
            LEFT JOIN rates r
                   ON r.st = o.o_orderstatus
                  AND r.yr = CAST(date_part('year', o.o_orderdate) AS INT)
            LEFT JOIN defaults d ON d.st = o.o_orderstatus
        )
        SELECT o_orderstatus, yr,
               CAST(COUNT(*) AS BIGINT) AS n_orders,
               CAST(MIN(fee) AS INT) AS fee_bps,
               CAST(SUM(price * fee) AS DOUBLE) / 10000.0 AS fee_total
        FROM resolved
        GROUP BY o_orderstatus, yr
    """,
    section="J22",
    doc="Waterfall (hierarchical fallback) join — the pricing/MDM match "
    "pattern: each order takes the most specific matching rate, "
    "(status, year) first, falling back to the status-level default "
    "via coalesce over two LEFT joins; per (status, year): order "
    "counts, the resolved rate, and the exact decimal fee total. Both "
    "rule tables are literals (broadcast by construction); the fact "
    "side is scanned ONCE and never rescanned per tier — the fallback "
    "hierarchy is joins + coalesce, not a UNION of filtered rescans. "
    "Rates are unique per key, so MIN() inside the group is exact "
    "passthrough.",
)
def q_join_waterfall(spark: SparkSession, sf_dir: str) -> DataFrame:
    orders = load_table(spark, sf_dir, "orders")
    rates = orders.sparkSession.createDataFrame(
        _RATES, "r_st string, r_yr int, r_fee int"
    )
    defaults = orders.sparkSession.createDataFrame(
        _DEFAULTS, "d_st string, d_fee int"
    )
    o = orders.withColumn("yr", F.year("o_orderdate").cast("int"))
    j = (
        o.join(
            F.broadcast(rates),
            (F.col("o_orderstatus") == F.col("r_st"))
            & (F.col("yr") == F.col("r_yr")),
            "left",
        )
        .join(
            F.broadcast(defaults),
            F.col("o_orderstatus") == F.col("d_st"),
            "left",
        )
    )
    fee = F.min(F.coalesce(F.col("r_fee"), F.col("d_fee")))
    return j.groupBy("o_orderstatus", "yr").agg(
        F.count("*").alias("n_orders"),
        fee.cast("int").alias("fee_bps"),
        (
            F.sum(
                F.col("o_totalprice").cast("decimal(18,2)")
                * F.coalesce(F.col("r_fee"), F.col("d_fee"))
            ).cast("double")
            / 10000.0
        ).alias("fee_total"),
    )

# ==== from analytics_r4g ===========================================

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

# ==== from analytics_r4k ===========================================

@register(
    "q_join_role_playing",
    oracle="""
        WITH bounds AS (
            SELECT CAST(MIN(o_orderdate) AS DATE) AS lo,
                   CAST(MAX(o_orderdate) AS DATE) + 45 AS hi
            FROM orders
        ),
        date_dim AS (
            SELECT CAST(d.d AS DATE) AS dkey,
                   CAST(date_part('year', d.d) AS INT) AS yr,
                   CAST(date_part('quarter', d.d) AS INT) AS qtr,
                   monthname(CAST(d.d AS DATE)) AS month_name
            FROM bounds, unnest(generate_series(
                 bounds.lo, bounds.hi, INTERVAL 1 DAY)) AS d(d)
        )
        SELECT o.o_orderkey,
               od.yr AS order_year,
               od.month_name AS order_month,
               dd.qtr AS due_quarter,
               dd.month_name AS due_month,
               od.yr = dd.yr AS same_year
        FROM orders o
        JOIN date_dim od ON od.dkey = CAST(o.o_orderdate AS DATE)
        JOIN date_dim dd
          ON dd.dkey = CAST(o.o_orderdate AS DATE) + 45
    """,
    section="J24",
    doc="The role-playing dimension pattern: ONE date dimension "
    "(generated from the data's own bounds — F22's rule) joined TWICE "
    "in different roles — order date and the +45-day due date — with "
    "per-role aliased attributes (order_year/order_month vs "
    "due_quarter/due_month; without the aliases the role columns "
    "silently collide, the classic star-schema modeling bug). Both "
    "role joins broadcast the same ~2.5k-row dimension — N roles cost "
    "N broadcast joins of one physical table, zero extra storage, at "
    "any fact scale.",
)
def q_join_role_playing(spark: SparkSession, sf_dir: str) -> DataFrame:
    orders = load_table(spark, sf_dir, "orders")
    bounds = orders.agg(
        F.min(F.col("o_orderdate").cast("date")).alias("lo"),
        F.date_add(F.max(F.col("o_orderdate").cast("date")), 45).alias("hi"),
    )
    date_dim = bounds.select(
        F.explode(
            F.sequence(F.col("lo"), F.col("hi"), F.expr("INTERVAL 1 DAY"))
        ).alias("dkey")
    ).select(
        "dkey",
        F.year("dkey").cast("int").alias("yr"),
        F.quarter("dkey").cast("int").alias("qtr"),
        F.date_format("dkey", "MMMM").alias("month_name"),
    )
    od = date_dim.select(
        F.col("dkey").alias("od_key"),
        F.col("yr").alias("order_year"),
        F.col("month_name").alias("order_month"),
    )
    dd = date_dim.select(
        F.col("dkey").alias("dd_key"),
        F.col("yr").alias("due_yr"),
        F.col("qtr").alias("due_quarter"),
        F.col("month_name").alias("due_month"),
    )
    o = orders.select(
        "o_orderkey",
        F.col("o_orderdate").cast("date").alias("odate"),
        F.date_add(F.col("o_orderdate").cast("date"), 45).alias("ddate"),
    )
    return (
        o.join(F.broadcast(od), o.odate == F.col("od_key"))
        .join(F.broadcast(dd), o.ddate == F.col("dd_key"))
        .select(
            "o_orderkey",
            "order_year",
            "order_month",
            "due_quarter",
            "due_month",
            (F.col("order_year") == F.col("due_yr")).alias("same_year"),
        )
    )

# ==== from analytics_r4n ===========================================

@register(
    "q_join_allocate_lines",
    oracle="""
        WITH fees AS (
            SELECT o_orderkey,
                   CAST(CAST(o_totalprice AS DECIMAL(18,2)) * 100
                        AS BIGINT) // 100 AS fee_cents
            FROM orders WHERE o_orderkey % 20 = 0
        ),
        lines AS (
            SELECT l.l_orderkey, l.l_linenumber, f.fee_cents,
                   CAST(CAST(l.l_extendedprice AS DECIMAL(18,2)) * 100
                        AS BIGINT) AS line_cents,
                   CAST(SUM(CAST(CAST(l.l_extendedprice AS DECIMAL(18,2))
                                 * 100 AS BIGINT))
                        OVER (PARTITION BY l.l_orderkey) AS BIGINT)
                       AS order_cents
            FROM lineitem l JOIN fees f ON f.o_orderkey = l.l_orderkey
        ),
        based AS (
            SELECT l_orderkey, l_linenumber, fee_cents,
                   CAST(floor(CAST(line_cents AS DOUBLE) / order_cents
                              * fee_cents) AS BIGINT) AS base,
                   CAST(line_cents AS DOUBLE) / order_cents * fee_cents
                   - floor(CAST(line_cents AS DOUBLE) / order_cents
                           * fee_cents) AS rem
            FROM lines
        ),
        ranked AS (
            SELECT l_orderkey, l_linenumber, base,
                   row_number() OVER (
                       PARTITION BY l_orderkey
                       ORDER BY rem DESC, l_linenumber
                   ) AS rnk,
                   CAST(fee_cents - SUM(base) OVER (PARTITION BY l_orderkey)
                        AS BIGINT) AS shortfall
            FROM based
        )
        SELECT l_orderkey, l_linenumber,
               CAST(base + CASE WHEN rnk <= shortfall THEN 1 ELSE 0 END
                    AS BIGINT) AS line_fee_cents
        FROM ranked
    """,
    section="J25",
    doc="Grain-spreading allocation: each sampled order's 1% fee (exact "
    "integer cents) spread across its OWN lineitems proportional to "
    "extended price, with PER-ORDER largest-remainder rounding "
    "(Hamilton's method, A49's device applied per group): floor "
    "bases, then the order's shortfall cents to its largest "
    "fractional remainders (line-number tie-break) — so every order's "
    "line fees sum EXACTLY to its fee and reconciliation (J23) closes "
    "without tolerances. The header-to-line allocation every billing "
    "ETL performs; naive per-line rounding leaves per-order drift "
    "that compounds forever. One co-keyed join + per-order windows — "
    "the allocation never shuffles twice.",
)
def q_join_allocate_lines(spark: SparkSession, sf_dir: str) -> DataFrame:
    orders = load_table(spark, sf_dir, "orders")
    li = load_table(spark, sf_dir, "lineitem")
    fees = orders.where(F.col("o_orderkey") % 20 == 0).select(
        "o_orderkey",
        F.expr(
            "CAST(CAST(o_totalprice AS DECIMAL(18,2)) * 100 AS BIGINT)"
            " DIV 100"
        ).alias("fee_cents"),
    )
    lines = li.join(fees, li.l_orderkey == fees.o_orderkey).select(
        "l_orderkey",
        "l_linenumber",
        "fee_cents",
        F.expr(
            "CAST(CAST(l_extendedprice AS DECIMAL(18,2)) * 100 AS BIGINT)"
        ).alias("line_cents"),
    )
    wo = Window.partitionBy("l_orderkey")
    lines = lines.withColumn("order_cents", F.sum("line_cents").over(wo))
    raw = (
        F.col("line_cents").cast("double")
        / F.col("order_cents")
        * F.col("fee_cents")
    )
    based = lines.select(
        "l_orderkey",
        "l_linenumber",
        "fee_cents",
        F.floor(raw).cast("long").alias("base"),
        (raw - F.floor(raw)).alias("rem"),
    )
    ranked = based.select(
        "l_orderkey",
        "l_linenumber",
        "base",
        F.row_number()
        .over(
            Window.partitionBy("l_orderkey").orderBy(
                F.desc("rem"), F.asc("l_linenumber")
            )
        )
        .alias("rnk"),
        (F.col("fee_cents") - F.sum("base").over(wo)).alias("shortfall"),
    )
    return ranked.select(
        "l_orderkey",
        "l_linenumber",
        (
            F.col("base")
            + F.when(F.col("rnk") <= F.col("shortfall"), 1).otherwise(0)
        ).cast("long").alias("line_fee_cents"),
    )


@register(
    "q_join_grid_knn",
    oracle=f"""
        WITH pts AS (
            SELECT c_custkey AS k,
                   (c_custkey * 37) % {_GRID} AS x,
                   (c_custkey * 91) % {_GRID} AS y
            FROM customer
        ),
        probe AS (
            SELECT k, x, y,
                   (x // {_CELL} + dx.d) AS cx,
                   (y // {_CELL} + dy.d) AS cy
            FROM pts,
                 (SELECT unnest([-1, 0, 1]) AS d) dx,
                 (SELECT unnest([-1, 0, 1]) AS d) dy
        ),
        build AS (
            SELECT k, x, y, x // {_CELL} AS cx, y // {_CELL} AS cy
            FROM pts
        ),
        cand AS (
            SELECT p.k, b.k AS nk,
                   CAST((p.x - b.x) * (p.x - b.x)
                        + (p.y - b.y) * (p.y - b.y) AS BIGINT) AS d2
            FROM probe p
            JOIN build b ON b.cx = p.cx AND b.cy = p.cy AND b.k <> p.k
        )
        SELECT k, min_by(nk, d2 * 1000000000 + nk) AS nn_k,
               MIN(d2) AS dist2
        FROM cand
        GROUP BY k
    """,
    section="J26",
    doc="Grid-pruned nearest-neighbor join (spatial 1-NN): each point "
    "searches only its own grid cell plus the 8 surrounding cells "
    "(probe side explodes 9x — row-local — and equi-joins on the cell "
    "key), then an argmin per point over squared INTEGER distances "
    "with a composite integer argmin key (d2*1e9 + key — exact, tie-broken by key; key ids stay < 1e9). The k-NN sibling of J23's "
    "radius join and the relational form of what spatial indexes do: "
    "the cell equi-join turns the O(n²) all-pairs distance problem "
    "into a key-partitioned join whose cost is Σ|cell|² over "
    "neighborhoods — density-bounded, not corpus-bounded. CONTRACT "
    "(documented, oracle-mirrored): the neighbor is the nearest "
    "WITHIN the 3x3 ring — a point whose true nearest neighbor lies "
    "farther than one cell away drops out (on this density that set "
    "is empty; production kNN escalates ring radius for the "
    "remainder, a second cheap pass over the tiny unmatched set). "
    "All-integer geometry — zero float-parity surface. Scale: "
    "shuffles only on cell ids; skewed cells are the E12-diagnosed "
    "hazard and salt exactly like D1 buckets.",
)
def q_join_grid_knn(spark: SparkSession, sf_dir: str) -> DataFrame:
    cust = load_table(spark, sf_dir, "customer")
    pts = cust.select(
        F.col("c_custkey").alias("k"),
        ((F.col("c_custkey") * 37) % _GRID).alias("x"),
        ((F.col("c_custkey") * 91) % _GRID).alias("y"),
    )
    probe = pts.select(
        "k",
        "x",
        "y",
        F.explode(F.array(F.lit(-1), F.lit(0), F.lit(1))).alias("ddx"),
    ).select(
        "k",
        "x",
        "y",
        (F.expr(f"x div {_CELL}") + F.col("ddx")).alias("cx"),
        F.explode(F.array(F.lit(-1), F.lit(0), F.lit(1))).alias("ddy"),
    ).select(
        "k", "x", "y", "cx",
        (F.expr(f"y div {_CELL}") + F.col("ddy")).alias("cy"),
    )
    build = pts.select(
        F.col("k").alias("nk"),
        F.col("x").alias("bx"),
        F.col("y").alias("by"),
        F.expr(f"x div {_CELL}").alias("cx"),
        F.expr(f"y div {_CELL}").alias("cy"),
    )
    cand = probe.join(
        build,
        (probe.cx == build.cx)
        & (probe.cy == build.cy)
        & (F.col("k") != F.col("nk")),
    ).select(
        "k",
        "nk",
        (
            (F.col("x") - F.col("bx")) * (F.col("x") - F.col("bx"))
            + (F.col("y") - F.col("by")) * (F.col("y") - F.col("by"))
        )
        .cast("bigint")
        .alias("d2"),
    )
    return cand.groupBy("k").agg(
        F.expr("min_by(nk, d2 * 1000000000 + nk)").alias("nn_k"),
        F.min("d2").alias("dist2"),
    )


_ASOF_TOL_HOURS = 24


@register(
    "q_join_asof_tolerance",
    oracle=f"""
        WITH p AS (
            SELECT event_id, user_id, ts
            FROM events WHERE event_type = 'purchase'
        ),
        v AS (
            SELECT user_id, ts FROM events WHERE event_type = 'view'
        ),
        matched AS (
            SELECT p.event_id, p.user_id, p.ts,
                   MAX(v.ts) AS view_ts
            FROM p LEFT JOIN v
              ON v.user_id = p.user_id
             AND v.ts <= p.ts
             AND v.ts >= p.ts - INTERVAL {_ASOF_TOL_HOURS} HOUR
            GROUP BY p.event_id, p.user_id, p.ts
        )
        SELECT user_id,
               CAST(COUNT(*) AS BIGINT) AS n_purchases,
               CAST(SUM(CASE WHEN view_ts IS NOT NULL
                        THEN 1 ELSE 0 END) AS BIGINT) AS n_matched,
               CAST(SUM(CASE WHEN view_ts IS NOT NULL THEN
                    date_diff('second', view_ts, ts) END) AS BIGINT)
                   AS total_gap_seconds
        FROM matched GROUP BY user_id
        HAVING SUM(CASE WHEN view_ts IS NOT NULL
                   THEN 1 ELSE 0 END) > 0
    """,
    section="J27",
    doc=f"As-of join WITH TOLERANCE: each purchase matches its nearest "
    f"PRIOR view by the same user only if within {_ASOF_TOL_HOURS} "
    "hours — the bounded-staleness variant of J3's backward as-of "
    "(pandas merge_asof's `tolerance`): an unbounded as-of happily "
    "attributes a purchase to a view from last month, silently "
    "corrupting attribution; the tolerance bound is the fix, and "
    "rows that miss it surface in n_purchases - n_matched. "
    "Expressed as a range-bounded MAX aggregation (nearest = MAX ts "
    "under the band), which is exact and needs no row_number tie "
    "device; per-user match counts and exact second gaps reduce on "
    "top. Scale: the band join co-keys on user_id (both sides "
    "shuffle once on the same key); the time band bounds the per-"
    "user fan-out by the tolerance window — the J14 interval "
    "contract.",
)
def q_join_asof_tolerance(spark: SparkSession, sf_dir: str) -> DataFrame:
    ev = load_table(spark, sf_dir, "events")
    p = ev.where(F.col("event_type") == "purchase").select(
        "event_id", "user_id", "ts"
    )
    v = ev.where(F.col("event_type") == "view").select(
        F.col("user_id").alias("v_user"), F.col("ts").alias("v_ts")
    )
    matched = (
        p.join(
            v,
            (F.col("v_user") == F.col("user_id"))
            & (F.col("v_ts") <= F.col("ts"))
            & (
                F.col("v_ts")
                >= F.col("ts") - F.expr(f"INTERVAL {_ASOF_TOL_HOURS} HOURS")
            ),
            "left",
        )
        .groupBy("event_id", "user_id", "ts")
        .agg(F.max("v_ts").alias("view_ts"))
    )
    return (
        matched.groupBy("user_id")
        .agg(
            F.count(F.lit(1)).cast("bigint").alias("n_purchases"),
            F.sum(
                F.when(F.col("view_ts").isNotNull(), 1).otherwise(0)
            )
            .cast("bigint")
            .alias("n_matched"),
            F.sum(
                F.when(
                    F.col("view_ts").isNotNull(),
                    F.col("ts").cast("long") - F.col("view_ts").cast("long"),
                )
            )
            .cast("bigint")
            .alias("total_gap_seconds"),
        )
        .where(F.col("n_matched") > 0)
    )


# ---------------------------------------------------------------------------
# Wave 116 (r5): geodesic nearest-neighbor join.
# ---------------------------------------------------------------------------

_HAV_CELL_DEG = 10
_EARTH_KM = 6371.0

# Deterministic synthetic coordinates (0.5-degree lattice): lat/lon are
# exact binary doubles, so all RANKING arithmetic below is exact.
_CUST_LAT = "(CAST(c_custkey % 120 AS DOUBLE) / 2 - 30)"
_CUST_LON = "(CAST((c_custkey * 7) % 360 AS DOUBLE) / 2 - 90)"
_SUPP_LAT = "(CAST(s_suppkey % 120 AS DOUBLE) / 2 - 30)"
_SUPP_LON = "(CAST((s_suppkey * 13) % 360 AS DOUBLE) / 2 - 90)"


@register(
    "q_join_haversine_knn",
    oracle=f"""
        WITH cust AS (
            SELECT c_custkey, {_CUST_LAT} AS clat, {_CUST_LON} AS clon,
                   CAST(floor({_CUST_LAT} / {_HAV_CELL_DEG}) AS INTEGER)
                       AS cell_lat,
                   CAST(floor({_CUST_LON} / {_HAV_CELL_DEG}) AS INTEGER)
                       AS cell_lon
            FROM customer
        ),
        supp AS (
            SELECT s_suppkey, {_SUPP_LAT} AS slat, {_SUPP_LON} AS slon,
                   CAST(floor({_SUPP_LAT} / {_HAV_CELL_DEG}) AS INTEGER)
                       AS cell_lat,
                   CAST(floor({_SUPP_LON} / {_HAV_CELL_DEG}) AS INTEGER)
                       AS cell_lon
            FROM supplier
        ),
        ranked AS (
            SELECT c.c_custkey, s.s_suppkey, c.clat, c.clon,
                   s.slat, s.slon,
                   row_number() OVER (
                       PARTITION BY c.c_custkey
                       ORDER BY (c.clat - s.slat) * (c.clat - s.slat)
                              + (c.clon - s.slon) * (c.clon - s.slon),
                              s.s_suppkey) AS rnk
            FROM cust c
            JOIN supp s ON c.cell_lat = s.cell_lat
                       AND c.cell_lon = s.cell_lon
        )
        SELECT c_custkey, s_suppkey,
               ROUND(2 * {_EARTH_KM} * asin(sqrt(
                   pow(sin(radians(clat - slat) / 2), 2)
                   + cos(radians(clat)) * cos(radians(slat))
                     * pow(sin(radians(clon - slon) / 2), 2))), 4)
                   AS haversine_km
        FROM ranked WHERE rnk = 1
    """,
    section="J26",
    doc=f"Geodesic nearest-supplier join: customers and suppliers on "
    "deterministic 0.5-degree lattice coordinates, blocked into "
    f"{_HAV_CELL_DEG}-degree grid cells, nearest in-cell supplier per "
    "customer, reported with the true haversine distance. The "
    "determinism split is the point: RANKING uses the locally-flat "
    "squared-degree metric — exact double arithmetic on lattice "
    "coordinates, so the winner can never flip on a libm ulp — while "
    "the geodesic km (sin/cos/asin, engine-divergent in the last "
    "bit) only appears ROUND(4)-ed in the OUTPUT, never in a "
    "comparison. In-cell flat ranking agrees with in-cell great-"
    "circle ranking away from the poles at this cell size. Scale: "
    "the classic spatial-join shape (J24's grid device with a "
    "geodesic metric): one shuffle each side on the cell key, "
    "per-cell candidate lists, rank window partitioned by customer "
    "— no all-pairs stage anywhere; at 100 TB add neighbor-cell "
    "replication for border exactness (documented trade-off).",
)
def q_join_haversine_knn(spark: SparkSession, sf_dir: str) -> DataFrame:
    cust = load_table(spark, sf_dir, "customer").selectExpr(
        "c_custkey",
        f"{_CUST_LAT} AS clat",
        f"{_CUST_LON} AS clon",
        f"CAST(floor({_CUST_LAT} / {_HAV_CELL_DEG}) AS INT) AS cell_lat",
        f"CAST(floor({_CUST_LON} / {_HAV_CELL_DEG}) AS INT) AS cell_lon",
    )
    supp = load_table(spark, sf_dir, "supplier").selectExpr(
        "s_suppkey",
        f"{_SUPP_LAT} AS slat",
        f"{_SUPP_LON} AS slon",
        f"CAST(floor({_SUPP_LAT} / {_HAV_CELL_DEG}) AS INT) AS cell_lat",
        f"CAST(floor({_SUPP_LON} / {_HAV_CELL_DEG}) AS INT) AS cell_lon",
    )
    flat2 = (F.col("clat") - F.col("slat")) * (
        F.col("clat") - F.col("slat")
    ) + (F.col("clon") - F.col("slon")) * (F.col("clon") - F.col("slon"))
    ranked = (
        cust.join(F.broadcast(supp), ["cell_lat", "cell_lon"])
        .withColumn(
            "rnk",
            F.row_number().over(
                Window.partitionBy("c_custkey").orderBy(
                    flat2, "s_suppkey"
                )
            ),
        )
        .where(F.col("rnk") == 1)
    )
    hav = (
        2
        * _EARTH_KM
        * F.asin(
            F.sqrt(
                F.pow(
                    F.sin(F.radians(F.col("clat") - F.col("slat")) / 2), 2
                )
                + F.cos(F.radians("clat"))
                * F.cos(F.radians("slat"))
                * F.pow(
                    F.sin(F.radians(F.col("clon") - F.col("slon")) / 2),
                    2,
                )
            )
        )
    )
    return ranked.select(
        "c_custkey",
        "s_suppkey",
        F.round(hav, 4).alias("haversine_km"),
    )


# ==== wave 145b: Allen interval-relation census ====================


_ALLEN_CASE_SQL = """
    CASE
        WHEN e1 < s2 THEN 'before'
        WHEN e1 = s2 THEN 'meets'
        WHEN s1 < s2 AND e1 > s2 AND e1 < e2 THEN 'overlaps'
        WHEN s1 = s2 AND e1 < e2 THEN 'starts'
        WHEN s1 > s2 AND e1 < e2 THEN 'during'
        WHEN s1 > s2 AND e1 = e2 THEN 'finishes'
        WHEN s1 = s2 AND e1 = e2 THEN 'equals'
        WHEN s1 < s2 AND e1 = e2 THEN 'finished_by'
        WHEN s1 < s2 AND e1 > e2 THEN 'contains'
        WHEN s1 = s2 AND e1 > e2 THEN 'started_by'
        WHEN s1 > s2 AND s1 < e2 AND e1 > e2 THEN 'overlapped_by'
        WHEN s1 = e2 THEN 'met_by'
        ELSE 'after'
    END
"""


@register(
    "q_join_allen_census",
    oracle=f"""
        WITH spans AS (
            SELECT o.o_custkey, o.o_orderkey,
                   CAST(o.o_orderdate AS DATE) AS s,
                   CAST(MAX(l.l_shipdate) AS DATE) AS e
            FROM orders o JOIN lineitem l ON o.o_orderkey = l.l_orderkey
            GROUP BY o.o_custkey, o.o_orderkey, o.o_orderdate
            HAVING MAX(l.l_shipdate) >= o.o_orderdate
        ),
        pairs AS (
            SELECT a.s AS s1, a.e AS e1, b.s AS s2, b.e AS e2
            FROM spans a JOIN spans b
              ON a.o_custkey = b.o_custkey
             AND a.o_orderkey < b.o_orderkey
        )
        SELECT {_ALLEN_CASE_SQL} AS relation,
               CAST(COUNT(*) AS BIGINT) AS n_pairs
        FROM pairs
        GROUP BY 1
    """,
    section="J28",
    doc="Allen interval-relation census: every same-customer pair of "
    "order fulfillment spans classified into the THIRTEEN Allen "
    "relations (before/meets/overlaps/starts/during/finishes/equals "
    "+ inverses) and counted — the complete temporal-topology audit "
    "of which J14 (interval overlap) tests exactly one relation; the "
    "census tells a pipeline author which temporal join their data "
    "actually needs (e.g. mostly 'before' => an as-of join suffices; "
    "heavy 'during' => containment indexing). The classification is "
    "a mutually-exclusive exhaustive CASE over four date compares — "
    "pure integer logic, and the pair ordering (a.orderkey < "
    "b.orderkey) pins direction so each unordered pair is classified "
    "exactly once. Scale: pairs join on o_custkey (the natural "
    "blocking key — per-customer order counts are bounded), one "
    "13-row rollup; no global product.",
)
def q_join_allen_census(spark: SparkSession, sf_dir: str) -> DataFrame:
    orders = load_table(spark, sf_dir, "orders")
    li = load_table(spark, sf_dir, "lineitem")
    spans = (
        orders.join(li, orders.o_orderkey == li.l_orderkey)
        .groupBy("o_custkey", "o_orderkey", "o_orderdate")
        .agg(F.max("l_shipdate").cast("date").alias("e"))
        .where(F.col("e") >= F.col("o_orderdate").cast("date"))
        .select(
            "o_custkey",
            "o_orderkey",
            F.col("o_orderdate").cast("date").alias("s"),
            "e",
        )
    ).localCheckpoint(eager=False)
    a = spans.select(
        F.col("o_custkey").alias("ck"),
        F.col("o_orderkey").alias("ka"),
        F.col("s").alias("s1"),
        F.col("e").alias("e1"),
    )
    b = spans.select(
        F.col("o_custkey").alias("ck2"),
        F.col("o_orderkey").alias("kb"),
        F.col("s").alias("s2"),
        F.col("e").alias("e2"),
    )
    pairs = a.join(
        b, (F.col("ck") == F.col("ck2")) & (F.col("ka") < F.col("kb"))
    )
    return (
        pairs.select(F.expr(_ALLEN_CASE_SQL).alias("relation"))
        .groupBy("relation")
        .agg(F.count(F.lit(1)).cast("bigint").alias("n_pairs"))
    )


# ==== wave 171a: 1-D closest pair via sort adjacency ================


@register(
    "q_join_closest_pair_1d",
    oracle="""
        WITH pts AS (
            SELECT n.n_name AS nation, o.o_orderkey AS ok,
                   CAST(floor(o.o_totalprice * 100 + 0.5) AS BIGINT)
                       AS cents
            FROM orders o
            JOIN customer c ON o.o_custkey = c.c_custkey
            JOIN nation n ON c.c_nationkey = n.n_nationkey
        ),
        adj AS (
            SELECT nation,
                   LAG(cents) OVER w AS cents_a,
                   LAG(ok) OVER w AS ok_a,
                   cents AS cents_b, ok AS ok_b,
                   cents - LAG(cents) OVER w AS diff
            FROM pts
            WINDOW w AS (PARTITION BY nation ORDER BY cents, ok)
        ),
        ranked AS (
            SELECT nation, cents_a, ok_a, cents_b, ok_b, diff,
                   ROW_NUMBER() OVER (
                       PARTITION BY nation
                       ORDER BY diff, cents_a, ok_a, ok_b
                   ) AS rn
            FROM adj WHERE cents_a IS NOT NULL
        )
        SELECT nation,
               CAST(ok_a AS BIGINT) AS ok_a,
               CAST(ok_b AS BIGINT) AS ok_b,
               cents_a, cents_b,
               CAST(diff AS BIGINT) AS diff_cents
        FROM ranked WHERE rn = 1
    """,
    section="J26",
    doc="1-D closest pair per nation over order totals: the classic "
    "reduction — after sorting, the closest pair is ALWAYS an "
    "adjacent pair — turns an O(n^2) theta self-join into one "
    "window sort plus a LAG, the same shape divide-and-conquer "
    "closest-pair collapses to in one dimension. Sort key is "
    "(cents, orderkey) so equal-price adjacency is deterministic, "
    "and the winning pair is fully tie-broken (diff, cents_a, ok_a, "
    "ok_b). All integer cents. Scale: one sort per nation "
    "partition, map-side lag, 25 output rows; the anti-pattern "
    "this replaces (pairwise |a-b| join with a MIN) shuffles n^2 "
    "rows and is why 'closest pair' questions kill naive SQL at "
    "100 TB.",
)
def q_join_closest_pair_1d(spark: SparkSession, sf_dir: str) -> DataFrame:
    orders = load_table(spark, sf_dir, "orders")
    cust = load_table(spark, sf_dir, "customer")
    nat = load_table(spark, sf_dir, "nation")
    pts = (
        orders.join(cust, orders.o_custkey == cust.c_custkey)
        .join(F.broadcast(nat), F.col("c_nationkey") == F.col("n_nationkey"))
        .select(
            F.col("n_name").alias("nation"),
            F.col("o_orderkey").alias("ok"),
            F.floor(F.col("o_totalprice") * 100 + 0.5)
            .cast("bigint")
            .alias("cents"),
        )
    )
    w = Window.partitionBy("nation").orderBy("cents", "ok")
    adj = pts.select(
        "nation",
        F.lag("cents").over(w).alias("cents_a"),
        F.lag("ok").over(w).alias("ok_a"),
        F.col("cents").alias("cents_b"),
        F.col("ok").alias("ok_b"),
        (F.col("cents") - F.lag("cents").over(w)).alias("diff"),
    ).where(F.col("cents_a").isNotNull())
    ranked = adj.select(
        "nation",
        "cents_a",
        "ok_a",
        "cents_b",
        "ok_b",
        "diff",
        F.row_number()
        .over(
            Window.partitionBy("nation").orderBy(
                "diff", "cents_a", "ok_a", "ok_b"
            )
        )
        .alias("rn"),
    )
    return ranked.where(F.col("rn") == 1).select(
        "nation",
        F.col("ok_a").cast("bigint").alias("ok_a"),
        F.col("ok_b").cast("bigint").alias("ok_b"),
        "cents_a",
        "cents_b",
        F.col("diff").cast("bigint").alias("diff_cents"),
    )
