"""Thirty-ninth-wave operators (r3 continuation): business-day
arithmetic, role-playing date dimensions.

  TS19 q_ts_business_days — business-day arithmetic: the +5-business-
                            day deadline per order via a 7-row
                            day-of-week mapping table (policy-as-data,
                            holidays extend the same table), plus the
                            weekend-started flag.
  J24 q_join_role_playing — the role-playing dimension pattern: ONE
                            generated date dimension joined twice in
                            different roles (order date, due date)
                            with disambiguated attributes from each
                            role — the star-schema modeling surface.

Determinism notes (SURVEY §5.3):
  * TS19 is pure calendar integer logic; dow is datediff-mod-7 from a
    fixed Monday (the F5 trap, avoided as in TS12/TS18).
  * J24's date dimension is generated from the data's own min/max
    (F22's generator rule); all attributes are exact calendar
    integers/strings.

Scale notes:
  * TS19: the mapping is a broadcast literal — business-day policy
    lives in DATA (add holiday rows, regional calendars key the
    table by region), never in nested CASE logic.
  * J24: one physical date dimension serves every role via broadcast
    joins — at 100 TB the date dim is still ~10k rows; N roles = N
    broadcast joins of the SAME table, zero extra storage; the
    discipline is aliased attribute names per role (the oracle's
    o_/d_ prefixes), without which role columns silently collide.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from ai_to_cvent_etl_spark.io import load_table
from ai_to_cvent_etl_spark.registry import register

# --- TS19: business-day arithmetic -------------------------------------------

# dow (0=Mon..6=Sun) -> calendar days until the 5th business day
_BD5 = [(0, 7), (1, 7), (2, 7), (3, 7), (4, 7), (5, 6), (6, 5)]


@register(
    "q_ts_business_days",
    oracle=f"""
        WITH m AS (
            SELECT * FROM (VALUES
                {', '.join(f'({d}, {c})' for d, c in _BD5)}
            ) t(dow, cal_days)
        ),
        o AS (
            SELECT o_orderkey,
                   CAST(date_diff('day', TIMESTAMP '1995-01-02',
                                  o_orderdate) AS BIGINT) % 7 AS dow,
                   o_orderdate
            FROM orders
        )
        SELECT o.o_orderkey,
               CAST(o.dow AS INT) AS order_dow,
               CAST(o.o_orderdate + to_days(m.cal_days) AS DATE)
                   AS due_date,
               o.dow >= 5 AS weekend_start
        FROM o JOIN m ON m.dow = o.dow
    """,
    section="TS19",
    doc="Business-day arithmetic as POLICY DATA: the +5-business-day "
    "deadline per order via a 7-row (day-of-week → calendar days) "
    "mapping table — a weekday start lands on the same weekday next "
    "week (7 calendar days), Saturday needs 6, Sunday 5 — joined "
    "broadcast-side, with the weekend-start flag. Day-of-week is "
    "datediff-mod-7 from a fixed Monday (the F5 numbering trap). "
    "Policy-as-data is the point: holiday calendars append rows "
    "(date-specific overrides) and regional calendars key the table "
    "by region — nested CASE logic can do neither. Map-only plus one "
    "7-row broadcast.",
)
def q_ts_business_days(spark: SparkSession, sf_dir: str) -> DataFrame:
    orders = load_table(spark, sf_dir, "orders")
    m = orders.sparkSession.createDataFrame(_BD5, "dow long, cal_days int")
    o = orders.select(
        "o_orderkey",
        (
            F.datediff(F.col("o_orderdate"), F.lit("1995-01-02")).cast("long")
            % 7
        ).alias("dow"),
        "o_orderdate",
    )
    return o.join(F.broadcast(m), "dow").select(
        "o_orderkey",
        F.col("dow").cast("int").alias("order_dow"),
        F.expr("CAST(o_orderdate + make_dt_interval(cal_days) AS DATE)")
        .alias("due_date"),
        (F.col("dow") >= 5).alias("weekend_start"),
    )


# --- J24: role-playing date dimension ----------------------------------------


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
