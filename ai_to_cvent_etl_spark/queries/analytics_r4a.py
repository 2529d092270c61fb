"""Twenty-ninth-wave operators (r3 continuation): SQL pipe syntax,
listagg, lateral column aliases, built-in session windows.

  F20 q_sql_pipe_syntax  — the Spark 4 SQL pipe syntax (|> operators):
                           a scan piped through WHERE, AGGREGATE and
                           SELECT stages — same semantics, linear
                           data-flow surface.
  A41 q_agg_listagg      — SQL-standard LISTAGG ... WITHIN GROUP
                           (ORDER BY ...): ordered string aggregation
                           per group (the A10 sorted-collect contract
                           through the standard surface).
  F21 q_lateral_alias    — lateral column alias references: later
                           SELECT items reusing earlier aliases in the
                           same list (no subquery nesting) — pinned
                           because the rewrite must not double-evaluate
                           or reorder expressions.
  W28 q_win_session_window_builtin — the BUILT-IN session_window()
                           aggregation in batch: 10-minute-gap user
                           sessions — verified against the manual
                           gaps-and-islands sessionization (W10's
                           device), pinning that the native operator
                           implements exactly those semantics.

Determinism notes (SURVEY §5.3):
  * F20/F21 reuse the exact-decimal aggregate discipline; pipe/alias
    forms are syntax, not semantics.
  * A41 orders the aggregation by (value, unique key) — no peer rows.
  * W28: session boundaries are pure timestamp comparisons; session
    start/end and counts are exact; both engines compute the same
    10-minute gap partition.

Scale notes:
  * F20/F21 compile to the same plans as their classic forms — zero
    plan difference is the point.
  * A41 concentrates a group's values into one string — bound the
    group (or cap with a rank-window head) before LISTAGG at scale;
    an unbounded group's string is the collect_list OOM in disguise.
  * W28's native session_window carries partial sessions that MERGE
    across partitions in the shuffle (unlike naive islanding, which
    needs the full per-user sort locally) — the reason to prefer the
    built-in at 100 TB, and in streaming it is the same operator with
    state (ST3).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from ai_to_cvent_etl_spark.io import load_table
from ai_to_cvent_etl_spark.queries._util import ORACLE_MONEY_SUM
from ai_to_cvent_etl_spark.registry import register

# --- F20: SQL pipe syntax ----------------------------------------------------


@register(
    "q_sql_pipe_syntax",
    oracle=f"""
        SELECT o_orderstatus,
               CAST(COUNT(*) AS BIGINT) AS n_orders,
               {ORACLE_MONEY_SUM.format(col='o_totalprice')} AS revenue
        FROM orders
        WHERE o_orderdate >= TIMESTAMP '1996-01-01'
        GROUP BY o_orderstatus
    """,
    section="F20",
    doc="The Spark 4 SQL pipe syntax: FROM orders |> WHERE ... |> "
    "AGGREGATE ... GROUP BY ... — the linear data-flow form of a "
    "filter-aggregate query, verified equal to the classic form "
    "(which IS the oracle). Pipe stages compile to the identical "
    "Catalyst plan — the surface exists for composability and "
    "readability, not new semantics; pinning it guarantees users can "
    "migrate query text without behavior change. Exact-decimal "
    "revenue per the money-sum rule.",
)
def q_sql_pipe_syntax(spark: SparkSession, sf_dir: str) -> DataFrame:
    load_table(spark, sf_dir, "orders").createOrReplaceTempView(
        "f20_orders"
    )
    return spark.sql(
        """
        FROM f20_orders
        |> WHERE o_orderdate >= TIMESTAMP '1996-01-01'
        |> AGGREGATE COUNT(*) AS n_orders,
                     CAST(SUM(CAST(o_totalprice AS DECIMAL(18,2)))
                          AS DOUBLE) AS revenue
           GROUP BY o_orderstatus
        |> SELECT o_orderstatus, n_orders, revenue
        """
    )


# --- A41: LISTAGG WITHIN GROUP -----------------------------------------------


@register(
    "q_agg_listagg",
    oracle="""
        SELECT n_nationkey,
               string_agg(c_name, '|' ORDER BY c_acctbal DESC, c_name)
                   AS top_names,
               CAST(COUNT(*) AS BIGINT) AS n_customers
        FROM customer
        JOIN nation ON n_nationkey = c_nationkey
        WHERE c_acctbal > 9000
        GROUP BY n_nationkey
    """,
    section="A41",
    doc="SQL-standard LISTAGG ... WITHIN GROUP (ORDER BY ...): "
    "high-balance customer names per nation, ordered by (acctbal "
    "DESC, name) — deterministic ordered string aggregation through "
    "the standard surface (A10 pins the same contract via "
    "sort_array(collect_list)); DuckDB mirrors with string_agg ORDER "
    "BY. The WHERE bounds the group BEFORE aggregation — an unbounded "
    "LISTAGG group is the collect_list OOM in disguise (cap with a "
    "rank-window head at scale).",
)
def q_agg_listagg(spark: SparkSession, sf_dir: str) -> DataFrame:
    customer = load_table(spark, sf_dir, "customer")
    nation = load_table(spark, sf_dir, "nation")
    j = customer.join(
        nation, customer.c_nationkey == nation.n_nationkey
    ).where(F.col("c_acctbal") > 9000)
    j.createOrReplaceTempView("a41_cust")
    return spark.sql(
        """
        SELECT n_nationkey,
               listagg(c_name, '|')
                   WITHIN GROUP (ORDER BY c_acctbal DESC, c_name)
                   AS top_names,
               COUNT(*) AS n_customers
        FROM a41_cust
        GROUP BY n_nationkey
        """
    )


# --- F21: lateral column aliases ---------------------------------------------


@register(
    "q_lateral_alias",
    oracle="""
        SELECT l_orderkey, l_linenumber,
               l_extendedprice * (1 - l_discount) AS net,
               l_extendedprice * (1 - l_discount) * (1 + l_tax) AS gross,
               l_extendedprice * (1 - l_discount) * (1 + l_tax)
               - l_extendedprice * (1 - l_discount) AS tax_amount
        FROM lineitem
    """,
    section="F21",
    doc="Lateral column alias references: net, gross, and tax_amount "
    "each reuse EARLIER aliases in the same SELECT list (gross = net·"
    "(1+tax), tax_amount = gross − net) — no subquery nesting. Pinned "
    "because the analyzer's rewrite substitutes the alias expression "
    "textually, and the oracle (fully-expanded expressions) proves "
    "the substitution neither double-evaluates differently nor "
    "reorders the IEEE arithmetic. Row-local double math — exact "
    "cross-engine (§5.3: raw row-level arithmetic is bit-stable).",
)
def q_lateral_alias(spark: SparkSession, sf_dir: str) -> DataFrame:
    load_table(spark, sf_dir, "lineitem").createOrReplaceTempView(
        "f21_lineitem"
    )
    return spark.sql(
        """
        SELECT l_orderkey, l_linenumber,
               l_extendedprice * (1 - l_discount) AS net,
               net * (1 + l_tax) AS gross,
               gross - net AS tax_amount
        FROM f21_lineitem
        """
    )


# --- W28: built-in session_window in batch -----------------------------------

_W28_GAP = "10 minutes"
_W28_GAP_US = 600_000_000


@register(
    "q_win_session_window_builtin",
    oracle=f"""
        WITH o AS (
            SELECT user_id, epoch_us(ts) AS t
            FROM events
        ),
        flags AS (
            SELECT user_id, t,
                   CASE WHEN t - lag(t) OVER w > {_W28_GAP_US}
                             OR lag(t) OVER w IS NULL
                        THEN 1 ELSE 0 END AS new_sess
            FROM o
            WINDOW w AS (PARTITION BY user_id ORDER BY t)
        ),
        sess AS (
            SELECT user_id, t,
                   SUM(new_sess) OVER (
                       PARTITION BY user_id ORDER BY t
                       ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW
                   ) AS sid
            FROM flags
        )
        SELECT user_id,
               MIN(t) AS session_start_us,
               MAX(t) + {_W28_GAP_US} AS session_end_us,
               CAST(COUNT(*) AS BIGINT) AS n_events
        FROM sess
        GROUP BY user_id, sid
    """,
    section="W28",
    doc="The BUILT-IN session_window() aggregation in BATCH: 10-minute-"
    "gap user sessions with start/end/size — verified against manual "
    "gaps-and-islands sessionization (W10's device), which pins that "
    "the native operator implements exactly those semantics (session "
    "end = last event + gap, Spark's definition). Why the built-in "
    "matters at 100 TB: its partial sessions MERGE across partitions "
    "in the shuffle, where naive islanding needs each user's full "
    "sorted history in one task; and in streaming it is the SAME "
    "operator with state (ST3) — batch/stream session parity for "
    "free.",
)
def q_win_session_window_builtin(
    spark: SparkSession, sf_dir: str
) -> DataFrame:
    ev = load_table(spark, sf_dir, "events")
    return (
        ev.groupBy(
            F.session_window("ts", _W28_GAP).alias("w"), "user_id"
        )
        .agg(F.count("*").alias("n_events"))
        .select(
            "user_id",
            F.unix_micros(F.col("w.start")).alias("session_start_us"),
            F.unix_micros(F.col("w.end")).alias("session_end_us"),
            "n_events",
        )
    )
