"""Registered queries q_etl_incremental_diff..q_etl_bucket_plan (chunk 1 of 2 split from etl.py — see etl_shared.py for shared helpers)."""

from __future__ import annotations
from pyspark.sql import DataFrame, SparkSession, Window
from pyspark.sql import functions as F
from ai_to_cvent_etl_spark.io import load_table
from ai_to_cvent_etl_spark.registry import register
from pyspark.sql.types import DecimalType
from ai_to_cvent_etl_spark.queries._util import dec2
from pyspark.sql import DataFrame, SparkSession

from ai_to_cvent_etl_spark.queries.etl_shared import (  # noqa: F401
    _AS_OF,
    _BUCKET_TARGET_ROWS,
    _BYTE_BUDGET,
    _COMPACT_TARGET,
    _FD_CANDIDATES,
    _H48_DUCK_DOC,
    _H48_SPARK_DOC,
    _IPF_ROUNDS,
    _KANON_ORACLE,
    _KEEP_N,
    _KFOLD_K,
    _K_ANON,
    _LDIV_L,
    _MAD_SCALE,
    _MERGE_ORACLE,
    _MERKLE_BUCKETS,
    _PK_CANDIDATES,
    _POLICY,
    _PROFILE_COLS,
    _RANGE_BINS,
    _SHARD_BYTES,
    _TTL_POLICY,
    _VOL_Z_MAX,
    _WIN_US,
    _WM_DELAY_US,
    _X_DUCK,
    _X_SPARK,
    _Y_DUCK,
    _Y_SPARK,
    _Z_FILE_SPAN,
    _ipf_oracle,
    _morton_expr,
    _profile_oracle,
)

@register(
    "q_etl_incremental_diff",
    oracle="""
        WITH source AS (
            SELECT o_orderkey,
                   CASE WHEN o_orderkey % 89 = 0 THEN 'P' ELSE o_orderstatus END
                       AS o_orderstatus,
                   o_totalprice
            FROM orders
            WHERE o_orderkey % 97 <> 0
        ),
        target AS (
            SELECT o_orderkey, o_orderstatus, o_totalprice
            FROM orders
            WHERE o_orderkey % 101 <> 0
        )
        SELECT COALESCE(s.o_orderkey, t.o_orderkey) AS o_orderkey,
               CASE
                   WHEN t.o_orderkey IS NULL THEN 'insert'
                   WHEN s.o_orderkey IS NULL THEN 'delete'
                   ELSE 'update'
               END AS change_type
        FROM source s
        FULL OUTER JOIN target t ON s.o_orderkey = t.o_orderkey
        WHERE t.o_orderkey IS NULL
           OR s.o_orderkey IS NULL
           OR s.o_orderstatus <> t.o_orderstatus
           OR s.o_totalprice <> t.o_totalprice
    """,
    section="E1",
    doc="Incremental snapshot diff (the ETL change-detection core): full "
    "outer join of simulated source/target snapshots on the business key, "
    "classify insert/delete/update by direct value comparison (no row-hash "
    "string formatting — engine-portable). Unchanged rows drop out.",
)
def q_etl_incremental_diff(spark: SparkSession, sf_dir: str) -> DataFrame:
    orders = load_table(spark, sf_dir, "orders")
    source = orders.filter(F.col("o_orderkey") % 97 != 0).select(
        "o_orderkey",
        F.when(F.col("o_orderkey") % 89 == 0, "P")
        .otherwise(F.col("o_orderstatus"))
        .alias("o_orderstatus"),
        "o_totalprice",
    )
    target = orders.filter(F.col("o_orderkey") % 101 != 0).select(
        "o_orderkey", "o_orderstatus", "o_totalprice"
    )
    s, t = source.alias("s"), target.alias("t")
    joined = s.join(t, F.col("s.o_orderkey") == F.col("t.o_orderkey"), "full_outer")
    change = (
        F.when(F.col("t.o_orderkey").isNull(), "insert")
        .when(F.col("s.o_orderkey").isNull(), "delete")
        .otherwise("update")
    )
    return joined.filter(
        F.col("t.o_orderkey").isNull()
        | F.col("s.o_orderkey").isNull()
        | (F.col("s.o_orderstatus") != F.col("t.o_orderstatus"))
        | (F.col("s.o_totalprice") != F.col("t.o_totalprice"))
    ).select(
        F.coalesce(F.col("s.o_orderkey"), F.col("t.o_orderkey")).alias("o_orderkey"),
        change.alias("change_type"),
    )

@register(
    "q_etl_latest_by_key",
    oracle="""
        SELECT user_id, event_id, ts, event_type FROM (
            SELECT user_id, event_id, ts, event_type,
                   ROW_NUMBER() OVER (PARTITION BY user_id
                                      ORDER BY ts DESC, event_id DESC) AS rn
            FROM events
        ) WHERE rn = 1
    """,
    section="E2",
    doc="CDC upsert-compaction: latest record per key via row_number with a "
    "unique-key tie-break — deterministic, unlike dropDuplicates.",
)
def q_etl_latest_by_key(spark: SparkSession, sf_dir: str) -> DataFrame:
    events = load_table(spark, sf_dir, "events")
    w = Window.partitionBy("user_id").orderBy(
        F.col("ts").desc(), F.col("event_id").desc()
    )
    return (
        events.withColumn("rn", F.row_number().over(w))
        .filter(F.col("rn") == 1)
        .select("user_id", "event_id", "ts", "event_type")
    )

@register(
    "q_etl_scd3",
    oracle="""
        WITH ranked AS (
            SELECT o_custkey, o_orderkey, o_totalprice, o_orderdate,
                   ROW_NUMBER() OVER (
                       PARTITION BY o_custkey
                       ORDER BY o_orderdate DESC, o_orderkey DESC
                   ) AS rn,
                   lead(o_totalprice) OVER (
                       PARTITION BY o_custkey
                       ORDER BY o_orderdate DESC, o_orderkey DESC
                   ) AS prev_totalprice,
                   lead(o_orderdate) OVER (
                       PARTITION BY o_custkey
                       ORDER BY o_orderdate DESC, o_orderkey DESC
                   ) AS prev_orderdate
            FROM orders
        )
        SELECT o_custkey, o_orderkey AS current_orderkey,
               o_totalprice AS current_totalprice,
               o_orderdate AS current_orderdate,
               prev_totalprice, prev_orderdate,
               prev_totalprice IS NOT NULL AS has_history
        FROM ranked WHERE rn = 1
    """,
    section="E10",
    doc="SCD Type-3 dimension build: latest row per entity with the "
    "PREVIOUS value carried in-row (prev_totalprice / prev_orderdate, "
    "NULL for single-version entities) — the limited-history alternative "
    "to E3's full SCD2 interval table. One window sort per entity key "
    "(row_number + lead share the frame), fully tie-broken. NULLs here "
    "are MEANINGFUL (no history), pinning nullable-column hashing.",
)
def q_etl_scd3(spark: SparkSession, sf_dir: str) -> DataFrame:
    orders = load_table(spark, sf_dir, "orders")
    w = Window.partitionBy("o_custkey").orderBy(
        F.desc("o_orderdate"), F.desc("o_orderkey")
    )
    ranked = orders.select(
        "o_custkey",
        "o_orderkey",
        "o_totalprice",
        "o_orderdate",
        F.row_number().over(w).alias("rn"),
        F.lead("o_totalprice").over(w).alias("prev_totalprice"),
        F.lead("o_orderdate").over(w).alias("prev_orderdate"),
    )
    return ranked.filter(F.col("rn") == 1).select(
        "o_custkey",
        F.col("o_orderkey").alias("current_orderkey"),
        F.col("o_totalprice").alias("current_totalprice"),
        F.col("o_orderdate").alias("current_orderdate"),
        "prev_totalprice",
        "prev_orderdate",
        F.col("prev_totalprice").isNotNull().alias("has_history"),
    )

@register(
    "q_etl_key_skew_stats",
    oracle="""
        WITH k1 AS (
            SELECT l_suppkey AS k, CAST(COUNT(*) AS BIGINT) AS c
            FROM lineitem GROUP BY l_suppkey
        ),
        k2 AS (
            SELECT o_custkey AS k, CAST(COUNT(*) AS BIGINT) AS c
            FROM orders GROUP BY o_custkey
        ),
        s1 AS (
            SELECT 'lineitem.l_suppkey' AS join_key,
                   CAST(COUNT(*) AS BIGINT) AS n_keys,
                   CAST(MAX(c) AS BIGINT) AS max_rows,
                   CAST(SUM(c) AS DOUBLE) / COUNT(*) AS avg_rows,
                   CAST(MAX(c) AS DOUBLE)
                   / (CAST(SUM(c) AS DOUBLE) / COUNT(*)) AS skew_factor
            FROM k1
        ),
        s2 AS (
            SELECT 'orders.o_custkey' AS join_key,
                   CAST(COUNT(*) AS BIGINT) AS n_keys,
                   CAST(MAX(c) AS BIGINT) AS max_rows,
                   CAST(SUM(c) AS DOUBLE) / COUNT(*) AS avg_rows,
                   CAST(MAX(c) AS DOUBLE)
                   / (CAST(SUM(c) AS DOUBLE) / COUNT(*)) AS skew_factor
            FROM k2
        )
        SELECT * FROM s1 UNION ALL SELECT * FROM s2
    """,
    section="E12",
    doc="Join-key skew diagnostic: per-key row-count distribution "
    "(n_keys, max, avg, max/avg skew factor) for the two hottest join "
    "keys — the measurement that decides whether a join needs J15's "
    "salting or AQE skew handling BEFORE it runs (measure, don't guess). "
    "Integer counts + one IEEE division => exact. Two keyed partial "
    "aggregations collapsing to per-key counts, then single-row "
    "summaries.",
)
def q_etl_key_skew_stats(spark: SparkSession, sf_dir: str) -> DataFrame:
    li = load_table(spark, sf_dir, "lineitem")
    orders = load_table(spark, sf_dir, "orders")

    def stats(df, col, label):
        per_key = df.groupBy(col).agg(F.count(F.lit(1)).alias("c"))
        avg = F.sum("c").cast("double") / F.count(F.lit(1))
        return per_key.agg(
            F.count(F.lit(1)).alias("n_keys"),
            F.max("c").alias("max_rows"),
            avg.alias("avg_rows"),
            (F.max("c").cast("double") / avg).alias("skew_factor"),
        ).select(
            F.lit(label).alias("join_key"),
            "n_keys",
            "max_rows",
            "avg_rows",
            "skew_factor",
        )

    return stats(li, "l_suppkey", "lineitem.l_suppkey").unionByName(
        stats(orders, "o_custkey", "orders.o_custkey")
    )

# ==== from analytics_r3b ===========================================

@register(
    "q_etl_fk_audit",
    oracle="""
        WITH t1 AS (
            SELECT 'lineitem->orders_open' AS relationship,
                   CAST(COUNT(*) AS BIGINT) AS n_rows,
                   CAST(SUM(CASE WHEN o.o_orderkey IS NULL
                                 THEN 1 ELSE 0 END) AS BIGINT) AS n_orphans
            FROM lineitem l
            LEFT JOIN (SELECT o_orderkey FROM orders
                       WHERE o_orderstatus = 'O') o
              ON l.l_orderkey = o.o_orderkey
        ),
        t2 AS (
            SELECT 'orders->customer_positive' AS relationship,
                   CAST(COUNT(*) AS BIGINT) AS n_rows,
                   CAST(SUM(CASE WHEN c.c_custkey IS NULL
                                 THEN 1 ELSE 0 END) AS BIGINT) AS n_orphans
            FROM orders o
            LEFT JOIN (SELECT c_custkey FROM customer
                       WHERE c_acctbal > 0) c
              ON o.o_custkey = c.c_custkey
        )
        SELECT relationship, n_rows, n_orphans,
               CAST(n_orphans AS DOUBLE) / n_rows AS orphan_ratio
        FROM (SELECT * FROM t1 UNION ALL SELECT * FROM t2)
    """,
    section="E11",
    doc="Referential-integrity audit: orphan counts per FK relationship "
    "against CONSTRAINED target slices (open orders / positive-balance "
    "customers) so drift is non-trivially exercised — the DQ gate an ETL "
    "load runs before publishing. Each relationship is one broadcast-or-"
    "shuffle left join + conditional count (map-side combinable); ratio "
    "is int/int IEEE division, exact. At 100 TB the dim key-sets "
    "broadcast (keys only, not rows) or the joins bucket on the FK.",
)
def q_etl_fk_audit(spark: SparkSession, sf_dir: str) -> DataFrame:
    li = load_table(spark, sf_dir, "lineitem")
    orders = load_table(spark, sf_dir, "orders")
    cust = load_table(spark, sf_dir, "customer")
    open_orders = orders.filter(F.col("o_orderstatus") == "O").select(
        "o_orderkey"
    )
    pos_cust = cust.filter(F.col("c_acctbal") > 0).select("c_custkey")
    t1 = (
        li.join(open_orders, li.l_orderkey == open_orders.o_orderkey, "left")
        .agg(
            F.count(F.lit(1)).alias("n_rows"),
            F.sum(
                F.when(F.col("o_orderkey").isNull(), 1).otherwise(0)
            ).alias("n_orphans"),
        )
        .select(
            F.lit("lineitem->orders_open").alias("relationship"),
            "n_rows",
            "n_orphans",
        )
    )
    t2 = (
        orders.join(pos_cust, orders.o_custkey == pos_cust.c_custkey, "left")
        .agg(
            F.count(F.lit(1)).alias("n_rows"),
            F.sum(
                F.when(F.col("c_custkey").isNull(), 1).otherwise(0)
            ).alias("n_orphans"),
        )
        .select(
            F.lit("orders->customer_positive").alias("relationship"),
            "n_rows",
            "n_orphans",
        )
    )
    return t1.unionByName(t2).select(
        "relationship",
        "n_rows",
        "n_orphans",
        (F.col("n_orphans").cast("double") / F.col("n_rows")).alias(
            "orphan_ratio"
        ),
    )

@register(
    "q_etl_column_profile",
    oracle=_profile_oracle(),
    section="E13",
    doc="Per-column dataset profile of orders (row/null/distinct counts, "
    "numeric min/max; dates via tz-immune epoch days) — the pre-ingest DQ "
    "report. ONE scan: all metrics come from a single multi-count-distinct "
    "aggregate (Catalyst Expand), pivoted to long form with a row-local "
    "stack — no per-column rescans, output bounded by column count.",
)
def q_etl_column_profile(spark: SparkSession, sf_dir: str) -> DataFrame:
    od = load_table(spark, sf_dir, "orders")
    aggs = [F.count(F.lit(1)).alias("n_rows")]
    for name, proj, _ in _PROFILE_COLS:
        aggs += [
            (F.count(F.lit(1)) - F.count(name)).alias(f"{name}__nn"),
            F.countDistinct(name).alias(f"{name}__nd"),
            F.min(F.expr(proj)).alias(f"{name}__mn"),
            F.max(F.expr(proj)).alias(f"{name}__mx"),
        ]
    wide = od.agg(*aggs)
    stack_args = ", ".join(
        f"'{name}', {name}__nn, {name}__nd, {name}__mn, {name}__mx"
        for name, _, _ in _PROFILE_COLS
    )
    return wide.selectExpr(
        f"stack({len(_PROFILE_COLS)}, {stack_args})"
        " as (col_name, n_nulls, n_distinct, min_v, max_v)",
        "n_rows",
    ).select("col_name", "n_rows", "n_nulls", "n_distinct", "min_v", "max_v")

@register(
    "q_etl_compaction_plan",
    oracle=f"""
        WITH manifest AS (
            SELECT CAST(date_trunc('month', o_orderdate) AS DATE) AS file_id,
                   CAST(COUNT(*) AS BIGINT) AS n_rows
            FROM orders GROUP BY 1
        ),
        planned AS (
            SELECT file_id, n_rows,
                   CAST(COALESCE(SUM(n_rows) OVER (
                       ORDER BY file_id
                       ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING
                   ), 0) AS BIGINT) // {_COMPACT_TARGET} AS target_file
            FROM manifest
        )
        SELECT p.file_id, p.n_rows, p.target_file,
               CAST(SUM(p.n_rows) OVER (PARTITION BY p.target_file)
                    AS BIGINT) AS target_rows
        FROM planned p
    """,
    section="E14",
    doc="Small-file compaction planner (the lakehouse OPTIMIZE step): "
    "month-partition row counts are linearly bin-packed into "
    f"~{_COMPACT_TARGET}-row output files via an exclusive running sum "
    "DIV target — deterministic first-fit in file order. Runs entirely "
    "on the partition manifest (bounded by the calendar), exactly how a "
    "real compactor plans on file metadata without touching data. "
    "All-integer.",
)
def q_etl_compaction_plan(spark: SparkSession, sf_dir: str) -> DataFrame:
    od = load_table(spark, sf_dir, "orders")
    manifest = od.groupBy(
        F.date_trunc("month", F.col("o_orderdate"))
        .cast("date")
        .alias("file_id")
    ).agg(F.count(F.lit(1)).alias("n_rows"))
    excl = Window.orderBy("file_id").rowsBetween(
        Window.unboundedPreceding, -1
    )
    planned = manifest.select(
        "file_id",
        "n_rows",
        F.coalesce(F.sum("n_rows").over(excl), F.lit(0))
        .cast("bigint")
        .alias("cum"),
    ).select(
        "file_id",
        "n_rows",
        F.expr(f"cum div {_COMPACT_TARGET}").alias("target_file"),
    )
    return planned.select(
        "*",
        F.sum("n_rows")
        .over(Window.partitionBy("target_file"))
        .alias("target_rows"),
    )

@register(
    "q_etl_zorder_layout",
    oracle=f"""
        WITH coded AS (
            SELECT x0 AS x, y0 AS y,
                   {_morton_expr('x0', 'y0', lambda e, s: f"({e} << {s})")}
                       AS morton
            FROM (SELECT {_X_DUCK} AS x0, {_Y_DUCK} AS y0 FROM orders)
        ),
        layouts AS (
            SELECT 'zorder' AS layout,
                   CAST(morton // {_Z_FILE_SPAN} AS BIGINT) AS file_id,
                   x, y
            FROM coded
            UNION ALL
            SELECT 'linear' AS layout,
                   CAST((x * 1024 + y) // {_Z_FILE_SPAN} AS BIGINT) AS file_id,
                   x, y
            FROM coded
        )
        SELECT layout, file_id,
               CAST(COUNT(*) AS BIGINT) AS n_rows,
               CAST(MAX(x) - MIN(x) AS BIGINT) AS x_span,
               CAST(MAX(y) - MIN(y) AS BIGINT) AS y_span
        FROM layouts GROUP BY layout, file_id
    """,
    section="E15",
    doc="Z-order (Morton) vs linear data-layout planning: orders are "
    "assigned to planned files by Morton-value range (map-only DIV — no "
    "global sort, unlike a row_number binning) and by the naive "
    "column-major layout; per-file min/max spans of both dimensions show "
    "the multi-column pruning win Z-ordering buys (the lakehouse "
    "OPTIMIZE ZORDER decision metric, computed before any rewrite). "
    "Morton codes are pure integer shift/mask arithmetic — identical on "
    "both engines; spans are integer max-min. One keyed agg per layout.",
)
def q_etl_zorder_layout(spark: SparkSession, sf_dir: str) -> DataFrame:
    od = load_table(spark, sf_dir, "orders")
    base = od.select(
        F.expr(_X_SPARK).alias("x"), F.expr(_Y_SPARK).alias("y")
    )
    morton = F.expr(
        _morton_expr("x", "y", lambda e, s: f"shiftleft({e}, {s})")
    )
    coded = base.select("x", "y", morton.alias("morton"))
    z = coded.select(
        F.lit("zorder").alias("layout"),
        F.expr(f"morton div {_Z_FILE_SPAN}").alias("file_id"),
        "x",
        "y",
    )
    lin = coded.select(
        F.lit("linear").alias("layout"),
        F.expr(f"(x * 1024 + y) div {_Z_FILE_SPAN}").alias("file_id"),
        "x",
        "y",
    )
    return (
        z.unionByName(lin)
        .groupBy("layout", "file_id")
        .agg(
            F.count(F.lit(1)).alias("n_rows"),
            (F.max("x") - F.min("x")).alias("x_span"),
            (F.max("y") - F.min("y")).alias("y_span"),
        )
    )

# ==== from analytics_r3i ===========================================

@register(
    "q_etl_freshness_audit",
    oracle="""
        WITH s AS (
            SELECT event_type AS source,
                   CAST(COUNT(*) AS BIGINT) AS n_rows,
                   CAST(MAX(epoch_us(ts)) AS BIGINT) AS max_ts_us,
                   CAST(MIN(epoch_us(ts)) AS BIGINT) AS min_ts_us
            FROM events GROUP BY event_type
        ),
        g AS (SELECT CAST(MAX(max_ts_us) AS BIGINT) AS wm FROM s)
        SELECT s.source, s.n_rows, s.max_ts_us, s.min_ts_us,
               CAST(g.wm - s.max_ts_us AS BIGINT) AS lag_us,
               CAST(g.wm - s.max_ts_us AS BIGINT) > 3600000000 AS is_stale
        FROM s CROSS JOIN g
    """,
    section="E18",
    doc="Per-source freshness/watermark audit: latest event time and lag "
    "vs the global high-water mark, with a 1-hour staleness flag — the "
    "data-SLA gate run before every downstream publish (a stale source "
    "silently truncates joins and aggregates). One map-side-combinable "
    "keyed aggregation + a 1-row broadcast; BIGINT-µs arithmetic — exact.",
)
def q_etl_freshness_audit(spark: SparkSession, sf_dir: str) -> DataFrame:
    ev = load_table(spark, sf_dir, "events")
    s = ev.groupBy(F.col("event_type").alias("source")).agg(
        F.count(F.lit(1)).alias("n_rows"),
        F.max(F.expr("unix_micros(ts)")).alias("max_ts_us"),
        F.min(F.expr("unix_micros(ts)")).alias("min_ts_us"),
    )
    g = s.agg(F.max("max_ts_us").alias("wm"))
    lag = F.col("wm") - F.col("max_ts_us")
    return s.crossJoin(F.broadcast(g)).select(
        "source",
        "n_rows",
        "max_ts_us",
        "min_ts_us",
        lag.alias("lag_us"),
        (lag > 3600000000).alias("is_stale"),
    )

@register(
    "q_etl_merge_upsert",
    oracle=_MERGE_ORACLE,
    section="E16",
    doc="Full MERGE INTO semantics against the orders target from a "
    "deterministic synthetic change feed: matched-U rows update (price "
    "+10.0, status 'P'), matched-D rows delete, unmatched feed rows "
    "insert under a shifted key. Resolved as ONE left outer join plus a "
    "union of the insert arm — the CDC-merge shape where the change feed "
    "is the small side (broadcast or key-co-located at scale; the target "
    "never shuffles twice). Verified by a per-status count + exact "
    "decimal price sum over the merged table, so every arm (update, "
    "delete, insert, untouched) moves the aggregate.",
)
def q_etl_merge_upsert(spark: SparkSession, sf_dir: str) -> DataFrame:
    t = load_table(spark, sf_dir, "orders")
    changes = (
        t.where((F.col("o_orderkey") % 13).isin(0, 5, 7))
        .select(
            F.col("o_orderkey").alias("key"),
            F.when(F.col("o_orderkey") % 13 == 0, F.lit("U"))
            .when(F.col("o_orderkey") % 13 == 5, F.lit("D"))
            .otherwise(F.lit("I"))
            .alias("op"),
            (F.col("o_orderkey") + 100000000).alias("new_key"),
            (F.col("o_totalprice") + F.lit(10.0)).alias("new_price"),
        )
    )
    matched = changes.where(F.col("op").isin("U", "D"))
    kept = (
        t.join(matched, t.o_orderkey == matched.key, "left")
        .where(F.col("op").isNull() | (F.col("op") != "D"))
        .select(
            "o_orderkey",
            F.when(F.col("op") == "U", F.lit("P"))
            .otherwise(F.col("o_orderstatus"))
            .alias("o_orderstatus"),
            F.when(F.col("op") == "U", F.col("new_price"))
            .otherwise(F.col("o_totalprice"))
            .alias("o_totalprice"),
        )
    )
    inserts = changes.where(F.col("op") == "I").select(
        F.col("new_key").alias("o_orderkey"),
        F.lit("N").alias("o_orderstatus"),
        F.col("new_price").alias("o_totalprice"),
    )
    merged = kept.unionByName(inserts)
    return merged.groupBy("o_orderstatus").agg(
        F.count(F.lit(1)).alias("n_rows"),
        F.sum(dec2(F.col("o_totalprice"))).cast("double").alias("total_price"),
    )

@register(
    "q_etl_k_anonymity",
    oracle=_KANON_ORACLE,
    section="E17",
    doc=f"k-anonymity audit (k={_K_ANON}) over the quasi-identifier pair "
    "(nationkey, mktsegment): per equivalence class, its size, a "
    "violation flag, the re-identification risk 1/|class|, and its share "
    "of the population — the governance gate a training-data pipeline "
    "runs before release (E11's PII mask handles direct identifiers; "
    "this catches identifying COMBINATIONS). One low-cardinality keyed "
    "reduction plus a broadcast 1-row total; output is bounded by the "
    "QI domain (<= 125 classes). Pure integer counts + IEEE divisions.",
)
def q_etl_k_anonymity(spark: SparkSession, sf_dir: str) -> DataFrame:
    c = load_table(spark, sf_dir, "customer")
    grp = c.groupBy(
        F.col("c_nationkey").alias("nationkey"),
        F.col("c_mktsegment").alias("segment"),
    ).agg(F.count(F.lit(1)).alias("group_size"))
    tot = grp.agg(F.sum("group_size").alias("n"))
    return grp.crossJoin(F.broadcast(tot)).select(
        "nationkey",
        "segment",
        "group_size",
        F.when(F.col("group_size") < _K_ANON, 1).otherwise(0).alias(
            "violates_k"
        ),
        (F.lit(1.0) / F.col("group_size").cast("double")).alias("reid_risk"),
        (
            F.col("group_size").cast("double") / F.col("n").cast("double")
        ).alias("share"),
    )

# ==== from analytics_r3l ===========================================

@register(
    "q_etl_psi_drift",
    oracle="""
        WITH b AS (
            SELECT CAST(floor(o_totalprice / 50000.0) AS INT) AS band,
                   CASE WHEN o_orderdate < TIMESTAMP '1998-01-01'
                        THEN 1 ELSE 0 END AS is_base
            FROM orders
        ),
        c AS (
            SELECT band,
                   CAST(SUM(is_base) AS BIGINT) AS n_base,
                   CAST(SUM(1 - is_base) AS BIGINT) AS n_cur
            FROM b GROUP BY band
        ),
        s AS (
            SELECT band, n_base, n_cur,
                   (CAST(n_base AS DOUBLE) + 1.0)
                   / (SUM(CAST(n_base AS DOUBLE)) OVER ()
                      + CAST(COUNT(*) OVER () AS DOUBLE)) AS p,
                   (CAST(n_cur AS DOUBLE) + 1.0)
                   / (SUM(CAST(n_cur AS DOUBLE)) OVER ()
                      + CAST(COUNT(*) OVER () AS DOUBLE)) AS q
            FROM c
        )
        SELECT band, n_base, n_cur,
               ROUND(p, 6) AS p_base,
               ROUND(q, 6) AS p_cur,
               ROUND((p - q) * ln(p / q), 6) AS psi_term
        FROM s
    """,
    section="E19",
    doc="Population Stability Index between the 1995-97 order era "
    "(baseline) and 1998+ (current) over fixed 50k price bands — the "
    "standard model-monitoring drift metric a training-data pipeline "
    "runs between snapshot and serving distributions. Laplace-smoothed "
    "((n+1)/(N+B)) so empty bands stay defined on both sides; psi_term "
    "= (p-q)·ln(p/q) per band, summable to the headline PSI. Two exact "
    "conditional counts per band in ONE aggregation pass; the share "
    "windows run over the ~12 collapsed band rows.",
)
def q_etl_psi_drift(spark: SparkSession, sf_dir: str) -> DataFrame:
    orders = load_table(spark, sf_dir, "orders")
    b = orders.select(
        F.floor(F.col("o_totalprice") / 50000.0).cast("int").alias("band"),
        F.when(F.col("o_orderdate") < "1998-01-01", 1).otherwise(0).alias(
            "is_base"
        ),
    )
    c = b.groupBy("band").agg(
        F.sum("is_base").alias("n_base"),
        F.sum(F.lit(1) - F.col("is_base")).alias("n_cur"),
    )
    w = Window.partitionBy()
    nb = F.count("*").over(w).cast("double")
    p = (F.col("n_base").cast("double") + 1.0) / (
        F.sum(F.col("n_base").cast("double")).over(w) + nb
    )
    q = (F.col("n_cur").cast("double") + 1.0) / (
        F.sum(F.col("n_cur").cast("double")).over(w) + nb
    )
    return c.select(
        "band",
        "n_base",
        "n_cur",
        F.round(p, 6).alias("p_base"),
        F.round(q, 6).alias("p_cur"),
        F.round((p - q) * F.log(p / q), 6).alias("psi_term"),
    )

@register(
    "q_etl_survivorship",
    oracle="""
        WITH feed AS (
            SELECT c_custkey, c_name, c_acctbal, 1 AS version
            FROM customer
            UNION ALL
            SELECT c_custkey, 'UPD-' || c_name, CAST(NULL AS DOUBLE), 2
            FROM customer WHERE c_custkey % 3 = 0
            UNION ALL
            SELECT c_custkey, CAST(NULL AS VARCHAR), c_acctbal + 1000.0, 3
            FROM customer WHERE c_custkey % 5 = 0
        )
        SELECT c_custkey,
               arg_max(c_name,
                       CASE WHEN c_name IS NOT NULL THEN version END)
                   AS name,
               arg_max(c_acctbal,
                       CASE WHEN c_acctbal IS NOT NULL THEN version END)
                   AS acctbal,
               CAST(COUNT(*) AS BIGINT) AS n_versions
        FROM feed
        GROUP BY c_custkey
    """,
    section="E20",
    doc="Golden-record survivorship (master-data merge): three versioned "
    "customer feeds — the base record, a name-only update (custkey%3), "
    "and an acctbal-only update (custkey%5) — merged per key by "
    "FIELD-WISE latest-non-null: max_by(field, version) with the version "
    "key NULL-masked on missing fields, which both engines skip "
    "identically (probed: Spark max_by == DuckDB arg_max under NULL "
    "ordering keys). Distinct integer versions — no ties. One union of "
    "scan projections + one keyed aggregation; partial agg resolves "
    "survivorship map-side, so the merge is a single shuffle at any "
    "scale.",
)
def q_etl_survivorship(spark: SparkSession, sf_dir: str) -> DataFrame:
    c = load_table(spark, sf_dir, "customer")
    base = c.select(
        "c_custkey",
        F.col("c_name"),
        F.col("c_acctbal"),
        F.lit(1).alias("version"),
    )
    phone_upd = c.where(F.col("c_custkey") % 3 == 0).select(
        "c_custkey",
        F.concat(F.lit("UPD-"), F.col("c_name")).alias("c_name"),
        F.lit(None).cast("double").alias("c_acctbal"),
        F.lit(2).alias("version"),
    )
    bal_upd = c.where(F.col("c_custkey") % 5 == 0).select(
        "c_custkey",
        F.lit(None).cast("string").alias("c_name"),
        (F.col("c_acctbal") + 1000.0).alias("c_acctbal"),
        F.lit(3).alias("version"),
    )
    feed = base.unionAll(phone_upd).unionAll(bal_upd)
    return feed.groupBy("c_custkey").agg(
        F.max_by(
            "c_name",
            F.when(F.col("c_name").isNotNull(), F.col("version")),
        ).alias("name"),
        F.max_by(
            "c_acctbal",
            F.when(F.col("c_acctbal").isNotNull(), F.col("version")),
        ).alias("acctbal"),
        F.count("*").alias("n_versions"),
    )

@register(
    "q_etl_merkle_diff",
    oracle=f"""
        WITH rows_ AS (
            SELECT o_orderkey % {_MERKLE_BUCKETS} AS bucket,
                   CAST(CAST(o_totalprice AS DECIMAL(18,2)) * 100
                        AS BIGINT) AS cents_a,
                   CAST(CAST(o_totalprice AS DECIMAL(18,2)) * 100
                        AS BIGINT)
                   + CASE WHEN o_orderkey % 97 = 0 THEN 100 ELSE 0 END
                       AS cents_b,
                   o_orderkey AS k
            FROM orders
        ),
        fp AS (
            SELECT bucket,
                   CAST(COUNT(*) AS BIGINT) AS n_rows,
                   bit_xor(CAST(('0x' || substr(md5(
                       CAST(k AS VARCHAR) || ':' || CAST(cents_a AS VARCHAR)
                   ), 1, 12)) AS BIGINT)) AS xor_a,
                   bit_xor(CAST(('0x' || substr(md5(
                       CAST(k AS VARCHAR) || ':' || CAST(cents_b AS VARCHAR)
                   ), 1, 12)) AS BIGINT)) AS xor_b
            FROM rows_ GROUP BY bucket
        )
        SELECT bucket, n_rows, xor_a = xor_b AS in_sync
        FROM fp
    """,
    section="E21",
    doc="Anti-entropy replica comparison (the Merkle-tree leaf level): "
    "two replicas of orders — B carries a deterministic drift (+$1.00 "
    f"on every 97th key) — collapse to {_MERKLE_BUCKETS} bucket "
    "fingerprints each: per-bucket XOR of 48-bit md5 row hashes over "
    "canonical 'key:cents' strings. XOR aggregation is exact, "
    "associative, order-insensitive AND subtractive (a changed row "
    "flips its bucket with probability 1-2^-48) — the whole query is "
    "float-free. Buckets with unequal fingerprints are the out-of-sync "
    "set. THE pattern for reconciling 100 TB replicas: each side "
    "reduces locally to |buckets| rows (partial XOR map-side), "
    "comparison moves KBs, and mismatched buckets re-split recursively "
    "(Merkle descent) — never ship or sort-merge the rows themselves.",
)
def q_etl_merkle_diff(spark: SparkSession, sf_dir: str) -> DataFrame:
    orders = load_table(spark, sf_dir, "orders")
    cents = F.expr(
        "CAST(CAST(o_totalprice AS DECIMAL(18,2)) * 100 AS BIGINT)"
    )
    rows_ = orders.select(
        (F.col("o_orderkey") % _MERKLE_BUCKETS).alias("bucket"),
        F.col("o_orderkey").alias("k"),
        cents.alias("cents_a"),
        (
            cents
            + F.when(F.col("o_orderkey") % 97 == 0, 100).otherwise(0)
        ).alias("cents_b"),
    )

    def h48(cents_col: str):
        return F.expr(
            "cast(conv(substr(md5(concat(cast(k as string), ':', "
            f"cast({cents_col} as string))), 1, 12), 16, 10) as bigint)"
        )

    return rows_.groupBy("bucket").agg(
        F.count("*").alias("n_rows"),
        F.bit_xor(h48("cents_a")).alias("xor_a"),
        F.bit_xor(h48("cents_b")).alias("xor_b"),
    ).select(
        "bucket",
        "n_rows",
        (F.col("xor_a") == F.col("xor_b")).alias("in_sync"),
    )

# ==== from analytics_r3o ===========================================

@register(
    "q_etl_quarantine",
    oracle="""
        WITH checked AS (
            SELECT o_orderkey,
                   concat_ws('|',
                       CASE WHEN o_totalprice > 500000
                            THEN 'price_out_of_range' END,
                       CASE WHEN o_orderstatus = 'P'
                                 AND o_orderdate < TIMESTAMP '1996-01-01'
                            THEN 'stale_pending' END,
                       CASE WHEN o_orderkey % 101 = 0
                            THEN 'key_checksum' END) AS failed_rules
            FROM orders
        )
        SELECT failed_rules,
               failed_rules = '' AS is_clean,
               CAST(COUNT(*) AS BIGINT) AS n_rows,
               MIN(o_orderkey) AS first_key,
               MAX(o_orderkey) AS last_key
        FROM checked
        GROUP BY failed_rules
    """,
    section="E22",
    doc="Rule-based dead-letter routing (the quality gate's disposition "
    "report): three named validation rules — price out of range, "
    "stale pending status, synthetic key-checksum failure — evaluated "
    "per row in one map pass; rows grouped by their failed-rule "
    "SIGNATURE ('' = clean, 'a|b' = failed both) with counts and "
    "boundary keys. concat_ws skips NULLs identically on both engines, "
    "and the rule order is fixed, so the signature needs no sorting. "
    "Map-only evaluation + one low-cardinality reduction: adding rules "
    "adds expressions, not passes. In production the quarantine arm "
    "writes to a dead-letter sink partitioned by signature; E5's "
    "metrics and this router are the two halves of the gate.",
)
def q_etl_quarantine(spark: SparkSession, sf_dir: str) -> DataFrame:
    orders = load_table(spark, sf_dir, "orders")
    failed = F.concat_ws(
        "|",
        F.when(F.col("o_totalprice") > 500000, "price_out_of_range"),
        F.when(
            (F.col("o_orderstatus") == "P")
            & (F.col("o_orderdate") < "1996-01-01"),
            "stale_pending",
        ),
        F.when(F.col("o_orderkey") % 101 == 0, "key_checksum"),
    )
    return (
        orders.select("o_orderkey", failed.alias("failed_rules"))
        .groupBy("failed_rules")
        .agg(
            F.count("*").alias("n_rows"),
            F.min("o_orderkey").alias("first_key"),
            F.max("o_orderkey").alias("last_key"),
        )
        .select(
            "failed_rules",
            (F.col("failed_rules") == "").alias("is_clean"),
            "n_rows",
            "first_key",
            "last_key",
        )
    )

# ==== from analytics_r3p ===========================================

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
    # Scale note (r6): successor lookup via the distributed global rank +
    # t -> t+1 self-join — no single-partition lead() window.
    from ai_to_cvent_etl_spark.operators.ranking import global_row_number

    r = global_row_number(keys, ["k"], out_col="_t").localCheckpoint(
        eager=False
    )
    nxt = r.join(
        r.select((F.col("_t") - 1).alias("_t"), F.col("k").alias("nk")),
        "_t",
        "left",
    ).select("k", "nk")
    return nxt.where(F.col("nk") - F.col("k") > 1).select(
        (F.col("k") + 1).alias("gap_lo"),
        (F.col("nk") - 1).alias("gap_hi"),
        (F.col("nk") - F.col("k") - 1).alias("gap_len"),
    )

@register(
    "q_etl_train_test_split",
    oracle=f"""
        WITH assigned AS (
            SELECT doc_id, n_chars,
                   CASE WHEN {_H48_DUCK_DOC} % 10 < 8 THEN 'train'
                        WHEN {_H48_DUCK_DOC} % 10 = 8 THEN 'val'
                        ELSE 'test' END AS split
            FROM documents
        )
        SELECT split,
               CAST(COUNT(*) AS BIGINT) AS n_docs,
               CAST(SUM(n_chars) AS BIGINT) AS total_chars,
               ROUND(CAST(COUNT(*) AS DOUBLE)
                     / CAST(SUM(COUNT(*)) OVER () AS DOUBLE), 6)
                   AS doc_share
        FROM assigned
        GROUP BY split
    """,
    section="E24",
    doc="Deterministic 80/10/10 train/val/test split on the 48-bit md5 "
    "hash of doc_id (SK4's hash device) — the reproducible-split "
    "primitive: membership is a pure function of the id, stable across "
    "runs, machines, and engine versions, so no split manifest is ever "
    "stored or joined. Output: per-split doc counts, char volume, and "
    "shares. Map-only assignment + a 3-group reduction; the same hash "
    "expression is the partitionBy column when writing the split "
    "shards, and new arriving docs self-assign without rebalancing "
    "(unlike a row_number split, which reshuffles membership on every "
    "insert).",
)
def q_etl_train_test_split(spark: SparkSession, sf_dir: str) -> DataFrame:
    docs = load_table(spark, sf_dir, "documents")
    h = F.expr(_H48_SPARK_DOC) % 10
    split = (
        F.when(h < 8, "train").when(h == 8, "val").otherwise("test")
    )
    a = docs.select(split.alias("split"), "n_chars")
    w = Window.partitionBy()
    return a.groupBy("split").agg(
        F.count("*").alias("n_docs"),
        F.sum("n_chars").alias("total_chars"),
    ).select(
        "split",
        "n_docs",
        "total_chars",
        F.round(
            F.col("n_docs").cast("double")
            / F.sum("n_docs").over(w).cast("double"),
            6,
        ).alias("doc_share"),
    )

# ==== from analytics_r3s ===========================================

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

# ==== from analytics_r3u ===========================================

@register(
    "q_etl_column_diff",
    oracle="""
        WITH replica AS (
            SELECT o_orderkey,
                   o_totalprice
                   + CASE WHEN o_orderkey % 11 = 0 THEN 1.0 ELSE 0.0 END
                       AS r_price,
                   CASE WHEN o_orderkey % 13 = 0 THEN 'X'
                        ELSE o_orderstatus END AS r_status,
                   o_orderdate
                   + CASE WHEN o_orderkey % 17 = 0 THEN INTERVAL 1 DAY
                          ELSE INTERVAL 0 DAY END AS r_date
            FROM orders
        ),
        j AS (
            SELECT CAST(COUNT(*) AS BIGINT) AS n,
                   CAST(SUM(CASE WHEN o.o_totalprice <> r.r_price
                            THEN 1 ELSE 0 END) AS BIGINT) AS d_price,
                   CAST(SUM(CASE WHEN o.o_orderstatus <> r.r_status
                            THEN 1 ELSE 0 END) AS BIGINT) AS d_status,
                   CAST(SUM(CASE WHEN o.o_orderdate <> r.r_date
                            THEN 1 ELSE 0 END) AS BIGINT) AS d_date
            FROM orders o JOIN replica r ON r.o_orderkey = o.o_orderkey
        )
        SELECT col_name, n_changed, n_rows,
               ROUND(CAST(n_changed AS DOUBLE) / n_rows, 6) AS change_rate
        FROM (
            SELECT 'o_totalprice' AS col_name, d_price AS n_changed,
                   n AS n_rows FROM j
            UNION ALL
            SELECT 'o_orderstatus', d_status, n FROM j
            UNION ALL
            SELECT 'o_orderdate', d_date, n FROM j
        )
    """,
    section="E26",
    doc="Snapshot column-level drift report: a deterministically mutated "
    "replica (price bump %11, status flip %13, date shift %17) joined "
    "back on the key, per-column changed-row counts and rates unpivoted "
    "to one row per column — the schema-aware complement to E1's "
    "row-level incremental diff (E1 says WHICH rows changed; this says "
    "WHICH COLUMNS churn, the signal that drives partial re-exports "
    "and CDC column filters). One co-keyed join (bucketed at scale, "
    "E1's layout) + conditional counts in a single reduction; columns "
    "are expressions, not passes.",
)
def q_etl_column_diff(spark: SparkSession, sf_dir: str) -> DataFrame:
    orders = load_table(spark, sf_dir, "orders")
    replica = orders.select(
        "o_orderkey",
        (
            F.col("o_totalprice")
            + F.when(F.col("o_orderkey") % 11 == 0, 1.0).otherwise(0.0)
        ).alias("r_price"),
        F.when(F.col("o_orderkey") % 13 == 0, "X")
        .otherwise(F.col("o_orderstatus"))
        .alias("r_status"),
        F.when(
            F.col("o_orderkey") % 17 == 0,
            F.col("o_orderdate") + F.expr("INTERVAL 1 DAY"),
        )
        .otherwise(F.col("o_orderdate"))
        .alias("r_date"),
    )
    j = orders.join(replica, "o_orderkey").agg(
        F.count("*").alias("n"),
        F.sum(
            F.when(F.col("o_totalprice") != F.col("r_price"), 1).otherwise(0)
        ).alias("d_price"),
        F.sum(
            F.when(F.col("o_orderstatus") != F.col("r_status"), 1).otherwise(0)
        ).alias("d_status"),
        F.sum(
            F.when(F.col("o_orderdate") != F.col("r_date"), 1).otherwise(0)
        ).alias("d_date"),
    )
    long = j.selectExpr(
        """stack(3,
            'o_totalprice', d_price, n,
            'o_orderstatus', d_status, n,
            'o_orderdate', d_date, n
        ) AS (col_name, n_changed, n_rows)"""
    )
    return long.select(
        "col_name",
        "n_changed",
        "n_rows",
        F.round(
            F.col("n_changed").cast("double") / F.col("n_rows"), 6
        ).alias("change_rate"),
    )

@register(
    "q_etl_lateness_audit",
    oracle=f"""
        WITH arr AS (
            SELECT event_id,
                   epoch_us(ts) AS ev_us,
                   epoch_us(ts) + (event_id % 600) * 1000000 AS arr_us
            FROM events
        ),
        wm AS (
            SELECT event_id, ev_us, arr_us,
                   MAX(ev_us) OVER (
                       ORDER BY arr_us, event_id
                       ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING
                   ) AS max_seen_us
            FROM arr
        )
        SELECT (ev_us // {_WIN_US}) * {_WIN_US} AS window_start_us,
               CAST(COUNT(*) AS BIGINT) AS n_events,
               CAST(SUM(CASE WHEN max_seen_us - {_WM_DELAY_US}
                                  > (ev_us // {_WIN_US}) * {_WIN_US}
                                    + {_WIN_US}
                        THEN 1 ELSE 0 END) AS BIGINT) AS n_late_dropped
        FROM wm
        GROUP BY 1
    """,
    section="E27",
    doc="Batch replay of streaming watermark semantics (the offline twin "
    "of ST4's live test): each event gets a deterministic arrival "
    "delay (event_id-keyed, up to 10 min), the event-time WATERMARK is "
    "the running max event time over everything that arrived STRICTLY "
    "BEFORE it (arrival order, event_id tie-break) minus a 2-minute "
    "allowance, and an event counts as late-dropped when the watermark "
    "already passed the end of its 1-minute tumbling window — exactly "
    "Spark's drop rule. Output per window: totals and would-be-dropped "
    "counts — the audit that sizes a watermark BEFORE deploying the "
    "stream. Pure integer microsecond arithmetic. The running max is "
    "per-source-partition in production (Spark's watermark is the min "
    "across partitions), which partitions the window.",
)
def q_etl_lateness_audit(spark: SparkSession, sf_dir: str) -> DataFrame:
    ev = load_table(spark, sf_dir, "events")
    arr = ev.select(
        "event_id",
        F.unix_micros("ts").alias("ev_us"),
        (F.unix_micros("ts") + (F.col("event_id") % 600) * 1_000_000).alias(
            "arr_us"
        ),
    )
    # Scale note (r6): the exclusive running watermark max runs on the
    # distributed two-pass running-aggregate operator — no
    # single-partition window over the event stream.
    from ai_to_cvent_etl_spark.operators.ranking import global_running

    wm = global_running(
        arr,
        ["arr_us", "event_id"],
        {"max_seen_us": ("max", F.col("ev_us"))},
        exclusive=True,
    ).select("ev_us", "max_seen_us")
    win_start = (F.col("ev_us") / _WIN_US).cast("long") * _WIN_US
    late = (
        F.col("max_seen_us") - _WM_DELAY_US > win_start + _WIN_US
    )
    return (
        wm.select(
            F.expr(f"(ev_us DIV {_WIN_US}) * {_WIN_US}").alias(
                "window_start_us"
            ),
            late.alias("late"),
        )
        .groupBy("window_start_us")
        .agg(
            F.count("*").alias("n_events"),
            F.sum(F.when(F.col("late"), 1).otherwise(0)).alias(
                "n_late_dropped"
            ),
        )
    )

@register(
    "q_etl_rls_filter",
    oracle=f"""
        WITH policy AS (
            SELECT * FROM (VALUES
                {', '.join(f"({n}, '{s}')" for n, s in _POLICY)}
            ) t(p_nation, p_segment)
        ),
        visible AS (
            SELECT c.c_nationkey, c.c_custkey
            FROM customer c
            WHERE EXISTS (
                SELECT 1 FROM policy p
                WHERE p.p_nation = c.c_nationkey
                  AND p.p_segment = c.c_mktsegment
            )
        )
        SELECT c.c_nationkey,
               CAST(COUNT(*) AS BIGINT) AS n_customers,
               CAST(COUNT(v.c_custkey) AS BIGINT) AS n_visible,
               CAST(COUNT(*) - COUNT(v.c_custkey) AS BIGINT) AS n_hidden
        FROM customer c
        LEFT JOIN visible v ON v.c_custkey = c.c_custkey
        GROUP BY c.c_nationkey
    """,
    section="E28",
    doc="Row-level security as POLICY DATA: a (nation → allowed market "
    "segment) policy table enforced with a semi-join filter, plus the "
    "per-nation visible/hidden accounting an auditor asks for. "
    "Policy-as-data beats per-tenant query templating: ONE plan "
    "serves every tenant, the policy side broadcasts, and at scale "
    "the semi-join compiles to a runtime/Bloom filter that prunes "
    "BEFORE expensive operators (the same mechanism as the "
    "dynamic-pruning test). Exact counting; nations absent from the "
    "policy show 100% hidden — deny-by-default.",
)
def q_etl_rls_filter(spark: SparkSession, sf_dir: str) -> DataFrame:
    c = load_table(spark, sf_dir, "customer")
    policy = c.sparkSession.createDataFrame(
        _POLICY, "p_nation int, p_segment string"
    )
    visible = c.join(
        F.broadcast(policy),
        (F.col("c_nationkey") == F.col("p_nation"))
        & (F.col("c_mktsegment") == F.col("p_segment")),
        "left_semi",
    ).select(F.col("c_custkey").alias("v_key"))
    j = c.join(visible, c.c_custkey == F.col("v_key"), "left")
    return j.groupBy("c_nationkey").agg(
        F.count("*").alias("n_customers"),
        F.count("v_key").alias("n_visible"),
        (F.count("*") - F.count("v_key")).alias("n_hidden"),
    )

@register(
    "q_etl_shard_manifest",
    oracle=f"""
        WITH c AS (
            SELECT doc_id, n_chars,
                   CAST(SUM(n_chars) OVER (ORDER BY doc_id
                        ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW)
                        AS BIGINT) AS cum
            FROM documents
        ),
        assigned AS (
            SELECT doc_id, n_chars,
                   (cum - n_chars) // {_SHARD_BYTES} AS shard
            FROM c
        )
        SELECT shard AS shard_id,
               CAST(COUNT(*) AS BIGINT) AS n_docs,
               CAST(SUM(n_chars) AS BIGINT) AS total_bytes,
               MIN(doc_id) AS first_doc,
               MAX(doc_id) AS last_doc
        FROM assigned
        GROUP BY shard
    """,
    section="E29",
    doc=f"Training-shard manifest: documents packed into ~{_SHARD_BYTES}"
    "-byte shards by cumulative size (shard = prefix-bytes DIV target "
    "— L15's prefix device on bytes, so shards are contiguous in "
    "doc_id order and sizes land within one document of the target); "
    "per shard: doc counts, byte totals, and the id range — exactly "
    "the manifest a dataloader or resumable exporter consumes. Pure "
    "integer prefix math. The shard id doubles as the writer's "
    "partitionBy key, so packing and writing are ONE pass; at 100 TB "
    "the prefix sum is the two-pass per-partition-offset pattern and "
    "the manifest stays ≤|shards| rows.",
)
def q_etl_shard_manifest(spark: SparkSession, sf_dir: str) -> DataFrame:
    docs = load_table(spark, sf_dir, "documents")
    # Scale note (r6): the byte prefix-sum that assigns shards runs on the
    # distributed two-pass cumulative operator — no single-partition
    # window over the corpus.
    from ai_to_cvent_etl_spark.operators.ranking import global_cumulative

    c = global_cumulative(
        docs.select("doc_id", "n_chars"),
        ["doc_id"],
        {"cum": F.col("n_chars")},
    )
    assigned = c.select(
        "doc_id",
        "n_chars",
        F.expr(f"(cum - n_chars) DIV {_SHARD_BYTES}").alias("shard"),
    )
    return assigned.groupBy(F.col("shard").alias("shard_id")).agg(
        F.count("*").alias("n_docs"),
        F.sum("n_chars").alias("total_bytes"),
        F.min("doc_id").alias("first_doc"),
        F.max("doc_id").alias("last_doc"),
    )

# ==== from analytics_r4f ===========================================

@register(
    "q_etl_backfill_plan",
    oracle="""
        WITH present AS (
            SELECT (date_part('year', o_orderdate) - 1995) * 12
                   + date_part('month', o_orderdate) - 1 AS m,
                   CAST(COUNT(*) AS BIGINT) AS n_rows
            FROM orders
            WHERE ((date_part('year', o_orderdate) - 1995) * 12
                   + date_part('month', o_orderdate) - 1) % 7 <> 3
            GROUP BY 1
        ),
        spine AS (
            SELECT unnest(generate_series(
                       (SELECT CAST(MIN(m) AS INT) FROM present),
                       (SELECT CAST(MAX(m) AS INT) FROM present)))
                   AS m
        ),
        joined AS (
            SELECT s.m, p.n_rows,
                   (SELECT pp.n_rows FROM present pp WHERE pp.m < s.m
                    ORDER BY pp.m DESC LIMIT 1) AS prev_rows,
                   (SELECT pn.n_rows FROM present pn WHERE pn.m > s.m
                    ORDER BY pn.m LIMIT 1) AS next_rows
            FROM spine s LEFT JOIN present p ON p.m = s.m
        )
        SELECT CAST(m AS BIGINT) AS missing_month,
               ROUND((CAST(coalesce(prev_rows, next_rows) AS DOUBLE)
                      + CAST(coalesce(next_rows, prev_rows) AS DOUBLE))
                     / 2.0, 2) AS est_rows
        FROM joined
        WHERE n_rows IS NULL
    """,
    section="E30",
    doc="Partition backfill planner: the expected month spine "
    "(generated from the observed min/max — F22's generator rule) "
    "LEFT-joined with the months actually present (every month ≡3 mod 7 "
    "is deterministically dropped so the planner is exercised "
    "non-vacuously at every SF); missing months carry a "
    "neighbor-interpolated "
    "row estimate (IGNORE NULLS lag/lead, edge months fall back to "
    "their single neighbor). The worklist an orchestrator turns into "
    "backfill jobs. Spine and anti-join are month-cardinality — "
    "metadata-scale regardless of row count.",
)
def q_etl_backfill_plan(spark: SparkSession, sf_dir: str) -> DataFrame:
    orders = load_table(spark, sf_dir, "orders")
    mo = (F.year("o_orderdate") - 1995) * 12 + F.month("o_orderdate") - 1
    present = (
        orders.where(mo % 7 != 3)
        .groupBy(mo.alias("m"))
        .agg(F.count("*").alias("n_rows"))
    )
    bounds = present.agg(
        F.min("m").alias("lo"), F.max("m").alias("hi")
    )
    spine = bounds.select(
        F.explode(F.sequence(F.col("lo"), F.col("hi"))).alias("m")
    )
    j = spine.join(present, "m", "left")
    joined = j.select(
        "m",
        "n_rows",
        F.expr("lag(n_rows) IGNORE NULLS OVER (ORDER BY m)").alias(
            "prev_rows"
        ),
        F.expr("lead(n_rows) IGNORE NULLS OVER (ORDER BY m)").alias(
            "next_rows"
        ),
    )
    return joined.where(F.col("n_rows").isNull()).select(
        F.col("m").cast("long").alias("missing_month"),
        F.round(
            (
                F.coalesce(F.col("prev_rows"), F.col("next_rows")).cast(
                    "double"
                )
                + F.coalesce(F.col("next_rows"), F.col("prev_rows")).cast(
                    "double"
                )
            )
            / 2.0,
            2,
        ).alias("est_rows"),
    )

# ==== from analytics_r4i ===========================================

@register(
    "q_etl_bitemporal",
    oracle="""
        WITH versions AS (
            -- version 1: original price, recorded at order date,
            --            valid from order date
            SELECT o_orderkey AS k, 1 AS ver,
                   o_orderdate AS valid_from,
                   o_orderdate AS recorded_at,
                   CAST(o_totalprice AS DECIMAL(18,2)) AS price
            FROM orders
            UNION ALL
            -- version 2 (every 4th key): a RETROACTIVE correction —
            -- recorded 30 days later, but valid from the original date
            SELECT o_orderkey, 2,
                   o_orderdate,
                   o_orderdate + INTERVAL 30 DAY,
                   CAST(o_totalprice AS DECIMAL(18,2))
                   + CAST(5 AS DECIMAL(18,2))
            FROM orders WHERE o_orderkey % 4 = 0
            UNION ALL
            -- version 3 (every 6th key): a FUTURE-dated change —
            -- recorded 10 days after the order, valid from +60 days
            SELECT o_orderkey, 3,
                   o_orderdate + INTERVAL 60 DAY,
                   o_orderdate + INTERVAL 10 DAY,
                   CAST(o_totalprice AS DECIMAL(18,2))
                   + CAST(9 AS DECIMAL(18,2))
            FROM orders WHERE o_orderkey % 6 = 0
        ),
        visible AS (
            -- belief as of T = order date + 20 days,
            -- about validity date V = order date + 90 days
            SELECT v.k, v.ver, v.price,
                   row_number() OVER (
                       PARTITION BY v.k
                       ORDER BY v.valid_from DESC, v.ver DESC
                   ) AS rn
            FROM versions v
            JOIN orders o ON o.o_orderkey = v.k
            WHERE v.recorded_at <= o.o_orderdate + INTERVAL 20 DAY
              AND v.valid_from <= o.o_orderdate + INTERVAL 90 DAY
        )
        SELECT k AS o_orderkey,
               CAST(ver AS INT) AS believed_version,
               CAST(price AS DOUBLE) AS believed_price
        FROM visible WHERE rn = 1
    """,
    section="E31",
    doc="Bitemporal reconstruction — the two-axis as-of a warehouse "
    "needs for audits and restatements: an append-only version store "
    "carries (valid_from, recorded_at) per version (original record; "
    "a RETROACTIVE correction recorded 30 days later but valid from "
    "the start; a FUTURE-dated change recorded early but valid from "
    "+60 days), and the query answers 'what did we BELIEVE at T=+20d "
    "about the state valid at V=+90d': filter recorded_at ≤ T (the "
    "knowledge axis — the retro fix is visible, version 3 is too), "
    "then latest valid_from ≤ V wins (the validity axis — so the "
    "future-dated change applies at V=+90d where J14's single-axis "
    "PIT would miss the knowledge cut entirely). One keyed rank per "
    "probe; at scale both axes ride J14's backward-asof machinery "
    "co-keyed — no new shuffle class.",
)
def q_etl_bitemporal(spark: SparkSession, sf_dir: str) -> DataFrame:
    orders = load_table(spark, sf_dir, "orders")
    p = F.col("o_totalprice").cast("decimal(18,2)")
    v1 = orders.select(
        F.col("o_orderkey").alias("k"),
        F.lit(1).alias("ver"),
        F.col("o_orderdate").alias("valid_from"),
        F.col("o_orderdate").alias("recorded_at"),
        p.alias("price"),
    )
    v2 = orders.where(F.col("o_orderkey") % 4 == 0).select(
        F.col("o_orderkey").alias("k"),
        F.lit(2).alias("ver"),
        F.col("o_orderdate").alias("valid_from"),
        F.expr("o_orderdate + INTERVAL 30 DAY").alias("recorded_at"),
        (p + F.lit(5).cast("decimal(18,2)")).alias("price"),
    )
    v3 = orders.where(F.col("o_orderkey") % 6 == 0).select(
        F.col("o_orderkey").alias("k"),
        F.lit(3).alias("ver"),
        F.expr("o_orderdate + INTERVAL 60 DAY").alias("valid_from"),
        F.expr("o_orderdate + INTERVAL 10 DAY").alias("recorded_at"),
        (p + F.lit(9).cast("decimal(18,2)")).alias("price"),
    )
    versions = v1.unionAll(v2).unionAll(v3)
    probes = orders.select(
        F.col("o_orderkey").alias("pk"),
        F.expr("o_orderdate + INTERVAL 20 DAY").alias("t_axis"),
        F.expr("o_orderdate + INTERVAL 90 DAY").alias("v_axis"),
    )
    j = versions.join(probes, versions.k == probes.pk).where(
        (F.col("recorded_at") <= F.col("t_axis"))
        & (F.col("valid_from") <= F.col("v_axis"))
    )
    from pyspark.sql import Window

    rn = F.row_number().over(
        Window.partitionBy("k").orderBy(
            F.desc("valid_from"), F.desc("ver")
        )
    )
    return (
        j.withColumn("rn", rn)
        .where(F.col("rn") == 1)
        .select(
            F.col("k").alias("o_orderkey"),
            F.col("ver").cast("int").alias("believed_version"),
            F.col("price").cast("double").alias("believed_price"),
        )
    )

@register(
    "q_etl_ttl_audit",
    oracle=f"""
        WITH policy AS (
            SELECT * FROM (VALUES
                {', '.join(f"('{t}', {d})" for t, d in _TTL_POLICY)}
            ) p(p_type, ttl_days)
        )
        SELECT e.event_type,
               p.ttl_days,
               CAST(COUNT(*) AS BIGINT) AS n_rows,
               CAST(SUM(CASE WHEN e.ts < TIMESTAMP '{_AS_OF}'
                                  - to_days(p.ttl_days)
                        THEN 1 ELSE 0 END) AS BIGINT) AS n_expired,
               ROUND(CAST(SUM(CASE WHEN e.ts < TIMESTAMP '{_AS_OF}'
                                        - to_days(p.ttl_days)
                              THEN 1 ELSE 0 END) AS DOUBLE)
                     / COUNT(*), 6) AS expired_share
        FROM events e JOIN policy p ON p.p_type = e.event_type
        GROUP BY e.event_type, p.ttl_days
    """,
    section="E32",
    doc="Retention-policy (TTL) audit: per-event-type TTLs as POLICY "
    f"DATA (errors 90 days, views 1 year, purchases 5 years), rows "
    f"classified against the {_AS_OF} as-of date, expired counts and "
    "shares per type — what a deletion sweep WOULD remove, reviewed "
    "before it runs (the governance counterpart of E22's quarantine "
    "and E17's k-anonymity). Exact timestamp arithmetic; the policy "
    "broadcasts. The audit is the deletion plan: with event-date "
    "partition layouts the sweep becomes partition drops, and the "
    "audit's per-type counts are the expected drop sizes — "
    "reconciled after the sweep with E7's checksums.",
)
def q_etl_ttl_audit(spark: SparkSession, sf_dir: str) -> DataFrame:
    ev = load_table(spark, sf_dir, "events")
    policy = ev.sparkSession.createDataFrame(
        _TTL_POLICY, "p_type string, ttl_days int"
    )
    j = ev.join(F.broadcast(policy), ev.event_type == F.col("p_type"))
    expired = F.col("ts") < F.expr(
        f"TIMESTAMP '{_AS_OF}' - make_dt_interval(ttl_days)"
    )
    return j.groupBy("event_type", "ttl_days").agg(
        F.count("*").alias("n_rows"),
        F.sum(F.when(expired, 1).otherwise(0)).alias("n_expired"),
        F.round(
            F.sum(F.when(expired, 1).otherwise(0)).cast("double")
            / F.count("*"),
            6,
        ).alias("expired_share"),
    )

@register(
    "q_etl_version_prune",
    oracle=f"""
        WITH ranked AS (
            SELECT o_custkey, o_orderkey, o_totalprice,
                   row_number() OVER (
                       PARTITION BY o_custkey
                       ORDER BY o_orderdate DESC, o_orderkey DESC
                   ) AS rn
            FROM orders
        )
        SELECT o_custkey,
               CAST(COUNT(*) AS BIGINT) AS n_versions,
               CAST(SUM(CASE WHEN rn > {_KEEP_N} THEN 1 ELSE 0 END)
                    AS BIGINT) AS n_purge,
               MIN(CASE WHEN rn > {_KEEP_N} THEN o_orderkey END)
                   AS oldest_purged_key,
               CAST(SUM(CASE WHEN rn > {_KEEP_N}
                        THEN CAST(o_totalprice AS DECIMAL(18,2))
                        ELSE CAST(0 AS DECIMAL(18,2)) END) AS DOUBLE)
                   AS purged_value
        FROM ranked
        GROUP BY o_custkey
        HAVING SUM(CASE WHEN rn > {_KEEP_N} THEN 1 ELSE 0 END) > 0
    """,
    section="E33",
    doc=f"Keep-last-{_KEEP_N} version retention: each customer's orders "
    "ranked newest-first (unique (date, key) tie-break), everything "
    "beyond the retention depth becomes the PURGE PLAN — per-customer "
    "purge counts, the oldest purged key, and the exact reclaimable "
    "value, emitted for review before any delete executes (E16's "
    "MERGE-delete applies it; E7's checksums reconcile it; E32's TTL "
    "is the time-based sibling and the two compose as an OR of "
    "plans). One keyed rank window — per-task state is one "
    "customer's versions.",
)
def q_etl_version_prune(spark: SparkSession, sf_dir: str) -> DataFrame:
    orders = load_table(spark, sf_dir, "orders")
    rn = F.row_number().over(
        Window.partitionBy("o_custkey").orderBy(
            F.desc("o_orderdate"), F.desc("o_orderkey")
        )
    )
    ranked = orders.select(
        "o_custkey", "o_orderkey", "o_totalprice", rn.alias("rn")
    )
    purged = F.col("rn") > _KEEP_N
    z = F.lit(0).cast("decimal(18,2)")
    out = ranked.groupBy("o_custkey").agg(
        F.count("*").alias("n_versions"),
        F.sum(F.when(purged, 1).otherwise(0)).alias("n_purge"),
        F.min(F.when(purged, F.col("o_orderkey"))).alias(
            "oldest_purged_key"
        ),
        F.sum(
            F.when(purged, F.col("o_totalprice").cast("decimal(18,2)"))
            .otherwise(z)
        )
        .cast("double")
        .alias("purged_value"),
    )
    return out.where(F.col("n_purge") > 0)

# ==== from analytics_r4r ===========================================

@register(
    "q_etl_header_detail",
    oracle="""
        WITH line_totals AS (
            SELECT l_orderkey,
                   CAST(COUNT(*) AS BIGINT) AS n_lines,
                   CAST(SUM(
                       (CAST(CAST(l_extendedprice AS DECIMAL(18,2)) * 100
                             AS BIGINT)
                        * CAST(CAST(1 - l_discount AS DECIMAL(18,2)) * 100
                               AS BIGINT)
                        * CAST(CAST(1 + l_tax AS DECIMAL(18,2)) * 100
                               AS BIGINT)) // 10000
                   ) AS BIGINT) AS line_cents
            FROM lineitem GROUP BY l_orderkey
        ),
        gaps AS (
            SELECT o.o_orderkey, lt.n_lines,
                   CAST(CAST(o.o_totalprice AS DECIMAL(18,2)) * 100
                        AS BIGINT) - lt.line_cents AS gap_cents
            FROM orders o JOIN line_totals lt
              ON lt.l_orderkey = o.o_orderkey
        )
        SELECT CASE WHEN gap_cents = 0 THEN 'exact'
                    WHEN abs(gap_cents) <= 100 THEN 'within_1_dollar'
                    WHEN abs(gap_cents) <= 10000 THEN 'within_100'
                    ELSE 'material' END AS band,
               CAST(COUNT(*) AS BIGINT) AS n_orders,
               CAST(SUM(abs(gap_cents)) AS BIGINT) AS total_abs_gap_cents,
               MIN(o_orderkey) AS sample_key
        FROM gaps
        GROUP BY 1
    """,
    section="E34",
    doc="Header/detail integrity audit: each order's header total vs "
    "its recomputed line total Σ price·(1−disc)·(1+tax) — both exact "
    "integer cents: the line term is a PURE-INTEGER product "
    "(price-cents × discount-bps × tax-bps, floor-divided back to "
    "cents) because chained wide-DECIMAL multiplies round at "
    "different intermediate scales on the two engines (observed) — "
    "with "
    "gaps classified into tolerance bands (exact / ≤$1 / ≤$100 / "
    "material), counts, total absolute drift, and a sample key per "
    "band. The order-book consistency check every billing ETL runs "
    "on every load (the synthetic fixture's headers are independent "
    "of its lines, so the bands are well-populated — the audit is "
    "exercised, not vacuous). One co-keyed reduction (lineitem "
    "collapses per order) + a 4-band rollup; J23's reconciliation at "
    "the header/detail grain.",
)
def q_etl_header_detail(spark: SparkSession, sf_dir: str) -> DataFrame:
    orders = load_table(spark, sf_dir, "orders")
    li = load_table(spark, sf_dir, "lineitem")
    line_term = F.expr(
        "(CAST(CAST(l_extendedprice AS DECIMAL(18,2)) * 100 AS BIGINT) "
        "* CAST(CAST(1 - l_discount AS DECIMAL(18,2)) * 100 AS BIGINT) "
        "* CAST(CAST(1 + l_tax AS DECIMAL(18,2)) * 100 AS BIGINT)) "
        "DIV 10000"
    )
    line_totals = li.groupBy("l_orderkey").agg(
        F.count("*").alias("n_lines"),
        F.sum(line_term).cast("long").alias("line_cents"),
    )
    gaps = orders.join(
        line_totals, orders.o_orderkey == line_totals.l_orderkey
    ).select(
        "o_orderkey",
        "n_lines",
        (
            F.expr(
                "CAST(CAST(o_totalprice AS DECIMAL(18,2)) * 100 AS BIGINT)"
            )
            - F.col("line_cents")
        ).alias("gap_cents"),
    )
    band = (
        F.when(F.col("gap_cents") == 0, "exact")
        .when(F.abs(F.col("gap_cents")) <= 100, "within_1_dollar")
        .when(F.abs(F.col("gap_cents")) <= 10000, "within_100")
        .otherwise("material")
    )
    return gaps.groupBy(band.alias("band")).agg(
        F.count("*").alias("n_orders"),
        F.sum(F.abs(F.col("gap_cents"))).alias("total_abs_gap_cents"),
        F.min("o_orderkey").alias("sample_key"),
    )

@register(
    "q_etl_ipf_reweight",
    oracle=_ipf_oracle(),
    section="E35",
    doc="Iterative proportional fitting (raking) of the documents corpus "
    "onto UNIFORM language x source target marginals: 3 rounds of "
    "row-fit-then-column-fit rescaling give each (lang, source) cell "
    "the sampling weight that makes the weighted corpus match the "
    "target mixture — the standard way an LLM data pipeline rebalances "
    "a crawl toward a prescribed domain/language mix without "
    "resampling (weights feed E9's weighted sampler or a loss "
    "weighting). Determinism: cell counts are exact integers; each "
    "marginal sum is quantized to micro-unit BIGINTs before summing "
    "(TS21 device — the cross-cell float sum is exact and order-free; "
    "residual floor-boundary flips are the documented rule-10 "
    "budget); each round is then row-local multiplication. Scale: ONE "
    "keyed count agg over the corpus collapses everything to "
    "|langs| x |sources| = 100 CELLS — the iteration runs on the cell "
    "table, never touching corpus rows again; window partitions are "
    "the 5/20 marginal keys of a 100-row frame. Convergence is "
    "geometric (documented classical result); 3 rounds measured "
    "max marginal error < 2e-6 on the sf0.1 fixture.",
)
def q_etl_ipf_reweight(spark: SparkSession, sf_dir: str) -> DataFrame:
    docs = load_table(spark, sf_dir, "documents")
    w_all = Window.partitionBy()
    cells = (
        docs.groupBy("lang", "source")
        .agg(F.count(F.lit(1)).cast("bigint").alias("n"))
        .withColumn("nn", F.sum("n").over(w_all).cast("bigint"))
        .withColumn("w", F.lit(1.0))
    )

    def qsum(over: Window) -> F.Column:
        return (
            F.sum(
                F.floor(F.col("w") * F.col("n") * 1e6).cast("bigint")
            ).over(over)
            / 1e6
        )

    df = cells
    for _ in range(_IPF_ROUNDS):
        df = df.withColumn(
            "w",
            F.col("w")
            * ((F.col("nn") / 5.0) / qsum(Window.partitionBy("lang"))),
        )
        df = df.withColumn(
            "w",
            F.col("w")
            * ((F.col("nn") / 20.0) / qsum(Window.partitionBy("source"))),
        )
    return df.select(
        "lang",
        "source",
        F.col("n").alias("n_docs"),
        F.round("w", 6).alias("weight"),
        F.round(F.col("w") * F.col("n") / F.col("nn"), 6).alias(
            "weighted_share"
        ),
    )

@register(
    "q_etl_l_diversity",
    oracle=f"""
        WITH s AS (
            SELECT c_nationkey, c_mktsegment,
                   CASE WHEN c_acctbal < 0 THEN 'debt'
                        WHEN c_acctbal < 5000 THEN 'low'
                        ELSE 'high' END AS sens
            FROM customer
        )
        SELECT c_nationkey, c_mktsegment,
               CAST(COUNT(*) AS BIGINT) AS n_rows,
               CAST(COUNT(DISTINCT sens) AS BIGINT) AS l_distinct,
               COUNT(DISTINCT sens) >= {_LDIV_L} AS l_diverse
        FROM s
        GROUP BY c_nationkey, c_mktsegment
    """,
    section="E36",
    doc=f"l-diversity audit — the release gate k-anonymity (E17) misses: "
    "an equivalence class can be k-anonymous yet leak its sensitive "
    "attribute completely if every member shares the same value "
    "(homogeneity attack). Classes are the (nation, market segment) "
    f"quasi-identifier groups; the sensitive attribute is the account-"
    f"balance band; a class passes iff it contains >= {_LDIV_L} "
    "DISTINCT sensitive values. Emits every class with its size and "
    "distinct-l so the suppression decision is auditable (failing "
    "classes feed E22's quarantine the same way E17's under-k rows "
    "do). Exact integer counting only. Scale: one keyed agg; "
    "COUNT(DISTINCT) expands to the standard two-level agg on "
    "(class, sens) — the sensitive domain is 3 values, so the "
    "expansion is bounded at 3x class count; no skew concern.",
)
def q_etl_l_diversity(spark: SparkSession, sf_dir: str) -> DataFrame:
    cust = load_table(spark, sf_dir, "customer")
    s = cust.select(
        "c_nationkey",
        "c_mktsegment",
        F.when(F.col("c_acctbal") < 0, "debt")
        .when(F.col("c_acctbal") < 5000, "low")
        .otherwise("high")
        .alias("sens"),
    )
    return s.groupBy("c_nationkey", "c_mktsegment").agg(
        F.count(F.lit(1)).cast("bigint").alias("n_rows"),
        F.countDistinct("sens").cast("bigint").alias("l_distinct"),
        (F.countDistinct("sens") >= _LDIV_L).alias("l_diverse"),
    )

@register(
    "q_etl_fd_audit",
    oracle=" UNION ALL ".join(
        f"""
        SELECT '{t}.{lhs}->{rhs}' AS candidate,
               CAST(COUNT(*) AS BIGINT) AS n_lhs,
               CAST(SUM(nr) AS BIGINT) AS n_pairs,
               CAST(SUM(CASE WHEN nr > 1 THEN 1 ELSE 0 END) AS BIGINT)
                   AS n_violating,
               CAST(MAX(nr) AS BIGINT) AS max_rhs_per_lhs,
               MAX(nr) = 1 AS holds
        FROM (
            SELECT {lhs}, CAST(COUNT(DISTINCT {rhs}) AS BIGINT) AS nr
            FROM {t} GROUP BY {lhs}
        )
        """
        for t, lhs, rhs in _FD_CANDIDATES
    ),
    section="E37",
    doc="Functional-dependency audit: for each declared candidate "
    "dependency lhs -> rhs, measure whether it HOLDS (every lhs value "
    "maps to exactly one rhs value), how many lhs keys violate it, "
    "and the worst fan-out — the constraint-discovery profile a data "
    "contract needs before declaring a column derivable (FD holds "
    "iff count(distinct lhs) = count(distinct (lhs,rhs))). Candidates "
    "span true FDs (orderkey->custkey, nationkey->regionkey) and "
    "expected violations (partkey->suppkey multi-sourcing, "
    "user->event_type). Each candidate is ONE map-side-combinable "
    "two-level aggregation (distinct-pair collapse, then per-lhs "
    "fan-out stats) — no joins, no windows; the 5 audit rows union at "
    "the driver. At 100 TB each candidate is a single shuffle on the "
    "lhs key, and AQE coalesces the tiny result.",
)
def q_etl_fd_audit(spark: SparkSession, sf_dir: str) -> DataFrame:
    out = None
    for t, lhs, rhs in _FD_CANDIDATES:
        tbl = load_table(spark, sf_dir, t)
        per_lhs = tbl.groupBy(lhs).agg(
            F.countDistinct(rhs).cast("bigint").alias("nr")
        )
        row = per_lhs.agg(
            F.count(F.lit(1)).cast("bigint").alias("n_lhs"),
            F.sum("nr").cast("bigint").alias("n_pairs"),
            F.sum(F.when(F.col("nr") > 1, 1).otherwise(0))
            .cast("bigint")
            .alias("n_violating"),
            F.max("nr").cast("bigint").alias("max_rhs_per_lhs"),
            (F.max("nr") == 1).alias("holds"),
        ).select(
            F.lit(f"{t}.{lhs}->{rhs}").alias("candidate"),
            "n_lhs",
            "n_pairs",
            "n_violating",
            "max_rhs_per_lhs",
            "holds",
        )
        out = row if out is None else out.unionAll(row)
    return out

@register(
    "q_etl_volume_anomaly",
    oracle=f"""
        WITH daily AS (
            SELECT CAST(ts AS DATE) AS day,
                   CAST(COUNT(*) AS BIGINT) AS n
            FROM events GROUP BY 1
        ),
        med AS (SELECT median(n) AS med FROM daily),
        mad AS (
            SELECT median(abs(n - med)) AS mad FROM daily CROSS JOIN med
        )
        SELECT day, n,
               ROUND((n - med) / ({_MAD_SCALE} * mad), 4) AS robust_z,
               abs((n - med) / ({_MAD_SCALE} * mad)) > {_VOL_Z_MAX}
                   AS is_anomaly
        FROM daily CROSS JOIN med CROSS JOIN mad
    """,
    section="E38",
    doc="Ingest-volume anomaly monitor: per-day row counts scored with "
    "the ROBUST z (median/MAD, sigma-scaled 1.4826) — the volume "
    "alarm every feed needs before freshness (E26) and distribution "
    "(E19 PSI) checks even run; median/MAD instead of mean/std "
    "because the anomaly you're hunting corrupts the mean/std "
    "baseline itself (a 10x backfill day drags the mean, masks "
    "itself, and flags normal days). Counts are exact integers; "
    "median = Spark `percentile` vs DuckDB `median` (both "
    "interpolate at 0.5 — the A13 pairing); robust_z is row-local. "
    "Scale: one keyed count collapses volume to day grain (a few "
    "thousand rows at ANY event volume), then two broadcast scalars "
    "— the monitor costs one scan.",
)
def q_etl_volume_anomaly(spark: SparkSession, sf_dir: str) -> DataFrame:
    ev = load_table(spark, sf_dir, "events")
    daily = ev.groupBy(F.col("ts").cast("date").alias("day")).agg(
        F.count(F.lit(1)).cast("bigint").alias("n")
    )
    med = daily.agg(F.expr("percentile(n, 0.5)").alias("med"))
    mad = (
        daily.crossJoin(F.broadcast(med))
        .agg(F.expr("percentile(abs(n - med), 0.5)").alias("mad"))
    )
    rz = (F.col("n") - F.col("med")) / (_MAD_SCALE * F.col("mad"))
    return (
        daily.crossJoin(F.broadcast(med))
        .crossJoin(F.broadcast(mad))
        .select(
            "day",
            "n",
            F.round(rz, 4).alias("robust_z"),
            (F.abs(rz) > _VOL_Z_MAX).alias("is_anomaly"),
        )
    )

@register(
    "q_etl_pk_discovery",
    oracle=" UNION ALL ".join(
        f"""
        SELECT '{t}.{c1}{"+" + c2 if c2 else ""}' AS candidate,
               CAST(COUNT(*) AS BIGINT) AS n_rows,
               CAST(COUNT(DISTINCT ({c1}{", " + c2 if c2 else ""}))
                    AS BIGINT) AS n_distinct,
               CAST(COUNT(*) - COUNT(DISTINCT ({c1}{", " + c2 if c2 else ""}))
                    AS BIGINT) AS n_dup_rows,
               COUNT(*) = COUNT(DISTINCT ({c1}{", " + c2 if c2 else ""}))
                   AS is_key
        FROM {t}
        """
        for t, c1, c2 in _PK_CANDIDATES
    ),
    section="E40",
    doc="Primary-key discovery audit: for each declared candidate "
    "(single columns and the composite (orderkey, linenumber)), "
    "uniqueness = distinct count vs row count, duplicate-row count, "
    "and the is_key verdict — E37's FD audit asks 'does lhs "
    "determine rhs'; this asks 'does the candidate determine the "
    "ROW', the prerequisite for merge keys (E16), CDC grains (E25), "
    "and the reconciliation joins. Deliberately includes failing "
    "candidates (l_orderkey alone, o_custkey) so the report shape "
    "covers both verdicts at every SF — and the fixture's own "
    "surprise: (orderkey, linenumber) is NOT unique in this data "
    "(the G16 discovery), which is exactly what this audit exists "
    "to catch before a MERGE silently multiplies rows. Scale: one "
    "distinct-collapse per candidate, map-side combinable.",
)
def q_etl_pk_discovery(spark: SparkSession, sf_dir: str) -> DataFrame:
    out = None
    for t, c1, c2 in _PK_CANDIDATES:
        tbl = load_table(spark, sf_dir, t)
        cols = [c1] + ([c2] if c2 else [])
        name = f"{t}.{c1}" + (f"+{c2}" if c2 else "")
        row = tbl.agg(
            F.count(F.lit(1)).cast("bigint").alias("n_rows"),
            F.countDistinct(*cols).cast("bigint").alias("n_distinct"),
        ).select(
            F.lit(name).alias("candidate"),
            "n_rows",
            "n_distinct",
            (F.col("n_rows") - F.col("n_distinct"))
            .cast("bigint")
            .alias("n_dup_rows"),
            (F.col("n_rows") == F.col("n_distinct")).alias("is_key"),
        )
        out = row if out is None else out.unionAll(row)
    return out

@register(
    "q_etl_byte_budget_sample",
    oracle=f"""
        WITH ranked AS (
            SELECT source, doc_id, n_chars,
                   SUM(n_chars) OVER (
                        PARTITION BY source
                        ORDER BY md5(CAST(doc_id AS VARCHAR)), doc_id
                        ROWS BETWEEN UNBOUNDED PRECEDING
                        AND CURRENT ROW) AS cum_chars
            FROM documents
        )
        SELECT source,
               CAST(COUNT(*) AS BIGINT) AS n_selected,
               CAST(SUM(n_chars) AS BIGINT) AS chars_selected,
               CAST(MAX(cum_chars) AS BIGINT) AS cum_at_cut
        FROM ranked
        WHERE cum_chars <= {_BYTE_BUDGET}
        GROUP BY source
    """,
    section="E41",
    doc=f"Byte-budgeted stratified sampling: per source stratum, take "
    "documents in deterministic md5(doc_id) order until the running "
    f"character total exceeds {_BYTE_BUDGET} — the TOKEN-BUDGET "
    "selection every training-mix recipe actually needs (E9's "
    "stratified sample fixes ROW counts, but mixture specs are "
    "written in tokens/bytes; row sampling over-weights strata with "
    "long documents). The hash order makes the draw reproducible "
    "and refresh-stable (same docs survive a re-run; new docs slot "
    "into hash order without reshuffling survivors ahead of them). "
    "One windowed running sum per stratum — exact integers, no "
    "floats anywhere. Scale: the window partitions by source "
    "(shuffle on the stratum key only; payload text is not in the "
    "plan — n_chars rides the manifest), and the cumulative cut "
    "means each stratum reads only until its budget at execution "
    "time under a rank-pushdown layout.",
)
def q_etl_byte_budget_sample(spark: SparkSession, sf_dir: str) -> DataFrame:
    docs = load_table(spark, sf_dir, "documents")
    w = (
        Window.partitionBy("source")
        .orderBy(F.md5(F.col("doc_id").cast("string")), "doc_id")
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    )
    ranked = docs.select(
        "source",
        "doc_id",
        "n_chars",
        F.sum("n_chars").over(w).alias("cum_chars"),
    )
    return (
        ranked.where(F.col("cum_chars") <= _BYTE_BUDGET)
        .groupBy("source")
        .agg(
            F.count(F.lit(1)).cast("bigint").alias("n_selected"),
            F.sum("n_chars").cast("bigint").alias("chars_selected"),
            F.max("cum_chars").cast("bigint").alias("cum_at_cut"),
        )
    )

@register(
    "q_etl_range_split_plan",
    oracle=f"""
        WITH v AS (
            SELECT CAST(CAST(o_totalprice AS DECIMAL(18,2)) * 100
                        AS BIGINT) AS cents
            FROM orders
        ),
        b AS (
            SELECT cents, ntile({_RANGE_BINS}) OVER (ORDER BY cents) AS bin
            FROM v
        )
        SELECT CAST(bin AS INTEGER) AS bin,
               CAST(COUNT(*) AS BIGINT) AS n_rows,
               CAST(MIN(cents) AS BIGINT) AS lo_cents,
               CAST(MAX(cents) AS BIGINT) AS hi_cents
        FROM b GROUP BY bin
    """,
    section="E42",
    doc=f"Range-partitioning split plan: equi-depth boundaries for "
    f"{_RANGE_BINS} output ranges over exact order-price cents — the "
    "planning artifact behind `repartitionByRange` / sorted-write "
    "layouts (E23's compaction plan sizes FILES, E28's Z-order "
    "interleaves two dims; this picks the 1-D RANGE CUTS so every "
    "output partition carries equal rows, which is what keeps a "
    "100 TB sorted write skew-free when the value distribution is "
    "lumpy). ntile's remainder rule (first n%k bins get the extra "
    "row) is identical on both engines over the totally-ordered "
    "exact cents, so bin populations and boundaries hash-match. "
    "Scale note: the global ntile here is the exact small-SF form; "
    "at 100 TB the SAME plan comes from `approx_percentile` cuts "
    "(A20's sketch) or Spark's own range-partitioner SAMPLING — "
    "equal-depth is the contract, the estimator is swappable.",
)
def q_etl_range_split_plan(spark: SparkSession, sf_dir: str) -> DataFrame:
    od = load_table(spark, sf_dir, "orders")
    v = od.select(
        F.expr(
            "cast(cast(o_totalprice as decimal(18,2)) * 100 as bigint)"
        ).alias("cents")
    )
    # Scale note (r6): NTILE over the global cents order computed
    # arithmetically from the distributed global row number (tie placement
    # across a bin boundary is arbitrary in ANY ntile implementation and
    # cannot change per-bin counts or min/max, so the output is identical).
    from ai_to_cvent_etl_spark.operators.ranking import (
        global_row_number,
        ntile_from_rn,
    )

    nv = v.agg(F.count(F.lit(1)).alias("__n"))
    b = (
        global_row_number(v, ["cents"], out_col="_grn")
        .crossJoin(F.broadcast(nv))
        .select(
            "cents",
            ntile_from_rn(F.col("_grn"), F.col("__n"), _RANGE_BINS).alias(
                "bin"
            ),
        )
    )
    return b.groupBy(F.col("bin").cast("int").alias("bin")).agg(
        F.count(F.lit(1)).cast("bigint").alias("n_rows"),
        F.min("cents").cast("bigint").alias("lo_cents"),
        F.max("cents").cast("bigint").alias("hi_cents"),
    )

@register(
    "q_etl_kfold_balance",
    oracle=f"""
        WITH assigned AS (
            SELECT abs(hash(CAST(o_orderkey AS VARCHAR))) % {_KFOLD_K}
                       AS fold_md5_free,
                   CAST(
                     CAST('0x' || substr(md5(CAST(o_orderkey AS VARCHAR)),
                                         1, 8) AS BIGINT)
                     % {_KFOLD_K} AS INT) AS fold,
                   CASE WHEN o_orderstatus = 'F' THEN 1 ELSE 0 END AS conv
            FROM orders
        ),
        per_fold AS (
            SELECT fold,
                   CAST(COUNT(*) AS BIGINT) AS n_rows,
                   CAST(SUM(conv) AS BIGINT) AS n_conv
            FROM assigned GROUP BY fold
        ),
        spread AS (
            SELECT CAST(MAX(n_rows) - MIN(n_rows) AS BIGINT)
                       AS row_spread,
                   CAST(SUM(n_rows) AS BIGINT) AS n_total
            FROM per_fold
        )
        SELECT p.fold, p.n_rows, p.n_conv,
               ROUND(CAST(p.n_conv AS DOUBLE) / p.n_rows, 6)
                   AS conv_rate,
               s.row_spread,
               CAST(s.row_spread * 100 <= s.n_total AS BOOLEAN)
                   AS balanced_within_1pct
        FROM per_fold p CROSS JOIN spread s
    """,
    section="E43",
    doc=f"K-fold assignment balance audit (k={_KFOLD_K}): deterministic "
    "md5-prefix fold assignment per order key, then per-fold row "
    "counts, conversion rates, and the max-min row spread with a "
    "1%-of-total balance verdict — the pre-flight check before any "
    "cross-validated evaluation (E9's train/test split is one cut; "
    "CV needs k cuts AND evidence they're exchangeable — a skewed "
    "fold silently biases every fold-averaged metric, and a "
    "conversion-rate outlier fold flags hash-correlated structure "
    "in the key). The md5 device is E9's (first 8 hex chars as "
    "int64 — engine-portable, refresh-stable; native hash() is NOT "
    "portable cross-engine, the documented trap). All counts exact; "
    "rate/verdict single expressions. Scale: map-side fold "
    "assignment, one {_KFOLD_K}-row reduction.",
)
def q_etl_kfold_balance(spark: SparkSession, sf_dir: str) -> DataFrame:
    od = load_table(spark, sf_dir, "orders")
    fold = F.expr(
        f"cast(conv(substr(md5(cast(o_orderkey as string)), 1, 8),"
        f" 16, 10) as bigint) % {_KFOLD_K}"
    ).cast("int")
    assigned = od.select(
        fold.alias("fold"),
        F.when(F.col("o_orderstatus") == "F", 1).otherwise(0).alias("conv"),
    )
    per_fold = assigned.groupBy("fold").agg(
        F.count(F.lit(1)).cast("bigint").alias("n_rows"),
        F.sum("conv").cast("bigint").alias("n_conv"),
    )
    spread = per_fold.agg(
        (F.max("n_rows") - F.min("n_rows")).cast("bigint").alias(
            "row_spread"
        ),
        F.sum("n_rows").cast("bigint").alias("n_total"),
    )
    return per_fold.crossJoin(F.broadcast(spread)).select(
        "fold",
        "n_rows",
        "n_conv",
        F.round(
            F.col("n_conv").cast("double") / F.col("n_rows"), 6
        ).alias("conv_rate"),
        "row_spread",
        (F.col("row_spread") * 100 <= F.col("n_total")).alias(
            "balanced_within_1pct"
        ),
    )

@register(
    "q_etl_corpus_health",
    oracle="""
        WITH base AS MATERIALIZED (
            SELECT doc_id, lang, source, n_chars,
                   string_split(text, ' ') AS toks,
                   md5(array_to_string(string_split(text, ' ')[1:8], ' '))
                       AS ph
            FROM documents
        ),
        prefix_dups AS (
            SELECT ph FROM base GROUP BY ph HAVING COUNT(*) >= 2
        ),
        per_doc AS (
            SELECT b.lang, b.doc_id, b.n_chars,
                   CAST(len(b.toks) AS BIGINT) AS n_tok,
                   CASE WHEN p.ph IS NOT NULL THEN 1 ELSE 0 END
                       AS in_prefix_dup
            FROM base b LEFT JOIN prefix_dups p ON p.ph = b.ph
        ),
        vocab AS (
            SELECT lang,
                   CAST(COUNT(*) AS BIGINT) AS n_types,
                   CAST(SUM(CASE WHEN n = 1 THEN 1 ELSE 0 END)
                        AS BIGINT) AS n_hapax
            FROM (
                SELECT lang, tok, COUNT(*) AS n
                FROM (SELECT lang, unnest(toks) AS tok FROM base)
                GROUP BY lang, tok
            ) GROUP BY lang
        )
        SELECT d.lang,
               CAST(COUNT(*) AS BIGINT) AS n_docs,
               CAST(SUM(d.n_chars) AS BIGINT) AS total_chars,
               CAST(SUM(d.n_tok) AS BIGINT) AS total_tokens,
               ROUND(CAST(SUM(d.n_tok) AS DOUBLE) / COUNT(*), 4)
                   AS mean_tokens_per_doc,
               MAX(v.n_types) AS vocab_size,
               ROUND(CAST(MAX(v.n_hapax) AS DOUBLE) / MAX(v.n_types), 4)
                   AS hapax_share,
               CAST(SUM(d.in_prefix_dup) AS BIGINT) AS n_prefix_dup_docs,
               ROUND(CAST(SUM(d.in_prefix_dup) AS DOUBLE) / COUNT(*), 4)
                   AS prefix_dup_share
        FROM per_doc d JOIN vocab v ON v.lang = d.lang
        GROUP BY d.lang
    """,
    section="E44",
    doc="Corpus-health report per language partition: document/char/"
    "token volume, mean length, vocabulary size, hapax share, and "
    "the template-prefix duplicate share — ONE artifact composing "
    "the map-only tier of the curation toolkit (D21's prefix hash, "
    "L25's hapax tail, L1's volume stats) into the dashboard row a "
    "data owner reads BEFORE dispatching the expensive passes "
    "(low hapax + high prefix-dup = templated, send to D1/D21; "
    "healthy tail + clean prefixes = skip straight to mixing). "
    "Deliberately contains NO pair joins, explodes-then-collapses "
    "once for vocabulary — every metric is a group count, so the "
    "report costs one scan at ANY corpus size; that cheapness is "
    "the point (health checks run on every ingest batch, the deep "
    "audits run on demand). All counts exact; shares single "
    "divisions.",
)
def q_etl_corpus_health(spark: SparkSession, sf_dir: str) -> DataFrame:
    docs = load_table(spark, sf_dir, "documents")
    toks = F.split(F.col("text"), " ")
    base = docs.select(
        "doc_id",
        "lang",
        "n_chars",
        toks.alias("toks"),
        F.md5(F.array_join(F.slice(toks, 1, 8), " ")).alias("ph"),
    )
    prefix_dups = (
        base.groupBy("ph")
        .agg(F.count(F.lit(1)).alias("npd"))
        .where(F.col("npd") >= 2)
        .select("ph")
    )
    per_doc = base.join(
        F.broadcast(prefix_dups.withColumn("hit", F.lit(1))), "ph", "left"
    ).select(
        "lang",
        "n_chars",
        F.size("toks").cast("bigint").alias("n_tok"),
        F.coalesce("hit", F.lit(0)).alias("in_prefix_dup"),
    )
    vocab = (
        base.select("lang", F.explode("toks").alias("tok"))
        .groupBy("lang", "tok")
        .agg(F.count(F.lit(1)).alias("n"))
        .groupBy("lang")
        .agg(
            F.count(F.lit(1)).cast("bigint").alias("n_types"),
            F.sum(F.when(F.col("n") == 1, 1).otherwise(0))
            .cast("bigint")
            .alias("n_hapax"),
        )
    )
    return (
        per_doc.groupBy("lang")
        .agg(
            F.count(F.lit(1)).cast("bigint").alias("n_docs"),
            F.sum("n_chars").cast("bigint").alias("total_chars"),
            F.sum("n_tok").cast("bigint").alias("total_tokens"),
            F.round(
                F.sum("n_tok").cast("double") / F.count(F.lit(1)), 4
            ).alias("mean_tokens_per_doc"),
            F.sum("in_prefix_dup").cast("bigint").alias("n_prefix_dup_docs"),
            F.round(
                F.sum("in_prefix_dup").cast("double") / F.count(F.lit(1)),
                4,
            ).alias("prefix_dup_share"),
        )
        .join(F.broadcast(vocab), "lang")
        .select(
            "lang",
            "n_docs",
            "total_chars",
            "total_tokens",
            "mean_tokens_per_doc",
            F.col("n_types").alias("vocab_size"),
            F.round(
                F.col("n_hapax").cast("double") / F.col("n_types"), 4
            ).alias("hapax_share"),
            "n_prefix_dup_docs",
            "prefix_dup_share",
        )
    )

@register(
    "q_etl_bucket_plan",
    oracle=f"""
        WITH stats AS (
            SELECT CAST(COUNT(*) AS BIGINT) AS n_rows,
                   CAST(COUNT(DISTINCT l_orderkey) AS BIGINT) AS n_keys
            FROM lineitem
        ),
        raw AS (
            SELECT n_rows, n_keys,
                   CAST((n_rows + {_BUCKET_TARGET_ROWS} - 1)
                        // {_BUCKET_TARGET_ROWS} AS BIGINT) AS raw_buckets
            FROM stats
        )
        SELECT n_rows, n_keys,
               raw_buckets,
               CAST(power(2, CAST(ceil(ln(CAST(raw_buckets AS DOUBLE))
                                       / ln(2.0)) AS BIGINT))
                    AS BIGINT) AS n_buckets_pow2,
               ROUND(CAST(n_rows AS DOUBLE)
                     / power(2, CAST(ceil(ln(CAST(raw_buckets AS DOUBLE))
                                          / ln(2.0)) AS BIGINT)), 2)
                   AS rows_per_bucket,
               ROUND(CAST(n_keys AS DOUBLE)
                     / power(2, CAST(ceil(ln(CAST(raw_buckets AS DOUBLE))
                                          / ln(2.0)) AS BIGINT)), 2)
                   AS keys_per_bucket
        FROM raw
    """,
    section="E45",
    doc=f"Bucket-layout plan for a co-located join table: bucket count "
    f"= rows / {_BUCKET_TARGET_ROWS} target, rounded UP to a power "
    "of two (so future 2x re-bucketing splits files instead of "
    "reshuffling everything — the reason every serious bucketing "
    "convention is power-of-2), with the implied rows- and "
    "KEYS-per-bucket (keys/bucket <= ~1 means bucketing adds "
    "nothing over the key itself). Completes the physical-layout "
    "planning trio: E23 sizes compaction, E42 cuts ranges, this "
    "picks the bucket count that tests/test_bucketing.py's "
    "shuffle-free join contract then relies on. Counts exact; the "
    "power-of-2 roundup is ceil(log2) on an exact integer (1-ulp "
    "ln risk sits far from integer boundaries for non-power "
    "inputs; powers hit the boundary exactly on both engines). "
    "Scale: one reduction — the plan costs nothing next to the "
    "write it shapes.",
)
def q_etl_bucket_plan(spark: SparkSession, sf_dir: str) -> DataFrame:
    li = load_table(spark, sf_dir, "lineitem")
    stats = li.agg(
        F.count(F.lit(1)).cast("bigint").alias("n_rows"),
        F.countDistinct("l_orderkey").cast("bigint").alias("n_keys"),
    )
    raw_buckets = (
        (F.col("n_rows") + _BUCKET_TARGET_ROWS - 1)
        / F.lit(_BUCKET_TARGET_ROWS)
    ).cast("bigint")
    raw = stats.select("n_rows", "n_keys", raw_buckets.alias("raw_buckets"))
    pow2 = F.pow(
        F.lit(2.0),
        F.ceil(
            F.log(F.col("raw_buckets").cast("double")) / F.log(F.lit(2.0))
        ).cast("bigint"),
    )
    return raw.select(
        "n_rows",
        "n_keys",
        "raw_buckets",
        pow2.cast("bigint").alias("n_buckets_pow2"),
        F.round(F.col("n_rows").cast("double") / pow2, 2).alias(
            "rows_per_bucket"
        ),
        F.round(F.col("n_keys").cast("double") / pow2, 2).alias(
            "keys_per_bucket"
        ),
    )
