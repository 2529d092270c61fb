"""Twenty-fifth-wave operators (r3 continuation): Python DataSource,
rank movement, lateness audit, URL canonicalization dedup.

  S9  q_python_datasource — the Spark 4 Python DataSource API: a
                            custom partitioned batch source registered
                            with spark.dataSource.register and read via
                            spark.read.format(...) — the user-defined
                            connector surface, verified against a
                            closed-form oracle.
  W26 q_win_rank_delta    — period-over-period rank movement: national
                            revenue ranks 1996 vs 1997 and the delta —
                            the 'movers' report.
  E27 q_etl_lateness_audit — batch replay of streaming watermark
                            semantics: deterministic arrival delays,
                            running event-time watermark in ARRIVAL
                            order, per-window late-drop counts — the
                            batch twin of ST4's live watermark test.
  D14 q_dedup_url_canonical — URL canonicalization dedup: messy
                            variants (case, default port, param order,
                            fragments) collapse under a canonicalizer
                            built from split/sort/join — the crawl
                            dedup step BEFORE content hashing.

Determinism notes (SURVEY §5.3):
  * S9 emits a closed-form integer sequence — exact.
  * W26: ranks over exact DECIMAL revenue sums with nation tie-break.
  * E27 is pure integer microsecond arithmetic (running max over a
    unique (arrival, event_id) order).
  * D14 is pure string algebra; the param sort is array_sort/list_sort
    on '&'-split tokens (binary order both engines).

Scale notes:
  * S9: partitions() is the parallelism contract — each InputPartition
    reads independently (here 4 synthetic shards; in production one
    per API page range / kafka partition / file). Python-side reads
    pay the boundary once per partition, not per row (batched Arrow).
  * W26 collapses to |nations| rows before ranking.
  * E27: the running watermark is an unpartitioned window in arrival
    order — bounded here; a partitioned production audit runs it per
    source partition exactly like the real stream (watermarks are
    per-partition-min in Spark).
  * D14 is map-only canonicalization + one keyed reduction on the
    canonical key — at crawl scale this IS the pre-shuffle key that
    co-locates all variants of a page.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession, Window
from pyspark.sql import functions as F

from ai_to_cvent_etl_spark.io import load_table
from ai_to_cvent_etl_spark.registry import register

# --- S9: Python DataSource ---------------------------------------------------

_PDS_ROWS_PER_PART = 250
_PDS_PARTS = 4


def _make_feed_source():
    """Build the DataSource class lazily (import needs a live pyspark).
    Cited API: pyspark.sql.datasource.DataSource (public since Spark 4.0)."""
    from pyspark.sql.datasource import (
        DataSource,
        DataSourceReader,
        InputPartition,
    )

    class FeedReader(DataSourceReader):
        def __init__(self, options):
            self.rows = int(options.get("rows_per_part", _PDS_ROWS_PER_PART))
            self.parts = int(options.get("parts", _PDS_PARTS))

        def partitions(self):
            return [InputPartition(i) for i in range(self.parts)]

        def read(self, partition):
            base = partition.value * self.rows
            for i in range(self.rows):
                rid = base + i
                yield (rid, partition.value, (rid * 2654435761) % 1000003)

    class FeedSource(DataSource):
        @classmethod
        def name(cls):
            return "synthetic_feed"

        def schema(self):
            return "rec_id bigint, part int, payload bigint"

        def reader(self, schema):
            return FeedReader(self.options)

    return FeedSource


@register(
    "q_python_datasource",
    oracle=f"""
        SELECT g.g AS rec_id,
               CAST(g.g // {_PDS_ROWS_PER_PART} AS INT) AS part,
               (g.g * 2654435761) % 1000003 AS payload
        FROM generate_series(0, {_PDS_PARTS * _PDS_ROWS_PER_PART - 1}) g(g)
    """,
    section="S9",
    doc="The Spark 4 Python DataSource API (user-defined connector "
    "surface): a custom partitioned batch source — partitions() "
    "declares 4 independent InputPartitions, read(partition) yields "
    "that shard's rows — registered via spark.dataSource.register and "
    "consumed with spark.read.format('synthetic_feed'). The emitted "
    "feed is a closed-form integer sequence (Knuth-hash payload), so "
    "the oracle is a generate_series expression. This is how a REST/"
    "API/queue source that has no JVM connector plugs into the engine: "
    "partitions map to page ranges or topic partitions, and the "
    "Python boundary is paid per partition batch, not per row.",
)
def q_python_datasource(spark: SparkSession, sf_dir: str) -> DataFrame:
    spark.dataSource.register(_make_feed_source())
    return (
        spark.read.format("synthetic_feed")
        .option("rows_per_part", _PDS_ROWS_PER_PART)
        .option("parts", _PDS_PARTS)
        .load()
    )


# --- W26: period-over-period rank movement -----------------------------------


@register(
    "q_win_rank_delta",
    oracle="""
        WITH rev AS (
            SELECT c.c_nationkey AS nation,
                   SUM(CASE WHEN o.o_orderdate >= TIMESTAMP '1996-01-01'
                             AND o.o_orderdate < TIMESTAMP '1997-01-01'
                       THEN CAST(o.o_totalprice AS DECIMAL(18,2))
                       ELSE CAST(0 AS DECIMAL(18,2)) END) AS r96,
                   SUM(CASE WHEN o.o_orderdate >= TIMESTAMP '1997-01-01'
                             AND o.o_orderdate < TIMESTAMP '1998-01-01'
                       THEN CAST(o.o_totalprice AS DECIMAL(18,2))
                       ELSE CAST(0 AS DECIMAL(18,2)) END) AS r97
            FROM orders o JOIN customer c ON c.c_custkey = o.o_custkey
            GROUP BY c.c_nationkey
        )
        SELECT nation,
               CAST(r96 AS DOUBLE) AS rev_1996,
               CAST(r97 AS DOUBLE) AS rev_1997,
               CAST(row_number() OVER (ORDER BY r96 DESC, nation) AS INT)
                   AS rank_1996,
               CAST(row_number() OVER (ORDER BY r97 DESC, nation) AS INT)
                   AS rank_1997,
               CAST(row_number() OVER (ORDER BY r96 DESC, nation) AS INT)
               - CAST(row_number() OVER (ORDER BY r97 DESC, nation) AS INT)
                   AS rank_gain
        FROM rev
    """,
    section="W26",
    doc="Period-over-period rank movement ('movers' report): national "
    "revenue ranked within 1996 and within 1997 (exact DECIMAL sums, "
    "nation tie-break), with the rank delta (positive = climbed). One "
    "dim join + one conditional reduction to |nations| rows; both rank "
    "windows run over the collapsed relation. The standard "
    "leaderboard-drift query for any (entity, period, metric) triple.",
)
def q_win_rank_delta(spark: SparkSession, sf_dir: str) -> DataFrame:
    orders = load_table(spark, sf_dir, "orders")
    customer = load_table(spark, sf_dir, "customer")
    d = F.col("o_totalprice").cast("decimal(18,2)")
    z = F.lit(0).cast("decimal(18,2)")
    in96 = (F.col("o_orderdate") >= "1996-01-01") & (
        F.col("o_orderdate") < "1997-01-01"
    )
    in97 = (F.col("o_orderdate") >= "1997-01-01") & (
        F.col("o_orderdate") < "1998-01-01"
    )
    rev = (
        orders.join(customer, orders.o_custkey == customer.c_custkey)
        .groupBy(F.col("c_nationkey").alias("nation"))
        .agg(
            F.sum(F.when(in96, d).otherwise(z)).alias("r96"),
            F.sum(F.when(in97, d).otherwise(z)).alias("r97"),
        )
    )
    rk96 = F.row_number().over(Window.orderBy(F.desc("r96"), F.asc("nation")))
    rk97 = F.row_number().over(Window.orderBy(F.desc("r97"), F.asc("nation")))
    return rev.select(
        "nation",
        F.col("r96").cast("double").alias("rev_1996"),
        F.col("r97").cast("double").alias("rev_1997"),
        rk96.cast("int").alias("rank_1996"),
        rk97.cast("int").alias("rank_1997"),
        (rk96 - rk97).cast("int").alias("rank_gain"),
    )


# --- E27: batch lateness / watermark audit -----------------------------------

_WM_DELAY_US = 120_000_000   # 2-minute watermark
_WIN_US = 60_000_000         # 1-minute tumbling windows


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
    w = Window.orderBy("arr_us", "event_id").rowsBetween(
        Window.unboundedPreceding, -1
    )
    wm = arr.select(
        "ev_us", F.max("ev_us").over(w).alias("max_seen_us")
    )
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


# --- D14: URL canonicalization dedup -----------------------------------------


@register(
    "q_dedup_url_canonical",
    oracle="""
        WITH raw AS (
            SELECT doc_id,
                   CASE WHEN doc_id % 2 = 0 THEN 'HTTPS' ELSE 'https' END
                   || '://'
                   || CASE WHEN doc_id % 4 < 2 THEN 'Example.ORG'
                           ELSE 'example.org' END
                   || CASE WHEN doc_id % 3 = 0 THEN ':443' ELSE '' END
                   || '/page/' || CAST(doc_id // 4 AS VARCHAR)
                   || CASE WHEN doc_id % 2 = 0 THEN '?b=2&a=1'
                           ELSE '?a=1&b=2' END
                   || CASE WHEN doc_id % 5 = 0 THEN '#frag' ELSE '' END
                       AS url
            FROM documents
        ),
        canon AS (
            SELECT doc_id,
                   lower(regexp_extract(url, '^([a-zA-Z]+)://', 1)) || '://'
                   || lower(regexp_extract(url, '://([^/:?#]+)', 1))
                   || regexp_extract(url, '://[^/?#]+([^?#]*)', 1)
                   || '?'
                   || array_to_string(list_sort(string_split(
                          regexp_extract(url, '\\?([^#]*)', 1), '&')), '&')
                       AS curl
            FROM raw
        )
        SELECT curl,
               CAST(COUNT(*) AS BIGINT) AS n_docs,
               MIN(doc_id) AS canonical_doc
        FROM canon
        GROUP BY curl
    """,
    section="D14",
    doc="URL canonicalization dedup (the crawl-dedup step BEFORE any "
    "content hashing): deterministically messy variants — protocol/"
    "host case, explicit default :443 port, shuffled query-param "
    "order, fragments — collapse under a canonicalizer built from "
    "regexp extraction + lowercase + sorted param re-join + fragment "
    "drop; pages (doc_id÷4 path groups) then collapse to one "
    "canonical record (min doc_id). Pure string algebra. Map-only "
    "canonicalization + one keyed reduction; at crawl scale the "
    "canonical URL is the co-location key that puts every variant of "
    "a page in one bucket (F17 extracts the parts; this normalizes "
    "them).",
)
def q_dedup_url_canonical(spark: SparkSession, sf_dir: str) -> DataFrame:
    docs = load_table(spark, sf_dir, "documents")
    url = F.concat(
        F.when(F.col("doc_id") % 2 == 0, "HTTPS").otherwise("https"),
        F.lit("://"),
        F.when(F.col("doc_id") % 4 < 2, "Example.ORG").otherwise(
            "example.org"
        ),
        F.when(F.col("doc_id") % 3 == 0, ":443").otherwise(""),
        F.lit("/page/"),
        F.expr("CAST(doc_id DIV 4 AS STRING)"),
        F.when(F.col("doc_id") % 2 == 0, "?b=2&a=1").otherwise("?a=1&b=2"),
        F.when(F.col("doc_id") % 5 == 0, "#frag").otherwise(""),
    )
    raw = docs.select("doc_id", url.alias("url"))
    curl = F.concat(
        F.lower(F.regexp_extract("url", r"^([a-zA-Z]+)://", 1)),
        F.lit("://"),
        F.lower(F.regexp_extract("url", r"://([^/:?#]+)", 1)),
        F.regexp_extract("url", r"://[^/?#]+([^?#]*)", 1),
        F.lit("?"),
        F.array_join(
            F.array_sort(
                F.split(F.regexp_extract("url", r"\?([^#]*)", 1), "&")
            ),
            "&",
        ),
    )
    return (
        raw.select("doc_id", curl.alias("curl"))
        .groupBy("curl")
        .agg(
            F.count("*").alias("n_docs"),
            F.min("doc_id").alias("canonical_doc"),
        )
    )
