"""Nineteenth-wave operators (r3 continuation): event-pattern matching,
winsorized mean, fuzzy record linkage, URL functions.

  W25 q_win_event_pattern — MATCH_RECOGNIZE-style sequence pattern
                            matching: per-user ordered event-initial
                            strings scanned with a regex (view→…→
                            purchase conversions), counts + flags.
  A35 q_agg_winsorized    — robust mean: clamp order values at the
                            nearest-rank P05/P95 fences per status,
                            then an exact decimal mean of the clamped
                            series (the W23 order-statistic device).
  D12 q_dedup_record_link — fuzzy record LINKAGE across sources (vs
                            self-dedup): a deterministically corrupted
                            replica re-linked by blocking keys +
                            Levenshtein verify — the MDM join.
  F17 q_url_funcs         — URL parsing: host / path / query-param
                            extraction via parse_url, mirrored by
                            regex in DuckDB — the web-corpus
                            normalization family.

Determinism notes (SURVEY §5.3):
  * W25: the per-user sequence is an array_sort over (ts, event_id,
    initial) structs — unique event_id tie-break, so the string is
    unambiguous; regexp_count uses a greedy, non-overlapping pattern
    identical under Java regex and RE2.
  * A35: P05/P95 are nearest-rank order statistics (ceil(n·p) with
    p ∈ {.05, .95}: n·p exact in binary for n < 2^49); clamped values
    are raw 2dp doubles or the exact fence values — the decimal mean
    is exact either way.
  * D12 is integer/string logic (levenshtein is exact); the block key
    includes acctbal equality, and pairs carry both ids — no rank, no
    floats.
  * F17 is pure string parsing; URLs are constructed from table
    columns so every extraction is deterministic.

Scale notes:
  * W25 is one keyed sort-agg per user (the sequence state is the
    user's OWN events — bounded by per-user activity, not the corpus);
    the regex runs on the collapsed per-user row. For unbounded
    streams the same pattern runs incrementally with
    transformWithState (ST11) keeping only the NFA state, not the
    string.
  * A35: fences per group are a ≤|groups|-row broadcast back to the
    scan (W23's shape); the clamped mean is one more keyed reduction.
  * D12 is the blocked-linkage shape: candidate pairs ONLY within
    (nationkey, acctbal) blocks — equality blocking makes the
    quadratic verify per-block tiny; multiple blocking passes union
    candidates at scale (D11's phonetic key is pass two).
  * F17 is map-only; host/path become partition or group keys for
    per-domain curation (crawl dedup, robots accounting).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession, Window
from pyspark.sql import functions as F

from ai_to_cvent_etl_spark.io import load_table
from ai_to_cvent_etl_spark.registry import register

# --- W25: sequence pattern matching ------------------------------------------

_PATTERN = "v[ces]*p"  # a view converting to purchase without another view


@register(
    "q_win_event_pattern",
    oracle=f"""
        WITH seq AS (
            SELECT user_id,
                   string_agg(substr(event_type, 1, 1), ''
                              ORDER BY ts, event_id) AS s
            FROM events GROUP BY user_id
        )
        SELECT user_id,
               CAST(length(s) AS INT) AS seq_len,
               CAST(len(regexp_extract_all(s, '{_PATTERN}')) AS INT)
                   AS n_conversions,
               len(regexp_extract_all(s, '{_PATTERN}')) > 0 AS converted
        FROM seq
    """,
    section="W25",
    doc="MATCH_RECOGNIZE-style event-sequence pattern matching: each "
    "user's events collapse to an ordered initial string (c/e/p/s/v, "
    "sorted by ts with event_id tie-break), scanned with the greedy "
    f"non-overlapping regex '{_PATTERN}' — a view converting to a "
    "purchase with no intervening view. Output: sequence length, "
    "conversion count, converted flag. The sequence-mining primitive "
    "W11's time-windowed funnel can't express (arbitrary regular "
    "patterns over order, not fixed stages). Per-user state is the "
    "user's own events — one keyed sort-agg; streams run the same "
    "pattern incrementally via transformWithState keeping NFA state "
    "only.",
)
def q_win_event_pattern(spark: SparkSession, sf_dir: str) -> DataFrame:
    ev = load_table(spark, sf_dir, "events")
    seq = ev.groupBy("user_id").agg(
        F.array_join(
            F.transform(
                F.array_sort(
                    F.collect_list(
                        F.struct(
                            F.col("ts"),
                            F.col("event_id"),
                            F.substring("event_type", 1, 1).alias("i"),
                        )
                    )
                ),
                lambda x: x["i"],
            ),
            "",
        ).alias("s")
    )
    n = F.regexp_count(F.col("s"), F.lit(_PATTERN))
    return seq.select(
        "user_id",
        F.length("s").alias("seq_len"),
        n.cast("int").alias("n_conversions"),
        (n > 0).alias("converted"),
    )


# --- A35: winsorized mean ----------------------------------------------------


@register(
    "q_agg_winsorized",
    oracle="""
        WITH r AS (
            SELECT o_orderstatus, o_totalprice,
                   row_number() OVER (
                       PARTITION BY o_orderstatus
                       ORDER BY o_totalprice, o_orderkey
                   ) AS rn,
                   COUNT(*) OVER (PARTITION BY o_orderstatus) AS n
            FROM orders
        ),
        fences AS (
            SELECT o_orderstatus,
                   MAX(CASE WHEN rn = CAST(ceil(n * 0.05) AS BIGINT)
                            THEN o_totalprice END) AS p05,
                   MAX(CASE WHEN rn = CAST(ceil(n * 0.95) AS BIGINT)
                            THEN o_totalprice END) AS p95
            FROM r GROUP BY o_orderstatus
        )
        SELECT o.o_orderstatus,
               CAST(COUNT(*) AS BIGINT) AS n,
               f.p05, f.p95,
               CAST(SUM(CAST(
                   CASE WHEN o.o_totalprice < f.p05 THEN f.p05
                        WHEN o.o_totalprice > f.p95 THEN f.p95
                        ELSE o.o_totalprice END AS DECIMAL(18,2)))
                    AS DOUBLE) / COUNT(*) AS winsorized_mean,
               CAST(SUM(CAST(o.o_totalprice AS DECIMAL(18,2))) AS DOUBLE)
                   / COUNT(*) AS raw_mean
        FROM orders o JOIN fences f ON f.o_orderstatus = o.o_orderstatus
        GROUP BY o.o_orderstatus, f.p05, f.p95
    """,
    section="A35",
    doc="Winsorized mean of order values per status: clamp at the "
    "nearest-rank P05/P95 order statistics (ceil(n·p) ranks — exact in "
    "binary; W23's no-interpolation device), then an EXACT decimal "
    "mean of the clamped series (clamped values are raw 2dp doubles or "
    "the 2dp fence itself, so the DECIMAL(18,2) cast is lossless). Raw "
    "mean alongside shows the tail influence — the robust-statistics "
    "gate for reward/metric columns polluted by outliers. One ranked "
    "window + a ≤3-row fence broadcast + one keyed reduction.",
)
def q_agg_winsorized(spark: SparkSession, sf_dir: str) -> DataFrame:
    orders = load_table(spark, sf_dir, "orders")
    w = Window.partitionBy("o_orderstatus").orderBy("o_totalprice", "o_orderkey")
    wp = Window.partitionBy("o_orderstatus")
    r = orders.select(
        "o_orderstatus",
        "o_totalprice",
        F.row_number().over(w).alias("rn"),
        F.count("*").over(wp).alias("n"),
    )
    fences = r.groupBy("o_orderstatus").agg(
        F.max(
            F.when(
                F.col("rn") == F.ceil(F.col("n") * 0.05).cast("long"),
                F.col("o_totalprice"),
            )
        ).alias("p05"),
        F.max(
            F.when(
                F.col("rn") == F.ceil(F.col("n") * 0.95).cast("long"),
                F.col("o_totalprice"),
            )
        ).alias("p95"),
    )
    j = orders.select("o_orderstatus", "o_totalprice").join(
        fences, "o_orderstatus"
    )
    clamped = (
        F.when(F.col("o_totalprice") < F.col("p05"), F.col("p05"))
        .when(F.col("o_totalprice") > F.col("p95"), F.col("p95"))
        .otherwise(F.col("o_totalprice"))
    )
    return j.groupBy("o_orderstatus", "p05", "p95").agg(
        F.count("*").alias("n"),
        (
            F.sum(clamped.cast("decimal(18,2)")).cast("double") / F.count("*")
        ).alias("winsorized_mean"),
        (
            F.sum(F.col("o_totalprice").cast("decimal(18,2)")).cast("double")
            / F.count("*")
        ).alias("raw_mean"),
    ).select(
        "o_orderstatus", "n", "p05", "p95", "winsorized_mean", "raw_mean"
    )


# --- D12: fuzzy record linkage across sources --------------------------------


@register(
    "q_dedup_record_link",
    oracle="""
        WITH src AS (
            SELECT c_custkey, c_nationkey, c_acctbal, c_name FROM customer
        ),
        replica AS (
            SELECT c_nationkey, c_acctbal,
                   substr(c_name, 1,
                          CAST(c_custkey % length(c_name) AS INT))
                   || substr(c_name,
                             CAST(c_custkey % length(c_name) AS INT) + 2)
                       AS r_name
            FROM customer
        )
        SELECT s.c_custkey,
               r.r_name,
               CAST(levenshtein(s.c_name, r.r_name) AS INT) AS lev
        FROM src s
        JOIN replica r
          ON r.c_nationkey = s.c_nationkey AND r.c_acctbal = s.c_acctbal
        WHERE levenshtein(s.c_name, r.r_name) <= 1
    """,
    section="D12",
    doc="Fuzzy record LINKAGE across sources (master-data join — "
    "distinct from self-dedup D1-D11): a replica feed whose names "
    "carry a deterministic one-character deletion (position keyed by "
    "custkey) and NO shared primary key is re-linked to the source by "
    "equality BLOCKING on (nationkey, acctbal) with a Levenshtein≤1 "
    "verify inside blocks. Pure integer/string logic. The blocked-"
    "linkage shape: candidate pairs exist only within blocks, so the "
    "quadratic verify is per-block tiny; at scale multiple blocking "
    "passes (D11's phonetic key, sorted-neighborhood windows) union "
    "their candidates before one shared verify.",
)
def q_dedup_record_link(spark: SparkSession, sf_dir: str) -> DataFrame:
    c = load_table(spark, sf_dir, "customer")
    src = c.select("c_custkey", "c_nationkey", "c_acctbal", "c_name")
    pos = (F.col("c_custkey") % F.length("c_name")).cast("int")
    replica = c.select(
        "c_nationkey",
        "c_acctbal",
        F.concat(
            F.expr("substr(c_name, 1, CAST(c_custkey % length(c_name) AS INT))"),
            F.expr(
                "substr(c_name, CAST(c_custkey % length(c_name) AS INT) + 2)"
            ),
        ).alias("r_name"),
    )
    j = src.join(replica, ["c_nationkey", "c_acctbal"])
    lev = F.levenshtein(F.col("c_name"), F.col("r_name"))
    return j.where(lev <= 1).select(
        "c_custkey", "r_name", lev.cast("int").alias("lev")
    )


# --- F17: URL functions ------------------------------------------------------


@register(
    "q_url_funcs",
    oracle="""
        WITH u AS (
            SELECT doc_id,
                   'https://corpus.example.org/' || lang || '/doc/'
                   || CAST(doc_id AS VARCHAR) || '?src=' || source
                   || '&n=' || CAST(n_chars AS VARCHAR) AS url
            FROM documents
        )
        SELECT doc_id,
               regexp_extract(url, '^[a-z]+://([^/?#]+)', 1) AS host,
               regexp_extract(url, '^[a-z]+://[^/?#]+([^?#]*)', 1) AS path,
               regexp_extract(url, '[?&]src=([^&#]*)', 1) AS src_param,
               regexp_extract(url, '^([a-z]+):', 1) AS protocol
        FROM u
    """,
    section="F17",
    doc="URL parsing (the web-corpus normalization family): URLs "
    "constructed from table columns, then host / path / single query "
    "parameter / protocol extracted with parse_url — mirrored by "
    "anchored regexes in DuckDB (which has no URL parser). Map-only; "
    "at crawl scale host and registered-domain become the partition "
    "and dedup keys (per-domain curation, crawl-politeness "
    "accounting), which is why extraction must be a cheap columnar "
    "op, not a Python parser.",
)
def q_url_funcs(spark: SparkSession, sf_dir: str) -> DataFrame:
    docs = load_table(spark, sf_dir, "documents")
    url = F.concat(
        F.lit("https://corpus.example.org/"),
        F.col("lang"),
        F.lit("/doc/"),
        F.col("doc_id").cast("string"),
        F.lit("?src="),
        F.col("source"),
        F.lit("&n="),
        F.col("n_chars").cast("string"),
    )
    u = docs.select("doc_id", url.alias("url"))
    return u.select(
        "doc_id",
        F.parse_url(F.col("url"), F.lit("HOST")).alias("host"),
        F.parse_url(F.col("url"), F.lit("PATH")).alias("path"),
        F.parse_url(F.col("url"), F.lit("QUERY"), F.lit("src")).alias(
            "src_param"
        ),
        F.parse_url(F.col("url"), F.lit("PROTOCOL")).alias("protocol"),
    )
