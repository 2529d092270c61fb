"""SURVEY §2.8 — scalar functions: string / regex / date / math / array /
map / json (F1-F9).

Dialect traps pinned here (SURVEY §5.3 rule 9):
  * dayofweek numbering differs (Spark 1=Sun, DuckDB dow 0=Sun) — both sides
    emit ISO day-of-week instead (Spark weekday()+1 == DuckDB isodow).
  * Spark ceil/floor(double) return BIGINT, DuckDB return DOUBLE — cast.
  * array_distinct/list_distinct ordering differs — always sort after.
  * posexplode is 0-based, SQL ordinality is 1-based — emit pos+1.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from ai_to_cvent_etl_spark.io import load_table
from ai_to_cvent_etl_spark.registry import register


@register(
    "q_str_funcs",
    oracle="""
        SELECT c_custkey,
               upper(c_name) AS name_upper,
               lower(c_mktsegment) AS seg_lower,
               trim(c_name) AS name_trim,
               substr(c_name, 1, 8) AS name_prefix,
               c_name || ':' || c_mktsegment AS name_seg,
               CAST(length(c_name) AS BIGINT) AS name_len,
               lpad(CAST(c_nationkey AS VARCHAR), 4, '0') AS nation_padded,
               replace(c_name, 'Customer', 'Cust') AS name_short,
               contains(c_name, '0042') AS has_42
        FROM customer
    """,
    section="F1",
)
def q_str_funcs(spark: SparkSession, sf_dir: str) -> DataFrame:
    c = load_table(spark, sf_dir, "customer")
    return c.select(
        "c_custkey",
        F.upper("c_name").alias("name_upper"),
        F.lower("c_mktsegment").alias("seg_lower"),
        F.trim("c_name").alias("name_trim"),
        F.substring("c_name", 1, 8).alias("name_prefix"),
        F.concat(F.col("c_name"), F.lit(":"), F.col("c_mktsegment")).alias("name_seg"),
        F.length("c_name").cast("bigint").alias("name_len"),
        F.lpad(F.col("c_nationkey").cast("string"), 4, "0").alias("nation_padded"),
        F.replace(F.col("c_name"), F.lit("Customer"), F.lit("Cust")).alias("name_short"),
        F.contains(F.col("c_name"), F.lit("0042")).alias("has_42"),
    )


@register(
    "q_regexp",
    oracle=r"""
        SELECT c_custkey,
               CAST(regexp_extract(c_name, '#(\d+)', 1) AS BIGINT) AS extracted_id,
               regexp_replace(c_name, '^Customer#0*', '') AS short_id,
               c_name AS name
        FROM customer
        WHERE regexp_matches(c_name, '[13579]$')
    """,
    section="F2",
    doc="regexp_extract / regexp_replace / rlike-filter (POSIX-compatible patterns).",
)
def q_regexp(spark: SparkSession, sf_dir: str) -> DataFrame:
    c = load_table(spark, sf_dir, "customer")
    return (
        c.filter(F.col("c_name").rlike(r"[13579]$"))
        .select(
            "c_custkey",
            F.regexp_extract(F.col("c_name"), r"#(\d+)", 1)
            .cast("bigint")
            .alias("extracted_id"),
            F.regexp_replace(F.col("c_name"), r"^Customer#0*", "").alias("short_id"),
            F.col("c_name").alias("name"),
        )
    )


@register(
    "q_split_tokens",
    oracle="""
        SELECT doc_id,
               CAST(len(string_split(text, ' ')) AS BIGINT) AS n_tokens,
               string_split(text, ' ')[1] AS first_token,
               string_split(text, ' ')[-1] AS last_token
        FROM documents
    """,
    section="F3",
)
def q_split_tokens(spark: SparkSession, sf_dir: str) -> DataFrame:
    d = load_table(spark, sf_dir, "documents")
    toks = F.split(F.col("text"), " ")
    return d.select(
        "doc_id",
        F.size(toks).cast("bigint").alias("n_tokens"),
        F.element_at(toks, 1).alias("first_token"),
        F.element_at(toks, -1).alias("last_token"),
    )


@register(
    "q_explode_unnest",
    oracle="""
        SELECT doc_id, u.tok AS token, u.pos FROM (
            SELECT doc_id,
                   unnest(list_transform(string_split(text, ' '),
                          (x, i) -> struct_pack(tok := x, pos := i))) AS u
            FROM documents WHERE lang = 'en'
        )
    """,
    section="F4",
    doc="Lateral explode of token arrays with 1-based ordinality.",
)
def q_explode_unnest(spark: SparkSession, sf_dir: str) -> DataFrame:
    d = load_table(spark, sf_dir, "documents").filter(F.col("lang") == "en")
    return d.select(
        "doc_id", F.posexplode(F.split(F.col("text"), " ")).alias("pos0", "token")
    ).select("doc_id", "token", (F.col("pos0") + 1).cast("bigint").alias("pos"))


@register(
    "q_date_funcs",
    oracle="""
        SELECT o_orderkey,
               CAST(year(o_orderdate) AS BIGINT) AS yr,
               CAST(month(o_orderdate) AS BIGINT) AS mo,
               CAST(day(o_orderdate) AS BIGINT) AS dy,
               CAST(quarter(o_orderdate) AS BIGINT) AS qtr,
               CAST(isodow(o_orderdate) AS BIGINT) AS iso_dow,
               CAST(date_trunc('month', o_orderdate) AS TIMESTAMP) AS month_start,
               CAST(date_diff('day', TIMESTAMP '1995-01-01', o_orderdate) AS BIGINT) AS days_since_epoch_start,
               o_orderdate + INTERVAL 3 MONTH AS plus_quarter
        FROM orders
    """,
    section="F5",
    doc="Date parts normalized to ISO numbering; interval month-add clamps identically.",
)
def q_date_funcs(spark: SparkSession, sf_dir: str) -> DataFrame:
    o = load_table(spark, sf_dir, "orders")
    d = F.col("o_orderdate")
    return o.select(
        "o_orderkey",
        F.year(d).cast("bigint").alias("yr"),
        F.month(d).cast("bigint").alias("mo"),
        F.dayofmonth(d).cast("bigint").alias("dy"),
        F.quarter(d).cast("bigint").alias("qtr"),
        (F.weekday(d) + 1).cast("bigint").alias("iso_dow"),
        F.date_trunc("month", d).alias("month_start"),
        F.datediff(d, F.lit("1995-01-01").cast("timestamp_ntz"))
        .cast("bigint")
        .alias("days_since_epoch_start"),
        (d + F.expr("INTERVAL 3 MONTH")).alias("plus_quarter"),
    )


@register(
    "q_math_funcs",
    oracle="""
        SELECT p_partkey,
               round(p_retailprice, 1) AS price_round1,
               abs(p_size - 25) AS size_dist,
               CAST(ceil(p_retailprice) AS BIGINT) AS price_ceil,
               CAST(floor(p_retailprice) AS BIGINT) AS price_floor,
               round(sqrt(p_retailprice), 4) AS price_sqrt,
               round(ln(p_retailprice), 4) AS price_ln,
               p_size * p_size AS size_sq,
               CAST(p_size AS BIGINT) % 7 AS size_mod7,
               CAST(sign(p_size - 25) AS BIGINT) AS size_sign
        FROM part
    """,
    section="F6",
    doc="round/abs/ceil/floor/sqrt/ln/pow/mod/sign; irrational outputs rounded 4dp.",
)
def q_math_funcs(spark: SparkSession, sf_dir: str) -> DataFrame:
    p = load_table(spark, sf_dir, "part")
    return p.select(
        "p_partkey",
        F.round(F.col("p_retailprice"), 1).alias("price_round1"),
        F.abs(F.col("p_size") - 25).alias("size_dist"),
        F.ceil(F.col("p_retailprice")).cast("bigint").alias("price_ceil"),
        F.floor(F.col("p_retailprice")).cast("bigint").alias("price_floor"),
        F.round(F.sqrt(F.col("p_retailprice")), 4).alias("price_sqrt"),
        F.round(F.log(F.col("p_retailprice")), 4).alias("price_ln"),
        (F.col("p_size") * F.col("p_size")).alias("size_sq"),
        (F.col("p_size").cast("bigint") % 7).alias("size_mod7"),
        F.signum(F.col("p_size") - 25).cast("bigint").alias("size_sign"),
    )


@register(
    "q_json_extract",
    oracle="""
        SELECT event_type,
               CAST(SUM(CAST(json_extract_string(props, '$.k') AS INTEGER)) AS BIGINT) AS sum_k,
               CAST(COUNT(*) AS BIGINT) AS n_events,
               CAST(MAX(CAST(json_extract_string(props, '$.k') AS INTEGER)) AS INTEGER) AS max_k
        FROM events
        GROUP BY event_type
    """,
    section="F7",
    doc="JSON path extraction from the props column + typed aggregation.",
)
def q_json_extract(spark: SparkSession, sf_dir: str) -> DataFrame:
    e = load_table(spark, sf_dir, "events")
    k = F.get_json_object(F.col("props"), "$.k").cast("int")
    return e.groupBy("event_type").agg(
        F.sum(k).cast("bigint").alias("sum_k"),
        F.count(F.lit(1)).alias("n_events"),
        F.max(k).alias("max_k"),
    )


@register(
    "q_array_funcs",
    oracle="""
        WITH toks AS (SELECT doc_id, string_split(text, ' ') AS arr FROM documents)
        SELECT doc_id,
               list_contains(arr, 'the') AS has_the,
               array_to_string(list_slice(arr, 1, 3), '|') AS first3,
               array_to_string(list_sort(list_distinct(arr)), '|') AS vocab,
               CAST(len(list_distinct(arr)) AS BIGINT) AS n_distinct
        FROM toks
    """,
    section="F8",
    doc="array_contains/slice/sort/distinct/size over token arrays "
    "(distinct is order-unstable on both engines — always sorted; arrays "
    "serialized to '|'-joined strings because the driver's value-hash "
    "canonicalizer cannot hash lists, ADVICE r1).",
)
def q_array_funcs(spark: SparkSession, sf_dir: str) -> DataFrame:
    d = load_table(spark, sf_dir, "documents")
    arr = F.split(F.col("text"), " ")
    return d.select(
        "doc_id",
        F.array_contains(arr, "the").alias("has_the"),
        F.array_join(F.slice(arr, 1, 3), "|").alias("first3"),
        F.array_join(F.sort_array(F.array_distinct(arr)), "|").alias("vocab"),
        F.size(F.array_distinct(arr)).cast("bigint").alias("n_distinct"),
    )


@register(
    "q_map_struct_funcs",
    oracle="""
        SELECT doc_id,
               lang AS meta_lang,
               n_chars AS meta_chars,
               lang || '#' || CAST(n_chars AS VARCHAR) AS meta_key,
               CAST(2 AS INTEGER) AS n_keys
        FROM documents
    """,
    section="F9",
    doc="Build map/struct internally, output only extracted scalars "
    "(Spark MAP vs DuckDB MAP never hash-compare — keep containers internal).",
)
def q_map_struct_funcs(spark: SparkSession, sf_dir: str) -> DataFrame:
    d = load_table(spark, sf_dir, "documents")
    with_map = d.select(
        "doc_id",
        F.create_map(
            F.lit("lang"), F.col("lang"),
            F.lit("chars"), F.col("n_chars").cast("string"),
        ).alias("meta"),
        F.struct(F.col("lang").alias("l"), F.col("n_chars").alias("c")).alias("s"),
    )
    return with_map.select(
        "doc_id",
        F.col("meta")["lang"].alias("meta_lang"),
        F.col("s.c").alias("meta_chars"),
        F.concat(F.col("s.l"), F.lit("#"), F.col("s.c").cast("string")).alias("meta_key"),
        F.size(F.map_keys(F.col("meta"))).alias("n_keys"),
    )


@register(
    "q_try_cast",
    oracle="""
        SELECT c_custkey,
               TRY_CAST(regexp_extract(c_name, '#(\\d+)', 1) AS BIGINT)
                   AS id_num,
               TRY_CAST(c_mktsegment AS BIGINT) AS seg_num,
               TRY_CAST('2024-01-' || lpad(CAST(c_custkey % 28 + 1 AS VARCHAR),
                                           2, '0') AS DATE) AS derived_date,
               TRY_CAST(c_mktsegment AS DATE) AS bad_date,
               COALESCE(TRY_CAST(c_mktsegment AS BIGINT), -1) AS seg_defaulted
        FROM customer
    """,
    section="F13",
    doc="Error-safe casting surface (the dirty-data ETL reality): try_cast "
    "returns NULL instead of failing the job on malformed values — numeric "
    "id extraction, a guaranteed-invalid cast, a derived date, and a "
    "COALESCE default. Semantics probed identical on both engines for "
    "these cases; decimal-string->int deliberately EXCLUDED (Spark "
    "try_cast('4.5' as int) is NULL, DuckDB TRY_CAST rounds to 5 — a "
    "documented cross-engine divergence this query pins around). "
    "Row-local, zero shuffle.",
)
def q_try_cast(spark: SparkSession, sf_dir: str) -> DataFrame:
    cust = load_table(spark, sf_dir, "customer")
    return cust.select(
        "c_custkey",
        F.expr(
            r"try_cast(regexp_extract(c_name, '#(\\d+)', 1) as bigint)"
        ).alias("id_num"),
        F.expr("try_cast(c_mktsegment as bigint)").alias("seg_num"),
        F.expr(
            "try_cast(concat('2024-01-', lpad(cast(c_custkey % 28 + 1 "
            "as string), 2, '0')) as date)"
        ).alias("derived_date"),
        F.expr("try_cast(c_mktsegment as date)").alias("bad_date"),
        F.expr(
            "coalesce(try_cast(c_mktsegment as bigint), -1L)"
        ).alias("seg_defaulted"),
    )
