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
from pyspark.sql import DataFrame, SparkSession, Window
from ai_to_cvent_etl_spark.queries._util import dec2
from ai_to_cvent_etl_spark.queries._util import ORACLE_MONEY_SUM


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


# ==== from analytics_r3m ===========================================

@register(
    "q_higher_order_funcs",
    oracle="""
        WITH t AS (
            SELECT doc_id, string_split(text, ' ') AS sp FROM documents
        )
        SELECT doc_id,
               CAST(list_sum(list_transform(sp, x -> length(x)))
                    AS BIGINT) AS total_chars,
               len(list_filter(sp, x -> length(x) > 7)) > 0 AS has_long,
               len(list_filter(sp, x -> length(x) >= 20)) = 0 AS all_short,
               sp[1] || '~' || list_reverse(sp)[1] AS first_pair,
               CAST(len(list_filter(sp, (x, i) -> i % 2 = 1)) AS INT)
                   AS n_odd_pos
        FROM t
    """,
    section="F14",
    doc="The lambda higher-order-function family over token arrays — "
    "transform (per-token lengths), aggregate (integer fold to total "
    "chars), exists/forall (length predicates), zip_with (pair tokens "
    "with the reversed array), and INDEXED filter (odd positions; "
    "Spark's lambda index is 0-based, DuckDB's 1-based — the parity "
    "masks differ by one on purpose). All integer/string/boolean logic "
    "— no floats. Map-only at any scale: lambdas run inside "
    "whole-stage codegen, never in Python.",
)
def q_higher_order_funcs(spark: SparkSession, sf_dir: str) -> DataFrame:
    docs = load_table(spark, sf_dir, "documents")
    sp = F.split(F.col("text"), " ")
    return docs.select(
        "doc_id",
        F.aggregate(
            F.transform(sp, lambda x: F.length(x)),
            F.lit(0).cast("long"),
            lambda acc, x: acc + x,
        ).alias("total_chars"),
        F.exists(sp, lambda x: F.length(x) > 7).alias("has_long"),
        F.forall(sp, lambda x: F.length(x) < 20).alias("all_short"),
        F.element_at(
            F.zip_with(sp, F.reverse(sp), lambda x, y: F.concat_ws("~", x, y)),
            1,
        ).alias("first_pair"),
        F.size(F.filter(sp, lambda x, i: i % 2 == 0)).alias("n_odd_pos"),
    )

# ==== from analytics_r3n ===========================================

@register(
    "q_json_variant",
    oracle="""
        SELECT event_id,
               CAST(json_extract_string(
                   '{"u":' || CAST(user_id AS VARCHAR) || ',"p":' || props
                   || '}', '$.u') AS BIGINT) AS u_long,
               CAST(json_extract_string(
                   '{"u":' || CAST(user_id AS VARCHAR) || ',"p":' || props
                   || '}', '$.p.k') AS INT) AS k_int,
               json_extract_string(props, '$.k') AS k_str,
               json_extract_string(props, '$.missing') IS NULL AS miss_is_null
        FROM events
    """,
    section="F15",
    doc="The Spark 4 VariantType path (semi-structured without schema "
    "declaration): a nested document constructed from columns is "
    "parse_json'd to VARIANT once, then variant_get extracts typed "
    "scalars by path ('$.u' as BIGINT, '$.p.k' as INT), plus a string "
    "extraction and a try_variant_get miss returning NULL. Only typed "
    "scalars cross the output boundary — Variant's binary encoding "
    "never hash-compares. Mirrored by DuckDB json_extract_string + "
    "casts. Map-only columnar extraction; at scale Variant exists "
    "precisely so repeated path access doesn't re-parse text (F7's "
    "get_json_object does — this is its indexed successor).",
)
def q_json_variant(spark: SparkSession, sf_dir: str) -> DataFrame:
    ev = load_table(spark, sf_dir, "events")
    j = F.concat(
        F.lit('{"u":'),
        F.col("user_id").cast("string"),
        F.lit(',"p":'),
        F.col("props"),
        F.lit("}"),
    )
    v = F.parse_json(j)
    return ev.select(
        "event_id",
        F.variant_get(v, "$.u", "bigint").alias("u_long"),
        F.variant_get(v, "$.p.k", "int").alias("k_int"),
        F.variant_get(F.parse_json(F.col("props")), "$.k", "string").alias(
            "k_str"
        ),
        F.try_variant_get(v, "$.missing", "int").isNull().alias(
            "miss_is_null"
        ),
    )

# ==== from analytics_r3p ===========================================

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

# ==== from analytics_r3q ===========================================

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

# ==== from analytics_r3u ===========================================

@register(
    "q_comparator_sort",
    oracle="""
        WITH t AS (
            SELECT doc_id,
                   list_sort(list_transform(
                       string_split(text, ' '),
                       x -> lpad(CAST(length(x) AS VARCHAR), 3, '0')
                            || '|' || x)) AS keyed
            FROM documents
        )
        SELECT doc_id,
               array_to_string(list_transform(
                   list_slice(keyed, 1, 5), k -> substr(k, 5)), ',')
                   AS first5,
               substr(keyed[len(keyed)], 5) AS longest_last
        FROM t
    """,
    section="F18",
    doc="array_sort with a CUSTOM COMPARATOR lambda — tokens ordered by "
    "(length, then value), the Spark lambda-comparator surface no "
    "other declared query touches. DuckDB has no comparator sort, so "
    "the oracle constructs an equivalent total order by sort-key "
    "('<zero-padded length>|<token>') — identical ordering for token "
    "lengths < 1000. Output: first five tokens and the last (longest) "
    "token, strings only. Map-only; comparator sorts run inside "
    "codegen like every other HOF (F14).",
)
def q_comparator_sort(spark: SparkSession, sf_dir: str) -> DataFrame:
    docs = load_table(spark, sf_dir, "documents")
    sp = F.split("text", " ")
    cmp_sorted = F.array_sort(
        sp,
        lambda l, r: F.when(F.length(l) < F.length(r), -1)
        .when(F.length(l) > F.length(r), 1)
        .when(l < r, -1)
        .when(l > r, 1)
        .otherwise(0),
    )
    return docs.select(
        "doc_id",
        F.array_join(F.slice(cmp_sorted, 1, 5), ",").alias("first5"),
        F.element_at(cmp_sorted, -1).alias("longest_last"),
    )

# ==== from analytics_r3x ===========================================

_AES_KEY = "0123456789abcdef"

@register(
    "q_crypto_funcs",
    oracle="""
        SELECT doc_id,
               md5(text) AS md5_hex,
               sha256(text) AS sha256_hex,
               TRUE AS aes_roundtrip,
               CAST((octet_length(encode(text)) // 16 + 1) * 16 AS BIGINT)
                   AS ct_bytes
        FROM documents
    """,
    section="F19",
    doc="Cryptographic function family: md5 and SHA-256 digests (exact "
    "cross-engine), an AES-128-ECB encrypt→decrypt round-trip with a "
    "fixed key (asserted equal to the plaintext — ECB is the "
    "deterministic mode that makes the round-trip testable; real "
    "column encryption uses GCM, whose random IV is exactly why "
    "ciphertext never hash-compares), and the PKCS7 ciphertext size "
    "from the closed form (len/16 + 1)·16, which the oracle computes "
    "without any crypto. Map-only; digests at ingest feed the E7/E21 "
    "fingerprint machinery, and deterministic ciphertext sizing is "
    "the storage-budget input for encrypted columns.",
)
def q_crypto_funcs(spark: SparkSession, sf_dir: str) -> DataFrame:
    docs = load_table(spark, sf_dir, "documents")
    rt = F.expr(
        f"CAST(aes_decrypt(aes_encrypt(text, '{_AES_KEY}', 'ECB'), "
        f"'{_AES_KEY}', 'ECB') AS STRING)"
    )
    ct = F.expr(f"aes_encrypt(text, '{_AES_KEY}', 'ECB')")
    return docs.select(
        "doc_id",
        F.md5("text").alias("md5_hex"),
        F.sha2(F.col("text"), 256).alias("sha256_hex"),
        (rt == F.col("text")).alias("aes_roundtrip"),
        F.octet_length(ct).cast("long").alias("ct_bytes"),
    )

# ==== from analytics_r4a ===========================================

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

# ==== from analytics_r4d ===========================================

@register(
    "q_generator_funcs",
    oracle="""
        WITH months AS (
            SELECT o_orderkey,
                   unnest(generate_series(
                       CAST(date_trunc('month', o_orderdate) AS DATE),
                       CAST(date_trunc('month', o_orderdate) AS DATE)
                       + INTERVAL 2 MONTH,
                       INTERVAL 1 MONTH)) AS bill_month
            FROM orders WHERE o_orderkey % 50 = 0
        )
        SELECT o_orderkey,
               CAST(bill_month AS DATE) AS bill_month,
               CAST(row_number() OVER (
                   PARTITION BY o_orderkey ORDER BY bill_month
               ) AS INT) AS installment
        FROM months
    """,
    section="F22",
    doc="Generator expressions: sequence(month_start, +2 months, 1 "
    "month) exploded into a 3-installment billing schedule per "
    "sampled order — the row-GENERATING family (sequence/explode; "
    "posexplode and inline are the indexed/struct variants, "
    "explode_outer the null-preserving one) vs DuckDB "
    "generate_series+unnest. Exact date arithmetic; installment "
    "numbers by an ordered window. Map-side fan-out — the idiom "
    "behind date spines (E6), billing schedules, and slot expansion; "
    "generation parallelizes with its parent row, no driver "
    "sequence.",
)
def q_generator_funcs(spark: SparkSession, sf_dir: str) -> DataFrame:
    orders = load_table(spark, sf_dir, "orders")
    sampled = orders.where(F.col("o_orderkey") % 50 == 0)
    months = sampled.select(
        "o_orderkey",
        F.explode(
            F.sequence(
                F.date_trunc("month", "o_orderdate").cast("date"),
                F.add_months(
                    F.date_trunc("month", "o_orderdate").cast("date"), 2
                ),
                F.expr("INTERVAL 1 MONTH"),
            )
        ).alias("bill_month"),
    )
    return months.select(
        "o_orderkey",
        F.col("bill_month").cast("date").alias("bill_month"),
        F.row_number()
        .over(Window.partitionBy("o_orderkey").orderBy("bill_month"))
        .cast("int")
        .alias("installment"),
    )

# ==== from analytics_r4e ===========================================

@register(
    "q_struct_surgery",
    oracle="""
        SELECT doc_id,
               lang AS meta_lang,
               n_chars * 2 AS meta_weight,
               'v2' AS meta_version,
               CAST(3 AS INT) AS n_fields_after_drop
        FROM documents
    """,
    section="F23",
    doc="Struct-column surgery — the nested-schema evolution surface: "
    "build meta = struct(lang, chars), ADD a version field and "
    "OVERWRITE chars with a derived weight via Column.withField, "
    "remove the original chars via dropFields, then extract typed "
    "scalars (structs never cross the hash boundary — F9's rule; the "
    "field count via json_object_keys(to_json(meta)) pins that the "
    "drop actually happened — 3 fields survive, not 4). withField/"
    "dropFields rewrite one field without re-projecting the rest of "
    "the struct — the cheap path for evolving deeply nested event "
    "schemas in place (vs exploding and rebuilding whole rows). "
    "Map-only.",
)
def q_struct_surgery(spark: SparkSession, sf_dir: str) -> DataFrame:
    docs = load_table(spark, sf_dir, "documents")
    meta = F.struct(
        F.col("lang").alias("lang"), F.col("n_chars").alias("chars")
    )
    evolved = (
        meta.withField("version", F.lit("v2"))
        .withField("weight", F.col("n_chars") * 2)
        .dropFields("chars")
    )
    d = docs.select("doc_id", evolved.alias("meta"))
    return d.select(
        "doc_id",
        F.col("meta.lang").alias("meta_lang"),
        F.col("meta.weight").alias("meta_weight"),
        F.col("meta.version").alias("meta_version"),
        F.expr("size(json_object_keys(to_json(meta)))")
        .cast("int")
        .alias("n_fields_after_drop"),
    )

# ==== from analytics_r4h ===========================================

@register(
    "q_timezone_funcs",
    oracle="""
        SELECT event_id,
               CAST(timezone('America/New_York', ts) AS TIMESTAMP)
                   AS utc_if_ny,
               CAST(timezone('Asia/Tokyo', timezone('UTC', ts))
                    AS TIMESTAMP) AS tokyo_local,
               CAST(date_part('hour', timezone('Asia/Tokyo',
                    timezone('UTC', ts))) AS INT) AS tokyo_hour
        FROM events
    """,
    section="F24",
    doc="Timezone conversion surface: to_utc_timestamp(ts, NY) — the "
    "instant this wall-clock reading denotes in New York, expressed "
    "in UTC — and from_utc_timestamp(ts, Tokyo) — the Tokyo wall "
    "clock for this UTC instant — plus the derived local hour, "
    "verified against DuckDB's timezone() (both resolve IANA rules; "
    "outputs are naive TIMESTAMPs so the hash boundary sees wall "
    "clocks, not zoned types). The operational rule this query "
    "documents: store UTC at ingest, convert at the reporting edge — "
    "local wall-clock storage is unrecoverable across DST folds. "
    "Map-only.",
)
def q_timezone_funcs(spark: SparkSession, sf_dir: str) -> DataFrame:
    ev = load_table(spark, sf_dir, "events")
    return ev.select(
        "event_id",
        F.to_utc_timestamp("ts", "America/New_York").alias("utc_if_ny"),
        F.from_utc_timestamp("ts", "Asia/Tokyo").alias("tokyo_local"),
        F.hour(F.from_utc_timestamp("ts", "Asia/Tokyo"))
        .cast("int")
        .alias("tokyo_hour"),
    )

# ==== from analytics_r4r ===========================================

@register(
    "q_xml_funcs",
    oracle="""
        WITH x AS (
            SELECT doc_id,
                   '<doc id="' || CAST(doc_id AS VARCHAR) || '"><lang>'
                   || lang || '</lang><chars>' || CAST(n_chars AS VARCHAR)
                   || '</chars><src>' || source || '</src></doc>' AS xml
            FROM documents
        )
        SELECT doc_id,
               regexp_extract(xml, '<lang>([^<]*)</lang>', 1) AS xml_lang,
               CAST(regexp_extract(xml, '<chars>([^<]*)</chars>', 1)
                    AS BIGINT) AS xml_chars,
               regexp_extract(xml, '<src>([^<]*)</src>', 1) AS xml_src,
               regexp_extract(xml, '<lang>([^<]*)</lang>', 1) = 'en'
                   AS is_english
        FROM x
    """,
    section="F25",
    doc="The XPath extraction surface: XML documents constructed from "
    "columns, then xpath_string (lang, source), xpath_long (chars — "
    "typed extraction, not string-then-cast), and xpath_boolean (an "
    "equality predicate evaluated INSIDE the XPath) — the legacy-"
    "system ingestion surface a SOAP-era association-management feed "
    "actually presents, mirrored by anchored regexes in DuckDB. The "
    "operational rule this query documents: XPath per analytical "
    "query is the anti-pattern — parse once into typed columns at "
    "ingest (F15's Variant rule applied to XML) and keep XPath at "
    "the ingest edge. Map-only.",
)
def q_xml_funcs(spark: SparkSession, sf_dir: str) -> DataFrame:
    docs = load_table(spark, sf_dir, "documents")
    xml = F.concat(
        F.lit('<doc id="'),
        F.col("doc_id").cast("string"),
        F.lit('"><lang>'),
        F.col("lang"),
        F.lit("</lang><chars>"),
        F.col("n_chars").cast("string"),
        F.lit("</chars><src>"),
        F.col("source"),
        F.lit("</src></doc>"),
    )
    x = docs.select("doc_id", xml.alias("xml"))
    return x.select(
        "doc_id",
        F.expr("xpath_string(xml, '/doc/lang')").alias("xml_lang"),
        F.expr("xpath_long(xml, '/doc/chars')").alias("xml_chars"),
        F.expr("xpath_string(xml, '/doc/src')").alias("xml_src"),
        F.expr("xpath_boolean(xml, \"/doc/lang='en'\")").alias(
            "is_english"
        ),
    )

# ==== from analytics_r4s ===========================================

_BIG = 9_000_000_000_000_000  # keys above 2^63/9e15 = 1024 overflow

@register(
    "q_try_arithmetic",
    oracle=f"""
        WITH t AS (
            SELECT o_orderkey,
                   CASE WHEN o_orderkey <= 9223372036854775807 // {_BIG}
                        THEN o_orderkey * {_BIG} END AS big_product
            FROM orders
        )
        SELECT o_orderkey,
               big_product,
               CASE WHEN big_product IS NOT NULL
                         AND big_product <= 9223372036854775807 - {_BIG}
                    THEN big_product + {_BIG} END AS big_sum,
               o_orderkey > 9223372036854775807 // {_BIG} AS overflowed
        FROM t
    """,
    section="F26",
    doc="The try_* arithmetic family: try_multiply and try_add on "
    "deliberately overflow-prone BIGINT expressions (keys scaled by "
    "9e15 — keys ≤ 1024 survive, larger keys overflow int64, both "
    "branches populated at every SF; the composed try_add overflows "
    "a further band near the boundary) return NULL where the plain "
    "operators would "
    "ANSI-fail the whole job — the per-column overflow tolerance for "
    "untrusted numeric feeds (F13's try_cast sibling; the alternative "
    "is flipping spark.sql.ansi.enabled off globally, which silently "
    "WRAPS every overflow everywhere). The overflowed flag makes the "
    "NULL rows auditable (E22's quarantine consumes it). DuckDB has "
    "no try_* — the oracle guards with the identical exact bound "
    "|a| ≤ ⌊2⁶³−1 / b⌋. Map-only; non-vacuous at every SF (both "
    "branches populated).",
)
def q_try_arithmetic(spark: SparkSession, sf_dir: str) -> DataFrame:
    orders = load_table(spark, sf_dir, "orders")
    bp = F.expr(f"try_multiply(o_orderkey, CAST({_BIG} AS BIGINT))")
    return orders.select(
        "o_orderkey",
        bp.alias("big_product"),
        F.expr(
            f"try_add(try_multiply(o_orderkey, CAST({_BIG} AS BIGINT)), "
            f"CAST({_BIG} AS BIGINT))"
        ).alias("big_sum"),
        (F.col("o_orderkey") > 9223372036854775807 // _BIG).alias(
            "overflowed"
        ),
    )


# ==== forty-eighth wave (r4) ==================================================


@register(
    "q_sql_variables",
    oracle="""
        SELECT l_returnflag,
               CAST(COUNT(*) AS BIGINT) AS n_lines,
               CAST(SUM(CAST(l_extendedprice AS DECIMAL(18,2))) AS DOUBLE)
                   AS revenue
        FROM lineitem
        WHERE l_discount >= 0.05 AND l_quantity < 30
        GROUP BY l_returnflag
    """,
    section="F27",
    doc="SQL session variables + EXECUTE IMMEDIATE + IDENTIFIER(): the "
    "Spark 4 parameterized-SQL surface pinned end-to-end — a DECLAREd "
    "DOUBLE variable set via SET VAR feeds the predicate, the table "
    "name arrives as an EXECUTE IMMEDIATE bind parameter through "
    "IDENTIFIER() (injection-safe dynamic table reference, the "
    "supported replacement for f-string SQL), and a quantity bound "
    "arrives as a second named parameter (mixing named and positional "
    "binds is rejected — probed, documented). The oracle is the same "
    "query with every parameter inlined as a literal — proving the "
    "parameterization layer changes BINDING, not semantics, so query "
    "templates can migrate without behavior drift. Variables are "
    "session-scoped driver state (bytes, not data) — zero executor "
    "footprint; the underlying plan is the same pushed-down scan+agg "
    "as the literal query (predicate pushdown still sees the resolved "
    "constant).",
)
def q_sql_variables(spark: SparkSession, sf_dir: str) -> DataFrame:
    load_table(spark, sf_dir, "lineitem").createOrReplaceTempView(
        "f27_lineitem"
    )
    spark.sql("DECLARE OR REPLACE VARIABLE f27_min_disc DOUBLE DEFAULT 0.0")
    spark.sql("SET VAR f27_min_disc = 0.05")
    return spark.sql(
        """
        EXECUTE IMMEDIATE
          'SELECT l_returnflag,
                  CAST(COUNT(*) AS BIGINT) AS n_lines,
                  CAST(SUM(CAST(l_extendedprice AS DECIMAL(18,2))) AS DOUBLE)
                      AS revenue
           FROM IDENTIFIER(:tbl)
           WHERE l_discount >= f27_min_disc AND l_quantity < :qty
           GROUP BY l_returnflag'
          USING 'f27_lineitem' AS tbl, 30 AS qty
        """
    )


@register(
    "q_str_collation",
    oracle="""
        WITH mixed AS (
            SELECT CASE WHEN c_custkey % 2 = 0 THEN lower(c_mktsegment)
                        ELSE c_mktsegment END AS seg,
                   c_acctbal
            FROM customer
        )
        SELECT upper(seg) AS segment,
               CAST(COUNT(*) AS BIGINT) AS n,
               CAST(COUNT(DISTINCT seg) AS BIGINT) AS case_variants,
               CAST(SUM(CAST(c_acctbal AS DECIMAL(18,2))) AS DOUBLE)
                   AS balance_sum
        FROM mixed
        GROUP BY upper(seg)
    """,
    section="F28",
    doc="Spark 4 string collations: a deterministically case-mangled "
    "segment column (every even key lowercased) is grouped under "
    "COLLATE UTF8_LCASE — equality, GROUP BY, and COUNT(DISTINCT) all "
    "follow the collation, so the five logical segments reassemble "
    "WITHOUT rewriting values through lower() everywhere (the "
    "case_variants column counts the case forms each group absorbed, "
    "under BINARY collation, proving the mangle actually happened — "
    "non-vacuous at every SF). The oracle is the upper()-normalized "
    "rewrite — collation changes COMPARISON semantics, not data. "
    "Pinned because collation-aware grouping pushes the normalization "
    "into the hash function instead of materializing a derived "
    "column, and because mixing collated and binary comparisons in "
    "one query (as here) is exactly where silent drift would live. "
    "Exact-decimal money sum. Scale: one keyed agg; the collation key "
    "hashes like any other — no plan-shape change vs a plain GROUP BY.",
)
def q_str_collation(spark: SparkSession, sf_dir: str) -> DataFrame:
    load_table(spark, sf_dir, "customer").createOrReplaceTempView(
        "f28_customer"
    )
    return spark.sql(
        """
        WITH mixed AS (
            SELECT CASE WHEN c_custkey % 2 = 0 THEN lower(c_mktsegment)
                        ELSE c_mktsegment END AS seg,
                   c_acctbal
            FROM f28_customer
        )
        SELECT upper(seg COLLATE UTF8_LCASE) AS segment,
               CAST(COUNT(*) AS BIGINT) AS n,
               CAST(COUNT(DISTINCT seg COLLATE UTF8_BINARY) AS BIGINT)
                   AS case_variants,
               CAST(SUM(CAST(c_acctbal AS DECIMAL(18,2))) AS DOUBLE)
                   AS balance_sum
        FROM mixed
        GROUP BY seg COLLATE UTF8_LCASE
        """
    )


@register(
    "q_array_funcs2",
    oracle="""
        WITH toks AS (
            SELECT doc_id,
                   string_split(text, ' ') AS arr,
                   CASE WHEN doc_id % 3 = 0 THEN NULL ELSE 'probe' END
                       AS maybe
            FROM documents
        )
        SELECT doc_id,
               array_to_string(
                   list_filter(list_prepend('bos', list_append(arr, 'eos')),
                               x -> x IS NOT NULL), '|') AS framed,
               CAST(list_position(arr, 'the') AS BIGINT) AS pos_the,
               array_to_string(list_filter(arr, x -> x <> 'the'), '|')
                   AS removed,
               array_to_string(
                   list_filter([maybe, 'k'], x -> x IS NOT NULL), '|')
                   AS compacted,
               array_to_string(flatten([list_slice(arr, 1, 2),
                                        list_slice(arr, 3, 4)]), '|')
                   AS reflat,
               CAST(len(arr) AS BIGINT) AS n_toks
        FROM toks
    """,
    section="F29",
    doc="Second array-surface pin (the Spark 3.4/4.x additions a token-"
    "pipeline leans on): array_prepend/append (BOS/EOS framing — the "
    "L15 sequence-packing primitive), array_position (0 = absent "
    "convention on BOTH engines), array_remove, array_compact "
    "(null-stripping after optional enrichment), flatten over sliced "
    "sub-arrays (chunk-and-reassemble round trip). DuckDB mirrors "
    "via list_* equivalents; arrays serialize to '|'-joined strings "
    "(F8's driver-hash rule); all row-local map-side expressions — "
    "whole-stage-codegen'd, no shuffle at any scale.",
)
def q_array_funcs2(spark: SparkSession, sf_dir: str) -> DataFrame:
    d = load_table(spark, sf_dir, "documents")
    arr = F.split(F.col("text"), " ")
    maybe = F.when(F.col("doc_id") % 3 == 0, F.lit(None)).otherwise(
        F.lit("probe")
    )
    return d.select(
        "doc_id",
        F.array_join(
            F.array_compact(
                F.array_prepend(F.array_append(arr, "eos"), "bos")
            ),
            "|",
        ).alias("framed"),
        F.array_position(arr, "the").cast("bigint").alias("pos_the"),
        F.array_join(F.array_remove(arr, "the"), "|").alias("removed"),
        F.array_join(
            F.array_compact(F.array(maybe, F.lit("k"))), "|"
        ).alias("compacted"),
        F.array_join(
            F.flatten(F.array(F.slice(arr, 1, 2), F.slice(arr, 3, 2))),
            "|",
        ).alias("reflat"),
        F.size(arr).cast("bigint").alias("n_toks"),
    )

_F31_RECURSIVE_BODY = """
    WITH flow AS (
        SELECT c.c_nationkey AS src, s.s_nationkey AS dst,
               CAST(SUM(CAST(CAST(l.l_extendedprice AS DECIMAL(18,2))
                             * 100 AS BIGINT)) AS BIGINT) AS cents
        FROM {o} o
        JOIN {l} l ON o.o_orderkey = l.l_orderkey
        JOIN {c} c ON o.o_custkey = c.c_custkey
        JOIN {s} s ON l.l_suppkey = s.s_suppkey
        WHERE c.c_nationkey <> s.s_nationkey
        GROUP BY 1, 2
    ),
    tot AS (
        SELECT CAST(SUM(cents) AS BIGINT) AS t,
               CAST(COUNT(*) AS BIGINT) AS np
        FROM flow
    ),
    e AS (
        SELECT src, dst FROM flow CROSS JOIN tot
        WHERE cents * np > t
    ),
    reach AS (
        WITH RECURSIVE r(src, dst, d) AS (
            SELECT src, dst, 1 FROM e
            UNION ALL
            SELECT DISTINCT r.src, e.dst, r.d + 1
            FROM r JOIN e ON r.dst = e.src
            WHERE r.d < 4
        ) SELECT src, dst FROM r GROUP BY src, dst
    )
    SELECT CAST(src AS BIGINT) AS src,
           CAST(COUNT(*) AS BIGINT) AS n_reachable
    FROM reach GROUP BY src
"""


@register(
    "q_sql_recursive_cte",
    oracle=_F31_RECURSIVE_BODY.format(
        o="orders", l="lineitem", c="customer", s="supplier"
    ),
    section="F31",
    doc="Spark 4.x WITH RECURSIVE pin: transitive closure of G19's "
    "above-mean nation trade-flow digraph as a DECLARATIVE recursive "
    "CTE run on BOTH engines (structurally identical SQL), reporting "
    "per-source reachable-set sizes — the reachability readout and "
    "the API pin for the recursion surface Spark added in 4.x, which "
    "replaces G19's hand-unrolled pointer doubling whenever the "
    "engine owns the fixpoint loop. Spark's recursion supports only "
    "UNION ALL (probed: [UNION_NOT_SUPPORTED_IN_RECURSIVE_CTE]), so "
    "the cycle-safe form is a depth counter capped at 4 (measured "
    "closure diameter is 3 at sf0.001/0.01/0.1 — the above-mean "
    "filter keeps density, hence diameter, SF-stable) + per-level "
    "DISTINCT (levels stay <= |nation|^2 rows instead of "
    "path-enumeration blowup) + an outer GROUP BY dedup. Same exact "
    "integer edge rule as G19, so the closure hash-matches. Scale: "
    "recursion runs on the 25-node collapsed grain; unbounded-depth "
    "fact-grain recursion would instead need G19's checkpointed "
    "doubling.",
)
def q_sql_recursive_cte(spark: SparkSession, sf_dir: str) -> DataFrame:
    for t in ("orders", "lineitem", "customer", "supplier"):
        load_table(spark, sf_dir, t).createOrReplaceTempView(f"f31_{t}")
    return spark.sql(
        _F31_RECURSIVE_BODY.format(
            o="f31_orders",
            l="f31_lineitem",
            c="f31_customer",
            s="f31_supplier",
        )
    )

_G20_BODY = """
    WITH flow AS (
        SELECT c.c_nationkey AS src, s.s_nationkey AS dst,
               CAST(SUM(CAST(CAST(l.l_extendedprice AS DECIMAL(18,2))
                             * 100 AS BIGINT)) AS BIGINT) AS cents
        FROM {o} o
        JOIN {l} l ON o.o_orderkey = l.l_orderkey
        JOIN {c} c ON o.o_custkey = c.c_custkey
        JOIN {s} s ON l.l_suppkey = s.s_suppkey
        WHERE c.c_nationkey <> s.s_nationkey
        GROUP BY 1, 2
    ),
    tot AS (
        SELECT CAST(SUM(cents) AS BIGINT) AS t,
               CAST(COUNT(*) AS BIGINT) AS np
        FROM flow
    ),
    e AS (
        SELECT src, dst FROM flow CROSS JOIN tot
        WHERE cents * np > t
    ),
    sp AS (
        WITH RECURSIVE r(src, dst, d) AS (
            SELECT src, dst, 1 FROM e
            UNION ALL
            SELECT DISTINCT r.src, e.dst, r.d + 1
            FROM r JOIN e ON r.dst = e.src
            WHERE r.d < 4
        ) SELECT src, dst, CAST(MIN(d) AS BIGINT) AS dist
          FROM r GROUP BY src, dst
    )
    SELECT dist,
           CAST(COUNT(*) AS BIGINT) AS n_pairs
    FROM sp GROUP BY dist
"""


@register(
    "q_graph_distance_histogram",
    oracle=_G20_BODY.format(
        o="orders", l="lineitem", c="customer", s="supplier"
    ),
    section="G20",
    doc="Shortest-path distance histogram of the G19 trade digraph: "
    "how many ordered nation pairs sit at hop distance 1, 2, 3 — "
    "the small-world readout (the histogram's mass at low d is why "
    "a demand shock reaches the whole network in two steps; its "
    "tail is the propagation horizon F31's closure only reports in "
    "aggregate). Same F31 recursion surface and depth-4 cap "
    "(measured diameter 3, SF-stable), with MIN-over-paths giving "
    "exact BFS distances — per-level DISTINCT keeps every level "
    "domain-bounded. Scale: recursion on the 25-node collapsed "
    "grain; the histogram is |diameter| rows.",
)
def q_graph_distance_histogram(spark: SparkSession, sf_dir: str) -> DataFrame:
    for t in ("orders", "lineitem", "customer", "supplier"):
        load_table(spark, sf_dir, t).createOrReplaceTempView(f"f31_{t}")
    return spark.sql(
        _G20_BODY.format(
            o="f31_orders",
            l="f31_lineitem",
            c="f31_customer",
            s="f31_supplier",
        )
    )


# ==== wave 198b: messy-timestamp coercion waterfall (F33) ===========


@register(
    "q_func_timestamp_waterfall",
    oracle="""
        WITH messy AS (
            SELECT o_orderkey,
                   CAST(o_orderdate AS DATE) AS truth,
                   CASE o_orderkey % 3
                     WHEN 0 THEN strftime(CAST(o_orderdate AS DATE),
                                          '%Y-%m-%d')
                     WHEN 1 THEN strftime(CAST(o_orderdate AS DATE),
                                          '%d/%m/%Y')
                     ELSE strftime(CAST(o_orderdate AS DATE),
                                   '%Y%m%d')
                   END AS raw
            FROM orders
        ),
        parsed AS (
            SELECT o_orderkey, truth,
                   COALESCE(
                       TRY_CAST(try_strptime(raw, '%Y-%m-%d') AS DATE),
                       TRY_CAST(try_strptime(raw, '%d/%m/%Y') AS DATE),
                       TRY_CAST(try_strptime(raw, '%Y%m%d') AS DATE)
                   ) AS parsed,
                   CASE
                     WHEN try_strptime(raw, '%Y-%m-%d') IS NOT NULL
                         THEN 'iso'
                     WHEN try_strptime(raw, '%d/%m/%Y') IS NOT NULL
                         THEN 'eu_slash'
                     WHEN try_strptime(raw, '%Y%m%d') IS NOT NULL
                         THEN 'compact'
                     ELSE 'unparsed'
                   END AS matched_format
            FROM messy
        )
        SELECT matched_format,
               CAST(COUNT(*) AS BIGINT) AS n_rows,
               CAST(SUM(CASE WHEN parsed = truth THEN 1 ELSE 0 END)
                    AS BIGINT) AS n_roundtrip_ok,
               CAST(SUM(CASE WHEN parsed IS NULL THEN 1 ELSE 0 END)
                    AS BIGINT) AS n_unparsed
        FROM parsed GROUP BY matched_format
    """,
    section="F33",
    doc="Messy-timestamp ingestion waterfall: order dates serialized "
    "into three real-world formats (ISO, EU slash, compact) by a "
    "deterministic key rule, then re-parsed with a COALESCE "
    "waterfall of per-format TRY parsers — the canonical dirty-"
    "date ingestion pattern (try the strict format first, fall "
    "through, never throw), with round-trip equality against the "
    "original date as the correctness gate per format. The "
    "waterfall ORDER matters and is part of the contract: a "
    "compact '20240115' must not be eaten by a lax parser first — "
    "which is why each branch is a format-pinned try_to_timestamp/"
    "try_strptime, not one permissive cast. Spark uses Java "
    "datetime patterns, DuckDB strptime codes; the FORMATS are "
    "semantically paired, outputs compared as DATE. Counts are "
    "exact; 'unparsed' pins that zero rows fall through. Scale: "
    "row-local map + one 3-row agg.",
)
def q_func_timestamp_waterfall(
    spark: SparkSession, sf_dir: str
) -> DataFrame:
    od = load_table(spark, sf_dir, "orders")
    messy = od.select(
        "o_orderkey",
        F.col("o_orderdate").cast("date").alias("truth"),
        F.when(
            F.col("o_orderkey") % 3 == 0,
            F.date_format(F.col("o_orderdate").cast("date"),
                          "yyyy-MM-dd"),
        )
        .when(
            F.col("o_orderkey") % 3 == 1,
            F.date_format(F.col("o_orderdate").cast("date"),
                          "dd/MM/yyyy"),
        )
        .otherwise(
            F.date_format(F.col("o_orderdate").cast("date"), "yyyyMMdd")
        )
        .alias("raw"),
    )
    p_iso = F.expr("try_to_timestamp(raw, 'yyyy-MM-dd')")
    p_eu = F.expr("try_to_timestamp(raw, 'dd/MM/yyyy')")
    p_cp = F.expr("try_to_timestamp(raw, 'yyyyMMdd')")
    parsed = messy.select(
        "truth",
        F.coalesce(
            p_iso.cast("date"), p_eu.cast("date"), p_cp.cast("date")
        ).alias("parsed"),
        F.when(p_iso.isNotNull(), F.lit("iso"))
        .when(p_eu.isNotNull(), F.lit("eu_slash"))
        .when(p_cp.isNotNull(), F.lit("compact"))
        .otherwise(F.lit("unparsed"))
        .alias("matched_format"),
    )
    return parsed.groupBy("matched_format").agg(
        F.count(F.lit(1)).cast("bigint").alias("n_rows"),
        F.sum(
            F.when(F.col("parsed") == F.col("truth"), 1).otherwise(0)
        )
        .cast("bigint")
        .alias("n_roundtrip_ok"),
        F.sum(F.when(F.col("parsed").isNull(), 1).otherwise(0))
        .cast("bigint")
        .alias("n_unparsed"),
    )
