"""Forty-sixth-wave operators (r3 continuation): XML functions,
header/detail integrity audit.

  F25 q_xml_funcs        — the XPath extraction surface: XML documents
                           constructed from columns, scalar and typed
                           extraction via xpath_string / xpath_long /
                           xpath_boolean — the legacy-system ingestion
                           surface (SOAP-era feeds), mirrored by
                           anchored regexes in DuckDB (which has no
                           XPath).
  E34 q_etl_header_detail — header/detail integrity audit: per-order
                           recomputed line total vs the header total,
                           exact cent gaps classified into tolerance
                           bands — the order-book consistency check
                           every billing ETL runs.

Determinism notes (SURVEY §5.3):
  * F25: the XML is deterministic string construction; extractions are
    exact strings/integers/booleans.
  * E34: both sides of the gap are exact integer cents; the line term
    is a pure-integer product (cents × bps × bps, floor-divided) —
    chained wide-DECIMAL multiplies round at different intermediate
    scales cross-engine (observed), so the decimal form is NOT a safe
    oracle pair; band classification is integer logic.

Scale notes:
  * F25 is map-only; at scale XML parses ONCE into typed columns at
    ingest (the F15 Variant rule applied to the legacy format) — xpath
    per query is the anti-pattern this query exists to replace.
  * E34 is one co-keyed aggregation (lineitem collapses per order) +
    a broadcast-size band classification — the reconciliation shape
    (J23) applied at the header/detail grain; run it on every load.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from ai_to_cvent_etl_spark.io import load_table
from ai_to_cvent_etl_spark.registry import register

# --- F25: XPath extraction ---------------------------------------------------


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


# --- E34: header/detail integrity audit --------------------------------------


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
