"""Forty-first-wave operators (r3 continuation): lift/gains curve, TTL
retention audit.

  A51 q_agg_lift_curve — cumulative gains/lift curve for a ranking
                         score: documents ranked into deciles by a
                         score column, per-decile positive capture and
                         cumulative lift — the ranking-model
                         evaluation that precision/recall points
                         (V12/L14) don't show.
  E32 q_etl_ttl_audit  — retention-policy audit: per-source TTLs as
                         policy data, expired/retained row and byte
                         accounting — what a deletion sweep would
                         remove, BEFORE it runs.

Determinism notes (SURVEY §5.3):
  * A51: deciles via ntile(10) ordered by (score, doc_id) — unique
    tie-break (rule 3); counts exact; rates and lift are IEEE ratios
    rounded 6dp.
  * E32 is exact timestamp/integer filtering with a literal policy.

Scale notes:
  * A51 collapses to 10 decile rows; at billions of rows fixed score
    cutoffs from A20's sketch replace the global ntile sort (A50's
    rule).
  * E32 is map-only classification + one keyed reduction; the audit
    IS the deletion plan — partition layouts keyed on event date turn
    the sweep into partition drops instead of row deletes.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession, Window
from pyspark.sql import functions as F

from ai_to_cvent_etl_spark.io import load_table
from ai_to_cvent_etl_spark.registry import register

# --- A51: cumulative gains / lift curve --------------------------------------


@register(
    "q_agg_lift_curve",
    oracle="""
        WITH scored AS (
            SELECT doc_id,
                   n_chars AS score,
                   CASE WHEN lang = 'en' THEN 1 ELSE 0 END AS positive,
                   ntile(10) OVER (ORDER BY n_chars DESC, doc_id) AS decile
            FROM documents
        ),
        d AS (
            SELECT decile,
                   CAST(COUNT(*) AS BIGINT) AS n,
                   CAST(SUM(positive) AS BIGINT) AS pos
            FROM scored GROUP BY decile
        ),
        c AS (
            SELECT decile, n, pos,
                   CAST(SUM(pos) OVER w AS BIGINT) AS cum_pos,
                   CAST(SUM(n) OVER w AS BIGINT) AS cum_n,
                   CAST(SUM(pos) OVER () AS BIGINT) AS total_pos,
                   CAST(SUM(n) OVER () AS BIGINT) AS total_n
            FROM d
            WINDOW w AS (ORDER BY decile ROWS BETWEEN UNBOUNDED PRECEDING
                         AND CURRENT ROW)
        )
        SELECT CAST(decile AS INT) AS decile, n, pos,
               ROUND(CAST(cum_pos AS DOUBLE) / total_pos, 6)
                   AS cum_capture,
               ROUND((CAST(cum_pos AS DOUBLE) / total_pos)
                     / (CAST(cum_n AS DOUBLE) / total_n), 6) AS cum_lift
        FROM c
    """,
    section="A51",
    doc="Cumulative gains / lift curve for a ranking score: documents "
    "ranked into deciles by the score (n_chars standing in for a "
    "model score; positives = English docs), per-decile positive "
    "counts, cumulative capture rate, and cumulative lift vs random "
    "targeting — the ranking-model evaluation a single "
    "precision/recall point (V12, L14) can't show: WHERE on the "
    "ranked list the positives concentrate, which is what targeting "
    "and curation budgets act on. Deciles via ntile ordered by "
    "(score, doc_id) — exact; collapses to 10 rows; fixed sketch "
    "cutoffs replace the global sort at scale (A50's rule).",
)
def q_agg_lift_curve(spark: SparkSession, sf_dir: str) -> DataFrame:
    docs = load_table(spark, sf_dir, "documents")
    scored = docs.select(
        "doc_id",
        F.when(F.col("lang") == "en", 1).otherwise(0).alias("positive"),
        F.ntile(10)
        .over(Window.orderBy(F.desc("n_chars"), F.asc("doc_id")))
        .alias("decile"),
    )
    d = scored.groupBy("decile").agg(
        F.count("*").alias("n"), F.sum("positive").alias("pos")
    )
    w = Window.orderBy("decile").rowsBetween(Window.unboundedPreceding, 0)
    wall = Window.partitionBy()
    c = d.select(
        "decile",
        "n",
        "pos",
        F.sum("pos").over(w).alias("cum_pos"),
        F.sum("n").over(w).alias("cum_n"),
        F.sum("pos").over(wall).alias("total_pos"),
        F.sum("n").over(wall).alias("total_n"),
    )
    return c.select(
        F.col("decile").cast("int").alias("decile"),
        "n",
        "pos",
        F.round(
            F.col("cum_pos").cast("double") / F.col("total_pos"), 6
        ).alias("cum_capture"),
        F.round(
            (F.col("cum_pos").cast("double") / F.col("total_pos"))
            / (F.col("cum_n").cast("double") / F.col("total_n")),
            6,
        ).alias("cum_lift"),
    )


# --- E32: TTL retention audit ------------------------------------------------

_TTL_POLICY = [
    # (event_type, ttl_days) — retention policy as data
    ("view", 365),
    ("click", 548),
    ("error", 90),
    ("signup", 1825),
    ("purchase", 1825),
]
_AS_OF = "2001-06-01"


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
