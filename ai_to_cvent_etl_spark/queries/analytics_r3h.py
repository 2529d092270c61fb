"""Tenth-wave operators (r3 continuation): classifier evaluation,
embedding drift monitoring, the cogrouped-map API, and lateral joins.

  L14 q_text_langid_confusion — confusion matrix + per-class recall for
                                the L1 language classifier against gold
                                labels (the model-eval loop every
                                classifier in a pipeline needs).
  V14 q_vec_embedding_drift   — per-dimension centroid shift between two
                                corpus halves (the embedding-drift
                                monitor run between model/data versions).
  X6  q_cogroup_pandas        — two-sided cogrouped applyInPandas
                                (Arrow cogroup map): per-key merge of
                                events and orders — the API surface
                                X1-X5's one-sided UD*Fs don't cover.
  J20 q_join_lateral_topk     — correlated LATERAL subquery with
                                ORDER BY ... LIMIT (top-2 latest orders
                                per customer) — the lateral-join
                                planning path beyond J1-J19.

Determinism notes (SURVEY §5.3):
  * L14 inherits L1's integer marker votes and fixed-priority argmax;
    recall is one int/int division.
  * V14 quantizes dims with floor(x_double * 1e6) (exact widening, one
    correctly-rounded multiply) and compares exact integer-moment means;
    the shift is a fixed IEEE tree.
  * X6 keeps every aggregate integral inside pandas: event values are
    floored to 1e-4 units, money to cents via round(v*100) (2dp doubles
    sit within 1 ulp of the true cent value — never near .5 — so
    numpy's round matches the SQL DECIMAL cast exactly); int64 sums are
    order-insensitive, so the pandas batch order cannot matter.
  * J20 runs the identical ANSI text on both engines; the per-customer
    ORDER BY ends in the unique order key.

Scale notes:
  * L14's matrix is |langs|^2 rows; scoring is L1's row-local map.
  * V14 is one posexplode + keyed agg; the halves join on a |dims|-row
    table.
  * X6's cogroup is the two-sided shuffle it demonstrates (both sides
    hash-partitioned by key, Arrow-batched per group) — state per key is
    one group's rows, the intended applyInPandas contract.
  * J20's lateral subquery is rewritten by Catalyst to a window/limit
    over the orders side — one keyed shuffle, no per-row subquery
    execution.
"""

from __future__ import annotations

import pandas as pd

from pyspark.sql import DataFrame, SparkSession, Window
from pyspark.sql import functions as F

from ai_to_cvent_etl_spark.io import load_table
from ai_to_cvent_etl_spark.registry import register

# --- L14: language-ID confusion matrix --------------------------------------


def _confusion_oracle() -> str:
    from ai_to_cvent_etl_spark.queries.llm_text import _LANG_MARKERS

    scored = ", ".join(
        f"CAST(len(list_filter(string_split(text, ' '), "
        f"x -> list_contains({m}, x))) AS BIGINT) AS s_{lg}"
        for lg, m in _LANG_MARKERS.items()
    )
    pred = """
               CASE
                   WHEN s_de >= s_en AND s_de >= s_es AND s_de >= s_fr AND s_de >= s_zh THEN 'de'
                   WHEN s_en >= s_es AND s_en >= s_fr AND s_en >= s_zh THEN 'en'
                   WHEN s_es >= s_fr AND s_es >= s_zh THEN 'es'
                   WHEN s_fr >= s_zh THEN 'fr'
                   ELSE 'zh'
               END"""
    return f"""
        WITH scored AS (
            SELECT doc_id, lang, {scored} FROM documents
        ),
        p AS (
            SELECT lang, {pred} AS pred_lang FROM scored
        ),
        cm AS (
            SELECT lang, pred_lang, CAST(COUNT(*) AS BIGINT) AS n
            FROM p GROUP BY lang, pred_lang
        )
        SELECT lang, pred_lang, n,
               CAST(SUM(n) OVER (PARTITION BY lang) AS BIGINT) AS n_gold,
               CAST(CASE WHEN lang = pred_lang THEN n ELSE 0 END AS DOUBLE)
                   / CAST(SUM(n) OVER (PARTITION BY lang) AS BIGINT)
                   AS recall_if_diag
        FROM cm
    """


@register(
    "q_text_langid_confusion",
    oracle=_confusion_oracle(),
    section="L14",
    doc="Confusion matrix + per-class recall for the L1 language "
    "classifier against the gold lang labels — the evaluation loop every "
    "in-pipeline classifier needs (which languages leak into which). "
    "Scoring is L1's row-local integer marker voting; the matrix is "
    "|langs|^2 rows, so the recall window runs on a bounded table. "
    "Counts + one division — exact.",
)
def q_text_langid_confusion(spark: SparkSession, sf_dir: str) -> DataFrame:
    from ai_to_cvent_etl_spark.queries.llm_text import _LANG_MARKERS, _hits

    docs = load_table(spark, sf_dir, "documents")
    toks = F.split(F.col("text"), " ")
    scored = docs.select(
        "lang",
        *[_hits(toks, m).alias(f"s_{lg}") for lg, m in _LANG_MARKERS.items()],
    )
    s = {lg: F.col(f"s_{lg}") for lg in _LANG_MARKERS}
    pred = (
        F.when(
            (s["de"] >= s["en"])
            & (s["de"] >= s["es"])
            & (s["de"] >= s["fr"])
            & (s["de"] >= s["zh"]),
            "de",
        )
        .when(
            (s["en"] >= s["es"]) & (s["en"] >= s["fr"]) & (s["en"] >= s["zh"]),
            "en",
        )
        .when((s["es"] >= s["fr"]) & (s["es"] >= s["zh"]), "es")
        .when(s["fr"] >= s["zh"], "fr")
        .otherwise("zh")
    )
    cm = (
        scored.select("lang", pred.alias("pred_lang"))
        .groupBy("lang", "pred_lang")
        .agg(F.count(F.lit(1)).alias("n"))
    )
    wl = Window.partitionBy("lang")
    return cm.select(
        "lang",
        "pred_lang",
        "n",
        F.sum("n").over(wl).alias("n_gold"),
        (
            F.when(F.col("lang") == F.col("pred_lang"), F.col("n"))
            .otherwise(0)
            .cast("double")
            / F.sum("n").over(wl)
        ).alias("recall_if_diag"),
    )


# --- V14: embedding drift between corpus halves -----------------------------


@register(
    "q_vec_embedding_drift",
    oracle="""
        WITH x AS (
            SELECT vec_id % 2 AS half, u.pos AS pos,
                   CAST(floor(CAST(u.val AS DOUBLE) * 1e6) AS BIGINT) AS qx
            FROM (
                SELECT vec_id,
                       unnest(list_transform(embedding,
                              (x, i) -> struct_pack(val := x, pos := i))) AS u
                FROM embeddings
            )
        ),
        m AS (
            SELECT half, pos, CAST(COUNT(*) AS BIGINT) AS n,
                   CAST(SUM(qx) AS BIGINT) AS s
            FROM x GROUP BY half, pos
        )
        SELECT CAST(a.pos AS INTEGER) AS pos,
               a.n AS n_a, b.n AS n_b,
               CAST(a.s AS DOUBLE) / a.n AS mean_qa,
               CAST(b.s AS DOUBLE) / b.n AS mean_qb,
               abs(CAST(a.s AS DOUBLE) / a.n - CAST(b.s AS DOUBLE) / b.n)
                   AS abs_shift
        FROM m a JOIN m b ON a.pos = b.pos AND a.half = 0 AND b.half = 1
    """,
    section="V14",
    doc="Per-dimension embedding drift monitor: centroid shift between "
    "two corpus halves (the check run between data/model versions before "
    "an index rebuild — a large shift invalidates trained centroids like "
    "V6's). Dims quantized floor(x*1e6) to exact integers; means are "
    "single divisions of exact moments; the shift is a fixed IEEE tree. "
    "One posexplode + keyed agg; the halves join on a |dims|-row table.",
)
def q_vec_embedding_drift(spark: SparkSession, sf_dir: str) -> DataFrame:
    emb = load_table(spark, sf_dir, "embeddings")
    x = emb.select(
        (F.col("vec_id") % 2).alias("half"),
        F.posexplode("embedding").alias("pos0", "v"),
    ).select(
        "half",
        (F.col("pos0") + 1).alias("pos"),
        F.expr("cast(floor(cast(v as double) * 1e6) as bigint)").alias("qx"),
    )
    m = x.groupBy("half", "pos").agg(
        F.count(F.lit(1)).alias("n"), F.sum("qx").alias("s")
    )
    a = m.where(F.col("half") == 0).select(
        "pos", F.col("n").alias("n_a"), F.col("s").alias("s_a")
    )
    b = m.where(F.col("half") == 1).select(
        "pos", F.col("n").alias("n_b"), F.col("s").alias("s_b")
    )
    ma = F.col("s_a").cast("double") / F.col("n_a")
    mb = F.col("s_b").cast("double") / F.col("n_b")
    return (
        a.join(b, "pos")
        .select(
            F.col("pos").cast("int"),
            "n_a",
            "n_b",
            ma.alias("mean_qa"),
            mb.alias("mean_qb"),
            F.abs(ma - mb).alias("abs_shift"),
        )
    )


# --- X6: cogrouped applyInPandas --------------------------------------------

_COGROUP_SCHEMA = (
    "k bigint, n_events bigint, sum_qv bigint, n_orders bigint, "
    "sum_cents bigint"
)


_COGROUP_BUCKETS = 64


def _merge_bucket(key, ev: pd.DataFrame, od: pd.DataFrame) -> pd.DataFrame:
    """Per-BUCKET two-sided merge with a vectorized per-user groupby
    inside pandas. Cogrouping on a bucket key instead of the raw user key
    is the load-bearing choice: per-key cogroup would pay one Python call
    per user (~15k calls at sf0.1, 10+ s); 64 buckets amortize the
    Python/Arrow boundary to 64 calls while the merge itself stays
    columnar. All aggregates are int64 (order-insensitive in the batch):
    event values floored to 1e-4 units, money rounded to exact cents (2dp
    doubles sit within 1 ulp of the true cent value, never near .5, so
    numpy round == the SQL DECIMAL cast)."""
    import numpy as np

    if len(ev):
        e = pd.DataFrame(
            {
                "k": ev["user_id"].astype("int64"),
                "qv": np.floor(ev["value"].to_numpy() * 1e4).astype("int64"),
            }
        )
        ge = e.groupby("k")["qv"].agg(["size", "sum"])
        ge.columns = ["n_events", "sum_qv"]
    else:
        ge = pd.DataFrame(columns=["n_events", "sum_qv"], dtype="int64")
    if len(od):
        o = pd.DataFrame(
            {
                "k": od["o_custkey"].astype("int64"),
                "c": np.round(od["o_totalprice"].to_numpy() * 100).astype(
                    "int64"
                ),
            }
        )
        go = o.groupby("k")["c"].agg(["size", "sum"])
        go.columns = ["n_orders", "sum_cents"]
    else:
        go = pd.DataFrame(columns=["n_orders", "sum_cents"], dtype="int64")
    m = ge.join(go, how="outer").fillna(0).astype("int64").reset_index()
    m = m.rename(columns={"index": "k"})
    return m[["k", "n_events", "sum_qv", "n_orders", "sum_cents"]]


@register(
    "q_cogroup_pandas",
    oracle="""
        WITH e AS (
            SELECT user_id AS k, CAST(COUNT(*) AS BIGINT) AS n_events,
                   CAST(SUM(CAST(floor(value * 1e4) AS BIGINT)) AS BIGINT)
                       AS sum_qv
            FROM events GROUP BY user_id
        ),
        o AS (
            SELECT o_custkey AS k, CAST(COUNT(*) AS BIGINT) AS n_orders,
                   CAST(SUM(CAST(CAST(o_totalprice AS DECIMAL(18,2)) * 100
                                 AS BIGINT)) AS BIGINT) AS sum_cents
            FROM orders GROUP BY o_custkey
        )
        SELECT COALESCE(e.k, o.k) AS k,
               COALESCE(e.n_events, 0) AS n_events,
               COALESCE(e.sum_qv, 0) AS sum_qv,
               COALESCE(o.n_orders, 0) AS n_orders,
               COALESCE(o.sum_cents, 0) AS sum_cents
        FROM e FULL OUTER JOIN o ON e.k = o.k
    """,
    section="X6",
    doc="Two-sided cogrouped Arrow map (groupBy().cogroup()."
    "applyInPandas): per-user merge of the events and orders groups in "
    "one pandas function — the cogroup API surface X1-X5's one-sided "
    "UD*Fs don't pin. Cogrouped on a 64-way BUCKET key (per-user keys "
    "would pay one Python call per user — 10+ s at sf0.1; buckets "
    "amortize the Arrow boundary while the in-pandas merge stays "
    "columnar). Both sides hash-partition once; all pandas aggregates "
    "are int64 — order-insensitive — so batch order cannot leak into "
    "results; oracle = the equivalent FULL OUTER JOIN of grouped "
    "aggregates.",
)
def q_cogroup_pandas(spark: SparkSession, sf_dir: str) -> DataFrame:
    ev = load_table(spark, sf_dir, "events").select(
        (F.col("user_id") % _COGROUP_BUCKETS).alias("bkt"), "user_id", "value"
    )
    od = load_table(spark, sf_dir, "orders").select(
        (F.col("o_custkey") % _COGROUP_BUCKETS).alias("bkt"),
        "o_custkey",
        "o_totalprice",
    )
    return (
        ev.groupBy("bkt")
        .cogroup(od.groupBy("bkt"))
        .applyInPandas(_merge_bucket, schema=_COGROUP_SCHEMA)
    )


# --- J20: correlated LATERAL subquery with LIMIT ----------------------------

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
