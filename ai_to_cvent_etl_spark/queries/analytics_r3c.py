"""Sixth-wave operators (r3 continuation): dataset profiling, sequence
modeling, categorical statistics, market-basket analysis, and rolling
medians.

  E13 q_etl_column_profile    — per-column dataset profile (nulls,
                                distincts, min/max) in one scan: the
                                pre-ingest DQ report every pipeline runs.
  T12 q_text_markov_transitions — first-order Markov transition matrix
                                over per-user event sequences (the
                                next-event model / session language model).
  A23 q_agg_chisq             — chi-square independence contributions for
                                a contingency table (the A/B-test /
                                feature-vs-label dependence screen).
  A24 q_agg_basket_lift       — market-basket association: brand
                                co-purchase support & lift within orders.
  W17 q_win_rolling_median    — trailing-7 rolling median per user, built
                                from a sorted bounded frame array
                                (robust smoother; outlier-proof MA).

Determinism notes (SURVEY §5.3):
  * E13 reports min/max on a numeric axis only (doubles are exact 2dp money
    or integer keys; dates go through epoch DAYS — timezone-immune on a
    TIMESTAMP_NTZ column, exact small integers), so no engine-specific
    string formatting of values is involved.
  * T12's transition probability is a single int/int IEEE division of
    bit-identical operands — exact cross-engine.
  * A23 builds expected counts and chi-square contributions with the
    IDENTICAL double expression tree on both engines from exact integer
    marginals: each *, /, - is one correctly-rounded IEEE op, so the
    result is bit-deterministic without rounding.
  * A24's support is one division; lift is (co*n)/(ca*cb) with both
    products exact in double (counts < 2^26) — again a fixed expression
    tree over exact integers.
  * W17 quantizes values with floor(value*100) to BIGINT and takes the
    median of a SORTED array built over the bounded frame; the even-count
    midpoint is (a+b)/2.0 of two integers — exact in double.

Scale notes:
  * E13 is ONE scan: all per-column metrics are computed in a single
    multi-count-distinct aggregate (Catalyst Expand), then pivoted to
    long form with a row-local stack — no per-column rescans.
  * T12 is one window sort per user (lead only — constant state) plus a
    25-key aggregation; the transition matrix is |types|^2 ≤ tiny.
  * A23 aggregates to a 15-row contingency table first; all marginal
    windows run on that bounded table.
  * A24's only corpus-sized shuffle is the (orderkey, brand) self-join,
    blocked on orderkey (bounded fan-out: ≤ brands-per-order² per key);
    brand marginals and the scalar total are broadcast.
  * W17 is one window sort per user with a 7-row frame — constant per-row
    state; the sorted array never exceeds 7 elements.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession, Window
from pyspark.sql import functions as F

from ai_to_cvent_etl_spark.io import load_table
from ai_to_cvent_etl_spark.registry import register

# --- E13: one-scan column profile -------------------------------------------

_PROFILE_COLS = [
    # (name, numeric-projection Spark, numeric-projection DuckDB)
    ("o_orderkey", "cast(o_orderkey as double)", "CAST(o_orderkey AS DOUBLE)"),
    ("o_custkey", "cast(o_custkey as double)", "CAST(o_custkey AS DOUBLE)"),
    ("o_totalprice", "cast(o_totalprice as double)", "CAST(o_totalprice AS DOUBLE)"),
    (
        "o_orderdate",
        "cast(datediff(cast(o_orderdate as date), date'1970-01-01') as double)",
        "CAST(CAST(o_orderdate AS DATE) - DATE '1970-01-01' AS DOUBLE)",
    ),
]


def _profile_oracle() -> str:
    branches = []
    for name, _, proj in _PROFILE_COLS:
        branches.append(
            f"""
            SELECT '{name}' AS col_name,
                   CAST(COUNT(*) AS BIGINT) AS n_rows,
                   CAST(COUNT(*) - COUNT({name}) AS BIGINT) AS n_nulls,
                   CAST(COUNT(DISTINCT {name}) AS BIGINT) AS n_distinct,
                   MIN({proj}) AS min_v,
                   MAX({proj}) AS max_v
            FROM orders
            """
        )
    return " UNION ALL ".join(branches)


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


# --- T12: first-order Markov transition matrix ------------------------------


@register(
    "q_text_markov_transitions",
    oracle="""
        WITH seq AS (
            SELECT event_type AS from_type,
                   lead(event_type) OVER (
                       PARTITION BY user_id ORDER BY ts, event_id
                   ) AS to_type
            FROM events
        ),
        pair AS (
            SELECT from_type, to_type, CAST(COUNT(*) AS BIGINT) AS n
            FROM seq WHERE to_type IS NOT NULL
            GROUP BY from_type, to_type
        )
        SELECT from_type, to_type, n,
               CAST(SUM(n) OVER (PARTITION BY from_type) AS BIGINT) AS n_from,
               CAST(n AS DOUBLE)
                   / CAST(SUM(n) OVER (PARTITION BY from_type) AS DOUBLE) AS p
        FROM pair
    """,
    section="T12",
    doc="First-order Markov next-event transition matrix over per-user "
    "event sequences: lead() window (constant state) -> pair counts -> "
    "row-normalized probabilities. p is one int/int IEEE division — exact "
    "cross-engine. The matrix is |event_types|^2 rows, so every step after "
    "the lead window runs on a bounded table.",
)
def q_text_markov_transitions(spark: SparkSession, sf_dir: str) -> DataFrame:
    ev = load_table(spark, sf_dir, "events")
    w = Window.partitionBy("user_id").orderBy("ts", "event_id")
    pair = (
        ev.select(
            F.col("event_type").alias("from_type"),
            F.lead("event_type").over(w).alias("to_type"),
        )
        .where(F.col("to_type").isNotNull())
        .groupBy("from_type", "to_type")
        .agg(F.count(F.lit(1)).alias("n"))
    )
    wf = Window.partitionBy("from_type")
    return pair.select(
        "from_type",
        "to_type",
        "n",
        F.sum("n").over(wf).alias("n_from"),
        (
            F.col("n").cast("double") / F.sum("n").over(wf).cast("double")
        ).alias("p"),
    )


# --- A23: chi-square independence contributions -----------------------------


@register(
    "q_agg_chisq",
    oracle="""
        WITH obs AS (
            SELECT o_orderpriority, o_orderstatus,
                   CAST(COUNT(*) AS BIGINT) AS obs
            FROM orders GROUP BY o_orderpriority, o_orderstatus
        ),
        m AS (
            SELECT o_orderpriority, o_orderstatus, obs,
                   CAST(SUM(obs) OVER (PARTITION BY o_orderpriority) AS BIGINT) AS rt,
                   CAST(SUM(obs) OVER (PARTITION BY o_orderstatus) AS BIGINT) AS ct,
                   CAST(SUM(obs) OVER () AS BIGINT) AS t
            FROM obs
        ),
        e AS (
            SELECT *,
                   CAST(rt AS DOUBLE) * CAST(ct AS DOUBLE) / CAST(t AS DOUBLE)
                       AS exp_v
            FROM m
        )
        SELECT o_orderpriority, o_orderstatus, obs, rt, ct, exp_v,
               (CAST(obs AS DOUBLE) - exp_v) * (CAST(obs AS DOUBLE) - exp_v)
                   / exp_v AS chisq_contrib
        FROM e
    """,
    section="A23",
    doc="Chi-square independence test contributions for the order "
    "priority x status contingency table (the A/B-test / feature-vs-label "
    "dependence screen). Expected counts and contributions are built with "
    "the IDENTICAL IEEE double expression tree from exact integer "
    "marginals on both engines — bit-deterministic, no rounding. The "
    "corpus collapses to a 15-row contingency table first; every marginal "
    "window runs on that bounded table.",
)
def q_agg_chisq(spark: SparkSession, sf_dir: str) -> DataFrame:
    od = load_table(spark, sf_dir, "orders")
    obs = od.groupBy("o_orderpriority", "o_orderstatus").agg(
        F.count(F.lit(1)).alias("obs")
    )
    m = obs.select(
        "*",
        F.sum("obs").over(Window.partitionBy("o_orderpriority")).alias("rt"),
        F.sum("obs").over(Window.partitionBy("o_orderstatus")).alias("ct"),
        F.sum("obs").over(
            Window.partitionBy()
        ).alias("t"),
    )
    e = m.withColumn(
        "exp_v",
        F.col("rt").cast("double") * F.col("ct").cast("double")
        / F.col("t").cast("double"),
    )
    d = F.col("obs").cast("double") - F.col("exp_v")
    return e.select(
        "o_orderpriority",
        "o_orderstatus",
        "obs",
        "rt",
        "ct",
        "exp_v",
        (d * d / F.col("exp_v")).alias("chisq_contrib"),
    )


# --- A24: market-basket support & lift --------------------------------------

_BASKET_MIN_CO = 10  # min co-occurrence count to report a pair


@register(
    "q_agg_basket_lift",
    oracle=f"""
        WITH ob AS (
            SELECT DISTINCT l.l_orderkey AS okey, p.p_brand AS brand
            FROM lineitem l JOIN part p ON l.l_partkey = p.p_partkey
        ),
        tot AS (SELECT CAST(COUNT(DISTINCT okey) AS BIGINT) AS n FROM ob),
        bc AS (
            SELECT brand, CAST(COUNT(*) AS BIGINT) AS nb
            FROM ob GROUP BY brand
        ),
        co AS (
            SELECT a.brand AS brand_a, b.brand AS brand_b,
                   CAST(COUNT(*) AS BIGINT) AS n_co
            FROM ob a JOIN ob b
              ON a.okey = b.okey AND a.brand < b.brand
            GROUP BY a.brand, b.brand
        )
        SELECT co.brand_a, co.brand_b, co.n_co,
               ca.nb AS n_a, cb.nb AS n_b, tot.n AS n_orders,
               CAST(co.n_co AS DOUBLE) / CAST(tot.n AS DOUBLE) AS support,
               (CAST(co.n_co AS DOUBLE) * CAST(tot.n AS DOUBLE))
                   / (CAST(ca.nb AS DOUBLE) * CAST(cb.nb AS DOUBLE)) AS lift
        FROM co
        JOIN bc ca ON co.brand_a = ca.brand
        JOIN bc cb ON co.brand_b = cb.brand
        CROSS JOIN tot
        WHERE co.n_co >= {_BASKET_MIN_CO}
    """,
    section="A24",
    doc="Market-basket association rules: brand co-purchase support and "
    "lift within orders. The only corpus-sized shuffle is the distinct "
    "(orderkey, brand) self-join, blocked on orderkey (fan-out bounded by "
    "brands-per-order^2 per key); brand marginals (25 rows) and the scalar "
    "order total are broadcast. support/lift are fixed IEEE expression "
    "trees over exact integer counts — bit-deterministic.",
)
def q_agg_basket_lift(spark: SparkSession, sf_dir: str) -> DataFrame:
    li = load_table(spark, sf_dir, "lineitem")
    pt = load_table(spark, sf_dir, "part")
    ob = (
        li.join(pt, li.l_partkey == pt.p_partkey)
        .select(F.col("l_orderkey").alias("okey"), F.col("p_brand").alias("brand"))
        .distinct()
    )
    tot = ob.agg(F.countDistinct("okey").alias("n_orders"))
    bc = ob.groupBy("brand").agg(F.count(F.lit(1)).alias("nb"))
    a = ob.alias("a")
    b = ob.alias("b")
    co = (
        a.join(
            b,
            (F.col("a.okey") == F.col("b.okey"))
            & (F.col("a.brand") < F.col("b.brand")),
        )
        .groupBy(
            F.col("a.brand").alias("brand_a"), F.col("b.brand").alias("brand_b")
        )
        .agg(F.count(F.lit(1)).alias("n_co"))
        .where(F.col("n_co") >= _BASKET_MIN_CO)
    )
    ca = F.broadcast(bc.select(F.col("brand").alias("brand_a"), F.col("nb").alias("n_a")))
    cb = F.broadcast(bc.select(F.col("brand").alias("brand_b"), F.col("nb").alias("n_b")))
    return (
        co.join(ca, "brand_a")
        .join(cb, "brand_b")
        .crossJoin(F.broadcast(tot))
        .select(
            "brand_a",
            "brand_b",
            "n_co",
            "n_a",
            "n_b",
            "n_orders",
            (F.col("n_co").cast("double") / F.col("n_orders").cast("double")).alias(
                "support"
            ),
            (
                (F.col("n_co").cast("double") * F.col("n_orders").cast("double"))
                / (F.col("n_a").cast("double") * F.col("n_b").cast("double"))
            ).alias("lift"),
        )
    )


# --- W17: rolling median over a bounded frame -------------------------------

_MED_FRAME = 7


@register(
    "q_win_rolling_median",
    oracle=f"""
        WITH q AS (
            SELECT event_id, user_id, ts,
                   CAST(floor(value * 100) AS BIGINT) AS qv
            FROM events
        ),
        w AS (
            SELECT event_id, user_id, qv,
                   list_sort(list(qv) OVER (
                       PARTITION BY user_id ORDER BY ts, event_id
                       ROWS BETWEEN {_MED_FRAME - 1} PRECEDING AND CURRENT ROW
                   )) AS arr
            FROM q
        )
        SELECT event_id, user_id, qv,
               CAST(len(arr) AS INTEGER) AS n_win,
               CASE WHEN len(arr) % 2 = 1
                    THEN CAST(arr[(len(arr) + 1) // 2] AS DOUBLE)
                    ELSE (CAST(arr[len(arr) // 2] AS DOUBLE)
                          + CAST(arr[len(arr) // 2 + 1] AS DOUBLE)) / 2.0
               END AS med7
        FROM w
    """,
    section="W17",
    doc="Trailing-7 rolling median per user (robust outlier-proof "
    "smoother). Values quantized floor(v*100) to BIGINT; the median comes "
    "from a SORTED array built over the bounded ROWS frame — the "
    "even-count midpoint is (a+b)/2.0 of two exact integers, so the "
    "result is bit-deterministic. Bounded 7-row frame = constant per-row "
    "state; one window sort per user at any scale (Spark has no "
    "median-over-frame builtin — the sorted-frame-array composition IS "
    "the operator).",
)
def q_win_rolling_median(spark: SparkSession, sf_dir: str) -> DataFrame:
    ev = load_table(spark, sf_dir, "events")
    f = (
        Window.partitionBy("user_id")
        .orderBy("ts", "event_id")
        .rowsBetween(-(_MED_FRAME - 1), Window.currentRow)
    )
    q = ev.select(
        "event_id",
        "user_id",
        "ts",
        F.expr("cast(floor(value * 100) as bigint)").alias("qv"),
    )
    w = q.select(
        "event_id",
        "user_id",
        "qv",
        F.sort_array(F.collect_list("qv").over(f)).alias("arr"),
    )
    n = F.size("arr")
    return w.select(
        "event_id",
        "user_id",
        "qv",
        n.cast("int").alias("n_win"),
        F.when(
            n % 2 == 1,
            F.element_at("arr", ((n + 1) / 2).cast("int")).cast("double"),
        )
        .otherwise(
            (
                F.element_at("arr", (n / 2).cast("int")).cast("double")
                + F.element_at("arr", (n / 2 + 1).cast("int")).cast("double")
            )
            / F.lit(2.0)
        )
        .alias("med7"),
    )


# --- T11: inverted index with bounded posting lists -------------------------

_POSTINGS_CAP = 20


@register(
    "q_text_inverted_index",
    oracle=f"""
        WITH tok AS (
            SELECT doc_id, unnest(string_split(lower(text), ' ')) AS token
            FROM documents
        ),
        tf AS (
            SELECT token, CAST(COUNT(*) AS BIGINT) AS tf_total
            FROM tok GROUP BY token
        ),
        d AS (SELECT DISTINCT token, doc_id FROM tok),
        dfreq AS (
            SELECT token, CAST(COUNT(*) AS BIGINT) AS df_docs
            FROM d GROUP BY token
        ),
        ranked AS (
            SELECT token, doc_id,
                   row_number() OVER (
                       PARTITION BY token ORDER BY doc_id
                   ) AS rn
            FROM d
        ),
        post AS (
            SELECT token, list(doc_id ORDER BY doc_id) AS postings
            FROM ranked WHERE rn <= {_POSTINGS_CAP}
            GROUP BY token
        )
        SELECT tf.token, tf.tf_total, dfreq.df_docs, post.postings
        FROM tf JOIN dfreq USING (token) JOIN post USING (token)
    """,
    section="T11",
    doc="Inverted index build: token -> document frequency, total term "
    "frequency, and a CAPPED sorted posting-list head (first "
    f"{_POSTINGS_CAP} doc_ids). The cap is the scalable shape: a "
    "stop-token's full posting list is corpus-sized, so the head is "
    "selected by row_number over the DISTINCT (token, doc_id) relation "
    "(bounded per-group output), never by collecting an unbounded set. "
    "Two keyed shuffles (distinct + counts) over the token stream; the "
    "final join runs on vocabulary-sized tables.",
)
def q_text_inverted_index(spark: SparkSession, sf_dir: str) -> DataFrame:
    docs = load_table(spark, sf_dir, "documents")
    tok = docs.select(
        "doc_id",
        F.explode(F.split(F.lower(F.col("text")), " ")).alias("token"),
    )
    tf = tok.groupBy("token").agg(F.count(F.lit(1)).alias("tf_total"))
    d = tok.distinct()
    dfreq = d.groupBy("token").agg(F.count(F.lit(1)).alias("df_docs"))
    rn = F.row_number().over(Window.partitionBy("token").orderBy("doc_id"))
    post = (
        d.withColumn("rn", rn)
        .filter(F.col("rn") <= _POSTINGS_CAP)
        .groupBy("token")
        .agg(F.sort_array(F.collect_list("doc_id")).alias("postings"))
    )
    return tf.join(dfreq, "token").join(post, "token")


# --- SK2: Bloom-filter membership statistics --------------------------------

_BLOOM_M = 4096  # bits
_BLOOM_K = 3     # hash functions

_BLOOM_POS_SPARK = (
    "cast(conv(substr(md5(concat('bf', cast(seed as string), ':',"
    " cast(k as string))), 1, 4), 16, 10) as bigint) % {m}"
)
_BLOOM_POS_DUCK = (
    "CAST(('0x' || substr(md5('bf' || CAST(seed AS VARCHAR) || ':' ||"
    " CAST(k AS VARCHAR)), 1, 4)) AS BIGINT) % {m}"
)


@register(
    "q_sketch_bloom",
    oracle=f"""
        WITH seeds AS (SELECT unnest([0, 1, 2]) AS seed),
        build AS (
            SELECT DISTINCT c_custkey AS k FROM customer
            WHERE c_mktsegment = 'BUILDING'
        ),
        bits AS (
            SELECT DISTINCT {_BLOOM_POS_DUCK.format(m=_BLOOM_M)} AS pos
            FROM build CROSS JOIN seeds
        ),
        probe AS (SELECT DISTINCT o_custkey AS k FROM orders),
        probe_pos AS (
            SELECT k, {_BLOOM_POS_DUCK.format(m=_BLOOM_M)} AS pos
            FROM probe CROSS JOIN seeds
        ),
        hits AS (
            SELECT p.k, CAST(COUNT(b.pos) AS BIGINT) AS n_hit
            FROM probe_pos p LEFT JOIN bits b ON p.pos = b.pos
            GROUP BY p.k
        ),
        flagged AS (
            SELECT h.k,
                   CASE WHEN h.n_hit = {_BLOOM_K} THEN 1 ELSE 0 END AS bloom_pass,
                   CASE WHEN bu.k IS NOT NULL THEN 1 ELSE 0 END AS truth
            FROM hits h LEFT JOIN build bu ON h.k = bu.k
        )
        SELECT CAST(COUNT(*) AS BIGINT) AS n_probe,
               CAST(SUM(bloom_pass) AS BIGINT) AS n_pass,
               CAST(SUM(truth) AS BIGINT) AS n_true,
               CAST(SUM(CASE WHEN bloom_pass = 1 AND truth = 0
                             THEN 1 ELSE 0 END) AS BIGINT) AS n_false_pos,
               CAST(SUM(CASE WHEN bloom_pass = 0 AND truth = 1
                             THEN 1 ELSE 0 END) AS BIGINT) AS n_false_neg,
               CAST(SUM(CASE WHEN bloom_pass = 1 AND truth = 0
                             THEN 1 ELSE 0 END) AS DOUBLE)
                   / CAST(COUNT(*) AS BIGINT) AS fp_rate
        FROM flagged
    """,
    section="SK2",
    doc=f"Bloom-filter semi-join pre-filter, measured: an m={_BLOOM_M}-bit "
    f"k={_BLOOM_K}-hash filter is built from the BUILDING-segment customer "
    "keys (md5-derived positions — identical bits cross-engine) and probed "
    "with every ordering customer; output = pass/true/false-positive "
    "counts and the FP rate (the always-zero false-negative column pins "
    "the no-false-negative Bloom invariant). This is the runtime-filter "
    "pattern Spark itself uses for join pruning: the bit set is bounded "
    f"({_BLOOM_M} rows max) and broadcast, the probe side never shuffles; "
    "all counts are integers, fp_rate is one IEEE division.",
)
def q_sketch_bloom(spark: SparkSession, sf_dir: str) -> DataFrame:
    cu = load_table(spark, sf_dir, "customer")
    od = load_table(spark, sf_dir, "orders")
    seeds = spark.range(_BLOOM_K).select(F.col("id").cast("int").alias("seed"))
    build = (
        cu.where(F.col("c_mktsegment") == "BUILDING")
        .select(F.col("c_custkey").alias("k"))
        .distinct()
    )
    pos_expr = F.expr(_BLOOM_POS_SPARK.format(m=_BLOOM_M))
    bits = (
        build.crossJoin(F.broadcast(seeds)).select(pos_expr.alias("pos")).distinct()
    )
    probe = od.select(F.col("o_custkey").alias("k")).distinct()
    probe_pos = probe.crossJoin(F.broadcast(seeds)).select(
        "k", pos_expr.alias("pos")
    )
    hits = (
        probe_pos.join(
            F.broadcast(bits.select(F.col("pos").alias("bpos"))),
            F.col("pos") == F.col("bpos"),
            "left",
        )
        .groupBy("k")
        .agg(F.count("bpos").alias("n_hit"))
    )
    flagged = hits.join(
        build.select(F.col("k").alias("bk")), F.col("k") == F.col("bk"), "left"
    ).select(
        F.when(F.col("n_hit") == _BLOOM_K, 1).otherwise(0).alias("bloom_pass"),
        F.when(F.col("bk").isNotNull(), 1).otherwise(0).alias("truth"),
    )
    return flagged.agg(
        F.count(F.lit(1)).alias("n_probe"),
        F.sum("bloom_pass").alias("n_pass"),
        F.sum("truth").alias("n_true"),
        F.sum(
            F.when((F.col("bloom_pass") == 1) & (F.col("truth") == 0), 1).otherwise(0)
        ).alias("n_false_pos"),
        F.sum(
            F.when((F.col("bloom_pass") == 0) & (F.col("truth") == 1), 1).otherwise(0)
        ).alias("n_false_neg"),
        (
            F.sum(
                F.when(
                    (F.col("bloom_pass") == 1) & (F.col("truth") == 0), 1
                ).otherwise(0)
            ).cast("double")
            / F.count(F.lit(1))
        ).alias("fp_rate"),
    )


# --- A25: Gini concentration coefficient ------------------------------------


@register(
    "q_agg_gini",
    oracle="""
        WITH spend AS (
            SELECT o.o_custkey AS ck,
                   SUM(CAST(o.o_totalprice AS DECIMAL(18,2))) AS x
            FROM orders o GROUP BY o.o_custkey
        ),
        seg AS (
            SELECT c.c_mktsegment AS segment, s.ck, s.x,
                   CAST(row_number() OVER (
                       PARTITION BY c.c_mktsegment ORDER BY s.x, s.ck
                   ) AS BIGINT) AS i
            FROM spend s JOIN customer c ON s.ck = c.c_custkey
        ),
        m AS (
            SELECT segment,
                   CAST(COUNT(*) AS BIGINT) AS n_cust,
                   SUM(x) AS sum_x,
                   SUM(i * x) AS sum_ix
            FROM seg GROUP BY segment
        )
        SELECT segment, n_cust,
               CAST(sum_x AS DOUBLE) AS total_spend,
               (2.0 * CAST(sum_ix AS DOUBLE)
                - (CAST(n_cust AS DOUBLE) + 1.0) * CAST(sum_x AS DOUBLE))
               / (CAST(n_cust AS DOUBLE) * CAST(sum_x AS DOUBLE)) AS gini
        FROM m
    """,
    section="A25",
    doc="Gini concentration coefficient of customer spend per market "
    "segment (revenue-inequality diagnostic; the 80/20 companion to W16's "
    "Pareto curve). Per-customer spend is an exact DECIMAL sum; ranks are "
    "integers with a unique-key tie-break; sum(i*x) stays in DECIMAL "
    "(exact, order-insensitive); the final Gini is ONE fixed IEEE "
    "expression tree over deterministic decimal->double conversions — "
    "bit-stable cross-engine. Two keyed shuffles + one per-segment sort.",
)
def q_agg_gini(spark: SparkSession, sf_dir: str) -> DataFrame:
    od = load_table(spark, sf_dir, "orders")
    cu = load_table(spark, sf_dir, "customer")
    from pyspark.sql.types import DecimalType

    spend = od.groupBy(F.col("o_custkey").alias("ck")).agg(
        F.sum(F.col("o_totalprice").cast(DecimalType(18, 2))).alias("x")
    )
    seg = spend.join(cu, spend.ck == cu.c_custkey).select(
        F.col("c_mktsegment").alias("segment"),
        "ck",
        "x",
        F.row_number()
        .over(Window.partitionBy("c_mktsegment").orderBy("x", "ck"))
        .cast("bigint")
        .alias("i"),
    )
    m = seg.groupBy("segment").agg(
        F.count(F.lit(1)).alias("n_cust"),
        F.sum("x").alias("sum_x"),
        F.sum(F.col("i") * F.col("x")).alias("sum_ix"),
    )
    n_d = F.col("n_cust").cast("double")
    sx = F.col("sum_x").cast("double")
    six = F.col("sum_ix").cast("double")
    return m.select(
        "segment",
        "n_cust",
        sx.alias("total_spend"),
        ((F.lit(2.0) * six - (n_d + F.lit(1.0)) * sx) / (n_d * sx)).alias("gini"),
    )


# --- D10: canonicalization dedup --------------------------------------------

_CANON_SPARK = (
    "md5(trim(regexp_replace(regexp_replace(lower(text), '[^a-z0-9 ]', ' '),"
    " ' +', ' ')))"
)
_CANON_DUCK = (
    "md5(trim(regexp_replace(regexp_replace(lower(text), '[^a-z0-9 ]', ' ',"
    " 'g'), ' +', ' ', 'g')))"
)


@register(
    "q_dedup_canonicalize",
    oracle=f"""
        WITH c AS (
            SELECT doc_id, n_chars, {_CANON_DUCK} AS ckey
            FROM documents
        )
        SELECT ckey,
               CAST(COUNT(*) AS BIGINT) AS n_docs,
               CAST(MIN(doc_id) AS BIGINT) AS canonical_doc,
               CAST(SUM(n_chars) AS BIGINT) AS total_chars
        FROM c GROUP BY ckey
    """,
    section="D10",
    doc="Canonicalization dedup (the URL/text-normalization tier that runs "
    "BEFORE MinHash in a real pipeline): lowercase, strip punctuation, "
    "collapse whitespace, md5 the canonical form, keep min-doc_id per "
    "canonical group. Normalization is row-local (map-only); the single "
    "shuffle is the keyed group on the 16-byte canonical hash — never on "
    "the text itself. Regexes use the Java/RE2 common subset so both "
    "engines canonicalize identically.",
)
def q_dedup_canonicalize(spark: SparkSession, sf_dir: str) -> DataFrame:
    docs = load_table(spark, sf_dir, "documents")
    return (
        docs.select("doc_id", "n_chars", F.expr(_CANON_SPARK).alias("ckey"))
        .groupBy("ckey")
        .agg(
            F.count(F.lit(1)).alias("n_docs"),
            F.min("doc_id").alias("canonical_doc"),
            F.sum("n_chars").alias("total_chars"),
        )
    )


# --- G5: bounded k-core peeling ---------------------------------------------

_KCORE_K = 3
_KCORE_ROUNDS = 3


def _kcore_oracle() -> str:
    from ai_to_cvent_etl_spark.queries.analytics_r3b import _EDGE_CTES

    # AS MATERIALIZED is load-bearing: DuckDB inlines plain CTEs per
    # reference, and each peel round references the previous round ~5
    # times — without materialization the (join-heavy) edge CTEs are
    # re-evaluated 5^rounds times and the oracle runs for minutes at
    # sf0.1 instead of seconds.
    ctes = [
        f"WITH {_EDGE_CTES}",
        "e0 AS MATERIALIZED (SELECT lo, hi FROM edges)",
    ]
    for r in range(_KCORE_ROUNDS):
        ctes.append(
            f"""
        d{r} AS MATERIALIZED (
            SELECT node, CAST(COUNT(*) AS BIGINT) AS deg FROM (
                SELECT lo AS node FROM e{r}
                UNION ALL SELECT hi FROM e{r}
            ) GROUP BY node
        ),
        a{r} AS MATERIALIZED (SELECT node FROM d{r} WHERE deg >= {_KCORE_K}),
        e{r + 1} AS MATERIALIZED (
            SELECT e.lo, e.hi FROM e{r} e
            JOIN a{r} x ON e.lo = x.node
            JOIN a{r} y ON e.hi = y.node
        )"""
        )
    r = _KCORE_ROUNDS
    final = f"""
        SELECT node, CAST(COUNT(*) AS BIGINT) AS deg FROM (
            SELECT lo AS node FROM e{r}
            UNION ALL SELECT hi FROM e{r}
        ) GROUP BY node
    """
    return ",\n".join(ctes) + final


@register(
    "q_graph_kcore",
    oracle=_kcore_oracle(),
    section="G5",
    doc=f"Bounded k-core peeling (k={_KCORE_K}, {_KCORE_ROUNDS} rounds) "
    "over the mutual top-8 trade-affinity supplier graph shared with "
    "G2/G4: each round drops nodes of degree < k and their incident "
    "edges — the standard dense-community extraction / graph-cleaning "
    "pass. Rounds are FIXED (not run-to-fixpoint) so the oracle is "
    "expressible as chained CTEs and the Spark plan has a static depth; "
    "each round is one keyed degree aggregation + two semi-joins on the "
    "degree-bounded (<= 8 per node) edge list. All-integer — exact.",
)
def q_graph_kcore(spark: SparkSession, sf_dir: str) -> DataFrame:
    from ai_to_cvent_etl_spark.queries.analytics_r3b import (
        _mutual_affinity_edges,
    )

    # Each peel round references the previous round's edge list ~5 times
    # (degree union + two semi-joins), so without lineage truncation the
    # logical plan grows 5^rounds copies of the (already join-heavy)
    # mutual-edges plan — localCheckpoint bounds the plan at every round
    # (same device as G1 PageRank / D5 connected components). The shared
    # edge list arrives already checkpointed+memoized from
    # _mutual_affinity_edges; each round re-truncates its own output.
    edges = _mutual_affinity_edges(spark, sf_dir)

    def degrees(e: DataFrame) -> DataFrame:
        nodes = e.select(F.col("lo").alias("node")).unionByName(
            e.select(F.col("hi").alias("node"))
        )
        return nodes.groupBy("node").agg(F.count(F.lit(1)).alias("deg"))

    for _ in range(_KCORE_ROUNDS):
        alive = degrees(edges).where(F.col("deg") >= _KCORE_K).select("node")
        edges = (
            edges.join(
                alive.select(F.col("node").alias("lo")), "lo", "left_semi"
            )
            .join(alive.select(F.col("node").alias("hi")), "hi", "left_semi")
            .select("lo", "hi")
            .localCheckpoint(eager=False)
        )
    return degrees(edges)
