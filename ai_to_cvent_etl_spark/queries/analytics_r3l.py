"""Fourteenth-wave operators (r3 continuation): Benford audit, PSI drift,
IQR outliers, label-propagation communities, Zipf fit, survivorship merge.

  A30 q_agg_benford        — Benford's-law first-digit audit over order
                             totals: observed vs expected share and the
                             per-digit chi-square contribution.
  E19 q_etl_psi_drift      — Population Stability Index between two order
                             eras over fixed price bands (the standard
                             train-vs-serve distribution-drift metric),
                             Laplace-smoothed so every band is defined.
  W23 q_win_outlier_iqr    — per-status Tukey-fence outlier audit: Q1/Q3
                             as nearest-rank order statistics (pure
                             integer rank logic — no interpolation),
                             1.5×IQR fences, low/high outlier counts.
  G10 q_graph_label_prop   — community detection by three synchronous
                             min-label propagation rounds over the
                             customer–supplier trade graph; community
                             sizes out.
  T13 q_text_zipf          — Zipf's-law fit over the top-100 corpus
                             tokens: log-log OLS slope/intercept from
                             exact decimal moments.
  E20 q_etl_survivorship   — golden-record merge (master-data
                             survivorship): per-field latest-non-null
                             across three versioned feeds via
                             max_by/arg_max with a null-masked version
                             key (both engines skip NULL ordering values
                             — probed).

Determinism notes (SURVEY §5.3):
  * A30's digit is extracted from the decimal string of floor(price) —
    exact on both engines; shares are single IEEE divisions of exact
    BIGINT counts; expected share log10(1+1/d) and the chi contribution
    are rounded at 6dp (libm last-ulp tolerance).
  * E19's band id is floor(price/50000) — one IEEE division with a
    power-of-ten constant, identical bits cross-engine; smoothed shares
    are IEEE expressions over exact counts; psi terms rounded at 6dp.
  * W23 avoids percentile interpolation entirely: ranks ceil(0.25*n) /
    ceil(0.75*n) are exact (n/4 is a power-of-two division — exact in
    binary), row_number ties broken by o_orderkey, and the fences are
    one IEEE expression over raw 2dp doubles — identical bits, so the
    fence comparisons agree bit-for-bit.
  * G10's labels are node-id strings; min-label is lexicographic VARCHAR
    ordering (probed identical: least('c10','c2') = 'c10' on both).
    Pure string/count logic — no floats anywhere.
  * T13 computes per-row ln() in doubles (row-local IEEE; last-ulp libm
    drift only), quantizes each term to DECIMAL(28,15), sums exactly,
    and evaluates the OLS formulas once over decimal→double casts,
    rounded at 6dp — far beyond the 1-ulp input noise.
  * E20 relies on max_by(field, CASE WHEN field IS NOT NULL THEN v END)
    == arg_max(...): both engines drop NULL ordering keys (probed this
    session). Version keys are distinct integers — no ties.

Scale notes:
  * A30/E19 collapse to ≤ a few dozen group rows in one partial-agg
    shuffle each; the window totals run over that collapsed relation.
  * W23 is one ranked window + one tiny (≤3-row) bounds broadcast join
    back to orders — the fences join is planner-broadcast, never hinted.
  * G10 is the Pregel shape: per round one edges⋈labels join co-keyed on
    node + one min-reduce. Three rounds = three bounded shuffles; at
    100 TB the edge list is checkpointed once and every round reuses its
    partitioning (same device as G1 PageRank).
  * T13 collapses the corpus to a 100-row ranked head before any float
    math; the explode fans out ahead of the token count (fan_out note in
    text.py applies — the count itself is partial-agg friendly).
  * E20 is a three-way union of projections of one scan plus a single
    keyed aggregation — one shuffle, partial aggregation does the
    field-wise survivorship map-side.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession, Window
from pyspark.sql import functions as F

from ai_to_cvent_etl_spark.io import load_table
from ai_to_cvent_etl_spark.registry import register

# --- A30: Benford's-law first-digit audit ------------------------------------


@register(
    "q_agg_benford",
    oracle="""
        WITH d AS (
            SELECT CAST(substr(CAST(CAST(floor(o_totalprice) AS BIGINT)
                                    AS VARCHAR), 1, 1) AS INT) AS digit
            FROM orders
        ),
        c AS (
            SELECT digit, CAST(COUNT(*) AS BIGINT) AS n
            FROM d GROUP BY digit
        )
        SELECT digit, n,
               ROUND(CAST(n AS DOUBLE)
                     / SUM(CAST(n AS DOUBLE)) OVER (), 6) AS observed,
               ROUND(log10(1.0 + 1.0 / digit), 6) AS expected,
               ROUND((CAST(n AS DOUBLE) / SUM(CAST(n AS DOUBLE)) OVER ()
                      - log10(1.0 + 1.0 / digit))
                     * (CAST(n AS DOUBLE) / SUM(CAST(n AS DOUBLE)) OVER ()
                        - log10(1.0 + 1.0 / digit))
                     / log10(1.0 + 1.0 / digit), 6) AS chi_term
        FROM c
    """,
    section="A30",
    doc="Benford's-law audit of o_totalprice: leading significant digit "
    "via the decimal string of floor(price) (exact — no log-based digit "
    "extraction), observed share vs the Benford expectation log10(1+1/d), "
    "and the per-digit chi-square contribution (n·(O−E)²/E up to the "
    "common n factor). The classic fraud/data-quality screen: a synthetic "
    "or truncated money column shows immediately as fat chi terms. One "
    "9-group aggregation; the share window runs over 9 rows.",
)
def q_agg_benford(spark: SparkSession, sf_dir: str) -> DataFrame:
    orders = load_table(spark, sf_dir, "orders")
    digit = (
        F.substring(F.floor("o_totalprice").cast("long").cast("string"), 1, 1)
        .cast("int")
        .alias("digit")
    )
    c = orders.select(digit).groupBy("digit").agg(F.count("*").alias("n"))
    w = Window.partitionBy()
    observed = F.col("n").cast("double") / F.sum(F.col("n").cast("double")).over(w)
    expected = F.log10(F.lit(1.0) + F.lit(1.0) / F.col("digit"))
    return c.select(
        "digit",
        "n",
        F.round(observed, 6).alias("observed"),
        F.round(expected, 6).alias("expected"),
        F.round((observed - expected) * (observed - expected) / expected, 6).alias(
            "chi_term"
        ),
    )


# --- E19: PSI distribution drift ---------------------------------------------


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


# --- W23: Tukey-fence (IQR) outlier audit ------------------------------------


@register(
    "q_win_outlier_iqr",
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
        q AS (
            SELECT o_orderstatus,
                   MAX(CASE WHEN rn = CAST(ceil(n * 0.25) AS BIGINT)
                            THEN o_totalprice END) AS q1,
                   MAX(CASE WHEN rn = CAST(ceil(n * 0.75) AS BIGINT)
                            THEN o_totalprice END) AS q3,
                   MAX(n) AS n
            FROM r GROUP BY o_orderstatus
        )
        SELECT q.o_orderstatus,
               CAST(q.n AS BIGINT) AS n,
               q.q1, q.q3,
               q.q1 - 1.5 * (q.q3 - q.q1) AS fence_lo,
               q.q3 + 1.5 * (q.q3 - q.q1) AS fence_hi,
               CAST(SUM(CASE WHEN o.o_totalprice
                                  < q.q1 - 1.5 * (q.q3 - q.q1)
                             THEN 1 ELSE 0 END) AS BIGINT) AS n_out_lo,
               CAST(SUM(CASE WHEN o.o_totalprice
                                  > q.q3 + 1.5 * (q.q3 - q.q1)
                             THEN 1 ELSE 0 END) AS BIGINT) AS n_out_hi
        FROM q JOIN orders o ON o.o_orderstatus = q.o_orderstatus
        GROUP BY q.o_orderstatus, q.n, q.q1, q.q3
    """,
    section="W23",
    doc="Tukey-fence outlier audit of o_totalprice per order status: "
    "Q1/Q3 as NEAREST-RANK order statistics (rank = ceil(0.25·n) — n/4 "
    "is a power-of-two division, exact in binary; row_number tie-broken "
    "by o_orderkey), 1.5×IQR fences as one IEEE expression over raw 2dp "
    "doubles (bit-identical cross-engine, so the fence comparison can "
    "never flip), and low/high outlier counts from a bounds join back "
    "to orders. No percentile interpolation anywhere. The ≤3-row bounds "
    "side broadcasts by the size-based planner.",
)
def q_win_outlier_iqr(spark: SparkSession, sf_dir: str) -> DataFrame:
    orders = load_table(spark, sf_dir, "orders")
    w = Window.partitionBy("o_orderstatus").orderBy("o_totalprice", "o_orderkey")
    wp = Window.partitionBy("o_orderstatus")
    r = orders.select(
        "o_orderstatus",
        "o_totalprice",
        F.row_number().over(w).alias("rn"),
        F.count("*").over(wp).alias("n"),
    )
    q = r.groupBy("o_orderstatus").agg(
        F.max(
            F.when(
                F.col("rn") == F.ceil(F.col("n") * 0.25).cast("long"),
                F.col("o_totalprice"),
            )
        ).alias("q1"),
        F.max(
            F.when(
                F.col("rn") == F.ceil(F.col("n") * 0.75).cast("long"),
                F.col("o_totalprice"),
            )
        ).alias("q3"),
        F.max("n").alias("n"),
    )
    iqr = F.col("q3") - F.col("q1")
    bounds = q.select(
        "o_orderstatus",
        F.col("n").alias("n"),
        "q1",
        "q3",
        (F.col("q1") - 1.5 * iqr).alias("fence_lo"),
        (F.col("q3") + 1.5 * iqr).alias("fence_hi"),
    )
    joined = orders.select("o_orderstatus", "o_totalprice").join(
        bounds, "o_orderstatus"
    )
    return joined.groupBy(
        "o_orderstatus", "n", "q1", "q3", "fence_lo", "fence_hi"
    ).agg(
        F.sum(
            F.when(F.col("o_totalprice") < F.col("fence_lo"), 1).otherwise(0)
        ).alias("n_out_lo"),
        F.sum(
            F.when(F.col("o_totalprice") > F.col("fence_hi"), 1).otherwise(0)
        ).alias("n_out_hi"),
    )


# --- G10: min-label propagation communities ----------------------------------

_LP_ROUNDS = 3

_LP_IT_DUCK = """
        l{i} AS (
            SELECT l.node,
                   least(l.label, min(nl.label)) AS label
            FROM l{j} l
            JOIN und u ON u.dst = l.node
            JOIN l{j} nl ON nl.node = u.src
            GROUP BY l.node, l.label
        )"""


@register(
    "q_graph_label_prop",
    oracle=(
        """
        WITH e AS (
            SELECT DISTINCT 'c' || CAST(o_custkey AS VARCHAR) AS a,
                            's' || CAST(l_suppkey AS VARCHAR) AS b
            FROM orders JOIN lineitem ON o_orderkey = l_orderkey
        ),
        und AS (
            SELECT a AS src, b AS dst FROM e
            UNION ALL
            SELECT b AS src, a AS dst FROM e
        ),
        l0 AS (
            SELECT DISTINCT dst AS node, dst AS label FROM und
        ),"""
        + ",".join(
            _LP_IT_DUCK.format(i=i, j=i - 1) for i in range(1, _LP_ROUNDS + 1)
        )
        + f"""
        SELECT label AS community,
               CAST(COUNT(*) AS BIGINT) AS n_nodes
        FROM l{_LP_ROUNDS}
        GROUP BY label
    """
    ),
    section="G10",
    doc="Community detection by three SYNCHRONOUS min-label-propagation "
    "rounds over the customer–supplier trade graph (same edge builder as "
    "G1 PageRank): every node adopts the minimum of its own label and "
    "its neighbors' previous-round labels, then communities are the "
    "surviving labels with their sizes. Labels are node-id strings and "
    "min is lexicographic VARCHAR order — identical on both engines "
    "(probed), so the whole query is float-free. Per round: one "
    "edges⋈labels join co-keyed on node + one min-reduce — the Pregel "
    "message-passing shape; at 100 TB the edge list checkpoints once "
    "and all rounds reuse its partitioning.",
)
def q_graph_label_prop(spark: SparkSession, sf_dir: str) -> DataFrame:
    from ai_to_cvent_etl_spark.queries.graph import trade_graph_edges

    und = trade_graph_edges(spark, sf_dir)
    labels = und.select(F.col("dst").alias("node")).distinct().select(
        "node", F.col("node").alias("label")
    )
    for _ in range(_LP_ROUNDS):
        nbr = (
            und.join(labels.withColumnRenamed("node", "src"), "src")
            .groupBy(F.col("dst").alias("node"))
            .agg(F.min("label").alias("nbr_label"))
        )
        labels = (
            labels.join(nbr, "node")
            .select(
                "node", F.least("label", F.col("nbr_label")).alias("label")
            )
        )
    return labels.groupBy(F.col("label").alias("community")).agg(
        F.count("*").alias("n_nodes")
    )


# --- T13: Zipf's-law log-log fit ---------------------------------------------

_ZIPF_TOP = 100


@register(
    "q_text_zipf",
    oracle=f"""
        WITH tok AS (
            SELECT unnest(string_split(text, ' ')) AS tok FROM documents
        ),
        cnt AS (
            SELECT tok, CAST(COUNT(*) AS BIGINT) AS n
            FROM tok WHERE tok <> '' GROUP BY tok
        ),
        ranked AS (
            SELECT tok, n,
                   row_number() OVER (ORDER BY n DESC, tok) AS rnk
            FROM cnt
        ),
        head AS (
            SELECT CAST(ln(CAST(rnk AS DOUBLE)) AS DECIMAL(28,15)) AS x,
                   CAST(ln(CAST(n AS DOUBLE)) AS DECIMAL(28,15)) AS y,
                   CAST(ln(CAST(rnk AS DOUBLE)) * ln(CAST(rnk AS DOUBLE))
                        AS DECIMAL(28,15)) AS xx,
                   CAST(ln(CAST(rnk AS DOUBLE)) * ln(CAST(n AS DOUBLE))
                        AS DECIMAL(28,15)) AS xy
            FROM ranked WHERE rnk <= {_ZIPF_TOP}
        ),
        m AS (
            SELECT CAST(COUNT(*) AS DOUBLE) AS cnt,
                   CAST(SUM(x) AS DOUBLE) AS sx,
                   CAST(SUM(y) AS DOUBLE) AS sy,
                   CAST(SUM(xx) AS DOUBLE) AS sxx,
                   CAST(SUM(xy) AS DOUBLE) AS sxy
            FROM head
        )
        SELECT CAST(cnt AS BIGINT) AS n_tokens,
               ROUND((cnt * sxy - sx * sy) / (cnt * sxx - sx * sx), 6)
                   AS zipf_slope,
               ROUND((sy - (cnt * sxy - sx * sy) / (cnt * sxx - sx * sx)
                           * sx) / cnt, 6) AS zipf_intercept
        FROM m
    """,
    section="T13",
    doc=f"Zipf's-law fit over the corpus: token frequencies, deterministic "
    f"rank (count desc, token asc), and an OLS fit of ln(freq) on "
    f"ln(rank) over the top-{_ZIPF_TOP} tokens. Per-row ln() is IEEE "
    "row-local (last-ulp libm noise only); every moment term is "
    "quantized to DECIMAL(28,15) and summed exactly, so the only float "
    "reductions are over already-exact decimals; slope/intercept are "
    "one IEEE formula each, rounded at 6dp. A natural-text corpus fits "
    "slope ≈ -1; the synthetic 31-token corpus fits much shallower — "
    "the fit IS the diagnostic. Corpus collapses to a 100-row head "
    "before any float math.",
)
def q_text_zipf(spark: SparkSession, sf_dir: str) -> DataFrame:
    docs = load_table(spark, sf_dir, "documents")
    cnt = (
        docs.select(F.explode(F.split("text", " ")).alias("tok"))
        .where(F.col("tok") != "")
        .groupBy("tok")
        .agg(F.count("*").alias("n"))
    )
    rnk = F.row_number().over(Window.orderBy(F.desc("n"), F.asc("tok")))
    head = (
        cnt.withColumn("rnk", rnk)
        .where(F.col("rnk") <= _ZIPF_TOP)
        .select(
            F.log(F.col("rnk").cast("double")).alias("lx"),
            F.log(F.col("n").cast("double")).alias("ly"),
        )
        .select(
            F.col("lx").cast("decimal(28,15)").alias("x"),
            F.col("ly").cast("decimal(28,15)").alias("y"),
            (F.col("lx") * F.col("lx")).cast("decimal(28,15)").alias("xx"),
            (F.col("lx") * F.col("ly")).cast("decimal(28,15)").alias("xy"),
        )
    )
    m = head.agg(
        F.count("*").cast("double").alias("cnt"),
        F.sum("x").cast("double").alias("sx"),
        F.sum("y").cast("double").alias("sy"),
        F.sum("xx").cast("double").alias("sxx"),
        F.sum("xy").cast("double").alias("sxy"),
    )
    slope = (F.col("cnt") * F.col("sxy") - F.col("sx") * F.col("sy")) / (
        F.col("cnt") * F.col("sxx") - F.col("sx") * F.col("sx")
    )
    return m.select(
        F.col("cnt").cast("long").alias("n_tokens"),
        F.round(slope, 6).alias("zipf_slope"),
        F.round((F.col("sy") - slope * F.col("sx")) / F.col("cnt"), 6).alias(
            "zipf_intercept"
        ),
    )


# --- E20: golden-record survivorship merge -----------------------------------


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
