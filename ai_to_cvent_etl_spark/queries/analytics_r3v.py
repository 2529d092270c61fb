"""Twenty-fourth-wave operators (r3 continuation): grid spatial join,
training-mixture planning, HITS, minhash estimation accuracy.

  J21 q_join_spatial_grid   — grid-blocked spatial self-join: points in
                              a 2-D plane (deterministic coords), pairs
                              within Chebyshev distance 3 found via
                              3×3 neighbor-cell blocking — the spatial
                              join pattern (cell join + local verify).
  L16 q_text_domain_mixture — pretraining data-mixture planning: given
                              target language shares and a token
                              budget, per-language sampling rates and
                              effective token yields (capped at 1×).
  G11 q_graph_hits          — HITS hubs & authorities on the DIRECTED
                              customer→supplier trade graph: two
                              quantized power rounds, supplier
                              authority scores out.
  D13 q_dedup_minhash_est   — minhash estimator accuracy: signature-
                              agreement Jaccard estimate vs the exact
                              Jaccard for every overlapping pair in a
                              bounded window — the calibration query
                              for D1's LSH thresholds.

Determinism notes (SURVEY §5.3):
  * J21 is pure integer logic (coords, cells, Chebyshev check); each
    qualifying pair is emitted exactly once (the probe explodes only
    the LEFT point's 3×3 neighborhood and the build cell is unique).
  * L16: token counts exact; rates are IEEE over exact ints with
    literal share weights; effective tokens floor() the IEEE product
    (floor exact on both engines).
  * G11 uses the G1 quantized-decimal device for every reduction and
    norm — bit-identical rounds; scores rounded 6dp.
  * D13: signatures are md5-derived strings (identical), agreement
    counts and token intersections are exact integers; both ratios
    are single IEEE divisions (est is k/8 — exact in binary).

Scale notes:
  * J21 is THE distributed spatial shape: one keyed shuffle on cell
    id, pairs generated within (cell, neighbor) buckets only — never
    an unblocked cross join. Skewed cells (urban hot spots) get D1's
    bucket-cap / J15's salting; cell size trades replication (×9 probe
    explode) against per-cell pair cost.
  * L16 collapses to |languages| rows immediately; the plan is the
    input to a weighted sampler (E9) writing the mixed corpus.
  * G11: per round one edges⋈scores join + keyed reduce per side —
    Pregel shape on the shared memoized trade edges (directed
    projection).
  * D13 bounds the pair window explicitly (doc_id < 50 both sides) —
    the calibration sample; production calibration samples pairs from
    LSH candidates instead (no quadratic anywhere).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from ai_to_cvent_etl_spark.io import load_table
from ai_to_cvent_etl_spark.registry import register

# --- J21: grid-blocked spatial self-join -------------------------------------

_GRID = 200     # coordinate domain [0, _GRID)
_CELL = 4       # cell edge; 3x3 neighborhood covers Chebyshev radius <= 4
_RADIUS = 3


@register(
    "q_join_spatial_grid",
    oracle=f"""
        WITH pts AS (
            SELECT c_custkey AS k,
                   (c_custkey * 37) % {_GRID} AS x,
                   (c_custkey * 91) % {_GRID} AS y
            FROM customer
        ),
        probe AS (
            SELECT k, x, y,
                   (x // {_CELL} + dx.d) AS cx,
                   (y // {_CELL} + dy.d) AS cy
            FROM pts,
                 (SELECT unnest([-1, 0, 1]) AS d) dx,
                 (SELECT unnest([-1, 0, 1]) AS d) dy
        ),
        build AS (
            SELECT k, x, y, x // {_CELL} AS cx, y // {_CELL} AS cy
            FROM pts
        )
        SELECT p.k AS k_lo, b.k AS k_hi,
               CAST(greatest(abs(p.x - b.x), abs(p.y - b.y)) AS BIGINT)
                   AS cheb
        FROM probe p
        JOIN build b ON b.cx = p.cx AND b.cy = p.cy AND b.k > p.k
        WHERE abs(p.x - b.x) <= {_RADIUS} AND abs(p.y - b.y) <= {_RADIUS}
    """,
    section="J21",
    doc="Grid-blocked spatial self-join: customers placed on a "
    f"{_GRID}×{_GRID} plane by deterministic coordinates, all pairs "
    f"within Chebyshev distance {_RADIUS} found by joining each "
    "point's 3×3 neighbor-cell keys against the build side's unique "
    "cell — each qualifying pair emitted EXACTLY once (only the probe "
    "side explodes, the build cell is unique), no pair-distinct pass. "
    "The distributed spatial-join pattern: one keyed shuffle on cell "
    "id, quadratic work confined to (cell, neighbor) buckets — never "
    "an unblocked cross join; at 100 TB hot cells take D1's bucket "
    "cap or J15's salting, and cell size trades the ×9 probe "
    "replication against per-cell pair cost.",
)
def q_join_spatial_grid(spark: SparkSession, sf_dir: str) -> DataFrame:
    c = load_table(spark, sf_dir, "customer")
    pts = c.select(
        F.col("c_custkey").alias("k"),
        ((F.col("c_custkey") * 37) % _GRID).alias("x"),
        ((F.col("c_custkey") * 91) % _GRID).alias("y"),
    )
    d = F.array(F.lit(-1), F.lit(0), F.lit(1))
    probe = pts.select(
        "k",
        "x",
        "y",
        F.explode(d).alias("dx"),
    ).select(
        "k",
        "x",
        "y",
        F.explode(d).alias("dy"),
        F.col("dx"),
    ).select(
        "k",
        "x",
        "y",
        (F.expr(f"x DIV {_CELL}") + F.col("dx")).alias("cx"),
        (F.expr(f"y DIV {_CELL}") + F.col("dy")).alias("cy"),
    )
    build = pts.select(
        F.col("k").alias("bk"),
        F.col("x").alias("bx"),
        F.col("y").alias("by"),
        F.expr(f"x DIV {_CELL}").alias("cx"),
        F.expr(f"y DIV {_CELL}").alias("cy"),
    )
    j = probe.join(build, ["cx", "cy"]).where(F.col("bk") > F.col("k"))
    dx = F.abs(F.col("x") - F.col("bx"))
    dy = F.abs(F.col("y") - F.col("by"))
    return j.where((dx <= _RADIUS) & (dy <= _RADIUS)).select(
        F.col("k").alias("k_lo"),
        F.col("bk").alias("k_hi"),
        F.greatest(dx, dy).cast("long").alias("cheb"),
    )


# --- L16: training-mixture planning ------------------------------------------

_MIX_SHARES = {"en": 0.5, "de": 0.15, "fr": 0.15, "es": 0.1, "zh": 0.1}
_MIX_BUDGET_FRAC = 0.5  # token budget = 50% of the corpus


@register(
    "q_text_domain_mixture",
    oracle=f"""
        WITH toks AS (
            SELECT lang,
                   CAST(SUM(len(string_split(text, ' '))) AS BIGINT)
                       AS n_tokens
            FROM documents GROUP BY lang
        ),
        planned AS (
            SELECT lang, n_tokens,
                   CAST(CASE lang
                     {' '.join(f"WHEN '{k}' THEN {v}" for k, v in _MIX_SHARES.items())}
                   END AS DOUBLE) AS target_share,
                   CAST(SUM(n_tokens) OVER () AS DOUBLE)
                       * {_MIX_BUDGET_FRAC} AS budget
            FROM toks
        )
        SELECT lang, n_tokens,
               target_share,
               ROUND(least(1.0, budget * target_share / n_tokens), 6)
                   AS sample_rate,
               CAST(floor(least(1.0, budget * target_share / n_tokens)
                          * n_tokens) AS BIGINT) AS effective_tokens
        FROM planned
    """,
    section="L16",
    doc="Pretraining data-mixture planning: per-language token counts, "
    f"target mixture shares ({_MIX_SHARES}), and a token budget of "
    f"{_MIX_BUDGET_FRAC:.0%} of the corpus → per-language sampling "
    "rate min(1, budget·share/available) and effective token yield. "
    "A rate pinned at 1.0 means the language is UNDER-REPRESENTED "
    "relative to its target (the budget wants more than exists) — the "
    "signal that drives up-weighting or extra sourcing. Exact token "
    "counts; rates are IEEE with literal weights; floor() on the "
    "yield. Collapses to |languages| rows; the plan feeds E9's "
    "weighted sampler to write the mixed corpus.",
)
def q_text_domain_mixture(spark: SparkSession, sf_dir: str) -> DataFrame:
    from pyspark.sql import Window

    docs = load_table(spark, sf_dir, "documents")
    toks = docs.groupBy("lang").agg(
        F.sum(F.size(F.split("text", " "))).cast("long").alias("n_tokens")
    )
    share = F.create_map(
        *[F.lit(x) for kv in _MIX_SHARES.items() for x in kv]
    )[F.col("lang")]
    budget = (
        F.sum("n_tokens").over(Window.partitionBy()).cast("double")
        * _MIX_BUDGET_FRAC
    )
    planned = toks.select(
        "lang",
        "n_tokens",
        share.alias("target_share"),
        budget.alias("budget"),
    )
    rate = F.least(
        F.lit(1.0),
        F.col("budget") * F.col("target_share") / F.col("n_tokens"),
    )
    return planned.select(
        "lang",
        "n_tokens",
        "target_share",
        F.round(rate, 6).alias("sample_rate"),
        F.floor(rate * F.col("n_tokens")).cast("long").alias(
            "effective_tokens"
        ),
    )


# --- G11: HITS hubs & authorities --------------------------------------------

_HITS_ROUNDS = 2

_QS_DUCK = "CAST(SUM(CAST(floor(({x}) * 1e12) AS DECIMAL(38,0))) AS DOUBLE) / 1e12"

_HITS_IT_DUCK = """
        a{i}raw AS (
            SELECT e.s AS node, {qa} AS v
            FROM e JOIN h{j} h ON h.node = e.c GROUP BY e.s
        ),
        a{i}n AS (SELECT sqrt({qn}) AS nrm FROM a{i}raw),
        a{i} AS (SELECT node, v / nrm AS v FROM a{i}raw CROSS JOIN a{i}n),
        h{i}raw AS (
            SELECT e.c AS node, {qh} AS v
            FROM e JOIN a{i} a ON a.node = e.s GROUP BY e.c
        ),
        h{i}n AS (SELECT sqrt({qn2}) AS nrm FROM h{i}raw),
        h{i} AS (SELECT node, v / nrm AS v FROM h{i}raw CROSS JOIN h{i}n)""".format(
    i="{i}",
    j="{j}",
    qa=_QS_DUCK.format(x="h.v"),
    qh=_QS_DUCK.format(x="a.v"),
    qn=_QS_DUCK.format(x="v * v"),
    qn2=_QS_DUCK.format(x="v * v"),
)


@register(
    "q_graph_hits",
    oracle=(
        """
        WITH e AS (
            SELECT DISTINCT o_custkey AS c, l_suppkey AS s
            FROM orders JOIN lineitem ON o_orderkey = l_orderkey
        ),
        h0 AS (
            SELECT DISTINCT c AS node, CAST(1.0 AS DOUBLE) AS v FROM e
        ),"""
        + ",".join(
            _HITS_IT_DUCK.format(i=i, j=i - 1)
            for i in range(1, _HITS_ROUNDS + 1)
        )
        + f"""
        SELECT node AS suppkey, ROUND(v, 6) AS authority
        FROM a{_HITS_ROUNDS}
    """
    ),
    section="G11",
    doc="HITS hubs & authorities on the DIRECTED customer→supplier "
    "trade graph (customers are hubs, suppliers authorities): "
    f"{_HITS_ROUNDS} synchronized rounds of authority = Aᵀ·hub and "
    "hub = A·authority, each L2-normalized — every reduction and norm "
    "through the floor(x·1e12) DECIMAL quantization (G1's device), so "
    "rounds are bit-identical cross-engine; supplier authority scores "
    "out, rounded 6dp. The bipartite companion to G1 PageRank: "
    "PageRank ranks by random-surfer mass, HITS separates 'buys "
    "broadly' from 'supplies the important buyers'. Pregel shape: one "
    "edges⋈scores join + keyed reduce per side per round.",
)
def q_graph_hits(spark: SparkSession, sf_dir: str) -> DataFrame:
    orders = load_table(spark, sf_dir, "orders")
    li = load_table(spark, sf_dir, "lineitem")
    e = (
        orders.join(li, orders.o_orderkey == li.l_orderkey)
        .select(F.col("o_custkey").alias("c"), F.col("l_suppkey").alias("s"))
        .distinct()
    )
    # HITS alternates join keys every half-round (edges join scores on c,
    # then on s). Checkpoint TWO pre-partitioned copies so each half-round
    # joins an already-co-partitioned edge side instead of re-shuffling the
    # edge list twice per round — the Pregel partition-reuse discipline.
    e_by_c = e.repartition("c").localCheckpoint(eager=False)
    e_by_s = e.repartition("s").localCheckpoint(eager=False)

    def qsum(c):
        return (
            F.sum(F.floor(c * 1e12).cast("decimal(38,0)")).cast("double")
            / 1e12
        )

    h = e.select("c").distinct().select(
        F.col("c").alias("node"), F.lit(1.0).alias("v")
    )
    a = None
    for _ in range(_HITS_ROUNDS):
        araw = (
            e_by_c.join(h.withColumnRenamed("node", "c"), "c")
            .groupBy(F.col("s").alias("node"))
            .agg(qsum(F.col("v")).alias("v"))
        )
        an = araw.agg(F.sqrt(qsum(F.col("v") * F.col("v"))).alias("nrm"))
        a = araw.crossJoin(F.broadcast(an)).select(
            "node", (F.col("v") / F.col("nrm")).alias("v")
        )
        hraw = (
            e_by_s.join(a.withColumnRenamed("node", "s"), "s")
            .groupBy(F.col("c").alias("node"))
            .agg(qsum(F.col("v")).alias("v"))
        )
        hn = hraw.agg(F.sqrt(qsum(F.col("v") * F.col("v"))).alias("nrm"))
        h = hraw.crossJoin(F.broadcast(hn)).select(
            "node", (F.col("v") / F.col("nrm")).alias("v")
        )
    return a.select(
        F.col("node").alias("suppkey"), F.round("v", 6).alias("authority")
    )


# --- D13: minhash estimator calibration --------------------------------------

_D13_WINDOW = 50
_D13_PERM = 8


def _mh_spark(i: int) -> str:
    """Same permutation family as D1 (dedup_scale._mh_spark)."""
    return (
        f"array_min(transform(ts, t -> substr(md5(concat('{i}:', t)), 1, 16)))"
    )


def _mh_duck(i: int) -> str:
    return f"list_min(list_transform(ts, t -> substr(md5('{i}:' || t), 1, 16)))"


@register(
    "q_dedup_minhash_est",
    oracle=f"""
        WITH toks AS (
            SELECT doc_id, list_distinct(string_split(text, ' ')) AS ts
            FROM documents WHERE doc_id < {_D13_WINDOW}
        ),
        sig AS (
            SELECT doc_id, ts,
                   [{', '.join(_mh_duck(i) for i in range(_D13_PERM))}] AS mh
            FROM toks
        )
        SELECT a.doc_id AS doc_lo, b.doc_id AS doc_hi,
               CAST(len(list_filter(range(1, {_D13_PERM + 1}),
                        i -> a.mh[i] = b.mh[i])) AS DOUBLE)
                   / {_D13_PERM} AS est_jaccard,
               CAST(len(list_intersect(a.ts, b.ts)) AS DOUBLE)
                   / (len(a.ts) + len(b.ts)
                      - len(list_intersect(a.ts, b.ts))) AS exact_jaccard
        FROM sig a JOIN sig b ON b.doc_id > a.doc_id
        WHERE len(list_intersect(a.ts, b.ts)) > 0
    """,
    section="D13",
    doc=f"Minhash estimator calibration: for every overlapping pair in a "
    f"bounded doc window (doc_id < {_D13_WINDOW}), the signature-"
    f"agreement Jaccard estimate (fraction of {_D13_PERM} permutations "
    "agreeing — D1's exact permutation family) next to the exact "
    "token-set Jaccard. Estimates are k/8 fractions (exact in binary) "
    "and exact Jaccards are integer ratios — both bit-deterministic. "
    "This is how D1's LSH band/threshold parameters get tuned on a "
    "real corpus: the joint distribution of (estimate, truth) IS the "
    "collision-probability curve. Production calibration samples "
    "pairs from LSH candidates (no quadratic anywhere); the explicit "
    "window here keeps the declared query bounded at every SF.",
)
def q_dedup_minhash_est(spark: SparkSession, sf_dir: str) -> DataFrame:
    docs = load_table(spark, sf_dir, "documents")
    toks = docs.where(F.col("doc_id") < _D13_WINDOW).select(
        "doc_id", F.array_distinct(F.split("text", " ")).alias("ts")
    )
    sig = toks.select(
        "doc_id",
        "ts",
        F.array(*[F.expr(_mh_spark(i)) for i in range(_D13_PERM)]).alias(
            "mh"
        ),
    )
    a = sig.alias("a")
    b = sig.alias("b")
    j = a.join(F.broadcast(b), F.col("b.doc_id") > F.col("a.doc_id"))
    inter = F.size(F.array_intersect(F.col("a.ts"), F.col("b.ts")))
    agree = F.size(
        F.filter(
            F.zip_with(
                F.col("a.mh"), F.col("b.mh"), lambda x, y: x == y
            ),
            lambda eq: eq,
        )
    )
    return j.where(inter > 0).select(
        F.col("a.doc_id").alias("doc_lo"),
        F.col("b.doc_id").alias("doc_hi"),
        (agree.cast("double") / _D13_PERM).alias("est_jaccard"),
        (
            inter.cast("double")
            / (F.size(F.col("a.ts")) + F.size(F.col("b.ts")) - inter)
        ).alias("exact_jaccard"),
    )
