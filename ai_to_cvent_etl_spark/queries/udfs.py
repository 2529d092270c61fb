"""SURVEY §2.12 — Python UDF / pandas UDF / UDAF / UDTF surface (X1-X4).

Rule for declared UD*Fs: the logic must be re-expressible in pure SQL so the
DuckDB oracle can mirror it. These four pin the Arrow/pickle boundary shapes;
hot declared queries elsewhere never use Python UDFs (SURVEY §4).
"""

from __future__ import annotations

import math
import re

import pandas as pd
from typing import Iterator

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F
from pyspark.sql.functions import pandas_udf, udf, udtf
from pyspark.sql.types import DoubleType, StringType

from ai_to_cvent_etl_spark.io import load_table
from ai_to_cvent_etl_spark.registry import register
from pyspark.sql import DataFrame, SparkSession, Window
from ai_to_cvent_etl_spark.queries._util import dec2


@udf(StringType())
def _vowel_strip(text: str) -> str:
    """Deterministic text fingerprint: lowercase, strip vowels."""
    return re.sub(r"[aeiou]", "", text.lower()) if text is not None else None


_FINGERPRINT_ORACLE = """
    SELECT doc_id,
           regexp_replace(lower(text), '[aeiou]', '', 'g') AS fingerprint
    FROM documents
"""


@register(
    "q_udf_python",
    tags=("python_boundary",),
    oracle=_FINGERPRINT_ORACLE,
    section="X1",
    doc="Row-at-a-time Python UDF (pickle boundary): vowel-strip fingerprint.",
)
def q_udf_python(spark: SparkSession, sf_dir: str) -> DataFrame:
    docs = load_table(spark, sf_dir, "documents")
    return docs.select("doc_id", _vowel_strip(F.col("text")).alias("fingerprint"))


@pandas_udf(StringType())
def _vowel_strip_vec(texts: pd.Series) -> pd.Series:
    return texts.str.lower().str.replace(r"[aeiou]", "", regex=True)


@register(
    "q_pandas_udf",
    tags=("python_boundary",),
    oracle=_FINGERPRINT_ORACLE,
    section="X2",
    doc="Vectorized pandas UDF (Arrow boundary): same fingerprint, batched.",
)
def q_pandas_udf(spark: SparkSession, sf_dir: str) -> DataFrame:
    docs = load_table(spark, sf_dir, "documents")
    return docs.select("doc_id", _vowel_strip_vec(F.col("text")).alias("fingerprint"))


@pandas_udf(DoubleType())
def _gmean(values: pd.Series) -> float:
    """Grouped-agg pandas UDF: geometric mean of positive values."""
    import numpy as np

    return float(math.exp(np.log(values.to_numpy(dtype="float64")).mean()))


@register(
    "q_udaf_gmean",
    tags=("python_boundary",),
    oracle="""
        SELECT event_type,
               ROUND(exp(AVG(ln(value))), 4) AS gmean_value
        FROM events
        WHERE value > 0
        GROUP BY event_type
    """,
    section="X3",
    doc="Pandas UDAF (grouped-agg): geometric mean of POSITIVE event values "
    "(zero/negative filtered on both sides — ln(0) is an error in DuckDB and "
    "-inf in numpy; zeros appear in the data from sf0.1 up), rounded 4dp.",
)
def q_udaf_gmean(spark: SparkSession, sf_dir: str) -> DataFrame:
    events = load_table(spark, sf_dir, "events").filter(F.col("value") > 0)
    return events.groupBy("event_type").agg(
        F.round(_gmean(F.col("value")), 4).alias("gmean_value")
    )


@udtf(returnType="token: string, pos: bigint")
class _SplitTokens:
    """Python UDTF: explode text into (token, 1-based position) rows."""

    def eval(self, text: str):
        if text:
            for i, tok in enumerate(text.split(" ")):
                yield tok, i + 1


@register(
    "q_udtf_split",
    tags=("python_boundary",),
    oracle="""
        SELECT doc_id, u.tok AS token, u.pos FROM (
            SELECT doc_id,
                   unnest(list_transform(string_split(text, ' '),
                          (x, i) -> struct_pack(tok := x, pos := i))) AS u
            FROM documents WHERE lang = 'de'
        )
    """,
    section="X4",
    doc="Python UDTF (lateral table function): same output surface as F4.",
)
def q_udtf_split(spark: SparkSession, sf_dir: str) -> DataFrame:
    docs = load_table(spark, sf_dir, "documents").filter(F.col("lang") == "de")
    spark.udtf.register("split_tokens_udtf", _SplitTokens)
    docs.createOrReplaceTempView("_udtf_docs")
    return spark.sql(
        """
        SELECT d.doc_id, s.token, s.pos
        FROM _udtf_docs d, LATERAL split_tokens_udtf(d.text) s
        """
    )


# ==== from analytics_r3h ===========================================

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

    # input hygiene (adversarial contract): rows with NULL keys/values
    # cannot aggregate into int64 — drop them (no-op on clean fixtures)
    ev = ev.dropna(subset=["user_id", "value"])
    od = od.dropna(subset=["o_custkey", "o_totalprice"])
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
    tags=("python_boundary",),
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

# ==== from analytics_r3m ===========================================

def _arrow_reverse_batches(it):
    """RecordBatch -> RecordBatch using pyarrow.compute kernels only:
    no pandas, no per-row Python. Cited API: pyspark DataFrame.mapInArrow
    (public since Spark 3.3)."""
    import pyarrow as pa
    import pyarrow.compute as pc

    for batch in it:
        text = batch.column(batch.schema.get_field_index("text"))
        yield pa.RecordBatch.from_arrays(
            [
                batch.column(batch.schema.get_field_index("doc_id")),
                pc.cast(pc.utf8_length(text), pa.int32()),
                pc.utf8_slice_codeunits(pc.utf8_reverse(text), 0, 12),
            ],
            names=["doc_id", "n_chars_arrow", "rev_prefix"],
        )

@register(
    "q_map_in_arrow",
    tags=("python_boundary",),
    oracle="""
        SELECT doc_id,
               CAST(length(text) AS INT) AS n_chars_arrow,
               substr(reverse(text), 1, 12) AS rev_prefix
        FROM documents
    """,
    section="X7",
    doc="df.mapInArrow zero-copy batch transform: the Python boundary at "
    "its cheapest — Arrow RecordBatches in, pyarrow.compute kernels "
    "(utf8_length / utf8_reverse / utf8_slice_codeunits), RecordBatches "
    "out; no pandas materialization, no per-row Python, columnar on "
    "both sides of the FFI. The corpus is ASCII (probed r1), so "
    "codeunit slicing equals character slicing and the DuckDB mirror "
    "is plain length/reverse/substr. Map-only — no shuffle at any "
    "scale; the X1-X7 family pins every tier of the Python boundary "
    "(row UDF, pandas UDF, Arrow UDF, UDTF, cogroup, mapInArrow).",
)
def q_map_in_arrow(spark: SparkSession, sf_dir: str) -> DataFrame:
    docs = load_table(spark, sf_dir, "documents").select("doc_id", "text")
    return docs.mapInArrow(
        _arrow_reverse_batches,
        "doc_id long, n_chars_arrow int, rev_prefix string",
    )

# ==== from analytics_r3p ===========================================

def _make_status_summary_udtf():
    """Build the UDTF class lazily so importing this module never needs a
    SparkSession. Cited API: pyspark.sql.functions.udtf + TABLE(...)
    PARTITION BY (public since Spark 3.5, polymorphic in 4.x)."""
    from pyspark.sql.functions import udtf

    @udtf(returnType="o_orderstatus string, n_rows bigint, total_cents bigint")
    class StatusSummary:
        def __init__(self) -> None:
            self.key = None
            self.n = 0
            self.cents = 0

        def eval(self, row):
            self.key = row["o_orderstatus"]
            self.n += 1
            if row["cents"] is not None:  # NULL-price rows still count
                self.cents += int(row["cents"])

        def terminate(self):
            if self.key is not None:
                yield self.key, self.n, self.cents

    return StatusSummary

@register(
    "q_udtf_table_arg",
    tags=("python_boundary",),
    oracle="""
        SELECT o_orderstatus,
               CAST(COUNT(*) AS BIGINT) AS n_rows,
               CAST(SUM(CAST(CAST(o_totalprice AS DECIMAL(18,2)) * 100
                             AS BIGINT)) AS BIGINT) AS total_cents
        FROM orders
        GROUP BY o_orderstatus
    """,
    section="X8",
    doc="Python UDTF invoked with a TABLE(...) argument and PARTITION BY "
    "o_orderstatus — the Spark 4 polymorphic-table-function surface: "
    "each partition streams through eval() (accumulating an exact cent "
    "total), terminate() emits one summary row per group. The cents are "
    "computed JVM-side (decimal*100 → BIGINT) so the Python side only "
    "adds exact integers. Verified against a plain GROUP BY — the UDTF "
    "must see every row of its partition exactly once regardless of "
    "physical partitioning. Per-group state is O(1); the TABLE argument "
    "is how user-defined relational operators compose with SQL at "
    "scale (vs X4's lateral-join UDTF).",
)
def q_udtf_table_arg(spark: SparkSession, sf_dir: str) -> DataFrame:
    orders = load_table(spark, sf_dir, "orders").select(
        "o_orderstatus",
        F.expr(
            "CAST(CAST(o_totalprice AS DECIMAL(18,2)) * 100 AS BIGINT)"
        ).alias("cents"),
    )
    orders.createOrReplaceTempView("x8_orders_cents")
    spark.udtf.register("x8_status_summary", _make_status_summary_udtf())
    return spark.sql(
        "SELECT * FROM x8_status_summary(TABLE(x8_orders_cents) "
        "PARTITION BY o_orderstatus)"
    )

# ==== from analytics_r3x ===========================================

_X9_DOCS = 50

def _make_arrow_split_udtf():
    """Arrow-optimized UDTF (useArrow=True): rows cross the boundary as
    Arrow batches instead of pickled tuples. Cited API:
    pyspark.sql.functions.udtf(useArrow=True) (Spark 4)."""
    from pyspark.sql.functions import udtf

    @udtf(returnType="tok string, pos int", useArrow=True)
    class ArrowSplit:
        def eval(self, text: str):
            if text is None:  # NULL text: no tokens
                return
            for i, w in enumerate(text.split(" ")):
                yield (w, i)

    return ArrowSplit

@register(
    "q_udtf_arrow",
    tags=("python_boundary",),
    oracle=f"""
        SELECT doc_id, u.tok AS tok, u.pos AS pos
        FROM (
            SELECT doc_id,
                   unnest(list_transform(string_split(text, ' '),
                          (x, i) -> struct_pack(tok := x,
                                                pos := CAST(i - 1 AS INT))))
                       AS u
            FROM documents WHERE doc_id < {_X9_DOCS}
        )
    """,
    section="X9",
    doc="Arrow-optimized Python UDTF (useArrow=True) in a LATERAL join: "
    "tokenize with positions over a bounded doc window — the Arrow "
    "batch path for table functions, pinned next to X4's pickled-row "
    "UDTF and X8's TABLE-argument form (the full UDTF ladder). Exact "
    "string splitting, 0-based positions. Arrow batching is the right "
    "default for high-fanout UDTFs (one batch out per batch in, not "
    "one pickle per emitted row) — still Python, still out of hot "
    "relational paths.",
)
def q_udtf_arrow(spark: SparkSession, sf_dir: str) -> DataFrame:
    docs = load_table(spark, sf_dir, "documents").where(
        F.col("doc_id") < _X9_DOCS
    )
    docs.createOrReplaceTempView("x9_docs")
    spark.udtf.register("x9_arrow_split", _make_arrow_split_udtf())
    return spark.sql(
        "SELECT d.doc_id, s.tok, s.pos "
        "FROM x9_docs d, LATERAL x9_arrow_split(d.text) s"
    )

# ==== from analytics_r3z ===========================================

def _center_on_median(pdf: pd.DataFrame) -> pd.DataFrame:
    """Nearest-rank median centering, SORT-based so the result does not
    depend on Spark's arbitrary intra-group row order."""
    s = pdf.sort_values(["o_totalprice", "o_orderkey"]).reset_index(drop=True)
    med = float(s["o_totalprice"].iloc[(len(s) - 1) // 2])
    return pd.DataFrame(
        {
            "o_orderkey": pdf["o_orderkey"],
            "o_orderstatus": pdf["o_orderstatus"],
            "group_median": med,
            "centered": pdf["o_totalprice"] - med,
        }
    )

@register(
    "q_apply_in_pandas",
    tags=("python_boundary",),
    oracle="""
        WITH med AS (
            SELECT o_orderstatus,
                   MAX(CASE WHEN rn = (n - 1) // 2 + 1
                            THEN o_totalprice END) AS m
            FROM (
                SELECT o_orderstatus, o_totalprice,
                       row_number() OVER (
                           PARTITION BY o_orderstatus
                           ORDER BY o_totalprice, o_orderkey
                       ) AS rn,
                       COUNT(*) OVER (PARTITION BY o_orderstatus) AS n
                FROM orders
            ) GROUP BY o_orderstatus
        )
        SELECT o.o_orderkey, o.o_orderstatus,
               med.m AS group_median,
               o.o_totalprice - med.m AS centered
        FROM orders o JOIN med ON med.o_orderstatus = o.o_orderstatus
    """,
    section="X10",
    doc="Grouped-map applyInPandas — the per-group pandas rung of the "
    "Python ladder (X2 scalar, X3 grouped-agg, X6 cogroup, M2 "
    "mapInPandas): each status group streams to one pandas call that "
    "computes the NEAREST-RANK median (sorting first, so the result "
    "is independent of Spark's arbitrary intra-group order — the "
    "grouped-map determinism trap) and centers every order on it. "
    "Mirrored by a rank-window median + join in SQL. One keyed "
    "shuffle; group size is the pandas memory bound, which is why "
    "grouped-map fits per-entity logic and never whole-table "
    "transforms.",
)
def q_apply_in_pandas(spark: SparkSession, sf_dir: str) -> DataFrame:
    orders = load_table(spark, sf_dir, "orders").select(
        "o_orderkey", "o_orderstatus", "o_totalprice"
    )
    return orders.groupBy("o_orderstatus").applyInPandas(
        _center_on_median,
        schema="o_orderkey long, o_orderstatus string, "
        "group_median double, centered double",
    )

# ==== from analytics_r4d ===========================================

@register(
    "q_sql_udf",
    oracle="""
        WITH tiers AS (
            SELECT CAST(g.g AS INT) AS tier FROM generate_series(1, 3) g(g)
        )
        SELECT l_orderkey, l_linenumber, t.tier,
               l_extendedprice * (1 - l_discount) * t.tier AS tiered_net
        FROM lineitem CROSS JOIN tiers t
        WHERE l_quantity > 45
    """,
    section="X11",
    doc="Spark 4 SQL-defined functions: a scalar CREATE FUNCTION "
    "net(p, d) RETURN p*(1-d) and a table-valued RETURNS TABLE tier "
    "generator, composed in one query (each high-quantity lineitem "
    "fanned across the generated tiers with the scalar applied). SQL "
    "UDFs INLINE into the Catalyst plan — predicates through them "
    "still push down and codegen still fuses, making this the only "
    "zero-boundary-cost user-function tier (the X1-X10 Python ladder "
    "all pay a process hop); shared business logic belongs here "
    "first. The oracle inlines both bodies — inlining IS the "
    "semantics.",
)
def q_sql_udf(spark: SparkSession, sf_dir: str) -> DataFrame:
    load_table(spark, sf_dir, "lineitem").createOrReplaceTempView(
        "x11_lineitem"
    )
    spark.sql(
        "CREATE OR REPLACE TEMPORARY FUNCTION x11_net(p DOUBLE, d DOUBLE) "
        "RETURNS DOUBLE RETURN p * (1 - d)"
    )
    spark.sql(
        "CREATE OR REPLACE TEMPORARY FUNCTION x11_tiers(n INT) "
        "RETURNS TABLE (tier INT) RETURN SELECT explode(sequence(1, n))"
    )
    return spark.sql(
        """
        SELECT l_orderkey, l_linenumber, t.tier,
               x11_net(l_extendedprice, l_discount) * t.tier AS tiered_net
        FROM x11_lineitem CROSS JOIN x11_tiers(3) t
        WHERE l_quantity > 45
        """
    )


# ==== forty-eighth wave (r4) ==================================================


class _TopWordsUdtf:
    """UDTF whose OUTPUT SCHEMA is computed at plan time by the static
    analyze() hook from the literal k argument (w1..wk + n_words) — the
    Spark 4 dynamic-schema UDTF surface (X4/X8 pin fixed-schema UDTFs).
    eval ties break (count desc, token asc), matching the oracle."""

    @staticmethod
    def analyze(text, k):
        from pyspark.sql.functions import AnalyzeResult
        from pyspark.sql.types import (
            LongType,
            StringType,
            StructField,
            StructType,
        )

        n = int(k.value)
        fields = [StructField(f"w{i + 1}", StringType()) for i in range(n)]
        return AnalyzeResult(
            StructType(fields + [StructField("n_words", LongType())])
        )

    def eval(self, text: str, k: int):
        from collections import Counter

        toks = text.split() if text is not None else []
        top = [
            w
            for w, _ in sorted(
                Counter(toks).items(), key=lambda t: (-t[1], t[0])
            )[:k]
        ]
        top += [None] * (k - len(top))
        yield tuple(top) + (len(toks),)


@register(
    "q_udtf_analyze",
    tags=("python_boundary",),
    oracle="""
        WITH toks AS (
            SELECT doc_id, t.tok AS tok
            FROM (SELECT doc_id, unnest(string_split(text, ' ')) AS tok
                  FROM documents WHERE lang = 'en') t
        ),
        counts AS (
            SELECT doc_id, tok, CAST(COUNT(*) AS BIGINT) AS c,
                   CAST(SUM(COUNT(*)) OVER (PARTITION BY doc_id) AS BIGINT)
                       AS n_words,
                   ROW_NUMBER() OVER (PARTITION BY doc_id
                                      ORDER BY COUNT(*) DESC, tok) AS rn
            FROM toks GROUP BY doc_id, tok
        )
        SELECT doc_id,
               MAX(CASE WHEN rn = 1 THEN tok END) AS w1,
               MAX(CASE WHEN rn = 2 THEN tok END) AS w2,
               MAX(CASE WHEN rn = 3 THEN tok END) AS w3,
               MAX(n_words) AS n_words
        FROM counts
        GROUP BY doc_id
    """,
    section="X12",
    doc="Python UDTF with a static analyze() hook: the output schema "
    "(w1..wk columns + n_words) is COMPUTED AT PLAN TIME from the "
    "literal k argument — the Spark 4 dynamic-schema UDTF surface "
    "that lets one table function serve any arity without re-"
    "registration (X4/X8 pin the fixed-schema and TABLE-argument "
    "variants; this completes the UDTF API surface). Top-3 tokens per "
    "English document, ties broken (count desc, token asc) "
    "identically in eval and the relational oracle. The Python "
    "boundary is the POINT of the query (an API pin, not a hot path — "
    "the oracle shows the same result is pure SQL); "
    "tests/test_plan_shape.py's Python-eval allowlist admits it "
    "explicitly. Scale: one Python worker call per row with bounded "
    "row size — Arrow-batched, embarrassingly parallel, no state.",
)
def q_udtf_analyze(spark: SparkSession, sf_dir: str) -> DataFrame:
    from pyspark.sql.functions import udtf

    docs = load_table(spark, sf_dir, "documents").filter(F.col("lang") == "en")
    spark.udtf.register("top_words_udtf", udtf(_TopWordsUdtf))
    docs.createOrReplaceTempView("_udtf_analyze_docs")
    return spark.sql(
        """
        SELECT d.doc_id, s.w1, s.w2, s.w3, s.n_words
        FROM _udtf_analyze_docs d, LATERAL top_words_udtf(d.text, 3) s
        """
    )


@register(
    "q_pandas_udf_iterator",
    tags=("python_boundary",),
    oracle="""
        SELECT doc_id,
               CAST(length(text) - length(replace(text, ' ', '')) + 1
                    AS BIGINT) AS n_tokens,
               CAST(length(text) AS BIGINT) AS n_chars
        FROM documents WHERE lang = 'de'
    """,
    section="X13",
    doc="Iterator-of-Series Pandas UDF (SCALAR_ITER): the UDF receives an "
    "ITERATOR of Arrow batches instead of one Series per call, so "
    "per-worker setup (the expensive part of real inference UDFs — "
    "loading a tokenizer/model onto the worker) runs ONCE per "
    "partition and amortizes across every batch; this is the API "
    "shape embedding/model-scoring UDFs ship in production, and the "
    "one X2's plain scalar pandas_udf can't express. The 'model' here "
    "is a deterministic tokenizer (whitespace count) so the oracle is "
    "exact SQL; the one-time setup is simulated by constructing the "
    "counting table once before the batch loop. Scale: Arrow-batched "
    "columnar transfer, zero per-row Python overhead beyond the "
    "vectorized ops, setup cost O(partitions) not O(batches) — the "
    "difference between 10s and 10,000s of model loads on a 100 TB "
    "scoring run.",
)
def q_pandas_udf_iterator(spark: SparkSession, sf_dir: str) -> DataFrame:
    from pyspark.sql.functions import pandas_udf

    @pandas_udf("bigint")
    def tok_count(batches: Iterator[pd.Series]) -> Iterator[pd.Series]:
        # one-time per-worker setup (stands in for a model/tokenizer load)
        splitter = " "
        for texts in batches:
            yield texts.str.count(splitter).astype("int64") + 1

    @pandas_udf("bigint")
    def char_count(batches: Iterator[pd.Series]) -> Iterator[pd.Series]:
        for texts in batches:
            yield texts.str.len().astype("int64")

    docs = load_table(spark, sf_dir, "documents").filter(F.col("lang") == "de")
    return docs.select(
        "doc_id",
        tok_count(F.col("text")).alias("n_tokens"),
        char_count(F.col("text")).alias("n_chars"),
    )
