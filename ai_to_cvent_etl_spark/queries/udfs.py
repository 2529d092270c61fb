"""SURVEY §2.12 — Python UDF / pandas UDF / UDAF / UDTF surface (X1-X4).

Rule for declared UD*Fs: the logic must be re-expressible in pure SQL so the
DuckDB oracle can mirror it. These four pin the Arrow/pickle boundary shapes;
hot declared queries elsewhere never use Python UDFs (SURVEY §4).
"""

from __future__ import annotations

import math
import re

import pandas as pd

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F
from pyspark.sql.functions import pandas_udf, udf, udtf
from pyspark.sql.types import DoubleType, StringType

from ai_to_cvent_etl_spark.io import load_table
from ai_to_cvent_etl_spark.registry import register


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
