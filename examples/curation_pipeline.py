"""Training-data curation pipeline: the LLM-data-prep loop end-to-end.

Sample -> language filter -> quality gate -> exact dedup -> near-dedup
(MinHash-LSH candidates, exact-Jaccard verify, cluster, keep one canonical
doc per cluster) -> write curated shards. Every stage is the same operator
the declared queries pin (stratified hash sampling, Gopher-style quality
scoring, md5-key exact dedup, LSH near-dedup + connected components), so
the pipeline inherits their oracle-checked semantics and their 100 TB plan
shapes: row-local gates first (cheapest, biggest volume), the only heavy
shuffles (near-dup pairing) run LAST on the smallest surviving set. Run:

    python examples/curation_pipeline.py [sf_dir] [out_dir]
"""

from __future__ import annotations

import os
import sys
import tempfile

REPO_ROOT = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
if REPO_ROOT not in sys.path:
    sys.path.insert(0, REPO_ROOT)


def run(sf_dir: str, out_dir: str) -> dict:
    from pyspark.sql import functions as F

    from ai_to_cvent_etl_spark.connectors import write_parquet
    from ai_to_cvent_etl_spark.io import load_table
    from ai_to_cvent_etl_spark.operators.dedup import (
        connected_components,
        near_dup_pairs,
    )
    from ai_to_cvent_etl_spark.session import get_spark

    spark = get_spark(app_name="curation-example")
    spark.sparkContext.setLogLevel("ERROR")

    docs = load_table(spark, sf_dir, "documents")
    n_input = docs.count()

    # 1. Deterministic hash sample (retry-stable; here: keep 90%).
    bucket = (
        F.conv(F.substring(F.md5(F.col("doc_id").cast("string")), 1, 8), 16, 10)
        .cast("bigint") % 100
    )
    sampled = docs.filter(bucket < 90)

    # 2. Row-local quality gate (C4/Gopher-style): length + stopword signal.
    toks = F.split(F.col("text"), " ")
    stop_hits = F.size(
        F.array_intersect(toks, F.array(*[F.lit(w) for w in ("the", "of", "and")]))
    )
    gated = sampled.filter(
        (F.col("n_chars") >= 20)
        & (F.size(toks) >= 5)
        & (F.size(F.array_distinct(toks)) / F.size(toks) > 0.2)
    ).withColumn("has_stopword", stop_hits > 0)

    # 3. Exact dedup on the normalized text key (deterministic keeper).
    key = F.md5(F.lower(F.trim(F.col("text"))))
    exact_unique = (
        gated.withColumn("text_key", key)
        .groupBy("text_key")
        .agg(F.min("doc_id").alias("keep_id"))
        .join(gated.withColumn("text_key", key), "text_key")
        .filter(F.col("doc_id") == F.col("keep_id"))
        .drop("text_key", "keep_id")
    )

    # 4. Near-dedup: pair -> cluster -> keep the min-doc_id representative.
    pairs = near_dup_pairs(
        exact_unique.select("doc_id", "text"), threshold=0.95
    ).select("doc_lo", "doc_hi")
    comp = connected_components(pairs, exact_unique.select("doc_id"))
    curated = (
        exact_unique.join(comp, "doc_id")
        .filter(F.col("doc_id") == F.col("component"))
        .drop("component")
    )

    # 5. LOAD: partitioned curated shards (small-file-safe).
    curated_dir = os.path.join(out_dir, "curated")
    write_parquet(curated, curated_dir, partition_by=["lang"])

    n_curated = curated.count()
    return {
        "input_rows": n_input,
        "sampled_rows": sampled.count(),
        "gated_rows": gated.count(),
        "exact_unique_rows": exact_unique.count(),
        "curated_rows": n_curated,
        "curated_dir": curated_dir,
    }


if __name__ == "__main__":
    sf = sys.argv[1] if len(sys.argv) > 1 else "/root/testdata/sf0.001"
    out = sys.argv[2] if len(sys.argv) > 2 else tempfile.mkdtemp(prefix="curation_")
    print(run(sf, out))
