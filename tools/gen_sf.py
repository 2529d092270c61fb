#!/usr/bin/env python3
"""sf1 fixture generator: tile the driver's sf0.1 tables 10x with key offsets.

The driver generates /root/testdata up to sf0.1 only (TESTDATA.md); the 100 TB
design claims in SCALE.md need at least one measured decade beyond that
(r3 VERDICT task 1). This tool builds an sf1 directory (lineitem 6M rows,
documents 50k, embeddings 20k) from sf0.1 itself so every distribution the
queries depend on is preserved exactly:

  * Star schema: each replica i offsets every key column by i * (max_key+1)
    of its table, consistently across fact and dimension FKs, so referential
    integrity, fan-outs (lines/order, orders/customer), and value
    distributions are identical per replica. region/nation stay fixed
    (dimensions don't grow with corpus size). c_name is regenerated from the
    new key to keep the `Customer#%09d` pattern unique and regex-extractable.
  * Time columns are kept as-is: the time RANGE stays constant while event
    density grows 10x — the realistic shape of a bigger corpus over the same
    collection window, and what keeps per-day/window state constant-factor
    comparable across SFs.
  * documents: replica i>0 prefixes tokens with `r{i}` EXCEPT a small
    deterministic shared slice (pmod(xxhash64(token), 16) == 0, ~1/16 of
    the vocabulary) which stays unprefixed in replicas 1..3 ONLY (r7,
    VERDICT r6 task 4). Within a replica the map is injective, so
    token-overlap structure (and therefore the near-dup pair set) is
    identical to sf0.1. The shared tokens give corpus-df keys real
    stopwords at sf1 (df ~ 4 replicas' worth / 10 ~ 38% > the 30%
    discovery threshold — q_text_stopword_discovery non-vacuous, the r6
    fixture artifact fixed) while capping the shared-token document block
    at a FIXED ~4 replicas' worth of docs at EVERY SF. That cap is load-
    bearing: several oracles (inverted token joins, prefix joins) are
    inherently quadratic in a token's df count, so a corpus-FRACTION-df
    shared token would make the DuckDB side of the sf3/sf10 sweeps
    infeasible (C(0.38*N, 2) pairs). A fixed-count block costs a constant
    ~2e8 pairs at any SF instead. Consequence, documented: df ratio decays
    with SF, so stopword discovery is non-vacuous at sf1 but vacuous again
    at sf3+ — the unavoidable trade for quadratic-oracle feasibility.
    Cross-replica Jaccard from the shared slice stays far below every
    dedup threshold (min 0.45) for docs with >= 6 distinct tokens.
  * embeddings: replica i multiplies each vector elementwise by a
    deterministic +/-1 sign pattern (seeded by xxhash64(i, dim)). A sign
    flip per coordinate is an ORTHOGONAL transform: all intra-replica
    angles, distances, and cluster structure are preserved bit-for-bit,
    while cross-replica cosines are scrambled to noise — ANN/kmeans work per
    replica looks exactly like sf0.1, 10x over.

Determinism: no RNG anywhere — offsets, prefixes, and sign patterns are pure
functions of (replica, row), so the output is bit-reproducible.

Usage: python tools/gen_sf.py [--base /root/testdata/sf0.1] [--out .data/sf1]
                              [--replicas 10]
"""

from __future__ import annotations

import argparse
import os
import sys
import time

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, REPO)

from pyspark.sql import DataFrame, functions as F  # noqa: E402

from ai_to_cvent_etl_spark.io import load_table  # noqa: E402
from ai_to_cvent_etl_spark.session import get_spark  # noqa: E402


def _tile(df: DataFrame, replicas: int, build) -> DataFrame:
    out = build(df, 0)
    for i in range(1, replicas):
        out = out.unionByName(build(df, i))
    return out


def main() -> None:
    ap = argparse.ArgumentParser()
    ap.add_argument("--base", default="/root/testdata/sf0.1")
    ap.add_argument("--out", default=os.path.join(REPO, ".data", "sf1"))
    ap.add_argument("--replicas", type=int, default=10)
    ap.add_argument("--tables", default=None,
                    help="comma-separated subset to (re)generate; default all")
    ap.add_argument("--skip-verify", action="store_true",
                    help="skip the post-generation document invariant "
                    "checks (vocabulary injectivity + cross-replica "
                    "near-dup absence)")
    ap.add_argument("--verify-only", action="store_true",
                    help="run ONLY the document invariant checks against "
                    "an already-generated --out dir (no generation)")
    args = ap.parse_args()
    R = args.replicas
    only = set(args.tables.split(",")) if args.tables else None

    spark = get_spark(app_name="gen_sf")
    spark.sparkContext.setLogLevel("ERROR")
    if args.verify_only:
        base_docs = load_table(spark, args.base, "documents")
        stride_docs = base_docs.agg(F.max("doc_id")).collect()[0][0] + 1
        verify_doc_invariants(
            spark, args.out, R, stride_docs, min_threshold=0.45
        )
        return
    os.makedirs(args.out, exist_ok=True)

    base = {
        n: load_table(spark, args.base, n)
        for n in [
            "region", "nation", "supplier", "customer", "part",
            "orders", "lineitem", "events", "documents", "embeddings",
        ]
    }
    # key strides = max+1 per table (collect of 1 scalar each — generator
    # tool, not a query path)
    stride = {
        t: base[t].agg(F.max(k)).collect()[0][0] + 1
        for t, k in [
            ("supplier", "s_suppkey"), ("customer", "c_custkey"),
            ("part", "p_partkey"), ("orders", "o_orderkey"),
            ("events", "event_id"), ("documents", "doc_id"),
            ("embeddings", "vec_id"),
        ]
    }
    stride["user"] = base["events"].agg(F.max("user_id")).collect()[0][0] + 1

    def off(col: str, table: str, i: int):
        return (F.col(col) + F.lit(i * stride[table])).alias(col)

    plans: dict[str, DataFrame] = {}
    plans["region"] = base["region"]
    plans["nation"] = base["nation"]
    plans["supplier"] = _tile(
        base["supplier"], R,
        lambda df, i: df.select(
            off("s_suppkey", "supplier", i), "s_name", "s_nationkey", "s_acctbal"
        ),
    )
    plans["customer"] = _tile(
        base["customer"], R,
        lambda df, i: df.select(
            off("c_custkey", "customer", i),
            F.format_string(
                "Customer#%09d", F.col("c_custkey") + F.lit(i * stride["customer"])
            ).alias("c_name"),
            "c_nationkey", "c_acctbal", "c_mktsegment",
        ),
    )
    plans["part"] = _tile(
        base["part"], R,
        lambda df, i: df.select(
            off("p_partkey", "part", i),
            "p_name", "p_brand", "p_type", "p_size", "p_retailprice",
        ),
    )
    plans["orders"] = _tile(
        base["orders"], R,
        lambda df, i: df.select(
            off("o_orderkey", "orders", i),
            off("o_custkey", "customer", i),
            "o_orderstatus", "o_totalprice", "o_orderdate", "o_orderpriority",
        ),
    )
    plans["lineitem"] = _tile(
        base["lineitem"], R,
        lambda df, i: df.select(
            off("l_orderkey", "orders", i),
            off("l_partkey", "part", i),
            off("l_suppkey", "supplier", i),
            "l_linenumber", "l_quantity", "l_extendedprice", "l_discount",
            "l_tax", "l_returnflag", "l_linestatus", "l_shipdate",
        ),
    )
    plans["events"] = _tile(
        base["events"], R,
        lambda df, i: df.select(
            off("event_id", "events", i),
            "ts",
            off("user_id", "user", i),
            "event_type", "value", "props",
        ),
    )

    def doc_replica(df: DataFrame, i: int) -> DataFrame:
        if i == 0:
            return df.select("doc_id", "text", "lang", "source", "n_chars")
        # r7: ~1/16 of the vocabulary stays UNPREFIXED in replicas 1..3
        # (see module docstring: fixed-count sharing keeps quadratic
        # oracles feasible while making corpus-df keys non-vacuous at sf1).
        if i <= 3:
            text = F.expr(
                f"array_join(transform(split(text, ' '), t -> "
                f"CASE WHEN pmod(xxhash64(t), 16) = 0 THEN t "
                f"ELSE concat('r{i}', t) END), ' ')"
            )
        else:
            text = F.expr(
                f"array_join(transform(split(text, ' '), t -> "
                f"concat('r{i}', t)), ' ')"
            )
        return df.select(
            off("doc_id", "documents", i),
            text.alias("text"),
            "lang",
            "source",
        ).withColumn("n_chars", F.length("text").cast("long"))

    plans["documents"] = _tile(base["documents"], R, doc_replica)

    def emb_replica(df: DataFrame, i: int) -> DataFrame:
        if i == 0:
            return df.select("vec_id", "embedding", "label")
        sign = (
            f"transform(embedding, (x, d) -> "
            f"CAST(x * (1 - 2 * pmod(xxhash64({i}, d), 2)) AS FLOAT))"
        )
        return df.select(
            off("vec_id", "embeddings", i),
            F.expr(sign).alias("embedding"),
            "label",
        )

    plans["embeddings"] = _tile(base["embeddings"], R, emb_replica)

    for name, df in plans.items():
        if only is not None and name not in only:
            continue
        t0 = time.perf_counter()
        path = os.path.join(args.out, f"{name}.parquet")
        df.write.mode("overwrite").parquet(path)
        n = spark.read.parquet(path).count()
        print(f"{name}: {n} rows -> {path} ({time.perf_counter() - t0:.1f}s)")

    if not args.skip_verify and (only is None or "documents" in only):
        verify_doc_invariants(
            spark, args.out, R, stride["documents"], min_threshold=0.45
        )


def verify_doc_invariants(
    spark, out_dir: str, replicas: int, doc_stride: int,
    min_threshold: float = 0.45,
) -> None:
    """Fail loudly if the generated documents break the two invariants the
    scale-linearity baselines REST on (ADVICE r7: the docstring's argument
    for them is probabilistic — a base token literally starting with
    'r1'/'r2'/… can collide with a prefixed token, and a short doc living
    mostly in the shared 1/16 slice can exceed a dedup threshold across
    replicas — so check the DATA, not the construction):

    1. Vocabulary injectivity: a token string may span multiple replicas
       only if it is a shared-slice token (pmod(xxhash64(t),16)=0) confined
       to replicas 0..3, AND its per-replica doc count is IDENTICAL across
       the replicas it spans (a prefix collision would inflate one side).
    2. No cross-replica near-dup pair at the engine's minimum declared
       dedup threshold: every near_dup_pairs(…, 0.45) pair must be
       within-replica, otherwise "dedup output scales ~linearly with
       replicas" is silently false.
    """
    from pyspark.sql import functions as F

    from ai_to_cvent_etl_spark.operators.dedup import near_dup_pairs

    docs = spark.read.parquet(os.path.join(out_dir, "documents.parquet"))
    t0 = time.perf_counter()

    tok = docs.select(
        (F.col("doc_id") / doc_stride).cast("int").alias("rep"),
        F.explode(F.array_distinct(F.split("text", " "))).alias("tok"),
    ).where(F.col("tok") != "")
    per_rep = tok.groupBy("tok", "rep").agg(F.count(F.lit(1)).alias("n"))
    spans = per_rep.groupBy("tok").agg(
        F.count(F.lit(1)).alias("n_reps"),
        F.max("rep").alias("max_rep"),
        F.count_distinct("n").alias("n_distinct_counts"),
    )
    bad_vocab = spans.where(
        (F.col("n_reps") > 1)
        & (
            (F.pmod(F.xxhash64("tok"), F.lit(16)) != 0)
            | (F.col("max_rep") > 3)
            | (F.col("n_distinct_counts") > 1)
        )
    )
    n_bad = bad_vocab.count()
    if n_bad:
        sample = [r.tok for r in bad_vocab.limit(5).collect()]
        raise AssertionError(
            f"replica-vocabulary collision: {n_bad} token(s) span replicas "
            f"illegally (non-shared, beyond replica 3, or with unequal "
            f"per-replica doc counts), e.g. {sample}"
        )

    pairs = near_dup_pairs(docs.select("doc_id", "text"), min_threshold)
    cross = pairs.where(
        (F.col("doc_lo") / doc_stride).cast("int")
        != (F.col("doc_hi") / doc_stride).cast("int")
    )
    n_cross = cross.count()
    if n_cross:
        sample = [
            (r.doc_lo, r.doc_hi, r.jaccard) for r in cross.limit(5).collect()
        ]
        raise AssertionError(
            f"{n_cross} cross-replica near-dup pair(s) at threshold "
            f">= {min_threshold} — dedup linearity baseline broken, "
            f"e.g. {sample}"
        )
    print(
        f"doc invariants OK: 0 vocabulary collisions, 0 cross-replica "
        f"pairs >= {min_threshold} ({time.perf_counter() - t0:.1f}s)"
    )


if __name__ == "__main__":
    main()
