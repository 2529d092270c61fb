"""Salted-join operator: equivalence with a plain join, salt distribution."""

from __future__ import annotations

from pyspark.sql import functions as F

from tests.conftest import SF0001


def test_salted_join_equals_plain_join(spark):
    from ai_to_cvent_etl_spark.io import load_table
    from ai_to_cvent_etl_spark.operators.skew import salted_join

    orders = load_table(spark, SF0001, "orders")
    customer = load_table(spark, SF0001, "customer").withColumnRenamed(
        "c_custkey", "o_custkey"
    )
    plain = orders.join(customer, on=["o_custkey"]).select(
        "o_orderkey", "o_custkey", "c_name"
    )
    salted = salted_join(orders, customer, on=["o_custkey"], k=8).select(
        "o_orderkey", "o_custkey", "c_name"
    )
    assert sorted(map(tuple, salted.collect())) == sorted(map(tuple, plain.collect()))


def test_salt_spreads_hot_key(spark):
    """A 100%-skewed key must occupy every salt bucket."""
    from ai_to_cvent_etl_spark.operators.skew import salted_join

    hot = spark.range(4000).select(
        F.lit(1).alias("k"), F.col("id").alias("payload")
    )
    dim = spark.createDataFrame([(1, "x")], "k long, v string")
    joined = salted_join(hot, dim, on=["k"], k=8)
    assert joined.count() == 4000

    salts = (
        hot.withColumn(
            "__salt", F.pmod(F.hash(*[F.col(c) for c in hot.columns]), F.lit(8))
        )
        .groupBy("__salt")
        .count()
        .collect()
    )
    counts = {r["__salt"]: r["count"] for r in salts}
    assert len(counts) == 8
    assert max(counts.values()) < 4000 * 0.25  # no bucket dominates


def test_minhash_auto_cap_prunes_boilerplate_bucket_same_result(spark, tmp_path):
    """Adversarial boilerplate corpus (r3 VERDICT task 2): 2,000 docs share
    an 8-token boilerplate block that dominates every band's minhash, so the
    uncapped LSH concentrates them into one giant bucket per band (measured
    731-1,684 docs => ~2.8M candidate pairs, ALL verify-rejects since their
    true Jaccard is 8/12 = 0.67 < 0.8). 100 planted near-dup pairs (J =
    9/11 = 0.818) live in tiny buckets. bucket_cap='auto' must derive a cap
    below the giant buckets, prune them, and still return EXACTLY the
    uncapped result set — the planted pairs, found via their own small
    buckets, emitted exactly once by first-surviving-band logic.

    auto_cap_mult is lowered 64 -> 6 so the adversary is affordable in CI
    (cap = 6*sqrt(4*2200) = 563 < every giant bucket); at the default mult
    the same engagement needs a >40k-doc corpus, which is what the sqrt
    rule is FOR — caps scale with corpus size, so only true outliers prune.
    """
    import math

    from pyspark.sql import functions as F

    from ai_to_cvent_etl_spark.queries.dedup_scale import q_dedup_minhash_lsh

    rows = []
    boiler = " ".join(f"b{k}" for k in range(8))
    for i in range(2000):
        rows.append((i, f"{boiler} u{i}a u{i}b"))
    for p in range(100):
        shared = " ".join(f"p{p}s{k}" for k in range(9))
        rows.append((10000 + 2 * p, f"{shared} p{p}xa"))
        rows.append((10000 + 2 * p + 1, f"{shared} p{p}xb"))
    docs = spark.createDataFrame(rows, "doc_id long, text string")
    sf_dir = str(tmp_path)
    docs.write.parquet(f"{sf_dir}/documents.parquet")

    uncapped = sorted(
        map(tuple, q_dedup_minhash_lsh(spark, sf_dir, bucket_cap=None).collect())
    )
    auto = sorted(
        map(
            tuple,
            q_dedup_minhash_lsh(
                spark, sf_dir, bucket_cap="auto", auto_cap_mult=6
            ).collect(),
        )
    )
    assert auto == uncapped  # same result set with the giants pruned
    # the result is exactly the planted pairs LSH can see (>=1 band
    # collision at J=0.818 has p ~ 0.988 per pair -> expect ~99/100)
    assert 80 <= len(auto) <= 100
    assert all(lo >= 10000 and hi == lo + 1 for lo, hi, _ in auto)
    assert all(abs(j - round(9 / 11, 4)) < 1e-9 for _, _, j in auto)

    # prove the cap actually engaged: every band's biggest bucket exceeds it
    cap = math.ceil(6 * math.sqrt(4 * docs.count()))
    from ai_to_cvent_etl_spark.queries.dedup_scale import _mh_spark, _N_BANDS

    sig = docs.select(
        "doc_id",
        F.array(
            *[
                F.md5(
                    F.concat(F.expr(_mh_spark(2 * b).replace("ts", "array_distinct(split(text, ' '))")),
                             F.expr(_mh_spark(2 * b + 1).replace("ts", "array_distinct(split(text, ' '))")))
                )
                for b in range(_N_BANDS)
            ]
        ).alias("bks"),
    )
    hist = (
        sig.select(F.posexplode("bks").alias("band", "bkey"))
        .groupBy("band", "bkey")
        .count()
        .groupBy("band")
        .agg(F.max("count").alias("mx"))
        .collect()
    )
    assert len(hist) == _N_BANDS
    assert all(r["mx"] > cap for r in hist), (cap, hist)
