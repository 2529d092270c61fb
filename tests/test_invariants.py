"""Oracle-free algebraic invariants (SURVEY §5.2): relations that must hold
between operators regardless of data, checked on the fixed sf0.001 tables."""

from __future__ import annotations

from tests.conftest import SF0001


def test_union_all_counts_add(spark, registry):
    from ai_to_cvent_etl_spark.io import load_table

    orders = load_table(spark, SF0001, "orders")
    a = orders.filter("o_orderstatus = 'F'")
    b = orders.filter("o_totalprice > 100000")
    assert a.unionByName(b).count() == a.count() + b.count()


def test_semi_plus_anti_partition_customers(spark):
    from ai_to_cvent_etl_spark.io import load_table

    customer = load_table(spark, SF0001, "customer")
    orders = load_table(spark, SF0001, "orders")
    cond = customer.c_custkey == orders.o_custkey
    semi = customer.join(orders, cond, "left_semi")
    anti = customer.join(orders, cond, "left_anti")
    assert semi.count() + anti.count() == customer.count()
    assert semi.intersect(anti).count() == 0


def test_topk_is_prefix_of_full_sort(spark, registry):
    full = (
        registry["q_scan_parquet"]
        .builder(spark, SF0001)
        .orderBy("l_orderkey", "l_linenumber")
    )
    from ai_to_cvent_etl_spark.io import load_table

    orders = load_table(spark, SF0001, "orders")
    top10 = registry["q_order_limit_topk"].builder(spark, SF0001).collect()
    full_sorted = orders.orderBy(
        orders.o_totalprice.desc(), orders.o_orderkey.asc()
    ).limit(len(top10)).collect()
    assert [r["o_orderkey"] for r in top10] == [r["o_orderkey"] for r in full_sorted]


def test_jaccard_bounds_and_key_order(spark, registry):
    rows = registry["q_dedup_near_jaccard"].builder(spark, SF0001).collect()
    assert rows, "expected some near-dup pairs in the synthetic corpus"
    for r in rows:
        assert 0.8 <= r["jaccard"] <= 1.0
        assert r["doc_lo"] < r["doc_hi"]


def test_minhash_lsh_candidates_subset_of_bruteforce(spark, registry):
    """LSH verify-stage output = brute-force pairs ∩ LSH candidates: every
    emitted pair must appear in the brute-force result with equal jaccard
    (precision 1.0 by construction; recall < 1 is the LSH trade-off)."""
    brute = {
        (r["doc_lo"], r["doc_hi"]): r["jaccard"]
        for r in registry["q_dedup_near_jaccard"].builder(spark, SF0001).collect()
    }
    lsh = {
        (r["doc_lo"], r["doc_hi"]): r["jaccard"]
        for r in registry["q_dedup_minhash_lsh"].builder(spark, SF0001).collect()
    }
    assert set(lsh).issubset(set(brute))
    assert all(brute[p] == j for p, j in lsh.items())
    # and on this corpus recall should be high (>= 90%)
    assert len(lsh) >= 0.9 * len(brute)


def test_ann_matches_bruteforce_within_cell(spark, registry):
    """Bucketed ANN top-3 must equal the brute-force top-5 restricted to the
    query's cell, truncated to 3 — for queries whose top-3 stay in-cell the
    ids must match exactly."""
    from pyspark.sql import functions as F

    from ai_to_cvent_etl_spark.io import load_table

    ann = registry["q_ann_ivf_topk"].builder(spark, SF0001).collect()
    by_query: dict[int, list[int]] = {}
    for r in sorted(ann, key=lambda r: (r["query_id"], r["rank"])):
        by_query.setdefault(r["query_id"], []).append(r["neighbor_id"])
    assert set(by_query) == set(range(10))
    assert all(len(v) == 3 for v in by_query.values())

    emb = load_table(spark, SF0001, "embeddings")
    cell = (
        (F.element_at("embedding", 1) >= 0).cast("int") * 4
        + (F.element_at("embedding", 2) >= 0).cast("int") * 2
        + (F.element_at("embedding", 3) >= 0).cast("int")
    )
    cells = {r["vec_id"]: r["c"] for r in emb.select("vec_id", cell.alias("c")).collect()}
    for q, neighbors in by_query.items():
        assert all(cells[n] == cells[q] for n in neighbors)


def test_simhash_groups_are_consistent(spark, registry):
    rows = registry["q_dedup_simhash"].builder(spark, SF0001).collect()
    by_hash: dict[int, list[int]] = {}
    for r in rows:
        by_hash.setdefault(r["simhash"], []).append(r["doc_id"])
        assert 0 <= r["simhash"] < (1 << 16)
    reps = {r["simhash"]: r["group_rep"] for r in rows}
    for h, docs in by_hash.items():
        assert reps[h] == min(docs)


def test_token_xxhash64_collision_free_on_fixtures(spark):
    """The dedup verify steps intersect xxhash64(token) arrays instead of
    string arrays (2x faster). That substitution is exact iff no two distinct
    corpus tokens share a 64-bit hash — pin it on every fixture sf present.
    (P(collision) for a v-token vocab ~ v^2/2^65; this guards against an
    engine changing xxhash64's semantics, not against real collision odds.)"""
    import os

    from pyspark.sql import functions as F

    from ai_to_cvent_etl_spark.io import load_table

    for sf_dir in (
        "/root/testdata/sf0.001",
        "/root/testdata/sf0.01",
        "/root/testdata/sf0.1",
    ):
        if not os.path.isdir(sf_dir):
            continue
        toks = (
            load_table(spark, sf_dir, "documents")
            .select(F.explode(F.split("text", " ")).alias("tok"))
            .distinct()
        )
        n_tok, n_hash = toks.agg(
            F.count("tok"), F.countDistinct(F.xxhash64("tok"))
        ).first()
        assert n_tok == n_hash, f"xxhash64 collision in {sf_dir} vocab"


def test_minhash_bucket_cap_invariance(spark, registry):
    """The pathological-bucket cap (SCALE.md): with the cap above the
    largest fixture bucket (max 394 docs at sf0.001) the capped path must
    return EXACTLY the uncapped result at t=0.8 — same pairs through the
    explicit pair-dedup instead of first-band emission. With a cap that
    does prune buckets, the result must be a strict SUBSET (the cap trades
    recall, never precision: no pair can appear that the uncapped query
    lacks). On THIS corpus the giant buckets carry the true near-dup mass
    (24% of all pairs are dups), so a tight cap costs recall here; on a
    boilerplate-skewed real corpus the pruned buckets are precisely the
    non-dup noise."""
    build = registry["q_dedup_minhash_lsh"].builder
    full = set(map(tuple, build(spark, SF0001).collect()))
    capped = set(map(tuple, build(spark, SF0001, bucket_cap=500).collect()))
    assert capped == full, (
        f"lossless cap diverged: lost={len(full - capped)} "
        f"extra={len(capped - full)}"
    )
    tight = set(map(tuple, build(spark, SF0001, bucket_cap=390).collect()))
    assert tight <= full, f"tight cap invented pairs: {len(tight - full)}"
    assert tight, "tight cap returned nothing"


def test_approx_distinct_golden_values(spark, registry):
    """A4 is rows-only at the driver (Spark HLL++ != DuckDB HLL estimates),
    so pin Spark's actual estimates on the fixtures as golden values —
    deterministic per Spark version; a silent estimator change fails here
    instead of never being noticed."""
    build = registry["q_agg_approx_distinct"].builder
    got = sorted(map(tuple, build(spark, SF0001).collect()))
    assert got == [("F", 146), ("O", 150), ("P", 146)], got
    got01 = sorted(map(tuple, build(spark, "/root/testdata/sf0.01").collect()))
    assert got01 == [("F", 1361), ("O", 1369), ("P", 1367)], got01


def test_novelty_hash_key_collision_bound(spark):
    """q_text_novelty keys grams on xxhash64 (SCALE.md Text/LLM ops): the
    rewrite is w.h.p.-exact, and the documented birthday bound must hold —
    expected colliding pairs n^2/2^65 stays below 1e-6 through sf10-scale
    gram inventories (so a collision-moved count is effectively impossible
    at any driver SF), and the fixture's distinct-gram count actually is
    the regime the doc claims. Arithmetic + fixture assertion, no Spark
    shuffle beyond one distinct-count."""
    from pyspark.sql import functions as F

    from ai_to_cvent_etl_spark.io import load_table

    docs = load_table(spark, SF0001, "documents").select(
        F.split("text", " ").alias("sp")
    )
    toks = F.col("sp")
    tri = F.transform(
        F.slice(toks, 1, F.greatest(F.size(toks) - 2, F.lit(0))),
        lambda x, i: F.concat_ws(
            " ", x, F.element_at(toks, i + 2), F.element_at(toks, i + 3)
        ),
    )
    n_distinct_grams = (
        docs.select(F.explode(tri).alias("g")).distinct().count()
    )
    assert n_distinct_grams > 0
    # the fixture sits ~9 orders of magnitude below the collision regime
    expected_colliding_pairs = n_distinct_grams**2 / 2.0**65
    assert expected_colliding_pairs < 1e-6
    # the documented widen-the-key threshold: expectation reaches 1 only
    # near n = 6e9 distinct grams
    assert (6e9**2) / 2.0**65 > 0.97
