"""Quantitative gates for the three rows-only sketch queries (r3 VERDICT
task 5): A4 / A20 / SK3 carry no cross-engine oracle BY DESIGN (sketch
estimates are engine-specific), so without this file their only checks are
row-count + within-Spark golden determinism. Here each estimate is asserted
against its EXACT twin, computed in-test from the same table, with a
relative-error bound derived from the sketch's published guarantee — at TWO
scale factors, so the bound is exercised on both a 6k-row and a 600k-row
input (estimator error must not degrade with scale; that is the point of
the sketches).

Bounds used (3-sigma style, generous so the test never flakes across Spark
versions while still catching a broken estimator by an order of magnitude):
  * A4  approx_count_distinct: HLL++ default rsd = 0.05  -> |err| <= 15%.
  * A20 approx_percentile(accuracy=1000): rank error <= 1/1000 of rows; on
    these value distributions the induced VALUE error is well under 5%.
  * SK3 hll_sketch_agg(lgK=12): rsd ~ 1.04/sqrt(2^12) ~ 1.6% -> |err| <= 5%,
    checked per group AND for the sketch-UNION total (mergeability must not
    inflate error).
"""

from __future__ import annotations

import pytest

from pyspark.sql import functions as F

from tests.conftest import SF0001

SF001 = SF0001.replace("sf0.001", "sf0.01")
SF01 = SF0001.replace("sf0.001", "sf0.1")


def _rel_err(approx: float, exact: float) -> float:
    assert exact > 0
    return abs(approx - exact) / exact


@pytest.mark.parametrize("sf_dir", [SF001, SF01])
def test_a4_approx_distinct_error_bound(spark, registry, sf_dir):
    approx = {
        r["o_orderstatus"]: r["approx_customers"]
        for r in registry["q_agg_approx_distinct"].builder(spark, sf_dir).collect()
    }
    from ai_to_cvent_etl_spark.io import load_table

    exact = {
        r["o_orderstatus"]: r["n"]
        for r in load_table(spark, sf_dir, "orders")
        .groupBy("o_orderstatus")
        .agg(F.countDistinct("o_custkey").alias("n"))
        .collect()
    }
    assert approx.keys() == exact.keys()
    for k in exact:
        assert _rel_err(approx[k], exact[k]) <= 0.15, (sf_dir, k, approx[k], exact[k])


@pytest.mark.parametrize("sf_dir", [SF001, SF01])
def test_a20_approx_percentile_error_bound(spark, registry, sf_dir):
    approx = {
        r["l_returnflag"]: (r["p50"], r["p90"], r["p99"])
        for r in registry["q_agg_approx_percentile"].builder(spark, sf_dir).collect()
    }
    from ai_to_cvent_etl_spark.io import load_table

    exact = {
        r["l_returnflag"]: (r["p50"], r["p90"], r["p99"])
        for r in load_table(spark, sf_dir, "lineitem")
        .groupBy("l_returnflag")
        .agg(
            F.expr("percentile(l_extendedprice, 0.5)").alias("p50"),
            F.expr("percentile(l_extendedprice, 0.9)").alias("p90"),
            F.expr("percentile(l_extendedprice, 0.99)").alias("p99"),
        )
        .collect()
    }
    assert approx.keys() == exact.keys()
    for k in exact:
        for a, e, name in zip(approx[k], exact[k], ("p50", "p90", "p99")):
            assert _rel_err(a, e) <= 0.05, (sf_dir, k, name, a, e)


@pytest.mark.parametrize("sf_dir", [SF001, SF01])
def test_sk3_hll_union_error_bound(spark, registry, sf_dir):
    rows = registry["q_sketch_hll_union"].builder(spark, sf_dir).collect()
    from ai_to_cvent_etl_spark.io import load_table

    ev = load_table(spark, sf_dir, "events")
    exact_total = ev.agg(F.countDistinct("user_id")).collect()[0][0]
    for r in rows:
        if r["event_type"] == "__all__":
            # the UNION-merged estimate vs the exact global distinct:
            # mergeability must not degrade the per-sketch error bound
            assert _rel_err(r["approx_users"], exact_total) <= 0.05, (
                sf_dir,
                r["approx_users"],
                exact_total,
            )
        else:
            # per-group rows carry their exact twin in-row (the query
            # computes both in one pass)
            assert _rel_err(r["approx_users"], r["exact_users"]) <= 0.05, (
                sf_dir,
                r["event_type"],
                r["approx_users"],
                r["exact_users"],
            )
