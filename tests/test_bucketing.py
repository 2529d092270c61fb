"""Bucketed-join demonstration (SCALE.md "Joins"): writing both fact tables
bucketed on the join key makes repeated fact⋈fact joins shuffle-free — the
100 TB lever for the E1 snapshot-diff pattern. Verified on the physical plan:
no Exchange feeds the SortMergeJoin."""

from __future__ import annotations

import pytest

from tests.conftest import SF0001


@pytest.fixture(scope="module")
def bucketed_tables(spark, tmp_path_factory):
    from ai_to_cvent_etl_spark.io import load_table

    warehouse = tmp_path_factory.mktemp("bucketed")
    orders = load_table(spark, SF0001, "orders")
    for name, df in [
        ("orders_a_bkt", orders.filter("o_orderkey % 13 != 0")),
        ("orders_b_bkt", orders.filter("o_orderkey % 17 != 0")),
    ]:
        spark.sql(f"DROP TABLE IF EXISTS {name}")
        (
            df.write.mode("overwrite")
            .option("path", str(warehouse / name))
            .bucketBy(8, "o_orderkey")
            .sortBy("o_orderkey")
            .saveAsTable(name)
        )
    yield "orders_a_bkt", "orders_b_bkt"
    for name in ("orders_a_bkt", "orders_b_bkt"):
        spark.sql(f"DROP TABLE IF EXISTS {name}")


def test_bucketed_join_is_shuffle_free(spark, bucketed_tables):
    a_name, b_name = bucketed_tables
    spark.conf.set("spark.sql.autoBroadcastJoinThreshold", "-1")  # force SMJ path
    try:
        a, b = spark.table(a_name), spark.table(b_name)
        joined = a.join(b, "o_orderkey").select(a.o_orderkey, b.o_totalprice)
        plan = joined._jdf.queryExecution().executedPlan().toString()
        assert "SortMergeJoin" in plan, plan
        assert "Exchange" not in plan, plan  # bucket layout replaces the shuffle

        # and it computes the right thing (keys are unique per side, so the
        # join count equals the key-set intersection)
        expected = (
            a.select("o_orderkey").intersect(b.select("o_orderkey")).count()
        )
        assert joined.count() == expected > 0
    finally:
        spark.conf.set("spark.sql.autoBroadcastJoinThreshold", "10485760")
