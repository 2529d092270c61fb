"""t1 mirror: entry() runs on sf0.001 and returns rows with a stable schema;
parquet footers match the declared schemas."""

from __future__ import annotations


def test_entry_returns_rows(spark):
    import __spark_entry__ as e

    df = e.entry(spark)
    rows = df.collect()
    assert len(rows) > 0
    assert df.columns[0] == "r_name"


def test_declared_schemas_match_parquet(spark):
    from ai_to_cvent_etl_spark.io import SCHEMAS, load_table
    from tests.conftest import SF0001

    for name, schema in SCHEMAS.items():
        df = load_table(spark, SF0001, name)
        got = [(f.name, f.dataType.simpleString()) for f in df.schema.fields]
        want = [(f.name, f.dataType.simpleString()) for f in schema.fields]
        assert got == want, f"{name}: {got} != {want}"


def test_registry_contract(registry):
    import __spark_entry__ as e

    qs = e.queries()
    os = e.oracle_sql()
    assert set(os) <= set(qs)
    assert all(k.startswith("q_") for k in qs)
