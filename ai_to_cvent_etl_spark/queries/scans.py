"""SURVEY §2.1 — scans and text-format round-trips (S1-S5).

S1-S3 declared with exact oracles. S2/S3 pin Catalyst's column pruning and
parquet predicate pushdown: the physical scan must show ReadSchema with only
the selected columns and PushedFilters with the ship-date predicate
(asserted in tests via explain).

S4/S5 (promoted from smoke in r4, the O2 recipe): the Spark side writes a
table through the schema-explicit CSV / JSON-lines connector, reads it BACK,
and aggregates the re-read rows with exact integer checksums; the oracle
computes the same aggregates from the original parquet. A hash match
therefore proves the text round-trip is value-exact for every column type it
carries (int64, double, string-with-quotes/commas, µs timestamp, and for
JSON nested struct + array) — any corruption, truncation, or format drift
changes a checksum. Format pins that make this deterministic: explicit read
schema (no inference pass), timestampFormat=yyyy-MM-dd HH:mm:ss.SSSSSS (µs,
lossless both directions), and Spark's shortest-round-trip double printing
(Java Double.toString), which re-parses to the identical IEEE bits.
"""

from __future__ import annotations

import os
import tempfile

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from ai_to_cvent_etl_spark.io import load_table
from ai_to_cvent_etl_spark.registry import register
from pyspark.sql import DataFrame, SparkSession, Window


def _rt_dir(sf_dir: str, fmt: str) -> str:
    """Deterministic per-(dataset, format, process) scratch dir for the
    round-trip sinks: overwrite-in-place across repeated builds (no leak),
    pid-suffixed so concurrent harness processes never clobber each other."""
    base = os.path.basename(os.path.normpath(sf_dir)) or "sf"
    return os.path.join(
        tempfile.gettempdir(), f"spark_graft_rt_{base}_{fmt}_{os.getpid()}"
    )


@register(
    "q_scan_parquet",
    oracle="SELECT * FROM lineitem",
    section="S1",
    doc="Full scan of the fact table, stable schema/column order.",
)
def q_scan_parquet(spark: SparkSession, sf_dir: str) -> DataFrame:
    return load_table(spark, sf_dir, "lineitem")


@register(
    "q_scan_projection_pushdown",
    oracle="SELECT l_orderkey, l_quantity FROM lineitem",
    section="S2",
    doc="2-column projection; Catalyst prunes the parquet ReadSchema to 2 cols.",
)
def q_scan_projection_pushdown(spark: SparkSession, sf_dir: str) -> DataFrame:
    return load_table(spark, sf_dir, "lineitem").select("l_orderkey", "l_quantity")


@register(
    "q_scan_filter_pushdown",
    oracle="""
        SELECT l_orderkey, l_linenumber, l_shipdate, l_quantity
        FROM lineitem WHERE l_shipdate >= TIMESTAMP '1998-01-01'
    """,
    section="S3",
    doc="Predicate pushed into parquet row-group filters.",
)
def q_scan_filter_pushdown(spark: SparkSession, sf_dir: str) -> DataFrame:
    return (
        load_table(spark, sf_dir, "lineitem")
        .filter(F.col("l_shipdate") >= F.lit("1998-01-01").cast("timestamp"))
        .select("l_orderkey", "l_linenumber", "l_shipdate", "l_quantity")
    )


# epoch µs of 2024-01-01T00:00:00Z — the events table's time-domain floor
# (FIXTURES.md). Offsetting before the sum keeps the per-row term < 2.6e12
# and the 1e5-row checksum < 2.6e17, comfortably inside BIGINT, so no
# DECIMAL widening (whose repr differs cross-engine) is ever needed.
_TS_BASE_US = 1_704_067_200_000_000


@register(
    "q_csv_roundtrip",
    oracle=f"""
        SELECT event_type,
               CAST(COUNT(*) AS BIGINT) AS n,
               CAST(COUNT(DISTINCT user_id) AS BIGINT) AS n_users,
               CAST(SUM(event_id) AS BIGINT) AS id_sum,
               CAST(SUM(CAST(floor(value * 1e4) AS BIGINT)) AS BIGINT)
                   AS value_q4_sum,
               CAST(SUM(epoch_us(ts) - {_TS_BASE_US}) AS BIGINT) AS ts_us_sum,
               MIN(ts) AS ts_min,
               MAX(ts) AS ts_max,
               CAST(SUM(length(props)) AS BIGINT) AS props_len_sum
        FROM events GROUP BY event_type
    """,
    section="S4",
    doc="CSV round-trip, exact: events -> schema-explicit CSV sink -> re-read "
    "-> per-type integer checksums (row count, distinct users, id sum, "
    "floor(value*1e4) sum, µs-offset timestamp sum, min/max ts, props "
    "length sum); oracle computes the same checksums from the parquet "
    "original, so a hash match proves the text round-trip is value-exact "
    "for int64 / double / µs-timestamp / quoted-JSON-string columns. "
    "Pins: explicit read schema, µs timestampFormat, shortest-round-trip "
    "double printing, default quote+escape handling for the embedded "
    "quotes and commas in props.",
)
def q_csv_roundtrip(spark: SparkSession, sf_dir: str) -> DataFrame:
    from ai_to_cvent_etl_spark.connectors.files import read_csv, write_csv

    ev = load_table(spark, sf_dir, "events").select(
        "event_id", "ts", "user_id", "event_type", "value", "props"
    )
    path = _rt_dir(sf_dir, "csv")
    write_csv(ev, path)
    back = read_csv(spark, path, ev.schema)
    return back.groupBy("event_type").agg(
        F.count(F.lit(1)).alias("n"),
        F.countDistinct("user_id").alias("n_users"),
        F.sum("event_id").alias("id_sum"),
        F.sum(F.floor(F.col("value") * F.lit(1e4))).alias("value_q4_sum"),
        F.sum(F.unix_micros("ts") - F.lit(_TS_BASE_US)).alias("ts_us_sum"),
        F.min("ts").alias("ts_min"),
        F.max("ts").alias("ts_max"),
        F.sum(F.length("props")).cast("bigint").alias("props_len_sum"),
    )


@register(
    "q_json_roundtrip",
    oracle="""
        SELECT o_orderstatus AS status,
               CAST(COUNT(*) AS BIGINT) AS n,
               CAST(COUNT(DISTINCT o_orderpriority) AS BIGINT) AS n_prio,
               CAST(SUM(o_custkey) AS BIGINT) AS cust_sum,
               CAST(SUM(CAST(CAST(o_totalprice AS DECIMAL(18,2)) * 100
                             AS BIGINT)) AS BIGINT) AS price_cents_sum,
               MIN(o_orderdate) AS date_min,
               MAX(o_orderdate) AS date_max,
               CAST(SUM(len(string_split(o_orderpriority, '-')))
                    AS BIGINT) AS ptok_sum
        FROM orders GROUP BY o_orderstatus
    """,
    section="S5",
    doc="JSON-lines round-trip, exact: orders (plus a constructed "
    "struct{status,priority} and a split-token array to exercise the "
    "nested surface CSV cannot carry) -> schema-explicit JSON sink -> "
    "re-read -> per-status integer checksums; aggregates read the values "
    "THROUGH the nested struct/array (meta.status, meta.priority, "
    "size(ptoks)) so nesting itself is what's verified. Oracle computes "
    "the same checksums from the parquet original. Money survives as an "
    "exact DECIMAL(18,2)-cents sum; timestamps as µs min/max.",
)
def q_json_roundtrip(spark: SparkSession, sf_dir: str) -> DataFrame:
    from ai_to_cvent_etl_spark.connectors.files import read_json, write_json

    o = load_table(spark, sf_dir, "orders").select(
        "o_orderkey",
        "o_custkey",
        "o_orderdate",
        "o_totalprice",
        F.struct(
            F.col("o_orderstatus").alias("status"),
            F.col("o_orderpriority").alias("priority"),
        ).alias("meta"),
        F.split("o_orderpriority", "-").alias("ptoks"),
    )
    path = _rt_dir(sf_dir, "json")
    write_json(o, path)
    back = read_json(spark, path, o.schema)
    return back.groupBy(F.col("meta.status").alias("status")).agg(
        F.count(F.lit(1)).alias("n"),
        F.countDistinct(F.col("meta.priority")).alias("n_prio"),
        F.sum("o_custkey").alias("cust_sum"),
        F.sum(
            (F.col("o_totalprice").cast("decimal(18,2)") * 100).cast("bigint")
        ).alias("price_cents_sum"),
        F.min("o_orderdate").alias("date_min"),
        F.max("o_orderdate").alias("date_max"),
        F.sum(F.size("ptoks")).cast("bigint").alias("ptok_sum"),
    )


# ==== from analytics_r3w ===========================================

_PDS_ROWS_PER_PART = 250

_PDS_PARTS = 4

def _make_feed_source():
    """Build the DataSource class lazily (import needs a live pyspark).
    Cited API: pyspark.sql.datasource.DataSource (public since Spark 4.0)."""
    from pyspark.sql.datasource import (
        DataSource,
        DataSourceReader,
        InputPartition,
    )

    class FeedReader(DataSourceReader):
        def __init__(self, options):
            self.rows = int(options.get("rows_per_part", _PDS_ROWS_PER_PART))
            self.parts = int(options.get("parts", _PDS_PARTS))

        def partitions(self):
            return [InputPartition(i) for i in range(self.parts)]

        def read(self, partition):
            base = partition.value * self.rows
            for i in range(self.rows):
                rid = base + i
                yield (rid, partition.value, (rid * 2654435761) % 1000003)

    class FeedSource(DataSource):
        @classmethod
        def name(cls):
            return "synthetic_feed"

        def schema(self):
            return "rec_id bigint, part int, payload bigint"

        def reader(self, schema):
            return FeedReader(self.options)

    return FeedSource

@register(
    "q_python_datasource",
    oracle=f"""
        SELECT g.g AS rec_id,
               CAST(g.g // {_PDS_ROWS_PER_PART} AS INT) AS part,
               (g.g * 2654435761) % 1000003 AS payload
        FROM generate_series(0, {_PDS_PARTS * _PDS_ROWS_PER_PART - 1}) g(g)
    """,
    section="S9",
    doc="The Spark 4 Python DataSource API (user-defined connector "
    "surface): a custom partitioned batch source — partitions() "
    "declares 4 independent InputPartitions, read(partition) yields "
    "that shard's rows — registered via spark.dataSource.register and "
    "consumed with spark.read.format('synthetic_feed'). The emitted "
    "feed is a closed-form integer sequence (Knuth-hash payload), so "
    "the oracle is a generate_series expression. This is how a REST/"
    "API/queue source that has no JVM connector plugs into the engine: "
    "partitions map to page ranges or topic partitions, and the "
    "Python boundary is paid per partition batch, not per row.",
)
def q_python_datasource(spark: SparkSession, sf_dir: str) -> DataFrame:
    spark.dataSource.register(_make_feed_source())
    return (
        spark.read.format("synthetic_feed")
        .option("rows_per_part", _PDS_ROWS_PER_PART)
        .option("parts", _PDS_PARTS)
        .load()
    )


@register(
    "q_scan_partition_pruning",
    oracle="""
        SELECT o_orderpriority,
               CAST(COUNT(*) AS BIGINT) AS n,
               CAST(SUM(o_custkey) AS BIGINT) AS cust_sum,
               CAST(SUM(CAST(CAST(o_totalprice AS DECIMAL(18,2)) * 100
                             AS BIGINT)) AS BIGINT) AS price_cents_sum
        FROM orders
        WHERE o_orderstatus = 'O'
        GROUP BY o_orderpriority
    """,
    section="S13",
    doc="Hive-style partitioned write + partition-PRUNED read: orders is "
    "rewritten partitionBy(o_orderstatus) into scratch parquet (3 "
    "directories), read back, and filtered on the partition column — "
    "the filter resolves against DIRECTORY NAMES at planning time "
    "(PartitionFilters in the scan node, pinned by "
    "tests/test_plan_shape.py), so non-matching partitions are never "
    "opened. The oracle computes the same aggregate from the "
    "unpartitioned source, proving the partition round-trip loses "
    "nothing (the partition column is reconstructed from directory "
    "names with identical values/types). THE table-layout device at "
    "100 TB: date/tenant-partitioned facts turn full scans into "
    "touched-partition scans, complementing pushed-down row-group "
    "pruning (S2) which still opens every file. Partition count here "
    "is 3; the docstring contract is the usual one — partition by "
    "columns whose cardinality is bounded (date, status, tenant), "
    "never by high-cardinality keys (small-files explosion, E14's "
    "compaction diagnostic).",
)
def q_scan_partition_pruning(spark: SparkSession, sf_dir: str) -> DataFrame:
    orders = load_table(spark, sf_dir, "orders")
    path = _rt_dir(sf_dir, "part")
    (
        orders.write.mode("overwrite")
        .partitionBy("o_orderstatus")
        .parquet(path)
    )
    back = spark.read.parquet(path)
    return (
        back.filter(F.col("o_orderstatus") == "O")
        .groupBy("o_orderpriority")
        .agg(
            F.count(F.lit(1)).cast("bigint").alias("n"),
            F.sum("o_custkey").cast("bigint").alias("cust_sum"),
            F.sum(
                F.expr(
                    "cast(cast(o_totalprice as decimal(18,2)) * 100 "
                    "as bigint)"
                )
            )
            .cast("bigint")
            .alias("price_cents_sum"),
        )
    )


@register(
    "q_scan_schema_evolution",
    oracle="""
        WITH unioned AS (
            SELECT o_orderkey, o_custkey, o_totalprice,
                   CAST(NULL AS VARCHAR) AS o_orderpriority
            FROM orders WHERE o_orderkey % 2 = 0
            UNION ALL
            SELECT o_orderkey, o_custkey, o_totalprice, o_orderpriority
            FROM orders WHERE o_orderkey % 2 = 1
        )
        SELECT COALESCE(o_orderpriority, '<pre-migration>') AS priority,
               CAST(COUNT(*) AS BIGINT) AS n,
               CAST(SUM(CAST(CAST(o_totalprice AS DECIMAL(18,2)) * 100
                             AS BIGINT)) AS BIGINT) AS price_cents_sum
        FROM unioned
        GROUP BY 1
    """,
    section="S14",
    doc="Parquet schema evolution via mergeSchema: two batches are "
    "written with DIFFERENT schemas (the 'old' batch lacks "
    "o_orderpriority — a column added mid-stream, the most common "
    "lakehouse migration), then read as one dataset with "
    "mergeSchema=true — the unified schema is the field union and "
    "old-batch rows surface NULL for the added column (coalesced to a "
    "sentinel so the pre-migration mass is visible in the output). "
    "The oracle builds the same union with an explicit NULL column, "
    "proving merge semantics add no rows, lose no rows, and type the "
    "missing column correctly. Scale: schema merging reads FOOTERS "
    "only (one pass over file metadata at planning; "
    "spark.sql.parquet.mergeSchema stays off globally and is enabled "
    "per-read here because footer-merging every read of a 10k-file "
    "table is pure overhead once the schema is settled — the "
    "documented contract is merge-on-migrate, pin-schema-after).",
)
def q_scan_schema_evolution(spark: SparkSession, sf_dir: str) -> DataFrame:
    orders = load_table(spark, sf_dir, "orders")
    path = _rt_dir(sf_dir, "evolve")
    old = orders.filter(F.col("o_orderkey") % 2 == 0).select(
        "o_orderkey", "o_custkey", "o_totalprice"
    )
    new = orders.filter(F.col("o_orderkey") % 2 == 1).select(
        "o_orderkey", "o_custkey", "o_totalprice", "o_orderpriority"
    )
    old.write.mode("overwrite").parquet(path + "/batch=0")
    new.write.mode("overwrite").parquet(path + "/batch=1")
    back = spark.read.option("mergeSchema", "true").parquet(path)
    return (
        back.groupBy(
            F.coalesce(F.col("o_orderpriority"), F.lit("<pre-migration>")).alias(
                "priority"
            )
        )
        .agg(
            F.count(F.lit(1)).cast("bigint").alias("n"),
            F.sum(
                F.expr(
                    "cast(cast(o_totalprice as decimal(18,2)) * 100 "
                    "as bigint)"
                )
            )
            .cast("bigint")
            .alias("price_cents_sum"),
        )
    )


_META_AUDIT_TABLES = ("orders", "lineitem", "part")


@register(
    "q_scan_metadata_audit",
    oracle=" UNION ALL ".join(
        f"""
        SELECT '{t}' AS tbl,
               CAST(COUNT(*) AS BIGINT) AS n_rows,
               CAST(COUNT(*) AS BIGINT) AS row_index_span
        FROM {t}"""
        for t in _META_AUDIT_TABLES
    ),
    section="S15",
    doc="Scan-integrity audit via Spark's hidden `_metadata` parquet "
    "columns: per source file, the scanned row count AND "
    "max(_metadata.row_index)+1 are two independent paths to the same "
    "number (a mismatch means the scanner dropped or duplicated rows "
    "within a file). The per-file spans roll up to table grain — "
    "sum(span) == count(*) iff EVERY file's row_index is dense — so the "
    "audit is layout-independent (r6: the full sf1 sweep caught the old "
    "per-file output diverging from the oracle's table-view grain on "
    "multi-file directories). Pins the `_metadata.file_name` / "
    "`_metadata.row_index` API surface (Spark 3.5+) that incremental "
    "loaders and CDC readers key on; map-side count per file, no shuffle "
    "beyond the tiny per-file rollup.",
)
def q_scan_metadata_audit(spark: SparkSession, sf_dir: str) -> DataFrame:
    from ai_to_cvent_etl_spark.io import table_path

    parts = []
    for t in _META_AUDIT_TABLES:
        df = spark.read.parquet(table_path(sf_dir, t))
        per_file = df.groupBy(
            F.lit(t).alias("tbl"),
            F.col("_metadata.file_name").alias("file_name"),
        ).agg(
            F.count(F.lit(1)).cast("bigint").alias("n_rows"),
            (F.max("_metadata.row_index") + 1)
            .cast("bigint")
            .alias("row_index_span"),
        )
        parts.append(
            per_file.groupBy("tbl").agg(
                F.sum("n_rows").cast("bigint").alias("n_rows"),
                F.sum("row_index_span").cast("bigint").alias(
                    "row_index_span"
                ),
            )
        )
    out = parts[0]
    for p in parts[1:]:
        out = out.unionByName(p)
    return out
