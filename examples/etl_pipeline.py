"""End-to-end ETL example: the reference system's daily job, Spark-first.

Extract events from the source table, normalize and deduplicate, diff
against the previous load, and push the changes to the target system through
the batched REST sink — the complete extract-transform-load loop this engine
replaces. Run:

    python examples/etl_pipeline.py [sf_dir] [out_dir]

Everything here is the public package API; swap LocalFileTransport for an
HTTP transport and the parquet staging dir for the warehouse path and this
is the production job.
"""

from __future__ import annotations

import os
import sys
import tempfile

REPO_ROOT = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
if REPO_ROOT not in sys.path:
    sys.path.insert(0, REPO_ROOT)


def run(sf_dir: str, out_dir: str) -> dict:
    from pyspark.sql import Window
    from pyspark.sql import functions as F

    from ai_to_cvent_etl_spark.connectors import write_parquet
    from ai_to_cvent_etl_spark.connectors.rest import (
        LocalFileTransport,
        RestBatchSink,
    )
    from ai_to_cvent_etl_spark.io import load_table
    from ai_to_cvent_etl_spark.session import get_spark

    spark = get_spark(app_name="etl-example")
    spark.sparkContext.setLogLevel("ERROR")

    # EXTRACT: source events
    events = load_table(spark, sf_dir, "events")

    # TRANSFORM: normalize + latest-record-per-key compaction (CDC upsert)
    w = Window.partitionBy("user_id").orderBy(
        F.col("ts").desc(), F.col("event_id").desc()
    )
    current = (
        events.select(
            "event_id",
            "ts",
            "user_id",
            F.upper("event_type").alias("event_type"),
            F.round("value", 2).alias("value"),
        )
        .withColumn("rn", F.row_number().over(w))
        .filter("rn = 1")
        .drop("rn")
    )

    # DIFF against the previous load (first run: empty previous -> all inserts)
    staging = os.path.join(out_dir, "staging")
    prev_path = os.path.join(staging, "current")
    if os.path.exists(prev_path):
        prev = spark.read.parquet(prev_path)
        changes = current.join(prev.select("user_id", F.col("event_id").alias("prev_event_id")), "user_id", "left").filter(
            F.col("prev_event_id").isNull() | (F.col("event_id") != F.col("prev_event_id"))
        ).drop("prev_event_id")
    else:
        changes = current

    # LOAD: batched REST push from the executors, THEN refresh the staging
    # snapshot. `changes` reads the previous snapshot lazily, so every action
    # on it must happen before the overwrite (in production: write the new
    # snapshot to a versioned path and swap a pointer instead).
    rest_out = os.path.join(out_dir, "rest")
    n_pushed = changes.count()
    RestBatchSink(lambda: LocalFileTransport(rest_out), batch_size=200).write(
        changes.select("event_id", "user_id", "event_type", "value")
    )
    write_parquet(current, prev_path)

    return {
        "source_rows": events.count(),
        "current_rows": current.count(),
        "pushed_rows": n_pushed,
        "rest_dir": rest_out,
    }


if __name__ == "__main__":
    sf = sys.argv[1] if len(sys.argv) > 1 else "/root/testdata/sf0.001"
    out = sys.argv[2] if len(sys.argv) > 2 else tempfile.mkdtemp(prefix="etl_example_")
    stats = run(sf, out)
    print(stats)
