"""SparkSession factory.

Design for a 1000-executor cluster, test on local[N]: everything here is
config, not code — AQE on (runtime re-planning, skew-join splitting,
partition coalescing), Arrow on (vectorized Python boundary), low shuffle
partitions for the tiny local scale factors (at sf<=0.1 the 200-partition
default dominates wall-time; on a real cluster this is overridden per-job).
"""

from __future__ import annotations

import os
import shutil
import tempfile

from pyspark.sql import SparkSession

_SHIPPED_APPS: set[str] = set()


def ensure_worker_imports(spark: SparkSession) -> None:
    """Ship this package to executor Python workers via ``addPyFile``.

    Declared queries carry Python UD*F / mapInPandas closures that cloudpickle
    serializes BY REFERENCE (they are module-level objects of an importable
    package), so every worker must be able to ``import ai_to_cvent_etl_spark``.
    The driver that invokes ``__spark_entry__`` owns the SparkSession and may
    run from any cwd, so we distribute a zip of the package exactly as a real
    cluster deployment would (``spark-submit --py-files``). Idempotent per
    application."""
    ctx = spark.sparkContext
    app_id = ctx.applicationId
    if app_id in _SHIPPED_APPS:
        return
    pkg_dir = os.path.dirname(os.path.abspath(__file__))
    tmp = tempfile.mkdtemp(prefix="ai_to_cvent_etl_spark_pyfiles_")
    zip_path = shutil.make_archive(
        os.path.join(tmp, "ai_to_cvent_etl_spark"),
        "zip",
        root_dir=os.path.dirname(pkg_dir),
        base_dir=os.path.basename(pkg_dir),
    )
    ctx.addPyFile(zip_path)
    _SHIPPED_APPS.add(app_id)


def get_spark(
    app_name: str = "ai-to-cvent-etl-spark",
    shuffle_partitions: int | None = None,
) -> SparkSession:
    """Create (or get) a SparkSession tuned for the local test harness."""
    cpus = os.environ.get("SPARK_GRAFT_CPUS", "*")
    if shuffle_partitions is None:
        shuffle_partitions = int(os.environ.get("SPARK_GRAFT_SHUFFLE", "32"))
    # r8 (guide §6/§2.5): FLOOR on scan parallelism, derived from the
    # session's core count (never a constant). The test fixtures are
    # single-digit-MB parquet files, so with the default 128 MB
    # maxPartitionBytes every scan is ONE split and every map stage up to
    # the first exchange runs single-threaded — measured 27.5 s -> 15.7 s
    # over 7 representative keys at sf0.1 just from this floor. On a real
    # cluster a 100 TB scan yields ~10^5 natural splits, far above any
    # sane core count, so the floor is inert there by construction; it only
    # engages exactly where the pathology lives (input much smaller than
    # the cluster's parallelism).
    try:
        scan_floor = int(cpus)
    except ValueError:  # "*" = all cores
        scan_floor = os.cpu_count() or 8
    builder = (
        SparkSession.builder.master(f"local[{cpus}]")
        .appName(app_name)
        .config("spark.sql.shuffle.partitions", str(shuffle_partitions))
        .config("spark.sql.files.minPartitionNum", str(scan_floor))
        # r8 (guide §7.2, duplicated-subtree check): InferFiltersFromGenerate
        # synthesizes `size(arr) > 0 AND isnotnull(arr)` above every
        # explode and pushes it below the projection that BUILDS arr,
        # inlining the whole array expression into the filter — evaluated
        # twice there plus once in the project. This engine's exploded
        # arrays are built by higher-order functions (transform/filter
        # lambdas: shingles, minhash band keys, prefix slices) that run
        # INTERPRETED, so the duplication tripled the dominant cost of
        # every explode-of-computed-array plan (q_text_contamination
        # 3.97 -> 1.02 s, q_text_boilerplate_ngrams 6.52 -> 1.50 s warm at
        # sf0.1). The rule only adds redundant row-pruning (Generate
        # drops empty arrays in the same stage anyway); excluding it never
        # changes results, and plans that NEED early pruning state an
        # explicit .where. Scale-neutral: the trade (2 extra interpreted
        # evaluations vs skipping already-cheap empty rows) is the same at
        # any data size.
        .config(
            "spark.sql.optimizer.excludedRules",
            "org.apache.spark.sql.catalyst.optimizer.InferFiltersFromGenerate",
        )
        .config("spark.sql.adaptive.enabled", "true")
        .config("spark.sql.adaptive.coalescePartitions.enabled", "true")
        .config("spark.sql.adaptive.skewJoin.enabled", "true")
        .config("spark.sql.session.timeZone", "UTC")
        .config("spark.sql.execution.arrow.pyspark.enabled", "true")
        .config("spark.driver.memory", os.environ.get("SPARK_GRAFT_DRIVER_MEM", "8g"))
        .config("spark.ui.enabled", "false")
        .config("spark.sql.parquet.filterPushdown", "true")
    )
    return builder.getOrCreate()
