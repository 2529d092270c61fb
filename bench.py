"""BENCH harness: run every declared query at $SPARK_GRAFT_SF_DIR (default
/root/testdata/sf0.1) on local[$SPARK_GRAFT_CPUS] and print ONE JSON line.

Each query is materialized through the noop sink (full computation, no
collect-to-driver cost, no count()-only plan pruning). A warmup query runs
first so JVM/codegen startup is not attributed to the first query.

The cold pass pays ~0.45 s/query of fixed planning/codegen overhead
(BASELINE.md), which at sf0.1 dominates most queries and masks real
round-over-round deltas. So EVERY query gets a second, warm run (plan +
parquet footers cached, r6); those times are reported under
"warm_queries" and their median under "warm_median" — the numbers to
compare across rounds. The headline "value" stays the cold full-suite
wall time for continuity with r1-r3.
"""

from __future__ import annotations

import json
import os
import sys
import time

REPO_ROOT = os.path.dirname(os.path.abspath(__file__))
if REPO_ROOT not in sys.path:
    sys.path.insert(0, REPO_ROOT)


def main() -> None:
    sf_dir = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    from ai_to_cvent_etl_spark.registry import load_registry
    from ai_to_cvent_etl_spark.session import get_spark

    spark = get_spark(app_name="bench", shuffle_partitions=32)
    spark.sparkContext.setLogLevel("ERROR")
    registry = load_registry()

    # Warmup: JVM, codegen, parquet footer caches.
    spark.read.parquet(os.path.join(sf_dir, "lineitem.parquet")).write.format(
        "noop"
    ).mode("overwrite").save()

    timings: dict[str, float] = {}
    t_suite = time.perf_counter()
    for key in sorted(registry):
        spec = registry[key]
        t0 = time.perf_counter()
        try:
            spec.builder(spark, sf_dir).write.format("noop").mode("overwrite").save()
            timings[key] = round(time.perf_counter() - t0, 3)
        except Exception as exc:  # a failing query shows as -1, never crashes BENCH
            timings[key] = -1.0
            print(f"bench: {key} failed: {exc}", file=sys.stderr)
    total = round(time.perf_counter() - t_suite, 3)

    # Warm pass (r6): re-run with plans/footers hot so the data-dependent
    # cost is visible per query — round-over-round regression detection
    # diffs these, not the noisy cold numbers whose ~0.45 s/query planning
    # constant masks real deltas. SPARK_GRAFT_WARM=all re-runs EVERY key
    # (the committed BENCH_SELF artifacts use this; roughly doubles the
    # suite wall); the default 'tail' warms only keys whose cold time
    # clears the planning constant, keeping the driver's per-round run at
    # its historical cost.
    warm_all = os.environ.get("SPARK_GRAFT_WARM", "tail") == "all"
    # r7 (VERDICT r6 task 5): the r6 driver tail drifted +31% median on
    # untouched keys while the same-protocol self-bench measured 1.02 —
    # single-shot warm numbers are noise-bound under machine load.
    # SPARK_GRAFT_WARM_REPEATS=3 records the per-key MEDIAN of 3 warm runs
    # (the committed BENCH_SELF artifacts use this); default 1 keeps the
    # driver's per-round cost unchanged.
    repeats = max(1, int(os.environ.get("SPARK_GRAFT_WARM_REPEATS", "1")))
    warm: dict[str, float] = {}
    for key, cold in timings.items():
        if cold < 0 or (not warm_all and cold < 0.7):
            continue
        runs = []
        try:
            for _ in range(repeats):
                t0 = time.perf_counter()
                registry[key].builder(spark, sf_dir).write.format(
                    "noop"
                ).mode("overwrite").save()
                runs.append(time.perf_counter() - t0)
            warm[key] = round(sorted(runs)[len(runs) // 2], 3)
        except Exception:
            warm[key] = -1.0
    warm_ok = sorted(v for v in warm.values() if v >= 0)
    warm_median = (
        round(warm_ok[len(warm_ok) // 2], 3) if warm_ok else None
    )

    # Host-speed calibration (r8): the r8 self-bench measured a UNIFORM
    # ~1.35x warm inflation on hundreds of untouched keys vs r6 — host
    # drift, not an engine regression (trivial sub-second keys inflated
    # identically, no positional growth across the pass, vmstat idle).
    # These two fixed workloads give future rounds a code-independent
    # anchor to separate host drift from real regressions: a pure-Python
    # loop (interpreter+CPU) and a fixed JVM-side Spark job (codegen,
    # shuffle, scheduler). Compare calib ratios before reading per-key
    # deltas.
    t0 = time.perf_counter()
    acc = 0
    for i in range(10_000_000):
        acc = (acc + i * i) % 1_000_003
    calib_py = round(time.perf_counter() - t0, 3)
    t0 = time.perf_counter()
    spark.range(0, 20_000_000, 1, 32).selectExpr(
        "id % 97 AS k", "id * 2654435761 % 1000003 AS v"
    ).groupBy("k").sum("v").write.format("noop").mode("overwrite").save()
    calib_spark = round(time.perf_counter() - t0, 3)

    sf = float(os.path.basename(sf_dir.rstrip("/")).replace("sf", "") or 0.1)
    # machine-load marker (r7): 1/5/15-min load averages at exit, so a
    # round-over-round delta can be attributed to background load instead
    # of guessed at. A loaded box shows load1 >> cpu count here.
    try:
        load = [round(x, 2) for x in os.getloadavg()]
    except OSError:
        load = None
    print(
        json.dumps(
            {
                "metric": "declared_suite_wall_time",
                "value": total,
                "unit": "sec",
                "queries": timings,
                "warm_queries": warm,
                "warm_median": warm_median,
                "warm_repeats": repeats,
                "loadavg": load,
                "sf": sf,
                "n_queries": len(timings),
                "calib_python_s": calib_py,
                "calib_spark_s": calib_spark,
            }
        )
    )


if __name__ == "__main__":
    main()
