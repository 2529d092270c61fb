#!/usr/bin/env python3
"""Per-key micro-bench: time specific declared queries exactly like bench.py.

Same session shape as bench.py (local[$SPARK_GRAFT_CPUS], shuffle
partitions 32, AQE on), same methodology (noop sink, warmup scan first,
cold run then N warm runs, median of warm). Prints one JSON line:
{"queries": {key: {"cold": s, "warm": s, "runs": [...]}}, "loadavg": [...]}.

Usage: python tools/qbench.py key1,key2,... [--repeats 3] [--sf-dir DIR]
"""

from __future__ import annotations

import argparse
import json
import os
import sys
import time

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, REPO)


def main() -> None:
    ap = argparse.ArgumentParser()
    ap.add_argument("keys")
    ap.add_argument("--repeats", type=int, default=3)
    ap.add_argument("--sf-dir", default=os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1"))
    args = ap.parse_args()
    keys = [k for k in args.keys.split(",") if k]

    from ai_to_cvent_etl_spark.registry import load_registry
    from ai_to_cvent_etl_spark.session import get_spark

    spark = get_spark(app_name="qbench", shuffle_partitions=32)
    spark.sparkContext.setLogLevel("ERROR")
    registry = load_registry()
    unknown = [k for k in keys if k not in registry]
    if unknown:
        print(f"unknown keys: {unknown}", file=sys.stderr)
        sys.exit(2)

    spark.read.parquet(os.path.join(args.sf_dir, "lineitem.parquet")).write.format(
        "noop"
    ).mode("overwrite").save()

    out: dict[str, dict] = {}
    for key in keys:
        spark.sparkContext.setJobDescription(f"qbench:{key}")
        t0 = time.perf_counter()
        registry[key].builder(spark, args.sf_dir).write.format("noop").mode(
            "overwrite"
        ).save()
        cold = time.perf_counter() - t0
        runs = []
        for _ in range(args.repeats):
            t0 = time.perf_counter()
            registry[key].builder(spark, args.sf_dir).write.format("noop").mode(
                "overwrite"
            ).save()
            runs.append(round(time.perf_counter() - t0, 3))
        out[key] = {
            "cold": round(cold, 3),
            "warm": sorted(runs)[len(runs) // 2],
            "runs": runs,
        }
        print(f"{key}: cold={cold:.3f} warm={out[key]['warm']:.3f} runs={runs}", file=sys.stderr)
    try:
        load = [round(x, 2) for x in os.getloadavg()]
    except OSError:
        load = None
    print(json.dumps({"queries": out, "loadavg": load, "sf_dir": args.sf_dir}))


if __name__ == "__main__":
    main()
