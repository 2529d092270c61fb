#!/usr/bin/env python3
"""Build-vs-exec probe: split each key's warm wall time into driver-side
plan CONSTRUCTION (the builder call — py4j Column round trips, analysis)
and EXECUTION (the noop save of a pre-built frame).

Methodology matches bench.py (same session shape, noop sink, warmup scan).
For each key, after one cold end-to-end run:
  build_s = median of N timed ``builder(spark, sf_dir)`` calls (no action)
  exec_s  = median of N timed ``df.write.format('noop')`` saves of a frame
            built OUTSIDE the timed region
so build_s + exec_s ~= the bench's warm number and the ratio shows where
the time goes (guide §1: measure first; §7.3: plan-construction is
driver-side single-threaded work).

Usage:
  python tools/buildprobe.py all [--repeats 3] [--sf-dir DIR] [--out FILE]
  python tools/buildprobe.py key1,key2,...
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
    ap.add_argument(
        "--sf-dir",
        default=os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1"),
    )
    ap.add_argument("--out", default=None)
    args = ap.parse_args()

    from ai_to_cvent_etl_spark.registry import load_registry
    from ai_to_cvent_etl_spark.session import get_spark

    spark = get_spark(app_name="buildprobe", shuffle_partitions=32)
    spark.sparkContext.setLogLevel("ERROR")
    registry = load_registry()
    if args.keys == "all":
        keys = sorted(registry)
    else:
        keys = [k for k in args.keys.split(",") if k]
        unknown = [k for k in keys if k not in registry]
        if unknown:
            print(f"unknown keys: {unknown}", file=sys.stderr)
            sys.exit(2)

    spark.read.parquet(os.path.join(args.sf_dir, "lineitem.parquet")).write.format(
        "noop"
    ).mode("overwrite").save()

    out: dict[str, dict] = {}
    for key in keys:
        spark.sparkContext.setJobDescription(f"buildprobe:{key}")
        try:
            # cold end-to-end (primes plan caches, codegen)
            t0 = time.perf_counter()
            registry[key].builder(spark, args.sf_dir).write.format("noop").mode(
                "overwrite"
            ).save()
            cold = time.perf_counter() - t0

            builds, execs = [], []
            for _ in range(args.repeats):
                t0 = time.perf_counter()
                df = registry[key].builder(spark, args.sf_dir)
                builds.append(time.perf_counter() - t0)
                t0 = time.perf_counter()
                df.write.format("noop").mode("overwrite").save()
                execs.append(time.perf_counter() - t0)
            b = sorted(builds)[len(builds) // 2]
            e = sorted(execs)[len(execs) // 2]
            out[key] = {
                "cold": round(cold, 3),
                "build": round(b, 3),
                "exec": round(e, 3),
                "build_frac": round(b / (b + e), 3) if (b + e) > 0 else None,
            }
            print(
                f"{key}: cold={cold:.3f} build={b:.3f} exec={e:.3f}",
                file=sys.stderr,
            )
        except Exception as exc:
            out[key] = {"error": str(exc)[:200]}
            print(f"{key}: FAILED {exc}", file=sys.stderr)

    try:
        load = [round(x, 2) for x in os.getloadavg()]
    except OSError:
        load = None
    doc = {"queries": out, "loadavg": load, "sf_dir": args.sf_dir,
           "repeats": args.repeats}
    line = json.dumps(doc)
    if args.out:
        with open(args.out, "w") as fh:
            fh.write(line)
    print(line)


if __name__ == "__main__":
    main()
