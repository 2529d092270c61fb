#!/usr/bin/env python3
"""sf3-only stress runs: cold+warm wall per key at .data/sf3, merged into
STRESS_SF3.json. Ratios vs the recorded sf1 warm times (STRESS_SF1.json)
extend the measured scaling decade to 30x sf0.1."""

from __future__ import annotations

import argparse
import json
import os
import sys
import time

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, REPO)


def main() -> int:
    ap = argparse.ArgumentParser()
    ap.add_argument("--keys", required=True)
    ap.add_argument("--sf-dir", default=os.path.join(REPO, ".data/sf3"))
    ap.add_argument("--out", default=os.path.join(REPO, "STRESS_SF3.json"))
    args = ap.parse_args()

    from pyspark.sql import SparkSession

    spark = (
        SparkSession.builder.master("local[32]")
        .config("spark.sql.shuffle.partitions", "64")
        .config("spark.sql.adaptive.enabled", "true")
        .config("spark.driver.memory", "16g")
        .getOrCreate()
    )
    import __spark_entry__ as entry

    queries = entry.queries()
    sf1 = {}
    p1 = os.path.join(REPO, "STRESS_SF1.json")
    if os.path.exists(p1):
        sf1 = json.load(open(p1))
    out = {}
    if os.path.exists(args.out):
        out = json.load(open(args.out))
    for key in args.keys.split(","):
        rec = {}
        for label in ("cold", "warm"):
            t0 = time.perf_counter()
            queries[key](spark, args.sf_dir).write.format("noop").mode(
                "overwrite"
            ).save()
            rec[label] = round(time.perf_counter() - t0, 3)
        w1 = sf1.get(key, {}).get("sf1", {}).get("warm")
        rec["sf1_warm"] = w1
        rec["warm_ratio_vs_sf1"] = (
            round(rec["warm"] / w1, 2) if w1 else None
        )
        out[key] = rec
        print(key, json.dumps(rec), flush=True)
        json.dump(out, open(args.out, "w"), indent=2, sort_keys=True)
    return 0


if __name__ == "__main__":
    sys.exit(main())
