#!/usr/bin/env python3
"""Widened scale-stress runner: measure keys at one SF dir, cold+warm via
the noop sink, and MERGE into an existing STRESS_*.json artifact (the
r4/r5 tools overwrote their --out with only the keys given, which forced
all-or-nothing re-runs; this one extends the artifact incrementally).

Ratios vs the STRESS_SF1.json sf1 warm baseline are recomputed for every
merged key when --ratio-vs-sf1 is set (used by the sf3/sf10 sweeps, where
N x sf1 data -> warm ratio <= ~N reads linear-or-better).

Usage:
  python tools/stress_merge.py --keys k1,k2 --sf-dir .data/sf1 \
      --out STRESS_SF1.json --label sf1 --also-small /root/testdata/sf0.1
  python tools/stress_merge.py --keys k1,k2 --sf-dir .data/sf10 \
      --out STRESS_SF10.json --ratio-vs-sf1
"""

from __future__ import annotations

import argparse
import json
import os
import sys
import time

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, REPO)


def _cleanup():
    # Drop cached DFs AND lingering localCheckpoint RDDs between keys:
    # one shared session across ~40 heavy keys otherwise accumulates
    # checkpointed partitions until GC pressure inflates later keys'
    # times (observed: warm > cold on keys measured late in a pass).
    from ai_to_cvent_etl_spark.io import clear_df_caches

    clear_df_caches()  # memoized checkpointed frames would dangle (io.py)
    _SPARK.catalog.clearCache()
    jmap = _SPARK.sparkContext._jsc.getPersistentRDDs()
    it = jmap.entrySet().iterator()
    while it.hasNext():
        it.next().getValue().unpersist(False)


# SF-scaled shuffle partitions (r6 VERDICT task 1): a fixed 32/64 at sf10
# makes each reduce partition 10x the sf1 bytes and pushes the single-JVM
# stress runs into spill/GC — which is a protocol artifact, not a plan
# property (a real cluster sizes partitions to the data). AQE coalesces
# small partitions, so over-provisioning is safe.
_SF_PARTITIONS = {"sf0.1": 32, "sf1": 64, "sf3": 96, "sf10": 256}


def _partitions_for(sf_dir: str) -> int:
    return _SF_PARTITIONS.get(
        os.path.basename(os.path.normpath(sf_dir)), 64)


def _run(queries, key, sf_dir):
    _SPARK.conf.set(
        "spark.sql.shuffle.partitions", str(_partitions_for(sf_dir)))
    # loadavg sampled BEFORE the measurement: a warm ratio measured on a
    # busy box is noise, not signal (r7's one attempted graph stress run
    # was contention-poisoned and discarded) — the artifact must carry the
    # evidence to tell the two apart.
    rec = {"loadavg_1m_start": round(os.getloadavg()[0], 2)}
    for label in ("cold", "warm"):
        _cleanup()
        t0 = time.perf_counter()
        queries[key](_SPARK, sf_dir).write.format("noop").mode(
            "overwrite"
        ).save()
        rec[label] = round(time.perf_counter() - t0, 3)
    return rec


def main() -> int:
    ap = argparse.ArgumentParser()
    ap.add_argument("--keys", required=True)
    ap.add_argument("--sf-dir", required=True)
    ap.add_argument("--out", required=True)
    ap.add_argument("--label", default=None,
                    help="nested label for the measured dir (STRESS_SF1 "
                    "format: {key: {label: {cold,warm}}}); default flat "
                    "cold/warm at top level (STRESS_SF3/SF10 format)")
    ap.add_argument("--also-small", default=None,
                    help="additionally measure this dir (e.g. sf0.1) and "
                    "record under its basename + warm_ratio big/small")
    ap.add_argument("--ratio-vs-sf1", action="store_true",
                    help="record warm_ratio_vs_sf1 from STRESS_SF1.json")
    ap.add_argument("--shuffle-partitions", type=int, default=64)
    args = ap.parse_args()

    from pyspark.sql import SparkSession

    global _SPARK
    _SPARK = (
        SparkSession.builder.master("local[32]")
        .config("spark.sql.shuffle.partitions",
                str(args.shuffle_partitions))
        .config("spark.sql.adaptive.enabled", "true")
        .config("spark.driver.memory", "24g")
        .appName("stress_merge")
        .getOrCreate()
    )
    _SPARK.sparkContext.setLogLevel("ERROR")

    import __spark_entry__ as entry

    queries = entry.queries()
    keys = [k for k in args.keys.split(",") if k]
    unknown = [k for k in keys if k not in queries]
    if unknown:
        print(f"unknown keys: {unknown}", file=sys.stderr)
        return 2

    out = {}
    if os.path.exists(args.out):
        out = json.load(open(args.out))
    sf1 = {}
    p1 = os.path.join(REPO, "STRESS_SF1.json")
    if args.ratio_vs_sf1 and os.path.exists(p1):
        sf1 = json.load(open(p1))

    # footer/file-index warmup for each dir measured
    dirs = [args.sf_dir] + ([args.also_small] if args.also_small else [])
    for d in dirs:
        _SPARK.read.parquet(os.path.join(d, "lineitem.parquet")).write.format(
            "noop"
        ).mode("overwrite").save()

    for key in keys:
        try:
            big = _run(queries, key, args.sf_dir)
        except Exception as exc:
            print(f"{key} FAILED at {args.sf_dir}: {exc}", file=sys.stderr)
            # ADVICE r6: merge the error alongside any previously recorded
            # good measurements instead of clobbering them.
            rec = out.get(key, {})
            rec["error"] = str(exc)[:300]
            out[key] = rec
            json.dump(out, open(args.out, "w"), indent=1, sort_keys=True)
            continue
        if args.label:
            rec = out.get(key, {})
            rec[args.label] = big
            if args.also_small:
                small_label = os.path.basename(
                    os.path.normpath(args.also_small))
                rec[small_label] = _run(queries, key, args.also_small)
                w0 = rec[small_label]["warm"]
                rec["warm_ratio"] = (
                    round(big["warm"] / w0, 2) if w0 else None)
            out[key] = rec
        else:
            rec = dict(big)
            if args.ratio_vs_sf1:
                w1 = sf1.get(key, {}).get("sf1", {}).get("warm")
                rec["sf1_warm"] = w1
                rec["warm_ratio_vs_sf1"] = (
                    round(big["warm"] / w1, 2) if w1 else None)
            out[key] = rec
        print(key, json.dumps(out[key]), flush=True)
        json.dump(out, open(args.out, "w"), indent=1, sort_keys=True)
    print(f"-> {args.out}")
    return 0


if __name__ == "__main__":
    sys.exit(main())
