#!/usr/bin/env python3
"""Scale-stress sweep: measure the most expensive queries at sf0.1 vs sf1.

Turns SCALE.md's asserted linearity into a measurement (r3 VERDICT task 1):
each key runs twice per scale factor through the noop sink (full compute, no
collect); `cold` is the first run (includes planning + codegen), `warm` the
second. The scaling ratio uses WARM times — the 0.4-0.5 s/query fixed
planning constant (BASELINE.md) would otherwise mask the data-dependent
term at these sizes. With 10x rows, warm_ratio <= ~12 reads as linear-or-
better (AQE re-plans, partial aggs, and better parallelism at larger inputs
often make it sublinear); anything >> 10 flags a super-linear operator.

Usage: python tools/stress_sweep.py [--keys k1,k2,...] [--out STRESS_SF1.json]
       [--dirs /root/testdata/sf0.1,.data/sf1]
"""

from __future__ import annotations

import argparse
import json
import os
import sys
import time

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, REPO)

# The 20 most expensive keys of BENCH_r03 plus every family the 100 TB
# claims lean on (dedup, graph, ANN/vector, contamination), per r3 VERDICT.
DEFAULT_KEYS = [
    "q_dedup_minhash_lsh",      # D1  LSH near-dedup (band join + verify)
    "q_dedup_components",       # D5  pointer-doubling connected components
    "q_dedup_cluster_stats",    # D9  cluster rollup over D5 labels
    "q_dedup_cross_corpus",     # D15 bipartite LSH decontamination
    "q_dedup_near_jaccard",     # T5  token self-join near-dup (the brute path)
    "q_dedup_minhash_est",      # D13 minhash Jaccard estimator calibration
    "q_dedup_normalized",       # D16 normalized exact dedup
    "q_dedup_embedding_cosine", # D3  blocked cosine near-dup
    "q_text_contamination",     # L8  eval-contamination scan
    "q_graph_pagerank",         # G1  3-round relational PageRank
    "q_graph_triangles",        # G2  triangle counting
    "q_graph_kcore",            # G5  k-core peel
    "q_graph_label_prop",       # G10 label propagation
    "q_vec_cosine_topk",        # V3  brute-force ANN baseline
    "q_vec_kmeans_ivf",         # V6  learned-IVF ANN
    "q_vec_pq_adc",             # V8  product-quantization ADC
    "q_vec_pca_power",          # V16 relational power iteration
    "q_vec_maxsim",             # V18 ColBERT-style MaxSim
    "q_ann_ivf_topk",           # D4  sign-bit IVF ANN
    "q_ann_lsh_cosine",         # D7  hyperplane-LSH ANN
    "q_join_star_5way",         # flagship broadcast star join
    "q_agg_groupby_pricing",    # TPC-H Q1-style fact scan+agg
    "q_win_topk_per_group",     # windowed top-k
    "q_udtf_table_arg",         # Python-boundary cost pin
]


def main() -> None:
    ap = argparse.ArgumentParser()
    ap.add_argument("--keys", default=",".join(DEFAULT_KEYS))
    ap.add_argument(
        "--dirs",
        default="/root/testdata/sf0.1," + os.path.join(REPO, ".data", "sf1"),
    )
    ap.add_argument("--out", default=os.path.join(REPO, "STRESS_SF1.json"))
    args = ap.parse_args()
    keys = [k for k in args.keys.split(",") if k]
    dirs = args.dirs.split(",")

    from ai_to_cvent_etl_spark.registry import load_registry
    from ai_to_cvent_etl_spark.session import get_spark

    spark = get_spark(app_name="stress_sweep", shuffle_partitions=32)
    spark.sparkContext.setLogLevel("ERROR")
    registry = load_registry()
    unknown = [k for k in keys if k not in registry]
    if unknown:
        print(f"unknown keys: {unknown}", file=sys.stderr)
        sys.exit(2)

    report: dict[str, dict] = {k: {} for k in keys}
    for sf_dir in dirs:
        label = os.path.basename(os.path.normpath(sf_dir))
        # warm the file-index/footer caches so cold times are plan+compute
        spark.read.parquet(os.path.join(sf_dir, "lineitem.parquet")).write.format(
            "noop"
        ).mode("overwrite").save()
        for k in keys:
            times = []
            for _ in range(2):
                t0 = time.perf_counter()
                try:
                    registry[k].builder(spark, sf_dir).write.format("noop").mode(
                        "overwrite"
                    ).save()
                    times.append(round(time.perf_counter() - t0, 3))
                except Exception as exc:
                    times.append(-1.0)
                    print(f"{k} @ {label} FAILED: {exc}", file=sys.stderr)
                    break
            report[k][label] = {"cold": times[0], "warm": times[-1]}
            print(f"{label:6s} {k:28s} cold={times[0]:8.3f} warm={times[-1]:8.3f}")

    if len(dirs) == 2:
        small = os.path.basename(os.path.normpath(dirs[0]))
        big = os.path.basename(os.path.normpath(dirs[1]))
        for k in keys:
            w0 = report[k][small]["warm"]
            w1 = report[k][big]["warm"]
            report[k]["warm_ratio"] = round(w1 / w0, 2) if w0 and w0 > 0 and w1 > 0 else None
    with open(args.out, "w") as f:
        json.dump(report, f, indent=1, sort_keys=True)
    print(f"-> {args.out}")
    if len(dirs) == 2:
        worst = sorted(
            ((r.get("warm_ratio") or 0, k) for k, r in report.items()), reverse=True
        )
        print("worst warm ratios (10x data):")
        for r, k in worst[:8]:
            print(f"  {r:6.2f}  {k}")


if __name__ == "__main__":
    main()
