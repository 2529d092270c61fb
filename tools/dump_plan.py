#!/usr/bin/env python3
"""Dump .explain("formatted") for declared queries to plans/r08/<key>_<tag>.txt.

Usage: python tools/dump_plan.py key1,key2,... --tag before [--sf-dir DIR]
"""

from __future__ import annotations

import argparse
import os
import sys

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, REPO)


def main() -> None:
    ap = argparse.ArgumentParser()
    ap.add_argument("keys")
    ap.add_argument("--tag", required=True)
    ap.add_argument("--sf-dir", default=os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1"))
    ap.add_argument("--outdir", default=os.path.join(REPO, "plans", "r08"))
    args = ap.parse_args()
    keys = [k for k in args.keys.split(",") if k]
    os.makedirs(args.outdir, exist_ok=True)

    from ai_to_cvent_etl_spark.registry import load_registry
    from ai_to_cvent_etl_spark.session import get_spark

    spark = get_spark(app_name="dump_plan", shuffle_partitions=32)
    spark.sparkContext.setLogLevel("ERROR")
    registry = load_registry()
    for key in keys:
        df = registry[key].builder(spark, args.sf_dir)
        plan = df._sc._jvm.PythonSQLUtils.explainString(  # type: ignore[attr-defined]
            df._jdf.queryExecution(), "formatted"
        )
        path = os.path.join(args.outdir, f"{key}_{args.tag}.txt")
        with open(path, "w") as f:
            f.write(plan)
        print(path, file=sys.stderr)


if __name__ == "__main__":
    main()
