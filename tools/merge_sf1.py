#!/usr/bin/env python3
"""Merge the 4-part full-inventory sf1 sweep (+ later patch runs) into
CORRECTNESS_SF1.json (VERDICT r5 task 2).

Usage: python tools/merge_sf1.py OUT part1.json part2.json ... patchN.json

Later files OVERRIDE earlier ones per key (patch runs re-verify keys whose
implementation changed after a part ran). The summary block is recomputed
from the merged per-key map.
"""

from __future__ import annotations

import json
import sys


def main() -> None:
    out_path, *parts = sys.argv[1:]
    merged: dict = {}
    sf_dir = None
    wall = 0.0
    for p in parts:
        d = json.load(open(p))
        sf_dir = d.get("sf_dir", sf_dir)
        wall += d.get("wall_s", 0.0)
        merged.update(d.get("queries", {}))
    n_hash = sum(1 for v in merged.values() if v.get("hash_match") is True)
    n_rows_only = sum(
        1 for v in merged.values() if v.get("err") == "no_oracle"
    )
    n_fail = sum(
        1
        for v in merged.values()
        if v.get("err") not in (None, "no_oracle")
        or v.get("hash_match") is False
    )
    out = {
        "sf_dir": sf_dir,
        "n_queries": len(merged),
        "n_hash_match": n_hash,
        "n_rows_only": n_rows_only,
        "n_fail": n_fail,
        "wall_s": round(wall, 1),
        "queries": dict(sorted(merged.items())),
    }
    json.dump(out, open(out_path, "w"), indent=1, sort_keys=False)
    print(
        f"{out_path}: {len(merged)} keys, {n_hash} hash, "
        f"{n_rows_only} rows-only, {n_fail} fail"
    )


if __name__ == "__main__":
    main()
