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
    # Tally semantics mirror selfcheck.py (r8): a hash-skipped giant-output
    # key (err=hash_skipped_rows_exceed_N) passes its weaker rows+schema
    # gate as rows-only; a no-oracle sketch key passes only while its
    # measured error stays within the published bound; vacuous exact keys
    # never count as passes.
    n_hash = sum(
        1 for v in merged.values()
        if v.get("hash_match") is True and not v.get("vacuous")
    )

    def _rows_only(v: dict) -> bool:
        if v.get("err") == "no_oracle":
            return v.get("within_bound") is not False
        return (
            str(v.get("err") or "").startswith("hash_skipped")
            and v.get("rows_match") is True
            and v.get("schema_match") is True
            and not v.get("vacuous")
        )

    n_rows_only = sum(1 for v in merged.values() if _rows_only(v))
    n_fail = len(merged) - n_hash - n_rows_only
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
