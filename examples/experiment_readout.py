"""End-to-end experiment readout: the engine's experimentation suite
composed as one pipeline.

Plan → validate → read out → tighten, each stage an oracle-checked
declared operator, so the pipeline inherits their cross-engine-exact
semantics and collapsed-count plan shapes:

  1. POWER (A46 q_agg_power_analysis)   — how many users per arm would
     this metric need, at several minimum detectable effects?
  2. SRM   (A48 q_agg_srm_check)        — are the observed arms consistent
     with the designed 50/50 split? (If not, STOP — nothing downstream
     is interpretable.)
  3. READOUT (A47 q_agg_two_proportion_z) — the conversion z. On this
     fixture the split is an A/A by construction, so z ≈ 0 is itself
     the harness check.
  4. RATIO (A44 q_agg_ratio_ci)         — the revenue-per-order CI with
     the delta-method covariance term (the ratio-metric correction).
  5. CUPED (A45 q_agg_cuped)            — how much variance the
     pre-period covariate removes, i.e. how much smaller step 1's
     sample sizes become (divide by 1 − reduction).

Run:

    python examples/experiment_readout.py [sf_dir]

Everything is the public registry API — the same callables the driver
verifies; a real experiment swaps the hash-arm expression for the
assignment column and keys every reduction by (experiment, arm).
"""

from __future__ import annotations

import os
import sys

REPO_ROOT = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
if REPO_ROOT not in sys.path:
    sys.path.insert(0, REPO_ROOT)


def run(sf_dir: str) -> dict:
    from ai_to_cvent_etl_spark.registry import load_registry
    from ai_to_cvent_etl_spark.session import get_spark

    spark = get_spark(app_name="experiment-readout-example")
    spark.sparkContext.setLogLevel("ERROR")
    reg = load_registry()

    def one(key):
        return reg[key].builder(spark, sf_dir).collect()

    out = {}

    print("== 1. power analysis (A46): required n per arm ==")
    rows = one("q_agg_power_analysis")
    for r in sorted(rows, key=lambda r: r["mde_kusd"]):
        print(
            f"   MDE {r['mde_kusd']:>4} k$/cust -> n per arm "
            f"{r['n_per_arm']:>10,}  (metric var {r['metric_variance']:,})"
        )
    out["power"] = rows

    print("== 2. sample-ratio mismatch (A48): is the split healthy? ==")
    (srm,) = one("q_agg_srm_check")
    print(
        f"   arms {srm['n_a']} vs {srm['n_b']}  chi2={srm['chi2']}  "
        f"SRM flag={srm['srm_flag']}"
    )
    out["srm"] = srm.asDict()
    if srm["srm_flag"]:
        print("   !! SRM — readout aborted, investigate assignment/logging")
        spark.stop()
        return out

    print("== 3. conversion readout (A47): two-proportion z (A/A here) ==")
    (ab,) = one("q_agg_two_proportion_z")
    print(
        f"   p_a={ab['p_a']} p_b={ab['p_b']} z={ab['z']}  "
        "(A/A by construction: |z| should be small)"
    )
    out["conversion"] = ab.asDict()

    print("== 4. ratio metric (A44): revenue-per-order CI by segment ==")
    for r in sorted(one("q_agg_ratio_ci"), key=lambda r: r["segment"]):
        print(
            f"   {r['segment']:<12} {r['revenue_per_order']:>12,.2f} "
            f"[{r['ci_lo']:,.2f}, {r['ci_hi']:,.2f}]"
        )

    print("== 5. CUPED (A45): variance reduction from the pre-period ==")
    (c,) = one("q_agg_cuped")
    red = c["variance_reduction"]
    print(
        f"   theta={c['theta']}  var reduction={red:.1%} -> step-1 sample "
        f"sizes shrink by /{1.0 / (1.0 - red):,.3f}"
    )
    out["cuped"] = c.asDict()

    spark.stop()
    return out


if __name__ == "__main__":
    sf = sys.argv[1] if len(sys.argv) > 1 else "/root/testdata/sf0.01"
    run(sf)
