"""Opt-in deep parity sweep: every exact-oracle query vs DuckDB at sf0.1.

The default suite gates at sf0.001 + sf0.01 (the driver's t2 scale). This
sweep catches SCALE-DEPENDENT divergence — data values that first appear in
bigger samples (ln(0)), and value grids that hit rounding half-boundaries
only at round row counts. It found two real bugs in r1 (q_udaf_gmean,
q_win_percent_rank). ~6 min wall; run with:

    SPARK_GRAFT_FULL_PARITY=1 python -m pytest tests/test_oracle_parity_full.py -q
"""

from __future__ import annotations

import os

import pytest

from tests.conftest import SF01
from tests.harness import compare, duck_con

pytestmark = pytest.mark.skipif(
    not os.environ.get("SPARK_GRAFT_FULL_PARITY"),
    reason="deep sweep; set SPARK_GRAFT_FULL_PARITY=1",
)


def _keys():
    import os as _os
    import sys

    sys.path.insert(0, _os.path.dirname(_os.path.dirname(_os.path.abspath(__file__))))
    from ai_to_cvent_etl_spark.registry import load_registry

    return sorted(load_registry().keys())


@pytest.fixture(scope="module")
def con():
    return duck_con(SF01)


@pytest.mark.parametrize("key", _keys())
def test_parity_sf01(key, spark, registry, con):
    spec = registry[key]
    df = spec.builder(spark, SF01)
    if spec.oracle is None:
        assert df.count() >= 0
        return
    problems = compare(df, con, spec.oracle)
    assert not problems, f"{key} @ sf0.1: " + " | ".join(problems)
