"""Golden-output regression (SURVEY §5.2): checked-in sf0.001 results make a
behavior change visible as a readable diff, not just a hash flip."""

from __future__ import annotations

import datetime
import decimal
import glob
import json
import os

import pytest

from tests.conftest import SF0001

GOLDEN_DIR = os.path.join(os.path.dirname(__file__), "golden")


def _canon(v):
    if isinstance(v, float):
        return repr(v)
    if isinstance(v, decimal.Decimal):
        return f"dec:{v.normalize()}"
    if isinstance(v, (datetime.datetime, datetime.date)):
        return v.isoformat()
    if isinstance(v, list):
        return [_canon(x) for x in v]
    return v


@pytest.mark.parametrize(
    "key",
    [os.path.splitext(os.path.basename(p))[0] for p in sorted(glob.glob(os.path.join(GOLDEN_DIR, "*.json")))],
)
def test_golden(spark, registry, key):
    with open(os.path.join(GOLDEN_DIR, f"{key}.json"), encoding="utf-8") as f:
        want = json.load(f)
    df = registry[key].builder(spark, SF0001)
    assert df.columns == want["columns"]
    got = sorted([_canon(v) for v in r] for r in map(tuple, df.collect()))
    assert got == want["rows"]
