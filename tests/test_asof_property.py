"""Property-based check of the as-of join operator (operators/asof.py): the
union-and-window formulation must agree with a straightforward per-row
reference implementation on arbitrary generated inputs."""

from __future__ import annotations

from hypothesis import HealthCheck, given, settings
from hypothesis import strategies as st

events = st.lists(
    st.tuples(
        st.integers(min_value=0, max_value=3),    # by key
        st.integers(min_value=0, max_value=50),   # on (time)
    ),
    min_size=0,
    max_size=25,
)


def _reference_asof(left_rows, right_rows, allow_exact):
    """Per-row reference: latest right row with r.on <= (or <) l.on, same by;
    ties among right rows at equal `on` broken by highest rid (the operator's
    `tiebreak` column, latest wins)."""
    out = {}
    for lid, (lby, lon) in enumerate(left_rows):
        best = None
        for rid, (rby, ron) in enumerate(right_rows):
            if rby != lby:
                continue
            if (ron <= lon) if allow_exact else (ron < lon):
                k = (ron, rid)
                if best is None or k > best:
                    best = k
        out[lid] = best[1] if best is not None else None
    return out


@settings(
    max_examples=12,
    deadline=None,
    suppress_health_check=[HealthCheck.function_scoped_fixture],
)
@given(left=events, right=events, exact=st.booleans())
def test_asof_matches_reference(spark, left, right, exact):
    from ai_to_cvent_etl_spark.operators.asof import asof_join

    ldf = spark.createDataFrame(
        [(i, b, o) for i, (b, o) in enumerate(left)], "lid long, by long, t long"
    )
    rdf = spark.createDataFrame(
        [(i, b, o) for i, (b, o) in enumerate(right)], "rid long, by long, t long"
    )
    got = asof_join(
        ldf,
        rdf,
        on="t",
        by="by",
        right_payload=["rid"],
        tiebreak="rid",
        allow_exact_matches=exact,
    )
    got_map = {r["lid"]: r["rid_matched"] for r in got.collect()}
    assert got_map == _reference_asof(left, right, exact)


def _reference_asof_fwd(left_rows, right_rows, allow_exact):
    """Forward reference: EARLIEST right row with r.on >= (or >) l.on, same
    by; ties among right rows at equal `on` broken by LOWEST rid."""
    out = {}
    for lid, (lby, lon) in enumerate(left_rows):
        best = None
        for rid, (rby, ron) in enumerate(right_rows):
            if rby != lby:
                continue
            if (ron >= lon) if allow_exact else (ron > lon):
                k = (ron, rid)
                if best is None or k < best:
                    best = k
        out[lid] = best[1] if best is not None else None
    return out


@settings(
    max_examples=12,
    deadline=None,
    suppress_health_check=[HealthCheck.function_scoped_fixture],
)
@given(left=events, right=events, exact=st.booleans())
def test_asof_forward_matches_reference(spark, left, right, exact):
    from ai_to_cvent_etl_spark.operators.asof import asof_join

    ldf = spark.createDataFrame(
        [(i, b, o) for i, (b, o) in enumerate(left)], "lid long, by long, t long"
    )
    rdf = spark.createDataFrame(
        [(i, b, o) for i, (b, o) in enumerate(right)], "rid long, by long, t long"
    )
    got = asof_join(
        ldf,
        rdf,
        on="t",
        by="by",
        right_payload=["rid"],
        tiebreak="rid",
        allow_exact_matches=exact,
        direction="forward",
    )
    got_map = {r["lid"]: r["rid_matched"] for r in got.collect()}
    assert got_map == _reference_asof_fwd(left, right, exact)
