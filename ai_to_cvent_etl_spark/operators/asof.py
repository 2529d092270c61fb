"""As-of (point-in-time) join — the one relational operator the Spark
DataFrame API lacks natively (SURVEY §7.4).

Strategy: union-and-window, not a join. Both sides are unioned on the
(by, on) ordering, then ``last(<right payload>, ignorenulls=True)`` over a
running window carries the most recent right-side row forward onto each left
row. This is shuffle-friendly at 100 TB: ONE shuffle on the `by` key
(window partitioning), no range-join explosion, no per-key collect. Skewed
`by` keys are handled by AQE; an extremely hot key can be salted upstream.

Semantics match DuckDB ``ASOF LEFT JOIN ... ON l.by = r.by AND l.on >= r.on``
(backward search, exact matches allowed): for equal timestamps the right row
sorts before the left row, so an exact-ts right row is visible to the left
row. Ties among right rows at the same timestamp are broken by ``tiebreak``
(latest wins) to stay deterministic.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame, Window
from pyspark.sql import functions as F


def asof_join(
    left: DataFrame,
    right: DataFrame,
    on: str,
    by: str,
    right_payload: list[str],
    tiebreak: str | None = None,
    allow_exact_matches: bool = True,
    direction: str = "backward",
) -> DataFrame:
    """As-of join: for each left row, attach the right row with the greatest
    ``on`` <= the left ``on`` (direction='backward', the default) or the
    SMALLEST ``on`` >= the left ``on`` (direction='forward'), matching on
    ``by``; strict inequality if not allow_exact_matches. Right payload
    columns come back suffixed ``_matched``.

    Forward mode traverses the unioned stream in descending ``on``, so the
    carried right row is the nearest FOLLOWING one; ties among right rows at
    equal ``on`` resolve to the SMALLEST ``tiebreak`` (backward: largest) —
    both read as "the closest in traversal order", deterministic either way.
    """
    if direction not in ("backward", "forward"):
        raise ValueError(f"direction must be backward|forward, got {direction!r}")
    forward = direction == "forward"
    payload = F.struct(*[F.col(c) for c in right_payload])
    l_tag = left.select(
        F.col(by).alias("__by"),
        F.col(on).alias("__on"),
        F.lit(1).alias("__is_left"),
        F.struct(*[F.col(c) for c in left.columns]).alias("__left"),
        F.lit(None).cast(
            right.select(payload.alias("p")).schema["p"].dataType
        ).alias("__right"),
        # the tiebreak is a RIGHT-side concern (which right row wins at equal
        # ts); left rows carry null __right, so their relative order among
        # peers cannot change the carried value — tie 0 is safe even when the
        # tiebreak column doesn't exist on the left side.
        (
            F.col(tiebreak) if tiebreak and tiebreak in left.columns else F.lit(0)
        ).cast("long").alias("__tie"),
    )
    r_tag = right.select(
        F.col(by).alias("__by"),
        F.col(on).alias("__on"),
        F.lit(0).alias("__is_left"),
        F.lit(None).cast(
            left.select(
                F.struct(*[F.col(c) for c in left.columns]).alias("p")
            ).schema["p"].dataType
        ).alias("__left"),
        payload.alias("__right"),
        (F.col(tiebreak) if tiebreak else F.lit(0)).cast("long").alias("__tie"),
    )
    # Exact matches allowed: right rows at equal __on sort BEFORE left rows
    # in traversal order (is_left ascending); strict: after.
    left_order: Column = F.col("__is_left").asc() if allow_exact_matches else F.col("__is_left").desc()
    on_order: Column = F.col("__on").desc() if forward else F.col("__on").asc()
    tie_order: Column = F.col("__tie").desc() if forward else F.col("__tie").asc()
    w = (
        Window.partitionBy("__by")
        .orderBy(on_order, left_order, tie_order)
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    )
    carried = l_tag.unionByName(r_tag).withColumn(
        "__matched", F.last(F.col("__right"), ignorenulls=True).over(w)
    )
    out = carried.filter(F.col("__is_left") == 1)
    cols = [F.col(f"__left.{c}").alias(c) for c in left.columns]
    cols += [F.col(f"__matched.{c}").alias(f"{c}_matched") for c in right_payload]
    return out.select(*cols)
