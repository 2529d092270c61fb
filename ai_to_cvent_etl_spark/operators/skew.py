"""Skew-mitigated equi-join: explicit salting for pathologically hot keys
(SCALE.md "Joins"). AQE's skew-join splitting covers organic skew; salting is
for the known-degenerate key (null surrogate, "unknown" user, empty string)
whose single hash partition would otherwise serialize the join.

Mechanics: the SKEWED (large, hot) side gets a uniform random-free salt
`pmod(hash(<all columns>), k)` — deterministic per row, uniform across k.
The other side is exploded k ways (every salt value), so every
(key, salt) pair finds its match. One shuffle either way; the hot key's rows
now land in k partitions instead of 1, at the cost of k× duplication of the
small side — which is why the exploded side should be the smaller one.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

_SALT = "__salt"


def salted_join(
    skewed: DataFrame,
    other: DataFrame,
    on: list[str],
    k: int = 8,
    how: str = "inner",
) -> DataFrame:
    """Equi-join `skewed` ⋈ `other` on columns ``on``, spreading each key of
    the skewed side over ``k`` salted sub-keys. `other` is replicated k×.
    Result columns = skewed's + other's non-key columns (like a plain
    `.join(on=...)`).

    ``how`` is restricted to {'inner', 'left'}: for 'right'/'full' the k-way
    exploded `other` side would emit each UNMATCHED other-row k times (one per
    salt), silently corrupting outer-join results. Preserving right/full
    semantics under salting needs a post-join dedup of unmatched rows —
    out of scope; use AQE skew-join splitting for those.
    """
    if how not in ("inner", "left"):
        raise ValueError(
            f"salted_join supports how in {{'inner','left'}}, got {how!r}: "
            "the k-way explode of `other` would duplicate unmatched rows "
            "k times under 'right'/'full'"
        )
    salted = skewed.withColumn(
        _SALT,
        F.pmod(F.hash(*[F.col(c) for c in skewed.columns]), F.lit(k)).cast("int"),
    )
    exploded = other.withColumn(
        _SALT, F.explode(F.array(*[F.lit(i) for i in range(k)]))
    )
    return salted.join(exploded, on=[*on, _SALT], how=how).drop(_SALT)
