"""Distributed global ranking: the scalable replacement for
``Window.orderBy(...)`` with no partition spec.

An unpartitioned window plans as ``Exchange SinglePartition`` + one-task
sort of the WHOLE input — the classic 100 TB scale killer (Spark itself
warns ``WindowExec: No Partition Defined``). The standard two-pass design
used here keeps every stage parallel:

  1. ``repartitionByRange`` on the order keys — Spark's RangePartitioner
     samples split points, so the sort is P-way parallel and each partition
     holds a contiguous key range;
  2. ``sortWithinPartitions`` — local (spillable) sort, no further shuffle;
  3. ``monotonically_increasing_id`` — per-partition-dense ids whose order
     within a partition equals the sort order;
  4. a P-row per-partition (min_id, count) aggregate, prefix-summed with a
     single-partition window (bounded: P rows by construction), broadcast
     back, so ``global_rn = id - min_id + 1 + prefix_offset``.

Determinism: when ``order_cols`` is a total order (the registry's
determinism contract already requires a unique final sort key), the output
rank of each row is independent of where RangePartitioner happens to cut —
rank is a property of the total order, not the partitioning. Equal keys
cannot straddle a boundary (range partitioning sends equal keys to the same
partition), and within a partition the local sort fixes the id order, so
reruns/retries/AQE coalescing all reproduce the same ranks.

Cost model at scale: ONE range shuffle of (order_cols + carried columns),
one tiny P-row reduction, one broadcast hash join on partition id. Versus
the unpartitioned window: one shuffle that serializes the corpus through a
single task. The range shuffle is the same price a global ``ORDER BY``
already pays — this operator simply refuses to collapse it to one task.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame, Window
from pyspark.sql import functions as F

_PID = "__gr_pid"
_MID = "__gr_mid"


def global_row_number(
    df: DataFrame,
    order_cols: list,
    out_col: str = "rn",
    num_partitions: int | None = None,
) -> DataFrame:
    """Append a 1-based global row number ordered by ``order_cols``.

    ``order_cols`` are Columns (or names); they MUST form a total order
    (unique tie-break key) for the result to be well-defined — the same
    precondition an unpartitioned ``row_number`` window needs for
    determinism anyway.

    The result carries all input columns plus ``out_col``; row order of the
    returned frame is unspecified (it is data for downstream aggregation,
    not a display sort).
    """
    cols = [F.col(c) if isinstance(c, str) else c for c in order_cols]
    if num_partitions:
        ranged = df.repartitionByRange(num_partitions, *cols)
    else:
        ranged = df.repartitionByRange(*cols)
    ranged = (
        ranged.sortWithinPartitions(*cols)
        .withColumn(_PID, F.spark_partition_id())
        .withColumn(_MID, F.monotonically_increasing_id())
        # materialize once: both the offset aggregate and the final join
        # consume this frame; without the checkpoint Spark re-plans the
        # range exchange + sort per consumer (heaps-law's 12x replication)
        .localCheckpoint(eager=False)
    )
    # P rows: one (min_id, count) per partition, prefix-summed. The
    # unpartitioned window here is over <=P rows by construction — the
    # bounded case the plan lint exempts structurally (HashAggregate below).
    offsets = ranged.groupBy(_PID).agg(
        F.min(_MID).alias("__gr_base"),
        F.count(F.lit(1)).alias("__gr_cnt"),
    )
    w = (
        Window.orderBy(_PID)
        .rowsBetween(Window.unboundedPreceding, -1)
    )
    offsets = offsets.select(
        _PID,
        "__gr_base",
        F.coalesce(F.sum("__gr_cnt").over(w), F.lit(0)).alias("__gr_off"),
    )
    return (
        ranged.join(F.broadcast(offsets), _PID)
        .withColumn(
            out_col,
            (F.col(_MID) - F.col("__gr_base") + 1 + F.col("__gr_off")).cast(
                "bigint"
            ),
        )
        .drop(_PID, _MID, "__gr_base", "__gr_off")
    )


def ntile_from_rn(rn: Column, n: Column, k: int) -> Column:
    """SQL NTILE(k) computed arithmetically from a 1-based global row
    number ``rn`` and total count ``n`` (first ``n % k`` buckets get one
    extra row) — lets NTILE ride the distributed global rank instead of a
    single-partition window. Returns a bigint bucket in [1, k]."""
    base = F.floor(n / k).cast("bigint")
    rem = (n % k).cast("bigint")
    big_span = rem * (base + 1)
    bucket = F.when(
        rn <= big_span, F.floor((rn - 1) / (base + 1))
    ).otherwise(rem + F.floor((rn - big_span - 1) / base))
    return (F.floor(bucket) + 1).cast("bigint")


_RUNNING_FNS = {"sum": F.sum, "max": F.max, "min": F.min}


def global_running(
    df: DataFrame,
    order_cols: list,
    specs: dict[str, tuple],
    exclusive: bool = False,
    with_totals: bool = False,
    reset_cols: list | None = None,
) -> DataFrame:
    """Append running aggregates ``fn(expr) OVER (ORDER BY order_cols ROWS
    UNBOUNDED PRECEDING .. {CURRENT ROW | 1 PRECEDING})`` for each
    ``name -> (fn, expr)`` in ``specs`` (fn in {'sum', 'max', 'min'}) —
    WITHOUT the single-partition exchange an unpartitioned window plans.

    Same two-pass design as :func:`global_cumulative` (which is the
    sum/inclusive special case): range-repartition, per-partition running
    windows keyed by physical partition id, then combine with a broadcast
    P-row prefix of per-partition totals (sum -> add, max -> greatest,
    min -> least). ``exclusive=True`` gives the 1-PRECEDING frame with SQL
    null semantics preserved (first global row -> NULL).

    ``with_totals=True`` (r9, VERDICT r8 item 3) additionally appends one
    ``{name}_total`` column per spec — the whole-set combine — computed
    from the SAME P-row offsets frame with an unbounded-both-ways window
    (bounded: P rows), i.e. at ZERO extra passes over ``df``. Callers that
    previously ran a separate whole-set aggregate + crossJoin to get the
    total can drop that second pass; exact same values (the total is the
    combine of the per-partition combines).

    ``reset_cols`` (r9, VERDICT r8 item 3) generalizes the operator to
    GROUPED running aggregates: the running frame restarts per distinct
    ``reset_cols`` value (SQL ``PARTITION BY reset ORDER BY order_cols``),
    still with every stage parallel — range-partition on (reset, order),
    per-(pid, reset) windows, and the offsets prefix keyed per reset group.
    ``with_totals`` then yields per-GROUP totals. Lets two different
    global prefix sums (e.g. both rank axes of a correlation) share ONE
    range pass by union-tagging the axis.
    """
    cols = [F.col(c) if isinstance(c, str) else c for c in order_cols]
    rcols = [
        F.col(c) if isinstance(c, str) else c for c in (reset_cols or [])
    ]
    rnames = [df.select(c).columns[0] for c in rcols]
    ranged = (
        df.repartitionByRange(*rcols, *cols)
        .withColumn(_PID, F.spark_partition_id())
        .localCheckpoint(eager=False)
    )
    upper = -1 if exclusive else Window.currentRow
    w_in = (
        Window.partitionBy(_PID, *rnames)
        .orderBy(*cols)
        .rowsBetween(Window.unboundedPreceding, upper)
    )
    within = ranged.select(
        "*",
        *[
            _RUNNING_FNS[fn](expr).over(w_in).alias(f"__gc_{name}_in")
            for name, (fn, expr) in specs.items()
        ],
    )
    # per-(partition, group) INCLUSIVE totals (the offset for partition p
    # is the combine of all partitions before p WITHIN the group, so the
    # frame bound only affects the within-partition leg)
    totals = ranged.groupBy(_PID, *rnames).agg(
        *[
            _RUNNING_FNS[fn](expr).alias(f"__gc_{name}_tot")
            for name, (fn, expr) in specs.items()
        ]
    )
    w_off = (
        Window.partitionBy(*rnames)
        .orderBy(_PID)
        .rowsBetween(Window.unboundedPreceding, -1)
    )
    w_all = (
        Window.partitionBy(*rnames)
        .orderBy(_PID)
        .rowsBetween(Window.unboundedPreceding, Window.unboundedFollowing)
    )
    offsets = totals.select(
        _PID,
        *rnames,
        *[
            _RUNNING_FNS[fn](f"__gc_{name}_tot").over(w_off).alias(
                f"__gc_{name}_off"
            )
            for name, (fn, _) in specs.items()
        ],
        *(
            [
                _RUNNING_FNS[fn](f"__gc_{name}_tot").over(w_all).alias(
                    f"__gc_{name}_all"
                )
                for name, (fn, _) in specs.items()
            ]
            if with_totals
            else []
        ),
    )
    joined = within.join(F.broadcast(offsets), [_PID, *rnames])
    in_types = {f.name: f.dataType for f in within.schema.fields}
    combined = []
    for name, (fn, _) in specs.items():
        iv = F.col(f"__gc_{name}_in")
        ov = F.col(f"__gc_{name}_off")
        t = in_types[f"__gc_{name}_in"]
        if fn == "sum":
            zero = F.lit(0).cast(t)
            c = F.when(iv.isNull() & ov.isNull(), F.lit(None).cast(t)).otherwise(
                F.coalesce(iv, zero) + F.coalesce(ov, zero)
            )
        elif fn == "max":
            c = F.greatest(iv, ov)  # greatest/least skip NULLs
        else:
            c = F.least(iv, ov)
        combined.append(c.cast(t).alias(name))
    if with_totals:
        combined += [
            F.col(f"__gc_{name}_all")
            .cast(in_types[f"__gc_{name}_in"])
            .alias(f"{name}_total")
            for name in specs
        ]
    return joined.select(*df.columns, *combined)


def global_cumulative(
    df: DataFrame,
    order_cols: list,
    aggs: dict[str, Column],
    with_totals: bool = False,
    reset_cols: list | None = None,
) -> DataFrame:
    """Append cumulative sums ``SUM(expr) OVER (ORDER BY order_cols ROWS
    UNBOUNDED PRECEDING..CURRENT ROW)`` for each ``name -> expr`` in
    ``aggs`` — WITHOUT the single-partition exchange an unpartitioned
    cumulative window plans.

    Two-pass design: range-repartition on the order keys (parallel global
    sort), per-partition cumulative windows keyed by the physical partition
    id (a parallel hash-partitioned window), plus a broadcast P-row prefix
    of per-partition totals. Cost: two parallel shuffles of the corpus
    versus one serial single-task sort — the trade that wins from the
    second executor onward.

    ``order_cols`` must form a total order (unique tie-break) for ROWS
    frames to be well-defined — the same precondition the unpartitioned
    window formulation already carries.

    ``with_totals=True`` appends ``{name}_total`` whole-set (or per
    ``reset_cols`` group) sums at zero extra passes; ``reset_cols``
    restarts the cumulative per group — see :func:`global_running`.

    Result column types are cast back to the plain window-sum types so the
    rewrite is schema-transparent to downstream code.
    """
    return global_running(
        df,
        order_cols,
        {name: ("sum", expr) for name, expr in aggs.items()},
        with_totals=with_totals,
        reset_cols=reset_cols,
    )


def global_ranks(
    df: DataFrame,
    value_col,
    tie_cols: list,
    out_rn: str = "rn",
) -> DataFrame:
    """``global_row_number`` ordered by (value, *ties) — the building block
    for rank/percent_rank/cume_dist/avg-rank: derive tie-aware variants with
    a ``Window.partitionBy(value_col)`` (a keyed, parallel window) over the
    returned ``out_rn``:

      rank        = min(rn) over (partition by value)
      avg rank    = avg(rn) over (partition by value)   (rank tests)
      cume_dist   = max(rn) over (partition by value) / n
    """
    v = F.col(value_col) if isinstance(value_col, str) else value_col
    return global_row_number(df, [v, *tie_cols], out_col=out_rn)
