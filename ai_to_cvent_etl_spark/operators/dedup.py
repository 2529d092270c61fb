"""Near-duplicate pair generation (shared by the declared dedup queries).

Implements the SSJoin/PPJoin prefix-filtering principle: under any global
total order on tokens, two sets with Jaccard >= t must share a token within
their first (|x| - ceil(t*|x|) + 1) tokens — so only that prefix is exploded
and joined, and the exact verify runs row-locally on the full arrays. The
result is provably identical to the full O(n^2) token join. The order used
is FREQUENCY-ASCENDING (r7, PPJoin proper): frequent tokens sort to the
tail and stay out of prefixes, so stopwords cannot create quadratic
candidate blocks — the property that keeps this operator viable on real
corpora, where a handful of tokens appear in >30% of documents.

Scale: candidate volume shrinks superlinearly with t (prefix length ~
(1-t)|x|+1); the verify joins are broadcast at test scale, bucket-joins at
100 TB. MinHash-LSH (queries/dedup_scale.py) replaces even the prefix join
when t is low or the corpus is adversarial.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F


def near_dup_pairs(docs: DataFrame, threshold: float) -> DataFrame:
    """(doc_lo, doc_hi, jaccard) for all pairs with token-set Jaccard >=
    threshold. `docs` needs (doc_id, text); jaccard is rounded to 4dp."""
    from ai_to_cvent_etl_spark.queries._util import fan_out

    # `hs` = xxhash64 per distinct token, for the verify step: intersecting
    # fixed-width long arrays is ~2x faster than string arrays (measured
    # sf0.1), and |hs_a ∩ hs_b| == |ts_a ∩ ts_b| absent a 64-bit collision
    # within one pair's union (P ~ 1e-17/pair; corpus-wide collision-freedom
    # pinned by tests/test_invariants.py).
    #
    # r7: the prefix-filter's global token order is FREQUENCY-ASCENDING
    # (df ASC, token ASC) — the actual PPJoin design — instead of plain
    # lexicographic. The filter is lossless under ANY total order (the
    # verified pair set, and therefore every consumer's output hash, is
    # order-invariant), but the CANDIDATE volume is not: a high-df token
    # (a stopword — every real corpus has them) that lands inside prefixes
    # creates a candidate block quadratic in its df. Frequency-ascending
    # order pushes frequent tokens to the array TAIL, so prefixes hold only
    # rare tokens and candidate blocks stay small regardless of stopword
    # df. Costs one vocabulary-sized df aggregation + a token-keyed join;
    # the per-doc frame is localCheckpoint'ed so its three consumers
    # (prefix explode + both verify sides) don't recompute it.
    base = docs.select(
        "doc_id", F.array_distinct(F.split(F.col("text"), " ")).alias("tk")
    )
    dtok = fan_out(base.select("doc_id", F.explode("tk").alias("tok")))
    df_tab = dtok.groupBy("tok").agg(F.count(F.lit(1)).alias("df"))
    # r8 (guide §2.5/§2.6): fan the per-doc signature frame across cores
    # BEFORE freezing it with localCheckpoint. The doc_id aggregation's
    # output is only a few MB here, so AQE coalesces it to 1-3 post-shuffle
    # partitions — and localCheckpoint PINS that layout, serializing the
    # downstream prefix explode + candidate enumeration (work per byte is
    # explosive: ~6.5M candidate pairs from 5000 docs at sf0.1) onto 1-3
    # tasks. AQE sizes partitions by shuffle bytes and cannot see that cost;
    # the explicit fan-out is the documented device for explode-heavy small
    # frames. Measured: q_dedup_near_jaccard 20.2s -> ~6s warm at sf0.1.
    # At 100 TB the aggregate output is already thousands of partitions and
    # this round-robin repartition to total-core-count would SHRINK it, so
    # it stays correct but the checkpoint would be re-tuned; candidate
    # volume there is rare-token-driven (see above) and per-partition work
    # stays bounded either way.
    toks = (
        fan_out(
            dtok.join(df_tab, "tok")
            .groupBy("doc_id")
            .agg(
                F.array_sort(F.collect_list(F.struct("df", "tok"))).alias("st")
            )
            .select(
                "doc_id",
                F.expr("transform(st, x -> x.tok)").alias("ts"),
                F.expr("transform(st, x -> xxhash64(x.tok))").alias("hs"),
            )
        )
        .localCheckpoint(eager=False)
    )
    # ADVICE r6: ceil over the double product sz*t can round UP when sz*t
    # is mathematically integral but its fp representation lands epsilon
    # above the integer — shortening the prefix by one token and silently
    # dropping a true pair. Subtracting 1e-9 before ceil makes the rounding
    # exact for any threshold that is a short decimal; when sz*t is within
    # 1e-9 above a non-integral value the prefix only LENGTHENS (adds
    # candidates), which the exact verify step absorbs — still lossless.
    prefix_len = (
        F.size("ts")
        - F.ceil(F.size("ts") * F.lit(threshold) - F.lit(1e-9)).cast("int")
        + 1
    )
    pref = toks.select(
        "doc_id",
        F.size("ts").alias("sz"),
        F.explode(F.slice("ts", F.lit(1), prefix_len)).alias("tok"),
    )
    a, b = pref.alias("a"), pref.alias("b")
    # Length filter (lossless, SSJoin): J(a,b) >= t forces
    # t*|a| <= |b| <= |a|/t, since J <= min/max of the two set sizes.
    # On a small-vocab corpus the shared-prefix-token test alone is weak
    # (everyone shares the globally-frequent first tokens); the size band
    # prunes the bulk of those false candidates before the verify join.
    # Compared raw (no ceil): ceil over a double product can round UP when
    # sz*t is exactly integral (fp representation error), pruning a pair
    # whose Jaccard equals the threshold exactly.
    # ADVICE r6: no broadcast hints here — the exploded prefix table and
    # the full token-array tables grow with the corpus, and pinning them
    # broadcast would hit the broadcast size ceiling at large slices
    # instead of degrading gracefully. AQE broadcasts them while they fit
    # (verified: same BroadcastHashJoin plan at test SFs) and falls back to
    # a keyed shuffle (token key for candidates, doc_id for verify) beyond.
    cand = (
        a.join(
            b,
            (F.col("a.tok") == F.col("b.tok"))
            & (F.col("a.doc_id") < F.col("b.doc_id"))
            & (F.col("b.sz") >= F.col("a.sz") * F.lit(threshold))
            & (F.col("b.sz") * F.lit(threshold) <= F.col("a.sz")),
        )
        .select(F.col("a.doc_id").alias("doc_lo"), F.col("b.doc_id").alias("doc_hi"))
        .distinct()
    )
    ta = toks.select(
        F.col("doc_id").alias("doc_lo"),
        F.col("hs").alias("hs_a"),
        F.size("ts").alias("sz_a"),
    )
    tb = toks.select(
        F.col("doc_id").alias("doc_hi"),
        F.col("hs").alias("hs_b"),
        F.size("ts").alias("sz_b"),
    )
    # r8 (guide §7.2 duplicated-subtree): same device as D1's verify — the
    # jaccard filter would otherwise push into the attach join as a
    # residual and evaluate array_intersect once per candidate there plus
    # once per survivor in the project. A filter on a generator OUTPUT
    # column cannot cross the Generate, so the one-element explode pins
    # exactly one intersect per candidate pair. Deterministic.
    verified = (
        cand.join(ta, "doc_lo")
        .join(tb, "doc_hi")
        .select(
            "doc_lo",
            "doc_hi",
            "sz_a",
            "sz_b",
            F.explode(
                F.array(
                    F.size(
                        F.array_intersect(F.col("hs_a"), F.col("hs_b"))
                    ).cast("double")
                )
            ).alias("i"),
        )
    )
    jac = F.col("i") / (F.col("sz_a") + F.col("sz_b") - F.col("i"))
    return verified.filter(jac >= threshold).select(
        "doc_lo", "doc_hi", F.round(jac, 4).alias("jaccard")
    )


def connected_components(
    edges: DataFrame, nodes: DataFrame, max_iters: int = 20
) -> DataFrame:
    """Connected components by iterative min-label propagation.

    `edges`: (doc_lo, doc_hi) undirected; `nodes`: (doc_id). Returns
    (doc_id, component) where component = min doc_id in the node's component.

    Each iteration: push every node's current label to its neighbors, keep
    the minimum. Labels decrease monotonically, so equal label-sums across
    iterations == fixpoint. Iterations needed = component diameter (small for
    near-dup clusters, which are dense). Lineage is truncated each round via
    localCheckpoint — the standard Spark pattern for iterative algorithms
    (without it the plan doubles every iteration).
    """
    # Materialize the symmetrized edge list ONCE: `edges` is typically the
    # output of an expensive pair-finding pipeline (prefix join + verify),
    # and every propagation round joins against it — without this checkpoint
    # each of the O(log d) iterations would re-derive the whole upstream
    # pipeline (only partially saved by shuffle-stage reuse).
    sym = (
        edges.select(F.col("doc_lo").alias("src"), F.col("doc_hi").alias("dst"))
        .union(
            edges.select(F.col("doc_hi").alias("src"), F.col("doc_lo").alias("dst"))
        )
        .localCheckpoint()
    )
    labels = nodes.select(
        F.col("doc_id").alias("node"), F.col("doc_id").alias("lab")
    ).localCheckpoint()
    prev_sum = labels.agg(F.sum("lab")).collect()[0][0]
    for _ in range(max_iters):
        # neighbor-min propagation
        propagated = (
            sym.join(labels, sym.src == labels.node)
            .select(F.col("dst").alias("node"), "lab")
        )
        labels = (
            labels.unionByName(propagated)
            .groupBy("node")
            .agg(F.min("lab").alias("lab"))
        )
        # pointer doubling: lab <- lab[lab]. Contracts label chains, so
        # convergence is O(log diameter) rounds instead of O(diameter) —
        # the difference between 5 and 100 Spark jobs on a chain-shaped
        # component.
        lab_of_lab = labels.select(
            F.col("node").alias("lab"), F.col("lab").alias("lab2")
        )
        # Lazy checkpoint: the convergence-check action below materializes
        # it, so each round costs ONE Spark job (eager=True would run a
        # separate materialization job first — 2x the per-round latency).
        labels = (
            labels.join(lab_of_lab, "lab")
            .select("node", F.least("lab", "lab2").alias("lab"))
            .localCheckpoint(eager=False)
        )
        new_sum = labels.agg(F.sum("lab")).collect()[0][0]
        if new_sum == prev_sum:
            break
        prev_sum = new_sum
    return labels.select(F.col("node").alias("doc_id"), F.col("lab").alias("component"))
