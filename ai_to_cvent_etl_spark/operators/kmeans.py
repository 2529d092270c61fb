"""Deterministic Lloyd's k-means for learned-centroid IVF partitioning.

The coarse-quantizer companion to the IVF ANN path (queries/dedup_scale.py
D4): replace the fixed sign-bit quantizer with centroids LEARNED from the
data, keeping every step bit-reproducible across engines so the result is
oracle-checkable (DuckDB recomputes the identical iterations in SQL).

Determinism design (the interesting part — naive k-means is not
cross-engine reproducible):
  * Init: the embeddings of the k lowest vec_ids, component-quantized.
  * Assignment is row-local: distances fold left-to-right over the vector
    dims (Spark `aggregate`/`zip_with` == DuckDB `list_reduce`/`list_zip`),
    argmin tie-breaks on the lowest cluster id (array_position returns the
    FIRST index of the min).
  * Centroid update: float components are widened float->double (bit-exact
    in both engines — probed; float->decimal is NOT: Spark goes through
    shortest-repr, DuckDB through a different expansion), quantized to the
    6dp grid, and summed as DECIMAL(18,6). Decimal sums are EXACT and
    associative, so the mean is independent of partitioning/row order —
    the classic "double sums are not associative" nondeterminism is
    designed out.
  * Quantization is floor(x*1e6 + 0.5)/1e6 in pure double arithmetic —
    NEVER round() or cast-to-decimal. The mean is the lattice k/(1e6*n),
    which lands EXACTLY on 6dp half-boundaries whenever n is even, and
    engines disagree there (Spark rounds the shortest-repr decimal, DuckDB
    the binary value — found empirically: 0.0159215 -> 0.015921 vs
    0.015922). floor on identical doubles is identical IEEE everywhere.
    Casting the quantized double back to DECIMAL(18,6) for the exact sum
    is safe: it sits ~1e-17 from its grid point, 5e-7 from any boundary.

Scale notes: assignment is a map-only stage over broadcast-literal
centroids (k x dim doubles — tiny even at k=65536); the update is one
shuffle keyed (cluster, dim) with partial aggregation. Only k x dim
aggregates ever reach the driver between rounds — the standard iterative
pattern (same shape as MLlib's KMeans, minus its rand init).
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

_Q = "decimal(18,6)"


def _quant(col: Column) -> Column:
    """Quantize a double to the 6dp grid in pure double arithmetic
    (floor(x*1e6 + 0.5)/1e6 — engine-portable, no decimal rounding)."""
    return F.floor(col * F.lit(1000000.0) + F.lit(0.5)) / F.lit(1000000.0)


def initial_centroids(
    df: DataFrame, k: int, id_col: str = "vec_id", vec_col: str = "embedding"
) -> list[tuple[int, list[float]]]:
    """Quantized embeddings of the k lowest ids, as (cluster_id, components)."""
    rows = (
        df.orderBy(id_col)
        .limit(k)
        .select(
            F.col(id_col),
            F.expr(
                f"transform({vec_col}, x ->"
                " floor(cast(x as double) * 1000000.0d + 0.5d) / 1000000.0d)"
            ).alias("c"),
        )
        .collect()
    )
    return [(i, list(r["c"])) for i, r in enumerate(rows)]


def assign(
    df: DataFrame,
    centroids: list[tuple[int, list[float]]],
    vec_col: str = "embedding",
) -> DataFrame:
    """Row-local nearest-centroid assignment: adds `cluster` (bigint) and
    `dist2` (double, squared L2). No shuffle — centroids ride as literals."""
    ordered = sorted(centroids)  # argmin tie-break = lowest cluster id
    c_arr = F.array(*[F.array(*[F.lit(float(v)) for v in c]) for _, c in ordered])
    id_arr = F.array(*[F.lit(int(cid)) for cid, _ in ordered])
    dists = F.transform(
        c_arr,
        lambda c: F.aggregate(
            F.zip_with(
                F.col(vec_col),
                c,
                lambda x, y: (x.cast("double") - y) * (x.cast("double") - y),
            ),
            F.lit(0.0),
            lambda a, v: a + v,
        ),
    )
    out = df.withColumn("__d", dists)
    best = F.array_min("__d")
    pos = F.array_position("__d", best)  # first (lowest-id) index on ties
    return (
        out.withColumn("cluster", F.element_at(id_arr, pos.cast("int")).cast("bigint"))
        .withColumn("dist2", best)
        .drop("__d")
    )


def update_centroids(
    assigned: DataFrame, vec_col: str = "embedding"
) -> list[tuple[int, list[float]]]:
    """Recompute quantized centroid means from an `assign` output.
    Decimal sums keyed (cluster, dim); only k x dim rows reach the driver."""
    sums = (
        assigned.select("cluster", F.posexplode(vec_col).alias("dim", "x"))
        .groupBy("cluster", "dim")
        .agg(
            F.sum(_quant(F.col("x").cast("double")).cast(_Q)).alias("s"),
            F.count(F.lit(1)).alias("n"),
        )
        .select(
            "cluster",
            "dim",
            _quant(F.col("s").cast("double") / F.col("n")).alias("v"),
        )
        .collect()
    )
    by_cluster: dict[int, dict[int, float]] = {}
    for r in sums:
        by_cluster.setdefault(r["cluster"], {})[r["dim"]] = r["v"]
    return [
        (cid, [dims[d] for d in sorted(dims)])
        for cid, dims in sorted(by_cluster.items())
    ]


# Trained-model memo: (cache_key, data fingerprint, k, iters, id_col,
# vec_col) -> centroids. Training is fully deterministic (module docstring),
# so a cache hit returns byte-identical centroids to retraining — this is
# the "train once, serve many" split every IVF deployment has (V6 trains,
# V7 serves; both declared queries would otherwise re-run the identical
# Lloyd rounds). Entries are k x dim float lists — negligible memory.
#
# Staleness contract: when ``cache_key`` is a path that exists on the local
# filesystem, the memo key includes the (name, mtime_ns, size) of every
# parquet file directly under it, so rewriting the data invalidates the
# entry automatically. For a non-path key (or a remote URI the driver can't
# stat) the caller owns invalidation — call :func:`clear_model_cache` after
# rewriting the data.
_MODEL_CACHE: dict[tuple, list[tuple[int, list[float]]]] = {}


def clear_model_cache() -> None:
    """Drop every memoized model (use after rewriting a dataset in place
    whose cache_key is not a stat-able local path)."""
    _MODEL_CACHE.clear()


def _data_fingerprint(cache_key: str) -> tuple:
    """(name, mtime_ns, size) per parquet file under a local-path cache_key;
    () when the key is not a stat-able path."""
    import glob
    import os

    if not os.path.isdir(cache_key):
        return ()
    out = []
    for p in sorted(glob.glob(os.path.join(cache_key, "*.parquet"))):
        st = os.stat(p)
        out.append((os.path.basename(p), st.st_mtime_ns, st.st_size))
    return tuple(out)


def kmeans_fit(
    df: DataFrame,
    k: int = 8,
    iters: int = 2,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    cache_key: str | None = None,
) -> list[tuple[int, list[float]]]:
    """Run `iters` deterministic Lloyd rounds and return the trained
    centroids. With ``cache_key`` (e.g. the dataset path), the trained model
    is memoized — correct because training is bit-reproducible."""
    memo = (
        (cache_key, _data_fingerprint(cache_key), k, iters, id_col, vec_col)
        if cache_key
        else None
    )
    if memo is not None and memo in _MODEL_CACHE:
        return _MODEL_CACHE[memo]
    centroids = initial_centroids(df, k, id_col, vec_col)
    for _ in range(iters - 1):
        centroids = update_centroids(assign(df, centroids, vec_col), vec_col)
    if memo is not None:
        _MODEL_CACHE[memo] = centroids
    return centroids


def kmeans_fit_assign(
    df: DataFrame,
    k: int = 8,
    iters: int = 2,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    cache_key: str | None = None,
) -> DataFrame:
    """Train (or fetch the memoized model) and return the final assignment
    (id, cluster, dist2). Empty clusters drop out."""
    centroids = kmeans_fit(df, k, iters, id_col, vec_col, cache_key)
    return assign(df, centroids, vec_col)
