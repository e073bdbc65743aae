"""Distributed K-Means over embedding columns — bit-deterministic Lloyd
iterations for corpus clustering, IVF index training, and diversity-aware
sampling.

The classic distributed-Lloyd shape (one scan per iteration, broadcast
centroids, map-side partial aggregation — what MLlib does with RDD
``treeAggregate``) is re-expressed as DataFrame ops with one extra twist
that buys **bit-reproducibility at any parallelism**:

* Embeddings are quantized once to int64 fixed-point
  (``round(x · 2^quantize_bits)``).  Per-cluster, per-dimension sums of
  int64 are EXACT, so the centroid update is independent of partitioning,
  task order, and AQE decisions — float sums would drift by ulps and can
  flip later assignments.  Magnitude budget: |x| ≤ 2^9, bits = 16,
  10^12 rows → sums < 2^(9+16+40) = 2^65… so per-dim sums use Spark's
  DECIMAL(38,0) aggregation (exact, overflow-checked) and the driver
  converts through Python int.  At any realistic scale this is exact.
* Distances are serial left-folds over dimensions of
  ``(x − c)·(x − c)`` in float64 — fixed evaluation order, so any twin
  engine (DuckDB oracle, NumPy reference) reproduces the argmin exactly;
  ties break to the lowest cluster id.
* Init is the k rows with the smallest DuckDB-expressible arithmetic hash
  ``(id · 2654435761) mod 2^31`` (Knuth multiplicative; xxhash64 has no
  cross-engine twin), tie-broken by id.

Per iteration: ONE scan → codegen'd argmin projection → ONE map-side-
combinable aggregate collapsing to k·(dim+1) numbers per task → a k-row
collect (the documented tiny side).  The data itself never shuffles.

Cross-op use: ``verde_spark.operators.similarity.train_ivf_centroids``
trains on a driver-side sample (fast, probabilistic); this operator is the
full-corpus, reproducible alternative — its centroids can be fed straight
into ``ivf_topk(centroids=...)``.
"""

from __future__ import annotations

import math
from dataclasses import dataclass

import numpy as np
import pandas as pd
from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

__all__ = [
    "KMeansModel",
    "quantize_expr",
    "kmeans_init",
    "kmeans_assign_expr",
    "kmeans_assign_udf",
    "kmeans_fit",
    "reference_kmeans",
    "kmeans_sql",
]

# ONE definition of the Knuth multiplicative hash across the repo: the
# seeding here must stay in lockstep with mixing's rank hash and both
# DuckDB twins — a local copy would silently desynchronize on a tweak
from .mixing import _HASH_MOD, _HASH_MULT, _hash_sql, mix_hash_expr


@dataclass(frozen=True)
class KMeansModel:
    """Fitted state: ``centroids[c][d]`` float64 in the QUANTIZED domain
    (scale 2^bits — argmin is scale-invariant), plus sizes per cluster."""

    centroids: tuple  # k tuples of dim floats
    sizes: tuple  # k ints
    quantize_bits: int

    def centroids_unit_scale(self) -> np.ndarray:
        """Centroids back in the embedding's own scale (for ivf_topk)."""
        return np.asarray(self.centroids, dtype="float64") / float(
            1 << self.quantize_bits
        )


def quantize_expr(vec: Column | str, bits: int = 16) -> Column:
    """Fixed-point int64 array: ``round(x · 2^bits)`` half-away-from-zero
    (Spark ``round`` semantics; DuckDB/NumPy twins match — tested)."""
    v = F.col(vec) if isinstance(vec, str) else vec
    scale = float(1 << bits)
    return F.transform(
        v, lambda x: F.round(x.cast("double") * F.lit(scale)).cast("long")
    )


def kmeans_init(
    df: DataFrame, k: int, *, id_col: str, qvec_col: str
) -> list[list[int]]:
    """Deterministic seed centroids: the k rows with the smallest
    ``(id·2654435761) mod 2^31`` (tie → id).  One TakeOrderedAndProject;
    the k-row collect is the documented tiny side."""
    rows = (
        df.select(
            F.col(id_col).alias("__id"), F.col(qvec_col).alias("__qv")
        )
        .orderBy(
            # mixing's shared hash reduces the id mod 2^31 BEFORE
            # multiplying: 2^31 · 2654435761 < 2^63, while a raw 64-bit
            # (hash) id would overflow the ANSI-checked long multiply
            # (caught by dogfood_r4)
            mix_hash_expr(F.col("__id")),
            F.col("__id"),
        )
        .limit(k)
        .collect()
    )
    if len(rows) < k:
        raise ValueError(f"corpus has {len(rows)} rows < k={k}")
    return [[int(x) for x in r["__qv"]] for r in rows]


def _dist_expr(qv: Column, centroid: list[float]) -> Column:
    """Serial left-fold squared distance in float64 — fixed order."""
    clit = F.array(*[F.lit(float(c)) for c in centroid])
    return F.aggregate(
        F.zip_with(
            qv, clit, lambda x, c: (x.cast("double") - c) * (x.cast("double") - c)
        ),
        F.lit(0.0),
        lambda acc, t: acc + t,
    )


def kmeans_assign_expr(
    qvec: Column | str, centroids: list[list[float]]
) -> Column:
    """Argmin cluster id (tie → lowest id) as a pure codegen projection:
    array of (dist, id) structs → ``array_min`` (lexicographic)."""
    qv = F.col(qvec) if isinstance(qvec, str) else qvec
    pairs = F.array(
        *[
            F.struct(
                _dist_expr(qv, c).alias("d"), F.lit(i).alias("c")
            )
            for i, c in enumerate(centroids)
        ]
    )
    return F.array_min(pairs)["c"].cast("int")


def kmeans_assign_udf(
    qvec: Column | str, centroids: list[list[float]]
) -> Column:
    """Arrow fast-path argmin — BIT-IDENTICAL to
    :func:`kmeans_assign_expr` by construction: the squared distance
    accumulates serially over dimensions (one vectorized add per dim, so
    per-row addition order equals the Catalyst fold), and ``argmin``
    takes the first minimum (= lowest cluster id).  Use for large k·dim
    where the unrolled codegen expression gets heavy; the Catalyst
    engine remains the oracle-parity reference."""
    from pyspark.sql.functions import pandas_udf

    C = np.asarray(centroids, dtype="float64")  # (k, d)

    @pandas_udf("int")
    def assign(vecs: pd.Series) -> pd.Series:
        X = np.array(vecs.tolist(), dtype="float64")  # (n, d)
        n = X.shape[0]
        if n == 0:
            return pd.Series([], dtype="int32")
        dist = np.zeros((n, C.shape[0]))
        for j in range(C.shape[1]):  # serial over dims = the fold order
            dj = X[:, j : j + 1] - C[None, :, j]
            dist = dist + dj * dj
        return pd.Series(np.argmin(dist, axis=1).astype("int32"))

    return assign(F.col(qvec) if isinstance(qvec, str) else qvec)


def kmeans_fit(
    df: DataFrame,
    k: int = 8,
    iterations: int = 5,
    *,
    vec_col: str = "embedding",
    id_col: str = "vec_id",
    quantize_bits: int = 16,
    engine: str = "catalyst",
) -> tuple[DataFrame, KMeansModel]:
    """Lloyd k-means → ``(assignments (id_col, cluster int), model)``.

    The returned assignments use the centroids after ``iterations − 1``
    updates (the model's centroids include the final update), matching
    :func:`reference_kmeans` and the generated :func:`kmeans_sql` oracle.
    Empty clusters keep their previous centroid.

    Shuffle budget: per iteration one map-side-combinable aggregate whose
    exchange carries k·(dim+1) DECIMAL/longs per task — the embedding
    rows themselves never move.  ``df`` is scanned ``iterations`` times;
    persist upstream if the scan is expensive.

    ``engine="catalyst"`` (default) assigns via the unrolled codegen
    expression; ``engine="arrow"`` uses the vectorized NumPy UDF —
    bit-identical by construction (serial per-dim accumulation, tested),
    preferable when k·dim is large enough to strain codegen.
    """
    if iterations < 1:
        raise ValueError("iterations must be >= 1")
    if engine not in ("catalyst", "arrow"):
        raise ValueError(f"unknown engine: {engine!r}")
    q = df.select(
        F.col(id_col), quantize_expr(vec_col, quantize_bits).alias("__qv")
    )
    # the dim probe must skip NULL vectors and fail loud on an empty
    # corpus (head() returning None would otherwise raise an opaque
    # 'NoneType is not subscriptable' before kmeans_init's clear error)
    head = q.filter(F.col("__qv").isNotNull()).select(F.size("__qv")).head()
    if head is None:
        raise ValueError("kmeans_fit: corpus has no non-null vectors")
    dim = int(head[0])
    init = kmeans_init(q, k, id_col=id_col, qvec_col="__qv")
    centroids: list[list[float]] = [[float(x) for x in c] for c in init]
    sizes = [0] * k

    assign_fn = (
        kmeans_assign_expr if engine == "catalyst" else kmeans_assign_udf
    )
    assigned = None
    for it in range(iterations):
        assigned = q.select(
            id_col,
            "__qv",
            assign_fn("__qv", centroids).alias("cluster"),
        )
        # exact integer per-dim sums (DECIMAL(38,0) — overflow-checked)
        sums = (
            assigned.groupBy("cluster")
            .agg(
                F.count(F.lit(1)).alias("__n"),
                *[
                    F.sum(F.element_at("__qv", d + 1).cast("decimal(38,0)")).alias(
                        f"__s{d}"
                    )
                    for d in range(dim)
                ],
            )
            .collect()
        )
        by_c = {int(r["cluster"]): r for r in sums}
        new_centroids, new_sizes = [], []
        for c in range(k):
            r = by_c.get(c)
            if r is None:
                new_centroids.append(centroids[c])  # empty: keep previous
                new_sizes.append(0)
            else:
                n = int(r["__n"])
                # round the exact integer sum to double FIRST, then one
                # IEEE division — the semantics every twin can replay
                # (DuckDB casts the HUGEINT sum to DOUBLE before
                # dividing; Python's exact int/n true division is
                # correctly-rounded in ONE step and diverges by 1 ulp
                # once a sum exceeds 2^53, which can flip a near-tie
                # argmin next iteration)
                new_centroids.append(
                    [
                        float(int(r[f"__s{d}"])) / float(n)
                        for d in range(dim)
                    ]
                )
                new_sizes.append(n)
        centroids, sizes = new_centroids, new_sizes

    model = KMeansModel(
        centroids=tuple(tuple(c) for c in centroids),
        sizes=tuple(sizes),
        quantize_bits=quantize_bits,
    )
    return assigned.select(id_col, "cluster"), model


def reference_kmeans(
    ids: list[int],
    vecs: list[list[float]],
    k: int,
    iterations: int,
    *,
    quantize_bits: int = 16,
) -> tuple[dict[int, int], list[list[float]]]:
    """Pure-Python reference (serial folds, exact int sums) — must match
    :func:`kmeans_fit` EXACTLY, not approximately."""
    scale = float(1 << quantize_bits)

    def quant(x: float) -> int:
        from decimal import ROUND_HALF_UP, Decimal

        v = float(x) * scale  # float32 → float64 exact, same as Spark
        # HALF_UP on the EXACT decimal expansion of the double — what
        # Spark's BigDecimal round and DuckDB's std::round both do.  The
        # old floor(abs(v)+0.5) re-rounds in floating point, so a value
        # just UNDER a halfway point (e.g. 0.49999999999999994 + 0.5 ==
        # 1.0 exactly) quantized one unit high
        return int(Decimal(v).quantize(Decimal(1), rounding=ROUND_HALF_UP))

    qvs = {i: [quant(x) for x in v] for i, v in zip(ids, vecs)}
    order = sorted(ids, key=lambda i: (((i % _HASH_MOD) * _HASH_MULT) % _HASH_MOD, i))
    centroids = [[float(x) for x in qvs[i]] for i in order[:k]]
    assign: dict[int, int] = {}
    for it in range(iterations):
        for i in ids:
            best = None
            for c, cv in enumerate(centroids):
                acc = 0.0
                for x, cd in zip(qvs[i], cv):
                    t = (float(x) - cd) * (float(x) - cd)
                    acc = acc + t
                if best is None or (acc, c) < best:
                    best = (acc, c)
            assign[i] = best[1]
        sums: dict[int, list[int]] = {}
        counts: dict[int, int] = {}
        for i in ids:
            c = assign[i]
            counts[c] = counts.get(c, 0) + 1
            s = sums.setdefault(c, [0] * len(qvs[i]))
            for d, x in enumerate(qvs[i]):
                s[d] += x
        centroids = [
            # float(sum) / float(n): double-then-divide, matching
            # kmeans_fit and the DuckDB twin (see kmeans_fit's note)
            [
                float(sums[c][d]) / float(counts[c])
                for d in range(len(centroids[c]))
            ]
            if c in counts
            else centroids[c]
            for c in range(k)
        ]
    return assign, centroids


def kmeans_sql(
    k: int = 8,
    iterations: int = 3,
    dim: int = 64,
    *,
    table: str = "embeddings",
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    quantize_bits: int = 16,
) -> str:
    """Generated DuckDB twin of :func:`kmeans_fit`'s final assignment —
    the Lloyd loop unrolled as CTEs (init → assign → exact-int update →
    assign → ...), same quantization, same serial-fold distance order,
    same tie-breaks.  Output: ``(id_col, cluster int)``."""
    scale = float(1 << quantize_bits)
    dist = (
        "list_reduce(list_prepend(CAST(0.0 AS DOUBLE), "
        f"list_transform(range(1, {dim + 1}), j -> "
        "(CAST(qv[j] AS DOUBLE) - cv[j]) * (CAST(qv[j] AS DOUBLE) - cv[j]))), "
        "(a, b) -> a + b)"
    )
    parts = [
        f"""
        q AS (
          SELECT {id_col}, list_transform({vec_col}, x ->
            CAST(round(CAST(x AS DOUBLE) * {scale!r}) AS BIGINT)) AS qv
          FROM {table}
        ),
        c0 AS (
          SELECT CAST(row_number() OVER (
                   ORDER BY {_hash_sql(id_col)}, {id_col}
                 ) - 1 AS INT) AS c,
                 list_transform(qv, v -> CAST(v AS DOUBLE)) AS cv
          FROM q
          ORDER BY {_hash_sql(id_col)}, {id_col}
          LIMIT {k}
        )"""
    ]
    for it in range(1, iterations + 1):
        prev = f"c{it - 1}"
        parts.append(
            f"""
        a{it} AS (
          SELECT {id_col}, qv, cluster FROM (
            SELECT q.{id_col}, q.qv, {prev}.c AS cluster,
                   row_number() OVER (
                     PARTITION BY q.{id_col}
                     ORDER BY {dist}, {prev}.c
                   ) AS rn
            FROM q CROSS JOIN {prev}
          ) WHERE rn = 1
        )"""
        )
        if it < iterations:
            parts.append(
                f"""
        n{it} AS (
          SELECT cluster,
                 list(CAST(s AS DOUBLE) / CAST(n AS DOUBLE) ORDER BY dim) AS cv
          FROM (
            SELECT cluster, dim, sum(val) AS s, count(*) AS n
            FROM (
              SELECT cluster,
                     unnest(qv) AS val,
                     unnest(range(1, {dim + 1})) AS dim
              FROM a{it}
            ) GROUP BY cluster, dim
          ) GROUP BY cluster
        ),
        c{it} AS (
          SELECT {prev}.c, COALESCE(n{it}.cv, {prev}.cv) AS cv
          FROM {prev} LEFT JOIN n{it} ON n{it}.cluster = {prev}.c
        )"""
            )
    return (
        "WITH "
        + ",".join(parts)
        + f"""
        SELECT {id_col}, CAST(cluster AS INT) AS cluster
        FROM a{iterations} ORDER BY {id_col}
    """
    )
