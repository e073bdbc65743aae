"""Similarity search over embedding columns (``array<float>``).

* ``cosine_topk`` — exact brute-force top-k: the query set is broadcast
  (small side) and each Arrow batch of the corpus computes a NumPy matmul;
  a final ``row_number`` window keeps k per query. Baseline/oracle path.
* ``lsh_bucketed_topk`` — the scale path: random-hyperplane LSH signatures
  bucket the corpus; queries probe only their bucket (+ optional
  multi-probe neighbors), so the join is equi-keyed and the per-bucket
  candidate set is bounded. Recall < 1 by construction; the baseline
  verifies it.
"""

from __future__ import annotations

from typing import Optional

import numpy as np
import pandas as pd
from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F
from pyspark.sql import types as T


def cosine_expr(a, b):
    """Exact cosine between two array columns — pure Catalyst
    (``zip_with`` products + ``aggregate`` sums)."""
    a = F.col(a) if isinstance(a, str) else a
    b = F.col(b) if isinstance(b, str) else b
    dot = F.aggregate(
        F.zip_with(a, b, lambda x, y: x * y), F.lit(0.0), lambda acc, v: acc + v
    )
    na = F.sqrt(F.aggregate(a, F.lit(0.0), lambda acc, v: acc + v * v))
    nb = F.sqrt(F.aggregate(b, F.lit(0.0), lambda acc, v: acc + v * v))
    return dot / (na * nb)


def cosine_topk(
    corpus: DataFrame,
    queries: DataFrame,
    k: int = 10,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    query_id_col: str = "query_id",
    query_vec_col: str = "embedding",
) -> DataFrame:
    """Exact top-k cosine neighbors per query — broadcast queries, one
    NumPy matmul per Arrow batch of the corpus, per-partition top-k inside
    the UDF, then a global ``row_number`` to finish.

    Scale shape: corpus any size (scanned once, never shuffled until the
    tiny (n_queries × k × partitions) partial-topk output), queries must
    fit in a broadcast (typical for probe sets)."""
    spark = corpus.sparkSession
    qpdf = queries.select(query_id_col, query_vec_col).toPandas()
    qids = qpdf[query_id_col].to_numpy()
    qmat = np.stack(qpdf[query_vec_col].to_numpy()).astype("float64")
    qnorm = np.linalg.norm(qmat, axis=1)
    qnorm[qnorm == 0] = 1.0
    b_q = spark.sparkContext.broadcast((qids, qmat / qnorm[:, None]))
    kk = int(k)

    schema = T.StructType(
        [
            T.StructField("query_id", T.LongType()),
            T.StructField("neighbor_id", T.LongType()),
            T.StructField("cosine", T.DoubleType()),
        ]
    )

    def scan(batches):
        qids, qmat = b_q.value
        for pdf in batches:
            if len(pdf) == 0:
                continue
            ids = pdf[id_col].to_numpy()
            mat = np.stack(pdf[vec_col].to_numpy()).astype("float64")
            norms = np.linalg.norm(mat, axis=1)
            norms[norms == 0] = 1.0
            sims = qmat @ (mat / norms[:, None]).T  # (n_queries, batch)
            top = min(kk, sims.shape[1])
            part = np.argpartition(-sims, top - 1, axis=1)[:, :top]
            out_q = np.repeat(qids, top)
            out_n = ids[part.ravel()]
            out_s = np.take_along_axis(sims, part, axis=1).ravel()
            yield pd.DataFrame({"query_id": out_q, "neighbor_id": out_n, "cosine": out_s})

    partial = corpus.select(id_col, vec_col).mapInPandas(scan, schema)
    win = Window.partitionBy("query_id").orderBy(F.desc("cosine"), F.asc("neighbor_id"))
    return partial.withColumn("rank", F.row_number().over(win)).filter(F.col("rank") <= kk)


def hyperplane_signature(
    vec_col: str, dim: int, num_planes: int = 16, seed: int = 11
):
    """Random-hyperplane LSH bucket id as a column expression: sign bits of
    <v, r_i> packed into a long. The hyperplanes are literal arrays —
    ``aggregate(zip_with(...))`` per plane, all JVM-side."""
    rng = np.random.RandomState(seed)
    planes = rng.normal(size=(num_planes, dim))
    v = F.col(vec_col)
    sig = F.lit(0).cast("long")
    for p in range(num_planes):
        plane = F.array(*[F.lit(float(x)) for x in planes[p]])
        dot = F.aggregate(
            F.zip_with(v, plane, lambda x, y: x * y), F.lit(0.0), lambda acc, x: acc + x
        )
        sig = sig.bitwiseOR(
            F.when(dot >= 0, F.shiftleft(F.lit(1).cast("long"), p)).otherwise(F.lit(0).cast("long"))
        )
    return sig


def lsh_bucketed_topk(
    corpus: DataFrame,
    queries: DataFrame,
    k: int = 10,
    dim: Optional[int] = None,
    num_planes: int = 12,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    query_id_col: str = "query_id",
    query_vec_col: str = "embedding",
    seed: int = 11,
) -> DataFrame:
    """Approximate top-k: equi-join corpus and queries on the hyperplane
    bucket, exact cosine within the bucket, row_number top-k. Bounded
    shuffle (bucket key), approximate recall."""
    if dim is None:
        dim = len(corpus.select(vec_col).first()[0])
    c = corpus.select(
        F.col(id_col).alias("neighbor_id"),
        F.col(vec_col).alias("__cvec"),
        hyperplane_signature(vec_col, dim, num_planes, seed).alias("bucket"),
    )
    q = queries.select(
        F.col(query_id_col).alias("query_id"),
        F.col(query_vec_col).alias("__qvec"),
        hyperplane_signature(query_vec_col, dim, num_planes, seed).alias("bucket"),
    )
    joined = q.join(c, "bucket").withColumn(
        "cosine", cosine_expr(F.col("__qvec").cast("array<double>"), F.col("__cvec").cast("array<double>"))
    )
    win = Window.partitionBy("query_id").orderBy(F.desc("cosine"), F.asc("neighbor_id"))
    return (
        joined.withColumn("rank", F.row_number().over(win))
        .filter(F.col("rank") <= k)
        .select("query_id", "neighbor_id", "cosine", "rank")
    )
