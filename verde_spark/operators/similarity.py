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
    if len(qpdf) == 0:
        # np.stack on an empty query set would raise; the right answer is
        # an empty result with the contract schema
        return spark.createDataFrame(
            [], "query_id long, neighbor_id long, cosine double, rank int"
        )
    qids = qpdf[query_id_col].to_numpy()
    qmat = np.stack(qpdf[query_vec_col].to_numpy()).astype("float64")
    qnorm = np.linalg.norm(qmat, axis=1)
    qnorm[qnorm == 0] = 1.0
    b_q = spark.sparkContext.broadcast((qids, qmat / qnorm[:, None]))
    kk = int(k)

    # id dtypes follow the inputs (string/int/long ids all valid keys —
    # a hardcoded LongType would crash the Arrow conversion on non-long
    # id columns the expression engines accept)
    schema = T.StructType(
        [
            T.StructField(
                "query_id", queries.schema[query_id_col].dataType
            ),
            T.StructField("neighbor_id", corpus.schema[id_col].dataType),
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
            # id-ascending candidate order + STABLE argsort makes the
            # per-batch selection exactly (cosine DESC, id ASC) even on
            # exact cosine ties (duplicate embeddings) — the same total
            # order the final window applies, so the partial top-k is
            # tie-exact, not just tie-arbitrary argpartition
            by_id = np.argsort(ids, kind="stable")
            ids = ids[by_id]
            mat = mat[by_id]
            norms = np.linalg.norm(mat, axis=1)
            norms[norms == 0] = 1.0
            sims = qmat @ (mat / norms[:, None]).T  # (n_queries, batch)
            top = min(kk, sims.shape[1])
            part = np.argsort(-sims, axis=1, kind="stable")[:, :top]
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
    <v, r_i> packed into a long — all JVM-side.

    Single traversal of the vector: one ``aggregate`` carries all
    *num_planes* running dot products (``zip_with`` against a literal
    [dim][planes] coefficient matrix), then one fold packs the sign bits.
    Same left-to-right accumulation order as the per-plane round-1
    formulation ⇒ bit-identical dots and buckets, ~2× faster and a far
    smaller expression tree.
    """
    rng = np.random.RandomState(seed)
    planes = rng.normal(size=(num_planes, dim))
    # transposed literal: row j holds plane coefficients for component j
    P = F.array(
        *[
            F.array(*[F.lit(float(planes[p][j])) for p in range(num_planes)])
            for j in range(dim)
        ]
    )
    v = F.col(vec_col) if isinstance(vec_col, str) else vec_col
    zipped = F.arrays_zip(v.cast("array<double>").alias("x"), P.alias("row"))
    dots = F.aggregate(
        zipped,
        F.array_repeat(F.lit(0.0), num_planes),
        lambda acc, e: F.zip_with(acc, e["row"], lambda a, c: a + e["x"] * c),
    )
    masks = F.array(*[F.shiftleft(F.lit(1).cast("long"), p) for p in range(num_planes)])
    return F.aggregate(
        F.zip_with(dots, masks, lambda d, m: F.when(d >= 0, m).otherwise(F.lit(0).cast("long"))),
        F.lit(0).cast("long"),
        lambda acc, x: acc.bitwiseOR(x),
    )


def lsh_bucketed_topk(
    corpus: DataFrame,
    queries: DataFrame,
    k: int = 10,
    dim: Optional[int] = None,
    num_planes: int = 12,
    multiprobe: int = 0,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    query_id_col: str = "query_id",
    query_vec_col: str = "embedding",
    seed: int = 11,
) -> DataFrame:
    """Approximate top-k: equi-join corpus and queries on the hyperplane
    bucket, exact cosine within the bucket, row_number top-k. Bounded
    shuffle (bucket key), approximate recall.

    ``multiprobe=p`` additionally probes, per query, the ``p`` buckets at
    Hamming distance 1 from its own (one sign bit flipped — the buckets a
    near-neighbor most likely fell into): recall rises roughly like
    adding tables, but with NO second corpus pass or signature — only the
    tiny query side explodes ×(p+1).  The join stays an equi-join.
    """
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
    if multiprobe:
        probes = F.array(
            F.col("bucket"),
            *[
                F.col("bucket").bitwiseXOR(F.shiftleft(F.lit(1).cast("long"), p))
                for p in range(min(multiprobe, num_planes))
            ],
        )
        q = q.select(
            "query_id", "__qvec", F.explode(probes).alias("bucket")
        )
    joined = q.join(c, "bucket").withColumn(
        "cosine", cosine_expr(F.col("__qvec").cast("array<double>"), F.col("__cvec").cast("array<double>"))
    )
    if multiprobe:
        # multiprobe can rediscover the same neighbor via several buckets;
        # without it pairs are unique and the extra shuffle is skipped
        joined = joined.dropDuplicates(["query_id", "neighbor_id"])
    win = Window.partitionBy("query_id").orderBy(F.desc("cosine"), F.asc("neighbor_id"))
    return (
        joined.withColumn("rank", F.row_number().over(win))
        .filter(F.col("rank") <= k)
        .select("query_id", "neighbor_id", "cosine", "rank")
    )


# ---------------------------------------------------------------------------
# IVF (inverted-file) ANN — the partition-pruned scale path
# ---------------------------------------------------------------------------


def train_ivf_centroids(
    corpus: DataFrame,
    n_centroids: int = 64,
    sample_size: int = 20_000,
    iters: int = 10,
    vec_col: str = "embedding",
    seed: int = 17,
) -> np.ndarray:
    """Spherical k-means centroids from a bounded driver-side sample.

    Index-build step (runs once, offline): one ``count`` to size the
    sample fraction, one scan to collect ≤ *sample_size* vectors, then
    Lloyd iterations in NumPy on the driver (cosine assignment on
    L2-normalized vectors).  Centroid quality needs a representative
    sample, not the full corpus — at 100 TB the sample is still ~20k rows.
    Returns an (n_centroids, dim) float64 array of unit-norm centroids.
    """
    total = corpus.count()
    if total == 0:
        raise ValueError("cannot train IVF centroids on an empty corpus")
    frac = min(1.0, 1.2 * sample_size / total)
    pdf = (
        corpus.select(vec_col).sample(False, frac, seed).limit(sample_size).toPandas()
    )
    X = np.stack(pdf[vec_col].to_numpy()).astype("float64")
    norms = np.linalg.norm(X, axis=1)
    norms[norms == 0] = 1.0
    X = X / norms[:, None]
    rng = np.random.RandomState(seed)
    kc = min(n_centroids, len(X))
    C = X[rng.choice(len(X), size=kc, replace=False)]
    for _ in range(iters):
        assign = np.argmax(X @ C.T, axis=1)
        for j in range(kc):
            members = X[assign == j]
            if len(members):
                C[j] = members.mean(axis=0)
        cn = np.linalg.norm(C, axis=1)
        cn[cn == 0] = 1.0
        C = C / cn[:, None]
    return C


def ivf_assign(
    df: DataFrame,
    centroids: np.ndarray,
    vec_col: str = "embedding",
    out_col: str = "cluster",
) -> DataFrame:
    """Nearest-centroid (cosine) cluster id per row — broadcast centroid
    matrix, one NumPy matmul per Arrow batch; no shuffle."""
    from pyspark.sql.functions import pandas_udf

    b_c = df.sparkSession.sparkContext.broadcast(np.asarray(centroids, dtype="float64"))

    @pandas_udf("int")
    def assign(vecs: pd.Series) -> pd.Series:
        C = b_c.value
        if len(vecs) == 0:
            return pd.Series([], dtype="int32")
        M = np.stack(vecs.to_numpy()).astype("float64")
        n = np.linalg.norm(M, axis=1)
        n[n == 0] = 1.0
        return pd.Series(np.argmax((M / n[:, None]) @ C.T, axis=1).astype("int32"))

    return df.withColumn(out_col, assign(F.col(vec_col)))


def build_ivf_index(
    corpus: DataFrame,
    path: str,
    centroids: np.ndarray,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
) -> None:
    """Write the corpus as parquet **partitioned by cluster** — the IVF
    inverted file.  A probe that filters ``cluster IN (...)`` then reads
    only n_probe/n_centroids of the data via partition pruning (the scan's
    ``PartitionFilters``), which is the property that makes IVF the 100 TB
    path where brute force scans everything."""
    ivf_assign(corpus.select(id_col, vec_col), centroids, vec_col).write.mode(
        "overwrite"
    ).partitionBy("cluster").parquet(path)


def ivf_topk(
    corpus: DataFrame,
    queries: DataFrame,
    k: int = 10,
    centroids: np.ndarray = None,
    n_centroids: int = 64,
    n_probe: int = 8,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    query_id_col: str = "query_id",
    query_vec_col: str = "embedding",
    assigned: bool = False,
    seed: int = 17,
    engine: str = "catalyst",
) -> DataFrame:
    """Approximate top-k cosine neighbors via IVF probing.

    Each query probes its *n_probe* nearest centroids (computed driver-side
    — the query set is the small broadcastable side, same contract as
    :func:`cosine_topk`); the (query, cluster) probe table is
    broadcast-joined to the cluster-assigned corpus, exact cosine runs on
    candidates only, and a ``row_number`` window keeps k per query.

    Scale shape: the corpus is never shuffled — the broadcast hash join
    drops non-probed rows at the scan; reading a :func:`build_ivf_index`
    layout with ``spark.read.parquet(path).filter(col("cluster").isin(...))``
    prunes untouched partitions entirely.  Recall < 1 by construction
    (clusters not probed are unseen); raise ``n_probe`` to trade cost for
    recall.  Pass ``assigned=True`` when *corpus* already carries a
    ``cluster`` column (e.g. read back from :func:`build_ivf_index`).

    ``engine="catalyst"`` (default — the cross-engine oracle path)
    scores candidates with :func:`cosine_expr` after the broadcast join.
    ``engine="arrow"`` is the PRODUCTION path (the repo-wide
    Arrow-production / Catalyst-oracle discipline): candidates score in
    one ``mapInPandas`` pass — per batch, one NumPy matmul per probed
    cluster against that cluster's query block, partial top-k INSIDE the
    udf (so only queries × k × batches rows reach the final window,
    :func:`cosine_topk`'s shape, instead of the full candidate set) —
    measured ~1-2 orders faster on large corpora.  Same candidate set,
    same (cosine DESC, id ASC) tiebreak; cosines differ from the fold
    only in float64 summation order (NumPy dot), and a zero-norm vector
    scores 0-ish (norm clamped to 1, the :func:`cosine_topk`
    convention) where the fold yields NaN/NULL.  A vector CONTAINING
    NaN diverges the other way: Spark's descending sort ranks NaN above
    every real cosine (catalyst path returns it first) while NumPy's
    argsort places NaN last (arrow path drops it) — garbage embeddings
    must be filtered upstream, the engines agree only on finite input.
    Neighbor-set agreement is pinned in pytest.
    """
    if engine not in ("catalyst", "arrow"):
        raise ValueError(f"unknown engine: {engine!r}")
    if centroids is None:
        centroids = train_ivf_centroids(
            corpus, n_centroids, vec_col=vec_col, seed=seed
        )
    C = np.asarray(centroids, dtype="float64")
    c = (
        corpus
        if assigned
        else ivf_assign(corpus.select(id_col, vec_col), C, vec_col)
    )
    qpdf = queries.select(query_id_col, query_vec_col).toPandas()
    if len(qpdf) == 0:
        return corpus.sparkSession.createDataFrame(
            [], "query_id long, neighbor_id long, cosine double, rank int"
        )
    qmat = np.stack(qpdf[query_vec_col].to_numpy()).astype("float64")
    qn = np.linalg.norm(qmat, axis=1)
    qn[qn == 0] = 1.0
    probes = np.argsort(-((qmat / qn[:, None]) @ C.T), axis=1)[:, : min(n_probe, len(C))]
    probe_rows = [
        (int(qid), [float(x) for x in vec], int(cl))
        for qid, vec, row in zip(qpdf[query_id_col], qpdf[query_vec_col], probes)
        for cl in row
    ]
    spark = corpus.sparkSession
    # a probed-cluster IN-filter is semantically free (unprobed rows
    # cannot survive the probe join) and becomes a static
    # PartitionFilter on a build_ivf_index layout — whole untouched
    # partitions never leave the scan
    probed_clusters = sorted({int(cl) for row in probes for cl in row})
    c = c.filter(F.col("cluster").isin(probed_clusters))
    if engine == "arrow":
        import pandas as pd
        from pyspark.sql import types as T

        # per-cluster query blocks: cluster -> (qids, normalized Q)
        qnorm = qmat / qn[:, None]
        blocks: dict = {}
        for qi, row in enumerate(probes):
            for cl in row:
                blocks.setdefault(int(cl), []).append(qi)
        bmap = {
            cl: (
                qpdf[query_id_col].to_numpy()[idx],
                qnorm[idx],
            )
            for cl, idx in blocks.items()
        }
        b_blocks = spark.sparkContext.broadcast(bmap)
        kk = int(k)

        schema = T.StructType([
            T.StructField(
                "query_id", queries.schema[query_id_col].dataType
            ),
            T.StructField("neighbor_id", corpus.schema[id_col].dataType),
            T.StructField("cosine", T.DoubleType()),
        ])

        def scan(batches):
            bm = b_blocks.value
            for pdf in batches:
                if len(pdf) == 0:
                    continue
                for cl, grp in pdf.groupby("cluster"):
                    qb = bm.get(int(cl))
                    if qb is None:
                        continue
                    qids, Q = qb
                    ids = grp[id_col].to_numpy()
                    M = np.stack(grp[vec_col].to_numpy()).astype("float64")
                    # id-ascending order + stable argsort: the per-batch
                    # selection is exactly (cosine DESC, id ASC) even on
                    # exact cosine ties — see cosine_topk's scan
                    by_id = np.argsort(ids, kind="stable")
                    ids = ids[by_id]
                    M = M[by_id]
                    nrm = np.linalg.norm(M, axis=1)
                    nrm[nrm == 0] = 1.0
                    sims = Q @ (M / nrm[:, None]).T  # (q_block, batch)
                    top = min(kk, sims.shape[1])
                    part = np.argsort(-sims, axis=1, kind="stable")[:, :top]
                    yield pd.DataFrame({
                        "query_id": np.repeat(qids, top),
                        "neighbor_id": ids[part.ravel()],
                        "cosine": np.take_along_axis(sims, part, axis=1).ravel(),
                    })

        partial = c.select("cluster", id_col, vec_col).mapInPandas(scan, schema)
        win_a = Window.partitionBy("query_id").orderBy(
            F.desc("cosine"), F.asc("neighbor_id")
        )
        return (
            partial.withColumn("rank", F.row_number().over(win_a))
            .filter(F.col("rank") <= k)
            .select("query_id", "neighbor_id", "cosine", "rank")
        )
    probe_df = spark.createDataFrame(
        probe_rows, f"query_id long, __qvec array<double>, cluster int"
    )
    joined = c.join(F.broadcast(probe_df), "cluster").withColumn(
        "cosine",
        cosine_expr(F.col("__qvec"), F.col(vec_col).cast("array<double>")),
    )
    win = Window.partitionBy("query_id").orderBy(F.desc("cosine"), F.asc(id_col))
    return (
        joined.withColumn("rank", F.row_number().over(win))
        .filter(F.col("rank") <= k)
        .select("query_id", F.col(id_col).alias("neighbor_id"), "cosine", "rank")
    )
