"""Distributed K-Means: EXACT parity vs the pure-Python reference (the
bit-determinism contract), DuckDB unrolled-SQL twin, partition invariance,
plan shape."""

import os

import duckdb
import pytest
from pyspark.sql import functions as F

from verde_spark.operators.clustering import (
    kmeans_fit,
    kmeans_sql,
    quantize_expr,
    reference_kmeans,
)

SF = os.environ.get("SPARK_GRAFT_TEST_SF", "/root/testdata/sf0.001")


@pytest.fixture(scope="module")
def emb(spark):
    return spark.read.parquet(f"{SF}/embeddings.parquet")


def test_quantize_matches_reference(spark, emb):
    import math

    rows = emb.select("vec_id", "embedding", quantize_expr("embedding").alias("qv")).collect()
    for r in rows:
        for x, q in zip(r["embedding"], r["qv"]):
            v = float(x) * 65536.0
            want = int(math.floor(abs(v) + 0.5)) * (1 if v >= 0 else -1)
            assert q == want


def test_kmeans_exact_parity_with_python(spark, emb):
    assigned, model = kmeans_fit(emb, k=6, iterations=4)
    got = {r["vec_id"]: r["cluster"] for r in assigned.collect()}
    rows = emb.select("vec_id", "embedding").collect()
    ids = [r["vec_id"] for r in rows]
    vecs = [list(r["embedding"]) for r in rows]
    want_assign, want_centroids = reference_kmeans(ids, vecs, k=6, iterations=4)
    assert got == want_assign                      # exact, not approx
    for mc, rc in zip(model.centroids, want_centroids):
        assert list(mc) == rc                      # bitwise centroid match
    assert sum(model.sizes) == len(ids)


def test_kmeans_matches_duckdb_unrolled(spark, emb):
    assigned, _ = kmeans_fit(emb, k=5, iterations=3)
    got = sorted((r["vec_id"], r["cluster"]) for r in assigned.collect())
    con = duckdb.connect()
    con.execute(f"CREATE VIEW embeddings AS SELECT * FROM '{SF}/embeddings.parquet'")
    want = [tuple(r) for r in con.execute(kmeans_sql(k=5, iterations=3)).fetchall()]
    assert got == want


def test_kmeans_partition_invariant(spark, emb):
    a1, m1 = kmeans_fit(emb.repartition(1), k=4, iterations=3)
    a7, m7 = kmeans_fit(emb.repartition(7, "label"), k=4, iterations=3)
    assert m1.centroids == m7.centroids
    assert sorted(map(tuple, a1.collect())) == sorted(map(tuple, a7.collect()))


def test_kmeans_clusters_are_meaningful(spark, emb):
    # points sharing a cluster should be nearer their own centroid than
    # a random other centroid on average — sanity, not bit-exactness
    assigned, model = kmeans_fit(emb, k=8, iterations=5)
    sizes = [s for s in model.sizes if s > 0]
    assert len(sizes) >= 2 and sum(sizes) == emb.count()


def test_assignment_plan_is_codegen_projection(spark, emb):
    from verde_spark.operators.clustering import kmeans_assign_expr

    q = emb.select("vec_id", quantize_expr("embedding").alias("__qv"))
    centroids = [[0.0] * 64, [1.0] * 64]
    plan = (
        q.select("vec_id", kmeans_assign_expr("__qv", centroids).alias("c"))
        ._jdf.queryExecution()
        .executedPlan()
        .toString()
    )
    assert "Exchange" not in plan and "EvalPython" not in plan


def test_kmeans_centroids_feed_ivf(spark, emb):
    """Cross-op: full-corpus reproducible centroids power the IVF ANN
    path; with probe-all the result must equal exact top-k regardless of
    the centroids used (same contract the ivf_topk oracle relies on)."""
    from pyspark.sql import functions as F

    from verde_spark.operators.similarity import cosine_topk, ivf_topk

    _, model = kmeans_fit(emb, k=4, iterations=2)
    queries = emb.filter(F.col("vec_id") < 5).select(
        F.col("vec_id").alias("query_id"), "embedding"
    )
    got = ivf_topk(
        emb, queries, k=3, centroids=model.centroids_unit_scale(), n_probe=4
    )
    want = cosine_topk(emb, queries, k=3)
    assert sorted((r["query_id"], r["rank"], r["neighbor_id"]) for r in got.collect()) == sorted(
        (r["query_id"], r["rank"], r["neighbor_id"]) for r in want.collect()
    )


def test_kmeans_arrow_engine_bit_identical(spark, emb):
    """engine='arrow' (vectorized NumPy, serial per-dim accumulation)
    must reproduce the Catalyst fold EXACTLY — assignments and centroids."""
    a_cat, m_cat = kmeans_fit(emb, k=6, iterations=3, engine="catalyst")
    a_arr, m_arr = kmeans_fit(emb, k=6, iterations=3, engine="arrow")
    assert m_cat.centroids == m_arr.centroids
    assert sorted(map(tuple, a_cat.collect())) == sorted(map(tuple, a_arr.collect()))


def test_kmeans_small_k_raises(spark, emb):
    with pytest.raises(ValueError):
        kmeans_fit(emb.limit(3), k=10, iterations=1)


def test_kmeans_empty_corpus_clear_error(spark):
    """An empty (or all-null-vector) corpus raises a clear ValueError,
    not 'NoneType is not subscriptable' from the dim probe (review r5)."""
    import pytest

    from verde_spark.operators.clustering import kmeans_fit

    empty = spark.createDataFrame(
        [], "vec_id long, embedding array<double>"
    )
    with pytest.raises(ValueError, match="no non-null vectors"):
        kmeans_fit(empty, k=2, iterations=1)
    nulls = spark.createDataFrame(
        [(1, None), (2, None)], "vec_id long, embedding array<double>"
    )
    with pytest.raises(ValueError, match="no non-null vectors"):
        kmeans_fit(nulls, k=2, iterations=1)
