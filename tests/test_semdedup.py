"""SemDeDup (operators/dedup.semantic_dedup / semantic_dup_pairs):
cluster-partitioned semantic dedup — NumPy reference parity, keep
policies, DuckDB twin of the full pairs query, plan shape."""

import duckdb
import numpy as np
import pandas as pd
import pytest
from pyspark.sql import functions as F

from verde_spark.operators.dedup import (
    semantic_cluster_expr,
    semantic_dedup,
    semantic_dup_pairs,
)

# two well-separated centroids + a third, all unit-ish 4-d vectors
_CENTROIDS = [
    [1.0, 0.0, 0.0, 0.0],
    [0.0, 1.0, 0.0, 0.0],
    [0.0, 0.0, 1.0, 1.0],
]


def _vectors():
    """Deterministic test corpus: per cluster a tight near-dup family
    plus a loner; ids encode the intended cluster."""
    rows = []
    rng_scale = [0.001, 0.002, 0.003]
    for c, base in enumerate(_CENTROIDS):
        for j, eps in enumerate(rng_scale):
            v = [x + eps * (i + 1) for i, x in enumerate(base)]
            rows.append((c * 10 + j, v))
        # a loner far enough inside the same cluster to miss threshold
        loner = [x * 0.5 + (0.4 if i == 3 - c else 0.0) for i, x in enumerate(base)]
        rows.append((c * 10 + 9, loner))
    return rows


def _reference_pairs(rows, centroids, threshold):
    cent = np.asarray(centroids, dtype="float64")
    out = []
    assign = {}
    for i, v in rows:
        d = ((np.asarray(v, dtype="float64") - cent) ** 2).sum(axis=1)
        assign[i] = int(d.argmin())
    for ia, va in rows:
        for ib, vb in rows:
            if ia >= ib or assign[ia] != assign[ib]:
                continue
            a = np.asarray(va, dtype="float64")
            b = np.asarray(vb, dtype="float64")
            cos = float(a @ b / (np.linalg.norm(a) * np.linalg.norm(b)))
            if cos >= threshold:
                out.append((ia, ib, assign[ia], cos))
    return sorted(out)


def test_pairs_match_numpy_reference(spark):
    rows = _vectors()
    df = spark.createDataFrame(rows, "doc_id int, embedding array<double>")
    got = sorted(
        (r["id_a"], r["id_b"], r["cluster"], r["cosine"])
        for r in semantic_dup_pairs(df, _CENTROIDS, threshold=0.999).collect()
    )
    want = _reference_pairs(rows, _CENTROIDS, 0.999)
    assert [(a, b, c) for a, b, c, _ in got] == [
        (a, b, c) for a, b, c, _ in want
    ]
    for (_, _, _, g), (_, _, _, w) in zip(got, want):
        assert g == pytest.approx(w, rel=1e-12)
    # each cluster's 3-member near-dup family yields C(3,2)=3 pairs
    assert len(got) == 9


def test_cross_cluster_pairs_never_compared(spark):
    """Two identical vectors assigned to different clusters (impossible
    by construction here, so instead: vectors in different clusters are
    never paired even at threshold 0)."""
    rows = _vectors()
    df = spark.createDataFrame(rows, "doc_id int, embedding array<double>")
    pairs = semantic_dup_pairs(df, _CENTROIDS, threshold=-1.0).collect()
    assign = {
        r["doc_id"]: r["c"]
        for r in df.select(
            "doc_id", semantic_cluster_expr("embedding", _CENTROIDS).alias("c")
        ).collect()
    }
    for r in pairs:
        assert assign[r["id_a"]] == assign[r["id_b"]] == r["cluster"]


def test_dedup_keep_edge_keeps_farthest_from_centroid(spark):
    rows = _vectors()
    df = spark.createDataFrame(rows, "doc_id int, embedding array<double>")
    kept = sorted(
        r["doc_id"]
        for r in semantic_dedup(
            df, _CENTROIDS, threshold=0.999, keep="edge"
        ).collect()
    )
    # per cluster: the 3-member family collapses to its farthest-from-
    # centroid member (eps=0.003 → ids 2, 12, 22); the loner survives
    assert kept == [2, 9, 12, 19, 22, 29]


def test_dedup_keep_min_id(spark):
    rows = _vectors()
    df = spark.createDataFrame(rows, "doc_id int, embedding array<double>")
    kept = sorted(
        r["doc_id"]
        for r in semantic_dedup(
            df, _CENTROIDS, threshold=0.999, keep="min_id"
        ).collect()
    )
    assert kept == [0, 9, 10, 19, 20, 29]
    with pytest.raises(ValueError):
        semantic_dedup(df, _CENTROIDS, keep="best")


def test_dedup_trains_centroids_when_omitted(spark):
    rows = _vectors()
    df = spark.createDataFrame(rows, "vec_id int, embedding array<double>")
    out = semantic_dedup(
        df, None, threshold=0.999, k=3, iterations=3,
        id_col="vec_id", vec_col="embedding",
    )
    n = out.count()
    # trained centroids still separate the three families: each family
    # collapses (≤1 survivor) and loners survive → between 4 and 6 rows
    assert 3 <= n <= 8
    assert set(out.columns) == {"vec_id", "embedding"}


def test_pairs_match_duckdb_twin(spark):
    """The full driver-query shape replayed in DuckDB: argmin assignment
    from centroid ROWS (vec_id < 3), within-cluster self-join, serial-
    fold cosine — bit-comparable after round(6)."""
    rows = _vectors()
    pdf = pd.DataFrame(
        {"doc_id": [i for i, _ in rows], "embedding": [v for _, v in rows]}
    )
    df = spark.createDataFrame(rows, "doc_id int, embedding array<double>")
    got = [
        (r["id_a"], r["id_b"], r["cluster"], r["cos6"])
        for r in semantic_dup_pairs(df, _CENTROIDS, threshold=0.999)
        .select(
            "id_a", "id_b", "cluster",
            (F.round("cosine", 6) + F.lit(0.0)).alias("cos6"),
        )
        .orderBy("id_a", "id_b")
        .collect()
    ]
    lits = ", ".join(
        "[" + ", ".join(f"'{float(x)!r}'::DOUBLE" for x in c) + "]"
        for c in _CENTROIDS
    )
    dists = (
        "list_transform([{lits}], cv -> "
        "list_reduce(list_prepend(0.0::DOUBLE, list_transform(range(1, 5), "
        "j -> (e[j] - cv[j]) * (e[j] - cv[j]))), (a, b) -> a + b))"
    ).format(lits=lits)
    dot = (
        "list_reduce(list_prepend(0.0::DOUBLE, list_transform(range(1, 5), "
        "j -> a.e[j] * b.e[j])), (x, y) -> x + y)"
    )
    nrm = (
        "sqrt(list_reduce(list_prepend(0.0::DOUBLE, list_transform("
        "range(1, 5), j -> {s}.e[j] * {s}.e[j])), (x, y) -> x + y))"
    )
    con = duckdb.connect()
    con.register("t", pdf)
    want = con.execute(f"""
        WITH v AS (
          SELECT doc_id, list_transform(embedding, x -> x::DOUBLE) AS e
          FROM t
        ),
        assigned AS (
          SELECT doc_id, e,
                 (list_position({dists},
                    list_aggregate({dists}, 'min')) - 1)::INT AS cluster
          FROM v
        )
        SELECT a.doc_id AS id_a, b.doc_id AS id_b, a.cluster,
               round({dot} / ({nrm.format(s='a')} * {nrm.format(s='b')}), 6)
                 + 0.0 AS cos6
        FROM assigned a JOIN assigned b
          ON a.cluster = b.cluster AND a.doc_id < b.doc_id
        WHERE {dot} / ({nrm.format(s='a')} * {nrm.format(s='b')}) >= 0.999
        ORDER BY id_a, id_b
    """).fetchall()
    assert got == [tuple(r) for r in want]


def test_assignment_is_pure_projection(spark):
    rows = _vectors()
    df = spark.createDataFrame(rows, "doc_id int, embedding array<double>")
    plan = df.select(
        semantic_cluster_expr("embedding", _CENTROIDS).alias("c")
    )._jdf.queryExecution().executedPlan().toString()
    assert "Exchange" not in plan
    assert "Python" not in plan
    # the pairs plan joins on the cluster key only (one equi-join)
    pplan = semantic_dup_pairs(
        df, _CENTROIDS, threshold=0.999
    )._jdf.queryExecution().executedPlan().toString()
    assert "CartesianProduct" not in pplan
    assert "BroadcastNestedLoopJoin" not in pplan
