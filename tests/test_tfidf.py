"""Hashed TF-IDF featurization (functions/tfidf.py): three-engine
bit-parity, fit parity, cosine/topk semantics and plan shapes."""

import duckdb
import pandas as pd
from pyspark.sql import functions as F

from verde_spark.functions.tfidf import (
    fit_tfidf,
    fit_tfidf_python,
    reference_sparse_tfidf,
    sparse_cosine,
    tfidf_topk,
)

_TEXTS = [
    "the river carved a deep canyon through layered rock",
    "click subscribe now buy now free shipping",
    "", "x", None,
    "the the the river river canyon",
    "ünïcode wörds and tabs\there",
    "measurement grids and splines for the survey region",
]


def _df(spark):
    return spark.createDataFrame(
        [(i, t) for i, t in enumerate(_TEXTS)], "doc_id int, text string"
    )


def test_sparse_tfidf_three_engine_bit_parity(spark):
    m = fit_tfidf_python(_TEXTS, dim=64)
    got = _df(spark).select(
        "doc_id", m.sparse_expr("text").alias("v")
    ).collect()
    for r in got:
        want = reference_sparse_tfidf(_TEXTS[r["doc_id"]], m)
        if want is None:
            assert r["v"] is None, r["doc_id"]
        else:
            assert list(r["v"]["indices"]) == want[0], r["doc_id"]
            assert list(r["v"]["values"]) == want[1], r["doc_id"]  # BIT

    con = duckdb.connect()
    con.register("t", pd.DataFrame(
        {"doc_id": range(len(_TEXTS)), "text": _TEXTS}))
    duck = con.execute(
        f"SELECT doc_id, {m.sparse_sql('text')} AS v FROM t ORDER BY doc_id"
    ).fetchall()
    for i, v in duck:
        want = reference_sparse_tfidf(_TEXTS[i], m)
        if want is None:
            assert v is None, i
        else:
            assert (list(v["indices"]), list(v["values"])) == want, i


def test_fit_spark_matches_python(spark):
    m_spark = fit_tfidf(_df(spark), dim=64)
    m_py = fit_tfidf_python(_TEXTS, dim=64)
    assert m_spark.idf == m_py.idf  # bit-exact (integer dfs, same ln)
    # bigram flavor too
    assert fit_tfidf(_df(spark), dim=64, bigrams=True).idf == \
        fit_tfidf_python(_TEXTS, dim=64, bigrams=True).idf


def test_cosine_semantics_and_topk_plan(spark):
    m = fit_tfidf_python(_TEXTS, dim=128)
    df = _df(spark).filter(F.col("text").isNotNull()).filter(
        F.trim(F.col("text")) != "")
    v = m.sparse_expr("text")
    paired = df.select(
        "doc_id", sparse_cosine(v, v).alias("self_cos")
    ).collect()
    for r in paired:
        assert abs(r["self_cos"] - 1.0) < 1e-12, r  # normalized

    # cross-doc cosine matches a Python dot over the same sparse pair
    # bit-for-bit (identical literals, same index-order accumulation)
    a = reference_sparse_tfidf(_TEXTS[0], m)
    b = reference_sparse_tfidf(_TEXTS[1], m)
    bmap = dict(zip(b[0], b[1]))
    want = 0.0
    for i, v in zip(a[0], a[1]):
        want += v * bmap.get(i, 0.0)
    two = spark.createDataFrame([(0,)], "i int").select(
        sparse_cosine(
            F.struct(F.lit(a[0]).alias("indices"), F.lit(a[1]).alias("values")),
            F.struct(F.lit(b[0]).alias("indices"), F.lit(b[1]).alias("values")),
        ).alias("c")
    ).collect()
    assert two[0]["c"] == want

    # topk: the exact query text ranks itself first with score ~ 1
    top = tfidf_topk(df, _TEXTS[0], m, k=3)
    rows = top.collect()
    assert rows[0]["doc_id"] == 0 and abs(rows[0]["score"] - 1.0) < 1e-12
    assert [r["doc_id"] for r in rows] == sorted(
        [r["doc_id"] for r in rows],
        key=lambda i: (-dict((x["doc_id"], x["score"]) for x in rows)[i], i),
    )
    plan = top._jdf.queryExecution().executedPlan().toString()
    assert "TakeOrderedAndProject" in plan and "Exchange" not in plan
