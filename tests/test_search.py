"""BM25 search: formula parity vs a pure-Python reference, DuckDB twin,
plan shape (stats agg + TakeOrderedAndProject, no wide shuffle)."""

import math
import os
import re

import duckdb
import pytest

from verde_spark.operators.search import bm25_scores, bm25_sql, bm25_topk

SF = os.environ.get("SPARK_GRAFT_TEST_SF", "/root/testdata/sf0.001")
TERMS = ["data", "learning", "model"]


def _ref_bm25(rows, terms, k1=1.2, b=0.75):
    """Independent plain-Python Okapi BM25 (public formula)."""
    toks = {
        i: [t for t in re.split(r"[^a-z0-9]+", (s or "").lower()) if t]
        for i, s in rows
    }
    n = len(toks)
    avgdl = sum(len(v) for v in toks.values()) / n
    df = {t: sum(1 for v in toks.values() if t in v) for t in terms}
    out = {}
    for i, v in toks.items():
        s = 0.0
        for t in terms:
            tf = v.count(t)
            idf = math.log((n - df[t] + 0.5) / (df[t] + 0.5) + 1.0)
            s += idf * (tf * (k1 + 1.0)) / (
                tf + k1 * (1.0 - b + b * len(v) / avgdl)
            )
        out[i] = s
    return out


def test_bm25_matches_python_reference(spark):
    docs = spark.read.parquet(f"{SF}/documents.parquet")
    got = {
        r["doc_id"]: r["bm25"]
        for r in bm25_scores(docs, TERMS).collect()
    }
    rows = [(r["doc_id"], r["text"]) for r in docs.collect()]
    want = _ref_bm25(rows, TERMS)
    assert got.keys() == want.keys()
    for i in got:
        assert got[i] == pytest.approx(want[i], rel=1e-12)


def test_bm25_topk_matches_duckdb(spark):
    docs = spark.read.parquet(f"{SF}/documents.parquet")
    got = [tuple(r) for r in bm25_topk(docs, TERMS, k=10).collect()]
    con = duckdb.connect()
    con.execute(
        f"CREATE VIEW documents AS SELECT * FROM '{SF}/documents.parquet'"
    )
    want = [tuple(r) for r in con.execute(bm25_sql(TERMS, k=10)).fetchall()]
    assert got == want


def test_bm25_empty_terms_raises(spark):
    docs = spark.read.parquet(f"{SF}/documents.parquet")
    with pytest.raises(ValueError):
        bm25_scores(docs, [])


def test_bm25_plan_shape(spark):
    """Score pass: no Exchange except the top-k's single-partition take;
    no Python (BatchEvalPython/ArrowEval) anywhere."""
    docs = spark.read.parquet(f"{SF}/documents.parquet")
    plan = (
        bm25_topk(docs, TERMS, k=5)
        ._jdf.queryExecution()
        .executedPlan()
        .toString()
    )
    assert "TakeOrderedAndProject" in plan
    assert "EvalPython" not in plan
    # scoring is a pure projection over the scan: no join, no aggregate
    # in the scoring branch (the stats agg already ran at build time)
    assert "Join" not in plan
