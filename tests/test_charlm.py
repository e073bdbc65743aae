"""Char-bigram LM: training parity (integer-exact), bit-identical scoring
across Catalyst / Python reference / DuckDB, Arrow fast path, plan shape."""

import math
import os

import duckdb
import pytest
from pyspark.sql import functions as F

from verde_spark.functions.charlm import (
    ALPHABET,
    ENGLISH_LM,
    CharLM,
    charlm_counts,
    charlm_counts_sql,
    charlm_logprob_sql,
    charlm_logprob_udf,
    charlm_norm_sql,
    gram_ids_expr,
    logprob_expr,
    perplexity_expr,
    reference_logprob,
    train_char_lm,
    _gram_ids,
)

SF = os.environ.get("SPARK_GRAFT_TEST_SF", "/root/testdata/sf0.001")

FUZZ = [
    "Hello, World! 123",
    "aa",
    "a",
    "",
    None,
    "  !!  ",
    "ünïcödé prose with açcents",
    "the the the the",
    "x" * 500,
]


def test_gram_ids_matches_python(spark):
    df = spark.createDataFrame([(i, s) for i, s in enumerate(FUZZ)], "i int, text string")
    got = {r["i"]: r["g"] for r in df.select("i", gram_ids_expr("text").alias("g")).collect()}
    for i, s in enumerate(FUZZ):
        assert got[i] == _gram_ids(s or ""), (i, s)


def test_counts_match_duckdb(spark):
    docs = spark.read.parquet(f"{SF}/documents.parquet")
    got = sorted(tuple(r) for r in charlm_counts(docs).collect())
    con = duckdb.connect()
    con.execute(f"CREATE VIEW documents AS SELECT * FROM '{SF}/documents.parquet'")
    want = sorted(tuple(r) for r in con.execute(charlm_counts_sql()).fetchall())
    assert got == want


def test_logprob_bit_identical_three_engines(spark):
    rows = [(i, s) for i, s in enumerate(FUZZ)]
    df = spark.createDataFrame(rows, "i int, text string")
    got = {
        r["i"]: r["lp"]
        for r in df.select("i", logprob_expr(ENGLISH_LM, "text").alias("lp")).collect()
    }
    con = duckdb.connect()
    con.execute("CREATE TABLE tt(i int, text varchar)")
    con.executemany("INSERT INTO tt VALUES (?, ?)", rows)
    sql = (
        f"WITH s AS (SELECT i, {charlm_norm_sql('text')} AS t FROM tt) "
        f"SELECT i, {charlm_logprob_sql(ENGLISH_LM)} AS lp FROM s"
    )
    duck = {r[0]: r[1] for r in con.execute(sql).fetchall()}
    for i, s in enumerate(FUZZ):
        ref = reference_logprob(ENGLISH_LM, s)
        assert got[i] == ref, (i, s)          # Catalyst == Python, bitwise
        assert duck[i] == ref, (i, s)         # DuckDB == Python, bitwise


def test_arrow_udf_close_and_short_exact(spark):
    df = spark.createDataFrame([(i, s) for i, s in enumerate(FUZZ)], "i int, text string")
    rows = df.select(
        "i",
        logprob_expr(ENGLISH_LM, "text").alias("fold"),
        charlm_logprob_udf(ENGLISH_LM, "text").alias("arrow"),
    ).collect()
    for r in rows:
        if r["fold"] is None:
            assert r["arrow"] is None or math.isnan(r["arrow"]) or r["arrow"] is None
        else:
            assert r["arrow"] == pytest.approx(r["fold"], rel=1e-12)


def test_train_on_corpus_and_score(spark):
    docs = spark.read.parquet(f"{SF}/documents.parquet")
    lm = train_char_lm(docs)
    assert len(lm.logp) == ALPHABET * ALPHABET
    # every probability row sums to 1 (smoothed conditional distribution)
    for first in range(ALPHABET):
        s = sum(math.exp(lm.logp[first * ALPHABET + b]) for b in range(ALPHABET))
        assert s == pytest.approx(1.0, rel=1e-9)
    scored = docs.select(perplexity_expr(lm, "text").alias("ppl")).collect()
    assert all(r["ppl"] is not None and r["ppl"] > 1.0 for r in scored)


def test_english_lm_separates_prose_from_noise(spark):
    df = spark.createDataFrame(
        [
            (0, "the morning light settles on the water and people gather"),
            (1, "zqxj vkwp zzqq jjxx qqzz wwkk xxjj zzvv qpqp zxzx"),
        ],
        "i int, text string",
    )
    out = {r["i"]: r["p"] for r in df.select("i", perplexity_expr(ENGLISH_LM, "text").alias("p")).collect()}
    assert out[0] < out[1] / 2


def test_clean_corpus_perplexity_stage(spark):
    from verde_spark.pipelines import clean_corpus

    prose = (
        "people gather in the market to trade bread and fruit and "
        "stories about the weather and the roads in their lives"
    )
    noise = "zqxj vkwp zzqq jjxx qqzz wwkk xxjj zzvv qpqp zxzx kqvz jxqw"
    rows = [
        (f"https://site{i % 2}.com/p{i}", "2024-01-01 00:00:00",
         prose + f" number {i}" if i % 2 == 0 else noise + f" {i}")
        for i in range(20)
    ]
    pages = spark.createDataFrame(
        rows, "url string, warc_ts string, text string"
    ).withColumn("warc_ts", F.to_timestamp("warc_ts"))
    base = clean_corpus(pages, min_tokens=3)
    gated = clean_corpus(pages, min_tokens=3, max_perplexity=15.0)
    assert base.count() == 20
    out = gated.collect()
    assert len(out) == 10 and all("site0" in r["url"] for r in out)


def test_scoring_plan_is_pure_projection(spark):
    docs = spark.read.parquet(f"{SF}/documents.parquet")
    plan = (
        docs.select("doc_id", logprob_expr(ENGLISH_LM, "text").alias("lp"))
        ._jdf.queryExecution()
        .executedPlan()
        .toString()
    )
    assert "Exchange" not in plan and "EvalPython" not in plan


def test_counts_shuffle_is_partial_agged(spark):
    docs = spark.read.parquet(f"{SF}/documents.parquet")
    plan = charlm_counts(docs)._jdf.queryExecution().executedPlan().toString()
    # partial aggregate before the exchange: the shuffle carries ≤729 rows
    # per task, not one row per character
    assert plan.count("HashAggregate") >= 2
    assert "Exchange" in plan


def test_avg_logprob_let_bound_fold_is_bit_identical(spark):
    """avg_logprob_expr (ONE let-bound gram array) must equal
    logprob_expr / n_grams bitwise — the perplexity_buckets char scorer
    rides on it (review r5 CSE fix)."""
    from pyspark.sql import functions as F

    from verde_spark.functions.charlm import (
        ENGLISH_LM,
        avg_logprob_expr,
        gram_ids_expr,
        logprob_expr,
    )

    docs = spark.read.parquet(
        "/root/testdata/sf0.001/documents.parquet"
    ).select("text")
    naive = logprob_expr(ENGLISH_LM, "text") / F.size(
        gram_ids_expr("text")
    ).cast("double")
    rows = docs.select(
        avg_logprob_expr(ENGLISH_LM, "text").alias("a"), naive.alias("b")
    ).collect()
    assert rows and all(r["a"] == r["b"] for r in rows)
