"""DSIR importance resampling (operators/dsir.py): three-engine
bit-parity on features and weights, Spark-vs-Python fit parity,
deterministic Gumbel-top-k selection, and plan shapes."""

import math

import duckdb
import pandas as pd
from pyspark.sql import functions as F

from verde_spark.operators.dsir import (
    _GUMBEL_RES,
    _RAW_SEED,
    _TARGET_SEED,
    EXAMPLE_DSIR,
    bucket_counts,
    bucket_counts_sql,
    dsir_bucket_ids,
    dsir_bucket_ids_sql,
    dsir_resample,
    fit_dsir,
    fit_dsir_python,
    reference_bucket_ids,
    reference_weight,
)

_TEXTS = [
    "The glacier carved  this valley over thousands of years",
    "click HERE subscribe now cookie settings accept all",
    "", "x", "two words", None,
    "  padded   whitespace\ttabs\nnewlines  ",
    "buy now limited offer free shipping the glacier retreat",
    "ünïcode wörds and punctuation, too!",
]


def _df(spark):
    return spark.createDataFrame(
        [(i, t) for i, t in enumerate(_TEXTS)], "doc_id int, text string"
    )


def test_bucket_ids_and_weight_three_engine_bit_parity(spark):
    m = EXAMPLE_DSIR
    got = _df(spark).select(
        "doc_id",
        dsir_bucket_ids("text", m.num_buckets).alias("ids"),
        m.weight_expr("text").alias("w"),
    ).collect()
    for r in got:
        t = _TEXTS[r["doc_id"]]
        ids = list(r["ids"]) if r["ids"] is not None else None
        assert ids == reference_bucket_ids(t, m.num_buckets), r["doc_id"]
        assert r["w"] == reference_weight(t, m), r["doc_id"]  # BIT-exact

    con = duckdb.connect()
    con.register("t", pd.DataFrame(
        {"doc_id": range(len(_TEXTS)), "text": _TEXTS}))
    duck = con.execute(
        f"SELECT doc_id, {dsir_bucket_ids_sql('text', m.num_buckets)} AS ids,"
        f" {m.weight_sql('text')} AS w FROM t ORDER BY doc_id"
    ).fetchall()
    for i, ids, w in duck:
        want = reference_bucket_ids(_TEXTS[i], m.num_buckets)
        assert (list(ids) if ids is not None else None) == want, i
        assert w == reference_weight(_TEXTS[i], m), i  # BIT-exact

    # unigram-only flavor agrees too
    uni = _df(spark).select(
        "doc_id", dsir_bucket_ids("text", 64, bigrams=False).alias("ids")
    ).collect()
    for r in uni:
        want = reference_bucket_ids(_TEXTS[r["doc_id"]], 64, bigrams=False)
        assert (list(r["ids"]) if r["ids"] is not None else None) == want


def test_fit_spark_matches_python_and_counts_match_duckdb(spark):
    t_df = spark.createDataFrame([(t,) for t in _TARGET_SEED], "text string")
    r_df = spark.createDataFrame([(t,) for t in _RAW_SEED], "text string")
    m = fit_dsir(t_df, r_df, num_buckets=256)
    assert m.log_ratio == EXAMPLE_DSIR.log_ratio  # fit parity, bit-exact

    # integer-exact corpus bucket counts vs the DuckDB twin
    counts = {
        r["bucket"]: r["cnt"]
        for r in bucket_counts(_df(spark), num_buckets=128).collect()
    }
    con = duckdb.connect()
    con.register("docs", pd.DataFrame(
        {"doc_id": range(len(_TEXTS)), "text": _TEXTS}))
    duck = dict(con.execute(
        bucket_counts_sql("docs", "text", num_buckets=128)).fetchall())
    assert counts == duck and sum(counts.values()) > 0

    # Laplace smoothing keeps every log-ratio finite even for an EMPTY
    # target corpus / never-seen buckets (no -inf can enter the fold)
    mm = fit_dsir_python([], [t for t in _TEXTS[:2]], num_buckets=128)
    assert len(mm.log_ratio) == 128
    assert all(math.isfinite(x) for x in mm.log_ratio)
    # a bucket unseen by BOTH models gets log(a/(aB_t)) - log(a/(aB_r)),
    # which for equal totals... is just equal smoothing: verify directly
    empty_b = next(b for b in range(128) if b not in counts)
    n_raw = len(reference_bucket_ids(_TEXTS[0], 128)) + len(
        reference_bucket_ids(_TEXTS[1], 128))
    want = (math.log(1.0) - math.log(0 + 1.0 * 128)) - (
        math.log(1.0) - math.log(n_raw + 1.0 * 128))
    assert mm.log_ratio[empty_b] == want
    assert sum(counts.values()) == sum(duck.values())


def test_resample_deterministic_prefers_target_like_docs(spark):
    # 20 target-like + 20 junk-like docs; k=10 must be dominated by
    # target-like ones (weights differ by >> the Gumbel spread for
    # these seeds), and repeated runs must select identically
    rows = []
    for i in range(20):
        rows.append((i, f"the glacier carved the valley and the river {i}"))
        rows.append((100 + i, f"click here subscribe now buy now cart {i}"))
    df = spark.createDataFrame(rows, "doc_id int, text string")
    m = EXAMPLE_DSIR
    sel1 = dsir_resample(df, m, 10, seed=3)
    sel2 = dsir_resample(df, m, 10, seed=3)
    ids1 = [r["doc_id"] for r in sel1.collect()]
    assert ids1 == [r["doc_id"] for r in sel2.collect()]
    assert sum(1 for i in ids1 if i < 100) >= 9

    # key parity vs a Python recomputation (libm tolerance, not bit)
    got = {r["doc_id"]: r["dsir_weight"] for r in sel1.collect()}
    for i, t in rows:
        if i in got:
            assert abs(got[i] - reference_weight(t, m)) == 0.0

    # plan: TakeOrderedAndProject (per-partition heaps), no global sort
    plan = sel1._jdf.queryExecution().executedPlan().toString()
    assert "TakeOrderedAndProject" in plan
    assert "Exchange" not in plan

    # different seed may pick a different borderline set but stays k-sized
    assert sel1.count() == 10
    assert dsir_resample(df, m, 10, seed=4).count() == 10


def test_weight_udf_matches_catalyst(spark):
    from verde_spark.operators.dsir import dsir_weight_udf

    m = EXAMPLE_DSIR
    extra = _TEXTS + ["a\x0bb vertical tab", "word " * 300]
    df = spark.createDataFrame(
        [(i, t) for i, t in enumerate(extra)], "doc_id int, text string"
    ).coalesce(1)
    rows = df.select(
        "doc_id",
        dsir_weight_udf(m)("text").alias("w"),
        m.weight_expr("text").alias("wc"),
    ).collect()
    for r in rows:
        want = reference_weight(extra[r["doc_id"]], m)
        if want is None:
            assert r["w"] is None and r["wc"] is None
        else:
            assert r["wc"] == want
            assert abs(r["w"] - want) <= 1e-9 * max(1.0, abs(want))
    # a batch of only empty texts must not crash the vector path
    e = spark.createDataFrame([("",), ("",)], "text string").coalesce(1)
    got = e.select(dsir_weight_udf(m)("text").alias("w")).collect()
    assert [r["w"] for r in got] == [0.0, 0.0]


def test_gumbel_uniform_is_open_interval():
    # u = (h mod R + 0.5)/R can never hit 0 or 1 -> -log(-log(u)) finite
    assert 0.0 < 0.5 / _GUMBEL_RES and (_GUMBEL_RES - 0.5) / _GUMBEL_RES < 1.0
