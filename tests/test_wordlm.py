"""Word-bigram stupid-backoff LM: training parity (integer-exact),
bit-identical scoring across Catalyst / Python / DuckDB, the
perplexity-bucket scorer option, plan shape."""

import math
import os

import duckdb
import pytest
from pyspark.sql import functions as F

from verde_spark.functions.wordlm import (
    ENGLISH_WORD_LM,
    WordLM,
    _train_on_text,
    _words,
    reference_word_ids,
    reference_word_logprob,
    train_word_lm,
    word_bigram_counts,
    word_bigram_counts_sql,
    word_gram_keys_expr,
    word_logprob_expr,
    word_logprob_sql,
    words_expr,
)

SF = os.environ.get("SPARK_GRAFT_TEST_SF", "/root/testdata/sf0.001")

FUZZ = [
    "Hello, World! 123",
    "the morning light settles on the water",
    "one",
    "",
    None,
    "  !!  ",
    "ünïcödé prose with açcents and the open sea",
    "the the the the",
    "word " * 200,
    "zz qq xx jj vv",
]


def test_word_ids_and_keys_match_python(spark):
    df = spark.createDataFrame(
        [(i, s) for i, s in enumerate(FUZZ)], "i int, text string"
    )
    lm = ENGLISH_WORD_LM
    got = {
        r["i"]: (r["w"], r["k"])
        for r in df.select(
            "i",
            words_expr("text").alias("w"),
            word_gram_keys_expr(lm, "text").alias("k"),
        ).collect()
    }
    for i, s in enumerate(FUZZ):
        if s is None:
            continue  # NULL text → NULL arrays
        ids = reference_word_ids(lm, s)
        want_keys = [a * lm.dim + b for a, b in zip(ids, ids[1:])]
        assert got[i][0] == _words(s), (i, s)
        assert got[i][1] == want_keys, (i, s)


def test_gram_keys_are_long(spark):
    """Key dtype regression pin: ``a*dim + b`` tops out near dim², which
    overflows 32-bit int for vocabularies beyond ~46k words — the key
    array (and the multiply feeding it) must be LONG so large-vocab
    models can't silently wrap to wrong gram keys / backoff indices."""
    from pyspark.sql import types as T

    df = spark.createDataFrame([("the cat sat",)], "text string")
    field = df.select(
        word_gram_keys_expr(ENGLISH_WORD_LM, "text").alias("k")
    ).schema["k"]
    assert isinstance(field.dataType, T.ArrayType)
    assert isinstance(field.dataType.elementType, T.LongType)


def test_logprob_bit_identical_three_engines(spark):
    rows = [(i, s) for i, s in enumerate(FUZZ)]
    df = spark.createDataFrame(rows, "i int, text string")
    lm = ENGLISH_WORD_LM
    got = {
        r["i"]: r["lp"]
        for r in df.select(
            "i", word_logprob_expr(lm, "text").alias("lp")
        ).collect()
    }
    con = duckdb.connect()
    con.execute("CREATE TABLE tt(i int, text varchar)")
    con.executemany("INSERT INTO tt VALUES (?, ?)", rows)
    duck = {
        r[0]: r[1]
        for r in con.execute(
            f"SELECT i, {word_logprob_sql(lm, 'text')} AS lp FROM tt"
        ).fetchall()
    }
    for i, s in enumerate(FUZZ):
        ref = reference_word_logprob(lm, s)
        assert got[i] == ref, (i, s)   # Catalyst == Python, bitwise
        assert duck[i] == ref, (i, s)  # DuckDB == Python, bitwise


def test_avg_logprob_let_bound_fold_is_bit_identical(spark):
    """word_avg_logprob_expr (ONE let-bound key array) must equal
    word_logprob_expr / n_pairs bitwise — the perplexity_buckets scorer
    rides on it (review r5 CSE fix)."""
    from verde_spark.functions.wordlm import word_avg_logprob_expr

    df = spark.createDataFrame(
        [(i, s) for i, s in enumerate(FUZZ)], "i int, text string"
    )
    lm = ENGLISH_WORD_LM
    naive = word_logprob_expr(lm, "text") / F.size(
        word_gram_keys_expr(lm, "text")
    ).cast("double")
    rows = df.select(
        word_avg_logprob_expr(lm, "text").alias("a"), naive.alias("b")
    ).collect()
    assert rows and all(r["a"] == r["b"] for r in rows)


def test_logprob_udf_bit_identical_to_fold(spark):
    # the Arrow fast path replays the SAME serial left-fold (same
    # tokenization, same dict-else-backoff lookup, same float64 addition
    # order), so unlike charlm's histogram·dot path it must be
    # BIT-identical to the Catalyst fold — on the fuzz corpus, on real
    # document text, and under a corpus-trained model
    from verde_spark.functions.wordlm import word_logprob_udf

    df = spark.createDataFrame(
        [(i, s) for i, s in enumerate(FUZZ)], "i int, text string"
    )
    docs = spark.read.parquet(f"{SF}/documents.parquet").select(
        (F.col("doc_id") + 1000).cast("int").alias("i"), "text"
    )
    both = df.union(docs)
    for lm in (ENGLISH_WORD_LM, train_word_lm(docs, vocab_size=128)):
        out = both.select(
            word_logprob_expr(lm, "text").alias("fold"),
            word_logprob_udf(lm, "text").alias("arrow"),
        ).collect()
        assert out and all(r["fold"] == r["arrow"] for r in out)


def test_counts_match_duckdb_on_documents(spark):
    docs = spark.read.parquet(f"{SF}/documents.parquet")
    got = sorted(
        tuple(r) for r in word_bigram_counts(docs, ENGLISH_WORD_LM).collect()
    )
    con = duckdb.connect()
    con.execute(
        f"CREATE VIEW documents AS SELECT * FROM '{SF}/documents.parquet'"
    )
    want = sorted(
        tuple(r)
        for r in con.execute(word_bigram_counts_sql(ENGLISH_WORD_LM)).fetchall()
    )
    assert got == want and got


def test_distributed_training_matches_python_twin(spark):
    texts = [
        "the cat sat on the mat and the dog ran to the cat",
        "a dog and a cat share the mat in the sun",
        "the sun warms the mat and the cat sleeps",
        "dogs chase cats and cats chase birds in the garden",
        "",  # unscorable
        "THE CAT! The mat?? 42",  # normalization exercises
    ]
    df = spark.createDataFrame(
        [(i, t) for i, t in enumerate(texts)], "i int, text string"
    ).repartition(5)
    lm = train_word_lm(df, vocab_size=16)
    # python twin: same vocab rule (count desc, token asc, cap 16), same
    # per-document bigrams (no cross-doc pairs)
    freq = {}
    for t in texts:
        for w in _words(t):
            freq[w] = freq.get(w, 0) + 1
    ranked = sorted(freq.items(), key=lambda kv: (-kv[1], kv[0]))[:16]
    vocab = tuple(w for w, _ in ranked)
    wid = {w: i + 1 for i, w in enumerate(vocab)}
    dim = len(vocab) + 1
    uni, bi = {}, {}
    for t in texts:
        ids = [wid.get(w, 0) for w in _words(t)]
        for i_ in ids:
            uni[i_] = uni.get(i_, 0) + 1
        for a, b in zip(ids, ids[1:]):
            bi[a * dim + b] = bi.get(a * dim + b, 0) + 1
    want = WordLM.from_counts(vocab, uni, bi)
    assert lm.vocab == want.vocab
    assert lm.uni_logp == want.uni_logp      # exact: same integer counts
    assert lm.bi_logp == want.bi_logp
    assert lm.backoff_logp == want.backoff_logp


def test_smoothed_unigram_normalizes():
    lm = ENGLISH_WORD_LM
    s = sum(math.exp(v) for v in lm.uni_logp)
    # add-one smoothing over (total + dim) leaves exactly `dim - observed`
    # mass for ids never seen; all dim cells sum to < 1 + dim/(N+dim) and
    # the distribution over ids is proper:
    assert s == pytest.approx(1.0, rel=1e-9)


def test_separates_prose_from_noise_word_order_2(spark):
    # the charlm prose/noise separation generalized to word order 2
    # (VERDICT r4 #2): per-gram average log-prob, higher = prose
    df = spark.createDataFrame(
        [
            (0, "the morning light settles on the water and people gather"),
            (1, "water the on settles gather light people morning the and"),
            (2, "zqxj vkwp zzqq jjxx qqzz wwkk xxjj zzvv qpqp zxzx"),
        ],
        "i int, text string",
    )
    lm = ENGLISH_WORD_LM
    avg = word_logprob_expr(lm, "text") / (
        F.size(word_gram_keys_expr(lm, "text")).cast("double")
    )
    out = {r["i"]: r["a"] for r in df.select("i", avg.alias("a")).collect()}
    # real prose beats shuffled words (bigram order matters — this is
    # what the char LM cannot see) and shuffled beats OOV noise
    assert out[0] > out[1] > out[2]


def test_scoring_plan_is_pure_projection(spark):
    docs = spark.read.parquet(f"{SF}/documents.parquet")
    plan = (
        docs.select(
            "doc_id", word_logprob_expr(ENGLISH_WORD_LM, "text").alias("lp")
        )
        ._jdf.queryExecution()
        .executedPlan()
        .toString()
    )
    assert "Exchange" not in plan and "EvalPython" not in plan


def test_perplexity_buckets_word_scorer_matches_duckdb(spark):
    from verde_spark.operators.mixing import (
        perplexity_buckets,
        perplexity_buckets_sql,
    )

    docs = spark.read.parquet(f"{SF}/documents.parquet").filter(
        "doc_id < 200"
    )
    got = perplexity_buckets(
        docs, id_col="doc_id", mode="rank", scorer="word", n_buckets=3
    ).select("doc_id", "lm_score", "bucket", "bucket_name")
    con = duckdb.connect()
    con.execute(
        f"CREATE VIEW documents AS SELECT * FROM '{SF}/documents.parquet'"
    )
    sql = perplexity_buckets_sql(
        "SELECT doc_id, text FROM documents WHERE doc_id < 200",
        id_col="doc_id",
        scorer="word",
        select_cols="doc_id",
    )
    want = {r[0]: (r[1], r[2], r[3]) for r in con.execute(sql).fetchall()}
    rows = got.collect()
    assert len(rows) == 200
    for r in rows:
        w = want[r["doc_id"]]
        assert (r["lm_score"], r["bucket"], r["bucket_name"]) == w, r["doc_id"]
