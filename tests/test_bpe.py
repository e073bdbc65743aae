"""BPE subword tokenizer (functions/bpe.py): distributed training parity
vs the pure-Python reference, three-engine encode bit-parity, and the
zero-shuffle encode plan shape."""

import duckdb
import pandas as pd
from pyspark.sql import functions as F

from verde_spark.functions.bpe import (
    EXAMPLE_BPE,
    BpeModel,
    reference_encode,
    reference_train_bpe,
    train_bpe,
    word_counts,
)

_CORPUS = [
    "the lowest lower low lowly slower slowest slow",
    "new newer newest news knew renewed",
    "walking walked walker talks talking talked talker",
    "the the the of of and and to in that it was",
    "wider widest wide widely width",
]

_FUZZ = [
    "the lowest newer walker walked",
    "",
    None,
    "x",
    "aaaa aaa aa a",           # repeated identical pairs (the variant corner)
    "Ünïcode WÖRDS stay ascii-only after tokenize 123",
    "tabs\tand\nnewlines   spaces",
    "the quick brown fox jumps over the lazy dog 42 times",
]


def _docs(spark, texts):
    return spark.createDataFrame(
        [(i, t) for i, t in enumerate(texts)], "doc_id int, text string"
    )


def test_train_bpe_matches_python_reference(spark):
    """Distributed training = the Python reference, merge for merge
    (same pair counting, tie-break and replace semantics)."""
    df = _docs(spark, _CORPUS)
    got = train_bpe(df, num_merges=25, checkpoint_every=4)
    wc = {r["word"]: r["count"] for r in word_counts(df).collect()}
    want = reference_train_bpe(sorted(wc.items()), num_merges=25)
    assert got.merges == want.merges
    assert len(got.merges) > 5  # learned something real
    # frequent stems actually merged
    assert any("low" in m for m in got.vocab)


def test_train_bpe_min_pair_count_stops_early(spark):
    df = _docs(spark, ["ab", "ab", "cd"])
    m = train_bpe(df, num_merges=50, min_pair_count=3)
    # only pairs with count >= 3: (a,b) appears twice, (b,_) twice — none
    # reach 3 except none; early stop with no merges of count < 3
    wc = {r["word"]: r["count"] for r in word_counts(df).collect()}
    want = reference_train_bpe(sorted(wc.items()), num_merges=50, min_pair_count=3)
    assert m.merges == want.merges


def test_encode_three_engine_bit_parity(spark):
    """Spark encode == Python reference == DuckDB twin, token for token,
    including null/empty/unicode and the repeated-pair corner."""
    model = EXAMPLE_BPE
    assert len(model.merges) >= 30
    got = {
        r["doc_id"]: r["toks"]
        for r in _docs(spark, _FUZZ)
        .select("doc_id", model.encode_expr("text").alias("toks"))
        .collect()
    }
    con = duckdb.connect()
    con.register("t", pd.DataFrame(
        {"doc_id": range(len(_FUZZ)), "text": pd.Series(_FUZZ, dtype="object")}
    ))
    duck = dict(con.execute(
        f"SELECT doc_id, {model.encode_sql('text')} FROM t"
    ).fetchall())
    for i, text in enumerate(_FUZZ):
        want = reference_encode(model, text)
        if want is None:
            assert got[i] is None, i
            assert duck[i] is None, i
        else:
            assert list(got[i]) == want, (i, text)
            assert list(duck[i]) == want, (i, text)


def test_encode_roundtrip_reassembles_words():
    """Subword tokens of a word concatenate back to word + marker."""
    toks = reference_encode(EXAMPLE_BPE, "tokenizer pipelines")
    joined = "".join(toks)
    assert joined == "tokenizer_pipelines_"


def test_trained_model_compresses_corpus(spark):
    """More merges → fewer tokens per document on the training corpus."""
    df = _docs(spark, _CORPUS)
    m25 = train_bpe(df, num_merges=25)
    m0 = BpeModel(())
    n0, n25 = (
        df.select(
            F.sum(F.size(m.encode_expr("text"))).alias("n")
        ).collect()[0]["n"]
        for m in (m0, m25)
    )
    assert n25 < n0


def test_encode_plan_is_pure_projection(spark):
    """Encoding adds NO Exchange and NO Python eval — one codegen'd
    projection over the scan (the 100 TB contract)."""
    df = _docs(spark, _CORPUS)
    plan = df.select(
        EXAMPLE_BPE.encode_expr("text").alias("toks")
    )._jdf.queryExecution().executedPlan().toString()
    assert "Exchange" not in plan
    assert "Python" not in plan


def test_merges_table_shape(spark):
    t = EXAMPLE_BPE.merges_table(spark)
    rows = t.collect()
    assert [r["rank"] for r in rows] == list(range(len(EXAMPLE_BPE.merges)))
    assert all(r["merged"] == r["left"] + r["right"] for r in rows)
