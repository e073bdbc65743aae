"""Vocabulary + token-id encoding: DuckDB twins, map/join engine
agreement, OOV policies, plan shapes."""

import os

import duckdb
import pytest
from pyspark.sql import functions as F

from verde_spark.functions.vocab import (
    build_vocab,
    build_vocab_sql,
    encode_tokens,
    encode_tokens_sql,
)

SF = os.environ.get("SPARK_GRAFT_TEST_SF", "/root/testdata/sf0.001")


@pytest.fixture(scope="module")
def docs(spark):
    return spark.read.parquet(f"{SF}/documents.parquet")


@pytest.fixture(scope="module")
def con():
    c = duckdb.connect()
    c.execute(f"CREATE VIEW documents AS SELECT * FROM '{SF}/documents.parquet'")
    return c


def test_build_vocab_matches_duckdb(spark, docs, con):
    got = sorted(tuple(r) for r in build_vocab(docs, size=50).collect())
    want = sorted(tuple(r) for r in con.execute(build_vocab_sql(size=50)).fetchall())
    assert got == want
    ids = sorted(r[1] for r in got)
    assert ids == list(range(len(got)))


def test_encode_map_matches_duckdb(spark, docs, con):
    vocab = build_vocab(docs, size=100)
    out = encode_tokens(docs, vocab, method="map")
    got = {r["doc_id"]: list(r["token_ids"]) for r in out.collect()}
    sql = encode_tokens_sql(
        "SELECT * FROM documents", build_vocab_sql(size=100)
    )
    want = {r[0]: list(r[1]) for r in con.execute(sql).fetchall()}
    assert got == want


def test_encode_join_equals_map(spark, docs):
    vocab = build_vocab(docs, size=100)
    a = {
        r["doc_id"]: list(r["token_ids"])
        for r in encode_tokens(docs, vocab, method="map").collect()
    }
    b = {
        r["doc_id"]: list(r["token_ids"])
        for r in encode_tokens(docs, vocab, method="join").collect()
    }
    assert a == b


def test_encode_drop_oov(spark, docs):
    vocab = build_vocab(docs, size=20)
    kept = encode_tokens(docs, vocab, unk_id=None, method="map")
    rows = kept.collect()
    assert all(all(i >= 0 for i in r["token_ids"]) for r in rows)
    withunk = {
        r["doc_id"]: [i for i in r["token_ids"] if i != -1]
        for r in encode_tokens(docs, vocab, unk_id=-1, method="map").collect()
    }
    assert {r["doc_id"]: list(r["token_ids"]) for r in rows} == withunk


def test_encode_feeds_packing(spark, docs):
    """ids → pack_sequences: the encoded corpus packs into fixed-length
    sequences (the end-to-end text→ids→training-shards path)."""
    from verde_spark.operators.packing import pack_sequences

    vocab = build_vocab(docs, size=200)
    enc = encode_tokens(docs, vocab, method="map").select(
        "doc_id", F.col("text"), "token_ids"
    )
    # pack by the REAL id count now, not a token-count proxy
    packed = pack_sequences(
        enc.withColumn("n", F.size("token_ids")),
        seq_len=128, n_shards=4, sep_tokens=1,
        hash_expr=(F.col("doc_id") * 7919) % 9973,
        tokens_col="n",
    )
    assert packed.count() == enc.count()


def test_encode_map_plan_zero_shuffle(spark, docs):
    vocab = build_vocab(docs, size=50)
    plan = (
        encode_tokens(docs, vocab, method="map")
        ._jdf.queryExecution()
        .executedPlan()
        .toString()
    )
    assert "Exchange" not in plan and "EvalPython" not in plan and "Join" not in plan
