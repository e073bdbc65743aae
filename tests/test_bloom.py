"""Distributed Bloom filter: the no-false-negative law, bit-exact
DuckDB twins (build words AND membership flags, false positives
included), engine agreement (join == literal), partition invariance,
the novel_docs bloom-prefilter result-identity law, fpp sanity, plan
shapes (probe side never shuffles), and validation."""

import math
import os

import duckdb
import pytest
from pyspark.sql import functions as F

from verde_spark.operators.bloom import (
    bloom_contains_sql,
    bloom_might_contain,
    bloom_parameters,
    build_bloom,
    build_bloom_sql,
)

SF = os.environ.get("SPARK_GRAFT_TEST_SF", "/root/testdata/sf0.001")

BITS = 4096
K = 5


@pytest.fixture(scope="module")
def docs(spark):
    return spark.read.parquet(f"{SF}/documents.parquet")


@pytest.fixture(scope="module")
def con():
    c = duckdb.connect()
    c.execute(
        f"CREATE VIEW documents AS SELECT * FROM '{SF}/documents.parquet'"
    )
    return c


INSERT_SQL = "SELECT text FROM documents WHERE doc_id % 2 = 0"
PROBE_SQL = "SELECT doc_id, text FROM documents"


@pytest.fixture(scope="module")
def bloom(spark, docs):
    return build_bloom(
        docs.filter(F.col("doc_id") % 2 == 0).select("text"),
        "text",
        num_bits=BITS,
        num_hashes=K,
    ).cache()


def test_parameters_math():
    m, k = bloom_parameters(1000, 0.01)
    # textbook: ~9.59 bits/key, k ~ 7 at 1% fpp
    assert 9000 <= m <= 10000 and k == 7
    m1, k1 = bloom_parameters(10, 0.5)
    assert m1 >= 64 and k1 >= 1
    with pytest.raises(ValueError):
        bloom_parameters(0, 0.01)
    with pytest.raises(ValueError):
        bloom_parameters(10, 1.5)


def test_no_false_negatives_both_key_types(spark, docs, bloom):
    inserted = docs.filter(F.col("doc_id") % 2 == 0)
    flags = bloom_might_contain(
        inserted, bloom, "text", num_bits=BITS, num_hashes=K, engine="join"
    )
    assert flags.filter(~F.col("maybe_seen")).count() == 0
    # numeric keys through the affine pair
    ids = docs.select((F.col("doc_id") * 7919 - 40000).alias("k"))
    b2 = build_bloom(ids, "k", num_bits=BITS, num_hashes=K)
    f2 = bloom_might_contain(
        ids, b2, "k", num_bits=BITS, num_hashes=K, engine="join"
    )
    assert f2.filter(~F.col("maybe_seen")).count() == 0


def test_build_words_match_duckdb(spark, bloom, con):
    got = sorted((r["word_idx"], r["word"]) for r in bloom.collect())
    want = sorted(
        tuple(r)
        for r in con.execute(
            build_bloom_sql(INSERT_SQL, "text", num_bits=BITS, num_hashes=K)
        ).fetchall()
    )
    assert got == want


def test_membership_flags_match_duckdb(spark, docs, bloom, con):
    flags = bloom_might_contain(
        docs.select("doc_id", "text"), bloom, "text",
        num_bits=BITS, num_hashes=K, engine="join",
    )
    got = sorted(
        (r["doc_id"], r["maybe_seen"])
        for r in flags.select("doc_id", "maybe_seen").collect()
    )
    sql = bloom_contains_sql(
        PROBE_SQL,
        build_bloom_sql(INSERT_SQL, "text", num_bits=BITS, num_hashes=K),
        "text",
        num_bits=BITS,
        num_hashes=K,
        select_cols="doc_id",
    )
    want = sorted(tuple(r) for r in con.execute(sql).fetchall())
    assert got == want
    # the filter is useful: some non-inserted keys read definitely-new
    assert any(not s for _, s in got)


def test_literal_engine_agrees_with_join(spark, docs, bloom):
    probe = docs.select("doc_id", "text")
    a = {
        r["doc_id"]: r["maybe_seen"]
        for r in bloom_might_contain(
            probe, bloom, "text", num_bits=BITS, num_hashes=K, engine="join"
        ).collect()
    }
    b = {
        r["doc_id"]: r["maybe_seen"]
        for r in bloom_might_contain(
            probe, bloom, "text", num_bits=BITS, num_hashes=K,
            engine="literal",
        ).collect()
    }
    assert a == b


def test_partition_invariance(spark, docs):
    one = build_bloom(
        docs.select("text").coalesce(1), "text", num_bits=BITS, num_hashes=K
    )
    many = build_bloom(
        docs.select("text").repartition(7), "text",
        num_bits=BITS, num_hashes=K,
    )
    assert sorted(map(tuple, one.collect())) == sorted(
        map(tuple, many.collect())
    )


def test_fpp_sanity(spark):
    n = 2000
    m, k = bloom_parameters(n, 0.02)
    base = spark.range(n).select(
        F.concat(F.lit("key-"), F.col("id")).alias("s")
    )
    b = build_bloom(base, "s", num_bits=m, num_hashes=k)
    probe = spark.range(n, 3 * n).select(
        F.concat(F.lit("key-"), F.col("id")).alias("s")
    )
    fp = (
        bloom_might_contain(probe, b, "s", num_bits=m, num_hashes=k)
        .filter(F.col("maybe_seen"))
        .count()
    )
    rate = fp / (2 * n)
    assert rate < 0.10, rate  # 5x the 2% design point


def test_null_keys(spark, bloom):
    probe = bloom.sparkSession.createDataFrame(
        [(1, None), (2, "something")], "id int, text string"
    )
    out = bloom_might_contain(
        probe, bloom, "text", num_bits=BITS, num_hashes=K, engine="join"
    ).collect()
    flags = {r["id"]: r["maybe_seen"] for r in out}
    assert flags[1] is None and flags[2] is not None
    # null keys contribute no words
    empty = build_bloom(
        probe.filter("id = 1"), "text", num_bits=BITS, num_hashes=K
    )
    assert empty.count() == 0


def test_novel_docs_bloom_prefilter_identical(spark, docs):
    from verde_spark.operators.dedup import novel_docs, seen_hashes

    seen = seen_hashes(docs.filter(F.col("doc_id") % 3 == 0))
    plain = sorted(
        r["doc_id"] for r in novel_docs(docs, seen).select("doc_id").collect()
    )
    bloomed = sorted(
        r["doc_id"]
        for r in novel_docs(docs, seen, bloom_num_bits=8192)
        .select("doc_id")
        .collect()
    )
    assert plain == bloomed and 0 < len(plain) < docs.count()


def test_probe_side_never_shuffles(spark, docs, bloom):
    plan = bloom_might_contain(
        docs.select("doc_id", "text"), bloom, "text",
        num_bits=BITS, num_hashes=K, engine="join",
    )._jdf.queryExecution().executedPlan().toString()
    # k broadcast joins; the only Exchanges are broadcast ones
    assert "BroadcastHashJoin" in plan
    # the only shuffle exchanges are the bloom BUILD side's bounded
    # bit_or groupBy (<= num_bits/32 rows, keyed on word_idx) feeding
    # the broadcast; the probe side (doc_id/text) never repartitions
    bad = [
        ln
        for ln in plan.splitlines()
        if "Exchange hashpartitioning" in ln and "word_idx" not in ln
    ]
    assert not bad, bad
    lit_plan = bloom_might_contain(
        docs.select("doc_id", "text"), bloom, "text",
        num_bits=BITS, num_hashes=K, engine="literal",
    )._jdf.queryExecution().executedPlan().toString()
    assert "Join" not in lit_plan and "Exchange" not in lit_plan


def test_validation(spark, docs, bloom):
    with pytest.raises(ValueError):
        build_bloom(docs, "text", num_bits=8, num_hashes=3)
    with pytest.raises(ValueError):
        build_bloom(docs, "text", num_bits=1024, num_hashes=0)
    with pytest.raises(ValueError):
        bloom_might_contain(
            docs, bloom, "text", num_bits=BITS, num_hashes=K, engine="nope"
        )
    with pytest.raises(ValueError):
        bloom_might_contain(
            docs, bloom, "text",
            num_bits=(1 << 21), num_hashes=K, engine="literal",
        )
    with pytest.raises(ValueError):
        build_bloom(
            docs.select(F.lit(1.5).alias("d")), "d",
            num_bits=1024, num_hashes=3,
        )


def test_probe_reserved_column_clash_raises(spark):
    """ADVICE r4: a probe already carrying a working-column name must
    raise instead of silently losing the column."""
    import pytest
    from pyspark.sql import functions as F

    from verde_spark.operators.bloom import bloom_might_contain, build_bloom

    keys = spark.createDataFrame([(i,) for i in range(16)], "k long")
    bloom = build_bloom(keys, "k", num_bits=1 << 12)
    for col in ("__bpos", "__bw0", "__bv2"):
        probe = keys.withColumn(col, F.lit(1))
        with pytest.raises(ValueError, match=col):
            bloom_might_contain(
                probe, bloom, "k", num_bits=1 << 12, engine="join"
            )
    # literal engine only reserves __bpos — __bw/__bv names are fine there
    probe = keys.withColumn("__bw0", F.lit(1))
    out = bloom_might_contain(
        probe, bloom, "k", num_bits=1 << 12, engine="literal"
    )
    assert "__bw0" in out.columns
