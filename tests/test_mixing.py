"""Corpus mixing: quota math, determinism, Python cross-check, DuckDB
twins, plan shapes (mix = one window shuffle; repeat = zero shuffles)."""

import os

import duckdb
import pytest
from pyspark.sql import functions as F

from verde_spark.operators.mixing import (
    _HASH_MOD,
    _HASH_MULT,
    repeat_weighted,
    repeat_weighted_sql,
    sample_to_mix,
    sample_to_mix_sql,
)

SF = os.environ.get("SPARK_GRAFT_TEST_SF", "/root/testdata/sf0.001")


def _h(i: int) -> int:
    return (((i % _HASH_MOD) + _HASH_MOD) % _HASH_MOD * _HASH_MULT) % _HASH_MOD


@pytest.fixture(scope="module")
def docs(spark):
    return spark.read.parquet(f"{SF}/documents.parquet")


def test_sample_to_mix_quotas_and_selection(spark, docs):
    targets = {"en": 0.5, "de": 0.2}
    out = sample_to_mix(docs, "lang", targets, total=100, id_col="doc_id")
    rows = out.collect()
    by_lang = {}
    for r in rows:
        by_lang.setdefault(r["lang"], []).append(r["doc_id"])
    pop = {
        r["lang"]: r["n"]
        for r in docs.groupBy("lang").agg(F.count("*").alias("n")).collect()
    }
    assert set(by_lang) <= {"en", "de"}
    assert len(by_lang.get("en", [])) == min(50, pop.get("en", 0))
    assert len(by_lang.get("de", [])) == min(20, pop.get("de", 0))
    # selection = smallest-hash ids per group (id tiebreak)
    all_ids = {
        r["lang"]: [x["doc_id"] for x in docs.filter(F.col("lang") == r["lang"]).collect()]
        for r in docs.select("lang").distinct().collect()
    }
    for g, picked in by_lang.items():
        want = sorted(all_ids[g], key=lambda i: (_h(i), i))[: len(picked)]
        assert sorted(picked) == sorted(want)


def test_sample_to_mix_matches_duckdb(spark, docs):
    targets = {"en": 0.4, "fr": 0.3}
    got = sorted(
        (r["doc_id"], r["lang"])
        for r in sample_to_mix(docs, "lang", targets, total=60, id_col="doc_id").collect()
    )
    con = duckdb.connect()
    con.execute(f"CREATE VIEW documents AS SELECT * FROM '{SF}/documents.parquet'")
    sql = sample_to_mix_sql(
        "SELECT * FROM documents", "lang", targets, 60,
        id_col="doc_id", select_cols="doc_id, lang",
    )
    want = sorted(tuple(r) for r in con.execute(sql).fetchall())
    assert got == want


def test_repeat_weighted_counts_and_determinism(spark, docs):
    epochs = {"en": 2.4, "de": 0.5, "fr": 0.0}
    out = repeat_weighted(docs, "lang", epochs, id_col="doc_id")
    rows = out.select("doc_id", "lang", "epoch").collect()
    # per-id copy count matches the hash-threshold rule exactly
    from collections import Counter

    copies = Counter((r["doc_id"], r["lang"]) for r in rows)
    for r in docs.collect():
        e = epochs.get(r["lang"], 1.0)
        base, frac = int(e), e - int(e)
        # INDEPENDENT second-multiplier hash — not the rank hash
        # sample_to_mix/temperature_mix select on (review r5)
        from verde_spark.operators.mixing import _HASH_MULT2

        h2 = (((r["doc_id"] % _HASH_MOD) + _HASH_MOD) % _HASH_MOD
              * _HASH_MULT2) % _HASH_MOD
        want = base + (1 if h2 / _HASH_MOD < frac else 0)
        assert copies.get((r["doc_id"], r["lang"]), 0) == want
    # epoch indices are 1..n
    assert all(r["epoch"] >= 1 for r in rows)
    # rerun → identical result (no rand())
    again = Counter(
        (r["doc_id"], r["lang"])
        for r in repeat_weighted(docs, "lang", epochs, id_col="doc_id").collect()
    )
    assert copies == again


def test_repeat_weighted_matches_duckdb(spark, docs):
    epochs = {"en": 1.5, "pt": 3.0}
    got = sorted(
        (r["doc_id"], r["epoch"])
        for r in repeat_weighted(docs, "lang", epochs, id_col="doc_id").collect()
    )
    con = duckdb.connect()
    con.execute(f"CREATE VIEW documents AS SELECT * FROM '{SF}/documents.parquet'")
    sql = repeat_weighted_sql(
        "SELECT * FROM documents", "lang", epochs,
        id_col="doc_id", select_cols="doc_id",
    )
    want = sorted((r[0], r[1]) for r in con.execute(sql).fetchall())
    assert got == want


def test_repeat_after_mix_extra_copy_share_is_frac(spark, docs):
    """temperature_mix keeps the q smallest-RANK-hash ids per group, so
    the repeat decision must use an INDEPENDENT hash (review r5: reusing
    the rank hash gave tight-quota survivors a ~100% extra-copy share
    instead of frac(epochs))."""
    from verde_spark.operators.mixing import temperature_mix

    survivors = temperature_mix(
        docs, "lang", 80, alpha=1.0, id_col="doc_id"
    )
    n = survivors.count()
    assert 0 < n <= 80
    out = repeat_weighted(
        survivors, "lang", {}, id_col="doc_id", default_epochs=1.5
    )
    share = (out.count() - n) / n
    # frac = 0.5; the old reused hash put every survivor under the
    # threshold (share 1.0)
    assert 0.25 <= share <= 0.75, share


def test_mix_validation(spark, docs):
    with pytest.raises(ValueError):
        sample_to_mix(docs, "lang", {}, total=10, id_col="doc_id")
    with pytest.raises(ValueError):
        sample_to_mix(docs, "lang", {"en": 0.9, "de": 0.2}, total=10, id_col="doc_id")
    with pytest.raises(ValueError):
        repeat_weighted(docs, "lang", {"en": -1.0}, id_col="doc_id")


def test_repeat_weighted_plan_zero_shuffle(spark, docs):
    plan = (
        repeat_weighted(docs, "lang", {"en": 2.5}, id_col="doc_id")
        ._jdf.queryExecution()
        .executedPlan()
        .toString()
    )
    assert "Exchange" not in plan and "EvalPython" not in plan


def test_sample_to_mix_plan_one_window_shuffle(spark, docs):
    plan = (
        sample_to_mix(docs, "lang", {"en": 0.5}, total=50, id_col="doc_id")
        ._jdf.queryExecution()
        .executedPlan()
        .toString()
    )
    # quota is a literal CASE: no join in the plan, exactly one exchange
    assert "Join" not in plan
    assert plan.count("Exchange") == 1

# -- temperature (alpha) sampling -----------------------------------------

def test_temperature_targets_math():
    from verde_spark.operators.mixing import temperature_targets

    counts = {"en": 800, "de": 150, "fr": 50}
    nat = temperature_targets(counts, alpha=1.0)
    assert abs(nat["en"] - 0.8) < 1e-12 and abs(nat["fr"] - 0.05) < 1e-12
    uni = temperature_targets(counts, alpha=0.0)
    assert all(abs(v - 1 / 3) < 1e-12 for v in uni.values())
    t = temperature_targets(counts, alpha=0.3)
    assert abs(sum(t.values()) - 1.0) < 1e-12
    # low-resource boost: fr share rises vs natural, en share falls
    assert t["fr"] > nat["fr"] and t["en"] < nat["en"]
    # boosted mix preserves the size ordering
    assert t["en"] > t["de"] > t["fr"]
    with pytest.raises(ValueError):
        temperature_targets(counts, alpha=-0.1)
    with pytest.raises(ValueError):
        temperature_targets({}, alpha=0.3)


def test_temperature_mix_quotas_match_python_replay(spark, docs):
    from verde_spark.operators.mixing import temperature_mix, temperature_targets

    out = temperature_mix(docs, "lang", total=100, alpha=0.3, id_col="doc_id")
    got = {}
    for r in out.select("doc_id", "lang").collect():
        got.setdefault(r["lang"], []).append(r["doc_id"])
    counts = {
        r["lang"]: r["n"]
        for r in docs.groupBy("lang").agg(F.count("*").alias("n")).collect()
        if r["lang"] is not None
    }
    targets = temperature_targets(counts, 0.3)
    for g, frac in targets.items():
        quota = min(int(frac * 100), counts[g])
        ids = [
            r["doc_id"]
            for r in docs.filter(F.col("lang") == g).select("doc_id").collect()
        ]
        want = sorted(ids, key=lambda i: (_h(i), i))[:quota]
        assert sorted(got.get(g, [])) == sorted(want), g


def test_temperature_mix_matches_duckdb(spark, docs):
    from verde_spark.operators.mixing import temperature_mix, temperature_mix_sql

    got = sorted(
        (r["doc_id"], r["lang"])
        for r in temperature_mix(
            docs, "lang", total=120, alpha=0.3, id_col="doc_id"
        ).collect()
    )
    con = duckdb.connect()
    con.execute(f"CREATE VIEW documents AS SELECT * FROM '{SF}/documents.parquet'")
    sql = temperature_mix_sql(
        "SELECT * FROM documents", "lang", 120,
        alpha=0.3, id_col="doc_id", select_cols="doc_id, lang",
    )
    want = sorted(tuple(r) for r in con.execute(sql).fetchall())
    assert got == want


# -- CCNet perplexity buckets ---------------------------------------------

def test_perplexity_buckets_rank_matches_duckdb(spark, docs):
    from verde_spark.operators.mixing import (
        perplexity_buckets,
        perplexity_buckets_sql,
    )

    out = perplexity_buckets(
        docs, lang_col="lang", id_col="doc_id", mode="rank"
    ).select("doc_id", "lang", "lm_score", "bucket", "bucket_name")
    got = {r["doc_id"]: r for r in out.collect()}
    sql = perplexity_buckets_sql(
        f"SELECT doc_id, lang, text FROM '{SF}/documents.parquet'",
        lang_col="lang",
        id_col="doc_id",
    )
    want = duckdb.connect().execute(sql).fetchall()
    assert len(want) == len(got)
    for doc_id, lang, score, bucket, name in want:
        g = got[doc_id]
        assert g["lang"] == lang
        assert g["lm_score"] == score, doc_id  # BIT-identical fold
        assert g["bucket"] == bucket, doc_id
        assert g["bucket_name"] == name, doc_id


def test_perplexity_buckets_rank_sizes_balanced(spark, docs):
    from verde_spark.operators.mixing import perplexity_buckets

    out = perplexity_buckets(
        docs, lang_col="lang", id_col="doc_id", mode="rank"
    )
    sizes = {
        (r["lang"], r["bucket"]): r["n"]
        for r in out.groupBy("lang", "bucket").agg(F.count("*").alias("n")).collect()
    }
    langs = {k[0] for k in sizes}
    for lang in langs:
        per = [sizes.get((lang, b), 0) for b in (1, 2, 3)]
        assert max(per) - min(per) <= 1, (lang, per)  # ntile balance


def test_perplexity_buckets_threshold_ordering_and_plan(spark, docs):
    """Threshold mode: head scores >= tail scores within a language,
    unscorable docs land in the last bucket, and the plan has NO window
    sort — one sketch agg + broadcast join (the 100 TB path)."""
    from verde_spark.operators.mixing import perplexity_buckets

    out = perplexity_buckets(
        docs, lang_col="lang", id_col="doc_id", mode="threshold"
    )
    rows = out.select("lang", "lm_score", "bucket").collect()
    by_lang = {}
    for r in rows:
        by_lang.setdefault(r["lang"], []).append(r)
    for lang, rs in by_lang.items():
        head = [r["lm_score"] for r in rs if r["bucket"] == 1]
        tail = [r["lm_score"] for r in rs if r["bucket"] == 3 and r["lm_score"] is not None]
        if head and tail:
            assert min(head) >= max(tail), lang
        for r in rs:
            if r["lm_score"] is None:
                assert r["bucket"] == 3
    plan = out._jdf.queryExecution().executedPlan().toString()
    assert "Window" not in plan
    assert "BroadcastHashJoin" in plan or "BroadcastNestedLoopJoin" in plan


def test_perplexity_buckets_modes_mostly_agree(spark, docs):
    """Exact tertiles vs approx thresholds: identical away from the
    boundaries — agreement must dominate (sanity that both modes
    implement the same bucketing)."""
    from verde_spark.operators.mixing import perplexity_buckets

    rank = {
        r["doc_id"]: r["bucket"]
        for r in perplexity_buckets(
            docs, lang_col="lang", id_col="doc_id", mode="rank"
        ).select("doc_id", "bucket").collect()
    }
    thr = {
        r["doc_id"]: r["bucket"]
        for r in perplexity_buckets(
            docs, lang_col="lang", id_col="doc_id", mode="threshold"
        ).select("doc_id", "bucket").collect()
    }
    agree = sum(1 for k, v in rank.items() if thr[k] == v)
    assert agree / len(rank) > 0.8
