"""Char-n-gram language ID: three-engine agreement (Catalyst / Python /
DuckDB), held-out accuracy on all five languages, adversarial short
docs, corpus training parity, plan shape."""

import os

import duckdb
from pyspark.sql import functions as F

from verde_spark.functions.charlm import _gram_ids
from verde_spark.functions.langid import (
    LANG_SEEDS,
    PROFILES,
    _norm,
    lang_id_ngram_expr,
    lang_id_ngram_sql,
    reference_lang_id,
    train_lang_profiles,
)

SF = os.environ.get("SPARK_GRAFT_TEST_SF", "/root/testdata/sf0.001")

# held-out sentences (not in the seeds)
HELD_OUT = [
    ("the library closes early on sunday but the garden stays open", "en"),
    ("die bibliothek schließt sonntags früh aber der garten bleibt offen", "de"),
    ("la biblioteca cierra temprano el domingo pero el jardín sigue abierto", "es"),
    ("la bibliothèque ferme tôt le dimanche mais le jardin reste ouvert", "fr"),
    ("a biblioteca fecha cedo no domingo mas o jardim continua aberto", "pt"),
]

ADVERSARIAL = [
    ("", "und"),
    (None, "und"),
    ("zz", "und"),
    ("12345 67890 !!!", "und"),
    ("ok", "und"),
    ("la la la", None),          # ambiguous but must still AGREE across engines
    ("der die das und", None),   # short German function words
]


def test_held_out_accuracy_and_engine_agreement(spark):
    rows = [(i, s) for i, (s, _) in enumerate(HELD_OUT + ADVERSARIAL)]
    df = spark.createDataFrame(rows, "doc_id int, text string")
    got = {
        r["doc_id"]: r["p"]
        for r in df.select(
            "doc_id", lang_id_ngram_expr("text").alias("p")
        ).collect()
    }
    con = duckdb.connect()
    con.execute("CREATE TABLE tt(doc_id int, text varchar)")
    con.executemany("INSERT INTO tt VALUES (?, ?)", rows)
    duck = dict(
        con.execute(lang_id_ngram_sql("SELECT * FROM tt")).fetchall()
    )
    for i, (s, want) in enumerate(HELD_OUT + ADVERSARIAL):
        ref = reference_lang_id(s)
        assert got[i] == ref == duck[i], (i, s, got[i], ref, duck[i])
        if want is not None:
            assert got[i] == want, (i, s, got[i], want)


def test_seed_self_prediction():
    for lang, seed in LANG_SEEDS.items():
        assert reference_lang_id(seed) == lang


def test_min_grams_boundary():
    # the guard counts ALPHABET LETTERS (default min 8): 8 letters is
    # classified, 7 is und — and digit/space-only text is always und
    # (space-space bigrams carry no signal)
    assert reference_lang_id("wasserwe") != "und"   # 8 letters
    assert reference_lang_id("wasserw") == "und"    # 7 letters
    assert len(_gram_ids(_norm("12345 67890 !!!"))) > 8  # grams exist...
    assert reference_lang_id("12345 67890 !!!") == "und"  # ...letters don't
    # a permissive guard letting a gram-free doc through must still
    # return 'und' (the Catalyst twin coalesces the all-NULL scores) —
    # not crash on max() over all-None profile scores
    assert reference_lang_id("a", min_grams=1) == "und"
    assert reference_lang_id("", min_grams=0) == "und"


def test_corpus_training_matches_embedded(spark):
    # training on the seed paragraphs as a labeled corpus reproduces the
    # embedded profiles exactly (integer counts -> identical logp tables)
    df = spark.createDataFrame(
        [(lang, seed) for lang, seed in LANG_SEEDS.items()],
        "lang string, text string",
    ).repartition(3)
    profs = train_lang_profiles(df)
    assert set(profs) == set(PROFILES)
    for lang in profs:
        assert profs[lang].logp == PROFILES[lang].logp, lang


def test_trained_profiles_plug_into_expr(spark):
    df = spark.createDataFrame(
        [(lang, seed) for lang, seed in LANG_SEEDS.items()],
        "lang string, text string",
    )
    profs = train_lang_profiles(df)
    out = df.select(
        "lang", lang_id_ngram_expr("text", profiles=profs).alias("p")
    ).collect()
    assert all(r["p"] == r["lang"] for r in out)


def test_plan_is_pure_projection(spark):
    docs = spark.read.parquet(f"{SF}/documents.parquet")
    plan = (
        docs.select("doc_id", lang_id_ngram_expr("text").alias("p"))
        ._jdf.queryExecution()
        .executedPlan()
        .toString()
    )
    assert "Exchange" not in plan and "EvalPython" not in plan


def test_arrow_udf_prediction_agreement(spark):
    # the production Arrow path (counts @ logp matrix product) must
    # predict identically to the Catalyst serial-fold expression on the
    # fixture corpus AND on real document text — scores differ only in
    # float64 summation order, so disagreement means a real bug, not a
    # near-tie
    from verde_spark.functions.langid import lang_id_ngram_udf

    rows = [(i, s) for i, (s, _) in enumerate(HELD_OUT + ADVERSARIAL)]
    df = spark.createDataFrame(rows, "doc_id int, text string")
    docs = spark.read.parquet(f"{SF}/documents.parquet").select(
        F.col("doc_id") + 1000, "text"
    )
    both = df.union(docs)
    out = both.select(
        lang_id_ngram_expr("text").alias("fold"),
        lang_id_ngram_udf()("text").alias("arrow"),
    ).collect()
    assert out and all(r["fold"] == r["arrow"] for r in out)
    # trained-profile + min_grams passthrough agrees too
    profs = train_lang_profiles(
        spark.createDataFrame(
            [(lang, seed) for lang, seed in LANG_SEEDS.items()],
            "lang string, text string",
        )
    )
    out2 = both.select(
        lang_id_ngram_expr("text", profiles=profs, min_grams=4).alias("fold"),
        lang_id_ngram_udf(profiles=profs, min_grams=4)("text").alias("arrow"),
    ).collect()
    assert out2 and all(r["fold"] == r["arrow"] for r in out2)


def test_accented_text_keeps_signal(spark):
    # accents fold to base letters, not to spaces: the French sentence
    # with accents must classify the same as its accent-stripped form
    s_acc = "les élèves étudient à l'école près de la rivière"
    s_plain = "les eleves etudient a l'ecole pres de la riviere"
    assert _norm(s_acc) == s_plain  # 1:1 fold — nothing dropped
    assert reference_lang_id(s_acc) == reference_lang_id(s_plain) == "fr"
