"""Round-4 front-door stages: benchmark decontamination (C4 13-gram
rule), PII redaction (three-engine byte identity), per-domain corpus
caps, and their clean_corpus wiring."""

import duckdb
import pytest
from pyspark.sql import functions as F

from verde_spark.functions.pii import (
    pii_counts,
    pii_counts_sql,
    redact_pii,
    redact_pii_sql,
    reference_redact_pii,
)
from verde_spark.operators.decontam import (
    contaminated_ids,
    contamination_stats,
    decontaminate,
)
from verde_spark.operators.sampling import cap_per_domain

# 13 words — one full gram; appending a word yields more grams sharing it
_SENT = "the quick brown fox jumps over the lazy dog near the old barn"


def _corpus(spark):
    rows = [
        (0, _SENT),                               # exact benchmark sentence
        (1, "prefix words here " + _SENT),        # contains it → contaminated
        (2, "totally different text with plenty of words but nothing shared "
            "from any benchmark document at all here now"),
        (3, "short doc"),                         # < 13 words → no grams
        (4, _SENT + " and one extra tail word"),  # contaminated
        (5, None),                                # null text
    ]
    return spark.createDataFrame(rows, "doc_id long, text string")


def _bench(spark):
    return spark.createDataFrame([(_SENT,)], "text string")


def test_decontaminate_drops_contaminated(spark):
    corpus, bench = _corpus(spark), _bench(spark)
    kept = sorted(
        r["doc_id"] for r in decontaminate(corpus, bench).select("doc_id").collect()
    )
    assert kept == [2, 3, 5]
    dropped = sorted(
        r["doc_id"] for r in contaminated_ids(corpus, bench).collect()
    )
    assert dropped == [0, 1, 4]


def test_contamination_stats_values(spark):
    corpus, bench = _corpus(spark), _bench(spark)
    stats = {
        r["doc_id"]: r
        for r in contamination_stats(corpus, bench).collect()
    }
    assert len(stats) == 6
    assert stats[0]["n_grams"] == 1 and stats[0]["n_contaminated"] == 1
    assert stats[0]["contamination"] == 1.0
    # doc 1: 3 prefix words + 13 → 16 words → 4 grams, 1 shared
    assert stats[1]["n_grams"] == 4 and stats[1]["n_contaminated"] == 1
    assert stats[2]["n_contaminated"] == 0
    assert stats[3]["n_grams"] == 0 and stats[3]["contamination"] == 0.0
    assert stats[4]["n_contaminated"] == 1
    assert stats[5]["n_grams"] == 0 and stats[5]["n_contaminated"] == 0


def test_decontaminate_min_overlap(spark):
    corpus, bench = _corpus(spark), _bench(spark)
    # doc 1 and doc 4 share exactly 1 gram with the benchmark; requiring 2
    # keeps them, doc 0 has only 1 gram total so it is kept too
    kept = sorted(
        r["doc_id"]
        for r in decontaminate(corpus, bench, min_overlap=2)
        .select("doc_id")
        .collect()
    )
    assert kept == [0, 1, 2, 3, 4, 5]
    with pytest.raises(ValueError, match="min_overlap"):
        contaminated_ids(corpus, bench, min_overlap=0)


def test_decontaminate_custom_columns(spark):
    corpus = spark.createDataFrame(
        [(10, _SENT), (11, "unrelated words " * 10)], "pk long, body string"
    )
    bench = spark.createDataFrame([(_SENT,)], "body string")
    kept = decontaminate(
        corpus, bench, id_col="pk", text_col="body"
    ).collect()
    assert [r["pk"] for r in kept] == [11]


# --- PII -----------------------------------------------------------------

_PII_FIXTURES = [
    "mail me at john.doe+spam@sub.example.co.uk please",
    "two mails a@b.io c.d@e.org and an ip 10.0.0.1",
    "server at 255.255.255.255 but not 999.1.2.3 or 1.2.3.4.5",
    "call +1 555-0134 or (020) 7946 0958 now",
    "dial 555-867-5309 tonight",
    "the year range 1999-2026 and date 2026-08-18 stay",
    "version 1.2.3 is not an ip, 1.2.3.4 is",
    "+442079460958 compact international",
    "no pii here at all",
    "",
    "edge@case.museum.",
    "ip at end 192.168.0.1",
    "(55) 123-4567 short area",
]


def test_redact_pii_three_engine_identity(spark):
    con = duckdb.connect()
    sdf = spark.createDataFrame(
        [(i, t) for i, t in enumerate(_PII_FIXTURES)], "i long, t string"
    )
    got = {
        r["i"]: r["clean"]
        for r in sdf.select("i", redact_pii("t").alias("clean")).collect()
    }
    for i, t in enumerate(_PII_FIXTURES):
        ref = reference_redact_pii(t)
        duck = con.execute(
            f"SELECT {redact_pii_sql('?::VARCHAR')}", [t]
        ).fetchone()[0]
        assert got[i] == ref == duck, (i, t, got[i], ref, duck)


def test_pii_counts_three_engine_identity(spark):
    con = duckdb.connect()
    sdf = spark.createDataFrame(
        [(i, t) for i, t in enumerate(_PII_FIXTURES)], "i long, t string"
    )
    c = pii_counts("t")
    got = {
        r["i"]: (r["c"]["n_emails"], r["c"]["n_ips"], r["c"]["n_phones"])
        for r in sdf.select("i", c.alias("c")).collect()
    }
    e_sql, i_sql, p_sql = pii_counts_sql("?::VARCHAR")
    for i, t in enumerate(_PII_FIXTURES):
        duck = con.execute(
            f"SELECT {e_sql}, {i_sql}, {p_sql}", [t, t, t]
        ).fetchone()
        assert got[i] == tuple(duck), (i, t, got[i], duck)


def test_redact_pii_expected_tokens(spark):
    sdf = spark.createDataFrame(
        [("write a@b.io from 10.0.0.1 or +1 555-0134",)], "t string"
    )
    [row] = sdf.select(redact_pii("t").alias("c")).collect()
    assert row["c"] == "write <EMAIL> from <IP> or <PHONE>"
    # false-positive guards: bare years / ISO dates survive
    sdf2 = spark.createDataFrame([("range 1999-2026 on 2026-08-18",)], "t string")
    [row2] = sdf2.select(redact_pii("t").alias("c")).collect()
    assert row2["c"] == "range 1999-2026 on 2026-08-18"


def test_redact_pii_null_and_plan(spark):
    sdf = spark.createDataFrame([(None,)], "t string")
    assert sdf.select(redact_pii("t").alias("c")).collect()[0]["c"] is None
    plan = (
        sdf.select(redact_pii("t").alias("c"))
        ._jdf.queryExecution()
        .executedPlan()
        .toString()
    )
    assert "Exchange" not in plan and "Python" not in plan


# --- per-domain caps -----------------------------------------------------


def test_cap_per_domain_caps_and_determinism(spark):
    rows = [
        (i, f"https://site{i % 3}.com/page/{i}") for i in range(90)
    ]
    df = spark.createDataFrame(rows, "id long, url string")
    out = cap_per_domain(df, 5)
    pdf = out.toPandas()
    assert len(pdf) == 15
    assert set(out.columns) == {"id", "url"}  # derived domain dropped
    per_dom = (
        cap_per_domain(df, 5, keep_domain=True)
        .groupBy("__domain")
        .count()
        .collect()
    )
    assert {r["__domain"] for r in per_dom} == {
        "site0.com", "site1.com", "site2.com"
    }
    assert all(r["count"] == 5 for r in per_dom)
    # deterministic under repartition
    again = sorted(r["id"] for r in cap_per_domain(df.repartition(7), 5).collect())
    assert again == sorted(pdf["id"].tolist())


def test_cap_per_domain_existing_column_and_validation(spark):
    df = spark.createDataFrame(
        [(i, "d" + str(i % 2)) for i in range(10)], "id long, dom string"
    )
    out = cap_per_domain(df, 3, domain_col="dom")
    assert out.count() == 6
    assert "dom" in out.columns  # caller's column is never dropped
    with pytest.raises(ValueError, match="max_pages"):
        cap_per_domain(df, 0, domain_col="dom")


def test_clean_corpus_round4_stages(spark):
    from verde_spark.pipelines import clean_corpus

    rows = []
    for i in range(40):
        dom = f"site{i % 2}.com"
        text = (
            f"the cat sat on the mat and it is day {i} with email x{i}@ex.com "
            "and some more words to pass the token gate"
        )
        if i == 7:
            text = _SENT + " plus the usual filler words to pass every gate"
        rows.append((f"https://{dom}/p{i}", float(i), text))
    pages = spark.createDataFrame(rows, "url string, warc_ts double, text string")
    bench = spark.createDataFrame([(_SENT,)], "text string")
    out = clean_corpus(
        pages,
        ts_col="warc_ts",
        benchmark=bench,
        redact=True,
        max_per_domain=10,
    )
    pdf = out.toPandas()
    # decontamination dropped doc 7; caps bind at 10 per domain
    assert not pdf["url"].str.contains("/p7$").any()
    assert len(pdf) == 20
    assert (pdf.groupby(pdf["url"].str.extract(r"https://([^/]+)/")[0]).size() == 10).all()
    # redaction: new column, original text untouched (byte identity)
    assert "text_clean" in pdf.columns
    assert pdf["text_clean"].str.contains("<EMAIL>").all()
    assert pdf["text"].str.contains("@ex.com").all()


def test_contamination_filter_matches_decontaminate(spark):
    from verde_spark.operators.decontam import contamination_filter

    corpus, bench = _corpus(spark), _bench(spark)
    kept_filter = sorted(
        r["doc_id"]
        for r in corpus.filter(~contamination_filter(bench)).collect()
    )
    kept_join = sorted(
        r["doc_id"] for r in decontaminate(corpus, bench).collect()
    )
    assert kept_filter == kept_join == [2, 3, 5]
    # stateless: a pure filter over the scan, no exchange, no Python
    plan = (
        corpus.filter(~contamination_filter(bench))
        ._jdf.queryExecution().executedPlan().toString()
    )
    assert "Exchange" not in plan
    assert "BatchEvalPython" not in plan and "ArrowEvalPython" not in plan
    # empty benchmark -> nothing contaminated
    empty = spark.createDataFrame([], "text string")
    assert corpus.filter(~contamination_filter(empty)).count() == 6
    with pytest.raises(ValueError, match="max_grams"):
        contamination_filter(bench, max_grams=0)
