"""URL canonicalization / url-keyed dedup / domain top-k, plus the
within-document repetition signal — crawl-pipeline front-door ops."""

import duckdb
import numpy as np
import pandas as pd
import pytest
from pyspark.sql import functions as F

from verde_spark.functions.urls import (
    canonical_url,
    canonical_url_sql,
    dedup_url,
    domain_of,
    reference_canonical_url,
    top_domains,
)

CASES = [
    "HTTP://Example.COM:80/Path/To?b=2&utm_source=x&a=1#frag",
    "https://example.com:443",
    "https://example.com:8443/x?gclid=1&z=9&y=8",
    "  http://A.B/?utm_campaign=c&utm_medium=m  ",
    "ftp://Files.Example.com:21/pub",
    "not a url at all #tail",
    "https://example.com/CaseSensitive/Path",
    "http://example.com/?fbclid=abc",
    "https://user@host.com:443/p?a=1&a=0",
    "http://example.com:8080/keepport",
    "https://example.com/p?utm_x=1&b=1&gclidx=2",
    "",
]


def test_canonical_url_spec_goldens():
    r = reference_canonical_url
    assert r(CASES[0]) == "http://example.com/Path/To?a=1&b=2"
    assert r(CASES[1]) == "https://example.com/"
    assert r(CASES[3]) == "http://a.b/"
    assert r(CASES[5]) == "not a url at all "  # defragmented, else untouched
    assert r(CASES[9]) == "http://example.com:8080/keepport"
    # gclidx is NOT gclid; utm_x IS utm_*
    assert r(CASES[10]) == "https://example.com/p?b=1&gclidx=2"


def test_canonical_url_three_engines_identical(spark):
    want = [reference_canonical_url(c) for c in CASES]

    df = spark.createDataFrame(
        [(i, c) for i, c in enumerate(CASES)], "i long, url string"
    )
    got_spark = [
        r["c"]
        for r in df.select(canonical_url("url").alias("c"), "i").orderBy("i").collect()
    ]
    assert got_spark == want

    con = duckdb.connect()
    con.register("t", pd.DataFrame({"i": range(len(CASES)), "u": CASES}))
    got_duck = con.execute(
        f"SELECT {canonical_url_sql('u')} AS c FROM t ORDER BY i"
    ).df()["c"].tolist()
    assert got_duck == want


def test_canonical_url_is_pure_projection(spark):
    df = spark.createDataFrame([("http://a.com/x",)], "url string")
    plan = (
        df.select(canonical_url("url"))
        ._jdf.queryExecution()
        .executedPlan()
        .toString()
    )
    assert "Exchange" not in plan and "Python" not in plan


def test_dedup_url_keeps_latest_per_canonical(spark):
    rows = [
        ("http://A.com/p?utm_source=1", "2024-01-01 00:00:00", 1),
        ("http://a.com/p", "2024-01-03 00:00:00", 2),  # latest of the group
        ("http://a.com:80/p#f", "2024-01-02 00:00:00", 3),
        ("https://b.com/q", "2024-01-01 00:00:00", 4),
    ]
    df = spark.createDataFrame(rows, "url string, warc_ts string, payload long").withColumn(
        "warc_ts", F.to_timestamp("warc_ts")
    )
    kept = dedup_url(df).orderBy("payload").collect()
    assert [r["payload"] for r in kept] == [2, 4]
    earliest = dedup_url(df, keep="earliest").orderBy("payload").collect()
    assert [r["payload"] for r in earliest] == [1, 4]
    assert set(kept[0].asDict()) == {"url", "warc_ts", "payload"}


def test_dedup_url_partition_invariant(spark):
    from verde_spark.sources.pages import synthesize_pages

    pages = synthesize_pages(spark, 200).withColumn(
        "url",
        F.concat(
            F.lit("http://Example.com/p"),
            (F.xxhash64("url") % 37).cast("string"),
            F.lit("?utm_source=s&k="),
            (F.xxhash64("url") % 3).cast("string"),
        ),
    )
    a = dedup_url(pages).orderBy("url").toPandas()
    b = dedup_url(pages.repartition(13)).orderBy("url").toPandas()
    pd.testing.assert_frame_equal(a, b)
    assert 0 < len(a) < 200


def test_top_domains_exact_and_plan(spark):
    urls = (
        [f"https://big.com/{i}" for i in range(30)]
        + [f"http://Mid.com:80/{i}" for i in range(20)]
        + [f"https://small.org/{i}?x={i}" for i in range(10)]
    )
    df = spark.createDataFrame([(u,) for u in urls], "url string")
    got = top_domains(df, k=2).collect()
    assert [(r["domain"], r["n_pages"]) for r in got] == [("big.com", 30), ("mid.com", 20)]
    plan = top_domains(df, k=2)._jdf.queryExecution().executedPlan().toString()
    assert "TakeOrderedAndProject" in plan  # no global sort

    dom = df.select(domain_of("url").alias("d")).distinct().collect()
    assert {r["d"] for r in dom} == {"big.com", "mid.com", "small.org"}


# ---------------------------------------------------------------------------
# repetition_ratio
# ---------------------------------------------------------------------------


def _rep_reference(text, n=2):
    if text is None:
        return None
    import re

    words = re.split("[ \t\r\n\f]+", text.strip(" ").lower())
    grams = [" ".join(words[i : i + n]) for i in range(max(len(words) - n + 1, 0))]
    if not grams:
        return 0.0
    return 1.0 - len(set(grams)) / len(grams)


def test_repetition_ratio_three_engines(spark):
    from verde_spark.functions.text import repetition_ratio, repetition_ratio_sql

    texts = [
        "the cat sat on the mat the cat sat again",
        "buy now buy now buy now buy now",
        "all words unique in this one sentence",
        "one",
        "",
        None,
        "Tabs\there and\nnewlines repeat tabs\there and\nnewlines repeat",
    ]
    want = [_rep_reference(t) for t in texts]
    assert want[1] and want[1] > 0.5  # fixture discriminates
    assert want[2] == 0.0

    df = spark.createDataFrame([(i, t) for i, t in enumerate(texts)], "i long, text string")
    got = [
        r["r"]
        for r in df.select(repetition_ratio("text").alias("r"), "i").orderBy("i").collect()
    ]
    assert got == want  # bit-identical (same division, same ints)

    con = duckdb.connect()
    con.register("t", pd.DataFrame({"i": range(len(texts)), "text": texts}))
    got_duck = con.execute(
        f"SELECT {repetition_ratio_sql('text')} AS r FROM t ORDER BY i"
    ).df()["r"].tolist()
    got_duck = [None if pd.isna(v) else v for v in got_duck]
    assert got_duck == want


def test_canonical_url_fuzz_three_engines(spark):
    """Component-built fuzz urls (seeded): random scheme/host case, ports,
    paths, param soups and fragments — all three engines byte-identical."""
    import random

    rng = random.Random(777)
    schemes = ["http", "HTTP", "https", "HTTPS", "ftp", ""]
    hosts = ["Example.COM", "a.b.c", "HOST", "user@Example.com", ""]
    ports = ["", ":80", ":443", ":8080", ":"]
    paths = ["", "/", "/P/q", "/a%20b", "//x"]
    params = ["", "a=1", "utm_source=x", "b", "gclid=2", "z=Z", "utm_", "&", "a=1&a=0"]
    frags = ["", "#f", "#a#b"]
    urls = []
    for _ in range(300):
        u = (
            rng.choice(schemes)
            + ("://" if rng.random() < 0.9 else ":/")
            + rng.choice(hosts)
            + rng.choice(ports)
            + rng.choice(paths)
            + ("?" + "&".join(rng.choice(params) for _ in range(rng.randint(0, 4)))
               if rng.random() < 0.7 else "")
            + rng.choice(frags)
        )
        if rng.random() < 0.1:
            u = " " + u + "  "
        urls.append(u)
    want = [reference_canonical_url(u) for u in urls]

    df = spark.createDataFrame([(i, u) for i, u in enumerate(urls)], "i long, url string")
    got = [
        r["c"]
        for r in df.select("i", canonical_url("url").alias("c")).orderBy("i").collect()
    ]
    assert got == want

    con = duckdb.connect()
    con.register("fz", pd.DataFrame({"i": range(len(urls)), "u": urls}))
    got_duck = con.execute(
        f"SELECT {canonical_url_sql('u')} AS c FROM fz ORDER BY i"
    ).df()["c"].tolist()
    assert got_duck == want


def test_stopword_ratio_three_engines(spark):
    from verde_spark.functions.text import (
        _STOPWORDS,
        stopword_ratio,
        stopword_ratio_sql,
    )

    texts = [
        "the cat sat on the mat and it is that simple for anyone",
        "buy cheap widgets best price widgets discount widgets",
        "",
        None,
        "THE AND OF",  # case folding
        "word",
    ]

    def ref(t, lang="en"):
        if t is None:
            return None
        import re

        ws = re.split("[ \t\r\n\f]+", t.strip(" ").lower())
        return sum(w in _STOPWORDS[lang] for w in ws) / max(len(ws), 1)

    want = [ref(t) for t in texts]
    assert want[0] > 0.3 and want[1] == 0.0 and want[4] == 1.0

    df = spark.createDataFrame([(i, t) for i, t in enumerate(texts)], "i long, text string")
    got = [
        r["s"]
        for r in df.select("i", stopword_ratio("text").alias("s")).orderBy("i").collect()
    ]
    assert got == want

    con = duckdb.connect()
    con.register("sw", pd.DataFrame({"i": range(len(texts)), "text": texts}))
    got_duck = con.execute(
        f"SELECT {stopword_ratio_sql('text')} AS s FROM sw ORDER BY i"
    ).df()["s"].tolist()
    got_duck = [None if pd.isna(v) else v for v in got_duck]
    assert got_duck == want

    with pytest.raises(ValueError):
        stopword_ratio("text", lang="xx")
