"""HTML→text extraction — the input_hint's per-row invariant:
byte-identical extracted text per url vs the reference extractor.

Three-way agreement is asserted on every fixture: the Catalyst engine
(`extract_text`), the single-node Python reference
(`reference_extract_text`), and the DuckDB SQL chain (`extract_text_sql`,
the driver-oracle form).
"""

import duckdb
import pandas as pd
from pyspark.sql import functions as F

from verde_spark.functions.extract import (
    extract_text,
    extract_text_sql,
    reference_extract_text,
)
from verde_spark.sources.pages import synthesize_pages

# adversarial corpus: scripts with attributes + tags inside strings,
# uppercase tags, style blocks, comments containing tags, all five
# entities (incl. the &amp;lt; double-decode trap), every whitespace
# char in the collapse class, multi-byte UTF-8, stray '<'
CASES = [
    b"<html><body>plain text</body></html>",
    b"<HTML><BODY CLASS='x'>upper <B>bold</B> case</BODY></HTML>",
    b"<script type='text/javascript'>var s = '<b>not text</b>';</script>kept",
    b"<SCRIPT>\nmulti\nline\n</SCRIPT>before<style>p { color: red; }</style>after",
    b"a<!-- comment with <tags> and\nnewlines -->b",
    b"5 &lt; 6 &amp;&amp; 7 &gt; 2, &quot;q&quot; &#39;a&#39;",
    b"&amp;lt; stays entity-escaped once decoded",
    b"tabs\there\r\nnewlines\fformfeed  doubled   spaces",
    "café 中文 <p>ümläut</p>".encode("utf-8"),
    b"stray < bracket stays when never closed",
    b"",
    b"   ",
    b"<p></p>",
]


def test_reference_extractor_spec():
    """Spot-check the written spec on hand-derivable cases."""
    assert reference_extract_text(b"<html><body>plain text</body></html>") == "plain text"
    assert reference_extract_text(CASES[2]) == "kept"
    assert reference_extract_text(CASES[3]) == "before after"
    assert reference_extract_text(CASES[4]) == "a b"
    assert reference_extract_text(CASES[5]) == "5 < 6 && 7 > 2, \"q\" 'a'"
    # &amp;lt; → the literal text "&lt;" (amp decoded LAST, no re-decode)
    assert reference_extract_text(CASES[6]) == "&lt; stays entity-escaped once decoded"
    assert reference_extract_text(CASES[7]) == "tabs here newlines formfeed doubled spaces"
    assert reference_extract_text(CASES[10]) == ""
    assert reference_extract_text(CASES[12]) == ""


def test_extract_three_engines_byte_identical(spark):
    want = [reference_extract_text(h) for h in CASES]

    df = spark.createDataFrame(
        [(i, bytearray(h)) for i, h in enumerate(CASES)], "i long, html binary"
    )
    got_spark = [
        r["t"] for r in df.select(extract_text("html").alias("t"), "i").orderBy("i").collect()
    ]
    assert got_spark == want

    con = duckdb.connect()
    pdf = pd.DataFrame({"i": range(len(CASES)), "s": [h.decode("utf-8") for h in CASES]})
    con.register("pages", pdf)
    got_duck = con.execute(
        f"SELECT {extract_text_sql('s')} AS t FROM pages ORDER BY i"
    ).df()["t"].tolist()
    assert got_duck == want


def test_page_table_invariant_byte_identical_text_per_url(spark):
    """The north-rule invariant on the actual page table: extracting the
    html column reproduces the text column byte-for-byte, per url."""
    pages = synthesize_pages(spark, 300)
    mismatches = (
        pages.select(
            "url", "text", extract_text("html").alias("extracted")
        )
        .filter(F.col("extracted") != F.col("text"))
        .count()
    )
    assert mismatches == 0
    # and the single-node reference agrees on a sample
    sample = pages.limit(25).collect()
    for r in sample:
        assert reference_extract_text(bytes(r["html"])) == r["text"]


def test_extract_text_is_pure_projection(spark):
    """No shuffle, no Python workers: the plan is scan → project."""
    pages = synthesize_pages(spark, 10)
    plan = (
        pages.select(extract_text("html").alias("t"))
        ._jdf.queryExecution()
        .executedPlan()
        .toString()
    )
    assert "Exchange" not in plan
    assert "Python" not in plan and "ArrowEval" not in plan and "BatchEval" not in plan


def test_extract_fuzz_spark_vs_reference(spark):
    """Component-built fuzz corpus (seeded): random nestings of tags,
    scripts, comments, entities, whitespace runs, multi-byte UTF-8 and
    invalid bytes — Spark and the Python reference must stay
    byte-identical on every sample."""
    import random

    rng = random.Random(12345)
    pieces = [
        "plain words ", "<b>", "</b>", "<SCRIPT a='<i>'>x</SCRIPT>",
        "<script>", "</script>", "<style>p{}</style>", "<!--", "-->",
        "&amp;", "&lt;", "&gt;", "&quot;", "&#39;", "&amp;lt;",
        " ", "\t", "\n", "\r\n", "\f", "é", "中", "<", ">", "=", '"',
        "un closed <tag attr", "word", "<p class='x'>", "</p>",
    ]
    docs = []
    for _ in range(250):
        body = "".join(rng.choice(pieces) for _ in range(rng.randint(0, 25)))
        b = body.encode("utf-8")
        if rng.random() < 0.2:  # splice an invalid byte run
            pos = rng.randint(0, len(b))
            b = b[:pos] + bytes([0xC3, 0x28, 0xFF]) + b[pos:]
        docs.append(b)
    want = [reference_extract_text(b) for b in docs]
    df = spark.createDataFrame(
        [(i, bytearray(b)) for i, b in enumerate(docs)], "i long, html binary"
    )
    got = [
        r["t"]
        for r in df.select("i", extract_text("html").alias("t")).orderBy("i").collect()
    ]
    assert got == want


def test_geotag_from_extracted_html_equals_stored_text(spark):
    """North-star chain: geotag from extract_text(html) must equal the
    stored-text geotag on every page (the byte-identity invariant makes
    the two modes provably the same)."""
    from verde_spark.sources.pages import geotagged, synthesize_pages

    pages = synthesize_pages(spark, 200)
    a = geotagged(pages).select("url", "lon", "lat")
    b = geotagged(pages, from_html=True).select("url", "lon", "lat")
    assert a.exceptAll(b).count() == 0 and b.exceptAll(a).count() == 0
    assert a.filter("lon IS NULL OR lat IS NULL").count() == 0
