"""Round-5 dogfood: drive the new stages the way a USER with non-default
column names would (the standing lesson: README-path dogfooding catches
what the suite misses).

Covers: word-bigram LM (train + score + bucketing scorer="word"),
char-n-gram language ID (embedded profiles + corpus-trained profiles),
the chunked exact ROC AUC, the frontier CLI job end-to-end, the
streaming norm_hash/text_hash split, and the bloom reserved-column
guard.

Run:  python tools/dogfood_r5.py
"""

from __future__ import annotations

import json
import os
import sys

os.environ.setdefault("SPARK_LOCAL_IP", "127.0.0.1")
sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def main() -> int:
    import tempfile

    from pyspark.sql import SparkSession
    from pyspark.sql import functions as F

    spark = (
        SparkSession.builder.master("local[4]")
        .appName("dogfood-r5")
        .config("spark.sql.shuffle.partitions", "8")
        .config("spark.ui.enabled", "false")
        .getOrCreate()
    )
    spark.sparkContext.setLogLevel("ERROR")
    tmp = tempfile.mkdtemp(prefix="dogfood_r5_")

    # --- word LM: train on a custom column, score, separate ---------------
    from verde_spark.functions.wordlm import (
        ENGLISH_WORD_LM,
        reference_word_logprob,
        train_word_lm,
        word_logprob_expr,
    )

    prose = (
        "the market opens early and people trade bread and fruit and "
        "stories about the weather and the roads"
    )
    noise = "qqzz wwkk xxjj zzvv qpqp zxzx kqvz jxqw zzqq vkwp"
    rows = [(i, prose + f" day {i}" if i % 2 == 0 else noise + f" {i}")
            for i in range(40)]
    docs = spark.createDataFrame(rows, "page_id int, body string")
    # CCNet shape: the LM trains on CLEAN text, then scores the crawl —
    # training on the mixed corpus would make the noise in-distribution
    lm = train_word_lm(
        docs.filter("page_id % 2 = 0"), text_col="body", vocab_size=64
    )
    assert len(lm.vocab) <= 64 and lm.bi_logp
    scored = docs.select(
        "page_id", word_logprob_expr(lm, "body").alias("lp"), "body"
    ).collect()
    for r in scored:
        assert r["lp"] == reference_word_logprob(lm, r["body"]), r["page_id"]
    print("PASS train_word_lm/word_logprob_expr on custom body column, "
          "bit-identical to the Python reference")

    ep = [r["lp"] for r in scored if r["page_id"] % 2 == 0]
    np_ = [r["lp"] for r in scored if r["page_id"] % 2 == 1]
    assert min(ep) > max(np_), "word LM must separate prose from noise"
    print("PASS corpus-trained word LM separates prose from noise")

    # --- perplexity buckets with the word scorer ---------------------------
    from verde_spark.operators.mixing import perplexity_buckets

    b = perplexity_buckets(
        docs, text_col="body", id_col="page_id", mode="rank",
        scorer="word", lm=lm, n_buckets=2,
    )
    got = {r["page_id"]: r["bucket"] for r in b.collect()}
    assert all(got[i] == 1 for i in range(0, 40, 2))
    assert all(got[i] == 2 for i in range(1, 40, 2))
    print("PASS perplexity_buckets(scorer='word') heads the prose half")

    # --- language ID: embedded profiles + corpus-trained ------------------
    from verde_spark.functions.langid import (
        lang_id_ngram_expr,
        reference_lang_id,
        train_lang_profiles,
    )

    sents = [
        (0, "the children walk to school and the weather stays dry", "en"),
        (1, "die kinder gehen zur schule und das wetter bleibt trocken", "de"),
        (2, "los niños caminan a la escuela y el tiempo sigue seco", "es"),
        (3, "les enfants marchent à l'école et le temps reste sec", "fr"),
        (4, "as crianças caminham para a escola e o tempo fica seco", "pt"),
        (5, "zz", "und"),
    ]
    sdf = spark.createDataFrame(sents, "sid int, phrase string, want string")
    pred = {
        r["sid"]: r["p"]
        for r in sdf.select(
            "sid", lang_id_ngram_expr("phrase").alias("p")
        ).collect()
    }
    for sid, phrase, want in sents:
        assert pred[sid] == want == reference_lang_id(phrase), (sid, pred[sid])
    print("PASS lang_id_ngram_expr embedded profiles on custom column, "
          "matches the Python reference on all 5 languages + und")

    profs = train_lang_profiles(sdf.filter("want <> 'und'"),
                                lang_col="want", text_col="phrase")
    assert set(profs) == {"en", "de", "es", "fr", "pt"}
    self_pred = sdf.filter("want <> 'und'").select(
        "want", lang_id_ngram_expr("phrase", profiles=profs, min_grams=4).alias("p")
    ).collect()
    assert all(r["p"] == r["want"] for r in self_pred)
    print("PASS train_lang_profiles on a labeled corpus, self-prediction exact")

    # --- chunked exact ROC AUC --------------------------------------------
    from verde_spark.operators.quality import roc_auc, roc_auc_components

    import random

    rng = random.Random(7)
    pts = [(rng.gauss(1.0, 1.0), 1) for _ in range(4000)] + [
        (rng.gauss(0.0, 1.0), 0) for _ in range(4000)
    ]
    ev = spark.createDataFrame(pts, "score double, label int")
    auc = roc_auc(ev)
    r1 = roc_auc_components(ev, chunks=1).first()
    r64 = roc_auc_components(ev.repartition(7), chunks=64).first()
    assert (r1["num2"], r1["n_pos"], r1["n_neg"]) == (
        r64["num2"], r64["n_pos"], r64["n_neg"]
    )
    assert 0.7 < auc < 0.85
    print(f"PASS roc_auc chunk/partition invariance (auc={auc:.4f})")

    # --- frontier CLI end-to-end ------------------------------------------
    from verde_spark.__main__ import main as cli_main

    urls = []
    for h in range(6):
        for p in range(30):
            urls.append((f"https://site{h}.example/p{p}",
                         "2024-01-01 00:00:00", f"text {h} {p}"))
    pages = spark.createDataFrame(
        urls, "url string, warc_ts string, text string"
    ).withColumn("warc_ts", F.to_timestamp("warc_ts"))
    pages.write.mode("overwrite").parquet(f"{tmp}/frontier_pages")
    robots = spark.createDataFrame(
        [
            ("site0.example", "User-agent: *\nDisallow: /p1\nCrawl-delay: 2"),
            ("site1.example", "User-agent: *\nDisallow: /"),
        ],
        "host string, robots_txt string",
    )
    robots.write.mode("overwrite").parquet(f"{tmp}/robots")
    pages.filter("url like 'https://site2%'").write.mode("overwrite").parquet(
        f"{tmp}/seen"
    )
    with open(f"{tmp}/blocked.txt", "w") as fh:
        fh.write("site3.example\n")
    rc = cli_main([
        "--job", "frontier", "--input", f"{tmp}/frontier_pages",
        "--output", f"{tmp}/schedule", "--robots", f"{tmp}/robots",
        "--blocklist-file", f"{tmp}/blocked.txt", "--seen", f"{tmp}/seen",
        "--max-per-host", "10",
    ])
    assert rc == 0
    sched = spark.read.parquet(f"{tmp}/schedule")
    hosts = {r["host"] for r in sched.select("host").distinct().collect()}
    # site1 fully disallowed, site2 fully seen, site3 blocklisted
    assert hosts == {"site0.example", "site4.example", "site5.example"}, hosts
    per_host = {
        r["host"]: r["n"]
        for r in sched.groupBy("host").agg(
            F.count("*").alias("n"),
            F.max("eta_sec").alias("m"),
        ).collect()
    }
    assert all(n <= 10 for n in per_host.values())
    # Disallow /p1 on site0 drops /p1 + /p1x.. (11 urls) -> 19 left, cap 10
    s0 = sched.filter("host = 'site0.example'")
    assert s0.count() == 10
    # crawl-delay 2 honored: eta of fetch_seq k = 2*(k-1)
    etas = {r["fetch_seq"]: r["eta_sec"] for r in s0.collect()}
    assert etas[3] == 4.0 and etas[10] == 18.0
    print("PASS --job frontier CLI: robots + blocklist + seen + cap + delay "
          "compose end-to-end")

    # --- streaming text_hash stays the raw-content hash -------------------
    from verde_spark.operators.dedup import seen_hashes
    from verde_spark.streaming import run_to_memory, streaming_clean_corpus

    base = "the cat sat on the mat and it is a fine day for walking"
    srows = [
        ("http://a.com/1", "2024-01-01 00:00:01", base + " 111"),
        ("http://b.com/2", "2024-01-01 00:00:02", base.upper() + " 999"),
    ]
    sdf2 = spark.createDataFrame(
        srows, "url string, warc_ts string, text string"
    ).withColumn("warc_ts", F.to_timestamp("warc_ts"))
    sdf2.write.mode("overwrite").parquet(f"{tmp}/stream_pages")
    stream = spark.readStream.schema(
        "url string, warc_ts timestamp, text string"
    ).parquet(f"{tmp}/stream_pages")
    out = streaming_clean_corpus(
        stream, watermark="1 hour", min_tokens=5,
        min_stopword_ratio=0.2, normalize_dedup=True,
    )
    run_to_memory(out, "r5_sink", mode="append")
    sink = spark.sql("select * from r5_sink")
    assert "norm_hash" in sink.columns and "text_hash" in sink.columns
    raw = {r["text_hash"] for r in seen_hashes(
        spark.read.parquet(f"{tmp}/stream_pages")).collect()}
    got_hashes = {r["text_hash"] for r in sink.collect()}
    assert got_hashes <= raw, "sink text_hash must be the RAW-content hash"
    print("PASS streaming normalize_dedup sink keeps raw text_hash + "
          "separate norm_hash (seen-set interchangeable)")

    # --- pretrain CLI end-to-end -------------------------------------------
    # clean → Arrow language routing → α-rebalance → vocab → ids → layout,
    # through the real argv surface with a 3-language keep-list
    from verde_spark.functions.langid import LANG_SEEDS

    prows = []
    for lang, n in (("en", 30), ("fr", 18), ("es", 12), ("de", 8)):
        prows += [
            (f"http://{lang}.site/{i}", "2024-01-01 00:00:00",
             LANG_SEEDS[lang] + f" doc {i}")
            for i in range(n)
        ]
    spark.createDataFrame(
        prows, "url string, warc_ts string, text string"
    ).withColumn("warc_ts", F.to_timestamp("warc_ts")).write.mode(
        "overwrite"
    ).parquet(f"{tmp}/pre_pages")
    rc = cli_main([
        "--job", "pretrain", "--input", f"{tmp}/pre_pages",
        "--output", f"{tmp}/pre", "--langs", "en,fr,es",
        "--mix-total", "30", "--mix-alpha", "0.5",
        "--vocab-size", "200", "--seq-len", "32", "--n-shards", "2",
        "--min-tokens", "3",
    ])
    assert rc == 0
    routed = spark.read.parquet(f"{tmp}/pre/routed")
    toks = spark.read.parquet(f"{tmp}/pre/tokens")
    layout = spark.read.parquet(f"{tmp}/pre/layout")
    langs_out = {r["lang"] for r in routed.select("lang").distinct().collect()}
    assert langs_out <= {"en", "fr", "es"}, langs_out  # de routed OUT
    n_routed = routed.count()
    # per-language quotas floor, so the total lands within L of the target
    assert 27 <= n_routed <= 30, n_routed
    assert toks.count() == layout.count() == n_routed
    bad_span = toks.join(layout, toks["doc_id"] == layout["doc_id"]).filter(
        F.col("end_tok") - F.col("start_tok") != F.col("n_ids")
    ).count()
    assert bad_span == 0
    print("PASS --job pretrain CLI: clean + Arrow lang routing + "
          "temperature mix + vocab/ids/layout consistent end-to-end")

    # --- bloom reserved-column guard ---------------------------------------
    from verde_spark.operators.bloom import bloom_might_contain, build_bloom

    keys = spark.createDataFrame([(i,) for i in range(10)], "k long")
    blm = build_bloom(keys, "k", num_bits=1 << 12)
    probe = keys.withColumn("__bpos", F.lit(1))
    try:
        bloom_might_contain(probe, blm, "k", num_bits=1 << 12)
        raise AssertionError("expected ValueError on reserved column")
    except ValueError as e:
        assert "__bpos" in str(e)
    print("PASS bloom_might_contain raises on reserved working-column clash")

    print(json.dumps({"dogfood_r5": "ALL PASS"}))
    spark.stop()
    return 0


if __name__ == "__main__":
    sys.exit(main())
