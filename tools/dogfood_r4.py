"""Round-4 dogfood: drive the new front-door stages the way a USER with
non-default column names would (the standing lesson: README-path
dogfooding catches what the suite misses).

Scenario: a crawl table with columns (page_url, fetched_at, body) — none
of the defaults — goes through decontamination, PII redaction and
per-domain caps, standalone AND composed via clean_corpus.

Run:  python tools/dogfood_r4.py
"""

from __future__ import annotations

import os
import sys

os.environ.setdefault("SPARK_LOCAL_IP", "127.0.0.1")
sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def main() -> int:
    from pyspark.sql import SparkSession
    from pyspark.sql import functions as F

    from verde_spark import (
        cap_per_domain,
        clean_corpus,
        contamination_stats,
        decontaminate,
        pii_counts,
        redact_pii,
    )

    spark = (
        SparkSession.builder.master("local[4]")
        .appName("dogfood-r4")
        .config("spark.sql.shuffle.partitions", "8")
        .config("spark.ui.enabled", "false")
        .getOrCreate()
    )
    spark.sparkContext.setLogLevel("ERROR")

    leak = "the forbidden eval answer is exactly forty two under every single benchmark prompt"
    rows = []
    for i in range(60):
        body = (
            f"page {i} says the weather is mild and the cat sits on mat {i} "
            f"write to owner{i}@mail.test or dial +1 555-{1000 + i} thanks"
        )
        if i % 20 == 3:
            body += " " + leak
        rows.append((f"https://host{i % 4}.example/p{i}", float(i), body))
    pages = spark.createDataFrame(rows, "page_url string, fetched_at double, body string")
    bench = spark.createDataFrame([(leak,)], "body string")

    # --- standalone ops with custom names ---------------------------------
    stats = contamination_stats(
        pages, bench, id_col="page_url", text_col="body"
    )
    n_cont = stats.filter(F.col("n_contaminated") > 0).count()
    assert n_cont == 3, f"expected 3 contaminated pages, got {n_cont}"

    kept = decontaminate(pages, bench, id_col="page_url", text_col="body")
    assert kept.count() == 57, kept.count()
    print("PASS decontaminate/contamination_stats with custom columns")

    red = pages.withColumn("body_clean", redact_pii("body")).withColumn(
        "pii", pii_counts("body")
    )
    bad = red.filter(
        ~F.col("body_clean").contains("<EMAIL>")
        | ~F.col("body_clean").contains("<PHONE>")
        | F.col("body_clean").contains("@mail.test")
    ).count()
    assert bad == 0, f"{bad} rows with unredacted PII"
    assert red.filter(F.col("body").contains("@mail.test")).count() == 60, (
        "original body column must stay untouched"
    )
    assert red.select(F.sum("pii.n_emails")).first()[0] == 60
    print("PASS redact_pii/pii_counts on custom column, original untouched")

    capped = cap_per_domain(pages, 5, url_col="page_url")
    assert capped.count() == 20, capped.count()
    assert capped.columns == pages.columns, capped.columns
    print("PASS cap_per_domain with custom url column")

    # --- composed via clean_corpus ----------------------------------------
    out = clean_corpus(
        pages,
        url_col="page_url",
        ts_col="fetched_at",
        text_col="body",
        benchmark=bench,
        redact=True,
        max_per_domain=8,
    ).cache()
    n = out.count()
    assert n == 32, f"expected 4 domains x 8, got {n}"  # 57 survivors, all domains >8
    assert "body_clean" in out.columns
    assert out.filter(F.col("body_clean").contains("@mail.test")).count() == 0
    assert out.filter(~F.col("body").contains("@mail.test")).count() == 0
    assert out.filter(F.col("body").contains(leak.split()[3])).count() == 0
    print("PASS clean_corpus(benchmark=..., redact=True, max_per_domain=8) "
          "with page_url/fetched_at/body columns")

    # --- corpus_report / pack_sequences / SnapshotStore (late r4) ---------
    from verde_spark import corpus_report, pack_sequences, packing_stats

    rep = {r["lang"]: r for r in corpus_report(out, text_col="body").collect()}
    assert rep["ALL"]["n_docs"] == n, rep["ALL"]
    assert rep["ALL"]["dup_rate"] == 0.0, rep["ALL"]  # post-dedup corpus
    print("PASS corpus_report over the cleaned corpus (custom text column)")

    packed = pack_sequences(
        out, seq_len=32, text_col="body", id_col="page_url", n_shards=2
    )
    st = packing_stats(packed, 32).collect()
    assert sum(r["n_docs"] for r in st) == n
    assert packed.count() == n and {r["shard"] for r in st} <= {0, 1}
    print("PASS pack_sequences/packing_stats keyed by a STRING id column")

    # --- crawl gates + anchor texts + keep-best dedup (late r4) -----------
    from verde_spark import filter_blocklist, robots_filter, top_anchor_texts

    crawl = pages.withColumn(
        "page_html",
        F.concat(
            F.when(F.col("fetched_at") % 7 == 0,
                   F.lit('<meta name="robots" content="noindex">')).otherwise(F.lit("")),
            F.lit('<body><a href="https://host0.example/">Home  Page</a>'),
            F.col("body"), F.lit("</body>"),
        ).cast("binary"),
    )
    gated = robots_filter(
        filter_blocklist(crawl, ["host3.example"], url_col="page_url"),
        html_col="page_html",
    )
    # 60 - 15 on host3 - (9 noindex not already on host3: fetched_at%7==0 → 0,7,…,56 is 9 ids, of which 7,35 are host3) = 38
    assert gated.count() == 38, gated.count()
    ta = top_anchor_texts(crawl, k=1, url_col="page_url", html_col="page_html")
    row = ta.collect()
    assert len(row) == 1 and row[0]["dst_domain"] == "host0.example"
    assert row[0]["anchor"] == "home page" and row[0]["n_anchors"] == 60
    print("PASS robots_filter/filter_blocklist/top_anchor_texts with "
          "page_url/page_html columns")

    # --- robots.txt file-level gate (late r4) ------------------------------
    from verde_spark import robots_txt_filter

    robots_dim = spark.createDataFrame(
        [
            ("host1.example", "User-agent: dogbot\nDisallow: /\n"),
            ("host2.example",
             "User-agent: *\nDisallow: /p1*$\nAllow: /p1\n"),
        ],
        "site string, policy string",
    )
    # pages: page_url = https://host{i%4}.example/p{i}; for agent dogbot:
    # host1 fully blocked (15 pages); host2: /p1*$ disallows /p2, /p6 …
    # wait — patterns match from the path start, so /p1*$ hits ONLY the
    # /p1... pages on host2 (p2, p6, ..., p58 are /p2 etc — unaffected),
    # and the shorter Allow /p1 LOSES to the longer /p1*$ on specificity;
    # host2 pages /p10,/p14,... (two-digit starting 1) + /p1 itself drop
    rb_gated = robots_txt_filter(
        pages, robots_dim,
        url_col="page_url", host_col="site", txt_col="policy",
        agent="dogbot",
    )
    kept = [r["page_url"] for r in rb_gated.collect()]
    from verde_spark import reference_robots_allowed

    # cross-check each kept/dropped verdict against the Python reference
    pol = {r["site"]: r["policy"] for r in robots_dim.collect()}
    for r in pages.collect():
        host = r["page_url"].split("/")[2]
        want = reference_robots_allowed(pol.get(host), r["page_url"], "dogbot")
        assert (r["page_url"] in kept) == want, (r["page_url"], want)
    assert any("host1" not in u for u in kept) and all(
        "host1.example" not in u for u in kept
    )
    print("PASS robots_txt_filter with site/policy/page_url columns, "
          "agent-specific full block + wildcard/$ rules")

    # --- sitemap discovery with non-default columns (late r4) --------------
    from verde_spark import (
        reference_robots_crawl_delay,
        reference_robots_sitemaps,
        robots_crawl_delay,
        robots_sitemaps,
        sitemap_urls,
    )

    body = ("User-agent: dogbot\nCrawl-delay: 1.5\nUser-agent: *\n"
            "Crawl-delay: 9\nSitemap: https://host9.example/sm.xml\n")
    disc = spark.createDataFrame([("host9.example", body)],
                                 "site string, policy string")
    row = disc.select(
        robots_crawl_delay("policy", "dogbot").alias("cd"),
        robots_sitemaps("policy").alias("sm"),
    ).collect()[0]
    assert row["cd"] == reference_robots_crawl_delay(body, "dogbot") == 1.5
    assert list(row["sm"]) == reference_robots_sitemaps(body)
    sm_xml = ("<urlset><url><loc>https://host9.example/a&amp;b</loc>"
              "<lastmod>2024-03-04</lastmod></url></urlset>")
    sm_df = spark.createDataFrame([("host9.example", sm_xml)],
                                  "site string, xml_body string")
    got = sitemap_urls(sm_df, xml_col="xml_body").collect()
    assert [(r["site"], r["loc"], r["lastmod"]) for r in got] == [
        ("host9.example", "https://host9.example/a&b", "2024-03-04")
    ]
    print("PASS robots_sitemaps/robots_crawl_delay/sitemap_urls with "
          "site/policy/xml_body columns")

    # --- DSIR importance resampling with non-default columns (late r4) -----
    from verde_spark import dsir_resample, fit_dsir

    tgt = spark.createDataFrame(
        [("the river carved a deep canyon through layered rock",),
         ("careful measurement and clear writing help readers",)],
        "body string",
    )
    raw_rows = [
        (f"p{i}", "the river carved a deep canyon through layered rock")
        for i in range(10)
    ] + [
        (f"j{i}", "click subscribe buy now free shipping cart checkout")
        for i in range(10)
    ]
    raw = spark.createDataFrame(raw_rows, "page_id string, body string")
    model = fit_dsir(tgt, raw, text_col="body", num_buckets=128)
    picked = dsir_resample(
        raw, model, 5, text_col="body", id_col="page_id", seed=11,
        weight_col="iw",
    )
    ids = [r["page_id"] for r in picked.collect()]
    assert len(ids) == 5 and sum(1 for i in ids if i.startswith("p")) >= 4, ids
    assert "iw" in picked.columns
    print("PASS fit_dsir/dsir_resample with page_id/body columns, "
          "target-like pages dominate the sample")

    # --- hashed TF-IDF retrieval with non-default columns (late r4) --------
    from verde_spark import fit_tfidf, tfidf_topk

    tf_model = fit_tfidf(raw, text_col="body", dim=256)
    hits = tfidf_topk(
        raw, "the river carved a deep canyon through layered rock",
        tf_model, k=3, text_col="body", id_col="page_id",
    ).collect()
    assert len(hits) == 3 and all(h["page_id"].startswith("p") for h in hits)
    assert abs(hits[0]["score"] - 1.0) < 1e-12  # exact-match page
    print("PASS fit_tfidf/tfidf_topk with page_id/body columns, "
          "exact-match page scores ~1")

    from verde_spark.functions.text import passes_gopher

    # every body here is short prose; the 50-word floor rejects all of
    # them, a relaxed floor accepts all of them — on the custom column
    n_strict = pages.filter(passes_gopher("body")).count()
    n_loose = pages.filter(
        passes_gopher("body", min_words=5, min_stopword_hits=1,
                      max_symbol_word_ratio=1.0)
    ).count()
    assert n_strict == 0 and n_loose == 60, (n_strict, n_loose)
    print("PASS passes_gopher default + overridden thresholds on custom column")

    from verde_spark.functions.text import c4_filtered_text, passes_c4

    # bodies are one-line prose without terminal punctuation → 0 kept
    # lines under C4; appending a planted 5-sentence block flips them all
    assert pages.filter(passes_c4("body")).count() == 0
    c4pages = pages.withColumn(
        "body2",
        F.concat(
            F.col("body"),
            F.lit("\nOne full sentence lands here. Then a second one follows!"
                  "\nIs a third present? A fourth one too. And a fifth now."),
        ),
    )
    assert c4pages.filter(passes_c4("body2")).count() == 60
    kept = c4pages.select(c4_filtered_text("body2").alias("ft")).first()["ft"]
    assert kept.startswith("One full sentence") and "\n" in kept
    print("PASS passes_c4 gate + c4_filtered_text on custom column")

    from verde_spark.operators.dedup import dedup_minhash

    scored = pages.withColumn("score", (F.col("fetched_at") % 3)).withColumn(
        "pid", F.xxhash64("page_url")
    )
    best = dedup_minhash(scored, id_col="pid", text_col="body", keep_col="score")
    assert best.count() == 60, best.count()  # no near-dups: keep_col drops nothing
    print("PASS dedup_minhash(keep_col=...) with custom id/text/keep columns")

    import tempfile

    from verde_spark import SnapshotStore

    with tempfile.TemporaryDirectory() as tmp:
        store = SnapshotStore(os.path.join(tmp, "corpus"))
        store.append(out)
        store.append(out.limit(5))
        assert store.read(spark).count() == n + 5
        assert store.read(spark, version=1).count() == n
        store.rollback(1)
        assert store.read(spark).count() == n
    print("PASS SnapshotStore append/time-travel/rollback on the cleaned corpus")

    # --- WARC front door with a custom id/text shape ------------------
    from verde_spark.sources.warc import split_warc_records, warc_table_from_documents

    warc_src = pages.select(
        F.xxhash64("page_url").alias("crawl_id"), F.col("body").alias("payload")
    )
    blobs = warc_table_from_documents(
        warc_src, id_col="crawl_id", text_col="payload", files=3
    )
    parsed = split_warc_records(blobs)
    assert parsed.count() == warc_src.count()
    assert parsed.filter(F.col("http_status") != 200).count() == 0
    print("PASS warc synthesize/parse round-trip with custom id/text columns")

    # --- BM25 over a custom text/id column ----------------------------
    from verde_spark.operators.search import bm25_topk

    hits = bm25_topk(
        pages, ["report", "data"], k=5, text_col="body", id_col="page_url"
    )
    assert hits.count() <= 5
    assert set(hits.columns) == {"page_url", "bm25", "rank"}
    print("PASS bm25_topk with custom text/id columns")

    # --- char-LM: train on the corpus itself, score a custom column ---
    from verde_spark.functions.charlm import (
        perplexity_expr,
        train_char_lm,
    )

    lm = train_char_lm(pages, text_col="body")
    ppl = pages.select(perplexity_expr(lm, "body").alias("p"))
    assert ppl.filter(F.col("p").isNull()).count() == 0
    print("PASS train_char_lm/perplexity on a custom text column")

    # --- k-means over a custom vector/id column ------------------------
    from verde_spark.operators.clustering import kmeans_fit

    vecs = pages.select(
        F.xxhash64("page_url").alias("pid"),
        F.transform(
            F.sequence(F.lit(1), F.lit(8)),
            lambda j: (F.pmod(F.xxhash64("page_url", j), F.lit(1000)).cast("double") / 1000.0).cast("float"),
        ).alias("feats"),
    )
    assigned, model = kmeans_fit(vecs, k=4, iterations=2, vec_col="feats", id_col="pid")
    assert assigned.count() == vecs.count()
    assert sum(model.sizes) == vecs.count()
    print("PASS kmeans_fit with custom vector/id columns")

    # --- corpus mixing with custom group/id columns --------------------
    from verde_spark.operators.mixing import repeat_weighted, sample_to_mix

    tagged = pages.withColumn("src", F.when(F.col("fetched_at") % 2 == 0, "web").otherwise("books")).withColumn(
        "pid", F.xxhash64("page_url")
    )
    mixed = sample_to_mix(tagged, "src", {"web": 0.5, "books": 0.3}, total=40, id_col="pid")
    assert mixed.count() <= 32  # 20 + 12 quota ceiling
    rep = repeat_weighted(tagged, "src", {"web": 2.0, "books": 0.5}, id_col="pid")
    n_web = tagged.filter(F.col("src") == "web").count()
    assert rep.filter(F.col("src") == "web").count() == 2 * n_web
    assert "epoch" in rep.columns
    print("PASS sample_to_mix/repeat_weighted with custom group/id columns")

    from verde_spark.operators.mixing import temperature_mix, temperature_targets

    tmixed = temperature_mix(tagged, "src", total=40, alpha=0.3, id_col="pid")
    tshares = temperature_targets(
        {r["src"]: r["n"] for r in tagged.groupBy("src").count().withColumnRenamed("count", "n").collect()},
        alpha=0.3,
    )
    assert abs(sum(tshares.values()) - 1.0) < 1e-12
    assert tmixed.count() <= 40 and tmixed.count() > 0
    print("PASS temperature_mix/temperature_targets with custom group/id columns")

    from verde_spark.operators.bloom import (
        bloom_might_contain, bloom_parameters, build_bloom,
    )
    from verde_spark.operators.dedup import novel_docs, seen_hashes

    m, k = bloom_parameters(tagged.count(), 0.01)
    blm = build_bloom(tagged.select("body"), "body", num_bits=m, num_hashes=k)
    flags = bloom_might_contain(
        tagged.select("pid", "body"), blm, "body",
        num_bits=m, num_hashes=k, result_col="hit",
    )
    assert flags.filter(~F.col("hit")).count() == 0  # no false negatives
    seen_b = seen_hashes(tagged.filter(F.col("pid") % 2 == 0), text_col="body")
    plain_n = novel_docs(tagged, seen_b, text_col="body").count()
    bloom_n = novel_docs(
        tagged, seen_b, text_col="body", bloom_num_bits=8192
    ).count()
    assert plain_n == bloom_n
    print("PASS build_bloom/bloom_might_contain + novel_docs bloom prefilter on custom columns")

    from verde_spark.functions.normalize import (
        normalize_text, normalized_fingerprint, reference_normalize,
    )
    from verde_spark.operators.dedup import dedup_exact

    nd = spark.createDataFrame(
        [(10, "Visit Café 42"), (20, "VISIT  cafe 99"), (30, "other page")],
        "pid long, body string",
    )
    got = {
        r["pid"]: r["n"]
        for r in nd.select("pid", normalize_text("body").alias("n")).collect()
    }
    assert got[10] == reference_normalize("Visit Café 42") == "visit cafe 00"
    assert got[10] == got[20]
    kept = dedup_exact(nd, id_col="pid", text_col="body",
                       key=normalized_fingerprint("body"))
    assert sorted(r["pid"] for r in kept.collect()) == [10, 30]
    cc_norm = clean_corpus(
        pages.limit(200), url_col="page_url", ts_col="fetched_at",
        text_col="body", min_tokens=2, normalize_dedup=True,
    )
    assert cc_norm.count() > 0 and "body" in cc_norm.columns
    print("PASS normalize_text/normalized_fingerprint + clean_corpus(normalize_dedup) on custom columns")

    # --- vocab + encoding with custom text/id columns -------------------
    from verde_spark.functions.vocab import build_vocab, encode_tokens

    voc = build_vocab(pages, text_col="body", size=50)
    enc = encode_tokens(
        pages.withColumn("pid2", F.xxhash64("page_url")),
        voc, text_col="body", id_col="pid2", out_col="ids", method="join",
    )
    enc_map = encode_tokens(pages, voc, text_col="body", out_col="ids", method="map")
    assert enc.count() == enc_map.count() == pages.count()
    assert all(len(r["ids"]) > 0 for r in enc_map.limit(5).collect())
    print("PASS build_vocab/encode_tokens (both engines) on custom columns")

    # --- BPE: train on the custom body column, encode, compress ---------
    from verde_spark.functions.bpe import reference_encode, train_bpe

    bpe = train_bpe(pages, num_merges=20, text_col="body")
    assert len(bpe.merges) > 0
    toks = pages.select(
        "page_url", bpe.encode_expr("body").alias("sub")
    ).limit(5).collect()
    for r in toks:
        body = [x["body"] for x in pages.filter(
            F.col("page_url") == r["page_url"]).collect()][0]
        assert list(r["sub"]) == reference_encode(bpe, body)
    print("PASS train_bpe/encode_expr on custom body column, reference parity")

    # --- CCNet buckets with custom text/lang/id columns ------------------
    from verde_spark.operators.mixing import perplexity_buckets

    tagged = pages.withColumn("tongue", F.lit("en"))
    for mode in ("rank", "threshold"):
        b = perplexity_buckets(
            tagged, text_col="body", lang_col="tongue",
            id_col="page_url", mode=mode, score_col="lp",
        )
        got = b.groupBy("bucket").count().collect()
        assert {r["bucket"] for r in got} <= {1, 2, 3}
        assert b.filter(F.col("bucket_name").isNull()).count() == 0
    print("PASS perplexity_buckets both modes with body/tongue/page_url columns")

    # --- frontier scheduling with priorities + robots delays -------------
    from verde_spark.operators.crawl import crawl_schedule

    frontier = pages.select(
        F.col("page_url").alias("url"),
        (F.length("body") % 4).cast("double").alias("rank_hint"),
    )
    delays = spark.createDataFrame(
        [("a.example", 2.5)], "host string, crawl_delay double"
    )
    sched = crawl_schedule(
        frontier, delays, priority_col="rank_hint",
        default_delay=0.5, max_per_host=7,
    )
    rows_s = sched.collect()
    assert all(r["fetch_seq"] <= 7 for r in rows_s)
    assert all(r["eta_sec"] >= 0.0 for r in rows_s)
    print("PASS crawl_schedule with priority column, delay dim and cap")

    # --- incremental ingestion: snapshot -> novel_docs -> clean_corpus ---
    from verde_spark.operators.dedup import novel_docs, seen_hashes

    first_half = pages.filter(F.xxhash64("page_url") % 2 == 0)
    seen = seen_hashes(first_half, text_col="body")
    novel = novel_docs(pages, seen, text_col="body")
    assert novel.count() == pages.count() - first_half.count()
    inc = clean_corpus(
        pages, url_col="page_url", ts_col="fetched_at", text_col="body",
        min_tokens=3, novel_against=seen,
    )
    assert 0 < inc.count() <= novel.count()
    print("PASS seen_hashes/novel_docs + clean_corpus(novel_against=) "
          "with custom columns")

    # --- quality classifier trained + gating on the custom body column --
    from verde_spark.operators.quality import (
        fit_quality_classifier,
        reference_quality_score,
    )

    # length % 2 splits this corpus 49/11 (1-digit vs 2-digit page ids
    # shift the body length by 3); % 3 would put ALL pages in one class
    curated = pages.filter(F.length("body") % 2 != 0)
    crawlish = pages.filter(F.length("body") % 2 == 0)
    clf = fit_quality_classifier(
        curated, crawlish, text_col="body", num_buckets=64, iterations=5
    )
    scored = pages.select(
        "page_url", clf.score_expr("body").alias("s")
    ).limit(5).collect()
    for r in scored:
        body = [x["body"] for x in pages.filter(
            F.col("page_url") == r["page_url"]).collect()][0]
        assert r["s"] == reference_quality_score(clf, body)
    gated = clean_corpus(
        pages, url_col="page_url", ts_col="fetched_at", text_col="body",
        min_tokens=3, classifier=clf, min_classifier_score=-1e9,
    )
    assert gated.count() > 0
    print("PASS fit_quality_classifier/score_expr + clean_corpus(classifier=) "
          "on custom body column")

    # --- SemDeDup on a custom vector/id column pair ----------------------
    from verde_spark.operators.dedup import semantic_dedup, semantic_dup_pairs

    vecs = pages.select(
        F.col("page_url").alias("item"),
        F.array(
            (F.length("body") % 7).cast("double"),
            (F.length("body") % 11).cast("double"),
            (F.xxhash64("page_url") % 5).cast("double"),
        ).alias("feat"),
    ).filter(F.aggregate("feat", F.lit(0.0), lambda a, v: a + v * v) > 0)
    cents = [[float(i), float(i), 0.0] for i in range(1, 4)]
    sd_pairs = semantic_dup_pairs(
        vecs, cents, threshold=0.98, id_col="item", vec_col="feat"
    )
    assert sd_pairs.count() >= 0  # pairs accept string ids (no components)
    nvecs = vecs.withColumn("iid", F.xxhash64("item")).drop("item")
    sd = semantic_dedup(
        nvecs, cents, threshold=0.9999, id_col="iid", vec_col="feat",
        keep="edge",
    )
    assert 0 < sd.count() <= nvecs.count()
    assert set(sd.columns) == {"iid", "feat"}
    print("PASS semantic_dup_pairs (string ids) / semantic_dedup "
          "with iid/feat columns")

    # --- exact AUC of the trained classifier on held-in labels ----------
    from verde_spark.operators.quality import reference_roc_auc, roc_auc

    labeled = pages.select(
        clf.score_expr("body").alias("lr"),
        (F.length("body") % 2 != 0).cast("int").alias("is_curated"),
    )
    auc = roc_auc(labeled, score_col="lr", label_col="is_curated")
    local = labeled.collect()
    want = reference_roc_auc(
        [r["lr"] for r in local], [r["is_curated"] for r in local]
    )
    assert auc == want and 0.0 <= auc <= 1.0
    print("PASS roc_auc on lr/is_curated columns, exact vs O(n^2) reference")

    spark.stop()
    print("DOGFOOD r4: ALL PASS")
    return 0


if __name__ == "__main__":
    raise SystemExit(main())
