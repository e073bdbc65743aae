"""Benchmark decontamination — drop corpus documents that share word
n-grams with an evaluation/benchmark set (the C4 / GPT-3-style 13-gram
rule).

A training corpus must not contain the benchmarks it will be evaluated
on.  The standard rule: tokenize both sides, hash every ``n``-word gram,
and drop any training document that shares at least ``min_overlap``
grams with the benchmark set.  (The reference engine has no text layer;
this operator is part of the repo's web-scale front door, alongside
``clean_corpus``/``dedup_*``.)

100 TB shape — the benchmark side is SMALL by contract (an eval suite is
thousands of documents, not billions), so the whole pass costs the
corpus essentially one projection:

1. benchmark → distinct gram hashes (tiny: one agg on the small side),
2. corpus → ``shingles`` projection → ``explode`` (zero shuffle —
   projection + generate over the scan),
3. inner join against the **broadcast** benchmark gram set (zero
   shuffle),
4. per-doc overlap counts: one map-side-combinable ``groupBy(id)`` whose
   input is only the *matching* gram rows (≈ contaminated docs × their
   overlaps — tiny relative to the corpus),
5. ``decontaminate`` then anti-joins the corpus against the contaminated
   id set; that set is small, so AQE plans a broadcast anti join.

Gram identity: ``shingles`` (functions/text.py) — xxhash64 of the
lowercase whitespace-tokenized ``n``-word window, single-pass
arrays_zip construction.  The driver oracle replays the SAME selection
with RAW STRING grams in DuckDB (xxhash64 has no DuckDB twin): both
engines answer "which documents overlap the benchmark", so they agree
bit-for-bit unless xxhash64 collides across the gram universe
(~2⁻⁶⁴ · |grams|² — negligible), the same contract as ``minhash_pairs``.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from ..functions.text import shingles

#: the C4/GPT-3 rule: 13-word grams, one shared gram contaminates.
DEFAULT_NGRAM = 13


def benchmark_ngrams(
    benchmark: DataFrame, text_col: str = "text", n: int = DEFAULT_NGRAM
) -> DataFrame:
    """Distinct gram-hash table ``(gram)`` of the benchmark set — the
    (small) broadcast side of the decontamination join."""
    return (
        benchmark.select(
            F.explode(shingles(F.col(text_col), n=n)).alias("gram")
        )
        .distinct()
    )


def contamination_stats(
    corpus: DataFrame,
    benchmark: DataFrame,
    id_col: str = "doc_id",
    text_col: str = "text",
    n: int = DEFAULT_NGRAM,
) -> DataFrame:
    """Per-document overlap with the benchmark:
    ``(id, n_grams, n_contaminated, contamination)`` for EVERY corpus
    document (zero-overlap docs report 0 / 0.0).

    ``n_grams`` counts the document's DISTINCT grams; ``n_contaminated``
    counts how many of those occur anywhere in the benchmark;
    ``contamination`` is their ratio (0.0 for docs shorter than *n*
    words).  Physical plan — ONE corpus scan, ONE shuffle:
    projection → ``explode_outer`` (zero-gram docs keep a null row) →
    broadcast LEFT join against the benchmark gram set (a hit flag) →
    map-side-combined ``groupBy(id)`` whose shuffle volume is one partial
    row per doc per partition, never the gram stream itself.
    """
    # NULL text → NULL shingles (the pinned no-candidacy contract); for
    # STATS a null doc simply has zero grams
    grams = F.coalesce(
        F.array_distinct(shingles(F.col(text_col), n=n)),
        F.array().cast("array<bigint>"),
    )
    docs = corpus.select(
        F.col(id_col).alias("id"), grams.alias("grams")
    ).select("id", F.size("grams").alias("n_grams"), "grams")
    bench = benchmark_ngrams(benchmark, text_col=text_col, n=n).withColumn(
        "__hit", F.lit(1)
    )
    exploded = docs.select(
        "id", "n_grams", F.explode_outer("grams").alias("gram")
    )
    return (
        exploded.join(F.broadcast(bench), "gram", "left")
        .groupBy("id", "n_grams")
        .agg(
            F.sum(F.coalesce(F.col("__hit"), F.lit(0)))
            .cast("bigint")
            .alias("n_contaminated")
        )
        .select(
            F.col("id").alias(id_col),
            "n_grams",
            "n_contaminated",
            F.when(
                F.col("n_grams") > 0,
                F.col("n_contaminated") / F.col("n_grams"),
            )
            .otherwise(F.lit(0.0))
            .alias("contamination"),
        )
    )


def contaminated_ids(
    corpus: DataFrame,
    benchmark: DataFrame,
    id_col: str = "doc_id",
    text_col: str = "text",
    n: int = DEFAULT_NGRAM,
    min_overlap: int = 1,
) -> DataFrame:
    """Ids of corpus documents sharing ≥ *min_overlap* distinct grams
    with the benchmark — the drop set."""
    if min_overlap < 1:
        raise ValueError(f"min_overlap must be ≥ 1, got {min_overlap!r}")
    bench = benchmark_ngrams(benchmark, text_col=text_col, n=n)
    exploded = corpus.select(
        F.col(id_col),
        F.explode(F.array_distinct(shingles(F.col(text_col), n=n))).alias(
            "gram"
        ),
    )
    hits = exploded.join(F.broadcast(bench), "gram")
    if min_overlap == 1:
        return hits.select(id_col).distinct()
    return (
        hits.groupBy(id_col)
        .agg(F.count(F.lit(1)).alias("__n"))
        .filter(F.col("__n") >= min_overlap)
        .select(id_col)
    )


def contamination_filter(
    benchmark: DataFrame,
    text_col: str = "text",
    n: int = DEFAULT_NGRAM,
    max_grams: int = 200_000,
):
    """Boolean Column — TRUE when a row's text shares an ``n``-word gram
    with *benchmark*.  The benchmark gram set is COLLECTED into a single
    array literal (one Literal node, not N), so the result is a pure
    stateless projection: usable in Structured Streaming micro-batches
    (where :func:`decontaminate`'s join/agg shape would need stateful
    operators) and in batch filters alike.  Guarded by *max_grams* —
    an eval suite is thousands of documents; if the "benchmark" is
    bigger than that, use :func:`decontaminate`.
    """
    rows = benchmark_ngrams(benchmark, text_col=text_col, n=n).collect()
    if len(rows) > max_grams:
        raise ValueError(
            f"benchmark has {len(rows)} distinct grams > max_grams="
            f"{max_grams}; use decontaminate() (broadcast join) instead"
        )
    if not rows:
        return F.lit(False)
    grams = F.coalesce(
        F.array_distinct(shingles(F.col(text_col), n=n)),
        F.array().cast("array<bigint>"),
    )
    return F.arrays_overlap(grams, F.lit([r["gram"] for r in rows]))


def decontaminate(
    corpus: DataFrame,
    benchmark: DataFrame,
    id_col: str = "doc_id",
    text_col: str = "text",
    n: int = DEFAULT_NGRAM,
    min_overlap: int = 1,
) -> DataFrame:
    """*corpus* minus every document contaminated by *benchmark* (shares
    ≥ *min_overlap* distinct word ``n``-grams).  The contaminated-id set
    is small (eval suites leak into a corpus at per-mille rates), so the
    final anti join broadcasts under AQE; the corpus itself is never
    shuffled."""
    drop = contaminated_ids(
        corpus,
        benchmark,
        id_col=id_col,
        text_col=text_col,
        n=n,
        min_overlap=min_overlap,
    )
    return corpus.join(drop, id_col, "left_anti")
