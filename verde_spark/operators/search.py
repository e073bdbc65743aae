"""BM25 keyword search over the documents table — full-text relevance
ranking without an inverted index.

At 100 TB an inverted index is a product of its own; what a training-data
pipeline actually needs is *batch* relevance scoring: "rank every document
against this query" for corpus slicing, eval-set mining, and targeted
sampling.  That is two scans and zero wide shuffles:

1. **Stats pass** — ONE map-side-combinable aggregate over the scan:
   ``N`` (docs), ``sum(dl)`` (total tokens) and per-term document
   frequencies as ``sum(case tf>0)`` columns folded into the same agg.
   The result is a single row — collected (documented tiny side) and
   turned into float64 literals.
2. **Score pass** — ONE whole-stage-codegen projection over the scan
   (tokenize → per-term tf → Okapi BM25 sum with literal idf), then
   ``TakeOrderedAndProject`` for top-k.  No joins, no Python.

Okapi BM25 (public formula, Robertson & Spärck Jones):
``score = Σ_t idf_t · tf·(k1+1) / (tf + k1·(1 − b + b·dl/avgdl))`` with
``idf = ln((N − df + 0.5)/(df + 0.5) + 1)``.

Tokenization is the engine-portable ``lower → split [^a-z0-9]+`` so the
DuckDB twin (:func:`bm25_sql`) is bit-comparable after fixed rounding.
"""

from __future__ import annotations

import math
import re
from functools import reduce

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F
from pyspark.sql.window import Window

__all__ = ["tokens_expr", "bm25_scores", "bm25_topk", "bm25_sql"]


def _normalize_terms(terms: list[str]) -> list[str]:
    """Lowercase query terms and require each to be a single token of the
    corpus tokenizer's alphabet.  A term the tokenizer could never emit
    ("The" before lowercasing, "don't" with punctuation) would otherwise
    SILENTLY score 0 in every document — and raw interpolation of such a
    term into the DuckDB twin would break/inject the generated SQL."""
    out = []
    for t in terms:
        nt = (t or "").lower()
        if not re.fullmatch(r"[a-z0-9]+", nt):
            raise ValueError(
                f"query term {t!r} is not a single [a-z0-9]+ token after "
                "lowercasing; pass tokenizer-normalized terms (split "
                "punctuated words the way tokens_expr would, e.g. "
                "\"don't\" -> ['don', 't'])"
            )
        out.append(nt)
    return out


def tokens_expr(text: Column | str = "text") -> Column:
    """Portable tokens: lowercase, split on non-alphanumeric, drop empties."""
    col = F.col(text) if isinstance(text, str) else text
    return F.filter(F.split(F.lower(col), "[^a-z0-9]+"), lambda x: x != F.lit(""))


def _tf(tokens: Column, term: str) -> Column:
    return F.size(F.filter(tokens, lambda x: x == F.lit(term)))


def bm25_scores(
    docs: DataFrame,
    terms: list[str],
    *,
    k1: float = 1.2,
    b: float = 0.75,
    text_col: str = "text",
    id_col: str = "doc_id",
) -> DataFrame:
    """Per-document BM25 score against *terms* → ``(id_col, bm25 double)``.

    Two jobs: a 1-row stats aggregate (collected — the documented tiny
    side), then a single codegen projection.  ``terms`` order fixes the
    float summation order (serial left-fold), so a twin engine replaying
    the same order reproduces the score bit-for-bit modulo ``ln`` ulps.
    """
    if not terms:
        raise ValueError("terms must be non-empty")
    terms = _normalize_terms(terms)
    toks = tokens_expr(text_col)
    stats_row = docs.agg(
        F.count(F.lit(1)).alias("n"),
        F.sum(F.size(toks)).alias("sum_dl"),
        *[
            F.sum((_tf(toks, t) > 0).cast("long")).alias(f"df_{i}")
            for i, t in enumerate(terms)
        ],
    ).collect()[0]
    n = int(stats_row["n"])
    if n == 0:
        raise ValueError("empty corpus")
    avgdl = float(stats_row["sum_dl"] or 0) / float(n)
    idf = [
        math.log(
            (float(n) - float(stats_row[f"df_{i}"]) + 0.5)
            / (float(stats_row[f"df_{i}"]) + 0.5)
            + 1.0
        )
        for i in range(len(terms))
    ]

    dl = F.size(toks).cast("double")
    norm = F.lit(k1) * (
        F.lit(1.0 - b) + F.lit(b) * dl / F.lit(avgdl if avgdl else 1.0)
    )

    def term_score(i: int, t: str) -> Column:
        tf = _tf(toks, t).cast("double")
        return F.lit(idf[i]) * (tf * F.lit(k1 + 1.0)) / (tf + norm)

    score = reduce(
        lambda a, c: a + c, (term_score(i, t) for i, t in enumerate(terms))
    )
    return docs.select(F.col(id_col), score.alias("bm25"))


def bm25_topk(
    docs: DataFrame,
    terms: list[str],
    k: int = 10,
    *,
    k1: float = 1.2,
    b: float = 0.75,
    text_col: str = "text",
    id_col: str = "doc_id",
    round_digits: int = 6,
) -> DataFrame:
    """Top-*k* documents by BM25 → ``(id_col, bm25, rank)``.

    Ordering key is the ROUNDED score (desc) with ``id_col`` tiebreak so
    the ranking is reproducible across engines and summation ulps; the
    plan is TakeOrderedAndProject — no global sort materializes.
    """
    scored = bm25_scores(
        docs, terms, k1=k1, b=b, text_col=text_col, id_col=id_col
    ).select(
        id_col, (F.round(F.col("bm25"), round_digits) + F.lit(0.0)).alias("bm25")
    )
    w = [F.col("bm25").desc(), F.col(id_col).asc()]
    return (
        scored.orderBy(*w)
        .limit(k)
        .select(
            id_col,
            "bm25",
            F.row_number().over(Window.orderBy(*w)).cast("long").alias("rank"),
        )
    )


def bm25_sql(
    terms: list[str],
    k: int = 10,
    *,
    k1: float = 1.2,
    b: float = 0.75,
    text_col: str = "text",
    id_col: str = "doc_id",
    table: str = "documents",
    round_digits: int = 6,
) -> str:
    """DuckDB twin of :func:`bm25_topk` — same tokenizer, same literal
    fold order, same rounded ordering key.  Terms are validated through
    the same normalization as :func:`bm25_scores`, which also means the
    interpolated literals can never contain a quote."""
    terms = _normalize_terms(terms)
    toks = (
        f"list_filter(string_split_regex(lower({text_col}), '[^a-z0-9]+'),"
        f" x -> x <> '')"
    )
    tf = lambda t: f"len(list_filter(toks, x -> x = '{t}'))"  # noqa: E731
    dfs = ",\n      ".join(
        f"sum(CASE WHEN {tf(t)} > 0 THEN 1 ELSE 0 END) AS df_{i}"
        for i, t in enumerate(terms)
    )
    idf = lambda i: (  # noqa: E731
        f"ln((CAST(n AS double) - CAST(df_{i} AS double) + 0.5)"
        f" / (CAST(df_{i} AS double) + 0.5) + 1.0)"
    )
    norm = (
        f"{k1!r} * ({1.0 - b!r} + {b!r} * CAST(len(toks) AS double)"
        f" / (CAST(sum_dl AS double) / CAST(n AS double)))"
    )
    score = " + ".join(
        f"({idf(i)} * (CAST({tf(t)} AS double) * {k1 + 1.0!r})"
        f" / (CAST({tf(t)} AS double) + {norm}))"
        for i, t in enumerate(terms)
    )
    return f"""
        WITH tok AS (
          SELECT {id_col}, {toks} AS toks FROM {table}
        ),
        stats AS (
          SELECT count(*) AS n, sum(len(toks)) AS sum_dl,
      {dfs}
          FROM tok
        ),
        scored AS (
          SELECT {id_col},
                 round({score}, {round_digits}) + 0.0 AS bm25
          FROM tok, stats
        )
        SELECT {id_col}, bm25,
               CAST(row_number() OVER (ORDER BY bm25 DESC, {id_col}) AS bigint)
                 AS rank
        FROM scored
        ORDER BY bm25 DESC, {id_col}
        LIMIT {k}
    """
