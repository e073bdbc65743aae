"""Character-bigram language-model perplexity — the CCNet-style quality
signal: score each document's text under a reference language model; high
perplexity = noisy / non-prose / wrong-language text.

Public technique (CCNet, Wenzek et al. 2020 score CC text with a reference
LM trained on clean text; KenLM at word level — here a 27-symbol character
bigram LM with add-one smoothing, which needs no external model file).

Two halves, both shuffle-light:

* **Training** (:func:`charlm_counts`): bigram counts over a corpus as ONE
  ``explode → groupBy(gram)`` aggregate.  The gram alphabet is 27 symbols
  (space + a-z; everything else normalized to space), so the shuffle after
  map-side partial aggregation carries at most 729 rows per partition —
  effectively free at any corpus size.  Counts are integers → exactly
  reproducible at any parallelism and by any twin engine.
* **Scoring** (:func:`logprob_expr` / :func:`perplexity_expr`): a pure
  Catalyst projection — gram ids via ``transform(sequence(...))``, then a
  SERIAL left-fold (``aggregate``) adding log-probability literals in
  document order.  The fold order is fixed, the literals are Python-
  computed float64 — so a twin engine replaying the same fold reproduces
  the score BIT-FOR-BIT (no ``ln``/``exp`` is evaluated inside either
  engine).  :func:`charlm_logprob_udf` is the Arrow fast path for hot
  pipelines (vectorized bincount·logp dot; same model, ulp-level diffs
  from summation order only).

``ENGLISH_LM`` is a fixed reference model trained at import time on a
small embedded English seed text (original prose written for this repo) —
the CCNet shape: train on clean text, score the crawl.  Because it is a
code constant, driver oracle SQL can embed the identical literals.
"""

from __future__ import annotations

import math
from dataclasses import dataclass

import numpy as np
import pandas as pd
from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

__all__ = [
    "CharLM",
    "ENGLISH_LM",
    "charlm_counts",
    "charlm_counts_sql",
    "train_char_lm",
    "gram_ids_expr",
    "logprob_expr",
    "avg_logprob_expr",
    "perplexity_expr",
    "charlm_norm_sql",
    "charlm_logprob_sql",
    "charlm_logprob_udf",
    "reference_logprob",
]

#: 27-symbol alphabet: index 0 = space, 1..26 = a..z
ALPHABET = 27
N_GRAMS = ALPHABET * ALPHABET

# Original English seed prose (written for this repository — deterministic,
# no external data).  ~2.4 kB is plenty for a 729-cell bigram table.
_SEED_TEXT = (
    "the quick brown fox jumps over the lazy dog while the old river keeps "
    "moving toward the open sea and the morning light settles on the water "
    "people gather in the market to trade bread and fruit and stories about "
    "the weather and the roads and the small changes in their lives every "
    "sentence in a living language carries familiar pairs of letters that "
    "repeat with steady rhythm the vowels follow the consonants and common "
    "words return again and again a model that counts these pairs learns "
    "the shape of ordinary prose and can tell it apart from random noise "
    "or tables of numbers or markup left over from a careless extraction "
    "when the text is clean the surprise per letter stays low and when the "
    "text is broken the surprise climbs quickly this simple idea scales to "
    "any corpus because counting pairs is one pass over the data and the "
    "table of counts stays tiny no matter how large the corpus grows the "
    "reader should note that training on clean text and scoring the crawl "
    "is the standard recipe for quality filtering in public pipelines and "
    "that a character model needs no dictionary and no tokenizer it works "
    "for long words and short ones for names and for numbers written out "
    "as words the score is the average log probability per pair of letters "
    "and a document with very few letters gets no score at all rather than "
    "a misleading one"
)


def _normalize(s: str) -> str:
    return "".join(
        c if "a" <= c <= "z" else " " for c in (s or "").lower()
    )


def _gram_ids(s: str) -> list[int]:
    t = _normalize(s)
    ids = [max(ord(c) - 96, 0) for c in t]
    return [a * ALPHABET + b for a, b in zip(ids, ids[1:])]


@dataclass(frozen=True)
class CharLM:
    """Bigram log-probability table: ``logp[g]`` for gram id ``g`` =
    ``first*27 + second``; add-one smoothed.  ``logp`` entries are Python
    ``math.log`` float64 — engine-neutral literals."""

    logp: tuple  # length 729, float

    @staticmethod
    def from_counts(counts: dict[int, int]) -> "CharLM":
        ctx = [0] * ALPHABET
        for g, c in counts.items():
            ctx[g // ALPHABET] += c
        logp = [
            math.log(
                (counts.get(g, 0) + 1.0) / (ctx[g // ALPHABET] + ALPHABET)
            )
            for g in range(N_GRAMS)
        ]
        return CharLM(logp=tuple(logp))

    def as_array(self) -> np.ndarray:
        return np.asarray(self.logp, dtype="float64")


def _train_on_text(text: str) -> CharLM:
    counts: dict[int, int] = {}
    for g in _gram_ids(text):
        counts[g] = counts.get(g, 0) + 1
    return CharLM.from_counts(counts)


#: the fixed reference model (CCNet shape: clean-text LM scores the crawl)
ENGLISH_LM = _train_on_text(_SEED_TEXT)


def gram_ids_expr(text: Column | str = "text") -> Column:
    """Catalyst bigram-id array: normalize → per-char ids → pair ids.

    Let-bound via a subexpression-safe construction: the normalized string
    is computed once per row (``transform`` closes over one column), and
    each gram touches two O(1) ``substring`` calls.
    """
    col = F.col(text) if isinstance(text, str) else text
    s = F.regexp_replace(F.lower(col), "[^a-z]", " ")
    # Let-bind a per-char symbol-id array FIRST (split + ascii is O(L);
    # substr(s, i, 1) per gram would be O(L²) — the CollapseProject /
    # UTF8String trap documented at functions/text.kgram_hashes).
    ids = F.transform(
        F.split(s, ""),
        lambda c: F.greatest(F.ascii(c) - F.lit(96), F.lit(0)).cast("int"),
    )

    def pairs(v: Column) -> Column:
        n = F.size(v) - F.lit(1)
        return F.when(
            n >= 1,
            F.transform(
                F.sequence(F.lit(1), n),
                lambda i: (
                    F.element_at(v, i) * F.lit(ALPHABET)
                    + F.element_at(v, i + F.lit(1))
                ).cast("int"),
            ),
        ).otherwise(F.array().cast("array<int>"))

    # element_at(transform(array(x), f), 1) = let x in f(x): evaluate the
    # id array once, not once per reference
    return F.element_at(F.transform(F.array(ids), pairs), 1)


def charlm_counts(
    df: DataFrame, text_col: str = "text"
) -> DataFrame:
    """Distributed bigram counts → ``(gram int, count long)``.

    ONE explode + groupBy: rows in flight equal total characters, but the
    map-side partial aggregate collapses each task's output to ≤729 rows
    before the shuffle — the exchange is constant-size regardless of
    corpus size.  At 100 TB you would train on a sampled fraction
    (``df.sample``) — the operator composes with any upstream filter.
    """
    return (
        df.select(F.explode(gram_ids_expr(text_col)).alias("gram"))
        .groupBy("gram")
        .agg(F.count(F.lit(1)).cast("long").alias("count"))
    )


def charlm_counts_sql(col: str = "text", table: str = "documents") -> str:
    """DuckDB twin of :func:`charlm_counts` (integer-exact)."""
    return f"""
        WITH s AS (
          SELECT regexp_replace(lower({col}), '[^a-z]', ' ', 'g') AS t
          FROM {table}
        ),
        g AS (
          SELECT unnest(list_transform(range(1, length(t)), i ->
              greatest(ascii(t[i]) - 96, 0) * {ALPHABET}
            + greatest(ascii(t[i+1]) - 96, 0))) AS gram
          FROM s WHERE length(t) >= 2
        )
        SELECT CAST(gram AS int) AS gram, CAST(count(*) AS bigint) AS count
        FROM g GROUP BY gram
    """


def train_char_lm(df: DataFrame, text_col: str = "text") -> CharLM:
    """Train on a corpus: distributed counts → driver-side 729-entry table
    (the collect is the documented tiny side — ≤729 rows at any scale)."""
    rows = charlm_counts(df, text_col).collect()
    return CharLM.from_counts({int(r["gram"]): int(r["count"]) for r in rows})


def logprob_expr(
    lm: CharLM, text_col: Column | str = "text"
) -> Column:
    """Total log-probability of a document under *lm* — NULL when the
    text has fewer than 2 alphabet characters (no grams).

    Serial left-fold over the gram array adding literal float64 values in
    document order: bit-reproducible by any engine replaying the order.
    """
    grams = gram_ids_expr(text_col)
    table = F.array(*[F.lit(float(v)) for v in lm.logp])

    def fold(g: Column) -> Column:
        return F.when(
            F.size(g) > 0,
            F.aggregate(
                g,
                F.lit(0.0),
                lambda acc, gid: acc + F.element_at(table, gid + F.lit(1)),
            ),
        ).otherwise(F.lit(None).cast("double"))

    # let-bind the gram array (referenced by both the guard and the fold)
    return F.element_at(F.transform(F.array(grams), fold), 1)


def avg_logprob_expr(lm: CharLM, text_col: Column | str = "text") -> Column:
    """``logprob / n_grams`` in ONE let-bound projection — the gram
    array is computed once and feeds both the fold and the size (two
    independent ``gram_ids_expr`` trees would normalize + split +
    per-char transform every document twice; interpreted Catalyst has
    no CSE).  NULL when the text has no grams.  Same fold order and one
    IEEE division → bit-identical to ``logprob_expr(...) / n_grams``.
    """
    grams = gram_ids_expr(text_col)
    table = F.array(*[F.lit(float(v)) for v in lm.logp])

    def avg(g: Column) -> Column:
        lp = F.aggregate(
            g,
            F.lit(0.0),
            lambda acc, gid: acc + F.element_at(table, gid + F.lit(1)),
        )
        return F.when(
            F.size(g) > 0, lp / F.size(g).cast("double")
        ).otherwise(F.lit(None).cast("double"))

    return F.element_at(F.transform(F.array(grams), avg), 1)


def perplexity_expr(lm: CharLM, text_col: Column | str = "text") -> Column:
    """``exp(-logprob / n_grams)`` — the conventional perplexity form.
    (For cross-engine value oracles prefer the rounded avg-logprob:
    ``exp`` evaluates inside the engine and can differ in the last ulp.)
    """
    grams = gram_ids_expr(text_col)
    table = F.array(*[F.lit(float(v)) for v in lm.logp])

    def pp(g: Column) -> Column:
        lp = F.aggregate(
            g,
            F.lit(0.0),
            lambda acc, gid: acc + F.element_at(table, gid + F.lit(1)),
        )
        return F.when(
            F.size(g) > 0, F.exp(-lp / F.size(g).cast("double"))
        ).otherwise(F.lit(None).cast("double"))

    return F.element_at(F.transform(F.array(grams), pp), 1)


def charlm_norm_sql(col: str) -> str:
    """DuckDB twin of the alphabet normalization (lower, non-a-z → space)."""
    return f"regexp_replace(lower({col}), '[^a-z]', ' ', 'g')"


def charlm_logprob_sql(lm: CharLM, t_col: str = "t") -> str:
    """DuckDB twin of :func:`logprob_expr` over an ALREADY-normalized
    column *t_col* (see :func:`charlm_norm_sql` — normalize once in an
    enclosing CTE).  Identical float64 literals, identical serial
    left-fold order (init 0.0 prepended) → bit-identical result.

    Literals are emitted as QUOTED strings cast to DOUBLE: DuckDB parses
    bare decimal literals as DECIMAL first, and the DECIMAL→DOUBLE hop
    mis-rounds ~10% of shortest-repr float64 values by one ulp (measured);
    the VARCHAR→DOUBLE path is a correct strtod round-trip."""
    lits = ", ".join(f"'{float(v)!r}'" for v in lm.logp)
    grams = (
        f"list_transform(range(1, length({t_col})), i -> "
        f"greatest(ascii({t_col}[i]) - 96, 0) * {ALPHABET}"
        f" + greatest(ascii({t_col}[i+1]) - 96, 0))"
    )
    return (
        f"CASE WHEN length({t_col}) >= 2 THEN "
        f"list_reduce(list_prepend(CAST(0.0 AS DOUBLE), list_transform({grams}, "
        f"g -> ([{lits}]::DOUBLE[])[g + 1])), (a, b) -> a + b) "
        f"ELSE NULL END"
    )


def charlm_logprob_udf(lm: CharLM, text_col: str = "text") -> Column:
    """Arrow fast path: vectorized gram histogram · logp dot per doc.

    ~constant work per character with NumPy; summation order differs from
    the serial fold (ulp-level) — use for hot pipelines, use
    :func:`logprob_expr` where bit-reproducibility matters.
    """
    from pyspark.sql.functions import pandas_udf

    logp = lm.as_array()

    @pandas_udf("double")
    def score(texts: pd.Series) -> pd.Series:
        out = np.full(len(texts), np.nan)
        for i, s in enumerate(texts):
            ids = _gram_ids(s if s is not None else "")
            if ids:
                hist = np.bincount(np.asarray(ids), minlength=N_GRAMS)
                out[i] = float(hist @ logp)
        return pd.Series(out)

    return score(F.col(text_col) if isinstance(text_col, str) else text_col)


def reference_logprob(lm: CharLM, s: str | None) -> float | None:
    """Pure-Python reference scorer (serial fold in document order —
    bit-identical to :func:`logprob_expr`)."""
    ids = _gram_ids(s or "")
    if not ids:
        return None
    acc = 0.0
    for g in ids:
        acc = acc + lm.logp[g]
    return acc
