"""Word-bigram language model with stupid backoff — the CCNet-fidelity
upgrade of :mod:`verde_spark.functions.charlm`.

The CCNet recipe (Wenzek et al. 2020) filters Common Crawl on the
perplexity of a WORD-level n-gram LM (KenLM 5-gram) trained on clean
text; the char-bigram LM in ``charlm`` is the dependency-free stand-in.
This module closes the fidelity gap with a word-order-2 model and
"stupid backoff" (Brants et al. 2007 — the web-scale smoothing that
needs no discounting pass): for adjacent word ids ``(a, b)``::

    score(b | a) = log(count(a,b) / ctx(a))        if count(a,b) > 0
                 = log(0.4) + unigram_logp(b)      otherwise

Everything follows the charlm engine discipline:

* **Training** (:func:`train_word_lm`): bounded-key aggregates only.
  The vocabulary is a top-V token count (ONE explode → groupBy with
  map-side partial aggregation; V rows cross the wire), then unigram /
  bigram id counts are two more bounded aggregates (≤ V+1 and ≤ observed
  distinct bigrams ≤ V² rows — with the default V=1024 the exchange
  stays tiny at any corpus size; at 100 TB train on ``df.sample`` as
  CCNet does).  Counts are integers → exactly reproducible at any
  parallelism and by any twin engine.
* **Scoring** (:func:`word_logprob_expr`): a pure Catalyst projection —
  words → ids via a LITERAL map, adjacent-pair keys, then a SERIAL
  left-fold adding Python-computed float64 literals (observed-bigram
  map lookup, else the per-word backoff literal).  No ``ln``/``exp``
  evaluates inside any engine, so DuckDB (:func:`word_logprob_sql`) and
  the Python twin (:func:`reference_word_logprob`) reproduce the score
  BIT-FOR-BIT.  Zero shuffle; the plan rides the scan.

``ENGLISH_WORD_LM`` is trained at import time on the same embedded
original seed prose as ``charlm.ENGLISH_LM`` — a code constant, so
driver oracle SQL can embed identical literals.

Reference shape (not code): verde has no text layer; the quality-
filtering recipe follows the public CCNet paper.
"""

from __future__ import annotations

import math
from dataclasses import dataclass

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

from .charlm import _SEED_TEXT

__all__ = [
    "WordLM",
    "ENGLISH_WORD_LM",
    "ALPHA",
    "train_word_lm",
    "words_expr",
    "word_gram_keys_expr",
    "word_logprob_expr",
    "word_avg_logprob_expr",
    "word_logprob_udf",
    "word_bigram_counts",
    "word_bigram_counts_sql",
    "word_norm_sql",
    "word_logprob_sql",
    "reference_word_ids",
    "reference_word_logprob",
]

#: stupid-backoff factor (Brants et al. 2007 use 0.4)
ALPHA = 0.4
_LOG_ALPHA = math.log(ALPHA)


def _normalize(s: str) -> str:
    return "".join(c if "a" <= c <= "z" else " " for c in (s or "").lower())


def _words(s: str) -> list[str]:
    return [w for w in _normalize(s).split(" ") if w]


@dataclass(frozen=True)
class WordLM:
    """Word-bigram stupid-backoff model.

    ``vocab[i]`` has id ``i+1``; id 0 is ``<unk>`` (out-of-vocabulary).
    ``uni_logp[id]`` is the add-one-smoothed unigram log-probability
    (length ``V+1``).  ``bi_logp`` holds only OBSERVED bigrams, keyed
    ``a*(V+1)+b`` → ``log(count(a,b)/ctx(a))`` where ``ctx(a)`` is the
    number of bigrams starting with ``a`` (self-consistent MLE).
    ``backoff_logp[b]`` pre-adds ``log(ALPHA)`` to ``uni_logp[b]`` so
    both engines add ONE literal per unseen pair (bit-identity).
    """

    vocab: tuple
    uni_logp: tuple
    bi_logp: tuple  # ((key, logp), ...) sorted by key
    backoff_logp: tuple

    @property
    def dim(self) -> int:
        return len(self.vocab) + 1

    @property
    def bi_map(self) -> dict:
        return dict(self.bi_logp)

    @staticmethod
    def from_counts(
        vocab, uni_counts: dict, bi_counts: dict
    ) -> "WordLM":
        """Build from integer id counts.  *uni_counts* maps word id →
        count (id 0 = unk); *bi_counts* maps ``a*(V+1)+b`` → count."""
        vocab = tuple(vocab)
        dim = len(vocab) + 1
        total = sum(uni_counts.values())
        uni = tuple(
            math.log((uni_counts.get(i, 0) + 1.0) / (total + dim))
            for i in range(dim)
        )
        ctx = [0] * dim
        for k, c in bi_counts.items():
            ctx[k // dim] += c
        bi = tuple(
            sorted(
                (int(k), math.log(c / ctx[k // dim]))
                for k, c in bi_counts.items()
                if c > 0
            )
        )
        backoff = tuple(_LOG_ALPHA + u for u in uni)
        return WordLM(vocab=vocab, uni_logp=uni, bi_logp=bi, backoff_logp=backoff)


def _train_on_text(text: str, vocab_size: int | None = None) -> WordLM:
    """Pure-Python twin of :func:`train_word_lm` (same ordering rules)."""
    ws = _words(text)
    freq: dict[str, int] = {}
    for w in ws:
        freq[w] = freq.get(w, 0) + 1
    ranked = sorted(freq.items(), key=lambda kv: (-kv[1], kv[0]))
    if vocab_size is not None:
        ranked = ranked[: int(vocab_size)]
    vocab = tuple(w for w, _ in ranked)
    wid = {w: i + 1 for i, w in enumerate(vocab)}
    dim = len(vocab) + 1
    ids = [wid.get(w, 0) for w in ws]
    uni: dict[int, int] = {}
    for i in ids:
        uni[i] = uni.get(i, 0) + 1
    bi: dict[int, int] = {}
    for a, b in zip(ids, ids[1:]):
        k = a * dim + b
        bi[k] = bi.get(k, 0) + 1
    return WordLM.from_counts(vocab, uni, bi)


#: fixed reference model (CCNet shape: clean-text LM scores the crawl)
ENGLISH_WORD_LM = _train_on_text(_SEED_TEXT)


# -- Catalyst expressions --------------------------------------------------


def words_expr(text: Column | str = "text") -> Column:
    """Normalized word array: lower, non-a-z → space, split, drop empties
    — byte-identical tokenization in Spark / Python / DuckDB."""
    col = F.col(text) if isinstance(text, str) else text
    s = F.regexp_replace(F.lower(col), "[^a-z]", " ")
    return F.filter(F.split(s, " "), lambda w: w != F.lit(""))


def _word_ids(lm: WordLM, words: Column) -> Column:
    if lm.vocab:
        pairs: list[Column] = []
        for i, w in enumerate(lm.vocab):
            pairs.append(F.lit(w))
            pairs.append(F.lit(i + 1).cast("int"))
        m = F.create_map(*pairs)
        look = lambda w: F.coalesce(F.element_at(m, w), F.lit(0))  # noqa: E731
    else:
        look = lambda w: F.lit(0)  # noqa: E731
    return F.transform(words, look)


def word_gram_keys_expr(
    lm: WordLM, text: Column | str = "text"
) -> Column:
    """Adjacent-pair key array ``a*dim + b`` over the doc's word ids —
    empty array when the doc has fewer than two words.  Keys are LONG:
    ``a*dim + b`` tops out near ``dim²``, which overflows 32-bit int for
    vocabularies beyond ~46k words (the silent-wraparound would corrupt
    gram keys AND the pmod backoff index)."""
    ids = _word_ids(lm, words_expr(text))
    dim = F.lit(lm.dim)

    def pairs(v: Column) -> Column:
        n = F.size(v) - F.lit(1)
        return F.when(
            n >= 1,
            F.transform(
                F.sequence(F.lit(1), n),
                lambda i: (
                    F.element_at(v, i).cast("long") * dim
                    + F.element_at(v, i + F.lit(1))
                ),
            ),
        ).otherwise(F.array().cast("array<long>"))

    # let-bind the id array (element_at(transform(array(x), f), 1) = let)
    return F.element_at(F.transform(F.array(ids), pairs), 1)


def _step_expr(lm: WordLM):
    """Per-pair-key literal lookup: observed-bigram map value, else the
    pre-added backoff literal (shared by the total and averaged folds)."""
    backoff = F.array(*[F.lit(float(v)) for v in lm.backoff_logp])
    if lm.bi_logp:
        pairs: list[Column] = []
        for k, v in lm.bi_logp:
            pairs.append(F.lit(int(k)).cast("long"))
            pairs.append(F.lit(float(v)))
        bi = F.create_map(*pairs)
        return lambda g: F.coalesce(
            F.element_at(bi, g),
            F.element_at(
                backoff, (F.pmod(g, F.lit(lm.dim)) + 1).cast("int")
            ),
        )
    return lambda g: F.element_at(
        backoff, (F.pmod(g, F.lit(lm.dim)) + 1).cast("int")
    )


def word_logprob_expr(
    lm: WordLM, text_col: Column | str = "text"
) -> Column:
    """Total stupid-backoff log-probability of a document under *lm* —
    NULL when the text has fewer than two words.

    Serial left-fold over the pair keys adding literal float64 values in
    document order: bit-reproducible by any engine replaying the order.
    """
    keys = word_gram_keys_expr(lm, text_col)
    step = _step_expr(lm)

    def fold(g: Column) -> Column:
        return F.when(
            F.size(g) > 0,
            F.aggregate(g, F.lit(0.0), lambda acc, gid: acc + step(gid)),
        ).otherwise(F.lit(None).cast("double"))

    return F.element_at(F.transform(F.array(keys), fold), 1)


def word_avg_logprob_expr(
    lm: WordLM, text_col: Column | str = "text"
) -> Column:
    """``logprob / n_pairs`` with the pair-key array computed ONCE (the
    charlm ``avg_logprob_expr`` shape — two independent key-array trees
    would tokenize and id-map every document twice under interpreted
    Catalyst).  Bit-identical to ``word_logprob_expr(...) / n_pairs``.
    """
    keys = word_gram_keys_expr(lm, text_col)
    step = _step_expr(lm)

    def avg(g: Column) -> Column:
        lp = F.aggregate(g, F.lit(0.0), lambda acc, gid: acc + step(gid))
        return F.when(
            F.size(g) > 0, lp / F.size(g).cast("double")
        ).otherwise(F.lit(None).cast("double"))

    return F.element_at(F.transform(F.array(keys), avg), 1)


def word_logprob_udf(
    lm: WordLM | None = None, text_col: Column | str = "text"
) -> Column:
    """Arrow fast path for :func:`word_logprob_expr` — BIT-identical.

    The Catalyst fold looks every pair key up in an interpreted
    ``create_map`` of up to |observed bigrams| literals per element, so
    scoring a crawl-sized corpus pays interpreter cost per word pair.
    This path replays the IDENTICAL serial left-fold (same tokenization,
    same ``dict`` lookup-else-backoff, same float64 addition order) in
    batched Python behind Arrow — so unlike :func:`charlm_logprob_udf`
    (histogram·dot, ulp-level reordering) the result is bit-for-bit the
    fold's.  Keep :func:`word_logprob_expr` as the cross-engine oracle;
    use this in hot pipelines.
    """
    import pandas as pd
    from pyspark.sql.functions import pandas_udf

    model = lm if lm is not None else ENGLISH_WORD_LM
    wid = {w: i + 1 for i, w in enumerate(model.vocab)}
    bi = model.bi_map
    backoff = [float(v) for v in model.backoff_logp]
    dim = model.dim

    @pandas_udf("double")
    def score(texts):  # (pd.Series) -> pd.Series; stringified hints from
        # `from __future__ import annotations` confuse the udf inspector
        out = [None] * len(texts)
        for i, s in enumerate(texts):
            if s is None or isinstance(s, float):
                continue
            ids = [wid.get(w, 0) for w in _words(s)]
            if len(ids) < 2:
                continue
            acc = 0.0
            prev = ids[0]
            for b in ids[1:]:
                acc = acc + bi.get(prev * dim + b, backoff[b])
                prev = b
            out[i] = acc
        return pd.Series(out, dtype="float64")

    return score(F.col(text_col) if isinstance(text_col, str) else text_col)


# -- distributed training --------------------------------------------------


def word_bigram_counts(
    df: DataFrame, lm_or_vocab, text_col: str = "text"
) -> DataFrame:
    """Distributed bigram-id counts → ``(gram int, count long)`` under a
    fixed vocabulary (a :class:`WordLM` or a word sequence).

    ONE explode + groupBy; map-side partial aggregation bounds each
    task's shuffle output by the distinct observed pairs (≤ (V+1)²,
    in practice far fewer) — independent of corpus size.
    """
    lm = (
        lm_or_vocab
        if isinstance(lm_or_vocab, WordLM)
        else WordLM.from_counts(tuple(lm_or_vocab), {}, {})
    )
    return (
        df.select(F.explode(word_gram_keys_expr(lm, text_col)).alias("gram"))
        .groupBy("gram")
        .agg(F.count(F.lit(1)).cast("long").alias("count"))
    )


def train_word_lm(
    df: DataFrame, text_col: str = "text", vocab_size: int = 1024
) -> WordLM:
    """Train on a corpus: three bounded-key aggregates, three tiny
    collects (top-V vocab, ≤V+1 unigram rows, observed-bigram rows).

    Vocabulary rank ties break on the token (count DESC, token ASC) —
    the same total order as the Python twin, so training is exactly
    reproducible at any parallelism.
    """
    toks = df.select(F.explode(words_expr(text_col)).alias("token"))
    vocab_rows = (
        toks.groupBy("token")
        .agg(F.count(F.lit(1)).alias("c"))
        .orderBy(F.col("c").desc(), F.col("token").asc())
        .limit(int(vocab_size))
        .collect()
    )
    vocab = tuple(r["token"] for r in vocab_rows)
    shell = WordLM.from_counts(vocab, {}, {})
    ids = df.select(
        _word_ids(shell, words_expr(text_col)).alias("__ids")
    )
    uni_rows = (
        ids.select(F.explode("__ids").alias("id"))
        .groupBy("id")
        .agg(F.count(F.lit(1)).alias("c"))
        .collect()
    )
    bi_rows = word_bigram_counts(df, shell, text_col).collect()
    return WordLM.from_counts(
        vocab,
        {int(r["id"]): int(r["c"]) for r in uni_rows},
        {int(r["gram"]): int(r["count"]) for r in bi_rows},
    )


# -- DuckDB twins ----------------------------------------------------------


def word_norm_sql(col: str) -> str:
    """DuckDB twin of the normalization (lower, non-a-z → space)."""
    return f"regexp_replace(lower({col}), '[^a-z]', ' ', 'g')"


def _words_sql(t_col: str) -> str:
    return f"list_filter(string_split({t_col}, ' '), w -> w <> '')"


def _ids_sql(lm: WordLM, words: str) -> str:
    if not lm.vocab:
        return f"list_transform({words}, w -> 0)"
    entries = ", ".join(
        f"'{w}': {i + 1}" for i, w in enumerate(lm.vocab)
    )
    return (
        f"list_transform({words}, w -> "
        f"coalesce((MAP{{{entries}}}[w])[1], 0))"
    )


def _keys_sql(lm: WordLM, ids: str) -> str:
    return (
        f"list_transform(range(1, length({ids})), i -> "
        f"CAST({ids}[i] AS BIGINT) * {lm.dim} + {ids}[i+1])"
    )


def word_bigram_counts_sql(
    lm: WordLM, col: str = "text", table: str = "documents"
) -> str:
    """DuckDB twin of :func:`word_bigram_counts` (integer-exact)."""
    words = _words_sql(word_norm_sql(col))
    return f"""
        WITH w AS (SELECT {_ids_sql(lm, words)} AS ids FROM {table}),
        g AS (
          SELECT unnest({_keys_sql(lm, 'ids')}) AS gram
          FROM w WHERE length(ids) >= 2
        )
        SELECT CAST(gram AS bigint) AS gram, CAST(count(*) AS bigint) AS count
        FROM g GROUP BY gram
    """


def word_logprob_sql(lm: WordLM, col: str = "text") -> str:
    """DuckDB twin of :func:`word_logprob_expr` over the RAW text column
    *col* — identical float64 literals (emitted as quoted strings cast
    to DOUBLE; the bare-decimal DECIMAL→DOUBLE hop mis-rounds, see
    ``charlm.charlm_logprob_sql``), identical serial left-fold order →
    bit-identical result."""

    def dlit(v: float) -> str:
        return f"CAST('{float(v)!r}' AS DOUBLE)"

    backoff = ", ".join(dlit(v) for v in lm.backoff_logp)
    if lm.bi_logp:
        entries = ", ".join(f"{k}: {dlit(v)}" for k, v in lm.bi_logp)
        step = (
            f"coalesce((MAP{{{entries}}}[g])[1], "
            f"([{backoff}])[(g % {lm.dim}) + 1])"
        )
    else:
        step = f"([{backoff}])[(g % {lm.dim}) + 1]"
    words = _words_sql(word_norm_sql(col))
    ids = _ids_sql(lm, words)
    keys = _keys_sql(lm, "ids")
    return (
        f"(SELECT CASE WHEN length(ids) >= 2 THEN "
        f"list_reduce(list_prepend(CAST(0.0 AS DOUBLE), "
        f"list_transform({keys}, g -> {step})), (a, b) -> a + b) "
        f"ELSE NULL END FROM (SELECT {ids} AS ids) __wlm)"
    )


# -- Python reference twins ------------------------------------------------


def reference_word_ids(lm: WordLM, s: str | None) -> list[int]:
    wid = {w: i + 1 for i, w in enumerate(lm.vocab)}
    return [wid.get(w, 0) for w in _words(s or "")]


def reference_word_logprob(lm: WordLM, s: str | None) -> float | None:
    """Serial fold in document order — bit-identical to
    :func:`word_logprob_expr`."""
    ids = reference_word_ids(lm, s)
    if len(ids) < 2:
        return None
    bi = lm.bi_map
    acc = 0.0
    for a, b in zip(ids, ids[1:]):
        k = a * lm.dim + b
        acc = acc + bi.get(k, lm.backoff_logp[b])
    return acc
