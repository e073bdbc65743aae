"""Byte-pair-encoding subword tokenizer — learned merges over a corpus,
then encoding as a pure Catalyst projection.

Public technique (Sennrich, Haddow & Birch 2016, "Neural Machine
Translation of Rare Words with Subword Units", ACL — the tokenizer family
behind GPT-2/RoBERTa vocabularies).  This completes the repo's tokenizer
story: ``build_vocab`` (word-level ids) → ``train_bpe`` (subword merges)
→ ``bpe_encode`` (subword tokens) → ``encode_tokens`` / ``pack_sequences``
(ids → fixed-length training rows).

Spark-first shape
-----------------
* **Training** (:func:`train_bpe`) never iterates over the corpus: the
  corpus is touched ONCE to build the word-frequency table (the same
  map-side-combinable ``explode → groupBy(word)`` aggregate as
  ``build_vocab`` — the shuffle carries distinct words, not occurrences).
  Every merge round then runs on that table (≤ |vocab| rows at ANY corpus
  size): adjacent-pair counts are one bounded-key ``explode → groupBy``
  whose shuffle is capped by the number of DISTINCT symbol pairs, the
  argmax is a ``TakeOrderedAndProject`` of ONE row, and the merge applies
  as a single literal ``replace`` projection.  ``localCheckpoint`` every
  ``checkpoint_every`` rounds keeps lineage and planning time flat — the
  PageRank/kNN iteration discipline.
* **Encoding** (:meth:`BpeModel.encode_expr`) is a ZERO-shuffle,
  zero-Python codegen projection: per word, a serial chain of literal
  ``replace`` calls (one per learned merge) over the space-delimited
  symbol string, then split.  A twin engine replaying the same chain
  reproduces the tokens BIT-FOR-BIT (:meth:`BpeModel.encode_sql` /
  :func:`reference_encode` — the charlm/DSIR literal-fold discipline).

Cross-engine merge semantics (documented variant)
-------------------------------------------------
A merge ``(A, B) → AB`` is applied as a literal non-overlapping
left-to-right replace-all of ``" A B "`` with ``" AB "`` on the
space-bordered symbol string — the exact shared semantics of Spark
``replace``, DuckDB ``replace`` and Python ``str.replace``, so all three
engines are identical by construction.  This differs from subword-nmt's
regex re-scan in ONE corner: an immediately repeated identical pair
(``"a a a a"`` under merge ``(a, a)``) merges every OTHER occurrence per
round instead of every adjacent one, because the matched trailing space
is consumed.  Later rounds converge to the same vocabulary; natural-
language corpora hit the corner rarely (repeated single symbols).

Word model: words come from the engine-portable tokenizer shared with
BM25/vocab (``operators.search.tokens_expr`` — lower, split on
non-alphanumeric), each word ends with the ``_`` end-of-word marker
(``_`` cannot collide: tokens are ``[a-z0-9]+``).
"""

from __future__ import annotations

from dataclasses import dataclass, field

from pyspark.sql import Column, DataFrame, SparkSession
from pyspark.sql import functions as F

__all__ = [
    "BpeModel",
    "train_bpe",
    "word_counts",
    "reference_train_bpe",
    "reference_encode",
    "EXAMPLE_BPE",
]

#: end-of-word marker appended to every word's symbol sequence.  Tokens
#: are [a-z0-9]+ by construction, so "_" never collides with a character.
EOW = "_"


def word_counts(df: DataFrame, text_col: str = "text") -> DataFrame:
    """``(word, count long)`` — the ONE corpus-wide aggregate BPE training
    needs; every merge round afterwards runs on this table only."""
    from ..operators.search import tokens_expr

    return (
        df.select(F.explode(tokens_expr(text_col)).alias("word"))
        .groupBy("word")
        .agg(F.count(F.lit(1)).cast("long").alias("count"))
    )


def _symbols_expr(word: Column) -> Column:
    """Space-bordered symbol string of a word: ``"cat"`` → ``" c a t _ "``.

    Every symbol is bordered by spaces on BOTH sides, so a merge pattern
    ``" A B "`` can never match inside another symbol (``"ab b"`` is not
    corrupted by merge ``(b, b)``).
    """
    return F.concat(
        F.lit(" "), F.regexp_replace(word, "(.)", "$1 "), F.lit(EOW + " ")
    )


def _adjacent_pairs(sym: Column) -> Column:
    """Array of ``struct(a, b)`` adjacent symbol pairs of a symbol string
    (every occurrence counts, matching :func:`reference_train_bpe`)."""
    arr = F.filter(F.split(sym, " "), lambda x: x != F.lit(""))
    pairs = F.transform(
        F.sequence(F.lit(1), F.size(arr) - 1),
        lambda i: F.struct(
            F.element_at(arr, i).alias("a"), F.element_at(arr, i + 1).alias("b")
        ),
    )
    return F.when(F.size(arr) >= 2, pairs).otherwise(
        F.array().cast("array<struct<a:string,b:string>>")
    )


@dataclass(frozen=True)
class BpeModel:
    """A learned merge list.  ``merges[i] = (left, right)``, applied in
    order; the merged symbol is the concatenation ``left + right``."""

    merges: tuple = field(default_factory=tuple)

    # -- encoding -------------------------------------------------------
    def encode_expr(self, text_col: Column | str = "text") -> Column:
        """``array<string>`` subword tokens of a document — a pure
        projection: tokenize → per word, replay the merge chain as nested
        literal ``replace`` calls → split.  Zero shuffles, zero Python."""
        from ..operators.search import tokens_expr

        def encode_word(w: Column) -> Column:
            sym = _symbols_expr(w)
            for a, b in self.merges:
                sym = F.replace(
                    sym, F.lit(f" {a} {b} "), F.lit(f" {a}{b} ")
                )
            return F.filter(F.split(sym, " "), lambda x: x != F.lit(""))

        return F.flatten(F.transform(tokens_expr(text_col), encode_word))

    def encode_sql(self, col: str = "text") -> str:
        """DuckDB twin of :meth:`encode_expr` — identical tokens
        bit-for-bit (same tokenizer, same literal replace chain)."""
        word_syms = (
            f"' ' || regexp_replace(w, '(.)', '\\1 ', 'g') || '{EOW} '"
        )
        chain = word_syms
        for a, b in self.merges:
            chain = f"replace({chain}, ' {a} {b} ', ' {a}{b} ')"
        return (
            "flatten(list_transform("
            f"list_filter(string_split_regex(lower({col}), '[^a-z0-9]+'), x -> x <> ''), "
            f"w -> list_filter(string_split({chain}, ' '), x -> x <> '')))"
        )

    def merges_table(self, spark: SparkSession) -> DataFrame:
        """The merge list as ``(rank int, left, right, merged)`` rows."""
        rows = [
            (i, a, b, a + b) for i, (a, b) in enumerate(self.merges)
        ]
        return spark.createDataFrame(
            rows, "rank int, left string, right string, merged string"
        )

    @property
    def vocab(self) -> tuple:
        """All merged symbols, in learn order."""
        return tuple(a + b for a, b in self.merges)


def train_bpe(
    df: DataFrame,
    num_merges: int = 100,
    *,
    text_col: str = "text",
    min_pair_count: int = 2,
    checkpoint_every: int = 8,
) -> BpeModel:
    """Learn *num_merges* BPE merges from a corpus (distributed).

    The corpus contributes ONE aggregate (the word-frequency table);
    each round then (a) counts adjacent symbol pairs on that table —
    ``explode → groupBy(a, b)``, shuffle bounded by distinct pairs,
    (b) takes the argmax with the deterministic tie-break
    ``(count desc, a asc, b asc)`` (a one-row ``TakeOrderedAndProject``),
    (c) applies the merge as one literal ``replace`` projection.
    Training stops early when the best pair's count drops below
    *min_pair_count* (absorbing fully-merged corpora).

    Determinism: integer counts + total-order tie-break ⇒ the same corpus
    yields the same merges at ANY parallelism — verified bit-for-bit
    against :func:`reference_train_bpe` in tests.
    """
    wc = word_counts(df, text_col).select(
        _symbols_expr(F.col("word")).alias("sym"), "count"
    )
    wc = wc.localCheckpoint(eager=True)
    merges: list = []
    for r in range(int(num_merges)):
        best = (
            wc.select(F.explode(_adjacent_pairs(F.col("sym"))).alias("p"), "count")
            .groupBy(F.col("p.a").alias("a"), F.col("p.b").alias("b"))
            .agg(F.sum("count").alias("cnt"))
            .orderBy(F.col("cnt").desc(), F.col("a").asc(), F.col("b").asc())
            .limit(1)
            .collect()
        )
        if not best or best[0]["cnt"] < min_pair_count:
            break
        a, b = best[0]["a"], best[0]["b"]
        merges.append((a, b))
        wc = wc.withColumn(
            "sym", F.replace(F.col("sym"), F.lit(f" {a} {b} "), F.lit(f" {a}{b} "))
        )
        if (r + 1) % checkpoint_every == 0:
            wc = wc.localCheckpoint(eager=True)
    return BpeModel(tuple(merges))


# -- pure-Python reference (parity oracle; also trains EXAMPLE_BPE) ------

def _py_tokens(text: str) -> list:
    import re

    return [t for t in re.split(r"[^a-z0-9]+", text.lower()) if t]


def _py_symbols(word: str) -> str:
    return " " + "".join(c + " " for c in word) + EOW + " "


def reference_train_bpe(
    word_count_pairs, num_merges: int = 100, min_pair_count: int = 2
) -> BpeModel:
    """Pure-Python twin of :func:`train_bpe` over ``(word, count)`` pairs
    — identical pair counting (every adjacent occurrence), tie-break and
    replace semantics, so the learned merges match Spark's bit-for-bit."""
    syms = {_py_symbols(w): int(c) for w, c in word_count_pairs}
    merges: list = []
    for _ in range(int(num_merges)):
        counts: dict = {}
        for s, c in syms.items():
            toks = s.split()
            for i in range(len(toks) - 1):
                counts[(toks[i], toks[i + 1])] = (
                    counts.get((toks[i], toks[i + 1]), 0) + c
                )
        if not counts:
            break
        # max by (count, then LEXICOGRAPHICALLY SMALLEST pair) — the
        # Spark orderBy(cnt desc, a asc, b asc) tie-break
        best = min(counts.items(), key=lambda kv: (-kv[1], kv[0][0], kv[0][1]))
        if best[1] < min_pair_count:
            break
        (a, b) = best[0]
        merges.append((a, b))
        pat, rep = f" {a} {b} ", f" {a}{b} "
        nxt: dict = {}
        for s, c in syms.items():
            ns = s.replace(pat, rep)
            nxt[ns] = nxt.get(ns, 0) + c
        syms = nxt
    return BpeModel(tuple(merges))


def reference_encode(model: BpeModel, text) -> list:
    """Pure-Python twin of :meth:`BpeModel.encode_expr` (None → None,
    matching Spark's null propagation through the projection)."""
    if text is None:
        return None
    out: list = []
    for w in _py_tokens(text):
        s = _py_symbols(w)
        for a, b in model.merges:
            s = s.replace(f" {a} {b} ", f" {a}{b} ")
        out.extend(s.split())
    return out


def _train_example() -> BpeModel:
    # original seed prose written for this repo (same discipline as
    # charlm.ENGLISH_LM): a fixed code constant, so driver oracle SQL can
    # embed the identical merge chain.
    seed = (
        "the spark engine reads the web pages and the pipeline cleans the "
        "text before the tokenizer learns the merges from the words . "
        "the engine partitions the pages across the cluster and the "
        "shuffle carries the counts while the driver collects the best "
        "pair each round . subword units let the model share the stems "
        "of walking walked walker and talking talked talker so rare "
        "words still map onto known pieces . the corpus table holds the "
        "urls the timestamps and the extracted text and the quality "
        "gates drop the noisy pages before the training shards pack the "
        "token ids into fixed length rows ."
    )
    counts: dict = {}
    for w in _py_tokens(seed):
        counts[w] = counts.get(w, 0) + 1
    return reference_train_bpe(sorted(counts.items()), num_merges=60)


#: fixed example model (trained at import on the embedded seed — a code
#: constant, the DSIR/charlm EXAMPLE_* pattern) for driver queries and
#: docs; real pipelines call train_bpe on their own corpus.
EXAMPLE_BPE = _train_example()
