"""Distributed Bloom filter — the sub-linear "have I seen this key?"
gate a 10^12-document crawl frontier needs before any exact anti-join.

No reference counterpart (fatiando/verde has no membership structures);
this is web-scale pipeline infrastructure in the same family as
``operators/dedup.seen_hashes``/``novel_docs``.  The classic role: the
rolling seen-set of a year of crawling is billions of keys — too big to
broadcast exactly and expensive to shuffle the whole probe corpus
against — but its Bloom filter is a few hundred MB, broadcastable, and
sound one-sided: a negative is DEFINITELY new.  The filter prunes the
probe side down to the maybe-seen sliver; only that sliver pays the
exact anti-join (``novel_docs(bloom_num_bits=...)`` wires exactly this
and is law-tested to return the identical result set).

Engine portability: every bit position is derived from two mod-prime
polynomial codepoint folds (strings) or two affine mod-prime mixes
(numeric keys) combined Kirsch–Mitzenmacher style
(``pos_i = (h1 + i·h2') mod m`` — Kirsch & Mitzenmacher 2006, "Less
hashing, same performance"), all in exact int64 arithmetic, so a DuckDB
twin reproduces the filter — including its false positives — BIT-FOR-BIT
(``build_bloom_sql`` / ``bloom_contains_sql``).  Words pack 32 bits per
BIGINT (shift ≤ 31 keeps every value positive and double-exact, so no
engine disagrees on sign/overflow).

Scale shapes:

* :func:`build_bloom` — ONE pass: per-row position array (a single
  let-bound projection; the two folds run once per row, not once per
  hash), explode, and a map-side-combinable ``bit_or`` aggregate whose
  exchange carries at most ``num_bits/32`` rows per task at ANY corpus
  size.  The corpus itself never shuffles.
* :func:`bloom_might_contain` (``engine="join"``) — ``num_hashes``
  broadcast LEFT joins against the (tiny, ≤ ``num_bits/32``-row) word
  table: the probe side NEVER shuffles (plan-asserted), and Spark
  reuses the single broadcast exchange across the k joins.
* ``engine="literal"`` — the word table constant-folds into the plan as
  one dense array literal (bounded: ``num_bits ≤ 2^20``); membership is
  ``element_at`` + shift arithmetic — zero joins, zero shuffles, rides
  the scan (the ``dsir`` literal-table precedent).
"""

from __future__ import annotations

import math

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

__all__ = [
    "bloom_parameters",
    "build_bloom",
    "bloom_might_contain",
    "build_bloom_sql",
    "bloom_contains_sql",
]

#: Mersenne prime 2^31-1 — the h1 fold modulus (dsir precedent).
_P1 = 2147483647
#: Largest prime below 2^31-17 — the h2 fold modulus (independent of _P1).
_P2 = 2147483629
_BASE1 = 257
_BASE2 = 263
#: Affine mix constants for numeric keys (Knuth multiplicative, classic
#: LCG increment — both public-domain constants).
_A1 = 1103515245
_B1 = 12345
_A2 = 2654435761 % _P2
_B2 = 97

#: literal engine bound: 2^20 bits -> 32,768 BIGINT literals in the plan
#: (the dsir 4096-literal table precedent, scaled but still codegen-safe).
_LITERAL_MAX_BITS = 1 << 20


def bloom_parameters(n_items: int, fpp: float) -> tuple[int, int]:
    """Textbook optimal sizing: ``m = ceil(-n·ln p / ln²2)`` bits and
    ``k = max(1, round(m/n·ln 2))`` hashes for *n_items* keys at target
    false-positive rate *fpp*.  Driver float math on two scalars."""
    if n_items <= 0:
        raise ValueError("n_items must be positive")
    if not (0.0 < fpp < 1.0):
        raise ValueError("fpp must be in (0, 1)")
    m = math.ceil(-n_items * math.log(fpp) / (math.log(2) ** 2))
    m = max(64, m)
    k = max(1, round(m / n_items * math.log(2)))
    return m, min(k, 16)


def _validate(num_bits: int, num_hashes: int) -> None:
    if num_bits < 64:
        raise ValueError(f"num_bits must be >= 64, got {num_bits}")
    if num_bits > 1 << 34:
        raise ValueError("num_bits > 2^34: shard the filter by key range")
    if not 1 <= num_hashes <= 16:
        raise ValueError(f"num_hashes must be in [1, 16], got {num_hashes}")


def _is_string(df: DataFrame, col: str) -> bool:
    f = df.schema[col].dataType.typeName()
    if f == "string":
        return True
    if f in ("long", "integer", "short", "byte", "bigint", "int"):
        return False
    raise ValueError(
        f"bloom key column {col!r} must be string or integral, got {f}"
    )


def _fold(codes: Column, base: int, mod: int) -> Column:
    return F.aggregate(
        codes,
        F.lit(0).cast("bigint"),
        lambda acc, c: (acc * base + c) % mod,
    )


def _hash_pair(key: Column, is_string: bool) -> tuple[Column, Column]:
    """(h1 in [0,_P1), h2 in [0,_P2)) — two independent exact int64
    hashes, the same spelling :func:`_hash_pair_sql` replays."""
    if is_string:
        codes = F.transform(
            F.split(key.cast("string"), ""),
            lambda ch: F.ascii(ch).cast("bigint"),
        )
        return _fold(codes, _BASE1, _P1), _fold(codes, _BASE2, _P2)
    x1 = F.pmod(key.cast("long"), F.lit(_P1).cast("bigint"))
    x2 = F.pmod(key.cast("long"), F.lit(_P2).cast("bigint"))
    h1 = F.pmod(x1 * _A1 + _B1, F.lit(_P1).cast("bigint"))
    h2 = F.pmod(x2 * _A2 + _B2, F.lit(_P2).cast("bigint"))
    return h1, h2


def _positions(
    key: Column, is_string: bool, num_bits: int, num_hashes: int
) -> Column:
    """``array<bigint>`` of the *num_hashes* bit positions of *key*.

    Let-binding: the two folds are wrapped in a one-element struct array
    and the position sequence is built inside the transform lambda, so
    each fold evaluates ONCE per row — never once per hash (the
    CollapseProject duplication trap, see winnow_select / text.py)."""
    h1, h2 = _hash_pair(key, is_string)
    step = 1 + (h2 % (num_bits - 1))  # h2' in [1, num_bits-1]: never 0
    return F.flatten(
        F.transform(
            F.array(F.struct(h1.alias("a"), step.alias("b"))),
            lambda s: F.transform(
                F.sequence(
                    F.lit(0).cast("bigint"),
                    F.lit(num_hashes - 1).cast("bigint"),
                ),
                lambda i: (s["a"] + i * s["b"]) % num_bits,
            ),
        )
    )


def build_bloom(
    df: DataFrame,
    col: str,
    *,
    num_bits: int,
    num_hashes: int = 5,
) -> DataFrame:
    """Build the filter: ``(word_idx:int, word:bigint)`` rows, one per
    NON-ZERO 32-bit word (sparse — an empty filter is zero rows).  NULL
    keys are excluded (a NULL never matches anything downstream either).

    One corpus pass: position-array projection → explode → map-side
    combinable ``bit_or`` groupBy whose exchange is bounded by
    ``num_bits/32`` rows per task regardless of corpus size.
    """
    _validate(num_bits, num_hashes)
    key = F.col(col)
    pos = _positions(key, _is_string(df, col), num_bits, num_hashes)
    return (
        df.filter(key.isNotNull())
        .select(F.explode(pos).alias("pos"))
        .select(
            F.shiftright("pos", 5).cast("int").alias("word_idx"),
            F.expr("shiftleft(CAST(1 AS BIGINT), CAST(pos % 32 AS INT))")
            .alias("mask"),
        )
        .groupBy("word_idx")
        .agg(F.bit_or("mask").alias("word"))
    )


def bloom_might_contain(
    probe: DataFrame,
    bloom: DataFrame,
    col: str,
    *,
    num_bits: int,
    num_hashes: int = 5,
    result_col: str = "maybe_seen",
    engine: str = "auto",
) -> DataFrame:
    """Append boolean *result_col*: False = key DEFINITELY not inserted
    (one-sided soundness — the law the tests pin); True = maybe.  NULL
    key → NULL flag.  *num_bits*/*num_hashes* must match the build.

    ``engine="join"``: *num_hashes* broadcast LEFT joins on the word
    index — the probe side never shuffles, the word table broadcasts
    once.  ``engine="literal"``: the words are collected (bounded by the
    2^20-bit cap → ≤ 32,768 BIGINTs) into ONE dense array literal;
    membership is pure projection arithmetic riding the scan.  ``auto``
    picks literal when ``num_bits ≤ 2^17`` else join.
    """
    _validate(num_bits, num_hashes)
    if engine == "auto":
        engine = "literal" if num_bits <= (1 << 17) else "join"
    if engine not in ("join", "literal"):
        raise ValueError(f"unknown engine {engine!r}")
    # the probe must not already carry a working-column name — withColumn
    # would silently overwrite it and the final drop would remove it from
    # the output (ADVICE r4)
    reserved = {"__bpos"}
    if engine == "join":
        reserved |= {f"__bw{i}" for i in range(num_hashes)}
        reserved |= {f"__bv{i}" for i in range(num_hashes)}
    clash = reserved & set(probe.columns)
    if clash:
        raise ValueError(
            f"probe already has reserved working column(s) {sorted(clash)}; "
            "rename them before calling bloom_might_contain"
        )
    key = F.col(col)
    pos = _positions(key, _is_string(probe, col), num_bits, num_hashes)
    out = probe.withColumn("__bpos", pos)

    if engine == "literal":
        if num_bits > _LITERAL_MAX_BITS:
            raise ValueError(
                f"engine='literal' caps num_bits at {_LITERAL_MAX_BITS} "
                "(plan-size bound); use engine='join'"
            )
        words = [0] * ((num_bits + 31) // 32)
        for r in bloom.collect():  # bounded: <= num_bits/32 rows by cap
            words[r["word_idx"]] = r["word"]
        table = F.array(*[F.lit(w).cast("bigint") for w in words])
        # bit test via exact double-safe arithmetic (shiftright needs a
        # literal count): words hold bits 0..31 only -> word < 2^32,
        # so the floor-division by 2^b is exact in float64.
        flag = F.aggregate(
            F.col("__bpos"),
            F.lit(True),
            lambda acc, p: acc
            & (
                F.floor(
                    F.element_at(table, F.shiftright(p, 5).cast("int") + 1)
                    / F.pow(F.lit(2.0), (p % 32).cast("double"))
                ).cast("bigint")
                % 2
                == 1
            ),
        )
        return out.withColumn(
            result_col, F.when(key.isNotNull(), flag)
        ).drop("__bpos")

    # join engine: one narrow broadcast word table, reused k times
    dim = F.broadcast(bloom.select("word_idx", "word"))
    flag = F.lit(True)
    for i in range(num_hashes):
        p = F.element_at("__bpos", i + 1)
        out = out.withColumn(f"__bw{i}", F.shiftright(p, 5).cast("int"))
        out = out.join(
            dim.withColumnRenamed("word_idx", f"__bw{i}").withColumnRenamed(
                "word", f"__bv{i}"
            ),
            f"__bw{i}",
            "left",
        )
        bit = F.expr(
            f"shiftright(coalesce(__bv{i}, CAST(0 AS BIGINT)), "
            f"CAST(element_at(__bpos, {i + 1}) % 32 AS INT)) & 1"
        )
        flag = flag & (bit == 1)
    out = out.withColumn(result_col, F.when(key.isNotNull(), flag))
    return out.drop("__bpos", *[f"__bw{i}" for i in range(num_hashes)],
                    *[f"__bv{i}" for i in range(num_hashes)])


# -- DuckDB twins ----------------------------------------------------------


def _hash_pair_sql(col: str, is_string: bool) -> tuple[str, str]:
    if is_string:
        codes = (
            f"list_transform(string_split(CAST({col} AS VARCHAR), ''), "
            "c -> ascii(c)::BIGINT)"
        )
        h1 = (
            f"list_reduce(list_prepend(0::BIGINT, {codes}), "
            f"(acc, c) -> (acc * {_BASE1} + c) % {_P1})"
        )
        h2 = (
            f"list_reduce(list_prepend(0::BIGINT, {codes}), "
            f"(acc, c) -> (acc * {_BASE2} + c) % {_P2})"
        )
        return h1, h2
    x1 = f"((({col}::BIGINT % {_P1}) + {_P1}) % {_P1})"
    x2 = f"((({col}::BIGINT % {_P2}) + {_P2}) % {_P2})"
    return (
        f"(({x1} * {_A1} + {_B1}) % {_P1})",
        f"(({x2} * {_A2} + {_B2}) % {_P2})",
    )


def _positions_sql(
    col: str, is_string: bool, num_bits: int, num_hashes: int
) -> str:
    h1, h2 = _hash_pair_sql(col, is_string)
    return (
        f"list_transform(range(0, {num_hashes}), "
        f"i -> (({h1}) + i * (1 + (({h2}) % {num_bits - 1}))) % {num_bits})"
    )


def build_bloom_sql(
    src_sql: str,
    col: str,
    *,
    num_bits: int,
    num_hashes: int = 5,
    is_string: bool = True,
) -> str:
    """DuckDB twin of :func:`build_bloom` — identical folds, packing and
    ``bit_or`` grouping; bit-for-bit equal word rows."""
    _validate(num_bits, num_hashes)
    pos = _positions_sql(col, is_string, num_bits, num_hashes)
    return f"""
        WITH src AS ({src_sql}),
        p AS (
          SELECT unnest({pos}) AS pos
          FROM src WHERE {col} IS NOT NULL
        )
        SELECT CAST(pos // 32 AS INT) AS word_idx,
               bit_or(1::BIGINT << CAST(pos % 32 AS INT)) AS word
        FROM p GROUP BY 1
    """


def bloom_contains_sql(
    probe_sql: str,
    words_sql: str,
    col: str,
    *,
    num_bits: int,
    num_hashes: int = 5,
    is_string: bool = True,
    result_col: str = "maybe_seen",
    select_cols: str = "*",
) -> str:
    """DuckDB twin of :func:`bloom_might_contain` — the word table rides
    as a one-row MAP cross-joined into the probe (DuckDB lambdas reject
    subqueries but read outer columns), membership is the same shift
    test; the flag column (false positives included) matches Spark
    exactly."""
    _validate(num_bits, num_hashes)
    pos = _positions_sql(col, is_string, num_bits, num_hashes)
    cols = "probe.*" if select_cols.strip() == "*" else select_cols
    return f"""
        WITH words AS ({words_sql}),
        wm AS (
          SELECT map(list(word_idx ORDER BY word_idx),
                     list(word ORDER BY word_idx)) AS m
          FROM words
        ),
        probe AS ({probe_sql})
        SELECT {cols},
               CASE WHEN {col} IS NULL THEN NULL ELSE (
                 NOT list_contains(
                   list_transform({pos}, p ->
                     ((coalesce(map_extract(wm.m, CAST(p // 32 AS INT))[1],
                                0::BIGINT)
                       >> CAST(p % 32 AS INT)) & 1) = 1),
                   false)
               ) END AS {result_col}
        FROM probe CROSS JOIN wm
    """
