"""Text-layer functions for the web-page table: geotag extraction,
language-ID, quality scoring, token counting, fingerprinting.

Everything here is either a builtin column expression (regexp/hash —
JVM-side, codegen) or an Arrow-vectorized pandas UDF; never per-row
Python. The ``text`` column itself is only ever *read* — the
byte-identical-text-per-url invariant (BASELINE.json input_hint) means no
operator may rewrite it.
"""

from __future__ import annotations

from pyspark.sql import Column
from pyspark.sql import functions as F

#: geotag embedded in page text by the fixture generator (FIXTURES.md §1):
#: ``geo:<lat>,<lon>`` with fixed-precision decimals.
GEO_PATTERN = r"geo:(-?\d+\.\d+),(-?\d+\.\d+)"


def geotag_lat(text: Column | str = "text") -> Column:
    text = F.col(text) if isinstance(text, str) else text
    # try_cast: regexp_extract yields '' on no match (null under ANSI cast)
    return F.regexp_extract(text, GEO_PATTERN, 1).try_cast("double")


def geotag_lon(text: Column | str = "text") -> Column:
    text = F.col(text) if isinstance(text, str) else text
    return F.regexp_extract(text, GEO_PATTERN, 2).try_cast("double")


def geotag_sql(col: str, group: int) -> str:
    """DuckDB SQL equivalent of the geotag extraction (oracle parity)."""
    return (
        f"TRY_CAST(regexp_extract({col}, 'geo:(-?\\d+\\.\\d+),(-?\\d+\\.\\d+)', {group}) AS DOUBLE)"
    )


def token_count(text: Column | str = "text") -> Column:
    """Whitespace token count (0 for empty/blank strings)."""
    text = F.col(text) if isinstance(text, str) else text
    trimmed = F.trim(text)
    return F.when(trimmed == "", F.lit(0)).otherwise(
        F.size(F.split(trimmed, r"\s+"))
    )


def bpe_ish_token_count(text: Column | str = "text") -> Column:
    """BPE-ish token estimate: count of word/number/punctuation pieces.

    ``regexp_count`` of ``\\w+|[^\\w\\s]`` — a cheap stand-in for a real
    tokenizer with the same monotonicity properties, entirely JVM-side.
    """
    text = F.col(text) if isinstance(text, str) else text
    return F.regexp_count(text, F.lit(r"\w+|[^\w\s]"))


#: Tiny per-language stopword markers for the n-gram/stopword heuristic.
_LANG_MARKERS = {
    "en": [" the ", " and ", " of ", " to ", " is "],
    "de": [" der ", " die ", " und ", " das ", " ist "],
    "fr": [" le ", " la ", " les ", " et ", " est "],
    "es": [" el ", " los ", " que ", " y ", " es "],
    "pt": [" o ", " os ", " que ", " e ", " um "],
}


def lang_id_expr(text: Column | str = "text") -> Column:
    """Heuristic language-ID: argmax of per-language stopword hit counts.

    Pure column expressions (one ``regexp_count`` per language + a
    ``greatest``-based argmax); returns 'und' when nothing matches.
    """
    text = F.col(text) if isinstance(text, str) else text
    padded = F.concat(F.lit(" "), F.lower(text), F.lit(" "))
    scores = {
        lang: sum(
            (F.regexp_count(padded, F.lit(m.replace(" ", r"\s"))) for m in markers),
            start=F.lit(0),
        )
        for lang, markers in _LANG_MARKERS.items()
    }
    best = F.greatest(*scores.values())
    expr = F.lit("und")
    for lang, score in reversed(list(scores.items())):
        expr = F.when((score == best) & (best > 0), F.lit(lang)).otherwise(expr)
    return expr


def quality_score(text: Column | str = "text") -> Column:
    """Cheap document-quality score in [0, 1]: blends length, alpha ratio,
    punctuation ratio and mean word length — all JVM-side expressions."""
    text = F.col(text) if isinstance(text, str) else text
    n = F.length(text).cast("double")
    safe_n = F.greatest(n, F.lit(1.0))
    alpha = F.regexp_count(text, F.lit(r"[A-Za-z]")).cast("double") / safe_n
    punct = F.regexp_count(text, F.lit(r"[^\w\s]")).cast("double") / safe_n
    words = F.greatest(token_count(text).cast("double"), F.lit(1.0))
    mean_word = n / words
    len_score = F.least(n / F.lit(500.0), F.lit(1.0))
    word_score = F.when((mean_word >= 3) & (mean_word <= 10), F.lit(1.0)).otherwise(F.lit(0.3))
    punct_score = F.when(punct <= 0.2, F.lit(1.0)).otherwise(F.greatest(F.lit(0.0), 1.0 - punct))
    return (0.3 * len_score + 0.3 * alpha + 0.2 * word_score + 0.2 * punct_score).alias(
        "quality"
    )


#: Small per-language stopword sets for the stopword-ratio quality gate
#: (top function words; enough to separate prose from keyword soup).
_STOPWORDS = {
    "en": ("the", "and", "of", "to", "a", "in", "is", "that", "it", "for"),
    "de": ("der", "die", "das", "und", "ist", "von", "mit", "den", "im", "zu"),
    "fr": ("le", "la", "les", "et", "est", "des", "un", "une", "du", "que"),
    "es": ("el", "la", "los", "de", "y", "es", "en", "un", "una", "que"),
    "pt": ("o", "a", "os", "de", "e", "é", "em", "um", "uma", "que"),
}


def stopword_ratio(text: Column | str = "text", lang: str = "en") -> Column:
    """Fraction of tokens that are function words — the classic
    prose-vs-keyword-soup quality gate (natural text ≈ 0.3-0.6; SEO spam
    and navigation dumps ≈ 0).  0.0 for empty text, null for null.

    Pure Catalyst: let-bound lowercase token array (no CSE in
    interpreted Catalyst), per-token ``array_contains`` against a
    10-word literal set; the whitespace class is engine-portable so
    :func:`stopword_ratio_sql` replays the division bit-for-bit.
    """
    if lang not in _STOPWORDS:
        raise ValueError(f"lang must be one of {sorted(_STOPWORDS)}, got {lang!r}")
    text = F.col(text) if isinstance(text, str) else text
    sw = F.array(*[F.lit(w) for w in _STOPWORDS[lang]])
    split_words = F.split(F.lower(F.trim(text)), "[ \t\r\n\f]+")

    def _ratio(words: Column) -> Column:
        hits = F.size(F.filter(words, lambda w: F.array_contains(sw, w)))
        return hits.cast("double") / F.greatest(F.size(words), F.lit(1))

    ratio = F.element_at(F.transform(F.array(split_words), _ratio), 1)
    return F.when(text.isNotNull(), ratio)


def stopword_ratio_sql(col: str, lang: str = "en") -> str:
    """DuckDB twin of :func:`stopword_ratio` (driver-oracle parity)."""
    words = ", ".join(f"'{w}'" for w in _STOPWORDS[lang])
    return f"""(
      CASE WHEN {col} IS NULL THEN NULL ELSE (
        SELECT CAST(len(list_filter(ws, w -> list_contains([{words}], w))) AS DOUBLE)
               / greatest(len(ws), 1)
        FROM (SELECT string_split_regex(lower(trim({col})), '[ \t\r\n\f]+') AS ws)
      ) END
    )"""


def repetition_ratio(text: Column | str = "text", n: int = 2) -> Column:
    """Fraction of duplicated word *n*-grams — the Gopher-style
    within-document repetition signal (templated/boilerplate pages score
    high, natural prose low).  ``1 - distinct(grams)/count(grams)``; 0.0
    when the text has fewer than *n* words, null for null text.

    Pure Catalyst: the word array is let-bound (no CSE in interpreted
    Catalyst), windows come from the same shifted-slice ``arrays_zip``
    pattern as :func:`shingles`, and the whitespace class is the
    engine-portable ``[ \\t\\r\\n\\f]`` so :func:`repetition_ratio_sql`
    replays the chain bit-for-bit in DuckDB.
    """
    text = F.col(text) if isinstance(text, str) else text
    split_words = F.split(F.lower(F.trim(text)), "[ \t\r\n\f]+")

    def _ratio(words: Column) -> Column:
        big = F.size(words)
        cols = [
            F.slice(words, j + 1, F.greatest(big - j, F.lit(0))).alias(f"w{j}")
            for j in range(n)
        ]
        grams = F.transform(
            F.arrays_zip(*cols),
            lambda e: F.concat_ws(" ", *[e[f"w{j}"] for j in range(n)]),
        )
        grams = F.slice(grams, 1, F.greatest(big - F.lit(n - 1), F.lit(0)))
        m = F.size(grams)
        return F.when(
            m > 0,
            F.lit(1.0) - F.size(F.array_distinct(grams)).cast("double") / m,
        ).otherwise(F.lit(0.0))

    ratio = F.element_at(F.transform(F.array(split_words), _ratio), 1)
    return F.when(text.isNotNull(), ratio)


def repetition_ratio_sql(col: str, n: int = 2) -> str:
    """DuckDB twin of :func:`repetition_ratio` (driver-oracle parity)."""
    joined = " || ' ' || ".join(f"ws[i+{j + 1}]" for j in range(n))
    return f"""(
      CASE WHEN {col} IS NULL THEN NULL ELSE (
        WITH w AS (
          SELECT string_split_regex(lower(trim({col})), '[ \t\r\n\f]+') AS ws
        ),
        g AS (
          SELECT list_transform(range(0, greatest(len(ws) - {n - 1}, 0)),
                                i -> {joined}) AS grams
          FROM w
        )
        SELECT CASE WHEN len(grams) > 0
                    THEN 1.0 - CAST(len(list_distinct(grams)) AS DOUBLE) / len(grams)
                    ELSE 0.0 END
        FROM g
      ) END
    )"""


def fingerprint(text: Column | str = "text") -> Column:
    """Deterministic 64-bit document fingerprint (xxhash64 of the text) —
    the exact-dedup key."""
    text = F.col(text) if isinstance(text, str) else text
    return F.xxhash64(text)


def kgram_hashes(text: Column | str = "text", k: int = 5, base: int = 257) -> Column:
    """Array of exact polynomial character-``k``-gram hashes of
    ``lower(text)``: ``hash(i) = Σ_j codepoint(s[i+j]) · base^(k-1-j)``.

    Exact int64, no modulus — for ``k ≤ 6`` and BMP codepoints the sum
    fits in 63 bits — so a DuckDB oracle reproduces it bit-for-bit
    (``xxhash64`` has no DuckDB twin). Pure Catalyst: one ``transform``
    over gram positions with the ``k`` per-character terms unrolled as
    literal-coefficient multiplies. Empty array for texts shorter than
    ``k``.
    """
    text = F.col(text) if isinstance(text, str) else text
    s = F.lower(text)
    # Split to a let-bound codepoint array FIRST: substr(s, i, 1) on a
    # UTF8String is O(i) (it must scan for codepoint boundaries), so
    # hashing grams straight off the string is O(m²·k) per document.
    # One split + ascii pass is O(m), and element_at on the materialized
    # int array is O(1), so the gram transform is the textbook O(m·k).
    codes = F.transform(F.split(s, ""), lambda c: F.ascii(c).cast("bigint"))

    def grams(cs: Column) -> Column:
        n_g = F.greatest(F.size(cs) - F.lit(k - 1), F.lit(0))

        def gram(i: Column) -> Column:
            total = F.lit(0).cast("bigint")
            for j in range(k):
                coef = base ** (k - 1 - j)
                total = total + F.element_at(cs, (i + F.lit(j + 1)).cast("int")) * F.lit(coef)
            return total

        return F.when(
            n_g > 0, F.transform(F.sequence(F.lit(0), n_g - 1), gram)
        ).otherwise(F.array().cast("array<bigint>"))

    return F.element_at(F.transform(F.array(codes), grams), 1)


def winnow_select(hashes: Column | str, w: int = 4) -> Column:
    """Winnowing selection (Schleimer, Wilkerson & Aiken, SIGMOD'03 — the
    MOSS fingerprint): the min k-gram hash of every ``w``-window of
    consecutive grams, deduplicated and sorted.

    Guarantee: two documents sharing any substring of length
    ``≥ w + k - 1`` characters share at least one selected fingerprint.

    The input array is LET-BOUND before the window scan:
    ``transform(array(hashes), h -> ...)`` materializes the (possibly
    expensive, O(m·k)) gram expression exactly once per row and binds it
    to a lambda variable, so every window's ``slice`` reads the
    materialized array.  Referencing the raw expression inside the window
    ``transform`` instead is an O(m²·k) trap: Catalyst's CollapseProject
    inlines a producer Project's expression into its consumers — including
    into lambda bodies — so the full gram array gets recomputed for every
    one of the m windows (measured: 60 short docs took 70 s interpreted;
    the let-bound form takes milliseconds).
    """
    hashes = F.col(hashes) if isinstance(hashes, str) else hashes

    def _sel(h: Column) -> Column:
        n_w = F.greatest(F.size(h) - F.lit(w - 1), F.lit(0))
        sel = F.transform(
            F.sequence(F.lit(1), n_w), lambda j: F.array_min(F.slice(h, j, w))
        )
        return F.when(n_w > 0, F.array_sort(F.array_distinct(sel))).otherwise(
            F.array().cast("array<bigint>")
        )

    return F.element_at(F.transform(F.array(hashes), _sel), 1)


def winnow_udf(k: int = 5, w: int = 4, base: int = 257):
    """Arrow-batched vectorized winnowing — the 100 TB engine for
    :func:`verde_spark.operators.dedup.winnow_fingerprints(engine="arrow")`.

    Returns a ``pandas_udf(text) -> array<bigint>`` computing EXACTLY the
    same fingerprint sets as ``winnow_select(kgram_hashes(...))``: same
    polynomial gram hash (codepoint · base^j, exact int64), same w-window
    min selection, distinct + sorted.  All per-document work is NumPy —
    codepoints via a single UTF-32 reinterpret (``ord`` of every char at C
    speed), gram hashes and window minima via ``sliding_window_view``, the
    distinct+sort via ``np.unique`` — measured ~30× the interpreted-
    Catalyst path (38 vs 1.4 Mchar/s warm at local[8] on ~6 kchar docs;
    the gap widens with document length as fixed per-row costs wash out).
    The
    Catalyst path stays the default because it needs no Python workers and
    a DuckDB oracle can replay it; tests assert the two engines are
    bit-identical.

    Unicode note: codepoints come from Python's UTF-32 encoding and
    lower-casing from ``str.lower()`` — identical to Spark's
    ``ascii``/``lower`` for ASCII and for the overwhelmingly common BMP
    cases; exotic locale-sensitive case foldings may differ between the
    engines (both remain self-consistent, which is what dedup needs).
    """
    import numpy as np
    import pandas as pd
    from numpy.lib.stride_tricks import sliding_window_view
    from pyspark.sql.functions import pandas_udf
    from pyspark.sql.types import ArrayType, LongType

    coefs = np.array([base ** (k - 1 - j) for j in range(k)], dtype=np.int64)

    def one(text) -> list:
        if text is None:
            return []
        s = text.lower()
        if len(s) < k:
            return []
        codes = np.frombuffer(s.encode("utf-32-le"), dtype=np.uint32).astype(np.int64)
        grams = sliding_window_view(codes, k) @ coefs
        if grams.size < w:
            return []
        mins = sliding_window_view(grams, w).min(axis=1)
        return np.unique(mins).tolist()

    # no annotations: this module uses `from __future__ import annotations`,
    # which stringifies hints and breaks pandas_udf's eval-type inference
    @pandas_udf(ArrayType(LongType()))
    def _winnow(texts):
        return texts.map(one)

    return _winnow


def shingles(text: Column | str = "text", n: int = 3) -> Column:
    """Array of word n-gram shingle hashes (for MinHash/Jaccard dedup).

    ``split`` → ``transform(sequence)`` over sliding windows → xxhash64 of
    the joined n-gram. Pure Catalyst; yields an empty array for texts
    shorter than n words.

    The word array is let-bound (same trick as :func:`winnow_select`):
    interpreted Catalyst has no common-subexpression elimination, so an
    ``element_at(split(...), i)`` inside the window lambda re-runs the
    full O(m) split per window per word — measured 0.05 Mchar/s
    (quadratic) vs linear after binding.
    """
    text = F.col(text) if isinstance(text, str) else text
    split_words = F.split(F.lower(F.trim(text)), r"\s+")

    def _grams(words: Column) -> Column:
        # Sliding windows as arrays_zip of n shifted slices — the inner
        # transform's lambda touches ONLY its own zip element.  Two reasons
        # over the index-and-element_at formulation: (1) it is ~1.7×
        # faster interpreted (no per-window element_at dispatch), and
        # (2) an inner lambda referencing the outer lambda variable more
        # than once hits a Spark internal error ("Cannot evaluate
        # expression") whenever the whole expression is an argument to a
        # pandas UDF (e.g. minhash_udf).  arrays_zip pads the shifted
        # slices with nulls, so the trailing (incomplete) windows are
        # sliced off; guard-free — slice(x, 1, 0) = [] keeps short/empty
        # texts at an empty gram array.  NULL text propagates to a NULL
        # gram array (not [] — the pre-rewrite CASE WHEN form returned []
        # there): downstream minhash/simhash/near-dup stages treat NULL
        # as "no candidacy", which is the wanted semantics for null docs
        # (an [] would give every null-text doc the same all-sentinel
        # signature and pair them as near-dups).  Regression-pinned in
        # test_webscale.py::test_shingles_null_text.
        big = F.size(words)
        cols = [
            F.slice(words, j + 1, F.greatest(big - j, F.lit(0))).alias(f"w{j}")
            for j in range(n)
        ]
        grams = F.transform(
            F.arrays_zip(*cols),
            lambda e: F.xxhash64(F.concat_ws(" ", *[e[f"w{j}"] for j in range(n)])),
        )
        return F.slice(grams, 1, F.greatest(big - F.lit(n - 1), F.lit(0)))

    return F.element_at(F.transform(F.array(split_words), _grams), 1)
