"""Char-n-gram language identification — CLD/langid.py-style profile
scoring (Cavnar & Trenkle 1994 n-gram categorization; public technique).

``text.lang_id_expr`` is a 5-language function-word marker argmax —
fine as a smoke heuristic, weak on short or marker-free text.  This
module is the trainable upgrade: one character-BIGRAM profile per
language (an add-one-smoothed :class:`~verde_spark.functions.charlm.
CharLM` trained on that language's clean text), classification =
argmax over the per-language total log-probability of the document's
bigrams.  Accents are folded to base letters FIRST (the 1:1 codepoint
table from :mod:`verde_spark.functions.normalize`), so é/ü/ñ text
still lands on the 27-symbol alphabet while keeping each language's
characteristic letter-pair distribution.

Engine discipline (the charlm one, inherited wholesale):

* **Scoring** is a pure Catalyst projection: ONE accent ``translate``,
  one gram-id array, then L serial literal folds (one per language) and
  a ``greatest``-based argmax — zero shuffle, zero Python, rides the
  scan at any corpus size.  Every fold adds Python-computed float64
  literals in document order, so DuckDB (:func:`lang_id_ngram_sql`) and
  the Python twin (:func:`reference_lang_id`) reproduce every score —
  and therefore the argmax — BIT-FOR-BIT.
* **Training** (:func:`train_lang_profiles`): ONE
  ``explode → groupBy(lang, gram)`` aggregate; map-side partials bound
  the exchange at ≤ 729·L rows at any corpus size.  Counts are
  integers → exactly reproducible at any parallelism.

Ties break on language code ascending (a total order, engine-portable
because the compared sums are bit-identical).  Documents with fewer
than *min_grams* bigrams return ``'und'`` — too short to call.

``PROFILES`` are trained at import on embedded original seed prose
(written for this repository — no external data), one paragraph per
language: en, de, es, fr, pt — the same five the marker heuristic
covers, so the fixtures compose.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

from .charlm import CharLM, _gram_ids, charlm_logprob_sql, logprob_expr, reference_logprob
from .normalize import _ACCENTS

__all__ = [
    "LANG_SEEDS",
    "PROFILES",
    "train_lang_profiles",
    "langid_fold_expr",
    "lang_id_ngram_expr",
    "lang_id_ngram_udf",
    "langid_norm_sql",
    "lang_id_ngram_sql",
    "reference_lang_id",
]

#: original seed prose per language (written for this repo; ~0.5 kB each
#: is plenty for a 729-cell bigram profile)
LANG_SEEDS: dict[str, str] = {
    "en": (
        "every morning the town wakes slowly and the baker opens her door "
        "before the light reaches the square people walk to work along the "
        "river and talk about the news and the weather children carry books "
        "to school and the old men play cards under the trees by noon the "
        "streets are full of voices and the smell of bread and coffee in "
        "the evening families gather around the table to share what the day "
        "brought and to plan the one that follows nothing here is hurried "
        "and nothing is wasted the language of the town is plain and steady "
        "like the water that moves under the stone bridge"
    ),
    "de": (
        "jeden morgen erwacht die stadt langsam und die bäckerin öffnet "
        "ihre tür bevor das licht den platz erreicht die leute gehen am "
        "fluss entlang zur arbeit und sprechen über die nachrichten und das "
        "wetter die kinder tragen bücher zur schule und die alten männer "
        "spielen karten unter den bäumen gegen mittag sind die straßen "
        "voller stimmen und es riecht nach brot und kaffee am abend sitzen "
        "die familien um den tisch und erzählen was der tag gebracht hat "
        "und planen den nächsten nichts ist hier eilig und nichts wird "
        "verschwendet die sprache der stadt ist einfach und ruhig wie das "
        "wasser das unter der steinernen brücke fließt"
    ),
    "es": (
        "cada mañana la ciudad despierta despacio y la panadera abre su "
        "puerta antes de que la luz llegue a la plaza la gente camina al "
        "trabajo junto al río y habla de las noticias y del tiempo los "
        "niños llevan libros a la escuela y los viejos juegan a las cartas "
        "bajo los árboles al mediodía las calles están llenas de voces y "
        "del olor del pan y del café por la tarde las familias se reúnen "
        "alrededor de la mesa para compartir lo que trajo el día y para "
        "pensar en el que viene aquí nada tiene prisa y nada se pierde la "
        "lengua de la ciudad es sencilla y firme como el agua que corre "
        "bajo el puente de piedra"
    ),
    "fr": (
        "chaque matin la ville se réveille lentement et la boulangère "
        "ouvre sa porte avant que la lumière atteigne la place les gens "
        "marchent au travail le long de la rivière et parlent des "
        "nouvelles et du temps les enfants portent des livres à l'école et "
        "les vieux jouent aux cartes sous les arbres à midi les rues sont "
        "pleines de voix et de l'odeur du pain et du café le soir les "
        "familles se retrouvent autour de la table pour partager ce que la "
        "journée a apporté et préparer celle qui vient ici rien ne presse "
        "et rien ne se perd la langue de la ville est simple et calme "
        "comme l'eau qui passe sous le pont de pierre"
    ),
    "pt": (
        "todas as manhãs a cidade acorda devagar e a padeira abre a sua "
        "porta antes que a luz chegue à praça as pessoas caminham para o "
        "trabalho ao longo do rio e falam das notícias e do tempo as "
        "crianças levam livros para a escola e os velhos jogam cartas "
        "debaixo das árvores ao meio dia as ruas estão cheias de vozes e "
        "do cheiro do pão e do café à noite as famílias reúnem se à volta "
        "da mesa para partilhar o que o dia trouxe e pensar no que vem "
        "aqui nada tem pressa e nada se perde a língua da cidade é "
        "simples e firme como a água que corre debaixo da ponte de pedra"
    ),
}

# accent fold: both cases of every accented Latin letter → lowercase base
# (the disjoint 1:1 section of normalize.CHAR_MAP — identical codepoint
# semantics in Spark translate / DuckDB translate / str.translate)
_ACC_SRC = "".join(_ACCENTS)
_ACC_DST = "".join(_ACCENTS.values())
_ACC_TABLE = {ord(s): d for s, d in _ACCENTS.items()}


def _norm(s: str) -> str:
    """Python twin of the langid normalization: accent fold → the charlm
    alphabet (lower, non-a-z → space)."""
    return (s or "").translate(_ACC_TABLE)


def _train_profile(text: str) -> CharLM:
    counts: dict[int, int] = {}
    for g in _gram_ids(_norm(text)):
        counts[g] = counts.get(g, 0) + 1
    return CharLM.from_counts(counts)


#: fixed per-language bigram profiles (code constants → oracle SQL can
#: embed identical literals)
PROFILES: dict[str, CharLM] = {
    lang: _train_profile(seed) for lang, seed in LANG_SEEDS.items()
}


def _translated(text: Column | str) -> Column:
    col = F.col(text) if isinstance(text, str) else text
    return F.translate(col, _ACC_SRC, _ACC_DST)


def langid_fold_expr(lm: CharLM, text: Column | str = "text") -> Column:
    """Total bigram log-probability of the ACCENT-FOLDED text under one
    language profile (charlm's bit-identical serial literal fold)."""
    return logprob_expr(lm, _translated(text))


def lang_id_ngram_expr(
    text: Column | str = "text",
    profiles: dict[str, CharLM] | None = None,
    min_grams: int = 8,
) -> Column:
    """Predicted language code: argmax of the per-language profile
    scores; ``'und'`` when the document has fewer than *min_grams*
    ALPHABET LETTERS (a-z after the accent fold — space-only/digit-only
    text produces space-space bigrams, which carry no language signal,
    so the guard counts letters, not grams).  Ties break on language
    code ascending.

    One projection: the L folds share one gram alphabet and compare as
    bit-identical float64 sums, so the argmax is engine-portable.
    """
    from .charlm import gram_ids_expr

    profs = profiles if profiles is not None else PROFILES
    if not profs:
        raise ValueError("profiles must be non-empty")
    langs = sorted(profs)
    t = _translated(text)
    n = F.length(F.regexp_replace(F.lower(t), "[^a-z]", ""))
    tables = [
        F.array(*[F.lit(float(v)) for v in profs[lang].logp])
        for lang in langs
    ]

    # let-bind the gram array, then fold it ONCE per language into a
    # let-bound scores array (an earlier draft rebuilt each 729-literal
    # fold ~2x per language through greatest() + equality chains — the
    # duplicated serial folds dominated the projection cost)
    def _step(tb: Column):
        return lambda acc, gid: acc + F.element_at(tb, gid + F.lit(1))

    def scores(g: Column) -> Column:
        return F.array(*[
            F.when(
                F.size(g) > 0,
                F.aggregate(g, F.lit(0.0), _step(tb)),
            ).otherwise(F.lit(None).cast("double"))
            for tb in tables
        ])

    # argmax: array_position takes the FIRST index of the max — the
    # language-code-ascending tiebreak (langs is sorted); bit-identical
    # float64 sums make the winner engine-portable
    def pick(sarr: Column) -> Column:
        return F.element_at(
            F.array(*[F.lit(lang) for lang in langs]),
            F.array_position(sarr, F.array_max(sarr)).cast("int"),
        )

    scored = F.element_at(F.transform(F.array(gram_ids_expr(t)), scores), 1)
    pred = F.element_at(F.transform(F.array(scored), pick), 1)
    # too short (or NULL text: size(NULL)=NULL -> condition false) -> und
    return F.when(
        n >= F.lit(int(min_grams)), F.coalesce(pred, F.lit("und"))
    ).otherwise(F.lit("und"))


def lang_id_ngram_udf(
    profiles: dict[str, CharLM] | None = None, min_grams: int = 8
):
    """Arrow fast path for :func:`lang_id_ngram_expr` — language ID runs
    on EVERY page of a crawl, and Catalyst higher-order ``aggregate``
    folds evaluate interpreted per element (≈7k docs/s for 5 profiles on
    real document text), so the production path vectorizes: per document
    one utf-32 decode → alphabet ids → bigram ``bincount(729)``, then ONE
    ``counts @ logp`` matrix product scores ALL languages at once and
    ``argmax`` takes the first (= language-code ascending, *langs* is
    sorted) maximum.

    Same normalization (accent fold → lower → non-a-z → space), same
    grams, same tiebreak and short-doc rule as the expression; scores
    differ from the serial fold only in float64 summation order, so
    predictions can flip ONLY on sub-ulp near-ties — pytest pins
    prediction agreement on the fixture + fuzz corpus.  Keep
    :func:`lang_id_ngram_expr` as the cross-engine oracle.

    Usage: ``df.select(lang_id_ngram_udf()( "text"))``."""
    import numpy as np
    import pandas as pd
    from pyspark.sql.functions import pandas_udf

    profs = profiles if profiles is not None else PROFILES
    if not profs:
        raise ValueError("profiles must be non-empty")
    langs = sorted(profs)
    table = np.stack(
        [np.asarray(profs[lang].logp, dtype=np.float64) for lang in langs],
        axis=1,
    )  # 729 × L
    mg = int(min_grams)

    @pandas_udf("string")
    def _pred(s):  # (pd.Series) -> pd.Series; stringified hints confuse
        # the udf inspector under `from __future__ import annotations`
        out = np.full(len(s), "und", dtype=object)
        vals = s.to_numpy()
        for i in range(len(vals)):
            t = vals[i]
            if t is None or t is pd.NA or (isinstance(t, float)):
                continue
            tt = t.translate(_ACC_TABLE).lower()
            codes = np.frombuffer(
                tt.encode("utf-32-le"), dtype=np.uint32
            ).astype(np.int64)
            ids = codes - 96
            letters = (ids >= 1) & (ids <= 26)
            n_letters = int(letters.sum())
            if n_letters < mg or len(ids) < 2:
                continue
            ids = np.where(letters, ids, 0)
            grams = ids[:-1] * 27 + ids[1:]
            counts = np.bincount(grams, minlength=729).astype(np.float64)
            out[i] = langs[int(np.argmax(counts @ table))]
        return pd.Series(out, dtype=object)

    def apply(text: Column | str = "text") -> Column:
        return _pred(F.col(text) if isinstance(text, str) else text)

    return apply


def train_lang_profiles(
    df: DataFrame, lang_col: str = "lang", text_col: str = "text"
) -> dict[str, CharLM]:
    """Train per-language profiles from a LABELED corpus: ONE
    ``groupBy(lang, gram)`` integer aggregate (exchange ≤ 729·L rows at
    any corpus size), one bounded collect."""
    from .charlm import gram_ids_expr

    rows = (
        df.select(
            F.col(lang_col).alias("__lang"),
            F.explode(gram_ids_expr(_translated(text_col))).alias("gram"),
        )
        .groupBy("__lang", "gram")
        .agg(F.count(F.lit(1)).alias("c"))
        .collect()
    )
    by_lang: dict[str, dict[int, int]] = {}
    for r in rows:
        by_lang.setdefault(r["__lang"], {})[int(r["gram"])] = int(r["c"])
    return {lang: CharLM.from_counts(c) for lang, c in by_lang.items()}


# -- DuckDB twins ----------------------------------------------------------


def langid_norm_sql(col: str) -> str:
    """DuckDB twin of the langid normalization: accent translate (chr()
    concat literals — immune to quoting), then the charlm alphabet."""
    src = "concat(" + ", ".join(f"chr({ord(c)})" for c in _ACC_SRC) + ")"
    dst = "concat(" + ", ".join(f"chr({ord(c)})" for c in _ACC_DST) + ")"
    return (
        f"regexp_replace(lower(translate({col}, {src}, {dst})), "
        "'[^a-z]', ' ', 'g')"
    )


def lang_scores_sql(
    t_col: str, profiles: dict[str, CharLM] | None = None
) -> dict[str, str]:
    """Per-language fold expressions over an ALREADY-normalized column
    *t_col* — compute these ONCE in a CTE (each embeds 729 literals),
    then argmax with :func:`langid_argmax_sql` over the result columns."""
    profs = profiles if profiles is not None else PROFILES
    return {
        lang: f"({charlm_logprob_sql(profs[lang], t_col)})"
        for lang in sorted(profs)
    }


def langid_argmax_sql(
    score_cols: dict[str, str], t_col: str, min_grams: int = 8
) -> str:
    """Argmax over precomputed per-language score COLUMNS (language →
    column name), same tie-break and short-doc rule as
    :func:`lang_id_ngram_expr`.  *t_col* is the NORMALIZED text column
    (a-z + spaces only), so the letter count is its length with spaces
    removed."""
    langs = sorted(score_cols)
    cols = [score_cols[la] for la in langs]
    best = "greatest(" + ", ".join(cols) + ")" if len(cols) > 1 else cols[0]
    whens = " ".join(
        f"WHEN {score_cols[lang]} = {best} THEN '{lang}'" for lang in langs
    )
    n = f"length(replace({t_col}, ' ', ''))"
    return (
        f"CASE WHEN {n} >= {int(min_grams)} THEN "
        f"(CASE {whens} ELSE 'und' END) ELSE 'und' END"
    )


def lang_id_ngram_sql(
    src_sql: str,
    col: str = "text",
    profiles: dict[str, CharLM] | None = None,
    min_grams: int = 8,
    id_cols: str = "doc_id",
    out_col: str = "lang_pred",
) -> str:
    """Full DuckDB twin query of :func:`lang_id_ngram_expr` over the rows
    of *src_sql*: normalize once, fold each profile once (CTE columns),
    argmax — identical literals, folds and tie-break → identical
    predictions."""
    profs = profiles if profiles is not None else PROFILES
    folds = lang_scores_sql("__t", profs)
    score_sel = ", ".join(
        f"{folds[lang]} AS __s_{lang}" for lang in sorted(profs)
    )
    argmax = langid_argmax_sql(
        {lang: f"__s_{lang}" for lang in sorted(profs)}, "__t", min_grams
    )
    return f"""
        WITH src AS ({src_sql}),
        norm AS (
          SELECT *, {langid_norm_sql(col)} AS __t FROM src
        ),
        sc AS (
          SELECT *, {score_sel} FROM norm
        )
        SELECT {id_cols}, {argmax} AS {out_col} FROM sc
    """


def reference_lang_id(
    s: str | None,
    profiles: dict[str, CharLM] | None = None,
    min_grams: int = 8,
) -> str:
    """Pure-Python twin (same folds, same tie-break)."""
    profs = profiles if profiles is not None else PROFILES
    t = _norm(s)
    n_letters = sum("a" <= c <= "z" for c in t.lower())
    if n_letters < min_grams:
        return "und"
    scores = {
        lang: reference_logprob(lm, t) for lang, lm in sorted(profs.items())
    }
    # a gram-free doc that still passes a permissive min_grams guard
    # (min_grams <= 1 with a one-letter doc) scores None under every
    # profile — the Catalyst twin coalesces that to 'und', so must we
    if all(v is None for v in scores.values()):
        return "und"
    best = max(scores.values())
    for lang in sorted(scores):
        if scores[lang] == best:
            return lang
    return "und"
