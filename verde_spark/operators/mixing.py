"""Corpus mixing — the "data recipe" stage of a training pipeline:
rebalance a corpus to target group proportions (languages, sources,
domains) and upsample groups by fractional epoch weights (the public
LLaMA/GPT-3 recipe shape: e.g. wiki ×2.4 means every wiki doc appears
twice and 40% of them a third time).

Both operators are deterministic by construction — selection and the
fractional-repeat decision come from an arithmetic hash of the id
(Knuth multiplicative, portable to any SQL engine), never from ``rand()``
— so the same corpus yields the same mix at any parallelism, and a DuckDB
twin replays them exactly.

Scale shapes:

* :func:`sample_to_mix` — ONE count aggregate (tiny result, collected:
  one row per group) to size the quotas, then ONE hash-partition window
  (`row_number` per group over the hash order) + a literal quota filter.
  A single shuffle of the surviving columns; quotas are literals, so no
  join.
* :func:`repeat_weighted` — ZERO shuffles: copies = a per-row
  ``explode(sequence(...))`` whose length is ``floor(e)`` plus a
  hash-thresholded extra — a pure projection at any corpus size.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F
from pyspark.sql.window import Window

__all__ = [
    "mix_hash_expr",
    "sample_to_mix",
    "repeat_weighted",
    "repeat_weighted_sql",
    "sample_to_mix_sql",
    "perplexity_buckets",
    "perplexity_buckets_sql",
    "temperature_targets",
    "temperature_mix",
    "temperature_mix_sql",
]

_HASH_MULT = 2654435761
_HASH_MOD = 2**31


def mix_hash_expr(id_col: Column | str) -> Column:
    """Portable deterministic pseudo-uniform int in [0, 2^31) from a
    NUMERIC id: ``((id mod 2^31) · 2654435761) mod 2^31`` (reduced before
    the multiply so 64-bit hash ids cannot overflow the checked multiply)."""
    i = F.col(id_col) if isinstance(id_col, str) else id_col
    return F.pmod(
        F.pmod(i.cast("long"), F.lit(_HASH_MOD)) * F.lit(_HASH_MULT),
        F.lit(_HASH_MOD),
    )


def _hash_sql(id_col: str) -> str:
    return (
        f"(((({id_col} % {_HASH_MOD}) + {_HASH_MOD}) % {_HASH_MOD})"
        f" * {_HASH_MULT}) % {_HASH_MOD}"
    )


#: second multiplier (xxhash PRIME32_2) for decisions that must be
#: INDEPENDENT of the rank hash above.  NOT the rank hash applied twice:
#: i·A² mod 2^31 is itself a linear-congruential hash whose small-value
#: prefix (exactly what quota ranking selects) maps to a badly-skewed
#: subset — measured 1.3% instead of 50% threshold share.  A distinct
#: odd multiplier over the ORIGINAL id is empirically uniform on ranked
#: prefixes (verified over seq/random ids at quota fractions 2%-80%).
_HASH_MULT2 = 2246822519


def repeat_hash_expr(id_col: Column | str) -> Column:
    """Deterministic pseudo-uniform int in [0, 2^31), independent of
    :func:`mix_hash_expr` — for per-id decisions (fractional-epoch
    repeats) that compose with quota ranking."""
    i = F.col(id_col) if isinstance(id_col, str) else id_col
    return F.pmod(
        F.pmod(i.cast("long"), F.lit(_HASH_MOD)) * F.lit(_HASH_MULT2),
        F.lit(_HASH_MOD),
    )


def _hash2_sql(id_col: str) -> str:
    return (
        f"(((({id_col} % {_HASH_MOD}) + {_HASH_MOD}) % {_HASH_MOD})"
        f" * {_HASH_MULT2}) % {_HASH_MOD}"
    )


def sample_to_mix(
    df: DataFrame,
    group_col: str,
    targets: dict[str, float],
    total: int,
    *,
    id_col: str,
    counts: dict | None = None,
) -> DataFrame:
    """Downsample to a target mix: keep ``floor(targets[g] · total)``
    rows of group *g* (clamped to the group's population; groups not in
    *targets* are dropped), chosen as the group's smallest-hash rows with
    id tiebreak — reproducible at any parallelism.

    One tiny count aggregate (collected — one row per group) sizes the
    quotas; one window ranks within groups.  Raises if *targets* don't
    sum to ≤ 1 + 1e-9.  Pass *counts* (a ``{group: n}`` dict) to reuse
    group counts already collected upstream and skip the count job.
    """
    if not targets:
        raise ValueError("targets must be non-empty")
    s = sum(targets.values())
    if s > 1.0 + 1e-9:
        raise ValueError(f"targets sum to {s} > 1")
    if counts is None:
        counts = {
            r["g"]: r["n"]
            for r in df.groupBy(F.col(group_col).alias("g"))
            .agg(F.count(F.lit(1)).alias("n"))
            .collect()
        }
    quotas = {
        g: min(int(frac * total), counts.get(g, 0))
        for g, frac in targets.items()
    }
    w = Window.partitionBy(group_col).orderBy(
        mix_hash_expr(id_col), F.col(id_col)
    )
    quota_expr = None
    for g, q in quotas.items():
        cond = F.col(group_col) == F.lit(g)
        quota_expr = (
            F.when(cond, F.lit(q))
            if quota_expr is None
            else quota_expr.when(cond, F.lit(q))
        )
    quota_expr = quota_expr.otherwise(F.lit(0))
    return (
        df.withColumn("__rk", F.row_number().over(w))
        .filter(F.col("__rk") <= quota_expr)
        .drop("__rk")
    )


def sample_to_mix_sql(
    src_sql: str,
    group_col: str,
    targets: dict[str, float],
    total: int,
    *,
    id_col: str,
    select_cols: str,
) -> str:
    """DuckDB twin of :func:`sample_to_mix` over the rows of *src_sql*."""
    # quotas need the same count-then-clamp; replay it in SQL
    when = " ".join(
        f"WHEN '{g}' THEN least(CAST(floor({frac!r} * {total}) AS BIGINT), grp_n)"
        for g, frac in targets.items()
    )
    return f"""
        WITH src AS ({src_sql}),
        cnt AS (
          SELECT {group_col} AS g, count(*) AS grp_n FROM src GROUP BY 1
        ),
        ranked AS (
          SELECT src.*, cnt.grp_n,
                 row_number() OVER (
                   PARTITION BY src.{group_col}
                   ORDER BY {_hash_sql(f"src.{id_col}")}, src.{id_col}
                 ) AS rk
          FROM src JOIN cnt ON cnt.g = src.{group_col}
        )
        SELECT {select_cols} FROM ranked
        WHERE rk <= (CASE {group_col} {when} ELSE 0 END)
    """


def temperature_targets(counts: dict, alpha: float = 0.3) -> dict[str, float]:
    """Temperature / α-sampling target shares (Lample & Conneau 2019
    §3.1, the multilingual-LM rebalancing rule): group *g* gets share
    ``(n_g/N)^α / Σ_h (n_h/N)^α``.  α=1 preserves the natural mix, α=0
    makes it uniform; the standard low-resource boost is α≈0.3.  Pure
    driver float64 arithmetic on the (tiny) group-count dict, evaluated
    in SORTED group order so the normalizer's float left-fold is
    bit-reproducible — :func:`temperature_mix_sql` replays the identical
    arithmetic (libm ``pow``, ordered ``list_reduce`` fold) in DuckDB."""
    if alpha < 0:
        raise ValueError("alpha must be >= 0")
    n = sum(counts.values())
    if n <= 0:
        raise ValueError("counts must contain at least one positive group")
    p = {g: (counts[g] / n) ** alpha for g in sorted(counts) if counts[g] > 0}
    z = sum(p.values())
    return {g: v / z for g, v in p.items()}


def temperature_mix(
    df: DataFrame,
    group_col: str,
    total: int,
    *,
    alpha: float = 0.3,
    id_col: str,
) -> DataFrame:
    """Rebalance to the α-sampling mix: one count aggregate sizes the
    (tiny) group-count dict, :func:`temperature_targets` turns it into
    shares, :func:`sample_to_mix` applies them — same two-job shape as
    a manual-targets mix (count agg + ONE hash-partition window), same
    determinism (arithmetic id hash, reproducible at any parallelism).

    Quotas clamp to each group's population (a low-resource group whose
    boosted share exceeds its size keeps every row); pair with
    :func:`repeat_weighted` when the recipe calls for genuine
    upsampling instead of a capped draw.  NULL-group rows are excluded
    from both the counts and the output (both engines agree: a NULL key
    never equi-joins / never matches a CASE arm).
    """
    counts = {
        r["g"]: r["n"]
        for r in df.filter(F.col(group_col).isNotNull())
        .groupBy(F.col(group_col).alias("g"))
        .agg(F.count(F.lit(1)).alias("n"))
        .collect()
    }
    targets = temperature_targets(counts, alpha)
    return sample_to_mix(
        df, group_col, targets, total, id_col=id_col, counts=counts
    )


def temperature_mix_sql(
    src_sql: str,
    group_col: str,
    total: int,
    *,
    alpha: float = 0.3,
    id_col: str,
    select_cols: str,
) -> str:
    """DuckDB twin of :func:`temperature_mix` — the quota derivation is
    replayed IN SQL (not passed as literals): counts → ``pow(n_g/N, α)``
    → normalizer as an ordered ``list_reduce`` left-fold (bit-matching
    Python's ``sum`` over sorted groups) → ``floor(share·total)`` clamped
    to the population — then the same smallest-hash window selection as
    :func:`sample_to_mix_sql`."""
    return f"""
        WITH src AS ({src_sql}),
        cnt AS (
          SELECT {group_col} AS g, CAST(count(*) AS BIGINT) AS grp_n
          FROM src WHERE {group_col} IS NOT NULL GROUP BY 1
        ),
        p AS (
          SELECT g, grp_n,
                 pow(CAST(grp_n AS DOUBLE)
                     / CAST((SELECT sum(grp_n) FROM cnt) AS DOUBLE),
                     {alpha!r}) AS pg
          FROM cnt
        ),
        z AS (
          SELECT list_reduce(
                   list_prepend(CAST(0 AS DOUBLE), list(pg ORDER BY g)),
                   (x, y) -> x + y) AS z
          FROM p
        ),
        quota AS (
          SELECT g,
                 least(CAST(floor(pg / (SELECT z FROM z) * {total})
                            AS BIGINT), grp_n) AS q
          FROM p
        ),
        ranked AS (
          SELECT src.*, quota.q,
                 row_number() OVER (
                   PARTITION BY src.{group_col}
                   ORDER BY {_hash_sql(f"src.{id_col}")}, src.{id_col}
                 ) AS rk
          FROM src JOIN quota ON quota.g = src.{group_col}
        )
        SELECT {select_cols} FROM ranked WHERE rk <= q
    """


def repeat_weighted(
    df: DataFrame,
    group_col: str,
    epochs: dict[str, float],
    *,
    id_col: str,
    default_epochs: float = 1.0,
) -> DataFrame:
    """Fractional-epoch upsampling: group *g* rows appear
    ``floor(epochs[g])`` times, plus once more for the deterministic
    ``frac(epochs[g])`` share of ids (hash-thresholded — the SAME ids
    every run).  Adds an ``epoch`` column (1-based copy index).

    The threshold hash (:func:`repeat_hash_expr`, a second multiplier)
    is INDEPENDENT of the hash :func:`sample_to_mix` /
    ``temperature_mix`` RANK on.  Those keep the q smallest-hash ids
    per group, so reusing the rank hash here would give survivors of a
    tight quota a ~100% extra-copy share instead of ``frac`` — the
    exact composition the docstrings recommend.

    A pure projection (``explode(sequence(...))``) — zero shuffles at any
    corpus size; downstream packing/shuffling treats copies as rows.
    """
    if any(e < 0 for e in epochs.values()) or default_epochs < 0:
        raise ValueError("epochs must be >= 0")
    h = repeat_hash_expr(id_col).cast("double") / F.lit(float(_HASH_MOD))

    n_copies = None
    for g, e in epochs.items():
        base, frac = int(e), e - int(e)
        expr = F.lit(base) + (h < F.lit(frac)).cast("int")
        cond = F.col(group_col) == F.lit(g)
        n_copies = (
            F.when(cond, expr) if n_copies is None else n_copies.when(cond, expr)
        )
    de_base, de_frac = int(default_epochs), default_epochs - int(default_epochs)
    default_expr = F.lit(de_base) + (h < F.lit(de_frac)).cast("int")
    n_copies = (
        default_expr if n_copies is None else n_copies.otherwise(default_expr)
    )
    return df.withColumn("__n", n_copies).filter(F.col("__n") > 0).select(
        "*", F.explode(F.sequence(F.lit(1), F.col("__n"))).alias("epoch")
    ).drop("__n")


def repeat_weighted_sql(
    src_sql: str,
    group_col: str,
    epochs: dict[str, float],
    *,
    id_col: str,
    select_cols: str,
    default_epochs: float = 1.0,
) -> str:
    """DuckDB twin of :func:`repeat_weighted` (independent second-
    multiplier hash — see the Spark docstring)."""
    h = f"(CAST(({_hash2_sql(id_col)}) AS DOUBLE) / {float(_HASH_MOD)!r})"

    def copies(e: float) -> str:
        base, frac = int(e), e - int(e)
        return f"({base} + (CASE WHEN {h} < {frac!r} THEN 1 ELSE 0 END))"

    when = " ".join(
        f"WHEN '{g}' THEN {copies(e)}" for g, e in epochs.items()
    )
    n = f"(CASE {group_col} {when} ELSE {copies(default_epochs)} END)"
    return f"""
        WITH src AS ({src_sql}),
        n_tbl AS (SELECT *, {n} AS n FROM src)
        SELECT {select_cols}, CAST(unnest(range(1, n + 1)) AS BIGINT) AS epoch
        FROM n_tbl WHERE n > 0
    """


def _bucket_names(n_buckets: int):
    return (
        ("head", "middle", "tail")
        if n_buckets == 3
        else tuple(f"b{i}" for i in range(1, n_buckets + 1))
    )


def perplexity_buckets(
    df: DataFrame,
    *,
    lm=None,
    text_col: str = "text",
    lang_col: str | None = None,
    id_col: str = "url",
    n_buckets: int = 3,
    mode: str = "threshold",
    score_col: str = "lm_score",
    scorer: str = "char",
) -> DataFrame:
    """CCNet-style perplexity bucketing (Wenzek et al. 2020): split a
    corpus into head/middle/tail quality tertiles per language by the
    char-LM score (``functions.charlm`` — avg log-probability per bigram;
    HIGHER = more prose-like = lower perplexity).  CCNet trains on the
    head, mixes in the middle, drops the tail.

    Two modes:

    * ``mode="threshold"`` (default — the 100 TB path): per-language
      bucket thresholds from ONE ``percentile_approx`` sketch aggregate
      (map-side-combinable, tiny result) broadcast back as a join — the
      corpus is never globally sorted; scoring + bucketing stay one
      projection.
    * ``mode="rank"`` — exact equal-population ``ntile`` per language
      (one window sort per language partition).  Integer-exact and
      engine-portable (the driver-oracle mode; at production scale
      prefer ``threshold``).

    Documents the LM cannot score (fewer than 2 alphabet chars) sort
    after every scored document (``DESC NULLS LAST`` — both modes place
    them in the last bucket when quotas allow).  Output adds
    ``score_col`` (bit-identical across engines: literal-fold logprob /
    integer gram count), ``bucket`` (1 = head) and ``bucket_name``.

    ``scorer`` picks the LM family: ``"char"`` (default — the
    dependency-free char-bigram model) or ``"word"`` (word-bigram with
    stupid backoff, :mod:`verde_spark.functions.wordlm` — the closer
    match to CCNet's word-level KenLM).  Both score as a zero-shuffle
    literal-fold projection; *lm* then takes a :class:`CharLM` /
    :class:`WordLM` respectively (defaults: the embedded English models).
    """
    if n_buckets < 2:
        raise ValueError(f"n_buckets must be >= 2, got {n_buckets!r}")
    # one let-bound projection per scorer: the gram/key array feeds both
    # the fold and the divisor (two independent expression trees would
    # normalize + tokenize every document twice in the hot scoring
    # projection — interpreted Catalyst has no CSE)
    if scorer == "char":
        from ..functions.charlm import ENGLISH_LM, avg_logprob_expr

        model = lm if lm is not None else ENGLISH_LM
        score = avg_logprob_expr(model, text_col)
    elif scorer == "word":
        from ..functions.wordlm import ENGLISH_WORD_LM, word_avg_logprob_expr

        model = lm if lm is not None else ENGLISH_WORD_LM
        score = word_avg_logprob_expr(model, text_col)
    else:
        raise ValueError(f"unknown scorer: {scorer!r}")
    scored = df.withColumn(score_col, score)
    names = _bucket_names(n_buckets)
    name_expr = None
    for i, nm in enumerate(names, start=1):
        cond = F.col("bucket") == F.lit(i)
        name_expr = (
            F.when(cond, F.lit(nm))
            if name_expr is None
            else name_expr.when(cond, F.lit(nm))
        )

    if mode == "rank":
        order = [F.col(score_col).desc_nulls_last(), F.col(id_col).asc()]
        w = (
            Window.partitionBy(lang_col).orderBy(*order)
            if lang_col
            else Window.partitionBy().orderBy(*order)
        )
        return scored.withColumn(
            "bucket", F.ntile(n_buckets).over(w)
        ).withColumn("bucket_name", name_expr)
    if mode != "threshold":
        raise ValueError(f"unknown mode: {mode!r}")

    probs = [i / n_buckets for i in range(1, n_buckets)]  # ascending
    if lang_col:
        qdf = scored.groupBy(lang_col).agg(
            F.percentile_approx(score_col, probs).alias("__qs")
        )
        joined = scored.join(F.broadcast(qdf), lang_col, "left")
    else:
        qdf = scored.agg(F.percentile_approx(score_col, probs).alias("__qs"))
        joined = scored.crossJoin(F.broadcast(qdf))  # 1-row broadcast
    # ascending quantiles q_1..q_{n-1}; bucket 1 (head) = top share:
    # score >= q_{n-1} -> 1, >= q_{n-2} -> 2, ...; null/below-all -> n
    bucket = None
    for i in range(1, n_buckets):
        cond = F.col(score_col) >= F.element_at(F.col("__qs"), n_buckets - i)
        bucket = F.when(cond, F.lit(i)) if bucket is None else bucket.when(cond, F.lit(i))
    bucket = bucket.otherwise(F.lit(n_buckets))
    return (
        joined.withColumn("bucket", bucket)
        .withColumn("bucket_name", name_expr)
        .drop("__qs")
    )


def perplexity_buckets_sql(
    src_sql: str,
    *,
    lm=None,
    text_col: str = "text",
    lang_col: str | None = None,
    id_col: str = "url",
    n_buckets: int = 3,
    select_cols: str | None = None,
    score_col: str = "lm_score",
    scorer: str = "char",
) -> str:
    """DuckDB twin of :func:`perplexity_buckets` ``mode="rank"`` — the
    same bit-identical literal-fold score (``charlm_logprob_sql`` /
    ``wordlm.word_logprob_sql``), the same ``DESC NULLS LAST`` order and
    ``ntile`` semantics."""
    from ..functions.charlm import ENGLISH_LM, charlm_logprob_sql, charlm_norm_sql

    part = f"PARTITION BY {lang_col} " if lang_col else ""
    cols = select_cols or (f"{id_col}, {lang_col}" if lang_col else id_col)
    names = _bucket_names(n_buckets)
    when = " ".join(f"WHEN {i} THEN '{nm}'" for i, nm in enumerate(names, 1))
    # only the scored CTE differs per scorer family; the ntile tail is
    # shared so the bucket-window semantics (DESC NULLS LAST, id ASC
    # tiebreak) cannot drift between the engine twins
    if scorer == "word":
        from ..functions.wordlm import (
            ENGLISH_WORD_LM,
            _words_sql,
            word_logprob_sql,
            word_norm_sql,
        )

        model = lm if lm is not None else ENGLISH_WORD_LM
        n_pairs = f"length({_words_sql(word_norm_sql(text_col))}) - 1"
        ctes = f"""
        scored AS (
          SELECT *, CASE WHEN {n_pairs} >= 1 THEN
                   ({word_logprob_sql(model, text_col)})
                     / CAST({n_pairs} AS DOUBLE)
                 ELSE NULL END AS {score_col}
          FROM src
        )"""
    elif scorer == "char":
        model = lm if lm is not None else ENGLISH_LM
        ctes = f"""
        norm AS (
          SELECT *, {charlm_norm_sql(text_col)} AS __t FROM src
        ),
        scored AS (
          SELECT *, CASE WHEN length(__t) >= 2 THEN
                   ({charlm_logprob_sql(model, "__t")})
                     / CAST(length(__t) - 1 AS DOUBLE)
                 ELSE NULL END AS {score_col}
          FROM norm
        )"""
    else:
        raise ValueError(f"unknown scorer: {scorer!r}")
    return f"""
        WITH src AS ({src_sql}),{ctes}
        SELECT {cols}, {score_col},
               ntile({n_buckets}) OVER (
                 {part}ORDER BY {score_col} DESC NULLS LAST, {id_col} ASC
               ) AS bucket,
               CASE ntile({n_buckets}) OVER (
                 {part}ORDER BY {score_col} DESC NULLS LAST, {id_col} ASC
               ) {when} END AS bucket_name
        FROM scored
    """
