"""Data Selection via Importance Resampling (DSIR) — select training
documents whose hashed-n-gram distribution looks like a small TARGET
corpus (Xie et al. 2023, "Data Selection via Importance Resampling",
NeurIPS; the technique behind domain-matched LM pretraining mixes).

Reference context: fatiando/verde has no data-selection layer; this
module exists for the webtext payload (BASELINE.json north rule),
alongside the quality gates (Gopher/C4/char-LM) it composes with —
those gate on ABSOLUTE quality, DSIR weights by RELATIVE closeness to
a target distribution.

Public method, re-expressed Spark-first (the paper's pipeline is a
NumPy/multiprocessing batch job over JSON shards):

1. **Features**: each document → bag of hashed word n-grams (unigrams +
   bigrams) in ``num_buckets`` buckets.  The bucket hash here is an
   EXACT mod-prime polynomial over codepoints (not xxhash) so a DuckDB
   oracle replays bucket ids bit-for-bit — same rationale as
   ``functions/text.kgram_hashes`` (text.py:576).
2. **Fit** (:func:`bucket_counts` / :func:`fit_dsir`): bucket unigram
   models of the target and raw corpora.  ONE ``explode → groupBy``
   per corpus — the key domain is ≤ ``num_buckets``, so after map-side
   partial aggregation the shuffle carries at most ``num_buckets`` rows
   per partition regardless of corpus size.  Counts are integers →
   exactly reproducible at any parallelism.  The two count vectors
   (≤ num_buckets rows each — a documented driver-side small side, same
   contract as the ANN probe sets) collapse to a Python float64
   log-ratio table ``log p_target[b] − log p_raw[b]`` (Laplace α).
3. **Score** (:meth:`DsirModel.weight_expr`): importance log-weight =
   serial left-fold adding log-ratio LITERALS in document gram order —
   a pure Catalyst projection, zero shuffle, and (because no ``ln`` is
   evaluated inside either engine) bit-identical under a twin replaying
   the same fold — the ``functions/charlm`` discipline.
4. **Resample** (:func:`dsir_resample`): Gumbel-top-k without
   replacement — key = weight + Gumbel(0,1) from a seeded hash of the
   id (deterministic, reproducible across runs and parallelism), top-k
   via ``orderBy.limit`` = TakeOrderedAndProject: per-partition heaps,
   no global sort, no shuffle of the corpus.

100 TB shape: fit = two bounded-key aggregations; score = projection;
resample = TakeOrderedAndProject.  Nothing collects document bodies;
the only driver-side data is the 2·num_buckets count rows.

Known property (faithful to the paper, not normalized away): the
log-weight is a SUM over gram occurrences, so longer documents score
more extremely in whichever direction their grams lean — compare
within similar-length strata or apply the length gates
(``passes_gopher``) first when mixing lengths.
"""

from __future__ import annotations

import math
import re
from dataclasses import dataclass, field

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

__all__ = [
    "DsirModel",
    "EXAMPLE_DSIR",
    "bucket_counts",
    "bucket_counts_sql",
    "dsir_bucket_ids",
    "dsir_bucket_ids_sql",
    "dsir_resample",
    "dsir_weight_udf",
    "hashed_bucket_fold_udf",
    "fit_dsir",
    "reference_bucket_ids",
    "reference_weight",
]

#: polynomial hash: h = (h·BASE + codepoint) mod MOD — MOD a Mersenne
#: prime < 2^31 keeps every intermediate ≤ (2^31)·257 + cp < 2^63 (exact
#: int64 in Spark, DuckDB and Python alike); BASE matches kgram_hashes
_HASH_BASE = 257
_HASH_MOD = 2147483647
#: default feature-space size (the paper uses 10^4; a power of two keeps
#: the final % cheap and the literal table plan-light)
_DEFAULT_BUCKETS = 4096
#: explicit ASCII whitespace class instead of \s: Java \s is
#: [ \t\n\x0B\f\r], RE2 \s omits \x0B, Python \s is full Unicode — the
#: explicit class is the ONLY spelling all three engines read identically
_WORD_SPLIT_RE = r"[ \t\n\x0b\f\r]+"


def _word_array(text: Column) -> Column:
    """lower/trim/split word array with empty tokens dropped (empty or
    whitespace-only text → empty array; NULL text → NULL)."""
    return F.filter(
        F.split(F.lower(F.trim(text)), _WORD_SPLIT_RE), lambda w: w != ""
    )


def _poly_bucket(s: Column, num_buckets: int) -> Column:
    """Exact mod-prime polynomial hash of a string → bucket id.  A
    serial fold over the codepoint array: integer-only, so every engine
    agrees bit-for-bit."""
    codes = F.transform(F.split(s, ""), lambda c: F.ascii(c).cast("bigint"))
    h = F.aggregate(
        codes,
        F.lit(0).cast("bigint"),
        lambda acc, c: (acc * _HASH_BASE + c) % _HASH_MOD,
    )
    return (h % num_buckets).cast("int")


def dsir_bucket_ids(
    text: Column | str = "text",
    num_buckets: int = _DEFAULT_BUCKETS,
    bigrams: bool = True,
) -> Column:
    """``array<int>`` of hashed n-gram bucket ids (unigrams, plus
    space-joined bigrams when *bigrams*), one per gram OCCURRENCE, in
    document order (unigrams first — the fold-order contract the twin
    replays).  Pure Catalyst projection.  NULL text → NULL.

    The word array is let-bound (the CollapseProject trap — see
    winnow_select, text.py:613): the split runs once per document, not
    once per gram.
    """
    t = (F.col(text) if isinstance(text, str) else text).cast("string")

    def _grams(words: Column) -> Column:
        uni = F.transform(words, lambda w: _poly_bucket(w, num_buckets))
        if not bigrams:
            return uni
        n = F.size(words)
        pairs = F.arrays_zip(
            F.slice(words, 1, F.greatest(n, F.lit(0))).alias("a"),
            F.slice(words, 2, F.greatest(n - 1, F.lit(0))).alias("b"),
        )
        bi = F.transform(
            F.slice(pairs, 1, F.greatest(n - 1, F.lit(0))),
            lambda e: _poly_bucket(
                F.concat_ws(" ", e["a"], e["b"]), num_buckets
            ),
        )
        return F.concat(uni, bi)

    return F.element_at(F.transform(F.array(_word_array(t)), _grams), 1)


def bucket_counts(
    df: DataFrame,
    text_col: str = "text",
    num_buckets: int = _DEFAULT_BUCKETS,
    bigrams: bool = True,
) -> DataFrame:
    """``(bucket int, cnt bigint)`` occurrence counts over a corpus —
    the model-fit aggregate.  Bounded key domain (≤ num_buckets), so the
    post-partial-agg shuffle is constant-size at any corpus scale.
    Buckets with zero occurrences are absent (Laplace smoothing fills
    them at log-ratio time)."""
    ids = dsir_bucket_ids(text_col, num_buckets, bigrams)
    return (
        df.select(F.explode(ids).alias("bucket"))
        .groupBy("bucket")
        .agg(F.count(F.lit(1)).alias("cnt"))
    )


@dataclass(frozen=True)
class DsirModel:
    """A fitted importance model: ``log_ratio[b] = log p_target[b] −
    log p_raw[b]`` (Python float64 — code-side, so twin engines embed
    the identical literals and never evaluate ``ln`` themselves)."""

    log_ratio: tuple = field(repr=False)
    num_buckets: int = _DEFAULT_BUCKETS
    bigrams: bool = True
    alpha: float = 1.0

    def weight_expr(self, text: Column | str = "text") -> Column:
        """Importance log-weight of a document: serial left-fold over
        the gram bucket ids adding log-ratio literals — bit-identical
        across engines replaying the same order.  NULL text → NULL."""
        table = F.lit(list(self.log_ratio))
        ids = dsir_bucket_ids(text, self.num_buckets, self.bigrams)
        return F.aggregate(
            ids,
            F.lit(0.0),
            lambda acc, b: acc + F.element_at(table, b + 1),
        )

    def weight_sql(self, col: str) -> str:
        """DuckDB twin of :meth:`weight_expr` — the same literals, the
        same fold order (state rides as a 1-field struct so the reduce
        is (struct, int) → struct; floats serialize via repr → exact
        shortest-round-trip float64, quoted per the DECIMAL-literal
        gotcha)."""
        lits = ", ".join(f"'{float(x)!r}'::DOUBLE" for x in self.log_ratio)
        ids = dsir_bucket_ids_sql(col, self.num_buckets, self.bigrams)
        folded = (
            f"list_reduce(list_prepend(0.0::DOUBLE, "
            f"list_transform({ids}, i -> ([{lits}])[i + 1])), "
            "(acc, x) -> acc + x)"
        )
        return f"CASE WHEN {col} IS NULL THEN NULL ELSE {folded} END"


def _log_probs(counts: dict, num_buckets: int, alpha: float) -> list:
    total = sum(counts.values())
    denom = math.log(total + alpha * num_buckets)
    return [
        math.log(counts.get(b, 0) + alpha) - denom for b in range(num_buckets)
    ]


def fit_dsir(
    target: DataFrame,
    raw: DataFrame,
    text_col: str = "text",
    num_buckets: int = _DEFAULT_BUCKETS,
    bigrams: bool = True,
    alpha: float = 1.0,
) -> DsirModel:
    """Fit the importance model from a target corpus and a raw-corpus
    sample.  Two bounded-key aggregations; the ONLY collected data is
    the two ≤ num_buckets count vectors (documented small side)."""
    tc = {
        r["bucket"]: r["cnt"]
        for r in bucket_counts(target, text_col, num_buckets, bigrams).collect()
    }
    rc = {
        r["bucket"]: r["cnt"]
        for r in bucket_counts(raw, text_col, num_buckets, bigrams).collect()
    }
    lt = _log_probs(tc, num_buckets, alpha)
    lr = _log_probs(rc, num_buckets, alpha)
    return DsirModel(
        log_ratio=tuple(a - b for a, b in zip(lt, lr)),
        num_buckets=num_buckets,
        bigrams=bigrams,
        alpha=alpha,
    )


def fit_dsir_python(
    target_texts: list,
    raw_texts: list,
    num_buckets: int = _DEFAULT_BUCKETS,
    bigrams: bool = True,
    alpha: float = 1.0,
) -> DsirModel:
    """Pure-Python fit over in-memory seed texts — for code-constant
    models (importable at module load, embeddable in static oracle SQL)
    and as the fit parity reference."""

    def _counts(texts: list) -> dict:
        out: dict = {}
        for t in texts:
            for b in reference_bucket_ids(t, num_buckets, bigrams) or []:
                out[b] = out.get(b, 0) + 1
        return out

    lt = _log_probs(_counts(target_texts), num_buckets, alpha)
    lr = _log_probs(_counts(raw_texts), num_buckets, alpha)
    return DsirModel(
        log_ratio=tuple(a - b for a, b in zip(lt, lr)),
        num_buckets=num_buckets,
        bigrams=bigrams,
        alpha=alpha,
    )


#: Gumbel noise resolution: u = (h mod 2^20 + 0.5) / 2^20 ∈ (0, 1)
_GUMBEL_RES = 1 << 20


def dsir_resample(
    df: DataFrame,
    model: DsirModel,
    k: int,
    text_col: str = "text",
    id_col: str = "doc_id",
    seed: int = 0,
    weight_col: str = "dsir_weight",
) -> DataFrame:
    """Gumbel-top-k importance resampling WITHOUT replacement (the
    paper's sampler, derandomized): key = log-weight + Gumbel(0,1)
    where the uniform comes from a seeded xxhash of the id — stable
    across runs, partitionings and cluster sizes.  ``orderBy.limit(k)``
    compiles to TakeOrderedAndProject (per-partition top-k heaps →
    driver merge of k·P rows): the corpus is never shuffled or globally
    sorted.  Rows with NULL text score NULL and are dropped."""
    w = model.weight_expr(text_col)
    u = (
        F.pmod(F.xxhash64(F.col(id_col), F.lit(seed)), F.lit(_GUMBEL_RES))
        .cast("double")
        + F.lit(0.5)
    ) / F.lit(float(_GUMBEL_RES))
    gumbel = -F.log(-F.log(u))
    # filter on the TEXT null (weight is NULL iff text is NULL): a
    # filter on the weight column would inline the whole fold expression
    # a second time into the Filter node (no CSE across operators)
    out = (
        df.filter(F.col(text_col).isNotNull())
        .withColumn(weight_col, w)
        .withColumn("__dsir_key", F.col(weight_col) + gumbel)
    )
    return (
        out.orderBy(F.col("__dsir_key").desc(), F.col(id_col))
        .limit(k)
        .drop("__dsir_key")
    )


def dsir_weight_udf(model: DsirModel):
    """Arrow fast path for :meth:`DsirModel.weight_expr` — a vectorized
    pandas UDF for hot pipelines (same model, same grams, same buckets;
    ulp-level diffs from summation order only — the charlm_logprob_udf
    discipline).  Usage: ``df.select(dsir_weight_udf(m)("text"))``.

    See :func:`hashed_bucket_fold_udf` for the vectorization shape; the
    quality classifier's Arrow path reuses the same kernel."""
    return hashed_bucket_fold_udf(
        model.log_ratio, model.num_buckets, model.bigrams, init=0.0
    )


def hashed_bucket_fold_udf(
    table, num_buckets: int, bigrams: bool, init: float = 0.0
):
    """Shared Arrow kernel: per document, ``init + Σ table[bucket_id]``
    over the DSIR hashed word-n-gram buckets — the vectorized twin of
    any serial literal fold over ``dsir_bucket_ids`` (DSIR weights:
    ``init=0``; quality logit: ``init=bias`` — both ulp-level vs their
    Catalyst folds, from summation order only).

    Vectorization shape (per Arrow batch, no per-gram Python):
    the batch's lowered texts join into ONE string (ws separator), one
    utf-32 encode gives the codepoint array, word spans come from the
    whitespace mask, per-LENGTH matrix gathers fold the polynomial hash
    in ``max_word_len`` vectorized steps, and bigram hashes derive from
    word hashes algebraically — ``poly(a + ' ' + b) = poly(a)·257^(|b|+1)
    + 32·257^|b| + poly(b) (mod M)`` — so bigrams cost one vector
    expression, not a re-hash.  Per-doc sums are two ``np.bincount``
    dots.  Everything stays int64-safe: h < 2^31, so h·257^1 terms stay
    under 2^63 via the per-step mod, and the bigram combine peaks at
    ~2^62."""
    import numpy as np
    import pandas as pd
    from pyspark.sql.functions import pandas_udf

    lr = np.asarray(table, dtype=np.float64)
    nb = int(num_buckets)
    init = float(init)
    ws_codes = np.array([0x20, 0x09, 0x0A, 0x0B, 0x0C, 0x0D], dtype=np.uint32)

    @pandas_udf("double")
    def _weights(s):  # (pd.Series) -> pd.Series; hints stringified by
        # `from __future__ import annotations` confuse the udf inspector
        notnull = s.notna().to_numpy()
        out = np.full(len(s), init, dtype=np.float64)
        texts = [t.lower() for t in s[notnull]]
        if texts:
            lens = np.fromiter((len(t) for t in texts), dtype=np.int64)
            doc_starts = np.zeros(len(texts), dtype=np.int64)
            np.cumsum(lens[:-1] + 1, out=doc_starts[1:])
            joined = "\n".join(texts)
            codes = np.frombuffer(
                joined.encode("utf-32-le"), dtype=np.uint32
            ).astype(np.int64)
            if codes.size == 0:  # every text empty → weights stay 0.0
                res = pd.Series(out, dtype="Float64")
                res[~notnull] = pd.NA
                return res
            nonws = ~np.isin(codes, ws_codes)
            prev = np.empty_like(nonws)
            prev[0] = False
            prev[1:] = nonws[:-1]
            nxt = np.empty_like(nonws)
            nxt[-1] = False
            nxt[:-1] = nonws[1:]
            w_start = np.flatnonzero(nonws & ~prev)
            w_end = np.flatnonzero(nonws & ~nxt)
            w_len = w_end - w_start + 1
            doc_of = (
                np.searchsorted(doc_starts, w_start, side="right") - 1
            )
            wh = np.zeros(len(w_start), dtype=np.int64)
            for L in np.unique(w_len):
                sel = w_len == L
                mat = codes[w_start[sel][:, None] + np.arange(L)]
                h = np.zeros(mat.shape[0], dtype=np.int64)
                for j in range(L):
                    h = (h * _HASH_BASE + mat[:, j]) % _HASH_MOD
                wh[sel] = h
            n_docs = len(texts)
            acc = np.bincount(
                doc_of, weights=lr[wh % nb], minlength=n_docs
            )
            if bigrams and len(wh) > 1:
                same = doc_of[1:] == doc_of[:-1]
                p = np.ones(int(w_len.max()) + 2, dtype=np.int64)
                for i in range(1, len(p)):
                    p[i] = (p[i - 1] * _HASH_BASE) % _HASH_MOD
                lb = w_len[1:][same]
                hb = (
                    wh[:-1][same] * p[lb + 1]
                    + 32 * p[lb]
                    + wh[1:][same]
                ) % _HASH_MOD
                acc += np.bincount(
                    doc_of[1:][same], weights=lr[hb % nb], minlength=n_docs
                )
            out[notnull] = acc + init
        res = pd.Series(out, dtype="Float64")
        res[~notnull] = pd.NA
        return res

    return _weights


# --- Python references (single-value ground truth for the tests) -----------

def reference_bucket_ids(
    text, num_buckets: int = _DEFAULT_BUCKETS, bigrams: bool = True
):
    """Single-value Python reference for :func:`dsir_bucket_ids`."""
    if text is None:
        return None
    if isinstance(text, (bytes, bytearray)):
        text = text.decode("utf-8", errors="replace")
    words = [w for w in re.split(_WORD_SPLIT_RE, text.strip().lower()) if w]

    def _h(s: str) -> int:
        h = 0
        for ch in s:
            h = (h * _HASH_BASE + ord(ch)) % _HASH_MOD
        return h % num_buckets

    out = [_h(w) for w in words]
    if bigrams:
        out += [_h(f"{a} {b}") for a, b in zip(words, words[1:])]
    return out


def reference_weight(text, model: DsirModel):
    """Single-value Python reference for :meth:`DsirModel.weight_expr`
    — the identical serial fold, so it matches BIT-for-bit."""
    ids = reference_bucket_ids(text, model.num_buckets, model.bigrams)
    if ids is None:
        return None
    acc = 0.0
    for b in ids:
        acc += model.log_ratio[b]
    return acc


# --- DuckDB twins -----------------------------------------------------------

def dsir_bucket_ids_sql(
    col: str, num_buckets: int = _DEFAULT_BUCKETS, bigrams: bool = True
) -> str:
    """DuckDB twin of :func:`dsir_bucket_ids` — same split, same
    integer fold (list_reduce needs no seed wrapper here: the hash state
    and the codepoint elements are both BIGINT, so the seed rides as a
    prepended 0)."""

    def _bucket(s: str) -> str:
        codes = f"list_transform(string_split({s}, ''), c -> ascii(c)::BIGINT)"
        h = (
            f"list_reduce(list_prepend(0::BIGINT, {codes}), "
            f"(acc, c) -> (acc * {_HASH_BASE} + c) % {_HASH_MOD})"
        )
        return f"(({h}) % {num_buckets})::INT"

    words = (
        f"list_filter(string_split_regex(lower(trim({col})), "
        f"'{_WORD_SPLIT_RE}'), w -> w <> '')"
    )
    uni = f"list_transform({words}, w -> {_bucket('w')})"
    if not bigrams:
        body = uni
    else:
        pair = f"(({words})[i] || ' ' || ({words})[i + 1])"
        bi = (
            f"list_transform(range(1, greatest(len({words}), 1)), "
            f"i -> {_bucket(pair)})"
        )
        body = f"list_concat({uni}, {bi})"
    return f"CASE WHEN {col} IS NULL THEN NULL ELSE {body} END"


def bucket_counts_sql(
    table: str,
    col: str = "text",
    num_buckets: int = _DEFAULT_BUCKETS,
    bigrams: bool = True,
) -> str:
    """DuckDB twin of :func:`bucket_counts` (integer-exact)."""
    ids = dsir_bucket_ids_sql(col, num_buckets, bigrams)
    return (
        f"SELECT bucket, COUNT(*)::BIGINT AS cnt FROM "
        f"(SELECT UNNEST({ids}) AS bucket FROM {table}) GROUP BY bucket"
    )


# --- code-constant example model (the charlm ENGLISH_LM discipline) --------
#
# Original seed prose written for this repo (target = clean encyclopedic
# English; raw = boilerplate/navigation junk).  Because the model is a
# Python constant computed at import, static driver oracle SQL embeds
# the IDENTICAL log-ratio literals — no ln() runs in any engine.

_TARGET_SEED = [
    "the glacier carved this valley over thousands of years leaving"
    " moraines that record each pause in its slow retreat",
    "researchers measured the magnetic field at every station and"
    " interpolated a smooth grid across the survey region",
    "the committee reviewed the evidence carefully before publishing"
    " a detailed report on water quality in the river basin",
    "a clear explanation of the method helps readers reproduce the"
    " analysis and check every intermediate result",
]
_RAW_SEED = [
    "click here subscribe now cookie settings accept all privacy"
    " policy terms of service sign in register",
    "home about contact shop cart checkout wishlist compare share"
    " tweet pin next previous page loading",
    "buy now limited offer free shipping best price deal of the day"
    " add to cart related products you may also like",
    "copyright all rights reserved powered by theme menu search"
    " categories tags archive rss feed sitemap",
]

#: small feature space so the literal table stays plan-light in oracles
EXAMPLE_DSIR = fit_dsir_python(_TARGET_SEED, _RAW_SEED, num_buckets=256)
