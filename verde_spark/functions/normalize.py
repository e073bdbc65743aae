"""CCNet-shape text normalization — the canonical form a web corpus is
hashed in before exact dedup (Wenzek et al. 2020 "CCNet", §3: dedup
operates on lowercased, accent-stripped, digit-zeroed,
punctuation-unified text so trivial variants of the same page collapse
to one key).  No reference counterpart (fatiando/verde is numeric);
this is web-scale pipeline infrastructure in the dedup family.

The spec is OURS (CCNet-shaped, not byte-equal to the CCNet codebase,
which multi-char-expands a few marks): every rule is a CODEPOINT-TO-
CODEPOINT map plus one space-collapse — chosen so the whole operator is

* ONE ``translate`` call (a single simultaneous per-codepoint pass —
  map sections are disjoint on inputs, so composition order cannot
  matter) +
* ONE ``regexp_replace(' +', ' ')`` + a space-only trim,

i.e. a single codegen'd projection that rides the scan: zero shuffles,
zero Python, zero joins at ANY corpus size.  The map lives in ONE
module-level table (:data:`CHAR_MAP` sections) from which all three
engines derive, so they cannot diverge:

* :func:`normalize_text` — the Catalyst expression,
* :func:`reference_normalize` — plain-Python ``str.translate`` oracle,
* :func:`normalize_sql` — DuckDB twin; the translate from/to literals
  are emitted as ``chr(N)||…`` concatenations, so no quoting/escape
  rule of any SQL dialect can corrupt the table.

All three are BIT-identical on any input (fuzz-tested): ``translate``
is codepoint-wise in Spark (UTF8String), DuckDB (utf8proc) and Python,
the collapse regex ``' +'`` is literal-space-plus in Java regex, RE2
and Python alike, and the trim strips the space character only.

Rules (each toggleable):

* control/space unification: TAB LF CR FF VT and NBSP → space; soft
  hyphen, zero-width space/joiner/non-joiner and BOM are DELETED,
* ``lower``: ASCII ``A-Z`` → ``a-z`` (ASCII-only BY DESIGN — full
  Unicode case-folding is locale-trapped, e.g. dotted İ explodes to
  two codepoints in some engines; accented letters fold through the
  accent table instead, so Latin text still lowercases fully),
* ``digits_to_zero``: ``1-9`` and fullwidth ``０-９`` → ``0`` (the
  CCNet rule: numbers are boilerplate entropy for dedup purposes),
* ``unicode_punct``: CJK/typographic marks → ASCII (，→, 。→. ”→"
  ‘’→' —–→- …→. etc),
* ``strip_accents``: Latin-1 Supplement + Latin Extended-A letters →
  base ASCII LOWERCASE (à Á â … → a); multi-char ligatures (æ œ ß)
  are left alone — a 1:1 map cannot expand them and silently dropping
  them would lose letters.

NULL → NULL; '' → ''.  The normalized form goes in a NEW column —
callers never rewrite the stored text (the byte-identity invariant).
:func:`normalized_fingerprint` is the 64-bit dedup key of the
normalized form; ``clean_corpus(normalize_dedup=True)`` keys its exact
dedup on it.
"""

from __future__ import annotations

from pyspark.sql import Column
from pyspark.sql import functions as F

__all__ = [
    "CHAR_MAP",
    "normalize_text",
    "normalized_fingerprint",
    "reference_normalize",
    "normalize_sql",
]

# -- the single source of truth: section name -> {src_char: dst_char|None}
# (None = delete).  Sections are disjoint on source chars (asserted at
# import), so one simultaneous translate pass implements all of them.

_SPACE_UNIFY = {
    "\t": " ", "\n": " ", "\r": " ", "\x0c": " ", "\x0b": " ",
    "\xa0": " ",          # NBSP
    "\xad": None,         # soft hyphen
    "​": None, "‌": None, "‍": None, "﻿": None,
}

_LOWER = {chr(c): chr(c + 32) for c in range(ord("A"), ord("Z") + 1)}

_DIGITS = {str(d): "0" for d in range(1, 10)}
_DIGITS.update({chr(0xFF10 + d): "0" for d in range(10)})  # ０-９

_PUNCT = {
    "，": ",", "。": ".", "、": ",", "∶": ":", "：": ":", "？": "?",
    "！": "!", "（": "(", "）": ")", "；": ";", "．": ".", "～": "~",
    "’": "'", "‘": "'", "‚": ",", "′": "'", "‛": "'",
    "“": '"', "”": '"', "„": '"', "‟": '"', "″": '"',
    "«": '"', "»": '"', "「": '"', "」": '"', "《": '"', "》": '"',
    "【": "[", "】": "]", "〈": "<", "〉": ">",
    "–": "-", "—": "-", "‐": "-", "‑": "-", "―": "-", "━": "-",
    "…": ".", "・": ".", "•": "-", "％": "%", "＃": "#", "＆": "&",
    "＊": "*", "／": "/", "＼": "\\", "＋": "+", "＝": "=",
    "＜": "<", "＞": ">", "＠": "@", "［": "[", "］": "]",
    "＾": "^", "＿": "_", "｀": "`", "｛": "{", "｝": "}", "｜": "|",
    "　": " ",  # ideographic space
}

# Latin-1 Supplement + Latin Extended-A letters -> base ascii LOWERCASE
# (both cases map to the lowercase base; built programmatically from the
# base-letter groups so the table cannot hold a typo).
_ACCENT_GROUPS = {
    "a": "àáâãäåÀÁÂÃÄÅāăąĀĂĄ",
    "c": "çÇćĉċčĆĈĊČ",
    "d": "ďđĎĐ",
    "e": "èéêëÈÉÊËēĕėęěĒĔĖĘĚ",
    "g": "ĝğġģĜĞĠĢ",
    "h": "ĥħĤĦ",
    "i": "ìíîïÌÍÎÏĩīĭįıĨĪĬĮİ",
    "j": "ĵĴ",
    "k": "ķĶ",
    "l": "ĺļľŀłĹĻĽĿŁ",
    "n": "ñÑńņňŃŅŇ",
    "o": "òóôõöøÒÓÔÕÖØōŏőŌŎŐ",
    "r": "ŕŗřŔŖŘ",
    "s": "śŝşšŚŜŞŠ",
    "t": "ţťŧŢŤŦ",
    "u": "ùúûüÙÚÛÜũūŭůűųŨŪŬŮŰŲ",
    "w": "ŵŴ",
    "y": "ýÿÝŷŶŸ",
    "z": "źżžŹŻŽ",
}
_ACCENTS = {
    src: base for base, srcs in _ACCENT_GROUPS.items() for src in srcs
}

#: section name -> map; the option flags of every engine key off these.
CHAR_MAP: dict[str, dict[str, str | None]] = {
    "space": _SPACE_UNIFY,
    "lower": _LOWER,
    "digits": _DIGITS,
    "punct": _PUNCT,
    "accents": _ACCENTS,
}

# disjointness: one simultaneous translate pass == sequential composition
_seen: set[str] = set()
for _name, _m in CHAR_MAP.items():
    _dup = _seen & set(_m)
    assert not _dup, f"CHAR_MAP section {_name} reuses sources {_dup}"
    _seen |= set(_m)
del _seen, _name, _m


def _from_to(
    lower: bool, digits_to_zero: bool, unicode_punct: bool,
    strip_accents: bool,
) -> tuple[str, str]:
    """(from, to) translate strings for the enabled sections — mapped
    chars first, deletions LAST (translate deletes the from-tail that
    has no to-counterpart, in Spark, DuckDB and Python alike)."""
    sections = ["space"]
    if lower:
        sections.append("lower")
    if digits_to_zero:
        sections.append("digits")
    if unicode_punct:
        sections.append("punct")
    if strip_accents:
        sections.append("accents")
    pairs = [(s, d) for name in sections for s, d in CHAR_MAP[name].items()]
    mapped = [(s, d) for s, d in pairs if d is not None]
    deleted = [s for s, d in pairs if d is None]
    return (
        "".join(s for s, _ in mapped) + "".join(deleted),
        "".join(d for _, d in mapped),
    )


def normalize_text(
    text: Column | str = "text",
    *,
    lower: bool = True,
    digits_to_zero: bool = True,
    unicode_punct: bool = True,
    strip_accents: bool = True,
) -> Column:
    """The normalized form as ONE codegen'd projection: a single
    simultaneous ``translate`` over :data:`CHAR_MAP`'s enabled sections,
    then ``' +' → ' '`` collapse and a space-only trim.  NULL → NULL."""
    text = F.col(text) if isinstance(text, str) else text
    src, dst = _from_to(lower, digits_to_zero, unicode_punct, strip_accents)
    return F.trim(
        F.regexp_replace(F.translate(text, src, dst), " +", " ")
    )


def normalized_fingerprint(text: Column | str = "text", **opts) -> Column:
    """64-bit dedup key of the normalized form — what
    ``clean_corpus(normalize_dedup=True)`` windows on.  Same xxhash64
    family as :func:`~verde_spark.functions.text.fingerprint`."""
    return F.xxhash64(normalize_text(text, **opts))


def reference_normalize(
    s: str | None,
    *,
    lower: bool = True,
    digits_to_zero: bool = True,
    unicode_punct: bool = True,
    strip_accents: bool = True,
) -> str | None:
    """Plain-Python oracle — same table, same three steps."""
    if s is None:
        return None
    src, dst = _from_to(lower, digits_to_zero, unicode_punct, strip_accents)
    table = {ord(c): (dst[i] if i < len(dst) else None)
             for i, c in enumerate(src)}
    out = s.translate(table)
    while "  " in out:
        out = out.replace("  ", " ")
    return out.strip(" ")


def normalize_sql(
    col: str,
    *,
    lower: bool = True,
    digits_to_zero: bool = True,
    unicode_punct: bool = True,
    strip_accents: bool = True,
) -> str:
    """DuckDB twin expression.  The from/to literals are emitted as
    ``chr(N)||…`` concatenations — immune to every quoting rule — and
    DuckDB's ``translate`` is codepoint-wise with the same delete-the-
    tail contract, so the twin is bit-identical to Catalyst."""
    src, dst = _from_to(lower, digits_to_zero, unicode_punct, strip_accents)

    def lit(chars: str) -> str:
        # variadic concat, not `||` chains: DuckDB's binder recurses per
        # `||` and caps at depth 128; concat binds flat at any arity
        if not chars:
            return "''"
        return "concat(" + ", ".join(f"chr({ord(c)})" for c in chars) + ")"

    return (
        f"trim(regexp_replace(translate({col}, {lit(src)}, {lit(dst)}), "
        "' +', ' ', 'g'), ' ')"
    )
