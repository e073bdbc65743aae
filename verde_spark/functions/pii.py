r"""PII redaction — emails / IPv4 addresses / phone numbers → placeholder
tokens, as a pure Catalyst projection.

Training-data pipelines scrub obvious personally-identifiable strings
before packing a corpus (the C4 / Dolma-style front door has such a pass;
the reference engine has no text layer — this module follows the repo's
three-engine discipline established for ``extract_text`` /
``canonical_url``):

* :func:`redact_pii` — the Spark Catalyst expression (three chained
  ``regexp_replace`` calls: zero shuffles, zero Python, composes into the
  scan's WholeStageCodegen projection),
* :func:`reference_redact_pii` — a plain-Python re-implementation of the
  same spec (the behavioural reference the fuzz suite compares against),
* :func:`redact_pii_sql` — a DuckDB expression twin (driver-oracle
  parity).

One spec, three engines, byte-identical output.  The patterns live in the
Java-regex / RE2 / Python common subset: non-capturing groups, explicit
quantifiers, ``\b`` word boundaries, no ``\s``/``\d`` shorthand inside
classes that could drift between engines.

Detection is deliberately heuristic and precision-leaning (this is a
corpus scrub, not a compliance tool): emails are RFC-ish
``local@domain.tld``; IPs are dotted-quad IPv4 with range-checked octets;
phones need an international ``+`` prefix, a parenthesized area code, or
three separator-delimited digit groups — bare integers and ISO dates do
not match.

Invariant (BASELINE.json input_hint): the stored ``text`` column is NEVER
rewritten — redaction writes a NEW column (``text_clean`` by default).

Replacement order is part of the spec: emails first (an address would
otherwise be shredded by the phone pass's digit groups), then IPs (a
dotted quad looks like a 3-group phone), then phones.
"""

from __future__ import annotations

import re

from pyspark.sql import Column
from pyspark.sql import functions as F

#: RFC-ish email. The domain arm requires an alphabetic TLD, so
#: ``user@192.168.0.1`` is left for the IP pass.
EMAIL_RE = r"[A-Za-z0-9._%+-]+@[A-Za-z0-9.-]+\.[A-Za-z]{2,}"

_OCT = r"(?:25[0-5]|2[0-4][0-9]|1[0-9][0-9]|[1-9]?[0-9])"
#: dotted-quad IPv4 with range-checked octets (no 999.1.1.1).
IPV4_RE = rf"\b{_OCT}\.{_OCT}\.{_OCT}\.{_OCT}\b"

#: phone heuristics, leftmost-first alternation (Java, RE2 and Python all
#: use leftmost-first here):  A0) compact international "+NNNNNNNNNNN"
#: (7-15 digits, no separators — tried first so the grouped arm can't
#: leave a trailing digit);  A) international "+CC ..." with digit groups
#: joined by separators;  B) parenthesized area code "(NNN) NNN-NNNN";
#: C) three separator-joined 3-4 digit groups "NNN-NNN-NNNN".  A bare
#: year range "1999-2026" (two groups) or an ISO date "2026-08-18"
#: (2-digit tail groups) does not match C, which requires 3-4 digit
#: groups throughout.
PHONE_RE = (
    r"\+[0-9]{7,15}\b"
    r"|\+[0-9]{1,3}[ .-]?(?:\([0-9]{1,4}\)[ .-]?)?"
    r"[0-9]{2,4}(?:[ .-]?[0-9]{2,4}){1,3}"
    r"|\([0-9]{1,4}\)[ .-]?[0-9]{3,4}(?:[ .-]?[0-9]{3,4}){1,2}"
    r"|\b[0-9]{3,4}[ .-][0-9]{3,4}[ .-][0-9]{3,4}\b"
)

EMAIL_TOKEN = "<EMAIL>"
IP_TOKEN = "<IP>"
PHONE_TOKEN = "<PHONE>"

#: (pattern, replacement) in application order — the single spec all
#: three engines replay.
PII_RULES = (
    (EMAIL_RE, EMAIL_TOKEN),
    (IPV4_RE, IP_TOKEN),
    (PHONE_RE, PHONE_TOKEN),
)


def redact_pii(text: Column | str = "text") -> Column:
    """Redacted copy of *text* (emails → ``<EMAIL>``, IPv4 → ``<IP>``,
    phones → ``<PHONE>``).  Three chained ``regexp_replace`` expressions:
    a pure projection that fuses into the scan's codegen stage — at
    10^12 pages this adds zero shuffles and zero Python."""
    out = F.col(text) if isinstance(text, str) else text
    for pat, token in PII_RULES:
        out = F.regexp_replace(out, F.lit(pat), F.lit(token))
    return out


def pii_counts(text: Column | str = "text") -> Column:
    """``struct(n_emails, n_ips, n_phones)`` found in *text*, counted on
    the progressively-redacted string so the numbers equal what
    :func:`redact_pii` replaces (an IP inside an email is counted once,
    as the email).  Pure projection, same cost model as the redaction."""
    s = F.col(text) if isinstance(text, str) else text
    fields = []
    for (pat, token), name in zip(PII_RULES, ("n_emails", "n_ips", "n_phones")):
        fields.append(
            F.size(F.regexp_extract_all(s, F.lit(pat), 0)).alias(name)
        )
        s = F.regexp_replace(s, F.lit(pat), F.lit(token))
    return F.struct(*fields)


def reference_redact_pii(text: str | None) -> str | None:
    """Plain-Python reference implementation of the redaction spec."""
    if text is None:
        return None
    for pat, token in PII_RULES:
        text = re.sub(pat, token, text)
    return text


def _sql_quote(pat: str) -> str:
    return pat.replace("'", "''")


def redact_pii_sql(col: str) -> str:
    """DuckDB expression twin of :func:`redact_pii` over *col* (DuckDB
    needs the explicit ``'g'`` option — Spark replaces all matches by
    default)."""
    expr = col
    for pat, token in PII_RULES:
        expr = f"regexp_replace({expr}, '{_sql_quote(pat)}', '{token}', 'g')"
    return expr


def pii_counts_sql(col: str) -> tuple[str, str, str]:
    """DuckDB twins of :func:`pii_counts`'s three fields (progressive
    redaction order preserved)."""
    exprs = []
    s = col
    for pat, token in PII_RULES:
        exprs.append(f"len(regexp_extract_all({s}, '{_sql_quote(pat)}', 0))")
        s = f"regexp_replace({s}, '{_sql_quote(pat)}', '{token}', 'g')"
    return tuple(exprs)
