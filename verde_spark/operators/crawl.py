"""Crawl-policy gates: robots meta directives and domain blocklists —
the two front-door filters a web corpus applies before any content
processing (you must not train on pages that opted out, and curated
domain blocklists remove whole categories cheaply).

Reference context: fatiando/verde has no web layer; this module exists
for the webtext payload (BASELINE.json north rule: Common-Crawl-style
pages at 10^12 scale), alongside linkgraph / urls / extract.

Spark-first shapes (both gates are scan-speed):

- :func:`meta_robots` — a pure Catalyst regexp projection parsing
  ``<meta name="robots" content=...>`` (both attribute orders) into
  ``struct(noindex, nofollow)``; :func:`robots_filter` is one codegen'd
  filter over the scan.  Zero shuffle, zero Python.
- :func:`filter_blocklist` — domain-suffix matching.  A host is blocked
  when the host itself OR any of its parent-domain suffixes is listed
  (``ads.example.com`` matches a listed ``example.com``) — the standard
  registrable-domain blocklist semantics.  For a driver-side list (the
  common case: curated blocklists are small-side by nature) the whole
  gate is ONE projection — the host's suffix array intersected with a
  literal array — zero shuffle at any corpus size.  A DataFrame
  blocklist under ``driver_threshold`` rows is collected into that same
  literal form (same documented small-side contract as the ANN probe
  sets); above the threshold it falls back to an exploded-suffix
  broadcast semi-join (corpus still never shuffled; only the matched
  url set is).

The three-engine discipline (memory: established pattern): the Catalyst
expressions here have a single-value Python reference
(:func:`reference_meta_robots`, :func:`reference_host_suffixes`) and
DuckDB SQL twins (:func:`meta_robots_sql`, :func:`blocked_sql`) built
from the SAME pattern constants, so driver oracles replay the chain
bit-for-bit.
"""

from __future__ import annotations

import re
from typing import Sequence

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

from ..functions.urls import _URL_RE

#: content of a robots meta tag, attribute order name→content; the lazy
#: [^>]*? and quote classes are the shared Java-regex / RE2 / Python
#: subset (same discipline as extract.py / linkgraph.py)
_ROBOTS_NC_RE = (
    r"""(?is)<meta\b[^>]*?name\s*=\s*["']robots["'][^>]*?"""
    r"""content\s*=\s*["']([^"'<>]*)["']"""
)
#: …and order content→name (both orders appear in the wild)
_ROBOTS_CN_RE = (
    r"""(?is)<meta\b[^>]*?content\s*=\s*["']([^"'<>]*)["'][^>]*?"""
    r"""name\s*=\s*["']robots["']"""
)


def _directives(content: Column) -> Column:
    """",noindex,nofollow," — lower-cased, whitespace-stripped, comma-
    wrapped directive list for exact token membership via LIKE/contains
    (substring matching would confuse a hypothetical "nonoindex")."""
    return F.concat(
        F.lit(","),
        F.regexp_replace(F.lower(content), r"\s+", ""),
        F.lit(","),
    )


def meta_robots(html: Column | str = "html") -> Column:
    """``struct(noindex boolean, nofollow boolean)`` parsed from the
    page's robots meta tag (absent tag → both false).  ``none`` implies
    both, per the robots meta spec.  Pure Catalyst projection."""
    h = (F.col(html) if isinstance(html, str) else html).cast("string")

    def _build(t: Column) -> Column:
        # first non-empty match across the two attribute orders
        content = F.coalesce(
            F.nullif(F.regexp_extract(t, _ROBOTS_NC_RE, 1), F.lit("")),
            F.nullif(F.regexp_extract(t, _ROBOTS_CN_RE, 1), F.lit("")),
            F.lit(""),
        )
        d = _directives(content)
        none = d.contains(",none,")
        return F.struct(
            (d.contains(",noindex,") | none).alias("noindex"),
            (d.contains(",nofollow,") | none).alias("nofollow"),
        )

    # let-bind the casted html: it feeds two regexp_extracts and
    # interpreted Catalyst has no CSE (memory: round-3 traps)
    return F.element_at(F.transform(F.array(h), _build), 1)


def robots_filter(
    pages: DataFrame, html_col: str = "html", respect_noindex: bool = True
) -> DataFrame:
    """Drop pages whose robots meta requests noindex (the pages a
    training corpus must not keep).  One codegen'd filter over the scan —
    zero shuffle, zero Python.  ``respect_noindex=False`` returns the
    input unchanged (symmetry for recipe plumbing)."""
    if not respect_noindex:
        return pages
    return pages.filter(~meta_robots(html_col)["noindex"])


def reference_meta_robots(html: bytes | str | None) -> tuple[bool, bool]:
    """Single-value Python reference for :func:`meta_robots` (validation
    twin; same patterns, same semantics)."""
    if html is None:
        return (False, False)
    if isinstance(html, (bytes, bytearray)):
        html = html.decode("utf-8", errors="replace")
    m = re.search(_ROBOTS_NC_RE, html) or re.search(_ROBOTS_CN_RE, html)
    content = m.group(1) if m and m.group(1) else ""
    d = "," + re.sub(r"\s+", "", content.lower()) + ","
    none = ",none," in d
    return (",noindex," in d or none, ",nofollow," in d or none)


def meta_robots_sql(html_col: str) -> tuple[str, str]:
    """DuckDB twins of ``meta_robots(html).noindex`` / ``.nofollow`` over
    a string html column — same pattern constants."""
    nc = _ROBOTS_NC_RE.replace("'", "''")
    cn = _ROBOTS_CN_RE.replace("'", "''")
    content = (
        f"coalesce(nullif(regexp_extract({html_col}, '{nc}', 1), ''), "
        f"nullif(regexp_extract({html_col}, '{cn}', 1), ''), '')"
    )
    d = f"',' || regexp_replace(lower({content}), '\\s+', '', 'g') || ','"
    none = f"contains({d}, ',none,')"
    return (
        f"(contains({d}, ',noindex,') OR {none})",
        f"(contains({d}, ',nofollow,') OR {none})",
    )


# ---------------------------------------------------------------------------
# domain blocklist


def host_of(url: Column | str = "url") -> Column:
    """Lower-cased host of an absolute url, userinfo/port stripped (the
    same normalization as ``urls.domain_of``, exposed here for suffix
    matching)."""
    u = F.col(url) if isinstance(url, str) else url
    auth = F.regexp_extract(u, _URL_RE, 2)
    return F.lower(
        F.regexp_replace(F.regexp_replace(auth, "^.*@", ""), ":[0-9]*$", "")
    )


def host_suffixes(url: Column | str = "url") -> Column:
    """Array of the host's domain suffixes, most-specific first:
    ``a.b.example.com → [a.b.example.com, b.example.com, example.com,
    com]``.  Hosts have a handful of labels, so the array is tiny and
    the whole thing is one projection."""
    u = F.col(url) if isinstance(url, str) else url

    def _build(h: Column) -> Column:
        parts = F.split(h, r"\.")
        n = F.size(parts)
        return F.transform(
            F.sequence(F.lit(1), n),
            lambda i: F.array_join(F.slice(parts, i, n - i + 1), "."),
        )

    # let-bind the host: it feeds split twice otherwise (no CSE)
    return F.element_at(F.transform(F.array(host_of(u)), _build), 1)


def reference_host_suffixes(url: str) -> list[str]:
    """Single-value Python reference for :func:`host_suffixes`."""
    m = re.match(_URL_RE, url or "")
    host = re.sub(r":[0-9]*$", "", re.sub(r"^.*@", "", m.group(2))).lower() if m else ""
    parts = host.split(".")
    return [".".join(parts[i:]) for i in range(len(parts))]


def _normalized_domains(domains: Sequence[str]) -> list[str]:
    return sorted({d.strip().lower().lstrip(".") for d in domains if d and d.strip()})


def blocked_expr(url: Column | str, domains: Sequence[str]) -> Column:
    """Boolean column: the url's host equals, or is a subdomain of, any
    listed domain.  A literal-array intersection — pure projection, zero
    shuffle regardless of corpus size."""
    lits = F.array(*[F.lit(d) for d in _normalized_domains(domains)])
    return F.arrays_overlap(host_suffixes(url), lits)


def blocked_sql(url_col: str, domains: Sequence[str]) -> str:
    """DuckDB twin of :func:`blocked_expr` (same normalization, same
    suffix semantics) over a string url column."""
    host = (
        "lower(regexp_replace(regexp_replace("
        f"regexp_extract({url_col}, '{_URL_RE}', 2), '^.*@', ''), ':[0-9]*$', ''))"
    )
    lits = ", ".join("'" + d.replace("'", "''") + "'" for d in _normalized_domains(domains))
    return (
        f"len(list_intersect(list_transform(range(1, len(string_split({host}, '.')) + 1), "
        f"i -> array_to_string(list_slice(string_split({host}, '.'), i, "
        f"len(string_split({host}, '.'))), '.')), [{lits}])) > 0"
    )


def filter_blocklist(
    pages: DataFrame,
    blocked: Sequence[str] | DataFrame,
    url_col: str = "url",
    domain_col: str = "domain",
    driver_threshold: int = 100_000,
) -> DataFrame:
    """Drop pages whose host is on (or under) a blocked domain.

    ``blocked`` is either a sequence of domain strings or a DataFrame
    with *domain_col*.  Small-side contract: a curated blocklist is tiny
    next to the corpus, so a DataFrame under ``driver_threshold`` rows is
    collected and inlined as a literal array — the gate is then ONE
    codegen'd projection and the corpus is never shuffled at any scale.
    A larger blocklist falls back to the exploded-suffix broadcast
    semi-join: only the matched url set (≤ blocked pages) is distinct-ed
    and anti-joined back — the corpus scan side still never repartitions
    on a data column.
    """
    if not isinstance(blocked, DataFrame):
        return pages.filter(~blocked_expr(url_col, list(blocked)))
    n = blocked.count()
    if n <= driver_threshold:
        doms = [r[0] for r in blocked.select(domain_col).collect()]
        return pages.filter(~blocked_expr(url_col, doms))
    norm = blocked.select(
        F.lower(F.trim(F.col(domain_col))).alias("__dom")
    ).distinct()
    matched = (
        pages.select(
            F.col(url_col).alias("__url"),
            F.explode(host_suffixes(url_col)).alias("__sfx"),
        )
        .join(F.broadcast(norm), F.col("__sfx") == F.col("__dom"), "left_semi")
        .select("__url")
        .distinct()
    )
    return pages.join(
        matched, pages[url_col] == matched["__url"], "left_anti"
    )
