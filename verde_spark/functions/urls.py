"""URL canonicalization for the Common-Crawl-style page table.

Recrawls and link variants of one page differ only in url cosmetics —
scheme/host case, default ports, fragments, tracking parameters, query
order.  Canonicalizing before url-keyed dedup is the standard first pass
of a crawl pipeline (far cheaper than content dedup and catches most of
the volume).  Like :mod:`.extract`, one written spec drives three
engines: the Catalyst chain (:func:`canonical_url`), a DuckDB SQL twin
(:func:`canonical_url_sql`) for the driver oracle, and a single-value
Python reference (:func:`reference_canonical_url`) for validation.

The spec (absolute ``scheme://`` urls; anything else passes through
trimmed-and-defragmented, unchanged otherwise):

1. trim surrounding spaces; drop the ``#fragment``;
2. lower-case the scheme and the authority (host[:port]);
3. drop the scheme's default port (``http:80``, ``https:443``);
4. empty path → ``/``; otherwise the path is untouched (case matters);
5. split the query on ``&``, drop empty params and tracking params
   (``utm_*``, ``gclid``, ``fbclid``), byte-sort the rest, re-join;
   drop the ``?`` when nothing survives.

Sorting note: Spark's ``array_sort`` and DuckDB's ``list_sort`` agree on
ASCII (query strings per RFC 3986 are ASCII after percent-encoding);
non-ASCII raw bytes in params may sort differently across engines.

All expressions are JVM-side Catalyst (regexp + higher-order array
functions) — zero Python, zero shuffle: canonicalization runs at scan
speed over 10^12 rows.
"""

from __future__ import annotations

import re
from typing import Sequence

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

_URL_RE = r"^([A-Za-z][A-Za-z0-9+.-]*)://([^/?#]*)([^?#]*)\??([^#]*)"
_TRACKING_RE = r"^(utm_[^=]*|gclid|fbclid)(=.*)?$"


def canonical_url(url: Column | str = "url") -> Column:
    """The canonical form of a url column — pure Catalyst projection."""
    u = F.col(url) if isinstance(url, str) else url
    u = F.regexp_replace(F.trim(u), "#.*", "")

    def _build(t: Column) -> Column:
        scheme = F.lower(F.regexp_extract(t, _URL_RE, 1))
        auth = F.lower(F.regexp_extract(t, _URL_RE, 2))
        path = F.regexp_extract(t, _URL_RE, 3)
        query = F.regexp_extract(t, _URL_RE, 4)
        host = F.when(
            scheme == "http", F.regexp_replace(auth, ":80$", "")
        ).when(
            scheme == "https", F.regexp_replace(auth, ":443$", "")
        ).otherwise(auth)
        path = F.when(path == "", "/").otherwise(path)
        params = F.array_sort(
            F.filter(
                F.split(query, "&"),
                lambda p: (p != "") & ~p.rlike(_TRACKING_RE),
            )
        )
        q = F.array_join(params, "&")
        rebuilt = F.concat(
            scheme,
            F.lit("://"),
            host,
            path,
            F.when(q == "", "").otherwise(F.concat(F.lit("?"), q)),
        )
        return F.when(t.rlike(_URL_RE), rebuilt).otherwise(t)

    # let-bind the defragmented url: it feeds five regexp_extracts and
    # interpreted Catalyst has no CSE (memory: round-3 traps)
    return F.element_at(F.transform(F.array(u), _build), 1)


def canonical_url_sql(col: str) -> str:
    """The identical spec as one DuckDB expression (oracle parity)."""
    t = f"regexp_replace(trim({col}), '#.*', '')"
    return f"""(
      WITH parts AS (
        SELECT {t} AS t
      )
      SELECT CASE WHEN NOT regexp_matches(t, '{_URL_RE}') THEN t ELSE
        lower(regexp_extract(t, '{_URL_RE}', 1)) || '://' ||
        CASE lower(regexp_extract(t, '{_URL_RE}', 1))
          WHEN 'http' THEN regexp_replace(lower(regexp_extract(t, '{_URL_RE}', 2)), ':80$', '')
          WHEN 'https' THEN regexp_replace(lower(regexp_extract(t, '{_URL_RE}', 2)), ':443$', '')
          ELSE lower(regexp_extract(t, '{_URL_RE}', 2)) END ||
        CASE WHEN regexp_extract(t, '{_URL_RE}', 3) = '' THEN '/'
             ELSE regexp_extract(t, '{_URL_RE}', 3) END ||
        CASE WHEN coalesce(array_to_string(list_sort(list_filter(
                 string_split(regexp_extract(t, '{_URL_RE}', 4), '&'),
                 p -> p <> '' AND NOT regexp_matches(p, '{_TRACKING_RE}'))), '&'), '') = ''
             THEN ''
             ELSE '?' || array_to_string(list_sort(list_filter(
                 string_split(regexp_extract(t, '{_URL_RE}', 4), '&'),
                 p -> p <> '' AND NOT regexp_matches(p, '{_TRACKING_RE}'))), '&') END
      END FROM parts
    )"""


def reference_canonical_url(url: str) -> str:
    """Single-value Python reference of the same spec."""
    t = re.sub("#.*", "", url.strip(" "))
    m = re.match(_URL_RE, t)
    if not m or not m.group(1):
        return t
    scheme = m.group(1).lower()
    auth = m.group(2).lower()
    if scheme == "http":
        auth = re.sub(":80$", "", auth)
    elif scheme == "https":
        auth = re.sub(":443$", "", auth)
    path = m.group(3) or "/"
    params = sorted(
        p for p in m.group(4).split("&")
        if p != "" and not re.match(_TRACKING_RE, p)
    )
    q = "&".join(params)
    return f"{scheme}://{auth}{path}" + (f"?{q}" if q else "")


def dedup_url(
    df: DataFrame,
    url_col: str = "url",
    ts_col: str = "warc_ts",
    keep: str = "latest",
) -> DataFrame:
    """One row per canonical url — the crawl pipeline's first dedup pass.

    ``keep="latest"`` (or ``"earliest"``) selects the row with the
    max (min) ``ts_col`` per canonical url, ties broken deterministically
    by a full-row hash.  Physically this is a single map-side-combinable
    ``max_by``/``min_by`` aggregation on the canonical-url key — one
    shuffle, no window sort, AQE-skew-splittable; the canonical key
    itself is a zero-cost projection.
    """
    if keep not in ("latest", "earliest"):
        raise ValueError(f"keep must be 'latest' or 'earliest', got {keep!r}")
    pick = F.max_by if keep == "latest" else F.min_by
    order_key = F.struct(F.col(ts_col), F.xxhash64(*df.columns))
    row = F.struct(*df.columns)
    return (
        df.groupBy(canonical_url(url_col).alias("__curl"))
        .agg(pick(row, order_key).alias("__row"))
        .select("__row.*")
    )


def domain_of(url: Column | str = "url") -> Column:
    """Registrable host of a url (authority minus port/userinfo), lower-
    cased — the standard grouping key for per-site statistics."""
    u = F.col(url) if isinstance(url, str) else url
    auth = F.regexp_extract(F.trim(u), _URL_RE, 2)
    return F.lower(F.regexp_replace(F.regexp_replace(auth, "^.*@", ""), ":[0-9]*$", ""))


def top_domains(
    df: DataFrame, url_col: str = "url", k: int = 100
) -> DataFrame:
    """Exact top-k domains by page count: partial-aggregated count per
    domain, then ``TakeOrderedAndProject`` (limit-pushed global top-k —
    no full sort).  Ties broken by domain for a deterministic result."""
    return (
        df.select(domain_of(url_col).alias("domain"))
        .groupBy("domain")
        .agg(F.count(F.lit(1)).alias("n_pages"))
        .orderBy(F.desc("n_pages"), "domain")
        .limit(k)
    )
