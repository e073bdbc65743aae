"""Link graph over the page table: href extraction, host-level edges,
and PageRank — the Common-Crawl companion artifacts (a crawl corpus is
pages + the graph between them).

Spark-first shapes:

- :func:`extract_links` — ``regexp_extract_all`` of anchor hrefs (one
  codegen'd projection) + one explode; relative links resolve against
  the page's scheme://host with pure string expressions.  No Python.
- :func:`host_graph` — domain-level edge aggregation: one
  map-side-combined ``groupBy(src_domain, dst_domain)``.
- :func:`pagerank` — the classic iterative formulation (public Spark
  example semantics: dangling mass is dropped, uniform damping
  ``(1-d)/N``): contributions = one equi-join rank⋈edges per round,
  re-aggregated per destination; per-round ``localCheckpoint(eager)``
  caps lineage growth exactly like ``connected_components`` /
  ``knn_join`` (PLANS.md §"iterative operators"), and the returned plan
  stays lazy.  Ranks are float sums — parallel reduction order makes
  them deterministic only to ~1 ulp, so tests pin NumPy parity at
  rtol 1e-9 rather than a byte oracle (the one operator family here
  that is honestly not hash-oracle-able).

Reference context: fatiando/verde has no graph layer; this exists for
the webtext payload (BASELINE.json north rule: Common-Crawl-style
pages at 10^12 scale).
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame, Window
from pyspark.sql import functions as F

from ..functions.urls import _URL_RE, domain_of

#: href of an <a> tag; the lazy [^>]*? and the quote classes are in the
#: common Java-regex / RE2 / Python subset (same discipline as
#: extract.py — including the EXPLICIT whitespace class: Java's \s has
#: \x0B, RE2's does not, so a bare \s silently breaks DuckDB parity)
_WS = r"[ \t\r\n\f]"
_HREF_RE = (
    r"""(?is)<a\b[^>]*?href""" + _WS + "*=" + _WS + r"""*["']([^"'<>]*)["']"""
)

#: href + plain inner text of an <a> tag.  The text class is [^<]* — an
#: anchor whose inner text nests further markup is skipped (the standard
#: simplification; nested-markup anchors carry images/widgets, not the
#: descriptive text anchor aggregation wants) — which keeps the pattern
#: in the shared Java-regex / RE2 subset so DuckDB replays it verbatim.
_ANCHOR_RE = (
    r"""(?is)<a\b[^>]*?href""" + _WS + "*=" + _WS
    + r"""*["']([^"'<>]*)["'][^>]*>([^<]*)</a>"""
)


def _resolve_link(link: Column, src_url: Column) -> Column:
    """Absolute form of a raw href against its page url (NULL when not
    resolvable to an absolute link).  The protocol-relative arm MUST
    precede the root-relative one: "//other.com/x" startswith "/" too,
    and resolving it against the source host fabricates a self-edge on
    the SOURCE domain (ADVICE r3)."""
    scheme = F.lower(F.regexp_extract(src_url, _URL_RE, 1))
    base = F.concat(
        scheme, F.lit("://"), F.lower(F.regexp_extract(src_url, _URL_RE, 2))
    )
    return (
        F.when(link.rlike(r"^[Hh][Tt][Tt][Pp][Ss]?://"), link)
        .when(link.startswith("//"), F.concat(scheme, F.lit(":"), link))
        .when(link.startswith("/"), F.concat(base, link))
        .otherwise(F.lit(None))
    )


def extract_links(
    pages: DataFrame,
    url_col: str = "url",
    html_col: str = "html",
    resolve: bool = True,
) -> DataFrame:
    """(src_url, link) per anchor href found in the page html.

    ``resolve=True`` turns root-relative links (``/path``) into absolute
    ones against the page's ``scheme://host`` and keeps only absolute
    ``http(s)://`` results; ``resolve=False`` returns raw href strings.
    Pure Catalyst: regexp_extract_all → explode; zero joins/Python.
    """
    html = F.col(html_col).cast("string")
    links = F.explode(F.regexp_extract_all(html, F.lit(_HREF_RE), 1)).alias("link")
    out = pages.select(F.col(url_col).alias("src_url"), links)
    if not resolve:
        return out
    src = F.col("src_url")
    resolved = _resolve_link(F.col("link"), src)
    return out.select(src.alias("src_url"), resolved.alias("link")).filter(
        F.col("link").isNotNull()
    )


def extract_anchor_texts(
    pages: DataFrame, url_col: str = "url", html_col: str = "html"
) -> DataFrame:
    """(src_url, link, anchor) per plain-text anchor in the page html.

    ``anchor`` is the tag's inner text, whitespace-normalized (collapse
    runs, trim) but case-preserved; empty anchors and unresolvable hrefs
    are dropped.  Physical shape: TWO ``regexp_extract_all`` passes over
    the html (one per capture group — Spark's extract_all returns one
    group per call) zipped positionally, then one explode — still a pure
    Catalyst projection chain, zero joins, zero Python.
    """
    html = F.col(html_col).cast("string")
    pair = F.explode(
        F.arrays_zip(
            F.regexp_extract_all(html, F.lit(_ANCHOR_RE), 1).alias("href"),
            F.regexp_extract_all(html, F.lit(_ANCHOR_RE), 2).alias("raw"),
        )
    ).alias("a")
    out = pages.select(F.col(url_col).alias("src_url"), pair)
    anchor = F.trim(F.regexp_replace(F.col("a.raw"), _WS + "+", " "))
    return out.select(
        F.col("src_url"),
        _resolve_link(F.col("a.href"), F.col("src_url")).alias("link"),
        anchor.alias("anchor"),
    ).filter(F.col("link").isNotNull() & (F.col("anchor") != ""))


def top_anchor_texts(
    pages: DataFrame,
    k: int = 5,
    url_col: str = "url",
    html_col: str = "html",
) -> DataFrame:
    """Per destination host, its *k* most frequent inbound anchor texts:
    (dst_domain, anchor, n_anchors, rank) — the classic link-text signal
    a web corpus derives next to the host graph (anchor text describes
    the TARGET page; search and quality pipelines aggregate it per host).

    Anchors are lower-cased for aggregation.  Shape: the anchor
    projection above → ONE map-side-combined groupBy(dst_domain, anchor)
    → one per-domain window limited to *k* (WindowGroupLimit pushes the
    limit below the sort — no per-domain full materialization).  Ties
    break deterministically by anchor string, so the result is exactly
    reproducible (and DuckDB-oracle-able).
    """
    anchors = extract_anchor_texts(pages, url_col=url_col, html_col=html_col)
    counts = (
        anchors.select(
            domain_of("link").alias("dst_domain"),
            F.lower(F.col("anchor")).alias("anchor"),
        )
        .groupBy("dst_domain", "anchor")
        .agg(F.count(F.lit(1)).alias("n_anchors"))
    )
    win = Window.partitionBy("dst_domain").orderBy(
        F.col("n_anchors").desc(), F.col("anchor").asc()
    )
    return (
        counts.withColumn("rank", F.row_number().over(win))
        .filter(F.col("rank") <= k)
    )


def top_anchor_texts_sql(pages_sql: str, k: int = 5) -> str:
    """DuckDB twin of :func:`top_anchor_texts` over a source subquery
    producing ``(url, html_str)`` rows — replays the anchor regex, link
    resolution, whitespace normalization, domain extraction and the
    ranked top-k with the shared pattern constants."""
    anchor_re = _ANCHOR_RE.replace("'", "''")

    def dom(u: str) -> str:
        return (
            "lower(regexp_replace(regexp_replace("
            f"regexp_extract({u}, '{_URL_RE}', 2), '^.*@', ''), ':[0-9]*$', ''))"
        )

    scheme = f"lower(regexp_extract(src_url, '{_URL_RE}', 1))"
    base = f"{scheme} || '://' || lower(regexp_extract(src_url, '{_URL_RE}', 2))"
    return f"""
        WITH pages AS ({pages_sql}),
        zipped AS (
          SELECT url AS src_url,
                 regexp_extract_all(html_str, '{anchor_re}', 1) AS hrefs,
                 regexp_extract_all(html_str, '{anchor_re}', 2) AS raws
          FROM pages
        ),
        raw AS (
          SELECT src_url, hrefs[i] AS href,
                 trim(regexp_replace(raws[i], '[ \t\r\n\f]+', ' ', 'g')) AS anchor
          FROM zipped, unnest(range(1, len(hrefs) + 1)) AS t(i)
        ),
        resolved AS (
          SELECT src_url, anchor,
                 CASE WHEN regexp_matches(href, '^[Hh][Tt][Tt][Pp][Ss]?://') THEN href
                      WHEN href LIKE '//%' THEN {scheme} || ':' || href
                      WHEN href LIKE '/%' THEN {base} || href
                      ELSE NULL END AS link
          FROM raw
        ),
        counts AS (
          SELECT {dom('link')} AS dst_domain, lower(anchor) AS anchor,
                 count(*) AS n_anchors
          FROM resolved WHERE link IS NOT NULL AND anchor <> ''
          GROUP BY 1, 2
        )
        SELECT dst_domain, anchor, n_anchors, rank FROM (
          SELECT *, row_number() OVER (
            PARTITION BY dst_domain ORDER BY n_anchors DESC, anchor ASC
          ) AS rank FROM counts
        ) WHERE rank <= {k}
    """


def host_graph(
    pages: DataFrame, url_col: str = "url", html_col: str = "html"
) -> DataFrame:
    """(src_domain, dst_domain, n_links) — the host-level web graph.
    One extraction projection + one map-side-combined groupBy; self-loops
    kept (they carry real internal-link signal)."""
    links = extract_links(pages, url_col=url_col, html_col=html_col)
    return (
        links.select(
            domain_of("src_url").alias("src_domain"),
            domain_of("link").alias("dst_domain"),
        )
        .groupBy("src_domain", "dst_domain")
        .agg(F.count(F.lit(1)).alias("n_links"))
    )


def host_graph_sql(pages_sql: str) -> str:
    """DuckDB twin of :func:`host_graph` (driver-oracle parity) over a
    source subquery producing ``(url, html_str)`` rows.  Replays the
    href regex, the root-relative resolution and the domain extraction
    with the shared pattern constants."""
    href = _HREF_RE.replace("'", "''")

    def dom(u: str) -> str:
        return (
            "lower(regexp_replace(regexp_replace("
            f"regexp_extract({u}, '{_URL_RE}', 2), '^.*@', ''), ':[0-9]*$', ''))"
        )

    scheme = f"lower(regexp_extract(src_url, '{_URL_RE}', 1))"
    base = f"{scheme} || '://' || lower(regexp_extract(src_url, '{_URL_RE}', 2))"
    return f"""
        WITH pages AS ({pages_sql}),
        raw AS (
          SELECT url AS src_url,
                 unnest(regexp_extract_all(html_str, '{href}', 1)) AS link
          FROM pages
        ),
        resolved AS (
          SELECT src_url,
                 CASE WHEN regexp_matches(link, '^[Hh][Tt][Tt][Pp][Ss]?://') THEN link
                      WHEN link LIKE '//%' THEN {scheme} || ':' || link
                      WHEN link LIKE '/%' THEN {base} || link
                      ELSE NULL END AS link
          FROM raw
        )
        SELECT {dom('src_url')} AS src_domain,
               {dom('link')} AS dst_domain,
               count(*) AS n_links
        FROM resolved WHERE link IS NOT NULL
        GROUP BY 1, 2
    """


def pagerank(
    edges: DataFrame,
    iterations: int = 10,
    damping: float = 0.85,
    src_col: str = "src",
    dst_col: str = "dst",
    tol: float | None = None,
    stats: dict | None = None,
) -> DataFrame:
    """(id, rank) after a fixed number of power iterations.

    ``tol`` (optional) adds convergence early-stop: iteration halts as
    soon as ``max |Δrank|`` between consecutive rounds drops below it —
    one extra equi-join + max-agg per round against the already
    checkpointed previous ranks; fixed ``iterations`` stays both the
    default behaviour and the upper bound.  Pass a dict as ``stats`` to
    get the executed round count back (``stats["rounds"]``).

    Classic semantics (the public Spark example's): nodes = union of
    sources and destinations; initial rank 1/N; each round every node
    sends rank/out_degree along its out-edges and ranks become
    ``(1-d)/N + d·Σ contributions`` (dangling nodes contribute nothing —
    their mass decays; ranks then sum to < 1, which is fine for ranking).

    Physical shape per round: ONE equi-join of the (narrow) rank table
    against the static out-degree-annotated edge list, one
    map-side-combined sum per destination, one union with the teleport
    floor for no-inbound nodes.  The edge list is hash-partitioned once
    and reused every round; ranks are ``localCheckpoint(eager)``-ed per
    round so the plan never grows (knn_join / connected_components
    pattern), and the final result is returned lazy.
    """
    if not 0.0 < damping < 1.0:
        raise ValueError(f"damping must be in (0, 1), got {damping!r}")
    if stats is not None:
        stats["rounds"] = 0
    src, dst = F.col(src_col), F.col(dst_col)
    e = edges.select(src.alias("src"), dst.alias("dst"))
    # materialized once: `nodes` feeds EVERY round's teleport join (and
    # the count below) — without the checkpoint each iteration re-runs
    # the union+distinct over the full edge list
    nodes = (
        e.select(F.col("src").alias("id"))
        .unionByName(e.select(F.col("dst").alias("id")))
        .distinct()
        .localCheckpoint(eager=True)
    )
    n_nodes = nodes.count()
    if n_nodes == 0:
        return nodes.withColumn("rank", F.lit(0.0))
    out_deg = e.groupBy("src").agg(F.count(F.lit(1)).alias("deg"))
    # static per-round operand: edges + sender out-degree, partitioned on
    # the join key once and cached so every iteration reuses the layout
    linked = (
        e.join(out_deg, "src").repartition("src").localCheckpoint(eager=True)
    )
    ranks = nodes.withColumn("rank", F.lit(1.0 / n_nodes)).localCheckpoint(
        eager=True
    )
    teleport = (1.0 - damping) / n_nodes
    for i in range(iterations):
        if stats is not None:
            stats["rounds"] = i + 1
        contribs = (
            linked.join(ranks.withColumnRenamed("id", "src"), "src")
            .select(
                F.col("dst").alias("id"),
                (F.col("rank") / F.col("deg")).alias("c"),
            )
            .groupBy("id")
            .agg(F.sum("c").alias("in_mass"))
        )
        new_ranks = (
            nodes.join(contribs, "id", "left")
            .select(
                "id",
                (
                    F.lit(teleport)
                    + F.lit(damping) * F.coalesce(F.col("in_mass"), F.lit(0.0))
                ).alias("rank"),
            )
        )
        last = i == iterations - 1
        if tol is not None and not last:
            # convergence check against the (checkpointed) previous ranks:
            # one narrow id-equi-join + one max agg; stop as soon as no
            # rank moved by more than tol
            new_ranks = new_ranks.localCheckpoint(eager=True)
            delta = (
                new_ranks.alias("new")
                .join(ranks.alias("old"), "id")
                .agg(
                    F.max(
                        F.abs(F.col("new.rank") - F.col("old.rank"))
                    ).alias("d")
                )
                .collect()[0]["d"]
            )
            ranks = new_ranks
            if delta is not None and delta < tol:
                break
        else:
            ranks = new_ranks if last else new_ranks.localCheckpoint(eager=True)
    return ranks
