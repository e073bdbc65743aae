"""Link extraction / host graph / PageRank — the Common-Crawl graph
companions.  PageRank is pinned to an independent NumPy power-iteration
reference (float sums → rtol, not byte equality)."""

import numpy as np
import pandas as pd
import pytest
from pyspark.sql import functions as F

from verde_spark.operators.linkgraph import extract_links, host_graph, pagerank


def _page(url, *hrefs, extra=""):
    body = "".join(f'<p><a class="x" HREF="{h}">t</a></p>' for h in hrefs)
    return (url, bytearray(f"<html><body>{body}{extra}</body></html>".encode()))


def test_extract_links_resolution(spark):
    pages = spark.createDataFrame(
        [
            _page(
                "https://A.com/page",
                "https://b.com/x",
                "/rel",
                "HTTP://C.ORG/UP",
                "mailto:z@q.com",
                "nohref.html",
            ),
            _page("http://d.net", extra="<a data-x='1' href='/only'>y</a><a name='no-href'></a>"),
            ("http://empty.com", bytearray(b"<html><body>no links</body></html>")),
        ],
        "url string, html binary",
    )
    got = {
        (r["src_url"], r["link"])
        for r in extract_links(pages).collect()
    }
    assert got == {
        ("https://A.com/page", "https://b.com/x"),
        ("https://A.com/page", "https://a.com/rel"),  # root-relative → lowered base
        ("https://A.com/page", "HTTP://C.ORG/UP"),    # absolute kept verbatim
        ("http://d.net", "http://d.net/only"),
    }
    raw = extract_links(pages, resolve=False).collect()
    assert len(raw) == 6  # mailto + relative kept in raw mode

    plan = (
        extract_links(pages)._jdf.queryExecution().executedPlan().toString()
    )
    assert "Exchange" not in plan and "Python" not in plan


def test_host_graph_counts(spark):
    pages = spark.createDataFrame(
        [
            _page("https://a.com/1", "https://b.com/x", "https://b.com/y", "/self"),
            _page("https://a.com/2", "https://b.com/z"),
            _page("https://b.com/1", "https://a.com/h"),
        ],
        "url string, html binary",
    )
    got = {
        (r["src_domain"], r["dst_domain"]): r["n_links"]
        for r in host_graph(pages).collect()
    }
    assert got == {
        ("a.com", "b.com"): 3,
        ("a.com", "a.com"): 1,  # self-loop kept
        ("b.com", "a.com"): 1,
    }


def _ref_pagerank(edges, iters=10, d=0.85):
    nodes = sorted({s for s, _ in edges} | {t for _, t in edges})
    idx = {n: i for i, n in enumerate(nodes)}
    n = len(nodes)
    out = {}
    for s, _ in edges:
        out[s] = out.get(s, 0) + 1
    r = np.full(n, 1.0 / n)
    for _ in range(iters):
        nr = np.full(n, (1.0 - d) / n)
        for s, t in edges:
            nr[idx[t]] += d * r[idx[s]] / out[s]
        r = nr
    return dict(zip(nodes, r))


def test_pagerank_matches_numpy_reference(spark):
    # hub/authority structure + a dangling node (4) + a no-inbound node (0)
    edges = [(0, 1), (0, 2), (1, 2), (2, 1), (1, 4), (3, 2), (0, 3), (3, 1)]
    want = _ref_pagerank(edges)
    df = spark.createDataFrame(edges, "src long, dst long")
    got = {r["id"]: r["rank"] for r in pagerank(df).collect()}
    assert set(got) == set(want)
    for k in want:
        assert got[k] == pytest.approx(want[k], rel=1e-9)
    # authority ordering is meaningful and the dangling sink still ranks
    assert got[2] > got[3] and got[4] > 0


def test_pagerank_on_host_graph_end_to_end(spark):
    pages = spark.createDataFrame(
        [
            _page("https://a.com/1", "https://b.com/x"),
            _page("https://b.com/1", "https://c.com/x"),
            _page("https://c.com/1", "https://b.com/y"),
        ],
        "url string, html binary",
    )
    hg = host_graph(pages)
    pr = pagerank(hg, iterations=5, src_col="src_domain", dst_col="dst_domain")
    got = {r["id"]: r["rank"] for r in pr.collect()}
    want = _ref_pagerank(
        [("a.com", "b.com"), ("b.com", "c.com"), ("c.com", "b.com")], iters=5
    )
    for k in want:
        assert got[k] == pytest.approx(want[k], rel=1e-9)
    assert got["b.com"] == max(got.values())


def test_pagerank_validation_and_empty(spark):
    empty = spark.createDataFrame([], "src long, dst long")
    assert pagerank(empty).count() == 0
    with pytest.raises(ValueError):
        pagerank(empty, damping=1.5)


def test_protocol_relative_hrefs_resolve_to_target_host(spark):
    # ADVICE r3: "//other.com/x" must resolve via the SOURCE SCHEME to the
    # TARGET host — the old root-relative arm fabricated a self-edge
    pages = spark.createDataFrame(
        [
            _page("https://site0.com/a", "//other.com/x", "/local"),
            _page("http://site1.com/b", "//CDN.example.net/lib.js"),
        ],
        "url string, html binary",
    )
    links = {(r["src_url"], r["link"]) for r in extract_links(pages).collect()}
    assert links == {
        ("https://site0.com/a", "https://other.com/x"),
        ("https://site0.com/a", "https://site0.com/local"),
        ("http://site1.com/b", "http://CDN.example.net/lib.js"),
    }
    hg = {
        (r["src_domain"], r["dst_domain"]): r["n_links"]
        for r in host_graph(pages).collect()
    }
    assert hg == {
        ("site0.com", "other.com"): 1,
        ("site0.com", "site0.com"): 1,
        ("site1.com", "cdn.example.net"): 1,
    }


def test_host_graph_sql_twin_protocol_relative(spark):
    import duckdb

    from verde_spark.operators.linkgraph import host_graph_sql

    pages = spark.createDataFrame(
        [
            _page("https://site0.com/a", "//other.com/x", "/local",
                  "https://abs.example.org/z"),
        ],
        "url string, html binary",
    )
    spark_rows = sorted(
        (r["src_domain"], r["dst_domain"], r["n_links"])
        for r in host_graph(pages).collect()
    )
    pdf = pages.select(
        "url", F.col("html").cast("string").alias("html_str")
    ).toPandas()
    con = duckdb.connect()
    con.register("pg", pdf)
    duck_rows = sorted(
        tuple(t)
        for t in con.execute(
            host_graph_sql("SELECT url, html_str FROM pg")
        ).fetchall()
    )
    assert spark_rows == duck_rows
    assert ("site0.com", "other.com", 1) in spark_rows


def test_pagerank_tol_early_stop(spark):
    edges = [(0, 1), (0, 2), (1, 2), (2, 1), (1, 4), (3, 2), (0, 3), (3, 1)]
    df = spark.createDataFrame(edges, "src long, dst long")
    # a generous iteration budget with tol must converge to the same ranks
    # (within tol) as the fixed-iteration run, and a tiny 2-cycle graph
    # converges long before the budget
    full = {r["id"]: r["rank"] for r in pagerank(df, iterations=60).collect()}
    tolled = {
        r["id"]: r["rank"]
        for r in pagerank(df, iterations=60, tol=1e-12).collect()
    }
    for k in full:
        assert tolled[k] == pytest.approx(full[k], rel=1e-6)
    cyc = spark.createDataFrame([(0, 1), (1, 0)], "src long, dst long")
    stats = {}
    got = {
        r["id"]: r["rank"]
        for r in pagerank(cyc, iterations=50, tol=1e-9, stats=stats).collect()
    }
    # symmetric 2-cycle: exact fixed point 0.5/0.5 regardless of damping —
    # and the tol must have stopped the loop long before the 50-round budget
    assert got[0] == pytest.approx(0.5, rel=1e-6)
    assert got[1] == pytest.approx(0.5, rel=1e-6)
    assert 0 < stats["rounds"] < 10
