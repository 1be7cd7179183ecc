"""html_stats structural census: Spark expression chain equals a
pure-Python re twin of the declared spec on adversarial markup
(script-string tags, uppercase/bare/nested/unclosed anchors, the
<abbr>-is-not-<a> trap, entities in anchor text, NULL/empty html),
integer ppm division parity, and scan-level plan shape."""

from __future__ import annotations

import re

from pyspark.sql import functions as F

from sagan_spark.ops.htmlstats import (
    A_OPEN_RE,
    ANCHOR_SPAN_RE,
    ANY_TAG_RE,
    IMG_OPEN_RE,
    SCRIPT_OPEN_RE,
    html_stats,
)
from sagan_spark.ops.htmltext import ENTITIES, TAG_RE, WS_RE
from tests.test_htmltext import py_twin

CASES = [
    # script whose string literal contains a tag: raw census counts it
    '<html><head><script src=x>var a="<b>";</script><style>p{}</style>'
    '</head><body><a href="/x">Home &amp; Garden</a><p>real text here</p>'
    '<A HREF="y"><b>Bold</b> link</A><img src=i><abbr>nope</abbr>'
    "</body></html>",
    # bare <a>, self-closing <a/>, normal anchor, plain tail
    '<a>bare</a><a/>self<a href="z">x</a> plain tail',
    # unclosed anchor contributes zero anchor chars
    '<a href="q">unclosed anchor <p>more',
    # anchor body spanning lines (dot-matches-newline)
    '<a href="n">line1\nline2</a>done',
    # markup-free
    "no markup at all",
    "",
]


def _py_inner(body: str) -> str:
    out = re.sub(TAG_RE, " ", body)
    for ent, ch in ENTITIES:
        out = out.replace(ent, ch)
    return re.sub(WS_RE, " ", out).strip()


def _py_stats(html: str | None) -> tuple:
    s = html or ""
    text_len = len(py_twin(s))
    anchor_chars = sum(
        len(_py_inner(m)) for m in re.findall(ANCHOR_SPAN_RE, s)
    )
    html_len = len(s)
    return (
        html_len,
        len(re.findall(ANY_TAG_RE, s)),
        len(re.findall(A_OPEN_RE, s)),
        len(re.findall(SCRIPT_OPEN_RE, s)),
        len(re.findall(IMG_OPEN_RE, s)),
        text_len,
        anchor_chars,
        anchor_chars * 1_000_000 // max(text_len, 1),
        text_len * 1_000_000 // max(html_len, 1),
    )


def test_html_stats_matches_python_twin(spark):
    rows = [(str(i), c) for i, c in enumerate(CASES)] + [("null", None)]
    df = spark.createDataFrame(rows, "url string, h string").select(
        "url", F.encode("h", "UTF-8").alias("html")
    )
    got = {
        r["url"]: (
            r["html_len"], r["n_tags"], r["n_links"], r["n_scripts"],
            r["n_images"], r["text_len"], r["anchor_chars"],
            r["link_density_ppm"], r["markup_ratio_ppm"],
        )
        for r in html_stats(df).collect()
    }
    for url, h in rows:
        assert got[url] == _py_stats(h), (url, h)


def test_html_stats_abbr_and_unclosed(spark):
    # <abbr> is not <a>; an unclosed anchor yields no anchor chars
    df = spark.createDataFrame(
        [("u", "<abbr>x</abbr><a href=q>dangling")], "url string, h string"
    ).select("url", F.encode("h", "UTF-8").alias("html"))
    r = html_stats(df).collect()[0]
    assert r["n_links"] == 1  # the open tag still counts in the census
    assert r["anchor_chars"] == 0


def test_html_stats_link_density_boilerplate_signal(spark):
    # a nav-chrome page scores far denser than an article page
    nav = '<a href="/1">Home</a> <a href="/2">About</a> <a href="/3">More</a>'
    art = '<a href="/1">Home</a><p>' + ("editorial body text " * 30) + "</p>"
    df = spark.createDataFrame(
        [("nav", nav), ("art", art)], "url string, h string"
    ).select("url", F.encode("h", "UTF-8").alias("html"))
    d = {r["url"]: r["link_density_ppm"] for r in html_stats(df).collect()}
    assert d["nav"] > 800_000 and d["art"] < 100_000


def test_html_stats_plan_scan_level(spark):
    df = spark.createDataFrame([("u", "<p>x</p>")], "url string, h string").select(
        "url", F.encode("h", "UTF-8").alias("html")
    )
    plan = html_stats(df)._jdf.queryExecution().executedPlan().toString()
    assert "Exchange" not in plan
    assert "BatchEvalPython" not in plan and "ArrowEvalPython" not in plan


# ---------------------------------------------------------------------------
# sitemap parsing (ops/sitemap.py) — same scan-level census family
# ---------------------------------------------------------------------------


def test_parse_sitemap_spec(spark):
    from sagan_spark.ops.sitemap import parse_sitemap

    xml = (
        '<?xml version="1.0"?><urlset>'
        "<url><loc> https://a.com/p?x=1&amp;y=2 </loc>"
        "<lastmod>2026-01-02</lastmod><priority>0.8</priority></url>"
        "<url><loc>https://a.com/q</loc></url>"
        "<url><lastmod>2026-02-01</lastmod></url>"  # loc-less: dropped
        "<URL><LOC>https://a.com/up</LOC></URL></urlset>"
    )
    idx = (
        "<sitemapindex><sitemap><loc>https://a.com/s1.xml</loc>"
        "<lastmod>2026-02-03</lastmod></sitemap>"
        "<sitemap><loc>https://a.com/s2.xml</loc></sitemap></sitemapindex>"
    )
    df = spark.createDataFrame(
        [("u", xml), ("i", idx), ("n", "not xml"), ("z", None)],
        "url string, x string",
    ).select("url", F.encode("x", "UTF-8").alias("html"))
    got = sorted(
        (r.url, r.kind, r.loc, r.lastmod, r.priority)
        for r in parse_sitemap(df).collect()
    )
    assert got == [
        ("i", "sitemap", "https://a.com/s1.xml", "2026-02-03", ""),
        ("i", "sitemap", "https://a.com/s2.xml", "", ""),
        ("u", "url", "https://a.com/p?x=1&y=2", "2026-01-02", "0.8"),
        ("u", "url", "https://a.com/q", "", ""),
        ("u", "url", "https://a.com/up", "", ""),
    ]


def test_parse_sitemap_wrapper_tags_never_match(spark):
    # <urlset>/<sitemapindex> wrappers must not match their entry tags
    from sagan_spark.ops.sitemap import parse_sitemap

    df = spark.createDataFrame(
        [("w", "<urlset></urlset><sitemapindex></sitemapindex>")],
        "url string, x string",
    ).select("url", F.encode("x", "UTF-8").alias("html"))
    assert parse_sitemap(df).count() == 0


def test_parse_sitemap_plan_scan_level(spark):
    from sagan_spark.ops.sitemap import parse_sitemap

    df = spark.createDataFrame([("u", "<url><loc>x</loc></url>")],
                               "url string, x string").select(
        "url", F.encode("x", "UTF-8").alias("html"))
    plan = parse_sitemap(df)._jdf.queryExecution().executedPlan().toString()
    assert "Exchange" not in plan
    assert "Generate" in plan  # the explode
    assert "EvalPython" not in plan


# ---------------------------------------------------------------------------
# outlink census (ops/htmlstats.outlink_census)
# ---------------------------------------------------------------------------


def test_outlink_census_twin(spark):
    import re as _re

    from sagan_spark.ops.htmlstats import (
        HREF_ABS_RE,
        HREF_ANY_RE,
        outlink_census,
    )
    from sagan_spark.ops.urltools import HOST_RE

    pages = [
        ("https://me.com/p",
         '<a href="https://me.com/q">i</a><a href="https://ext.com/x">e</a>'
         '<a href="https://ext.com/y">e2</a><a href="/rel">r</a>'
         '<a href="HTTPS://CASE.com/z">c</a>'),
        ("https://me.com/empty", "no links"),
        ("https://me.com/null", None),
    ]
    df = spark.createDataFrame(pages, "url string, h string").select(
        "url", F.encode("h", "UTF-8").alias("html")
    )
    got = {
        r.url: (r.n_links, r.n_abs, r.n_rel, r.n_external, r.n_hosts)
        for r in outlink_census(df).collect()
    }

    def twin(url, h):
        s = h or ""
        allr = _re.findall(HREF_ANY_RE, s)
        absr = _re.findall(HREF_ABS_RE, s)
        hosts = [_re.match(HOST_RE, u).group(1).lower()
                 if _re.match(HOST_RE, u) else "" for u in absr]
        ph = _re.match(HOST_RE, url).group(1).lower()
        return (len(allr), len(absr), len(allr) - len(absr),
                sum(1 for x in hosts if x != ph), len(set(hosts)))

    for url, h in pages:
        assert got[url] == twin(url, h), url
    # the uppercase-scheme link: href regex is case-insensitive on the
    # attr but the abs subset requires lowercase scheme (HREF_ABS_RE
    # has no (?i)) -> counted relative by spec
    assert got["https://me.com/p"] == (5, 3, 2, 2, 2)


def test_outlink_census_plan_scan_level(spark):
    from sagan_spark.ops.htmlstats import outlink_census

    df = spark.createDataFrame([("https://a.com/", "x")],
                               "url string, h string").select(
        "url", F.encode("h", "UTF-8").alias("html"))
    plan = outlink_census(df)._jdf.queryExecution().executedPlan().toString()
    assert "Exchange" not in plan and "EvalPython" not in plan
