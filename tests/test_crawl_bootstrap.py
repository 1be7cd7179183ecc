"""End-to-end crawl-bootstrap loop on a scaffold site whose interior
navigation is RELATIVE (the real-web shape): robots → sitemap seeds →
link extraction with RFC 3986 resolution → frontier mining → robots
screen → politeness schedule.  The proof that the r5 relative-href
recall fix matters: every interior page is discovered through
relative links only (VERDICT r4 next-round task #8)."""

from __future__ import annotations

from pyspark.sql import functions as F

from sagan_spark.ops.linkgraph import (
    extract_links,
    frontier_candidates,
    frontier_schedule,
)
from sagan_spark.ops.robotstxt import (
    crawl_delays,
    parse_robots,
    robots_sitemaps,
    url_robots_screen,
)
from sagan_spark.ops.sitemap import parse_sitemap

ROBOTS = (
    "User-agent: *\n"
    "Disallow: /private\n"
    "Crawl-delay: 2\n"
    "Sitemap: https://site.example/sitemap.xml\n"
)

SITEMAP = (
    '<?xml version="1.0"?><urlset>'
    "<url><loc>https://site.example/docs/</loc></url>"
    "<url><loc>https://site.example/blog/index.html</loc></url>"
    "</urlset>"
)

#: the two crawled seed pages — ALL interior links are relative
PAGES = [
    (
        "https://site.example/docs/",
        "<html><body>"
        "<a href='guide.html'>guide</a>"           # -> /docs/guide.html
        '<a href="../blog/post1">post</a>'         # -> /blog/post1
        "<a href=/private/secret>secret</a>"       # robots-disallowed
        '<a href="./api/">api</a>'                 # -> /docs/api/
        "</body></html>",
    ),
    (
        "https://site.example/blog/index.html",
        "<html><body>"
        '<a href="post1">post again</a>'           # -> /blog/post1 (2nd ref)
        "<a href='../docs/'>docs</a>"              # crawled -> anti-joined
        "<a href=//cdn.example/lib.js>lib</a>"     # scheme-relative, ext
        "</body></html>",
    ),
]


def _pages(spark):
    return spark.createDataFrame(PAGES, "url string, html string").select(
        "url", F.encode("html", "UTF-8").alias("html")
    )


def test_crawl_bootstrap_loop(spark):
    robots = spark.createDataFrame(
        [("site.example", ROBOTS)], "domain string, robots_txt string"
    )

    # 1. robots: sitemap discovery + delay + path rules
    sitemaps = [r.sitemap_url for r in robots_sitemaps(robots).collect()]
    assert sitemaps == ["https://site.example/sitemap.xml"]
    delays = crawl_delays(robots)
    assert [(r.domain, r.crawl_delay_sec) for r in delays.collect()] == [
        ("site.example", 2)
    ]

    # 2. sitemap seeds == the crawled set
    sm = spark.createDataFrame(
        [("https://site.example/sitemap.xml", SITEMAP)],
        "url string, html string",
    ).select("url", F.encode("html", "UTF-8").alias("html"))
    seeds = sorted(r.loc for r in parse_sitemap(sm).collect())
    assert seeds == sorted(u for u, _ in PAGES)

    # 3. relative navigation resolves into real edges
    links = sorted(r.dst_url for r in extract_links(_pages(spark)).collect())
    assert links == sorted([
        "https://site.example/docs/guide.html",
        "https://site.example/blog/post1",
        "https://site.example/private/secret",
        "https://site.example/docs/api/",
        "https://site.example/blog/post1",
        "https://site.example/docs/",
        "https://cdn.example/lib.js",
    ])

    # 4. frontier: interior pages found, crawled seeds anti-joined out
    frontier = frontier_candidates(_pages(spark), k=10)
    got = {
        r.url: (r.domain, r.n_refs, r.rank) for r in frontier.collect()
    }
    assert got == {
        "https://site.example/blog/post1": ("site.example", 2, 1),
        "https://site.example/docs/api/": ("site.example", 1, 2),
        "https://site.example/docs/guide.html": ("site.example", 1, 3),
        "https://site.example/private/secret": ("site.example", 1, 4),
        "https://cdn.example/lib.js": ("cdn.example", 1, 1),
    }

    # 5. robots screen drops /private, keeps the rest
    rules = parse_robots(robots)
    screened = url_robots_screen(
        frontier.select("url"), rules, id_col="url"
    ).select(F.col("url"), "robots_allowed")
    verdicts = {r.url: r.robots_allowed for r in screened.collect()}
    assert verdicts["https://site.example/private/secret"] is False
    assert sum(verdicts.values()) == 4

    allowed = frontier.join(
        screened.filter("robots_allowed").select("url"), "url", "left_semi"
    )

    # 6. politeness schedule: site.example honors its declared 2s delay
    plan = frontier_schedule(allowed, delays, default_delay_sec=5)
    sched = {
        r.url: (r.delay_sec, r.fetch_offset_sec) for r in plan.collect()
    }
    assert sched["https://site.example/blog/post1"] == (2, 0)
    assert sched["https://site.example/docs/api/"] == (2, 2)
    assert sched["https://site.example/docs/guide.html"] == (2, 4)
    # undeclared domain falls back to the default
    assert sched["https://cdn.example/lib.js"] == (5, 0)
