

def test_robots_sitemaps_directive_forms(spark):
    from sagan_spark.ops.robotstxt import robots_sitemaps

    body = (
        "User-agent: *\nDisallow: /x\n"
        "Sitemap: https://a.com/s1.xml\r\n"
        "sitemap:   https://a.com/s2.xml\n"
        "SITEMAP: https://a.com/s3.xml\n"
        "# Sitemap: https://a.com/commented.xml\n"
        "NotSitemap: https://a.com/no.xml\n"
    )
    df = spark.createDataFrame(
        [("a.com", body), ("b.com", ""), ("c.com", None)],
        "domain string, robots_txt string",
    )
    got = sorted(
        (r.domain, r.sitemap_url) for r in robots_sitemaps(df).collect()
    )
    assert got == [
        ("a.com", "https://a.com/s1.xml"),
        ("a.com", "https://a.com/s2.xml"),
        ("a.com", "https://a.com/s3.xml"),
    ]


def test_crawl_delays_groups_and_forms(spark):
    """Crawl-delay: applicable-group max wins, inapplicable groups are
    ignored, fractional values are out of spec, delay-less files are
    absent, and the parse_robots refactor still sees its rules."""
    from sagan_spark.ops.robotstxt import crawl_delays, parse_robots

    body_a = (
        "User-agent: googlebot\nCrawl-delay: 30\nDisallow: /g\n"
        "\n"
        "User-agent: *\nCrawl-delay: 2\nDisallow: /x\n"
        "\n"
        "User-agent: mybot\nCrawl-delay: 7\nAllow: /\n"
    )
    body_b = "User-agent: *\nCrawl-delay: 0.5\nDisallow: /y\n"  # fractional
    body_c = "User-agent: *\nDisallow: /z\n"                     # none
    df = spark.createDataFrame(
        [("a.com", body_a), ("b.com", body_b), ("c.com", body_c)],
        "domain string, robots_txt string",
    )
    got = {
        r.domain: r.crawl_delay_sec
        for r in crawl_delays(df, agent="mybot").collect()
    }
    # googlebot group inapplicable to mybot; * (2) and mybot (7): max=7
    assert got == {"a.com": 7}
    star = {
        r.domain: r.crawl_delay_sec for r in crawl_delays(df).collect()
    }
    assert star == {"a.com": 2}  # only the * group applies to '*'
    # the refactored shared walk still produces the rule rows
    rules = parse_robots(df, agent="mybot").collect()
    assert any(r.domain == "a.com" and r.prefix == "/x" for r in rules)


def test_frontier_schedule_offsets(spark):
    from pyspark.sql import functions as F

    from sagan_spark.ops.linkgraph import frontier_candidates, frontier_schedule

    pages = spark.createDataFrame(
        [("https://me.com/",
          '<a href="https://ext.org/a">1</a><a href="https://ext.org/b">2</a>'
          '<a href="https://slow.net/x">3</a>')],
        "url string, h string",
    ).select("url", F.encode("h", "UTF-8").alias("html"))
    delays = spark.createDataFrame(
        [("ext.org", 10)], "domain string, crawl_delay_sec long"
    )
    got = {
        (r.domain, r.rank): (r.delay_sec, r.fetch_offset_sec)
        for r in frontier_schedule(
            frontier_candidates(pages, k=5), delays, default_delay_sec=2
        ).collect()
    }
    assert got[("ext.org", 1)] == (10, 0)
    assert got[("ext.org", 2)] == (10, 10)
    assert got[("slow.net", 1)] == (2, 0)

    import pytest as _pytest
    with _pytest.raises(ValueError):
        frontier_schedule(
            frontier_candidates(pages, k=5), delays, default_delay_sec=-1
        )
