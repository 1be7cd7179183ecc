

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
