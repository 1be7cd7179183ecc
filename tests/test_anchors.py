"""Anchor mining: hand-built html pins extraction (quote/order/case
forms, relative-href resolution, inner-text anchors, no-href and
empty-anchor drop), the domain rollup folds case and ranks (count
desc, anchor asc), and topk_per_group is bucket-count invariant (the
two-stage rank equals the global window for any salt_buckets)."""

from __future__ import annotations

from pyspark.sql import functions as F

from sagan_spark.ops.anchors import anchor_domain_topk, extract_anchors
from sagan_spark.ops.topk import topk_per_group

PAGES = [
    (
        "https://a.example/d/1",
        '<a href="https://x.com/p">Home Page</a>'
        "<a href='/rel'>root relative</a>"
        '<a rel=nofollow href=../up>unquoted second attr</a>'
        '<a href="https://y.co.uk/q" rel="nofollow">  Docs  </a>'
        '<a href="https://x.com/r"></a>'
        '<a href="https://x.com/s"><b>home</b> page</a>'
        '<a href="#top">same page</a>'
        "<a name='no-href'>not a link</a>",
    ),
    (
        "https://b.example/2",
        '<A\nHREF="https://sub.x.com/t">HOME PAGE</A><p>no links here</p>',
    ),
    ("https://c.example/3", "<p>nothing</p>"),
]


def _pages_df(spark):
    return spark.createDataFrame(PAGES, "url string, html string").select(
        "url", F.encode("html", "UTF-8").alias("html")
    )


def test_extract_anchors(spark):
    got = sorted(
        (r.src_url, r.dst_url, r.anchor)
        for r in extract_anchors(_pages_df(spark)).collect()
    )
    assert got == [
        ("https://a.example/d/1", "https://a.example/rel", "root relative"),
        ("https://a.example/d/1", "https://a.example/up",
         "unquoted second attr"),
        ("https://a.example/d/1", "https://x.com/p", "Home Page"),
        ("https://a.example/d/1", "https://x.com/s", "home page"),
        ("https://a.example/d/1", "https://y.co.uk/q", "Docs"),
        ("https://b.example/2", "https://sub.x.com/t", "HOME PAGE"),
    ]


def test_anchor_domain_topk(spark):
    got = sorted(
        (r.domain, r.anchor, r.n_links, r.rank)
        for r in anchor_domain_topk(extract_anchors(_pages_df(spark)), k=5).collect()
    )
    # x.com collects both case variants and the subdomain link;
    # y.co.uk exercises the PSL two-level suffix; the resolved
    # relative targets roll up under the page's own domain
    assert got == [
        ("a.example", "root relative", 1, 1),
        ("a.example", "unquoted second attr", 1, 2),
        ("x.com", "home page", 3, 1),
        ("y.co.uk", "docs", 1, 1),
    ]


def test_topk_per_group_bucket_invariant(spark):
    rows = [(g, i, (i * 7) % 13) for g in ("a", "b") for i in range(40)]
    df = spark.createDataFrame(rows, "g string, i int, v int")
    order = [F.desc("v"), F.asc("i")]

    def run(buckets):
        return sorted(
            (r.g, r.i, r.v, r.rank)
            for r in topk_per_group(
                df, ["g"], order, k=5, salt_on="i", salt_buckets=buckets
            ).collect()
        )

    assert run(1) == run(3) == run(64)
    assert len(run(1)) == 10 and all(r[3] <= 5 for r in run(1))
