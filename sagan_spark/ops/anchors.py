"""Anchor-text mining: (source url, target url, anchor text) triples
from raw html, and the top anchor strings per target registered
domain.

Anchor text is the web's free labeling signal — retrieval sets
(MS MARCO-style), title/query generation, and entity dictionaries are
built from exactly this rollup; the reference engine's closest analog
is its reputation enrichment (the lookup TABLE here is mined from the
corpus, like ops/linkgraph.pagerank).

Scale shape:

- extraction is scan-level: one decoded regex pass produces BOTH
  capture groups (``regexp_extract_all`` with group 1 then group 2 on
  the same pattern — two passes over the row, zero shuffles),
  ``zip_with`` pairs them positionally, explode, drop empty anchors;
- the rollup aggregates (domain, anchor) counts map-side — a hot
  domain's repeated anchors ("click here" x 10^9) collapse before the
  exchange;
- per-domain top-k is :func:`sagan_spark.ops.topk.topk_per_group`
  (salted two-stage rank) so google.com's anchor-vocabulary never
  funnels one sorting task.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

#: anchor spans with their attribute blob (group 1, '' for bare
#: ``<a>``) and visible body (group 2): any attribute order/quoting,
#: case-insensitive, dot-matches-newline body (non-greedy to the
#: first ``</a>``) — identical semantics in Java regex and RE2.
ANCHOR_RE = r"(?is)<a([ \t\r\n\f][^>]*)?>(.*?)</a[ \t\r\n\f]*>"
#: href attribute inside ONE span's attribute blob — the same
#: three-alternative value grammar as linkgraph.HREF_RE, anchored to
#: a delimiter so ``data-href=`` never matches (the blob always
#: starts with whitespace, so '^|' is unreachable-but-safe).
ATTR_HREF_RE = (
    r"(?is)(?:^|[ \t\r\n\f\"'])href[ \t\r\n\f]*=[ \t\r\n\f]*"
    r"(?:\"([^\"]*)\"|'([^']*)'|([^ \t\r\n\f>\"'][^ \t\r\n\f>]*))"
)


def extract_anchors(pages: DataFrame, html_col: str = "html",
                    url_col: str = "url") -> DataFrame:
    """(src_url, dst_url, anchor) triples from real-web HTML: one
    two-group span pass (attribute blob + body, positionally zipped),
    explode, then per-span scalar work — href pulled from the blob
    with the three-quote-form grammar (``ATTR_HREF_RE``), RESOLVED
    against the page url (ops/urlresolve — relative/scheme-relative
    anchors become real targets), body reduced to visible text (the
    ops/htmlstats inner-text chain).  Spans with no href, non-http(s)
    targets, and empty anchors drop.  Binary ``html`` is UTF-8
    decoded (the pages contract, BASELINE.json input_hint)."""
    from sagan_spark.ops.htmlstats import _inner_text
    from sagan_spark.ops.linkgraph import _decoded_html
    from sagan_spark.ops.urlresolve import href_value, resolve_url

    decoded = _decoded_html(pages, html_col)
    pairs = F.zip_with(
        F.regexp_extract_all(decoded, F.lit(ANCHOR_RE), F.lit(1)),
        F.regexp_extract_all(decoded, F.lit(ANCHOR_RE), F.lit(2)),
        lambda attrs, body: F.struct(
            attrs.alias("attrs"), body.alias("body")
        ),
    )
    spans = pages.select(
        F.col(url_col).alias("src_url"),
        F.explode(pairs).alias("p"),
    )
    a = F.col("p.attrs")
    raw_href = (
        F.when(
            F.regexp_extract(a, ATTR_HREF_RE, 1) != "",
            F.regexp_extract(a, ATTR_HREF_RE, 1),
        )
        .when(
            F.regexp_extract(a, ATTR_HREF_RE, 2) != "",
            F.regexp_extract(a, ATTR_HREF_RE, 2),
        )
        .otherwise(F.regexp_extract(a, ATTR_HREF_RE, 3))
    )
    return (
        spans.select(
            "src_url",
            href_value(raw_href).alias("_ref"),
            _inner_text(F.col("p.body")).alias("anchor"),
        )
        # no-href spans, self-references, same-page '#…' targets, and
        # empty anchors all drop (extract_links discipline)
        .where(
            (F.col("_ref") != "")
            & ~F.col("_ref").startswith("#")
            & (F.col("anchor") != "")
        )
        .select(
            "src_url",
            resolve_url(F.col("src_url"), F.col("_ref")).alias("dst_url"),
            "anchor",
        )
        .where(F.col("dst_url").rlike(r"^https?://"))
    )


def anchor_domain_topk(anchors: DataFrame, k: int = 10,
                       salt_buckets: int = 64) -> DataFrame:
    """Top-``k`` anchor strings per target registered domain as
    (domain, anchor, n_links, rank); anchors fold to lowercase, ties
    rank anchor-ascending."""
    from sagan_spark.ops.topk import topk_per_group
    from sagan_spark.ops.urltools import registered_domain, url_host

    counts = (
        anchors.select(
            registered_domain(url_host(F.col("dst_url"))).alias("domain"),
            F.lower(F.col("anchor")).alias("anchor"),
        )
        .groupBy("domain", "anchor")
        .agg(F.count(F.lit(1)).alias("n_links"))
    )
    return topk_per_group(
        counts, ["domain"],
        [F.desc("n_links"), F.asc("anchor")],
        k=k, salt_on="anchor", salt_buckets=salt_buckets,
    ).select("domain", "anchor", "n_links", "rank")
