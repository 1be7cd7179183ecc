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

#: absolute-link anchors; same pattern string parses in Java regex and
#: RE2 (no lookaround).  Group 1 = target url, group 2 = anchor text.
ANCHOR_RE = r'<a href="(https?://[^"#]+)"[^>]*>([^<]*)</a>'


def extract_anchors(pages: DataFrame, html_col: str = "html",
                    url_col: str = "url") -> DataFrame:
    """(src_url, dst_url, anchor) triples; anchors are trimmed and
    empty ones dropped.  Binary ``html`` is UTF-8 decoded (the pages
    contract, BASELINE.json input_hint)."""
    html = F.col(html_col)
    decoded = (
        F.decode(html, "UTF-8")
        if dict(pages.dtypes)[html_col] == "binary"
        else html
    )
    pairs = F.zip_with(
        F.regexp_extract_all(decoded, F.lit(ANCHOR_RE), F.lit(1)),
        F.regexp_extract_all(decoded, F.lit(ANCHOR_RE), F.lit(2)),
        lambda u, a: F.struct(u.alias("dst_url"), a.alias("anchor")),
    )
    return (
        pages.select(
            F.col(url_col).alias("src_url"),
            F.explode(pairs).alias("p"),
        )
        .select(
            "src_url",
            F.col("p.dst_url").alias("dst_url"),
            F.trim(F.col("p.anchor")).alias("anchor"),
        )
        .filter(F.col("anchor") != "")
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
