"""Crawl-snapshot diffing: what changed between two crawls of the web.

Common-Crawl-style pipelines ingest monthly snapshots; the curation
question before any expensive reprocessing is the per-URL delta —
which pages are new, which vanished, which changed content, which are
byte-identical (and can reuse every downstream artifact: extracted
text, dedup clusters, quality scores).  The reference engine's analog
is its dynamic-rule diffing of consecutive loads
(/root/reference/src/processors/dynamic-rules.c — react to what
changed, skip what didn't).

Shape: ONE full outer join keyed by URL between the two snapshot
relations, each pre-collapsed to (url, digest) — content identity by
md5 of the text, not by timestamp (recrawl dates always differ).  At
10^12 URLs this is the textbook co-partitioned big-big join: both
sides hash-exchange on the same url key (or come pre-bucketed by url
in an Iceberg layout, eliminating the exchange entirely); per-URL
fan-out is 1×1 after the collapse, so there is no skew beyond URL
multiplicity itself, which the min-digest collapse removes first.

Verdict per url: 'added' (only in new), 'removed' (only in old),
'changed' (both, digests differ), 'unchanged'.  Counts roll up
map-side.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F


def _collapse(snap: DataFrame, url_col: str, text_col: str) -> DataFrame:
    """(url, digest): min-digest winner when a snapshot carries
    duplicate URLs (multi-capture crawls) — deterministic in any
    partitioning, map-side combinable."""
    return (
        snap.select(
            F.col(url_col).alias("url"),
            F.md5(F.coalesce(F.col(text_col), F.lit(""))).alias("digest"),
        )
        .groupBy("url")
        .agg(F.min("digest").alias("digest"))
    )


def snapshot_diff(old: DataFrame, new: DataFrame, url_col: str = "url",
                  text_col: str = "text") -> DataFrame:
    """(url, verdict, old_digest, new_digest) for every URL in either
    snapshot."""
    o = _collapse(old, url_col, text_col).withColumnRenamed(
        "digest", "old_digest"
    )
    n = _collapse(new, url_col, text_col).withColumnRenamed(
        "digest", "new_digest"
    )
    j = o.join(n, "url", "full_outer")
    verdict = (
        F.when(F.col("old_digest").isNull(), F.lit("added"))
        .when(F.col("new_digest").isNull(), F.lit("removed"))
        .when(F.col("old_digest") == F.col("new_digest"), F.lit("unchanged"))
        .otherwise(F.lit("changed"))
    )
    return j.select("url", verdict.alias("verdict"), "old_digest", "new_digest")


def diff_counts(old: DataFrame, new: DataFrame, url_col: str = "url",
                text_col: str = "text") -> DataFrame:
    """(verdict, n_urls) rollup — the snapshot health dashboard row."""
    return (
        snapshot_diff(old, new, url_col, text_col)
        .groupBy("verdict")
        .agg(F.count(F.lit(1)).alias("n_urls"))
    )


def snapshot_diff_sql(old_rel: str, new_rel: str) -> str:
    """The SAME diff in ANSI SQL over two relations exposing
    (url, text)."""
    def collapse(rel: str, alias: str) -> str:
        return (
            f"(SELECT url, min(md5(coalesce(text, ''))) AS {alias}"
            f" FROM {rel} GROUP BY url)"
        )

    return (
        f"WITH o AS {collapse(old_rel, 'old_digest')},"
        f" n AS {collapse(new_rel, 'new_digest')}"
        " SELECT coalesce(o.url, n.url) AS url,"
        " CASE WHEN o.url IS NULL THEN 'added'"
        " WHEN n.url IS NULL THEN 'removed'"
        " WHEN old_digest = new_digest THEN 'unchanged'"
        " ELSE 'changed' END AS verdict, old_digest, new_digest"
        " FROM o FULL OUTER JOIN n ON o.url = n.url"
    )
