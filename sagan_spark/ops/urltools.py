"""URL / domain operators for training-data pipelines over the
`documents` table: host extraction, registered-domain heuristic,
per-domain corpus rollups, and domain blocklist routing.

Corpus curation at web scale is domain-driven — licensing blocklists,
per-site quotas, domain-level quality priors — so these run before any
per-document text work (the cheapest gate there is: one regex on the
url column, predicate-pushdown-friendly, no Python anywhere).

Scale notes (100 TB posture):
- :func:`with_domain` / :func:`blocklist_filter` are scan-level
  projections/filters — no shuffle; the blocklist is a broadcast hash
  join (LEFT ANTI) when given as a DataFrame, or a literal isin for
  small in-memory lists.
- :func:`domain_rollup` aggregates in TWO levels: a fine-grained
  (domain, host) partial first, then the tiny per-domain rollup.
  Domains are Zipf-skewed, and a single-level countDistinct(host)
  would hold distinct-host state per hot domain (blogspot-style
  domains carry millions of hosts) — the two-level form keeps every
  aggregate algebraic and lets map-side partials absorb the skew.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

# host = authority minus userinfo/port; RE2-compatible so the SAME
# pattern runs in the DuckDB oracle
HOST_RE = r"^[a-zA-Z][a-zA-Z0-9+.-]*://(?:[^/@]*@)?([^/:?#]+)"

# back-compat alias: the registered-domain tables now live in
# sagan_spark.ops.psl (vendored from the public suffix list, with
# wildcard + exception rules); PSL_TWO_LEVEL subsumes the old
# 18-entry heuristic set
from sagan_spark.ops.psl import (  # noqa: E402  (re-export)
    PSL_TWO_LEVEL as TWO_LEVEL_TLDS,
    registered_domain_col,
)


def url_host(url: Column) -> Column:
    """Lower-cased host part of a URL ('' when the URL has no
    authority)."""
    return F.lower(F.regexp_extract(url, HOST_RE, 1))


def registered_domain(host: Column) -> Column:
    """eTLD+1 via the vendored public-suffix tables (ops/psl.py):
    longest-match PSL algorithm with wildcard and exception rules.
    Plain array/when arithmetic over the split host — no Python."""
    return registered_domain_col(host)


def with_domain(docs: DataFrame, url_col: str = "url") -> DataFrame:
    """Adds ``host`` and ``domain`` columns — scan-level projection.
    Refuses to clobber existing columns of those names: a curation
    pipeline often carries a precomputed domain, and silently
    overwriting it is data loss."""
    clash = {"host", "domain"} & set(docs.columns)
    if clash:
        raise ValueError(
            f"with_domain would overwrite existing column(s) {sorted(clash)}; "
            "rename them first or compute url_host/registered_domain directly"
        )
    host = url_host(F.col(url_col))
    return docs.withColumn("host", host).withColumn(
        "domain", registered_domain(F.col("host"))
    )


def domain_rollup(docs: DataFrame, url_col: str = "url",
                  text_col: str = "text") -> DataFrame:
    """Per-domain corpus accounting: (domain, n_docs, n_tokens,
    n_hosts) — the per-site yield table quota/blocklist decisions
    read.  Two-level aggregation (see module scale notes): the
    (domain, host) partial is fine-grained so a Zipf-hot domain never
    accumulates distinct-host state in one task; the domain rollup
    then sums tiny rows.  Tokens use the SAME \\s+ tokenization as
    webclean (one definition, one oracle mirror)."""
    from sagan_spark.ops.webclean import _words

    # internal column names (the _sg_ pattern blocklist_filter uses):
    # the rollup only needs host/domain VALUES and returns none of the
    # input columns, so it must not fail on a corpus that already
    # carries its own host/domain columns (with_domain's clobber guard
    # is for that function's public projection, not for this internal
    # computation)
    toks = F.size(_words(F.col(text_col))).cast("long")
    host = url_host(F.col(url_col))
    per_host = (
        docs.select(
            host.alias("_sg_host"), toks.alias("_toks")
        )
        .withColumn("_sg_domain", registered_domain(F.col("_sg_host")))
        .groupBy("_sg_domain", "_sg_host")
        .agg(
            F.count(F.lit(1)).cast("long").alias("_docs"),
            F.sum("_toks").cast("long").alias("_tokens"),
        )
    )
    return per_host.groupBy("_sg_domain").agg(
        F.sum("_docs").cast("long").alias("n_docs"),
        F.sum("_tokens").cast("long").alias("n_tokens"),
        F.count(F.lit(1)).cast("long").alias("n_hosts"),
    ).withColumnRenamed("_sg_domain", "domain")


def blocklist_filter(docs: DataFrame, blocked, url_col: str = "url",
                     keep: bool = False) -> DataFrame:
    """Drop (or with ``keep=True``, retain only) docs whose registered
    domain is in ``blocked`` — a list of domains or a 1-column
    DataFrame.  List form compiles to a literal isin (pure codegen);
    DataFrame form is a broadcast LEFT ANTI / LEFT SEMI hash join, the
    right plan for blocklists up to millions of rows."""
    # internal column name: never clobbers (or drops) a caller's own
    # host/domain columns
    dom = registered_domain(url_host(F.col(url_col)))
    d = docs.withColumn("_sg_domain", dom)
    if isinstance(blocked, DataFrame):
        bl = blocked.toDF("_sg_domain")
        how = "left_semi" if keep else "left_anti"
        out = d.join(F.broadcast(bl), "_sg_domain", how)
    else:
        cond = F.col("_sg_domain").isin(*list(blocked))
        out = d.filter(cond if keep else ~cond)
    return out.drop("_sg_domain")
