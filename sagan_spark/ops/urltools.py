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
# pattern runs in the DuckDB oracle.  The userinfo clause must not
# cross '?' or '#': an '@' inside the query of a path-less URL
# ('https://a.com?email=x@b.com') would otherwise pull the host out of
# the query string.
HOST_RE = r"^[a-zA-Z][a-zA-Z0-9+.-]*://(?:[^/?#@]*@)?([^/:?#]+)"

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
    Plain array/when arithmetic over the split host — no Python.
    NOTE: do NOT let-bind ``host`` through a higher-order function
    here — that would evict the whole ladder from whole-stage codegen
    into interpreted eval (measured 1.5x slower end-to-end); Catalyst
    already refuses to collapse an expensive multi-referenced
    projection into the ladder, so composed host expressions (e.g.
    resolver outputs) stay single-evaluation anyway."""
    return registered_domain_col(host)


# canonicalization component patterns — RE2-compatible, same strings
# run in the DuckDB oracle
SCHEME_RE = r"^([a-zA-Z][a-zA-Z0-9+.-]*)://"
PORT_RE = r"^[a-zA-Z][a-zA-Z0-9+.-]*://(?:[^/?#@]*@)?[^/:?#]+:([0-9]+)"
PATH_RE = r"^[a-zA-Z][a-zA-Z0-9+.-]*://[^/?#]*([^?#]*)"
# query = first '?' BEFORE any '#': a '?' appearing only inside the
# fragment is not a query (lazy [^#]*? keeps the scan left-anchored)
QUERY_RE = r"^[^#]*?\?([^#]*)"
# tracking parameters dropped during canonicalization (public
# convention: Google/Facebook/Microsoft/Mailchimp click identifiers);
# (=|$) also catches the valueless form ('?fbclid')
TRACKING_PARAM_RE = r"^(utm_[^=]*|fbclid|gclid|msclkid|mc_cid|mc_eid)(=|$)"


def url_canonicalize(url: Column) -> Column:
    """Canonical URL for exact URL-level dedup (the first dedup pass a
    Common-Crawl-style snapshot pipeline runs, before any content
    work): lowercase scheme and host, strip userinfo and fragment,
    drop default ports (http:80 / https:443), empty path -> '/',
    query params sorted with empty and tracking params removed.
    URLs with no scheme://host authority pass through unchanged (no
    guesswork on relative references).  Pure codegen — regex splits +
    array higher-order ops, no Python, scan-level."""
    scheme = F.lower(F.regexp_extract(url, SCHEME_RE, 1))
    host = url_host(url)
    port = F.regexp_extract(url, PORT_RE, 1)
    path = F.regexp_extract(url, PATH_RE, 1)
    query = F.regexp_extract(url, QUERY_RE, 1)
    params = F.array_sort(
        F.filter(
            F.split(query, "&"),
            lambda p: (p != "") & ~p.rlike(TRACKING_PARAM_RE),
        )
    )
    keep_port = (port != "") & ~(
        ((scheme == "http") & (port == "80"))
        | ((scheme == "https") & (port == "443"))
    )
    canon = F.concat(
        scheme,
        F.lit("://"),
        host,
        F.when(keep_port, F.concat(F.lit(":"), port)).otherwise(F.lit("")),
        F.when(path == "", F.lit("/")).otherwise(path),
        F.when(
            F.size(params) > 0,
            F.concat(F.lit("?"), F.array_join(params, "&")),
        ).otherwise(F.lit("")),
    )
    return F.when((scheme == "") | (host == ""), url).otherwise(canon)


def url_canonicalize_sql(url_expr: str) -> str:
    """The SAME canonicalization as :func:`url_canonicalize` as ONE
    composable ANSI-SQL scalar expression over a url expression — the
    oracle-side source of truth (DuckDB's regexp_extract returns NULL
    on no match where Spark returns '', hence the coalesces)."""
    u = f"({url_expr})"
    scheme = f"coalesce(lower(regexp_extract({u}, '{SCHEME_RE}', 1)), '')"
    host = f"coalesce(lower(regexp_extract({u}, '{HOST_RE}', 1)), '')"
    port = f"coalesce(regexp_extract({u}, '{PORT_RE}', 1), '')"
    path = f"coalesce(regexp_extract({u}, '{PATH_RE}', 1), '')"
    query = f"coalesce(regexp_extract({u}, '{QUERY_RE}', 1), '')"
    params = (
        f"list_sort(list_filter(str_split({query}, '&'),"
        f" p -> p <> '' AND NOT regexp_matches(p, '{TRACKING_PARAM_RE}')))"
    )
    keep_port = (
        f"({port} <> '' AND NOT (({scheme} = 'http' AND {port} = '80')"
        f" OR ({scheme} = 'https' AND {port} = '443')))"
    )
    canon = (
        f"{scheme} || '://' || {host} ||"
        f" (CASE WHEN {keep_port} THEN ':' || {port} ELSE '' END) ||"
        f" (CASE WHEN {path} = '' THEN '/' ELSE {path} END) ||"
        f" (CASE WHEN len({params}) > 0"
        f"  THEN '?' || array_to_string({params}, '&') ELSE '' END)"
    )
    return (
        f"(CASE WHEN {scheme} = '' OR {host} = '' THEN {u}"
        f" ELSE {canon} END)"
    )


def dedup_by_url(docs: DataFrame, url_col: str = "url",
                 id_col: str = "doc_id") -> DataFrame:
    """URL-level exact dedup: one winner (min ``id_col``) per canonical
    URL.  Returns (doc_id, canonical_url).  A single map-side-combining
    aggregation on the canonical string — a hot URL crawled 10^6 times
    combines to one pair per map task before the shuffle; no window,
    no per-key sort.

    Rows with a NULL url pass through UNGROUPED: a missing-metadata
    column is not evidence of duplication, and letting groupBy collapse
    the NULL group would silently drop every other NULL-url document."""
    c = docs.select(
        F.col(id_col), url_canonicalize(F.col(url_col)).alias("canonical_url")
    )
    winners = (
        c.filter(F.col("canonical_url").isNotNull())
        .groupBy("canonical_url")
        .agg(F.min(id_col).alias(id_col))
        .select(id_col, "canonical_url")
    )
    return winners.unionByName(
        c.filter(F.col("canonical_url").isNull()).select(id_col, "canonical_url")
    )


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


# path-template segment classes: pure-numeric ids and long hex-ish ids
# collapse to placeholders; everything else is a literal segment.  Both
# patterns sit in the RE2 ∩ Java subset (anchored, explicit classes).
TEMPLATE_NUM_RE = r"^[0-9]+$"
TEMPLATE_HEX_RE = r"^[0-9a-f]{8,}$"


def url_path_template(url: Column) -> Column:
    """The URL's path with id-like segments collapsed —
    '/product/12345/view' and '/product/99/view' both become
    '/product/{n}/view'.  Pure codegen: split, per-segment CASE,
    rejoin."""
    path_raw = F.regexp_extract(url, PATH_RE, 1)
    path = F.when(path_raw == "", F.lit("/")).otherwise(path_raw)
    seg = lambda x: (  # noqa: E731
        F.when(x.rlike(TEMPLATE_NUM_RE), F.lit("{n}"))
        .when(x.rlike(TEMPLATE_HEX_RE), F.lit("{hex}"))
        .otherwise(x)
    )
    return F.array_join(F.transform(F.split(path, "/"), seg), "/")


def url_template_mining(docs: DataFrame, url_col: str = "url",
                        min_urls: int = 2) -> DataFrame:
    """(template, n_urls, n_domains): the URL-shape census of a crawl
    — which path templates dominate ('/product/{n}', '/user/{hex}'),
    and whether a shape is one site's artifact or web-wide.  Crawl
    frontiers read this to cap template explosions (calendar pages,
    session-id labyrinths) before they eat the fetch budget; the
    reference's analog is its own repeating-pattern ignore list
    (src/sagan-config.c ignore_list).

    Scale shape: one scan-level template projection, then the
    domain_rollup two-level aggregation — the (template, domain)
    partial bounds per-task state so a web-wide template ('/{n}')
    never accumulates distinct-domain state in one task; the template
    rollup sums tiny rows.  ``min_urls`` prunes the hapax tail AFTER
    counting (counts stay exact)."""
    t = url_path_template(F.col(url_col))
    d = registered_domain(url_host(F.col(url_col)))
    per_dom = (
        docs.select(t.alias("template"), d.alias("_sg_domain"))
        .groupBy("template", "_sg_domain")
        .agg(F.count(F.lit(1)).alias("_n"))
    )
    return (
        per_dom.groupBy("template")
        .agg(
            F.sum("_n").cast("long").alias("n_urls"),
            F.count(F.lit(1)).cast("long").alias("n_domains"),
        )
        .filter(F.col("n_urls") >= F.lit(int(min_urls)))
    )


def url_surt(url: Column) -> Column:
    """SURT (Sort-Friendly URI Reordering Transform) key — the web
    archive community's canonical index-sort key (the public
    convention behind Common Crawl's CDX index and the Internet
    Archive's surt library): host labels reversed and comma-joined,
    one leading 'www.' label stripped, then ')' plus the lower-cased
    path — 'https://www.News.Example.co.uk/A/b' ->
    'uk,co,example,news)/a/b'.  All pages of a site (and of a
    registrable-domain subtree) are CONTIGUOUS under the key's sort
    order, which is what makes range-sharded crawl indexes scan a
    domain with one bounded seek instead of a full-index filter.
    Query strings are deliberately excluded (the key names the page
    slot, not the variant; canonicalize first if variants matter).
    NULL for URLs with no authority (mailto:).  Pure codegen: two
    regexp extracts, split, reverse, array_join."""
    host = url_host(url)
    h = F.regexp_replace(host, r"^www\.", "")
    rev = F.array_join(F.reverse(F.split(h, r"\.")), ",")
    path_raw = F.regexp_extract(url, PATH_RE, 1)
    path = F.when(path_raw == "", F.lit("/")).otherwise(F.lower(path_raw))
    return F.when(host == F.lit(""), F.lit(None).cast("string")).otherwise(
        F.concat(rev, F.lit(")"), path)
    )


def surt_shard_census(docs: DataFrame, n_shards: int = 16,
                      url_col: str = "url") -> DataFrame:
    """(shard, n_urls, surt_min, surt_max): the shard-assignment
    census for writing a crawl index.  Shard = md5-hash of the SURT
    key mod n_shards (deterministic everywhere — the same page lands
    in the same shard on any cluster, so incremental index builds
    append without reshuffling history); per-shard min/max SURT keys
    are what a reader consults to prune shards.  No-authority URLs
    land in shard -1 (the reject bucket, kept so reject counts are
    audited rather than dropped — the k7 fan-out discipline).

    Scale shape (100 TB posture): one scan-level projection + one
    groupBy(shard) whose count/min/max all partial-aggregate
    map-side — the shuffle is n_shards rows per task regardless of
    corpus size.  Hash sharding cannot skew beyond md5 uniformity;
    the SURT ORDER survives within each shard via the min/max fences
    (a full range-sharded layout would sort by the key itself —
    that's a writer concern, repartitionByRange(surt), same column)."""
    if n_shards < 1:
        raise ValueError(f"n_shards must be >= 1, got {n_shards}")
    shard = F.when(
        F.col("_sg_surt").isNull(), F.lit(-1)
    ).otherwise(
        F.expr(
            "pmod(cast(conv(substr(md5(_sg_surt), 1, 15), 16, 10) as bigint),"
            f" {int(n_shards)})"
        )
    ).cast("long")
    return (
        docs.select(url_surt(F.col(url_col)).alias("_sg_surt"))
        .select(F.col("_sg_surt"), shard.alias("shard"))
        .groupBy("shard")
        .agg(
            F.count(F.lit(1)).cast("long").alias("n_urls"),
            F.min("_sg_surt").alias("surt_min"),
            F.max("_sg_surt").alias("surt_max"),
        )
    )
