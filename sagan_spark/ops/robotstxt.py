"""robots.txt parsing and URL crawl-permission screening (RFC 9309).

Common-Crawl-class corpora must honor robots exclusion before a page
may enter a training set; the in-page ``<meta name=robots>`` screen
(ops/htmltext.robots_directives) covers the page-level opt-out, this
module covers the SITE-level one: parse each host's robots.txt into a
rules table, then screen every page URL by the longest-matching rule.
The reference engine's analog is its drop-before-parse ignore list
(/root/reference/src/sagan-config.c ignore_list) — a site-scoped
pre-filter evaluated before any expensive work.

Two operators:

- :func:`parse_robots` — robots.txt body → (domain, group, applies,
  rule_type, prefix) rule rows.  Group assignment (a rule belongs to
  the most recent run of consecutive ``User-agent`` lines above it)
  needs an ordered scan PER FILE, expressed as windows partitioned by
  domain — bounded by the file's own line count (robots.txt is
  couple-of-KB data; the crawler convention caps it at 500 KiB), never
  by corpus size, so the partition-per-domain window is scale-safe by
  construction.
- :func:`url_robots_screen` — pages × applicable rules on the host
  key, longest-prefix match wins, Allow wins length ties (RFC 9309
  §2.2.2), no matching rule (or no robots.txt) = allowed.  The join
  fan-out per page is the host's rule count (dozens), map-side
  max-combined before the shuffle; a hot host is many pages × few
  rules, so there is no skew beyond the pages' own distribution.

Declared spec (documented simplifications, same class as the HTML
extractor's): ``*``/``$`` wildcards inside rule paths are treated as
literals (RFC 9309 §2.2.3 marks wildcard support optional), agent
matching is exact-token or ``*`` (no product-token prefix match), and
rule paths are compared as raw strings (no percent-decoding).  All
patterns sit in the RE2 ∩ Java subset; :func:`robots_rules_sql` /
:func:`robots_screen_sql` emit the oracle from the same constants.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame, Window
from pyspark.sql import functions as F

from sagan_spark.ops.htmltext import _sql_quote

# line splitter tolerates \r\n and bare \n; '#' starts a comment
LINE_SEP = "\n"
UA_RE = r"(?i)^user-agent:[ \t]*([^ \t].*)$"
ALLOW_RE = r"(?i)^(allow|disallow):[ \t]*([^ \t].*)$"


def _clean_line(line: Column) -> Column:
    """Strip comment, CR, and surrounding blanks — the per-line
    normalization both field regexes assume."""
    return F.trim(F.regexp_replace(F.split_part(line, F.lit("#"), F.lit(1)),
                                   F.lit(r"\r"), F.lit("")))


def _group_tagged(robots: DataFrame, body_col: str, domain_col: str,
                  agent: str) -> tuple[DataFrame, DataFrame]:
    """Shared RFC-group walk: the per-line tagged frame (domain, pos,
    ua_val, rule_type, prefix, line, group_id) and the per-group
    applies set.  Windows are partitioned per FILE (bounded by its
    line count by construction, never corpus size)."""
    lines = robots.select(
        F.col(domain_col).alias("domain"),
        F.posexplode(F.split(F.col(body_col), F.lit(LINE_SEP))).alias(
            "pos", "raw"
        ),
    ).withColumn("line", _clean_line(F.col("raw")))
    ua_val = F.lower(F.trim(F.regexp_extract(F.col("line"), UA_RE, 1)))
    rule_type = F.lower(F.regexp_extract(F.col("line"), ALLOW_RE, 1))
    prefix = F.trim(F.regexp_extract(F.col("line"), ALLOW_RE, 2))
    w = (
        Window.partitionBy("domain")
        .orderBy("pos")
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    )
    is_ua = ua_val != ""
    prev_ua = F.lag(is_ua.cast("int"), 1, 0).over(
        Window.partitionBy("domain").orderBy("pos")
    )
    run_start = (is_ua & (prev_ua == 0)).cast("long")
    tagged = lines.select(
        "domain", "pos", "line",
        ua_val.alias("ua_val"),
        rule_type.alias("rule_type"),
        prefix.alias("prefix"),
        F.sum(run_start).over(w).alias("group_id"),
    )
    applies_set = (
        tagged.filter(F.col("ua_val") != "")
        .groupBy("domain", "group_id")
        .agg(
            F.max(
                F.col("ua_val").isin("*", agent.lower()).cast("int")
            ).alias("applies_i")
        )
    )
    return tagged, applies_set


def parse_robots(robots: DataFrame, body_col: str = "robots_txt",
                 domain_col: str = "domain",
                 agent: str = "*") -> DataFrame:
    """robots.txt bodies → one row per Allow/Disallow rule:
    (domain, group_id, applies, rule_type, prefix).

    ``applies`` is true when the rule's group names ``agent`` or
    ``*``.  Rules with an empty path are dropped (an empty Disallow
    permits everything — it is the absence of a rule, RFC 9309
    §2.2.2).  Group walk: ``group_id`` counts starts of User-agent
    runs (a UA line whose previous line is not a UA line) at or before
    each line; every line therefore carries the id of the most recent
    UA run above it, which IS its RFC group."""
    tagged, applies_set = _group_tagged(robots, body_col, domain_col, agent)
    return (
        tagged.filter((F.col("rule_type") != "") & (F.col("prefix") != ""))
        .join(applies_set, ["domain", "group_id"])
        .select(
            "domain", "group_id",
            (F.col("applies_i") == 1).alias("applies"),
            "rule_type", "prefix",
        )
    )


CRAWL_DELAY_RE = r"(?i)^crawl-delay:[ \t]*([0-9]+)$"


def crawl_delays(robots: DataFrame, body_col: str = "robots_txt",
                 domain_col: str = "domain",
                 agent: str = "*") -> DataFrame:
    """Per-domain ``Crawl-delay`` (the de-facto politeness directive
    robots.txt carries alongside the RFC 9309 rules): the MAXIMUM
    delay over groups applicable to ``agent`` — the conservative
    (most polite) reading when a file names both ``*`` and the agent;
    this module's group model treats both as applicable (the
    parse_robots simplification), so taking the max can never
    under-throttle relative to either group's intent.  Integer
    seconds only (digits-only value; the nonstandard fractional form
    is ignored).  Domains whose file declares no applicable delay are
    absent.  Returns (domain, crawl_delay_sec)."""
    tagged, applies_set = _group_tagged(robots, body_col, domain_col, agent)
    delay = F.regexp_extract(F.col("line"), CRAWL_DELAY_RE, 1)
    return (
        tagged.withColumn("_sg_d", delay)
        .filter(F.col("_sg_d") != "")
        .join(applies_set, ["domain", "group_id"])
        .filter(F.col("applies_i") == 1)
        .groupBy("domain")
        .agg(F.max(F.col("_sg_d").cast("long")).alias("crawl_delay_sec"))
    )


def url_robots_screen(pages: DataFrame, rules: DataFrame,
                      url_col: str = "url",
                      id_col: str = "doc_id") -> DataFrame:
    """(id, url, robots_allowed) per page: longest matching applicable
    rule decides; Allow wins equal-length ties; no match = allowed.

    The winner is an argmax over (prefix length, is_allow) — an
    algebraic max of a struct, map-side combinable, so the per-page
    state crossing the shuffle is one struct regardless of how many
    rules matched."""
    from sagan_spark.ops.urltools import PATH_RE, url_host

    host = url_host(F.col(url_col))
    path_raw = F.regexp_extract(F.col(url_col), PATH_RE, 1)
    path = F.when(path_raw == "", F.lit("/")).otherwise(path_raw)
    p = pages.select(
        F.col(id_col), F.col(url_col),
        host.alias("domain"), path.alias("_sg_path"),
    )
    r = rules.filter(F.col("applies")).select(
        "domain", "rule_type", "prefix"
    )
    j = p.join(r, "domain", "left")
    matched = F.col("prefix").isNotNull() & F.col("_sg_path").startswith(
        F.col("prefix")
    )
    verdict = F.when(
        matched,
        F.struct(
            F.length("prefix").alias("l"),
            (F.col("rule_type") == "allow").cast("int").alias("a"),
        ),
    )
    return (
        j.groupBy(id_col, url_col)
        .agg(F.max(verdict).alias("_sg_win"))
        .select(
            id_col, url_col,
            F.coalesce(F.col("_sg_win.a") == 1, F.lit(True)).alias(
                "robots_allowed"
            ),
        )
    )


def robots_rules_sql(robots_rel: str, agent: str = "*") -> str:
    """:func:`parse_robots` in ANSI SQL over a relation exposing
    (domain, robots_txt) — same constants, same group walk."""
    ua = _sql_quote(UA_RE)
    ad = _sql_quote(ALLOW_RE)
    return (
        f"WITH raw AS (SELECT domain, u.pos AS pos, u.raw AS raw FROM ("
        f" SELECT domain, unnest(list_transform(str_split(robots_txt,"
        f" chr(10)), (x,i) -> struct_pack(pos := i, raw := x))) AS u"
        f" FROM {robots_rel})),"
        " ln AS (SELECT domain, pos, trim(replace(split_part(raw, '#', 1),"
        " chr(13), '')) AS line FROM raw),"
        f" tagged AS (SELECT domain, pos,"
        f" lower(trim(regexp_extract(line, {ua}, 1))) AS ua_val,"
        f" lower(regexp_extract(line, {ad}, 1)) AS rule_type,"
        f" trim(regexp_extract(line, {ad}, 2)) AS prefix FROM ln),"
        " lagd AS (SELECT *, CASE WHEN ua_val <> '' AND"
        " coalesce(lag(ua_val <> '') OVER"
        " (PARTITION BY domain ORDER BY pos), false) = false"
        " THEN 1 ELSE 0 END AS run_start FROM tagged),"
        " grp AS (SELECT *, sum(run_start)"
        " OVER (PARTITION BY domain ORDER BY pos"
        " ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW)"
        " AS group_id FROM lagd),"
        " app AS (SELECT domain, group_id,"
        " max(CASE WHEN ua_val IN ('*', "
        f"{_sql_quote(agent.lower())}) THEN 1 ELSE 0 END) AS applies_i"
        " FROM grp WHERE ua_val <> '' GROUP BY 1, 2)"
        " SELECT grp.domain, grp.group_id, app.applies_i = 1 AS applies,"
        " rule_type, prefix FROM grp JOIN app ON grp.domain = app.domain"
        " AND grp.group_id = app.group_id"
        " WHERE rule_type <> '' AND prefix <> ''"
    )


def robots_screen_sql(pages_rel: str, rules_sql: str) -> str:
    """:func:`url_robots_screen` in ANSI SQL: ``pages_rel`` exposes
    (doc_id, url); ``rules_sql`` is a :func:`robots_rules_sql` query."""
    from sagan_spark.ops.urltools import HOST_RE, PATH_RE

    h = _sql_quote(HOST_RE)
    pt = _sql_quote(PATH_RE)
    return (
        f"WITH rules AS ({rules_sql}),"
        f" p AS (SELECT doc_id, url,"
        f" lower(regexp_extract(url, {h}, 1)) AS domain,"
        f" CASE WHEN regexp_extract(url, {pt}, 1) = '' THEN '/'"
        f" ELSE regexp_extract(url, {pt}, 1) END AS path"
        f" FROM {pages_rel}),"
        " m AS (SELECT p.doc_id, p.url,"
        " CASE WHEN rules.prefix IS NOT NULL"
        "  AND starts_with(p.path, rules.prefix) THEN"
        " struct_pack(l := length(rules.prefix),"
        "  a := CAST(rules.rule_type = 'allow' AS INT)) END AS v"
        " FROM p LEFT JOIN rules ON p.domain = rules.domain"
        " AND rules.applies)"
        " SELECT doc_id, url,"
        " coalesce(max(v).a = 1, true) AS robots_allowed"
        " FROM m GROUP BY 1, 2"
    )


SITEMAP_RE = r"(?im)^sitemap:[ \t]*([^ \t\r\n]+)"


def robots_sitemaps(robots: DataFrame, body_col: str = "robots_txt",
                    domain_col: str = "domain") -> DataFrame:
    """``Sitemap:`` directive discovery (RFC 9309 §2.3 / sitemaps.org
    "inform search engines" protocol): the absolute sitemap URLs a
    robots.txt advertises — the input list :func:`ops.sitemap.
    parse_sitemap` fetches next, completing the crawl-bootstrap loop
    robots -> sitemap index -> url inventory.  Group membership is
    irrelevant for this field (it is NOT part of a user-agent group),
    so the extraction is one multiline regex pass over the raw body —
    scan-level codegen, no line explode.  Returns (domain,
    sitemap_url), one row per directive, duplicates preserved
    (an audit surface: repeated directives are a robots.txt smell)."""
    return robots.select(
        F.col(domain_col),
        F.explode(
            F.regexp_extract_all(
                F.coalesce(F.col(body_col), F.lit("")),
                F.lit(SITEMAP_RE),
                F.lit(1),
            )
        ).alias("sitemap_url"),
    )


def robots_sitemaps_sql(body_expr: str, from_sql: str,
                        domain_sql: str = "domain") -> str:
    """Oracle twin of :func:`robots_sitemaps`."""
    return (
        f"SELECT {domain_sql}, unnest(regexp_extract_all("
        f"coalesce({body_expr}, ''), {_sql_quote(SITEMAP_RE)}, 1))"
        f" AS sitemap_url FROM {from_sql}"
    )
