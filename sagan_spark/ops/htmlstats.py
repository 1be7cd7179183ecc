"""HTML structural census: tag/link/script counts, markup ratio, and
link density over the pages table's ``html`` byte column.

Link density — the fraction of visible text that lives inside anchor
tags — is THE classic boilerplate signal (Kohlschuetter et al. WSDM'10,
boilerpipe): navigation chrome is link-dense, article bodies are not.
A web-curation pipeline reads these counters to route pages between
"mostly chrome" and "mostly content" before any text filter runs; the
reference engine's analog is its per-message parse counters
(src/sagan-stats.c) — structural telemetry emitted from the same scan
that does the real work.

Declared spec (same Java-regex == RE2 discipline as ops/htmltext.py,
one constant set driving the Spark Column chain, the DuckDB oracle SQL
and the pure-Python pytest twin):

- ``html_len``: characters of the UTF-8-decoded markup.
- ``n_tags``: occurrences of ``<...>`` (raw census, script bodies
  included — a count over the byte stream, not a DOM).
- ``n_links`` / ``n_scripts`` / ``n_images``: case-insensitive opening
  tags (name terminated by whitespace, '/', or '>', so ``<abbr>``
  never counts as ``<a>``).
- ``text_len``: characters of the full extraction chain's output
  (ops/htmltext.html_text_expr — one source of truth).
- ``anchor_chars``: total visible characters inside ``<a ...>...</a>``
  spans — each span's inner markup is stripped with the SAME
  tag/entity/whitespace chain before measuring.  Nested anchors are
  out of spec (regex census, not a parser): a span runs from an open
  tag to the NEAREST close tag (non-greedy), so nested content counts
  once inside the outer span and text between that close tag and a
  later orphan ``</a>`` contributes nothing; an ``<a>`` with no close
  tag at all contributes nothing.
- ``link_density_ppm`` = ``1e6 * anchor_chars div max(text_len, 1)``,
  ``markup_ratio_ppm`` = ``1e6 * text_len div max(html_len, 1)`` —
  integer parts-per-million, exact in any evaluation order, no
  cross-engine float risk.

Everything is scan-level whole-stage codegen: regexp_count /
regexp_extract_all / a higher-order ``aggregate`` over the per-row
anchor array.  No shuffle, no window, no Python — at 10^12 pages this
is a map-only pass AQE folds into the scan stage.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

from sagan_spark.ops.htmltext import (
    ENTITIES,
    TAG_RE,
    WS_RE,
    _sql_quote,
    html_text_expr,
    html_text_sql,
)

#: any tag — the raw angle-bracket census
ANY_TAG_RE = TAG_RE
#: opening tags by name; name must end at whitespace, '/', or '>'
A_OPEN_RE = r"(?i)<a(?:[ \t\r\n\f/][^>]*)?>"
SCRIPT_OPEN_RE = r"(?i)<script(?:[ \t\r\n\f/][^>]*)?>"
IMG_OPEN_RE = r"(?i)<img(?:[ \t\r\n\f/][^>]*)?>"
#: anchor spans with their visible body (group 1); non-greedy body,
#: dot-matches-newline — identical semantics in Java regex and RE2
ANCHOR_SPAN_RE = r"(?is)<a(?:[ \t\r\n\f][^>]*)?>(.*?)</a[ \t\r\n\f]*>"


def _inner_text(col: Column) -> Column:
    """Visible text of one anchor body: strip tags, decode entities,
    collapse whitespace — the tail of the html_text_expr chain."""
    out = F.regexp_replace(col, TAG_RE, " ")
    for ent, ch in ENTITIES:
        out = F.replace(out, F.lit(ent), F.lit(ch))
    out = F.regexp_replace(out, WS_RE, " ")
    return F.trim(out)


def _inner_text_sql(expr: str) -> str:
    out = f"regexp_replace({expr}, {_sql_quote(TAG_RE)}, ' ', 'g')"
    for ent, ch in ENTITIES:
        out = f"replace({out}, {_sql_quote(ent)}, {_sql_quote(ch)})"
    out = f"regexp_replace({out}, {_sql_quote(WS_RE)}, ' ', 'g')"
    return f"trim({out})"


def html_stats(pages: DataFrame, html_col: str = "html",
               id_col: str = "url") -> DataFrame:
    """Per-page structural counters + link density (see module
    docstring for the declared spec).  One narrow projection."""
    s = F.coalesce(F.decode(F.col(html_col), "UTF-8"), F.lit(""))
    text_len = F.length(html_text_expr(s)).cast("long")
    anchors = F.regexp_extract_all(s, F.lit(ANCHOR_SPAN_RE), F.lit(1))
    anchor_chars = F.aggregate(
        anchors,
        F.lit(0).cast("long"),
        lambda acc, x: acc + F.length(_inner_text(x)),
    )
    html_len = F.length(s).cast("long")
    # `div` (exact 64-bit integer division; all operands non-negative,
    # so Spark `div` and DuckDB `//` truncate identically) — a
    # float-divide-then-cast chain could round the last digit apart
    counted = pages.select(
        F.col(id_col),
        html_len.alias("html_len"),
        F.regexp_count(s, F.lit(ANY_TAG_RE)).cast("long").alias("n_tags"),
        F.regexp_count(s, F.lit(A_OPEN_RE)).cast("long").alias("n_links"),
        F.regexp_count(s, F.lit(SCRIPT_OPEN_RE)).cast("long").alias("n_scripts"),
        F.regexp_count(s, F.lit(IMG_OPEN_RE)).cast("long").alias("n_images"),
        text_len.alias("text_len"),
        anchor_chars.alias("anchor_chars"),
    )
    return counted.withColumns(
        {
            "link_density_ppm": F.expr(
                "(anchor_chars * 1000000) div greatest(text_len, 1)"
            ),
            "markup_ratio_ppm": F.expr(
                "(text_len * 1000000) div greatest(html_len, 1)"
            ),
        }
    )


#: any href attribute value (quoted) — absolute or relative
HREF_ANY_RE = r"(?i)href=\"([^\"#]+)\""
#: absolute http(s) subset (the ops/linkgraph.HREF_RE capture)
HREF_ABS_RE = r"href=\"(https?://[^\"#]+)\""


def outlink_census(pages: DataFrame, html_col: str = "html",
                   url_col: str = "url") -> DataFrame:
    """Per-page link-shape census at HOST granularity: absolute vs
    relative link counts, external-host links, and distinct target
    hosts — the outbound-link structure signal (a content page links
    out to a handful of hosts; a link farm to hundreds; pure chrome
    only to itself).  Host-level by design: the PSL registered-domain
    ladder stays in the domain rollup ops where its cost is amortized
    per ROW, not per array element.

    Returns (url, n_links, n_abs, n_rel, n_external, n_hosts).
    Pure per-row array codegen — no shuffle, no Python."""
    from sagan_spark.ops.urltools import HOST_RE

    s = F.coalesce(F.decode(F.col(html_col), "UTF-8"), F.lit(""))
    all_refs = F.regexp_extract_all(s, F.lit(HREF_ANY_RE), F.lit(1))
    abs_refs = F.regexp_extract_all(s, F.lit(HREF_ABS_RE), F.lit(1))
    hosts = F.transform(
        abs_refs, lambda u: F.lower(F.regexp_extract(u, HOST_RE, 1))
    )
    page_host = F.lower(F.regexp_extract(F.col(url_col), HOST_RE, 1))
    n_links = F.size(all_refs).cast("long")
    n_abs = F.size(abs_refs).cast("long")
    return pages.select(
        F.col(url_col),
        n_links.alias("n_links"),
        n_abs.alias("n_abs"),
        (n_links - n_abs).alias("n_rel"),
        F.size(F.filter(hosts, lambda h: h != page_host))
        .cast("long")
        .alias("n_external"),
        F.size(F.array_distinct(hosts)).cast("long").alias("n_hosts"),
    )


def outlink_census_sql(expr: str, url_sql: str = "url") -> str:
    """The SAME census in ANSI SQL over an html STRING expression —
    emits a full SELECT list (FROM supplied by the caller)."""
    from sagan_spark.ops.urltools import HOST_RE

    s = f"coalesce({expr}, '')"
    all_refs = f"regexp_extract_all({s}, {_sql_quote(HREF_ANY_RE)}, 1)"
    abs_refs = f"regexp_extract_all({s}, {_sql_quote(HREF_ABS_RE)}, 1)"
    host_of = f"lower(regexp_extract(u, {_sql_quote(HOST_RE)}, 1))"
    hosts = f"list_transform({abs_refs}, u -> {host_of})"
    page_host = f"lower(regexp_extract({url_sql}, {_sql_quote(HOST_RE)}, 1))"
    return (
        f"SELECT {url_sql},"
        f" CAST(len({all_refs}) AS BIGINT) AS n_links,"
        f" CAST(len({abs_refs}) AS BIGINT) AS n_abs,"
        f" CAST(len({all_refs}) - len({abs_refs}) AS BIGINT) AS n_rel,"
        f" CAST(len(list_filter({hosts}, h -> h <> {page_host}))"
        f"  AS BIGINT) AS n_external,"
        f" CAST(len(list_distinct({hosts})) AS BIGINT) AS n_hosts"
    )


def html_stats_sql(expr: str, id_sql: str = "url") -> str:
    """The SAME census in ANSI SQL over an html STRING expression —
    one source of truth for the DuckDB oracle.  Emits a full SELECT
    list (FROM clause supplied by the caller)."""
    s = f"coalesce({expr}, '')"
    text_len = f"length({html_text_sql(s)})"
    anchors = f"regexp_extract_all({s}, {_sql_quote(ANCHOR_SPAN_RE)}, 1)"
    anchor_chars = (
        f"coalesce(list_sum(list_transform({anchors},"
        f" x -> length({_inner_text_sql('x')}))), 0)"
    )
    html_len = f"length({s})"
    return (
        f"SELECT {id_sql},"
        f" CAST({html_len} AS BIGINT) AS html_len,"
        f" CAST(len(regexp_extract_all({s}, {_sql_quote(ANY_TAG_RE)}))"
        f"  AS BIGINT) AS n_tags,"
        f" CAST(len(regexp_extract_all({s}, {_sql_quote(A_OPEN_RE)}))"
        f"  AS BIGINT) AS n_links,"
        f" CAST(len(regexp_extract_all({s}, {_sql_quote(SCRIPT_OPEN_RE)}))"
        f"  AS BIGINT) AS n_scripts,"
        f" CAST(len(regexp_extract_all({s}, {_sql_quote(IMG_OPEN_RE)}))"
        f"  AS BIGINT) AS n_images,"
        f" CAST({text_len} AS BIGINT) AS text_len,"
        f" CAST({anchor_chars} AS BIGINT) AS anchor_chars,"
        f" CAST(({anchor_chars} * 1000000) // greatest({text_len}, 1)"
        f"  AS BIGINT) AS link_density_ppm,"
        f" CAST(({text_len} * 1000000) // greatest({html_len}, 1)"
        f"  AS BIGINT) AS markup_ratio_ppm"
    )
