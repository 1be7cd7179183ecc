"""Sitemap parsing (sitemaps.org protocol): <urlset> entry extraction
and <sitemapindex> child discovery over raw sitemap XML bytes.

A crawl pipeline reads sitemaps right after robots.txt — they are the
publisher-declared URL inventory (the sitemaps.org 0.9 protocol, also
referenced from robots.txt ``Sitemap:`` lines) — and feeds <loc>
entries into the frontier next to :func:`ops.linkgraph.
frontier_candidates` output.  The reference engine's analog is its
file-of-references input mode (a record that names more inputs,
src/sagan-config.c rule file includes).

Declared spec (regex census over the byte stream, not an XML parser;
the RE2 ∩ Java subset discipline of ops/htmltext.py):

- ``<url>...</url>`` blocks yield ``kind='url'`` rows, ``<sitemap>...
  </sitemap>`` blocks yield ``kind='sitemap'`` rows (an index file's
  children — fetch targets, not page URLs).  The tag-name match
  requires the closing ``>`` right after optional whitespace, so
  ``<urlset>`` / ``<sitemapindex>`` wrappers can never match their own
  entry tags.
- per block: ``loc`` (required — blocks with an empty loc are
  dropped), ``lastmod`` and ``priority`` (optional, '' when absent).
  Values are whitespace-trimmed; ``loc`` is entity-decoded with the
  shared table (sitemap locs legally carry ``&amp;``).
- one pass over the decoded bytes: both block kinds are collected in
  a single projection (array concat of two extract_alls) and exploded
  once — scan-level whole-stage codegen, no shuffle, no Python.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from sagan_spark.ops.htmltext import ENTITIES, _sql_quote

_WS = r"[ \t\r\n\f]"
URL_BLOCK_RE = rf"(?is)<url{_WS}*>(.*?)</url{_WS}*>"
SITEMAP_BLOCK_RE = rf"(?is)<sitemap{_WS}*>(.*?)</sitemap{_WS}*>"
LOC_RE = r"(?is)<loc[^>]*>([^<]*)"
LASTMOD_RE = r"(?is)<lastmod[^>]*>([^<]*)"
PRIORITY_RE = r"(?is)<priority[^>]*>([^<]*)"


def _decode_loc(col):
    out = col
    for ent, ch in ENTITIES:
        out = F.replace(out, F.lit(ent), F.lit(ch))
    return out


def _decode_loc_sql(expr: str) -> str:
    out = expr
    for ent, ch in ENTITIES:
        out = f"replace({out}, {_sql_quote(ent)}, {_sql_quote(ch)})"
    return out


def parse_sitemap(pages: DataFrame, xml_col: str = "html",
                  id_col: str = "url") -> DataFrame:
    """(id, kind, loc, lastmod, priority) — one row per <url> or
    <sitemap> entry with a non-empty <loc>.  ``kind='sitemap'`` rows
    are child sitemaps of an index file (fetch next, don't crawl)."""
    s = F.coalesce(F.decode(F.col(xml_col), "UTF-8"), F.lit(""))

    def _tagged(pat: str, kind: str):
        return F.transform(
            F.regexp_extract_all(s, F.lit(pat), F.lit(1)),
            lambda b: F.struct(F.lit(kind).alias("kind"), b.alias("b")),
        )

    entries = F.concat(
        _tagged(URL_BLOCK_RE, "url"), _tagged(SITEMAP_BLOCK_RE, "sitemap")
    )
    e = pages.select(F.col(id_col), F.explode(entries).alias("_sg_e"))
    b = F.col("_sg_e.b")
    loc = _decode_loc(F.trim(F.regexp_extract(b, LOC_RE, 1)))
    out = e.select(
        F.col(id_col),
        F.col("_sg_e.kind").alias("kind"),
        loc.alias("loc"),
        F.trim(F.regexp_extract(b, LASTMOD_RE, 1)).alias("lastmod"),
        F.trim(F.regexp_extract(b, PRIORITY_RE, 1)).alias("priority"),
    )
    return out.filter(F.col("loc") != "")


def sitemap_sql(expr: str, from_sql: str, id_sql: str = "url") -> str:
    """The SAME extraction in ANSI SQL over an xml STRING expression
    read FROM ``from_sql`` — one source of truth for the oracle.
    UNION ALL of the two block kinds (the Spark side collects both in
    one pass; the multisets are identical)."""
    s = f"coalesce({expr}, '')"

    def half(pat: str, kind: str) -> str:
        return (
            f"SELECT {id_sql}, '{kind}' AS kind,"
            f" unnest(regexp_extract_all({s}, {_sql_quote(pat)}, 1)) AS b"
            f" FROM {from_sql}"
        )

    loc = _decode_loc_sql(
        f"trim(regexp_extract(b, {_sql_quote(LOC_RE)}, 1))"
    )
    return (
        f"SELECT * FROM (SELECT {id_sql}, kind, {loc} AS loc,"
        f" trim(regexp_extract(b, {_sql_quote(LASTMOD_RE)}, 1)) AS lastmod,"
        f" trim(regexp_extract(b, {_sql_quote(PRIORITY_RE)}, 1)) AS priority"
        f" FROM ({half(URL_BLOCK_RE, 'url')} UNION ALL"
        f" {half(SITEMAP_BLOCK_RE, 'sitemap')}))"
        f" WHERE loc <> ''"
    )
