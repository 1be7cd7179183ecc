"""Structured page-metadata extraction over the ``html`` byte column.

A web-corpus pipeline wants more than visible text from a page: the
<title>, the meta description, the canonical URL (the dedup key
publishers themselves declare), the Open Graph title, and the declared
document language all feed curation decisions (title/description go to
quality scoring and search indexing, rel=canonical collapses syndicated
copies before any content dedup runs, html lang seeds language ID).
The reference engine's analogous stage is its normalize step — pulling
typed fields out of unstructured input before matching
(/root/reference/src/parsers/*.c) — re-expressed here over markup.

Same discipline as :mod:`sagan_spark.ops.htmltext` (this module reuses
its entity table, whitespace collapse, and attr-extraction idiom):

- every pattern sits in the RE2 ∩ Java-regex subset — no ``\\s``/``\\b``,
  no backreferences, no lookahead — so the Spark column expression and
  the generated DuckDB SQL (one source of truth: :func:`page_meta_sql`)
  compute byte-identical output;
- attribute values are matched as an explicit alternation of the
  double-quoted, single-quoted, and bare forms (bare terminated by
  whitespace, '/', or the tag's own '>'), so ``name="descriptionx"``
  can never match;
- the whole op is regexp_extract chains over one decoded string —
  scan-level whole-stage codegen, no shuffle, no Python; at 10^12
  pages AQE folds it into the scan.

Declared-spec limitations (documented, same class as the text
extractor's): leftmost tag wins, attribute order inside a tag is free
but the attr name must precede its value, and a quoted value may not
contain the quote character (true of serialized HTML attributes).
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from sagan_spark.ops.htmltext import ENTITIES, WS_RE, _sql_quote

_WS = r"[ \t\r\n\f]"


def _attr_tag_re(tag: str, attr: str, value: str) -> str:
    """Leftmost <tag ... attr=value ...> — the robots-tag idiom
    generalized: the value in double-quoted / single-quoted / bare
    form (bare terminated by whitespace, '/', or '>')."""
    v = value  # values used here contain no regex metachars (':' is literal)
    return (
        rf"(?i)<{tag}[^>]*{attr}{_WS}*={_WS}*"
        rf"(?:\"{v}\"[^>]*|'{v}'[^>]*|{v}{_WS}[^>]*|{v}/[^>]*|{v})>"
    )


TITLE_RE = r"(?is)<title[^>]*>([^<]*)"
META_DESC_TAG_RE = _attr_tag_re("meta", "name", "description")
OG_TITLE_TAG_RE = _attr_tag_re("meta", "property", "og:title")
CANONICAL_TAG_RE = _attr_tag_re("link", "rel", "canonical")
CONTENT_ATTR_RE = r"(?i)content[ \t\r\n\f]*=[ \t\r\n\f]*[\"']?([^\"'>]*)"
HREF_ATTR_RE = r"(?i)href[ \t\r\n\f]*=[ \t\r\n\f]*[\"']?([^\"'> ]*)"
# lang attr must be preceded by whitespace so xml:lang / a hypothetical
# data-lang can't bleed in via the [^>]* prefix eating too little; the
# BCP-47-ish value charset stops at the first non-tag character either way
HTML_LANG_RE = (
    r"(?i)<html[^>]*[ \t\r\n\f]lang[ \t\r\n\f]*=[ \t\r\n\f]*"
    r"[\"']?([A-Za-z][A-Za-z0-9-]*)"
)


def _clean_text_expr(col):
    """Entity-decode + whitespace-collapse + trim a captured fragment
    (the title cleanup): same ENTITIES order as the text extractor —
    ``&amp;`` last."""
    out = col
    for ent, ch in ENTITIES:
        out = F.replace(out, F.lit(ent), F.lit(ch))
    return F.trim(F.regexp_replace(out, WS_RE, " "))


def _clean_text_sql(expr: str) -> str:
    out = expr
    for ent, ch in ENTITIES:
        out = f"replace({out}, {_sql_quote(ent)}, {_sql_quote(ch)})"
    return f"trim(regexp_replace({out}, {_sql_quote(WS_RE)}, ' ', 'g'))"


def meta_exprs(s) -> dict:
    """The five extraction Columns over an html STRING expression —
    the composable form :func:`page_metadata` and the ingest pipeline
    (ops/webpipeline.py) both build on."""
    return {
        "title": _clean_text_expr(F.regexp_extract(s, TITLE_RE, 1)),
        "meta_description": _clean_text_expr(
            F.regexp_extract(
                F.regexp_extract(s, META_DESC_TAG_RE, 0), CONTENT_ATTR_RE, 1
            )
        ),
        "canonical_url": F.regexp_extract(
            F.regexp_extract(s, CANONICAL_TAG_RE, 0), HREF_ATTR_RE, 1
        ),
        "og_title": _clean_text_expr(
            F.regexp_extract(
                F.regexp_extract(s, OG_TITLE_TAG_RE, 0), CONTENT_ATTR_RE, 1
            )
        ),
        "html_lang": F.lower(F.regexp_extract(s, HTML_LANG_RE, 1)),
    }


def page_metadata(pages: DataFrame, html_col: str = "html",
                  id_col: str = "doc_id") -> DataFrame:
    """(id, title, meta_description, canonical_url, og_title,
    html_lang) per page.  Missing fields come back as the empty string
    (regexp_extract's no-match value in BOTH engines — kept as-is
    rather than NULLed so the sink schema is total)."""
    exprs = meta_exprs(F.decode(F.col(html_col), "UTF-8"))
    return pages.select(
        F.col(id_col),
        *[c.alias(name) for name, c in exprs.items()],
    )


def meta_field_sqls(expr: str) -> dict[str, str]:
    """Per-field SQL expressions over an html STRING expression —
    the composable form :func:`page_meta_sql` and the ingest-pipeline
    oracle both build on (one source of truth with
    :func:`meta_exprs`)."""
    def x(pat: str, grp: int, src: str) -> str:
        return f"regexp_extract({src}, {_sql_quote(pat)}, {grp})"

    return {
        "title": _clean_text_sql(x(TITLE_RE, 1, expr)),
        "meta_description": _clean_text_sql(
            x(CONTENT_ATTR_RE, 1, x(META_DESC_TAG_RE, 0, expr))
        ),
        "canonical_url": x(HREF_ATTR_RE, 1, x(CANONICAL_TAG_RE, 0, expr)),
        "og_title": _clean_text_sql(
            x(CONTENT_ATTR_RE, 1, x(OG_TITLE_TAG_RE, 0, expr))
        ),
        "html_lang": f"lower({x(HTML_LANG_RE, 1, expr)})",
    }


def page_meta_sql(expr: str) -> str:
    """The SAME extraction as :func:`page_metadata` in ANSI SQL over an
    html STRING expression — one source of truth for the oracle.
    Emits a SELECT-list fragment (without the id column)."""
    return ", ".join(
        f"{sql} AS {name}" for name, sql in meta_field_sqls(expr).items()
    )


# ---------------------------------------------------------------------------
# charset sniffing — the decode-routing step of web ingest
# ---------------------------------------------------------------------------
#
# A crawler stores pages as raw bytes; before ANY text op runs, the
# pipeline must decide the encoding.  The practical sniff order (WHATWG
# encoding spec §4.2, collapsed to its deterministic core) is:
# byte-order mark > transport header charset > in-document <meta>
# charset.  This op reports all three signals plus the routing verdict
# so a 10^12-page ingest can partition its decode fan-out by charset —
# the reference engine's analog is its input-format probe
# (src/input-pipe.c deciding syslog vs JSON before parsing).
#
# BOM detection is pure byte compares on the BLOB; the meta sniff only
# decodes the byte stream when no UTF-16 BOM is present (decoding
# UTF-16 bytes as UTF-8 is garbage — and DuckDB's decode() would
# reject it, so the CASE guard is also what keeps the oracle exact).
# The meta pattern catches both `<meta charset=...>` and the legacy
# `<meta http-equiv=Content-Type content="...; charset=...">` in one
# pass (both spell `charset=` inside a meta tag).

#: charset value inside any <meta ...> tag (modern or http-equiv form)
META_CHARSET_RE = (
    r"(?i)<meta[^>]*charset[ \t\r\n\f]*=[ \t\r\n\f]*[\"']?([A-Za-z0-9._:-]+)"
)
#: charset parameter on a Content-Type transport header line —
#: anchored to the LINE START ((?im)^...:) so 'content-type' appearing
#: inside another header's value (a Via/Link/cookie value,
#: X-Content-Type-Options context) can never supply the charset that
#: outranks the in-document meta declaration (ADVICE r4); the same
#: constant feeds charset_sql, so op and oracle move together
HTTP_CHARSET_RE = (
    r"(?im)^content-type:[^\r\n]*charset=[\"']?([A-Za-z0-9._:-]+)"
)

_BIG = 2147483647  # substring length for "rest of the bytes"


def charset_sniff(pages: DataFrame, html_col: str = "html",
                  headers_col: str | None = None,
                  id_col: str = "url") -> DataFrame:
    """(id, bom, http_charset, meta_charset, charset) per page.

    ``bom`` ∈ {utf-8, utf-16le, utf-16be, ''}; ``charset`` is the
    routing verdict (bom > header > meta > 'unspecified'), lowercased.
    Pure byte compares + two regexp_extracts — scan-level codegen, no
    shuffle, no Python.  ``headers_col`` (optional) is a raw HTTP
    header block string (e.g. ``parse_warc``'s http section)."""
    b = F.col(html_col)
    h3 = F.hex(F.substring(b, 1, 3))
    h2 = F.hex(F.substring(b, 1, 2))
    bom = (
        F.when(h3 == "EFBBBF", F.lit("utf-8"))
        .when(h2 == "FFFE", F.lit("utf-16le"))
        .when(h2 == "FEFF", F.lit("utf-16be"))
        .otherwise(F.lit(""))
    )
    s = F.coalesce(
        F.when(bom == "utf-8", F.decode(F.substring(b, 4, _BIG), "UTF-8"))
        .when(bom == "", F.decode(b, "UTF-8")),
        F.lit(""),
    )
    meta_cs = F.lower(F.regexp_extract(s, META_CHARSET_RE, 1))
    http_cs = (
        F.lower(
            F.regexp_extract(
                F.coalesce(F.col(headers_col), F.lit("")), HTTP_CHARSET_RE, 1
            )
        )
        if headers_col
        else F.lit("")
    )
    verdict = F.coalesce(
        F.nullif(bom, F.lit("")),
        F.nullif(http_cs, F.lit("")),
        F.nullif(meta_cs, F.lit("")),
        F.lit("unspecified"),
    )
    return pages.select(
        F.col(id_col),
        bom.alias("bom"),
        http_cs.alias("http_charset"),
        meta_cs.alias("meta_charset"),
        verdict.alias("charset"),
    )


def charset_sql(blob_expr: str, headers_expr: str = "''",
                id_sql: str = "url") -> str:
    """The SAME sniff in ANSI SQL over a BLOB expression — one source
    of truth for the oracle.  DuckDB's substring() is VARCHAR-only, so
    the byte window rides the hex rendering (hex() is uppercase in
    both engines; two hex chars per byte).  Emits a full SELECT
    list."""
    hexs = f"hex({blob_expr})"
    h3 = f"substring({hexs}, 1, 6)"
    h2 = f"substring({hexs}, 1, 4)"
    bom = (
        f"CASE WHEN {h3} = 'EFBBBF' THEN 'utf-8'"
        f" WHEN {h2} = 'FFFE' THEN 'utf-16le'"
        f" WHEN {h2} = 'FEFF' THEN 'utf-16be' ELSE '' END"
    )
    s = (
        f"coalesce(CASE WHEN {bom} = 'utf-8'"
        f" THEN decode(unhex(substring({hexs}, 7)))"
        f" WHEN {bom} = '' THEN decode({blob_expr}) END, '')"
    )
    meta_cs = f"lower(regexp_extract({s}, {_sql_quote(META_CHARSET_RE)}, 1))"
    http_cs = (
        f"lower(regexp_extract(coalesce({headers_expr}, ''),"
        f" {_sql_quote(HTTP_CHARSET_RE)}, 1))"
    )
    verdict = (
        f"coalesce(nullif({bom}, ''), nullif({http_cs}, ''),"
        f" nullif({meta_cs}, ''), 'unspecified')"
    )
    return (
        f"SELECT {id_sql}, {bom} AS bom, {http_cs} AS http_charset,"
        f" {meta_cs} AS meta_charset, {verdict} AS charset"
    )
